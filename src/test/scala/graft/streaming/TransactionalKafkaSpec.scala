package graft.streaming

import java.sql.Timestamp
import java.util.concurrent.ConcurrentLinkedQueue

import graft.SparkSpec
import graft.core.GraftConf

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Exactly-once semantics of the transactional Kafka sink, driven through
  * an in-memory stub broker (the build sandbox has no Kafka jars — the
  * real path is [[TransactionalKafka.ReflectiveKafkaTxnFactory]], exercised
  * by the env-gated KafkaRoundTripSpec). The replay cases mirror
  * LakeSinkSpec's: a committed batch re-offered must not duplicate, an
  * aborted attempt must leave nothing visible, and the retry after an
  * abort must land exactly one copy. */
object TransactionalKafkaSpec {

  /** One in-memory "cluster" per test (keyed so parallel suites can't
    * collide): committed records per topic, plus open-transaction buffers
    * per transactional id. Commit appends the buffer atomically under the
    * broker lock — a reader of `committed` can never see half a
    * transaction, which is exactly the read_committed contract the real
    * control-topic scan relies on. */
  final class StubBroker {
    val committed =
      scala.collection.mutable.Map[String,
        Vector[(Array[Byte], Array[Byte])]]().withDefaultValue(Vector.empty)
    private val open =
      scala.collection.mutable.Map[String,
        Vector[(String, Array[Byte], Array[Byte])]]()
    // test hook: transactional ids whose NEXT commit should fail once
    // (emulating a crash between the produce and the commit)
    val failCommitOnce = scala.collection.mutable.Set[String]()

    def fence(txnId: String): Unit = synchronized { open.remove(txnId); () }
    def begin(txnId: String): Unit = synchronized {
      require(!open.contains(txnId), s"nested begin for $txnId")
      open(txnId) = Vector.empty
    }
    def send(txnId: String, topic: String, key: Array[Byte],
        value: Array[Byte]): Unit = synchronized {
      open(txnId) = open(txnId) :+ ((topic, key, value))
    }
    def commit(txnId: String): Unit = synchronized {
      if (failCommitOnce.remove(txnId)) {
        open.remove(txnId)
        throw new RuntimeException(s"injected commit failure for $txnId")
      }
      open.remove(txnId).getOrElse(
        throw new IllegalStateException(s"commit without begin: $txnId"))
        .foreach { case (t, k, v) => committed(t) = committed(t) :+ ((k, v)) }
    }
    def abort(txnId: String): Unit = synchronized { open.remove(txnId); () }

    def records(topic: String): Vector[(String, String)] = synchronized {
      committed(topic).map { case (k, v) =>
        (if (k == null) null else new String(k, "UTF-8"),
          if (v == null) null else new String(v, "UTF-8"))
      }
    }
    // how many times the replay guard actually read the control topic —
    // the driver-primed cache should make this once per txnId per run,
    // not once per partition per batch
    val guardReads = new java.util.concurrent.atomic.AtomicLong()
    def lastCommitted(txnId: String, controlTopic: String): Long = {
      guardReads.incrementAndGet()
      synchronized {
        committed(controlTopic).collect {
          case (k, v) if k != null &&
              new String(k, "UTF-8") == txnId && v.length == 8 =>
            java.nio.ByteBuffer.wrap(v).getLong
        }.foldLeft(-1L)(math.max)
      }
    }
  }

  // static registry: factories are serialized into foreachPartition
  // closures, but in local mode the tasks share this JVM and find the
  // broker by id
  val brokers = new java.util.concurrent.ConcurrentHashMap[String, StubBroker]()

  final class StubTxnFactory(brokerId: String)
      extends TransactionalKafka.TxnProducerFactory {
    private def broker = brokers.get(brokerId)
    def create(txnId: String): TransactionalKafka.TxnProducer = {
      val b = broker
      b.fence(txnId) // initTransactions(): abort the zombie's open txn
      new TransactionalKafka.TxnProducer {
        def beginTransaction(): Unit = b.begin(txnId)
        def send(topic: String, key: Array[Byte], value: Array[Byte],
            headers: Seq[(String, Array[Byte])]): Unit =
          b.send(txnId, topic, key, value)
        def commitTransaction(): Unit = b.commit(txnId)
        def abortTransaction(): Unit = b.abort(txnId)
        def close(): Unit = ()
      }
    }
    def lastCommitted(txnId: String, controlTopic: String): Long =
      broker.lastCommitted(txnId, controlTopic)
  }

  val processed = new ConcurrentLinkedQueue[String]()
}

class TransactionalKafkaSpec extends SparkSpec {
  import spark.implicits._
  import TransactionalKafkaSpec._

  private def newBroker(): (String, StubBroker) = {
    val id = java.util.UUID.randomUUID().toString
    val b = new StubBroker
    brokers.put(id, b)
    (id, b)
  }

  private def conf(app: String) = GraftConf(applicationId = app,
    transactionalKafkaSink = true, txnSinkPartitions = 3)

  private def frame(rows: (String, String)*) =
    rows.toDF("k", "v").selectExpr("k AS key",
      "CAST(v AS BINARY) AS value",
      "CAST(NULL AS array<struct<key: string, value: binary>>) AS headers")

  test("write commits data + control record atomically; replay skips") {
    val (id, broker) = newBroker()
    val c = conf("txn-app")
    val df = frame("k1" -> "v1", "k2" -> "v2", "k3" -> "v3")
    TransactionalKafka.write(df, c, "out", batchId = 0L,
      new StubTxnFactory(id))
    val got = broker.records("out").toSet
    assert(got == Set(("k1", "v1"), ("k2", "v2"), ("k3", "v3")), s"$got")
    // control records committed alongside the data, one per non-empty...
    // actually per PARTITION (empty partitions commit their marker too,
    // keeping lastCommitted monotonic for every transactional id)
    assert(broker.committed(c.txnControlTopicOrDefault).nonEmpty)
    // a full batch replay (sink committed, offsets lost) must not
    // double-deliver: every partition sees lastCommitted >= batchId
    TransactionalKafka.write(df, c, "out", batchId = 0L,
      new StubTxnFactory(id))
    assert(broker.records("out").size == 3,
      s"replay duplicated: ${broker.records("out")}")
  }

  test("a later batch with new data still goes through") {
    val (id, broker) = newBroker()
    val c = conf("txn-app2")
    TransactionalKafka.write(frame("a" -> "1"), c, "out", 0L,
      new StubTxnFactory(id))
    TransactionalKafka.write(frame("b" -> "2"), c, "out", 1L,
      new StubTxnFactory(id))
    assert(broker.records("out").toSet == Set(("a", "1"), ("b", "2")))
  }

  test("crash between produce and commit: nothing visible, retry lands once") {
    val (id, broker) = newBroker()
    val c = conf("txn-app3")
    val df = frame("k1" -> "v1")
    // k1 hashes into exactly one of the 3 partitions; fail that partition's
    // first commit — arm the injection for every partition writer, only
    // the one holding k1 matters (empty partitions that trip it are
    // retried by the second write call identically)
    (0 until c.txnSinkPartitions).foreach(p =>
      broker.failCommitOnce.add(s"${c.applicationId}-out-p$p"))
    val failed = intercept[Exception] {
      TransactionalKafka.write(df, c, "out", 0L, new StubTxnFactory(id))
    }
    assert(failed != null)
    assert(broker.records("out").isEmpty,
      "aborted attempt must leave nothing visible to read_committed")
    // the replayed batch (Spark restarts foreachBatch) commits exactly once
    TransactionalKafka.write(df, c, "out", 0L, new StubTxnFactory(id))
    assert(broker.records("out") == Vector(("k1", "v1")))
  }

  test("simple pipeline routes errors through the txn sink exactly once") {
    val (id, broker) = newBroker()
    processed.clear()
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Array[Byte], String, Int, Long, Timestamp)]
    val source = input.toDF()
      .toDF("key", "value", "topic", "partition", "offset", "timestamp")
    val c = conf("txn-pipe")
    val q = GraftStream.simple[Dummy](
      source, c, GraftStreamSpec.decodeFn,
      process = d => { processed.add(d.value); None },
      errorSink = GraftStream.kafkaTxnSink(c, "errs", new StubTxnFactory(id)))
    try {
      input.addData(Seq(
        ("0", "k1|ok-one".getBytes("UTF-8"), "t", 0, 0L, new Timestamp(0)),
        ("1", "garbage".getBytes("UTF-8"), "t", 0, 1L, new Timestamp(1))))
      q.processAllAvailable()
    } finally q.stop()
    assert(processed.toArray.toSet == Set("ok-one"))
    val errs = broker.records("errs")
    assert(errs.map(_._2) == Vector("garbage"),
      s"exactly the bad payload, exactly once: $errs")
  }

  test("replay guard reads the control topic once per txnId per run") {
    TransactionalKafka.ReplayGuard.reset()
    val (id, broker) = newBroker()
    val c = conf("txn-guard-count")
    // three successive batches through the same sink: the first batch
    // pays one driver prime + one POST-fence confirmation per partition
    // (the primed value predates the fence, so the not-committed verdict
    // must be re-taken after initTransactions); batches 2 and 3 run on
    // locally-advanced trusted values — NOT a re-scan per partition per
    // batch
    TransactionalKafka.write(frame("a" -> "1"), c, "out", 0L,
      new StubTxnFactory(id))
    TransactionalKafka.write(frame("b" -> "2"), c, "out", 1L,
      new StubTxnFactory(id))
    TransactionalKafka.write(frame("c" -> "3"), c, "out", 2L,
      new StubTxnFactory(id))
    assert(broker.guardReads.get == 2L * c.txnSinkPartitions,
      s"guard read ${broker.guardReads.get} times for 3 batches × " +
        s"${c.txnSinkPartitions} partitions — expected prime + fenced " +
        "confirm on batch 0 only; the primed cache regressed")
    // a full replay of an already-committed batch still skips (cache
    // answers without a broker read) and does not duplicate
    TransactionalKafka.write(frame("c" -> "3"), c, "out", 2L,
      new StubTxnFactory(id))
    assert(broker.guardReads.get == 2L * c.txnSinkPartitions,
      "replay of a committed batch should be answered from the cache")
    assert(broker.records("out").toSet ==
      Set(("a", "1"), ("b", "2"), ("c", "3")),
      s"replay duplicated: ${broker.records("out")}")
  }

  test("guard cache invalidates on failure so the retry re-reads") {
    TransactionalKafka.ReplayGuard.reset()
    val (id, broker) = newBroker()
    val c = conf("txn-guard-inval")
    TransactionalKafka.write(frame("a" -> "1"), c, "out", 0L,
      new StubTxnFactory(id))
    val afterPrime = broker.guardReads.get
    assert(afterPrime == 2L * c.txnSinkPartitions)
    // fail every partition's commit on the next batch: the cache must be
    // dropped so the batch retry cannot trust a stale primed answer
    (0 until c.txnSinkPartitions).foreach(p =>
      broker.failCommitOnce.add(s"${c.applicationId}-out-p$p"))
    intercept[Exception] {
      TransactionalKafka.write(frame("b" -> "2"), c, "out", 1L,
        new StubTxnFactory(id))
    }
    TransactionalKafka.write(frame("b" -> "2"), c, "out", 1L,
      new StubTxnFactory(id))
    assert(broker.guardReads.get > afterPrime,
      "the retry after a failed batch must re-read the control topic, " +
        "not trust the pre-failure cache")
    assert(broker.records("out").toSet == Set(("a", "1"), ("b", "2")),
      s"${broker.records("out")}")
  }

  test("a zombie commit in the prime-to-fence window cannot double-write") {
    TransactionalKafka.ReplayGuard.reset()
    val (id, broker) = newBroker()
    val c = conf("txn-zombie")
    val factory = new StubTxnFactory(id)
    val txnIds = (0 until c.txnSinkPartitions)
      .map(p => s"${c.applicationId}-out-p$p")
    // the driver primes first and sees nothing committed (untrusted -1)…
    val primed = TransactionalKafka.ReplayGuard.prime(txnIds,
      c.txnControlTopicOrDefault, factory)
    assert(primed.values.forall(_._1 == -1L))
    // …then a concurrent duplicate producer (hung task of a failed run, a
    // zombie driver) commits the WHOLE batch 0 — data + control markers —
    // before the new attempt creates its producers. The old guard took
    // the replay verdict from the pre-fence primed map and double-wrote
    // exactly this window.
    broker.synchronized {
      broker.committed("out") = broker.committed("out") :+
        (("k1".getBytes("UTF-8"), "v1".getBytes("UTF-8")))
      txnIds.foreach { t =>
        broker.committed(c.txnControlTopicOrDefault) =
          broker.committed(c.txnControlTopicOrDefault) :+
            ((t.getBytes("UTF-8"),
              java.nio.ByteBuffer.allocate(8).putLong(0L).array()))
      }
    }
    // the new attempt must fence, re-read POST-fence, see the zombie's
    // commit, and skip — exactly one copy survives
    TransactionalKafka.write(frame("k1" -> "v1"), c, "out", 0L, factory)
    assert(broker.records("out") == Vector(("k1", "v1")),
      s"pre-fence primed answer trusted → batch double-written: " +
        s"${broker.records("out")}")
  }

  test("speculation disables the trusted fast path") {
    TransactionalKafka.ReplayGuard.reset()
    val (id, broker) = newBroker()
    val c = conf("txn-spec")
    // spark.speculation itself is launch-time-only (CANNOT_MODIFY_CONFIG
    // through RuntimeConfig) — the sink auto-detects it from the
    // SparkConf and honors this runtime override for everything else
    spark.conf.set("spark.graft.txn.forceFencedReads", "true")
    try {
      TransactionalKafka.write(frame("a" -> "1"), c, "out", 0L,
        new StubTxnFactory(id))
      val first = broker.guardReads.get
      // with speculation on, a duplicate of any attempt-0 task may be
      // racing — every batch must take its verdict from a post-fence
      // read, never the locally-advanced cache
      TransactionalKafka.write(frame("b" -> "2"), c, "out", 1L,
        new StubTxnFactory(id))
      assert(broker.guardReads.get == first + c.txnSinkPartitions,
        s"guard reads ${broker.guardReads.get} (was $first): speculation " +
          "must force one post-fence read per partition per batch")
    } finally spark.conf.unset("spark.graft.txn.forceFencedReads")
    assert(broker.records("out").toSet == Set(("a", "1"), ("b", "2")))
  }

  test("producer props carry durability hardening minus factory-pinned keys") {
    val c = GraftConf(applicationId = "app-y",
      requestTimeoutMs = Some(9999))
    val p = c.rawKafkaProducerProps
    // the hardening the non-transactional sink gets must reach the txn
    // producer too (ADVICE r9): unbounded retries + blocking
    assert(p("retries") == Int.MaxValue.toString)
    assert(p("max.block.ms") == Long.MaxValue.toString)
    assert(p("request.timeout.ms") == "9999")
    // …but not the keys the factory pins itself
    assert(!p.contains("enable.idempotence") && !p.contains("acks"), s"$p")
    assert(p.keys.forall(!_.startsWith("kafka.")))
  }

  test("raw client props strip the connector prefix; control topic defaults") {
    val c = GraftConf(applicationId = "app-x",
      securityProtocol = "SASL_SSL",
      saslMechanism = "PLAIN",
      requestTimeoutMs = Some(1234))
    val raw = c.rawKafkaClientProps
    // a directly-constructed producer/consumer wants UNprefixed configs —
    // a leaked "kafka." prefix would be silently ignored by the client
    assert(raw == Map(
      "security.protocol" -> "SASL_SSL",
      "sasl.mechanism" -> "PLAIN",
      "request.timeout.ms" -> "1234"), s"$raw")
    assert(raw.keys.forall(!_.startsWith("kafka.")))
    // control topic namespaced per application unless overridden
    assert(c.txnControlTopicOrDefault == "app-x.txn-commits")
    assert(c.copy(txnControlTopic = "ops.commits")
      .txnControlTopicOrDefault == "ops.commits")
  }

  test("txn sink outside a micro-batch context fails loudly") {
    val (id, _) = newBroker()
    val c = conf("txn-naked")
    val e = intercept[IllegalArgumentException] {
      GraftStream.kafkaTxnSink(c, "out",
        new StubTxnFactory(id))(frame("a" -> "1"))
    }
    assert(e.getMessage.contains("foreachBatch"))
  }
}
