package graft.streaming

import graft.core.GraftConf

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Opt-in exactly-once Kafka topic sink — the Spark analog of the
  * reference's transactional-producer posture (read_committed consumers +
  * "tend to be exactly-once", README.md:85, KafkaPropertiesBuilder.java:73,
  * 89-93). The default [[GraftStream.kafkaSink]] is at-least-once into
  * Kafka (Spark's connector has no transactional writer; a failed
  * micro-batch replays); this sink closes that delta when
  * [[graft.core.GraftConf.transactionalKafkaSink]] is enabled.
  *
  * Mechanics, per micro-batch:
  *
  *   1. The frame is hash-repartitioned on `key` into a FIXED number of
  *      partitions ([[graft.core.GraftConf.txnSinkPartitions]]), so a
  *      replayed batch routes every record to the same partition it went
  *      to the first time — the per-partition dedup below depends on this,
  *      and AQE/plan drift must not re-deal the rows.
  *   2. Each partition opens its own transactional producer with
  *      `transactional.id = <applicationId>-<topic>-p<partitionId>` — the
  *      Kafka-Streams per-task shape. `initTransactions()` fences any
  *      zombie from a previous attempt of the same partition (epoch bump;
  *      the zombie's in-flight transaction is aborted by the broker).
  *   3. If the control topic already holds a COMMITTED record for this
  *      transactional id with `batchId >= current` the partition is a
  *      replay of an already-committed write: it drains and skips.
  *   4. Otherwise: begin → produce every record → produce ONE control
  *      record (key = transactional id, value = batchId, onto
  *      [[graft.core.GraftConf.txnControlTopicOrDefault]]) → commit. The
  *      control record commits ATOMICALLY with the data, so the replay
  *      check in (3) can never see a half-written batch: either the
  *      transaction committed (skip) or it aborted (rewrite) — this is
  *      what makes the sink exactly-once rather than the marker-file
  *      guard's at-least-once-minus-the-last-crash-window.
  *
  * Semantics notes, stated honestly:
  *   - Atomicity is PER PARTITION, not per batch (Kafka Streams is the
  *     same: per stream task). A crash can commit partition 3 and not 7;
  *     the replay commits 7 and skips 3 — every record still lands exactly
  *     once, but a read_committed consumer can observe the batch arriving
  *     in two pieces.
  *   - Changing `txnSinkPartitions` while a batch is half-committed
  *     re-deals rows across transactional ids and can duplicate that one
  *     batch. Change it only at a clean stop (the same rule as changing a
  *     Kafka Streams topology's task count).
  *   - Downstream consumers must read with `isolation.level =
  *     read_committed` (the reference's consumer default, and what
  *     [[GraftStream.kafkaSource]] sets) — read_uncommitted sees aborted
  *     attempts.
  *   - The control topic should be compacted (key = transactional id, one
  *     live record per partition writer); with default broker configs an
  *     uncompacted control topic merely grows by one tiny record per
  *     (partition × batch).
  *
  * The producer is a tiny SPI ([[TxnProducer]]/[[TxnProducerFactory]])
  * rather than a kafka-clients dependency: this build is zero-egress and
  * carries no Kafka jars, and the pipelines must remain testable without a
  * broker. [[ReflectiveKafkaTxnFactory]] is the real implementation —
  * resolved by name at RUNTIME from the spark-sql-kafka connector's
  * kafka-clients (present on any cluster that uses Kafka at all); specs
  * drive the same sink through an in-memory stub broker.
  */
object TransactionalKafka {

  /** One partition's transactional producer. `create` returns it already
    * `initTransactions()`-ed (zombies of the same transactional.id are
    * fenced before the caller sees the handle). */
  trait TxnProducer extends AutoCloseable {
    def beginTransaction(): Unit
    def send(topic: String, key: Array[Byte], value: Array[Byte],
        headers: Seq[(String, Array[Byte])]): Unit
    def commitTransaction(): Unit
    def abortTransaction(): Unit
  }

  /** Executor-side factory; serialized into the foreachPartition closure.
    * `lastCommitted` must read with read_committed isolation — an aborted
    * control record MUST NOT count. */
  trait TxnProducerFactory extends Serializable {
    def create(transactionalId: String): TxnProducer
    /** Highest batchId whose control record COMMITTED for this
      * transactional id, or -1 if none. */
    def lastCommitted(transactionalId: String, controlTopic: String): Long
  }

  /** The batch-id bridge: foreachBatch hands (frame, batchId) to the
    * pipeline, but sink callbacks are plain DataFrame => Unit (so custom
    * sinks stay trivial to write). The pipelines publish the current
    * batchId here for the duration of each batch; [[GraftStream
    * .kafkaSink]]'s transactional branch reads it. Driver-side
    * micro-batch threads only — never read on executors. */
  private val currentBatchId = new ThreadLocal[java.lang.Long]

  private[streaming] def withBatchId[A](batchId: Long)(body: => A): A = {
    currentBatchId.set(batchId)
    try body finally currentBatchId.remove()
  }

  private[streaming] def requireBatchId(): Long = {
    val id = currentBatchId.get()
    require(id != null,
      "transactional Kafka sink used outside a pipeline micro-batch: the " +
        "exactly-once guard needs the foreachBatch batchId (route the " +
        "sink through GraftStream.simple/delta, or wrap the call in " +
        "TransactionalKafka.withBatchId)")
    id.longValue()
  }

  /** Driver-side replay-guard cache: highest batchId known COMMITTED per
    * transactional id. The naive guard re-reads the control topic from
    * every partition of every micro-batch (txnSinkPartitions consumers ×
    * an O(topic-size) scan × every batch) — on a short-interval stream
    * that scan is the latency floor, and it grows with stream lifetime
    * until compaction catches up. Instead the driver primes each txnId
    * ONCE (first batch that writes through it in this JVM), ships the
    * primed map inside the foreachPartition closure, and advances it
    * locally after each successful batch — in the steady state the guard
    * read is free.
    *
    * SAFETY against concurrent duplicate producers (a zombie from a
    * previous driver, a hung task from a failed run, a speculative copy):
    * a cached value is only ever a LOWER BOUND on what committed, so the
    * "already committed → skip" direction is always safe (a commit cannot
    * be undone). The "not committed → write" direction is where a stale
    * value double-writes, and the task body defends it with ORDERING:
    * the producer is created FIRST (initTransactions fences every prior
    * producer of the txnId — after that point nobody else can commit),
    * and only then is the verdict taken. The fenced verdict uses the
    * primed value ONLY when it is `trusted` — advanced by a batch THIS
    * JVM's producers committed under their own fences, with no task retry
    * and speculation disabled. Every other case (first batch of a run,
    * re-prime after a failure, a retried/speculative attempt, speculation
    * enabled) does one live control-topic read AFTER the fence, which by
    * construction sees any commit a now-fenced duplicate managed to slip
    * in before the fence.
    *
    * A driver restart starts a fresh JVM → fresh cache → re-prime +
    * one fenced read per partition on the first batch, then free. */
  private[streaming] object ReplayGuard {
    /** (highest known committed batchId, trusted). `trusted` means the
      * value was advanced by a batch this JVM committed end-to-end under
      * its own producer fences; primed values read from the control topic
      * BEFORE any fence are not (a concurrent duplicate could commit in
      * the read-to-fence window). */
    private val cache = new java.util.concurrent.ConcurrentHashMap[
      String, (Long, Boolean)]()
    def prime(txnIds: Seq[String], controlTopic: String,
        factory: TxnProducerFactory): Map[String, (Long, Boolean)] =
      txnIds.map { id =>
        id -> cache.computeIfAbsent(id,
          _ => (factory.lastCommitted(id, controlTopic), false))
      }.toMap
    def advance(txnIds: Seq[String], batchId: Long): Unit =
      txnIds.foreach(id => cache.merge(id, (batchId, true),
        (a, b) => if (a._1 >= b._1) (a._1, true) else b))
    def invalidate(txnIds: Seq[String]): Unit =
      txnIds.foreach(cache.remove)
    private[streaming] def reset(): Unit = cache.clear()
  }

  /** The sink body: write `df` to `topic` inside per-partition
    * transactions for micro-batch `batchId`. Exposed with an explicit
    * batchId for tools that manage their own foreachBatch. */
  def write(df: DataFrame, conf: GraftConf, topic: String, batchId: Long,
      factory: TxnProducerFactory): Unit = {
    val controlTopic = conf.txnControlTopicOrDefault
    val appId = conf.applicationId
    // the same record shape the non-transactional kafkaSink writes: key as
    // UTF-8 string bytes, binary value, passthrough headers
    val shaped = df
      .selectExpr("CAST(key AS STRING) AS key",
        "CAST(value AS BINARY) AS value", "headers")
      .repartition(conf.txnSinkPartitions, col("key"))
    val txnIds = (0 until conf.txnSinkPartitions)
      .map(pid => s"$appId-$topic-p$pid")
    // one control-topic read per txnId per query run (driver-side), not
    // one per partition per batch — see ReplayGuard
    val primed = ReplayGuard.prime(txnIds, controlTopic, factory)
    // with speculation on, a duplicate attempt of ANY task can be running
    // concurrently with attempt 0 — no cached value is fence-safe then.
    // Auto-detected from the launch conf; the graft key is a runtime
    // override for deployments that know duplicates can race anyway.
    val speculation = df.sparkSession.sparkContext.getConf
      .getBoolean("spark.speculation", defaultValue = false) ||
      df.sparkSession.conf
        .get("spark.graft.txn.forceFencedReads", "false").toBoolean
    try shaped.foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val txnId = s"$appId-$topic-p$pid"
        val tc = org.apache.spark.TaskContext.get()
        val isRetry = tc != null &&
          (tc.attemptNumber() > 0 || tc.stageAttemptNumber() > 0)
        // FENCE FIRST: create() calls initTransactions(), which bumps the
        // txnId's epoch and fences every prior producer — only after this
        // point is "nothing else can commit this txnId" true, so the
        // replay verdict must not be taken before it (a zombie driver, a
        // hung task from a failed run, or a speculative copy could commit
        // the batch in a read-to-fence window and a pre-fence "not
        // committed" answer would double-write it).
        val producer = factory.create(txnId)
        try {
          val committedUpTo = primed.get(txnId) match {
            // the skip direction is monotone-safe from ANY reading: a
            // commit observed once cannot be undone by a later fence
            case Some((v, _)) if v >= batchId => v
            // steady state: the value was advanced under this JVM's own
            // fences and no duplicate attempt can exist — trust it, the
            // control topic is not read at all
            case Some((v, trusted)) if trusted && !isRetry &&
                !speculation => v
            // everything else answers from a POST-fence live read: any
            // commit by a now-fenced duplicate is visible to it
            case _ => factory.lastCommitted(txnId, controlTopic)
          }
          if (committedUpTo >= batchId) {
            // replay of a committed partition: every record here already
            // landed inside a committed transaction — drain and skip
            ()
          } else {
            producer.beginTransaction()
            try {
              rows.foreach { r =>
                val key = r.getAs[String]("key") match {
                  case null => null
                  case s => s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
                }
                val hs = r.getAs[scala.collection.Seq[
                  org.apache.spark.sql.Row]]("headers") match {
                  case null => Seq.empty[(String, Array[Byte])]
                  case seq => seq.toSeq.map(h =>
                    h.getString(0) -> h.getAs[Array[Byte]](1))
                }
                producer.send(topic, key, r.getAs[Array[Byte]]("value"), hs)
              }
              producer.send(controlTopic,
                txnId.getBytes(java.nio.charset.StandardCharsets.UTF_8),
                java.nio.ByteBuffer.allocate(8).putLong(batchId).array(),
                Seq.empty)
              producer.commitTransaction()
            } catch {
              case t: Throwable =>
                try producer.abortTransaction()
                catch { case s: Throwable => t.addSuppressed(s) }
                throw t
            }
          }
        } finally producer.close()
    } catch {
      case t: Throwable =>
        // some partitions may have committed before the failure; the
        // primed map must not be trusted for the retry — drop the topic's
        // entries so the next attempt re-reads the control topic
        ReplayGuard.invalidate(txnIds)
        throw t
    }
    // every partition committed (or skipped an already-committed replay):
    // the guard can advance locally, no control-topic read needed
    ReplayGuard.advance(txnIds, batchId)
  }

  /** Real factory: builds `org.apache.kafka.clients.producer.KafkaProducer`
    * / `...consumer.KafkaConsumer` by NAME from the connector's bundled
    * kafka-clients. `producerProps`/`consumerProps` are plain (unprefixed)
    * client configs — [[graft.core.GraftConf.rawKafkaClientProps]] derives
    * them from the same security fields the connector options use. */
  final class ReflectiveKafkaTxnFactory(
      bootstrapServers: String,
      clientProps: Map[String, String],
      producerProps: Map[String, String] = Map.empty)
      extends TxnProducerFactory {

    private def propsMap(base: Map[String, String],
        extra: (String, String)*): java.util.Map[String, AnyRef] = {
      val m = new java.util.HashMap[String, AnyRef]()
      base.foreach { case (k, v) => m.put(k, v) }
      m.put("bootstrap.servers", bootstrapServers)
      extra.foreach { case (k, v) => m.put(k, v) }
      m
    }

    def create(transactionalId: String): TxnProducer = {
      // producerProps carries the sink's durability hardening (unbounded
      // retries/max.block.ms, timeout tuning — GraftConf
      // .rawKafkaProducerProps); the pinned extras below override anything
      // that would conflict with the transactional contract
      val cfg = propsMap(clientProps ++ producerProps,
        "transactional.id" -> transactionalId,
        "enable.idempotence" -> "true",
        "acks" -> "all",
        "key.serializer" ->
          "org.apache.kafka.common.serialization.ByteArraySerializer",
        "value.serializer" ->
          "org.apache.kafka.common.serialization.ByteArraySerializer")
      val cls = Class.forName("org.apache.kafka.clients.producer.KafkaProducer")
      val recCls = Class.forName(
        "org.apache.kafka.clients.producer.ProducerRecord")
      val raw = cls.getConstructor(classOf[java.util.Map[_, _]])
        .newInstance(cfg)
      val recCtor = recCls.getConstructor(classOf[String],
        classOf[java.lang.Integer], classOf[Object], classOf[Object],
        classOf[java.lang.Iterable[_]])
      val headerCls = Class.forName(
        "org.apache.kafka.common.header.internals.RecordHeader")
      val headerCtor = headerCls.getConstructor(classOf[String],
        classOf[Array[Byte]])
      def call(name: String, args: AnyRef*): AnyRef = {
        val m = cls.getMethods.find(m => m.getName == name &&
          m.getParameterCount == args.length).getOrElse(
          throw new NoSuchMethodException(s"KafkaProducer.$name"))
        m.invoke(raw, args: _*)
      }
      call("initTransactions")
      new TxnProducer {
        def beginTransaction(): Unit = call("beginTransaction")
        def send(topic: String, key: Array[Byte], value: Array[Byte],
            headers: Seq[(String, Array[Byte])]): Unit = {
          val hs = new java.util.ArrayList[AnyRef]()
          headers.foreach { case (k, v) =>
            hs.add(headerCtor.newInstance(k, v).asInstanceOf[AnyRef]) }
          val rec = recCtor.newInstance(topic, null, key, value, hs)
            .asInstanceOf[AnyRef]
          call("send", rec)
          ()
        }
        def commitTransaction(): Unit = call("commitTransaction")
        def abortTransaction(): Unit = call("abortTransaction")
        def close(): Unit = call("close")
      }
    }

    def lastCommitted(transactionalId: String, controlTopic: String): Long = {
      val cfg = propsMap(clientProps,
        "group.id" -> s"graft-txn-guard-${java.util.UUID.randomUUID()}",
        "enable.auto.commit" -> "false",
        "isolation.level" -> "read_committed",
        "auto.offset.reset" -> "earliest",
        "key.deserializer" ->
          "org.apache.kafka.common.serialization.ByteArrayDeserializer",
        "value.deserializer" ->
          "org.apache.kafka.common.serialization.ByteArrayDeserializer")
      val cls = Class.forName("org.apache.kafka.clients.consumer.KafkaConsumer")
      val tpCls = Class.forName("org.apache.kafka.common.TopicPartition")
      val raw = cls.getConstructor(classOf[java.util.Map[_, _]])
        .newInstance(cfg)
      // every arg on this path is a non-primitive object, so demand
      // assignability: poll(Duration) must win over the deprecated
      // poll(long) overload (same name, same arity — a primitive escape
      // hatch here would let reflection pick the wrong one)
      def call(name: String, args: AnyRef*): AnyRef = {
        val m = cls.getMethods.find(m => m.getName == name &&
          m.getParameterCount == args.length &&
          m.getParameterTypes.zip(args).forall { case (t, a) =>
            a == null || t.isInstance(a) }).getOrElse(
          throw new NoSuchMethodException(s"KafkaConsumer.$name"))
        m.invoke(raw, args: _*)
      }
      try {
        val parts = call("partitionsFor", controlTopic)
          .asInstanceOf[java.util.List[AnyRef]]
        if (parts == null || parts.isEmpty) return -1L
        val tps = new java.util.ArrayList[AnyRef]()
        val piCls = Class.forName("org.apache.kafka.common.PartitionInfo")
        val partOf = piCls.getMethod("partition")
        val tpCtor = tpCls.getConstructor(classOf[String], classOf[Int])
        parts.forEach(pi => tps.add(tpCtor.newInstance(controlTopic,
          partOf.invoke(pi).asInstanceOf[java.lang.Integer])
          .asInstanceOf[AnyRef]))
        call("assign", tps)
        call("seekToBeginning", tps)
        val end = call("endOffsets", tps)
          .asInstanceOf[java.util.Map[AnyRef, java.lang.Long]]
        var best = -1L
        def done: Boolean = {
          var ok = true
          end.forEach { (tp, off) =>
            val pos = call("position", tp).asInstanceOf[java.lang.Long]
            if (pos < off) ok = false
          }
          ok
        }
        val dur = java.time.Duration.ofMillis(500)
        val recsCls = Class.forName(
          "org.apache.kafka.clients.consumer.ConsumerRecords")
        val recCls = Class.forName(
          "org.apache.kafka.clients.consumer.ConsumerRecord")
        val keyOf = recCls.getMethod("key")
        val valOf = recCls.getMethod("value")
        val iterOf = recsCls.getMethod("iterator")
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        while (!done && System.nanoTime() < deadline) {
          val recs = call("poll", dur)
          val it = iterOf.invoke(recs).asInstanceOf[java.util.Iterator[AnyRef]]
          while (it.hasNext) {
            val r = it.next()
            val k = keyOf.invoke(r).asInstanceOf[Array[Byte]]
            val v = valOf.invoke(r).asInstanceOf[Array[Byte]]
            if (k != null && v != null && v.length == 8 &&
                new String(k, java.nio.charset.StandardCharsets.UTF_8)
                  == transactionalId)
              best = math.max(best,
                java.nio.ByteBuffer.wrap(v).getLong)
          }
        }
        // Only a FULLY-drained read (position == captured end offset on
        // every partition) may return a verdict. Returning the partial
        // `best` on deadline expiry would make a committed partition look
        // uncommitted and re-write its records — a silent exactly-once
        // violation in the guard that exists to prevent exactly that.
        // Throw instead: the Spark task fails and retries, and a broker
        // too slow to serve the control topic in 30s blocks the sink
        // loudly rather than corrupting it.
        if (!done)
          throw new IllegalStateException(
            s"transactional replay guard could not drain control topic " +
              s"'$controlTopic' to its end offsets within 30s — refusing " +
              "to answer from a partial read (a partial answer could " +
              "report a committed batch as uncommitted and double-write " +
              "it); check broker health / control-topic size and retry")
        best
      } finally call("close")
    }
  }
}
