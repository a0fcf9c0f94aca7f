package graft.operators

import graft.SparkSpec

import java.sql.Timestamp

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("windowNavigation: lag/lead/ntile/first share one window") {
    val ts = (d: Int) => Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    val orders = Seq(
      (1L, 10L, ts(1), 100.0),
      (1L, 11L, ts(2), 200.0),
      (1L, 12L, ts(3), 300.0),
      (1L, 13L, ts(4), 400.0),
      (2L, 20L, ts(5), 50.0))
      .toDF("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    val out = Relational.windowNavigation(orders).collect()
      .map(r => r.getLong(r.fieldIndex("o_orderkey")) ->
        (Option(r.get(r.fieldIndex("prev_price"))),
          Option(r.get(r.fieldIndex("next_price"))),
          r.getInt(r.fieldIndex("quartile")),
          r.getDouble(r.fieldIndex("first_price")))).toMap
    assert(out(10L) == ((None, Some(200.0), 1, 100.0)))
    assert(out(11L) == ((Some(100.0), Some(300.0), 2, 100.0)))
    assert(out(12L) == ((Some(200.0), Some(400.0), 3, 100.0)))
    assert(out(13L) == ((Some(300.0), None, 4, 100.0)))
    // the second customer is its own partition
    assert(out(20L) == ((None, None, 1, 50.0)))
    // all four functions fold into ONE Window operator → one exchange
    val plan = Relational.windowNavigation(orders)
      .queryExecution.executedPlan.toString
    assert("(?s)Window".r.findAllIn(plan).size == 1,
      s"expected a single Window node:\n$plan")
  }

  test("dateFunctions: extraction, arithmetic, truncation, boundaries") {
    // 2024-02-15 is a Thursday in a leap February
    val orders = Seq((1L, Timestamp.valueOf("2024-02-15 00:00:00")))
      .toDF("o_orderkey", "o_orderdate")
    val r = Relational.dateFunctions(orders).head()
    def d(s: String) = java.sql.Date.valueOf(s)
    assert(r.getInt(r.fieldIndex("yr")) == 2024)
    assert(r.getInt(r.fieldIndex("qtr")) == 1)
    assert(r.getInt(r.fieldIndex("mth")) == 2)
    assert(r.getInt(r.fieldIndex("dom")) == 15)
    assert(r.getInt(r.fieldIndex("dow")) == 5, "Thursday, Sunday = 1")
    assert(r.getDate(r.fieldIndex("due_date")) == d("2024-03-16"))
    assert(r.getDate(r.fieldIndex("month_end")) == d("2024-02-29"),
      "leap-year February")
    assert(r.getDate(r.fieldIndex("quarter_start")) == d("2024-01-01"))
  }

  test("valueHistogram bins into equal widths, edges clamp to the top bucket") {
    val events = Seq(0.0, 0.5, 1.0, 5.0, 9.99, 10.0).map(v => (1L, v))
      .toDF("event_id", "value")
    val out = Relational.valueHistogram(events, buckets = 10).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .toMap
    // width 1.0 over [0,10]: 0.0/0.5 → b0, 1.0 → b1, 5.0 → b5,
    // 9.99 → b9, and the max itself clamps into b9
    assert(out(0L) == ((0.0, 1.0, 2L)))
    assert(out(1L) == ((1.0, 2.0, 1L)))
    assert(out(5L) == ((5.0, 6.0, 1L)))
    assert(out(9L) == ((9.0, 10.0, 2L)))
    assert(out.values.map(_._3).sum == 6L)
  }

  test("groupCorrelation: exact decimal moments, partition-stable") {
    // y = 2x exactly in one group → r = 1; anti-correlated in the other
    val li = (Seq.tabulate(50)(i => ("A", i.toDouble, 2.0 * i)) ++
      Seq.tabulate(50)(i => ("B", i.toDouble, -3.0 * i + 1000)))
      .toDF("l_returnflag", "l_quantity", "l_extendedprice")
    val out = Relational.groupCorrelation(li).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out("A")._1 == 50L && math.abs(out("A")._2 - 1.0) < 1e-12)
    assert(math.abs(out("B")._2 + 1.0) < 1e-12)
    // bit-identical under repartition (decimal sums are order-independent)
    val again = Relational.groupCorrelation(li.repartition(13)).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(again == out)
  }

  test("latestPerKey compacts a changelog to the newest row per key") {
    val ts = (s: Int) => Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
    val events = Seq(
      (1L, 100L, "create", 1.0, ts(1)),
      (1L, 101L, "update", 2.0, ts(2)),
      (1L, 102L, "update", 3.0, ts(3)),
      // same timestamp as 102 → higher event_id wins
      (1L, 103L, "delete", 4.0, ts(3)),
      (2L, 200L, "create", 9.0, ts(1)))
      .toDF("user_id", "event_id", "event_type", "value", "ts")
    graft.functions.GraftFunctions.register(spark)
    val out = Relational.latestPerKey(events).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2),
        r.getDouble(3))).toMap
    assert(out(1L) == ((103L, "delete", 4.0)))
    assert(out(2L) == ((200L, "create", 9.0)))
    assert(out.size == 2)
  }

  test("bloomPrefilteredJoin: exact join results behind a bloom-probe scan filter") {
    val fact = (1L to 1000L).map(k => (k, k * 2.0)).toDF("fk", "v")
    val dim = Seq(10L, 20L, 30L, 40L).map(k => (k, s"d$k")).toDF("dk", "attr")
    val out = Relational.bloomPrefilteredJoin(fact, dim, "fk", "dk",
      expectedKeys = 1000L)
    val plain = fact.join(dim, $"fk" === $"dk")
      .select($"fk", $"v", $"dk", $"attr").collect().toSet
    assert(out.select($"fk", $"v", $"dk", $"attr").collect().toSet == plain)
    // the probe is a pre-join filter on the fact side (asserted on the
    // analyzed plan: over in-memory test relations ConvertToLocalRelation
    // legitimately evaluates the filter at optimization time; on a file
    // source it stays in the scan stage — PlanQualitySpec pins that)
    val plan = out.queryExecution.analyzed.toString
    assert(plan.contains("graft_bloom_probe"), s"bloom probe in plan:\n$plan")
  }

  test("bloomPrefilteredJoin memoizes the sketch broadcast across calls") {
    val fact = (1L to 500L).map(k => (k, k * 2.0)).toDF("fk", "v")
    // two INDEPENDENTLY-built but identical dim frames: the memo keys on
    // the canonicalized plan, so the second call must reuse the first
    // call's broadcast instead of building (and leaking) a new sketch
    def dim() = Seq(10L, 20L, 30L).map(k => (k, s"d$k")).toDF("dk", "attr")
    Relational.clearBloomSketchCache()
    val before = Relational.sketchBuilds.get()
    val a = Relational.bloomPrefilteredJoin(fact, dim(), "fk", "dk",
      expectedKeys = 500L).collect().toSet
    assert(Relational.sketchBuilds.get() == before + 1)
    val b = Relational.bloomPrefilteredJoin(fact, dim(), "fk", "dk",
      expectedKeys = 500L).collect().toSet
    assert(Relational.sketchBuilds.get() == before + 1,
      "second identical call rebuilt the sketch — the memo missed")
    assert(a == b)
    // a DIFFERENT dim must NOT hit the memo (that would be the wrong
    // sketch: false negatives silently dropping matching fact rows)
    val other = Seq(40L, 50L).map(k => (k, s"d$k")).toDF("dk", "attr")
    val c = Relational.bloomPrefilteredJoin(fact, other, "fk", "dk",
      expectedKeys = 500L)
    assert(Relational.sketchBuilds.get() == before + 2)
    assert(c.select($"fk").collect().map(_.getLong(0)).toSet ==
      Set(40L, 50L))
    Relational.clearBloomSketchCache()
  }

  test("equiDepthHistogram reproduces ntile over a distributed rank") {
    // 10 rows into 4 buckets → sizes 3,3,2,2 by NTILE; values 1..10 with
    // shuffled ids so the rank really derives from value order
    val rows = Seq(7, 3, 9, 1, 5, 10, 2, 8, 4, 6).zipWithIndex
      .map { case (v, i) => (v.toDouble, i.toLong) }
    val out = Relational.equiDepthHistogram(
      rows.toDF("value", "event_id"), buckets = 4, partitions = 3)
      .collect().map(r => r.getInt(0) -> (r.getLong(1),
        r.getDouble(2), r.getDouble(3))).toMap
    assert(out(1) == ((3L, 1.0, 3.0)))
    assert(out(2) == ((3L, 4.0, 6.0)))
    assert(out(3) == ((2L, 7.0, 8.0)))
    assert(out(4) == ((2L, 9.0, 10.0)))
  }

  test("conversionFunnel: stage timestamps must strictly follow the prior stage") {
    val ts = (s: Int) => Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
    val events = Seq(
      // user 1 completes the whole funnel in order
      (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(3)),
      // user 2 clicks BEFORE viewing → click stage not reached
      (2L, "click", ts(1)), (2L, "view", ts(2)), (2L, "purchase", ts(3)),
      // user 3 views only
      (3L, "view", ts(1)))
      .toDF("user_id", "event_type", "ts")
    val out = Relational.conversionFunnel(events)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out == Map("view" -> 3L, "click" -> 1L, "purchase" -> 1L))
  }

  test("equiDepthHistogram equals a local ntile on random data (property)") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    val gen = for {
      n <- Gen.choose(1, 200)
      vals <- Gen.listOfN(n, Gen.choose(-1000, 1000).map(_ / 7.0))
      k <- Gen.choose(1, 9)
    } yield (vals, k)
    val prop = Prop.forAll(gen) { case (vals, k) =>
      val rows = vals.zipWithIndex.map { case (v, i) => (v, i.toLong) }
      // local NTILE: sort, first n%k buckets take ceil(n/k) rows
      val sorted = rows.sortBy(r => (r._1, r._2)).map(_._1)
      val (n, base, rem) = (rows.size, rows.size / k, rows.size % k)
      val local = (1 to k).flatMap { b =>
        val sz = if (b <= rem) base + 1 else base
        val off = if (b <= rem) (b - 1) * (base + 1)
          else rem * (base + 1) + (b - 1 - rem) * base
        val slice = sorted.slice(off, off + sz)
        if (slice.isEmpty) None
        else Some(b -> ((slice.size.toLong, slice.min, slice.max)))
      }.toMap
      val got = Relational.equiDepthHistogram(
        rows.toDF("value", "event_id"), buckets = k, partitions = 3)
        .collect().map(r => r.getInt(0) ->
          ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
      got == local
    }
    val res = check(Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("snapshotDiff equals a local diff on random snapshots (property)") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    val snapGen = Gen.listOfN(40, for {
      k <- Gen.choose(0L, 25L)
      v <- Gen.choose(0, 5).map(_.toDouble)
    } yield (k, v)).map(_.toMap)
    val prop = Prop.forAll(snapGen, snapGen) { (o, n) =>
      val local = (o.keySet ++ n.keySet).flatMap { k =>
        (o.get(k), n.get(k)) match {
          case (Some(_), None) => Some(k -> "delete")
          case (None, Some(_)) => Some(k -> "insert")
          case (Some(a), Some(b)) if a != b => Some(k -> "update")
          case _ => None
        }
      }.toMap
      val got = Relational.snapshotDiff(
        o.toSeq.toDF("k", "p"), n.toSeq.toDF("k", "p"), "k", Seq("p"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      got == local
    }
    val res = check(Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("snapshotDiff composite keys: per-key-tuple classification") {
    val oldSnap = Seq(("t1", 1L, 10.0), ("t1", 2L, 20.0), ("t2", 1L, 5.0))
      .toDF("tenant", "id", "p")
    val newSnap = Seq(("t1", 1L, 11.0), ("t2", 1L, 5.0), ("t2", 2L, 7.0))
      .toDF("tenant", "id", "p")
    val out = Relational.snapshotDiff(
      oldSnap, newSnap, Seq("tenant", "id"), Seq("p"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getString(2)).toMap
    // (t1,1) updated; (t1,2) deleted; (t2,2) inserted; (t2,1) unchanged —
    // same id under another tenant must NOT collide
    assert(out == Map(
      ("t1", 1L) -> "update", ("t1", 2L) -> "delete", ("t2", 2L) -> "insert"))
  }

  test("snapshotDiff classifies insert/delete/update and drops unchanged") {
    val oldSnap = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "p")
    val newSnap = Seq((2L, 20.0), (3L, 31.0), (4L, 40.0)).toDF("k", "p")
    val out = Relational.snapshotDiff(oldSnap, newSnap, "k", Seq("p"))
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1),
        Option(r.get(2)), Option(r.get(3)))).toMap
    assert(out(1L) == (("delete", Some(10.0), None)))
    assert(out(3L) == (("update", Some(30.0), Some(31.0))))
    assert(out(4L) == (("insert", None, Some(40.0))))
    assert(!out.contains(2L), "unchanged rows are dropped")
  }

  test("weightedMedian takes the smallest price reaching half the weight") {
    // flag A: weights 1,1,6 on prices 10,20,30 → half of 8 is 4, first
    // price whose cumulative weight (1,2,8) doubles past 8 is 30.
    // flag B: equal weights 2,2 on 10,20 → 2·cumw(10)=4 == totw → 10
    // (lower weighted median takes the earlier price on the boundary).
    val li = Seq(
      ("A", 10.0, 1.0), ("A", 20.0, 1.0), ("A", 30.0, 6.0),
      ("B", 10.0, 2.0), ("B", 20.0, 2.0))
      .toDF("l_returnflag", "l_extendedprice", "l_quantity")
    val out = Relational.weightedMedian(li).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out("A") == (30.0, 8.0))
    assert(out("B") == (10.0, 4.0))
    // the two-phase offset path (forced: every group > 1 row) must be
    // bit-identical to the single-window path
    val twoPhase = Relational.weightedMedian(li, maxSingleSortRows = 1L)
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(twoPhase == out)
  }

  test("groupMode picks the most frequent value, ties lexicographic") {
    val orders = Seq(
      (1L, "HIGH"), (1L, "HIGH"), (1L, "LOW"),
      (2L, "B"), (2L, "A"))  // 1-1 tie → "A"
      .toDF("o_custkey", "o_orderpriority")
    val out = Relational.groupMode(orders).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out == Map(1L -> ("HIGH", 2L), 2L -> ("A", 1L)))
  }

  test("property: two-phase weighted median equals single-window on random tables") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Prop.forAll
    val liGen = Gen.listOfN(80, for {
      flag <- Gen.oneOf("A", "N", "R")
      // coarse price grid so duplicate prices (shared cumw cells) occur
      price <- Gen.choose(1, 25).map(_ * 10.0)
      qty <- Gen.choose(1, 50).map(_.toDouble)
    } yield (flag, price, qty))
    val prop = forAll(liGen, Gen.oneOf(2, 7, 32)) { (rows, parts) =>
      val li = rows.toDF("l_returnflag", "l_extendedprice", "l_quantity")
      def res(maxRows: Long) =
        Relational.weightedMedian(li, partitions = parts,
            maxSingleSortRows = maxRows)
          .collect()
          .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
      Prop(res(Long.MaxValue) == res(1L))
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(result.passed, result.status.toString)
  }

  test("ratioToReport: shares within each region sum to one") {
    val customer = Seq((1L, 10, 100.0), (2L, 10, 50.0), (3L, 11, 50.0),
      (4L, 20, 7.0))
      .toDF("c_custkey", "c_nationkey", "c_acctbal")
    val nation = Seq((10, "AA", 1), (11, "AB", 1), (20, "BA", 2))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val out = Relational.ratioToReport(customer, nation).collect()
      .map(r => r.getString(1) -> (r.getDouble(2), r.getDouble(3),
        r.getDouble(4))).toMap
    assert(out("AA") == (150.0, 200.0, 0.75))
    assert(out("AB") == (50.0, 200.0, 0.25))
    assert(out("BA") == (7.0, 7.0, 1.0))
  }

  test("integrityReport counts orphans per foreign-key edge") {
    val nation = Seq((1, "AA", 1)).toDF("n_nationkey", "n_name", "n_regionkey")
    val customer = Seq((1L, 1), (2L, 9)).toDF("c_custkey", "c_nationkey")
    val orders = Seq((10L, 1L), (11L, 99L)).toDF("o_orderkey", "o_custkey")
    val part = Seq((100L, "p")).toDF("p_partkey", "p_name")
    val supplier = Seq((200L, "s")).toDF("s_suppkey", "s_name")
    val lineitem = Seq(
      (10L, 100L, 200L), (10L, 101L, 200L), (12L, 100L, 201L))
      .toDF("l_orderkey", "l_partkey", "l_suppkey")
    val out = Relational.integrityReport(customer, orders, lineitem,
        part, supplier, nation).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("lineitem->orders") == (3L, 1L))   // orderkey 12
    assert(out("lineitem->part") == (3L, 1L))     // partkey 101
    assert(out("lineitem->supplier") == (3L, 1L)) // suppkey 201
    assert(out("orders->customer") == (2L, 1L))   // custkey 99
    assert(out("customer->nation") == (2L, 1L))   // nationkey 9
  }

  test("urgentOnlyCustomers: EXISTS keeps, NOT EXISTS vetoes") {
    val customer = Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("c_custkey", "c_name")
    val orders = Seq(
      (1L, "1-URGENT", "O"),            // in: urgent, never F
      (2L, "1-URGENT", "O"), (2L, "2-HIGH", "F"), // out: has an F order
      (3L, "2-HIGH", "O"))              // out: no urgent order
      .toDF("o_custkey", "o_orderpriority", "o_orderstatus")
    val out = Relational.urgentOnlyCustomers(customer, orders).collect()
      .map(_.getLong(0)).toSeq
    assert(out == Seq(1L))
  }

  test("rollingRevenue sums the trailing week inclusive; ties share a frame") {
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-${d}%02d 00:00:00")
    val orders = Seq(
      (1L, 10L, ts(1), 100.0),
      (2L, 10L, ts(5), 50.0),   // within 7 days of #1
      (3L, 10L, ts(9), 25.0),   // 8 days after #1: out; 4 after #2: in
      (4L, 10L, ts(9), 5.0),    // same instant as #3 → shares its frame
      (5L, 20L, ts(1), 7.0))    // other customer
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val out = Relational.rollingRevenue(orders).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getLong(3))).toMap
    assert(out(1L) == (100.0, 1L))
    assert(out(2L) == (150.0, 2L))
    // RANGE frame: both day-9 orders see (50 + 25 + 5) and each other
    assert(out(3L) == (80.0, 3L))
    assert(out(4L) == (80.0, 3L))
    assert(out(5L) == (7.0, 1L))
  }

  test("trimmedMean drops rank tails; outlier no longer moves the center") {
    // group a: 1..10 plus a stuck-sensor 1000 → n=11, floor(1.1)=1 cut per
    // side drops {1} and {1000}; mean(2..10) = 6. group b: too small to
    // trim (n=2, floor(0.2)=0) → plain mean.
    val events = ((1 to 10).map(i => ("a", i.toDouble)) :+ ("a", 1000.0))
      .++(Seq(("b", 4.0), ("b", 8.0)))
      .zipWithIndex
      .map { case ((t, v), i) => (i.toLong, t, v) }
      .toDF("event_id", "event_type", "value")
    val out = Relational.trimmedMean(events).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(out("a") == (11L, 9L, 6.0))
    assert(out("b") == (2L, 2L, 6.0))
  }

  test("monthlyGrowth: previous-month figure and growth fraction") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val orders = Seq(
      (1L, "2024-01-05", 100.0), (2L, "2024-01-20", 100.0),
      (3L, "2024-02-10", 300.0),
      (4L, "2024-04-01", 150.0)) // March missing entirely
      .toDF("o_orderkey", "d", "o_totalprice")
      .withColumn("o_orderdate", col("d").cast("timestamp"))
    val out = Relational.monthlyGrowth(orders).collect()
      .map(r => r.getDate(0).toString ->
        (r.getDouble(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(out("2024-01-01") == (200.0, 2L, None, None))
    assert(out("2024-02-01") == (300.0, 1L, Some(200.0), Some(0.5)))
    // the gap month is simply absent; April compares against February
    assert(out("2024-04-01") == (150.0, 1L, Some(300.0), Some(-0.5)))
    assert(!out.contains("2024-03-01"))
  }

  test("userEventEntropy: single-type user reads exactly 0; uniform " +
    "two-type user reads ~ln 2") {
    val ev = Seq(
      (1L, "click"), (1L, "click"), (1L, "click"),          // pure bot
      (2L, "click"), (2L, "click"), (2L, "view"), (2L, "view"))
      .toDF("user_id", "event_type")
    val out = Relational.userEventEntropy(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    // one type: ln(n)_g − n·ln(n)_g/n cancels EXACTLY on the grid
    assert(out(1L)._1 == 1L && out(1L)._2 == 3L && out(1L)._3 == 0.0,
      s"$out")
    // uniform over 2 types: H = ln(4)_g − ln(2)_g ≈ ln 2
    assert(out(2L)._1 == 2L && out(2L)._2 == 4L, s"$out")
    assert(math.abs(out(2L)._3 - math.log(2.0)) < 1e-4, s"$out")
  }

  test("incrementalPricingSummary: merged partial states equal the full " +
    "recompute bit-for-bit, for every split point") {
    val ts = Timestamp.valueOf("1998-01-01 00:00:00")
    val li = Seq.tabulate(40) { i =>
      (i.toLong, if (i % 2 == 0) "A" else "N", "O",
        1.0 + i * 0.25, 1000.0 + i * 3.17, 0.01 * (i % 7), 0.04, ts)
    }.toDF("l_orderkey", "l_returnflag", "l_linestatus", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_shipdate")
    val full = Relational.pricingSummary(li).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.toSeq).toMap
    for (m <- Seq(2L, 5L)) {
      val merged = Relational.incrementalPricingSummary(
        li.filter($"l_orderkey" % m =!= 0L),
        li.filter($"l_orderkey" % m === 0L)).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.toSeq).toMap
      assert(merged == full,
        s"split mod $m drifted from the full recompute:\n$merged\n$full")
    }
  }
}
