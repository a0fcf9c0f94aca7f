package graft.operators

import graft.SparkSpec

/** Physical-plan regression pins for the properties the 100 TB design
  * depends on. A refactor that silently drops a broadcast hint, breaks
  * filter pushdown, or widens a scan would still pass value checks at test
  * scale — these specs fail it instead. */
class PlanQualitySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(q: String): String = {
    graft.functions.GraftFunctions.register(spark)
    // events.parquet carries TIMESTAMP(NANOS); Verify/Bench sessions set
    // this too (see Tables.events)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.SparkEntry.queries(q)(spark, sf)
      .queryExecution.executedPlan.toString
  }

  test("q1: the shipdate filter reaches the parquet scan") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"expected pushed shipdate filter:\n$p")
  }

  test("q2: the part dimension joins as a broadcast, not a shuffle") {
    val p = plan("q2_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), s"dimension join must not SMJ:\n$p")
  }

  test("q9: global top-k compiles to TakeOrderedAndProject (no full sort)") {
    val p = plan("q9_sort_limit")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("x1: a two-column projection scans only those columns") {
    val p = plan("x1_token_stats")
    val schema = "ReadSchema: struct<doc_id:bigint,text:string>"
    assert(p.contains(schema), s"expected pruned scan $schema:\n$p")
  }

  test("q4/q5: semi and anti joins stay semi/anti in the physical plan") {
    assert(plan("q4_semi_join").contains("LeftSemi"))
    assert(plan("q5_anti_join").contains("LeftAnti"))
  }

  test("q23/q31: the custom heap operator is the physical top-k") {
    // x7/s1-s3 also route through TopKPerKey but eagerly checkpoint their
    // results (plan not inspectable post-materialization); q23 and q31
    // expose the raw plan
    assert(plan("q23_topk_custom").contains("TopKPerKey"))
    assert(plan("q31_latest_upsert").contains("TopKPerKey"))
  }

  test("q67: the skew head is a TakeOrdered, never a full sort of keys") {
    // the cache bracket materializes the result (lineage truncated), so
    // the executed shape lives in lastMaterializedPlan (the house pin)
    plan("q67_key_skew")
    val p = Caching.lastMaterializedPlan
    assert(p.contains("TakeOrderedAndProject"),
      s"expected TakeOrdered head over the key counts:\n$p")
  }

  test("g11: the kcore query plans off the stored edge table, not the " +
    "fact tables") {
    // the serve path reads the parquet neighbor-edge table: the final
    // plan joins degree tables derived from checkpoint/parquet scans —
    // a regression that re-inlined g5's projection would drag the
    // lineitem/orders scans (and their join) back into every call
    val p = plan("g11_kcore")
    assert(!p.contains("lineitem") && !p.contains("orders"),
      s"kcore must serve from the stored neighbor index:\n$p")
  }

  test("d44/d45: the audit tables serve from materialized base passes — " +
      "no corpus rescan or rank chain in the public plan") {
    // lshVsExact joins two already-checkpointed pair tables; the
    // threshold sweep's legs filter one checkpointed base pass and join
    // materialized component labels. A regression that re-inlined the
    // shingle pipeline (explode → freq → window rank) into the public
    // plan would re-pay it once per threshold leg at 100 TB.
    for (q <- Seq("d44_lsh_vs_exact", "d45_threshold_sweep")) {
      val p = plan(q)
      assert(!p.contains("FileScan"), s"$q must not rescan the corpus:\n$p")
      assert(!p.contains("RowNumber") && !p.contains("Window"),
        s"$q must not re-derive the rank chain:\n$p")
    }
  }

  test("q3: two dimension joins broadcast under one TakeOrdered") {
    val p = plan("q3_join_topn")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q24/q35: bucketized range/interval joins never fall back to NLJ") {
    for (q <- Seq("q24_range_join", "q35_interval_join")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$q must stay an equi-join on the bucket key:\n$p")
    }
  }

  test("c2: mixing rates broadcast back; the corpus side has no exchange") {
    val p = plan("c2_domain_mix")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), s"rate join must broadcast:\n$p")
  }

  test("q43: per-group quantile windows shuffle by group, never single-partition") {
    val p = plan("q43_group_quantiles")
    assert(p.contains("hashpartitioning(event_type"),
      s"rank window must partition by group:\n$p")
    assert(!p.contains("SinglePartition"),
      s"no global single-task stage allowed:\n$p")
  }

  test("q36: the bloom probe filters the fact scan stage, before the join") {
    val p = plan("q36_bloom_join")
    val probeAt = p.indexOf("graft_bloom_probe")
    val joinAt = p.indexOf("HashJoin")
    assert(probeAt >= 0, s"bloom probe survived planning:\n$p")
    assert(joinAt >= 0 && probeAt > joinAt,
      s"probe must sit below the join in the plan tree:\n$p")
  }

  test("c15: the bloom probe prunes corpus shingles below the overlap join") {
    val p = plan("c15_decontaminate_bloom")
    val probeAt = p.indexOf("graft_bloom_probe")
    val joinAt = p.indexOf("HashJoin")
    assert(probeAt >= 0, s"bloom probe survived planning:\n$p")
    assert(joinAt >= 0 && probeAt > joinAt,
      s"probe must sit below the confirm join:\n$p")
  }

  test("s5: the lexical side joins the query tokens as a broadcast") {
    val p = plan("s5_hybrid_rrf")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TopKPerKey"), s"lex ranking must heap-reduce:\n$p")
  }

  test("x18/c16/e7/mm3/q46: pure projections — no exchange anywhere in the plan") {
    assert(!plan("x18_gopher_rules").contains("Exchange"))
    assert(!plan("c16_shuffle_shard").contains("Exchange"))
    assert(!plan("e7_binary_quantize").contains("Exchange"))
    assert(!plan("mm3_patch_extract").contains("Exchange"))
    assert(!plan("q46_unpivot").contains("Exchange"))
  }

  // d14 routes through Caching.withPersisted (one norm_url exchange shared
  // by the heap top-k and the dupe count), so its internal plan is not
  // inspectable here — same reason x7/x17/s1-s3 have no pin. Its heap
  // winner semantics are behavior-pinned in DedupSpec.

  // x17 routes through Caching.withPersisted and returns an eagerly
  // materialized frame (Scan ExistingRDD), so its internal plan is not
  // inspectable here — same reason x7/s1-s3 have no pin.

  test("q48: the gap-fill grid join stays within one hash-partitioning family") {
    // daily pre-agg, span agg, grid join, and forward-fill window all key
    // on user_id — no second exchange family over the fact table, and the
    // generated grid never becomes a nested-loop join
    val p = plan("q48_gap_fill")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"grid must equi-join on (user_id, day):\n$p")
  }

  test("q50: the RANGE frame runs as a single window, no self-join") {
    val p = plan("q50_rolling_range")
    assert(p.contains("Window"), p)
    assert(!p.contains("Join"), s"trailing frame must not expand to a join:\n$p")
  }

  test("q52: mode is heap argmax, not a rank window") {
    val p = plan("q52_group_mode")
    assert(p.contains("TopKPerKey"), p)
    assert(!p.contains("Window"), s"no per-group sort window:\n$p")
  }

  test("e12: centroids broadcast back over the corpus; bottom-k is the heap") {
    val p = plan("e12_centroid_outliers")
    assert(p.contains("BroadcastHashJoin"),
      s"label-centroid join must broadcast the tiny side:\n$p")
    assert(p.contains("TopKPerKey"), s"bottom-k must heap-reduce:\n$p")
  }

  test("d21: the edit-distance verify only runs inside block equi-joins") {
    val p = plan("d21_fuzzy_title")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"levenshtein must verify equi-join candidates only:\n$p")
    assert(p.contains("levenshtein"), p)
  }

  // for operators whose public output is lineage-truncated (Caching
  // bracket), the real executed shape is captured at the materialize seam
  private def materializedPlan(q: String): String = {
    plan(q)
    Caching.lastMaterializedPlan
  }

  test("d24: neighbor pairing is a bucket equi-join, offsets broadcast") {
    val p = materializedPlan("d24_sorted_neighborhood")
    // the rank-distance predicate must ride on the bucket EQUI-join — a
    // range-join fallback would nested-loop the whole corpus against itself
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"rank-window join must stay an equi-join:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"partition offsets must broadcast:\n$p")
  }

  test("d2/d26: the shingle families hash natively and key on longs — " +
    "no hex or concat_ws strings in the hot path (the r15 GC fix)") {
    val p2 = materializedPlan("d2_minhash_lsh")
    assert(p2.contains("graft_md5fold"),
      s"shingle bases must use the native digest fold:\n$p2")
    assert(!p2.contains("concat_ws"),
      s"band keys must be packed longs, not strings:\n$p2")
    assert(p2.contains("bk1") && p2.contains("bk2"), p2)
    val p26 = materializedPlan("d26_prefix_filter")
    assert(p26.contains("graft_md5fold"),
      s"prefix token ids must use the native digest fold:\n$p26")
    assert(!p26.contains("md5(concat"),
      s"no hex-string intermediates in the prefix family:\n$p26")
  }

  test("d41: the saturation gauge is one aggregate over the stored " +
    "stitch table — no shingle or candidate work in the plan") {
    val p = plan("d41_chain_saturation")
    assert(!p.contains("Join"),
      s"d41 must serve from the stored pairs, not rebuild them:\n$p")
  }

  test("e14: every vector scores against the broadcast centroid table") {
    val p = plan("e14_cluster_quality")
    // labels × vectors is intentionally a broadcast nested loop (the
    // centroid side is label-count rows); what must NOT appear is a
    // non-broadcast cartesian over the corpus
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), s"centroids must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"no unbroadcast cartesian over the corpus:\n$p")
  }

  test("x27: the BPE apply joins docs to a broadcast dictionary") {
    val p = materializedPlan("x27_bpe_doc_stats")
    assert(p.contains("BroadcastHashJoin"),
      s"word dictionary must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the vocab-sized dictionary must never SMJ:\n$p")
  }

  test("c23: the global weighted sample is TakeOrdered, never a full sort") {
    val p = plan("c23_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"),
      s"no global range-sort for a k-row sample:\n$p")
  }

  test("q59: interval coalescing is one user_id shuffle end to end") {
    val p = plan("q59_interval_merge")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(shuffles == 1,
      s"windows and aggregate must share the user_id exchange ($shuffles):\n$p")
  }

  test("q62: quantile bounds broadcast back over the fact scan") {
    val p = plan("q62_winsorize")
    assert(p.contains("BroadcastHashJoin"),
      s"per-group bounds must broadcast, not SMJ:\n$p")
  }

  test("q63: one user_id window family, no self-join") {
    val p = plan("q63_rolling_anomaly")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"rolling stats must come from the window, not a join:\n$p")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(shuffles == 1, s"one user_id exchange expected ($shuffles):\n$p")
  }

  test("q64: the six-table star join broadcasts every dimension side") {
    val p = plan("q64_regional_revenue")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"),
      s"co-nation filter must ride the joins, not a product:\n$p")
  }

  test("g2: per-round winner is the TopKPerKey heap, never a rank window") {
    // the final round's materialized plan: top-1-per-dst must be the
    // partial-aggregating heap exec (map-side prune), not a
    // row_number window (full shuffle + sort of every vote)
    val p = materializedPlan("g2_label_prop")
    assert(p.contains("TopKPerKey"),
      s"expected the TopKPerKey exec in the LPA round:\n$p")
    assert(!p.contains("Window"),
      s"no rank window in the vote-winner step:\n$p")
  }

  test("x34: readability is one projection over a two-column pruned scan") {
    val p = plan("x34_readability")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"expected pruned doc_id+text scan:\n$p")
    assert(!p.contains("Exchange"),
      s"a per-row score must not shuffle:\n$p")
  }

  test("x29: scalar totals broadcast; the collocation head is TakeOrdered") {
    val p = materializedPlan("x29_pmi_collocations")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"),
      s"1-row totals must broadcast:\n$p")
  }

  test("s20-from-index: the gauge is join-free aggregates over stored cells") {
    // the serve form must read the stored table and aggregate — any Join
    // in the plan means a quantizer retrain sneaked back in (the r10
    // inline-retraining regression this overload removed)
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val idx = Similarity.ivfAdcIndex(emb)
    val p = Similarity.cellBalance(idx).queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"stored-cell gauge must not join:\n$p")
    assert(!p.contains("kmeans"), p)
  }

  test("e18: whitening is one broadcast of the 64-row stats table") {
    val p = plan("e18_standardize")
    assert(p.contains("BroadcastHashJoin"),
      s"per-dim stats must broadcast into the corpus explode:\n$p")
    assert(!p.contains("SortMergeJoin"), s"64-row side must never SMJ:\n$p")
  }

  test("mm13: the motion window partitions by media, never globally") {
    val p = plan("mm13_motion_profile")
    assert(p.contains("Window"), p)
    // a global (unpartitioned) window logs 'No Partition Defined' and
    // plans a single-partition exchange; the per-media window must
    // partition by media_id
    assert(p.contains("hashpartitioning(media_id"),
      s"window must hash-partition by media_id:\n$p")
  }

  test("c28: curriculum windows partition by source, no global sort") {
    val p = plan("c28_curriculum")
    assert(p.contains("hashpartitioning(source"),
      s"rank/count windows must partition by source:\n$p")
    assert(!p.contains("SinglePartition"),
      s"a curriculum export must never serialize into one task:\n$p")
  }

  test("e20/e21: geometry gauges are aggregate folds, no pairwise join") {
    // e20's closed form exists precisely to avoid the n² cosine join
    val p20 = plan("e20_anisotropy")
    assert(!p20.contains("SortMergeJoin") && !p20.contains("Cartesian"),
      s"anisotropy must not plan a pairwise join:\n$p20")
    // e21 folds the 2080 Gram cells; its only join is the broadcast of
    // the 2080-row (k,i,j) index map
    val p21 = plan("e21_participation_ratio")
    assert(!p21.contains("SortMergeJoin") && !p21.contains("Cartesian"),
      s"participation ratio must not plan a pairwise join:\n$p21")
  }

  test("g9: one wedge pass — a single Generate, at most three joins") {
    // the per-node counting explodes each triangle once; a 3-way union
    // would re-execute the wedge-join chain per arm (caught by the r11
    // explain audit, pinned here)
    val p = plan("g9_triangle_lcc")
    assert("(?m)^\\s*\\+?-?\\s*Generate ".r.findAllIn(p).size <= 1 &&
      p.contains("Generate explode"),
      s"triangle member rows must come from ONE explode:\n$p")
    val joins = "Join".r.findAllIn(p).size
    assert(joins <= 3, s"expected wedge+closing+leftouter only, got " +
      s"$joins joins:\n$p")
  }

  test("q68/e24: entropy and norm-band folds are pure aggregates — " +
    "no window, no join, no sort") {
    for (q <- Seq("q68_user_entropy", "e24_norm_bands")) {
      val p = plan(q)
      assert(!p.contains("Window") && !p.contains("Join") &&
        !p.contains("SortExec"),
        s"$q must be map-side-combined aggregates only:\n$p")
    }
  }

  test("round-13 queries: no cartesian product, no nested-loop join " +
    "anywhere in the executed plans") {
    // the anti-pattern sweep codified for the new surface: the frames
    // these queries materialize internally are audited through
    // lastMaterializedPlan (the caller-visible plan is the checkpoint
    // scan after lineage truncation)
    for (q <- Seq("g14_lpa_profile", "d38_dirty_buckets",
        "mm16_phash_dirty", "s25_centroid_drift", "c30_dedup_budget",
        "x40_hapax")) {
      val visible = plan(q)
      val internal = Caching.lastMaterializedPlan
      for ((tag, p) <- Seq("visible" -> visible, "internal" -> internal))
        assert(!p.contains("CartesianProduct") &&
          !p.contains("BroadcastNestedLoop"),
          s"$q has an unbounded join shape ($tag):\n$p")
    }
  }

  test("round-14 queries: no cartesian product, no nested-loop join " +
    "anywhere in the executed plans") {
    for (q <- Seq("q69_ivm_merge", "c31_anneal_mix",
        "c32_effective_tokens", "d39_chain_overlap", "x41_crossdoc_ngrams",
        "mm17_mix_allocation", "e25_align_uniformity", "s26_sq8_serve",
        "g15_ppr", "g16_feature_prop", "d40_chain_groups",
        "c33_gate_fairness")) {
      val visible = plan(q)
      val internal = Caching.lastMaterializedPlan
      for ((tag, p) <- Seq("visible" -> visible, "internal" -> internal))
        assert(!p.contains("CartesianProduct") &&
          !p.contains("BroadcastNestedLoop"),
          s"$q has an unbounded join shape ($tag):\n$p")
    }
  }

  test("q69: the merge re-aggregates 12 partial rows — no union of raw " +
    "row scans above the first aggregate") {
    // two partial HashAggregates (one per slice) + one merge aggregate;
    // the union must sit BETWEEN aggregates, not below them
    val p = plan("q69_ivm_merge")
    assert(!p.contains("CartesianProduct") && p.contains("Union"),
      s"expected a union of partial aggregates:\n$p")
    val aggs = "HashAggregate".r.findAllIn(p).size
    assert(aggs >= 6, // 2 slices x (partial+final) + merge (partial+final)
      s"expected partial aggregation on both slices plus a merge:\n$p")
  }
}
