package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming community membership — the serve path of the graph family's
  * stored [[graft.operators.Graph.LabelIndex]], matching the twins the
  * other expensive-artifact families already have ([[StreamDedup]] over
  * the near-dup index, [[StreamSimilarity]] over the IVF index): labels
  * are built nightly by the batch LPA job and written as lake tables;
  * arriving rows only LOOK UP, never propagate.
  *
  * Staleness contract is the index family's usual: a node that entered
  * the graph after the last build simply misses (`is_known = false`,
  * null label) — it is never assigned a wrong community. Per-batch cost
  * is two broadcast-able equi-joins against the stored tables, O(batch),
  * independent of graph size.
  */
object StreamGraph {

  /** Per-micro-batch lookup: which community does each arriving row's
    * `node` belong to, and does it sit on a community boundary. `labels`
    * is the stored (node, lab) table; `bridges` the stored
    * [[graft.operators.Graph.bridgeNodes]] output (node, label,
    * n_neighbor_labels, …, is_bridge). The sink receives the batch's
    * rows tagged with (label, is_known, n_neighbor_labels, is_bridge,
    * batch_id) — curation reads the flags to treat boundary-node rows
    * (mixed context, ambiguous domain) differently from
    * community-interior ones. */
  def membershipVsIndex(
      rows: DataFrame,
      labels: DataFrame,
      bridges: DataFrame,
      sink: DataFrame => Unit): StreamingQuery =
    rows.writeStream
      .queryName("graft-community-membership")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(batchMembership(batch, labels, bridges)
          .withColumn("batch_id", lit(batchId)))
        ()
      }
      .start()

  /** Batch twin of [[membershipVsIndex]]'s per-batch body, exposed so the
    * spec pins stream output == batch output on the same frames. The
    * batch must carry a `node` column in the label table's namespace
    * (the graph builders' `c:<custkey>` / `s:<suppkey>` ids). Left joins
    * throughout: unknown nodes survive with `is_known = false` rather
    * than disappearing from the batch. */
  def batchMembership(batch: DataFrame, labels: DataFrame,
      bridges: DataFrame): DataFrame =
    batch
      .join(labels.select(col("node"), col("lab").as("label")),
        Seq("node"), "left_outer")
      .join(
        bridges.select(col("node"), col("n_neighbor_labels"),
          col("is_bridge")),
        Seq("node"), "left_outer")
      .withColumn("is_known", col("label").isNotNull)
      .withColumn("is_bridge", coalesce(col("is_bridge"), lit(false)))

  /** Per-micro-batch k-core membership lookup: is each arriving row's
    * `node` core or pendant evidence in the stored affinity graph —
    * the curation weight [[StreamCuration]]'s gates read next to the
    * community label ([[graft.operators.Graph.kcore]]'s output written
    * as a lake table is the `core` argument). One broadcast-able
    * equi-join per batch, O(batch), independent of graph size. The
    * staleness contract matches [[membershipVsIndex]]: a node that
    * entered the graph after the last peel misses (`is_known = false`,
    * `in_core = false`) — it is never reported core on stale evidence. */
  def coreMembershipVsIndex(
      rows: DataFrame,
      core: DataFrame,
      sink: DataFrame => Unit): StreamingQuery =
    rows.writeStream
      .queryName("graft-core-membership")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(batchCoreMembership(batch, core)
          .withColumn("batch_id", lit(batchId)))
        ()
      }
      .start()

  /** Batch twin of [[coreMembershipVsIndex]]'s per-batch body. `core` is
    * the stored kcore table (supp, degree, core_degree, in_core); the
    * batch carries a `node` column in the same id namespace. Left join:
    * unknown nodes survive with `is_known = false`. */
  def batchCoreMembership(batch: DataFrame, core: DataFrame): DataFrame =
    batch
      .join(core.select(col("supp").as("node"), col("degree"),
        col("core_degree"), col("in_core")), Seq("node"), "left_outer")
      .withColumn("is_known", col("degree").isNotNull)
      .withColumn("in_core", coalesce(col("in_core"), lit(false)))
      .withColumn("core_degree", coalesce(col("core_degree"), lit(0L)))

  /** Per-micro-batch component lookup: which affinity-graph component
    * does each arriving row's `node` belong to, and how big is it — the
    * shard-routing input ([[graft.operators.Graph.componentSizes]]'s
    * stored output joined to the stored per-node component table): rows
    * of one component can be curated on one shard. Completes the
    * stored-graph serve family (labels, bridges, core, components).
    * Same staleness contract: post-build nodes miss loudly. */
  def componentMembershipVsIndex(
      rows: DataFrame,
      components: DataFrame,
      sizes: DataFrame,
      sink: DataFrame => Unit): StreamingQuery =
    rows.writeStream
      .queryName("graft-component-membership")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(batchComponentMembership(batch, components, sizes)
          .withColumn("batch_id", lit(batchId)))
        ()
      }
      .start()

  /** Batch twin of [[componentMembershipVsIndex]]'s per-batch body.
    * `components` is the stored (node, component) table (the CC engine's
    * per-node output); `sizes` the stored [[graft.operators.Graph
    * .componentSizes]] rollup (component, n_nodes, n_edges). */
  def batchComponentMembership(batch: DataFrame, components: DataFrame,
      sizes: DataFrame): DataFrame =
    batch
      .join(components.select(col("node"), col("component")),
        Seq("node"), "left_outer")
      .join(sizes.select(col("component"), col("n_nodes"),
        col("n_edges")), Seq("component"), "left_outer")
      .withColumn("is_known", col("component").isNotNull)

  /** Streaming membership-churn gauge (g13's twin — VERDICT r12 #8):
    * for each micro-batch of arriving rows, how many of its nodes sit
    * in a DIFFERENT component under the newly-landed build than under
    * the build consumers are still pinned to — the live "is the new
    * graph build a relabel or a restructure" readout, emitted per batch
    * while the nightly g13 report measures the whole index. One row per
    * batch: rows seen, nodes known to both builds, known to only one
    * (arrivals the old build predates, departures the new build
    * dropped), and the moved fraction over the both-known set. Two
    * broadcast-able equi-joins per batch, O(batch). Spec pins stream
    * output == [[batchMembershipChurn]] on the same frames. */
  def membershipChurnGauge(
      rows: DataFrame,
      membersOld: DataFrame,
      membersNew: DataFrame,
      sink: DataFrame => Unit): StreamingQuery =
    rows.writeStream
      .queryName("graft-membership-churn-gauge")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(batchMembershipChurn(batch, membersOld, membersNew)
          .withColumn("batch_id", lit(batchId)))
        ()
      }
      .start()

  /** Batch twin of [[membershipChurnGauge]]'s per-batch body. `moved`
    * compares component REPRESENTATIVES across builds: star-contraction
    * labels each component by its minimum node id, so two nodes moved
    * apart or together always shows up as a representative change for
    * at least one of them, and a pure relabel cannot occur (min-id is
    * canonical). Empty batch → empty report. */
  def batchMembershipChurn(batch: DataFrame, membersOld: DataFrame,
      membersNew: DataFrame): DataFrame =
    batch
      .join(membersOld.select(col("node"), col("component").as("c_old")),
        Seq("node"), "left_outer")
      .join(membersNew.select(col("node"), col("component").as("c_new")),
        Seq("node"), "left_outer")
      .groupBy(lit(true).as("all"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("c_old").isNotNull && col("c_new").isNotNull, 1L)
          .otherwise(0L)).as("n_both"),
        sum(when(col("c_old").isNull =!= col("c_new").isNull, 1L)
          .otherwise(0L)).as("n_one_side"),
        sum(when(col("c_old").isNotNull && col("c_new").isNotNull &&
          col("c_old") =!= col("c_new"), 1L).otherwise(0L)).as("n_moved"))
      .select(col("n_rows"), col("n_both"), col("n_one_side"),
        col("n_moved"),
        when(col("n_both") > 0,
          col("n_moved").cast("double") / col("n_both").cast("double"))
          .otherwise(lit(0.0)).as("moved_frac"))
}
