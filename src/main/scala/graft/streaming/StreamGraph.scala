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
}
