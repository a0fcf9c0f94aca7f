package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Partitioning helper for compute-bound stages.
  *
  * AQE sizes shuffle partitions by BYTES, so a stage whose cost is dominated
  * by expression compute over few/small rows (hashing every shingle of every
  * document, 16 hyperplane dot products per vector, …) gets coalesced onto
  * one task and serializes. Passing an explicit partition count marks the
  * shuffle as user-specified, which AQE leaves alone; we use the cluster's
  * default parallelism so the same code spreads over 32 local threads here
  * and over every core of a 1000-executor cluster unchanged.
  */
object Partitioning {
  /** Repartition by `keys` with an AQE-stable explicit partition count. */
  def spread(df: DataFrame, keys: Column*): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, keys: _*)
}
