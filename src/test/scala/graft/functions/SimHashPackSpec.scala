package graft.functions

import graft.SparkSpec
import graft.operators.Dedup

/** Native SimHashPack must be bit-identical to the HOF vote-and-pack the
  * DuckDB oracle mirrors, over realistic and adversarial word mixes. */
class SimHashPackSpec extends SparkSpec {
  import spark.implicits._

  test("native simhash == HOF reference on random documents") {
    val rnd = new scala.util.Random(7)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "x", "longerword",
      "zz", "the", "and", "query")
    val docs = (1L to 200L).map(i =>
      (i, Seq.fill(rnd.nextInt(50) + 1)(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))) :+ ((201L, "single"))
    val df = docs.toDF("doc_id", "text")
    val native = Dedup.simhash(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ref = Dedup.simhashReference(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == ref)
    assert(native.values.forall(v => v >= 0 && v < (1L << 60)))
  }
}
