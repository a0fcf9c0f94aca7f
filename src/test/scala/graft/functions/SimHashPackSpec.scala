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

  test("native char-trigram set == HOF reference incl. multibyte text") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(23)
    val pool = "abcdef语言模型データ 日本語处理"
    val texts = (1 to 200).map(_ =>
      (1 to rnd.nextInt(40)).map(_ => pool(rnd.nextInt(pool.length))).mkString) ++
      Seq("", "ab", "abc", "aaaa", "语言模", "语言模型语言模型")
    val df = texts.toDF("text")
    val rows = df.select(
      graft.operators.LlmText.charTrigrams(col("text")).as("n"),
      graft.operators.LlmText.charTrigramsReference(col("text")).as("r"))
      .collect()
    rows.foreach(r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), r.toString))
  }

  test("native dup-ngram fractions == HOF reference on random documents") {
    val rnd = new scala.util.Random(11)
    val vocab = Seq("a", "b", "spam", "words", "x")
    val docs = (1L to 150L).map(i =>
      (i, Seq.fill(rnd.nextInt(30) + 1)(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))) ++ Seq((151L, "solo"), (152L, "two words"))
    val df = docs.toDF("doc_id", "text")
    def key(r: org.apache.spark.sql.Row) =
      r.getLong(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4),
        r.getBoolean(5))
    val native = graft.operators.LlmText.repetitionSignals(df)
      .collect().map(key).toMap
    val ref = graft.operators.LlmText.repetitionSignalsReference(df)
      .collect().map(key).toMap
    assert(native == ref)
  }
}
