package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function

/** Registration for graft's native expressions.
  *
  * Two equivalent routes:
  *  - config: `spark.sql.extensions=graft.functions.GraftExtensions`
  *  - programmatic: `GraftFunctions.register(spark)` (idempotent), used by
  *    the operators so library callers need no session config.
  */
object GraftFunctions {

  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> (cs => DotProduct(cs(0), cs(1))),
    "graft_cosine" -> (cs => CosineSimilarity(cs(0), cs(1))),
    "graft_hexfold7" -> (cs => HexFold7(cs(0))),
    // the library's standard 12-function affine family (Dedup.HashA/B/P)
    "graft_minhash_sig" -> (cs => MinHashSig(cs(0),
      graft.operators.Dedup.HashA, graft.operators.Dedup.HashB,
      graft.operators.Dedup.HashP)),
    "graft_simhash_pack" -> (cs => SimHashPack(cs(0))),
    "graft_dup_ngram_fracs" -> (cs => DupNgramFracs(cs(0))),
    "graft_char_trigram_set" -> (cs => CharTrigramSet(cs(0))),
    "graft_char_diversity_stats" -> (cs => CharDiversityStats(cs(0))))

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    fns.foreach { case (name, builder) =>
      val ident = FunctionIdentifier(name)
      if (!registry.functionExists(ident)) {
        registry.registerFunction(ident,
          new ExpressionInfo(classOf[DotProduct].getName, name), builder)
      }
    }
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.RewriteVectorHof)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.RewriteVectorHof
    }
    if (!spark.experimental.extraStrategies
        .contains(graft.plans.TopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.TopKStrategy
    }
  }

  /** Column API over the native expressions (requires registration —
    * operators call [[register]] first). */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)
  def cosine(a: Column, b: Column): Column =
    call_function("graft_cosine", a, b)
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (cs: Seq[Expression]) => DotProduct(cs(0), cs(1))))
    ext.injectFunction((FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (cs: Seq[Expression]) => CosineSimilarity(cs(0), cs(1))))
    ext.injectOptimizerRule(_ => graft.plans.RewriteVectorHof)
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}
