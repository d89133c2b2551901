package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** SQL-surface registration for the custom expressions, so
  * `spark.sql("SELECT float_vec_dot(a, b) ...")` works alongside the
  * Column API — the engine's UDF/function registry analogue. The
  * builders here are the single source of truth; GraftExtensions
  * injects the same ones at session build time.
  */
object Registry {

  private def intArg(e: Expression, name: String): Int = e.eval() match {
    case i: Int => i
    case l: Long if l.isValidInt => l.toInt
    case other => throw new IllegalArgumentException(
      s"$name expects a literal int argument, got $other")
  }

  /** name -> (usage, builder) for every SQL-exposed function. */
  val builders: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("float_vec_dot", "dot product of two float arrays (double acc)",
      exprs => FloatVecDot(exprs(0), exprs(1))),
    ("word_shingles", "distinct word k-shingles of a document",
      exprs => WordShingles(exprs(0), intArg(exprs(1), "word_shingles"))),
    ("minhash_signature", "minhash signature of a shingle array",
      exprs => MinHashSignature(exprs(0), intArg(exprs(1), "minhash_signature"))),
    ("simhash60", "60-bit simhash of a token array",
      exprs => SimHash60(exprs(0))),
    ("count_min", "count-min sketch cells (depth x width) of a bigint key",
      exprs => graft.operators.CountMinAgg(exprs(0),
        intArg(exprs(1), "count_min"), intArg(exprs(2), "count_min"))),
    ("topk_pairs", "bounded top-k (value desc, tie asc) long pairs",
      exprs => graft.operators.TopKPairsAgg(exprs(0), exprs(1),
        intArg(exprs(2), "topk_pairs"))))

  /** Idempotent per session: skips names already registered so callers
    * can invoke this per query without `SimpleFunctionRegistry`
    * "replaced a previously registered function" warnings on reruns.
    */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, _, builder) =>
      if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name))) {
        reg.createOrReplaceTempFunction(name, builder, "built-in")
      }
    }
  }
}
