package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** SQL-surface registration for the custom expressions, so
  * `spark.sql("SELECT float_vec_dot(a, b) ...")` works alongside the
  * Column API — the engine's UDF/function registry analogue.
  */
object Registry {

  private def intArg(e: Expression, name: String): Int = e.eval() match {
    case i: Int => i
    case other => throw new IllegalArgumentException(
      s"$name expects a literal int argument, got $other")
  }

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("float_vec_dot",
      exprs => FloatVecDot(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("word_shingles",
      exprs => WordShingles(exprs(0), intArg(exprs(1), "word_shingles")), "built-in")
    reg.createOrReplaceTempFunction("minhash_signature",
      exprs => MinHashSignature(exprs(0), intArg(exprs(1), "minhash_signature")),
      "built-in")
    reg.createOrReplaceTempFunction("simhash60",
      exprs => SimHash60(exprs(0)), "built-in")
  }
}
