package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions installer for the engine's functions, so a
  * deployment can wire them at session build time:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   // or: .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * }}}
  *
  * (graft.functions.Registry does the same imperatively for an
  * already-built session.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => graft.plans.RewriteHofDotProduct)
    e.injectFunction((FunctionIdentifier("float_vec_dot"),
      info("float_vec_dot", "dot product of two float arrays (double acc)"),
      (exprs: Seq[Expression]) => FloatVecDot(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("word_shingles"),
      info("word_shingles", "distinct word k-shingles of a document"),
      (exprs: Seq[Expression]) => WordShingles(exprs(0),
        exprs(1).eval().asInstanceOf[Int])))
    e.injectFunction((FunctionIdentifier("minhash_signature"),
      info("minhash_signature", "minhash signature of a shingle array"),
      (exprs: Seq[Expression]) => MinHashSignature(exprs(0),
        exprs(1).eval().asInstanceOf[Int])))
    e.injectFunction((FunctionIdentifier("simhash60"),
      info("simhash60", "60-bit simhash of a token array"),
      (exprs: Seq[Expression]) => SimHash60(exprs(0))))
  }
}
