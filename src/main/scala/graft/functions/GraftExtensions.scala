package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions installer for the engine's functions and
  * optimizer rules, so a deployment can wire them at session build
  * time:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   // or: .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * }}}
  *
  * Function builders come from [[Registry]] (single source of truth);
  * graft.functions.Registry.registerAll does the same imperatively for
  * an already-built session, and experimental.extraOptimizations can
  * add the rewrite rule there.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => graft.plans.RewriteHofDotProduct)
    Registry.builders.foreach { case (name, usage, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", null, name, usage, ""), builder))
    }
  }
}
