package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Optimizer-rule behavior: the HOF dot-product pattern written
  * through the public API is rewritten to FloatVecDot when the
  * session carries GraftExtensions, and results are unchanged.
  */
class RewriteRuleSpec extends AnyFunSuite {

  // getOrCreate may return a session another suite built, where
  // builder-time extensions are silently ignored — inject the rule
  // through the runtime path instead (same rule object either way).
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    if (!s.experimental.extraOptimizations.contains(
        graft.plans.RewriteHofDotProduct))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ graft.plans.RewriteHofDotProduct
    s
  }

  private def hofDot = {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings").limit(50)
    val q = e.select(col("embedding").as("qv"), col("vec_id"))
      .crossJoin(e.limit(1).select(col("embedding").as("nv")))
    q.select(col("vec_id"),
      aggregate(zip_with(col("qv"), col("nv"),
        (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("dp"))
  }

  test("HOF dot-product pattern is rewritten to FloatVecDot") {
    val optimized = hofDot.queryExecution.optimizedPlan.toString
    assert(optimized.contains("floatvecdot") ||
      optimized.contains("FloatVecDot"), optimized.take(600))
  }

  test("rewrite preserves values bit-for-bit") {
    val viaRule = hofDot.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val direct = {
      val e = Tables(spark, "/root/testdata/sf0.001", "embeddings").limit(50)
      val q = e.select(col("embedding").as("qv"), col("vec_id"))
        .crossJoin(e.limit(1).select(col("embedding").as("nv")))
      q.select(col("vec_id"),
        graft.functions.FloatVecDot(col("qv"), col("nv")).as("dp"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    }
    assert(viaRule.keySet == direct.keySet)
    viaRule.foreach { case (k, v) =>
      assert(java.lang.Double.doubleToLongBits(v) ==
        java.lang.Double.doubleToLongBits(direct(k)))
    }
  }
}
