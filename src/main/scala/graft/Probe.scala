package graft

import org.apache.spark.sql.SparkSession

/** Dev scratchpad: ad-hoc plan/exactness probes. Not part of the
  * driver contract; edited freely during development.
  *
  * Current probe: physical-plan check that q02/q03 still
  * broadcast their dimension sides from file-size statistics after
  * the explicit hints were removed (round 10).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    for (q <- Seq("q02_top_brands_by_revenue", "q03_region_order_rollup")) {
      println(s"===== $q")
      val df = SparkEntry.queries(q)(spark, dir)
      df.count() // finalize AQE
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange"))
        .mkString("\n"))
    }
    spark.stop()
  }
}
