package graft

import org.apache.spark.sql.SparkSession

/** Dev scratchpad: ad-hoc plan/exactness probes. Not part of the
  * driver contract; edited freely during development.
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
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stage] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    Tables(spark, dir, "orders").count() // warm
    // probe the queries named on the command line (twice each, so the
    // second run shows warm timings); default to a recent pair
    val targets =
      if (args.nonEmpty) args.toSeq
      else Seq("ta_bpe_token_count", "ta_winnow_fp")
    for (q <- targets; _ <- 1 to 2)
      t(q)(println(SparkEntry.queries(q)(spark, dir).count()))
    spark.stop()
  }
}
