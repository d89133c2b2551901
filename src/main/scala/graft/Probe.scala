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
    Tables(spark, "/root/testdata/sf0.1", "orders").count() // warm
    for (sf <- Seq("sf0.1");
         q <- Seq("dd_components", "dd_ngram_jaccard")) {
      val dir = s"/root/testdata/$sf"
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, dir).count()
      println(f"$sf $q: $n rows in ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
