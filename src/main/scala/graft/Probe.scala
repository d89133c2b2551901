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
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables(spark, "/root/testdata/sf0.1", "lineitem").count()
    val t0 = System.nanoTime()
    val n = SparkEntry.queries("sim_kmeans_ivf")(spark, "/root/testdata/sf0.1").count()
    println(f"sim_kmeans_ivf sf0.1: $n rows in ${(System.nanoTime()-t0)/1e9}%.2f s")
    spark.stop()
  }
}
