package graft

import org.apache.spark.sql.SparkSession

/** Dev scratchpad: ad-hoc plan/exactness probes. Not part of the
  * driver contract; edited freely during development.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries("q24_asof_custom_operator")(
      spark, "/root/testdata/sf0.01")
    println(df.queryExecution.executedPlan.toString.take(2500))
    spark.stop()
  }
}
