package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad: ad-hoc plan/exactness probes. Not part of the
  * driver contract; edited freely during development.
  *
  * Current probe: dd_triangles after the oriented-edge
  * localCheckpoint fix — warm-path timing, 4 reps.
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
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[stage] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    Tables(spark, dir, "documents").count() // warm session
    SparkEntry.queries("dd_jaccard_histogram")(spark, dir).collect() // warm cache
    val tri = SparkEntry.queries("dd_triangles")
    for (i <- 1 to 4) t(s"triangles_fixed_$i")(tri(spark, dir).collect())
    spark.stop()
  }
}
