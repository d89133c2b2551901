package graft

import org.apache.spark.sql.SparkSession

import graft.engine._
import graft.mapping.TypeRegistry

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
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val out = "/tmp/mig_scale_out"
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
      val m = new Migrator(spark, new ParquetFixtureSource(dir, spark),
        new ScriptTargetWriter(out), TypeRegistry.withDefaults(),
        MigrationOptions(formatSnakeCase = true, createConstraints = true,
          maxConcurrentTasks = 8))
      Tables(spark, dir, "lineitem").count()
      val t0 = System.nanoTime()
      val results = m.run()
      val secs = (System.nanoTime() - t0) / 1e9
      val total = results.map(_.rowsMigrated).sum
      println(f"MIG $dir: $total rows in $secs%.2f s = ${total / secs}%.0f rows/s")
    }
    spark.stop()
  }
}
