package graft

import org.apache.spark.sql.SparkSession

import graft.engine._
import graft.mapping.{TypeRegistry, UserOverrides}

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

    val out = "/tmp/mig_out"
    if (!sys.env.contains("GRAFT_KEEP_OUT")) org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))

    val overrides = UserOverrides.fromToml(
      """[mappings]
        |nvarchar = "varchar(5000)"
        |[mappings.columns]
        |"documents.text" = "longtext"
        |"lineitem.Bogus" = "int"
        |""".stripMargin).fold(e => sys.error(e), identity)

    val src = new ParquetFixtureSource("/root/testdata/sf0.001", spark)
    val writer = new ScriptTargetWriter(out)
    val migrator = new Migrator(spark, src, writer,
      TypeRegistry.withDefaults().withUserOverrides(overrides),
      MigrationOptions(formatSnakeCase = true, createConstraints = true,
        maxConcurrentTasks = 4))

    val t0 = System.nanoTime()
    val results = migrator.run()
    val secs = (System.nanoTime() - t0) / 1e9
    val total = results.map(_.rowsMigrated).sum
    println(f"migrated ${results.size} tables, $total rows in $secs%.2f s " +
      f"(${total / secs}%.0f rows/s)")
    results.sortBy(_.tableName).foreach(r =>
      println(f"  ${r.tableName}%-12s created=${r.created} rows=${r.rowsMigrated}"))
    migrator.warnings.foreach(w => println(s"  WARN: $w"))
    spark.stop()
  }
}
