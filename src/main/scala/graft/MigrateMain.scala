package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.config.AppConfig
import graft.engine._
import graft.mapping.{TypeRegistry, UserOverrides}

/** Application entry point for the migration pipeline — the engine's
  * analogue of the reference CLI (src/args.rs, main.rs): flags control
  * formatting/constraints/resets/parallelism/packet bytes, a
  * mappings.toml supplies type overrides, and the source/target are
  * the environments available here (parquet fixture dir in, SQL script
  * dir out; a JDBC deployment swaps the two boundary implementations).
  *
  * Usage:
  *   runMain graft.MigrateMain --source-dir DIR --target-dir DIR
  *     [--tables A,B] [--format] [--constraints] [--drop] [--truncate]
  *     [--mappings FILE] [--max-packet-bytes N] [--parallelism N]
  */
object MigrateMain {

  def main(args: Array[String]): Unit = {
    var sourceDir = ""
    var targetDir = ""
    var tables = Seq.empty[String]
    var format = false
    var constraints = false
    var drop = false
    var truncate = false
    var mappingsFile = ""
    var maxPacketBytes = AppConfig.DefaultMaxPacketBytes
    var parallelism = Runtime.getRuntime.availableProcessors()

    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--source-dir" => sourceDir = args(i + 1); i += 2
        case "--target-dir" => targetDir = args(i + 1); i += 2
        case "--tables" =>
          tables = args(i + 1).split(',').map(_.trim).filter(_.nonEmpty).toSeq
          i += 2
        case "--format" | "-f" => format = true; i += 1
        case "--constraints" | "-c" => constraints = true; i += 1
        case "--drop" | "-d" => drop = true; i += 1
        case "--truncate" => truncate = true; i += 1
        case "--mappings" => mappingsFile = args(i + 1); i += 2
        case "--max-packet-bytes" =>
          maxPacketBytes = args(i + 1).toInt; i += 2
        case "--parallelism" | "-p" => parallelism = args(i + 1).toInt; i += 2
        case other => sys.error(s"Unknown argument: $other")
      }
    }
    require(sourceDir.nonEmpty && targetDir.nonEmpty,
      "--source-dir and --target-dir are required")

    val overrides =
      if (mappingsFile.isEmpty) UserOverrides.empty
      else UserOverrides.fromToml(
        Files.readString(Paths.get(mappingsFile))) match {
        case Left(err) => sys.error(s"mappings file: $err")
        case Right(o) => o
      }

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-migrate")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val migrator = new Migrator(
      spark,
      new ParquetFixtureSource(sourceDir, spark),
      new ScriptTargetWriter(targetDir),
      TypeRegistry.withDefaults().withUserOverrides(overrides),
      MigrationOptions(
        maxPacketBytes = maxPacketBytes,
        maxConcurrentTasks = parallelism,
        formatSnakeCase = format,
        createConstraints = constraints,
        dropTables = drop,
        truncateTables = truncate,
        whitelistedTables = tables))

    val t0 = System.nanoTime()
    try {
      val results = migrator.run()
      val secs = (System.nanoTime() - t0) / 1e9
      val total = results.map(_.rowsMigrated).sum
      results.sortBy(_.tableName).foreach { r =>
        println(f"  ${r.tableName}%-14s created=${r.created}%-5s rows=${r.rowsMigrated}")
      }
      migrator.warnings.foreach(w => println(s"  WARN: $w"))
      println(f"Migrated ${results.size} tables, $total rows in $secs%.2f s " +
        f"(${total / secs}%.0f rows/s)")
    } catch {
      case e: MigrationException =>
        // error-chain report (reference main.rs:37-42 / helpers.rs:3-18)
        System.err.println(s"ERROR: ${e.getMessage}")
        var cause = e.getCause
        while (cause != null) {
          System.err.println(s"       └> ${cause.getMessage}")
          cause = cause.getCause
        }
        spark.stop()
        sys.exit(1)
    }
    spark.stop()
  }
}
