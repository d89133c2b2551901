package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-provided parquet fixtures (TESTDATA.md).
  *
  * Each scale-factor directory holds one parquet file per table:
  * region nation customer supplier part orders lineitem events
  * documents embeddings. At 100 TB these would be partitioned
  * directories; `spark.read.parquet(dir)` handles both shapes, so all
  * operators go through this single entry point.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to
      // read as a timestamp ([PARQUET_TYPE_ILLEGAL]). Read the raw
      // nanos as long and truncate to microseconds — the same value
      // DuckDB produces for its (µs) timestamp type, so oracle
      // comparisons line up exactly. The conf write is guarded so
      // concurrent query launches don't hammer the session conf (the
      // value itself never changes, so the guard is only an
      // idempotent fast path).
      if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
          .contains("true"))
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$sfDir/$name.parquet")
}
