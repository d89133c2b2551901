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
      // events.ts has shipped in two physical vintages: parquet
      // TIMESTAMP(NANOS) (which Spark 4 refuses to read as a timestamp
      // — [ILLEGAL_PARQUET_TYPE] — so it must come in as raw long
      // nanos via the legacy conf) and parquet timestamp[us]
      // (TIMESTAMP_NTZ to Spark). A loader that hard-codes either
      // shape breaks the moment the fixture vintage flips, so dispatch
      // on the OBSERVED column type and normalize every vintage to the
      // same session-type `ts` (TimestampType; session tz is UTC
      // everywhere in this repo, so NTZ→LTZ is value-preserving and
      // matches what DuckDB's naive (µs) timestamp compares). The conf
      // is set up front because the nanos vintage fails at footer
      // resolution otherwise; it is a no-op for the other vintages.
      if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
          .contains("true"))
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeEventsTs(spark.read.parquet(s"$sfDir/$name.parquet"))
    } else spark.read.parquet(s"$sfDir/$name.parquet")

  /** Normalize any events-`ts` vintage to TimestampType (µs precision,
    * UTC session): raw long = legacy nanos → truncate to micros;
    * NTZ = parquet timestamp[us] → value-preserving cast; LTZ = already
    * the session type. Anything else is a new fixture vintage — fail
    * with a one-line diagnosis instead of 40 downstream analysis
    * errors.
    */
  private[graft] def normalizeEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other => throw new IllegalStateException(
        s"events.ts has unsupported type $other — expected raw long " +
          "nanos (legacy TIMESTAMP(NANOS) fixtures), TIMESTAMP_NTZ " +
          "(timestamp[us] fixtures), or TIMESTAMP; teach " +
          "Tables.normalizeEventsTs this vintage")
    }
  }
}
