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
    spark.read.parquet(s"$sfDir/$name.parquet")
}
