package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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

    val ev = Tables(spark, "/root/testdata/sf0.01", "events")
    ev.printSchema()
    ev.selectExpr("max(ts)", "min(ts)").show(false)

    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"))
    val cosDf = e.crossJoin(q).select(col("vec_id"),
      (aggregate(zip_with(col("embedding"), col("qv"),
          (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (a, x) => a + x) /
        (sqrt(aggregate(transform(col("embedding"),
          x => x.cast("double") * x.cast("double")), lit(0.0), (a, x) => a + x)) *
          sqrt(aggregate(transform(col("qv"),
            x => x.cast("double") * x.cast("double")), lit(0.0), (a, x) => a + x))))
        .as("cosv"))
    cosDf.filter(col("vec_id").isin(1, 2, 3, 4, 5)).orderBy("vec_id")
      .collect().foreach(r => println(s"${r.getLong(0)} ${java.lang.Double.toString(r.getDouble(1))}"))
    spark.stop()
  }
}
