package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The chunked two-pass quintile (queries.Events.tile5) claims to
  * reproduce ntile(5) EXACTLY without a partition-less window over
  * the data. This spec proves the equivalence against Spark's own
  * ntile on random heavily-tied data — ties are where the formula
  * floor((rank−1)·5/n)+1 could plausibly diverge from ntile's
  * front-loaded bucket sizing, and where the chunk boundary (equal
  * metric values spanning chunks cannot happen: chunk is a function
  * of the metric) matters.
  */
class RankSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("tile5 equals ntile(5) on random tied data, asc and desc") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 4) {
      val n = 37 + rnd.nextInt(200) // deliberately not divisible by 5
      val rows = (0 until n).map(i => (i.toLong, rnd.nextInt(12).toLong))
      val df = rows.toDF("id", "metric").withColumn("n_total", lit(n.toLong))

      val asc = queries.Events.tile5(df,
        Seq(col("metric"), col("id")), col("metric"), "n_total", "tile")
        .select(col("id"), col("tile"))
      val ascWant = df.withColumn("tile",
        ntile(5).over(Window.orderBy(col("metric"), col("id"))))
        .select(col("id"), col("tile"))
      assert(asc.except(ascWant).isEmpty && ascWant.except(asc).isEmpty,
        s"trial=$trial asc mismatch")

      val desc = queries.Events.tile5(df,
        Seq(col("metric").desc, col("id")), -col("metric"), "n_total",
        "tile")
        .select(col("id"), col("tile"))
      val descWant = df.withColumn("tile",
        ntile(5).over(Window.orderBy(col("metric").desc, col("id"))))
        .select(col("id"), col("tile"))
      assert(desc.except(descWant).isEmpty && descWant.except(desc).isEmpty,
        s"trial=$trial desc mismatch")
    }
  }
}
