package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The day-bitmap census' window contracts, on synthetic fixtures the
  * driver's 30-day corpus can't produce:
  *
  *   - `ev_day_bitmap` must REJECT a >63-day window loudly. Spark's
  *     `shiftleft` wraps the shift mod 64 silently, so without the
  *     per-row raise_error a 90-day corpus would fold day 64 onto day
  *     0 and emit a wrong census with no error at all.
  *   - `ev_day_bitmap_sharded` must carry streaks ACROSS the 63-bit
  *     shard boundary: a user active on days 60..66 has one 7-day
  *     streak whose bits live in two different BIGINT shards.
  */
class DayBitmapSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Write a synthetic events.parquet; days are offsets from 2024-01-01.
    * event_type "view" has length 4 → the sharded query's stretch term
    * `50·(length % 4)` is ZERO, so synthetic day == census day there too.
    */
  private def eventsFixture(userDays: Seq[(Long, Seq[Int])]): String = {
    val dir = Files.createTempDirectory("graft_daybitmap_fixture")
    dir.toFile.deleteOnExit()
    val base = java.time.LocalDate.of(2024, 1, 1)
    val rows = for {
      ((user, days), i) <- userDays.zipWithIndex
      day <- days
    } yield (i.toLong * 1000 + day, Timestamp.valueOf(
      base.plusDays(day.toLong).atTime(12, 0)), user, "view", 1.0, "{}")
    val s = spark
    import s.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("events.parquet").toString)
    dir.toString
  }

  private def messages(t: Throwable): Seq[String] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).toSeq

  test("ev_day_bitmap fails loudly past 63 days instead of wrapping") {
    val dir = eventsFixture(Seq(1L -> Seq(0, 5), 2L -> Seq(0, 70)))
    val ex = intercept[Throwable] {
      SparkEntry.queries("ev_day_bitmap")(spark, dir).collect()
    }
    assert(messages(ex).exists(_.contains("63-day BIGINT mask window")),
      s"expected the raise_error contract message, got: ${messages(ex)}")
  }

  test("ev_day_bitmap passes at exactly day 62 (the last in-window bit)") {
    val dir = eventsFixture(Seq(1L -> Seq(0, 61, 62)))
    val out = SparkEntry.queries("ev_day_bitmap")(spark, dir).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Int]("n_active_days") == 3)
    assert(out.head.getAs[Int]("longest_streak") == 2) // 61,62
  }

  test("ev_day_bitmap_sharded carries streaks across the 63-bit boundary") {
    val dir = eventsFixture(Seq(
      1L -> (60 to 66),          // 7-day streak straddling shard 0→1
      2L -> Seq(0, 1, 63),       // streak 2, days in both shards
      3L -> Seq(125, 126, 127))) // 3-day streak straddling shard 1→2
    val out = SparkEntry.queries("ev_day_bitmap_sharded")(spark, dir)
      .collect()
      .map(r => (r.getAs[Int]("n_active_days"),
        r.getAs[Int]("longest_streak"), r.getAs[Long]("n_users")))
      .toSet
    assert(out == Set((7, 7, 1L), (3, 2, 1L), (3, 3, 1L)),
      s"got $out")
  }

  test("ev_day_bitmap_sharded fails loudly past the sharded window") {
    val dir = eventsFixture(Seq(1L -> Seq(0, 190)))
    val ex = intercept[Throwable] {
      SparkEntry.queries("ev_day_bitmap_sharded")(spark, dir).collect()
    }
    assert(messages(ex).exists(_.contains("exceeds the 3-shard window")),
      s"expected the raise_error contract message, got: ${messages(ex)}")
  }
}
