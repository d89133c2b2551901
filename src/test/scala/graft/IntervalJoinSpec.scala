package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.IntervalJoin

/** Custom interval-join operator: edge semantics, equivalence with the
  * bucket-explode composition on fixture data, and a randomized pin
  * against a plain inequality join.
  */
class IntervalJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("edge semantics: inclusive bounds, key isolation, empty windows") {
    import spark.implicits._
    val left = Seq((1L, 100L, "a"), (1L, 200L, "b"), (2L, 100L, "c"),
      (3L, 500L, "d"))
      .toDF("l_k", "l_t", "tag")
    val right = Seq((1L, 90L, "r1"), (1L, 110L, "r2"), (1L, 210L, "r3"),
      (2L, 150L, "r4"), (4L, 100L, "r5"))
      .toDF("r_k", "r_t", "rv")

    // window [t-10, t+10], inclusive on both ends
    val got = IntervalJoin.join(spark, left, right,
        "l_k", "r_k", "l_t", "r_t", -10L, 10L)
      .select(col("tag"), col("rv")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet

    assert(got == Set(
      ("a", "r1"), ("a", "r2"), // 90 and 110 inside [90, 110]
      ("b", "r3")))             // 210 inside [190, 210]
    // "c": key 2's only right row at 150 is outside [90, 110]
    // "d": key 3 absent on the right; r5's key absent on the left
  }

  test("null keys/times match nothing on either side (SQL join semantics)") {
    import spark.implicits._
    import graft.plans.IntervalJoin
    val right = Seq(
      (Some(0L), Some(10L), 900L), // genuine key 0 — null must NOT match it
      (None, Some(10L), 901L),
      (Some(1L), None, 902L),
      (Some(1L), Some(10L), 903L))
      .toDF("r_k", "r_t", "val")
    val left = Seq(
      (Some(0L), Some(12L), "key0"),
      (None, Some(12L), "null_key"),
      (Some(1L), None, "null_time"),
      (Some(1L), Some(12L), "key1"))
      .toDF("l_k", "l_t", "tag")
    val got = IntervalJoin.join(spark, left, right,
        "l_k", "r_k", "l_t", "r_t", -5L, 0L)
      .select(col("tag"), col("val")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("key0" -> 900L, "key1" -> 903L))
  }

  test("equivalent to the bucketed composition on fixtures") {
    val dir = "/root/testdata/sf0.001"
    val custom = SparkEntry.queries("q30_interval_custom_operator")(spark, dir)
      .collect().map(_.toString).sorted
    val composed = SparkEntry.queries("q20_range_join")(spark, dir)
      .collect().map(_.toString).sorted
    assert(custom.nonEmpty)
    assert(custom.sameElements(composed))
  }

  test("matches a plain inequality join on random data (dup keys and times)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(2000)(i =>
      (i.toLong, rnd.nextInt(20).toLong, rnd.nextInt(300).toLong))
    val l = rows.toDF("lid", "l_k", "l_t").repartition(5)
    val r = rows.map { case (i, k, t) => (i + 10000, k, t) }
      .toDF("rid", "r_k", "r_t").repartition(3)

    val custom = IntervalJoin.join(spark, l, r,
        "l_k", "r_k", "l_t", "r_t", -5L, 7L)
      .select(col("lid"), col("rid")).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val plain = l.join(r, col("l_k") === col("r_k") &&
        col("r_t") >= col("l_t") - 5 && col("r_t") <= col("l_t") + 7)
      .select(col("lid"), col("rid")).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(custom == plain && custom.nonEmpty)
  }
}
