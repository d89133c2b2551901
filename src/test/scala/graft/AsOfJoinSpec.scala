package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.AsOfJoin

/** Custom as-of operator: edge semantics + equivalence with the
  * compositional union+window form on fixture data.
  */
class AsOfJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("edge semantics: exact-time match, no-prior dropped, latest wins") {
    import spark.implicits._
    val right = Seq(
      (1L, 10L, 100L), (1L, 20L, 101L), (2L, 50L, 200L))
      .toDF("r_k", "r_t", "val")
    val left = Seq(
      (1L, 5L, "before_all"), // no right row at or before t=5 -> dropped
      (1L, 10L, "exact"),     // t=10 matches the t=10 row (<=)
      (1L, 30L, "latest"),    // latest prior is t=20
      (2L, 60L, "other_key"), // keys independent
      (3L, 99L, "no_key"))    // key absent on right -> dropped
      .toDF("l_k", "l_t", "tag")

    val got = AsOfJoin.join(spark, left, right, "l_k", "r_k", "l_t", "r_t")
      .select(col("tag"), col("val")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    assert(got == Map("exact" -> 100L, "latest" -> 101L, "other_key" -> 200L))
  }

  test("null keys/times match nothing on either side (SQL join semantics)") {
    import spark.implicits._
    val right = Seq(
      (Some(0L), Some(10L), 900L), // genuine key 0 — null must NOT match it
      (None, Some(10L), 901L), // null key: joins nothing
      (Some(1L), None, 902L), // null time: joins nothing
      (Some(1L), Some(10L), 903L))
      .toDF("r_k", "r_t", "val")
    val left = Seq(
      (Some(0L), Some(20L), "key0"),
      (None, Some(20L), "null_key"), // must NOT as-of join key 0
      (Some(1L), None, "null_time"), // must NOT join anything
      (Some(1L), Some(20L), "key1"))
      .toDF("l_k", "l_t", "tag")
    val got = AsOfJoin.join(spark, left, right, "l_k", "r_k", "l_t", "r_t")
      .select(col("tag"), col("val")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("key0" -> 900L, "key1" -> 903L))
  }

  test("equivalent to the union+window composition on fixtures") {
    val dir = "/root/testdata/sf0.001"
    val custom = SparkEntry.queries("q24_asof_custom_operator")(spark, dir)
      .collect().map(_.toString).sorted
    val composed = SparkEntry.queries("q14_asof_join")(spark, dir)
      .collect().map(_.toString).sorted
    assert(custom.nonEmpty)
    assert(custom.sameElements(composed))
  }

  test("physical plan uses the custom exec with clustered sorted children") {
    val dir = "/root/testdata/sf0.001"
    val plan = SparkEntry.queries("q24_asof_custom_operator")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"))
    assert(plan.contains("hashpartitioning(l_k"))
    assert(plan.contains("hashpartitioning(r_k"))
  }
}
