package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Brute-force equivalence for the AllPairs/PPJoin prefix-filter join:
  * the DuckDB oracle pins `dd_prefix_jaccard` on the fixture's one
  * data shape; this spec drives the factored core over random corpora
  * where the prefix bound's edge cases actually occur — singleton
  * sets (prefix length 1), identical sets (j = 1 exactly on the
  * threshold boundary), heavily shared hot shingles (the bucket the
  * rarity order is supposed to de-prioritize), and thresholds on
  * either side of 0.5.
  */
class PrefixJaccardSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("prefix-filter all-pairs equals brute force on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 4; t <- Seq(0.4, 0.5, 0.8)) {
      // small alphabet forces overlap; a few clone pairs force j = 1
      val base = (0 until 24).map { id =>
        val n = 1 + rnd.nextInt(12)
        id.toLong -> (0 until n).map(_ => s"g${rnd.nextInt(20)}").toSet
      }
      val clones = base.take(3).map { case (id, gs) => (id + 100L, gs) }
      val docs = base ++ clones
      val sh = docs.flatMap { case (id, gs) => gs.map(g => (id, g)) }
        .toDF("doc_id", "g")

      val got = queries.Dedup.prefixJaccardPairs(sh, t)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val want = (for {
        (a, ga) <- docs
        (b, gb) <- docs if a < b
        inter = (ga & gb).size
        uni = (ga | gb).size
        if inter.toDouble / uni >= t
      } yield (a, b, inter.toLong, uni.toLong)).toSet
      assert(got == want,
        s"trial=$trial t=$t missing=${want -- got} extra=${got -- want}")
    }
  }
}
