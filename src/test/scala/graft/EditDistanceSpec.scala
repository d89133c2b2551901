package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Brute-force equivalence for the banded edit-distance join: the
  * DuckDB oracle pins `dd_edit_distance` on the fixture's one data
  * shape; this spec drives the factored core over random corpora
  * where the band rule's edge cases actually occur — exact clones
  * (ed = 0), single-character edits at every position class (prefix /
  * middle / suffix), length-changing insertions near the ±8 length
  * bound, and edit bursts that touch BOTH 32-char ends (the
  * documented recall gap: such pairs escape both bands and the
  * reference algorithm must agree they are absent).
  */
class EditDistanceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Plain-Scala levenshtein (full DP) — the reference the thresholded
    * Spark expression must agree with wherever it reports a distance.
    */
  private def lev(a: String, b: String): Int = {
    val prev = new Array[Int](b.length + 1)
    val cur = new Array[Int](b.length + 1)
    for (j <- 0 to b.length) prev(j) = j
    for (i <- 1 to a.length) {
      cur(0) = i
      for (j <- 1 to b.length)
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1),
          prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      Array.copy(cur, 0, prev, 0, b.length + 1)
    }
    prev(b.length)
  }

  /** The band rule in plain Scala — the algorithm contract the Spark
    * plan must reproduce exactly (knn_ivf-style approximate-by-design).
    */
  private def reference(docs: Seq[(Long, String)],
      maxEd: Int): Set[(Long, Long, Int)] =
    (for {
      (a, ta) <- docs if ta.length >= 32
      (b, tb) <- docs if tb.length >= 32 && a < b
      if math.abs(ta.length - tb.length) <= 8
      if ta.take(32) == tb.take(32) || ta.takeRight(32) == tb.takeRight(32)
      d = lev(ta, tb) if d <= maxEd
    } yield (a, b, d)).toSet

  private def run(docs: Seq[(Long, String)],
      maxEd: Int): Set[(Long, Long, Int)] = {
    import spark.implicits._
    queries.Dedup.editDistancePairs(docs.toDF("doc_id", "text"), maxEd)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  test("banded edit-distance join equals the reference algorithm on random corpora") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcdefgh "
    def randDoc(n: Int): String =
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    for (trial <- 0 until 3) {
      // ≥ 70 chars so the position classes are well-defined: a middle
      // edit at len/2 sits outside BOTH 32-char bands only when
      // len > 64
      val base = (0 until 20).map(id =>
        id.toLong -> randDoc(70 + rnd.nextInt(40)))
      // seeded mutants per position class
      val mutants = base.take(8).zipWithIndex.map { case ((id, t), i) =>
        val m = i % 4 match {
          case 0 => t.updated(t.length / 2, 'Z') // middle edit: both bands hold
          case 1 => t.updated(2, 'Z') // prefix edit: suffix band holds
          case 2 => t.updated(t.length - 3, 'Z') // suffix edit: prefix band holds
          case _ => // burst touching BOTH ends: escapes both bands
            ("ZZZ" + t.drop(3)).dropRight(3) + "ZZZ"
        }
        (id + 1000L, m)
      }
      // exact clones (ed = 0) and a length-changing insert at the bound
      val clones = base.slice(8, 11).map { case (id, t) => (id + 2000L, t) }
      val inserted = base.slice(11, 13).map { case (id, t) =>
        (id + 3000L, t.take(t.length / 2) + "QQQQQQQQ" + t.drop(t.length / 2))
      }
      val docs = base ++ mutants ++ clones ++ inserted
      val got = run(docs, maxEd = 5)
      val want = reference(docs, maxEd = 5)
      assert(got == want,
        s"trial=$trial missing=${want -- got} extra=${got -- want}")
      // the position-class recall contract: single edits that leave one
      // 32-char end intact are ALWAYS found...
      for (((id, _), i) <- base.take(8).zipWithIndex if i % 4 != 3)
        assert(got.exists(p => p._1 == id && p._2 == id + 1000L),
          s"single-$i-class edit of doc $id escaped the bands")
      // ...and the double-ended burst is (documented) invisible
      for (((id, _), i) <- base.take(8).zipWithIndex if i % 4 == 3)
        assert(!got.exists(p => p._1 == id && p._2 == id + 1000L),
          s"double-ended burst of doc $id unexpectedly banded")
      // clones surface with ed = 0
      for ((cid, _) <- clones)
        assert(got.exists(p => p._2 == cid && p._3 == 0),
          s"clone $cid (ed=0) not found")
    }
  }
}
