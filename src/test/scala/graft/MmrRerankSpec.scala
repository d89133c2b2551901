package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Independent imperative reference for the MMR diversity re-rank:
  * rebuilds the candidate pool and the greedy marginal-relevance
  * chain from the raw embeddings (brute force, no shared code with
  * the query), and checks the penalty term actually reorders the
  * fixture — an MMR that equals pure relevance top-k is not doing
  * its job.
  */
class MmrRerankSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }
  private def cos(a: Array[Float], b: Array[Float]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

  test("mmr rerank equals a from-scratch greedy reference and is not " +
      "pure relevance ranking") {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray)
      .toMap
    val queryIds = vecs.keys.filter(_ < 20).toSeq.sorted
    val corpusIds = vecs.keys.filter(_ >= 20).toSeq.sorted

    // reference: top-16 pool by (cosine desc, id asc), then greedy MMR
    val want = queryIds.flatMap { q =>
      val pool = corpusIds
        .map(c => (c, cos(vecs(q), vecs(c))))
        .sortBy { case (id, r) => (-r, id) }
        .take(16)
      val remaining = scala.collection.mutable.ArrayBuffer
        .from(pool.sortBy(_._1))
      val selected = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Double)]
      val picks = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Int, Long, Double, Double)]
      while (selected.length < 5 && remaining.nonEmpty) {
        var bestI = -1
        var best = Double.NegativeInfinity
        for (i <- remaining.indices) {
          val (id, r) = remaining(i)
          val score =
            if (selected.isEmpty) r
            else 0.7 * r - 0.3 * selected
              .map(s => cos(vecs(id), vecs(s._1))).max
          if (score > best) { best = score; bestI = i }
        }
        val p = remaining.remove(bestI)
        selected += p
        picks += ((q, selected.length, p._1, p._2, best))
      }
      picks
    }

    val got = SparkEntry.queries("sim_mmr_rerank")(spark, dir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rnk"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("relv"),
        r.getAs[Double]("mmr_score")))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq == want.sortBy(t => (t._1, t._2)),
      "greedy chain diverged from the imperative reference")

    // the penalty term must visibly reorder: some query's MMR pick set
    // or order differs from its pure relevance top-5
    val reordered = queryIds.exists { q =>
      val rel5 = corpusIds.map(c => (c, cos(vecs(q), vecs(c))))
        .sortBy { case (id, r) => (-r, id) }.take(5).map(_._1)
      val mmr5 = got.filter(_._1 == q).sortBy(_._2).map(_._3).toSeq
      rel5 != mmr5
    }
    assert(reordered, "MMR equals pure relevance everywhere — the " +
      "fixture exercises nothing")
    // and rank-1 is ALWAYS the pure relevance argmax, by definition
    queryIds.foreach { q =>
      val top1 = corpusIds.map(c => (c, cos(vecs(q), vecs(c))))
        .sortBy { case (id, r) => (-r, id) }.head._1
      assert(got.find(t => t._1 == q && t._2 == 1).get._3 == top1)
    }
  }
}
