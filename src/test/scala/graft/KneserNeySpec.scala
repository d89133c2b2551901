package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins ta_kneser_ney's formula against an independent imperative
  * computation of interpolated Kneser–Ney on a synthesized corpus:
  * raw string maps, no DataFrames — count tables built with plain
  * Scala, probabilities with the textbook formula, per-doc NLL by
  * direct summation. Agreement to the operator's 9-decimal quantum.
  */
class KneserNeySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("operator equals the textbook interpolated-KN computation") {
    val rnd = new scala.util.Random(4243L)
    val vocab = Vector("the", "cat", "sat", "on", "mat", "a", "dog", "ran")
    val docs = (0L until 40L).map { id =>
      val n = 2 + rnd.nextInt(12)
      (id, (0 until n).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    } :+ ((40L, "solo")) // a 1-token doc: filtered out on both sides
    val dir = java.nio.file.Files.createTempDirectory("kn")
    import spark.implicits._
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // ---- imperative reference ----
    val D = 0.75
    def bigrams(t: String): Seq[(String, String)] = {
      val ws = t.split(" ", -1)
      (1 until ws.length).map(i => (ws(i - 1), ws(i)))
    }
    val all = docs.filter(_._2.split(" ", -1).length >= 2)
      .flatMap(d => bigrams(d._2))
    val c2 = all.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val c1 = all.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val nf = c2.keys.toSeq.groupBy(_._1).map { case (k, v) => k -> v.size }
    val nb = c2.keys.toSeq.groupBy(_._2).map { case (k, v) => k -> v.size }
    val nall = c2.size
    def pkn(b: (String, String)): Double =
      (math.max(c2(b) - D, 0.0) +
        D * nf(b._1) * (nb(b._2).toDouble / nall)) / c1(b._1)
    val want = docs.filter(_._2.split(" ", -1).length >= 2).map { case (id, t) =>
      val bs = bigrams(t)
      val terms = bs.groupBy(identity).map { case (b, occ) =>
        // the operator rounds each -cd*ln(p) term to 9 decimals into
        // DECIMAL accumulation; mirror that exactly
        BigDecimal(math.round(-occ.size * math.log(pkn(b)) * 1e9))
          .bigDecimal.movePointLeft(9)
      }
      val t9 = terms.map(BigDecimal(_)).sum
      val nbt = bs.size
      id -> (nbt, math.floor(t9.toDouble / nbt * 1e9 + 0.5) / 1e9)
    }.toMap

    val got = SparkEntry.queries("ta_kneser_ney")(spark, dir.toString)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_bigrams"), r.getAs[Double]("nll_kn")))).toMap
    assert(got.keySet == want.keySet) // the 1-token doc must be absent
    want.foreach { case (id, (nbt, nll)) =>
      assert(got(id)._1 == nbt, s"doc $id n_bigrams")
      assert(math.abs(got(id)._2 - nll) < 1e-12, s"doc $id nll")
    }
    // KN must actually discount: a seen bigram's probability is below
    // its MLE, and probabilities over each history sum to ~1
    val hist = c1.keys.head
    // toSeq: Set.map would collapse equal probability VALUES pre-sum
    val mass = c2.keys.toSeq.filter(_._1 == hist).map(pkn).sum +
      // unseen continuations of this history get pure backoff mass
      vocab.filter(w => !c2.contains((hist, w)) && nb.contains(w))
        .map(w => D * nf(hist) * (nb(w).toDouble / nall) / c1(hist)).sum
    assert(mass > 0.97 && mass < 1.001, s"KN mass over '$hist' = $mass")
    org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }
}
