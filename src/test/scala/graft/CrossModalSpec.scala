package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Imperative references for the two cross-modal queries: c-TF-IDF
  * class labeling (recomputed from raw text + labels) and the
  * text-vs-embedding modality agreement (recomputed from the two
  * published pair screens).
  */
class CrossModalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("class tfidf: scores equal a from-scratch c-TF-IDF recount, " +
      "ranks are the rounded-score order, 5 terms per label") {
    val labels = spark.read.parquet(s"$dir/embeddings.parquet").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    val docs = spark.read.parquet(s"$dir/documents.parquet").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(docs.keySet == labels.keySet, "fixture alignment broken")

    // from-scratch counts
    val cw = scala.collection.mutable.Map.empty[(Int, String), Long]
    val cl = scala.collection.mutable.Map.empty[Int, Long]
    val ft = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { case (id, text) =>
      val lab = labels(id)
      text.split(" ", -1).foreach { w =>
        cw((lab, w)) = cw.getOrElse((lab, w), 0L) + 1
        cl(lab) = cl.getOrElse(lab, 0L) + 1
        ft(w) = ft.getOrElse(w, 0L) + 1
      }
    }
    val avgLen = cl.values.sum.toDouble / cl.size
    def score(lab: Int, w: String): Double = {
      val raw = (cw((lab, w)).toDouble / cl(lab)) *
        math.log(1.0 + avgLen / ft(w))
      BigDecimal(raw).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val want = cl.keys.toSeq.sorted.flatMap { lab =>
      cw.keys.filter(_._1 == lab).map(_._2).toSeq
        .map(w => (w, score(lab, w), cw((lab, w))))
        .sortBy { case (w, sc, _) => (-sc, w) }
        .take(5).zipWithIndex
        .map { case ((w, sc, c), i) => (lab, i + 1, w, c, sc) }
    }

    val got = SparkEntry.queries("ta_class_tfidf")(spark, dir).collect()
      .map(r => (r.getAs[Int]("label"), r.getAs[Int]("rnk"),
        r.getAs[String]("word"), r.getAs[Long]("cnt"),
        r.getAs[Double]("ctfidf")))
      .sortBy(t => (t._1, t._2)).toSeq
    // scores quantized at 9 decimals on both sides; Spark round()
    // rounds the double's binary expansion while the reference rounds
    // the decimal repr — compare at 1e-9 tolerance on the score and
    // exactly on everything else
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert((g._1, g._2, g._3, g._4) == ((w._1, w._2, w._3, w._4)),
        s"row diverged: $g vs $w")
      assert(math.abs(g._5 - w._5) <= 1e-9, s"score diverged: $g vs $w")
    }
    assert(got.map(_._1).distinct.length > 1)
  }

  test("modality agreement: counts recomputed from the two published " +
      "pair screens; agreement is the pair-set jaccard") {
    def pairs(name: String, a: String, b: String): Set[(Long, Long)] =
      SparkEntry.queries(name)(spark, dir).collect()
        .map(r => (r.getAs[Long](a), r.getAs[Long](b))).toSet
    val txt = pairs("dd_ngram_jaccard", "doc_a", "doc_b")
    val emb = pairs("dd_embedding_neardup", "id_a", "id_b")
    val row = SparkEntry.queries("dd_modality_agreement")(spark, dir)
      .collect().head
    assert(row.getAs[Long]("n_text") == txt.size)
    assert(row.getAs[Long]("n_emb") == emb.size)
    assert(row.getAs[Long]("n_both") == (txt intersect emb).size)
    val union = txt.size + emb.size - (txt intersect emb).size
    val agree = math.floor(
      (txt intersect emb).size.toDouble / union * 1e9 + 0.5) / 1e9
    assert(row.getAs[Double]("agreement") == agree)
    assert(txt.nonEmpty && emb.nonEmpty,
      "fixture exercises neither modality")
  }
}
