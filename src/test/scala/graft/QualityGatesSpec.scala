package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Functional cross-checks for the round's curation-gate operators,
  * each against an independent imperative reference over the raw
  * fixture strings (the BpeTrainSpec convention — no Spark machinery
  * shared with the operator under test).
  */
class QualityGatesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def fixtureDocs(): Array[(Long, String)] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))

  test("bloom gate == the exact ingest screen, row for row (false " +
      "positives cannot survive the confirm join)") {
    val got = SparkEntry.queries("cp_bloom_gate")(spark, dir)
      .collect().map(_.toSeq).toVector
    val want = SparkEntry.queries("cp_contamination_stream")(spark, dir)
      .collect().map(_.toSeq).toVector
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("gopher rules: verdicts equal an imperative evaluation") {
    val stop = Set("the", "a", "of", "and", "to", "in", "is")
    val want = fixtureDocs().map { case (id, text) =>
      val ws = text.split(" ", -1)
      val nWords = ws.length.toLong
      val mwl = math.floor(
        (text.length - nWords + 1).toDouble / nWords * 1e9 + 0.5) / 1e9
      val nStop = ws.distinct.count(stop).toLong
      val alpha = math.floor(ws.count(_.exists(_.isLetter)).toDouble /
        nWords * 1e9 + 0.5) / 1e9
      id -> ((nWords, mwl, nStop, alpha,
        nWords >= 40L && nWords <= 120L && mwl >= 3.0 && mwl <= 10.0 &&
          nStop >= 2L && alpha >= 0.8))
    }.toMap
    val got = SparkEntry.queries("ta_gopher_rules")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_words"), r.getAs[Double]("mean_word_len"),
          r.getAs[Long]("n_stop_distinct"), r.getAs[Double]("alpha_frac"),
          r.getAs[Boolean]("keep")))).toMap
    assert(got == want)
    // the fixture must exercise both verdicts
    assert(got.values.exists(_._5) && got.values.exists(!_._5))
  }

  test("dupgram fraction: per-doc fractions equal a hash-map recount") {
    val k = 5
    def grams(text: String): Seq[String] = {
      val ws = text.split(" ", -1)
      if (ws.length < k) Seq.empty
      else (0 to ws.length - k).map(i => ws.slice(i, i + k).mkString(" "))
    }
    val docs = fixtureDocs()
    val occupancy = scala.collection.mutable
      .Map.empty[String, Set[Long]].withDefaultValue(Set.empty)
    docs.foreach { case (id, t) =>
      grams(t).foreach(g => occupancy(g) += id)
    }
    val want = docs.flatMap { case (id, t) =>
      val gs = grams(t)
      if (gs.isEmpty) None
      else {
        val dup = gs.count(g => occupancy(g).size >= 2).toLong
        Some(id -> ((gs.length.toLong, dup,
          math.floor(dup.toDouble / gs.length * 1e9 + 0.5) / 1e9)))
      }
    }.toMap
    val got = SparkEntry.queries("dd_dupgram_fraction")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_dup"),
          r.getAs[Double]("dup_frac")))).toMap
    assert(got == want)
    assert(got.values.exists(_._2 > 0L),
      "fixture has no cross-doc duplicate grams — signal untested")
  }

  test("cluster weights: mass conservation — weights sum to the doc " +
      "count, reps carry their cluster, duplicates carry zero") {
    val rows = SparkEntry.queries("dd_cluster_weights")(spark, dir)
      .collect()
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.length == nDocs, "every doc gets exactly one verdict row")
    assert(rows.map(_.getAs[Long]("weight")).sum == nDocs,
      "upweighting must conserve the corpus mass")
    rows.foreach { r =>
      val keep = r.getAs[Boolean]("keep")
      val w = r.getAs[Long]("weight")
      if (keep) assert(w == r.getAs[Long]("cluster_size"))
      else assert(w == 0L)
      assert(keep == (r.getAs[Long]("doc_id") == r.getAs[Long]("cluster")))
    }
    assert(rows.exists(_.getAs[Long]("weight") > 1L),
      "fixture has no multi-doc cluster — upweighting untested")
  }

  test("heaps law: decile curve equals a sequential-scan vocabulary " +
      "recount, and beta is finite and positive on the fixture") {
    val docs = fixtureDocs().sortBy(_._1)
    val n = docs.length.toLong
    def dec(id: Long): Int = (id * 10 / n + 1).toInt
    val seen = scala.collection.mutable.Set.empty[String]
    val agg = scala.collection.mutable.Map
      .empty[Int, (Long, Long, Long)].withDefaultValue((0L, 0L, 0L))
    docs.foreach { case (id, text) =>
      val ws = text.split(" ", -1)
      val fresh = ws.count(seen.add)
      val d = dec(id)
      val (a, b, c) = agg(d)
      agg(d) = (a + 1L, b + ws.length, c + fresh)
    }
    val want = agg.keys.toSeq.sorted
      .scanLeft((0, 0L, 0L, 0L)) { case ((_, ad, at, av), d) =>
        val (nd, nt, nv) = agg(d)
        (d, ad + nd, at + nt, av + nv)
      }.tail.map { case (d, nd, nt, nv) => d -> ((nd, nt, nv)) }.toMap
    val got = SparkEntry.queries("ta_heaps_law")(spark, dir)
      .collect().map(r => r.getAs[Int]("dec") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("vocab_size"),
          Option(r.getAs[java.lang.Double]("beta")).map(_.doubleValue))))
    assert(got.map { case (d, (a, b, c, _)) => d -> ((a, b, c)) }.toMap
      == want)
    // first decile has no predecessor: beta null there, finite after
    val betas = got.sortBy(_._1).map(_._2._4)
    assert(betas.head.isEmpty)
    assert(betas.tail.forall(b => b.exists(v => v >= 0.0 && v <= 1.5)),
      betas.mkString(","))
  }

  test("perplexity filter: per-source tallies equal regrouping the " +
      "ta_lm_perplexity scores through the same band") {
    val (lo, hi) = (3.35, 3.43)
    val nll = SparkEntry.queries("ta_lm_perplexity")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("nll")).toMap
    val srcOf = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = nll.toSeq.groupBy { case (id, _) => srcOf(id) }
      .map { case (src, xs) =>
        val kept = xs.count { case (_, v) => v >= lo && v <= hi }.toLong
        src -> ((xs.size.toLong,
          xs.count(_._2 < lo).toLong, xs.count(_._2 > hi).toLong, kept,
          math.floor(kept.toDouble / xs.size * 1e9 + 0.5) / 1e9))
      }
    val got = SparkEntry.queries("ta_perplexity_filter")(spark, dir)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_cut_low"),
          r.getAs[Long]("n_cut_high"), r.getAs[Long]("n_kept"),
          r.getAs[Double]("kept_frac")))).toMap
    assert(got == want)
  }
}
