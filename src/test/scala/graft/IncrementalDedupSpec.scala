package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.IncrementalDedup

/** The incremental ingest-dedup API: screening verdicts on a known
  * tiny corpus, artifact persistence round-trip, and the multi-round
  * accept→screen loop (a doc kept in round 1 must block its copy in
  * round 2).
  */
class IncrementalDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // accepted corpus: two distinct docs
  private def accepted = Seq(
    (100L, "alpha beta gamma delta epsilon zeta"),
    (200L, "one two three four five six")).toDF("id", "text")

  // batch: 10 = exact copy of 100; 11 = near-copy of 200 (one word
  // changed at the end); 12 = unique; 13 = exact copy of 12 (earlier
  // batch doc wins)
  private def batch = Seq(
    (10L, "alpha beta gamma delta epsilon zeta"),
    (11L, "one two three four five seven"),
    (12L, "red orange yellow green blue indigo"),
    (13L, "red orange yellow green blue indigo")).toDF("id", "text")

  test("screen flags exact, near, and batch-internal dups; keeps the unique doc") {
    val a = IncrementalDedup.artifacts(accepted, "id", "text")
    val v = IncrementalDedup.screen(batch, a, "id", "text", threshold = 0.5)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), r.getBoolean(3)))).toMap
    // doc 10: exact dup of accepted 100 (accepted id LARGER than batch
    // id — the accepted side must win regardless of id order)
    assert(v(10L) == (Some(100L), Some(100L), false))
    // doc 11: near dup of accepted 200 (4-of-6 words shared -> 3 of 4
    // 3-shingles differ... verified below at jaccard >= 0.5 on shingles)
    assert(v(11L)._1.isEmpty && v(11L)._2 == Some(200L) && !v(11L)._3)
    // doc 12: unique -> kept
    assert(v(12L) == (None, None, true))
    // doc 13: exact dup of EARLIER batch doc 12
    assert(v(13L)._1 == Some(12L) && !v(13L)._3)
  }

  test("artifacts survive a save/load round-trip byte-for-byte") {
    val path = Files.createTempDirectory("incdedup").toString
    val a = IncrementalDedup.artifacts(accepted, "id", "text")
    IncrementalDedup.save(a, path)
    val loaded = IncrementalDedup.load(spark, path)
    assert(loaded.keys.orderBy("id", "key").collect().toSeq ==
      a.keys.orderBy("id", "key").collect().toSeq)
  }

  test("accept() grows the accepted set so round-2 copies are caught") {
    val a = IncrementalDedup.artifacts(accepted, "id", "text")
    val v1 = IncrementalDedup.screen(batch, a, "id", "text")
    val keptIds = v1.filter(col("keep")).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(keptIds == Set(12L))
    val a2 = IncrementalDedup.accept(a,
      batch.filter(col("id").isin(keptIds.toSeq: _*)), "id", "text")
    // round 2: a copy of the doc accepted in round 1 must be rejected
    val round2 = Seq(
      (20L, "red orange yellow green blue indigo"),
      (21L, "totally fresh words never seen before")).toDF("id", "text")
    val v2 = IncrementalDedup.screen(round2, a2, "id", "text")
      .collect().map(r => (r.getLong(0), r.getBoolean(3))).toMap
    assert(!v2(20L) && v2(21L))
  }

  test("property: screen verdicts equal the brute-force definition on random corpora") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // tiny vocab forces real collisions: exact copies, near-copies and
    // disjoint docs all occur across the generated corpora
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val genDoc = for {
      n <- Gen.chooseNum(3, 7)
      ws <- Gen.listOfN(n, Gen.oneOf(vocab))
    } yield ws.mkString(" ")
    val genCorpus = Gen.listOfN(14, genDoc)

    def shingles(t: String): Set[String] = {
      val ws = t.split(' ')
      (0 to ws.length - 3).map(i => ws.slice(i, i + 3).mkString(" ")).toSet
    }
    def jacc(a: Set[String], b: Set[String]): Double =
      if (a.isEmpty || b.isEmpty) 0.0
      else a.intersect(b).size.toDouble / a.union(b).size

    var seed = Seed(42L)
    (1 to 8).foreach { round =>
      val (corpus, next) = {
        val r = genCorpus.pureApply(org.scalacheck.Gen.Parameters.default, seed)
        (r, seed.next)
      }
      seed = next
      val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val (acc, bat) = docs.partition(_._1 % 2 == 0)
      val a = IncrementalDedup.artifacts(acc.toDF("id", "text"), "id", "text")
      val got = IncrementalDedup
        .screen(bat.toDF("id", "text"), a, "id", "text", threshold = 0.5)
        .collect()
        .map(r => r.getLong(0) ->
          ((Option(r.get(1)).map(_.toString.toLong),
            Option(r.get(2)).map(_.toString.toLong)))).toMap
      // brute-force reference
      val byId = docs.toMap
      bat.foreach { case (bId, bTxt) =>
        val priors = acc.map(_._1) ++ bat.map(_._1).filter(_ < bId)
        val wantExact = priors.filter(p => byId(p) == bTxt)
          .sorted.headOption
        val bSh = shingles(bTxt)
        val wantNear = priors
          .filter(p => jacc(shingles(byId(p)), bSh) >= 0.5)
          .sorted.headOption
        assert(got(bId)._1 == wantExact,
          s"round $round doc $bId exact: got ${got(bId)._1}, want $wantExact")
        assert(got(bId)._2 == wantNear,
          s"round $round doc $bId near: got ${got(bId)._2}, want $wantNear")
      }
    }
  }

  test("the gated query (dd_incremental) equals the API composed inline") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables(spark, dir, "documents")
    val a = IncrementalDedup.artifacts(
      docs.filter(pmod(col("doc_id"), lit(2)) === 0), "doc_id", "text")
    val api = IncrementalDedup
      .screen(docs.filter(pmod(col("doc_id"), lit(2)) === 1), a,
        "doc_id", "text")
      .collect().toSeq
    val gated = SparkEntry.queries("dd_incremental")(spark, dir)
      .collect().toSeq
    assert(api == gated && api.nonEmpty)
  }
}
