package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke + properties the DuckDB oracle can't express
  * (sketch accuracy, streaming equivalences).
  */
class QueriesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle") {
    val oracles = SparkEntry.oracleSql.keySet
    val all = SparkEntry.queries.keySet
    assert(oracles.subsetOf(all))
    // the HLL sketch hashes a tolerance verdict and the streaming
    // sessions are sentinel-flushed, so even those two are oracle'd now
    assert((all -- oracles) == Set.empty[String])
  }

  test("ta_source_overlap: bitmask-histogram matrix equals direct set math") {
    val out = SparkEntry.queries("ta_source_overlap")(spark, dir).collect()
    val nSrc = graft.Tables(spark, dir, "documents")
      .select("source").distinct().count().toInt
    assert(out.length == nSrc * (nSrc - 1) / 2, "one row per source pair")
    out.foreach { r =>
      val (common, na, nb) = (r.getAs[Long]("n_common"),
        r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      assert(common <= math.min(na, nb), s"intersection bound: $r")
      val j = r.getAs[Double]("jaccard")
      val expected = // the Quant.qdec(x, 9) quantization of the ratio
        math.floor(common.toDouble / (na + nb - common) * 1e9 + 0.5) / 1e9
      assert(j >= 0.0 && j <= 1.0 && j == expected)
    }
    // direct (non-bitmask) recomputation of one pair must agree — the
    // histogram path is an optimization, not a definition
    val first = out.minBy(r => (r.getString(0), r.getString(1)))
    val (sa, sb) = (first.getString(0), first.getString(1))
    import org.apache.spark.sql.functions._
    def gramSet(src: String) = graft.Tables(spark, dir, "documents")
      .filter(col("source") === src)
      .select(explode(graft.functions.WordShingles(col("text"), 3)).as("g"))
      .distinct().collect().map(_.getString(0)).toSet
    val (ga, gb) = (gramSet(sa), gramSet(sb))
    assert(first.getAs[Long]("n_a") == ga.size.toLong)
    assert(first.getAs[Long]("n_b") == gb.size.toLong)
    assert(first.getAs[Long]("n_common") == ga.intersect(gb).size.toLong)
  }

  test("dd_bbit_minhash: estimator identity holds and exact dups read 63/63") {
    val out = SparkEntry.queries("dd_bbit_minhash")(spark, dir).collect()
    assert(out.nonEmpty, "the sf0.001 fixture has near-dup pairs")
    def q9(x: Double) = math.floor(x * 1e9 + 0.5) / 1e9
    out.foreach { r =>
      val m = r.getAs[Int]("matched_bits")
      assert(m >= 0 && m <= 63)
      // the output columns are DEFINED off matched_bits — re-derive
      assert(r.getAs[Double]("j_bbit") == q9(2.0 * m / 63 - 1.0), s"$r")
      assert(r.getAs[Double]("abs_err") ==
        q9(math.abs(r.getAs[Double]("j_bbit") - r.getAs[Double]("j_exact"))))
      // Li-König Eq. 3 correction at hash-universe densities
      // (r = |S|/2^40 ~ 1e-10): provably within r of the simplified
      // estimator — the sketch's bias really is negligible here
      assert(math.abs(r.getAs[Double]("j_bbit_corrected") -
        r.getAs[Double]("j_bbit")) <= 1e-8, s"correction bound: $r")
    }
    // ...but NOT erased by the render: the 12-decimal quantization
    // keeps the ~1e-10 correction observable on imperfect matches
    assert(out.exists(r => r.getAs[Double]("j_bbit_corrected") !=
      r.getAs[Double]("j_bbit")),
      "j_bbit_corrected must be distinguishable from j_bbit")
    // identical shingle SETS share every min, hence all 63 bits —
    // when the fixture has such pairs the estimator must read exactly
    // 1.0 on them (conditional: the sf0.001 near-dups top out ~0.99)
    out.filter(_.getAs[Double]("j_exact") == 1.0).foreach { r =>
      assert(r.getAs[Int]("matched_bits") == 63, s"full match expected: $r")
      assert(r.getAs[Double]("j_bbit") == 1.0)
    }
    // high-J pairs must read high: for j >= 0.95 each bit matches with
    // p >= 0.975 (E[m] >= 61.4, sd <= 1.24) — 52 is an 7.5-sigma floor
    out.filter(_.getAs[Double]("j_exact") >= 0.95).foreach { r =>
      assert(r.getAs[Int]("matched_bits") >= 52, s"estimator floor: $r")
    }
    // b=1 estimator sanity on the candidate set as a whole: mean
    // absolute error bounded by a few estimator standard deviations
    // (sd(J-hat) = 2*sd(p-hat) <= 1/sqrt(63) ~ 0.126)
    val meanErr = out.map(_.getAs[Double]("abs_err")).sum / out.length
    assert(meanErr < 0.25, f"estimator off the rails: meanErr=$meanErr%.3f")
  }

  test("ev_sequence_pattern: regex-over-session-strings equals a direct " +
    "Scala sessionize + java.util.regex recount") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("ev_sequence_pattern")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("cohort") ->
        (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_match_sessions"),
          r.getAs[Long]("n_matches")))
      .toMap
    // independent recomputation: collect, sessionize imperatively,
    // count with java.util.regex (a third engine for the semantics)
    val code = Map("click" -> 'c', "error" -> 'e', "purchase" -> 'p',
      "signup" -> 's', "view" -> 'v')
    val ev = graft.Tables(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        code(r.getString(3))))
    val pat = java.util.regex.Pattern.compile("v+cp")
    val agg = scala.collection.mutable.Map
      .empty[Long, (Long, Long, Long)].withDefaultValue((0L, 0L, 0L))
    ev.groupBy(_._1).foreach { case (user, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3))
      val sessions = scala.collection.mutable.ArrayBuffer(
        new StringBuilder)
      ordered.zipWithIndex.foreach { case ((_, us, _, ch), i) =>
        if (i > 0 && us - ordered(i - 1)._2 > 30L * 60 * 1000000)
          sessions += new StringBuilder
        sessions.last.append(ch)
      }
      sessions.foreach { sb =>
        val m = pat.matcher(sb.toString)
        var n = 0L
        while (m.find()) n += 1
        val (s0, ms0, m0) = agg(user % 10)
        agg(user % 10) = (s0 + 1, ms0 + (if (n > 0) 1 else 0), m0 + n)
      }
    }
    assert(out == agg.toMap, s"\nspark=$out\ndirect=${agg.toMap}")
  }

  test("sequencePatternWith: a second pattern (vc) matches a direct " +
    "Scala sessionize + java.util.regex recount") {
    import org.apache.spark.sql.functions._
    val cfg = graft.queries.SequencePatternConfig(
      Map("click" -> "c", "error" -> "e", "purchase" -> "p",
        "signup" -> "s", "view" -> "v"),
      "vc") // 2 matches at sf0.001 — vvc/v+cp find nothing this small
    val out = graft.queries.Events.sequencePatternWith(cfg)(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("cohort") ->
        (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_match_sessions"),
          r.getAs[Long]("n_matches")))
      .toMap
    val code = Map("click" -> 'c', "error" -> 'e', "purchase" -> 'p',
      "signup" -> 's', "view" -> 'v')
    val ev = graft.Tables(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        code(r.getString(3))))
    val pat = java.util.regex.Pattern.compile("vc")
    val agg = scala.collection.mutable.Map
      .empty[Long, (Long, Long, Long)].withDefaultValue((0L, 0L, 0L))
    ev.groupBy(_._1).foreach { case (user, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3))
      val sessions = scala.collection.mutable.ArrayBuffer(
        new StringBuilder)
      ordered.zipWithIndex.foreach { case ((_, us, _, ch), i) =>
        if (i > 0 && us - ordered(i - 1)._2 > 30L * 60 * 1000000)
          sessions += new StringBuilder
        sessions.last.append(ch)
      }
      sessions.foreach { sb =>
        val m = pat.matcher(sb.toString)
        var n = 0L
        while (m.find()) n += 1
        val (s0, ms0, m0) = agg(user % 10)
        agg(user % 10) = (s0 + 1, ms0 + (if (n > 0) 1 else 0), m0 + n)
      }
    }
    // the second pattern must actually count something different from
    // the REGISTERED default (v+cp), or this spec proves nothing
    // beyond the default's test — compare against that query's output,
    // not against the recount the next assert already pins (vc finds
    // 2 matches at sf0.001 where v+cp finds 0, so the totals differ
    // AND the equality below is exercised on nonzero matches)
    val defaultMatches =
      SparkEntry.queries("ev_sequence_pattern")(spark, dir)
        .collect().map(_.getAs[Long]("n_matches")).sum
    assert(agg.values.map(_._3).sum != defaultMatches,
      "vc and the default v+cp pattern counted the same total — " +
        "the second-pattern drive is not exercising anything new")
    assert(agg.values.map(_._3).sum > 0,
      "the second pattern found no matches — pick one that fires " +
        "at this fixture scale or the recount equality is vacuous")
    assert(out == agg.toMap, s"\nspark=$out\ndirect=${agg.toMap}")
  }

  test("ev_sequence_pattern_multi: every pattern row equals its " +
    "single-pattern run; greedy s.*p matches at most once per session") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("cohort"), r.getAs[Long]("n_sessions"),
        r.getAs[Long]("n_match_sessions"), r.getAs[Long]("n_matches")))
      .toSet
    val multi = SparkEntry.queries("ev_sequence_pattern_multi")(spark, dir)
      .collect()
      .groupBy(_.getAs[String]("pattern_name"))
      .map { case (n, rs) => n -> rs.map(r =>
        (r.getAs[Long]("cohort"), r.getAs[Long]("n_sessions"),
          r.getAs[Long]("n_match_sessions"), r.getAs[Long]("n_matches")))
        .toSet }
    assert(multi.keySet ==
      Set("funnel", "double_view_click", "signup_then_purchase"))
    val cfg = graft.queries.SequencePatternConfig.Default
    assert(multi("funnel") ==
      rows(SparkEntry.queries("ev_sequence_pattern")(spark, dir)))
    assert(multi("double_view_click") == rows(graft.queries.Events
      .sequencePatternWith(cfg.copy(pattern = "vvc"))(spark, dir)))
    assert(multi("signup_then_purchase") == rows(graft.queries.Events
      .sequencePatternWith(cfg.copy(pattern = "s.*p"))(spark, dir)))
    // greedy s.*p consumes to the session's LAST p — a second match
    // would need another s followed by a later p, which cannot exist
    multi("signup_then_purchase").foreach { case (_, _, ms, m) =>
      assert(ms == m, "greedy non-contiguous pattern matched twice")
    }
  }

  test("cp_contamination_fuzzy equals a brute-force all-pairs " +
    "test-vs-train Jaccard recount (LSH recall holds)") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("cp_contamination_fuzzy")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_train_matches"),
          Option(r.getAs[java.lang.Double]("best_jaccard")).map(_.toDouble),
          Option(r.getAs[java.lang.Long]("contaminated_by")).map(_.toLong)))
      .toMap
    // imperative ground truth: every test x train pair, exact Jaccard
    // over distinct 3-shingles — no banding, no hashing
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1))
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"split:$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(
        md.take(3).map("%02x".format(_)).mkString, 16) % 100
    }
    def sh(ws: Array[String]): Set[String] =
      if (ws.length >= 3)
        (0 to ws.length - 3).map(i => ws.slice(i, i + 3).mkString(" ")).toSet
      else Set.empty
    val train = docs.filter(d => bucket(d._1) < 80)
      .map { case (id, ws) => id -> sh(ws) }.filter(_._2.nonEmpty)
    val test = docs.filter(d => bucket(d._1) >= 90)
    val expect = test.map { case (tid, ws) =>
      val ts = sh(ws)
      val hits = train.flatMap { case (rid, rs) =>
        if (ts.isEmpty) None
        else {
          val ni = (ts & rs).size
          val j = ni.toDouble / (ts.size + rs.size - ni)
          if (j >= 0.5) Some(rid -> j) else None
        }
      }
      val best = if (hits.isEmpty) None else Some(hits.map(_._2).max)
      val culprit = best.map(b =>
        hits.filter(_._2 == b).map(_._1).min)
      tid -> (hits.length.toLong, best, culprit)
    }.toMap
    assert(out == expect, s"\nspark=$out\ndirect=$expect")
    assert(out.values.exists(_._1 > 0), "fixture must show a fuzzy leak")
  }

  test("SequencePatternConfig rejects invalid configs eagerly") {
    val codes = Map("view" -> "v", "click" -> "c")
    intercept[IllegalArgumentException] {
      graft.queries.SequencePatternConfig(Map.empty, "v+")
    }
    intercept[IllegalArgumentException] { // non-injective codes
      graft.queries.SequencePatternConfig(
        Map("view" -> "v", "click" -> "v"), "v+")
    }
    intercept[IllegalArgumentException] { // multi-char code
      graft.queries.SequencePatternConfig(Map("view" -> "vw"), "v+")
    }
    intercept[IllegalArgumentException] {
      graft.queries.SequencePatternConfig(codes, "v+", gapMinutes = 0)
    }
    intercept[java.util.regex.PatternSyntaxException] { // malformed regex
      graft.queries.SequencePatternConfig(codes, "v+(")
    }
  }

  test("dd_substring_spans: gram-chain histogram equals a direct " +
    "imperative suffix-scan recount") {
    import org.apache.spark.sql.functions._
    val k = 20
    val out = SparkEntry.queries("dd_substring_spans")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("span_tokens") ->
        (r.getAs[Long]("n_spans"), r.getAs[Long]("n_docs")))
      .toMap
    // independent recomputation: collect texts, build the gram
    // occurrence index imperatively (raw strings, no md5), extend
    // runs with a linear scan per doc — a third engine for the
    // semantics and a falsifier for silent md5-key bugs
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1))
      .filter(_._2.length >= k)
    val occ = scala.collection.mutable.Map.empty[String, Int]
      .withDefaultValue(0)
    val grams = docs.map { case (id, ws) =>
      id -> (0 to ws.length - k).map(i => ws.slice(i, i + k).mkString(" "))
    }
    grams.foreach(_._2.foreach(g => occ(g) += 1))
    val agg = scala.collection.mutable.Map.empty[Long, (Long, Set[Long])]
      .withDefaultValue((0L, Set.empty))
    grams.foreach { case (id, gs) =>
      var run = 0
      def close(): Unit = if (run > 0) {
        val span = (run + k - 1).toLong
        val (n, ds) = agg(span)
        agg(span) = (n + 1, ds + id)
        run = 0
      }
      gs.foreach { g => if (occ(g) >= 2) run += 1 else close() }
      close()
    }
    val expect = agg.map { case (sp, (n, ds)) =>
      sp -> (n, ds.size.toLong) }.toMap
    assert(out == expect, s"\nspark=$out\ndirect=$expect")
    assert(out.nonEmpty, "fixture must actually contain repeated spans")
  }

  test("dd_substring_trim: island interval-union coverage equals a " +
    "direct boolean-mark recount") {
    import org.apache.spark.sql.functions._
    val k = 20
    val out = SparkEntry.queries("dd_substring_trim")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("decile") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens"),
          r.getAs[Long]("covered_tokens")))
      .toMap
    // independent recount: per doc, literally MARK each token covered
    // by a duplicated k-gram window in a boolean array and count marks
    // — the ground-truth interval union the island formula must equal
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1))
    val occ = scala.collection.mutable.Map.empty[String, Int]
      .withDefaultValue(0)
    val grams = docs.map { case (id, ws) =>
      (id, ws.length,
        if (ws.length >= k)
          (0 to ws.length - k).map(i => ws.slice(i, i + k).mkString(" "))
        else Seq.empty[String])
    }
    grams.foreach(_._3.foreach(g => occ(g) += 1))
    val agg = scala.collection.mutable.Map.empty[Long, (Long, Long, Long)]
      .withDefaultValue((0L, 0L, 0L))
    grams.foreach { case (id, n, gs) =>
      val marked = Array.fill(n)(false)
      gs.zipWithIndex.foreach { case (g, p) =>
        if (occ(g) >= 2) (p until p + k).foreach(marked(_) = true)
      }
      val (d0, t0, c0) = agg(id % 10)
      agg(id % 10) = (d0 + 1, t0 + n, c0 + marked.count(identity))
    }
    assert(out == agg.toMap, s"\nspark=$out\ndirect=${agg.toMap}")
    assert(out.values.exists(_._3 > 0), "fixture must have covered spans")
  }

  test("cp_contamination_spans agrees with cp_contamination on WHICH " +
    "docs are contaminated, and its span stats are internally sound") {
    val k = 13
    val spans = SparkEntry.queries("cp_contamination_spans")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_hits"),
          r.getAs[Long]("longest_span_tokens"),
          r.getAs[Long]("covered_tokens")))
      .toMap
    val flat = SparkEntry.queries("cp_contamination")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("contaminated"))
      .toMap
    // same split, same k, same tokenization — the two screens must
    // flag the same documents (the span screen adds HOW MUCH, not WHO)
    assert(spans.keySet == flat.keySet)
    flat.foreach { case (id, c) =>
      assert((spans(id)._2 > 0) == c, s"doc $id: flat=$c spans=${spans(id)}")
    }
    spans.values.foreach { case (nGrams, nHits, longest, covered) =>
      assert(nHits <= nGrams)
      assert(longest == 0 || longest >= k) // any hit spans >= k tokens
      assert(covered >= longest) // union covers at least the best run
      assert(covered <= nGrams + k - 1) // can't exceed the doc's tokens
      assert((nHits == 0) == (covered == 0))
    }
    assert(spans.values.exists(_._2 > 0), "fixture must show contamination")
  }

  test("ev_day_bitmap: mask arithmetic equals direct streak computation") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("ev_day_bitmap")(spark, dir).collect()
    // census covers every user exactly once
    val nUsers = graft.Tables(spark, dir, "events")
      .select("user_id").distinct().count()
    assert(out.map(_.getAs[Long]("n_users")).sum == nUsers)
    out.foreach { r =>
      val (act, st) = (r.getAs[Int]("n_active_days"),
        r.getAs[Int]("longest_streak"))
      assert(st >= 1 && st <= act, s"streak bounds: $r")
    }
    // direct per-user recomputation (sets + linear scan, no bitmasks)
    val byUser = graft.Tables(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getDate(1).toLocalDate).toSet).toMap
    val want = byUser.values.map { days =>
      val sorted = days.toSeq.sorted
      val streak = sorted.foldLeft((0, 0, Option.empty[java.time.LocalDate])) {
        case ((best, cur, prev), d) =>
          val c = if (prev.exists(p => p.plusDays(1) == d)) cur + 1 else 1
          (math.max(best, c), c, Some(d))
      }._1
      (days.size, streak)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = out.map(r => ((r.getAs[Int]("n_active_days"),
      r.getAs[Int]("longest_streak")), r.getAs[Long]("n_users"))).toMap
    assert(got == want)
  }

  test("mm_decode_wav containers parse under the JDK's own audio stack") {
    // independent-parser check: the PRODUCTION encoder's bytes
    // (queries.Multimodal.encodeWavPcm16 — the same function the query
    // runs in mapPartitions) must be a WAV that javax.sound (a parser
    // we did NOT write) also accepts, with the same format parameters
    // our chunk-walker reports, and sample payloads decoded verbatim
    val blob = "the quick brown fox".getBytes("UTF-8")
    val nSamples = 200
    val wav = graft.queries.Multimodal.encodeWavPcm16(blob, nSamples, 8000)
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val fmt = in.getFormat
    assert(fmt.getSampleRate == 8000f && fmt.getChannels == 1 &&
      fmt.getSampleSizeInBits == 16)
    assert(in.getFrameLength == nSamples.toLong)
    // javax.sound must hand back the exact PCM the encoder wrote
    val pcm = in.readAllBytes()
    assert(pcm.length == nSamples * 2)
    val first = ((pcm(1) << 8) | (pcm(0) & 0xff)).toShort
    assert(first == (((blob(0) & 0xff) - 128) * 256).toShort)
    in.close()
  }

  test("ta_vocab_hll: HLL estimate within 3x rsd of exact") {
    val rows = SparkEntry.queries("ta_vocab_hll")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("within_tolerance"),
        s"sketch outside 3-sigma tolerance for source ${r.get(0)}")
    }
  }

  test("dd_components on a corpus with no near-dup pairs returns empty, not NPE") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_nodups").toString
    Seq(
      (0L, "alpha beta gamma delta epsilon zeta", "en", "s", 30L),
      (1L, "one two three four five six", "en", "s", 25L),
      (2L, "red green blue yellow purple orange", "en", "s", 30L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("dd_components")(spark, tmp)
    assert(out.count() == 0)
  }

  test("dd_pair_pagerank: the driver endgame is BIT-EXACT against the " +
      "forced distributed loop (pure Long fixed-point, order-free)") {
    def rows(cap: Int) = graft.queries.Dedup
      .pairPagerankWith(spark, dir, localFinishEdges = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val endgame = rows(1 << 16)
    val distributed = rows(0)
    assert(endgame.nonEmpty && endgame == distributed)
    val ex = intercept[IllegalArgumentException](rows((1 << 20) + 1))
    assert(ex.getMessage.contains("bounded"))
  }

  test("true BPE count sits inside the pre-token/char bracket") {
    // the planning contract ta_bpe_token_count documents: merges never
    // cross pre-token boundaries, so pre-tokens lower-bound the true
    // count and non-space chars upper-bound it, on every document
    val bracket = SparkEntry.queries("ta_bpe_token_count")(spark, dir)
      .select("doc_id", "n_bpe").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = SparkEntry.queries("ta_bpe_true_count")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, nTrue, nPre) = (r.getLong(0), r.getInt(1), r.getInt(2))
      assert(nPre == bracket(id), s"doc $id: pre-token counts disagree")
      assert(nPre <= nTrue, s"doc $id: true BPE below the pre-token floor")
    }
  }

  test("weighted reservoir sample is biased toward heavy documents") {
    // deterministic given the fixture + salt: the n_chars-weighted
    // A-ES sample's mean weight must exceed the corpus mean (the
    // entire point of weighting), which no oracle row can express
    val sample = SparkEntry.queries("cp_reservoir_sample")(spark, dir)
      .agg(avg(col("w"))).collect()(0).getDouble(0)
    val corpus = Tables(spark, dir, "documents")
      .agg(avg(col("n_chars"))).collect()(0).getDouble(0)
    assert(sample > corpus,
      f"sample mean weight $sample%.1f not above corpus mean $corpus%.1f")
  }

  test("dedup-weighted sample draws only representatives, keys " +
      "recompute imperatively, duplicate-mass bias is real") {
    val sample = SparkEntry.queries("cp_dedup_weighted_sample")(spark, dir)
      .collect()
    val weights = SparkEntry.queries("dd_cluster_weights")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("cluster"), r.getAs[Long]("weight")))).toMap
    assert(sample.length == math.min(50,
      weights.count(_._2._2 >= 1)))
    assert(sample.map(_.getAs[Long]("doc_id")).distinct.length ==
      sample.length)
    val md = java.security.MessageDigest.getInstance("MD5")
    sample.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (cluster, w) = weights(id)
      assert(w >= 1, s"doc $id drawn with weight $w")
      assert(id == cluster, s"doc $id is not its cluster's representative")
      assert(r.getAs[Long]("weight") == w)
      // ES key: round(ln((bucket+1)/2^24) / w, 9), bucket from the
      // salted md5 — recomputed from scratch
      val hex = md.digest(s"ddw:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(6)
      val u = (java.lang.Long.parseLong(hex, 16) % (1 << 24) + 1.0) /
        (1 << 24).toDouble
      val key = BigDecimal(math.log(u) / w)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("key_r") - key) <= 1e-9,
        s"doc $id key diverged")
    }
    // no cluster contributes two docs (reps only), and at least one
    // multi-member family made the sample (the weighting does work)
    val clusters = sample.map(_.getAs[Long]("cluster"))
    assert(clusters.distinct.length == clusters.length)
    assert(sample.exists(_.getAs[Long]("weight") > 1),
      "no upweighted family sampled — fixture exercises nothing")
  }

  test("sentinel-flushed streaming sessions equal batch sessionization") {
    val streamed = SparkEntry.queries("evs_session_windows")(spark, dir).count()
    val batch = SparkEntry.queries("ev_sessionize")(spark, dir).count()
    assert(streamed > 0 && streamed == batch)
  }

  test("foreachBatch sink: streaming micro-batches land as parquet") {
    // the transactional-sink pattern for pushing streaming results to
    // systems without a native connector (e.g. a JDBC target): each
    // micro-batch arrives as a batch DataFrame with an id for
    // exactly-once bookkeeping
    val out = java.nio.file.Files.createTempDirectory("graft_febatch").toString
    val ss = spark.newSession()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampNTZType),
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType)))
    val batchIds = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = ss.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .writeStream.outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        batchIds.add(id)
        batch.write.mode("overwrite").parquet(s"$out/batch_$id")
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    assert(!batchIds.isEmpty)
    val landed = spark.read.parquet(s"$out/batch_${batchIds.peek}")
    val expected = Tables(spark, dir, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    assert(landed.count() == expected.count())
    assert(landed.columns.sorted.sameElements(Array("n", "user_id")))
  }

  test("mm_frames_real TIFF blobs parse under a hand-written IFD walker") {
    // the multi-frame claim must hold at the CONTAINER level, checked
    // by a parser we wrote from the TIFF 6.0 layout, not by the same
    // ImageIO stack that produced the blob: walk the IFD offset chain,
    // count directories, and read width/height from tags 256/257
    val side = 16
    val nf = 4
    val blob = "the quick brown fox".getBytes("UTF-8")
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
    w.setOutput(ios)
    w.prepareWriteSequence(null)
    for (f <- 0 until nf) {
      val img = new java.awt.image.BufferedImage(
        side, side, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (i <- 0 until side * side)
        img.getRaster.setSample(i % side, i / side, 0,
          blob((i + 7 * f) % blob.length) & 0xff)
      w.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    w.endWriteSequence(); ios.flush(); w.dispose(); ios.close()
    val t = bos.toByteArray

    val little = (t(0), t(1)) match {
      case ('I', 'I') => true
      case ('M', 'M') => false
      case other => fail(s"bad TIFF byte-order mark: $other")
    }
    def u16(off: Int): Int =
      if (little) (t(off) & 0xff) | ((t(off + 1) & 0xff) << 8)
      else ((t(off) & 0xff) << 8) | (t(off + 1) & 0xff)
    def u32(off: Int): Long =
      if (little) (0 to 3).map(i => (t(off + i) & 0xffL) << (8 * i)).sum
      else (0 to 3).map(i => (t(off + i) & 0xffL) << (8 * (3 - i))).sum
    assert(u16(2) == 42, "TIFF magic")

    var ifdOff = u32(4)
    var frames = 0
    while (ifdOff != 0) {
      val n = u16(ifdOff.toInt)
      val entries = (0 until n).map { e =>
        val base = ifdOff.toInt + 2 + e * 12
        // entry: tag(+0), type(+2), count(+4), value/offset(+8);
        // inline value: SHORT (type 3) sits in the first 2 bytes,
        // LONG (4) in all 4 — both cover width/height here
        val v = if (u16(base + 2) == 3) u16(base + 8).toLong
          else u32(base + 8)
        u16(base) -> v
      }.toMap
      assert(entries(256) == side && entries(257) == side,
        s"frame $frames dims: $entries")
      frames += 1
      ifdOff = u32(ifdOff.toInt + 2 + n * 12)
    }
    assert(frames == nf, s"container holds $frames IFDs, expected $nf")
  }

  test("cp_leakage_safe_split invariant: no verified near-dup pair " +
    "straddles splits") {
    import graft.dedup.MinHashDedup
    val docs = Tables(spark, dir, "documents")
    val pairs = MinHashDedup.verifiedPairs(docs,
      MinHashDedup.candidatePairs(
        MinHashDedup.signatures(docs, "doc_id", "text")),
      "doc_id", "text", 0.5).select(col("id_a"), col("id_b")).cache()
    assert(pairs.count() > 0, "fixture has no near-dup pairs — vacuous")
    val comp = graft.dedup.ConnectedComponents.alternatingStars(pairs)
      .withColumnRenamed("node", "doc_id")
    val bucket = graft.corpus.CorpusPipeline.hashBucket("rep", "lsplit:", 100)
    val assigned = docs.select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .withColumn("rep", coalesce(col("component"), col("doc_id")))
      .withColumn("split",
        when(bucket < 80, "train").when(bucket < 90, "validation")
          .otherwise("test"))
      .select(col("doc_id"), col("split"))
    val straddlers = pairs
      .join(assigned.withColumnRenamed("doc_id", "id_a")
        .withColumnRenamed("split", "split_a"), "id_a")
      .join(assigned.withColumnRenamed("doc_id", "id_b")
        .withColumnRenamed("split", "split_b"), "id_b")
      .filter(col("split_a") =!= col("split_b"))
    assert(straddlers.count() == 0)
  }

  test("mig_cdc_merge equals a driver-side replay of the change log") {
    // independent semantics check: apply the ops sequentially by
    // version into a plain map (the definitionally-correct merge),
    // then compare the per-status rollup with the distributed window
    val out = SparkEntry.queries("mig_cdc_merge")(spark, dir)
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val base = Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val state = scala.collection.mutable.Map.empty[Long, (String, Double)]
    base.foreach { case (k, st, p) => state(k) = (st, p) } // v1
    base.foreach { case (k, st, p) => // v2: update
      if (k % 10 == 0) state(k) = (st, p + 1000.0) }
    base.foreach { case (k, _, _) => // v3: delete
      if (k % 17 == 0) state.remove(k) }
    base.foreach { case (k, st, _) => // v4: re-insert
      if (k % 34 == 0) state(k) = (st, 42.0) }
    base.foreach { case (k, st, p) => // v5: update
      if (k % 20 == 0) state(k) = (st, p + 5000.0) }
    val expected = state.toSeq
      .groupBy { case (_, (st, _)) => st }
      .map { case (st, rows) =>
        val cents = rows.map { case (_, (_, p)) =>
          java.math.BigDecimal.valueOf(p)
            .setScale(2, java.math.RoundingMode.HALF_UP)
        }.reduce(_ add _)
        st -> (rows.size.toLong, rows.map(_._1).sum, cents.doubleValue)
      }
    assert(out == expected, s"query=$out expected=$expected")
  }

  test("mig_zorder: Morton layout bounds skipping on BOTH dims; " +
    "linear only on its sort key") {
    val rows = SparkEntry.queries("mig_zorder")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val (nFiles, _) = rows(("zorder", "x"))
    // linear-by-x: near-perfect on x, touches EVERY file on y
    assert(rows(("linear", "y"))._2 == nFiles.toDouble)
    assert(rows(("linear", "x"))._2 <= 3.0)
    // zorder: strictly better than full-scan on the off dimension,
    // and both dims bounded well under half the files
    assert(rows(("zorder", "y"))._2 < nFiles.toDouble / 2)
    assert(rows(("zorder", "x"))._2 < nFiles.toDouble / 2)
  }

  test("ev_gap_fill: complete per-user spine, fill never regresses " +
    "to null, observed rows carry their own gauge") {
    val rows = SparkEntry.queries("ev_gap_fill")(spark, dir).collect()
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (u, rs) =>
      val hrs = rs.map(_.getLong(1)).sorted
      // spine completeness: every hour between first and last, exactly once
      assert(hrs.head + hrs.length - 1 == hrs.last,
        s"user $u spine has holes")
      assert(hrs.distinct.length == hrs.length)
      // first spine hour is the user's first active hour → no leading null
      rs.foreach(r => assert(!r.isNullAt(3), s"user $u null fill"))
      assert(rs.head.getBoolean(2) || rs.exists(_.getBoolean(2)))
    }
    // forward fill: between observations the value is constant
    byUser.foreach { case (_, rs) =>
      rs.sortBy(_.getLong(1)).foldLeft(Option.empty[Double]) { (prev, r) =>
        val v = r.getDouble(3)
        if (!r.getBoolean(2)) assert(prev.contains(v), "fill drifted")
        Some(v)
      }
    }
  }

  test("mig_compaction_plan: next-fit groups respect the target bound " +
    "and conserve the file inventory") {
    val target = 32768L
    val rows = SparkEntry.queries("mig_compaction_plan")(spark, dir)
      .collect()
    // next-fit invariant: a group exceeds the target only by less than
    // its own largest member (the straddling file), never more
    rows.foreach { r =>
      val (bytes, largest) = (r.getLong(3), r.getLong(4))
      assert(bytes < target + largest,
        s"group ${r.getInt(0)}/${r.getLong(1)} overflows: $bytes")
    }
    // conservation: group bytes sum to the modeled inventory (64 B/row)
    val nLineitem = graft.Tables(spark, dir, "lineitem").count()
    assert(rows.map(_.getLong(3)).sum == nLineitem * 64L)
  }

  test("cp_pad_waste: finer buckets never waste more padding") {
    val byW = SparkEntry.queries("cp_pad_waste")(spark, dir).collect()
      .map(r => r.getInt(0) -> r.getDouble(5)).toMap
    assert(byW(16) <= byW(32) && byW(32) <= byW(64) && byW(64) <= byW(128),
      s"padding waste not monotone in bucket width: $byW")
  }

  test("sim_pca_power: unit max-norm fixed-point eigenvector with high " +
    "Rayleigh alignment against an independently computed covariance") {
    val out = SparkEntry.queries("sim_pca_power")(spark, dir).collect()
    assert(out.length == 64)
    val v = out.sortBy(_.getInt(0)).map(_.getLong(1).toDouble / 1e9)
    assert(math.abs(v.map(math.abs).max - 1.0) < 1e-9) // max-norm = 1
    // independent covariance: plain double arithmetic over the raw rows
    val vecs = graft.Tables(spark, dir, "embeddings")
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = vecs.length.toDouble
    val d = 64
    val mean = Array.tabulate(d)(i => vecs.map(_(i)).sum / n)
    val c = Array.tabulate(d, d) { (i, j) =>
      vecs.map(x => x(i) * x(j)).sum / n - mean(i) * mean(j)
    }
    val cvv = Array.tabulate(d)(i => (0 until d).map(j => c(i)(j) * v(j)).sum)
    val dot = (0 until d).map(i => cvv(i) * v(i)).sum
    val na = math.sqrt(cvv.map(x => x * x).sum)
    val nb = math.sqrt(v.map(x => x * x).sum)
    val cos = dot / (na * nb)
    assert(cos > 0.999, s"power iteration not aligned: cos=$cos")
    // eigenvalue estimate consistent with the Rayleigh quotient
    val lambda = out.head.getLong(2).toDouble / 1e9
    val rayleigh = dot / (nb * nb)
    assert(math.abs(lambda - rayleigh) / rayleigh < 0.05,
      s"lambda=$lambda vs rayleigh=$rayleigh")
    // the top direction must capture at least as much variance as any
    // single coordinate axis — else the iteration found a non-dominant
    // direction
    val maxDiag = (0 until d).map(i => c(i)(i)).max
    assert(rayleigh / (nb * nb) >= maxDiag * 0.999 / (nb * nb) ||
      rayleigh >= maxDiag * 0.999,
      s"rayleigh=$rayleigh < max axis variance $maxDiag")

    // sim_pca_project: per-label means must reassemble to the global
    // projection mean, mean(x)·v
    val projRows = SparkEntry.queries("sim_pca_project")(spark, dir)
      .collect()
    val totalN = projRows.map(_.getLong(1)).sum
    assert(totalN == vecs.length.toLong)
    val weighted = projRows.map(r => r.getLong(1) * r.getDouble(2)).sum
    val globalMean = (0 until d).map(i => mean(i) * v(i)).sum
    assert(math.abs(weighted / totalN - globalMean) < 1e-6,
      s"label means ${weighted / totalN} vs global ${globalMean}")
    // min <= mean <= max per label
    projRows.foreach { r =>
      assert(r.getDouble(3) <= r.getDouble(2) + 1e-9 &&
        r.getDouble(2) <= r.getDouble(4) + 1e-9)
    }
  }

}
