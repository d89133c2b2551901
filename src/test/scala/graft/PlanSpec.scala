package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audits: the scale properties the operators were
  * designed around, asserted on the executed plan so a regression in
  * plan shape (lost broadcast, un-pushed filter, reintroduced global
  * window, kryo buffer) fails CI rather than only showing up as a
  * 100x slowdown on a real cluster.
  */
class PlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("dimension joins broadcast: the fact side never shuffles (q02, q03)") {
    val p2 = plan("q02_top_brands_by_revenue")
    assert(p2.contains("BroadcastHashJoin"), p2.take(600))
    val p3 = plan("q03_region_order_rollup")
    // all three dims broadcast; no SortMergeJoin on the orders side
    assert(p3.contains("BroadcastHashJoin") && !p3.contains("SortMergeJoin"),
      p3.take(600))
  }

  test("filters and projections reach the parquet scan (q01)") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(900))
    // column pruning: the 16-column lineitem scan reads only what q01 uses
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_returnflag") &&
      !readSchema.contains("l_comment"), readSchema)
  }

  test("semi/anti joins stay semi/anti (q04, q05) — no row multiplication") {
    assert(plan("q04_semi_join_exists").contains("LeftSemi"))
    assert(plan("q05_anti_join_not_exists").contains("LeftAnti"))
  }

  test("batch planning has no single-partition global window (mig_batch_plan)") {
    val p = SparkEntry.queries("mig_batch_plan")(spark, dir)
      .queryExecution.optimizedPlan.toString
    // the two-pass prefix sum: the per-row running sum is partitioned by
    // chunk (windowspecdefinition's first argument), so the base table
    // never collapses into one window task; the only unpartitioned
    // window runs over the tiny per-chunk aggregate (the offsets pass)
    assert(p.contains("windowspecdefinition(chunk#"), p.take(1500))
    // base-table columns must not appear in an unpartitioned window:
    // every windowspecdefinition over row_bytes carries the chunk key
    val rowByteWindows = p.linesIterator
      .filter(l => l.contains("windowspecdefinition(") &&
        l.contains("row_bytes"))
      .toSeq
    assert(rowByteWindows.nonEmpty &&
      rowByteWindows.forall(_.contains("chunk#")), rowByteWindows.mkString("\n"))
  }

  test("top-k aggregate runs through ObjectHashAggregate, not kryo (q21)") {
    val p = plan("q21_topk_aggregate")
    assert(p.contains("ObjectHashAggregate"), p.take(800))
    assert(p.contains("partial_topk_pairs"), p.take(800)) // map-side partial
    assert(!p.toLowerCase.contains("kryo"))
  }

  test("embedding near-dup generates candidates from bucket joins, no n² cross join") {
    val p = plan("dd_embedding_neardup")
    // assignment is a narrow NearestCentroids projection (no product
    // at all); candidate pairing must be an equi-join on the centroid
    // bucket, and nothing may be a shuffled cartesian
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(p.contains("Join [cent_id") || p.contains("Join cent_id") ||
      p.contains("[cent_id"), p.take(800))
  }

  test("as-of custom operator declares its distribution (no degenerate exchange)") {
    val p = plan("q24_asof_custom_operator")
    assert(p.contains("AsOfJoin "), p.take(800)) // exec node (Exec suffix stripped)
    // both sides hash-partitioned on the join key, not single-partition
    assert(!p.contains("SinglePartition"), p.take(1200))
  }

  test("jdbc source scan pushes filters to the database") {
    // exercised via the raw reader (StorageSpec covers the e2e); here the
    // plan string must show the pushed predicate
    val url = "jdbc:derby:memory:graft_planspec;create=true"
    Tables(spark, dir, "region").write.mode("overwrite")
      .jdbc(url, "REGION_PLAN", new java.util.Properties)
    val df = spark.read.jdbc(url, "REGION_PLAN", new java.util.Properties)
      .filter(org.apache.spark.sql.functions.col("r_regionkey") > 1)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") &&
      p.contains("GreaterThan(r_regionkey,1)"), p.take(600))
  }

  test("corpus shuffle-sample is a top-k merge, not a global sort") {
    val p = plan("cp_corpus_shuffle")
    assert(p.contains("TakeOrderedAndProject"), p.take(600))
  }

  test("contamination screen joins on grams — no cartesian anywhere") {
    val p = plan("cp_contamination")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(800))
    assert(p.contains("LeftSemi"), p.take(800))
  }

  test("contamination matrix scans the train corpus ONCE for all benchmarks") {
    val df = SparkEntry.queries("cp_contamination_matrix")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    // exactly TWO shingle explodes in the whole plan — one over the
    // train corpus, one over the eval split — regardless of how many
    // benchmarks are in the battery (they ride the build side of a
    // single gram-keyed join, not one corpus pass per benchmark)
    val explodes = "Generate explode".r.findAllIn(p).length
    assert(explodes == 2, s"expected 2 shingle explodes, got $explodes\n" +
      p.take(1200))
    // grid/severity joins on tiny sides only; no cartesian over grams
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("PQ search joins codes against the broadcast lookup table — vectors never meet") {
    val p = plan("sim_pq_adc")
    // the code/LUT join must be an equi-join (m, code); no cartesian and
    // no shuffled join of the two vector-bearing sides
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("quality filter and chunk dedup are narrow until their one aggregation") {
    val pq = plan("cp_quality_filter")
    // per-document rule arithmetic: no join, no window, only the output sort
    assert(!pq.contains("Join") && !pq.contains("Window"), pq.take(800))
    val pc = plan("dd_chunk_exact")
    // chunk dedup is scan -> explode -> hash aggregate (with partial) -> sort
    assert(pc.contains("HashAggregate") && !pc.contains("Join"), pc.take(800))
  }

  test("count-min sketch is one ObjectHashAggregate pass — no row multiplication") {
    val p = plan("ev_user_cms")
    assert(p.contains("ObjectHashAggregate") && p.contains("count_min"),
      p.take(800))
    assert(p.contains("partial_count_min"), p.take(800)) // map-side partial
    assert(!p.contains("Generate"), p.take(800)) // no explode-by-depth
  }

  test("sequence packing windows only within chunks, like the batch planner") {
    val p = SparkEntry.queries("cp_sequence_pack")(spark, dir)
      .queryExecution.optimizedPlan.toString
    val tokenWindows = p.linesIterator
      .filter(l => l.contains("windowspecdefinition(") && l.contains("n_tokens"))
      .toSeq
    assert(tokenWindows.nonEmpty && tokenWindows.forall(_.contains("chunk#")),
      tokenWindows.mkString("\n"))
  }

  test("phash pairing candidates come from band buckets — no n² cross join") {
    val p = plan("mm_phash_pairs")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(800))
    // the candidate join is an equi-join on (band_idx, band_val)
    assert(p.contains("band_val"), p.take(800))
  }

  test("real PNG codec round-trip is a narrow per-partition map") {
    val p = plan("mm_decode_png")
    // scan -> mapPartitions (SerializeFromObject) -> output sort; no
    // join, no aggregation, no window — encode/decode never shuffles
    assert(!p.contains("Join") && !p.contains("HashAggregate") &&
      !p.contains("Window"), p.take(800))
    assert(p.contains("SerializeFromObject"), p.take(800))
  }

  test("no query hides an unpartitioned window (sweep — the check that " +
    "justifies silencing WindowExec's warning)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    // GraftRuntime.silenceKnownBenignWarnings drops the 'No Partition
    // Defined' log line for bench/verify tails, so THIS sweep is the
    // remaining signal: every registered query's optimized plan must
    // have no partition-less window, except the documented driver-scale
    // chunk-OFFSET windows of the two-pass prefix sums (the windowed
    // input there is one row per chunk, O(n/chunkRows)).
    val allowed = Set(
      "mig_batch_plan", // offsets pass — Migration.scala chunked prefix sum
      "mig_pipeline", // composes the same batch planner
      "cp_sequence_pack", // offsets pass — Corpus.scala sequence packing
      "cp_shard_manifest", // same offsets pass, bytes-into-files level
      // rank pass runs AFTER TakeOrderedAndProject cut the set to k=50
      // rows — the windowed input is the sample, never the corpus
      "cp_reservoir_sample",
      "cp_dedup_weighted_sample", // same shape over the weights frame
      // chunked two-pass quintile ranks: the partition-less windows run
      // over per-chunk COUNT tables (O(distinct metric buckets) rows,
      // bounded by the metric domain), never over the data table
      "ev_rfm", "cp_curriculum",
      // cumulative sums + lag over the TEN decile rows (the corpus
      // reduced to one row per decile by the first-occurrence
      // aggregate) — fixed-cardinality, never the data table
      "ta_heaps_law",
      // at-risk reverse-cumulative sum over the AGGREGATED life table
      // (one row per whole-day lifetime bucket — O(observation days),
      // tens of rows at any corpus size), never the raw events
      "ev_survival"
    )
    // excluded: constructing these DataFrames runs real side effects
    // (streaming micro-batches, Derby DDL, index build/persist, an
    // iterative driver loop) — their window shapes are covered by
    // their own dedicated specs/queries
    val excluded = Set("mig_pipeline_jdbc", "dd_components",
      "dd_minhash_clusters", // iterative star loop (dedicated spec above)
      "dd_simhash_clusters", // iterative star loop, same machinery
      "dd_cluster_representatives", // composes the minhash star loop
      "cp_leakage_safe_split", // same star loop keyed split
      "dd_pair_pagerank", // iterative power loop, windowless by shape
      "dd_semdedup_trained", // Lloyd-loop construction (collect side effects)
      "mig_format_roundtrip", // construction writes the format legs
      "mig_schema_evolution", "mig_partitioned_lake", // staging writes
      "sim_index_api", "sim_ivf_append", "sim_ivfpq_append",
      "sim_pq_index_api",
      "sim_ivfpq_index_api", "sim_ivfpq_trained", "sim_kmeans_ivf",
      "sim_knn_ivf")
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(n => n.startsWith("evs_") || excluded(n) || allowed(n))
      .flatMap { name =>
        val lp = SparkEntry.queries(name)(spark, dir)
          .queryExecution.optimizedPlan
        val bad = lp.collect {
          case w: LWindow if w.partitionSpec.isEmpty => w
        }
        if (bad.nonEmpty) Some(name) else None
      }
    assert(offenders.isEmpty,
      s"unpartitioned window in: ${offenders.mkString(", ")}")
  }

  test("gram/covariance moment pass is one aggregate — no per-row explode") {
    for (q <- Seq("sim_gram_matrix", "sim_covariance")) {
      val p = plan(q)
      // the single Generate unpacks the ONE aggregate result row into
      // 2080 cells; the corpus-side fan-out (explode below the
      // aggregate, 2080× the scan row count) must stay dead
      assert(p.contains("ObjectHashAggregate"), s"$q: ${p.take(600)}")
      val aggIdx = p.indexOf("ObjectHashAggregate")
      val genIdx = p.indexOf("Generate")
      assert(genIdx >= 0 && genIdx < aggIdx,
        s"$q: Generate must sit above the aggregate only\n${p.take(900)}")
      assert(p.indexOf("Generate", aggIdx) < 0,
        s"$q: explode below the moment aggregate reintroduces the " +
          s"2080x fan-out\n${p.take(900)}")
    }
  }

  test("real WAV codec round-trip is a narrow per-partition map") {
    val p = plan("mm_decode_wav")
    assert(!p.contains("Join") && !p.contains("HashAggregate") &&
      !p.contains("Window"), p.take(800))
    assert(p.contains("SerializeFromObject"), p.take(800))
  }

  test("real BMP codec round-trip is a narrow per-partition map") {
    val p = plan("mm_decode_bmp")
    assert(!p.contains("Join") && !p.contains("HashAggregate") &&
      !p.contains("Window"), p.take(800))
    assert(p.contains("SerializeFromObject"), p.take(800))
  }

  test("SemDeDup pairs only within clusters — equi-join on cent_id, no n² product") {
    val p = plan("dd_semdedup")
    // same contract as dd_embedding_neardup: assignment is a narrow
    // NearestCentroids projection; in-cluster pairing is an equi-join
    // on the cluster id
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(p.contains("[cent_id"), p.take(800))
  }

  test("centroid assignment plan width is constant in nlist — builds at " +
      "nlist=256 with one NearestCentroids expression, no column fan-out") {
    import org.apache.spark.sql.functions._
    // the per-centroid fan-out this replaced would emit 256 cosine
    // columns + greatest + a 256-arm CASE chain here (Janino territory);
    // the expression form keeps the plan O(1) wide at any nlist.
    // spark.range (not a local Seq) so the projection isn't
    // constant-folded into a LocalTableScan before we can inspect it.
    val dim = 8
    val corpus = spark.range(300).select(col("id"),
      transform(sequence(lit(0), lit(dim - 1)),
        d => ((col("id") * 31 + d * 7) % 13 + 1).cast("float")).as("vec"))
    val idx = similarity.IvfIndex.build(corpus, "id", "vec", 256)
    val p = idx.assignments.queryExecution.executedPlan.toString
    assert(!p.toLowerCase.contains("greatest"), p.take(500))
    assert(p.toLowerCase.contains("nearestcentroids"), p.take(500))
    assert(p.length < 20000, s"plan unexpectedly large: ${p.length} chars")
    assert(idx.assignments.count() == 300)
    assert(idx.assignments.select("cent_id").distinct().count() > 1)

    // the trained IVF-PQ build path (assignment + residual lookup +
    // probe explode) holds the same contract at a wide nlist
    val pq = similarity.IvfPqIndex.build(corpus, "id", "vec",
      nlist = 64, subspaces = 4, codeCount = 16, trainIters = 1)
    val res = pq.search(corpus.limit(5), "id", "vec", k = 3, nprobe = 4)
    val sp = res.queryExecution.executedPlan.toString
    assert(!sp.toLowerCase.contains("greatest"), sp.take(500))
    assert(res.count() == 15)
  }

  test("incremental dedup never pairs existing-existing docs") {
    val p = SparkEntry.queries("dd_incremental")(spark, dir)
      .queryExecution.optimizedPlan.toString
    // the incoming-side restriction must survive optimization: the pair
    // stream filters on pmod(doc_b, 2) = 1 before the intersection counts
    assert(p.contains("pmod(") && p.contains("2) = 1") &&
      !p.contains("CartesianProduct"), p.take(1200))
    // and the accepted postings must be semi-joined down to the batch's
    // shingle footprint before the bucket pass (the 100 TB contract)
    assert(p.contains("LeftSemi"), p.take(1200))
  }

  test("quality classifier is explode → one partial-aggregated shuffle") {
    val p = plan("ta_quality_classifier")
    // no join anywhere; the only exchange feeds the per-doc aggregate
    assert(!p.contains("Join"), p.take(800))
    assert(p.contains("HashAggregate"), p.take(800))
  }

  test("salted skew join shuffles on (event_type, salt), not the bare hot key") {
    val p = plan("q35_salted_skew_join")
    // the hint must stick (salting is a no-op under broadcast) and the
    // salt must be part of the join key
    assert(p.contains("ShuffledHashJoin"), p.take(900))
    assert(p.contains("salt"), p.take(900))
  }

  test("MAD outliers broadcast both stats passes — the facts never shuffle") {
    val p = plan("ev_anomaly_mad")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    // no shuffled join anywhere: the only exchanges feed the two tiny
    // per-type percentile aggregates and the broadcasts
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      p.take(800))
  }

  test("DSIR weight table is broadcast to the token stream") {
    val p = plan("cp_dsir_weights")
    // the per-token weight lookup must be a broadcast equi-join on the
    // bucket key (<= 4096 rows can never justify shuffling the tokens)
    assert(p.contains("BroadcastHashJoin") && p.contains("bucket"),
      p.take(1200))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("PII redaction is one narrow projection — no shuffle at all") {
    val p = plan("ta_pii_redact")
    assert(!p.contains("Join") && !p.contains("HashAggregate") &&
      !p.contains("Window"), p.take(800))
  }

  test("Misra-Gries summary is one ObjectHashAggregate pass with " +
      "map-side partials") {
    val p = plan("ta_heavy_hitters_mg")
    assert(p.contains("ObjectHashAggregate"), p.take(900))
    assert(p.contains("partial_misra_gries"), p.take(900))
    assert(!p.toLowerCase.contains("kryo"))
  }

  test("reservoir sample is TakeOrdered over a narrow projection — " +
      "never a global sort of the corpus") {
    val p = plan("cp_reservoir_sample")
    assert(p.contains("TakeOrderedAndProject"), p.take(900))
    // the only Sort allowed is inside the post-limit k-row rank stage;
    // the corpus-side scan must feed TakeOrdered directly
    val beforeTake = p.substring(p.indexOf("TakeOrderedAndProject"))
    assert(!beforeTake.contains("Exchange rangepartitioning"), p.take(1200))
  }

  test("minhash cluster pairs come from band buckets — no n² cross join") {
    // the query's own final plan is lineage-truncated by the star
    // loop's localCheckpoint, so the audit targets the pair pipeline
    // it consumes (the same staged API, same parameters)
    val docs = Tables(spark, dir, "documents")
    val pairs = graft.dedup.MinHashDedup.verifiedPairs(docs,
      graft.dedup.MinHashDedup.candidatePairs(
        graft.dedup.MinHashDedup.signatures(docs, "doc_id", "text")),
      "doc_id", "text", 0.5)
    val p = pairs.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(900))
    assert(p.contains("band"), p.take(900)) // candidate join keyed on bands
  }

  test("true BPE count is a narrow per-partition map — no shuffle") {
    val p = plan("ta_bpe_true_count")
    assert(p.contains("SerializeFromObject"), p.take(800)) // typed mapPartitions
    assert(!p.contains("Join") && !p.contains("HashAggregate"), p.take(800))
  }

  test("real JPEG codec round-trip is a narrow per-partition map") {
    val p = plan("mm_decode_jpeg")
    assert(!p.contains("Join") && !p.contains("HashAggregate"), p.take(800))
    assert(p.contains("SerializeFromObject"), p.take(800))
  }

  test("bucketed join consumes both scans in place — no exchange " +
    "below the merge join (mig_bucketed_join)") {
    // staging is memoized per (JVM, fixture) — no cleanup; the
    // shutdown hook owns the staged dir
    val joined = queries.Migration.stageBucketedJoin(spark, dir)
    val p = joined.queryExecution.executedPlan.toString
    val joinIdx = p.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, p.take(900))
    // depth-first print: everything after the join line is its subtree.
    // An in-partition Sort is allowed (Spark 3+ stopped propagating
    // per-bucket sort order from bucketed scans); the shuffle is not.
    val below = p.substring(joinIdx)
    assert(!below.contains("Exchange"), below.take(900))
    assert(below.contains("Bucketed: true"), below.take(900))
    assert(below.contains("SelectedBucketsCount: 8 out of 8"),
      below.take(900))
  }

  test("sharded day bitmap: one user_id shuffle, no window or sort over " +
    "the corpus (ev_day_bitmap_sharded)") {
    val p = plan("ev_day_bitmap_sharded")
    // the per-user masks come from ONE partial-aggregated shuffle; the
    // streak fold runs on the histogram relation only
    assert(p.contains("hashpartitioning(user_id"), p.take(900))
    assert(!p.contains("Window"), p.take(900))
    assert(!p.contains("SortMergeJoin"), p.take(900))
  }

  test("sequence pattern: every window partitions by user, the regex " +
    "scan runs on session-grouped strings (ev_sequence_pattern)") {
    val p = plan("ev_sequence_pattern")
    // sessionize windows must never collapse to a single partition
    assert(!p.contains("Window [") ||
      p.contains("windowspecdefinition(user_id"), p.take(900))
    assert(p.contains("hashpartitioning(user_id"), p.take(900))
    assert(!p.contains("CartesianProduct"), p.take(900))
  }

  test("substring spans: gram-keyed shuffles only, per-doc run window, " +
    "no pair term (dd_substring_spans)") {
    val p = plan("dd_substring_spans")
    // the run extension partitions by doc — never a global window
    assert(p.contains("windowspecdefinition(doc_id"), p.take(900))
    // no doc-pair join anywhere: the dup filter joins back on the gram
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(900))
    // grams shuffle on the 32-byte md5, not the raw token strings
    assert(p.contains("hashpartitioning(g#"), p.take(900))
  }

  test("contamination spans: train side reaches the test side as a " +
    "semi join, windows partition by doc (cp_contamination_spans)") {
    val p = plan("cp_contamination_spans")
    // the positional test grams are SEMI-joined against the distinct
    // train gram set — never an inner join that could fan out on a
    // hot boilerplate gram
    assert(p.contains("LeftSemi"), p.take(900))
    assert(p.contains("windowspecdefinition(doc_id"), p.take(900))
    assert(!p.contains("CartesianProduct"), p.take(900))
  }

  test("multi-pattern sequence scan: one sessionize pass feeds every " +
    "pattern — a single user-keyed exchange (ev_sequence_pattern_multi)") {
    val df = SparkEntry.queries("ev_sequence_pattern_multi")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    // the N regex evaluations ride ONE session-string build: exactly
    // one user_id hash exchange in the whole plan (sessionize), plus
    // the tiny cohort rollup — a per-pattern cascade would repeat it
    val userExchanges = p.linesIterator
      .count(l => l.contains("hashpartitioning(user_id"))
    assert(userExchanges == 1, s"user_id exchanges: $userExchanges\n${p.take(900)}")
    assert(!p.contains("CartesianProduct"), p.take(900))
  }

  test("sharded source overlap: dim joins broadcast, gram masks are one " +
    "partial-aggregated shuffle (ta_source_overlap_sharded)") {
    val p = plan("ta_source_overlap_sharded")
    assert(p.contains("BroadcastHashJoin"), p.take(900)) // srcs dim
    assert(!p.contains("SortMergeJoin"), p.take(900))
    // the pairwise sums run on histogram × pair-dim, never on the
    // corpus: the only nested-loop join is against the tiny pair dim
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(900))
  }

  test("profile's distinct pass hash-aggregates — no data-column sort anywhere") {
    val p = plan("mig_profile")
    // the measured trap: sharing one aggregate between the
    // immutable-buffer string min/max and the multi-distinct Expand
    // demotes the whole pass to SortAggregate over a 7-key sort of 6n
    // rows (4.0 s vs 1.6 s at sf0.1). The split form's only Sort is
    // the final ORDER BY col_name.
    assert(p.contains("Expand") && p.contains("HashAggregate"), p.take(900))
    assert(!p.linesIterator.exists(l =>
        l.contains("Sort [o_") || l.contains("Sort [knownfloatingpoint")),
      "a Sort over data columns reappeared under the profile aggregate:\n" +
        p.take(1200))
  }

  test("data-diff drills only dirty buckets — broadcast joins gate the row diff") {
    val p = plan("mig_data_diff")
    // the row-level FullOuter join must sit above broadcast semi-scans
    // of the dirty-bucket list; the clean-bucket total is a broadcast
    // anti join of the 256-row summary, never a second row-level pass
    assert(p.contains("FullOuter"), p.take(900))
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2, p.take(900))
    assert(p.contains("LeftAnti"), p.take(900))
    assert(!p.contains("CartesianProduct"), p.take(900))
  }

  test("int8 rerank: corpus scored via broadcast queries, exact stage join-bounded") {
    val p = plan("sim_rerank_int8")
    // stage 1: corpus never shuffles — queries broadcast into a
    // nested-loop product, candidates bounded by the ObjectHashAggregate
    // top-k; stage 2: candidate list and query vectors broadcast back
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(900))
    assert(p.contains("ObjectHashAggregate"), p.take(900))
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2, p.take(900))
    assert(!p.contains("SortMergeJoin"), p.take(900))
  }

  test("gap fill: every window partitions by user — no partition-less " +
    "window, and the gauge aggregates before the spine join") {
    val p = plan("ev_gap_fill")
    // the forward-fill window must carry a partition spec; a global
    // window here would serialize the whole spine through one task.
    // Concrete shape (not a vacuous fallback): the plan HAS window
    // specs, and every one of them partitions on user_id.
    val winLines = p.linesIterator
      .filter(_.contains("windowspecdefinition(")).toSeq
    assert(winLines.nonEmpty, p.take(900))
    assert(winLines.forall(_.contains("user_id")), winLines.mkString("\n"))
    // hourly gauge: a partial aggregate runs before the exchange, so
    // the shuffle carries (user, hr) gauges, not raw events
    assert(p.contains("partial_"), p.take(900))
  }

  test("pca project: the projection is a per-row fold — no Generate " +
    "node explodes vectors, and the only shuffle keys on label") {
    val p = plan("sim_pca_project")
    // the Gramian lesson: a d-wide explode multiplies executor row
    // throughput by 64; the zip_with/aggregate fold must stay inside
    // the row
    assert(!p.contains("Generate"), p.take(900))
    assert("hashpartitioning\\(label".r.findFirstIn(p).isDefined,
      p.take(900))
  }

  test("seasonal decompose: series-sized after the first aggregate — " +
    "the event scan feeds one partial-aggregated exchange") {
    val p = plan("ev_seasonal_decompose")
    // count-by-(type,hour) must combine map-side: partial_count before
    // the first exchange
    assert(p.contains("partial_count"), p.take(900))
    // the ±12 trend window partitions by event_type, never globally
    assert(p.linesIterator.filter(_.contains("windowspecdefinition"))
      .forall(l => l.contains("event_type")), p.take(900))
  }

  test("shard manifest: running bytes window is chunk-partitioned — " +
    "no corpus-sized single-partition window") {
    val p = SparkEntry.queries("cp_shard_manifest")(spark, dir)
      .queryExecution.optimizedPlan.toString
    // every window over the per-doc byte column carries the chunk key;
    // the only unpartitioned window is the tiny per-chunk offsets pass
    val nbWindows = p.linesIterator
      .filter(l => l.contains("windowspecdefinition(") && l.contains("nb#"))
      .toSeq
    assert(nbWindows.nonEmpty && nbWindows.forall(_.contains("chunk#")),
      nbWindows.mkString("\n"))
  }

  test("bpe train iteration: pair counts combine map-side, the argmax " +
    "is a TakeOrdered — never a global sort or a collect of the table") {
    import org.apache.spark.sql.functions._
    val state = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(
        regexp_extract_all(col("text"), lit("[A-Za-z]+"), lit(0))).as("s"))
      .groupBy(col("s")).agg(count(lit(1)).as("f"))
    val winner = graft.queries.TextAnalysis.pairCounts(state)
      .orderBy(col("c").desc, col("pr").asc).limit(1)
    val p = winner.queryExecution.executedPlan.toString
    // the pair explosion's weighted sum must partially aggregate
    // before its exchange — per-iteration shuffle mass is bounded by
    // DISTINCT pairs per partition, not pair occurrences
    assert(p.contains("partial_sum"), p.take(1200))
    // limit(1) over the ordering = TakeOrderedAndProject: each
    // partition surfaces one candidate, no global Sort materializes
    assert(p.contains("TakeOrderedAndProject"), p.take(1200))
    assert(!p.linesIterator.exists(l =>
      l.trim.startsWith("+- Sort") || l.trim.startsWith("Sort")), p.take(1200))
  }

  test("bloom gate: the prescreen is a codegen literal predicate on the " +
    "scan side — no join, no exchange, before the exact confirm") {
    val p = plan("cp_bloom_gate")
    // the bloom probe must appear as a filter expression (the literal
    // rides the plan), and the only join machinery is the eval-sized
    // broadcast confirm — never a shuffle join keyed on the gram mass
    assert(p.contains("might_contain"), p.take(2000))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoop"),
      p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("mmr rerank: bounded top-k candidate aggregate + one typed group " +
    "stage — the corpus never sort-merge joins") {
    val p = plan("sim_mmr_rerank")
    // candidate generation: broadcast queries, map-side k-lists
    assert(p.contains("ObjectHashAggregate"), p.take(2000))
    assert(p.contains("BroadcastNestedLoop") || p.contains("BroadcastHashJoin"),
      p.take(2000))
    // the greedy chain is exactly one typed group stage over the pool
    assert(p.contains("MapGroups") || p.contains("FlatMapGroups"),
      p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      p.take(2000))
  }

  test("class tfidf + label noise + modality agreement: aggregates " +
    "combine map-side, no cartesian anywhere") {
    Seq("ta_class_tfidf", "sim_label_noise", "dd_modality_agreement")
      .foreach { q =>
        val p = plan(q)
        assert(p.contains("partial_count") || p.contains("partial_sum"),
          s"$q lost map-side combine:\n" + p.take(1200))
        assert(!p.contains("CartesianProduct"),
          s"$q grew a cartesian:\n" + p.take(1200))
      }
  }

  test("dupgram fraction: gram mass shuffles once into the (gram, doc) " +
    "pre-aggregation — map-side combine present, no gram-keyed join") {
    val p = plan("dd_dupgram_fraction")
    assert(p.contains("partial_count"), p.take(1500))
    // the occupancy test is a window over the reduced rows, not a
    // join back onto the gram pipeline (exactly one Generate = one
    // gram enumeration)
    val generates = p.linesIterator.count(_.contains("Generate explode"))
    assert(generates == 1, s"gram pipeline ran $generates times:\n" +
      p.take(1500))
    assert(!p.contains("SortMergeJoin"), p.take(1500))
  }

}
