package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.Locale

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured scaling curve — the evidence behind every "scales to
  * 100 TB" claim in SCALING.md.
  *
  * Runs a curated set of the suite's costliest queries at FOUR scale
  * points — the driver's sf0.001 / sf0.01 / sf0.1 fixtures plus a
  * derived "sf1" (10× sf0.1, built once by [[ScaleData]] under
  * `target/scale/sf1`) — and reports per-query medians, decade-over-
  * decade growth ratios, and the fitted log-log slope over the last
  * two decades. A slope near 1.0 is linear scaling; near 2.0 is
  * quadratic (a pair-explosion or unbucketed join that 100 TB would
  * not survive).
  *
  * Fixed per-query session overhead (~0.1-0.3 s: plan analysis,
  * codegen, task dispatch at local[32]) dominates the small points, so
  * the sf0.1 → sf1 ratio carries most of the signal; the fitted slope
  * uses sf0.01 → sf1 (two decades) to damp it.
  *
  * Usage: `runMain graft.ScaleCurve [queryName ...]`
  * (no args = the default top-cost set). Output: one JSON line on
  * stdout + a markdown table at `target/scale/SCALE_CURVE.md`.
  */
object ScaleCurve {

  /** The suite's costliest queries per BENCH_DETAIL.json, covering
    * every heavy family: fuzzy dedup (LSH / SimHash / prefix-filter /
    * embedding), iterative graph (components, PageRank), dense linear
    * algebra (Gramian, covariance), ANN (brute & IVF), text (BM25,
    * BPE, PMI), events (RFM, sessionize, funnel), relational
    * (pricing summary, salted top-k), multimodal (pHash pairs), and —
    * since round 12 — the streaming tier's five heaviest (CDC merge
    * state, incremental-dedup ingest, session windows, stream-stream
    * join, windowed top-k): their small-SF cost is mostly micro-batch
    * machinery, so the slope readout is what separates "fixed cost
    * amortizes away" from "state machinery grows super-linearly".
    */
  val defaultQueries: Seq[String] = Seq(
    "dd_exact", "dd_minhash_lsh", "dd_minhash_clusters",
    "dd_simhash_clusters", "dd_prefix_jaccard", "dd_embedding_neardup",
    "dd_components", "dd_pair_pagerank", "cp_leakage_safe_split",
    "sim_gram_matrix", "sim_covariance", "sim_knn_brute",
    "sim_kmeans_ivf", "ta_bm25", "ta_bpe_true_count", "ta_pmi_bigrams",
    "ev_rfm", "ev_sessionize", "ev_funnel", "q01_pricing_summary",
    "q22_word_topk_salted", "mm_phash_pairs",
    // round-10 batch additions with non-trivial plans
    "mig_data_diff", "mig_profile", "dd_edit_distance",
    "sim_rerank_int8", "ev_pit_features",
    // round-10 late additions: spine-explode fill (output ∝ users ×
    // span hours), moment-collect PCA, dense-series decomposition
    "ev_gap_fill", "sim_pca_power", "ev_seasonal_decompose",
    // round-12: the streaming tier's cost drivers (r10/r11 verdict
    // item — the tier previously had no measured curve)
    "evs_cdc_apply", "evs_incremental_ingest", "evs_session_windows",
    "evs_stream_stream_join", "evs_windowed_topk",
    // round-15: the compressed-sketch tier and the two sharded-mask
    // operators (histogram/sparse-pair-event read-outs — the curves
    // prove the corpus-shuffle-then-tiny-relation claims)
    "dd_bbit_minhash", "ev_day_bitmap_sharded", "ta_source_overlap_sharded",
    "ev_sequence_pattern",
    // round-16: exact substring-span dedup (two gram-keyed corpus
    // shuffles + one per-doc window — the curve checks no hidden
    // pair-mass term)
    "dd_substring_spans", "dd_substring_trim",
    "cp_contamination_spans", "ev_sequence_pattern_multi",
    "dd_source_mirror", "cp_contamination_fuzzy",
    // round-17: BPE-granularity substring dedup (~5x the gram mass of
    // the word variant), the pre-aggregated mirror escalation — the
    // boiler variant runs it at 10x-corpus boilerplate density, where
    // the enumerating form's occupant cap would abort — and the two
    // new stream-path operators (live compaction; ingest-time
    // decontamination gate)
    "dd_substring_spans_bpe", "dd_source_mirror_agg",
    "dd_source_mirror_boiler", "evs_ingest_compacted",
    "cp_contamination_stream",
    // round-17: BPE vocabulary induction — one corpus shuffle to word
    // frequencies, then vocab-sized iterations; the curve checks the
    // per-iteration cost tracks VOCAB growth (distinct words), which
    // plateaus, not corpus growth; the apply half adds one codegen'd
    // corpus pass on top
    "ta_bpe_train", "ta_bpe_learned_compression")

  private def js(v: Double): String =
    String.format(Locale.ROOT, "%.3f", Double.box(v))

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted; val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftRuntime.silenceKnownBenignWarnings()

    val sf1Dir = ScaleData.ensure(spark)
    val points = Seq(
      "sf0.001" -> "/root/testdata/sf0.001",
      "sf0.01" -> "/root/testdata/sf0.01",
      "sf0.1" -> "/root/testdata/sf0.1",
      "sf1*" -> sf1Dir)

    val names = (if (args.nonEmpty) args.toSeq else defaultQueries)
      .filter(SparkEntry.queries.contains)
    val fns = names.map(n => n -> SparkEntry.queries(n))

    Tables(spark, points.head._2, "lineitem").count() // session warmup

    // query-major: all scale points of one query back-to-back, so the
    // per-query slope is measured under the same JIT/GC regime.
    val rows = fns.map { case (name, fn) =>
      val pts = points.map { case (_, dir) =>
        var rowsOut = 0L
        val ts = (0 until reps).map { _ =>
          val t0 = System.nanoTime()
          rowsOut = fn(spark, dir).count()
          (System.nanoTime() - t0) / 1e9
        }
        // drop this point's session caches (shared shingle/pair sets)
        // before the next point: carrying four dirs' pinned caches in
        // one heap measures GC pressure, not the operator (first curve
        // run: dd_minhash_lsh 53.7 s at sf1* under accumulated caches
        // vs 13.9 s self-contained). Timings are therefore COLD per
        // (query, point) on rep 1 and warm-cache on reps 2..n; the
        // median reflects warm, like the alphabetical bench.
        SessionCache.invalidate(spark)
        (median(ts), rowsOut)
      }
      val meds = pts.map(_._1)
      val Seq(t0001, t001, t01, t1) = meds
      // fitted log-log slope over sf0.01 → sf1 (two decades, 100× data)
      val slope = math.log(t1 / t001) / math.log(100.0)
      System.err.println(f"[scale] $name%-24s ${meds.map(js).mkString(" ")}  rows=${pts.map(_._2).mkString("/")}  slope=${js(slope)}")
      (name, pts, slope)
    }

    val md = new StringBuilder
    md ++= "| Query | sf0.001 | sf0.01 | sf0.1 | sf1* | 10× ratio (0.01→0.1) | 10× ratio (0.1→1) | slope (0.01→1) | rows out (0.001/0.01/0.1/1) |\n"
    md ++= "|---|---|---|---|---|---|---|---|---|\n"
    rows.foreach { case (n, pts, s) =>
      val Seq(a, b, c, d) = pts.map(_._1)
      md ++= s"| `$n` | ${js(a)} | ${js(b)} | ${js(c)} | ${js(d)} | ${js(c / b)}× | ${js(d / c)}× | ${js(s)} | ${pts.map(_._2).mkString(" / ")} |\n"
    }
    Files.createDirectories(Paths.get("target/scale"))
    Files.write(Paths.get("target/scale/SCALE_CURVE.md"),
      md.toString.getBytes(StandardCharsets.UTF_8))

    val json = rows.map { case (n, pts, s) =>
      s""""$n":{"sec":[${pts.map(p => js(p._1)).mkString(",")}],"rows":[${pts.map(_._2).mkString(",")}],"slope":${js(s)}}"""
    }.mkString("{\"metric\":\"scale_curve\",\"unit\":\"sec\",\"points\":[\"sf0.001\",\"sf0.01\",\"sf0.1\",\"sf1*\"],\"queries\":{", ",", "}}")
    println(json)
    spark.stop()
  }
}
