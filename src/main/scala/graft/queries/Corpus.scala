package graft.queries

import graft.{QueryDef, Quant, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Corpus-preparation operators for a training-data pipeline: the
  * deterministic bookkeeping that sits between dedup/quality filtering
  * and the training job — stable train/validation/test splitting,
  * per-source weighted mixing, repeated-n-gram quality scoring (the
  * Gopher-style repetition rule), and a deterministic global shuffle.
  *
  * None of these exist in the reference (a row-migration tool); they
  * are the extension surface the engine adds for 100 TB corpus work.
  *
  * Scale notes: every operator keys on a cryptographic hash of the
  * document id, so results are independent of partitioning, input
  * order, and cluster size — re-running the split on a re-ingested
  * corpus reassigns every doc to the same bucket. The hash bucketing
  * is a narrow projection (no shuffle); only the final per-source
  * aggregations shuffle, carrying one row per group. The shuffle-
  * sample is a global sort limit, which Spark executes as
  * per-partition top-k + single merge (TakeOrderedAndProject), not a
  * full sort.
  */
object Corpus {

  /** First 6 md5 hex digits of a salted doc id as an integer bucket —
    * identical arithmetic on both engines (Spark conv(hex,16,10),
    * DuckDB CAST('0x'||hex AS BIGINT)).
    */
  private def hashBucket(salt: String, mod: Int): Column =
    graft.corpus.CorpusPipeline.hashBucket("doc_id", salt, mod)

  private def bucketSql(salt: String, mod: Int): String =
    s"CAST(('0x' || substring(md5('$salt' || CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % $mod"

  /** Stable train/validation/test assignment: 80/10/10 by hash bucket.
    * A document's split never depends on what else is in the corpus —
    * the property that keeps eval sets honest across re-crawls.
    */
  private def hashSplit(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "documents")
      .withColumn("bucket", hashBucket("split:", 100))
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "validation")
          .otherwise("test"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
      .orderBy(col("source"), col("split"))
  }

  private val hashSplitSql =
    s"""SELECT source,
       |  CASE WHEN ${bucketSql("split:", 100)} < 80 THEN 'train'
       |       WHEN ${bucketSql("split:", 100)} < 90 THEN 'validation'
       |       ELSE 'test' END AS split,
       |  count(*) AS n_docs, min(doc_id) AS first_doc
       |FROM documents GROUP BY 1, 2 ORDER BY source, split""".stripMargin

  /** Per-source weighted sampling for a training mix: each source
    * keeps a deterministic fraction of its documents (here by source
    * index mod 3: 100% / 50% / 25%, standing in for per-source mix
    * weights). The decision is per-document hash thresholding — no
    * sort, no sampling state, reproducible on any cluster layout.
    */
  private def sourceMix(s: SparkSession, dir: String): DataFrame = {
    val rate = when(substring(col("source"), 4, 10).cast("int") % 3 === 0, 1000)
      .when(substring(col("source"), 4, 10).cast("int") % 3 === 1, 500)
      .otherwise(250)
    Tables(s, dir, "documents")
      .withColumn("rate_permille", rate)
      .withColumn("sampled", hashBucket("mix:", 1000) < col("rate_permille"))
      .groupBy(col("source"))
      .agg(max(col("rate_permille")).as("rate_permille"),
        count(lit(1)).as("n_total"),
        sum(when(col("sampled"), 1L).otherwise(0L)).as("n_sampled"))
      .orderBy(col("source"))
  }

  private val sourceMixSql =
    s"""SELECT source,
       |  max(CASE CAST(substring(source, 4, 10) AS INTEGER) % 3
       |      WHEN 0 THEN 1000 WHEN 1 THEN 500 ELSE 250 END) AS rate_permille,
       |  count(*) AS n_total,
       |  CAST(sum(CASE WHEN ${bucketSql("mix:", 1000)} <
       |    (CASE CAST(substring(source, 4, 10) AS INTEGER) % 3
       |     WHEN 0 THEN 1000 WHEN 1 THEN 500 ELSE 250 END)
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
       |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** Source-mix entropy per split — the diversity diagnostic a mixing
    * step is tuned against (a collapsed split shows up as entropy near
    * 0, a uniform mix as ln(n_sources)): per split, the Shannon
    * entropy of its source distribution. Per-source probabilities are
    * exact int/int doubles; each p·ln(p) term rounds to 9 and
    * accumulates as DECIMAL(12,9) (the ta_jsd_drift transcendental
    * convention — order-independent, engine-exact). Two tiny
    * aggregates: (split, source) counts, then one row per split.
    */
  private def mixEntropy(s: SparkSession, dir: String): DataFrame = {
    val split = when(hashBucket("split:", 100) < 80, "train")
      .when(hashBucket("split:", 100) < 90, "validation")
      .otherwise("test")
    val bySrc = Tables(s, dir, "documents")
      .withColumn("split", split)
      .groupBy(col("split"), col("source"))
      .agg(count(lit(1)).as("n"))
    val totals = bySrc.groupBy(col("split"))
      .agg(sum(col("n")).as("n_docs"))
    bySrc.join(totals, "split")
      .withColumn("p", col("n").cast("double") / col("n_docs"))
      .withColumn("term",
        round(col("p") * log(col("p")), 9).cast(DecimalType(12, 9)))
      .groupBy(col("split"))
      .agg(max(col("n_docs")).as("n_docs"),
        count(lit(1)).as("n_sources"),
        round(-sum(col("term")).cast("double"), 9).as("entropy"))
      .orderBy(col("split"))
  }

  private val mixEntropySql =
    s"""WITH by_src AS (
       |  SELECT CASE WHEN ${bucketSql("split:", 100)} < 80 THEN 'train'
       |              WHEN ${bucketSql("split:", 100)} < 90 THEN 'validation'
       |              ELSE 'test' END AS split,
       |    source, count(*) AS n
       |  FROM documents GROUP BY 1, 2),
       |totals AS (
       |  SELECT split, CAST(sum(n) AS BIGINT) AS n_docs
       |  FROM by_src GROUP BY split)
       |SELECT split, max(n_docs) AS n_docs, count(*) AS n_sources,
       |  round(-CAST(sum(CAST(round(
       |    (CAST(n AS DOUBLE) / n_docs) * ln(CAST(n AS DOUBLE) / n_docs),
       |    9) AS DECIMAL(12,9))) AS DOUBLE), 9) AS entropy
       |FROM by_src JOIN totals USING (split)
       |GROUP BY split ORDER BY split""".stripMargin

  /** Config-DECLARED curation — `corpus.PipelineConfig`: the same
    * staged pipeline as `cp_curation_pipeline`, but the stage order
    * and thresholds come from a TOML document (the reference's
    * config.toml posture: minimal grammar, unknown sections / stages /
    * keys are hard errors). The parameters here deliberately differ
    * from every library default (0.3/0.4 thresholds, 70/15 split,
    * custom salt), and the oracle hard-codes exactly these values — so
    * the gate proves the config actually FLOWS through to the
    * transforms rather than defaults passing by coincidence.
    */
  private def pipelineFromConfig(s: SparkSession, dir: String): DataFrame = {
    val toml =
      """[pipeline]
        |stages = "quality_filter, dedup_exact, split"
        |
        |[quality_filter]
        |max_repeated_5gram_ratio = "0.3"
        |min_distinct_word_ratio = "0.4"
        |
        |[split]
        |train_pct = "70"
        |validation_pct = "15"
        |salt = "cfg:"
        |""".stripMargin
    val cfg = graft.corpus.PipelineConfig.fromToml(toml)
      .fold(err => throw new IllegalArgumentException(err), identity)
    graft.corpus.CorpusPipeline.splitStats(
      cfg.run(Tables(s, dir, "documents"), "doc_id", "text"),
      "doc_id", "n_chars")
  }

  private val pipelineFromConfigSql =
    s"""WITH kept AS (
       |  SELECT doc_id, text, n_chars FROM (
       |    SELECT doc_id, text, n_chars,
       |      greatest(len(ws) - 4, 0) AS total5,
       |      CASE WHEN len(ws) >= 5 THEN len(list_distinct(
       |        list_transform(range(1, len(ws) - 3),
       |          i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' '
       |            || ws[i+3] || ' ' || ws[i+4]))) ELSE 0 END AS dist5,
       |      len(ws) AS nw, len(list_distinct(ws)) AS ndw
       |    FROM (SELECT doc_id, text, n_chars,
       |            string_split(text, ' ') AS ws FROM documents))
       |  WHERE total5 > 0
       |    AND 1.0 - CAST(dist5 AS DOUBLE) / total5 <= 0.3
       |    AND CAST(ndw AS DOUBLE) / nw >= 0.4),
       |survivors AS (
       |  SELECT min(doc_id) AS doc_id, min(n_chars) AS n_chars
       |  FROM kept GROUP BY text)
       |SELECT CASE WHEN ${bucketSql("cfg:", 100)} < 70 THEN 'train'
       |            WHEN ${bucketSql("cfg:", 100)} < 85 THEN 'validation'
       |            ELSE 'test' END AS split,
       |  count(*) AS n_docs,
       |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
       |  min(doc_id) AS first_doc
       |FROM survivors GROUP BY 1 ORDER BY split""".stripMargin

  /** Weighted reservoir sample WITHOUT replacement (Efraimidis &
    * Spirtes A-ES): each doc draws u ∈ (0,1] from a seeded hash and
    * keys on ln(u)/w with w = n_chars (longer docs proportionally
    * likelier); the top-k keys are exactly a weighted sample without
    * replacement. One narrow projection + TakeOrderedAndProject
    * (per-partition top-k, single merge — never a full sort), the
    * right shape for "sample 10k docs from 100 TB by quality weight"
    * in one pass with zero sampling state.
    *
    * Exactness: u = (bucket + 1) / 2^24 is an EXACT double (24-bit
    * numerator over a power of two), so both engines feed identical
    * doubles to ln; ln itself can drift 1 ulp across libm/StrictMath,
    * so the key is rounded to 9 decimals on both sides and ranks
    * tie-break on doc_id (the transcendental-function contract).
    */
  private def reservoirSample(s: SparkSession, dir: String): DataFrame = {
    val k = 50
    val u = (hashBucket("res:", 1 << 24).cast("double") + 1.0) /
      (1 << 24).toDouble
    val key = round(log(u) / col("n_chars"), 9)
    val top = Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars").as("w"),
        key.as("key_r"))
      .orderBy(col("key_r").desc, col("doc_id"))
      .limit(k)
    top.withColumn("rnk", row_number().over(
        Window.orderBy(col("key_r").desc, col("doc_id"))))
      .select(col("rnk"), col("doc_id"), col("source"), col("w"),
        col("key_r"))
      .orderBy(col("rnk"))
  }

  private val reservoirSampleSql =
    s"""WITH r AS (
       |  SELECT doc_id, source, n_chars AS w,
       |    round(ln((${bucketSql("res:", 1 << 24)} + 1) / 16777216.0)
       |      / n_chars, 9) AS key_r
       |  FROM documents)
       |SELECT rnk, doc_id, source, w, key_r FROM (
       |  SELECT r.*, row_number() OVER (ORDER BY key_r DESC, doc_id) AS rnk
       |  FROM r)
       |WHERE rnk <= 50 ORDER BY rnk""".stripMargin

  /** DEDUP-WEIGHTED sampling — the closure of the dedup-with-counts
    * story: `dd_cluster_weights` collapses each near-dup family onto
    * its min-id representative carrying `weight = cluster_size`, and
    * THIS operator performs the draw those weights exist for — an
    * Efraimidis-Spirtes weighted sample WITHOUT replacement over the
    * representatives, so a document's sampling probability is
    * proportional to how often its family appeared in the wild, while
    * the sample itself contains no duplicates. The standard
    * alternative to hard-dropping duplicate mass when that mass is
    * itself signal.
    *
    * Scale shape: the weights frame is the cluster-weights machinery
    * (minhash pair graph + CC endgame, corpus touched once); the draw
    * is the reservoirSample shape — one narrow projection +
    * TakeOrderedAndProject (per-partition top-k, single merge, never
    * a full sort). Exactness: u is an exact 24-bit dyadic double, the
    * transcendental key rounds to 9 decimals on both sides, ranks
    * tie-break on doc_id.
    */
  private def dedupWeightedSample(s: SparkSession, dir: String): DataFrame = {
    val k = 50
    val u = (hashBucket("ddw:", 1 << 24).cast("double") + 1.0) /
      (1 << 24).toDouble
    val key = round(log(u) / col("weight"), 9)
    val reps = Dedup.clusterWeights(s, dir)
      .filter(col("weight") >= 1) // duplicates carry 0 — never drawn
      .select(col("doc_id"), col("cluster"), col("weight"))
    val top = reps
      .select(col("doc_id"), col("cluster"), col("weight"), key.as("key_r"))
      .orderBy(col("key_r").desc, col("doc_id"))
      .limit(k)
    top.withColumn("rnk", row_number().over(
        Window.orderBy(col("key_r").desc, col("doc_id"))))
      .select(col("rnk"), col("doc_id"), col("cluster"), col("weight"),
        col("key_r"))
      .orderBy(col("rnk"))
  }

  private lazy val dedupWeightedSampleSql =
    s"""WITH wts AS (${Dedup.clusterWeightsSql}),
       |keyed AS (
       |  SELECT doc_id, cluster, weight,
       |    round(ln((${bucketSql("ddw:", 1 << 24)} + 1) / 16777216.0)
       |      / weight, 9) AS key_r
       |  FROM wts WHERE weight >= 1)
       |SELECT rnk, doc_id, cluster, weight, key_r FROM (
       |  SELECT keyed.*, row_number()
       |    OVER (ORDER BY key_r DESC, doc_id) AS rnk
       |  FROM keyed)
       |WHERE rnk <= 50 ORDER BY rnk""".stripMargin

  /** Repeated-5-gram quality rule (the Gopher/RefinedWeb family):
    * fraction of 5-grams that are repeats of an earlier 5-gram in the
    * same document. Distinct counting rides the codegen WordShingles
    * expression; the keep flag is the filter a pipeline would apply.
    */
  private def ngramRepetition(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "documents")
      .withColumn("total_5grams",
        greatest(size(split(col("text"), " ")) - 4, lit(0)))
      .withColumn("distinct_5grams",
        size(graft.functions.WordShingles(col("text"), 5)))
      .withColumn("rep_ratio",
        when(col("total_5grams") > 0, // qdec: int/int ratio can TIE
          Quant.qdec(lit(1.0) - col("distinct_5grams").cast("double") /
            col("total_5grams"), 9))
          .otherwise(lit(0.0)))
      .withColumn("keep", col("rep_ratio") <= 0.2)
      .select(col("doc_id"), col("total_5grams"), col("distinct_5grams"),
        col("rep_ratio"), col("keep"))
      .orderBy(col("doc_id"))
  }

  private val ngramRepetitionSql =
    """SELECT doc_id,
      |  greatest(len(ws) - 4, 0) AS total_5grams,
      |  CAST(CASE WHEN len(ws) >= 5 THEN len(list_distinct(
      |    list_transform(range(1, len(ws) - 3),
      |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' '
      |        || ws[i+3] || ' ' || ws[i+4]))) ELSE 0 END AS INTEGER)
      |    AS distinct_5grams,
      |  CASE WHEN len(ws) - 4 > 0
      |    THEN floor((1.0 - (CASE WHEN len(ws) >= 5 THEN len(list_distinct(
      |      list_transform(range(1, len(ws) - 3),
      |        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' '
      |          || ws[i+3] || ' ' || ws[i+4]))) ELSE 0 END)
      |      / CAST(len(ws) - 4 AS DOUBLE)) * 1e9 + 0.5) / 1e9
      |    ELSE 0.0 END AS rep_ratio,
      |  CASE WHEN len(ws) - 4 > 0
      |    THEN floor((1.0 - (CASE WHEN len(ws) >= 5 THEN len(list_distinct(
      |      list_transform(range(1, len(ws) - 3),
      |        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' '
      |          || ws[i+3] || ' ' || ws[i+4]))) ELSE 0 END)
      |      / CAST(len(ws) - 4 AS DOUBLE)) * 1e9 + 0.5) / 1e9
      |    ELSE 0.0 END <= 0.2 AS keep
      |FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** Per-source fractional upsampling — the other half of mix
    * weighting (cp_source_mix downsamples): a source with weight
    * 2.5 emits every document twice plus a deterministic hash-chosen
    * half once more, so epochs repeat high-value sources without RNG
    * state. copies = floor(w) + (hash bucket < frac(w)). Narrow
    * per-row decision; the roll-up shuffles one row per source.
    */
  private def upsample(s: SparkSession, dir: String): DataFrame = {
    val wPermille =
      when(substring(col("source"), 4, 10).cast("int") % 3 === 0, 1000)
        .when(substring(col("source"), 4, 10).cast("int") % 3 === 1, 1500)
        .otherwise(2500)
    Tables(s, dir, "documents")
      .withColumn("weight_permille", wPermille)
      .withColumn("n_copies",
        floor(col("weight_permille") / 1000).cast("long") +
          when(hashBucket("up:", 1000) < col("weight_permille") % 1000, 1L)
            .otherwise(0L))
      .groupBy(col("source"))
      .agg(max(col("weight_permille")).as("weight_permille"),
        count(lit(1)).as("n_docs"),
        sum(col("n_copies")).cast("long").as("n_emitted"))
      .orderBy(col("source"))
  }

  private val upsampleSql =
    s"""SELECT source,
       |  max(CASE CAST(substring(source, 4, 10) AS INTEGER) % 3
       |      WHEN 0 THEN 1000 WHEN 1 THEN 1500 ELSE 2500 END)
       |    AS weight_permille,
       |  count(*) AS n_docs,
       |  CAST(sum((CASE CAST(substring(source, 4, 10) AS INTEGER) % 3
       |      WHEN 0 THEN 1000 WHEN 1 THEN 1500 ELSE 2500 END) // 1000
       |    + CASE WHEN ${bucketSql("up:", 1000)} <
       |        (CASE CAST(substring(source, 4, 10) AS INTEGER) % 3
       |         WHEN 0 THEN 1000 WHEN 1 THEN 1500 ELSE 2500 END) % 1000
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_emitted
       |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** Gopher-style composite quality filter: the standard pre-training
    * document rules — word-count bounds, mean-word-length band,
    * minimum stopword evidence ("is this prose at all"), and lexical
    * diversity — each emitted as its own flag plus the conjunction, so
    * a pipeline can audit WHY a document was dropped, not just that it
    * was. Entirely narrow (per-row array arithmetic, integer sums —
    * no fold-order hazards); the only shuffle is the output sort.
    */
  /** The Gopher-style rule flags, shared by cp_quality_filter (per-doc
    * audit) and cp_filter_ablation (per-rule aggregate): one narrow
    * projection, no shuffle.
    */
  private def withQualityFlags(docs: DataFrame): DataFrame =
    docs
      .withColumn("ws", split(col("text"), " "))
      .withColumn("n_words", size(col("ws")))
      .withColumn("mean_word_len", // qdec: int/int ratios can TIE
        Quant.qdec(aggregate(transform(col("ws"), w => length(w)), lit(0),
          (a, x) => a + x).cast("double") / col("n_words"), 9))
      .withColumn("distinct_ratio",
        Quant.qdec(size(array_distinct(col("ws"))).cast("double") /
          col("n_words"), 9))
      .withColumn("n_stop", size(filter(col("ws"),
        w => w.isin("the", "a", "and", "of", "to"))))
      .withColumn("r_word_count", col("n_words").between(50, 100000))
      .withColumn("r_mean_len", col("mean_word_len").between(4.0, 10.0))
      .withColumn("r_stopwords", col("n_stop") >= 2)
      .withColumn("r_diversity", col("distinct_ratio") >= 0.45)
      .withColumn("keep", col("r_word_count") && col("r_mean_len") &&
        col("r_stopwords") && col("r_diversity"))

  private def qualityFilter(s: SparkSession, dir: String): DataFrame = {
    withQualityFlags(Tables(s, dir, "documents"))
      .select(col("doc_id"), col("n_words"), col("mean_word_len"),
        col("distinct_ratio"), col("n_stop"), col("r_word_count"),
        col("r_mean_len"), col("r_stopwords"), col("r_diversity"),
        col("keep"))
      .orderBy(col("doc_id"))
  }

  /** INGEST-TIME quality filtering: the identical Gopher-style flags
    * computed on a document STREAM — withQualityFlags is a stateless
    * narrow projection, so it applies unchanged to `readStream` and
    * runs per micro-batch as documents arrive, which is where a
    * production pipeline wants the cheap rules (drop junk before it
    * costs dedup/embedding work downstream). Shares cp_quality_filter's
    * oracle verbatim: stream-vs-batch placement must not change one
    * flag on one document.
    */
  private def qualityIngestStream(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    val docsSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val flagged = withQualityFlags(streamingDocs(ss, dir, docsSchema))
      .select(col("doc_id"), col("n_words"), col("mean_word_len"),
        col("distinct_ratio"), col("n_stop"), col("r_word_count"),
        col("r_mean_len"), col("r_stopwords"), col("r_diversity"),
        col("keep"))
    val name = "cp_qingest_sink"
    ss.catalog.dropTempView(name)
    val q = flagged.writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    ss.table(name).orderBy(col("doc_id"))
  }

  private val qualityFilterSql =
    """WITH d AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |m AS (
      |  SELECT doc_id,
      |    len(ws) AS n_words,
      |    floor(CAST(list_aggregate(list_transform(ws, w -> len(w)), 'sum')
      |      AS DOUBLE) / len(ws) * 1e9 + 0.5) / 1e9 AS mean_word_len,
      |    floor(CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws)
      |      * 1e9 + 0.5) / 1e9 AS distinct_ratio,
      |    len(list_filter(ws, w -> w IN ('the','a','and','of','to')))
      |      AS n_stop
      |  FROM d)
      |SELECT doc_id, CAST(n_words AS INTEGER) AS n_words, mean_word_len,
      |  distinct_ratio, CAST(n_stop AS INTEGER) AS n_stop,
      |  n_words BETWEEN 50 AND 100000 AS r_word_count,
      |  mean_word_len BETWEEN 4.0 AND 10.0 AS r_mean_len,
      |  n_stop >= 2 AS r_stopwords,
      |  distinct_ratio >= 0.45 AS r_diversity,
      |  (n_words BETWEEN 50 AND 100000) AND
      |    (mean_word_len BETWEEN 4.0 AND 10.0) AND n_stop >= 2 AND
      |    distinct_ratio >= 0.45 AS keep
      |FROM m ORDER BY doc_id""".stripMargin

  /** Deterministic global shuffle + head: order the corpus by a salted
    * hash of the doc id and take the first 100 — how a pipeline draws
    * a reproducible random-looking sample (or defines the training
    * read order) without RNG state. Spark executes the sort+limit as
    * per-partition top-k and a single merge, never a full global sort.
    */
  private def corpusShuffle(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "documents")
      .withColumn("shuffle_key",
        md5(concat(lit("shuffle:"), col("doc_id").cast("string"))
          .cast("binary")))
      .select(col("shuffle_key"), col("doc_id"), col("source"))
      .orderBy(col("shuffle_key"))
      .limit(100)
  }

  private val corpusShuffleSql =
    """SELECT md5('shuffle:' || CAST(doc_id AS VARCHAR)) AS shuffle_key,
      |  doc_id, source
      |FROM documents ORDER BY shuffle_key LIMIT 100""".stripMargin

  /** Stratified source interleaving: rank documents within each source
    * by a salted hash, then read in (rank, source) order — the epoch
    * ordering that round-robins through sources so no long same-source
    * run appears in the training stream, with no RNG state. The
    * per-source rank is one partitioned window; the global (rank,
    * source) head executes as per-partition top-k + merge
    * (TakeOrderedAndProject), never a full sort.
    */
  private def interleave(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("k"))
    Tables(s, dir, "documents")
      .withColumn("k", md5(concat(lit("il:"),
        col("doc_id").cast("string")).cast("binary")))
      .withColumn("rnk", row_number().over(w))
      .select(col("rnk"), col("source"), col("doc_id"))
      .orderBy(col("rnk"), col("source"))
      .limit(100)
  }

  private val interleaveSql =
    """SELECT rnk, source, doc_id FROM (
      |  SELECT source, doc_id,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY md5('il:' || CAST(doc_id AS VARCHAR))) AS rnk
      |  FROM documents)
      |ORDER BY rnk, source LIMIT 100""".stripMargin

  /** The curation pipeline end-to-end: quality-filter (repetition +
    * diversity rules) → exact-dedup survivors → stable split
    * assignment → per-split corpus stats. Each stage is an operator
    * proven independently elsewhere (cp_ngram_repetition,
    * dd_exact, cp_hash_split); this query pins their COMPOSITION —
    * the actual shape of a training-data build — under one hash
    * check. All narrow passes plus one dedup aggregation and one
    * final roll-up; nothing here shuffles more than once.
    */
  private def curationPipeline(s: SparkSession, dir: String): DataFrame = {
    // Routed through the graft.corpus.CorpusPipeline library API so the
    // reusable surface itself sits under the driver hash gate (same
    // pattern as MinHashDedup / IvfIndex): quality rules → exact dedup
    // survivors → stable split → per-split stats.
    import graft.corpus.CorpusPipeline
    val kept = CorpusPipeline.qualityFilter(Tables(s, dir, "documents"),
      "text", maxRepeated5gramRatio = 0.2, minDistinctWordRatio = 0.5)
    val uniq = CorpusPipeline.dedupExact(kept, "doc_id", "text")
    CorpusPipeline.splitStats(
      CorpusPipeline.withSplit(uniq, "doc_id"), "doc_id", "n_chars")
  }

  private val curationPipelineSql =
    s"""WITH kept AS (
       |  SELECT doc_id, text, n_chars FROM (
       |    SELECT doc_id, text, n_chars,
       |      greatest(len(ws) - 4, 0) AS total5,
       |      CASE WHEN len(ws) >= 5 THEN len(list_distinct(
       |        list_transform(range(1, len(ws) - 3),
       |          i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' '
       |            || ws[i+3] || ' ' || ws[i+4]))) ELSE 0 END AS dist5,
       |      len(ws) AS nw, len(list_distinct(ws)) AS ndw
       |    FROM (SELECT doc_id, text, n_chars,
       |            string_split(text, ' ') AS ws FROM documents))
       |  WHERE total5 > 0
       |    AND 1.0 - CAST(dist5 AS DOUBLE) / total5 <= 0.2
       |    AND CAST(ndw AS DOUBLE) / nw >= 0.5),
       |survivors AS (
       |  SELECT min(doc_id) AS doc_id, min(n_chars) AS n_chars
       |  FROM kept GROUP BY text)
       |SELECT CASE WHEN ${bucketSql("split:", 100)} < 80 THEN 'train'
       |            WHEN ${bucketSql("split:", 100)} < 90 THEN 'validation'
       |            ELSE 'test' END AS split,
       |  count(*) AS n_docs,
       |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
       |  min(doc_id) AS first_doc
       |FROM survivors GROUP BY 1 ORDER BY split""".stripMargin

  /** Document chunking: fixed 32-word windows with 8-word overlap
    * (stride 24) — the pre-embedding chunker. Emitted per chunk with
    * its word span and boundary words so the oracle pins every
    * window's extent without materializing the text. Narrow:
    * explode over a per-doc sequence, no shuffle until the final
    * sort.
    */
  private def chunk(s: SparkSession, dir: String): DataFrame = {
    val win = 32
    val stride = 24
    Tables(s, dir, "documents")
      .withColumn("ws", split(col("text"), " "))
      .withColumn("n_words", size(col("ws")))
      // chunk starts: 0, 24, 48, ... while start < n_words
      .withColumn("chunk_idx",
        explode(sequence(lit(0),
          greatest(floor((col("n_words") - 1) / stride).cast("int"), lit(0)))))
      .withColumn("start", col("chunk_idx") * stride)
      .filter(col("start") < col("n_words"))
      .withColumn("len", least(lit(win), col("n_words") - col("start")))
      .select(col("doc_id"), col("chunk_idx"), col("start"), col("len"),
        element_at(col("ws"), col("start") + 1).as("first_word"),
        element_at(col("ws"), col("start") + col("len")).as("last_word"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  private val chunkSql =
    """SELECT doc_id, chunk_idx, chunk_idx * 24 AS start,
      |  least(32, nw - chunk_idx * 24) AS len,
      |  ws[chunk_idx * 24 + 1] AS first_word,
      |  ws[chunk_idx * 24 + least(32, nw - chunk_idx * 24)] AS last_word
      |FROM (SELECT doc_id, string_split(text, ' ') AS ws,
      |        len(string_split(text, ' ')) AS nw FROM documents),
      |  (SELECT unnest(range(0, 100)) AS chunk_idx)
      |WHERE chunk_idx <= greatest((nw - 1) // 24, 0)
      |  AND chunk_idx * 24 < nw
      |ORDER BY doc_id, chunk_idx""".stripMargin

  /** Sequence packing: assign documents (in stable doc_id order) to
    * fixed-token-budget training sequences via the distributed
    * prefix-sum (per-chunk subtotals → broadcast offsets → in-chunk
    * running count) — the same two-pass pattern as the migration
    * batch planner, reused on the corpus side. Greedy sequential
    * packing is inherently serial; the running-total bin assignment
    * is its order-preserving distributed form.
    */
  private def sequencePack(s: SparkSession, dir: String): DataFrame = {
    val budget = 1024L
    val chunkRows = 128L
    val sized = Tables(s, dir, "documents")
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("chunk", floor(col("doc_id") / chunkRows))
    val offsets = sized.groupBy(col("chunk"))
      .agg(sum(col("n_tokens")).as("chunk_tokens"))
      .withColumn("offset",
        coalesce(sum(col("chunk_tokens")).over(
          Window.orderBy(col("chunk"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("chunk"), col("offset"))
    val wIn = Window.partitionBy(col("chunk")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sized.join(broadcast(offsets), "chunk")
      .withColumn("running", col("offset") + sum(col("n_tokens")).over(wIn))
      .withColumn("seq_id",
        floor((col("running") - 1).cast("double") / budget).cast("long"))
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("seq_tokens"),
        min(col("doc_id")).as("first_doc"))
      .orderBy(col("seq_id"))
  }

  private val sequencePackSql =
    """WITH sized AS (
      |  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
      |  FROM documents),
      |running AS (
      |  SELECT *, sum(n_tokens) OVER (ORDER BY doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
      |  FROM sized)
      |SELECT CAST(floor(CAST(running - 1 AS DOUBLE) / 1024) AS BIGINT)
      |    AS seq_id,
      |  count(*) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
      |  min(doc_id) AS first_doc
      |FROM running GROUP BY 1 ORDER BY seq_id""".stripMargin

  /** Output-shard MANIFEST — the artifact a dataset publisher ships
    * next to the shards: deterministic doc_id-ordered byte stream cut
    * at a 64 KiB budget (cp_sequence_pack's greedy split, one level
    * up: bytes into files instead of tokens into sequences), and per
    * shard the doc count, byte size, fill ratio against the budget,
    * id range, and an md5 over the ordered member-id list — the
    * integrity checksum a consumer re-derives to prove it read
    * exactly the published membership. A shard can exceed the budget
    * only when one document alone does (the straddling doc lands in
    * the shard where its last byte falls).
    *
    * Scale shape: the same two-pass prefix sum as mig_batch_plan /
    * cp_sequence_pack — per-chunk offsets (chunk-count-sized,
    * broadcast back) + a chunk-partitioned running sum, so no
    * corpus-sized single-partition window exists; the manifest agg is
    * one hash aggregation keyed by shard.
    */
  private def shardManifest(s: SparkSession, dir: String): DataFrame = {
    val budget = 65536L
    val chunkRows = 128L
    val sized = Tables(s, dir, "documents")
      .select(col("doc_id"), col("n_chars").cast("long").as("nb"))
      .withColumn("chunk", floor(col("doc_id") / chunkRows))
    val offsets = sized.groupBy(col("chunk"))
      .agg(sum(col("nb")).as("chunk_bytes"))
      .withColumn("offset",
        coalesce(sum(col("chunk_bytes")).over(
          Window.orderBy(col("chunk"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("chunk"), col("offset"))
    val wIn = Window.partitionBy(col("chunk")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sized.join(broadcast(offsets), "chunk")
      .withColumn("running", col("offset") + sum(col("nb")).over(wIn))
      .withColumn("shard_id",
        floor((col("running") - 1).cast("double") / budget).cast("long"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nb")).as("shard_bytes"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"),
        md5(concat_ws(",",
          transform(sort_array(collect_list(col("doc_id"))),
            _.cast("string"))).cast("binary")).as("manifest_md5"))
      .withColumn("fill_ratio",
        graft.Quant.qdec(col("shard_bytes").cast("double") / budget, 9))
      .orderBy(col("shard_id"))
  }

  private val shardManifestSql =
    """WITH sized AS (SELECT doc_id, n_chars AS nb FROM documents),
      |running AS (
      |  SELECT *, sum(nb) OVER (ORDER BY doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
      |  FROM sized)
      |SELECT CAST(floor(CAST(running - 1 AS DOUBLE) / 65536) AS BIGINT)
      |    AS shard_id,
      |  count(*) AS n_docs,
      |  CAST(sum(nb) AS BIGINT) AS shard_bytes,
      |  min(doc_id) AS first_doc,
      |  max(doc_id) AS last_doc,
      |  md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
      |    AS manifest_md5,
      |  floor(CAST(sum(nb) AS DOUBLE) / 65536 * 1e9 + 0.5) / 1e9
      |    AS fill_ratio
      |FROM running GROUP BY 1 ORDER BY shard_id""".stripMargin

  /** Eval-set contamination check: for every test-split document, how
    * many of its distinct 13-grams also appear anywhere in the train
    * split — the standard decontamination screen run before training.
    * The train side collapses to a distinct 13-gram set (signatures,
    * not documents, cross the join), the test side left-semi probes
    * it, and the verdict is per-test-document. 13 is the conventional
    * overlap length; the splits are the same stable hash assignment
    * as cp_hash_split, so the check is reproducible on re-ingestion.
    */
  private def contamination(s: SparkSession, dir: String): DataFrame = {
    val k = 13
    val assigned = Tables(s, dir, "documents")
      .withColumn("bucket", hashBucket("split:", 100))
    val trainGrams = assigned.filter(col("bucket") < 80)
      .select(explode(graft.functions.WordShingles(col("text"), k)).as("g"))
      .distinct()
    val testDocs = assigned.filter(col("bucket") >= 90)
    val shared = testDocs
      .select(col("doc_id"),
        explode(graft.functions.WordShingles(col("text"), k)).as("g"))
      .join(trainGrams, Seq("g"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
    testDocs
      .select(col("doc_id"),
        size(graft.functions.WordShingles(col("text"), k)).as("n_grams"))
      .join(shared, Seq("doc_id"), "left")
      .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
      .withColumn("contaminated", col("n_shared") > 0)
      .orderBy(col("doc_id"))
  }

  private val contaminationSql = {
    val gram13 = (1 to 13).map(j => s"ws[i+${j - 1}]").mkString(" || ' ' || ")
    s"""WITH assigned AS (
       |  SELECT doc_id, string_split(text, ' ') AS ws,
       |    ${bucketSql("split:", 100)} AS bucket
       |  FROM documents),
       |train_grams AS (
       |  SELECT DISTINCT unnest(list_distinct(list_transform(
       |    range(1, len(ws) - 11), i -> $gram13))) AS g
       |  FROM assigned WHERE bucket < 80 AND len(ws) >= 13),
       |test_grams AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    range(1, len(ws) - 11), i -> $gram13))) AS g
       |  FROM assigned WHERE bucket >= 90 AND len(ws) >= 13),
       |shared AS (
       |  SELECT doc_id, count(*) AS n_shared FROM test_grams
       |  WHERE g IN (SELECT g FROM train_grams) GROUP BY doc_id)
       |SELECT a.doc_id,
       |  CAST(CASE WHEN len(ws) >= 13 THEN len(list_distinct(list_transform(
       |    range(1, len(ws) - 11), i -> $gram13))) ELSE 0 END AS INTEGER)
       |    AS n_grams,
       |  coalesce(n_shared, 0) AS n_shared,
       |  coalesce(n_shared, 0) > 0 AS contaminated
       |FROM (SELECT * FROM assigned WHERE bucket >= 90) a
       |  LEFT JOIN shared ON a.doc_id = shared.doc_id
       |ORDER BY a.doc_id""".stripMargin
  }

  /** MULTI-BENCHMARK decontamination matrix — the production shape of
    * [[contamination]]: a training corpus is screened against a whole
    * BATTERY of eval benchmarks in ONE pass, and the report is a
    * per-(benchmark, severity) pivot — exactly what a data-curation
    * review board reads before a training run ("37 train docs overlap
    * bench_b heavily; re-split or drop"). Three benchmarks are carved
    * from the held-out buckets (90–92 / 93–95 / 96–99); severity is
    * integer-exact: `heavy` when ≥10% of a train doc's distinct
    * 13-grams appear in the benchmark (n_shared·10 ≥ n_grams), `touch`
    * for any overlap below that, `clean` otherwise. The full
    * benchmark×severity grid is emitted (zero counts included) so the
    * row set is schema-stable across corpora.
    *
    * Scale shape: the corpus is scanned ONCE — the benchmark-keyed
    * gram table (distinct (benchmark, gram), eval sets are small by
    * construction) is the join's build side, NOT one scan per
    * benchmark; per-(doc, benchmark) counts are map-side combinable;
    * the pivot moves 9 rows. Adding a benchmark adds rows to the
    * build side, not a corpus pass.
    */
  private def contaminationMatrix(s: SparkSession, dir: String): DataFrame = {
    val k = 13
    val assigned = Tables(s, dir, "documents")
      .withColumn("bucket", hashBucket("split:", 100))
    val bench = when(col("bucket") < 93, lit("bench_a"))
      .when(col("bucket") < 96, lit("bench_b")).otherwise(lit("bench_c"))
    val evalGrams = assigned.filter(col("bucket") >= 90)
      .select(bench.as("benchmark"),
        explode(graft.functions.WordShingles(col("text"), k)).as("g"))
      .distinct()
    val trainGrams = assigned.filter(col("bucket") < 80)
      .select(col("doc_id"),
        array_distinct(graft.functions.WordShingles(col("text"), k)).as("gs"))
      .select(col("doc_id"), size(col("gs")).as("n_grams"),
        explode(col("gs")).as("g"))
    // one (doc, benchmark) row per contaminated pair; severity from
    // integer arithmetic only, so both engines classify identically
    val perDoc = trainGrams.join(evalGrams, Seq("g"))
      .groupBy(col("doc_id"), col("n_grams"), col("benchmark"))
      .agg(count(lit(1)).as("n_shared"))
      .withColumn("heavy",
        (col("n_shared") * 10 >= col("n_grams")).cast("long"))
    // ONE aggregation consumes the corpus join (a union of severity
    // pivots would recompute the gram-join subtree per branch); the
    // 3-row result is widened to the 9-row matrix with stack()
    val perBench = perDoc.groupBy(col("benchmark"))
      .agg(sum(col("heavy")).as("heavy_n"),
        (count(lit(1)) - sum(col("heavy"))).as("touch_n"))
    val total = assigned.filter(col("bucket") < 80)
      .agg(count(lit(1)).as("n_train"))
    import s.implicits._
    val benches = Seq("bench_a", "bench_b", "bench_c").toDF("benchmark")
    benches.join(perBench, Seq("benchmark"), "left")
      .crossJoin(total)
      .select(col("benchmark"),
        coalesce(col("heavy_n"), lit(0L)).as("heavy_n"),
        coalesce(col("touch_n"), lit(0L)).as("touch_n"),
        col("n_train"))
      .selectExpr("benchmark",
        "stack(3, 'clean', n_train - heavy_n - touch_n, " +
          "'heavy', heavy_n, 'touch', touch_n) AS (severity, n_docs)")
      .orderBy(col("benchmark"), col("severity"))
  }

  private val contaminationMatrixSql = {
    val gram13 = (1 to 13).map(j => s"ws[i+${j - 1}]").mkString(" || ' ' || ")
    s"""WITH assigned AS (
       |  SELECT doc_id, string_split(text, ' ') AS ws,
       |    ${bucketSql("split:", 100)} AS bucket
       |  FROM documents),
       |eval_grams AS (
       |  SELECT DISTINCT
       |    CASE WHEN bucket < 93 THEN 'bench_a'
       |         WHEN bucket < 96 THEN 'bench_b'
       |         ELSE 'bench_c' END AS benchmark,
       |    unnest(list_distinct(list_transform(
       |      range(1, len(ws) - 11), i -> $gram13))) AS g
       |  FROM assigned WHERE bucket >= 90 AND len(ws) >= 13),
       |train_grams AS (
       |  SELECT doc_id,
       |    CASE WHEN len(ws) >= 13 THEN len(list_distinct(list_transform(
       |      range(1, len(ws) - 11), i -> $gram13))) ELSE 0 END AS n_grams,
       |    unnest(list_distinct(list_transform(
       |      range(1, len(ws) - 11), i -> $gram13))) AS g
       |  FROM assigned WHERE bucket < 80 AND len(ws) >= 13),
       |per_doc AS (
       |  SELECT t.doc_id, t.n_grams, e.benchmark, count(*) AS n_shared
       |  FROM train_grams t JOIN eval_grams e ON t.g = e.g
       |  GROUP BY 1, 2, 3),
       |sev AS (
       |  SELECT benchmark,
       |    CASE WHEN n_shared * 10 >= n_grams THEN 'heavy'
       |         ELSE 'touch' END AS severity,
       |    doc_id
       |  FROM per_doc),
       |contam AS (
       |  SELECT benchmark, severity, count(*) AS n_docs
       |  FROM sev GROUP BY 1, 2),
       |per_bench AS (
       |  SELECT benchmark, count(DISTINCT doc_id) AS n_contam
       |  FROM per_doc GROUP BY 1),
       |total AS (
       |  SELECT count(*) AS n_train FROM assigned WHERE bucket < 80),
       |grid AS (
       |  SELECT b.benchmark, s.severity
       |  FROM (VALUES ('bench_a'), ('bench_b'), ('bench_c')) b(benchmark),
       |    (VALUES ('touch'), ('heavy')) s(severity))
       |SELECT g.benchmark, g.severity, coalesce(c.n_docs, 0) AS n_docs
       |FROM grid g LEFT JOIN contam c
       |  ON g.benchmark = c.benchmark AND g.severity = c.severity
       |UNION ALL
       |SELECT b.benchmark, 'clean' AS severity,
       |  (SELECT n_train FROM total) - coalesce(p.n_contam, 0) AS n_docs
       |FROM (VALUES ('bench_a'), ('bench_b'), ('bench_c')) b(benchmark)
       |  LEFT JOIN per_bench p ON b.benchmark = p.benchmark
       |ORDER BY benchmark, severity""".stripMargin
  }

  /** Streaming source over the fixture's documents table, shape-aware
    * (the EventStream dispatch): the driver fixtures store documents
    * as ONE file inside the table dir — filter the shared dir down to
    * it — while the derived sf1* stores a parquet DIRECTORY of parts,
    * read directly. A file-name pathGlobFilter on the latter matches
    * nothing and the stream silently processes zero batches.
    */
  private def streamingDocs(ss: SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val src = java.nio.file.Paths.get(s"$dir/documents.parquet")
    val reader = ss.readStream.schema(schema)
    if (java.nio.file.Files.isDirectory(src))
      reader.option("pathGlobFilter", "*.parquet").parquet(src.toString)
    else reader.option("pathGlobFilter", "documents.parquet").parquet(dir)
  }

  /** The frozen eval-set gram index the streaming screen gates
    * against: distinct 13-gram md5s of the test split (16-byte keys —
    * eval sets are small by construction, so this set broadcasts).
    */
  private[graft] def evalGramSet(docs: DataFrame, k: Int): DataFrame =
    docs.filter(graft.corpus.CorpusPipeline
        .hashBucket("doc_id", "split:", 100) >= 90)
      .select(explode(graft.functions.WordShingles(col("text"), k)).as("gr"))
      .select(md5(col("gr").cast("binary")).as("g"))
      .distinct()

  /** Screen ONE arriving micro-batch of train candidates against the
    * frozen eval grams: per doc, distinct gram count, grams shared
    * with the eval set, and the leaky verdict. Pure batch machinery —
    * foreachBatch hands each micro-batch here.
    */
  private[graft] def screenAgainstEval(batch: DataFrame,
      evalGrams: DataFrame, k: Int): DataFrame = {
    val g = batch
      .select(col("doc_id"),
        explode(graft.functions.WordShingles(col("text"), k)).as("gr"))
      .select(col("doc_id"), md5(col("gr").cast("binary")).as("g"))
    val shared = g.join(broadcast(evalGrams), Seq("g"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
    batch
      .select(col("doc_id"),
        size(graft.functions.WordShingles(col("text"), k)).as("n_grams"))
      .join(shared, Seq("doc_id"), "left")
      .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
      .withColumn("leaky", col("n_shared") > 0)
  }

  /** CLUSTER-BALANCED sampling — the diversity-preserving selection
    * step a pipeline runs after near-dup removal (SemDeDup's
    * published recipe ends exactly here: cluster the embedding space,
    * then cap each cluster's contribution so dense regions can't
    * crowd out the tail). Every vector is assigned to its nearest
    * centroid (one narrow NearestCentroids projection — constant plan
    * width, no corpus × centroids fan-out), and each cluster keeps
    * its `budget` lowest salted-hash members: the same
    * order-independent, re-crawl-stable selection rule as
    * cp_hash_split, so a re-ingested corpus samples identically.
    * One cluster-keyed shuffle for the per-cluster rank window;
    * emitted rows are the kept sample with its rank.
    */
  private def clusterBalancedSample(s: SparkSession, dir: String): DataFrame = {
    val budget = 12
    val nCents = 16
    val e = Tables(s, dir, "embeddings")
    val cm: Seq[Seq[Double]] = e.filter(col("vec_id") < nCents)
      .select(col("vec_id"), col("embedding")).collect()
      .sortBy(_.getLong(0))
      .map(_.getSeq[Float](1).map(_.toDouble).toSeq).toSeq
    val assigned = e.select(col("vec_id"), col("embedding").as("v"))
      .withColumn("cluster",
        graft.functions.NearestCentroids(col("v"), cm, 1)
          .getItem(0).getField("cid"))
      .withColumn("bucket", graft.corpus.CorpusPipeline
        .hashBucket("vec_id", "cbs:", 1 << 24))
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col("bucket"), col("vec_id"))
    assigned
      .withColumn("smp_rank", row_number().over(w))
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy(col("cluster"))))
      .filter(col("smp_rank") <= budget)
      .select(col("cluster"), col("vec_id"), col("smp_rank"),
        col("cluster_size"))
      .orderBy(col("cluster"), col("smp_rank"))
  }

  private val clusterBalancedSampleSql =
    """WITH cents AS (
      |  SELECT vec_id AS cent_id, CAST(embedding AS DOUBLE[]) AS cv
      |  FROM embeddings WHERE vec_id < 16),
      |vecs AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |assigned AS (
      |  SELECT vec_id, cent_id AS cluster FROM (
      |    SELECT vec_id, cent_id,
      |      row_number() OVER (PARTITION BY vec_id
      |        ORDER BY list_cosine_similarity(v, cv) DESC, cent_id) AS arnk
      |    FROM vecs, cents)
      |  WHERE arnk = 1),
      |ranked AS (
      |  SELECT cluster, vec_id,
      |    row_number() OVER (PARTITION BY cluster ORDER BY
      |      CAST(('0x' || substring(md5('cbs:' || CAST(vec_id AS VARCHAR)),
      |        1, 6)) AS BIGINT) % 16777216, vec_id) AS smp_rank,
      |    count(*) OVER (PARTITION BY cluster) AS cluster_size
      |  FROM assigned)
      |SELECT cluster, vec_id, smp_rank, cluster_size
      |FROM ranked WHERE smp_rank <= 12
      |ORDER BY cluster, smp_rank""".stripMargin

  /** Bloom-PRESCREENED decontamination — the batch screen restated
    * for the regime where even the eval gram SET is too heavy to hand
    * every executor as a broadcast hash relation. The frozen side
    * collapses once more, from distinct gram md5s (16+ bytes each) to
    * a Bloom filter over their xxhash64s (~1.2 bytes/gram at 1% FPR —
    * an order of magnitude lighter at the same membership question),
    * built by ONE eval-bounded aggregation and shipped into the
    * corpus-side scan as a codegen LITERAL predicate
    * (`BloomFilterMightContain` — the expression Spark's own runtime
    * row-level filtering injects, so the probe rides whole-stage
    * codegen with no join machinery). Only the surviving ~(hits + FP)
    * gram stream enters the exact confirm semi-join, which restores
    * set semantics — false positives cannot reach the verdict, so the
    * output is byte-equal to the exact screen and the oracle is the
    * ingest-gate SQL verbatim.
    *
    * Scale shape at 100 TB: corpus side is scan → explode → md5 →
    * bloom probe, all narrow; the shuffle that remains (per-doc count
    * of confirmed grams) carries only confirmed hits. The bloom build
    * is eval-sized; its bytes live in the plan, not in a broadcast
    * exchange.
    */
  private def bloomGate(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val k = 13
    val docs = Tables(s, dir, "documents")
    val evalGrams = evalGramSet(docs, k)
    val bloomBytes = evalGrams
      .select(ColumnBridge.column(new BloomFilterAggregate(
          new XxHash64(Seq(ColumnBridge.expression(col("g")))),
          Literal(200000L)).toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
    val arriving = docs.filter(hashBucket("split:", 100) < 80)
    val grams = arriving
      .select(col("doc_id"),
        explode(graft.functions.WordShingles(col("text"), k)).as("gr"))
      .select(col("doc_id"), md5(col("gr").cast("binary")).as("g"))
    // bloomBytes is null only when the eval split is EMPTY (the
    // aggregate saw no rows) — then nothing can leak and the exact
    // confirm below sees an empty candidate stream either way
    val candidates =
      if (bloomBytes == null) grams.filter(lit(false))
      else grams.filter(ColumnBridge.column(new BloomFilterMightContain(
        Literal(bloomBytes,
          org.apache.spark.sql.types.BinaryType),
        new XxHash64(Seq(ColumnBridge.expression(col("g")))))))
    val shared = candidates
      .join(broadcast(evalGrams), Seq("g"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
    arriving
      .select(col("doc_id"),
        size(graft.functions.WordShingles(col("text"), k)).as("n_grams"))
      .join(shared, Seq("doc_id"), "left")
      .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
      .withColumn("leaky", col("n_shared") > 0)
      .orderBy(col("doc_id"))
  }

  /** INGEST-TIME decontamination — the triptych's production
    * placement: eval leaks are cheapest to stop at ingest, before a
    * contaminated candidate costs dedup/embedding work and lands in a
    * training shard. Arriving train-split candidates stream in;
    * each micro-batch is gated (foreachBatch) against the FROZEN
    * eval-set gram index — the direction a live pipeline runs, where
    * the eval set is fixed at release time and the corpus is what
    * grows. The frozen side is distinct gram md5s computed once and
    * broadcast into every batch's semi-join; per-batch verdicts land
    * in a batch-id-named parquet dir (idempotent under foreachBatch's
    * at-least-once retries — the IncrementalIngest audit-log
    * convention). Output matches the batch screen row-for-row
    * (mirrored oracle; ContaminationStreamSpec pins stream-vs-batch
    * equality and checkpoint restart).
    *
    * Scale shape: the eval index is eval-set-sized (broadcast); the
    * per-batch cost rides the BATCH's gram footprint. Nothing
    * corpus-sized shuffles, ever — the property that lets the gate
    * run inline on a 100 TB/day crawl.
    */
  private def contaminationIngestStream(s: SparkSession,
      dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val k = 13
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    // frozen BEFORE the stream starts: the eval set must not move
    // while the gate is live (localCheckpoint pins the computed set,
    // not the plan — re-running the lineage per batch would re-scan
    // the eval split every arrival)
    val evalGrams =
      evalGramSet(Tables(ss, dir, "documents"), k).localCheckpoint()
    val docsSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val work = java.nio.file.Files.createTempDirectory("graft_cstream")
    val verdictDir = work.resolve("verdicts").toString
    val q = streamingDocs(ss, dir, docsSchema)
      .writeStream
      .option("checkpointLocation", work.resolve("ckpt").toString)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val arriving = batch.filter(graft.corpus.CorpusPipeline
          .hashBucket("doc_id", "split:", 100) < 80)
        if (!arriving.isEmpty)
          screenAgainstEval(arriving, evalGrams, k)
            .write.mode("overwrite").parquet(s"$verdictDir/b$batchId")
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    // foreachBatch only writes when a batch had arriving (bucket<80)
    // docs — a corpus with no train-split docs leaves verdictDir
    // absent and the read would throw. An empty verdict frame IS the
    // correct answer there, so publish one before the final read.
    if (!java.nio.file.Files.exists(work.resolve("verdicts")))
      ss.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
          StructType(Seq(
            StructField("doc_id", LongType),
            StructField("n_grams", org.apache.spark.sql.types.IntegerType),
            StructField("n_shared", LongType),
            StructField("leaky", org.apache.spark.sql.types.BooleanType))))
        .write.mode("overwrite").parquet(s"$verdictDir/b_empty")
    val out = ss.read.option("recursiveFileLookup", "true")
      .parquet(verdictDir)
      .select(col("doc_id"), col("n_grams"), col("n_shared"), col("leaky"))
      // pin BEFORE the sort: the checkpoint exists to outlive the run
      // dir's deletion, and pinning the pre-sort rows lets the final
      // order-by stay lazy (computed only by consumers that need row
      // order, exactly as every lazy query's terminal sort already is)
      .localCheckpoint() // materialize before the run dir is deleted
      .orderBy(col("doc_id"))
    org.apache.commons.io.FileUtils.deleteQuietly(work.toFile)
    out
  }

  // the batch oracle with the roles swapped: arriving = train split,
  // frozen = eval split — otherwise identical to contaminationSql
  private val contaminationIngestStreamSql = {
    val gram13 = (1 to 13).map(j => s"ws[i+${j - 1}]").mkString(" || ' ' || ")
    s"""WITH assigned AS (
       |  SELECT doc_id, string_split(text, ' ') AS ws,
       |    ${bucketSql("split:", 100)} AS bucket
       |  FROM documents),
       |eval_grams AS (
       |  SELECT DISTINCT unnest(list_distinct(list_transform(
       |    range(1, len(ws) - 11), i -> $gram13))) AS g
       |  FROM assigned WHERE bucket >= 90 AND len(ws) >= 13),
       |arr_grams AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    range(1, len(ws) - 11), i -> $gram13))) AS g
       |  FROM assigned WHERE bucket < 80 AND len(ws) >= 13),
       |shared AS (
       |  SELECT doc_id, count(*) AS n_shared FROM arr_grams
       |  WHERE g IN (SELECT g FROM eval_grams) GROUP BY doc_id)
       |SELECT a.doc_id,
       |  CAST(CASE WHEN len(ws) >= 13 THEN len(list_distinct(list_transform(
       |    range(1, len(ws) - 11), i -> $gram13))) ELSE 0 END AS INTEGER)
       |    AS n_grams,
       |  coalesce(n_shared, 0) AS n_shared,
       |  coalesce(n_shared, 0) > 0 AS leaky
       |FROM (SELECT * FROM assigned WHERE bucket < 80) a
       |  LEFT JOIN shared ON a.doc_id = shared.doc_id
       |ORDER BY a.doc_id""".stripMargin
  }

  /** Span-level eval-set decontamination — cp_contamination's
    * positional upgrade: the 13-gram screen says WHETHER a test doc
    * shares any window with train; this one says HOW MUCH and HOW
    * CONTIGUOUSLY, which is what actually decides the call between
    * "shared idiom" (one isolated 13-gram) and "verbatim leak" (a
    * 40-token stretch of the test doc sitting inside some train doc).
    * Per test-split document: gram positions, hit positions (gram
    * present anywhere in the train split), the LONGEST contaminated
    * run (consecutive hit starts → run + k − 1 tokens, the
    * dd_substring_spans chain), and the covered-token interval union
    * (islands merge on gap ≤ k, the dd_substring_trim rule).
    *
    * Scale shape: the train side collapses to DISTINCT gram md5s
    * (map-side combinable; 16-byte keys on the exchange), the test
    * side is positional grams semi-joined against it — cost rides the
    * TEST split (small by construction), never train×test. The run
    * and coverage windows partition by test doc.
    */
  private def contaminationSpans(s: SparkSession, dir: String): DataFrame = {
    val k = 13
    val assigned = Tables(s, dir, "documents")
      .withColumn("bucket", hashBucket("split:", 100))
    val gramExpr = expr(
      s"transform(sequence(1, size(ws) - ${k - 1}), " +
        s"i -> md5(CAST(array_join(slice(ws, i, $k), ' ') AS BINARY)))")
    val trainGrams = assigned.filter(col("bucket") < 80)
      .select(split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= k)
      .select(explode(gramExpr).as("g")).distinct()
    val testDocs = assigned.filter(col("bucket") >= 90)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
    val hits = testDocs.filter(size(col("ws")) >= k)
      .select(col("doc_id"), posexplode(gramExpr))
      .toDF("doc_id", "pos", "g")
      .join(trainGrams, Seq("g"), "left_semi")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val runs = hits
      .withColumn("run_brk",
        when(col("pos") - lag(col("pos"), 1).over(w) === 1, 0).otherwise(1))
      .withColumn("cov_brk",
        when(col("pos") - lag(col("pos"), 1).over(w) <= k, 0).otherwise(1))
      .withColumn("run_id", sum(col("run_brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("isl_id", sum(col("cov_brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val perDoc = runs
      .groupBy(col("doc_id"), col("run_id"))
      .agg(count(lit(1)).as("run_len"))
      .groupBy(col("doc_id"))
      .agg(sum(col("run_len")).as("n_hits"),
        (max(col("run_len")) + lit(k - 1)).cast("long")
          .as("longest_span_tokens"))
    // covered tokens aggregate ISLANDS, a coarser grouping than runs
    // (one island can span several runs) — kept as its own tree so
    // neither statistic double-counts the other's grouping
    val covered = runs
      .groupBy(col("doc_id"), col("isl_id"))
      .agg((max(col("pos")) - min(col("pos")) + lit(k)).cast("long")
        .as("cov"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cov")).as("covered_tokens"))
    testDocs
      .select(col("doc_id"),
        greatest(size(col("ws")) - lit(k - 1), lit(0)).cast("long")
          .as("n_grams"))
      .join(perDoc.select(col("doc_id"), col("n_hits"),
        col("longest_span_tokens")), Seq("doc_id"), "left")
      .join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("longest_span_tokens"), lit(0L))
          .as("longest_span_tokens"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"))
      .orderBy(col("doc_id"))
  }

  private val contaminationSpansSql = {
    val k = 13
    s"""WITH assigned AS (
       |  SELECT doc_id, string_split(text, ' ') AS ws,
       |    ${bucketSql("split:", 100)} AS bucket
       |  FROM documents),
       |train_grams AS (
       |  SELECT DISTINCT
       |    md5(array_to_string(ws[i:i+${k - 1}], ' ')) AS g
       |  FROM assigned, unnest(range(1, len(ws) - $k + 2)) AS u(i)
       |  WHERE bucket < 80 AND len(ws) >= $k),
       |hits AS (
       |  SELECT doc_id, i AS pos
       |  FROM assigned, unnest(range(1, len(ws) - $k + 2)) AS u(i)
       |  WHERE bucket >= 90 AND len(ws) >= $k
       |    AND md5(array_to_string(ws[i:i+${k - 1}], ' '))
       |      IN (SELECT g FROM train_grams)),
       |marked AS (
       |  SELECT doc_id, pos,
       |    CASE WHEN pos - lag(pos)
       |        OVER (PARTITION BY doc_id ORDER BY pos) = 1
       |      THEN 0 ELSE 1 END AS run_brk,
       |    CASE WHEN pos - lag(pos)
       |        OVER (PARTITION BY doc_id ORDER BY pos) <= $k
       |      THEN 0 ELSE 1 END AS cov_brk
       |  FROM hits),
       |ids AS (
       |  SELECT doc_id, pos,
       |    sum(run_brk) OVER w AS run_id, sum(cov_brk) OVER w AS isl_id
       |  FROM marked
       |  WINDOW w AS (PARTITION BY doc_id ORDER BY pos
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |per_doc AS (
       |  SELECT doc_id, sum(run_len) AS n_hits,
       |    max(run_len) + $k - 1 AS longest_span_tokens
       |  FROM (SELECT doc_id, run_id, count(*) AS run_len
       |        FROM ids GROUP BY 1, 2)
       |  GROUP BY doc_id),
       |cov AS (
       |  SELECT doc_id, sum(cv) AS covered_tokens FROM (
       |    SELECT doc_id, max(pos) - min(pos) + $k AS cv
       |    FROM ids GROUP BY doc_id, isl_id)
       |  GROUP BY doc_id)
       |SELECT a.doc_id,
       |  CAST(greatest(len(ws) - ${k - 1}, 0) AS BIGINT) AS n_grams,
       |  CAST(coalesce(n_hits, 0) AS BIGINT) AS n_hits,
       |  CAST(coalesce(longest_span_tokens, 0) AS BIGINT)
       |    AS longest_span_tokens,
       |  CAST(coalesce(covered_tokens, 0) AS BIGINT) AS covered_tokens
       |FROM (SELECT * FROM assigned WHERE bucket >= 90) a
       |  LEFT JOIN per_doc USING (doc_id)
       |  LEFT JOIN cov USING (doc_id)
       |ORDER BY a.doc_id""".stripMargin
  }

  /** FUZZY eval-set decontamination — the third screen in the
    * triptych (exact 13-gram → exact spans → near-dup): a test doc
    * whose shingle-Jaccard against some TRAIN doc clears the dedup
    * threshold is a paraphrased/reflowed leak the exact screens miss
    * (the fixture carries one at J=0.989 that survives light edits).
    * Built on the MinHashDedup machinery, but with TWO-SIDED banding:
    * test bands join train bands directly, so no test–test or
    * train–train candidate is ever generated — the candidate volume
    * is the cross-split collision mass only. bandRows = 2 because the
    * screen runs at the j ≥ 0.5 regime (per the library's recall
    * table: miss ≈ 1e-8 there, vs 0.13 at the default r=4 banding);
    * candidates verify by exact Jaccard before anything is reported.
    * Per test doc: matches, strongest leak (max J; ties break to the
    * smallest train id), the culprit train doc.
    *
    * Scale shape: signatures are one codegen pass per side; the band
    * join is key-partitioned; verification semi-joins the corpus down
    * to candidate ids before any shingle set is re-materialized
    * (bounded by candidates, not the corpus).
    */
  private def contaminationFuzzy(s: SparkSession, dir: String): DataFrame = {
    import graft.dedup.MinHashDedup
    val threshold = 0.5
    val bandRows = 2
    val numPerms = 128
    val assigned = Tables(s, dir, "documents")
      .withColumn("bucket", hashBucket("split:", 100))
    val train = assigned.filter(col("bucket") < 80)
      .select(col("doc_id"), col("text"))
    val test = assigned.filter(col("bucket") >= 90)
      .select(col("doc_id"), col("text"))
    def bands(docs: DataFrame): DataFrame =
      MinHashDedup.signatures(docs, "doc_id", "text")
        .select(col("id"),
          posexplode(transform(
            sequence(lit(0), lit(numPerms / bandRows - 1)),
            b => xxhash64(b, slice(col("sig"), b * bandRows + 1,
              lit(bandRows)))))
            .as(Seq("band", "band_key")))
    val cands = bands(test)
      .select(col("id").as("id_a"), col("band"), col("band_key"))
      .join(bands(train)
        .select(col("id").as("id_b"), col("band"), col("band_key")),
        Seq("band", "band_key"))
      .select(col("id_a"), col("id_b")).distinct()
    val verified = MinHashDedup.verifiedPairs(
      assigned, cands, "doc_id", "text", threshold)
    val agg = verified.groupBy(col("id_a"))
      .agg(count(lit(1)).as("n_train_matches"),
        max(col("jaccard")).as("best_jaccard"))
    val culprit = verified
      .join(agg.select(col("id_a"), col("best_jaccard")), "id_a")
      .filter(col("jaccard") === col("best_jaccard"))
      .groupBy(col("id_a")).agg(min(col("id_b")).as("contaminated_by"))
    test.select(col("doc_id"))
      .join(agg.withColumnRenamed("id_a", "doc_id"), Seq("doc_id"), "left")
      .join(culprit.withColumnRenamed("id_a", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_train_matches"), lit(0L)).as("n_train_matches"),
        col("best_jaccard"), col("contaminated_by"))
      .orderBy(col("doc_id"))
  }

  private val contaminationFuzzySql =
    s"""WITH assigned AS (
       |  SELECT doc_id, text, ${bucketSql("split:", 100)} AS bucket
       |  FROM documents),
       |ts AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    range(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1] || ' ' ||
       |    ws[i+2]))) AS g
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws
       |        FROM assigned WHERE bucket >= 90)
       |  WHERE len(ws) >= 3),
       |tr AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    range(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1] || ' ' ||
       |    ws[i+2]))) AS g
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws
       |        FROM assigned WHERE bucket < 80)
       |  WHERE len(ws) >= 3),
       |st AS (SELECT doc_id, count(*) AS n FROM ts GROUP BY 1),
       |sr AS (SELECT doc_id, count(*) AS n FROM tr GROUP BY 1),
       |j AS (
       |  SELECT tid, rid, CAST(ni AS DOUBLE) / (st.n + sr.n - ni) AS jac
       |  FROM (SELECT t.doc_id AS tid, r.doc_id AS rid, count(*) AS ni
       |        FROM ts t JOIN tr r USING (g) GROUP BY 1, 2)
       |    JOIN st ON tid = st.doc_id JOIN sr ON rid = sr.doc_id
       |  WHERE CAST(ni AS DOUBLE) / (st.n + sr.n - ni) >= 0.5),
       |agg AS (
       |  SELECT tid, count(*) AS n_train_matches, max(jac) AS best_jaccard
       |  FROM j GROUP BY 1),
       |culprit AS (
       |  SELECT j.tid, min(rid) AS contaminated_by
       |  FROM j JOIN agg USING (tid) WHERE jac = best_jaccard GROUP BY 1)
       |SELECT a.doc_id,
       |  CAST(coalesce(n_train_matches, 0) AS BIGINT) AS n_train_matches,
       |  best_jaccard, contaminated_by
       |FROM (SELECT doc_id FROM assigned WHERE bucket >= 90) a
       |  LEFT JOIN agg ON a.doc_id = agg.tid
       |  LEFT JOIN culprit ON a.doc_id = culprit.tid
       |ORDER BY a.doc_id""".stripMargin

  /** DSIR-style importance weights (Data Selection via Importance
    * Resampling, Xie et al. 2023): score every raw document by how
    * much its hashed-unigram distribution looks like a target domain
    * — here the `lang = 'en'` slice — via the add-one-smoothed
    * log-likelihood ratio ln(p_target(b) / p_raw(b)) summed over the
    * document's feature buckets. The modern data-curation primitive:
    * weights feed importance resampling of a 100 TB crawl toward a
    * small high-quality target.
    *
    * Features are Horner-hashed word buckets mod 4096 (portable
    * arithmetic — same fold in Spark `aggregate` and DuckDB
    * `list_reduce`, no engine hash involved). Per-bucket log ratios
    * quantize to BIGINT nano-nats via floor(x*1e9 + 0.5) — the
    * engine-identical IEEE computation, NOT round(), whose half-case
    * handling diverges on true decimal ties (found at sf0.1) — and
    * accumulate as exact integers, so document scores are
    * order-independent and engine-exact. Scale shape: the two bucket-count
    * aggregates partial-aggregate before their shuffles; the weight
    * table is at most 4096 rows — broadcast to a narrow per-token
    * join; one final per-doc aggregate.
    */
  private def dsirScores(s: SparkSession, dir: String): DataFrame = {
    val nBuckets = 4096
    val words = Tables(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        explode(graft.functions.TextFns.tokens(col("text"))).as("w"))
      // codegen Horner fold (same arithmetic as the oracle's
      // list_reduce; see functions.HornerHash for why not a HOF)
      .withColumn("bucket",
        graft.functions.HornerHash(col("w"), 31, nBuckets))
    // raw and target counts in ONE aggregate over the single token
    // explode (a conditional count instead of a second shuffle); the
    // corpus totals re-aggregate the <=4096-row bucket table — NOT the
    // token stream — so the documents scan happens once for counting
    // (the scoring join below is the only other pass)
    val bucketCounts = words.groupBy(col("bucket"))
      .agg(count(lit(1)).as("cr"),
        count(when(col("lang") === "en", 1)).as("ct"))
    val totals = bucketCounts.agg(
      sum(col("cr")).as("n_raw"), sum(col("ct")).as("n_tgt"))
    // per-bucket weights quantized to BIGINT nano-nats with the
    // floor(x*1e9 + 0.5) pattern, NOT round(): sf0.1 exposed a true
    // decimal TIE (sum(lw) at scale 9 divided by n=28 terminates
    // exactly on ...5 at digit 10), and engine round() disagrees on
    // ties — Spark rounds the double's exact binary expansion,
    // DuckDB rounds the x*1e9 product. floor(x+0.5) is the same IEEE
    // double computation in both engines, so it can never diverge;
    // the nano sums then accumulate as exact BIGINTs.
    val weights = bucketCounts
      .crossJoin(broadcast(totals))
      .select(col("bucket"),
        floor(log(
          ((col("ct") + 1).cast("double") /
            (col("n_tgt") + nBuckets).cast("double")) /
            ((col("cr") + 1).cast("double") /
              (col("n_raw") + nBuckets).cast("double"))) * 1e9 + 0.5)
          .cast("long").as("lw_nano"))
    words
      .join(broadcast(weights), Seq("bucket"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_tokens"),
        (floor(sum(col("lw_nano")).cast("double") / count(lit(1)) + 0.5) /
          1e9).as("dsir_score"))
      .orderBy(col("doc_id"))
  }

  private val dsirWeightsSql = {
    val bucketOf = (v: String) =>
      s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(range(1, len($v) + 1), j ->
         |        CAST(ascii(substring($v, CAST(j AS INT), 1)) AS BIGINT))),
         |      (acc, c) -> (acc * 31 + c) % 4096)""".stripMargin
    s"""WITH words AS (
       |  SELECT doc_id, lang, ${bucketOf("w")} AS bucket
       |  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
       |        FROM documents)),
       |bucket_counts AS (
       |  SELECT bucket, count(*) AS cr,
       |    count(*) FILTER (lang = 'en') AS ct
       |  FROM words GROUP BY 1),
       |totals AS (
       |  SELECT sum(cr) AS n_raw, sum(ct) AS n_tgt FROM bucket_counts),
       |weights AS (
       |  SELECT bucket,
       |    CAST(floor(ln(
       |      ((ct + 1) / CAST(n_tgt + 4096 AS DOUBLE)) /
       |      ((cr + 1) / CAST(n_raw + 4096 AS DOUBLE))) * 1e9 + 0.5)
       |      AS BIGINT) AS lw_nano
       |  FROM bucket_counts, totals)
       |SELECT doc_id, lang, count(*) AS n_tokens,
       |  floor(CAST(sum(lw_nano) AS DOUBLE) / count(*) + 0.5) / 1e9
       |    AS dsir_score
       |FROM words JOIN weights USING (bucket)
       |GROUP BY doc_id, lang ORDER BY doc_id""".stripMargin
  }

  /** DSIR step 2 — the importance RESAMPLING itself: accept document d
    * with probability exp(score_d - max_score) (self-normalized so the
    * best-matching doc is accepted with probability 1), decided by the
    * same deterministic md5 uniform the split/mix operators use. The
    * acceptance probability quantizes to 9 decimals via the
    * floor(x*1e9 + 0.5) pattern (engine-identical; exp is the usual
    * 1-ulp transcendental) and the uniform has 1e-6 granularity, so
    * the keep verdict is engine-exact. One broadcast max scalar; the
    * verdict pass is narrow over the score frame.
    */
  private def dsirResample(s: SparkSession, dir: String): DataFrame = {
    val scores = dsirScores(s, dir)
    val mx = scores.agg(max(col("dsir_score")).as("mx"))
    scores.crossJoin(broadcast(mx))
      .withColumn("u_micro", hashBucket("dsir:", 1000000))
      .withColumn("p_accept", // floor(x+0.5): engine-identical (see lw_nano)
        floor(exp(col("dsir_score") - col("mx")) * 1e9 + 0.5) / 1e9)
      .select(col("doc_id"), col("lang"), col("u_micro"), col("p_accept"),
        (col("u_micro").cast("double") / 1000000.0 < col("p_accept"))
          .as("keep"))
      .orderBy(col("doc_id"))
  }

  private val dsirResampleSql = {
    // the weights query verbatim as a CTE body (minus its ORDER BY)
    val scoresBody = dsirWeightsSql.replace("ORDER BY doc_id", "")
    s"""WITH scores AS ($scoresBody),
       |mx AS (SELECT max(dsir_score) AS mx FROM scores)
       |SELECT doc_id, lang,
       |  ${bucketSql("dsir:", 1000000)} AS u_micro,
       |  floor(exp(dsir_score - mx) * 1e9 + 0.5) / 1e9 AS p_accept,
       |  ${bucketSql("dsir:", 1000000)} / 1000000.0
       |    < floor(exp(dsir_score - mx) * 1e9 + 0.5) / 1e9 AS keep
       |FROM scores, mx ORDER BY doc_id""".stripMargin
  }

  /** Exact stratified downsampling: every language balanced to the
    * SMALLEST stratum's size by keeping each stratum's min_count
    * hash-smallest documents (salted md5 order — deterministic,
    * RNG-free, and a doc's keep/drop never depends on re-crawl order
    * within its stratum beyond the count target). The equal-size
    * output is the language-balancing step multilingual corpus recipes
    * run before mixing.
    *
    * Scale: one count aggregate (broadcast back) + one rank window
    * per stratum. With few huge strata the window's partitionBy(lang)
    * is the skew point at 100 TB — production swaps the exact rank for
    * a hash THRESHOLD chosen by distributed selection (the min_count-th
    * smallest hash, an approximate-quantile pass + exact trim), which
    * needs no single-stratum sort; the fixture-scale rank keeps the
    * oracle exact.
    */
  private def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
    val target = counts.agg(min(col("n_lang")).as("n_target"))
    docs.select(col("doc_id"), col("lang"),
        md5(concat(lit("strat:"), col("doc_id").cast("string"))
          .cast("binary")).as("hk"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("hk"), col("doc_id"))))
      .crossJoin(broadcast(target))
      .filter(col("rnk") <= col("n_target"))
      .select(col("lang"), col("rnk"), col("doc_id"))
      .orderBy(col("lang"), col("rnk"))
  }

  private val stratifiedSampleSql =
    """WITH target AS (
      |  SELECT min(n_lang) AS n_target FROM (
      |    SELECT lang, count(*) AS n_lang FROM documents GROUP BY 1)),
      |ranked AS (
      |  SELECT doc_id, lang,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY md5('strat:' || CAST(doc_id AS VARCHAR)), doc_id)
      |      AS rnk
      |  FROM documents)
      |SELECT lang, rnk, doc_id FROM ranked, target
      |WHERE rnk <= n_target ORDER BY lang, rnk""".stripMargin

  /** Token-budget allocation across sources — the planning step a
    * training-mix recipe runs BEFORE sampling: the run is budgeted in
    * TOKENS (not documents), each source gets a target share, and the
    * per-source epoch count (how many times the source repeats) is
    * capped to bound memorization. Target share here ∝ (source index
    * + 1) — a deterministic stand-in for the quality-weighted shares a
    * real recipe assigns; budget = 60% of corpus tokens; epochs capped
    * at 2. The emitted shortfall column is the signal that triggers
    * share re-balancing in the recipe loop.
    *
    * Scale shape: one map-side-combined aggregate over the corpus
    * (token counts per source — sources number in the tens, so the
    * post-shuffle state is trivially small), then O(sources)
    * arithmetic. The allocation math is double over exact integer
    * counts — identical IEEE results on both engines, rounded where
    * fractional.
    */
  private def tokenMix(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    val perSource = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(graft.functions.TextFns.tokens(col("text"))).cast("long")).as("n_tokens"))
    val totals = perSource.agg(
      sum(col("n_tokens")).as("total_tokens"),
      sum(substring(col("source"), 4, 10).cast("int") + 1).as("weight_sum"))
    val share = (substring(col("source"), 4, 10).cast("int") + 1)
      .cast("double") / col("weight_sum")
    val budget = lit(0.6) * col("total_tokens")
    val epochs = least(lit(2.0), share * budget / col("n_tokens"))
    perSource.crossJoin(broadcast(totals))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        Quant.qdec(share, 9).as("target_share"), // int/int TIE (Quant)
        Quant.qdec(epochs, 6).as("epochs"), // rational of counts (Quant)
        floor(epochs * col("n_tokens") + lit(0.5)).cast("long")
          .as("granted_tokens"),
        floor(share * budget - epochs * col("n_tokens") + lit(0.5))
          .cast("long").as("shortfall"))
      .orderBy(col("source"))
  }

  private val tokenMixSql =
    """WITH per_source AS (
      |  SELECT source, count(*) AS n_docs,
      |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY source),
      |tot AS (
      |  SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
      |    CAST(sum(CAST(substring(source, 4, 10) AS INTEGER) + 1)
      |      AS BIGINT) AS weight_sum
      |  FROM per_source)
      |SELECT source, n_docs, n_tokens,
      |  floor(CAST(CAST(substring(source, 4, 10) AS INTEGER) + 1 AS DOUBLE)
      |    / weight_sum * 1e9 + 0.5) / 1e9 AS target_share,
      |  floor(least(2.0,
      |    CAST(CAST(substring(source, 4, 10) AS INTEGER) + 1 AS DOUBLE)
      |      / weight_sum * (0.6 * total_tokens) / n_tokens)
      |    * 1e6 + 0.5) / 1e6 AS epochs,
      |  CAST(floor(least(2.0,
      |    CAST(CAST(substring(source, 4, 10) AS INTEGER) + 1 AS DOUBLE)
      |      / weight_sum * (0.6 * total_tokens) / n_tokens)
      |    * n_tokens + 0.5) AS BIGINT) AS granted_tokens,
      |  CAST(floor(
      |    CAST(CAST(substring(source, 4, 10) AS INTEGER) + 1 AS DOUBLE)
      |      / weight_sum * (0.6 * total_tokens)
      |    - least(2.0,
      |        CAST(CAST(substring(source, 4, 10) AS INTEGER) + 1 AS DOUBLE)
      |          / weight_sum * (0.6 * total_tokens) / n_tokens)
      |      * n_tokens + 0.5) AS BIGINT) AS shortfall
      |FROM per_source, tot ORDER BY source""".stripMargin

  /** Quality-rule ablation — the tuning table behind threshold
    * choices: per rule, how many docs it alone rejects (solo) and how
    * many ONLY it rejects (marginal — the docs that come back if the
    * rule is dropped). A rule with big solo but near-zero marginal is
    * redundant with the others; big marginal means the corpus size is
    * sensitive to exactly that threshold. One narrow flags projection,
    * ONE aggregate row, then a 4-row stack — per-rule counts without
    * four passes over the corpus.
    */
  private def filterAblation(s: SparkSession, dir: String): DataFrame = {
    def solo(r: String) = sum(when(!col(r), 1L).otherwise(0L))
    def marginal(r: String) = sum(when(!col(r) &&
      Seq("r_word_count", "r_mean_len", "r_stopwords", "r_diversity")
        .filter(_ != r).map(col).reduce(_ && _), 1L).otherwise(0L))
    withQualityFlags(Tables(s, dir, "documents"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(!col("keep"), 1L).otherwise(0L)).as("n_removed"),
        solo("r_word_count").as("s_wc"), marginal("r_word_count").as("m_wc"),
        solo("r_mean_len").as("s_ml"), marginal("r_mean_len").as("m_ml"),
        solo("r_stopwords").as("s_sw"), marginal("r_stopwords").as("m_sw"),
        solo("r_diversity").as("s_dv"), marginal("r_diversity").as("m_dv"))
      .select(expr("stack(4, 'diversity', s_dv, m_dv, " +
          "'mean_len', s_ml, m_ml, 'stopwords', s_sw, m_sw, " +
          "'word_count', s_wc, m_wc) " +
          "as (rule, solo_removed, marginal_removed)"),
        col("n_docs"), col("n_removed"))
      .orderBy(col("rule"))
  }

  private val filterAblationSql =
    """WITH m AS (
      |  SELECT len(ws) AS n_words,
      |    floor(CAST(list_aggregate(list_transform(ws, w -> len(w)), 'sum')
      |      AS DOUBLE) / len(ws) * 1e9 + 0.5) / 1e9 AS mean_word_len,
      |    floor(CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws)
      |      * 1e9 + 0.5) / 1e9 AS distinct_ratio,
      |    len(list_filter(ws, w -> w IN ('the','a','and','of','to')))
      |      AS n_stop
      |  FROM (SELECT string_split(text, ' ') AS ws FROM documents)),
      |f AS (
      |  SELECT n_words BETWEEN 50 AND 100000 AS r_wc,
      |    mean_word_len BETWEEN 4.0 AND 10.0 AS r_ml,
      |    n_stop >= 2 AS r_sw, distinct_ratio >= 0.45 AS r_dv
      |  FROM m),
      |a AS (
      |  SELECT count(*) AS n_docs,
      |    CAST(sum(CASE WHEN NOT (r_wc AND r_ml AND r_sw AND r_dv)
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
      |    CAST(sum(CASE WHEN NOT r_wc THEN 1 ELSE 0 END) AS BIGINT) AS s_wc,
      |    CAST(sum(CASE WHEN NOT r_wc AND r_ml AND r_sw AND r_dv
      |      THEN 1 ELSE 0 END) AS BIGINT) AS m_wc,
      |    CAST(sum(CASE WHEN NOT r_ml THEN 1 ELSE 0 END) AS BIGINT) AS s_ml,
      |    CAST(sum(CASE WHEN NOT r_ml AND r_wc AND r_sw AND r_dv
      |      THEN 1 ELSE 0 END) AS BIGINT) AS m_ml,
      |    CAST(sum(CASE WHEN NOT r_sw THEN 1 ELSE 0 END) AS BIGINT) AS s_sw,
      |    CAST(sum(CASE WHEN NOT r_sw AND r_wc AND r_ml AND r_dv
      |      THEN 1 ELSE 0 END) AS BIGINT) AS m_sw,
      |    CAST(sum(CASE WHEN NOT r_dv THEN 1 ELSE 0 END) AS BIGINT) AS s_dv,
      |    CAST(sum(CASE WHEN NOT r_dv AND r_wc AND r_ml AND r_sw
      |      THEN 1 ELSE 0 END) AS BIGINT) AS m_dv
      |  FROM f)
      |SELECT r.rule,
      |  CASE r.rule WHEN 'word_count' THEN s_wc WHEN 'mean_len' THEN s_ml
      |    WHEN 'stopwords' THEN s_sw ELSE s_dv END AS solo_removed,
      |  CASE r.rule WHEN 'word_count' THEN m_wc WHEN 'mean_len' THEN m_ml
      |    WHEN 'stopwords' THEN m_sw ELSE m_dv END AS marginal_removed,
      |  n_docs, n_removed
      |FROM a, (VALUES ('diversity'), ('mean_len'), ('stopwords'),
      |  ('word_count')) r(rule)
      |ORDER BY r.rule""".stripMargin

  /** Curriculum phases — order the corpus easiest-first for staged
    * training: a per-doc difficulty-inverse score (lexical diversity ×
    * log length, the cheap proxy curriculum recipes start from),
    * quintiled into phases 1..5 by the scale-safe chunked rank
    * ([[Events.tile5]] — exact ntile, no partition-less corpus
    * window), then per-phase composition stats. Phase 1 = highest
    * score (train first); the phase boundary moving with corpus
    * composition is WHY this is a quantile and not a fixed threshold.
    */
  private def curriculum(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    val total = docs.agg(count(lit(1)).as("n_total"))
    val scored = docs
      .withColumn("ws", split(col("text"), " "))
      .withColumn("n_words", size(col("ws")))
      .filter(col("n_words") > 0)
      .withColumn("score",
        round(size(array_distinct(col("ws"))).cast("double") /
          col("n_words") * log(col("n_words").cast("double")), 9))
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("n_words"), col("score"), col("n_total"))
    Events.tile5(scored, Seq(col("score").desc, col("doc_id")),
      -floor(col("score") * 10), "n_total", "phase")
      .groupBy(col("phase"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("score")).as("min_score"),
        max(col("score")).as("max_score"),
        sum(col("n_words").cast("long")).as("phase_tokens"))
      .orderBy(col("phase"))
  }

  private val curriculumSql =
    """WITH scored AS (
      |  SELECT doc_id, len(ws) AS n_words,
      |    round(CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws)
      |      * ln(CAST(len(ws) AS DOUBLE)), 9) AS score
      |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
      |  WHERE len(ws) > 0),
      |phased AS (
      |  SELECT *, ntile(5) OVER (ORDER BY score DESC, doc_id) AS phase
      |  FROM scored)
      |SELECT phase, count(*) AS n_docs,
      |  min(score) AS min_score, max(score) AS max_score,
      |  CAST(sum(n_words) AS BIGINT) AS phase_tokens
      |FROM phased GROUP BY phase ORDER BY phase""".stripMargin

  /** Temperature-scaled source mixing (the mT5/UL2 recipe): sampling
    * share p_i ∝ n_i^α with α = 0.7 flattens the source distribution —
    * small high-value sources get oversampled, the giant crawl gets
    * capped — and `eff_epochs` reports how many passes over each
    * source a token budget of 2× the corpus implies (the number that
    * tells you when a small source starts memorizing).
    *
    * Exactness: the only transcendental is pow(n, 0.7); its result is
    * immediately pinned to fixed-point (round ×10^6 → BIGINT), so the
    * cross-source total is an ORDER-FREE integer sum and every derived
    * ratio divides exact integers — no double-accumulation drift for
    * any source count. The per-source roll-up shuffles one row per
    * source; the totals row is a broadcast scalar.
    */
  private def temperatureMix(s: SparkSession, dir: String): DataFrame = {
    val alpha = 0.7
    val base = Tables(s, dir, "documents")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
      .withColumn("pw_fp",
        round(pow(col("n_chars").cast("double"), alpha) * 1e6)
          .cast("long"))
    val totals = base.agg(sum(col("n_chars")).as("tot"),
      sum(col("pw_fp")).as("tot_pw"))
    base.crossJoin(broadcast(totals))
      .select(col("source"), col("n_docs"), col("n_chars"),
        Quant.qdec(col("n_chars").cast("double") / col("tot"), 9)
          .as("raw_share"), // int/int ratios can TIE (Quant)
        Quant.qdec(col("pw_fp").cast("double") / col("tot_pw"), 9)
          .as("temp_share"),
        Quant.qdec(col("pw_fp").cast("double") / col("tot_pw") *
          2.0 * col("tot") / col("n_chars"), 9).as("eff_epochs"))
      .orderBy(col("source"))
  }

  private val temperatureMixSql =
    """WITH b AS (
      |  SELECT source, count(*) AS n_docs,
      |    CAST(sum(n_chars) AS BIGINT) AS n_chars,
      |    CAST(round(pow(CAST(sum(n_chars) AS DOUBLE), 0.7) * 1e6)
      |      AS BIGINT) AS pw_fp
      |  FROM documents GROUP BY source),
      |t AS (SELECT CAST(sum(n_chars) AS BIGINT) AS tot,
      |  CAST(sum(pw_fp) AS BIGINT) AS tot_pw FROM b)
      |SELECT source, n_docs, n_chars,
      |  floor(CAST(n_chars AS DOUBLE) / tot * 1e9 + 0.5) / 1e9
      |    AS raw_share,
      |  floor(CAST(pw_fp AS DOUBLE) / tot_pw * 1e9 + 0.5) / 1e9
      |    AS temp_share,
      |  floor(CAST(pw_fp AS DOUBLE) / tot_pw * 2.0 * tot / n_chars
      |    * 1e9 + 0.5) / 1e9 AS eff_epochs
      |FROM b CROSS JOIN t ORDER BY source""".stripMargin

  /** Length-bucketed batching efficiency — the padding-waste planner:
    * training batches pad every sequence to the longest in the batch,
    * so the batcher buckets documents by token length first. For each
    * candidate bucket width (16/32/64/128 tokens) this reports how
    * many pad tokens the bucketing still wastes (padding to the
    * bucket's observed max), the number the trainer trades off
    * against per-bucket batch fragmentation (n_buckets).
    *
    * Scale shape: one narrow token-count projection, a 4× literal
    * explode (constant fan-out), and two aggregations with map-side
    * combine — the first collapses to ≤ widths × buckets rows before
    * any shuffle. No window, no join. Waste ratios are double
    * divisions of exact longs.
    */
  private def padWaste(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
      .select(size(graft.functions.TextFns.tokens(col("text"))).as("n_tok"))
    docs
      .select(col("n_tok"),
        explode(array(lit(16), lit(32), lit(64), lit(128))).as("w"))
      .withColumn("bkt", expr("n_tok div w"))
      .groupBy(col("w"), col("bkt"))
      .agg(count(lit(1)).as("n"), sum(col("n_tok")).as("sum_tok"),
        max(col("n_tok")).as("max_tok"))
      .groupBy(col("w"))
      .agg(sum(col("n")).as("n_docs"), count(lit(1)).as("n_buckets"),
        sum(col("sum_tok")).as("total_tokens"),
        sum(col("n") * col("max_tok")).as("padded_tokens"))
      .select(col("w"), col("n_docs"), col("n_buckets"),
        col("total_tokens"), col("padded_tokens"),
        ((col("padded_tokens") - col("total_tokens")).cast("double") /
          col("padded_tokens")).as("waste_pct"))
      .orderBy(col("w"))
  }

  private val padWasteSql =
    """WITH d AS (
      |  SELECT len(string_split(text, ' ')) AS n_tok FROM documents),
      |e AS (SELECT n_tok, unnest([16, 32, 64, 128]) AS w FROM d),
      |b AS (
      |  SELECT w, n_tok // w AS bkt, count(*) AS n,
      |    sum(n_tok) AS sum_tok, max(n_tok) AS max_tok
      |  FROM e GROUP BY w, bkt)
      |SELECT w, CAST(sum(n) AS BIGINT) AS n_docs, count(*) AS n_buckets,
      |  CAST(sum(sum_tok) AS BIGINT) AS total_tokens,
      |  CAST(sum(n * max_tok) AS BIGINT) AS padded_tokens,
      |  CAST(sum(n * max_tok) - sum(sum_tok) AS DOUBLE)
      |    / CAST(sum(n * max_tok) AS BIGINT) AS waste_pct
      |FROM b GROUP BY w ORDER BY w""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("cp_pad_waste", padWaste, Some(padWasteSql)),
    QueryDef("cp_temperature_mix", temperatureMix, Some(temperatureMixSql)),
    QueryDef("cp_curriculum", curriculum, Some(curriculumSql)),
    QueryDef("cp_filter_ablation", filterAblation, Some(filterAblationSql)),
    QueryDef("cp_token_mix", tokenMix, Some(tokenMixSql)),
    QueryDef("cp_stratified_sample", stratifiedSample,
      Some(stratifiedSampleSql)),
    QueryDef("cp_dsir_weights", dsirScores, Some(dsirWeightsSql)),
    QueryDef("cp_dsir_resample", dsirResample, Some(dsirResampleSql)),
    QueryDef("cp_contamination", contamination, Some(contaminationSql)),
    QueryDef("cp_contamination_stream", contaminationIngestStream,
      Some(contaminationIngestStreamSql)),
    QueryDef("cp_bloom_gate", bloomGate,
      Some(contaminationIngestStreamSql)),
    QueryDef("cp_cluster_balanced_sample", clusterBalancedSample,
      Some(clusterBalancedSampleSql)),
    QueryDef("cp_contamination_spans", contaminationSpans,
      Some(contaminationSpansSql)),
    QueryDef("cp_contamination_fuzzy", contaminationFuzzy,
      Some(contaminationFuzzySql)),
    QueryDef("cp_contamination_matrix", contaminationMatrix,
      Some(contaminationMatrixSql)),
    QueryDef("cp_chunk", chunk, Some(chunkSql)),
    QueryDef("cp_sequence_pack", sequencePack, Some(sequencePackSql)),
    QueryDef("cp_shard_manifest", shardManifest, Some(shardManifestSql)),
    QueryDef("cp_pipeline_from_config", pipelineFromConfig,
      Some(pipelineFromConfigSql)),
    QueryDef("cp_curation_pipeline", curationPipeline,
      Some(curationPipelineSql)),
    QueryDef("cp_hash_split", hashSplit, Some(hashSplitSql)),
    QueryDef("cp_quality_filter", qualityFilter, Some(qualityFilterSql)),
    QueryDef("cp_quality_ingest_stream", qualityIngestStream,
      Some(qualityFilterSql)),
    QueryDef("cp_source_mix", sourceMix, Some(sourceMixSql)),
    QueryDef("cp_reservoir_sample", reservoirSample,
      Some(reservoirSampleSql)),
    QueryDef("cp_dedup_weighted_sample", dedupWeightedSample,
      Some(dedupWeightedSampleSql)),
    QueryDef("cp_mix_entropy", mixEntropy, Some(mixEntropySql)),
    QueryDef("cp_upsample", upsample, Some(upsampleSql)),
    QueryDef("cp_interleave", interleave, Some(interleaveSql)),
    QueryDef("cp_ngram_repetition", ngramRepetition, Some(ngramRepetitionSql)),
    QueryDef("cp_corpus_shuffle", corpusShuffle, Some(corpusShuffleSql)))
}
