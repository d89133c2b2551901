package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.TextFns
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table: token counting,
  * quality scoring, n-gram language ID, document fingerprinting, and
  * word/bigram frequency — the per-document metrics an LLM-data
  * pipeline computes before filtering/dedup.
  *
  * Scale notes: every query is a narrow map or a single
  * aggregate-after-explode; filters/projections push into the scan.
  * At 100 TB the explode-based frequency queries shuffle only (word,
  * partial-count) pairs thanks to map-side combine.
  *
  * Exactness: ratios are double divisions of integers (deterministic —
  * same operands, same IEEE result in Spark and DuckDB); weighted
  * score formulas use only int-derived doubles and literal
  * coefficients. No order-dependent double accumulation anywhere.
  */
object TextAnalysis {

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Per-document token statistics. */
  private def tokenStats(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "documents")
      .withColumn("ws", TextFns.tokens(col("text")))
      .select(
        col("doc_id"),
        size(col("ws")).as("n_tokens"),
        size(array_distinct(col("ws"))).as("n_distinct"),
        length(col("text")).as("len_chars"),
        // single-space separated => token chars = len - (n-1)
        ((length(col("text")) - size(col("ws")) + 1).cast("double") /
          size(col("ws"))).as("avg_token_len"))
      .orderBy(col("doc_id"))
  }

  private val tokenStatsSql =
    """SELECT doc_id,
      |  len(string_split(text, ' ')) AS n_tokens,
      |  len(list_distinct(string_split(text, ' '))) AS n_distinct,
      |  length(text) AS len_chars,
      |  CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
      |    / len(string_split(text, ' ')) AS avg_token_len
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Heuristic quality score in [0,1]: length saturation + stopword
    * density + lexical diversity, the standard pre-training quality
    * triplet.
    */
  private def quality(s: SparkSession, dir: String): DataFrame = {
    val stopArr = array(stopwords.map(lit): _*)
    Tables(s, dir, "documents")
      .withColumn("ws", TextFns.tokens(col("text")))
      .withColumn("n_stop",
        size(filter(col("ws"), w => array_contains(stopArr, w))))
      .select(
        col("doc_id"),
        col("n_stop"),
        round(
          lit(0.5) * least(size(col("ws")).cast("double") / 100.0, lit(1.0)) +
            lit(0.3) * (col("n_stop").cast("double") / size(col("ws"))) +
            lit(0.2) * (size(array_distinct(col("ws"))).cast("double") /
              size(col("ws"))),
          6).as("quality"))
      .orderBy(col("doc_id"))
  }

  private val qualitySql =
    s"""SELECT doc_id, n_stop,
       |  round(0.5 * least(CAST(n_tok AS DOUBLE) / 100.0, 1.0)
       |      + 0.3 * (CAST(n_stop AS DOUBLE) / n_tok)
       |      + 0.2 * (CAST(n_dis AS DOUBLE) / n_tok), 6) AS quality
       |FROM (
       |  SELECT doc_id,
       |    len(list_filter(string_split(text, ' '),
       |        w -> w IN (${stopwords.map(w => s"'$w'").mkString(", ")}))) AS n_stop,
       |    len(string_split(text, ' ')) AS n_tok,
       |    len(list_distinct(string_split(text, ' '))) AS n_dis
       |  FROM documents)
       |ORDER BY doc_id""".stripMargin

  /** Stopword-profile language ID (n-gram heuristic): score each
    * candidate language by its marker-token hits; argmax with a fixed
    * tie-break order. The fixture vocabulary is shared across langs,
    * so accuracy is incidental — the operator's plumbing (per-language
    * scoring + deterministic argmax) is what's exercised.
    */
  private def langId(s: SparkSession, dir: String): DataFrame = {
    val markers = Seq(
      "en" -> Seq("the", "a", "and", "of"),
      "de" -> Seq("der", "die", "und", "das"),
      "es" -> Seq("el", "la", "los", "que"),
      "fr" -> Seq("le", "la", "les", "des"),
      "zh" -> Seq("de", "shi", "le", "zai"))
    val base = Tables(s, dir, "documents")
      .withColumn("ws", TextFns.tokens(col("text")))
    val scored = markers.foldLeft(base) { case (df, (lang, ms)) =>
      val arr = array(ms.map(lit): _*)
      df.withColumn(s"s_$lang",
        size(filter(col("ws"), w => array_contains(arr, w))))
    }
    val best = markers.map(_._1).map(l => col(s"s_$l"))
      .reduce((a, b) => greatest(a, b))
    val pred = markers.map(_._1).foldRight(lit("und")) {
      case (lang, els) => when(col(s"s_$lang") === best, lit(lang)).otherwise(els)
    }
    // foldRight gives priority to the FIRST language in marker order on
    // ties (en > de > es > fr > zh), matching the oracle's CASE chain.
    scored.select(col("doc_id"), col("s_en"), col("s_de"), col("s_es"),
        col("s_fr"), col("s_zh"), pred.as("lang_pred"),
        (pred === col("lang")).as("is_correct"))
      .orderBy(col("doc_id"))
  }

  private val langIdSql = {
    val markers = Seq(
      "en" -> Seq("the", "a", "and", "of"),
      "de" -> Seq("der", "die", "und", "das"),
      "es" -> Seq("el", "la", "los", "que"),
      "fr" -> Seq("le", "la", "les", "des"),
      "zh" -> Seq("de", "shi", "le", "zai"))
    val scoreCols = markers.map { case (l, ms) =>
      s"len(list_filter(ws, w -> w IN (${ms.map(m => s"'$m'").mkString(", ")}))) AS s_$l"
    }.mkString(",\n    ")
    val best = "greatest(s_en, s_de, s_es, s_fr, s_zh)"
    val caseChain = markers.map(_._1)
      .map(l => s"WHEN s_$l = $best THEN '$l'").mkString(" ")
    s"""SELECT doc_id, s_en, s_de, s_es, s_fr, s_zh,
       |  CASE $caseChain ELSE 'und' END AS lang_pred,
       |  (CASE $caseChain ELSE 'und' END) = lang AS is_correct
       |FROM (
       |  SELECT doc_id, lang,
       |    $scoreCols
       |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents))
       |ORDER BY doc_id""".stripMargin
  }

  /** Content-hash fingerprints: raw and whitespace-normalized md5 +
    * sha256 — the exact-dedup keys.
    */
  private def fingerprint(s: SparkSession, dir: String): DataFrame = {
    val norm = regexp_replace(lower(col("text")), "\\s+", " ")
    Tables(s, dir, "documents")
      .select(
        col("doc_id"),
        md5(col("text").cast("binary")).as("md5_fp"),
        md5(norm.cast("binary")).as("md5_norm_fp"),
        sha2(col("text").cast("binary"), 256).as("sha256_fp"))
      .orderBy(col("doc_id"))
  }

  private val fingerprintSql =
    """SELECT doc_id,
      |  md5(text) AS md5_fp,
      |  md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS md5_norm_fp,
      |  sha256(text) AS sha256_fp
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Corpus-level word frequency, top 20. Map-side combine keeps the
    * shuffle tiny at scale; the explode never materializes row copies
    * thanks to whole-stage codegen.
    */
  private def wordTopK(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "documents")
      .select(explode(TextFns.tokens(col("text"))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(20)
  }

  private val wordTopKSql =
    """SELECT word, count(*) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |GROUP BY word ORDER BY n DESC, word LIMIT 20""".stripMargin

  /** Corpus-level bigram frequency, top 15. */
  private def bigramTopK(s: SparkSession, dir: String): DataFrame = {
    val ws = TextFns.tokens(col("text"))
    Tables(s, dir, "documents")
      .withColumn("ws", ws)
      .filter(size(col("ws")) >= 2)
      .select(explode(transform(
        sequence(lit(0), size(col("ws")) - 2),
        i => concat_ws(" ", element_at(col("ws"), i + 1),
          element_at(col("ws"), i + 2)))).as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(15)
  }

  private val bigramTopKSql =
    """SELECT bigram, count(*) AS n
      |FROM (
      |  SELECT unnest(list_transform(range(1, len(ws)),
      |                i -> ws[i] || ' ' || ws[i+1])) AS bigram
      |  FROM (SELECT string_split(text, ' ') AS ws FROM documents)
      |  WHERE len(ws) >= 2)
      |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 15""".stripMargin

  /** Sketch-based cardinality: HLL++ distinct-word estimates per
    * source vs the exact count. No oracle — DuckDB's approx sketch
    * differs from Spark's by design; the accompanying spec asserts the
    * estimate lands within rsd of exact. At 100 TB the sketch is the
    * only viable plan: fixed memory per group, no distinct shuffle.
    */
  private def vocabHll(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "documents")
      .select(col("source"), explode(TextFns.tokens(col("text"))).as("word"))
      .groupBy(col("source"))
      .agg(
        approx_count_distinct(col("word"), rsd = 0.02).as("approx_vocab"),
        countDistinct(col("word")).as("exact_vocab"),
        count(lit(1)).as("n_words"))
      .orderBy(col("source"))
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("ta_vocab_hll", vocabHll, None),
    QueryDef("ta_token_stats", tokenStats, Some(tokenStatsSql)),
    QueryDef("ta_quality_score", quality, Some(qualitySql)),
    QueryDef("ta_lang_id", langId, Some(langIdSql)),
    QueryDef("ta_fingerprint", fingerprint, Some(fingerprintSql)),
    QueryDef("ta_word_topk", wordTopK, Some(wordTopKSql)),
    QueryDef("ta_bigram_topk", bigramTopK, Some(bigramTopKSql)))
}
