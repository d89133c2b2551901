package graft.corpus

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reusable corpus-curation pipeline — the library surface behind the
  * `cp_curation_pipeline` query, staged the way a training-data build
  * consumes it:
  *
  *   qualityFilter → dedupExact → withSplit → splitStats
  *
  * Each stage is an independent DataFrame transform with the original
  * schema preserved (stats excepted), so a production run can persist
  * between stages and resume. All decisions are deterministic
  * functions of row content — no RNG, no partition-order dependence:
  * the split is a salted md5 bucket of the id, the dedup survivor is
  * the minimum id per identical text, and the quality rules are
  * per-row arithmetic. Re-running any stage on a re-ingested corpus
  * reproduces the same decisions row for row.
  *
  * Scale shape: qualityFilter is narrow; dedupExact is one hash
  * aggregation on the text key (the shuffle carries (text-hash,
  * min-id) once partial aggregation kicks in) plus a semi-join back;
  * withSplit is narrow; splitStats shuffles one row per split.
  */
object CorpusPipeline {

  /** Gopher-family quality rules: repetition (repeated-5-gram ratio)
    * and lexical diversity (distinct-word ratio). Returns the kept
    * rows with the original schema.
    *
    * NOTE: documents shorter than 5 words are ALWAYS dropped (the
    * `total5 > 0` conjunct) — the Gopher-style minimum-length rule,
    * applied regardless of the threshold parameters. A short-document
    * corpus (tweets, titles) needs a different filter; the rule is
    * also what the `cp_curation_pipeline` oracle replicates.
    */
  def qualityFilter(docs: DataFrame, textCol: String,
      maxRepeated5gramRatio: Double = 0.2,
      minDistinctWordRatio: Double = 0.5): DataFrame = {
    val ws = split(col(textCol), " ")
    val total5 = greatest(size(ws) - 4, lit(0))
    val dist5 = size(graft.functions.WordShingles(col(textCol), 5))
    val nWords = size(ws)
    val nDistinct = size(array_distinct(ws))
    docs.filter(total5 > 0 &&
      (lit(1.0) - dist5.cast("double") / total5) <= maxRepeated5gramRatio &&
      nDistinct.cast("double") / nWords >= minDistinctWordRatio)
  }

  /** Exact dedup: keep the minimum-`idCol` row per identical
    * `textCol`. Original schema preserved.
    */
  def dedupExact(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keepers = docs.groupBy(col(textCol).as("__text"))
      .agg(min(col(idCol)).as(idCol))
      .select(col(idCol))
    docs.join(keepers, Seq(idCol), "left_semi")
  }

  /** Salted md5 hash bucket in [0, mod) — identical arithmetic on
    * DuckDB (`CAST('0x' || substring(md5(...), 1, 6) AS BIGINT)`), so
    * oracle checks and cross-engine consumers agree bucket for bucket.
    */
  def hashBucket(idCol: String, salt: String, mod: Int): Column =
    conv(substring(md5(concat(lit(salt),
      col(idCol).cast("string")).cast("binary")), 1, 6), 16, 10)
      .cast("long") % mod

  /** Stable train/validation/test assignment by hash bucket: a
    * document's split never depends on what else is in the corpus.
    * Adds a `split` column.
    */
  def withSplit(docs: DataFrame, idCol: String,
      trainPct: Int = 80, validationPct: Int = 10,
      salt: String = "split:"): DataFrame =
    docs.withColumn("split", {
      val bucket = hashBucket(idCol, salt, 100)
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + validationPct, "validation")
        .otherwise("test")
    })

  /** Per-split corpus stats: document count, total characters, first
    * document id.
    */
  def splitStats(docs: DataFrame, idCol: String,
      charsCol: String): DataFrame =
    docs.groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(charsCol)).cast("long").as("total_chars"),
        min(col(idCol)).as("first_doc"))
      .orderBy(col("split"))
}
