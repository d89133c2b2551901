package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of near-dup CONNECTED-COMPONENT labels —
  * the operation a crawl pipeline runs daily: a new ingest batch
  * arrives, its near-dup pairs against the accepted corpus are found
  * (batch-bounded, the [[IncrementalDedup]] contract), and the
  * component labels are updated WITHOUT re-running CC over the full
  * pair graph. Only components actually TOUCHED by a delta edge are
  * relabeled; everything else carries forward by reference.
  *
  * The state is LSM-style DELTA artifacts, all plain parquet, each
  * written once and never rewritten (a batch writes O(batch/touched),
  * never O(corpus)):
  *   - postings deltas (doc_id, n, g): one file set per batch — the
  *     accepted corpus's inverted index is the multi-path READ of all
  *     deltas (compact the chain periodically, the
  *     IncrementalDedup.compact story);
  *   - label deltas (retired component ids + relabeled rows): the
  *     current label view folds the chain in arrival order
  *     ([[applyDelta]]); labels are (doc_id, component), component =
  *     min member doc_id (the dd_components convention — only docs
  *     participating in at least one pair are labeled).
  *
  * Correctness rests on two order-confluence facts, which is also why
  * the oracle can be the FULL-graph fixpoint rather than a staged
  * replay: (1) connectivity is monotone — the components of an edge
  * union don't depend on arrival order; (2) an old component is
  * faithfully summarized by STAR edges (root, member), because its
  * members are already known connected — so the per-batch relabel runs
  * CC over delta edges + the touched components' stars, a graph
  * bounded by |batch pairs| + |touched members|, never the corpus.
  *
  * Scale shape per ingest: the postings artifact is scanned ONCE and
  * semi-joined down to the batch's gram footprint before anything
  * shuffles (the IncrementalDedup plan shape); bucket pair emission is
  * capped at `maxShingleDf` like the corpus-wide pair build. Cap
  * precision: a stage-local bucket is a SUBSET of the global bucket,
  * so the incremental path never drops a pair the fixture-green
  * uncapped oracle has where the global build kept it — but on a
  * corpus where a bucket exceeds the cap globally while staying under
  * it stage-locally, the incremental union can keep pairs the
  * batch-global capped build drops (it sits CLOSER to the uncapped
  * oracle, not further). The cap contract is inherited from
  * dd_ngram_jaccard either way: a pair lost to a hot-bucket cap is
  * boilerplate the exact layer already catches. The CC rerun touches
  * delta edges + star edges only; relabeling cost is bounded by the
  * batch's blast radius — the daily-ingest contract the batch-global
  * dd_components can't offer.
  */
object IncrementalComponents {

  /** Distinct-shingle postings with per-doc set sizes: (doc_id, n, g).
    * Docs with fewer than k words carry no postings (WordShingles
    * yields an empty set — the dd_ngram_jaccard convention).
    */
  def postings(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        graft.functions.WordShingles(col(textCol), shingleK).as("gs"))
      .filter(size(col("gs")) > 0)
      .select(col("doc_id"), size(col("gs")).as("n"),
        explode(col("gs")).as("g"))

  /** Jaccard-threshold pairs WITHIN one postings set (the initial
    * build): bucket by gram, emit each bucket's (lo, hi) pairs, count
    * shared grams, keep J ≥ threshold. Buckets above `maxShingleDf`
    * drop whole — the cachedScoredPairs contract. This is a sibling of
    * queries.Dedup.cachedScoredPairs (struct-carried sizes here vs a
    * sizes join there — this shape serves the delta variant below);
    * both are pinned to the same uncapped recursive-CTE oracle, so a
    * drift between the twins reds the gate rather than hiding.
    */
  def pairsWithin(posts: DataFrame, threshold: Double,
      maxShingleDf: Int = 64): DataFrame = {
    val buckets = posts
      .groupBy(col("g"))
      .agg(collect_list(struct(col("doc_id"), col("n"))).as("ds"))
      .filter(size(col("ds")).between(2, maxShingleDf))
    scorePairs(buckets
      .select(explode(flatten(transform(col("ds"), a =>
        transform(filter(col("ds"), b => b("doc_id") > a("doc_id")),
          b => struct(a("doc_id").as("doc_a"), a("n").as("na"),
            b("doc_id").as("doc_b"), b("n").as("nb")))))).as("p")),
      threshold)
  }

  /** Jaccard-threshold DELTA pairs: every pair touching the batch
    * (batch–accepted and batch–batch), never accepted–accepted. The
    * accepted postings make one scan, semi-joined to the batch's gram
    * footprint before the bucket shuffle — cost is bounded by the
    * batch's bucket occupancy, not the corpus.
    */
  def deltaPairs(accepted: DataFrame, batch: DataFrame,
      threshold: Double, maxShingleDf: Int = 64): DataFrame = {
    val footprint = batch.select(col("g")).distinct()
    val pruned = accepted.join(footprint, Seq("g"), "left_semi")
      .withColumn("isb", lit(false))
    val union = pruned.unionByName(batch.withColumn("isb", lit(true)))
    val buckets = union
      .groupBy(col("g"))
      .agg(collect_list(
        struct(col("doc_id"), col("n"), col("isb"))).as("ds"))
      .filter(size(col("ds")).between(2, maxShingleDf))
    scorePairs(buckets
      .select(explode(flatten(transform(col("ds"), a =>
        transform(filter(col("ds"), b =>
          b("doc_id") > a("doc_id") && (a("isb") || b("isb"))),
          b => struct(a("doc_id").as("doc_a"), a("n").as("na"),
            b("doc_id").as("doc_b"), b("n").as("nb")))))).as("p")),
      threshold)
  }

  private def scorePairs(exploded: DataFrame,
      threshold: Double): DataFrame =
    exploded
      .select(col("p.doc_a"), col("p.na"), col("p.doc_b"), col("p.nb"))
      .groupBy(col("doc_a"), col("na"), col("doc_b"), col("nb"))
      .agg(count(lit(1)).as("n_inter"))
      .filter(col("n_inter").cast("double") /
        (col("na") + col("nb") - col("n_inter")) >= threshold)
      .select(col("doc_a"), col("doc_b"))

  /** One ingest round in DELTA form — the artifacts a batch actually
    * WRITES, each O(touched), never O(all labels): `retired` is the
    * set of component ids whose labels are superseded, `relabeled`
    * the fresh labels for the touched subgraph (delta edges + star
    * summaries of the retired components + new batch nodes). The
    * current label view is `labels anti-join retired ∪ relabeled` —
    * see [[applyDelta]]; a chain of deltas folds in arrival order
    * (time-aware: a component id retired at stage k can be recreated
    * by stage k's own relabel, the min-member-id convention), and
    * periodic compaction of the chain is the same
    * `IncrementalDedup.compact` story as the ingest tier.
    */
  def relabelDelta(labels: DataFrame,
      delta: DataFrame): (DataFrame, DataFrame) = {
    val ends = delta.select(col("doc_a").as("doc_id"))
      .unionByName(delta.select(col("doc_b").as("doc_id")))
      .distinct()
    // retired is consumed at least twice by every caller (the star
    // summary below, the artifact write, the applyDelta anti-join) and
    // is bounded by the batch's touched-component count — pin it so
    // the labels semi-join runs once per ingest, not once per consumer
    // (alternatingStars already runs eager jobs here, so pinning adds
    // no new eagerness to this call)
    val retired = labels.join(ends, Seq("doc_id"), "left_semi")
      .select(col("component")).distinct()
      .localCheckpoint()
    // star summary: an old component is already connected, so edges
    // (root, member) reproduce its connectivity without its pair graph
    val stars = labels
      .join(retired, Seq("component"), "left_semi")
      .filter(col("doc_id") =!= col("component"))
      .select(col("component").as("doc_a"), col("doc_id").as("doc_b"))
    val sub = delta.select(col("doc_a"), col("doc_b")).unionByName(stars)
    // relabeled (bounded by the touched subgraph) is likewise consumed
    // by both the artifact write and the view fold — pin it too
    val relabeled = ConnectedComponents.alternatingStars(sub)
      .select(col("node").as("doc_id"), col("component"))
      .localCheckpoint()
    (retired, relabeled)
  }

  /** Fold one delta onto a label view: untouched labels pass through
    * the anti-join by reference, the relabeled subgraph replaces the
    * retired components.
    */
  def applyDelta(labels: DataFrame, retired: DataFrame,
      relabeled: DataFrame): DataFrame =
    labels.join(retired, Seq("component"), "left_anti")
      .select(col("doc_id"), col("component"))
      .unionByName(relabeled)

  /** One ingest round, materialized form (delta + apply in one call —
    * for callers that want the full view back).
    */
  def relabel(labels: DataFrame, delta: DataFrame): DataFrame = {
    val (retired, relabeled) = relabelDelta(labels, delta)
    applyDelta(labels, retired, relabeled)
  }
}
