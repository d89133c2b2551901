package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental ingest dedup — the production pattern behind the
  * `dd_incremental` query: every new crawl batch is screened against
  * everything already ACCEPTED, and the accepted set itself is never
  * re-paired. The accepted side lives as two persisted artifacts
  * (content fingerprints + shingle postings), so each ingest round
  * loads them, screens the (small) batch, and merges the keepers back:
  *
  *   artifacts → save ─┐
  *                     ├→ screen(batch) → verdicts → accept(kept) → save
  *   load ─────────────┘
  *
  * Screening layers, same as a real ingest gate:
  *   1. exact — md5(content) equality against any accepted doc, or an
  *      earlier (smaller-id) batch doc;
  *   2. near — shingle-Jaccard >= threshold via one inverted-index
  *      bucket pass over accepted ∪ batch postings. A batch doc pairs
  *      with EVERY accepted doc in the bucket (id order irrelevant —
  *      the accepted set always wins) and with earlier batch docs;
  *      accepted–accepted pairs are never generated.
  *
  * Scale shape: the postings artifact is the big side and it is ONLY
  * read and bucket-joined — the quadratic term is bounded by batch
  * bucket occupancy, not corpus size. The same hot-shingle cap as
  * `dd_ngram_jaccard` applies (buckets over `maxShingleDf` are dropped
  * whole, with the identical exactness contract: a pair missed this
  * way is boilerplate the exact layer already catches).
  */
object IncrementalDedup {

  /** The persisted accepted-set state: `fingerprints` (id, fp) and
    * `shingles` postings (id, g, n) where n is the doc's shingle-set
    * size (carried per row so screening never rescans content).
    */
  final case class Artifacts(fingerprints: DataFrame, shingles: DataFrame)

  /** Build artifacts from a document frame. */
  def artifacts(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3): Artifacts = {
    val fps = docs.select(col(idCol).as("id"),
      md5(col(textCol).cast("binary")).as("fp"))
    val sh = docs
      .select(col(idCol).as("id"),
        graft.functions.WordShingles(col(textCol), shingleK).as("gs"))
      .filter(size(col("gs")) > 0)
      .select(col("id"), size(col("gs")).as("n"),
        explode(col("gs")).as("g"))
      .select(col("id"), col("g"), col("n"))
    Artifacts(fps, sh)
  }

  def save(a: Artifacts, path: String): Unit = {
    a.fingerprints.write.mode("overwrite").parquet(s"$path/fingerprints")
    a.shingles.write.mode("overwrite").parquet(s"$path/shingles")
  }

  def load(spark: SparkSession, path: String): Artifacts =
    Artifacts(spark.read.parquet(s"$path/fingerprints"),
      spark.read.parquet(s"$path/shingles"))


  /** Screen a batch against the accepted artifacts. Returns one row
    * per batch doc: (id, exact_of, near_of, keep) — `exact_of` /
    * `near_of` are the smallest qualifying prior doc (accepted docs
    * and earlier batch docs all qualify), null if none.
    */
  def screen(batch: DataFrame, accepted: Artifacts,
      idCol: String, textCol: String, threshold: Double = 0.5,
      shingleK: Int = 3, maxShingleDf: Int = 64): DataFrame = {
    val b = artifacts(batch, idCol, textCol, shingleK)

    // exact layer: batch fp vs accepted fp (any) ∪ earlier batch fp
    val priorFps =
      accepted.fingerprints.select(col("id"), col("fp"),
          lit(true).as("acc"))
        .unionByName(b.fingerprints.select(col("id"), col("fp"),
          lit(false).as("acc")))
    val exactOf = b.fingerprints.select(col("id").as("b_id"), col("fp"))
      .join(priorFps.select(col("id").as("a_id"), col("fp"), col("acc")),
        Seq("fp"))
      .filter(col("acc") || col("a_id") < col("b_id"))
      .groupBy(col("b_id")).agg(min(col("a_id")).as("exact_of"))

    // near layer: ONE bucket pass over tagged postings. Pairs are
    // (prior → batch): later side must be a batch doc; the earlier
    // side is any accepted doc or a smaller-id batch doc. Buckets no
    // batch shingle touches can never pair, so the accepted postings
    // are semi-joined down to batch-touched shingles FIRST — the
    // shuffle is bounded by the batch's bucket footprint, not the
    // corpus (retained buckets keep ALL their accepted entries, so
    // pair output and the df cap are untouched).
    val batchGrams = b.shingles.select(col("g")).distinct()
    val tagged =
      accepted.shingles.join(batchGrams, Seq("g"), "left_semi")
        .select(col("g"),
          struct(col("id"), col("n"), lit(false).as("isb")).as("e"))
        .unionByName(b.shingles.select(col("g"),
          struct(col("id"), col("n"), lit(true).as("isb")).as("e")))
    // Emission shape measured, not assumed (r16): a 2-field pair
    // struct with the doc sizes joined from a dim AFTER the count
    // looked 2× faster in isolation, but in the full screen the dim
    // re-executes the semi-joined postings pipeline twice more and
    // adds two exchanges — full-ingest median regressed 7.3 → 10.4 s.
    // Carrying n on every emitted pair keeps the near layer a single
    // self-contained aggregation tree; it stays.
    val pairs = tagged
      .groupBy(col("g")).agg(collect_list(col("e")).as("ds"))
      .filter(size(col("ds")).between(2, maxShingleDf))
      .select(explode(flatten(transform(col("ds"), bb =>
        transform(
          filter(col("ds"), aa => bb("isb") &&
            (!aa("isb") || aa("id") < bb("id"))),
          aa => struct(aa("id").as("a_id"), aa("n").as("na"),
            bb("id").as("b_id"), bb("n").as("nb")))))).as("p"))
      .select(col("p.a_id"), col("p.na"), col("p.b_id"), col("p.nb"))
    val nearOf = pairs
      .groupBy(col("a_id"), col("na"), col("b_id"), col("nb"))
      .agg(count(lit(1)).as("n_inter"))
      .filter(col("n_inter").cast("double") /
        (col("na") + col("nb") - col("n_inter")) >= threshold)
      .groupBy(col("b_id")).agg(min(col("a_id")).as("near_of"))

    batch.select(col(idCol).as("b_id"))
      .join(exactOf, Seq("b_id"), "left")
      .join(nearOf, Seq("b_id"), "left")
      .select(col("b_id").as("id"), col("exact_of"), col("near_of"),
        (col("exact_of").isNull && col("near_of").isNull).as("keep"))
      .orderBy(col("id"))
  }

  /** Merge the kept batch docs into the accepted artifacts (the next
    * round's screen input). Callers persist via `save` between rounds.
    */
  def accept(a: Artifacts, keptBatch: DataFrame, idCol: String,
      textCol: String, shingleK: Int = 3): Artifacts = {
    val k = artifacts(keptBatch, idCol, textCol, shingleK)
    Artifacts(a.fingerprints.unionByName(k.fingerprints),
      a.shingles.unionByName(k.shingles))
  }

  /** LSM-style maintenance for delta-published artifact state (the
    * `streaming.IncrementalIngest` layout — `d0` seed + one delta per
    * ingested batch): fold every delta into ONE artifact set at
    * `outPath`. Run periodically so reader-side fan-in (one parquet
    * listing per delta) stays bounded.
    *
    * Semantics: the row-DISTINCT union. Deltas are disjoint by
    * construction (each doc is accepted exactly once), so normally
    * this is plain concatenation — but when a retry anomaly DID
    * double-publish a doc, distinct restores the state a single
    * publish would have left (duplicate postings would otherwise
    * double-count bucket intersections in screen's near layer).
    * Screening against the compacted set is row-for-row the same as
    * against the delta union on both shapes (IncrementalIngestSpec).
    *
    * Durability: writes land in a sibling `.compact-tmp` directory and
    * publish via ONE atomic rename — a crash mid-compaction leaves the
    * raw deltas untouched and the target absent (a stale tmp from a
    * crashed run is deleted and rebuilt on retry), so readers can
    * never observe a partial compacted artifact. The target must not
    * already exist: compaction never overwrites published state in
    * place — the caller swaps its delta list to the new path only
    * after this returns, and deleting (or keeping) the old deltas is a
    * separate, already-safe step.
    */
  def compact(spark: SparkSession, deltaPaths: Seq[String],
      outPath: String): Artifacts = {
    require(deltaPaths.nonEmpty, "compact needs at least one delta")
    val target = java.nio.file.Paths.get(outPath)
    require(!java.nio.file.Files.exists(target),
      s"compact: target $outPath already exists — compaction never " +
        "overwrites published state in place")
    val merged = deltaPaths.map(p => load(spark, p))
      .reduce((x, y) => Artifacts(
        x.fingerprints.unionByName(y.fingerprints),
        x.shingles.unionByName(y.shingles)))
    val tmp = target.resolveSibling(target.getFileName.toString +
      ".compact-tmp")
    org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
    save(Artifacts(merged.fingerprints.distinct(),
      merged.shingles.distinct()), tmp.toString)
    java.nio.file.Files.move(tmp, target,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    load(spark, outPath)
  }
}
