package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reusable MinHash+LSH near-duplicate detection — the library surface
  * behind the `dd_minhash_lsh` query, staged the way a corpus pipeline
  * consumes it:
  *
  *   signatures → (persist) → candidatePairs → verifiedPairs → dedup
  *
  * Each stage is an independent DataFrame transform so a pipeline can
  * checkpoint between them (signatures are the expensive pass over
  * content; candidates and verification only ever touch signatures
  * and candidate documents).
  *
  * Scale shape (the 100 TB plan): signatures are fixed-size
  * (numPerms × 8 bytes/doc) computed by one codegen expression — no
  * per-(perm, shingle) explode; candidates come from banded bucket
  * joins, so pair cardinality scales with bucket collisions rather
  * than n²; exact Jaccard runs on candidates only. With r=4 rows per
  * band the miss probability at j=0.8 is (1-0.8⁴)^(numPerms/4) ≈ 3e-9
  * for the default 128 permutations.
  */
object MinHashDedup {

  /** Per-document MinHash signature: (id, sig Array[Long]). */
  def signatures(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numPerms: Int = 128): DataFrame =
    docs.select(col(idCol).as("id"),
        graft.functions.WordShingles(col(textCol), shingleK).as("gs"))
      .filter(size(col("gs")) > 0)
      .select(col("id"),
        graft.functions.MinHashSignature(col("gs"), numPerms).as("sig"))

  /** Banded-LSH candidate pairs from a signature frame: (id_a, id_b)
    * with id_a < id_b, distinct. Band key = hash of each band's
    * `bandRows`-hash slice.
    *
    * `bandRows` must evenly divide the signature width (and lie in
    * [1, width]) — a remainder would silently drop the trailing perms
    * from banding (lower recall, no warning), so the mismatch throws
    * here instead.
    */
  def candidatePairs(sigs: DataFrame, bandRows: Int = 4): DataFrame = {
    // signature width probed from one row (cheap: LocalLimit(1) stops
    // the scan); an empty frame short-circuits to no pairs instead of
    // failing — a corpus of all-short documents is legal input
    val firstSig = sigs.select(size(col("sig"))).limit(1).collect()
    if (firstSig.isEmpty)
      return sigs.sparkSession.emptyDataFrame
        .select(lit(0L).as("id_a"), lit(0L).as("id_b")).limit(0)
    val numPerms = firstSig(0).getInt(0)
    // fail fast on banding that silently degrades: a remainder would
    // drop perms from banding (lower recall, no warning) and
    // bandRows > numPerms would compute an end-relative bogus band
    require(bandRows >= 1 && bandRows <= numPerms &&
      numPerms % bandRows == 0,
      s"bandRows=$bandRows must evenly divide the signature width $numPerms")
    val bands = sigs.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(numPerms / bandRows - 1)),
        b => xxhash64(b, slice(col("sig"), b * bandRows + 1, lit(bandRows)))))
        .as(Seq("band", "band_key")))
    bands.select(col("id").as("id_a"), col("band"), col("band_key"))
      .join(bands.select(col("id").as("id_b"), col("band"), col("band_key")),
        Seq("band", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** Exact-Jaccard verification of candidate pairs against the full
    * shingle sets: (id_a, id_b, jaccard) with jaccard >= threshold.
    */
  def verifiedPairs(docs: DataFrame, candidates: DataFrame,
      idCol: String, textCol: String,
      threshold: Double, shingleK: Int = 3): DataFrame = {
    // verification must only touch CANDIDATE documents (the class
    // contract): semi-join the corpus down to ids appearing in a pair
    // BEFORE the shingle pass, so its cost scales with candidates,
    // not corpus size
    val candIds = candidates.select(col("id_a").as("cid"))
      .union(candidates.select(col("id_b").as("cid"))).distinct()
    val sets = docs
      .join(candIds, col(idCol) === col("cid"), "left_semi")
      .select(col(idCol).as("id"),
        graft.functions.WordShingles(col(textCol), shingleK).as("gs"))
      .filter(size(col("gs")) > 0)
    candidates
      .join(sets.select(col("id").as("id_a"), col("gs").as("ga")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("gs").as("gb")), "id_b")
      .withColumn("n_inter", size(array_intersect(col("ga"), col("gb"))))
      .withColumn("jaccard", col("n_inter").cast("double") /
        (size(col("ga")) + size(col("gb")) - col("n_inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** One-call near-dup removal: keep a document iff it has no near
    * duplicate with a smaller id (the standard greedy survivor rule —
    * deterministic, no component computation needed). Returns the
    * surviving rows of `docs`, original schema.
    *
    * RECALL vs threshold: candidate recall depends on the banding, not
    * the verification threshold — with the default r=4 rows per band a
    * pair at exactly j=0.5 shares a band with probability
    * 1-(1-0.5⁴)^32 ≈ 0.87, so borderline pairs near a LOW threshold
    * can be missed even though verification would accept them. For
    * near-complete recall at j≥0.5 pass `bandRows = 2`
    * (1-(1-0.25)^64 ≈ 1-1e-8) and accept the larger candidate volume;
    * the default banding is tuned for the j≥0.8 regime (miss ≈ 3e-9).
    */
  def dedup(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5, bandRows: Int = 4): DataFrame = {
    val sigs = signatures(docs, idCol, textCol)
    val pairs = verifiedPairs(docs, candidatePairs(sigs, bandRows), idCol,
      textCol, threshold)
    val losers = pairs.select(col("id_b").as(idCol)).distinct()
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** Persist / reload a signature frame (the expensive content pass). */
  def save(sigs: DataFrame, path: String): Unit =
    sigs.write.mode("overwrite").parquet(path)
  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
