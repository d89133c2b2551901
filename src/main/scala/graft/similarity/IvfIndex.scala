package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Reusable IVF (inverted-file) approximate-nearest-neighbor index —
  * the library surface behind the `sim_knn_ivf` query, packaged the
  * way a pipeline consumes it: build once over the corpus, persist to
  * the lake, load and search many times.
  *
  * Spark-first layout:
  *  - centroids are the nlist lowest-id corpus vectors (deterministic
  *    seeds; callers wanting trained centroids run Lloyd passes first
  *    — see queries.Similarity.kmeansIvf for the exact-training shape)
  *    and live on the driver (nlist × dim doubles — tiny), entering
  *    plans as literals so assignment/probing are narrow projections;
  *  - assignments are a DataFrame (cent_id, id, vec, nrm) persisted
  *    partitioned BY cent_id, so a search that probes nprobe buckets
  *    prunes the other partitions at the parquet scan — the on-disk
  *    analogue of an inverted file;
  *  - search broadcasts the (small) query side, scores only the probed
  *    buckets with the codegen dot product, and takes the per-query
  *    top-k through a rank window.
  *
  * At 100 TB: nlist grows ~sqrt(n) with nprobe fixed; the corpus is
  * assigned once (narrow pass over broadcast centroids), and every
  * search touches nprobe/nlist of the data. Norms are precomputed at
  * build time so a search pays one fold per (query, candidate).
  */
final class IvfIndex private[similarity] (
    val centroids: Seq[(Int, Seq[Double])],
    val assignments: DataFrame) {

  /** Centroid matrix sorted by cent_id so the NearestCentroids row
    * index IS the cent_id — validated here (ids must be consecutive
    * 0..n-1) so EVERY consumer (search, append) inherits the check; a
    * persisted index with gapped ids would otherwise silently map row
    * index ≠ cent_id and bucket vectors wrongly.
    */
  private[similarity] lazy val centMatrix: Seq[Seq[Double]] = {
    val sorted = centroids.sortBy(_._1)
    require(sorted.map(_._1) == sorted.indices,
      s"centroid ids must be 0..${sorted.length - 1}")
    sorted.map(_._2)
  }

  /** Top-k cosine neighbors for each query vector, probing the
    * `nprobe` nearest centroid buckets. Output: (query_id,
    * neighbor_id, rnk, cosv), rank order (cosine desc, id asc).
    */
  def search(queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nprobe: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
        col(vecCol).as("qv"))
      .withColumn("qn", TextFns.norm(col("qv")))

    // probe: nprobe nearest centroids per query — one narrow
    // NearestCentroids projection exploded to nprobe rows (no
    // queries x nlist fan-out, constant plan width in nlist)
    val cm = centMatrix
    val probes = q
      .select(col("query_id"), col("qv"), col("qn"), explode(
        graft.functions.NearestCentroids(col("qv"), cm, nprobe)).as("nc"))
      .select(col("query_id"), col("qv"), col("qn"),
        col("nc").getField("cid").as("cent_id"))

    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cosv").desc, col("id"))
    broadcast(probes).join(assignments, "cent_id")
      .withColumn("cosv", TextFns.cosineFrom(
        TextFns.dot(col("qv"), col("vec")), col("qn"), col("nrm")))
      .withColumn("rnk", row_number().over(wTop))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"),
        col("rnk"), col("cosv"))
  }

  /** Persist centroids + bucket-partitioned assignments. `path` is
    * any Hadoop-FS path; at cluster scale it must be shared lake
    * storage visible to every executor (see SCALING.md, "Index
    * persistence needs a shared filesystem").
    */
  def save(path: String): Unit = {
    val s = assignments.sparkSession
    import s.implicits._
    centroids.toDF("cent_id", "cv")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    assignments.write.mode("overwrite")
      .partitionBy("cent_id").parquet(s"$path/assignments")
  }
}

object IvfIndex {

  /** Build over a corpus DataFrame with a long id column and an
    * Array[Float] vector column.
    */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int): IvfIndex = {
    val base = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("nrm", TextFns.norm(col("vec")))

    val cents = base.orderBy(col("id")).limit(nlist)
      .select(col("id"), transform(col("vec"), x => x.cast("double")))
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1)) }
      .toSeq

    // assignment is ONE narrow NearestCentroids projection — the
    // matrix rides codegen as a single reference object, so plan
    // width is constant in nlist and the corpus never fans out to
    // corpus x nlist rows (cents came off float vectors, so their
    // doubles are exactly the promoted elements FloatVecDot computes
    // with — bit-identical cosines)
    val assigned = base
      .withColumn("cent_id",
        graft.functions.NearestCentroids(col("vec"), cents.map(_._2), 1)
          .getItem(0).getField("cid"))
      .select(col("cent_id"), col("id"), col("vec"), col("nrm"))

    new IvfIndex(cents, assigned)
  }

  /** Append a batch to a PERSISTED index without rebuilding: assign
    * the new vectors to the EXISTING centroids (one narrow
    * NearestCentroids projection) and append their bucket files under
    * `path/assignments` — O(batch) written, the existing buckets are
    * untouched, and the next `load` serves the union. This is the IVF
    * maintenance contract at scale: ingest appends; centroids retrain
    * only on measured drift (a rebuild, not an append). Quality note:
    * appended vectors get the same centroid geometry the corpus was
    * bucketed with, so recall@nprobe degrades only as the data
    * distribution drifts from the trained centroids — the metric
    * SCALING.md's recall table tracks.
    */
  def append(spark: SparkSession, path: String, batch: DataFrame,
      idCol: String, vecCol: String): Unit = {
    val idx = load(spark, path)
    val cm = idx.centMatrix // same 0..n-1 id validation as search
    batch.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("nrm", TextFns.norm(col("vec")))
      .withColumn("cent_id",
        graft.functions.NearestCentroids(col("vec"), cm, 1)
          .getItem(0).getField("cid"))
      .select(col("cent_id"), col("id"), col("vec"), col("nrm"))
      .write.mode("append").partitionBy("cent_id")
      .parquet(s"$path/assignments")
  }

  /** Load a persisted index; the search plan prunes unprobed bucket
    * partitions at the parquet scan.
    */
  def load(spark: SparkSession, path: String): IvfIndex = {
    val cents = spark.read.parquet(s"$path/centroids")
      .collect()
      // .toVector: the Seqs are Row-backed wrappers post-load, which
      // the tuple encoder rejects if this index is save()d again (the
      // hazard IvfPqIndex.load documents)
      .map(r => (r.getInt(0), r.getSeq[Double](1).toVector))
      .sortBy(_._1).toSeq
    new IvfIndex(cents, spark.read.parquet(s"$path/assignments"))
  }
}
