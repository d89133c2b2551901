package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.DoubleVecDot

/** Composed IVF-PQ index — the production ANN shape at 100 TB: coarse
  * IVF bucketing ([[IvfIndex]]) with product-quantized residual codes
  * *inside* each bucket ([[PqIndex]]), one build/save/load/search API.
  *
  *  - build: every corpus vector is assigned to its nearest coarse
  *    centroid (cosine, ties to the lower id — a narrow argmax over
  *    literal centroids, no shuffle), and its RESIDUAL (vector minus
  *    centroid) is PQ-encoded: `subspaces` small codes against a
  *    residual-space codebook. Stored per vector: bucket id + codes —
  *    bytes, not floats.
  *  - save: centroids + codebook to parquet (driver-scale), codes
  *    partitioned BY cent_id so a probe prunes unprobed buckets at the
  *    parquet scan.
  *  - search: queries pick their `nprobe` nearest centroids, build one
  *    exact LUT of sub-distances per (query, probed bucket) against
  *    the residual codebook — LUTs and codes meet in a broadcast join;
  *    corpus vectors never reload and never shuffle. ADC distance =
  *    sum of `subspaces` LUT cells, decimal-accumulated so the ranking
  *    is order-independent; ties break on neighbor id.
  *
  * Determinism contract (same as PqIndex): coarse centroids start as
  * the `nlist` lowest-id corpus vectors and the codebook is the
  * residuals of the `codeCount` lowest-id corpus vectors — fixed
  * seeds, no training RNG — so a SQL oracle derives the identical
  * index. `build(trainIters = n)` refines the seeds with n
  * deterministic Lloyd passes (decimal-exact means, ties to the lower
  * cent_id — the same loop as queries.Similarity.kmeansIvf), which an
  * oracle unrolls as n CTE steps.
  */
final class IvfPqIndex private[similarity] (
    val nlist: Int,
    val subspaces: Int,
    val subDims: Int,
    val codeCount: Int,
    val centroids: Seq[(Int, Seq[Double])], // (cent_id, centroid)
    val codebook: Seq[(Int, Int, Seq[Double])], // (m, code, residual sub-vector)
    val codes: DataFrame) { // (cent_id, id, m, code)

  /** Centroid matrix indexed by cent_id (build emits consecutive ids;
    * load may return rows in any order — sort and verify).
    */
  private lazy val centMatrix: Seq[Seq[Double]] = {
    val sorted = centroids.sortBy(_._1)
    require(sorted.map(_._1) == sorted.indices,
      s"centroid ids must be 0..${sorted.length - 1}")
    sorted.map(_._2)
  }

  private def codebookDf: DataFrame = {
    val s = codes.sparkSession
    import s.implicits._
    codebook.toDF("m", "code", "cbv")
  }

  /** ADC top-k per query probing `nprobe` buckets: (query_id,
    * neighbor_id, rnk, adc), rank order (adc asc, neighbor_id asc).
    */
  def search(queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nprobe: Int): DataFrame = {
    val s = codes.sparkSession
    import s.implicits._

    val q = queries.select(col(idCol).as("query_id"),
      transform(col(vecCol), x => x.cast("double")).as("qv"))

    // probe: nprobe nearest centroids per query — one narrow
    // NearestCentroids projection exploded to nprobe rows (no
    // queries x nlist fan-out), residual via O(1) matrix lookup
    val probes = q
      .select(col("query_id"), col("qv"), explode(
        graft.functions.NearestCentroids(col("qv"), centMatrix, nprobe))
        .as("nc"))
      .select(col("query_id"), col("nc").getField("cid").as("cent_id"),
        zip_with(col("qv"),
          graft.functions.CentroidVector(
            col("nc").getField("cid"), centMatrix),
          (x, c) => x - c).as("qrv"))

    // LUT: queries x nprobe x subspaces x codeCount exact sub-distances
    // in RESIDUAL space — the only thing that meets the codes
    val lut = PqIndex.subVectors(probes, "query_id", "qrv",
        subspaces, subDims, keep = Seq("cent_id"))
      .join(broadcast(codebookDf), "m")
      .withColumn("qd2", PqIndex.dist2(col("sv"), col("cbv")))
      .select(col("query_id"), col("cent_id"), col("m"), col("code"),
        col("qd2"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").asc, col("neighbor_id"))
    codes.withColumnRenamed("id", "neighbor_id")
      .join(broadcast(lut), Seq("cent_id", "m", "code"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("qd2").cast(DecimalType(18, 9))).cast("double").as("adc"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), col("adc"))
  }

  /** Persist centroids + codebook (driver-scale) and bucket-partitioned
    * codes.
    */
  def save(path: String): Unit = {
    val s = codes.sparkSession
    import s.implicits._
    centroids.map { case (cid, v) => (cid, v.toArray) }
      .toDF("cent_id", "cv")
      .withColumn("nlist", lit(nlist))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    codebook.toDF("m", "code", "cbv")
      .withColumn("subspaces", lit(subspaces))
      .withColumn("sub_dims", lit(subDims))
      .withColumn("code_count", lit(codeCount))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebook")
    codes.write.mode("overwrite")
      .partitionBy("cent_id").parquet(s"$path/codes")
  }
}

object IvfPqIndex {

  /** Build over a corpus with a long id column and an Array[Float]
    * vector column.
    *
    * `trainIters > 0` refines the seed centroids with that many Lloyd
    * passes before assignment/encoding (the same deterministic loop as
    * queries.Similarity.kmeansIvf: cosine assignment with ties to the
    * lower cent_id — a narrow projection, NO shuffle of the corpus —
    * then per-dimension decimal-exact means, one (cent_id, dim)
    * partial-sum shuffle per pass; empty clusters keep their previous
    * centroid). Deterministic under any partitioning, so a SQL oracle
    * can unroll the same passes as CTEs. At 100 TB the training input
    * would be a sample; here the fixture corpus is the sample.
    */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int = 8, subspaces: Int = 8, codeCount: Int = 16,
      trainIters: Int = 0): IvfPqIndex = {
    // fail fast with the actual precondition, not the analyzer error
    // it would otherwise surface as (single-argument greatest() for
    // nlist = 1; NoSuchElementException on cents.head for an empty
    // corpus)
    require(nlist >= 2, s"nlist=$nlist: the coarse quantizer needs >= 2 cells")
    val s = corpus.sparkSession
    import s.implicits._

    val base = corpus.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("dv"))

    var cents: Seq[(Int, Seq[Double])] = base.orderBy(col("id")).limit(nlist)
      .select(col("dv")).collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](0)) }
      .toSeq
    require(cents.nonEmpty, "IVF-PQ build needs a non-empty corpus")

    // coarse assignment as a narrow argmax over the centroid matrix —
    // ONE NearestCentroids expression (matrix enters codegen as a
    // single reference object), so plan width is constant in nlist
    // and the corpus never shuffles. Same semantics as the earlier
    // per-centroid fan-out: cosine desc, ties to the lower cent_id,
    // bit-identical doubles (ExpressionsSpec).
    def withNearest(df: DataFrame): DataFrame =
      df.withColumn("cent_id",
        graft.functions.NearestCentroids(col("dv"), cents.map(_._2), 1)
          .getItem(0).getField("cid"))

    // Lloyd passes over the seeds: assignment (narrow) + decimal-exact
    // per-dimension means (order-independent), driver sees nlist x dim
    // doubles per pass
    for (_ <- 1 to trainIters) {
      val means = withNearest(base)
        .select(col("cent_id"), posexplode(col("dv")).as(Seq("d", "v")))
        .groupBy(col("cent_id"), col("d"))
        .agg((sum(col("v").cast(DecimalType(18, 9))).cast("double") /
          count(lit(1))).as("m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cid, rows) =>
          cid -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
        }
      cents = cents.map { case (cid, old) => (cid, means.getOrElse(cid, old)) }
    }

    // residual = vector - assigned centroid; the matrix row is looked
    // up by cent_id in O(1) plan width (CentroidVector), not a
    // per-centroid CASE chain
    val resid = withNearest(base)
      .withColumn("rv", zip_with(col("dv"),
        graft.functions.CentroidVector(col("cent_id"), cents.map(_._2)),
        (x, c) => x - c))
      .select(col("id"), col("cent_id"), col("rv"))

    // residual-space codebook: residuals of the codeCount lowest-id
    // corpus vectors, sliced per subspace
    val seeds = resid.orderBy(col("id")).limit(codeCount)
      .select(col("rv")).collect()
      .zipWithIndex
      .map { case (r, code) => (code, r.getSeq[Double](0)) }
    require(seeds.nonEmpty, "IVF-PQ codebook needs a non-empty corpus")
    val dim = seeds.head._2.length
    require(dim % subspaces == 0,
      s"vector dim $dim not divisible into $subspaces subspaces")
    val subDims = dim / subspaces
    val codebook = (for {
      (code, v) <- seeds.toSeq
      m <- 0 until subspaces
    } yield (m, code, v.slice(m * subDims, (m + 1) * subDims).toVector))
      .sortBy(t => (t._1, t._2))
    val cbDf = codebook.toDF("m", "code", "cbv")

    // encode residual sub-vectors (L2, ties to the lower code)
    val wEnc = Window.partitionBy(col("id"), col("m"))
      .orderBy(col("d2").asc, col("code"))
    val codes = PqIndex.subVectors(resid, "id", "rv",
        subspaces, subDims, keep = Seq("cent_id"))
      .join(broadcast(cbDf), "m")
      .withColumn("d2", PqIndex.dist2(col("sv"), col("cbv")))
      .withColumn("rnk", row_number().over(wEnc))
      .filter(col("rnk") === 1)
      .select(col("cent_id"), col("id"), col("m"), col("code"))

    new IvfPqIndex(nlist, subspaces, subDims, codeCount, cents, codebook,
      codes)
  }

  /** Append a batch to a PERSISTED index without rebuilding — the PQ
    * counterpart of [[IvfIndex.append]]: new vectors assign to the
    * EXISTING centroids, residual-encode against the EXISTING codebook
    * (both geometry decisions are frozen at build time; retraining is
    * a rebuild), and their packed codes append as new bucket files
    * under `path/codes`. O(batch) written; quality degrades only with
    * distribution drift from the trained geometry, like any vector
    * store's ingest path.
    */
  def append(spark: SparkSession, path: String, batch: DataFrame,
      idCol: String, vecCol: String): Unit = {
    val idx = load(spark, path)
    import spark.implicits._
    val cm = idx.centMatrix // same 0..n-1 id validation as search
    val resid = batch.select(col(idCol).as("id"),
        transform(col(vecCol), x => x.cast("double")).as("dv"))
      .withColumn("cent_id",
        graft.functions.NearestCentroids(col("dv"), cm, 1)
          .getItem(0).getField("cid"))
      .withColumn("rv", zip_with(col("dv"),
        graft.functions.CentroidVector(col("cent_id"), cm),
        (x, c) => x - c))
      .select(col("id"), col("cent_id"), col("rv"))
    val cbDf = idx.codebook.toDF("m", "code", "cbv")
    val wEnc = Window.partitionBy(col("id"), col("m"))
      .orderBy(col("d2").asc, col("code"))
    PqIndex.subVectors(resid, "id", "rv", idx.subspaces, idx.subDims,
        keep = Seq("cent_id"))
      .join(broadcast(cbDf), "m")
      .withColumn("d2", PqIndex.dist2(col("sv"), col("cbv")))
      .withColumn("rnk", row_number().over(wEnc))
      .filter(col("rnk") === 1)
      .select(col("cent_id"), col("id"), col("m"), col("code"))
      .write.mode("append").partitionBy("cent_id")
      .parquet(s"$path/codes")
  }

  def load(spark: SparkSession, path: String): IvfPqIndex = {
    val cn = spark.read.parquet(s"$path/centroids").collect()
    val nlist = cn.head.getAs[Int]("nlist")
    val cents = cn.map(r => (r.getAs[Int]("cent_id"),
      r.getAs[Seq[Double]]("cv").toVector)).sortBy(_._1).toSeq
    val cb = spark.read.parquet(s"$path/codebook").collect()
    val meta = cb.head
    val codebook = cb.map(r => (r.getAs[Int]("m"), r.getAs[Int]("code"),
      r.getAs[Seq[Double]]("cbv").toVector)).sortBy(t => (t._1, t._2)).toSeq
    new IvfPqIndex(nlist, meta.getAs[Int]("subspaces"),
      meta.getAs[Int]("sub_dims"), meta.getAs[Int]("code_count"),
      cents, codebook, spark.read.parquet(s"$path/codes"))
  }
}
