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

  import IvfPqIndex.{cosineToLit, litVec}

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

    // probe: nprobe nearest centroids per query (tiny window: queries
    // x nlist rows)
    // fresh Array[Double] per row: the Seqs may be Row-backed wrappers
    // (post-load), which the tuple encoder rejects
    val centsDf = centroids.map { case (cid, v) => (cid, v.toArray) }
      .toDF("cent_id", "cv")
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("qcos").desc, col("cent_id"))
    val probes = q.crossJoin(broadcast(centsDf))
      .withColumn("qcos", cosineToLit(col("qv"), col("cv")))
      .withColumn("prnk", row_number().over(wProbe))
      .filter(col("prnk") <= nprobe)
      .select(col("query_id"), col("cent_id"),
        zip_with(col("qv"), col("cv"), (x, c) => x - c).as("qrv"))

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

  private[similarity] def litVec(v: Seq[Double]): Column =
    array(v.map(lit): _*)

  /** Exact cosine between two double-array columns — sequential folds,
    * matching DuckDB's list_cosine_similarity bit for bit (same
    * contract the kmeans/IVF queries are gated on).
    */
  private[similarity] def cosineToLit(a: Column, b: Column): Column =
    DoubleVecDot(a, b) / (sqrt(DoubleVecDot(a, a)) * sqrt(DoubleVecDot(b, b)))

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

    // coarse assignment as a narrow argmax over literal centroids
    // (cosine desc, cent_id asc) — one cosine column per centroid,
    // flat CASE chain, NO shuffle of the corpus
    def withNearest(df: DataFrame): DataFrame = {
      val withCos = cents.foldLeft(df) { case (acc, (cid, v)) =>
        acc.withColumn(s"cos_$cid", cosineToLit(col("dv"), litVec(v)))
      }
      val best = greatest(cents.map { case (cid, _) => col(s"cos_$cid") }: _*)
      val pick = cents.map(_._1).foldRight(lit(-1)) { case (cid, els) =>
        when(col(s"cos_$cid") === best, lit(cid)).otherwise(els)
      }
      withCos.withColumn("cent_id", pick)
        .drop(cents.map(c => s"cos_${c._1}"): _*)
    }

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

    // residual = vector - assigned centroid (centroid again a literal,
    // picked by the same CASE chain)
    val centArr = cents.map(_._1).foldRight(litVec(cents.head._2)) {
      case (cid, els) =>
        when(col("cent_id") === cid, litVec(cents.find(_._1 == cid).get._2))
          .otherwise(els)
    }
    val resid = withNearest(base)
      .withColumn("rv", zip_with(col("dv"), centArr, (x, c) => x - c))
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
