package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Reusable product-quantization index — the library surface behind
  * the `sim_pq_*` queries, packaged like [[IvfIndex]]: build once over
  * the corpus, persist, load and search many times.
  *
  * Layout: the vector space splits into `subspaces` contiguous
  * sub-vectors; each subspace has its own small codebook (the
  * sub-vectors of the `codeCount` lowest-id corpus vectors —
  * deterministic seeds, no training RNG), and a corpus vector is
  * stored as `subspaces` small codes. Search is asymmetric distance
  * (ADC): each query computes an exact lookup table of sub-distances
  * to every codebook entry, and a neighbor's approximate distance is
  * the sum of `subspaces` table cells selected by its codes — only
  * codes and the tiny LUT meet in the join, never corpus vectors.
  *
  * Exactness contract: sub-distances are sequential double folds,
  * their sum runs through decimal accumulation (order-independent),
  * and ranks tie-break on neighbor id — so the approximate ranking is
  * deterministic and a SQL oracle reproduces it bit for bit.
  */
final class PqIndex private[similarity] (
    val subspaces: Int,
    val subDims: Int,
    val codeCount: Int,
    val codebook: Seq[(Int, Int, Seq[Double])], // (m, code, sub-vector)
    val codes: DataFrame) { // (id, m, code)

  private def codebookDf: DataFrame = {
    val s = codes.sparkSession
    import s.implicits._
    codebook.toDF("m", "code", "cbv")
  }

  /** One BIGINT word per vector: the `subspaces` codes packed base-
    * `codeCount` — the 8-byte representation an index stores per
    * vector instead of the float payload. Place values are EXACT Long
    * literals (a double `pow` would silently lose precision past 2^53
    * and clamp past 2^63 for large codeCount/subspaces), and the
    * require rejects configurations whose packed range exceeds a
    * BIGINT outright.
    */
  def packedCodes: DataFrame = {
    val places = Array.iterate(1L, subspaces) { p =>
      require(p <= Long.MaxValue / codeCount,
        s"codeCount=$codeCount^subspaces=$subspaces exceeds the 64-bit packed word")
      p * codeCount
    }
    // The iterate guard only proves codeCount^(subspaces-1) fits; the
    // maximum packed word is codeCount^subspaces - 1, one factor more.
    require(places.last <= Long.MaxValue / codeCount,
      s"codeCount=$codeCount^subspaces=$subspaces exceeds the 64-bit packed word")
    val placeOf = (0 until subspaces).foldRight(lit(-1L)) { (m, els) =>
      when(col("m") === m, lit(places(m))).otherwise(els)
    }
    codes.groupBy(col("id"))
      .agg(sum(col("code").cast("long") * placeOf).as("pq_word"))
  }

  /** ADC top-k per query: (query_id, neighbor_id, rnk, adc), rank
    * order (adc asc, neighbor_id asc).
    */
  def searchAdc(queries: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    val lut = PqIndex.subVectors(
      queries.select(col(idCol).as("query_id"),
        transform(col(vecCol), x => x.cast("double")).as("dv")),
      "query_id", "dv", subspaces, subDims)
      .join(broadcast(codebookDf), "m")
      .withColumn("qd2", PqIndex.dist2(col("sv"), col("cbv")))
      .select(col("query_id"), col("m"), col("code"), col("qd2"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").asc, col("neighbor_id"))
    codes.withColumnRenamed("id", "neighbor_id")
      .join(broadcast(lut), Seq("m", "code"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("qd2").cast(DecimalType(18, 9))).cast("double").as("adc"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), col("adc"))
  }

  /** Persist codebook + codes. */
  def save(path: String): Unit = {
    val s = codes.sparkSession
    import s.implicits._
    codebook.toDF("m", "code", "cbv")
      .withColumn("subspaces", lit(subspaces))
      .withColumn("sub_dims", lit(subDims))
      .withColumn("code_count", lit(codeCount))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebook")
    codes.write.mode("overwrite").parquet(s"$path/codes")
  }
}

object PqIndex {

  /** Explode a vector column into its `subspaces` fixed-width
    * sub-vectors as (idCol, keep..., m, sv) — THE sub-vector
    * convention every PQ consumer (encode, ADC, residual paths) must
    * share bit-for-bit, hence one definition.
    */
  private[similarity] def subVectors(df: DataFrame, idCol: String,
      vecCol: String, subspaces: Int, subDims: Int,
      keep: Seq[String] = Nil): DataFrame =
    df.select(col(idCol) +: keep.map(col) :+
      posexplode(array((0 until subspaces).map(m =>
        slice(col(vecCol), m * subDims + 1, subDims)): _*))
        .as(Seq("m", "sv")): _*)

  private[similarity] def dist2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Build over a corpus with a long id column and an Array[Float]
    * vector column. The codebook is the sub-vectors of the
    * `codeCount` lowest-id corpus vectors; encode snaps every
    * sub-vector to its nearest entry (L2, ties to the lower code) in
    * one narrow pass over the broadcast codebook.
    */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
      subspaces: Int = 8, codeCount: Int = 16): PqIndex = {
    val base = corpus.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("dv"))

    val seeds = base.orderBy(col("id")).limit(codeCount)
      .select(col("dv")).collect()
      .zipWithIndex
      .map { case (r, code) => (code, r.getSeq[Double](0)) }
    require(seeds.nonEmpty, "PQ codebook needs a non-empty corpus")
    val dim = seeds.head._2.length
    require(dim % subspaces == 0,
      s"vector dim $dim not divisible into $subspaces subspaces")
    val subDims = dim / subspaces
    val codebook = (for {
      (code, v) <- seeds.toSeq
      m <- 0 until subspaces
    } yield (m, code, v.slice(m * subDims, (m + 1) * subDims).toVector))
      .sortBy(t => (t._1, t._2)) // canonical (m, code) order, as load()

    val s = corpus.sparkSession
    import s.implicits._
    val cbDf = codebook.toDF("m", "code", "cbv")

    val wEnc = Window.partitionBy(col("id"), col("m"))
      .orderBy(col("d2").asc, col("code"))
    val codes = subVectors(base, "id", "dv", subspaces, subDims)
      .join(broadcast(cbDf), "m")
      .withColumn("d2", dist2(col("sv"), col("cbv")))
      .withColumn("rnk", row_number().over(wEnc))
      .filter(col("rnk") === 1)
      .select(col("id"), col("m"), col("code"))

    new PqIndex(subspaces, subDims, codeCount, codebook, codes)
  }

  def load(spark: SparkSession, path: String): PqIndex = {
    val cb = spark.read.parquet(s"$path/codebook").collect()
    val meta = cb.head
    val subspaces = meta.getAs[Int]("subspaces")
    val subDims = meta.getAs[Int]("sub_dims")
    val codeCount = meta.getAs[Int]("code_count")
    val codebook = cb.map(r => (r.getAs[Int]("m"), r.getAs[Int]("code"),
      r.getAs[Seq[Double]]("cbv").toVector)).sortBy(t => (t._1, t._2)).toSeq
    new PqIndex(subspaces, subDims, codeCount, codebook,
      spark.read.parquet(s"$path/codes"))
  }
}
