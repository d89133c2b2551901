package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.{Opq, PqIndex}

/** The OPQ contract the fixture oracle can't demonstrate: the
  * sf* embeddings are ISOTROPIC (near-equal per-dim variances), where
  * eigenvalue allocation is a no-op by design — measured recall there
  * is PQ 0.15 / OPQ 0.15 at sf0.01 (see SCALING.md). This spec builds
  * the ANISOTROPIC corpus the mechanism exists for (variance
  * concentrated in one contiguous dim block — the worst case for
  * contiguous-subspace PQ) and asserts the allocation cuts
  * quantization distortion, OPQ's direct training objective.
  */
class OpqSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val D = 64
  private val M = 8
  private val Sub = 8

  /** Deterministic anisotropic corpus: dims 0..7 carry ~100x the
    * scale of dims 8..63, so contiguous PQ spends ONE 16-entry
    * codebook on all the signal while seven codebooks quantize noise.
    */
  private def anisoCorpus: DataFrame = {
    import spark.implicits._
    def h(id: Long, k: Int): Float = {
      val x = (id * 6364136223846793005L + k * 1442695040888963407L)
      ((x >>> 11).toDouble / (1L << 53).toDouble).toFloat - 0.5f
    }
    (0L until 200L).map { id =>
      val v = Array.tabulate(D)(k =>
        if (k < Sub) h(id, k) * 10f else h(id, k) * 0.1f)
      (id, v)
    }.toDF("vec_id", "embedding")
  }

  /** Total squared quantization error of an index over its corpus:
    * join each sub-vector back to its assigned code's centroid.
    */
  private def distortion(corpus: DataFrame, vecCol: String): Double = {
    val idx = PqIndex.build(corpus, "vec_id", vecCol, M, 16)
    import spark.implicits._
    val cb = idx.codebook.toDF("m", "code", "cbv")
    val subs = corpus
      .select(col("vec_id").as("id"),
        transform(col(vecCol), x => x.cast("double")).as("dv"))
      .select(col("id"), posexplode(array((0 until M).map(m =>
        slice(col("dv"), m * Sub + 1, Sub)): _*)).as(Seq("m", "sv")))
    subs.join(idx.codes, Seq("id", "m"))
      .join(broadcast(cb), Seq("m", "code"))
      .agg(sum(aggregate(zip_with(col("sv"), col("cbv"),
        (x, y) => (x - y) * (x - y)), lit(0.0), (a, x) => a + x)))
      .collect()(0).getDouble(0)
  }

  private def rotated(corpus: DataFrame): DataFrame = {
    // learn per-dim variance from the corpus (plain DataFrame pass —
    // the query route uses GramMomentsAgg; the values only need to be
    // consistent within this spec)
    val stats = corpus
      .select(posexplode(col("embedding")).as(Seq("k", "x")))
      .groupBy(col("k"))
      .agg(((sum(col("x") * col("x")) / count(lit(1))) -
        (sum(col("x")) / count(lit(1))) *
        (sum(col("x")) / count(lit(1)))).as("v"))
      .collect()
      .map(r => (r.getInt(0), math.round(r.getDouble(1) * 1e9)))
      .toSeq
    val perm = Opq.allocation(stats, M, Sub)
    corpus.withColumn("rot",
      array(perm.map(o => element_at(col("embedding"), o + 1)): _*))
  }

  test("eigenvalue allocation spreads the high-variance block") {
    val stats = (0 until D).map(k =>
      (k, if (k < Sub) 1000000L else 1000L))
    val perm = Opq.allocation(stats, M, Sub)
    // each subspace must receive exactly ONE of the 8 hot dims
    val hotPerSubspace = (0 until M).map(m =>
      (0 until Sub).count(s => perm(m * Sub + s) < Sub))
    assert(hotPerSubspace.forall(_ == 1), hotPerSubspace.toString)
  }

  test("allocation cuts quantization distortion on anisotropic data") {
    val c = anisoCorpus
    val base = distortion(c, "embedding")
    val opq = distortion(rotated(c), "rot")
    assert(opq < base * 0.5,
      s"OPQ distortion $opq not well below contiguous-PQ $base")
  }

  test("allocation is a no-op win-wise on isotropic data (documented)") {
    // same scale everywhere: distortions should be within 20% — the
    // honest statement of why the fixture recall row shows no delta
    import spark.implicits._
    def h(id: Long, k: Int): Float = {
      val x = (id * 6364136223846793005L + k * 1442695040888963407L)
      ((x >>> 11).toDouble / (1L << 53).toDouble).toFloat - 0.5f
    }
    val iso = (0L until 200L).map { id =>
      (id, Array.tabulate(D)(k => h(id, k)))
    }.toDF("vec_id", "embedding")
    val base = distortion(iso, "embedding")
    val opq = distortion(rotated(iso), "rot")
    assert(math.abs(opq - base) / base < 0.2, s"base=$base opq=$opq")
  }
}
