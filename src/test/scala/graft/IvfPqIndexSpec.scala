package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.IvfPqIndex

/** Unit coverage for the composed IVF-PQ index (the full path is
  * oracle-checked end-to-end as `sim_ivfpq_index_api`).
  */
class IvfPqIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def emb = Tables(spark, dir, "embeddings")

  test("build buckets every vector and encodes one code per subspace") {
    val idx = IvfPqIndex.build(emb.filter(col("vec_id") >= 20),
      "vec_id", "embedding", nlist = 8, subspaces = 8, codeCount = 16)
    val n = emb.filter(col("vec_id") >= 20).count()
    assert(idx.codes.count() == n * 8)
    assert(idx.centroids.size == 8 && idx.codebook.size == 8 * 16)
    val r = idx.codes.agg(min(col("cent_id")), max(col("cent_id")),
      min(col("code")), max(col("code"))).collect()(0)
    assert(r.getInt(0) >= 0 && r.getInt(1) < 8)
    assert(r.getInt(2) >= 0 && r.getInt(3) < 16)
    // each vector appears in exactly one bucket
    assert(idx.codes.select(col("id"), col("cent_id")).distinct().count() == n)
    // a centroid seed's residual is the zero vector -> its nearest
    // residual codebook entry is the (zero) seed residual, code == its
    // own seed position only if it is the lowest zero code: code 0
    val seedCode = idx.codes.filter(col("id") === 20)
      .agg(max(col("code"))).collect()(0).getInt(0)
    assert(seedCode == 0)
  }

  test("save/load round-trips: searches agree bit for bit") {
    val idx = IvfPqIndex.build(emb.filter(col("vec_id") >= 20),
      "vec_id", "embedding")
    val tmp = Files.createTempDirectory("graft_ivfpq_spec").toString
    idx.save(s"$tmp/index")
    val loaded = IvfPqIndex.load(spark, s"$tmp/index")
    assert(loaded.nlist == idx.nlist && loaded.subspaces == idx.subspaces &&
      loaded.subDims == idx.subDims && loaded.codeCount == idx.codeCount)
    assert(loaded.codebook == idx.codebook)
    assert(loaded.centroids.map(_._1) == idx.centroids.map(_._1))
    val q = emb.filter(col("vec_id") < 5)
    val a = idx.search(q, "vec_id", "embedding", k = 3, nprobe = 2)
      .orderBy("query_id", "rnk").collect().toSeq
    val b = loaded.search(q, "vec_id", "embedding", k = 3, nprobe = 2)
      .orderBy("query_id", "rnk").collect().toSeq
    assert(a == b)
  }

  test("trained build: Lloyd passes are deterministic and keep the" +
      " index contract") {
    def built() = IvfPqIndex.build(emb.filter(col("vec_id") >= 20),
      "vec_id", "embedding", nlist = 8, trainIters = 2)
    val a = built()
    val b = built()
    // training is decimal-exact and tie-broken -> same centroids on
    // every build, regardless of partitioning
    assert(a.centroids == b.centroids)
    // trained centroids are means, not corpus rows: they moved off the
    // seeds unless a cluster was a singleton
    val seeds = IvfPqIndex.build(emb.filter(col("vec_id") >= 20),
      "vec_id", "embedding", nlist = 8).centroids
    assert(a.centroids != seeds)
    // contract unchanged: one bucket per vector, one code per subspace
    val n = emb.filter(col("vec_id") >= 20).count()
    assert(a.codes.count() == n * 8)
    assert(a.codes.select(col("id"), col("cent_id")).distinct().count() == n)
    // trainIters = 0 stays the untrained build (back-compat)
    assert(IvfPqIndex.build(emb.filter(col("vec_id") >= 20),
      "vec_id", "embedding", nlist = 8, trainIters = 0).centroids == seeds)
  }

  test("wider probes only grow the candidate pool: full probe finds" +
      " distances no worse than narrow probe") {
    val idx = IvfPqIndex.build(emb.filter(col("vec_id") >= 20),
      "vec_id", "embedding", nlist = 8)
    val q = emb.filter(col("vec_id") < 5)
    def best(nprobe: Int): Map[Long, Double] =
      idx.search(q, "vec_id", "embedding", k = 1, nprobe = nprobe)
        .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val narrow = best(1)
    val full = best(8)
    for ((qid, d) <- full) assert(d <= narrow(qid) + 1e-12,
      s"query $qid: full-probe best $d worse than narrow ${narrow(qid)}")
  }
}
