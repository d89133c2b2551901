package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.PqIndex

/** Unit coverage for the PQ index API (the full path is oracle-checked
  * end-to-end as `sim_pq_encode` / `sim_pq_adc` / `sim_pq_index_api`).
  */
class PqIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def emb = Tables(spark, dir, "embeddings")

  test("build encodes every corpus vector with one code per subspace") {
    val idx = PqIndex.build(emb.filter(col("vec_id") >= 20),
      "vec_id", "embedding", subspaces = 8, codeCount = 16)
    val n = emb.filter(col("vec_id") >= 20).count()
    assert(idx.codes.count() == n * 8)
    assert(idx.codebook.size == 8 * 16)
    val range = idx.codes.agg(min(col("code")), max(col("code"))).collect()(0)
    assert(range.getInt(0) >= 0 && range.getInt(1) < 16)
    // a codebook seed's nearest entry in every subspace is itself
    val seedCodes = idx.packedCodes.filter(col("id") === 20)
      .collect()(0).getLong(1)
    assert(seedCodes == 0L) // vec 20 is code 0 in every subspace
  }

  test("save/load round-trips: searches agree bit for bit") {
    val idx = PqIndex.build(emb.filter(col("vec_id") >= 20),
      "vec_id", "embedding")
    val tmp = Files.createTempDirectory("graft_pq_spec").toString
    idx.save(s"$tmp/index")
    val loaded = PqIndex.load(spark, s"$tmp/index")
    assert(loaded.subspaces == idx.subspaces &&
      loaded.subDims == idx.subDims && loaded.codeCount == idx.codeCount)
    assert(loaded.codebook == idx.codebook)
    val q = emb.filter(col("vec_id") < 5)
    val a = idx.searchAdc(q, "vec_id", "embedding", k = 3)
      .orderBy("query_id", "rnk").collect().toSeq
    val b = loaded.searchAdc(q, "vec_id", "embedding", k = 3)
      .orderBy("query_id", "rnk").collect().toSeq
    assert(a == b)
  }

  test("ADC ranks are deterministic and monotone in the distance") {
    val idx = PqIndex.build(emb.filter(col("vec_id") >= 20),
      "vec_id", "embedding")
    val res = idx.searchAdc(emb.filter(col("vec_id") < 5),
        "vec_id", "embedding", k = 5)
      .orderBy("query_id", "rnk").collect()
    res.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val adcs = rows.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq
      assert(adcs == adcs.sorted)
    }
  }
}
