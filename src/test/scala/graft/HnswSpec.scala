package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.HnswIndex

/** The HNSW contracts the oracle gate can't see: recall at SERVING ef
  * (the oracle query runs exhaustive ef, where recall is 1.0 by
  * construction), determinism of the persisted graph under input
  * repartitioning, and the save/load round-trip reconstructing the
  * same entry point and adjacency.
  */
class HnswSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def corpus = Tables(spark, dir, "embeddings")
    .filter(col("vec_id") >= 20)

  private def queries = Tables(spark, dir, "embeddings")
    .filter(col("vec_id") < 20)

  private def bruteTopK(k: Int): Map[(Long, Int), Long] = {
    import graft.functions.TextFns
    val e = Tables(spark, dir, "embeddings")
      .withColumn("nrm", TextFns.norm(col("embedding")))
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("nrm").as("qn"))
    val c = e.filter(col("vec_id") >= 20)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"),
        col("nrm").as("nn"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosv").desc, col("neighbor_id"))
    c.crossJoin(broadcast(q))
      .withColumn("cosv", TextFns.cosineFrom(
        TextFns.dot(col("qv"), col("nv")), col("qn"), col("nn")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2))
      .toMap
  }

  test("exhaustive-ef search equals brute force (the oracle invariant)") {
    val idx = HnswIndex.build(corpus, "vec_id", "embedding",
      nShards = 4, m = 8, efConstruction = 32)
    val got = idx.search(queries, "vec_id", "embedding",
        k = 5, ef = Int.MaxValue)
      .collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1))
      .toMap
    assert(got == bruteTopK(5))
  }

  test("recall@5 at serving ef stays high (the SCALING.md row)") {
    val idx = HnswIndex.build(corpus, "vec_id", "embedding",
      nShards = 4, m = 8, efConstruction = 32)
    val truth = bruteTopK(5)
    val got = idx.search(queries, "vec_id", "embedding", k = 5, ef = 16)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val truthPairs = truth.map { case ((q, _), n) => (q, n) }.toSet
    val recall = (got & truthPairs).size.toDouble / truthPairs.size
    // 20 queries x top-5 at sf0.001; ef=16 over ~120-vector shards.
    // Measured 0.99 (see SCALING.md's recall table); assert a margin
    // so graph tweaks that genuinely hurt recall fail while benign
    // ones don't flap the suite.
    assert(recall >= 0.9, s"recall@5 at ef=16 was $recall")
  }

  test("persisted graph is identical regardless of input partitioning") {
    def nodesOf(parts: Int): Array[String] = {
      val idx = HnswIndex.build(corpus.repartition(parts),
        "vec_id", "embedding", nShards = 4, m = 8, efConstruction = 32)
      idx.nodes
        .select(col("shard"), col("id"), col("top_level"), col("adj"))
        .collect()
        .map(_.toString)
        .sorted
    }
    assert(nodesOf(3) sameElements nodesOf(13))
  }

  test("save/load round-trip reconstructs entry point and adjacency") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_hnsw_spec").toString
    try {
      val idx = HnswIndex.build(corpus, "vec_id", "embedding",
        nShards = 2, m = 8, efConstruction = 32)
      idx.save(s"$root/index")
      val loaded = HnswIndex.load(spark, s"$root/index")
      assert(loaded.m == 8 && loaded.efConstruction == 32 &&
        loaded.nShards == 2)
      val a = idx.search(queries, "vec_id", "embedding", k = 5, ef = 16)
        .collect().map(_.toString).sorted
      val b = loaded.search(queries, "vec_id", "embedding", k = 5, ef = 16)
        .collect().map(_.toString).sorted
      assert(a sameElements b)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(root))
    }
  }

  test("append == one-shot build at exhaustive ef (both == brute force)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_hnsw_app_spec").toString
    try {
      val half = Tables(spark, dir, "embeddings")
        .filter(col("vec_id") >= 20 && col("vec_id") < 260)
      val rest = Tables(spark, dir, "embeddings")
        .filter(col("vec_id") >= 260)
      HnswIndex.build(half, "vec_id", "embedding", 4, 8, 32)
        .save(s"$root/index")
      HnswIndex.append(spark, s"$root/index", rest, "vec_id", "embedding")
      val got = HnswIndex.load(spark, s"$root/index")
        .search(queries, "vec_id", "embedding", k = 5, ef = Int.MaxValue)
        .collect()
        .map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1))
        .toMap
      assert(got == bruteTopK(5))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(root))
    }
  }

  test("append stays connected under tiny-M pruning stress") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_hnsw_app_conn").toString
    try {
      val half = corpus.filter(col("vec_id") < 260)
      val rest = corpus.filter(col("vec_id") >= 260)
      HnswIndex.build(half, "vec_id", "embedding", 4, 2, 4)
        .save(s"$root/index")
      HnswIndex.append(spark, s"$root/index", rest, "vec_id", "embedding")
      val rows = HnswIndex.load(spark, s"$root/index").nodes
        .select(col("shard"), col("id"), col("adj").getItem(0).as("l0"))
        .collect()
      rows.groupBy(_.getInt(0)).foreach { case (_, shardRows) =>
        val ids = shardRows.map(_.getLong(1)).sorted
        val adjm = shardRows.map(r =>
          r.getLong(1) -> r.getSeq[Long](2).toSet).toMap
        val seen = scala.collection.mutable.Set(ids.head)
        val stack = scala.collection.mutable.Stack(ids.head)
        while (stack.nonEmpty) {
          val c = stack.pop()
          adjm(c).foreach { nb =>
            if (!seen.contains(nb)) { seen += nb; stack.push(nb) }
          }
        }
        assert(seen.size == ids.length,
          s"shard disconnected after append: ${seen.size} of ${ids.length}")
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(root))
    }
  }

  test("append refuses duplicate ids loudly") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_hnsw_app_dup").toString
    try {
      HnswIndex.build(corpus, "vec_id", "embedding", 2, 8, 32)
        .save(s"$root/index")
      val ex = intercept[org.apache.spark.SparkException] {
        HnswIndex.append(spark, s"$root/index",
          corpus.limit(3), "vec_id", "embedding")
      }
      assert(ex.getMessage.contains("already in the index") ||
        Option(ex.getCause).exists(
          _.getMessage.contains("already in the index")))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(root))
    }
  }

  test("level-0 chain edges keep every shard connected") {
    val idx = HnswIndex.build(corpus, "vec_id", "embedding",
      nShards = 4, m = 2, efConstruction = 4) // tiny M stresses pruning
    val rows = idx.nodes
      .select(col("shard"), col("id"), col("adj").getItem(0).as("l0"))
      .collect()
    rows.groupBy(_.getInt(0)).foreach { case (_, shardRows) =>
      val ids = shardRows.map(_.getLong(1)).sorted
      val adj = shardRows.map(r =>
        r.getLong(1) -> r.getSeq[Long](2).toSet).toMap
      // walk from the lowest id; chain edges guarantee full reach
      val seen = scala.collection.mutable.Set(ids.head)
      val stack = scala.collection.mutable.Stack(ids.head)
      while (stack.nonEmpty) {
        val c = stack.pop()
        adj(c).foreach { nb =>
          if (!seen.contains(nb)) { seen += nb; stack.push(nb) }
        }
      }
      assert(seen.size == ids.length,
        s"shard disconnected: reached ${seen.size} of ${ids.length}")
    }
  }
}
