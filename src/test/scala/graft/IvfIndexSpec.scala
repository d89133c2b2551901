package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFns
import graft.similarity.IvfIndex

/** The reusable IVF index API: exactness at full probe width, recall
  * subset behavior at partial width, save/load round-trip, and
  * bucket-partition pruning at the scan.
  */
class IvfIndexSpec extends AnyFunSuite {

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

  private def bruteTopK(k: Int): Set[(Long, Long, Int)] = {
    val e = Tables(spark, dir, "embeddings")
      .withColumn("nrm", TextFns.norm(col("embedding")))
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("nrm").as("qn"))
    val c = e.filter(col("vec_id") >= 20)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"),
        col("nrm").as("nn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosv").desc, col("neighbor_id"))
    c.crossJoin(broadcast(q))
      .withColumn("cosv", TextFns.cosineFrom(
        TextFns.dot(col("qv"), col("nv")), col("qn"), col("nn")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  test("full probe width equals brute force exactly") {
    val idx = IvfIndex.build(corpus, "vec_id", "embedding", nlist = 8)
    val got = idx.search(queries, "vec_id", "embedding", k = 5, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == bruteTopK(5))
  }

  test("partial probe width returns valid candidates for every query") {
    val idx = IvfIndex.build(corpus, "vec_id", "embedding", nlist = 8)
    val got = idx.search(queries, "vec_id", "embedding", k = 5, nprobe = 2)
      .collect()
    // every query answered, ranks contiguous from 1
    val byQuery = got.groupBy(_.getLong(0))
    assert(byQuery.size == queries.count())
    byQuery.values.foreach { rows =>
      assert(rows.map(_.getInt(2)).sorted.sameElements(1 to rows.length))
    }
    // candidates really are corpus members
    assert(got.forall(_.getLong(1) >= 20))
  }

  test("save/load round-trip reproduces search results and prunes buckets") {
    val tmp = Files.createTempDirectory("graft_ivf").toString
    val idx = IvfIndex.build(corpus, "vec_id", "embedding", nlist = 8)
    idx.save(s"$tmp/index")
    val loaded = IvfIndex.load(spark, s"$tmp/index")

    def res(i: IvfIndex) =
      i.search(queries, "vec_id", "embedding", k = 5, nprobe = 3)
        .collect().map(_.toString).sorted.toSeq
    assert(res(loaded) == res(idx))

    // the bucket filter reaches the partitioned scan as a partition filter
    val plan = loaded.assignments.filter(col("cent_id") === 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cent_id"),
      plan.take(500))
  }

  test("append to a persisted index equals building over the union") {
    val tmp = Files.createTempDirectory("graft_ivf_append").toString
    // build over the first half of the corpus, append the second half
    val half = 150
    IvfIndex.build(corpus.filter(col("vec_id") < half),
      "vec_id", "embedding", nlist = 8).save(s"$tmp/idx")
    IvfIndex.append(spark, s"$tmp/idx",
      corpus.filter(col("vec_id") >= half), "vec_id", "embedding")
    val appended = IvfIndex.load(spark, s"$tmp/idx")
      .search(queries, "vec_id", "embedding", k = 5, nprobe = 8)
      .collect().map(_.toString).sorted.toSeq
    // reference: one-shot build over everything (same centroid seeds:
    // build takes the nlist lowest ids, which the first half contains)
    val full = IvfIndex.build(corpus, "vec_id", "embedding", nlist = 8)
      .search(queries, "vec_id", "embedding", k = 5, nprobe = 8)
      .collect().map(_.toString).sorted.toSeq
    assert(appended.nonEmpty && appended == full)
  }

  test("streaming three-batch append equals the one-shot batch append " +
      "and brute force (the query-level closure)") {
    val stream = SparkEntry.queries("sim_ivf_append_stream")(spark, dir)
      .collect().map(_.toString).toSeq
    val batch = SparkEntry.queries("sim_ivf_append")(spark, dir)
      .collect().map(_.toString).toSeq
    val brute = SparkEntry.queries("sim_knn_brute")(spark, dir)
      .collect().map(_.toString).toSeq
    assert(stream.nonEmpty && stream == batch,
      "stream-appended index diverged from the batch-appended one")
    assert(stream == brute,
      "exhaustive probe over the appended index diverged from brute force")
  }

  test("append to an index with gapped centroid ids fails the same" +
      " validation as search (row index must equal cent_id)") {
    val tmp = Files.createTempDirectory("graft_ivf_gap").toString
    IvfIndex.build(corpus, "vec_id", "embedding", nlist = 4)
      .save(s"$tmp/idx")
    // doctor the persisted centroids: ids 0,1,2,3 -> 0,1,2,7 (gapped);
    // an unvalidated append would assign by row index != cent_id and
    // silently bucket the batch wrongly
    val doctored = spark.read.parquet(s"$tmp/idx/centroids")
      .withColumn("cent_id",
        when(col("cent_id") === 3, 7).otherwise(col("cent_id")))
      .collect()
    import spark.implicits._
    doctored.map(r => (r.getInt(0), r.getSeq[Double](1).toVector)).toSeq
      .toDF("cent_id", "cv").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/idx/centroids")
    val err = intercept[IllegalArgumentException] {
      IvfIndex.append(spark, s"$tmp/idx", corpus, "vec_id", "embedding")
    }
    assert(err.getMessage.contains("centroid ids must be 0.."))
  }
}
