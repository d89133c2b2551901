package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derived "sf1" fixture: 10 × sf0.1, built once under
  * `target/scale/sf1`, used ONLY by [[ScaleCurve]] (the correctness
  * gate runs exclusively on the driver's own fixtures).
  *
  * Replication is salted so the scaled corpus keeps the workload's
  * character instead of degenerating into 10-way exact-duplicate
  * clusters (which would turn every LSH bucket into a clique and
  * measure dup-explosion, not scaling):
  *
  *  - `documents`: replica k>0 rewrites ~¼ of each document's words to
  *    replica-unique pseudo-words keyed by `xxhash64(doc_id, k, pos)`.
  *    Cross-replica Jaccard lands ≈0.6 — below the suite's 0.7/0.8
  *    near-dup thresholds, so fuzzy dedup still does real filtering
  *    work at every scale point. Vocabulary grows with corpus size
  *    (Heaps-law-shaped), which is what a real 10× crawl does.
  *  - `embeddings`: replica k>0 jitters each coordinate by a
  *    hash-seeded offset in [-0.05, 0.05) — ANN buckets spread rather
  *    than collapsing onto 10 identical points.
  *  - `events`: fresh user/event ids per replica (user cardinality
  *    scales 10×; per-user history depth stays constant — the shape a
  *    10× DAU site has).
  *  - facts (`lineitem`/`orders`/`customer`) get fresh key chains per
  *    replica; dimension tables (`region nation part supplier`) are
  *    copied once — facts outgrow dims, as in any real warehouse.
  *
  * All salting is hash-deterministic (no RNG), so the derived fixture
  * is byte-stable across builds and the curve is reproducible.
  */
object ScaleData {
  val dir = "target/scale/sf1"
  private val src = "/root/testdata/sf0.1"
  private val replicas = 10

  /** Build the derived fixture if absent; return its directory. */
  def ensure(spark: SparkSession): String = {
    val marker = Paths.get(s"$dir/_BUILT")
    if (!Files.exists(marker)) {
      build(spark)
      Files.createFile(marker)
    }
    dir
  }

  private def replicate(base: DataFrame)(salt: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until replicas).map(k => salt(base, k)).reduce(_ unionAll _)

  private def build(spark: SparkSession): Unit = {
    Files.createDirectories(Paths.get(dir))
    def write(name: String, df: DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$dir/$name.parquet")

    // dims: copy once
    Seq("region", "nation", "part", "supplier").foreach { t =>
      write(t, spark.read.parquet(s"$src/$t.parquet"))
    }

    write("documents", replicate(spark.read.parquet(s"$src/documents.parquet")) {
      (df, k) =>
        val salted = if (k == 0) df else df.withColumn("text",
          concat_ws(" ", transform(split(col("text"), " "), (w, i) => {
            val h = xxhash64(col("doc_id"), lit(k), i)
            when(pmod(h, lit(4)) === 0,
              concat(lit("zq"), pmod(h, lit(100000)).cast("string"))).otherwise(w)
          })))
        salted
          .withColumn("doc_id", col("doc_id") + lit(k.toLong * 10000000L))
          .withColumn("n_chars", length(col("text")))
          .select("doc_id", "text", "lang", "source", "n_chars")
    })

    write("embeddings", replicate(spark.read.parquet(s"$src/embeddings.parquet")) {
      (df, k) =>
        val jittered = if (k == 0) df else df.withColumn("embedding",
          transform(col("embedding"), (x, i) =>
            (x + (pmod(xxhash64(col("vec_id"), lit(k), i), lit(1000))
              .cast("double") / 10000.0 - 0.05)).cast("float")))
        jittered.withColumn("vec_id", col("vec_id") + lit(k.toLong * 10000000L))
          .select("vec_id", "embedding", "label")
    })

    write("events", replicate(Tables(spark, src, "events")) { (df, k) =>
      df.withColumn("event_id", col("event_id") + lit(k.toLong * 1000000000L))
        .withColumn("user_id", col("user_id") + lit(k.toLong * 10000000L))
    })

    write("lineitem", replicate(spark.read.parquet(s"$src/lineitem.parquet")) {
      (df, k) => df.withColumn("l_orderkey", col("l_orderkey") + lit(k.toLong * 1000000000L))
    })
    write("orders", replicate(spark.read.parquet(s"$src/orders.parquet")) {
      (df, k) =>
        df.withColumn("o_orderkey", col("o_orderkey") + lit(k.toLong * 1000000000L))
          .withColumn("o_custkey", col("o_custkey") + lit(k.toLong * 10000000L))
    })
    write("customer", replicate(spark.read.parquet(s"$src/customer.parquet")) {
      (df, k) => df.withColumn("c_custkey", col("c_custkey") + lit(k.toLong * 10000000L))
    })
  }
}
