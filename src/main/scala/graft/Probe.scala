package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{MinHashSignature, TextFns}

/** Dev scratchpad: ad-hoc plan/exactness probes. Not part of the
  * driver contract; edited freely during development.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    Tables(spark, dir, "documents").count() // warmup

    val docsHof = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        TextFns.shingles(TextFns.tokens(col("text")), 3).as("gs"))
    time("shingles HOF")(docsHof.select(sum(size(col("gs")))).collect())

    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        graft.functions.WordShingles(col("text"), 3).as("gs"))
      .filter(size(col("gs")) > 0)
    time("shingles codegen")(docs.select(sum(size(col("gs")))).collect())

    val sigs = docs
      .withColumn("sig", MinHashSignature(col("gs"), 128))
    time("sigs")(sigs.select(min(element_at(col("sig"), 1))).collect())

    val bands = sigs
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(31)),
          b => xxhash64(b, slice(col("sig"), b * 4 + 1, lit(4)))))
          .as(Seq("band", "band_key")))
    time("bands")(bands.count())

    val ca = bands.select(col("doc_id").as("doc_a"), col("band"), col("band_key"))
    val cb = bands.select(col("doc_id").as("doc_b"), col("band"), col("band_key"))
    val candidates = ca.join(cb, Seq("band", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
    time("candidates")(println("n_cand=" + candidates.count()))

    spark.stop()
  }
}
