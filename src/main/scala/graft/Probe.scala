package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad: ad-hoc plan/exactness probes. Not part of the
  * driver contract; edited freely during development.
  *
  * Current probe: stage-by-stage timing of the dd_minhash_lsh pipeline
  * at the derived sf1* point, to locate its 53.7 s (round-10 curve).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "target/scale/sf1"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stage] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    Tables(spark, dir, "documents").count() // warm

    val ShingleK = 3; val NumPerms = 128; val BandRows = 4
    val docs = Tables(spark, dir, "documents")
    val sh = docs.select(col("doc_id"),
        explode(graft.functions.WordShingles(col("text"), ShingleK)).as("g"))
      .distinct()
    t("shingles distinct")(println(sh.count()))
    val sigs = docs
      .select(col("doc_id"),
        graft.functions.WordShingles(col("text"), ShingleK).as("gs"))
      .filter(size(col("gs")) > 0)
      .withColumn("sig", graft.functions.MinHashSignature(col("gs"), NumPerms))
    t("signatures")(println(sigs.count()))
    val bands = sigs
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(NumPerms / BandRows - 1)),
          b => xxhash64(b, slice(col("sig"), b * BandRows + 1, lit(BandRows)))))
          .as(Seq("band", "band_key")))
    t("bands")(println(bands.count()))
    val ca = bands.select(col("doc_id").as("doc_a"), col("band"), col("band_key"))
    val cb = bands.select(col("doc_id").as("doc_b"), col("band"), col("band_key"))
    val candidates = ca.join(cb, Seq("band", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
    t("candidates")(println(candidates.count()))
    val sets = sh.groupBy(col("doc_id")).agg(collect_set(col("g")).as("gs"))
    val out = candidates
      .join(sets.select(col("doc_id").as("doc_a"), col("gs").as("ga")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("gs").as("gb")), "doc_b")
      .withColumn("n_inter", size(array_intersect(col("ga"), col("gb"))))
      .withColumn("n_union",
        size(col("ga")) + size(col("gb")) - col("n_inter"))
      .withColumn("jaccard", col("n_inter").cast("double") / col("n_union"))
      .filter(col("jaccard") >= 0.5)
    t("verified pairs")(println(out.count()))
    t("full query (registered)")(
      println(SparkEntry.queries("dd_minhash_lsh")(spark, dir).count()))
    spark.stop()
  }
}
