package graft

import org.apache.spark.sql.SparkSession

/** Dev scratchpad: ad-hoc plan/exactness probes. Not part of the
  * driver contract; edited freely during development.
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
    val dir = "/root/testdata/sf0.1"
    Tables(spark, dir, "orders").count() // warm
    if (args.isEmpty) {
      import org.apache.spark.sql.functions._
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[stage] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        r
      }
      val docs = Tables(spark, dir, "documents")
      t("scan documents")(docs.count())
      val sh = docs.select(col("doc_id"),
        explode(graft.functions.WordShingles(col("text"), 3)).as("g"))
      t("shingle explode count")(sh.count())
      val shc = t("shingle cache")(({ val c = sh.cache(); c.count(); c }))
      val buckets = shc.groupBy(col("g")).agg(collect_list(col("doc_id")).as("ds"))
        .filter(size(col("ds")).between(2, 64))
      t("buckets")(buckets.count())
      val pairs = buckets
        .select(explode(flatten(transform(col("ds"), a =>
          transform(filter(col("ds"), b => b > a),
            b => struct(a.as("doc_a"), b.as("doc_b")))))).as("p"))
        .select(col("p.doc_a"), col("p.doc_b"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("n_inter"))
      t("pairs agg")(pairs.count())
      t("full jaccard")(SparkEntry.queries("dd_ngram_jaccard")(spark, dir).count())
      t("components")(SparkEntry.queries("dd_components")(spark, dir).count())
      t("components again")(SparkEntry.queries("dd_components")(spark, dir).count())
    }
    for (q <- args) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, dir).count()
      println(f"$q: $n rows in ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
