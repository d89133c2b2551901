package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scratchpad: ad-hoc plan/exactness probes. Not part of the
  * driver contract; edited freely during development.
  *
  * Current probe: A/B of dd_prefix_jaccard's candidate stage at sf1*
  * — old shape (distinct + size filter) vs new shape (PPJoin
  * count-based positional filter) — interleaved reps in one JVM so
  * machine state can't favor either.
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
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stage] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    Tables(spark, dir, "documents").count() // warm
    val ShingleK = 3
    val tt = 0.5

    def pipeline(positional: Boolean): DataFrame = {
      val sh = Tables(spark, dir, "documents")
        .select(col("doc_id"),
          explode(graft.functions.WordShingles(col("text"), ShingleK)).as("g"))
        .distinct()
      val dfreq = sh.groupBy(col("g")).agg(count(lit(1)).as("df"))
      val docs = sh.join(dfreq, "g")
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct(col("df"), col("g"))))
          .as("sorted"), count(lit(1)).as("n"))
        .withColumn("p", col("n") - ceil(lit(tt) * col("n")).cast("int") + 1)
      val cands = if (!positional) {
        val prefixes = docs
          .select(col("doc_id"), col("n"),
            explode(slice(col("sorted"), lit(1), col("p").cast("int"))).as("pg"))
          .select(col("doc_id"), col("n"), col("pg.g").as("g"))
        prefixes.groupBy(col("g"))
          .agg(collect_list(struct(col("doc_id"), col("n"))).as("ds"))
          .filter(size(col("ds")) >= 2)
          .select(explode(flatten(transform(col("ds"), a =>
            transform(filter(col("ds"), b => b.getField("doc_id") >
                a.getField("doc_id")),
              b => struct(a.getField("doc_id").as("doc_a"),
                b.getField("doc_id").as("doc_b"),
                a.getField("n").as("na"), b.getField("n").as("nb"))))))
            .as("c"))
          .select(col("c.doc_a"), col("c.doc_b"), col("c.na"), col("c.nb"))
          .distinct()
          .filter(least(col("na"), col("nb")) >=
            ceil(lit(tt) * greatest(col("na"), col("nb"))))
      } else {
        val prefixes = docs
          .select(col("doc_id"), col("n"),
            posexplode(slice(col("sorted"), lit(1), col("p").cast("int")))
              .as(Seq("pos0", "pg")))
          .select(col("doc_id"), col("n"), (col("pos0") + 1).as("pos"),
            col("pg.g").as("g"))
        val alpha = lit(tt / (1 + tt)) * (col("na") + col("nb")) - lit(1e-9)
        prefixes.groupBy(col("g"))
          .agg(collect_list(struct(col("doc_id"), col("n"), col("pos")))
            .as("ds"))
          .filter(size(col("ds")) >= 2)
          .select(explode(flatten(transform(col("ds"), a =>
            transform(filter(col("ds"), b => b.getField("doc_id") >
                a.getField("doc_id")),
              b => struct(a.getField("doc_id").as("doc_a"),
                b.getField("doc_id").as("doc_b"),
                a.getField("n").as("na"), b.getField("n").as("nb"),
                a.getField("pos").as("pa"), b.getField("pos").as("pb"))))))
            .as("c"))
          .select(col("c.doc_a"), col("c.doc_b"), col("c.na"), col("c.nb"),
            col("c.pa"), col("c.pb"))
          .groupBy(col("doc_a"), col("doc_b"), col("na"), col("nb"))
          .agg(count(lit(1)).as("shared"),
            max(col("pa")).as("mpa"), max(col("pb")).as("mpb"))
          .filter(col("shared") +
            least(col("na") - col("mpa"), col("nb") - col("mpb")) >= alpha)
          .filter(least(col("na"), col("nb")) >=
            ceil(lit(tt) * greatest(col("na"), col("nb"))))
          .select(col("doc_a"), col("doc_b"), col("na"), col("nb"))
      }
      val docArrs = docs.select(col("doc_id"),
        transform(col("sorted"), x => x.getField("g")).as("gs"))
      if (sys.env.contains("PROBE_CANDS_ONLY")) return cands
      cands
        .join(docArrs.withColumnRenamed("doc_id", "doc_a")
          .withColumnRenamed("gs", "ga"), "doc_a")
        .join(docArrs.withColumnRenamed("doc_id", "doc_b")
          .withColumnRenamed("gs", "gb"), "doc_b")
        .withColumn("n_inter",
          size(array_intersect(col("ga"), col("gb"))).cast("long"))
        .withColumn("n_union", col("na") + col("nb") - col("n_inter"))
        .withColumn("jaccard", col("n_inter").cast("double") / col("n_union"))
        .filter(col("jaccard") >= tt)
    }

    // candidate-stage pruning comparison at the bench SF
    for (positional <- Seq(false, true))
      t(s"cands positional=$positional")(
        println(pipeline(positional).count()))
    spark.stop()
  }
}
