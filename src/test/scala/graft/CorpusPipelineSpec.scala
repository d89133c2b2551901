package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.CorpusPipeline

/** Unit coverage for the corpus-curation library API (the composed
  * path is oracle-checked end-to-end as `cp_curation_pipeline`).
  */
class CorpusPipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta"), // diverse
    (2L, "spam spam spam spam spam spam spam spam"), // repetitive
    (3L, "alpha beta gamma delta epsilon zeta eta theta"), // dup of 1
    (4L, "one two three four five six seven eight nine ten")
  ).toDF("doc_id", "text")

  test("qualityFilter drops repetitive documents, keeps diverse ones") {
    val kept = CorpusPipeline.qualityFilter(docs, "text",
      maxRepeated5gramRatio = 0.2, minDistinctWordRatio = 0.5)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.sameElements(Array(1L, 3L, 4L)))
  }

  test("dedupExact keeps the minimum-id row per identical text") {
    val uniq = CorpusPipeline.dedupExact(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(uniq.sameElements(Array(1L, 2L, 4L)))
    // original schema preserved
    assert(CorpusPipeline.dedupExact(docs, "doc_id", "text").columns
      .sameElements(docs.columns))
  }

  test("withSplit is a pure function of the id — stable across runs and layouts") {
    val a = CorpusPipeline.withSplit(docs, "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val b = CorpusPipeline.withSplit(docs.repartition(3), "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(a == b)
    // percentages route through the bucket: 100% train ⇒ all train
    val all = CorpusPipeline.withSplit(docs, "doc_id", trainPct = 100)
      .select("split").distinct().as[String].collect()
    assert(all.sameElements(Array("train")))
  }

  test("splitStats aggregates count, chars, and first id per split") {
    val staged = CorpusPipeline.withSplit(
      docs.withColumn("n_chars", length(col("text"))), "doc_id",
      trainPct = 100)
    val row = CorpusPipeline.splitStats(staged, "doc_id", "n_chars")
      .collect()(0)
    assert(row.getString(0) == "train")
    assert(row.getLong(1) == 4L)
    assert(row.getLong(3) == 1L)
  }

  test("pipeline config: valid TOML parses, invalid configs reject loudly") {
    import graft.corpus.PipelineConfig
    val ok = PipelineConfig.fromToml(
      """[pipeline]
        |stages = "quality_filter, split"  # comment survives stripping
        |[split]
        |train_pct = "70"
        |""".stripMargin)
    assert(ok.exists(_.stages == Seq("quality_filter", "split")))
    // reference posture: every malformed input is a hard, named error
    def err(toml: String): String =
      PipelineConfig.fromToml(toml).swap.getOrElse(fail(s"accepted: $toml"))
    assert(err("[quality_filter]\nx = \"1\"").contains("Unknown key"))
    assert(err("[pipeline]\nstages = \"nope\"").contains("Unknown stage"))
    assert(err("[bogus]\na = \"b\"").contains("Unknown section"))
    assert(err("[pipeline]\nstages = \"\"").contains("at least one"))
    assert(err("x = \"1\"").contains("outside any section"))
    assert(PipelineConfig.fromToml(
      """[pipeline]
        |stages = "dedup_exact"
        |[split]
        |salt = "s"
        |""".stripMargin).swap.exists(_.contains("not listed in stages")))
    // typed parameter errors surface at run construction
    val cfg = PipelineConfig.fromToml(
      """[pipeline]
        |stages = "split"
        |[split]
        |train_pct = "many"
        |""".stripMargin).toOption.get
    import spark.implicits._
    val docs = Seq((1L, "a b", 3L)).toDF("doc_id", "text", "n_chars")
    val e = intercept[IllegalArgumentException](cfg.run(docs, "doc_id", "text"))
    assert(e.getMessage.contains("not an integer"))
  }
}
