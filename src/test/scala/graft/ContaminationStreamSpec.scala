package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** The streaming decontamination gate (cp_contamination_stream):
  *
  *   1. stream-vs-batch equality on the fixture — gating arriving
  *      train candidates per micro-batch against the frozen eval
  *      grams produces exactly the verdicts one batch screen over the
  *      same docs produces;
  *   2. checkpoint restart across a REAL two-arrival stream — the
  *      gate stops after arrival 1, a new query resumes from the same
  *      checkpoint, arrival 2 lands, and the union of batch-dir
  *      verdicts covers every arrived doc exactly once (the
  *      StreamRecoverySpec contract: no reprocessing, no gaps).
  *
  * The corpus carries a KNOWN planted leak: one arriving doc embeds a
  * verbatim 15-token run of an eval doc, so the leaky verdict is
  * exercised on a positive, not just absence.
  */
class ContaminationStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val K = 13

  private val docsSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Synthesize (doc_id, text) with ids whose split buckets are known:
    * returns (evalDocs, arrivingBatch1, arrivingBatch2). The planted
    * leak copies 15 consecutive tokens of an eval doc into a batch-2
    * arrival.
    */
  private def synthesize(): (Seq[(Long, String)], Seq[(Long, String)],
      Seq[(Long, String)]) = {
    val rnd = new scala.util.Random(4242L)
    def words(n: Int, tag: String): Seq[String] =
      Seq.fill(n)(s"$tag${rnd.nextInt(2000)}")
    def bucket(id: Long): Long = {
      // mirror of CorpusPipeline.hashBucket("doc_id", "split:", 100)
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"split:$id".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(6)
      java.lang.Long.parseLong(hex, 16) % 100
    }
    val ids = (0L until 4000L)
    val evalIds = ids.filter(bucket(_) >= 90).take(6)
    val trainIds = ids.filter(bucket(_) < 80).take(14)
    val evalDocs = evalIds.map(id => id -> words(30, "e").mkString(" "))
    val (b1Ids, b2Ids) = trainIds.splitAt(7)
    val b1 = b1Ids.map(id => id -> words(25, "t").mkString(" "))
    val leakRun = evalDocs.head._2.split(" ").slice(5, 20) // 15 tokens
    val b2 = b2Ids.zipWithIndex.map { case (id, i) =>
      if (i == 0)
        id -> (words(8, "t") ++ leakRun ++ words(8, "t")).mkString(" ")
      else id -> words(25, "t").mkString(" ")
    }
    (evalDocs, b1, b2)
  }

  private def toDocsDf(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("two-arrival stream with checkpoint RESTART: verdicts equal the " +
    "batch screen, every doc exactly once, planted leak caught") {
    val (evalDocs, b1, b2) = synthesize()
    val work = java.nio.file.Files.createTempDirectory("graft_cstream_spec")
    val arrivals = work.resolve("arrivals")
    java.nio.file.Files.createDirectories(arrivals)
    val ckpt = work.resolve("ckpt").toString
    val verdictDir = work.resolve("verdicts").toString

    // the eval docs' ids were picked with bucket >= 90, so
    // evalGramSet's internal split filter passes all of them
    val evalGrams = graft.queries.Corpus
      .evalGramSet(toDocsDf(evalDocs), K).localCheckpoint()

    def startGate() = spark.readStream.schema(docsSchema)
      .option("pathGlobFilter", "*.parquet").parquet(arrivals.toString)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          graft.queries.Corpus.screenAgainstEval(batch, evalGrams, K)
            .write.mode("overwrite").parquet(s"$verdictDir/b$batchId")
      }
      .start()

    def arrive(name: String, rows: Seq[(Long, String)]): Unit = {
      val tmp = work.resolve(s"$name.tmp")
      toDocsDf(rows).coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val listing = java.nio.file.Files.list(tmp)
      try listing
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .forEach(f => java.nio.file.Files.move(f,
          arrivals.resolve(s"$name.parquet")))
      finally listing.close()
    }

    // arrival 1, then STOP the gate entirely
    arrive("b1", b1)
    val q1 = startGate()
    try q1.processAllAvailable() finally q1.stop()

    // arrival 2 lands while the gate is DOWN; a new query resumes
    // from the same checkpoint and must pick up only the new file
    arrive("b2", b2)
    val q2 = startGate()
    try q2.processAllAvailable() finally q2.stop()

    val got = spark.read.option("recursiveFileLookup", "true")
      .parquet(verdictDir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_grams"), r.getAs[Long]("n_shared"),
          r.getAs[Boolean]("leaky")))
    // exactly once: no doc screened twice across the restart
    assert(got.map(_._1).distinct.length == got.length,
      "restart reprocessed an arrival")
    assert(got.length == b1.length + b2.length, "an arrival was missed")

    // equality with one batch screen over the same docs
    val expected = graft.queries.Corpus
      .screenAgainstEval(toDocsDf(b1 ++ b2), evalGrams, K)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_grams"), r.getAs[Long]("n_shared"),
          r.getAs[Boolean]("leaky")))
    assert(got.toMap == expected.toMap)

    // the planted 15-token leak yields 15 - 13 + 1 = 3 shared grams
    val leaker = got.toMap.apply(b2.head._1)
    assert(leaker._3 && leaker._2 == 3L, s"planted leak misread: $leaker")
    assert(got.count(_._2._3) == 1, "exactly one doc leaks")

    org.apache.commons.io.FileUtils.deleteQuietly(work.toFile)
  }

  test("corpus with no train-split docs yields an EMPTY verdict frame, " +
    "not a missing-dir failure") {
    val (evalDocs, _, _) = synthesize()
    // fixture dir whose documents are ALL eval-bucket (>= 90): the
    // gate's foreachBatch never writes, so the final read must fall
    // back to the published empty frame
    val fix = java.nio.file.Files.createTempDirectory("graft_cstream_empty")
    toDocsDf(evalDocs).write.mode("overwrite")
      .parquet(fix.resolve("documents.parquet").toString)
    val out = graft.SparkEntry.queries("cp_contamination_stream")(
      spark, fix.toString)
    assert(out.columns.toSeq ==
      Seq("doc_id", "n_grams", "n_shared", "leaky"))
    assert(out.count() == 0L)
    org.apache.commons.io.FileUtils.deleteQuietly(fix.toFile)
  }
}
