package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke + properties the DuckDB oracle can't express
  * (sketch accuracy, streaming equivalences).
  */
class QueriesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle") {
    val oracles = SparkEntry.oracleSql.keySet
    val all = SparkEntry.queries.keySet
    assert(oracles.subsetOf(all))
    // the HLL sketch hashes a tolerance verdict and the streaming
    // sessions are sentinel-flushed, so even those two are oracle'd now
    assert((all -- oracles) == Set.empty[String])
  }

  test("mm_decode_wav containers parse under the JDK's own audio stack") {
    // independent-parser check: the PRODUCTION encoder's bytes
    // (queries.Multimodal.encodeWavPcm16 — the same function the query
    // runs in mapPartitions) must be a WAV that javax.sound (a parser
    // we did NOT write) also accepts, with the same format parameters
    // our chunk-walker reports, and sample payloads decoded verbatim
    val blob = "the quick brown fox".getBytes("UTF-8")
    val nSamples = 200
    val wav = graft.queries.Multimodal.encodeWavPcm16(blob, nSamples, 8000)
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val fmt = in.getFormat
    assert(fmt.getSampleRate == 8000f && fmt.getChannels == 1 &&
      fmt.getSampleSizeInBits == 16)
    assert(in.getFrameLength == nSamples.toLong)
    // javax.sound must hand back the exact PCM the encoder wrote
    val pcm = in.readAllBytes()
    assert(pcm.length == nSamples * 2)
    val first = ((pcm(1) << 8) | (pcm(0) & 0xff)).toShort
    assert(first == (((blob(0) & 0xff) - 128) * 256).toShort)
    in.close()
  }

  test("ta_vocab_hll: HLL estimate within 3x rsd of exact") {
    val rows = SparkEntry.queries("ta_vocab_hll")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("within_tolerance"),
        s"sketch outside 3-sigma tolerance for source ${r.get(0)}")
    }
  }

  test("dd_components on a corpus with no near-dup pairs returns empty, not NPE") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_nodups").toString
    Seq(
      (0L, "alpha beta gamma delta epsilon zeta", "en", "s", 30L),
      (1L, "one two three four five six", "en", "s", 25L),
      (2L, "red green blue yellow purple orange", "en", "s", 30L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("dd_components")(spark, tmp)
    assert(out.count() == 0)
  }

  test("true BPE count sits inside the pre-token/char bracket") {
    // the planning contract ta_bpe_token_count documents: merges never
    // cross pre-token boundaries, so pre-tokens lower-bound the true
    // count and non-space chars upper-bound it, on every document
    val bracket = SparkEntry.queries("ta_bpe_token_count")(spark, dir)
      .select("doc_id", "n_bpe").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = SparkEntry.queries("ta_bpe_true_count")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, nTrue, nPre) = (r.getLong(0), r.getInt(1), r.getInt(2))
      assert(nPre == bracket(id), s"doc $id: pre-token counts disagree")
      assert(nPre <= nTrue, s"doc $id: true BPE below the pre-token floor")
    }
  }

  test("weighted reservoir sample is biased toward heavy documents") {
    // deterministic given the fixture + salt: the n_chars-weighted
    // A-ES sample's mean weight must exceed the corpus mean (the
    // entire point of weighting), which no oracle row can express
    val sample = SparkEntry.queries("cp_reservoir_sample")(spark, dir)
      .agg(avg(col("w"))).collect()(0).getDouble(0)
    val corpus = Tables(spark, dir, "documents")
      .agg(avg(col("n_chars"))).collect()(0).getDouble(0)
    assert(sample > corpus,
      f"sample mean weight $sample%.1f not above corpus mean $corpus%.1f")
  }

  test("sentinel-flushed streaming sessions equal batch sessionization") {
    val streamed = SparkEntry.queries("evs_session_windows")(spark, dir).count()
    val batch = SparkEntry.queries("ev_sessionize")(spark, dir).count()
    assert(streamed > 0 && streamed == batch)
  }

  test("foreachBatch sink: streaming micro-batches land as parquet") {
    // the transactional-sink pattern for pushing streaming results to
    // systems without a native connector (e.g. a JDBC target): each
    // micro-batch arrives as a batch DataFrame with an id for
    // exactly-once bookkeeping
    val out = java.nio.file.Files.createTempDirectory("graft_febatch").toString
    val ss = spark.newSession()
    ss.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType)))
    val batchIds = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = ss.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .writeStream.outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        batchIds.add(id)
        batch.write.mode("overwrite").parquet(s"$out/batch_$id")
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    assert(!batchIds.isEmpty)
    val landed = spark.read.parquet(s"$out/batch_${batchIds.peek}")
    val expected = Tables(spark, dir, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    assert(landed.count() == expected.count())
    assert(landed.columns.sorted.sameElements(Array("n", "user_id")))
  }

}
