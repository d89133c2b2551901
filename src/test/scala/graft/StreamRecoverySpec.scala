package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint recovery — the streaming property a long-lived 100 TB
  * deployment actually relies on and run-to-completion gates never
  * exercise: a stream stopped mid-input and RESTARTED from its
  * checkpoint must (a) not reprocess source files it already
  * committed, (b) restore its aggregation state so counts continue
  * instead of resetting, and (c) end with exactly the batch-equivalent
  * answer over everything that ever arrived. All three are asserted
  * against a real on-disk checkpoint across two separate query
  * incarnations of the same plan.
  */
class StreamRecoverySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-stream-recovery")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val schema = StructType(Seq(
    StructField("user_id", LongType),
    StructField("n", LongType)))

  private def writeInput(dir: String, name: String,
      rows: Seq[(Long, Long)]): Unit = {
    import spark.implicits._
    rows.toDF("user_id", "n").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/$name")
  }

  test("restart from checkpoint: no reprocessing, state restored, exactly-once totals") {
    val root = java.nio.file.Files.createTempDirectory("graft_recovery")
    val input = s"$root/in"
    val ckpt = s"$root/ckpt"
    try {
      // per-incarnation record of (batchId, rows-in-batch, per-user sums)
      val seen =
        new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
      val latest = new java.util.concurrent.ConcurrentHashMap[Long, Long]()

      def startQuery() = {
        spark.readStream.schema(schema)
          .option("recursiveFileLookup", "true")
          .parquet(input)
          .groupBy(col("user_id")).agg(sum(col("n")).as("total"))
          .writeStream
          .option("checkpointLocation", ckpt)
          .outputMode("update")
          .foreachBatch { (batch: DataFrame, id: Long) =>
            seen.add((id, batch.count()))
            batch.collect().foreach(r =>
              latest.put(r.getLong(0), r.getLong(1)))
            ()
          }
          .start()
      }

      // incarnation 1: two users arrive
      writeInput(input, "b1", Seq((1L, 10L), (2L, 5L)))
      val q1 = startQuery()
      try q1.processAllAvailable() finally q1.stop()
      assert(latest.get(1L) == 10L && latest.get(2L) == 5L)
      val batchesBeforeRestart = seen.size

      // more data lands while the stream is DOWN
      writeInput(input, "b2", Seq((1L, 7L), (3L, 2L)))

      // incarnation 2: same plan, same checkpoint
      val q2 = startQuery()
      try q2.processAllAvailable() finally q2.stop()

      // (a) the restart processed ONLY the new file: exactly one new
      // micro-batch, sized to b2's rows (update mode emits only
      // changed keys) — a reprocessed b1 would surface as extra
      // batches or a 4-row update
      val newBatches = seen.size - batchesBeforeRestart
      assert(newBatches == 1,
        s"restart replayed committed source files: $newBatches new batches")
      assert(seen.toArray.last.asInstanceOf[(Long, Long)]._2 == 2L,
        s"restart batch should hold exactly b2's 2 rows: $seen")

      // (b) state restored: user 1's total CONTINUES from the
      // pre-restart 10 (10 + 7), it does not reset to 7
      assert(latest.get(1L) == 17L,
        s"aggregation state lost across restart: user 1 = ${latest.get(1L)}")

      // (c) exactly-once batch equivalence over everything that arrived
      assert(latest.get(2L) == 5L && latest.get(3L) == 2L)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(root.toFile)
  }

  /** The same restart contract under the state-store configuration a
    * long-lived deployment actually runs: RocksDB provider WITH
    * changelog checkpointing. Changelog checkpointing commits a delta
    * of state changes per micro-batch instead of re-uploading SST
    * snapshots, which is the low-commit-latency mode the Scaladoc at
    * EventStream.RocksDbProvider recommends for production; recovery
    * then has to REPLAY the changelog on top of the last snapshot, so a
    * restart exercises a genuinely different code path than the
    * snapshot-only default. Asserts the full contract: committed files
    * are not reprocessed, changelog-replayed state continues (not
    * resets), and totals are batch-equivalent.
    */
  test("RocksDB + changelog checkpointing: restart replays the changelog, state continues") {
    val root = java.nio.file.Files.createTempDirectory("graft_rocks_changelog")
    val input = s"$root/in"
    val ckpt = s"$root/ckpt"
    try {
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      ss.conf.set("spark.sql.streaming.stateStore.providerClass",
        streaming.EventStream.RocksDbProvider)
      ss.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true")

      val seen =
        new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
      val latest = new java.util.concurrent.ConcurrentHashMap[Long, Long]()

      def startQuery() = {
        ss.readStream.schema(schema)
          .option("recursiveFileLookup", "true")
          .parquet(input)
          .groupBy(col("user_id")).agg(sum(col("n")).as("total"))
          .writeStream
          .option("checkpointLocation", ckpt)
          .outputMode("update")
          .foreachBatch { (batch: DataFrame, id: Long) =>
            seen.add((id, batch.count()))
            batch.collect().foreach(r =>
              latest.put(r.getLong(0), r.getLong(1)))
            ()
          }
          .start()
      }

      // incarnation 1: several micro-batches so the checkpoint holds a
      // snapshot + changelog history, not just batch 0
      writeInput(input, "b1", Seq((1L, 10L), (2L, 5L)))
      val q1 = startQuery()
      try {
        q1.processAllAvailable()
        writeInput(input, "b2", Seq((1L, 4L)))
        q1.processAllAvailable()
      } finally q1.stop()
      assert(latest.get(1L) == 14L && latest.get(2L) == 5L)
      val batchesBeforeRestart = seen.size

      // the changelog files must actually exist in the checkpoint —
      // otherwise this test silently degraded to snapshot mode
      val changelogs = java.nio.file.Files.walk(root.resolve("ckpt"))
        .filter(p => p.toString.endsWith(".changelog")).count()
      assert(changelogs > 0,
        "no .changelog files in checkpoint: changelog checkpointing did not engage")

      // data lands while the stream is down; incarnation 2 restores
      // from snapshot + changelog replay
      writeInput(input, "b3", Seq((1L, 7L), (3L, 2L)))
      val q2 = startQuery()
      try q2.processAllAvailable() finally q2.stop()

      val newBatches = seen.size - batchesBeforeRestart
      assert(newBatches == 1,
        s"restart replayed committed source files: $newBatches new batches")
      assert(latest.get(1L) == 21L,
        s"changelog-replayed state lost across restart: user 1 = ${latest.get(1L)}")
      assert(latest.get(2L) == 5L && latest.get(3L) == 2L)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(root.toFile)
  }

  /** CDC-apply recovery: the foreachBatch MERGE into key-partitioned
    * state (the evs_cdc_apply shape) restarted mid-stream. Change
    * versions v1-v2 apply in incarnation 1; v3 lands while the stream
    * is down; incarnation 2 resumes from the checkpoint and applies
    * only v3. The latest-version-per-key merge is idempotent, so even
    * a re-delivered micro-batch (foreachBatch's at-least-once
    * contract) cannot corrupt state — asserted by the final table
    * matching the batch compaction of the full log, with deletes
    * honored and the re-upserted key resurrected.
    */
  test("CDC apply restarts from checkpoint: merge is idempotent, state correct") {
    val root = java.nio.file.Files.createTempDirectory("graft_cdc_recovery")
    val input = s"$root/in"
    val ckpt = s"$root/ckpt"
    val stateDir = s"$root/state"
    val cdcSchema = StructType(Seq(
      StructField("k", LongType), StructField("v", LongType),
      StructField("op", StringType), StructField("payload", LongType),
      StructField("kb", IntegerType)))
    try {
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      ss.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      import ss.implicits._

      def writeVersion(name: String, rows: Seq[(Long, Long, String, Long)])
          : Unit =
        rows.toDF("k", "v", "op", "payload")
          .withColumn("kb", (col("k") % 4).cast("int"))
          .coalesce(1).write.mode("overwrite").parquet(s"$input/$name")

      def startQuery() = {
        ss.readStream.schema(cdcSchema)
          .option("recursiveFileLookup", "true")
          .parquet(input)
          .writeStream
          .option("checkpointLocation", ckpt)
          .foreachBatch { (batch: DataFrame, _: Long) =>
            if (!batch.isEmpty) {
              val s2 = batch.sparkSession
              val b = batch.localCheckpoint()
              val touched = b.select(col("kb")).distinct()
              val cur =
                if (new java.io.File(stateDir).exists())
                  s2.read.schema(cdcSchema).parquet(stateDir)
                    .join(broadcast(touched), Seq("kb")).localCheckpoint()
                else s2.createDataFrame(
                  new java.util.ArrayList[org.apache.spark.sql.Row](),
                  cdcSchema)
              cur.unionByName(b)
                .withColumn("rn", org.apache.spark.sql.functions.row_number()
                  .over(org.apache.spark.sql.expressions.Window
                    .partitionBy(col("k")).orderBy(col("v").desc)))
                .filter(col("rn") === 1).drop("rn")
                .repartition(col("kb"))
                .write.mode("overwrite").partitionBy("kb").parquet(stateDir)
              ()
            }
          }
          .start()
      }

      // incarnation 1: v1 upserts keys 1-4, v2 updates k=2 and deletes k=3
      writeVersion("v1", Seq((1L, 1L, "U", 10L), (2L, 1L, "U", 20L),
        (3L, 1L, "U", 30L), (4L, 1L, "U", 40L)))
      val q1 = startQuery()
      try {
        q1.processAllAvailable()
        writeVersion("v2", Seq((2L, 2L, "U", 25L), (3L, 2L, "D", 0L)))
        q1.processAllAvailable()
      } finally q1.stop()

      // v3 lands while down: k=3 resurrected, k=5 inserted
      writeVersion("v3", Seq((3L, 3L, "U", 35L), (5L, 3L, "U", 50L)))
      val q2 = startQuery()
      try q2.processAllAvailable() finally q2.stop()

      val state = ss.read.schema(cdcSchema).parquet(stateDir)
        .filter(col("op") =!= "D")
        .select(col("k"), col("v"), col("payload"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(state == Set((1L, 1L, 10L), (2L, 2L, 25L), (3L, 3L, 35L),
        (4L, 1L, 40L), (5L, 3L, 50L)),
        s"CDC state wrong after restart: $state")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(root.toFile)
  }

  /** The sink side of recovery: a parquet file sink's commit log makes
    * re-delivered micro-batches idempotent — restarting from a
    * checkpoint whose last batch already committed to the sink must
    * not duplicate rows in the sink directory.
    */
  test("file sink + checkpoint restart never duplicates committed rows") {
    val root = java.nio.file.Files.createTempDirectory("graft_sink_recovery")
    val input = s"$root/in"
    val ckpt = s"$root/ckpt"
    val out = s"$root/out"
    try {
      def startQuery() = {
        spark.readStream.schema(schema)
          .option("recursiveFileLookup", "true")
          .parquet(input)
          .select(col("user_id"), col("n"))
          .writeStream
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .format("parquet")
          .option("path", out)
          .start()
      }
      writeInput(input, "b1", Seq((1L, 10L), (2L, 5L)))
      val q1 = startQuery()
      try q1.processAllAvailable() finally q1.stop()

      writeInput(input, "b2", Seq((3L, 2L)))
      val q2 = startQuery()
      try q2.processAllAvailable() finally q2.stop()

      val sunk = spark.read.parquet(out)
      assert(sunk.count() == 3,
        s"sink duplicated or lost rows across restart: ${sunk.count()}")
      assert(sunk.agg(sum(col("n"))).collect()(0).getLong(0) == 17L)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(root.toFile)
  }

  /** The CDC-apply bucket count is a sizing parameter, not baked-in
    * semantics: the merged state summary must be identical at any
    * bucket granularity (buckets only trade partition-prune width
    * against file count — CdcApply's sizing rule).
    */
  test("CDC apply is bucket-count invariant (non-default granularity)") {
    val dir = "/root/testdata/sf0.001"
    def rows(buckets: Int): Seq[String] =
      graft.streaming.CdcApply(spark, dir, buckets)
        .collect().map(_.mkString("|")).toSeq
    val default = rows(16)
    assert(default.nonEmpty)
    assert(rows(5) == default)
  }
}
