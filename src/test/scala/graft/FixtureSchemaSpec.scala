package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture-schema canary: the driver regenerates the parquet fixtures
  * between rounds and has already flipped `events.ts` between physical
  * vintages once (TIMESTAMP(NANOS) → timestamp[us]), which cost 40
  * queries in one round. This spec makes the next flip cost exactly one
  * red test with a one-line diagnosis:
  *   - pins the NORMALIZED events schema every operator consumes
  *     (ts: TimestampType, µs precision preserved);
  *   - runs the Tables loader over BOTH known vintages (legacy raw-long
  *     nanos and native timestamp[us]) and asserts identical values;
  *   - asserts an unknown vintage fails loudly in the loader, not as
  *     40 downstream analysis errors.
  */
class FixtureSchemaSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-fixture-canary")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  test("events fixture loads with the pinned normalized schema") {
    val ev = Tables(spark, dir, "events")
    val expected = Map(
      "event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType)
    val actual = ev.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(actual == expected,
      s"events schema drifted — driver fixtures changed vintage? got: " +
        ev.schema.simpleString +
        " (teach Tables.normalizeEventsTs the new shape)")
    // micros precision must survive normalization: sub-second parts
    // exist in the fixture and are not all zero
    val subSec = ev.filter(unix_micros(col("ts")) % 1000000L =!= 0L).count()
    assert(subSec > 0,
      "events.ts lost sub-second precision in the loader — " +
        "truncation bug in Tables.normalizeEventsTs")
  }

  test("legacy raw-long-nanos vintage normalizes to the same values") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_nanos_vintage")
    try {
      // stage the same rows with ts as raw long nanos — the physical
      // shape the nanosAsLong conf produces for TIMESTAMP(NANOS) files
      Tables(spark, dir, "events")
        .withColumn("ts", unix_micros(col("ts")) * 1000L)
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$tmp/events.parquet")
      val legacy = Tables(spark, tmp.toString, "events")
      assert(legacy.schema("ts").dataType == TimestampType)
      val native = Tables(spark, dir, "events")
      assert(legacy.select("event_id", "ts").exceptAll(
        native.select("event_id", "ts")).isEmpty,
        "legacy-nanos vintage decodes to different timestamps than " +
          "the native timestamp[us] vintage")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
  }

  test("streaming tier handles both ts vintages identically") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_nanos_stream")
    try {
      // the fixture shape is one flat FILE named events.parquet (the
      // streaming source's pathGlobFilter matches leaf file names), so
      // write to a scratch dir and move the single part file in place
      Tables(spark, dir, "events")
        .withColumn("ts", unix_micros(col("ts")) * 1000L)
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$tmp/stage")
      val part = new java.io.File(s"$tmp/stage").listFiles()
        .find(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$tmp/events.parquet"))
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"$tmp/stage"))
      val legacy = SparkEntry.queries("evs_hourly_tumbling")(spark, tmp.toString)
      val native = SparkEntry.queries("evs_hourly_tumbling")(spark, dir)
      assert(legacy.count() == native.count() && legacy.count() > 100,
        s"vintage mismatch: legacy ${legacy.count()} windows vs " +
          s"native ${native.count()}")
      assert(legacy.exceptAll(native).isEmpty,
        "legacy-nanos streaming windows differ from native timestamp[us]")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
  }

  test("unknown ts vintage fails loudly in the loader") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_bad_vintage")
    try {
      Tables(spark, dir, "events").limit(5)
        .withColumn("ts", col("ts").cast(StringType))
        .write.mode("overwrite").parquet(s"$tmp/events.parquet")
      val e = intercept[IllegalStateException] {
        Tables(spark, tmp.toString, "events")
      }
      assert(e.getMessage.contains("unsupported type"))
      assert(e.getMessage.contains("normalizeEventsTs"))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
  }
}
