package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Multi-micro-batch drive of the streaming EWMA state machine — the
  * path the single-batch parquet fixture never exercises: out-of-order
  * arrivals landing in LATER micro-batches than newer events (within
  * the watermark), ring truncation at 20 across batch boundaries, and
  * the lifetime count surviving truncation.
  */
class EwmaStateSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(us: Long) = new java.sql.Timestamp(us / 1000)

  /** Driver replay of the batch semantics: last ≤20 by (us, id),
    * newest at k = 0, scale-18 decimal numerator.
    */
  private def expected(events: Seq[(Long, Long, Double)])
      : (Long, java.math.BigDecimal) = {
    val last = events.sortBy(e => (e._1, e._2)).takeRight(20).reverse
    var num = java.math.BigDecimal.ZERO
      .setScale(18, java.math.RoundingMode.UNNECESSARY)
    last.zipWithIndex.foreach { case ((_, _, v), k) =>
      num = num.add(new java.math.BigDecimal(v * math.pow(0.5, k))
        .setScale(18, java.math.RoundingMode.HALF_UP))
    }
    (math.min(events.size, 20).toLong, num)
  }

  test("out-of-order cross-batch arrivals and ring truncation match " +
    "the batch-window replay") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "2")
    import ss.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = ss.sqlContext
    val mem = MemoryStream[(Long, Long, Long, Double, java.sql.Timestamp)]
    val t0 = 1700000000000000L // µs
    val min = 60000000L
    val flushUs = t0 + 86400000000L // one day after the last real event

    // user 1: 4 events; the t0+5min arrival comes in batch 2, AFTER
    // batch 1 already delivered t0+10min — the regression ADVICE
    // flagged for sessions (state must not assume in-order batches)
    val u1 = Seq(
      (t0, 10L, 1.5), (t0 + 10 * min, 11L, 2.25),
      (t0 + 5 * min, 12L, 4.125), (t0 + 20 * min, 13L, 8.0625))
    // user 2: 25 events (ring must truncate to 20, total must stay 25),
    // odd indices delayed to batch 2 so truncation happens mid-merge
    val u2 = (0 until 25).map(i =>
      (t0 + i * min, 100L + i, 1.0 + i * 0.5))

    val b1 = u1.take(2).map(e => (1L, e._1, e._2, e._3, ts(e._1))) ++
      u2.zipWithIndex.collect { case (e, i) if i % 2 == 0 =>
        (2L, e._1, e._2, e._3, ts(e._1)) }
    val b2 = u1.drop(2).map(e => (1L, e._1, e._2, e._3, ts(e._1))) ++
      u2.zipWithIndex.collect { case (e, i) if i % 2 == 1 =>
        (2L, e._1, e._2, e._3, ts(e._1)) }
    val sentinelUs = t0 + 30L * 86400000000L

    val out = graft.streaming.EventStream.ewmaTransform(
      mem.toDS().withWatermark("_5", "30 minutes"), flushUs)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("ewma_test_sink").start()
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
      mem.addData((-1L, sentinelUs, -1L, 0.0, ts(sentinelUs)))
      q.processAllAvailable()
    } finally q.stop()

    val rows = ss.table("ewma_test_sink").collect()
      .filter(_.getLong(0) >= 0)
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDecimal(2).setScale(18)))
      .toMap
    assert(rows.keySet == Set(1L, 2L))
    val (n1, num1) = expected(u1)
    assert(rows(1L) == ((n1, num1)),
      s"user 1: got ${rows(1L)}, want ($n1, $num1)")
    val (n2, num2) = expected(u2)
    assert(n2 == 20L && rows(2L)._1 == 20L, "ring must cap n_window at 20")
    assert(rows(2L) == ((n2, num2)),
      s"user 2: got ${rows(2L)}, want ($n2, $num2)")
  }
}
