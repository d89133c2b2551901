package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-stream analytics over the `events` table, batch side:
  * tumbling/sliding time windows, gap-based sessionization, and
  * per-user activity profiles. The Structured Streaming counterparts
  * (watermark + window / session_window on the same data) live in
  * `graft.streaming.EventStream` and are exposed as the `evs_*`
  * queries with rows-only checks (streaming is outside DuckDB's
  * vocabulary).
  *
  * Scale notes: all aggregations key on (bucket, type) or user_id —
  * uniformly distributed at 100 TB; sessionization shuffles once on
  * user_id and sorts within partitions (Spark's window exec), which is
  * the canonical gaps-and-islands plan.
  *
  * Exactness: time buckets are integer µs arithmetic; `value` sums go
  * through decimal casts; durations are µs longs.
  */
object Events {

  /** Tumbling 1-hour windows by event type. */
  private def hourly(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 6)))
          .cast("double").as("total_value"))
      .orderBy(col("hour"), col("event_type"))
  }

  private val hourlySql =
    """SELECT date_trunc('hour', ts) AS hour, event_type,
      |  count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin

  /** Gap-based sessionization (gaps-and-islands): a new session starts
    * when a user is idle > 30 minutes. Integer µs epoch arithmetic
    * end-to-end.
    */
  private def sessionize(s: SparkSession, dir: String): DataFrame = {
    val gapUs = 30L * 60 * 1000000
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    Tables(s, dir, "events")
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("us"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1)
          .otherwise(0))
      .withColumn("session_seq",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("ts")).as("session_start"),
        count(lit(1)).as("n_events"),
        (max(col("us")) - min(col("us"))).as("dur_us"))
      .select(col("user_id"), col("session_seq"), col("session_start"),
        col("n_events"), col("dur_us"))
      .orderBy(col("user_id"), col("session_seq"))
  }

  private val sessionizeSql =
    """WITH marked AS (
      |  SELECT user_id, ts, epoch_us(ts) AS us,
      |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |numbered AS (
      |  SELECT *, sum(new_session) OVER (
      |    PARTITION BY user_id ORDER BY ts
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      |  FROM marked)
      |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
      |  min(ts) AS session_start,
      |  count(*) AS n_events, max(us) - min(us) AS dur_us
      |FROM numbered GROUP BY user_id, session_seq
      |ORDER BY user_id, session_seq""".stripMargin

  /** Sliding windows: 10-minute windows every 5 minutes (each event in
    * exactly 2 windows). Spark's native `window()` assignment; the
    * oracle reproduces it with integer µs bucket arithmetic.
    */
  private def sliding(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "events")
      .select(col("ts"), col("value"),
        window(col("ts"), "10 minutes", "5 minutes").as("w"))
      .select(col("w.start").as("w_start"), col("value"))
      .groupBy(col("w_start"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 6)))
          .cast("double").as("total_value"))
      .orderBy(col("w_start"))
  }

  private val slidingSql =
    """SELECT make_timestamp(((epoch_us(ts) // 300000000) - k) * 300000000)
      |    AS w_start,
      |  count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      |FROM events, (SELECT unnest([0, 1]) AS k)
      |GROUP BY 1 ORDER BY w_start""".stripMargin

  /** Spark's native session_window in batch mode — must produce
    * exactly the sessions the manual lag+cumsum construction
    * (ev_sessionize) finds; the oracle derives start/end/count from
    * the same gaps-and-islands CTE, so the two session definitions are
    * pinned to each other. session_window end = last event + gap.
    */
  private def sessionWindowBatch(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "events")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))
      .orderBy(col("user_id"), col("session_start"))
  }

  private val sessionWindowBatchSql =
    """WITH marked AS (
      |  SELECT user_id, ts,
      |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |numbered AS (
      |  SELECT *, sum(new_session) OVER (
      |    PARTITION BY user_id ORDER BY ts
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      |  FROM marked)
      |SELECT user_id, min(ts) AS session_start,
      |  max(ts) + INTERVAL 30 MINUTE AS session_end,
      |  count(*) AS n_events
      |FROM numbered GROUP BY user_id, session_seq
      |ORDER BY user_id, session_start""".stripMargin

  /** Per-user activity profile. */
  private def userStats(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"),
        sum(col("value").cast(DecimalType(18, 6)))
          .cast("double").as("total_value"))
      .orderBy(col("user_id"))
  }

  private val userStatsSql =
    """SELECT user_id, count(*) AS n_events,
      |  count(DISTINCT event_type) AS n_types,
      |  min(ts) AS first_ts, max(ts) AS last_ts,
      |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Semi-structured columns: parse the JSON `props` payload with a
    * declared schema (from_json — the schema-on-read path that scales;
    * string extraction would re-parse per field) and aggregate on the
    * extracted value.
    */
  private def jsonProps(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    Tables(s, dir, "events")
      .withColumn("k",
        from_json(col("props"), StructType(Seq(StructField("k", LongType))))
          .getField("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_with_k"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))
  }

  private val jsonPropsSql =
    """SELECT event_type,
      |  count(CAST(json_extract(props, '$.k') AS BIGINT)) AS n_with_k,
      |  CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  min(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
      |  max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("ev_json_props", jsonProps, Some(jsonPropsSql)),
    QueryDef("ev_hourly_by_type", hourly, Some(hourlySql)),
    QueryDef("ev_sessionize", sessionize, Some(sessionizeSql)),
    QueryDef("ev_sliding_windows", sliding, Some(slidingSql)),
    QueryDef("ev_session_window_batch", sessionWindowBatch,
      Some(sessionWindowBatchSql)),
    QueryDef("ev_user_stats", userStats, Some(userStatsSql)),
    // Structured Streaming counterparts (graft.streaming.EventStream).
    // The tumbling-window stream runs in complete mode, so it matches
    // the batch oracle exactly; session windows are flushed by a
    // terminal watermark-advancing sentinel, so the emitted sessions
    // equal the batch gaps-and-islands oracle too.
    QueryDef("evs_hourly_tumbling",
      (s, d) => graft.streaming.EventStream.hourlyTumbling(s, d)
        .select(col("hour"), col("event_type"), col("n"),
          col("total_value").cast("double").as("total_value")),
      Some(hourlySql)),
    QueryDef("evs_session_windows",
      (s, d) => graft.streaming.EventStream.sessionWindows(s, d),
      Some(sessionWindowBatchSql)),
    // flatMapGroupsWithState running counts: single-batch input means
    // the final state equals the batch GROUP BY, so it is oracle-able.
    QueryDef("evs_stream_static_join",
      (s, d) => graft.streaming.EventStream.streamStaticJoin(s, d),
      Some("""SELECT c_mktsegment, event_type, count(*) AS n
             |FROM events JOIN customer ON user_id = c_custkey - 1
             |GROUP BY 1, 2 ORDER BY c_mktsegment, event_type""".stripMargin)),
    QueryDef("evs_stream_stream_join",
      (s, d) => graft.streaming.EventStream.purchaseClickJoin(s, d),
      Some("""SELECT p.event_id AS purchase_id, c.event_id AS click_id,
             |  p.user_id
             |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
             |  JOIN (SELECT * FROM events WHERE event_type = 'click') c
             |  ON p.user_id = c.user_id
             | AND c.ts >= p.ts AND c.ts <= p.ts + INTERVAL 10 MINUTE
             |ORDER BY purchase_id, click_id""".stripMargin)),
    QueryDef("evs_stream_left_join",
      (s, d) => graft.streaming.EventStream.purchaseClickLeftJoin(s, d),
      Some("""SELECT p.event_id AS purchase_id, c.event_id AS click_id,
             |  p.user_id
             |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
             |  LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
             |  ON p.user_id = c.user_id
             | AND c.ts >= p.ts AND c.ts <= p.ts + INTERVAL 10 MINUTE
             |ORDER BY purchase_id, click_id""".stripMargin)),
    QueryDef("evs_stream_dedup",
      (s, d) => graft.streaming.EventStream.streamingDedup(s, d),
      Some("""SELECT DISTINCT user_id, event_type FROM events
             |ORDER BY user_id, event_type""".stripMargin)),
    QueryDef("evs_dedup_within_watermark",
      (s, d) => graft.streaming.EventStream.streamingDedupWithinWatermark(s, d),
      Some("""SELECT DISTINCT user_id, event_type FROM events
             |ORDER BY user_id, event_type""".stripMargin)),
    QueryDef("evs_user_running_counts",
      (s, d) => graft.streaming.EventStream.userRunningCounts(s, d),
      Some("""SELECT user_id, count(*) AS n_events
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)))
}
