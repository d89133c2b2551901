package graft.queries

import graft.{QueryDef, Quant, Tables}
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

/** Parameters for the session sequence-pattern operator
  * ([[Events.sequencePatternWith]]) — the PipelineConfig convention:
  * everything a caller could want to vary is a validated constructor
  * input, and invalid configs fail HERE, eagerly, not as a Spark task
  * error three stages into a 100 TB run.
  *
  * @param codes      event_type → single-char code; must be injective
  *                   (two types sharing a code would silently merge in
  *                   the session string) and each code one char (the
  *                   session string is positional). Unmapped types are
  *                   NOT dropped at run time — they `raise_error`.
  * @param pattern    Java-regex over the code alphabet, compiled here
  *                   so a malformed pattern rejects at config time.
  * @param gapMinutes inactivity gap that closes a session.
  */
final case class SequencePatternConfig(
    codes: Map[String, String],
    pattern: String,
    gapMinutes: Int = 30) {
  require(codes.nonEmpty, "codes must map at least one event_type")
  require(codes.values.forall(_.length == 1),
    s"every code must be a single char, got ${codes.values.mkString(",")}")
  require(codes.values.toSet.size == codes.size,
    "codes must be injective: two event types sharing a code would " +
      "silently merge in the session string")
  require(gapMinutes > 0, s"gapMinutes must be positive, got $gapMinutes")
  java.util.regex.Pattern.compile(pattern) // malformed regex fails here
}

object SequencePatternConfig {
  /** The registered `ev_sequence_pattern` instantiation: the
    * view+ click purchase funnel over the fixture's five event types.
    */
  val Default: SequencePatternConfig = SequencePatternConfig(
    Map("click" -> "c", "error" -> "e", "purchase" -> "p",
      "signup" -> "s", "view" -> "v"),
    "v+cp")
}

object Events {

  /** Point-in-time-correct training-feature assembly — the feature-
    * store contract: for every purchase (the label row), attach
    * features computed ONLY from that user's events strictly before
    * the purchase instant — trailing-7-day click count and click-value
    * sum, plus the immediately preceding event's type. Leakage-free by
    * construction: the range frame ends at −1 µs, so nothing at or
    * after the label instant can contribute.
    *
    * Scale shape: labels and features come from the SAME table keyed
    * by user, so there is NO join at all — one shuffle on user_id,
    * one in-partition sort per window ordering, conditional aggregates
    * inside the µs-exact RANGE frame (the q31 idiom), and a row-frame
    * lag for the preceding event. This is the plan a 100 TB
    * training-set build wants: feature computation rides the label
    * scan instead of exploding into per-feature joins.
    */
  private def pitFeatures(s: SparkSession, dir: String): DataFrame = {
    val weekUs = 7L * 86400000000L
    val wRange = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-weekUs, -1)
    val wSeq = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    Tables(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("value"))
      .withColumn("clicks_7d",
        sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .over(wRange))
      .withColumn("click_value_7d",
        sum(when(col("event_type") === "click",
          col("value").cast(DecimalType(18, 6)))).over(wRange))
      .withColumn("prev_type", lag(col("event_type"), 1).over(wSeq))
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("value").as("label_value"),
        coalesce(col("clicks_7d"), lit(0L)).as("clicks_7d"),
        coalesce(col("click_value_7d").cast("double"), lit(0.0))
          .as("click_value_7d"),
        col("prev_type"))
      .orderBy(col("purchase_id"))
  }

  private val pitFeaturesSql =
    """SELECT purchase_id, user_id, label_value, clicks_7d,
      |  click_value_7d, prev_type
      |FROM (
      |  SELECT event_id AS purchase_id, user_id, event_type,
      |    value AS label_value,
      |    CAST(COALESCE(sum(CASE WHEN event_type = 'click' THEN 1
      |      ELSE 0 END) OVER wr, 0) AS BIGINT) AS clicks_7d,
      |    COALESCE(CAST(sum(CASE WHEN event_type = 'click'
      |        THEN CAST(value AS DECIMAL(18,6)) END) OVER wr AS DOUBLE),
      |      0.0) AS click_value_7d,
      |    lag(event_type) OVER ws AS prev_type
      |  FROM (SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
      |        value FROM events)
      |  WINDOW wr AS (PARTITION BY user_id ORDER BY us
      |    RANGE BETWEEN 604800000000 PRECEDING AND 1 PRECEDING),
      |  ws AS (PARTITION BY user_id ORDER BY us, event_id))
      |WHERE event_type = 'purchase'
      |ORDER BY purchase_id""".stripMargin

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

  /** Day-over-day retention: of the users active on day d, how many
    * return on day d+1. The per-(user, day) dedup is one aggregation;
    * the day self-join carries one row per (user, day) — the classic
    * cohort-retention shape, shuffle keys uniformly distributed.
    */
  private def retention(s: SparkSession, dir: String): DataFrame = {
    val active = Tables(s, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val next = active.select(col("user_id"),
      date_sub(col("day"), 1).as("day"))
    active
      .join(next.withColumn("retained", lit(1)),
        Seq("user_id", "day"), "left")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_active"),
        sum(coalesce(col("retained"), lit(0))).cast("long").as("n_retained"))
      .withColumn("retention_rate", // qdec: int/int ratio can TIE (Quant)
        Quant.qdec(col("n_retained").cast("double") / col("n_active"), 9))
      .orderBy(col("day"))
  }

  private val retentionSql =
    """WITH active AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
      |SELECT a.day,
      |  count(*) AS n_active,
      |  CAST(sum(CASE WHEN b.user_id IS NULL THEN 0 ELSE 1 END) AS BIGINT)
      |    AS n_retained,
      |  floor(CAST(sum(CASE WHEN b.user_id IS NULL THEN 0 ELSE 1 END)
      |      AS DOUBLE) / count(*) * 1e9 + 0.5) / 1e9 AS retention_rate
      |FROM active a LEFT JOIN active b
      |  ON a.user_id = b.user_id AND b.day = a.day + 1
      |GROUP BY a.day ORDER BY a.day""".stripMargin

  /** Ordered conversion funnel signup → view → click → purchase: a
    * user converts through stage k iff their earliest stage-k event
    * follows their earliest stage-(k-1) event. One aggregation pivots
    * each user's first-touch times (min per type — no event ever
    * crosses the shuffle twice); the stage counts read off the
    * conjunctions.
    */
  private def funnel(s: SparkSession, dir: String): DataFrame = {
    val firsts = Tables(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "signup", col("ts"))).as("t_signup"),
        min(when(col("event_type") === "view", col("ts"))).as("t_view"),
        min(when(col("event_type") === "click", col("ts"))).as("t_click"),
        min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
    val s1 = col("t_signup").isNotNull
    val s2 = s1 && col("t_view") > col("t_signup")
    val s3 = s2 && col("t_click") > col("t_view")
    val s4 = s3 && col("t_purchase") > col("t_click")
    firsts.agg(
        sum(when(s1, 1L).otherwise(0L)).cast("long").as("n_signup"),
        sum(when(s2, 1L).otherwise(0L)).cast("long").as("n_view_after"),
        sum(when(s3, 1L).otherwise(0L)).cast("long").as("n_click_after"),
        sum(when(s4, 1L).otherwise(0L)).cast("long").as("n_purchase_after"))
  }

  /** Weekly cohort retention matrix — the classic growth grid: users
    * cohort by FIRST-activity week, and each (cohort week, week
    * offset) cell counts the cohort members active that many weeks
    * later. Built entirely on the user-week reduction (one distinct
    * pass; the matrix join is users × weeks, never raw events), with
    * week buckets via date_trunc cast to DATE on both engines and the
    * offset as an exact day-difference division.
    */
  private def cohortMatrix(s: SparkSession, dir: String): DataFrame = {
    val userWeeks = Tables(s, dir, "events")
      .select(col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("week"))
      .distinct()
    val cohorts = userWeeks.groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort_week"))
    userWeeks.join(cohorts, "user_id")
      .withColumn("week_offset",
        (datediff(col("week"), col("cohort_week")) / 7).cast("int"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  private val cohortMatrixSql =
    """WITH user_weeks AS (
      |  SELECT DISTINCT user_id,
      |    CAST(date_trunc('week', ts) AS DATE) AS week
      |  FROM events),
      |cohorts AS (
      |  SELECT user_id, min(week) AS cohort_week
      |  FROM user_weeks GROUP BY user_id)
      |SELECT cohort_week,
      |  CAST((week - cohort_week) // 7 AS INTEGER) AS week_offset,
      |  count(*) AS n_active
      |FROM user_weeks JOIN cohorts USING (user_id)
      |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin

  /** DAU / WAU / stickiness — the product-analytics daily readout:
    * daily active users, trailing-7-day weekly actives, and their
    * ratio. Distinct users over a sliding window can't partial-
    * aggregate directly, so the scalable shape is the standard
    * user-day reduction (one distinct pass, tiny result) self-joined
    * within the 7-day range — cardinality is users × days, never raw
    * events. Dates cast to DATE on both engines (the date_trunc
    * divergence contract); stickiness is an int/int double rounded
    * to 9.
    */
  private def dauWau(s: SparkSession, dir: String): DataFrame = {
    val userDays = Tables(s, dir, "events")
      .select(col("user_id"), col("ts").cast("date").as("day"))
      .distinct()
    val days = userDays.select(col("day")).distinct()
    val dau = userDays.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val wau = days.join(userDays.select(col("user_id"),
        col("day").as("active_day")),
        col("active_day").between(date_sub(col("day"), 6), col("day")))
      .groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("wau"))
    dau.join(wau, "day")
      .withColumn("stickiness", // qdec: int/int ratio can TIE (Quant)
        Quant.qdec(col("dau").cast("double") / col("wau"), 9))
      .orderBy(col("day"))
  }

  private val dauWauSql =
    """WITH user_days AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |days AS (SELECT DISTINCT day FROM user_days),
      |dau AS (
      |  SELECT day, count(*) AS dau FROM user_days GROUP BY day),
      |wau AS (
      |  SELECT d.day, count(DISTINCT u.user_id) AS wau
      |  FROM days d JOIN user_days u
      |    ON u.day BETWEEN d.day - 6 AND d.day
      |  GROUP BY d.day)
      |SELECT day, dau, wau,
      |  floor(CAST(dau AS DOUBLE) / wau * 1e9 + 0.5) / 1e9 AS stickiness
      |FROM dau JOIN wau USING (day) ORDER BY day""".stripMargin

  /** First-order Markov transition matrix over per-user event
    * sequences: consecutive event pairs (ordered by ts, ties broken by
    * event_id — the sessionize convention) counted into
    * P(next | current), the model behind next-action prediction and
    * anomalous-flow detection. One lag window partitioned BY USER
    * (parallel across users, never global) feeding one aggregate;
    * probabilities are int/int divisions rounded to 9.
    */
  private def markovTransitions(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = Tables(s, dir, "events")
      .withColumn("from_type", lag(col("event_type"), 1).over(byUser))
      .filter(col("from_type").isNotNull)
      .select(col("from_type"), col("event_type").as("to_type"))
    val totals = Window.partitionBy(col("from_type"))
    pairs.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", Quant.qdec(col("n").cast("double") / // int/int TIE
        sum(col("n")).over(totals), 9))
      .orderBy(col("from_type"), col("to_type"))
  }

  private val markovTransitionsSql =
    """WITH pairs AS (
      |  SELECT lag(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS from_type,
      |    event_type AS to_type
      |  FROM events),
      |counts AS (
      |  SELECT from_type, to_type, count(*) AS n FROM pairs
      |  WHERE from_type IS NOT NULL GROUP BY 1, 2)
      |SELECT from_type, to_type, n,
      |  floor(CAST(n AS DOUBLE) /
      |    sum(n) OVER (PARTITION BY from_type) * 1e9 + 0.5) / 1e9 AS p
      |FROM counts ORDER BY from_type, to_type""".stripMargin

  /** Time-windowed SEQUENTIAL funnel — the strict form of `ev_funnel`:
    * each step must occur within 30 minutes of the PREVIOUS step's
    * chosen event, with the canonical greedy resolution (the earliest
    * qualifying event anchors the next step). `ev_funnel` compares
    * global first-occurrences, which admits view→click pairs hours
    * apart; this one is the conversion-window semantics product
    * analytics actually reports. Each stage is a user-keyed equi-join
    * + min-aggregate (shuffle on user_id, no row multiplication
    * beyond a user's own events); the final readout cross-joins three
    * single-row broadcast aggregates.
    */
  private def funnelWindowed(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
    val win = expr("INTERVAL 30 MINUTES")
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id")
      .filter(col("ts") > col("t1") && col("ts") <= col("t1") + win)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id")
      .filter(col("ts") > col("t2") && col("ts") <= col("t2") + win)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    v.agg(count(lit(1)).as("n_view"))
      .crossJoin(broadcast(c.agg(count(lit(1)).as("n_click_30m"))))
      .crossJoin(broadcast(p.agg(count(lit(1)).as("n_purchase_30m"))))
  }

  private val funnelWindowedSql =
    """WITH v AS (
      |  SELECT user_id, min(ts) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, min(e.ts) AS t2
      |  FROM events e JOIN v USING (user_id)
      |  WHERE e.event_type = 'click'
      |    AND e.ts > v.t1 AND e.ts <= v.t1 + INTERVAL 30 MINUTE
      |  GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id, min(e.ts) AS t3
      |  FROM events e JOIN c USING (user_id)
      |  WHERE e.event_type = 'purchase'
      |    AND e.ts > c.t2 AND e.ts <= c.t2 + INTERVAL 30 MINUTE
      |  GROUP BY e.user_id)
      |SELECT (SELECT count(*) FROM v) AS n_view,
      |  (SELECT count(*) FROM c) AS n_click_30m,
      |  (SELECT count(*) FROM p) AS n_purchase_30m""".stripMargin

  private val funnelSql =
    """WITH firsts AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
      |    min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
      |    min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
      |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      |  FROM events GROUP BY user_id)
      |SELECT
      |  CAST(sum(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_signup,
      |  CAST(sum(CASE WHEN t_view > t_signup THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_view_after,
      |  CAST(sum(CASE WHEN t_click > t_view AND t_view > t_signup
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_click_after,
      |  CAST(sum(CASE WHEN t_purchase > t_click AND t_click > t_view
      |    AND t_view > t_signup THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_purchase_after
      |FROM firsts""".stripMargin

  /** Count-min sketch of per-user event counts: d=4 hash rows × w=64
    * buckets (md5-derived, identical arithmetic cross-engine), then
    * each user's estimate is the min over its 4 cells — emitted next
    * to the exact count with the overcount, so the sketch's one-sided
    * error bound (estimate >= exact, always) is hash-checked rather
    * than asserted. The sketch is the fixed-size summary the
    * streaming/distributed setting actually keeps: cells merge by
    * addition, the build is one (j, bucket) aggregation with map-side
    * partials, and only 256 cells ever sit in memory regardless of
    * corpus size.
    */
  private val CmsDepth = 4
  private val CmsWidth = 64

  private def cmsBucket(j: org.apache.spark.sql.Column) =
    conv(substring(md5(concat(lit("cms"), j.cast("string"), lit(":"),
      col("user_id").cast("string")).cast("binary")), 1, 6), 16, 10)
      .cast("long") % CmsWidth

  private def userCms(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events").select(col("user_id"))
    val exact = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n_exact"))
    // one-pass mergeable sketch (a single depth×width cell array per
    // partition crosses the shuffle — no row multiplication); each
    // user's estimate reads its depth cells off the broadcast sketch
    val sketch = ev.agg(graft.operators.CountMinAgg(col("user_id"),
      CmsDepth, CmsWidth).as("cells"))
    exact.crossJoin(broadcast(sketch))
      .withColumn("cms_est", least((0 until CmsDepth).map(j =>
        element_at(col("cells"),
          (lit(j * CmsWidth) + cmsBucket(lit(j))).cast("int") + 1)): _*))
      .withColumn("overcount", col("cms_est") - col("n_exact"))
      .select(col("user_id"), col("n_exact"), col("cms_est"),
        col("overcount"))
      .orderBy(col("user_id"))
  }

  private val userCmsSql = {
    def bucket(tbl: String) =
      s"CAST(('0x' || substring(md5('cms' || CAST(j AS VARCHAR) || ':' || " +
        s"CAST($tbl.user_id AS VARCHAR)), 1, 6)) AS BIGINT) % $CmsWidth"
    s"""WITH js AS (SELECT unnest(range(0, $CmsDepth)) AS j),
       |hashed AS (
       |  SELECT events.user_id, j, ${bucket("events")} AS bucket
       |  FROM events, js),
       |sketch AS (
       |  SELECT j, bucket, count(*) AS c FROM hashed GROUP BY 1, 2),
       |exact AS (
       |  SELECT user_id, count(*) AS n_exact FROM events GROUP BY 1),
       |cells AS (
       |  SELECT exact.user_id, j, ${bucket("exact")} AS bucket
       |  FROM exact, js),
       |est AS (
       |  SELECT user_id, min(c) AS cms_est
       |  FROM cells JOIN sketch USING (j, bucket) GROUP BY 1)
       |SELECT e.user_id, n_exact, cms_est, cms_est - n_exact AS overcount
       |FROM exact e JOIN est USING (user_id)
       |ORDER BY e.user_id""".stripMargin
  }

  /** Per-type z-score outliers (|z| > 3): the per-type moments come
    * from one decimal-exact aggregation (sum and sum-of-squares —
    * order-independent under any partitioning), broadcast back over
    * the events as a 5-row join, so the fact stream never shuffles.
    * mean/std/z are then plain double arithmetic from identical
    * inputs, identical cross-engine (sqrt is correctly rounded —
    * no transcendental drift).
    */
  private def zscoreOutliers(s: SparkSession, dir: String): DataFrame = {
    val stats = Tables(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 6)))
          .cast("double").as("sv"),
        sum((col("value") * col("value")).cast(DecimalType(28, 12)))
          .cast("double").as("ssv"))
    val mean = col("sv") / col("n")
    val std = sqrt(col("ssv") / col("n") - mean * mean)
    Tables(s, dir, "events")
      .join(broadcast(stats), "event_type")
      .withColumn("z", round((col("value") - mean) / std, 9))
      .filter(abs(col("z")) > 3)
      .select(col("event_id"), col("event_type"), col("value"), col("z"))
      .orderBy(col("event_id"))
  }

  private val zscoreOutliersSql =
    """WITH st AS (
      |  SELECT event_type, count(*) AS n,
      |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv,
      |    CAST(sum(CAST(value * value AS DECIMAL(28,12))) AS DOUBLE) AS ssv
      |  FROM events GROUP BY 1)
      |SELECT event_id, event_type, value,
      |  round((value - sv/n) / sqrt(ssv/n - (sv/n)*(sv/n)), 9) AS z
      |FROM events JOIN st USING (event_type)
      |WHERE abs(round((value - sv/n) / sqrt(ssv/n - (sv/n)*(sv/n)), 9)) > 3
      |ORDER BY event_id""".stripMargin

  /** A/B experiment readout — Welch's two-sample z-test per event
    * type: users hash-assign to variants (the same cross-engine
    * md5-bucket arithmetic as the corpus split operators, so
    * assignment is stable under re-partitioning and re-runs), and each
    * event type reports per-variant counts/means and the Welch
    * z-statistic on `value` with the |z| > 1.96 verdict — the readout
    * an experimentation pipeline computes per metric.
    *
    * One aggregate pass: both variants come out of the same groupBy
    * via conditional aggregation (no self-join), stats move one row
    * per event type. Exactness follows ev_zscore_outliers: decimal
    * sums / sums of squares, double arithmetic on identical operands,
    * sqrt correctly rounded, final round(9); the significance boolean
    * derives from the rounded z so both engines compare equal values.
    */
  private def abTest(s: SparkSession, dir: String): DataFrame = {
    val variant = conv(substring(md5(
      concat(lit("ab:"), col("user_id").cast("string"))), 1, 6), 16, 10)
      .cast("long") % 2
    val d18 = col("value").cast(DecimalType(18, 6))
    val d28 = (col("value") * col("value")).cast(DecimalType(28, 12))
    val agg = Tables(s, dir, "events")
      .withColumn("variant", variant)
      .groupBy(col("event_type"))
      .agg(
        count(when(col("variant") === 0, 1)).as("n_a"),
        count(when(col("variant") === 1, 1)).as("n_b"),
        sum(when(col("variant") === 0, d18)).cast("double").as("s_a"),
        sum(when(col("variant") === 1, d18)).cast("double").as("s_b"),
        sum(when(col("variant") === 0, d28)).cast("double").as("ss_a"),
        sum(when(col("variant") === 1, d28)).cast("double").as("ss_b"))
    val meanA = col("s_a") / col("n_a")
    val meanB = col("s_b") / col("n_b")
    val varA = (col("ss_a") - col("s_a") * col("s_a") / col("n_a")) /
      (col("n_a") - 1)
    val varB = (col("ss_b") - col("s_b") * col("s_b") / col("n_b")) /
      (col("n_b") - 1)
    val z = round((meanA - meanB) /
      sqrt(varA / col("n_a") + varB / col("n_b")), 9)
    agg.select(col("event_type"), col("n_a"), col("n_b"),
        // qdec: decimal-sum/int-count ratios can TIE (Quant)
        Quant.qdec(meanA, 9).as("mean_a"), Quant.qdec(meanB, 9).as("mean_b"),
        z.as("z_score"), (abs(z) > 1.96).as("significant"))
      .orderBy(col("event_type"))
  }

  private val abTestSql =
    """WITH v AS (
      |  SELECT event_type, value,
      |    CAST(('0x' || substring(md5('ab:' || CAST(user_id AS VARCHAR)),
      |      1, 6)) AS BIGINT) % 2 AS variant
      |  FROM events),
      |agg AS (
      |  SELECT event_type,
      |    count(CASE WHEN variant = 0 THEN 1 END) AS n_a,
      |    count(CASE WHEN variant = 1 THEN 1 END) AS n_b,
      |    CAST(sum(CASE WHEN variant = 0
      |      THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS s_a,
      |    CAST(sum(CASE WHEN variant = 1
      |      THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS s_b,
      |    CAST(sum(CASE WHEN variant = 0
      |      THEN CAST(value * value AS DECIMAL(28,12)) END) AS DOUBLE) AS ss_a,
      |    CAST(sum(CASE WHEN variant = 1
      |      THEN CAST(value * value AS DECIMAL(28,12)) END) AS DOUBLE) AS ss_b
      |  FROM v GROUP BY 1)
      |SELECT event_type, n_a, n_b,
      |  floor(s_a / n_a * 1e9 + 0.5) / 1e9 AS mean_a,
      |  floor(s_b / n_b * 1e9 + 0.5) / 1e9 AS mean_b,
      |  round((s_a/n_a - s_b/n_b) / sqrt(
      |    ((ss_a - s_a*s_a/n_a) / (n_a - 1)) / n_a +
      |    ((ss_b - s_b*s_b/n_b) / (n_b - 1)) / n_b), 9) AS z_score,
      |  abs(round((s_a/n_a - s_b/n_b) / sqrt(
      |    ((ss_a - s_a*s_a/n_a) / (n_a - 1)) / n_a +
      |    ((ss_b - s_b*s_b/n_b) / (n_b - 1)) / n_b), 9)) > 1.96 AS significant
      |FROM agg ORDER BY event_type""".stripMargin

  /** Robust anomaly detection: median/MAD outliers per event type —
    * the heavy-tail-safe complement to `ev_zscore_outliers` (a single
    * wild value shifts a mean but not a median, so MAD flags genuine
    * outliers the z-score misses and ignores ones it hallucinates).
    * Flags |value - median| > 3.5 * 1.4826 * MAD, the standard
    * consistency-scaled threshold.
    *
    * Both medians are exact percentiles rounded to 6 decimals (Spark
    * `percentile` and DuckDB `quantile_cont` share the linear-
    * interpolation definition; the round absorbs any last-ulp
    * difference). Plan shape: two tiny per-type stats aggregates, each
    * broadcast back to the fact stream — the facts never shuffle, same
    * as the z-score path. At 100 TB the exact per-group percentile
    * (memory ~ distinct values per group) would switch to
    * `approx_percentile`; the two-pass broadcast shape is unchanged.
    */
  private def madOutliers(s: SparkSession, dir: String): DataFrame = {
    // qdec throughout: medians of short-decimal data and dev/mad
    // rationals can land on true round-half ties (Quant).
    val med = Tables(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(Quant.qdec(expr("percentile(value, 0.5)"), 6).as("med"))
    val devs = Tables(s, dir, "events")
      .join(broadcast(med), "event_type")
      .withColumn("dev", abs(col("value") - col("med")))
    val mad = devs.groupBy(col("event_type"))
      .agg(Quant.qdec(expr("percentile(dev, 0.5)"), 6).as("mad"))
    devs.join(broadcast(mad), "event_type")
      .filter(col("mad") > 0)
      .withColumn("robust_z",
        Quant.qdec(col("dev") / (lit(1.4826) * col("mad")), 6))
      .filter(col("robust_z") > 3.5)
      .select(col("event_id"), col("event_type"), col("value"),
        col("robust_z"))
      .orderBy(col("event_id"))
  }

  private val madOutliersSql =
    """WITH med AS (
      |  SELECT event_type,
      |    floor(quantile_cont(value, 0.5) * 1e6 + 0.5) / 1e6 AS med
      |  FROM events GROUP BY 1),
      |devs AS (
      |  SELECT event_id, event_type, value, abs(value - med) AS dev
      |  FROM events JOIN med USING (event_type)),
      |mad AS (
      |  SELECT event_type,
      |    floor(quantile_cont(dev, 0.5) * 1e6 + 0.5) / 1e6 AS mad
      |  FROM devs GROUP BY 1)
      |SELECT event_id, event_type, value,
      |  floor(dev / (1.4826 * mad) * 1e6 + 0.5) / 1e6 AS robust_z
      |FROM devs JOIN mad USING (event_type)
      |WHERE mad > 0 AND floor(dev / (1.4826 * mad) * 1e6 + 0.5) / 1e6 > 3.5
      |ORDER BY event_id""".stripMargin

  /** CUSUM change-point detection per event type: the hour where the
    * cumulative deviation of hourly counts from the type's mean peaks
    * — the standard "when did the rate shift" monitoring primitive.
    * Deviations round to 6 decimals and accumulate in DECIMAL through
    * an ordered window (hour is unique within a type, so the running
    * sum's fold order is total and engine-identical); the argmax
    * tie-breaks to the earliest hour. Plan shape: one hourly
    * aggregation (partial-aggregated), a per-type broadcast mean, and
    * a window partitioned BY TYPE — parallel across types, with each
    * type's hour series (a few thousand rows per YEAR of data) well
    * inside one partition at any corpus size.
    */
  private def cusumChangepoint(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables(s, dir, "events")
      .groupBy(col("event_type"),
        date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("x"))
    val stats = hourly.groupBy(col("event_type"))
      .agg(sum(col("x")).as("sx"), count(lit(1)).as("n_hours"))
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("hour"))
    val wPick = Window.partitionBy(col("event_type"))
      .orderBy(abs(col("cusum")).desc, col("hour"))
    hourly.join(broadcast(stats), "event_type")
      .withColumn("dev", // qdec: int-ratio detrend can TIE (Quant)
        Quant.qdec(col("x") - col("sx").cast("double") / col("n_hours"), 6)
          .cast(DecimalType(18, 6)))
      .withColumn("cusum", sum(col("dev")).over(wCum))
      .withColumn("pick", row_number().over(wPick))
      .filter(col("pick") === 1)
      .select(col("event_type"), col("n_hours"),
        col("hour").cast("date").as("cp_day"), hour(col("hour")).as("cp_hour"),
        col("cusum").cast("double").as("max_cusum"))
      .orderBy(col("event_type"))
  }

  private val cusumChangepointSql =
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS x
      |  FROM events GROUP BY 1, 2),
      |stats AS (
      |  SELECT event_type, sum(x) AS sx, count(*) AS n_hours
      |  FROM hourly GROUP BY 1),
      |cum AS (
      |  SELECT event_type, n_hours, hour,
      |    sum(CAST(floor((x - CAST(sx AS DOUBLE) / n_hours) * 1e6 + 0.5)
      |      / 1e6 AS DECIMAL(18,6)))
      |      OVER (PARTITION BY event_type ORDER BY hour) AS cusum
      |  FROM hourly JOIN stats USING (event_type)),
      |picked AS (
      |  SELECT *, row_number() OVER (PARTITION BY event_type
      |    ORDER BY abs(cusum) DESC, hour) AS pick
      |  FROM cum)
      |SELECT event_type, n_hours, CAST(hour AS DATE) AS cp_day,
      |  CAST(extract(hour FROM hour) AS INTEGER) AS cp_hour,
      |  CAST(cusum AS DOUBLE) AS max_cusum
      |FROM picked WHERE pick = 1 ORDER BY event_type""".stripMargin

  /** Path analysis: the most common within-session event-type
    * sequences (truncated to the first 8 steps) — the product-analytics
    * staple behind funnel discovery. Sessions come from the same
    * 30-minute-gap rule as `ev_sessionize`; the path string is ordered
    * by (ts, event_id), a total order, so both engines agg identical
    * strings. Shape: the sessionize windows (per-user, parallel), one
    * path aggregate, one count aggregate, top-15 merge.
    */
  private def pathAnalysis(s: SparkSession, dir: String): DataFrame = {
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
      .agg(concat_ws(">", slice(transform(
        array_sort(collect_list(struct(col("us"), col("event_id"),
          col("event_type")))),
        e => e("event_type")), 1, 8)).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(15)
  }

  private val pathAnalysisSql =
    """WITH marked AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |      OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
      |      THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |sessions AS (
      |  SELECT user_id, event_type, ts, event_id,
      |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS UNBOUNDED PRECEDING) AS session_seq
      |  FROM marked),
      |ranked AS (
      |  SELECT user_id, session_seq, event_type,
      |    row_number() OVER (PARTITION BY user_id, session_seq
      |      ORDER BY epoch_us(ts), event_id) AS step
      |  FROM sessions),
      |paths AS (
      |  -- truncate to the first 8 EVENTS before aggregating, exactly
      |  -- like the Spark side's list slice (splitting the aggregated
      |  -- string on '>' would miscount if a type ever contained '>')
      |  SELECT user_id, session_seq,
      |    string_agg(event_type, '>' ORDER BY step) AS path
      |  FROM ranked WHERE step <= 8 GROUP BY 1, 2)
      |SELECT path, count(*) AS n_sessions
      |FROM paths GROUP BY path
      |ORDER BY n_sessions DESC, path LIMIT 15""".stripMargin

  /** Per-user EWMA of event values — the smoothed "current level"
    * behind rate limiting / anomaly baselines. alpha = 0.5 over the
    * trailing 20 events, emitted at each user's LATEST event:
    * ewma = Σ_{k<m} 0.5^k·x_{n-k} / Σ_{k<m} 0.5^k, m = min(n, 20).
    *
    * Spark-first shape: 20 lag() columns over one (user, time) window
    * — constant plan width, whole-stage codegen'd, and the only
    * shuffle is the window's partitionBy(user). (A collect_list + HOF
    * fold computes the same thing but leaves codegen; a running
    * recursive form needs per-row state Spark SQL doesn't express.)
    *
    * Exactness: alpha = 0.5 makes every weight 2^-k — scaling a
    * double by it is EXACT (mantissa untouched), so the only rounding
    * is the shared double→decimal(38,18) term cast, identical on both
    * engines; the decimal sum is order-independent. The denominator
    * Σ 0.5^k = 2 - 2^(1-m) is an exact closed form.
    */
  private def ewma(s: SparkSession, dir: String): DataFrame = {
    val m = 20
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val terms = (0 until m).map { k =>
      coalesce(
        (lag(col("value"), k).over(w) * lit(math.pow(0.5, k)))
          .cast(DecimalType(38, 18)),
        lit(java.math.BigDecimal.ZERO).cast(DecimalType(38, 18)))
    }
    val avail = least(count(lit(1)).over(
      Window.partitionBy(col("user_id"))), lit(m))
    Tables(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      // cast back to (38,18) after EVERY addition: Spark's decimal
      // promotion would otherwise shed one scale digit per chained `+`
      // ((38,18)+(38,18) -> (38,17) -> ...), compounding to ~1e-8
      // drift over 20 terms; with the interleaved cast each step
      // rounds at 1e-18 (bounded 2e-17 total), and DuckDB's
      // fixed-scale addition is exact, so both sides agree through
      // the 9-decimal output rounding
      .withColumn("num",
        terms.reduce((a, b) => (a + b).cast(DecimalType(38, 18))))
      .withColumn("m", avail)
      .withColumn("rn_desc", row_number().over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rn_desc") === 1)
      .select(col("user_id"), col("m").as("n_window"),
        Quant.qdec(col("num").cast("double") / // dyadic denom can TIE
          (lit(2.0) - pow(lit(0.5), col("m") - 1)), 9).as("ewma"))
      .orderBy(col("user_id"))
  }

  private val ewmaSql = {
    val terms = (0 until 20).map { k =>
      s"COALESCE(CAST(lag(value, $k) OVER w * power(0.5, $k)" +
        " AS DECIMAL(38,18)), 0)"
    }.mkString(" + ")
    s"""WITH x AS (
       |  SELECT user_id, ts, event_id,
       |    $terms AS num,
       |    least(count(*) OVER (PARTITION BY user_id), 20) AS m
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       |SELECT user_id, m AS n_window,
       |  floor(CAST(num AS DOUBLE) / (2 - power(0.5, m - 1)) * 1e9 + 0.5)
       |    / 1e9 AS ewma
       |FROM x
       |QUALIFY row_number() OVER (PARTITION BY user_id
       |  ORDER BY ts DESC, event_id DESC) = 1
       |ORDER BY user_id""".stripMargin
  }

  /** Last-touch revenue attribution: each purchase credits its full
    * value to the user's most recent preceding view/click channel
    * ('direct' if none) — the marketing-analytics join every event
    * warehouse runs. Spark-first shape: NO purchase×touch join (which
    * fans out per-user purchases × touches) — one (user, time) window
    * carries the last non-null touch type forward via
    * last(ignoreNulls) over the mixed stream, so the fact stream
    * shuffles once on user_id and every purchase row reads its
    * attribution from the frame. The q36 IGNORE NULLS machinery doing
    * real analytics work.
    *
    * Tie discipline: the frame orders by (ts, event_id) and excludes
    * the current row, so a touch and purchase sharing a timestamp
    * attribute deterministically by event_id.
    */
  private def attribution(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables(s, dir, "events")
      .withColumn("touch",
        when(col("event_type").isin("view", "click"), col("event_type")))
      .withColumn("last_touch",
        last(col("touch"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("last_touch"), lit("direct")).as("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double")
          .as("revenue"))
      .orderBy(col("channel"))
  }

  private val attributionSql =
    """SELECT coalesce(last_touch, 'direct') AS channel,
      |  count(*) AS n_purchases,
      |  CAST(sum(CAST(value AS DECIMAL(18, 2))) AS DOUBLE) AS revenue
      |FROM (
      |  SELECT event_type, value,
      |    last_value(CASE WHEN event_type IN ('view', 'click')
      |               THEN event_type END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      AS last_touch
      |  FROM events)
      |WHERE event_type = 'purchase'
      |GROUP BY 1 ORDER BY channel""".stripMargin

  /** RFM segmentation — the classic recency/frequency/monetary user
    * scoring, quintiled: per user, days since last activity,
    * purchase count, purchase revenue; each dimension quintiled over
    * a total order (metric + user_id tiebreak → deterministic
    * boundaries), then the segment census (≤125 rows).
    *
    * The quintile is NOT a global ntile window (a partition-less sort
    * of the full user table — the shape the PlanSpec sweep exists to
    * catch; ~1e9 users at 100 TB). Instead it is the repo's chunked
    * two-pass global rank (the mig_batch_plan / cp_sequence_pack
    * idiom): chunk by a monotone bucketing of the metric, rank within
    * chunks (partitioned window), add broadcast per-chunk offsets,
    * then convert rank → bucket with the exact ntile closed form
    * (see [[tile5]]; RankSpec proves the equivalence on random tied
    * data), so the oracle can still say plain `ntile(5)`. The
    * only partition-less window runs over the chunk-count table —
    * O(distinct metric buckets) rows, bounded by the metric domain
    * (days / purchase counts / whole currency units), not by users.
    */
  /** Chunked two-pass global quintile — the scale-safe ntile(5): tag
    * each row with a chunk that is monotone non-decreasing along the
    * sort order, rank within chunks (partitioned window), add
    * broadcast per-chunk offsets, then convert rank → bucket with the
    * TRUE ntile closed form: with q = ⌊n/5⌋, r = n mod 5, the first r
    * buckets hold q+1 rows — so ranks ≤ r(q+1) land in
    * ⌊(rank−1)/(q+1)⌋, the rest in r + ⌊(rank−r(q+1)−1)/q⌋. (The
    * tempting ⌊(rank−1)·5/n⌋ is NOT ntile when 5 ∤ n — it spreads the
    * extras instead of front-loading them; RankSpec caught exactly
    * that on non-divisible n, which the fixture's divisible user
    * count had masked.) The only partition-less window runs over the
    * per-chunk COUNT table. `totalCol` must hold the row count.
    */
  private[graft] def tile5(df: DataFrame,
      ordCols: Seq[org.apache.spark.sql.Column],
      chunk: org.apache.spark.sql.Column,
      totalCol: String, out: String): DataFrame = {
    val tagged = df.withColumn("chunk", chunk)
    val offsets = tagged.groupBy(col("chunk"))
      .agg(count(lit(1)).as("chunk_n"))
      .withColumn("offset",
        coalesce(sum(col("chunk_n")).over(
          Window.orderBy(col("chunk"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("chunk"), col("offset"))
    val q = floor(col(totalCol) / 5)
    val r = col(totalCol) % 5
    val cut = r * (q + 1)
    tagged.join(broadcast(offsets), "chunk")
      .withColumn("rnk", col("offset") + row_number().over(
        Window.partitionBy(col("chunk")).orderBy(ordCols: _*)))
      .withColumn(out,
        (when(col("rnk") <= cut, floor((col("rnk") - 1) / (q + 1)))
          .otherwise(r + floor((col("rnk") - cut - 1) / q)) + 1)
          .cast("int"))
      .drop("chunk", "offset", "rnk")
  }

  private def rfm(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
    val stats = ev.agg(max(col("ts")).as("max_ts"),
      count_distinct(col("user_id")).as("n_users_total"))
    val users = ev.groupBy(col("user_id"))
      .agg(max(col("ts")).as("last_ts"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("freq"),
        sum(when(col("event_type") === "purchase",
          col("value").cast(DecimalType(18, 2)))
          .otherwise(lit(java.math.BigDecimal.ZERO).cast(DecimalType(18, 2))))
          .as("monetary"))
      .crossJoin(broadcast(stats))
      .withColumn("recency_days",
        datediff(to_date(col("max_ts")), to_date(col("last_ts"))))

    val r = tile5(users, Seq(col("recency_days"), col("user_id")),
      col("recency_days"), "n_users_total", "r_tile")
    val f = tile5(r, Seq(col("freq").desc, col("user_id")),
      -col("freq"), "n_users_total", "f_tile")
    val m = tile5(f, Seq(col("monetary").desc, col("user_id")),
      -floor(col("monetary")), "n_users_total", "m_tile")
    m.groupBy(col("r_tile"), col("f_tile"), col("m_tile"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("monetary")).cast("double").as("segment_revenue"))
      .orderBy(col("r_tile"), col("f_tile"), col("m_tile"))
  }

  private val rfmSql =
    """WITH users AS (
      |  SELECT user_id, max(ts) AS last_ts,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS freq,
      |    sum(CASE WHEN event_type = 'purchase'
      |        THEN CAST(value AS DECIMAL(18, 2))
      |        ELSE CAST(0 AS DECIMAL(18, 2)) END) AS monetary
      |  FROM events GROUP BY user_id),
      |mx AS (SELECT max(ts) AS max_ts FROM events),
      |seg AS (
      |  SELECT user_id, monetary,
      |    ntile(5) OVER (ORDER BY date_diff('day', CAST(last_ts AS DATE),
      |      CAST(max_ts AS DATE)), user_id) AS r_tile,
      |    ntile(5) OVER (ORDER BY freq DESC, user_id) AS f_tile,
      |    ntile(5) OVER (ORDER BY monetary DESC, user_id) AS m_tile
      |  FROM users, mx)
      |SELECT r_tile, f_tile, m_tile, count(*) AS n_users,
      |  CAST(sum(monetary) AS DOUBLE) AS segment_revenue
      |FROM seg GROUP BY 1, 2, 3 ORDER BY r_tile, f_tile, m_tile""".stripMargin

  /** Semi-structured props through Spark 4's VARIANT type —
    * `parse_json` once into the binary VARIANT encoding, then typed
    * path extraction with `variant_get` (and `is_variant_null` as the
    * malformed-row guard). Contrast with `ev_json_props`
    * (from_json + declared schema): VARIANT is the schema-LESS path —
    * ingest doesn't commit to a schema, extraction is still typed and
    * codegen'd, and at 100 TB the parquet writer shreds frequently-
    * accessed paths into columns so `variant_get` reads become column
    * scans. The right default for evolving event payloads where a
    * declared struct would silently null out new fields.
    */
  private def variantProps(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "events")
      .withColumn("v", parse_json(col("props")))
      .withColumn("k", variant_get(col("v"), "$.k", "long"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_with_k"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))
  }

  private val variantPropsSql =
    """SELECT event_type,
      |  count(CAST(props ->> '$.k' AS BIGINT)) AS n_with_k,
      |  CAST(sum(CAST(props ->> '$.k' AS BIGINT)) AS BIGINT) AS sum_k,
      |  CAST(min(CAST(props ->> '$.k' AS BIGINT)) AS BIGINT) AS min_k,
      |  CAST(max(CAST(props ->> '$.k' AS BIGINT)) AS BIGINT) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Seasonal-naive forecast backtest — the capacity-planning baseline
    * every volume forecast is judged against: predict each hour's
    * event count per type as the count one week (168 h) earlier, then
    * score MAE and bias over every hour where both sides exist. The
    * join is on (hour − 168h, type) rather than lag(168) over present
    * rows — with sparse hours a row-offset lag silently reads the
    * wrong hour, the classic sparse-series forecasting bug; inner-join
    * semantics (hours present in BOTH weeks) are applied identically
    * in the oracle.
    *
    * Scale shape: two map-side-combined hourly aggregates and one
    * (hour, type)-keyed join of two already-aggregated series —
    * shuffle rows are O(hours·types), never O(events).
    */
  private def forecastBaseline(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables(s, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val pred = hourly.select(
      (col("hour") + expr("INTERVAL 168 HOURS")).as("hour"),
      col("event_type"), col("n").as("n_pred"))
    hourly.join(pred, Seq("hour", "event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"),
        sum(abs(col("n") - col("n_pred"))).as("sum_abs_err"),
        Quant.qdec(sum(abs(col("n") - col("n_pred"))).cast("double") /
          count(lit(1)), 9).as("mae"), // int/int ratios can TIE (Quant)
        Quant.qdec(sum(col("n") - col("n_pred")).cast("double") /
          count(lit(1)), 9).as("bias"))
      .orderBy(col("event_type"))
  }

  private val forecastBaselineSql =
    """WITH hourly AS (
      |  SELECT date_trunc('hour', ts) AS hour, event_type,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2)
      |SELECT a.event_type, count(*) AS n_hours,
      |  CAST(sum(abs(a.n - p.n)) AS BIGINT) AS sum_abs_err,
      |  floor(CAST(sum(abs(a.n - p.n)) AS DOUBLE) / count(*) * 1e9 + 0.5)
      |    / 1e9 AS mae,
      |  floor(CAST(sum(a.n - p.n) AS DOUBLE) / count(*) * 1e9 + 0.5) / 1e9
      |    AS bias
      |FROM hourly a JOIN hourly p
      |  ON a.hour = p.hour + INTERVAL 168 HOUR
      |  AND a.event_type = p.event_type
      |GROUP BY a.event_type ORDER BY a.event_type""".stripMargin

  /** Markov next-event backtest — the pipeline evaluating its own
    * model: transition counts learned on events before the cutoff
    * (train), top-1 next-event prediction per from-type (argmax count,
    * ties by type order), scored on the post-cutoff pairs (eval).
    * Per from-type: the prediction, eval pairs, hits, accuracy. The
    * time-based split mirrors how sequence models are actually
    * validated — training on the past, scoring on the future —
    * and the whole evaluation is two aggregates plus one broadcast
    * join of a 5-row model; the event stream shuffles once (the
    * lag window's user partitioning).
    */
  private def markovBacktest(s: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("2024-01-25 00:00:00").cast("timestamp")
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = Tables(s, dir, "events")
      .withColumn("from_type", lag(col("event_type"), 1).over(byUser))
      .filter(col("from_type").isNotNull)
      .select(col("from_type"), col("event_type").as("to_type"), col("ts"))
    val model = pairs.filter(col("ts") < cutoff)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(Window.partitionBy(col("from_type"))
        .orderBy(col("n").desc, col("to_type"))))
      .filter(col("rn") === 1)
      .select(col("from_type"), col("to_type").as("predicted"))
    pairs.filter(col("ts") >= cutoff)
      .join(broadcast(model), "from_type")
      .groupBy(col("from_type"))
      .agg(max(col("predicted")).as("predicted"),
        count(lit(1)).as("n_eval"),
        sum(when(col("to_type") === col("predicted"), 1L).otherwise(0L))
          .as("n_correct"))
      .withColumn("accuracy", // qdec: int/int ratio can TIE (Quant)
        Quant.qdec(col("n_correct").cast("double") / col("n_eval"), 9))
      .orderBy(col("from_type"))
  }

  private val markovBacktestSql =
    """WITH pairs AS (
      |  SELECT lag(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS from_type,
      |    event_type AS to_type, ts
      |  FROM events),
      |model AS (
      |  SELECT from_type, to_type AS predicted FROM (
      |    SELECT from_type, to_type, count(*) AS n
      |    FROM pairs
      |    WHERE from_type IS NOT NULL
      |      AND ts < TIMESTAMP '2024-01-25 00:00:00'
      |    GROUP BY 1, 2)
      |  QUALIFY row_number() OVER (PARTITION BY from_type
      |    ORDER BY n DESC, to_type) = 1)
      |SELECT from_type, max(predicted) AS predicted,
      |  count(*) AS n_eval,
      |  CAST(sum(CASE WHEN to_type = predicted THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_correct,
      |  floor(CAST(sum(CASE WHEN to_type = predicted THEN 1 ELSE 0 END)
      |    AS DOUBLE) / count(*) * 1e9 + 0.5) / 1e9 AS accuracy
      |FROM pairs JOIN model USING (from_type)
      |WHERE ts >= TIMESTAMP '2024-01-25 00:00:00'
      |GROUP BY from_type ORDER BY from_type""".stripMargin

  /** Survival / churn life table. A user's observed lifetime runs
    * from their first event to either their last event (CHURNED — if
    * they then stayed silent for the final 7 days of the observation
    * window) or to the window end (CENSORED — still active when the
    * data stops; their lifetime is a lower bound, not a churn). The
    * life table buckets lifetimes into whole days and reports, per
    * day t: users still at risk (lifetime >= t), churn events at t,
    * censorings at t, and the discrete hazard d/n — the Kaplan-Meier
    * ingredients, with censoring handled correctly instead of the
    * naive "days between first and last event" histogram that
    * understates the survival of active users.
    *
    * Scale notes (100 TB): one groupBy(user_id) shuffle produces the
    * per-user (first, last) pair; the scalar observation end is
    * broadcast; the at-risk reverse-cumulative window runs over the
    * AGGREGATED day table (tens of rows), never the raw events.
    * Exactness: integer µs arithmetic; hazard is a single IEEE
    * division of two exact ints (correctly rounded, engine-identical)
    * — no transcendentals, no rounding step.
    */
  private def survival(s: SparkSession, dir: String): DataFrame = {
    val gapUs = 7L * 86400 * 1000000
    val ev = Tables(s, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
    val obs = ev.agg(max(col("us")).as("end_us"))
    val days = ev.groupBy(col("user_id"))
      .agg(min(col("us")).as("first_us"), max(col("us")).as("last_us"))
      .crossJoin(broadcast(obs))
      .withColumn("churned", col("end_us") - col("last_us") > gapUs)
      .withColumn("t_day", when(col("churned"),
          expr("(last_us - first_us) DIV 86400000000"))
        .otherwise(expr("(end_us - first_us) DIV 86400000000")))
      .groupBy(col("t_day"))
      .agg(sum(col("churned").cast("long")).as("churned"),
        sum((!col("churned")).cast("long")).as("censored"))
    days
      .withColumn("at_risk",
        sum(col("churned") + col("censored")).over(Window.orderBy(col("t_day"))
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .select(col("t_day"), col("at_risk"), col("churned"), col("censored"),
        (col("churned").cast("double") / col("at_risk")).as("hazard"))
      .orderBy(col("t_day"))
  }

  private val survivalSql =
    """WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),
      |obs AS (SELECT max(us) AS end_us FROM ev),
      |users AS (
      |  SELECT user_id, min(us) AS first_us, max(us) AS last_us
      |  FROM ev GROUP BY 1),
      |lab AS (
      |  SELECT (end_us - last_us) > 604800000000 AS churned,
      |    CASE WHEN (end_us - last_us) > 604800000000
      |      THEN (last_us - first_us) // 86400000000
      |      ELSE (end_us - first_us) // 86400000000 END AS t_day
      |  FROM users, obs),
      |days AS (
      |  SELECT t_day,
      |    CAST(sum(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT)
      |      AS churned,
      |    CAST(sum(CASE WHEN churned THEN 0 ELSE 1 END) AS BIGINT)
      |      AS censored
      |  FROM lab GROUP BY 1)
      |SELECT t_day,
      |  CAST(sum(churned + censored) OVER (ORDER BY t_day
      |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
      |    AS at_risk,
      |  churned, censored,
      |  CAST(churned AS DOUBLE) / CAST(sum(churned + censored)
      |    OVER (ORDER BY t_day
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS DOUBLE)
      |    AS hazard
      |FROM days ORDER BY t_day""".stripMargin

  /** Time-series gap fill — the feature-store densification step:
    * downsample each user's events to an hourly gauge (max value in
    * the hour), build the full hourly spine between the user's first
    * and last active hour, and forward-fill the gauge across silent
    * hours. Every ML feature pipeline that joins event gauges to a
    * regular training grid needs exactly this shape.
    *
    * Scale shape: one groupBy to the hourly gauge (map-side combine
    * collapses to ≤ users×hours rows before the shuffle), a
    * `sequence`-explode spine generated FROM the per-user span
    * aggregate (never a driver-side range), a left join on
    * (user, hr) — both sides already hash-partitioned by the same
    * key — and one in-partition forward-fill window. No partition-less
    * window, no driver loop; spine size is bounded by users × span
    * hours, independent of event count.
    *
    * Exactness: hours are integer µs division; the fill copies the
    * observed double verbatim (no arithmetic), so both engines carry
    * bit-identical values.
    */
  private def gapFill(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
      .select(col("user_id"),
        expr("unix_micros(ts) div 3600000000").as("hr"),
        col("value"))
    val obs = ev.groupBy(col("user_id"), col("hr"))
      .agg(max(col("value")).as("v_obs"), count(lit(1)).as("n_obs"))
    val spine = ev.groupBy(col("user_id"))
      .agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"))).as("hr"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("hr"))
    spine.join(obs, Seq("user_id", "hr"), "left")
      .withColumn("v_fill", last(col("v_obs"), ignoreNulls = true).over(w))
      .select(col("user_id"), col("hr"),
        col("n_obs").isNotNull.as("is_observed"), col("v_fill"))
      .orderBy(col("user_id"), col("hr"))
  }

  private val gapFillSql =
    """WITH ev AS (
      |  SELECT user_id, epoch_us(ts) // 3600000000 AS hr, value
      |  FROM events),
      |obs AS (
      |  SELECT user_id, hr, max(value) AS v_obs, count(*) AS n_obs
      |  FROM ev GROUP BY user_id, hr),
      |spine AS (
      |  SELECT user_id, unnest(generate_series(h0, h1)) AS hr
      |  FROM (SELECT user_id, min(hr) AS h0, max(hr) AS h1
      |        FROM ev GROUP BY user_id))
      |SELECT s.user_id, s.hr, o.n_obs IS NOT NULL AS is_observed,
      |  last_value(o.v_obs IGNORE NULLS)
      |    OVER (PARTITION BY s.user_id ORDER BY s.hr) AS v_fill
      |FROM spine s
      |LEFT JOIN obs o ON s.user_id = o.user_id AND s.hr = o.hr
      |ORDER BY s.user_id, s.hr""".stripMargin

  /** Automation / bot detection by inter-arrival regularity: real
    * humans produce bursty, high-entropy gaps; scripted traffic
    * repeats a handful of near-constant intervals. Per user: exact
    * integer gap moments (n·Σg² − (Σg)² — the variance numerator,
    * computed in decimal so it is order-free), the distinct-gap
    * ratio, and two integer-arithmetic flags (low gap diversity /
    * low dispersion at volume).
    *
    * Scale shape: one shuffle on user_id for the lag window, then a
    * per-user aggregate with map-side combine. CV² is reported as a
    * double division of two exact decimals — deterministic on both
    * engines.
    */
  private def botDetect(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    Tables(s, dir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
      .filter(col("gap").isNotNull)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_gaps"),
        min(col("gap")).as("min_gap_us"),
        max(col("gap")).as("max_gap_us"),
        countDistinct(col("gap")).as("distinct_gaps"),
        // cast BEFORE squaring: gap² can exceed Long.MaxValue
        sum(col("gap").cast(DecimalType(38, 0))).as("sum_g"),
        sum(col("gap").cast(DecimalType(38, 0)) * col("gap")).as("sum_g2"))
      .select(col("user_id"), col("n_gaps"), col("min_gap_us"),
        col("max_gap_us"), col("distinct_gaps"),
        ((col("n_gaps") * col("sum_g2") - col("sum_g") * col("sum_g"))
          .cast("double") / (col("sum_g") * col("sum_g")).cast("double"))
          .as("cv2"),
        (col("distinct_gaps") * 5 < col("n_gaps") && col("n_gaps") >= 20)
          .as("low_diversity"))
      .orderBy(col("user_id"))
  }

  private val botDetectSql =
    """WITH g AS (
      |  SELECT user_id,
      |    epoch_us(ts) - lag(epoch_us(ts))
      |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
      |      AS gap
      |  FROM events)
      |SELECT user_id, count(*) AS n_gaps,
      |  min(gap) AS min_gap_us, max(gap) AS max_gap_us,
      |  count(DISTINCT gap) AS distinct_gaps,
      |  CAST(count(*) * sum(CAST(gap AS HUGEINT) * gap)
      |       - sum(CAST(gap AS HUGEINT))
      |         * sum(CAST(gap AS HUGEINT)) AS DOUBLE)
      |    / CAST(sum(CAST(gap AS HUGEINT))
      |           * sum(CAST(gap AS HUGEINT)) AS DOUBLE) AS cv2,
      |  count(DISTINCT gap) * 5 < count(*) AND count(*) >= 20
      |    AS low_diversity
      |FROM g WHERE gap IS NOT NULL
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Hour-of-week seasonality profile per event type: peak slot,
    * peak share, top-8-slot concentration, weekend share. The
    * capacity-planning / anomaly-baseline primitive: a traffic class
    * whose top-8 of 168 slots carry most of its volume needs
    * slot-aware thresholds, not a global one.
    *
    * The slot index is pure integer arithmetic on epoch µs
    * (Monday 00:00 UTC = slot 0; epoch day 0 was a Thursday, hence
    * the +72h shift) — immune to the engines' dayofweek numbering
    * disagreement (Spark 1=Sunday, DuckDB 0=Sunday).
    *
    * Scale shape: one aggregate to ≤ types×168 rows with map-side
    * combine, then windows over that tiny frame. Shares are double
    * divisions of exact longs.
    */
  private def seasonality(s: SparkSession, dir: String): DataFrame = {
    val slots = Tables(s, dir, "events")
      .select(col("event_type"),
        expr("(unix_micros(ts) div 3600000000 + 72) % 168").as("how"))
      .groupBy(col("event_type"), col("how"))
      .agg(count(lit(1)).as("n"))
    val wRank = Window.partitionBy(col("event_type"))
      .orderBy(col("n").desc, col("how"))
    slots
      .withColumn("rk", row_number().over(wRank))
      .groupBy(col("event_type"))
      .agg(
        sum(col("n")).as("n_total"),
        max(when(col("rk") === 1, col("how"))).as("peak_slot"),
        max(when(col("rk") === 1, col("n"))).as("peak_n"),
        sum(when(col("rk") <= 8, col("n")).otherwise(0L)).as("top8_n"),
        sum(when(col("how") >= 120, col("n")).otherwise(0L)).as("weekend_n"))
      .select(col("event_type"), col("n_total"), col("peak_slot"),
        (col("peak_n").cast("double") / col("n_total")).as("peak_share"),
        (col("top8_n").cast("double") / col("n_total")).as("top8_share"),
        (col("weekend_n").cast("double") / col("n_total"))
          .as("weekend_share"))
      .orderBy(col("event_type"))
  }

  private val seasonalitySql =
    """WITH slots AS (
      |  SELECT event_type,
      |    (epoch_us(ts) // 3600000000 + 72) % 168 AS how,
      |    count(*) AS n
      |  FROM events GROUP BY event_type, how),
      |ranked AS (
      |  SELECT event_type, how, n,
      |    row_number() OVER (PARTITION BY event_type
      |                       ORDER BY n DESC, how) AS rk
      |  FROM slots)
      |SELECT event_type,
      |  CAST(sum(n) AS BIGINT) AS n_total,
      |  max(CASE WHEN rk = 1 THEN how END) AS peak_slot,
      |  CAST(max(CASE WHEN rk = 1 THEN n END) AS DOUBLE)
      |    / CAST(sum(n) AS BIGINT) AS peak_share,
      |  CAST(sum(CASE WHEN rk <= 8 THEN n ELSE 0 END) AS DOUBLE)
      |    / CAST(sum(n) AS BIGINT) AS top8_share,
      |  CAST(sum(CASE WHEN how >= 120 THEN n ELSE 0 END) AS DOUBLE)
      |    / CAST(sum(n) AS BIGINT) AS weekend_share
      |FROM ranked GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Classical trend/seasonal decomposition of the per-type hourly
    * event series: trend = centered 25-hour moving average over the
    * DENSE hourly spine (silent hours count as 0 — skipping them
    * biases the trend), seasonal = hour-of-day mean of the detrended
    * residual. The anomaly-baseline builder: alerting compares
    * tomorrow's counts against trend + seasonal, not a global mean.
    *
    * Exactness: the trend is a double division of two exact longs
    * (deterministic); each detrended residual is cast to
    * DECIMAL(38,18) BEFORE summation so the per-(type, hod) mean is
    * an order-free decimal sum — never raw double accumulation.
    *
    * Scale shape: one aggregate to ≤ types × hours rows, a
    * sequence-explode spine from the span aggregate, one in-partition
    * window per type (rows frame ±12), and a final ≤ types × 24
    * aggregate. Everything after the first aggregate is
    * series-length-, not event-count-, sized.
    */
  private def seasonalDecompose(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
      .select(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("hr"))
    val hourly = ev.groupBy(col("event_type"), col("hr"))
      .agg(count(lit(1)).as("n"))
    val spine = ev.agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
      .crossJoin(ev.select(col("event_type")).distinct())
      .select(col("event_type"), explode(sequence(col("h0"), col("h1")))
        .as("hr"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hr"))
      .rowsBetween(-12, 12)
    spine.join(hourly, Seq("event_type", "hr"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("trend",
        sum(col("n")).over(w).cast("double") / count(lit(1)).over(w))
      .withColumn("detr",
        (col("n") - col("trend")).cast(DecimalType(38, 18)))
      .groupBy(col("event_type"), (col("hr") % 24).as("hod"))
      .agg(count(lit(1)).as("n_hours"),
        Quant.qdec(sum(col("detr")).cast("double") / count(lit(1)), 9)
          .as("seasonal")) // qdec: decimal/int ratio can TIE (Quant)
      .orderBy(col("event_type"), col("hod"))
  }

  private val seasonalDecomposeSql =
    """WITH ev AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 AS hr FROM events),
      |hourly AS (
      |  SELECT event_type, hr, count(*) AS n
      |  FROM ev GROUP BY event_type, hr),
      |spine AS (
      |  SELECT t.event_type, unnest(generate_series(s.h0, s.h1)) AS hr
      |  FROM (SELECT min(hr) AS h0, max(hr) AS h1 FROM ev) s
      |  CROSS JOIN (SELECT DISTINCT event_type FROM ev) t),
      |dense AS (
      |  SELECT s.event_type, s.hr, COALESCE(h.n, 0) AS n
      |  FROM spine s LEFT JOIN hourly h
      |    ON s.event_type = h.event_type AND s.hr = h.hr),
      |detrended AS (
      |  SELECT event_type, hr, n,
      |    CAST(n - CAST(sum(n) OVER w AS BIGINT)
      |               / CAST(count(*) OVER w AS BIGINT)
      |      AS DECIMAL(38,18)) AS detr
      |  FROM dense
      |  WINDOW w AS (PARTITION BY event_type ORDER BY hr
      |               ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING))
      |SELECT event_type, hr % 24 AS hod, count(*) AS n_hours,
      |  floor(CAST(sum(detr) AS DOUBLE) / count(*) * 1e9 + 0.5) / 1e9
      |    AS seasonal
      |FROM detrended GROUP BY event_type, hod
      |ORDER BY event_type, hod""".stripMargin

  /** Day-bitmap engagement census — the bitmap-index formulation of
    * activity segmentation: each user's active days fold into ONE
    * BIGINT bitmask (`bit_or(1 << day)`, idempotent — no per-day
    * dedup pass), so active-day count is `bit_count(mask)` and the
    * longest consecutive-day streak is pure mask arithmetic
    * (iterate m → m & (m<<1); iterations-to-zero = longest run),
    * computed on the DISTINCT-mask histogram — never per user. Output
    * is the bounded (n_active_days, longest_streak) census.
    *
    * Scale shape: one shuffle on user_id (map-side combined bit_or),
    * then everything runs on ≤ min(users, 2^window_days) histogram
    * rows. Contract — ENFORCED, not just documented: the event window
    * must fit a BIGINT's non-negative bits (day ≤ 62 from the corpus
    * min-date — the fixture spans 30). Spark's `shiftleft` silently
    * wraps the shift mod 64, so without the guard a longer window
    * folds distinct days onto the same bit and the census is wrong
    * with no error; the per-row raise_error below fails loudly
    * instead, distributed and at zero extra passes. Longer windows →
    * `ev_day_bitmap_sharded`: the same arithmetic over sharded
    * BIGINT masks. Compare ev_retention/ev_dau_wau: same engagement
    * signals via joins/windows — this is the form whose per-user
    * state is 8 bytes.
    */
  private def dayBitmap(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
    val d0 = ev.agg(min(to_date(col("ts"))).as("d0"))
    val hist = ev.crossJoin(broadcast(d0))
      .select(col("user_id"),
        datediff(to_date(col("ts")), col("d0")).as("day"))
      .select(col("user_id"),
        when(col("day") > 62, raise_error(concat(
          lit("ev_day_bitmap: day "), col("day").cast("string"),
          lit(" exceeds the 63-day BIGINT mask window (bits 0..62);" +
            " use ev_day_bitmap_sharded for longer spans"))))
          .otherwise(col("day")).as("day"))
      .groupBy(col("user_id"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), day))").as("mask"))
      .groupBy(col("mask")).agg(count(lit(1)).as("n_users"))
    // 63-step fold on the tiny histogram relation (interpreted HOF is
    // fine off the corpus path): k = iterations until m & (m<<1)
    // reaches zero = the longest run of consecutive set bits
    hist
      .withColumn("longest_streak",
        expr("""aggregate(sequence(1, 63), struct(mask AS m, 0 AS k),
          (acc, i) -> IF(acc.m <> 0,
            struct(acc.m & shiftleft(acc.m, 1) AS m, acc.k + 1 AS k),
            acc),
          acc -> acc.k)"""))
      .groupBy(expr("CAST(bit_count(mask) AS INT)").as("n_active_days"),
        col("longest_streak"))
      .agg(sum(col("n_users")).as("n_users"))
      .orderBy(col("n_active_days"), col("longest_streak"))
  }

  private val dayBitmapSql =
    """WITH RECURSIVE d0 AS (
      |  SELECT min(CAST(ts AS DATE)) AS d0 FROM events),
      |um AS (
      |  SELECT user_id,
      |    bit_or(CAST(1 AS BIGINT) << datediff('day', d0, CAST(ts AS DATE)))
      |      AS mask
      |  FROM events CROSS JOIN d0 GROUP BY user_id),
      |hist AS (SELECT mask, count(*) AS nu FROM um GROUP BY mask),
      |r(mask, m, k) AS (
      |  SELECT mask, mask, 0 FROM hist
      |  UNION ALL
      |  -- clear bit 62 before the shift: DuckDB ERRORS on a left
      |  -- shift into the sign bit (day 62 is in-contract), and bit 63
      |  -- of the mask is always 0 so the AND result is identical
      |  SELECT mask, m & ((m & 4611686018427387903) << 1), k + 1
      |  FROM r WHERE m <> 0),
      |st AS (
      |  SELECT mask, CAST(max(k) AS INT) AS longest_streak
      |  FROM r GROUP BY mask)
      |SELECT CAST(bit_count(hist.mask) AS INT) AS n_active_days,
      |  longest_streak, CAST(sum(nu) AS BIGINT) AS n_users
      |FROM hist JOIN st USING (mask)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Sharded day-bitmap census — `ev_day_bitmap`'s "longer windows
    * shard the mask" claim made real instead of asserted: the same
    * bit_or / bit_count / m&(m<<1) arithmetic over an array of
    * 63-bit BIGINT shards (bits 0..62 per shard; bit 62 carries into
    * the next shard's shiftleft, so streaks cross shard boundaries
    * exactly as they would in one wide register). The fixture's
    * 30-day window is deterministically stretched to ~130 synthetic
    * days (day = datediff + 50·(length(event_type) mod 4), replayed
    * verbatim by the oracle) so the correctness row really exercises
    * >63 days, boundary-crossing streaks included. NShards is a
    * plan-time constant (a production job derives it from the window
    * config, ceil(days/63)); out-of-window days fail loudly via the
    * same per-row raise_error as the unsharded form.
    *
    * Scale shape is unchanged: one user_id shuffle with map-side
    * combined bit_ors (NShards × 8 bytes of per-user state), then the
    * streak fold runs on the DISTINCT-(m0..mN) histogram only —
    * nothing corpus-sized ever leaves the shuffle.
    */
  private val ShardBits = 63
  private val NShards = 3

  private def dayBitmapSharded(s: SparkSession, dir: String): DataFrame = {
    val maxDay = NShards * ShardBits - 1
    // clear bit 62 before the <<1 so the shift never touches the sign
    // bit (Spark would wrap silently; DuckDB errors) — the cleared bit
    // re-enters as the next shard's carry-in
    val preMask = (1L << (ShardBits - 1)) - 1
    val ev = Tables(s, dir, "events")
    val d0 = ev.agg(min(to_date(col("ts"))).as("d0"))
    val hist = ev.crossJoin(broadcast(d0))
      .select(col("user_id"),
        (datediff(to_date(col("ts")), col("d0")) +
          lit(50) * (length(col("event_type")) % 4)).as("day"))
      .select(col("user_id"),
        when(col("day") > maxDay, raise_error(concat(
          lit("ev_day_bitmap_sharded: day "), col("day").cast("string"),
          lit(s" exceeds the $NShards-shard window (${maxDay + 1} days);" +
            " raise NShards"))))
          .otherwise(col("day")).as("day"))
      .groupBy(col("user_id"))
      .agg(
        expr(s"bit_or(IF(day div $ShardBits = 0, " +
          s"shiftleft(CAST(1 AS BIGINT), day % $ShardBits), " +
          "CAST(0 AS BIGINT)))").as("m0"),
        (1 until NShards).map(j =>
          expr(s"bit_or(IF(day div $ShardBits = $j, " +
            s"shiftleft(CAST(1 AS BIGINT), day % $ShardBits), " +
            "CAST(0 AS BIGINT)))").as(s"m$j")): _*)
      .groupBy((0 until NShards).map(j => col(s"m$j")): _*)
      .agg(count(lit(1)).as("n_users"))
    // the m&(m<<1) fold, sharded: shl1 of shard j = (m_j & preMask)<<1
    // OR'd with shard j-1's bit 62 — one wide register in N pieces.
    // Runs on the tiny histogram relation only (interpreted HOF ok).
    def shl1(j: Int): String =
      if (j == 0) s"shiftleft(acc.a0 & $preMask, 1)"
      else s"(shiftleft(acc.a$j & $preMask, 1) | " +
        s"(shiftright(acc.a${j - 1}, ${ShardBits - 1}) & 1))"
    val nonZero = (0 until NShards).map(j => s"acc.a$j <> 0").mkString(" OR ")
    val initial = (0 until NShards).map(j => s"m$j AS a$j").mkString(", ")
    val step = (0 until NShards).map(j => s"acc.a$j & ${shl1(j)} AS a$j")
      .mkString(", ")
    hist
      .withColumn("longest_streak",
        expr(s"""aggregate(sequence(1, ${NShards * ShardBits}),
          struct($initial, 0 AS k),
          (acc, i) -> IF($nonZero,
            struct($step, acc.k + 1 AS k),
            acc),
          acc -> acc.k)"""))
      .groupBy(expr((0 until NShards).map(j => s"bit_count(m$j)")
        .mkString("CAST(", " + ", " AS INT)")).as("n_active_days"),
        col("longest_streak"))
      .agg(sum(col("n_users")).as("n_users"))
      .orderBy(col("n_active_days"), col("longest_streak"))
  }

  private val dayBitmapShardedSql =
    """WITH RECURSIVE d0 AS (
      |  SELECT min(CAST(ts AS DATE)) AS d0 FROM events),
      |dy AS (
      |  SELECT user_id,
      |    datediff('day', d0, CAST(ts AS DATE))
      |      + 50 * (length(event_type) % 4) AS day
      |  FROM events CROSS JOIN d0),
      |um AS (
      |  SELECT user_id,
      |    bit_or(CASE WHEN day // 63 = 0
      |      THEN CAST(1 AS BIGINT) << (day % 63) ELSE CAST(0 AS BIGINT)
      |      END) AS m0,
      |    bit_or(CASE WHEN day // 63 = 1
      |      THEN CAST(1 AS BIGINT) << (day % 63) ELSE CAST(0 AS BIGINT)
      |      END) AS m1,
      |    bit_or(CASE WHEN day // 63 = 2
      |      THEN CAST(1 AS BIGINT) << (day % 63) ELSE CAST(0 AS BIGINT)
      |      END) AS m2
      |  FROM dy GROUP BY user_id),
      |hist AS (SELECT m0, m1, m2, count(*) AS nu FROM um GROUP BY 1, 2, 3),
      |r(m0, m1, m2, a0, a1, a2, k) AS (
      |  SELECT m0, m1, m2, m0, m1, m2, 0 FROM hist
      |  UNION ALL
      |  SELECT m0, m1, m2,
      |    a0 & ((a0 & 4611686018427387903) << 1),
      |    a1 & (((a1 & 4611686018427387903) << 1) | ((a0 >> 62) & 1)),
      |    a2 & (((a2 & 4611686018427387903) << 1) | ((a1 >> 62) & 1)),
      |    k + 1
      |  FROM r WHERE a0 <> 0 OR a1 <> 0 OR a2 <> 0),
      |st AS (
      |  SELECT m0, m1, m2, CAST(max(k) AS INT) AS longest_streak
      |  FROM r GROUP BY 1, 2, 3)
      |SELECT
      |  CAST(bit_count(hist.m0) + bit_count(hist.m1) + bit_count(hist.m2)
      |    AS INT) AS n_active_days,
      |  longest_streak, CAST(sum(nu) AS BIGINT) AS n_users
      |FROM hist JOIN st USING (m0, m1, m2)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Session sequence-pattern matching — the MATCH_RECOGNIZE
    * capability (Flink/Trino `PATTERN (V+ C P)`) Spark has no native
    * operator for: per 30-minute-gap session, count strictly
    * contiguous `view+ click purchase` occurrences. The scalable
    * encoding is the classic one — sessionize, collapse each session
    * to a one-char-per-event string (bounded by session length, never
    * corpus length), and run the pattern as a regex over session
    * strings: one linear pass per session, embarrassingly parallel,
    * no self-joins and no per-step window cascade (compare
    * ev_funnel_windowed, which hand-builds ONE fixed 3-step funnel
    * from two windows — the regex form expresses arbitrary patterns).
    * Event codes fail loudly on an unmapped type (the day-bitmap
    * raise_error convention) rather than silently dropping events;
    * ordering inside a session is pinned by (us, event_id) so
    * same-microsecond events cannot flip the string across engines.
    * Output: per user-decile cohort, sessions / matching sessions /
    * total matches / match rate.
    */
  /** The operator proper, parameterized (the PipelineConfig
    * convention): event-code mapping, pattern, and session gap are
    * caller inputs validated eagerly at config construction, and the
    * registered `ev_sequence_pattern` query is just the Default
    * instantiation. Arbitrary patterns over arbitrary alphabets run
    * in the same single pass — that is the operator's whole pitch vs
    * the hand-built fixed funnel (ev_funnel_windowed).
    */
  /** The shared sessionize-and-stringify pass: one row per (user,
    * session) with the session's one-char-per-event string. Every
    * pattern variant below rides this SAME single pass — that is the
    * operator's whole economy (N patterns cost one corpus scan plus N
    * regex evaluations over session-length strings).
    */
  private def sessionStrings(cfg: SequencePatternConfig)(
      s: SparkSession, dir: String): DataFrame = {
    val gapUs = cfg.gapMinutes.toLong * 60 * 1000000
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val mapped = cfg.codes.toSeq.sortBy(_._1)
    val code = mapped.tail
      .foldLeft(when(col("event_type") === mapped.head._1, mapped.head._2)) {
        case (w, (t, c)) => w.when(col("event_type") === t, c)
      }
      .otherwise(raise_error(concat(
        lit("ev_sequence_pattern: unmapped event_type "),
        col("event_type"))))
    Tables(s, dir, "events")
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("us"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1)
          .otherwise(0))
      .withColumn("session_seq",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("code", code)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(expr("array_join(transform(" +
        "array_sort(collect_list(struct(us, event_id, code))), " +
        "x -> x.code), '')").as("str"))
  }

  private[graft] def sequencePatternWith(cfg: SequencePatternConfig)(
      s: SparkSession, dir: String): DataFrame = {
    sessionStrings(cfg)(s, dir)
      .withColumn("n_matches",
        // pattern as a literal ARGUMENT, not spliced into an expr
        // string — no escaping/injection surface for caller regexes
        size(regexp_extract_all(col("str"), lit(cfg.pattern), lit(0))))
      .groupBy((col("user_id") % 10).as("cohort"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_matches") > 0, 1L).otherwise(0L))
          .as("n_match_sessions"),
        sum(col("n_matches")).as("n_matches"))
      .withColumn("match_rate", Quant.qdec(
        col("n_match_sessions").cast("double") / col("n_sessions"), 9))
      .orderBy(col("cohort"))
  }

  private def sequencePattern(s: SparkSession, dir: String): DataFrame =
    sequencePatternWith(SequencePatternConfig.Default)(s, dir)

  /** N patterns in ONE pass — the economy the regex encoding buys
    * over hand-built funnels: the corpus is sessionized and
    * stringified once, then every pattern is a regex evaluation over
    * session-length strings (computed side by side in one projection,
    * unpivoted with `stack`). A product team's whole pattern
    * dashboard costs one scan; the windowed-funnel alternative costs
    * a window cascade PER pattern. Pattern names become output rows,
    * so they are validated as identifiers (they pass through a stack
    * expression); regexes compile eagerly, as in the single-pattern
    * config.
    */
  private[graft] def sequencePatternsMulti(cfg: SequencePatternConfig,
      patterns: Map[String, String])(
      s: SparkSession, dir: String): DataFrame = {
    require(patterns.nonEmpty, "at least one pattern")
    patterns.foreach { case (n, p) =>
      require(n.matches("[A-Za-z][A-Za-z0-9_]*"),
        s"pattern name '$n' must be an identifier")
      java.util.regex.Pattern.compile(p)
    }
    val named = patterns.toSeq.sortBy(_._1)
    val counted = sessionStrings(cfg)(s, dir).select(
      (col("user_id") % 10).as("cohort") +: named.map { case (n, p) =>
        size(regexp_extract_all(col("str"), lit(p), lit(0))).as(n)
      }: _*)
    val stackExpr = s"stack(${named.size}, " + named.map { case (n, _) =>
      s"'$n', `$n`"
    }.mkString(", ") + ") AS (pattern_name, n_matches)"
    counted.select(col("cohort"), expr(stackExpr))
      .groupBy(col("cohort"), col("pattern_name"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_matches") > 0, 1L).otherwise(0L))
          .as("n_match_sessions"),
        sum(col("n_matches")).as("n_matches"))
      .withColumn("match_rate", Quant.qdec(
        col("n_match_sessions").cast("double") / col("n_sessions"), 9))
      .orderBy(col("cohort"), col("pattern_name"))
  }

  /** The registered instantiation: the default funnel, a stricter
    * double-view variant, and a NON-contiguous signup→purchase
    * pattern (`s.*p` — anything may intervene), which the strictly
    * contiguous chain encodings cannot express at all.
    */
  private val MultiPatterns = Map(
    "funnel" -> "v+cp",
    "double_view_click" -> "vvc",
    "signup_then_purchase" -> "s.*p")

  private def sequencePatternMulti(s: SparkSession, dir: String): DataFrame =
    sequencePatternsMulti(SequencePatternConfig.Default, MultiPatterns)(s, dir)

  private val sequencePatternSql =
    """WITH marked AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us,
      |    CASE event_type WHEN 'click' THEN 'c' WHEN 'error' THEN 'e'
      |      WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
      |      WHEN 'view' THEN 'v' END AS code,
      |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |numbered AS (
      |  SELECT *, sum(new_session) OVER (
      |    PARTITION BY user_id ORDER BY us
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      |  FROM marked),
      |sess AS (
      |  SELECT user_id, session_seq,
      |    string_agg(code, '' ORDER BY us, event_id) AS str
      |  FROM numbered GROUP BY 1, 2),
      |scored AS (
      |  SELECT user_id,
      |    len(regexp_extract_all(str, 'v+cp')) AS n_matches
      |  FROM sess)
      |SELECT user_id % 10 AS cohort, count(*) AS n_sessions,
      |  CAST(sum(CASE WHEN n_matches > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_match_sessions,
      |  CAST(sum(n_matches) AS BIGINT) AS n_matches,
      |  floor(CAST(sum(CASE WHEN n_matches > 0 THEN 1 ELSE 0 END)
      |      AS DOUBLE) / count(*) * 1e9 + 0.5) / 1e9 AS match_rate
      |FROM scored GROUP BY 1 ORDER BY 1""".stripMargin

  private val sequencePatternMultiSql = {
    val pats = MultiPatterns.toSeq.sorted
      .map { case (n, p) => s"('$n', '$p')" }.mkString(", ")
    s"""WITH marked AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS us,
       |    CASE event_type WHEN 'click' THEN 'c' WHEN 'error' THEN 'e'
       |      WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
       |      WHEN 'view' THEN 'v' END AS code,
       |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
       |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
       |         THEN 1 ELSE 0 END AS new_session
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
       |numbered AS (
       |  SELECT *, sum(new_session) OVER (
       |    PARTITION BY user_id ORDER BY us
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
       |  FROM marked),
       |sess AS (
       |  SELECT user_id, session_seq,
       |    string_agg(code, '' ORDER BY us, event_id) AS str
       |  FROM numbered GROUP BY 1, 2),
       |pats(pattern_name, pattern) AS (VALUES $pats),
       |scored AS (
       |  SELECT user_id, pattern_name,
       |    len(regexp_extract_all(str, pattern)) AS n_matches
       |  FROM sess CROSS JOIN pats)
       |SELECT user_id % 10 AS cohort, pattern_name,
       |  count(*) AS n_sessions,
       |  CAST(sum(CASE WHEN n_matches > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_match_sessions,
       |  CAST(sum(n_matches) AS BIGINT) AS n_matches,
       |  floor(CAST(sum(CASE WHEN n_matches > 0 THEN 1 ELSE 0 END)
       |      AS DOUBLE) / count(*) * 1e9 + 0.5) / 1e9 AS match_rate
       |FROM scored GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("ev_sequence_pattern", sequencePattern,
      Some(sequencePatternSql)),
    QueryDef("ev_sequence_pattern_multi", sequencePatternMulti,
      Some(sequencePatternMultiSql)),
    QueryDef("ev_day_bitmap_sharded", dayBitmapSharded,
      Some(dayBitmapShardedSql)),
    QueryDef("ev_day_bitmap", dayBitmap, Some(dayBitmapSql)),
    QueryDef("ev_seasonal_decompose", seasonalDecompose,
      Some(seasonalDecomposeSql)),
    QueryDef("ev_gap_fill", gapFill, Some(gapFillSql)),
    QueryDef("ev_bot_detect", botDetect, Some(botDetectSql)),
    QueryDef("ev_seasonality", seasonality, Some(seasonalitySql)),
    QueryDef("ev_survival", survival, Some(survivalSql)),
    QueryDef("ev_markov_backtest", markovBacktest, Some(markovBacktestSql)),
    QueryDef("ev_forecast_baseline", forecastBaseline,
      Some(forecastBaselineSql)),
    QueryDef("ev_variant_props", variantProps, Some(variantPropsSql)),
    QueryDef("ev_attribution", attribution, Some(attributionSql)),
    QueryDef("ev_pit_features", pitFeatures, Some(pitFeaturesSql)),
    QueryDef("ev_rfm", rfm, Some(rfmSql)),
    QueryDef("ev_ewma", ewma, Some(ewmaSql)),
    QueryDef("ev_path_analysis", pathAnalysis, Some(pathAnalysisSql)),
    QueryDef("ev_cusum_changepoint", cusumChangepoint,
      Some(cusumChangepointSql)),
    QueryDef("ev_anomaly_mad", madOutliers, Some(madOutliersSql)),
    QueryDef("ev_retention", retention, Some(retentionSql)),
    QueryDef("ev_funnel", funnel, Some(funnelSql)),
    QueryDef("ev_user_cms", userCms, Some(userCmsSql)),
    QueryDef("ev_zscore_outliers", zscoreOutliers, Some(zscoreOutliersSql)),
    QueryDef("ev_json_props", jsonProps, Some(jsonPropsSql)),
    QueryDef("ev_hourly_by_type", hourly, Some(hourlySql)),
    QueryDef("ev_sessionize", sessionize, Some(sessionizeSql)),
    QueryDef("ev_sliding_windows", sliding, Some(slidingSql)),
    QueryDef("ev_session_window_batch", sessionWindowBatch,
      Some(sessionWindowBatchSql)),
    QueryDef("ev_user_stats", userStats, Some(userStatsSql)),
    QueryDef("ev_ab_test", abTest, Some(abTestSql)),
    QueryDef("ev_funnel_windowed", funnelWindowed, Some(funnelWindowedSql)),
    QueryDef("ev_markov_transitions", markovTransitions,
      Some(markovTransitionsSql)),
    QueryDef("ev_dau_wau", dauWau, Some(dauWauSql)),
    QueryDef("ev_cohort_matrix", cohortMatrix, Some(cohortMatrixSql)),
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
    QueryDef("evs_variant_tumbling",
      (s, d) => graft.streaming.EventStream.variantTumbling(s, d),
      Some("""SELECT date_trunc('hour', ts) AS hour, event_type,
             |  count(CAST(props ->> '$.k' AS BIGINT)) AS n_with_k,
             |  CAST(sum(CAST(props ->> '$.k' AS BIGINT)) AS BIGINT)
             |    AS sum_k
             |FROM events GROUP BY 1, 2
             |ORDER BY hour, event_type""".stripMargin)),
    // Sliding windows: the oracle expands each event into its 4
    // covering (2h, 30m-slide) windows — Spark's epoch-aligned window
    // starts coincide with DuckDB's time_bucket (30 min divides a day,
    // both anchor at midnight UTC).
    QueryDef("evs_sliding_counts",
      (s, d) => graft.streaming.EventStream.slidingCounts(s, d),
      Some("""SELECT ws AS window_start, event_type, count(*) AS n
             |FROM (
             |  SELECT event_type,
             |    time_bucket(INTERVAL 30 MINUTES, ts) - to_minutes(30 * k)
             |      AS ws
             |  FROM events, (SELECT unnest(range(0, 4)) AS k))
             |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin)),
    QueryDef("evs_session_windows",
      (s, d) => graft.streaming.EventStream.sessionWindows(s, d),
      Some(sessionWindowBatchSql)),
    // hand-built flatMapGroupsWithState sessionizer vs the SAME batch
    // oracle as the declarative session_window — custom state
    // machinery must earn zero semantic drift
    QueryDef("evs_session_custom_state",
      (s, d) => graft.streaming.EventStream.sessionCustomState(s, d),
      Some(sessionWindowBatchSql)),
    // bounded-ring stateful EWMA vs the batch window query's oracle —
    // the incremental serving shape of ev_ewma
    QueryDef("evs_ewma_state",
      (s, d) => graft.streaming.EventStream.ewmaState(s, d),
      Some(ewmaSql)),
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
    // streaming CDC apply: the five-version change log arrives as five
    // micro-batches, each MERGEd into key-partitioned persisted state
    // via dynamic partition overwrite; the drained table must match
    // the batch compaction oracle exactly (shared with mig_cdc_merge)
    QueryDef("evs_cdc_apply",
      (s, d) => graft.streaming.CdcApply(s, d),
      Some(Migration.cdcMergeSql)),
    QueryDef("evs_stream_full_join",
      (s, d) => graft.streaming.EventStream.purchaseClickFullJoin(s, d),
      Some("""SELECT p.event_id AS purchase_id, c.event_id AS click_id,
             |  COALESCE(p.user_id, c.user_id) AS user_id
             |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
             |  FULL JOIN (SELECT * FROM events WHERE event_type = 'click') c
             |  ON p.user_id = c.user_id
             | AND c.ts >= p.ts AND c.ts <= p.ts + INTERVAL 10 MINUTE
             |ORDER BY purchase_id, click_id""".stripMargin)),
    QueryDef("evs_windowed_topk",
      (s, d) => graft.streaming.EventStream.windowedTopK(s, d),
      Some("""WITH counts AS (
             |  SELECT date_trunc('hour', ts) AS hour, event_type,
             |    count(*) AS n
             |  FROM events GROUP BY 1, 2),
             |ranked AS (
             |  SELECT *, row_number() OVER (PARTITION BY hour
             |      ORDER BY n DESC, event_type) AS rnk
             |  FROM counts)
             |SELECT hour, rnk, event_type, n FROM ranked
             |WHERE rnk <= 3 ORDER BY hour, rnk""".stripMargin)),
    QueryDef("evs_stream_semi_join",
      (s, d) => graft.streaming.EventStream.purchaseClickSemiJoin(s, d),
      Some("""SELECT p.event_id AS purchase_id, p.user_id
             |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
             |WHERE EXISTS (
             |  SELECT 1 FROM events c
             |  WHERE c.event_type = 'click' AND c.user_id = p.user_id
             |    AND c.ts >= p.ts AND c.ts <= p.ts + INTERVAL 10 MINUTE)
             |ORDER BY purchase_id""".stripMargin)),
    QueryDef("evs_stream_dedup",
      (s, d) => graft.streaming.EventStream.streamingDedup(s, d),
      Some("""SELECT DISTINCT user_id, event_type FROM events
             |ORDER BY user_id, event_type""".stripMargin)),
    // Late-data drop: the oracle predicts the single surviving probe
    // window from max(ts); if the aggregation ever stops dropping the
    // late row, a second row appears and the gate fails on row count.
    QueryDef("evs_late_data_drop",
      (s, d) => graft.streaming.EventStream.lateDataDrop(s, d),
      Some("""SELECT CAST(date_trunc('hour', max(ts) + INTERVAL 1 HOUR)
             |    AS TIMESTAMP) AS hour,
             |  CAST(1 AS BIGINT) AS n
             |FROM events""".stripMargin)),
    QueryDef("evs_dedup_within_watermark",
      (s, d) => graft.streaming.EventStream.streamingDedupWithinWatermark(s, d),
      Some("""SELECT DISTINCT user_id, event_type FROM events
             |ORDER BY user_id, event_type""".stripMargin)),
    QueryDef("evs_jdbc_sink",
      (s, d) => graft.streaming.EventStream.jdbcSink(s, d),
      Some("""SELECT event_type, count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |    AS total_value
             |FROM events GROUP BY event_type
             |ORDER BY event_type""".stripMargin)),
    QueryDef("evs_user_running_counts",
      (s, d) => graft.streaming.EventStream.userRunningCounts(s, d),
      Some("""SELECT user_id, count(*) AS n_events
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)))
}
