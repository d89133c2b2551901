package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Third batch: bucketed range join, custom-aggregate top-k, salted
  * skew-safe aggregation, exact percentiles.
  */
object Relational3 {

  /** Explicit GROUPING SETS with the grouping-identification function
    * — the corner ROLLUP/CUBE (q09/q26) don't exercise: a hand-picked
    * set list (two one-dimension slices plus the grand total, NOT the
    * rollup lattice) where `grouping()` flags distinguish a genuine
    * NULL group key from a superaggregate row. Routed through
    * `spark.sql` GROUPING SETS text; one aggregation pass expanding to
    * the declared sets only, partial-aggregated like any groupBy.
    */
  private def groupingSetsId(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "orders").createOrReplaceTempView("orders_gs")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
        |  CAST(grouping(o_orderpriority) AS INT) AS g_priority,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_price
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY g_status, g_priority,
        |  o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
        |""".stripMargin)
  }

  private val groupingSetsIdSql =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
      |  CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
      |  count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS total_price
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY g_status, g_priority,
      |  o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** Null-aware window battery — IGNORE NULLS navigation and
    * positional frame functions, the SQL:2011 corner every migration
    * from a warehouse dialect trips over: per customer in order-date
    * order, the most recent HIGH-VALUE order (a derived nullable
    * column walked with last_value IGNORE NULLS), the second order's
    * price (nth_value under an explicit running frame), and a running
    * filtered count. All frames are explicit ROWS UNBOUNDED
    * PRECEDING..CURRENT ROW on a unique (date, key) order, so both
    * engines see identical frame contents. Windows partition BY
    * CUSTOMER — parallel across the key space, never global.
    */
  private def windowIgnoreNulls(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(s, dir, "orders")
      .filter(col("o_custkey") <= 200)
      .withColumn("big", when(col("o_totalprice") > 200000.0,
        col("o_totalprice")))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        last(col("big"), ignoreNulls = true).over(w).as("last_big_price"),
        nth_value(col("o_totalprice"), 2).over(w).as("second_price"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).over(w)
          .as("n_f_so_far"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  private val windowIgnoreNullsSql =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  last_value(CASE WHEN o_totalprice > 200000.0
      |      THEN o_totalprice END IGNORE NULLS)
      |    OVER w AS last_big_price,
      |  nth_value(o_totalprice, 2) OVER w AS second_price,
      |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
      |    OVER w AS BIGINT) AS n_f_so_far
      |FROM orders WHERE o_custkey <= 200
      |WINDOW w AS (PARTITION BY o_custkey
      |  ORDER BY o_orderdate, o_orderkey
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin

  /** Interval/range join — pairs of events by the same user within
    * ±10 minutes of each other. A plain inequality join degenerates to
    * a nested-loop at scale; the scalable plan buckets time by the
    * interval width and equi-joins on (key, bucket) with one side
    * probing its adjacent buckets, then applies the exact range
    * filter — cardinality scales with true matches, not n².
    */
  private def rangeJoin(s: SparkSession, dir: String): DataFrame = {
    val winUs = 600000000L // 10 minutes
    val base = Tables(s, dir, "events")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
    val right = base.select(col("event_id").as("id_b"),
      col("user_id").as("ub"), col("us").as("us_b"))
      .withColumn("bucket", floor(col("us_b") / winUs))
    val left = base.select(col("event_id").as("id_a"),
      col("user_id").as("ua"), col("us").as("us_a"))
      .withColumn("bucket",
        explode(array(floor(col("us_a") / winUs) - 1,
          floor(col("us_a") / winUs), floor(col("us_a") / winUs) + 1)))
    left.join(right,
        left("ua") === right("ub") && left("bucket") === right("bucket"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("us_a") - col("us_b")) <= winUs)
      .select(col("id_a"), col("id_b"), (col("us_b") - col("us_a")).as("delta_us"))
      .orderBy(col("id_a"), col("id_b"))
  }

  private val rangeJoinSql =
    """SELECT a.event_id AS id_a, b.event_id AS id_b,
      |  epoch_us(b.ts) - epoch_us(a.ts) AS delta_us
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id AND a.event_id < b.event_id
      | AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 600000000
      |ORDER BY id_a, id_b""".stripMargin

  /** The same ±10-minute pair join as q20, but through the custom
    * interval-join operator (graft.plans.IntervalJoin: LogicalPlan +
    * Strategy + sliding-window sort-merge exec) instead of the
    * bucket-explode composition. Shares q20's oracle, so the custom
    * physical operator is held to the same ground truth; the exec
    * merges each partition in one pass with memory bounded by the
    * window width — no explode, no distinct.
    */
  private def intervalCustom(s: SparkSession, dir: String): DataFrame = {
    val winUs = 600000000L
    val base = Tables(s, dir, "events")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
    val a = base.select(col("event_id").as("id_a"), col("user_id").as("ua"),
      col("us").as("us_a"))
    val b = base.select(col("event_id").as("id_b"), col("user_id").as("ub"),
      col("us").as("us_b"))
    graft.plans.IntervalJoin.join(s, a, b, "ua", "ub", "us_a", "us_b",
        -winUs, winUs)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (col("us_b") - col("us_a")).as("delta_us"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Top-3 orders per customer via the custom Catalyst
    * [[graft.operators.TopKPairsAgg]] (map-side bounded top-k: k pairs
    * per group cross the shuffle instead of every row) — same result
    * contract as the window form (q06), same oracle shape. Prices
    * scaled to exact cents inside the aggregate; the final
    * cents→double division is the same nearest-double the oracle's
    * decimal→double cast produces.
    */
  private def topkAggregate(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(graft.operators.TopKPairsAgg(
        (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long"),
        col("o_orderkey"), 3).as("top"))
      .select(col("o_custkey"), posexplode(col("top")).as(Seq("i", "p")))
      .select(col("o_custkey"), col("p.tie").as("o_orderkey"),
        (col("p.value").cast("double") / 100.0).as("price"),
        (col("i") + 1).as("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  // same semantics as q06: price desc, orderkey asc tie-break
  private val topkAggregateSql =
    """SELECT o_custkey, o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price, rn
      |FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |                       ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC,
      |                                o_orderkey) AS rn
      |  FROM orders)
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  /** Skew-safe two-stage aggregation: pre-aggregate on (word, salt)
    * then combine — the standard fix when one key dominates (stop
    * words here). Identical result to the direct groupBy, proven by
    * sharing ta_word_topk's oracle.
    */
  private def wordTopkSalted(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .withColumn("salt", pmod(crc32(monotonically_increasing_id().cast("string")), lit(16)))
      .groupBy(col("word"), col("salt"))
      .agg(count(lit(1)).as("pn"))
      .groupBy(col("word"))
      .agg(sum(col("pn")).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(20)
  }

  private val wordTopkSaltedSql =
    """SELECT word, count(*) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |GROUP BY word ORDER BY n DESC, word LIMIT 20""".stripMargin

  /** Exact linear-interpolation percentiles (both engines sort the
    * group and interpolate identically on these doubles).
    */
  private def percentiles(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("p50_qty"),
        expr("percentile(l_extendedprice, 0.25)").as("p25_price"),
        expr("percentile(l_extendedprice, 0.95)").as("p95_price"))
      .orderBy(col("l_returnflag"))
  }

  private val percentilesSql =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.5) AS p50_qty,
      |  quantile_cont(l_extendedprice, 0.25) AS p25_price,
      |  quantile_cont(l_extendedprice, 0.95) AS p95_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Salted SHUFFLE join on a genuinely hot key — the companion to
    * q22's salted aggregation. `event_type` has a handful of values
    * over the whole fact table, so a plain shuffled equi-join sends
    * each type's entire partition to ONE reducer; salting the fact
    * side (16 buckets) and exploding the dim side ×16 spreads every
    * hot key across 16 reducers. The join is hinted shuffle_hash
    * because salting is a no-op under broadcast — this query is the
    * gate-checked demonstration of the pattern for dims too big to
    * broadcast (the oracle proves bit-equality with the unsalted
    * join). The dim's per-type stats are decimal-exact sums so the
    * above-average comparison is order-independent.
    */
  private def saltedSkewJoin(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val Salts = 16
    val facts = Tables(s, dir, "events")
      .select(col("event_id"), col("event_type"), col("value"))
      .withColumn("salt",
        pmod(crc32(col("event_id").cast("string")), lit(Salts)))
    val dim = Tables(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_t"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sv"))
      .withColumn("salt", explode(sequence(lit(0), lit(Salts - 1))))
      .withColumn("salt", col("salt").cast("long"))
    facts.join(dim.hint("shuffle_hash"), Seq("event_type", "salt"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        count(when(col("value") * col("n_t") > col("sv"), 1)).as("n_above"))
      .orderBy(col("event_type"))
  }

  private val saltedSkewJoinSql =
    """WITH dim AS (
      |  SELECT event_type, count(*) AS n_t,
      |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv
      |  FROM events GROUP BY 1)
      |SELECT event_type, count(*) AS n,
      |  count(*) FILTER (value * n_t > sv) AS n_above
      |FROM events JOIN dim USING (event_type)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** The same as-of join as q14, but through the custom operator
    * (graft.plans.AsOfJoin: LogicalPlan + Strategy + sort-merge
    * SparkPlan) instead of the union+window composition. Shares q14's
    * DuckDB native-ASOF oracle, so the custom physical operator is
    * held to the same ground truth.
    */
  private def asofCustom(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables(s, dir, "orders")
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("matched_orderkey"))
      .select(col("o_custkey").cast("long").as("r_k"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("r_t"),
        col("matched_orderkey"))
    val events = Tables(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), (col("user_id") + 1).cast("long").as("l_k"),
        unix_micros(col("ts")).as("l_t"))
    graft.plans.AsOfJoin.join(s, events, orders, "l_k", "r_k", "l_t", "r_t")
      .select(col("event_id"), col("l_k").as("custkey"),
        col("matched_orderkey"))
      .orderBy(col("event_id"))
  }

  private val asofCustomSql =
    """WITH o AS (
      |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
      |  FROM orders GROUP BY 1, 2)
      |SELECT e.event_id, e.user_id + 1 AS custkey,
      |  o.o_orderkey AS matched_orderkey
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') e
      |  ASOF JOIN o
      |  ON e.user_id + 1 = o.o_custkey AND e.ts >= o.o_orderdate
      |ORDER BY event_id""".stripMargin

  /** Window-function battery: ranking, navigation and frame functions
    * with fully deterministic ordering.
    */
  private def windowBattery(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wFrame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(s, dir, "orders")
      .filter(col("o_custkey") <= 50)
      .select(
        col("o_custkey"), col("o_orderkey"),
        rank().over(Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderpriority"))).as("rnk"),
        dense_rank().over(Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderpriority"))).as("drnk"),
        lead(col("o_orderkey"), 1).over(w).as("next_key"),
        lag(col("o_orderkey"), 1).over(w).as("prev_key"),
        first(col("o_orderkey")).over(wFrame).as("first_key"),
        ntile(4).over(w).as("quartile"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  private val windowBatterySql =
    """SELECT o_custkey, o_orderkey,
      |  rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS rnk,
      |  dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS drnk,
      |  lead(o_orderkey, 1) OVER w AS next_key,
      |  lag(o_orderkey, 1) OVER w AS prev_key,
      |  first_value(o_orderkey) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_key,
      |  ntile(4) OVER w AS quartile
      |FROM orders WHERE o_custkey <= 50
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** CUBE grouping sets over two dimensions with exact decimal sums. */
  private def cube2d(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast("double").as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)
  }

  private val cube2dSql =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** Pearson correlation from exact decimal moments: Σx, Σy, Σxy,
    * Σx², Σy² accumulate in decimal (order-independent), and only the
    * final closed-form division happens in double — so corr() is
    * deterministic under any partitioning, unlike the built-in
    * streaming-moment implementation.
    */
  private def correlation(s: SparkSession, dir: String): DataFrame = {
    val x = col("l_quantity").cast(DecimalType(18, 2))
    val y = col("l_extendedprice").cast(DecimalType(18, 2))
    Tables(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum((x * y).cast(DecimalType(38, 4))).as("sxy"),
        sum((x * x).cast(DecimalType(38, 4))).as("sxx"),
        sum((y * y).cast(DecimalType(38, 4))).as("syy"))
      .select(col("l_returnflag"), col("n"),
        round(
          (col("n").cast("double") * col("sxy").cast("double") -
            col("sx").cast("double") * col("sy").cast("double")) /
            (sqrt(col("n").cast("double") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")) *
              sqrt(col("n").cast("double") * col("syy").cast("double") -
                col("sy").cast("double") * col("sy").cast("double"))),
          9).as("corr_qty_price"))
      .orderBy(col("l_returnflag"))
  }

  private val correlationSql =
    """WITH m AS (
      |  SELECT l_returnflag, count(*) AS n,
      |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
      |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
      |    sum(CAST(CAST(l_quantity AS DECIMAL(18,2))
      |           * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS sxy,
      |    sum(CAST(CAST(l_quantity AS DECIMAL(18,2))
      |           * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS sxx,
      |    sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |           * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS syy
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |    / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |     * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 9)
      |    AS corr_qty_price
      |FROM m ORDER BY l_returnflag""".stripMargin

  /** Fixed-width histogram via integer bucket arithmetic. */
  private def histogram(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "lineitem")
      .select(floor(col("l_extendedprice") / 10000.0).cast("int").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("bucket"))
  }

  private val histogramSql =
    """SELECT CAST(floor(l_extendedprice / 10000.0) AS INT) AS bucket,
      |  count(*) AS n
      |FROM lineitem GROUP BY 1 ORDER BY bucket""".stripMargin

  /** Ordered string aggregation (listagg): suppliers per nation,
    * sorted then joined — deterministic on both engines.
    */
  private def listAgg(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "supplier")
      .join(broadcast(Tables(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(array_join(array_sort(collect_list(col("s_name"))), ",")
        .as("suppliers"),
        count(lit(1)).as("n_suppliers"))
      .orderBy(col("n_name"))
  }

  private val listAggSql =
    """SELECT n_name,
      |  string_agg(s_name, ',' ORDER BY s_name) AS suppliers,
      |  count(*) AS n_suppliers
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** RANGE-frame window over event time: per-user rolling 24-hour
    * event count and value sum — the time-based frame (all rows whose
    * timestamp falls in [t - 24h, t], however many there are), which
    * ROWS frames (q07) cannot express. Ordering is integer epoch
    * micros so the frame bound arithmetic is exact on both engines.
    */
  private def rangeFrameWindow(s: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-dayUs, 0)
    Tables(s, dir, "events")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        col("value"))
      .withColumn("n_24h", count(lit(1)).over(w))
      .withColumn("sum_24h",
        sum(col("value").cast(DecimalType(18, 6))).over(w).cast("double"))
      .filter(col("user_id") < 20)
      .select(col("event_id"), col("user_id"), col("n_24h"), col("sum_24h"))
      .orderBy(col("event_id"))
  }

  private val rangeFrameWindowSql =
    """SELECT event_id, user_id,
      |  count(*) OVER w AS n_24h,
      |  CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_24h
      |FROM (SELECT event_id, user_id, epoch_us(ts) AS us, value
      |      FROM events)
      |WINDOW w AS (PARTITION BY user_id ORDER BY us
      |  RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
      |QUALIFY user_id < 20
      |ORDER BY event_id""".stripMargin

  /** Approximate-percentile sketch with a deterministic tolerance
    * verdict, the same contract as the HLL query: the sketch value
    * itself is engine-specific, so the hashed output is the exact
    * median plus a boolean asserting the sketch landed within rank
    * tolerance — green only while the sketch keeps its accuracy
    * contract. At 100 TB the sketch is the only viable plan (bounded
    * memory, one pass, no full sort).
    */
  private def percentileSketch(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_extendedprice, 0.5)").as("exact_p50"),
        expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("approx_p50"),
        expr("percentile(l_extendedprice, 0.45)").as("lo_band"),
        expr("percentile(l_extendedprice, 0.55)").as("hi_band"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"), col("exact_p50"), col("n"),
        (col("approx_p50") >= col("lo_band") &&
          col("approx_p50") <= col("hi_band")).as("within_tolerance"))
      .orderBy(col("l_returnflag"))
  }

  private val percentileSketchSql =
    """SELECT l_returnflag,
      |  quantile_cont(l_extendedprice, 0.5) AS exact_p50,
      |  count(*) AS n,
      |  TRUE AS within_tolerance
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Bloom-filter semi-join: build a bloom filter over the hot-order
    * keys (the small side), embed it as a binary literal, and prefilter
    * the fact table BEFORE its shuffle; the exact semi-join then only
    * sees rows the bloom admitted. False positives are removed by the
    * exact join, so the result is exact — the bloom only cuts shuffle
    * volume (here ~98% of lineitem rows never cross the wire). This is
    * the explicit form of the runtime-filter pushdown pattern; at
    * corpus scale the filter is sized to the dim-side cardinality and
    * stays broadcastable long after the dim rows themselves are not.
    *
    * Build and probe both use Spark's native runtime-filter
    * expressions (`BloomFilterAggregate` / `BloomFilterMightContain`,
    * the pair `InjectRuntimeFilter` plants) rather than a Scala UDF,
    * so the probe stays inside whole-stage codegen and doesn't fence
    * off pushdown around it.
    */
  private def bloomSemiJoin(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.types.BinaryType

    val hot = Tables(s, dir, "orders")
      .filter(col("o_totalprice") > 250000.0)
      .select(col("o_orderkey"))
    // n=100k keys at ~1% fpp -> m = -n ln(p)/ln(2)^2 ~ 958k bits (~117 KB)
    val bfAgg = new BloomFilterAggregate(
      ColumnBridge.expression(col("o_orderkey").cast("long")),
      Literal(100000L), Literal(958506L)).toAggregateExpression()
    val bfBytes = hot
      .select(ColumnBridge.column(bfAgg).as("bf"))
      .head().getAs[Array[Byte]](0)
    val mightContain = ColumnBridge.column(BloomFilterMightContain(
      Literal(bfBytes, BinaryType),
      ColumnBridge.expression(col("l_orderkey").cast("long"))))
    Tables(s, dir, "lineitem")
      .filter(mightContain)
      .join(hot, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(DecimalType(18, 2)))
          .cast("double").as("qty"))
      .orderBy(col("l_returnflag"))
  }

  private val bloomSemiJoinSql =
    """SELECT l_returnflag, count(*) AS n,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      |FROM lineitem
      |WHERE l_orderkey IN (
      |  SELECT o_orderkey FROM orders WHERE o_totalprice > 250000.0)
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** UNPIVOT / melt — the inverse of q15's pivot: three measure
    * columns become (measure, val) rows via the Dataset.unpivot API
    * (Spark's native Expand, one pass, no join or union-of-selects).
    */
  private def unpivotMeasures(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
      .filter(col("l_orderkey") < 100)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("double").as("quantity"),
        col("l_extendedprice").cast("double").as("extendedprice"),
        col("l_discount").cast("double").as("discount"))
    li.unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("quantity"), col("extendedprice"), col("discount")),
        "measure", "val")
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("measure"))
  }

  private val unpivotMeasuresSql =
    """SELECT l_orderkey, l_linenumber, measure, val
      |FROM (
      |  UNPIVOT (SELECT l_orderkey, l_linenumber,
      |      CAST(l_quantity AS DOUBLE) AS quantity,
      |      CAST(l_extendedprice AS DOUBLE) AS extendedprice,
      |      CAST(l_discount AS DOUBLE) AS discount
      |    FROM lineitem WHERE l_orderkey < 100)
      |  ON quantity, extendedprice, discount
      |  INTO NAME measure VALUE val)
      |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q34_unpivot", unpivotMeasures, Some(unpivotMeasuresSql)),
    QueryDef("q33_bloom_semi_join", bloomSemiJoin, Some(bloomSemiJoinSql)),
    QueryDef("q31_range_frame_window", rangeFrameWindow,
      Some(rangeFrameWindowSql)),
    QueryDef("q32_percentile_sketch", percentileSketch,
      Some(percentileSketchSql)),
    QueryDef("q29_listagg", listAgg, Some(listAggSql)),
    QueryDef("q27_exact_correlation", correlation, Some(correlationSql)),
    QueryDef("q28_histogram", histogram, Some(histogramSql)),
    QueryDef("q25_window_battery", windowBattery, Some(windowBatterySql)),
    QueryDef("q26_cube", cube2d, Some(cube2dSql)),
    QueryDef("q24_asof_custom_operator", asofCustom, Some(asofCustomSql)),
    QueryDef("q20_range_join", rangeJoin, Some(rangeJoinSql)),
    QueryDef("q30_interval_custom_operator", intervalCustom, Some(rangeJoinSql)),
    QueryDef("q21_topk_aggregate", topkAggregate, Some(topkAggregateSql)),
    QueryDef("q22_word_topk_salted", wordTopkSalted, Some(wordTopkSaltedSql)),
    QueryDef("q23_percentiles", percentiles, Some(percentilesSql)),
    QueryDef("q35_salted_skew_join", saltedSkewJoin, Some(saltedSkewJoinSql)),
    QueryDef("q36_window_ignore_nulls", windowIgnoreNulls,
      Some(windowIgnoreNullsSql)),
    QueryDef("q37_grouping_sets_id", groupingSetsId,
      Some(groupingSetsIdSql)))
}
