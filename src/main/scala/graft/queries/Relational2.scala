package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Second relational batch: as-of join, pivot, correlated-subquery
  * semantics, date parts, string functions, null handling.
  */
object Relational2 {

  /** AS-OF join — for every event, the most recent order of the same
    * customer at or before the event time. Spark lacks the operator;
    * rather than an O(n²) range join, this is the scalable merge
    * construction: tag both sides, union, and carry the latest order
    * forward with a window over (key, time) — one shuffle, sorted
    * within partitions, no row explosion. The oracle is DuckDB's
    * native ASOF JOIN, so the construction is checked against a real
    * implementation of the operator.
    *
    * Orders are deduped to one per (custkey, orderdate) first —
    * without that, "most recent" is ambiguous under timestamp ties
    * and no two engines need agree.
    */
  private def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables(s, dir, "orders")
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    val events = Tables(s, dir, "events").filter(col("event_type") === "purchase")

    val oTagged = orders.select(
      col("o_custkey").as("key"), col("o_orderdate").as("t"),
      lit(0).as("is_event"), lit(null).cast("long").as("event_id"),
      col("o_orderkey"))
    val eTagged = events.select(
      (col("user_id") + 1).as("key"), col("ts").as("t"),
      lit(1).as("is_event"), col("event_id"),
      lit(null).cast("long").as("o_orderkey"))

    // order rows sort before a same-instant event (ASOF is >=)
    val w = Window.partitionBy(col("key"))
      .orderBy(col("t"), col("is_event"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    oTagged.unionByName(eTagged)
      .withColumn("matched_orderkey",
        last(col("o_orderkey"), ignoreNulls = true).over(w))
      .filter(col("is_event") === 1 && col("matched_orderkey").isNotNull)
      .select(col("event_id"), col("key").as("custkey"),
        col("matched_orderkey"))
      .orderBy(col("event_id"))
  }

  private val asofJoinSql =
    """WITH o AS (
      |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
      |  FROM orders GROUP BY 1, 2)
      |SELECT e.event_id, e.user_id + 1 AS custkey,
      |  o.o_orderkey AS matched_orderkey
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') e
      |  ASOF JOIN o
      |  ON e.user_id + 1 = o.o_custkey AND e.ts >= o.o_orderdate
      |ORDER BY event_id""".stripMargin

  /** Pivot: order counts per month x status (fixed pivot values). */
  private def pivotStatus(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("F", "O", "P"))
      .select(col("month"), col("F").as("n_f"), col("O").as("n_o"),
        col("P").as("n_p"))
      .orderBy(col("month"))
  }

  private val pivotStatusSql =
    """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
      |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
      |  count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
      |  count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
      |FROM orders GROUP BY 1 ORDER BY month""".stripMargin

  /** Correlated-subquery semantics (customers above their nation's
    * average balance), decorrelated into a join against the grouped
    * aggregate — the plan Catalyst produces for the subquery form, and
    * the only shape that scales. The comparison multiplies through by
    * the count to stay in exact decimal arithmetic.
    */
  private def aboveNationAvg(s: SparkSession, dir: String): DataFrame = {
    val c = Tables(s, dir, "customer")
    val nationStats = c.groupBy(col("c_nationkey").as("nk"))
      .agg(sum(col("c_acctbal").cast(DecimalType(18, 2))).as("bal_sum"),
        count(lit(1)).as("bal_n"))
    c.join(broadcast(nationStats), col("c_nationkey") === col("nk"))
      .filter(col("c_acctbal").cast(DecimalType(18, 2)) * col("bal_n") >
        col("bal_sum"))
      .select(col("c_custkey"), col("c_nationkey"),
        col("c_acctbal").cast(DecimalType(18, 2)).cast("double").as("acctbal"))
      .orderBy(col("c_custkey"))
  }

  private val aboveNationAvgSql =
    """WITH ns AS (
      |  SELECT c_nationkey AS nk,
      |    sum(CAST(c_acctbal AS DECIMAL(18,2))) AS bal_sum,
      |    count(*) AS bal_n
      |  FROM customer GROUP BY 1)
      |SELECT c_custkey, c_nationkey,
      |  CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
      |FROM customer JOIN ns ON c_nationkey = nk
      |WHERE CAST(c_acctbal AS DECIMAL(18,2)) * bal_n > bal_sum
      |ORDER BY c_custkey""".stripMargin

  /** Date-part extraction and arithmetic. */
  private def dateParts(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "orders")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        hour(col("o_orderdate")).as("h"),
        datediff(lit("1998-12-31").cast("date"),
          col("o_orderdate").cast("date")).as("days_to_end"))
      .filter(col("o_orderkey") <= 2000)
      .orderBy(col("o_orderkey"))
  }

  private val datePartsSql =
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS INT) AS y,
      |  CAST(month(o_orderdate) AS INT) AS m,
      |  CAST(day(o_orderdate) AS INT) AS d,
      |  CAST(hour(o_orderdate) AS INT) AS h,
      |  date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31')
      |    AS days_to_end
      |FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey""".stripMargin

  /** String function battery over part names. */
  private def stringFns(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "part")
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("up"),
        length(col("p_name")).as("len"),
        substring(col("p_name"), 1, 5).as("prefix"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("padded"),
        regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
        col("p_name").contains("red").as("has_red"))
      .orderBy(col("p_partkey"))
  }

  private val stringFnsSql =
    """SELECT p_partkey,
      |  upper(p_name) AS up,
      |  length(p_name) AS len,
      |  substring(p_name, 1, 5) AS prefix,
      |  concat_ws('-', p_brand, p_type) AS brand_type,
      |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded,
      |  coalesce(regexp_extract(p_name, '([a-z]+)$', 1), '') AS last_word,
      |  contains(p_name, 'red') AS has_red
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Null handling: nullif/coalesce/null-aware aggregation. */
  private def nullHandling(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "orders")
      .withColumn("maybe_price",
        when(col("o_orderstatus") === "P", lit(null).cast(DecimalType(18, 2)))
          .otherwise(col("o_totalprice").cast(DecimalType(18, 2))))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(col("maybe_price")).as("n_nonnull"),
        count(lit(1)).as("n_all"),
        sum(coalesce(col("maybe_price"), lit(0).cast(DecimalType(18, 2))))
          .cast("double").as("sum_coalesced"),
        max(col("maybe_price")).cast("double").as("max_price"))
      .orderBy(col("o_orderpriority"))
  }

  private val nullHandlingSql =
    """WITH t AS (
      |  SELECT o_orderpriority,
      |    CASE WHEN o_orderstatus = 'P' THEN NULL
      |         ELSE CAST(o_totalprice AS DECIMAL(18,2)) END AS maybe_price
      |  FROM orders)
      |SELECT o_orderpriority,
      |  count(maybe_price) AS n_nonnull,
      |  count(*) AS n_all,
      |  CAST(sum(coalesce(maybe_price, 0)) AS DOUBLE) AS sum_coalesced,
      |  CAST(max(maybe_price) AS DOUBLE) AS max_price
      |FROM t GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q14_asof_join", asofJoin, Some(asofJoinSql)),
    QueryDef("q15_pivot_status", pivotStatus, Some(pivotStatusSql)),
    QueryDef("q16_above_nation_avg", aboveNationAvg, Some(aboveNationAvgSql)),
    QueryDef("q17_date_parts", dateParts, Some(datePartsSql)),
    QueryDef("q18_string_fns", stringFns, Some(stringFnsSql)),
    QueryDef("q19_null_handling", nullHandling, Some(nullHandlingSql)))
}
