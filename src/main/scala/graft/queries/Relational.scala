package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Core relational operators over the TPC-H-ish fixture tables: scan,
  * filter, project, aggregate, joins (inner/semi/anti/broadcast),
  * windows, rollup, set ops, sort/limit/top-k, conditional aggregation.
  *
  * The reference (bitalizer/db-migrator) contains none of these — its
  * only "query" is `SELECT *` + `COUNT(*)` (see SURVEY.md §2.7); in a
  * Spark engine they come from Catalyst, and this module pins their
  * semantics against the DuckDB oracle.
  *
  * Scale notes (100 TB): every query here is a declarative DataFrame
  * plan — filters/projections push into the parquet scan, aggregations
  * get map-side partial combine, small dimension tables (region,
  * nation, supplier, part at fixture scale) are broadcast explicitly so
  * the fact-table join never shuffles the big side.
  */
object Relational {

  private def dec2(c: String) = col(c).cast(DecimalType(18, 2))

  /** Decimal accumulation stays *inside* the aggregate (exact,
    * order-independent across partitions); the final output column is
    * cast to DOUBLE so the declared type is identical cross-engine
    * (DuckDB sums to DECIMAL(38,s)/HUGEINT, Spark to DECIMAL(28,s)/
    * BIGINT — same values, different declared types, which the
    * driver's hash gate treats as a mismatch).
    */
  private def dbl(c: org.apache.spark.sql.Column) = c.cast("double")

  /** TPC-H Q1-style pricing summary. Decimal casts make the sums exact
    * and order-independent (double sum would be non-deterministic at
    * scale: FP addition is not associative across partitions).
    */
  private def q01(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dbl(sum(dec2("l_quantity"))).as("sum_qty"),
        dbl(sum(dec2("l_extendedprice"))).as("sum_base_price"),
        dbl(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(18, 6)))).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Fact-to-dim join + top-k by revenue. `part` is dimension-SHAPED
    * but SF-scaling (TPC-H grows it linearly), so no forced broadcast
    * hint — AQE broadcasts it at runtime while it fits (it does at
    * every fixture SF, so lineitem never moves here) and falls back to
    * a key-partitioned join when a 100 TB part side wouldn't fit.
    */
  private def q02(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    val part = Tables(s, dir, "part")
    li.join(part, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        dbl(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(18, 6)))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("p_brand"))
      .limit(10)
  }

  private val q02Sql =
    """SELECT p_brand,
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand
      |ORDER BY revenue DESC, p_brand
      |LIMIT 10""".stripMargin

  /** 4-way star join rolled up to region. nation/region are truly
    * bounded (25/5 rows) → hinted broadcast; customer SCALES with SF
    * in TPC-H, so its join is left to AQE (broadcast while it fits,
    * custkey-partitioned join beyond — orders, the fact side, stays in
    * place either way at fixture SFs).
    */
  private def q03(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders")
    val c = Tables(s, dir, "customer")
    val n = Tables(s, dir, "nation")
    val r = Tables(s, dir, "region")
    o.join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        count(lit(1)).as("n_orders"),
        dbl(sum(dec2("o_totalprice"))).as("total_price"))
      .orderBy(col("r_name"))
  }

  private val q03Sql =
    """SELECT r_name, count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  /** EXISTS as left-semi join (no row multiplication, no distinct). */
  private def q04(s: SparkSession, dir: String): DataFrame = {
    val c = Tables(s, dir, "customer")
    val o = Tables(s, dir, "orders").filter(col("o_orderstatus") === "F")
    c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  private val q04Sql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
      |ORDER BY c_custkey""".stripMargin

  /** NOT EXISTS as left-anti join. */
  private def q05(s: SparkSession, dir: String): DataFrame = {
    val c = Tables(s, dir, "customer")
    val o = Tables(s, dir, "orders").filter(col("o_totalprice") > 250000.0)
    c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  private val q05Sql =
    """SELECT c_custkey, c_name FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000.0)
      |ORDER BY c_custkey""".stripMargin

  /** Top-3 orders per customer — row_number window with a full
    * deterministic sort key (price desc, then orderkey for ties).
    */
  private def q06(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"),
        dbl(dec2("o_totalprice")).as("price"), col("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  private val q06Sql =
    """SELECT o_custkey, o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price, rn
      |FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders)
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  /** Running total per customer — window sum over decimals (exact;
    * window frames over raw doubles would be engine-dependent).
    */
  private def q07(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(s, dir, "orders")
      .withColumn("running_total", dbl(sum(dec2("o_totalprice")).over(w)))
      .select(col("o_custkey"), col("o_orderkey"), col("running_total"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  private val q07Sql =
    """SELECT o_custkey, o_orderkey,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
      |FROM orders
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Exact distinct counts (the approximate HLL variant is a separate
    * non-oracle query — see TextAnalysis/Dedup modules).
    */
  private def q08(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))
  }

  private val q08Sql =
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
      |  count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** ROLLUP (grouping sets) with exact decimal sums. */
  private def q09(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dbl(sum(dec2("l_quantity"))).as("qty"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)
  }

  private val q09Sql =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** Set operations: orderkeys present in both branches (INTERSECT). */
  private def q10(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders")
    val a = o.filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
    val b = o.filter(col("o_totalprice") > 150000.0).select(col("o_orderkey"))
    a.intersect(b).orderBy(col("o_orderkey"))
  }

  private val q10Sql =
    """SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
      |INTERSECT
      |SELECT o_orderkey FROM orders WHERE o_totalprice > 150000.0
      |ORDER BY o_orderkey""".stripMargin

  /** Set operations: EXCEPT branch. */
  private def q11(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders")
    val a = o.filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
    val b = o.filter(col("o_totalprice") > 150000.0).select(col("o_orderkey"))
    a.except(b).orderBy(col("o_orderkey"))
  }

  private val q11Sql =
    """SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
      |EXCEPT
      |SELECT o_orderkey FROM orders WHERE o_totalprice > 150000.0
      |ORDER BY o_orderkey""".stripMargin

  /** Time-bucketed aggregation (month) — date_trunc on both engines. */
  private def q12(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
      .agg(count(lit(1)).as("n_orders"),
        dbl(sum(dec2("o_totalprice"))).as("total"))
      .orderBy(col("month"))
  }

  private val q12Sql =
    """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
      |  count(*) AS n_orders, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY 1 ORDER BY month""".stripMargin

  /** Conditional aggregation (CASE WHEN inside agg) + HAVING. */
  private def q13(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_f"),
        sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("n_o"),
        count(lit(1)).as("n"))
      .filter(col("n") > 10)
      .orderBy(col("o_orderpriority"))
  }

  private val q13Sql =
    """SELECT o_orderpriority,
      |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
      |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
      |  count(*) AS n
      |FROM orders GROUP BY o_orderpriority HAVING count(*) > 10
      |ORDER BY o_orderpriority""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q01_pricing_summary", q01, Some(q01Sql)),
    QueryDef("q02_top_brands_by_revenue", q02, Some(q02Sql)),
    QueryDef("q03_region_order_rollup", q03, Some(q03Sql)),
    QueryDef("q04_semi_join_exists", q04, Some(q04Sql)),
    QueryDef("q05_anti_join_not_exists", q05, Some(q05Sql)),
    QueryDef("q06_window_topn_per_customer", q06, Some(q06Sql)),
    QueryDef("q07_window_running_total", q07, Some(q07Sql)),
    QueryDef("q08_distinct_counts", q08, Some(q08Sql)),
    QueryDef("q09_rollup_grouping_sets", q09, Some(q09Sql)),
    QueryDef("q10_set_intersect", q10, Some(q10Sql)),
    QueryDef("q11_set_except", q11, Some(q11Sql)),
    QueryDef("q12_monthly_orders", q12, Some(q12Sql)),
    QueryDef("q13_conditional_agg_having", q13, Some(q13Sql)))
}
