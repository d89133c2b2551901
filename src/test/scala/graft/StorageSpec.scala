package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink coverage beyond the parquet fixtures: text formats,
  * partitioned layout with pruning, bucketed tables with shuffle-free
  * joins, and a real JDBC endpoint (embedded Derby, which ships with
  * Spark).
  */
class StorageSpec extends AnyFunSuite {

  lazy val tmp: String = Files.createTempDirectory("graft_storage").toString

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir", s"$tmp/warehouse")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def lineitem = Tables(spark, "/root/testdata/sf0.001", "lineitem")
    .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
      col("l_returnflag"))

  private def fingerprint(df: org.apache.spark.sql.DataFrame): Long =
    df.orderBy(df.columns.map(col): _*)
      .select(concat_ws("|", df.columns.map(c => col(c).cast("string")): _*))
      .collect().map(_.getString(0).hashCode.toLong).sum

  test("csv round-trip preserves values") {
    val src = lineitem
    src.write.mode("overwrite").option("header", "true").csv(s"$tmp/li_csv")
    val back = spark.read.option("header", "true")
      .schema(src.schema).csv(s"$tmp/li_csv")
    assert(fingerprint(back) == fingerprint(src))
  }

  test("json round-trip preserves values") {
    val src = lineitem
    src.write.mode("overwrite").json(s"$tmp/li_json")
    val back = spark.read.schema(src.schema).json(s"$tmp/li_json")
    assert(fingerprint(back) == fingerprint(src))
  }

  test("orc round-trip preserves values") {
    val src = lineitem
    src.write.mode("overwrite").orc(s"$tmp/li_orc")
    val back = spark.read.orc(s"$tmp/li_orc")
    assert(fingerprint(back) == fingerprint(src))
  }

  test("xml round-trip preserves values (built-in Spark 4 xml source)") {
    val src = lineitem
    src.write.mode("overwrite").option("rowTag", "row")
      .format("xml").save(s"$tmp/li_xml")
    val back = spark.read.option("rowTag", "row")
      .schema(src.schema).format("xml").load(s"$tmp/li_xml")
    assert(fingerprint(back) == fingerprint(src))
  }

  test("text source reads raw lines (one string column)") {
    val src = lineitem
    src.select(concat_ws(",", src.columns.map(c => col(c).cast("string")): _*)
        .as("value"))
      .write.mode("overwrite").text(s"$tmp/li_text")
    val back = spark.read.text(s"$tmp/li_text")
      .select(split(col("value"), ",").as("f"))
      .select(col("f").getItem(0).cast("long").as("l_orderkey"),
        col("f").getItem(1).cast("long").as("l_partkey"),
        col("f").getItem(2).cast(src.schema("l_quantity").dataType)
          .as("l_quantity"),
        col("f").getItem(3).as("l_returnflag"))
    assert(fingerprint(back) == fingerprint(src))
  }

  test("partitioned write prunes partitions at read") {
    lineitem.write.mode("overwrite")
      .partitionBy("l_returnflag").parquet(s"$tmp/li_part")
    val read = spark.read.parquet(s"$tmp/li_part")
      .filter(col("l_returnflag") === "R")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("l_returnflag"), plan.take(500))
    val expected = lineitem.filter(col("l_returnflag") === "R").count()
    assert(read.count() == expected)
  }

  test("bucketed tables join without a shuffle") {
    // an orphaned warehouse dir from a previous JVM (in-memory catalog,
    // on-disk location) makes saveAsTable fail with
    // LOCATION_ALREADY_EXISTS — clear both catalog and location
    val wh = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    for (t <- Seq("li_bucketed", "ord_bucketed")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$wh/$t"))
    }
    lineitem.write.mode("overwrite")
      .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    Tables(spark, "/root/testdata/sf0.001", "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .write.mode("overwrite")
      .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_bucketed")

    // force the sort-merge path (tiny fixtures would broadcast) so the
    // bucket layout is what eliminates the exchange
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      // co-bucketed join: no exchange on either side
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan.take(800))
      assert(joined.count() == lineitem.count())
    } finally
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("jdbc round-trip against embedded Derby") {
    val url = "jdbc:derby:memory:graftdb;create=true"
    val src = lineitem.limit(100)
    src.write.mode("overwrite")
      .jdbc(url, "LINEITEM_JDBC", new java.util.Properties)
    val back = spark.read.jdbc(url, "LINEITEM_JDBC", new java.util.Properties)
    assert(fingerprint(back.selectExpr(src.columns: _*)) == fingerprint(src))
    // predicate pushdown reaches the JDBC scan
    val filtered = spark.read.jdbc(url, "LINEITEM_JDBC", new java.util.Properties)
      .filter(col("l_quantity") > 25)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") || plan.contains("pushedFilters"),
      plan.take(500))
    assert(filtered.count() ==
      src.filter(col("l_quantity") > 25).count())
  }

  test("hive-partitioned write prunes unmatched partitions at the scan") {
    // the layout mig_partitioned_lake stages: partitionBy(event_type),
    // then a type filter must land in PartitionFilters (directory
    // pruning), not as a post-scan predicate over every partition
    val tmp = java.nio.file.Files.createTempDirectory("graft_prune").toString
    Tables(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("user_id"), col("value"),
        col("event_type"))
      .write.mode("overwrite").partitionBy("event_type").parquet(tmp)
    val filtered = spark.read.parquet(tmp)
      .filter(col("event_type") === "purchase")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("event_type"), plan.take(600))
    assert(filtered.count() ==
      Tables(spark, "/root/testdata/sf0.001", "events")
        .filter(col("event_type") === "purchase").count())
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }

  test("bucketed-join staging re-registers dropped catalog entries " +
    "from the staged path (the lost-session-catalog case)") {
    val dir = "/root/testdata/sf0.001"
    val before = graft.queries.Migration.stageBucketedJoin(spark, dir)
      .collect().map(_.mkString("|")).toSeq
    assert(before.nonEmpty)
    // simulate a fresh session whose in-memory catalog lost the
    // entries while the per-JVM filesystem memo still returns: drop
    // the catalog names out from under the memo
    val h = graft.StagedFixture.contentStamp(dir)
    spark.sql(s"DROP TABLE IF EXISTS graft_bkt_orders_$h")
    spark.sql(s"DROP TABLE IF EXISTS graft_bkt_customer_$h")
    assert(!spark.catalog.tableExists(s"graft_bkt_orders_$h"))
    // the staging must notice and re-register from the staged files
    // (same bucket spec — the join still collapses to the same rows)
    val after = graft.queries.Migration.stageBucketedJoin(spark, dir)
      .collect().map(_.mkString("|")).toSeq
    assert(after == before)
    assert(spark.catalog.tableExists(s"graft_bkt_orders_$h"))
  }

  test("StagedFixture.key changes when the fixture bytes change " +
    "(content stamp makes stale staging impossible)") {
    val fx = Files.createTempDirectory("graft_key_fixture")
    java.nio.file.Files.write(fx.resolve("part.parquet"),
      "v1".getBytes("UTF-8"))
    val k1 = graft.StagedFixture.key("t", fx.toString)
    // same bytes, same mtime -> stable key
    assert(graft.StagedFixture.key("t", fx.toString) == k1)
    // different bytes (size or mtime moves) -> different key
    java.nio.file.Files.write(fx.resolve("part.parquet"),
      "v2-longer".getBytes("UTF-8"))
    val k2 = graft.StagedFixture.key("t", fx.toString)
    assert(k2 != k1)
    // a staged dir built under k1 is simply never consulted for k2
    var builds = 0
    graft.StagedFixture.dir(k1, "graft_key_a") { _ => builds += 1 }
    graft.StagedFixture.dir(k1, "graft_key_a") { _ => builds += 1 }
    graft.StagedFixture.dir(k2, "graft_key_b") { _ => builds += 1 }
    assert(builds == 2) // k1 memoized; k2 forced a fresh build
    org.apache.commons.io.FileUtils.deleteQuietly(fx.toFile)
  }
}
