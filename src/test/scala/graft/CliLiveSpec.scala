package graft

import java.sql.DriverManager

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.config.{CliArgs, ConfigResolver}
import graft.engine.MySqlModeEngine
import graft.mapping.UserOverrides

/** The CLI wiring end-to-end against LIVE engines: args parse →
  * resolve (URL mode, main.rs:141-176 parity) → the same
  * `MigrateMain.execute` the binary runs — with the endpoint override
  * properties pointing at an embedded Derby source and the strict
  * MySQL-dialect shim target. Closes the last integration seam the
  * parse-only CliSpec and the fixture-mode pipeline left untested:
  * a resolved JdbcMode actually driving the JDBC source/writer pair.
  */
class CliLiveSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("URL-mode CLI run migrates source tables into the mysql shim") {
    val nonce = System.nanoTime()
    val srcRest = s"memory:clisrc_$nonce;create=true"
    val srcUrl = s"jdbc:derby:$srcRest"
    val dstRest = s"memory:clidst_$nonce;create=true"
    val dstUrl = MySqlModeEngine.url(dstRest)
    // the CLI-parsed credentials ride into the JDBC connections, and
    // a Derby username IS its default schema — seed and read back as
    // the same user the resolved config carries
    val c = DriverManager.getConnection(srcUrl, "u", "p")
    try {
      val st = c.createStatement()
      st.execute("CREATE TABLE \"widgets\" (\"id\" BIGINT NOT NULL " +
        "PRIMARY KEY, \"name\" VARCHAR(40), \"price\" DECIMAL(10,2))")
      st.execute("INSERT INTO \"widgets\" VALUES (1, 'bolt', 0.25), " +
        "(2, 'nut', 0.10), (3, 'gear', 12.50)")
      st.execute("CREATE TABLE \"crates\" (\"id\" BIGINT NOT NULL " +
        "PRIMARY KEY, \"label\" VARCHAR(20))")
      st.execute("INSERT INTO \"crates\" VALUES (10, 'north'), (11, 'south')")
      st.close()
    } finally c.close()

    val Right(parsed) = CliArgs.parse(Seq(
      "--source", "mssql://u:p@unreachable:1433/srcdb",
      "--target", "mysql://u:p@unreachable:3306/dstdb",
      "--tables", "widgets,crates", "-c", "-p", "2"))
    val Right(mode) = ConfigResolver.resolve(parsed, _ => None)
    sys.props("graft.source.jdbcUrl") = srcUrl
    sys.props("graft.target.jdbcUrl") = dstUrl
    MySqlModeEngine.resetCounters()
    try {
      val (results, migrator) = MigrateMain.execute(spark, parsed, mode,
        UserOverrides.empty,
        org.apache.logging.log4j.LogManager.getLogger("graft.test"))
      assert(results.map(r => r.tableName -> r.rowsMigrated).toMap ==
        Map("widgets" -> 3L, "crates" -> 2L))
      assert(migrator.warnings.isEmpty)
      // the MySQL wire actually fired: packet probe + FK toggle counts
      assert(MySqlModeEngine.packetProbes.get() >= 1)
      // read back THROUGH the strict dialect
      val c2 = DriverManager.getConnection(dstUrl, "u", "p")
      try {
        val st = c2.createStatement()
        val rs = st.executeQuery("SELECT COUNT(*) FROM `widgets`")
        assert(rs.next() && rs.getLong(1) == 3L)
        rs.close()
        val rs2 = st.executeQuery(
          "SELECT `price` FROM `widgets` WHERE `id` = 3")
        assert(rs2.next() &&
          rs2.getBigDecimal(1) == new java.math.BigDecimal("12.50"))
        rs2.close()
        st.close()
      } finally c2.close()
    } finally {
      sys.props -= "graft.source.jdbcUrl"
      sys.props -= "graft.target.jdbcUrl"
      for (u <- Seq(srcUrl, s"jdbc:derby:$dstRest"))
        try DriverManager.getConnection(
          u.replace(";create=true", ";drop=true"))
        catch { case _: java.sql.SQLException => () }
    }
  }
}
