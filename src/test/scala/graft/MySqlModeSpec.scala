package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{MySqlDialect, MySqlModeEngine}

/** The MySQL-dialect engine shim: translator correctness, the strict
  * validation that makes the live gate meaningful (malformed MySQL
  * must FAIL, not pass through), and flavor-specific DDL/DML executed
  * against the live engine with data read back.
  */
class MySqlModeSpec extends AnyFunSuite {

  // ---- dialect translation --------------------------------------------

  test("backtick identifiers become ANSI double quotes, literals untouched") {
    val got = MySqlDialect.translate(
      "INSERT INTO `t` (`a`, `b`) VALUES (1, 'x `not an ident` y')")
    assert(got ===
      """INSERT INTO "t" ("a", "b") VALUES (1, 'x `not an ident` y')""")
  }

  test("MySQL backslash escapes re-emit as ANSI ('' doubling only)") {
    // renderer emits \\ for a data backslash and '' for a quote
    val got = MySqlDialect.translate("""INSERT INTO `t` VALUES ('a\\b''c')""")
    assert(got === """INSERT INTO "t" VALUES ('a\b''c')""")
    // \' is also legal MySQL for a quote
    val got2 = MySqlDialect.translate("""INSERT INTO `t` VALUES ('d\'e')""")
    assert(got2 === """INSERT INTO "t" VALUES ('d''e')""")
  }

  test("type-defining DDL maps MySQL types; other statements do not") {
    val ddl = MySqlDialect.translate(
      "CREATE TABLE `t` (`c` text NULL, `d` datetime, `n` bigint unsigned)")
    assert(ddl.contains("CLOB") && ddl.contains("TIMESTAMP") &&
      ddl.contains("BIGINT"), ddl)
    assert(!ddl.contains("`"))
    // a SELECT mentioning 'text' in a literal must keep it verbatim
    val sel = MySqlDialect.translate("SELECT * FROM `t` WHERE `c` = 'text'")
    assert(sel === """SELECT * FROM "t" WHERE "c" = 'text'""")
  }

  test("strictness: malformed MySQL fails loudly instead of passing through") {
    val bads = Seq(
      "SELECT * FROM `unterminated",          // unbalanced backtick
      "SELECT * FROM \"ansi_ident\"",          // ANSI_QUOTES dialect leak
      "SELECT 'unterminated literal",          // unbalanced quote
      "SELECT 'bad \\q escape'",               // unknown escape
      "SELECT @@version",                      // unknown session variable
      "SELECT * FROM ``")                      // empty identifier
    for (b <- bads)
      intercept[IllegalArgumentException](MySqlDialect.route(b))
  }

  test("FK toggles and the packet probe route to emulation, not Derby") {
    assert(MySqlDialect.route("SET FOREIGN_KEY_CHECKS=0") ===
      MySqlDialect.FkToggle(false))
    assert(MySqlDialect.route(" set foreign_key_checks = 1 ") ===
      MySqlDialect.FkToggle(true))
    assert(MySqlDialect.route("SELECT @@max_allowed_packet") ===
      MySqlDialect.PacketProbe)
    // but a malformed toggle is NOT silently a toggle
    intercept[IllegalArgumentException](
      MySqlDialect.route("SET FOREIGN_KEY_CHECKS=2"))
  }

  // ---- live engine ----------------------------------------------------

  test("live MySQL-dialect session: DDL, inserts, FK toggle, probe, readback") {
    val url = MySqlModeEngine.url(
      s"memory:mymodespec_${System.nanoTime()};create=true")
    MySqlModeEngine.resetCounters()
    val c = java.sql.DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      st.execute("SET FOREIGN_KEY_CHECKS=0")
      st.execute(
        "CREATE TABLE `emp` (`id` bigint NOT NULL, `name` text NULL, " +
          "`hired` datetime NULL, PRIMARY KEY (`id`))")
      st.execute(
        """INSERT INTO `emp` (`id`, `name`, `hired`) VALUES """ +
          """(1, 'O''Brien \\ Co', '2024-02-29 12:30:00'), """ +
          """(2, 'plain', NULL)""")
      st.execute("SET FOREIGN_KEY_CHECKS=1")
      val rs = st.executeQuery("SELECT @@max_allowed_packet")
      assert(rs.next() && rs.getLong(1) === MySqlModeEngine.MaxPacket)
      rs.close()
      val cnt = st.executeQuery("SELECT COUNT(*) FROM `emp`")
      assert(cnt.next() && cnt.getLong(1) === 2L)
      cnt.close()
      // the escaped literal survived both dialects intact
      val nm = st.executeQuery("SELECT `name` FROM `emp` WHERE `id` = 1")
      assert(nm.next() && nm.getString(1) === "O'Brien \\ Co")
      nm.close()
      st.close()
      assert(MySqlModeEngine.fkOff.get() === 1L)
      assert(MySqlModeEngine.fkOn.get() === 1L)
      assert(MySqlModeEngine.packetProbes.get() === 1L)
    } finally {
      c.close()
      try java.sql.DriverManager.getConnection(
        url.replace("jdbc:graftmysql:", "jdbc:derby:")
          .replace(";create=true", ";drop=true"))
      catch { case _: java.sql.SQLException => () }
    }
  }

  test("quoted decimals coerce into DECIMAL columns; 0x literals land as binary") {
    val url = MySqlModeEngine.url(
      s"memory:mycoerce_${System.nanoTime()};create=true")
    val c = java.sql.DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      st.execute("CREATE TABLE `m` (`id` bigint NOT NULL, " +
        "`amt` decimal(19, 4) NULL, `tag` text NULL, " +
        "`blob` longblob NULL, PRIMARY KEY (`id`))")
      // the reference renders decimals QUOTED (format.rs:42-55) and
      // binary as 0xHEX (format.rs:17) — MySQL coerces both; the
      // strict shim must too. The numeric-looking STRING bound for
      // the text column must stay text (no blanket unquoting).
      st.execute("INSERT INTO `m` (`id`, `amt`, `tag`, `blob`) VALUES " +
        "(1, '12.3456', '99.9900', 0xdeadbeef), " +
        "(2, '-0.0001', 'keep 0xff text', NULL), " +
        "(3, NULL, NULL, 0x00)")
      val rs = st.executeQuery("SELECT `id`, `amt`, `tag`, `blob` FROM `m` " +
        "WHERE `id` = 1")
      assert(rs.next())
      assert(rs.getBigDecimal(2) == new java.math.BigDecimal("12.3456"))
      assert(rs.getString(3) == "99.9900") // text stayed text
      assert(rs.getBytes(4).toSeq ==
        Seq(0xde, 0xad, 0xbe, 0xef).map(_.toByte))
      rs.close()
      val rs2 = st.executeQuery("SELECT `amt`, `tag` FROM `m` WHERE `id` = 2")
      assert(rs2.next())
      assert(rs2.getBigDecimal(1) == new java.math.BigDecimal("-0.0001"))
      assert(rs2.getString(2) == "keep 0xff text")
      rs2.close()
      st.close()
    } finally {
      c.close()
      try java.sql.DriverManager.getConnection(
        url.replace("jdbc:graftmysql:", "jdbc:derby:")
          .replace(";create=true", ";drop=true"))
      catch { case _: java.sql.SQLException => () }
    }
  }

  test("live engine rejects malformed MySQL at execution time") {
    val url = MySqlModeEngine.url(
      s"memory:mymodebad_${System.nanoTime()};create=true")
    val c = java.sql.DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      intercept[IllegalArgumentException](
        st.execute("CREATE TABLE `broken (`id` bigint)"))
      intercept[IllegalArgumentException](
        st.execute("SELECT \"ansi\" FROM `t`"))
      st.close()
    } finally {
      c.close()
      try java.sql.DriverManager.getConnection(
        url.replace("jdbc:graftmysql:", "jdbc:derby:")
          .replace(";create=true", ";drop=true"))
      catch { case _: java.sql.SQLException => () }
    }
  }
}
