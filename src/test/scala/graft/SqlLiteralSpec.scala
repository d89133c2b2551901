package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{AnsiFlavor, SqlDdl, SqlLiteral}
import graft.types._

/** Literal rendering parity (/root/reference/src/extract/format.rs:220-446)
  * and DDL text assertions (insert/query.rs:137-338).
  */
class SqlLiteralSpec extends AnyFunSuite {

  test("null renders NULL for every shape") {
    assert(SqlLiteral.render(null) == "NULL")
    assert(SqlLiteral.render(None) == "NULL")
  }

  test("bit renders 0/1; numbers plain; float unquoted (format.rs:395-413)") {
    assert(SqlLiteral.render(true) == "1")
    assert(SqlLiteral.render(false) == "0")
    assert(SqlLiteral.render(42) == "42")
    assert(SqlLiteral.render(-7L) == "-7")
    assert(SqlLiteral.render(1.5) == "1.5")
  }

  test("strings quoted with doubled quotes (format.rs:57-61)") {
    assert(SqlLiteral.render("O'Brien") == "'O''Brien'")
    assert(SqlLiteral.render("plain") == "'plain'")
  }

  test("binary renders unquoted lowercase hex (format.rs:352-362)") {
    assert(SqlLiteral.render(Array(0xff.toByte, 0xab.toByte)) == "0xffab")
  }

  test("decimal quoted, scale preserved (format_numeric_value :42-55)") {
    assert(SqlLiteral.render(new java.math.BigDecimal("123.45")) == "'123.45'")
    assert(SqlLiteral.render(new java.math.BigDecimal("123.40")) == "'123.40'")
  }

  test("timestamps quoted, fraction trimmed to 3/6/9 like chrono %.f") {
    assert(SqlLiteral.render(Timestamp.valueOf("2024-01-02 03:04:05")) ==
      "'2024-01-02 03:04:05'")
    assert(SqlLiteral.render(Timestamp.valueOf("2024-01-02 03:04:05.123")) ==
      "'2024-01-02 03:04:05.123'")
    assert(SqlLiteral.render(Timestamp.valueOf("2024-01-02 03:04:05.123456")) ==
      "'2024-01-02 03:04:05.123456'")
    assert(SqlLiteral.render(java.time.LocalDateTime.parse("2024-01-02T03:04:05.5")) ==
      "'2024-01-02 03:04:05.500'")
  }

  test("value tuple keeps reference shape '(v1, v2) '") {
    assert(SqlLiteral.valueTuple(Seq(1, "a")) == "(1, 'a') ")
  }

  test("insert statement and create table DDL text (query.rs:137-338)") {
    val cols = Seq(
      TargetColumn("id", MySqlType(MySqlBaseType.Int), isNullable = false,
        Some(Constraint.PrimaryKey)),
      TargetColumn("name", MySqlType(MySqlBaseType.Varchar, length = Some(50)),
        isNullable = true, None))
    assert(SqlDdl.insertStatement("Users", cols) ==
      "INSERT INTO `Users` (`id`, `name`) VALUES")
    assert(SqlDdl.createTable("Users", cols) ==
      "CREATE TABLE `Users` (`id` int PRIMARY KEY NOT NULL, `name` varchar(50) NULL)")
    assert(SqlDdl.resetQuery(Seq("a", "b"), SqlDdl.Truncate) ==
      "TRUNCATE TABLE `a`;\nTRUNCATE TABLE `b`;")
  }

  test("composite primary keys render as one table-level clause") {
    val cols = Seq(
      TargetColumn("order_id", MySqlType(MySqlBaseType.Int),
        isNullable = false, Some(Constraint.PrimaryKey)),
      TargetColumn("product_id", MySqlType(MySqlBaseType.Int),
        isNullable = false, Some(Constraint.PrimaryKey)),
      TargetColumn("qty", MySqlType(MySqlBaseType.Int),
        isNullable = true, None))
    // inline 'PRIMARY KEY' twice would be invalid DDL on every target
    assert(SqlDdl.createTable("OrderItems", cols) ==
      "CREATE TABLE `OrderItems` (`order_id` int NOT NULL, " +
        "`product_id` int NOT NULL, `qty` int NULL, " +
        "PRIMARY KEY (`order_id`, `product_id`))")
  }

  test("timestamp literals keep the source wall-clock under any JVM zone") {
    val prev = java.util.TimeZone.getDefault
    try {
      // the JDBC driver materializes '2020-06-01 12:00:00' using the
      // JVM default zone; rendering must invert with the SAME zone
      java.util.TimeZone.setDefault(
        java.util.TimeZone.getTimeZone("America/New_York"))
      val t = java.sql.Timestamp.valueOf("2020-06-01 12:00:00")
      assert(SqlLiteral.render(t) == "'2020-06-01 12:00:00'")
    } finally java.util.TimeZone.setDefault(prev)
  }

  test("constraint DDL: FK cascade text + skip list (query.rs:242-256)") {
    val cols = Seq(
      TargetColumn("org_id", MySqlType(MySqlBaseType.Int), isNullable = true,
        Some(Constraint.ForeignKey("Orgs", "id"))),
      TargetColumn("ghost_id", MySqlType(MySqlBaseType.Int), isNullable = true,
        Some(Constraint.ForeignKey("Ghost", "id"))),
      TargetColumn("code", MySqlType(MySqlBaseType.Int), isNullable = true,
        Some(Constraint.Unique)))
    val (sql, skipped) = SqlDdl.createConstraints("T", cols, Seq("Orgs", "T"))
    assert(sql.contains(
      "SET FOREIGN_KEY_CHECKS=0; ALTER TABLE `T` " +
        "ADD FOREIGN KEY(`org_id`) REFERENCES `Orgs`(`id`) ON DELETE CASCADE; " +
        "ALTER TABLE `T` ADD UNIQUE(`code`)"))
    assert(skipped == Seq("ghost_id -> Ghost.id"))
  }

  test("constraint DDL: one statement per clause, executable CHECK/DEFAULT") {
    val cols = Seq(
      TargetColumn("grade", MySqlType(MySqlBaseType.Int), isNullable = true,
        Some(Constraint.Check("\"grade\" BETWEEN 0 AND 5"))),
      TargetColumn("state", MySqlType(MySqlBaseType.Varchar, Some(10)),
        isNullable = true, Some(Constraint.Default("'new text'"))))
    val (sql, _) = SqlDdl.createConstraints("T", cols, Seq("T"))
    val stmts = sql.get.split("; ").toSeq
    // CHECK clause identifiers requoted to the MySQL dialect; DEFAULT
    // rendered as a column alteration, not the reference's bare
    // (inexecutable) ADD DEFAULT
    assert(stmts.contains("ALTER TABLE `T` ADD CHECK (`grade` BETWEEN 0 AND 5)"))
    assert(stmts.contains(
      "ALTER TABLE `T` ALTER COLUMN `state` SET DEFAULT 'new text'"))
    // ANSI translation must not corrupt the literal ('text' is a MySQL
    // type token, but only OUTSIDE literal spans)
    val ansi = stmts.map(AnsiFlavor.translate)
    assert(ansi.contains(
      "ALTER TABLE \"T\" ALTER COLUMN \"state\" SET DEFAULT 'new text'"))
  }

  test("statement split honors quoting: `;` inside literals stays data") {
    // a probed CHECK / DEFAULT literal may legitimately carry ';' —
    // a raw split(';') would cut the statement and execute garbage
    assert(SqlDdl.splitStatements(
      "ALTER TABLE `T` ALTER COLUMN `s` SET DEFAULT 'a;b''c;d'; " +
        "ALTER TABLE `T` ADD CHECK (`s` <> ';')") == Seq(
      "ALTER TABLE `T` ALTER COLUMN `s` SET DEFAULT 'a;b''c;d'",
      "ALTER TABLE `T` ADD CHECK (`s` <> ';')"))
    // quoted identifiers of every dialect shield ';' too
    assert(SqlDdl.splitStatements(
      """ALTER TABLE "a;b" ADD CHECK (1=1); DROP TABLE [c;]]d]; SELECT 1""")
      == Seq("""ALTER TABLE "a;b" ADD CHECK (1=1)""",
        "DROP TABLE [c;]]d]", "SELECT 1"))
    // trailing / empty segments vanish
    assert(SqlDdl.splitStatements("; SELECT 1 ; ;") == Seq("SELECT 1"))
  }
}
