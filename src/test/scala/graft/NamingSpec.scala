package graft

import graft.naming.{SnakeCase, SqlEscape}
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors /root/reference/src/common/helpers.rs:48-126 and sql.rs tests. */
class NamingSpec extends AnyFunSuite {

  /** Property check without the scalatestplus bridge (not on classpath). */
  private def forAll(gen: Gen[String])(check: String => Unit): Unit = {
    var s = org.scalacheck.rng.Seed(42L)
    for (_ <- 1 to 200) {
      check(gen.pureApply(Gen.Parameters.default, s))
      s = s.next
    }
  }

  val cases = Seq(
    "TableName" -> "table_name",
    "MyTableName" -> "my_table_name",
    "MyID" -> "my_id",
    "HTMLParser" -> "html_parser",
    "already_snake" -> "already_snake",
    "A" -> "a",
    "" -> "",
    "ABC" -> "abc",
    "lowercase" -> "lowercase",
    "Table1Name" -> "table1_name",
    "UserID" -> "user_id",
    "XMLHTTPRequest" -> "xmlhttp_request",
    "Users" -> "users",
    "my_Table" -> "my_table",
    "Column123" -> "column123")

  for ((in, expected) <- cases)
    test(s"snake_case: '$in' -> '$expected'") {
      assert(SnakeCase(in) == expected)
    }

  test("snake_case output never has uppercase") {
    forAll(Gen.alphaNumStr) { s => assert(!SnakeCase(s).exists(_.isUpper)) }
  }

  test("snake_case is idempotent") {
    forAll(Gen.alphaNumStr) { s => assert(SnakeCase(SnakeCase(s)) == SnakeCase(s)) }
  }

  test("mssql identifier escaping") {
    assert(SqlEscape.mssqlIdentifier("users") == "[users]")
    assert(SqlEscape.mssqlIdentifier("my]table") == "[my]]table]")
  }

  test("mysql identifier escaping") {
    assert(SqlEscape.mysqlIdentifier("users") == "`users`")
    assert(SqlEscape.mysqlIdentifier("my`table") == "`my``table`")
  }

  test("sql string escaping") {
    assert(SqlEscape.sqlString("O'Brien") == "O''Brien")
    assert(SqlEscape.sqlString("""a\b""") == """a\\b""")
  }
}
