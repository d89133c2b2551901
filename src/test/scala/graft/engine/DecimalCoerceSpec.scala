package graft.engine

import org.scalatest.funsuite.AnyFunSuite

/** The MySQL-shim decimal-coercion rewrite walk (MySqlModeEngine):
  * quoted literals at DECIMAL ordinals become explicit casts, and the
  * walk's ordinal/depth tracking must survive every quoting form that
  * can appear in the translated text.
  */
class DecimalCoerceSpec extends AnyFunSuite {

  private val dec = Map(0 -> (10, 2))

  test("quoted literal at a decimal ordinal is wrapped; others kept") {
    val in = """INSERT INTO "t" ("a","b") VALUES ('1.50', 'x'), ('2.25', 'y')"""
    val out = MySqlDecimalCoerce.rewrite(in, dec)
    assert(out ==
      """INSERT INTO "t" ("a","b") VALUES (CAST('1.50' AS DECIMAL(10,2)), 'x'), (CAST('2.25' AS DECIMAL(10,2)), 'y')""")
  }

  test("double-quoted identifier spans cannot corrupt the walk") {
    // an identifier containing a comma, paren, and apostrophe after
    // VALUES (hand-written SQL): the span must be copied through whole
    // — before the fix the apostrophe opened a phantom literal that
    // swallowed the rest of the tuple list
    val in =
      """INSERT INTO "t" ("a","b") VALUES ('1.50', "we,(')ird"), ('2.25', 'x')"""
    val out = MySqlDecimalCoerce.rewrite(in, dec)
    assert(out ==
      """INSERT INTO "t" ("a","b") VALUES (CAST('1.50' AS DECIMAL(10,2)), "we,(')ird"), (CAST('2.25' AS DECIMAL(10,2)), 'x')""")
  }

  test("literal content never matches ordinals or depth") {
    // commas/parens inside a string literal are data
    val in = """INSERT INTO "t" ("a","b") VALUES ('not, (a) tuple', '9.99')"""
    val out = MySqlDecimalCoerce.rewrite(in, dec)
    assert(out ==
      """INSERT INTO "t" ("a","b") VALUES (CAST('not, (a) tuple' AS DECIMAL(10,2)), '9.99')""")
  }
}
