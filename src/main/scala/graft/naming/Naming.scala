package graft.naming

/** PascalCase/camelCase → snake_case with acronym handling, used for
  * table/column renaming when `--format` is on. Semantics match the
  * reference (/root/reference/src/common/helpers.rs:20-46): an
  * underscore is inserted before an uppercase letter when the previous
  * char is lowercase or a digit, or when the previous char is uppercase
  * and the NEXT char is lowercase (end of an acronym). So `MyID` →
  * `my_id`, `HTMLParser` → `html_parser`, `XMLHTTPRequest` →
  * `xmlhttp_request`.
  */
object SnakeCase {
  def apply(name: String): String = {
    val sb = new StringBuilder(name.length + 4)
    val cs = name.toCharArray
    var i = 0
    while (i < cs.length) {
      val c = cs(i)
      if (c.isUpper) {
        if (i > 0) {
          val prev = cs(i - 1)
          if (prev.isLower || prev.isDigit) sb.append('_')
          else if (prev.isUpper && i + 1 < cs.length && cs(i + 1).isLower)
            sb.append('_')
        }
        sb.append(c.toLower)
      } else sb.append(c)
      i += 1
    }
    sb.toString
  }
}

/** Identifier / literal escaping for generated DDL and DML
  * (/root/reference/src/common/sql.rs:3-18).
  */
object SqlEscape {
  /** MSSQL bracket-quoting: `my]table` → `[my]]table]`. */
  def mssqlIdentifier(name: String): String =
    "[" + name.replace("]", "]]") + "]"

  /** MySQL backtick-quoting: ``my`table`` → `` `my``table` ``. */
  def mysqlIdentifier(name: String): String =
    "`" + name.replace("`", "``") + "`"

  /** String-literal body escaping: backslashes doubled, `'` → `''`. */
  def sqlString(value: String): String =
    value.replace("\\", "\\\\").replace("'", "''")
}
