package graft.engine

import java.sql.Timestamp
import java.time.format.DateTimeFormatter
import java.time.ZoneOffset

import graft.naming.SqlEscape

/** Typed value → SQL literal rendering, matching the reference's
  * formats (/root/reference/src/extract/format.rs:15-70):
  * NULL for nulls; bit as 0/1; integers/floats plain; strings quoted
  * with `'` doubled; decimals quoted with the scale's zero padding
  * (format_numeric_value, :42-55); binary as unquoted lowercase
  * `0x…` hex; datetimes quoted `'yyyy-MM-dd HH:mm:ss[.fff]'`; dates
  * quoted `'yyyy-MM-dd'`.
  *
  * The reference renders literals because it ships SQL text; our JDBC
  * writer would normally bind parameters, but literal mode is kept for
  * parity and for the script-target writer.
  */
object SqlLiteral {

  private val dtNoFrac = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
  private val dateFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd")

  def render(value: Any): String = render(value, quotedDecimals = true)

  /** `quotedDecimals = false` renders BigDecimal bare (ANSI targets
    * reject CHAR→DECIMAL in VALUES); true is reference parity
    * (format_numeric_value quotes, the MySQL wire coerces).
    */
  def render(value: Any, quotedDecimals: Boolean): String = value match {
    case null => "NULL"
    case None => "NULL"
    case Some(v) => render(v, quotedDecimals)
    case b: Boolean => if (b) "1" else "0"
    case b: Byte => b.toString
    case s: Short => s.toString
    case i: Int => i.toString
    case l: Long => l.toString
    case f: Float => f.toString
    case d: Double => d.toString
    case d: java.math.BigDecimal =>
      if (quotedDecimals) s"'${d.toPlainString}'" else d.toPlainString
    case d: BigDecimal =>
      render(d.underlying, quotedDecimals)
    case s: String => s"'${SqlEscape.sqlString(s)}'"
    case b: Array[Byte] =>
      "0x" + b.map(x => f"${x & 0xff}%02x").mkString
    case t: Timestamp =>
      // toLocalDateTime inverts the JDBC driver's wall-clock->instant
      // conversion (both use the JVM default zone), so the rendered
      // literal is the SOURCE's wall-clock time under ANY JVM zone;
      // the previous atOffset(UTC) silently shifted datetimes by the
      // JVM's UTC offset when the JVM was not running in UTC
      val i = t.toLocalDateTime
      val base = dtNoFrac.format(i)
      val nanos = t.getNanos
      if (nanos == 0) s"'$base'"
      else {
        // trim trailing zeros like chrono's %.f (3/6/9 digit groups)
        val frac9 = f"$nanos%09d"
        val frac =
          if (frac9.endsWith("000000")) frac9.take(3)
          else if (frac9.endsWith("000")) frac9.take(6)
          else frac9
        s"'$base.$frac'"
      }
    case d: java.sql.Date => s"'${d.toLocalDate.format(dateFmt)}'"
    case d: java.time.LocalDate => s"'${d.format(dateFmt)}'"
    case t: java.time.LocalDateTime =>
      val base = dtNoFrac.format(t)
      val nanos = t.getNano
      if (nanos == 0) s"'$base'"
      else {
        val frac9 = f"$nanos%09d"
        val frac =
          if (frac9.endsWith("000000")) frac9.take(3)
          else if (frac9.endsWith("000")) frac9.take(6)
          else frac9
        s"'$base.$frac'"
      }
    case i: java.time.Instant =>
      render(java.sql.Timestamp.from(i))
    case other => s"'${SqlEscape.sqlString(other.toString)}'"
  }

  /** One multi-row VALUES tuple: `(v1, v2, v3) ` — including the
    * reference's trailing space (table_migrator.rs:136).
    */
  def valueTuple(values: Seq[Any],
      quotedDecimals: Boolean = true): String =
    values.map(render(_, quotedDecimals)).mkString("(", ", ", ") ")
}
