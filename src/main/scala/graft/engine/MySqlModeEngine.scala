package graft.engine

import java.lang.reflect.{InvocationHandler, InvocationTargetException, Method, Proxy}
import java.sql.{Connection, Driver, DriverManager, DriverPropertyInfo, Statement}
import java.util.Properties
import java.util.concurrent.atomic.AtomicLong

/** An in-JVM MYSQL-DIALECT database engine: a strict MySQL-dialect
  * front end (lexer + validator + translator) over embedded Derby,
  * reachable through plain JDBC at `jdbc:graftmysql:…`.
  *
  * Why it exists: the production default `flavor = MySqlFlavor` is a
  * pass-through — the engine's DDL/DML reaches the wire as raw MySQL
  * (backtick identifiers, MySQL type names, backslash-escaped
  * literals, `SET FOREIGN_KEY_CHECKS`, `SELECT @@max_allowed_packet`;
  * reference: insert/inserter.rs:88-119, insert/query.rs:100-135).
  * With no MySQL-dialect server in the sandbox (no H2/MariaDB jars,
  * zero egress), that wire path was only ever string-tested. This
  * shim plays the role H2's MODE=MySQL would: it ACCEPTS the MySQL
  * dialect over a live JDBC connection — and, unlike a forgiving
  * server, REJECTS anything that is not well-formed MySQL (unbalanced
  * backticks, ANSI double-quoted identifiers, unknown escape
  * sequences, malformed FK toggles, unknown @@variables), so a
  * regression in the renderer's MySQL output fails the oracle gate
  * loudly instead of passing through a lenient translator.
  *
  * Dialect handling per statement:
  *  - `SET FOREIGN_KEY_CHECKS=0|1` — validated strictly, counted, and
  *    emulated as a no-op (Derby cannot disable FK enforcement; the
  *    migrator adds FK constraints only in the post-load constraints
  *    pass, so nothing depends on checks being off mid-load).
  *  - `SELECT @@max_allowed_packet` — answered with a real ResultSet
  *    carrying [[MySqlModeEngine.MaxPacket]] (Derby `VALUES`).
  *  - everything else — lexed into literals / backtick identifiers /
  *    bare text with MySQL escape semantics, re-emitted as ANSI
  *    (identifiers double-quoted, literals ''-escaped with backslash
  *    a plain character), MySQL type names mapped through the same
  *    [[AnsiFlavor.typeRules]] the string-tested path uses — applied
  *    to literal-MASKED text, so data can never be mistaken for DDL.
  *
  * The JDBC surface is a dynamic proxy over the Derby connection:
  * only SQL-carrying calls (create/prepare statement, execute*,
  * addBatch) are intercepted; transactions, metadata and result sets
  * are Derby's own. Counters on the companion let specs assert the
  * MySQL wire path actually fired (FK toggles, packet probes).
  */
object MySqlModeEngine {
  /** What `SELECT @@max_allowed_packet` reports (4 MiB — small enough
    * that the byte-bounded batcher visibly splits the fixture load).
    */
  val MaxPacket = 4194304L

  val fkOff = new AtomicLong
  val fkOn = new AtomicLong
  val packetProbes = new AtomicLong
  val translatedStatements = new AtomicLong

  def resetCounters(): Unit = {
    fkOff.set(0); fkOn.set(0); packetProbes.set(0)
    translatedStatements.set(0)
  }

  private lazy val registered: Unit = {
    DriverManager.registerDriver(new MySqlModeDriver)
    org.apache.spark.sql.jdbc.JdbcDialects.registerDialect(MySqlSparkDialect)
  }

  /** Build a shim URL; `rest` is the Derby tail, e.g.
    * `memory:mydb_x;create=true`.
    */
  def url(rest: String): String = { registered; s"jdbc:graftmysql:$rest" }

  val UrlPrefix = "jdbc:graftmysql:"
}

/** Spark-side dialect for the shim URL: identifiers quote as
  * `` `backticks` `` (the strict engine rejects ANSI double quotes),
  * so `spark.read`/`write.jdbc` against the shim emit MySQL-shaped
  * statements — the same quoting the reference's generated queries
  * use (insert/query.rs).
  */
private object MySqlSparkDialect extends org.apache.spark.sql.jdbc.JdbcDialect {
  override def canHandle(url: String): Boolean =
    url.startsWith(MySqlModeEngine.UrlPrefix)
  override def quoteIdentifier(colName: String): String =
    graft.naming.SqlEscape.mysqlIdentifier(colName)
  override def getCatalystType(sqlType: Int, typeName: String, size: Int,
      md: org.apache.spark.sql.types.MetadataBuilder)
      : Option[org.apache.spark.sql.types.DataType] =
    // the backing store is Derby: REAL is a 4-byte float (Spark's
    // URL-agnostic default widens it to DoubleType)
    if (sqlType == java.sql.Types.REAL)
      Some(org.apache.spark.sql.types.FloatType)
    else None
}

/** Strict MySQL-dialect statement classifier + translator. */
object MySqlDialect {
  sealed trait Routed
  /** Translated ANSI text, ready for Derby. */
  final case class Translated(sql: String) extends Routed
  /** `SET FOREIGN_KEY_CHECKS=…` — emulate, do not execute. */
  final case class FkToggle(on: Boolean) extends Routed
  /** `SELECT @@max_allowed_packet` — answer with the constant. */
  case object PacketProbe extends Routed

  private val fkRe =
    "(?i)^\\s*SET\\s+FOREIGN_KEY_CHECKS\\s*=\\s*([01])\\s*$".r
  private val packetRe =
    "(?i)^\\s*SELECT\\s+@@max_allowed_packet\\s*$".r

  def route(sql: String): Routed = sql match {
    case fkRe(v) => FkToggle(v == "1")
    case packetRe() => PacketProbe
    case _ =>
      require(!sql.trim.toUpperCase.startsWith("SET "),
        s"mysql-mode: malformed or unsupported SET statement: ${sql.take(120)}")
      Translated(translate(sql))
  }

  // ---- lexer ----------------------------------------------------------

  private sealed trait Tok
  private final case class Lit(value: String) extends Tok
  private final case class Ident(name: String) extends Tok
  private final case class Other(text: String) extends Tok

  private def fail(msg: String, sql: String): Nothing =
    throw new IllegalArgumentException(
      s"mysql-mode: $msg in statement: ${sql.take(160)}")

  /** MySQL backslash escapes our renderer (and standard clients) can
    * emit; anything else is rejected rather than guessed at.
    */
  private def unescape(c: Char, sql: String): Char = c match {
    case '\\' => '\\'
    case '\'' => '\''
    case '"' => '"'
    case 'n' => '\n'
    case 'r' => '\r'
    case 't' => '\t'
    case '0' => '\u0000'
    case 'b' => '\b'
    case 'Z' => '\u001A'
    case other => fail(s"unknown escape sequence \\$other", sql)
  }

  private def lex(sql: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    val sb = new StringBuilder
    def flush(): Unit =
      if (sb.nonEmpty) { out += Other(sb.toString); sb.clear() }
    val n = sql.length
    var i = 0
    while (i < n) {
      sql.charAt(i) match {
        case '\'' =>
          flush()
          val v = new StringBuilder
          i += 1
          var done = false
          while (!done) {
            if (i >= n) fail("unterminated string literal", sql)
            sql.charAt(i) match {
              case '\\' =>
                if (i + 1 >= n) fail("dangling backslash escape", sql)
                v.append(unescape(sql.charAt(i + 1), sql)); i += 2
              case '\'' if i + 1 < n && sql.charAt(i + 1) == '\'' =>
                v.append('\''); i += 2
              case '\'' => done = true; i += 1
              case c => v.append(c); i += 1
            }
          }
          out += Lit(v.toString)
        case '`' =>
          flush()
          val v = new StringBuilder
          i += 1
          var done = false
          while (!done) {
            if (i >= n) fail("unterminated backtick identifier", sql)
            sql.charAt(i) match {
              case '`' if i + 1 < n && sql.charAt(i + 1) == '`' =>
                v.append('`'); i += 2
              case '`' => done = true; i += 1
              case c => v.append(c); i += 1
            }
          }
          if (v.isEmpty) fail("empty backtick identifier", sql)
          out += Ident(v.toString)
        case '"' =>
          // ANSI_QUOTES is off in stock MySQL: a double quote here
          // means the renderer leaked ANSI dialect — reject it
          fail("double-quoted identifier is not MySQL dialect", sql)
        case c => sb.append(c); i += 1
      }
    }
    flush()
    out.result()
  }

  private def ansiLiteral(v: String): String =
    "'" + v.replace("'", "''") + "'"

  private def ansiIdent(name: String): String =
    "\"" + name.replace("\"", "\"\"") + "\""

  /** Full translation: lex → re-emit ANSI, with the type rules applied
    * only to type-defining DDL and only on the non-literal text.
    */
  def translate(sql: String): String = {
    val toks = lex(sql)
    val upper = sql.trim.toUpperCase
    val isTypeDdl = upper.startsWith("CREATE TABLE") ||
      upper.startsWith("ALTER TABLE")
    // mask literals so type rules can never touch data, then restore
    val masked = new StringBuilder
    val lits = Vector.newBuilder[String]
    var litIdx = 0
    toks.foreach {
      case Other(t) => masked.append(t)
      case Ident(nm) => masked.append(ansiIdent(nm))
      case Lit(v) =>
        lits += ansiLiteral(v)
        masked.append('\u0001').append(litIdx).append('\u0001')
        litIdx += 1
    }
    var text = masked.toString
    // unknown session variables are checked on the MASKED text:
    // '@@' inside a string literal is data, not a variable reference
    // (SELECT @@max_allowed_packet was already routed to emulation)
    if (text.contains("@@"))
      fail("unsupported session variable", sql)
    if (isTypeDdl)
      text = AnsiFlavor.typeRules.foldLeft(text) { case (acc, (re, to)) =>
        acc.replaceAll(re, to)
      }
    else
      // MySQL accepts 0xHEX binary literals natively (the reference's
      // binary render, format.rs:17); the backing store wants typed
      // hex. Literals are masked and identifiers double-quoted here,
      // so data and names can't match.
      text = text.replaceAll(
        "(?i)(?<![\\w'\"])0x([0-9a-fA-F]*)(?![\\w])",
        "CAST(X'$1' AS BLOB)")
    val litArr = lits.result()
    litArr.indices.foldLeft(text) { (acc, k) =>
      acc.replace("\u0001" + k + "\u0001", litArr(k))
    }
  }
}

/** MySQL coerces quoted numeric literals into DECIMAL columns — the
  * reference RELIES on that: format_numeric_value renders every
  * decimal QUOTED ('123.45', format.rs:42-55) and the MySQL wire
  * narrows it on assignment. Derby has no implicit CHAR→DECIMAL
  * conversion in a VALUES list, so the strict shim must emulate the
  * coercion: for INSERTs into tables with DECIMAL/NUMERIC columns,
  * quoted literals at those positions become explicit
  * `CAST('…' AS DECIMAL(p,s))`. Positions come from the live Derby
  * catalog (the translated CREATE already landed), so a quoted
  * NUMERIC-LOOKING string bound for a VARCHAR column stays text.
  */
private[engine] object MySqlDecimalCoerce {

  private val insertRe =
    "(?is)^\\s*INSERT\\s+INTO\\s+`([^`]+)`\\s*\\(([^)]*)\\)".r.unanchored

  private def decimalPositions(conn: Connection, table: String,
      cols: Vector[String]): Map[Int, (Int, Int)] = {
    val byName = scala.collection.mutable.Map.empty[String, (Int, Int)]
    val rs = conn.getMetaData.getColumns(null, null, table, null)
    try while (rs.next()) {
      val t = rs.getInt("DATA_TYPE")
      if (t == java.sql.Types.DECIMAL || t == java.sql.Types.NUMERIC)
        byName(rs.getString("COLUMN_NAME").toLowerCase) =
          (rs.getInt("COLUMN_SIZE"), rs.getInt("DECIMAL_DIGITS"))
    } finally rs.close()
    cols.zipWithIndex.flatMap { case (c, i) =>
      byName.get(c.toLowerCase).map(ps => i -> ps)
    }.toMap
  }

  def apply(conn: Connection, raw: String, translated: String): String =
    raw match {
      case insertRe(table, colList) =>
        val cols = "`([^`]+)`".r
          .findAllMatchIn(colList).map(_.group(1)).toVector
        val decPos = decimalPositions(conn, table, cols)
        if (decPos.isEmpty) translated
        else rewrite(translated, decPos)
      case _ => translated
    }

  /** Quote- and depth-aware walk over the translated text: inside each
    * depth-1 VALUES tuple, track the value ordinal at depth-1 commas;
    * a single-quoted literal that BEGINS a value at a decimal ordinal
    * is wrapped in the explicit cast.
    *
    * PRECONDITION: `sql` is `MySqlDialect.translate` output — the ANSI
    * re-emission where every literal is ''-escaped (ansiLiteral; the
    * lexer already decoded any MySQL backslash escape) and every
    * double-quoted span is a ""-escaped IDENTIFIER (ansiIdent). Raw
    * MySQL-dialect text must never reach this walk: without
    * ANSI_QUOTES, MySQL's `"` delimits a backslash-escaped string
    * literal, so a value like "a\"b" would end the span at the escaped
    * quote and desync the ordinal/depth tracking — and a double-quoted
    * string at a DECIMAL ordinal would silently skip the coercion.
    * Structurally guaranteed: both call sites feed
    * `MySqlDialect.Translated(...)` only, and the lexer REJECTS any
    * raw `"` ("double-quoted identifier is not MySQL dialect"), so
    * every `"` surviving into translated text was emitted by
    * ansiIdent.
    */
  private[engine] def rewrite(sql: String, decPos: Map[Int, (Int, Int)]): String = {
    val valuesAt = findValuesKeyword(sql)
    if (valuesAt < 0) return sql
    val out = new StringBuilder(sql.substring(0, valuesAt + 6))
    var i = valuesAt + 6
    val n = sql.length
    var depth = 0
    var ordinal = 0
    var atValueStart = false
    while (i < n) {
      val c = sql.charAt(i)
      c match {
        case '\'' =>
          // literal span: [i, end)
          var j = i + 1
          var closed = false
          while (j < n && !closed) {
            if (sql.charAt(j) == '\'') {
              if (j + 1 < n && sql.charAt(j + 1) == '\'') j += 2
              else { closed = true; j += 1 }
            } else j += 1
          }
          val lit = sql.substring(i, j)
          if (depth == 1 && atValueStart) decPos.get(ordinal) match {
            case Some((p, s)) =>
              out.append(s"CAST($lit AS DECIMAL($p,$s))")
            case None => out.append(lit)
          } else out.append(lit)
          atValueStart = false
          i = j
        case '"' =>
          // double-quoted identifier span ("" escape): copied through
          // whole, so a name containing a comma, paren, or apostrophe
          // can't corrupt the ordinal/depth walk (same rule as
          // findValuesKeyword)
          var j = i + 1
          var closed = false
          while (j < n && !closed) {
            if (sql.charAt(j) == '"') {
              if (j + 1 < n && sql.charAt(j + 1) == '"') j += 2
              else { closed = true; j += 1 }
            } else j += 1
          }
          out.append(sql.substring(i, j))
          if (depth == 1) atValueStart = false
          i = j
        case '(' =>
          depth += 1
          if (depth == 1) { ordinal = 0; atValueStart = true }
          out.append(c); i += 1
        case ')' =>
          depth -= 1; atValueStart = false
          out.append(c); i += 1
        case ',' =>
          if (depth == 1) { ordinal += 1; atValueStart = true }
          out.append(c); i += 1
        case w if w.isWhitespace =>
          out.append(c); i += 1 // whitespace does not start a value
        case other =>
          if (depth == 1 && other != ' ') atValueStart = false
          out.append(other); i += 1
      }
    }
    out.toString
  }

  /** First depth-0 VALUES keyword outside quoted spans — BOTH literal
    * ('') and identifier ("") quoting skip, so a table or column name
    * containing " VALUES " cannot mis-anchor the rewrite.
    */
  private def findValuesKeyword(sql: String): Int = {
    var i = 0
    val n = sql.length
    var quote: Char = 0
    var depth = 0
    while (i < n) {
      val c = sql.charAt(i)
      if (quote != 0) {
        if (c == quote) {
          if (i + 1 < n && sql.charAt(i + 1) == quote) i += 1 else quote = 0
        }
      } else c match {
        case '\'' | '"' => quote = c
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ if depth == 0 &&
            sql.regionMatches(true, i, "VALUES", 0, 6) => return i
        case _ => ()
      }
      i += 1
    }
    -1
  }
}

/** JDBC driver for `jdbc:graftmysql:…` — wraps the embedded Derby
  * driver with the MySQL-dialect front end.
  */
final class MySqlModeDriver extends Driver {
  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith(MySqlModeEngine.UrlPrefix)

  override def connect(url: String, info: Properties): Connection =
    if (!acceptsURL(url)) null
    else {
      val derbyUrl = "jdbc:derby:" + url.stripPrefix(MySqlModeEngine.UrlPrefix)
      val underlying = DriverManager.getConnection(derbyUrl, info)
      Proxy.newProxyInstance(getClass.getClassLoader,
        Array(classOf[Connection]),
        new MySqlModeConnHandler(underlying)).asInstanceOf[Connection]
    }

  override def getPropertyInfo(url: String, info: Properties): Array[DriverPropertyInfo] =
    Array.empty
  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def jdbcCompliant(): Boolean = false
  override def getParentLogger: java.util.logging.Logger =
    java.util.logging.Logger.getLogger("graft.mysqlmode")
}

private final class MySqlModeConnHandler(underlying: Connection)
    extends InvocationHandler {
  override def invoke(proxy: AnyRef, method: Method, args: Array[AnyRef]): AnyRef =
    try method.getName match {
      case "createStatement" =>
        val st = method.invoke(underlying,
          args: _*).asInstanceOf[Statement]
        Proxy.newProxyInstance(getClass.getClassLoader,
          Array(classOf[Statement]),
          new MySqlModeStmtHandler(st, underlying))
      case "prepareStatement" | "prepareCall" | "nativeSQL"
          if args != null && args.nonEmpty && args(0).isInstanceOf[String] =>
        // prepared text translates eagerly; emulated statements have
        // no prepared form in this engine
        val raw0 = args(0).asInstanceOf[String]
        val routed = MySqlDialect.route(raw0)
        val sql = routed match {
          case MySqlDialect.Translated(s) =>
            MySqlDecimalCoerce(underlying, raw0, s)
          case MySqlDialect.PacketProbe =>
            s"VALUES CAST(${MySqlModeEngine.MaxPacket} AS BIGINT)"
          case _: MySqlDialect.FkToggle =>
            throw new IllegalArgumentException(
              "mysql-mode: SET FOREIGN_KEY_CHECKS cannot be prepared")
        }
        method.invoke(underlying, (sql +: args.drop(1)): _*)
      case _ => method.invoke(underlying, args: _*)
    } catch { case e: InvocationTargetException => throw e.getCause }
}

private final class MySqlModeStmtHandler(underlying: Statement,
    conn: Connection) extends InvocationHandler {
  override def invoke(proxy: AnyRef, method: Method, args: Array[AnyRef]): AnyRef =
    try method.getName match {
      case "execute" | "executeQuery" | "executeUpdate" | "executeLargeUpdate" |
          "addBatch"
          if args != null && args.nonEmpty && args(0).isInstanceOf[String] =>
        MySqlDialect.route(args(0).asInstanceOf[String]) match {
          case MySqlDialect.FkToggle(on) =>
            if (on) MySqlModeEngine.fkOn.incrementAndGet()
            else MySqlModeEngine.fkOff.incrementAndGet()
            method.getName match {
              case "execute" => java.lang.Boolean.FALSE // no result set
              case "executeUpdate" => Integer.valueOf(0)
              case "executeLargeUpdate" => java.lang.Long.valueOf(0L)
              case "addBatch" => null
              case other => throw new IllegalArgumentException(
                s"mysql-mode: FK toggle not valid via $other")
            }
          case MySqlDialect.PacketProbe =>
            MySqlModeEngine.packetProbes.incrementAndGet()
            method.invoke(underlying,
              (s"VALUES CAST(${MySqlModeEngine.MaxPacket} AS BIGINT)" +:
                args.drop(1)): _*)
          case MySqlDialect.Translated(sql) =>
            MySqlModeEngine.translatedStatements.incrementAndGet()
            val coerced = MySqlDecimalCoerce(
              conn, args(0).asInstanceOf[String], sql)
            method.invoke(underlying, (coerced +: args.drop(1)): _*)
        }
      case _ => method.invoke(underlying, args: _*)
    } catch { case e: InvocationTargetException => throw e.getCause }
}
