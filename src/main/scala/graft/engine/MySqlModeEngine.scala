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

  private lazy val registered: Unit =
    DriverManager.registerDriver(new MySqlModeDriver)

  /** Build a shim URL; `rest` is the Derby tail, e.g.
    * `memory:mydb_x;create=true`.
    */
  def url(rest: String): String = { registered; s"jdbc:graftmysql:$rest" }

  val UrlPrefix = "jdbc:graftmysql:"
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
      require(!sql.contains("@@"),
        s"mysql-mode: unsupported session variable in: ${sql.take(120)}")
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
    if (isTypeDdl)
      text = AnsiFlavor.typeRules.foldLeft(text) { case (acc, (re, to)) =>
        acc.replaceAll(re, to)
      }
    val litArr = lits.result()
    litArr.indices.foldLeft(text) { (acc, k) =>
      acc.replace("\u0001" + k + "\u0001", litArr(k))
    }
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
          Array(classOf[Statement]), new MySqlModeStmtHandler(st))
      case "prepareStatement" | "prepareCall" | "nativeSQL"
          if args != null && args.nonEmpty && args(0).isInstanceOf[String] =>
        // prepared text translates eagerly; emulated statements have
        // no prepared form in this engine
        val routed = MySqlDialect.route(args(0).asInstanceOf[String])
        val sql = routed match {
          case MySqlDialect.Translated(s) => s
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

private final class MySqlModeStmtHandler(underlying: Statement)
    extends InvocationHandler {
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
            method.invoke(underlying, (sql +: args.drop(1)): _*)
        }
      case _ => method.invoke(underlying, args: _*)
    } catch { case e: InvocationTargetException => throw e.getCause }
}
