package graft

import java.sql.{DriverManager, Timestamp}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine._
import graft.mapping.TypeRegistry
import graft.types.{ColumnSchema, Constraint, MssqlType}

/** Seeded fuzz of the literal-render → flavor-translate → strict-shim
  * lex/translate → storage → read-back chain, into BOTH target
  * dialects. The fixed-value quirks gates pin known cases; this spec
  * drives RANDOM data through the identical production path
  * (Migrator + BatchedInsertWriter) with an alphabet chosen to hit
  * every escaping hazard the round's three found-bugs lived in:
  * quotes, doubled quotes, backslashes, backticks, brackets,
  * semicolons, commas, parens, 0x-looking text, SQL keywords,
  * non-ASCII, and NULLs in every column.
  */
class WireFuzzSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val nastyBits = Vector(
    "'", "''", "\"", "`", "\\", "\\\\", ";", ",", "(", ")", "[", "]",
    "0x00", "0xdead", "VALUES", "SET", "DEFAULT 'money'", "café",
    "a@@b", "@@max_allowed_packet",
    "中文", "O'Brien", "a;b'c\\d", " NULL ", "x" * 40, "")

  private def randString(r: scala.util.Random): String =
    (0 until (1 + r.nextInt(4)))
      .map(_ => nastyBits(r.nextInt(nastyBits.size))).mkString(" ").take(150)

  private def mkRows(seed: Long, n: Int): Seq[Row] = {
    val r = new scala.util.Random(seed)
    (1 to n).map { id =>
      val s = if (r.nextInt(8) == 0) null else randString(r)
      val d = if (r.nextInt(8) == 0) null
        else new java.math.BigDecimal(
          BigInt(r.nextLong() % 100000000L).toString).movePointLeft(4)
      val b = if (r.nextInt(8) == 0) null
        else { val a = new Array[Byte](1 + r.nextInt(16)); r.nextBytes(a); a }
      val t = if (r.nextInt(8) == 0) null
        else new Timestamp(math.abs(r.nextLong() % 4102444800000L) / 1000 * 1000 +
          r.nextInt(1000)) // ms-precision epoch in [1970, 2100)
      Row(id, s, d, b, t)
    }
  }

  private val structType = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("s", StringType),
    StructField("d", DecimalType(12, 4)),
    StructField("b", BinaryType),
    StructField("t", TimestampType)))

  private def fuzzSource(df: DataFrame): SchemaSource = new SchemaSource {
    override def fetchTables(): Seq[String] = Seq("fuzz")
    override def getTableSchema(table: String): Seq[ColumnSchema] = Seq(
      ColumnSchema("id", MssqlType.Int, isNullable = false,
        constraints = Some(Constraint.PrimaryKey)),
      ColumnSchema("s", MssqlType.NVarchar, Some(200)),
      ColumnSchema("d", MssqlType.Decimal, None, Some(12), Some(4)),
      ColumnSchema("b", MssqlType.VarBinary, Some(16)),
      ColumnSchema("t", MssqlType.DateTime2))
    override def read(spark: SparkSession, table: String): DataFrame = df
  }

  private def canon(rows: Seq[Row]): Seq[(Int, String, String, String, Long)] =
    rows.map { r =>
      (r.getInt(0),
        Option(r.getString(1)).getOrElse("<null>"),
        Option(r.getAs[java.math.BigDecimal](2))
          .map(_.stripTrailingZeros.toPlainString).getOrElse("<null>"),
        Option(r.getAs[Array[Byte]](3))
          .map(_.map(x => f"${x & 0xff}%02x").mkString).getOrElse("<null>"),
        Option(r.getAs[Timestamp](4)).map(_.getTime).getOrElse(-1L))
    }.sortBy(_._1)

  private def roundTrip(seed: Long, dstUrl: String, flavor: SqlFlavor,
      readBack: () => DataFrame): Unit = {
    val input = mkRows(seed, 60)
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(input).asJava), structType)
    val migrator = new Migrator(spark, fuzzSource(df),
      new JdbcTargetWriter(dstUrl, flavor), TypeRegistry.withDefaults(),
      MigrationOptions(maxConcurrentTasks = 1,
        // small packets force MANY batch splits mid-stream — the
        // boundary cases ride along for free
        maxPacketBytes = 2048))
    val results = migrator.run()
    assert(results.map(_.rowsMigrated).sum == 60)
    val got = canon(readBack().collect().toSeq)
    val want = canon(input)
    got.zip(want).foreach { case (g, w) => assert(g == w, s"\n got=$g\nwant=$w") }
  }

  test("fuzz round-trip into the ANSI Derby target") {
    val nonce = System.nanoTime()
    val dstUrl = s"jdbc:derby:memory:fuzzansi_$nonce;create=true"
    try roundTrip(0xf00d1L, dstUrl, AnsiFlavor, () =>
      spark.read.jdbc(dstUrl, "\"fuzz\"", new java.util.Properties))
    finally {
      try DriverManager.getConnection(
        dstUrl.replace(";create=true", ";drop=true"))
      catch { case _: java.sql.SQLException => () }
    }
  }

  private def tsql(v: Any): String = v match {
    case null => "NULL"
    case s: String => "N'" + s.replace("'", "''") + "'"
    case d: java.math.BigDecimal => d.toPlainString
    case b: Array[Byte] =>
      "0x" + b.map(x => f"${x & 0xff}%02x").mkString
    case t: Timestamp =>
      val f = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss.SSS")
      f.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
      "'" + f.format(t) + "'"
    case other => other.toString
  }

  private def mssqlSourceRoundTrip(seed: Long): Unit = {
    // the symmetric leg: random values rendered as T-SQL literals
    // (N'…' with '' doubling, backslash a PLAIN character, 0xHEX
    // binaries) are INSERTed through the shim's lexer/translator and
    // read back through MssqlSchemaSource's partitioned scan +
    // canonical decode
    val input = mkRows(seed, 60)
    val nonce = System.nanoTime()
    val srcRest = s"memory:fuzzsrc_$nonce;create=true"
    val srcUrl = MssqlModeEngine.url(srcRest)
    try {
      val c = DriverManager.getConnection(srcUrl)
      try {
        val st = c.createStatement()
        st.execute("CREATE TABLE [fz] ([id] INT NOT NULL PRIMARY KEY, " +
          "[s] NVARCHAR(200), [d] DECIMAL(12,4), [b] VARBINARY(16), " +
          "[t] DATETIME2(6))")
        st.execute("INSERT INTO [fz] ([id],[s],[d],[b],[t]) VALUES " +
          input.map(r => "(" + r.toSeq.map(tsql).mkString(", ") + ")")
            .mkString(", "))
        st.close()
      } finally c.close()
      val got = canon(new MssqlSchemaSource(srcUrl, numPartitions = 4)
        .read(spark, "fz").collect().toSeq)
      got.zip(canon(input)).foreach { case (g, w) =>
        assert(g == w, s"\n got=$g\nwant=$w")
      }
    } finally {
      try DriverManager.getConnection(
        s"jdbc:derby:$srcRest".replace(";create=true", ";drop=true"))
      catch { case _: java.sql.SQLException => () }
    }
  }

  test("fuzz round-trip through the strict MSSQL-dialect SOURCE wire") {
    mssqlSourceRoundTrip(0xf00d3L)
  }

  /** Fuzz the rowversion DML path: multi-row INSERTs (split into
    * per-tuple statements under one transaction) and UPDATEs whose SET
    * literals carry every scan hazard (' WHERE ', '[rv] =', 'VALUES',
    * backticks, '@@', 0x-looking text) — the exact text the masked
    * guard and the VALUES/SET anchors must never mistake for syntax.
    * The model tracks the expected database-wide counter per row.
    */
  private def rowversionDmlFuzz(seed: Long): Unit = {
    val r = new scala.util.Random(seed)
    val nonce = System.nanoTime()
    val rest = s"memory:fuzzrv_${nonce}_$seed;create=true"
    val url = MssqlModeEngine.url(rest)
    try {
      val c = DriverManager.getConnection(url)
      try {
        val st = c.createStatement()
        st.execute("CREATE TABLE [rvz] ([id] INT NOT NULL PRIMARY KEY, " +
          "[s] NVARCHAR(300), [rv] ROWVERSION)")
        val s = scala.collection.mutable.Map.empty[Int, String] // id → s
        val rv = scala.collection.mutable.Map.empty[Int, Long] // id → rv
        var counter = 0L
        var nextId = 1
        // phase 1: multi-row inserts in random batch sizes — each row
        // draws one counter value in tuple order
        while (nextId <= 30) {
          val k = 1 + r.nextInt(5)
          val ids = (nextId until math.min(nextId + k, 31)).toVector
          nextId += ids.size
          val tuples = ids.map { id =>
            val v = if (r.nextInt(8) == 0) null else randString(r)
            s(id) = Option(v).getOrElse("<null>")
            counter += 1; rv(id) = counter
            s"($id, ${tsql(v)})"
          }
          st.execute("INSERT INTO [rvz] ([id],[s]) VALUES " +
            tuples.mkString(", "))
        }
        // phase 2: random updates — one counter draw per matched row,
        // the SET literal carrying the full hazard alphabet
        (1 to 20).foreach { _ =>
          val id = 1 + r.nextInt(30)
          val v = randString(r) + " WHERE [rv] = 9 VALUES `x` @@v"
          s(id) = v
          counter += 1; rv(id) = counter
          st.execute(s"UPDATE [rvz] SET [s] = ${tsql(v)} WHERE [id] = $id")
        }
        // model check over the live wire read-back
        val got = new MssqlSchemaSource(url).read(spark, "rvz")
          .collect().map(row => (row.getAs[Int]("id"),
            Option(row.getAs[String]("s")).getOrElse("<null>"),
            row.getAs[Long]("rv"))).sortBy(_._1).toSeq
        val want = (1 to 30).map(id => (id, s(id), rv(id)))
        got.zip(want).foreach { case (g, w) =>
          assert(g == w, s"\n got=$g\nwant=$w")
        }
        // violation arms stay violations under fuzz data
        intercept[Exception](
          st.execute("INSERT INTO [rvz] ([id],[s],[rv]) VALUES (99, 'x', 1)"))
        intercept[Exception](
          st.execute("UPDATE [rvz] SET [rv] = 5 WHERE [id] = 1"))
        // a failing multi-row insert (dup key mid-list) keeps nothing
        intercept[Exception](
          st.execute("INSERT INTO [rvz] ([id],[s]) VALUES (98, 'a'), (1, 'b')"))
        val rs = st.executeQuery(
          "SELECT COUNT(*) FROM [rvz] WHERE [id] IN (98, 99)")
        rs.next(); assert(rs.getLong(1) == 0L); rs.close()
        st.close()
      } finally c.close()
    } finally {
      try DriverManager.getConnection(
        s"jdbc:derby:$rest".replace(";create=true", ";drop=true"))
      catch { case _: java.sql.SQLException => () }
    }
  }

  test("fuzz rowversion DML through the strict MSSQL wire") {
    rowversionDmlFuzz(0xf00d4L)
  }

  /** Fuzz the CREATE TABLE constraint parser: column NAMES drawn from
    * constraint keywords and apostrophe-laden text (the blankMasks /
    * splitDefs hazards — a bracketed [o'brien]-style identifier must
    * never toggle literal masking), DEFAULT/CHECK literals drawn from
    * the same keyword soup, one constraint slot per column
    * (extractor.rs:62-70 precedence). Expected metadata is derived
    * from the generated spec, read back through the live emulated
    * INFORMATION_SCHEMA.
    */
  private def constraintParseFuzz(seed: Long): Unit = {
    val r = new scala.util.Random(seed)
    val nastyNames = Vector("o'brien", "not null", "unique", "check",
      "default", "references", "primary key", "values x", "café",
      "O'Reilly's", "a'b'c", "check (x", "[weird", "словарь")
    val nastyLits = Vector("NOT NULL", "unique", "check (x",
      "PRIMARY KEY", "REFERENCES [m]([id])", "][", "'", "''", "café",
      "O'Brien", "\\", "0xdead", "VALUES", "DEFAULT 'money'", "")
    def esc(name: String) = name // no ']' in nastyNames — no escaping
    def lit(r: scala.util.Random): String =
      (0 until (1 + r.nextInt(3)))
        .map(_ => nastyLits(r.nextInt(nastyLits.size))).mkString(" ").take(60)
    sealed trait Spec
    case object Plain extends Spec
    case object NotNull extends Spec
    case object Uniq extends Spec
    final case class Dflt(raw: String) extends Spec
    final case class Chk(body: String) extends Spec
    val cols = (0 until 6).map { i =>
      val name = s"${nastyNames(r.nextInt(nastyNames.size))}_$i"
      val spec = r.nextInt(5) match {
        case 0 => Plain
        case 1 => NotNull
        case 2 => Uniq
        case 3 => Dflt("'" + lit(r).replace("'", "''") + "'")
        case _ => Chk(s"[${esc(name)}] <> '${lit(r).replace("'", "''")}'")
      }
      (name, spec)
    }
    val defs = cols.map { case (name, spec) =>
      val base = s"[${esc(name)}] NVARCHAR(200)"
      spec match {
        case Plain => base
        case NotNull => s"$base NOT NULL"
        case Uniq => s"$base UNIQUE"
        case Dflt(raw) => s"$base DEFAULT $raw"
        case Chk(body) => s"$base CHECK ($body)"
      }
    }
    val nonce = System.nanoTime()
    val rest = s"memory:fuzzcp_${nonce}_$seed;create=true"
    val url = MssqlModeEngine.url(rest)
    try {
      val c = DriverManager.getConnection(url)
      try {
        val st = c.createStatement()
        st.execute("CREATE TABLE [fzc] ([id] INT NOT NULL PRIMARY KEY, " +
          defs.mkString(", ") + ")")
        st.close()
      } finally c.close()
      val byName = new MssqlSchemaSource(url).getTableSchema("fzc")
        .map(s => s.columnName -> s).toMap
      assert(byName("id").constraints == Some(Constraint.PrimaryKey))
      assert(!byName("id").isNullable)
      cols.foreach { case (name, spec) =>
        val col = byName(name)
        val want: (Boolean, Option[Constraint]) = spec match {
          case Plain => (true, None)
          case NotNull => (false, None)
          case Uniq => (true, Some(Constraint.Unique))
          case Dflt(raw) => (true, Some(Constraint.Default(raw)))
          case Chk(body) => (true, Some(Constraint.Check(body)))
        }
        assert((col.isNullable, col.constraints) == want,
          s"column [$name] spec $spec: got " +
            s"(${col.isNullable}, ${col.constraints})")
      }
    } finally {
      try DriverManager.getConnection(
        s"jdbc:derby:$rest".replace(";create=true", ";drop=true"))
      catch { case _: java.sql.SQLException => () }
    }
  }

  test("fuzz CREATE TABLE constraint parsing (keyword names + literals)") {
    (1L to 8L).foreach(constraintParseFuzz)
  }

  // Optional wide sweep: SPARK_GRAFT_FUZZ_SEEDS="1,2,3" registers every
  // leg once per seed — used for local soak runs; CI stays on the
  // fixed seeds above.
  sys.env.get("SPARK_GRAFT_FUZZ_SEEDS").toSeq
    .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty).map(_.toLong)
    .foreach { seed =>
      test(s"fuzz sweep seed $seed: ANSI target") {
        val nonce = System.nanoTime()
        val dstUrl = s"jdbc:derby:memory:fzsw${nonce}_$seed;create=true"
        try roundTrip(seed, dstUrl, AnsiFlavor, () =>
          spark.read.jdbc(dstUrl, "\"fuzz\"", new java.util.Properties))
        finally {
          try DriverManager.getConnection(
            dstUrl.replace(";create=true", ";drop=true"))
          catch { case _: java.sql.SQLException => () }
        }
      }
      test(s"fuzz sweep seed $seed: MySQL shim target") {
        val nonce = System.nanoTime()
        val dstRest = s"memory:fzswmy${nonce}_$seed;create=true"
        val dstUrl = MySqlModeEngine.url(dstRest)
        try roundTrip(seed, dstUrl, MySqlFlavor, () =>
          spark.read.jdbc(dstUrl, "`fuzz`", new java.util.Properties))
        finally {
          try DriverManager.getConnection(
            s"jdbc:derby:$dstRest".replace(";create=true", ";drop=true"))
          catch { case _: java.sql.SQLException => () }
        }
      }
      test(s"fuzz sweep seed $seed: MSSQL source wire") {
        mssqlSourceRoundTrip(seed)
      }
      test(s"fuzz sweep seed $seed: rowversion DML") {
        rowversionDmlFuzz(seed)
      }
    }

  test("fuzz round-trip into the strict MySQL-dialect shim target") {
    val nonce = System.nanoTime()
    val dstRest = s"memory:fuzzmy_$nonce;create=true"
    val dstUrl = MySqlModeEngine.url(dstRest)
    try roundTrip(0xf00d2L, dstUrl, MySqlFlavor, () =>
      spark.read.jdbc(dstUrl, "`fuzz`", new java.util.Properties))
    finally {
      try DriverManager.getConnection(
        s"jdbc:derby:$dstRest".replace(";create=true", ";drop=true"))
      catch { case _: java.sql.SQLException => () }
    }
  }
}
