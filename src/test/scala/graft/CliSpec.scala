package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.config._

/** Entry-point wiring: flag parsing (args.rs:10-63 parity), the
  * CLI-XOR-config.toml resolution rule (main.rs:141-176), and logger
  * configuration (main.rs:95-121).
  */
class CliSpec extends AnyFunSuite {

  private val noFile: String => Option[String] = _ => None

  test("every reference flag parses, short and long forms") {
    val a = CliArgs.parse(Seq("-v", "-q", "-d", "-c", "-f", "-p", "7",
      "--truncate", "--max-packet-bytes", "4096")).toOption.get
    assert(a.verbose && a.quiet && a.drop && a.constraints && a.format)
    assert(a.truncate && a.parallelism == 7 && a.maxPacketBytes.contains(4096))

    val b = CliArgs.parse(Seq("--verbose", "--quiet", "--drop",
      "--constraints", "--format", "--parallelism", "3")).toOption.get
    assert(b.verbose && b.quiet && b.drop && b.constraints && b.format)
    assert(b.parallelism == 3)
  }

  test("parallelism defaults to the CPU count (args.rs:60-63)") {
    val a = CliArgs.parse(Seq.empty).toOption.get
    assert(a.parallelism == Runtime.getRuntime.availableProcessors())
  }

  test("bad arguments are rejected with the offending token") {
    assert(CliArgs.parse(Seq("--bogus")).left.exists(_.contains("--bogus")))
    assert(CliArgs.parse(Seq("-p", "zero")).left.exists(_.contains("integer")))
    assert(CliArgs.parse(Seq("-p", "0")).left.exists(_.contains("positive")))
    assert(CliArgs.parse(Seq("--source")).left.exists(_.contains("requires a value")))
  }

  test("any CLI connection arg forces CLI mode with all three required") {
    val a = CliArgs.parse(Seq("--source", "mssql://u:p@h/db")).toOption.get
    val err = ConfigResolver.resolve(a, noFile).left.getOrElse("")
    assert(err.contains("--target") && err.contains("--tables"))
    assert(err.contains("config.toml is not read"))
  }

  test("complete CLI mode resolves without touching config.toml") {
    val a = CliArgs.parse(Seq(
      "--source", "mssql://sa:pw@srchost:1433/legacy",
      "--target", "mysql://root:pw@dsthost:3306/fresh",
      "--tables", "Users,Orders")).toOption.get
    // a readFile that explodes proves config.toml is never read
    val mode = ConfigResolver.resolve(a,
      _ => fail("config.toml must not be read in CLI mode")).toOption.get
    mode match {
      case JdbcMode(cfg) =>
        assert(cfg.mssqlDatabase.host == "srchost")
        assert(cfg.settings.whitelistedTables == Seq("Users", "Orders"))
      case other => fail(s"expected JdbcMode, got $other")
    }
  }

  test("without CLI args config.toml is required and packet override applies") {
    val a = CliArgs.parse(Seq("--max-packet-bytes", "2048")).toOption.get
    assert(ConfigResolver.resolve(a, noFile)
      .left.exists(_.contains("Failed to load config file")))

    val toml =
      """[mssql_database]
        |username = "sa"
        |password = "pw"
        |database = "legacy"
        |[mysql_database]
        |username = "root"
        |password = "pw"
        |database = "fresh"
        |[settings]
        |max_packet_bytes = 999
        |whitelisted_tables = ["T1"]""".stripMargin
    val mode = ConfigResolver.resolve(a, f => {
      assert(f == "config.toml"); Some(toml)
    }).toOption.get
    mode match {
      case JdbcMode(cfg) => assert(cfg.settings.maxPacketBytes == 2048)
      case other => fail(s"expected JdbcMode, got $other")
    }
  }

  test("fixture mode pairs the dirs and uses --tables as whitelist") {
    val a = CliArgs.parse(Seq("--source-dir", "/in", "--target-dir", "/out",
      "--tables", "region , nation")).toOption.get
    assert(ConfigResolver.resolve(a, noFile) ==
      Right(FixtureMode("/in", "/out", Seq("region", "nation"))))

    val half = CliArgs.parse(Seq("--source-dir", "/in")).toOption.get
    assert(ConfigResolver.resolve(half, noFile)
      .left.exists(_.contains("together")))
  }

  test("jdbc urls render from the resolved endpoints") {
    val d = DatabaseConfig("h", 1433, "u", "p", "db")
    assert(ConfigResolver.mssqlJdbcUrl(d) ==
      "jdbc:sqlserver://h:1433;databaseName=db")
    assert(ConfigResolver.mysqlJdbcUrl(d.copy(port = 3306)) ==
      "jdbc:mysql://h:3306/db")
  }

  test("log level resolution: quiet beats verbose beats info (main.rs:96-102)") {
    import org.apache.logging.log4j.Level
    assert(GraftLog.levelFor(verbose = false, quiet = false) == Level.INFO)
    assert(GraftLog.levelFor(verbose = true, quiet = false) == Level.DEBUG)
    assert(GraftLog.levelFor(verbose = false, quiet = true) == Level.WARN)
    assert(GraftLog.levelFor(verbose = true, quiet = true) == Level.WARN)
  }

  test("log lines render as HH:MM:SS LEVEL [thread] - message") {
    import org.apache.logging.log4j.core.layout.PatternLayout
    import org.apache.logging.log4j.core.impl.Log4jLogEvent
    import org.apache.logging.log4j.message.SimpleMessage
    val layout = PatternLayout.newBuilder()
      .withPattern(GraftLog.Pattern).build()
    val event = Log4jLogEvent.newBuilder()
      .setLoggerName("graft")
      .setLevel(org.apache.logging.log4j.Level.INFO)
      .setMessage(new SimpleMessage("tables migrated"))
      .setThreadName("main")
      .build()
    val line = layout.toSerializable(event)
    assert(line.matches(
      "\\d{2}:\\d{2}:\\d{2} INFO  \\[main\\] - tables migrated\\R"), line)
  }

  test("spark modules are pinned to ERROR like the reference's driver modules") {
    import org.apache.logging.log4j.Level
    assert(GraftLog.ModuleFilters.get("org.apache.spark").contains(Level.ERROR))
    GraftLog.init(verbose = false, quiet = true)
    val ctx = org.apache.logging.log4j.LogManager.getContext(false)
      .asInstanceOf[org.apache.logging.log4j.core.LoggerContext]
    val cfg = ctx.getConfiguration
    assert(cfg.getLoggerConfig("org.apache.spark.SparkContext").getLevel == Level.ERROR)
    assert(cfg.getRootLogger.getLevel == Level.WARN)
  }
}
