package graft.config

/** Parsed command-line arguments, flag-for-flag with the reference CLI
  * (/root/reference/src/args.rs:10-63): -v/-q log levels, -d drop,
  * -c constraints, -f snake_case format, -p parallelism (defaults to
  * the CPU count), --source/--target/--tables CLI connection mode,
  * --max-packet-bytes override. `--truncate` and the fixture-dir pair
  * (--source-dir/--target-dir: parquet in, SQL script out) are this
  * engine's additions for environments without live databases.
  */
final case class CliArgs(
    verbose: Boolean = false,
    quiet: Boolean = false,
    drop: Boolean = false,
    truncate: Boolean = false,
    constraints: Boolean = false,
    format: Boolean = false,
    parallelism: Int = Runtime.getRuntime.availableProcessors(),
    source: Option[String] = None,
    target: Option[String] = None,
    tables: Option[String] = None,
    maxPacketBytes: Option[Int] = None,
    configFile: String = "config.toml",
    mappingsFile: Option[String] = None,
    sourceDir: Option[String] = None,
    targetDir: Option[String] = None)

object CliArgs {

  def parse(args: Seq[String]): Either[String, CliArgs] = {
    var a = CliArgs()
    var i = 0

    def value(flag: String): Either[String, String] =
      if (i + 1 < args.length) { i += 2; Right(args(i - 1)) }
      else Left(s"$flag requires a value")

    def intValue(flag: String): Either[String, Int] =
      value(flag).flatMap(v =>
        v.toIntOption.toRight(s"$flag requires an integer, got '$v'"))

    while (i < args.length) {
      val r: Either[String, Unit] = args(i) match {
        case "--verbose" | "-v" => a = a.copy(verbose = true); i += 1; Right(())
        case "--quiet" | "-q" => a = a.copy(quiet = true); i += 1; Right(())
        case "--drop" | "-d" => a = a.copy(drop = true); i += 1; Right(())
        case "--truncate" => a = a.copy(truncate = true); i += 1; Right(())
        case "--constraints" | "-c" =>
          a = a.copy(constraints = true); i += 1; Right(())
        case "--format" | "-f" => a = a.copy(format = true); i += 1; Right(())
        case "--parallelism" | "-p" =>
          intValue("--parallelism").map(v => a = a.copy(parallelism = v))
        case "--source" => value("--source").map(v => a = a.copy(source = Some(v)))
        case "--target" => value("--target").map(v => a = a.copy(target = Some(v)))
        case "--tables" => value("--tables").map(v => a = a.copy(tables = Some(v)))
        case "--max-packet-bytes" =>
          intValue("--max-packet-bytes").map(v =>
            a = a.copy(maxPacketBytes = Some(v)))
        case "--config" => value("--config").map(v => a = a.copy(configFile = v))
        case "--mappings" =>
          value("--mappings").map(v => a = a.copy(mappingsFile = Some(v)))
        case "--source-dir" =>
          value("--source-dir").map(v => a = a.copy(sourceDir = Some(v)))
        case "--target-dir" =>
          value("--target-dir").map(v => a = a.copy(targetDir = Some(v)))
        case other => Left(s"Unknown argument: $other")
      }
      r match {
        case Left(err) => return Left(err)
        case Right(()) => ()
      }
    }
    if (a.parallelism <= 0) Left("--parallelism must be positive")
    else if (a.maxPacketBytes.exists(_ <= 0))
      Left("--max-packet-bytes must be a positive integer")
    else Right(a)
  }
}

/** Where the resolved configuration says to migrate from/to. */
sealed trait ResolvedMode
/** Live databases from CLI URLs or config.toml (the reference's only
  * mode).
  */
final case class JdbcMode(config: AppConfig) extends ResolvedMode
/** Parquet fixtures in, SQL script out (this environment's boundary;
  * whitelist comes straight from --tables).
  */
final case class FixtureMode(sourceDir: String, targetDir: String,
    tables: Seq[String]) extends ResolvedMode

object ConfigResolver {

  /** The reference's resolution rule (main.rs:141-176): any of
    * --source/--target/--tables switches to CLI mode, where all three
    * are required and config.toml is NOT read — the two sources are
    * never mixed. Otherwise config.toml is required, with
    * --max-packet-bytes overriding its setting. The fixture-dir pair
    * forms a third, offline mode (no counterpart in the reference);
    * --tables doubles as its whitelist rather than forcing CLI mode.
    */
  def resolve(a: CliArgs,
      readFile: String => Option[String]): Either[String, ResolvedMode] = {
    val fixtureMode = a.sourceDir.isDefined || a.targetDir.isDefined
    val cliMode = !fixtureMode &&
      (a.source.isDefined || a.target.isDefined || a.tables.isDefined)

    if (fixtureMode) (a.sourceDir, a.targetDir) match {
      case (Some(s), Some(t)) => Right(FixtureMode(s, t,
        a.tables.toSeq.flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)))
      case _ => Left("--source-dir and --target-dir must be given together")
    }
    else if (cliMode) {
      val missing = Seq("--source" -> a.source, "--target" -> a.target,
        "--tables" -> a.tables).collect { case (n, None) => n }
      if (missing.nonEmpty)
        Left(s"CLI mode requires --source, --target and --tables; " +
          s"missing: ${missing.mkString(", ")}. config.toml is not read " +
          "when CLI connection arguments are used.")
      else AppConfig.fromCli(a.source.get, a.target.get, a.tables.get,
        a.maxPacketBytes).map(JdbcMode.apply)
    }
    else for {
      text <- readFile(a.configFile)
        .toRight(s"Failed to load config file: ${a.configFile} not found")
      cfg <- AppConfig.fromToml(text)
      over <- a.maxPacketBytes match {
        case Some(p) if p <= 0 => Left("max_packet_bytes must be a positive integer")
        case Some(p) => Right(cfg.copy(settings = cfg.settings.copy(maxPacketBytes = p)))
        case None => Right(cfg)
      }
    } yield JdbcMode(over)
  }

  /** JDBC URL for the MSSQL source endpoint of a resolved config. */
  def mssqlJdbcUrl(d: DatabaseConfig): String =
    s"jdbc:sqlserver://${d.host}:${d.port};databaseName=${d.database}"

  /** JDBC URL for the MySQL target endpoint of a resolved config. */
  def mysqlJdbcUrl(d: DatabaseConfig): String =
    s"jdbc:mysql://${d.host}:${d.port}/${d.database}"
}
