package graft.config

import org.apache.logging.log4j.Level
import org.apache.logging.log4j.core.config.Configurator
import org.apache.logging.log4j.core.config.builder.api.ConfigurationBuilderFactory

/** Application logging, parity with the reference's logger setup
  * (/root/reference/src/main.rs:95-121): -q → WARN beats -v → DEBUG
  * beats the INFO default; chatty dependency modules are pinned to
  * ERROR (the reference pins its database drivers; here the noisy
  * dependency is Spark itself); and every line renders as
  * `HH:MM:SS LEVEL [thread] - message`.
  */
object GraftLog {

  /** main.rs:96-102 level resolution (quiet wins over verbose). */
  def levelFor(verbose: Boolean, quiet: Boolean): Level =
    if (quiet) Level.WARN
    else if (verbose) Level.DEBUG
    else Level.INFO

  /** `{timestamp} {level:<5} [{thread}] - {message}` (main.rs:108-117). */
  val Pattern = "%d{HH:mm:ss} %-5p [%t] - %m%n"

  /** filter_module(..., Error) analogue (main.rs:106-107). */
  val ModuleFilters: Map[String, Level] = Map(
    "org.apache.spark" -> Level.ERROR,
    "org.sparkproject" -> Level.ERROR,
    "org.apache.hadoop" -> Level.ERROR,
    "org.apache.parquet" -> Level.ERROR)

  def init(verbose: Boolean, quiet: Boolean): Unit = {
    val b = ConfigurationBuilderFactory.newConfigurationBuilder()
    b.setStatusLevel(Level.ERROR)
    b.add(b.newAppender("stdout", "Console")
      .add(b.newLayout("PatternLayout").addAttribute("pattern", Pattern)))
    ModuleFilters.foreach { case (module, lvl) =>
      b.add(b.newLogger(module, lvl))
    }
    b.add(b.newRootLogger(levelFor(verbose, quiet))
      .add(b.newAppenderRef("stdout")))
    Configurator.reconfigure(b.build())
  }
}
