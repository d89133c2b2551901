package graft

import org.apache.logging.log4j.Level
import org.apache.logging.log4j.core.config.Configurator

/** Log hygiene for the drive surfaces (Bench/Verify). */
object GraftRuntime {

  /** Drops the `WindowExec: No Partition Defined for Window operation!`
    * warning. The only unpartitioned windows in this codebase are the
    * chunk-OFFSET windows of the two-pass distributed prefix sums
    * (queries.Migration.batchPlan, queries.Corpus.sequencePack): the
    * windowed input there is one row per chunk — O(n/chunkRows), a few
    * hundred rows at any corpus size — so "moving all data to a single
    * partition" is exactly the intended driver-scale step, not a scale
    * problem. Silencing it keeps bench/verify tails greppable for REAL
    * single-partition regressions, which PlanSpec asserts against
    * structurally instead.
    */
  def silenceKnownBenignWarnings(): Unit =
    Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec", Level.ERROR)
}
