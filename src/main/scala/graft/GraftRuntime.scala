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
  def silenceKnownBenignWarnings(): Unit = {
    Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec", Level.ERROR)
    // "Asked to cache already cached data": the dedup tier's shingle
    // frame is deliberately cached once per (session, dir) and the
    // per-query builders re-request it idempotently — the repeat
    // request is the design, not a leak (Dedup.shingleCache).
    Configurator.setLevel(
      "org.apache.spark.sql.execution.CacheManager", Level.ERROR)
  }
}
