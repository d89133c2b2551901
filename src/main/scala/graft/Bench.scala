package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.Locale

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one compact JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * The driver captures only a bounded tail of the build log, so a
  * single line carrying all 100+ per-query timings gets head-truncated
  * (BENCH_r03 `parsed: null`). The full per-query map is therefore
  * written to `BENCH_DETAIL.json` in the repo (committed each round),
  * and the printed line carries only per-family totals plus the ten
  * slowest individual queries — small enough that the tail always
  * retains it whole. It is printed as the *final* line so tail capture
  * keeps the end even if the window shrinks further.
  *
  * A warmup action runs first so the session/codegen startup cost
  * isn't billed to whichever query happens to run first; queries then
  * run in name order for stable comparisons across rounds.
  */
object Bench {
  private def js(v: Double): String =
    String.format(Locale.ROOT, "%.3f", Double.box(v)) // locale-proof: '.' decimal separator always

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    Tables(spark, sfDir, "lineitem").count() // warmup

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          // surfaced on stderr — a crashed query must not read as a fast one
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val total = results.map(_._2).sum

    // Full per-query map → repo file (the durable artifact).
    val fullQs = results.map { case (k, v) => s""""$k":${js(v)}""" }
      .mkString("{", ",", "}")
    val fullJson =
      s"""{"metric":"total","value":${js(total)},"unit":"sec","queries":$fullQs,"sf":"$sfDir","cpus":$cpus}"""
    val detailPath = Paths.get("BENCH_DETAIL.json").toAbsolutePath
    Files.write(detailPath, (fullJson + "\n").getBytes(StandardCharsets.UTF_8))

    // Compact line: per-family totals + ten slowest queries. Family =
    // query-name prefix before the first '_' (cp dd ev evs mig mm q*
    // sim sqlapi ta); q01..q34 collapse to "q".
    val famTotals = results
      .groupBy { case (name, _) =>
        val p = name.takeWhile(_ != '_')
        if (p.matches("q\\d+")) "q" else p
      }
      .map { case (fam, rs) => s""""fam_$fam":${js(rs.map(_._2).sum)}""" }
      .toSeq.sorted
    val slowest = results.sortBy(-_._2).take(10)
      .map { case (k, v) => s""""$k":${js(v)}""" }
    val compactQs = (famTotals ++ slowest).mkString("{", ",", "}")
    println(
      s"""{"metric":"total","value":${js(total)},"unit":"sec","queries":$compactQs,"sf":"$sfDir","n_queries":${results.size},"detail":"$detailPath"}""")
    spark.stop()
  }
}
