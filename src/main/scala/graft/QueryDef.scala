package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query in the engine's inventory.
  *
  * @param name    stable identifier (key in `SparkEntry.queries`)
  * @param fn      Spark implementation: (session, sfDir) => result
  * @param oracle  equivalent ANSI SQL for DuckDB over the same parquet
  *                tables (views named region/nation/.../embeddings).
  *                None for ops whose semantics aren't SQL-expressible;
  *                the driver then records a weaker rows-only check.
  *
  * Exactness contract (driver hash-compares values): every computed /
  * aggregated column is aliased to the SAME name on both sides; double
  * aggregations go through decimal casts (order-independent, exact) or
  * deterministic sequential folds, never raw double `sum(...)`.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Cross-engine numeric quantization helpers.
  *
  * `qdec(x, d)` quantizes to d decimals as `floor(x·10^d + 0.5)/10^d`
  * — the SAME IEEE double computation in Spark and DuckDB, so the two
  * engines can never disagree. Engine `round()` is NOT safe for
  * ratios of exact values (int counts, decimal sums): such a rational
  * can terminate exactly on '5' one digit past the target scale (a
  * TRUE tie — found at sf0.1: a scale-9 decimal sum over 28 tokens),
  * and the engines resolve ties differently (Spark rounds the
  * double's exact binary expansion; DuckDB rounds the ×10^d product).
  * Use qdec for any rounded rational-of-exact-values column; engine
  * round() remains fine for transcendental-valued operands, which
  * cannot land exactly on a decimal tie.
  */
object Quant {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.floor

  def qdec(x: Column, d: Int): Column = {
    val p = math.pow(10.0, d.toDouble)
    floor(x * p + 0.5) / p
  }

  /** The oracle-side rendering of the same computation. */
  def qdecSql(x: String, d: Int): String =
    s"floor(($x) * 1e$d + 0.5) / 1e$d"
}

object QueryDef {
  /** All query modules, in inventory order. */
  def all: Seq[QueryDef] =
    queries.Relational.defs ++
      queries.Relational2.defs ++
      queries.Relational3.defs ++
      queries.TextAnalysis.defs ++
      queries.Dedup.defs ++
      queries.Corpus.defs ++
      queries.Similarity.defs ++
      queries.Events.defs ++
      queries.Multimodal.defs ++
      queries.Migration.defs ++
      queries.SqlApi.defs
}
