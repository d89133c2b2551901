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
