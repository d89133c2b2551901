package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column builders shared by the text-analysis / dedup / similarity
  * operators. All pure `org.apache.spark.sql.functions` compositions —
  * codegen-friendly, no UDFs — and each has an exact DuckDB-SQL
  * counterpart so results hash-match the oracle.
  */
object TextFns {

  /** Whitespace tokens of a single-space-separated document. */
  def tokens(text: Column): Column = split(text, " ")

  /** Cosine similarity of two float-array embeddings, computed as a
    * sequential double fold — bit-identical to DuckDB's
    * `list_cosine_similarity(CAST(x AS DOUBLE[]), ...)` (verified
    * empirically), so full-precision doubles can be oracle-compared.
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Sequential double-accumulation dot product of two float arrays —
    * the codegen'd [[FloatVecDot]] expression (bit-identical to the
    * equivalent `aggregate(zip_with(...))` fold and to DuckDB's
    * DOUBLE[] kernel).
    */
  def dot(x: Column, y: Column): Column = FloatVecDot(x, y)

  /** `sqrt(dot(v, v))` — precompute once per vector so pairwise scoring
    * does one fold instead of three; the value (and thus the cosine) is
    * bit-identical to the inline form.
    */
  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine from a pairwise dot and two precomputed norms. */
  def cosineFrom(dotAB: Column, normA: Column, normB: Column): Column =
    dotAB / (normA * normB)

}
