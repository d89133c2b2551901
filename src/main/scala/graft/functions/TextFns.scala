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

  /** Distinct word k-shingles ("w1 w2 w3") of a token array. Documents
    * shorter than k yield an empty array (guarded: Spark's `sequence`
    * would otherwise count backwards).
    */
  def shingles(ws: Column, k: Int): Column =
    when(size(ws) < k, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(0), size(ws) - k),
        i => concat_ws(" ",
          (0 until k).map(j => element_at(ws, i + j + 1)): _*))))

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

  /** 60-bit document SimHash over distinct tokens.
    *
    * Per token, a 60-bit hash is derived from hex chars 2..16 of
    * `md5(token)` (bit b of the hash = bit (3 - b%4) of hex digit
    * b/4). Each bit position accumulates +1 when set, -1 when clear,
    * over all distinct tokens; the simhash sets bit (59-b) when the
    * sum is positive. Built only from md5/conv/bit arithmetic so the
    * same computation is expressible in DuckDB SQL for the oracle.
    *
    * Expects a (doc_id, tok) exploded relation; returns the grouped
    * (doc_id, simhash) aggregation columns via [[simhashBitValue]].
    */
  def tokenBit(tok: Column, b: Column): Column = {
    val hexChar = substring(md5(tok), 2, 15)
      .substr((b / 4).cast("int") + 1, lit(1))
    val nibble = conv(hexChar, 16, 10).cast("int")
    // (nibble >> (3 - b%4)) & 1, written with div/mod so the shift
    // amount can be a column (functions.shiftright only takes an Int).
    val shifted = floor(nibble.cast("double") /
      pow(lit(2.0), (lit(3) - pmod(b, lit(4))).cast("double"))).cast("int")
    pmod(shifted, lit(2))
  }
}
