package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Validated BPE training budget — the [[graft.dedup]] config
  * convention: every knob checked at construction so an impossible
  * setting fails at definition site, not three stages into a run.
  *
  * `merges` is the number of merge rules the induction learns. Each
  * learned rule needs one sentinel CODE POINT disjoint from anything
  * the vocabulary (or raw text, for apply-over-text) can contain —
  * see [[BpeModel.sentinelOf]] — so the budget is bounded by the
  * sentinel space, loudly.
  */
final case class BpeTrainConfig(merges: Int) {
  require(merges >= 1, s"BpeTrainConfig: merges=$merges must be >= 1")
  require(merges <= BpeModel.MaxMerges,
    s"BpeTrainConfig: merges=$merges exceeds the sentinel space " +
      s"(max ${BpeModel.MaxMerges}) — ranks past the control band " +
      "(31) map into U+E000.. private use and the budget must stay " +
      "inside it")
}

/** One learned merge rule: `rank` (1-based, ascending training
  * order), the fully-expanded letter `lhs`/`rhs`, the sentinel-CODED
  * 2-char pair the rewrite replaces (each char a base letter or an
  * earlier rank's sentinel), and the winning weighted occurrence
  * count. `codedPair` is persisted rather than recomputed on load
  * because expansion strings do not uniquely identify a rule (two
  * rules may expand to the same letters via different splits).
  */
final case class BpeMergeRule(
    rank: Int, codedPair: String, lhs: String, rhs: String, count: Long) {
  require(codedPair.length == 2,
    s"BpeMergeRule rank=$rank: codedPair must be exactly 2 chars")
  def sentinel: Char = BpeModel.sentinelOf(rank)
}

/** A trained BPE tokenizer model — the persistable artifact a
  * tokenizer-training run ships. The house learned-structure contract
  * ([[graft.similarity.IvfIndex]] / PqIndex): build (`train`), `save`
  * to storage, `load` in a later session, apply (`encode`). Save
  * publishes atomically via the path's Hadoop FileSystem rename (the
  * [[graft.dedup.IncrementalDedup.compact]] durability convention) and
  * never overwrites published state.
  *
  * Apply semantics: folding the rules' `replace` chain in rank order
  * over text equals the canonical lowest-rank-first BPE tokenizer on
  * well-formed tables (the theorem in
  * [[graft.queries.TextAnalysis]].bpeTrueCount's scaladoc); no rule
  * contains a space, so merges never cross word boundaries. After
  * encode, every symbol is exactly one char, so token counting is
  * length arithmetic — the property that keeps the 100 TB apply pass
  * a single codegen'd projection.
  */
final class BpeModel(val rules: Vector[BpeMergeRule]) {
  // ranks must be the contiguous training order — the replace chain's
  // soundness argument depends on rank r's pair containing only
  // base letters and sentinels of ranks < r
  rules.zipWithIndex.foreach { case (r, i) =>
    require(r.rank == i + 1,
      s"BpeModel: ranks must be contiguous from 1, got ${r.rank} at $i")
  }

  /** The learned replace chain over a string column, rank order. */
  def encode(c: Column): Column =
    rules.foldLeft(c)((acc, m) =>
      replace(acc, lit(m.codedPair), lit(m.sentinel.toString)))

  /** Encoded token count of a text column: one char per symbol after
    * [[encode]], spaces pass through — count = length minus spaces.
    */
  def tokenCount(textCol: Column): Column =
    (length(encode(textCol)) -
      (length(textCol) - length(replace(textCol, lit(" "))))).cast("long")

  /** Token IDS of a text column — the numbering a trained tokenizer
    * ships: base symbols keep their code point, rank r's merged
    * symbol is `256 + r` (the byte range is reserved for base vocab,
    * merged ids are stable across sessions because rank order is the
    * training order). Spaces separate pre-tokens and emit no id.
    * One `transform∘filter` over the encoded chars — sentinels decode
    * back to ranks by band (control band = rank, U+E000.. = rank−32
    * past it, mirroring [[BpeModel.sentinelOf]]).
    */
  def encodeIds(textCol: Column): Column = {
    val enc = encode(textCol)
    transform(
      // "" must go too: split("", "") is [""] on an empty text and
      // ascii('') = 0 would mint a phantom id 256 for a zero-token doc
      filter(split(enc, ""), c => c =!= " " && c =!= ""),
      c => when(ascii(c) < 32, ascii(c) + 256)
        .when(ascii(c) >= 0xE000, ascii(c) - 0xE000 + 32 + 256)
        .otherwise(ascii(c)))
  }

  /** Rules as a DataFrame in the `ta_bpe_train` output shape. */
  def toDF(spark: SparkSession): DataFrame =
    spark.createDataFrame(rules.map(m =>
        (m.rank, m.codedPair, m.lhs, m.rhs, m.count)))
      .toDF("merge_rank", "coded_pair", "lhs", "rhs", "pair_count")

  /** Persist to `path` (parquet, one file — the model is rule-table
    * sized). Refuses an existing target; lands in a `.bpe-tmp`
    * sibling and publishes via ONE Hadoop FileSystem rename, so a
    * crash mid-save leaves the target absent, never partial.
    */
  def save(spark: SparkSession, path: String): Unit = {
    val target = new org.apache.hadoop.fs.Path(path)
    val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
    require(!fs.exists(target),
      s"BpeModel.save: target $path already exists — a published " +
        "model is immutable; save to a new path")
    val tmp = new org.apache.hadoop.fs.Path(target.getParent,
      target.getName + ".bpe-tmp")
    fs.delete(tmp, true)
    toDF(spark).coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    require(fs.rename(tmp, target),
      s"BpeModel.save: publish rename $tmp -> $target failed")
  }
}

object BpeModel {

  /** Sentinel space: the control band U+0001..U+001F for ranks
    * 1..31 (byte-identical to the historical `chr(rank)` convention,
    * which the unrolled DuckDB training oracle depends on), then the
    * BMP private-use area U+E000.. for ranks past it. Both bands are
    * disjoint from the vocabulary alphabet (`[A-Za-z]+`), from the
    * space separator, and from printable text — and single UTF-16
    * units, so `length`/`substr`/`replace` arithmetic stays
    * code-point-exact on both engines. U+0020 (space) and everything
    * printable is unreachable BY CONSTRUCTION; the loud budget bound
    * lives in [[BpeTrainConfig]].
    */
  val MaxMerges: Int = 31 + 0x1000

  def sentinelOf(rank: Int): Char = {
    require(rank >= 1 && rank <= MaxMerges,
      s"sentinelOf: rank=$rank outside the sentinel space 1..$MaxMerges")
    val c = if (rank <= 31) rank.toChar else (0xE000 + (rank - 32)).toChar
    // belt-and-braces: the guard the sentinel-soundness argument rests
    // on, kept next to the mapping so a future band edit cannot
    // silently reintroduce a collision with the vocab alphabet
    require(!c.isLetterOrDigit && c != ' ' && !Character.isSurrogate(c),
      s"sentinelOf: rank=$rank mapped to a colliding code point " +
        s"U+${c.toInt.toHexString} — sentinel bands must avoid " +
        "letters, digits, space, and surrogates")
    c
  }

  /** BPE vocabulary induction over a document frame — the Sennrich
    * shape restated for a cluster (scale argument in
    * [[graft.queries.TextAnalysis]]'s ta_bpe_train scaladoc): the
    * corpus is touched EXACTLY ONCE (explode + map-side-combinable
    * hash-agg to the (word, frequency) vocabulary); every iteration
    * after that is vocab-sized — two narrow jobs and a one-row argmax
    * collect per rank — so the per-rank cost is flat in corpus size.
    */
  def train(docs: DataFrame, textCol: String,
      cfg: BpeTrainConfig): BpeModel = {
    val vocab = docs
      .select(explode(
        regexp_extract_all(col(textCol), lit("[A-Za-z]+"), lit(0))).as("s"))
      .groupBy(col("s")).agg(count(lit(1)).as("f"))
      .localCheckpoint()
    var state = vocab
    // sentinel char -> its fully-expanded letter string
    val expansion = scala.collection.mutable.Map.empty[Char, String]
    def expand(sym: Char): String = expansion.getOrElse(sym, sym.toString)
    val learned = Vector.newBuilder[BpeMergeRule]
    var r = 1
    var exhausted = false
    while (r <= cfg.merges && !exhausted) {
      val winner = graft.queries.TextAnalysis.pairCounts(state)
        .orderBy(col("c").desc, col("pr").asc)
        .limit(1).collect()
      if (winner.isEmpty) exhausted = true
      else {
        val pr = winner(0).getString(0)
        val sent = sentinelOf(r)
        val lhs = expand(pr.charAt(0))
        val rhs = expand(pr.charAt(1))
        expansion(sent) = lhs + rhs
        learned += BpeMergeRule(r, pr, lhs, rhs, winner(0).getLong(1))
        state = state.withColumn("s",
          replace(col("s"), lit(pr), lit(sent.toString)))
          .localCheckpoint()
        r += 1
      }
    }
    new BpeModel(learned.result())
  }

  /** Load a persisted model; rank contiguity and coded-pair shape are
    * re-validated by the constructors, so a corrupt artifact fails
    * loudly at load, not at first apply.
    */
  def load(spark: SparkSession, path: String): BpeModel =
    new BpeModel(spark.read.parquet(path)
      .collect()
      .map(row => BpeMergeRule(row.getAs[Int]("merge_rank"),
        row.getAs[String]("coded_pair"), row.getAs[String]("lhs"),
        row.getAs[String]("rhs"), row.getAs[Long]("pair_count")))
      .sortBy(_.rank).toVector)
}
