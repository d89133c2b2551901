package graft.queries

import graft.{QueryDef, Quant, Tables}
import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Result schema of the true-BPE token count — top-level (not
  * nested/private) so the ExpressionEncoder's generated code can reach
  * the accessors (the [[graft.queries.DecodedMeta]] lesson).
  */
case class BpeTrueRow(
    doc_id: Long, n_true_bpe: Int, n_pre: Int, true_per_pre: Double)

/** Text-analysis operators over the `documents` table: token counting,
  * quality scoring, n-gram language ID, document fingerprinting, and
  * word/bigram frequency — the per-document metrics an LLM-data
  * pipeline computes before filtering/dedup.
  *
  * Scale notes: every query is a narrow map or a single
  * aggregate-after-explode; filters/projections push into the scan.
  * At 100 TB the explode-based frequency queries shuffle only (word,
  * partial-count) pairs thanks to map-side combine.
  *
  * Exactness: ratios are double divisions of integers (deterministic —
  * same operands, same IEEE result in Spark and DuckDB); weighted
  * score formulas use only int-derived doubles and literal
  * coefficients. No order-dependent double accumulation anywhere.
  */
object TextAnalysis {

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Per-document token statistics. */
  private def tokenStats(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "documents")
      .withColumn("ws", TextFns.tokens(col("text")))
      .select(
        col("doc_id"),
        size(col("ws")).as("n_tokens"),
        size(array_distinct(col("ws"))).as("n_distinct"),
        length(col("text")).as("len_chars"),
        // single-space separated => token chars = len - (n-1)
        ((length(col("text")) - size(col("ws")) + 1).cast("double") /
          size(col("ws"))).as("avg_token_len"))
      .orderBy(col("doc_id"))
  }

  /** BPE-style pre-tokenization count: the GPT-2-family pre-tokenizer
    * splits text into letter runs, SINGLE digits and punctuation runs
    * before byte-pair merges. Merges never cross pre-token boundaries,
    * so `len(pre_tokens)` LOWER-bounds the final BPE token count (and
    * the byte count upper-bounds it) — the bracket a token-budget
    * planner multiplies by its per-pre-token expansion factor. Counted
    * with one regexp_extract_all per document — a narrow codegen'd
    * map; the class-only pattern means Java regex (Spark) and RE2
    * (DuckDB) agree. Emits the whitespace count and the bpe/word
    * blow-up ratio alongside, the two numbers a token-budget planner
    * compares. `ta_bpe_true_count` below runs ACTUAL merges; this
    * bracket stays as the cheap path (no per-char loop).
    */
  private def bpeTokenCount(s: SparkSession, dir: String): DataFrame = {
    val pat = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit(pat), lit(0))).as("n_bpe"),
        size(TextFns.tokens(col("text"))).as("n_words"))
      .withColumn("bpe_per_word",
        col("n_bpe").cast("double") / col("n_words"))
      .orderBy(col("doc_id"))
  }

  private val bpeTokenCountSql =
    """SELECT doc_id,
      |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]'))
      |    AS n_bpe,
      |  len(string_split(text, ' ')) AS n_words,
      |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]'))
      |    AS DOUBLE) / len(string_split(text, ' ')) AS bpe_per_word
      |FROM documents ORDER BY doc_id""".stripMargin

  /** TRUE BPE token count — actual byte-pair merges against a fixed
    * merge table, not the pre-token/byte bracket of
    * `ta_bpe_token_count` (which stays as the cheap planning path).
    *
    * The merge table is a deterministic literal (ranked like a trained
    * vocab: each rule's components are base characters or outputs of
    * strictly earlier rules — the well-formedness every trained table
    * has by construction, because a pair can only be learned once its
    * components exist). The Spark side runs the canonical tokenizer
    * algorithm per pre-token: find the lowest-ranked adjacent pair,
    * merge all its occurrences left-to-right, repeat until no ranked
    * pair remains. Merges never cross pre-token boundaries
    * (GPT-2-family semantics, same pre-tokenizer as the bracket
    * query); only letter-run pre-tokens can merge since every rule is
    * letter-only.
    *
    * The DuckDB oracle replays the SAME table as sequential string
    * replacements in rank order, one unique control-char sentinel per
    * merged symbol (the fixture text is printable ASCII, so sentinels
    * cannot collide). Equivalence is a theorem for well-formed tables:
    * merging a pair only creates adjacencies INVOLVING the new symbol,
    * and the new symbol is a component only of later rules — so once
    * rule i is exhausted nothing re-creates its pair, and
    * exhaust-in-rank-order equals lowest-rank-first. replace()'s
    * left-to-right non-overlapping scan matches the tokenizer's
    * occurrence order, spaces (never in any rule) keep cross-pre-token
    * letter pairs apart in the flat string, and the final token count
    * is just length minus the space count because every symbol is one
    * character. Both sides are generated from the one `BpeMerges`
    * literal, so they cannot drift.
    *
    * Scale shape: narrow mapPartitions over documents, O(len · rules)
    * per doc, no shuffle — identical contract to the other per-doc
    * text stages.
    */
  private[queries] val BpeMerges: Vector[(String, String)] = Vector(
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"),
    ("e", "r"), ("o", "n"), ("r", "e"), ("an", "d"))

  /** Sentinel-coded form of a merge-table symbol: base chars are
    * themselves, merged symbols one control char per rank (the fixture
    * text is printable ASCII, so sentinels cannot collide). One char
    * per BPE symbol — the property the replace-chain equivalence and
    * every char-indexed consumer (substring-dedup grams) rely on.
    */
  private[queries] def bpeSentinel(sym: String): String =
    if (sym.length == 1) sym
    else (BpeMerges.indexWhere { case (a, b) => a + b == sym } + 1)
      .toChar.toString

  /** The rank-order replace chain over a Spark column — by the
    * well-formed-table theorem in [[bpeTrueCount]]'s scaladoc this
    * equals the canonical lowest-rank-first BPE tokenizer, with one
    * output char per token (spaces pass through untouched: no rule
    * contains one, which is what keeps cross-pre-token letter pairs
    * apart).
    */
  private[graft] def bpeEncode(c: Column): Column =
    BpeMerges.zipWithIndex.foldLeft(c) { case (acc, ((a, b), i)) =>
      replace(acc, lit(bpeSentinel(a) + bpeSentinel(b)),
        lit((i + 1).toChar.toString))
    }

  /** The SAME chain as DuckDB SQL over `inner` — both sides generate
    * from the one BpeMerges literal, so they cannot drift.
    */
  private[queries] def bpeEncodeSql(inner: String): String = {
    val reprOf: String => String = sym =>
      if (sym.length == 1) s"'$sym'"
      else s"chr(${BpeMerges.indexWhere { case (a, b) => a + b == sym } + 1})"
    BpeMerges.zipWithIndex.foldLeft(inner) {
      case (acc, ((a, b), i)) =>
        s"replace($acc, ${reprOf(a)} || ${reprOf(b)}, chr(${i + 1}))"
    }
  }

  /** Token-ID encoding under the fixed [[BpeMerges]] table — the
    * integer sequence a training job actually consumes (where
    * `ta_bpe_token_count` reports counts, this emits the ids): base
    * symbols keep their code point, rank r's merged symbol is
    * `256 + r` (the byte range reserved for base vocab — the standard
    * byte-level-BPE numbering). One codegen replace chain + one
    * per-char projection; spaces separate pre-tokens and emit no id.
    *
    * Output contract: `token_ids` is the SPACE-JOINED id string, not
    * an ArrayType — r18 proved the driver's pandas canonicalizer
    * cannot sort/hash array cells (`unhashable type: numpy.ndarray`),
    * so arrays joined BINARY/DECIMAL in the [[graft.Verify]] poison
    * envelope and every sequence-valued query renders to a string.
    * Information content is identical (ids are space-free decimals).
    */
  private def bpeTokenIds(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"), bpeEncode(col("text")).as("enc"))
      .select(col("doc_id"),
        transform(
          // also drop "": split("", "") yields [""] on an EMPTY text,
          // which would mint a phantom id (ascii('')=0 → 256) where
          // the oracle's range(1, length(s)+1) is empty — an empty
          // doc must emit zero ids on both engines
          filter(split(col("enc"), ""), c => c =!= " " && c =!= ""),
          c => when(ascii(c) < 32, ascii(c) + 256).otherwise(ascii(c)))
          .as("ids"))
      .select(col("doc_id"),
        array_join(transform(col("ids"), i => i.cast("string")), " ")
          .as("token_ids"),
        size(col("ids")).as("n_tokens"))
      .orderBy(col("doc_id"))

  private val bpeTokenIdsSql = {
    val enc = bpeEncodeSql("text")
    """WITH e AS (SELECT doc_id, """ + enc + """ AS s FROM documents),
      |t AS (SELECT doc_id,
      |  list_transform(
      |    list_filter(
      |      list_transform(range(1, length(s) + 1), i -> s[i:i]),
      |      c -> c <> ' '),
      |    c -> CASE WHEN ascii(c) < 32 THEN ascii(c) + 256
      |         ELSE ascii(c) END) AS ids
      |  FROM e)
      |SELECT doc_id,
      |  array_to_string(list_transform(ids, x -> CAST(x AS VARCHAR)), ' ')
      |    AS token_ids,
      |  CAST(len(ids) AS INTEGER) AS n_tokens
      |FROM t
      |ORDER BY doc_id""".stripMargin
  }

  /** Token IDS from the PERSISTED tokenizer — the full production
    * closure in one operator: train on the corpus, `BpeModel.save`,
    * `load` in-session, and emit each document's id sequence via the
    * LOADED artifact's [[graft.text.BpeModel.encodeIds]]. Where
    * `ta_bpe_saved_compression` proves the persisted model reproduces
    * aggregate counts, this proves it reproduces the EXACT per-token
    * id stream a training job would consume — the strongest artifact
    * round-trip check available. Ids follow the shipped numbering:
    * base symbols keep their code point, learned rank r is `256 + r`
    * (stable across sessions because rank order is training order).
    * The oracle replays the same training unroll ([[bpeTrainCtes]])
    * and id projection in DuckDB, so the learned rules cannot drift
    * between engines. Joined-string output per the r18 envelope rule.
    */
  private def bpeSavedTokenIds(s: SparkSession, dir: String): DataFrame = {
    val model = trainedBpeModel(s, dir)
    val work = java.nio.file.Files.createTempDirectory("graft_bpe_ids")
    val path = work.resolve("model").toString
    model.save(s, path)
    val loaded = graft.text.BpeModel.load(s, path)
    org.apache.commons.io.FileUtils.deleteQuietly(work.toFile)
    Tables(s, dir, "documents")
      .select(col("doc_id"), loaded.encodeIds(col("text")).as("ids"))
      .select(col("doc_id"),
        array_join(transform(col("ids"), i => i.cast("string")), " ")
          .as("token_ids"),
        size(col("ids")).as("n_tokens"))
      .orderBy(col("doc_id"))
  }

  // lazy: references BpeTrainMerges/bpeTrainCtes declared LATER in this
  // object — an eager val here would unroll against the yet-uninitialized
  // (0) merge budget and silently emit a no-op chain
  private lazy val bpeSavedTokenIdsSql: String = {
    val chain = (1 to BpeTrainMerges).foldLeft("text")((acc, r) =>
      s"replace($acc, (SELECT pr FROM b$r), chr($r))")
    s"""${bpeTrainCtes},
       |enc AS (SELECT doc_id, $chain AS s FROM documents),
       |t AS (SELECT doc_id,
       |  list_transform(
       |    list_filter(
       |      list_transform(range(1, length(s) + 1), i -> s[i:i]),
       |      c -> c <> ' '),
       |    c -> CASE WHEN ascii(c) < 32 THEN ascii(c) + 256
       |         ELSE ascii(c) END) AS ids
       |  FROM enc)
       |SELECT doc_id,
       |  array_to_string(list_transform(ids, x -> CAST(x AS VARCHAR)), ' ')
       |    AS token_ids,
       |  CAST(len(ids) AS INTEGER) AS n_tokens
       |FROM t
       |ORDER BY doc_id""".stripMargin
  }

  private def bpeTrueCount(s: SparkSession, dir: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.product[BpeTrueRow]
    val rank: Map[(String, String), Int] =
      BpeMerges.zipWithIndex.map { case (p, i) => p -> i }.toMap
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("text"))
      .mapPartitions { it: Iterator[org.apache.spark.sql.Row] =>
        // canonical BPE over one letter run: lowest-ranked pair first,
        // all occurrences left-to-right, until no ranked pair remains
        def bpeLen(run: String): Int = {
          var syms = run.map(_.toString).toArray
          var done = false
          while (!done && syms.length > 1) {
            var best = Int.MaxValue
            var i = 0
            while (i < syms.length - 1) {
              val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
              if (r < best) best = r
              i += 1
            }
            if (best == Int.MaxValue) done = true
            else {
              val (a, b) = BpeMerges(best)
              val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
              var j = 0
              while (j < syms.length) {
                if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
                  out += a + b; j += 2
                } else { out += syms(j); j += 1 }
              }
              syms = out.toArray
            }
          }
          syms.length
        }
        it.map { r =>
          val id = r.getLong(0)
          val text = r.getString(1)
          var nTrue = 0
          var nPre = 0
          var i = 0
          while (i < text.length) {
            val c = text.charAt(i)
            if (c == ' ') i += 1
            else if (c.isLetter) { // letter run: one pre-token, BPE merges
              val start = i
              while (i < text.length && text.charAt(i).isLetter) i += 1
              nPre += 1
              nTrue += bpeLen(text.substring(start, i))
            } else { nPre += 1; nTrue += 1; i += 1 } // digit/punct: atomic
          }
          BpeTrueRow(id, nTrue, nPre, nTrue.toDouble / nPre)
        }
      }(enc)
      .toDF()
      .orderBy(col("doc_id"))
  }

  // oracle generated from the SAME BpeMerges literal: symbol repr is
  // the symbol itself for base chars, chr(rank+1) for merged symbols
  private val bpeTrueCountSql: String = {
    val replaced = bpeEncodeSql("text")
    s"""WITH r AS (
       |  SELECT doc_id, $replaced AS s,
       |    length(text) - length(replace(text, ' ', '')) AS n_sp,
       |    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]'))
       |      AS n_pre
       |  FROM documents)
       |SELECT doc_id, length(s) - n_sp AS n_true_bpe, n_pre,
       |  CAST(length(s) - n_sp AS DOUBLE) / n_pre AS true_per_pre
       |FROM r ORDER BY doc_id""".stripMargin
  }

  /** Number of merges `ta_bpe_train` learns (oracle SQL is unrolled
    * per rank, so the two sides share this one literal).
    */
  private[queries] val BpeTrainMerges = 8

  /** BPE vocabulary INDUCTION — the training half of the tokenizer
    * story (`ta_bpe_true_count` applies a fixed table; this learns
    * one from the corpus). The classic Sennrich shape restated for a
    * cluster: the corpus is touched EXACTLY ONCE — one explode +
    * hash-agg collapses it to the (word, frequency) vocabulary — and
    * every training iteration after that is vocab-sized, never
    * corpus-sized. Each iteration enumerates the distinct adjacent
    * symbol pairs of every vocab word, weights them by word
    * frequency, takes the global argmax (count desc, pair asc — a
    * one-row collect), and rewrites the vocabulary with the winning
    * pair fused. Words are held sentinel-coded (one char per symbol,
    * rank r's merged symbol = chr(r) — the [[bpeEncode]] convention),
    * so "fuse the pair" is a single codegen'd `replace` and "count
    * its occurrences" is a length difference.
    *
    * Pair-frequency convention (pinned on all three sides — Spark,
    * oracle, and the raw-string recount spec): an occurrence is a
    * NON-OVERLAPPING left-to-right match, i.e. exactly the set of
    * fusions the merge step would perform ("aaa" counts (a,a) once,
    * not twice). This is what `replace` computes natively in both
    * engines, and it keeps the learned count equal to the number of
    * fusions actually applied — the invariant the property spec
    * checks per rank.
    *
    * Scale shape at 100 TB: the corpus-sized shuffle happens once
    * (map-side combinable word counts); the vocabulary (distinct
    * letter-run words — millions, not billions) is localCheckpointed
    * and each of the N iterations runs two vocab-sized narrow jobs
    * plus a one-row collect. The driver holds N winner rows, nothing
    * else.
    */
  /** One learned merge: the 2-char sentinel-CODED pair (what the
    * rewrite replaces), its sentinel, the expanded letter parts, and
    * the winning weighted occurrence count.
    */
  private[queries] final case class LearnedMerge(
      rank: Int, codedPair: String, lhs: String, rhs: String, count: Long)

  /** One training iteration's pair table over a sentinel-coded
    * (s = word, f = frequency) vocabulary: distinct adjacent pairs
    * (2-char windows of the coded string), weighted by the word's
    * NON-overlapping occurrence count (replace-length arithmetic)
    * times its corpus frequency. length >= 2 filter because Spark's
    * sequence(1, 0) counts DOWN rather than emitting empty. Exposed
    * at package level so PlanSpec can pin the map-side partial
    * aggregation and the argmax's TakeOrdered shape.
    */
  private[graft] def pairCounts(state: DataFrame): DataFrame =
    state
      .filter(length(col("s")) >= 2)
      .select(col("s"), col("f"),
        explode(array_distinct(transform(
          sequence(lit(1), length(col("s")) - 1),
          i => col("s").substr(i, lit(2))))).as("pr"))
      .withColumn("occ",
        ((length(col("s")) - length(replace(col("s"), col("pr"))))
          / lit(2)).cast("long"))
      .groupBy(col("pr"))
      .agg(sum(col("occ") * col("f")).as("c"))

  /** Per-(JVM, fixture) memo of the trained model — a pure fixture
    * function (content-stamped key, the srcNamesMemo convention): the
    * training loop is ~3 vocab-sized jobs per rank, and FOUR queries
    * (train, learned/saved compression, saved token ids) each re-ran
    * the identical induction per bench rep. Only training is
    * memoized; the save→load artifact round-trips those queries exist
    * to prove still run per invocation.
    */
  private val bpeModelMemo =
    scala.collection.concurrent.TrieMap.empty[String, graft.text.BpeModel]

  private[queries] def trainedBpeModel(s: SparkSession,
      dir: String): graft.text.BpeModel =
    bpeModelMemo.getOrElseUpdate(
      graft.StagedFixture.key(s"bpe_model_$BpeTrainMerges", dir),
      graft.text.BpeModel.train(Tables(s, dir, "documents"), "text",
        graft.text.BpeTrainConfig(BpeTrainMerges)))

  private def trainBpe(s: SparkSession, dir: String): Vector[LearnedMerge] = {
    // the training loop lives in graft.text.BpeModel (the persistable
    // artifact); ranks <= 31 keep the chr(rank) sentinel the unrolled
    // DuckDB oracle is generated against, so delegation is exact
    trainedBpeModel(s, dir)
      .rules
      .map(m => LearnedMerge(m.rank, m.codedPair, m.lhs, m.rhs, m.count))
  }

  private def bpeTrain(s: SparkSession, dir: String): DataFrame = {
    val rows = trainBpe(s, dir).map(m =>
      (m.rank, m.lhs, m.rhs, m.lhs + m.rhs, m.count))
    s.createDataFrame(rows)
      .toDF("merge_rank", "lhs", "rhs", "merged", "pair_count")
      .orderBy(col("merge_rank"))
  }

  /** Corpus compression under the LEARNED table — train-then-apply in
    * one operator, the readout a tokenizer-training run publishes
    * (how much the induced vocab shrinks the corpus, per source).
    * After [[trainBpe]]'s vocab-sized iterations, ONE more corpus
    * pass folds the learned replace chain over the raw text (sound on
    * full documents by the [[bpeTrueCount]] theorem: no rule contains
    * a space, so merges never cross word boundaries) and counts
    * symbols as length minus spaces — every symbol is one char in the
    * coded string, every non-space char one base symbol before it.
    * Ratio goes through [[Quant.qdec]] (rational of exact counts).
    */
  private def bpeLearnedCompression(s: SparkSession, dir: String): DataFrame = {
    val learned = trainBpe(s, dir)
    val coded = learned.foldLeft(col("text")) { (acc, m) =>
      replace(acc, lit(m.codedPair), lit(m.rank.toChar.toString))
    }
    val nsp = length(col("text")) - length(replace(col("text"), lit(" ")))
    Tables(s, dir, "documents")
      .select(col("source"),
        (length(col("text")) - nsp).cast("long").as("base"),
        (length(coded) - nsp).cast("long").as("after"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("base")).as("base_symbols"),
        sum(col("after")).as("bpe_tokens"))
      .withColumn("compression",
        Quant.qdec(col("bpe_tokens").cast("double") / col("base_symbols"), 9))
      .orderBy(col("source"))
  }

  /** The persistence closure of the tokenizer story: train →
    * `BpeModel.save` → `load` → apply, in one operator — proving the
    * PERSISTED artifact reproduces the inline-trained readout exactly
    * (the oracle is [[bpeLearnedCompressionSql]], byte-identical
    * output contract). This is the shape a production pipeline runs:
    * the tokenizer is trained once, published as an immutable
    * artifact (atomic rename, refuse-overwrite — the IvfIndex/compact
    * convention), and every later corpus pass applies the LOADED
    * table; nothing retrains inline. The model is rule-table sized
    * (KBs), so load is a driver-side read and apply is one codegen'd
    * replace chain over the corpus.
    */
  private def bpeSavedCompression(s: SparkSession, dir: String): DataFrame = {
    val model = trainedBpeModel(s, dir)
    val work = java.nio.file.Files.createTempDirectory("graft_bpe_model")
    val path = work.resolve("model").toString
    model.save(s, path)
    val loaded = graft.text.BpeModel.load(s, path)
    // the artifact is driver-resident after load; the apply plan reads
    // only the corpus, so the run dir can go away immediately
    org.apache.commons.io.FileUtils.deleteQuietly(work.toFile)
    val nsp = length(col("text")) - length(replace(col("text"), lit(" ")))
    Tables(s, dir, "documents")
      .select(col("source"),
        (length(col("text")) - nsp).cast("long").as("base"),
        (length(loaded.encode(col("text"))) - nsp).cast("long").as("after"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("base")).as("base_symbols"),
        sum(col("after")).as("bpe_tokens"))
      .withColumn("compression",
        Quant.qdec(col("bpe_tokens").cast("double") / col("base_symbols"), 9))
      .orderBy(col("source"))
  }

  // Unrolled oracle: one (pairs -> argmax -> rewrite) CTE triple per
  // rank, then per-rank expansion CTEs that decode the winning coded
  // pair back to letters by replaying strictly-earlier expansions in
  // DESCENDING rank order (rank r's pair can only contain sentinels
  // < r, and each substitution introduces only letters). Both sides
  // generate from BpeTrainMerges, so the unroll depth cannot drift.
  /** The training iteration unrolled as DuckDB CTEs (`WITH w0 ...`
    * through rank [[BpeTrainMerges]]'s argmax `b_r` / rewrite `w_r`) —
    * the shared prefix of both BPE-training oracles.
    */
  private def bpeTrainCtes: String = {
    val sb = new StringBuilder
    sb ++= """WITH w0 AS (
      |  SELECT t AS s, count(*) AS f
      |  FROM (SELECT unnest(regexp_extract_all(text, '[A-Za-z]+')) AS t
      |        FROM documents)
      |  GROUP BY 1)""".stripMargin
    for (r <- 1 to BpeTrainMerges) {
      sb ++= s""",
      |p$r AS (
      |  SELECT pr,
      |    CAST(sum(((length(s) - length(replace(s, pr, ''))) // 2) * f)
      |      AS BIGINT) AS c
      |  FROM (SELECT s, f, unnest(list_distinct(list_transform(
      |          range(1, length(s)), i -> s[i:i+1]))) AS pr
      |        FROM w${r - 1} WHERE length(s) >= 2)
      |  GROUP BY 1),
      |b$r AS (SELECT pr, c FROM p$r ORDER BY c DESC, pr LIMIT 1),
      |w$r AS (SELECT replace(s, (SELECT pr FROM b$r), chr($r)) AS s, f
      |        FROM w${r - 1})""".stripMargin
    }
    sb.toString
  }

  private val bpeTrainSql: String = {
    val sb = new StringBuilder
    sb ++= bpeTrainCtes
    for (r <- 1 to BpeTrainMerges) {
      def decode(inner: String): String =
        (r - 1 to 1 by -1).foldLeft(inner)((acc, j) =>
          s"replace($acc, chr($j), (SELECT m FROM m$j))")
      sb ++= s""",
      |m$r AS (SELECT ${decode("pr")} AS m FROM b$r),
      |lr$r AS (SELECT ${decode("pr[1:1]")} AS lhs,
      |  ${decode("pr[2:2]")} AS rhs FROM b$r)""".stripMargin
    }
    sb ++= "\n"
    sb ++= (1 to BpeTrainMerges).map(r =>
      s"""SELECT $r AS merge_rank, lhs, rhs, lhs || rhs AS merged,
         |  (SELECT c FROM b$r) AS pair_count FROM lr$r""".stripMargin)
      .mkString("\nUNION ALL\n")
    sb ++= "\nORDER BY merge_rank"
    sb.toString
  }

  // the training CTEs, then ONE pass over documents folding the
  // learned replace chain (ranks ascending) over the raw text
  private val bpeLearnedCompressionSql: String = {
    val chain = (1 to BpeTrainMerges).foldLeft("text")((acc, r) =>
      s"replace($acc, (SELECT pr FROM b$r), chr($r))")
    s"""${bpeTrainCtes},
       |enc AS (
       |  SELECT source, $chain AS s,
       |    length(text) - length(replace(text, ' ', '')) AS nsp,
       |    length(replace(text, ' ', '')) AS nbase
       |  FROM documents)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(nbase) AS BIGINT) AS base_symbols,
       |  CAST(sum(length(s) - nsp) AS BIGINT) AS bpe_tokens,
       |  ${Quant.qdecSql(
          "CAST(sum(length(s) - nsp) AS DOUBLE) / sum(nbase)", 9)}
       |    AS compression
       |FROM enc GROUP BY source ORDER BY source""".stripMargin
  }

  /** Heavy hitters via the bounded Misra–Gries summary
    * ([[graft.operators.MisraGriesAgg]]) — the at-scale alternative to
    * `ta_word_topk`'s exact groupBy when the KEY SPACE itself is
    * corpus-sized (urls, shingles, n-grams): k counters per partition,
    * k entries per partition across the shuffle, guarantee that every
    * item above n/(k+1) frequency is present within n/(k+1) error.
    * The fixture vocabulary (31 words) sits under k = 64, so the
    * summary is in its EXACT regime (no decrement can ever fire — map
    * side or merge) and the oracle pins every counter to the true
    * count; the eviction-regime guarantee is asserted by property
    * spec on skewed synthetic streams (the CMS verdict split).
    */
  private def heavyHittersMg(s: SparkSession, dir: String): DataFrame = {
    val words = Tables(s, dir, "documents")
      .select(explode(TextFns.tokens(col("text"))).as("word"))
    val entries = words
      .agg(graft.operators.MisraGriesAgg(col("word"), 64).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e").getField("item").as("word"),
        col("e").getField("est").as("est"))
    words.groupBy(col("word")).agg(count(lit(1)).as("n_true"))
      .join(entries, Seq("word"), "left")
      .select(col("word"), col("n_true"), col("est"),
        (col("est").isNotNull && col("est") === col("n_true"))
          .as("exact_in_sketch"))
      .orderBy(col("word"))
  }

  private val heavyHittersMgSql =
    """SELECT w AS word, count(*) AS n_true, count(*) AS est,
      |  true AS exact_in_sketch
      |FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      |GROUP BY w ORDER BY word""".stripMargin

  /** Readability scoring — Flesch-Kincaid grade level with the
    * standard vowel-group syllable heuristic (a maximal [aeiou]+ run
    * approximates one syllable): grade = 0.39·(words/sentences) +
    * 11.8·(syllables/words) − 15.59. Sentences count [.!?]+ runs,
    * clamped to ≥ 1 so punctuation-free documents score instead of
    * dividing by zero. The quality-filter companion: corpus curation
    * uses grade bands to segment elementary vs technical text. One
    * narrow codegen projection (class-only regexes — Java and RE2
    * agree); the ratios are int-derived doubles with literal
    * coefficients, rounded to 9 like every derived score.
    */
  private def readability(s: SparkSession, dir: String): DataFrame = {
    val words = size(TextFns.tokens(col("text")))
    val sentences = size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0)))
    val syllables =
      size(regexp_extract_all(col("text"), lit("[aeiouAEIOU]+"), lit(0)))
    Tables(s, dir, "documents")
      .select(col("doc_id"), words.as("n_words"),
        sentences.as("n_sentences"), syllables.as("n_syllables"))
      .withColumn("fk_grade", Quant.qdec( // rational of counts: can TIE
        lit(0.39) * (col("n_words").cast("double") /
          greatest(col("n_sentences"), lit(1))) +
        lit(11.8) * (col("n_syllables").cast("double") / col("n_words")) -
        lit(15.59), 9))
      .orderBy(col("doc_id"))
  }

  private val readabilitySql =
    """SELECT doc_id,
      |  len(string_split(text, ' ')) AS n_words,
      |  len(regexp_extract_all(text, '[.!?]+')) AS n_sentences,
      |  len(regexp_extract_all(text, '[aeiouAEIOU]+')) AS n_syllables,
      |  floor((0.39 * (CAST(len(string_split(text, ' ')) AS DOUBLE)
      |      / greatest(len(regexp_extract_all(text, '[.!?]+')), 1))
      |    + 11.8 * (CAST(len(regexp_extract_all(text, '[aeiouAEIOU]+'))
      |      AS DOUBLE) / len(string_split(text, ' ')))
      |    - 15.59) * 1e9 + 0.5) / 1e9 AS fk_grade
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Rolling-hash winnowing fingerprint (the MOSS scheme): a Horner
    * rolling hash over character 8-grams mod 1e9+7, then the minimum
    * hash of every 4-hash window — the classic guarantee that any
    * shared substring of length >= k + w - 1 = 11 chars produces at
    * least one shared fingerprint between two documents. Emitted as
    * per-document fingerprint-set summaries (count / sum / min of the
    * distinct selected hashes), which pin the whole set without a row
    * per fingerprint.
    *
    * All arithmetic is exact BIGINT mod — order-independent and
    * engine-identical. Scale shape: one explode to (doc, gram
    * position), the k-char fold is O(k) per row with only attribute
    * references inside the lambda (no re-inlined derived columns — the
    * mm_phash lesson), the winnow window partitions BY DOC (tiny,
    * parallel across documents), and the final agg is one hash
    * aggregate. At 100 TB a production variant would hash byte
    * shingles with the same plan.
    */
  /** The winnowing hash/select pipeline behind `ta_winnow_fp`: one
    * (doc, pos, selected-min-hash) row per full window. (A pairing
    * query over shared fingerprints was considered and rejected: at
    * k = 8 chars the fixture's hottest fingerprint is shared by
    * thousands of documents — char-8-grams are boilerplate in this
    * vocabulary — so fingerprint pairing has no exact-oracle-safe
    * skew cap here; MOSS-style matching belongs at larger k.) The k-gram hash stream comes from the codegen
    * [[graft.functions.KGramHashes]] rolling pass (one O(n) fold per
    * document) instead of the original explode + O(k)-per-position
    * aggregate HOF — same values bit-for-bit, no interpreted lambda.
    */
  private def winnowed(s: SparkSession, dir: String): DataFrame = {
    val k = 8
    val w = 4
    val M = 1000000007L
    val B = 257L
    val wMin = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, w - 1)
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        (length(col("text")) - k + 1).as("npos"),
        posexplode(graft.functions.KGramHashes(col("text"), k, B, M))
          .as(Seq("pos0", "khash")))
      .filter(col("npos") >= w) // docs too short for one full window drop out
      .withColumn("pos", col("pos0") + 1)
      .withColumn("wmin", min(col("khash")).over(wMin))
      .filter(col("pos") <= col("npos") - (w - 1)) // full windows only
      .select(col("doc_id"), col("pos"), col("wmin"))
  }

  private def winnowFp(s: SparkSession, dir: String): DataFrame = {
    winnowed(s, dir)
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("wmin")).as("n_fp"),
        sum_distinct(col("wmin")).as("fp_sum"),
        min(col("wmin")).as("fp_min"))
      .orderBy(col("doc_id"))
  }

  // fixture docs are <= 577 chars; the 2000-wide position spine is
  // filtered by npos (same cross-join idiom as the chunking oracles)
  private val winnowFpSql =
    """WITH base AS (
      |  SELECT doc_id, text, length(text) - 7 AS npos FROM documents
      |  WHERE length(text) - 7 >= 4),
      |hashes AS (
      |  SELECT doc_id, npos, p AS pos,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(range(p, p + 8), j ->
      |        CAST(ascii(substring(text, CAST(j AS INT), 1)) AS BIGINT))),
      |      (acc, c) -> (acc * 257 + c) % 1000000007) AS khash
      |  FROM base, (SELECT unnest(range(1, 2001)) AS p)
      |  WHERE p <= npos),
      |winnowed AS (
      |  SELECT doc_id, npos, pos,
      |    min(khash) OVER (PARTITION BY doc_id ORDER BY pos
      |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
      |  FROM hashes)
      |SELECT doc_id,
      |  count(DISTINCT wmin) AS n_fp,
      |  CAST(sum(DISTINCT wmin) AS BIGINT) AS fp_sum,
      |  min(wmin) AS fp_min
      |FROM winnowed WHERE pos <= npos - 3
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  private val tokenStatsSql =
    """SELECT doc_id,
      |  len(string_split(text, ' ')) AS n_tokens,
      |  len(list_distinct(string_split(text, ' '))) AS n_distinct,
      |  length(text) AS len_chars,
      |  CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
      |    / len(string_split(text, ' ')) AS avg_token_len
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Vocabulary-growth curve (Heaps' law): distinct-word count as a
    * function of corpus prefix size, at ten doc-id deciles, with the
    * local Heaps exponent β between adjacent checkpoints (V ∝ T^β —
    * the curve a tokenizer-budget or dedup-debt analysis reads first;
    * β falling toward 0 says the corpus is exhausting its vocabulary,
    * β near 1 says it's still discovering it).
    *
    * Scale shape — the reason this is one pass and not ten COUNT
    * DISTINCTs over growing prefixes: a word contributes to every
    * checkpoint after its FIRST occurrence, so one word-keyed
    * aggregate (min doc_id, map-side combinable) reduces the corpus
    * to vocabulary-sized rows, each assigned its first-occurrence
    * decile by integer arithmetic; the curve is then a cumulative sum
    * over TEN rows. Token mass aggregates the same way. The only
    * corpus-sized shuffle is the word aggregate; everything after is
    * decile-sized. Deciles key on doc_id against the one-row count
    * aggregate (a broadcast), so the assignment is a narrow
    * projection.
    */
  private def heapsLaw(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    val n = docs.agg(count(lit(1)).as("n"))
    // integer decile: doc_id d -> d*10 div n + 1 (both engines use
    // integral division — no double-rounding hazard at a boundary)
    val wordDec = docs
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(min(col("doc_id")).as("fd"))
      .crossJoin(broadcast(n))
      .select((expr("fd * 10 div n") + 1).cast("int").as("dec"))
      .groupBy(col("dec")).agg(count(lit(1)).as("new_words"))
    val docDec = docs
      .select(col("doc_id"),
        size(TextFns.tokens(col("text"))).cast("long").as("nt"))
      .crossJoin(broadcast(n))
      .select((expr("doc_id * 10 div n") + 1).cast("int").as("dec"),
        col("nt"))
      .groupBy(col("dec"))
      .agg(count(lit(1)).as("new_docs"), sum(col("nt")).as("new_tokens"))
    val wCum = Window.orderBy(col("dec"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = docDec.join(wordDec, Seq("dec"), "left")
      .withColumn("new_words", coalesce(col("new_words"), lit(0L)))
      .select(col("dec"),
        sum(col("new_docs")).over(wCum).as("n_docs"),
        sum(col("new_tokens")).over(wCum).as("n_tokens"),
        sum(col("new_words")).over(wCum).as("vocab_size"))
    // beta through Quant.qdec like every other derived score — beta
    // CAN land on an exact decimal (vocab ratio a perfect power of
    // the token ratio), where engine round() tie-breaks diverge
    cum
      .withColumn("beta", Quant.qdec(
        log(col("vocab_size").cast("double") /
          lag(col("vocab_size"), 1).over(Window.orderBy(col("dec")))) /
          log(col("n_tokens").cast("double") /
            lag(col("n_tokens"), 1).over(Window.orderBy(col("dec")))), 9))
      .orderBy(col("dec"))
  }

  private val heapsLawSql =
    """WITH n AS (SELECT count(*) AS n FROM documents),
      |word_dec AS (
      |  SELECT CAST(fd * 10 // n + 1 AS INTEGER) AS dec,
      |    count(*) AS new_words
      |  FROM (SELECT w, min(doc_id) AS fd
      |        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
      |              FROM documents)
      |        GROUP BY w), n
      |  GROUP BY 1),
      |doc_dec AS (
      |  SELECT CAST(doc_id * 10 // n + 1 AS INTEGER) AS dec,
      |    count(*) AS new_docs,
      |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS new_tokens
      |  FROM documents, n GROUP BY 1),
      |cum AS (
      |  SELECT d.dec,
      |    CAST(sum(new_docs) OVER w AS BIGINT) AS n_docs,
      |    CAST(sum(new_tokens) OVER w AS BIGINT) AS n_tokens,
      |    CAST(sum(coalesce(new_words, 0)) OVER w AS BIGINT) AS vocab_size
      |  FROM doc_dec d LEFT JOIN word_dec USING (dec)
      |  WINDOW w AS (ORDER BY d.dec
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT dec, n_docs, n_tokens, vocab_size,
      |  floor((ln(CAST(vocab_size AS DOUBLE)
      |      / lag(vocab_size) OVER (ORDER BY dec))
      |    / ln(CAST(n_tokens AS DOUBLE)
      |      / lag(n_tokens) OVER (ORDER BY dec))) * 1e9 + 0.5) / 1e9
      |    AS beta
      |FROM cum ORDER BY dec""".stripMargin

  /** Heuristic quality score in [0,1]: length saturation + stopword
    * density + lexical diversity, the standard pre-training quality
    * triplet.
    */
  private def quality(s: SparkSession, dir: String): DataFrame = {
    val stopArr = array(stopwords.map(lit): _*)
    Tables(s, dir, "documents")
      .withColumn("ws", TextFns.tokens(col("text")))
      .withColumn("n_stop",
        size(filter(col("ws"), w => array_contains(stopArr, w))))
      .select(
        col("doc_id"),
        col("n_stop"),
        Quant.qdec( // rational of counts: can TIE (Quant)
          lit(0.5) * least(size(col("ws")).cast("double") / 100.0, lit(1.0)) +
            lit(0.3) * (col("n_stop").cast("double") / size(col("ws"))) +
            lit(0.2) * (size(array_distinct(col("ws"))).cast("double") /
              size(col("ws"))),
          6).as("quality"))
      .orderBy(col("doc_id"))
  }

  private val qualitySql =
    s"""SELECT doc_id, n_stop,
       |  floor((0.5 * least(CAST(n_tok AS DOUBLE) / 100.0, 1.0)
       |      + 0.3 * (CAST(n_stop AS DOUBLE) / n_tok)
       |      + 0.2 * (CAST(n_dis AS DOUBLE) / n_tok)) * 1e6 + 0.5) / 1e6
       |    AS quality
       |FROM (
       |  SELECT doc_id,
       |    len(list_filter(string_split(text, ' '),
       |        w -> w IN (${stopwords.map(w => s"'$w'").mkString(", ")}))) AS n_stop,
       |    len(string_split(text, ' ')) AS n_tok,
       |    len(list_distinct(string_split(text, ' '))) AS n_dis
       |  FROM documents)
       |ORDER BY doc_id""".stripMargin

  /** Gopher-style RULE filter (Rae et al. 2021, table A1 restated for
    * the fixture's vocabulary): where `ta_quality_score` blends
    * signals into one scalar, production corpus curation mostly runs
    * HARD per-rule gates and keeps the per-rule verdicts for ablation
    * (which rule cut what). Four of the standard rules, each a
    * narrow projection over one tokenization:
    *   - word count inside [40, 120] (the fixture-scaled version of
    *     Gopher's [50, 100k]);
    *   - mean word length inside [3, 10];
    *   - at least 2 DISTINCT stopwords present (Gopher's
    *     "2 of the 8 common English words" rule);
    *   - >= 80% of words contain an alphabetic character.
    * `keep` is the conjunction. One pass, no shuffle except the
    * output sort; every rational goes through Quant.qdec before a
    * threshold compare so the gate decisions are order- and
    * engine-exact.
    */
  private def gopherRules(s: SparkSession, dir: String): DataFrame = {
    val stopArr = array(stopwords.map(lit): _*)
    Tables(s, dir, "documents")
      .withColumn("ws", TextFns.tokens(col("text")))
      .withColumn("n_words", size(col("ws")).cast("long"))
      .withColumn("mean_word_len",
        Quant.qdec((length(col("text")) - col("n_words") + 1)
          .cast("double") / col("n_words"), 9))
      .withColumn("n_stop_distinct",
        size(filter(array_distinct(col("ws")),
          w => array_contains(stopArr, w))).cast("long"))
      .withColumn("alpha_frac",
        Quant.qdec(size(filter(col("ws"),
            w => w.rlike("[A-Za-z]"))).cast("double") / col("n_words"), 9))
      .withColumn("pass_word_count", col("n_words").between(40L, 120L))
      .withColumn("pass_mean_word_len",
        col("mean_word_len").between(3.0, 10.0))
      .withColumn("pass_stopwords", col("n_stop_distinct") >= 2L)
      .withColumn("pass_alpha", col("alpha_frac") >= 0.8)
      .select(col("doc_id"), col("n_words"), col("mean_word_len"),
        col("n_stop_distinct"), col("alpha_frac"),
        col("pass_word_count"), col("pass_mean_word_len"),
        col("pass_stopwords"), col("pass_alpha"),
        (col("pass_word_count") && col("pass_mean_word_len") &&
          col("pass_stopwords") && col("pass_alpha")).as("keep"))
      .orderBy(col("doc_id"))
  }

  private val gopherRulesSql =
    s"""WITH base AS (
       |  SELECT doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
       |    floor((CAST(length(text) AS DOUBLE)
       |        - len(string_split(text, ' ')) + 1)
       |      / len(string_split(text, ' ')) * 1e9 + 0.5) / 1e9
       |      AS mean_word_len,
       |    CAST(len(list_filter(list_distinct(string_split(text, ' ')),
       |      w -> w IN (${stopwords.map(w => s"'$w'").mkString(", ")})))
       |      AS BIGINT) AS n_stop_distinct,
       |    floor(CAST(len(list_filter(string_split(text, ' '),
       |        w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
       |      / len(string_split(text, ' ')) * 1e9 + 0.5) / 1e9
       |      AS alpha_frac
       |  FROM documents),
       |ruled AS (
       |  SELECT *,
       |    n_words BETWEEN 40 AND 120 AS pass_word_count,
       |    mean_word_len BETWEEN 3.0 AND 10.0 AS pass_mean_word_len,
       |    n_stop_distinct >= 2 AS pass_stopwords,
       |    alpha_frac >= 0.8 AS pass_alpha
       |  FROM base)
       |SELECT doc_id, n_words, mean_word_len, n_stop_distinct,
       |  alpha_frac, pass_word_count, pass_mean_word_len,
       |  pass_stopwords, pass_alpha,
       |  pass_word_count AND pass_mean_word_len AND pass_stopwords
       |    AND pass_alpha AS keep
       |FROM ruled ORDER BY doc_id""".stripMargin

  /** Stopword-profile language ID (n-gram heuristic): score each
    * candidate language by its marker-token hits; argmax with a fixed
    * tie-break order. The fixture vocabulary is shared across langs,
    * so accuracy is incidental — the operator's plumbing (per-language
    * scoring + deterministic argmax) is what's exercised.
    */
  /** Shared scoring projection for `ta_lang_id` and `ta_lang_id_eval`:
    * doc_id, the labeled lang, per-language marker scores, and the
    * argmax prediction — one narrow pass, no join.
    */
  private def langScored(s: SparkSession, dir: String): DataFrame = {
    val markers = Seq(
      "en" -> Seq("the", "a", "and", "of"),
      "de" -> Seq("der", "die", "und", "das"),
      "es" -> Seq("el", "la", "los", "que"),
      "fr" -> Seq("le", "la", "les", "des"),
      "zh" -> Seq("de", "shi", "le", "zai"))
    val base = Tables(s, dir, "documents")
      .withColumn("ws", TextFns.tokens(col("text")))
    val scored = markers.foldLeft(base) { case (df, (lang, ms)) =>
      val arr = array(ms.map(lit): _*)
      df.withColumn(s"s_$lang",
        size(filter(col("ws"), w => array_contains(arr, w))))
    }
    val best = markers.map(_._1).map(l => col(s"s_$l"))
      .reduce((a, b) => greatest(a, b))
    val pred = markers.map(_._1).foldRight(lit("und")) {
      case (lang, els) => when(col(s"s_$lang") === best, lit(lang)).otherwise(els)
    }
    // foldRight gives priority to the FIRST language in marker order on
    // ties (en > de > es > fr > zh), matching the oracle's CASE chain.
    scored.select(col("doc_id"), col("lang"), col("s_en"), col("s_de"),
      col("s_es"), col("s_fr"), col("s_zh"), pred.as("lang_pred"))
  }

  private def langId(s: SparkSession, dir: String): DataFrame = {
    langScored(s, dir)
      .select(col("doc_id"), col("s_en"), col("s_de"), col("s_es"),
        col("s_fr"), col("s_zh"), col("lang_pred"),
        (col("lang_pred") === col("lang")).as("is_correct"))
      .orderBy(col("doc_id"))
  }

  /** Oracle mirror of [[langScored]] — doc_id, lang, scores, argmax. */
  private val langScoredSql = {
    val markers = Seq(
      "en" -> Seq("the", "a", "and", "of"),
      "de" -> Seq("der", "die", "und", "das"),
      "es" -> Seq("el", "la", "los", "que"),
      "fr" -> Seq("le", "la", "les", "des"),
      "zh" -> Seq("de", "shi", "le", "zai"))
    val scoreCols = markers.map { case (l, ms) =>
      s"len(list_filter(ws, w -> w IN (${ms.map(m => s"'$m'").mkString(", ")}))) AS s_$l"
    }.mkString(",\n    ")
    val best = "greatest(s_en, s_de, s_es, s_fr, s_zh)"
    val caseChain = markers.map(_._1)
      .map(l => s"WHEN s_$l = $best THEN '$l'").mkString(" ")
    s"""SELECT doc_id, lang, s_en, s_de, s_es, s_fr, s_zh,
       |  CASE $caseChain ELSE 'und' END AS lang_pred
       |FROM (
       |  SELECT doc_id, lang,
       |    $scoreCols
       |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents))""".stripMargin
  }

  private val langIdSql =
    s"""SELECT doc_id, s_en, s_de, s_es, s_fr, s_zh, lang_pred,
       |  lang_pred = lang AS is_correct
       |FROM ($langScoredSql)
       |ORDER BY doc_id""".stripMargin

  /** Language-ID evaluation — the confusion matrix + per-cell recall
    * and precision shares of the n-gram classifier against the
    * labeled `lang` column. The model-selection companion to
    * `ta_lang_id`: a curation pipeline promotes a classifier only
    * after reading exactly this table (which languages bleed into
    * which, and whether the 'und' fallback is absorbing real docs).
    *
    * Scale shape: rides the classifier's narrow scoring projection
    * (no re-scan — the prediction and the label come off the same
    * row), one aggregate to ≤ langs² cells, then windows over that
    * tiny frame. Shares are double divisions of exact longs.
    */
  private def langIdEval(s: SparkSession, dir: String): DataFrame = {
    val cells = langScored(s, dir)
      .groupBy(col("lang"), col("lang_pred"))
      .agg(count(lit(1)).as("n"))
    val wTrue = Window.partitionBy(col("lang"))
    val wPred = Window.partitionBy(col("lang_pred"))
    cells
      .select(col("lang"), col("lang_pred"), col("n"),
        (col("n").cast("double") / sum(col("n")).over(wTrue))
          .as("recall_share"),
        (col("n").cast("double") / sum(col("n")).over(wPred))
          .as("precision_share"))
      .orderBy(col("lang"), col("lang_pred"))
  }

  private val langIdEvalSql =
    s"""WITH c AS (
       |  SELECT lang, lang_pred, count(*) AS n
       |  FROM ($langScoredSql)
       |  GROUP BY lang, lang_pred)
       |SELECT lang, lang_pred, n,
       |  CAST(n AS DOUBLE)
       |    / CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT)
       |    AS recall_share,
       |  CAST(n AS DOUBLE)
       |    / CAST(sum(n) OVER (PARTITION BY lang_pred) AS BIGINT)
       |    AS precision_share
       |FROM c ORDER BY lang, lang_pred""".stripMargin

  /** Content-hash fingerprints: raw and whitespace-normalized md5 +
    * sha256 — the exact-dedup keys.
    */
  private def fingerprint(s: SparkSession, dir: String): DataFrame = {
    val norm = regexp_replace(lower(col("text")), "\\s+", " ")
    Tables(s, dir, "documents")
      .select(
        col("doc_id"),
        md5(col("text").cast("binary")).as("md5_fp"),
        md5(norm.cast("binary")).as("md5_norm_fp"),
        sha2(col("text").cast("binary"), 256).as("sha256_fp"))
      .orderBy(col("doc_id"))
  }

  private val fingerprintSql =
    """SELECT doc_id,
      |  md5(text) AS md5_fp,
      |  md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS md5_norm_fp,
      |  sha256(text) AS sha256_fp
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Corpus-level word frequency, top 20. Map-side combine keeps the
    * shuffle tiny at scale; the explode never materializes row copies
    * thanks to whole-stage codegen.
    */
  private def wordTopK(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "documents")
      .select(explode(TextFns.tokens(col("text"))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(20)
  }

  private val wordTopKSql =
    """SELECT word, count(*) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |GROUP BY word ORDER BY n DESC, word LIMIT 20""".stripMargin

  /** Corpus-level bigram frequency, top 15. */
  private def bigramTopK(s: SparkSession, dir: String): DataFrame = {
    val ws = TextFns.tokens(col("text"))
    Tables(s, dir, "documents")
      .withColumn("ws", ws)
      .filter(size(col("ws")) >= 2)
      .select(explode(transform(
        sequence(lit(0), size(col("ws")) - 2),
        i => concat_ws(" ", element_at(col("ws"), i + 1),
          element_at(col("ws"), i + 2)))).as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(15)
  }

  private val bigramTopKSql =
    """SELECT bigram, count(*) AS n
      |FROM (
      |  SELECT unnest(list_transform(range(1, len(ws)),
      |                i -> ws[i] || ' ' || ws[i+1])) AS bigram
      |  FROM (SELECT string_split(text, ' ') AS ws FROM documents)
      |  WHERE len(ws) >= 2)
      |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 15""".stripMargin

  /** Corpus-trained bigram language-model score — the perplexity-proxy
    * quality filter: every document scored by the mean log-probability
    * of its bigrams under P(w2|w1) = c(w1,w2) / c(w1·), with the
    * counts trained on the corpus itself. Fluent (in-distribution)
    * text scores high; shuffled or out-of-domain text scores low.
    * Each per-bigram log rounds to 9 decimals and accumulates in
    * decimal, so the document score is order-independent under any
    * partitioning despite the transcendental (ln is 1-ulp
    * engine-dependent; the row-level round absorbs it). The count
    * tables grow with corpus vocabulary, NOT with a fixed dimension
    * size, so their joins are left to the optimizer (broadcast at
    * fixture scale, shuffled hash join once the model outgrows the
    * broadcast threshold — never forced).
    */
  /** Per-(session, dir) cached per-document bigram instances
    * (doc_id, w1, w2) — the relation FOUR bigram-LM queries
    * (ta_bigram_lm_score, ta_lm_perplexity, ta_perplexity_filter,
    * ta_kneser_ney) each rebuilt per invocation and then consumed
    * 3-4 times inside one plan (per-doc counts, bigram-type counts,
    * unigram counts): the corpus tokenize+explode ran up to four
    * times per action. One cached build serves every consumer — the
    * cachedShingles convention (§5 multi-consumer pinning).
    */
  private val docBigramsCache = new graft.SessionCache[DataFrame]

  private def cachedDocBigrams(s: SparkSession, dir: String): DataFrame =
    docBigramsCache.getOrElseUpdate(s, dir)(
      Tables(s, dir, "documents")
        .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(2, size(toks)), i -> " +
            "struct(element_at(toks, i - 1) AS w1, " +
            "element_at(toks, i) AS w2))")).as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
        .cache())

  private def bigramLmScore(s: SparkSession, dir: String): DataFrame = {
    val bi = cachedDocBigrams(s, dir)
    val c12 = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val c1 = bi.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    bi.join(c12, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .withColumn("logp",
        round(log(col("c12").cast("double") / col("c1")), 9)
          .cast(DecimalType(12, 9)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        Quant.qdec(sum(col("logp")).cast("double") / count(lit(1)), 9)
          .as("avg_logp")) // qdec: decimal/int ratio can TIE (Quant)
      .orderBy(col("doc_id"))
  }

  private val bigramLmScoreSql =
    """WITH bi AS (
      |  SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
      |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |    LATERAL (SELECT unnest(range(1, len(ws))) AS i)
      |  WHERE len(ws) >= 2),
      |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY 1, 2),
      |c1 AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY 1)
      |SELECT doc_id, count(*) AS n_bigrams,
      |  floor(CAST(sum(CAST(round(ln(CAST(c12 AS DOUBLE) / c1), 9)
      |    AS DECIMAL(12,9))) AS DOUBLE) / count(*) * 1e9 + 0.5) / 1e9
      |    AS avg_logp
      |FROM bi JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Sketch-based cardinality: HLL++ distinct-word estimates per
    * source vs the exact count. The oracle hashes the estimate's
    * tolerance verdict (see below), not the raw sketch; the
    * accompanying spec additionally asserts the estimate lands within
    * rsd of exact. At 100 TB the sketch is the only viable plan:
    * fixed memory per group, no distinct shuffle.
    */
  private def vocabHll(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "documents")
      .select(col("source"), explode(TextFns.tokens(col("text"))).as("word"))
      .groupBy(col("source"))
      .agg(
        approx_count_distinct(col("word"), rsd = 0.02).as("approx_vocab"),
        countDistinct(col("word")).as("exact_vocab"),
        count(lit(1)).as("n_words"))
      // The raw HLL estimate cannot be oracle'd (DuckDB's sketch
      // differs by design), so the output hashes the estimate's 3-sigma
      // bound check instead: a deterministic boolean the oracle can
      // predict (TRUE), which still fails the gate if the sketch ever
      // drifts outside its advertised rsd.
      .select(col("source"), col("exact_vocab"), col("n_words"),
        (abs(col("approx_vocab") - col("exact_vocab")) <=
          lit(0.06) * col("exact_vocab")).as("within_tolerance"))
      .orderBy(col("source"))
  }

  private val vocabHllSql =
    """SELECT source, count(DISTINCT word) AS exact_vocab,
      |  count(*) AS n_words, TRUE AS within_tolerance
      |FROM (SELECT source, unnest(string_split(text, ' ')) AS word
      |      FROM documents)
      |GROUP BY source ORDER BY source""".stripMargin

  /** HLL sketch MERGE bound — the property that makes cardinality
    * sketches work on a 1000-executor cluster: sketch each shard
    * independently, union the sketches, and the merged estimate must
    * stay inside the sketch's advertised error against the exact
    * count. Here the shards are the 20 sources (per-partition at
    * scale); `merged_within_tol` gates the merged-union estimate and
    * `direct_within_tol` the single-pass estimate, both vs the exact
    * distinct count at 5% (lgK 12 → rsd ≈ 1.6%, so 5% ≈ 3σ). The
    * oracle predicts both booleans TRUE — a sketch or merge
    * regression reds the gate.
    *
    * Two empirical findings are pinned here deliberately: (1) the
    * sketch runs over 3-GRAM shingles, not words — the fixture's word
    * vocabulary is 31, where a sparse-mode sketch estimates exactly
    * and the gate proves nothing; grams are tens of thousands, real
    * HLL mode. (2) estimate-IDENTITY between merged and direct was
    * FALSIFIED at gram scale: Datasketches' directly-built sketch
    * carries the HIP (historical inverse probability) estimator,
    * whose update-order-dependent state a union cannot preserve, so
    * the union falls back to the composite estimator and the two
    * estimates differ slightly (16,245 vs exact 16,223 at sf0.01) —
    * BOTH inside the bound. The merge contract that actually holds in
    * production is the error bound, not bit-identity, and that is
    * what this row asserts.
    */
  private def vocabHllMerge(s: SparkSession, dir: String): DataFrame = {
    val grams = Tables(s, dir, "documents")
      .select(col("source"),
        explode(graft.functions.WordShingles(col("text"), 3)).as("w"))
    val merged = grams.groupBy(col("source"))
      .agg(hll_sketch_agg(col("w"), lit(12)).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
        .as("est_merged"))
    val direct = grams.agg(
      hll_sketch_estimate(hll_sketch_agg(col("w"), lit(12)))
        .as("est_direct"),
      countDistinct(col("w")).as("exact_vocab"))
    direct.crossJoin(merged)
      .select(col("exact_vocab"),
        (abs(col("est_merged") - col("exact_vocab")) <=
          lit(0.05) * col("exact_vocab")).as("merged_within_tol"),
        (abs(col("est_direct") - col("exact_vocab")) <=
          lit(0.05) * col("exact_vocab")).as("direct_within_tol"))
  }

  /** Self-gated-boolean oracle (the q32 / ta_vocab_hll convention):
    * the DuckDB side contributes ONE independently-computed value —
    * `exact_vocab` — and asserts the tolerance booleans as literal
    * TRUE. That is not a two-engine check of the bound (no second
    * engine can reproduce a sketch estimate bit-for-bit); it is a
    * hash-gate: Spark must COMPUTE both booleans true against its own
    * estimates or the row reds. The error bound itself is pinned
    * independently by the ScalaTest spec; the oracle's role here is
    * the exact count plus the gate wiring.
    */
  private val vocabHllMergeSql =
    """SELECT count(DISTINCT g) AS exact_vocab,
      |  TRUE AS merged_within_tol, TRUE AS direct_within_tol
      |FROM (
      |  SELECT unnest(list_distinct(list_transform(range(1, len(ws) - 1),
      |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS g
      |  FROM (SELECT string_split(text, ' ') AS ws FROM documents)
      |  WHERE len(ws) >= 3)""".stripMargin

  /** TF-IDF per (doc, term): tf = term count / doc length, idf =
    * ln(N / df). All inputs are exact integers, and JVM Math.log is
    * bit-identical to DuckDB's ln (verified), so the scores
    * hash-match. The df side is a tiny aggregate joined broadcast; at
    * corpus scale the (doc, word) explode partial-aggregates before
    * shuffling.
    */
  private def tfidf(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    val words = docs
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("word"))
    val tf = words.groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf_count"))
    val docLen = words.groupBy(col("doc_id")).agg(count(lit(1)).as("doc_len"))
    val df = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val total = docs.agg(count(lit(1)).as("n_docs"))
    // no broadcast hint on df: it is VOCABULARY-sized (unbounded at
    // 100 TB — a forced broadcast OOMs there). AQE picks the build
    // side from runtime sizes: at fixture scale it still broadcasts,
    // at corpus scale the word-keyed shuffle join is the right plan.
    tf.join(docLen, "doc_id")
      .join(df, "word")
      .crossJoin(broadcast(total))
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), col("word"), col("tf_count"), col("df"),
        // Spark's log is StrictMath-based, DuckDB's ln is libm — they
        // differ by 1 ulp on some inputs, so the score is rounded to
        // 9 decimals on both sides (ulp ~1e-18 vs step 1e-9).
        round((col("tf_count").cast("double") / col("doc_len")) *
          log(col("n_docs").cast("double") / col("df")), 9).as("tfidf"))
      .orderBy(col("doc_id"), col("word"))
  }

  /** Feature-HASHING document vectorizer (the hashing trick,
    * Weinberger et al. 2009) — the step that turns the text tier into
    * the embedding tier without a trained model or a vocabulary
    * table: each word hashes to one of 64 dimensions (salted md5) with
    * a ±1 sign hash (the collision-unbiasing trick), and the
    * dimension's weight is the signed sum of the word's tf·idf mass.
    * Emitted sparse, one row per non-zero (doc, dim) — the layout an
    * ANN index ingests directly.
    *
    * Scale shape: identical to [[tfidf]] (word-keyed aggregates,
    * vocabulary-sized df table deliberately NOT broadcast-hinted) plus
    * one (doc, dim)-keyed aggregate whose key space is docs × 64.
    * Exactness: each term rounds its transcendental (ln) to 9
    * decimals then accumulates in DECIMAL — order-independent — and
    * the final value goes through Quant.qdec.
    */
  private def hashingVectorizer(s: SparkSession, dir: String): DataFrame = {
    val dims = 64
    val docs = Tables(s, dir, "documents")
    val words = docs
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("word"))
    val tf = words.groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf_count"))
    val docLen = words.groupBy(col("doc_id")).agg(count(lit(1)).as("doc_len"))
    val df = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val total = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(docLen, "doc_id")
      .join(df, "word")
      .crossJoin(broadcast(total))
      .withColumn("dim",
        (conv(substring(md5(col("word").cast("binary")), 1, 6), 16, 10)
          .cast("long") % dims).cast("int"))
      .withColumn("sign",
        conv(substring(md5(col("word").cast("binary")), 7, 1), 16, 10)
          .cast("long") % 2 * 2 - 1)
      .withColumn("term",
        (col("sign") * round((col("tf_count").cast("double") / col("doc_len")) *
          log(col("n_docs").cast("double") / col("df")), 9))
          .cast(DecimalType(28, 9)))
      .groupBy(col("doc_id"), col("dim"))
      .agg(sum(col("term")).as("t"), count(lit(1)).as("n_words"))
      .select(col("doc_id"), col("dim"),
        Quant.qdec(col("t").cast("double"), 9).as("weight"),
        col("n_words"))
      .filter(col("doc_id") < 100)
      .orderBy(col("doc_id"), col("dim"))
  }

  private val hashingVectorizerSql =
    """WITH words AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
      |tf AS (SELECT doc_id, word, count(*) AS tf_count FROM words GROUP BY 1, 2),
      |doclen AS (SELECT doc_id, count(*) AS doc_len FROM words GROUP BY 1),
      |df AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
      |total AS (SELECT count(*) AS n_docs FROM documents),
      |terms AS (
      |  SELECT doc_id,
      |    CAST(CAST(('0x' || substring(md5(word), 1, 6)) AS BIGINT) % 64
      |      AS INTEGER) AS dim,
      |    CAST((CAST(('0x' || substring(md5(word), 7, 1)) AS BIGINT) % 2
      |        * 2 - 1)
      |      * round((CAST(tf_count AS DOUBLE) / doc_len)
      |        * ln(CAST(n_docs AS DOUBLE) / df), 9) AS DECIMAL(28,9))
      |      AS term
      |  FROM tf JOIN doclen USING (doc_id) JOIN df USING (word), total)
      |SELECT doc_id, dim,
      |  floor(CAST(sum(term) AS DOUBLE) * 1e9 + 0.5) / 1e9 AS weight,
      |  count(*) AS n_words
      |FROM terms WHERE doc_id < 100
      |GROUP BY doc_id, dim ORDER BY doc_id, dim""".stripMargin

  /** CLASS-based TF-IDF topic terms (c-TF-IDF, the BERTopic cluster
    * labeling step — Grootendorst 2022): documents grouped by their
    * embedding-table `label` (the fixture's vec_id == doc_id
    * alignment is the cross-modal join key), each class scored for
    * its top-5 distinguishing words by
    * tf_c(w) · ln(1 + avg_class_len / f_w) — term frequency within
    * the class against the word's corpus-wide mass. The readout that
    * turns an opaque cluster id (kmeans, SNN, SemDeDup) into a
    * human-auditable topic label.
    *
    * Scale shape: identical to [[tfidf]] — one explode into
    * map-side-combined (label, word) counts; the corpus-wide `f_w`
    * table is VOCABULARY-sized and deliberately not broadcast-hinted
    * (AQE picks the build side; at 100 TB the word-keyed shuffle join
    * is the right plan). Classes are bounded, so the per-class
    * rollup and the top-5 window ride label-keyed partitions.
    * Exactness: the score has a transcendental (ln) factor, so
    * engine round(·, 9) is tie-safe; RANKING uses the rounded value
    * (raw doubles could differ by the ln ulp across engines and flip
    * an argmax), with word as the deterministic tiebreak.
    */
  private def classTfidf(s: SparkSession, dir: String): DataFrame = {
    val lab = Tables(s, dir, "embeddings")
      .select(col("vec_id").as("doc_id"), col("label"))
    val words = Tables(s, dir, "documents")
      .join(lab, "doc_id")
      .select(col("label"), explode(TextFns.tokens(col("text"))).as("word"))
    val cw = words.groupBy(col("label"), col("word"))
      .agg(count(lit(1)).as("cnt"))
    val cl = words.groupBy(col("label")).agg(count(lit(1)).as("class_len"))
    val ft = cw.groupBy(col("word")).agg(sum(col("cnt")).as("f_t"))
    val a = cl.agg((sum(col("class_len")).cast("double") / count(lit(1)))
      .as("avg_len"))
    val scored = cw.join(cl, "label").join(ft, "word")
      .crossJoin(broadcast(a))
      .withColumn("ctfidf",
        round((col("cnt").cast("double") / col("class_len")) *
          log(lit(1.0) + col("avg_len") / col("f_t")), 9))
    val w = Window.partitionBy(col("label"))
      .orderBy(col("ctfidf").desc, col("word"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("label"), col("rnk"), col("word"), col("cnt"),
        col("ctfidf"))
      .orderBy(col("label"), col("rnk"))
  }

  private val classTfidfSql =
    """WITH lab AS (SELECT vec_id AS doc_id, label FROM embeddings),
      |words AS (
      |  SELECT l.label, unnest(string_split(d.text, ' ')) AS word
      |  FROM documents d JOIN lab l USING (doc_id)),
      |cw AS (SELECT label, word, count(*) AS cnt FROM words GROUP BY 1, 2),
      |cl AS (SELECT label, count(*) AS class_len FROM words GROUP BY 1),
      |ft AS (SELECT word, CAST(sum(cnt) AS BIGINT) AS f_t
      |  FROM cw GROUP BY 1),
      |a AS (SELECT CAST(sum(class_len) AS DOUBLE) / count(*) AS avg_len
      |  FROM cl),
      |scored AS (
      |  SELECT cw.label, cw.word, cw.cnt,
      |    round((CAST(cw.cnt AS DOUBLE) / cl.class_len)
      |      * ln(1.0 + a.avg_len / ft.f_t), 9) AS ctfidf
      |  FROM cw JOIN cl USING (label) JOIN ft USING (word), a)
      |SELECT label, rnk, word, cnt, ctfidf FROM (
      |  SELECT *, row_number() OVER (PARTITION BY label
      |    ORDER BY ctfidf DESC, word) AS rnk FROM scored)
      |WHERE rnk <= 5 ORDER BY label, rnk""".stripMargin

  private val tfidfSql =
    """WITH words AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
      |tf AS (SELECT doc_id, word, count(*) AS tf_count FROM words GROUP BY 1, 2),
      |doclen AS (SELECT doc_id, count(*) AS doc_len FROM words GROUP BY 1),
      |df AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
      |total AS (SELECT count(*) AS n_docs FROM documents)
      |SELECT doc_id, word, tf_count, df,
      |  round((CAST(tf_count AS DOUBLE) / doc_len)
      |    * ln(CAST(n_docs AS DOUBLE) / df), 9) AS tfidf
      |FROM tf JOIN doclen USING (doc_id) JOIN df USING (word), total
      |WHERE doc_id < 100
      |ORDER BY doc_id, word""".stripMargin

  /** Document-level word co-occurrence: top pairs by the number of
    * documents containing both.
    */
  private def cooccurrence(s: SparkSession, dir: String): DataFrame = {
    val dw = Tables(s, dir, "documents")
      .select(col("doc_id"),
        explode(array_distinct(TextFns.tokens(col("text")))).as("w"))
    val a = dw.select(col("doc_id"), col("w").as("w1"))
    val b = dw.select(col("doc_id"), col("w").as("w2"))
    a.join(b, Seq("doc_id"))
      .filter(col("w1") < col("w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("n_docs").desc, col("w1"), col("w2"))
      .limit(25)
  }

  private val cooccurrenceSql =
    """WITH dw AS (
      |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w
      |  FROM documents)
      |SELECT a.w AS w1, b.w AS w2, count(*) AS n_docs
      |FROM dw a JOIN dw b ON a.doc_id = b.doc_id AND a.w < b.w
      |GROUP BY 1, 2 ORDER BY n_docs DESC, w1, w2 LIMIT 25""".stripMargin

  /** PMI-scored bigram associations — the phrase-mining signal data
    * curation uses to find collocations worth preserving as units:
    * PMI(w1,w2) = ln(P(w1,w2) / (P(w1)·P(w2))) over document-level
    * co-occurrence, support-thresholded (≥ 5 docs) so rare
    * coincidences don't dominate. Exactness: the PMI argument is one
    * exact BIGINT ratio (n_pair·N / df1·df2) evaluated as a single
    * double division, then ln — both engines' only transcendental —
    * rounded to 9 decimals, which also makes the top-15 ORDER
    * deterministic (ties break on the words). Scale shape: the pair
    * aggregate partial-combines before its shuffle, dfs broadcast to
    * the pair stream, top-15 via TakeOrdered — no global sort.
    */
  private def pmiBigrams(s: SparkSession, dir: String): DataFrame = {
    val dw = Tables(s, dir, "documents")
      .select(col("doc_id"),
        explode(array_distinct(TextFns.tokens(col("text")))).as("w"))
    val nDocs = Tables(s, dir, "documents").count()
    val pairs = dw.select(col("doc_id"), col("w").as("w1"))
      .join(dw.select(col("doc_id"), col("w").as("w2")), Seq("doc_id"))
      .filter(col("w1") < col("w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= 5)
    val dfs = dw.groupBy(col("w")).agg(count(lit(1)).as("dfc"))
    // no broadcast hint on dfs: it is VOCABULARY-sized (the round-10
    // sf1* point already shows it growing Heaps-law-shaped; at 100 TB
    // a forced broadcast OOMs). Post-HAVING `pairs` is the small side
    // here — AQE broadcasts IT at runtime, which beats the old hint
    // even at fixture scale, and degrades to a word-keyed shuffle
    // join when both sides are corpus-sized.
    pairs
      .join(dfs.select(col("w").as("w1"), col("dfc").as("df1")), Seq("w1"))
      .join(dfs.select(col("w").as("w2"), col("dfc").as("df2")), Seq("w2"))
      .select(col("w1"), col("w2"), col("n_pair"),
        round(log((col("n_pair") * lit(nDocs)).cast("double") /
          (col("df1") * col("df2")).cast("double")), 9).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(15)
  }

  private val pmiBigramsSql =
    """WITH dw AS (
      |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w
      |  FROM documents),
      |n AS (SELECT count(*) AS nd FROM documents),
      |pairs AS (
      |  SELECT a.w AS w1, b.w AS w2, count(*) AS n_pair
      |  FROM dw a JOIN dw b ON a.doc_id = b.doc_id AND a.w < b.w
      |  GROUP BY 1, 2 HAVING count(*) >= 5),
      |dfs AS (SELECT w, count(*) AS dfc FROM dw GROUP BY 1)
      |SELECT w1, w2, n_pair,
      |  round(ln(CAST(n_pair * nd AS DOUBLE) /
      |           CAST(d1.dfc * d2.dfc AS DOUBLE)), 9) AS pmi
      |FROM pairs
      |  JOIN dfs d1 ON pairs.w1 = d1.w
      |  JOIN dfs d2 ON pairs.w2 = d2.w
      |  CROSS JOIN n
      |ORDER BY pmi DESC, w1, w2 LIMIT 15""".stripMargin

  /** Self-trained bigram-LM negative log-likelihood — the
    * CCNet/Gopher-style perplexity quality filter, the signal every
    * production corpus pipeline ranks documents by before training: a
    * bigram model p(w2|w1) = c(w1,w2)/c(w1·) is estimated from the
    * corpus itself (so every bigram is observed — no smoothing or OOV
    * path needed), and each document scores its mean negative
    * log-likelihood in nats/bigram. Low nll = templated/predictable
    * text, high = unusual; both tails are what the filter cuts.
    * Perplexity = e^nll, left to the reader so no second
    * transcendental enters the gate.
    *
    * Scale shape: the bigram stream partial-aggregates per (doc,
    * bigram) before anything shuffles; the LM tables are
    * VOCABULARY²-bounded and deliberately NOT broadcast-hinted (same
    * rationale as pmi/tfidf — AQE broadcasts them at fixture scale
    * and falls back to word-keyed shuffle joins at corpus scale).
    * Exactness: each term rounds ln to 9 decimals then accumulates in
    * DECIMAL (order-independent), and the final rational
    * (decimal-sum / count) goes through Quant.qdec — round() on it
    * could tie.
    */
  private def lmPerplexity(s: SparkSession, dir: String): DataFrame = {
    val bi = cachedDocBigrams(s, dir)
    val docBi = bi.groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("cd"))
    val lm2 = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val lm1 = bi.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    docBi
      .join(lm2, Seq("w1", "w2"))
      .join(lm1, Seq("w1"))
      .withColumn("term",
        round(-col("cd") * log(col("c2").cast("double") / col("c1")), 9)
          .cast(DecimalType(18, 9)))
      .groupBy(col("doc_id"))
      .agg(sum(col("cd")).as("nb"), sum(col("term")).as("t"))
      .select(col("doc_id"), col("nb").cast("int").as("n_bigrams"),
        Quant.qdec(col("t").cast("double") / col("nb"), 9).as("nll"))
      .orderBy(col("doc_id"))
  }

  /** The perplexity QUALITY GATE `ta_lm_perplexity` scores for — the
    * CCNet placement: docs whose LM nll falls OUTSIDE a band are cut
    * (low tail = templated/boilerplate, high tail = noise/garble) and
    * the readout is the per-source cut report a curation run ships
    * (which sources lose how much to which tail). Per-doc nll is the
    * EXACT `ta_lm_perplexity` pipeline (per-term rounded ln into
    * DECIMAL accumulation, final rational through Quant.qdec), so the
    * band compare sees bit-identical scores on both engines; the band
    * [3.35, 3.43] is fixture-scaled (production would set it from a
    * held-out percentile sweep). The verdict join is doc-keyed —
    * both sides doc-count-sized, co-partitioned by the join — and the
    * rollup carries one row per source.
    */
  private def perplexityFilter(s: SparkSession, dir: String): DataFrame = {
    val (lo, hi) = (3.35, 3.43)
    val bi = cachedDocBigrams(s, dir)
    val docBi = bi.groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("cd"))
    val lm2 = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val lm1 = bi.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val nll = docBi
      .join(lm2, Seq("w1", "w2"))
      .join(lm1, Seq("w1"))
      .withColumn("term",
        round(-col("cd") * log(col("c2").cast("double") / col("c1")), 9)
          .cast(DecimalType(18, 9)))
      .groupBy(col("doc_id"))
      .agg(sum(col("cd")).as("nb"), sum(col("term")).as("t"))
      .select(col("doc_id"),
        Quant.qdec(col("t").cast("double") / col("nb"), 9).as("nll"))
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"))
      .join(nll, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("nll") < lo, 1L).otherwise(0L)).as("n_cut_low"),
        sum(when(col("nll") > hi, 1L).otherwise(0L)).as("n_cut_high"),
        sum(when(col("nll").between(lo, hi), 1L).otherwise(0L))
          .as("n_kept"))
      .withColumn("kept_frac",
        Quant.qdec(col("n_kept").cast("double") / col("n_docs"), 9))
      .orderBy(col("source"))
  }

  private val perplexityFilterSql =
    """WITH bi AS (
      |  SELECT doc_id, ws[i - 1] AS w1, ws[i] AS w2
      |  FROM (SELECT doc_id, ws, unnest(range(2, len(ws) + 1)) AS i
      |        FROM (SELECT doc_id, string_split(text, ' ') AS ws
      |              FROM documents)
      |        WHERE len(ws) >= 2)),
      |docbi AS (
      |  SELECT doc_id, w1, w2, count(*) AS cd FROM bi GROUP BY 1, 2, 3),
      |lm2 AS (SELECT w1, w2, count(*) AS c2 FROM bi GROUP BY 1, 2),
      |lm1 AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY 1),
      |nll AS (
      |  SELECT doc_id,
      |    floor(CAST(sum(CAST(round(
      |        -cd * ln(CAST(c2 AS DOUBLE) / c1), 9) AS DECIMAL(18,9)))
      |      AS DOUBLE) / sum(cd) * 1e9 + 0.5) / 1e9 AS nll
      |  FROM docbi JOIN lm2 USING (w1, w2) JOIN lm1 USING (w1)
      |  GROUP BY doc_id)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN nll < 3.35 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_cut_low,
      |  CAST(sum(CASE WHEN nll > 3.43 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_cut_high,
      |  CAST(sum(CASE WHEN nll BETWEEN 3.35 AND 3.43 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_kept,
      |  floor(CAST(sum(CASE WHEN nll BETWEEN 3.35 AND 3.43 THEN 1 ELSE 0
      |      END) AS DOUBLE) / count(*) * 1e9 + 0.5) / 1e9 AS kept_frac
      |FROM documents JOIN nll USING (doc_id)
      |GROUP BY source ORDER BY source""".stripMargin

  private val lmPerplexitySql =
    """WITH bi AS (
      |  SELECT doc_id, ws[i - 1] AS w1, ws[i] AS w2
      |  FROM (SELECT doc_id, ws, unnest(range(2, len(ws) + 1)) AS i
      |        FROM (SELECT doc_id, string_split(text, ' ') AS ws
      |              FROM documents)
      |        WHERE len(ws) >= 2)),
      |docbi AS (
      |  SELECT doc_id, w1, w2, count(*) AS cd FROM bi GROUP BY 1, 2, 3),
      |lm2 AS (SELECT w1, w2, count(*) AS c2 FROM bi GROUP BY 1, 2),
      |lm1 AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY 1)
      |SELECT doc_id, CAST(sum(cd) AS INTEGER) AS n_bigrams,
      |  floor(CAST(sum(CAST(round(
      |      -cd * ln(CAST(c2 AS DOUBLE) / c1), 9) AS DECIMAL(18,9)))
      |    AS DOUBLE) / sum(cd) * 1e9 + 0.5) / 1e9 AS nll
      |FROM docbi JOIN lm2 USING (w1, w2) JOIN lm1 USING (w1)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Interpolated Kneser–Ney bigram perplexity — the canonical n-gram
    * smoothing (`ta_lm_perplexity` above is the raw-MLE form; real
    * CCNet-style quality LMs discount): each bigram's probability is
    *   P(w2|w1) = (max(c(w1,w2) − D, 0) + D·N1+(w1,·)·P_cont(w2))
    *                / c(w1·)
    * with P_cont(w2) = N1+(·,w2) / N1+(·,·) and the standard D = 0.75
    * absolute discount — the mass removed from seen bigrams is
    * redistributed by how many distinct HISTORIES a word follows
    * (continuation counts), not by raw frequency. Self-trained on the
    * corpus, so every doc bigram has c2 ≥ 1 and P > 0.
    *
    * Exactness: the probability is double arithmetic over exact
    * counts with IDENTICAL operand order on both sides (left-assoc
    * products, one division each); ln is the only transcendental and
    * follows the house pattern — per-term round(·, 9) into DECIMAL
    * accumulation (order-free), final ratio through Quant.qdec.
    *
    * Scale shape: everything aggregates before joining — the joins
    * are keyed on bigram/unigram TYPES (vocabulary-bounded, not
    * corpus-bounded) except docBi (per-doc distinct bigrams, the same
    * mass ta_lm_perplexity carries); the N1+(·,·) scalar broadcasts.
    */
  private def kneserNey(s: SparkSession, dir: String): DataFrame = {
    val D = 0.75
    val bi = cachedDocBigrams(s, dir)
    val docBi = bi.groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("cd"))
    val lm2 = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val lm1 = bi.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val n1f = lm2.groupBy(col("w1")).agg(count(lit(1)).as("nf"))
    val n1b = lm2.groupBy(col("w2")).agg(count(lit(1)).as("nb"))
    val nall = lm2.agg(count(lit(1)).as("nall"))
    val p = (greatest(col("c2") - lit(D), lit(0.0)) +
      lit(D) * col("nf") * (col("nb").cast("double") / col("nall"))) /
      col("c1")
    docBi
      .join(lm2, Seq("w1", "w2"))
      .join(lm1, Seq("w1"))
      .join(n1f, Seq("w1"))
      .join(n1b, Seq("w2"))
      .crossJoin(broadcast(nall))
      .withColumn("term",
        round(-col("cd") * log(p), 9).cast(DecimalType(18, 9)))
      .groupBy(col("doc_id"))
      .agg(sum(col("cd")).as("nbt"), sum(col("term")).as("t"))
      .select(col("doc_id"), col("nbt").cast("int").as("n_bigrams"),
        Quant.qdec(col("t").cast("double") / col("nbt"), 9).as("nll_kn"))
      .orderBy(col("doc_id"))
  }

  private val kneserNeySql =
    """WITH bi AS (
      |  SELECT doc_id, ws[i - 1] AS w1, ws[i] AS w2
      |  FROM (SELECT doc_id, ws, unnest(range(2, len(ws) + 1)) AS i
      |        FROM (SELECT doc_id, string_split(text, ' ') AS ws
      |              FROM documents)
      |        WHERE len(ws) >= 2)),
      |docbi AS (
      |  SELECT doc_id, w1, w2, count(*) AS cd FROM bi GROUP BY 1, 2, 3),
      |lm2 AS (SELECT w1, w2, count(*) AS c2 FROM bi GROUP BY 1, 2),
      |lm1 AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY 1),
      |n1f AS (SELECT w1, count(*) AS nf FROM lm2 GROUP BY 1),
      |n1b AS (SELECT w2, count(*) AS nb FROM lm2 GROUP BY 1),
      |nall AS (SELECT count(*) AS nall FROM lm2)
      |SELECT doc_id, CAST(sum(cd) AS INTEGER) AS n_bigrams,
      |  floor(CAST(sum(CAST(round(-cd * ln(
      |      (greatest(c2 - 0.75, 0.0) + 0.75 * nf *
      |        (CAST(nb AS DOUBLE) / nall)) / c1), 9) AS DECIMAL(18,9)))
      |    AS DOUBLE) / sum(cd) * 1e9 + 0.5) / 1e9 AS nll_kn
      |FROM docbi
      |  JOIN lm2 USING (w1, w2) JOIN lm1 USING (w1)
      |  JOIN n1f USING (w1) JOIN n1b USING (w2), nall
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Per-document unigram Shannon entropy — the information-density
    * quality signal (low entropy = repetitive/templated text).
    * Computed LINEARLY: one (doc, word) count aggregate, then each
    * distinct word contributes -p·ln(p) rounded to 9 decimals (ln is
    * the usual 1-ulp transcendental) and the terms accumulate in
    * DECIMAL — order-independent under any partitioning. An earlier
    * form folded a per-word `filter().size` lambda over the token
    * array, which is O(tokens²) in DOCUMENT length — fine on 100-word
    * fixtures, 10¹⁰ ops on a 100k-token document; the aggregate shape
    * is O(tokens) and partial-aggregates before its one shuffle.
    */
  private def tokenEntropy(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables(s, dir, "documents")
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
    val lens = counts.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("n_distinct"))
    val p = col("c").cast("double") / col("n")
    counts.join(lens, "doc_id")
      .withColumn("term",
        round(-p * log(p), 9).cast(DecimalType(12, 9)))
      .groupBy(col("doc_id"), col("n"), col("n_distinct"))
      .agg(round(sum(col("term")).cast("double"), 9).as("entropy"))
      .select(col("doc_id"), col("n").cast("int").as("n_tokens"),
        col("n_distinct").cast("int").as("n_distinct"), col("entropy"))
      .orderBy(col("doc_id"))
  }

  private val tokenEntropySql =
    """WITH counts AS (
      |  SELECT doc_id, w, count(*) AS c
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
      |        FROM documents)
      |  GROUP BY 1, 2),
      |lens AS (
      |  SELECT doc_id, sum(c) AS n, count(*) AS n_distinct
      |  FROM counts GROUP BY 1)
      |SELECT doc_id, CAST(n AS INTEGER) AS n_tokens,
      |  CAST(n_distinct AS INTEGER) AS n_distinct,
      |  round(CAST(sum(CAST(round(
      |    -(CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n), 9)
      |    AS DECIMAL(12,9))) AS DOUBLE), 9) AS entropy
      |FROM counts JOIN lens USING (doc_id)
      |GROUP BY doc_id, n, n_distinct ORDER BY doc_id""".stripMargin

  /** PII scrub — the redaction pass every training corpus runs before
    * anything else sees the text. Emails, NANP-style phone numbers and
    * IPv4 addresses are counted and replaced with typed placeholder
    * tokens in one narrow projection (three codegen'd regexp passes,
    * no shuffle; at 100 TB this is a pure map stage that pipelines
    * into whatever runs next).
    *
    * The fixture corpus is synthetic word-soup with no PII, so a
    * deterministic contact footer is first grafted onto every third
    * document (same convention as the multimodal tier, which
    * synthesizes its blobs deterministically from doc_id:
    * Multimodal.scala:65) — the regex machinery and counts are real,
    * and the oracle reproduces the injection exactly. Patterns use
    * only character classes and bounded repetition, the subset where
    * Java regex (Spark) and RE2 (DuckDB) agree.
    */
  private val emailPat = "[A-Za-z0-9._]+@[A-Za-z0-9]+\\.[a-z][a-z]+"
  private val phonePat = "[0-9]{3}-[0-9]{4}"
  private val ipPat = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  private def piiRedact(s: SparkSession, dir: String): DataFrame = {
    val footer = concat(
      lit(" contact u"), col("doc_id"),
      lit("@mail"), pmod(col("doc_id"), lit(7)),
      lit(".com call 555-0"), (pmod(col("doc_id"), lit(100)) + 100),
      lit(" from 10."), pmod(col("doc_id"), lit(250)),
      lit(".0."), pmod(col("doc_id"), lit(200)))
    val raw = when(pmod(col("doc_id"), lit(3)) === 0,
      concat(col("text"), footer)).otherwise(col("text"))
    Tables(s, dir, "documents")
      .withColumn("raw", raw)
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("raw"), lit(emailPat), lit(0)))
          .as("n_email"),
        size(regexp_extract_all(col("raw"), lit(phonePat), lit(0)))
          .as("n_phone"),
        size(regexp_extract_all(col("raw"), lit(ipPat), lit(0))).as("n_ip"),
        md5(
          regexp_replace(
            regexp_replace(
              regexp_replace(col("raw"), emailPat, "<EMAIL>"),
              phonePat, "<PHONE>"),
            ipPat, "<IP>").cast("binary")).as("redacted_md5"))
      .orderBy(col("doc_id"))
  }

  private val piiRedactSql =
    s"""WITH raw AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 3 = 0 THEN text
       |      || ' contact u' || doc_id || '@mail' || (doc_id % 7)
       |      || '.com call 555-0' || (doc_id % 100 + 100)
       |      || ' from 10.' || (doc_id % 250) || '.0.' || (doc_id % 200)
       |    ELSE text END AS raw
       |  FROM documents)
       |SELECT doc_id,
       |  len(regexp_extract_all(raw, '$emailPat')) AS n_email,
       |  len(regexp_extract_all(raw, '$phonePat')) AS n_phone,
       |  len(regexp_extract_all(raw, '$ipPat')) AS n_ip,
       |  md5(regexp_replace(regexp_replace(regexp_replace(raw,
       |    '$emailPat', '<EMAIL>', 'g'),
       |    '$phonePat', '<PHONE>', 'g'),
       |    '$ipPat', '<IP>', 'g')) AS redacted_md5
       |FROM raw ORDER BY doc_id""".stripMargin

  /** Zipf-law fit per language: rank words by frequency and regress
    * ln(freq) on ln(rank) over the top 50 ranks — the corpus-health
    * diagnostic (natural text slopes near -1; templated or synthetic
    * text is visibly flatter). The slope comes from the closed-form
    * least-squares formula over DECIMAL-exact sums of 9-decimal-
    * rounded log terms, so accumulation is order-independent and both
    * engines produce bit-identical doubles (the sums convert exactly;
    * the remaining arithmetic is IEEE-deterministic in expression
    * order). Scale shape: word counts partial-aggregate before the
    * shuffle; ranking partitions BY LANGUAGE (each group's top-50 is
    * tiny); the regression is one aggregate row per language.
    */
  private def zipfSlope(s: SparkSession, dir: String): DataFrame = {
    val wRank = Window.partitionBy(col("lang"))
      .orderBy(col("n").desc, col("word"))
    val ranked = Tables(s, dir, "documents")
      .select(col("lang"), explode(TextFns.tokens(col("text"))).as("word"))
      .groupBy(col("lang"), col("word"))
      .agg(count(lit(1)).as("n"))
      .withColumn("r", row_number().over(wRank))
      .filter(col("r") <= 50)
      .select(col("lang"),
        round(log(col("r").cast("double")), 9)
          .cast(DecimalType(12, 9)).as("x"),
        round(log(col("n").cast("double")), 9)
          .cast(DecimalType(12, 9)).as("y"))
    ranked
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_ranks"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("lang"), col("n_ranks"),
        // qdec: a ratio of exact decimal sums can TIE (Quant)
        Quant.qdec(
          (col("n_ranks") * col("sxy").cast("double") -
            col("sx").cast("double") * col("sy").cast("double")) /
            (col("n_ranks") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")),
          6).as("zipf_slope"))
      .orderBy(col("lang"))
  }

  private val zipfSlopeSql =
    """WITH counts AS (
      |  SELECT lang, word, count(*) AS n
      |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS word
      |        FROM documents)
      |  GROUP BY lang, word),
      |ranked AS (
      |  SELECT lang,
      |    CAST(round(ln(CAST(row_number() OVER
      |      (PARTITION BY lang ORDER BY n DESC, word) AS DOUBLE)), 9)
      |      AS DECIMAL(12,9)) AS x,
      |    CAST(round(ln(CAST(n AS DOUBLE)), 9) AS DECIMAL(12,9)) AS y,
      |    row_number() OVER (PARTITION BY lang ORDER BY n DESC, word) AS r
      |  FROM counts QUALIFY r <= 50)
      |SELECT lang, count(*) AS n_ranks,
      |  floor((count(*) * CAST(sum(x * y) AS DOUBLE)
      |      - CAST(sum(x) AS DOUBLE) * CAST(sum(y) AS DOUBLE))
      |    / (count(*) * CAST(sum(x * x) AS DOUBLE)
      |      - CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE))
      |    * 1e6 + 0.5) / 1e6 AS zipf_slope
      |FROM ranked GROUP BY lang ORDER BY lang""".stripMargin

  /** Model-based quality scoring — the fastText-classifier-inference
    * shape every modern curation pipeline runs (hashed n-gram features
    * → linear model → sigmoid → keep/drop label). Features are Horner-
    * hashed BIGRAM buckets mod 512; the model is a fixed pseudo-random
    * projection of the bucket id to an integer milli-weight in
    * [-500, 500) (a stand-in for trained coefficients — the plan is
    * what's exercised; swap the arithmetic weight for a broadcast
    * coefficient table and nothing else changes, `cp_dsir_weights`
    * demonstrates exactly that join). Scoring is a narrow map: explode
    * bigrams, integer-sum milli-weights per doc (BIGINT — exact and
    * order-independent), one sigmoid per document rounded to 6
    * decimals (exp is the usual 1-ulp transcendental). At 100 TB this
    * pipelines into the scan with one partial-aggregated shuffle of
    * (doc, partial-sum) pairs.
    */
  private def qualityClassifier(s: SparkSession, dir: String): DataFrame = {
    val ws = TextFns.tokens(col("text"))
    Tables(s, dir, "documents")
      .withColumn("ws", ws)
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), size(col("ws")) - 2),
        i => concat_ws(" ", element_at(col("ws"), i + 1),
          element_at(col("ws"), i + 2)))).as("g"))
      // codegen Horner fold (same arithmetic as the oracle's
      // list_reduce; see functions.HornerHash for why not a HOF)
      .withColumn("bucket", graft.functions.HornerHash(col("g"), 31, 512))
      .withColumn("w_milli",
        (col("bucket") * lit(2654435761L)) % 1000 - 500)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"), sum(col("w_milli")).as("sum_milli"))
      .withColumn("x",
        col("sum_milli").cast("double") / (lit(1000.0) * col("n_feats")))
      .select(col("doc_id"), col("n_feats"),
        round(lit(1.0) / (lit(1.0) + exp(-col("x"))), 6).as("score"),
        (round(lit(1.0) / (lit(1.0) + exp(-col("x"))), 6) >= 0.5)
          .as("keep"))
      .orderBy(col("doc_id"))
  }

  private val qualityClassifierSql =
    """WITH feats AS (
      |  SELECT doc_id,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(range(1, len(g) + 1), j ->
      |        CAST(ascii(substring(g, CAST(j AS INT), 1)) AS BIGINT))),
      |      (acc, c) -> (acc * 31 + c) % 512) AS bucket
      |  FROM (
      |    SELECT doc_id, unnest(list_transform(range(1, len(ws)),
      |      i -> ws[i] || ' ' || ws[i+1])) AS g
      |    FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
      |    WHERE len(ws) >= 2)),
      |scored AS (
      |  SELECT doc_id, count(*) AS n_feats,
      |    sum((bucket * 2654435761) % 1000 - 500) AS sum_milli
      |  FROM feats GROUP BY 1)
      |SELECT doc_id, n_feats,
      |  round(1.0 / (1.0 + exp(-(CAST(sum_milli AS DOUBLE)
      |    / (1000.0 * n_feats)))), 6) AS score,
      |  round(1.0 / (1.0 + exp(-(CAST(sum_milli AS DOUBLE)
      |    / (1000.0 * n_feats)))), 6) >= 0.5 AS keep
      |FROM scored ORDER BY doc_id""".stripMargin

  /** Corpus-drift monitoring: Jensen-Shannon divergence between each
    * source's word distribution and the global corpus distribution —
    * the metric a pipeline watches to catch a crawl source going off
    * the rails (JSD is symmetric, bounded by ln 2, and defined even
    * when supports differ, unlike raw KL). Per-word terms
    * 0.5·p_s·ln(p_s/m) + 0.5·p_g·ln(p_g/m) (m the mixture) round to 9
    * decimals and accumulate in DECIMAL; the mass of global words a
    * source never uses is folded in analytically — those terms reduce
    * to 0.5·ln 2·p_g, so their sum is 0.5·ln 2·(N_g - cov)/N_g with
    * cov the INTEGER count of global occurrences of words the source
    * does use. Plan shape: one (source, word) aggregate feeding both
    * the per-source and global count tables (the global side is
    * vocabulary-sized and re-aggregated from the first — no second
    * corpus scan); the join is left to the optimizer exactly like the
    * bigram-LM tables.
    */
  private def jsdDrift(s: SparkSession, dir: String): DataFrame = {
    val sw = Tables(s, dir, "documents")
      .select(col("source"), explode(TextFns.tokens(col("text"))).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c_sw"))
    val ns = sw.groupBy(col("source")).agg(sum(col("c_sw")).as("n_s"))
    val gw = sw.groupBy(col("w")).agg(sum(col("c_sw")).as("c_gw"))
    val ng = gw.agg(sum(col("c_gw")).as("n_g"))
    val ps = col("c_sw").cast("double") / col("n_s")
    val pg = col("c_gw").cast("double") / col("n_g")
    val m = (ps + pg) / 2.0
    sw.join(ns, "source").join(gw, "w").crossJoin(broadcast(ng))
      .withColumn("term",
        round(lit(0.5) * ps * log(ps / m) + lit(0.5) * pg * log(pg / m), 9)
          .cast(DecimalType(12, 9)))
      .groupBy(col("source"), col("n_s"), col("n_g"))
      .agg(count(lit(1)).as("n_shared_words"),
        sum(col("term")).as("t_sum"),
        sum(col("c_gw")).as("cov"))
      .select(col("source"), col("n_shared_words"),
        round(col("t_sum").cast("double") +
          lit(0.5 * math.log(2.0)) *
            (col("n_g") - col("cov")).cast("double") / col("n_g"),
          9).as("jsd"))
      .orderBy(col("source"))
  }

  private val jsdDriftSql =
    """WITH sw AS (
      |  SELECT source, w, count(*) AS c_sw
      |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
      |        FROM documents)
      |  GROUP BY 1, 2),
      |ns AS (SELECT source, sum(c_sw) AS n_s FROM sw GROUP BY 1),
      |gw AS (SELECT w, sum(c_sw) AS c_gw FROM sw GROUP BY 1),
      |ng AS (SELECT sum(c_gw) AS n_g FROM gw),
      |terms AS (
      |  SELECT source, n_s, n_g, c_gw,
      |    CAST(round(
      |      0.5 * (CAST(c_sw AS DOUBLE) / n_s)
      |        * ln((CAST(c_sw AS DOUBLE) / n_s)
      |          / ((CAST(c_sw AS DOUBLE) / n_s
      |            + CAST(c_gw AS DOUBLE) / n_g) / 2.0))
      |      + 0.5 * (CAST(c_gw AS DOUBLE) / n_g)
      |        * ln((CAST(c_gw AS DOUBLE) / n_g)
      |          / ((CAST(c_sw AS DOUBLE) / n_s
      |            + CAST(c_gw AS DOUBLE) / n_g) / 2.0)), 9)
      |      AS DECIMAL(12,9)) AS term
      |  FROM sw JOIN ns USING (source) JOIN gw USING (w), ng)
      |SELECT source, count(*) AS n_shared_words,
      |  round(CAST(sum(term) AS DOUBLE)
      |    + 0.5 * ln(2.0) * CAST(n_g - sum(c_gw) AS DOUBLE) / n_g, 9)
      |    AS jsd
      |FROM terms GROUP BY source, n_s, n_g ORDER BY source""".stripMargin

  /** RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    * maximal stopword-free token runs; each word scores
    * degree/frequency over the corpus phrase set (degree = summed
    * length of phrases containing it), and a phrase scores the sum of
    * its word scores. Formulated RELATIONALLY — phrase ids come from a
    * running stopword count per document (one per-doc window), word
    * stats from two aggregates, phrase scores from a decimal-rounded
    * sum — no per-row lambdas anywhere, so every stage codegens and
    * partial-aggregates. Top 3 phrases per doc for the first 50 docs
    * (deterministic ties: score desc, then phrase text).
    */
  private def rakeKeywords(s: SparkSession, dir: String): DataFrame = {
    val stopArr = array(stopwords.map(lit): _*)
    val wPh = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    // phrase_id = running stopword count over ALL tokens, THEN drop
    // the stopwords — consecutive non-stop tokens share an id
    val pw = Tables(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(TextFns.tokens(col("text"))).as(Seq("pos", "w")))
      .withColumn("is_stop", array_contains(stopArr, col("w")))
      .withColumn("phrase_id", sum(col("is_stop").cast("int")).over(wPh))
      .filter(!col("is_stop"))
      .select(col("doc_id"), col("phrase_id"), col("pos"), col("w"))
    val phrases = pw
      .groupBy(col("doc_id"), col("phrase_id"))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("w")))),
          p => p("w"))).as("phrase"),
        count(lit(1)).as("phrase_len"))
    val wordStats = pw.join(
        phrases.select(col("doc_id"), col("phrase_id"), col("phrase_len")),
        Seq("doc_id", "phrase_id"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("freq"), sum(col("phrase_len")).as("degree"))
      .withColumn("wscore", // qdec: int/int ratio can TIE (Quant)
        Quant.qdec(col("degree").cast("double") / col("freq"), 9)
          .cast(DecimalType(18, 9)))
    val scores = pw.join(wordStats.select(col("w"), col("wscore")), "w")
      .groupBy(col("doc_id"), col("phrase_id"))
      .agg(round(sum(col("wscore")).cast("double"), 9).as("score"))
    val wTop = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("phrase"))
    phrases.join(scores, Seq("doc_id", "phrase_id"))
      .filter(col("doc_id") < 50)
      .withColumn("rnk", row_number().over(wTop))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("rnk"), col("phrase"), col("phrase_len"),
        col("score"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  private val rakeKeywordsSql = {
    val stopList = stopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id, i AS pos, ws[i] AS w, ws[i] IN ($stopList) AS is_stop
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |    LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS i)),
       |pw AS (
       |  SELECT doc_id, phrase_id, pos, w FROM (
       |    SELECT doc_id, pos, w, is_stop,
       |      sum(CASE WHEN is_stop THEN 1 ELSE 0 END)
       |        OVER (PARTITION BY doc_id ORDER BY pos) AS phrase_id
       |    FROM toks)
       |  WHERE NOT is_stop),
       |phrases AS (
       |  SELECT doc_id, phrase_id,
       |    string_agg(w, ' ' ORDER BY pos) AS phrase,
       |    count(*) AS phrase_len
       |  FROM pw GROUP BY 1, 2),
       |word_stats AS (
       |  SELECT w,
       |    CAST(floor(CAST(sum(phrase_len) AS DOUBLE) / count(*)
       |      * 1e9 + 0.5) / 1e9 AS DECIMAL(18,9)) AS wscore
       |  FROM pw JOIN phrases USING (doc_id, phrase_id)
       |  GROUP BY w),
       |scored AS (
       |  SELECT doc_id, phrase_id,
       |    round(CAST(sum(wscore) AS DOUBLE), 9) AS score
       |  FROM pw JOIN word_stats USING (w)
       |  GROUP BY 1, 2)
       |SELECT doc_id, rnk, phrase, phrase_len, score FROM (
       |  SELECT p.doc_id, p.phrase, p.phrase_len, s.score,
       |    row_number() OVER (PARTITION BY p.doc_id
       |      ORDER BY s.score DESC, p.phrase) AS rnk
       |  FROM phrases p JOIN scored s USING (doc_id, phrase_id)
       |  WHERE p.doc_id < 50)
       |WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin
  }

  /** BM25 keyword retrieval (Robertson/Okapi, k1=1.2, b=0.75): top 20
    * docs for the fixed query {dup, key, fast} — the ranked-retrieval
    * step a corpus-curation pipeline runs to pull topic slices.
    * idf = ln(1 + (N - df + 0.5)/(df + 0.5)) (the non-negative
    * variant), tf saturates through k1 with the b-weighted length
    * normalization dl/avgdl.
    *
    * Scale shape: tf touches only query-term postings (the isin filter
    * pushes to the scan), df/N/avgdl are one tiny broadcast row each,
    * and the per-doc score is a 3-term aggregate — no corpus-wide
    * shuffle beyond the dl count. Exactness: each term's weight is
    * rounded to 9 decimals (ln is the usual 1-ulp transcendental) and
    * summed in DECIMAL, order-independent under any partitioning.
    */
  private def bm25(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    val words = docs
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("w"))
    val terms = Seq("dup", "key", "fast")
    val tf = words.filter(col("w").isin(terms: _*))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    val dl = words.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val dfreq = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(words.agg(count(lit(1)).as("n_words")))
    val avgdl = col("n_words").cast("double") / col("n_docs")
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val termW = idf * (col("tf") * lit(2.2)) /
      (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl") / avgdl)))
    tf.join(dl, "doc_id")
      .join(broadcast(dfreq), "w")
      .crossJoin(broadcast(stats))
      .groupBy(col("doc_id"))
      .agg(sum(round(termW, 9).cast(DecimalType(20, 9)))
        .cast("double").as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(20)
  }

  private val bm25Sql =
    """WITH words AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      |tf AS (SELECT doc_id, w, count(*) AS tf FROM words
      |       WHERE w IN ('dup', 'key', 'fast') GROUP BY 1, 2),
      |dl AS (SELECT doc_id, count(*) AS dl FROM words GROUP BY 1),
      |dfreq AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
      |stats AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
      |                 (SELECT count(*) FROM words) AS n_words)
      |SELECT doc_id,
      |  CAST(sum(CAST(round(
      |    ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * (tf * 2.2) /
      |      (tf + 1.2 * (0.25 + 0.75 *
      |        (dl / (CAST(n_words AS DOUBLE) / n_docs)))), 9)
      |    AS DECIMAL(20, 9))) AS DOUBLE) AS score
      |FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (w), stats
      |GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 20""".stripMargin

  /** Tokenizer fertility by language — the tokenizer-eval metric that
    * decides whether a vocabulary serves a language: pre-tokenizer
    * tokens per whitespace word (fertility; high = the language
    * fragments into many subwords and pays more sequence length per
    * word) and characters per token (compression). One narrow
    * projection, one per-language rollup of integer sums; every ratio
    * is an exact int/int double division.
    */
  private def tokenizerFertility(s: SparkSession, dir: String): DataFrame = {
    val pat = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"
    Tables(s, dir, "documents")
      .select(col("lang"),
        size(regexp_extract_all(col("text"), lit(pat), lit(0))).as("n_bpe"),
        size(TextFns.tokens(col("text"))).as("n_words"),
        length(col("text")).as("n_chars"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_bpe")).as("total_tokens"),
        sum(col("n_words")).as("total_words"),
        (sum(col("n_bpe")).cast("double") / sum(col("n_words")))
          .as("fertility"),
        (sum(col("n_chars")).cast("double") / sum(col("n_bpe")))
          .as("chars_per_token"))
      .orderBy(col("lang"))
  }

  private val tokenizerFertilitySql =
    """SELECT lang, count(*) AS n_docs,
      |  CAST(sum(n_bpe) AS BIGINT) AS total_tokens,
      |  CAST(sum(n_words) AS BIGINT) AS total_words,
      |  CAST(sum(n_bpe) AS DOUBLE) / CAST(sum(n_words) AS BIGINT)
      |    AS fertility,
      |  CAST(sum(n_chars) AS DOUBLE) / CAST(sum(n_bpe) AS BIGINT)
      |    AS chars_per_token
      |FROM (
      |  SELECT lang,
      |    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]'))
      |      AS n_bpe,
      |    len(string_split(text, ' ')) AS n_words,
      |    length(text) AS n_chars
      |  FROM documents)
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** Corpus novelty curve — how fast new content stops arriving as
    * ingest progresses: per ingest-order decile, the share of each
    * document's distinct 3-shingles that appear THERE FIRST (minimum
    * doc_id over the corpus). A healthy crawl decays smoothly; a
    * cliff means the tail is re-crawl. Scale shape: one
    * aggregate-after-explode to first-occurrence per shingle, one
    * shuffle join back on the shingle key (vocabulary-sized — never
    * broadcast, the r9 tf-idf lesson), and deciles by integer
    * arithmetic on the dense doc_id — no partition-less window
    * anywhere. Ratios are exact int/int divisions.
    */
  private def ngramNovelty(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    val grams = docs
      .select(col("doc_id"),
        explode(graft.functions.WordShingles(col("text"), 3)).as("gram"))
    val firstDoc = grams.groupBy(col("gram"))
      .agg(min(col("doc_id")).as("first_doc"))
    val perDoc = grams.join(firstDoc, "gram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_new"))
    val nd = docs.agg((max(col("doc_id")) + 1L).as("nd"))
    perDoc.crossJoin(broadcast(nd))
      .withColumn("decile", expr("(doc_id * 10) div nd"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_grams")).as("total_grams"),
        sum(col("n_new")).as("new_grams"),
        (sum(col("n_new")).cast("double") / sum(col("n_grams")))
          .as("novelty"))
      .orderBy(col("decile"))
  }

  private val ngramNoveltySql =
    """WITH g AS (
      |  SELECT DISTINCT doc_id, gram FROM (
      |    SELECT doc_id, unnest(list_transform(range(1, len(ws) - 1),
      |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS gram
      |    FROM (SELECT doc_id, string_split(text, ' ') AS ws
      |          FROM documents)
      |    WHERE len(ws) >= 3)),
      |f AS (SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY gram),
      |d AS (
      |  SELECT g.doc_id, count(*) AS n_grams,
      |    sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS n_new
      |  FROM g JOIN f ON g.gram = f.gram GROUP BY g.doc_id),
      |n AS (SELECT max(doc_id) + 1 AS nd FROM documents)
      |SELECT (doc_id * 10) // nd AS decile, count(*) AS n_docs,
      |  CAST(sum(n_grams) AS BIGINT) AS total_grams,
      |  CAST(sum(n_new) AS BIGINT) AS new_grams,
      |  CAST(sum(n_new) AS DOUBLE) / CAST(sum(n_grams) AS BIGINT)
      |    AS novelty
      |FROM d CROSS JOIN n GROUP BY 1 ORDER BY decile""".stripMargin

  /** Cross-source 3-gram overlap matrix — the corpus-comparison step a
    * multi-source training mix runs before weighting: which sources
    * share content (mirrors, re-scrapes of the same sites) and which
    * are genuinely distinct. Computed the scale-safe way: ONE
    * corpus-wide aggregation folds each 3-gram's source set into a
    * BIGINT bitmask (the source list is a tiny lexically-indexed dim;
    * `bit_or` is idempotent, so no pre-distinct pass is needed), and
    * only the bitmask HISTOGRAM — ≤ min(|vocab|, 2^n_src) rows, KBs
    * where the corpus is TBs — leaves that shuffle. Every pairwise
    * |A∩B| / |A| / |B| / Jaccard then falls out of conditional sums
    * over histogram × pair-dim (190 × histogram rows, both
    * corpus-size-independent). The naive alternative — a shingle
    * self-join per source pair — re-scans the corpus O(pairs) times.
    */
  /** Per-(JVM, fixture) memo of the collected distinct source lists —
    * a pure function of the fixture (the StagedFixture convention, in
    * memory because the product is a few dozen strings, not files).
    * Without it every bench rep of the overlap queries re-paid a
    * corpus-wide distinct + collect for a constant, skewing the very
    * curve those queries exist to characterize.
    */
  private val srcNamesMemo =
    scala.collection.concurrent.TrieMap.empty[String, Array[String]]

  private def sourceOverlap(s: SparkSession, dir: String): DataFrame = {
    // The bit index only has to be INJECTIVE — every pairwise stat is
    // index-invariant — so build it from a bounded dim collect (the
    // centroid/dim-table pattern; the source list is the mix config,
    // dozens of rows) rather than an unpartitioned window. Fail loudly
    // past 63 sources: the BIGINT mask is full — shard into
    // ARRAY<BIGINT> masks with the same arithmetic beyond that.
    val srcNames = srcNamesMemo.getOrElseUpdate(
      graft.StagedFixture.key("overlap_src", dir),
      Tables(s, dir, "documents")
        .select(col("source")).distinct()
        .collect().map(_.getString(0)).sorted)
    require(srcNames.length <= 63,
      s"source-overlap bitmask holds <= 63 sources, got ${srcNames.length}")
    import s.implicits._
    val srcs = srcNames.zipWithIndex
      .map { case (n, i) => (n, i + 1) }.toSeq
      .toDF("source", "idx")
    val hist = Tables(s, dir, "documents")
      .select(col("source"),
        explode(graft.functions.WordShingles(col("text"), 3)).as("g"))
      .join(broadcast(srcs), "source")
      .groupBy(col("g"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), idx - 1))").as("mask"))
      .groupBy(col("mask")).agg(count(lit(1)).as("cnt"))
    // orient pairs by NAME comparison, not bit index: Spark compares
    // strings as UTF-8 bytes (same as DuckDB's binary collation), while
    // the Scala `.sorted` above is UTF-16 code-unit order — they agree
    // on ASCII but diverge on supplementary-plane names, so the index
    // must never decide which source lands in src_a vs src_b
    val pairs = srcs.select(col("source").as("src_a"), col("idx").as("ia"))
      .crossJoin(srcs.select(col("source").as("src_b"), col("idx").as("ib")))
      .filter(col("src_a") < col("src_b"))
    val bitA = expr(
      "(mask & shiftleft(CAST(1 AS BIGINT), ia - 1)) != 0")
    val bitB = expr(
      "(mask & shiftleft(CAST(1 AS BIGINT), ib - 1)) != 0")
    pairs.crossJoin(hist)
      .groupBy(col("src_a"), col("src_b"))
      .agg(
        sum(when(bitA && bitB, col("cnt")).otherwise(0L)).as("n_common"),
        sum(when(bitA, col("cnt")).otherwise(0L)).as("n_a"),
        sum(when(bitB, col("cnt")).otherwise(0L)).as("n_b"))
      // guard the 0/0 case (a source whose docs all have < 3 words has
      // an empty gram set): Spark renders NULL, DuckDB NaN — make both
      // NULL. qdec keeps the one rational output column inside the
      // Quant convention (ratio of exact counts; see Quant's scaladoc).
      .withColumn("jaccard",
        when(col("n_a") + col("n_b") - col("n_common") > 0,
          Quant.qdec(col("n_common").cast("double") /
            (col("n_a") + col("n_b") - col("n_common")), 9)))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** Sharded source-overlap matrix — `ta_source_overlap`'s "shard into
    * ARRAY<BIGINT> masks with the same arithmetic" claim made real:
    * the 20 fixture sources are deterministically widened to 100
    * synthetic sub-sources (source + '_' + (doc_id div 20) mod 5 —
    * the div-20 decorrelates from the fixture's source ≡ doc_id mod 20
    * assignment; replayed verbatim by the oracle) so the bit index
    * genuinely exceeds one BIGINT, and every per-gram source set
    * folds into TWO 63-bit mask shards (bit = idx mod 63, shard =
    * idx div 63) in the one aggregation.
    *
    * The pairwise read-out is DIFFERENT from the base query's, and
    * deliberately so: histogram × pair-dim
    * conditional sums cost |hist| × C(n,2), and at 100 fine-grained
    * sub-sources the mask histogram stops compressing (measured at
    * sf0.1: 27,082 distinct mask tuples over 27,213 grams — nearly
    * every gram has a unique source subset), so that read-out is
    * O(grams × pairs): 21 s where the base runs 2 s. Instead each
    * histogram row explodes only its SET-BIT combinations (C(d,2)
    * pair events for a gram in d sub-sources — overwhelmingly d ≤ 2,
    * so this is ~O(grams)), and one (ia, ib) shuffle sums the
    * co-occurrence counts; per-source totals come from the same bit
    * explode, and zero-overlap pairs are restored by a left join from
    * the tiny pair dim. This is the crossover every production
    * overlap matrix hits: dense masks + conditional sums win while
    * distinct subsets ≪ grams, sparse pair events win beyond.
    * OverlapShards is a plan-time constant (production:
    * ceil(sources/63)); the require fails loudly past 126.
    */
  private val OverlapShards = 2

  /** UTF-8-byte lexicographic `<` — the collation Spark's string `<`
    * and DuckDB's binary VARCHAR comparison both use; Scala's default
    * String ordering is UTF-16 code-unit order, which disagrees on
    * supplementary-plane characters.
    */
  private def utf8Lt(a: String, b: String): Boolean = {
    val (x, y) = (a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  private def sourceOverlapSharded(s: SparkSession, dir: String): DataFrame = {
    val nBits = OverlapShards * 63
    val syn = concat(col("source"), lit("_"),
      (expr("doc_id div 20") % 5).cast("string")).as("source")
    // sort by UTF-8 BYTES, not Scala's default UTF-16 code units: the
    // co-occurrence join below keys pairs by (min idx, max idx), and
    // the pair dim orients by Spark's `<` (UTF-8 binary, same as the
    // DuckDB oracle) — idx order must therefore BE name order, or a
    // supplementary-plane source name silently zeroes its n_common
    val srcNames = srcNamesMemo.getOrElseUpdate(
      graft.StagedFixture.key("overlap_src_sharded", dir),
      Tables(s, dir, "documents")
        .select(syn).distinct()
        .collect().map(_.getString(0))
        .sortWith(utf8Lt))
    require(srcNames.length <= nBits,
      s"sharded source-overlap holds <= $nBits sources, " +
        s"got ${srcNames.length}; raise OverlapShards")
    import s.implicits._
    val srcs = srcNames.zipWithIndex.toSeq
      .map { case (n, i) => (n, i, i / 63, i % 63) }
      .toDF("source", "idx", "shard", "bit")
    // one corpus shuffle: per-gram sharded source masks (bit_or is
    // idempotent across a sub-source's docs), then the histogram
    val hist = Tables(s, dir, "documents")
      .select(syn,
        explode(graft.functions.WordShingles(col("text"), 3)).as("g"))
      .join(broadcast(srcs), "source")
      .groupBy(col("g"))
      .agg(
        expr("bit_or(IF(shard = 0, shiftleft(CAST(1 AS BIGINT), bit), " +
          "CAST(0 AS BIGINT)))").as("m0"),
        (1 until OverlapShards).map(j =>
          expr(s"bit_or(IF(shard = $j, shiftleft(CAST(1 AS BIGINT), bit), " +
            "CAST(0 AS BIGINT)))").as(s"m$j")): _*)
      .groupBy((0 until OverlapShards).map(j => col(s"m$j")): _*)
      .agg(count(lit(1)).as("cnt"))
    // set-bit list of the sharded mask tuple (m0/m1 are attribute
    // references — safe inside HOF lambdas); size(bits) = the gram's
    // sub-source count d, overwhelmingly 1-2
    def shardSel(v: String): String =
      (0 until OverlapShards - 1).foldRight(s"m${OverlapShards - 1}") {
        (j, acc) => s"IF($v div 63 = $j, m$j, $acc)"
      }
    val withBits = hist.withColumn("bits", expr(
      s"filter(sequence(0, ${nBits - 1}), " +
        s"i -> (((${shardSel("i")}) >> (i % 63)) & 1) = 1)"))
    // sparse pair events: C(d,2) (ia, ib) structs per histogram row,
    // ia < ib by bit order == UTF-8 name order (utf8Lt above)
    val co = withBits
      .select(col("cnt"), explode(expr(
        "flatten(transform(bits, (a, i) -> " +
          "transform(slice(bits, i + 2, size(bits)), " +
          "b -> struct(a AS ia, b AS ib))))")).as("pr"))
      .groupBy(col("pr.ia").as("ia"), col("pr.ib").as("ib"))
      .agg(sum(col("cnt")).as("n_common"))
    // per-source distinct-gram totals from the same bit explode
    val perSrc = withBits
      .select(explode(col("bits")).as("idx"), col("cnt"))
      .groupBy(col("idx")).agg(sum(col("cnt")).as("n"))
    val pairs = srcs.select(col("source").as("src_a"), col("idx").as("ia"))
      .crossJoin(srcs.select(col("source").as("src_b"), col("idx").as("ib")))
      .filter(col("src_a") < col("src_b"))
    // co (≤ C(sources,2) rows) and perSrc (≤ sources rows) are
    // dim-bounded by construction — broadcast them outright instead of
    // waiting for AQE to discover it
    pairs
      .join(broadcast(co), Seq("ia", "ib"), "left")
      .join(broadcast(perSrc.select(col("idx").as("ia"), col("n").as("na"))),
        Seq("ia"), "left")
      .join(broadcast(perSrc.select(col("idx").as("ib"), col("n").as("nb"))),
        Seq("ib"), "left")
      .select(col("src_a"), col("src_b"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        coalesce(col("na"), lit(0L)).as("n_a"),
        coalesce(col("nb"), lit(0L)).as("n_b"))
      .withColumn("jaccard",
        when(col("n_a") + col("n_b") - col("n_common") > 0,
          Quant.qdec(col("n_common").cast("double") /
            (col("n_a") + col("n_b") - col("n_common")), 9)))
      .orderBy(col("src_a"), col("src_b"))
  }

  private val sourceOverlapShardedSql =
    """WITH sh AS (
      |  SELECT DISTINCT
      |    source || '_' || CAST((doc_id // 20) % 5 AS VARCHAR) AS source,
      |    g
      |  FROM (
      |    SELECT source, doc_id,
      |      unnest(list_distinct(list_transform(range(1, len(ws) - 1),
      |        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS g
      |    FROM (SELECT source, doc_id, string_split(text, ' ') AS ws
      |          FROM documents)
      |    WHERE len(ws) >= 3)),
      |srcs AS (
      |  SELECT DISTINCT
      |    source || '_' || CAST((doc_id // 20) % 5 AS VARCHAR) AS source
      |  FROM documents),
      |sizes AS (SELECT source, count(*) AS n FROM sh GROUP BY source),
      |co AS (
      |  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_common
      |  FROM sh a JOIN sh b ON a.g = b.g AND a.source < b.source
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT a.source AS src_a, b.source AS src_b
      |  FROM srcs a JOIN srcs b ON a.source < b.source)
      |SELECT src_a, src_b,
      |  CAST(coalesce(n_common, 0) AS BIGINT) AS n_common,
      |  CAST(coalesce(sa.n, 0) AS BIGINT) AS n_a,
      |  CAST(coalesce(sb.n, 0) AS BIGINT) AS n_b,
      |  CASE WHEN coalesce(sa.n, 0) + coalesce(sb.n, 0)
      |            - coalesce(n_common, 0) > 0 THEN
      |    floor(CAST(coalesce(n_common, 0) AS DOUBLE)
      |          / (coalesce(sa.n, 0) + coalesce(sb.n, 0)
      |             - coalesce(n_common, 0)) * 1e9 + 0.5) / 1e9
      |  END AS jaccard
      |FROM pairs
      |  LEFT JOIN co USING (src_a, src_b)
      |  LEFT JOIN sizes sa ON src_a = sa.source
      |  LEFT JOIN sizes sb ON src_b = sb.source
      |ORDER BY src_a, src_b""".stripMargin

  private val sourceOverlapSql =
    """WITH sh AS (
      |  SELECT source,
      |    unnest(list_distinct(list_transform(range(1, len(ws) - 1),
      |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS g
      |  FROM (SELECT source, string_split(text, ' ') AS ws FROM documents)
      |  WHERE len(ws) >= 3),
      |srcs AS (
      |  SELECT source,
      |    CAST(row_number() OVER (ORDER BY source) AS INT) AS idx
      |  FROM (SELECT DISTINCT source FROM documents)),
      |masks AS (
      |  SELECT g, bit_or(CAST(1 AS BIGINT) << (idx - 1)) AS mask
      |  FROM sh JOIN srcs USING (source) GROUP BY g),
      |hist AS (SELECT mask, count(*) AS cnt FROM masks GROUP BY mask),
      |pairs AS (
      |  SELECT a.source AS src_a, a.idx AS ia, b.source AS src_b,
      |    b.idx AS ib
      |  FROM srcs a JOIN srcs b ON a.source < b.source),
      |agg AS (
      |  SELECT src_a, src_b,
      |    CAST(sum(CASE WHEN (mask >> (ia - 1)) & 1 = 1
      |      AND (mask >> (ib - 1)) & 1 = 1 THEN cnt ELSE 0 END) AS BIGINT)
      |      AS n_common,
      |    CAST(sum(CASE WHEN (mask >> (ia - 1)) & 1 = 1 THEN cnt
      |      ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(sum(CASE WHEN (mask >> (ib - 1)) & 1 = 1 THEN cnt
      |      ELSE 0 END) AS BIGINT) AS n_b
      |  FROM pairs CROSS JOIN hist GROUP BY src_a, src_b)
      |SELECT src_a, src_b, n_common, n_a, n_b,
      |  CASE WHEN n_a + n_b - n_common > 0 THEN
      |    floor(CAST(n_common AS DOUBLE) / (n_a + n_b - n_common)
      |          * 1e9 + 0.5) / 1e9
      |  END AS jaccard
      |FROM agg ORDER BY src_a, src_b""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("ta_source_overlap", sourceOverlap, Some(sourceOverlapSql)),
    QueryDef("ta_source_overlap_sharded", sourceOverlapSharded,
      Some(sourceOverlapShardedSql)),
    QueryDef("ta_ngram_novelty", ngramNovelty, Some(ngramNoveltySql)),
    QueryDef("ta_tokenizer_fertility", tokenizerFertility,
      Some(tokenizerFertilitySql)),
    QueryDef("ta_bm25", bm25, Some(bm25Sql)),
    QueryDef("ta_token_entropy", tokenEntropy, Some(tokenEntropySql)),
    QueryDef("ta_lm_perplexity", lmPerplexity, Some(lmPerplexitySql)),
    QueryDef("ta_perplexity_filter", perplexityFilter,
      Some(perplexityFilterSql)),
    QueryDef("ta_gopher_rules", gopherRules, Some(gopherRulesSql)),
    QueryDef("ta_heaps_law", heapsLaw, Some(heapsLawSql)),
    QueryDef("ta_kneser_ney", kneserNey, Some(kneserNeySql)),
    QueryDef("ta_tfidf", tfidf, Some(tfidfSql)),
    QueryDef("ta_class_tfidf", classTfidf, Some(classTfidfSql)),
    QueryDef("ta_hashing_vectorizer", hashingVectorizer,
      Some(hashingVectorizerSql)),
    QueryDef("ta_cooccurrence", cooccurrence, Some(cooccurrenceSql)),
    QueryDef("ta_pmi_bigrams", pmiBigrams, Some(pmiBigramsSql)),
    QueryDef("ta_vocab_hll", vocabHll, Some(vocabHllSql)),
    QueryDef("ta_vocab_hll_merge", vocabHllMerge, Some(vocabHllMergeSql)),
    QueryDef("ta_token_stats", tokenStats, Some(tokenStatsSql)),
    QueryDef("ta_bpe_token_count", bpeTokenCount, Some(bpeTokenCountSql)),
    QueryDef("ta_bpe_token_ids", bpeTokenIds, Some(bpeTokenIdsSql)),
    QueryDef("ta_bpe_true_count", bpeTrueCount, Some(bpeTrueCountSql)),
    QueryDef("ta_bpe_train", bpeTrain, Some(bpeTrainSql)),
    QueryDef("ta_bpe_learned_compression", bpeLearnedCompression,
      Some(bpeLearnedCompressionSql)),
    QueryDef("ta_bpe_saved_token_ids", bpeSavedTokenIds,
      Some(bpeSavedTokenIdsSql)),
    QueryDef("ta_bpe_saved_compression", bpeSavedCompression,
      Some(bpeLearnedCompressionSql)),
    QueryDef("ta_readability", readability, Some(readabilitySql)),
    QueryDef("ta_heavy_hitters_mg", heavyHittersMg, Some(heavyHittersMgSql)),
    QueryDef("ta_winnow_fp", winnowFp, Some(winnowFpSql)),
    QueryDef("ta_quality_score", quality, Some(qualitySql)),
    QueryDef("ta_lang_id", langId, Some(langIdSql)),
    QueryDef("ta_lang_id_eval", langIdEval, Some(langIdEvalSql)),
    QueryDef("ta_fingerprint", fingerprint, Some(fingerprintSql)),
    QueryDef("ta_word_topk", wordTopK, Some(wordTopKSql)),
    QueryDef("ta_bigram_topk", bigramTopK, Some(bigramTopKSql)),
    QueryDef("ta_bigram_lm_score", bigramLmScore, Some(bigramLmScoreSql)),
    QueryDef("ta_pii_redact", piiRedact, Some(piiRedactSql)),
    QueryDef("ta_zipf_slope", zipfSlope, Some(zipfSlopeSql)),
    QueryDef("ta_quality_classifier", qualityClassifier,
      Some(qualityClassifierSql)),
    QueryDef("ta_jsd_drift", jsdDrift, Some(jsdDriftSql)),
    QueryDef("ta_rake_keywords", rakeKeywords, Some(rakeKeywordsSql)))
}
