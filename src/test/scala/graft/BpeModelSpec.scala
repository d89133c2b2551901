package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.text.{BpeModel, BpeTrainConfig}

/** The persisted-tokenizer contract (BpeModel) plus the merge-budget
  * demonstration the 8-merge oracle query cannot give:
  *
  *   - config + sentinel-space guards fail loudly at definition site;
  *   - a 64-MERGE training run (ranks crossing the control band into
  *     U+E000.. sentinels) equals an independent imperative reference
  *     that never sentinel-codes at all;
  *   - save → load round-trips the rule table exactly, the loaded
  *     model's APPLY equals the inline-trained model's apply on the
  *     corpus, and save refuses to overwrite a published artifact;
  *   - a fresh session (cross-session stand-in) loads and applies the
  *     artifact identically.
  */
class BpeModelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // --- independent reference: symbol vectors, linear-scan counts ---
  private type MergeRow = (Int, String, String, Long)

  private def referenceTrain(texts: Seq[String], n: Int): Vector[MergeRow] = {
    val wordRe = "[A-Za-z]+".r
    val freq = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    texts.foreach(t => wordRe.findAllIn(t).foreach(w => freq(w) += 1L))
    var state: Vector[(Array[String], Long)] =
      freq.toVector.map { case (w, f) => (w.map(_.toString).toArray, f) }
    val code = scala.collection.mutable.Map.empty[String, Char]
    def codeOf(sym: String): Char =
      if (sym.length == 1) sym.head else code(sym)
    val out = Vector.newBuilder[MergeRow]
    var r = 1
    var done = false
    while (r <= n && !done) {
      val counts = scala.collection.mutable
        .Map.empty[(String, String), Long].withDefaultValue(0L)
      state.foreach { case (syms, f) =>
        (0 until syms.length - 1).map(i => (syms(i), syms(i + 1))).distinct
          .foreach { case (a, b) =>
            var i = 0
            var c = 0L
            while (i < syms.length - 1) {
              if (syms(i) == a && syms(i + 1) == b) { c += 1; i += 2 }
              else i += 1
            }
            counts((a, b)) += c * f
          }
      }
      if (counts.isEmpty) done = true
      else {
        // the operator tie-breaks on the sentinel-CODED pair string;
        // mirror it through the same sentinelOf mapping
        val ((a, b), c) = counts.toVector.minBy { case ((x, y), cnt) =>
          (-cnt, s"${codeOf(x)}${codeOf(y)}")
        }
        code(a + b) = BpeModel.sentinelOf(r)
        out += ((r, a, b, c))
        state = state.map { case (syms, f) =>
          val buf = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
              buf += (a + b); i += 2
            } else { buf += syms(i); i += 1 }
          }
          (buf.toArray, f)
        }
        r += 1
      }
    }
    out.result()
  }

  /** A corpus rich enough to sustain 64 merges: long words over a
    * 12-letter alphabet with heavy bigram skew.
    */
  private def richCorpus(): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(20260816L)
    val alphabet = "abcdefghijkl"
    def word(): String =
      (0 until 4 + rnd.nextInt(9))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    (0L until 120L).map { id =>
      val ws = (0 until 6 + rnd.nextInt(12)).map(_ => word()) ++
        (if (id % 3 == 0) Seq("abcabcabc", "defdefdef") else Nil)
      (id, ws.mkString(" "))
    }
  }

  private def toDocs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("config + sentinel guards: zero/overflow budgets rejected, " +
      "sentinels never collide with the vocab alphabet") {
    intercept[IllegalArgumentException](BpeTrainConfig(0))
    intercept[IllegalArgumentException](BpeTrainConfig(BpeModel.MaxMerges + 1))
    intercept[IllegalArgumentException](BpeModel.sentinelOf(0))
    intercept[IllegalArgumentException](
      BpeModel.sentinelOf(BpeModel.MaxMerges + 1))
    assert(BpeModel.sentinelOf(31) == 31.toChar)      // control band edge
    assert(BpeModel.sentinelOf(32) == 0xE000.toChar)  // first PUA rank
    (1 to 200).foreach { r =>
      val c = BpeModel.sentinelOf(r)
      assert(!c.isLetterOrDigit && c != ' ' && !Character.isSurrogate(c),
        s"rank $r -> U+${c.toInt.toHexString} collides")
    }
  }

  test("64-merge training equals the imperative reference across the " +
      "control-band/PUA sentinel boundary") {
    val corpus = richCorpus()
    val model = BpeModel.train(toDocs(corpus), "text", BpeTrainConfig(64))
    assert(model.rules.size == 64,
      s"fixture exhausted at ${model.rules.size} merges — corpus too thin")
    val want = referenceTrain(corpus.map(_._2), 64)
    val got = model.rules.map(m => (m.rank, m.lhs, m.rhs, m.count))
    assert(got == want)
    // ranks past 31 carry PUA sentinels; their coded pairs still
    // decode to pure letters
    model.rules.filter(_.rank >= 32).foreach { m =>
      assert(m.sentinel >= 0xE000.toChar)
      assert((m.lhs + m.rhs).forall(_.isLetter))
    }
  }

  test("save/load round-trip: rule table exact, loaded apply == inline " +
      "apply, overwrite refused, fresh session loads identically") {
    val corpus = richCorpus()
    val docs = toDocs(corpus)
    val model = BpeModel.train(docs, "text", BpeTrainConfig(48))
    val work = java.nio.file.Files.createTempDirectory("graft_bpemodel")
    val path = work.resolve("m").toString
    model.save(spark, path)

    val loaded = BpeModel.load(spark, path)
    assert(loaded.rules == model.rules)

    // published artifacts are immutable
    val ex = intercept[IllegalArgumentException](model.save(spark, path))
    assert(ex.getMessage.contains("already exists"))

    // apply equality: per-doc encoded token counts, loaded vs inline
    def counts(m: BpeModel) = docs
      .select(col("doc_id"), m.tokenCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts(loaded) == counts(model))

    // cross-session: a NEW session (fresh state, shared nothing but
    // storage) must load and apply the same artifact identically
    val s2 = spark.newSession()
    val loaded2 = BpeModel.load(s2, path)
    assert(loaded2.rules == model.rules)

    // token counts must also equal an imperative fold of the rules
    val byRank = model.rules.map(m => (m.lhs, m.rhs))
    def refCount(text: String): Long = {
      def fused(run: String): Int = {
        var syms = run.map(_.toString).toVector
        byRank.foreach { case (a, b) =>
          val buf = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
              buf += (a + b); i += 2
            } else { buf += syms(i); i += 1 }
          }
          syms = buf.result()
        }
        syms.length
      }
      var n = 0L
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        if (c == ' ') i += 1
        else if (c.isLetter) {
          val start = i
          while (i < text.length && text.charAt(i).isLetter) i += 1
          n += fused(text.substring(start, i)).toLong
        } else { n += 1L; i += 1 }
      }
      n
    }
    val got = counts(loaded)
    corpus.foreach { case (id, text) =>
      assert(got(id) == refCount(text), s"doc $id")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(work.toFile)
  }

  test("encodeIds: ids decode back to the exact text (round trip " +
      "through the learned vocab, PUA sentinel band included)") {
    val corpus = richCorpus()
    val docs = toDocs(corpus)
    val model = BpeModel.train(docs, "text", BpeTrainConfig(48))
    assert(model.rules.size == 48)
    // vocab: id -> expanded string (base = code point char,
    // merged = lhs+rhs expansion)
    val vocab: Map[Int, String] = model.rules
      .map(m => (256 + m.rank) -> (m.lhs + m.rhs)).toMap
      .withDefault(id => id.toChar.toString)
    val got = docs
      .select(col("doc_id"), model.encodeIds(col("text")).as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    corpus.foreach { case (id, text) =>
      val decoded = got(id).map(vocab).mkString
      assert(decoded == text.replace(" ", ""), s"doc $id")
      // merged ids only appear past the byte range; every id is a
      // real vocab entry
      got(id).foreach(i =>
        assert(i < 256 || vocab.contains(i), s"doc $id id $i"))
    }
    assert(got.values.exists(_.exists(_ >= 256 + 32)),
      "no PUA-band merged id ever fired — the band crossing is untested")
  }

  test("empty and whitespace-only texts encode to ZERO ids — no " +
      "phantom id 256 from the split('','') empty cell — and the " +
      "fixed-table query matches on a corpus containing them") {
    val corpus = Seq((1L, ""), (2L, " "), (3L, "ab ab"))
    val docs = toDocs(corpus)
    val model = BpeModel.train(docs, "text", BpeTrainConfig(1))
    val got = docs
      .select(col("doc_id"), model.encodeIds(col("text")).as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(got(1L).isEmpty, s"empty text minted ids ${got(1L)}")
    assert(got(2L).isEmpty, s"space-only text minted ids ${got(2L)}")
    assert(got(3L).nonEmpty)
    // the fixed-merge-table query path shares the projection: drive it
    // through a staged fixture with an empty doc and expect 0 tokens
    val work = java.nio.file.Files.createTempDirectory("graft_empty_doc")
    try {
      docs.select(col("doc_id"), col("text"))
        .write.parquet(s"$work/documents.parquet")
      val out = SparkEntry.queries("ta_bpe_token_ids")(spark, work.toString)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[String]("token_ids"), r.getAs[Int]("n_tokens")))).toMap
      assert(out(1L) == (("", 0)), s"empty doc emitted ${out(1L)}")
      assert(out(2L) == (("", 0)), s"space-only doc emitted ${out(2L)}")
      assert(out(3L)._2 > 0)
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(work.toFile)
  }

  test("ta_bpe_saved_compression equals ta_bpe_learned_compression " +
      "row for row (persisted apply == inline-train apply)") {
    val dir = "/root/testdata/sf0.001"
    val a = SparkEntry.queries("ta_bpe_learned_compression")(spark, dir)
      .collect().map(_.toSeq).toVector
    val b = SparkEntry.queries("ta_bpe_saved_compression")(spark, dir)
      .collect().map(_.toSeq).toVector
    assert(a == b)
  }
}
