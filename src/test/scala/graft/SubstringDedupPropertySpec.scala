package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Generative cross-check of the exact substring-dedup pair
  * (dd_substring_spans / dd_substring_trim) against brute-force
  * imperative recounts, over corpora synthesized to hit the operators'
  * edge geometry on purpose:
  *
  *   - cross-doc repeats: docs assembled from a shared fragment pool,
  *     so identical ≥k-token stretches appear in unrelated docs;
  *   - self-repetition: periodic docs (a short phrase cycled), the
  *     case where a gram repeats WITHIN one doc and both positions
  *     must mark as duplicated;
  *   - boundary lengths: docs of exactly k, k−1 and k+1 tokens;
  *   - island-merge subtlety: overlapping-but-not-adjacent duplicated
  *     windows (the gap ≤ k rule trim depends on, where the span
  *     chain's +1 rule would overcount holes).
  *
  * The recounts share NOTHING with the operators: raw token strings
  * (no md5), boolean position-marking for coverage (ground-truth
  * interval union), linear run scans for span extension.
  */
class SubstringDedupPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val K = 20 // must match Dedup.SpanK

  private def synthesize(seed: Long): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps")
    def freshTokens(n: Int): Vector[String] =
      Vector.fill(n)(vocab(rnd.nextInt(vocab.size)) + rnd.nextInt(1000))
    // fragment pool: some longer than K (guaranteed cross-doc spans),
    // some shorter (spans only when two docs share a fragment RUN)
    val pool = Vector.fill(6)(freshTokens(8 + rnd.nextInt(30)))
    val docs = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    var id = 0L
    def add(tokens: Seq[String]): Unit = {
      docs += ((id, tokens.mkString(" "))); id += 1
    }
    // fragment-assembled docs (cross-doc repeats)
    for (_ <- 0 until 20)
      add((0 until 1 + rnd.nextInt(3))
        .flatMap(_ => pool(rnd.nextInt(pool.size))) ++
        freshTokens(rnd.nextInt(10)))
    // periodic docs (self-repetition): a 3-7 token phrase cycled
    for (_ <- 0 until 4) {
      val phrase = freshTokens(3 + rnd.nextInt(5))
      add(Vector.fill(10)(phrase).flatten.take(25 + rnd.nextInt(30)))
    }
    // boundary lengths around K, built from one shared fragment so
    // the exactly-K doc can actually duplicate
    val frag = pool(0)
    add((frag ++ frag).take(K))     // exactly K tokens
    add((frag ++ frag).take(K - 1)) // below the window — never grams
    add((frag ++ frag).take(K + 1))
    // a pure-noise doc (no repeats at all)
    add(freshTokens(40))
    docs.toSeq
  }

  private def grams(ws: Array[String]): IndexedSeq[String] =
    if (ws.length >= K) (0 to ws.length - K).map(i =>
      ws.slice(i, i + K).mkString(" "))
    else IndexedSeq.empty

  test("spans + trim match brute-force recounts on synthesized corpora " +
    "(cross-doc, self-repeat, boundary, island-merge)") {
    import org.apache.spark.sql.functions._
    for (seed <- 1L to 5L) {
      val docs = synthesize(seed)
      val dir = java.nio.file.Files.createTempDirectory(s"ssdocs_$seed")
      import spark.implicits._
      docs.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")

      val toks = docs.map { case (i, t) => i -> t.split(" ", -1) }
      val occ = scala.collection.mutable.Map.empty[String, Int]
        .withDefaultValue(0)
      toks.foreach { case (_, ws) => grams(ws).foreach(g => occ(g) += 1) }

      // brute-force span histogram (runs of consecutive dup starts)
      val expSpans = scala.collection.mutable.Map
        .empty[Long, (Long, Set[Long])].withDefaultValue((0L, Set.empty))
      toks.foreach { case (id, ws) =>
        var run = 0
        def close(): Unit = if (run > 0) {
          val span = (run + K - 1).toLong
          val (n, ds) = expSpans(span)
          expSpans(span) = (n + 1, ds + id); run = 0
        }
        grams(ws).foreach(g => if (occ(g) >= 2) run += 1 else close())
        close()
      }
      val gotSpans = SparkEntry.queries("dd_substring_spans")(spark, dir.toString)
        .collect()
        .map(r => r.getAs[Long]("span_tokens") ->
          (r.getAs[Long]("n_spans"), r.getAs[Long]("n_docs"))).toMap
      assert(gotSpans ==
        expSpans.map { case (s, (n, ds)) => s -> (n, ds.size.toLong) }.toMap,
        s"seed=$seed spans mismatch")
      assert(gotSpans.nonEmpty, s"seed=$seed synthesized no repeats — generator broken")

      // brute-force coverage (boolean marking = ground-truth union)
      val expTrim = scala.collection.mutable.Map
        .empty[Long, (Long, Long, Long)].withDefaultValue((0L, 0L, 0L))
      toks.foreach { case (id, ws) =>
        val marked = Array.fill(ws.length)(false)
        grams(ws).zipWithIndex.foreach { case (g, p) =>
          if (occ(g) >= 2) (p until p + K).foreach(marked(_) = true)
        }
        val (d0, t0, c0) = expTrim(id % 10)
        expTrim(id % 10) =
          (d0 + 1, t0 + ws.length, c0 + marked.count(identity))
      }
      val gotTrim = SparkEntry.queries("dd_substring_trim")(spark, dir.toString)
        .collect()
        .map(r => r.getAs[Long]("decile") ->
          (r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens"),
            r.getAs[Long]("covered_tokens"))).toMap
      assert(gotTrim == expTrim.toMap, s"seed=$seed trim mismatch")

      org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
    }
  }
}
