package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over a pair graph — the
  * keep-one-per-cluster step after near-dup pair finding.
  *
  * Two interchangeable algorithms (identical output: every node
  * labeled with the minimum node id in its component):
  *
  *  - [[labelPropagation]]: iterative min-label exchange across
  *    edges. Rounds = component diameter — fine for the shallow,
  *    clique-ish graphs near-dup thresholds produce, but a chain-y
  *    crawl-scale duplicate graph (long quote chains, serial
  *    near-edits) needs O(diameter) shuffles.
  *  - [[alternatingStars]]: the large-star/small-star algorithm of
  *    Kiveris et al., "Connected Components in MapReduce and Beyond"
  *    (SoCC 2014). Each round rewires every node toward its
  *    neighborhood minimum, roughly squaring the rate at which
  *    components collapse into stars: O(log² n) rounds on ANY graph
  *    shape, independent of diameter — the 100 TB default.
  *
  * Edges are an arbitrary-orientation pair list; self-loops and
  * duplicates are tolerated. Nodes with no edges don't appear in the
  * output (a pair graph has no isolated nodes; callers wanting them
  * union the keeper set back in).
  */
object ConnectedComponents {

  /** Canonical undirected edge set: (a, b) with a < b, distinct, no
    * self-loops.
    */
  private def canon(edges: DataFrame): DataFrame = {
    val Seq(c1, c2) = edges.columns.toSeq.take(2).map(col)
    edges.select(least(c1, c2).as("a"), greatest(c1, c2).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
  }

  /** Large-star: every node u connects its LARGER neighbors to
    * m(u) = min(u ∪ Γ(u)). Keeps all nodes (a node whose neighbors
    * are all smaller is re-emitted by each of those neighbors) and
    * preserves connectivity; strictly shrinks long chains.
    *
    * Emits a MULTISET (no dedup shuffle here): smallStar consumes it
    * through a min-aggregate and its own terminal distinct, both
    * duplicate-insensitive, so one round pays one dedup instead of
    * two. The duplicate volume is bounded by the input edge count.
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val bi = e.select(col("a").as("u"), col("b").as("v"))
      .unionByName(e.select(col("b").as("u"), col("a").as("v")))
    val m = bi.groupBy(col("u"))
      .agg(min(col("v")).as("mv"))
      .select(col("u"), least(col("u"), col("mv")).as("m"))
    // v > u >= m, so the emitted edge is already (small, large)
    bi.join(m, "u")
      .filter(col("v") > col("u"))
      .select(col("m").as("a"), col("v").as("b"))
  }

  /** Small-star: every node u connects its SMALLER neighbors (and
    * itself) to the minimum among them. Orients each edge max→min, so
    * each group sees only smaller neighbors; m < x for every emitted
    * (m, x). Duplicate input edges are harmless (min-aggregate), and
    * the terminal distinct restores set semantics for the round.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val dir = e.select(col("b").as("u"), col("a").as("v")) // u > v
    val m = dir.groupBy(col("u")).agg(min(col("v")).as("m"))
    val viaNbr = dir.join(m, "u")
      .filter(col("v") =!= col("m"))
      .select(col("m").as("a"), col("v").as("b"))
    val self = m.select(col("m").as("a"), col("u").as("b"))
    viaNbr.unionByName(self).distinct()
  }

  /** Alternating large-star/small-star to the star fixpoint, then one
    * labeling pass. Each round is two bounded shuffles on the CURRENT
    * edge set (which only shrinks toward one edge per non-root node);
    * the driver sees a (count, hash-sum) signature per round, never
    * edges. Convergence is signature equality — the fixpoint is
    * reached when a full large+small round leaves the edge set
    * unchanged (both operators are deterministic set maps, and
    * xxhash64 collisions across a round boundary would need two
    * distinct sets with equal count AND equal 64-bit hash sum —
    * negligible against the 20-round cap's own safety margin).
    *
    * Bounded ENDGAME (Kiveris et al. §6's own recommendation): once
    * the shrinking edge set fits `localFinishEdges`, stop scheduling
    * rounds and finish with a driver union-find. The tail rounds of
    * the distributed loop are pure scheduling overhead — measured at
    * sf0.1 (256 edges), the loop costs ~2 s regardless of shuffle
    * width 1..8 because each round is 2+ driver-scheduled jobs, while
    * the same 256 edges union-find in microseconds. The check rides
    * the signature count the loop already collects (no extra job),
    * the collect is loudly capped (≤ 2²⁰ edges ≈ 16 MB), and on a
    * 100 TB pair graph the first rounds still run distributed — the
    * endgame only absorbs the converged tail. `localFinishEdges = 0`
    * forces the pure distributed loop (the property-test A/B path).
    */
  def alternatingStars(edges: DataFrame, maxRounds: Int = 20,
      localFinishEdges: Int = 1 << 16): DataFrame = {
    require(localFinishEdges <= (1 << 20),
      s"localFinishEdges=$localFinishEdges: the endgame collect is " +
        "bounded at 2^20 edges — raise rounds, not the driver's heap")
    var e = canon(edges).cache()

    // (count, xor of per-edge hashes): order-independent, overflow-free
    // (the edge set is distinct, so xor cancellation needs a real hash
    // collision)
    def signature(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        bit_xor(xxhash64(col("a"), col("b")))).collect()(0)
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    var sig = signature(e)
    var converged = false
    var rounds = 0
    // the endgame's union-find works on long ids — a non-integral id
    // column (string doc keys label fine via least/min in the star
    // rounds) would cast to null and NPE, so such graphs simply keep
    // the pure distributed path (r18 advice)
    val endgameEligible = integralIdType(e)
    while (!converged && rounds < maxRounds) {
      if (sig._1 <= localFinishEdges && endgameEligible) {
        val out = localLabel(e)
        e.unpersist()
        return out
      }
      // localCheckpoint (eager): materializes the round AND truncates
      // lineage — without it the logical plan nests per round and
      // planning cost explodes; dropped round RDDs are reclaimed by
      // the ContextCleaner
      val next = smallStar(largeStar(e)).localCheckpoint()
      val nextSig = signature(next)
      e.unpersist()
      e = next
      converged = nextSig == sig
      sig = nextSig
      rounds += 1
    }
    if (!converged) {
      e.unpersist()
      // a partially-converged labeling is WRONG (components split into
      // fragments) and downstream keep-one-per-cluster dedup would
      // over-keep with no signal — fail loudly instead. Kiveris et
      // al.'s O(log² n) round bound can exceed any fixed cap on
      // adversarial graphs; the caller raises maxRounds.
      throw new IllegalStateException(
        s"connected components did not converge in $maxRounds " +
          "large/small-star rounds; raise maxRounds (rounds needed grow " +
          "O(log² n) in the node count)")
    }
    // star fixpoint: per component, edges (root, x) for every other
    // member; label = min over both directions ∪ self
    val bi = e.select(col("a").as("node"), col("b").as("nbr"))
      .unionByName(e.select(col("b").as("node"), col("a").as("nbr")))
    val out = bi.groupBy(col("node"))
      .agg(least(col("node"), min(col("nbr"))).as("component"))
    e.unpersist()
    out
  }

  /** Endgame eligibility: the collected union-find runs on longs, so
    * only integral id columns qualify; anything else (string keys,
    * decimals) stays on the distributed star loop, which orders via
    * least/min on the native type.
    */
  private def integralIdType(e: DataFrame): Boolean =
    e.schema("a").dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case _ => false
    }

  /** The endgame labeling: union-find over a CAPPED collected edge
    * set (caller checked the bound), roots kept at the component
    * minimum (union always re-roots the larger root under the
    * smaller, and the global min of a component can never lose its
    * root), so `find` IS the label. Output schema and types match the
    * distributed labeling exactly.
    */
  private def localLabel(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    val dt = e.schema("a").dataType
    val rows = e.select(col("a").cast("long"), col("b").cast("long"))
      .collect()
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x // path compression
      while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    val nodes = scala.collection.mutable.SortedSet.empty[Long]
    rows.foreach { r =>
      val (x, y) = (r.getLong(0), r.getLong(1))
      nodes += x; nodes += y
      val (rx, ry) = (find(x), find(y))
      if (rx != ry) parent(math.max(rx, ry)) = math.min(rx, ry)
    }
    import spark.implicits._
    // coalesce(1): a driver-local relation otherwise parallelizes to
    // min(rows, defaultParallelism) slices — the endgame's ≤ 2^20-row
    // label set fanned out as 32 fifteen-row partitions on a 32-core
    // box, and every downstream join/union/sort over the labels paid a
    // 32-task stage for KBs of data (§2: size partitions by data, not
    // core count). One partition is the honest size for a
    // driver-collected result.
    nodes.toSeq.map(n => (n, find(n))).toDF("node", "component")
      .select(col("node").cast(dt).as("node"),
        col("component").cast(dt).as("component"))
      .coalesce(1)
  }

  /** Iterative min-label propagation (the O(diameter) baseline kept
    * for A/B equivalence testing and for graphs known to be shallow).
    * Labels only ever decrease, so the label sum strictly decreases
    * until the fixpoint — one aggregate per round detects convergence.
    */
  def labelPropagation(edges: DataFrame, maxRounds: Int = 20): DataFrame = {
    val e0 = canon(edges)
    val bi = e0.select(col("a").as("doc_a"), col("b").as("doc_b"))
      .unionByName(e0.select(col("b").as("doc_a"), col("a").as("doc_b")))
      .cache()
    var labels = bi.select(col("doc_a").as("node"))
      .distinct()
      .withColumn("label", col("node"))
    var prevSum: Option[BigDecimal] = None
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      val viaEdges = bi
        .join(labels, bi("doc_b") === labels("node"))
        .select(col("doc_a").as("node"), col("label"))
      val next = labels.unionByName(viaEdges)
        .groupBy(col("node")).agg(min(col("label")).as("label"))
        .localCheckpoint() // truncate per-round lineage (see above)
      // decimal sum: overflow-free under ANSI mode at any node count
      val s = Option(next.agg(sum(col("label").cast("decimal(38,0)")))
        .collect()(0).getDecimal(0)).map(BigDecimal(_))
      labels.unpersist()
      labels = next
      converged = s == prevSum // None == None: the empty graph is a fixpoint
      prevSum = s
      rounds += 1
    }
    bi.unpersist()
    if (!converged) {
      // same contract as alternatingStars: never hand back a wrong
      // (partially-propagated) labeling. Rounds here = diameter, so
      // chain-y graphs trip this first — the error says which knob.
      throw new IllegalStateException(
        s"label propagation did not converge in $maxRounds rounds " +
          "(rounds = component diameter); raise maxRounds or use " +
          "alternatingStars for deep graphs")
    }
    labels.select(col("node"), col("label").as("component"))
  }
}
