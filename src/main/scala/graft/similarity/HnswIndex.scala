package graft.similarity

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One persisted HNSW node — top-level so the ExpressionEncoder's
  * generated code can reach the accessors (the janino constraint the
  * multimodal tier documents). `adj(l)` is the node's neighbor-id list
  * at level l, 0 ≤ l ≤ top_level.
  */
case class HnswNode(shard: Int, id: Long, vec: Array[Float],
    top_level: Int, adj: Seq[Seq[Long]])

/** One per-shard search hit before the global merge. */
case class HnswHit(query_id: Long, neighbor_id: Long, cosv: Double)

/** SHARDED HNSW (Malkov & Yashunin, TPAMI 2018) — the graph-based ANN
  * index every vector-serving stack defaults to (FAISS `IndexHNSW`,
  * hnswlib, Lucene/Elasticsearch KNN, Milvus), packaged like
  * [[IvfIndex]]: build once, persist, load and search many times.
  *
  * Spark-first layout — HNSW construction is inherently sequential
  * (each insertion searches the graph built so far), so the scale play
  * is the one production systems use: SHARD the corpus
  * (`shard = id mod nShards`), build one in-memory graph PER SHARD
  * inside a single `flatMapGroups` pass (embarrassingly parallel
  * across shards), and serve a search by querying every shard's graph
  * and merging the per-shard top-k — nShards·k rows into one rank
  * window, never the corpus. At 100 TB, nShards grows with the corpus
  * so a shard's vectors + adjacency fit one executor (the same
  * per-group memory contract as the ingest tier); queries fan out to
  * all shards, which is how FAISS sharded serving and Milvus segments
  * work. The graph files persist partitioned BY shard, so loading a
  * shard for serving prunes everything else at the parquet scan.
  *
  * Determinism (the property the oracle gate rides on):
  *  - insertion order is vec_id ascending within each shard;
  *  - a node's level is geometric(1/8) from a splitmix64 hash of its
  *    id (trailing-zero triples — integer-exact, seed-free);
  *  - every comparison orders by (similarity desc, id asc), so equal
  *    similarities break to the lower id on both engines;
  *  - similarities replicate FloatVecDot's sequential float→double
  *    fold and `dot / (norm · norm)` bit-for-bit.
  *
  * Exactness escape hatch: searching with `ef ≥ shard size` makes the
  * beam exhaustive over each shard's graph — level-0 connectivity is
  * GUARANTEED by sequential chain edges (each node links its
  * insertion-order predecessor; appended after construction, exempt
  * from pruning — the standard practical guard against prune-induced
  * disconnection), so the merged result EQUALS brute-force cosine
  * top-k and a plain SQL oracle can hash-check the whole
  * build→save→load→search chain. Realistic `ef` trades that guarantee
  * for speed; recall at serving ef is tracked in SCALING.md and
  * asserted by HnswSpec.
  */
final class HnswIndex private[similarity] (
    val m: Int, val efConstruction: Int, val nShards: Int,
    val nodes: DataFrame) {

  /** Top-k cosine neighbors per query vector, searching every shard's
    * graph with beam width `ef` and merging nShards·k candidate rows
    * through one rank window. Output: (query_id, neighbor_id, rnk,
    * cosv), rank order (cosine desc, id asc) — the [[IvfIndex]]
    * contract. `ef = Int.MaxValue` (clamped to shard size) is the
    * exhaustive mode the oracle gate uses.
    */
  def search(queries: DataFrame, idCol: String, vecCol: String,
      k: Int, ef: Int): DataFrame = {
    val s = nodes.sparkSession
    import s.implicits._
    val qRows = queries.select(col(idCol).cast("long"), col(vecCol))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    require(qRows.length <= (1 << 16),
      s"HNSW search collects the query batch to the driver; got " +
        s"${qRows.length} queries > 65536 — split the batch or run " +
        "searches as a stream of bounded batches")
    val mLocal = m
    val efLocal = ef
    val hits = nodes.as[HnswNode]
      .groupByKey(_.shard)
      .flatMapGroups { (_: Int, it: Iterator[HnswNode]) =>
        val g = HnswIndex.Graph.fromNodes(it)
        qRows.iterator.flatMap { case (qid, qv) =>
          g.searchTopK(qv, k, efLocal).map { case (nid, cosv) =>
            HnswHit(qid, nid, cosv)
          }
        }
      }
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosv").desc, col("neighbor_id"))
    hits.toDF()
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), col("cosv"))
  }

  /** Persist the graph partitioned by shard (serving a shard prunes
    * the rest at the scan) plus a one-row meta table. Like IvfIndex,
    * `path` is any Hadoop-FS path — a cluster deployment points it at
    * the shared lake (see SCALING.md's shared-FS note).
    */
  def save(path: String): Unit = {
    val s = nodes.sparkSession
    import s.implicits._
    Seq((m, efConstruction, nShards)).toDF("m", "ef_construction",
        "n_shards")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    nodes.write.mode("overwrite").partitionBy("shard")
      .parquet(s"$path/nodes")
  }
}

object HnswIndex {

  /** Build over a corpus with a long id column and an Array[Float]
    * vector column: shard by id, then one deterministic in-memory
    * graph construction per shard inside `flatMapGroups`.
    */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
      nShards: Int, m: Int, efConstruction: Int): HnswIndex = {
    val s = corpus.sparkSession
    import s.implicits._
    require(nShards > 0 && m > 1 && efConstruction >= m,
      s"HNSW params out of range: nShards=$nShards m=$m efC=$efConstruction")
    val mLocal = m
    val efcLocal = efConstruction
    val built = corpus
      .select(pmod(col(idCol), lit(nShards)).cast("int").as("shard"),
        col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .as[(Int, Long, Array[Float])]
      .groupByKey(_._1)
      .flatMapGroups { (shard: Int, it: Iterator[(Int, Long, Array[Float])]) =>
        val rows = it.map { case (_, id, v) => (id, v) }.toArray
          .sortBy(_._1) // fixed insertion order = vec_id ascending
        Graph.construct(rows, mLocal, efcLocal).toNodes(shard)
      }
    new HnswIndex(m, efConstruction, nShards, built.toDF())
  }

  /** Load a persisted index. */
  def load(spark: SparkSession, path: String): HnswIndex = {
    val meta = spark.read.parquet(s"$path/meta").collect().head
    new HnswIndex(meta.getInt(0), meta.getInt(1), meta.getInt(2),
      spark.read.parquet(s"$path/nodes"))
  }

  /** splitmix64 — the seed-free deterministic hash behind level
    * assignment.
    */
  private def mix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Geometric(1/8) level from trailing-zero TRIPLES of the hash —
    * the integer-exact equivalent of floor(-ln(U)/ln(8)); capped so a
    * pathological id can't build a 22-level tower.
    */
  private def levelOf(id: Long): Int =
    math.min(12, java.lang.Long.numberOfTrailingZeros(mix64(id)) / 3)

  /** In-memory per-shard graph: construction, beam search, and the
    * persisted-row conversion. Package-private for HnswSpec.
    */
  private[similarity] final class Graph(
      val ids: Array[Long],
      val vecs: Array[Array[Float]],
      val nrms: Array[Double],
      val lvls: Array[Int],
      val adj: Array[Array[mutable.ArrayBuffer[Int]]],
      var entry: Int) {

    // FloatVecDot replica: sequential float→double fold, so every
    // similarity is bit-identical to the codegen expression and the
    // SQL oracle's list_cosine_similarity
    private def dotQ(q: Array[Float], j: Int): Double = {
      val b = vecs(j)
      var acc = 0.0
      var i = 0
      while (i < q.length) { acc += q(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }

    private def qNorm(q: Array[Float]): Double = {
      var acc = 0.0
      var i = 0
      while (i < q.length) { acc += q(i).toDouble * q(i).toDouble; i += 1 }
      math.sqrt(acc)
    }

    /** Beam search at one level: standard HNSW Algorithm 2, ordered by
      * (sim desc, id asc). The early break fires ONLY when the result
      * set is full (|W| = ef) — with ef ≥ shard size that never
      * happens, so the walk visits the entire connected component
      * (= the shard, thanks to the chain edges) and the search is
      * provably exhaustive.
      */
    private[similarity] def searchLayer(qv: Array[Float], qn: Double,
        eps: Seq[Int],
        ef: Int, lev: Int,
        visited: mutable.BitSet): mutable.TreeSet[(Double, Long, Int)] = {
      // key (-sim, id): TreeSet ascending = best first; .last = worst
      def key(o: Int): (Double, Long, Int) =
        (-(dotQ(qv, o) / (qn * nrms(o))), ids(o), o)
      val cand = mutable.TreeSet.empty[(Double, Long, Int)]
      val res = mutable.TreeSet.empty[(Double, Long, Int)]
      eps.foreach { e =>
        if (!visited.contains(e)) {
          visited += e
          val ke = key(e)
          cand += ke
          res += ke
        }
      }
      while (cand.nonEmpty) {
        val c = cand.head
        cand -= c
        if (res.size >= ef && Ordering[(Double, Long, Int)]
            .gt(c, res.last)) {
          cand.clear()
        } else {
          val nbrs = adj(c._3)(lev)
          var i = 0
          while (i < nbrs.length) {
            val nb = nbrs(i)
            if (!visited.contains(nb)) {
              visited += nb
              val kn = key(nb)
              if (res.size < ef || Ordering[(Double, Long, Int)]
                  .lt(kn, res.last)) {
                cand += kn
                res += kn
                if (res.size > ef) res -= res.last
              }
            }
            i += 1
          }
        }
      }
      res
    }

    /** Top-k (neighbor_id, cosv) for one query, beam width ef clamped
      * to the shard size (Int.MaxValue = exhaustive mode).
      */
    def searchTopK(qv: Array[Float], k: Int,
        ef: Int): Seq[(Long, Double)] = {
      if (ids.isEmpty) return Nil
      val qn = qNorm(qv)
      require(qn > 0, "HNSW cosine needs a nonzero query vector")
      val efEff = math.max(k, math.min(ef, ids.length))
      // greedy descent through the upper levels (beam 1)
      var ep = entry
      var lev = lvls(entry)
      while (lev > 0) {
        val w = searchLayer(qv, qn, Seq(ep), 1, lev, mutable.BitSet.empty)
        ep = w.head._3
        lev -= 1
      }
      searchLayer(qv, qn, Seq(ep), efEff, 0, mutable.BitSet.empty)
        .iterator.take(k)
        .map(t => (t._2, -t._1))
        .toSeq
    }

    def toNodes(shard: Int): Iterator[HnswNode] =
      ids.indices.iterator.map { i =>
        HnswNode(shard, ids(i), vecs(i), lvls(i),
          adj(i).map(_.map(o => ids(o)).toSeq).toSeq)
      }
  }

  private[similarity] object Graph {

    /** Rebuild the in-memory graph from persisted rows. The entry
      * point is reconstructed deterministically as the LOWEST-ID node
      * holding the maximum level — exactly the node [[construct]]
      * leaves as entry (entry only advances when a later insertion's
      * level strictly exceeds it, and insertion order is id-asc).
      */
    def fromNodes(it: Iterator[HnswNode]): Graph = {
      val rows = it.toArray.sortBy(_.id)
      val ids = rows.map(_.id)
      val ord = ids.zipWithIndex.toMap
      val vecs = rows.map(_.vec)
      val nrms = vecs.map { v =>
        var acc = 0.0
        var i = 0
        while (i < v.length) { acc += v(i).toDouble * v(i).toDouble; i += 1 }
        math.sqrt(acc)
      }
      val lvls = rows.map(_.top_level)
      val adj = rows.map { nd =>
        nd.adj.map(l =>
          mutable.ArrayBuffer.from(l.iterator.map(ord))).toArray
      }
      val entry =
        if (rows.isEmpty) 0
        else lvls.indices.minBy(i => (-lvls(i), ids(i)))
      new Graph(ids, vecs, nrms, lvls, adj, entry)
    }

    /** Deterministic construction over id-sorted (id, vec) rows —
      * HNSW Algorithm 1 with closest-M neighbor selection and
      * (sim desc, id asc) tie-breaks, plus the level-0 chain edges.
      */
    def construct(rows: Array[(Long, Array[Float])], m: Int,
        efConstruction: Int): Graph = {
      val n = rows.length
      val ids = rows.map(_._1)
      val vecs = rows.map(_._2)
      val nrms = vecs.map { v =>
        var acc = 0.0
        var i = 0
        while (i < v.length) { acc += v(i).toDouble * v(i).toDouble; i += 1 }
        val nm = math.sqrt(acc)
        nm
      }
      nrms.zipWithIndex.foreach { case (nm, i) =>
        require(nm > 0, s"HNSW cosine needs nonzero vectors; id ${ids(i)} " +
          "has norm 0 — filter zero vectors before build")
      }
      val lvls = ids.map(levelOf)
      val adj = Array.tabulate(n)(i =>
        Array.fill(lvls(i) + 1)(mutable.ArrayBuffer.empty[Int]))
      val g = new Graph(ids, vecs, nrms, lvls, adj, 0)

      def sim(a: Int, b: Int): Double = {
        val va = vecs(a)
        val vb = vecs(b)
        var acc = 0.0
        var i = 0
        while (i < va.length) {
          acc += va(i).toDouble * vb(i).toDouble
          i += 1
        }
        acc / (nrms(a) * nrms(b))
      }

      var i = 1
      while (i < n) {
        val l = lvls(i)
        var ep = g.entry
        var lev = lvls(g.entry)
        // greedy descent with beam 1 above the node's level
        while (lev > l) {
          var improved = true
          while (improved) {
            improved = false
            val nbrs = adj(ep)(lev)
            var j = 0
            var best = ep
            var bestKey = (-sim(i, ep), ids(ep))
            while (j < nbrs.length) {
              val nb = nbrs(j)
              val kn = (-sim(i, nb), ids(nb))
              if (Ordering[(Double, Long)].lt(kn, bestKey)) {
                best = nb
                bestKey = kn
                improved = true
              }
              j += 1
            }
            ep = best
          }
          lev -= 1
        }
        var eps = Seq(ep)
        var lc = math.min(l, lvls(g.entry))
        while (lc >= 0) {
          val qv = vecs(i)
          val qn = nrms(i)
          // never link a node to itself: seed visited with i
          val w = g.searchLayer(qv, qn, eps, efConstruction, lc,
            mutable.BitSet(i))
          val nbrs = w.iterator.take(m).map(_._3).toArray
          var j = 0
          while (j < nbrs.length) {
            val nb = nbrs(j)
            adj(i)(lc) += nb
            adj(nb)(lc) += i
            val cap = if (lc == 0) 2 * m else m
            if (adj(nb)(lc).length > cap) {
              val pruned = adj(nb)(lc).distinct
                .sortBy(o => (-sim(nb, o), ids(o)))
                .take(cap)
              adj(nb)(lc).clear()
              adj(nb)(lc) ++= pruned
            }
            j += 1
          }
          eps = w.iterator.map(_._3).toSeq
          lc -= 1
        }
        if (l > lvls(g.entry)) g.entry = i
        i += 1
      }
      // level-0 connectivity chain: each node keeps an edge to its
      // insertion-order predecessor, exempt from pruning — guarantees
      // the exhaustive-ef walk reaches every node even if Mmax pruning
      // disconnected a region (≤ 2 extra edges per node)
      var c = 1
      while (c < n) {
        if (!adj(c)(0).contains(c - 1)) adj(c)(0) += (c - 1)
        if (!adj(c - 1)(0).contains(c)) adj(c - 1)(0) += c
        c += 1
      }
      g
    }
  }

}
