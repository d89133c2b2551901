package graft.similarity

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One persisted HNSW node — top-level so the ExpressionEncoder's
  * generated code can reach the accessors (the janino constraint the
  * multimodal tier documents). `adj(l)` is the node's neighbor-id list
  * at level l, 0 ≤ l ≤ top_level; `ins` is the node's insertion
  * ordinal within its shard — consecutive ordinals are chain partners
  * (see the connectivity contract below), which is what lets a loaded
  * graph know which level-0 edges are prune-exempt.
  */
case class HnswNode(shard: Int, id: Long, vec: Array[Float],
    top_level: Int, ins: Int, adj: Seq[Seq[Long]])

/** One per-shard search hit before the global merge. */
case class HnswHit(query_id: Long, neighbor_id: Long, cosv: Double)

/** SHARDED HNSW (Malkov & Yashunin, TPAMI 2018) — the graph-based ANN
  * index every vector-serving stack defaults to (FAISS `IndexHNSW`,
  * hnswlib, Lucene/Elasticsearch KNN, Milvus), packaged like
  * [[IvfIndex]]: build once, persist, load, search — and APPEND:
  * `HnswIndex.append` inserts a new batch into the persisted graphs
  * without a rebuild, the same LSM maintenance contract as
  * `IvfIndex.append` / `IvfPqIndex.append` (graph caveat below).
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
  *  - insertion order is vec_id ascending within each shard (appended
  *    batches likewise, after everything already inserted);
  *  - a node's level is geometric(1/8) from a splitmix64 hash of its
  *    id (trailing-zero triples — integer-exact, seed-free);
  *  - every comparison orders by (similarity desc, id asc), so equal
  *    similarities break to the lower id on both engines;
  *  - similarities replicate FloatVecDot's sequential float→double
  *    fold and `dot / (norm · norm)` bit-for-bit;
  *  - the serving entry point is the lowest-id node holding the
  *    maximum level — recomputed identically by build, append, and
  *    load, so a reloaded graph searches exactly like the one that
  *    was saved.
  *
  * Exactness escape hatch: searching with `ef ≥ shard size` makes the
  * beam exhaustive over each shard's graph — level-0 connectivity is
  * GUARANTEED by sequential chain edges (each node links its
  * insertion-order predecessor; prune-EXEMPT, the standard practical
  * guard against prune-induced disconnection), so the merged result
  * EQUALS brute-force cosine top-k and a plain SQL oracle can
  * hash-check the whole build→save→load/append→search chain.
  * Realistic `ef` trades that guarantee for speed; recall at serving
  * ef is tracked in SCALING.md and asserted by HnswSpec.
  *
  * Append cost contract (the graph caveat): inserting a batch mutates
  * the TOUCHED shards' adjacency (bidirectional links + pruning), so
  * unlike IVF's pure file-append, an HNSW append REWRITES the touched
  * shard partitions (dynamic partition overwrite — untouched shards'
  * files are not rewritten). Per-batch cost = O(batch · log shard)
  * distance work + O(touched shard) IO — bounded by the shards the
  * batch lands in, never the index; the same cost class as compacting
  * one LSM segment.
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
    // take() bounds driver memory BEFORE the guard can refuse — a
    // collect()-then-require would already have materialized an
    // oversized batch when the message fires
    val qRaw = queries.select(col(idCol).cast("long"), col(vecCol))
      .take((1 << 16) + 1)
    require(qRaw.length <= (1 << 16),
      "HNSW search collects the query batch to the driver; got " +
        "more than 65536 queries — split the batch or run " +
        "searches as a stream of bounded batches")
    val qRows = qRaw
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
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
        val g = new Graph()
        g.insertAll(rows, mLocal, efcLocal)
        g.toNodes(shard)
      }
    new HnswIndex(m, efConstruction, nShards, built.toDF())
  }

  /** Insert a batch into a PERSISTED index without rebuilding: each
    * touched shard's graph is reconstructed in memory (no distance
    * work — the adjacency is stored), the batch inserts in id order
    * through the normal HNSW insertion path (chain edges keep the
    * connectivity guarantee, chain-aware pruning keeps old chains
    * intact), and ONLY the touched shard partitions are rewritten via
    * dynamic partition overwrite. Batch ids must be disjoint from the
    * stored ids — duplicates fail loudly.
    */
  /** One conf-isolated clone per root session for the dynamic-
    * partition-overwrite write (r20 advice: never mutate the caller's
    * session-global conf). The clone is MEMOIZED — weakly keyed by the
    * root session — because building a fresh SessionState per append
    * measured ~+1 s on the append queries (three streamed appends paid
    * it three times); its one conf delta never changes, so reuse is
    * safe under concurrent appends.
    *
    * Conf-snapshot semantics (r21 advice): `newSession()` snapshots
    * SQLConf from the SparkContext conf at creation, so RUNTIME conf
    * set later on the caller's session (shuffle width, AQE toggles)
    * does NOT apply to append's scan/cogroup/write jobs — they run
    * under the clone's defaults plus the one overwrite-mode key.
    * Callers that tune runtime conf around appends must set it on the
    * SparkContext conf before the first append instead.
    */
  private val overwriteSessions = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, SparkSession]())

  private def overwriteSession(spark: SparkSession): SparkSession =
    overwriteSessions.synchronized {
      var ss = overwriteSessions.get(spark)
      if (ss == null) {
        ss = spark.newSession()
        ss.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        overwriteSessions.put(spark, ss)
      }
      ss
    }

  def append(spark: SparkSession, path: String, batch: DataFrame,
      idCol: String, vecCol: String): Unit = {
    val ss = overwriteSession(spark)
    val idx = load(ss, path)
    import ss.implicits._
    val mLocal = idx.m
    val efcLocal = idx.efConstruction
    val b = batch
      .select(pmod(col(idCol), lit(idx.nShards)).cast("int").as("shard"),
        col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .as[(Int, Long, Array[Float])]
    // touched-shard pruning: the O(touched shard) cost contract means
    // the UNTOUCHED shards must not even be scanned — collect the
    // batch's shard set (<= nShards values) and let the shard-
    // partitioned parquet layout prune the rest at the scan. An empty
    // set doubles as the empty-batch check (nothing to insert, nothing
    // to rewrite), so no separate isEmpty job runs.
    val touched = b.map(_._1).distinct().collect().toSeq
    if (touched.isEmpty) return
    val updated = idx.nodes
      .filter(col("shard").isin(touched: _*))
      .as[HnswNode]
      .groupByKey(_.shard)
      .cogroup(b.groupByKey(_._1)) {
        (shard: Int, ns: Iterator[HnswNode],
            bs: Iterator[(Int, Long, Array[Float])]) =>
          val rows = bs.map { case (_, id, v) => (id, v) }.toArray
            .sortBy(_._1)
          if (rows.isEmpty) Iterator.empty // untouched shard: no rewrite
          else {
            val g = Graph.fromNodes(ns)
            g.insertAll(rows, mLocal, efcLocal)
            g.toNodes(shard)
          }
      }
      .toDF()
      // eager: detach from the input files BEFORE the overwrite job
      // deletes the partitions it read from
      .localCheckpoint()
    updated.write.mode("overwrite").partitionBy("shard")
      .parquet(s"$path/nodes")
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

  /** In-memory per-shard graph: growable state so construction and
    * APPEND share one insertion path. `chainPrev(i) = i - 1` by
    * construction (consecutive insertion ordinals are chain partners);
    * chain edges at level 0 are exempt from Mmax pruning, which is
    * what makes the exhaustive-ef walk provably complete even after
    * appends prune around old nodes. Package-private for HnswSpec.
    */
  private[similarity] final class Graph {
    val ids = mutable.ArrayBuffer.empty[Long]
    val vecs = mutable.ArrayBuffer.empty[Array[Float]]
    val nrms = mutable.ArrayBuffer.empty[Double]
    val lvls = mutable.ArrayBuffer.empty[Int]
    val adj = mutable.ArrayBuffer.empty[Array[mutable.ArrayBuffer[Int]]]
    var entry: Int = -1
    private val ord = mutable.HashMap.empty[Long, Int]

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

    private def sim(a: Int, b: Int): Double =
      dotQ(vecs(a), b) / (nrms(a) * nrms(b))

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
        eps: Seq[Int], ef: Int, lev: Int,
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

    /** One HNSW insertion (Algorithm 1, closest-M selection,
      * (sim desc, id asc) tie-breaks) followed by the chain link to
      * the insertion-order predecessor. Chain edges (consecutive
      * ordinals) survive pruning.
      */
    def insert(id: Long, vec: Array[Float], m: Int,
        efConstruction: Int): Unit = {
      require(!ord.contains(id),
        s"HNSW append: id $id already in the index — appends must " +
          "carry only new ids (dedupe the batch against the index first)")
      var acc = 0.0
      var x = 0
      while (x < vec.length) {
        acc += vec(x).toDouble * vec(x).toDouble
        x += 1
      }
      val nm = math.sqrt(acc)
      require(nm > 0, s"HNSW cosine needs nonzero vectors; id $id " +
        "has norm 0 — filter zero vectors before build/append")
      val l = levelOf(id)
      val i = ids.length
      ids += id
      vecs += vec
      nrms += nm
      lvls += l
      adj += Array.fill(l + 1)(mutable.ArrayBuffer.empty[Int])
      ord(id) = i
      if (entry < 0) { entry = i; chainLink(i); return }

      var ep = entry
      var lev = lvls(entry)
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
      var lc = math.min(l, lvls(entry))
      while (lc >= 0) {
        // never link a node to itself: seed visited with i
        val w = searchLayer(vecs(i), nrms(i), eps, efConstruction, lc,
          mutable.BitSet(i))
        val nbrs = w.iterator.take(m).map(_._3).toArray
        var j = 0
        while (j < nbrs.length) {
          val nb = nbrs(j)
          adj(i)(lc) += nb
          adj(nb)(lc) += i
          val cap = if (lc == 0) 2 * m else m
          if (adj(nb)(lc).length > cap) prune(nb, lc, cap)
          j += 1
        }
        eps = w.iterator.map(_._3).toSeq
        lc -= 1
      }
      if (l > lvls(entry)) entry = i
      chainLink(i)
    }

    /** Trim a neighbor list to `cap` keeping the most similar (tie
      * lower id) — PLUS the level-0 chain partners (ordinals i±1),
      * which are exempt so appends can never disconnect the walk.
      */
    private def prune(nb: Int, lc: Int, cap: Int): Unit = {
      val kept = adj(nb)(lc).distinct
        .sortBy(o => (-sim(nb, o), ids(o)))
        .take(cap)
      val withChains =
        if (lc != 0) kept
        else {
          val chains = adj(nb)(lc).distinct
            .filter(o => o == nb - 1 || o == nb + 1)
          (kept ++ chains).distinct
        }
      adj(nb)(lc).clear()
      adj(nb)(lc) ++= withChains
    }

    /** Chain the node to its insertion-order predecessor at level 0 —
      * the connectivity backbone (≤ 2 extra edges per node).
      */
    private def chainLink(i: Int): Unit = {
      if (i > 0) {
        if (!adj(i)(0).contains(i - 1)) adj(i)(0) += (i - 1)
        if (!adj(i - 1)(0).contains(i)) adj(i - 1)(0) += i
      }
    }

    /** Insert a sorted batch, then settle the entry on the
      * lowest-id/max-level contract shared with [[Graph.fromNodes]] —
      * so a reloaded graph serves identically to this one.
      */
    def insertAll(rows: Array[(Long, Array[Float])], m: Int,
        efConstruction: Int): Unit = {
      rows.foreach { case (id, v) => insert(id, v, m, efConstruction) }
      if (ids.nonEmpty)
        entry = ids.indices.minBy(i => (-lvls(i), ids(i)))
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
        HnswNode(shard, ids(i), vecs(i), lvls(i), i,
          adj(i).map(_.map(o => ids(o)).toSeq).toSeq)
      }
  }

  private[similarity] object Graph {

    /** Rebuild the in-memory graph from persisted rows: ordinals are
      * the stored insertion ordinals (`ins`), so chain partners stay
      * consecutive and pruning protection survives the round-trip.
      * The entry point is the LOWEST-ID node holding the maximum
      * level — the contract [[Graph.insertAll]] settles on, so load
      * and in-memory serving agree.
      */
    def fromNodes(it: Iterator[HnswNode]): Graph = {
      val rows = it.toArray.sortBy(_.ins)
      val g = new Graph()
      rows.indices.foreach { i =>
        require(rows(i).ins == i,
          s"HNSW shard corrupt: insertion ordinals not contiguous at $i")
      }
      val ord = rows.map(_.id).zipWithIndex.toMap
      rows.foreach { nd =>
        var acc = 0.0
        var x = 0
        while (x < nd.vec.length) {
          acc += nd.vec(x).toDouble * nd.vec(x).toDouble
          x += 1
        }
        g.ids += nd.id
        g.vecs += nd.vec
        g.nrms += math.sqrt(acc)
        g.lvls += nd.top_level
        g.adj += nd.adj.map(l =>
          mutable.ArrayBuffer.from(l.iterator.map(ord))).toArray
      }
      ord.foreach { case (id, i) => g.ord(id) = i }
      g.entry =
        if (rows.isEmpty) -1
        else g.lvls.indices.minBy(i => (-g.lvls(i), g.ids(i)))
      g
    }
  }
}
