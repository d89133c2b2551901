package graft.queries

import graft.{QueryDef, Quant, Tables}
import graft.functions.TextFns
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One MMR candidate: a retrieval hit carrying its query-relevance
  * cosine and its raw vector for the in-group pairwise scoring.
  * TOP-LEVEL case class — janino rejects serializers generated for
  * nested ones and Spark silently falls back to interpreted encoders.
  */
case class MmrCand(
    query_id: Long, vec_id: Long, relv: Double, embedding: Array[Float])

/** One MMR selection: rank within the query's diversified list, the
  * original relevance, and the marginal-relevance score that won the
  * greedy step (== relv at rank 1 by definition).
  */
case class MmrPick(
    query_id: Long, rnk: Int, vec_id: Long, relv: Double,
    mmr_score: Double)

/** Similarity search over the `embeddings` table (64-dim float
  * vectors): brute-force cosine top-k as the exactness baseline, an
  * IVF (inverted-file) bucketed variant as the scale path, cosine
  * range search, and exact per-label centroids.
  *
  * Scale notes (100 TB):
  *  - brute force broadcasts the (small) query set so the corpus never
  *    shuffles: each partition scores its vectors and emits only its
  *    local top-k candidates before the final per-query window;
  *  - IVF cuts scoring to nprobe/nlist of the corpus: vectors are
  *    partitioned by nearest centroid once (a cheap narrow pass over
  *    broadcast centroids), and queries probe only their 2 nearest
  *    centroid buckets — the relative speedup grows with nlist;
  *  - centroids use order-independent decimal sums, never double
  *    accumulation, so results are deterministic under any partitioning.
  */
object Similarity {

  private val NumCentroids = 16
  private val NumProbe = 2
  private val TopK = 5

  /** Brute-force cosine top-5: queries are vec_id < 20, corpus is
    * vec_id >= 20. Deterministic rank order: (cosine desc, id asc);
    * the cosine doubles are bit-identical to the oracle's.
    *
    * The query set is broadcast so the corpus never shuffles for the
    * scoring pass, and the ranking runs through the bounded
    * [[graft.operators.TopKPairsAgg]]: each map task keeps at most k
    * candidates per query, so the shuffle carries k pairs per
    * (query, partition) instead of the full scored product — the
    * per-query reduce side merges k-lists no matter how large the
    * corpus grows. Scores ride the aggregate as order-preserving
    * sortable bits ([[graft.functions.DoubleSortableBits]]) and decode
    * back bit-exact.
    */
  private def knnBrute(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{DoubleSortableBits, SortableBitsToDouble}
    val e = Tables(s, dir, "embeddings")
      .withColumn("nrm", TextFns.norm(col("embedding")))
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("nrm").as("qn"))
    val corpus = e.filter(col("vec_id") >= 20)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"),
        col("nrm").as("nn"))
    corpus.crossJoin(broadcast(queries))
      .withColumn("cosv", TextFns.cosineFrom(
        TextFns.dot(col("qv"), col("nv")), col("qn"), col("nn")))
      .groupBy(col("query_id"))
      .agg(graft.operators.TopKPairsAgg(
        DoubleSortableBits(col("cosv")), col("neighbor_id"), TopK).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("i", "p")))
      .select(col("query_id"), col("p.tie").as("neighbor_id"),
        (col("i") + 1).as("rnk"),
        SortableBitsToDouble(col("p.value")).as("cosv"))
      .orderBy(col("query_id"), col("rnk"))
  }

  private val knnBruteSql =
    s"""WITH scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
       |                           CAST(c.embedding AS DOUBLE[])) AS cosv
       |  FROM embeddings q JOIN embeddings c
       |    ON q.vec_id < 20 AND c.vec_id >= 20),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosv DESC, neighbor_id) AS rnk
       |  FROM scored)
       |SELECT query_id, neighbor_id, rnk, cosv FROM ranked
       |WHERE rnk <= $TopK ORDER BY query_id, rnk""".stripMargin

  /** IVF top-5: the first $NumCentroids corpus vectors act as fixed
    * centroids; every corpus vector is assigned to its nearest
    * centroid (cosine, ties to the lower centroid id), and each query
    * searches only its $NumProbe nearest centroid buckets. Approximate
    * by design — the oracle runs the identical algorithm, so results
    * still hash-match.
    */
  private def knnIvf(s: SparkSession, dir: String): DataFrame =
    knnIvfAt(s, dir, NumProbe)

  private def knnIvfAt(s: SparkSession, dir: String,
      nprobe: Int): DataFrame = {
    val e = Tables(s, dir, "embeddings")
    // centroid matrix on the driver (NumCentroids x dim floats,
    // promoted losslessly) — assignment and probing are each ONE
    // narrow NearestCentroids projection, constant plan width in
    // nlist and no corpus x centroids row fan-out
    val cm: Seq[Seq[Double]] = e.filter(col("vec_id") < NumCentroids)
      .select(col("vec_id"), col("embedding")).collect()
      .sortBy(_.getLong(0))
      .map(_.getSeq[Float](1).map(_.toDouble).toSeq).toSeq
    val corpus = e.filter(col("vec_id") >= 20)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"))
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))

    // assign: nearest centroid per corpus vector (narrow)
    val assigned = corpus
      .withColumn("cent_id",
        graft.functions.NearestCentroids(col("nv"), cm, 1)
          .getItem(0).getField("cid"))
      .select(col("neighbor_id"), col("nv"), col("cent_id"))

    // probe: top-NumProbe centroids per query (explode of the
    // k-element result)
    val probes = queries
      .select(col("query_id"), col("qv"), explode(
        graft.functions.NearestCentroids(col("qv"), cm, nprobe)).as("nc"))
      .select(col("query_id"), col("qv"), col("nc").getField("cid").as("cent_id"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosv").desc, col("neighbor_id"))
    probes.join(assigned, "cent_id")
      .withColumn("cosv", TextFns.cosine(col("qv"), col("nv")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= TopK)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), col("cosv"))
      .orderBy(col("query_id"), col("rnk"))
  }

  private val knnIvfSql = knnIvfSqlAt(NumProbe)

  private def knnIvfSqlAt(nprobe: Int): String =
    s"""WITH cents AS (
       |  SELECT vec_id AS cent_id, CAST(embedding AS DOUBLE[]) AS cv
       |  FROM embeddings WHERE vec_id < $NumCentroids),
       |corpus AS (
       |  SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS nv
       |  FROM embeddings WHERE vec_id >= 20),
       |queries AS (
       |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
       |  FROM embeddings WHERE vec_id < 20),
       |assigned AS (
       |  SELECT neighbor_id, nv, cent_id FROM (
       |    SELECT neighbor_id, nv, cent_id,
       |      row_number() OVER (PARTITION BY neighbor_id
       |        ORDER BY list_cosine_similarity(nv, cv) DESC, cent_id) AS arnk
       |    FROM corpus, cents)
       |  WHERE arnk = 1),
       |probes AS (
       |  SELECT query_id, qv, cent_id FROM (
       |    SELECT query_id, qv, cent_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY list_cosine_similarity(qv, cv) DESC, cent_id) AS prnk
       |    FROM queries, cents)
       |  WHERE prnk <= $nprobe),
       |scored AS (
       |  SELECT query_id, neighbor_id,
       |    list_cosine_similarity(qv, nv) AS cosv
       |  FROM probes JOIN assigned USING (cent_id)),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosv DESC, neighbor_id) AS rnk
       |  FROM scored)
       |SELECT query_id, neighbor_id, rnk, cosv FROM ranked
       |WHERE rnk <= $TopK ORDER BY query_id, rnk""".stripMargin

  /** CORPUS self-k-NN GRAPH — every vector's top-$TopK neighbors
    * among ALL other vectors, plus the reciprocal-edge flag. This is
    * the construction step graph-based curation consumes (SNN
    * clustering, graph dedup, kNN-graph diversity sampling): where
    * `sim_knn_ivf` answers queries against a corpus, this builds the
    * corpus's own neighborhood structure. Candidates come from the
    * same IVF machinery — assign once (narrow NearestCentroids
    * projection), probe each vector's $NumProbe nearest buckets — so
    * the pair stream is bucket-keyed and bounded by
    * Σ bucket_size·probes, never corpus²; the `mutual` flag is one
    * edge-list-sized self-join (the symmetrization every kNN-graph
    * consumer performs first). Approximate by design; the oracle runs
    * the identical probe algorithm, so rows hash-match.
    */
  /** kNN-graph centroid count for an n-vector corpus, loudly capped
    * (the ConnectedComponents.alternatingStars / pairPagerankWith
    * convention): nlist grows as corpus/256 (bounded expected bucket
    * occupancy) and the demo geometry holds the centroid table on the
    * driver, so bound that collect explicitly — 2^17 centroids ×
    * 64-dim doubles ≈ 64 MB, the most one node should hold. The cap
    * trips at ~33M vectors; past it, train centroids distributed
    * (sim_kmeans_ivf machinery) and broadcast-join the assignment
    * instead of closing over a driver array.
    */
  private[graft] def boundedNlist(corpusRows: Long): Int = {
    val nlist = math.max(NumCentroids,
      math.ceil(corpusRows / 256.0).toInt)
    require(nlist <= (1 << 17),
      s"knnGraph: nlist=$nlist exceeds the driver-resident centroid " +
        "cap (2^17) — train centroids with the sim_kmeans_ivf " +
        "machinery and shard the assignment instead")
    nlist
  }

  /** The kNN-graph edge builder shared by [[knnGraph]] and its two
    * graph consumers ([[labelNoise]], [[snnClusters]]): unordered
    * (src_id, neighbor_id, rnk, cosv, mutual) edges. One construction,
    * three readouts — exactly how a production curation pass uses the
    * graph (build once, fan the consumers over the edge list).
    */
  private def knnGraphEdges(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
    // nlist SCALES with the corpus (bounded expected bucket occupancy
    // ~256) instead of the query tier's fixed 16: a self-join's pair
    // mass is Σ bucket²-shaped, so fixed nlist degrades toward
    // n²/nlist as the corpus grows (measured: slope 0.68 over
    // sf0.01→sf1* at nlist=16); bounded buckets keep the pair stream
    // ~n·nprobe·256 — linear. The demo geometry takes the first nlist
    // vectors as centroids (the fixed-seed house convention) and
    // holds them on the driver; a production deployment trains them
    // (sim_kmeans_ivf machinery) and shards the assignment once the
    // centroid table itself outgrows one node.
    val nlist = boundedNlist(e.count())
    val cm: Seq[Seq[Double]] = e.filter(col("vec_id") < nlist)
      .select(col("vec_id"), col("embedding")).collect()
      .sortBy(_.getLong(0))
      .map(_.getSeq[Float](1).map(_.toDouble).toSeq).toSeq
    val base = e.select(col("vec_id"), col("embedding").as("v"))
    val assigned = base
      .withColumn("cent_id",
        graft.functions.NearestCentroids(col("v"), cm, 1)
          .getItem(0).getField("cid"))
    val probes = base
      .select(col("vec_id").as("src_id"), col("v").as("sv"), explode(
        graft.functions.NearestCentroids(col("v"), cm, NumProbe)).as("nc"))
      .select(col("src_id"), col("sv"),
        col("nc").getField("cid").as("cent_id"))
    val w = Window.partitionBy(col("src_id"))
      .orderBy(col("cosv").desc, col("vec_id"))
    val edges = probes.join(assigned, "cent_id")
      .filter(col("vec_id") =!= col("src_id"))
      .withColumn("cosv", TextFns.cosine(col("sv"), col("v")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= TopK)
      .select(col("src_id"), col("vec_id").as("neighbor_id"),
        col("rnk"), col("cosv"))
    val rev = edges
      .select(col("neighbor_id").as("src_id"),
        col("src_id").as("neighbor_id"), lit(true).as("m"))
    edges.join(rev, Seq("src_id", "neighbor_id"), "left")
      .withColumn("mutual", coalesce(col("m"), lit(false))).drop("m")
  }

  private def knnGraph(s: SparkSession, dir: String): DataFrame =
    knnGraphEdges(s, dir).orderBy(col("src_id"), col("rnk"))

  private val knnGraphSql =
    s"""WITH nl AS (
       |  SELECT greatest($NumCentroids,
       |    CAST(ceil(count(*) / 256.0) AS BIGINT)) AS nlist
       |  FROM embeddings),
       |cents AS (
       |  SELECT vec_id AS cent_id, CAST(embedding AS DOUBLE[]) AS cv
       |  FROM embeddings, nl WHERE vec_id < nlist),
       |vecs AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |assigned AS (
       |  SELECT vec_id, v, cent_id FROM (
       |    SELECT vec_id, v, cent_id,
       |      row_number() OVER (PARTITION BY vec_id
       |        ORDER BY list_cosine_similarity(v, cv) DESC, cent_id) AS arnk
       |    FROM vecs, cents)
       |  WHERE arnk = 1),
       |probes AS (
       |  SELECT vec_id AS src_id, v AS sv, cent_id FROM (
       |    SELECT vec_id, v, cent_id,
       |      row_number() OVER (PARTITION BY vec_id
       |        ORDER BY list_cosine_similarity(v, cv) DESC, cent_id) AS prnk
       |    FROM vecs, cents)
       |  WHERE prnk <= $NumProbe),
       |scored AS (
       |  SELECT p.src_id, a.vec_id AS neighbor_id,
       |    list_cosine_similarity(p.sv, a.v) AS cosv
       |  FROM probes p JOIN assigned a USING (cent_id)
       |  WHERE a.vec_id <> p.src_id),
       |edges AS (
       |  SELECT src_id, neighbor_id, rnk, cosv FROM (
       |    SELECT *, row_number() OVER (PARTITION BY src_id
       |        ORDER BY cosv DESC, neighbor_id) AS rnk
       |    FROM scored)
       |  WHERE rnk <= $TopK)
       |SELECT e.src_id, e.neighbor_id, e.rnk, e.cosv,
       |  m.src_id IS NOT NULL AS mutual
       |FROM edges e LEFT JOIN (SELECT src_id, neighbor_id FROM edges) m
       |  ON m.src_id = e.neighbor_id AND m.neighbor_id = e.src_id
       |ORDER BY e.src_id, e.rnk""".stripMargin

  /** kNN LABEL-NOISE detection (confident-learning-style curation,
    * Northcutt et al. JAIR'21 reduced to its kNN-agreement core): for
    * every vector, the share of its kNN-graph neighbors carrying the
    * SAME label; vectors whose neighborhood disagrees with their own
    * label (agreement < 0.5) are flagged `suspect` — the candidates a
    * labeled-data curation pass re-audits or drops. Consumes the
    * [[knnGraphEdges]] construction unchanged, so the candidate
    * generation stays bucket-keyed (never corpus²).
    *
    * Scale shape: the label join runs on the EDGE list (n·k rows, k=5
    * — linear in the corpus) keyed by neighbor_id, then one map-side
    * combinable per-source aggregation; nothing corpus-sized is
    * collected or broadcast beyond the centroid table the graph
    * already bounds ([[boundedNlist]]). The agreement ratio is a
    * rational of exact counts, so it rides [[graft.Quant.qdec]].
    */
  private def labelNoise(s: SparkSession, dir: String): DataFrame = {
    val labels = Tables(s, dir, "embeddings")
      .select(col("vec_id"), col("label"))
    knnGraphEdges(s, dir)
      .join(labels.select(col("vec_id").as("neighbor_id"),
        col("label").as("n_label")), "neighbor_id")
      .join(labels.select(col("vec_id").as("src_id"), col("label")),
        "src_id")
      .groupBy(col("src_id"), col("label"))
      .agg(count(lit(1)).as("n_neighbors"),
        sum(when(col("n_label") === col("label"), 1L).otherwise(0L))
          .as("n_agree"))
      .withColumn("agree_frac", Quant.qdec(
        col("n_agree").cast("double") / col("n_neighbors"), 9))
      .withColumn("suspect", col("agree_frac") < 0.5)
      .select(col("src_id").as("vec_id"), col("label"),
        col("n_neighbors"), col("n_agree"), col("agree_frac"),
        col("suspect"))
      .orderBy(col("vec_id"))
  }

  private val labelNoiseSql =
    s"""WITH g AS ($knnGraphSql),
       |lab AS (SELECT vec_id, label FROM embeddings)
       |SELECT g.src_id AS vec_id, ls.label,
       |  count(*) AS n_neighbors,
       |  CAST(sum(CASE WHEN ln.label = ls.label THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_agree,
       |  ${Quant.qdecSql(
      "CAST(sum(CASE WHEN ln.label = ls.label THEN 1 ELSE 0 END) " +
        "AS DOUBLE) / count(*)", 9)} AS agree_frac,
       |  ${Quant.qdecSql(
      "CAST(sum(CASE WHEN ln.label = ls.label THEN 1 ELSE 0 END) " +
        "AS DOUBLE) / count(*)", 9)} < 0.5 AS suspect
       |FROM g
       |  JOIN lab ls ON ls.vec_id = g.src_id
       |  JOIN lab ln ON ln.vec_id = g.neighbor_id
       |GROUP BY 1, 2 ORDER BY vec_id""".stripMargin

  /** SNN (shared/mutual-nearest-neighbor) CLUSTERS: connected
    * components over the kNN graph's MUTUAL edges — the graph-native
    * semantic clustering (Ertöz et al. SDM'03's core step) that
    * complements the centroid-based SemDeDup tier: mutual-kNN keeps
    * only reciprocated affinity, so chains of one-sided neighbors
    * never glue unrelated regions together. Output labels every
    * vector that HAS a mutual edge with its component (min member id,
    * the dd_components convention) and the component's size — the
    * frame a diversity sampler or per-cluster cap consumes directly.
    *
    * Scale shape: edge construction is the bucket-keyed
    * [[knnGraphEdges]]; the component loop is
    * [[graft.dedup.ConnectedComponents.alternatingStars]] — O(log² n)
    * large-star/small-star rounds on any graph shape with the loudly
    * capped union-find endgame absorbing the converged tail, so a
    * crawl-scale mutual graph converges in a handful of rounds.
    */
  private def snnClusters(s: SparkSession, dir: String): DataFrame = {
    val mutualPairs = knnGraphEdges(s, dir)
      .filter(col("mutual") && col("src_id") < col("neighbor_id"))
      .select(col("src_id"), col("neighbor_id"))
    val comp = graft.dedup.ConnectedComponents
      .alternatingStars(mutualPairs)
      .select(col("node").as("vec_id"), col("component"))
    comp
      .withColumn("n_members",
        count(lit(1)).over(Window.partitionBy(col("component"))))
      .orderBy(col("vec_id"))
  }

  private val snnClustersSql =
    s"""WITH RECURSIVE g AS ($knnGraphSql),
       |mp AS (
       |  SELECT src_id AS a, neighbor_id AS b FROM g
       |  WHERE mutual AND src_id < neighbor_id),
  |-- NOT named `edges`: DuckDB resolves the nested g body's own
  |-- `FROM edges` against a SAME-NAMED outer CTE (binder error)
       |und AS (SELECT a, b FROM mp UNION SELECT b AS a, a AS b FROM mp),
       |walk AS (
       |  SELECT a AS node, a AS reach FROM und
       |  UNION
       |  SELECT e.a AS node, w.reach
       |  FROM und e JOIN walk w ON e.b = w.node),
       |comp AS (
       |  SELECT node AS vec_id, min(reach) AS component
       |  FROM walk GROUP BY node)
       |SELECT vec_id, component,
       |  count(*) OVER (PARTITION BY component) AS n_members
       |FROM comp ORDER BY vec_id""".stripMargin

  /** Maximal-marginal-relevance pool / picks / trade-off constants.
    * The λ literals are kept as STRINGS so the SQL carries "0.7"/"0.3"
    * verbatim — deriving 1−λ in Scala would print 0.30000000000000004
    * and the two engines would score different objectives.
    */
  private val MmrPool = 16
  private val MmrK = 5
  private val MmrLambdaSql = "0.7"
  private val MmrOneMinusLambdaSql = "0.3"
  // the Scala loop parses the SAME literals the SQL carries, so the
  // two engines' objectives cannot drift apart in a future edit
  private val MmrLambda = MmrLambdaSql.toDouble
  private val MmrOneMinusLambda = MmrOneMinusLambdaSql.toDouble

  /** MMR DIVERSITY RE-RANK (Carbonell & Goldstein, SIGIR'98): each
    * query's top-$MmrPool cosine candidates are greedily re-ranked by
    * marginal relevance — step score = λ·cos(q,d) − (1−λ)·max cos(d,s)
    * over the already-selected s — keeping $MmrK. The retrieval-tier
    * step RAG/dedup-aware search pipelines run after ANN candidate
    * generation so near-duplicate hits don't crowd out coverage.
    *
    * Scale shape: candidate generation is the broadcast-queries +
    * bounded [[graft.operators.TopKPairsAgg]] scan of `sim_knn_brute`
    * (map-side k-lists; the corpus never shuffles), so the sequential
    * part touches only query_count·$MmrPool rows. The greedy loop is
    * genuinely order-dependent — each step's scores depend on the
    * previous pick — so it runs as one typed `flatMapGroups` per
    * query (≤ $MmrPool² pair cosines per group, embarrassingly
    * parallel across queries): the canonical "imperative logic only
    * where Spark genuinely can't express it" placement. Pair cosines
    * inside the group replicate [[graft.functions.FloatVecDot]]'s
    * sequential fold + `dot/(√·√)` bit-for-bit, so every double
    * equals the oracle's `list_cosine_similarity` and the argmax
    * chain cannot diverge; candidate iteration is vec_id-sorted and
    * ties break to the lower id on both engines.
    */
  private def mmrRerank(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{DoubleSortableBits, SortableBitsToDouble}
    val e = Tables(s, dir, "embeddings")
      .withColumn("nrm", TextFns.norm(col("embedding")))
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("nrm").as("qn"))
    val corpus = e.filter(col("vec_id") >= 20)
      .select(col("vec_id").as("cand_id"), col("embedding").as("cv"),
        col("nrm").as("cn"))
    val cands = corpus.crossJoin(broadcast(queries))
      .withColumn("relv", TextFns.cosineFrom(
        TextFns.dot(col("qv"), col("cv")), col("qn"), col("cn")))
      .groupBy(col("query_id"))
      .agg(graft.operators.TopKPairsAgg(
        DoubleSortableBits(col("relv")), col("cand_id"), MmrPool).as("top"))
      .select(col("query_id"), explode(col("top")).as("p"))
      .select(col("query_id"), col("p.tie").as("vec_id"),
        SortableBitsToDouble(col("p.value")).as("relv"))
    val pool = Tables(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .join(broadcast(cands), "vec_id")
      .select(col("query_id"), col("vec_id"), col("relv"), col("embedding"))
    val enc = org.apache.spark.sql.Encoders.product[MmrCand]
    val outEnc = org.apache.spark.sql.Encoders.product[MmrPick]
    pool.as[MmrCand](enc)
      .groupByKey(_.query_id)(org.apache.spark.sql.Encoders.scalaLong)
      .flatMapGroups { (qid: Long, it: Iterator[MmrCand]) =>
        // FloatVecDot replica: sequential float->double fold
        def dot(a: Array[Float], b: Array[Float]): Double = {
          var acc = 0.0; var i = 0
          while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
          acc
        }
        // cosineFrom replica: dot / (sqrt(aa) * sqrt(bb)) -- NOT
        // sqrt(aa*bb), which differs in the last ulp
        def cos(a: MmrCand, b: MmrCand): Double =
          dot(a.embedding, b.embedding) /
            (math.sqrt(dot(a.embedding, a.embedding)) *
              math.sqrt(dot(b.embedding, b.embedding)))
        val remaining = scala.collection.mutable.ArrayBuffer.from(
          it.toArray.sortBy(_.vec_id))
        // fail LOUD on zero-norm pool members: their pair cosines are
        // NaN, and Spark's strict '>' defers NaN scores to last while
        // DuckDB's ORDER BY sorts NaN first — a silent cross-engine
        // rank divergence. No fixture vector is zero-norm; a corpus
        // that ships one should filter it before retrieval.
        remaining.foreach { c =>
          require(dot(c.embedding, c.embedding) > 0,
            s"mmr_rerank: vec_id ${c.vec_id} has zero-norm embedding — " +
              "filter zero vectors before the candidate scan")
          // the QUERY vector's zero-norm case surfaces as NaN relevance
          // on every pool row (cosineFrom divides by the query norm);
          // fail as loudly as the pool-member case instead of letting
          // the bestI backstop silently pick the lowest-index candidate
          // (r20 advice)
          require(!c.relv.isNaN,
            s"mmr_rerank: query $qid has NaN relevance (zero-norm query " +
              "embedding) — filter zero vectors before retrieval")
        }
        val selected = scala.collection.mutable.ArrayBuffer.empty[MmrCand]
        val out = scala.collection.mutable.ArrayBuffer.empty[MmrPick]
        while (selected.length < MmrK && remaining.nonEmpty) {
          var bestI = -1
          var bestScore = Double.NegativeInfinity
          var i = 0
          while (i < remaining.length) {
            val c = remaining(i)
            val score =
              if (selected.isEmpty) c.relv
              else {
                var maxSim = Double.NegativeInfinity
                var j = 0
                while (j < selected.length) {
                  val sv = cos(c, selected(j))
                  if (sv > maxSim) maxSim = sv
                  j += 1
                }
                MmrLambda * c.relv - MmrOneMinusLambda * maxSim
              }
            // strict >: the vec_id-ascending scan makes ties keep the
            // lower id, matching the oracle's (score DESC, vec_id)
            if (score > bestScore) { bestScore = score; bestI = i }
            i += 1
          }
          // Backstop only (zero norms now fail loud above): if every
          // score were NaN, strict '>' would never fire and remove(-1)
          // would throw — fall back to the lowest-vec_id candidate
          // rather than crash mid-query.
          if (bestI < 0) { bestI = 0; bestScore = Double.NaN }
          val pick = remaining.remove(bestI)
          selected += pick
          out += MmrPick(qid, selected.length, pick.vec_id, pick.relv,
            bestScore)
        }
        out.iterator
      }(outEnc)
      .toDF()
      .orderBy(col("query_id"), col("rnk"))
  }

  /** The same greedy unrolled into $MmrK DuckDB CTE stages (the
    * ta_bpe_train oracle convention — both sides generated from one
    * literal): selN picks stage N's argmax, accN accumulates; stage
    * scores read the candidate-pair cosine table `prs` through a
    * correlated max over the accumulated picks.
    */
  private val mmrRerankSql: String = {
    val base =
      s"""WITH q AS (
         |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
         |  FROM embeddings WHERE vec_id < 20),
         |c AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv
         |  FROM embeddings WHERE vec_id >= 20),
         |cand AS (
         |  SELECT query_id, vec_id, relv FROM (
         |    SELECT q.query_id, c.vec_id,
         |      list_cosine_similarity(q.qv, c.cv) AS relv,
         |      row_number() OVER (PARTITION BY q.query_id
         |        ORDER BY list_cosine_similarity(q.qv, c.cv) DESC,
         |          c.vec_id) AS rn
         |    FROM q, c)
         |  WHERE rn <= $MmrPool),
         |prs AS (
         |  SELECT a.query_id, a.vec_id AS ia, b.vec_id AS ib,
         |    list_cosine_similarity(ca.cv, cb.cv) AS cosv
         |  FROM cand a JOIN cand b
         |    ON a.query_id = b.query_id AND a.vec_id <> b.vec_id
         |  JOIN c ca ON ca.vec_id = a.vec_id
         |  JOIN c cb ON cb.vec_id = b.vec_id),
         |sel1 AS (
         |  SELECT query_id, 1 AS rnk, vec_id, relv, relv AS mmr_score
         |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY relv DESC, vec_id) AS rn FROM cand)
         |  WHERE rn = 1),
         |acc1 AS (SELECT * FROM sel1)""".stripMargin
    val steps = (2 to MmrK).map { k =>
      s"""sc$k AS (
         |  SELECT cd.query_id, cd.vec_id, cd.relv,
         |    $MmrLambdaSql * cd.relv - $MmrOneMinusLambdaSql * (
         |      SELECT max(p.cosv) FROM prs p, acc${k - 1} s
         |      WHERE p.query_id = cd.query_id AND p.ia = cd.vec_id
         |        AND s.query_id = cd.query_id AND p.ib = s.vec_id)
         |      AS mmr_score
         |  FROM cand cd
         |  WHERE NOT EXISTS (SELECT 1 FROM acc${k - 1} s
         |    WHERE s.query_id = cd.query_id AND s.vec_id = cd.vec_id)),
         |sel$k AS (
         |  SELECT query_id, $k AS rnk, vec_id, relv, mmr_score
         |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY mmr_score DESC, vec_id) AS rn FROM sc$k)
         |  WHERE rn = 1),
         |acc$k AS (SELECT * FROM acc${k - 1} UNION ALL SELECT * FROM sel$k)"""
        .stripMargin
    }
    base + ",\n" + steps.mkString(",\n") +
      s"\nSELECT query_id, rnk, vec_id, relv, mmr_score FROM acc$MmrK" +
      "\nORDER BY query_id, rnk"
  }

  /** IVF recall-vs-nprobe sweep: total recall@$TopK against the
    * brute-force ground truth at nprobe ∈ {1, 2, 4} — the
    * operational curve behind the index's one tuning knob. At 100 TB
    * this table is what decides the latency/recall trade per query
    * class; computing it from the same assignment pass three times
    * keeps the probe cost the only variable.
    */
  private def ivfNprobeSweep(s: SparkSession, dir: String): DataFrame = {
    val brute = knnBrute(s, dir).select(col("query_id"), col("neighbor_id"))
    val total = 20 * TopK
    Seq(1, 2, 4).map { p =>
      val ivf = knnIvfAt(s, dir, p)
        .select(col("query_id"), col("neighbor_id"))
      brute.join(ivf, Seq("query_id", "neighbor_id"))
        .agg(count(lit(1)).as("n_hits"))
        .select(lit(p).as("nprobe"), col("n_hits"),
          round(col("n_hits").cast("double") / lit(total.toDouble), 6)
            .as("recall"))
    }.reduce(_ unionAll _).orderBy(col("nprobe"))
  }

  private val ivfNprobeSweepSql = {
    def level(p: Int): String =
      s"""SELECT $p AS nprobe, count(*) AS n_hits,
         |  round(count(*) / CAST(${20 * TopK} AS DOUBLE), 6) AS recall
         |FROM brute b JOIN (${knnIvfSqlAt(p)
          .replace("ORDER BY query_id, rnk", "")}) i
         |  ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id"""
        .stripMargin
    s"""WITH brute AS ($knnBruteSql)
       |${Seq(1, 2, 4).map(level).mkString("", "\nUNION ALL\n", "")}
       |ORDER BY nprobe""".stripMargin
  }

  /** Cosine range search: all corpus matches with cosine >= 0.4. */
  private def rangeSearch(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
      .withColumn("nrm", TextFns.norm(col("embedding")))
    val queries = e.filter(col("vec_id") < 50)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("nrm").as("qn"))
    val corpus = e.filter(col("vec_id") >= 50)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"),
        col("nrm").as("nn"))
    corpus.crossJoin(broadcast(queries))
      .withColumn("cosv", TextFns.cosineFrom(
        TextFns.dot(col("qv"), col("nv")), col("qn"), col("nn")))
      .filter(col("cosv") >= 0.4)
      .select(col("query_id"), col("neighbor_id"), col("cosv"))
      .orderBy(col("query_id"), col("neighbor_id"))
  }

  private val rangeSearchSql =
    """SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |  list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                         CAST(c.embedding AS DOUBLE[])) AS cosv
      |FROM embeddings q JOIN embeddings c
      |  ON q.vec_id < 50 AND c.vec_id >= 50
      |WHERE list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                             CAST(c.embedding AS DOUBLE[])) >= 0.4
      |ORDER BY query_id, neighbor_id""".stripMargin

  /** Exact per-label centroid, first 8 dimensions: decimal sums keep
    * the mean order-independent (a double sum would be partitioning-
    * dependent at scale).
    */
  private def labelCentroids(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
    e.select(col("label"), posexplode(col("embedding")).as(Seq("p", "v")))
      .filter(col("p") < 8)
      .groupBy(col("label"), (col("p") + 1).as("pos"))
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast(DecimalType(18, 9))).as("sum_dec"))
      .select(col("label"), col("pos"),
        (col("sum_dec").cast("double") / col("n")).as("centroid_val"),
        col("n"))
      .orderBy(col("label"), col("pos"))
  }

  private val labelCentroidsSql =
    """SELECT label, pos,
      |  CAST(sum(CAST(CAST(embedding[pos] AS DOUBLE) AS DECIMAL(18,9)))
      |       AS DOUBLE) / count(*)
      |    AS centroid_val,
      |  count(*) AS n
      |FROM embeddings, (SELECT unnest(range(1, 9)) AS pos)
      |GROUP BY label, pos ORDER BY label, pos""".stripMargin

  /** K-means-trained IVF: Lloyd iterations refine the 16 seed
    * centroids (assignment by cosine, new centroid = per-dimension
    * decimal-exact mean — order-independent under any partitioning;
    * empty clusters keep their previous centroid), then queries probe
    * the 2 nearest final centroids and search only those buckets.
    * Two unrolled iterations so the oracle can mirror the exact
    * computation with plain CTEs; at scale the loop runs to
    * convergence on a sampled corpus and only the final assignment
    * pass touches every vector.
    */
  private def kmeansIvf(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
      .withColumn("dv", transform(col("embedding"), x => x.cast("double")))
    val corpus = e.filter(col("vec_id") >= 20)
      .select(col("vec_id").as("neighbor_id"), col("dv").as("nv"),
        col("embedding").as("nf"))
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("dv").as("qv"),
        col("embedding").as("qf"))

    // Centroids live on the driver (k x dims doubles — tiny) and enter
    // the plan as literals, so each assignment pass is a single narrow
    // projection: argmax over k codegen'd dot products, NO shuffle of
    // the corpus per iteration. Only the per-dimension mean is a
    // distributed aggregate (one shuffle of (cid, dim) partial sums).
    var cents: Seq[(Int, Seq[Double])] = e.filter(col("vec_id") < NumCentroids)
      .select(col("vec_id"), col("dv")).collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Double](1))).sortBy(_._1).toSeq

    /** Nearest centroid as ONE narrow projection — the
      * [[graft.functions.NearestCentroids]] codegen expression carries
      * the whole centroid matrix as a single reference object, so plan
      * width is constant in nlist (the earlier per-centroid cosine
      * fan-out + greatest/CASE argmax capped nlist at a few hundred
      * before Janino limits; production nlist ~ √n is 10⁴–10⁵).
      * Identical semantics: cosine desc, ties to the lower cid,
      * bit-identical doubles (ExpressionsSpec pins both).
      */
    def withNearestCentroid(df: DataFrame): DataFrame =
      df.withColumn("cid",
        graft.functions.NearestCentroids(col("nv"), cents.map(_._2), 1)
          .getItem(0).getField("cid"))

    // Lloyd iterations: assignment (narrow) + decimal-exact means
    for (_ <- 1 to 2) {
      val assigned = withNearestCentroid(corpus)
      val means = assigned
        .select(col("cid"), posexplode(col("nv")).as(Seq("d", "v")))
        .groupBy(col("cid"), col("d"))
        .agg((sum(col("v").cast(DecimalType(18, 9))).cast("double") /
          count(lit(1))).as("m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cid, rows) =>
          cid -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
        }
      // empty clusters keep the previous centroid
      cents = cents.map { case (cid, old) => (cid, means.getOrElse(cid, old)) }
    }

    val finalAssign = withNearestCentroid(corpus)
      .select(col("neighbor_id"), col("cid"))

    // probes: NumProbe nearest centroids per query — the same narrow
    // expression, multi-probe via explode of its k-element result
    val probes = queries
      .select(col("query_id"), col("qf"), explode(
        graft.functions.NearestCentroids(col("qv"), cents.map(_._2), NumProbe))
        .as("nc"))
      .select(col("query_id"), col("qf"), col("nc").getField("cid").as("cid"))

    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cosv").desc, col("neighbor_id"))
    probes
      .join(finalAssign.join(corpus.select(col("neighbor_id"), col("nf")),
        "neighbor_id"), "cid")
      .withColumn("cosv", TextFns.cosine(col("qf"), col("nf")))
      .withColumn("rnk", row_number().over(wTop))
      .filter(col("rnk") <= TopK)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), col("cosv"))
      .orderBy(col("query_id"), col("rnk"))
  }

  private val kmeansIvfSql = {
    def stepSql(prev: String, n: Int): String =
      s"""a$n AS (
         |  SELECT neighbor_id, nv, cid FROM (
         |    SELECT neighbor_id, nv, cid,
         |      row_number() OVER (PARTITION BY neighbor_id
         |        ORDER BY list_cosine_similarity(nv, cv) DESC, cid) AS arnk
         |    FROM corpus, $prev)
         |  WHERE arnk = 1),
         |m$n AS (
         |  SELECT cid, list(m ORDER BY d) AS newcv FROM (
         |    SELECT cid, d,
         |      CAST(sum(CAST(nv[d] AS DECIMAL(18,9))) AS DOUBLE) / count(*) AS m
         |    FROM a$n, (SELECT unnest(range(1, 65)) AS d)
         |    GROUP BY cid, d)
         |  GROUP BY cid),
         |c$n AS (
         |  SELECT cid, coalesce(newcv, cv) AS cv
         |  FROM $prev LEFT JOIN m$n USING (cid))""".stripMargin
    s"""WITH corpus AS (
       |  SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS nv,
       |    CAST(embedding AS DOUBLE[]) AS nf
       |  FROM embeddings WHERE vec_id >= 20),
       |queries AS (
       |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
       |  FROM embeddings WHERE vec_id < 20),
       |c0 AS (
       |  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
       |  FROM embeddings WHERE vec_id < $NumCentroids),
       |${stepSql("c0", 1)},
       |${stepSql("c1", 2)},
       |afinal AS (
       |  SELECT neighbor_id, cid FROM (
       |    SELECT neighbor_id, cid,
       |      row_number() OVER (PARTITION BY neighbor_id
       |        ORDER BY list_cosine_similarity(nv, cv) DESC, cid) AS arnk
       |    FROM corpus, c2)
       |  WHERE arnk = 1),
       |probes AS (
       |  SELECT query_id, qv, cid FROM (
       |    SELECT query_id, qv, cid,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY list_cosine_similarity(qv, cv) DESC, cid) AS prnk
       |    FROM queries, c2)
       |  WHERE prnk <= $NumProbe),
       |ranked AS (
       |  SELECT query_id, neighbor_id,
       |    list_cosine_similarity(qv, nf) AS cosv,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY list_cosine_similarity(qv, nf) DESC, neighbor_id) AS rnk
       |  FROM probes
       |    JOIN afinal USING (cid)
       |    JOIN corpus USING (neighbor_id))
       |SELECT query_id, neighbor_id, rnk, cosv FROM ranked
       |WHERE rnk <= $TopK ORDER BY query_id, rnk""".stripMargin
  }

  /** Symmetric int8 quantization per vector — the compression step an
    * ANN index applies before storage (4x smaller than float32, 8x
    * smaller than float64): scale = max|x| / 127, q_i = floor(x_i /
    * scale + 0.5). Emits the scale, a checksum of the quantized codes
    * and the exact reconstruction error, so the oracle pins the whole
    * codebook without materializing 64 columns. floor(x + 0.5) instead
    * of round() because the engines disagree on round-half semantics;
    * the fold orders are sequential on both, so the doubles are
    * bit-identical.
    */
  private def quantizeInt8(s: SparkSession, dir: String): DataFrame = {
    val dv = transform(col("embedding"), x => x.cast("double"))
    Tables(s, dir, "embeddings")
      .withColumn("dv", dv)
      .withColumn("scale",
        aggregate(col("dv"), lit(0.0), (acc, x) => greatest(acc, abs(x))) / 127.0)
      .withColumn("q", transform(col("dv"),
        x => floor(x / col("scale") + 0.5).cast("long")))
      .select(col("vec_id"), col("scale"),
        aggregate(col("q"), lit(0L), (acc, x) => acc + x).as("q_sum"),
        Quant.qdec(aggregate( // qdec: identical-fold sum can TIE (Quant)
          zip_with(col("dv"), col("q"), (x, q) => {
            val d = x - q.cast("double") * col("scale")
            d * d
          }),
          lit(0.0), (acc, x) => acc + x), 9).as("recon_err"))
      .orderBy(col("vec_id"))
  }

  private val quantizeInt8Sql =
    """WITH q AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv,
      |    list_aggregate(list_transform(CAST(embedding AS DOUBLE[]),
      |      x -> abs(x)), 'max') / 127.0 AS scale
      |  FROM embeddings)
      |SELECT vec_id, scale,
      |  CAST(list_aggregate(list_transform(dv,
      |    x -> CAST(floor(x / scale + 0.5) AS BIGINT)), 'sum') AS BIGINT)
      |    AS q_sum,
      |  floor(list_aggregate(list_transform(dv,
      |    x -> (x - floor(x / scale + 0.5) * scale)
      |       * (x - floor(x / scale + 0.5) * scale)), 'sum')
      |    * 1e9 + 0.5) / 1e9 AS recon_err
      |FROM q ORDER BY vec_id""".stripMargin

  private val PqSubspaces = 8 // 64 dims -> 8 subspaces x 8 dims
  private val PqSubDims = 8
  private val PqCodes = 16 // codebook entries per subspace

  /** The PQ queries route through the graft.similarity.PqIndex library
    * API (codebook = sub-vectors of the 16 lowest-id corpus vectors —
    * fixed seeds, no training RNG — so both engines derive the same
    * codebook); the built index is cached per (session, dir) like the
    * dedup shingle index, shared by encode and ADC search.
    */
  private val pqIndexCache = new graft.SessionCache[graft.similarity.PqIndex]

  private def pqIndex(s: SparkSession, dir: String): graft.similarity.PqIndex =
    pqIndexCache.getOrElseUpdate(s, dir) {
      val idx = graft.similarity.PqIndex.build(
        Tables(s, dir, "embeddings").filter(col("vec_id") >= 20),
        "vec_id", "embedding", PqSubspaces, PqCodes)
      idx.codes.cache()
      idx
    }

  /** Product-quantization encode: each corpus vector's 8 sub-vector
    * codes packed into one BIGINT `pq_word` — the 8-byte-per-vector
    * representation an IVF-PQ index stores instead of 256 bytes of
    * floats.
    */
  private def pqEncode(s: SparkSession, dir: String): DataFrame =
    pqIndex(s, dir).packedCodes
      .withColumnRenamed("id", "vec_id")
      .orderBy(col("vec_id"))

  /** Shared oracle CTEs: codebook, corpus sub-vectors, encode. */
  private val pqCte =
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings),
       |sub AS (SELECT unnest(range(0, $PqSubspaces)) AS m),
       |cb AS (
       |  SELECT vec_id - 20 AS code, m,
       |    list_transform(range(1, ${PqSubDims + 1}),
       |      i -> dv[m * $PqSubDims + i]) AS cbv
       |  FROM e, sub WHERE vec_id >= 20 AND vec_id < ${20 + PqCodes}),
       |corp AS (
       |  SELECT vec_id AS neighbor_id, m,
       |    list_transform(range(1, ${PqSubDims + 1}),
       |      i -> dv[m * $PqSubDims + i]) AS sv
       |  FROM e, sub WHERE vec_id >= 20),
       |enc AS (
       |  SELECT neighbor_id, m, code FROM (
       |    SELECT neighbor_id, m, code,
       |      row_number() OVER (PARTITION BY neighbor_id, m ORDER BY
       |        list_aggregate(list_transform(range(1, ${PqSubDims + 1}),
       |          i -> (sv[i] - cbv[i]) * (sv[i] - cbv[i])), 'sum') ASC,
       |        code) AS rnk
       |    FROM corp JOIN cb USING (m))
       |  WHERE rnk = 1)""".stripMargin

  private val pqEncodeSql =
    pqCte + s"""
       |SELECT neighbor_id AS vec_id,
       |  CAST(sum(code * CAST(power(16, m) AS BIGINT)) AS BIGINT) AS pq_word
       |FROM enc GROUP BY 1 ORDER BY vec_id""".stripMargin

  /** PQ asymmetric-distance search (ADC): each query precomputes a
    * 8x16 lookup table of exact sub-distances to the codebook, and a
    * neighbor's approximate distance is the sum of 8 table lookups
    * selected by its stored codes — so only 8-byte codes and the tiny
    * LUT meet in the join, never the vectors. The 8-term sum runs
    * through decimal accumulation (order-independent) and the final
    * rank breaks ties on neighbor_id, so the approximate ranking is
    * deterministic and the oracle reproduces it bit-for-bit.
    */
  private def pqAdc(s: SparkSession, dir: String): DataFrame =
    pqIndex(s, dir).searchAdc(
        Tables(s, dir, "embeddings").filter(col("vec_id") < 20),
        "vec_id", "embedding", TopK)
      .orderBy(col("query_id"), col("rnk"))

  /** The PqIndex library API end-to-end under the hash gate — build,
    * persist, reload, search — so the parquet round-trip of codebook
    * and codes is pinned by the same ADC oracle (mirrors
    * sim_index_api / IvfIndex).
    */
  private def pqIndexApi(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
    val idx = graft.similarity.PqIndex.build(
      e.filter(col("vec_id") >= 20), "vec_id", "embedding",
      PqSubspaces, PqCodes)
    val path = java.nio.file.Files
      .createTempDirectory("graft_pq_q").toString
    idx.save(s"$path/index")
    val loaded = graft.similarity.PqIndex.load(s, s"$path/index")
    loaded.searchAdc(e.filter(col("vec_id") < 20), "vec_id", "embedding",
        TopK)
      .orderBy(col("query_id"), col("rnk"))
  }

  /** OPQ — a LEARNED orthogonal transform before product
    * quantization (Ge et al., "Optimized Product Quantization", CVPR
    * 2013): the parametric variant's core mechanism, EIGENVALUE
    * ALLOCATION, realized as a variance-balancing permutation. Plain
    * PQ quantizes whatever happens to share a contiguous dim block;
    * when variance concentrates unevenly, one subspace eats most of
    * the distortion while others waste codebook entries. The trained
    * step here: (1) one exact moment pass learns per-dimension
    * variance (the cov9 diagonal arithmetic — GramMomentsAgg, qdec-9
    * fixed point, both engines bit-equal); (2) dims sort by variance
    * and deal SERPENTINE into the 8 subspaces (the standard
    * deterministic balanced-partition approximation of Ge's greedy
    * product balancing — block r/M forward on even blocks, reversed
    * on odd, so every subspace gets one dim from each variance
    * octile); (3) the resulting permutation IS an orthogonal matrix,
    * applied as a narrow projection, and the UNCHANGED PqIndex
    * machinery trains/encodes/searches in the rotated space — same
    * code budget as sim_pq_adc, rotation is the only delta. The
    * oracle replays variance → allocation → rotation → encode → ADC
    * entirely in SQL, so the hash pins the whole trained chain.
    * Recall vs plain PQ at equal budget is asserted by OpqSpec and
    * tabled in SCALING.md.
    *
    * Scale shape: the moment pass is one 68 KB-buffer aggregate (the
    * sim_pca_power contract); allocation is driver math over 64
    * values; rotation is a narrow per-row projection (no shuffle);
    * everything downstream inherits PqIndex's plan shapes.
    */
  private def opqTrained(s: SparkSession, dir: String): DataFrame = {
    val d = 64
    val S = 1000000000L
    val e = Tables(s, dir, "embeddings")
    val corpus = e.filter(col("vec_id") >= 20)
    val varCells = corpus
      .agg(graft.operators.GramMomentsAgg(col("embedding"), d).as("mm"))
      .select(col("mm.n").as("n_rows"), col("mm.sums").as("sums"),
        explode(col("mm.gram")).as("g"))
      .filter(col("g.i") === col("g.j"))
      .select(col("g.i").as("i"),
        round(Quant.qdec(col("g.v").cast("double") / col("n_rows") -
          (element_at(col("sums"), col("g.i") + 1).cast("double") /
            col("n_rows")) *
          (element_at(col("sums"), col("g.j") + 1).cast("double") /
            col("n_rows")), 9) * S, 0).cast("long").as("c"))
      .collect() // 64 rows — dimension-bounded, not corpus-bounded
    // serpentine eigenvalue allocation (graft.similarity.Opq): perm
    // maps rotated position -> original dim
    val perm = graft.similarity.Opq.allocation(
      varCells.toSeq.map(r => (r.getInt(0), r.getLong(1))),
      PqSubspaces, PqSubDims)
    val rot = array(perm.map(o => element_at(col("embedding"), o + 1)): _*)
    val idx = graft.similarity.PqIndex.build(
      corpus.withColumn("rot", rot), "vec_id", "rot",
      PqSubspaces, PqCodes)
    idx.searchAdc(
        e.filter(col("vec_id") < 20).withColumn("rot", rot),
        "vec_id", "rot", TopK)
      .orderBy(col("query_id"), col("rnk"))
  }

  // full-chain replay: variance diagonal (cov9 arithmetic) →
  // serpentine allocation → permutation as list() ORDER BY slot →
  // the pqCte encode/ADC tail on the rotated sub-vectors
  private val opqTrainedSql =
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings),
       |dim AS (SELECT unnest(range(0, 64)) AS i),
       |mom AS MATERIALIZED (
       |  SELECT i,
       |    sum(CAST(dv[i + 1] * dv[i + 1] AS DECIMAL(38, 18))) AS sxx,
       |    sum(CAST(dv[i + 1] AS DECIMAL(38, 18))) AS sx,
       |    count(*) AS n_rows
       |  FROM e, dim WHERE vec_id >= 20 GROUP BY i),
       |varr AS (
       |  SELECT i, CAST(round(floor((CAST(sxx AS DOUBLE) / n_rows -
       |    (CAST(sx AS DOUBLE) / n_rows) * (CAST(sx AS DOUBLE) / n_rows))
       |    * 1e9 + 0.5) / 1e9 * 1000000000, 0) AS BIGINT) AS c
       |  FROM mom),
       |alloc AS MATERIALIZED (
       |  SELECT i AS o,
       |    CAST(CASE WHEN (rn // 8) % 2 = 0 THEN rn % 8
       |      ELSE 7 - (rn % 8) END AS INT) AS m,
       |    CAST(rn // 8 AS INT) AS slot
       |  FROM (SELECT i, row_number() OVER (ORDER BY c DESC, i) - 1 AS rn
       |        FROM varr)),
       |corp AS (
       |  SELECT vec_id AS neighbor_id, m,
       |    list(dv[o + 1] ORDER BY slot) AS sv
       |  FROM e, alloc WHERE vec_id >= 20 GROUP BY vec_id, m),
       |cb AS (
       |  SELECT vec_id - 20 AS code, m,
       |    list(dv[o + 1] ORDER BY slot) AS cbv
       |  FROM e, alloc WHERE vec_id >= 20 AND vec_id < ${20 + PqCodes}
       |  GROUP BY vec_id, m),
       |enc AS (
       |  SELECT neighbor_id, m, code FROM (
       |    SELECT neighbor_id, m, code,
       |      row_number() OVER (PARTITION BY neighbor_id, m ORDER BY
       |        list_aggregate(list_transform(range(1, ${PqSubDims + 1}),
       |          k -> (sv[k] - cbv[k]) * (sv[k] - cbv[k])), 'sum') ASC,
       |        code) AS rnk
       |    FROM corp JOIN cb USING (m))
       |  WHERE rnk = 1),
       |qsub AS (
       |  SELECT vec_id AS query_id, m,
       |    list(dv[o + 1] ORDER BY slot) AS sv
       |  FROM e, alloc WHERE vec_id < 20 GROUP BY vec_id, m),
       |lut AS (
       |  SELECT query_id, m, code,
       |    list_aggregate(list_transform(range(1, ${PqSubDims + 1}),
       |      k -> (sv[k] - cbv[k]) * (sv[k] - cbv[k])), 'sum') AS qd2
       |  FROM qsub JOIN cb USING (m)),
       |adc AS (
       |  SELECT query_id, neighbor_id,
       |    CAST(sum(CAST(qd2 AS DECIMAL(18, 9))) AS DOUBLE) AS adc
       |  FROM enc JOIN lut USING (m, code)
       |  GROUP BY 1, 2),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY adc ASC, neighbor_id) AS rnk
       |  FROM adc)
       |SELECT query_id, neighbor_id, rnk, adc FROM ranked
       |WHERE rnk <= $TopK ORDER BY query_id, rnk""".stripMargin

  private val pqAdcSql =
    pqCte + s""",
       |qsub AS (
       |  SELECT vec_id AS query_id, m,
       |    list_transform(range(1, ${PqSubDims + 1}),
       |      i -> dv[m * $PqSubDims + i]) AS sv
       |  FROM e, sub WHERE vec_id < 20),
       |lut AS (
       |  SELECT query_id, m, code,
       |    list_aggregate(list_transform(range(1, ${PqSubDims + 1}),
       |      i -> (sv[i] - cbv[i]) * (sv[i] - cbv[i])), 'sum') AS qd2
       |  FROM qsub JOIN cb USING (m)),
       |adc AS (
       |  SELECT query_id, neighbor_id,
       |    CAST(sum(CAST(qd2 AS DECIMAL(18,9))) AS DOUBLE) AS adc
       |  FROM enc JOIN lut USING (m, code)
       |  GROUP BY 1, 2),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY adc ASC, neighbor_id) AS rnk
       |  FROM adc)
       |SELECT query_id, neighbor_id, rnk, adc FROM ranked
       |WHERE rnk <= $TopK ORDER BY query_id, rnk""".stripMargin

  private val IvfPqNlist = 8 // coarse buckets; probes search 2 of 8

  /** The composed IVF-PQ index ([[graft.similarity.IvfPqIndex]])
    * end-to-end under the hash gate: build (coarse assign → residual
    * PQ encode), persist, reload, search 2 of 8 buckets by residual
    * ADC. The production ANN shape — bucket pruning times compressed
    * scoring — with fixed deterministic seeds so the oracle derives
    * the identical index: centroids are the 8 lowest-id corpus
    * vectors, the codebook is the residuals of the 16 lowest-id ones.
    */
  /** PQ-tier incremental ingest — `IvfPqIndex.append`: build over the
    * corpus below vec_id 300, persist, append the rest (assigned to
    * the frozen centroids, residual-encoded against the frozen
    * codebook, bucket files appended), reload, search. Both geometry
    * seeds (nlist lowest-id centroids, codeCount lowest-id codebook
    * residuals) live in the base split, so the appended index state is
    * IDENTICAL to the one-shot build and the sim_ivfpq_index_api
    * oracle must match bit-for-bit — ingest proven invisible to ADC
    * search.
    */
  /** The base index is FIXTURE-PURE and staged once per JVM (the
    * StagedFixture convention): production appends into an EXISTING
    * persisted index — rebuilding the base per invocation both
    * misstated the economics and billed every bench rep for it. The
    * append MUTATES its index dir (new code files under the bucket
    * partitions), so each run hardlink-copies the staged base into a
    * fresh dir first — `IvfPqIndex.append` writes mode("append")
    * (new files only), so the linked base files are never touched.
    */
  private def linkTree(src: java.nio.file.Path,
      dst: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(src).iterator().asScala.foreach {
      (p: java.nio.file.Path) =>
        val t = dst.resolve(src.relativize(p).toString)
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.createDirectories(t)
        else
          try java.nio.file.Files.createLink(t, p)
          catch { case _: Exception => java.nio.file.Files.copy(p, t): Unit }
    }
  }

  private def ivfPqAppend(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
    val staged = graft.StagedFixture.dir(
      graft.StagedFixture.key("ivfpq_base", dir), "graft_ivfpq_base") { t =>
      graft.similarity.IvfPqIndex.build(
        e.filter(col("vec_id") >= 20 && col("vec_id") < 300),
        "vec_id", "embedding", IvfPqNlist, PqSubspaces, PqCodes)
        .save(s"$t/index")
    }
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_append_q").toString
    linkTree(java.nio.file.Paths.get(staged),
      java.nio.file.Paths.get(path))
    graft.similarity.IvfPqIndex.append(s, s"$path/index",
      e.filter(col("vec_id") >= 300), "vec_id", "embedding")
    val loaded = graft.similarity.IvfPqIndex.load(s, s"$path/index")
    val out = loaded.search(e.filter(col("vec_id") < 20), "vec_id",
        "embedding", k = TopK, nprobe = NumProbe)
      .localCheckpoint() // materialize before the temp index is deleted
      .orderBy(col("query_id"), col("rnk"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    out
  }

  private def ivfPqIndexApi(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
    val idx = graft.similarity.IvfPqIndex.build(
      e.filter(col("vec_id") >= 20), "vec_id", "embedding",
      IvfPqNlist, PqSubspaces, PqCodes)
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_q").toString
    idx.save(s"$path/index")
    val loaded = graft.similarity.IvfPqIndex.load(s, s"$path/index")
    loaded.search(e.filter(col("vec_id") < 20), "vec_id", "embedding",
        k = TopK, nprobe = NumProbe)
      .orderBy(col("query_id"), col("rnk"))
  }

  private val ivfPqIndexApiSql =
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings),
       |cents AS (
       |  SELECT vec_id - 20 AS cent_id, dv AS cv FROM e
       |  WHERE vec_id >= 20 AND vec_id < ${20 + IvfPqNlist}),
       |corpus AS (SELECT vec_id AS id, dv FROM e WHERE vec_id >= 20),
       |assigned AS (
       |  SELECT id, dv, cent_id, cv FROM (
       |    SELECT id, dv, cent_id, cv,
       |      row_number() OVER (PARTITION BY id
       |        ORDER BY list_cosine_similarity(dv, cv) DESC, cent_id) AS arnk
       |    FROM corpus, cents)
       |  WHERE arnk = 1),
       |resid AS (
       |  SELECT id, cent_id,
       |    list_transform(range(1, 65), i -> dv[i] - cv[i]) AS rv
       |  FROM assigned),
       |sub AS (SELECT unnest(range(0, $PqSubspaces)) AS m),
       |cb AS (
       |  SELECT id - 20 AS code, m,
       |    list_transform(range(1, ${PqSubDims + 1}),
       |      i -> rv[m * $PqSubDims + i]) AS cbv
       |  FROM resid, sub WHERE id < ${20 + PqCodes}),
       |rsub AS (
       |  SELECT id, cent_id, m,
       |    list_transform(range(1, ${PqSubDims + 1}),
       |      i -> rv[m * $PqSubDims + i]) AS sv
       |  FROM resid, sub),
       |enc AS (
       |  SELECT cent_id, id AS neighbor_id, m, code FROM (
       |    SELECT cent_id, id, m, code,
       |      row_number() OVER (PARTITION BY id, m ORDER BY
       |        list_aggregate(list_transform(range(1, ${PqSubDims + 1}),
       |          i -> (sv[i] - cbv[i]) * (sv[i] - cbv[i])), 'sum') ASC,
       |        code) AS rnk
       |    FROM rsub JOIN cb USING (m))
       |  WHERE rnk = 1),
       |queries AS (
       |  SELECT vec_id AS query_id, dv AS qv FROM e WHERE vec_id < 20),
       |probes AS (
       |  SELECT query_id, cent_id,
       |    list_transform(range(1, 65), i -> qv[i] - cv[i]) AS qrv
       |  FROM (
       |    SELECT query_id, qv, cent_id, cv,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY list_cosine_similarity(qv, cv) DESC, cent_id) AS prnk
       |    FROM queries, cents)
       |  WHERE prnk <= $NumProbe),
       |qsub AS (
       |  SELECT query_id, cent_id, m,
       |    list_transform(range(1, ${PqSubDims + 1}),
       |      i -> qrv[m * $PqSubDims + i]) AS sv
       |  FROM probes, sub),
       |lut AS (
       |  SELECT query_id, cent_id, m, code,
       |    list_aggregate(list_transform(range(1, ${PqSubDims + 1}),
       |      i -> (sv[i] - cbv[i]) * (sv[i] - cbv[i])), 'sum') AS qd2
       |  FROM qsub JOIN cb USING (m)),
       |adc AS (
       |  SELECT query_id, neighbor_id,
       |    CAST(sum(CAST(qd2 AS DECIMAL(18,9))) AS DOUBLE) AS adc
       |  FROM enc JOIN lut USING (cent_id, m, code)
       |  GROUP BY 1, 2),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY adc ASC, neighbor_id) AS rnk
       |  FROM adc)
       |SELECT query_id, neighbor_id, rnk, adc FROM ranked
       |WHERE rnk <= $TopK ORDER BY query_id, rnk""".stripMargin

  /** IVF-PQ with TRAINED coarse centroids: `build(trainIters = 2)`
    * refines the 8 seed centroids with two deterministic Lloyd passes
    * (cosine assignment, decimal-exact per-dimension means, empty
    * clusters keep their previous centroid — the same loop
    * sim_kmeans_ivf gates) before residual encoding, then searches 2
    * of 8 buckets by residual ADC. The oracle unrolls the two passes
    * as CTE steps and re-derives the identical index. No save/load
    * round-trip here — sim_ivfpq_index_api already pins persistence.
    */
  private def ivfPqTrained(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
    val idx = graft.similarity.IvfPqIndex.build(
      e.filter(col("vec_id") >= 20), "vec_id", "embedding",
      IvfPqNlist, PqSubspaces, PqCodes, trainIters = 2)
    idx.search(e.filter(col("vec_id") < 20), "vec_id", "embedding",
        k = TopK, nprobe = NumProbe)
      .orderBy(col("query_id"), col("rnk"))
  }

  private val ivfPqTrainedSql = {
    // one Lloyd pass: assign corpus to nearest centroid in `prev`,
    // per-dimension decimal-exact means, empty clusters keep prev
    def stepSql(prev: String, n: Int): String =
      s"""a$n AS (
         |  SELECT id, dv, cent_id FROM (
         |    SELECT id, dv, cent_id,
         |      row_number() OVER (PARTITION BY id
         |        ORDER BY list_cosine_similarity(dv, cv) DESC, cent_id) AS arnk
         |    FROM corpus, $prev)
         |  WHERE arnk = 1),
         |m$n AS (
         |  SELECT cent_id, list(m ORDER BY d) AS newcv FROM (
         |    SELECT cent_id, d,
         |      CAST(sum(CAST(dv[d] AS DECIMAL(18,9))) AS DOUBLE) / count(*) AS m
         |    FROM a$n, (SELECT unnest(range(1, 65)) AS d)
         |    GROUP BY cent_id, d)
         |  GROUP BY cent_id),
         |c$n AS (
         |  SELECT cent_id, coalesce(newcv, cv) AS cv
         |  FROM $prev LEFT JOIN m$n USING (cent_id))""".stripMargin
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings),
       |corpus AS (SELECT vec_id AS id, dv FROM e WHERE vec_id >= 20),
       |c0 AS (
       |  SELECT vec_id - 20 AS cent_id, dv AS cv FROM e
       |  WHERE vec_id >= 20 AND vec_id < ${20 + IvfPqNlist}),
       |${stepSql("c0", 1)},
       |${stepSql("c1", 2)},
       |assigned AS (
       |  SELECT id, dv, cent_id, cv FROM (
       |    SELECT id, dv, cent_id, cv,
       |      row_number() OVER (PARTITION BY id
       |        ORDER BY list_cosine_similarity(dv, cv) DESC, cent_id) AS arnk
       |    FROM corpus, c2)
       |  WHERE arnk = 1),
       |resid AS (
       |  SELECT id, cent_id,
       |    list_transform(range(1, 65), i -> dv[i] - cv[i]) AS rv
       |  FROM assigned),
       |sub AS (SELECT unnest(range(0, $PqSubspaces)) AS m),
       |cb AS (
       |  SELECT id - 20 AS code, m,
       |    list_transform(range(1, ${PqSubDims + 1}),
       |      i -> rv[m * $PqSubDims + i]) AS cbv
       |  FROM resid, sub WHERE id < ${20 + PqCodes}),
       |rsub AS (
       |  SELECT id, cent_id, m,
       |    list_transform(range(1, ${PqSubDims + 1}),
       |      i -> rv[m * $PqSubDims + i]) AS sv
       |  FROM resid, sub),
       |enc AS (
       |  SELECT cent_id, id AS neighbor_id, m, code FROM (
       |    SELECT cent_id, id, m, code,
       |      row_number() OVER (PARTITION BY id, m ORDER BY
       |        list_aggregate(list_transform(range(1, ${PqSubDims + 1}),
       |          i -> (sv[i] - cbv[i]) * (sv[i] - cbv[i])), 'sum') ASC,
       |        code) AS rnk
       |    FROM rsub JOIN cb USING (m))
       |  WHERE rnk = 1),
       |queries AS (
       |  SELECT vec_id AS query_id, dv AS qv FROM e WHERE vec_id < 20),
       |probes AS (
       |  SELECT query_id, cent_id,
       |    list_transform(range(1, 65), i -> qv[i] - cv[i]) AS qrv
       |  FROM (
       |    SELECT query_id, qv, cent_id, cv,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY list_cosine_similarity(qv, cv) DESC, cent_id) AS prnk
       |    FROM queries, c2)
       |  WHERE prnk <= $NumProbe),
       |qsub AS (
       |  SELECT query_id, cent_id, m,
       |    list_transform(range(1, ${PqSubDims + 1}),
       |      i -> qrv[m * $PqSubDims + i]) AS sv
       |  FROM probes, sub),
       |lut AS (
       |  SELECT query_id, cent_id, m, code,
       |    list_aggregate(list_transform(range(1, ${PqSubDims + 1}),
       |      i -> (sv[i] - cbv[i]) * (sv[i] - cbv[i])), 'sum') AS qd2
       |  FROM qsub JOIN cb USING (m)),
       |adc AS (
       |  SELECT query_id, neighbor_id,
       |    CAST(sum(CAST(qd2 AS DECIMAL(18,9))) AS DOUBLE) AS adc
       |  FROM enc JOIN lut USING (cent_id, m, code)
       |  GROUP BY 1, 2),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY adc ASC, neighbor_id) AS rnk
       |  FROM adc)
       |SELECT query_id, neighbor_id, rnk, adc FROM ranked
       |WHERE rnk <= $TopK ORDER BY query_id, rnk""".stripMargin
  }

  /** The IvfIndex library API end-to-end under the hash gate: build
    * over the corpus, persist to parquet, reload, search at full
    * probe width — which makes the API exactly equal brute force, so
    * the brute-force oracle pins the whole build/save/load/search
    * path including the bucket-partitioned persistence.
    */
  /** Incremental index maintenance — `IvfIndex.append`: build over
    * part of the corpus, persist, APPEND the remainder as a later
    * ingest batch (assigned to the existing centroids, bucket files
    * appended, nothing rebuilt), reload, search. With nprobe = nlist
    * the search scans every bucket, so the result must equal
    * brute-force over the WHOLE corpus — the same oracle trick as
    * `sim_index_api`, here proving the appended vectors are fully
    * searchable with bit-identical scores.
    */
  private def ivfAppend(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
    val idx = graft.similarity.IvfIndex.build(
      e.filter(col("vec_id") >= 20 && col("vec_id") < 300),
      "vec_id", "embedding", nlist = 8)
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivf_append_q").toString
    idx.save(s"$path/index")
    graft.similarity.IvfIndex.append(s, s"$path/index",
      e.filter(col("vec_id") >= 300), "vec_id", "embedding")
    val loaded = graft.similarity.IvfIndex.load(s, s"$path/index")
    val out = loaded.search(e.filter(col("vec_id") < 20), "vec_id",
        "embedding", k = TopK, nprobe = 8)
      .localCheckpoint() // materialize before the temp index is deleted
      .orderBy(col("query_id"), col("rnk"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    out
  }

  /** STREAMING index maintenance — the ANN counterpart of the ingest
    * tier's LSM story: a base IVF index is frozen on disk, then three
    * real micro-batches of new vectors arrive through `readStream`
    * (`maxFilesPerTrigger = 1`) and each `foreachBatch` runs
    * [[graft.similarity.IvfIndex.append]] against the persisted
    * artifact — assignment to FROZEN centroids, bucket files appended,
    * no rebuild. The final search serves the fully-caught-up index.
    *
    * Exactness: nprobe = nlist makes the probe exhaustive, so the
    * result must EQUAL brute-force cosine top-k (the
    * [[ivfAppend]] oracle convention) — any row lost, duplicated, or
    * mis-bucketed by the streaming appends fails the hash. Append
    * order cannot matter (buckets are sets under frozen centroids),
    * so arrival batching is free to vary at scale.
    *
    * Scale shape: each micro-batch costs ONE narrow assignment pass
    * over the batch (never the corpus) + a bucket-keyed append — the
    * same batch-bounded cost contract as the ingest tier; the search
    * stage is the loaded index's bounded top-k machinery.
    */
  /** Stage the shared three-micro-batch arrival layout (vec_id ranges
    * [300,360) / [360,420) / [420,∞)) for the streaming append
    * queries: ONE batch-partitioned write job builds all three files
    * (the old shape re-scanned the source once per range), and each is
    * published into `$root/in` with an explicit strictly increasing
    * mtime — FileStreamSource orders files by modification time, and
    * sequential writes landing in one mtime tick could tie and reorder
    * (r20 advice; the HNSW append is order-dependent, so the persisted
    * graph's reproducibility rides on this). A range empty at small
    * scale factors stages no file — the stream then simply sees fewer
    * micro-batches, same as an empty batch's no-op append.
    */
  private def stageArrivalFiles(arrivals: DataFrame, root: String): Unit = {
    val staged = s"$root/stage"
    val stageT0 = System.currentTimeMillis()
    arrivals
      .withColumn("b", when(col("vec_id") < 360, 1)
        .when(col("vec_id") < 420, 2).otherwise(3))
      .coalesce(1)
      .write.partitionBy("b").parquet(staged)
    val inDir = java.nio.file.Paths.get(root, "in")
    java.nio.file.Files.createDirectories(inDir)
    (1 to 3).foreach { b =>
      val parts = Option(new java.io.File(s"$staged/b=$b").listFiles())
        .getOrElse(Array.empty[java.io.File])
        .filter(_.getName.endsWith(".parquet"))
      require(parts.length <= 1, // coalesce(1): one writer task per range
        s"staging wrote ${parts.length} files for batch $b — expected <= 1")
      parts.foreach { p =>
        val dst = inDir.resolve(s"b$b.parquet")
        java.nio.file.Files.move(p.toPath, dst)
        // strictly increasing mtimes RELATIVE TO NOW (r21 advice): an
        // absolute epoch stamp put the staged files 50+ years behind
        // any future wall-clock-stamped arrival, outside
        // FileStreamSource's 7-day maxFileAge horizon; now-anchored
        // offsets keep the ordering deterministic AND the files young
        require(dst.toFile.setLastModified(stageT0 + b * 60000L),
          s"could not pin arrival mtime on $dst")
      }
    }
  }

  private def ivfAppendStream(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
    val idx = graft.similarity.IvfIndex.build(
      e.filter(col("vec_id") >= 20 && col("vec_id") < 300),
      "vec_id", "embedding", nlist = 8)
    val root = java.nio.file.Files
      .createTempDirectory("graft_ivf_stream_q").toString
    idx.save(s"$root/index")
    // stage three deterministic arrival files — one per range, so
    // maxFilesPerTrigger=1 yields three REAL micro-batches. ONE
    // batch-partitioned write (instead of three jobs re-scanning the
    // source), then publish into the stream dir with explicit strictly
    // increasing mtimes: FileStreamSource orders by modification time,
    // and same-tick writes would otherwise tie (r20 advice)
    val arrivals = e.filter(col("vec_id") >= 300)
      .select(col("vec_id"), col("embedding"))
    stageArrivalFiles(arrivals, root)
    // try/finally so a failed append/stream/search doesn't leak the
    // staged index + input files + checkpoint dir on every bad run;
    // localCheckpoint materializes the result before the delete.
    try {
      val q = s.readStream.schema(arrivals.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$root/in")
        .writeStream
        .option("checkpointLocation", s"$root/ckpt")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          if (!batch.isEmpty) graft.similarity.IvfIndex.append(
            s, s"$root/index", batch, "vec_id", "embedding")
          ()
        }
        .start()
      try q.processAllAvailable()
      finally q.stop()
      val loaded = graft.similarity.IvfIndex.load(s, s"$root/index")
      loaded.search(e.filter(col("vec_id") < 20), "vec_id",
          "embedding", k = TopK, nprobe = 8)
        .localCheckpoint() // materialize before the temp index is deleted
        .orderBy(col("query_id"), col("rnk"))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }

  /** GRAPH-BASED ANN — the full [[graft.similarity.HnswIndex]]
    * lifecycle (build → save → load → search), the index every
    * vector-serving stack a user migrates from defaults to
    * (FAISS IndexHNSW / hnswlib / Lucene KNN). Four shards are built
    * in parallel (one deterministic in-memory HNSW per shard inside
    * `flatMapGroups`), persisted shard-partitioned, reloaded, and
    * searched in EXHAUSTIVE mode (`ef = Int.MaxValue`, clamped to the
    * shard size): the beam then provably visits every node (level-0
    * chain edges pin connectivity), so the merged top-k must EQUAL
    * brute-force cosine top-k — the `sim_index_api` oracle convention;
    * any node the graph loses, mis-links, or mis-scores fails the
    * hash. Recall at SERVING ef (where the graph actually earns its
    * keep) is asserted by HnswSpec and tracked in SCALING.md.
    *
    * Scale shape: construction is embarrassingly parallel across
    * shards (a shard's vectors + adjacency are the per-executor memory
    * contract — nShards grows with the corpus); a search fans out to
    * the shards and merges nShards·k rows through one rank window —
    * never corpus-sized.
    */
  private def hnsw(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
    val idx = graft.similarity.HnswIndex.build(
      e.filter(col("vec_id") >= 20), "vec_id", "embedding",
      nShards = 4, m = 8, efConstruction = 32)
    val root = java.nio.file.Files
      .createTempDirectory("graft_hnsw_q").toString
    try {
      idx.save(s"$root/index")
      val loaded = graft.similarity.HnswIndex.load(s, s"$root/index")
      loaded.search(e.filter(col("vec_id") < 20), "vec_id", "embedding",
          k = TopK, ef = Int.MaxValue)
        .localCheckpoint() // materialize before the temp index is deleted
        .orderBy(col("query_id"), col("rnk"))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }

  /** HNSW incremental maintenance — the graph tier's counterpart of
    * `sim_ivf_append`: a persisted index over vec_id ∈ [20, 300) is
    * caught up by ONE [[graft.similarity.HnswIndex.append]] batch
    * (vec_id ≥ 300) — batch inserted in id order through the normal
    * insertion path, chain-aware pruning keeps old connectivity, and
    * only the touched shard partitions rewrite (dynamic partition
    * overwrite). The exhaustive search then hash-equals brute force
    * over the FULL corpus: any node the append lost, disconnected, or
    * mis-linked fails the oracle.
    */
  private def hnswAppend(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
    val idx = graft.similarity.HnswIndex.build(
      e.filter(col("vec_id") >= 20 && col("vec_id") < 300),
      "vec_id", "embedding", nShards = 4, m = 8, efConstruction = 32)
    val root = java.nio.file.Files
      .createTempDirectory("graft_hnsw_app_q").toString
    try {
      idx.save(s"$root/index")
      graft.similarity.HnswIndex.append(s, s"$root/index",
        e.filter(col("vec_id") >= 300), "vec_id", "embedding")
      val loaded = graft.similarity.HnswIndex.load(s, s"$root/index")
      loaded.search(e.filter(col("vec_id") < 20), "vec_id", "embedding",
          k = TopK, ef = Int.MaxValue)
        .localCheckpoint() // materialize before the temp index is deleted
        .orderBy(col("query_id"), col("rnk"))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }

  /** STREAMING HNSW maintenance — the graph tier's counterpart of
    * `sim_ivf_append_stream`: three REAL micro-batches
    * (`maxFilesPerTrigger = 1`) each run `HnswIndex.append` against
    * the persisted graphs via `foreachBatch`, then the exhaustive
    * search serves the fully-caught-up index and must EQUAL brute
    * force. Unlike IVF buckets, graph appends are ORDER-DEPENDENT
    * (each insertion searches the graph so far), so the arrival files
    * are staged with explicit strictly increasing mtimes
    * ([[stageArrivalFiles]]) — FileStreamSource orders by modification
    * time, and without pinned stamps two files landing in one mtime
    * tick could reorder, making the persisted graph run-dependent
    * (r20 advice; the gate holds either way — exhaustive-ef search
    * equals brute force for ANY insertion order). This mirrors how a
    * production graph index consumes an ingest stream (ordered
    * per-shard application; cross-batch commutativity is what the IVF
    * tier offers, and the scaladoc contract is honest about the
    * difference).
    */
  private def hnswAppendStream(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
    val idx = graft.similarity.HnswIndex.build(
      e.filter(col("vec_id") >= 20 && col("vec_id") < 300),
      "vec_id", "embedding", nShards = 4, m = 8, efConstruction = 32)
    val root = java.nio.file.Files
      .createTempDirectory("graft_hnsw_stream_q").toString
    try {
      idx.save(s"$root/index")
      val arrivals = e.filter(col("vec_id") >= 300)
        .select(col("vec_id"), col("embedding"))
      stageArrivalFiles(arrivals, root)
      val q = s.readStream.schema(arrivals.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$root/in")
        .writeStream
        .option("checkpointLocation", s"$root/ckpt")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          if (!batch.isEmpty) graft.similarity.HnswIndex.append(
            s, s"$root/index", batch, "vec_id", "embedding")
          ()
        }
        .start()
      try q.processAllAvailable()
      finally q.stop()
      val loaded = graft.similarity.HnswIndex.load(s, s"$root/index")
      loaded.search(e.filter(col("vec_id") < 20), "vec_id", "embedding",
          k = TopK, ef = Int.MaxValue)
        .localCheckpoint()
        .orderBy(col("query_id"), col("rnk"))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }

  private def indexApi(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
    val idx = graft.similarity.IvfIndex.build(
      e.filter(col("vec_id") >= 20), "vec_id", "embedding", nlist = 8)
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivf_q").toString
    idx.save(s"$path/index")
    val loaded = graft.similarity.IvfIndex.load(s, s"$path/index")
    loaded.search(e.filter(col("vec_id") < 20), "vec_id", "embedding",
        k = TopK, nprobe = 8)
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Maximum inner-product search (MIPS) top-5 — what retrieval
    * actually ranks by (relevance = q·d on unnormalized embeddings,
    * NOT cosine: document norm carries signal). Same bounded
    * `TopKPairsAgg` map-side shape as `sim_knn_brute`, scoring with
    * the raw codegen dot product. To serve MIPS from the IVF/PQ
    * indexes in this library, apply the standard norm-augmentation
    * reduction (append sqrt(M² − ‖d‖²) to each document and 0 to each
    * query with M = max ‖d‖; cosine order on the augmented vectors
    * equals inner-product order) — the query here pins the ground
    * truth that reduction must reproduce.
    */
  private def mipsTopK(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{DoubleSortableBits, SortableBitsToDouble}
    val e = Tables(s, dir, "embeddings")
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val corpus = e.filter(col("vec_id") >= 20)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"))
    corpus.crossJoin(broadcast(queries))
      .withColumn("dotv", TextFns.dot(col("qv"), col("nv")))
      .groupBy(col("query_id"))
      .agg(graft.operators.TopKPairsAgg(
        DoubleSortableBits(col("dotv")), col("neighbor_id"), TopK).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("i", "p")))
      .select(col("query_id"), col("p.tie").as("neighbor_id"),
        (col("i") + 1).as("rnk"),
        SortableBitsToDouble(col("p.value")).as("dotv"))
      .orderBy(col("query_id"), col("rnk"))
  }

  private val mipsTopKSql =
    s"""WITH scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    list_dot_product(CAST(q.embedding AS DOUBLE[]),
       |                     CAST(c.embedding AS DOUBLE[])) AS dotv
       |  FROM embeddings q JOIN embeddings c
       |    ON q.vec_id < 20 AND c.vec_id >= 20),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY dotv DESC, neighbor_id) AS rnk
       |  FROM scored)
       |SELECT query_id, neighbor_id, rnk, dotv FROM ranked
       |WHERE rnk <= $TopK ORDER BY query_id, rnk""".stripMargin

  /** Recall@k of the IVF index against brute-force ground truth — THE
    * quality metric an ANN user tunes nprobe by. Per query: how many of
    * the true top-$TopK neighbors the $NumProbe-probe IVF search
    * returned. Both sides are the already-oracle-gated pipelines
    * (`sim_knn_brute`, `sim_knn_ivf`), so the intersection counts are
    * deterministic and the recall is an exact small-integer ratio.
    * Plan shape: the two top-k results are ~k rows per query — the
    * equi-join and per-query count are driver-trivial at any corpus
    * size; all the heavy lifting happens inside the component
    * pipelines, which carry their own scale contracts.
    */
  private def recallAtK(s: SparkSession, dir: String): DataFrame = {
    val brute = knnBrute(s, dir).select(col("query_id"), col("neighbor_id"))
    val ivf = knnIvf(s, dir).select(col("query_id"), col("neighbor_id"))
    val hits = brute.join(ivf, Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
    brute.select(col("query_id")).distinct()
      .join(hits, Seq("query_id"), "left")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .withColumn("recall_at_k",
        round(col("n_hits").cast("double") / lit(TopK.toDouble), 6))
      .orderBy(col("query_id"))
  }

  private val recallAtKSql =
    s"""WITH brute AS ($knnBruteSql),
       |ivf AS ($knnIvfSql)
       |SELECT query_id, coalesce(n_hits, 0) AS n_hits,
       |  round(coalesce(n_hits, 0) / CAST($TopK AS DOUBLE), 6)
       |    AS recall_at_k
       |FROM (SELECT DISTINCT query_id FROM brute)
       |  LEFT JOIN (
       |    SELECT b.query_id, count(*) AS n_hits
       |    FROM brute b JOIN ivf i
       |      ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id
       |    GROUP BY 1) USING (query_id)
       |ORDER BY query_id""".stripMargin

  /** Matryoshka prefix-dimension recall: exact top-$TopK under the
    * full 64-dim cosine vs exact top-$TopK under only the FIRST 32
    * dimensions — the quality/cost trade-off measure for
    * Matryoshka-style embeddings, where a prefix of the vector is a
    * usable lower-cost representation (half the FLOPs and half the
    * memory bandwidth per comparison at 100 TB corpus scale; this
    * query quantifies what that truncation costs in neighbor
    * fidelity). Same brute-force machinery as sim_knn_brute with the
    * arrays sliced at the source — the slice happens BEFORE the
    * cross join, so the prefix pass genuinely moves half the bytes.
    */
  private def knnBruteDims(s: SparkSession, dir: String,
      dims: Int): DataFrame = {
    import graft.functions.{DoubleSortableBits, SortableBitsToDouble}
    val e = Tables(s, dir, "embeddings")
      .withColumn("v", slice(col("embedding"), 1, dims))
      .withColumn("nrm", TextFns.norm(col("v")))
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    val corpus = e.filter(col("vec_id") >= 20)
      .select(col("vec_id").as("neighbor_id"), col("v").as("nv"),
        col("nrm").as("nn"))
    corpus.crossJoin(broadcast(queries))
      .withColumn("cosv", TextFns.cosineFrom(
        TextFns.dot(col("qv"), col("nv")), col("qn"), col("nn")))
      .groupBy(col("query_id"))
      .agg(graft.operators.TopKPairsAgg(
        DoubleSortableBits(col("cosv")), col("neighbor_id"), TopK).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("i", "p")))
      .select(col("query_id"), col("p.tie").as("neighbor_id"))
  }

  private def matryoshkaRecall(s: SparkSession, dir: String): DataFrame = {
    val full = knnBrute(s, dir).select(col("query_id"), col("neighbor_id"))
    val prefix = knnBruteDims(s, dir, 32)
    val hits = full.join(prefix, Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
    full.select(col("query_id")).distinct()
      .join(hits, Seq("query_id"), "left")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .withColumn("recall_prefix",
        round(col("n_hits").cast("double") / lit(TopK.toDouble), 6))
      .orderBy(col("query_id"))
  }

  private val matryoshkaRecallSql =
    s"""WITH full_nn AS ($knnBruteSql),
       |prefix_scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    list_cosine_similarity(CAST(q.embedding[1:32] AS DOUBLE[]),
       |                           CAST(c.embedding[1:32] AS DOUBLE[]))
       |      AS cosv
       |  FROM embeddings q JOIN embeddings c
       |    ON q.vec_id < 20 AND c.vec_id >= 20),
       |prefix_nn AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |        ORDER BY cosv DESC, neighbor_id) AS rnk
       |    FROM prefix_scored)
       |  WHERE rnk <= $TopK)
       |SELECT query_id, coalesce(n_hits, 0) AS n_hits,
       |  round(coalesce(n_hits, 0) / CAST($TopK AS DOUBLE), 6)
       |    AS recall_prefix
       |FROM (SELECT DISTINCT query_id FROM full_nn)
       |  LEFT JOIN (
       |    SELECT f.query_id, count(*) AS n_hits
       |    FROM full_nn f JOIN prefix_nn p
       |      ON f.query_id = p.query_id AND f.neighbor_id = p.neighbor_id
       |    GROUP BY 1) USING (query_id)
       |ORDER BY query_id""".stripMargin

  /** Gram matrix Gᵢⱼ = Σ_rows xᵢ·xⱼ of the embedding corpus (upper
    * triangle) — the d×d moment matrix behind PCA whitening, OPQ
    * rotation, and covariance-based drift monitors. ONE
    * `GramMomentsAgg` pass (operators/GramMomentsAgg.scala): each scan
    * partition accumulates the full triangle in a constant ~68 KB
    * 128-bit fixed-point buffer, partials merge by integer adds, and
    * the single result row unpacks to the 2080 output cells. No
    * per-row fan-out anywhere: the former shape exploded every row to
    * d(d+1)/2 = 2080 (i, j) rows whose decimal cast went through
    * Double.toString (~2.9 s of hidden single-task CPU at sf0.1 —
    * "hidden" because a `.count()` over this query let Catalyst prune
    * the unreferenced sum; the honest cost only surfaced in
    * `sim_covariance`, whose sort key kept it alive). The one Generate
    * left in the plan explodes the SINGLE aggregate row into 2080
    * cells above the aggregate — output formatting, not row fan-out.
    *
    * Exactness: float×float promoted to double is EXACT, each product
    * quantizes to scale 18 half-up from its exact binary value, and
    * the 128-bit integer accumulation is order-independent under any
    * partitioning or merge order (see GramMomentsAgg's scaladoc for
    * the 1-ulp quantization note vs the Cast path — identical output
    * after the final round at 9, verified cell-by-cell in r10).
    */
  private def gramMatrix(s: SparkSession, dir: String): DataFrame = {
    val d = 64
    Tables(s, dir, "embeddings")
      .agg(graft.operators.GramMomentsAgg(col("embedding"), d).as("m"))
      .select(explode(col("m.gram")).as("g"))
      .select(col("g.i").as("i"), col("g.j").as("j"),
        round(col("g.v").cast("double"), 9).as("gram"))
      .orderBy(col("i"), col("j"))
  }

  private val gramMatrixSql =
    """SELECT i, j,
      |  round(CAST(sum(CAST(
      |    CAST(embedding[i + 1] AS DOUBLE) *
      |    CAST(embedding[j + 1] AS DOUBLE)
      |    AS DECIMAL(38, 18))) AS DOUBLE), 9) AS gram
      |FROM embeddings,
      |  (SELECT unnest(range(0, 64)) AS i),
      |  (SELECT unnest(range(0, 64)) AS j)
      |WHERE j >= i
      |GROUP BY i, j ORDER BY i, j""".stripMargin

  /** Covariance matrix of the embedding corpus — the centered Gramian
    * Cᵢⱼ = E[xᵢxⱼ] − E[xᵢ]E[xⱼ] behind PCA whitening and drift
    * monitors; emitted as the top-20 off-diagonal entries by
    * magnitude (the correlated-dimension hotlist a whitening pass
    * targets first). The SAME single `GramMomentsAgg` pass as
    * `sim_gram_matrix` now carries n, the per-dimension sums and the
    * second moments in one buffer, so the centering is pure O(d²)
    * arithmetic on the one result row — the former three extra
    * broadcast subtrees (two re-aggregated sums scans plus a count
    * scan) are gone with the explode.
    *
    * r10 root cause of the "13× vs sibling" finding: this query's
    * 3.5 s was the explode shape's REAL cost — 4.2 M
    * double→decimal(38,18) casts, each a Double.toString, serialized
    * into the scan's single input task — which the sibling dodged in
    * the bench only because `.count()` pruned its unreferenced sum.
    * One aggregate with integer fixed-point quantization removes the
    * cost in both (bench: 3.5 s → ~0.3 s, and the sibling's number is
    * now honest rather than pruned-away).
    *
    * Exactness: moments accumulate in order-independent 128-bit
    * fixed point; the centering arithmetic runs in double from
    * identical decimal inputs on both engines (same ops, same order →
    * same IEEE result), rounded at 9. Ties in |cov| order break by
    * (i, j).
    */
  private def covariance(s: SparkSession, dir: String): DataFrame = {
    val d = 64
    Tables(s, dir, "embeddings")
      .agg(graft.operators.GramMomentsAgg(col("embedding"), d).as("m"))
      .select(col("m.n").as("n_rows"), col("m.sums").as("sums"),
        explode(col("m.gram")).as("g"))
      .filter(col("g.i") < col("g.j"))
      .select(col("g.i").as("i"), col("g.j").as("j"),
        // qdec: ratios of exact decimal sums can TIE (Quant)
        Quant.qdec(col("g.v").cast("double") / col("n_rows") -
          (element_at(col("sums"), col("g.i") + 1).cast("double") /
            col("n_rows")) *
          (element_at(col("sums"), col("g.j") + 1).cast("double") /
            col("n_rows")), 9).as("cov"))
      .orderBy(abs(col("cov")).desc, col("i"), col("j"))
      .limit(20)
  }

  private val covarianceSql =
    """WITH m AS (
      |  SELECT i, j,
      |    sum(CAST(CAST(embedding[i + 1] AS DOUBLE) *
      |             CAST(embedding[j + 1] AS DOUBLE)
      |        AS DECIMAL(38, 18))) AS sxy
      |  FROM embeddings,
      |    (SELECT unnest(range(0, 64)) AS i),
      |    (SELECT unnest(range(0, 64)) AS j)
      |  WHERE j > i GROUP BY i, j),
      |s AS (
      |  SELECT k, sum(CAST(CAST(embedding[k + 1] AS DOUBLE)
      |    AS DECIMAL(38, 18))) AS sx
      |  FROM embeddings, (SELECT unnest(range(0, 64)) AS k) GROUP BY k),
      |n AS (SELECT count(*) AS n_rows FROM embeddings)
      |SELECT i, j,
      |  floor((CAST(sxy AS DOUBLE) / n_rows -
      |    (CAST(si.sx AS DOUBLE) / n_rows) *
      |    (CAST(sj.sx AS DOUBLE) / n_rows)) * 1e9 + 0.5) / 1e9 AS cov
      |FROM m JOIN s si ON si.k = m.i JOIN s sj ON sj.k = m.j, n
      |ORDER BY abs(floor((CAST(sxy AS DOUBLE) / n_rows -
      |  (CAST(si.sx AS DOUBLE) / n_rows) *
      |  (CAST(sj.sx AS DOUBLE) / n_rows)) * 1e9 + 0.5) / 1e9) DESC, i, j LIMIT 20""".stripMargin

  /** IVF bucket-balance diagnostic — the nlist/centroid-quality table
    * an operator reads before sizing probes: per-centroid corpus
    * population, share, and load factor vs the uniform ideal. A
    * centroid with load_factor ≫ 1 is a hot bucket (its probes scan
    * disproportionately; at 100 TB the signal to re-train or split);
    * near-zero buckets waste nlist. Assignment is ONE narrow
    * NearestCentroids projection (constant plan width in nlist — the
    * r7 expression), aggregation is one tiny shuffle.
    */
  private def bucketBalance(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
    val cm: Seq[Seq[Double]] = e.filter(col("vec_id") < NumCentroids)
      .select(col("vec_id"), col("embedding")).collect()
      .sortBy(_.getLong(0))
      .map(_.getSeq[Float](1).map(_.toDouble).toSeq).toSeq
    val corpus = e.filter(col("vec_id") >= 20)
    val total = corpus.agg(count(lit(1)).as("n_total"))
    corpus
      .withColumn("cent_id",
        graft.functions.NearestCentroids(col("embedding"), cm, 1)
          .getItem(0).getField("cid"))
      .groupBy(col("cent_id").cast("long").as("cent_id"))
      .agg(count(lit(1)).as("n_vectors"))
      .crossJoin(broadcast(total))
      .select(col("cent_id"), col("n_vectors"),
        Quant.qdec(col("n_vectors").cast("double") / col("n_total"), 9)
          .as("share"), // qdec: int/int ratios can TIE (Quant)
        Quant.qdec(col("n_vectors").cast("double") * NumCentroids /
          col("n_total"), 9).as("load_factor"))
      .orderBy(col("cent_id"))
  }

  private val bucketBalanceSql =
    s"""WITH cents AS (
       |  SELECT vec_id AS cent_id, CAST(embedding AS DOUBLE[]) AS cv
       |  FROM embeddings WHERE vec_id < $NumCentroids),
       |corpus AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS nv
       |  FROM embeddings WHERE vec_id >= 20),
       |assigned AS (
       |  SELECT vec_id, cent_id FROM (
       |    SELECT vec_id, cent_id,
       |      row_number() OVER (PARTITION BY vec_id
       |        ORDER BY list_cosine_similarity(nv, cv) DESC, cent_id)
       |        AS arnk
       |    FROM corpus, cents)
       |  WHERE arnk = 1),
       |tot AS (SELECT count(*) AS n_total FROM corpus)
       |SELECT cent_id, count(*) AS n_vectors,
       |  floor(CAST(count(*) AS DOUBLE) / n_total * 1e9 + 0.5) / 1e9
       |    AS share,
       |  floor(CAST(count(*) AS DOUBLE) * $NumCentroids / n_total
       |    * 1e9 + 0.5) / 1e9 AS load_factor
       |FROM assigned, tot
       |GROUP BY cent_id, n_total ORDER BY cent_id""".stripMargin

  private val NumPlanes = 8

  /** Signed-random-projection (SRP / hyperplane) LSH top-5 — the
    * third ANN family next to IVF and IVF-PQ. Each vector gets an
    * 8-bit signature (bit j = sign of the dot with hyperplane j; the
    * hyperplanes are the first 8 embedding vectors, a deterministic
    * stand-in for Gaussian draws that the oracle can see). The corpus
    * is bucketed by signature; each query multi-probes its own bucket
    * plus all Hamming-distance-1 neighbors (9 of 256 buckets) and
    * ranks only those candidates by exact cosine. Approximate by
    * design — the oracle runs the identical algorithm and
    * hash-matches.
    *
    * Scale notes (100 TB): the signature pass is narrow (8 dots per
    * vector over broadcast hyperplanes — no shuffle); the candidate
    * join shuffles ONLY on the 8-bit signature, and the probe side
    * (queries × 9 masks) is tiny and broadcast, so the corpus is
    * touched once and only matching buckets are scored — SRP's
    * collision probability 1−θ/π per bit concentrates similar pairs
    * in probed buckets. More planes / wider multi-probe trade recall
    * vs candidates exactly like nlist/nprobe in IVF.
    */
  /** Two-stage retrieval: a cheap int8 first pass over the whole
    * corpus keeps the top-20 candidates per query, then ONLY those
    * 20 are re-scored with exact float cosine for the final top-5 —
    * the production shape for memory-bound ANN (the int8 codes are 4×
    * smaller than float32, so the scan stage streams a quarter of the
    * bytes, and the expensive exact math touches R·|queries| vectors
    * regardless of corpus size). `approx_rnk` rides along so the
    * output exposes how much the coarse pass re-ordered.
    *
    * Exactness: per-vector symmetric quantization is the
    * sim_quantize_int8 contract (scale = max|x|/127, floor(x/s + .5) —
    * exact doubles on both engines); the int8 dot is a sum of exact
    * small integers (≤ 64·127² < 2^20, order-free in doubles), and
    * `ascore = dot · qs · cs` is two left-associated IEEE multiplies
    * on both engines. The exact stage reuses knnBrute's bit-matching
    * cosine. First-pass candidates ride the bounded TopKPairsAgg, so
    * the shuffle carries ≤ R candidates per (query, partition).
    */
  private def rerankInt8(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{DoubleSortableBits, SortableBitsToDouble}
    val rWide = 20
    val e = Tables(s, dir, "embeddings")
      .withColumn("dv", transform(col("embedding"), x => x.cast("double")))
      .withColumn("scale",
        aggregate(col("dv"), lit(0.0),
          (acc, x) => greatest(acc, abs(x))) / 127.0)
      .withColumn("q8", transform(col("dv"),
        x => floor(x / col("scale") + 0.5)))
      .withColumn("nrm", TextFns.norm(col("embedding")))
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("nrm").as("qn"), col("scale").as("qs"), col("q8").as("qq"))
    val corpus = e.filter(col("vec_id") >= 20)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"),
        col("nrm").as("nn"), col("scale").as("cs"), col("q8").as("cq"))

    // stage 1: int8 scan — corpus never shuffles; per-query top-R only
    val cand = corpus.select(col("neighbor_id"), col("cs"), col("cq"))
      .crossJoin(broadcast(queries.select(col("query_id"), col("qs"),
        col("qq"))))
      .withColumn("adot", aggregate(
        zip_with(col("qq"), col("cq"), (a, b) => a * b),
        lit(0.0), (acc, x) => acc + x))
      .withColumn("ascore", col("adot") * col("qs") * col("cs"))
      .groupBy(col("query_id"))
      .agg(graft.operators.TopKPairsAgg(
        DoubleSortableBits(col("ascore")), col("neighbor_id"), rWide)
        .as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("i", "p")))
      .select(col("query_id"), col("p.tie").as("neighbor_id"),
        (col("i") + 1).as("approx_rnk"))

    // stage 2: exact cosine on R·|queries| rows only (both joins
    // broadcast the tiny side; the corpus side is a semi-scan)
    val exact = corpus.select(col("neighbor_id"), col("nv"), col("nn"))
      .join(broadcast(cand), "neighbor_id")
      .join(broadcast(queries.select(col("query_id"), col("qv"),
        col("qn"))), "query_id")
      .withColumn("cosv", TextFns.cosineFrom(
        TextFns.dot(col("qv"), col("nv")), col("qn"), col("nn")))
    exact
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosv").desc, col("neighbor_id"))))
      .filter(col("rnk") <= TopK)
      .select(col("query_id"), col("neighbor_id"), col("rnk"),
        col("approx_rnk"), col("cosv"))
      .orderBy(col("query_id"), col("rnk"))
  }

  private val rerankInt8Sql =
    s"""WITH z AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv,
       |    list_aggregate(list_transform(CAST(embedding AS DOUBLE[]),
       |      x -> abs(x)), 'max') / 127.0 AS scale
       |  FROM embeddings),
       |zz AS (SELECT vec_id, dv, scale,
       |  list_transform(dv, x -> floor(x / scale + 0.5)) AS q8 FROM z),
       |ap AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    list_dot_product(q.q8, c.q8) * q.scale * c.scale AS ascore
       |  FROM zz q JOIN zz c ON q.vec_id < 20 AND c.vec_id >= 20),
       |ar AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY ascore DESC, neighbor_id) AS approx_rnk FROM ap),
       |cand AS (SELECT query_id, neighbor_id, approx_rnk
       |  FROM ar WHERE approx_rnk <= 20),
       |ex AS (
       |  SELECT cand.query_id, cand.neighbor_id, cand.approx_rnk,
       |    list_cosine_similarity(q.dv, c.dv) AS cosv
       |  FROM cand JOIN zz q ON q.vec_id = cand.query_id
       |            JOIN zz c ON c.vec_id = cand.neighbor_id),
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY cosv DESC, neighbor_id) AS rnk FROM ex)
       |SELECT query_id, neighbor_id, rnk, approx_rnk, cosv
       |FROM r WHERE rnk <= $TopK ORDER BY query_id, rnk""".stripMargin

  private def srpLsh(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Column
    val e = Tables(s, dir, "embeddings")
    val planes: Seq[Seq[Float]] = e.filter(col("vec_id") < NumPlanes)
      .select(col("vec_id"), col("embedding")).collect()
      .sortBy(_.getLong(0)).map(_.getSeq[Float](1).toSeq).toSeq
    def sig(v: Column): Column = planes.zipWithIndex.map { case (h, j) =>
      when(TextFns.dot(v, typedlit(h)) > 0d, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)
    val corpus = e.filter(col("vec_id") >= 20)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"),
        sig(col("embedding")).as("sig"))
    val masks = (0 +: (0 until NumPlanes).map(1 << _)).toSeq
    val probes = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        sig(col("embedding")).as("qsig"))
      .select(col("query_id"), col("qv"), col("qsig"),
        explode(typedlit(masks)).as("mask"))
      .select(col("query_id"), col("qv"),
        col("qsig").bitwiseXOR(col("mask")).as("sig"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosv").desc, col("neighbor_id"))
    broadcast(probes).join(corpus, "sig")
      .withColumn("cosv", TextFns.cosine(col("qv"), col("nv")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= TopK)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), col("cosv"))
      .orderBy(col("query_id"), col("rnk"))
  }

  private val srpLshSql =
    s"""WITH planes AS (
       |  SELECT vec_id AS pid, CAST(embedding AS DOUBLE[]) AS pv
       |  FROM embeddings WHERE vec_id < $NumPlanes),
       |corpus AS (
       |  SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS nv
       |  FROM embeddings WHERE vec_id >= 20),
       |queries AS (
       |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
       |  FROM embeddings WHERE vec_id < 20),
       |csig AS (
       |  SELECT neighbor_id, CAST(sum(CASE WHEN list_dot_product(nv, pv) > 0
       |    THEN 1<<pid ELSE 0 END) AS BIGINT) AS sig
       |  FROM corpus, planes GROUP BY neighbor_id),
       |qsig AS (
       |  SELECT query_id, CAST(sum(CASE WHEN list_dot_product(qv, pv) > 0
       |    THEN 1<<pid ELSE 0 END) AS BIGINT) AS qs
       |  FROM queries, planes GROUP BY query_id),
       |masks AS (SELECT 0 AS m UNION ALL
       |  SELECT 1<<i FROM range(0,$NumPlanes) t(i)),
       |probes AS (SELECT query_id, xor(qs, CAST(m AS BIGINT)) AS sig
       |  FROM qsig, masks),
       |cand AS (SELECT DISTINCT query_id, neighbor_id
       |  FROM probes JOIN csig USING (sig)),
       |scored AS (
       |  SELECT query_id, neighbor_id,
       |    list_cosine_similarity(qv, nv) AS cosv
       |  FROM cand JOIN queries USING (query_id)
       |    JOIN corpus USING (neighbor_id)),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosv DESC, neighbor_id) AS rnk
       |  FROM scored)
       |SELECT query_id, neighbor_id, rnk, cosv FROM ranked
       |WHERE rnk <= $TopK ORDER BY query_id, rnk""".stripMargin

  /** Top principal direction by power iteration — the PCA primitive a
    * curation pipeline runs before whitening, Matryoshka truncation
    * sizing, or drift monitoring. One distributed pass computes the
    * exact covariance moments (the `GramMomentsAgg` one-pass
    * aggregate from `sim_covariance`); the d×d fixed-point covariance
    * (≤ 32 KB — dimension-bounded, never corpus-bounded) is then
    * iterated on the driver in exact BigInt arithmetic: vₜ₊₁ =
    * trunc(C·vₜ · S / max|C·vₜ|), twenty-four iterations from the all-ones
    * start, max-norm instead of L2 so no square root enters the
    * fixed-point path. Output: the eigenvector in 1e-9 units plus the
    * dominant-eigenvalue estimate (max|w|/S, also 1e-9 units).
    *
    * Exactness: the covariance cell is rounded at 9 decimals — the
    * precision at which the moment aggregate and the oracle's
    * decimal-cast path are verified identical — then scaled to a
    * 64-bit integer; from there both engines run the same integer
    * recurrence (BigInt here; HUGEINT in twenty-four unrolled oracle CTEs,
    * with a sign-split floor division that equals trunc on the
    * nonnegative operands both sides feed it).
    *
    * 100 TB shape: one scan, one 68 KB-buffer aggregate, O(d²·iters)
    * driver math, d output rows. The collect moves the moment buffer
    * only — same bounded-collect class as the centroid loads.
    */
  private def pcaPower(s: SparkSession, dir: String): DataFrame = {
    val d = 64
    val (v, lambdaFp) = pcaVector(s, dir)
    import s.implicits._
    (0 until d).map(i => (i, v(i), lambdaFp))
      .toDF("i", "v_fp", "lambda_fp")
      .orderBy(col("i"))
  }

  /** The moment pass + BigInt iteration shared by `sim_pca_power` and
    * `sim_pca_project`: returns (eigenvector in 1e-9 fixed point,
    * eigenvalue estimate in 1e-9 fixed point).
    */
  private def pcaVector(s: SparkSession, dir: String): (Array[Long], Long) = {
    val d = 64
    val S = 1000000000L
    val iters = 24
    val cells = Tables(s, dir, "embeddings")
      .agg(graft.operators.GramMomentsAgg(col("embedding"), d).as("m"))
      .select(col("m.n").as("n_rows"), col("m.sums").as("sums"),
        explode(col("m.gram")).as("g"))
      .select(col("g.i").as("i"), col("g.j").as("j"),
        round(Quant.qdec(col("g.v").cast("double") / col("n_rows") -
          (element_at(col("sums"), col("g.i") + 1).cast("double") /
            col("n_rows")) *
          (element_at(col("sums"), col("g.j") + 1).cast("double") /
            col("n_rows")), 9) * S, 0).cast("long").as("c"))
      .collect() // ≤ d(d+1)/2 rows — dimension-bounded, not corpus-bounded
    val C = Array.ofDim[Long](d, d)
    cells.foreach { r =>
      val (i, j, c) = (r.getInt(0), r.getInt(1), r.getLong(2))
      C(i)(j) = c
      C(j)(i) = c
    }
    var v = Array.fill(d)(BigInt(S))
    var m = BigInt(0)
    var t = 0
    while (t < iters) {
      val w = Array.tabulate(d) { i =>
        var acc = BigInt(0)
        var j = 0
        while (j < d) { acc += BigInt(C(i)(j)) * v(j); j += 1 }
        acc
      }
      m = w.map(_.abs).max
      require(m > 0, "pca_power: zero covariance matrix")
      // BigInt / truncates toward zero — the sign-split // form in SQL
      v = w.map(wi => wi * S / m)
      t += 1
    }
    (v.map(_.toLong), (m / S).toLong)
  }

  /** Downstream consumer of the principal direction: project every
    * embedding onto it and report the per-label projection profile
    * (count, mean, min, max) — the 1-D "where does each class sit
    * along the dominant axis" table a curation pipeline reads when
    * deciding whether the top direction encodes a nuisance factor
    * (length, language) worth projecting out before similarity work.
    *
    * Exactness: each per-element product is a deterministic double
    * (float→double exact, v_fp/1e9 exact, one IEEE multiply) cast to
    * scale-18 decimal; the per-row fold keeps the accumulator at
    * DECIMAL(30,18) so every addition stays within precision — ZERO
    * scale-shedding drift (unlike a (38,18) fold, where Spark's
    * decimal promotion rounds each step at 1e-17) — making the sum
    * bit-equal to the oracle's order-free decimal SUM over the same
    * products, whatever the row order.
    *
    * Scale shape: the moment pass + driver iteration of
    * `sim_pca_power`, then ONE narrow per-row fold (no explode — the
    * 64-term zip_with/aggregate stays inside the row) and a
    * label-keyed aggregate. The only data-sized shuffle carries one
    * row per vector.
    */
  private def pcaProject(s: SparkSession, dir: String): DataFrame = {
    val (v, _) = pcaVector(s, dir)
    val vCol = array(v.map(x => lit(x.toDouble / 1e9)): _*)
    // Contract: the per-element product must fit DECIMAL(20,18), i.e.
    // |x*w| < 100. Under Spark's default non-ANSI mode an overflow
    // would silently NULL the whole row's projection (the DuckDB
    // oracle computes at (38,18) and would keep it — a silent
    // cross-engine divergence), so out-of-range inputs FAIL LOUD
    // instead: |w| <= 1 by power-iteration normalization, so the
    // guard is on |x|. One codegen'd comparison per element.
    val proj = aggregate(
      zip_with(col("embedding"), vCol,
        (x, w) => when(abs(x.cast("double")) < lit(100d),
            (x.cast("double") * w).cast(DecimalType(20, 18)))
          .otherwise(raise_error(lit(
            "pca_project: |embedding value| >= 100 overflows DECIMAL(20,18)"))
            .cast(DecimalType(20, 18)))),
      lit(java.math.BigDecimal.ZERO).cast(DecimalType(30, 18)),
      (acc, t) => (acc + t).cast(DecimalType(30, 18)))
    Tables(s, dir, "embeddings")
      .select(col("label"), proj.as("p"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        Quant.qdec(sum(col("p")).cast("double") / count(lit(1)), 9)
          .as("mean_proj"), // qdec: decimal/int ratio can TIE (Quant)
        round(min(col("p")).cast("double"), 9).as("min_proj"),
        round(max(col("p")).cast("double"), 9).as("max_proj"))
      .orderBy(col("label"))
  }

  /** The shared WITH-chain (moments → cov9 → 24 iteration CTEs) plus
    * the per-query final SELECTs.
    */
  private val pcaChainSql: String = {
    val S = "1000000000"
    val iters = 24
    // Every CTE is MATERIALIZED: DuckDB inlines plain CTEs, and a
    // 24-step inlined chain (each step re-expanding the covariance
    // subtree) blows up planning time exponentially — measured minutes
    // at sf0.01 vs milliseconds materialized. The max enters via a
    // whole-frame window, not a scalar subquery, so each step reads
    // its predecessor exactly once.
    val steps = (1 to iters).map { t =>
      val p = s"v${t - 1}"
      s"""w$t AS MATERIALIZED (
         |  SELECT c.i AS i, sum(CAST(c.c AS HUGEINT) * v.v) AS w
         |  FROM covf c JOIN $p v ON v.i = c.j GROUP BY c.i),
         |v$t AS MATERIALIZED (
         |  SELECT i, CASE WHEN w < 0
         |    THEN -(((-w) * $S) // (max(abs(w)) OVER ()))
         |    ELSE ((w * $S) // (max(abs(w)) OVER ())) END AS v,
         |    max(abs(w)) OVER () AS m
         |  FROM w$t)""".stripMargin
    }.mkString(",\n")
    s"""WITH m AS MATERIALIZED (
       |  SELECT i, j,
       |    sum(CAST(CAST(embedding[i + 1] AS DOUBLE) *
       |             CAST(embedding[j + 1] AS DOUBLE)
       |        AS DECIMAL(38, 18))) AS sxy
       |  FROM embeddings
       |  CROSS JOIN (SELECT unnest(range(0, 64)) AS i)
       |  CROSS JOIN (SELECT unnest(range(0, 64)) AS j)
       |  WHERE j >= i GROUP BY i, j),
       |s AS MATERIALIZED (
       |  SELECT k, sum(CAST(CAST(embedding[k + 1] AS DOUBLE)
       |    AS DECIMAL(38, 18))) AS sx
       |  FROM embeddings
       |  CROSS JOIN (SELECT unnest(range(0, 64)) AS k) GROUP BY k),
       |n AS MATERIALIZED (SELECT count(*) AS n_rows FROM embeddings),
       |cov9 AS MATERIALIZED (
       |  SELECT i, j,
       |    CAST(round(floor((CAST(sxy AS DOUBLE) / n_rows -
       |      (CAST(si.sx AS DOUBLE) / n_rows) *
       |      (CAST(sj.sx AS DOUBLE) / n_rows)) * 1e9 + 0.5) / 1e9
       |      * $S, 0) AS BIGINT)
       |      AS c
       |  FROM m JOIN s si ON si.k = m.i JOIN s sj ON sj.k = m.j
       |  CROSS JOIN n),
       |covf AS MATERIALIZED (
       |  SELECT i, j, c FROM cov9
       |  UNION ALL SELECT j, i, c FROM cov9 WHERE i < j),
       |v0 AS MATERIALIZED (
       |  SELECT unnest(range(0, 64)) AS i, CAST($S AS HUGEINT) AS v),
       |$steps""".stripMargin
  }

  private val pcaPowerSql =
    s"""$pcaChainSql
       |SELECT i, CAST(v AS BIGINT) AS v_fp,
       |  CAST(m // 1000000000 AS BIGINT) AS lambda_fp
       |FROM v24 ORDER BY i""".stripMargin

  private val pcaProjectSql =
    s"""$pcaChainSql,
       |vd AS MATERIALIZED (
       |  SELECT i, CAST(v AS DOUBLE) / 1000000000 AS w FROM v24),
       |proj AS MATERIALIZED (
       |  SELECT e.vec_id, e.label,
       |    sum(CAST(CAST(e.embedding[vd.i + 1] AS DOUBLE) * vd.w
       |        AS DECIMAL(38, 18))) AS p
       |  FROM embeddings e CROSS JOIN vd
       |  GROUP BY e.vec_id, e.label)
       |SELECT label, count(*) AS n_vecs,
       |  floor(CAST(sum(p) AS DOUBLE) / count(*) * 1e9 + 0.5) / 1e9
       |    AS mean_proj,
       |  round(CAST(min(p) AS DOUBLE), 9) AS min_proj,
       |  round(CAST(max(p) AS DOUBLE), 9) AS max_proj
       |FROM proj GROUP BY label ORDER BY label""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("sim_pca_power", pcaPower, Some(pcaPowerSql)),
    QueryDef("sim_pca_project", pcaProject, Some(pcaProjectSql)),
    QueryDef("sim_srp_lsh", srpLsh, Some(srpLshSql)),
    QueryDef("sim_bucket_balance", bucketBalance, Some(bucketBalanceSql)),
    QueryDef("sim_covariance", covariance, Some(covarianceSql)),
    QueryDef("sim_gram_matrix", gramMatrix, Some(gramMatrixSql)),
    QueryDef("sim_recall_at_k", recallAtK, Some(recallAtKSql)),
    QueryDef("sim_matryoshka_recall", matryoshkaRecall,
      Some(matryoshkaRecallSql)),
    QueryDef("sim_ivf_nprobe_sweep", ivfNprobeSweep,
      Some(ivfNprobeSweepSql)),
    QueryDef("sim_mips_topk", mipsTopK, Some(mipsTopKSql)),
    QueryDef("sim_rerank_int8", rerankInt8, Some(rerankInt8Sql)),
    QueryDef("sim_index_api", indexApi, Some(knnBruteSql)),
    QueryDef("sim_hnsw", hnsw, Some(knnBruteSql)),
    QueryDef("sim_hnsw_append", hnswAppend, Some(knnBruteSql)),
    QueryDef("sim_hnsw_append_stream", hnswAppendStream,
      Some(knnBruteSql)),
    QueryDef("sim_ivf_append", ivfAppend, Some(knnBruteSql)),
    QueryDef("sim_ivf_append_stream", ivfAppendStream, Some(knnBruteSql)),
    QueryDef("sim_quantize_int8", quantizeInt8, Some(quantizeInt8Sql)),
    QueryDef("sim_pq_encode", pqEncode, Some(pqEncodeSql)),
    QueryDef("sim_pq_adc", pqAdc, Some(pqAdcSql)),
    QueryDef("sim_opq_trained", opqTrained, Some(opqTrainedSql)),
    QueryDef("sim_pq_index_api", pqIndexApi, Some(pqAdcSql)),
    QueryDef("sim_ivfpq_index_api", ivfPqIndexApi, Some(ivfPqIndexApiSql)),
    QueryDef("sim_ivfpq_append", ivfPqAppend, Some(ivfPqIndexApiSql)),
    QueryDef("sim_ivfpq_trained", ivfPqTrained, Some(ivfPqTrainedSql)),
    QueryDef("sim_kmeans_ivf", kmeansIvf, Some(kmeansIvfSql)),
    QueryDef("sim_knn_brute", knnBrute, Some(knnBruteSql)),
    QueryDef("sim_knn_ivf", knnIvf, Some(knnIvfSql)),
    QueryDef("sim_knn_graph", knnGraph, Some(knnGraphSql)),
    QueryDef("sim_label_noise", labelNoise, Some(labelNoiseSql)),
    QueryDef("sim_mmr_rerank", mmrRerank, Some(mmrRerankSql)),
    QueryDef("sim_snn_clusters", snnClusters, Some(snnClustersSql)),
    QueryDef("sim_range_search", rangeSearch, Some(rangeSearchSql)),
    QueryDef("sim_label_centroids", labelCentroids, Some(labelCentroidsSql)))
}
