package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.ConnectedComponents

/** Equivalence properties for the two connected-components
  * algorithms: on random graphs of several shapes, large-star/
  * small-star, min-label propagation, and a driver-side union-find
  * must all produce the identical (node → min-id-in-component)
  * labeling.
  */
class ConnectedComponentsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Driver-side union-find oracle. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(n => n -> find(n)).toMap
  }

  private def check(edges: Seq[(Long, Long)], label: String,
      alsoLabelProp: Boolean = true): Unit = {
    import spark.implicits._
    val df = edges.toDF("x", "y")
    val expect = unionFind(edges)
    assert(expect.nonEmpty, s"$label: degenerate fixture")
    // default path: the bounded endgame absorbs these small graphs
    val stars = ConnectedComponents.alternatingStars(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stars == expect, s"$label: alternatingStars != union-find")
    // forced pure-distributed path (localFinishEdges = 0): the star
    // rounds themselves must produce the same labeling
    val dist = ConnectedComponents.alternatingStars(df,
        localFinishEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == expect, s"$label: distributed stars != union-find")
    if (alsoLabelProp) { // skipped where O(diameter) rounds is the point
      val prop = ConnectedComponents.labelPropagation(df, maxRounds = 60)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(prop == expect, s"$label: labelPropagation != union-find")
    }
  }

  test("random sparse graphs: stars == label propagation == union-find") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val n = 40 + rnd.nextInt(60)
      val m = n / 2 + rnd.nextInt(n)
      val edges = Seq.fill(m)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      check(edges, s"sparse trial $trial (n=$n, m=${edges.size})")
    }
  }

  test("long chain (the diameter killer) converges inside the default" +
      " round cap") {
    // a 400-node path: label propagation would need ~400 rounds — the
    // shape the star algorithm exists for; it must converge inside its
    // default 20-round cap (O(log² n)) and still match union-find
    val chain = (0L until 399L).map(i => (i, i + 1))
    check(chain, "chain-400", alsoLabelProp = false)
    import spark.implicits._
    val got = ConnectedComponents.alternatingStars(chain.toDF("x", "y"),
        localFinishEdges = 0) // the round-count claim needs real rounds
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == 400 && got.forall(_._2 == 0L))
  }

  test("edge-case graphs: duplicates, reversed orientation, self-loops," +
      " two components, empty") {
    import spark.implicits._
    val edges = Seq((5L, 1L), (1L, 5L), (5L, 5L), (1L, 5L), // dup + loop
      (2L, 8L), (8L, 9L)) // second component
    check(edges.filter { case (a, b) => a != b }, "messy")
    val withLoops = ConnectedComponents.alternatingStars(edges.toDF("x", "y"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(withLoops == Map(1L -> 1L, 5L -> 1L, 2L -> 2L, 8L -> 2L, 9L -> 2L))
    val empty = ConnectedComponents.alternatingStars(
      Seq.empty[(Long, Long)].toDF("x", "y"))
    assert(empty.collect().isEmpty)
  }

  test("string node ids label via the distributed path (endgame is " +
      "long-only and must not NPE on non-integral keys)") {
    import spark.implicits._
    val edges = Seq(("docA", "docB"), ("docB", "docC"), ("docX", "docY"))
    // default localFinishEdges (1<<16) puts 3 edges squarely in the
    // endgame regime — eligibility must bounce it to the star loop
    val got = ConnectedComponents.alternatingStars(edges.toDF("x", "y"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("docA" -> "docA", "docB" -> "docA",
      "docC" -> "docA", "docX" -> "docX", "docY" -> "docX"))
  }

  test("round-cap exhaustion throws instead of returning a wrong labeling") {
    import spark.implicits._
    // a 64-node path needs several star rounds and ~64 propagation
    // rounds; with maxRounds = 1 neither can reach the fixpoint, and a
    // silent partial labeling would split the component downstream
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("x", "y")
    val e1 = intercept[IllegalStateException] {
      ConnectedComponents.alternatingStars(chain, maxRounds = 1,
        localFinishEdges = 0).collect()
    }
    assert(e1.getMessage.contains("did not converge"))
    val e2 = intercept[IllegalStateException] {
      ConnectedComponents.labelPropagation(chain, maxRounds = 1).collect()
    }
    assert(e2.getMessage.contains("did not converge"))
    // the endgame rescues the same graph under the same round cap —
    // the tail a converged-enough set no longer pays rounds for
    import spark.implicits._
    val rescued = ConnectedComponents.alternatingStars(
        (0L until 63L).map(i => (i, i + 1)).toDF("x", "y"), maxRounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rescued.size == 64 && rescued.values.forall(_ == 0L))
  }

  test("endgame collect bound is loud: a cap past 2^20 edges is rejected") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("x", "y")
    val ex = intercept[IllegalArgumentException] {
      ConnectedComponents.alternatingStars(df, localFinishEdges = (1 << 20) + 1)
    }
    assert(ex.getMessage.contains("bounded"))
  }
}
