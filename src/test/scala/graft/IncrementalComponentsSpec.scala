package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.{ConnectedComponents, IncrementalComponents => IC}

/** The incremental-CC contracts the full-graph oracle can't see:
  * (1) CONFLUENCE — on random multi-batch corpora the staged
  * incremental labels equal the batch-global CC fixpoint; (2) the
  * TOUCHED-ONLY mechanic — labels of components with no delta edge
  * pass through by reference (proved by poisoning them with a
  * sentinel component id a recompute could never produce and
  * observing it survive).
  */
class IncrementalComponentsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def labelsOf(df: org.apache.spark.sql.DataFrame)
      : Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("staged incremental labels equal batch-global CC on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 3) {
      // small vocab + shared sentence stems force near-dup clusters
      val stems = (0 until 6).map(_ =>
        (0 until 8).map(_ => s"w${rnd.nextInt(10)}").mkString(" "))
      val docs = (0L until 40L).map { id =>
        val stem = stems(rnd.nextInt(stems.length))
        val tail = if (rnd.nextBoolean()) "" else s" x${rnd.nextInt(3)}"
        (id, stem + tail)
      }.toDF("doc_id", "text")
      val full = ConnectedComponents
        .alternatingStars(IC.pairsWithin(
          IC.postings(docs, "doc_id", "text"), 0.5))
        .select(col("node").as("doc_id"), col("component"))

      // three stages by id range
      val base = docs.filter(col("doc_id") < 20)
      val b1 = docs.filter(col("doc_id").between(20, 29))
      val b2 = docs.filter(col("doc_id") >= 30)
      val p0 = IC.postings(base, "doc_id", "text")
      val l0 = ConnectedComponents
        .alternatingStars(IC.pairsWithin(p0, 0.5))
        .select(col("node").as("doc_id"), col("component"))
      val bp1 = IC.postings(b1, "doc_id", "text")
      val l1 = IC.relabel(l0, IC.deltaPairs(p0, bp1, 0.5))
      val p1 = p0.unionByName(bp1)
      val bp2 = IC.postings(b2, "doc_id", "text")
      val l2 = IC.relabel(l1, IC.deltaPairs(p1, bp2, 0.5))
      assert(labelsOf(l2) == labelsOf(full), s"trial $trial diverged")
    }
  }

  test("untouched components pass through by reference (sentinel survives)") {
    import spark.implicits._
    // cluster A: docs 0,1 near-identical; cluster B: docs 10,11;
    // batch doc 20 is similar ONLY to cluster B
    val base = Seq(
      (0L, "a b c d e f g h"),
      (1L, "a b c d e f g h i"),
      (10L, "p q r s t u v w"),
      (11L, "p q r s t u v w x")).toDF("doc_id", "text")
    val batch = Seq((20L, "p q r s t u v w y")).toDF("doc_id", "text")
    val p0 = IC.postings(base, "doc_id", "text")
    // poison cluster A's labels with a sentinel no recompute would emit
    val l0 = Seq((0L, -999L), (1L, -999L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "component")
    val bp = IC.postings(batch, "doc_id", "text")
    val delta = IC.deltaPairs(p0, bp, 0.5)
    // the batch doc pairs with cluster B only
    val ends = delta.select(col("doc_a").as("d"))
      .unionByName(delta.select(col("doc_b").as("d")))
      .distinct().as[Long].collect().toSet
    assert(ends.contains(20L) && !(ends.contains(0L) || ends.contains(1L)),
      s"delta endpoints were $ends")
    val got = labelsOf(IC.relabel(l0, delta))
    assert(got(0L) == -999L && got(1L) == -999L,
      "untouched cluster A was recomputed (sentinel lost)")
    assert(got(10L) == 10L && got(11L) == 10L && got(20L) == 10L,
      s"cluster B not relabeled correctly: $got")
    // the WRITTEN delta artifacts are O(touched), never O(all labels):
    // retired = {cluster B's component}, relabeled = B's members + the
    // batch doc — cluster A appears in neither
    val (retired, relabeled) = IC.relabelDelta(l0, delta)
    val ret = retired.as[Long].collect().toSet
    assert(ret == Set(10L), s"retired was $ret")
    val ld = labelsOf(relabeled)
    assert(ld.keySet == Set(10L, 11L, 20L) && !ld.contains(0L),
      s"relabeled delta was $ld")
  }

  test("delta pair build prunes accepted postings to the batch footprint") {
    import spark.implicits._
    val base = Seq((0L, "a b c d"), (1L, "z y x w")).toDF("doc_id", "text")
    val batch = Seq((5L, "a b c e")).toDF("doc_id", "text")
    val plan = IC.deltaPairs(IC.postings(base, "doc_id", "text"),
        IC.postings(batch, "doc_id", "text"), 0.5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan.take(800))
  }
}
