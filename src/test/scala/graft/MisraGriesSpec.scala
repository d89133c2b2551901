package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MisraGriesAgg

/** Misra–Gries guarantees in the EVICTION regime (key space larger
  * than k, decrements firing on the map side and in merges), which the
  * oracle-gated query can't cover: presence of every true heavy
  * hitter, the n/(k+1) underestimate bound, and the size bound — on
  * skewed synthetic streams across multiple partitions, plus exactness
  * when the key space fits.
  */
class MisraGriesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def sketch(items: Seq[String], k: Int,
      parts: Int): Map[String, Long] = {
    import spark.implicits._
    items.toDF("item").repartition(parts)
      .agg(MisraGriesAgg(col("item"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("exact regime: distinct keys <= k reproduces exact counts") {
    val items = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(7)("c")
    val rnd = new scala.util.Random(1)
    val got = sketch(rnd.shuffle(items), k = 8, parts = 4)
    assert(got == Map("a" -> 40L, "b" -> 25L, "c" -> 7L))
  }

  test("eviction regime: heavy items survive with bounded underestimate") {
    // skewed stream: 2 heavy keys + a long uniform tail, key space >> k
    val heavy = Seq.fill(400)("hot1") ++ Seq.fill(300)("hot2")
    val tail = (0 until 600).map(i => s"t$i")
    val items = new scala.util.Random(7).shuffle(heavy ++ tail)
    val n = items.size
    val k = 16
    val bound = n / (k + 1) // 76
    val got = sketch(items, k, parts = 4)
    assert(got.size <= k)
    for ((key, trueCount) <- Seq("hot1" -> 400L, "hot2" -> 300L)) {
      // true count > n/(k+1): MUST be present...
      assert(got.contains(key), s"$key missing (guarantee violated)")
      // ...never overestimated, underestimated by at most n/(k+1)
      assert(got(key) <= trueCount && got(key) >= trueCount - bound,
        s"$key est=${got(key)} true=$trueCount bound=$bound")
    }
    // no tail item can out-count a heavy one's floor
    assert(got.filterNot(e => e._1.startsWith("hot"))
      .forall(_._2 <= bound + 1))
  }

  test("single-partition eviction matches the textbook stream bound") {
    // x: 100 of n=250, bound n/(k+1)=50 — strictly above the
    // guarantee threshold WITH margin (a count equal to the bound may
    // legally evict to zero, which is why 50-of-250 would be flaky)
    val items = Seq.fill(100)("x") ++ (0 until 150).map(i => s"u$i")
    val got = sketch(items, k = 4, parts = 1)
    val bound = items.size / 5
    assert(got.contains("x") && got("x") >= 100L - bound && got("x") <= 100L)
  }
}
