package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GramMomentsAgg

/** GramMomentsAgg invariants the oracle-gated queries can't isolate:
  * the fixed-point quantization against its BigDecimal reference, the
  * 128-bit accumulation against BigInteger, end-to-end moments against
  * a driver-side brute force across multiple partitions (so map-side
  * partials and merges both fire), and the range guard.
  */
class GramMomentsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("scale18 matches exact-binary BigDecimal rounding on random doubles") {
    val rnd = new scala.util.Random(42)
    val probes = Seq(0.0, 1.0, -1.0, 0.5, -0.5, 1e-30, -1e-30, 9.0, -9.0,
      java.lang.Double.MIN_VALUE, 0.1f.toDouble * 0.3f.toDouble) ++
      (1 to 20000).map { _ =>
        // float×float products, the aggregate's actual input domain
        val x = (rnd.nextFloat() * 2 - 1).toDouble
        val y = (rnd.nextFloat() * 2 - 1).toDouble
        x * y
      } ++
      (1 to 2000).map(_ => (rnd.nextDouble() * 18) - 9)
    for (p <- probes) {
      // reference: round-half-up of the EXACT binary expansion
      val want = new java.math.BigDecimal(p)
        .setScale(18, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()
      assert(GramMomentsAgg.scale18(p) === want, s"p=$p")
    }
  }

  test("add128 matches BigInteger over random signed sequences") {
    val rnd = new scala.util.Random(7)
    val acc = new Array[Long](2)
    var ref = java.math.BigInteger.ZERO
    for (_ <- 1 to 50000) {
      val v = rnd.nextLong() // full-range, forces carries both ways
      GramMomentsAgg.add128(acc, 0, v)
      ref = ref.add(java.math.BigInteger.valueOf(v))
    }
    val got = java.math.BigInteger.valueOf(acc(0)).shiftLeft(64)
      .add(new java.math.BigInteger(1,
        java.nio.ByteBuffer.allocate(8).putLong(acc(1)).array()))
    assert(got === ref)
  }

  test("aggregate equals brute force across partitions, and n counts rows") {
    import spark.implicits._
    val d = 8
    val rnd = new scala.util.Random(11)
    val vecs = (1 to 257).map(_ => Array.fill(d)(rnd.nextFloat() * 2 - 1))
    val df = vecs.toDF("embedding").repartition(7)
    val row = df.agg(GramMomentsAgg(col("embedding"), d).as("m"))
      .select(col("m.n"), col("m.sums"), col("m.gram")).head()
    assert(row.getLong(0) === 257L)

    def ref18(p: Double) = new java.math.BigDecimal(p)
      .setScale(18, java.math.RoundingMode.HALF_UP)
    val wantSums = (0 until d).map(k =>
      vecs.map(v => ref18(v(k).toDouble)).reduce(_.add(_)))
    val gotSums = row.getSeq[java.math.BigDecimal](1)
    assert(gotSums.map(_.stripTrailingZeros) ===
      wantSums.map(_.stripTrailingZeros))

    val gotGram = row.getSeq[org.apache.spark.sql.Row](2)
    assert(gotGram.size === d * (d + 1) / 2)
    for (g <- gotGram) {
      val (i, j) = (g.getInt(0), g.getInt(1))
      val want = vecs.map(v => ref18(v(i).toDouble * v(j).toDouble))
        .reduce(_.add(_))
      assert(g.getDecimal(2).stripTrailingZeros ===
        want.stripTrailingZeros, s"cell ($i,$j)")
    }
  }

  test("null embeddings are skipped; empty input yields n=0 and zero sums") {
    import spark.implicits._
    val d = 4
    val df = Seq(Some(Array(1f, 2f, 0.5f, -1f)), None, Some(Array(1f, 1f, 1f, 1f)))
      .toDF("embedding")
    val row = df.agg(GramMomentsAgg(col("embedding"), d).as("m"))
      .select(col("m.n"), col("m.sums")).head()
    assert(row.getLong(0) === 2L)
    assert(row.getSeq[java.math.BigDecimal](1).head.doubleValue === 2.0)

    val empty = Seq.empty[Array[Float]].toDF("embedding")
      .agg(GramMomentsAgg(col("embedding"), d).as("m"))
      .select(col("m.n"), col("m.gram")).head()
    assert(empty.getLong(0) === 0L)
    assert(empty.getSeq[org.apache.spark.sql.Row](1)
      .forall(_.getDecimal(2).signum == 0))
  }

  test("out-of-range component and wrong dimension fail loudly") {
    import spark.implicits._
    val big = Seq(Array(100f, 0f)).toDF("embedding")
    val e1 = intercept[Exception] {
      big.agg(GramMomentsAgg(col("embedding"), 2)).head()
    }
    assert(e1.getMessage.contains("gram_moments") ||
      e1.getCause != null && e1.getCause.getMessage.contains("gram_moments"))
    val short = Seq(Array(1f, 2f)).toDF("embedding")
    val e2 = intercept[Exception] {
      short.agg(GramMomentsAgg(col("embedding"), 3)).head()
    }
    assert(e2.getMessage.contains("expected 3") ||
      e2.getCause != null && e2.getCause.getMessage.contains("expected 3"))
  }
}
