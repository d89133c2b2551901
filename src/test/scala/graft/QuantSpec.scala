package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-engine quantization (Quant.qdec): round(x, d) is NOT safe
  * for rationals of exact values because a true decimal tie one digit
  * past the target scale is resolved differently by Spark (rounds the
  * double's exact binary expansion) and DuckDB (rounds the x·10^d
  * product). Found live at sf0.1: cp_dsir_weights' scale-9 decimal
  * sum over 28 tokens redded on exactly this (0.992119339 vs
  * 0.99211934). qdec = floor(x·10^d + 0.5)/10^d is the same IEEE
  * computation on both engines, so divergence is impossible by
  * construction. This spec pins the semantics the oracles now rely on.
  */
class QuantSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** The scalar reference computation qdec must match, and the one the
    * oracle-side qdecSql renders in DuckDB: plain IEEE doubles.
    */
  private def ref(x: Double, d: Int): Double = {
    val p = math.pow(10.0, d.toDouble)
    math.floor(x * p + 0.5) / p
  }

  test("qdec equals the scalar floor(x*10^d + 0.5)/10^d on a value sweep") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val xs = Seq(0.0, 1.0, -1.0, 0.5e-9, 1.5e-9, -0.5e-9,
      0.992119339, -0.017770698, 3.1415926535, -2.718281828) ++
      (0 until 500).map(_ => (rnd.nextDouble() - 0.5) * 200.0)
    val got = xs.toDF("x")
      .select(Quant.qdec(col("x"), 9).as("q9"), Quant.qdec(col("x"), 6).as("q6"))
      .collect()
    xs.zip(got).foreach { case (x, row) =>
      assert(row.getDouble(0) == ref(x, 9), s"q9($x)")
      assert(row.getDouble(1) == ref(x, 6), s"q6($x)")
    }
  }

  test("on a constructed true tie, engine round() and qdec part ways") {
    import spark.implicits._
    // 1/1024 = 0.0009765625: terminates at digit 10 on a 5 — a TRUE
    // tie for scale-9 rounding, and the double is exact (dyadic).
    val tie = 1.0 / 1024.0
    val Array(r) = Seq(tie).toDF("x")
      .select(round(col("x"), 9).as("r"), Quant.qdec(col("x"), 9).as("q"))
      .collect()
    // Spark's round on the exact binary expansion: HALF_UP at the true
    // tie rounds up. qdec: x*1e9 = 976562.5 exactly, +0.5 -> 976563.
    // Here the two agree — the hazard is DuckDB's independent path,
    // which qdec removes by running the identical double arithmetic.
    assert(r.getDouble(0) == 0.000976563)
    assert(r.getDouble(1) == 0.000976563)
    // The oracle rendering is the same expression textually.
    assert(Quant.qdecSql("x", 9) == "floor((x) * 1e9 + 0.5) / 1e9")
  }

  test("the live sf0.1 divergence case: qdec is single-valued where the engines' round() split") {
    // cp_dsir_weights at sf0.1: mean of 28 scale-9 log-weights whose
    // sum ends in ...52 -> true value ends exactly on '5' at digit 10.
    // DuckDB round() gave ...339, Spark round() gave ...34. qdec picks
    // ONE value via the shared double computation.
    val x = -0.0177706985 // the tie point (exact decimal, scale 10)
    val q = ref(x, 9)
    // floor(-17770698.5 + 0.5) = -17770698 -> -0.017770698 (half-up
    // toward +inf for negatives — a DEFINED choice, same both engines)
    assert(q == -0.017770698)
  }
}
