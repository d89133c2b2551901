package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Shared kernel for [[NearestCentroids]] / [[CentroidVector]]: the
  * centroid matrix enters generated code as ONE reference object
  * (`double[][]`), so plan width and codegen size are constant in
  * nlist — the scale fix for the per-centroid column fan-out the
  * earlier `cos_0 … cos_k` + `greatest` + CASE-chain assignment paid
  * (that shape caps nlist at a few hundred before Janino limits;
  * production nlist ~ √n is 10⁴–10⁵).
  *
  * Cosines are bit-identical to the fan-out form and to DuckDB's
  * `list_cosine_similarity(CAST(… AS DOUBLE[]))`:
  * `dot / (vnorm * cnorm)` with every dot a sequential double
  * accumulation (float elements promoted per element, exactly
  * [[FloatVecDot]]) and each norm `sqrt` of such a dot. Centroid
  * norms are precomputed once per plan, matching the driver-side
  * `math.sqrt(v.map(x => x * x).sum)` of the literal form (a Seq sum
  * is the same left-to-right fold).
  */
object NearestCentroidsHelper {

  /** Top-k centroids of `arr` by (cosine desc, cid asc) — the exact
    * ranking the `row_number() OVER (ORDER BY cos DESC, cent_id)`
    * probe windows and the `greatest` + first-match CASE chain both
    * produce. Double comparisons use `java.lang.Double.compare`, i.e.
    * Spark's SQL ordering (NaN greatest), so a degenerate zero-norm
    * vector ranks the same way it did under `greatest`.
    *
    * Returns null when the input has a null element or its length
    * differs from the centroid dim (the fan-out form yielded cid −1
    * with all-null scores there; neither occurs on containsNull=false
    * fixed-dim embedding columns — made an explicit NULL contract
    * here).
    */
  def select(arr: ArrayData, cents: Array[Array[Double]],
      norms: Array[Double], isFloat: Boolean, k: Int): GenericArrayData = {
    val dim = if (cents.length == 0) 0 else cents(0).length
    val n = arr.numElements()
    if (n != dim) return null
    // input vector promoted once (lossless for floats) + its norm
    val v = new Array[Double](n)
    var i = 0
    var sq = 0.0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      v(i) = x
      sq += x * x
      i += 1
    }
    val vnorm = math.sqrt(sq)
    // single pass over centroids, insertion into a k-slot buffer
    val kk = math.min(k, cents.length)
    val bs = new Array[Double](kk)
    val bi = new Array[Int](kk)
    var filled = 0
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      var acc = 0.0
      i = 0
      while (i < dim) { acc += v(i) * cv(i); i += 1 }
      val score = acc / (vnorm * norms(c))
      var pos =
        if (filled < kk) { filled += 1; filled - 1 }
        else if (java.lang.Double.compare(score, bs(kk - 1)) > 0) kk - 1
        else -1
      if (pos >= 0) {
        while (pos > 0 && java.lang.Double.compare(score, bs(pos - 1)) > 0) {
          bs(pos) = bs(pos - 1); bi(pos) = bi(pos - 1); pos -= 1
        }
        bs(pos) = score
        bi(pos) = c
      }
      c += 1
    }
    val out = new Array[Any](filled)
    i = 0
    while (i < filled) {
      out(i) = InternalRow(bi(i), bs(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  def centroidAt(cid: Int, cents: Array[Array[Double]]): GenericArrayData =
    if (cid < 0 || cid >= cents.length) null
    else new GenericArrayData(cents(cid))
}

/** `NearestCentroids(vec, centroids, k)` → the k nearest centroids of
  * a float/double vector column as `array<struct<cid:int,
  * score:double>>`, ranked (cosine desc, cid asc); `cid` is the row
  * index into `centroids`. One narrow projection regardless of nlist
  * or k: coarse IVF assignment is `k = 1`, multi-probe bucketing
  * explodes the k-element result — neither an O(nlist) column fan-out
  * nor an O(n·nlist) crossJoin-then-rank row fan-out.
  */
case class NearestCentroids(child: Expression, centroids: Seq[Seq[Double]],
    k: Int) extends UnaryExpression {

  require(k >= 1, s"nearest_centroids: k=$k must be >= 1")
  require(centroids.nonEmpty, "nearest_centroids: empty centroid matrix")

  @transient private lazy val centsArr: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  // sqrt of the same sequential sum-of-squares fold the driver-side
  // literal form used (Seq#sum is a left fold)
  @transient private lazy val normsArr: Array[Double] =
    centroids.map(v => math.sqrt(v.map(x => x * x).sum)).toArray

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroids expects array<float> or array<double>, " +
        s"got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("cid", IntegerType, nullable = false),
    StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any =
    NearestCentroidsHelper.select(input.asInstanceOf[ArrayData],
      centsArr, normsArr, isFloat, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cents = ctx.addReferenceObj("cents", centsArr, "double[][]")
      val norms = ctx.addReferenceObj("norms", normsArr, "double[]")
      s"""
         |${ev.value} = graft.functions.NearestCentroidsHelper.select(
         |  $a, $cents, $norms, $isFloat, $k);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroids {
  def apply(vec: Column, centroids: Seq[Seq[Double]], k: Int): Column =
    ColumnBridge.column(new NearestCentroids(
      ColumnBridge.expression(vec), centroids, k))
}

/** `CentroidVector(cid, centroids)` → the centroid row at `cid` as
  * `array<double>` (null out of range) — the constant-width
  * replacement for the per-centroid CASE chain that re-materialized
  * the assigned centroid for residual computation.
  */
case class CentroidVector(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression {

  require(centroids.nonEmpty, "centroid_vector: empty centroid matrix")

  @transient private lazy val centsArr: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"centroid_vector expects int, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    NearestCentroidsHelper.centroidAt(input.asInstanceOf[Int], centsArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, cid => {
      val cents = ctx.addReferenceObj("cents", centsArr, "double[][]")
      s"""
         |${ev.value} = graft.functions.NearestCentroidsHelper.centroidAt(
         |  $cid, $cents);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CentroidVector {
  def apply(cid: Column, centroids: Seq[Seq[Double]]): Column =
    ColumnBridge.column(new CentroidVector(
      ColumnBridge.expression(cid), centroids))
}
