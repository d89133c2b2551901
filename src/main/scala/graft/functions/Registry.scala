package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** SQL-surface registration for the custom expressions, so
  * `spark.sql("SELECT float_vec_dot(a, b) ...")` works alongside the
  * Column API — the engine's UDF/function registry analogue. The
  * builders here are the single source of truth; GraftExtensions
  * injects the same ones at session build time.
  */
object Registry {

  private def intArg(e: Expression, name: String): Int = e.eval() match {
    case i: Int => i
    case l: Long if l.isValidInt => l.toInt
    case other => throw new IllegalArgumentException(
      s"$name expects a literal int argument, got $other")
  }

  private def longArg(e: Expression, name: String): Long = e.eval() match {
    case i: Int => i.toLong
    case l: Long => l
    case other => throw new IllegalArgumentException(
      s"$name expects a literal integer argument, got $other")
  }

  /** name -> (usage, builder) for every SQL-exposed function. */
  val builders: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("float_vec_dot", "dot product of two float arrays (double acc)",
      exprs => FloatVecDot(exprs(0), exprs(1))),
    ("word_shingles", "distinct word k-shingles of a document",
      exprs => WordShingles(exprs(0), intArg(exprs(1), "word_shingles"))),
    ("minhash_signature", "minhash signature of a shingle array",
      exprs => MinHashSignature(exprs(0), intArg(exprs(1), "minhash_signature"))),
    ("simhash60", "60-bit simhash of a token array",
      exprs => SimHash60(exprs(0))),
    ("horner_hash", "codepoint Horner hash: fold((acc*mult + cp) % mod)",
      exprs => HornerHash(exprs(0),
        longArg(exprs(1), "horner_hash"),
        longArg(exprs(2), "horner_hash"))),
    ("kgram_hashes", "rolling k-gram Horner hashes of a string",
      exprs => KGramHashes(exprs(0),
        intArg(exprs(1), "kgram_hashes"),
        longArg(exprs(2), "kgram_hashes"),
        longArg(exprs(3), "kgram_hashes"))),
    ("count_min", "count-min sketch cells (depth x width) of a bigint key",
      exprs => graft.operators.CountMinAgg(exprs(0),
        intArg(exprs(1), "count_min"), intArg(exprs(2), "count_min"))),
    ("topk_pairs", "bounded top-k (value desc, tie asc) long pairs",
      exprs => graft.operators.TopKPairsAgg(exprs(0), exprs(1),
        intArg(exprs(2), "topk_pairs"))),
    ("double_vec_dot", "dot product of two double arrays (sequential fold)",
      exprs => DoubleVecDot(exprs(0), exprs(1))),
    ("double_sortable_bits", "order-preserving bits of a double (for long top-k)",
      exprs => DoubleSortableBits(exprs(0))),
    ("sortable_bits_to_double", "inverse of double_sortable_bits",
      exprs => SortableBitsToDouble(exprs(0))),
    ("nearest_centroids",
      "k nearest (cid, cosine) for a float vector vs a literal centroid matrix",
      exprs => NearestCentroids(exprs(0), matrixArg(exprs(1)),
        intArg(exprs(2), "nearest_centroids"))),
    ("misra_gries", "bounded heavy-hitter summary: k (item, est) counters",
      exprs => graft.operators.MisraGriesAgg(exprs(0),
        intArg(exprs(1), "misra_gries"))))

  /** Literal array-of-numeric-arrays argument (the centroid matrix).
    * SQL literals type freely — `array(array(1.0, 0.0))` is
    * decimal(2,1), not double — so dispatch the element read on the
    * DECLARED element type; reading decimal bytes through getDouble
    * would misread (or throw an opaque ClassCastException).
    */
  private def matrixArg(e: Expression): Seq[Seq[Double]] = {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types._
    val readElem: (ArrayData, Int) => Double = e.dataType match {
      case ArrayType(ArrayType(et, _), _) => et match {
        case DoubleType => (r, j) => r.getDouble(j)
        case FloatType => (r, j) => r.getFloat(j).toDouble
        case d: DecimalType =>
          (r, j) => r.getDecimal(j, d.precision, d.scale).toDouble
        case IntegerType => (r, j) => r.getInt(j).toDouble
        case LongType => (r, j) => r.getLong(j).toDouble
        case ShortType => (r, j) => r.getShort(j).toDouble
        case ByteType => (r, j) => r.getByte(j).toDouble
        case other => throw new IllegalArgumentException(
          "nearest_centroids expects a literal array<array<numeric>> " +
            s"matrix, got element type $other")
      }
      case other => throw new IllegalArgumentException(
        "nearest_centroids expects a literal array<array<numeric>> " +
          s"matrix, got ${other.sql}")
    }
    e.eval() match {
      case a: ArrayData =>
        (0 until a.numElements()).map { i =>
          val row = a.getArray(i)
          (0 until row.numElements()).map(j => readElem(row, j))
        }
      case other => throw new IllegalArgumentException(
        s"nearest_centroids expects a literal array<array<numeric>> matrix, got $other")
    }
  }

  // Registries graft has already populated, weakly keyed so dropped
  // sessions don't pin their registry. Tracking OUR registrations
  // (rather than name existence) means a graft name colliding with a
  // Spark built-in or a user temp function still gets re-registered to
  // graft's implementation on first call — existence-checking would
  // silently keep the foreign one — while repeat calls stay silent.
  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[AnyRef, java.lang.Boolean]())

  /** Idempotent per session: first call on a session registers (or
    * re-registers, if a foreign function holds the name) every graft
    * function; later calls are no-ops, so per-query invocation doesn't
    * spam `SimpleFunctionRegistry` "replaced a previously registered
    * function" warnings.
    */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    // Mark the registry AFTER all functions land, under the map's
    // lock: a concurrent caller must not proceed while registration is
    // in flight (it would analyze against missing functions), and a
    // builder failure must leave the session unmarked so the next call
    // retries the full set.
    registered.synchronized {
      if (!registered.containsKey(reg)) {
        builders.foreach { case (name, _, builder) =>
          reg.createOrReplaceTempFunction(name, builder, "built-in")
        }
        registered.put(reg, java.lang.Boolean.TRUE)
      }
    }
  }
}
