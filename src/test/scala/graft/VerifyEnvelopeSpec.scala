package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The Verify output-envelope guard: the driver's oracle harness
  * provably cannot verify BINARY (its pandas row sort crashes on
  * bytearray — r13), DECIMAL outputs (value-identical results
  * hash-red — r12/r13), or ANY container-typed column (r18
  * `ta_bpe_token_ids`: array<int> crashed the pandas sort with
  * `unhashable type: 'numpy.ndarray'`, shipping the query
  * unverified while the builder gate said green). The guard turns
  * that mirror-green/driver-red class into a local failure BEFORE a
  * query ships.
  */
class VerifyEnvelopeSpec extends AnyFunSuite {

  private val ok = StructType(Seq(
    StructField("i", IntegerType),
    StructField("l", LongType),
    StructField("s", ShortType),
    StructField("d", DoubleType),
    StructField("f", FloatType),
    StructField("str", StringType),
    StructField("b", BooleanType),
    StructField("dt", DateType),
    StructField("ts", TimestampType)))

  test("the proven-verifiable types all pass") {
    assert(Verify.envelopeViolations(ok).isEmpty)
  }

  test("container columns are refused outright (r18 ndarray crash)") {
    val bad = StructType(Seq(
      StructField("ok", LongType),
      StructField("ids", ArrayType(IntegerType)),
      StructField("kv", MapType(StringType, LongType)),
      StructField("pair", StructType(Seq(StructField("x", IntegerType))))))
    val v = Verify.envelopeViolations(bad)
    assert(v.exists(m => m.startsWith("ids") && m.contains("array")))
    assert(v.exists(m => m.startsWith("kv") && m.contains("map")))
    assert(v.exists(m => m.startsWith("pair") && m.contains("struct")))
    assert(!v.exists(_.startsWith("ok")))
  }

  test("top-level BINARY and DECIMAL are refused with the column name") {
    val bad = StructType(Seq(
      StructField("ok", LongType),
      StructField("blob", BinaryType),
      StructField("money", DecimalType(19, 4))))
    val v = Verify.envelopeViolations(bad)
    assert(v.size == 2)
    assert(v.exists(m => m.startsWith("blob") && m.contains("BINARY")))
    assert(v.exists(m => m.startsWith("money") && m.contains("19,4")))
  }

  test("poison types are found inside arrays, maps, and structs") {
    val nested = StructType(Seq(
      StructField("a", ArrayType(DecimalType(12, 2))),
      StructField("m", MapType(StringType, BinaryType)),
      StructField("s", StructType(Seq(
        StructField("deep", ArrayType(StructType(Seq(
          StructField("x", BinaryType))))))))))
    val v = Verify.envelopeViolations(nested)
    assert(v.exists(_.startsWith("a[]")))
    assert(v.exists(_.startsWith("m[val]")))
    assert(v.exists(_.contains("s.deep[].x")))
  }

  test("every registered driver query's declared oracle stays aligned") {
    // cheap structural invariant: each queries entry has an oracle or
    // is a deliberate rows-only check; no oracle names a query that
    // does not exist (a typo would silently drop the stronger check)
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracleSql entries without a query: $orphans")
  }
}
