package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.MinHashDedup

/** The reusable MinHash dedup API: staged candidates/verification
  * against the exact pair ground truth, the greedy survivor rule, and
  * signature persistence.
  */
class MinHashDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private def docs = Tables(spark, dir, "documents")

  /** Exact pair ground truth from the oracle-checked query. */
  private def truePairs: Set[(Long, Long)] =
    SparkEntry.queries("dd_ngram_jaccard")(spark, dir)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("verified pairs equal the exact all-pairs ground truth") {
    val sigs = MinHashDedup.signatures(docs, "doc_id", "text")
    val cands = MinHashDedup.candidatePairs(sigs)
    val got = MinHashDedup.verifiedPairs(docs, cands, "doc_id", "text", 0.5)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == truePairs && got.nonEmpty)
  }

  test("dedup keeps exactly the documents with no smaller-id near-dup") {
    val kept = MinHashDedup.dedup(docs, "doc_id", "text", 0.5)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val losers = truePairs.map(_._2)
    val all = docs.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(kept == all -- losers)
    assert(kept.size < all.size) // the fixture does contain near-dups
  }

  test("signature persistence round-trips through parquet") {
    val tmp = Files.createTempDirectory("graft_minhash").toString
    val sigs = MinHashDedup.signatures(docs, "doc_id", "text")
    MinHashDedup.save(sigs, s"$tmp/sigs")
    val loaded = MinHashDedup.load(spark, s"$tmp/sigs")
    val a = MinHashDedup.candidatePairs(loaded).collect().map(_.toString).sorted
    val b = MinHashDedup.candidatePairs(sigs).collect().map(_.toString).sorted
    assert(a.sameElements(b) && a.nonEmpty)
  }
}
