package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The stateful streaming tier under the RocksDB state store — the
  * provider a production cluster runs, since the default heap-backed
  * store keeps every partition's whole keyed state (and per-batch
  * snapshot copies) on the executor heap. Each representative stateful
  * shape (keyed dedup with watermark eviction, session windows with
  * sentinel flush, stream-stream join buffers, watermark late-drop
  * across real micro-batches, flatMapGroupsWithState) must produce the
  * IDENTICAL result it produces on the heap store, which the oracle
  * gate already pins — so state-store choice is proven to be purely a
  * physical concern. Fixture-scale timings for both providers are
  * recorded in SCALING.md.
  */
class EventStreamRocksSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def withRocksDb[A](body: => A): A = {
    sys.props("graft.stateStore") = "rocksdb"
    try body finally sys.props.remove("graft.stateStore")
  }

  private def sortedRows(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, dir).collect()
      .map(_.toString).sorted.toSeq

  test("stateful evs queries return identical results on RocksDB") {
    for (name <- Seq("evs_dedup_within_watermark", "evs_session_windows",
        "evs_stream_stream_join", "evs_user_running_counts",
        "evs_sliding_counts", "evs_session_custom_state",
        "evs_stream_semi_join", "evs_windowed_topk", "evs_ewma_state")) {
      val heap = sortedRows(name)
      val rocks = withRocksDb { sortedRows(name) }
      assert(heap.nonEmpty, s"$name: empty fixture result")
      assert(rocks == heap, s"$name: RocksDB result diverges from heap store")
    }
  }

  test("watermark late-data drop still drops under RocksDB") {
    val rows = withRocksDb {
      SparkEntry.queries("evs_late_data_drop")(spark, dir).collect()
    }
    // exactly the surviving on-time probe window — the late row was
    // dropped by the RocksDB-backed stateful aggregation
    assert(rows.length == 1 && rows(0).getLong(1) == 1L)
  }
}
