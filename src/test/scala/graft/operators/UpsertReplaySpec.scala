package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark

/** The streaming CDC-apply claims the oracle can't check: versioned
  * copy-on-write makes batch re-application idempotent (foreachBatch is
  * at-least-once; the version dir is the txn-id dedup), and batch
  * boundaries never change the merged state.
  */
class UpsertReplaySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def events = Tables.events(spark, sf) // ts already a timestamp

  private def state(root: String): Array[org.apache.spark.sql.Row] = {
    val latest = EventOps.latestVersion(root, Long.MaxValue).get
    spark.read.parquet(latest)
      .select(col("user_id"), col("n_events"),
        col("last.last_ts_sec"), col("last.last_event_id"))
      .collect().sortBy(_.getLong(0))
  }

  test("re-applying a batch is a no-op; batching never changes state") {
    val rootA = java.nio.file.Files
      .createTempDirectory("graft_cdc_a").toString
    val rootB = java.nio.file.Files
      .createTempDirectory("graft_cdc_b").toString
    // A: all events in one batch
    EventOps.cdcMergeBatch(spark, rootA, events, batchId = 0L)
    val oneShot = state(rootA)
    // B: three uneven batches split by event_id
    EventOps.cdcMergeBatch(spark, rootB,
      events.filter(col("event_id") % 5 === 0), batchId = 0L)
    EventOps.cdcMergeBatch(spark, rootB,
      events.filter(col("event_id") % 5 === 1), batchId = 1L)
    EventOps.cdcMergeBatch(spark, rootB,
      events.filter(col("event_id") % 5 >= 2), batchId = 2L)
    assert(state(rootB).toSeq == oneShot.toSeq,
      "batch boundaries changed the merged state")
    // crash-replay: re-apply batch 2 — the version dir is rebuilt from
    // v1, so the state is byte-identical, not double-counted
    EventOps.cdcMergeBatch(spark, rootB,
      events.filter(col("event_id") % 5 >= 2), batchId = 2L)
    assert(state(rootB).toSeq == oneShot.toSeq,
      "re-applied batch was double-counted")
  }
}
