package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark

/** The incremental-ingest dedup's corpus band index is a persisted,
  * shared artifact: repeated invocations (a daily pipeline probing the
  * same corpus) must reuse ONE cached index, not accumulate a new
  * persisted copy per run. */
class DedupIncrementalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("corpus band index is memoized across invocations") {
    val key =
      (System.identityHashCode(spark), sf, 2, DedupOps.K, DedupOps.BANDS)
    DedupOps.corpusIdxCache.remove(key)
    val n1 = DedupOps.incrementalDups(spark, sf).count()
    assert(DedupOps.corpusIdxCache.contains(key))
    val sizeAfterFirst = DedupOps.corpusIdxCache.size
    val cached = DedupOps.corpusIdxCache(key)
    val n2 = DedupOps.incrementalDups(spark, sf).count()
    assert(n1 == n2)
    // same entry count AND the same DataFrame instance — no fresh
    // persist per run
    assert(DedupOps.corpusIdxCache.size == sizeAfterFirst)
    assert(DedupOps.corpusIdxCache(key) eq cached)
    assert(cached.storageLevel.useMemory || cached.storageLevel.useDisk)
  }
}
