package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.core.SessionMemo
import graft.etl.TestSpark

/** Incremental ANN ingest (`ann_incremental_topk`): the corpus IVF-PQ
  * index is a persisted, memoized artifact — a new batch PROBES it;
  * re-invocations (a daily ingest pipeline) must not rebuild cells or
  * codebook, mirroring DedupIncrementalSpec's contract for the band
  * index. */
class AnnIncrementalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("batch probes established corpus only, k per query, no self") {
    val rows = VectorOps.incrementalTopK(spark, sf)
      .select("qid", "vec_id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.nonEmpty)
    // qids are exactly batch vectors; neighbours never are
    assert(rows.forall { case (q, _, _) => q % 10 == 7 && q >= VectorOps.KPQ })
    assert(rows.forall { case (_, v, _) => !(v % 10 == 7 && v >= VectorOps.KPQ) })
    // dense ranks 1..n(q) with n(q) <= k
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val ranks = rs.map(_._3).sorted.toSeq
      assert(ranks == (1 to ranks.size), s"ranks not dense for qid $q")
      assert(ranks.size <= 5)
    }
  }

  test("corpus index is memoized: probe path runs zero rebuilds") {
    val key = VectorOps.annIncIdxKey(sf)
    SessionMemo.remove(spark, key)
    val before = SessionMemo.entryCount(spark)
    val n1 = VectorOps.incrementalTopK(spark, sf).count()
    assert(SessionMemo.get(spark, key).isDefined)
    assert(SessionMemo.entryCount(spark) == before + 1)
    val cached = SessionMemo.get(spark, key).get
    val n2 = VectorOps.incrementalTopK(spark, sf).count()
    assert(n1 == n2)
    // same entry count AND the same DataFrame instance — the second
    // invocation probed, it did not re-encode the corpus
    assert(SessionMemo.entryCount(spark) == before + 1)
    assert(SessionMemo.get(spark, key).get eq cached)
    assert(cached.storageLevel.useMemory || cached.storageLevel.useDisk)
  }

  test("incremental probe agrees with a full-corpus exact scan on its " +
      "re-ranked candidates") {
    // every returned (qid, vec_id, dist) must carry the TRUE exact
    // integer L2 distance (the re-rank guarantees it): recompute
    // brute-force distances for returned pairs and compare
    import org.apache.spark.sql.functions._
    import graft.functions.ArrayDotLong.array_dot_long
    val got = VectorOps.incrementalTopK(spark, sf)
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .withColumn("qv", graft.functions.QuantizeLong
        .quantize_long(col("embedding"), 1000L))
      .withColumn("nrm", array_dot_long(col("qv"), col("qv")))
      .filter(col("nrm") > 0).select("vec_id", "qv", "nrm")
    val check = got
      .join(e.select(col("vec_id").as("qid"), col("qv").as("qqv"),
        col("nrm").as("qnrm")), Seq("qid"))
      .join(e, Seq("vec_id"))
      .withColumn("true_dist",
        col("nrm") - lit(2L) * array_dot_long(col("qqv"), col("qv")) +
          col("qnrm"))
      .filter(col("dist") =!= col("true_dist"))
    assert(check.count() == 0,
      "re-ranked distances must be exact integer L2")
  }
}
