package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the bloom-prefiltered membership dedup the hash oracle
  * can't state: the bloom never drops a true duplicate (no false
  * negatives), it actually prunes the probe side, and the final answer
  * equals the plain exact semi-join with no bloom at all. */
class BloomPrefilterSpec extends AnyFunSuite {

  private lazy val spark = graft.etl.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def keyed = Tables.documents(spark, sf)
    .select(col("doc_id"), DedupOps.prefixKey.as("prefix_md5"))

  test("bloom answer equals the plain exact semi-join") {
    val viaBloom = DedupOps.bloomPrefilterDups(spark, sf)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("prefix_md5"))).toSet

    val corpus = keyed.filter(col("doc_id") % 10 =!= 7)
    val exact = keyed.filter(col("doc_id") % 10 === 7)
      .join(corpus.select("prefix_md5").distinct(),
        Seq("prefix_md5"), "left_semi")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("prefix_md5"))).toSet
    assert(viaBloom === exact)
    assert(exact.nonEmpty, "fixture has no cross-split dups — vacuous")
  }

  test("the bloom prunes the probe but never a true duplicate") {
    val corpus = keyed.filter(col("doc_id") % 10 =!= 7)
    val batch = keyed.filter(col("doc_id") % 10 === 7)
    val bloom = corpus.stat.bloomFilter("prefix_md5",
      expectedNumItems = 1000L, fpp = 0.03)

    val trueDups = batch
      .join(corpus.select("prefix_md5").distinct(),
        Seq("prefix_md5"), "left_semi")
      .select("prefix_md5").collect().map(_.getString(0))
    // no false negatives: every true dup key passes the filter
    trueDups.foreach(k => assert(bloom.mightContain(k),
      s"bloom dropped true duplicate $k"))

    // real pruning: survivors ≪ batch (fpp 3% + the tiny dup set)
    val batchKeys = batch.select("prefix_md5").collect().map(_.getString(0))
    val survivors = batchKeys.count(bloom.mightContain)
    assert(survivors < batchKeys.length / 2,
      s"bloom pruned nothing: $survivors of ${batchKeys.length} survive")
  }
}
