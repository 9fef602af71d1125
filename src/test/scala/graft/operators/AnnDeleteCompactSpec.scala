package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark

/** ANN index maintenance (`ann_delete_compact`): tombstoned vectors
  * must stop surfacing immediately, compaction must physically drop
  * them from the stored index, and the probe must return identical
  * results from the tombstoned and the compacted index. */
class AnnDeleteCompactSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("deleted ids never surface, from either index state") {
    val rows = VectorOps.deleteCompactTopK(spark, sf)
      .select("vec_id", "stage").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(0) % 17 != 3),
      "a tombstoned vector surfaced in probe results")
    assert(rows.map(_.getString(1)).toSet ==
      Set("tombstoned", "compacted"))
  }

  test("tombstoned and compacted probes are row-identical") {
    val df = VectorOps.deleteCompactTopK(spark, sf)
    val t = df.filter(df("stage") === "tombstoned")
      .select("qid", "vec_id", "rn", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .toSet
    val c = df.filter(df("stage") === "compacted")
      .select("qid", "vec_id", "rn", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .toSet
    assert(t == c, "compaction changed probe results")
    assert(t.nonEmpty)
  }

  test("compaction physically drops every tombstone from the index") {
    VectorOps.deleteCompactTopK(spark, sf).count() // materialize dirs
    val idxDir = WriteOps.scratch(s"ann_idx_${sf.hashCode.toHexString}")
    val compDir = WriteOps.scratch(
      s"ann_idx_compacted_${sf.hashCode.toHexString}")
    val idx = spark.read.parquet(idxDir)
    val comp = spark.read.parquet(compDir)
    val nTomb = idx.filter(idx("vec_id") % 17 === 3).count()
    assert(nTomb > 0, "fixture must tombstone at least one vector")
    assert(comp.filter(comp("vec_id") % 17 === 3).count() == 0,
      "a tombstone survived compaction")
    assert(comp.count() == idx.count() - nTomb,
      "compaction must drop exactly the tombstone set")
  }
}
