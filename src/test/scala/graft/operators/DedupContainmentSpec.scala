package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark

/** Properties of the asymmetric containment dedup the DuckDB oracle
  * can't express: threshold monotonicity and the df-cap's candidate
  * bound.
  */
class DedupContainmentSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def pairs(tau: Double, maxDf: Long = 250L): Seq[(Long, Long)] =
    DedupOps.containmentPairs(spark, sf, tau = tau, maxDf = maxDf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("pairs are ordered, distinct, and ratio-consistent") {
    val rows = DedupOps.containmentPairs(spark, sf).collect()
    assert(rows.nonEmpty, "sf0.001 corpus has near-dups; expected pairs")
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val (inter, szA, szB) = (r.getLong(2), r.getLong(3), r.getLong(4))
      val (cAb, cBa) = (r.getDouble(5), r.getDouble(6))
      assert(a < b, s"unordered pair ($a, $b)")
      assert(inter >= 1 && inter <= math.min(szA, szB),
        s"inter $inter outside [1, min($szA, $szB)]")
      assert(cAb == inter.toDouble / szA && cBa == inter.toDouble / szB)
      assert(math.max(cAb, cBa) >= 0.6)
    }
    val keys = rows.map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.distinct.length == keys.length)
  }

  test("tighter tau is always a subset") {
    val loose = pairs(tau = 0.6).toSet
    val tight = pairs(tau = 0.8).toSet
    assert(tight.subsetOf(loose), s"tau 0.6 -> 0.8 gained: ${tight -- loose}")
  }

  test("df cap bounds candidates: capped pairs never exceed uncapped") {
    // at tau=0 every shingle-sharing pair is a candidate; dropping hot
    // shingles can only remove candidate pairs, never invent them
    val capped = pairs(tau = 0.0, maxDf = 20L).toSet
    val full = pairs(tau = 0.0, maxDf = 1000000L).toSet
    assert(capped.subsetOf(full), s"df cap invented: ${capped -- full}")
    assert(capped.size < full.size,
      "a 20-doc df cap on this corpus should actually drop candidates")
  }
}

/** Invariants of the windowed-substring duplication report. */
class DedupSubstringSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("one row per doc; shared windows bounded and ratio-consistent") {
    val rows = DedupOps.substringReport(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.length == nDocs)
    rows.foreach { r =>
      val (nw, ns, frac) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nw >= 1 && ns >= 0 && ns <= nw, s"bad counts ($nw, $ns)")
      assert(frac == ns.toDouble / nw)
    }
    // this corpus contains verbatim cross-doc text; the report must see it
    assert(rows.exists(_.getLong(2) > 0), "no shared windows found")
  }
}
