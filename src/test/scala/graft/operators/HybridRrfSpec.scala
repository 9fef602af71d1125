package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Properties of search_hybrid_rrf the row-level oracle doesn't state:
  * the fused score is exactly reconstructible from the arm ranks, the
  * output respects the rank bounds and the score ordering, and both
  * retrieval arms actually reach the fused top-10. */
class HybridRrfSpec extends AnyFunSuite {

  private lazy val spark = graft.etl.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val rows = VectorOps.hybridRrf(spark, sf).collect()

  test("every fused row carries >= 1 arm rank and its exact RRF score") {
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rv = if (r.isNullAt(2)) None else Some(r.getInt(2))
      val rl = if (r.isNullAt(3)) None else Some(r.getInt(3))
      assert(rv.isDefined || rl.isDefined,
        s"row with no contributing arm: $r")
      assert(rv.forall(v => v >= 1 && v <= 50))
      assert(rl.forall(v => v >= 1 && v <= 50))
      // bit-exact recomputation: two IEEE divisions + one addition in
      // the same order as the gate expression
      val expect = rv.map(v => 1.0 / (60 + v)).getOrElse(0.0) +
        rl.map(v => 1.0 / (60 + v)).getOrElse(0.0)
      assert(r.getDouble(4) == expect,
        s"rrf ${r.getDouble(4)} != recomputed $expect for $r")
    }
  }

  test("per-query output is top-10 ordered by (rrf desc, doc_id)") {
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQ.foreach { case (_, qr) =>
      assert(qr.length <= 10)
      val sorted = qr.sortBy(_.getInt(5))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val better = a.getDouble(4) > b.getDouble(4) ||
            (a.getDouble(4) == b.getDouble(4) &&
             a.getLong(1) < b.getLong(1))
          assert(better, s"fusion order violated: $a before $b")
        case _ => ()
      }
    }
  }

  test("both arms surface in the fused top-10") {
    // a single-arm rank of 1 scores 1/61 ≈ 0.0164 while rank 50 scores
    // 1/110 ≈ 0.0091 — each arm's leaders beat the other arm's tail, so
    // a fusion that lost an arm entirely is a wiring bug, not data luck
    assert(rows.exists(r => !r.isNullAt(2)), "vector arm never surfaced")
    assert(rows.exists(r => !r.isNullAt(3)), "lexical arm never surfaced")
  }
}
