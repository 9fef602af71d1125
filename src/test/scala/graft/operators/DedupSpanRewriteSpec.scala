package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark

/** Invariants of the span-dedup corpus rewrite. */
class DedupSpanRewriteSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("one audit row per doc; drops bounded; corpus has duplicates") {
    val rows = DedupOps.spanRewrite(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.length == nDocs)
    rows.foreach { r =>
      val (ns, nd) = (r.getLong(1), r.getLong(2))
      assert(ns >= 1 && nd >= 0 && nd <= ns, s"bad counts ($ns, $nd)")
    }
    assert(rows.exists(_.getLong(2) > 0), "no spans dropped on this corpus")
  }

  test("untouched docs reassemble to exactly the normalized original") {
    // disjoint blocks joined with ' ' must reproduce the token stream,
    // so a doc with zero drops is the identity rewrite
    val audit = DedupOps.spanRewrite(spark, sf)
    val orig = Tables.documents(spark, sf)
      .select(col("doc_id"),
        md5(lower(trim(col("text")))).as("orig_digest"),
        length(lower(trim(col("text")))).cast("long").as("orig_nchars"))
    val mismatches = audit.filter(col("n_dropped") === 0)
      .join(orig, Seq("doc_id"))
      .filter(col("new_digest") =!= col("orig_digest") ||
        col("new_nchars") =!= col("orig_nchars"))
      .count()
    assert(mismatches == 0, s"$mismatches untouched docs changed by rewrite")
  }

  test("rewrite is idempotent on the deduped digests") {
    // after a rewrite, every surviving span occurrence is the keep-first
    // occurrence, so total kept spans == distinct span texts in corpus
    val audit = DedupOps.spanRewrite(spark, sf)
      .agg(sum(col("n_spans") - col("n_dropped"))).head.getLong(0)
    val docs = Tables.documents(spark, sf)
      .withColumn("toks", split(lower(trim(col("text"))), " "))
      .withColumn("spans", expr(
        """transform(sequence(0, cast(ceil(size(toks) / 8.0) as int) - 1),
             i -> concat_ws(' ', slice(toks, i * 8 + 1, 8)))"""))
      .select(explode(col("spans")).as("span"))
      .select(countDistinct("span")).head.getLong(0)
    assert(audit == docs,
      s"kept spans ($audit) != distinct spans in corpus ($docs)")
  }
}
