package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the incremental substring probe the hash oracle can't
  * state: the corpus window index is built ONCE and reused across
  * ingests (the persisted-artifact promise in substringReport's
  * scaladoc), the probe report covers every batch doc and only batch
  * docs, and n_shared agrees with an independent recomputation. */
class SubstringIncrementalSpec extends AnyFunSuite {

  private lazy val spark = graft.etl.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("the corpus window index is memoized: a second ingest probes the " +
      "same persisted artifact") {
    graft.core.SessionMemo.remove(spark, DedupOps.windexKey(sf, 30))
    DedupOps.substringIncremental(spark, sf).collect()
    val first = graft.core.SessionMemo.get(spark, DedupOps.windexKey(sf, 30))
    assert(first.isDefined, "probe did not persist the window index")
    DedupOps.substringIncremental(spark, sf).collect()
    val second = graft.core.SessionMemo.get(spark, DedupOps.windexKey(sf, 30))
    assert(second.get eq first.get,
      "second ingest rebuilt the window index instead of reusing it")
  }

  test("the report covers every arriving doc, only arriving docs, and " +
      "n_shared matches an independent recomputation") {
    val out = DedupOps.substringIncremental(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_windows"), r.getAs[Long]("n_shared"))).toMap
    val batchIds = Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out.keySet === batchIds,
      "report rows must be exactly the arriving batch")
    assert(out.values.forall { case (nw, ns) => ns >= 0 && ns <= nw })

    // independent recomputation straight from text, no CharNgramHashes:
    // distinct 30-char windows via substring, corpus membership via a
    // plain string join
    import spark.implicits._
    val norm = Tables.documents(spark, sf)
      .select(col("doc_id"), lower(trim(col("text"))).as("t"))
      .as[(Long, String)].collect()
    val windowsOf: String => Set[String] = t =>
      (0 to math.max(t.length - 30, 0)).map(i =>
        t.substring(i, math.min(i + 30, t.length))).toSet
    val corpusWins = norm.filter(_._1 % 10 != 0)
      .flatMap(x => windowsOf(x._2)).toSet
    norm.filter(_._1 % 10 == 0).foreach { case (id, t) =>
      val wins = windowsOf(t)
      val expectShared = wins.count(corpusWins.contains)
      assert(out(id) === ((wins.size.toLong, expectShared.toLong)),
        s"doc $id disagrees with the direct recomputation")
    }
  }
}
