package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the deterministic per-group reservoir sample the
  * sample_reservoir_topk hash oracle can't state: the k-cap holds per
  * group, the sample is invariant to physical partitioning, and
  * admission follows the reservoir displacement rule (a new doc enters
  * iff its digest beats the current per-group max, displacing it). */
class ReservoirSpec extends AnyFunSuite {

  private lazy val spark = graft.etl.TestSpark.spark

  private def docs(ids: Seq[Long]) = {
    import spark.implicits._
    ids.map(i => (i, if (i % 3 == 0) "en" else "de")).toDF("doc_id", "lang")
  }

  // permille = 1000 disables the pre-filter so the admission-rule
  // algebra is exact over the whole fixture
  private def sample(ids: Seq[Long], k: Int) =
    AdvancedOps.reservoirTopK(docs(ids), "lang", k, permille = 1000)
      .collect().map(r => (r.getAs[String]("lang"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("rk")))

  test("k-cap holds per group and ranks are dense from 1") {
    val s = sample(1L to 200L, 10)
    val byLang = s.groupBy(_._1)
    byLang.foreach { case (lang, rows) =>
      assert(rows.length === 10, s"group $lang overflowed the reservoir")
      assert(rows.map(_._3).sorted === (1L to 10L), s"ranks not dense in $lang")
    }
  }

  test("sample is invariant to physical partitioning") {
    val base = docs(1L to 200L)
    def run(df: org.apache.spark.sql.DataFrame) =
      AdvancedOps.reservoirTopK(df, "lang", 10, 1000)
        .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2))).toSet
    assert(run(base) === run(base.repartition(17)))
    assert(run(base) === run(base.coalesce(1)))
  }

  test("admission follows the displacement rule") {
    val k = 10
    val before = sample(1L to 200L, k).filter(_._1 == "en")
    val maxDg = before.map { case (_, id, _) =>
      org.apache.commons.codec.digest.DigestUtils.md5Hex(id.toString)
    }.max

    // find an unsampled en doc whose digest beats the current max, and
    // one that doesn't (scan outside the fixture id range)
    val candidates = (201L to 2000L).filter(_ % 3 == 0)
    def dg(id: Long) =
      org.apache.commons.codec.digest.DigestUtils.md5Hex(id.toString)
    val winner = candidates.find(dg(_) < maxDg).get
    val loser = candidates.find(dg(_) > maxDg).get

    val withWinner = sample((1L to 200L) :+ winner, k).filter(_._1 == "en")
    assert(withWinner.exists(_._2 == winner), "smaller digest must enter")
    assert(withWinner.length === k, "reservoir must stay at k")
    // exactly the old max was displaced
    val displaced = before.map(_._2).toSet diff withWinner.map(_._2).toSet
    assert(displaced.map(id => dg(id)) === Set(maxDg))

    val withLoser = sample((1L to 200L) :+ loser, k).filter(_._1 == "en")
    assert(withLoser.map(_._2).toSet === before.map(_._2).toSet,
      "larger digest must not perturb the sample")
  }
}
