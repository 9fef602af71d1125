package graft.operators

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark

/** Rule-by-rule behavior of the Gopher-style quality filter on crafted
  * documents, one per failure mode — the oracle proves cross-engine
  * equality on the synthetic corpus, this proves each rule actually
  * fires on the input shape it was written for.
  */
class GopherFilterSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // a 30-word body that passes every rule: alphabetic words, two distinct
  // stopwords, mean word length inside [3, 10]
  private val goodBody =
    (Seq("the", "table") ++ Seq.fill(28)("scan")).mkString(" ")

  private def run(rows: Seq[(Long, String)]) = {
    val dir = java.nio.file.Files
      .createTempDirectory("g_gopher").toString
    val df = spark.createDataFrame(rows.map { case (id, tx) =>
      (id, tx, "en", "src0", tx.length.toLong)
    }).toDF("doc_id", "text", "lang", "source", "n_chars")
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextOps.queries("text_gopher_filter")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    (out, dir)
  }

  test("each rule fires on its crafted failure case and only there") {
    val (out, _) = run(Seq(
      1L -> goodBody,
      2L -> "the table scan",                       // 3 words: words_ok fails
      3L -> (Seq("the", "table") ++                 // mean word len > 10
        Seq.fill(28)("aaaaaaaaaaaaaaaaaaaa")).mkString(" "),
      4L -> (Seq("the", "table") ++                 // digit words dominate
        Seq.fill(28)("12345")).mkString(" "),
      5L -> (Seq("the", "table") ++                 // symbol-heavy
        Seq.fill(14)("scan") ++ Seq.fill(14)("##scan##")).mkString(" "),
      6L -> Seq.fill(30)("scan").mkString(" ")))    // zero stopwords

    def flags(id: Long): Map[String, Boolean] = {
      val r = out(id)
      Seq("words_ok", "wlen_ok", "alpha_ok", "digit_ok", "sym_ok",
        "stop_ok", "keep").map(f => f -> r.getAs[Boolean](f)).toMap
    }

    assert(flags(1L).values.forall(identity), s"good doc dropped: ${flags(1L)}")
    assert(!flags(2L)("words_ok") && !flags(2L)("keep"))
    assert(flags(2L)("alpha_ok") && flags(2L)("sym_ok"))
    assert(!flags(3L)("wlen_ok") && !flags(3L)("keep"))
    assert(!flags(4L)("alpha_ok") && !flags(4L)("digit_ok") &&
      !flags(4L)("keep"))
    assert(flags(4L)("words_ok") && flags(4L)("stop_ok"))
    assert(!flags(5L)("sym_ok") && !flags(5L)("keep"))
    assert(flags(5L)("alpha_ok"), "…# words still contain letters")
    assert(!flags(6L)("stop_ok") && !flags(6L)("keep"))
    assert(flags(6L)("words_ok") && flags(6L)("wlen_ok"))
  }

  test("symbol count sums '#' chars and '...' runs") {
    val (out, _) = run(Seq(
      7L -> (Seq("a#b", "c...d") ++ Seq.fill(28)("scan")).mkString(" ")))
    assert(out(7L).getAs[Int]("sym_cnt") == 2)
  }
}
