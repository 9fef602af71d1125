package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark

/** The document-ingest streaming twins' load-bearing claims, proven on
  * the driver fixture:
  *  (1) batch-invariance in fact, not just by argument — the drained
  *      streaming sink must equal the batch gate row-for-row;
  *  (2) the drain really is micro-batched — a gate that only worked
  *      because everything arrived in one batch would prove nothing;
  *  (3) the restart path — a second invocation starts a fresh
  *      StreamingQuery over the same durable checkpoint (offset-log
  *      recovery + a no-new-data pass) and must return the same frame.
  */
class DocIngestSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("streaming near-dup ingest equals the batch probe") {
    val streamed = rows(DedupOps.streamingIngestDups(spark, sf))
    val batch = rows(DedupOps.incrementalDups(spark, sf))
    assert(batch.nonEmpty, "fixture must produce near-dup matches")
    assert(streamed == batch)
  }

  test("streaming score equals the batch classifier") {
    val streamed = rows(TextOps.queries("streaming_ingest_score")(spark, sf))
    val batch = rows(TextOps.queries("text_quality_classifier")(spark, sf))
    assert(streamed == batch)
  }

  test("the drain is genuinely micro-batched") {
    DedupOps.streamingIngestDups(spark, sf) // ensure drained
    val (sink, _) = graft.streaming.DocIngest.sinkCkpt(sf, "ingest_neardup")
    import scala.jdk.CollectionConverters._
    val batchDirs = java.nio.file.Files.list(sink).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("b")).toSeq
    assert(batchDirs.size >= 2,
      s"expected >=2 per-batch sink dirs, saw ${batchDirs.map(_.getFileName)}")
  }

  test("restart over the durable checkpoint returns the same frame") {
    val first = rows(DedupOps.streamingIngestDups(spark, sf))
    val second = rows(DedupOps.streamingIngestDups(spark, sf))
    assert(first == second)
  }
}
