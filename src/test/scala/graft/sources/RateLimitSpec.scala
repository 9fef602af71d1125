package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark
import graft.operators.WriteOps.SnapshotTable

/** Admission control on the graft-snapshot source
  * (`maxVersionsPerTrigger`, Delta's maxFilesPerTrigger analog): a
  * backfill paces into bounded micro-batches — the batch COUNT splits,
  * the landed CONTENT doesn't change, and a restart resumes from the
  * checkpointed version offset without re-serving. */
class RateLimitSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val T = SnapshotTable

  private def buildTable(nVersions: Int): String = {
    import spark.implicits._
    val root = Files.createTempDirectory("g_ratelimit_tbl").toString
    (0 until nVersions).foreach { v =>
      T.commit(spark, root, v,
        Seq((v.toLong, 2000 + v, v * 1.0))
          .toDF("o_orderkey", "pt_year", "o_totalprice"), Seq(2000 + v))
    }
    root
  }

  private def drain(root: String, ckpt: String,
      maxPerTrigger: Option[Int]): (Seq[Long], Long) = {
    val reader = spark.readStream.format("graft-snapshot")
      .option("root", root)
    val src = maxPerTrigger
      .fold(reader)(m => reader.option("maxVersionsPerTrigger", m)).load()
    val batches = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val q = src.writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, id: Long) =>
        val n = b.count()
        batches.synchronized { batches += ((id, n)) }
        ()
      }
      .start()
    q.awaitTermination(300000)
    q.stop()
    val done = batches.synchronized(batches.toSeq)
    (done.map(_._1), done.map(_._2).sum)
  }

  test("maxVersionsPerTrigger=1 paces a 4-version backfill into 4 batches") {
    val root = buildTable(4)
    val ckpt = Files.createTempDirectory("g_ratelimit_ckpt").toString
    val (ids, rows) = drain(root, ckpt, Some(1))
    assert(rows === 4, "pacing changed the landed content")
    assert(ids.distinct.size >= 4,
      s"expected one version per trigger, got batches $ids")
    // restart on the same checkpoint: nothing re-serves
    val (ids2, rows2) = drain(root, ckpt, Some(1))
    assert(rows2 === 0, s"restart re-served rows (batches $ids2)")
  }

  test("without the option the whole backfill is one batch") {
    val root = buildTable(4)
    val ckpt = Files.createTempDirectory("g_ratelimit_ckpt1").toString
    val (ids, rows) = drain(root, ckpt, None)
    assert(rows === 4)
    assert(ids.size === 1, s"unlimited drain split into $ids")
  }

  private def drainBytes(root: String, ckpt: String,
      maxBytes: Long): (Seq[Long], Long) = {
    val src = spark.readStream.format("graft-snapshot")
      .option("root", root)
      .option("maxBytesPerTrigger", maxBytes).load()
    val batches = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val q = src.writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, id: Long) =>
        val n = b.count()
        batches.synchronized { batches += ((id, n)) }
        ()
      }
      .start()
    q.awaitTermination(300000)
    q.stop()
    val done = batches.synchronized(batches.toSeq)
    (done.map(_._1), done.map(_._2).sum)
  }

  test("maxBytesPerTrigger splits ONE fat version across triggers, " +
      "exactly-once intact") {
    import spark.implicits._
    // one version, many files: each partition stages its own file, so
    // v0 carries 4 data files — the version-granular knob can't split
    // it, the byte-granular one must
    val root = Files.createTempDirectory("g_ratelimit_fat").toString
    T.commit(spark, root, 0,
      (0 until 4).map(i => (i.toLong, 2000 + i, i * 1.0))
        .toDF("o_orderkey", "pt_year", "o_totalprice"),
      (0 until 4).map(2000 + _))
    assert(T.files(root, 0).size === 4)
    val ckpt = Files.createTempDirectory("g_ratelimit_ckptb").toString
    // budget = 1 byte → one file per trigger (the ≥1-file progress
    // guarantee binds), so the single fat version drains in 4 batches
    val (ids, rows) = drainBytes(root, ckpt, 1L)
    assert(rows === 4, "byte pacing changed the landed content")
    assert(ids.distinct.size >= 4,
      s"one fat version should split file-per-trigger, got $ids")
    // restart: the mid-version file offset is checkpointed — nothing
    // re-serves, nothing is lost
    val (ids2, rows2) = drainBytes(root, ckpt, 1L)
    assert(rows2 === 0, s"restart re-served rows (batches $ids2)")
    // and a realistic budget (covers ~2 of the 4 files per trigger)
    // drains the same content in fewer, bounded batches
    val bytes = T.entries(root, 0).map(_._2)
    val ckpt2 = Files.createTempDirectory("g_ratelimit_ckptb2").toString
    val (ids3, rows3) = drainBytes(root, ckpt2, bytes.take(2).sum)
    assert(rows3 === 4)
    assert(ids3.distinct.size >= 2 && ids3.distinct.size < 4,
      s"expected ~2-file triggers, got $ids3")
  }

  test("pacing resumes mid-backfill from the checkpointed offset") {
    val root = buildTable(2)
    val ckpt = Files.createTempDirectory("g_ratelimit_ckpt2").toString
    val (_, rows1) = drain(root, ckpt, Some(1))
    assert(rows1 === 2)
    // two more commits after the first drain: only the NEW versions
    // serve, still paced
    import spark.implicits._
    (2 until 4).foreach { v =>
      T.commit(spark, root, v,
        Seq((v.toLong, 2000 + v, v * 1.0))
          .toDF("o_orderkey", "pt_year", "o_totalprice"), Seq(2000 + v))
    }
    val (ids2, rows2) = drain(root, ckpt, Some(1))
    assert(rows2 === 2, "tail drain re-served or lost versions")
    assert(ids2.distinct.size >= 2)
  }
}
