package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark
import graft.operators.WriteOps.{SnapshotTable => T}

/** Byte-range scan splitting (SnapshotSplits): a partition compacted
  * to ONE large file must plan MORE THAN ONE input split — read
  * parallelism follows bytes, not file count — while the union of the
  * splits serves every row exactly once (parquet's row-group-midpoint
  * rule partitions the groups across disjoint ranges). Small files
  * stay whole under the default policy, and the split threshold
  * follows Spark's own maxPartitionBytes/openCost formula. */
class SnapshotSplitSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Run `body` with small row groups at write and a small split
    * target at plan, restoring session state after. */
  private def withSmallGeometry[A](body: => A): A = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val prevRg = hconf.get("graft.snapshot.rowGroupBytes")
    hconf.setLong("graft.snapshot.rowGroupBytes", 32L * 1024)
    spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
    spark.conf.set("spark.sql.files.openCostInBytes", "1024")
    try body
    finally {
      if (prevRg == null) hconf.unset("graft.snapshot.rowGroupBytes")
      else hconf.set("graft.snapshot.rowGroupBytes", prevRg)
      spark.conf.unset("spark.sql.files.maxPartitionBytes")
      spark.conf.unset("spark.sql.files.openCostInBytes")
    }
  }

  private def planFor(root: String) = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.connector.catalog.SupportsRead
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val provider = new SnapshotSourceProvider
    val opts = new CaseInsensitiveStringMap(Map("root" -> root).asJava)
    provider.getTable(provider.inferSchema(opts), Array.empty,
        opts.asCaseSensitiveMap())
      .asInstanceOf[SupportsRead].newScanBuilder(opts)
      .build().toBatch.planInputPartitions()
  }

  test("a single-file partition plans >1 split and reads exactly once") {
    withSmallGeometry {
      import spark.implicits._
      val root = Files.createTempDirectory("g_split_one").toString
      // ONE file holding ~300 KB: coalesce(1) forces the compacted
      // single-file shape the r14 probe convicted
      val df = (0L until 20000L).map(k => (k, 1, s"payload_$k"))
        .toDF("k", "pt_year", "s").coalesce(1)
      T.commit(spark, root, 0, df, Seq(1))
      val entries = T.files(root, 0)
      assert(entries.size === 1, "fixture must be a one-file partition")

      val parts = planFor(root)
      assert(parts.length > 1,
        s"one large file must split (got ${parts.length} partition)")
      // disjoint coverage: the ranges tile [0, MaxValue)
      val fps = parts.map(_.asInstanceOf[SnapshotFilePartition])
        .sortBy(_.start)
      assert(fps.head.start === 0L)
      assert(fps.last.end === Long.MaxValue)
      fps.sliding(2).foreach {
        case Array(a, b) => assert(a.end === b.start, "ranges must tile")
        case _ => ()
      }

      // exactly-once end to end: every key served, none twice
      val got = spark.read.format("graft-snapshot").option("root", root)
        .load().select("k").collect().map(_.getLong(0))
      assert(got.length === 20000, s"row count ${got.length}")
      assert(got.toSet === (0L until 20000L).toSet)
    }
  }

  test("small files stay whole under the default split policy") {
    import spark.implicits._
    val root = Files.createTempDirectory("g_split_small").toString
    val df = (0L until 100L).map(k => (k, 1, k.toDouble))
      .toDF("k", "pt_year", "v").coalesce(1)
    T.commit(spark, root, 0, df, Seq(1))
    val parts = planFor(root)
    assert(parts.length === T.files(root, 0).size)
    parts.map(_.asInstanceOf[SnapshotFilePartition]).foreach { p =>
      assert(p.start === 0L && p.end === Long.MaxValue)
    }
  }

  test("split target follows Spark's maxPartitionBytes/openCost formula") {
    import T.FileEntry
    val s = spark
    s.conf.set("spark.sql.files.maxPartitionBytes", "1048576")
    s.conf.set("spark.sql.files.openCostInBytes", "4096")
    try {
      // few huge files: per-core share exceeds the cap → cap binds
      val capped = SnapshotSplits.targetSplitBytes(s,
        Seq.fill(4)(FileEntry("f", 10L << 30)))
      assert(capped === 1048576L)
      // tiny workload: openCost floors the target (no confetti splits)
      val floored = SnapshotSplits.targetSplitBytes(s,
        Seq(FileEntry("f", 10L)))
      assert(floored === 4096L)
    } finally {
      s.conf.unset("spark.sql.files.maxPartitionBytes")
      s.conf.unset("spark.sql.files.openCostInBytes")
    }
  }

  test("streaming batches split large fresh files too") {
    withSmallGeometry {
      import spark.implicits._
      val root = Files.createTempDirectory("g_split_stream").toString
      val ckpt = Files.createTempDirectory("g_split_ckpt").toString
      val out = Files.createTempDirectory("g_split_out").toString
      val df = (0L until 20000L).map(k => (k, 1, s"payload_$k"))
        .toDF("k", "pt_year", "s").coalesce(1)
      T.commit(spark, root, 0, df, Seq(1))
      val src = spark.readStream.format("graft-snapshot")
        .option("root", root).load()
      val q = src.writeStream
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          // >1 task proves the batch plan split the one fresh file
          assert(b.rdd.getNumPartitions > 1,
            s"stream batch $id planned ${b.rdd.getNumPartitions} task")
          b.write.mode("overwrite").parquet(s"$out/b$id")
        }
        .start()
      try { if (!q.awaitTermination(300000)) q.processAllAvailable() }
      finally q.stop()
      val got = spark.read
        .option("recursiveFileLookup", "true").schema(src.schema)
        .parquet(out).select("k").collect().map(_.getLong(0))
      assert(got.length === 20000 && got.toSet === (0L until 20000L).toSet)
    }
  }
}
