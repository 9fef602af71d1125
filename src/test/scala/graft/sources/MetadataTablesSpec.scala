package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark
import graft.operators.WriteOps.SnapshotTable

/** Metadata tables (`<cat>.<t>.history` / `.files` / `.partitions`):
  * manifest-derived rows, version pinning, real-table precedence, and
  * the refusals. */
class MetadataTablesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val T = SnapshotTable

  private def freshCatalog(): (String, String) = {
    val base = Files.createTempDirectory("g_meta_cat").toString
    val name = "gmeta_" + java.util.UUID.randomUUID().toString.take(8)
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.base", base)
    (name, base)
  }

  /** Fragmented v0 (8-task exchange), optimized v1 (1 file/year). */
  private def lineage(base: String): String = {
    import spark.implicits._
    val root = s"$base/t"
    val df = (1L to 400L).map(k => (k, 2023 + (k % 2).toInt, k * 1.5))
      .toDF("k", "pt_year", "v").repartition(8)
    T.commit(spark, root, 0, df, Seq(2023, 2024), distribute = false)
    T.optimize(spark, root, 1)
    root
  }

  test("partitions/files/history read the head manifest") {
    val (cat, base) = freshCatalog()
    val root = lineage(base)
    val parts = spark.sql(
      s"SELECT pt_year, n_files, n_bytes FROM $cat.t.partitions " +
      "ORDER BY pt_year").collect()
    assert(parts.map(r => (r.getInt(0), r.getLong(1))).toSeq ===
      Seq((2023, 1L), (2024, 1L)))
    assert(parts.forall(_.getLong(2) > 0))

    val files = spark.sql(s"SELECT pt_year, path, bytes FROM $cat.t.files")
      .collect()
    assert(files.length === 2)
    assert(files.map(_.getString(1)).toSet ===
      T.files(root, 1).toSet) // exactly the head manifest's paths
    assert(files.forall(_.getLong(2) > 0))

    val hist = spark.sql(
      s"SELECT version, n_partitions, n_files FROM $cat.t.history " +
      "ORDER BY version").collect()
    assert(hist.map(_.getInt(0)).toSeq === Seq(0, 1))
    assert(hist.forall(_.getInt(1) === 2))
    assert(hist(0).getLong(2) > hist(1).getLong(2), // optimize compacted
      s"v0 files ${hist(0).getLong(2)} !> v1 files ${hist(1).getLong(2)}")
    // commit timestamps are recorded and monotonic
    val ts = spark.sql(
      s"SELECT commit_ts FROM $cat.t.history ORDER BY version")
      .collect().map(_.getTimestamp(0))
    assert(ts.forall(_ != null) && !ts(1).before(ts(0)))
  }

  test("VERSION AS OF pins files/partitions; history refuses the pin") {
    val (cat2, base2) = freshCatalog()
    lineage(base2)
    val v0Files = spark.sql(
      s"SELECT count(*) FROM $cat2.t.files VERSION AS OF 0")
      .collect().head.getLong(0)
    val headFiles = spark.sql(s"SELECT count(*) FROM $cat2.t.files")
      .collect().head.getLong(0)
    assert(v0Files > headFiles && headFiles === 2L)
    val parts0 = spark.sql(
      s"SELECT sum(n_files) FROM $cat2.t.partitions VERSION AS OF 0")
      .collect().head.getLong(0)
    assert(parts0 === v0Files)
    val e = intercept[Exception](spark.sql(
      s"SELECT * FROM $cat2.t.history VERSION AS OF 0").collect())
    assert(chain(e).contains("whole lineage"))
    val e2 = intercept[Exception](spark.sql(
      s"SELECT * FROM $cat2.t.files VERSION AS OF 9").collect())
    assert(chain(e2).contains("unavailable"))
  }

  test("files serves as a DISTRIBUTED scan: one input partition per " +
      "partition manifest, rows parsed executor-side") {
    val (cat, base) = freshCatalog()
    val root = lineage(base) // two pt_year partitions → two m-files
    val df = spark.sql(s"SELECT pt_year, path, bytes FROM $cat.t.files")
    // the scan fans out one task per partition manifest — the driver
    // never materializes per-file rows (millions-of-files plannable)
    assert(df.rdd.getNumPartitions === 2,
      s"expected one input partition per m-file, got " +
      s"${df.rdd.getNumPartitions}")
    // row content identical to the manifest's recorded entries
    val got = df.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    val want = T.pointers(root, T.versions(root).max).keys.toSeq
      .flatMap { y =>
        T.partitionStatEntries(root, T.versions(root).max, Seq(y))
          .flatMap(_._2).map(e => (y, e.path, e.bytes))
      }.toSet
    assert(got === want)
  }

  private def chain(e: Throwable): String =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")

  test("a REAL table named like a metadata view wins; bad bases refuse") {
    import spark.implicits._
    val (cat, base) = freshCatalog()
    lineage(base)
    // real snapshot table AT <base>/t/history shadows t's metadata view
    val shadow = Seq((7L, 2023, 1.0)).toDF("k", "pt_year", "v")
    T.commit(spark, s"$base/t/history", 0, shadow, Seq(2023))
    val rows = spark.sql(s"SELECT k FROM $cat.t.history").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(7L))
    // metadata view of a NONEXISTENT base table is NoSuchTable
    val e = intercept[Exception](
      spark.sql(s"SELECT * FROM $cat.nope.partitions").collect())
    assert(e.getMessage.toLowerCase.contains("table"))
  }
}
