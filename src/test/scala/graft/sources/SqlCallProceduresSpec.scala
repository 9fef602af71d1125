package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark
import graft.operators.WriteOps.SnapshotTable

/** SQL maintenance procedures (`CALL <cat>.system.<proc>` — Spark 4
  * DSv2 ProcedureCatalog): optimize compacts + advances the head (and
  * is a no-op second time), vacuum reclaims old versions, restore
  * rolls back as a new commit, vacuum_orphans counts reclaimed paths,
  * defaults fill omitted args, and unknown names / wrong namespaces
  * refuse loudly. */
class SqlCallProceduresSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val T = SnapshotTable

  private def freshCatalog(): (String, String) = {
    val base = Files.createTempDirectory("g_call_cat").toString
    val name = "gcall_" + java.util.UUID.randomUUID().toString.take(8)
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.base", base)
    (name, base)
  }

  /** Fragmented two-partition table: v0 committed through a 8-task
    * exchange leaves several files per pt_year. */
  private def fragmentedTable(base: String): String = {
    import spark.implicits._
    val root = s"$base/t"
    val df = (1L to 400L).map(k => (k, 2023 + (k % 2).toInt, k * 1.5))
      .toDF("k", "pt_year", "v").repartition(8)
    T.commit(spark, root, 0, df, Seq(2023, 2024), distribute = false)
    root
  }

  test("CALL optimize compacts, reports the new head, then no-ops") {
    val (cat, base) = freshCatalog()
    val root = fragmentedTable(base)
    assert(T.pointers(root, 0).keySet === Set(2023, 2024))
    val preFiles = T.files(root, 0).size
    assert(preFiles > 2, s"fixture should be fragmented (got $preFiles)")

    val r1 = spark.sql(s"CALL $cat.system.optimize(table => 't')")
    assert(r1.columns.toSeq === Seq("new_version", "partitions_rewritten"))
    val row1 = r1.collect().head
    assert(row1.getInt(0) === 1)
    assert(row1.getInt(1) === 2)
    assert(T.files(root, 1).size === 2) // one right-sized file per year
    // data-unchanged contract
    assert(spark.sql(s"SELECT sum(v) FROM $cat.t").collect()
      .head.getDouble(0) === (1L to 400L).map(_ * 1.5).sum)

    // second call: nothing fragmented -> head does NOT advance
    val row2 = spark.sql(s"CALL $cat.system.optimize(table => 't')")
      .collect().head
    assert(row2.getInt(0) === 1 && row2.getInt(1) === 0)
    assert(T.versions(root) === Seq(0, 1))
  }

  test("CALL optimize positional args + explicit knobs") {
    val (cat, base) = freshCatalog()
    fragmentedTable(base)
    val row = spark.sql(
      s"CALL $cat.system.optimize('t', 1, ${64L << 20}, 'k')")
      .collect().head
    assert(row.getInt(0) === 1 && row.getInt(1) === 2)
  }

  test("CALL restore rolls back as a new commit; CALL vacuum reclaims") {
    val (cat, base) = freshCatalog()
    val root = fragmentedTable(base)
    spark.sql(s"CALL $cat.system.optimize(table => 't')") // v1
    spark.sql(s"DELETE FROM $cat.t WHERE pt_year = 2023")  // v2
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").collect()
      .head.getLong(0) === 200L)

    val r = spark.sql(
      s"CALL $cat.system.restore(table => 't', version => 1)")
      .collect().head
    assert(r.getInt(0) === 1 && r.getInt(1) === 3)
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").collect()
      .head.getLong(0) === 400L)

    val v = spark.sql(
      s"CALL $cat.system.vacuum(table => 't', retain => 2)")
      .collect().head
    assert(v.getInt(0) === 3 && v.getInt(1) === 2)
    assert(T.versions(root) === Seq(2, 3))
    // the retained pre-restore version still time-travels
    assert(spark.sql(s"SELECT count(*) FROM $cat.t VERSION AS OF 2")
      .collect().head.getLong(0) === 200L)
    // the vacuumed one is gone, loudly
    intercept[Exception](
      spark.sql(s"SELECT count(*) FROM $cat.t VERSION AS OF 0").collect())
  }

  test("CALL optimize(where_years) scopes the rewrite to named " +
      "partitions; CALL vacuum(dry_run) counts without deleting") {
    val (cat, base) = freshCatalog()
    val root = fragmentedTable(base)
    val pre2024 = T.files(root, 0).filter(_.contains("_y2024_"))
    // scoped optimize: only 2023 rewrites; 2024's files carry verbatim
    val r = spark.sql(s"CALL $cat.system.optimize(table => 't', " +
      "where_years => '2023')").collect().head
    assert(r.getInt(1) === 1, "where_years must rewrite ONE partition")
    assert(T.files(root, 1).filter(_.contains("_y2024_")).toSet ===
      pre2024.toSet, "scoped optimize touched an out-of-scope partition")
    assert(T.files(root, 1).count(_.contains("_y2023_")) <
      T.files(root, 0).count(_.contains("_y2023_")))
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").collect()
      .head.getLong(0) === 400L)

    // dry-run vacuum: reports the reclaimable set, deletes nothing
    val preAll = T.files(root, 0).toSet ++ T.files(root, 1).toSet
    val dry = spark.sql(s"CALL $cat.system.vacuum(table => 't', " +
      "retain => 1, dry_run => true)").collect().head
    assert(dry.getInt(2) > 0, "dry run must report reclaimable paths")
    assert(T.versions(root) === Seq(0, 1), "dry run deleted versions")
    assert(preAll.forall(f =>
      java.nio.file.Files.exists(java.nio.file.Paths.get(
        f.stripPrefix("file:")))), "dry run deleted data files")
    // the real vacuum then reclaims exactly what the dry run counted
    val real = spark.sql(s"CALL $cat.system.vacuum(table => 't', " +
      "retain => 1)").collect().head
    assert(real.getInt(2) === dry.getInt(2),
      "dry-run count diverged from the real reclaim")
    assert(T.versions(root) === Seq(1))
  }

  test("CALL vacuum_orphans reports zero on a clean table") {
    val (cat, base) = freshCatalog()
    fragmentedTable(base)
    val row = spark.sql(
      s"CALL $cat.system.vacuum_orphans(table => 't', horizon_ms => 0)")
      .collect().head
    assert(row.getInt(0) === 0)
  }

  /** Messages along the full cause chain (Spark wraps procedure-load
    * failures in FAILED_TO_LOAD_ROUTINE; ours is the cause). */
  private def chain(e: Throwable): String =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")

  test("unknown procedure, wrong namespace, bad args refuse loudly") {
    val (cat, base) = freshCatalog()
    fragmentedTable(base)
    val e1 = intercept[Exception](
      spark.sql(s"CALL $cat.system.frobnicate(table => 't')"))
    assert(chain(e1).contains("unknown procedure"))
    val e2 = intercept[Exception](
      spark.sql(s"CALL $cat.maintenance.optimize(table => 't')"))
    assert(chain(e2).contains("system namespace"))
    val e3 = intercept[Exception](
      spark.sql(s"CALL $cat.system.vacuum(table => 't', retain => 0)"))
    assert(e3.getMessage.contains("retain"))
    val e4 = intercept[Exception](spark.sql(
      s"CALL $cat.system.optimize(table => '/etc/passwd')"))
    assert(e4.getMessage.contains("catalog base"))
    val e5 = intercept[Exception](spark.sql(
      s"CALL $cat.system.restore(table => 'nope', version => 0)"))
    assert(e5.getMessage.contains("no snapshot table"))
  }

  test("SHOW PROCEDURES lists the maintenance set") {
    val (cat, _) = freshCatalog()
    val df = spark.sql(s"SHOW PROCEDURES IN $cat.system")
    val nameIdx = df.columns.indexWhere(_ == "procedure_name")
    assert(nameIdx >= 0, s"no name column in ${df.columns.mkString(",")}")
    val names = df.collect().map(_.getString(nameIdx)).toSet
    assert(names === Set("optimize", "vacuum", "vacuum_orphans",
      "restore"))
    // DESCRIBE PROCEDURE surfaces the registered description
    val desc = spark.sql(s"DESCRIBE PROCEDURE $cat.system.optimize")
      .collect().map(_.toSeq.mkString(" ")).mkString("\n")
    assert(desc.contains("optimize"))
  }
}
