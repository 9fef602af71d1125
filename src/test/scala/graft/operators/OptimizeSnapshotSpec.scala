package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts of OPTIMIZE-under-time-travel the data-identity oracle
  * can't state: the change feed across the optimize commit is EMPTY,
  * the pre-optimize version's files survive (time travel intact) until
  * vacuum reclaims exactly them, per-partition file counts actually
  * drop to the target, right-sized partitions carry over untouched,
  * and a second optimize is a no-op. */
class OptimizeSnapshotSpec extends AnyFunSuite {

  private lazy val spark = graft.etl.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("optimize compacts fragmented partitions as a data-unchanged " +
      "commit; CDF empty; old version vacuumable; re-optimize no-op") {
    import WriteOps.SnapshotTable
    val root = Files.createTempDirectory("g_opt_spec").toString + "/t"
    val base = Tables.orders(spark, sf).select(col("o_orderkey"),
      col("o_custkey"), col("o_totalprice"),
      year(col("o_orderdate")).as("pt_year"))
    val years = base.select("pt_year").distinct()
      .collect().map(_.getInt(0)).sorted

    SnapshotTable.commit(spark, root, 0, base.repartition(16), years,
      distribute = false)
    def filesPerYear(v: Int): Map[Int, Int] = {
      val yr = "_y(\\d+)_p".r
      SnapshotTable.files(root, v)
        .groupBy(f => yr.findFirstMatchIn(f).map(_.group(1).toInt).get)
        .view.mapValues(_.size).toMap
    }
    assert(filesPerYear(0).values.exists(_ > 1),
      "v0 is not fragmented — the spec setup is vacuous")

    val compacted = SnapshotTable.optimize(spark, root, 1)
    assert(compacted.nonEmpty)
    assert(filesPerYear(1).values.forall(_ == 1),
      s"optimize left fragmentation: ${filesPerYear(1)}")

    // data-unchanged: the change feed across the commit is EMPTY
    assert(WriteOps.tableChanges(spark, root, 0, 1).count() === 0,
      "optimize produced change-feed rows")

    // time travel intact: v0 still reads its original files
    val v0Files = SnapshotTable.files(root, 0)
    assert(v0Files.forall(f => Files.exists(Paths.get(f))))
    assert(SnapshotTable.read(spark, root, 0).count() ===
      SnapshotTable.read(spark, root, 1).count())

    // a second optimize finds nothing fragmented and commits nothing
    assert(SnapshotTable.optimize(spark, root, 2) === Seq.empty)
    assert(SnapshotTable.versions(root) === Seq(0, 1))

    // vacuum to 1 retained version reclaims exactly v0's dead files
    val v1Files = SnapshotTable.files(root, 1).toSet
    SnapshotTable.vacuum(root, retain = 1)
    v0Files.filterNot(v1Files.contains).foreach(f =>
      assert(!Files.exists(Paths.get(f)), s"vacuum left dead file $f"))
    v1Files.foreach(f =>
      assert(Files.exists(Paths.get(f)), s"vacuum ate live file $f"))
    assertThrows[IllegalArgumentException](
      SnapshotTable.read(spark, root, 0))
  }

  test("fat fragmented partition rewrites into MULTIPLE byte-bounded " +
      "files, not one task's single file") {
    import WriteOps.SnapshotTable
    val root = Files.createTempDirectory("g_opt_fat").toString + "/t"
    // one partition whose bytes are many multiples of the target: the
    // 100 TB shape where a single-file rewrite would funnel tens of GB
    // through one task
    val fat = spark.range(20000).select(
      col("id").as("o_orderkey"), col("id").as("o_custkey"),
      md5(col("id").cast("string")).as("payload"),
      lit(1).as("pt_year"))
    SnapshotTable.commit(spark, root, 0, fat.repartition(8), Seq(1),
      distribute = false)
    val v0Bytes = SnapshotTable.files(root, 0)
      .map(f => Files.size(Paths.get(f))).sum
    val target = 64L * 1024
    assert(v0Bytes > 2 * target, "fixture too small — spec is vacuous")

    assert(SnapshotTable.optimize(spark, root, 1,
      maxFilesPerPartition = 1, targetFileBytes = target) === Seq(1))
    val v1 = SnapshotTable.files(root, 1)
    val expected = math.ceil(v0Bytes.toDouble / target).toInt
    assert(v1.size > 1,
      s"fat partition was rewritten into a single file (target " +
      s"$target B over $v0Bytes B should yield ~$expected)")
    assert(v1.size <= expected,
      s"more files than the byte target allows: ${v1.size} > $expected")
    val sizes = v1.map(f => Files.size(Paths.get(f)))
    assert(sizes.max <= target * 3,
      s"output file exceeds the byte bound: ${sizes.max} B vs " +
      s"$target B target")
    // still data-unchanged
    val chk = (v: Int) => SnapshotTable.read(spark, root, v)
      .agg(sum("o_orderkey"), count(lit(1))).first()
    assert(chk(1) === chk(0))
  }

  test("optimize zorderBy: byte-bounded output files carry disjoint " +
      "cluster-key ranges (file-skipping layout), data unchanged") {
    import WriteOps.SnapshotTable
    val root = Files.createTempDirectory("g_opt_z").toString + "/t"
    val fat = spark.range(20000).select(
      col("id").as("o_orderkey"),
      (col("id") * 7919 % 1024).as("k1"),
      (col("id") * 104729 % 1024).as("k2"),
      md5(col("id").cast("string")).as("payload"),
      lit(1).as("pt_year"))
    SnapshotTable.commit(spark, root, 0, fat.repartition(8), Seq(1),
      distribute = false)
    val target = 64L * 1024
    assert(SnapshotTable.optimize(spark, root, 1,
      maxFilesPerPartition = 1, targetFileBytes = target,
      zorderBy = Seq("k1", "k2")) === Seq(1))
    val v1 = SnapshotTable.files(root, 1)
    assert(v1.size > 1, "z-ordered rewrite collapsed to one file")

    // data-unchanged (same rows, any order)
    val chk = (v: Int) => SnapshotTable.read(spark, root, v)
      .agg(sum("o_orderkey"), sum("k1"), sum("k2"), count(lit(1)))
      .first()
    assert(chk(1) === chk(0))

    // disjoint per-file interleave ranges: the range exchange on the
    // recomputed Morton key means each output file owns its own z
    // interval — the min/max stats a scan uses to skip files
    val ranges = v1.map { f =>
      val r = spark.read.parquet(f)
        .select(expr(WriteOps.zvalExpr("k1", "k2")).cast("bigint")
          .as("zv"))
        .agg(min("zv"), max("zv")).first()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) =>
        assert(hi <= lo2,
          s"overlapping z ranges across files: $ranges")
      case _ => ()
    }
  }

  test("right-sized partitions carry over by reference, untouched") {
    import WriteOps.SnapshotTable
    val root = Files.createTempDirectory("g_opt_carry").toString + "/t"
    import spark.implicits._
    // year 1 compact (1 file), year 2 fragmented (coalesce trick:
    // commit from an 8-way exchange)
    val y1 = (1L to 100L).map(i => (i, i, 1.0, 1))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "pt_year")
    val y2 = (101L to 200L).map(i => (i, i, 2.0, 2))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "pt_year")
    SnapshotTable.commit(spark, root, 0,
      y1.coalesce(1).unionByName(y2.repartition(8)), Seq(1, 2),
      distribute = false)
    val yr = "_y(\\d+)_p".r
    def byYear(v: Int) = SnapshotTable.files(root, v)
      .groupBy(f => yr.findFirstMatchIn(f).map(_.group(1).toInt).get)
    val y1FilesBefore = byYear(0)(1).toSet
    assert(byYear(0)(2).size > 1, "year 2 not fragmented — vacuous")
    val mtimes = y1FilesBefore.map(f =>
      f -> Files.getLastModifiedTime(Paths.get(f)).toMillis).toMap

    assert(SnapshotTable.optimize(spark, root, 1) === Seq(2))
    // year 1's files carried over VERBATIM (same paths, same bytes)
    assert(byYear(1)(1).toSet === y1FilesBefore)
    y1FilesBefore.foreach(f => assert(
      Files.getLastModifiedTime(Paths.get(f)).toMillis === mtimes(f),
      s"carried file $f was rewritten"))
    assert(byYear(1)(2).size === 1)
  }

  test("optimize plans from manifest-recorded sizes alone — zero " +
      "per-file filesystem stats") {
    import WriteOps.SnapshotTable
    val root = Files.createTempDirectory("g_opt_manifest").toString + "/t"
    val fat = spark.range(20000).select(
      col("id").as("o_orderkey"), col("id").as("o_custkey"),
      md5(col("id").cast("string")).as("payload"),
      lit(1).as("pt_year"))
    SnapshotTable.commit(spark, root, 0, fat.repartition(8), Seq(1),
      distribute = false)
    val actualBytes = SnapshotTable.files(root, 0)
      .map(f => Files.size(Paths.get(f))).sum
    // target such that TRUE sizes would compact to ONE file...
    val target = actualBytes + 1
    // ...then tamper the PARTITION manifest (located via v0's pointer):
    // inflate every recorded size 8× — the manifests are the only place
    // sizes live; if optimize consulted the filesystem it would see the
    // true bytes and write one file
    val mPath = Files.readAllLines(
        Paths.get(root, "_manifests", "v0.txt")).asScalaLines
      .find(_.startsWith("y1\t")).get.split('\t')(1)
    val m = Paths.get(mPath)
    // entry line = path \t bytes [\t stats] — inflate field 2 only
    val inflated = Files.readAllLines(m).asScalaLines.map { l =>
      val t = l.split('\t')
      (t.updated(1, (t(1).toLong * 8).toString): Array[String])
        .mkString("\t")
    }
    Files.write(m, java.util.Arrays.asList(inflated: _*))
    // the tamper bypassed the local Hadoop FS, so its CRC sidecar is now
    // stale — drop it (checksum-less files read unchecked)
    Files.deleteIfExists(
      m.resolveSibling("." + m.getFileName.toString + ".crc"))

    assert(SnapshotTable.optimize(spark, root, 1,
      maxFilesPerPartition = 1, targetFileBytes = target) === Seq(1))
    val n = SnapshotTable.files(root, 1).size
    assert(n >= 4,
      s"optimize wrote $n file(s) — it must have statted the true " +
      "on-disk sizes instead of reading the manifest's (inflated ⇒ ~8)")
    // data unchanged regardless of the planning input
    val chk = (v: Int) => SnapshotTable.read(spark, root, v)
      .agg(sum("o_orderkey"), count(lit(1))).first()
    assert(chk(1) === chk(0))
  }

  test("optimize composes with schema evolution: a post-evolve rewrite " +
      "keeps values, stays data-unchanged, and carries the schema") {
    import WriteOps.SnapshotTable
    import spark.implicits._
    val root = Files.createTempDirectory("g_opt_evolve").toString + "/t"
    // v0 fragmented and narrow
    val base = spark.range(2000).select(
      col("id").as("o_orderkey"), col("id").as("o_custkey"),
      (col("id") % 97).cast("double").as("o_totalprice"),
      lit(1).as("pt_year"))
    SnapshotTable.commit(spark, root, 0, base.repartition(8), Seq(1),
      distribute = false)
    // v1 evolves: same rows plus a new column on half of them
    val evolved = SnapshotTable.read(spark, root, 0)
      .withColumn("o_channel",
        when(col("o_orderkey") % 2 === 0, lit("web")))
    SnapshotTable.commit(spark, root, 1, evolved.repartition(8), Seq(1),
      distribute = false)

    // optimize the evolved, fragmented table
    assert(SnapshotTable.optimize(spark, root, 2).nonEmpty)
    // data-unchanged across the rewrite, INCLUDING the evolved column
    val chk = (v: Int) => SnapshotTable.read(spark, root, v)
      .agg(sum("o_orderkey"), sum("o_totalprice"),
        count(col("o_channel")), count(lit(1))).first()
    assert(chk(2) === chk(1))
    assert(WriteOps.tableChanges(spark, root, 1, 2).count() === 0,
      "optimize after evolve produced change-feed rows")
    // the rewritten version still records the evolved schema
    assert(SnapshotTable.tableSchema(root, 2).get
      .fieldNames.contains("o_channel"))
    SnapshotTable.deleteTree(root)
  }

  private implicit class JListLines(l: java.util.List[String]) {
    def asScalaLines: Seq[String] =
      scala.jdk.CollectionConverters.ListHasAsScala(l).asScala.toSeq
  }
}
