package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark
import graft.operators.WriteOps.{SnapshotTable => T}

/** Manifest-stats aggregate pushdown beyond plain COUNT(*): MIN/MAX
  * answer from per-file column stats, partition-scoped counts answer
  * from the selected partitions' manifests (pt_year conjuncts are
  * CONSUMED — exact partition pruning, no residual), and every
  * unsound shape (DVs, NaN columns, stats gaps, strings) refuses and
  * falls back to a correct scan. */
class StatsAggPushSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def frame(rows: (Long, Int, Double)*) = {
    import spark.implicits._
    rows.toSeq.toDF("k", "pt_year", "v")
  }

  private def df(root: String) =
    spark.read.format("graft-snapshot").option("root", root).load()

  private def planString(d: org.apache.spark.sql.DataFrame): String =
    d.queryExecution.executedPlan.toString

  private def fixture(): String = {
    val root = Files.createTempDirectory("g_aggpush").toString
    T.commit(spark, root, 0, frame(
      (1L, 1, 1.5), (2L, 1, 2.5), (3L, 2, 3.5)), Seq(1, 2))
    T.commitAppend(spark, root, 1, frame((4L, 2, 0.5), (5L, 3, 9.5)))
    root
  }

  test("MIN/MAX answer from manifest column stats — zero data files") {
    val root = fixture()
    val q = df(root).groupBy().agg(min("k").as("lo"), max("k").as("hi"),
      min("v").as("vlo"), max("v").as("vhi"))
    assert(planString(q).contains("from manifest stats"),
      s"min/max not pushed:\n${planString(q)}")
    val r = q.collect().head
    assert((r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
      === ((1L, 5L, 0.5, 9.5)))
  }

  test("COUNT + MIN + MAX combine in one pushed aggregation") {
    val root = fixture()
    val q = df(root).groupBy().agg(count(lit(1)).as("c"),
      min("k").as("lo"), max("v").as("hi"))
    assert(planString(q).contains("from manifest stats"))
    val r = q.collect().head
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) ===
      ((5L, 1L, 9.5)))
  }

  test("GROUP BY pt_year MIN/MAX pushes as per-partition stats") {
    val root = fixture()
    val q = df(root).groupBy("pt_year")
      .agg(min("k").as("lo"), max("k").as("hi"))
    assert(planString(q).contains("GROUP BY pt_year from manifest"))
    assert(q.collect().map(r =>
      r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap ===
      Map(1 -> ((1L, 2L)), 2 -> ((3L, 4L)), 3 -> ((5L, 5L))))
  }

  test("pt_year conjuncts are consumed: partition-scoped count pushes") {
    val root = fixture()
    val q = df(root).filter(col("pt_year") === 2)
      .groupBy().agg(count(lit(1)).as("c"))
    assert(planString(q).contains("from manifest row counts"),
      s"partition-scoped count not pushed:\n${planString(q)}")
    assert(q.collect().head.getLong(0) === 2L)
    // IN-scoped min/max push too
    val q2 = df(root).filter(col("pt_year").isin(1, 3))
      .groupBy().agg(max("k").as("hi"))
    assert(planString(q2).contains("from manifest stats"))
    assert(q2.collect().head.getLong(0) === 5L)
    // a non-live partition scopes to zero files: count 0
    val q3 = df(root).filter(col("pt_year") === 99)
      .groupBy().agg(count(lit(1)).as("c"))
    assert(planString(q3).contains("COUNT(*)=0 from manifest"))
    assert(q3.collect().head.getLong(0) === 0L)
  }

  test("consumed pt_year scans serve exactly the partition's rows") {
    val root = fixture()
    val scoped = df(root).filter(col("pt_year") === 1)
    assert(planString(scoped).contains("partitions=1"),
      s"scan not partition-scoped:\n${planString(scoped)}")
    assert(scoped.collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(1L, 2L))
    // composed with a residual filter on another column
    val mixed = df(root)
      .filter(col("pt_year").isin(1, 2) && col("k") >= 2L)
      .select("k").collect().map(_.getLong(0)).sorted.toSeq
    assert(mixed === Seq(2L, 3L, 4L))
    // and the aggregate REFUSES when a non-partition filter remains
    val q = df(root).filter(col("pt_year") === 1 && col("k") >= 2L)
      .groupBy().agg(count(lit(1)).as("c"))
    assert(!planString(q).contains("from manifest"))
    assert(q.collect().head.getLong(0) === 1L)
  }

  test("deletion vectors refuse MIN/MAX (scan stays DV-exact)") {
    val root = Files.createTempDirectory("g_agg_dv").toString
    T.commit(spark, root, 0, frame(
      (1L, 1, 1.0), (2L, 1, 2.0), (3L, 1, 3.0)), Seq(1))
    T.commitDelete(spark, root, 1, "k", frame((3L, 1, 3.0)))
    val q = df(root).groupBy().agg(max("k").as("hi"))
    assert(!planString(q).contains("from manifest"),
      "max pushed through pending tombstones — stats still see row 3")
    assert(q.collect().head.getLong(0) === 2L)
  }

  test("a NaN-carrying column refuses stats (Spark orders NaN greatest)") {
    val root = Files.createTempDirectory("g_agg_nan").toString
    T.commit(spark, root, 0, frame(
      (1L, 1, 1.0), (2L, 1, Double.NaN), (3L, 1, 3.0)), Seq(1))
    val q = df(root).groupBy().agg(max("v").as("hi"))
    assert(!planString(q).contains("from manifest"),
      "stats collection must have dropped the NaN column")
    assert(q.collect().head.getDouble(0).isNaN,
      "Spark's MAX over a NaN-carrying column is NaN")
    // k's stats are intact: it still pushes on the same table
    val q2 = df(root).groupBy().agg(max("k").as("hi"))
    assert(planString(q2).contains("from manifest stats"))
    assert(q2.collect().head.getLong(0) === 3L)
  }

  test("string MIN/MAX never pushes (footer stats may truncate)") {
    import spark.implicits._
    val root = Files.createTempDirectory("g_agg_str").toString
    T.commit(spark, root, 0, Seq((1L, 1, "alpha"), (2L, 1, "zulu"))
      .toDF("k", "pt_year", "s"), Seq(1))
    val q = df(root).groupBy().agg(max("s").as("hi"))
    assert(!planString(q).contains("from manifest"))
    assert(q.collect().head.getString(0) === "zulu")
  }

  test("a stats gap refuses MIN/MAX but not COUNT") {
    val root = Files.createTempDirectory("g_agg_gap").toString
    T.commit(spark, root, 0, frame((1L, 1, 1.0), (2L, 1, 2.0)), Seq(1))
    // strip the stats blob (keep bytes + rows) — the pre-stats shape
    T.pointers(root, 0).values.foreach { m =>
      val p = java.nio.file.Paths.get(m)
      val stripped = java.nio.file.Files.readAllLines(p)
        .toArray.map(_.toString).map { l =>
          val t = l.split('\t')
          s"${t(0)}\t${t(1)}\t\t${t(3)}"
        }.mkString("\n")
      java.nio.file.Files.writeString(p, stripped)
      java.nio.file.Files.deleteIfExists(
        p.getParent.resolve(s".${p.getFileName}.crc"))
    }
    val mm = df(root).groupBy().agg(min("k").as("lo"))
    assert(!planString(mm).contains("from manifest"))
    assert(mm.collect().head.getLong(0) === 1L)
    val cnt = df(root).groupBy().agg(count(lit(1)).as("c"))
    assert(planString(cnt).contains("from manifest row counts"))
    assert(cnt.collect().head.getLong(0) === 2L)
  }

  test("COUNT(col) answers from recorded null counts; nulls subtract") {
    import spark.implicits._
    val root = Files.createTempDirectory("g_agg_cntcol").toString
    val df = Seq((1L, 1, Some(1.0)), (2L, 1, None), (3L, 2, Some(3.0)),
      (4L, 2, None), (5L, 2, Some(5.0))).toDF("k", "pt_year", "v")
    T.commit(spark, root, 0, df, Seq(1, 2))
    val q = this.df(root).groupBy()
      .agg(count(col("v")).as("c"), count(lit(1)).as("all"))
    assert(planString(q).contains("from manifest stats"),
      s"count(col) not pushed:\n${planString(q)}")
    val r = q.collect().head
    assert((r.getLong(0), r.getLong(1)) === ((3L, 5L)))
    // grouped twin
    val g = this.df(root).groupBy("pt_year").agg(count(col("v")).as("c"))
    assert(planString(g).contains("GROUP BY pt_year from manifest"))
    assert(g.collect().map(x => x.getInt(0) -> x.getLong(1)).toMap ===
      Map(1 -> 1L, 2 -> 2L))
    // DISTINCT refuses
    val d = this.df(root).groupBy()
      .agg(countDistinct(col("v")).as("c"))
    assert(!planString(d).contains("from manifest"))
    assert(d.collect().head.getLong(0) === 3L)
  }

  test("IS NULL prunes files whose stats record zero nulls") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.connector.catalog.SupportsRead
    import org.apache.spark.sql.connector.read.SupportsPushDownFilters
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    import spark.implicits._
    val root = Files.createTempDirectory("g_agg_isnull").toString
    // partition 1: no nulls; partition 2: one null in v
    T.commit(spark, root, 0,
      Seq((1L, 1, Some(1.0)), (2L, 1, Some(2.0))).toDF("k", "pt_year", "v"),
      Seq(1))
    T.commitAppend(spark, root, 1,
      Seq((3L, 2, None: Option[Double]), (4L, 2, Some(4.0)))
        .toDF("k", "pt_year", "v"))
    val total = T.files(root, 1).size

    val provider = new SnapshotSourceProvider
    val opts = new CaseInsensitiveStringMap(Map("root" -> root).asJava)
    val sb = provider.getTable(provider.inferSchema(opts), Array.empty,
        opts.asCaseSensitiveMap())
      .asInstanceOf[SupportsRead].newScanBuilder(opts)
    sb.asInstanceOf[SupportsPushDownFilters]
      .pushFilters(Array(org.apache.spark.sql.sources.IsNull("v")))
    val parts = sb.build().toBatch.planInputPartitions()
    assert(parts.length < total && parts.nonEmpty,
      s"IS NULL kept ${parts.length}/$total files")
    // end-to-end exactness both ways
    assert(df(root).filter(col("v").isNull).select("k").collect()
      .map(_.getLong(0)).toSeq === Seq(3L))
    assert(df(root).filter(col("v").isNotNull).count() === 3L)

    // IS NOT NULL prunes a provably-ALL-null file (bounds-less stats
    // entry carrying nulls == rows)
    T.commitAppend(spark, root, 2,
      Seq((5L, 3, None: Option[Double]), (6L, 3, None: Option[Double]))
        .toDF("k", "pt_year", "v"))
    val sb2 = provider.getTable(provider.inferSchema(opts), Array.empty,
        opts.asCaseSensitiveMap())
      .asInstanceOf[SupportsRead].newScanBuilder(opts)
    sb2.asInstanceOf[SupportsPushDownFilters]
      .pushFilters(Array(org.apache.spark.sql.sources.IsNotNull("v")))
    val parts2 = sb2.build().toBatch.planInputPartitions()
    assert(parts2.length < T.files(root, 2).size && parts2.nonEmpty,
      s"IS NOT NULL kept ${parts2.length}/${T.files(root, 2).size}")
    assert(df(root).filter(col("v").isNotNull).select("k").collect()
      .map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 4L))
    assert(df(root).filter(col("v").isNull).count() === 3L)
  }

  test("a pt_year-scoped STREAM serves only the scoped partitions, " +
      "exactly once across versions") {
    val root = fixture() // v0: years 1,2; v1 appends to years 2,3
    val q = spark.readStream.format("graft-snapshot")
      .option("root", root).load()
      .filter(col("pt_year") === 2).select("k")
      .writeStream.format("memory").queryName("agg_scoped_stream")
      .option("checkpointLocation",
        Files.createTempDirectory("g_agg_ck").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.sql("select k from agg_scoped_stream").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(got === Seq(3L, 4L))
  }
}
