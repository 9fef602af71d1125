package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.WriteOps.SnapshotTable

/** r16 scan-path probe — four measurements SCALE.md records:
  *
  *  1. rowGroupBytes A/B (16/64/128 MB) on a compacted table: bytes
  *     on disk (compression trade), split fan-out, warm full-scan
  *     aggregate — what should the writer's row-group default be?
  *  2. single-large-file split payoff: ONE ~100+ MB file read with
  *     byte-range splits vs forced-whole — the multi-core cliff the
  *     r15 splitter exists for, measured directly.
  *  3. parquet predicate pushdown A/B: a selective filter over a
  *     clustered (zordered) table with row-group/page skipping on vs
  *     off, plus ReaderDiag's materialized-row counts.
  *  4. reader constant: the connector's Group reader vs Spark's
  *     vectorized parquet source over the same files (the r15 1.27×
  *     control, re-measured after the r16 reader changes).
  *
  * Protocol: per-measurement reps printed individually; consume MINs
  * (SCALE.md episode rule — co-tenant storms only ever raise times).
  */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/testdata_sf10")
    // args(1): comma-separated phase list (default all) — storms on
    // this host force phase-targeted re-runs
    val phases: Set[Int] = args.lift(1)
      .map(_.split(',').map(_.trim.toInt).toSet)
      .getOrElse(Set(1, 2, 3, 4, 5, 6))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val hconf = spark.sparkContext.hadoopConfiguration

    def t(label: String, reps: Int = 3)(f: => Any): Unit =
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime(); f
        println(f"[probe] $label%-46s rep$i ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      }

    val base = s"${sys.props("java.io.tmpdir")}/graft_scanprobe_${ProcessHandle.current.pid}"
    val b = spark.read.parquet(s"$d/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        year(col("o_orderdate")).as("pt_year"))
    val years = b.select("pt_year").distinct()
      .collect().map(_.getInt(0)).sorted
    val nRows = b.count()
    println(s"[probe] source rows=$nRows years=${years.mkString(",")}")

    // ---- 1. rowGroupBytes A/B on the compacted shape ----
    if (phases(1)) Seq(16, 64, 128).foreach { mb =>
      hconf.setLong("graft.snapshot.rowGroupBytes", mb.toLong << 20)
      val root = s"$base/rg$mb/t"
      SnapshotTable.deleteTree(root)
      SnapshotTable.commit(spark, root, 0, b.repartition(32), years)
      SnapshotTable.optimize(spark, root, 1)
      val es = SnapshotTable.statEntries(root, 1)
      def df = spark.read.format("graft-snapshot")
        .option("root", root).load()
      println(s"[probe] rg=${mb}MB files=${es.size} " +
        s"bytes=${es.map(_.bytes).sum} " +
        s"splits=${df.rdd.getNumPartitions}")
      t(s"rg=${mb}MB warm agg")(df.groupBy("pt_year")
        .agg(count(lit(1)), sum("o_totalprice")).collect())
    }
    hconf.setLong("graft.snapshot.rowGroupBytes", 16L << 20)

    // ---- 2. single-large-file split payoff ----
    // the cliff shape the splitter exists for: ONE ~180 MB file (all
    // 15M rows forced into one partition), scan-bound aggregate (no
    // distinct — its shuffle would mask the scan)
    val big = s"$base/bigfile/t"
    if (phases(2)) {
    SnapshotTable.deleteTree(big)
    SnapshotTable.commit(spark, big, 0,
      b.withColumn("pt_year", lit(1995)).coalesce(1), Seq(1995))
    val bes = SnapshotTable.statEntries(big, 0)
    println(s"[probe] bigfile files=${bes.size} bytes=${bes.map(_.bytes).sum}")
    def bdf = spark.read.format("graft-snapshot").option("root", big).load()
    def bagg() = bdf.agg(count(lit(1)), sum("o_totalprice"),
      sum("o_custkey"), sum("o_orderkey")).collect()
    println(s"[probe] bigfile split fan-out = ${bdf.rdd.getNumPartitions}")
    t("bigfile agg WITH splits")(bagg())
    spark.conf.set("spark.sql.files.openCostInBytes", (1L << 40).toString)
    println(s"[probe] bigfile forced-whole fan-out = ${bdf.rdd.getNumPartitions}")
    t("bigfile agg FORCED WHOLE")(bagg())
    spark.conf.unset("spark.sql.files.openCostInBytes")
    }

    // ---- 3. predicate pushdown A/B over a clustered layout ----
    val zt = s"$base/zorder/t"
    if (phases(3) || phases(4)) {
    SnapshotTable.deleteTree(zt)
    SnapshotTable.commit(spark, zt, 0, b.repartition(32), years)
    SnapshotTable.optimize(spark, zt, 1, zorderBy = Seq("o_orderkey"))
    }
    def zdf = spark.read.format("graft-snapshot").option("root", zt).load()
    // RANK-based 0.1%-of-rows window (the sf10 key space is sparse —
    // 15M rows over [0, 99B] — so a value-mid window can miss all rows)
    val qs = spark.read.parquet(s"$d/orders.parquet")
      .stat.approxQuantile("o_orderkey", Array(0.5, 0.501), 0.0001)
    val (lo, hi) = (qs(0).toLong, math.max(qs(1).toLong, qs(0).toLong + 1))
    println(s"[probe] selective window [$lo, $hi]")
    if (phases(3)) {
    def selective() = zdf
      .filter(col("o_orderkey") >= lo && col("o_orderkey") <= hi)
      .agg(count(lit(1)), sum("o_totalprice")).collect().head
    graft.sources.ReaderDiag.reset()
    var onRes: org.apache.spark.sql.Row = null
    t("selective filter PUSHDOWN ON")({ onRes = selective() })
    println(s"[probe] pushdown-on rows materialized = " +
      s"${graft.sources.ReaderDiag.emitted / 3} result=$onRes")
    hconf.setBoolean("graft.snapshot.parquetFilterPushdown", false)
    graft.sources.ReaderDiag.reset()
    var offRes: org.apache.spark.sql.Row = null
    t("selective filter PUSHDOWN OFF")({ offRes = selective() })
    println(s"[probe] pushdown-off rows materialized = " +
      s"${graft.sources.ReaderDiag.emitted / 3} result=$offRes")
    require(onRes == offRes,
      s"pushdown changed results: $onRes vs $offRes")
    require(onRes.getLong(0) > 0, "selective window matched no rows")
    hconf.unset("graft.snapshot.parquetFilterPushdown")
    }

    // ---- 4. reader constant vs vectorized control ----
    if (phases(4)) {
    val files = SnapshotTable.files(zt, 1)
    def vdf = spark.read.parquet(files: _*)
    t("connector whole-scan agg")(zdf.groupBy("pt_year")
      .agg(count(lit(1)), sum("o_totalprice"),
        sum("o_custkey")).collect())
    t("vectorized control agg")(vdf.groupBy("pt_year")
      .agg(count(lit(1)), sum("o_totalprice"),
        sum("o_custkey")).collect())
    // the narrow-projection shape (column pruning on both sides)
    t("connector 1-col sum")(zdf.agg(sum("o_totalprice")).collect())
    t("vectorized 1-col sum")(vdf.agg(sum("o_totalprice")).collect())
    }

    // ---- 5. STRING-heavy scan: fast vs group materializer ----
    // low-cardinality strings = the dictionary-cached UTF8String shape
    if (phases(5)) {
      val st = s"$base/strings/t"
      SnapshotTable.deleteTree(st)
      val sb = spark.read.parquet(s"$d/orders.parquet")
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_orderpriority"), year(col("o_orderdate")).as("pt_year"))
      SnapshotTable.commit(spark, st, 0, sb.repartition(32),
        sb.select("pt_year").distinct().collect().map(_.getInt(0)).toSeq)
      SnapshotTable.optimize(spark, st, 1)
      def sdf = spark.read.format("graft-snapshot").option("root", st)
        .load()
      def sagg() = sdf.groupBy("o_orderstatus")
        .agg(count(lit(1)), max("o_orderpriority")).collect()
      t("strings FAST materializer")(sagg())
      hconf.set("graft.snapshot.rowMaterializer", "group")
      t("strings GROUP materializer")(sagg())
      hconf.unset("graft.snapshot.rowMaterializer")
      val files5 = SnapshotTable.files(st, 1)
      def svdf = spark.read.parquet(files5: _*)
      t("strings vectorized control")(svdf.groupBy("o_orderstatus")
        .agg(count(lit(1)), max("o_orderpriority")).collect())
    }

    // ---- 6. COLUMNAR batch reader A/B (r17) ----
    // the unpredicated scan-bound shapes the columnar path exists
    // for: numeric multi-column agg, 1-col sum, string group-by —
    // columnar ON vs OFF (row fast path) vs Spark's vectorized
    // parquet control over the same files
    if (phases(6)) {
      val ct = s"$base/columnar/t"
      SnapshotTable.deleteTree(ct)
      SnapshotTable.commit(spark, ct, 0, b.repartition(32), years)
      SnapshotTable.optimize(spark, ct, 1)
      def cdf = spark.read.format("graft-snapshot").option("root", ct)
        .load()
      val cfiles = SnapshotTable.files(ct, 1)
      def cvdf = spark.read.parquet(cfiles: _*)
      def nagg(df: => org.apache.spark.sql.DataFrame)() =
        df.groupBy("pt_year").agg(count(lit(1)), sum("o_totalprice"),
          sum("o_custkey"), sum("o_orderkey")).collect()
      def onecol(df: => org.apache.spark.sql.DataFrame)() =
        df.agg(sum("o_totalprice")).collect()
      t("columnar ON  numeric agg", 5)(nagg(cdf)())
      hconf.set("graft.snapshot.columnar", "off")
      t("columnar OFF numeric agg", 5)(nagg(cdf)())
      hconf.unset("graft.snapshot.columnar")
      t("vectorized   numeric agg", 5)(nagg(cvdf)())
      t("columnar ON  1-col sum", 5)(onecol(cdf)())
      hconf.set("graft.snapshot.columnar", "off")
      t("columnar OFF 1-col sum", 5)(onecol(cdf)())
      hconf.unset("graft.snapshot.columnar")
      t("vectorized   1-col sum", 5)(onecol(cvdf)())

      val st6 = s"$base/colstrings/t"
      SnapshotTable.deleteTree(st6)
      val sb6 = spark.read.parquet(s"$d/orders.parquet")
        .select(col("o_orderkey"), col("o_orderstatus"),
          concat(lit("clerk_"), (col("o_custkey") % 1000))
            .as("o_clerk"),
          year(col("o_orderdate")).as("pt_year"))
      SnapshotTable.commit(spark, st6, 0, sb6.repartition(32),
        sb6.select("pt_year").distinct().collect().map(_.getInt(0)).toSeq)
      SnapshotTable.optimize(spark, st6, 1)
      def sdf6 = spark.read.format("graft-snapshot").option("root", st6)
        .load()
      def sagg6(df: => org.apache.spark.sql.DataFrame)() =
        df.groupBy("o_orderstatus").agg(count(lit(1)), max("o_clerk"))
          .collect()
      t("columnar ON  string agg", 5)(sagg6(sdf6)())
      hconf.set("graft.snapshot.columnar", "off")
      t("columnar OFF string agg", 5)(sagg6(sdf6)())
      hconf.unset("graft.snapshot.columnar")
      val sfiles6 = SnapshotTable.files(st6, 1)
      t("vectorized   string agg", 5)(
        sagg6(spark.read.parquet(sfiles6: _*))())

      // result parity double-check at probe scale
      hconf.set("graft.snapshot.columnar", "off")
      val offRows = cdf.agg(count(lit(1)), sum("o_totalprice")).collect()
        .head.toString
      hconf.unset("graft.snapshot.columnar")
      val onRows = cdf.agg(count(lit(1)), sum("o_totalprice")).collect()
        .head.toString
      require(onRows == offRows, s"columnar parity broke: $onRows vs $offRows")
      println(s"[probe] columnar parity OK: $onRows")
    }

    SnapshotTable.deleteTree(base)
    spark.stop()
  }
}
