package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.WriteOps.SnapshotTable

/** Split-pathology diagnostic (r15): builds the SqlDmlProbe table at a
  * given SF, prints the manifest's file-size histogram and the planned
  * input-partition count, then times the same connector aggregate
  * under (a) the default split policy and (b) splits disabled (via a
  * huge openCost floor) — isolating whether byte-range splitting
  * helps or hurts, separate from everything else in the probe. */
object SplitDiag {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/testdata_sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[diag] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val root = s"${sys.props("java.io.tmpdir")}/graft_splitdiag_${ProcessHandle.current.pid}/t"
    SnapshotTable.deleteTree(root)
    val b = spark.read.parquet(s"$d/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        year(col("o_orderdate")).as("pt_year"))
    val years = b.select("pt_year").distinct()
      .collect().map(_.getInt(0)).sorted
    t("build commit v0")(SnapshotTable.commit(spark, root, 0, b, years))

    val entries = SnapshotTable.statEntries(root, 0)
    println(s"[diag] files=${entries.size} " +
      s"bytes=${entries.map(_.bytes).sum} " +
      s"sizes(KB)=${entries.map(_.bytes / 1024).sorted.mkString(",")}")

    def df = spark.read.format("graft-snapshot").option("root", root).load()
    def agg() = df.groupBy("pt_year")
      .agg(count(lit(1)).as("cnt"),
        countDistinct(col("o_orderkey")).as("nk"),
        sum(col("o_totalprice")).as("t")).collect()

    println(s"[diag] split partitions = ${df.rdd.getNumPartitions}")
    t("agg WITH splits #1")(agg())
    t("agg WITH splits #2")(agg())
    t("plain scan count WITH splits")(df.count())

    // Bench's environment: AQE + 128 MB advisory partition size — the
    // gate read-backs run under this; the probe never did. If the
    // distinct's expand+shuffle coalesces to 1-2 partitions here, the
    // reduce side of a 15M-row distinct runs near-serial.
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set(
      "spark.sql.adaptive.advisoryPartitionSizeInBytes", "134217728")
    t("agg AQE+128MB advisory #1")(agg())
    t("agg AQE+128MB advisory #2")(agg())
    t("agg AQE+128MB advisory #3")(agg())
    spark.conf.set(
      "spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
    t("agg AQE+8MB advisory #1")(agg())
    t("agg AQE+8MB advisory #2")(agg())
    spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    spark.conf.set("spark.sql.files.openCostInBytes", (1L << 40).toString)
    println(s"[diag] no-split partitions = ${df.rdd.getNumPartitions}")
    t("agg NO splits #1")(agg())
    t("agg NO splits #2")(agg())
    t("plain scan count NO splits")(df.count())
    spark.conf.unset("spark.sql.files.openCostInBytes")

    // ---- the COMPACTED shape: the scenario the split fix exists for.
    // OPTIMIZE to caller-target 128 MB files (one or two big files per
    // partition at sf10), then the same aggregate with splits on/off —
    // without splits a partition scans on ONE core, with splits the
    // row-group ranges fan back out.
    t("optimize to 128MB files")(
      SnapshotTable.optimize(spark, root, 1,
        targetFileBytes = 128L << 20))
    val entries1 = SnapshotTable.statEntries(root, 1)
    println(s"[diag] compacted files=${entries1.size} " +
      s"sizes(KB)=${entries1.map(_.bytes / 1024).sorted.mkString(",")}")
    println(s"[diag] compacted split partitions = ${df.rdd.getNumPartitions}")
    t("compacted agg WITH splits #1")(agg())
    t("compacted agg WITH splits #2")(agg())
    t("compacted agg WITH splits #3")(agg())
    spark.conf.set("spark.sql.files.openCostInBytes", (1L << 40).toString)
    println(s"[diag] compacted no-split partitions = ${df.rdd.getNumPartitions}")
    t("compacted agg NO splits #1")(agg())
    t("compacted agg NO splits #2")(agg())
    t("compacted agg NO splits #3")(agg())
    spark.conf.unset("spark.sql.files.openCostInBytes")

    SnapshotTable.deleteTree(root)
    spark.stop()
  }
}
