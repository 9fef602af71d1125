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

    spark.conf.set("spark.sql.files.openCostInBytes", (1L << 40).toString)
    println(s"[diag] no-split partitions = ${df.rdd.getNumPartitions}")
    t("agg NO splits #1")(agg())
    t("agg NO splits #2")(agg())
    t("plain scan count NO splits")(df.count())
    spark.conf.unset("spark.sql.files.openCostInBytes")

    SnapshotTable.deleteTree(root)
    spark.stop()
  }
}
