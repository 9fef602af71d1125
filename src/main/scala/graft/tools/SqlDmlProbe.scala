package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.WriteOps.SnapshotTable

/** Phase-level timing of the SQL DML gates' building blocks at a given
  * SF — the r14 probe companion: separates table BUILD, the DML
  * statement, and the connector READ-BACK aggregate so a slow gate
  * total attributes to the phase that owns it (the full-gate numbers
  * alone can't distinguish "DELETE is slow" from "the post-DELETE
  * read is slow").
  *
  * Usage: SqlDmlProbe <sfDir> [phases]
  */
object SqlDmlProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/testdata_sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft_wh_${ProcessHandle.current.pid}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // warmup

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val base = s"${sys.props("java.io.tmpdir")}/graft_dmlprobe_${ProcessHandle.current.pid}"
    spark.conf.set("spark.sql.catalog.gprobe",
      classOf[graft.sources.SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.gprobe.base", base)
    val root = s"$base/t"
    SnapshotTable.deleteTree(root)

    val b = spark.read.parquet(s"$d/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        year(col("o_orderdate")).as("pt_year"))
    val years = b.select("pt_year").distinct()
      .collect().map(_.getInt(0)).sorted
    t("build: commit v0")(SnapshotTable.commit(spark, root, 0, b, years))

    def agg(clause: String): Array[org.apache.spark.sql.Row] = spark.sql(
      s"""SELECT pt_year, count(*) AS cnt,
            count(DISTINCT o_orderkey) AS n_keys,
            cast(sum(cast(o_totalprice AS decimal(18,2))) AS double) AS t
          FROM gprobe.t $clause GROUP BY pt_year""").collect()

    t("read: connector agg head#1")(agg(""))
    t("read: connector agg head#2")(agg(""))
    t("dml: DELETE 1996 custkey<=500")(spark.sql(
      "DELETE FROM gprobe.t WHERE pt_year = 1996 AND o_custkey <= 500"))
    // distinct-vs-plain attribution: the sf10 probe's two super-linear
    // gate totals are dominated by a whole-table count(DISTINCT)
    // read-back — separate the distinct's expand+shuffle cost from the
    // plain scan+agg cost on the same table
    def aggPlain(clause: String): Array[org.apache.spark.sql.Row] =
      spark.sql(
        s"""SELECT pt_year, count(*) AS cnt,
              cast(sum(cast(o_totalprice AS decimal(18,2))) AS double)
                AS t
            FROM gprobe.t $clause GROUP BY pt_year""").collect()
    (1 to 4).foreach { i =>
      t(s"read: post-delete head #$i")(agg(""))
      t(s"read: post-delete v0   #$i")(agg("VERSION AS OF 0"))
      t(s"read: plain (no distinct) #$i")(aggPlain(""))
    }
    // the gate's exact shape: ONE statement unioning head + v0 aggs
    def gateShape(): Array[org.apache.spark.sql.Row] = {
      def a(label: String, clause: String) = spark.sql(
        s"""SELECT '$label' AS version, pt_year,
              cast(count(*) AS bigint) AS cnt,
              cast(count(DISTINCT o_orderkey) AS bigint) AS n_keys,
              cast(sum(cast(o_totalprice AS decimal(18,2))) AS double)
                AS total
            FROM gprobe.t $clause GROUP BY pt_year""")
      a("head", "").unionByName(a("v0", "VERSION AS OF 0")).collect()
    }
    val unionReps = args.find(_.startsWith("reps="))
      .map(_.stripPrefix("reps=").toInt).getOrElse(4)
    // control: the identical union shape over PLAIN parquet (no
    // connector) — separates connector pathology from Spark/AQE/env
    b.createOrReplaceTempView("ctl")
    def ctlShape(): Array[org.apache.spark.sql.Row] = {
      def a(label: String) = spark.sql(
        s"""SELECT '$label' AS version, pt_year,
              cast(count(*) AS bigint) AS cnt,
              cast(count(DISTINCT o_orderkey) AS bigint) AS n_keys,
              cast(sum(cast(o_totalprice AS decimal(18,2))) AS double)
                AS total
            FROM ctl GROUP BY pt_year""")
      a("head").unionByName(a("v0")).collect()
    }
    (1 to unionReps).foreach { i =>
      t(s"read: union gate shape #$i")(gateShape())
      t(s"read: union CONTROL     #$i")(ctlShape())
    }
    println("[probe] head plan:")
    println(spark.sql(
      "SELECT pt_year, count(*) FROM gprobe.t GROUP BY pt_year")
      .queryExecution.executedPlan.toString.take(2000))
    if (args.contains("keep")) println(s"[probe] kept table at $root")
    else SnapshotTable.deleteTree(root)
    spark.stop()
  }
}
