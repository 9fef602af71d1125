package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off timing probe for the substring-report shuffle shapes. */
object SubstrProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val d = "/root/testdata/sf0.1"
    t("warm")(graft.operators.DedupOps.substringReport(spark, d).count())
    t("window-df run1")(
      graft.operators.DedupOps.substringReport(spark, d).count())
    t("window-df run2")(
      graft.operators.DedupOps.substringReport(spark, d).count())
    // the old shape: groupBy df + sort-merge join back
    import org.apache.spark.sql.functions._
    def oldShape() = {
      val win = graft.operators.Tables.documents(spark, d)
        .select(col("doc_id"), explode(array_distinct(
          graft.functions.CharNgrams.char_ngrams(
            lower(trim(col("text"))), 30))).as("win"))
        .select(col("doc_id"), md5(col("win")).as("wh"))
      val df = win.groupBy("wh").agg(count(lit(1)).as("ndocs"))
      win.join(df, Seq("wh"))
        .groupBy("doc_id").agg(
          count(lit(1)).as("n_windows"),
          sum(when(col("ndocs") >= 2, 1L).otherwise(0L)).as("n_shared"))
    }
    t("groupBy+join run1")(oldShape().count())
    t("groupBy+join run2")(oldShape().count())
  }
}
