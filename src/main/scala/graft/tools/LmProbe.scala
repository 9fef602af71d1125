package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe: char-LM freq join-back vs broadcast; containment
  * df-cap groupBy+join vs count-over-partition. */
object LmProbe {
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

    def tris = graft.operators.Tables.documents(spark, d)
      .select(col("doc_id"),
        explode(graft.functions.CharNgrams.char_ngrams(col("text"), 3))
          .as("tri"))
      .groupBy("doc_id", "tri").agg(count(lit(1)).as("c_dt"))
    def lmJoin = {
      val tr = tris
      val freq = tr.groupBy("tri").agg(sum("c_dt").as("c_t"))
      tr.join(freq, Seq("tri"))
        .groupBy("doc_id").agg(sum("c_dt").as("n_tri"),
          sum(col("c_dt") * col("c_t")).as("freq_sum"),
          min("c_t").as("rarest_freq"))
    }
    def lmBcast = {
      val tr = tris
      val freq = tr.groupBy("tri").agg(sum("c_dt").as("c_t"))
      tr.join(broadcast(freq), Seq("tri"))
        .groupBy("doc_id").agg(sum("c_dt").as("n_tri"),
          sum(col("c_dt") * col("c_t")).as("freq_sum"),
          min("c_t").as("rarest_freq"))
    }
    println("[probe] vocab size: " +
      tris.select("tri").distinct().count())
    t("lm join warm")(lmJoin.count())
    t("lm join")(lmJoin.count())
    t("lm bcast")(lmBcast.count())
    t("lm join 2")(lmJoin.count())
    t("lm bcast 2")(lmBcast.count())

    t("containment current")(
      graft.operators.DedupOps.containmentPairs(spark, d).count())
    t("containment current 2")(
      graft.operators.DedupOps.containmentPairs(spark, d).count())
  }
}
