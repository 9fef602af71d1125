package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Sq8Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    spark.range(1000000).selectExpr("sum(id)").collect()
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $name: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    import graft.functions.ArrayDotLong.array_dot_long
    def quant = spark.read.parquet(s"$d/embeddings.parquet")
      .withColumn("qv",
        graft.functions.QuantizeLong.quantize_long(col("embedding"), 1000L))
      .withColumn("nrm", array_dot_long(col("qv"), col("qv")))
      .select("vec_id", "qv", "nrm").filter(col("nrm") > 0)
    val mm = quant.select(posexplode(col("qv")).as(Seq("pos", "x")))
      .groupBy("pos").agg(min("x").as("mn"), max("x").as("mx"))
      .orderBy("pos").collect()
    val mn = mm.map(_.getLong(1))
    val span = mm.map(r => r.getLong(2) - r.getLong(1))
    val mnLit = mn.map(v => s"${v}L").mkString(", ")
    val spLit = span.map(v => s"${v}L").mkString(", ")
    val DIM = 64

    // A: current shape — literal arrays indexed inside the lambda
    def encA = quant.withColumn("codes", expr(
      s"""transform(sequence(0, ${DIM - 1}), i ->
            CASE WHEN array($spLit)[i] = 0L THEN 0L
            ELSE ((qv[i] - array($mnLit)[i]) * 510L + array($spLit)[i])
                 div (2L * array($spLit)[i]) END)"""))
      .withColumn("uc", expr(
        s"zip_with(codes, array($spLit), (c, sp) -> c * sp)"))
      .withColumn("ucn", array_dot_long(col("uc"), col("uc")))
      .select("vec_id", "uc", "ucn")

    // B: pure zip_with — no per-element array indexing, no sequence
    def encB = quant
      .withColumn("am", expr(
        s"zip_with(qv, array($mnLit), (x, mn) -> x - mn)"))
      .withColumn("uc", expr(
        s"""zip_with(am, array($spLit), (a, sp) ->
              CASE WHEN sp = 0L THEN 0L
              ELSE ((a * 510L + sp) div (2L * sp)) * sp END)"""))
      .withColumn("ucn", array_dot_long(col("uc"), col("uc")))
      .select("vec_id", "uc", "ucn")

    (1 to 3).foreach { i =>
      t(s"encode A (indexed transform) rep$i") {
        encA.write.format("noop").mode("overwrite").save()
      }
    }
    (1 to 3).foreach { i =>
      t(s"encode B (zip_with only) rep$i") {
        encB.write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
