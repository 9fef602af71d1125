package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Measurement provenance for the IVF-PQ recall numbers cited in
  * VectorOps.ivfpqTopK's scaladoc and SCALE.md: recall@10 vs the exact
  * integer-L2 top-10, at the default knobs and across the rerank
  * shortlist sizes. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.ArrayDotLong.array_dot_long
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val e = spark.read.parquet(s"$d/embeddings.parquet")
        .withColumn("qv", graft.functions.QuantizeLong
          .quantize_long(col("embedding"), 1000L))
        .withColumn("nrm", array_dot_long(col("qv"), col("qv")))
        .select("vec_id", "qv", "nrm").filter(col("nrm") > 0)
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("qv").as("qqv"),
          col("nrm").as("qnrm"))
      val l2 = e.join(broadcast(q), col("vec_id") =!= col("qid"))
        .withColumn("dist", col("nrm") -
          lit(2L) * array_dot_long(col("qqv"), col("qv")) + col("qnrm"))
        .withColumn("rn", row_number().over(Window.partitionBy("qid")
          .orderBy(col("dist").asc, col("vec_id").asc)))
        .filter(col("rn") <= 10).select("qid", "vec_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def recall(rr: Int): Double = {
        val got = graft.operators.VectorOps.ivfpqTopK(spark, d, rerank = rr)
          .select("qid", "vec_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        got.intersect(l2).size.toDouble / l2.size
      }
      // rerank=10 re-ranks within ADC's own top-10, so its SET (and
      // therefore recall@10) is exactly the ADC-only ordering's
      for (rr <- Seq(10, 40, 100, 200))
        println(f"[probe] $d rerank=$rr%3d recall@10 = ${recall(rr)}%.2f")
    }
  }
}
