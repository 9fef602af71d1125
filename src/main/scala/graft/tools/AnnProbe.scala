package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for similarity search: replicates the embeddings table
  * (with per-replica perturbation so vectors stay distinct) and times
  * all-pairs near-dup vs LSH-bucketed near-dup as the corpus grows.
  * The quadratic term is the point: pairs grow 100x per 10x corpus.
  * Usage: runMain graft.tools.AnnProbe [sfDir] [replicas]
  */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import graft.functions.ArrayDotLong.array_dot_long
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val big = base.crossJoin(
        spark.range(reps).select(col("id").as("rep")))
      .select(
        (col("vec_id") * reps + col("rep")).as("vec_id"),
        expr("transform(embedding, x -> " +
             "cast(round(cast(x as double) * 1000) as bigint) + rep)")
          .as("qv"))
      .withColumn("nrm", array_dot_long(col("qv"), col("qv")))
      .filter(col("nrm") > 0).cache()
    val n = big.count()
    println(s"vectors=$n")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    def sim = col("dot").cast("double") /
      (sqrt(col("nrm_a").cast("double")) * sqrt(col("nrm_b").cast("double")))

    val a = big.select(col("vec_id").as("id_a"), col("qv").as("qv_a"),
      col("nrm").as("nrm_a"))
    val b = big.select(col("vec_id").as("id_b"), col("qv").as("qv_b"),
      col("nrm").as("nrm_b"))

    time(s"all-pairs near-dup ($n x $n)") {
      a.join(b, col("id_a") < col("id_b"))
        .withColumn("dot", array_dot_long(col("qv_a"), col("qv_b")))
        .filter(sim > 0.95)
        .select("id_a", "id_b")
        .write.format("noop").mode("overwrite").save()
    }

    // 8-hyperplane signed-random-projection buckets (same planes as
    // VectorOps), candidates only within buckets
    val planes = graft.operators.VectorOps.planes
    val bucket = planes.zipWithIndex.map { case (w, p) =>
      when(array_dot_long(col("qv"),
        expr(s"array(${w.map(x => s"${x}L").mkString(", ")})")) >= 0,
        lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _).cast("int")

    time("LSH-bucketed near-dup") {
      val e = big.withColumn("bucket", bucket)
      val ba = e.select(col("bucket"), col("vec_id").as("id_a"),
        col("qv").as("qv_a"), col("nrm").as("nrm_a"))
      val bb = e.select(col("bucket"), col("vec_id").as("id_b"),
        col("qv").as("qv_b"), col("nrm").as("nrm_b"))
      ba.join(bb, Seq("bucket")).filter(col("id_a") < col("id_b"))
        .withColumn("dot", array_dot_long(col("qv_a"), col("qv_b")))
        .filter(sim > 0.95)
        .select("id_a", "id_b")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
