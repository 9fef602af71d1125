package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.VectorOps

/** Measurement provenance for the TRAIN_ITERS choice on the oracled
  * trained-centroid IVF path: corpus recall@10 (5 queries × k=10 → max
  * 50 overlapping ids vs brute force) for the seed cells and for the
  * k-means quantizer at each sweep count. The gate's sweep count must
  * land where trained ≥ seed — the monitored claim a quantizer rollout
  * makes (ann_recall_report.trained_ge_seed). */
object TrainedIvfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val bf = VectorOps.bruteforceTopK(spark, d, 10)
        .select("qid", "vec_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def overlapN(cents: Option[org.apache.spark.sql.DataFrame],
          nlist: Int, nprobe: Int): Int =
        VectorOps.ivfTopK(spark, d, nlist = nlist, nprobe = nprobe,
            centroids = cents)
          .select("qid", "vec_id")
          .collect().map(r => (r.getLong(0), r.getLong(1)))
          .toSet.intersect(bf).size
      def overlap(cents: Option[org.apache.spark.sql.DataFrame]): Int =
        overlapN(cents, VectorOps.NLIST, VectorOps.NPROBE)
      // equal-scan-budget sweep: finer trained quantizer, same expected
      // corpus fraction scanned (nprobe/nlist = 1/4)
      for ((nl, np) <- Seq((32, 8), (64, 16));
           iters <- Seq(1, 2, 4)) {
        val c = VectorOps.kmeansCentroidFrame(spark, d, nl, iters)
        println(f"[probe] $d trained nlist=$nl%2d nprobe=$np%2d iters=$iters overlap = ${overlapN(Some(c), nl, np)}%2d / ${bf.size}")
      }
      println(f"[probe] $d seed      overlap = ${overlap(None)}%2d / ${bf.size}")
      for (iters <- 1 to 8) {
        val c = VectorOps.kmeansCentroidFrame(spark, d, VectorOps.NLIST, iters)
        println(f"[probe] $d plain  iters=$iters%d overlap = ${overlap(Some(c))}%2d / ${bf.size}")
      }
      // spherical variant: renormalize each mean back to the quantization
      // sphere (norm = SCALE) so cnrm is uniform and assignment ranks by
      // dot alone — the cosine-correct coarse quantizer
      import spark.implicits._
      import org.apache.spark.sql.functions.{array_join => _, col => fcol}
      import graft.functions.ArrayDotLong.array_dot_long
      for (iters <- 1 to 8) {
        val raw = VectorOps.kmeansCentroids(spark, d, VectorOps.NLIST, iters)
        val sph = raw.map { cvec =>
          val n = math.sqrt(cvec.map(x => x * x).sum)
          if (n == 0) cvec else cvec.map(x => x * 1000.0 / n)
        }
        val frame = sph.zipWithIndex.toSeq
          .map { case (cv, i) => (i.toLong, cv.map(math.round).toSeq) }
          .toDF("cid", "cqv")
          .withColumn("cnrm", array_dot_long(fcol("cqv"), fcol("cqv")))
        println(f"[probe] $d sphere iters=$iters%d overlap = ${overlap(Some(frame))}%2d / ${bf.size}")
      }
      // farthest-point (Gonzalez) init: maximally spread seeds, then
      // 0..4 plain L2 sweeps from that init
      val ecorp = spark.read.parquet(s"$d/embeddings.parquet")
        .withColumn("qv", graft.functions.QuantizeLong
          .quantize_long(fcol("embedding"), 1000L))
        .withColumn("nrm", array_dot_long(fcol("qv"), fcol("qv")))
        .filter(fcol("nrm") > 0)
        .select(fcol("vec_id"),
          org.apache.spark.sql.functions.expr(
            "transform(qv, x -> cast(x as double))").as("v"))
        .cache()
      def gonzalez(k: Int): Array[Array[Double]] = {
        import org.apache.spark.sql.functions._
        var cents = List(ecorp.filter(fcol("vec_id") === 0)
          .collect()(0).getSeq[Double](1).toArray)
        while (cents.length < k) {
          val centsLit = array(cents.map(c => array(c.map(lit): _*)): _*)
          val far = ecorp.withColumn("cents", centsLit)
            .withColumn("md", expr(
              """array_min(transform(cents, c ->
                   aggregate(zip_with(v, c, (a, b) -> (a - b) * (a - b)),
                             cast(0.0 as double), (acc, x) -> acc + x)))"""))
            .orderBy(fcol("md").desc, fcol("vec_id").asc).limit(1)
            .collect()(0)
          cents = cents :+ far.getSeq[Double](1).toArray
        }
        cents.toArray
      }
      val g0 = gonzalez(VectorOps.NLIST)
      def centFrame(cs: Array[Array[Double]]) =
        cs.zipWithIndex.toSeq
          .map { case (cv, i) => (i.toLong, cv.map(math.round).toSeq) }
          .toDF("cid", "cqv")
          .withColumn("cnrm", array_dot_long(fcol("cqv"), fcol("cqv")))
      println(f"[probe] $d gonzalez iters=0 overlap = ${overlap(Some(centFrame(g0)))}%2d / ${bf.size}")
    }
    spark.stop()
  }
}
