package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark

/** Validated promotion of the trained IVF quantizer
  * (VectorOps.deployedCentroids): the rollout gate must PROMOTE the
  * k-means candidate when the corpus has cluster structure the seed
  * cells miss, and REFUSE it on the structureless synthetic corpus
  * where training regresses recall (tools/TrainedIvfProbe's table).
  *
  * The clustered fixture is adversarial for seed cells by
  * construction: every query's true neighbours hide in cells whose
  * seed centroids are orthogonal to the query (all non-self seeds tie
  * at dot 0, so the probe ranking degenerates to cid order and misses
  * them), while two sweeps of k-means pull each cell's centroid toward
  * the query mass inside it, making the right cells probe-able. */
class TrainedPromotionSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val DIM = 64

  /** Unit vector fixture corpus, written as <dir>/embeddings.parquet:
    *  - vec_id 0..4   queries q_i = e_i (also the first 5 seed cells)
    *  - vec_id 5..15  seed-cell anchors e_5..e_15
    *  - vec_id 16..65 neighbours: for query i, 10 vectors
    *                  0.5*e_i + 0.866*e_j (+tiny e_t jitter), j one of
    *                  the two cells {5+2i, 6+2i} — nearest seed is e_j
    *                  (0.866 > 0.5), so seed assignment hides them
    *  - vec_id 66..   10 bulk members 0.9*e_j + 0.44*e_t per cell j
    */
  private lazy val clusteredDir: String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_promo").toString
    def unit(parts: (Int, Double)*): Array[Float] = {
      val v = new Array[Double](DIM)
      parts.foreach { case (i, x) => v(i) += x }
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val rows = scala.collection.mutable.ArrayBuffer[(Long, Array[Float], Int)]()
    (0 until 5).foreach(i => rows += ((i.toLong, unit(i -> 1.0), i)))
    (5 until 16).foreach(j => rows += ((j.toLong, unit(j -> 1.0), j)))
    var id = 16L
    for (i <- 0 until 5; t <- 0 until 10) {
      val j = 5 + 2 * i + (t % 2)
      rows += ((id, unit(i -> 0.5, j -> 0.866, (30 + t) -> 0.02), j))
      id += 1
    }
    for (j <- 5 until 16; t <- 0 until 10) {
      rows += ((id, unit(j -> 0.9, (40 + t) -> 0.44), j))
      id += 1
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    spark.createDataFrame(
        spark.sparkContext.parallelize(
          rows.toSeq.map { case (v, e, l) => Row(v, e.toSeq, l) }, 2),
        schema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def report(d: String): Map[String, Any] = {
    val r = VectorOps.recallReport(spark, d).collect().head
    r.schema.fieldNames.zip(r.toSeq).toMap
  }

  test("clustered corpus: training wins validation and is promoted") {
    val (deployed, trained, promoted) =
      VectorOps.deployedCentroids(spark, clusteredDir)
    assert(promoted, "k-means must win on clustered data")
    assert(deployed.zip(trained).forall { case (a, b) =>
      a._1 == b._1 && a._2.sameElements(b._2) && a._3 == b._3
    }, "deployed index must BE the trained candidate when promoted")
    val rep = report(clusteredDir)
    assert(rep("promoted") == true)
    assert(rep("deployed_ge_seed") == true)
    val dep = rep("corpus_overlap").asInstanceOf[Long]
    val seed = rep("corpus_overlap_seed").asInstanceOf[Long]
    assert(dep > seed,
      s"trained must STRICTLY beat seed here (deployed=$dep seed=$seed)")
    assert(dep >= 40, s"trained recall should be near-perfect, got $dep/50")
    assert(seed <= 25, s"seed cells should miss most neighbours, got $seed/50")
  }

  test("structureless corpus: rollout guard refuses the regression") {
    val d = "/root/testdata/sf0.001"
    val (deployed, trained, promoted) =
      VectorOps.deployedCentroids(spark, d)
    assert(!promoted,
      "k-means has nothing to learn on the near-orthogonal corpus")
    assert(!deployed.zip(trained).forall { case (a, b) =>
      a._2.sameElements(b._2)
    }, "deployed must be the seed incumbent, not the refused candidate")
    val rep = report(d)
    assert(rep("promoted") == false)
    assert(rep("deployed_ge_seed") == true)
    assert(rep("corpus_overlap") == rep("corpus_overlap_seed"),
      "deployed arm IS the seed arm when promotion is refused")
  }
}
