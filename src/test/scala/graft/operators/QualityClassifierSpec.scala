package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark

/** The trained quality classifier's two load-bearing claims, proven on
  * the driver fixture: (1) the model actually SEPARATES — a quality
  * scorer that predicts the majority class for everything passes a
  * hash-equality oracle just fine (the oracle only checks both engines
  * train the same degenerate model), so non-degeneracy needs its own
  * assertion; (2) the trained weights are bit-identical under any
  * partitioning — the fixed-point int64 gradient reduction is what
  * makes a TRAINED model reproducible on a cluster, where reduce order
  * is nondeterministic.
  */
class QualityClassifierSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("trained model separates both classes on the fixture") {
    val rows = TextOps.queries("text_quality_classifier")(spark, sf)
      .select("y", "pred").collect()
    val (pos, neg) = rows.partition(_.getInt(0) == 1)
    assert(pos.nonEmpty && neg.nonEmpty, "fixture must carry both classes")
    val tpr = pos.count(_.getBoolean(1)).toDouble / pos.length
    val tnr = neg.count(!_.getBoolean(1)).toDouble / neg.length
    // majority-class collapse scores tnr = 0 here; the trained model
    // measured ≥ 0.88 / ≥ 0.97 across sf0.001–sf0.1
    assert(tpr >= 0.85, s"true-positive rate degenerate: $tpr")
    assert(tnr >= 0.90, s"true-negative rate degenerate: $tnr")
  }

  test("trained weights are bit-identical under any partitioning") {
    val feats = TextOps.clfFeatures(spark, sf)
    val w1 = TextOps.clfTrain(feats.repartition(1))
    val w32 = TextOps.clfTrain(feats.repartition(32))
    assert(w1.length == w32.length)
    (w1 zip w32).zipWithIndex.foreach { case ((a, b), j) =>
      assert(java.lang.Double.doubleToRawLongBits(a) ==
        java.lang.Double.doubleToRawLongBits(b),
        s"w$j differs across partitionings: $a vs $b")
    }
  }
}
