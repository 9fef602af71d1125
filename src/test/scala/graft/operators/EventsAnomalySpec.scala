package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Properties of events_anomaly_robust the row-level oracle doesn't
  * state: the med/mad columns match an independent in-JVM computation
  * of the same (n−1)·p interpolated percentiles, the flag separates
  * (both classes occur), and robust_z reconstructs from its inputs. */
class EventsAnomalySpec extends AnyFunSuite {

  private lazy val spark = graft.etl.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  // the standard (n−1)·p linear interpolation both engines implement
  private def pctl(xs: Array[Double], p: Double): Double = {
    val s = xs.sorted
    val pos = (s.length - 1) * p
    val lo = pos.toInt
    if (lo == s.length - 1) s(lo)
    else s(lo) + (pos - lo) * (s(lo + 1) - s(lo))
  }

  private lazy val rows = graft.SparkEntry
    .queries("events_anomaly_robust")(spark, sf).collect()

  test("med and mad match an independent interpolated-percentile calc") {
    val byType = rows.groupBy(_.getString(1))
    assert(byType.nonEmpty)
    byType.foreach { case (_, tr) =>
      val values = tr.map(_.getDouble(2))
      val med = tr.head.getDouble(3)
      val mad = tr.head.getDouble(4)
      assert(tr.forall(r => r.getDouble(3) == med && r.getDouble(4) == mad))
      assert(med == pctl(values, 0.5), "median diverged from in-JVM calc")
      assert(mad == pctl(values.map(v => math.abs(v - med)), 0.5),
        "MAD diverged from in-JVM calc")
    }
  }

  test("robust_z reconstructs exactly and the flag separates") {
    rows.foreach { r =>
      val z = (r.getDouble(2) - r.getDouble(3)) / (1.4826 * r.getDouble(4))
      assert(r.getDouble(5) == z)
      assert(r.getBoolean(6) == (math.abs(z) > 3.0))
    }
    assert(rows.exists(_.getBoolean(6)), "no outliers flagged")
    assert(rows.exists(!_.getBoolean(6)), "everything flagged")
    // heavy-tail sanity: the flagged fraction is a tail, not a half
    val frac = rows.count(_.getBoolean(6)).toDouble / rows.length
    assert(frac > 0 && frac < 0.1, s"outlier fraction $frac not tail-like")
  }
}
