package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark

/** stats_drift_chi2 contracts the hash oracle can't state: a genuine
  * distribution shift flags, an identical distribution doesn't, mass
  * landing in a reference-empty bin is loud but finite (Laplace
  * smoothing), and the fold is invariant to the physical order the
  * histogram rows arrive in. */
class StatsDriftSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val bins = AdvancedOps.PCTL_SKETCH_BINS

  // dense (g, bin, r, o) frame from per-bin count maps
  private def frame(r: Map[Int, Long], o: Map[Int, Long]) = {
    import spark.implicits._
    (0 until bins).map(b =>
      ("g", b.toLong, r.getOrElse(b, 0L), o.getOrElse(b, 0L)))
      .toDF("g", "bin", "r", "o")
  }

  private def audit(r: Map[Int, Long], o: Map[Int, Long]) =
    AdvancedOps.chi2Of(spark, frame(r, o), "g", bins).collect()(0)

  test("identical distributions do not flag") {
    val uniform = (0 until bins).map(_ -> 100L).toMap
    val row = audit(uniform, uniform)
    assert(row.getLong(1) === bins * 100L)
    assert(row.getLong(2) === bins * 100L)
    assert(row.getDouble(3) < 103.0, s"chi2 ${row.getDouble(3)}")
    assert(!row.getBoolean(4))
  }

  test("a genuine shift flags") {
    val ref = (0 until bins).map(_ -> 100L).toMap
    // all observed mass in the top quarter of the grid
    val obs = (48 until bins).map(_ -> 400L).toMap
    val row = audit(ref, obs)
    assert(row.getDouble(3) > 103.0, s"chi2 ${row.getDouble(3)}")
    assert(row.getBoolean(4))
  }

  test("mass in a reference-empty bin is loud but finite (smoothing)") {
    val ref = Map(0 -> 1000L)
    val obs = Map(63 -> 1000L)
    val row = audit(ref, obs)
    assert(!row.getDouble(3).isNaN && !row.getDouble(3).isInfinite)
    assert(row.getBoolean(4))
  }

  test("fold is invariant to histogram row order") {
    val ref = (0 until bins).map(b => b -> (100L + b)).toMap
    val obs = (0 until bins).map(b => b -> (300L - b)).toMap
    val a = AdvancedOps.chi2Of(spark, frame(ref, obs), "g", bins)
      .collect()(0).getDouble(3)
    val b = AdvancedOps.chi2Of(spark,
        frame(ref, obs).orderBy(org.apache.spark.sql.functions
          .col("bin").desc).repartition(7),
        "g", bins)
      .collect()(0).getDouble(3)
    assert(a === b)
  }

  test("empty arrival slice yields chi2 = 0, not NaN") {
    val ref = (0 until bins).map(_ -> 100L).toMap
    val row = audit(ref, Map.empty)
    assert(row.getLong(2) === 0L)
    assert(row.getDouble(3) === 0.0, s"chi2 ${row.getDouble(3)}")
    assert(!row.getBoolean(4))
  }

  test("gate runs on the fixture: one audit row per return flag") {
    val rows = AdvancedOps.statsDriftChi2(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) > 0)
      assert(!r.getDouble(3).isNaN)
    }
  }
}
