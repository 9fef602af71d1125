package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property test for the fixed-grid histogram quantile: over arbitrary
  * integral-valued grouped data, the estimate lies strictly within one
  * bin width of the rank-floor order statistic — the bound that holds
  * UNIVERSALLY. (The rank floor((n−1)·p) always falls inside the
  * winning bin, whose value range the estimate also lies in; the
  * interpolated percentile can additionally reach toward the next
  * occupied bin when the target rank straddles the winning bin's upper
  * edge, which is why the vs-interpolated bound in PercentileSketchSpec
  * carries the neighbouring-bin term and this one doesn't.) */
class PercentileSketchPropertySpec extends AnyFunSuite {

  private lazy val spark = graft.etl.TestSpark.spark
  private val bins = AdvancedOps.PCTL_SKETCH_BINS

  // distribution shapes chosen to stress the grid: dense uniform,
  // constant, two far-apart clusters (empty bins between), heavy skew
  private def shapes(seed: Long): Seq[Double] = {
    val rnd = new scala.util.Random(seed)
    (seed % 4) match {
      case 0 => Seq.fill(50 + rnd.nextInt(200))(
        rnd.nextInt(1000).toDouble)
      case 1 => Seq.fill(20 + rnd.nextInt(50))(42.0)
      case 2 =>
        val lo = Seq.fill(30 + rnd.nextInt(100))(rnd.nextInt(10).toDouble)
        val hi = Seq.fill(1 + rnd.nextInt(40))(
          (990 + rnd.nextInt(10)).toDouble)
        lo ++ hi
      case _ => Seq.fill(50 + rnd.nextInt(150))(
        math.pow(rnd.nextDouble(), 4.0).*(500).floor)
    }
  }

  test("estimate is within one bin width of the rank-floor order " +
      "statistic for arbitrary integral distributions") {
    import spark.implicits._
    (1L to 16L).foreach { seed =>
      val groups = 1 + (seed % 3).toInt
      val rows = (0 until groups).flatMap(g =>
        shapes(seed * 7 + g).map(v => (s"g$g", v)))
      val df = rows.toDF("g", "v").repartition(5)
      val mm = df.agg(min("v"), max("v")).head
      val (mn, mx) = (mm.getDouble(0), mm.getDouble(1))
      val w = (mx - mn + 1.0) / bins
      val est = AdvancedOps.sketchPercentiles(df, "g", "v", bins)
        .collect()
        .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
        .toMap
      val byG = rows.groupBy(_._1)
      est.foreach { case (g, (p50, p90)) =>
        val sorted = byG(g).map(_._2).sorted
        val n = sorted.length
        def floorStat(p: Double) =
          sorted(math.floor((n - 1) * p).toInt)
        assert(math.abs(p50 - floorStat(0.5)) < w,
          s"seed $seed $g p50: est $p50 stat ${floorStat(0.5)} w $w")
        assert(math.abs(p90 - floorStat(0.9)) < w,
          s"seed $seed $g p90: est $p90 stat ${floorStat(0.9)} w $w")
      }
    }
  }
}
