package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property test for data skipping: over adversarial column contents
  * (negative longs, full-range doubles, unicode strings spanning the
  * UTF-16/UTF-8 ordering divergence) and arbitrary range predicates,
  * the PRUNED read equals the FULL read + filter — skipping may drop
  * files, never rows. This is the safety property the whole layer
  * rests on; the comparator subtleties it guards: signed long parsing,
  * double bounds, and parquet's unsigned-UTF-8 string order. */
class DataSkippingPropertySpec extends AnyFunSuite {

  private lazy val spark = graft.etl.TestSpark.spark
  private val T = WriteOps.SnapshotTable

  // string pool crossing the UTF-16 vs UTF-8 order divergence: BMP
  // high code units (U+FF5A), supplementary plane (emoji), ascii,
  // empty-ish, and multi-byte accents
  private val pool = Vector("", "a", "zzz", "ｚ", "éclair",
    new String(Character.toChars(0x1F600)), "Zebra", "~tilde",
    "ࠀblock", "last")

  private def randomRows(seed: Long): Seq[(Long, Double, String)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(200 + rnd.nextInt(300))((
      rnd.nextLong() % 10000L, // negative and positive
      (rnd.nextDouble() - 0.5) * 2e6,
      pool(rnd.nextInt(pool.size)) + rnd.nextInt(100)))
  }

  test("pruned == full + filter over adversarial data and random ranges") {
    import spark.implicits._
    (1L to 6L).foreach { seed =>
      val rnd = new scala.util.Random(seed * 7919)
      val root = Files.createTempDirectory(s"g_skipprop_$seed").toString
      val df = randomRows(seed).toDF("l", "d", "s")
        .withColumn("pt_year", lit(1))
        .repartitionByRange(5, col("l"))
      T.commit(spark, root, 0, df, Seq(1))
      val full = T.read(spark, root, 0)

      // random long range (possibly inverted → empty; possibly open)
      val a = rnd.nextLong() % 12000L
      val b = rnd.nextLong() % 12000L
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      val expectL = full.filter(col("l") >= lo && col("l") <= hi).count()
      assert(T.readWhere(spark, root, 0,
        Seq(("l", lo, hi))).count() === expectL,
        s"seed $seed long range [$lo,$hi]")

      // random double range
      val (x, y) = {
        val p = (rnd.nextDouble() - 0.5) * 2e6
        val q = (rnd.nextDouble() - 0.5) * 2e6
        (math.min(p, q), math.max(p, q))
      }
      val expectD = full.filter(col("d") >= x && col("d") <= y).count()
      assert(T.readWhere(spark, root, 0,
        Seq(("d", x, y))).count() === expectD,
        s"seed $seed double range [$x,$y]")

      // random string range drawn from the pool (unsigned-UTF-8 cases)
      val (s1, s2) = (pool(rnd.nextInt(pool.size)),
        pool(rnd.nextInt(pool.size)))
      val (slo, shi) =
        if (s1 <= s2) (s1, s2) else (s2, s1) // Java order for the BOUNDS
      val expectS = full.filter(col("s") >= slo && col("s") <= shi).count()
      assert(T.readWhere(spark, root, 0,
        Seq(("s", slo, shi))).count() === expectS,
        s"seed $seed string range [$slo,$shi]")

      // one-sided + conjunctive
      val expectC = full.filter(col("l") >= lo && col("d") <= y).count()
      assert(T.readWhere(spark, root, 0,
        Seq(("l", lo, null), ("d", null, y))).count() === expectC,
        s"seed $seed conjunctive")
      T.deleteTree(root)
    }
  }
}
