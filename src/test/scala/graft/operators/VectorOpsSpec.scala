package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark

/** Properties of the ANN family the DuckDB oracle can't express:
  * approximation quality of the probe-limited IVF search relative to
  * the exact brute-force scan.
  */
class VectorOpsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def topk(name: String): Map[Long, Seq[Long]] =
    VectorOps.queries(name)(spark, sf)
      .select("qid", "vec_id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .groupBy(_._1)
      .map { case (q, rows) =>
        q -> rows.sortBy(_._3).map(_._2).toSeq
      }

  test("IVF probe-limited top-10 recalls most of the exact top-10") {
    val exact = topk("ann_bruteforce_topk")
    val ivf = topk("ann_ivf_topk")
    assert(exact.keySet == ivf.keySet)
    assert(exact.nonEmpty)
    val recalls = exact.keys.toSeq.map { q =>
      val hit = ivf(q).toSet.intersect(exact(q).toSet).size
      hit.toDouble / exact(q).size
    }
    val mean = recalls.sum / recalls.size
    // NPROBE=4 of NLIST=16 cells; random-projection-free integer IVF on
    // synthetic embeddings should still recover well over half the
    // exact neighbours on average.
    assert(mean >= 0.5, s"mean recall@10 $mean too low: $recalls")
  }

  test("k-means: deterministic, objective never regresses, k centroids") {
    val c0 = VectorOps.kmeansCentroids(spark, sf, k = 8, iters = 0)
    val c2 = VectorOps.kmeansCentroids(spark, sf, k = 8, iters = 2)
    val c2b = VectorOps.kmeansCentroids(spark, sf, k = 8, iters = 2)
    assert(c2.length == 8 && c2.forall(_.length == 64))
    // determinism: identical runs, bit for bit
    assert(c2.zip(c2b).forall { case (a, b) => a.sameElements(b) })
    // Lloyd's objective is monotone non-increasing
    val w0 = VectorOps.wcss(spark, sf, c0)
    val w2 = VectorOps.wcss(spark, sf, c2)
    assert(w2 <= w0 + 1e-6, s"wcss regressed: $w0 -> $w2")
    assert(w2 < w0, "two sweeps should actually improve the seeds here")
  }

  test("IVF candidates are a subset of the corpus and self-free") {
    val ivf = VectorOps.queries("ann_ivf_topk")(spark, sf)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(ivf.forall { case (q, v) => q != v })
    assert(ivf.distinct.length == ivf.length)
  }

  test("more LSH planes shrink the max bucket (the neardup re-balance knob)") {
    val sf01 = "/root/testdata/sf0.01"
    def maxBucket(nplanes: Int): Long =
      VectorOps.lshBuckets(spark, sf01, nplanes)
        .groupBy("bucket").count()
        .agg(org.apache.spark.sql.functions.max("count"))
        .collect()(0).getLong(0)
    val coarse = maxBucket(4)
    val fine = maxBucket(12)
    assert(fine < coarse,
      s"nplanes 4 -> 12 should shrink the max bucket, got $coarse -> $fine")
  }

  test("IVF with trained k-means centroids: recall@10 >= 0.9 vs brute force") {
    val sf01 = "/root/testdata/sf0.01"
    val cents = VectorOps.kmeansCentroidFrame(spark, sf01, k = 16, iters = 2)
      .persist()
    assert(cents.count() == 16)
    def asMap(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
      df.select("qid", "vec_id", "rn").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .groupBy(_._1)
        .map { case (q, rows) => q -> rows.sortBy(_._3).map(_._2).toSeq }
    val exact = asMap(VectorOps.bruteforceTopK(spark, sf01))
    val ivf = asMap(VectorOps.ivfTopK(spark, sf01, nprobe = 8,
      centroids = Some(cents)))
    cents.unpersist()
    assert(exact.keySet == ivf.keySet && exact.nonEmpty)
    val recalls = exact.keys.toSeq.map { q =>
      ivf(q).toSet.intersect(exact(q).toSet).size.toDouble / exact(q).size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean recall@10 $mean with kmeans quantizer: $recalls")
  }

  test("SQ8 8-bit codes recall nearly all of the exact top-10") {
    val exact = topk("ann_bruteforce_topk")
    val sq = topk("ann_sq8_topk")
    assert(exact.keySet == sq.keySet && exact.nonEmpty)
    val recalls = exact.keys.toSeq.map { q =>
      sq(q).toSet.intersect(exact(q).toSet).size.toDouble / exact(q).size
    }
    val mean = recalls.sum / recalls.size
    // 8 bits/dim is near-lossless relative to the int64 grid (the
    // per-dim span here is ~1000 grid steps → quantization error per
    // dim ≤ 2 steps); cosine vs L2 ranking differences cost a little
    assert(mean >= 0.8, s"mean SQ8 recall@10 $mean: $recalls")
  }

  test("semantic dedup: per-cell lowest id always kept; tau is monotone") {
    val sf01 = "/root/testdata/sf0.01"
    def report(tau: Double) =
      VectorOps.semanticDedup(spark, sf01, tau = tau)
        .select("vec_id", "cell", "nn_lower_sim", "is_dup", "keep")
        .collect()
    val rows = report(0.4)
    assert(rows.nonEmpty)
    // keep is the complement of is_dup, row by row
    assert(rows.forall(r => r.getBoolean(4) == !r.getBoolean(3)))
    // the lowest vec_id of every cell has no lower-id neighbour: null
    // sim, never a duplicate
    val cellMin = rows.groupBy(_.getLong(1))
      .map { case (_, rs) => rs.minBy(_.getLong(0)) }
    assert(cellMin.forall(r => r.isNullAt(2) && !r.getBoolean(3)))
    // raising tau never marks MORE vectors duplicate; tau=0.99 marks none
    def dups(tau: Double) = report(tau)
      .filter(_.getBoolean(3)).map(_.getLong(0)).toSet
    val loose = dups(0.3)
    val tight = dups(0.45)
    assert(tight.subsetOf(loose),
      s"tau 0.3 -> 0.45 gained dups: ${tight -- loose}")
    assert(dups(0.99).isEmpty,
      "near-orthogonal synthetic corpus cannot contain 0.99-cosine dups")
  }

  test("more minhash bands recall at least the candidates of fewer bands") {
    val sf01 = "/root/testdata/sf0.01"
    def pairSet(bands: Int): Set[(Long, Long)] =
      graft.operators.DedupOps.minhashPairs(spark, sf01, bands = bands)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val coarse = pairSet(4) // 2 rows per band
    val fine = pairSet(8) // 1 row per band: strictly easier to agree
    assert(coarse.subsetOf(fine),
      s"bands=4 produced pairs missing at bands=8: ${coarse -- fine}")
    assert(fine.size >= coarse.size)
  }
}
