package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark

/** Properties of the near-dup connected-components operator that the
  * row-level oracle can't express as clearly: transitivity and label
  * canonicality. */
class DedupClustersSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("pair endpoints share a cluster; labels are component minima") {
    val labels = DedupOps.minhashClusters(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = DedupOps.minhashPairs(spark, sf)
      .filter(org.apache.spark.sql.functions.col("jaccard") >= 0.5)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture should contain true near-dups")
    // endpoints of every verified pair carry the same label
    pairs.foreach { case (a, b) =>
      assert(labels(a) == labels(b), s"pair ($a,$b) split across clusters")
    }
    // a label is the min doc_id of its member set (canonical choice)
    labels.groupBy(_._2).foreach { case (label, members) =>
      assert(members.keys.min == label,
        s"cluster $label not labeled by its min member")
    }
    // transitivity probe: union-find over pairs must agree with the
    // distributed propagation
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    pairs.flatMap(p => Seq(p._1, p._2)).distinct.foreach { doc =>
      val expected = find(doc)
      assert(labels(doc) == expected,
        s"doc $doc: distributed label ${labels(doc)} != union-find $expected")
    }
  }

  test("deep propagation converges with a lineage-bounded plan") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // a 12-node path graph: min label 0 travels one hop per sweep, so
    // convergence needs 11 sweeps — far past CHECKPOINT_EVERY
    val fwd = (0L until 11L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val edges = fwd.union(
      fwd.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
    val nodes = (0L until 12L).toDF("doc_id")
    val labels = DedupOps.propagateLabels(edges, nodes, maxIters = 20)
    val out = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 12 && out.values.forall(_ == 0L),
      s"path graph must collapse to cluster 0: $out")
    // lineage is truncated by the periodic localCheckpoint: the final
    // frame derives from a checkpointed RDD (LogicalRDD leaf), not an
    // 11-sweep join tower
    val plan = labels.queryExecution.optimizedPlan.toString
    assert(plan.contains("LogicalRDD") || plan.contains("ExistingRDD"),
      plan)
    val depth = plan.linesIterator.size
    assert(depth < 40,
      s"optimized plan has $depth lines — lineage not truncated:\n$plan")
  }
}

/** The sweep-frame lifecycle: localCheckpoint blocks are freed via the
  * physical RDD (Dataset.unpersist is a no-op for them), so repeated
  * cluster runs must not accumulate persisted RDDs. */
class ClusterStorageLifecycleSpec extends AnyFunSuite {

  private lazy val spark = graft.etl.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("repeated runs do not grow executor storage") {
    DedupOps.minhashClusters(spark, sf).count() // warm (band idx memoizes)
    val after1 = spark.sparkContext.getPersistentRDDs.size
    DedupOps.minhashClusters(spark, sf).count()
    DedupOps.minhashClusters(spark, sf).count()
    val after3 = spark.sparkContext.getPersistentRDDs.size
    assert(after3 <= after1 + 1,
      s"persistent RDDs grew $after1 -> $after3 across reruns")
  }
}

/** The leakage-safe split's defining property: no verified near-dup
  * pair ever straddles the train/test boundary. */
class LeakageSafeSplitSpec extends AnyFunSuite {

  private lazy val spark = graft.etl.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("no near-dup pair straddles the split; both sides populated") {
    import org.apache.spark.sql.functions._
    val split = graft.SparkEntry.queries("sample_leakage_safe_split")(
      spark, sf).select("doc_id", "split")
    val pairs = DedupOps.minhashPairs(spark, sf)
      .filter(col("jaccard") >= 0.5).select("doc_a", "doc_b")
    val straddlers = pairs
      .join(split.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("split", "sa"), Seq("doc_a"))
      .join(split.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("split", "sb"), Seq("doc_b"))
      .filter(col("sa") =!= col("sb")).count()
    assert(straddlers == 0, s"$straddlers near-dup pairs leak across split")
    val bySide = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySide.getOrElse("train", 0L) > 0 &&
      bySide.getOrElse("test", 0L) > 0, bySide.toString)
  }

  test("the cluster assignment is a memoized artifact shared by both " +
      "consumers") {
    val key = DedupOps.clustersKey(sf, 2, DedupOps.K, DedupOps.BANDS,
      0.5, 20)
    graft.core.SessionMemo.remove(spark, key)
    DedupOps.minhashClusters(spark, sf).count()
    val first = graft.core.SessionMemo.get(spark, key)
    assert(first.isDefined, "clusters gate did not persist its artifact")
    // the split gate consumes the SAME persisted frame, no recompute
    graft.SparkEntry.queries("sample_leakage_safe_split")(spark, sf)
      .count()
    assert(graft.core.SessionMemo.get(spark, key).get eq first.get,
      "leakage split rebuilt the cluster assignment")
  }
}
