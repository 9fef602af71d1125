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
}
