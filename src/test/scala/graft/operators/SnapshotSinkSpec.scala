package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark

/** The exactly-once streaming sink into the snapshot table — the
  * contracts the streaming_ingest_snapshot hash oracle can't state:
  * commitIfNew's txn guard applies each batchId EXACTLY once (replays
  * are recognized in metadata, before any file lands), txns of distinct
  * apps are independent, each micro-batch lands as its own linear
  * version, and re-invoking the whole stream (the restart path) drains
  * nothing and leaves the table byte-stable. */
class SnapshotSinkSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private val T = WriteOps.SnapshotTable

  test("commitIfNew applies each batchId exactly once and records the txn") {
    import spark.implicits._
    val root = Files.createTempDirectory("g_sink_txn").toString
    def frame(rows: (Long, Int, Double)*) =
      rows.toSeq.toDF("o_orderkey", "pt_year", "o_totalprice")
    T.commit(spark, root, 0, frame((1L, 1, 10.0)), Seq(1))

    assert(T.commitIfNew(spark, root, "app", 0L,
      frame((2L, 1, 20.0)), Seq(1)))
    assert(T.versions(root) === Seq(0, 1))
    assert(T.txnOf(root, 1) === Some(("app", 0L)))

    // replay of batch 0: recognized, skipped, zero new versions
    assert(!T.commitIfNew(spark, root, "app", 0L,
      frame((99L, 1, 999.0)), Seq(1)))
    assert(T.versions(root) === Seq(0, 1))
    // the replayed content never landed
    assert(!T.read(spark, root, 1).collect()
      .exists(_.getLong(0) == 99L))

    // the NEXT batch commits; lastTxn tracks the head
    assert(T.commitIfNew(spark, root, "app", 1L,
      frame((3L, 1, 30.0)), Seq(1)))
    assert(T.lastTxn(root, "app") === Some(1L))
    // a stale replay AFTER later batches is still recognized
    assert(!T.commitIfNew(spark, root, "app", 0L,
      frame((98L, 1, 0.0)), Seq(1)))
    assert(T.versions(root) === Seq(0, 1, 2))
  }

  test("txns of distinct apps are independent") {
    import spark.implicits._
    val root = Files.createTempDirectory("g_sink_apps").toString
    def frame(rows: (Long, Int, Double)*) =
      rows.toSeq.toDF("o_orderkey", "pt_year", "o_totalprice")
    T.commit(spark, root, 0, frame((1L, 1, 10.0)), Seq(1))
    assert(T.commitIfNew(spark, root, "a", 5L, frame((2L, 1, 2.0)), Seq(1)))
    // app b's batch 0 must not be shadowed by app a's batch 5
    assert(T.commitIfNew(spark, root, "b", 0L, frame((3L, 1, 3.0)), Seq(1)))
    assert(T.lastTxn(root, "a") === Some(5L))
    assert(T.lastTxn(root, "b") === Some(0L))
    assert(T.lastTxn(root, "c") === None)
  }

  test("the stream lands one version per batch and equals the one-shot merge") {
    val streamed = WriteOps.streamingSnapshotSink(spark, sf)
      .orderBy("pt_year").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq

    // one-shot shape: base with 1997 replaced by the merged upsert
    import org.apache.spark.sql.expressions.Window
    val base = Tables.orders(spark, sf).select(col("o_orderkey"),
      col("o_custkey"), col("o_totalprice"),
      year(col("o_orderdate")).as("pt_year"))
    val merged = WriteOps.upsertBatch(spark, sf).withColumn("src", lit(1))
      .unionByName(base.filter(col("pt_year") === 1997)
        .withColumn("src", lit(0)))
      .withColumn("rn", row_number().over(
        Window.partitionBy("o_orderkey").orderBy(col("src").desc)))
      .filter(col("rn") === 1).drop("rn", "src")
    val oneShot = base.filter(col("pt_year") =!= 1997)
      .unionByName(merged)
      .groupBy("pt_year")
      .agg(count(lit(1)).as("cnt"),
        countDistinct(col("o_orderkey")).as("n_keys"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("total"))
      .orderBy("pt_year").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(streamed === oneShot)
  }

  test("bronze→silver pipeline hop is exactly-once end-to-end") {
    val first = WriteOps.streamingSnapshotPipeline(spark, sf)
      .collect().toSet
    val (bronze, silver, _) = WriteOps.snapPipeState(sf)
    val silverVersions = T.versions(silver)
    // the stream built silver from its empty v0, txn-tagged per batch
    assert(silverVersions.size > 1, "the hop never landed a batch")
    silverVersions.tail.foreach { v =>
      assert(T.txnOf(silver, v).exists(_._1 == "silver"),
        s"silver v$v lost its txn record")
    }
    // silver row count equals bronze head (the hop is row-preserving)
    val bronzeRows =
      T.read(spark, bronze, T.versions(bronze).max).count()
    assert(T.read(spark, silver, silverVersions.max).count() === bronzeRows)
    // re-running the whole hop: source resumes past served bronze
    // versions, sink sees no batch — silver history unchanged
    val second = WriteOps.streamingSnapshotPipeline(spark, sf)
      .collect().toSet
    assert(T.versions(silver) === silverVersions,
      "a re-run re-landed an already-hopped batch")
    assert(first === second)
  }

  test("re-invocation takes the restart path: no new versions, table byte-stable") {
    val before = WriteOps.streamingSnapshotSink(spark, sf)
      .collect().toSet
    val (root, _) = WriteOps.snapSinkState(sf)
    val versionsBefore = T.versions(root)
    // each non-empty micro-batch landed as its own version, linearly
    assert(versionsBefore.size > 1, "the stream never committed")
    assert(versionsBefore === versionsBefore.indices.toSeq)
    // every streamed version carries its txn (v0 is the batch load)
    versionsBefore.tail.foreach { v =>
      assert(T.txnOf(root, v).exists(_._1 == "ingest"),
        s"v$v lost its txn record")
    }
    val after = WriteOps.streamingSnapshotSink(spark, sf)
      .collect().toSet
    assert(T.versions(root) === versionsBefore,
      "the restart re-committed a drained batch")
    assert(before === after)
  }
}
