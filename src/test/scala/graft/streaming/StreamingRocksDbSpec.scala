package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark
import graft.operators.EventOps

/** The streaming replay gates on the PRODUCTION state-store backend:
  * at 100 TB of stream state the HDFS-backed in-memory provider (the
  * default, which must hold every store's full map on-heap) is
  * replaced by RocksDB — state lives off-heap/on-disk with changelog
  * checkpointing. The replay results must be backend-invariant, and
  * the restart path (offset-log recovery + RocksDB state reload from
  * the checkpoint) must produce the identical sink.
  *
  * The RocksDB runs use variant-suffixed checkpoints: the two
  * providers' on-disk state formats are incompatible, so restarting a
  * default-provider checkpoint under RocksDB is not a supported
  * transition — a real migration replays from the source, which is
  * exactly what the variant checkpoint does. */
class StreamingRocksDbSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private val ROCKS = "org.apache.spark.sql.execution.streaming.state." +
    "RocksDBStateStoreProvider"

  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key, ROCKS)
    try body
    finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def stateFiles(ckpt: Path): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val state = ckpt.resolve("state")
    if (!Files.exists(state)) Seq.empty
    else {
      val s = Files.walk(state)
      try s.iterator().asScala.filter(Files.isRegularFile(_))
        .map(_.getFileName.toString).toSeq
      finally s.close()
    }
  }

  test("streaming_replay_dedup: RocksDB result identical, state is " +
      "RocksDB-format, restart from checkpoint reproduces it") {
    val base = rows(EventOps.dedupReplay(spark, sf))
    assert(base.nonEmpty)
    val rocks = withRocksDb {
      rows(EventOps.dedupReplay(spark, sf, "_rocksdb"))
    }
    assert(rocks == base, "dedup result must be state-backend-invariant")
    val ckpt = EventOps.replayCkptPath(sf, "dedup_rocksdb")
      .getOrElse(fail("rocksdb variant checkpoint not registered"))
    val files = stateFiles(ckpt)
    // RocksDB checkpoints version as <v>.zip (+ optional .changelog);
    // the HDFS-backed provider writes <v>.delta/<v>.snapshot
    assert(files.exists(f => f.endsWith(".zip") || f.endsWith(".changelog")),
      s"expected RocksDB state artifacts under $ckpt, got: $files")
    assert(!files.exists(_.endsWith(".delta")),
      s"HDFS-backed provider artifacts leaked into the RocksDB run: $files")
    // restart: a fresh StreamingQuery over the same checkpoint — offset
    // log replays, RocksDB store reloads, no-new-data pass, same sink
    val again = withRocksDb {
      rows(EventOps.dedupReplay(spark, sf, "_rocksdb"))
    }
    assert(again == base, "restart from RocksDB checkpoint must be a no-op")
  }

  test("streaming_replay_sessions: merging session-window state " +
      "identical under RocksDB, restart reproduces it") {
    // session windows are the largest state shape (state MERGES as
    // events arrive, instead of accumulating per fixed key), so this is
    // the one most worth proving on the production store
    val base = rows(EventOps.sessionsReplay(spark, sf))
    assert(base.nonEmpty)
    val rocks = withRocksDb {
      rows(EventOps.sessionsReplay(spark, sf, "_rocksdb"))
    }
    assert(rocks == base,
      "session-window result must be state-backend-invariant")
    val ckpt = EventOps.replayCkptPath(sf, "sessions_rocksdb")
      .getOrElse(fail("rocksdb variant checkpoint not registered"))
    val files = stateFiles(ckpt)
    assert(files.exists(f => f.endsWith(".zip") || f.endsWith(".changelog")),
      s"expected RocksDB state artifacts under $ckpt, got: $files")
    assert(!files.exists(_.endsWith(".delta")),
      s"HDFS-backed provider artifacts leaked into the RocksDB run: $files")
    val again = withRocksDb {
      rows(EventOps.sessionsReplay(spark, sf, "_rocksdb"))
    }
    assert(again == base,
      "restart from RocksDB checkpoint must be a no-op")
  }

  test("streaming_replay_tumbling: windowed agg identical under " +
      "RocksDB, restart reproduces it") {
    val base = rows(EventOps.tumblingReplay(spark, sf))
    assert(base.nonEmpty)
    val rocks = withRocksDb {
      rows(EventOps.tumblingReplay(spark, sf, "_rocksdb"))
    }
    assert(rocks == base,
      "tumbling-window result must be state-backend-invariant")
    val again = withRocksDb {
      rows(EventOps.tumblingReplay(spark, sf, "_rocksdb"))
    }
    assert(again == base,
      "restart from RocksDB checkpoint must be a no-op")
  }

  test("streaming_replay_join: two-sided stream-stream join state " +
      "identical under RocksDB, restart reproduces it") {
    val base = rows(EventOps.joinReplay(spark, sf))
    assert(base.nonEmpty)
    val rocks = withRocksDb {
      rows(EventOps.joinReplay(spark, sf, "_rocksdb"))
    }
    assert(rocks == base,
      "stream-stream join result must be state-backend-invariant")
    val ckpt = EventOps.replayCkptPath(sf, "join_rocksdb")
      .getOrElse(fail("rocksdb variant checkpoint not registered"))
    val files = stateFiles(ckpt)
    assert(files.exists(f => f.endsWith(".zip") || f.endsWith(".changelog")),
      s"expected RocksDB state artifacts under $ckpt, got: $files")
    val again = withRocksDb {
      rows(EventOps.joinReplay(spark, sf, "_rocksdb"))
    }
    assert(again == base,
      "restart from RocksDB checkpoint must be a no-op")
  }

  test("streaming_statementset_stateful: the shared-aggregation " +
      "fan-out identical under RocksDB, restart reproduces both sinks") {
    val base = rows(EventOps.statefulSetReplay(spark, sf))
    assert(base.nonEmpty)
    val rocks = withRocksDb {
      rows(EventOps.statefulSetReplay(spark, sf, "_rocksdb"))
    }
    assert(rocks == base,
      "stateful statement set must be state-backend-invariant")
    // the statement set's checkpoint lives INSIDE its sink root
    val sink = EventOps.replaySinkPath(sf, "statefulset_rocksdb")
      .getOrElse(fail("rocksdb variant sink not registered"))
    val files = stateFiles(sink.resolve("_checkpoints/__stateful_set"))
    assert(files.exists(f => f.endsWith(".zip") || f.endsWith(".changelog")),
      s"expected RocksDB state artifacts under $sink, got: $files")
    val again = withRocksDb {
      rows(EventOps.statefulSetReplay(spark, sf, "_rocksdb"))
    }
    assert(again == base,
      "restart from RocksDB checkpoint must be a no-op")
  }

  test("streaming_replay_upsert: CDC apply identical under RocksDB, " +
      "restart keeps the versioned table converged") {
    val base = rows(EventOps.upsertReplayGate(spark, sf))
    assert(base.nonEmpty)
    val rocks = withRocksDb {
      rows(EventOps.upsertReplayGate(spark, sf, "_rocksdb"))
    }
    assert(rocks == base, "CDC apply must be state-backend-invariant")
    val again = withRocksDb {
      rows(EventOps.upsertReplayGate(spark, sf, "_rocksdb"))
    }
    assert(again == base,
      "restart over the RocksDB checkpoint must not re-apply batches")
  }
}
