package graft.streaming

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Micro-batched DOCUMENT-ingest replay — the arrival-time half of the
  * curation catalog. The batch gates answer "curate a corpus that is
  * already here"; a production pipeline also curates documents AS THEY
  * ARRIVE: each micro-batch is scored/probed against artifacts trained
  * on the established corpus (band indexes, classifier weights), and
  * the per-batch results accumulate in a durable sink. This object owns
  * the shared plumbing: the documents table staged as [[NUM_BATCHES]]
  * parquet files, streamed through the REAL Structured Streaming
  * runtime one file per micro-batch (`Trigger.AvailableNow` +
  * `maxFilesPerTrigger=1`), with per-(sfDir, gate) durable
  * sink/checkpoint pairs so a re-invocation exercises the production
  * restart path (offset-log recovery + a no-new-data pass).
  *
  * The batch split is `doc_id % NUM_BATCHES` — any deterministic split
  * works, because the ingest gates are batch-invariant BY CONSTRUCTION:
  * each arriving document's result depends only on the document itself
  * and the static corpus artifacts, never on its batch-mates. That
  * invariance is exactly what lets the SAME DuckDB oracle verify a
  * batch gate and its streaming twin (reference behavior:
  * easy_sql streams reuse the batch step SQL unchanged).
  *
  * Scale shape: staging is a one-time partitioned write of the arrival
  * log (on a cluster the arrival log IS the source, e.g. a landing
  * bucket); per-batch work is O(batch), the corpus-scale artifacts are
  * built once before the stream starts.
  */
object DocIngest {

  /** Staged arrival batches per sf dir. */
  val NUM_BATCHES = 3

  private val staged = TrieMap[String, java.nio.file.Path]()
  private val pairs =
    TrieMap[(String, String), (java.nio.file.Path, java.nio.file.Path)]()

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => try java.nio.file.Files.deleteIfExists(f)
                      catch { case _: Exception => () })
    }

  private def deleteOnExit(p: java.nio.file.Path): Unit =
    Runtime.getRuntime.addShutdownHook(
      new Thread(() => deleteRecursively(p)))

  /** The staged arrival log for `d`: b0..b{NUM_BATCHES-1} single-file
    * parquet dirs, memoized per sf dir (fixtures are immutable). */
  def dir(s: SparkSession, d: String): String =
    staged.getOrElseUpdate(d, {
      val stage = java.nio.file.Files.createTempDirectory("g_doc_src")
      deleteOnExit(stage)
      val docs = s.read.parquet(s"$d/documents.parquet")
      (0 until NUM_BATCHES).foreach { b =>
        docs.filter(col("doc_id") % NUM_BATCHES === b)
          .coalesce(1)
          .write.mode("overwrite").parquet(stage.resolve(s"b$b").toString)
      }
      stage
    }).toString

  /** Durable (sink, checkpoint) pair for one ingest gate — same
    * lifecycle contract as the events replay gates: owned per
    * (sfDir, gate), reclaimed on JVM exit. */
  def sinkCkpt(d: String, name: String)
      : (java.nio.file.Path, java.nio.file.Path) =
    pairs.getOrElseUpdate((d, name), {
      val sk = java.nio.file.Files.createTempDirectory(s"g_${name}_sink")
      val ck = java.nio.file.Files.createTempDirectory(s"g_${name}_ckpt")
      deleteOnExit(sk); deleteOnExit(ck)
      (sk, ck)
    })

  /** The streaming source over the staged arrival log: one staged file
    * per micro-batch, so a full drain is NUM_BATCHES distinct batches —
    * a gate that only worked single-batch would not survive this. */
  def source(s: SparkSession, d: String): DataFrame = {
    val schema = s.read.parquet(s"$d/documents.parquet").schema
    s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(dir(s, d))
  }

  /** Generic arrival-log staging for non-document sources (e.g. the
    * orders change batch of `streaming_ingest_agg`): `df` split into
    * [[NUM_BATCHES]] single-file dirs on `idCol % NUM_BATCHES`,
    * memoized per `key`. Same lifecycle as [[dir]]. */
  def stagedDirOf(key: String, idCol: String, df: => DataFrame): String =
    staged.getOrElseUpdate(key, {
      val stage = java.nio.file.Files.createTempDirectory("g_ing_src")
      deleteOnExit(stage)
      val data = df
      (0 until NUM_BATCHES).foreach { b =>
        data.filter(col(idCol) % NUM_BATCHES === b)
          .coalesce(1)
          .write.mode("overwrite").parquet(stage.resolve(s"b$b").toString)
      }
      stage
    }).toString

  /** One-file-per-micro-batch stream over a [[stagedDirOf]] log. */
  def sourceOver(s: SparkSession, stagedDir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(stagedDir)

  /** Bounded drain + stop — shared await discipline with the events
    * replay gates. */
  def await(q: StreamingQuery): Unit =
    try { if (!q.awaitTermination(300000)) q.processAllAvailable() }
    finally q.stop()
}
