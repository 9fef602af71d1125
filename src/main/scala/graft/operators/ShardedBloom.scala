package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import scala.collection.mutable

import org.apache.spark.HashPartitioner
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, IntegerType, StructField, StructType}
import org.apache.spark.util.sketch.BloomFilter

/** Digest-range-sharded Bloom filter — the corpus-membership artifact
  * behind `dedup_bloom_prefilter`, built and probed WITHOUT the driver
  * ever holding (or merging) the full bitmap:
  *
  *  - '''Build''' ([[buildShards]]): keys are assigned a shard by their
  *    leading digest hex (a digest-RANGE partition, so shard ownership
  *    is a prefix rule any ingest can route by). Each scan task builds
  *    per-shard PARTIAL filters for its split, then one `reduceByKey`
  *    OR-merges partials into K final shards — an executor-side
  *    aggregation whose shuffle carries only K×splits small bitmaps.
  *    The driver sees a K-row DataFrame of (shard, blob), never a
  *    monolithic filter: at 10¹⁰ corpus keys (~12 GB of bitmap at 1%
  *    fpp) each shard is bitmap/K and no single JVM ever materializes
  *    the whole thing.
  *  - '''Probe''' ([[probe]]): the batch shuffles ONCE on its shard id
  *    and meets exactly its shard's blob via `zipPartitions` over two
  *    co-partitioned RDDs — shard ROUTING, not broadcast: a task
  *    deserializes only the filters of the shards it owns (once per
  *    task, not per row) and streams the batch rows through
  *    `mightContainString`. A shard with no corpus keys has no blob and
  *    its batch rows are correctly dropped (same key ⇒ same shard, so
  *    membership is impossible there).
  *  - '''Incremental ingest''' ([[orMerge]]): same-config Bloom bitmaps
  *    compose by bitwise OR, so a new ingest batch builds its own K
  *    shards and merges them into the stored artifact per shard —
  *    `build(A ∪ B)` is bit-identical to `orMerge(build(A), build(B))`
  *    (BloomPrefilterSpec asserts blob-level equality), which is what
  *    makes the persisted filter APPENDABLE instead of
  *    rebuild-the-world. Capacity/fpp are fixed per artifact so every
  *    ingest's shards stay merge-compatible.
  *
  * False-negative-free by construction (Bloom property per shard +
  * deterministic shard routing), so a downstream exact semi-join only
  * ever removes false positives — the gate's answer is provably the
  * plain semi-join's.
  */
object ShardedBloom {

  /** Default shard count: 16 digest ranges (one leading hex nibble each
    * when shards divides 256). At corpus scale you raise this with key
    * count — shards only need to keep a single shard's bitmap
    * comfortably inside one task's memory. */
  val Shards = 16

  /** Shard of a hex-digest key: its leading byte mod `shards` — a
    * digest-range rule (contiguous prefix ranges own contiguous
    * shards when `shards` divides 256). */
  def shardId(key: Column, shards: Int): Column =
    pmod(conv(substring(key, 1, 2), 16, 10).cast("int"), lit(shards))

  private def ser(f: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    f.writeTo(bos)
    bos.toByteArray
  }
  private def de(b: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(b))

  val blobSchema: StructType = StructType(Seq(
    StructField("shard", IntegerType, nullable = false),
    StructField("bloom", BinaryType, nullable = false)))

  /** Build the K-shard artifact from `keys(keyCol)` (string digests).
    * `perShardCapacity`/`fpp` fix the bitmap geometry — every build
    * that should later [[orMerge]] into this artifact must use the
    * same values. */
  def buildShards(s: SparkSession, keys: DataFrame, keyCol: String,
      shards: Int, perShardCapacity: Long, fpp: Double): DataFrame = {
    val keyed = keys
      .select(shardId(col(keyCol), shards).as("shard"),
        col(keyCol).cast("string").as("k"))
    val partials = keyed.rdd.mapPartitions { it =>
      val m = mutable.HashMap[Int, BloomFilter]()
      it.foreach { r =>
        if (!r.isNullAt(0) && !r.isNullAt(1))
          m.getOrElseUpdate(r.getInt(0),
            BloomFilter.create(perShardCapacity, fpp)).putString(r.getString(1))
      }
      m.iterator.map { case (sh, f) => (sh, ser(f)) }
    }
    val merged = partials.reduceByKey(
      (a, b) => { val fa = de(a); fa.mergeInPlace(de(b)); ser(fa) }, shards)
    s.createDataFrame(merged.map { case (sh, b) => Row(sh, b) }, blobSchema)
  }

  /** OR-merge two same-geometry shard artifacts (stored corpus + fresh
    * ingest). Bitwise OR per shard: commutative, associative, exact. */
  def orMerge(s: SparkSession, a: DataFrame, b: DataFrame): DataFrame = {
    val merged = a.unionByName(b).rdd
      .map(r => (r.getInt(0), r.getAs[Array[Byte]](1)))
      .reduceByKey(
        (x, y) => { val fx = de(x); fx.mergeInPlace(de(y)); ser(fx) },
        Shards)
    s.createDataFrame(merged.map { case (sh, blob) => Row(sh, blob) },
      blobSchema)
  }

  /** Shard-routed membership probe: returns the rows of `batch` whose
    * `keyCol` MIGHT be in the corpus the artifact was built from (no
    * false negatives; fpp-rate false positives for a downstream exact
    * join to remove). One batch shuffle on shard id; filters
    * deserialized once per task. */
  def probe(s: SparkSession, batch: DataFrame, keyCol: String,
      shardsDf: DataFrame, shards: Int): DataFrame = {
    val withShard = batch
      .withColumn("__shard", shardId(col(keyCol), shards))
    val shardIdx = withShard.schema.fieldIndex("__shard")
    val keyIdx = withShard.schema.fieldIndex(keyCol)
    val part = new HashPartitioner(shards)
    val batchK = withShard.rdd
      .map(r => (r.getInt(shardIdx), r)).partitionBy(part)
    val blobK = shardsDf.rdd
      .map(r => (r.getInt(0), r.getAs[Array[Byte]](1))).partitionBy(part)
    val survivors = batchK.zipPartitions(blobK, preservesPartitioning = true) {
      (rows, blobs) =>
        val filters = blobs.map { case (sh, bl) => sh -> de(bl) }.toMap
        rows.collect {
          case (sh, r) if filters.get(sh)
            .exists(_.mightContainString(r.getString(keyIdx))) => r
        }
    }
    s.createDataFrame(
      survivors.map(r => Row.fromSeq(r.toSeq.dropRight(1))), batch.schema)
  }
}
