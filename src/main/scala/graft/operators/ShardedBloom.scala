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

  /** Minimum (and small-corpus default) shard count. Geometry SCALES
    * with the corpus via [[shardsFor]] — a fixed shard count would cap
    * both probe parallelism (the probe runs exactly `shards` tasks)
    * and per-shard bitmap size at cluster scale. */
  val Shards = 16

  /** Hard cap: the shard rule reads the first 4 hex chars (65536
    * distinct prefixes), so more shards than that could not be
    * distinguished. */
  val MaxShards = 65536

  /** Sizing target: ~32M keys per shard ≈ 38 MB of bitmap at 1% fpp —
    * comfortably one task's working set, with the probe running one
    * task per shard. */
  val TargetKeysPerShard: Long = 32L * 1024 * 1024

  /** Shard count for a corpus of `corpusKeys` keys: the smallest power
    * of two ≥ keys / [[TargetKeysPerShard]], clamped to
    * [[[Shards]], [[MaxShards]]]. Powers of two keep the prefix rule's
    * bucket populations uniform for uniform digests. At 10¹⁰ keys this
    * yields 512 shards ≈ 23 MB of bitmap each (1% fpp) and a 512-task
    * probe — both scale with the corpus instead of being pinned at 16. */
  def shardsFor(corpusKeys: Long): Int = {
    val need = math.max(1L,
      math.ceil(corpusKeys.toDouble / TargetKeysPerShard).toLong)
    var p = Shards
    while (p < need && p < MaxShards) p <<= 1
    p
  }

  /** Shard of a hex-digest key: its first 4 hex chars (16 bits) mod
    * `shards` — a deterministic digest-prefix rule any ingest can route
    * by, uniform for uniform digests, distinguishing up to
    * [[MaxShards]] shards. */
  def shardId(key: Column, shards: Int): Column =
    pmod(conv(substring(key, 1, 4), 16, 10).cast("int"), lit(shards))

  /** Geometry tag stamped into every artifact row: the key→shard
    * routing-rule version + shard count. A persisted artifact built
    * under one rule MUST NOT be probed or merged under another — same
    * key, different shard ⇒ silent false negatives, the one failure a
    * Bloom prefilter may never have. [[probe]] and [[orMerge]] refuse a
    * mismatch loudly instead. (`hex4-v2` = first-4-hex-chars routing;
    * the unversioned first-2-chars rule predates tagging and any such
    * artifact fails the check by having no tag to read.) */
  def geomTag(shards: Int): String = s"hex4-v2:$shards"

  /** The artifact's single geometry tag (bounded driver read: the
    * artifact is K rows of index metadata). None for an empty artifact. */
  private def geomOf(art: DataFrame): Option[String] = {
    val gs = art.select("geom").distinct().collect().map(_.getString(0))
    require(gs.length <= 1,
      s"artifact carries mixed geometries ${gs.mkString(", ")} — it was " +
      "assembled from incompatible builds and cannot be probed safely")
    gs.headOption
  }

  private def requireGeom(art: DataFrame, expected: String,
      what: String): Unit =
    geomOf(art).foreach(g => require(g == expected,
      s"$what geometry mismatch: artifact was built under $g but is " +
      s"being used as $expected — rebuild or route with the artifact's " +
      "own rule (silent cross-geometry use would probe with false " +
      "negatives)"))

  private def ser(f: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    f.writeTo(bos)
    bos.toByteArray
  }
  private def de(b: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(b))

  val blobSchema: StructType = StructType(Seq(
    StructField("shard", IntegerType, nullable = false),
    StructField("bloom", BinaryType, nullable = false),
    StructField("geom", org.apache.spark.sql.types.StringType,
      nullable = false)))

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
    val tag = geomTag(shards)
    s.createDataFrame(merged.map { case (sh, b) => Row(sh, b, tag) },
      blobSchema)
  }

  /** OR-merge two same-geometry shard artifacts (stored corpus + fresh
    * ingest). Bitwise OR per shard: commutative, associative, exact.
    * `shards` sets the merge parallelism (pass the artifact's shard
    * count; correctness is shard-count-independent). */
  def orMerge(s: SparkSession, a: DataFrame, b: DataFrame,
      shards: Int = Shards): DataFrame = {
    // both sides must share ONE routing geometry — OR-merging bitmaps
    // whose keys were routed differently yields an artifact with false
    // negatives on both corpora
    val (ga, gb) = (geomOf(a), geomOf(b))
    (ga, gb) match {
      case (Some(x), Some(y)) => require(x == y,
        s"orMerge geometry mismatch: $x vs $y — rebuild the fresh side " +
        "under the stored artifact's geometry before merging")
      case _ => ()
    }
    val tag = ga.orElse(gb).getOrElse(geomTag(shards))
    val merged = a.unionByName(b).rdd
      .map(r => (r.getInt(0), r.getAs[Array[Byte]](1)))
      .reduceByKey(
        (x, y) => { val fx = de(x); fx.mergeInPlace(de(y)); ser(fx) },
        shards)
    s.createDataFrame(merged.map { case (sh, blob) => Row(sh, blob, tag) },
      blobSchema)
  }

  /** Shard-routed membership probe: returns the rows of `batch` whose
    * `keyCol` MIGHT be in the corpus the artifact was built from (no
    * false negatives; fpp-rate false positives for a downstream exact
    * join to remove). One batch shuffle on shard id; filters
    * deserialized once per task; the probe runs exactly `shards`
    * tasks (spec-asserted), so probe parallelism scales with the
    * artifact's geometry. Rows with a null key are dropped (a null
    * cannot be a corpus member), mirroring buildShards' null filter —
    * without this a null key would NPE inside the routed task. */
  def probe(s: SparkSession, batch: DataFrame, keyCol: String,
      shardsDf: DataFrame, shards: Int): DataFrame = {
    requireGeom(shardsDf, geomTag(shards), "probe")
    val withShard = batch
      .filter(col(keyCol).isNotNull)
      .withColumn("__shard", shardId(col(keyCol), shards))
      .filter(col("__shard").isNotNull)
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
