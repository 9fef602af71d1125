package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the bloom-prefiltered membership dedup the hash oracle
  * can't state: the sharded bloom never drops a true duplicate (no
  * false negatives), it actually prunes the probe side, the final
  * answer equals the plain exact semi-join with no bloom at all, the
  * shard artifact is memoized (probes reuse it instead of rescanning
  * the corpus), and incremental ingest composes exactly —
  * build(A ∪ B) is bit-identical to orMerge(build(A), build(B)). */
class BloomPrefilterSpec extends AnyFunSuite {

  private lazy val spark = graft.etl.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def keyed = Tables.documents(spark, sf)
    .select(col("doc_id"), DedupOps.prefixKey.as("prefix_md5"))
  private def corpus = keyed.filter(col("doc_id") % 10 =!= 7)
  private def batch = keyed.filter(col("doc_id") % 10 === 7)

  test("bloom answer equals the plain exact semi-join") {
    val viaBloom = DedupOps.bloomPrefilterDups(spark, sf)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("prefix_md5"))).toSet

    val exact = batch
      .join(corpus.select("prefix_md5").distinct(),
        Seq("prefix_md5"), "left_semi")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("prefix_md5"))).toSet
    assert(viaBloom === exact)
    assert(exact.nonEmpty, "fixture has no cross-split dups — vacuous")
  }

  test("the sharded probe prunes the batch but never a true duplicate") {
    val shards = DedupOps.corpusBloomShards(spark, sf, corpus)
    val survivors = ShardedBloom.probe(spark, batch, "prefix_md5",
      shards, ShardedBloom.Shards)
      .select("prefix_md5").collect().map(_.getString(0)).toSet

    val trueDups = batch
      .join(corpus.select("prefix_md5").distinct(),
        Seq("prefix_md5"), "left_semi")
      .select("prefix_md5").collect().map(_.getString(0)).toSet
    // no false negatives: every true dup key survives the probe
    assert((trueDups -- survivors).isEmpty,
      s"sharded bloom dropped true duplicates: ${trueDups -- survivors}")

    // real pruning: survivors ≪ batch (fpp 3% + the tiny dup set)
    val batchSize = batch.count()
    assert(survivors.size < batchSize / 2,
      s"bloom pruned nothing: ${survivors.size} of $batchSize keys survive")
  }

  test("the shard artifact is built executor-side and memoized: a " +
      "second gate run reuses it") {
    graft.core.SessionMemo.remove(spark, DedupOps.bloomShardsKey(spark, sf))
    DedupOps.bloomPrefilterDups(spark, sf).collect()
    val first = graft.core.SessionMemo.get(spark, DedupOps.bloomShardsKey(spark, sf))
    assert(first.isDefined, "gate did not persist the shard artifact")
    DedupOps.bloomPrefilterDups(spark, sf).collect()
    val second = graft.core.SessionMemo.get(spark, DedupOps.bloomShardsKey(spark, sf))
    assert(second.get eq first.get,
      "second run rebuilt the shard artifact instead of reusing it")
    // the artifact is the K-row blob table, nothing driver-merged
    assert(first.get.count() <= ShardedBloom.Shards)
  }

  test("incremental ingest: orMerge(build(A), build(B)) is bit-identical " +
      "to build(A union B)") {
    val cap = 2048L
    val a = corpus.filter(col("doc_id") % 3 === 0)
    val b = corpus.filter(col("doc_id") % 3 =!= 0)
    def build(df: org.apache.spark.sql.DataFrame) =
      ShardedBloom.buildShards(spark, df, "prefix_md5",
        ShardedBloom.Shards, cap, DedupOps.BloomFpp)
    def blobs(df: org.apache.spark.sql.DataFrame): Map[Int, Seq[Byte]] =
      df.collect().map(r =>
        r.getInt(0) -> r.getAs[Array[Byte]](1).toSeq).toMap

    val merged = blobs(ShardedBloom.orMerge(spark, build(a), build(b)))
    val full = blobs(build(corpus))
    assert(merged.keySet === full.keySet)
    merged.keySet.foreach { sh =>
      assert(merged(sh) === full(sh),
        s"shard $sh bitmap differs between incremental merge and full build")
    }

    // and the merged artifact probes with no false negatives
    val survivors = ShardedBloom.probe(spark, batch, "prefix_md5",
      ShardedBloom.orMerge(spark, build(a), build(b)), ShardedBloom.Shards)
      .select("prefix_md5").collect().map(_.getString(0)).toSet
    val trueDups = batch
      .join(corpus.select("prefix_md5").distinct(),
        Seq("prefix_md5"), "left_semi")
      .select("prefix_md5").collect().map(_.getString(0)).toSet
    assert((trueDups -- survivors).isEmpty)
  }

  test("geometry scales with the corpus: shardsFor grows as a power of " +
      "two, small corpora keep the 16-shard floor") {
    import ShardedBloom.{shardsFor, Shards, MaxShards, TargetKeysPerShard}
    assert(shardsFor(1000L) === Shards)
    assert(shardsFor(TargetKeysPerShard * Shards) === Shards)
    assert(shardsFor(TargetKeysPerShard * Shards + 1) === Shards * 2)
    val at1e10 = shardsFor(10L * 1000 * 1000 * 1000)
    assert(at1e10 >= 256 && Integer.bitCount(at1e10) === 1,
      s"1e10 keys should shard into a few hundred power-of-two shards, got $at1e10")
    assert(shardsFor(Long.MaxValue) === MaxShards)
  }

  test("non-default geometry round-trips: build → persist → probe → " +
      "orMerge at shards=64, probe runs exactly `shards` tasks") {
    val shards = 64
    val a = corpus.filter(col("doc_id") % 3 === 0)
    val b = corpus.filter(col("doc_id") % 3 =!= 0)
    def build(df: org.apache.spark.sql.DataFrame) =
      ShardedBloom.buildShards(spark, df, "prefix_md5",
        shards, 2048L, DedupOps.BloomFpp)

    // persist the artifact the way a real ingest would (parquet) and
    // probe the reloaded copy
    val dir = java.nio.file.Files.createTempDirectory("g_bloom64")
      .resolve("art").toString
    ShardedBloom.orMerge(spark, build(a), build(b), shards)
      .write.parquet(dir)
    val reloaded = spark.read.parquet(dir)

    val out = ShardedBloom.probe(spark, batch, "prefix_md5",
      reloaded, shards)
    // probe parallelism == artifact geometry: exactly `shards` tasks
    assert(out.rdd.getNumPartitions === shards,
      s"probe ran ${out.rdd.getNumPartitions} tasks for $shards shards")

    val survivors = out.select("prefix_md5")
      .collect().map(_.getString(0)).toSet
    val trueDups = batch
      .join(corpus.select("prefix_md5").distinct(),
        Seq("prefix_md5"), "left_semi")
      .select("prefix_md5").collect().map(_.getString(0)).toSet
    assert((trueDups -- survivors).isEmpty,
      "64-shard reloaded artifact dropped true duplicates")

    // and the incremental-merge identity holds at this geometry too
    def blobs(df: org.apache.spark.sql.DataFrame): Map[Int, Seq[Byte]] =
      df.collect().map(r =>
        r.getInt(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(blobs(ShardedBloom.orMerge(spark, build(a), build(b), shards))
      === blobs(build(corpus)))
  }

  test("cross-geometry use is refused loudly: a persisted artifact " +
      "probes/merges only under its recorded routing rule") {
    import spark.implicits._
    val corpusDf = (1 to 50).map(i => f"$i%032x").toDF("k")
    val art16 = ShardedBloom.buildShards(spark, corpusDf, "k",
      16, 64L, 0.03)
    val art32 = ShardedBloom.buildShards(spark, corpusDf, "k",
      32, 64L, 0.03)

    // probing a 16-shard artifact as if it had 32 shards would route
    // keys to shards that never saw them — silent false negatives; the
    // geometry tag turns that into a loud refusal
    val ex = intercept[IllegalArgumentException] {
      ShardedBloom.probe(spark, corpusDf, "k", art16, 32).collect()
    }
    assert(ex.getMessage.contains("geometry"))
    // same for merging artifacts of different geometry
    val ex2 = intercept[IllegalArgumentException] {
      ShardedBloom.orMerge(spark, art16, art32).collect()
    }
    assert(ex2.getMessage.contains("geometry"))
    // the recorded tag round-trips through parquet persistence
    val dir = java.nio.file.Files.createTempDirectory("g_bloom_geom")
      .resolve("art").toString
    art16.write.parquet(dir)
    val reloaded = spark.read.parquet(dir)
    assert(reloaded.select("geom").distinct().collect()
      .map(_.getString(0)).toSeq === Seq(ShardedBloom.geomTag(16)))
    assert(ShardedBloom.probe(spark, corpusDf, "k", reloaded, 16)
      .count() === 50)
  }

  test("probe drops null keys instead of failing the task") {
    import spark.implicits._
    val corpusDf = Seq("aaaa11", "bbbb22").toDF("k")
    val art = ShardedBloom.buildShards(spark, corpusDf, "k",
      ShardedBloom.Shards, 64L, 0.03)
    val probeDf = Seq(Some("aaaa11"), None, Some("cccc33"))
      .toDF("k")
    val out = ShardedBloom.probe(spark, probeDf, "k", art,
      ShardedBloom.Shards).collect().map(_.getString(0))
    assert(out.contains("aaaa11"))
    assert(!out.contains(null))
  }

  test("a shard with no corpus keys drops its batch rows (membership " +
      "is impossible there)") {
    import spark.implicits._
    // corpus keys all land in ONE shard; probe keys from other shards
    def md5hex(v: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(v.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val allKeys = (1 to 400).map(i => md5hex(s"k$i"))
    def shardOf(k: String) =
      Integer.parseInt(k.substring(0, 4), 16) % ShardedBloom.Shards
    val inShard = allKeys.filter(shardOf(_) === shardOf(allKeys.head))
    val corpusDf = inShard.toDF("k")
    val art = ShardedBloom.buildShards(spark, corpusDf, "k",
      ShardedBloom.Shards, 1024L, 0.03)
    assert(art.count() === 1, "single-shard corpus built >1 shard")
    val probeDf = allKeys.toDF("k")
    val out = ShardedBloom.probe(spark, probeDf, "k", art,
      ShardedBloom.Shards).collect().map(_.getString(0)).toSet
    // every in-shard key survives (it IS in the corpus), nothing from
    // blobless shards can
    assert(inShard.toSet.subsetOf(out))
    assert(out.forall(shardOf(_) === shardOf(allKeys.head)))
  }
}
