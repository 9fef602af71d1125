package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark

/** CI-locked plan properties — the scale claims SCALE.md makes,
  * asserted on the actual physical plans so a regression (lost
  * pushdown, un-broadcast join, extra shuffle) fails the build rather
  * than silently shipping a 100 TB-hostile plan.
  */
class PlanAssertionsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, sf)
      .queryExecution.executedPlan.toString

  test("filter predicates reach the parquet scan") {
    val p = plan("filter")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThan") || p.contains("LessThan"), p)
  }

  test("projection prunes the scan schema") {
    val p = plan("project")
    // lineitem has 16 columns; the query selects 3 — the ReadSchema
    // must not contain unused ones
    assert(p.contains("ReadSchema"), p)
    assert(!p.contains("l_comment"), p)
    assert(!p.contains("l_shipinstruct"), p)
  }

  test("small dimension joins broadcast") {
    val p = plan("join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("incremental-agg merge prunes untouched buckets at the scan") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files
      .createTempDirectory("g_plan_incragg").toString
    WriteOps.incrAggLoad(spark, sf, base)
    val batch = Tables.orders(spark, sf)
      .filter(year(col("o_orderdate")) === 1997)
      .groupBy("o_custkey").agg(count(lit(1)).as("n"))
      .withColumn("bucket", pmod(col("o_custkey"), lit(16)).cast("int"))
    val touched = batch.select("bucket").distinct()
    val cur = spark.read.parquet(base)
      .withColumn("bucket", col("bucket").cast("int"))
      .join(broadcast(touched), Seq("bucket"), "left_semi")
    cur.collect() // materialize so AQE finalizes the plan
    val p = cur.queryExecution.executedPlan.toString
    // dynamic partition pruning: the broadcast semi-join on the
    // partition column must reach the scan as a runtime filter, so a
    // narrow batch reads only its buckets' files at any table size
    assert(p.contains("dynamicpruning"), p)
  }

  test("snapshot star join runtime-prunes fact partitions (DPP): the " +
      "dim's surviving keys bound which partitions the connector plans") {
    val df = graft.SparkEntry.queries("join_dpp_snapshot")(spark, sf)
    df.collect() // execute so the runtime filter actually fires
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning"),
      s"no runtime filter reached the connector scan:\n$p")
    // the registry pins WHAT was planned: each year's min date falls
    // inside that year, so first_day >= 1996-01-01 keeps exactly the
    // years >= 1996 present in orders — compute that from the data
    import org.apache.spark.sql.functions._
    val expected = Tables.orders(spark, sf)
      .select(year(col("o_orderdate")).as("y")).distinct()
      .collect().map(_.getInt(0)).filter(_ >= 1996).sorted.toSeq
    assert(expected.nonEmpty && expected.size <
      Tables.orders(spark, sf).select(year(col("o_orderdate")))
        .distinct().count(),
      "fixture lost its selectivity — the dim filter must drop years")
    val planned = graft.sources.SnapshotScan.lastPlannedYears.collectFirst {
      case (root, ys) if root.contains("cntmeta") => ys
    }
    assert(planned === Some(Some(expected)),
      s"fact scan planned $planned, wanted exactly $expected")
  }

  test("exact dedup shuffles digests, not documents") {
    val p = plan("dedup_exact")
    // the exchange key is the md5 hash; raw text must not survive past
    // the partial aggregate
    val exchangeLine = p.linesIterator
      .find(_.contains("Exchange hashpartitioning"))
    assert(exchangeLine.isDefined, p)
    // the key is the pre-computed digest (a grouping expression or the
    // named hash) — never the raw text column
    assert(!exchangeLine.get.contains("text#"), exchangeLine.get)
    assert(p.contains("md5"), p)
    // map-side combine before the shuffle
    assert(p.indexOf("HashAggregate") <
           p.indexOf("Exchange hashpartitioning") ||
           p.linesIterator.count(_.contains("HashAggregate")) >= 2, p)
  }

  test("ANN brute force broadcasts the query side") {
    val p = plan("ann_bruteforce_topk")
    assert(p.contains("BroadcastExchange") ||
           p.contains("BroadcastNestedLoopJoin"), p)
    // per-query top-k prunes before the final sort: WindowGroupLimit
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("reservoir top-k runs partial-before-exchange: WindowGroupLimit " +
      "bounds the shuffle at k rows per group per partition") {
    val p = plan("sample_reservoir_topk")
    // the rank-filter shape must compile to
    // WindowGroupLimit(Partial) → Exchange → WindowGroupLimit(Final):
    // each input partition keeps only its k digest-smallest rows per
    // group BEFORE the exchange, so the shuffle carries ≤ k×partitions
    // rows per group instead of the full pre-filtered set
    val firstLimit = p.indexOf("WindowGroupLimit")
    val exchange = p.indexOf("Exchange", firstLimit)
    val finalLimit = p.indexOf("WindowGroupLimit", exchange)
    assert(firstLimit >= 0 && exchange > firstLimit && finalLimit > exchange,
      s"expected WindowGroupLimit→Exchange→WindowGroupLimit, got:\n$p")
  }

  test("tfidf document-frequency join shuffles, never broadcasts vocab") {
    // the df side is O(|vocab|) — a broadcast there dies on a web-scale
    // corpus. With auto-broadcast off, only explicit hints can
    // broadcast, so this proves the df join carries no hint while the
    // deliberate 1-row corpus-count broadcast survives.
    val k = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(k)
    spark.conf.set(k, "-1")
    try {
      val p = plan("text_tfidf_top_terms")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
             p)
      assert(!p.contains("BroadcastHashJoin"), p)
      assert(p.linesIterator.count(_.contains("BroadcastExchange")) == 1, p)
    } finally spark.conf.set(k, saved)
  }

  test("dedup signature pass stays native — no interpreted lambdas") {
    val p = plan("dedup_minhash_sigs")
    // the shingle + minhash pass must be the native expressions, not
    // transform/slice lambdas (higher-order fns never codegen)
    assert(p.contains("ngram_shingles"), p)
    assert(p.contains("minhash_md5"), p)
    assert(!p.contains("transform("), p)
    assert(!p.contains("lambdafunction"), p)
  }

  test("LSH band path is one native expression — no interpreted projection") {
    val p = plan("dedup_minhash_pairs")
    // shingles → (band_id, band_hash) must be the single codegen'd
    // MinHashBands call: no per-signature getItem projections, no
    // md5(concat(...)) trees, no higher-order-function lambdas
    assert(p.contains("minhash_bands"), p)
    assert(!p.contains("minhash_md5"), p)
    assert(!p.contains("lambdafunction"), p)
    assert(!p.contains("md5(concat"), p)
  }

  test("fingerprint pass stays native — no interpreted lambdas") {
    val p = plan("text_fingerprint")
    // shingle + min-hash must be the codegen'd kernels, not the
    // transform/sequence/slice/concat_ws composition
    assert(p.contains("ngram_shingles"), p)
    assert(p.contains("md5_min"), p)
    assert(!p.contains("lambdafunction"), p)
    assert(!p.contains("transform("), p)
  }

  test("decontamination probe broadcasts the eval side, native shingler") {
    val p = plan("text_decontaminate")
    // the corpus-side gram stream must NOT shuffle for the probe: the
    // (tiny) benchmark gram set broadcasts into a semi join
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
    assert(p.contains("ngram_shingles"), p)
    assert(!p.contains("lambdafunction"), p)
  }

  test("domain-mix sampling is one broadcast join, zero shuffles") {
    val p = plan("sample_domain_mix")
    // the mixture config joins map-side; re-weighting a 100 TB corpus
    // must cost one scan, no exchange of corpus rows
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("phash near-dup verification joins hashes, never blobs") {
    val p = plan("multimodal_phash_neardup")
    // the candidate join keys on (band_id, band_val); the Hamming
    // verify joins the 24-byte hash index back — the binary blob
    // column must be pruned out of every exchange
    val exchanges = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.nonEmpty, p)
    assert(exchanges.forall(!_.contains("blob")), exchanges.mkString("\n"))
    assert(p.contains("bit_count"), p)
  }

  test("salted aggregation is two map-side-combined stages") {
    val p = plan("agg_salted_two_stage")
    val exchanges = p.linesIterator.count(
      _.contains("Exchange hashpartitioning"))
    assert(exchanges == 2, s"expected exactly 2 exchanges:\n$p")
    // partial aggregates precede both exchanges (map-side combine)
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 4, p)
  }

  test("skew join salts the shuffle: merge join keyed on (key, salt)") {
    val p = plan("join_skew_salted")
    // the merge hint must hold for the fact-dim join (broadcasting the
    // dim would make the salt moot); the only broadcasts allowed are
    // the tiny hot-key-set ROUTING joins (semi/anti/outer), never an
    // inner fold-in of the dim payload
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("Inner")), p)
    // both join-side exchanges partition on the salt, so a hot key
    // spreads over S reducers
    val exchanges = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.count(_.contains("salt")) >= 2,
      exchanges.mkString("\n"))
  }

  test("SQ8 scan joins codes against a broadcast query side") {
    val p = plan("ann_sq8_topk")
    // the corpus side streams; only the 5-query side is broadcast, and
    // the per-query top-k prunes before the final sort
    assert(p.contains("BroadcastExchange") ||
           p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("WindowGroupLimit"), p)
    // the per-candidate distance projection runs on the native kernel,
    // not an interpreted higher-order function (encode's one-off
    // zip_with stays upstream of the join, evaluated once per corpus
    // row, never per candidate pair)
    val distLine = p.linesIterator.find(_.contains("AS sq_dist"))
    assert(distLine.isDefined, p)
    assert(distLine.get.contains("array_dot_long"), distLine.get)
    assert(!distLine.get.contains("zip_with"), distLine.get)
  }

  test("semantic dedup broadcasts centroids; verify join is cell-keyed") {
    val p = plan("dedup_semantic")
    assert(p.contains("BroadcastExchange"), p)
    // the quadratic cosine verify is an equi-join on the cell id — a
    // cross join here would be the 100 TB-hostile all-pairs plan
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
           p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("bm25 broadcasts term stats only; doc-length join shuffles") {
    val k = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(k)
    spark.conf.set(k, "-1")
    try {
      val p = plan("text_bm25")
      // exactly the two deliberate broadcasts survive: the per-term df
      // frame and the 1-row corpus totals — never the doc-length side,
      // which is corpus-sized
      assert(p.linesIterator.count(_.contains("BroadcastExchange")) == 2, p)
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
             p)
    } finally spark.conf.set(k, saved)
  }

  test("skew join salt covers the full domain") {
    import org.apache.spark.sql.functions.countDistinct
    // every salt value in [0, S) must actually occur on TPC-H data —
    // a salt derived from l_linenumber (∈ 1..7) would leave value 0
    // unused and spread the hot key over S-1 reducers only
    val s = AdvancedOps.SKEW_SALTS
    val salts = Tables.lineitem(spark, sf)
      .select(AdvancedOps.skewSalt(s).as("salt"))
    val distinct = salts.agg(countDistinct("salt")).collect()(0).getLong(0)
    assert(distinct == s, s"expected $s distinct salts, got $distinct")
    val range = salts.distinct().collect().map(_.getInt(0)).sorted
    assert(range.sameElements(0 until s), range.mkString(","))
  }

  /** Run the query so AQE finalizes, then return the FINAL plan only
    * (the printed AdaptiveSparkPlan repeats the initial plan below the
    * final one — counting across both would double-count exchanges). */
  private def finalPlan(name: String): String = {
    val df = graft.SparkEntry.queries(name)(spark, sf)
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("char-LM joins a broadcast vocab; tri-count shuffle is reused") {
    val p = finalPlan("text_char_lm_score")
    // the trained freq table is charset-bounded — it must come back as
    // a broadcast, never re-shuffle the corpus-size tri-count stream
    assert(p.contains("BroadcastHashJoin"), p)
    // both consumers of the tri-count aggregate share ONE shuffle
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage")
      || p.contains("TableCacheQueryStage"), p)
  }

  test("filtered search: predicate semi-join sits under the top-k") {
    val p = finalPlan("ann_filtered_topk")
    // the eligibility frame must arrive as a LeftSemi join inside the
    // scan (pre-filter), and the ranking window must sit ABOVE it —
    // i.e. ineligible vectors are pruned before any candidate ranking
    assert(p.contains("LeftSemi"), p)
    val semiAt = p.indexOf("LeftSemi")
    val windowAt = p.indexOf("Window")
    assert(windowAt >= 0 && windowAt < semiAt,
      s"ranking window not above the semi-join (window@$windowAt, " +
        s"semi@$semiAt)")
  }

  test("span rewrite: document text never enters a shuffle") {
    val p = finalPlan("dedup_span_rewrite")
    // every hash exchange carries digests/positions; the doc side joins
    // the (broadcast) drop-list without shuffling its span arrays
    p.linesIterator.filter(_.contains("Exchange hashpartitioning"))
      .foreach { l =>
        assert(!l.contains("text#") && !l.contains("spans#"), l)
      }
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("skew join keeps the salted shape under AQE skew-join") {
    // AQE's runtime skew split must COMPOSE with the manual salt, not
    // replace it: the finalized plan still merge-joins on (key, salt)
    // with both exchanges partitioned on the salt (so a single key
    // hotter than anything AQE can split stays spread over S reducers)
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val p = finalPlan("join_skew_salted")
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.linesIterator.exists(l =>
        l.contains("BroadcastHashJoin") && l.contains("Inner")), p)
      val exchanges = p.linesIterator
        .filter(_.contains("Exchange hashpartitioning")).toSeq
      assert(exchanges.count(_.contains("salt")) >= 2,
        exchanges.mkString("\n"))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("pack chunks: exactly one single-partition step (block totals)") {
    val p = finalPlan("text_pack_chunks")
    val singles = p.linesIterator
      .count(_.contains("Exchange SinglePartition"))
    assert(singles == 1, s"$singles single-partition exchanges:\n$p")
    // the per-doc cumulative window stays partitioned by block
    assert(p.contains("windowspecdefinition(blk#"), p)
    // the block-offset frame comes back as a broadcast, not a shuffle
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("hybrid RRF: the lexical probe joins a broadcast query side") {
    val p = plan("search_hybrid_rrf")
    // the corpus posting stream must equi-join the 5-doc query shingle
    // set as a broadcast — a shuffled probe would move the posting
    // stream for a constant-size query set
    assert(p.contains("BroadcastHashJoin"), p)
    // fusion operates on rank lists: both arms top-k through window
    // group limits, so no corpus-sized side reaches the fusion join
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("robust anomaly: group stats broadcast back to the event stream") {
    val p = plan("events_anomaly_robust")
    // med/mad are |event_type|-row frames; both joins must broadcast —
    // a shuffle join would repartition the full event stream twice
    val broadcasts = p.linesIterator
      .count(_.contains("BroadcastHashJoin"))
    assert(broadcasts >= 2, s"$broadcasts broadcast joins:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("sketched percentiles: the histogram exchange is counts-only") {
    val p = plan("percentiles_sketch")
    // the (group, bin) count must partial-aggregate BEFORE its
    // exchange, so the shuffle carries ≤ |groups|×bins count rows and
    // never the data — the property that makes this the 100 TB
    // quantile path
    val iPartial = p.linesIterator.indexWhere(l =>
      l.contains("HashAggregate") && l.contains("partial_count"))
    val iExchange = p.linesIterator.indexWhere(_.contains("Exchange"))
    assert(iPartial >= 0, s"no partial count aggregate:\n$p")
    assert(iExchange >= 0, s"no exchange:\n$p")
    // executed plans print top-down: the exchange must sit ABOVE the
    // partial aggregate (map-side combine), not below it
    assert(iExchange < iPartial,
      s"exchange (line $iExchange) not fed by the partial aggregate " +
        s"(line $iPartial):\n$p")
    // raw value columns must not survive past the histogram: the
    // window/interpolation stages operate on (group, bin, cnt) only
    assert(!p.linesIterator.exists(l =>
      l.contains("Window") && l.contains("l_quantity")), p)
  }
}
