package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every catalog query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line with per-query wall seconds. A warmup action runs
  * first so session/codegen init isn't attributed to the first query.
  *
  * Besides stdout, two machine-readable artifacts land in `bench/`
  * (override with SPARK_GRAFT_BENCH_DIR):
  *  - BENCH_FULL.json — the same payload, untruncatable by log capture;
  *  - BENCH_REGRESSION.json — {query: {prev, cur, ratio}} against the
  *    previous committed BENCH_FULL.json, so per-round perf diffs are a
  *    file diff instead of artifact archaeology.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft_wh_${ProcessHandle.current.pid}")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "134217728")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: JVM/codegen/FS init, one real scan
    spark.range(1000000).selectExpr("sum(id)").collect()
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case _: Throwable => () }
    // streaming-machinery warmup, same role as the batch warmup above:
    // a 1-row file-stream → watermarked window agg → parquet sink pulls
    // FileStreamSource/state-store/offset-log/sink class loading and
    // codegen out of the first streaming query's attributed time (in
    // production these are one-time costs of a continuously-running
    // query, not per-query costs)
    try {
      val wdir = java.nio.file.Files.createTempDirectory("g_bench_warm")
      val src = wdir.resolve("src").toString
      spark.sql("select timestamp'2024-01-01 00:00:00' as ts, " +
          "'w' as event_type, 1.0 as value")
        .write.mode("overwrite").parquet(src)
      val saved = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      // both stateful shapes the gates use: windowed agg + session_window
      val warmups = Seq[(String, org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)](
        "tumbling" -> (df => graft.streaming.StreamingOps
          .tumblingCounts(df, "ts", "1 hour", "10 minutes")),
        "sessions" -> (df => graft.streaming.StreamingOps
          .sessionCounts(df.withColumn("user_id",
              org.apache.spark.sql.functions.lit(1L)),
            "ts", "1 hour", "30 minutes")))
      try warmups.foreach { case (name, agg) =>
        val stream = spark.readStream
          .schema(spark.read.parquet(src).schema).parquet(src)
        val q = agg(stream)
          .writeStream.outputMode("append")
          .option("checkpointLocation", wdir.resolve(s"ckpt_$name").toString)
          .format("parquet")
          .option("path", wdir.resolve(s"sink_$name").toString)
          .start()
        try q.processAllAvailable() finally q.stop()
      } finally {
        spark.conf.set("spark.sql.shuffle.partitions", saved)
        // reclaim the warmup staging (source, sinks, checkpoints)
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(wdir).iterator().asScala.toSeq.reverse
          .foreach(f => try java.nio.file.Files.deleteIfExists(f)
                        catch { case _: Exception => () })
      }
    } catch { case _: Throwable => () }

    // SPARK_GRAFT_BENCH_ONLY=a,b,c restricts the run (isolation runs);
    // SPARK_GRAFT_BENCH_REPS=n times each query n times and reports the
    // MEDIAN — single-shot timings at sub-second scale swing with GC and
    // compilation pauses (the r3 group_agg "2.25x" was exactly that), and
    // the median is robust to one bad rep without hiding a real plan
    // regression across all of them.
    val only: Option[Set[String]] = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val reps = sys.env.get("SPARK_GRAFT_BENCH_REPS")
      .flatMap(_.toIntOption).filter(_ >= 1).getOrElse(3)
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    // SEQUENTIAL by contract: some gates (streaming replay) scope
    // spark.sql.shuffle.partitions via save-mutate-restore on the shared
    // session conf, which a parallel runner would race on. Keep this loop
    // single-threaded (EventOps.replayGate asserts the restore took).
    val raw = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          // noop sink: every row and column is produced (count() would let
          // Catalyst prune projection-only queries down to a metadata read)
          try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          catch { case _: Throwable => () }
          (System.nanoTime() - t0) / 1e9
        }
        (name, median(times), times.head)
      }
    val results = raw.map { case (n, med, _) => n -> med }
    // first-rep ("cold") times published alongside the medians: for the
    // gates with per-JVM durable state (streaming checkpoints, bucketed
    // setup) rep 1 is the full build cost and later reps are the
    // reuse/recovery path — both numbers are real, so report both
    val cold = raw.map { case (n, _, c) => n -> c }
    // millisecond precision: ns digits only bloat the line (log captures
    // that keep a bounded tail were cutting the head of the query map).
    // Locale.ROOT: f"%.3f" under a comma-decimal locale would emit invalid
    // JSON and silently break the regression sidecar's prev-baseline regex.
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val coldQs = cold.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"queries_cold":$coldQs,"reps":$reps,"sf":"$sfDir"}"""
    println(line)

    try {
      val dir = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_DIR", "bench"))
      java.nio.file.Files.createDirectories(dir)
      val full = dir.resolve("BENCH_FULL.json")
      // parse the "queries" object ONLY — the line also carries
      // "queries_cold", whose entries must not shadow the medians
      val prev: Map[String, Double] =
        if (java.nio.file.Files.exists(full)) {
          val content = java.nio.file.Files.readString(full)
          "\"queries\":\\{([^}]*)\\}".r.findFirstMatchIn(content)
            .map(m => "\"([a-z0-9_]+)\":([0-9.]+)".r
              .findAllMatchIn(m.group(1))
              .map(g => g.group(1) -> g.group(2).toDouble).toMap)
            .getOrElse(Map.empty)
        } else Map.empty
      val reg = results.map { case (k, v) =>
        val p = prev.get(k)
        val ratio = p.filter(_ > 0).map(pv => fmt(v / pv)).getOrElse("null")
        s""""$k":{"prev":${p.map(fmt).getOrElse("null")},"cur":${fmt(v)},"ratio":$ratio}"""
      }.mkString("{", ",", "}")
      java.nio.file.Files.writeString(dir.resolve("BENCH_REGRESSION.json"), reg)
      java.nio.file.Files.writeString(full, line)
    } catch { case e: Exception =>
      System.err.println(s"[bench] artifact write failed: ${e.getMessage}")
    }
    spark.stop()
  }
}
