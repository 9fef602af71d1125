package graft

import org.apache.spark.sql.SparkSession

import graft.backend.SparkBackend
import graft.etl.{EasySqlConfig, SqlProcessor}

/** CLI entry point — the Scala equivalent of the reference's
  * `python3 -m easy_sql.data_process -f etl.sql [-v vars] [--dry-run]`
  * (easy_sql/data_process.py + cli/backend_processor.py:44-70).
  *
  * Reads the ETL file, parses header directives, builds a SparkSession
  * with the engine's tuned defaults plus any `-- config: spark.*` lines,
  * executes `-- prepare-sql:` statements natively, then runs the step
  * list. In a cluster deployment this main is the spark-submit class;
  * locally it runs in-process.
  *
  * Usage: graft.DataProcess -f etl.sql [-v a=1,b=2] [--dry-run]
  */
object DataProcess {

  def main(args: Array[String]): Unit = {
    var sqlFile: Option[String] = None
    var vars: Map[String, Any] = Map.empty
    var varsRaw: Option[String] = None
    var dryRun = false
    var reportPath: Option[String] = None
    var taskId: Option[String] = None
    var esUrl: Option[String] = None
    var esIndexPrefix: String = ""
    var printCommand = false
    var defaultConf = Vector.empty[String]
    var sparkSubmit = "spark-submit"
    var entryJar = "graft-assembly.jar"
    var i = 0
    while (i < args.length) {
      args(i) match {
        // print the assembled spark-submit command instead of running
        // (reference data_process.py --print-command/-p +
        // backend_processor.shell_command)
        case "-p" | "--print-command" => printCommand = true; i += 1
        // repeatable, one k=v per occurrence (values may contain commas,
        // e.g. spark.files lists)
        case "--default-conf" => defaultConf :+= args(i + 1).trim; i += 2
        case "--spark-submit" => sparkSubmit = args(i + 1); i += 2
        case "--entry-jar" => entryJar = args(i + 1); i += 2
        case "-f" => sqlFile = Some(args(i + 1)); i += 2
        case "-v" | "--vars" =>
          varsRaw = Some(args(i + 1)); vars ++= parseVars(args(i + 1)); i += 2
        case "--dry-run" => dryRun = true; i += 1
        // file analog of the reference's report_hdfs_path/report_task_id
        // (sql_processor.py:56-57): per-step status JSON for monitors
        case "--report-path" => reportPath = Some(args(i + 1)); i += 2
        case "--task-id" => taskId = Some(args(i + 1)); i += 2
        // ES analog of report_es_url/report_es_index_prefix
        // (sql_processor.py:58-59 + report.py:96-103)
        case "--report-es-url" => esUrl = Some(args(i + 1)); i += 2
        case "--report-es-index-prefix" =>
          esIndexPrefix = args(i + 1); i += 2
        case other => throw new IllegalArgumentException(
          s"unknown argument: $other (usage: -f etl.sql [-v a=1,b=2] " +
          "[--dry-run] [-p] [--default-conf k=v]* [--spark-submit bin] " +
          "[--entry-jar x.jar] [--report-path report.json] [--task-id id] " +
          "[--report-es-url http://es:9200] [--report-es-index-prefix p])")
      }
    }
    val file = sqlFile.getOrElse(
      throw new IllegalArgumentException("missing -f <etl.sql>"))
    require(file.endsWith(".sql"),
      s"sql file must ends with .sql, found `$file`")

    val sql = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(file)), "UTF-8")
    if (printCommand) {
      println(new graft.etl.SparkSubmitCommand().assemble(
        sql, file, userDefaultConf = defaultConf,
        varsArg = varsRaw,
        dryRun = dryRun, entryJar = entryJar, sparkSubmit = sparkSubmit))
      return
    }
    run(sql, vars, dryRun,
      baseDir = Option(new java.io.File(file).getParent),
      reportPath = reportPath, reportTaskId = taskId,
      reportSinks =
        esUrl.map(new graft.etl.EsReportSink(_, esIndexPrefix)).toSeq)
  }

  /** Reference `parse_vars` (config/sql_config.py:42-52): comma-split
    * k=v pairs, values URL-decoded. */
  def parseVars(vars: String): Map[String, Any] =
    vars.split(",").toSeq.filter(_.trim.nonEmpty).map { kv =>
      val Array(k, v) = kv.split("=", 2)
      k.trim -> java.net.URLDecoder.decode(v.trim, "UTF-8")
    }.toMap

  /** RDB backends take their connection from the `graft.etl.jdbc.url`
    * system property (spark-submit `--driver-java-options -D...`) or the
    * `ETL_JDBC_URL` environment variable — the same env-provided-url
    * convention the reference uses (PG_URL/CLICKHOUSE_URL in its tests
    * and docs). */
  private[graft] def rdbUrlFor(backend: String): String =
    sys.props.get("graft.etl.jdbc.url")
      .orElse(sys.env.get("ETL_JDBC_URL"))
      .getOrElse(throw new IllegalArgumentException(
        s"backend `$backend` needs a JDBC url in the " +
        "graft.etl.jdbc.url system property or ETL_JDBC_URL env var"))

  /** Runs the ETL. Returns `Some(processor)` for batch/rdb ETLs;
    * `None` for streaming ETLs, whose result is their committed sinks,
    * not a processor — an Option so a caller chaining on the result
    * gets a compile-time reminder instead of a latent NPE. */
  def run(sql: String, vars: Map[String, Any], dryRun: Boolean,
      baseDir: Option[String] = None,
      existingSession: Option[SparkSession] = None,
      reportPath: Option[String] = None,
      reportTaskId: Option[String] = None,
      reportSinks: Seq[graft.etl.ReportSink] = Nil): Option[SqlProcessor] = {
    val config = EasySqlConfig.fromSql(sql)
    require(Set("spark", "postgres", "clickhouse", "bigquery", "maxcompute")
        .contains(config.backend),
      s"unsupported backend `${config.backend}` " +
      "(supported: spark, postgres, clickhouse, bigquery, maxcompute)")

    if (config.backend != "spark") {
      val backend = new graft.backend.rdb.RdbBackend(rdbUrlFor(config.backend))
      try {
        config.prepareSqlList.foreach(backend.execNativeSql)
        val processor = new SqlProcessor(backend, sql, variables = vars,
          baseDir = baseDir, reportPath = reportPath,
          reportTaskId = reportTaskId, reportSinks = reportSinks)
        processor.run(dryRun)
        return Some(processor)
      } finally backend.clean()
    }

    val spark = existingSession.getOrElse {
      // engine defaults mirror the reference's get_spark
      // (easy_sql/spark_optimizer.py:30-58): AQE on, 128MB post-shuffle
      // target, nonstrict dynamic partitions
      var b = SparkSession.builder()
        .appName("graft_etl")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
          "134217728")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.session.timeZone", "UTC")
      config.backendConf.foreach { c =>
        val Array(k, v) = c.split("=", 2)
        b = b.config(k.trim, v.trim)
      }
      b.getOrCreate()
    }
    // in-file spark confs also apply to an existing session where possible
    if (existingSession.isDefined) {
      config.backendConf.foreach { c =>
        val Array(k, v) = c.split("=", 2)
        try spark.conf.set(k.trim, v.trim)
        catch { case _: Exception => () } // static confs can't change
      }
    }

    if (config.isStreaming) {
      // the reference's third execution mode (config/sql_config.py:
      // 207-216 routes etl_type=streaming to the Flink statement-set
      // runner); here it routes to StreamingEtl over Structured
      // Streaming. Returns None: a streaming ETL's result is its
      // committed sinks, not a processor. Dry-run is honored the same
      // way every other etl_type honors it — validate, don't execute.
      if (dryRun) validateStreaming(config, sql, vars, spark)
      else runStreaming(config, sql, vars, spark)
      return None
    }

    val backend = new SparkBackend(spark)
    try {
      config.prepareSqlList.foreach(backend.execNativeSql(_))
      val processor = new SqlProcessor(backend, sql, variables = vars,
        baseDir = baseDir, reportPath = reportPath,
        reportTaskId = reportTaskId, reportSinks = reportSinks)
      processor.run(dryRun)
      Some(processor)
    } finally {
      if (existingSession.isEmpty) backend.clean()
    }
  }

  /** Streaming dry-run: validate the header and step list WITHOUT
    * executing — sources must parse as `<view>:<dir>` with a readable
    * schema (a footer read, no stream start), the sink dir must
    * resolve, and every step must preprocess to a supported streaming
    * step type. Mirrors what batch dry-run guarantees: "the ETL is
    * well-formed", with zero side effects on sinks or checkpoints. */
  private[graft] def validateStreaming(config: EasySqlConfig, sql: String,
      vars: Map[String, Any], spark: SparkSession): Unit = {
    def subst(v: String): String =
      vars.foldLeft(v) { case (acc, (k, value)) =>
        acc.replace("${" + k + "}", String.valueOf(value)) }
    val sources = config.getAll("streaming_source").map { spec =>
      val i = spec.indexOf(':')
      require(i > 0, s"streaming_source must be <view>:<dir>, got `$spec`")
      val dir = subst(spec.substring(i + 1).trim)
      // schema resolution = the dir exists and is readable parquet
      spark.read.option("recursiveFileLookup", "true").parquet(dir).schema
      spec.substring(0, i).trim
    }
    require(sources.nonEmpty,
      "streaming ETL needs at least one `-- config: " +
      "easy_sql.streaming_source=<view>:<dir>` line")
    config.get("streaming_sink_dir").map(subst).foreach { d =>
      require(d.trim.nonEmpty, "streaming_sink_dir resolves empty")
    }
    val supported = Set(graft.etl.StepType.Template,
      graft.etl.StepType.Variables, graft.etl.StepType.Temp,
      graft.etl.StepType.Cache, graft.etl.StepType.Broadcast,
      graft.etl.StepType.Output, graft.etl.StepType.Hive,
      graft.etl.StepType.Func, graft.etl.StepType.Action)
    new graft.etl.StepFactory().createFromSql(sql).foreach { step =>
      step.targetConfig.foreach { tc =>
        require(supported.contains(tc.stepType),
          s"step type ${tc.stepType} not supported in streaming mode")
      }
    }
  }

  /** Streaming-mode runner: sources and the sink root are declared in
    * the ETL header — the Spark-native analog of the reference's
    * `easy_sql.flink_tables_file_path` connector config:
    *
    *   `-- config: easy_sql.streaming_source=<view>:<parquet_dir>`
    *     (repeatable; the dir is an arrival log streamed one file per
    *      micro-batch, schema inferred from a batch read)
    *   `-- config: easy_sql.streaming_sink_dir=<dir>`
    *     (output targets commit under `<dir>/<db>__<table>/`)
    *
    * `${var}` references in both values resolve from `-v` vars. The
    * call BLOCKS until the started queries drain (AvailableNow) — the
    * CLI contract is "the ETL ran", same as batch mode. */
  private[graft] def runStreaming(config: EasySqlConfig, sql: String,
      vars: Map[String, Any], spark: SparkSession): Unit = {
    def subst(v: String): String =
      vars.foldLeft(v) { case (acc, (k, value)) =>
        acc.replace("${" + k + "}", String.valueOf(value)) }
    val sources = config.getAll("streaming_source").map { spec =>
      val i = spec.indexOf(':')
      require(i > 0, s"streaming_source must be <view>:<dir>, got `$spec`")
      val (view, dir) = (spec.substring(0, i).trim,
        subst(spec.substring(i + 1).trim))
      val schema = spark.read.option("recursiveFileLookup", "true")
        .parquet(dir).schema
      view -> spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(dir)
    }.toMap
    require(sources.nonEmpty,
      "streaming ETL needs at least one `-- config: " +
      "easy_sql.streaming_source=<view>:<dir>` line")
    val sinkDir = config.get("streaming_sink_dir").map(subst).getOrElse(
      java.nio.file.Files.createTempDirectory("graft_stream_sink").toString)
    val etl = new graft.streaming.StreamingEtl(spark, sql, sources,
      sinkDir, variables = vars)
    etl.run().foreach { q =>
      try { if (!q.awaitTermination(300000)) q.processAllAvailable() }
      finally q.stop()
    }
  }
}
