package graft.etl

/** Pluggable task-report sink.
  *
  * The reference ships the same per-step report to stdout, an HDFS path
  * and an Elasticsearch endpoint, dispatched by which CLI/config knobs
  * are set (easy_sql/sql_processor/report.py:87-103). Here each
  * destination is a `ReportSink`; `SqlProcessor` ships to every
  * configured sink in its run-finally, success or failure alike.
  */
trait ReportSink {
  def ship(taskId: String, reportJson: String): Unit

  /** Short human-readable identity for error messages. */
  def describe: String
}

/** Hadoop-FS sink — the Spark-native analog of the reference's HDFS sink
  * (report.py:113-143, which stages to a local tmp file and
  * `hdfs dfs -put`s it): one Hadoop FS write, atomic-enough for a
  * monitoring artifact, works for file:/, hdfs:/ and s3:/ paths.
  */
final class FileReportSink(path: String,
    hadoopConf: org.apache.hadoop.conf.Configuration) extends ReportSink {
  def ship(taskId: String, reportJson: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hadoopConf)
    val out = fs.create(p, true)
    try out.write(reportJson.getBytes("UTF-8"))
    finally out.close()
  }
  def describe: String = s"file($path)"
}

/** Elasticsearch-shaped HTTP sink: POST the report document to
  * `{base}/{prefix}_task_report/_doc` with a `created_at` stamp —
  * the reference's `EsService.post` + `Reporter.report_task_result`
  * (easy_sql/report.py:5-24,64-86: Content-Type json, non-2xx raises).
  * Plain `java.net.http` — no client library, so it works against any
  * ES-compatible HTTP endpoint and is spec-testable with a stub server.
  *
  * @param now injectable clock so specs can pin `created_at`.
  */
final class EsReportSink(baseUrl: String, indexPrefix: String = "",
    now: () => java.time.Instant = () => java.time.Instant.now())
    extends ReportSink {

  private val indexName =
    if (indexPrefix.nonEmpty) s"${indexPrefix}_task_report"
    else "task_report"

  private def q(s: String): String = Reporter.jsonQuote(s)

  def ship(taskId: String, reportJson: String): Unit = {
    val createdAt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss")
      .withZone(java.time.ZoneOffset.UTC)
      .format(now())
    val payload = s"""{"task_id": ${q(taskId)}, """ +
      s""""report": ${q(reportJson)}, "created_at": ${q(createdAt)}}"""
    // bounded timeouts: report shipping runs in the ETL's finally —
    // a hung monitoring endpoint must not hang the task forever
    val req = java.net.http.HttpRequest.newBuilder()
      .uri(java.net.URI.create(
        s"${baseUrl.stripSuffix("/")}/$indexName/_doc"))
      .header("Content-Type", "application/json")
      .timeout(java.time.Duration.ofSeconds(30))
      .POST(java.net.http.HttpRequest.BodyPublishers
        .ofString(payload, java.nio.charset.StandardCharsets.UTF_8))
      .build()
    val resp = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(10)).build()
      .send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new RuntimeException(
        s"send task report failed(status=${resp.statusCode()}): " +
          resp.body())
  }
  def describe: String = s"es($baseUrl, index=$indexName)"
}
