package graft.etl

/** Header-directive parsing: `-- backend:`, `-- config:`, `-- inputs:`,
  * `-- outputs:`, `-- prepare-sql:`, `easy_sql.etl_type=streaming|batch`.
  * Mirrors reference `easy_sql/config/sql_config.py:19-52,104-230`; only
  * the spark backend is in scope (the others raise at run time).
  */
final case class EasySqlConfig(
    sql: String,
    backend: String,
    backendConf: Seq[String],
    easySqlConf: Seq[String],
    inputTables: Seq[String],
    outputTables: Seq[String]) {

  def get(key: String): Option[String] =
    easySqlConf.reverse.collectFirst {
      case c if EasySqlConfig.keyOf(c) == key => EasySqlConfig.valueOf(c)
    }

  /** Every value of a repeatable easy_sql conf key, in file order
    * (e.g. one `streaming_source` line per source view). */
  def getAll(key: String): Seq[String] =
    easySqlConf.collect {
      case c if EasySqlConfig.keyOf(c) == key => EasySqlConfig.valueOf(c)
    }

  def isBatch: Boolean = get("etl_type").forall(_ != "streaming")
  def isStreaming: Boolean = !isBatch

  def prepareSqlList: Seq[String] =
    sql.split("\n", -1).toSeq.collect {
      case l if l.matches("""^-- \s*prepare-sql:.*$""") =>
        EasySqlConfig.after(l, "prepare-sql:")
    }

  def tables: Seq[String] = (inputTables ++ outputTables).map(_.trim).distinct
}

object EasySqlConfig {
  val SupportedBackends: Seq[String] =
    Seq("spark", "postgres", "clickhouse", "maxcompute", "bigquery", "flink")

  private def after(line: String, splitter: String): String =
    line.substring(line.indexOf(splitter) + splitter.length).trim

  private[etl] def keyOf(conf: String): String =
    conf.split("=", 2)(0).trim

  private[etl] def valueOf(conf: String): String =
    if (conf.contains("=")) conf.split("=", 2)(1).trim else ""

  def fromSql(sql: String,
      systemConfigPrefix: String = "easy_sql."): EasySqlConfig = {
    val lines = sql.split("\n", -1).toSeq

    val backend = lines.collectFirst {
      case l if l.matches("""^-- \s*backend:.*$""") =>
        after(l, "backend:").split(" ")(0)
    }.getOrElse("spark")
    if (!SupportedBackends.contains(backend))
      throw new graft.core.SqlProcessorException(
        s"unsupported backend `$backend`, all supported backends are: $SupportedBackends")

    def parseTables(kind: String): Seq[String] = lines.collect {
      case l if l.matches(s"""^-- \\s*$kind:.*$$""") =>
        after(l, kind + ":").split(",").toSeq.map(_.trim)
    }.flatten

    val backendConf = scala.collection.mutable.ArrayBuffer[String]()
    val easyConf = scala.collection.mutable.ArrayBuffer[String]()
    lines.foreach { l =>
      if (l.matches("""^-- \s*config:.*$""")) {
        val v = after(l, "config:")
        if (v.toLowerCase.startsWith(systemConfigPrefix))
          easyConf += v.substring(systemConfigPrefix.length).trim
        else backendConf += v
      }
    }

    EasySqlConfig(sql, backend, backendConf.toSeq, easyConf.toSeq,
      parseTables("inputs"), parseTables("outputs"))
  }
}
