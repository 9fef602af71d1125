package graft.etl

/** `-p` launcher mode: assemble (and print instead of run) the full
  * `spark-submit` command for an ETL file — the reference's
  * `SparkBackendProcessor.shell_command` (cli/backend_processor.py:111-135)
  * over `SparkBackendConfig` (config/sql_config.py:288-335).
  *
  * Conf precedence, lowest to highest:
  *   1. engine sys defaults (master, deploy mode, app name, warehouse,
  *      derby opts, spark.files carrying the ETL file itself);
  *   2. user defaults (`--default-conf k=v[,k=v]`, repeatable);
  *   3. in-file `-- config: spark.*` lines.
  * For file-list keys (`spark.files`, `spark.jars`,
  * `spark.submit.pyFiles`, `spark.kerberos.keytab`) the higher tiers
  * MERGE — each value is comma-split, resolved against the ETL file's
  * directory, deduped preserving first-seen order — instead of
  * replacing: an in-file extra jar must add to the submitted files, not
  * clobber the ETL file itself. (The reference merges via a python set;
  * insertion order here makes the command deterministic.)
  *
  * The `spark-submit` binary resolves default < `--spark-submit` CLI <
  * in-file `-- config: easy_sql.spark_submit=...`, last in-file
  * occurrence winning (sql_config.py:300-310).
  *
  * @param now injectable clock for the `{sql_name}_{yyyyMMddHHmmss}`
  *            app name (sql_config.py:219-222) so specs can pin output.
  */
final class SparkSubmitCommand(
    now: () => java.time.Instant = () => java.time.Instant.now()) {

  import SparkSubmitCommand._

  def assemble(sql: String, sqlFile: String,
      userDefaultConf: Seq[String] = Nil,
      varsArg: Option[String] = None,
      dryRun: Boolean = false,
      entryJar: String = "graft-assembly.jar",
      sparkSubmit: String = "spark-submit"): String = {
    val config = EasySqlConfig.fromSql(sql)
    require(config.backend == "spark",
      s"-p supports the spark backend only, got ${config.backend}")

    val sqlPath = java.nio.file.Paths.get(sqlFile).toAbsolutePath
    val baseDir = Option(sqlPath.getParent)
      .getOrElse(java.nio.file.Paths.get("."))
    val taskName = {
      val base = sqlPath.getFileName.toString.stripSuffix(".sql")
      val stamp = java.time.format.DateTimeFormatter
        .ofPattern("yyyyMMddHHmmss").withZone(java.time.ZoneOffset.UTC)
        .format(now())
      s"${base}_$stamp"
    }

    val sysDefaults = Seq(
      "spark.master=local[2]",
      "spark.submit.deployMode=client",
      s"spark.app.name=$taskName",
      "spark.sql.warehouse.dir=/tmp/spark-warehouse-localdw",
      "spark.driver.extraJavaOptions=\"-Dderby.system.home=" +
        "/tmp/spark-warehouse-metastore -Dderby.stream.error.file=" +
        "/tmp/spark-warehouse-metastore.log\"",
      s"""spark.files="$sqlPath"""")

    def resolve(f: String): String = {
      val p = java.nio.file.Paths.get(f.trim)
      (if (p.isAbsolute) p else baseDir.resolve(p).normalize())
        .toString
    }
    def files(v: String): Seq[String] =
      v.stripPrefix("\"").stripSuffix("\"").split(",").toSeq
        .map(_.trim).filter(_.nonEmpty)

    // insertion-ordered: sys-default keys first, new keys appended in
    // the order the higher tiers introduce them
    val args = scala.collection.mutable.LinkedHashMap[String, String]()
    def kv(c: String): (String, String) = c.split("=", 2) match {
      case Array(k, v) => (k.trim, v.trim)
      case _ => throw new IllegalArgumentException(
        s"malformed conf `$c`: expected key=value")
    }
    sysDefaults.foreach { c => val (k, v) = kv(c); args(k) = v }
    Seq(userDefaultConf, config.backendConf).foreach(_.foreach { c =>
      val (k, v) = kv(c)
      if (FileKeys.contains(k)) {
        val merged = (files(args.getOrElse(k, "")) ++
          files(v).map(resolve)).distinct
        args(k) = "\"" + merged.mkString(",") + "\""
      } else args(k) = v
    })

    // binary precedence: default < CLI < in-file easy_sql.spark_submit
    // (last in-file occurrence wins)
    val submit = config.easySqlConf.foldLeft(sparkSubmit) { (acc, c) =>
      if (EasySqlConfig.keyOf(c) == "spark_submit") EasySqlConfig.valueOf(c)
      else acc
    }

    val confArgs = args.map { case (k, v) => s"--conf $k=$v" }
    (Seq(submit) ++ confArgs ++ Seq(
      "--class", "graft.DataProcess", "\"" + entryJar + "\"",
      "-f", sqlFile,
      "--dry-run", if (dryRun) "1" else "0") ++
      varsArg.toSeq.flatMap(v => Seq("-v", v))).mkString(" ")
  }
}

object SparkSubmitCommand {
  /** Conf keys whose values are comma-joined file lists that merge
    * across tiers instead of replacing (`_build_conf_command_args`
    * file_keys, sql_config.py:318-323). */
  val FileKeys: Set[String] = Set("spark.files", "spark.jars",
    "spark.submit.pyFiles", "spark.kerberos.keytab")
}
