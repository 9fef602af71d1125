package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.etl.{GoldenDataTester, XlsxCases}

/** CLI twin of the reference's test runner
  * (easy_sql/sql_test.py:102-139): run golden-data fixture files
  * (xlsx workbooks or JSON) against a local session, or convert xlsx
  * workbooks to the JSON case format.
  *
  * {{{
  * spark-submit --class graft.SqlTest ... run-test -f a.xlsx,b.json
  * spark-submit --class graft.SqlTest ... convert-json -f a.xlsx
  * }}}
  *
  * Exit code 1 if any case fails (sql_test.py:115).
  */
object SqlTest {

  def main(args: Array[String]): Unit = args.toList match {
    case "run-test" :: rest => sys.exit(runTest(parseFiles(rest)))
    case "convert-json" :: rest => convertJson(parseFiles(rest))
    case other =>
      System.err.println(
        s"usage: run-test|convert-json -f file1,file2,... (got: $other)")
      sys.exit(2)
  }

  private def parseFiles(rest: List[String]): Seq[String] = {
    val files = rest match {
      case ("-f" | "--files") :: v :: _ => v
      case v :: _ => v
      case Nil => ""
    }
    val out = files.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    out.filterNot(f => Files.exists(Paths.get(f))) match {
      case Nil => out
      case missing =>
        System.err.println(s"[ERROR] File does not exist: $missing")
        sys.exit(1)
    }
  }

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft_wh_${ProcessHandle.current.pid}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Returns the process exit code: 0 all passed, 1 any failure. */
  def runTest(files: Seq[String], sparkOpt: Option[SparkSession] = None)
      : Int = {
    val spark = sparkOpt.getOrElse(session())
    var failed = 0
    files.foreach { f =>
      val baseDir = Paths.get(f).toAbsolutePath.getParent.toString
      val results = GoldenDataTester.runCasesFromFile(spark, f, baseDir)
      results.foreach { r =>
        val mark = if (r.passed) "PASSED" else "FAILED"
        println(s"[$mark] $f :: ${r.name}")
        if (!r.passed) { failed += 1; r.failures.foreach(m => println(s"  $m")) }
      }
    }
    if (failed > 0) 1 else 0
  }

  /** xlsx → the JSON case format GoldenDataTester parses (mirrors
    * sql_tester.py convert_cases_to_json: output lands next to the
    * input as `<file>.json`; pass an `-o dir` to redirect when the
    * source dir is read-only). */
  def convertJson(files: Seq[String], outDir: Option[String] = None): Unit =
    files.foreach { f =>
      val sqlPath = f.stripSuffix(".xlsx") + ".sql"
      val hasSql = Files.exists(Paths.get(sqlPath))
      val cases = XlsxCases.parseFile(f,
        sqlOverride = if (hasSql) None else Some(""))
      val json = casesToJson(cases,
        sqlFilePath = if (hasSql) Some(Paths.get(sqlPath).getFileName.toString)
                      else None)
      val target = outDir match {
        case Some(dir) => Paths.get(dir,
          Paths.get(f.stripSuffix(".xlsx") + ".json").getFileName.toString)
        case None => Paths.get(f.stripSuffix(".xlsx") + ".json")
      }
      Files.writeString(target, json)
      println(s"converted: $f -> $target")
    }

  private def jq(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def jVal(v: Any): String = v match {
    case null => "null"
    case s: String => jq(s)
    case other => jq(other.toString)
  }

  private def fixtureJson(t: GoldenDataTester.TableFixture): String = {
    val rows = t.values.map(r =>
      "[" + r.map(jVal).mkString(", ") + "]").mkString(", ")
    s"""{ "name": ${jq(t.name)},
       |  "columns": [${t.columns.map(jq).mkString(", ")}],
       |  "column_types": [${t.columnTypes.map(jq).mkString(", ")}],
       |  "values": [$rows] }""".stripMargin
  }

  private[graft] def casesToJson(cases: Seq[GoldenDataTester.TestCase],
      sqlFilePath: Option[String]): String = {
    val body = cases.map { c =>
      val sqlField = sqlFilePath match {
        case Some(p) => s""""sql_file_path": ${jq(p)}"""
        case None => s""""sql_file_content": ${jq(c.sql)}"""
      }
      val vars = c.vars.map { case (k, v) =>
        s"${jq(k)}: ${if (v == null) "null" else jq(v)}" }.mkString(", ")
      val includes = c.includes.map { case (k, v) =>
        s"${jq(k)}: ${jq(v)}" }.mkString(", ")
      s"""{
         |  "name": ${jq(c.name)},
         |  $sqlField,
         |  "vars": {$vars},
         |  "includes": {$includes},
         |  "udf_file_paths": [], "func_file_paths": [],
         |  "inputs": [${c.inputs.map(fixtureJson).mkString(",\n")}],
         |  "outputs": [${c.outputs.map(fixtureJson).mkString(",\n")}]
         |}""".stripMargin
    }
    "[\n" + body.mkString(",\n") + "\n]"
  }
}
