package graft.etl

import org.scalatest.funsuite.AnyFunSuite

/** `-p` print-command mode: exact assembled spark-submit command with
  * conflicting confs at all three precedence levels (reference
  * backend_processor.py:111-135 + sql_config.py:288-335). */
class SparkSubmitCommandSpec extends AnyFunSuite {

  private val clock =
    () => java.time.Instant.parse("2024-06-01T08:30:00Z")

  test("three-level conf precedence, file-key merge, exact command") {
    val dir = java.nio.file.Files.createTempDirectory("g_submit")
    val etl = dir.resolve("my_etl.sql")
    // in-file confs conflict with user defaults AND sys defaults:
    //  - spark.master set at all three levels -> in-file yarn wins
    //  - spark.executor.memory set at user + in-file -> in-file 4g wins
    //  - spark.files is a FILE KEY -> tiers merge instead of replace
    //  - easy_sql.spark_submit overrides the binary (twice; last wins)
    java.nio.file.Files.write(etl,
      ("""-- backend: spark
         |-- config: spark.master=yarn
         |-- config: spark.executor.memory=4g
         |-- config: spark.files=extra_dim.csv
         |-- config: easy_sql.spark_submit=spark-submit-3.2
         |-- config: easy_sql.spark_submit=spark-submit-3.3
         |-- target=temp.t
         |select 1 as a
         |""".stripMargin).getBytes("UTF-8"))

    val cmd = new SparkSubmitCommand(clock).assemble(
      new String(java.nio.file.Files.readAllBytes(etl), "UTF-8"),
      etl.toString,
      userDefaultConf = Seq(
        "spark.master=local[8]",        // loses to in-file yarn
        "spark.executor.memory=2g",     // loses to in-file 4g
        "spark.executor.instances=3",   // only set here -> survives
        s"spark.files=$dir/shared_udf.jar"), // merges, not replaces
      varsArg = Some("dt=2024-06-01"),
      dryRun = true,
      entryJar = "/opt/app/graft-assembly.jar")

    assert(cmd ==
      "spark-submit-3.3 " +
      "--conf spark.master=yarn " +
      "--conf spark.submit.deployMode=client " +
      "--conf spark.app.name=my_etl_20240601083000 " +
      "--conf spark.sql.warehouse.dir=/tmp/spark-warehouse-localdw " +
      "--conf spark.driver.extraJavaOptions=" +
      "\"-Dderby.system.home=/tmp/spark-warehouse-metastore " +
      "-Dderby.stream.error.file=/tmp/spark-warehouse-metastore.log\" " +
      s"""--conf spark.files="$etl,$dir/shared_udf.jar,$dir/extra_dim.csv" """ +
      "--conf spark.executor.memory=4g " +
      "--conf spark.executor.instances=3 " +
      "--class graft.DataProcess \"/opt/app/graft-assembly.jar\" " +
      s"-f $etl --dry-run 1 -v dt=2024-06-01")
  }

  test("defaults alone: binary, master and app-name fall through") {
    val dir = java.nio.file.Files.createTempDirectory("g_submit2")
    val etl = dir.resolve("plain.sql")
    java.nio.file.Files.write(etl,
      "-- backend: spark\n-- target=temp.t\nselect 1 as a\n"
        .getBytes("UTF-8"))
    val cmd = new SparkSubmitCommand(clock).assemble(
      new String(java.nio.file.Files.readAllBytes(etl), "UTF-8"),
      etl.toString)
    assert(cmd.startsWith("spark-submit --conf spark.master=local[2] "))
    assert(cmd.contains("--conf spark.app.name=plain_20240601083000 "))
    assert(cmd.contains(s"""--conf spark.files="$etl" """))
    assert(cmd.endsWith(s"""--class graft.DataProcess "graft-assembly.jar" -f $etl --dry-run 0"""))
  }

  test("relative in-file file-key entries resolve against the ETL dir") {
    val dir = java.nio.file.Files.createTempDirectory("g_submit3")
    val etl = dir.resolve("rel.sql")
    java.nio.file.Files.write(etl,
      ("-- backend: spark\n" +
       "-- config: spark.jars=libs/dep.jar,/abs/other.jar\n" +
       "-- target=temp.t\nselect 1 as a\n").getBytes("UTF-8"))
    val cmd = new SparkSubmitCommand(clock).assemble(
      new String(java.nio.file.Files.readAllBytes(etl), "UTF-8"),
      etl.toString)
    assert(cmd.contains(
      s"""--conf spark.jars="$dir/libs/dep.jar,/abs/other.jar" """))
  }

  test("non-spark backend is rejected in -p mode") {
    intercept[IllegalArgumentException] {
      new SparkSubmitCommand(clock).assemble(
        "-- backend: flink\n-- target=temp.t\nselect 1 as a\n",
        "/tmp/x.sql")
    }
  }
}
