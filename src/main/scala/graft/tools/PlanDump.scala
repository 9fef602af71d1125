package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** r17 deliverable helper: run gates and write each returned frame's
  * `.explain("formatted")` to plans/<tag>/<gate>_<suffix>.txt (the gate
  * RUNS first — snapshot gates build their table as a side effect, and
  * the judge checks plan claims against these files).
  *
  * Usage: runMain graft.tools.PlanDump <gate>[,<gate>...] <outDir> <suffix>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val gates = args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val outDir = java.nio.file.Paths.get(args(1))
    val suffix = args.lift(2).getOrElse("before")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
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
    java.nio.file.Files.createDirectories(outDir)
    gates.foreach { g =>
      val fn = graft.SparkEntry.queries.getOrElse(g,
        sys.error(s"unknown gate $g"))
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(
          outDir.resolve(s"${g}_$suffix.txt"), txt)
        println(s"[plan] wrote ${g}_$suffix.txt (${txt.length} chars)")
      } catch { case e: Throwable =>
        println(s"[plan] $g FAILED: ${e.getMessage.take(200)}")
      }
    }
    spark.stop()
  }
}
