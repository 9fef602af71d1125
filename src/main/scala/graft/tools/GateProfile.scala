package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable.ArrayBuffer

/** r17 measurement harness (optimization guide §1): attribute one
  * gate's wall time to its individual Spark jobs and to the DRIVER
  * GAPS between them (planning, FS metadata, manifest I/O, collects).
  *
  * Usage: runMain graft.tools.GateProfile <gate>[,<gate>...] [reps]
  *
  * Per gate: every rep's wall time, then for the LAST (warm) rep a
  * job timeline — start offset, duration, callsite — plus the sum of
  * job time vs wall time. Jobs overlap is not de-duplicated (rare in
  * these gates; the loop is sequential), so "gap" = wall − span of
  * job intervals, computed over the merged union of intervals.
  */
object GateProfile {
  private case class JobRec(id: Int, desc: String, start: Long,
      var end: Long = -1L)

  def main(args: Array[String]): Unit = {
    val gates = args.headOption
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq("group_agg"))
    val reps = args.lift(1).flatMap(_.toIntOption).getOrElse(2)
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
    spark.range(1000000).selectExpr("sum(id)").collect()
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case _: Throwable => () }

    val jobs = ArrayBuffer.empty[JobRec]
    // written by the main thread, read by the listener-bus thread
    @volatile var recording = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        if (recording) jobs.synchronized {
          val d = Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .orElse(Option(js.properties)
              .flatMap(p => Option(p.getProperty("callSite.short"))))
            .getOrElse("?")
          val stages = js.stageInfos.map(si =>
            s"${si.name.takeWhile(_ != '\n').take(60)}/${si.numTasks}t")
            .mkString(" | ")
          jobs += JobRec(js.jobId, s"$d :: $stages", js.time)
        }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        if (recording) jobs.synchronized {
          jobs.find(_.id == je.jobId).foreach(_.end = je.time)
        }
    })

    gates.foreach { g =>
      val fn = graft.SparkEntry.queries.getOrElse(g,
        sys.error(s"unknown gate $g"))
      var t0Wall = 0L
      (1 to reps).foreach { i =>
        val last = i == reps
        if (last) { jobs.clear(); recording = true }
        t0Wall = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          println(s"[prof] $g FAILED: ${e.getMessage.take(200)}") }
        val wall = (System.nanoTime() - t0Wall) / 1e9
        if (last) recording = false
        println(f"[prof] $g%-28s rep$i wall $wall%8.3f s")
        if (last) {
          // merged-interval span of job activity vs wall
          val ivs = jobs.filter(_.end > 0).map(j => (j.start, j.end))
            .sortBy(_._1)
          var span = 0L; var curS = -1L; var curE = -1L
          ivs.foreach { case (s0, e0) =>
            if (curE < 0) { curS = s0; curE = e0 }
            else if (s0 <= curE) curE = math.max(curE, e0)
            else { span += curE - curS; curS = s0; curE = e0 }
          }
          if (curE > 0) span += curE - curS
          val base = ivs.headOption.map(_._1).getOrElse(0L)
          jobs.foreach { j =>
            val dur = if (j.end > 0) (j.end - j.start) / 1e3 else -1.0
            println(f"[prof]   job${j.id}%-5d +${(j.start - base) / 1e3}%9.3f s ${dur}%8.3f s  ${j.desc.take(200)}")
          }
          println(f"[prof] $g: ${jobs.size} jobs, job-span ${span / 1e3}%.3f s, wall $wall%.3f s, driver-gap ${wall - span / 1e3}%.3f s")
        }
      }
    }
    spark.stop()
  }
}
