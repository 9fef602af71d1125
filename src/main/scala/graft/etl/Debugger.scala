package graft.etl

import org.apache.spark.sql.DataFrame

import graft.backend.{Backend, SparkBackend, TableLike}

/** Interactive step-through of an ETL file — the reference's REPL/
  * notebook debugger (easy_sql/sql_processor_debugger.py:15-211,
  * usage README.md:200-231) re-expressed for the Scala/Ammonite/
  * spark-shell workflow.
  *
  * Life cycle: construct → inspect `printSteps()` → `stepOn()` /
  * `stepTo(n)` / `run()` → inspect `vars`, `tempViews`, `showDf` →
  * `restart()` to rebuild a fresh processor (temp views created since
  * construction are dropped, cache cleared). Steps run in dry-run
  * mode, exactly like the reference debugger (`run_step(_, True)`), so
  * `output.` targets land in `<table>_<hex>_output` temp views instead
  * of writing storage.
  */
final class SqlProcessorDebugger(
    sqlFilePath: String,
    backend: Backend,
    initialVars: Map[String, Any] = Map.empty,
    initialFuncs: Map[String, Seq[Any] => Any] = Map.empty,
    initialTemplates: Map[String, String] = Map.empty,
    includes: Map[String, String] = Map.empty,
    skipDuplicateInclude: Boolean = false) {

  private def createProcessor(): SqlProcessor = {
    val sql = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(sqlFilePath)), "UTF-8")
    val p = new SqlProcessor(backend, sql, variables = initialVars,
      templates = initialTemplates, includes = includes,
      skipDuplicateInclude = skipDuplicateInclude)
    if (initialFuncs.nonEmpty) p.registerFuncs(initialFuncs)
    p
  }

  var sqlProcessor: SqlProcessor = createProcessor()
  var steps: Seq[Step] = sqlProcessor.stepList
  private var currentStepIndex: Int = -1
  private var initialTempViews: Seq[String] = tempViews

  def isStarted: Boolean = currentStepIndex > -1
  def isInProgress: Boolean =
    currentStepIndex > -1 && currentStepIndex < steps.length - 1
  def isFinished: Boolean = currentStepIndex == steps.length - 1

  def currentStep: Option[Step] =
    if (isStarted && currentStepIndex < steps.length)
      Some(steps(currentStepIndex)) else None
  def currentStepNo: Option[Int] = currentStep.map(_ => currentStepIndex + 1)
  def nextStep: Option[Step] =
    if (currentStepIndex < steps.length - 1)
      Some(steps(currentStepIndex + 1)) else None
  def nextStepNo: Option[Int] = nextStep.map(_ => currentStepIndex + 2)
  def lastStep: Option[Step] =
    if (currentStepIndex > 0) Some(steps(currentStepIndex - 1)) else None
  def lastStepNo: Option[Int] = lastStep.map(_ => currentStepIndex)
  def leftStepCount: Int = steps.length - 1 - currentStepIndex

  def vars: Map[String, Any] = sqlProcessor.vars
  def addVars(vs: Map[String, Any]): Unit = sqlProcessor.addVars(vs)
  def setVars(vs: Map[String, Any]): Unit = sqlProcessor.setVars(vs)
  def templates: Map[String, String] =
    sqlProcessor.templatesContext.templates

  def tempViews: Seq[String] = backend.tempTables()
  def refreshInitialTempViews(): Unit = initialTempViews = tempViews

  def nativeSql(sql: String): Any = backend.execNativeSql(sql)
  def sqlTable(sql: String): TableLike = backend.execSql(sql)
  /** Spark-typed convenience for notebook workflows; RDB sessions use
    * [[sqlTable]]/[[showDf]], which work on every backend. */
  def sql(sql: String): DataFrame = backend match {
    case sb: SparkBackend => sb.execSql(sql).df
    case _ => throw new graft.core.SqlProcessorException(
      "sql() returns a DataFrame and needs a Spark backend; " +
      "use sqlTable() on RDB sessions")
  }
  def showDf(tableName: String): Unit =
    sqlTable(s"select * from $tableName").show(20)

  def step(stepNo: Int): Option[Step] =
    if (stepNo >= 1 && stepNo <= steps.length) Some(steps(stepNo - 1))
    else None

  def printSteps(): Unit = steps.zipWithIndex.foreach { case (s, i) =>
    println(s"Step ${i + 1}: $s")
  }

  def stepOn(): Unit =
    if (currentStepIndex + 1 < steps.length) {
      sqlProcessor.runStep(steps(currentStepIndex + 1), dryRun = true)
      currentStepIndex += 1
    } else println("Process already ended! Nothing to run!")

  def stepTo(stepNo: Int): Unit = {
    if (stepNo <= 0 || stepNo > steps.length) {
      println(s"step_no must be from [1...${steps.length}], got $stepNo. " +
        "Will not run anything!")
      return
    }
    if (stepNo - 1 <= currentStepIndex) {
      println(s"We are at step ${currentStepIndex + 1} now. Nothing to run!")
      return
    }
    while (currentStepIndex < stepNo - 1) stepOn()
  }

  def run(): Unit = (0 until leftStepCount).foreach(_ => stepOn())
  def runTo(stepNo: Int): Unit = stepTo(stepNo)

  def restart(): Unit = {
    backend.clearCache()
    backend.clearTempTables(exclude = initialTempViews)
    sqlProcessor = createProcessor()
    steps = sqlProcessor.stepList
    currentStepIndex = -1
  }

  def report(): Unit = sqlProcessor.reporter.printReport()
}
