package graft.etl

import graft.core._

/** Step/target language model — `-- target=<type>[.<name>][, if=cond()]`.
  * Parsing mirrors the reference `easy_sql/sql_processor/step.py:72-186`.
  */
object StepType {
  val Temp = "temp"
  val Cache = "cache"
  val Broadcast = "broadcast"
  val Template = "template"
  val Func = "func"
  val Log = "log"
  val Check = "check"
  val Variables = "variables"
  val ListVariables = "list_variables"
  val Hive = "hive"
  val Output = "output"
  val Action = "action"

  val all: Seq[String] = Seq(Temp, Cache, Template, Log, Check, Variables,
    Hive, Func, Broadcast, Output, ListVariables, Action)
}

final case class StepConfig(
    stepType: String,
    name: Option[String],
    condition: Option[String],
    lineNo: Int,
    configLine: String = "") {

  def isTargetNameAFunc: Boolean = name.exists(_.contains("("))
  def hasCondition: Boolean = condition.isDefined

  override def toString: String =
    s"StepConfig(target=$stepType.${name.orNull}, condition=${condition.orNull}, line_no=$lineNo)"
}

object StepConfig {
  val StepConfigPattern = """(?i)^-- target\s*=\s*(\w+)(.*)$""".r
  private val conditionRe = """^\s*(.*)\s*,\s*if\s*=(.*)$""".r
  private val conditionFuncRe = """[a-zA-Z0-9_]*\([^()]*\).*""".r

  def matchesConfigLine(line: String): Boolean =
    StepConfigPattern.findFirstIn(line.trim).isDefined

  def fromConfigLine(configLine: String, lineNo: Int): StepConfig = {
    var configs = configLine.replaceFirst("""^\s*-- """, "").trim
    configs = configs.substring(configs.indexOf('=') + 1)
    var targetType =
      if (configs.contains(".")) configs.substring(0, configs.indexOf('.'))
      else configs
    if (targetType.contains(","))
      targetType = targetType.substring(0, targetType.indexOf(','))
    targetType = targetType.trim
    if (!StepType.all.contains(targetType))
      throw new SqlProcessorException(
        s"unknown step type: type=$targetType, supported_types=${StepType.all}")

    val hadName = configs.contains(".")
    var targetName: Option[String] =
      if (hadName) Some(configs.substring(configs.indexOf('.') + 1).trim)
        .filter(_.nonEmpty)
      else None
    var targetCondition: Option[String] = None

    val condSource = targetName.getOrElse {
      val idx = configs.indexOf(targetType)
      configs.substring(idx + targetType.length)
    }
    conditionRe.findFirstMatchIn(condSource).foreach { m =>
      targetName = if (hadName && targetName.isDefined) Some(m.group(1)) else None
      val cond = m.group(2).trim
      if (!cond.matches(conditionFuncRe.regex))
        throw new SqlProcessorException(
          s"parse step config failed. condition must be like [a-zA-Z0-9_]*\\([^()]*\\), but got $cond. config_line=$configLine")
      targetCondition = Some(cond)
    }
    targetName = targetName.map(_.trim).filter(_.nonEmpty)

    StepConfig(targetType, targetName, targetCondition, lineNo, configLine)
  }
}

/** One executable step: config + SQL body. `read` evaluates the SQL into a
  * DataFrame; `write` dispatches on the target type (step.py:258-538). */
final class Step(
    val id: String,
    var targetConfig: Option[StepConfig] = None,
    var selectSql: Option[String] = None) {

  var executedSql: Option[String] = None
  var renderedName: Option[String] = None
  var renderedCondition: Option[String] = None

  override def toString: String =
    targetConfig.map(_.toString.replaceFirst("StepConfig\\(", "Step(")).getOrElse(s"Step($id)")
}
