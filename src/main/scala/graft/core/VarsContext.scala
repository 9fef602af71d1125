package graft.core

import scala.util.matching.Regex

final class SqlProcessorException(msg: String) extends RuntimeException(msg)

/** Variable substitution engine: `${var}`, `${var:default}`,
  * `${func(a, ${b})}`, recursion to fixpoint, case-insensitive keys,
  * comment-aware (comments are masked before replacement and restored
  * after). Semantics follow the reference `easy_sql/sql_processor/
  * context.py:19-131`; one deliberate divergence: `${var:default}` also
  * works in the whole-string fast path (the reference drops the default
  * there due to an ordering bug at context.py:60-61).
  */
final class VarsContext(
    initialVars: Map[String, Any] = Map.empty,
    initialListVars: Map[String, Seq[Any]] = Map.empty) {

  private var varsMap: Map[String, Any] =
    initialVars.map { case (k, v) => k.toLowerCase -> v }
  private var listVarsMap: Map[String, Seq[Any]] =
    initialListVars.map { case (k, v) => k.toLowerCase -> v }
  private var funcRunner: Option[FuncRunner] = None

  def init(runner: FuncRunner): Unit = funcRunner = Some(runner)
  def runner: Option[FuncRunner] = funcRunner

  def vars: Map[String, Any] = varsMap
  def listVars: Map[String, Seq[Any]] = listVarsMap

  def addVars(vs: Map[String, Any]): Unit =
    varsMap ++= vs.map { case (k, v) => k.toLowerCase -> v }

  def addListVars(vs: Map[String, Seq[Any]]): Unit =
    listVarsMap ++= vs.map { case (k, v) => k.toLowerCase -> v }

  def setVars(vs: Map[String, Any]): Unit =
    varsMap = vs.map { case (k, v) => k.toLowerCase -> v }

  private val wholeVarRe: Regex = """^\$\{([^}]+)\}$""".r
  private val anyVarRe: Regex = """\$\{([^}]+)\}""".r
  private val plainVarRe: Regex = """\$\{[a-zA-Z_0-9]+(:[^}]+)?\}""".r

  private def getVarValue(varName0: String, originalText: String): Any = {
    val (varName, default) = varName0.indexOf(':') match {
      case -1 => (varName0, None)
      case i  => (varName0.substring(0, i), Some(varName0.substring(i + 1)))
    }
    varsMap.get(varName.toLowerCase) match {
      case Some(v) => v
      case None => default.getOrElse(
        throw new SqlProcessorException(
          s"unknown variable `$varName`. text=$originalText, known_vars=$varsMap"))
    }
  }

  /** Replace variables in text; returns the raw value (possibly non-string)
    * when the whole text is a single `${...}` reference. */
  def replaceVariablesAny(text: String, includeFuncs: Boolean = true): Any =
    replaceImpl(text, includeFuncs, commentSubstituted = false)

  def replaceVariables(text: String, includeFuncs: Boolean = true): String =
    Coerce.toStr(replaceVariablesAny(text, includeFuncs))

  private def replaceImpl(text0: String, includeFuncs: Boolean,
      commentSubstituted: Boolean): Any = {
    val originalText = text0
    var text = text0

    wholeVarRe.findFirstMatchIn(text.trim) match {
      case Some(m) if !m.group(1).contains("(") =>
        val raw = m.group(1).trim
        val (name, default) = raw.indexOf(':') match {
          case -1 => (raw, None)
          case i => (raw.substring(0, i).trim, Some(raw.substring(i + 1).trim))
        }
        val result = varsMap.get(name.toLowerCase).orElse(default).orNull
        result match {
          case s: String if s.contains("${") =>
            return replaceImpl(s, includeFuncs, commentSubstituted)
          case other => return other
        }
      case _ => ()
    }

    val substitutor = new CommentSubstitutor()
    if (!commentSubstituted) text = substitutor.substitute(text)

    if (includeFuncs) {
      // vars first so `${f(${a})}` sees `${a}` already substituted
      text = Coerce.toStr(replaceImpl(text, includeFuncs = false,
        commentSubstituted = true))
    }

    val varRe = if (includeFuncs) anyVarRe else plainVarRe
    val sb = new StringBuilder
    var start = 0
    for (mm <- varRe.findAllMatchIn(text)) {
      sb.append(text.substring(start, mm.start))
      val varName = text.substring(mm.start + 2, mm.end - 1)
      val isFunc = varName.contains("(") && {
        val beforeParen = varName.substring(0, varName.indexOf('('))
        !beforeParen.contains(":")
      }
      val value: Any =
        if (isFunc) {
          val runner = funcRunner.getOrElse(
            throw new SqlProcessorException(s"no func runner to run $varName"))
          runner.runFunc(varName, this)
        } else getVarValue(varName, originalText)
      sb.append(Coerce.toStr(value))
      start = mm.end
    }
    sb.append(text.substring(start))
    text = sb.toString

    if (!commentSubstituted) text = substitutor.recover(text)

    if (originalText == text) text
    else replaceImpl(text, includeFuncs, commentSubstituted)
  }
}

/** Python-flavored coercions the step language relies on (vars are strings
  * at rest; function results feed back into SQL text). */
object Coerce {
  def toStr(v: Any): String = v match {
    case null => "null"
    case true => "true"
    case false => "false"
    case d: Double if d.isWhole && math.abs(d) < 1e15 => d.toLong.toString
    case other => other.toString
  }

  /** Reference truthiness (`step.py:261`, python bool()): None/False/0/""
    * are false, everything else true. */
  def truthy(v: Any): Boolean = v match {
    case null => false
    case b: Boolean => b
    case s: String => s.nonEmpty && s != "false" && s != "False"
    case i: Int => i != 0
    case l: Long => l != 0L
    case d: Double => d != 0.0
    case _ => true
  }

  /** True-ish values used by special vars (`step.py:261,341,417`). */
  def isTrueFlag(v: Any): Boolean = v match {
    case null => false
    case b: Boolean => b
    case other =>
      val s = other.toString.toLowerCase
      s == "true" || s == "1"
  }
}
