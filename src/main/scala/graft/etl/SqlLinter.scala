package graft.etl

import scala.util.matching.Regex

import graft.core.{CommentSubstitutor, SqlProcessorException, TemplatesContext}

final case class LintViolation(stepId: String, lineNo: Int, rule: String,
    message: String) {
  override def toString: String = s"[$rule] step $stepId (line $lineNo): $message"
}

/** Static linter for Easy-SQL ETL files — the Spark-native counterpart
  * of the reference's sqlfluff-based `sql_linter/sql_linter.py:21-238`.
  * Where the reference delegates syntax checking to sqlfluff dialects,
  * this engine asks the authority directly: each step's SQL (templates
  * expanded, variables masked) must parse through Catalyst's own
  * `CatalystSqlParser`, so "lints clean" means "the real engine will
  * parse it". On top of that, Easy-SQL semantic rules the reference's
  * style rules can't see:
  *
  *  - `backend`          unsupported/missing `-- backend:` header
  *  - `syntax`           step SQL fails Catalyst parsing
  *  - `target-format`    output/hive target not `db.table`
  *  - `missing-sql`      a step type that needs a SQL body has none
  *  - `undefined-template` `@{t}` with no prior `template.t` step
  *  - `undefined-variable` `${v}` never defined, no default, not external
  *  - `duplicate-target` same temp/cache/broadcast/template defined twice
  *  - `unused-target`    defined view/template never referenced later
  *  - `check-shape`      query-form check without actual/expected aliases
  *  - `bq-schema`        (backend: bigquery only) table reference without
  *                       a dataset qualifier — BigQuery has no `use db`,
  *                       so every table must be `dataset.table` (the
  *                       reference's one backend-specific rule,
  *                       sql_linter/rules/bq_schema_rule.py:13-51; its
  *                       fix prepends `\${temp_db}.`)
  *
  * All static — nothing executes, no SparkSession needed.
  */
final class SqlLinter(
    sql: String,
    knownVars: Set[String] = Set.empty,
    includeRules: Option[Seq[String]] = None,
    excludeRules: Seq[String] = Nil) {

  // the engine's Spark runtime + the RDB dialect family
  // (backend/rdb/Dialects.scala, WarehouseDialects.scala); flink is the
  // declared non-goal (streaming maps to Structured Streaming)
  private val supportedBackends =
    Seq("spark", "postgres", "clickhouse", "bigquery", "maxcompute")
  private val varRe: Regex = """\$\{([^}]*)\}""".r
  private val tmplRe: Regex = """(?i)@\{\s*(\w+)""".r
  private val aliasRe: Regex = """(?i)\bas\s+`?([a-zA-Z_]\w*)`?""".r

  private def enabled(rule: String): Boolean =
    includeRules.forall(_.contains(rule)) && !excludeRules.contains(rule)

  private lazy val steps: Seq[Step] = new StepFactory().createFromSql(sql)

  def lint(): Seq[LintViolation] = {
    val out = scala.collection.mutable.ArrayBuffer[LintViolation]()
    def report(step: Option[Step], rule: String, msg: String): Unit =
      if (enabled(rule))
        out += LintViolation(
          step.map(_.id).getOrElse("-"),
          step.flatMap(_.targetConfig).map(_.lineNo).getOrElse(0),
          rule, msg)

    // backend header: a missing header defaults to spark (the reference
    // only warns, sql_linter.py:38-41); an unsupported one is an error
    val backend = sql.linesIterator
      .collectFirst { case l if l.trim.matches("(?i)^--\\s*backend:.*") =>
        l.substring(l.indexOf(":") + 1).trim.split("\\s+").head }
    backend.filterNot(supportedBackends.contains).foreach(b =>
      report(None, "backend",
        s"unsupported backend `$b`, supported: ${supportedBackends.mkString(",")}"))

    val templates = new TemplatesContext()
    val defined = scala.collection.mutable.Set[String]() ++
      knownVars.map(_.toLowerCase)
    var varsAreDynamic = false // after list_variables, names are data-driven
    val viewDefs = scala.collection.mutable.LinkedHashMap[String, Step]()
    val referenced = scala.collection.mutable.Set[String]()

    val sqlNeeded = Set(StepType.Temp, StepType.Cache, StepType.Broadcast,
      StepType.Output, StepType.Hive, StepType.Log, StepType.Variables,
      StepType.ListVariables, StepType.Template)

    steps.filter(_.targetConfig.isDefined).foreach { step =>
      val config = step.targetConfig.get
      val body = step.selectSql.getOrElse("")
      val isFuncStyle = config.isTargetNameAFunc

      if (body.trim.isEmpty && sqlNeeded.contains(config.stepType))
        report(Some(step), "missing-sql",
          s"${config.stepType} step has no SQL body")

      if ((config.stepType == StepType.Output ||
           config.stepType == StepType.Hive) &&
          config.name.exists(n => n.split("\\.").length < 2))
        report(Some(step), "target-format",
          s"table name for hive or output must be of format DB.TABLE_NAME, " +
          s"got `${config.name.get}`")

      // reference records which views later steps read by simple
      // containment — good enough for a linter (quoted/commented
      // matches are masked first)
      val masked = new CommentSubstitutor().substitute(body).toLowerCase
      viewDefs.keys.foreach { v =>
        if (masked.matches(s"(?s).*\\b${Regex.quote(v)}\\b.*"))
          referenced += v
      }
      tmplRe.findAllMatchIn(masked).foreach(m =>
        referenced += m.group(1).toLowerCase)
      // func-style targets (check.f(a,b), func.f(a,b)) and if=
      // conditions consume views through their ARGUMENTS, not a SQL
      // body — scan those too, or a view read only by a func step is
      // falsely reported unused
      (config.name.filter(_ => isFuncStyle) ++ config.condition)
        .map(_.toLowerCase).foreach { call =>
          viewDefs.keys.foreach { v =>
            if (call.matches(s"(?s).*\\b${Regex.quote(v)}\\b.*"))
              referenced += v
          }
        }
      // snapshot BEFORE this step registers its own target: references
      // found in the expanded text below must not let a step mark its
      // own definition as used
      val priorViews = viewDefs.keySet.toSet

      config.stepType match {
        case StepType.Template =>
          val name = config.name.getOrElse("")
          if (viewDefs.contains(name.toLowerCase))
            report(Some(step), "duplicate-target",
              s"template `$name` defined more than once")
          templates.addTemplates(Map(name -> body))
          if (name.nonEmpty) viewDefs(name.toLowerCase) = step
        case StepType.Temp | StepType.Cache | StepType.Broadcast
            if config.name.isDefined =>
          val name = config.name.get.toLowerCase
          if (viewDefs.contains(name))
            report(Some(step), "duplicate-target",
              s"${config.stepType} view `${config.name.get}` shadows an " +
              "earlier definition")
          viewDefs(name) = step
        case _ => ()
      }

      // expand templates; failure = reference to an undefined template
      val expanded: Option[String] =
        try Some(templates.replaceTemplates(body))
        catch {
          case e: SqlProcessorException =>
            report(Some(step), "undefined-template", e.getMessage)
            None
        }

      expanded.foreach { text =>
        val maskedText = new CommentSubstitutor().substitute(text)
        // re-scan the EXPANDED text: a view consumed only inside a
        // template body is a real reference the raw-body scan can't see
        val expandedLower = maskedText.toLowerCase
        priorViews.foreach { v =>
          if (expandedLower.matches(s"(?s).*\\b${Regex.quote(v)}\\b.*"))
            referenced += v
        }
        // variable references: `${f(...)}` is a func call (runtime),
        // `${v:default}` carries its fallback — both fine statically
        varRe.findAllMatchIn(maskedText).foreach { m =>
          val ref = m.group(1)
          if (!ref.contains("(") && !ref.contains(":")) {
            val name = ref.trim.toLowerCase
            if (!varsAreDynamic && !defined.contains(name) &&
                !name.startsWith("__"))
              report(Some(step), "undefined-variable",
                s"variable `${ref.trim}` is never defined and has no default")
          }
        }

        if (config.stepType == StepType.Check && !isFuncStyle &&
            body.trim.nonEmpty &&
            !(maskedText.toLowerCase.contains("actual") &&
              maskedText.toLowerCase.contains("expected")))
          report(Some(step), "check-shape",
            "query-form check should produce `actual` and `expected` columns")

        // syntax: what Catalyst's parser rejects, SqlProcessor will
        // reject at run time. Variables/templates already handled; mask
        // the leftovers with a benign identifier. Action steps are
        // skipped: they may use session-only statements Catalyst's
        // parser does not own.
        val syntaxEligible = sqlNeeded.contains(config.stepType) &&
          config.stepType != StepType.Template && body.trim.nonEmpty
        if (syntaxEligible) {
          val probe = varRe.replaceAllIn(text, "__lint_var__")
            .trim.stripSuffix(";")
          try {
            val plan = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
              .parsePlan(probe)
            // bq-schema (backend: bigquery): BigQuery has no `use db`, so
            // every table reference must carry its dataset. Catalyst's
            // parse tree IS the table_reference crawl — single-part
            // UnresolvedRelations are the unqualified reads; CTE names
            // are exempt only within the scope of the With that defines
            // them (a bare table sharing a name with a CTE in an
            // UNRELATED scope of the same statement is still a
            // violation). (`${temp_db}.t` masks to `__lint_var__.t`,
            // two-part — the reference's own fix.)
            if (backend.contains("bigquery")) {
              import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
              import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
              import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnresolvedWith}
              val bare = scala.collection.mutable.ArrayBuffer[String]()
              def scan(p: LogicalPlan, scope: Set[String]): Unit = p match {
                case r: UnresolvedRelation =>
                  if (r.multipartIdentifier.length == 1 &&
                      !scope.contains(
                        r.multipartIdentifier.head.toLowerCase))
                    bare += r.multipartIdentifier.head
                case w: UnresolvedWith =>
                  // scope accumulates INCREMENTALLY: a non-recursive
                  // WITH's CTE body may reference only previously
                  // defined siblings, so a bare name matching a LATER
                  // sibling is an illegal forward reference in BigQuery
                  // and must still be reported
                  val inner = w.cteRelations.foldLeft(scope) {
                    case (sc, rel) =>
                      scan(rel._2, sc)
                      sc + rel._1.toLowerCase
                  }
                  scan(w.child, inner)
                case other =>
                  other.children.foreach(scan(_, scope))
                  // scalar/EXISTS/IN subqueries live inside expressions,
                  // not children, and share the enclosing scope
                  other.expressions.foreach(_.foreach {
                    case sq: SubqueryExpression => scan(sq.plan, scope)
                    case _ => ()
                  })
              }
              scan(plan, Set.empty)
              bare.distinct.foreach(t =>
                report(Some(step), "bq-schema",
                  s"no dataset found when selecting from table `$t` — " +
                  "BigQuery tables must be dataset-qualified " +
                  s"(e.g. $${temp_db}.$t)"))
            }
          } catch {
            case e: org.apache.spark.sql.catalyst.parser.ParseException =>
              report(Some(step), "syntax",
                e.getMessage.linesIterator.take(2).mkString(" ").trim)
          }
        }
      }

      if (config.stepType == StepType.Variables)
        aliasRe.findAllMatchIn(body).foreach(m =>
          defined += m.group(1).toLowerCase)
      if (config.stepType == StepType.ListVariables)
        varsAreDynamic = true
    }

    viewDefs.foreach { case (name, step) =>
      if (!referenced.contains(name))
        report(Some(step), "unused-target",
          s"`$name` is defined but never referenced by a later step")
    }
    out.toSeq
  }

  /** Normalized ETL text (the reference's `fix` runs sqlfluff
    * auto-fixes; the engine-owned analog is conservative): trailing
    * whitespace stripped, a `-- backend: spark` header prepended when
    * the file has none. Step SQL is left byte-identical — the runtime
    * already tolerates trailing semicolons. */
  def fix(): String = {
    val stripped = sql.linesIterator.map(l =>
      l.replaceAll("\\s+$", "")).mkString("\n")
    val hasBackend = sql.linesIterator
      .exists(_.trim.matches("(?i)^--\\s*backend:.*"))
    (if (hasBackend) stripped
     else "-- backend: spark\n" + stripped) +
      (if (sql.endsWith("\n")) "\n" else "")
  }
}

/** CLI — the counterpart of `sql_linter_cli.py`:
  * `graft.etl.SqlLint -f etl.sql [--include r1,r2] [--exclude r1,r2]
  * [--vars a=1,b=2] [--fix] [--inplace]`. Exit 1 when violations found. */
object SqlLint {
  def main(args: Array[String]): Unit = {
    var file: Option[String] = None
    var include: Option[Seq[String]] = None
    var exclude: Seq[String] = Nil
    var vars: Set[String] = Set.empty
    var fix = false
    var inplace = false
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "-f" => file = Some(args(i + 1)); i += 2
        case "--include" =>
          include = Some(args(i + 1).split(",").map(_.trim).toSeq); i += 2
        case "--exclude" =>
          exclude = args(i + 1).split(",").map(_.trim).toSeq; i += 2
        case "--vars" =>
          vars = args(i + 1).split(",").map(_.split("=").head.trim).toSet
          i += 2
        case "--fix" => fix = true; i += 1
        case "--inplace" => inplace = true; i += 1
        case other => throw new IllegalArgumentException(
          s"unknown argument: $other")
      }
    }
    val path = file.getOrElse(
      throw new IllegalArgumentException("missing -f <etl.sql>"))
    if (!path.endsWith(".sql"))
      System.err.println(s"warning: file name $path should end with .sql")
    val sql = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    val linter = new SqlLinter(sql, vars, include, exclude)
    val violations = linter.lint()
    violations.foreach(v => println(v.toString))
    println(s"${violations.length} violation(s) found")
    if (fix) {
      val out = if (inplace) path else path.stripSuffix(".sql") + ".fixed.sql"
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        linter.fix().getBytes("UTF-8"))
      println(s"fixed file written: $out")
    }
    if (violations.nonEmpty) sys.exit(1)
  }
}
