package graft.etl

import graft.core.SqlText

/** Splits an Easy-SQL file into steps on `-- target=` lines, resolving
  * `-- include=path.sql` recursively first (reference step.py:552-679). */
final class StepFactory(
    includes: Map[String, String] = Map.empty,
    includeResolver: Option[String => Option[String]] = None,
    baseDir: Option[String] = None,
    skipDuplicateInclude: Boolean = false) {

  private val includeRe = """(?i)^--\s*include\s*=\s*(.*\.sql)\s*$""".r
  var resolvedSql: String = ""

  def createFromSql(sql: String): Seq[Step] = {
    resolvedSql = resolveInclude(sql, new scala.collection.mutable.ArrayBuffer[String]())
    val lines = resolvedSql.split("\n", -1)

    val stepList = scala.collection.mutable.ArrayBuffer[Step]()
    var sqlParts = Vector.empty[String]
    var step = new Step(s"step-${stepList.size + 1}")

    for ((rawLine, index) <- lines.zipWithIndex) {
      val line = SqlText.removeSemicolonFromLine(rawLine)
      val stripped = line.trim
      if (StepConfig.matchesConfigLine(stripped)) {
        if (sqlParts.nonEmpty) step.selectSql = Some(sqlParts.mkString("\n"))
        if (step.targetConfig.isDefined) stepList += step
        step = new Step(s"step-${stepList.size + 1}")
        sqlParts = Vector.empty
        step.targetConfig = Some(StepConfig.fromConfigLine(stripped, index + 1))
        if (index == lines.length - 1) stepList += step
      } else if (index == lines.length - 1) {
        if (stripped.nonEmpty) sqlParts :+= line
        if (sqlParts.nonEmpty) step.selectSql = Some(sqlParts.mkString("\n"))
        stepList += step
      } else if (stripped.nonEmpty) {
        sqlParts :+= line
      }
    }
    stepList.toSeq
  }

  private def resolveInclude(sql: String,
      resolved: scala.collection.mutable.ArrayBuffer[String]): String = {
    sql.split("\n", -1).flatMap { rawLine =>
      val line = SqlText.removeSemicolonFromLine(rawLine)
      includeRe.findFirstMatchIn(line.trim) match {
        case Some(m) =>
          val file = m.group(1)
          if (resolved.contains(file) && skipDuplicateInclude) None
          else {
            resolved += file
            val content = includes.get(file)
              .orElse(includeResolver.flatMap(_(file)))
              .getOrElse(readFile(file))
            Some(resolveInclude(content, resolved))
          }
        case None => Some(line)
      }
    }.mkString("\n")
  }

  private def readFile(file: String): String = {
    val candidates = Seq(file) ++ baseDir.map(d => s"$d/$file")
    candidates.find(p => java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
      .map(p => new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p)), "UTF-8"))
      .getOrElse(throw new java.io.FileNotFoundException(
        s"file not found: tried_paths=$candidates"))
  }
}
