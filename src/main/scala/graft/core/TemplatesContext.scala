package graft.core

import scala.util.matching.Regex

/** Template expansion: `@{tmpl}` / `@{tmpl(p1=v1, p2=${x})}` with
  * `#{param}` placeholders, case-insensitive, comment-aware. Mirrors the
  * reference `easy_sql/sql_processor/context.py:133-211`.
  */
final class TemplatesContext(initial: Map[String, String] = Map.empty) {

  private var templatesMap: Map[String, String] =
    initial.map { case (k, v) => k.toLowerCase -> v }

  def templates: Map[String, String] = templatesMap

  def addTemplates(ts: Map[String, String]): Unit =
    templatesMap ++= ts.map { case (k, v) => k.toLowerCase -> v }

  private val withArgRe: Regex =
    """(?i)@\{\s*(\w+)\(\s*?(\s*\w+\s*=\s*[^,)]+\s*,?\s*)*\)\s*\}""".r
  private val noArgRe: Regex = """(?i)@\{\s*(\w+)\s*\}""".r
  private val paramRe: Regex = """(?i)\s*\w+\s*=\s*[^,)]+,?\s*""".r

  def replaceTemplates(text0: String): String = {
    var substitutor = new CommentSubstitutor()
    var text = substitutor.substitute(text0)

    var m = withArgRe.findFirstMatchIn(text)
      .orElse(noArgRe.findFirstMatchIn(text))
    while (m.isDefined) {
      val mm = m.get
      val define = mm.group(0)
      val defineNormalized = define.replace("\n", "")
      val name = mm.group(1)
      var template = templatesMap.getOrElse(name.toLowerCase,
        throw new SqlProcessorException(
          s"no template found for `$name`, existing are ${templatesMap.keys.mkString(",")}"))
        .trim
      // if the template's last line carries a comment, append a newline so
      // it can't swallow the SQL that follows the expansion site
      val lastLine = template.split("\n", -1).last
      if (SqlText.commentStart(lastLine) != -1) template = template + "\n"

      for (valueDef <- paramRe.findAllIn(defineNormalized)) {
        val eq = valueDef.indexOf('=')
        if (eq > 0) {
          val valueName = valueDef.substring(0, eq).trim
          var value = valueDef.substring(eq + 1).replace(",", "").trim
          if (value.endsWith(")}")) value = value.dropRight(2).trim
          // case-insensitive placeholder match, as the reference does
          template = ("(?i)" + Regex.quote(s"#{$valueName}")).r
            .replaceAllIn(template, _ => Regex.quoteReplacement(value))
        }
      }
      text = text.replace(define, template)

      // recover + re-substitute so comments inside the expansion get masked
      text = substitutor.recover(text)
      substitutor = new CommentSubstitutor()
      text = substitutor.substitute(text)

      m = withArgRe.findFirstMatchIn(text)
        .orElse(noArgRe.findFirstMatchIn(text))
    }
    substitutor.recover(text)
  }
}
