package graft.core

/** Comment-aware SQL text utilities — the foundation of the substitution
  * engine. Semantics match the reference's `easy_sql/utils/sql_expr.py`
  * (CommentSubstitutor :7-81, quote scanner :84-122, comment_start
  * :125-139, semicolon stripping :142-169), re-expressed as plain Scala.
  */
final class CommentSubstitutor(
    val marker: String = CommentSubstitutor.Marker) {

  private var recognized: Vector[String] = Vector.empty
  def recognizedComments: Seq[String] = recognized

  /** Replace comments with identifiable markers (or strip when
    * `replaceWithEmpty`), so downstream rewriting never touches them. */
  def substitute(sqlExpr: String, replaceWithEmpty: Boolean = false): String = {
    require(!sqlExpr.contains(marker),
      s"Cannot handle sql expression with comment identifiable name($marker) inside: $sqlExpr")
    val lines = Vector.newBuilder[String]
    var comments = Vector.empty[String]

    def replacement: String =
      if (replaceWithEmpty) "" else s"$marker${comments.size}__"

    sqlExpr.split("\n", -1).foreach { line =>
      if (line.startsWith("--")) {
        lines += replacement
        comments :+= line
      } else {
        var currentIndex = 0
        var done = false
        while (!done) {
          SqlText.findCommentToken(line, currentIndex) match {
            case Some(cs) =>
              val leftOfComment = line.substring(0, cs)
              if (SqlText.isQuoteClosed(leftOfComment)) {
                lines += leftOfComment + replacement
                comments :+= line.substring(cs)
                done = true
              } else currentIndex = cs
            case None =>
              lines += line
              done = true
          }
        }
      }
    }
    recognized = comments
    lines.result().mkString("\n")
  }

  /** Remove comments entirely. */
  def remove(sqlExpr: String): String = substitute(sqlExpr, replaceWithEmpty = true)

  /** Restore previously substituted comments. */
  def recover(substituted: String): String = {
    var idx = 0
    substituted.split("\n", -1).map { line =>
      val name = s"$marker${idx}__"
      val count = SqlText.countOccurrences(line, name)
      require(count <= 1,
        s"found multiple comment identifiable name $name in line: $line")
      require(count == 0 || line.endsWith(name),
        s"found comment identifiable name $name, but is not at end in line: $line")
      if (count == 1) {
        val out = line.replace(name, recognized(idx))
        idx += 1
        out
      } else line
    }.mkString("\n")
  }
}

object CommentSubstitutor {
  val Marker = "__COMMENT_SUBSTITUTED__"
}

object SqlText {

  private[core] def countOccurrences(s: String, sub: String): Int = {
    var c = 0; var i = s.indexOf(sub)
    while (i != -1) { c += 1; i = s.indexOf(sub, i + sub.length) }
    c
  }

  /** Index of the first `--` at position > from whose preceding char is
    * not `-` (the reference's lazy `[^-]--` scan over line[from:]). */
  private[core] def findCommentToken(line: String, from: Int): Option[Int] = {
    var idx = line.indexOf("--", from + 1)
    while (idx != -1) {
      if (line.charAt(idx - 1) != '-') return Some(idx)
      idx = line.indexOf("--", idx + 1)
    }
    None
  }

  /** True when every quote opened in the expression is closed
    * (backslash-escape aware; '' or "" strings). */
  def isQuoteClosed(expr0: String): Boolean = {
    val expr = expr0.replace("\\\\", "")

    def findCharWithoutEscape(text: String, char: Char): Int = {
      var start = 0
      while (true) {
        val idx = text.indexOf(char, start)
        if (idx == -1) return -1
        if (idx > 0 && text.charAt(idx - 1) == '\\') start = idx + 1
        else return idx
      }
      -1
    }

    def closedFrom(quoteIndex: Int, quoteChar: Char): Boolean = {
      val startIndex = quoteIndex + 1
      val rel = findCharWithoutEscape(expr.substring(startIndex), quoteChar)
      if (rel == -1) false
      else isQuoteClosed(expr.substring(startIndex + rel + 1))
    }

    val si = expr.indexOf('\'')
    val di = expr.indexOf('"')
    if (si != -1 && di == -1) closedFrom(si, '\'')
    else if (si != -1 && di != -1) {
      if (si < di) closedFrom(si, '\'') else closedFrom(di, '"')
    } else if (si == -1 && di == -1) true
    else closedFrom(di, '"')
  }

  /** Start index of the comment in a line, or -1 (quote-aware). */
  def commentStart(line: String): Int = {
    if (line.startsWith("--")) return 0
    var currentIndex = 0
    while (true) {
      findCommentToken(line, currentIndex) match {
        case Some(cs) =>
          if (isQuoteClosed(line.substring(0, cs))) return cs
          else currentIndex = cs
        case None => return -1
      }
    }
    -1
  }

  /** Remove semicolons outside quotes and before any comment. */
  def removeSemicolonFromLine(line: String): String = {
    val toRemove = scala.collection.mutable.ArrayBuffer[Int]()
    var start = 0
    val cs = commentStart(line)
    var break = false
    while (start < line.length && !break) {
      val pos = line.indexOf(';', start)
      if (pos != -1) {
        if (isQuoteClosed(line.substring(0, pos))) {
          if (cs != -1 && cs < pos) break = true
          else toRemove += pos
        }
        start = pos + 1
      } else break = true
    }
    val sb = new StringBuilder
    var prev = 0
    toRemove.foreach { pos => sb.append(line.substring(prev, pos)); prev = pos + 1 }
    sb.append(line.substring(prev))
    sb.toString
  }

  def removeSemicolon(sqlExpr: String): String =
    sqlExpr.split("\n", -1).map(removeSemicolonFromLine).mkString("\n")
}
