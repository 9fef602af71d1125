package graft.etl

import java.io.ByteArrayInputStream
import java.time.LocalDate
import java.util.zip.ZipFile

import scala.collection.mutable

import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.Element

import graft.core.SqlProcessorException

/** Parser for the reference's NATIVE golden-test fixture format: an
  * xlsx workbook of CASE/VARS/INCLUDES/INPUT/OUTPUT/UDFS/FUNCS rows
  * (easy_sql/sql_tester.py:370-716, docs/easy_sql/testing.md). A user
  * of the reference keeps their ETL tests as spreadsheets; this reads
  * those exact files into [[GoldenDataTester.TestCase]]s with zero
  * extra dependencies — xlsx is a zip of XML, handled by
  * `java.util.zip` + the JDK DOM parser.
  *
  * Faithful semantics:
  *  - only sheets whose name starts with "suit" (case-insensitive) are
  *    scanned (sql_tester.py:648-653);
  *  - a `CASE` row starts a case; label rows partition what follows;
  *  - `VARS`: names on the label row, values on the NEXT physical row;
  *    a `data_date` value may be an Excel day serial (epoch
  *    1899-12-30) and is rendered `yyyy-MM-dd` (sql_tester.py:439-464);
  *  - `INPUT`/`OUTPUT`: `B` = table name, columns from `C` on, each
  *    optionally `name:type` (default type `string`); INPUT rows
  *    REQUIRE a description in column B (rows without one are skipped —
  *    sql_tester.py:523-530); OUTPUT rows need only values;
  *  - date/timestamp-typed cells holding a day serial are converted the
  *    same way as `data_date`;
  *  - `UDFS`/`FUNCS` rows (python file paths) are recorded but not
  *    executable here — Scala UDFs register via
  *    [[graft.backend.SparkBackend.registerUdfs]] instead.
  */
object XlsxCases {

  // --- minimal xlsx reading ----------------------------------------------

  private def dom(bytes: Array[Byte]): Element = {
    val f = DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(false)
    f.setExpandEntityReferences(false)
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.newDocumentBuilder()
      .parse(new ByteArrayInputStream(bytes)).getDocumentElement
  }

  private def elems(parent: Element, tag: String): Seq[Element] = {
    val nl = parent.getElementsByTagName(tag)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[Element])
  }

  private def textOf(e: Element): String =
    elems(e, "t").map(_.getTextContent).mkString

  /** A sheet as physical-row-indexed cell maps (colIdx -> value). */
  type Rows = Vector[Map[Int, String]]

  private def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((a, c) => a * 26 + (c - 'A' + 1)) - 1

  /** Read every `suit*` sheet of the workbook. Returns (sheetName, rows). */
  def readSheets(path: String): Seq[(String, Rows)] = {
    val zip = new ZipFile(path)
    try {
      def entryBytes(name: String): Option[Array[Byte]] =
        Option(zip.getEntry(name)).map { e =>
          val in = zip.getInputStream(e)
          try in.readAllBytes() finally in.close()
        }
      val shared: IndexedSeq[String] =
        entryBytes("xl/sharedStrings.xml") match {
          case Some(b) => elems(dom(b), "si").map(textOf).toIndexedSeq
          case None => IndexedSeq.empty
        }
      val rels: Map[String, String] =
        entryBytes("xl/_rels/workbook.xml.rels").toSeq.flatMap { b =>
          elems(dom(b), "Relationship").map(r =>
            r.getAttribute("Id") -> r.getAttribute("Target"))
        }.toMap
      val wb = dom(entryBytes("xl/workbook.xml").getOrElse(
        throw new SqlProcessorException(s"not an xlsx workbook: $path")))
      elems(wb, "sheet")
        .filter(_.getAttribute("name").toLowerCase.startsWith("suit"))
        .flatMap { s =>
          val target = rels.getOrElse(s.getAttribute("r:id"), "")
          val entry = if (target.startsWith("/")) target.drop(1)
                      else s"xl/$target"
          entryBytes(entry).map { b =>
            s.getAttribute("name") -> sheetRows(dom(b), shared)
          }
        }
    } finally zip.close()
  }

  private def sheetRows(sheet: Element, shared: IndexedSeq[String]): Rows = {
    val byRow = mutable.SortedMap.empty[Int, Map[Int, String]]
    elems(sheet, "row").foreach { r =>
      val rowIdx = r.getAttribute("r").toInt - 1
      val cells = elems(r, "c").flatMap { c =>
        val v = cellValue(c, shared)
        if (v == null) None else Some(colIndex(c.getAttribute("r")) -> v)
      }.toMap
      byRow(rowIdx) = cells
    }
    val maxRow = if (byRow.isEmpty) -1 else byRow.lastKey
    (0 to maxRow).map(i => byRow.getOrElse(i, Map.empty)).toVector
  }

  private def cellValue(c: Element, shared: IndexedSeq[String]): String = {
    val t = c.getAttribute("t")
    lazy val v = elems(c, "v").headOption.map(_.getTextContent)
    t match {
      case "s" => v.map(i => shared(i.toInt)).orNull
      case "inlineStr" =>
        elems(c, "is").headOption.map(textOf).orNull
      case "b" => v.map(x => if (x == "1") "true" else "false").orNull
      case _ => v.map(numToStr).orNull // "str", "n", untyped numeric
    }
  }

  /** Render xlsx numerics the way python's str() of openpyxl values
    * does: whole doubles print without the trailing `.0`. */
  private def numToStr(s: String): String =
    if (s.matches("-?\\d+\\.0+")) s.takeWhile(_ != '.') else s

  // --- case assembly ------------------------------------------------------

  private val Labels =
    Set("CASE", "VARS", "INCLUDES", "INPUT", "OUTPUT", "UDFS", "FUNCS")

  private def excelDate(serial: Long): String =
    LocalDate.of(1899, 12, 30).plusDays(serial).toString

  private def dateValue(raw: String): String =
    if (raw != null && raw.matches("\\d+")) excelDate(raw.toLong) else raw

  /** Parse the cases of one sheet. `sql` is the ETL text the cases run
    * (the reference resolves `<file>.sql` next to `<file>.xlsx`;
    * [[parseFile]] does the same). */
  def parseSheet(rows: Rows, sql: String): Seq[GoldenDataTester.TestCase] = {
    val caseStarts = rows.indices.filter(i =>
      rows(i).get(0).exists(_.trim == "CASE"))
    caseStarts.zipWithIndex.map { case (start, ci) =>
      val end = if (ci + 1 < caseStarts.length) caseStarts(ci + 1)
                else rows.length
      parseCase(rows.slice(start, end), sql)
    }
  }

  private def parseCase(rows: Rows, sql: String): GoldenDataTester.TestCase = {
    // partition into label-delimited sections
    val labelIdx = rows.indices.filter(i =>
      rows(i).get(0).map(_.trim).exists(Labels.contains))
    val sections = labelIdx.zipWithIndex.map { case (at, i) =>
      val end = if (i + 1 < labelIdx.length) labelIdx(i + 1) else rows.length
      (rows(at)(0).trim, rows.slice(at, end))
    }

    var name = ""
    var vars = Map.empty[String, String]
    var includes = Map.empty[String, String]
    val inputs = mutable.Buffer.empty[GoldenDataTester.TableFixture]
    val outputs = mutable.Buffer.empty[GoldenDataTester.TableFixture]

    sections.foreach {
      case ("CASE", rs) =>
        name = rs.head.getOrElse(1, "").trim
      case ("VARS", rs) =>
        if (rs.length < 2)
          throw new SqlProcessorException(
            "there must be value set for VARS, found None")
        val names = rs(0).filter(_._1 >= 1)
        vars ++= names.toSeq.sortBy(_._1).map { case (i, n) =>
          val raw = rs(1).getOrElse(i, null)
          val v = if (n.trim.equalsIgnoreCase("data_date")) dateValue(raw)
                  else raw
          n.trim -> v
        }
      case ("INCLUDES", rs) =>
        rs.foreach { r =>
          r.get(1).map(_.trim).filter(_.nonEmpty).foreach { nm =>
            val content = r.get(2).map(_.trim).filter(_.nonEmpty).getOrElse(
              throw new SqlProcessorException(
                "there must be value set for INCLUDES, found None"))
            includes += nm -> content
          }
        }
      case ("INPUT", rs) => inputs += parseTable(rs, requireDesc = true)
      case ("OUTPUT", rs) => outputs += parseTable(rs, requireDesc = false)
      case ("UDFS" | "FUNCS", _) => // recorded by the reference; no-op here
      case _ => ()
    }
    GoldenDataTester.TestCase(name, sql, vars, includes,
      inputs.toSeq, outputs.toSeq)
  }

  private def parseTable(rs: Rows, requireDesc: Boolean)
      : GoldenDataTester.TableFixture = {
    val header = rs.head
    val tableName = header.getOrElse(1,
      throw new SqlProcessorException(
        "there must be table name set, found None")).trim
    // columns run from C until the first gap
    val colCells = Iterator.from(2)
      .map(i => header.get(i).map(_.trim).filter(_.nonEmpty))
      .takeWhile(_.isDefined).map(_.get).toVector
    if (colCells.isEmpty)
      throw new SqlProcessorException(
        s"there must be at least one column set for $tableName, found 0")
    val (columns, types) = colCells.map { c =>
      val at = c.indexOf(':')
      if (at >= 0) (c.take(at), c.drop(at + 1)) else (c, "string")
    }.unzip

    val isTemporal = types.map(t =>
      t.equalsIgnoreCase("date") || t.equalsIgnoreCase("timestamp"))
    val values = rs.drop(1).flatMap { r =>
      val hasDesc = r.get(1).exists(_.trim.nonEmpty)
      val hasValues = columns.indices.exists(i => r.contains(i + 2))
      if ((requireDesc && hasDesc) || (!requireDesc && hasValues)) {
        Some(columns.indices.map { i =>
          val raw = r.get(i + 2).orNull
          if (isTemporal(i)) dateValue(raw) else raw
        }.toSeq)
      } else None
    }
    GoldenDataTester.TableFixture(tableName, columns, types, values.toSeq)
  }

  /** All cases of a workbook; the ETL sql is `<path minus .xlsx>.sql`
    * unless `sqlOverride` is given (mirrors sql_tester.py:676-686). */
  def parseFile(path: String, sqlOverride: Option[String] = None)
      : Seq[GoldenDataTester.TestCase] = {
    val sql = sqlOverride.getOrElse {
      val sqlPath = path.stripSuffix(".xlsx") + ".sql"
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(sqlPath)))
        new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(sqlPath)), "UTF-8")
      else throw new SqlProcessorException(
        s"can not find the sql file having same name with test file: $sqlPath")
    }
    readSheets(path).flatMap { case (_, rows) => parseSheet(rows, sql) }
  }
}
