package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed per-column data profile — the Spark-native analog of the
  * reference's `data_profiling_report` (funcs_common.py:340-453, which
  * samples ≤ max_count rows, pulls them to the driver and runs
  * ydata_profiling). Here the profile itself is computed BY Spark:
  *
  *  - sampling protocol mirrors the reference (`_read_data_spark`,
  *    funcs_common.py:433-453): count → sample(max_count/count) →
  *    decimal→double cast, array/map → `<col>__size`;
  *  - pass 1: one aggregation over the sample for count/nulls/approx
  *    distinct/min/max/mean/std of every column at once;
  *  - pass 2: columns stacked to (column, value) rows, ONE shuffle for
  *    all histograms — numeric equi-width 10-bin counts and top-10
  *    value counts per string column together;
  *  - optional numeric Pearson correlation matrix in one more agg.
  *
  * Everything is bounded by the sample cap, so the report costs the
  * same at 100 TB as at 1 GB (plus the initial count).
  */
object DataProfiler {

  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def jnum(d: Double): String =
    if (d.isNaN || d.isInfinite) "null" else d.toString

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }

  /** Reference sampling + column normalization protocol. */
  def sampled(df: DataFrame, maxCount: Int): DataFrame = {
    val total = df.count()
    val fraction =
      if (total < maxCount) 1.0 else maxCount.toDouble / total.toDouble
    var s = if (fraction >= 1.0) df else df.sample(fraction, seed = 42L)
    df.schema.fields.foreach { f =>
      f.dataType match {
        case _: DecimalType =>
          s = s.withColumn(f.name, col(f.name).cast("double"))
        case _: ArrayType | _: MapType =>
          s = s.withColumn(f.name + "__size", size(col(f.name)))
            .drop(f.name)
        case _: StructType | _: BinaryType =>
          s = s.drop(f.name) // not profilable as a scalar
        case _ => ()
      }
    }
    s
  }

  /** Intermediate profile model — JSON and HTML render from the same
    * single computation. */
  final case class ColProfile(name: String, typ: String, isNum: Boolean,
      count: Long, nulls: Long, distinct: Long,
      min: Option[String], max: Option[String],
      mean: Option[Double], std: Option[Double],
      hist: Seq[(String, Long)])
  final case class Profile(title: String, rows: Long,
      cols: Seq[ColProfile],
      corr: Option[Seq[(String, String, Option[Double])]])

  /** Profile `df` (already sampled) into a JSON string. */
  def profileJson(df: DataFrame, title: String,
      includeCorrelations: Boolean, topK: Int = 10, bins: Int = 10)
      : String =
    renderJson(profile(df, title, includeCorrelations, topK, bins))

  /** Compute the profile model (one pass structure, see scaladoc). */
  def profile(df: DataFrame, title: String,
      includeCorrelations: Boolean, topK: Int = 10, bins: Int = 10)
      : Profile = {
    val cached = df.persist()
    // finally-scoped: the empty-input early return and any failure in
    // the agg/histogram passes must not leak the cached DataFrame
    try computeProfile(cached, title, includeCorrelations, topK, bins)
    finally cached.unpersist()
  }

  private def computeProfile(cached: DataFrame, title: String,
      includeCorrelations: Boolean, topK: Int, bins: Int): Profile = {
    val total = cached.count()
    if (total == 0) return Profile(title, 0, Nil, None)
    val fields = cached.schema.fields.toSeq

    // pass 1: every column's base stats in ONE aggregation
    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      Seq(
        count(c).as(s"${f.name}__cnt"),
        approx_count_distinct(c).as(s"${f.name}__dist"),
        min(c).cast("string").as(s"${f.name}__min"),
        max(c).cast("string").as(s"${f.name}__max")) ++
        (if (isNumeric(f.dataType))
           Seq(avg(c.cast("double")).as(s"${f.name}__mean"),
               stddev(c.cast("double")).as(s"${f.name}__std"),
               min(c.cast("double")).as(s"${f.name}__dmin"),
               max(c.cast("double")).as(s"${f.name}__dmax"))
         else Nil)
    }
    val base = cached.agg(aggs.head, aggs.tail: _*).collect()(0)
    def d(n: String): Option[Double] =
      base.getAs[Any](n) match {
        case null => None
        case v: Double => Some(v)
        case v: Number => Some(v.doubleValue())
      }

    // pass 2: one stacked shuffle for every histogram. Numeric columns
    // are bucketed to their equi-width bin index, strings pass through;
    // (column, key) group-count then per-column top rows.
    val stacked = fields.map { f =>
      val c = col(f.name)
      val key: org.apache.spark.sql.Column =
        if (isNumeric(f.dataType)) {
          (d(s"${f.name}__dmin"), d(s"${f.name}__dmax")) match {
            case (Some(lo), Some(hi)) if hi > lo =>
              least(floor((c.cast("double") - lit(lo)) /
                lit((hi - lo) / bins)), lit(bins - 1)).cast("string")
            case _ => c.cast("string")
          }
        } else c.cast("string")
      cached.where(c.isNotNull)
        .select(lit(f.name).as("col"), key.as("key"))
    }.reduce(_.unionAll(_))
    val histRows = stacked.groupBy("col", "key").count()
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("col")
          .orderBy(col("count").desc, col("key").asc)))
      .filter(col("rn") <= topK)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)

    val cols = fields.map { f =>
      val cnt = base.getAs[Long](s"${f.name}__cnt")
      ColProfile(
        name = f.name,
        typ = f.dataType.simpleString,
        isNum = isNumeric(f.dataType),
        count = cnt,
        nulls = total - cnt,
        distinct = base.getAs[Long](s"${f.name}__dist"),
        min = Option(base.getAs[String](s"${f.name}__min")),
        max = Option(base.getAs[String](s"${f.name}__max")),
        mean = if (isNumeric(f.dataType)) d(s"${f.name}__mean") else None,
        std = if (isNumeric(f.dataType)) d(s"${f.name}__std") else None,
        hist = histRows.getOrElse(f.name, Array.empty)
          .sortBy(h => (-h._3, h._2)).map(h => (h._2, h._3)).toSeq)
    }

    val corrPairs =
      if (!includeCorrelations) None
      else {
        // cap the pair count so the agg stays one bounded pass
        val nums = fields.filter(f => isNumeric(f.dataType)).take(8)
        val pairs = for {
          (a, i) <- nums.zipWithIndex; b <- nums.drop(i + 1)
        } yield (a.name, b.name)
        if (pairs.isEmpty) Some(Nil)
        else {
          val corrAggs = pairs.map { case (a, b) =>
            corr(col(a).cast("double"), col(b).cast("double"))
              .as(s"${a}__${b}")
          }
          val r = cached.agg(corrAggs.head, corrAggs.tail: _*).collect()(0)
          Some(pairs.map { case (a, b) =>
            (a, b, Option(r.getAs[Any](s"${a}__${b}"))
              .map(_.asInstanceOf[Double]))
          })
        }
      }
    Profile(title, total, cols, corrPairs)
  }

  /** JSON rendering — format unchanged from the pre-model version. */
  private def renderJson(p: Profile): String = {
    if (p.rows == 0 && p.cols.isEmpty)
      return s"""{"title": ${jstr(p.title)}, "rows": 0, "columns": {}}"""
    val colJson = p.cols.map { c =>
      val parts = scala.collection.mutable.ArrayBuffer[String](
        s""""type": ${jstr(c.typ)}""",
        s""""count": ${c.count}""",
        s""""nulls": ${c.nulls}""",
        s""""approx_distinct": ${c.distinct}""",
        s""""min": ${c.min.map(jstr).getOrElse("null")}""",
        s""""max": ${c.max.map(jstr).getOrElse("null")}""")
      if (c.isNum) {
        parts += s""""mean": ${c.mean.map(jnum).getOrElse("null")}"""
        parts += s""""std": ${c.std.map(jnum).getOrElse("null")}"""
      }
      val hist = c.hist
        .map(h => s"[${jstr(h._1)}, ${h._2}]").mkString("[", ", ", "]")
      parts +=
        (if (c.isNum) s""""histogram": $hist"""
         else s""""top_values": $hist""")
      s"${jstr(c.name)}: {${parts.mkString(", ")}}"
    }.mkString("{", ", ", "}")
    val corrJson = p.corr match {
      case None => "null"
      case Some(Nil) => "{}"
      case Some(pairs) => pairs.map { case (a, b, v) =>
        s"${jstr(s"$a,$b")}: ${v.map(jnum).getOrElse("null")}"
      }.mkString("{", ", ", "}")
    }
    s"""{"title": ${jstr(p.title)}, "rows": ${p.rows}, """ +
      s""""columns": $colJson, "correlations": $corrJson}"""
  }

  /** Legacy wrapper: embeds a pre-rendered JSON string verbatim. Prefer
    * [[renderHtml]] over a [[Profile]] for the full report. */
  def profileHtml(json: String, title: String): String =
    s"""<!DOCTYPE html><html><head><meta charset="utf-8">
       |<title>$title</title></head><body>
       |<h1>$title</h1>
       |<pre id="profile">${esc(json)}</pre>
       |</body></html>
       |""".stripMargin

  private def esc(s: String): String = s.replace("&", "&amp;")
    .replace("<", "&lt;").replace(">", "&gt;").replace("\"", "&quot;")

  /** Static self-contained HTML report — the analog of the reference's
    * ydata-profiling output (funcs_common.py:340-453): overview, one
    * card per column with its stats and a histogram / top-values bar
    * chart, and the correlation table. No scripts, no external assets —
    * it renders anywhere the reference's report does. */
  def renderHtml(p: Profile): String = {
    def fmtD(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4g", Double.box(v))
    def pct(n: Long): String = if (p.rows == 0) "0%"
      else String.format(java.util.Locale.ROOT, "%.1f%%",
        Double.box(n * 100.0 / p.rows))
    val cards = p.cols.map { c =>
      val rows = scala.collection.mutable.ArrayBuffer[(String, String)](
        "type" -> c.typ,
        "count" -> c.count.toString,
        "nulls" -> s"${c.nulls} (${pct(c.nulls)})",
        "distinct (approx)" -> c.distinct.toString,
        "min" -> c.min.getOrElse("–"),
        "max" -> c.max.getOrElse("–"))
      c.mean.foreach(m => rows += ("mean" -> fmtD(m)))
      c.std.foreach(s0 => rows += ("std" -> fmtD(s0)))
      val statRows = rows.map { case (k, v) =>
        s"<tr><th>${esc(k)}</th><td>${esc(v)}</td></tr>"
      }.mkString
      val maxCount = c.hist.map(_._2).maxOption.getOrElse(1L).max(1L)
      val histTitle = if (c.isNum) "histogram (bin → count)"
                      else "top values"
      val bars = c.hist.map { case (key, n) =>
        val w = math.max(1, (n * 100.0 / maxCount).round.toInt)
        s"""<tr><td class="k">${esc(key)}</td>""" +
        s"""<td class="bar"><div style="width:$w%"></div></td>""" +
        s"""<td class="n">$n</td></tr>"""
      }.mkString
      s"""<section class="col">
         |<h2>${esc(c.name)}</h2>
         |<div class="body">
         |<table class="stats">$statRows</table>
         |<div class="hist"><h3>${esc(histTitle)}</h3>
         |<table class="bars">$bars</table></div>
         |</div>
         |</section>""".stripMargin
    }.mkString("\n")
    val corrSection = p.corr match {
      case None | Some(Nil) => ""
      case Some(pairs) =>
        val rows = pairs.map { case (a, b, v) =>
          s"<tr><td>${esc(a)}</td><td>${esc(b)}</td>" +
          s"<td>${v.map(fmtD).getOrElse("–")}</td></tr>"
        }.mkString
        s"""<section class="col"><h2>correlations (Pearson)</h2>
           |<table class="stats">
           |<tr><th>a</th><th>b</th><th>r</th></tr>$rows</table>
           |</section>""".stripMargin
    }
    s"""<!DOCTYPE html><html><head><meta charset="utf-8">
       |<title>${esc(p.title)}</title>
       |<style>
       |body{font:14px/1.45 system-ui,sans-serif;margin:2rem;color:#222}
       |h1{font-size:1.4rem} h2{font-size:1.05rem;margin:.2rem 0}
       |h3{font-size:.85rem;color:#666;margin:.2rem 0}
       |.overview{color:#555;margin-bottom:1.2rem}
       |section.col{border:1px solid #ddd;border-radius:6px;
       |  padding:.8rem 1rem;margin:.8rem 0}
       |.body{display:flex;gap:2rem;flex-wrap:wrap}
       |table.stats th{text-align:left;color:#666;font-weight:500;
       |  padding-right:1rem} table.stats td{font-variant-numeric:tabular-nums}
       |table.bars td.k{max-width:18rem;overflow:hidden;white-space:nowrap;
       |  text-overflow:ellipsis;padding-right:.6rem;color:#444}
       |table.bars td.bar{width:12rem}
       |table.bars td.bar div{background:#4a7fb5;height:.75rem;
       |  border-radius:2px}
       |table.bars td.n{padding-left:.6rem;color:#666;
       |  font-variant-numeric:tabular-nums}
       |</style></head><body>
       |<h1>${esc(p.title)}</h1>
       |<p class="overview">${p.rows} rows · ${p.cols.size} columns</p>
       |$cards
       |$corrSection
       |</body></html>
       |""".stripMargin
  }

  /** Full reference protocol: sample, profile, write
    * `{outputFolder}/{db}/{table}.{html,json}`
    * (funcs_common.py:398-412 naming). */
  def report(df: DataFrame, table: String, outputFolder: String,
      maxCount: Int, includeCorrelations: Boolean,
      types: Seq[String]): Seq[String] = {
    types.foreach { t =>
      if (t != "html" && t != "json")
        throw new graft.core.SqlProcessorException(
          s"Found unknown type $t, all supported are: html/json")
    }
    val s = sampled(df, maxCount)
    // ONE profile computation feeds both output formats
    val prof = profile(s, s"Profiling Report for $table",
      includeCorrelations)
    val json = renderJson(prof)
    val rel = table.split("\\.") match {
      case Array(db, t) => s"$db/$t"
      case _ => table
    }
    val base = java.nio.file.Paths.get(outputFolder, rel)
    java.nio.file.Files.createDirectories(base.getParent)
    types.map {
      case "json" =>
        val p = base.resolveSibling(base.getFileName.toString + ".json")
        java.nio.file.Files.writeString(p, json)
        p.toString
      case "html" =>
        val p = base.resolveSibling(base.getFileName.toString + ".html")
        java.nio.file.Files.writeString(p, renderHtml(prof))
        p.toString
    }
  }
}
