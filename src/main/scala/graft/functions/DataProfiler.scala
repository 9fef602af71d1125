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

  /** Profile `df` (already sampled) into a JSON string. */
  def profileJson(df: DataFrame, title: String,
      includeCorrelations: Boolean, topK: Int = 10, bins: Int = 10)
      : String = {
    val cached = df.persist()
    // finally-scoped: the empty-input early return and any failure in
    // the agg/histogram passes must not leak the cached DataFrame
    try profileJsonCached(cached, title, includeCorrelations, topK, bins)
    finally cached.unpersist()
  }

  private def profileJsonCached(cached: DataFrame, title: String,
      includeCorrelations: Boolean, topK: Int, bins: Int): String = {
    val total = cached.count()
    if (total == 0) return s"""{"title": ${jstr(title)}, "rows": 0, "columns": {}}"""
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

    val colJson = fields.map { f =>
      val cnt = base.getAs[Long](s"${f.name}__cnt")
      val parts = scala.collection.mutable.ArrayBuffer[String](
        s""""type": ${jstr(f.dataType.simpleString)}""",
        s""""count": $cnt""",
        s""""nulls": ${total - cnt}""",
        s""""approx_distinct": ${base.getAs[Long](s"${f.name}__dist")}""",
        s""""min": ${Option(base.getAs[String](s"${f.name}__min"))
          .map(jstr).getOrElse("null")}""",
        s""""max": ${Option(base.getAs[String](s"${f.name}__max"))
          .map(jstr).getOrElse("null")}""")
      if (isNumeric(f.dataType)) {
        parts += s""""mean": ${d(s"${f.name}__mean").map(jnum).getOrElse("null")}"""
        parts += s""""std": ${d(s"${f.name}__std").map(jnum).getOrElse("null")}"""
      }
      val hist = histRows.getOrElse(f.name, Array.empty)
        .sortBy(h => (-h._3, h._2))
        .map(h => s"[${jstr(h._2)}, ${h._3}]").mkString("[", ", ", "]")
      parts +=
        (if (isNumeric(f.dataType)) s""""histogram": $hist"""
         else s""""top_values": $hist""")
      s"${jstr(f.name)}: {${parts.mkString(", ")}}"
    }.mkString("{", ", ", "}")

    val corrJson =
      if (!includeCorrelations) "null"
      else {
        // cap the pair count so the agg stays one bounded pass
        val nums = fields.filter(f => isNumeric(f.dataType)).take(8)
        val pairs = for {
          (a, i) <- nums.zipWithIndex; b <- nums.drop(i + 1)
        } yield (a.name, b.name)
        if (pairs.isEmpty) "{}"
        else {
          val corrAggs = pairs.map { case (a, b) =>
            corr(col(a).cast("double"), col(b).cast("double"))
              .as(s"${a}__${b}")
          }
          val r = cached.agg(corrAggs.head, corrAggs.tail: _*).collect()(0)
          pairs.map { case (a, b) =>
            val v = Option(r.getAs[Any](s"${a}__${b}"))
              .map(x => jnum(x.asInstanceOf[Double])).getOrElse("null")
            s"${jstr(s"$a,$b")}: $v"
          }.mkString("{", ", ", "}")
        }
      }
    s"""{"title": ${jstr(title)}, "rows": $total, """ +
      s""""columns": $colJson, "correlations": $corrJson}"""
  }

  /** Minimal static HTML wrapper around the same profile. */
  def profileHtml(json: String, title: String): String =
    s"""<!DOCTYPE html><html><head><meta charset="utf-8">
       |<title>$title</title></head><body>
       |<h1>$title</h1>
       |<pre id="profile">${json.replace("&", "&amp;")
          .replace("<", "&lt;").replace(">", "&gt;")}</pre>
       |</body></html>
       |""".stripMargin

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
    val json = profileJson(s, s"Profiling Report for $table",
      includeCorrelations)
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
        java.nio.file.Files.writeString(p,
          profileHtml(json, s"Profiling Report for $table"))
        p.toString
    }
  }
}
