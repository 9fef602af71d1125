package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.udf

/** SQL UDFs shipped with the engine (reference easy_sql/udf/udfs.py:29-34).
  * Registered as Scala udfs — unlike the reference's Python UDFs these run
  * in-JVM with no serialization boundary; for hot paths the same semantics
  * are available codegen'd via built-ins (`regexp_replace(s,'\\s+','')`,
  * `trim(s)`).
  */
object Udfs {

  private val removeAllWhitespaces = udf((value: String) =>
    if (value == null) null else value.split("\\s+").mkString(""))

  private val trimAll = udf((value: String) =>
    if (value == null) null else value.strip())

  /** UDF factory from the reference's check helpers
    * (easy_sql/udf/check.py:19-20): the value passes through when it
    * matches `pattern` (anchored at the start, like python re.match),
    * else null — compose with `ensure_no_null_data_in_table` for
    * format checks. */
  def checkRegexFunc(pattern: String): String => String = {
    val re = ("^" + pattern).r
    value =>
      if (value != null && re.findPrefixOf(value).isDefined) value else null
  }

  def registerAll(spark: SparkSession): Unit = {
    spark.udf.register("remove_all_whitespaces", removeAllWhitespaces)
    spark.udf.register("trim_all", trimAll)
  }

  /** Register a named regex-check UDF, e.g.
    * `registerCheckRegex(spark, "check_email", "[^@]+@[^@]+")`. */
  def registerCheckRegex(spark: SparkSession, name: String,
      pattern: String): Unit =
    spark.udf.register(name, udf(checkRegexFunc(pattern)))
}
