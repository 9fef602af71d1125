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

  def registerAll(spark: SparkSession): Unit = {
    spark.udf.register("remove_all_whitespaces", removeAllWhitespaces)
    spark.udf.register("trim_all", trimAll)
  }
}
