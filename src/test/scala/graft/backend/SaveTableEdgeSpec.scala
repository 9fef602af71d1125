package graft.backend

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark

/** saveTable edge cases around static partition handling
  * (reference spark.py:248-310): values containing quotes must be
  * escaped into valid SQL, and the partition-column filter must match
  * case-insensitively like the rest of the schema handling. */
class SaveTableEdgeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private lazy val backend = new SparkBackend(spark)

  test("static partition value containing a quote is escaped") {
    import spark.implicits._
    spark.sql("create database if not exists edge")
    spark.sql("drop table if exists edge.quoted_pt")
    Seq((1L, "x"), (2L, "y")).toDF("id", "payload")
      .createOrReplaceTempView("quoted_src")
    backend.saveTable(
      TableMeta("quoted_src"),
      TableMeta("edge.quoted_pt",
        Seq(TablePartition("vendor", Some("o'reilly & co")))),
      SaveMode.Overwrite, createTargetTable = true)
    val got = spark.sql("select id, vendor from edge.quoted_pt")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "o'reilly & co"), (2L, "o'reilly & co")))
  }

  test("partition column filtered from select case-insensitively") {
    import spark.implicits._
    spark.sql("create database if not exists edge")
    spark.sql("drop table if exists edge.cased_pt")
    // target schema declares DT upper-case; the source carries it too —
    // the static value must win and the column must not be duplicated
    spark.sql("create table edge.cased_pt (id bigint, DT string) " +
      "using parquet partitioned by (DT)")
    Seq((10L, "stale"), (20L, "stale")).toDF("id", "dt")
      .createOrReplaceTempView("cased_src")
    backend.saveTable(
      TableMeta("cased_src"),
      TableMeta("edge.cased_pt", Seq(TablePartition("dt", Some("2024-05-01")))),
      SaveMode.Overwrite, createTargetTable = false)
    val got = spark.sql("select id, DT from edge.cased_pt")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((10L, "2024-05-01"), (20L, "2024-05-01")))
  }
}
