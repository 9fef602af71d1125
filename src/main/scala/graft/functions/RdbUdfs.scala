package graft.functions

import graft.backend.rdb.{ClickHouseDialect, DerbyDialect, PostgresDialect, SqlDialect}

/** Static carriers for Derby's `LANGUAGE JAVA` functions — Scala objects
  * compile static forwarders onto the companion class, which is exactly
  * what Derby's `EXTERNAL NAME` resolution calls. Semantics mirror the
  * reference's SparkUdfs (udf/udfs.py:23-35). */
object DerbyUdfs {
  def removeAllWhitespaces(v: String): String =
    if (v == null) null else v.replaceAll("\\s+", "")
  def trimAll(v: String): String =
    if (v == null) null else v.trim
}

/** Warehouse-side UDF DDL per dialect — the RDB analogue of the
  * reference's udf registry (udf/udfs.py: PgUdfs emit
  * `create or replace function` SQL, ChUdfs emit lambda
  * `CREATE FUNCTION`; rdb.py:508-516 executes whatever the registry
  * returns). Derby gets REAL functions backed by [[DerbyUdfs]] statics,
  * so the live integration target executes the same udf surface the
  * server dialects declare. */
object RdbUdfs {

  /** (function name, create statements). Names are what `clean()` must
    * drop for engines whose schema drop requires emptiness. */
  def forDialect(dialect: SqlDialect): Seq[(String, Seq[String])] =
    dialect match {
      case _: DerbyDialect => Seq(
        "remove_all_whitespaces" -> Seq(
          """create function remove_all_whitespaces(v varchar(4000))
            |returns varchar(4000)
            |parameter style java no sql language java
            |returns null on null input
            |external name 'graft.functions.DerbyUdfs.removeAllWhitespaces'"""
            .stripMargin),
        "trim_all" -> Seq(
          """create function trim_all(v varchar(4000))
            |returns varchar(4000)
            |parameter style java no sql language java
            |returns null on null input
            |external name 'graft.functions.DerbyUdfs.trimAll'"""
            .stripMargin))

      case _: PostgresDialect => Seq(
        "trim_all" -> Seq(
          """create or replace function trim_all(value text) returns text
            |    as $$ select btrim($1) $$
            |    LANGUAGE SQL IMMUTABLE RETURNS NULL ON NULL INPUT"""
            .stripMargin),
        "split" -> Seq(
          """create or replace function split(value text, sep text) returns text[]
            |    as $$ select string_to_array($1, $2) $$
            |    LANGUAGE SQL IMMUTABLE RETURNS NULL ON NULL INPUT"""
            .stripMargin),
        "remove_all_whitespaces" -> Seq(
          """create or replace function remove_all_whitespaces(value text) returns text
            |    as $$ select regexp_replace($1, '\s+', '', 'g') $$
            |    LANGUAGE SQL IMMUTABLE RETURNS NULL ON NULL INPUT"""
            .stripMargin))

      case _: ClickHouseDialect => Seq(
        "translate" -> Seq(
          "CREATE FUNCTION IF NOT EXISTS translate AS " +
            "(input, from, to) -> replaceAll(input, from, to)"))

      case _ => Nil
    }
}
