package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the per-package operator catalogs; every key has a
  * DuckDB-runnable mirror in `oracleSql` unless the operator is plan-level
  * (partitioning, caching) where the driver records a rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 shape: scan → partial agg → single shuffle on a tiny key. */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    RelationalOps.queries("group_agg")(spark, d)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalOps.queries ++ WriteOps.queries ++ EventOps.queries ++
      TextOps.queries ++ DedupOps.queries ++ VectorOps.queries ++
      MultimodalOps.queries ++ EtlOps.queries ++ AdvancedOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalOps.oracles ++ WriteOps.oracles ++ EventOps.oracles ++
      TextOps.oracles ++ DedupOps.oracles ++ VectorOps.oracles ++
      MultimodalOps.oracles ++ EtlOps.oracles ++ AdvancedOps.oracles
}
