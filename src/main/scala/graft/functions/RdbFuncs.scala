package graft.functions

import graft.backend.TableMeta
import graft.backend.rdb.RdbBackend
import graft.core.{Coerce, VarsContext}

/** The JDBC-warehouse function library callable from `${f(...)}`,
  * `func.`, `check.` and `if=` sites — the RDB analogue of
  * [[SparkFuncs]] (reference funcs_rdb.py:191-268 over
  * funcs_common.py). Partition state comes from the backend's
  * partition-value source (the partition-metadata table for dialects
  * without native partitions); column/table helpers run through JDBC
  * metadata and engine-side `count` queries, so nothing unbounded is
  * pulled to the client.
  */
object RdbFuncs {

  private def s(v: Any): String = Coerce.toStr(v)

  def all(backend: RdbBackend, vars: VarsContext)
      : Map[String, Seq[Any] => Any] = {

    def partitionValues(table: String): Seq[String] =
      backend.partitionValues(TableMeta(table)).sorted

    def partitionExists(table: String, value: String): Boolean =
      partitionValues(table).contains(value)

    def firstPartitionOpt(table: String): Option[String] =
      partitionValues(table).headOption

    def tableFields(table: String): Seq[String] = {
      val m = TableMeta(table)
      backend.columnNames(m.dbName.getOrElse(backend.tempSchema),
        m.pureTableName)
    }

    def allColsExpr(ps: Seq[Any]): String = {
      val table = s(ps.head)
      val excluded = ps.tail.map(s)
      tableFields(table).filterNot(excluded.contains)
        .map(c => s"$table.$c").mkString(", ")
    }

    def countWhere(table: String, cond: String): Long =
      backend.queryRows(s"select count(1) from $table where $cond", 1)
        .head.head match {
          case n: Number => n.longValue()
          case other => other.toString.toLong
        }

    def checkNotNull(table: String, cols: Seq[String],
        query: Option[String]): Boolean = {
      val bad = cols.map { c =>
        val cond = query.map(q => s"($c is null) and ($q)")
          .getOrElse(s"$c is null")
        c -> countWhere(table, cond)
      }.filter(_._2 != 0)
      if (bad.nonEmpty)
        println(s"check_not_null_column_in_table $table failed, found: " +
          bad.map { case (c, n) => s"$n null rows($c)" }.mkString("\n"))
      bad.isEmpty
    }

    Map(
      "partition_exists" -> (ps => partitionExists(s(ps.head), s(ps(1)))),
      "partition_not_exists" -> (ps => !partitionExists(s(ps.head), s(ps(1)))),
      "is_first_partition" -> (ps =>
        firstPartitionOpt(s(ps.head)).contains(s(ps(1)))),
      "is_not_first_partition" -> (ps =>
        !firstPartitionOpt(s(ps.head)).contains(s(ps(1)))),
      "get_first_partition" -> (ps =>
        firstPartitionOpt(s(ps.head)).getOrElse(
          throw new graft.core.SqlProcessorException(
            s"no partitions for table ${s(ps.head)}"))),
      "get_first_partition_optional" -> (ps =>
        firstPartitionOpt(s(ps.head)).getOrElse("")),
      "get_last_partition" -> (ps =>
        partitionValues(s(ps.head)).lastOption.getOrElse(
          throw new graft.core.SqlProcessorException(
            s"no partitions for table ${s(ps.head)}"))),
      "get_partition_values_as_joined_str" -> (ps =>
        partitionValues(s(ps.head)).mkString(",")),
      "ensure_partition_exists" -> (ps => {
        // (table..., partition_value) — value last, reference
        // funcs_common.py:131-139
        val value = s(ps.last)
        val tables = ps.dropRight(1).map(s)
        val missing = tables.filterNot(t =>
          try partitionExists(t, value) catch { case _: Exception => false })
        if (missing.nonEmpty)
          println(s"partition $value not exists: ${missing.mkString(",")}")
        missing.isEmpty
      }),

      "all_cols_without_one_expr" -> (ps => allColsExpr(ps)),
      "all_cols_with_exclusion_expr" -> (ps => allColsExpr(ps)),
      "all_cols_prefixed_with_exclusion_expr" -> (ps => {
        val table = s(ps.head)
        val prefix = s(ps(1))
        val excluded = ps.drop(2).map(s)
        tableFields(table).filterNot(excluded.contains)
          .map(c => s"$table.$c as $prefix$c").mkString(", ")
      }),

      "ensure_no_null_data_in_table" -> (ps => {
        val table = s(ps(1))
        val query = if (ps.length > 2) Some(s(ps(2))).filter(_.nonEmpty)
          else None
        checkNotNull(table, tableFields(table), query)
      }),
      "check_not_null_column_in_table" -> (ps => {
        val table = s(ps(1))
        val cols = s(ps(2)).split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val query = if (ps.length > 3) Some(s(ps(3))).filter(_.nonEmpty)
          else None
        checkNotNull(table, cols, query)
      }),

      "send_alert" -> (ps =>
        SparkFuncs.alerter.sendAlert(s(ps.head),
          if (ps.length > 1) s(ps(1)) else "")),
      "sleep" -> (ps => Thread.sleep((s(ps.head).toDouble * 1000).toLong))
    )
  }
}
