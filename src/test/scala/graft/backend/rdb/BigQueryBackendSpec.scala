package graft.backend.rdb

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.Connection

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

import graft.backend.TableMeta

/** Backend-protocol assertions for the dataset-scoped partition-metadata
  * path (BigQuery): the per-dataset `__table_partitions__` table must be
  * created before its first use — the reference creates it on every save
  * for non-static-partition dialects (rdb.py:621) — and partition lookups
  * must hit the per-dataset table WITHOUT a db_name predicate. No BigQuery
  * service exists in this sandbox, so the backend runs over a recording
  * JDBC proxy: the statement sequence is the observable behavior, the
  * same discipline as [[WarehouseDialectSpec]].
  */
class BigQueryBackendSpec extends AnyFunSuite {

  /** Records every executed statement; all queries return zero rows. */
  private def recordingConnection(log: mutable.Buffer[String]): Connection = {
    def proxy(iface: Class[_]): AnyRef =
      Proxy.newProxyInstance(getClass.getClassLoader, Array(iface),
        new InvocationHandler {
          def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = {
            m.getName match {
              case "execute" | "executeUpdate" =>
                log += args(0).toString
              case "executeQuery" =>
                log += args(0).toString
              case _ => ()
            }
            val rt = m.getReturnType
            if (rt == java.lang.Boolean.TYPE)
              java.lang.Boolean.FALSE // rs.next() = no rows; execute = false
            else if (rt == java.lang.Integer.TYPE)
              Integer.valueOf(if (m.getName == "getColumnCount") 1 else 0)
            else if (rt == java.lang.Long.TYPE) java.lang.Long.valueOf(0L)
            else if (rt == Void.TYPE || !rt.isInterface) null
            else proxy(rt)
          }
        })
    proxy(classOf[Connection]).asInstanceOf[Connection]
  }

  test("partitionValues creates the per-dataset meta table once, " +
      "then queries it without db_name") {
    val log = mutable.Buffer[String]()
    val backend = new RdbBackend(recordingConnection(log),
      new BigQueryDialect(defaultDataset = "dw"))
    log.clear() // drop constructor-time temp-schema statements

    backend.partitionValues(TableMeta("dw.orders"))
    val creates = log.filter(_.contains("create table if not exists " +
      "dw.__table_partitions__"))
    assert(creates.length === 1)
    val lookup = log.find(_.startsWith("select partition_value")).get
    assert(lookup.contains("from dw.__table_partitions__"))
    assert(lookup.contains("table_name = 'orders'"))
    assert(!lookup.contains("db_name"), "per-dataset table has no db_name")

    // second lookup in the same dataset: the ensure is memoized
    log.clear()
    backend.partitionValues(TableMeta("dw.orders"))
    assert(!log.exists(_.contains("create table")), "ensure ran twice")

    // a NEW dataset gets its own meta table
    log.clear()
    backend.partitionValues(TableMeta("other.t"))
    assert(log.exists(_.contains("create table if not exists " +
      "other.__table_partitions__")))
    assert(log.find(_.startsWith("select partition_value")).get
      .contains("from other.__table_partitions__"))
  }
}
