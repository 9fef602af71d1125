package graft.backend.rdb

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.RdbUdfs

/** The per-dialect UDF registry: Derby executes its functions live
  * (Java-backed), Postgres/ClickHouse are generated-DDL parity like the
  * rest of their dialects. */
class RdbUdfSpec extends AnyFunSuite {

  test("derby: registered UDFs execute in queries and clean() drops them") {
    val b = new RdbBackend("jdbc:derby:memory:rdbudf;create=true")
    try {
      b.initUdfs()
      val rows = b.execSql(
        "select remove_all_whitespaces('a b\tc'), trim_all('  x  ') " +
        "from sysibm.sysdummy1").collectRows()
      assert(rows === Seq(Seq("abc", "x")))
      // null-safe per RETURNS NULL ON NULL INPUT
      val nulls = b.execSql(
        "select trim_all(cast(null as varchar(10))) from sysibm.sysdummy1")
        .collectRows()
      assert(nulls === Seq(Seq(null)))
      // double init is tolerated
      b.initUdfs()
      b.clean() // must not fail on the function-laden schema
      assert(!b.dbExists(b.tempSchema))
    } finally b.close()
  }

  test("postgres/clickhouse: registry declares the reference udf surface") {
    val pg = RdbUdfs.forDialect(new PostgresDialect()).toMap
    assert(pg.keySet === Set("trim_all", "split", "remove_all_whitespaces"))
    assert(pg("split").head.contains("string_to_array"))
    assert(pg("trim_all").head.contains("create or replace function"))
    val ch = RdbUdfs.forDialect(new ClickHouseDialect()).toMap
    assert(ch.keySet === Set("translate"))
    assert(ch("translate").head.contains("replaceAll"))
  }
}
