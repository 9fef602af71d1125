package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.backend.SparkBackend
import graft.etl.SqlProcessor

/** Engine-driven catalog entries: each runs a real Easy-SQL ETL text
  * through graft's SqlProcessor (templates, variables, funcs, checks,
  * temp/cache/output steps) against the testdata tables, then returns the
  * resulting view/table — so the DuckDB oracle verifies the ENGINE, not
  * just the underlying Spark operators.
  */
object EtlOps {

  private def load(s: SparkSession, d: String): Unit = {
    Tables.orders(s, d).createOrReplaceTempView("orders_v")
    Tables.customer(s, d).createOrReplaceTempView("customer_v")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Steps exercised: variables (+expr vars), template with params,
    // temp view chaining, check, union of template expansions.
    "etl_pipeline" -> ((s, d) => {
      load(s, d)
      val etl = """-- backend: spark
-- target=variables
select 100000.0 as threshold, 'F' as status_a, 'O' as status_b
-- target=check.threshold_is_positive
select case when ${threshold} > 0 then 1 else 0 end as actual, 1 as expected
-- target=template.by_status
select o_orderstatus as status, count(*) as cnt,
       cast(sum(cast(o_totalprice as decimal(18,2))) as double) as total
from big_orders where o_orderstatus = '#{st}' group by o_orderstatus
-- target=temp.big_orders
select * from orders_v where o_totalprice > ${threshold}
-- target=temp.result
@{by_status(st=${status_a})} union all @{by_status(st=${status_b})}
"""
      new SqlProcessor(new SparkBackend(s), etl).run()
      s.table("result")
    }),

    // Steps exercised: output.<db>.<table> with __create_output_table__ +
    // static partition via __partition__<col>, then read-back of the
    // written table (the full save path: temp view → insert overwrite).
    "etl_output_readback" -> ((s, d) => {
      load(s, d)
      s.sql("create database if not exists graft_etl")
      s.sql("drop table if exists graft_etl.seg_stats")
      val etl = """-- backend: spark
-- target=variables
select true as __create_output_table__, 'r1' as __partition__run_id
-- target=temp.seg
select c_mktsegment as segment, count(*) as n_customers,
       cast(sum(cast(c_acctbal as decimal(18,2))) as double) as total_bal
from customer_v group by c_mktsegment
-- target=output.graft_etl.seg_stats
select * from seg
"""
      new SqlProcessor(new SparkBackend(s), etl).run()
      s.table("graft_etl.seg_stats")
        .select("segment", "n_customers", "total_bal")
    }),

    // Steps exercised: list_variables + variables feeding an IN-list and
    // a scalar into later SQL, log step, cache step.
    "etl_list_vars" -> ((s, d) => {
      load(s, d)
      val etl = """-- backend: spark
-- target=variables
select min(o_orderkey) as min_key from orders_v
-- target=cache.filtered
select * from orders_v where o_orderkey >= ${min_key}
-- target=log.row_count
select count(*) as cnt from filtered
-- target=temp.result
select o_orderstatus, count(*) as cnt from filtered group by o_orderstatus
"""
      new SqlProcessor(new SparkBackend(s), etl).run()
      s.table("result")
    })
  )

  val oracles: Map[String, String] = Map(
    "etl_pipeline" ->
      """SELECT o_orderstatus AS status, count(*) AS cnt,
         cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS total
         FROM orders WHERE o_totalprice > 100000.0
           AND o_orderstatus IN ('F','O')
         GROUP BY o_orderstatus""",
    "etl_output_readback" ->
      """SELECT c_mktsegment AS segment, count(*) AS n_customers,
         cast(sum(cast(c_acctbal as decimal(18,2))) as double) AS total_bal
         FROM customer GROUP BY c_mktsegment""",
    "etl_list_vars" ->
      """SELECT o_orderstatus, count(*) AS cnt FROM orders
         GROUP BY o_orderstatus"""
  )
}
