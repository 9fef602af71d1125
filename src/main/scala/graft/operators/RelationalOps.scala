package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SURVEY §2.D relational operator inventory, one named query per operator.
  *
  * The reference (easysql/easy_sql) passes all relational work through to
  * its backend engine (`Step.read` → `backend.exec_sql`, reference
  * `easy_sql/sql_processor/step.py:271-287`); this catalog IS that backend
  * surface, expressed Spark-first: declarative DataFrame plans that Catalyst
  * optimizes (pushdown, pruning, join selection, whole-stage codegen).
  *
  * Determinism contract with the DuckDB oracle (driver hash-compares):
  *  - per-row IEEE double arithmetic is bit-identical across engines;
  *  - aggregate sums over money columns go through decimal(18,2)
  *    (order-independent, exact), then cast back to double;
  *  - sum/avg of l_quantity is exact in double (values are integral);
  *  - every top-k / window ordering carries a unique tie-break key;
  *  - no raw timestamps in outputs (tz-awareness differs between
  *    Spark-written parquet and DuckDB) — dates/strings/epoch longs only.
  */
object RelationalOps {
  import Tables._

  private def decSum(c: String): Column =
    sum(col(c).cast(dec)).cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- scans / projections / filters -----------------------------------
    "scan_parquet" -> ((s, d) => nation(s, d)),

    "project" -> ((s, d) =>
      lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("disc_price"))),

    "filter" -> ((s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
                col("l_shipdate") <  lit("1996-01-01").cast("timestamp") &&
                col("l_quantity") > 30)
        .select("l_orderkey", "l_linenumber", "l_quantity",
                "l_extendedprice")),

    "with_column_lit" -> ((s, d) =>
      orders(s, d)
        .withColumn("flag",
          when(col("o_totalprice") > 100000, "big").otherwise("small"))
        .withColumn("one", lit(1))
        .select("o_orderkey", "o_totalprice", "flag", "one")),

    // --- set operations ---------------------------------------------------
    "union_all" -> ((s, d) =>
      customer(s, d).select(col("c_name").as("name"),
                            col("c_acctbal").as("acctbal"))
        .unionAll(supplier(s, d).select(col("s_name").as("name"),
                                        col("s_acctbal").as("acctbal")))),

    "union_distinct" -> ((s, d) =>
      customer(s, d).select(col("c_nationkey").as("nationkey"))
        .union(supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .distinct()),

    "distinct" -> ((s, d) =>
      lineitem(s, d).select("l_returnflag", "l_linestatus").distinct()),

    "intersect_except" -> ((s, d) =>
      customer(s, d).select(col("c_nationkey").as("k"))
        .intersect(supplier(s, d).select(col("s_nationkey").as("k")))
        .except(nation(s, d).filter(col("n_regionkey") === 0)
          .select(col("n_nationkey").as("k")))),

    // --- limit / top-k ----------------------------------------------------
    "limit" -> ((s, d) =>
      region(s, d).orderBy("r_regionkey").limit(3)),

    "sort_limit" -> ((s, d) =>
      orders(s, d).select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)),

    // --- aggregation ------------------------------------------------------
    "count_agg" -> ((s, d) =>
      lineitem(s, d).agg(
        count(lit(1)).as("cnt"),
        countDistinct(col("l_orderkey")).as("n_orders"))),

    // TPC-H Q1 shape: partial (map-side) aggregation before one shuffle on
    // the 6-value group key; decimal sums for oracle-exactness.
    "group_agg" -> ((s, d) =>
      lineitem(s, d).groupBy("l_returnflag", "l_linestatus").agg(
        sum("l_quantity").as("sum_qty"),
        decSum("l_extendedprice").as("sum_base"),
        sum(col("l_extendedprice").cast(dec) *
            (lit(1).cast(dec) - col("l_discount").cast(dec)))
          .cast("double").as("sum_disc"),
        count(lit(1)).as("cnt"),
        (sum("l_quantity") / count(lit(1))).as("avg_qty"))),

    "grouping_sets" -> ((s, d) =>
      lineitem(s, d).rollup("l_returnflag", "l_linestatus").agg(
        count(lit(1)).as("cnt"),
        sum("l_quantity").as("sum_qty"))),

    "first_row" -> ((s, d) =>
      orders(s, d).agg(
        count(lit(1)).as("cnt"),
        max("o_totalprice").cast("double").as("max_price"),
        min("o_orderkey").as("min_key"))),

    // --- joins ------------------------------------------------------------
    // customer is a dimension: broadcast it so the fact side never shuffles.
    "join_inner" -> ((s, d) =>
      orders(s, d)
        .join(broadcast(customer(s, d)),
              col("o_custkey") === col("c_custkey"), "inner")
        .groupBy("c_mktsegment").agg(
          count(lit(1)).as("cnt"),
          decSum("o_totalprice").as("sum_price"))),

    "join_left" -> ((s, d) =>
      customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey").agg(
          count(col("o_orderkey")).as("n_orders"),
          coalesce(decSum("o_totalprice"), lit(0.0)).as("total"))),

    "join_broadcast" -> ((s, d) =>
      lineitem(s, d)
        .join(broadcast(part(s, d).filter(col("p_size") > 40)),
              col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand").agg(
          count(lit(1)).as("cnt"),
          sum("l_quantity").as("sum_qty"))),

    "semi_anti_join" -> ((s, d) => {
      val c = customer(s, d)
      val f = orders(s, d).filter(col("o_orderstatus") === "F")
        .select("o_custkey")
      val semi = c.join(f, col("c_custkey") === col("o_custkey"),
                        "left_semi")
        .select(col("c_custkey")).withColumn("kind", lit("has_f"))
      val anti = c.join(f, col("c_custkey") === col("o_custkey"),
                        "left_anti")
        .select(col("c_custkey")).withColumn("kind", lit("no_f"))
      semi.unionAll(anti)
    }),

    "null_safe_eq_join" -> ((s, d) => {
      val a = customer(s, d).select(
        col("c_custkey"),
        nullif(col("c_mktsegment"), lit("BUILDING")).as("seg"))
      val b = a.select("seg").distinct()
        .withColumnRenamed("seg", "seg_b")
      a.join(b, col("seg") <=> col("seg_b"))
        .groupBy("seg_b").agg(count(lit(1)).as("cnt"))
        .withColumnRenamed("seg_b", "seg")
    }),

    // Full outer join with genuine danglers on BOTH sides (rare-balance
    // customers vs rare-balance suppliers per nation) — the side column
    // proves each null-extension path executed. Both inputs are
    // pre-aggregated to one row per nation BEFORE the join, so the
    // full-outer exchange carries counts, never base rows.
    "join_full_outer" -> ((s, d) => {
      val c = customer(s, d).filter(col("c_acctbal") > 9950)
        .groupBy(col("c_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_cust"))
      val sup = supplier(s, d).filter(col("s_acctbal") > 9500)
        .groupBy(col("s_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_supp"))
      c.join(sup, Seq("nationkey"), "full_outer")
        .select(col("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"),
          when(col("n_cust").isNull, "supp_only")
            .when(col("n_supp").isNull, "cust_only")
            .otherwise("both").as("side"))
    }),

    // Wide pivot with an EXPLICIT value domain — at scale the domain
    // must be passed, not discovered: pivot(col) without values runs a
    // blocking distinct job over the corpus first, and an unbounded
    // domain (user ids, urls) would OOM the driver on the column list.
    // The plan is one map-side-combined aggregate keyed on the row key
    // only; pivot columns are conditional aggregation, not a shuffle
    // per column.
    "pivot_wide" -> ((s, d) =>
      lineitem(s, d).groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(decSum("l_quantity"))
        .select(col("l_returnflag"),
          col("F").as("qty_f"), col("O").as("qty_o"))),

    // Long unpivot (melt): the inverse reshape, a narrow 4× row
    // explosion with zero shuffle — column names become data, which is
    // how metric-per-row stores ingest wide fact tables.
    "unpivot_long" -> ((s, d) =>
      lineitem(s, d).filter(col("l_orderkey") < 100)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"),
                col("l_discount"), col("l_tax")),
          "metric", "value")),

    // --- subqueries (SQL surface via temp views) --------------------------
    "subquery_scalar" -> ((s, d) => {
      orders(s, d).createOrReplaceTempView("g_orders_sq")
      s.sql("""
        SELECT o_orderkey, o_totalprice FROM g_orders_sq
        WHERE o_totalprice > (
          SELECT cast(sum(cast(o_totalprice as decimal(18,2))) as double)
                 / count(*) FROM g_orders_sq)
      """)
    }),

    // --- lateral / generator ---------------------------------------------
    "explode_array" -> ((s, d) =>
      documents(s, d).select(
        col("doc_id"),
        explode(split(col("text"), " ")).as("token"))),

    // --- window functions -------------------------------------------------
    "window_rank" -> ((s, d) => {
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      orders(s, d)
        .select(col("o_orderstatus"), col("o_orderkey"),
                col("o_totalprice"), row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
    }),

    "window_agg_frame" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      orders(s, d).select(
        col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast(dec)).over(w)
          .cast("double").as("running_total"))
    }),

    // --- scalar function families ----------------------------------------
    "scalar_string_fns" -> ((s, d) =>
      part(s, d).select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        trim(col("p_name")).as("tname"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        md5(col("p_name")).as("name_md5"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("novowel"),
        length(col("p_name")).as("name_len"),
        substring(col("p_name"), 1, 5).as("name5"),
        size(split(col("p_name"), " ")).as("n_words"))),

    "scalar_date_fns" -> ((s, d) =>
      orders(s, d).select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("d_str"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_add(col("o_orderdate").cast("date"), 30).as("d30"),
        datediff(col("o_orderdate").cast("date"),
                 lit("1995-01-01").cast("date")).as("dd"),
        trunc(col("o_orderdate").cast("date"), "month").as("mstart"))),

    "scalar_json_fns" -> ((s, d) =>
      events(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast("int").as("k_int"))),

    "cast_types" -> ((s, d) =>
      lineitem(s, d).select(
        col("l_orderkey"),
        col("l_linenumber"),
        col("l_orderkey").cast("string").as("ok_str"),
        col("l_orderkey").cast("string").cast("long").as("ok_rt"),
        // floor() both sides: DuckDB double→int cast rounds, Spark
        // truncates — floor first makes them agree.
        floor(col("l_quantity")).cast("int").as("qty_int"),
        col("l_extendedprice").cast(dec).cast("double").as("price_dec"),
        col("l_shipdate").cast("date").as("ship_d"),
        col("l_shipdate").cast("date").cast("string").as("ship_s"))),

    "case_when_null" -> ((s, d) =>
      orders(s, d).select(
        col("o_orderkey"),
        when(col("o_orderstatus") === "O", "open")
          .when(col("o_orderstatus") === "F", "finished")
          .otherwise(lit(null).cast("string")).as("status_name"),
        nullif(col("o_orderstatus"), lit("P")).isNull.as("is_pending"),
        coalesce(nullif(col("o_orderpriority"), lit("1-URGENT")),
                 lit("other")).as("prio"))),

    // --- shipped UDFs in the hot path (reference udf/udfs.py:29-34) ----
    "udf_string_cleanup" -> ((s, d) => {
      graft.functions.Udfs.registerAll(s)
      part(s, d).createOrReplaceTempView("g_udf_part")
      s.sql("""SELECT p_partkey,
               remove_all_whitespaces(p_name) AS compact_name,
               trim_all(concat(' ', p_name, ' ')) AS trimmed
               FROM g_udf_part""")
    }),

    // --- schema alignment (save-path column reorder/prune,
    //     reference easy_sql/sql_processor/backend/spark.py:271-279) ------
    "schema_align_select" -> ((s, d) => {
      val widened = orders(s, d)
        .withColumn("extra_col", lit("dropme"))
        .select("extra_col", "o_totalprice", "o_orderkey", "o_custkey",
                "o_orderstatus", "o_orderdate", "o_orderpriority")
      val target = Seq("o_orderkey", "o_custkey", "o_totalprice")
      widened.select(target.map(col): _*)
    })
  )

  val oracles: Map[String, String] = Map(
    "scan_parquet" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    "project" ->
      """SELECT l_orderkey, l_linenumber,
         l_extendedprice * (1 - l_discount) AS disc_price FROM lineitem""",
    "filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1995-01-01'
           AND l_shipdate <  TIMESTAMP '1996-01-01'
           AND l_quantity > 30""",
    "with_column_lit" ->
      """SELECT o_orderkey, o_totalprice,
         CASE WHEN o_totalprice > 100000 THEN 'big' ELSE 'small' END AS flag,
         1 AS one FROM orders""",
    "union_all" ->
      """SELECT c_name AS name, c_acctbal AS acctbal FROM customer
         UNION ALL
         SELECT s_name AS name, s_acctbal AS acctbal FROM supplier""",
    "union_distinct" ->
      """SELECT c_nationkey AS nationkey FROM customer
         UNION
         SELECT s_nationkey AS nationkey FROM supplier""",
    "distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "intersect_except" ->
      """(SELECT c_nationkey AS k FROM customer
          INTERSECT SELECT s_nationkey FROM supplier)
         EXCEPT
         SELECT n_nationkey FROM nation WHERE n_regionkey = 0""",
    "limit" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey LIMIT 3",
    "sort_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "count_agg" ->
      """SELECT count(*) AS cnt, count(DISTINCT l_orderkey) AS n_orders
         FROM lineitem""",
    "group_agg" ->
      """SELECT l_returnflag, l_linestatus,
         sum(l_quantity) AS sum_qty,
         cast(sum(cast(l_extendedprice as decimal(18,2))) as double)
           AS sum_base,
         cast(sum(cast(l_extendedprice as decimal(18,2)) *
                  (cast(1 as decimal(18,2)) -
                   cast(l_discount as decimal(18,2)))) as double)
           AS sum_disc,
         count(*) AS cnt,
         sum(l_quantity) / count(*) AS avg_qty
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
         sum(l_quantity) AS sum_qty
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "first_row" ->
      """SELECT count(*) AS cnt,
         cast(max(o_totalprice) as double) AS max_price,
         min(o_orderkey) AS min_key FROM orders""",
    "join_inner" ->
      """SELECT c_mktsegment, count(*) AS cnt,
         cast(sum(cast(o_totalprice as decimal(18,2))) as double)
           AS sum_price
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment""",
    "join_left" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
         coalesce(cast(sum(cast(o_totalprice as decimal(18,2))) as double),
                  0.0) AS total
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey""",
    "join_broadcast" ->
      """SELECT p_brand, count(*) AS cnt, sum(l_quantity) AS sum_qty
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE p_size > 40 GROUP BY p_brand""",
    "semi_anti_join" ->
      """SELECT c_custkey, 'has_f' AS kind FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
         UNION ALL
         SELECT c_custkey, 'no_f' AS kind FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""",
    "null_safe_eq_join" ->
      """WITH a AS (SELECT c_custkey,
                    nullif(c_mktsegment, 'BUILDING') AS seg FROM customer),
            b AS (SELECT DISTINCT seg AS seg_b FROM a)
         SELECT seg_b AS seg, count(*) AS cnt
         FROM a JOIN b ON a.seg IS NOT DISTINCT FROM b.seg_b
         GROUP BY seg_b""",
    "join_full_outer" ->
      """WITH c AS (SELECT c_nationkey AS nationkey, count(*) AS n_cust
                    FROM customer WHERE c_acctbal > 9950
                    GROUP BY c_nationkey),
            s AS (SELECT s_nationkey AS nationkey, count(*) AS n_supp
                    FROM supplier WHERE s_acctbal > 9500
                    GROUP BY s_nationkey)
         SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
           coalesce(n_cust, 0) AS n_cust,
           coalesce(n_supp, 0) AS n_supp,
           CASE WHEN n_cust IS NULL THEN 'supp_only'
                WHEN n_supp IS NULL THEN 'cust_only'
                ELSE 'both' END AS side
         FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey""",
    "pivot_wide" ->
      """SELECT l_returnflag,
           cast(sum(CASE WHEN l_linestatus = 'F'
                    THEN cast(l_quantity as decimal(18,2)) END) as double)
             AS qty_f,
           cast(sum(CASE WHEN l_linestatus = 'O'
                    THEN cast(l_quantity as decimal(18,2)) END) as double)
             AS qty_o
         FROM lineitem GROUP BY l_returnflag""",
    "unpivot_long" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
                l_quantity AS value
         FROM lineitem WHERE l_orderkey < 100
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
         FROM lineitem WHERE l_orderkey < 100
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
         FROM lineitem WHERE l_orderkey < 100
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
         FROM lineitem WHERE l_orderkey < 100""",
    "subquery_scalar" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_totalprice > (
           SELECT cast(sum(cast(o_totalprice as decimal(18,2))) as double)
                  / count(*) FROM orders)""",
    "explode_array" ->
      """SELECT doc_id, unnest(string_split(text, ' ')) AS token
         FROM documents""",
    "window_rank" ->
      """SELECT * FROM (
           SELECT o_orderstatus, o_orderkey, o_totalprice,
                  cast(row_number() OVER (PARTITION BY o_orderstatus
                    ORDER BY o_totalprice DESC, o_orderkey ASC) as int) AS rn
           FROM orders) WHERE rn <= 3""",
    "window_agg_frame" ->
      """SELECT o_custkey, o_orderkey,
         cast(sum(cast(o_totalprice as decimal(18,2))) OVER (
           PARTITION BY o_custkey
           ORDER BY o_orderdate ASC, o_orderkey ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as double)
           AS running_total
         FROM orders""",
    "scalar_string_fns" ->
      """SELECT p_partkey,
         upper(p_name) AS uname,
         trim(p_name) AS tname,
         concat_ws('-', p_brand, p_type) AS brand_type,
         md5(p_name) AS name_md5,
         regexp_replace(p_name, '[aeiou]', '', 'g') AS novowel,
         cast(length(p_name) as int) AS name_len,
         substr(p_name, 1, 5) AS name5,
         cast(len(string_split(p_name, ' ')) as int) AS n_words
         FROM part""",
    "scalar_date_fns" ->
      """SELECT o_orderkey,
         strftime(o_orderdate, '%Y-%m-%d') AS d_str,
         cast(extract(year from o_orderdate) as int) AS y,
         cast(extract(month from o_orderdate) as int) AS m,
         cast(extract(day from o_orderdate) as int) AS dom,
         cast(o_orderdate as date) + 30 AS d30,
         cast(datediff('day', DATE '1995-01-01',
                       cast(o_orderdate as date)) as int) AS dd,
         cast(date_trunc('month', o_orderdate) as date) AS mstart
         FROM orders""",
    "scalar_json_fns" ->
      """SELECT event_id,
         json_extract_string(props, '$.k') AS k_str,
         cast(json_extract_string(props, '$.k') as int) AS k_int
         FROM events""",
    "cast_types" ->
      """SELECT l_orderkey, l_linenumber,
         cast(l_orderkey as varchar) AS ok_str,
         cast(cast(l_orderkey as varchar) as bigint) AS ok_rt,
         cast(floor(l_quantity) as int) AS qty_int,
         cast(cast(l_extendedprice as decimal(18,2)) as double) AS price_dec,
         cast(l_shipdate as date) AS ship_d,
         cast(cast(l_shipdate as date) as varchar) AS ship_s
         FROM lineitem""",
    "case_when_null" ->
      """SELECT o_orderkey,
         CASE WHEN o_orderstatus = 'O' THEN 'open'
              WHEN o_orderstatus = 'F' THEN 'finished'
              ELSE NULL END AS status_name,
         nullif(o_orderstatus, 'P') IS NULL AS is_pending,
         coalesce(nullif(o_orderpriority, '1-URGENT'), 'other') AS prio
         FROM orders""",
    "udf_string_cleanup" ->
      """SELECT p_partkey,
         regexp_replace(p_name, '\s+', '', 'g') AS compact_name,
         trim(concat(' ', p_name, ' ')) AS trimmed
         FROM part""",
    "schema_align_select" ->
      "SELECT o_orderkey, o_custkey, o_totalprice FROM orders"
  )
}
