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

  /** Run examples/ingest_documents_stream.sql through the CLI streaming
    * path against `d`'s staged document arrival log, with a per-(sfDir,
    * gate) durable sink/checkpoint. Returns the sink root. */
  private def runStreamingExample(s: SparkSession, d: String,
      gate: String): String = {
    import graft.streaming.DocIngest
    // java.nio is correct here: examples/*.sql are REPO SOURCE files
    // read relative to the checkout (like the specs read fixtures),
    // not data paths — the data path (source_dir) flows through the
    // ETL's own Hadoop-routed readers
    val etl = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("examples/ingest_documents_stream.sql")),
      "UTF-8")
    val (sink, _) = DocIngest.sinkCkpt(d, gate)
    graft.DataProcess.run(etl,
      Map("source_dir" -> DocIngest.dir(s, d),
        "sink_dir" -> sink.toString),
      dryRun = false, baseDir = Some("examples"),
      existingSession = Some(s))
    sink.toString
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

    // The END-TO-END composition gate: the full curation example
    // (examples/curate_documents.sql — quality filter → repetition gate
    // → exact dedup → MinHash near-dup drop → curated output) through
    // the REAL CLI path, DataProcess.run: header-directive parsing,
    // in-file spark confs, native-function registration, the complete
    // step list (variables, temp chains, log, check,
    // output-with-auto-create), then the WRITTEN catalog table read
    // back. The step language and the operator catalog are each gated
    // separately; this verifies them COMPOSED, the way a user actually
    // runs the engine.
    "etl_curate_e2e" -> ((s, d) => {
      Tables.documents(s, d).createOrReplaceTempView("documents")
      s.sql("create database if not exists curated")
      s.sql("drop table if exists curated.documents")
      val etl = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("examples/curate_documents.sql")),
        "UTF-8")
      // the example's `-- config:` line retunes shuffle width on the
      // SHARED session — scope it like the streaming gates do
      val saved = s.conf.get("spark.sql.shuffle.partitions")
      try graft.DataProcess.run(etl, Map.empty, dryRun = false,
        baseDir = Some("examples"), existingSession = Some(s))
      finally s.conf.set("spark.sql.shuffle.partitions", saved)
      s.table("curated.documents").select("doc_id", "text", "n_tokens")
    }),

    // The BACKEND-FAMILY gate: the same step language on a second engine.
    // Spark does the distributed part (per-(lang, source) partial
    // aggregates over the parquet corpus — the only stage that scales
    // with data size), the bounded partials land in embedded Derby via
    // the RDB backend's fixture-ingest path, and an Easy-SQL ETL runs
    // THERE through the backend-generic SqlProcessor: variables, temp
    // rollup, a conservation check, output-with-auto-create. The written
    // warehouse table is read back and oracled against DuckDB computing
    // the same report straight from the parquet — so the gate verifies
    // the RDB save protocol, not just the SQL. The warehouse-side work
    // is O(groups), never O(corpus): exactly how a 100 TB pipeline
    // hands a bounded report to an operational store.
    "etl_rdb_pipeline" -> ((s, d) => {
      import org.apache.spark.sql.functions.{count, sum}
      import org.apache.spark.sql.types._
      val partials = Tables.documents(s, d)
        .groupBy("lang", "source")
        .agg(count("*").as("n_docs"), sum("n_chars").as("total_chars"))
        .collect() // bounded: |langs| x |sources| rows
      val dbName = s"etlgate_${java.util.UUID.randomUUID.toString.replace("-", "")}"
      val backend = new graft.backend.rdb.RdbBackend(
        s"jdbc:derby:memory:$dbName;create=true")
      try {
        backend.createTableWithData("stage.doc_stats",
          partials.toSeq.map(r => Seq[Any](r.getString(0), r.getString(1),
            r.getLong(2), r.getLong(3))),
          Seq(graft.backend.rdb.RdbCol("lang", "varchar(16)"),
            graft.backend.rdb.RdbCol("source", "varchar(32)"),
            graft.backend.rdb.RdbCol("n_docs", "bigint"),
            graft.backend.rdb.RdbCol("total_chars", "bigint")), Nil)
        val etl = """-- backend: postgres
-- target=variables
select cast(sum(n_docs) as bigint) as total_docs from stage.doc_stats
-- target=temp.lang_rollup
select lang, sum(n_docs) as n_docs, sum(total_chars) as total_chars
from stage.doc_stats group by lang
-- target=check.docs_conserved
select cast(sum(n_docs) as bigint) as actual,
       cast(${total_docs} as bigint) as expected from lang_rollup
-- target=variables
select '1' as "__create_output_table__" from sysibm.sysdummy1
-- target=output.dw.lang_report
select lang, n_docs, total_chars,
       cast(total_chars as double) / cast(n_docs as double) as avg_chars
from lang_rollup
"""
        new SqlProcessor(backend, etl).run()
        val rows = backend.queryRows(
          "select lang, n_docs, total_chars, avg_chars from dw.lang_report",
          1000)
        val schema = StructType(Seq(
          StructField("lang", StringType), StructField("n_docs", LongType),
          StructField("total_chars", LongType),
          StructField("avg_chars", DoubleType)))
        val jRows = new java.util.ArrayList[org.apache.spark.sql.Row]()
        rows.foreach(r => jRows.add(
          org.apache.spark.sql.Row(r(0), r(1), r(2), r(3))))
        s.createDataFrame(jRows, schema)
      } finally {
        backend.close()
        try java.sql.DriverManager.getConnection(
          s"jdbc:derby:memory:$dbName;drop=true")
        catch { case _: java.sql.SQLException => () } // expected on drop
      }
    }),

    // The STREAMING execution mode through the real CLI — the
    // reference's third mode (config/sql_config.py:207-216 routes
    // easy_sql.etl_type=streaming to the Flink statement-set runner;
    // ETL test/sample_etl.flink.postgres-cdc.sql): the header-declared
    // arrival log streams one file per micro-batch through
    // DataProcess.run → StreamingEtl, steps route each batch, the
    // curated sink is read back. Every step is per-document (stateless)
    // so the drained sink equals the batch computation — the
    // batch-invariance that lets the SAME DuckDB oracle verify the
    // stream. Re-invocation restarts from the durable checkpoint and
    // finds no new data (the production restart path).
    "etl_streaming_e2e" -> ((s, d) => {
      val sink = runStreamingExample(s, d, "etl_streaming_e2e")
      s.read.option("recursiveFileLookup", "true")
        .parquet(s"$sink/sink__curated_stream")
    }),

    // The MULTI-SINK statement set — parity with the reference's
    // multi-sink CDC ETL (test/sample_etl.flink.postgres-cdc.multi-
    // sink.sql; statement-set buffering backend/flink.py:122-131): the
    // SAME ingest stream commits to TWO sinks (curated + quarantine)
    // per micro-batch through ONE foreachBatch query with one
    // checkpoint. Both sinks are read back, labeled, and oracled
    // together; StatementSetSpec adds the restart-idempotence contract
    // (a checkpoint-recovery replay leaves both sinks byte-stable).
    "streaming_multi_sink" -> ((s, d) => {
      import org.apache.spark.sql.functions.{col, lit}
      val sink = runStreamingExample(s, d, "streaming_multi_sink")
      def readBack(name: String, label: String) =
        s.read.option("recursiveFileLookup", "true")
          .parquet(s"$sink/sink__$name")
          .select(lit(label).as("sink_name"), col("doc_id"),
            col("n_tokens"))
      readBack("curated_stream", "curated")
        .unionByName(readBack("quarantine_stream", "quarantine"))
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
         GROUP BY o_orderstatus""",

    // the streaming curation route is per-document, so the drained sink
    // equals this batch computation over the full documents table (the
    // token convention matches examples/curate_documents.sql: split on
    // single spaces, empties kept)
    "etl_streaming_e2e" ->
      """WITH t AS (SELECT doc_id, text,
           len(string_split(lower(trim(text)), ' ')) AS n FROM documents)
         SELECT doc_id, text, cast(n as int) AS n_tokens
         FROM t WHERE n >= 40""",
    "streaming_multi_sink" ->
      """WITH t AS (SELECT doc_id,
           len(string_split(lower(trim(text)), ' ')) AS n FROM documents)
         SELECT 'curated' AS sink_name, doc_id, cast(n as int) AS n_tokens
         FROM t WHERE n >= 40
         UNION ALL
         SELECT 'quarantine' AS sink_name, doc_id, cast(n as int)
         FROM t WHERE n < 40""",

    // the per-lang report the Derby-side ETL produces, recomputed
    // straight from the parquet corpus; the avg is ONE division of two
    // exact integer sums, so it is correctly rounded in both engines
    "etl_rdb_pipeline" ->
      """SELECT lang, cast(count(*) as bigint) AS n_docs,
         cast(sum(n_chars) as bigint) AS total_chars,
         cast(sum(n_chars) as double) / cast(count(*) as double) AS avg_chars
         FROM documents GROUP BY lang""",

    // mirrors every stage of examples/curate_documents.sql; the minhash
    // CTEs follow DedupOps' oracle conventions (salted-md5 signature
    // mins, band digests over concatenated hex) at the example's
    // k=4 / bands=2 / 3-word-gram parameters
    "etl_curate_e2e" -> {
      val sigCols = (0 until 4).map(j =>
        s"list_aggregate(list_transform(shingles, x -> md5('$j|' || x)), " +
        s"'min') AS sig_$j").mkString(",\n             ")
      s"""WITH t AS (SELECT doc_id, text,
             string_split(lower(trim(text)), ' ') AS toks FROM documents),
         doc_stats AS (SELECT doc_id, text, toks,
             len(toks) AS n_tokens,
             cast(len(regexp_replace(text, '[^a-zA-Z]', '', 'g')) as double)
               / greatest(len(text), 1) AS alpha_ratio
           FROM t),
         quality AS (SELECT doc_id, text, toks, n_tokens FROM doc_stats
           WHERE n_tokens >= 5 AND alpha_ratio > 0.5),
         grams2 AS (SELECT doc_id, g, count(*) AS c FROM (
             SELECT doc_id, unnest(list_transform(
               range(1, greatest(len(toks) - 1, 1) + 1),
               i -> array_to_string(list_slice(toks, i, i + 1), ' '))) AS g
             FROM quality) GROUP BY doc_id, g),
         repetition AS (SELECT doc_id,
             cast(max(c) as double) / cast(sum(c) as double) AS top2_frac
           FROM grams2 GROUP BY doc_id),
         unrep AS (SELECT q.doc_id, q.text, q.toks, q.n_tokens
           FROM quality q JOIN repetition r ON q.doc_id = r.doc_id
           WHERE r.top2_frac <= 0.5),
         exact_kept AS (SELECT doc_id, text, toks, n_tokens FROM (
             SELECT *, row_number() OVER (
               PARTITION BY md5(lower(trim(text))) ORDER BY doc_id) AS rn
             FROM unrep) WHERE rn = 1),
         sh AS (SELECT doc_id, list_transform(
             range(1, greatest(len(toks) - 2, 1) + 1),
             i -> array_to_string(list_slice(toks, i, i + 2), ' '))
               AS shingles
           FROM exact_kept),
         sigs AS (SELECT doc_id,
             $sigCols
           FROM sh),
         bands AS (
           SELECT doc_id, 0 AS band_id, md5(sig_0 || sig_1) AS band_hash
           FROM sigs
           UNION ALL
           SELECT doc_id, 1, md5(sig_2 || sig_3) FROM sigs),
         losers AS (SELECT DISTINCT b.doc_id FROM bands a JOIN bands b
           ON a.band_id = b.band_id AND a.band_hash = b.band_hash
          AND a.doc_id < b.doc_id),
         curated AS (SELECT k.doc_id, k.text, k.n_tokens FROM exact_kept k
           WHERE NOT EXISTS (SELECT 1 FROM losers l
                             WHERE l.doc_id = k.doc_id))
         SELECT doc_id, text, cast(n_tokens as int) AS n_tokens
         FROM curated"""
    }
  )
}
