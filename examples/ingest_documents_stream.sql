-- backend: spark
-- config: easy_sql.etl_type=streaming
-- config: easy_sql.streaming_source=arrivals:${source_dir}
-- config: easy_sql.streaming_sink_dir=${sink_dir}
-- inputs: arrivals
-- outputs: sink.curated_stream, sink.quarantine_stream

-- Streaming ingest curation: documents arrive as micro-batches and are
-- routed per batch — long-enough docs to the curated sink, the rest to
-- quarantine for inspection. Two sinks, one source, no stateful aggs:
-- the commit runs as ONE statement-set query (single checkpoint, both
-- sinks written from the same pass over each micro-batch), the Spark
-- twin of the reference's Flink multi-sink statement set
-- (test/sample_etl.flink.postgres-cdc.multi-sink.sql).

-- target=variables
select 40 as min_tokens

-- target=temp.scored
select doc_id, text, lang, source,
       size(split(lower(trim(text)), ' ')) as n_tokens
from arrivals

-- target=output.sink.curated_stream
select doc_id, text, n_tokens from scored where n_tokens >= ${min_tokens}

-- target=output.sink.quarantine_stream
select doc_id, n_tokens from scored where n_tokens < ${min_tokens}

-- target=func.execute_streaming_inserts()
