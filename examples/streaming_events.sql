-- backend: spark
-- config: easy_sql.etl_type=streaming

-- Streaming ETL in the step language (the reference's Flink
-- statement-set semantics on Structured Streaming): transforms build
-- incremental plans over the `events_stream` source view; `output.`
-- steps enqueue sinks; `execute_streaming_inserts()` commits them all.

-- target=variables
select 10.0 as min_value

-- target=temp.big_events
select event_id, user_id, event_type, value, ts
from events_stream
where value > ${min_value}

-- target=temp.purchases
select event_id, user_id, value, ts
from big_events
where event_type = 'purchase'

-- target=output.sink.purchases
select * from purchases

-- target=func.execute_streaming_inserts()
