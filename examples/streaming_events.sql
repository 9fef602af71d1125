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

-- Stream-stream inner interval join: clicks matched to same-user
-- purchases within 6 hours. Both branches derive from the
-- `events_stream` source view, which the launcher registers WITH a
-- watermark — so Spark bounds the join state to watermark + band and
-- this statement-set commits two independent incremental queries.
-- target=temp.clicks
select event_id as click_id, user_id, ts as click_ts
from events_stream
where event_type = 'click'

-- target=temp.conversions
select c.click_id, p.event_id as purchase_id, c.user_id
from clicks c join events_stream p
  on c.user_id = p.user_id
 and p.event_type = 'purchase'
 and p.ts >= c.click_ts
 and p.ts <= c.click_ts + interval 6 hours

-- target=output.sink.conversions
select * from conversions

-- target=func.execute_streaming_inserts()
