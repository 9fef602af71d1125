-- backend: spark
-- config: spark.sql.shuffle.partitions=8

-- Incremental keyed merge (MERGE INTO semantics) in the step language:
-- the stored dimension absorbs a change batch — matched keys take the
-- batch row, unmatched keys pass through, brand-new keys insert. Same
-- union + keep-latest-per-key shape as the engine's write_upsert
-- operator; at warehouse scale the output target becomes an
-- insert-overwrite of only the partitions the batch touches.
--
-- Inputs : `dim_current` (c_custkey, c_nationkey, c_acctbal, version)
--          `changes`     (same schema, the new batch)
-- Output : temp view (dry-run) / table `dim.customer_merged`

-- target=variables
select true as __create_output_table__

-- target=log.batch_size
select count(*) as n_changes from changes

-- Tag priorities: batch rows beat stored rows on the same key; within a
-- side, the larger version wins (late-arriving batches are safe).
-- target=temp.unioned
select c_custkey, c_nationkey, c_acctbal, version, src from (
  select c_custkey, c_nationkey, c_acctbal, version, 1 as src
  from changes
  union all
  select c_custkey, c_nationkey, c_acctbal, version, 0 as src
  from dim_current)

-- One row per key: the merge itself.
-- target=temp.merged
select c_custkey, c_nationkey, c_acctbal, version from (
  select *, row_number() over (
    partition by c_custkey order by src desc, version desc) as rn
  from unioned) where rn = 1

-- A merge must never produce duplicate keys…
-- target=check.merged_keys_unique
select
  (select count(*) from merged) =
  (select count(distinct c_custkey) from merged) as actual,
  true as expected

-- …and must never lose a stored key.
-- target=check.no_keys_lost
select
  (select count(distinct c_custkey) from merged) >=
  (select count(distinct c_custkey) from dim_current) as actual,
  true as expected

-- target=log.merged_size
select count(*) as n_rows, max(version) as max_version from merged

-- target=output.dim.customer_merged
select c_custkey, c_nationkey, c_acctbal, version from merged
