-- backend: spark
-- config: spark.sql.shuffle.partitions=8

-- An end-to-end training-data curation pipeline in the Easy-SQL step
-- language: score -> quality-filter -> repetition gate -> exact-dedup
-- -> near-dup drop -> curated output, with checks and logging along
-- the way.
--
-- Inputs : a `documents` temp view (doc_id, text, lang, source, n_chars)
-- Output : temp view (dry-run) / table `curated.documents`
-- Vars   : min_tokens (default 5), max_top2_frac (default 0.5),
--          sim_band_guard (LSH bands per doc)

-- target=variables
select
  true as __create_output_table__,
  ${min_tokens:5} as min_tokens

-- Per-doc quality features: token count, mean token length, alpha ratio.
-- target=temp.doc_stats
select
  doc_id, text,
  size(split(lower(trim(text)), ' ')) as n_tokens,
  length(regexp_replace(text, '[^a-zA-Z]', '')) / greatest(length(text), 1)
    as alpha_ratio
from documents

-- target=log.corpus_size
select count(*) as n_docs from doc_stats

-- Quality gate: drop too-short and non-textual docs. Cached: both the
-- repetition gate and the survivor join read it — a plain temp view
-- would recompute the regex scan per consumer.
-- target=cache.quality
select doc_id, text, n_tokens from doc_stats
where n_tokens >= ${min_tokens} and alpha_ratio > 0.5

-- Repetition gate (Gopher-style): drop docs dominated by a single
-- repeated 2-gram (boilerplate, generation loops). The shuffle carries
-- one count per (doc, distinct 2-gram), never text.
-- target=temp.repetition
select doc_id, max(c) / sum(c) as top2_frac from (
  select doc_id, g, count(*) as c from quality
  lateral view explode(
    ngram_shingles(split(lower(trim(text)), ' '), 2)) t as g
  group by doc_id, g)
group by doc_id

-- target=temp.unrepetitive
select q.doc_id, q.text, q.n_tokens
from quality q join repetition r on q.doc_id = r.doc_id
where r.top2_frac <= ${max_top2_frac:0.5}

-- Exact dedup: keep the smallest doc_id per normalized-content hash.
-- Cached: consumed by the LSH banding AND the final anti-join.
-- target=cache.exact_kept
select doc_id, text, n_tokens from (
  select *, row_number() over (
    partition by md5(lower(trim(text)))
    order by doc_id) as rn
  from unrepetitive) where rn = 1

-- Near-dup candidates via the native one-pass LSH band expression:
-- 3-gram shingles (ngram_shingles) -> 4 salted-md5 minhash signatures
-- folded into 2 (band_id, band_hash) pairs (minhash_bands) — the
-- signatures never materialize, and the whole derivation is one
-- codegen'd call per doc.
-- target=temp.bands
select doc_id, b.band_id, b.band_hash
from exact_kept
lateral view explode(minhash_bands(
  ngram_shingles(split(lower(trim(text)), ' '), 3), 4, 2)) t as b

-- target=temp.near_dup_losers
select distinct b.doc_id from bands a join bands b
  on a.band_id = b.band_id and a.band_hash = b.band_hash
 and a.doc_id < b.doc_id

-- Cached: the size check, the log and the output all read it — without
-- the cache each one replays the whole near-dup join.
-- target=cache.curated
select k.doc_id, k.text, k.n_tokens
from exact_kept k
left anti join near_dup_losers l on k.doc_id = l.doc_id

-- The pipeline must never grow the corpus.
-- target=check.curated_not_larger
select
  (select count(*) from curated) <= (select count(*) from documents)
    as actual,
  true as expected

-- target=log.curated_size
select count(*) as n_docs, avg(n_tokens) as mean_tokens from curated

-- target=output.curated.documents
select doc_id, text, n_tokens from curated

-- Release the cached stages: this ETL runs inside long-lived sessions
-- (tests, notebooks), so it cleans up after itself.
-- target=func.unpersist(quality)
-- target=func.unpersist(exact_kept)
-- target=func.unpersist(curated)
