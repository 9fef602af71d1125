package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Text-analysis operators over `documents` — the per-document half of a
  * training-data pipeline (quality filtering, language ID, token budgeting,
  * fingerprinting). All are narrow per-row transforms (no shuffle): at
  * 100 TB they scale linearly with input splits and stay inside a single
  * stage; only the downstream consumers (grouping, joins) shuffle.
  *
  * Every expression uses integer/exact arithmetic (counts, ratios of exact
  * ints via one IEEE division) so the DuckDB oracle hash-matches.
  */
object TextOps {

  private val stopwords = Seq("the", "data", "table", "value", "row", "key")
  private val stopList  = stopwords.map(w => s"'$w'").mkString(", ")

  /** Iterative-BPE knobs: 4 merge rounds × up to 16 merges each = a
    * ≤64-merge vocabulary, same budget as the old single-round gate. */
  private[graft] val BPE_ROUNDS = 4
  private[graft] val BPE_K_PER_ROUND = 16
  /** Acceptance window: only the top-CAND_CAP pairs by (count desc,
    * key asc) enter the acceptance check. Self-contained by
    * construction — a pair's blockers always outrank it, so every
    * blocker of a windowed pair is itself in the window — and it
    * bounds the chaining self-join at vocab-independent O(CAP²)
    * regardless of how many distinct pairs the corpus produces. Both
    * engines apply the same window, so it is part of the operator's
    * definition, not an approximation. */
  private[graft] val BPE_CAND_CAP = 512
  /** Pair-key separator between the two tokens of a merge candidate —
    * a control char that cannot occur in text, so multi-char token
    * boundaries stay unambiguous ("ab"+"c" vs "a"+"bc"). */
  private val BPE_SEP = "\u0001"

  /** Iterative BPE train+apply, exact and order-free in both engines.
    *
    * Each round over the CURRENT segmentation (round 0 = characters):
    *
    *  TRAIN: count adjacent token pairs (counts-only shuffle; pairs
    *  containing a space never merge), then accept a pair iff it
    *  outranks (count desc, key asc) EVERY pair it chains with (shares
    *  a boundary token — could overlap in text); self-chaining (x,x)
    *  pairs are excluded. Any two accepted merges therefore never
    *  overlap, and a pair cannot occur at adjacent positions, so
    *  occurrences of the whole batch are DISJOINT: greedy left-to-right
    *  application and simultaneous application coincide — what makes
    *  APPLY exact without sequential driver state. Top-`kPer` accepted
    *  pairs form the round's merge batch.
    *
    *  APPLY: with hits h(i) = pair(t_i, t_{i+1}) ∈ batch, the new
    *  token list keeps index i unless h(i-1) (consumed by the previous
    *  merge) and emits t_i·t_{i+1} where h(i) — pure array transforms
    *  over an index sequence, identical in Spark and DuckDB; the batch
    *  rides along as a collected ≤kPer-element array (broadcast 1-row
    *  cross join), never a driver literal.
    *
    * Scale shape: per round, the corpus-size work is ONE counts-only
    * (pair, count) aggregation and one narrow per-doc re-segmentation;
    * the acceptance self-join runs on the tiny distinct-pair count
    * frame (vocab²-bounded), and the batch is bounded metadata. Token
    * lists never shuffle. Monotonicity: every merge strictly decreases
    * a doc's token count, so n_tok_r is non-increasing in r
    * (BpeIterativeSpec asserts it per doc and strictly per round at
    * corpus level). */
  /** Trained merge batches, memoized per (dir, rounds, kPer): the
    * vocabulary is the persisted artifact of BPE training (like the
    * LSH band index or PQ codebook — in production a stored table),
    * so re-invocations are apply-only. Values are plain strings
    * (bounded: rounds × kPer pair keys), no session reference.
    *
    * Per round: segment with the batches so far (native BpePairs, one
    * JVM pass per doc), count adjacent pairs (counts-only shuffle),
    * keep the top-[[BPE_CAND_CAP]] window, accept the non-chaining
    * pairs (CAP²-bounded self-join), collect the top-kPer batch
    * (bounded driver metadata — the same protocol as the PQ
    * codebook). */
  private val bpeVocabCache = scala.collection.concurrent
    .TrieMap[(String, Int, Int, Int, Long), Seq[Seq[String]]]()

  /** Cheap content stamp of the corpus the vocabulary was trained on
    * (size ⊕ mtime of documents.parquet): fixtures are normally
    * immutable, but a fixture REGENERATED in the same JVM (e.g.
    * testdata_sf1 rebuilt by ScaleGen) must retrain rather than
    * silently reuse batches trained on the old bytes while the oracle
    * retrains on the new ones. */
  private def corpusStamp(d: String): Long =
    try {
      // Hadoop FS, not java.nio: the sfDir is env-controlled and may be
      // any configured scheme, same contract as every table-root path
      val p = new org.apache.hadoop.fs.Path(s"$d/documents.parquet")
      val st = p.getFileSystem(
        org.apache.spark.sql.SparkSession.active
          .sparkContext.hadoopConfiguration).getFileStatus(p)
      st.getLen ^ st.getModificationTime
    } catch { case _: Exception => 0L }

  /** `cap` (the acceptance window; [[BPE_CAND_CAP]] in production) is
    * parameterized ONLY so BpeIterativeSpec can prove the accepted
    * batches invariant under a doubled window: the window is
    * self-contained (every blocker of a windowed pair outranks it in
    * the same (count desc, key asc) order, so no blocker is ever
    * clipped), hence widening the window can only append
    * strictly-lower-ranked accepted pairs BELOW the kPer cut — it can
    * never flip an acceptance inside it. */
  private[graft] def bpeTrain(s: SparkSession, d: String, rounds: Int,
      kPer: Int, cap: Int = BPE_CAND_CAP): Seq[Seq[String]] =
    bpeVocabCache.getOrElseUpdate((d, rounds, kPer, cap, corpusStamp(d)), {
      val docs = Tables.documents(s, d)
        .select(lower(trim(col("text"))).as("norm"))
      var batches = Vector.empty[Seq[String]]
      for (_ <- 1 to rounds) {
        val cand = docs
          .select(explode(graft.functions.BpeOps
            .bpe_pairs(col("norm"), batches)).as("p"))
          .filter(!col("p").contains(" "))
          .groupBy("p").agg(count(lit(1)).as("c"))
          .withColumn("l", substring_index(col("p"), BPE_SEP, 1))
          .withColumn("r", substring_index(col("p"), BPE_SEP, -1))
          .filter(col("l") =!= col("r"))
          .orderBy(col("c").desc, col("p").asc).limit(cap)
        val rivals = cand.select(col("p").as("qp"), col("l").as("ql"),
          col("r").as("qr"), col("c").as("qc"))
        val accepted = cand.join(rivals,
          col("qp") =!= col("p") &&
            (col("ql") === col("r") || col("qr") === col("l")) &&
            (col("qc") > col("c") ||
             (col("qc") === col("c") && col("qp") < col("p"))),
          "left_anti")
        val batch = accepted.orderBy(col("c").desc, col("p").asc)
          .limit(kPer).select("p")
          .collect().map(_.getString(0)).toSeq.sorted
        batches :+= batch
      }
      batches
    })

  private[graft] def bpeTokens(s: SparkSession, d: String, rounds: Int,
      kPer: Int): DataFrame = {
    val batches = bpeTrain(s, d, rounds, kPer)
    Tables.documentsSpread(s, d)
      .select(col("doc_id"), lower(trim(col("text"))).as("norm"))
      .withColumn("rc", graft.functions.BpeOps
        .bpe_round_counts(col("norm"), batches))
      .select(
        Seq(col("doc_id"),
          size(split(col("norm"), " ")).cast("int").as("n_words"),
          length(regexp_replace(col("norm"), " ", "")).cast("int")
            .as("n_chars_ns")) ++
        (0 to rounds).map(r =>
          element_at(col("rc"), r + 1).as(s"n_tok_r$r")) :+
        element_at(col("rc"), rounds + 1).as("n_bpe_tokens"): _*)
  }

  /** Higher-order-function reference implementation of [[bpeTokens]]:
    * the literal hit-mask formulation the DuckDB oracle mirrors,
    * kept for BpeIterativeSpec's native-vs-reference equivalence
    * proof (same standard as the CharNgrams/Md5Min elementwise
    * specs). ~35× slower than the native path at sf0.1 — test-only. */
  private[graft] def bpeTokensHof(s: SparkSession, d: String,
      rounds: Int, kPer: Int): DataFrame = {
    val nonSpace = "cast(size(filter(toks, t -> t != ' ')) as int)"
    var cur = Tables.documents(s, d)
      .select(col("doc_id"), lower(trim(col("text"))).as("norm"))
      .withColumn("toks", expr(
        "case when length(norm) = 0 then array() " +
        "else transform(sequence(1, length(norm)), " +
        "i -> substring(norm, i, 1)) end"))
      .withColumn("n_tok_r0", expr(nonSpace))
    for (r <- 1 to rounds) {
      val pairsExpr =
        "case when size(toks) < 2 then array() " +
        "else transform(sequence(1, size(toks) - 1), " +
        s"i -> concat(element_at(toks, i), '$BPE_SEP', " +
        "element_at(toks, i + 1))) end"
      val cand = cur.select(explode(expr(pairsExpr)).as("p"))
        .filter(!col("p").contains(" "))
        .groupBy("p").agg(count(lit(1)).as("c"))
        .withColumn("l", substring_index(col("p"), BPE_SEP, 1))
        .withColumn("r", substring_index(col("p"), BPE_SEP, -1))
        .filter(col("l") =!= col("r"))
        .orderBy(col("c").desc, col("p").asc).limit(BPE_CAND_CAP)
      val rivals = cand.select(col("p").as("qp"), col("l").as("ql"),
        col("r").as("qr"), col("c").as("qc"))
      val accepted = cand.join(rivals,
        col("qp") =!= col("p") &&
          (col("ql") === col("r") || col("qr") === col("l")) &&
          (col("qc") > col("c") ||
           (col("qc") === col("c") && col("qp") < col("p"))),
        "left_anti")
      val batch = accepted.orderBy(col("c").desc, col("p").asc)
        .limit(kPer)
        .agg(sort_array(collect_list(col("p"))).as("batch"))
      cur = cur.crossJoin(broadcast(batch))
        .withColumn("hits", expr(
          "case when size(toks) < 2 then array() " +
          "else transform(sequence(1, size(toks) - 1), " +
          s"i -> array_contains(batch, concat(element_at(toks, i), " +
          s"'$BPE_SEP', element_at(toks, i + 1)))) end"))
        // hp pads hits with a false on each side so every index the
        // apply touches is in-range (no ANSI element_at OOB)
        .withColumn("hp", expr("concat(array(false), hits, array(false))"))
        .withColumn("toks", expr(
          "case when size(toks) < 2 then toks else transform(" +
          "filter(sequence(1, size(toks)), i -> NOT element_at(hp, i)), " +
          "i -> if(element_at(hp, i + 1), " +
          "concat(element_at(toks, i), element_at(toks, i + 1)), " +
          "element_at(toks, i))) end"))
        .withColumn(s"n_tok_r$r", expr(nonSpace))
        .drop("batch", "hits", "hp")
    }
    cur.select(
      Seq(col("doc_id"),
        size(split(col("norm"), " ")).cast("int").as("n_words"),
        length(regexp_replace(col("norm"), " ", "")).cast("int")
          .as("n_chars_ns")) ++
      (0 to rounds).map(r => col(s"n_tok_r$r")) :+
      col(s"n_tok_r$rounds").as("n_bpe_tokens"): _*)
  }

  /** DuckDB mirror of [[bpeTokens]]: the rounds unroll as chained CTEs
    * (seg_0 → seg_R), each carrying the per-round counts forward so
    * every CTE is referenced exactly once (no repeated-inline blowup).
    */
  private[graft] def bpeOracleSql(rounds: Int, kPer: Int): String = {
    val sep = "chr(1)"
    val sb = new StringBuilder
    sb.append(
      """WITH seg_0 AS (
        |  SELECT doc_id, lower(trim(text)) AS norm,
        |    CASE WHEN length(lower(trim(text))) = 0
        |         THEN cast([] AS varchar[])
        |         ELSE list_transform(range(1, length(lower(trim(text))) + 1),
        |              i -> substr(lower(trim(text)), i, 1)) END AS toks,
        |    cast(CASE WHEN length(lower(trim(text))) = 0 THEN 0
        |         ELSE len(list_filter(
        |           list_transform(range(1, length(lower(trim(text))) + 1),
        |             i -> substr(lower(trim(text)), i, 1)),
        |           t -> t != ' ')) END AS int) AS n_tok_r0
        |  FROM documents)""".stripMargin)
    for (r <- 1 to rounds) {
      val prev = s"seg_${r - 1}"
      val carried = (0 until r).map(i => s"n_tok_r$i").mkString(", ")
      sb.append(
        s""",
        |cnt_$r AS (
        |  SELECT p, count(*) AS c,
        |    split_part(p, $sep, 1) AS l, split_part(p, $sep, 2) AS r
        |  FROM (
        |    SELECT unnest(CASE WHEN len(toks) < 2 THEN cast([] AS varchar[])
        |      ELSE list_transform(range(1, len(toks)),
        |           i -> toks[i] || $sep || toks[i + 1]) END) AS p
        |    FROM $prev)
        |  WHERE strpos(p, ' ') = 0
        |  GROUP BY p),
        |cand_$r AS (SELECT * FROM cnt_$r WHERE l != r
        |            ORDER BY c DESC, p ASC LIMIT ${BPE_CAND_CAP}),
        |acc_$r AS (
        |  SELECT a.p, a.c FROM cand_$r a
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM cand_$r b
        |    WHERE b.p != a.p AND (b.l = a.r OR b.r = a.l)
        |      AND (b.c > a.c OR (b.c = a.c AND b.p < a.p)))),
        |batch_$r AS (
        |  SELECT coalesce(list_sort(list(p)), cast([] AS varchar[]))
        |    AS batch
        |  FROM (SELECT p FROM acc_$r ORDER BY c DESC, p ASC
        |        LIMIT $kPer)),
        |seg_$r AS (
        |  SELECT doc_id, norm, $carried,
        |    CASE WHEN len(toks) < 2 THEN toks ELSE
        |      list_transform(
        |        list_filter(range(1, len(toks) + 1), i -> NOT hp[i]),
        |        i -> CASE WHEN hp[i + 1] THEN toks[i] || toks[i + 1]
        |                  ELSE toks[i] END) END AS toks,
        |    cast(len(list_filter(
        |      CASE WHEN len(toks) < 2 THEN toks ELSE
        |        list_transform(
        |          list_filter(range(1, len(toks) + 1), i -> NOT hp[i]),
        |          i -> CASE WHEN hp[i + 1] THEN toks[i] || toks[i + 1]
        |                    ELSE toks[i] END) END,
        |      t -> t != ' ')) AS int) AS n_tok_r$r
        |  FROM (
        |    SELECT doc_id, norm, $carried, toks,
        |      cast([false] AS boolean[]) ||
        |      (CASE WHEN len(toks) < 2 THEN cast([] AS boolean[])
        |        ELSE list_transform(range(1, len(toks)),
        |             i -> list_contains(batch,
        |                  toks[i] || $sep || toks[i + 1])) END)
        |      || cast([false] AS boolean[]) AS hp
        |    FROM $prev, batch_$r))""".stripMargin)
    }
    val tokCols = (0 to rounds).map(r => s"n_tok_r$r").mkString(", ")
    sb.append(
      s"""
      |SELECT doc_id,
      |  cast(len(string_split(norm, ' ')) AS int) AS n_words,
      |  cast(length(regexp_replace(norm, ' ', '', 'g')) AS int)
      |    AS n_chars_ns,
      |  $tokCols,
      |  n_tok_r$rounds AS n_bpe_tokens
      |FROM seg_$rounds""".stripMargin)
    sb.toString
  }

  /** Gopher-style per-document signal counts — the shared integer feature
    * frame under both `text_gopher_filter` (rule thresholds) and
    * `text_quality_classifier` (learned weights). Pure narrow codegen'd
    * transforms over the scan: zero shuffle at any corpus size. */
  private def gopherSignals(s: SparkSession, d: String): DataFrame =
    gopherSignalsFrom(Tables.documentsSpread(s, d))

  /** [[gopherSignals]] over an arbitrary documents frame — batch scan or
    * streaming micro-batch source alike (every transform is stateless,
    * so the same column tree serves both runtimes). */
  private def gopherSignalsFrom(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", split(trim(col("text")), " "))
      .withColumn("n_words", size(col("toks")))
      .withColumn("total_len",
        expr("aggregate(transform(toks, t -> length(t)), 0, " +
             "(a, x) -> a + x)"))
      .withColumn("alpha_cnt",
        expr("size(filter(toks, t -> t rlike '[a-z]'))"))
      .withColumn("digit_word_cnt",
        expr("size(filter(toks, t -> t rlike '^[0-9]+$'))"))
      .withColumn("stop_hits",
        expr(s"size(filter(array_distinct(toks), t -> t IN ($stopList)))"))
      // '#' chars + '…'-spelled-as-'...' runs, the two Gopher symbol
      // classes; counts derive from length deltas (no regex scan)
      .withColumn("sym_cnt",
        (length(col("text")) -
           length(translate(col("text"), "#", "")) +
         ((length(col("text")) -
           length(expr("replace(text, '...', '')"))) / lit(3)))
          .cast("int"))

  /** Trained quality classifier — the model-based filtering step real
    * curation pipelines run after rule filters (the fastText-style
    * quality scorer of the GPT-3 / LLaMA data recipes): a logistic
    * model over the Gopher signal ratios, trained against the rule
    * conjunction as weak labels, then scored over every document. The
    * learned decision is a smooth re-weighting of the same evidence —
    * unlike the rule filter it ranks borderline documents instead of
    * hard-dropping them.
    *
    * Exactness discipline (what makes a TRAINED model hash-verifiable
    * cross-engine — the oracle retrains from scratch in SQL, it does
    * not get the weights handed to it):
    *  - the squashing function is the algebraic fast sigmoid
    *    p = 0.5 + z/(2(1+|z|)) — add/mul/div/abs are exactly-rounded
    *    IEEE ops, unlike exp(), whose last-ulp behavior differs
    *    between engines;
    *  - per-document gradient contributions are floor-quantized onto a
    *    2^24 fixed-point grid and summed as int64 — the reduction is
    *    exact and ORDER-INDEPENDENT, so partition count, AQE, and
    *    reduce order cannot change the trained weights (the same
    *    discipline as the k-means integer grid and the temperature-mix
    *    ordered fold);
    *  - the learning rate is a power of two, so the weight update
    *    multiplies exactly; every expression tree (dot product left-
    *    associated, update parenthesization) is written identically in
    *    both engines, and identical exactly-rounded ops on identical
    *    inputs give identical bits.
    *
    * Scale shape: each round is ONE narrow projection over the corpus
    * plus a 7-long + count reduce (map-side combined, bytes of shuffle);
    * weights are driver-held bounded metadata, broadcast back inside
    * literals. Scoring is a zero-shuffle projection. At 100 TB the cost
    * is `rounds` linear scans. Capacity: a per-document quantized
    * gradient unit is ≤ ~2^32 (|resid·x| ≤ CLF_NEG_W · x1max ≈ 2^8 on
    * ≤2000-word documents, times the 2^24 grid), so int64 sums stay
    * overflow-free past 2^30 ≈ 10^9 documents; each halving of CLF_Q
    * doubles that, still far above any float-sum's exactness. */
  private[graft] val CLF_ROUNDS = 12
  private[graft] val CLF_Q = 16777216.0 // 2^24 — exact fixed-point grid
  private[graft] val CLF_LR = 0.5       // power of two: exact multiply
  /** Minority-class (drop, y=0) loss weight — a power of two, so the
    * residual reweighting multiplies exactly. Without it the ~9:1
    * keep-skewed corpus collapses the model onto the majority class. */
  private[graft] val CLF_NEG_W = 8.0
  private val CLF_DIM = 7               // bias + 6 signal features

  /** Feature frame: doc_id, weak label y (gopher keep), x1..x6 ratio
    * features. Every feature is ints combined by ONE exactly-rounded
    * IEEE division (denominators ≥ 1 by construction), then shifted by
    * a DYADIC constant near its rule threshold (exactly representable,
    * so the shift is bit-exact too) — signed evidence converges in few
    * sweeps where raw all-positive ratios drift to the majority class. */
  private[graft] def clfFeatures(s: SparkSession, d: String): DataFrame =
    clfFeaturesFrom(Tables.documents(s, d))

  /** The feature frame over an arbitrary documents frame — stateless
    * column tree, so it also types a streaming micro-batch source
    * (see [[streamingScore]]). */
  private def clfFeaturesFrom(docs: DataFrame): DataFrame =
    gopherSignalsFrom(docs)
      .withColumn("y",
        (col("n_words") >= 20 && col("n_words") <= 2000 &&
         lit(3) * col("n_words") <= col("total_len") &&
         col("total_len") <= lit(10) * col("n_words") &&
         col("alpha_cnt") * 5 >= col("n_words") * 4 &&
         col("digit_word_cnt") * 10 <= col("n_words") &&
         col("sym_cnt") * 10 < col("n_words") &&
         col("stop_hits") >= 2).cast("int"))
      .withColumn("x1",
        col("n_words").cast("double") / lit(64.0) - lit(0.3125))
      .withColumn("x2",
        col("total_len").cast("double") / (lit(8.0) * col("n_words"))
          - lit(0.375))
      .withColumn("x3",
        col("alpha_cnt").cast("double") / col("n_words") - lit(0.8125))
      .withColumn("x4",
        lit(0.125) - col("digit_word_cnt").cast("double") / col("n_words"))
      .withColumn("x5",
        least(col("stop_hits"), lit(8)).cast("double") / lit(8.0)
          - lit(0.25))
      .withColumn("x6",
        lit(0.125) - col("sym_cnt").cast("double") / col("n_words"))
      .select("doc_id", "y", "x1", "x2", "x3", "x4", "x5", "x6")

  /** Left-associated dot product — the shared scoring tree. */
  private def clfScore(w: Array[Double]): org.apache.spark.sql.Column =
    (1 until CLF_DIM).foldLeft(lit(w(0)): org.apache.spark.sql.Column)(
      (acc, j) => acc + lit(w(j)) * col(s"x$j"))

  /** `rounds` full-batch gradient sweeps from w = 0. Each sweep is one
    * aggregation job over `feats`; the driver holds only the CLF_DIM
    * int64 gradient sums. */
  private[graft] def clfTrain(feats: DataFrame, rounds: Int = CLF_ROUNDS)
      : Array[Double] = {
    var w = Array.fill(CLF_DIM)(0.0)
    var r = 0
    while (r < rounds) {
      val z = clfScore(w)
      val p = lit(0.5) + z / (lit(2.0) * (lit(1.0) + abs(z)))
      val resid = (p - col("y").cast("double")) *
        when(col("y") === 0, lit(CLF_NEG_W)).otherwise(lit(1.0))
      val aggs = (0 until CLF_DIM).map { j =>
        val xj = if (j == 0) lit(1.0) else col(s"x$j")
        sum(floor(resid * xj * lit(CLF_Q))).as(s"g$j")
      } :+ count(lit(1)).as("n")
      val row = feats.agg(aggs.head, aggs.tail: _*).collect()(0)
      val n = row.getLong(CLF_DIM).toDouble
      w = Array.tabulate(CLF_DIM)(j =>
        w(j) - CLF_LR * ((row.getLong(j).toDouble / CLF_Q) / n))
      r += 1
    }
    w
  }

  /** Trained weights per (dir, rounds) — the classifier's analog of
    * [[bpeVocabCache]]: training is 12 aggregation sweeps whose input —
    * the tokenize/HOF feature projection — costs far more than the
    * 7-long reduce itself, so (a) the feature frame is persisted for
    * the sweeps (materialize-features-once, the same discipline a
    * 100 TB pipeline applies by writing the feature table before
    * training) and (b) the resulting 7 doubles are memoized so the
    * batch gate and the streaming serve path train ONCE per fixture.
    * Same immutable-fixture assumption as bpeVocabCache; weights are
    * deterministic (order-independent fixed-point reduction), so which
    * caller trains first cannot change them. */
  private val clfWeightsCache =
    scala.collection.concurrent.TrieMap[(String, Int), Array[Double]]()

  private[graft] def trainedWeights(s: SparkSession, d: String,
      rounds: Int = CLF_ROUNDS): Array[Double] =
    clfWeightsCache.getOrElseUpdate((d, rounds), {
      val feats = clfFeatures(s, d)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try clfTrain(feats, rounds) finally feats.unpersist()
    })

  /** The gate: train on the corpus, score every document. */
  private[graft] def qualityClassifier(s: SparkSession, d: String)
      : DataFrame = {
    val w = trainedWeights(s, d)
    clfFeatures(s, d)
      .withColumn("score", clfScore(w))
      .withColumn("pred", col("score") > lit(0.0))
      .select("doc_id", "y", "score", "pred")
  }

  /** Train-offline / score-online — gate `streaming_ingest_score`: the
    * classifier trains on the static corpus BEFORE the stream starts
    * (12 batch sweeps, weights are driver-held bounded metadata), then
    * serves as a stateless streaming projection over arriving document
    * micro-batches — the weights ride into every batch as literals in
    * the column tree, exactly how a scoring model deploys against a
    * live feed. The sink is the plain streaming file sink (its commit
    * log is what makes an append sink exactly-once), drained under
    * `Trigger.AvailableNow` with a durable checkpoint, so a
    * re-invocation exercises offset-log recovery. Scoring each doc
    * depends only on the doc and the frozen weights, so the drained
    * sink equals the batch gate's frame — the SAME retrain-from-scratch
    * DuckDB oracle verifies both.
    *
    * At 100 TB/day of arrivals: per-batch cost is one narrow codegen'd
    * projection — no state stores, no shuffle, nothing corpus-sized in
    * the stream. */
  private[graft] def streamingScore(s: SparkSession, d: String)
      : DataFrame = {
    import graft.streaming.DocIngest
    val w = trainedWeights(s, d)
    val (sink, ckpt) = DocIngest.sinkCkpt(d, "ingest_score")
    val q = clfFeaturesFrom(DocIngest.source(s, d))
      .withColumn("score", clfScore(w))
      .withColumn("pred", col("score") > lit(0.0))
      .select("doc_id", "y", "score", "pred")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt.toString)
      .format("parquet").option("path", sink.toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .queryName("g_ingest_score").start()
    DocIngest.await(q)
    s.read.parquet(sink.toString)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Token counting: whitespace tokens, distinct tokens, total/avg token
    // length, and a BPE-ish subword estimate (ceil(len/4) per token).
    "text_token_stats" -> ((s, d) =>
      Tables.documentsSpread(s, d)
        .withColumn("toks", split(trim(col("text")), " "))
        .select(
          col("doc_id"),
          size(col("toks")).as("n_tokens"),
          size(array_distinct(col("toks"))).as("n_uniq"),
          expr("aggregate(transform(toks, t -> length(t)), 0, " +
               "(a, x) -> a + x)").as("total_len"),
          expr("aggregate(transform(toks, t -> " +
               "cast(ceil(length(t) / 4.0) as int)), 0, (a, x) -> a + x)")
            .as("n_bpe_est"))
        .withColumn("avg_token_len",
          col("total_len").cast("double") / col("n_tokens"))),

    // Context packing: GPT-style concat-and-chunk. Documents are laid
    // end-to-end in doc_id order and cut every 256 tokens; the output is
    // the (chunk, doc) assignment with each doc's token offset and its
    // token count inside the chunk — what a training loader materializes
    // as fixed-length sequences. The global token offset is a
    // DISTRIBUTED two-stage prefix sum, not one global window: per-block
    // totals (one narrow counts shuffle), an exclusive prefix over the
    // tiny block-totals frame (corpus/B rows — the only single-partition
    // step, and it is O(n/B)), broadcast back, then an intra-block
    // window partitioned by block. At 100 TB no stage sees more than a
    // block of rows in one partition and nothing wide ever shuffles.
    "text_pack_chunks" -> ((s, d) => packChunks(s, d)),

    // Quality scoring: length band + stopword density + digit penalty.
    "text_quality" -> ((s, d) =>
      Tables.documentsSpread(s, d)
        .withColumn("toks", split(trim(col("text")), " "))
        .withColumn("n_tokens", size(col("toks")))
        .withColumn("stop_cnt",
          expr(s"size(filter(toks, t -> t IN ($stopList)))"))
        .withColumn("digit_cnt",
          length(col("text")) -
            length(regexp_replace(col("text"), "[0-9]", "")))
        .withColumn("stop_ratio",
          col("stop_cnt").cast("double") / col("n_tokens"))
        // integer quality points (50/30/20) — no FP literal arithmetic, so
        // the oracle matches bit-for-bit
        .withColumn("score_pts",
          (when(col("n_tokens") >= 20 && col("n_tokens") <= 2000, 50)
            .otherwise(0) +
           when(col("stop_ratio") > 0.02, 30).otherwise(0) +
           when(col("digit_cnt") === 0, 20).otherwise(0)).cast("int"))
        .select("doc_id", "n_tokens", "stop_cnt", "digit_cnt",
                "stop_ratio", "score_pts")),

    // Gopher-style rule filter (the shape of Rae et al. 2021,
    // arXiv:2112.11446 Table A1, thresholds adapted to this corpus'
    // ~30-token docs): each rule is an independent boolean column plus
    // the final keep decision — what a production pipeline materializes
    // so it can audit WHY a document was dropped, not just that it was.
    // Every ratio test is integer cross-multiplied (alpha_ok is
    // alpha_cnt*5 >= n_words*4, never a 0.8 double compare) so the gate
    // is hash-exact cross-engine. Pure narrow codegen'd transforms over
    // the scan — zero shuffle, scales as a projection at any corpus size.
    "text_gopher_filter" -> ((s, d) =>
      gopherSignals(s, d)
        .withColumn("words_ok",
          col("n_words") >= 20 && col("n_words") <= 2000)
        .withColumn("wlen_ok",
          lit(3) * col("n_words") <= col("total_len") &&
            col("total_len") <= lit(10) * col("n_words"))
        .withColumn("alpha_ok",
          col("alpha_cnt") * 5 >= col("n_words") * 4)
        .withColumn("digit_ok",
          col("digit_word_cnt") * 10 <= col("n_words"))
        .withColumn("sym_ok", col("sym_cnt") * 10 < col("n_words"))
        .withColumn("stop_ok", col("stop_hits") >= 2)
        .withColumn("keep",
          col("words_ok") && col("wlen_ok") && col("alpha_ok") &&
            col("digit_ok") && col("sym_ok") && col("stop_ok"))
        .select("doc_id", "n_words", "sym_cnt", "stop_hits", "words_ok",
                "wlen_ok", "alpha_ok", "digit_ok", "sym_ok", "stop_ok",
                "keep")),

    // Model-based quality filter: logistic model over the Gopher signal
    // ratios, trained in 12 exact fixed-point gradient sweeps against
    // the rule conjunction as weak labels, then scored corpus-wide. The
    // DuckDB oracle RETRAINS the model from scratch (unrolled rounds) —
    // the training math itself is what's verified. See
    // [[qualityClassifier]] for the cross-engine exactness discipline.
    "text_quality_classifier" -> ((s, d) => qualityClassifier(s, d)),

    // The serving twin: same trained model, scored over arriving
    // document micro-batches in the streaming runtime. Same oracle —
    // scoring is stateless, so batching cannot change the frame.
    "streaming_ingest_score" -> ((s, d) => streamingScore(s, d)),

    // Language ID: n-gram/stopword-marker heuristic. CJK codepoints force
    // zh; otherwise the language with the most marker hits wins (ties in
    // a fixed en > de > fr > es order).
    "text_lang_id" -> ((s, d) => {
      def hits(ws: Seq[String]) = {
        val l = ws.map(w => s"'$w'").mkString(", ")
        expr(s"size(filter(toks, t -> t IN ($l)))")
      }
      Tables.documentsSpread(s, d)
        .withColumn("toks", split(trim(col("text")), " "))
        .withColumn("c_en", hits(Seq("the", "and", "of", "is")))
        .withColumn("c_de", hits(Seq("der", "und", "die", "ist")))
        .withColumn("c_fr", hits(Seq("le", "la", "et", "est")))
        .withColumn("c_es", hits(Seq("el", "los", "y", "es")))
        .withColumn("has_cjk",
          length(regexp_replace(col("text"), "[\\u4e00-\\u9fff]", "")) <
            length(col("text")))
        .withColumn("pred_lang",
          when(col("has_cjk"), "zh")
            .when(col("c_en") >= greatest(col("c_de"), col("c_fr"),
                    col("c_es")) && col("c_en") > 0, "en")
            .when(col("c_de") >= greatest(col("c_fr"), col("c_es")) &&
                    col("c_de") > 0, "de")
            .when(col("c_fr") >= col("c_es") && col("c_fr") > 0, "fr")
            .when(col("c_es") > 0, "es")
            .otherwise("unknown"))
        .select(col("doc_id"), col("pred_lang"), col("lang"),
                (col("pred_lang") === col("lang")).as("is_match"))
    }),

    // TF-IDF top-3 terms per document. The idf factor is the RATIONAL
    // form (N+1)/(df+1) rather than its log: rank-equivalent (ln is
    // monotone) and bit-deterministic across engines, where ln() is not
    // guaranteed correctly-rounded in either.
    "text_tfidf_top_terms" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(split(lower(trim(col("text"))), " ")).as("tok"))
      val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      // tf already holds one row per (doc, term), so document frequency
      // derives from it — no second explode pass, no distinct shuffle;
      // the tok-keyed shuffle sees pre-aggregated rows only
      val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      val n = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
      // df is O(|vocab|): on a web-scale corpus the vocabulary (hundreds
      // of millions of noisy tokens) does NOT fit a broadcast, so the
      // df side joins as a tok-keyed shuffle hash join — df's groupBy
      // already partitioned it by tok, so only tf pays a new exchange.
      // The 1-row corpus count stays broadcast.
      val scored = tf.join(df, Seq("tok"))
        .crossJoin(broadcast(n))
        .withColumn("tfidf_score",
          col("tf").cast("double") * (col("n_docs") + 1) / (col("df") + 1))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("tfidf_score").desc, col("tok").asc)
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("doc_id", "tok", "rn", "tfidf_score")
    }),

    // PII scrub — the redaction stage every training corpus passes
    // through: emails and long digit runs replaced by placeholder
    // tokens. Pure narrow regexp_replace (codegen'd, zero shuffle);
    // the digest column lets the oracle verify redaction byte-for-byte
    // without shipping text.
    "text_pii_redact" -> ((s, d) =>
      Tables.documentsSpread(s, d)
        .withColumn("redacted",
          regexp_replace(
            regexp_replace(col("text"),
              "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "<EMAIL>"),
            "[0-9]{3,}", "<NUM>"))
        .select(
          col("doc_id"),
          md5(col("redacted")).as("redacted_md5"),
          (length(col("text")) - length(col("redacted")))
            .as("chars_removed"),
          (col("redacted") =!= col("text")).as("was_redacted"))),

    // Document fingerprinting: full-text hash + min 5-gram shingle hash
    // (a 1-permutation MinHash — the dedup building block). Both stages
    // are the native codegen'd kernels (NgramShingles + Md5Min), not the
    // interpreted transform/sequence/slice/concat_ws composition — same
    // values (the specs prove each elementwise), one WholeStageCodegen
    // pass per document.
    "text_fingerprint" -> ((s, d) =>
      Tables.documentsSpread(s, d)
        .withColumn("toks", split(lower(trim(col("text"))), " "))
        .select(
          col("doc_id"),
          md5(lower(trim(col("text")))).as("fp_full"),
          graft.functions.Md5Min.md5_min(
            graft.functions.NgramShingles.ngram_shingles(col("toks"), 5))
            .as("fp_min5"))),

    // Subword token counts from a corpus-TRAINED merge vocabulary — a
    // real ITERATIVE BPE (Sennrich et al. 2016 shape): BPE_ROUNDS
    // train/apply rounds, each accepting a conflict-free batch of up to
    // BPE_K_PER_ROUND merges over the CURRENT segmentation, so merged
    // tokens from round r become merge candidates in round r+1 ("th" →
    // "the"). See [[bpeTokens]] for the exact/order-free formulation
    // and the scale shape.
    "text_bpe_tokens" -> ((s, d) =>
      bpeTokens(s, d, BPE_ROUNDS, BPE_K_PER_ROUND)),

    // BM25 retrieval scoring (Robertson/Sparck-Jones, k1=1.2 b=0.75) —
    // top-10 docs per query term, the ranking function behind every
    // lexical retrieval stage. Reformulated as ONE exact integer
    // rational per (doc, term) with a single IEEE division, the same
    // determinism standard as tfidf above (idf is the rational
    // (N+1)/(df+1) form — rank-equivalent to the log, bit-stable):
    //
    //   score = 44·tf·L·(N+1) / ((20·tf·L + 6·L + 18·dl·N)·(df+1))
    //
    // which is tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl)) · idf with
    // avgdl = L/N, numerator and denominator cleared by 20·L. Exact
    // while 44·tf·L·(N+1) < 2^63 (≈ corpora of 10^8 docs × 10^9 tokens;
    // beyond that, drop to doubles — ranking only needs monotonicity).
    //
    // Scale shape: dl is a counts-only doc-keyed aggregation; tf is
    // filtered to the query terms BEFORE its shuffle (the candidate set
    // is query-term-bounded, not corpus-bounded); df and the corpus
    // totals are term-count/1-row broadcasts; the final rank windows
    // over ≤ |terms|·N scored rows.
    "text_bm25" -> ((s, d) => {
      val terms = Seq("spark", "merge", "window")
      val toks = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(split(lower(trim(col("text"))), " ")).as("tok"))
      val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      val corpus = dl.agg(sum("dl").as("big_l"),
                          count(lit(1)).as("n_docs"))
      val tf = toks.filter(col("tok").isin(terms: _*))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      val scored = tf.join(broadcast(df), Seq("tok"))
        .join(dl, Seq("doc_id"))
        .crossJoin(broadcast(corpus))
        .withColumn("score",
          (lit(44L) * col("tf") * col("big_l") * (col("n_docs") + 1))
            .cast("double") /
          ((lit(20L) * col("tf") * col("big_l") + lit(6L) * col("big_l") +
            lit(18L) * col("dl") * col("n_docs")) * (col("df") + 1))
            .cast("double"))
      val w = Window.partitionBy("tok")
        .orderBy(col("score").desc, col("doc_id").asc)
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 10)
        .select("tok", "doc_id", "tf", "dl", "score", "rn")
    }),

    // Repetition signals (the Gopher-style quality filters): duplicate
    // token fraction plus the most-frequent 2-gram's share of all
    // 2-grams. Highly repetitive docs (boilerplate, SEO spam, generation
    // loops) light up on top2_frac long before exact dedup catches them.
    // Shape: narrow per-doc token stats + the tf-style explode→group
    // count for the 2-gram mode — the per-key state the shuffle carries
    // is one count per (doc, distinct 2-gram), never positions or text.
    "text_repetition" -> ((s, d) => {
      val base = Tables.documentsSpread(s, d)
        .withColumn("toks", split(lower(trim(col("text"))), " "))
      val stats = base.select(
        col("doc_id"),
        size(col("toks")).as("n_tokens"),
        size(array_distinct(col("toks"))).as("n_uniq"))
      val grams = base
        .select(col("doc_id"),
          explode(graft.functions.NgramShingles
            .ngram_shingles(col("toks"), 2)).as("g"))
        .groupBy("doc_id", "g").agg(count(lit(1)).as("cnt"))
        .groupBy("doc_id").agg(
          max("cnt").as("top2_cnt"),
          sum("cnt").as("n_2grams"))
      stats.join(grams, Seq("doc_id"))
        .select(
          col("doc_id"), col("n_tokens"), col("n_uniq"),
          ((col("n_tokens") - col("n_uniq")).cast("double") /
            col("n_tokens")).as("dup_tok_frac"),
          col("n_2grams"), col("top2_cnt"),
          (col("top2_cnt").cast("double") / col("n_2grams"))
            .as("top2_frac"))
    }),

    // Corpus-trained char-trigram rarity score — the shuffle-cheap
    // analog of the CCNet/KenLM perplexity filter: a doc whose trigrams
    // are rare across the corpus is likely noise (mojibake, hex dumps);
    // one whose trigrams are all corpus-common is boilerplate. Scores
    // are integer trigram-frequency sums (order-independent, so the
    // oracle hash-matches) with ONE final IEEE division.
    // Scale shape: per-(doc,tri) partial counts BEFORE any shuffle
    // (map-side combine shrinks the explode by the per-doc repeat
    // factor), the global frequency table is a tri-keyed partial agg
    // over those rows, and the join back is tri-keyed — the trigram
    // vocabulary is charset-bounded, so at 100 TB both shuffles carry
    // counts, never raw text.
    "text_char_lm_score" -> ((s, d) => {
      // native char_ngrams: the transform/sequence/substring composition
      // is interpreted AND re-walks the string per gram (O(len²)/doc) —
      // CharNgrams builds the code-point offset table once (O(len),
      // codegen'd; CharNgramsSpec proves elementwise identity)
      val tris = Tables.documentsSpread(s, d)
        .select(col("doc_id"),
          explode(graft.functions.CharNgrams.char_ngrams(col("text"), 3))
            .as("tri"))
        .groupBy("doc_id", "tri").agg(count(lit(1)).as("c_dt"))
      // the trained LM table is charset-bounded (377 trigrams on this
      // corpus; ≤ |charset|³ always) — BROADCAST it back instead of
      // re-shuffling the corpus-size tri-count stream on tri. The
      // shared tris subtree is one shuffle, reused by both consumers
      // (ReusedExchange, plan-asserted); at 100 TB the join becomes
      // map-side and the only corpus-size shuffles are the two
      // aggregations.
      val freq = tris.groupBy("tri").agg(sum("c_dt").as("c_t"))
      tris.join(broadcast(freq), Seq("tri"))
        .groupBy("doc_id").agg(
          sum("c_dt").as("n_tri"),
          sum(col("c_dt") * col("c_t")).as("freq_sum"),
          min("c_t").as("rarest_freq"))
        .withColumn("avg_tri_freq",
          col("freq_sum").cast("double") / col("n_tri"))
    }),

    // Collocation extraction: top bigrams by LIFT — p(ab)/(p(a)·p(b)),
    // the exponent-free core of PMI. PMI itself needs log(), which is
    // NOT guaranteed correctly rounded and could differ between engines
    // in the last ulp; lift is rank-identical (log is monotone) and
    // computes as cnt_ab·N²/(B·cnt_a·cnt_b) in DOUBLES with an
    // identical multiply order in both engines: every factor is an
    // exact integer that converts losslessly below 2^53, and the same
    // IEEE multiply/divide sequence is bit-stable cross-engine — while
    // an int64 numerator would silently wrap once cnt_ab·N² passes
    // 2^63 (N ≈ 2e9 tokens), i.e. exactly at the corpus scale this
    // operator targets. Counts-only
    // shuffles (bigram tf, unigram tf, one word-keyed join); min-count
    // floor keeps the tail noise out.
    // per-invocation view names + drop-after-analysis: a fixed view
    // name would race two concurrent gate evaluations in one session
    // and leak into the caller's catalog; sql() analyzes eagerly, so
    // the returned frame no longer needs the views
    "text_bigram_lift" -> ((s, d) => {
      val suf = Tables.invocationSuffix()
      val (vBg, vUni) = (s"g_blift_bg$suf", s"g_blift_uni$suf")
      val toks = Tables.documents(s, d)
        .withColumn("toks", split(lower(trim(col("text"))), " "))
      toks.select(explode(graft.functions.NgramShingles
          .ngram_shingles(col("toks"), 2)).as("bg"))
        .filter(size(split(col("bg"), " ")) === 2)
        .groupBy("bg").agg(count(lit(1)).as("cnt_ab"))
        .filter(col("cnt_ab") >= 5)
        .createOrReplaceTempView(vBg)
      toks.select(explode(col("toks")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("cnt"))
        .createOrReplaceTempView(vUni)
      try s.sql(s"""
        WITH n AS (SELECT cast(sum(cnt) as bigint) AS n_tok
                   FROM $vUni),
        b AS (SELECT cast(sum(cnt_ab) as bigint) AS n_bg
              FROM $vBg),
        sc AS (
          SELECT substring_index(bg, ' ', 1) AS w1,
            substring_index(bg, ' ', -1) AS w2, cnt_ab
          FROM $vBg)
        SELECT w1, w2, cnt_ab, u1.cnt AS cnt_a, u2.cnt AS cnt_b,
          cast(cnt_ab as double) * cast((SELECT n_tok FROM n) as double)
            * cast((SELECT n_tok FROM n) as double)
            / (cast((SELECT n_bg FROM b) as double)
               * cast(u1.cnt as double) * cast(u2.cnt as double))
            AS lift
        FROM sc
        JOIN $vUni u1 ON u1.w = sc.w1
        JOIN $vUni u2 ON u2.w = sc.w2
        ORDER BY lift DESC, w1 ASC, w2 ASC LIMIT 20""")
      finally {
        s.catalog.dropTempView(vBg); s.catalog.dropTempView(vUni)
      }
    }),

    // Benchmark decontamination: flag training docs that share any
    // 5-gram with the eval set (docs 0-9 stand in for a benchmark).
    // Grams travel as 16-byte md5 digests, never text; the eval side is
    // tiny by nature (benchmarks are thousands of docs, the corpus is
    // billions) so it is BROADCAST — the corpus-side gram stream never
    // shuffles for the probe itself, making the check one narrow pass
    // over the corpus plus a map-side semi-join; only the per-doc
    // evidence count aggregates.
    "text_decontaminate" -> ((s, d) => {
      def grams(df: DataFrame) = df
        .withColumn("toks", split(lower(trim(col("text"))), " "))
        .withColumn("g", explode(array_distinct(
          graft.functions.NgramShingles.ngram_shingles(col("toks"), 5))))
        .select(col("doc_id"), md5(col("g")).as("gh"))
      val docs = Tables.documents(s, d)
      val bench = grams(docs.filter(col("doc_id") < 10))
        .select("gh").distinct()
      grams(docs.filter(col("doc_id") >= 10))
        .join(broadcast(bench), Seq("gh"), "left_semi")
        .groupBy("doc_id")
        .agg(countDistinct(col("gh")).as("n_shared_grams"))
    })
  )

  /** Concat-and-chunk context packing (see the gate comment). `chunk` is
    * the context length in tokens; `block` is the prefix-sum block size —
    * the scale knob: the single-partition step touches corpus/block rows,
    * so a deployment sizes it to keep that frame in one executor's
    * memory (1e9 docs / 1e6 block = 1000 rows). Equality with the
    * single-window definition is spec-proven at small SF. */
  def packChunks(s: SparkSession, d: String, chunk: Int = 256,
      block: Long = 64L): DataFrame = {
    val counts = Tables.documents(s, d)
      .select(col("doc_id"),
        size(split(trim(col("text")), " ")).cast("long").as("cnt"))
      .withColumn("blk", expr(s"doc_id div $block"))
    val blkTot = counts.groupBy("blk").agg(sum("cnt").as("blk_tot"))
    val wBlk = Window.orderBy("blk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val blkOff = blkTot.withColumn("blk_off",
      coalesce(sum("blk_tot").over(wBlk), lit(0L)))
    val wIn = Window.partitionBy("blk").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = counts
      .join(broadcast(blkOff.select("blk", "blk_off")), Seq("blk"))
      .withColumn("off",
        col("blk_off") + coalesce(sum("cnt").over(wIn), lit(0L)))
    off.select(col("doc_id"), col("cnt"), col("off"),
        explode(expr(
          s"sequence(off div $chunk, (off + cnt - 1) div $chunk)"))
          .as("chunk_id"))
      .withColumn("tok_in_chunk",
        least(col("off") + col("cnt"), (col("chunk_id") + 1) * chunk) -
          greatest(col("off"), col("chunk_id") * chunk))
      .select("chunk_id", "doc_id", "off", "cnt", "tok_in_chunk")
  }

  /** The Gopher signal CTEs (t, u) shared by the rule-filter and the
    * classifier oracles — the DuckDB mirror of [[gopherSignals]]. */
  private val gopherSignalsSql =
    s"""t AS (
           SELECT doc_id, text, string_split(trim(text), ' ') AS toks
           FROM documents),
         u AS (
           SELECT doc_id,
             cast(len(toks) as int) AS n_words,
             cast(list_aggregate(list_transform(toks, t -> length(t)),
                  'sum') as int) AS total_len,
             cast(len(list_filter(toks,
                  t -> regexp_matches(t, '[a-z]'))) as int) AS alpha_cnt,
             cast(len(list_filter(toks,
                  t -> regexp_matches(t, '^[0-9]+$$'))) as int)
               AS digit_word_cnt,
             cast(len(list_filter(list_distinct(toks),
                  t -> t IN ($stopList))) as int) AS stop_hits,
             cast(length(text) - length(replace(text, '#', '')) +
                  (length(text) - length(replace(text, '...', ''))) // 3
                  as int) AS sym_cnt
           FROM t)"""

  /** Full from-scratch retraining of the quality classifier in DuckDB:
    * the [[CLF_ROUNDS]] gradient sweeps unroll as chained CTEs (w0 →
    * g1/w1 → … → wR), each round's gradient the same floor-quantized
    * int64 sum over the same fast-sigmoid residuals, every expression
    * tree written with [[clfTrain]]'s parenthesization. Exactly-rounded
    * IEEE ops on identical inputs make both engines' weights — and the
    * per-document scores — bit-identical. */
  private def clfOracleSql: String = {
    val dot = "w.w0 + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3 + " +
      "w.w4 * f.x4 + w.w5 * f.x5 + w.w6 * f.x6"
    val sb = new StringBuilder
    sb.append(
      s"""WITH $gopherSignalsSql,
         f AS (
           SELECT doc_id,
             cast((n_words BETWEEN 20 AND 2000 AND
                   3 * n_words <= total_len AND
                   total_len <= 10 * n_words AND
                   alpha_cnt * 5 >= n_words * 4 AND
                   digit_word_cnt * 10 <= n_words AND
                   sym_cnt * 10 < n_words AND stop_hits >= 2) as int) AS y,
             cast(n_words as double) / 64.0 - 0.3125 AS x1,
             cast(total_len as double) / (8.0 * n_words) - 0.375 AS x2,
             cast(alpha_cnt as double) / n_words - 0.8125 AS x3,
             0.125 - cast(digit_word_cnt as double) / n_words AS x4,
             cast(least(stop_hits, 8) as double) / 8.0 - 0.25 AS x5,
             0.125 - cast(sym_cnt as double) / n_words AS x6
           FROM u),
         w0 AS (SELECT ${(0 until CLF_DIM).map(j =>
               s"cast(0 as double) AS w$j").mkString(", ")})""")
    for (r <- 1 to CLF_ROUNDS) {
      val grads = (0 until CLF_DIM).map { j =>
        val xj = if (j == 0) "1.0" else s"x$j"
        s"sum(cast(floor(resid * $xj * 16777216.0) as bigint)) AS g$j"
      }.mkString(",\n             ")
      val ups = (0 until CLF_DIM).map(j =>
        s"w.w$j - 0.5 * ((cast(g.g$j as double) / 16777216.0) / g.n)" +
          s" AS w$j").mkString(",\n             ")
      sb.append(s""",
         r$r AS (
           SELECT *,
             ((0.5 + z / (2.0 * (1.0 + abs(z)))) - cast(y as double))
               * (CASE WHEN y = 0 THEN 8.0 ELSE 1.0 END) AS resid
           FROM (SELECT f.*, ($dot) AS z
                 FROM f CROSS JOIN w${r - 1} w)),
         g$r AS (
           SELECT $grads,
             count(*) AS n
           FROM r$r),
         w$r AS (
           SELECT $ups
           FROM w${r - 1} w CROSS JOIN g$r g)""")
    }
    sb.append(s"""
         SELECT doc_id, y, score, score > 0.0 AS pred
         FROM (SELECT f.doc_id, f.y, ($dot) AS score
               FROM f CROSS JOIN w$CLF_ROUNDS w)""")
    sb.toString
  }

  val oracles: Map[String, String] = Map(
    "text_quality_classifier" -> clfOracleSql,
    // the streaming serve path returns the identical frame (stateless
    // scoring under frozen weights) — verified against the same
    // retrain-from-scratch SQL
    "streaming_ingest_score" -> clfOracleSql,
    "text_pack_chunks" ->
      """WITH c AS (SELECT doc_id,
             cast(length(string_split(trim(text), ' ')) AS bigint) AS cnt
           FROM documents),
         o AS (SELECT doc_id, cnt,
             cast(coalesce(sum(cnt) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS bigint) AS off
           FROM c)
         SELECT chunk_id, doc_id, off, cnt,
           least(off + cnt, (chunk_id + 1) * 256)
             - greatest(off, chunk_id * 256) AS tok_in_chunk
         FROM (SELECT doc_id, cnt, off,
                 unnest(range(off // 256, (off + cnt - 1) // 256 + 1))
                   AS chunk_id
               FROM o)""",
    // same exact integer rational; split_part mirrors substring_index
    // (bigram tokens contain no spaces by construction)
    "text_bigram_lift" ->
      """WITH t AS (SELECT string_split(lower(trim(text)), ' ') AS toks
                    FROM documents),
         bg AS (SELECT bgx AS bg, cast(count(*) AS bigint) AS cnt_ab
                FROM (
                  SELECT unnest(list_transform(
                    range(1, greatest(len(toks) - 1, 1) + 1),
                    i -> array_to_string(list_slice(toks, i, i + 1), ' ')))
                    AS bgx
                  FROM t)
                WHERE len(string_split(bgx, ' ')) = 2
                GROUP BY bgx HAVING count(*) >= 5),
         uni AS (SELECT w, cast(count(*) AS bigint) AS cnt
                 FROM (SELECT unnest(toks) AS w FROM t) GROUP BY w),
         n AS (SELECT cast(sum(cnt) AS bigint) AS n_tok FROM uni),
         b AS (SELECT cast(sum(cnt_ab) AS bigint) AS n_bg FROM bg),
         sc AS (SELECT split_part(bg, ' ', 1) AS w1,
                  split_part(bg, ' ', 2) AS w2, cnt_ab FROM bg)
         SELECT w1, w2, cnt_ab, u1.cnt AS cnt_a, u2.cnt AS cnt_b,
           cast(cnt_ab AS double) * cast((SELECT n_tok FROM n) AS double)
             * cast((SELECT n_tok FROM n) AS double)
             / (cast((SELECT n_bg FROM b) AS double)
                * cast(u1.cnt AS double) * cast(u2.cnt AS double))
             AS lift
         FROM sc
         JOIN uni u1 ON u1.w = sc.w1
         JOIN uni u2 ON u2.w = sc.w2
         ORDER BY lift DESC, w1 ASC, w2 ASC LIMIT 20""",
    "text_token_stats" ->
      """WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks
                    FROM documents)
         SELECT doc_id,
           cast(len(toks) as int) AS n_tokens,
           cast(len(list_distinct(toks)) as int) AS n_uniq,
           cast(list_aggregate(list_transform(toks, t -> length(t)), 'sum')
                as int) AS total_len,
           cast(list_aggregate(list_transform(toks,
                t -> cast(ceil(length(t) / 4.0) as int)), 'sum') as int)
             AS n_bpe_est,
           cast(list_aggregate(list_transform(toks, t -> length(t)), 'sum')
                as double) / len(toks) AS avg_token_len
         FROM t""",
    "text_quality" ->
      s"""WITH t AS (
           SELECT doc_id, text, string_split(trim(text), ' ') AS toks
           FROM documents),
         u AS (
           SELECT doc_id, cast(len(toks) as int) AS n_tokens,
             cast(len(list_filter(toks, t -> t IN ($stopList))) as int)
               AS stop_cnt,
             cast(length(text) -
                  length(regexp_replace(text, '[0-9]', '', 'g')) as int)
               AS digit_cnt
           FROM t)
         SELECT doc_id, n_tokens, stop_cnt, digit_cnt,
           cast(stop_cnt as double) / n_tokens AS stop_ratio,
           cast(CASE WHEN n_tokens BETWEEN 20 AND 2000 THEN 50 ELSE 0 END +
            CASE WHEN cast(stop_cnt as double) / n_tokens > 0.02
                 THEN 30 ELSE 0 END +
            CASE WHEN digit_cnt = 0 THEN 20 ELSE 0 END as int) AS score_pts
         FROM u""",
    "text_gopher_filter" ->
      s"""WITH $gopherSignalsSql,
         r AS (
           SELECT doc_id, n_words, sym_cnt, stop_hits,
             (n_words BETWEEN 20 AND 2000) AS words_ok,
             (3 * n_words <= total_len AND total_len <= 10 * n_words)
               AS wlen_ok,
             (alpha_cnt * 5 >= n_words * 4) AS alpha_ok,
             (digit_word_cnt * 10 <= n_words) AS digit_ok,
             (sym_cnt * 10 < n_words) AS sym_ok,
             (stop_hits >= 2) AS stop_ok
           FROM u)
         SELECT doc_id, n_words, sym_cnt, stop_hits, words_ok, wlen_ok,
           alpha_ok, digit_ok, sym_ok, stop_ok,
           (words_ok AND wlen_ok AND alpha_ok AND digit_ok AND sym_ok
            AND stop_ok) AS keep
         FROM r""",
    "text_lang_id" -> {
      def h(ws: Seq[String]) = {
        val l = ws.map(w => s"'$w'").mkString(", ")
        s"cast(len(list_filter(toks, t -> t IN ($l))) as int)"
      }
      s"""WITH t AS (
           SELECT doc_id, lang, text, string_split(trim(text), ' ') AS toks
           FROM documents),
         u AS (
           SELECT doc_id, lang,
             ${h(Seq("the", "and", "of", "is"))} AS c_en,
             ${h(Seq("der", "und", "die", "ist"))} AS c_de,
             ${h(Seq("le", "la", "et", "est"))} AS c_fr,
             ${h(Seq("el", "los", "y", "es"))} AS c_es,
             length(regexp_replace(text, '[\\u4e00-\\u9fff]', '', 'g')) <
               length(text) AS has_cjk
           FROM t)
         SELECT doc_id,
           CASE WHEN has_cjk THEN 'zh'
                WHEN c_en >= greatest(c_de, c_fr, c_es) AND c_en > 0
                  THEN 'en'
                WHEN c_de >= greatest(c_fr, c_es) AND c_de > 0 THEN 'de'
                WHEN c_fr >= c_es AND c_fr > 0 THEN 'fr'
                WHEN c_es > 0 THEN 'es'
                ELSE 'unknown' END AS pred_lang,
           lang,
           (CASE WHEN has_cjk THEN 'zh'
                WHEN c_en >= greatest(c_de, c_fr, c_es) AND c_en > 0
                  THEN 'en'
                WHEN c_de >= greatest(c_fr, c_es) AND c_de > 0 THEN 'de'
                WHEN c_fr >= c_es AND c_fr > 0 THEN 'fr'
                WHEN c_es > 0 THEN 'es'
                ELSE 'unknown' END) = lang AS is_match
         FROM u"""
    },
    "text_tfidf_top_terms" ->
      """WITH toks AS (
           SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS tok
           FROM documents),
         tf AS (SELECT doc_id, tok, count(*) AS tf
                FROM toks GROUP BY doc_id, tok),
         df AS (SELECT tok, count(*) AS df FROM
                (SELECT DISTINCT doc_id, tok FROM toks) GROUP BY tok),
         n AS (SELECT count(*) AS n_docs FROM documents),
         scored AS (
           SELECT tf.doc_id, tf.tok,
             cast(tf.tf as double) * (n.n_docs + 1) / (df.df + 1)
               AS tfidf_score
           FROM tf JOIN df USING (tok), n)
         SELECT doc_id, tok, rn, tfidf_score FROM (
           SELECT doc_id, tok, tfidf_score,
             cast(row_number() OVER (PARTITION BY doc_id
               ORDER BY tfidf_score DESC, tok ASC) as int) AS rn
           FROM scored) WHERE rn <= 3""",
    "text_pii_redact" ->
      """WITH r AS (
           SELECT doc_id, text,
             regexp_replace(
               regexp_replace(text,
                 '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>',
                 'g'),
               '[0-9]{3,}', '<NUM>', 'g') AS redacted
           FROM documents)
         SELECT doc_id, md5(redacted) AS redacted_md5,
           cast(strlen(text) - strlen(redacted) as int) AS chars_removed,
           redacted != text AS was_redacted
         FROM r""",
    "text_bpe_tokens" -> bpeOracleSql(BPE_ROUNDS, BPE_K_PER_ROUND),
    "text_bm25" ->
      """WITH toks AS (
           SELECT doc_id, unnest(string_split(lower(trim(text)), ' '))
             AS tok
           FROM documents),
         dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
         corpus AS (SELECT cast(sum(dl) as bigint) AS big_l,
                           count(*) AS n_docs FROM dl),
         tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks
                WHERE tok IN ('spark', 'merge', 'window')
                GROUP BY doc_id, tok),
         df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
         scored AS (
           SELECT tf.doc_id, tf.tok, tf.tf, dl.dl,
             cast(44 * tf.tf * c.big_l * (c.n_docs + 1) as double) /
             cast((20 * tf.tf * c.big_l + 6 * c.big_l +
                   18 * dl.dl * c.n_docs) * (df.df + 1) as double)
               AS score
           FROM tf JOIN df USING (tok) JOIN dl USING (doc_id),
                corpus c)
         SELECT tok, doc_id, tf, dl, score, rn FROM (
           SELECT tok, doc_id, tf, dl, score,
             cast(row_number() OVER (PARTITION BY tok
               ORDER BY score DESC, doc_id ASC) as int) AS rn
           FROM scored) WHERE rn <= 10""",
    "text_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(lower(trim(text)), ' ')
             AS toks FROM documents),
         stats AS (SELECT doc_id, cast(len(toks) as int) AS n_tokens,
             cast(len(list_distinct(toks)) as int) AS n_uniq FROM t),
         g AS (SELECT doc_id, unnest(list_transform(
             range(1, greatest(len(toks) - 1, 1) + 1),
             i -> array_to_string(list_slice(toks, i, i + 1), ' '))) AS g
           FROM t),
         cnt AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY 1, 2),
         grams AS (SELECT doc_id, max(c) AS top2_cnt,
             cast(sum(c) as bigint) AS n_2grams FROM cnt GROUP BY 1)
         SELECT s.doc_id, n_tokens, n_uniq,
           cast(n_tokens - n_uniq as double) / n_tokens AS dup_tok_frac,
           n_2grams, top2_cnt,
           cast(top2_cnt as double) / n_2grams AS top2_frac
         FROM stats s JOIN grams USING (doc_id)""",
    "text_char_lm_score" ->
      """WITH tr AS (
           SELECT doc_id, unnest(list_transform(
             range(1, greatest(length(text) - 2, 1) + 1),
             i -> substr(text, i, 3))) AS tri
           FROM documents),
         dt AS (SELECT doc_id, tri, count(*) AS c_dt
                FROM tr GROUP BY 1, 2),
         freq AS (SELECT tri, cast(sum(c_dt) as bigint) AS c_t
                  FROM dt GROUP BY 1),
         agg AS (
           SELECT doc_id, cast(sum(c_dt) as bigint) AS n_tri,
             cast(sum(c_dt * c_t) as bigint) AS freq_sum,
             min(c_t) AS rarest_freq
           FROM dt JOIN freq USING (tri) GROUP BY doc_id)
         SELECT doc_id, n_tri, freq_sum, rarest_freq,
           cast(freq_sum as double) / n_tri AS avg_tri_freq
         FROM agg""",
    "text_decontaminate" ->
      """WITH t AS (SELECT doc_id,
             string_split(lower(trim(text)), ' ') AS toks FROM documents),
         sh AS (
           SELECT doc_id, md5(g) AS gh FROM (
             SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, greatest(len(toks) - 4, 1) + 1),
               i -> array_to_string(list_slice(toks, i, i + 4), ' '))))
               AS g
             FROM t)),
         bench AS (SELECT DISTINCT gh FROM sh WHERE doc_id < 10)
         SELECT s.doc_id, count(DISTINCT s.gh) AS n_shared_grams
         FROM sh s JOIN bench b ON s.gh = b.gh
         WHERE s.doc_id >= 10
         GROUP BY s.doc_id""",
    "text_fingerprint" ->
      """WITH t AS (SELECT doc_id, lower(trim(text)) AS ntext,
                    string_split(lower(trim(text)), ' ') AS toks
                    FROM documents)
         SELECT doc_id, md5(ntext) AS fp_full,
           list_aggregate(list_transform(
             range(1, greatest(len(toks) - 4, 1) + 1),
             i -> md5(array_to_string(list_slice(toks, i, i + 4), ' '))),
             'min') AS fp_min5
         FROM t"""
  )
}
