package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.backend.SparkBackend
import graft.core.{Coerce, SqlProcessorException}
import graft.etl.{Step, StepConfig, StepFactory, StepType}

/** Structured-Streaming mapping of the reference's streaming ETL mode.
  *
  * The reference (Flink backend, easy_sql/sql_processor/backend/
  * flink.py:88-131,196-204) runs streaming ETLs by buffering INSERT
  * statements into a statement set and committing them on an explicit
  * `execute_streaming_inserts()` func call. The Spark-native equivalent:
  *
  *  - source tables are `readStream` DataFrames registered as temp views;
  *  - `temp.` steps run the step SQL against those views — Catalyst builds
  *    an incremental plan (stateful aggs need watermark + window, which are
  *    plain SQL: `window(ts, '10 minutes')` after `withWatermark`);
  *  - `output.` steps don't execute — they enqueue a write spec
  *    (mirroring `add_insert`);
  *  - `func.execute_streaming_inserts()` starts every queued query
  *    (mirroring the statement-set commit).
  *
  * Sinks use foreachBatch so each micro-batch reuses the batch save path
  * (partitioned parquet append) — at scale this is the standard
  * exactly-once-per-sink pattern with checkpointing.
  *
  * '''Multi-sink statement sets''': when the commit finds ≥2 queued
  * inserts over ONE source stream and none is a stateful aggregation,
  * it runs them as a true statement set — ONE StreamingQuery, ONE
  * checkpoint, one pass over each micro-batch that re-evaluates the
  * recorded step SQL against the batch and commits EVERY sink from it
  * (the Spark twin of the reference's Flink statement-set buffer,
  * backend/flink.py:122-131 — Flink plans the buffered inserts as one
  * job; Spark's one-job unit is the micro-batch function). Each sink
  * write lands as an overwrite of its own `b<batchId>` dir, so the
  * at-least-once foreachBatch contract is exactly-once per sink — a
  * replayed batch rebuilds identical dirs for ALL sinks, which is what
  * keeps two sinks mutually consistent across restarts
  * (StatementSetSpec proves both sinks survive a checkpoint-recovery
  * replay byte-stable).
  *
  * '''Stateful statement sets''' (r11): when ≥2 queued inserts are all
  * per-row projections over ONE shared stateful recorded view (a
  * watermarked aggregation), they also commit as one query — the agg
  * streams in append mode and each finalized-row micro-batch fans out
  * to every sink ([[startStatefulStatementSet]]). Stateful inserts
  * that do NOT share a single aggregated intermediate keep per-insert
  * queries: their state lives in each streaming plan and cannot be
  * re-evaluated per batch.
  */
final class StreamingEtl(
    val spark: SparkSession,
    etlSql: String,
    sources: Map[String, DataFrame], // view name -> streaming DF
    sinkDir: String,
    trigger: Trigger = Trigger.AvailableNow(),
    variables: Map[String, Any] = Map.empty) { // CLI -v vars

  private val backend = new SparkBackend(spark)
  private val queued =
    scala.collection.mutable.ArrayBuffer[(String, DataFrame)]()
  // preprocessed step SQL in declaration order, for statement-set
  // re-evaluation inside foreachBatch: view steps and queued inserts
  private val viewSql =
    scala.collection.mutable.ArrayBuffer[(String, String)]()
  private val queuedSql =
    scala.collection.mutable.ArrayBuffer[(String, String)]()
  private val started = scala.collection.mutable.ArrayBuffer[StreamingQuery]()

  val varsContext = new graft.core.VarsContext()
  val templatesContext = new graft.core.TemplatesContext()
  val funcRunner = new graft.core.FuncRunner(
    graft.core.FuncRunner.systemFuncs ++ Map[String, Seq[Any] => Any](
      "execute_streaming_inserts" -> (_ => executeStreamingInserts())))
  varsContext.init(funcRunner)
  varsContext.addVars(variables)

  def run(): Seq[StreamingQuery] = {
    sources.foreach { case (name, df) => df.createOrReplaceTempView(name) }
    val steps = new StepFactory().createFromSql(etlSql)
    steps.foreach(runStep)
    started.toSeq
  }

  private def preprocess(step: Step): String = {
    val raw = step.selectSql.getOrElse(throw new SqlProcessorException(
      s"streaming step needs sql: $step"))
    varsContext.replaceVariables(templatesContext.replaceTemplates(raw))
  }

  private def runStep(step: Step): Unit = {
    val config = step.targetConfig.getOrElse(return)
    config.stepType match {
      case StepType.Template =>
        templatesContext.addTemplates(
          Map(config.name.get -> step.selectSql.get))
      case StepType.Variables =>
        // streaming DFs cannot be collected; variables steps in streaming
        // ETLs must be literal selects — evaluate on a batch one-row frame
        val df = spark.sql(preprocess(step))
        if (!df.isStreaming) {
          val row = df.first()
          varsContext.addVars(df.schema.fieldNames.zipWithIndex.map {
            case (n, i) => n -> (if (row.isNullAt(i)) null
                                 else Coerce.toStr(row.get(i)))
          }.toMap)
        }
      case StepType.Temp | StepType.Cache | StepType.Broadcast =>
        val text = preprocess(step)
        spark.sql(text).createOrReplaceTempView(config.name.get)
        viewSql += ((config.name.get, text))
      case StepType.Output | StepType.Hive =>
        // queue, don't start (statement-set semantics)
        val text = preprocess(step)
        queued += ((config.name.get, spark.sql(text)))
        queuedSql += ((config.name.get, text))
      case StepType.Func =>
        funcRunner.runFunc(config.name.get, varsContext)
      case StepType.Action =>
        spark.sql(preprocess(step))
      case _ =>
        throw new SqlProcessorException(
          s"step type ${config.stepType} not supported in streaming mode")
    }
  }

  /** Commit the queued inserts. Multi-sink stateless sets over one
    * source run as ONE statement-set query (see class doc); multi-sink
    * STATEFUL sets that all fan out from one shared aggregated
    * intermediate run as one query too (the state lives once, in the
    * shared agg — see [[startStatefulStatementSet]]); everything else
    * starts one StreamingQuery per insert. */
  def executeStreamingInserts(): Seq[StreamingQuery] = {
    val statementSet = queued.length >= 2 && sources.size == 1 &&
      queued.forall { case (_, df) => isStateless(df) }
    if (statementSet) {
      val q = startStatementSet()
      queued.clear(); queuedSql.clear()
      started += q
      return Seq(q)
    }
    statefulSetView() match {
      case Some(viewName) =>
        val q = startStatefulStatementSet(viewName)
        queued.clear(); queuedSql.clear()
        started += q
        return Seq(q)
      case None => ()
    }
    val qs = queued.map { case (target, df) =>
      val safe = target.replace(".", "__")
      // append mode needs finalized rows: a streaming aggregation without
      // an event-time watermark would only fail deep inside start() —
      // surface the fix (add withWatermark / window) at queue-commit time
      if (hasAggregation(df) && !hasWatermark(df))
        throw new SqlProcessorException(
          s"streaming insert into $target aggregates without a watermark; " +
          "append-mode sinks need `withWatermark` (or SQL over a " +
          "watermarked source view) so windows can finalize")
      df.writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$sinkDir/_checkpoints/$safe")
        .trigger(trigger)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          batch.write.mode("append").parquet(s"$sinkDir/$safe")
        }
        .queryName(safe)
        .start()
    }.toSeq
    queued.clear()
    started ++= qs
    qs
  }

  /** One query, one checkpoint, N sinks per micro-batch: the batch is
    * registered under the source view's name in the micro-batch
    * session (an isolated clone — the outer session's streaming views
    * are untouched), the recorded view steps re-evaluate against it,
    * and every queued insert writes its own `b<batchId>` overwrite dir
    * — all sinks commit from the SAME pass over the batch. */
  private def startStatementSet(): StreamingQuery = {
    val srcName = sources.head._1
    val views = viewSql.toVector
    val sinks = queuedSql.toVector
    val root = sinkDir
    sources.head._2.writeStream
      .option("checkpointLocation", s"$root/_checkpoints/__statement_set")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val sess = batch.sparkSession
        batch.persist()
        try {
          batch.createOrReplaceTempView(srcName)
          views.foreach { case (name, text) =>
            sess.sql(text).createOrReplaceTempView(name)
          }
          sinks.foreach { case (target, text) =>
            // coalesce(1): per-batch results are small; a zero-row batch
            // still commits one schema-bearing file per sink
            sess.sql(text).coalesce(1).write.mode("overwrite")
              .parquet(s"$root/${target.replace(".", "__")}/b$batchId")
          }
        } finally { batch.unpersist(); () }
      }
      .queryName("g_statement_set")
      .start()
  }

  /** Stateful statement-set eligibility: ≥2 queued inserts whose step
    * SQL is a PER-ROW transform over ONE shared stateful recorded view
    * (the aggregated intermediate). The reference's Flink statement set
    * (backend/flink.py:122-131) buffers stateful and stateless inserts
    * alike; this is the Spark shape that honors it for the stateful
    * case — the state lives exactly once, in the shared aggregation's
    * streaming plan, and the sinks are row-local projections of its
    * finalized output, safe to re-evaluate per micro-batch.
    *
    * Conditions (all checked structurally):
    *  - exactly ONE recorded view has a stateful plan, and it carries a
    *    watermark (append-mode finalization);
    *  - every queued insert's PARSED text is stateless (no aggregate /
    *    distinct of its own — a per-batch re-evaluation of those would
    *    silently compute per-batch, not global, answers) and references
    *    ONLY that view. */
  private def statefulSetView(): Option[String] = {
    if (queued.length < 2) return None
    import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Deduplicate, Distinct}
    def parsed(text: String) =
      try Some(org.apache.spark.sql.catalyst.parser.CatalystSqlParser
        .parsePlan(text))
      catch { case _: Exception => None }
    def textStateless(text: String): Boolean =
      parsed(text).exists(_.collectFirst {
        case a: Aggregate => a
        case d: Deduplicate => d
        case d: Distinct => d
      }.isEmpty)
    def refs(text: String): Set[String] =
      parsed(text).map(_.collect {
        case r: UnresolvedRelation =>
          r.multipartIdentifier.mkString(".").toLowerCase
      }.toSet).getOrElse(Set("__unparseable__"))
    val statefulViews = viewSql.filter { case (n, _) =>
      try !isStateless(spark.table(n))
      catch { case _: Exception => false }
    }
    statefulViews.toList match {
      case (vn, _) :: Nil if hasWatermark(spark.table(vn)) &&
          queuedSql.forall { case (_, t) =>
            textStateless(t) && refs(t) == Set(vn.toLowerCase) } =>
        Some(vn)
      // ≥2 stateful recorded views feeding the queued sinks is a shape
      // ONE query/ONE checkpoint cannot hold (state must live exactly
      // once) — and a silent per-insert fallback would quietly break
      // the statement set's all-sinks-commit-together claim. Refuse
      // loudly with the fix in the message instead.
      case multi if multi.size >= 2 && {
        val names = multi.map(_._1.toLowerCase).toSet
        queuedSql.forall { case (_, t) =>
          val r = refs(t)
          textStateless(t) && r.nonEmpty && r.subsetOf(names) }
      } =>
        throw new SqlProcessorException(
          s"streaming statement set cannot hold state in ${multi.size} " +
          s"recorded views (${multi.map(_._1).mkString(", ")}) under one " +
          "checkpoint — state must live exactly once. Either fan every " +
          "sink out from a single shared stateful view, or split the " +
          "pipeline into one streaming ETL per stateful intermediate " +
          "(each gets its own checkpoint and its sinks stay consistent " +
          "within it)")
      case _ => None
    }
  }

  /** One stateful aggregation, one StreamingQuery, one checkpoint, N
    * sinks: the shared aggregated intermediate streams in append mode
    * (each finalized window row arrives exactly once, watermark-
    * gated), and every queued insert re-evaluates per micro-batch
    * against THAT batch of finalized rows registered under the view's
    * name — all sinks commit from the same pass, so they can never
    * disagree about which windows finalized. Writes land as
    * `b<batchId>` overwrite dirs (same exactly-once-per-sink
    * discipline as the stateless set): a checkpoint-recovery replay of
    * a batch rebuilds identical dirs for ALL sinks
    * (StatementSetSpec's stateful case proves restart convergence). */
  private def startStatefulStatementSet(viewName: String): StreamingQuery = {
    val sinks = queuedSql.toVector
    val root = sinkDir
    spark.table(viewName).writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$root/_checkpoints/__stateful_set")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val sess = batch.sparkSession
        batch.persist()
        try {
          batch.createOrReplaceTempView(viewName)
          sinks.foreach { case (target, text) =>
            sess.sql(text).coalesce(1).write.mode("overwrite")
              .parquet(s"$root/${target.replace(".", "__")}/b$batchId")
          }
        } finally { batch.unpersist(); () }
      }
      .queryName("g_stateful_statement_set")
      .start()
  }

  private def hasAggregation(df: DataFrame): Boolean =
    df.queryExecution.analyzed.collectFirst {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.isDefined

  /** Statement-set eligibility: per-batch re-evaluation preserves
    * semantics ONLY for per-row (stateless) plans. Any operator that
    * carries state across micro-batches — aggregation, dedup,
    * stream-stream join, custom group state — must keep its own
    * streaming query. */
  private def isStateless(df: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    df.queryExecution.analyzed.collectFirst {
      case a: Aggregate => a
      case d: Deduplicate => d
      case d: DeduplicateWithinWatermark => d
      case f: FlatMapGroupsWithState => f
      case j: Join if j.left.isStreaming && j.right.isStreaming => j
    }.isEmpty
  }

  private def hasWatermark(df: DataFrame): Boolean =
    df.queryExecution.analyzed.collectFirst {
      case w: org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark =>
        w
    }.isDefined
}

object StreamingOps {
  import org.apache.spark.sql.functions._

  /** Watermarked tumbling-window counts — the canonical streaming agg
    * (same expression the batch `streaming_tumbling_window` query runs,
    * which is what the driver's batch-replay check verifies). */
  def tumblingCounts(events: DataFrame, tsCol: String, watermark: String,
      windowLen: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
           sum(col("value").cast("decimal(18,2)")).cast("double")
             .as("sum_val"))
      .select(col("window.start").cast("long").as("bucket_start"),
              col("event_type"), col("cnt"), col("sum_val"))

  /** Sliding-window variant. */
  def slidingCounts(events: DataFrame, tsCol: String, watermark: String,
      windowLen: String, slide: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen, slide))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").cast("long").as("bucket_start"),
              col("cnt"))

  /** Session-window counts via session_window (built-in since 3.2). */
  def sessionCounts(events: DataFrame, tsCol: String, watermark: String,
      gap: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("session_window.start").cast("long").as("sess_start"),
              col("user_id"), col("cnt"))

  /** Stream-stream inner interval join: `leftType` events matched with
    * `rightType` events of the same user within `[ts, ts + within]`.
    * Both sides carry watermarks and the join condition carries the
    * time bound, so Spark derives a state watermark and evicts join
    * state past `watermark + within` — state is bounded by the join
    * horizon, not the stream length, which is what keeps a
    * click-to-conversion join alive at production event rates. Output
    * timestamps are epoch micros (no raw timestamps in gate outputs).
    */
  def intervalJoin(events: DataFrame, tsCol: String, watermark: String,
      leftType: String, rightType: String, within: String): DataFrame = {
    val left = events.filter(col("event_type") === leftType)
      .select(col("event_id").as("left_id"),
        col("user_id").as("left_user"), col(tsCol).as("left_ts"))
      .withWatermark("left_ts", watermark)
    val right = events.filter(col("event_type") === rightType)
      .select(col("event_id").as("right_id"),
        col("user_id").as("right_user"), col(tsCol).as("right_ts"))
      .withWatermark("right_ts", watermark)
    left.join(right,
        col("left_user") === col("right_user") &&
        col("right_ts") >= col("left_ts") &&
        col("right_ts") <= col("left_ts") + expr(s"INTERVAL $within"))
      .select(col("left_id"), col("right_id"),
        col("left_user").as("user_id"),
        unix_micros(col("left_ts")).as("left_us"),
        unix_micros(col("right_ts")).as("right_us"))
  }

  /** Streaming exact dedup: first event per key wins, duplicate state
    * aged out by the watermark (dropDuplicatesWithinWatermark) — the
    * streaming twin of the batch `dedup_exact` operator. At scale the
    * state store holds only keys inside the watermark horizon instead
    * of growing without bound. */
  def dedupStream(events: DataFrame, tsCol: String, watermark: String,
      keyCols: Seq[String]): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  // --- custom state: gap-based sessionization ----------------------------

  final case class SessEvent(user_id: Long, us: Long,
      ts: java.sql.Timestamp)
  final case class SessState(startUs: Long, endUs: Long, cnt: Long)
  final case class SessionOut(user_id: Long, sess_start_us: Long,
      sess_end_us: Long, cnt: Long)

  /** Custom-state sessionization via flatMapGroupsWithState: sessions
    * split at event-time gaps > `gapMinutes`, closed sessions emitted in
    * Append mode, open sessions flushed by EventTimeTimeout once the
    * watermark passes their gap horizon. Matches the batch
    * `sessionize_events` gap semantics (EventOps.scala:47-61) — the
    * KeyValueGroupedDataset path for session logic that
    * `session_window` can't express (per-session aggregates, custom
    * close conditions).
    *
    * State per key is ONE open session (three longs) — at 100 TB the
    * state store scales with |active users|, not |events|.
    */
  def statefulSessions(events: DataFrame, tsCol: String, userCol: String,
      watermark: String, gapMinutes: Int)
      : org.apache.spark.sql.Dataset[SessionOut] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes.toLong * 60L * 1000000L

    val typed = events
      .withWatermark(tsCol, watermark)
      .select(col(userCol).cast("long").as("user_id"),
              unix_micros(col(tsCol)).as("us"),
              col(tsCol).as("ts"))
      .as[SessEvent]

    def flush(uid: Long, state: GroupState[SessState]): Iterator[SessionOut] = {
      val out = state.getOption.map(s =>
        SessionOut(uid, s.startUs, s.endUs, s.cnt)).iterator
      state.remove()
      out
    }

    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
          GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[SessEvent], state: GroupState[SessState]) =>
          if (state.hasTimedOut) flush(uid, state)
          else {
            val closed = scala.collection.mutable.Buffer[SessionOut]()
            var cur = state.getOption
            // within one micro-batch rows arrive unordered; order by
            // event time before applying the gap rule
            rows.toSeq.sortBy(_.us).foreach { e =>
              cur match {
                case Some(s) if e.us - s.endUs <= gapUs =>
                  cur = Some(SessState(s.startUs, math.max(s.endUs, e.us),
                    s.cnt + 1))
                case Some(s) =>
                  closed += SessionOut(uid, s.startUs, s.endUs, s.cnt)
                  cur = Some(SessState(e.us, e.us, 1))
                case None =>
                  cur = Some(SessState(e.us, e.us, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close the session once the watermark passes its gap
              state.setTimeoutTimestamp(s.endUs / 1000L + gapUs / 1000L)
            }
            closed.iterator
          }
      }
  }
}
