package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/**
 * Event-stream operators: tumbling-window rollups and gap-based
 * sessionization, in both batch form (deterministic, oracle-checked)
 * and Structured Streaming form (watermarked, availableNow-testable).
 *
 * Timestamps: events.ts normalizes to BIGINT nanos (`ts_ns`, see
 * Tables.events) from either fixture generation — TIMESTAMP(NANOS)
 * read as BIGINT, or timestamp[us] read as TIMESTAMP. All batch
 * bucketing is integer math on epoch seconds — bit-exact across
 * engines.
 */
object EventOps {

  val SessionGapSeconds = 1800L

  /** Hourly rollup per event_type: (hour_epoch, event_type, n, sum_v). */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .withColumn("hour_epoch", expr("ts_ns div 3600000000000") * 3600L)
      .groupBy(col("hour_epoch"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))
      .orderBy(col("hour_epoch"), col("event_type"))

  /**
   * Hour-level count anomalies per event_type — the monitoring view
   * over the [[hourlyRollup]] surface: hours whose count deviates from
   * that type's mean by more than `k` population standard deviations,
   * BOTH directions (spikes and droughts).
   *
   * The z-test is INTEGER-EXACT: |c - T/H| > k·σ with σ² =
   * (H·SS - T²)/H² becomes `(H·c - T)² > k²·(H·SS - T²)` — BIGINT
   * arithmetic end-to-end, no float ever, so the flag set is
   * bit-identical across engines (a float z would make boundary rows
   * engine-dependent). Zero-variance types flag nothing (0 > 0 false).
   *
   * Scale shape: one corpus pass into the hourly partial agg (the
   * (type, hour)-keyed state is calendar-bounded), a type-cardinality-
   * sized stats table broadcast back, flag as a scan predicate.
   * Overflow bound: H·SS must fit a signed 64-bit — holds through
   * ~1e9 events/hour-type over a decade of hours; beyond that,
   * pre-aggregate to coarser buckets.
   */
  def anomalousHours(events: DataFrame, k: Int = 2): DataFrame = {
    require(k >= 1 && k <= 100, s"graft: k $k outside 1..100")
    val hourly = events
      .withColumn("hour_epoch", expr("ts_ns div 3600000000000") * 3600L)
      .groupBy(col("event_type"), col("hour_epoch"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(eager = false) // shared: the stats agg + flag scan
    val stats = hourly.groupBy("event_type").agg(
      count(lit(1)).as("h"),
      sum(col("cnt")).as("t"),
      sum(col("cnt") * col("cnt")).as("ss"))
    val dev = col("h") * col("cnt") - col("t")
    hourly.join(broadcast(stats), "event_type")
      .where(dev * dev > lit(k.toLong * k) * (col("h") * col("ss") - col("t") * col("t")))
      .select(col("event_type"), col("hour_epoch"), col("cnt"))
  }

  /** SLIDING-window rollup per event_type (1 h windows every 15 min —
    * the trending/rate view a monitoring surface reads): Spark's native
    * `window(ts, "1 hour", "15 minutes")`, which replicates each event
    * into its window/slide = 4 overlapping windows BEFORE the partial
    * agg — so the exchange carries per-(window, type) partials, 4x the
    * tumbling rollup's, never 4x the events. Batch and streaming share
    * this exact plan shape ([[runSlidingStream]] is the stream twin;
    * spec-pinned equal). */
  def slidingRollup(events: DataFrame): DataFrame =
    events
      .withColumn("event_ts", timestamp_micros(expr("ts_ns div 1000")))
      .groupBy(window(col("event_ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))
      .select(unix_timestamp(col("window.start")).as("win_epoch"),
        col("event_type"), col("n"), col("sum_v"))
      .orderBy(col("win_epoch"), col("event_type"))

  /** Gap-based sessionization (gap > 30 min splits): per (user, session)
    * event count and duration in seconds. Shuffles once on user_id;
    * within-partition window sort only. */
  def sessionize(events: DataFrame): DataFrame = {
    val sec = expr("ts_ns div 1000000000")
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
    events
      .withColumn("sec", sec)
      .withColumn("prev_sec", lag(col("sec"), 1).over(byUser))
      .withColumn("boundary",
        when(col("prev_sec").isNull || col("sec") - col("prev_sec") > SessionGapSeconds, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("boundary")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        (max(col("sec")) - min(col("sec"))).as("dur_s"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  /** One event for the stateful sessionizer. */
  case class Ev(user_id: Long, sec: Long, event_id: Long)

  /** Sessionizer state per user. */
  case class SessState(sessionIdx: Long, startSec: Long, lastSec: Long, count: Long)

  /** A closed session emitted by the stateful sessionizer. */
  case class ClosedSession(user_id: Long, session_idx: Long, n_events: Long, dur_s: Long)

  /**
   * Stateful streaming sessionization via flatMapGroupsWithState:
   * per-user state carries the open session; a gap > 30 min closes and
   * emits it. The state store holds one small record per user — the
   * shape that scales to arbitrarily long streams. (The last open
   * session per user stays in state, so on a finite input the emitted
   * set equals the batch result minus each user's final session.)
   */
  def sessionizeStream(spark: SparkSession, dir: String, queryName: String = "graft_sessions"): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val schema = eventStreamSchema(spark, dir, Some("events.parquet"))
    val events = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts_ns", tsNs(schema))
      .selectExpr("user_id", "ts_ns div 1000000000 AS sec", "event_id")
      .as[Ev]
    val sessions = events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (uid, evs, state) =>
        val sorted = evs.toSeq.sortBy(e => (e.sec, e.event_id))
        var st = state.getOption.orNull
        val closed = scala.collection.mutable.ListBuffer.empty[ClosedSession]
        for (e <- sorted) {
          if (st == null) st = SessState(1L, e.sec, e.sec, 1L)
          else if (e.sec - st.lastSec > SessionGapSeconds) {
            closed += ClosedSession(uid, st.sessionIdx, st.count, st.lastSec - st.startSec)
            st = SessState(st.sessionIdx + 1, e.sec, e.sec, 1L)
          } else st = SessState(st.sessionIdx, st.startSec, e.sec, st.count + 1)
        }
        if (st != null) state.update(st)
        closed.iterator
      }
    val q = sessions.toDF()
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /**
   * Generalized N-step funnel: users progressing through `steps` in
   * order, each step within `withinNs` of the previous step's
   * timestamp (strictly after it). Returns one row per step:
   * (step_idx, step, n_users) — the classic conversion funnel with an
   * arbitrary step list instead of the fixed three-stage
   * view->click->purchase (`ev_funnel`, which this generalizes:
   * spec-pinned equal on that step list).
   *
   * Semantics per stage (the deterministic "first qualifying event"
   * rule, same as the 3-stage row): stage 0 anchors at each user's
   * MIN event of steps(0); stage i keeps users with an event of
   * steps(i) in (prev_ts, prev_ts + withinNs], anchored at the MIN
   * such event. Each stage is one equi-join on user_id + one
   * map-side-combinable min-agg; the qualifying-user frame shrinks
   * monotonically down the funnel, so later joins broadcast when the
   * funnel narrows. K stages = K linear passes — never a per-user
   * event-sequence collect.
   */
  def funnel(events: DataFrame, steps: Seq[String], withinNs: Long): DataFrame = {
    require(steps.nonEmpty, "graft: funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      "graft: repeated step types are ambiguous under the min-anchor rule")
    require(withinNs > 0, s"graft: withinNs $withinNs must be positive")
    val stages = steps.tail.zipWithIndex.scanLeft(
      events.where(col("event_type") === steps.head)
        .groupBy("user_id").agg(min(col("ts_ns")).as("ts"))) {
      case (prev, (st, _)) =>
        events.where(col("event_type") === st)
          .join(prev.select(col("user_id"), col("ts").as("prev_ts")), "user_id")
          .where(col("ts_ns") > col("prev_ts") &&
            col("ts_ns") <= col("prev_ts") + withinNs)
          .groupBy("user_id").agg(min(col("ts_ns")).as("ts"))
    }
    stages.zip(steps).zipWithIndex.map { case ((stage, st), i) =>
      stage.agg(count(lit(1)).as("n_users"))
        .select(lit(i).as("step_idx"), lit(st).as("step"), col("n_users"))
    }.reduce(_ unionByName _)
  }

  /**
   * Streaming twin of the hourly-trending view (`ev_trending`): the
   * watermarked hourly rollup is maintained by the stream
   * ([[runHourlyStream]]'s complete-mode state — one row per (hour,
   * type), bounded by the clock x type dictionary, never by event
   * volume), and the top-k rank is a WindowGroupLimit read OVER the
   * rollup sink — group-count-sized input, so serving "what's
   * trending" costs a scan of the live rollup, not of any event. On a
   * finite drain the result equals the batch `ev_trending` row for
   * row (spec-pinned; hour_epoch here is the same `ts div 1h` bucket).
   */
  def trendingStream(spark: SparkSession, dir: String, k: Int = 2,
                     queryName: String = "graft_trending"): DataFrame = {
    require(k >= 1, s"graft: trending k $k must be positive")
    val hourly = runHourlyStream(spark, dir, queryName)
    val h = hourly.select((col("hour_epoch") / 3600).cast("long").as("hour_epoch"),
      col("event_type"), col("n"))
    val w = Window.partitionBy(col("hour_epoch"))
      .orderBy(desc("n"), col("event_type"))
    h.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select("hour_epoch", "rnk", "event_type", "n")
  }

  /** One event for the stateful funnel/transition trackers. */
  case class FunEv(user_id: Long, ts_ns: Long, event_id: Long, event_type: String)

  /** Funnel-tracker state: the anchor timestamp of each stage the user
    * has reached, in stage order — at most |steps| longs per user, so
    * state is bounded by the step list, never by stream length. */
  case class FunnelAnchors(anchors: Seq[Long])

  /** Emitted once per (user, stage) the moment the stage is reached. */
  case class StageReach(user_id: Long, step_idx: Int)

  /**
   * Stateful streaming twin of the generalized N-step [[funnel]]
   * (VERDICT r12 next #7): per-user state carries ONLY the reached
   * stages' anchor timestamps (<= K longs); each micro-batch folds its
   * events in (ts_ns, event_id) order — the batch twin's min-anchor
   * order — against that state and emits a (user, step_idx) row for
   * every stage newly reached, exactly once per user and stage. The
   * per-step user counts over the drained emissions therefore equal
   * the batch funnel's counts (spec-pinned; the min-anchor rule makes
   * "first qualifying event in ts order" == "MIN qualifying event", so
   * an ascending fold reproduces the batch anchors without retaining
   * any event history).
   *
   * Same finite-drain contract as [[transitionsStream]]: in-batch
   * sorting handles arrival disorder inside a micro-batch; an event
   * arriving in a LATER batch with an earlier timestamp than a
   * committed anchor cannot retroactively re-anchor (that would need
   * per-user event history — unbounded state). Zero-user steps are
   * emitted with n_users = 0, matching the batch shape.
   */
  def funnelStream(spark: SparkSession, dir: String, steps: Seq[String],
                   withinNs: Long,
                   queryName: String = "graft_funnel"): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    require(steps.nonEmpty, "graft: funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      "graft: repeated step types are ambiguous under the min-anchor rule")
    require(withinNs > 0, s"graft: withinNs $withinNs must be positive")
    val stepArr = steps.toArray
    val k = stepArr.length
    val schema = eventStreamSchema(spark, dir, Some("events.parquet"))
    val events = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts_ns", tsNs(schema))
      .selectExpr("user_id", "ts_ns", "event_id", "event_type")
      .as[FunEv]
    val reached = events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelAnchors, StageReach](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (uid, evs, state) =>
        val sorted = evs.toSeq.sortBy(e => (e.ts_ns, e.event_id))
        var anchors = state.getOption.map(_.anchors.toList).getOrElse(Nil)
        val before = anchors.length
        for (e <- sorted) {
          val n = anchors.length
          if (n == 0) {
            if (e.event_type == stepArr(0)) anchors = List(e.ts_ns)
          } else if (n < k && e.event_type == stepArr(n) &&
              e.ts_ns > anchors.last && e.ts_ns <= anchors.last + withinNs) {
            anchors = anchors :+ e.ts_ns
          }
        }
        if (anchors.length > before) state.update(FunnelAnchors(anchors))
        (before until anchors.length).iterator.map(StageReach(uid, _))
      }
    val q = reached.toDF()
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val counts = spark.table(queryName)
      .groupBy("step_idx").agg(count(lit(1)).as("cnt"))
    steps.zipWithIndex.map { case (s, i) => (i, s) }
      .toDF("step_idx", "step")
      .join(counts, Seq("step_idx"), "left")
      .select(col("step_idx"), col("step"),
        coalesce(col("cnt"), lit(0L)).as("n_users"))
  }

  /** One event for the stateful transition tracker. */
  case class TrEv(user_id: Long, ts_ns: Long, event_id: Long, event_type: String)

  /** Transition-tracker state: the user's LAST seen event. */
  case class TrState(tsNs: Long, eventId: Long, eventType: String)

  /** One emitted first-order transition. */
  case class Transition(user_id: Long, prev_type: String, event_type: String)

  /**
   * Stateful streaming twin of the batch transition matrix
   * (SparkEntry `ev_transitions`): per-user state carries only the
   * LAST event (one tiny record per user — bounded regardless of
   * stream length); each arriving event emits its (prev -> current)
   * pair immediately. Unlike the sessionizer there is no open tail to
   * truncate: every transition is complete the moment its second event
   * arrives, so on a finite drain the emitted multiset equals the
   * batch window-lag result EXACTLY (spec-pinned). Events inside a
   * micro-batch sort by (ts_ns, event_id) — the batch twin's window
   * order — before folding against the state.
   */
  def transitionsStream(spark: SparkSession, dir: String,
                        queryName: String = "graft_transitions"): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val schema = eventStreamSchema(spark, dir, Some("events.parquet"))
    val events = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts_ns", tsNs(schema))
      .selectExpr("user_id", "ts_ns", "event_id", "event_type")
      .as[TrEv]
    val transitions = events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TrState, Transition](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (uid, evs, state) =>
        val sorted = evs.toSeq.sortBy(e => (e.ts_ns, e.event_id))
        var st = state.getOption.orNull
        val out = scala.collection.mutable.ListBuffer.empty[Transition]
        for (e <- sorted) {
          if (st != null) out += Transition(uid, st.eventType, e.event_type)
          st = TrState(e.ts_ns, e.event_id, e.event_type)
        }
        if (st != null) state.update(st)
        out.iterator
      }
    val q = transitions.toDF()
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** Interval-join window: clicks within this many seconds BEFORE an
    * error are attributed to it. */
  val JoinWindowSeconds = 600L

  /**
   * Batch interval join: every (error, click) pair of the same user
   * with click_sec in [err_sec - JoinWindowSeconds, err_sec]. One
   * equi-shuffle on user_id; the range predicate filters within the
   * joined groups — matches only, never a range explosion. The
   * streaming twin is [[errorClickJoinStream]].
   */
  def errorClickJoin(events: DataFrame): DataFrame = {
    val sec = expr("ts_ns div 1000000000")
    val err = events.where(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id"), sec.as("err_sec"))
    val clk = events.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), sec.as("click_sec"))
    err.join(clk, Seq("user_id"))
      .where(col("click_sec") >= col("err_sec") - JoinWindowSeconds &&
        col("click_sec") <= col("err_sec"))
      .select(col("err_id"), col("click_id"),
        (col("err_sec") - col("click_sec")).as("gap_s"))
      .orderBy("err_id", "click_id")
  }

  /**
   * Stream-stream time-interval join (watermarked on both sides so the
   * join state store can evict: clicks older than the interval plus the
   * watermark delay are dropped). Append mode — rows emit once both
   * watermarks pass the match window.
   */
  def errorClickJoinStream(spark: SparkSession, dir: String,
                           queryName: String = "graft_err_click"): DataFrame = {
    val schema = eventStreamSchema(spark, dir, Some("events.parquet"))
    def side(eventType: String, idAs: String, tsAs: String) =
      spark.readStream
        .schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir)
        .where(col("event_type") === eventType)
        // floor to epoch seconds so the interval semantics match the
        // batch twin and the oracle exactly (fixture timestamps carry
        // sub-second nanos; comparing at micros would flip boundary
        // pairs within the same floored second)
        .withColumn("ts_ns", tsNs(schema))
        .select(col("event_id").as(idAs), col("user_id").as(s"${idAs}_user"),
          timestamp_seconds(expr("ts_ns div 1000000000")).as(tsAs))
        .withWatermark(tsAs, "1 hour")
    val err = side("error", "err_id", "err_ts")
    val clk = side("click", "click_id", "click_ts")
    val joined = err.join(clk,
      col("err_id_user") === col("click_id_user") &&
        col("click_ts") >= col("err_ts") - expr(s"INTERVAL $JoinWindowSeconds SECONDS") &&
        col("click_ts") <= col("err_ts"))
      .select(col("err_id"), col("click_id"),
        (unix_timestamp(col("err_ts")) - unix_timestamp(col("click_ts"))).as("gap_s"))
    val q = joined.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /**
   * Streaming dedup of an at-least-once event feed:
   * dropDuplicatesWithinWatermark keeps one state entry per event_id
   * inside the watermark horizon and evicts beyond it — bounded state,
   * unlike dropDuplicates' forever-growing store. Reads `dir` (which may
   * contain the same events delivered in multiple files) and returns the
   * deduplicated stream drained to a memory sink.
   */
  def dedupStream(spark: SparkSession, dir: String,
                  queryName: String = "graft_dedup"): DataFrame = {
    val schema = eventStreamSchema(spark, dir, glob = None)
    val stream = spark.readStream
      .schema(schema)
      .parquet(dir)
      .withColumn("ts_ns", tsNs(schema))
      .withColumn("event_ts", timestamp_micros(expr("ts_ns div 1000")))
      .withWatermark("event_ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .select("event_id", "user_id", "event_type")
    val q = stream.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** Read schema for the streaming source, probed from the parquet
    * footer via a cheap batch read (a stream must declare its schema up
    * front, and fixture generations differ in ts's physical type:
    * BIGINT nanos in older ones, timestamp[us] in newer). The probe
    * pins the same two confs as Tables.load so both variants resolve
    * deterministically. */
  def eventStreamSchema(spark: SparkSession, dir: String,
                        glob: Option[String]): StructType = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val r = spark.read
    glob.foreach(g => r.option("pathGlobFilter", g))
    r.parquet(dir).schema
  }

  /** BIGINT-nanos ts expression over a raw events scan of either
    * fixture generation (see Tables.events for the batch twin). */
  private def tsNs(schema: StructType) =
    schema("ts").dataType match {
      case LongType => col("ts")
      case _ => unix_micros(col("ts").cast(TimestampType)) * 1000L
    }

  /**
   * Structured Streaming hourly rollup: file source over the events
   * parquet, watermarked tumbling window, availableNow trigger draining
   * to a memory sink. Returns the completed result as a DataFrame.
   * At scale this is `readStream` on an arriving-file directory with a
   * real trigger; the plan (watermark -> window agg, `update` state in
   * the state store) is identical.
   */
  def runHourlyStream(spark: SparkSession, dir: String, queryName: String = "graft_hourly"): DataFrame = {
    // file stream sources need a directory basePath; select the events
    // file out of the fixture dir with a glob filter
    val schema = eventStreamSchema(spark, dir, Some("events.parquet"))
    val stream = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts_ns", tsNs(schema))
      .withColumn("event_ts", timestamp_micros(expr("ts_ns div 1000")))
      .withWatermark("event_ts", "1 hour")
      .groupBy(window(col("event_ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))
      .select(
        (unix_timestamp(col("window.start"))).as("hour_epoch"),
        col("event_type"), col("n"), col("sum_v"))
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** Streaming twin of [[slidingRollup]]: watermarked sliding-window
    * agg, complete mode, availableNow drain (the OperatorSpec pins
    * stream == batch). Each event updates 4 window states; the state
    * store holds (windows x types), not events. */
  def runSlidingStream(spark: SparkSession, dir: String,
                       queryName: String = "graft_sliding"): DataFrame = {
    val schema = eventStreamSchema(spark, dir, Some("events.parquet"))
    val stream = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts_ns", tsNs(schema))
      .withColumn("event_ts", timestamp_micros(expr("ts_ns div 1000")))
      .withWatermark("event_ts", "1 hour")
      .groupBy(window(col("event_ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))
      .select(unix_timestamp(col("window.start")).as("win_epoch"),
        col("event_type"), col("n"), col("sum_v"))
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /**
   * LATE-DATA hourly rollup: the watermark path end-to-end (VERDICT r9
   * next #7). [[runHourlyStream]] runs `complete` mode, where the
   * watermark never drops anything — this variant runs APPEND mode
   * against a two-arrival staging of the fixture, so the output is
   * shaped by real watermark mechanics: finalized-window emission,
   * closed-window late DROPS, open-window late ACCEPTS.
   *
   * Construction (L = final hour with data, all integer-ns math):
   *  - arrival 1 ("on time"): hours [L-6h, L) except the held-back
   *    rows (hour L-2h, user_id % 5 == 0). Draining it sets the
   *    watermark to maxTs(arrival1) - 1h — inside hour L-2h.
   *  - arrival 2 ("late"): everything else — rows older than L-6h
   *    (their windows closed: DROPPED), the held-back L-2h rows
   *    (window still open: ACCEPTED), and hour L (accepted, but its
   *    window never finalizes before the stream ends).
   * Stream end: watermark = maxTs - 1h (inside hour L), so exactly the
   * windows through L-2h have been emitted. Net: the sink holds the
   * rollup of ALL events in hours [L-6h, L-2h] — nothing else — which
   * is what the oracle SQL states, and every wrong watermark behavior
   * (dropping the accepted-late rows, keeping the closed-window ones,
   * emitting unfinalized windows) breaks the hash.
   *
   * Both AvailableNow drains share one checkpoint + parquet sink (the
   * restart-resume contract); results are read back from the sink.
   */
  def runHourlyLateStream(spark: SparkSession, dir: String, work: String): DataFrame = {
    val hourNs = 3600L * 1000000000L
    val ev = graft.core.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("ts_ns"))
    val maxNs = ev.agg(max("ts_ns")).head().getLong(0)
    val lHour = maxNs / hourNs * hourNs
    val hcol = expr(s"ts_ns div $hourNs") * hourNs
    val holdback = (hcol === lHour - 2 * hourNs) && (col("user_id") % 5 === 0)
    val onTime = (hcol >= lHour - 6 * hourNs) && (hcol < lHour) && !holdback
    // CONSTRUCTION PRECONDITION (review-pass r10 #2): the whole
    // "closed windows drop lates / hour L-2h stays open" invariant
    // needs arrival 1's max event to land in hour L-1h — then the
    // drain-1 watermark sits inside hour L-2h, below every old
    // window's end and above none of the held-back hour's. A sparse
    // fixture (no on-time rows in hour L-1h) would silently ACCEPT
    // old lates instead; fail loudly so the oracle can never drift.
    val maxOnTimeRow = ev.where(onTime).agg(max("ts_ns")).head()
    require(!maxOnTimeRow.isNullAt(0) &&
        maxOnTimeRow.getLong(0) / hourNs == maxNs / hourNs - 1,
      s"graft: late-stream construction needs on-time data in the hour before " +
        s"the final hour (fixture gap: max on-time hour " +
        s"${if (maxOnTimeRow.isNullAt(0)) "NONE" else (maxOnTimeRow.getLong(0) / hourNs).toString}, " +
        s"final hour ${maxNs / hourNs})")
    // Symmetric boundary edge (ADVICE r10 #4): if maxTs sat EXACTLY on
    // an hour boundary, the drain-2 watermark would equal the end of
    // window [L-2h, L-1h) and its finalization would hinge on Spark's
    // >=-vs-> watermark comparison — which the closed-form oracle does
    // not model. Measure-zero with ns-resolution fixtures, but assert
    // it so an aligned fixture fails loudly instead of hash-flaking.
    require(maxNs % hourNs != 0L,
      s"graft: late-stream construction needs maxTs off the hour boundary " +
        s"(maxTs $maxNs is exactly hour ${maxNs / hourNs})")
    val staging = s"$work/staging"
    val out = s"$work/out"
    val ckpt = s"$work/ckpt"
    def drain(): Unit = {
      val schema = spark.read.parquet(staging).schema
      val q = spark.readStream.schema(schema).parquet(staging)
        .withColumn("event_ts", timestamp_micros(expr("ts_ns div 1000")))
        .withWatermark("event_ts", "1 hour")
        .groupBy(window(col("event_ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))
        .select(unix_timestamp(col("window.start")).as("hour_epoch"),
          col("event_type"), col("n"), col("sum_v"))
        .writeStream.outputMode("append").format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    ev.where(onTime).coalesce(1).write.parquet(staging)
    drain()
    ev.where(!onTime).coalesce(1).write.mode("append").parquet(staging)
    drain()
    spark.read.parquet(out)
  }
}
