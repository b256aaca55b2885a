package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event record for typed streaming state (mirrors the `events` table). */
case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                 event_type: String, value: Double)

/** A closed user session emitted by the streaming sessionizer. */
case class Session(user_id: Long, session_start: Timestamp, session_end: Timestamp,
                   n_events: Long, total_value: Double)

private case class SessionState(start: Long, last: Long, n: Long, total: Double)

/** A purchase matched to the latest view at-or-before it. */
case class AsofMatch(user_id: Long, purchase_id: Long, view_id: Long)

/** A watermark-sealed (user, day) activity mark: `retained` = the user
  * was also active the next day. `day` is the day start (a plain data
  * column); `sealed_at` is the event-time column — the global watermark
  * at the moment of sealing, i.e. the FRONTIER, so downstream stateful
  * consumers never see it as late. */
case class RetentionMark(user_id: Long, day: Timestamp, sealed_at: Timestamp,
                         retained: Boolean)

/** Per-user retention state: open (not yet sealed) distinct active days
  * as epoch-day numbers. */
private case class RetentionState(days: List[Long])

/** A user's current funnel stage flags (monotone — flags only turn on). */
case class FunnelFlags(user_id: Long, saw_view: Boolean, saw_click: Boolean,
                       saw_purchase: Boolean)

/** Per-user as-of state: retained views and watermark-pending purchases,
  * both as (eventTimeUs, eventId). */
private case class AsofState(views: List[(Long, Long)], pending: List[(Long, Long)])

/** A CLOSED SCD-2 version: [valid_from, valid_to) with the event that
  * opened it. The open (current) version lives only in state. */
case class Scd2Version(user_id: Long, event_id: Long, value: Double,
                       valid_from: Timestamp, valid_to: Timestamp)

/** Per-user SCD-2 state: the open version (openTsUs, eventId, value) if
  * any, plus buffered in-horizon change events (tsUs, eventId, value). */
private case class Scd2State(open: Option[(Long, Long, Double)],
                             pending: List[(Long, Long, Double)])

/** An adjacent within-session event-type transition, sealed by the
  * watermark (the streaming face of `ev_transitions`' pair stream). */
case class Transition(user_id: Long, src: String, dst: String, ts: Timestamp)

/** One smoothed reading of the purchase stream (the `ev_ewma` point). */
case class EwmaPoint(event_id: Long, user_id: Long, ewma: Double)

/** Per-user EWMA state: the last ≤ 7 SEALED purchase values
  * (most-recent first) plus buffered in-horizon events
  * (tsUs, eventId, value). */
private case class EwmaState(hist: List[Double],
                             pending: List[(Long, Long, Double)])

/** One Holt level+trend forecast of the purchase stream (the `ev_holt`
  * point — ×4⁸-scaled integer over cents, the batch key's exact unit). */
case class HoltPoint(event_id: Long, user_id: Long, holt_x64k: Long)

/** Per-user Holt state: the last ≤ 7 SEALED purchase values in exact
  * integer CENTS (most-recent first) plus buffered in-horizon events
  * (tsUs, eventId, cents). */
private case class HoltState(hist: List[Long],
                             pending: List[(Long, Long, Long)])

/** Per-user transition state: the last SEALED event (tsUs, type) if its
  * session can still continue, plus buffered in-horizon events
  * (tsUs, eventId, type). */
private case class TransState(last: Option[(Long, String)],
                              pending: List[(Long, Long, String)])

/** Structured Streaming twins of [[graft.operators.Events]] (SURVEY §2.6).
  *
  * The batch queries define the semantics; these run the same computations
  * incrementally: tumbling-window counts with a watermark, and a
  * `mapGroupsWithState` sessionizer with a processing-time-independent
  * event-time gap. At cluster scale both are classic keyed-state
  * streaming jobs: state lives in the state store partitioned by
  * user_id / window, and the watermark bounds state size.
  */
object EventStream {

  /** Gap in MICROSECONDS — the same exact-integer arithmetic as the
    * batch operator ([[graft.operators.Events.SessionGapUs]]); computing
    * in `Timestamp.getTime` millis would truncate the µs fraction and
    * diverge from batch on sub-millisecond data. */
  val SessionGapUs: Long = graft.operators.Events.SessionGapUs
  val WatermarkDelay = "1 hour"

  private def toMicros(t: Timestamp): Long =
    t.getTime * 1000 + (t.getNanos % 1000000) / 1000

  private def fromMicros(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000) * 1000)
    t.setNanos(Math.floorMod(us, 1000000).toInt * 1000)
    t
  }

  /** Tumbling hourly aggregates with watermark — streaming twin of
    * `Events.tumbling`. Works on any streaming DataFrame with
    * (ts, event_type, value). */
  def tumbling(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", WatermarkDelay)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("w.start").as("bucket"), col("event_type"), col("n"), col("total"))

  /** Streaming OHLC bars — twin of `Events.ohlc` (same 5-min epoch-
    * aligned bars, same (ts, event_id) tie-break through `min_by`/
    * `max_by` selection aggregates). Selection aggregates carry one
    * candidate struct per (series, bar) of stream state — the same
    * combiner-shaped merge as batch, so a bar's open/close are
    * order-insensitive across micro-batches and the replayed stream
    * converges bit-for-bit on the selection columns. */
  def ohlc(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", WatermarkDelay)
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        min_by(col("value"), struct(unix_micros(col("ts")), col("event_id"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), struct(unix_micros(col("ts")), col("event_id"))).as("close"),
        sum(col("value")).as("volume"))
      .select(col("w.start").as("bar_start"), col("event_type"),
        col("n"), col("open"), col("high"), col("low"), col("close"), col("volume"))

  /** Streaming CHANGELOG COMPACTION — twin of `Events.compact`: the
    * live upsert-state view a CDC sink maintains. State is ONE
    * selection-aggregate row per key (the snapshot's own cardinality —
    * deliberately no watermark eviction, because a snapshot never
    * expires; this is the documented unbounded-state operator, like a
    * production materialized upsert view). `max_by` over (µs, event_id)
    * merges commutatively and associatively, so the state is identical
    * under ANY micro-batch split of the changelog, and re-delivered
    * changes are absorbed by selection idempotence on the last-writer
    * columns. Tombstoned keys stay IN the state (last_type = 'error')
    * and filter at read — which is what lets a later re-insert revive
    * the key through the same merge instead of special-cased deletes. */
  def compact(events: DataFrame): DataFrame = {
    val ord = struct(col("us"), col("event_id"))
    events.select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"), col("value"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_changes"),
        max_by(col("event_type"), ord).as("last_type"),
        max_by(col("value"), ord).as("last_value"),
        max(col("us")).as("last_us"))
  }

  /** Streaming HOPPING (sliding) windows — twin of `Events.hopping`:
    * the built-in `window(ts, width, slide)` replicates each event into
    * width/slide = 2 overlapping windows map-side, exactly as in batch;
    * the watermark seals a window once it passes window end + delay. */
  def hopping(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", WatermarkDelay)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("w.start").as("win_start"), col("event_type"), col("n"), col("total"))

  /** Event-time sessionizer over a keyed stream: closes a session when the
    * gap to the next event exceeds 30 min (or on event-time timeout). */
  def sessionize(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", WatermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          var closed = List.empty[Session]
          var cur = state.getOption
          // deterministic in-batch order: micro-batches are unordered sets
          for (e <- batch.toSeq.sortBy(ev => (toMicros(ev.ts), ev.event_id))) {
            val t = toMicros(e.ts)
            cur match {
              case Some(s) if t - s.last > SessionGapUs =>
                closed ::= Session(userId, fromMicros(s.start), fromMicros(s.last),
                  s.n, s.total)
                cur = Some(SessionState(t, t, 1, e.value))
              case Some(s) =>
                cur = Some(SessionState(s.start, math.max(s.last, t), s.n + 1, s.total + e.value))
              case None =>
                cur = Some(SessionState(t, t, 1, e.value))
            }
          }
          cur match {
            case Some(s) if state.hasTimedOut =>
              state.remove()
              closed ::= Session(userId, fromMicros(s.start), fromMicros(s.last),
                s.n, s.total)
            case Some(s) =>
              state.update(s)
              // timeout is in millis; round up so it never fires early
              state.setTimeoutTimestamp(Math.floorDiv(s.last + SessionGapUs, 1000) + 1)
            case None => if (state.hasTimedOut) state.remove()
          }
          closed.reverseIterator
      }
  }

  /** Streaming AS-OF join — the incremental twin of
    * [[graft.operators.Events.asofAttribution]]: each purchase matched to
    * the LATEST view with view_ts <= purchase_ts per user (ties at equal
    * ts resolved view-first / max view event_id, same as batch).
    *
    * Why not a stream-stream join: as-of lookback is UNBOUNDED (the
    * matching view may be arbitrarily old), which a watermarked interval
    * join cannot express — its state eviction is exactly what as-of must
    * not do to old views. Keyed state can: per user we retain the single
    * latest view older than the watermark plus the in-horizon
    * views/purchases, so state is O(1) per user at any stream length.
    *
    * Correctness under out-of-order arrival: a purchase is emitted only
    * once the event-time watermark passes its timestamp — after that, any
    * view that could still change its match would be watermark-late. A
    * purchase with no view at-or-before it is dropped at flush, exactly
    * as batch drops unmatched purchases. Flush happens on the next batch
    * touching the user OR via event-time timeout (so quiet users still
    * emit). */
  def asof(events: Dataset[Event]): Dataset[AsofMatch] = {
    import events.sparkSession.implicits._
    events
      .where(col("event_type").isin("view", "purchase"))
      .withWatermark("ts", WatermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsofState, AsofMatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[AsofState]) =>
          val st = state.getOption.getOrElse(AsofState(Nil, Nil))
          var views = st.views
          var pending = st.pending
          for (e <- batch) {
            val t = toMicros(e.ts)
            if (e.event_type == "view") views = (t, e.event_id) :: views
            else pending = (t, e.event_id) :: pending
          }
          // batch semantics: one view per (user, ts), ties keep max id
          views = views.groupBy(_._1).map { case (t, vs) => (t, vs.map(_._2).max) }
            .toList.sortBy(_._1)
          val wmUs = state.getCurrentWatermarkMs() * 1000
          // flush purchases the watermark has sealed (ts < wm ⇒ any view
          // that could still match them would arrive late and be dropped)
          val (ripe, stillPending) = pending.partition(_._1 < wmUs)
          val out = ripe.sorted.flatMap { case (pts, pid) =>
            views.takeWhile(_._1 <= pts).lastOption
              .map { case (_, vid) => AsofMatch(userId, pid, vid) }
          }
          // prune views: future purchases have ts >= wm, so of the views
          // older than the horizon only the LATEST can ever be an answer
          val horizonUs = (wmUs :: stillPending.map(_._1)).min
          val (old, recent) = views.partition(_._1 < horizonUs)
          val kept = old.lastOption.toList ::: recent
          if (kept.isEmpty && stillPending.isEmpty) state.remove()
          else {
            state.update(AsofState(kept, stillPending))
            // wake this user when the watermark passes its oldest pending
            // purchase (ceil to ms so the timeout never fires early)
            if (stillPending.nonEmpty)
              state.setTimeoutTimestamp(
                Math.floorDiv(stillPending.map(_._1).min, 1000) + 1)
          }
          out.iterator
      }
  }

  /** Streaming SCD-2 — the CDC face of [[graft.operators.Events.scd2]]:
    * per-user keyed state tracks the OPEN version; each sealed change
    * event either closes it (value differs → emit the closed version,
    * open the new one) or compresses away (no-op update). A version
    * [t1, t2) is final exactly when the watermark passes t2 — no event
    * can land inside the interval anymore — so emissions are
    * append-mode-correct under out-of-order arrival; in-horizon events
    * buffer in state until sealed (event-time timeout wakes quiet
    * users). The open version never emits: it is the live dimension
    * row, still revisable (batch tags it `is_current` instead).
    *
    * State is O(1 + in-horizon changes) per user — the watermark bounds
    * the buffer, the open version is a single tuple. */
  def scd2(events: Dataset[Event]): Dataset[Scd2Version] = {
    import events.sparkSession.implicits._
    events
      .where(col("event_type") === "purchase")
      .withWatermark("ts", WatermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Scd2State, Scd2Version](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[Scd2State]) =>
          val st = state.getOption.getOrElse(Scd2State(None, Nil))
          val pending = st.pending ++
            batch.map(e => (toMicros(e.ts), e.event_id, e.value))
          val wmUs = state.getCurrentWatermarkMs() * 1000
          // events with ts < wm are sealed: nothing can precede them now
          val (ripe, still) = pending.partition(_._1 < wmUs)
          var open = st.open
          val out = List.newBuilder[Scd2Version]
          for (e <- ripe.sortBy(t => (t._1, t._2))) open match {
            case None => open = Some(e)
            case Some(o) if o._3 == e._3 => () // no-op update, compressed
            case Some(o) =>
              out += Scd2Version(userId, o._2, o._3,
                fromMicros(o._1), fromMicros(e._1))
              open = Some(e)
          }
          if (open.isEmpty && still.isEmpty) state.remove()
          else {
            state.update(Scd2State(open, still))
            if (still.nonEmpty) // wake when the oldest buffered event seals
              state.setTimeoutTimestamp(
                Math.floorDiv(still.map(_._1).min, 1000) + 1)
          }
          out.result().iterator
      }
  }

  /** Streaming EWMA — the keyed-state face of `ev_ewma`: per sealed
    * purchase event, the dyadic 8-term trailing EWMA of that user's
    * purchase values, bit-identical to the batch window form (each term
    * v·2^{-(j+1)} is an exact exponent shift, rounded at 10dp HALF_UP
    * into exact decimal, decimal-summed — the same arithmetic Spark's
    * `round` + DECIMAL(28,10) sum performs in the batch plan). Events
    * seal under the watermark and process in (ts, event_id) order, so
    * out-of-order arrival cannot reorder the smoothing kernel.
    *
    * State is O(1) per user — the last ≤ 7 sealed values plus the
    * in-horizon buffer — and that is the SEMANTIC minimum: EWMA has no
    * time horizon (the next purchase, whenever it arrives, still
    * discounts the previous seven), so unlike the sessionizer there is
    * nothing to evict; 7 doubles per ever-seen user is the state
    * floor. */
  def ewma(events: Dataset[Event]): Dataset[EwmaPoint] = {
    import events.sparkSession.implicits._
    events
      .filter(_.event_type == "purchase")
      .withWatermark("ts", WatermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[EwmaState, EwmaPoint](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[EwmaState]) =>
          val st = state.getOption.getOrElse(EwmaState(Nil, Nil))
          val pending = st.pending ++
            batch.map(e => (toMicros(e.ts), e.event_id, e.value))
          val wmUs = state.getCurrentWatermarkMs() * 1000
          val (ripe, still) = pending.partition(_._1 < wmUs)
          var hist = st.hist
          val out = List.newBuilder[EwmaPoint]
          for (e <- ripe.sortBy(t => (t._1, t._2))) {
            val vals = e._3 :: hist
            var acc = java.math.BigDecimal.ZERO
            // BigDecimal.valueOf (shortest-decimal, what Spark's Round
            // uses), NOT new BigDecimal(double) (exact binary expansion):
            // the two disagree at 10dp HALF_UP ties, so only valueOf
            // keeps the batch/stream bit-exactness general
            for ((v, j) <- vals.take(graft.operators.Events.EwmaLags).zipWithIndex)
              acc = acc.add(java.math.BigDecimal.valueOf(v * math.pow(0.5, j + 1))
                .setScale(10, java.math.RoundingMode.HALF_UP))
            out += EwmaPoint(e._2, userId, acc.doubleValue)
            hist = vals.take(graft.operators.Events.EwmaLags - 1)
          }
          if (still.isEmpty && hist.isEmpty) state.remove()
          else {
            state.update(EwmaState(hist, still))
            if (still.nonEmpty) // wake when the oldest buffered event seals
              state.setTimeoutTimestamp(
                Math.floorDiv(still.map(_._1).min, 1000) + 1)
          }
          out.result().iterator
      }
  }

  /** Streaming HOLT smoothing — the keyed-state face of `ev_holt`: per
    * sealed purchase event, the 8-lag level+trend forecast as a
    * ×4⁸-scaled INTEGER over exact cents — pure integer multiply-adds
    * against [[graft.operators.Events.HoltK]], so the batch/stream
    * equivalence is bit-exact by construction with no rounding
    * discipline needed at all (the `ev_ewma` twin one integer further:
    * EWMA needed the 10dp HALF_UP decimal-sum rules; Holt's all-integer
    * kernel has nothing to round). Cents via `BigDecimal.valueOf`
    * HALF_UP — Spark's own Round semantics, the EWMA-twin lesson.
    * Events seal under the watermark and process in (ts, event_id)
    * order; state is the semantic floor: the last ≤ 7 sealed cents
    * values per user plus the in-horizon buffer. */
  def holt(events: Dataset[Event]): Dataset[HoltPoint] = {
    import events.sparkSession.implicits._
    val K = graft.operators.Events.HoltK
    events
      .filter(_.event_type == "purchase")
      .withWatermark("ts", WatermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[HoltState, HoltPoint](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[HoltState]) =>
          val st = state.getOption.getOrElse(HoltState(Nil, Nil))
          val pending = st.pending ++ batch.map(e => (toMicros(e.ts), e.event_id,
            java.math.BigDecimal.valueOf(e.value * 100)
              .setScale(0, java.math.RoundingMode.HALF_UP).longValue))
          val wmUs = state.getCurrentWatermarkMs() * 1000
          val (ripe, still) = pending.partition(_._1 < wmUs)
          var hist = st.hist
          val out = List.newBuilder[HoltPoint]
          for (e <- ripe.sortBy(t => (t._1, t._2))) {
            val vals = e._3 :: hist
            var acc = 0L
            for ((v, j) <- vals.take(K.length).zipWithIndex) acc += K(j) * v
            out += HoltPoint(e._2, userId, acc)
            hist = vals.take(K.length - 1)
          }
          if (still.isEmpty && hist.isEmpty) state.remove()
          else {
            state.update(HoltState(hist, still))
            if (still.nonEmpty)
              state.setTimeoutTimestamp(
                Math.floorDiv(still.map(_._1).min, 1000) + 1)
          }
          out.result().iterator
      }
  }

  /** Streaming TRANSITION extraction — the keyed-state face of
    * `ev_transitions`: emits one [[Transition]] per adjacent
    * within-session event pair, sealed by the watermark so out-of-order
    * arrival cannot mis-pair (an event emits its transition only when
    * nothing can still land before it); downstream counting is an
    * ordinary streaming aggregation over the emitted pairs.
    *
    * State is O(1 + in-horizon events) per user, and SELF-EVICTING: the
    * last sealed event is dropped once the watermark moves a session gap
    * past it — any future acceptable event would start a new session
    * anyway (by then ts − last > gap), so eviction is semantics-exact,
    * and idle users leave NO residue (the event-time timeout fires the
    * eviction even with no further traffic). */
  def transitions(events: Dataset[Event]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", WatermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TransState, Transition](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[TransState]) =>
          val st = state.getOption.getOrElse(TransState(None, Nil))
          val pending = st.pending ++
            batch.map(e => (toMicros(e.ts), e.event_id, e.event_type))
          val wmUs = state.getCurrentWatermarkMs() * 1000
          val (ripe, still) = pending.partition(_._1 < wmUs)
          var last = st.last
          val out = List.newBuilder[Transition]
          for (e <- ripe.sortBy(t => (t._1, t._2))) {
            last match {
              case Some((lt, ls)) if e._1 - lt <= SessionGapUs =>
                out += Transition(userId, ls, e._3, fromMicros(e._1))
              case _ => () // session start — no incoming transition
            }
            last = Some((e._1, e._3))
          }
          // drop `last` once no acceptable future event can continue its
          // session; keep it (with a wake-up) while it could still pair
          val lastAlive = last.exists { case (lt, _) => wmUs - lt <= SessionGapUs }
          if (still.isEmpty && !lastAlive) state.remove()
          else {
            state.update(TransState(if (lastAlive) last else None, still))
            val wake =
              if (still.nonEmpty) still.map(_._1).min
              else last.get._1 + SessionGapUs
            state.setTimeoutTimestamp(Math.floorDiv(wake, 1000) + 1)
          }
          out.result().iterator
      }
  }

  /** Stream-stream interval join: attribute each purchase to every view
    * by the same user within the hour before it — the streaming twin of
    * [[graft.operators.Events.attribution]]. Both sides carry watermarks
    * so Spark bounds the join state: a buffered view can be dropped once
    * the purchase watermark passes view_ts + 1 h. */
  def attribution(views: DataFrame, purchases: DataFrame): DataFrame =
    views
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", WatermarkDelay)
      .join(
        purchases
          .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
            col("ts").as("purchase_ts"))
          .withWatermark("purchase_ts", WatermarkDelay),
        expr("""user_id = p_user AND view_ts <= purchase_ts
               |AND view_ts >= purchase_ts - INTERVAL 1 HOUR""".stripMargin))
      .select(col("user_id"), col("purchase_id"), col("view_id"),
        col("purchase_ts"), col("view_ts"))

  /** LEFT-OUTER stream-stream interval join — the streaming twin of
    * [[graft.operators.Events.attributionOuter]]: every purchase emits,
    * with NULL view columns once the watermark proves no qualifying view
    * can still arrive (an outer interval join requires exactly the state
    * bound the watermarks already give the inner form; the null side
    * emits on state eviction, so unmatched rows are late by the
    * watermark delay — the price of correctness under reordering). */
  def attributionOuter(views: DataFrame, purchases: DataFrame): DataFrame =
    purchases
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", WatermarkDelay)
      .join(
        views
          .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
            col("ts").as("view_ts"))
          .withWatermark("view_ts", WatermarkDelay),
        expr("""user_id = v_user AND view_ts <= purchase_ts
               |AND view_ts >= purchase_ts - INTERVAL 1 HOUR""".stripMargin),
        "leftOuter")
      .select(col("user_id"), col("purchase_id"), col("view_id"),
        col("purchase_ts"), col("view_ts"))

  /** CHAINED STATEFUL PIPELINE — a stream-stream LEFT-OUTER interval
    * join feeding a downstream event-time-windowed aggregation in ONE
    * query, the streaming twin of [[graft.operators.Events.intervalJoin]]
    * (`ev_interval`): every purchase × the same user's clicks from the
    * preceding 30 min, aggregated to per-purchase click count +
    * click-value total, zero-click purchases emitting (0, 0.0) once the
    * watermark proves no qualifying click can still arrive.
    *
    * Two stateful operators compose (Spark's multiple-stateful-operator
    * support): the join's buffered-row state evicts by the time-range
    * bound the analyzer derives from the predicate, and the aggregation
    * — keyed by (window(purchase_ts), user, purchase) so it seals on
    * the SAME event-time axis the join watermarks — emits append-mode
    * finals when the propagated watermark passes the window end. A
    * purchase has exactly ONE ts, so the window key adds no semantics;
    * it is the event-time handle a chained aggregation needs to be
    * sealable (a bare groupBy(purchase_id) can never close in append
    * mode). At cluster scale this is the canonical "enrich then
    * aggregate" streaming topology with both states watermark-bounded.
    *
    * The time predicate lives DIRECTLY on the watermarked timestamp
    * columns, interval literal derived from the batch constant —
    * the form the analyzer recognizes to bound join state; Timestamp
    * comparison is exact µs, the same arithmetic as the batch
    * operator's integer-µs predicate, so replay converges bit-exactly
    * (spec: EventStreamSpec). */
  def intervalCounts(clicks: DataFrame, purchases: DataFrame): DataFrame =
    purchases
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", WatermarkDelay)
      .join(
        clicks
          .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
            col("value"))
          .withWatermark("click_ts", WatermarkDelay),
        expr(s"""user_id = c_user AND click_ts < purchase_ts
                |AND click_ts >= purchase_ts
                |  - INTERVAL ${graft.operators.Events.IntervalUs} MICROSECOND"""
          .stripMargin),
        "leftOuter")
      .groupBy(window(col("purchase_ts"), "30 minutes"),
        col("user_id"), col("purchase_id"))
      .agg(count(col("click_ts")).as("n_clicks"),
        graft.operators.Compat.xsum(coalesce(col("value"), lit(0.0)))
          .as("click_value"))
      .select(col("user_id"), col("purchase_id"), col("n_clicks"),
        col("click_value"))

  private val DayMs = 24L * 3600 * 1000

  /** Streaming day-over-day retention MARKS — the stateful half of the
    * retention twin ([[graft.operators.Events.retention]]). Keyed state
    * per user holds the OPEN distinct active days; a day d seals once the
    * event-time watermark passes the start of d+2 (no event inside d+1
    * can still arrive), at which point `retained(d) = user also active
    * on d+1` is final. Out-of-order days within the watermark horizon
    * are handled by construction — a day only seals when its successor
    * day is complete. State is O(open days) per user, bounded by the
    * watermark horizon.
    *
    * Marks carry `sealed_at` = watermark-at-seal (+1 ms) as their event
    * time, NOT the day they describe: a sealed day is necessarily ≥2
    * days behind the watermark, and a single global watermark cannot
    * both drive the sealing and accept rows behind itself (min policy
    * deadlocks at epoch, max policy late-drops each batch's oldest
    * sealed day — both observed). Frontier-stamping makes the marks
    * never-late by construction. All of one day's marks seal in the
    * SAME micro-batch (data-active users inline, idle users via the
    * event-time timeout, which fires for every expired group), so all
    * share one `sealed_at`. */
  def retentionMarks(events: DataFrame): Dataset[RetentionMark] = {
    import events.sparkSession.implicits._
    events.select(col("user_id"), col("ts"))
      .withWatermark("ts", WatermarkDelay)
      .as[(Long, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[RetentionState, RetentionMark](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[(Long, Timestamp)], state: GroupState[RetentionState]) =>
          val prev = state.getOption.map(_.days).getOrElse(Nil)
          val days = (prev ++ batch.map(e => Math.floorDiv(e._2.getTime, DayMs)))
            .distinct.sorted
          val wmMs = state.getCurrentWatermarkMs()
          // day d is sealed once wm reaches the start of d+2
          val (closed, open) = days.partition(d => (d + 2) * DayMs <= wmMs)
          val out = closed.map(d =>
            RetentionMark(userId, new Timestamp(d * DayMs),
              new Timestamp(wmMs + 1), days.contains(d + 1)))
          if (open.isEmpty) state.remove()
          else {
            state.update(RetentionState(open))
            // wake when the oldest open day's successor completes. The
            // -1 ms matters: timeouts fire on wm > ts but sealing tests
            // wm ≥ boundary — at wm EXACTLY the boundary a data-silent
            // user would otherwise seal one batch later than data-active
            // ones, splitting that day across two sealed_at values (and
            // two output rows). Clamped above the current watermark,
            // which setTimeoutTimestamp requires; the clamp leaves a
            // residual 1 ms coincidence (wm hits boundary-1 then exactly
            // boundary in consecutive batches) that would again split a
            // day — EventStreamSpec's uniqueness assertion is the guard.
            state.setTimeoutTimestamp(
              math.max((open.min + 2) * DayMs - 1, wmMs + 1))
          }
          out.iterator
      }
  }

  /** Full streaming retention: the sealed marks rolled up per day with a
    * chained aggregation (two stateful operators). Grouping is by
    * (sealed_at, day): `sealed_at` is the never-late event-time column
    * that drives append-mode eviction, and since every mark of one day
    * shares one `sealed_at` (see [[retentionMarks]]), each day emits
    * EXACTLY one (day, active, retained) row — matching
    * [[graft.operators.Events.retention]] row-for-row on replay.
    *
    * Requires two query-lifetime confs (see EventStreamSpec):
    *  - `spark.sql.streaming.multipleWatermarkPolicy=max`: with the
    *    default min policy the fresh `sealed_at` watermark node starts
    *    at epoch and pins the global watermark there before any mark can
    *    flow — the upstream then never seals: a startup deadlock. Max
    *    policy lets the source watermark drive; frontier stamping is
    *    what makes that safe (marks are never behind it).
    *  - `spark.sql.streaming.statefulOperator.checkCorrectness
    *    .enabled=false`: Spark statically flags every
    *    flatMapGroupsWithState-then-aggregation chain; the hazard it
    *    guards against (rows behind the watermark discarded downstream)
    *    is designed out here by frontier stamping. */
  def retention(events: DataFrame): DataFrame =
    retentionMarks(events).toDF()
      .withWatermark("sealed_at", "1 hour")
      .groupBy(col("sealed_at"), col("day"))
      .agg(count(lit(1)).as("active"),
        count(when(col("retained"), 1)).as("retained"))
      .select(col("day"), col("active"), col("retained"))

  /** Streaming funnel stage machine — the incremental twin of
    * [[graft.operators.Events.funnel]]'s per-user flags. Keyed state
    * holds each user's monotone (view, click, purchase) flags and emits
    * the updated flags whenever they change (Update mode: funnel
    * membership is an all-time property, so there is no event-time seal
    * — the current counts are always revisable, exactly like the batch
    * query re-run on a growing table). State is three booleans per user;
    * the funnel counts are a stateless rollup of the latest flags
    * (`step_click` counts v∧c, etc.), verified replay-equal to batch in
    * EventStreamSpec. */
  def funnelFlags(events: Dataset[Event]): Dataset[FunnelFlags] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[FunnelFlags, FunnelFlags](GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[FunnelFlags]) =>
          var f = state.getOption.getOrElse(FunnelFlags(userId, false, false, false))
          for (e <- batch) e.event_type match {
            case "view"     => f = f.copy(saw_view = true)
            case "click"    => f = f.copy(saw_click = true)
            case "purchase" => f = f.copy(saw_purchase = true)
            case _          => ()
          }
          state.update(f)
          f
      }
  }

  /** Streaming exact deduplication: drop re-delivered events by
    * event_id — the streaming face of the dedup family for
    * at-least-once sources. `dropDuplicatesWithinWatermark` keys state
    * by event_id and evicts entries once the watermark passes, so state
    * stays bounded by the re-delivery horizon instead of growing with
    * the stream. */
  def dedupe(events: DataFrame): DataFrame =
    events.withWatermark("ts", WatermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Read the events parquet dir as a (bounded) file stream — the
    * readStream → transform → writeStream wiring used by integration
    * runs; the driver tables are static parquet so `maxFilesPerTrigger`
    * gives a deterministic bounded replay. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    // raw parquet schema carries ts as INT64 nanos (see Tables.events)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema
    // the table is a single parquet *file*; FileStreamSource wants a
    // directory, so stream the dir with a glob filter
    val s = spark.readStream
      .schema(rawSchema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    if (rawSchema("ts").dataType == org.apache.spark.sql.types.LongType)
      s.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else s
  }
}
