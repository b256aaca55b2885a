package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event/time-series analytics over the `events` table (SURVEY §2.6) —
  * the batch forms. Structured Streaming twins live in
  * [[graft.streaming.EventStream]]; these batch queries define the exact
  * semantics the streaming versions must converge to.
  *
  * Timestamp discipline: the parquet column is timestamp[ns]; Spark
  * truncates to µs on read, so oracles CAST to µs TIMESTAMP before
  * emitting raw timestamps. Second-level arithmetic uses epoch seconds
  * (floor) on both sides.
  *
  * Scale: sessionize is one shuffle on user_id + an in-partition sort —
  * the canonical "segment a keyed stream" shape; tumbling/funnel/retention
  * are single hash aggregations with map-side combine.
  */
object Events {
  import Compat._

  val SessionGapUs: Long = 1800L * 1000000L
  /** The same gap as an interval string — single source for
    * [[sessionizeSW]] so the three forms can never desync. */
  val SessionGapInterval: String = s"${SessionGapUs / 1000000L} seconds"

  /** Tumbling-window (hour) aggregates per event type. */
  def tumbling(ev: DataFrame): DataFrame =
    ev.groupBy(date_trunc("hour", col("ts")).as("bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"), xsum(col("value")).as("total"))
      .orderBy("bucket", "event_type")

  /** Sessionization: 30-min-gap sessions per user (lag + running sum).
    * Gap arithmetic in exact integer microseconds — identical in both
    * engines (no float epoch, no rounding-mode traps). */
  def sessionize(ev: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val us = unix_micros(col("ts"))
    // two selects: a window function may not nest inside another
    val flagged = ev.select(
      col("user_id"), col("event_id"), col("ts"), col("value"),
      when(us - lag(us, 1).over(byUser) > SessionGapUs || lag(us, 1).over(byUser).isNull, 1L)
        .otherwise(0L).as("is_new"))
    flagged.select(col("user_id"), col("ts"), col("value"),
        sum(col("is_new"))
          .over(Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("session_id"))
      .groupBy("user_id", "session_id")
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        xsum(col("value")).as("total_value"))
      .orderBy("user_id", "session_id")
  }

  /** Sessionization via Spark's BUILT-IN `session_window` — the
    * idiomatic form of [[sessionize]] (same 30-min gap, same output
    * minus the per-user session ordinal; `session_window.end` is
    * last-event-time + gap, so the true session end is end − gap).
    * Catalyst plans this as a single aggregation over merging session
    * windows — no window-function sort pass — and the identical
    * expression works under Structured Streaming. Both forms are kept:
    * this one for the plan, [[sessionize]] for the ordinal semantics. */
  def sessionizeSW(ev: DataFrame): DataFrame =
    ev.groupBy(col("user_id"), session_window(col("ts"), SessionGapInterval).as("sw"))
      .agg(count(lit(1)).as("n_events"), xsum(col("value")).as("total_value"))
      .select(col("user_id"),
        col("sw.start").as("session_start"),
        (col("sw.end") - expr(s"INTERVAL '$SessionGapInterval'")).as("session_end"),
        col("n_events"), col("total_value"))
      .orderBy("user_id", "session_start")

  /** Click-attribution interval join: every view within 1 h before a
    * purchase by the same user. Batch form of the stream-stream interval
    * join ([[graft.streaming.EventStream.attribution]]); at scale this is
    * one shuffle on user_id with the time predicate evaluated inside the
    * join — never a time-unbounded pairing. */
  def attribution(ev: DataFrame): DataFrame = {
    val v = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
    val p = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    v.join(p, col("user_id") === col("p_user") &&
        col("view_ts") <= col("purchase_ts") &&
        col("view_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("purchase_id"), col("view_id"),
        col("purchase_ts"), col("view_ts"))
      .orderBy("user_id", "purchase_id", "view_id")
  }

  /** LEFT-OUTER attribution: EVERY purchase, with its in-window views or
    * NULL — the form a revenue report needs (unattributed purchases must
    * not vanish). Same single user-keyed shuffle as [[attribution]];
    * the streaming twin ([[graft.streaming.EventStream.attributionOuter]])
    * is the watermarked outer interval join, whose null rows emit once
    * the watermark proves no view can still arrive. */
  def attributionOuter(ev: DataFrame): DataFrame = {
    val v = ev.where(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
    val p = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    p.join(v, col("user_id") === col("v_user") &&
        col("view_ts") <= col("purchase_ts") &&
        col("view_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"),
      "left_outer")
      .select(col("user_id"), col("purchase_id"), col("view_id"),
        col("purchase_ts"), col("view_ts"))
      .orderBy(col("user_id"), col("purchase_id"),
        col("view_id").asc_nulls_first)
  }

  /** AS-OF JOIN — an operator Spark lacks natively — composed the
    * scalable way: UNION both sides, one (key, time)-ordered window, and
    * `last(_, ignoreNulls)` carries the most recent left-side attribute
    * forward. One shuffle on the key, NO range fan-out (an interval-join
    * formulation explodes on wide gaps; this is O(n log n) regardless).
    * Semantics: each purchase matched to the latest view with
    * view_ts <= purchase_ts per user; views deduplicated per (user, ts)
    * by max event_id so ties are deterministic. Checked against DuckDB's
    * NATIVE `ASOF JOIN`. */
  def asofAttribution(ev: DataFrame): DataFrame = {
    val views = ev.where(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("view_id"))
      .select(col("user_id"), col("ts"), lit(0).as("side"), col("view_id"),
        lit(null).cast("long").as("purchase_id"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(1).as("side"),
        lit(null).cast("long").as("view_id"), col("event_id").as("purchase_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("side"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    views.unionAll(purchases)
      .withColumn("matched_view", last(col("view_id"), ignoreNulls = true).over(w))
      .where(col("side") === 1 && col("matched_view").isNotNull)
      .select(col("user_id"), col("purchase_id"), col("matched_view").as("view_id"))
      .orderBy("user_id", "purchase_id")
  }

  /** INTERVAL (range) join — the batch twin of a stream-stream windowed
    * join: every purchase meets the same user's clicks from the
    * preceding 30 minutes, emitting per-purchase click count and
    * click-value total (zero-click purchases kept).
    *
    * Scale shape — BINNED range join (r8): the naive plan shuffles on
    * user_id alone and evaluates the time predicate inside each matched
    * pair, Σ_user |P_u|·|C_u| — and a hot user makes that quadratic in
    * ONE task. Measured at 100× ([[graft.IntervalSkew]], one user
    * carrying 5% of 10 M events): 116 s plain, and AQE does NOT rescue
    * it (117.6 s) — AQE's skew split triggers on partition BYTES, and
    * the hot partition is a few MB of input exploding quadratically in
    * CPU, invisible to the byte heuristic. So the time dimension joins
    * the equi-key instead: clicks bucket at `cus div Interval`,
    * purchases replicate into their bucket and its predecessor (a
    * click in [pus−I, pus) lies in bucket `pus div I` or the one
    * before — two-replica cover, each pair matching exactly one
    * replica), and the exact µs predicate evaluates inside the
    * (user, bucket) groups. The hot user's one key becomes its ~1440
    * per-month buckets: same 9 s with or without the hot user, no AQE
    * needed (measured, same harness). Residual skew = one user hot
    * within one 30-min bucket — genuinely irreducible pair work, click
    * salting territory. Zero-click purchases rejoin via a left join of
    * the purchase-sized aggregate, and the decimal [[Compat.xsum]] is
    * order-independent, so the rewrite is result-identical to the
    * oracle's plain left join. Time is compared in exact integer µs on
    * both engines — no interval arithmetic to disagree over. */
  val IntervalUs: Long = 30L * 60 * 1000 * 1000

  def intervalJoin(ev: DataFrame): DataFrame = {
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        unix_micros(col("ts")).as("pus"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), unix_micros(col("ts")).as("cus"),
        col("value"))
    val pB = purchases.withColumn("pbkt",
      explode(array(expr(s"pus div $IntervalUs"), expr(s"pus div $IntervalUs - 1"))))
    val cB = clicks.withColumn("cbkt", expr(s"cus div $IntervalUs"))
    val matched = pB.join(cB,
        col("user_id") === col("c_user") && col("pbkt") === col("cbkt") &&
          col("cus") >= col("pus") - IntervalUs && col("cus") < col("pus"))
      .groupBy("user_id", "purchase_id")
      .agg(count(col("cus")).as("n_clicks"),
        Compat.xsum(col("value")).as("click_value"))
    purchases.select("user_id", "purchase_id")
      .join(matched, Seq("user_id", "purchase_id"), "left")
      .select(col("user_id"), col("purchase_id"),
        coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
        coalesce(col("click_value"), lit(0.0)).as("click_value"))
      .orderBy("user_id", "purchase_id")
  }

  /** OHLC bar width in µs (5 minutes). */
  val BarUs: Long = 5L * 60 * 1000 * 1000

  /** TIME-SERIES DOWNSAMPLING (`ev_ohlc`) — the resample operator every
    * metrics/trading pipeline runs: the raw event stream reduced to
    * per-(series, 5-min bar) OHLC rows — open/high/low/close of `value`,
    * event count, and exact-decimal volume. Series key = event_type.
    *
    * Scale shape: ONE partial-aggregatable shuffle. open/close are
    * `min_by`/`max_by` over the (µs, event_id) struct — selection
    * aggregates with combiner support, so each map task contributes one
    * candidate per (series, bar) and the reduce side merges candidates,
    * never re-sorting rows (the window-function formulation would sort
    * every event inside its bar; this never materializes an ordering).
    * 100 TB reading: output cardinality is series × time, INDEPENDENT of
    * input rows — the canonical raw→rollup compaction. Ties on ts break
    * by event_id via the struct's lexicographic order; the oracle
    * mirrors it with an order-equivalent zero-padded string key
    * (DuckDB's arg_min/arg_max take no struct ordering key — lpad'ed
    * fixed-width digits compare identically to the (us, event_id)
    * tuple for the non-negative domain both columns live in). */
  def ohlc(ev: DataFrame): DataFrame = {
    val us = unix_micros(col("ts"))
    ev.select(col("event_type"), expr(s"unix_micros(ts) div $BarUs").as("bkt"), us.as("us"),
        col("event_id"), col("value"))
      .groupBy("event_type", "bkt")
      .agg(
        count(lit(1)).as("n"),
        min_by(col("value"), struct(col("us"), col("event_id"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), struct(col("us"), col("event_id"))).as("close"),
        Compat.xsum(col("value")).as("volume"))
      .select(col("event_type"),
        timestamp_micros(col("bkt") * BarUs).as("bar_start"),
        col("n"), col("open"), col("high"), col("low"), col("close"),
        col("volume"))
      .orderBy("event_type", "bar_start")
  }

  /** CHANGELOG COMPACTION / CDC APPLY (`ev_compact`) — the log→snapshot
    * materialization every lakehouse CDC sink runs (Debezium topic →
    * Delta/Iceberg table, Kafka log compaction): the event stream read
    * as a changelog keyed by user_id — `signup` INSERTs, `view`/`click`/
    * `purchase` UPSERT the value, `error` is a DELETE tombstone — and
    * compacted to the final snapshot: per surviving key, the
    * last-writer-wins row (change count, last op, last value, last
    * change time); a key whose LAST op is a tombstone is absent.
    *
    * Scale: this is deliberately NOT the window formulation (rank the
    * per-key history, keep rn=1 — a per-key sort at snapshot refresh).
    * Last-writer-wins is a SELECTION AGGREGATE: `max_by(x, (us,
    * event_id))` has combiner support and a commutative-associative
    * merge, so one hash shuffle carries |keys| states, partial
    * aggregation collapses hot keys map-side, and the identical state
    * merges incrementally across delta batches (the `q41_mergeagg`
    * algebra) or inside a streaming stateful operator — a snapshot
    * refresh touches |keys| + |delta| rows, never the log history.
    * Tie-break on equal timestamps by event_id via the struct's
    * lexicographic order; the oracle mirrors it with the ohlc
    * zero-padded string key. */
  def compact(ev: DataFrame): DataFrame = {
    val us = unix_micros(col("ts"))
    val ord = struct(col("us"), col("event_id"))
    ev.select(col("user_id"), col("event_id"), us.as("us"),
        col("event_type"), col("value"))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_changes"),
        max_by(col("event_type"), ord).as("last_type"),
        max_by(col("value"), ord).as("last_value"),
        max(col("us")).as("last_us"))
      .where(col("last_type") =!= "error")
      .orderBy("user_id")
  }

  /** windowFunnel window: every step within 1 h of the FIRST step. */
  val FunnelWindowUs: Long = 3600L * 1000 * 1000

  /** TIME-CONSTRAINED FUNNEL (`ev_winfunnel`) — the ClickHouse
    * `windowFunnel` semantic: a user reaches level k when an ordered
    * chain view ≤ click ≤ purchase exists with EVERY step inside
    * [[FunnelWindowUs]] of the chain's first event ([[funnel]] is the
    * unconstrained lifetime variant). Emitted per user: the maximum
    * level (0–3).
    *
    * The chain search is NOT a self-join (per-user event × event blows
    * up on hot users — the ev_interval lesson): level-3 existence
    * reduces to nested RUNNING MAXES on one (user, time)-ordered sort.
    * For a click c, the best chain head is the latest view in
    * [c−W, c]: `chv(c) = max view-ts ≤ c` (qualifying iff ≥ c−W); for
    * a purchase p, a full chain exists iff `max chv over clicks ≤ p`
    * is ≥ p−W (maximizing the head timestamp is optimal — any valid
    * chain's head can be replaced by a later qualifying one). Both
    * maxes ride the SAME window sort; ties order (ts, stage, event_id)
    * identically in both engines, so equal-timestamp chains resolve
    * deterministically. One user-keyed shuffle, zero fan-out. */
  def windowFunnel(ev: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id")
      .orderBy(col("us"), col("stage"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val staged = ev
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        when(col("event_type") === "view", 0)
          .when(col("event_type") === "click", 1)
          .otherwise(2).as("stage"))
    val chained = staged
      .withColumn("vmax", max(when(col("stage") === 0, col("us"))).over(w))
      .withColumn("chv", when(col("stage") === 1 &&
        col("vmax") >= col("us") - FunnelWindowUs, col("vmax")))
      .withColumn("cmax", max(col("chv")).over(w))
    chained.groupBy("user_id").agg(
        max(when(col("stage") === 0, 1).otherwise(0)).as("l1"),
        max(when(col("chv").isNotNull, 1).otherwise(0)).as("l2"),
        max(when(col("stage") === 2 &&
          col("cmax") >= col("us") - FunnelWindowUs, 1).otherwise(0)).as("l3"))
      // flags are monotone by construction (chv needs a view, cmax needs
      // a chv), so the level is their plain sum
      .select(col("user_id"), (col("l1") + col("l2") + col("l3")).cast("long").as("level"))
      .orderBy("user_id")
  }

  /** Funnel: users reaching each stage view → click → purchase. */
  def funnel(ev: DataFrame): DataFrame = {
    val perUser = ev.groupBy("user_id").agg(
      max(when(col("event_type") === "view", 1).otherwise(0)).as("v"),
      max(when(col("event_type") === "click", 1).otherwise(0)).as("c"),
      max(when(col("event_type") === "purchase", 1).otherwise(0)).as("p"))
    perUser.agg(
      count(when(col("v") === 1, 1)).as("step_view"),
      count(when(col("v") === 1 && col("c") === 1, 1)).as("step_click"),
      count(when(col("v") === 1 && col("c") === 1 && col("p") === 1, 1)).as("step_purchase"))
  }

  /** Day-over-day retention: active users per day and how many return
    * the next day. A user returns iff their NEXT distinct active day is
    * day+1, so `lead` over the one distinct (user, day) table replaces
    * the self-join — the final-adaptive-plan audit showed the join form
    * scanning and deduplicating events twice (no AQE exchange reuse
    * across self-join sides). One scan, one distinct, one same-keyed
    * window shuffle. */
  def retention(ev: DataFrame): DataFrame = {
    val days = ev.select(col("user_id"), date_trunc("day", col("ts")).as("day")).distinct()
    val w = Window.partitionBy("user_id").orderBy("day")
    days.withColumn("next_day", lead(col("day"), 1).over(w))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("active"),
        count(when(col("next_day") === col("day") + expr("INTERVAL 1 DAY"), 1))
          .as("retained"))
      .orderBy("day")
  }

  /** Gaps-and-islands: maximal runs of CONSECUTIVE active days per user
    * (the classic streak query — activity streaks, uptime islands).
    * Technique: over the distinct (user, day) table, `epoch_day −
    * row_number()` is constant exactly within a consecutive run, so one
    * window + one aggregation finds every island without a self-join.
    * Emits per user: active days, number of streaks, longest streak —
    * all-integer arithmetic, engine-exact.
    *
    * Scale: one distinct + one window + two aggregations, ALL keyed by
    * user_id — a single hash shuffle reused across every stage (the
    * day-level distinct pre-combines map-side). */
  def gaps(ev: DataFrame): DataFrame = {
    val days = ev.select(col("user_id"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date")).cast("long").as("d"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("d")
    days.withColumn("grp", col("d") - row_number().over(w))
      .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_streaks"), sum("len").as("n_days"),
        max("len").as("max_streak"))
      .orderBy("user_id")
  }

  /** Semi-structured extraction: parse the JSON `props` column with an
    * EXPLICIT schema (`from_json` — no inference scan, fully codegen'd;
    * schema-on-read is how a 100 TB event lake keeps raw payloads) and
    * aggregate the extracted field per event type. Malformed or missing
    * keys become NULL and are counted, not dropped — the
    * PERMISSIVE-mode contract.
    *
    * Oracle-equivalence contract: `props.k` is integer-valued where
    * present (the fixture generator writes `{"k": <int>}`). On that
    * domain `from_json('k BIGINT')` and DuckDB's
    * `CAST(json_extract_string(..) AS BIGINT)` agree exactly; they
    * diverge on NON-integer payloads (a quoted "12" nulls here but
    * coerces there, a fractional 1.5 nulls here but errors there), so a
    * lake with mixed-typed `k` needs a string-extract + typeof guard on
    * both sides instead. */
  def jsonExtract(ev: DataFrame): DataFrame =
    ev.select(col("event_type"),
        expr("from_json(props, 'k BIGINT').k").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("k").isNull.cast("long")).as("n_null_k"),
        sum("k").as("sum_k"), min("k").as("min_k"), max("k").as("max_k"))
      .orderBy("event_type")

  /** SCD-2 validity intervals — the event-sourced attribute timeline
    * (slowly-changing-dimension type 2): per user, each CHANGE in the
    * purchase value opens a version row [valid_from, valid_to), closed
    * by the next change, NULL valid_to = current. Consecutive
    * same-value events are compressed away first (the SCD2 no-op-update
    * rule, null-safe compare), then `lead` over the surviving versions
    * closes each interval — two windows on ONE user_id shuffle (the
    * compression filter preserves the hash partitioning, so the second
    * window adds a sort but no exchange).
    *
    * Scale: version counts are bounded by change frequency, not event
    * volume; everything is keyed by user_id end to end. */
  def scd2(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val changes = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("prev", lag(col("value"), 1).over(w))
      .where(col("prev").isNull || !(col("value") <=> col("prev")))
    changes
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("event_id"), col("value"),
        col("ts").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.cast("long").as("is_current"))
      .orderBy("user_id", "valid_from", "event_id")
  }

  /** Calendar GAP-FILL (time-series resample): per-user daily purchase
    * totals on a dense day spine from the user's first to last active
    * day, missing days forward-filled from the last observed value
    * (`last` ignoreNulls over an unbounded-preceding frame — the
    * standard LOCF shape) and flagged. Spine generation is per-user
    * `sequence(d0, d1, 1 day)` — map-side explode off the user's
    * 2-element min/max row, so the spine costs O(days) rows, never a
    * cross join against a global calendar.
    *
    * Scale: one user-keyed aggregate, one tiny per-user min/max, one
    * user-keyed window — a single hash partitioning reused end to end;
    * day totals are exact decimal sums (oracle discipline §4). */
  def fillDaily(ev: DataFrame): DataFrame = {
    val daily = ev.where(col("event_type") === "purchase")
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .agg(xsum(col("value")).as("day_total"))
    val spine = daily.groupBy("user_id")
      .agg(min("day").as("d0"), max("day").as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"), expr("INTERVAL 1 DAY"))).as("day"))
    val w = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // is_gap must test JOIN-KEY absence (the oracle's `d.day IS NULL`),
    // not day_total's nullness — a daily row with a NULL total (possible
    // if `value` were ever NULL on a purchase) is present, not a gap. A
    // non-null marker column makes the right side's absence testable
    // after the using-columns join merges the keys.
    spine.join(daily.withColumn("present", lit(1)), Seq("user_id", "day"), "left")
      .withColumn("filled", last(col("day_total"), ignoreNulls = true).over(w))
      .select(col("user_id"), col("day"), col("filled"),
        col("present").isNull.cast("long").as("is_gap"))
      .orderBy("user_id", "day")
  }

  /** Session-bounded Markov TRANSITION MATRIX — the journey-mining
    * aggregate next to [[topPaths]]: for every ordered pair of event
    * types (src → dst) that occur ADJACENTLY within a session (same gap
    * rule as [[sessionize]]), the transition count, the total
    * transitions leaving src, and the transition probability in ppm.
    * A transition exists exactly where an event is NOT a session start,
    * so no session ordinal is materialized — one lag window decides
    * adjacency.
    *
    * Cross-engine determinism: counts are integers; p_ppm is
    * floor(n·10⁶/n_src) where both factors are the SAME doubles in both
    * engines (one multiply, one divide, identical order), so the floor
    * is bit-identical.
    *
    * Scale: one user_id window shuffle (shared shape with sessionize),
    * then a count shuffle bounded by the TYPE-PAIR vocabulary — O(T²)
    * rows, independent of event volume; the n_src window runs over that
    * tiny aggregate. */
  def transitions(ev: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val us = unix_micros(col("ts"))
    val pairs = ev.select(
        col("event_type").as("dst"),
        lag(col("event_type"), 1).over(byUser).as("src"),
        (us - lag(us, 1).over(byUser)).as("gap"))
      .where(col("src").isNotNull && col("gap") <= SessionGapUs)
    pairs.groupBy("src", "dst").agg(count(lit(1)).as("n"))
      .withColumn("n_src", sum("n").over(Window.partitionBy("src")).cast("long"))
      .select(col("src"), col("dst"), col("n"), col("n_src"),
        floor(col("n") * lit(1000000.0) / col("n_src")).cast("long").as("p_ppm"))
      .orderBy("src", "dst")
  }

  /** Per-user daily ANOMALY detection — z-score outliers in EXACT
    * integer arithmetic (the data-quality / fraud-screen member of the
    * event family): a user's day total is anomalous when it sits more
    * than 2 population standard deviations from that user's own mean.
    * The test is evaluated division-free and float-free:
    * (n·x − S)² > 4·(n·Q − S²) over integer CENTS (z² > k² with μ=S/n,
    * σ²=(nQ−S²)/n², all denominators cleared) — engine-exact at any
    * partitioning, no NaN/zero-variance edge cases (σ=0 ⇒ rhs=0 ⇒ a
    * constant series is never anomalous; n=1 ⇒ both sides 0).
    *
    * Integer headroom: cents ≤ ~10⁸/user-day and ≤ ~10³ days/user keep
    * every product < 2⁶³; corpora beyond that switch both engines to
    * DECIMAL(38,0) on the same cleared-denominator test.
    *
    * Scale: two combiner-friendly aggregations — (user, day) then
    * (user) — and a user-keyed join back; the per-user stats frame is
    * O(users) and co-partitioned with the daily frame, so the join
    * reuses the second shuffle's partitioning. */
  def anomalies(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    // round(…, 0) BEFORE the long cast: explicit half-away-from-zero in
    // both engines (Spark decimal→long truncates, DuckDB's bare CAST
    // rounds — they agreed only because purchase values are cents-exact;
    // sub-cent data would have silently diverged the gate)
    val daily = ev.where(col("event_type") === "purchase")
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .agg(round(sum(col("value").cast(DecimalType(28, 10))) * 100, 0)
        .cast("long").as("xc"))
    val stats = daily.groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("xc").as("s"),
        sum(col("xc") * col("xc")).as("q"))
    val dev = daily("xc") * stats("n") - stats("s")
    daily.join(stats, "user_id")
      .select(col("user_id"), col("day"), col("xc").as("cents"),
        (dev * dev > lit(4L) * (stats("n") * stats("q") - stats("s") * stats("s")))
          .cast("long").as("is_anom"))
      .orderBy("user_id", "day")
  }

  val TopPaths = 20

  /** Top session PATHS — each session's ordered event-type sequence,
    * counted across all sessions (the journey-mining / n-gram shape a
    * product-analytics pipeline runs over clickstreams). Sessions use
    * the same gap rule as [[sessionize]]; within a session the path
    * orders by (ts, event_id) — event_id breaks timestamp ties, so the
    * string is deterministic across engines.
    *
    * Scale: the session window and the path aggregate share ONE
    * user_id hash partitioning; only (path, count) pairs — bounded by
    * the distinct-journey vocabulary, not the event volume — reach the
    * final count shuffle, and the top-k is a TakeOrdered, never a
    * global sort. */
  def topPaths(ev: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val us = unix_micros(col("ts"))
    val flagged = ev.select(
      col("user_id"), col("event_id"), col("ts"), col("event_type"),
      when(us - lag(us, 1).over(byUser) > SessionGapUs || lag(us, 1).over(byUser).isNull, 1L)
        .otherwise(0L).as("is_new"))
    val sessioned = flagged.select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
      sum(col("is_new"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .as("session_id"))
    sessioned.groupBy("user_id", "session_id")
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("ts"), col("event_id"), col("event_type")))),
          x => x.getField("event_type")), "->").as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(TopPaths)
  }

  /** The SAME as-of attribution through the NATIVE operator
    * (`ev_asof_native`) — graft's custom `LogicalPlan` + `SparkStrategy`
    * + `SparkPlan` ([[graft.plans.AsOfJoinNode]]): purchases as-of-join
    * the latest view at-or-before them, per user, as ONE streamed merge
    * pass over co-partitioned (user, time)-sorted children — no union
    * row inflation, no window state, and the output keeps the left
    * side's partitioning/ordering. Shares [[asofAttribution]]'s DuckDB
    * `ASOF JOIN` oracle, so native ≡ declarative is machine-checked
    * every round (the `dedup_simhash_native` pattern at whole-operator
    * granularity). Views pre-collapse to one row per (user, ts) — the
    * determinism contract all three formulations share. */
  def asofNative(ev: DataFrame): DataFrame = {
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts"))
    val views = ev.where(col("event_type") === "view")
      .groupBy(col("user_id").as("vuser"), col("ts").as("vts"))
      .agg(max(col("event_id")).as("view_id"))
    graft.plans.GraftPlans.asofJoin(
        purchases, views, key = ("user_id", "vuser"), time = ("ts", "vts"),
        payload = Seq("view_id"))
      .select(col("user_id"), col("purchase_id"), col("view_id"))
      .orderBy("user_id", "purchase_id")
  }

  /** The SAME interval aggregation through the NATIVE trailing-window
    * operator (`ev_interval_native`, [[graft.plans.IntervalAggNode]]):
    * per purchase, count + exact-decimal sum of the user's clicks in
    * the preceding 30 min, computed as a two-pointer sweep over
    * co-partitioned (user, time)-sorted streams — O(|L|+|R|) with
    * O(window-occupancy) state, NO pair materialization (both join
    * formulations evaluate per-pair predicates; §5c-r8 measured the
    * user-keyed form at 116 s under a hot user). Shares
    * [[intervalJoin]]'s plain-join DuckDB oracle → native ≡ declarative
    * machine-checked. */
  def intervalNative(ev: DataFrame): DataFrame = {
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        unix_micros(col("ts")).as("pus"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), unix_micros(col("ts")).as("cus"),
        col("value"))
    graft.plans.IntervalAggPlans.trailingAgg(purchases, clicks,
        key = ("user_id", "c_user"), time = ("pus", "cus"), valueCol = "value",
        windowUs = IntervalUs, nName = "n_clicks", totalName = "click_sum")
      .select(col("user_id"), col("purchase_id"), col("n_clicks"),
        col("click_sum").cast("double").as("click_value"))
      .orderBy("user_id", "purchase_id")
  }

  /** DWELL TIME (`ev_dwell`) — time-on-state per event type: for every
    * event that is NOT the last of its session (same gap rule as
    * [[sessionize]]), the dwell is the µs until the session's next
    * event; aggregated per event type as count, total µs, and mean µs
    * (floor — all-integer, engine-exact). The product-analytics
    * "time on page" metric; [[transitions]] is the same adjacency with
    * counts instead of durations.
    *
    * Scale: ONE user-keyed window (lead over (ts, event_id)) — the
    * sessionize shuffle shape — then a combiner-friendly aggregate
    * bounded by the type vocabulary. */
  def dwell(ev: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val us = unix_micros(col("ts"))
    ev.select(col("event_type"),
        (lead(us, 1).over(byUser) - us).as("gap"))
      .where(col("gap").isNotNull && col("gap") <= SessionGapUs)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("gap").as("total_us"))
      .select(col("event_type"), col("n"), col("total_us"),
        expr("total_us div n").as("mean_us"))
      .orderBy("event_type")
  }

  /** Hopping-window width / slide in µs (10 min sliding by 5). */
  val HopWidthUs: Long = 10L * 60 * 1000 * 1000
  val HopSlideUs: Long = 5L * 60 * 1000 * 1000

  /** HOPPING (sliding) window aggregates (`ev_hopping`) — the
    * overlapping-window counterpart of [[tumbling]], Spark's built-in
    * `window(ts, width, slide)`: per (window, event_type) count and
    * exact-decimal total, each event contributing to width/slide = 2
    * overlapping windows. The batch mirror of the Structured Streaming
    * sliding-window aggregation (same expression works under
    * `readStream` + watermark unchanged).
    *
    * Scale: the built-in plans the window membership as a map-side
    * explode with fan-out exactly width/slide (bounded, 2 here) feeding
    * ONE partial-aggregatable shuffle — output cardinality is
    * series × time like [[ohlc]], independent of input rows. The oracle
    * mirrors the alignment arithmetic in exact integer µs (windows
    * align to slide boundaries from the epoch, Spark's documented
    * origin), so bucket membership is engine-exact. */
  def hopping(ev: DataFrame): DataFrame =
    ev.groupBy(
        window(col("ts"), s"${HopWidthUs / 1000000L} seconds",
          s"${HopSlideUs / 1000000L} seconds").as("win"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), xsum(col("value")).as("total"))
      .select(col("win.start").as("win_start"), col("event_type"),
        col("n"), col("total"))
      .orderBy("win_start", "event_type")

  /** COHORT RETENTION (`ev_cohort`) — the signup-cohort triangle every
    * growth dashboard runs: users grouped by FIRST active ISO week
    * (their cohort), each later week's activity counted as
    * (cohort_week, week_offset, n_active) with the cohort's size and
    * retention in ppm. [[retention]] is the day-over-day special case;
    * this is the full matrix.
    *
    * Scale: one distinct on (user, week) — map-side combined, the only
    * event-volume-sized shuffle; the first-week aggregate and the
    * cohort join are both keyed by user_id (the distinct's partitioning
    * reused); the matrix aggregate is cohort-week × offset — calendar²
    * cardinality, independent of users. retention_ppm =
    * floor(n·10⁶/size) over identical doubles in both engines (the
    * [[transitions]] discipline). */
  def cohort(ev: DataFrame): DataFrame = {
    // deliberately NOT persisted: the (user, week) distinct feeds two
    // consumers, but caching it measured 2.51 s vs 1.86 s at 100× —
    // the re-scan is cheaper than cache materialization (same result
    // as the wc_triangles cache-boundary measurement)
    val weeks = ev.select(col("user_id"), date_trunc("week", col("ts")).as("week")).distinct()
    val firsts = weeks.groupBy("user_id").agg(min("week").as("cohort_week"))
    val cells = weeks.join(firsts, "user_id")
      .select(col("cohort_week"),
        expr("datediff(week, cohort_week) div 7").as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_active"))
    val sizes = cells.where(col("week_offset") === 0)
      .select(col("cohort_week"), col("n_active").as("cohort_size"))
    cells.join(sizes, "cohort_week")
      .select(col("cohort_week"), col("week_offset"), col("n_active"), col("cohort_size"),
        floor(col("n_active") * lit(1000000.0) / col("cohort_size")).cast("long")
          .as("retention_ppm"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Trailing window for [[rollingActive]], in days. */
  val RollingDays = 7

  /** ROLLING DISTINCT USERS (`ev_rolling`) — trailing-7-day active
    * users per calendar day (the WAU-by-day metric): for every day in
    * the data's range, how many distinct users were active in
    * [day−6, day].
    *
    * The naive formulation is a range join (day spine × user-activity,
    * `BETWEEN` predicate) — per-day re-scans of the activity table that
    * explode on a 100 TB stream. Here the window rides a BOUNDED
    * map-side explode instead: each distinct (user, day) emits the ≤7
    * target days it covers (`sequence(d, d+6)` — fan-out = window
    * length, never data-sized), one distinct collapses multi-active
    * users per target day, one count per day. The day spine (dense
    * calendar between global min/max, zero-coverage days kept as 0)
    * explodes off a 1-row min/max aggregate — O(calendar) rows in one
    * task, then a broadcast-sized left join.
    *
    * Scale: shuffles carry (user, day) pairs — users × days × 7 at
    * worst, never event volume; the per-day counts frame is
    * calendar-sized. The sketch-merging variant of the same rolling
    * window (per-day HLL registers max-merged across the trailing 7 —
    * no second distinct at all) is `ev_rolling_hll`. */
  /** Distinct (user, epoch-day) pairs — shared base of both rolling
    * variants. */
  private def userDays(ev: DataFrame): DataFrame =
    ev.select(col("user_id"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date")).cast("long").as("d"))
      .distinct()

  /** Dense epoch-day spine between the data's min and max day — a
    * 1-row aggregate exploded in one task, O(calendar) rows. */
  private def daySpine(ud: DataFrame): DataFrame =
    ud.agg(min("d").as("d0"), max("d").as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("t"))

  def rollingActive(ev: DataFrame): DataFrame = {
    val ud = userDays(ev)
    val counts = ud.select(col("user_id"),
        explode(sequence(col("d"), col("d") + (RollingDays - 1))).as("t"))
      .distinct()
      .groupBy("t").agg(count(lit(1)).as("active_7d"))
    daySpine(ud).join(counts, Seq("t"), "left")
      .select(timestamp_micros(col("t") * lit(86400000000L)).as("day"),
        coalesce(col("active_7d"), lit(0L)).as("active_7d"))
      .orderBy("day")
  }

  /** ROLLING DISTINCT USERS VIA MERGEABLE SKETCHES (`ev_rolling_hll`) —
    * the production form of [[rollingActive]] at 100 TB: per-day
    * HyperLogLog registers ([[Compat.Hll]] — the `q38_hll` discipline,
    * cross-engine bit-exact) built ONCE from the event stream, then any
    * trailing window answered by MAX-MERGING the daily registers —
    * max is associative, so a day's sketch folds into 7-day, 28-day, or
    * quarter windows without ever touching the events again (exact
    * distinct counts cannot be merged this way; that is the whole
    * point of sketching the window).
    *
    * Plan: one combiner-friendly (day, bucket) aggregation over the raw
    * stream (duplicates collapse map-side — same user hashes to the
    * same register, so no pre-distinct is needed), then ALL window work
    * is calendar-sized: the ×7 explode fans out days×256 register rows,
    * never user-days ([[rollingActive]]'s explode is user-volume-sized
    * AND needs a second distinct). Estimate and exact side by side with
    * rel_err, the q38_hll demo pattern — a production query drops the
    * exact branch and with it every user-volume shuffle past the
    * register build. Zero-coverage days emit 0.0 (raw HLL would read
    * α·m ≈ 185 on an empty register set — the documented
    * no-small-range-correction artifact, masked at the empty-set
    * boundary on both engines). */
  /** Per-day HLL registers (d, bucket, mx) from a raw event frame —
    * the mergeable daily sketch state. Exposed for the streaming
    * maintenance face ([[graft.streaming.RegisterStream]]): max is
    * commutative, associative, AND idempotent, so register folds are
    * safe under re-delivery and arbitrary batch splits. */
  def dailyRegisters(ev: DataFrame): DataFrame = {
    import Compat.Hll
    val h = Hll.hash("rhll:", col("user_id"))
    ev.select(
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date")).cast("long").as("d"),
        Hll.bucket(h).as("bucket"), Hll.rho(h).as("rho"))
      .groupBy("d", "bucket").agg(max("rho").as("mx"))
  }

  /** Trailing-[[RollingDays]] estimates (t, approx_7d) from a daily
    * register table — ALL calendar-sized work; any register store
    * (batch-built or stream-folded) plugs in. */
  def rollingApprox(daily: DataFrame): DataFrame = {
    import Compat.Hll
    daily
      .select(explode(sequence(col("d"), col("d") + (RollingDays - 1))).as("t"),
        col("bucket"), col("mx"))
      .groupBy("t", "bucket").agg(max("mx").as("mx"))
      .groupBy("t")
      .agg(sum(expr(Hll.TermSql)).as("sp"), count(lit(1)).as("nb"))
      .withColumn("z", col("sp") + (lit(Hll.M.toLong) - col("nb")) * lit(Hll.Pow))
      .select(col("t"), (lit(Hll.C) / col("z").cast("double")).as("approx_7d"))
  }

  def rollingActiveHll(ev: DataFrame): DataFrame = {
    val ud = userDays(ev)
    val sk = rollingApprox(dailyRegisters(ev))
    val exact = ud.select(col("user_id"),
        explode(sequence(col("d"), col("d") + (RollingDays - 1))).as("t"))
      .distinct()
      .groupBy("t").agg(count(lit(1)).as("exact_7d"))
    daySpine(ud)
      .join(sk, Seq("t"), "left").join(exact, Seq("t"), "left")
      .select(timestamp_micros(col("t") * lit(86400000000L)).as("day"),
        coalesce(col("approx_7d"), lit(0.0)).as("approx_7d"),
        coalesce(col("exact_7d"), lit(0L)).as("exact_7d"))
      .withColumn("rel_err",
        when(col("exact_7d") > 0,
          (col("approx_7d") - col("exact_7d").cast("double")) /
            col("exact_7d").cast("double")).otherwise(0.0))
      .orderBy("day")
  }

  /** Trailing RANGE-frame width in exact integer µs (1 hour). */
  val RangeFrameUs: Long = 3600L * 1000000L

  /** VALUE-RANGE window frames (`ev_rolling_range`, r10) — the
    * RANGE-frame member of the window family: every other window key in
    * the suite frames by ROW COUNT (`rowsBetween` — "the last 3
    * events"), but operational rolling metrics are defined over TIME
    * ("the last hour"), and on irregularly spaced streams the two
    * disagree everywhere: a burst packs 50 events into one ROWS-3 frame
    * hour, a quiet user's ROWS-3 frame spans days. Per event: count and
    * exact value-sum of the SAME user's events in the trailing hour,
    * computed with `rangeBetween(-3600s, 0)` over the epoch-µs ordering
    * — the frame is defined by the ORDER VALUE, so µs-tied events share
    * one frame that contains BOTH (the SQL-standard RANGE peer rule,
    * which no ROWS frame can express; spec pins it).
    *
    * Exactness: frame bounds compare exact integer µs; the frame is a
    * SET, so the decimal in-frame sum (the [[Compat.xsum]] discipline)
    * is order-free and engine-exact.
    *
    * Scale: ONE shuffle on user_id + an in-partition sort — the
    * sessionize shape; the RANGE frame evaluates with a sliding
    * two-pointer pass per partition in both engines (never quadratic);
    * a hot user is the known skew case and shatters with the same
    * salting/binning playbook as `ev_interval` (the batch key gates
    * semantics; `ev_interval`'s binned form is the measured hot-user
    * plan). */
  def rollingRange(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val w = Window.partitionBy("user_id").orderBy(col("us"))
      .rangeBetween(-RangeFrameUs, 0)
    ev.select(col("event_id"), col("user_id"), col("ts"), col("value"),
        unix_micros(col("ts")).as("us"))
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("val_1h",
        sum(col("value").cast(DecimalType(28, 10))).over(w)
          .cast(DecimalType(28, 2)).cast(DoubleType))
      .select(col("event_id"), col("user_id"), col("ts"), col("n_1h"), col("val_1h"))
      .orderBy("user_id", "ts", "event_id")
  }

  /** Residuals reported by the seasonal-decomposition key. */
  val SeasonalTopN = 50

  /** SEASONAL DECOMPOSITION + RESIDUAL ANOMALIES (`ev_seasonal`) — the
    * first thing an operational anomaly detector does with periodic
    * traffic: remove the hour-of-day PROFILE, then rank what the
    * profile cannot explain. Per (event_type, hour-of-day): the mean
    * value (the classical seasonal component at daily periodicity);
    * per event: residual = value − its cell's profile mean; output the
    * [[SeasonalTopN]] largest |residual| events — the spikes that are
    * anomalous GIVEN the hour, which a raw-value threshold (`ev_anomaly`)
    * misclassifies in both directions (a normal 3 pm peak flags; a
    * quiet-hour surge hides).
    *
    * Determinism: profile means go through exact integer cents
    * (round(value·100) — 2dp money, never boundary) summed as BIGINT,
    * ONE division by 100·n rounded at 6dp; the residual is one IEEE
    * subtraction of identical doubles rounded at 6dp; ranking compares
    * identical doubles, ties broken by event_id into a total order.
    *
    * Scale: the profile is ≤ types·24 rows — built with one
    * combiner-friendly shuffle and BROADCAST back to the event stream
    * (the map-side pattern: no second shuffle over events); the top-N
    * cut is TakeOrdered (per-partition heaps, never a global sort). */
  def seasonal(ev: DataFrame): DataFrame = {
    val cents = round(col("value") * 100, 0).cast("long")
    val keyed = ev.select(col("event_id"), col("event_type"), col("value"),
      hour(col("ts")).cast("long").as("hr"), cents.as("c"))
    val profile = keyed.groupBy("event_type", "hr")
      .agg(sum("c").as("sc"), count(lit(1)).as("n"))
      .select(col("event_type"), col("hr"),
        round(col("sc").cast("double") / (col("n") * 100), 6).as("mean_v"))
    keyed.join(broadcast(profile), Seq("event_type", "hr"))
      .select(col("event_id"), col("event_type"), col("hr"),
        round(col("value") - col("mean_v"), 6).as("residual"))
      .orderBy(abs(col("residual")).desc, col("event_id"))
      .limit(SeasonalTopN)
  }

  /** CUPED pre/post boundary — mid-corpus, so both periods are dense. */
  val CupedCutoff = "2024-01-16"

  /** CUPED-adjusted experiment readout (`ev_cuped`) — the
    * variance-reduction step every experimentation platform bolts onto
    * the plain A/B readout (Deng, Xu, Kohavi & Walker, WSDM 2013):
    * using each user's PRE-period spend as the covariate, the
    * post-period arm means adjust by θ·(pre-mean of the arm − global
    * pre-mean) with θ = cov(pre, post)/var(pre) — same expectation,
    * strictly lower variance when pre correlates with post. The key
    * completes the experimentation pair: `ev_abtest` gates the
    * division-free significance TEST, this gates the ESTIMATOR the
    * platform reports beside it.
    *
    * Cross-engine determinism (the `ev_markov2` discipline, extended
    * to second moments): values become exact integer CENTS up front
    * (round(value·100) — the corpus is 2dp money, never on a rounding
    * boundary); every sum and cross-moment (Σpre, Σpre², Σpre·post)
    * runs in exact DECIMAL(38,0) — n·Σ-form covariance/variance stay
    * exact integers (headroom: the products scale ~ n²·v², inside
    * DECIMAL(38) even at 10⁹ users of 10⁶-cent spend); each ratio is
    * then ONE decimal→double cast per operand (identical
    * round-to-nearest in both engines) + ONE IEEE division, rounded at
    * 6dp; θ-adjustment is a fixed subtract-multiply-subtract chain of
    * 6dp-rounded doubles, re-rounded at 6dp.
    *
    * Scale: one user_id-keyed aggregation builds (pre, post) — the
    * combiner collapses events map-side; the global moments are ONE
    * 5-column broadcast row; arms are a 2-group rollup. Nothing wider
    * than the user table ever shuffles. */
  def cuped(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val big = DecimalType(38, 0)
    val cut = lit(CupedCutoff).cast("timestamp")
    val cents = round(col("value") * 100, 0).cast("long")
    val users = ev.groupBy("user_id").agg(
      sum(when(col("ts") < cut, cents).otherwise(0L)).as("pre"),
      sum(when(col("ts") >= cut, cents).otherwise(0L)).as("post"))
    val g = users.agg(
      count(lit(1)).as("n"),
      sum(col("pre").cast(big)).as("sp"),
      sum(col("post").cast(big)).as("so"),
      sum(col("pre").cast(big) * col("pre")).as("spp"),
      sum(col("pre").cast(big) * col("post")).as("spo"))
    val gv = broadcast(g.select(
        col("n"),
        round(col("sp").cast(DoubleType) / col("n"), 6).as("mean_pre_all"),
        (col("n").cast(big) * col("spo") - col("sp") * col("so"))
          .cast(DoubleType).as("cov"),
        (col("n").cast(big) * col("spp") - col("sp") * col("sp"))
          .cast(DoubleType).as("vr"))
      .select(col("mean_pre_all"),
        when(col("vr") === 0.0, lit(0.0))
          .otherwise(round(col("cov") / col("vr"), 6)).as("theta")))
    users.groupBy((col("user_id") % 2).as("arm"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("pre").cast(big)).as("spa"),
        sum(col("post").cast(big)).as("soa"))
      .crossJoin(gv)
      .select(col("arm"), col("n_users"),
        round(col("soa").cast(DoubleType) / col("n_users"), 6).as("mean_post"),
        round(round(col("soa").cast(DoubleType) / col("n_users"), 6)
          - col("theta") * (round(col("spa").cast(DoubleType) / col("n_users"), 6)
            - col("mean_pre_all")), 6).as("mean_adj"),
        col("theta"))
      .orderBy("arm")
  }

  /** EWMA horizon: terms beyond [[EwmaLags]] events back are dropped
    * (their total weight is 2^-[[EwmaLags]] ≈ 0.4 %). */
  val EwmaLags = 8

  /** Trailing EWMA (`ev_ewma`) — exponentially-weighted moving average
    * of each user's purchase values, the smoothing filter operational
    * anomaly/trend detectors run before thresholding (vs
    * [[rollingRange]]'s uniform window: EWMA discounts by RECENCY, the
    * response every monitoring stack defaults to). The textbook form is
    * recursive (ewma ← α·x + (1−α)·ewma) — inexpressible as a window
    * without per-row sequential state; the gated form unrolls it to the
    * fixed [[EwmaLags]]-term kernel ewma_t = Σ_{j<8} 2^{-(j+1)}·x_{t−j}
    * (α = ½, zero-padded warm-up, tail mass dropped), which IS a
    * window — [[EwmaLags]] `lag`s over one (user, time) ordering.
    *
    * Exactness — why α = ½ and not 0.3: dyadic weights 2^{-(j+1)} are
    * exact doubles and multiplying by them only shifts the exponent, so
    * each term is ONE exact IEEE op; each term rounds at 10dp into
    * DECIMAL and the 8-term sum runs exact (the round-then-decimal-sum
    * discipline) — the whole trajectory is engine-bit-identical, which
    * a non-dyadic α cannot guarantee (its per-term product rounds
    * differently under fused-multiply orders).
    *
    * Scale: ONE shuffle on user_id + in-partition sort; the 8 lags
    * evaluate in a single window pass (no self-join), codegen'd; output
    * is the purchase sub-stream, never the full event table. */
  def ewma(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val terms = (0 until EwmaLags).map { j =>
      val src = if (j == 0) col("value") else lag(col("value"), j).over(w)
      // 2^-(j+1) is an exact double; the multiply is an exponent shift
      round(coalesce(src, lit(0.0)) * lit(math.pow(0.5, j + 1)), 10)
        .cast(DecimalType(28, 10))
    }
    ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withColumn("ewma",
        terms.reduce(_ + _).cast(DecimalType(28, 10)).cast(DoubleType))
      .select(col("event_id"), col("user_id"), col("ewma"))
      .orderBy("event_id")
  }

  /** Holt 8-lag kernel, ×65536 (= 4^8, the common denominator): with
    * α = β = ½ the state recursion s_t = A·s_{t−1} + g·x_t has
    * A = [[½,½],[−¼,¾]], g = [½,¼], forecast ŷ = l + b = h·s (h=[1,1]);
    * the x_{t−j} coefficient is h·Aʲ·g — an exact dyadic rational with
    * denominator 4^{j+1}, so scaling by 4^8 makes every coefficient an
    * exact INTEGER. Derived by exact integer matrix powers (A·4, g·4);
    * the j=3+ coefficients go negative — that is the trend term
    * extrapolating PAST the recent mean, the behavior that separates
    * Holt from EWMA (spec-pinned on a ramp). */
  val HoltK: Seq[Long] =
    Seq(49152L, 28672L, 11264L, -256L, -5952L, -7312L, -6164L, -4049L)

  /** HOLT LINEAR (double-exponential) smoothing (`ev_holt`, r11) — the
    * TREND-aware member of the smoothing family: [[ewma]] tracks level
    * only and lags behind any ramp; Holt (1957) carries (level, trend)
    * state and its one-step forecast l+b extrapolates — the default
    * upgrade every monitoring/forecasting stack makes when metrics
    * drift. Recursive form is window-inexpressible (per-row sequential
    * state); the gated form is the [[ewma]] move one order up: unroll
    * to the fixed [[EwmaLags]]-term kernel ŷ_t = Σ_j (k_j/4^8)·x_{t−j}
    * with [[HoltK]] the EXACT integer dyadic coefficients — and emit
    * the ×65536-scaled value as a pure INTEGER (cents in, scaled cents
    * out; the `ev_abtest` all-integer discipline): zero floats anywhere,
    * both engines bit-equal by construction. Zero-padded warm-up and
    * dropped tail mass exactly as [[ewma]] (the kernel IS the gated
    * object). Output (event_id, user_id, holt_x64k) over the purchase
    * sub-stream.
    *
    * Scale: ONE user_id shuffle + per-partition sort, 8 codegen'd lags
    * in a single window pass — the [[ewma]] class. */
  def holt(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val cents = round(col("value") * 100, 0).cast("long")
    val terms = HoltK.zipWithIndex.map { case (k, j) =>
      val src = if (j == 0) cents else lag(cents, j).over(w)
      coalesce(src, lit(0L)) * lit(k)
    }
    ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withColumn("holt_x64k", terms.reduce(_ + _))
      .select(col("event_id"), col("user_id"), col("holt_x64k"))
      .orderBy("event_id")
  }

  /** Two-step MARKOV transition matrix (`ev_markov2`) — P² of the
    * session-local event-type chain: for each (src, dst) type pair, the
    * probability of sitting at dst exactly TWO within-session steps
    * after src, p2(src,dst) = Σ_mid p(src,mid)·p(mid,dst), plus the
    * exact 2-step path count. Squaring the transition matrix is the
    * classic "where will the user be in k steps" product-analytics
    * question and the first iterate of the chain's power method — the
    * matrix-multiply-as-join-aggregate pattern at its smallest.
    *
    * Cross-engine determinism: path counts are exact integer products;
    * each probability term evaluates the pinned chain
    * `(10⁶·(n₁·n₂ as double)) / (d₁·d₂ as double)` rounded at 4dp into
    * DECIMAL FIRST, the mid-sum runs in exact decimal (the textrank
    * per-term-round-then-decimal-sum discipline), floor to ppm.
    * Integer headroom: counts here are event-bounded, so n₁·n₂ stays
    * well under 2⁵³; a corpus past that switches both engines to the
    * DECIMAL product (the `ev_anomaly` note).
    *
    * Scale: the 1-step matrix is TYPE-PAIR bounded (O(T²) rows,
    * independent of event volume — one user-keyed window shuffle + one
    * combiner count shuffle build it, shared shape with
    * [[transitions]]); the squaring self-join and the mid-sum run over
    * that tiny frame, so P² costs nothing more at 100 TB than at sf0.001. */
  def markov2(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val us = unix_micros(col("ts"))
    val m = ev.select(
        col("event_type").as("dst"),
        lag(col("event_type"), 1).over(byUser).as("src"),
        (us - lag(us, 1).over(byUser)).as("gap"))
      .where(col("src").isNotNull && col("gap") <= SessionGapUs)
      .groupBy("src", "dst").agg(count(lit(1)).as("n"))
      .withColumn("d", sum("n").over(Window.partitionBy("src")).cast("long"))
    val a = m.select(col("src"), col("dst").as("mid"),
      col("n").as("n1"), col("d").as("d1"))
    val b = m.select(col("src").as("mid"), col("dst"),
      col("n").as("n2"), col("d").as("d2"))
    val term = round(
      (lit(1000000.0) * (col("n1") * col("n2")).cast("double")) /
        (col("d1") * col("d2")).cast("double"), 4).cast(DecimalType(20, 4))
    a.join(b, "mid")
      .groupBy("src", "dst")
      .agg(sum(col("n1") * col("n2")).cast("long").as("n_paths"),
        floor(sum(term)).cast("long").as("p2_ppm"))
      .orderBy("src", "dst")
  }

  /** Session-sequence PATTERN MATCHING (`ev_seqmatch`) — the CEP /
    * `MATCH_RECOGNIZE` member of the event family (Flink CEP, Oracle/
    * Snowflake MATCH_RECOGNIZE, ClickHouse sequenceCount): each session's
    * event types encode as a string of initials (v/c/p/s/e — distinct by
    * construction) in (ts, event_id) order, and fixed regex patterns
    * count non-overlapping occurrences per session; per pattern, the
    * number of matching sessions and total match count. Patterns use
    * only constructs that parse identically in Java regex and RE2
    * (literals, character classes, `*`/`?`/`+` — the wc_grep argument),
    * and both engines share perl-style leftmost greedy semantics for
    * this class.
    *
    * Determinism: the session string is built from
    * `array_sort(collect_list(struct(us, event_id, ini)))` — sorted on
    * the same (us, event_id) total order the oracle's
    * `string_agg(... ORDER BY us, event_id)` uses, so collect_list's
    * arrival nondeterminism never reaches the output.
    *
    * Scale: ONE user-keyed shuffle (the sessionize shape); the groupBy
    * on (user_id, session_id) reuses the window's hash partitioning
    * (subset-key clustering, no second exchange); session strings are
    * session-length-bounded, the pattern fan-out is a constant ×4
    * map-side explode over the SESSIONS frame (already aggregated,
    * smaller than events), and the final aggregate is pattern-bounded.
    * A hot user costs its own row count — no pairwise shape anywhere. */
  val SeqPatterns: Seq[String] = Seq("e+", "pp", "se?v", "v[ce]*p")

  def seqMatch(ev: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val marked = ev
      .select(col("user_id"), col("event_id"),
        substring(col("event_type"), 1, 1).as("ini"),
        unix_micros(col("ts")).as("us"))
      .withColumn("is_new",
        when(col("us") - lag(col("us"), 1).over(byUser) > SessionGapUs ||
          lag(col("us"), 1).over(byUser).isNull, 1L).otherwise(0L))
      .withColumn("session_id", sum("is_new").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val seqs = marked.groupBy("user_id", "session_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("us"), col("event_id"), col("ini")))),
        x => x.getField("ini")), "").as("seq"))
    val counted = seqs.select(explode(array(SeqPatterns.map(p =>
      struct(lit(p).as("pattern"),
        regexp_count(col("seq"), lit(p)).as("matches"))): _*)).as("e"))
      .select(col("e.pattern").as("pattern"), col("e.matches").as("matches"))
    counted.groupBy("pattern")
      .agg(count(when(col("matches") > 0, 1)).as("sessions_matched"),
        sum("matches").cast("long").as("total_matches"))
      .orderBy("pattern")
  }

  /** PER-EVENT FEATURE ENGINEERING (`ev_features`) — the feature-store
    * backfill every ML training pipeline runs over behavioral logs
    * (lag / rolling / lifetime features, point-in-time correct): for
    * each purchase, the user's previous purchase value, µs since it
    * (−1 at the first), prior-purchase count, lifetime running spend,
    * and the trailing-3 purchase mean. Every feature uses ONLY rows
    * strictly BEFORE the event — the frames end at `1 PRECEDING`, which
    * is exactly the point-in-time-correctness rule (no target leakage)
    * a feature store enforces.
    *
    * Cross-engine determinism: gaps in exact integer µs; running spend
    * through the xsum decimal contract; the rolling mean is one pinned
    * chain (decimal sum → double ÷ double count, round 4dp).
    *
    * Scale: ONE user-keyed window shuffle carries ALL five features on
    * the same sort (the sessionize shape) — a feature-per-query
    * formulation would re-shuffle the log five times; bounded frames
    * (ROWS, not RANGE) keep per-row state O(frame). */
  def features(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val prior = w.rowsBetween(Window.unboundedPreceding, -1)
    val w3 = w.rowsBetween(-3, -1)
    val us = unix_micros(col("ts"))
    ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withColumn("prev_value", lag("value", 1).over(w))
      .withColumn("gap_us", coalesce(us - lag(us, 1).over(w), lit(-1L)))
      .withColumn("n_prior", (row_number().over(w) - 1).cast("long"))
      .withColumn("run_sum",
        coalesce(sum(col("value").cast(DecimalType(28, 10))).over(prior)
          .cast(DecimalType(28, 2)).cast("double"), lit(0.0)))
      .withColumn("avg3",
        when(count(lit(1)).over(w3) > 0,
          round(sum(col("value").cast(DecimalType(28, 10))).over(w3).cast("double")
            / count(lit(1)).over(w3).cast("double"), 4))
          .otherwise(0.0))
      .select("event_id", "user_id", "prev_value", "gap_us", "n_prior", "run_sum", "avg3")
      .orderBy("user_id", "event_id")
  }

  /** High-value-purchase conversion threshold for [[abTest]] — chosen
    * so the conversion is non-degenerate on the synthetic corpus
    * (neither ~0% nor ~100% of users). */
  val AbConvValue = 180.0
  /** z²·10⁴ at 95% two-sided (1.96² = 3.8415). */
  val AbZ2x10k = 38415L

  /** A/B TEST readout (`ev_abtest`) — the experimentation-platform
    * member of the event family: users split into two deterministic
    * arms (user_id parity), "conversion" = the user has a purchase
    * above [[AbConvValue]]; the readout is the pooled TWO-PROPORTION
    * z-test, evaluated DIVISION-FREE in exact integers (the
    * `ev_anomaly` discipline applied to the two-sample test):
    * z² = D²·N / (na·nb·X·(N−X)) with D = xa·nb − xb·na, X = xa+xb,
    * N = na+nb — so significance is the integer comparison
    * D²·N·10⁴ > [[AbZ2x10k]]·na·nb·X·(N−X), and z²·10⁶ is emitted by
    * exact integer floor-division. Products run in DECIMAL(38,0)
    * (DuckDB: HUGEINT): D² alone crosses 2⁶³ past ~10⁵ users/arm.
    * Degenerate corpora (X = 0 or X = N: zero variance) emit z² = 0,
    * not-significant — no division ever happens.
    *
    * Overflow guard (r9): worst-case num·10⁶ = D²·N·10⁶ ≤ N⁵·10⁶/16,
    * which crosses DECIMAL(38,0) near N ≈ 4.4·10⁶ users — and past it
    * non-ANSI Spark silently NULLs the product while DuckDB HUGEINT
    * raises, a SILENT cross-engine divergence. The readout therefore
    * `raise_error`s when N > [[AbMaxUsers]] (condition checked before
    * any product is consumed), and the DuckDB oracle carries the SAME
    * `error()` guard at the same N (r10 — before it, DuckDB only
    * raised at its natural HUGEINT overflow near 4.4 M users, so for
    * N in (4.0 M, 4.4 M] the engines disagreed on loud-vs-answer), so
    * both engines now fail LOUD at the same boundary by construction;
    * a platform-scale experiment past it reads out through
    * the same algebra at DECIMAL(38,6)-per-factor scaling or a
    * two-level aggregate, which this guard forces you to choose
    * consciously rather than ship a NULL readout.
    *
    * Scale: one combiner-friendly per-user aggregation (the shuffle),
    * one 2-row arm aggregate, one 1-row readout — the readout costs
    * the same at 100 TB as at sf0.001, which is the point: experiment
    * analysis is an aggregation problem, not a row problem. */
  /** N⁵·10⁶/16 < 10³⁸ ⇒ N ≤ 4·10⁶ keeps every product exact. */
  val AbMaxUsers = 4000000L

  def abTest(ev: DataFrame): DataFrame = abTest(ev, AbMaxUsers)

  /** SRM χ² threshold ×100: the standard sample-ratio-mismatch alarm
    * fires at p < 0.001 ⟺ χ²(1 df) > 10.83. */
  val SrmChi2x100 = 1083L

  /** SAMPLE RATIO MISMATCH check (`ev_srm`, r11) — the FIRST gate a
    * trustworthy experimentation platform runs, BEFORE any readout
    * (Fabijan et al. 2019; Kohavi's trustworthy-A/B rule: an arm-size
    * imbalance beyond randomization noise means the assignment or
    * logging pipeline is broken and `ev_abtest`/`ev_cuped` readouts
    * over the same data are garbage). For the 50/50 parity split the
    * χ² statistic with 1 df collapses to (na−nb)²/N — evaluated
    * DIVISION-FREE in exact integers (the `ev_abtest` discipline):
    * chi2_ppm = (na−nb)²·10⁶ div N by exact integer floor-division,
    * and the alarm is the integer comparison
    * (na−nb)²·100 > [[SrmChi2x100]]·N (χ² > 10.83 ⟺ p < 0.001, the
    * industry-standard SRM threshold — deliberately stricter than the
    * readout's α because a false SRM alarm only costs a re-check while
    * a missed one poisons every metric). Headroom: (na−nb)²·10⁶ ≤
    * N²·10⁶ < 2⁶³ for N < 3·10⁶ and the DECIMAL(38,0) form holds to
    * 10¹⁶ users — no guard needed at any real experiment size.
    *
    * Scale: one distinct-user aggregate (combiner-collapsed) and a
    * 2-group rollup — like the readout keys, SRM costs the same at
    * 100 TB as at sf0.001. */
  def srm(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val big = DecimalType(38, 0)
    val arms = ev.select("user_id").distinct()
      .groupBy((col("user_id") % 2).as("arm"))
      .agg(count(lit(1)).as("n"))
    arms.agg(
        coalesce(sum(when(col("arm") === 0, col("n"))), lit(0L)).cast("long").as("na"),
        coalesce(sum(when(col("arm") === 1, col("n"))), lit(0L)).cast("long").as("nb"))
      .withColumn("d", (col("na") - col("nb")).cast(big))
      .withColumn("nn", (col("na") + col("nb")).cast(big))
      .select(col("na"), col("nb"),
        when(col("nn") === 0, lit(0L))
          .otherwise(expr("(d * d * 1000000) div nn")).cast("long").as("chi2_ppm"),
        when(col("nn") === 0, lit(0L))
          .otherwise((col("d") * col("d") * lit(100L) >
            col("nn") * lit(SrmChi2x100)).cast("long")).as("srm_alarm"))
  }

  private[graft] def abTest(ev: DataFrame, maxUsers: Long): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val big = DecimalType(38, 0)
    val users = ev.groupBy("user_id")
      .agg(max(when(col("event_type") === "purchase" &&
        col("value") > AbConvValue, 1L).otherwise(0L)).as("conv"))
    val arms = users.groupBy((col("user_id") % 2).as("arm"))
      .agg(count(lit(1)).as("n"), sum("conv").as("x"))
    // coalesce: an arm the corpus never populated reads as (0, 0), so
    // the degenerate-variance short-circuit below handles it — without
    // this a single-arm corpus yields NULL algebra and a zero-divisor
    // ppm (which DuckDB raises on)
    val t = arms.agg(
      coalesce(sum(when(col("arm") === 0, col("n"))), lit(0L)).cast("long").as("na"),
      coalesce(sum(when(col("arm") === 0, col("x"))), lit(0L)).cast("long").as("xa"),
      coalesce(sum(when(col("arm") === 1, col("n"))), lit(0L)).cast("long").as("nb"),
      coalesce(sum(when(col("arm") === 1, col("x"))), lit(0L)).cast("long").as("xb"))
    t.withColumn("nn", (col("na") + col("nb")).cast(big))
      .withColumn("xx", (col("xa") + col("xb")).cast(big))
      .withColumn("d",
        col("xa").cast(big) * col("nb") - col("xb").cast(big) * col("na"))
      .withColumn("num", col("d") * col("d") * col("nn"))
      .withColumn("den",
        col("na").cast(big) * col("nb") * col("xx") * (col("nn") - col("xx")))
      .select(col("na"), col("xa"), col("nb"), col("xb"),
        when(col("na") === 0, lit(0L))
          .otherwise(expr("xa * 1000000 div na")).as("ca_ppm"),
        when(col("nb") === 0, lit(0L))
          .otherwise(expr("xb * 1000000 div nb")).as("cb_ppm"),
        when(col("den") === 0, lit(0L))
          // guard BEFORE consuming any product: past the headroom Spark's
          // non-ANSI decimal silently NULLs where DuckDB raises — fail
          // loud on both engines instead of diverging silently
          .when(col("nn") > lit(maxUsers).cast(big), raise_error(concat(
            lit(s"ev_abtest: user count exceeds exact-integer headroom ($maxUsers): "),
            col("nn").cast("string"))))
          .otherwise(expr("(num * 1000000) div den")).as("z2_ppm"),
        when(col("den") === 0, lit(0L))
          .otherwise((col("num") * lit(10000L) >
            col("den") * lit(AbZ2x10k)).cast("long")).as("is_sig"))
  }

  type Q = (SparkSession, String) => DataFrame
  val queries: Map[String, Q] = Map(
    "ev_scd2"       -> ((s, d) => scd2(Tables.events(s, d))),
    "ev_fill"       -> ((s, d) => fillDaily(Tables.events(s, d))),
    "ev_gaps"       -> ((s, d) => gaps(Tables.events(s, d))),
    "ev_json"       -> ((s, d) => jsonExtract(Tables.events(s, d))),
    "ev_tumbling"   -> ((s, d) => tumbling(Tables.events(s, d))),
    "ev_sessionize" -> ((s, d) => sessionize(Tables.events(s, d))),
    "ev_sessions_sw"-> ((s, d) => sessionizeSW(Tables.events(s, d))),
    "ev_funnel"     -> ((s, d) => funnel(Tables.events(s, d))),
    "ev_attribution"-> ((s, d) => attribution(Tables.events(s, d))),
    "ev_attr_outer" -> ((s, d) => attributionOuter(Tables.events(s, d))),
    "ev_asof"       -> ((s, d) => asofAttribution(Tables.events(s, d))),
    "ev_asof_native"-> ((s, d) => asofNative(Tables.events(s, d))),
    "ev_interval"   -> ((s, d) => intervalJoin(Tables.events(s, d))),
    "ev_interval_native" -> ((s, d) => intervalNative(Tables.events(s, d))),
    "ev_ohlc"       -> ((s, d) => ohlc(Tables.events(s, d))),
    "ev_compact"    -> ((s, d) => compact(Tables.events(s, d))),
    "ev_winfunnel"  -> ((s, d) => windowFunnel(Tables.events(s, d))),
    "ev_retention"  -> ((s, d) => retention(Tables.events(s, d))),
    "ev_paths"      -> ((s, d) => topPaths(Tables.events(s, d))),
    "ev_transitions"-> ((s, d) => transitions(Tables.events(s, d))),
    "ev_markov2"    -> ((s, d) => markov2(Tables.events(s, d))),
    "ev_seqmatch"   -> ((s, d) => seqMatch(Tables.events(s, d))),
    "ev_features"   -> ((s, d) => features(Tables.events(s, d))),
    "ev_abtest"     -> ((s, d) => abTest(Tables.events(s, d))),
    "ev_srm"        -> ((s, d) => srm(Tables.events(s, d))),
    "ev_anomaly"    -> ((s, d) => anomalies(Tables.events(s, d))),
    "ev_hopping"    -> ((s, d) => hopping(Tables.events(s, d))),
    "ev_cohort"     -> ((s, d) => cohort(Tables.events(s, d))),
    "ev_rolling"    -> ((s, d) => rollingActive(Tables.events(s, d))),
    "ev_rolling_range" -> ((s, d) => rollingRange(Tables.events(s, d))),
    "ev_ewma" -> ((s, d) => ewma(Tables.events(s, d))),
    "ev_holt" -> ((s, d) => holt(Tables.events(s, d))),
    "ev_cuped" -> ((s, d) => cuped(Tables.events(s, d))),
    "ev_seasonal" -> ((s, d) => seasonal(Tables.events(s, d))),
    "ev_rolling_hll"-> ((s, d) => rollingActiveHll(Tables.events(s, d))),
    "ev_dwell"      -> ((s, d) => dwell(Tables.events(s, d))),
  )

  /** Shared oracle inner query: per-event session_id via lag + running
    * sum, exact integer µs — used by both sessionize oracles so the
    * session semantics live in one place. */
  private val sessionedSql: String =
    s"""SELECT user_id, ts, value,
       |  CAST(SUM(is_new) OVER (PARTITION BY user_id
       |    ORDER BY CAST(ts AS TIMESTAMP), event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
       |FROM (
       |  SELECT user_id, event_id, ts, value,
       |    CASE WHEN prev_us IS NULL OR us - prev_us > $SessionGapUs
       |      THEN 1 ELSE 0 END AS is_new
       |  FROM (
       |    SELECT user_id, event_id, ts, value,
       |      epoch_us(CAST(ts AS TIMESTAMP)) AS us,
       |      lag(epoch_us(CAST(ts AS TIMESTAMP)), 1)
       |        OVER (PARTITION BY user_id
       |              ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_us
       |    FROM events) g) n""".stripMargin

  /** One oracle text for both interval formulations (binned range join
    * and the native trailing-window operator). */
  private val IntervalOracleSql: String =
    s"""SELECT p.user_id AS user_id, p.event_id AS purchase_id,
       |  count(c.cus) AS n_clicks,
       |  COALESCE(${Compat.osum("c.value")}, 0.0) AS click_value
       |FROM (SELECT user_id, event_id,
       |        epoch_us(CAST(ts AS TIMESTAMP)) AS pus
       |      FROM events WHERE event_type = 'purchase') p
       |LEFT JOIN (SELECT user_id AS c_user,
       |             epoch_us(CAST(ts AS TIMESTAMP)) AS cus, value
       |           FROM events WHERE event_type = 'click') c
       |  ON p.user_id = c.c_user
       |  AND c.cus >= p.pus - $IntervalUs AND c.cus < p.pus
       |GROUP BY p.user_id, p.event_id
       |ORDER BY user_id, purchase_id""".stripMargin

  /** One oracle text for both as-of formulations (declarative window
    * form and the native physical operator). */
  private val AsofOracleSql: String =
    """SELECT p.user_id AS user_id, p.event_id AS purchase_id,
      |  v.view_id AS view_id
      |FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events
      |      WHERE event_type = 'purchase') p
      |ASOF JOIN (SELECT user_id AS vuser, max(event_id) AS view_id,
      |             CAST(ts AS TIMESTAMP) AS vts
      |           FROM events WHERE event_type = 'view' GROUP BY user_id, ts) v
      |  ON p.user_id = v.vuser AND v.vts <= p.ts
      |ORDER BY user_id, purchase_id""".stripMargin

  val oracle: Map[String, String] = Map(
    // same nested running maxes on the same (ts, stage, event_id) order
    "ev_winfunnel" ->
      s"""WITH st AS (
         |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
         |    CASE event_type WHEN 'view' THEN 0 WHEN 'click' THEN 1 ELSE 2 END AS stage
         |  FROM events WHERE event_type IN ('view', 'click', 'purchase')),
         |ch AS (
         |  SELECT user_id, event_id, us, stage,
         |    max(CASE WHEN stage = 0 THEN us END) OVER win AS vmax
         |  FROM st WINDOW win AS (PARTITION BY user_id
         |    ORDER BY us, stage, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |ch2 AS (
         |  SELECT user_id, event_id, us, stage,
         |    CASE WHEN stage = 1 AND vmax >= us - $FunnelWindowUs
         |      THEN vmax END AS chv
         |  FROM ch),
         |ch3 AS (
         |  SELECT user_id, us, stage, chv,
         |    max(chv) OVER win AS cmax
         |  FROM ch2 WINDOW win AS (PARTITION BY user_id
         |    ORDER BY us, stage, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |SELECT user_id,
         |  CAST(max(CASE WHEN stage = 0 THEN 1 ELSE 0 END)
         |    + max(CASE WHEN chv IS NOT NULL THEN 1 ELSE 0 END)
         |    + max(CASE WHEN stage = 2 AND cmax >= us - $FunnelWindowUs
         |        THEN 1 ELSE 0 END) AS BIGINT) AS level
         |FROM ch3 GROUP BY user_id ORDER BY user_id""".stripMargin,
    // open/close tie-break: lpad'ed (us, event_id) string key is
    // order-equivalent to the Spark struct (both columns non-negative,
    // fixed width dominates lexicographic compare)
    // same last-writer-wins selection, arg_max over the ohlc string key
    "ev_compact" ->
      """SELECT user_id, count(*)::BIGINT AS n_changes,
        |  arg_max(event_type, k) AS last_type,
        |  arg_max(value, k) AS last_value,
        |  max(us) AS last_us
        |FROM (
        |  SELECT user_id, event_id, event_type, value,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |    lpad(epoch_us(CAST(ts AS TIMESTAMP))::VARCHAR, 17, '0')
        |      || lpad(event_id::VARCHAR, 12, '0') AS k
        |  FROM events) c
        |GROUP BY user_id
        |HAVING arg_max(event_type, k) != 'error'
        |ORDER BY user_id""".stripMargin,
    "ev_ohlc" ->
      s"""SELECT event_type, make_timestamp(bkt * $BarUs) AS bar_start,
         |  count(*)::BIGINT AS n,
         |  arg_min(value, lpad(us::VARCHAR, 17, '0') || lpad(event_id::VARCHAR, 12, '0')) AS open,
         |  max(value) AS high, min(value) AS low,
         |  arg_max(value, lpad(us::VARCHAR, 17, '0') || lpad(event_id::VARCHAR, 12, '0')) AS close,
         |  ${Compat.osum("value")} AS volume
         |FROM (
         |  SELECT event_type, event_id, value,
         |    epoch_us(CAST(ts AS TIMESTAMP)) AS us,
         |    epoch_us(CAST(ts AS TIMESTAMP)) // $BarUs AS bkt
         |  FROM events) b
         |GROUP BY event_type, bkt
         |ORDER BY event_type, bar_start""".stripMargin,
    "ev_paths" ->
      s"""WITH sess AS (
         |  SELECT user_id, event_id, ts, event_type,
         |    CAST(SUM(is_new) OVER (PARTITION BY user_id
         |      ORDER BY CAST(ts AS TIMESTAMP), event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
         |  FROM (
         |    SELECT user_id, event_id, ts, event_type,
         |      CASE WHEN prev_us IS NULL OR us - prev_us > $SessionGapUs
         |        THEN 1 ELSE 0 END AS is_new
         |    FROM (
         |      SELECT user_id, event_id, ts, event_type,
         |        epoch_us(CAST(ts AS TIMESTAMP)) AS us,
         |        lag(epoch_us(CAST(ts AS TIMESTAMP)), 1)
         |          OVER (PARTITION BY user_id
         |                ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_us
         |      FROM events) g) n),
         |paths AS (
         |  SELECT user_id, session_id,
         |    string_agg(event_type, '->'
         |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS path
         |  FROM sess GROUP BY user_id, session_id)
         |SELECT path, count(*) AS n_sessions FROM paths
         |GROUP BY path ORDER BY n_sessions DESC, path LIMIT $TopPaths""".stripMargin,
    "ev_gaps" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
        |  FROM events),
        |g AS (SELECT user_id, d,
        |        d - row_number() OVER (PARTITION BY user_id ORDER BY d) AS grp
        |      FROM days),
        |s AS (SELECT user_id, grp, count(*) AS len FROM g GROUP BY 1, 2)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_streaks,
        |  CAST(sum(len) AS BIGINT) AS n_days,
        |  CAST(max(len) AS BIGINT) AS max_streak
        |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin,
    "ev_json" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(count(*) - count(k) AS BIGINT) AS n_null_k,
        |  CAST(sum(k) AS BIGINT) AS sum_k,
        |  min(k) AS min_k, max(k) AS max_k
        |FROM (SELECT event_type,
        |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |      FROM events) t
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "ev_tumbling" ->
      s"""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket, event_type,
         |  count(*) AS n, ${osum("value")} AS total
         |FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin,
    "ev_sessionize" ->
      s"""SELECT user_id, session_id,
         |  CAST(min(ts) AS TIMESTAMP) AS session_start,
         |  CAST(max(ts) AS TIMESTAMP) AS session_end,
         |  count(*) AS n_events, ${osum("value")} AS total_value
         |FROM ($sessionedSql) s
         |GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,
    // same session semantics as ev_sessionize, keyed by start instead of
    // the ordinal (session_window has no per-user numbering)
    "ev_sessions_sw" ->
      s"""SELECT user_id,
         |  CAST(min(ts) AS TIMESTAMP) AS session_start,
         |  CAST(max(ts) AS TIMESTAMP) AS session_end,
         |  count(*) AS n_events, ${osum("value")} AS total_value
         |FROM ($sessionedSql) s
         |GROUP BY user_id, session_id ORDER BY user_id, session_start""".stripMargin,
    "ev_funnel" ->
      """SELECT
        |  count(CASE WHEN v = 1 THEN 1 END) AS step_view,
        |  count(CASE WHEN v = 1 AND c = 1 THEN 1 END) AS step_click,
        |  count(CASE WHEN v = 1 AND c = 1 AND p = 1 THEN 1 END) AS step_purchase
        |FROM (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
        |    max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
        |  FROM events GROUP BY user_id) u""".stripMargin,
    "ev_attribution" ->
      """SELECT v.user_id, p.pid AS purchase_id, v.vid AS view_id,
        |  CAST(p.pts AS TIMESTAMP) AS purchase_ts,
        |  CAST(v.vts AS TIMESTAMP) AS view_ts
        |FROM (SELECT user_id, event_id AS vid, CAST(ts AS TIMESTAMP) AS vts
        |      FROM events WHERE event_type = 'view') v
        |JOIN (SELECT user_id AS pu, event_id AS pid, CAST(ts AS TIMESTAMP) AS pts
        |      FROM events WHERE event_type = 'purchase') p
        |  ON v.user_id = p.pu AND v.vts <= p.pts
        |     AND v.vts >= p.pts - INTERVAL 1 HOUR
        |ORDER BY user_id, purchase_id, view_id""".stripMargin,
    "ev_attr_outer" ->
      """SELECT p.user_id, p.pid AS purchase_id, v.vid AS view_id,
        |  CAST(p.pts AS TIMESTAMP) AS purchase_ts,
        |  CAST(v.vts AS TIMESTAMP) AS view_ts
        |FROM (SELECT user_id, event_id AS pid, CAST(ts AS TIMESTAMP) AS pts
        |      FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT user_id AS vu, event_id AS vid, CAST(ts AS TIMESTAMP) AS vts
        |           FROM events WHERE event_type = 'view') v
        |  ON p.user_id = v.vu AND v.vts <= p.pts
        |     AND v.vts >= p.pts - INTERVAL 1 HOUR
        |ORDER BY user_id, purchase_id, view_id NULLS FIRST""".stripMargin,
    // DuckDB's NATIVE ASOF JOIN is the oracle for the composed
    // union-window as-of join
    "ev_asof" -> AsofOracleSql,
    // the native operator must be indistinguishable from the
    // declarative form — same oracle text, machine-checked each round
    "ev_asof_native" -> AsofOracleSql,
    "ev_interval" -> IntervalOracleSql,
    // the native trailing-window operator must be indistinguishable
    // from the binned-join form — same oracle text
    "ev_interval_native" -> IntervalOracleSql,
    "ev_scd2" ->
      """WITH p AS (
        |  SELECT user_id, ts, event_id, value FROM events
        |  WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, ts, event_id, value FROM (
        |    SELECT user_id, ts, event_id, value,
        |      lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |    FROM p) x
        |  WHERE prev IS NULL OR value IS DISTINCT FROM prev)
        |SELECT user_id, event_id, value,
        |  CAST(ts AS TIMESTAMP) AS valid_from,
        |  CAST(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS TIMESTAMP) AS valid_to,
        |  CAST(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS BIGINT) AS is_current
        |FROM c ORDER BY user_id, valid_from, event_id""".stripMargin,
    "ev_fill" ->
      s"""WITH daily AS (
         |  SELECT user_id, date_trunc('day', ts) AS day, ${osum("value")} AS day_total
         |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
         |spine AS (
         |  SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
         |  FROM (SELECT user_id, min(day) AS d0, max(day) AS d1
         |        FROM daily GROUP BY user_id) b)
         |SELECT s.user_id, CAST(s.day AS TIMESTAMP) AS day,
         |  last_value(d.day_total IGNORE NULLS) OVER (
         |    PARTITION BY s.user_id ORDER BY s.day ROWS UNBOUNDED PRECEDING) AS filled,
         |  CAST(d.day IS NULL AS BIGINT) AS is_gap
         |FROM spine s LEFT JOIN daily d ON d.user_id = s.user_id AND d.day = s.day
         |ORDER BY s.user_id, s.day""".stripMargin,
    "ev_transitions" ->
      s"""WITH tr AS (
         |  SELECT src, dst FROM (
         |    SELECT event_type AS dst,
         |      lag(event_type) OVER (PARTITION BY user_id
         |        ORDER BY CAST(ts AS TIMESTAMP), event_id) AS src,
         |      epoch_us(CAST(ts AS TIMESTAMP))
         |        - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (PARTITION BY user_id
         |            ORDER BY CAST(ts AS TIMESTAMP), event_id) AS gap
         |    FROM events) g
         |  WHERE src IS NOT NULL AND gap <= $SessionGapUs),
         |c AS (SELECT src, dst, count(*) AS n FROM tr GROUP BY src, dst)
         |SELECT src, dst, n,
         |  CAST(SUM(n) OVER (PARTITION BY src) AS BIGINT) AS n_src,
         |  CAST(floor(n * 1000000.0 / CAST(SUM(n) OVER (PARTITION BY src) AS BIGINT))
         |    AS BIGINT) AS p_ppm
         |FROM c ORDER BY src, dst""".stripMargin,
    "ev_anomaly" ->
      """WITH daily AS (
        |  SELECT user_id, date_trunc('day', ts) AS day,
        |    CAST(round(SUM(CAST(value AS DECIMAL(28,10))) * 100, 0) AS BIGINT) AS xc
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |st AS (
        |  SELECT user_id, count(*) AS n, CAST(sum(xc) AS BIGINT) AS s,
        |    CAST(sum(xc * xc) AS BIGINT) AS q
        |  FROM daily GROUP BY user_id)
        |SELECT d.user_id, CAST(d.day AS TIMESTAMP) AS day, d.xc AS cents,
        |  CAST((d.xc * st.n - st.s) * (d.xc * st.n - st.s)
        |       > 4 * (st.n * st.q - st.s * st.s) AS BIGINT) AS is_anom
        |FROM daily d JOIN st USING (user_id)
        |ORDER BY user_id, day""".stripMargin,
    "ev_retention" ->
      """SELECT CAST(d.day AS TIMESTAMP) AS day, count(*) AS active,
        |  count(n.next_day) AS retained
        |FROM (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events) d
        |LEFT OUTER JOIN
        |     (SELECT DISTINCT user_id, date_trunc('day', ts) AS next_day FROM events) n
        |  ON d.user_id = n.user_id AND n.next_day = d.day + INTERVAL 1 DAY
        |GROUP BY d.day ORDER BY day""".stripMargin,
    "ev_dwell" ->
      s"""SELECT event_type, count(*) AS n,
         |  CAST(sum(gap) AS BIGINT) AS total_us,
         |  CAST(sum(gap) AS BIGINT) // count(*) AS mean_us
         |FROM (
         |  SELECT event_type,
         |    lead(epoch_us(CAST(ts AS TIMESTAMP))) OVER
         |      (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
         |      - epoch_us(CAST(ts AS TIMESTAMP)) AS gap
         |  FROM events) g
         |WHERE gap IS NOT NULL AND gap <= $SessionGapUs
         |GROUP BY event_type ORDER BY event_type""".stripMargin,
    // window alignment mirrored in exact integer µs: starts aligned to
    // the slide from the epoch, one row per covering window (k = 0, 1)
    "ev_hopping" ->
      s"""SELECT make_timestamp(start_us) AS win_start, event_type,
         |  count(*) AS n, ${osum("value")} AS total
         |FROM (
         |  SELECT event_type, value,
         |    (epoch_us(CAST(ts AS TIMESTAMP)) // $HopSlideUs) * $HopSlideUs
         |      - k.k * $HopSlideUs AS start_us
         |  FROM events, (VALUES (CAST(0 AS BIGINT)), (CAST(1 AS BIGINT))) k(k)) t
         |GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,
    "ev_cohort" ->
      """WITH uw AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events),
        |f AS (SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY 1),
        |j AS (SELECT f.cohort_week,
        |        date_diff('day', f.cohort_week, uw.week) // 7 AS week_offset
        |      FROM uw JOIN f ON uw.user_id = f.user_id),
        |c AS (SELECT cohort_week, week_offset, count(*) AS n_active FROM j GROUP BY 1, 2),
        |s AS (SELECT cohort_week, n_active AS cohort_size FROM c WHERE week_offset = 0)
        |SELECT CAST(c.cohort_week AS TIMESTAMP) AS cohort_week, c.week_offset,
        |  c.n_active, s.cohort_size,
        |  CAST(floor(c.n_active * 1000000.0 / s.cohort_size) AS BIGINT) AS retention_ppm
        |FROM c JOIN s USING (cohort_week)
        |ORDER BY cohort_week, week_offset""".stripMargin,
    // RANGE (value-based) frame over exact epoch µs — µs-tied events are
    // RANGE peers and share one frame on both engines; in-frame sum is
    // the xsum decimal discipline (a set, so order-free)
    "ev_rolling_range" ->
      s"""SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
         |  count(*) OVER w AS n_1h,
         |  CAST(ROUND(SUM(CAST(value AS DECIMAL(28,10))) OVER w, 2) AS DOUBLE) AS val_1h
         |FROM events
         |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
         |  RANGE BETWEEN $RangeFrameUs PRECEDING AND CURRENT ROW)
         |ORDER BY user_id, ts, event_id""".stripMargin,
    // the same cents-exact profile, one 6dp division per cell, one 6dp
    // residual subtraction, (|residual| desc, event_id) total order
    "ev_seasonal" ->
      s"""WITH keyed AS (
         |  SELECT event_id, event_type, value,
         |    hour(CAST(ts AS TIMESTAMP)) AS hr,
         |    CAST(round(value * 100, 0) AS BIGINT) AS c
         |  FROM events),
         |profile AS (
         |  SELECT event_type, hr,
         |    round(CAST(sum(c) AS DOUBLE) / (count(*) * 100), 6) AS mean_v
         |  FROM keyed GROUP BY 1, 2)
         |SELECT k.event_id, k.event_type, k.hr,
         |  round(k.value - p.mean_v, 6) AS residual
         |FROM keyed k JOIN profile p USING (event_type, hr)
         |ORDER BY abs(round(k.value - p.mean_v, 6)) DESC, k.event_id
         |LIMIT $SeasonalTopN""".stripMargin,
    // exact-cents moments in DECIMAL(38,0), one cast+divide+round(6)
    // per ratio, the same fixed θ-adjustment chain — mirrors cuped()
    "ev_cuped" ->
      s"""WITH cents AS (
         |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
         |    CAST(round(value * 100, 0) AS BIGINT) AS c
         |  FROM events),
         |users AS (
         |  SELECT user_id,
         |    CAST(sum(CASE WHEN ts < TIMESTAMP '$CupedCutoff' THEN c ELSE 0 END) AS BIGINT) AS pre,
         |    CAST(sum(CASE WHEN ts >= TIMESTAMP '$CupedCutoff' THEN c ELSE 0 END) AS BIGINT) AS post
         |  FROM cents GROUP BY 1),
         |g AS (
         |  SELECT count(*) AS n,
         |    sum(CAST(pre AS DECIMAL(38,0))) AS sp,
         |    sum(CAST(post AS DECIMAL(38,0))) AS so,
         |    sum(CAST(pre AS DECIMAL(38,0)) * pre) AS spp,
         |    sum(CAST(pre AS DECIMAL(38,0)) * post) AS spo
         |  FROM users),
         |gv AS (
         |  SELECT round(CAST(sp AS DOUBLE) / n, 6) AS mean_pre_all,
         |    CASE WHEN CAST(n * spp - sp * sp AS DOUBLE) = 0 THEN 0.0
         |      ELSE round(CAST(n * spo - sp * so AS DOUBLE)
         |                 / CAST(n * spp - sp * sp AS DOUBLE), 6) END AS theta
         |  FROM g),
         |arms AS (
         |  SELECT user_id % 2 AS arm, count(*) AS n_users,
         |    sum(CAST(pre AS DECIMAL(38,0))) AS spa,
         |    sum(CAST(post AS DECIMAL(38,0))) AS soa
         |  FROM users GROUP BY 1)
         |SELECT arm, n_users,
         |  round(CAST(soa AS DOUBLE) / n_users, 6) AS mean_post,
         |  round(round(CAST(soa AS DOUBLE) / n_users, 6)
         |    - theta * (round(CAST(spa AS DOUBLE) / n_users, 6) - mean_pre_all), 6) AS mean_adj,
         |  theta
         |FROM arms, gv ORDER BY arm""".stripMargin,
    // the unrolled dyadic kernel, term-by-term: round(x·2^-(j+1), 10)
    // into DECIMAL, exact 8-term sum — mirrors ewma()'s expression tree
    // identical integer kernel: cents = round(value*100), 8 lags, the
    // exact 4^8-scaled dyadic coefficients — all-integer, no floats
    "ev_holt" -> {
      val terms = HoltK.zipWithIndex.map { case (k, j) =>
        val src = if (j == 0) "c" else s"lag(c, $j) OVER w"
        s"coalesce($src, 0) * ($k)"
      }.mkString("\n         |    + ")
      s"""WITH p AS (
         |  SELECT event_id, user_id, ts,
         |    CAST(round(value * 100, 0) AS BIGINT) AS c
         |  FROM events WHERE event_type = 'purchase')
         |SELECT event_id, user_id,
         |  CAST($terms AS BIGINT) AS holt_x64k
         |FROM p
         |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
         |ORDER BY event_id""".stripMargin
    },
    "ev_ewma" -> {
      val terms = (0 until EwmaLags).map { j =>
        val src = if (j == 0) "value" else s"lag(value, $j) OVER w"
        s"CAST(round(coalesce($src, 0) * ${math.pow(0.5, j + 1)}, 10) AS DECIMAL(28,10))"
      }.mkString("\n         |    + ")
      s"""SELECT event_id, user_id,
         |  CAST(CAST($terms AS DECIMAL(28,10)) AS DOUBLE) AS ewma
         |FROM events WHERE event_type = 'purchase'
         |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
         |ORDER BY event_id""".stripMargin
    },
    "ev_rolling" ->
      """WITH ud AS (SELECT DISTINCT user_id,
        |        date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
        |      FROM events),
        |mm AS (SELECT min(d) AS d0, max(d) AS d1 FROM ud),
        |spine AS (SELECT unnest(generate_series(d0, d1)) AS t FROM mm)
        |SELECT make_timestamp(s.t * 86400000000) AS day,
        |  count(DISTINCT u.user_id) AS active_7d
        |FROM spine s LEFT JOIN ud u ON u.d BETWEEN s.t - 6 AND s.t
        |GROUP BY s.t ORDER BY day""".stripMargin,
    // the same register construction as the q38_hll oracle (Compat.Hll
    // twins), max-merged across the trailing 7 days
    "ev_rolling_hll" -> {
      import Compat.Hll
      s"""WITH ud AS (SELECT DISTINCT user_id,
         |        date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
         |      FROM events),
         |mm AS (SELECT min(d) AS d0, max(d) AS d1 FROM ud),
         |spine AS (SELECT unnest(generate_series(d0, d1)) AS t FROM mm),
         |hs AS (SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
         |         ${Hll.oHash("rhll:", "user_id")} AS h
         |       FROM events),
         |regs AS (SELECT d, h & ${Hll.M - 1} AS bucket, max(${Hll.oRho("h")}) AS mx
         |         FROM hs GROUP BY 1, 2),
         |mrg AS (SELECT r.d + k.k AS t, r.bucket, max(r.mx) AS mx
         |        FROM regs r, (SELECT unnest(generate_series(0, ${RollingDays - 1})) AS k) k
         |        GROUP BY 1, 2),
         |sk AS (SELECT t, sum(${Hll.OTerm}) AS sp, count(*) AS nb FROM mrg GROUP BY 1),
         |est AS (SELECT s.t,
         |          CASE WHEN sk.nb IS NULL THEN 0.0
         |               ELSE ${Hll.CSql}
         |                 / CAST(sk.sp + (${Hll.M} - sk.nb) * ${Hll.Pow} AS DOUBLE) END
         |            AS approx_7d
         |        FROM spine s LEFT JOIN sk ON sk.t = s.t),
         |ex AS (SELECT s.t, count(DISTINCT u.user_id) AS exact_7d
         |       FROM spine s LEFT JOIN ud u ON u.d BETWEEN s.t - ${RollingDays - 1} AND s.t
         |       GROUP BY s.t)
         |SELECT make_timestamp(e.t * 86400000000) AS day, est.approx_7d, e.exact_7d,
         |  CASE WHEN e.exact_7d > 0
         |       THEN (est.approx_7d - CAST(e.exact_7d AS DOUBLE)) / CAST(e.exact_7d AS DOUBLE)
         |       ELSE 0.0 END AS rel_err
         |FROM ex e JOIN est ON est.t = e.t
         |ORDER BY day""".stripMargin
    },
    // the same division-free integer algebra: chi2_ppm by exact floor
    // division, alarm by integer comparison at the 10.83 threshold
    "ev_srm" ->
      s"""WITH u AS (SELECT DISTINCT user_id FROM events),
         |a AS (SELECT user_id % 2 AS arm, count(*) AS n FROM u GROUP BY 1),
         |t AS (SELECT
         |  CAST(COALESCE(sum(CASE WHEN arm = 0 THEN n END), 0) AS BIGINT) AS na,
         |  CAST(COALESCE(sum(CASE WHEN arm = 1 THEN n END), 0) AS BIGINT) AS nb
         |  FROM a),
         |w AS (SELECT na, nb, CAST(na AS HUGEINT) - nb AS d,
         |  CAST(na AS HUGEINT) + nb AS nn FROM t)
         |SELECT na, nb,
         |  CAST(CASE WHEN nn = 0 THEN 0
         |    ELSE (d * d * 1000000) // nn END AS BIGINT) AS chi2_ppm,
         |  CAST(CASE WHEN nn = 0 THEN 0
         |    WHEN d * d * 100 > nn * $SrmChi2x100 THEN 1 ELSE 0 END
         |    AS BIGINT) AS srm_alarm
         |FROM w""".stripMargin,
    // identical integer algebra on HUGEINT (DuckDB's 128-bit twin of
    // the Spark side's DECIMAL(38,0)); `//` is DuckDB's floor division
    "ev_abtest" ->
      s"""WITH u AS (
         |  SELECT user_id, max(CASE WHEN event_type = 'purchase'
         |      AND value > $AbConvValue THEN 1 ELSE 0 END) AS conv
         |  FROM events GROUP BY 1),
         |a AS (SELECT user_id % 2 AS arm, count(*) AS n,
         |        CAST(sum(conv) AS BIGINT) AS x
         |      FROM u GROUP BY 1),
         |t AS (SELECT
         |  CAST(COALESCE(sum(CASE WHEN arm = 0 THEN n END), 0) AS BIGINT) AS na,
         |  CAST(COALESCE(sum(CASE WHEN arm = 0 THEN x END), 0) AS BIGINT) AS xa,
         |  CAST(COALESCE(sum(CASE WHEN arm = 1 THEN n END), 0) AS BIGINT) AS nb,
         |  CAST(COALESCE(sum(CASE WHEN arm = 1 THEN x END), 0) AS BIGINT) AS xb
         |  FROM a),
         |w AS (SELECT na, xa, nb, xb,
         |  CAST(na AS HUGEINT) + nb AS nn, CAST(xa AS HUGEINT) + xb AS xx,
         |  CAST(xa AS HUGEINT) * nb - CAST(xb AS HUGEINT) * na AS d
         |  FROM t),
         |z AS (SELECT *, d * d * nn AS num,
         |  CAST(na AS HUGEINT) * nb * xx * (nn - xx) AS den FROM w)
         |SELECT na, xa, nb, xb,
         |  CASE WHEN na = 0 THEN 0 ELSE xa * 1000000 // na END AS ca_ppm,
         |  CASE WHEN nb = 0 THEN 0 ELSE xb * 1000000 // nb END AS cb_ppm,
         |  CAST(CASE WHEN den = 0 THEN 0
         |    WHEN nn > $AbMaxUsers THEN error('ev_abtest: user count exceeds exact-integer headroom ($AbMaxUsers): ' || nn)
         |    ELSE (num * 1000000) // den END AS BIGINT) AS z2_ppm,
         |  CAST(CASE WHEN den = 0 THEN 0
         |    WHEN num * 10000 > den * $AbZ2x10k THEN 1 ELSE 0 END
         |    AS BIGINT) AS is_sig
         |FROM z""".stripMargin,
    // the same strictly-preceding frames — point-in-time correctness is
    // IN the frame bounds, so the oracle can't accidentally leak either
    "ev_features" ->
      """WITH p AS (
        |  SELECT event_id, user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us, value
        |  FROM events WHERE event_type = 'purchase')
        |SELECT event_id, user_id,
        |  lag(value) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_value,
        |  COALESCE(us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id),
        |    -1) AS gap_us,
        |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) - 1
        |    AS BIGINT) AS n_prior,
        |  COALESCE(CAST(ROUND(SUM(CAST(value AS DECIMAL(28,10))) OVER (
        |      PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 2) AS DOUBLE),
        |    0.0) AS run_sum,
        |  CASE WHEN count(*) OVER (PARTITION BY user_id ORDER BY us, event_id
        |         ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) > 0
        |    THEN round(CAST(SUM(CAST(value AS DECIMAL(28,10))) OVER (
        |        PARTITION BY user_id ORDER BY us, event_id
        |        ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS DOUBLE)
        |      / CAST(count(*) OVER (PARTITION BY user_id ORDER BY us, event_id
        |          ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS DOUBLE), 4)
        |    ELSE 0.0 END AS avg3
        |FROM p ORDER BY user_id, event_id""".stripMargin,
    // P²: same tr CTE as ev_transitions, matrix self-join on mid; the
    // probability term evaluates the identical pinned double chain
    // rounded at 4dp into DECIMAL before the mid-sum
    "ev_markov2" ->
      s"""WITH tr AS (
         |  SELECT src, dst FROM (
         |    SELECT event_type AS dst,
         |      lag(event_type) OVER (PARTITION BY user_id
         |        ORDER BY CAST(ts AS TIMESTAMP), event_id) AS src,
         |      epoch_us(CAST(ts AS TIMESTAMP))
         |        - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (PARTITION BY user_id
         |            ORDER BY CAST(ts AS TIMESTAMP), event_id) AS gap
         |    FROM events) g
         |  WHERE src IS NOT NULL AND gap <= $SessionGapUs),
         |m AS (SELECT src, dst, n, CAST(SUM(n) OVER (PARTITION BY src) AS BIGINT) AS d
         |      FROM (SELECT src, dst, count(*) AS n FROM tr GROUP BY 1, 2) c)
         |SELECT a.src AS src, b.dst AS dst,
         |  CAST(SUM(a.n * b.n) AS BIGINT) AS n_paths,
         |  CAST(floor(SUM(CAST(round((1000000.0 * CAST(a.n * b.n AS DOUBLE))
         |    / CAST(a.d * b.d AS DOUBLE), 4) AS DECIMAL(20,4)))) AS BIGINT) AS p2_ppm
         |FROM m a JOIN m b ON a.dst = b.src
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // session strings via string_agg ORDER BY (us, event_id) — the same
    // total order the Spark side pins with array_sort; RE2's
    // regexp_extract_all counts the same non-overlapping leftmost
    // greedy matches as Java's find() loop for this construct class
    "ev_seqmatch" ->
      s"""WITH g AS (
         |  SELECT user_id, event_id, substr(event_type, 1, 1) AS ini,
         |    epoch_us(CAST(ts AS TIMESTAMP)) AS us,
         |    lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (PARTITION BY user_id
         |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS prev_us
         |  FROM events),
         |s AS (
         |  SELECT user_id, ini, us, event_id,
         |    CAST(SUM(CASE WHEN prev_us IS NULL OR us - prev_us > $SessionGapUs
         |        THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY user_id ORDER BY us, event_id
         |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
         |  FROM g),
         |sq AS (SELECT user_id, session_id,
         |         string_agg(ini, '' ORDER BY us, event_id) AS seq
         |       FROM s GROUP BY 1, 2),
         |m AS (SELECT p.pattern AS pattern,
         |        len(regexp_extract_all(seq, p.pattern)) AS matches
         |      FROM sq, (SELECT unnest([${SeqPatterns.map(p => s"'$p'").mkString(", ")}])
         |                  AS pattern) p)
         |SELECT pattern,
         |  CAST(count(*) FILTER (WHERE matches > 0) AS BIGINT) AS sessions_matched,
         |  CAST(sum(matches) AS BIGINT) AS total_matches
         |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
