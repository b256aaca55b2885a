package graft

import graft.operators.Events
import org.apache.spark.sql.functions._

class EventsSpec extends SparkSpec {

  private def ev = Tables.events(spark, sf)

  test("events.ts survives the nanos→micros conversion as a real timestamp") {
    val t = ev.schema("ts").dataType
    assert(t == org.apache.spark.sql.types.TimestampType)
    assert(ev.where(year(col("ts")) =!= 2024).count() == 0)
  }

  test("Tables.events LongType branch: ns→µs is exact integer division past 2^53") {
    // Pins the nanos conversion path independent of the driver fixture
    // (ScaleUp-scaled dirs store native µs timestamps since r6, so a
    // scale run alone no longer exercises this branch). ns epoch values
    // exceed 2^53 — a float divide would corrupt the low digits.
    val s = spark
    import s.implicits._
    val ns = Seq(1700000000123456789L, 1700000000123457123L, 9223372036854775000L)
    val dir = java.nio.file.Files.createTempDirectory("graft_nanos_test").toString
    ns.map(n => (1L, n)).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables.events(spark, dir)
    assert(got.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    val micros = got.select(unix_micros(col("ts"))).collect().map(_.getLong(0)).sorted
    assert(micros.toSeq == ns.map(_ / 1000L).sorted,
      s"expected exact ns div 1000, got ${micros.toSeq}")
  }

  test("Tables.events normalizes all three parquet timestamp flavors to TimestampType µs") {
    // The driver has regenerated /root/testdata with different parquet
    // timestamp encodings across rounds: TIMESTAMP(NANOS) (r1-r6), then
    // TIMESTAMP(MICROS, isAdjustedToUTC=false) = TIMESTAMP_NTZ (r7 — which
    // crashed every unix_micros(ts) query). Pin that whichever flavor
    // ships next, Tables.events yields a session-TZ TimestampType with
    // identical µs values, so unix_micros(ts) always works.
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val micros = Seq(1700000000123456L, 1711111111999999L)
    def check(dir: String): Unit = {
      val got = Tables.events(spark, dir)
      assert(got.schema("ts").dataType == TimestampType, s"$dir: ${got.schema("ts").dataType}")
      val vals = got.select(unix_micros(col("ts"))).collect().map(_.getLong(0)).sorted
      assert(vals.toSeq == micros.sorted, s"$dir: got ${vals.toSeq}")
    }
    val base = java.nio.file.Files.createTempDirectory("graft_ts_flavors").toString
    // flavor 1: µs NTZ (isAdjustedToUTC=false) — the r7 regeneration
    micros.map(m => (1L, m)).toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(s"$base/ntz/events.parquet")
    check(s"$base/ntz")
    // flavor 2: µs UTC-adjusted (instant) — plain TimestampType pass-through
    micros.map(m => (1L, m)).toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"))
      .write.mode("overwrite").parquet(s"$base/utc/events.parquet")
    check(s"$base/utc")
    // flavor 3 (NANOS-as-long) is pinned by the dedicated test above.
  }

  test("sessionize: events partition into sessions; counts sum to total") {
    val s = Events.sessionize(ev)
    val total = s.agg(sum("n_events")).collect()(0).getLong(0)
    assert(total == ev.count())
    assert(s.where(col("session_end") < col("session_start")).count() == 0)
  }

  test("sessionize: gap larger than 30min splits, smaller doesn't") {
    val sp = spark
    import sp.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(sec: Long) = new java.sql.Timestamp(base.getTime + sec * 1000)
    val d = Seq(
      (1L, 10L, at(0), 1.0), (2L, 10L, at(60), 1.0),   // same session
      (3L, 10L, at(60 + 1801), 1.0),                   // new session (gap 1801s)
      (4L, 20L, at(0), 1.0))                           // other user
      .toDF("event_id", "user_id", "ts", "value")
    val s = Events.sessionize(d).collect()
    val u10 = s.filter(_.getLong(0) == 10L)
    assert(u10.map(_.getLong(1)).toSet == Set(1L, 2L))
    assert(s.filter(_.getLong(0) == 20L).map(_.getLong(1)).toSet == Set(1L))
  }

  test("session_window sessionizer agrees with the window-function sessionizer") {
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), round(col("total_value"), 6).as("tv"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(key(Events.sessionizeSW(ev)) == key(Events.sessionize(ev)))
  }

  test("funnel is monotonically decreasing") {
    val f = Events.funnel(ev).collect()(0)
    assert(f.getLong(0) >= f.getLong(1) && f.getLong(1) >= f.getLong(2))
  }

  test("intervalJoin: window edges exact, zero-click purchases kept, equi-key carries the match") {
    val s = spark
    import s.implicits._
    val base = 1700000000000000L // µs
    val gap = Events.IntervalUs
    // user 1: purchase at base+gap; clicks at window start (IN, >=),
    // inside (IN), at purchase instant (OUT, <), before window (OUT).
    // user 2's click at an in-window time must NOT match user 1.
    // user 3: purchase with no clicks at all (left-join zero row).
    val rows = Seq(
      (10L, base + gap, 1L, "purchase", 9.99),
      (11L, base, 1L, "click", 1.0),            // == pts - gap → in
      (12L, base + gap / 2, 1L, "click", 2.0),  // inside
      (13L, base + gap, 1L, "click", 4.0),      // == pts → out
      (14L, base - 1, 1L, "click", 8.0),        // before window → out
      (15L, base + gap / 2, 2L, "click", 16.0), // other user → out
      (16L, base + gap, 3L, "purchase", 5.0))
    val ev = rows.toDF("event_id", "us", "user_id", "event_type", "value")
      .select(col("event_id"), expr("timestamp_micros(us)").as("ts"),
        col("user_id"), col("event_type"), col("value"))
    val got = Events.intervalJoin(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 10L, 2L, 3.0), (3L, 16L, 0L, 0.0)),
      s"got ${got.toSeq}")
  }

  test("retention: retained <= active per day") {
    val r = Events.retention(ev)
    assert(r.where(col("retained") > col("active")).count() == 0)
    assert(r.count() > 0)
  }

  test("tumbling buckets land on exact hours") {
    val t = Events.tumbling(ev)
    assert(t.where(minute(col("bucket")) =!= 0 || second(col("bucket")) =!= 0).count() == 0)
  }

  test("scd2: gapless per-user timeline, one current version, no no-op versions") {
    val v = Events.scd2(ev)
    assert(v.count() > 0)
    // exactly one open (current) version per user
    val open = v.groupBy("user_id").agg(sum("is_current").as("n_open"))
    assert(open.where(col("n_open") =!= 1).count() == 0)
    // each version's valid_to is exactly the next version's valid_from
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("valid_from", "event_id")
    val chained = v.withColumn("next_from", lead("valid_from", 1).over(w))
    assert(chained.where(col("next_from").isNotNull &&
      !(col("valid_to") <=> col("next_from"))).count() == 0)
    // compression: consecutive versions never carry the same value
    val noop = v.withColumn("next_val", lead("value", 1).over(w))
      .where(col("next_val").isNotNull && (col("value") <=> col("next_val")))
    assert(noop.count() == 0)
  }

  test("fillDaily: dense spine, LOCF fill, gaps flagged consistently") {
    val f = Events.fillDaily(ev)
    assert(f.count() > 0)
    // spine density: per user, rows == day span
    val span = f.groupBy("user_id").agg(count(lit(1)).as("n"),
      (datediff(max("day"), min("day")) + 1).as("expect"))
    assert(span.where(col("n") =!= col("expect")).count() == 0)
    // first row per user is never a gap (spine starts at first activity),
    // so filled is never null
    assert(f.where(col("filled").isNull).count() == 0)
    // LOCF: on gap days the filled value equals the previous day's
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("day")
    val locf = f.withColumn("prev_filled", lag("filled", 1).over(w))
    assert(locf.where(col("is_gap") === 1 &&
      !(col("filled") <=> col("prev_filled"))).count() == 0)
  }

  test("topPaths: session boundaries split paths; ties order by path") {
    val sp = spark
    import sp.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(sec: Long) = new java.sql.Timestamp(base.getTime + sec * 1000)
    val d = Seq(
      (1L, 10L, at(0), "view"), (2L, 10L, at(60), "purchase"), // one session
      (3L, 10L, at(60 + 1801), "view"), // gap > 30min: new singleton session
      (4L, 20L, at(0), "view"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = Events.topPaths(d).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // "view" occurs in two sessions; count desc then path asc
    assert(got == Seq(("view", 2L), ("view->purchase", 1L)), got.toString)
  }

  test("fillDaily: a purchase day with NULL value is present, not a gap") {
    // is_gap must test join-key absence (the oracle's `d.day IS NULL`),
    // not day_total's nullness — the two diverge exactly here
    val sp = spark
    import sp.implicits._
    def at(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    val d = Seq(
      (10L, at(1), "purchase", Some(5.0)),
      (10L, at(2), "purchase", None), // present day, NULL total
      (10L, at(4), "purchase", Some(7.0))) // day 3 is the real gap
      .toDF("user_id", "ts", "event_type", "value")
    val f = Events.fillDaily(d).collect()
      .map(r => (r.getTimestamp(1).toString.substring(8, 10), r.getLong(3))).toMap
    assert(f == Map("01" -> 0L, "02" -> 0L, "03" -> 1L, "04" -> 0L),
      s"NULL-total day must be present, not a gap: $f")
  }

  test("transitions: session boundaries break adjacency; probabilities sum per src") {
    val sp = spark
    import sp.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(sec: Long) = new java.sql.Timestamp(base.getTime + sec * 1000)
    val d = Seq(
      (1L, 10L, at(0), "view"), (2L, 10L, at(60), "click"),
      (3L, 10L, at(120), "view"),
      (4L, 10L, at(120 + 1801), "purchase"), // gap > 30min: NOT a transition
      (5L, 20L, at(0), "view"), (6L, 20L, at(30), "view"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = Events.transitions(d).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // view->click, click->view, view->view; view->purchase is across the gap
    assert(got.keySet == Set(("view", "click"), ("click", "view"), ("view", "view")),
      got.toString)
    assert(got(("view", "click")) == (1L, 2L, 500000L)) // 2 transitions leave "view"
    assert(got(("view", "view")) == (1L, 2L, 500000L))
    assert(got(("click", "view")) == (1L, 1L, 1000000L))
  }

  test("anomalies: constant series never anomalous; a genuine spike flags; n=1 safe") {
    val sp = spark
    import sp.implicits._
    def at(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    val d = (
      // user 10: nine days of 10.00 and one day of 1000.00 — the spike
      (1 to 9).map(i => (10L, at(i), "purchase", 10.0)) :+ (10L, at(10), "purchase", 1000.0)
    ) ++ Seq(
      // user 20: constant — zero variance must flag nothing
      (20L, at(1), "purchase", 5.0), (20L, at(2), "purchase", 5.0),
      // user 30: a single day — degenerate, not anomalous
      (30L, at(1), "purchase", 123.45))
    val f = Events.anomalies(d.toDF("user_id", "ts", "event_type", "value"))
      .collect().map(r => ((r.getLong(0), r.getTimestamp(1).toString.substring(8, 10)),
        r.getLong(3))).toMap
    assert(f((10L, "10")) == 1L, "spike day must flag")
    assert(f.count { case ((u, _), v) => u == 10L && v == 1L } == 1,
      "only the spike flags for user 10")
    assert(f.forall { case ((u, _), v) => u != 20L || v == 0L }, "constant series clean")
    assert(f((30L, "01")) == 0L, "single observation not anomalous")
  }

  test("windowFunnel: chain must fit 1h of its head; later heads rescue chains (greedy trap)") {
    val s = spark
    import s.implicits._
    def t(min: Long) = new java.sql.Timestamp(1704067200000L + min * 60000)
    def e(id: Long, m: Long, u: Long, ty: String) = (id, t(m), u, ty, 1.0)
    val d = Seq(
      // u1: v@0, c@30, p@50 — all within 1h of v → level 3
      e(1, 0, 1, "view"), e(2, 30, 1, "click"), e(3, 50, 1, "purchase"),
      // u2: p@70 falls outside the head window → level 2
      e(4, 0, 2, "view"), e(5, 30, 2, "click"), e(6, 70, 2, "purchase"),
      // u3: click 90min after the only view → level 1
      e(7, 0, 3, "view"), e(8, 90, 3, "click"),
      // u4: click with no view → level 0
      e(9, 10, 4, "click"),
      // u5 greedy trap: head A@0 cannot cover p@75, but head B@20 can —
      // an earliest-head algorithm reports 2; the max-head rule gets 3
      e(10, 0, 5, "view"), e(11, 20, 5, "view"), e(12, 55, 5, "click"),
      e(13, 75, 5, "purchase"),
      // u6: a purchase BEFORE any chain doesn't count; the later one does
      e(14, 5, 6, "purchase"), e(15, 10, 6, "view"), e(16, 20, 6, "click"),
      e(17, 40, 6, "purchase")
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Events.windowFunnel(d).as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 3L, 2L -> 2L, 3L -> 1L, 4L -> 0L, 5L -> 3L, 6L -> 3L), r.toString)
  }

  test("ohlc: bar boundaries, same-ts tie-break by event_id, exact volume") {
    val s = spark
    import s.implicits._
    def t(sec: Long) = new java.sql.Timestamp(1704067200000L + sec * 1000)
    val d = Seq(
      // series x, bar 0: open=5 (t=0), high=9, low=1, close=1 (t=299)
      (1L, t(0), 1L, "x", 5.0), (2L, t(60), 1L, "x", 9.0), (3L, t(299), 1L, "x", 1.0),
      // series x, bar 1 (t=300 starts a new 5-min bar)
      (4L, t(300), 1L, "x", 4.0),
      // series y: two events at the SAME ts — event_id orders open/close
      (5L, t(10), 2L, "y", 7.0), (6L, t(10), 2L, "y", 3.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Events.ohlc(d)
      .select("event_type", "n", "open", "high", "low", "close", "volume")
      .as[(String, Long, Double, Double, Double, Double, Double)]
      .collect()
    assert(r.length == 3)
    assert(r(0) == ("x", 3L, 5.0, 9.0, 1.0, 1.0, 15.0), s"bar0: ${r(0)}")
    assert(r(1) == ("x", 1L, 4.0, 4.0, 4.0, 4.0, 4.0), s"bar1: ${r(1)}")
    assert(r(2) == ("y", 2L, 7.0, 7.0, 3.0, 3.0, 10.0), s"tie bar: ${r(2)}")
  }

  test("hopping: every event lands in exactly width/slide windows, starts slide-aligned") {
    val r = Events.hopping(ev)
    val fanout = (Events.HopWidthUs / Events.HopSlideUs).toInt
    assert(r.agg(sum(col("n"))).head.getLong(0) == ev.count() * fanout)
    assert(r.where(unix_micros(col("win_start")) % Events.HopSlideUs =!= 0).count() == 0)
    // a window's count equals the sum of its two constituent tumbling halves
    val s = spark
    import s.implicits._
    def t(sec: Long) = new java.sql.Timestamp(1704067200000L + sec * 1000)
    val d = Seq(
      (1L, t(0), 1L, "x", 1.0),    // slide bucket 0 → windows starting -300, 0
      (2L, t(301), 1L, "x", 2.0),  // slide bucket 1 → windows starting 0, 300
      (3L, t(650), 1L, "x", 4.0))  // slide bucket 2 → windows starting 300, 600
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Events.hopping(d)
      .select(unix_micros(col("win_start")) / 1000000L - 1704067200L, col("n"), col("total"))
      .as[(Double, Long, Double)].collect().toSeq
    assert(got == Seq((-300.0, 1L, 1.0), (0.0, 2L, 3.0), (300.0, 2L, 6.0), (600.0, 1L, 4.0)),
      s"got $got")
  }

  test("cohort: offset-0 diagonal equals cohort size; retention bounded; offsets non-negative") {
    val r = Events.cohort(ev).cache()
    assert(r.count() > 0)
    assert(r.where(col("week_offset") < 0).count() == 0)
    assert(r.where(col("week_offset") === 0 && col("n_active") =!= col("cohort_size")).count() == 0)
    assert(r.where(col("retention_ppm") > 1000000L).count() == 0)
    // every cohort has its offset-0 row (the cohort's own first week)
    val cohorts = r.select("cohort_week").distinct().count()
    assert(r.where(col("week_offset") === 0).count() == cohorts)
    r.unpersist()
  }

  test("rollingRange: value-based frame — hour boundary inclusive, µs ties are peers, users isolated") {
    val sp = spark
    import sp.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(sec: Long) = new java.sql.Timestamp(base.getTime + sec * 1000)
    val d = Seq(
      (1L, 10L, at(0), 1.0),
      (2L, 10L, at(3600), 2.0),      // exactly 1h after e1 → frame includes e1
      (3L, 10L, at(3601), 4.0),      // 3601s after e1 → e1 aged out; e2 in
      (4L, 10L, at(3601), 8.0),      // µs-TIED with e3: RANGE peers — each
                                     // frame holds BOTH tied rows (no ROWS
                                     // frame can express this)
      (5L, 20L, at(3601), 16.0))     // other user: isolated
      .toDF("event_id", "user_id", "ts", "value")
    val r = Events.rollingRange(d).collect()
      .map(row => row.getLong(0) -> (row.getLong(3), row.getDouble(4))).toMap
    assert(r(1L) == (1L, 1.0))
    assert(r(2L) == (2L, 3.0), r.toString)           // inclusive lower bound
    assert(r(3L) == (3L, 14.0), r.toString)          // e2 + BOTH tied rows
    assert(r(4L) == (3L, 14.0), r.toString)          // peer frames identical
    assert(r(5L) == (1L, 16.0))
  }

  test("ewma: dyadic kernel trajectory matches hand unroll; warm-up zero-pads; users isolated") {
    val sp = spark
    import sp.implicits._
    def at(sec: Long) = new java.sql.Timestamp(1704067200000L + sec * 1000)
    val d = Seq(
      (1L, 10L, at(0), "purchase", 8.0),
      (2L, 10L, at(1), "purchase", 4.0),
      (3L, 10L, at(2), "view", 999.0),      // other type: excluded entirely
      (4L, 10L, at(3), "purchase", 2.0),
      (5L, 20L, at(4), "purchase", 16.0))   // other user: isolated warm-up
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val r = Events.ewma(d).collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(!r.contains(3L))
    assert(r(1L) == 8.0 * 0.5)                            // warm-up: only x_t
    assert(r(2L) == 4.0 * 0.5 + 8.0 * 0.25)
    assert(r(4L) == 2.0 * 0.5 + 4.0 * 0.25 + 8.0 * 0.125) // view row skipped
    assert(r(5L) == 16.0 * 0.5)                           // user 20 unaffected
  }

  test("seasonal: residuals measured against the hour-of-day profile, ranked by magnitude") {
    val sp = spark
    import sp.implicits._
    def at(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val d = Seq(
      (1L, 1L, at(9, 0), "view", 10.0),
      (2L, 1L, at(9, 30), "view", 20.0),   // hour-9 view mean = 60
      (3L, 1L, at(9, 40), "view", 150.0),  // residual +90 — the spike
      (4L, 2L, at(14, 0), "click", 100.0)) // alone in its cell: residual 0
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val r = Events.seasonal(d).collect()
      .map(x => (x.getLong(0), x.getDouble(3)))
    assert(r.head == ((3L, 90.0)), s"top residual wrong: ${r.toSeq}") // 150 − 60
    assert(r.map(_._1).toSet == Set(1L, 2L, 3L, 4L))
    assert(r.find(_._1 == 4L).get._2 == 0.0)
    // magnitudes non-increasing, ties by event_id
    val mags = r.map { case (id, res) => (math.abs(res), id) }
    assert(mags.sliding(2).forall {
      case Array((a, i), (b, j)) => a > b || (a == b && i < j); case _ => true })
  }

  test("rollingActive: trailing-7 coverage, zero-coverage gap days kept as 0") {
    val s = spark
    import s.implicits._
    // user 1 active day 0 and day 10; user 2 active day 0 only.
    // day 0..6 covered by day-0 activity (2 users), day 7..9 ZERO,
    // day 10..16 → but spine stops at max active day = 10.
    def t(day: Long) = new java.sql.Timestamp(day * 86400000L)
    val d = Seq(
      (1L, t(0), 1L, "view", 1.0), (2L, t(0), 2L, "view", 1.0),
      (3L, t(10), 1L, "view", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Events.rollingActive(d)
      .select(unix_micros(col("day")) / 86400000000L, col("active_7d"))
      .as[(Double, Long)].collect().toSeq
    val want = (0L to 6L).map(d => (d.toDouble, 2L)) ++
      Seq((7.0, 0L), (8.0, 0L), (9.0, 0L), (10.0, 1L))
    assert(got == want, s"got $got")
  }

  test("dwell: session boundary excludes the gap; last session event has no dwell") {
    val s = spark
    import s.implicits._
    def t(sec: Long) = new java.sql.Timestamp(1704067200000L + sec * 1000)
    val gapS = Events.SessionGapUs / 1000000L
    val d = Seq(
      (1L, t(0), 1L, "view", 1.0),           // dwell 30 s to the click
      (2L, t(30), 1L, "click", 1.0),         // dwell exactly the gap → INCLUDED (<=)
      (3L, t(30 + gapS), 1L, "view", 1.0),   // next is beyond gap → session ends, no dwell
      (4L, t(40 + 2 * gapS), 1L, "view", 1.0), // last event of user → no dwell
      (5L, t(10), 2L, "view", 1.0))          // other user, single event → no dwell
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Events.dwell(d).as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("click", 1L, gapS * 1000000L, gapS * 1000000L),
      ("view", 1L, 30L * 1000000L, 30L * 1000000L)), s"got $got")
  }

  test("rollingActiveHll: merged daily sketches equal the union's sketch; error bounded") {
    val s = spark
    import s.implicits._
    def t(day: Long) = new java.sql.Timestamp(day * 86400000L)
    // overlapping cohorts: day 0 = users 1..200, day 3 = users 101..300
    val twoDay = ((1L to 200L).map(u => (u, t(0), u, "view", 1.0)) ++
      (101L to 300L).map(u => (u + 1000, t(3), u, "view", 1.0)))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    // day 3's trailing window covers both days → its sketch must equal
    // the sketch of the UNION corpus placed on one day (max-merge ≡
    // union — the property that makes per-day sketches reusable)
    val merged = Events.rollingActiveHll(twoDay)
      .where(unix_micros(col("day")) === 3L * 86400000000L)
      .select("approx_7d").head.getDouble(0)
    val unionOneDay = ((1L to 300L).map(u => (u, t(3), u, "view", 1.0)))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val direct = Events.rollingActiveHll(unionOneDay)
      .where(unix_micros(col("day")) === 3L * 86400000000L)
      .select("approx_7d").head.getDouble(0)
    assert(merged == direct, s"merged $merged != direct union sketch $direct")
    // corpus-level sanity: deterministic, zero-coverage days 0.0, and
    // the estimate stays within sketch tolerance of exact (m=256,
    // raw-HLL high bias at small n — generous 50% bound)
    val r = Events.rollingActiveHll(ev).cache()
    assert(r.where(col("exact_7d") === 0 && col("approx_7d") =!= 0.0).count() == 0)
    assert(r.where(col("exact_7d") >= 20 &&
      (col("rel_err") > 0.5 || col("rel_err") < -0.5)).count() == 0)
    r.unpersist()
  }

  test("compact: last-writer-wins, tombstone drops key, re-insert revives, same-ts tie by event_id") {
    val s = spark
    import s.implicits._
    def t(sec: Long) = new java.sql.Timestamp(1704067200000L + sec * 1000)
    val d = Seq(
      // user 1: insert → update; survives with the update's value
      (1L, t(0), 1L, "signup", 1.0), (2L, t(10), 1L, "click", 7.5),
      // user 2: last op is a tombstone → absent from the snapshot
      (3L, t(0), 2L, "signup", 1.0), (4L, t(20), 2L, "error", 0.0),
      // user 3: tombstone then RE-INSERT → present, counts all 3 changes
      (5L, t(0), 3L, "signup", 1.0), (6L, t(5), 3L, "error", 0.0),
      (7L, t(9), 3L, "signup", 2.0),
      // user 4: two changes at the SAME ts — higher event_id wins
      (8L, t(0), 4L, "view", 1.0), (9L, t(0), 4L, "purchase", 9.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Events.compact(d)
      .select("user_id", "n_changes", "last_type", "last_value")
      .as[(Long, Long, String, Double)].collect()
    assert(r.toSeq == Seq(
      (1L, 2L, "click", 7.5),
      (3L, 3L, "signup", 2.0),
      (4L, 2L, "purchase", 9.0)), s"got ${r.toSeq}")
    // corpus-level: exactly the users whose latest event is an error drop
    val all = ev.count()
    val compacted = Events.compact(ev)
    assert(compacted.agg(sum("n_changes")).head.getLong(0) < all)
    assert(compacted.where(col("last_type") === "error").count() == 0)
  }

  test("features: strictly-preceding frames — no target leakage, hand-traced values") {
    val s = spark
    import s.implicits._
    def t(min: Long) = new java.sql.Timestamp(1704067200000L + min * 60000)
    val d = Seq(
      (1L, t(0), 1L, "purchase", 10.0), (2L, t(10), 1L, "purchase", 20.0),
      (3L, t(20), 1L, "purchase", 30.0), (4L, t(30), 1L, "purchase", 40.0),
      (5L, t(40), 1L, "purchase", 50.0),
      (6L, t(5), 1L, "click", 99.0) // non-purchase: invisible to features
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Events.features(d)
      .select("event_id", "prev_value", "gap_us", "n_prior", "run_sum", "avg3")
      .collect().map(x => (x.getLong(0),
        if (x.isNullAt(1)) -999.0 else x.getDouble(1),
        x.getLong(2), x.getLong(3), x.getDouble(4), x.getDouble(5))).toSeq
    val g = 600000000L // 10 min in µs
    assert(r == Seq(
      (1L, -999.0, -1L, 0L, 0.0, 0.0),
      (2L, 10.0, g, 1L, 10.0, 10.0),
      (3L, 20.0, g, 2L, 30.0, 15.0),
      (4L, 30.0, g, 3L, 60.0, 20.0),
      (5L, 40.0, g, 4L, 100.0, 30.0)), r.toString) // avg3@5 = mean(20,30,40)
  }

  test("abTest: exact-integer two-proportion z², degenerate variance short-circuits") {
    val s = spark
    import s.implicits._
    def t(min: Long) = new java.sql.Timestamp(1704067200000L + min * 60000)
    // arm0 = even users {2,4}: u2 converts (190 > 180), u4 doesn't;
    // arm1 = odd users {1,3,5}: u1,u3 convert, u5 doesn't
    val d = Seq(
      (1L, t(0), 2L, "purchase", 190.0), (2L, t(1), 4L, "purchase", 10.0),
      (3L, t(2), 1L, "purchase", 200.0), (4L, t(3), 3L, "purchase", 181.0),
      (5L, t(4), 5L, "purchase", 179.9), (6L, t(5), 5L, "click", 999.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Events.abTest(d)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    // D = xa·nb − xb·na = 1·3 − 2·2 = −1; num = D²·N = 5;
    // den = na·nb·X·(N−X) = 2·3·3·2 = 36; z²·10⁶ = 5000000 div 36
    assert(r == Seq((2L, 1L, 3L, 2L, 500000L, 666666L, 138888L, 0L)), r.toString)
    // degenerate: every user converts → zero variance → z²=0, not sig
    val all = Seq(
      (1L, t(0), 1L, "purchase", 190.0), (2L, t(1), 2L, "purchase", 199.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val r2 = Events.abTest(all)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(r2 == Seq((1L, 1L, 1L, 1L, 1000000L, 1000000L, 0L, 0L)), r2.toString)
    // corpus: one readout row, arms partition the user base
    val c = Events.abTest(ev).collect()(0)
    assert(c.getLong(0) + c.getLong(2) == ev.select("user_id").distinct().count())
    // past the exact-integer headroom the readout fails LOUD (both
    // engines), never a silent NULL — exercised via a tiny override
    val boom = intercept[Exception] { Events.abTest(d, maxUsers = 1L).collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(boom).exists(_.contains("exact-integer headroom")), boom.toString)
  }

  test("holt: kernel matches exact-rational recursion coefficients; trend beats ewma on a ramp") {
    val s = spark
    import s.implicits._
    // re-derive HoltK independently: integer matrix powers of 4A on 4g,
    // coefficient j = (h·A^j·g)·4^8 with h=[1,1]
    var v = (2L, 1L) // 4g, units 4^(j+1)
    val want = (0 until 8).map { j =>
      val k = (v._1 + v._2) * math.round(math.pow(4, 7 - j))
      v = (2 * v._1 + 2 * v._2, -v._1 + 3 * v._2) // 4A · v
      k
    }
    assert(Events.HoltK == want, s"${Events.HoltK} vs $want")
    // on a pure ramp x_t = t the Holt forecast extrapolates ABOVE the
    // latest value while EWMA lags BELOW it — the trend term at work
    def t(min: Long) = new java.sql.Timestamp(1704067200000L + min * 60000)
    val ramp = (1 to 20).map(i => (i.toLong, t(i), 1L, "purchase", i * 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val h = Events.holt(ramp).collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // event 20: value 20.00 = 2000 cents; forecast scaled by 65536
    assert(h(20L) > 2000L * 65536L,
      s"Holt must extrapolate past the ramp head: ${h(20L)} vs ${2000L * 65536L}")
    val e = Events.ewma(ramp).collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(e(20L) < 20.0, s"EWMA lags the ramp: ${e(20L)}")
    // warm-up is zero-padded: the first event's forecast is k_0·cents
    assert(h(1L) == 100L * Events.HoltK.head)
    // all-integer: a constant series forecasts sum(k)·cents exactly
    val const = (1 to 12).map(i => (i.toLong, t(i), 1L, "purchase", 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val hc = Events.holt(const).collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(hc(12L) == 500L * Events.HoltK.sum)
  }

  test("srm: exact chi2 ppm; planted imbalance alarms at 10.83, randomization noise does not") {
    val s = spark
    import s.implicits._
    def t(min: Long) = new java.sql.Timestamp(1704067200000L + min * 60000)
    def corpus(evens: Int, odds: Int) =
      ((1 to evens).map(i => (i.toLong, t(i), i * 2L, "view", 0.0)) ++
       (1 to odds).map(i => (1000L + i, t(i), i * 2L + 1, "view", 0.0)))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
    // 100 vs 60: chi2 = 40²/160 = 10.0 < 10.83 → no alarm (and this is
    // already a 25% imbalance — the threshold is deliberately strict)
    val ok = Events.srm(corpus(100, 60)).as[(Long, Long, Long, Long)].collect().toSeq
    assert(ok == Seq((100L, 60L, 10000000L, 0L)), ok.toString)
    // 100 vs 55: chi2 = 45²/155 = 13.06 > 10.83 → alarm
    val bad = Events.srm(corpus(100, 55)).as[(Long, Long, Long, Long)].collect().toSeq
    assert(bad == Seq((100L, 55L, 13064516L, 1L)), bad.toString)
    // duplicate events don't double-count users (distinct-user basis)
    val dup = Events.srm(corpus(10, 10).unionAll(corpus(10, 10)))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(dup == Seq((10L, 10L, 0L, 0L)), dup.toString)
    // empty corpus short-circuits, no division
    val z = Events.srm(corpus(0, 0)).as[(Long, Long, Long, Long)].collect().toSeq
    assert(z == Seq((0L, 0L, 0L, 0L)), z.toString)
    // the driver corpus's parity split must NOT alarm — if it does, the
    // abtest/cuped keys upstream are reading a broken assignment
    val c = Events.srm(ev).collect()(0)
    assert(c.getLong(3) == 0L, s"corpus SRM alarm: ${c}")
  }

  test("markov2: P² composes 1-step edges through mid, exact paths + floored ppm") {
    val s = spark
    import s.implicits._
    def t(min: Long) = new java.sql.Timestamp(1704067200000L + min * 60000)
    val d = Seq(
      // u1: v→c→p; u2: v→c; u3: v→p
      // 1-step: v→c n=2, v→p n=1 (d_v=3); c→p n=1 (d_c=1)
      (1L, t(0), 1L, "view", 0.0), (2L, t(10), 1L, "click", 0.0),
      (3L, t(20), 1L, "purchase", 0.0),
      (4L, t(0), 2L, "view", 0.0), (5L, t(10), 2L, "click", 0.0),
      (6L, t(0), 3L, "view", 0.0), (7L, t(10), 3L, "purchase", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Events.markov2(d).as[(String, String, Long, Long)].collect().toSeq
    // only v→(c)→p composes: p2 = (2/3)·(1/1) = 0.666666…,
    // term = round(1e6·2/3, 4) = 666666.6667 → floor 666666; paths 2·1
    assert(r == Seq(("view", "purchase", 2L, 666666L)), r.toString)
  }

  test("seqMatch: sessions encode in (ts, event_id) order; regex counts match by hand") {
    val s = spark
    import s.implicits._
    def t(min: Long) = new java.sql.Timestamp(1704067200000L + min * 60000)
    val d = Seq(
      // u1 session 1: "vcp"; u1 session 2 (80-min gap): "sev"
      (1L, t(0), 1L, "view", 0.0), (2L, t(10), 1L, "click", 0.0),
      (3L, t(20), 1L, "purchase", 0.0),
      (10L, t(100), 1L, "signup", 0.0), (11L, t(101), 1L, "error", 0.0),
      (12L, t(102), 1L, "view", 0.0),
      // u2: "svpp"
      (4L, t(0), 2L, "signup", 0.0), (5L, t(5), 2L, "view", 0.0),
      (6L, t(10), 2L, "purchase", 0.0), (7L, t(15), 2L, "purchase", 0.0),
      // u3: "eee" — e+ is ONE greedy match, not three
      (8L, t(0), 3L, "error", 0.0), (9L, t(1), 3L, "error", 0.0),
      (13L, t(2), 3L, "error", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Events.seqMatch(d).as[(String, Long, Long)].collect()
      .map(x => x._1 -> (x._2, x._3)).toMap
    assert(r == Map(
      "e+" -> (2L, 2L),        // "eee" once (greedy), "sev" once
      "pp" -> (1L, 1L),        // "svpp"
      "se?v" -> (2L, 2L),      // "sv" in "svpp", "sev" in "sev"
      "v[ce]*p" -> (2L, 2L)    // "vcp", and "vp" inside "svpp"
    ), r.toString)
  }
}
