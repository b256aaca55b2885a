package graft

import java.sql.Timestamp

import graft.streaming.{Event, EventStream}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class EventStreamSpec extends SparkSpec {

  private def ts(sec: Long) = new Timestamp(1704067200000L + sec * 1000) // 2024-01-01 UTC

  test("streaming tumbling counts converge to the batch result") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[Event](s)
    val q = EventStream.tumbling(input.toDF())
      .writeStream.format("memory").queryName("tumb").outputMode("complete").start()
    try {
      input.addData(
        Event(1, ts(0), 10, "view", 1.0),
        Event(2, ts(60), 10, "view", 2.0),
        Event(3, ts(3700), 11, "click", 3.0))
      q.processAllAvailable()
      val rows = s.sql("SELECT bucket, event_type, n, total FROM tumb ORDER BY bucket").collect()
      assert(rows.length == 2)
      assert(rows(0).getLong(2) == 2L && rows(0).getDouble(3) == 3.0)
      assert(rows(1).getString(1) == "click" && rows(1).getLong(2) == 1L)
    } finally q.stop()
  }

  test("streaming sessionizer closes a session after a 30-min gap") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[Event](s)
    val q = EventStream.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      input.addData(
        Event(1, ts(0), 10, "view", 1.0),
        Event(2, ts(60), 10, "view", 2.0))
      q.processAllAvailable()
      // gap of 1801s within the same user closes the first session
      input.addData(Event(3, ts(60 + 1801), 10, "view", 4.0))
      q.processAllAvailable()
      // advance watermark far beyond to time the rest out
      input.addData(Event(4, ts(100000), 99, "view", 0.0))
      q.processAllAvailable()
      input.addData(Event(5, ts(200000), 98, "view", 0.0))
      q.processAllAvailable()
      val sessions = s.sql("SELECT user_id, n_events, total_value FROM sess WHERE user_id = 10")
        .collect()
      assert(sessions.length >= 1)
      assert(sessions(0).getLong(1) == 2L && sessions(0).getDouble(2) == 3.0)
    } finally q.stop()
  }

  test("streaming ohlc and hopping replaying the whole events table converge to batch") {
    val s = spark
    import s.implicits._
    val batchDf = Tables.events(spark, sf)
    val evs = batchDf
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().toSeq
    val input = MemoryStream[Event](s)
    val qo = EventStream.ohlc(input.toDF())
      .writeStream.format("memory").queryName("sohlc").outputMode("complete").start()
    val qh = EventStream.hopping(input.toDF())
      .writeStream.format("memory").queryName("shop").outputMode("complete").start()
    try {
      input.addData(evs)
      qo.processAllAvailable(); qh.processAllAvailable()
      val streamedO = s.sql(
        """SELECT event_type, bar_start, n, open, high, low, close,
          |  round(volume, 4) AS v FROM sohlc""".stripMargin)
        .collect().map(_.toSeq).toSet
      val batchO = graft.operators.Events.ohlc(batchDf)
        .select(col("event_type"), col("bar_start"), col("n"), col("open"),
          col("high"), col("low"), col("close"), round(col("volume"), 4).as("v"))
        .collect().map(_.toSeq).toSet
      assert(streamedO == batchO)
      val streamedH = s.sql(
        "SELECT win_start, event_type, n, round(total, 4) AS t FROM shop")
        .collect().map(_.toSeq).toSet
      val batchH = graft.operators.Events.hopping(batchDf)
        .select(col("win_start"), col("event_type"), col("n"),
          round(col("total"), 4).as("t"))
        .collect().map(_.toSeq).toSet
      assert(streamedH == batchH)
    } finally { qo.stop(); qh.stop() }
  }

  test("streaming ewma replaying the purchase stream converges to batch bit-exactly") {
    val s = spark
    import s.implicits._
    val batchDf = Tables.events(spark, sf)
    val want = graft.operators.Events.ewma(batchDf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val evs = batchDf
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id)).toSeq
    val input = MemoryStream[Event](s)
    val q = EventStream.ewma(input.toDS())
      .writeStream.format("memory").queryName("sewma").outputMode("append").start()
    try {
      // three micro-batches, then a far-future flusher (never sealed
      // itself, so it emits nothing) to advance the watermark past all
      // real events
      evs.grouped((evs.size + 2) / 3).foreach { chunk =>
        input.addData(chunk); q.processAllAvailable()
      }
      input.addData(Event(-1L, ts(400000000L), -1L, "purchase", 0.0))
      q.processAllAvailable()
      val got = s.sql("SELECT event_id, user_id, ewma FROM sewma")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == want,
        s"ewma stream diverged: ${got.size} vs ${want.size} points; " +
          s"sample diff ${(got diff want).take(3)} / ${(want diff got).take(3)}")
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("streaming holt replaying the purchase stream converges to batch bit-exactly") {
    val s = spark
    import s.implicits._
    val batchDf = Tables.events(spark, sf)
    val want = graft.operators.Events.holt(batchDf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val evs = batchDf
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id)).toSeq
    val input = MemoryStream[Event](s)
    val q = EventStream.holt(input.toDS())
      .writeStream.format("memory").queryName("sholt").outputMode("append").start()
    try {
      evs.grouped((evs.size + 2) / 3).foreach { chunk =>
        input.addData(chunk); q.processAllAvailable()
      }
      input.addData(Event(-1L, ts(400000000L), -1L, "purchase", 0.0))
      q.processAllAvailable()
      val got = s.sql("SELECT event_id, user_id, holt_x64k FROM sholt")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // integer ⇒ set equality IS bit-exactness — no tolerance anywhere
      assert(got == want,
        s"holt stream diverged: ${got.size} vs ${want.size} points; " +
          s"sample diff ${(got diff want).take(3)} / ${(want diff got).take(3)}")
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("streaming ewma: a late within-horizon purchase re-sorts into kernel order before sealing") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[Event](s)
    val q = EventStream.ewma(input.toDS())
      .writeStream.format("memory").queryName("sewmalate").outputMode("append").start()
    try {
      // arrive out of order WITHIN the watermark horizon: e2 (t=120)
      // before e1 (t=60); both seal only when the flusher advances the
      // watermark, and must process as (e1, e2)
      input.addData(Event(2L, ts(120), 7L, "purchase", 4.0))
      q.processAllAvailable()
      input.addData(Event(1L, ts(60), 7L, "purchase", 8.0))
      q.processAllAvailable()
      input.addData(Event(9L, ts(100000), 99L, "purchase", 0.0))
      q.processAllAvailable()
      val got = s.sql("SELECT event_id, ewma FROM sewmalate ORDER BY event_id")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == Seq((1L, 4.0), (2L, 4.0)),
        s"late arrival mis-ordered the kernel: $got") // 8/2, then 4/2+8/4
    } finally q.stop()
  }

  test("streaming compact under a 3-way batch split converges to the batch snapshot") {
    val s = spark
    import s.implicits._
    val batchDf = Tables.events(spark, sf)
    val evs = batchDf
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().toSeq
    val input = MemoryStream[Event](s)
    val q = EventStream.compact(input.toDF())
      .writeStream.format("memory").queryName("scompact").outputMode("complete").start()
    try {
      // three micro-batches: the per-key last-writer state must merge
      // across batch boundaries to the same snapshot as one-shot batch
      evs.grouped((evs.size + 2) / 3).foreach { chunk =>
        input.addData(chunk); q.processAllAvailable()
      }
      val streamed = s.sql(
        """SELECT user_id, n_changes, last_type, last_value, last_us
          |FROM scompact WHERE last_type != 'error'""".stripMargin)
        .collect().map(_.toSeq).toSet
      val batch = graft.operators.Events.compact(batchDf)
        .select(col("user_id"), col("n_changes"), col("last_type"),
          col("last_value"), col("last_us"))
        .collect().map(_.toSeq).toSet
      assert(streamed == batch,
        s"stream snapshot diverged: ${streamed.size} vs ${batch.size} keys")
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming tumbling replaying the whole events table converges to batch") {
    val s = spark
    import s.implicits._
    val batchDf = Tables.events(spark, sf)
    val evs = batchDf
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().toSeq
    val input = MemoryStream[Event](s)
    val q = EventStream.tumbling(input.toDF())
      .writeStream.format("memory").queryName("tumbfull").outputMode("complete").start()
    try {
      input.addData(evs)
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))
      val streamed = s.sql(
        "SELECT bucket, event_type, n, round(total, 4) AS t FROM tumbfull")
        .collect().map(key).toSet
      val batch = graft.operators.Events.tumbling(batchDf)
        .select(col("bucket"), col("event_type"), col("n"), round(col("total"), 4).as("t"))
        .collect().map(key).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming sessionizer replaying the whole events table converges to batch") {
    val s = spark
    import s.implicits._
    val batchDf = Tables.events(spark, sf)
    val evs = batchDf
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().toSeq
    val maxTs = evs.map(_.ts.getTime).max
    val input = MemoryStream[Event](s)
    val q = EventStream.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sessfull").outputMode("append").start()
    try {
      input.addData(evs)
      q.processAllAvailable()
      // two sentinel batches (negative user ids): the first advances the
      // watermark past every open session's timeout, the second triggers
      // the event-time timeout sweep that flushes them
      input.addData(Event(-1, new Timestamp(maxTs + 10L * 3600 * 1000), -1, "view", 0.0))
      q.processAllAvailable()
      input.addData(Event(-2, new Timestamp(maxTs + 20L * 3600 * 1000), -2, "view", 0.0))
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3), r.getDouble(4))
      val streamed = s.sql(
        """SELECT user_id, session_start, session_end, n_events,
          |  round(total_value, 4) AS tv FROM sessfull WHERE user_id >= 0""".stripMargin)
        .collect().map(key).toSet
      val batch = graft.operators.Events.sessionize(batchDf)
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n_events"), round(col("total_value"), 4).as("tv"))
        .collect().map(key).toSet
      val onlyStream = streamed -- batch
      val onlyBatch = batch -- streamed
      assert(streamed == batch,
        s"\nonly-stream(${onlyStream.size}): ${onlyStream.take(5)}" +
          s"\nonly-batch(${onlyBatch.size}): ${onlyBatch.take(5)}")
    } finally q.stop()
  }

  test("stream-stream attribution join replaying the whole events table converges to batch") {
    val s = spark
    import s.implicits._
    val batchDf = Tables.events(spark, sf)
    val evs = batchDf
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().toSeq
    val views = MemoryStream[Event](s)
    val purchases = MemoryStream[Event](s)
    val q = EventStream.attribution(views.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("attr").outputMode("append").start()
    try {
      views.addData(evs.filter(_.event_type == "view"))
      purchases.addData(evs.filter(_.event_type == "purchase"))
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getTimestamp(3), r.getTimestamp(4))
      val streamed = s.sql(
        "SELECT user_id, purchase_id, view_id, purchase_ts, view_ts FROM attr")
        .collect().map(key).toSet
      val batch = graft.operators.Events.attribution(batchDf).collect().map(key).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming LEFT-OUTER attribution join replay converges to batch (nulls included)") {
    val s = spark
    import s.implicits._
    val batchDf = Tables.events(spark, sf)
    val evs = batchDf
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().toSeq
    val maxTs = evs.map(_.ts.getTime).max
    val views = MemoryStream[Event](s)
    val purchases = MemoryStream[Event](s)
    val q = EventStream.attributionOuter(views.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("attrout").outputMode("append").start()
    try {
      views.addData(evs.filter(_.event_type == "view"))
      purchases.addData(evs.filter(_.event_type == "purchase"))
      q.processAllAvailable()
      // sentinels advance BOTH watermarks so evicted state flushes the
      // null rows for unmatched purchases
      views.addData(Event(-1, new Timestamp(maxTs + 10L * 3600 * 1000), -1, "view", 0.0))
      purchases.addData(Event(-2, new Timestamp(maxTs + 10L * 3600 * 1000), -2, "purchase", 0.0))
      q.processAllAvailable()
      views.addData(Event(-3, new Timestamp(maxTs + 20L * 3600 * 1000), -3, "view", 0.0))
      purchases.addData(Event(-4, new Timestamp(maxTs + 20L * 3600 * 1000), -4, "purchase", 0.0))
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1), Option(r.get(2)), r.getTimestamp(3), Option(r.get(4)))
      val streamed = s.sql(
        """SELECT user_id, purchase_id, view_id, purchase_ts, view_ts
          |FROM attrout WHERE user_id >= 0""".stripMargin)
        .collect().map(key).toSet
      val batch = graft.operators.Events.attributionOuter(batchDf)
        .collect().map(key).toSet
      val onlyStream = streamed -- batch
      val onlyBatch = batch -- streamed
      assert(streamed == batch,
        s"\nonly-stream(${onlyStream.size}): ${onlyStream.take(5)}" +
          s"\nonly-batch(${onlyBatch.size}): ${onlyBatch.take(5)}")
    } finally q.stop()
  }

  test("chained stateful pipeline: interval join → windowed agg replay converges to batch ev_interval") {
    val s = spark
    import s.implicits._
    val batchDf = Tables.events(spark, sf)
    val evs = batchDf
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().toSeq
    val maxTs = evs.map(_.ts.getTime).max
    val clicks = MemoryStream[Event](s)
    val purchases = MemoryStream[Event](s)
    val q = EventStream.intervalCounts(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("ivc").outputMode("append").start()
    try {
      clicks.addData(evs.filter(_.event_type == "click"))
      purchases.addData(evs.filter(_.event_type == "purchase"))
      q.processAllAvailable()
      // sentinels advance BOTH watermarks: first flush evicts join state
      // (null rows for zero-click purchases), second seals every
      // aggregation window behind the propagated watermark
      for (off <- Seq(10L, 20L, 30L)) {
        clicks.addData(Event(-off, new Timestamp(maxTs + off * 3600 * 1000), -1, "click", 0.0))
        purchases.addData(Event(-off - 100, new Timestamp(maxTs + off * 3600 * 1000), -2, "purchase", 0.0))
        q.processAllAvailable()
      }
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      val streamed = s.sql(
        "SELECT user_id, purchase_id, n_clicks, click_value FROM ivc WHERE user_id >= 0")
        .collect().map(key).toSet
      val batch = graft.operators.Events.intervalJoin(batchDf).collect().map(key).toSet
      val onlyStream = streamed -- batch
      val onlyBatch = batch -- streamed
      assert(streamed == batch,
        s"\nonly-stream(${onlyStream.size}): ${onlyStream.take(5)}" +
          s"\nonly-batch(${onlyBatch.size}): ${onlyBatch.take(5)}")
    } finally q.stop()
  }

  test("session_window expression runs under streaming and converges to batch") {
    val s = spark
    import s.implicits._
    val batchDf = Tables.events(spark, sf)
    val evs = batchDf
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().toSeq
    val maxTs = evs.map(_.ts.getTime).max
    val input = MemoryStream[Event](s)
    val q = input.toDF()
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"),
        session_window(col("ts"), graft.operators.Events.SessionGapInterval).as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"), col("n_events"))
      .writeStream.format("memory").queryName("swstream").outputMode("append").start()
    try {
      input.addData(evs)
      q.processAllAvailable()
      // sentinel advances the watermark so every real session finalizes
      input.addData(Event(-1, new Timestamp(maxTs + 10L * 3600 * 1000), -1, "view", 0.0))
      q.processAllAvailable()
      val streamed = s.sql(
        "SELECT user_id, session_start, n_events FROM swstream WHERE user_id >= 0")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
      val batch = graft.operators.Events.sessionizeSW(batchDf)
        .select("user_id", "session_start", "n_events")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming as-of replaying the whole events table converges to batch") {
    val s = spark
    import s.implicits._
    val batchDf = Tables.events(spark, sf)
    val evs = batchDf
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().toSeq
    val maxTs = evs.map(_.ts.getTime).max
    val input = MemoryStream[Event](s)
    val q = EventStream.asof(input.toDS())
      .writeStream.format("memory").queryName("asofstream").outputMode("append").start()
    try {
      input.addData(evs)
      q.processAllAvailable()
      // sentinels: first advances the watermark past every pending
      // purchase, second runs the event-time-timeout sweep that flushes
      // users untouched by later batches
      input.addData(Event(-1, new Timestamp(maxTs + 10L * 3600 * 1000), -1, "view", 0.0))
      q.processAllAvailable()
      input.addData(Event(-2, new Timestamp(maxTs + 20L * 3600 * 1000), -2, "view", 0.0))
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val streamed = s.sql(
        "SELECT user_id, purchase_id, view_id FROM asofstream WHERE user_id >= 0")
        .collect().map(key).toSet
      val batch = graft.operators.Events.asofAttribution(batchDf).collect().map(key).toSet
      val onlyStream = streamed -- batch
      val onlyBatch = batch -- streamed
      assert(streamed == batch,
        s"\nonly-stream(${onlyStream.size}): ${onlyStream.take(5)}" +
          s"\nonly-batch(${onlyBatch.size}): ${onlyBatch.take(5)}")
    } finally q.stop()
  }

  test("streaming as-of emits nothing before the watermark seals a purchase, then matches the latest earlier view") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[Event](s)
    val q = EventStream.asof(input.toDS())
      .writeStream.format("memory").queryName("asofsmall").outputMode("append").start()
    try {
      // purchase arrives BEFORE the out-of-order later view; the correct
      // match (view 2, the latest <= purchase) must win anyway
      input.addData(
        Event(1, ts(0), 10, "view", 0.0),
        Event(3, ts(120), 10, "purchase", 9.0))
      q.processAllAvailable()
      assert(s.sql("SELECT * FROM asofsmall").count() == 0) // not sealed yet
      input.addData(Event(2, ts(60), 10, "view", 0.0)) // out-of-order view
      q.processAllAvailable()
      // advance watermark + timeout sweep
      input.addData(Event(-1, ts(100000), -1, "view", 0.0))
      q.processAllAvailable()
      input.addData(Event(-2, ts(200000), -2, "view", 0.0))
      q.processAllAvailable()
      val rows = s.sql(
        "SELECT user_id, purchase_id, view_id FROM asofsmall WHERE user_id >= 0").collect()
      assert(rows.length == 1)
      assert(rows(0).getLong(1) == 3L && rows(0).getLong(2) == 2L)
    } finally q.stop()
  }

  test("streaming retention (two chained stateful operators) replayed day-ordered converges to batch") {
    val s = spark
    import s.implicits._
    val batchDf = Tables.events(spark, sf)
    val evs = batchDf
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().toSeq.sortBy(_.ts.getTime)
    val maxTs = evs.map(_.ts.getTime).max
    val weekMs = 7L * 24 * 3600 * 1000
    val input = MemoryStream[Event](s)
    // the chain intentionally emits marks behind the global watermark
    // (bounded: 2-day seal lag vs 10-day downstream horizon) — disable
    // the blanket pattern check for this query, as documented on
    // EventStream.retention
    // both re-checked per micro-batch: stay set for the query's
    // lifetime (documented on EventStream.retention)
    val checkConf = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    val wmConf = "spark.sql.streaming.multipleWatermarkPolicy"
    s.conf.set(checkConf, "false")
    s.conf.set(wmConf, "max")
    val q = EventStream.retention(input.toDF())
      .writeStream.format("memory").queryName("retstream").outputMode("append").start()
    try {
      // ordered-chunk replay (streams arrive roughly in order — the
      // watermark contract) with each chunk's CONTENTS shuffled: the
      // intra-batch disorder the operator itself must absorb; the
      // frontier-stamped marks make chunk size immaterial for lateness
      val rnd = new scala.util.Random(7)
      evs.grouped(evs.size / 4 + 1).foreach { chunk =>
        input.addData(rnd.shuffle(chunk)); q.processAllAvailable()
      }
      // sentinels: advance the watermark so the last days seal, then
      // once more so their (sealed_at, day) groups evict
      (1 to 3).foreach { i =>
        input.addData(Event(-i, new Timestamp(maxTs + i * weekMs), -i, "view", 0.0))
        q.processAllAvailable()
      }
      def key(r: org.apache.spark.sql.Row) = (r.getTimestamp(0), r.getLong(1), r.getLong(2))
      val rows = s.sql(
        s"SELECT day, active, retained FROM retstream WHERE day <= timestamp_millis($maxTs)")
        .collect().map(key)
      // exactly one row per day: all of a day's marks share one sealed_at
      assert(rows.map(_._1).distinct.length == rows.length,
        s"duplicate day rows: ${rows.groupBy(_._1).filter(_._2.length > 1).keys}")
      val streamed = rows.toSet
      val batch = graft.operators.Events.retention(batchDf)
        .select(col("day"), col("active"), col("retained"))
        .collect().map(key).toSet
      val onlyStream = streamed -- batch
      val onlyBatch = batch -- streamed
      assert(streamed == batch,
        s"\nonly-stream(${onlyStream.size}): ${onlyStream.take(5)}" +
          s"\nonly-batch(${onlyBatch.size}): ${onlyBatch.take(5)}")
    } finally {
      q.stop(); s.conf.set(checkConf, "true"); s.conf.set(wmConf, "min")
    }
  }

  test("streaming as-of converges under shuffled intra-batch order (seeded)") {
    // time-ordered chunks whose CONTENTS arrive in random order — the
    // disorder watermark semantics must absorb (between-batch order is
    // the watermark contract; within-batch order is the operator's job)
    val s = spark
    import s.implicits._
    val batchDf = Tables.events(spark, sf)
    val evs = batchDf
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().toSeq.sortBy(_.ts.getTime)
    val maxTs = evs.map(_.ts.getTime).max
    val rnd = new scala.util.Random(42)
    val input = MemoryStream[Event](s)
    val q = EventStream.asof(input.toDS())
      .writeStream.format("memory").queryName("asofshuf").outputMode("append").start()
    try {
      evs.grouped(evs.size / 5 + 1).foreach { chunk =>
        input.addData(rnd.shuffle(chunk)); q.processAllAvailable()
      }
      (1 to 2).foreach { i =>
        input.addData(Event(-i, new Timestamp(maxTs + i * 10L * 3600 * 1000), -i, "view", 0.0))
        q.processAllAvailable()
      }
      def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val streamed = s.sql(
        "SELECT user_id, purchase_id, view_id FROM asofshuf WHERE user_id >= 0")
        .collect().map(key).toSet
      val batch = graft.operators.Events.asofAttribution(batchDf).collect().map(key).toSet
      assert(streamed == batch,
        s"diff: +${(streamed -- batch).take(3)} -${(batch -- streamed).take(3)}")
    } finally q.stop()
  }

  test("streaming as-of drops purchases with no view at-or-before them (same as batch)") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[Event](s)
    val q = EventStream.asof(input.toDS())
      .writeStream.format("memory").queryName("asofnone").outputMode("append").start()
    try {
      // purchase BEFORE any view; a later view must not match it
      input.addData(
        Event(1, ts(0), 10, "purchase", 5.0),
        Event(2, ts(60), 10, "view", 0.0))
      q.processAllAvailable()
      input.addData(Event(-1, ts(100000), -1, "view", 0.0))
      q.processAllAvailable()
      input.addData(Event(-2, ts(200000), -2, "view", 0.0))
      q.processAllAvailable()
      assert(s.sql("SELECT * FROM asofnone WHERE user_id >= 0").count() == 0)
    } finally q.stop()
  }

  test("streaming retention marks: isolated and consecutive days seal with correct retained flags") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[Event](s)
    val dayMs = 24L * 3600 * 1000
    def dts(day: Int, sec: Long) = new Timestamp(1704067200000L + day * dayMs + sec * 1000)
    val q = EventStream.retentionMarks(input.toDF()).toDF()
      .writeStream.format("memory").queryName("marksedge").outputMode("append").start()
    try {
      // user 10: days {0, 1, 3} → retained(0)=true, retained(1)=false,
      // retained(3)=false; day 2 absent entirely
      input.addData(
        Event(1, dts(0, 10), 10, "view", 0.0),
        Event(2, dts(1, 20), 10, "view", 0.0),
        Event(3, dts(3, 30), 10, "view", 0.0))
      q.processAllAvailable()
      (1 to 2).foreach { i =>
        input.addData(Event(-i, dts(10 + i * 3, 0), -i, "view", 0.0))
        q.processAllAvailable()
      }
      val marks = s.sql(
        "SELECT day, retained FROM marksedge WHERE user_id = 10 ORDER BY day")
        .collect().map(r => (r.getTimestamp(0).getTime - 1704067200000L) / dayMs -> r.getBoolean(1))
      assert(marks.toSeq == Seq(0L -> true, 1L -> false, 3L -> false), marks.mkString(","))
    } finally q.stop()
  }

  test("streaming scd2 replaying the whole events table converges to the batch closed versions") {
    val s = spark
    import s.implicits._
    val batchDf = Tables.events(spark, sf)
    val evs = batchDf
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().toSeq.sortBy(_.ts.getTime)
    val input = MemoryStream[Event](s)
    val q = EventStream.scd2(input.toDS())
      .writeStream.format("memory").queryName("scdstream").outputMode("append").start()
    try {
      evs.grouped(evs.size / 3 + 1).foreach { chunk =>
        input.addData(chunk); q.processAllAvailable()
      }
      // two far-future sentinels: advance the watermark past every real
      // event, then fire the event-time timeouts that sealing left armed
      val far = evs.map(_.ts.getTime).max
      input.addData(Event(900001L, new Timestamp(far + 48L * 3600 * 1000), 999999L, "purchase", 1.0))
      q.processAllAvailable()
      input.addData(Event(900002L, new Timestamp(far + 96L * 3600 * 1000), 999999L, "purchase", 2.0))
      q.processAllAvailable()
      // batch closed versions (is_current = 0) == streamed emissions,
      // column for column (sentinel user excluded)
      val got = s.sql(
        """SELECT user_id, event_id, value, valid_from, valid_to
          |FROM scdstream WHERE user_id < 999999""".stripMargin)
      val want = graft.operators.Events.scd2(batchDf)
        .where(col("is_current") === 0)
        .select("user_id", "event_id", "value", "valid_from", "valid_to")
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"stream/batch scd2 divergence: stream=${got.count()} batch=${want.count()}")
    } finally q.stop()
  }

  test("streaming transitions replaying the whole events table converge to the batch matrix") {
    val s = spark
    import s.implicits._
    val batchDf = Tables.events(spark, sf)
    val evs = batchDf
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().toSeq.sortBy(_.ts.getTime)
    val input = MemoryStream[Event](s)
    val q = EventStream.transitions(input.toDS())
      .writeStream.format("memory").queryName("transtream").outputMode("append").start()
    try {
      evs.grouped(evs.size / 3 + 1).foreach { chunk =>
        input.addData(chunk); q.processAllAvailable()
      }
      // sentinels advance the watermark past every real event and fire
      // the armed event-time timeouts (sentinel user excluded below)
      val far = evs.map(_.ts.getTime).max
      input.addData(Event(900001L, new Timestamp(far + 48L * 3600 * 1000), 999999L, "view", 0.0))
      q.processAllAvailable()
      input.addData(Event(900002L, new Timestamp(far + 96L * 3600 * 1000), 999999L, "view", 0.0))
      q.processAllAvailable()
      // streamed pair multiset, aggregated == the batch matrix's counts
      val got = s.sql(
        """SELECT src, dst, count(*) AS n FROM transtream
          |WHERE user_id < 999999 GROUP BY src, dst""".stripMargin)
      val want = graft.operators.Events.transitions(batchDf).select("src", "dst", "n")
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"stream/batch transitions divergence: stream=${got.count()} batch=${want.count()}")
    } finally q.stop()
  }

  test("streaming funnel flags replaying the whole events table converge to the batch funnel") {
    val s = spark
    import s.implicits._
    val batchDf = Tables.events(spark, sf)
    val evs = batchDf
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().toSeq.sortBy(_.ts.getTime)
    val input = MemoryStream[Event](s)
    val q = EventStream.funnelFlags(input.toDS())
      .writeStream.format("memory").queryName("funstream").outputMode("update").start()
    try {
      evs.grouped(evs.size / 3 + 1).foreach { chunk =>
        input.addData(chunk); q.processAllAvailable()
      }
      // latest flags per user = OR over emissions (flags are monotone)
      val counts = s.sql(
        """SELECT count(CASE WHEN v THEN 1 END) AS step_view,
          |  count(CASE WHEN v AND c THEN 1 END) AS step_click,
          |  count(CASE WHEN v AND c AND p THEN 1 END) AS step_purchase
          |FROM (SELECT user_id, max(saw_view) v, max(saw_click) c,
          |        max(saw_purchase) p
          |      FROM funstream GROUP BY user_id)""".stripMargin)
        .collect()(0)
      val b = graft.operators.Events.funnel(batchDf).collect()(0)
      assert((counts.getLong(0), counts.getLong(1), counts.getLong(2)) ==
        (b.getLong(0), b.getLong(1), b.getLong(2)))
    } finally q.stop()
  }

  test("streaming dedupe drops at-least-once re-deliveries") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[Event](s)
    val q = EventStream.dedupe(input.toDF())
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      val batch = Seq(
        Event(1, ts(0), 10, "view", 1.0),
        Event(2, ts(5), 10, "click", 2.0))
      input.addData(batch ++ batch) // duplicated delivery in one batch
      q.processAllAvailable()
      input.addData(batch) // and re-delivered again in a later batch
      q.processAllAvailable()
      val n = s.sql("SELECT count(*) FROM dedup").collect()(0).getLong(0)
      assert(n == 2)
    } finally q.stop()
  }

  test("streaming parquet file sink round-trips the replayed events with a checkpoint") {
    val outDir = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val q = EventStream.readEventStream(spark, sf)
      .writeStream.format("parquet")
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start(outDir)
    try {
      q.processAllAvailable()
      val written = spark.read.parquet(outDir)
      assert(written.count() == Tables.events(spark, sf).count())
    } finally q.stop()
  }

  test("file-stream reader replays the parquet events with proper timestamps") {
    val stream = EventStream.readEventStream(spark, sf)
    assert(stream.isStreaming)
    val q = stream.select(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("evcount").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val n = spark.sql("SELECT n FROM evcount").collect()(0).getLong(0)
      assert(n == Tables.events(spark, sf).count())
    } finally q.stop()
  }

  test("the reference wordcount job runs UNCHANGED as a stream and converges to batch") {
    // the strongest batch/stream twin statement the library makes: the
    // SAME operator (WordCount.wordCount, declarative groupBy/agg/sort)
    // is the streaming query — complete-mode running aggregation, no
    // twin code path to diverge
    val s = spark
    import s.implicits._
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val rows = docs.as[(Long, String)].collect().toSeq
    val input = MemoryStream[(Long, String)](s)
    val q = graft.operators.WordCount.wordCount(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("wcstream").outputMode("complete").start()
    try {
      // shuffled micro-batches: arrival order must not matter
      val shuffled = new scala.util.Random(7).shuffle(rows)
      val (b1, rest) = shuffled.splitAt(rows.length / 3)
      val (b2, b3) = rest.splitAt(rows.length / 3)
      for (b <- Seq(b1, b2, b3) if b.nonEmpty) { input.addData(b); q.processAllAvailable() }
      val streamed = s.sql("SELECT word, cnt FROM wcstream").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val batch = graft.operators.WordCount.wordCount(docs).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }
}
