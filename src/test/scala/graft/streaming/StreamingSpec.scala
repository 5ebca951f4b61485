package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Structured Streaming faces of the batch-verified operators
  * (SURVEY.md §2.3 #48-49): the streaming plan over a MemoryStream must
  * produce exactly the batch answer on the same data.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private val eventsLocal: Seq[EventStreams.Event] = Seq(
    // user 1: two sessions (gap > 30 min between minute 20 and 70)
    EventStreams.Event(1L, ts(0), 1L, "click", 1.0),
    EventStreams.Event(2L, ts(10), 1L, "click", 2.0),
    EventStreams.Event(3L, ts(20), 1L, "view", 3.0),
    EventStreams.Event(4L, ts(70), 1L, "click", 4.0),
    EventStreams.Event(5L, ts(80), 1L, "view", 5.0),
    // user 2: one session spanning an hour boundary
    EventStreams.Event(6L, ts(55), 2L, "click", 6.0),
    EventStreams.Event(7L, ts(65), 2L, "click", 7.0))

  test("streaming attribution carries the last touch across batches " +
      "and equals the batch face") {
    // purchases interleave with touches; the batch split below puts the
    // crediting touch and its purchase in DIFFERENT micro-batches, so a
    // pass requires the state really carrying forward
    val evs = Seq(
      EventStreams.Event(1L, ts(0), 1L, "view", 1.0),
      EventStreams.Event(2L, ts(5), 1L, "click", 2.0),
      EventStreams.Event(3L, ts(10), 1L, "purchase", 10.5), // click credits
      EventStreams.Event(4L, ts(15), 2L, "purchase", 3.0),  // no touch: DIRECT
      EventStreams.Event(5L, ts(20), 1L, "signup", 0.0),
      // batch boundary here
      EventStreams.Event(6L, ts(25), 1L, "purchase", 7.25), // signup from batch 1
      EventStreams.Event(7L, ts(30), 2L, "view", 0.0),
      EventStreams.Event(8L, ts(35), 2L, "purchase", 1.0))  // view credits
    val batch = EventStreams.attributionBatch(evs.toDF())
      .collect().map(_.toString).sorted.toSeq

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Event]
    val q = EventStreams.attributionStream(spark, mem.toDS())
      .toDF("user_id", "event_id", "credited", "cents")
      .writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    try {
      mem.addData(evs.take(5): _*)
      q.processAllAvailable()
      mem.addData(evs.drop(5): _*)
      q.processAllAvailable()
      val streamed = spark.table("attr_out").collect().map(_.toString).sorted
      assert(streamed.toSeq == batch, s"streamed $streamed != batch $batch")
      // the cross-batch carry specifically: purchase 6 credits batch 1's
      // signup, not DIRECT
      val p6 = spark.table("attr_out").filter(col("event_id") === 6L)
        .head().getAs[String]("credited")
      assert(p6 == "signup")
    } finally q.stop()
  }

  test("streaming windowed agg equals batch windowed agg") {
    val batch = EventStreams.windowAgg(eventsLocal.toDF())
      .collect().map(_.toString).sorted

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Event]
    val q = EventStreams.windowAggStream(mem.toDF())
      .writeStream.format("memory").queryName("win_out")
      .outputMode("complete").start()
    try {
      mem.addData(eventsLocal: _*)
      q.processAllAvailable()
      val streamed = spark.table("win_out").collect().map(_.toString).sorted
      assert(streamed.toSeq == batch.toSeq)
    } finally q.stop()
  }

  test("windowed top-k: the streaming count layer converges to batch counts " +
    "across batches; ranking the final state equals the batch top-k") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Event]
    val q = EventStreams.windowTopKCounts(
      mem.toDF().withWatermark("ts", "10 minutes"))
      .writeStream.format("memory").queryName("topk_counts")
      .outputMode("complete").start()
    try {
      mem.addData(eventsLocal.take(3): _*)
      q.processAllAvailable()
      mem.addData(eventsLocal.drop(3): _*)
      q.processAllAvailable()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("day")).orderBy(col("n").desc, col("event_type"))
      val streamed = spark.table("topk_counts")
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 2)
        .collect().map(_.toString).sorted
      val batch = EventStreams.windowTopK(eventsLocal.toDF(), k = 2)
        .collect().map(_.toString).sorted
      assert(streamed.toSeq == batch.toSeq)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("streaming drift monitor: psi over streamed counts equals the batch " +
    "psi, including the cross-batch count merge") {
    val batchDf = eventsLocal.toDF()
    val baseline = batchDf.groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("bn"))
    val batch = EventStreams.psiByDay(
        EventStreams.windowTopKCounts(batchDf), baseline)
      .collect().map(_.toString).sorted.toSeq

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Event]
    val q = EventStreams.windowTopKCounts(
      mem.toDF().withWatermark("ts", "10 minutes"))
      .writeStream.format("memory").queryName("psi_counts")
      .outputMode("complete").start()
    try {
      // split so day-1 counts accumulate ACROSS batches — the merged
      // state, not any single batch, must produce the batch psi
      mem.addData(eventsLocal.take(3): _*)
      q.processAllAvailable()
      mem.addData(eventsLocal.drop(3): _*)
      q.processAllAvailable()
      val streamed = EventStreams.psiByDay(spark.table("psi_counts"), baseline)
        .collect().map(_.toString).sorted.toSeq
      assert(streamed == batch && batch.nonEmpty)
    } finally q.stop()
  }

  test("quality-gate routing on a stream equals batch: stateless, append mode, " +
    "per-row dead-letter labels") {
    import graft.operators.Expectations._
    val rules = Seq(
      NotNull("user_id"),
      InRange("value", 0.0, 100.0),
      InSet("event_type", Seq("click", "view")))
    val rows = Seq(
      EventStreams.Event(1L, ts(1), 10L, "click", 10.0),
      EventStreams.Event(2L, ts(2), 20L, "error", 20.0), // in_set violation
      EventStreams.Event(3L, ts(3), 30L, "view", 500.0), // in_range violation
      EventStreams.Event(4L, ts(4), 40L, "error", 900.0), // both
      EventStreams.Event(5L, ts(5), 50L, "view", 50.0))
    val batch = route(rows.toDF(), rules)
      .select(col("event_id"), col("valid"), col("violated"))
      .collect().map(_.toString).sorted
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Event]
    // the IDENTICAL call compiles to a stateless streaming plan: no
    // watermark, no state store, append mode
    val q = route(mem.toDF(), rules)
      .select(col("event_id"), col("valid"), col("violated"))
      .writeStream.format("memory").queryName("gate_out")
      .outputMode("append").start()
    try {
      mem.addData(rows.take(2): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(2): _*)
      q.processAllAvailable()
      val streamed = spark.table("gate_out").collect().map(_.toString).sorted
      assert(streamed.toSeq == batch.toSeq)
      // routing facts: events 2/3/4 dead with the right labels
      val byId = spark.table("gate_out").collect()
        .map(r => r.getLong(0) -> (r.getBoolean(1), r.getSeq[String](2))).toMap
      assert(byId(1L)._1 && byId(5L)._1)
      assert(byId(2L)._2 == Seq("in_set(event_type)"))
      assert(byId(3L)._2 == Seq("in_range(value,0.0,100.0)"))
      assert(byId(4L)._2.toSet ==
        Set("in_range(value,0.0,100.0)", "in_set(event_type)"))
    } finally q.stop()
  }

  test("streaming sessionization (flatMapGroupsWithState) matches batch sessions") {
    // batch truth
    val batch = EventStreams.sessionizeBatch(eventsLocal.toDF())
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_id"),
        r.getAs[Long]("n_events")))
      .toSet

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Event]
    val q = EventStreams.sessionizeStream(spark, mem.toDS())
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      mem.addData(eventsLocal: _*)
      q.processAllAvailable()
      // Append mode emits only CLOSED sessions; drain open state via the
      // helper and union for the complete picture.
      val closed = spark.table("sess_out").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_id"),
          r.getAs[Long]("n_events"))).toSet
      val all = EventStreams.drainOpenSessions(eventsLocal)
        .map(s => (s.user_id, s.session_id, s.n_events)).toSet
      assert(closed.subsetOf(all))
      assert(all == batch)
      // user 1's first session (3 events) must have been closed by the stream
      assert(closed.contains((1L, 0L, 3L)))
    } finally q.stop()
  }

  test("native session_window: a silence of EXACTLY the gap still merges " +
      "(inclusive boundary, like the lag form's >); end = last_ts + gap") {
    val gapMin = (EventStreams.SessionGapSeconds / 60).toInt
    val events = Seq(
      // u1: 10-min gap merges; a silence of EXACTLY the gap ALSO merges
      // (touching [t, t+gap) windows coalesce — inclusive boundary)
      (1L, ts(0), 1L, "click", 1.0),
      (2L, ts(10), 1L, "click", 1.0),
      (3L, ts(10 + gapMin), 1L, "click", 1.0),
      // u2: a silence one minute PAST the gap splits
      (4L, ts(0), 2L, "click", 1.0),
      (5L, ts(gapMin + 1), 2L, "click", 1.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventStreams.sessionWindowAgg(events)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      .sortBy(x => (x._1, x._2.getTime))
    assert(out.length == 3)
    // u1: ONE merged session [0, 10+2gap) of 3 events
    assert(out(0) == ((1L, ts(0), ts(10 + 2 * gapMin), 3L)))
    // u2: split into two singleton sessions
    assert(out(1) == ((2L, ts(0), ts(gapMin), 1L)))
    assert(out(2) == ((2L, ts(gapMin + 1), ts(2 * gapMin + 1), 1L)))
  }

  test("native session_window stream (append) emits the batch closure once " +
      "the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val events = MemoryStream[EventStreams.Event]
    val q = EventStreams.sessionWindowStream(events.toDF())
      .writeStream.format("memory").queryName("snw").outputMode("append").start()
    try {
      events.addData(eventsLocal: _*)
      q.processAllAvailable()
      // advance the watermark far past every session end, then fire the
      // now-closable sessions
      events.addData(EventStreams.Event(99L, ts(60 * 24), 9L, "click", 0.0))
      q.processAllAvailable()
      val got = spark.table("snw").filter(col("user_id") =!= 9L)
      val batch = EventStreams.sessionWindowAgg(
        eventsLocal.toDF().select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value")))
      assert(got.collect().toSet == batch.collect().toSet)
      assert(got.count() == 3) // u1 two sessions + u2 one
    } finally {
      q.stop()
      spark.catalog.dropTempView("snw")
    }
  }

  test("watermark drops late data once passed (append mode)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Event]
    val q = EventStreams.windowAggStream(mem.toDF())
      .writeStream.format("memory").queryName("late_out")
      .outputMode("append").start()
    try {
      // batch 1: two events in window 00:00, one at 02:00 → watermark 01:50
      mem.addData(
        EventStreams.Event(1L, ts(5), 1L, "click", 1.0),
        EventStreams.Event(2L, ts(30), 1L, "click", 1.0),
        EventStreams.Event(3L, ts(120), 1L, "click", 1.0))
      q.processAllAvailable()
      // batch 2: event 4 is LATE (00:15 < watermark) → must be dropped;
      // event 5 advances the watermark further
      mem.addData(
        EventStreams.Event(4L, ts(15), 1L, "click", 100.0),
        EventStreams.Event(5L, ts(190), 1L, "click", 1.0))
      q.processAllAvailable()
      val w0 = spark.table("late_out").collect()
        .find(_.getTimestamp(0) == ts(0))
      assert(w0.isDefined, "window 00:00 should have finalized")
      assert(w0.get.getAs[Long]("n_events") == 2L) // late event excluded
      assert(w0.get.getAs[Double]("total_value") == 2.0)
    } finally q.stop()
  }

  test("streaming exact dedup emits only first occurrences across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Doc]
    val q = EventStreams.dedupStream(spark, mem.toDS())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      mem.addData(
        EventStreams.Doc(1L, "alpha"), EventStreams.Doc(2L, "beta"),
        EventStreams.Doc(3L, "alpha")) // in-batch dup
      q.processAllAvailable()
      mem.addData(
        EventStreams.Doc(4L, "beta"), // cross-batch dup
        EventStreams.Doc(5L, "gamma"))
      q.processAllAvailable()
      val out = spark.table("dedup_out").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).toSet
      assert(out == Set((1L, "alpha"), (2L, "beta"), (5L, "gamma")))
    } finally q.stop()
  }

  test("streaming dedup bootstrapped from the batch seen-index: one shared seen-set") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Dedup
    val corpus = Seq((1L, "alpha doc"), (2L, "beta doc")).toDF("doc_id", "text")
    val wh = java.nio.file.Files.createTempDirectory("graft_seenidx_st_").toString
    Dedup.writeSeenIndex(corpus, "seen_idx_st", s"$wh/seen_idx_st", buckets = 4)
    val delta = Seq(
      EventStreams.Doc(10L, "alpha doc"), // in the index → dropped
      EventStreams.Doc(11L, "fresh doc"), // absent → admitted
      EventStreams.Doc(12L, "fresh doc"), // in-stream dup → dropped
      EventStreams.Doc(13L, "other doc")) // absent → admitted
    try {
      val mem = MemoryStream[EventStreams.Doc]
      mem.addData(delta)
      val q = EventStreams.dedupStreamIndexed(spark, mem.toDS(), "seen_idx_st")
        .writeStream.format("memory").queryName("dedup_idx_out")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val admitted = spark.table("dedup_idx_out").collect()
          .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).toSet
        // EXACTLY the index-absent contents, first occurrence wins
        assert(admitted == Set((11L, "fresh doc"), (13L, "other doc")))
        // cross-posture consistency: the batch increment over the same
        // index admits the same contents
        val batchAdmitted = Dedup.incrementalIndexed(spark, "seen_idx_st",
          delta.toDF()).collect().map(_.getAs[Long]("doc_id")).toSet
        assert(batchAdmitted == Set(11L, 13L))
        // close the loop across the BOUNDARY: append the batch-admitted
        // digests (the shared index row: h + the streaming h1/h2 pair)...
        Dedup.incrementalIndexed(spark, "seen_idx_st", delta.toDF())
          .select(col("h"), col("h1"), col("h2"))
          .write.bucketBy(4, "h").sortBy("h")
          .option("path", s"$wh/seen_idx_st").mode("append")
          .saveAsTable("seen_idx_st")
      } finally q.stop()
      // ...then a RESTARTED stream (fresh checkpoint, state rebuilt from
      // the index) over the same delta admits nothing: idempotence holds
      // across the batch/stream boundary
      val mem2 = MemoryStream[EventStreams.Doc]
      mem2.addData(delta)
      val q2 = EventStreams.dedupStreamIndexed(spark, mem2.toDS(), "seen_idx_st")
        .writeStream.format("memory").queryName("dedup_idx_out2")
        .outputMode("append").start()
      try {
        q2.processAllAvailable()
        assert(spark.table("dedup_idx_out2").isEmpty,
          "restarted stream re-admitted docs the index already holds")
      } finally q2.stop()
    } finally {
      spark.sql("DROP TABLE IF EXISTS seen_idx_st")
      Seq("dedup_idx_out", "dedup_idx_out2").foreach { v =>
        try spark.catalog.dropTempView(v) catch { case _: Exception => }
      }
    }
  }

  test("stream-static enrichment: totals update incrementally across batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val nation = (0 until 25).map(i => (i, s"N$i")).toDF("n_nationkey", "n_name")
    val mem = MemoryStream[EventStreams.Event]
    val name = "enrich_spec_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = EventStreams.enrichAgg(mem.toDF(), nation)
      .writeStream.format("memory").queryName(name).outputMode("complete").start()
    try {
      def totals(): Map[String, (Long, Double)] =
        spark.table(name).collect().map(r => r.getAs[String]("n_name") ->
          ((r.getAs[Long]("n_events"), r.getAs[Double]("total_value")))).toMap
      // batch 1: users 1 (→N1) and 2 (→N2)
      mem.addData(eventsLocal.filter(_.event_id <= 3L))
      q.processAllAvailable()
      assert(totals() == Map("N1" -> ((3L, 6.0))))
      // batch 2: the static side stays joined; running totals grow in place
      mem.addData(eventsLocal.filter(_.event_id > 3L))
      q.processAllAvailable()
      assert(totals() == Map("N1" -> ((5L, 15.0)), "N2" -> ((2L, 13.0))))
      // streaming complete-mode output equals the batch face on same data
      val batch = EventStreams.enrichAgg(eventsLocal.toDF(), nation)
        .collect().map(r => r.getAs[String]("n_name") ->
          ((r.getAs[Long]("n_events"), r.getAs[Double]("total_value")))).toMap
      assert(totals() == batch)
    } finally {
      q.stop()
      spark.catalog.dropTempView(name)
    }
  }

  test("batch sessionization splits on >30-minute gaps") {
    val out = EventStreams.sessionizeBatch(eventsLocal.toDF())
      .orderBy("user_id", "session_id").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("n_events") == 3L) // user1 session 0
    assert(out(1).getAs[Long]("n_events") == 2L) // user1 session 1
    assert(out(2).getAs[Long]("n_events") == 2L) // user2 session 0
  }

  // With ProcessingTimeTimeout the engine self-triggers timeout-sweep
  // batches continuously, so processAllAvailable never settles — poll the
  // sink with a deadline instead.
  private def eventually(ms: Long = 30000)(cond: => Boolean): Unit = {
    val end = System.currentTimeMillis + ms
    while (!cond && System.currentTimeMillis < end) Thread.sleep(100)
    assert(cond, s"condition not met within $ms ms")
  }

  test("dedup state TTL evicts idle hashes: duplicate re-admitted after expiry") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Doc]
    val q = EventStreams.dedupStream(spark, mem.toDS(), ttl = Some("1 millisecond"))
      .writeStream.format("memory").queryName("dedup_ttl_out")
      .outputMode("append").start()
    def ids: Set[Long] =
      spark.table("dedup_ttl_out").collect().map(_.getAs[Long]("doc_id")).toSet
    try {
      mem.addData(EventStreams.Doc(1L, "alpha"))
      eventually()(ids.contains(1L))
      Thread.sleep(300) // 1 ms TTL lapses; the sweep evicts alpha's state
      mem.addData(EventStreams.Doc(3L, "alpha")) // same content, state gone
      eventually()(ids.contains(3L)) // re-admitted: dedup-within-a-window
      assert(ids == Set(1L, 3L))
    } finally q.stop()
  }

  test("event-time sessionization: a fast replay closes sessions by event time, " +
      "matching the batch face") {
    // The 100 TB reprocessing case: the whole history arrives as one burst
    // (wall-clock ~instant), so a processing-time idle timeout would never
    // fire mid-replay — only the WATERMARK can close sessions correctly.
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Event]
    val q = EventStreams.sessionizeStreamEventTime(spark, mem.toDS())
      .writeStream.format("memory").queryName("sess_et_out")
      .outputMode("append").start()
    try {
      // batch 1: the full burst (out of order — the fold sorts per user)
      mem.addData(scala.util.Random.shuffle(eventsLocal): _*)
      q.processAllAvailable()
      // batches 2-3: an unrelated user advances the watermark past every
      // session's last+gap; the timeouts fire on the batch AFTER the
      // watermark moves
      mem.addData(EventStreams.Event(100L, ts(200), 99L, "click", 0.0))
      q.processAllAvailable()
      mem.addData(EventStreams.Event(101L, ts(201), 99L, "click", 0.0))
      q.processAllAvailable()
      val closed = spark.table("sess_et_out").collect()
        .filter(_.getAs[Long]("user_id") != 99L)
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_id"),
          r.getAs[Long]("n_events"), r.getAs[Timestamp]("session_start"),
          r.getAs[Timestamp]("session_end"))).toSet
      val batch = EventStreams.sessionizeBatch(eventsLocal.toDF())
        .collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_id"),
          r.getAs[Long]("n_events"), r.getAs[Timestamp]("session_start"),
          r.getAs[Timestamp]("session_end"))).toSet
      assert(closed == batch,
        s"replayed stream sessions $closed != batch face $batch")
    } finally q.stop()
  }

  test("event-time dedup TTL: eviction tracks the event clock, not the wall clock") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.TsDoc]
    val q = EventStreams.dedupStreamEventTime(spark, mem.toDS(),
      ttl = "30 minutes", watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("dedup_et_out")
      .outputMode("append").start()
    def ids: Set[Long] =
      spark.table("dedup_et_out").collect().map(_.getAs[Long]("doc_id")).toSet
    try {
      mem.addData(EventStreams.TsDoc(ts(0), 1L, "alpha"),
        EventStreams.TsDoc(ts(1), 2L, "beta"),
        EventStreams.TsDoc(ts(2), 3L, "alpha")) // 2-min gap < TTL → dropped
      q.processAllAvailable()
      // alpha re-sighted at minute 100: the EVENT-TIME gap (98 min) exceeds
      // the TTL, so it is re-admitted even though the watermark (and any
      // timeout) hasn't moved yet — a live run whose watermark had caught
      // up would have evicted and re-admitted identically
      mem.addData(EventStreams.TsDoc(ts(100), 4L, "alpha"))
      q.processAllAvailable()
      // watermark is now 90 min: beta (lastSeen minute 1, TTL 30 min) is
      // evicted this batch; alpha (lastSeen minute 100) survives
      mem.addData(EventStreams.TsDoc(ts(101), 5L, "gamma"))
      q.processAllAvailable()
      // beta re-admitted after event-time eviction; alpha within-TTL dup
      // dropped; an IN-BATCH gap > ttl re-admits too (the fast-replay case:
      // the whole gap arrives in one batch, no timeout ever fires)
      mem.addData(EventStreams.TsDoc(ts(102), 6L, "beta"),
        EventStreams.TsDoc(ts(103), 7L, "alpha"), // 3 min after doc 4 → dup
        EventStreams.TsDoc(ts(200), 8L, "alpha")) // 97 min after doc 7
      q.processAllAvailable()
      assert(ids == Set(1L, 2L, 4L, 5L, 6L, 8L),
        s"expected event-time-gap re-admissions (4, 8), dups 3/7 dropped, got $ids")
    } finally q.stop()
  }

  test("idle-session timeout emits the open session and evicts its state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Event]
    val q = EventStreams.sessionizeStream(spark, mem.toDS(),
      idleTimeout = Some("1 millisecond"))
      .writeStream.format("memory").queryName("sess_ttl_out")
      .outputMode("append").start()
    try {
      mem.addData(EventStreams.Event(1L, ts(0), 7L, "click", 1.0),
        EventStreams.Event(2L, ts(5), 7L, "view", 2.0))
      // no further events for user 7: the idle timeout alone must close the
      // session (the engine self-triggers sweeps for processing-time TTLs)
      eventually() {
        spark.table("sess_ttl_out").collect()
          .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events")))
          .contains((7L, 2L))
      }
      // with a 1 ms grace the tombstone is evicted before the user returns
      // (state stays bounded); the restarted ordinal is distinguished by
      // session_start — the durable unique key
      mem.addData(EventStreams.Event(5L, ts(500), 7L, "click", 5.0))
      eventually() {
        spark.table("sess_ttl_out").collect()
          .count(_.getAs[Long]("user_id") == 7L) == 2
      }
      val keys = spark.table("sess_ttl_out").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_id"),
          r.getAs[Timestamp]("session_start")))
      assert(keys.distinct.length == keys.length,
        s"(user, id, start) keys must be unique: ${keys.toSeq}")
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch join under " +
    "out-of-order, multi-batch delivery") {
    implicit val sqlCtx = spark.sqlContext
    // clicks/purchases as one events table for the batch face
    val events = Seq(
      (1L, ts(0), 1L, "click", 0.0), // ← p1 (t20 within 30 min)
      (2L, ts(40), 1L, "click", 0.0), // ← p2 (t50)
      (3L, ts(10), 2L, "click", 0.0), // no purchase within window
      (4L, ts(25), 1L, "click", 0.0), // ← p2 (t50; p1 at t20 PRECEDES it)
      (10L, ts(20), 1L, "purchase", 9.5),
      (11L, ts(50), 1L, "purchase", 3.25),
      (12L, ts(60), 2L, "purchase", 1.0), // 50 min after click 3: outside
      (13L, ts(5), 3L, "purchase", 7.0)) // user with no clicks
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val expected = EventStreams.intervalJoinBatch(events).collect()
      .map(r => (r.getAs[Long]("click_id"), r.getAs[Long]("purchase_id")))
      .toSet
    assert(expected == Set((1L, 10L), (2L, 11L), (4L, 11L)),
      s"batch face sanity: $expected")

    val memC = MemoryStream[EventStreams.Click]
    val memP = MemoryStream[EventStreams.Purchase]
    val q = EventStreams.intervalJoinStream(memC.toDF(), memP.toDF())
      .writeStream.format("memory").queryName("st_join_out")
      .outputMode("append").start()
    try {
      // purchases arrive FIRST (buffered in join state), then clicks
      // trickle in across batches out of event-time order — the join must
      // still emit every match exactly once
      memP.addData(EventStreams.Purchase(11L, 1L, ts(50), 3.25),
        EventStreams.Purchase(13L, 3L, ts(5), 7.0))
      q.processAllAvailable()
      memC.addData(EventStreams.Click(2L, 1L, ts(40)),
        EventStreams.Click(3L, 2L, ts(10)))
      q.processAllAvailable()
      memP.addData(EventStreams.Purchase(10L, 1L, ts(20), 9.5),
        EventStreams.Purchase(12L, 2L, ts(60), 1.0))
      q.processAllAvailable()
      memC.addData(EventStreams.Click(1L, 1L, ts(0)),
        EventStreams.Click(4L, 1L, ts(25)))
      q.processAllAvailable()
      val got = spark.table("st_join_out").collect()
        .map(r => (r.getAs[Long]("click_id"), r.getAs[Long]("purchase_id")))
      assert(got.toSet == expected, s"stream join diverged: ${got.toSet}")
      assert(got.length == expected.size, s"duplicate emissions: ${got.toSeq}")
    } finally q.stop()
  }

  test("left-semi stream join emits a matched click exactly ONCE even when " +
    "multiple purchases match across batches") {
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      (1L, ts(0), 1L, "click", 0.0), // matches p10 AND p11 → ONE semi row
      (2L, ts(40), 1L, "click", 0.0), // matches p12 (t50)
      (3L, ts(10), 2L, "click", 0.0), // no purchase in window
      (10L, ts(10), 1L, "purchase", 9.5),
      (11L, ts(20), 1L, "purchase", 3.25),
      (12L, ts(50), 1L, "purchase", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val expected = EventStreams.intervalJoinSemiBatch(events).collect()
      .map(_.getAs[Long]("click_id")).toSet
    assert(expected == Set(1L, 2L), s"batch semi sanity: $expected")

    val memC = MemoryStream[EventStreams.Click]
    val memP = MemoryStream[EventStreams.Purchase]
    val q = EventStreams.intervalJoinStream(memC.toDF(), memP.toDF(),
      joinType = "left_semi")
      .writeStream.format("memory").queryName("st_join_semi_out")
      .outputMode("append").start()
    try {
      // click 1 buffered first; its two candidate purchases arrive in
      // SEPARATE batches — the second match must not re-emit the click
      memC.addData(EventStreams.Click(1L, 1L, ts(0)),
        EventStreams.Click(3L, 2L, ts(10)))
      q.processAllAvailable()
      memP.addData(EventStreams.Purchase(10L, 1L, ts(10), 9.5))
      q.processAllAvailable()
      memP.addData(EventStreams.Purchase(11L, 1L, ts(20), 3.25),
        EventStreams.Purchase(12L, 1L, ts(50), 1.0))
      memC.addData(EventStreams.Click(2L, 1L, ts(40)))
      q.processAllAvailable()
      val got = spark.table("st_join_semi_out").collect()
        .map(_.getAs[Long]("click_id"))
      assert(got.toSet == expected, s"semi join diverged: ${got.toSeq}")
      assert(got.length == expected.size,
        s"duplicate semi emissions: ${got.toSeq}")
    } finally q.stop()
  }

  test("left-outer stream join emits a null-extended row for an unconverted " +
    "click once the watermark proves no match can arrive") {
    implicit val sqlCtx = spark.sqlContext
    val memC = MemoryStream[EventStreams.Click]
    val memP = MemoryStream[EventStreams.Purchase]
    val q = EventStreams.intervalJoinStream(memC.toDF(), memP.toDF(),
      watermark = "10 minutes", joinType = "left_outer")
      .writeStream.format("memory").queryName("st_join_outer_out")
      .outputMode("append").start()
    try {
      memC.addData(EventStreams.Click(1L, 1L, ts(0)), // converts (p 10 at t20)
        EventStreams.Click(2L, 2L, ts(5))) // never converts
      memP.addData(EventStreams.Purchase(10L, 1L, ts(20), 5.0))
      q.processAllAvailable()
      // the matched row is out already; the null row for click 2 must NOT
      // be out yet — a purchase at t(5..35) could still arrive
      val early = spark.table("st_join_outer_out").collect()
        .map(r => (r.getAs[Long]("click_id"), r.getAs[Any]("purchase_id")))
      assert(early.toSet == Set((1L, 10L)), s"premature outer emission: ${early.toSeq}")
      // advance the GLOBAL watermark (min of both sides) past t(5)+30m+10m
      for (i <- 1 to 2) {
        memC.addData(EventStreams.Click(-i.toLong, -99L, ts(600 + i)))
        memP.addData(EventStreams.Purchase(-i.toLong, -99L, ts(600 + i), 0.0))
        q.processAllAvailable()
      }
      val rows = spark.table("st_join_outer_out")
        .filter(col("user_id") =!= lit(-99L)).collect()
        .map(r => (r.getAs[Long]("click_id"), Option(r.getAs[Any]("purchase_id"))))
      assert(rows.toSet == Set((1L, Some(10L)), (2L, None)),
        s"outer join rows: ${rows.toSeq}")
    } finally q.stop()
  }

  test("streaming retrieval: multi-batch replay equals the batch top-k, stateless") {
    import graft.operators.Similarity
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = e.filter(col("vec_id") < 8)
    val batchAnswer = Similarity.topKBruteForce(e, queries, k = 5)
      .select(col("query_id"), col("vec_id"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val root = java.nio.file.Files.createTempDirectory("graft_stsim_")
    try {
      val qPath = root.resolve("q").toString
      val outPath = root.resolve("out").toString
      queries.repartition(4).write.mode("overwrite").parquet(qPath)
      val qStream = spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", "1").parquet(qPath)
      val q = Similarity.topKStreamToParquet(
        e, qStream, k = 5, outPath, root.resolve("ckpt").toString)
      try {
        q.processAllAvailable()
        // really ran as several micro-batches, each a final append
        assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
          "expected a multi-batch replay")
        // retrieval must not build a state store: stateless foreachBatch
        assert(q.lastProgress.stateOperators.isEmpty)
        val got = spark.read.parquet(outPath)
          .select(col("query_id"), col("vec_id"), col("rank"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
        assert(got == batchAnswer)
      } finally q.stop()
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
        .foreach(f => java.nio.file.Files.deleteIfExists(f))
    }
  }

  test("streaming DAU (chained dedup + windowed count) equals batch, " +
      "deduping the same (user, day) across micro-batches") {
    def dayTs(day: Int, minute: Int): Timestamp =
      Timestamp.valueOf(f"2024-02-0$day%d ${minute / 60}%02d:${minute % 60}%02d:00")
    val evs = Seq(
      EventStreams.Event(1L, dayTs(1, 10), 1L, "click", 0.0),
      EventStreams.Event(2L, dayTs(1, 20), 1L, "view", 0.0),  // dup (1, d1)
      EventStreams.Event(3L, dayTs(1, 30), 2L, "click", 0.0),
      // batch boundary: user 1 reappears on DAY 1 in batch 2 — the
      // cross-batch dedup case a per-batch count would double-count
      EventStreams.Event(4L, dayTs(1, 40), 1L, "click", 0.0),
      EventStreams.Event(5L, dayTs(2, 10), 1L, "click", 0.0),
      EventStreams.Event(6L, dayTs(2, 20), 3L, "click", 0.0))
    // sentinel far in the future: advances the watermark so every real
    // day's window CLOSES and append mode emits it
    val sentinel = EventStreams.Event(99L, dayTs(9, 0), 9L, "click", 0.0)
    val batch = EventStreams.dauByDay(evs.toDF())
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Event]
    val q = EventStreams.dauStream(mem.toDF(), delay = "1 hour")
      .writeStream.format("memory").queryName("dau_out")
      .outputMode("append").start()
    try {
      mem.addData(evs.take(3): _*)
      q.processAllAvailable()
      mem.addData(evs.drop(3): _*)
      q.processAllAvailable()
      mem.addData(sentinel)
      q.processAllAvailable()
      val streamed = spark.table("dau_out")
        .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
      // the sentinel's own window is still open — compare the closed days
      assert(streamed == batch.filter(_._1 < "2024-02-09"),
        s"streamed $streamed != batch $batch")
      assert(streamed("2024-02-01") == 2L) // users 1, 2 — not 3
      assert(streamed("2024-02-02") == 2L)
    } finally q.stop()
  }
}
