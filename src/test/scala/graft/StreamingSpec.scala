package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingOps

/** Drives the streaming operators with the real events table through a
  * file-source → memory-sink query (Trigger.AvailableNow) and checks the
  * results against the equivalent batch computation.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private lazy val streamDir: String = {
    val d = Files.createTempDirectory("graft-stream")
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      d.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    d.toString
  }

  test("watermarked hourly window agg matches the batch aggregation") {
    import spark.implicits._
    val q = StreamingOps.hourlyCounts(StreamingOps.readEvents(spark, streamDir))
      .writeStream.format("memory").queryName("hourly")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.table("hourly")
    val batch = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
    // append mode holds back windows newer than the final watermark;
    // every emitted window must match its batch twin, and most windows
    // must have been emitted
    val joined = got.as("s").join(batch.as("b"),
      $"s.hour" === $"b.hour" && $"s.event_type" === $"b.event_type")
    assert(got.count() > 0)
    assert(joined.filter($"s.n" =!= $"b.n").count() == 0)
    assert(joined.count() == got.count()) // every streamed window exists in batch
  }

  test("watermarked streaming dedup keeps one row per event_id") {
    import spark.implicits._
    val q = StreamingOps.dedupStream(StreamingOps.readEvents(spark, streamDir))
      .writeStream.format("memory").queryName("deduped")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("deduped")
    val src = Tables.load(spark, "/root/testdata/sf0.001", "events")
    assert(got.count() == src.select("event_id").distinct().count())
    assert(got.groupBy($"event_id").count().filter($"count" > 1).count() == 0)
  }

  test("foreachBatch upsert sink merges micro-batches on the key") {
    import spark.implicits._
    import java.nio.file.Files
    // micro-batch 1: users 1,2; micro-batch 2 arrives later: user 2
    // updated + user 3 new -> target must hold exactly one latest row
    // per user
    val srcDir = Files.createTempDirectory("graft-upsert-src")
    val tgtRoot = Files.createTempDirectory("graft-upsert-tgt")
    val target = tgtRoot.resolve("t").toString
    val chk = tgtRoot.resolve("_chk").toString // outside the source glob
    def writeBatch(name: String, rows: Seq[(Long, Long, String)]): Unit =
      rows.toDF("user_id", "ver", "state")
        .coalesce(1).write.mode("overwrite").parquet(srcDir.resolve(name).toString)

    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema("user_id LONG, ver LONG, state STRING")
        .parquet(srcDir.toString + "/*")
      val q = StreamingOps.upsertSink(stream, Seq("user_id"), "ver", target)
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", chk)
        .start()
      q.awaitTermination()
    }
    writeBatch("b1", Seq((1L, 1L, "a"), (2L, 1L, "b")))
    runOnce()
    writeBatch("b2", Seq((2L, 2L, "b2"), (3L, 1L, "c"), (3L, 2L, "c2")))
    runOnce()

    val got = graft.pipeline.ParquetIO.read(spark, target).orderBy($"user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq == Seq((1L, 1L, "a"), (2L, 2L, "b2"), (3L, 2L, "c2")))
  }

  test("stream-stream interval join matches the batch range join") {
    import spark.implicits._
    val q = StreamingOps.intervalJoin(
        StreamingOps.readEvents(spark, streamDir),
        StreamingOps.readEvents(spark, streamDir))
      .writeStream.format("memory").queryName("ivjoin")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("ivjoin")
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val batch = ev.select($"event_id".as("l_event_id"), $"user_id", $"ts".as("l_ts"))
      .join(ev.select($"event_id".as("r_event_id"), $"user_id".as("r_uid"), $"ts".as("r_ts")),
        $"user_id" === $"r_uid" &&
          $"r_ts" >= $"l_ts" - expr("INTERVAL 10 MINUTES") && $"r_ts" < $"l_ts")
    assert(got.count() > 0)
    assert(got.count() == batch.count())
    assert(got.select("l_event_id", "r_event_id")
      .exceptAll(batch.select("l_event_id", "r_event_id")).count() == 0)
  }

  test("EventTimeTimeout sessionize emits timed-out open sessions, state removed") {
    import spark.implicits._
    val events = StreamingOps.readEvents(spark, streamDir)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[StreamingOps.Event]
    val q = StreamingOps.sessionizeWithTimeout(events)
      .writeStream.format("memory").queryName("sessions_to")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("sessions_to")
    val batch = graft.operators.Relational.q14Sessionize(spark, "/root/testdata/sf0.001")
    val closedOnly = batch.count() - batch.select("user_id").distinct().count()
    // timeouts emitted sessions beyond the gap-closed ones (each user's
    // final session only closes via the watermark timeout)
    assert(got.count() > closedOnly,
      s"timeouts did not fire: ${got.count()} <= $closedOnly")
    // every emitted session is exactly its batch twin
    val joined = got.as("s").join(batch.as("b"), Seq("user_id", "session_seq"))
    assert(joined.count() == got.count())
    assert(joined.filter($"s.n_events" =!= $"b.n_events" ||
      $"s.session_start" =!= $"b.session_start" ||
      $"s.session_end" =!= $"b.session_end").count() == 0)
  }

  test("transformWithState sessionize (timers + RocksDB) matches batch") {
    import spark.implicits._
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val events = StreamingOps.readEvents(spark, streamDir)
        .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
        .as[StreamingOps.Event]
      val q = StreamingOps.sessionizeTransformWithState(events)
        .writeStream.format("memory").queryName("sessions_tws")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val got = spark.table("sessions_tws")
      val batch = graft.operators.Relational.q14Sessionize(spark, "/root/testdata/sf0.001")
      val closedOnly = batch.count() - batch.select("user_id").distinct().count()
      assert(got.count() > closedOnly,
        s"timers did not fire: ${got.count()} <= $closedOnly")
      val joined = got.as("s").join(batch.as("b"), Seq("user_id", "session_seq"))
      assert(joined.count() == got.count())
      assert(joined.filter($"s.n_events" =!= $"b.n_events" ||
        $"s.session_start" =!= $"b.session_start" ||
        $"s.session_end" =!= $"b.session_end").count() == 0)
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("late events past the watermark do not fail the timeout sessionizers") {
    import spark.implicits._
    // Two-run scenario: run 1 advances the watermark; run 2 delivers an
    // event OLDER than watermark - gap. flatMapGroupsWithState does not
    // drop late rows, so before the timer clamp this threw
    // IllegalArgumentException ("timeout timestamp cannot be earlier than
    // the current watermark") and failed the query.
    val base = 1704067200000L // 2024-01-01 00:00:00 UTC
    def ev(id: Long, minute: Long, user: Long) = StreamingOps.Event(
      id, new java.sql.Timestamp(base + minute * 60000L), user, "view", 1.0)
    for (useTws <- Seq(false, true)) {
      val src = Files.createTempDirectory("graft-late-src")
      val root = Files.createTempDirectory("graft-late-out")
      val chk = root.resolve("chk").toString
      // file sink, not memory: the memory sink cannot recover from a
      // checkpoint, and run 2 resuming run 1's watermark IS the test
      val out = root.resolve("sessions").toString
      def writeBatch(name: String, rows: Seq[StreamingOps.Event]): Unit =
        rows.toDS().coalesce(1).write.parquet(src.resolve(name).toString)
      def runOnce(): Unit = {
        val events = spark.readStream
          .schema(org.apache.spark.sql.Encoders.product[StreamingOps.Event].schema)
          .parquet(src.toString + "/*")
          .as[StreamingOps.Event]
        val sessions =
          if (useTws) StreamingOps.sessionizeTransformWithState(events)
          else StreamingOps.sessionizeWithTimeout(events)
        val q = sessions.writeStream.format("parquet")
          .option("path", out)
          .outputMode("append").option("checkpointLocation", chk)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      if (useTws) spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        // user 1: two events then silence; user 2 drives the watermark to
        // minute 240 (360 - 120 delay) so user 1's timer (minute 40) fires
        writeBatch("b1", Seq(ev(1, 0, 1), ev(2, 10, 1), ev(3, 360, 2)))
        runOnce()
        val after1 = spark.read.parquet(out).as[StreamingOps.Session].collect()
        assert(after1.exists(s => s.user_id == 1 && s.n_events == 2),
          s"timed-out session missing (tws=$useTws): ${after1.mkString(",")}")
        // run 2: user 3 arrives at minute 0 — far below the restored
        // watermark minus the session gap. Must complete, not crash; the
        // late session stays open (its clamped timer sits past the
        // unchanged watermark), so user 3 emits nothing yet.
        writeBatch("b2", Seq(ev(4, 0, 3)))
        runOnce()
        val after2 = spark.read.parquet(out).as[StreamingOps.Session].collect()
        assert(!after2.exists(_.user_id == 3))
      } finally {
        if (useTws) prevProvider match {
          case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
          case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        }
      }
    }
  }

  test("flatMapGroupsWithState sessionization matches batch gaps-and-islands") {
    import spark.implicits._
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[StreamingOps.Event]
    // run the same stateful logic in batch mode (flatMapGroupsWithState
    // works on batch Datasets too); closed sessions = all but each
    // user's last open session
    val closed = StreamingOps.sessionize(events)
    val batch = graft.operators.Relational.q14Sessionize(spark, "/root/testdata/sf0.001")
    val lastPerUser = batch.groupBy($"user_id")
      .agg(max($"session_seq").as("last_seq"))
    val expectedClosed = batch.join(lastPerUser, Seq("user_id"))
      .filter($"session_seq" =!= $"last_seq")
    assert(closed.count() == expectedClosed.count())
    val joined = closed.toDF().as("s").join(expectedClosed.as("b"),
      Seq("user_id", "session_seq"))
    assert(joined.count() == closed.count())
    assert(joined.filter($"s.n_events" =!= $"b.n_events").count() == 0)
    assert(joined.filter($"s.session_start" =!= $"b.session_start").count() == 0)
    assert(joined.filter($"s.session_end" =!= $"b.session_end").count() == 0)
  }

  test("q206: outer join = q109's matches plus watermark-closed NO_CLICK verdicts") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val outer = graft.streaming.StreamingOps
      .q206StreamOuterJoin(spark, dir).persist()
    val inner = graft.streaming.StreamingOps
      .q109StreamIntervalJoin(spark, dir)
      .select($"l_event_id", $"r_event_id").persist()
    // matched arm == the inner join exactly (outer adds rows, never
    // changes matches)
    val m = outer.filter($"r_event_id" =!= -1L)
      .select($"l_event_id", $"r_event_id")
    assert(m.exceptAll(inner).isEmpty && inner.exceptAll(m).isEmpty,
      "matched arm differs from the inner interval join")
    // the NULL arm exists and respects the stated cut: every NO_CLICK
    // verdict is strictly below min(max purchase ts, max click ts) - 2h
    val noc = outer.filter($"r_event_id" === -1L).persist()
    assert(noc.count() > 0, "no outer verdict emitted (vacuous)")
    val cut = Tables.load(spark, dir, "events")
      .filter($"event_type".isin("purchase", "click"))
      .groupBy($"event_type")
      .agg(org.apache.spark.sql.functions.max($"ts").as("mx"))
      .agg(org.apache.spark.sql.functions.min($"mx"))
      .head().getTimestamp(0)
    val cutMs = cut.getTime - 2 * 3600 * 1000L
    assert(noc.filter($"l_ts" >= new java.sql.Timestamp(cutMs)).count() == 0,
      "NO_CLICK verdict at/above the watermark cut")
    // a verdict is a verdict: no doc appears in both arms
    assert(noc.join(inner, Seq("l_event_id"), "left_semi").count() == 0,
      "a purchase got both a match and a NO_CLICK verdict")
    outer.unpersist(false); inner.unpersist(false); noc.unpersist(false)
  }

  test("q167: streaming ANN serving emits dense per-query top-3 with non-increasing cosine") {
    import spark.implicits._
    val out = graft.streaming.StreamingOps
      .q167StreamAnnServe(spark, "/root/testdata/sf0.001").persist()
    assert(out.count() > 0, "the serving stream emitted nothing")
    // every query's ranks are dense 1..n<=3 (union of micro-batches must
    // never duplicate or drop a rank)
    val perQ = out.groupBy($"query_id")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.max($"rank").as("mx"),
        org.apache.spark.sql.functions.min($"rank").as("mn"))
    assert(perQ.filter($"n" > 3 || $"mx" =!= $"n" || $"mn" =!= 1).count() == 0)
    // ranked by cosine: rank 1 dominates within each query
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"rank")
    assert(out.withColumn("prev",
        org.apache.spark.sql.functions.lag($"cos_sim", 1).over(w))
      .filter($"prev".isNotNull && $"prev" < $"cos_sim").count() == 0)
    out.unpersist(false)
  }

  test("q218: both monitor arms fire — in-distribution appends, drifted rebuilds") {
    val rows = graft.streaming.StreamingOps
      .q218StreamDriftMonitor(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 2, s"expected one verdict per staged batch: ${rows.toSeq}")
    val byShard = rows.map(r => r.getString(0) -> r).toMap
    val ind = byShard("delta_indist")
    val drf = byShard("delta_shifted")
    assert(ind.getString(4) == "append",
      s"in-distribution delta must stamp append: $ind")
    assert(drf.getString(4) == "rebuild",
      s"drifted delta must stamp rebuild: $drf")
    // the decision rule itself: mean vs the SAME threshold on both rows
    assert(ind.getDouble(3) == drf.getDouble(3), "thresholds diverged")
    assert(ind.getDouble(2) <= ind.getDouble(3), "append despite mean>thr")
    assert(drf.getDouble(2) > drf.getDouble(3), "rebuild despite mean<=thr")
  }

  test("q227: streamed sketch-tile merge equals a one-shot KMV build") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val out = graft.streaming.StreamingOps
      .q227StreamSketchTiles(spark, dir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val m = r.getInt(1)
      val est = r.getDouble(2)
      val exact = r.getLong(3)
      // below capacity the sketch IS the distinct set: est must be exact
      if (m < graft.operators.Sketches.RollK)
        assert(est == exact.toDouble, s"undersized sketch not exact: $r")
      assert(r.getInt(4) == 3)
    }
  }

  test("q228: audit identity holds and the engine visibly dropped rows") {
    import spark.implicits._
    val out = graft.streaming.StreamingOps
      .q228WatermarkAudit(spark, "/root/testdata/sf0.01")
    val audit = out.filter($"event_type" === "__audit").collect()
    assert(audit.length == 1)
    val a = audit.head
    val (emitted, input, dropped, unemitted) =
      (a.getLong(2), a.getLong(3), a.getLong(4), a.getLong(5))
    assert(emitted + dropped + unemitted == input,
      s"audit identity broken: $a")
    assert(dropped > 0, "staged odd-late half produced no drops")
    assert(a.getLong(6) == 1L, "engine dropped-by-watermark metric silent")
    // append-sink uniqueness: one row per (window, type)
    val wins = out.filter($"event_type" =!= "__audit")
    assert(wins.groupBy($"win_start", $"event_type").count()
      .filter($"count" > 1).count() == 0)
  }

  test("q247: streaming MG tiles reproduce the batch q70 answer row-for-row") {
    val dir = "/root/testdata/sf0.001"
    val streamed = StreamingOps.q247StreamMgTiles(spark, dir).collect()
    val batch = operators.TextAnalysis.q70HeavyHitters(spark, dir).collect()
    assert(streamed.nonEmpty)
    assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq,
      "tile-merged MG must preserve the batch heavy-hitter guarantee")
  }

  test("q238: chained dedup+agg equals the single-copy agg despite the doubled source") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val out = StreamingOps.q238StreamChained(spark, dir)
    // single-copy batch truth with the same emission cut
    val ev = Tables.load(spark, dir, "events")
    val maxMs = ev.agg(max(unix_millis($"ts"))).head().getLong(0)
    val batch = ev
      .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .filter(unix_millis($"hour") + 3600000L <= maxMs - 7200000L)
    val joined = out.as("s").join(batch.as("b"),
      $"s.hour" === $"b.hour" && $"s.event_type" === $"b.event_type")
    assert(out.count() > 0)
    // every emitted (window,type) count matches the SINGLE-copy batch:
    // the dedup stage fully cancelled the doubled transport
    assert(joined.filter($"s.n" =!= $"b.n").count() == 0)
    assert(joined.count() == out.count())
    assert(out.count() == batch.count(),
      "emission cut must match the stated arithmetic exactly")
  }
}
