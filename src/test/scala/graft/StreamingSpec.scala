package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.GroupStateTimeout
import java.sql.Timestamp
import graft.streaming.EventStream
import graft.streaming.EventStream.Event

/** CDC change-row fixture (top-level: MemoryStream needs a TypeTag-
  * stable product encoder, which method-local case classes lack). */
final case class CdcChange(k: Long, name: String, amt: Double, op: String, seq: Long)

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("windowed counts with watermark over a memory stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventStream.startToMemory(
      EventStream.windowedCounts(input.toDF(), "1 hour", "10 minutes"),
      "win_counts")
    try {
      input.addData(
        Event(1, ts("2024-01-01 00:05:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 00:55:00"), 2, "click", 2.0),
        Event(3, ts("2024-01-01 01:05:00"), 1, "view", 5.0))
      query.processAllAvailable()
      val rows = spark.table("win_counts")
        .orderBy("window_start", "event_type").collect()
      assert(rows.length === 2)
      assert(rows(0).getAs[Long]("num_events") === 2) // two clicks in hour 0
      assert(rows(0).getAs[Double]("total_value") === 3.0)
      assert(rows(1).getAs[String]("event_type") === "view")
    } finally query.stop()
  }

  test("windowed counts plan also runs in batch mode (same transform)") {
    val batch = Seq(
      Event(1, ts("2024-01-01 00:05:00"), 1, "click", 1.0),
      Event(2, ts("2024-01-01 00:45:00"), 2, "click", 2.0)).toDF()
    val out = EventStream.windowedCounts(batch).collect()
    assert(out.length === 1 && out(0).getAs[Long]("num_events") === 2)
  }

  test("streaming dedup drops repeated keys within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventStream.startToMemory(
      EventStream.streamingDedup(input.toDF(), Seq("user_id"), "1 hour"),
      "dedup_stream", org.apache.spark.sql.streaming.OutputMode.Append())
    try {
      input.addData(
        Event(1, ts("2024-01-01 00:00:00"), 7, "click", 1.0),
        Event(2, ts("2024-01-01 00:05:00"), 7, "view", 1.0), // dup user within watermark
        Event(3, ts("2024-01-01 00:06:00"), 8, "click", 1.0))
      query.processAllAvailable()
      val users = spark.table("dedup_stream").select("event_id").collect().map(_.getLong(0)).sorted
      assert(users.toSeq === Seq(1L, 3L)) // one survivor per user
    } finally query.stop()
  }

  test("streamingDedup batch leg falls back to exact dedup (no watermark-state form)") {
    // the file-level contract: every transform runs on batch frames too.
    // dropDuplicatesWithinWatermark is streaming-only in Spark, so the
    // batch leg must route through plain dropDuplicates, not throw
    val batch = Seq(
      Event(1, ts("2024-01-01 00:00:00"), 7, "click", 1.0),
      Event(2, ts("2024-01-01 00:05:00"), 7, "view", 1.0),
      Event(3, ts("2024-01-01 00:06:00"), 8, "click", 1.0)).toDF()
    val users = EventStream.streamingDedup(batch, Seq("user_id"))
      .select("user_id").collect().map(_.getLong(0)).sorted
    assert(users.toSeq === Seq(7L, 8L))
  }

  test("stream-static enrichment joins the broadcast dim per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((7L, "gold"), (8L, "basic")).toDF("user_id", "tier")
    val input = MemoryStream[Event]
    val query = EventStream.startToMemory(
      EventStream.enrich(input.toDF(), dim, "user_id"), "enriched",
      org.apache.spark.sql.streaming.OutputMode.Append())
    try {
      input.addData(
        Event(1, ts("2024-01-01 00:00:00"), 7, "click", 1.0),
        Event(2, ts("2024-01-01 00:01:00"), 9, "view", 1.0)) // no dim row
      query.processAllAvailable()
      val rows = spark.table("enriched").orderBy("event_id").collect()
      assert(rows(0).getAs[String]("tier") === "gold")
      assert(rows(1).isNullAt(rows(1).fieldIndex("tier"))) // left join keeps it
    } finally query.stop()
  }

  test("stream-stream join matches within the interval, not outside") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val buys = MemoryStream[Event]
    val joined = EventStream.joinWithinInterval(
      clicks.toDF(), buys.toDF(), "user_id", interval = "15 minutes")
    val query = EventStream.startToMemory(joined, "cj",
      org.apache.spark.sql.streaming.OutputMode.Append())
    try {
      clicks.addData(
        Event(1, ts("2024-01-01 00:00:00"), 7, "click", 1.0),
        Event(2, ts("2024-01-01 00:00:00"), 8, "click", 1.0))
      buys.addData(
        Event(10, ts("2024-01-01 00:10:00"), 7, "buy", 9.0),  // within 15 min
        Event(11, ts("2024-01-01 01:00:00"), 8, "buy", 5.0))  // outside
      query.processAllAvailable()
      val rows = spark.table("cj").collect()
      assert(rows.length === 1)
      assert(rows(0).getAs[Long]("user_id") === 7L)
      assert(rows(0).getAs[Long]("r_event_id") === 10L)
    } finally query.stop()
  }

  test("sessionize accumulates per-user state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = EventStream.sessionize(input.toDS(), GroupStateTimeout.NoTimeout())
    val query = EventStream.startToMemory(sessions.toDF(), "sessions")
    try {
      input.addData(Event(1, ts("2024-01-01 00:00:00"), 7, "click", 1.0))
      query.processAllAvailable()
      input.addData(Event(2, ts("2024-01-01 00:10:00"), 7, "view", 1.0))
      query.processAllAvailable()
      val last = spark.table("sessions").orderBy($"num_events".desc).limit(1).collect()(0)
      assert(last.getAs[Long]("user_id") === 7L)
      assert(last.getAs[Long]("num_events") === 2L)
      assert(last.getAs[Double]("session_seconds") === 600.0)
      assert(!last.getAs[Boolean]("closed"))
    } finally query.stop()
  }

  test("sessionize rejects EventTimeTimeout up front") {
    // sessionize never sets a timeout timestamp, so EventTimeTimeout
    // would fail at query start with an opaque planner error; the
    // event-time sessionizer is sessionizeOnClose
    val e = intercept[IllegalArgumentException](
      EventStream.sessionize(Seq.empty[Event].toDS(), GroupStateTimeout.EventTimeTimeout()))
    assert(e.getMessage.contains("sessionizeOnClose"))
  }

  test("sessionizeOnClose emits one closed row when the watermark passes the gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = EventStream.sessionizeOnClose(input.toDS(), gapMinutes = 30)
    val query = EventStream.startToMemory(sessions.toDF(), "closed_sessions",
      org.apache.spark.sql.streaming.OutputMode.Append())
    try {
      // user 7: a 5-minute burst — nothing may emit while it is open
      input.addData(
        Event(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0),
        Event(2, ts("2024-01-01 10:05:00"), 7, "view", 1.0))
      query.processAllAvailable()
      assert(spark.table("closed_sessions").isEmpty)
      // another user far in event time advances the watermark past
      // 10:05 + 30min gap (watermark updates at end of this batch)...
      input.addData(Event(3, ts("2024-01-01 12:00:00"), 8, "click", 1.0))
      query.processAllAvailable()
      // ...and the NEXT batch fires user 7's event-time timeout
      input.addData(Event(4, ts("2024-01-01 12:01:00"), 8, "view", 1.0))
      query.processAllAvailable()
      val rows = spark.table("closed_sessions").collect()
      assert(rows.length === 1, s"expected exactly one closed session, got ${rows.length}")
      assert(rows(0).getAs[Long]("user_id") === 7L)
      assert(rows(0).getAs[Long]("num_events") === 2L)
      assert(rows(0).getAs[Double]("session_seconds") === 300.0)
      assert(rows(0).getAs[Boolean]("closed"))
    } finally query.stop()
  }

  test("sessionizeOnClose splits on the gap in the data path (backfill batch)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = EventStream.sessionizeOnClose(input.toDS(), gapMinutes = 30)
    val query = EventStream.startToMemory(sessions.toDF(), "backfill_sessions",
      org.apache.spark.sql.streaming.OutputMode.Append())
    try {
      // one backfill batch spanning two sessions for user 7: a key WITH
      // data never fires its timeout, so the split must happen on merge
      input.addData(
        Event(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0),
        Event(2, ts("2024-01-01 10:10:00"), 7, "view", 1.0),
        Event(3, ts("2024-01-01 13:00:00"), 7, "click", 1.0))
      query.processAllAvailable()
      val rows = spark.table("backfill_sessions").collect()
      assert(rows.length === 1, s"first session should close on the data path: ${rows.length}")
      assert(rows(0).getAs[Long]("num_events") === 2L)
      assert(rows(0).getAs[Double]("session_seconds") === 600.0)
    } finally query.stop()
  }

  test("cdc stream maintains a versioned snapshot across micro-batches") {
    import graft.streaming.CdcStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CdcChange]
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc").toString
    val query = CdcStream.applyChangesSink(input.toDF(), s"$dir/snap",
      Seq("k"), "seq", "op", s"$dir/ckpt")
    try {
      // batch 0: three inserts
      input.addData(CdcChange(1, "a", 10.0, "I", 1), CdcChange(2, "b", 20.0, "I", 1),
        CdcChange(3, "c", 30.0, "I", 1))
      query.processAllAvailable()
      val schema = org.apache.spark.sql.types.StructType(
        input.toDF().schema.filterNot(f => f.name == "seq" || f.name == "op"))
      val snap0 = CdcStream.readSnapshot(spark, s"$dir/snap", schema)
        .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      assert(snap0.toSeq === Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)))
      // batch 1: update k=1 twice (latest seq wins), delete k=2
      input.addData(CdcChange(1, "a1", 11.0, "U", 2), CdcChange(1, "a2", 12.0, "U", 3),
        CdcChange(2, "b", 20.0, "D", 2))
      query.processAllAvailable()
      val snap1 = CdcStream.readSnapshot(spark, s"$dir/snap", schema)
        .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      assert(snap1.toSeq === Seq((1L, "a2", 12.0), (3L, "c", 30.0)))
      assert(CdcStream.latestVersion(spark, s"$dir/snap") === Some(1L))
    } finally query.stop()
  }

  test("cdc stream prune-during-replay: safe retention replays idempotently, over-pruning fails loudly") {
    import graft.streaming.CdcStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CdcChange]
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc-prune").toString
    val schema = org.apache.spark.sql.types.StructType(
      input.toDF().schema.filterNot(f => f.name == "seq" || f.name == "op"))
    def run(): org.apache.spark.sql.streaming.StreamingQuery =
      CdcStream.applyChangesSink(input.toDF(), s"$dir/snap",
        Seq("k"), "seq", "op", s"$dir/ckpt")
    val q1 = run()
    try {
      input.addData(CdcChange(1, "a", 10.0, "I", 1), CdcChange(2, "b", 20.0, "I", 1))
      q1.processAllAvailable()
      input.addData(CdcChange(1, "a1", 11.0, "U", 2))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(CdcStream.latestVersion(spark, s"$dir/snap") === Some(1L))
    def simulateCrashBeforeCheckpointCommit(): Unit = {
      // v=1 is fully written (_SUCCESS present) but the checkpoint never
      // recorded batch 1 — on restart, foreachBatch replays batchId 1.
      // The local fs keeps a ChecksumFileSystem sibling (.1.crc) that must
      // go too, or the replay's atomic rename of the rewritten commit file
      // fails and Spark reports it as concurrent checkpoint use.
      java.nio.file.Files.delete(java.nio.file.Paths.get(s"$dir/ckpt/commits/1"))
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(s"$dir/ckpt/commits/.1.crc"))
    }

    // retention contract honored (v=0 kept until commits/1 is durable):
    // the replay overwrites v=1 from the same v=0 base — idempotent
    simulateCrashBeforeCheckpointCommit()
    val q2 = run()
    try q2.processAllAvailable() finally q2.stop()
    val replayed = CdcStream.readSnapshot(spark, s"$dir/snap", schema)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(replayed.toSeq === Seq((1L, "a1", 11.0), (2L, "b", 20.0)))

    // contract violated: a pruner that trusted v=1's _SUCCESS marker and
    // deleted the predecessor v=0 — the replayed batch must fail loudly,
    // never merge onto an empty base
    simulateCrashBeforeCheckpointCommit()
    val v0 = java.nio.file.Paths.get(s"$dir/snap/v=0")
    scala.util.Using.resource(java.nio.file.Files.walk(v0)) { walk =>
      walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    val q3 = run()
    try {
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q3.processAllAvailable()
      }
      def chain(t: Throwable): Seq[Throwable] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
      assert(chain(e).exists(c => Option(c.getMessage).exists(
        _.contains("pruned base or stale checkpoint"))),
        s"expected the pruned-base guard to fire, got: $e")
    } finally q3.stop()
  }

  test("cdc stream replay refuses to absorb onto an OLDER base when the predecessor is pruned") {
    // the absorption hole: batch 2 replays after a crash, v=1 was
    // pruned (retention rule 2 violated) but v=0 SURVIVES — a
    // some-base-exists check would quietly merge batch 2 onto v=0,
    // dropping batch 1's changes from every later snapshot. The base
    // must be EXACTLY the predecessor; anything else fails loudly.
    import graft.streaming.CdcStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CdcChange]
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc-absorb").toString
    def run(): org.apache.spark.sql.streaming.StreamingQuery =
      CdcStream.applyChangesSink(input.toDF(), s"$dir/snap",
        Seq("k"), "seq", "op", s"$dir/ckpt")
    val q1 = run()
    try {
      input.addData(CdcChange(1, "a", 10.0, "I", 1))
      q1.processAllAvailable()
      input.addData(CdcChange(2, "b", 20.0, "I", 2))
      q1.processAllAvailable()
      input.addData(CdcChange(1, "a2", 12.0, "U", 3))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(CdcStream.latestVersion(spark, s"$dir/snap") === Some(2L))
    // crash before batch 2's checkpoint commit, then prune v=1 ONLY
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$dir/ckpt/commits/2"))
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$dir/ckpt/commits/.2.crc"))
    val v1 = java.nio.file.Paths.get(s"$dir/snap/v=1")
    scala.util.Using.resource(java.nio.file.Files.walk(v1)) { walk =>
      walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    val q2 = run()
    try {
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q2.processAllAvailable()
      }
      def chain(t: Throwable): Seq[Throwable] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
      assert(chain(e).exists(c => Option(c.getMessage).exists(
        _.contains("pruned base or stale checkpoint"))),
        s"expected the exact-predecessor guard to fire, got: $e")
    } finally q2.stop()
  }

  test("cdc stream refuses a fresh checkpoint over an existing snapshot") {
    import graft.streaming.CdcStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CdcChange]
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc-guard").toString
    // pre-existing snapshot version from some other checkpoint's batch 5
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/snap/v=5"))
    val query = CdcStream.applyChangesSink(input.toDF(), s"$dir/snap",
      Seq("k"), "seq", "op", s"$dir/ckpt")
    try {
      input.addData(CdcChange(1, "a", 10.0, "I", 1))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        query.processAllAvailable()
      }
      def chain(t: Throwable): Seq[Throwable] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
      assert(chain(e).exists(_.getMessage != null) &&
        chain(e).exists(c => Option(c.getMessage).exists(
          _.contains("refusing to rebuild an existing snapshot"))),
        s"expected the consistency guard to fire, got: $e")
    } finally query.stop()
  }

  test("cdc owner stamp: batch-0 replay passes, a fresh checkpoint over v=0 is refused") {
    // the one state version numbers can't adjudicate: batchId=0 with
    // existing=[0] is EITHER this checkpoint's own crash replay
    // (idempotent overwrite — must proceed) or a brand-new checkpoint
    // pointed at an existing snapshot (would rebuild v=0 from an empty
    // base — must refuse). The _owner_checkpoint stamp decides.
    import graft.streaming.CdcStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CdcChange]
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc-owner").toString
    val schema = org.apache.spark.sql.types.StructType(
      input.toDF().schema.filterNot(f => f.name == "seq" || f.name == "op"))
    def run(ckpt: String): org.apache.spark.sql.streaming.StreamingQuery =
      CdcStream.applyChangesSink(input.toDF(), s"$dir/snap",
        Seq("k"), "seq", "op", ckpt)
    val q1 = run(s"$dir/ckptA")
    try {
      input.addData(CdcChange(1, "a", 10.0, "I", 1), CdcChange(2, "b", 20.0, "I", 1))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(CdcStream.latestVersion(spark, s"$dir/snap") === Some(0L))

    // crash before the checkpoint committed batch 0 → same checkpoint
    // replays batchId 0 against existing=[0]: the stamp matches, the
    // overwrite is idempotent, data intact
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$dir/ckptA/commits/0"))
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(s"$dir/ckptA/commits/.0.crc"))
    val q2 = run(s"$dir/ckptA")
    try q2.processAllAvailable() finally q2.stop()
    val replayed = CdcStream.readSnapshot(spark, s"$dir/snap", schema)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(replayed.toSeq === Seq((1L, "a", 10.0), (2L, "b", 20.0)))

    // a DIFFERENT (fresh) checkpoint over the same snapshot also
    // arrives as batchId 0 with existing=[0] — the stamp mismatch
    // refuses it before any write
    input.addData(CdcChange(3, "c", 30.0, "I", 1))
    val q3 = run(s"$dir/ckptB")
    try {
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q3.processAllAvailable()
      }
      def chain(t: Throwable): Seq[Throwable] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
      assert(chain(e).exists(c => Option(c.getMessage).exists(
        _.contains("owned by checkpoint"))),
        s"expected the owner-stamp guard to fire, got: $e")
    } finally q3.stop()
    // and the refused run wrote nothing: snapshot still the replay's
    assert(CdcStream.readSnapshot(spark, s"$dir/snap", schema).count() === 2L)
  }

  test("bloom contamination probe runs on a stream (online-ingest screen)") {
    // the sketch probe is a pure narrow predicate, so the SAME screen
    // that gates the batch corpus composes with structured streaming
    // (append mode, no state) — the online-ingest decontamination path:
    // benchmark sketch built once from the static side, incoming docs
    // flagged per micro-batch
    import graft.functions.BloomFunctions.{bloom_filter_agg, might_contain}
    import graft.ops.Dedup
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val bench = Seq((100L, "one two three four five six")).toDF("doc_id", "text")
    val benchSh = Dedup.shingleHashed(bench, "doc_id", "text", 5)
      .select(explode(col("shh")).as("h")).distinct()
    val bloom = benchSh.agg(bloom_filter_agg(col("h"), 16L, 256L))
      .head.getAs[Array[Byte]](0)
    val input = MemoryStream[StreamDoc]
    val flagged = Dedup.shingleHashed(input.toDF(), "doc_id", "text", 5)
      .withColumn("contaminated",
        exists(array_distinct(col("shh")), h => might_contain(bloom, h)))
      .select("id", "contaminated")
    val query = EventStream.startToMemory(flagged, "bloom_stream")
    try {
      input.addData(
        StreamDoc(1L, "one two three four five six"),   // hits the bench
        StreamDoc(2L, "seven eight nine ten eleven twelve"))
      query.processAllAvailable()
      input.addData(StreamDoc(3L, "zz one two three four five end")) // overlap
      query.processAllAvailable()
      val rows = spark.table("bloom_stream").orderBy("id")
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(rows === Map(1L -> true, 2L -> false, 3L -> true))
    } finally query.stop()
  }

  test("minhash index maintained by a foreachBatch stream dedups like one full recompute") {
    // the always-ingesting dedup pipeline as a stream: each micro-batch
    // is probed against the standing signature index (pairs touching
    // the batch emit exactly once, when the later member arrives), then
    // folded in with minhashIndexAppend. After any prefix of batches,
    // the accumulated pair set equals the full recompute over
    // everything seen — the q_incremental_agg contract shape, on the
    // operator a 100 TB corpus re-runs daily
    import graft.ops.Dedup
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val emptyCorpus = Seq.empty[StreamDoc].toDF()
    var index = Dedup.minhashIndexBuild(emptyCorpus, "doc_id", "text", shingleK = 5)
      .localCheckpoint(true)
    val pairs = scala.collection.mutable.Set.empty[(Long, Long, Double)]
    val input = MemoryStream[StreamDoc]
    val query = input.toDF().writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        pairs ++= Dedup.minhashIndexDedupBatch(index, batch, "doc_id", "text",
            shingleK = 5, threshold = 0.5)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        // localCheckpoint: the index must survive the batch frame's retire
        index = Dedup.minhashIndexAppend(index,
          Dedup.minhashIndexBuild(batch, "doc_id", "text", shingleK = 5))
          .localCheckpoint(true)
        ()
      }
      .start()
    try {
      val seen = scala.collection.mutable.ArrayBuffer.empty[StreamDoc]
      def feed(docs: StreamDoc*): Unit = {
        seen ++= docs; input.addData(docs); query.processAllAvailable()
      }
      feed(StreamDoc(1L, "a b c d e f g h"), StreamDoc(2L, "p q r s t u v w"))
      feed(StreamDoc(3L, "a b c d e f g h"),  // exact dup of 1, earlier batch
        StreamDoc(4L, "a b c d e f g x"))     // near-dup of 1/3, same batch
      feed(StreamDoc(5L, "p q r s t u v y"),  // near-dup of 2, two batches back
        StreamDoc(6L, "a b c d e f g h"))     // third copy of the 1/3 set
      val full = Dedup.minhashVerifiedDups(seen.toSeq.toDF(), "doc_id", "text",
        threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(pairs.toSet === full)
      assert(pairs.contains((1L, 3L, 1.0)), "cross-batch exact dup must pair")
      assert(pairs.exists(p => p._1 == 2L && p._2 == 5L),
        "near-dup two batches apart must pair")
    } finally { query.stop(); spark.catalog.clearCache() }
  }

  test("persisted minhash store maintained by a foreachBatch stream: banded probes + versioned appends") {
    // the production form of the previous test: the stream's standing
    // state lives in MinhashIndexStore (parquet, versioned) instead of
    // a driver variable — each micro-batch probes the latest committed
    // version through the exchange-free banded path (probeLatest, which
    // reads the persisted banding parameters), then advances the store
    // with a protocol-checked append. After all batches the
    // accumulated pair set equals the full recompute, and the store's
    // head names exactly one version per maintenance step.
    import graft.ops.{Dedup, MinhashIndexStore}
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("minhash-stream-store").toString
    val emptyCorpus = Seq.empty[StreamDoc].toDF()
    MinhashIndexStore.init(emptyCorpus, dir, "doc_id", "text")
    val pairs = scala.collection.mutable.Set.empty[(Long, Long, Double)]
    val input = MemoryStream[StreamDoc]
    val query = input.toDF().writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        pairs ++= MinhashIndexStore.probeLatest(spark, dir, batch,
            "doc_id", "text", threshold = 0.5)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        val base = MinhashIndexStore.latestVersion(spark, dir).get
        MinhashIndexStore.append(spark, dir, batch, "doc_id", "text", base)
        ()
      }
      .start()
    try {
      val seen = scala.collection.mutable.ArrayBuffer.empty[StreamDoc]
      def feed(docs: StreamDoc*): Unit = {
        seen ++= docs; input.addData(docs); query.processAllAvailable()
      }
      feed(StreamDoc(1L, "a b c d e f g h"), StreamDoc(2L, "p q r s t u v w"))
      feed(StreamDoc(3L, "a b c d e f g h"),
        StreamDoc(4L, "a b c d e f g x"))
      feed(StreamDoc(5L, "p q r s t u v y"),
        StreamDoc(6L, "a b c d e f g h"))
      val full = Dedup.minhashVerifiedDups(seen.toSeq.toDF(), "doc_id", "text",
        threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(pairs.toSet === full)
      assert(pairs.contains((1L, 3L, 1.0)), "cross-batch exact dup must pair")
      // init + one append per micro-batch (each a DELTA link)
      assert(MinhashIndexStore.latestVersion(spark, dir) === Some(3L))
      // the maintenance-cadence compact folds the stream's delta chain
      // into a full head, prune reclaims the folded links, and the
      // compacted store answers a probe identically to the live chain
      val probeDoc = Seq(StreamDoc(7L, "a b c d e f g h")).toDF()
      def probe() = MinhashIndexStore.probeLatest(spark, dir, probeDoc,
          "doc_id", "text", threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val live = probe()
      assert(live.contains((1L, 7L, 1.0)))
      assert(MinhashIndexStore.compact(spark, dir) === 4L)
      assert(MinhashIndexStore.prune(spark, dir, keepFrom = 4L) ===
        Seq(0L, 1L, 2L, 3L))
      assert(probe() === live)
    } finally {
      query.stop()
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
      spark.catalog.clearCache()
    }
  }

  test("incremental agg state maintained by a foreachBatch stream equals full recompute") {
    // the nightly→streaming continuum: the SAME algebraic state
    // pipeline.Incremental uses for batch merges maintains a live
    // rollup under foreachBatch — each micro-batch contributes its
    // aggState, merge folds it into the running state, and at any
    // point finalize equals the full recompute over everything seen
    // (bitwise: decimal state is order- and batch-invariant)
    import graft.pipeline.Incremental
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val metric = Seq("value" -> col("value").cast("decimal(18,2)"))
    var state: Option[org.apache.spark.sql.DataFrame] = None
    val input = MemoryStream[Event]
    val query = input.toDF().writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val s = Incremental.aggState(batch, Seq("event_type"), metric)
        // localCheckpoint: state must survive the batch frame's retire
        val merged = state match {
          case None => s
          case Some(prev) => Incremental.merge(Seq(prev, s), Seq("event_type"))
        }
        state = Some(merged.localCheckpoint(true))
        ()
      }
      .start()
    try {
      val all = scala.collection.mutable.ArrayBuffer.empty[Event]
      def feed(evts: Event*): Unit = {
        all ++= evts; input.addData(evts); query.processAllAvailable()
      }
      feed(Event(1, ts("2024-01-01 10:00:00"), 1, "click", 10.25),
        Event(2, ts("2024-01-01 10:01:00"), 2, "view", 1.50))
      feed(Event(3, ts("2024-01-01 10:02:00"), 1, "click", 2.75))
      feed(Event(4, ts("2024-01-01 10:03:00"), 3, "view", 0.10),
        Event(5, ts("2024-01-01 10:04:00"), 1, "click", 7.00))
      val streamed = Incremental.finalizeState(state.get, Seq("event_type"))
        .collect().map(_.toString).toSeq.sorted
      val full = Incremental.finalizeState(
        Incremental.aggState(all.toSeq.toDF(), Seq("event_type"), metric),
        Seq("event_type")).collect().map(_.toString).toSeq.sorted
      assert(streamed === full)
    } finally query.stop()
  }

  test("cms heavy-key screen runs on a stream (online hot-key flagging)") {
    // same composition argument as the bloom probe: CmsProbe is a pure
    // narrow expression over driver-built model state, so a sketch
    // built once from the historical corpus screens an incoming stream
    // per micro-batch with no state and no join — the online shape of
    // Sketch.heavyHitters' first pass (flag hot keys as they arrive;
    // the exact verify stays a batch reconciliation)
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val hist = (Seq.fill(40)("hot") ++ (0 until 20).map(i => s"cold_$i")).toDF("k0")
    val keyed = hist.select(col("k0").as("k"))
    val (cells, total) = graft.ops.Sketch.cmsCells(keyed, depth = 3, width = 64)
    val input = MemoryStream[StreamDoc]
    val flagged = input.toDF()
      .withColumn("hot",
        graft.functions.CmsProbe.probe(col("text"), cells, 3, 64) * lit(10L)
          >= lit(total)) // est >= N/10: only the hot key qualifies
      .select(col("doc_id").as("id"), col("hot"))
    val query = EventStream.startToMemory(flagged, "cms_stream")
    try {
      input.addData(StreamDoc(1L, "hot"), StreamDoc(2L, "cold_3"),
        StreamDoc(3L, "never_seen"))
      query.processAllAvailable()
      val rows = spark.table("cms_stream").orderBy("id")
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(rows(1L) === true)
      assert(rows(2L) === false) // 1/60 of historical mass: not hot
      // unseen keys can only be flagged by collision (CMS one-sided
      // error); at 3x64 over 21 keys the fixture has none
      assert(rows(3L) === false)
    } finally query.stop()
  }
}

/** Streaming-document fixture (top-level for the TypeTag-stable
  * encoder, like [[CdcChange]]). */
final case class StreamDoc(doc_id: Long, text: String)
