package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.{Engine, Q}
import graft.Engine.{dsum, sqlDsum}

/** Structured Streaming surface (SURVEY.md §2.2 Q21–Q23): tumbling and
  * sliding event-time windows, session windows, and stateful streaming
  * dedup, each verified by batch equivalence — a file-source replay of
  * the `events` table must produce exactly the batch/DuckDB result.
  *
  * Queries run the real streaming engine (micro-batch, memory sink,
  * AvailableNow semantics via processAllAvailable). On a cluster the
  * same pipelines run against a live source with `checkpointLocation`
  * for exactly-once recovery — recovery machinery the reference builds
  * by hand (WAL + checkpoints, reference src/log_mgr/io.rs:46-217 and
  * src/system/checkpointer.rs) is delegated to Spark's checkpoint files.
  */
object EventStreams {

  // One shared symlink dir per source path, removed on JVM exit — a
  // bench/test run that replays the same fixture through six streaming
  // queries reuses one dir instead of leaking one per call.
  private val fixtureDirs =
    new java.util.concurrent.ConcurrentHashMap[String, java.nio.file.Path]()
  sys.addShutdownHook {
    fixtureDirs.values.forEach { d =>
      try {
        java.nio.file.Files.deleteIfExists(d.resolve("events.parquet"))
        java.nio.file.Files.deleteIfExists(d)
      } catch { case _: java.io.IOException => () }
    }
  }

  /** Streaming view of the events table (schema from the batch reader,
    * including the ns→µs normalization in Engine.table). */
  def eventsStream(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$dir/events.parquet"
    // FileStreamSource needs a directory; expose the single fixture file
    // through a cached temp dir symlink (a live pipeline watches a real dir)
    val tmp = fixtureDirs.computeIfAbsent(path, { p =>
      val t = java.nio.file.Files.createTempDirectory("graft_events_stream_")
      java.nio.file.Files.createSymbolicLink(
        t.resolve("events.parquet"), java.nio.file.Paths.get(p))
      t
    })
    val raw = s.read.parquet(path)
    Engine.normalizeEventTs(s.readStream.schema(raw.schema).parquet(tmp.toString))
  }

  /** Dedicated streaming session per base session (SparkSession
    * .newSession: same SparkContext and warehouse, ISOLATED SQLConf).
    *
    * Stateful operators allocate one state store per shuffle partition
    * per stateful stage (a stream-stream join keeps four per
    * partition), and every micro-batch commits every store — so the
    * partition count must track STATE THROUGHPUT, not the batch
    * shuffle default. The fixture replay is a single micro-batch of
    * ~100k events: 8 partitions keeps all 32 cores busy inside the
    * stores while cutting per-batch store-commit overhead 4x. A
    * production deployment sizes this to keys/sec (it is fixed at
    * first checkpoint).
    *
    * Scoping the override to a separate session (instead of mutating
    * and restoring the caller's session-global conf) means a batch
    * query running CONCURRENTLY in the base session can never observe
    * the streaming partition count — the round-4 ADVICE coupling. */
  // WEAK keys: an entry dies with its base session instead of pinning
  // stopped sessions forever (the map is consulted per query, so the
  // synchronized wrapper's lock is never contended on a hot path)
  private val streamSessions = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, SparkSession]())
  private[graft] def streamSession(s: SparkSession): SparkSession =
    streamSessions.computeIfAbsent(s, { base =>
      val ss = base.newSession()
      ss.conf.set("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_STREAM_SHUFFLE", "8"))
      ss.conf.set("spark.sql.session.timeZone", "UTC")
      ss.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      configureStateStore(ss)
      ss
    })

  /** Stateful-operator state store for the dedicated stream session:
    * RocksDB, the scale-correct default. The HDFS-backed provider keeps
    * every key's state on the EXECUTOR HEAP — at a 100 TB event stream
    * the watermark-bounded state (dedup keys, session windows, join
    * buffers) outgrows the heap long before throughput is a problem;
    * RocksDB spills state to local disk with bounded block-cache memory
    * and adds changelog/snapshot files to the same checkpoint contract
    * (restart tests pin resume-under-RocksDB). Overridable for
    * environments without a writable local disk. */
  private[graft] def configureStateStore(ss: SparkSession): Unit = {
    ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      sys.env.getOrElse("SPARK_GRAFT_STATE_STORE",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"))
    // changelog checkpointing: per-batch durability uploads only the
    // batch's CHANGES (periodic SST snapshots amortize in background)
    // instead of re-uploading whole SST files every micro-batch — the
    // difference between O(state-delta) and O(state-size) checkpoint IO
    // once state outgrows a few hundred MB per partition. The restart
    // test pins resume correctness under this mode.
    ss.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
      "true")
  }

  /** Run a streaming DF to completion into a memory sink, return the
    * materialized table. The memory sink registers its view in the
    * session that BUILT `df` (the [[streamSession]] in every caller),
    * so the table is read back from there. */
  def runToTable(df: DataFrame, name: String, mode: String): DataFrame = {
    val ss = df.sparkSession
    ss.streams.active.filter(_.name == name).foreach(_.stop())
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    ss.table(name)
  }

  val defs: Seq[(String, Q)] = Seq(

    // tumbling window — must equal batch q21_time_window / its oracle
    "q22_stream_tumbling" -> Q(
      "SELECT date_trunc('hour', ts) AS w, event_type, COUNT(*) AS c, " +
      s"${sqlDsum("value")} AS sv FROM events GROUP BY 1, 2 ORDER BY 1, 2") {
      (s, dir) =>
        val ss = streamSession(s)
        val agg = eventsStream(ss, dir)
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("c"), dsum(col("value")).as("sv"))
        runToTable(agg, "q22_tumbling_sink", "complete")
          .select(col("window.start").as("w"), col("event_type"),
            col("c"), col("sv"))
          .orderBy("w", "event_type")
    },

    // sliding window (2h length, 1h slide): each event lands in 2 windows
    "q22_stream_sliding" -> Q(
      "SELECT w, event_type, COUNT(*) AS c FROM (" +
      "SELECT date_trunc('hour', ts) - to_hours(i) AS w, event_type " +
      "FROM events, (SELECT unnest(generate_series(0, 1)) AS i)) " +
      "GROUP BY 1, 2 ORDER BY 1, 2") {
      (s, dir) =>
        val ss = streamSession(s)
        val agg = eventsStream(ss, dir)
          .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("c"))
        runToTable(agg, "q22_sliding_sink", "complete")
          .select(col("window.start").as("w"), col("event_type"), col("c"))
          .orderBy("w", "event_type")
    },

    // batch session windows (5-minute gap) — oracle via gaps-and-islands
    "q21_session_window" -> Q(
      "WITH x AS (SELECT user_id, ts, CASE WHEN ts - lag(ts) OVER " +
      "(PARTITION BY user_id ORDER BY ts) < INTERVAL 5 MINUTE " +
      "THEN 0 ELSE 1 END AS brk FROM events), " +
      "y AS (SELECT user_id, ts, SUM(brk) OVER (PARTITION BY user_id " +
      "ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM x) " +
      "SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n FROM y " +
      "GROUP BY user_id, sid ORDER BY user_id, session_start") {
      (s, dir) =>
        Engine.table(s, dir, "events")
          .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n"))
          .select(col("user_id"),
            col("session_window.start").as("session_start"), col("n"))
          .orderBy("user_id", "session_start")
    },

    // STREAMING session windows: the stateful merging-window aggregation
    // (sessions grow/merge as events arrive; state closes once the
    // watermark passes gap + session end). AvailableNow over the full
    // fixture must equal the batch session query — so the same
    // gaps-and-islands oracle verifies the streaming state machine.
    "q21_session_window_stream" -> Q(
      "WITH x AS (SELECT user_id, ts, CASE WHEN ts - lag(ts) OVER " +
      "(PARTITION BY user_id ORDER BY ts) < INTERVAL 5 MINUTE " +
      "THEN 0 ELSE 1 END AS brk FROM events), " +
      "y AS (SELECT user_id, ts, SUM(brk) OVER (PARTITION BY user_id " +
      "ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM x) " +
      "SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n FROM y " +
      "GROUP BY user_id, sid ORDER BY user_id, session_start") {
      (s, dir) =>
        val ss = streamSession(s)
        val agg = eventsStream(ss, dir)
          .withWatermark("ts", "10 minutes")
          .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n"))
        runToTable(agg, "q21_session_stream_sink", "complete")
          .select(col("user_id"),
            col("session_window.start").as("session_start"), col("n"))
          .orderBy("user_id", "session_start")
    },

    // stream-static enrichment: each micro-batch joins the live event
    // stream against a STATIC dimension snapshot (no state, no
    // watermark needed — the dim is re-broadcast per batch, the
    // standard shape for enriching a firehose with reference data).
    // Inner join + replay == batch join, so the batch oracle
    // hash-verifies it.
    "q23_stream_static_join" -> Q(
      "SELECT c.c_mktsegment AS seg, COUNT(*) AS c, " +
      s"${sqlDsum("e.value")} AS sv " +
      "FROM events e JOIN customer c ON e.user_id = c.c_custkey " +
      "GROUP BY 1 ORDER BY 1") {
      (s, dir) =>
        val ss = streamSession(s)
        val dim = Engine.table(ss, dir, "customer")
          .select(col("c_custkey").as("user_id"),
            col("c_mktsegment").as("seg"))
        val agg = eventsStream(ss, dir).select("user_id", "value")
          .join(broadcast(dim), "user_id")
          .groupBy("seg")
          .agg(count(lit(1)).as("c"), dsum(col("value")).as("sv"))
        runToTable(agg, "q23_static_join_sink", "complete")
          .orderBy("seg")
    },

    // stateful streaming dedup on event_id; count equals batch distinct
    "q23_stream_dedup" -> Q(
      "SELECT COUNT(DISTINCT event_id) AS c FROM events") {
      (s, dir) =>
        val ss = streamSession(s)
        val dedup = eventsStream(ss, dir).dropDuplicates("event_id")
        runToTable(dedup, "q23_dedup_sink", "append")
          .agg(count(lit(1)).as("c"))
    },

    // arbitrary stateful processing: per-user running counters via
    // flatMapGroupsWithState (the engine's general state API — the
    // analog of the reference's per-object transactional counters in
    // its concurrency test, instance.rs:724-758). One batch processes
    // all rows, so each user emits exactly one final update.
    //
    // State is GC'd via EventTimeTimeout: each update arms a timeout at
    // last-seen-ts + 1 hour, and once the watermark passes it the state
    // is dropped (emitting nothing — counts were already emitted on
    // update). On an unbounded keyspace NoTimeout would leak one state
    // entry per user forever; this is the production-required shape.
    "q23_stream_custom_state" -> Q(
      "SELECT user_id, COUNT(*) AS c FROM events " +
      "GROUP BY user_id ORDER BY user_id") {
      (s, dir) =>
        val ss = streamSession(s)
        import ss.implicits._
        import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
        val events = eventsStream(ss, dir)
          .withWatermark("ts", "10 minutes")
          .select(col("user_id"), col("ts"))
          .as[(Long, java.sql.Timestamp)]
        val counted = events.groupByKey(_._1)
          .flatMapGroupsWithState(
            OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
            (uid: Long, rows: Iterator[(Long, java.sql.Timestamp)],
             state: GroupState[Long]) =>
              if (state.hasTimedOut) {
                state.remove() // GC: final count was already emitted
                Iterator.empty
              } else {
                var c = state.getOption.getOrElse(0L)
                var maxTs = Long.MinValue
                rows.foreach { r => c += 1; maxTs = math.max(maxTs, r._2.getTime) }
                state.update(c)
                state.setTimeoutTimestamp(maxTs + 3600 * 1000L)
                Iterator((uid, c))
              }
          }
        runToTable(counted.toDF("user_id", "c"),
          "q23_custom_state_sink", "update")
          .orderBy("user_id")
    },

    // STREAM-STREAM inner join with event-time bounds: clicks joined to
    // the purchases they convert into within 30 minutes. Both sides
    // carry watermarks and the join condition bounds the buffered state
    // (a click older than watermark+30min can never match and is
    // evicted) — the state-bounding discipline that makes stream-stream
    // joins runnable forever. Inner join + AvailableNow replay ==
    // batch join, so the batch oracle hash-verifies it.
    "q23_stream_stream_join" -> Q(
      "SELECT a.user_id, COUNT(*) AS c FROM events a JOIN events b " +
      "ON a.user_id = b.user_id AND a.event_type = 'click' " +
      "AND b.event_type = 'purchase' " +
      "AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE " +
      "GROUP BY a.user_id ORDER BY a.user_id") {
      (s, dir) =>
        val ss = streamSession(s)
        val clicks = eventsStream(ss, dir)
          .filter(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("click_ts"))
          .withWatermark("click_ts", "10 minutes")
        val purchases = eventsStream(ss, dir)
          .filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
          .withWatermark("p_ts", "10 minutes")
        val joined = clicks.join(purchases,
          col("user_id") === col("p_user") &&
          col("p_ts") >= col("click_ts") &&
          col("p_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
        val out = runToTable(joined, "q23_ss_join_sink", "append")
        out.groupBy("user_id").agg(count(lit(1)).as("c"))
          .orderBy("user_id")
    },

    // streaming -> ACID table: every micro-batch is one transactional
    // commit (reference group commit, log_mgr/io.rs:99-103); the final
    // committed table must agree with the batch oracle over the same
    // events — the durability path a real user of the reference builds
    // first
    "q22_stream_to_acid" -> Q(
      "SELECT event_type, COUNT(*) AS c, " +
      s"${sqlDsum("value")} AS sv FROM events GROUP BY 1 ORDER BY 1") {
      (s, dir) =>
        val stream = eventsStream(s, dir)
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_acid_sink_").toUri.toString
        val inst = graft.acid.VersionedTable.create(s, tmp,
          stream.schema.add("obj_id",
            org.apache.spark.sql.types.LongType, nullable = false))
        AcidSink.runInto(inst, stream, "event_id")
        inst.read()
          .groupBy("event_type")
          .agg(count(lit(1)).as("c"), dsum(col("value")).as("sv"))
          .orderBy("event_type")
    },

    // watermark-scoped dedup (state is GC'd past the watermark at scale)
    "q23_stream_dedup_wm" -> Q(
      "SELECT COUNT(DISTINCT event_id) AS c FROM events") {
      (s, dir) =>
        val ss = streamSession(s)
        val dedup = eventsStream(ss, dir)
          .withWatermark("ts", "10 minutes")
          .dropDuplicatesWithinWatermark("event_id")
        runToTable(dedup, "q23_dedup_wm_sink", "append")
          .agg(count(lit(1)).as("c"))
    }
  )
}
