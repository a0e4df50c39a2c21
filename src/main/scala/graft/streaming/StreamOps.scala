package graft.streaming

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analytics operators (SURVEY §2 G) driven through real
  * Structured Streaming plans via [[StreamRunner]].
  */
object StreamOps {
  private type Q = (SparkSession, String) => DataFrame

  /** g1: streaming dedup — first occurrence of each (user_id, event_type)
    * pair across micro-batches (dropDuplicates keyed state).
    */
  def g1(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rows = Tables.events(s, dir)
      .select($"user_id", $"event_type").as[(Long, String)]
      .collect().toSeq
    val (b1, b2) = rows.splitAt(rows.length / 2)
    StreamRunner.run(s, Seq(b1, b2)) { ds =>
      ds.toDF("user_id", "event_type").dropDuplicates("user_id", "event_type")
    }
  }

  val g1Sql: String = "SELECT DISTINCT user_id, event_type FROM events"

  final case class SessEvent(userId: Long, tsUs: Long, eventId: Long)
  final case class SessState(start: Long, end: Long, n: Long, sid: Long)
  final case class Session(user_id: Long, session_id: Long, n_events: Long,
      session_start: java.sql.Timestamp, session_end: java.sql.Timestamp)

  private val GapUs = 30L * 60 * 1000000

  /** µs-precision epoch → Timestamp (plain ms construction drops µs). */
  private def usToTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp((us / 1000000) * 1000)
    t.setNanos(((us % 1000000) * 1000).toInt)
    t
  }

  /** g2: stateful streaming sessionization (30-min gap), the
    * mapGroupsWithState analog of batch q22. Sessions close when a gap
    * arrives; a per-user far-future sentinel closes the tail session.
    * Events must arrive in (ts, event_id) order per user across batches
    * (the deterministic-order contract the reference's event-time sorter
    * establishes; here the feeder sorts).
    */
  def g2(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rows = Tables.events(s, dir)
      .select($"user_id", unix_micros($"ts").as("ts_us"), $"event_id")
      .as[(Long, Long, Long)].collect()
      .map(r => SessEvent(r._1, r._2, r._3))
      .sortBy(e => (e.tsUs, e.eventId))
    val mid = if (rows.isEmpty) 0L else rows(rows.length / 2).tsUs
    val maxTs = if (rows.isEmpty) 0L else rows.map(_.tsUs).max
    val sentinels = rows.map(_.userId).distinct
      .map(u => SessEvent(u, maxTs + 2 * GapUs, -1L))
    val batches = Seq(
      rows.filter(_.tsUs < mid).toSeq,
      rows.filter(_.tsUs >= mid).toSeq,
      sentinels.toSeq)
    StreamRunner.run(s, batches) { ds =>
      ds.groupByKey(_.userId)
        .flatMapGroupsWithState[SessState, Session](
          OutputMode.Append, GroupStateTimeout.NoTimeout) { (user, it, gs) =>
          val out = List.newBuilder[Session]
          var st = gs.getOption.orNull
          it.toSeq.sortBy(e => (e.tsUs, e.eventId)).foreach { e =>
            if (st == null) {
              st = SessState(e.tsUs, e.tsUs, 1, 1)
            } else if (e.tsUs - st.end > GapUs) {
              out += Session(user, st.sid, st.n, usToTs(st.start), usToTs(st.end))
              st = SessState(e.tsUs, e.tsUs, 1, st.sid + 1)
            } else {
              st = st.copy(end = e.tsUs, n = st.n + 1)
            }
          }
          gs.update(st)
          out.result().iterator
        }.toDF()
    }.filter(col("n_events") > 0)
  }

  // same output contract as batch q22
  val g2Sql: String = graft.operators.Relational.q22Sql

  final case class ViewEv(v_user: Long, view_id: Long, v_ts: java.sql.Timestamp)
  final case class ClickEv(c_user: Long, click_id: Long, c_ts: java.sql.Timestamp)

  /** g3: stream-stream interval join with watermarks on both sides —
    * views joined to same-user clicks within (0, 10 min]. Same output
    * contract as batch q19; the range condition also bounds join state.
    */
  def g3(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    def rows(tpe: String): Seq[(Long, Long, java.sql.Timestamp)] =
      ev.filter($"event_type" === tpe)
        .select($"user_id", $"event_id", $"ts")
        .as[(Long, Long, java.sql.Timestamp)].collect()
        .sortBy(_._3.getTime).toSeq
    def halves[T](xs: Seq[T]): Seq[Seq[T]] = {
      val (b1, b2) = xs.splitAt(xs.length / 2); Seq(b1, b2)
    }
    val views = halves(rows("view").map(r => ViewEv(r._1, r._2, r._3)))
    val clicks = halves(rows("click").map(r => ClickEv(r._1, r._2, r._3)))
    StreamRunner.run2(s, views, clicks) { (v, c) =>
      v.toDF().withWatermark("v_ts", "1 hour")
        .join(c.toDF().withWatermark("c_ts", "1 hour"),
          expr("v_user = c_user AND c_ts > v_ts AND c_ts <= v_ts + interval 10 minutes"))
        .select(col("v_user").as("user_id"), col("view_id"), col("click_id"))
    }
  }

  val g3Sql: String = graft.operators.Relational.q19Sql

  /** g7: stream-stream LEFT OUTER interval join — like g3, but views with
    * no click in the window emit once with null click columns after the
    * watermark passes their join window (outer-side state eviction, the
    * semantics plain inner joins can't express). A far-future batch on
    * both sides advances the watermark so every pending view resolves.
    */
  def g7(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    def rows(tpe: String): Seq[(Long, Long, java.sql.Timestamp)] =
      ev.filter($"event_type" === tpe)
        .select($"user_id", $"event_id", $"ts")
        .as[(Long, Long, java.sql.Timestamp)].collect()
        .sortBy(_._3.getTime).toSeq
    val maxMs = ev.agg(max($"ts")).as[java.sql.Timestamp].head().getTime
    def withSentinel(xs: Seq[(Long, Long, java.sql.Timestamp)])
        : Seq[Seq[(Long, Long, java.sql.Timestamp)]] = {
      val (b1, b2) = xs.splitAt(xs.length / 2)
      val far = new java.sql.Timestamp(maxMs + 30L * 24 * 3600 * 1000)
      Seq(b1, b2, Seq((-1L, -1L, far)))
    }
    val views = withSentinel(rows("view")).map(_.map(r => ViewEv(r._1, r._2, r._3)))
    val clicks = withSentinel(rows("click")).map(_.map(r => ClickEv(r._1, r._2, r._3)))
    StreamRunner.run2(s, views, clicks) { (v, c) =>
      v.toDF().withWatermark("v_ts", "1 hour")
        .join(c.toDF().withWatermark("c_ts", "1 hour"),
          expr("v_user = c_user AND c_ts > v_ts AND c_ts <= v_ts + interval 10 minutes"),
          "left_outer")
        .select(col("v_user").as("user_id"), col("view_id"), col("click_id"))
    }.filter(col("user_id") >= 0)
  }

  val g7Sql: String = """
    SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON v.user_id = c.user_id AND c.ts > v.ts
        AND c.ts <= v.ts + INTERVAL 10 MINUTE"""

  /** g4: stream-static join — the event stream enriched against the static
    * customer dimension (broadcast; no streaming state needed).
    */
  def g4(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = Tables.customer(s, dir).select($"c_custkey", $"c_name", $"c_mktsegment")
    val rows = Tables.events(s, dir)
      .select($"event_id", $"user_id").as[(Long, Long)].collect()
    val (b1, b2) = rows.splitAt(rows.length / 2)
    StreamRunner.run(s, Seq(b1.toSeq, b2.toSeq)) { ds =>
      ds.toDF("event_id", "user_id")
        .join(broadcast(cust), col("user_id") === col("c_custkey"))
        .select(col("event_id"), col("user_id"), col("c_name"), col("c_mktsegment"))
    }
  }

  val g4Sql: String = """
    SELECT event_id, user_id, c_name, c_mktsegment
    FROM events JOIN customer ON user_id = c_custkey"""

  /** g5: Spark's BUILT-IN session windows (`session_window` + watermark,
    * append mode) — the declarative twin of g2's custom
    * flatMapGroupsWithState sessionizer. Sessions finalize when the
    * watermark passes `last event + gap`; a far-future sentinel on a
    * synthetic user advances the global watermark so every real session
    * emits. Window end is `last_ts + gap` by definition — the oracle
    * mirrors it with an interval add on the gap-sessionized batch.
    */
  def g5(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rows = Tables.events(s, dir)
      .select($"user_id", $"ts").as[(Long, java.sql.Timestamp)]
      .collect().sortBy(_._2.getTime)
    val maxMs = rows.map(_._2.getTime).max
    val sentinel = (-1L, new java.sql.Timestamp(maxMs + 4L * 3600 * 1000))
    val (b1, b2) = rows.splitAt(rows.length / 2)
    StreamRunner.run(s, Seq(b1.toSeq, b2.toSeq, Seq(sentinel))) { ds =>
      ds.toDF("user_id", "ts")
        .withWatermark("ts", "0 seconds")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).cast("long").as("n_events"))
        .select(col("user_id"), col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"), col("n_events"))
    }.filter(col("user_id") >= 0)
  }

  val g5Sql: String = """
    WITH flagged AS (
      SELECT user_id, ts, event_id,
        CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
          OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 30 * 60 * 1000000
          THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sessions AS (
      SELECT user_id, ts,
        sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged)
    SELECT user_id, min(ts) AS session_start,
      max(ts) + INTERVAL 30 MINUTE AS session_end,
      CAST(count(*) AS BIGINT) AS n_events
    FROM sessions GROUP BY user_id, session_id"""

  /** g6: complete-output-mode streaming aggregation — per-event-type
    * totals recomputed every micro-batch; the final complete table equals
    * the batch aggregate.
    */
  def g6(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rows = Tables.events(s, dir)
      .select($"event_type", $"user_id").as[(String, Long)].collect()
    val (b1, b2) = rows.splitAt(rows.length / 2)
    StreamRunner.run(s, Seq(b1.toSeq, b2.toSeq), outputMode = "complete") { ds =>
      ds.toDF("event_type", "user_id")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).cast("long").as("n_events"),
          min(col("user_id")).as("first_user"),
          max(col("user_id")).as("last_user"))
    }
  }

  val g6Sql: String = """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
      min(user_id) AS first_user, max(user_id) AS last_user
    FROM events GROUP BY event_type"""

  val queries: Map[String, Q] = Map(
    "g1_stream_dedup" -> g1, "g2_stream_sessionize" -> g2,
    "g3_stream_interval_join" -> g3, "g4_stream_static_join" -> g4,
    "g5_stream_session_window" -> g5, "g6_stream_complete_agg" -> g6,
    "g7_stream_outer_interval_join" -> g7)

  val oracles: Map[String, String] = Map(
    "g1_stream_dedup" -> g1Sql, "g2_stream_sessionize" -> g2Sql,
    "g3_stream_interval_join" -> g3Sql, "g4_stream_static_join" -> g4Sql,
    "g5_stream_session_window" -> g5Sql, "g6_stream_complete_agg" -> g6Sql,
    "g7_stream_outer_interval_join" -> g7Sql)
}
