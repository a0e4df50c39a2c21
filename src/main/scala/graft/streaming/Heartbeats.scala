package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Heartbeat-driven watermark advancement — the analog of the reference's
  * HeartBeatGenerator (reference modules/runners/flink/.../
  * HeartBeatGenerator.scala:20-105), which publishes periodic heartbeat
  * records so event-time watermarks keep advancing when real traffic is
  * idle and open windows / pending timers eventually fire.
  *
  * Heartbeats are ordinary rows in the event schema tagged with [[Marker]]:
  * they move the watermark like any event but are filtered before output.
  */
object Heartbeats {
  val Marker = "zzz_heartbeat"

  /** Production shape: a rate-source stream lowered to heartbeat rows
    * (one per second of wall clock) — union with the data stream feeding
    * [[windowedCounts]]. Deterministic tests/gates feed explicit heartbeat
    * batches through a MemoryStream instead.
    */
  def rateHeartbeats(s: SparkSession): DataFrame =
    s.readStream.format("rate").option("rowsPerSecond", 1).load()
      .select(col("timestamp").as("ts"), lit(Marker).as("event_type"))

  /** Watermarked tumbling-window counts by event_type over a
    * heartbeat-merged stream: heartbeats advance the watermark, flushing
    * append-mode windows even when the data stream is idle.
    *
    * Heartbeat windows ARE emitted (tagged [[Marker]]): the caller filters
    * them from the sink table with [[dropHeartbeats]]. The filter must NOT
    * live inside the streaming query — a predicate on the grouping column
    * gets pushed below the aggregate and below the watermark operator, so
    * the heartbeat rows would be discarded before ever advancing the
    * watermark (silently recreating the stuck-window problem they exist
    * to solve).
    */
  def windowedCounts(data: DataFrame, heartbeats: DataFrame): DataFrame =
    data.unionByName(heartbeats)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).cast("long").as("n"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"))

  /** Strip heartbeat rows from a collected/sink table. */
  def dropHeartbeats(out: DataFrame): DataFrame =
    out.filter(col("event_type") =!= Marker)
}
