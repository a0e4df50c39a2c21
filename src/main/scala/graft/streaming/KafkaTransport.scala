package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

/** The reference's Kafka transport as a Structured Streaming seam.
  *
  * streamy-db's deployed topology (reference
  * modules/runners/flink/.../StreamyDb.scala:177-242) reads the txn-input
  * topic and writes the txn-result topic; TopicsCreator.scala:1-42
  * provisions both. This engine's gate and tests drive the SAME query
  * builders from file-fed sources ([[StreamRunner.runFiles]]) because the
  * sandbox has no broker or connector jar; a deployment switches transport
  * by calling these factories instead — every operator in
  * streaming/StreamOps.scala and operators/TxnQueries.scala takes a
  * DataFrame and never cares which source produced it.
  *
  * Requires `spark-sql-kafka-0-10` on the classpath at deploy time (a
  * runtime lookup by name — nothing here links against it, so this
  * compiles and ships without the connector; calling [[source]] without it
  * fails fast with Spark's "Failed to find data source: kafka").
  *
  * Option-contract discipline: the connector jar is not available in this
  * sandbox even as a test dependency (offline resolver), so the option
  * names cannot be pinned against the connector's own registry here.
  * Instead ALL option construction goes through [[sourceOptions]] /
  * [[sinkOptions]] — a single audited surface whose keys mirror the
  * Structured Streaming + Kafka integration guide verbatim — and inputs
  * are validated eagerly so a misconfigured deployment fails in the
  * factory with a precise message, not inside the connector at stream
  * start. KafkaSeamSpec pins the exact key set and the validation
  * behavior, so any drift in these strings is a test failure.
  */
object KafkaTransport {
  /** Exact option keys [[sourceOptions]] emits (the kafka source's
    * `kafka.bootstrap.servers`, `subscribe`, `startingOffsets`).
    */
  val SourceOptionKeys: Set[String] =
    Set("kafka.bootstrap.servers", "subscribe", "startingOffsets")

  /** Exact option keys [[sinkOptions]] emits (the kafka sink's
    * `kafka.bootstrap.servers`, `topic`, plus Structured Streaming's
    * `checkpointLocation`).
    */
  val SinkOptionKeys: Set[String] =
    Set("kafka.bootstrap.servers", "topic", "checkpointLocation")

  private val HostPort = """[^\s,:]+:\d{1,5}""".r

  private def requireServers(servers: String): Unit = {
    val parts = servers.split(",").map(_.trim)
    require(parts.nonEmpty && parts.forall(p => HostPort.matches(p)),
      s"kafka.bootstrap.servers must be a comma-separated host:port list, got '$servers'")
  }

  private def requireTopic(topic: String): Unit =
    require(topic.nonEmpty && topic.matches("[A-Za-z0-9._-]+"),
      s"kafka topic must match [A-Za-z0-9._-]+, got '$topic'")

  /** Validated option map for [[source]]. `startingOffsets` accepts the
    * connector's documented forms: `earliest`, `latest`, or a per-
    * partition offset JSON object.
    */
  def sourceOptions(servers: String, topic: String,
      startingOffsets: String = "earliest"): Map[String, String] = {
    requireServers(servers)
    requireTopic(topic)
    require(startingOffsets == "earliest" || startingOffsets == "latest" ||
      startingOffsets.trim.startsWith("{"),
      s"startingOffsets must be earliest|latest|offset-json, got '$startingOffsets'")
    Map("kafka.bootstrap.servers" -> servers,
      "subscribe" -> topic,
      "startingOffsets" -> startingOffsets)
  }

  /** Validated option map for [[sink]]. */
  def sinkOptions(servers: String, topic: String,
      checkpointDir: String): Map[String, String] = {
    requireServers(servers)
    requireTopic(topic)
    require(checkpointDir.nonEmpty, "checkpointLocation must be non-empty")
    Map("kafka.bootstrap.servers" -> servers,
      "topic" -> topic,
      "checkpointLocation" -> checkpointDir)
  }

  /** Kafka topic → (key, value, timestamp) stream, the reference's
    * consumer shape: keys/values are UTF-8 strings (the TxnLog JSON codec
    * decodes `value` exactly as it decodes a staged file line), and the
    * broker timestamp rides along for event-time operators.
    */
  def source(spark: SparkSession, servers: String, topic: String,
      startingOffsets: String = "earliest"): DataFrame =
    spark.readStream.format("kafka")
      .options(sourceOptions(servers, topic, startingOffsets))
      .load()
      .select(col("key").cast("string").as("key"),
        col("value").cast("string").as("value"),
        col("timestamp").as("ts"))

  /** (key, value) stream → Kafka topic, the reference's producer shape.
    * `df` must have string-castable `key` and `value` columns; exactly-once
    * is the usual Structured Streaming contract (checkpointed offsets +
    * idempotent or transactional downstream consumers).
    */
  def sink(df: DataFrame, servers: String, topic: String,
      checkpointDir: String): DataStreamWriter[Row] =
    df.select(col("key").cast("string").as("key"),
        col("value").cast("string").as("value"))
      .writeStream.format("kafka")
      .options(sinkOptions(servers, topic, checkpointDir))
}
