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
  */
object KafkaTransport {
  /** Kafka topic → (key, value, timestamp) stream, the reference's
    * consumer shape: keys/values are UTF-8 strings (the TxnLog JSON codec
    * decodes `value` exactly as it decodes a staged file line), and the
    * broker timestamp rides along for event-time operators.
    */
  def source(spark: SparkSession, servers: String, topic: String,
      startingOffsets: String = "earliest"): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
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
      .option("kafka.bootstrap.servers", servers)
      .option("topic", topic)
      .option("checkpointLocation", checkpointDir)
}
