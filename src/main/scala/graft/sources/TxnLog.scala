package graft.sources

import graft.streaming.TxnEngine.SkTxn
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON transaction-log codec — the analog of the reference's JSON-over-
  * Kafka topics (reference modules/core/.../package.scala:61-62 and the
  * upickle encode/decode in the runners). A production deployment points
  * the same schema at `readStream`/`writeStream` with a Kafka source; the
  * tests drive it through files and memory batches.
  */
object TxnLog {
  val schema: StructType = StructType(Seq(
    StructField("txnId", LongType, nullable = false),
    StructField("key", StringType, nullable = false),
    StructField("hasAssert", BooleanType, nullable = false),
    StructField("assertValue", StringType, nullable = true),
    StructField("updateValue", StringType, nullable = true)))

  /** Encode txns as one JSON document per line. */
  def encode(txns: Dataset[SkTxn]): DataFrame =
    txns.select(to_json(struct(col("txnId"), col("key"), col("hasAssert"),
      col("assertValue"), col("updateValue"))).as("value"))

  /** Decode a `value: string` column of JSON documents back to txns. */
  def decode(lines: DataFrame): Dataset[SkTxn] = {
    import lines.sparkSession.implicits._
    lines.select(from_json(col("value"), schema).as("t"))
      .select(col("t.txnId"), col("t.key"), col("t.hasAssert"),
        col("t.assertValue"), col("t.updateValue"))
      .as[SkTxn]
  }

  private val kvSchema = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("valueOption", StringType, nullable = true)))

  /** Multi-key txn schema — the reference's actual topic format carries
    * assert and update LISTS per transaction (package.scala:24-58).
    */
  val mkSchema: StructType = StructType(Seq(
    StructField("txnId", LongType, nullable = false),
    StructField("asserts", ArrayType(kvSchema, containsNull = false), nullable = false),
    StructField("updates", ArrayType(kvSchema, containsNull = false), nullable = false)))

  /** Encode multi-key txns as one JSON document per line. */
  def encodeMk(txns: Dataset[graft.streaming.TxnEngine.Txn]): DataFrame =
    txns.select(to_json(struct(col("txnId"), col("asserts"),
      col("updates"))).as("value"))

  /** Decode a `value: string` column back to multi-key txns. */
  def decodeMk(lines: DataFrame): Dataset[graft.streaming.TxnEngine.Txn] = {
    import lines.sparkSession.implicits._
    lines.select(from_json(col("value"), mkSchema).as("t"))
      .select(col("t.txnId"), col("t.asserts"), col("t.updates"))
      .as[graft.streaming.TxnEngine.Txn]
  }
}
