package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Source/sink round trips (SURVEY §2 H): prove the csv/json codecs
  * preserve the relational tables exactly (the gate compares the re-read
  * data against the parquet original).
  */
object Roundtrip {
  private type Q = (SparkSession, String) => DataFrame

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** h1: nation → csv (header) → read with explicit schema. */
  def h1(s: SparkSession, dir: String): DataFrame = {
    val out = tmp("graft_csv_")
    Tables.nation(s, dir).write.mode("overwrite")
      .option("header", "true").csv(out)
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    s.read.option("header", "true").schema(schema).csv(out)
  }

  val h1Sql: String = "SELECT n_nationkey, n_name, n_regionkey FROM nation"

  /** h2: region → json lines → read with explicit schema. */
  def h2(s: SparkSession, dir: String): DataFrame = {
    val out = tmp("graft_json_")
    Tables.region(s, dir).write.mode("overwrite").json(out)
    val schema = StructType(Seq(
      StructField("r_regionkey", IntegerType),
      StructField("r_name", StringType)))
    s.read.schema(schema).json(out)
  }

  val h2Sql: String = "SELECT r_regionkey, r_name FROM region"

  /** h3: supplier → ORC → read back (schema from the ORC footer; the
    * oracle compares against the parquet original, so the round trip must
    * be lossless including doubles).
    */
  def h3(s: SparkSession, dir: String): DataFrame = {
    val out = tmp("graft_orc_")
    Tables.supplier(s, dir).write.mode("overwrite").orc(out)
    s.read.orc(out)
  }

  val h3Sql: String = "SELECT * FROM supplier"

  val queries: Map[String, Q] = Map(
    "h1_csv_roundtrip" -> h1, "h2_json_roundtrip" -> h2,
    "h3_orc_roundtrip" -> h3)

  val oracles: Map[String, String] = Map(
    "h1_csv_roundtrip" -> h1Sql, "h2_json_roundtrip" -> h2Sql,
    "h3_orc_roundtrip" -> h3Sql)
}
