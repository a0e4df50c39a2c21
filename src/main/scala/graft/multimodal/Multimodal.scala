package graft.multimodal

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2 F).
  *
  * Media payloads are opaque `binary` columns with typed metadata. The
  * container has no image/audio codecs by design, so the *decode* step is a
  * clearly-marked deterministic stub ([[StubDecoder]]); everything around
  * it — binary columns, schema, partition-parallel batch decode via
  * `mapPartitions`, per-frame sampling — is the real pipeline shape.
  */
object Multimodal {
  private type Q = (SparkSession, String) => DataFrame

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRow(doc_id: Long, blob: Array[Byte])
  final case class MediaFeatures(doc_id: Long, f0: Double, f1: Double,
      f2: Double, f3: Double, f4: Double, f5: Double, f6: Double, f7: Double)

  /** STUB decoder: a real implementation would decode image/audio bytes
    * (the codec libraries are intentionally absent here); this stands in a
    * deterministic md5-nibble "feature vector" so the distributed plumbing
    * is fully exercised and oracle-checkable.
    */
  object StubDecoder {
    def features(blob: Array[Byte]): Array[Double] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(blob).map("%02x".format(_)).mkString
      Array.tabulate(8)(k => Integer.parseInt(hex.substring(k, k + 1), 16) / 15.0)
    }
  }

  /** Text→binary ingestion used by the queries below (documents stand in
    * for a media table; payload = utf-8 bytes).
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", encode($"text", "UTF-8").as("blob"))
  }

  /** m1: binary payload + typed metadata (byte length, digest). */
  def m1(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir).select($"doc_id",
      length($"blob").cast("long").as("byte_len"),
      md5($"blob").as("blob_md5"))
  }

  val m1Sql: String =
    "SELECT doc_id, CAST(strlen(text) AS BIGINT) AS byte_len, md5(text) AS blob_md5 FROM documents"

  /** m2: fixed-stride frame sampling from the payload (64-unit frames at
    * stride 128), per-frame digests — the frame-extraction plan shape.
    * Frame offsets are **character-based on both sides** (Spark
    * `length`/`substr` ≡ DuckDB `length`/`substring`; DuckDB cannot slice
    * BLOBs, so byte semantics isn't oracle-expressible); the md5 then
    * hashes the frame's UTF-8 bytes identically in both engines, so the
    * gate holds for non-ASCII text too.
    */
  def m2(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nFrames = floor((length($"text") - lit(64)) / lit(128.0)).cast("int")
    Tables.documents(s, dir)
      .filter(length($"text") >= 64)
      .withColumn("frames",
        transform(sequence(lit(0), nFrames),
          i => $"text".substr(lit(1) + i * 128, lit(64))))
      .select($"doc_id", posexplode($"frames"))
      .toDF("doc_id", "frame_idx", "frame")
      .select($"doc_id", $"frame_idx".cast("long").as("frame_idx"),
        md5($"frame").as("frame_md5"))
  }

  val m2Sql: String = """
    SELECT doc_id, i AS frame_idx,
      md5(substring(text, CAST(1 + i*128 AS INT), 64)) AS frame_md5
    FROM documents,
      unnest(range(0, CAST(floor((length(text)-64)/128) AS BIGINT) + 1)) AS u(i)
    WHERE length(text) >= 64"""

  /** m3: partition-parallel batch decode→feature-extract via mapPartitions
    * (the decoder is [[StubDecoder]] — see its scaladoc).
    */
  def m3(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir).as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val f = StubDecoder.features(r.blob)
        MediaFeatures(r.doc_id, f(0), f(1), f(2), f(3), f(4), f(5), f(6), f(7))
      }
    }.toDF()
  }

  val m3Sql: String = {
    val feats = (0 until 8).map { k =>
      s"(strpos('0123456789abcdef', substring(md5(text), ${k + 1}, 1)) - 1) / 15.0 AS f$k"
    }.mkString(", ")
    s"SELECT doc_id, $feats FROM documents"
  }

  /** m4: modality routing — sniff the payload (here: first byte of the
    * digest stands in for magic-byte detection) and fan each modality to
    * its own decode path; per-modality counts + size stats.
    */
  def m4(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sniff = conv(substring(md5($"blob"), 1, 2), 16, 10).cast("int") % 3
    mediaTable(s, dir)
      .withColumn("modality",
        when(sniff === 0, "image").when(sniff === 1, "audio").otherwise("video"))
      .groupBy($"modality")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(length($"blob")).cast("long").as("total_bytes"))
  }

  val m4Sql: String = """
    WITH r AS (SELECT
      CASE CAST(('0x'||substring(md5(text),1,2))::UBIGINT % 3 AS INT)
        WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
      strlen(text) AS len FROM documents)
    SELECT modality, CAST(count(*) AS BIGINT) AS n,
      CAST(sum(len) AS BIGINT) AS total_bytes
    FROM r GROUP BY modality"""

  /** m5: resize stub — nearest-neighbor strided resampling of the payload
    * to a fixed [[ResizeTo]]-sample shape (sample i reads position
    * `1 + floor(i*(len-1)/(T-1))`), then a digest of the resized payload.
    * The real pixel-interpolation kernel is what a codec library would
    * supply; the fixed-output-shape plumbing, the per-row index math and
    * the deterministic digest ARE the pipeline contract. Char-based on
    * both sides for the same reason as [[m2]].
    */
  val ResizeTo = 32
  def m5(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val samples = transform(sequence(lit(0), lit(ResizeTo - 1)), i =>
      $"text".substr(
        (lit(1) + floor((i * (length($"text") - 1)) / lit(ResizeTo - 1.0)))
          .cast("int"),
        lit(1)))
    Tables.documents(s, dir)
      .select($"doc_id", length($"text").cast("long").as("orig_len"),
        md5(array_join(samples, "")).as("resized_md5"))
  }

  val m5Sql: String = s"""
    WITH r AS (SELECT doc_id, length(text) AS orig_len,
      list_transform(range(0, $ResizeTo), i ->
        substring(text, CAST(1 + floor((i*(length(text)-1))/${ResizeTo - 1}.0) AS INT), 1)) AS ss
      FROM documents)
    SELECT doc_id, CAST(orig_len AS BIGINT) AS orig_len,
      md5(array_to_string(ss, '')) AS resized_md5
    FROM r"""

  /** m6: audio frame-energy stub — the payload's characters stand in for
    * PCM samples (codepoint = amplitude; a codec library would supply the
    * real int16 decode), grouped into [[AudioFrame]]-sample frames
    * (tail frame may be short, as in real audio), with integer energy
    * (sum of squared amplitudes, widened to long BEFORE the multiply so
    * codepoints past 46340 can't wrap 32-bit) and peak per frame. Frames
    * are cut first ([[m2]]'s substr cost shape), then each ≤32-char frame
    * aggregates its codepoints in place — per-doc cost O(len × frame),
    * not O(len²); a codec deployment would decode binary via mapInPandas
    * instead. Every statistic is integer-exact, so the gate is a full
    * hash match; char-based on both sides for the same reason as [[m2]].
    */
  val AudioFrame = 32
  def m6(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def code(j: Column): Column =
      ascii($"frame".substr(j, lit(1))).cast("long")
    val nFrames = ceil(length($"text") / lit(AudioFrame.toDouble)).cast("int")
    Tables.documents(s, dir)
      .filter(length($"text") >= 1)
      .withColumn("frames", transform(sequence(lit(0), nFrames - 1),
        i => $"text".substr(i * AudioFrame + 1, lit(AudioFrame))))
      .select($"doc_id", posexplode($"frames"))
      .toDF("doc_id", "frame_idx", "frame")
      .select($"doc_id", $"frame_idx".cast("long").as("frame_idx"),
        aggregate(sequence(lit(1), length($"frame")), lit(0L),
          (acc, j) => acc + code(j) * code(j)).as("energy"),
        aggregate(sequence(lit(1), length($"frame")), lit(0L),
          (acc, j) => greatest(acc, code(j))).as("peak"))
  }

  val m6Sql: String = s"""
    WITH c AS (
      SELECT doc_id, i,
        unicode(substring(text, CAST(i + 1 AS INT), 1)) AS code
      FROM documents, unnest(range(0, length(text))) u(i)
      WHERE length(text) >= 1)
    SELECT doc_id, CAST(floor(i / $AudioFrame) AS BIGINT) AS frame_idx,
      CAST(sum(CAST(code AS BIGINT) * code) AS BIGINT) AS energy,
      CAST(max(code) AS BIGINT) AS peak
    FROM c GROUP BY doc_id, frame_idx"""

  /** m7: paired-sample manifest — the record a webdataset-style writer
    * emits when assembling a PAIRED multimodal training set: each doc
    * that has an embedding row (doc_id = vec_id) yields one manifest
    * line with the blob's typed metadata (length, digest) and the
    * embedding norm. One broadcast-able equi-join; unpaired docs drop
    * out exactly as the assembler would drop them.
    */
  def m7(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
      .select($"vec_id".as("doc_id"), $"embedding")
    mediaTable(s, dir).join(emb, "doc_id")
      .select($"doc_id",
        length($"blob").cast("long").as("byte_len"),
        md5($"blob").as("blob_md5"),
        round(graft.functions.Vec.norm($"embedding"), 6).as("emb_norm"))
  }

  val m7Sql: String = s"""
    SELECT doc_id, CAST(strlen(text) AS BIGINT) AS byte_len,
      md5(text) AS blob_md5,
      round(${graft.functions.VecSql.norm("embedding", 64)}, 6) AS emb_norm
    FROM documents JOIN embeddings ON doc_id = vec_id"""

  val queries: Map[String, Q] = Map(
    "m1_binary_meta" -> m1, "m2_frame_sample" -> m2, "m3_feature_stub" -> m3,
    "m4_modality_router" -> m4, "m5_resize_stub" -> m5,
    "m6_audio_energy_stub" -> m6, "m7_paired_manifest" -> m7)

  val oracles: Map[String, String] = Map(
    "m1_binary_meta" -> m1Sql, "m2_frame_sample" -> m2Sql,
    "m3_feature_stub" -> m3Sql, "m4_modality_router" -> m4Sql,
    "m5_resize_stub" -> m5Sql, "m6_audio_energy_stub" -> m6Sql,
    "m7_paired_manifest" -> m7Sql)
}
