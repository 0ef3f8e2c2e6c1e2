package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** Multimodal-column plumbing ([R2] north star): treat media as opaque
  * binary payloads with typed metadata. The container has no image/audio
  * codecs, so the decode step is a clearly-marked deterministic fake — but
  * the Spark-side plumbing is real and tested: binary encode, per-payload
  * metadata extraction, frame-style sampling via a generator, and a typed
  * `mapPartitions` pass (the Scala analogue of a batched Python UDF: one
  * iterator per partition, the shape a real codec bridge would use).
  */
object Multimodal {

  /** Binary payload + metadata: byte length, content hash, head bytes. */
  def mmBinaryMeta(spark: SparkSession, sf: String): DataFrame =
    documents(spark, sf)
      .select(col("doc_id"),
        octet_length(col("text")).as("byte_len"),
        md5(col("text")).as("content_md5"),
        upper(hex(encode(substring(col("text"), 1, 8), "UTF-8"))).as("head_hex"),
        lit("txt").as("fake_fmt"), // STUB: no codecs in container; fixed format tag
        ascii(substring(col("text"), 1, 1)).as("first_cp"))
      .orderBy(col("doc_id"))

  /** Frame-style sampling: every 10th token is a "frame"; the frame feature
    * is a deterministic fake (md5 prefix) standing in for a decoder. */
  def mmFrameSample(spark: SparkSession, sf: String): DataFrame =
    documents(spark, sf)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .where(col("pos") % 10 === 0)
      .select(col("doc_id"), expr("pos div 10").as("frame_no"),
        col("col").as("token"),
        substring(md5(col("col")), 1, 8).as("feature"))
      .orderBy(col("doc_id"), col("frame_no"))

  case class DocMeta(doc_id: Long, n_chars: Long, n_words: Int)
  case class FakeMedia(doc_id: Long, width: Int, height: Int, frames: Int)

  /** Typed mapPartitions decode stub: the per-partition iterator shape a
    * real (native/batched) decoder bridge would use at scale — one codec
    * init per partition, streaming rows through it. Dimensions are a
    * deterministic fake of header parsing. */
  def mmDecodePartitions(spark: SparkSession, sf: String): DataFrame = {
    import spark.implicits._
    documents(spark, sf)
      .select(col("doc_id"), col("n_chars"),
        size(split(col("text"), " ")).as("n_words"))
      .as[DocMeta]
      .mapPartitions { it =>
        // STUB decode: a real implementation opens a codec here, once per
        // partition, and streams payloads through it.
        it.map(d => FakeMedia(d.doc_id,
          (1 + d.n_chars % 640).toInt,
          (1 + (d.n_chars * 7) % 480).toInt,
          1 + d.n_words % 32))
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_binary_meta" -> mmBinaryMeta,
    "mm_frame_sample" -> mmFrameSample,
    "mm_decode_partitions" -> mmDecodePartitions
  )

  def oracle: Map[String, String] = Map(
    "mm_binary_meta" ->
      """SELECT doc_id,
        |  CAST(strlen(text) AS INT) AS byte_len,
        |  md5(text) AS content_md5,
        |  upper(hex(substring(text, 1, 8))) AS head_hex,
        |  'txt' AS fake_fmt,
        |  CAST(ascii(substring(text, 1, 1)) AS INT) AS first_cp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "mm_frame_sample" ->
      """SELECT doc_id, CAST(pos // 10 AS BIGINT) AS frame_no, token,
        |  substring(md5(token), 1, 8) AS feature
        |FROM (
        |  SELECT doc_id, CAST(generate_subscripts(ws, 1) - 1 AS INT) AS pos,
        |         unnest(ws) AS token
        |  FROM (SELECT doc_id, str_split(text, ' ') AS ws FROM documents))
        |WHERE pos % 10 = 0
        |ORDER BY doc_id, frame_no""".stripMargin,

    "mm_decode_partitions" ->
      """SELECT doc_id,
        |  CAST(1 + n_chars % 640 AS INT) AS width,
        |  CAST(1 + (n_chars * 7) % 480 AS INT) AS height,
        |  CAST(1 + CAST(len(str_split(text, ' ')) AS INT) % 32 AS INT) AS frames
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
