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

  // public: Janino-generated (de)serializers cannot access private classes
  case class DocBin(doc_id: Long, payload: Array[Byte])
  case class Media(doc_id: Long, byte_len: Int, width: Int, height: Int, frames: Int)

  /** Typed mapPartitions decode over a REAL `binary` column: the payload is
    * the document's UTF-8 bytes (the fixtures ship no media files, so text
    * bytes stand in for an image body — but everything downstream of the
    * projection touches only `Array[Byte]`). The iterator shape is the
    * per-partition codec bridge a real decoder uses at scale — one codec
    * init per partition, rows streamed through it. "Header parsing" reads
    * the first 4 payload bytes as a big-endian int (ASCII ⇒ non-negative)
    * and "frame probing" counts 0x20 delimiter bytes — byte-driven stand-ins
    * for width/height/frame-count fields, each DuckDB-expressible so the
    * key keeps a full oracle. */
  def mmDecodePartitions(spark: SparkSession, sf: String): DataFrame = {
    import spark.implicits._
    documents(spark, sf)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[DocBin]
      .mapPartitions { it =>
        // a real implementation opens its codec HERE, once per partition
        it.map { d =>
          val b = d.payload
          // a payload shorter than the 4-byte header reads missing bytes
          // as 0 — exactly the oracle's ascii('') = 0 for an
          // out-of-range substring (round-16b review: b(i) crashed)
          def at(i: Int): Int = if (i < b.length) b(i) & 0xff else 0
          val hdr = (at(0) << 24) | (at(1) << 16) | (at(2) << 8) | at(3)
          val delims = b.count(_ == ' '.toByte)
          Media(d.doc_id, b.length,
            1 + b.length % 640, 1 + hdr % 480, 1 + (delims + 1) % 32)
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** BINARY-FILE INGESTION through Spark's `binaryFile` source — the
    * entry point of every multimodal pipeline (media lands as files; the
    * engine scans them as (path, length, content) rows). The blob fixtures
    * are derived deterministically FROM the documents table (per-lang
    * newline-joined corpora — fixture setup, not the operator), so the
    * DuckDB oracle recomputes every byte length and content hash from the
    * same table at any sf: the connector's read of raw bytes is what is
    * actually under test. ASCII fixtures ⇒ DuckDB char length == byte
    * length and md5(VARCHAR) == md5 of the raw bytes.
    *
    * The fixture build is DISTRIBUTED, never a driver materialization:
    * rows hash-shuffle on `lang` (each language lands wholly in one task),
    * sort within partitions on (lang, doc_id), and each task STREAMS its
    * contiguous language runs to one file apiece — O(1) task memory at any
    * corpus size. Lang count caps writer parallelism, which is the per-lang
    * single-file contract itself, not a plan artifact. Executors address
    * the shared scratch path directly (local[n] here; a cluster points the
    * same writer at a shared store via its mount/FS client). Scratch.once
    * makes the build idempotent per (JVM, sf): re-invocations skip
    * straight to the read — the content is a pure function of the table. */
  def mmBinaryIngest(spark: SparkSession, sf: String): DataFrame = {
    val base = graft.util.Scratch.dir("binfiles", sf)
    val dir = graft.util.Scratch.once(base) {
      documents(spark, sf)
        .select(col("lang"), col("doc_id"), encode(col("text"), "UTF-8").as("bytes"))
        .repartition(col("lang"))
        .sortWithinPartitions(col("lang"), col("doc_id"))
        .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
          // Task-commit protocol (the graft-sink discipline): each attempt
          // streams into dot-hidden attempt-unique .tmp files and only a
          // COMPLETED attempt atomically renames them into place, so a
          // speculative or retried attempt can never interleave with (or
          // truncate under) the original — the rename is idempotent
          // because both attempts produce identical bytes.
          val attempt = Option(org.apache.spark.TaskContext.get())
            .map(_.taskAttemptId()).getOrElse(0L)
          def tmpOf(lang: String) =
            java.nio.file.Paths.get(base, s".$lang.txt.$attempt.tmp")
          var cur: String = null
          var out: java.io.OutputStream = null
          val finished = scala.collection.mutable.ArrayBuffer.empty[String]
          try {
            it.foreach { r =>
              val lang = r.getString(0)
              if (lang != cur) { // next language run in this task's sort order
                if (out != null) { out.close(); finished += cur }
                cur = lang
                out = java.nio.file.Files.newOutputStream(tmpOf(lang))
              } else out.write('\n')
              out.write(r.getAs[Array[Byte]]("bytes"))
            }
            if (out != null) { out.close(); out = null; finished += cur }
            finished.foreach { lang =>
              java.nio.file.Files.move(tmpOf(lang),
                java.nio.file.Paths.get(base, s"$lang.txt"),
                java.nio.file.StandardCopyOption.ATOMIC_MOVE,
                java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            }
          } finally if (out != null) out.close() // failed attempt: .tmp orphan only
        }
    }
    spark.read.format("binaryFile").load(s"$dir/*.txt")
      .select(regexp_extract(col("path"), "[^/]+$", 0).as("file"),
        col("length"), md5(col("content")).as("content_md5"))
      .orderBy(col("file"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_binary_meta" -> mmBinaryMeta,
    "mm_frame_sample" -> mmFrameSample,
    "mm_decode_partitions" -> mmDecodePartitions,
    "mm_binary_ingest" -> mmBinaryIngest
  )

  def oracle: Map[String, String] = Map(
    "mm_binary_ingest" ->
      """SELECT lang || '.txt' AS file,
        |  CAST(length(body) AS BIGINT) AS length,
        |  md5(body) AS content_md5
        |FROM (SELECT lang, string_agg(text, chr(10) ORDER BY doc_id) AS body
        |      FROM documents GROUP BY lang)
        |ORDER BY file""".stripMargin,

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
        |  CAST(strlen(text) AS INT) AS byte_len,
        |  CAST(1 + strlen(text) % 640 AS INT) AS width,
        |  CAST(1 + (ascii(substring(text,1,1)) * 16777216
        |          + ascii(substring(text,2,1)) * 65536
        |          + ascii(substring(text,3,1)) * 256
        |          + ascii(substring(text,4,1))) % 480 AS INT) AS height,
        |  CAST(1 + CAST(len(str_split(text, ' ')) AS INT) % 32 AS INT) AS frames
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
