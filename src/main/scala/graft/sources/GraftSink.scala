package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The custom-SINK extension rung (DataSource V2 write path) — the twin of
  * [[DocsSourceProvider]]'s read rungs, so the connector surface covers
  * BATCH_READ + MICRO_BATCH_READ + BATCH_WRITE. A tiny CSV-line writer
  * whose POINT is the commit protocol, the part a real 100 TB sink must
  * get right:
  *  - each task writes an isolated `part-<partition>-<task>.tmp` and only
  *    its task-commit RENAMES it to `.csv` (failed/speculative attempts
  *    leave `.tmp` garbage that job commit ignores);
  *  - each task's [[WriterCommitMessage]] carries (file, rows) back to the
  *    driver, and JOB commit atomically writes a `_manifest` naming every
  *    committed file + the total row count — readers that trust the
  *    manifest never observe a torn write (the _SUCCESS/manifest pattern
  *    every cloud-storage committer implements);
  *  - abort deletes the uncommitted temp files.
  * Long/Double/String columns only — the fixture surface; anything else
  * fails loudly at write time. */
class GraftSinkProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-sink"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType() // write-only: schema comes from the incoming frame
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new GraftSinkTable(properties.get("path"), schema)
}

class GraftSinkTable(path: String, schema0: StructType)
    extends Table with SupportsWrite {
  require(path != null && path.nonEmpty, "graft-sink requires option(\"path\")")
  override def name(): String = s"graft_sink($path)"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new GraftSinkBatchWrite(path, info.schema())
        override def toStreaming: StreamingWrite =
          new GraftSinkStreamingWrite(path, info.schema())
      }
    }
}

case class GraftSinkCommit(file: String, rows: Long) extends WriterCommitMessage

class GraftSinkBatchWrite(path: String, schema: StructType) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new GraftSinkWriterFactory(path, schema)

  /** Job commit: the atomic point. Only files named by task commits enter
    * the manifest; half-written .tmp files are invisible to readers. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val ms = messages.map(_.asInstanceOf[GraftSinkCommit])
    val body = (ms.map(m => s"${new File(m.file).getName},${m.rows}") :+
      s"_total,${ms.map(_.rows).sum}").mkString("\n")
    val tmp = Paths.get(path, "_manifest.tmp")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(path, "_manifest"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    Option(new File(path).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".tmp")).foreach(_.delete())
}

class GraftSinkWriterFactory(path: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftSinkWriter(path, schema, partitionId, taskId)
}

/** Named (serializable) streaming factory — an anonymous class here would
  * drag the non-serializable StreamingWrite along as its outer pointer. */
case class GraftSinkStreamingFactory(path: String, schema: StructType)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new GraftSinkWriter(path, schema, partitionId, taskId,
      prefix = s"epoch-$epochId-")
}

/** The STREAMING half of the sink: identical task-commit protocol, but job
  * commit is PER EPOCH — `_manifest_epoch_<n>` lands atomically once every
  * task of micro-batch n has renamed its part file. If an epoch is
  * re-delivered after a failure, its manifest is atomically REPLACED with
  * the new attempt's file set; parts from the failed attempt become
  * orphans that manifest-trusting readers never see. That idempotent
  * commit is what composes with checkpointed source offsets into
  * end-to-end exactly-once. */
class GraftSinkStreamingWrite(path: String, schema: StructType)
    extends StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    GraftSinkStreamingFactory(path, schema)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val ms = messages.map(_.asInstanceOf[GraftSinkCommit])
    val body = (ms.map(m => s"${new File(m.file).getName},${m.rows}") :+
      s"_total,${ms.map(_.rows).sum}").mkString("\n")
    val tmp = Paths.get(path, s"_manifest_epoch_$epochId.tmp")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(path, s"_manifest_epoch_$epochId"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    Option(new File(path).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".tmp")).foreach(_.delete())
}

class GraftSinkWriter(path: String, schema: StructType, partitionId: Int,
    taskId: Long, prefix: String = "") extends DataWriter[InternalRow] {
  new File(path).mkdirs()
  private val tmp = new File(path, f"${prefix}part-$partitionId%05d-$taskId.tmp")
  // Files.newBufferedWriter, NOT PrintWriter: PrintWriter swallows
  // IOExceptions, so a short write (disk full) would still let commit()
  // rename a truncated file and report the full row count in its
  // WriterCommitMessage — the manifest would lie. Here a failed write
  // throws, the task aborts, and the commit protocol holds.
  private val out = Files.newBufferedWriter(tmp.toPath, StandardCharsets.UTF_8)
  private var rows = 0L

  override def write(row: InternalRow): Unit = {
    val cells = schema.fields.zipWithIndex.map { case (f, i) =>
      f.dataType match {
        case LongType   => row.getLong(i).toString
        case DoubleType => row.getDouble(i).toString
        case StringType => row.getUTF8String(i).toString
        case dt => throw new IllegalArgumentException(
          s"graft-sink supports long/double/string, got $dt for ${f.name}")
      }
    }
    out.write(cells.mkString(","))
    out.write("\n")
    rows += 1
  }

  /** Task commit: rename .tmp → .csv; the message names the final file. */
  override def commit(): WriterCommitMessage = {
    out.close()
    val fin = new File(path, tmp.getName.stripSuffix(".tmp") + ".csv")
    Files.move(tmp.toPath, fin.toPath, StandardCopyOption.ATOMIC_MOVE)
    GraftSinkCommit(fin.getAbsolutePath, rows)
  }

  override def abort(): Unit = {
    try out.close() catch { case _: java.io.IOException => () } // best-effort
    tmp.delete(); ()
  }
  override def close(): Unit = ()
}
