package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{FileAlreadyExistsException, Files, Paths, StandardCopyOption}
import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The custom-SINK extension rung (DataSource V2 write path) — the twin of
  * [[DocsSourceProvider]]'s read rungs, so the connector surface covers
  * BATCH_READ + MICRO_BATCH_READ + BATCH_WRITE. A tiny CSV-line writer
  * whose POINT is the commit protocol, the part a real 100 TB sink must
  * get right:
  *  - each task writes an isolated `part-<partition>-<task>.tmp` and only
  *    its task-commit RENAMES it to `.csv` (failed/speculative attempts
  *    leave `.tmp` garbage that job commit ignores);
  *  - each task's [[WriterCommitMessage]] carries (file, rows) back to the
  *    driver, and JOB commit atomically publishes a VERSIONED manifest
  *    `_manifest-v{N}` naming every committed file + the total row count —
  *    readers that trust a manifest never observe a torn write, and every
  *    committed version stays readable afterwards (time travel, the
  *    snapshot surface a lakehouse table format provides);
  *  - version numbers are claimed by hard-link creation (link(2), via
  *    `Files.createLink`) — the filesystem primitive that atomically
  *    FAILS on an existing target, i.e. a real compare-and-swap. POSIX
  *    rename silently replaces, so rename can never claim a slot (see
  *    [[GraftManifest.commit]]); a losing committer re-reads the new head
  *    and retries at N+1. Part-file names additionally carry a
  *    per-write-query tag, so append jobs from DIFFERENT applications
  *    cannot collide on (partitionId, taskId) and clobber each other's
  *    committed files;
  *  - `SaveMode.Append` merges the head version's file list into the new
  *    manifest (both batches stay visible); `SaveMode.Overwrite` (via
  *    [[SupportsTruncate]]) publishes a version naming ONLY this job's
  *    files — prior parts become invisible orphans to the head but remain
  *    on disk, addressed by the older manifests;
  *  - abort deletes the uncommitted temp files.
  *
  * READ path (BATCH_READ): `spark.read.format("graft-sink")
  * .option("path", dir)[.option("versionAsOf", n)].load()` plans one
  * InputPartition per manifest-named file — file-granular parallel scan —
  * with real column pruning (only requested cells are converted) and a
  * per-file row-count check against the manifest (a torn or tampered file
  * fails loudly, not silently short). The schema rides IN the manifest
  * (`#schema=` DDL line), so the table is self-describing: no external
  * metastore needed to read any version.
  *
  * Long/Double/String columns only — the fixture surface; anything else
  * fails loudly at write time, as do strings containing the CSV
  * delimiter/newline (no silent corruption). */
class GraftSinkProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-sink"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    // Self-describing on READ: the pinned (or head) manifest carries the
    // schema DDL. On first WRITE no manifest exists yet → empty schema
    // (the write path takes its schema from the incoming frame).
    val path = options.get("path")
    if (path == null) new StructType()
    else GraftManifest.readVersion(path, Option(options.get("versionAsOf")).map(_.toInt))
      .flatMap(_.schemaDdl).map(StructType.fromDDL).getOrElse(new StructType())
  }
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new GraftSinkTable(properties.get("path"), schema,
      Option(properties.get("versionAsOf")).map(_.toInt))
}

/** One committed manifest version: the files it names (with per-file row
  * counts), the committed total, and the schema DDL it was written with. */
case class GraftManifest(version: Int, files: Seq[(String, Long)],
    total: Long, schemaDdl: Option[String])

object GraftManifest {
  private val VPrefix = "_manifest-v"

  /** All committed version numbers at `path`, ascending. */
  def versions(path: String): Seq[Int] =
    Option(new File(path).listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.startsWith(VPrefix))
      .filterNot(_.endsWith(".tmp"))
      .flatMap(n => scala.util.Try(n.stripPrefix(VPrefix).toInt).toOption)
      .sorted.toSeq

  def parse(version: Int, body: String): GraftManifest = {
    var ddl: Option[String] = None
    val files = Seq.newBuilder[(String, Long)]
    var total = 0L
    body.split("\n").filter(_.nonEmpty).foreach {
      case s if s.startsWith("#schema=") => ddl = Some(s.stripPrefix("#schema="))
      case line => line.split(",", 2) match {
        case Array("_total", n) => total = n.toLong
        case Array(f, n)        => files += (f -> n.toLong)
        case bad => throw new IllegalStateException(
          s"malformed manifest line: '${bad.mkString(",")}'")
      }
    }
    GraftManifest(version, files.result(), total, ddl)
  }

  /** Read one version (None = head). None result = no committed version. */
  def readVersion(path: String, version: Option[Int]): Option[GraftManifest] = {
    val vs = versions(path)
    val v = version match {
      case Some(n) =>
        if (vs.contains(n)) n
        else if (vs.isEmpty) return None
        else throw new IllegalArgumentException(
          s"graft-sink: versionAsOf=$n not found at $path; committed versions: ${vs.mkString(",")}")
      case None => if (vs.isEmpty) return None else vs.max
    }
    val body = new String(
      Files.readAllBytes(Paths.get(path, s"$VPrefix$v")), StandardCharsets.UTF_8)
    Some(parse(v, body))
  }

  /** Publish `files` as the next version. The version slot is claimed with
    * `Files.createLink` (hard link) — the one filesystem primitive that
    * atomically FAILS on an existing target. Rename is NOT a CAS here:
    * POSIX rename(2) silently replaces an existing file, so an
    * ATOMIC_MOVE "claim" lets two concurrent committers overwrite each
    * other's versions — exactly the lost-update the PropertySpec CAS test
    * reproduces with 8 racing appenders (5 of 8 versions vanished under
    * the rename protocol). link(2) returns EEXIST atomically instead, so
    * losing the race surfaces as FileAlreadyExistsException; the loser
    * re-reads the new head (append must merge the WINNER's files, not a
    * stale view) and retries one slot up. Also refreshes the legacy
    * `_manifest` head copy (files + `_total` only, no schema line) for
    * readers that predate versioning — that copy is best-effort derived
    * state under concurrency (racing commits may land it out of order for
    * an instant); the version files are the durable record. */
  def commit(path: String, jobFiles: Seq[(String, Long)], schemaDdl: String,
      truncate: Boolean): Int = {
    new File(path).mkdirs() // a zero-task job commits a manifest into an empty dir
    var attempt = 0
    while (true) {
      attempt += 1
      require(attempt <= 1000, s"graft-sink: gave up claiming a manifest version at $path")
      val head = readVersion(path, None)
      head.flatMap(_.schemaDdl).foreach { prior =>
        if (!truncate && prior != schemaDdl)
          throw new IllegalArgumentException(
            s"graft-sink: append schema '$schemaDdl' != committed schema '$prior' (overwrite to change schema)")
      }
      val all = (if (truncate) Seq.empty else head.map(_.files).getOrElse(Seq.empty)) ++ jobFiles
      val next = head.map(_.version + 1).getOrElse(1)
      val body = (s"#schema=$schemaDdl" +:
        all.map { case (f, n) => s"$f,$n" } :+
        s"_total,${all.map(_._2).sum}").mkString("\n")
      val tmp = Files.createTempFile(Paths.get(path), s"$VPrefix$next", ".tmp")
      Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
      try {
        // link(2): atomic claim that FAILS if the slot is taken (rename
        // would silently replace it — see scaladoc)
        Files.createLink(Paths.get(path, s"$VPrefix$next"), tmp)
        Files.delete(tmp)
        // head pointer for pre-versioning readers; REPLACE is safe — it is
        // derived state, the version files are the durable record
        val legacy = (all.map { case (f, n) => s"$f,$n" } :+
          s"_total,${all.map(_._2).sum}").mkString("\n")
        val ltmp = Files.createTempFile(Paths.get(path), "_manifest", ".tmp")
        Files.write(ltmp, legacy.getBytes(StandardCharsets.UTF_8))
        Files.move(ltmp, Paths.get(path, "_manifest"),
          StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
        return next
      } catch {
        case _: FileAlreadyExistsException => Files.deleteIfExists(tmp); () // lost the race; retry at next+1
      }
    }
    -1 // unreachable
  }

  /** VACUUM: drop every version but the newest `retainLast`, then delete
    * the data files no retained manifest references — the storage-reclaim
    * half of the snapshot lifecycle (a table that only ever adds versions
    * keeps every superseded file forever). Deletion order is the safety
    * argument: old MANIFESTS go first, data files second, so at no moment
    * does a surviving manifest name a missing file — a reader pinned to a
    * dropped version fails loudly at the manifest lookup (listed versions
    * in the error), never with a half-readable snapshot.
    *
    * `graceMs` protects IN-FLIGHT commits: a concurrent appender's tasks
    * rename .tmp → .csv BEFORE the driver publishes the manifest naming
    * them, so a freshly task-committed file is legitimately unreferenced
    * for a moment — deleting it would let that job commit a manifest over
    * missing files. Files modified within the grace window are therefore
    * never reclaimed (the retention-window discipline every production
    * vacuum ships with); pass 0 only when the caller KNOWS no write is in
    * flight (single-writer fixtures). Batch-table dirs only: streaming
    * epoch manifests are a different lifecycle and are not consulted
    * here. Returns the number of data files deleted. */
  def vacuum(path: String, retainLast: Int,
      graceMs: Long = 10 * 60 * 1000L): Int = {
    require(retainLast >= 1, "vacuum must retain at least the head version")
    val vs = versions(path)
    val dropped = vs.dropRight(retainLast)
    val keep = vs.takeRight(retainLast)
      .flatMap(v => readVersion(path, Some(v)).toSeq.flatMap(_.files.map(_._1)))
      .toSet
    dropped.foreach(v => Files.deleteIfExists(Paths.get(path, s"$VPrefix$v")))
    val cutoff = System.currentTimeMillis() - graceMs
    val victims = Option(new File(path).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".csv") && !f.getName.startsWith("epoch-") &&
        !keep.contains(f.getName) && f.lastModified() <= cutoff)
    victims.foreach(_.delete())
    victims.length
  }
}

class GraftSinkTable(path: String, schema0: StructType, versionAsOf: Option[Int])
    extends Table with SupportsWrite with SupportsRead {
  require(path != null && path.nonEmpty, "graft-sink requires option(\"path\")")
  override def name(): String = s"graft_sink($path)"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE, TableCapability.TRUNCATE,
      TableCapability.BATCH_READ)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var truncating = false
      override def truncate(): WriteBuilder = { truncating = true; this }
      override def build(): Write = new Write {
        // per-query tag in part names: append jobs from different
        // applications can reuse (partitionId, taskId) — without the tag
        // a second app's task-commit rename silently replaces the first
        // app's committed file (POSIX rename semantics again)
        private val tag = info.queryId().replaceAll("[^0-9a-zA-Z]", "").take(8)
        override def toBatch: BatchWrite =
          new GraftSinkBatchWrite(path, info.schema(), truncating, tag)
        override def toStreaming: StreamingWrite =
          new GraftSinkStreamingWrite(path, info.schema(), tag)
      }
    }
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val pinned = Option(options.get("versionAsOf")).map(_.toInt).orElse(versionAsOf)
    // LAYOUT schema = the column order the files were WRITTEN in (from the
    // pinned manifest). Cell positions must resolve against it, never
    // against a user-supplied read schema: `.schema("b BIGINT, a BIGINT")`
    // over a table written (a, b) would otherwise silently swap two
    // same-typed columns. A user schema is validated field-by-field
    // against the layout (name must exist, type must match) and only
    // narrows/reorders what is VISIBLE.
    val manifestSchema = GraftManifest.readVersion(path, pinned)
      .flatMap(_.schemaDdl).map(StructType.fromDDL)
    val layout = manifestSchema.orElse(Some(schema0).filter(_.nonEmpty))
      .getOrElse(throw new IllegalArgumentException(
        s"graft-sink: no committed manifest to read at $path"))
    val visible = if (schema0.nonEmpty) schema0 else layout
    manifestSchema.foreach { l =>
      visible.fields.foreach { f =>
        val i = scala.util.Try(l.fieldIndex(f.name)).getOrElse(
          throw new IllegalArgumentException(
            s"graft-sink: column '${f.name}' not in committed schema ${l.toDDL}"))
        if (l.fields(i).dataType != f.dataType)
          throw new IllegalArgumentException(
            s"graft-sink: column '${f.name}' read as ${f.dataType} but committed as ${l.fields(i).dataType}")
      }
    }
    new GraftSinkScanBuilder(path, pinned, layout, visible)
  }
}

class GraftSinkScanBuilder(path: String, version: Option[Int],
    layout: StructType, visible: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = visible
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = GraftSinkScan(path, version, layout, required)
}

case class GraftSinkScan(path: String, version: Option[Int],
    full: StructType, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = {
    val v = version.map(_.toString).getOrElse("head")
    s"graft-sink $path v=$v cols=${required.fieldNames.mkString(",")}"
  }
  /** One partition per manifest-named file: the manifest IS the split
    * plan, so the scan parallelism equals the committed file count (at
    * scale: the writing job's task count) with zero listing cost. */
  override def planInputPartitions(): Array[InputPartition] = {
    val m = GraftManifest.readVersion(path, version).getOrElse(
      throw new IllegalArgumentException(
        s"graft-sink: no committed manifest to read at $path"))
    m.files.map { case (f, n) =>
      GraftSinkFileSplit(s"$path/$f", n): InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftSinkReaderFactory(full, required)
}

case class GraftSinkFileSplit(file: String, expectedRows: Long) extends InputPartition

class GraftSinkReaderFactory(full: StructType, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val split = p.asInstanceOf[GraftSinkFileSplit]
    // map each required column to its cell position in the written line
    val idx = required.fields.map(f => full.fieldIndex(f.name))
    val types = required.fields.map(_.dataType)
    new PartitionReader[InternalRow] {
      private val in = Files.newBufferedReader(
        Paths.get(split.file), StandardCharsets.UTF_8)
      private var line: String = _
      private var rows = 0L
      override def next(): Boolean = {
        line = in.readLine()
        if (line == null) {
          // manifest row count is the integrity record: a truncated file
          // (torn copy, partial restore) fails the scan instead of
          // silently under-reporting
          if (rows != split.expectedRows) throw new IllegalStateException(
            s"graft-sink: ${split.file} has $rows rows, manifest committed ${split.expectedRows}")
          false
        } else { rows += 1; true }
      }
      override def get(): InternalRow = {
        val cells = line.split(",", -1)
        val values = new Array[Any](idx.length)
        var i = 0
        while (i < idx.length) {
          values(i) = types(i) match {
            case LongType   => cells(idx(i)).toLong
            case DoubleType => cells(idx(i)).toDouble
            case StringType => UTF8String.fromString(cells(idx(i)))
            case dt => throw new IllegalArgumentException(
              s"graft-sink read supports long/double/string, got $dt")
          }
          i += 1
        }
        InternalRow.fromSeq(values.toIndexedSeq)
      }
      override def close(): Unit = in.close()
    }
  }
}

case class GraftSinkCommit(file: String, rows: Long) extends WriterCommitMessage

class GraftSinkBatchWrite(path: String, schema: StructType, truncate: Boolean,
    tag: String) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new GraftSinkWriterFactory(path, schema, tag)

  /** Job commit: the atomic point. Only files named by task commits enter
    * the manifest; half-written .tmp files are invisible to readers. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val ms = messages.map(_.asInstanceOf[GraftSinkCommit])
    GraftManifest.commit(path,
      ms.map(m => new File(m.file).getName -> m.rows).toSeq,
      schema.toDDL, truncate)
    ()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    Option(new File(path).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".tmp")).foreach(_.delete())
}

class GraftSinkWriterFactory(path: String, schema: StructType, tag: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftSinkWriter(path, schema, partitionId, taskId, prefix = s"$tag-")
}

/** Named (serializable) streaming factory — an anonymous class here would
  * drag the non-serializable StreamingWrite along as its outer pointer. */
case class GraftSinkStreamingFactory(path: String, schema: StructType,
    tag: String) extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new GraftSinkWriter(path, schema, partitionId, taskId,
      prefix = s"epoch-$epochId-$tag-")
}

/** The STREAMING half of the sink: identical task-commit protocol, but job
  * commit is PER EPOCH — `_manifest_epoch_<n>` lands atomically once every
  * task of micro-batch n has renamed its part file. If an epoch is
  * re-delivered after a failure, its manifest is atomically REPLACED with
  * the new attempt's file set; parts from the failed attempt become
  * orphans that manifest-trusting readers never see. That idempotent
  * commit is what composes with checkpointed source offsets into
  * end-to-end exactly-once. */
class GraftSinkStreamingWrite(path: String, schema: StructType, tag: String)
    extends StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    GraftSinkStreamingFactory(path, schema, tag)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val ms = messages.map(_.asInstanceOf[GraftSinkCommit])
    val body = (ms.map(m => s"${new File(m.file).getName},${m.rows}") :+
      s"_total,${ms.map(_.rows).sum}").mkString("\n")
    val tmp = Paths.get(path, s"_manifest_epoch_$epochId.tmp")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(path, s"_manifest_epoch_$epochId"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    ()
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
        case StringType =>
          val s = row.getUTF8String(i).toString
          // the read path splits on the delimiter — an embedded comma or
          // newline would silently shift every later cell; refuse it here
          if (s.indexOf(',') >= 0 || s.indexOf('\n') >= 0)
            throw new IllegalArgumentException(
              s"graft-sink cannot encode delimiter/newline in '${f.name}' value '$s'")
          s
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
