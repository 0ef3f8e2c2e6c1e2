package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HadoopPath}
import org.apache.hadoop.mapreduce.TaskAttemptID
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.parquet.hadoop.ParquetInputFormat
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.execution.datasources.parquet.{ParquetReadSupport, VectorizedParquetRecordReader}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}
import org.apache.spark.unsafe.types.UTF8String

/** VECTORIZED (columnar) decode for the graft connector's parquet scan —
  * VERDICT r11 next-round #1.
  *
  * The row path materializes every surviving record through parquet-mr's
  * boxed `Group` API: one object tree per row, one virtual dispatch per
  * cell — a 3-5× constant factor on the dominant cost of a full scan at
  * 100 TB. This reader replaces that with Spark's OWN vectorized parquet
  * decoder ([[VectorizedParquetRecordReader]], the same class behind
  * `spark.read.parquet`): column chunks decode straight into on-heap
  * `ColumnarBatch` vectors, Spark's whole-stage codegen consumes the
  * batches without per-row materialization, and the scan node reports
  * `Batched: true`.
  *
  * ELIGIBILITY is decided PER SCAN at planning time (Spark refuses mixed
  * row/columnar partitions in one scan) and stamped on every split:
  *  - every planned file is parquet;
  *  - no file carries a deletion vector, applicable equality-delete
  *    entries, or a CDF eqSel selection (row-identity/value-skip logic
  *    lives in the row reader — the same gate row-group filter pushdown
  *    uses, for the same reason);
  *  - `_pos` is not requested (physical positions are per-row facts the
  *    batch path does not thread);
  *  - at least one physical column is requested somewhere (the
  *    zero-column count(*) path answers from footers without opening a
  *    single row group — strictly better than any batch decode).
  * Everything else — `_file`/`_change_type` virtuals, trailing-evolution
  * columns beyond a file's width, renamed columns (#ids positional
  * identity), nested struct/map/array columns, pushed row-group filters —
  * rides the columnar path.
  *
  * Row-group/page skipping is preserved: the pushed v1 filters translate
  * through the SAME [[GraftParquet.filterPredicate]] the row path uses
  * and land on the Hadoop conf ([[ParquetInputFormat.FILTER_PREDICATE]]),
  * where parquet-mr's reader drops refuted row groups before a byte is
  * decompressed. (Record-level filtering does not apply to vectorized
  * reads; Spark re-applies every filter residually, so survivors cost
  * CPU, never correctness.)
  *
  * Column identity stays POSITIONAL: the requested Catalyst schema is
  * built from the file's OWN footer names at the layout positions the
  * query asked for, so pre-rename files decode under their original
  * names and the batch, whose vectors come back in requested order, is
  * remapped to the scan's output slot order with a zero-copy permutation
  * wrapper. Virtual and beyond-width columns append as CONSTANT vectors
  * through `initBatch`'s partition-column mechanism. */
object GraftColumnar {

  /** Scan-level eligibility (see class doc). `metas` are the planned
    * files with their per-tag eqdel/eqSel path lists already resolved. */
  def eligible(required: StructType,
      files: Seq[(String, Option[String], Seq[(String, String)], Seq[(String, String)])])
      : Boolean =
    files.nonEmpty &&
      !required.fieldNames.contains(GraftSinkScan.PosCol) &&
      required.fieldNames.exists(n => !GraftSinkScan.Reserved.contains(n)) &&
      files.forall { case (name, dv, eq, sel) =>
        name.endsWith(".parquet") && dv.isEmpty && eq.isEmpty && sel.isEmpty
      }

  /** One columnar partition reader (factory gate already proved the
    * split eligible — parquet, no DV/eqdel/eqSel, no `_pos`). */
  def reader(split: GraftSplit, full: StructType, required: StructType,
      pushed: Seq[org.apache.spark.sql.sources.Filter])
      : PartitionReader[ColumnarBatch] = {
    val idx: Array[Int] = required.fields.map(_.name match {
      case GraftSinkScan.ChangeCol => -1
      case GraftSinkScan.FileCol   => -2
      case n                       => full.fieldIndex(n)
    })
    val types = required.fields.map(_.dataType)
    val fileName = split.file.substring(split.file.lastIndexOf('/') + 1)
    val fileMt = GraftParquet.fileSchema(split.file)
    if (fileMt.getFieldCount != split.ncols) throw new IllegalStateException(
      s"graft-sink: ${split.file} has ${fileMt.getFieldCount} columns, " +
        s"manifest committed ${split.ncols}")
    // required slots that physically live in THIS file (evolution rule:
    // a file's columns are the first ncols of the layout)
    val physSlots: Array[Int] = idx.zipWithIndex
      .collect { case (li, i) if li >= 0 && li < split.ncols => i }
    // virtual + beyond-width slots become constant vectors
    val constSlots: Array[Int] = idx.zipWithIndex
      .collect { case (li, i) if li < 0 || li >= split.ncols => i }
    // requested schema: FILE footer names (positional identity under
    // #ids column mapping), layout types, required order
    val reqStruct = StructType(physSlots.map(i =>
      StructField(fileMt.getFields.get(idx(i)).getName, types(i), nullable = true)))
    val constStruct = StructType(constSlots.map(i =>
      StructField(required.fields(i).name, types(i), nullable = true)))
    val constRow = InternalRow.fromSeq(constSlots.toSeq.map(i => idx(i) match {
      case -1 => UTF8String.fromString(split.change)
      case -2 => UTF8String.fromString(fileName)
      case _  => null // trailing-evolution column: reads NULL here
    }))
    // output slot i → batch column position
    val perm: Array[Int] = idx.indices.map { i =>
      val p = physSlots.indexOf(i)
      if (p >= 0) p else physSlots.length + constSlots.indexOf(i)
    }.toArray

    // the SAME translated predicate the row path pushes: row groups and
    // pages whose stats/dictionary/bloom refute it never decompress
    // projected = layout positions INSIDE this file's width only: a
    // pre-evolution file lacks trailing fields, and binding a filter
    // column beyond its footer would index out of bounds (those files'
    // conjuncts are exactly the ones file-level skipping already judged)
    val rgFilter =
      if (pushed.isEmpty) None
      else GraftParquet.filterPredicate(fileMt, full,
        idx.toSet.filter(li => li >= 0 && li < split.ncols), pushed)
    val vr = open(split.file, reqStruct, rgFilter, constStruct, constRow,
      range = if (split.rangeStart >= 0)
        Some((split.rangeStart, split.rangeEnd)) else None)
    vr.enableReturningBatches()

    new PartitionReader[ColumnarBatch] {
      private var rows = 0L
      private var done = false
      override def next(): Boolean = {
        if (done) return false
        val has = vr.nextBatch()
        if (has) {
          val n = vr.resultBatch().numRows()
          rows += n
          GraftReadStats.parquetRecordsDecoded.add(n.toLong)
        } else {
          done = true
          // unfiltered reads keep the manifest-row-count integrity check
          // (a pruned read cannot count the file — same rule as the row
          // path)
          if (rgFilter.isEmpty && rows != split.expectedRows)
            throw new IllegalStateException(
              s"graft-sink: ${split.file} has $rows rows, manifest " +
                s"committed ${split.expectedRows}")
        }
        has
      }
      override def get(): ColumnarBatch = {
        val b = vr.resultBatch()
        val out = new ColumnarBatch(perm.map(b.column(_): ColumnVector))
        out.setNumRows(b.numRows())
        out
      }
      override def close(): Unit = vr.close()
    }
  }

  /** Build the Hadoop conf + initialized reader both decode modes share.
    * Closes the reader on a failed init. */
  private def open(file: String, reqStruct: StructType,
      rgFilter: Option[org.apache.parquet.filter2.predicate.FilterPredicate],
      constStruct: StructType, constRow: InternalRow,
      range: Option[(Long, Long)] = None)
      : VectorizedParquetRecordReader = {
    val conf = new Configuration(false)
    conf.set("fs.file.impl", classOf[org.apache.hadoop.fs.RawLocalFileSystem].getName)
    conf.set(ParquetInputFormat.READ_SUPPORT_CLASS,
      classOf[ParquetReadSupport].getName)
    conf.set(ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA, reqStruct.json)
    conf.setBoolean(SQLConf.CASE_SENSITIVE.key, true)
    conf.setBoolean(SQLConf.PARQUET_BINARY_AS_STRING.key, false)
    conf.setBoolean(SQLConf.PARQUET_INT96_AS_TIMESTAMP.key, true)
    conf.setBoolean(SQLConf.LEGACY_PARQUET_NANOS_AS_LONG.key, false)
    conf.setBoolean(SQLConf.PARQUET_FIELD_ID_READ_ENABLED.key, false)
    conf.setBoolean(SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED.key, true)
    conf.set(SQLConf.SESSION_LOCAL_TIMEZONE.key, "UTC")
    rgFilter.foreach(p => ParquetInputFormat.setFilterPredicate(conf, p))
    // a RANGED split reads only the row groups whose midpoint falls in
    // [start, start+len) — the standard parquet split-assignment rule
    // (`#rgcen` ANN routing, round 15)
    val fileLen = java.nio.file.Files.size(java.nio.file.Paths.get(file))
    val (start, len) = range match {
      case Some((s, e)) => (s, e - s)
      case None         => (0L, fileLen)
    }
    val vr = new VectorizedParquetRecordReader(
      null, "CORRECTED", "UTC", "CORRECTED", "UTC",
      /*useOffHeap=*/ false, /*capacity=*/ 4096)
    var initialized = false
    try {
      // mapred.FileSplit, not mapreduce.lib.input.FileSplit: Spark's
      // reader base downcasts to the old-API class (which extends the
      // new one) to reach getLocationInfo
      vr.initialize(
        new org.apache.hadoop.mapred.FileSplit(
          new HadoopPath("file:" + file), start, len, Array.empty[String]),
        new TaskAttemptContextImpl(conf, new TaskAttemptID()))
      vr.initBatch(constStruct, constRow)
      initialized = true
    } finally if (!initialized) vr.close()
    vr
  }

  /** VECTORIZED ROW-MODE decode: the same batch decoder serving its rows
    * one at a time (`nextKeyValue`/`getCurrentValue` without
    * `enableReturningBatches` — each row is a cursor view over the
    * current batch, valid until the next `read()`, which is exactly the
    * [[PartitionReader]] contract). This is the ROW-IDENTITY path's fast
    * decode: splits that must emit rows (a deletion vector to skip by
    * physical position, a requested `_pos`, or scan-uniform row fallback
    * forced by a sibling split) still decode their column chunks
    * vectorized — the per-row boxed `Group` tree is retired to the
    * `spark.graft.columnar.enabled=false` escape hatch (and CSV). Rows
    * come back in FILE ORDER whenever `rgFilter` is None — and the
    * DV/`_pos` gate in the caller forbids pushing a filter precisely
    * when positions matter — so the physical-position counter the
    * row-identity logic keys on stays exact. */
  final class VectorRows(file: String, reqStruct: StructType,
      rgFilter: Option[org.apache.parquet.filter2.predicate.FilterPredicate],
      range: Option[(Long, Long)] = None) {
    private val vr =
      open(file, reqStruct, rgFilter, new StructType(), InternalRow.empty, range)
    /** Next surviving physical row, or null at end-of-file. */
    def read(): InternalRow =
      if (vr.nextKeyValue()) vr.getCurrentValue.asInstanceOf[InternalRow]
      else null
    def close(): Unit = vr.close()
  }
}
