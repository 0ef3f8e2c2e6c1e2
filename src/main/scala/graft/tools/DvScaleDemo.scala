package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** MERGE-ON-READ (deletion-vector) scale measurement for the round-9 SQL
  * DML surface — the numbers that justify the design at 100 TB:
  *
  *  - POINT DELETE: a 10-row SQL DELETE against an N-file table commits
  *    O(deleted rows) sidecar bytes and rewrites ZERO data files
  *    (copy-on-write pays a full rewrite of every touched file for the
  *    same intent);
  *  - WIDE DELETE: a predicate hitting every file — still O(deleted
  *    rows) bytes (one merged sidecar per file), the regime where
  *    copy-on-write pays O(table);
  *  - READ TAX: head scan latency with vectors standing vs after
  *    `CALL optimize` materializes them — the merge-on-read debt and its
  *    scheduled repayment;
  *  - METADATA-ONLY DELETE: a partition-aligned predicate drops whole
  *    files from the manifest with zero data bytes read or written.
  *
  * Usage: runMain graft.tools.DvScaleDemo [nFiles] [rowsPerFile]
  * Prints one JSON line per phase; numbers recorded in DECISIONS.md. */
object DvScaleDemo {
  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(64)
    val rowsPer = args.lift(1).map(_.toLong).getOrElse(50000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = graft.util.Scratch.dir("dvscale", s"f$nFiles")
    spark.conf.set("spark.sql.catalog.gdvs",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdvs.root", root)
    val dir = s"$root/db/t"
    val n = nFiles * rowsPer

    def dirBytes(): Long =
      Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
        .map(_.length).sum
    def dataFiles(): Set[String] =
      graft.sources.GraftManifest.readVersion(dir, None).get.metas.map(_.name).toSet
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def j(phase: String, kv: (String, Any)*): Unit =
      println(s"""{"demo":"dv_scale","phase":"$phase",""" +
        kv.map { case (k, v) => s""""$k":$v""" }.mkString(",") + "}")

    // build: nFiles files x rowsPer rows
    val (_, tBuild) = timed {
      spark.range(n)
        .select(col("id"), (col("id") % 7).as("k"), (col("id") % nFiles).as("p"))
        .repartition(nFiles, col("p"))
        .write.format("graft-sink").option("path", dir).mode("overwrite").save()
    }
    val bytesTable = dirBytes()
    j("build", "files" -> dataFiles().size, "rows" -> n, "bytes" -> bytesTable,
      "sec" -> f"$tBuild%.2f")

    // point delete: 10 rows scattered across 10 files
    val before1 = dirBytes(); val files1 = dataFiles()
    // stride coprime to nFiles so the 10 rows scatter across 10 files
    val (_, tPoint) = timed {
      spark.sql(s"DELETE FROM gdvs.db.t WHERE id % ${n / 10 + 1} = 7") }
    val head2 = graft.sources.GraftManifest.readVersion(dir, None).get
    require(dataFiles() == files1, "point delete must rewrite no data file")
    val dv2 = head2.metas.flatMap(_.dv)
    j("point_delete_10_rows", "sec" -> f"$tPoint%.2f",
      "bytes_added" -> (dirBytes() - before1),
      "sidecars" -> dv2.size, "positions" -> dv2.map(_._2).sum)

    // wide delete: 1/7 of every file
    val before2 = dirBytes()
    val (_, tWide) = timed { spark.sql("DELETE FROM gdvs.db.t WHERE k = 3") }
    val head3 = graft.sources.GraftManifest.readVersion(dir, None).get
    require(dataFiles() == files1, "wide merge-on-read delete must rewrite no data file")
    val deleted = head3.metas.flatMap(_.dv).map(_._2).sum
    j("wide_delete_1_of_7", "sec" -> f"$tWide%.2f",
      "bytes_added" -> (dirBytes() - before2), "positions" -> deleted,
      "bytes_per_row" -> f"${(dirBytes() - before2).toDouble / deleted}%.1f")

    // read tax: vectored scan vs materialized scan
    val q = () => spark.read.format("graft-sink").option("path", dir).load()
      .agg(sum(col("id")), count(lit(1))).collect()(0)
    val (r1, tVec) = timed(q())
    val (_, tOpt) = timed { spark.sql(s"CALL gdvs.system.optimize('db.t', $nFiles)") }
    val (r2, tMat) = timed(q())
    require(r1 == r2, s"optimize must preserve content: $r1 vs $r2")
    require(graft.sources.GraftManifest.readVersion(dir, None).get.metas
      .forall(_.dv.isEmpty), "optimize must materialize vectors away")
    j("read_tax", "vectored_sec" -> f"$tVec%.2f", "optimize_sec" -> f"$tOpt%.2f",
      "materialized_sec" -> f"$tMat%.2f")

    // metadata-only delete on a partitioned twin
    val dir2 = s"$root/db/t2"
    spark.range(n)
      .select(col("id"), (col("id") % 16).as("p"))
      .repartition(col("p"))
      .write.format("graft-sink").option("path", dir2)
      .option("partitionBy", "p").mode("overwrite").save()
    def bytes2() = Option(new java.io.File(dir2).listFiles()).getOrElse(Array.empty)
      .map(_.length).sum
    val before3 = bytes2()
    val (_, tMeta) = timed { spark.sql("DELETE FROM gdvs.db.t2 WHERE p = 3") }
    val h2 = graft.sources.GraftManifest.readVersion(dir2, None).get
    require(h2.metas.forall(_.dv.isEmpty) && h2.total == n - n / 16,
      "metadata delete must drop whole files, no vectors")
    j("metadata_only_delete", "sec" -> f"$tMeta%.2f",
      "bytes_added" -> (bytes2() - before3), "files_dropped" -> (16 - h2.metas.size))

    // INCREMENTAL BINPACK on a long-tail table (the streaming-ingest
    // shape): 8 well-sized files + 48 tiny appends. The measured claim:
    // compaction cost tracks the TAIL's bytes, not the table's — the
    // full-rewrite OPTIMIZE on the same table is the control.
    val dir3 = s"$root/db/t3"
    spark.range(n).select(col("id"), (col("id") % 8).as("p"))
      .repartition(8, col("p"))
      .write.format("graft-sink").option("path", dir3).mode("overwrite").save()
    val (_, tTail) = timed {
      (0 until 48).foreach { i =>
        spark.range(i * 100L, i * 100L + 100L).select(col("id"), lit(0L).as("p"))
          .coalesce(1).write.format("graft-sink").option("path", dir3)
          .mode("append").save()
      }
    }
    def bytes3() = Option(new java.io.File(dir3).listFiles()).getOrElse(Array.empty)
      .map(_.length).sum
    val bigMetas = graft.sources.GraftManifest.readVersion(dir3, Some(1)).get.metas.toSet
    val tableBytes = bytes3()
    val tailBytes = graft.sources.GraftManifest.readVersion(dir3, None).get.metas
      .filterNot(bigMetas).map(m =>
        java.nio.file.Files.size(java.nio.file.Paths.get(dir3, m.name))).sum
    j("binpack_fixture", "append_sec" -> f"$tTail%.2f",
      "table_bytes" -> tableBytes, "tail_bytes" -> tailBytes)
    val beforeBp = bytes3()
    val (resBp, tBp) = timed {
      spark.sql(s"CALL gdvs.system.optimize('db.t3', 1, '', ${64 * 1024})")
        .collect().head }
    val headBp = graft.sources.GraftManifest.readVersion(dir3, None).get
    require(bigMetas.subsetOf(headBp.metas.toSet),
      "binpack must keep every well-sized file's meta untouched")
    j("binpack_tail", "sec" -> f"$tBp%.2f",
      "files_before" -> resBp.getInt(0), "files_after" -> resBp.getInt(1),
      "bytes_added" -> (bytes3() - beforeBp))
    val beforeFull = bytes3()
    val (_, tFull) = timed {
      spark.sql(s"CALL gdvs.system.optimize('db.t3', 8)").collect() }
    j("full_rewrite_control", "sec" -> f"$tFull%.2f",
      "bytes_added" -> (bytes3() - beforeFull))

    spark.stop()
  }
}
