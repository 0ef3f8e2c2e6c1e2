package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Evidence generator for the round-11 data-file codec swap: the SAME
  * table written through the graft connector with `format=csv` (the v1
  * line codec) and `format=parquet` (the round-11 default), then measured
  * on the four axes that decide the 100 TB IO bill:
  *  - bytes at rest (zstd columnar vs uncompressed text),
  *  - full-scan aggregate (whole-row decode),
  *  - 2-of-4-column projected aggregate (column pruning reaching the
  *    file: parquet decodes 2 column chunks; csv must split every line),
  *  - count() (parquet answers from footers + manifest; csv streams
  *    every line).
  * Run: `sbt "runMain graft.tools.FormatScaleDemo [rows]"` (default 2M).
  * Numbers land in DECISIONS.md / BASELINE.md per round. */
object FormatScaleDemo {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // 4 columns: key, metric, and a ~64-char text payload (comma-free so
    // the v1 codec can hold it — the comparison is IO, not delimiters).
    // Two text regimes: `hex` (md5 concat — incompressible, the
    // conservative bound) and `prose` (word-soup like the documents
    // fixture — what real text compresses to).
    val words = Array("table", "scan", "merge", "window", "stream", "batch",
      "query", "filter", "value", "column")
    val wordCol = array(words.map(lit): _*)
    def payload(kind: String) = kind match {
      case "hex" => concat(md5(col("id").cast("string")),
        md5((col("id") + 1).cast("string")))
      case "prose" => concat_ws(" ", (0 until 10).map(j =>
        element_at(wordCol, (pmod(col("id") * 31 + j * 7, lit(10)) + 1).cast("int"))): _*)
    }
    val kind = args.lift(1).getOrElse("hex")
    val df = spark.range(rows).select(
      col("id"),
      (col("id") % 1000).as("k"),
      (col("id") % 97 * 13 % 1000).cast("double").as("v"),
      payload(kind).as("txt"))
    df.localCheckpoint() // build cost out of the write timing
    def time[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def bytes(dir: String): Long =
      Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
        .filter(f => graft.sources.GraftFormat.isDataFile(f.getName))
        .map(_.length()).sum
    Seq("csv", "parquet").foreach { fmt =>
      val dir = java.nio.file.Files.createTempDirectory(s"graft_fmt_$fmt").toString
      val (_, wSec) = time {
        df.write.format("graft-sink").option("path", dir)
          .option("format", fmt).mode("overwrite").save()
      }
      val rd = spark.read.format("graft-sink").option("path", dir)
      val (_, fullSec) = time {
        rd.load().agg(sum(length(col("txt"))), sum(col("v")), max(col("id"))).collect()
      }
      val (_, projSec) = time {
        rd.load().groupBy(col("k")).agg(sum(col("v"))).count()
      }
      // a WHERE forces a real (non-pushdown) count through the reader
      val (_, cntSec) = time { rd.load().where(col("id") >= 0).count() }
      println(f"format=$fmt%-8s kind=$kind%-6s rows=$rows bytes=${bytes(dir)}%12d " +
        f"write=$wSec%6.2fs fullScan=$fullSec%6.2fs projScan=$projSec%6.2fs " +
        f"count=$cntSec%6.2fs")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
    // VECTORIZED DECODE (round 12): the same parquet table full-scanned
    // through the columnar batch reader (default) vs the row-at-a-time
    // Group fallback (spark.graft.columnar.enabled=false — the path
    // DV/eqdel/_pos splits still take). The delta is pure decode cost:
    // identical files, identical plan below the scan node.
    locally {
      val dir = java.nio.file.Files.createTempDirectory("graft_fmt_vec").toString
      df.write.format("graft-sink").option("path", dir).mode("overwrite").save()
      val rd = () => spark.read.format("graft-sink").option("path", dir).load()
      def fullAgg() =
        rd().agg(sum(length(col("txt"))), sum(col("v")), max(col("id"))).collect()
      def projAgg() = rd().groupBy(col("k")).agg(sum(col("v"))).count()
      fullAgg() // warm both code paths' codegen before timing
      val (_, colFull) = time(fullAgg())
      val (_, colProj) = time(projAgg())
      spark.conf.set("spark.graft.columnar.enabled", "false")
      fullAgg()
      val (_, rowFull) = time(fullAgg())
      val (_, rowProj) = time(projAgg())
      spark.conf.set("spark.graft.columnar.enabled", "true")
      println(f"vectorized-decode kind=$kind rows=$rows " +
        f"fullScan: columnar=$colFull%5.2fs row=$rowFull%5.2fs " +
        f"(${rowFull / colFull}%4.1fx) | projScan: columnar=$colProj%5.2fs " +
        f"row=$rowProj%5.2fs (${rowProj / colProj}%4.1fx)")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
    // VECTORIZED ROW-MODE under EQDEL (round 13): a streaming/batch
    // upsert leaves pending equality deletes, so the scan must emit rows
    // AND probe each row's key cell against the sidecar sets — the one
    // path round 12 left on the boxed Group tree. Round 13 decodes it
    // through VectorRows with the key cells canonicalized from the
    // decoded row. A/B: the identical eqdel-bearing scan with
    // `spark.graft.columnar.enabled=false` (the Group fallback).
    locally {
      val dir = java.nio.file.Files.createTempDirectory("graft_fmt_eq").toString
      df.write.format("graft-sink").option("path", dir).mode("overwrite").save()
      // upsert 1% of keys: pending equality-delete sidecar, target unread
      df.where(col("id") % 100 === 0)
        .select(col("id"), col("k"), (col("v") + 1).as("v"), col("txt"))
        .write.format("graft-sink").option("path", dir)
        .option("upsertKey", "id").mode("append").save()
      val rd = () => spark.read.format("graft-sink").option("path", dir).load()
      def fullAgg() =
        rd().agg(sum(length(col("txt"))), sum(col("v")), max(col("id"))).collect()
      fullAgg() // warm both code paths' codegen before timing
      val (_, vecSec) = time(fullAgg())
      spark.conf.set("spark.graft.columnar.enabled", "false")
      fullAgg()
      val (_, grpSec) = time(fullAgg())
      spark.conf.set("spark.graft.columnar.enabled", "true")
      println(f"eqdel-decode kind=$kind rows=$rows fullScan: " +
        f"vectorRows=$vecSec%5.2fs group=$grpSec%5.2fs (${grpSec / vecSec}%4.1fx)")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
    // ROW-GROUP FILTER PUSHDOWN (round 11): ONE sorted parquet file with
    // production-shaped 1 MB row groups; a point probe and a 1%-range
    // probe should materialize ~their answer sets, not the file. The
    // control is the same probes with pushdown voided by projecting
    // `_pos` (the position gate) — full-file decode.
    locally {
      val dir = java.nio.file.Files.createTempDirectory("graft_fmt_rg").toString
      df.orderBy("id").coalesce(1)
        .write.format("graft-sink").option("path", dir)
        .option("rowGroupBytes", (1 << 20).toString).mode("overwrite").save()
      val rd = () => spark.read.format("graft-sink").option("path", dir).load()
      def decoded[T](body: => T): (T, Long, Double) = {
        val c0 = graft.sources.GraftReadStats.parquetRecordsDecoded.sum()
        val (r, s) = time(body)
        (r, graft.sources.GraftReadStats.parquetRecordsDecoded.sum() - c0, s)
      }
      val mid = rows / 2
      val (h1, d1, s1) = decoded(rd().where(col("id") === mid).collect())
      val (h2, d2, s2) = decoded(
        rd().where(col("id") >= mid && col("id") < mid + rows / 100).count())
      val (_, dc, sc) = decoded( // gate control: _pos voids pushdown
        rd().where(col("id") === mid).select(col("id"), col("_pos")).collect())
      println(f"rowgroup-skip kind=$kind rows=$rows point: ${h1.length} hit " +
        f"decoded=$d1 in $s1%5.2fs | range1pct: $h2 hits decoded=$d2 in " +
        f"$s2%5.2fs | _pos control decoded=$dc in $sc%5.2fs")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
    spark.stop()
  }
}
