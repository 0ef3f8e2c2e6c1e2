package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SNAPSHOT-LIFECYCLE scale measurement for the versioned graft-sink
  * (the round-7 time-travel/OPTIMIZE/VACUUM surface): drives the commit
  * log to a version count far past what the fixture keys exercise and
  * measures the three costs that govern a long-lived snapshot table:
  *
  *  - COMMIT latency as the table ages: each append merges the head's
  *    file list, so commit cost grows with the accumulated FILE COUNT,
  *    not the data size — the many-small-appends regime every streaming
  *    ingest produces (and the reason OPTIMIZE exists);
  *  - TIME-TRAVEL READ cost at v1 / vN/2 / head: each read plans exactly
  *    its manifest's files, so old small versions stay cheap forever
  *    while the head pays the accumulated-file tax;
  *  - OPTIMIZE + VACUUM: one compacted overwrite version + a
  *    grace-0 vacuum, proving the file count (and with it the commit and
  *    head-read cost) resets to O(compaction width) while every retained
  *    byte stays readable.
  *
  * Usage: runMain graft.tools.SnapshotScaleDemo [nAppends] [rowsPerAppend]
  * Prints one JSON line per phase; numbers recorded in DECISIONS.md. */
object SnapshotScaleDemo {
  def main(args: Array[String]): Unit = {
    val nAppends = args.headOption.map(_.toInt).getOrElse(100)
    val rowsPer = args.lift(1).map(_.toLong).getOrElse(10000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = graft.util.Scratch.dir("snapscale", s"n$nAppends")
    def batch(i: Int) = spark.range(rowsPer)
      .select((col("id") + i * rowsPer).as("k"), (col("id") % 97).as("v"))

    // phase 1: nAppends small commits — the streaming-ingest shape
    var t0 = System.nanoTime()
    var firstCommitNs = 0L
    (0 until nAppends).foreach { i =>
      val c0 = System.nanoTime()
      batch(i).coalesce(4) // 4 files per append: many small files on purpose
        .write.format("graft-sink").option("path", dir).mode("append").save()
      if (i == 0) firstCommitNs = System.nanoTime() - c0
    }
    val lastCommitNs = {
      val c0 = System.nanoTime()
      batch(nAppends).coalesce(4)
        .write.format("graft-sink").option("path", dir).mode("append").save()
      System.nanoTime() - c0
    }
    val appendSec = (System.nanoTime() - t0) / 1e9
    val head = graft.sources.GraftManifest.readVersion(dir, None).get
    println(f"""{"phase":"append","n_versions":${head.version},""" +
      f""""n_files":${head.files.size},"total_rows":${head.total},""" +
      f""""sec":$appendSec%.1f,"first_commit_ms":${firstCommitNs / 1000000},""" +
      f""""last_commit_ms":${lastCommitNs / 1000000}}""")

    // phase 1b: MANIFEST-LAYER cost isolated from Spark job overhead — the
    // regime the delta/checkpoint log exists for. A 100 000-file table
    // (the realistic file count a 100 TB table with ~1 GB files carries):
    // an append between checkpoints writes a DELTA manifest naming only
    // its own files, so commit cost is O(job files); every CheckpointEvery-th
    // commit folds to a full snapshot and pays O(table files) once —
    // amortized, the quadratic total-manifest bill of always-full commits
    // is gone while every read still folds to the exact snapshot.
    {
      import graft.sources.{GraftFileMeta, GraftManifest}
      val mdir = graft.util.Scratch.dir("snapscale_manifest", s"n$nAppends")
      val ddl = "k BIGINT,v BIGINT"
      if (GraftManifest.versions(mdir).isEmpty) {
        val big = (1 to 100000).map(i =>
          GraftFileMeta(f"p-$i%06d.csv", 100L, 2, Map(0 -> (("1", "100"))), None))
        GraftManifest.commitMetas(mdir, big, ddl, truncate = true)
        (2 to 9).foreach(i => GraftManifest.commitMetas(mdir,
          Seq(GraftFileMeta(s"a-$i.csv", 100L, 2, Map.empty, None)), ddl,
          truncate = false))
      }
      def commitOne(tag: Int): Long = {
        val c0 = System.nanoTime()
        GraftManifest.commitMetas(mdir,
          Seq(GraftFileMeta(s"a-$tag.csv", 100L, 2, Map.empty, None)), ddl,
          truncate = false)
        (System.nanoTime() - c0) / 1000000
      }
      val checkpointMs = commitOne(10) // v10: full snapshot, 100 008 files
      val deltaMs = commitOne(11)      // v11: delta, 1 file
      def bytes(v: Int) = java.nio.file.Files.size(
        java.nio.file.Paths.get(mdir, s"_manifest-v$v"))
      val folded = GraftManifest.readVersion(mdir, None).get
      require(folded.metas.size == 100010, s"fold saw ${folded.metas.size}")
      println(s"""{"phase":"manifest_cost","table_files":${folded.metas.size},""" +
        s""""checkpoint_ms":$checkpointMs,"checkpoint_bytes":${bytes(10)},""" +
        s""""delta_ms":$deltaMs,"delta_bytes":${bytes(11)}}""")
      // the commit AUDIT at the same table: header facts per version, so
      // the cost is versions x header-read, independent of the 100k files
      val h0 = System.nanoTime()
      val audit = GraftManifest.versions(mdir).map(v => GraftManifest.headerFacts(mdir, v))
      val histMs = (System.nanoTime() - h0) / 1000000
      require(audit.last.nFiles.exists(_ >= 100010),
        s"header #files must carry the snapshot count, got ${audit.last.nFiles}")
      println(s"""{"phase":"history_cost","versions":${audit.size},""" +
        s""""history_ms":$histMs}""")
    }

    // phase 2: time-travel reads at v1, mid, head (count + sum as the probe)
    def readAt(v: Option[Int]): (Long, Double) = {
      val r = spark.read.format("graft-sink").option("path", dir)
      val df = v.fold(r)(n => r.option("versionAsOf", n.toString)).load()
      val s0 = System.nanoTime()
      val n = df.count()
      (n, (System.nanoTime() - s0) / 1e9)
    }
    val (n1, s1) = readAt(Some(1))
    val (nm, sm) = readAt(Some(head.version / 2))
    val (nh, sh) = readAt(None)
    println(f"""{"phase":"time_travel","v1_rows":$n1,"v1_sec":$s1%.2f,""" +
      f""""mid_rows":$nm,"mid_sec":$sm%.2f,"head_rows":$nh,"head_sec":$sh%.2f}""")

    // phase 2b: the round-8 incremental surfaces against the aged table —
    // the costs that make-or-break a 100 TB consumer:
    //  - timestampAsOf pays O(versions) small manifest reads to resolve;
    //  - a NARROW change feed (last commit only) plans 4 files no matter
    //    how big the table has grown — the O(changed files) claim;
    //  - a WIDE feed (whole history) degenerates to the head snapshot;
    //  - a streaming drain of the whole history in version-capped batches
    //    is the ingest-replay shape (many offset commits, no rescans).
    val headTs = head.ts.get
    var s0 = System.nanoTime()
    val tsRows = spark.read.format("graft-sink").option("path", dir)
      .option("timestampAsOf", headTs.toString).load().count()
    val tsSec = (System.nanoTime() - s0) / 1e9
    def cdf(from: Int): (Long, Int, Double) = {
      val df = spark.read.format("graft-sink").option("path", dir)
        .option("changesFrom", from.toString)
        .option("changesTo", head.version.toString).load()
      val t = System.nanoTime()
      val n = df.count()
      (n, df.rdd.getNumPartitions, (System.nanoTime() - t) / 1e9)
    }
    val (nNarrow, fNarrow, sNarrow) = cdf(head.version - 1)
    val (nWide, fWide, sWide) = cdf(0)
    require(tsRows == nh && nWide == nh,
      s"timestampAsOf head + whole-history feed must both see $nh rows")
    println(f"""{"phase":"incremental_read","ts_as_of_sec":$tsSec%.2f,""" +
      f""""cdf_last_commit_rows":$nNarrow,"cdf_last_commit_files":$fNarrow,""" +
      f""""cdf_last_commit_sec":$sNarrow%.2f,"cdf_full_rows":$nWide,""" +
      f""""cdf_full_files":$fWide,"cdf_full_sec":$sWide%.2f}""")

    // phase 2c: stream the whole history, 25 versions per micro-batch
    s0 = System.nanoTime()
    val seen = spark.sparkContext.longAccumulator("streamed_rows")
    val batches = spark.sparkContext.longAccumulator("stream_batches")
    val q = spark.readStream.format("graft-sink").option("path", dir)
      .option("maxVersionsPerTrigger", "25").load()
      .writeStream
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          batches.add(1); seen.add(b.count())
      }
      .option("checkpointLocation",
        graft.util.Scratch.dir("snapscale_chk", s"n$nAppends"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val drainSec = (System.nanoTime() - s0) / 1e9
    require(seen.value == nh, s"stream drain must see all $nh rows, saw ${seen.value}")
    println(f"""{"phase":"stream_drain","rows":${seen.value},""" +
      f""""micro_batches":${batches.value},"sec":$drainSec%.1f}""")

    // phase 3: OPTIMIZE (compact to 8 files) + VACUUM(retain 1)
    t0 = System.nanoTime()
    spark.read.format("graft-sink").option("path", dir).load()
      .repartition(8)
      .write.format("graft-sink").option("path", dir).mode("overwrite").save()
    val optSec = (System.nanoTime() - t0) / 1e9
    t0 = System.nanoTime()
    // grace 0: this demo is the only writer
    val reclaimed = graft.sources.GraftManifest.vacuum(dir, retainLast = 1, graceMs = 0L)
    val vacSec = (System.nanoTime() - t0) / 1e9
    val after = graft.sources.GraftManifest.readVersion(dir, None).get
    val (nAfter, sAfter) = readAt(None)
    require(nAfter == nh, s"compaction+vacuum must not change rows: $nAfter != $nh")
    println(f"""{"phase":"optimize_vacuum","optimize_sec":$optSec%.1f,""" +
      f""""vacuum_sec":$vacSec%.2f,"files_reclaimed":$reclaimed,""" +
      f""""n_files_after":${after.files.size},"head_read_sec_after":$sAfter%.2f,""" +
      f""""rows_preserved":true}""")

    spark.stop()
  }
}
