package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorDot
import graft.sources.GraftManifest

/** Scale economics for the two round-14 scan-side features, measured
  * (numbers recorded in DECISIONS.md / BASELINE.md):
  *
  * A. STREAMING AUTO-MAINTENANCE (`autoOptimize.*`): many small
  *    full-domain appends land on a sorted table with and without the
  *    policy. Reported per variant: ingest wall time (the sweep tax),
  *    end-state file count, and a 1%-range probe's planned files +
  *    latency. The claim: the policy caps probe cost at O(answer + N-1
  *    unswept tail files) FOREVER, for a bounded, amortized ingest
  *    surcharge — without it every probe pays O(appends since the last
  *    manual OPTIMIZE).
  *
  * B. VECTOR-AWARE FILE PRUNING (`#centroid` + `annProbe`): a clustered
  *    replica corpus (the AnnScaleDemo construction — md5-perturbed
  *    fixture vectors, deterministic) lands one-file-per-cell with
  *    `centroidFor`; a probe's top-10 is computed through the
  *    nprobe-routed scan vs the full corpus. Reported: planned files,
  *    latency both ways, recall@10 of the routed answer against the
  *    full-scan truth. The claim: the manifest IS the coarse quantizer —
  *    nprobe/nfiles of the corpus read per probe, no separate index
  *    table.
  *
  *   sbt "runMain graft.tools.MaintainScaleDemo [nEpochs] [rowsPer] [nRep]"
  */
object MaintainScaleDemo {
  def main(args: Array[String]): Unit = {
    val nEpochs = args.headOption.map(_.toInt).getOrElse(32)
    val rowsPer = args.lift(1).map(_.toLong).getOrElse(100000L)
    val nRep = args.lift(2).map(_.toInt).getOrElse(200)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    VectorDot.register(spark)
    val root = java.nio.file.Files.createTempDirectory("graft_maintain").toString
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def j(kv: (String, Any)*): Unit =
      println(kv.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}"))

    // ---- A. auto-maintenance -----------------------------------------
    val domain = nEpochs * rowsPer
    def epoch(e: Int): DataFrame = // full-domain slice e of nEpochs
      spark.range(rowsPer).select(
        (col("id") * nEpochs + e).as("k"),
        (col("id") % 97).as("v"),
        md5(col("id").cast("string")).as("payload"))
    Seq(true, false).foreach { auto =>
      val dir = s"$root/${if (auto) "maintained" else "control"}"
      // seed: slice 0 as a 4-file range layout declaring the sort
      epoch(0).write.format("graft-sink").option("path", dir)
        .option("sortBy", "k").option("writePartitions", "4")
        .option("distributionStrict", "true").mode("overwrite").save()
      val (_, ingestSec) = timed {
        (1 until nEpochs).foreach { e =>
          val w = epoch(e).coalesce(1)
            .write.format("graft-sink").option("path", dir)
          (if (auto)
            w.option("autoOptimize.smallFiles", "8")
              .option("autoOptimize.maxFileBytes", (1L << 33).toString)
              .option("autoOptimize.targetFiles", "8")
          else w).mode("append").save()
        }
      }
      val head = GraftManifest.readVersion(dir, None).get
      val sweeps = GraftManifest.versions(dir)
        .flatMap(v => GraftManifest.headerFacts(dir, v).op)
        .count(_ == "AUTO-OPTIMIZE")
      val probe = () => spark.read.format("graft-sink").option("path", dir)
        .load().where(col("k") <= domain / 100)
      val planned = probe().rdd.getNumPartitions
      probe().count() // warm
      val (hits, probeSec) = timed(probe().count())
      j("phase" -> "\"auto-maintain\"", "auto" -> auto,
        "epochs" -> nEpochs, "rows" -> domain,
        "ingest_sec" -> f"$ingestSec%.1f", "sweeps" -> sweeps,
        "files" -> head.metas.size, "probe_planned" -> planned,
        "probe_hits" -> hits, "probe_sec" -> f"$probeSec%.2f")
    }

    // ---- B. ANN centroid file routing --------------------------------
    val base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select(col("vec_id").as("b"), col("embedding").as("be"))
      .localCheckpoint()
    // clustered replicas: center b, replica r, per-dim md5 perturbation;
    // cells are GEOMETRIC — each center routes to its nearest of 16
    // spread seed vectors (argmax cosine via one window), so a file's
    // stored mean is a real cluster centroid, not a hash-mixed average
    val seeds = base.limit(16).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val centerCells = base.select(col("b"), col("be"))
      .withColumn("cell", -greatest(seeds.map { case (cid, cemb) =>
        val norm = math.sqrt(cemb.map(f => f.toDouble * f.toDouble).sum)
        struct(
          (call_function("vector_dot", col("be"),
            array(cemb.map(f => lit(f)): _*)) / lit(norm)).as("s"),
          lit(-cid).as("ncid"))
      }: _*).getField("ncid"))
      .select(col("b"), col("cell"))
    val corpus = base.join(centerCells, "b")
      .crossJoin(spark.range(nRep).select(col("id").as("r")))
      .select((col("b") * nRep + col("r")).as("cand_id"),
        expr("""transform(be, (x, i) ->
          x + (cast(conv(substring(md5(concat(b, ':', r, ':', i)), 1, 4), 16, 10)
               as double) / 65536.0 - 0.5) * 0.1)""").cast("array<float>")
          .as("ce"),
        col("cell").cast("long").as("cell"))
      .localCheckpoint()
    val n = corpus.count()
    val dir = s"$root/vectors"
    val (_, buildSec) = timed {
      corpus.repartition(col("cell"))
        .write.format("graft-sink").option("path", dir)
        .option("partitionBy", "cell").option("centroidFor", "ce")
        .mode("overwrite").save()
    }
    val nFiles = GraftManifest.readVersion(dir, None).get.metas.size
    val probes = base.limit(8).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def topk(df: DataFrame, pe: Array[Float]): Seq[Long] = {
      val lits = array(pe.map(f => lit(f)): _*)
      df.withColumn("cos",
          expr("vector_dot(ce, pe_lit)") / sqrt(expr("vector_dot(ce, ce)")))
        .orderBy(col("cos").desc, col("cand_id").asc).limit(10)
        .select(col("cand_id")).collect().map(_.getLong(0)).toSeq
    }
    def withProbe(df: DataFrame, pe: Array[Float]): DataFrame =
      df.withColumn("pe_lit", array(pe.map(f => lit(f)): _*))
    var fullSec = 0.0; var routedSec = 0.0; var recall = 0.0; var planned = 0
    probes.foreach { case (_, pe) =>
      val full = spark.read.format("graft-sink").option("path", dir).load()
      val (truth, tFull) = timed(topk(withProbe(full, pe), pe))
      val routed = spark.read.format("graft-sink").option("path", dir)
        .option("annProbe", pe.map(_.toDouble).mkString(","))
        .option("annNprobe", "4").option("annCol", "ce").load()
      planned = routed.rdd.getNumPartitions
      val (got, tRouted) = timed(topk(withProbe(routed, pe), pe))
      fullSec += tFull; routedSec += tRouted
      recall += got.toSet.intersect(truth.toSet).size / 10.0
    }
    j("phase" -> "\"ann-route\"", "vectors" -> n, "files" -> nFiles,
      "build_sec" -> f"$buildSec%.1f", "probes" -> probes.length,
      "planned_per_probe" -> planned,
      "full_scan_sec" -> f"${fullSec / probes.length}%.2f",
      "routed_sec" -> f"${routedSec / probes.length}%.2f",
      "recall_at10" -> f"${recall / probes.length}%.3f")
    spark.stop()
  }
}
