package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end TRAINING-DATA CURATION run — the library's kernels composed
  * the way a real 100 TB pipeline chains them, over the documents fixture:
  *
  *   profile → split → exact dedup → near-dedup (LSH→verify→CC, keep
  *   canonical) → decontaminate vs the eval split → quality + repetition
  *   filter → chunk → pack → assign contiguous sample ids
  *
  * Every stage is one of the registered operators (same kernels the
  * correctness gate hash-checks); this main exists to demonstrate the
  * composition and print per-stage survivor counts — the "data funnel"
  * report a curation run ships with.
  *
  *   sbt "runMain graft.tools.CurationPipelineDemo [sfDir]"
  */
object CurationPipelineDemo {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    def stage(name: String, n: Long): Unit =
      println(f"[pipeline] $name%-28s $n%9d rows  (t+${(System.nanoTime() - t0) / 1e9}%.1f s)")

    val docs = graft.util.Tables.documents(spark, sf)
    stage("ingest", docs.count())

    // 0. web-ingest normalization (round-5 kernels): pages arrive as HTML
    // under tracking-param'd URLs; cleanHtml strips the markup back to
    // the exact text (asserted — so the funnel below is unchanged) and
    // canonicalizeUrls collapses URL variants that differ only by
    // tracking params onto one dedup key (pairs of docs share a path
    // here, so the canon space is half the raw space).
    val pages = docs.select(col("doc_id"), col("text"),
      concat(lit("<html><body><p>"), col("text"),
        lit("</p></body></html>")).as("html"),
      concat(lit("HTTPS://WWW.Example.com/doc/"), expr("doc_id div 2"),
        when(col("doc_id") % 2 === 0, lit("?utm_source=a&ref=x"))
          .otherwise(lit("?ref=y&utm_campaign=b"))).as("url"))
    val norm = graft.api.Graft.canonicalizeUrls(
      graft.api.Graft.cleanHtml(pages, "html"), "url")
    val htmlMismatch = norm.where(col("html_clean") =!= col("text")).count()
    require(htmlMismatch == 0, s"cleanHtml altered $htmlMismatch docs")
    val rawUrls = norm.select("url").distinct().count()
    val canonUrls = norm.select("canon_url").distinct().count()
    println(f"[pipeline] web normalize:            " +
      f"html exact-restore ok; $rawUrls%d raw urls -> $canonUrls%d canonical")

    // 1. profile the corpus (DQ first-look; here: langs + length stats)
    val profile = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), min(col("n_chars")).as("min_c"),
        max(col("n_chars")).as("max_c"))
    stage("profile (langs)", profile.count())

    // 2. content-salted split; eval docs leave the training pool
    val splitDf = graft.api.Graft.splitTrainEval(docs, "doc_id", "text")
    val train0 = splitDf.where(col("split") === "train").localCheckpoint()
    val eval0 = splitDf.where(col("split") =!= "train")
    stage("train pool after split", train0.count())

    // 2b. domain mixture: rebalance sources BEFORE dedup spends compute —
    // keep the curated sources whole, downsample the long tail
    val mixed = graft.api.Graft.mixSources(train0, "doc_id", "source",
      Map("src0" -> 256, "src1" -> 256, "src2" -> 192), defaultRate256 = 128)
      .localCheckpoint()
    stage("after domain mixing", mixed.count())

    // 3. exact dedup (fingerprint groups → keep min doc_id)
    val fp = mixed.select(col("doc_id"),
      md5(concat_ws(" ", array_sort(array_distinct(split(col("text"), " "))))).as("fp"))
    val keepExact = fp.groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val afterExact = mixed.join(keepExact, "doc_id").localCheckpoint()
    stage("after exact dedup", afterExact.count())

    // 4. near-dedup: LSH candidates → exact verify → components → keep the
    //    longest doc per cluster (unclustered docs survive by default)
    val clusters = graft.api.Graft.dedupClusters(afterExact, "doc_id", "text")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("component"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    val dropNear = clusters
      .join(afterExact.select(col("doc_id"), col("n_chars")), "doc_id")
      .withColumn("rk", row_number().over(w))
      .where(col("rk") > 1)
      .select(col("doc_id"))
    val afterNear = afterExact.join(dropNear, Seq("doc_id"), "left_anti")
      .localCheckpoint()
    stage("after near dedup", afterNear.count())

    // 4b. span-duplication REPORT (C4-style segment dedup): how much
    // verbatim repetition survives doc-level dedup — the number a curation
    // run watches to decide whether span-removal is worth a pass
    val segStats = graft.api.Graft.segmentDedup(afterNear, "doc_id", "text")
      .agg(sum(col("n_seg")).as("segs"), sum(col("n_dup")).as("dups"))
      .collect()(0)
    println(f"[pipeline] span-dup report:          " +
      f"${segStats.getAs[Long]("dups")}%9d of ${segStats.getAs[Long]("segs")}%d segments duplicated")

    // 5. decontaminate vs the held-out split (shared word-trigrams). The
    // fixtures' 31-word vocabulary makes ANY trigram overlap ubiquitous
    // (the registered key's >=2 contract flags every doc here), so the
    // demo drops only substantial leakage: >=20 shared distinct trigrams.
    val contaminated = graft.api.Graft.decontaminate(
        afterNear, eval0, "doc_id", "text")
      .where(col("n_shared") >= 20).select(col("doc_id"))
    val clean = afterNear.join(contaminated, Seq("doc_id"), "left_anti")
    stage("after decontamination", clean.count())

    // 6. quality gates: length/type-token floor + duplicate-bigram ceiling
    val ws = split(col("text"), " ")
    val quality = clean
      .withColumn("n_words", size(ws))
      .withColumn("ttr_e6", expr("(cast(size(array_distinct(split(text,' '))) as bigint) * 1000000) div size(split(text,' '))"))
      .withColumn("n_bg_tot", size(ws) - 1)
      .withColumn("n_bg_dist", size(graft.ops.Text.bigramsOf(ws)))
      .where(col("n_words") >= 15 && col("ttr_e6") >= 150000 &&
        (col("n_bg_tot") - col("n_bg_dist")) * 5 < col("n_bg_tot"))
      .localCheckpoint()
    stage("after quality+repetition", quality.count())

    // 7. chunk to context windows, pack to fixed token bins
    val chunks = graft.api.Graft.chunkTokens(quality, "doc_id", "text")
    stage("context chunks", chunks.count())

    // 8. stable contiguous sample ids for the packed set
    val ids = graft.util.Ids.zipWithIndex(
      quality.select(col("doc_id"), col("lang")), "seq_id", col("doc_id"))
    stage("samples with seq ids", ids.count())

    // 9. link-graph authority (round-5 graph kernels): PageRank over the
    // survivors' citation graph — the signal a web curation run mixes
    // into sampling weights — plus the degree histogram that predicts
    // downstream join skew.
    val n = quality.count()
    val edges = quality
      .select(col("doc_id").as("src"),
        explode(sequence(lit(1), lit(1) + col("doc_id") % 3)).as("j"))
      .select(col("src"), ((col("src") * 31 + col("j") * 7919) % n).as("dst"))
    val pr = graft.api.Graft.pageRank(edges, "src", "dst", iters = 2)
      .localCheckpoint()
    val above = pr.where(col("pr_e6") > 1000000L).count()
    val degs = graft.api.Graft.degreeDistribution(edges, "src", "dst")
      .orderBy(col("deg").desc).limit(1).collect()(0)
    println(f"[pipeline] link-graph signal:        " +
      f"${pr.count()}%d ranked, $above%d above-uniform authority; " +
      f"max degree ${degs.getLong(0)}%d (${degs.getLong(1)}%d nodes)")

    // 10. LAND the curated set through the graft-avro V2 connector (the
    // round-6 format rung): chunk rows become Avro container files under
    // the atomic-manifest commit, then the read-back — schema inferred
    // from the container header, no user schema — must reproduce the
    // frame exactly (count + sampled content asserted).
    val landDir = graft.util.Scratch.dir("curation_avro", sf)
    val landed = chunks.select(col("doc_id"),
      col("chunk_idx").cast("long").as("chunk_idx"),
      col("n_tok").cast("long").as("n_tok"),
      col("first_tok"), col("last_tok"))
    landed.write.format("graft-avro").option("path", landDir)
      .mode("append").save()
    val back = spark.read.format("graft-avro").load(landDir)
    require(back.count() == landed.count(), "avro landing lost rows")
    stage("landed as avro (read back)", back.count())

    // 11. LAND the curated sample table in the graft-sink VERSIONED
    // connector — the round-7/8 lakehouse landing zone as the pipeline's
    // OUTPUT stage, not a side demo: a partitioned commit (one file per
    // lang, values recorded in the manifest), a partition-pinned read
    // that must plan only that lang's files, a GDPR erasure committed as
    // a base-conditioned version, then OPTIMIZE + VACUUM — the full
    // version lifecycle over real pipeline output.
    val tableDir = graft.util.Scratch.dir("curation_sink", sf)
    val tLand = System.nanoTime()
    ids.select(col("doc_id"), col("lang"), col("seq_id"))
      .repartition(col("lang"))
      .write.format("graft-sink").option("path", tableDir)
      .option("partitionBy", "lang").mode("overwrite").save()
    val v1 = graft.sources.GraftManifest.readVersion(tableDir, None).get
    val landSec = (System.nanoTime() - tLand) / 1e9
    val pinned = spark.read.format("graft-sink").option("path", tableDir).load()
      .where(col("lang") === "en")
    val plannedEn = pinned.rdd.getNumPartitions
    val nEn = pinned.count()
    require(plannedEn < v1.files.size,
      s"partition pruning must plan < ${v1.files.size} files, planned $plannedEn")
    println(f"[pipeline] versioned landing:        v1 ${v1.files.size}%d files " +
      f"(${v1.total}%d rows) in $landSec%.1f s; lang=en pins $plannedEn%d file(s), $nEn%d rows")

    // GDPR erasure as version 2, conditioned on the version it planned
    // against (a concurrent append would make this commit throw, never
    // silently vanish)
    val tDel = System.nanoTime()
    val erased = spark.read.format("graft-sink").option("path", tableDir).load()
      .where(col("doc_id") % 97 =!= 0)
    erased.write.format("graft-sink").option("path", tableDir)
      .option("expectedBaseVersion", v1.version.toString).mode("overwrite").save()
    val delSec = (System.nanoTime() - tDel) / 1e9
    val v2 = graft.sources.GraftManifest.readVersion(tableDir, None).get
    // pre-erasure snapshot stays pinned-readable until VACUUM reclaims it
    val v1Back = spark.read.format("graft-sink").option("path", tableDir)
      .option("versionAsOf", v1.version.toString).load().count()
    require(v1Back == v1.total, "pre-delete snapshot must stay readable")

    // OPTIMIZE (base-conditioned rewrite) + VACUUM(retain 1)
    val tOpt = System.nanoTime()
    spark.read.format("graft-sink").option("path", tableDir).load().coalesce(1)
      .write.format("graft-sink").option("path", tableDir)
      .option("expectedBaseVersion", v2.version.toString).mode("overwrite").save()
    val reclaimed = graft.sources.GraftManifest.vacuum(tableDir, retainLast = 1, graceMs = 0L)
    val optSec = (System.nanoTime() - tOpt) / 1e9
    val head = graft.sources.GraftManifest.readVersion(tableDir, None).get
    require(head.total == v2.total, "OPTIMIZE must change storage, not content")
    println(f"[pipeline] gdpr+optimize+vacuum:     erased ${v1.total - v2.total}%d rows " +
      f"as v${v2.version}%d in $delSec%.1f s; compacted ${head.files.size}%d file(s), " +
      f"reclaimed $reclaimed%d in $optSec%.1f s")
    stage("final versioned table", head.total)

    println(f"[pipeline] total wall ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
