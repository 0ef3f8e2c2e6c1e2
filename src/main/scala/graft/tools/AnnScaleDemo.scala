package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorDot

/** ANN scale evidence — the vector twin of [[DedupScaleDemo]]
  * (DECISIONS.md): the fixture embeddings are uniform-random, so IVF
  * recall on them is honestly mediocre (~53% at nprobe=4 — every cell
  * boundary cuts through the probe's neighborhood). Real embedding
  * corpora are CLUSTERED, and that is where inverted-file pruning wins.
  * This demo builds such a corpus deterministically (no RNG): each of the
  * 2 000 sf0.1 fixture vectors becomes a cluster center with `nRep`
  * replicas, perturbed per-dimension by an md5-derived offset (±0.05 —
  * small against unit-scale coordinates, so a replica's true neighbors
  * are its siblings). Then, end to end and each phase timed:
  *
  *   1. ground truth: brute-force cosine top-10 for 32 probes over the
  *      full corpus (the exact-baseline plan shape of `vec_knn_cosine`);
  *   2. codebook: 64 centroids = 2 Lloyd iterations from 64 spread seed
  *      replicas — assignment is a broadcast-join + map-side-combinable
  *      max(struct) argmax, update a groupBy(cell, pos) mean: the exact
  *      one-scan-per-iteration shape `vec_kmeans_iter` ships;
  *   3. index: one final assignment pass, localCheckpointed — the
  *      build-once cost a real deployment amortizes over every query;
  *   4. search: per nprobe ∈ {1, 2, 4, 8}, probes join ONLY their nprobe
  *      nearest cells (an equi-join on cell id, never the full corpus)
  *      and recall@10 against the brute-force truth is reported with the
  *      scanned-candidate fraction.
  *
  * The claim this demo backs: on clustered data the banded IVF plan keeps
  * ≳0.9 recall while scoring ~nprobe/64 of the corpus per probe — the
  * crossover where the index pays for itself is a handful of queries,
  * and at 100 TB the brute-force column simply does not exist.
  *
  *   sbt "runMain graft.tools.AnnScaleDemo [sfDir] [nRep]"
  */
object AnnScaleDemo {
  private val K = 64      // IVF cells
  private val TOPK = 10
  private val NPROBES = Seq(1, 2, 4, 8)

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val nRep = if (args.length > 1) args(1).toInt else 50
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    VectorDot.register(spark)

    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("b"), col("embedding").as("be"))
      .localCheckpoint()
    val nBase = base.count()
    val total = nBase * nRep
    // replica r of base b: r = 0 keeps the center exactly; r > 0 adds a
    // deterministic md5-derived offset in [-0.05, 0.05] per dimension
    val corpus = base
      .join(spark.range(nRep).select(col("id").as("r")))
      .select((col("b") * nRep + col("r")).as("vec_id"),
        expr("""CASE WHEN r = 0 THEN be ELSE
                |  transform(be, (x, i) -> CAST(x +
                |    (conv(substring(md5(concat(b, ':', r, ':', i)), 1, 6), 16, 10)
                |       / 16777215.0d - 0.5d) * 0.1d AS FLOAT))
                |END""".stripMargin).as("embedding"))
      .repartition(cpus.toInt)
      .localCheckpoint()
    require(corpus.count() == total)
    println(s"[ann-demo] corpus=$total vectors " +
      s"($nBase clusters x $nRep replicas, 64-dim, deterministic)")

    // 32 probes, spread across clusters and replica positions
    val probeIds: Seq[Long] =
      (0 until 32).map(j => (j * (nBase / 37 * 37 + 17) % nBase) * nRep + j % nRep)
    val probes = corpus.where(col("vec_id").isin(probeIds: _*))
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"),
        sqrt(expr("vector_dot(embedding, embedding)")).as("pn"))
      .localCheckpoint()

    // 1. brute force = ground truth (and the timing baseline)
    val t0 = System.nanoTime()
    val cands = corpus.select(col("vec_id").as("cand_id"),
      col("embedding").as("ce"),
      sqrt(expr("vector_dot(embedding, embedding)")).as("cn"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("cand_id").asc)
    val truth = cands.crossJoin(broadcast(probes))
      .where(col("cand_id") =!= col("probe_id"))
      .withColumn("cos", expr("vector_dot(pe, ce)") / (col("pn") * col("cn")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= TOPK)
      .select(col("probe_id"), col("cand_id"))
      .localCheckpoint()
    val nTruth = truth.count()
    val tBrute = (System.nanoTime() - t0) / 1e9
    println(f"[ann-demo] brute-force top-$TOPK%d for ${probeIds.size}%d probes: " +
      f"${total * probeIds.size}%d scored pairs, wall=$tBrute%.1fs")

    // 2. codebook: 64 seed replicas -> 2 Lloyd iterations. The codebook
    // lives on the driver between iterations (64x64 floats), exactly like
    // a cluster run; each iteration is one scan of the corpus.
    val t1 = System.nanoTime()
    val seedIds = (0 until K).map(j => (j * (nBase / K)) * nRep + 1L)
    var codebook: Array[(Int, Array[Double])] = corpus
      .where(col("vec_id").isin(seedIds: _*))
      .orderBy(col("vec_id")).collect()
      .zipWithIndex
      .map { case (row, cid) =>
        (cid, row.getSeq[Float](1).map(_.toDouble).toArray)
      }
    def cbDf(cb: Array[(Int, Array[Double])]): DataFrame = {
      import spark.implicits._
      cb.map { case (cid, v) =>
        (cid, v.map(_.toFloat), math.sqrt(v.map(x => x * x).sum)) }
        .toSeq.toDF("cid", "cemb", "cnorm")
    }
    def assign(df: DataFrame): DataFrame =
      df.crossJoin(broadcast(cbDf(codebook)))
        .withColumn("s",
          expr("vector_dot(embedding, cemb)") / col("cnorm"))
        .groupBy(col("vec_id"))
        .agg(max(struct(col("s"), (-col("cid")).as("ncid"))).as("m"),
          first(col("embedding")).as("embedding"))
        .select(col("vec_id"), col("embedding"),
          (-col("m.ncid")).cast("int").as("cell"))
    for (_ <- 1 to 2) {
      codebook = assign(corpus)
        .select(col("cell"), posexplode(col("embedding")))
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("col").cast("double")).as("mu"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("mu")))).as("v"))
        .collect()
        .map(r => (r.getInt(0), r.getSeq[org.apache.spark.sql.Row](1)
          .map(_.getDouble(1)).toArray))
        .sortBy(_._1)
    }
    val tTrain = (System.nanoTime() - t1) / 1e9

    // 3. index build: one assignment pass, materialized
    val t2 = System.nanoTime()
    val indexed = assign(corpus)
      .select(col("vec_id").as("cand_id"), col("embedding").as("ce"),
        sqrt(expr("vector_dot(embedding, embedding)")).as("cn"), col("cell"))
      .localCheckpoint()
    indexed.count()
    val tAssign = (System.nanoTime() - t2) / 1e9
    println(f"[ann-demo] codebook: $K%d cells, 2 Lloyd iterations " +
      f"wall=$tTrain%.1fs; index assignment wall=$tAssign%.1fs (build-once)")

    // probe -> ranked cells (32 x 64 rows: trivial)
    val pw = Window.partitionBy(col("probe_id"))
      .orderBy(col("ps").desc, col("cid").asc)
    val pcells = probes.crossJoin(broadcast(cbDf(codebook)))
      .withColumn("ps", expr("vector_dot(pe, cemb)") / col("cnorm"))
      .withColumn("cellrank", row_number().over(pw))
      .where(col("cellrank") <= NPROBES.max)
      .select(col("probe_id"), col("pe"), col("pn"),
        col("cid").as("cell"), col("cellrank"))
      .localCheckpoint()

    // 4. per-nprobe search + recall@10 vs the brute-force truth
    for (np <- NPROBES) {
      val t3 = System.nanoTime()
      val got = indexed
        .join(pcells.where(col("cellrank") <= np), Seq("cell"))
        .where(col("cand_id") =!= col("probe_id"))
        .withColumn("cos", expr("vector_dot(pe, ce)") / (col("pn") * col("cn")))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= TOPK)
        .select(col("probe_id"), col("cand_id"))
        .localCheckpoint()
      val scanned = indexed
        .join(pcells.where(col("cellrank") <= np), Seq("cell")).count()
      val hits = got.join(truth, Seq("probe_id", "cand_id")).count()
      val sec = (System.nanoTime() - t3) / 1e9
      val recall = hits.toDouble / nTruth
      val frac = scanned.toDouble / (total * probeIds.size)
      println(f"[ann-demo] nprobe=$np%d: recall@$TOPK%d=$recall%.3f " +
        f"scanned=${100 * frac}%.1f%% of pairs wall=$sec%.1fs " +
        f"(brute=$tBrute%.1fs)")
    }
    spark.stop()
  }
}
