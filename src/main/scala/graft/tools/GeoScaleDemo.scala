package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Geo-KNN scale evidence (round 18, VERDICT r17 next #5 — the
  * AnnScaleDemo treatment for `geo_knn_prefiltered`): prove that the
  * grid-cell candidate block stays O(answer) — NOT O(corpus) — as the
  * point table scales 4×, with the (R·C)² exactness certificate holding
  * at every scale, against the brute full-scan control
  * (`geo_knn_points`'s plan shape).
  *
  * The design rule this demonstrates for 100 TB: the GRID PITCH TRACKS
  * DENSITY. A fixed cell size would grow the (2R+1)² block linearly
  * with the corpus; instead the pitch C shrinks as 1/sqrt(density), so
  * the expected candidates per block — corpus × blockArea/worldArea —
  * is a CONSTANT of the density×area product, and the routed plan's
  * work per probe is O(block) = O(answer) while the brute control pays
  * O(corpus) per probe. Exactness is preserved at any pitch because the
  * certificate bound (R·C)² scales with C: every returned distance must
  * sit inside the block's guaranteed radius, and each probe must return
  * all k rows (the round-18 completeness half).
  *
  * Points are derived deterministically (no RNG) by the Geo family's
  * integer-microdegree multiplicative hash over `spark.range` keys; all
  * distance math is BIGINT.
  *
  *   sbt "runMain graft.tools.GeoScaleDemo [nBase] [scaleUp]"
  *
  * Defaults: nBase = 2.5M, scaleUp = 4 (→ 10M points at the top scale).
  */
object GeoScaleDemo {
  private val R = 8        // neighborhood radius in cells
  private val K = 5        // neighbors per probe
  private val NPROBES = 8

  def main(args: Array[String]): Unit = {
    val nBase = if (args.length > 0) args(0).toLong else 2500000L
    val scaleUp = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // pitch at the base scale: ~446 expected candidates per 17×17 block
    // (2.5M × (17·2e5)² / (3.6e8·1.8e8)); the top scale shrinks it by
    // sqrt(scaleUp) so the block population stays put
    val cBase = 200000L

    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    def latOf(k: org.apache.spark.sql.Column) =
      ((k % 1000003L) * lit(2654435761L)) % 17000000L - 8500000L
    def lonOf(k: org.apache.spark.sql.Column) =
      ((k % 999983L) * lit(2654435761L)) % 36000000L - 18000000L

    val probes = spark.range(1, NPROBES + 1).toDF("pid")
      .select(col("pid"), latOf(col("pid") * 37L).as("plat"),
        lonOf(col("pid") * 37L).as("plon"))
      .localCheckpoint()

    Seq(1, scaleUp).foreach { s =>
      val n = nBase * s
      val c = (cBase / math.sqrt(s.toDouble)).toLong
      val pts = spark.range(1, n + 1).toDF("id")
        .select(col("id"), latOf(col("id")).as("lat"), lonOf(col("id")).as("lon"))
        .localCheckpoint()

      val d2 = (col("lat") - col("plat")) * (col("lat") - col("plat")) +
        (col("lon") - col("plon")) * (col("lon") - col("plon"))
      val w = Window.partitionBy(col("pid")).orderBy(col("d2"), col("id"))

      // brute control: every probe scores the whole corpus
      val (brute, bruteSec) = timed {
        broadcast(probes).crossJoin(pts)
          .withColumn("d2", d2)
          .withColumn("rank", row_number().over(w))
          .where(col("rank") <= K)
          .select(col("pid"), col("rank"), col("id"), col("d2"))
          .collect().sortBy(r => (r.getLong(0), r.getInt(1)))
      }

      // grid-routed: candidates = the probes' (2R+1)² cell blocks only
      val snapped = pts
        .withColumn("glat", expr(s"(lat + 90000000) div $c"))
        .withColumn("glon", expr(s"(lon + 180000000) div $c"))
      val offs = (-R to R).map(o => lit(o.toLong))
      val cand = probes
        .withColumn("dglat", explode(array(offs: _*)))
        .withColumn("dglon", explode(array(offs: _*)))
        .select(col("pid"), col("plat"), col("plon"),
          (expr(s"(plat + 90000000) div $c") + col("dglat")).as("glat"),
          (expr(s"(plon + 180000000) div $c") + col("dglon")).as("glon"))
      val block = snapped.join(broadcast(cand), Seq("glat", "glon"))
      val blockRows = block.count() // the planned-block metric: O(answer)?
      val (routed, routedSec) = timed {
        block
          .withColumn("d2", d2)
          .withColumn("rank", row_number().over(w))
          .where(col("rank") <= K)
          .select(col("pid"), col("rank"), col("id"), col("d2"))
          .collect().sortBy(r => (r.getLong(0), r.getInt(1)))
      }

      // exactness certificate at this pitch: distance bound + completeness
      val bound = R * c * R * c
      val worst = routed.map(_.getLong(3)).max
      require(worst <= bound,
        s"certificate: worst d2 $worst exceeds block bound $bound at n=$n")
      require(routed.length == NPROBES * K,
        s"certificate: ${routed.length} rows for $NPROBES probes at n=$n")
      val equal = routed.map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .sameElements(brute.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))))
      require(equal, s"routed top-$K must equal the brute control at n=$n")

      println(f"""{"n":$n,"cell":$c,"block_rows":$blockRows,""" +
        f""""block_frac":${blockRows.toDouble / (n.toDouble * NPROBES)}%.6f,""" +
        f""""brute_sec":$bruteSec%.2f,"routed_sec":$routedSec%.2f,""" +
        f""""exact":$equal,"worst_d2":$worst,"bound":$bound}""")
    }
    spark.stop()
  }
}
