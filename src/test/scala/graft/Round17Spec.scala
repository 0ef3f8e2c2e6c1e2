package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftBloomSidecars, GraftMaintenance, GraftManifest}

/** Round-17 gate: PROBE-TRIGGERED index compaction (VERDICT r16 next #2 —
  * retiring the "cold contains-probe on an UNCOMPACTED table" residual).
  * A contains probe whose skip pass pays >= the table's
  * `compactIndex.autoProbeLoads` per-file sidecar fetches arms ONE
  * incremental bundle sweep, so the first big cold probe is the LAST one
  * that pays O(candidate files) round trips. Under the threshold — and
  * at `0` — the read path never commits anything. */
class Round17Spec extends AnyFunSuite {
  import TestSpark._

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  /** Same fixture as Round16bSpec: wide-alphabet 64-char strings whose
    * 4-gram filters all externalize to per-file sidecars. */
  private def writeFixture(dir: String, files: Int = 8): Unit =
    spark.range(0, 1000)
      .selectExpr("id", "base64(unbase64(left(base64(" +
        "concat(sha2(cast(id as string), 256), sha2(cast(id*31+1 as string), 256))" +
        "), 64))) as s")
      .repartition(files)
      .write.format("graft-sink").option("path", dir)
      .option("ngramBloomFor", "s:4")
      .option("distributionMode", "none").mode("overwrite").save()

  private def inAlphabetWindow(dir: String): String =
    spark.read.format("graft-sink").option("path", dir).load()
      .where(col("id") === 7L).select("s").head().getString(0)
      .substring(10, 18)

  private def containsProbe(dir: String, window: String): DataFrame =
    spark.read.format("graft-sink").option("path", dir).load()
      .where(col("s").contains(window))

  test("auto-compaction: a small table never churns versions from a probe") {
    GraftMaintenance.autoProbeEnabled = true
    val dir = tmp("graft_r17_small")
    writeFixture(dir, files = 4)
    val window = inAlphabetWindow(dir)
    GraftBloomSidecars.dropCache()
    containsProbe(dir, window).collect()
    containsProbe(dir, window).collect()
    assert(GraftManifest.versions(dir).size == 1,
      "4 sidecar fetches sit under the 64-load default threshold: the " +
        "read path must not have committed anything")
    assert(GraftManifest.readVersion(dir, None).get.metas.forall(m =>
      GraftBloomSidecars.splitRef(m.ngblooms(1)._2.drop(1))._2.isEmpty),
      "refs must still be per-file (no sweep ran)")
  }

  test("auto-compaction: past the table's threshold the first cold probe " +
      "is the last per-file one") {
    GraftMaintenance.autoProbeEnabled = true
    val root = tmp("graft_r17_auto")
    spark.conf.set("spark.sql.catalog.g17a",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.g17a.root", root)
    val dir = s"$root/db/t"
    writeFixture(dir, files = 8)
    spark.sql("ALTER TABLE g17a.db.t SET TBLPROPERTIES " +
      "('compactIndex.autoProbeLoads'='4')")
    val window = inAlphabetWindow(dir)
    val vsBefore = GraftManifest.versions(dir).size

    // FIRST cold probe: pays one fetch per candidate file AND arms the
    // sweep — a COMPACT-INDEX version lands synchronously
    GraftBloomSidecars.dropCache()
    val expect = containsProbe(dir, window).collect().map(_.getLong(0)).sorted
    assert(expect.nonEmpty, "fixture: the in-alphabet window must match")
    val vs = GraftManifest.versions(dir)
    assert(vs.size == vsBefore + 1,
      s"the triggering probe must land exactly one sweep commit: $vs")
    assert(GraftManifest.headerFacts(dir, vs.max).op.contains("COMPACT-INDEX"))
    assert(GraftManifest.readVersion(dir, None).get.metas.forall(m =>
      GraftBloomSidecars.splitRef(m.ngblooms(1)._2.drop(1))._2.isDefined),
      "every ref must now be a RANGED bundle ref")

    // SECOND cold probe: O(bundles) loads, same rows, no further commit
    GraftBloomSidecars.dropCache()
    val l0 = GraftBloomSidecars.loads.sum()
    val got = containsProbe(dir, window).collect().map(_.getLong(0)).sorted
    val bundledLoads = GraftBloomSidecars.loads.sum() - l0
    assert(got.sameElements(expect), "the bundled probe answers identically")
    assert(bundledLoads >= 1 && bundledLoads < 8,
      s"the second cold probe must pay O(bundles), not O(files): $bundledLoads")
    assert(GraftManifest.versions(dir).size == vsBefore + 1,
      "the sweep must not re-trigger once everything is bundled")
  }

  test("ranged bundle mode answers identically, pays per-ref reads, degrades") {
    val dir = tmp("graft_r17_ranged")
    writeFixture(dir, files = 8)
    val window = inAlphabetWindow(dir)
    GraftBloomSidecars.dropCache()
    val expect = containsProbe(dir, window).collect().map(_.getLong(0)).sorted
    val (pays, bundles, _) = GraftMaintenance.compactIndexes(dir)
    assert(pays == 8 && bundles == 1, s"fixture wants one bundle: $pays/$bundles")
    try {
      GraftBloomSidecars.bundleFetchMode = "ranged"
      GraftBloomSidecars.dropCache()
      val l0 = GraftBloomSidecars.loads.sum()
      val got = containsProbe(dir, window).collect().map(_.getLong(0)).sorted
      assert(got.sameElements(expect), "ranged mode must answer identically")
      assert(GraftBloomSidecars.loads.sum() - l0 >= 8,
        "ranged mode pays one positional read per candidate ref")
      // TRUNCATE the bundle: ranged reads past the cut shape-check and
      // degrade to keep-everything, never throw
      val bundle = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".idb")).head
      val bytes = java.nio.file.Files.readAllBytes(bundle.toPath)
      java.nio.file.Files.write(bundle.toPath, bytes.take(bytes.length / 3))
      GraftBloomSidecars.dropCache()
      val got2 = containsProbe(dir, window).collect().map(_.getLong(0)).sorted
      assert(got2.sameElements(expect),
        "a truncated bundle must still answer exactly in ranged mode")
    } finally GraftBloomSidecars.bundleFetchMode = "slurp"
  }

  test("auto-compaction: autoProbeLoads=0 disables the trigger") {
    GraftMaintenance.autoProbeEnabled = true
    val root = tmp("graft_r17_off")
    spark.conf.set("spark.sql.catalog.g17o",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.g17o.root", root)
    val dir = s"$root/db/t"
    writeFixture(dir, files = 8)
    spark.sql("ALTER TABLE g17o.db.t SET TBLPROPERTIES " +
      "('compactIndex.autoProbeLoads'='0')")
    val window = inAlphabetWindow(dir)
    val vsBefore = GraftManifest.versions(dir).size
    GraftBloomSidecars.dropCache()
    containsProbe(dir, window).collect()
    assert(GraftManifest.versions(dir).size == vsBefore,
      "a 0 threshold must disable the probe trigger entirely")
  }
}
