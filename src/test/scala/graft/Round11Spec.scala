package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftFormat, GraftManifest}

/** Round-11 grammar/mechanism corners the driver oracle cannot see:
  * percent-escaped stats payloads, free-text stat withholding, batch
  * upsert-by-key (equality deletes outside the streaming key), and
  * pending-transaction manifest visibility. */
class Round11Spec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("escStat/unescStat roundtrip is exact and identity on clean text") {
    val clean = Seq("", "plain", "under_score", "0.25", "a b c")
    clean.foreach(s => assert(GraftManifest.escStat(s) eq s)) // no copy
    val dirty = Seq("a,b", "100%", "line\nbreak", "cr\rlf", "%2C literal",
      ",%,\n\r,", "tra,il,ing%")
    (clean ++ dirty).foreach { s =>
      val e = GraftManifest.escStat(s)
      assert(!e.contains(',') && !e.contains('\n') && !e.contains('\r'))
      assert(GraftManifest.unescStat(e) == s, s"roundtrip of '$s'")
    }
  }

  test("free-text stats withheld past 64 chars; commas survive parquet cells") {
    val dir = java.nio.file.Files.createTempDirectory("graft_r11_text").toString
    val rows = Seq(
      (1L, "short,with,commas", "x" * 100 + ",tail"),
      (2L, "also short", "y" * 80))
    import spark.implicits._
    rows.toDF("id", "code", "prose").coalesce(1)
      .write.format("graft-sink").option("path", dir).mode("overwrite").save()
    val head = GraftManifest.readVersion(dir, None).get
    assert(head.format.contains(GraftFormat.Parquet))
    val m = head.metas.head
    assert(m.stats.contains(0) && m.stats.contains(1) && !m.stats.contains(2),
      s"short strings keep exact stats, prose withheld: ${m.stats.keySet}")
    assert(m.stats(1) == (("also short", "short,with,commas")))
    val back = spark.read.format("graft-sink").option("path", dir).load()
      .orderBy("id").collect()
    assert(back.map(_.getString(1)).toSeq == rows.map(_._2))
    assert(back.map(_.getString(2)).toSeq == rows.map(_._3))
  }

  test("batch upsertKey: appends + equality delete, OPTIMIZE materializes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_r11_ups").toString
    import spark.implicits._
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v").coalesce(1)
      .write.format("graft-sink").option("path", dir).mode("overwrite").save()
    // upsert: key 2 changes, key 4 inserts — target never read
    Seq((2L, "B2"), (4L, "d")).toDF("k", "v").coalesce(1)
      .write.format("graft-sink").option("path", dir)
      .option("upsertKey", "k").mode("append").save()
    val v2 = GraftManifest.readVersion(dir, None).get
    assert(v2.eqDels.nonEmpty && v2.eqDels.forall(_.col == "k"))
    assert(v2.metas.forall(_.dv.isEmpty), "no DV, no rewrite")
    def state(): Map[Long, String] = spark.read.format("graft-sink")
      .option("path", dir).load().collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(state() == Map(1L -> "a", 2L -> "B2", 3L -> "c", 4L -> "d"))
    // count(*) must NOT answer from the (upper-bound) manifest total
    assert(spark.read.format("graft-sink").option("path", dir).load().count() == 4L)
    // a second upsert overrides the first for the same key
    Seq((2L, "B3")).toDF("k", "v").coalesce(1)
      .write.format("graft-sink").option("path", dir)
      .option("upsertKey", "k").mode("append").save()
    assert(state()(2L) == "B3")
    // OPTIMIZE (conditioned full rewrite) retires every pending entry
    val headV = GraftManifest.versions(dir).last
    spark.read.format("graft-sink").option("path", dir).load()
      .write.format("graft-sink").option("path", dir)
      .option("expectedBaseVersion", headV.toString)
      .option("operation", "OPTIMIZE").mode("overwrite").save()
    val after = GraftManifest.readVersion(dir, None).get
    assert(after.eqDels.isEmpty, s"materialize must retire entries: ${after.eqDels}")
    assert(state() == Map(1L -> "a", 2L -> "B3", 3L -> "c", 4L -> "d"))
  }

  test("pending-txn manifests are invisible until their marker exists") {
    val dir = java.nio.file.Files.createTempDirectory("graft_r11_txn").toString
    import spark.implicits._
    Seq((1L, 10L)).toDF("k", "n").coalesce(1)
      .write.format("graft-sink").option("path", dir).mode("overwrite").save()
    assert(GraftManifest.versions(dir) == Seq(1))
    // stage + publish through the txn path (single table: the degenerate
    // transaction — same invisibility machinery)
    Seq((2L, 20L)).toDF("k", "n").coalesce(1)
      .write.format("graft-sink").option("path", dir)
      .option("wapStage", "t1").mode("append").save()
    val marker = java.nio.file.Paths.get(dir, "_txncommit-t1")
    val vs = GraftManifest.txnPublish(Seq(dir -> "t1"), marker)
    assert(vs == Seq(2) && java.nio.file.Files.exists(marker))
    assert(GraftManifest.versions(dir) == Seq(1, 2))
    assert(spark.read.format("graft-sink").option("path", dir).load().count() == 2L)
    // forge an orphan pending claim (crashed claimer): invisible, and the
    // next committer fails fast while it is fresh
    val body = "#txnpending=" + dir + "/_txncommit-never\n#schema=k BIGINT,n BIGINT\n_total,0"
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "_manifest-v3"),
      body.getBytes("UTF-8"))
    assert(GraftManifest.versions(dir) == Seq(1, 2), "pending claim invisible")
    val e = intercept[Exception] {
      Seq((3L, 30L)).toDF("k", "n").coalesce(1)
        .write.format("graft-sink").option("path", dir).mode("append").save()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("pending multi-table transaction")), e.toString)
  }
}
