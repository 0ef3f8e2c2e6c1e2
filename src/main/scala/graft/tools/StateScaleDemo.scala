package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger}

/** STATE-AT-SCALE measurement for the stateful-streaming path (VERDICT r5
  * item 5): [[graft.ops.Streaming.streamStatefulCount]]'s processor design
  * (one ValueState[UserState] row per key via `transformWithState`) driven
  * to a key cardinality far past what comfortably lives as JVM objects —
  * default 10 M distinct keys — under the RocksDB state store provider,
  * the store built for exactly that regime (off-heap, SST-backed,
  * changelog-checkpointed).
  *
  * Two AvailableNow runs share one checkpoint:
  *  - run 1 BUILDS the state: N rows / K keys stream from generated
  *    parquet, every key writes its first state row;
  *  - run 2 UPDATES every key from a second batch — each input row now
  *    pays a state READ at full cardinality plus the write, the
  *    steady-state cost a live deployment lives in. A restored run also
  *    proves the checkpoint round-trips the full key space.
  *
  * The shuffle width (default 8) fixes RocksDB instances at 8 stores of
  * K/8 keys each; a cluster sizes width to cardinality the same way.
  * Usage: runMain graft.tools.StateScaleDemo [nKeys] [rowsPerRun] [width]
  * Prints one summary line per run; numbers recorded in DECISIONS.md. */
object StateScaleDemo {
  def main(args: Array[String]): Unit = {
    val nKeys = args.headOption.map(_.toLong).getOrElse(10L * 1000 * 1000)
    val nRows = args.lift(1).map(_.toLong).getOrElse(nKeys) // 1 row/key/run
    val width = args.lift(2).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", width)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val root = graft.util.Scratch.dir("statescale", s"k$nKeys")
    val srcDir = s"$root/src"
    val chk = s"$root/chk"

    // one batch of input = one parquet drop into the watched dir
    def writeBatch(batch: Int): Unit =
      spark.range(nRows)
        .select((col("id") + batch * nRows).as("event_id"),
          (col("id") % nKeys).as("user_id"),
          (col("id") % 100).as("cents"))
        .repartition(32)
        .write.mode("append").parquet(srcDir)

    def run(label: String): Unit = {
      val t0 = System.nanoTime()
      var rows = 0L
      val q = spark.readStream
        .schema("event_id LONG, user_id LONG, cents LONG")
        .parquet(srcDir)
        .as[graft.ops.Streaming.SEvent]
        .groupByKey(_.user_id)
        .transformWithState(new graft.ops.Streaming.UserRunningAgg,
          TimeMode.None(), OutputMode.Update())
        .toDF()
        .writeStream.outputMode(OutputMode.Update())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          rows += b.count()
        }
        .option("checkpointLocation", chk)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"run":"$label","n_keys":$nKeys,"rows_in":$nRows,""" +
        f""""rows_out":$rows,"width":$width,"sec":$sec%.1f,""" +
        f""""rows_per_sec":${(nRows / sec).toLong}}""")
    }

    writeBatch(0)
    run("build")   // every key's first write
    writeBatch(1)
    run("update")  // read-modify-write at full cardinality

    // ORDERED teardown (round-7 fix for the r6 SIGSEGV in
    // rocksdb::LoggerJniCallback::Logv): at the default teardown,
    // SparkContext shutdown races the state-store MAINTENANCE thread's
    // provider unload — RocksDB can emit a native log line through the
    // JNI callback after the Java side of the logger is gone, and the
    // callback segfaults the JVM. StateStore.stop() first halts the
    // maintenance task, THEN closes every loaded provider (and its
    // RocksDB + native logger) under the loadedProviders lock, so by the
    // time spark.stop() tears the context down no native RocksDB thread
    // is left to call back. This is the same teardown discipline a
    // production streaming host needs on executor decommission.
    org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    spark.stop()
    println(s"""{"run":"teardown","clean_exit":true,"n_keys":$nKeys}""")
  }
}
