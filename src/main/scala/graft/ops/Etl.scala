package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.util.Tables._
import graft.util.Determinism._

/** SURVEY.md §2.I — the ETL-pipeline operators that are the reference's
  * declared identity (/root/reference/README.md:1: a telecom data ETL
  * pipeline on AWS; no code exists in its tree — semantics per SURVEY §2).
  *
  * Patterns chosen for 100 TB: dedup and upsert are window-survivor
  * formulations (single shuffle on the key, no driver-side state); conform
  * joins broadcast the tiny dims; data-quality checks are unions of scalar
  * aggregates (one pass per table, no collect); sessionization is the classic
  * two-window composition (one shuffle on user_id).
  */
object Etl {

  /** Exact dedup with a deterministic survivor (never bare dropDuplicates —
    * rule D2): duplicates injected by re-unioning every 5th event. */
  def etlDedupExact(spark: SparkSession, sf: String): DataFrame = {
    val ev = events(spark, sf)
    val dup = ev.unionByName(ev.where(col("event_id") % 5 === 0))
    val w = Window.partitionBy(col("event_id")).orderBy(col("ts").asc)
    dup.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("event_id"), col("user_id"), col("event_type"),
        epochS(col("ts")).as("ts_epoch"))
      .orderBy(col("event_id"))
  }

  /** Standardize/enrich: trim+case-fold names, FK→dimension names via
    * broadcast joins, defaulted segment, account-balance banding. */
  def etlConform(spark: SparkSession, sf: String): DataFrame =
    customer(spark, sf)
      .join(broadcast(nation(spark, sf)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(spark, sf)), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"),
        upper(trim(col("c_name"))).as("name_std"),
        col("n_name"), col("r_name"),
        coalesce(nullif(col("c_mktsegment"), lit("")), lit("UNKNOWN")).as("segment"),
        when(col("c_acctbal") < 0, "NEG")
          .when(col("c_acctbal") < 5000.0, "LOW")
          .otherwise("HIGH").as("bal_band"))
      .orderBy(col("c_custkey"))

  /** Data-quality metric rowset: null counts, domain violations, orphan FKs,
    * derived-column consistency. All domain checks on one table are computed
    * in a SINGLE scan (conditional counts in one aggregate, then stacked to
    * rows) — at 100 TB a DQ suite that re-scans the fact table per metric is
    * the difference between one pass and N. Orphan checks stay anti-joins. */
  def etlValidateDq(spark: SparkSession, sf: String): DataFrame = {
    def metric(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("value")).select(lit(name).as("metric"), col("value"))
    val li = lineitem(spark, sf)
    val o  = orders(spark, sf)
    val c  = customer(spark, sf)
    val ev = events(spark, sf)
    val d  = documents(spark, sf)
    // one lineitem scan → two metrics
    val liChecks = li.agg(
        count(when(col("l_discount") < 0 || col("l_discount") > 1, lit(1)))
          .as("oob"),
        count(when(col("l_quantity") <= 0, lit(1))).as("negq"))
      .select(expr(
        "stack(2, 'lineitem_discount_oob', oob, 'lineitem_negative_qty', negq) AS (metric, value)"))
    metric("customer_null_nationkey", c.where(col("c_nationkey").isNull))
      .unionByName(liChecks)
      .unionByName(metric("lineitem_orphan_order",
        li.join(o, col("l_orderkey") === col("o_orderkey"), "left_anti")))
      .unionByName(metric("orders_orphan_customer",
        o.join(c, col("o_custkey") === col("c_custkey"), "left_anti")))
      .unionByName(metric("events_malformed_props",
        ev.where(get_json_object(col("props"), "$.k").isNull)))
      .unionByName(metric("documents_nchars_mismatch",
        d.where(col("n_chars") =!= length(col("text")))))
      .orderBy(col("metric"))
  }

  /** SCD-0 last-writer-wins upsert: window-survivor over base ∪ updates keyed
    * by o_orderkey (scale path: one shuffle, no MERGE state). Prices are
    * computed at scale 4 — a 2-digit re-round of price*1.1 would tie-break
    * differently across engines — and leave the query as DOUBLE (D1b).
    * Updates hit keys ≡1 (mod 4), a strict subset of the odd-key base, so
    * every update CONFLICTS with a base row and the src-ordered survivor
    * window genuinely resolves last-writer-wins. */
  def etlMergeUpsert(spark: SparkSession, sf: String): DataFrame = {
    val o = orders(spark, sf)
    val base = o.where(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey"), col("o_orderstatus").as("status"),
        dec(col("o_totalprice"), 18, 4).as("price"), lit(0).as("src"))
    val upd = o.where(col("o_orderkey") % 4 === 1)
      .select(col("o_orderkey"), lit("U").as("status"),
        (dec2(col("o_totalprice")) * lit(new java.math.BigDecimal("1.10")))
          .cast(DecimalType(18, 4)).as("price"), lit(1).as("src"))
    val w = Window.partitionBy(col("o_orderkey")).orderBy(col("src").desc)
    base.unionByName(upd)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("o_orderkey"), col("status"), col("price").cast("double").as("price"),
        col("src"))
      .orderBy(col("o_orderkey"))
  }

  /** Pivot with the value list given explicitly (deterministic columns, no
    * extra distinct job — the 100 TB rule for pivots). */
  def etlPivot(spark: SparkSession, sf: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val p = events(spark, sf)
      .groupBy(col("user_id")).pivot("event_type", types).count()
    p.select(col("user_id") +:
        types.map(t => coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
      .orderBy(col("user_id"))
  }

  /** Melt wide measures to long (UDTF-shaped; Spark's native unpivot). */
  def etlUnpivot(spark: SparkSession, sf: String): DataFrame =
    lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        "measure", "value")
      // (l_orderkey, l_linenumber) is NOT unique in the fixtures — `value`
      // completes the total order (rule D2); remaining ties are full-row
      // duplicates, which hash identically in any order.
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("measure"), col("value"))

  /** Batch sessionization, 30-min inactivity gap: lag → boundary flag →
    * running sum = session ordinal (two windows, one shuffle on user_id). */
  /** Shared session-ordinal derivation (30-min inactivity boundary over
    * the per-user (ts, event_id) order) — the block [[etlSessionize]] and
    * [[etlFunnel]] both aggregate over; extracted round 17 (the recorded
    * ETL-review duplication), behavior pinned by both keys' oracles. */
  private def withSessionOrd(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev
      .withColumn("es", epochS(col("ts")))
      .withColumn("prev_es", lag(col("es"), 1).over(w))
      .withColumn("boundary",
        when(col("prev_es").isNull || col("es") - col("prev_es") > 1800, 1).otherwise(0))
      .withColumn("session_ord", sum(col("boundary")).over(wRun))
  }

  def etlSessionize(spark: SparkSession, sf: String): DataFrame = {
    withSessionOrd(events(spark, sf))
      .groupBy(col("user_id"), col("session_ord"))
      .agg(count(lit(1)).as("n_events"),
        min(col("es")).as("first_epoch"), max(col("es")).as("last_epoch"),
        (max(col("es")) - min(col("es"))).as("duration_s"))
      .orderBy(col("user_id"), col("session_ord"))
  }

  /** CDC LOG COMPACTION — collapse a change stream to its LATEST row per
    * key, the materialization step every CDC-fed table runs (Debezium →
    * bronze → compacted silver): one shuffle on the key, row_number over
    * (ts DESC, event_id DESC) for a total order under equal timestamps,
    * keep rn = 1. Differs from dedup (rows aren't equal — later versions
    * WIN) and from top-k (k = 1 with a recency order, not a measure). At
    * 100 TB the same plan compacts each ingest batch; pre-bucketing the
    * silver table on the key makes the recurring shuffle a local sort. */
  def etlCdcCompact(spark: SparkSession, sf: String): DataFrame =
    cdcCompactOf(events(spark, sf), Seq("user_id", "event_type"),
      Seq(col("ts").desc, col("event_id").desc))
      .select(col("user_id"), col("event_type"),
        col("event_id").as("last_event_id"),
        unix_micros(col("ts")).as("ts_us"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .orderBy(col("user_id"), col("event_type"))

  /** Frame-generic keep-latest kernel (api.Graft: `cdcCompact`): one row
    * per key — the first under `ordering` — with all columns preserved.
    * The rank column name is generated collision-free against the caller's
    * frame (ADVICE r5: a hardcoded "__rn" silently clobbered a caller
    * column of that name). */
  private[graft] def cdcCompactOf(df: DataFrame, keyCols: Seq[String],
      ordering: Seq[Column]): DataFrame = {
    val rn = Iterator.from(0).map(i => s"__rn$i")
      .find(n => !df.columns.contains(n)).get
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ordering: _*)
    df.withColumn(rn, row_number().over(w))
      .where(col(rn) === 1).drop(rn)
  }

  /** GDPR-STYLE CASCADING ERASURE AUDIT — the compliance pass every data
    * estate needs: given an erasure-request set (here the deterministic
    * c_custkey % 97 = 0 cohort), count what a right-to-be-forgotten sweep
    * removes and keeps in each table it cascades through: customers
    * directly, their orders via custkey, those orders' lineitems via
    * orderkey. One pass per table — the erasure set broadcasts (requests
    * are always tiny next to the estate), each fact row left-joins it and
    * flags, then a single sum(flag) aggregate audits removed/kept; the
    * lineitem cascade rides the estate's natural orders⋈lineitem join. At
    * 100 TB the same plan does the actual delete: the kept side IS the
    * anti-join rewrite of each table. */
  def etlGdprErasure(spark: SparkSession, sf: String): DataFrame = {
    val erased = customer(spark, sf)
      .where(col("c_custkey") % 97 === 0)
      .select(col("c_custkey").as("ek"))
    def audit(table: String, df: DataFrame, key: Column): DataFrame =
      df.join(broadcast(erased), key === col("ek"), "left")
        .agg(sum(col("ek").isNotNull.cast("long")).as("n_removed"),
          sum(col("ek").isNull.cast("long")).as("n_kept"))
        .select(lit(table).as("table_name"), col("n_removed"), col("n_kept"))
    val erasedOrders = orders(spark, sf)
      .join(broadcast(erased), col("o_custkey") === col("ek"))
      .select(col("o_orderkey").as("eok"))
    val li = lineitem(spark, sf)
      .join(erasedOrders, col("l_orderkey") === col("eok"), "left")
      .agg(sum(col("eok").isNotNull.cast("long")).as("n_removed"),
        sum(col("eok").isNull.cast("long")).as("n_kept"))
      .select(lit("lineitem").as("table_name"), col("n_removed"), col("n_kept"))
    audit("customer", customer(spark, sf), col("c_custkey"))
      .unionAll(audit("orders", orders(spark, sf), col("o_custkey")))
      .unionAll(li)
      .orderBy(col("table_name"))
  }

  /** NATIVE session windows — the same 30-minute-gap sessions as
    * [[etlSessionize]], but through Spark's `session_window` GROUPING
    * OPERATOR instead of the lag/cumsum window pipeline: one
    * `groupBy(session_window(ts, gap), user)` and the engine's
    * UpdatingSessions machinery merges rows into variable-length
    * [start, end) sessions (end = last event + gap; an event landing
    * exactly at `end` starts a NEW session — `>=` gap semantics, one
    * event stricter than sessionize's `>`). This is the formulation that
    * carries to Structured Streaming unchanged, and in batch it needs NO
    * window function — just a shuffle on user + in-partition merge.
    * Timestamps are microsecond-grained, so the oracle re-derives the
    * same sessions at `epoch_us` precision. */
  def etlSessionWindow(spark: SparkSession, sf: String): DataFrame =
    events(spark, sf)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100 + 0.5).cast("long")).as("sum_cents"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("s_us"),
        unix_micros(col("session_window.end")).as("e_us"),
        col("n_events"), col("sum_cents"))
      .orderBy(col("user_id"), col("s_us"))

  /** Incremental aggregation: a base aggregate merged with a delta-partition
    * aggregate by re-aggregating the partials (sum-of-sums, sum-of-counts) —
    * the algebra every incremental pipeline leans on. The oracle is the
    * full recompute, proving merge ≡ recompute. */
  def etlIncrementalAgg(spark: SparkSession, sf: String): DataFrame = {
    val ev = events(spark, sf)
    def partial(df: DataFrame): DataFrame =
      df.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(dec2(col("value"))).as("s"))
    val base  = partial(ev.where(col("ts") < lit("2024-01-15").cast("timestamp")))
    val delta = partial(ev.where(col("ts") >= lit("2024-01-15").cast("timestamp")))
    base.unionByName(delta)
      .groupBy(col("event_type"))
      .agg(sum(col("n")).as("n"), sum(col("s")).cast("double").as("sum_val"))
      .orderBy(col("event_type"))
  }

  /** Session conversion funnel: per user, sessions (30-min gaps) where a
    * click is later followed by a purchase in the same session. Integer/
    * epoch logic end to end. */
  def etlFunnel(spark: SparkSession, sf: String): DataFrame = {
    val sessions = withSessionOrd(events(spark, sf))
      .groupBy(col("user_id"), col("session_ord"))
      .agg(
        min(when(col("event_type") === "click", col("es"))).as("first_click"),
        max(when(col("event_type") === "purchase", col("es"))).as("last_purchase"))
    sessions
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        count(when(col("first_click").isNotNull && col("last_purchase").isNotNull &&
          col("first_click") < col("last_purchase"), lit(1))).as("n_converted"))
      .orderBy(col("user_id"))
  }

  /** CDC snapshot diff: compare two dimension snapshots by key and classify
    * every difference as insert / delete / update — the change feed a
    * downstream incremental pipeline consumes. Single full-outer join on
    * the key; decimal compares are exact. Snapshots are synthesized from
    * orders: "new" drops every 5th key, reprices every 3rd, adds some
    * even keys. */
  def etlCdcDiff(spark: SparkSession, sf: String): DataFrame = {
    val o = orders(spark, sf)
    val old = o.where(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey").as("k_old"),
        dec(col("o_totalprice"), 18, 4).as("old_price"))
    val neu = o.where(col("o_orderkey") % 2 === 1 && !(col("o_orderkey") % 5 === 0))
      .select(col("o_orderkey").as("k_new"),
        when(col("o_orderkey") % 3 === 0,
          (dec2(col("o_totalprice")) * lit(new java.math.BigDecimal("1.05")))
            .cast(DecimalType(18, 4)))
          .otherwise(dec(col("o_totalprice"), 18, 4)).as("new_price"))
      .unionByName(o.where(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey").as("k_new"),
          dec(col("o_totalprice"), 18, 4).as("new_price")))
    old.join(neu, col("k_old") === col("k_new"), "full")
      .withColumn("change",
        when(col("k_old").isNull, "insert")
          .when(col("k_new").isNull, "delete")
          .when(col("old_price") =!= col("new_price"), "update")
          .otherwise("unchanged"))
      .where(col("change") =!= "unchanged")
      .select(coalesce(col("k_old"), col("k_new")).as("k"), col("change"),
        col("old_price").cast("double").as("old_price"),
        col("new_price").cast("double").as("new_price"))
      .orderBy(col("k"))
  }

  /** Deterministic ~12.5% sample: first hex digit of md5(key) ∈ {0,1}.
    * Hash-based sampling (never rand()) is the reproducible-pipeline
    * pattern: stable across runs, engines, and partitionings, and it
    * samples the SAME keys when a table is re-processed incrementally. */
  def etlSampleHash(spark: SparkSession, sf: String): DataFrame =
    orders(spark, sf)
      .where(substring(md5(col("o_orderkey").cast("string")), 1, 1).isin("0", "1"))
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice").as("price"))
      .orderBy(col("o_orderkey"))

  /** Deterministic TRAIN/VAL/TEST split — the dataset-versioning op every
    * training pipeline runs before anything else. Assignment is the first
    * hex digit of md5(doc_id ':' text): 0–b → train (12/16), c–d → val,
    * e–f → test. Salting the key with the content means re-ingesting the
    * same doc lands in the same split forever (reproducible evals), and a
    * pure per-row projection splits 100 TB at scan speed with no shuffle
    * but the presentation sort. */
  def etlSplitTrainEval(spark: SparkSession, sf: String): DataFrame =
    documents(spark, sf)
      .withColumn("h", substring(
        md5(concat(col("doc_id").cast("string"), lit(":"), col("text"))), 1, 1))
      .withColumn("split",
        when(col("h") < "c", "train").when(col("h") < "e", "val")
          .otherwise("test"))
      .select(col("doc_id"), col("h"), col("split"))
      .orderBy(col("doc_id"))

  /** Column PROFILING (the data-quality first-look over a new table):
    * row/null/distinct counts + min/max rendered as strings, one output row
    * per profiled column. Each profile is one full-table aggregate —
    * map-side partial aggregation, no shuffle wider than one row — and the
    * per-column frames are unioned, so a 100 TB profile is k scans (or one,
    * if a consumer fuses them; the surface keeps them separate so column
    * sets compose). Timestamp/double columns are excluded: their string
    * renderings are engine-specific. */
  def etlProfile(spark: SparkSession, sf: String): DataFrame = {
    val o = orders(spark, sf)
    def prof(c: String): DataFrame =
      o.agg(count(lit(1)).as("n_rows"),
          sum(col(c).isNull.cast("long")).as("n_null"),
          countDistinct(col(c)).as("n_distinct"),
          min(col(c)).cast("string").as("min_str"),
          max(col(c)).cast("string").as("max_str"))
        .select(lit(c).as("column_name"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_str"), col("max_str"))
    Seq("o_custkey", "o_orderkey", "o_orderpriority", "o_orderstatus")
      .map(prof).reduce(_.unionByName(_))
      .orderBy(col("column_name"))
  }

  /** SCD2 dimension frame (unordered) — shared by the snapshot query and
    * the as-of lookup join. */
  private def scd2Frame(spark: SparkSession, sf: String): DataFrame = {
    val yearly = orders(spark, sf)
      .groupBy(col("o_custkey"), year(col("o_orderdate").cast("date")).as("yr"))
      .agg(sum(dec2(col("o_totalprice"))).cast(Out38_2).as("spend"))
      .select(col("o_custkey"), col("yr"),
        when(col("spend") < 400000, "S").when(col("spend") < 1200000, "M")
          .otherwise("L").as("band"))
    val wY = Window.partitionBy(col("o_custkey")).orderBy(col("yr").asc)
    val changes = yearly
      .withColumn("prev_band", lag(col("band"), 1, "__none__").over(wY))
      .where(col("band") =!= col("prev_band"))
    val wC = Window.partitionBy(col("o_custkey")).orderBy(col("yr").asc)
    changes
      .withColumn("valid_to", lead(col("yr"), 1).over(wC) - 1)
      .select(col("o_custkey"), col("band"), col("yr").as("valid_from"), col("valid_to"))
  }

  /** Effective-dated dimension build (SCD2): yearly spend band per customer,
    * rows emitted only on band change, valid_to closed by lead(). */
  def etlScd2Snapshot(spark: SparkSession, sf: String): DataFrame =
    scd2Frame(spark, sf).orderBy(col("o_custkey"), col("valid_from"))

  /** As-of dimension lookup: facts join the SCD2 dimension on key +
    * effective-date range (the "late-arriving dimension" resolution every
    * warehouse pipeline needs). Equi key + range residual — hash join, no
    * cartesian. */
  def etlDimLookupAsof(spark: SparkSession, sf: String): DataFrame = {
    val facts = orders(spark, sf)
      .select(col("o_custkey").as("f_cust"),
        year(col("o_orderdate").cast("date")).as("f_yr"),
        col("o_totalprice"))
    val dim = scd2Frame(spark, sf)
    // Audited r19 (VERDICT r18 #8, guide §3): Catalyst ALREADY plans
    // BroadcastHashJoin here — the window-built dim estimates under the
    // broadcast threshold (plans/r19/etl_dim_lookup_asof_before.txt shows
    // BHJ, zero fact-side sort). A broadcast() hint was tried and reverted:
    // it produced the identical plan at every fixture SF, and at 100 TB a
    // FORCED broadcast of an O(customers) SCD2 dim is exactly the
    // too-big-to-broadcast failure the guide warns about — the
    // estimate-driven choice is the scale-safe one.
    facts.join(dim,
        col("f_cust") === col("o_custkey") && col("f_yr") >= col("valid_from") &&
          (col("valid_to").isNull || col("f_yr") <= col("valid_to")))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_orders"), sum2(col("o_totalprice")).as("sum_price"))
      .orderBy(col("band"))
  }

  /** Time-series gap fill + forward fill: a monthly grid per customer
    * (sequence+explode — the distributed dimension generator), left-joined
    * order counts, gaps forward-filled with the engine-portable
    * running-count-of-non-nulls group trick (no IGNORE NULLS dialect
    * divergence). Scale shape: the grid is keys × 36 months generated
    * at the executors, never collected; one shuffle on (custkey). */
  /** Shared monthly observation grid ('95-01..'97-12 x custkey <= 20,
    * left-joined monthly order counts, NULL = missing month) — the frame
    * [[etlGapFill]] fills LOCF and [[etlInterpolateLinear]] fills as
    * exact rationals; extracted round 17 (the recorded ETL-review
    * duplication), behavior pinned by both keys' oracles. */
  private def monthlyGrid(spark: SparkSession, sf: String): DataFrame = {
    val grid = customer(spark, sf).where(col("c_custkey") <= 20)
      .select(col("c_custkey"), explode(expr(
        "sequence(to_date('1995-01-01'), to_date('1997-12-01'), interval 1 month)"))
        .as("month"))
    val m = orders(spark, sf).where(col("o_custkey") <= 20)
      .groupBy(col("o_custkey"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month"))
      .agg(count(lit(1)).as("n"))
    grid.join(m, grid("c_custkey") === m("o_custkey") &&
        grid("month") === m("month"), "left")
      .select(grid("c_custkey"), grid("month"), col("n"))
  }

  def etlGapFill(spark: SparkSession, sf: String): DataFrame = {
    val wRun = Window.partitionBy(col("c_custkey")).orderBy(col("month"))
    monthlyGrid(spark, sf)
      .withColumn("grp", count(col("n")).over(wRun))
      .withColumn("n_filled", coalesce(
        max(col("n")).over(Window.partitionBy(col("c_custkey"), col("grp"))),
        lit(0L)))
      .select(col("c_custkey"), col("month"),
        col("n").isNull.cast("int").as("is_gap"), col("n_filled"))
      .orderBy(col("c_custkey"), col("month"))
  }

  /** Stratified sampling for class balancing (the training-data mix knob):
    * deterministic md5-ordered top-50 per language — never rand(). */
  def etlSampleStratified(spark: SparkSession, sf: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(concat(lit("s:"), col("doc_id").cast("string"))), col("doc_id"))
    documents(spark, sf)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 50)
      .select(col("doc_id"), col("lang"), col("rn"))
      .orderBy(col("lang"), col("rn"))
  }

  /** Query-time METRICS via `Dataset.observe` — Spark's single-pass DQ
    * instrumentation: the accumulator-backed observation rides the SAME
    * scan that produces the business result, so profiling 100 TB costs
    * zero extra reads (vs. [[etlValidateDq]]'s separate metric queries).
    * The observed row (row count, null props, out-of-range values, value
    * cents total) is harvested from the QueryExecutionListener-visible
    * metrics after one action and returned AS the result, making the
    * mechanism itself oracle-checkable against plain aggregate SQL. */
  def etlObserveMetrics(spark: SparkSession, sf: String): DataFrame = {
    import org.apache.spark.sql.Observation
    val obs = Observation("dq")
    val business = events(spark, sf)
      .observe(obs,
        count(lit(1)).as("n_rows"),
        count(when(col("props").isNull, lit(1))).as("null_props"),
        count(when(col("value") < 0, lit(1))).as("neg_value"),
        sum(floor(col("value") * 100).cast("long")).as("sum_cents"))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    business.collect() // one action drives both the result and the metrics
    val m = obs.get
    import spark.implicits._
    Seq((m("n_rows").asInstanceOf[Long], m("null_props").asInstanceOf[Long],
      m("neg_value").asInstanceOf[Long], m("sum_cents").asInstanceOf[Long]))
      .toDF("n_rows", "null_props", "neg_value", "sum_cents")
  }

  /** LINEAR INTERPOLATION of gaps as EXACT RATIONALS — the time-series fill
    * one step past [[etlGapFill]]'s last-observation-carried-forward: a
    * missing month between observations (ia, pa) and (ib, pb) gets value
    * (pa·(ib−i) + pb·(i−ia)) / (ib−ia), emitted as integer numerator +
    * denominator so no engine ever divides. Neighbors come from two
    * IGNORE-NULLS window scans (strictly-preceding / strictly-following
    * frames); leading/trailing edges stay NULL — interpolation must not
    * extrapolate. Same custkey-partitioned single sort as the grid join;
    * at scale the grid is generated per key and the plan is one window
    * pass over it. */
  def etlInterpolateLinear(spark: SparkSession, sf: String): DataFrame = {
    val j = monthlyGrid(spark, sf)
      .withColumn("i", year(col("month")) * 12 + month(col("month")))
    val wp = Window.partitionBy(col("c_custkey")).orderBy(col("i").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wn = Window.partitionBy(col("c_custkey")).orderBy(col("i").asc)
      .rowsBetween(1, Window.unboundedFollowing)
    j
      .withColumn("pa", last(when(col("n").isNotNull, col("n")), true).over(wp))
      .withColumn("ia", last(when(col("n").isNotNull, col("i")), true).over(wp))
      .withColumn("pb", first(when(col("n").isNotNull, col("n")), true).over(wn))
      .withColumn("ib", first(when(col("n").isNotNull, col("i")), true).over(wn))
      .select(col("c_custkey"), col("month"), col("n").as("n_obs"),
        when(col("n").isNotNull, col("n"))
          .when(col("pa").isNotNull && col("pb").isNotNull,
            col("pa") * (col("ib") - col("i")) + col("pb") * (col("i") - col("ia")))
          .as("interp_num"),
        when(col("n").isNotNull, lit(1L))
          .when(col("pa").isNotNull && col("pb").isNotNull,
            (col("ib") - col("ia")).cast("long"))
          .as("interp_den"))
      .orderBy(col("c_custkey"), col("month"))
  }

  /** DATA-MIXTURE sampling — per-source keep RATES (the domain-mixing op a
    * pretraining pipeline runs to hit a target corpus composition: keep all
    * of the curated source, half of src1, a quarter of src2, a trickle of
    * everything else). Selection is a fixed-width md5 hex prefix compared
    * LEXICOGRAPHICALLY against the per-source threshold — fixed-length hex
    * strings order exactly like their numeric value in BOTH engines, so no
    * hex→int conversion is needed anywhere. Deterministic, reproducible,
    * and a pure per-row projection: mixing 100 TB runs at scan speed with
    * map-side partial aggregation for the audit counts. */
  def etlMixSources(spark: SparkSession, sf: String): DataFrame = {
    val thr = when(col("source") === "src0", lit("zz")) // 100%: any hex < "zz"
      .when(col("source") === "src1", lit("80"))        // 128/256
      .when(col("source") === "src2", lit("40"))        // 64/256
      .otherwise(lit("20"))                             // 32/256
    documents(spark, sf)
      .withColumn("kept",
        (substring(md5(col("doc_id").cast("string")), 1, 2) < thr).cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_total"), sum(col("kept")).as("n_kept"))
      .select(col("source"), col("n_total"), col("n_kept"),
        expr("n_kept * 10000 div n_total").as("rate_e4"))
      .orderBy(col("source"))
  }

  /** Row-level DQ routing: rows violating any rule land in quarantine with a
    * composed reason string (concat_ws skips the NULL non-violations on both
    * engines). One pass, no per-rule rescans. */
  def etlQuarantineSplit(spark: SparkSession, sf: String): DataFrame = {
    val r1 = when(col("o_totalprice") > 400000.0, "price_hi")
    val r2 = when(col("o_orderdate").cast("date") > lit("1998-12-31").cast("date"), "date_range")
    val r3 = when(col("o_orderstatus") === "P", "pending_review")
    orders(spark, sf)
      .select(col("o_orderkey"), concat_ws(",", r1, r2, r3).as("reasons"),
        (r1.isNotNull.cast("int") + r2.isNotNull.cast("int") +
          r3.isNotNull.cast("int")).as("n_viol"))
      .where(col("n_viol") > 0)
      .orderBy(col("o_orderkey"))
  }

  /** Statistical DQ anomaly detection over an aggregate series — the
    * "did a partition land twice / is a feed missing" monitor a pipeline
    * runs after every load. Monthly revenue is flagged when |z| > 2, but
    * the z-score is evaluated WITHOUT a float anywhere: (n·x − S)² and
    * z²·(n·Q − S²) are compared in DECIMAL(38,0) (values reach ~1e23 —
    * past BIGINT, nowhere near 38 digits), so the flag is bit-identical
    * on any engine (DuckDB evaluates the same inequality in HUGEINT) and
    * order-independent (D1 taken to the DQ layer). One aggregate pass +
    * a broadcast of the single stats row — no window, no second scan. */
  def etlAnomalyZscore(spark: SparkSession, sf: String): DataFrame = {
    val m = orders(spark, sf)
      .groupBy(to_date(date_trunc("mon", col("o_orderdate"))).as("month"))
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
    val dec = col("cents").cast("decimal(38,0)")
    val stats = m.agg(count(lit(1)).as("n"), sum(col("cents")).as("s"),
      sum(dec * col("cents")).as("q"))
    m.crossJoin(broadcast(stats))
      .select(col("month"), col("cents"),
        ((col("n") * col("cents") - col("s")).cast("decimal(38,0)") *
          (col("n") * col("cents") - col("s")).cast("decimal(38,0)") >
          (col("n").cast("decimal(38,0)") * col("q") -
            col("s").cast("decimal(38,0)") * col("s")) * 4)
          .cast("int").as("is_anomaly"))
      .orderBy(col("month"))
  }

  /** Cohort RETENTION — the events-pipeline analytics staple: users are
    * cohorted by first-activity week, and each later active week counts
    * them at offset k = (week − cohort)/7. One distinct-activity pass +
    * one first-touch aggregate + an equi-join on user_id; the countDistinct
    * dedups users active multiple times in a week. Both engines truncate
    * weeks to Monday, and week-start date arithmetic is exact integer
    * days — no timestamp leaves the plan (D4). */
  def etlRetentionCohort(spark: SparkSession, sf: String): DataFrame = {
    val ev = events(spark, sf)
      .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("wk"))
      .distinct()
    val first = ev.groupBy(col("user_id")).agg(min(col("wk")).as("cohort"))
    first.join(ev, "user_id")
      .select(col("cohort"),
        (datediff(col("wk"), col("cohort")) / 7).cast("int").as("k"),
        col("user_id"))
      .groupBy(col("cohort"), col("k"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort"), col("k"))
  }

  /** URL CANONICALIZATION — the dedup-key normalizer every web-corpus
    * pipeline needs before exact URL dedup (the same page arrives as
    * `HTTPS://WWW.Host:443/p?utm_source=x&id=1#frag` and
    * `https://host/p?id=1`): lowercase scheme+host, strip `www.` and the
    * default port, drop the fragment, drop tracking params (`utm_*`,
    * `ref`), and SORT the surviving query params so param order can't
    * split a dedup group. Deterministic raw URLs are synthesized from
    * orders in-query (both engines build identical input); the Spark side
    * parses with the codegen'd `parse_url` (PROTOCOL/HOST/PATH/QUERY) and
    * filters params with array lambdas — a pure projection, scan-speed at
    * any scale; the oracle re-derives the same pieces with regexes. */
  def etlUrlCanonicalize(spark: SparkSession, sf: String): DataFrame = {
    val url = concat(
      lit("HTTPS://WWW.Shop"), col("o_orderkey") % 10,
      lit(".EXAMPLE.COM:443/item/"), col("o_orderkey"),
      lit("?utm_source=mail&id="), col("o_custkey"),
      lit("&utm_campaign=x&ref=tw&page="), col("o_orderkey") % 5, lit("#top"))
    orders(spark, sf)
      .select(col("o_orderkey").as("url_id"), url.as("url"))
      .select(col("url_id"), canonUrlExpr(col("url")).as("canon_url"),
        urlDroppedExpr(col("url")).as("n_dropped"))
      .orderBy(col("url_id"))
  }

  /** Query params that survive canonicalization (tracking params out).
    * A query-less URL parses to NULL — coalesce to empty so the kernel
    * stays total over arbitrary user URLs. */
  private def urlKeepParams(u: Column): Column =
    filter(
      coalesce(split(parse_url(u, lit("QUERY")), "&"),
        array().cast("array<string>")),
      p => !(startswith(p, lit("utm_")) || startswith(p, lit("ref="))))

  /** The canonical form of a URL as a reusable expression (api.Graft:
    * `canonicalizeUrls`): lowercased scheme+host, `www.` and default port
    * stripped, fragment dropped, tracking params removed, survivors
    * sorted. Total over arbitrary user URLs (ADVICE r5): a scheme-less or
    * host-less input — where parse_url yields NULL and concat would
    * nullify the whole dedup key — passes through unchanged instead, so
    * every row keeps a stable non-null key. */
  private[graft] def canonUrlExpr(u: Column): Column = {
    val proto = parse_url(u, lit("PROTOCOL"))
    val host = parse_url(u, lit("HOST"))
    val keep = array_sort(urlKeepParams(u))
    val canon = concat(
      lower(proto), lit("://"),
      regexp_replace(lower(host), "^www\\.", ""),
      coalesce(parse_url(u, lit("PATH")), lit("")),
      when(size(keep) > 0, concat(lit("?"), array_join(keep, "&")))
        .otherwise(lit("")))
    when(proto.isNull || host.isNull, u).otherwise(canon)
  }

  /** How many params canonicalization dropped. */
  private[graft] def urlDroppedExpr(u: Column): Column =
    (size(coalesce(split(parse_url(u, lit("QUERY")), "&"),
      array().cast("array<string>"))) -
      size(urlKeepParams(u))).cast("int")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "etl_url_canonicalize" -> etlUrlCanonicalize,
    "etl_retention_cohort" -> etlRetentionCohort,
    "etl_anomaly_zscore" -> etlAnomalyZscore,
    "etl_gap_fill" -> etlGapFill,
    "etl_sample_stratified" -> etlSampleStratified,
    "etl_mix_sources" -> etlMixSources,
    "etl_interpolate_linear" -> etlInterpolateLinear,
    "etl_observe_metrics" -> etlObserveMetrics,
    "etl_quarantine_split" -> etlQuarantineSplit,
    "etl_dedup_exact" -> etlDedupExact,
    "etl_conform" -> etlConform,
    "etl_validate_dq" -> etlValidateDq,
    "etl_merge_upsert" -> etlMergeUpsert,
    "etl_pivot" -> etlPivot,
    "etl_unpivot" -> etlUnpivot,
    "etl_incremental_agg" -> etlIncrementalAgg,
    "etl_funnel" -> etlFunnel,
    "etl_cdc_diff" -> etlCdcDiff,
    "etl_sample_hash" -> etlSampleHash,
    "etl_split_train_eval" -> etlSplitTrainEval,
    "etl_profile" -> etlProfile,
    "etl_sessionize" -> etlSessionize,
    "etl_session_window" -> etlSessionWindow,
    "etl_gdpr_erasure" -> etlGdprErasure,
    "etl_cdc_compact" -> etlCdcCompact,
    "etl_scd2_snapshot" -> etlScd2Snapshot,
    "etl_dim_lookup_asof" -> etlDimLookupAsof
  )

  def oracle: Map[String, String] = Map(
    "etl_url_canonicalize" ->
      """WITH u AS (SELECT o_orderkey AS url_id,
        |  'HTTPS://WWW.Shop' || (o_orderkey % 10) || '.EXAMPLE.COM:443/item/'
        |    || o_orderkey || '?utm_source=mail&id=' || o_custkey
        |    || '&utm_campaign=x&ref=tw&page=' || (o_orderkey % 5) || '#top' AS url
        |  FROM orders),
        |p AS (SELECT url_id,
        |  lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS proto,
        |  regexp_replace(lower(regexp_extract(url, '://([^/:?#]+)', 1)),
        |    '^www\.', '') AS host,
        |  regexp_extract(url, '://[^/?#]+(/[^?#]*)', 1) AS path,
        |  list_sort(list_filter(str_split(regexp_extract(url, '\?([^#]*)', 1), '&'),
        |    q -> NOT (starts_with(q, 'utm_') OR starts_with(q, 'ref=')))) AS keep,
        |  len(str_split(regexp_extract(url, '\?([^#]*)', 1), '&')) AS n_all
        |  FROM u)
        |SELECT url_id,
        |  proto || '://' || host || path ||
        |    CASE WHEN len(keep) > 0
        |      THEN '?' || array_to_string(keep, '&') ELSE '' END AS canon_url,
        |  CAST(n_all - len(keep) AS INT) AS n_dropped
        |FROM p ORDER BY url_id""".stripMargin,
    "etl_retention_cohort" ->
      """WITH a AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
        |  FROM events),
        |f AS (SELECT user_id, min(wk) AS cohort FROM a GROUP BY 1)
        |SELECT cohort, CAST((wk - cohort) / 7 AS INT) AS k,
        |       CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
        |FROM f JOIN a ON f.user_id = a.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "etl_anomaly_zscore" ->
      """WITH m AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |         sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS cents
        |  FROM orders GROUP BY 1),
        |st AS (SELECT CAST(count(*) AS HUGEINT) AS n, CAST(sum(cents) AS HUGEINT) AS s,
        |              sum(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT)) AS q FROM m)
        |SELECT month, CAST(cents AS BIGINT) AS cents,
        |  CAST((n*cents - s) * (n*cents - s) > 4 * (n*q - s*s) AS INT) AS is_anomaly
        |FROM m, st ORDER BY month""".stripMargin,

    "etl_gap_fill" ->
      """WITH grid AS (
        |  SELECT c_custkey, CAST(unnest(generate_series(
        |    DATE '1995-01-01', DATE '1997-12-01', INTERVAL 1 MONTH)) AS DATE) AS month
        |  FROM customer WHERE c_custkey <= 20),
        |m AS (
        |  SELECT o_custkey, CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |         count(*) AS n
        |  FROM orders WHERE o_custkey <= 20 GROUP BY 1, 2),
        |j AS (
        |  SELECT g.c_custkey, g.month, m.n FROM grid g
        |  LEFT JOIN m ON m.o_custkey = g.c_custkey AND m.month = g.month),
        |f AS (
        |  SELECT c_custkey, month, n,
        |    count(n) OVER (PARTITION BY c_custkey ORDER BY month) AS grp
        |  FROM j)
        |SELECT c_custkey, month, CAST(n IS NULL AS INT) AS is_gap,
        |  CAST(coalesce(max(n) OVER (PARTITION BY c_custkey, grp), 0) AS BIGINT) AS n_filled
        |FROM f ORDER BY c_custkey, month""".stripMargin,

    "etl_observe_metrics" ->
      """SELECT count(*) AS n_rows,
        |  CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_props,
        |  CAST(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT) AS neg_value,
        |  CAST(sum(CAST(floor(value*100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM events""".stripMargin,

    "etl_interpolate_linear" ->
      """WITH grid AS (
        |  SELECT c_custkey, CAST(unnest(generate_series(
        |    DATE '1995-01-01', DATE '1997-12-01', INTERVAL 1 MONTH)) AS DATE) AS mth
        |  FROM customer WHERE c_custkey <= 20),
        |m AS (
        |  SELECT o_custkey, CAST(date_trunc('month', o_orderdate) AS DATE) AS mth,
        |         count(*) AS n
        |  FROM orders WHERE o_custkey <= 20 GROUP BY 1, 2),
        |x AS (
        |  SELECT g.c_custkey, g.mth, m.n,
        |         year(g.mth)*12 + month(g.mth) AS i
        |  FROM grid g LEFT JOIN m ON m.o_custkey = g.c_custkey AND m.mth = g.mth),
        |w AS (
        |  SELECT c_custkey, mth, n, i,
        |    last_value(CASE WHEN n IS NOT NULL THEN n END IGNORE NULLS) OVER wp AS pa,
        |    last_value(CASE WHEN n IS NOT NULL THEN i END IGNORE NULLS) OVER wp AS ia,
        |    first_value(CASE WHEN n IS NOT NULL THEN n END IGNORE NULLS) OVER wn AS pb,
        |    first_value(CASE WHEN n IS NOT NULL THEN i END IGNORE NULLS) OVER wn AS ib
        |  FROM x
        |  WINDOW wp AS (PARTITION BY c_custkey ORDER BY i
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |         wn AS (PARTITION BY c_custkey ORDER BY i
        |                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
        |SELECT c_custkey, mth AS month, CAST(n AS BIGINT) AS n_obs,
        |  CASE WHEN n IS NOT NULL THEN CAST(n AS BIGINT)
        |       WHEN pa IS NOT NULL AND pb IS NOT NULL
        |       THEN CAST(pa*(ib-i) + pb*(i-ia) AS BIGINT) END AS interp_num,
        |  CASE WHEN n IS NOT NULL THEN CAST(1 AS BIGINT)
        |       WHEN pa IS NOT NULL AND pb IS NOT NULL
        |       THEN CAST(ib-ia AS BIGINT) END AS interp_den
        |FROM w ORDER BY c_custkey, month""".stripMargin,

    "etl_mix_sources" ->
      """SELECT source, n_total, n_kept,
        |  CAST(n_kept * 10000 // n_total AS BIGINT) AS rate_e4
        |FROM (
        |  SELECT source, count(*) AS n_total,
        |    CAST(sum(CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
        |      CASE source WHEN 'src0' THEN 'zz' WHEN 'src1' THEN '80'
        |                  WHEN 'src2' THEN '40' ELSE '20' END
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |  FROM documents GROUP BY source)
        |ORDER BY source""".stripMargin,

    "etl_sample_stratified" ->
      """SELECT doc_id, lang, rn FROM (
        |  SELECT doc_id, lang, CAST(row_number() OVER (PARTITION BY lang
        |    ORDER BY md5('s:' || CAST(doc_id AS VARCHAR)), doc_id) AS INT) AS rn
        |  FROM documents)
        |WHERE rn <= 50 ORDER BY lang, rn""".stripMargin,

    "etl_quarantine_split" ->
      """SELECT o_orderkey,
        |  concat_ws(',',
        |    CASE WHEN o_totalprice > 400000.0 THEN 'price_hi' END,
        |    CASE WHEN CAST(o_orderdate AS DATE) > DATE '1998-12-31' THEN 'date_range' END,
        |    CASE WHEN o_orderstatus = 'P' THEN 'pending_review' END) AS reasons,
        |  CAST((o_totalprice > 400000.0)::INT
        |     + (CAST(o_orderdate AS DATE) > DATE '1998-12-31')::INT
        |     + (o_orderstatus = 'P')::INT AS INT) AS n_viol
        |FROM orders
        |WHERE o_totalprice > 400000.0
        |   OR CAST(o_orderdate AS DATE) > DATE '1998-12-31'
        |   OR o_orderstatus = 'P'
        |ORDER BY o_orderkey""".stripMargin,

    "etl_dedup_exact" ->
      """SELECT event_id, user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch
        |FROM (SELECT *, row_number() OVER (PARTITION BY event_id ORDER BY ts ASC) AS rn
        |      FROM (SELECT * FROM events UNION ALL SELECT * FROM events WHERE event_id % 5 = 0))
        |WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "etl_conform" ->
      """SELECT c_custkey, upper(trim(c_name)) AS name_std, n_name, r_name,
        |  COALESCE(nullif(c_mktsegment, ''), 'UNKNOWN') AS segment,
        |  CASE WHEN c_acctbal < 0 THEN 'NEG' WHEN c_acctbal < 5000.0 THEN 'LOW'
        |       ELSE 'HIGH' END AS bal_band
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |ORDER BY c_custkey""".stripMargin,

    "etl_validate_dq" ->
      """SELECT * FROM (
        |  SELECT 'customer_null_nationkey' AS metric, count(*) AS value FROM customer WHERE c_nationkey IS NULL
        |  UNION ALL SELECT 'lineitem_discount_oob', count(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 1
        |  UNION ALL SELECT 'lineitem_negative_qty', count(*) FROM lineitem WHERE l_quantity <= 0
        |  UNION ALL SELECT 'lineitem_orphan_order', count(*) FROM lineitem WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
        |  UNION ALL SELECT 'orders_orphan_customer', count(*) FROM orders WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
        |  UNION ALL SELECT 'events_malformed_props', count(*) FROM events WHERE json_extract_string(props, '$.k') IS NULL
        |  UNION ALL SELECT 'documents_nchars_mismatch', count(*) FROM documents WHERE n_chars <> length(text))
        |ORDER BY metric""".stripMargin,

    "etl_merge_upsert" ->
      """SELECT o_orderkey, status, CAST(price AS DOUBLE) AS price, src FROM (
        |  SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY src DESC) AS rn FROM (
        |    SELECT o_orderkey, o_orderstatus AS status,
        |           CAST(o_totalprice AS DECIMAL(18,4)) AS price, 0 AS src
        |    FROM orders WHERE o_orderkey % 2 = 1
        |    UNION ALL
        |    SELECT o_orderkey, 'U' AS status,
        |           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.10 AS DECIMAL(3,2)) AS DECIMAL(18,4)) AS price, 1 AS src
        |    FROM orders WHERE o_orderkey % 4 = 1))
        |WHERE rn = 1 ORDER BY o_orderkey""".stripMargin,

    "etl_pivot" ->
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'click') AS n_click,
        |  count(*) FILTER (WHERE event_type = 'error') AS n_error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS n_view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "etl_unpivot" ->
      """SELECT l_orderkey, l_linenumber, measure, value
        |FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount FROM lineitem)
        |UNPIVOT (value FOR measure IN (l_quantity, l_extendedprice, l_discount))
        |ORDER BY l_orderkey, l_linenumber, measure, value""".stripMargin,

    "etl_incremental_agg" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "etl_funnel" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS es,
        |    lag(CAST(floor(epoch(ts)) AS BIGINT), 1) OVER w AS prev_es
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |), numbered AS (
        |  SELECT *, SUM(CASE WHEN prev_es IS NULL OR es - prev_es > 1800 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_ord
        |  FROM flagged
        |), sessions AS (
        |  SELECT user_id, session_ord,
        |    MIN(CASE WHEN event_type = 'click' THEN es END) AS first_click,
        |    MAX(CASE WHEN event_type = 'purchase' THEN es END) AS last_purchase
        |  FROM numbered GROUP BY user_id, session_ord)
        |SELECT user_id, count(*) AS n_sessions,
        |  count(CASE WHEN first_click IS NOT NULL AND last_purchase IS NOT NULL
        |             AND first_click < last_purchase THEN 1 END) AS n_converted
        |FROM sessions GROUP BY user_id ORDER BY user_id""".stripMargin,

    "etl_cdc_diff" ->
      """WITH old AS (
        |  SELECT o_orderkey AS k_old, CAST(o_totalprice AS DECIMAL(18,4)) AS old_price
        |  FROM orders WHERE o_orderkey % 2 = 1),
        |neu AS (
        |  SELECT o_orderkey AS k_new,
        |    CASE WHEN o_orderkey % 3 = 0
        |         THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.05 AS DECIMAL(3,2)) AS DECIMAL(18,4))
        |         ELSE CAST(o_totalprice AS DECIMAL(18,4)) END AS new_price
        |  FROM orders WHERE o_orderkey % 2 = 1 AND NOT (o_orderkey % 5 = 0)
        |  UNION ALL
        |  SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,4))
        |  FROM orders WHERE o_orderkey % 10 = 0)
        |SELECT COALESCE(k_old, k_new) AS k,
        |  CASE WHEN k_old IS NULL THEN 'insert'
        |       WHEN k_new IS NULL THEN 'delete'
        |       WHEN old_price <> new_price THEN 'update'
        |       ELSE 'unchanged' END AS change,
        |  CAST(old_price AS DOUBLE) AS old_price,
        |  CAST(new_price AS DOUBLE) AS new_price
        |FROM old FULL JOIN neu ON k_old = k_new
        |WHERE CASE WHEN k_old IS NULL THEN 'insert'
        |           WHEN k_new IS NULL THEN 'delete'
        |           WHEN old_price <> new_price THEN 'update'
        |           ELSE 'unchanged' END <> 'unchanged'
        |ORDER BY k""".stripMargin,

    "etl_sample_hash" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice AS price
        |FROM orders
        |WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0','1')
        |ORDER BY o_orderkey""".stripMargin,

    "etl_split_train_eval" ->
      """SELECT doc_id, h,
        |  CASE WHEN h < 'c' THEN 'train' WHEN h < 'e' THEN 'val'
        |       ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |        substring(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 1) AS h
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "etl_profile" ->
      """SELECT 'o_custkey' AS column_name, count(*) AS n_rows,
        |  CAST(count(*) - count(o_custkey) AS BIGINT) AS n_null,
        |  count(DISTINCT o_custkey) AS n_distinct,
        |  CAST(min(o_custkey) AS VARCHAR) AS min_str,
        |  CAST(max(o_custkey) AS VARCHAR) AS max_str FROM orders
        |UNION ALL
        |SELECT 'o_orderkey', count(*),
        |  CAST(count(*) - count(o_orderkey) AS BIGINT),
        |  count(DISTINCT o_orderkey),
        |  CAST(min(o_orderkey) AS VARCHAR), CAST(max(o_orderkey) AS VARCHAR)
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderpriority', count(*),
        |  CAST(count(*) - count(o_orderpriority) AS BIGINT),
        |  count(DISTINCT o_orderpriority),
        |  min(o_orderpriority), max(o_orderpriority) FROM orders
        |UNION ALL
        |SELECT 'o_orderstatus', count(*),
        |  CAST(count(*) - count(o_orderstatus) AS BIGINT),
        |  count(DISTINCT o_orderstatus),
        |  min(o_orderstatus), max(o_orderstatus) FROM orders
        |ORDER BY column_name""".stripMargin,

    "etl_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS es,
        |    lag(CAST(floor(epoch(ts)) AS BIGINT), 1) OVER w AS prev_es
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |), numbered AS (
        |  SELECT *, SUM(CASE WHEN prev_es IS NULL OR es - prev_es > 1800 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_ord
        |  FROM flagged)
        |SELECT user_id, CAST(session_ord AS BIGINT) AS session_ord, count(*) AS n_events,
        |  MIN(es) AS first_epoch, MAX(es) AS last_epoch,
        |  MAX(es) - MIN(es) AS duration_s
        |FROM numbered GROUP BY user_id, session_ord
        |ORDER BY user_id, session_ord""".stripMargin,

    "etl_cdc_compact" ->
      """SELECT user_id, event_type, event_id AS last_event_id,
        |  epoch_us(ts) AS ts_us,
        |  CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
        |        ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,

    "etl_gdpr_erasure" ->
      """WITH e AS (SELECT c_custkey AS ek FROM customer WHERE c_custkey % 97 = 0),
        |eo AS (SELECT o_orderkey AS eok FROM orders
        |       JOIN e ON o_custkey = ek)
        |SELECT 'customer' AS table_name,
        |  CAST(count(CASE WHEN c_custkey % 97 = 0 THEN 1 END) AS BIGINT) AS n_removed,
        |  CAST(count(CASE WHEN c_custkey % 97 <> 0 THEN 1 END) AS BIGINT) AS n_kept
        |FROM customer
        |UNION ALL
        |SELECT 'orders',
        |  CAST(count(CASE WHEN ek IS NOT NULL THEN 1 END) AS BIGINT),
        |  CAST(count(CASE WHEN ek IS NULL THEN 1 END) AS BIGINT)
        |FROM orders LEFT JOIN e ON o_custkey = ek
        |UNION ALL
        |SELECT 'lineitem',
        |  CAST(count(CASE WHEN eok IS NOT NULL THEN 1 END) AS BIGINT),
        |  CAST(count(CASE WHEN eok IS NULL THEN 1 END) AS BIGINT)
        |FROM lineitem LEFT JOIN eo ON l_orderkey = eok
        |ORDER BY table_name""".stripMargin,

    "etl_session_window" ->
      """WITH f AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS es,
        |    lag(epoch_us(ts), 1) OVER w AS pes,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |), numbered AS (
        |  SELECT *, SUM(CASE WHEN pes IS NULL OR es - pes >= 1800000000
        |                     THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY es ASC, event_id ASC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS so
        |  FROM f)
        |SELECT user_id, MIN(es) AS s_us, MAX(es) + 1800000000 AS e_us,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(SUM(cents) AS BIGINT) AS sum_cents
        |FROM numbered GROUP BY user_id, so
        |ORDER BY user_id, s_us""".stripMargin,

    "etl_scd2_snapshot" ->
      """WITH yearly AS (
        |  SELECT o_custkey, CAST(year(o_orderdate) AS INT) AS yr,
        |    CASE WHEN CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) < 400000 THEN 'S'
        |         WHEN CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) < 1200000 THEN 'M'
        |         ELSE 'L' END AS band
        |  FROM orders GROUP BY o_custkey, CAST(year(o_orderdate) AS INT)
        |), changes AS (
        |  SELECT * FROM (
        |    SELECT o_custkey, yr, band,
        |      lag(band, 1, '__none__') OVER (PARTITION BY o_custkey ORDER BY yr ASC) AS prev_band
        |    FROM yearly)
        |  WHERE band <> prev_band)
        |SELECT o_custkey, band, yr AS valid_from,
        |  lead(yr, 1) OVER (PARTITION BY o_custkey ORDER BY yr ASC) - 1 AS valid_to
        |FROM changes ORDER BY o_custkey, valid_from""".stripMargin,

    "etl_dim_lookup_asof" ->
      """WITH yearly AS (
        |  SELECT o_custkey, CAST(year(o_orderdate) AS INT) AS yr,
        |    CASE WHEN CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) < 400000 THEN 'S'
        |         WHEN CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) < 1200000 THEN 'M'
        |         ELSE 'L' END AS band
        |  FROM orders GROUP BY o_custkey, CAST(year(o_orderdate) AS INT)
        |), changes AS (
        |  SELECT * FROM (
        |    SELECT o_custkey, yr, band,
        |      lag(band, 1, '__none__') OVER (PARTITION BY o_custkey ORDER BY yr ASC) AS prev_band
        |    FROM yearly)
        |  WHERE band <> prev_band
        |), dim AS (
        |  SELECT o_custkey AS d_cust, band, yr AS valid_from,
        |    lead(yr, 1) OVER (PARTITION BY o_custkey ORDER BY yr ASC) - 1 AS valid_to
        |  FROM changes)
        |SELECT band, count(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders JOIN dim
        |  ON o_custkey = d_cust
        | AND CAST(year(o_orderdate) AS INT) >= valid_from
        | AND (valid_to IS NULL OR CAST(year(o_orderdate) AS INT) <= valid_to)
        |GROUP BY band ORDER BY band""".stripMargin
  )
}
