package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** Round-2 LLM-training-data pipeline operators ([R2] north star) beyond the
  * round-1 dedup/text families: near-dup CLUSTERING (connected components),
  * context chunking, sequence packing, and edit-distance similarity probes.
  *
  * Scale posture: the component loop is the textbook distributed min-label
  * propagation (the DataFrame rendering of large-star/small-star) — each
  * step is one shuffled groupBy over (node, candidate-label) rows, the
  * driver only counts convergence; chunking/packing are narrow maps plus
  * one windowed pass partitioned by `source` shards, never a global order.
  */
object Pipeline {

  /** Canonical-id clustering of the near-duplicate graph: connected
    * components over the exact bigram-Jaccard pair list
    * ([[Text.textJaccardDup]]), by iterative min-label propagation to a
    * fixpoint. Output: every clustered doc with its component id (= min
    * doc_id reachable) and component size — what a 100 TB dedup pass
    * actually needs ("keep one doc per component").
    *
    * The edge list is localCheckpoint'd once — it is the expensive input
    * (a pair scan), and each propagation step must not replay it. Steps
    * are one union + groupBy(min) each; convergence = no label changed,
    * checked distributively (count of diffs), never by collecting labels.
    */
  def dedupCcComponents(spark: SparkSession, sf: String): DataFrame = {
    val pairs = Text.textJaccardDup(spark, sf)
      .select(col("doc_a"), col("doc_b")).localCheckpoint()
    val edges = pairs.select(col("doc_a").as("s"), col("doc_b").as("t"))
      .unionByName(pairs.select(col("doc_b").as("s"), col("doc_a").as("t")))
    val nodes = edges.select(col("s").as("id")).distinct()
    var labels = nodes.select(col("id"), col("id").as("component"))
      .localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < 50) {
      // candidate labels: own label ∪ every neighbour's label, keep min
      val viaEdges = edges.join(labels, edges("s") === labels("id"))
        .select(col("t").as("id"), col("component"))
      val next = labels.unionByName(viaEdges)
        .groupBy("id").agg(min("component").as("component"))
        .localCheckpoint()
      changed = next.as("n").join(labels.as("o"), "id")
        .where(col("n.component") =!= col("o.component")).count()
      labels = next
      iter += 1
    }
    val sizes = labels.groupBy("component")
      .agg(count(lit(1)).cast("int").as("comp_size"))
    labels.join(sizes, "component")
      .select(col("id").as("doc_id"), col("component"), col("comp_size"))
      .orderBy(col("doc_id"))
  }

  /** Context-window chunking: split each document's token stream into
    * windows of 40 tokens advancing by a 30-token stride (10-token overlap)
    * — the standard prep for embedding/pretraining context construction.
    * One narrow map per doc (sequence + explode), no shuffle until the
    * final presentation sort. */
  def etlChunkTokens(spark: SparkSession, sf: String): DataFrame = {
    val ws = split(col("text"), " ")
    val kMax = floor((col("n") - 1) / 30).cast("int")
    documents(spark, sf)
      .select(col("doc_id"), ws.as("ws"), size(ws).as("n"))
      .where(col("n") > 0)
      .select(col("doc_id"), col("ws"), col("n"),
        explode(sequence(lit(0), kMax)).as("chunk_idx"))
      .withColumn("n_tok", least(lit(40), col("n") - col("chunk_idx") * 30).cast("int"))
      .select(col("doc_id"), col("chunk_idx").cast("int").as("chunk_idx"),
        col("n_tok"),
        element_at(col("ws"), col("chunk_idx") * 30 + 1).as("first_tok"),
        element_at(col("ws"), col("chunk_idx") * 30 + col("n_tok")).as("last_tok"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** Sequence packing: concatenate each source shard's token stream in
    * doc_id order and cut it at fixed 512-token boundaries — the bin id is
    * the chunk a document STARTS in (streaming concat-then-split packing,
    * how pretraining shards are packed). Windowed cumsum partitioned by
    * `source` — 20 independent shards, no global order anywhere. */
  def etlPackSequences(spark: SparkSession, sf: String): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    documents(spark, sf)
      .select(col("doc_id"), col("source"), size(split(col("text"), " ")).as("n"))
      .withColumn("cum", sum(col("n")).over(w))
      .withColumn("bin", floor((col("cum") - col("n")) / 512).cast("long"))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("source"), col("bin"))
  }

  /** Edit-distance similarity probes: for each probe doc (doc_id ≡ 0
    * mod 50), the 5 nearest same-lang docs by Levenshtein distance over
    * the 24-char text prefix (ties → lower doc_id). Lang-blocked pair
    * join + windowed top-k; distances are exact ints on both engines. */
  def textEditdistTopk(spark: SparkSession, sf: String): DataFrame = {
    val d = documents(spark, sf)
      .select(col("doc_id"), col("lang"), substring(col("text"), 1, 24).as("p"))
    val probes = d.where(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("doc_a"), col("lang"), col("p").as("pa"))
    val cands = d.select(col("doc_id").as("doc_b"), col("lang").as("lang_b"),
      col("p").as("pb"))
    val w = Window.partitionBy(col("doc_a"))
      .orderBy(col("dist"), col("doc_b"))
    probes.join(cands,
        col("lang") === col("lang_b") && col("doc_a") =!= col("doc_b"))
      .withColumn("dist", levenshtein(col("pa"), col("pb")))
      .withColumn("rn", row_number().over(w).cast("int"))
      .where(col("rn") <= 5)
      .select(col("doc_a"), col("rn"), col("doc_b"), col("dist"))
      .orderBy(col("doc_a"), col("rn"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_cc_components" -> dedupCcComponents,
    "etl_chunk_tokens" -> etlChunkTokens,
    "etl_pack_sequences" -> etlPackSequences,
    "text_editdist_topk" -> textEditdistTopk
  )

  /** DuckDB bigram set (mirrors Text.bigrams). */
  private val bgSql =
    "list_distinct(list_transform(range(1, len(str_split(text,' '))), " +
      "i -> str_split(text,' ')[i] || ' ' || str_split(text,' ')[i+1]))"

  /** The exact near-dup pair list as a nestable SELECT (same semantics as
    * the text_jaccard_dup oracle, pairs only). */
  private val pairsSql =
    s"""SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |FROM (SELECT doc_id, lang, $bgSql AS bg FROM documents) a
       |JOIN (SELECT doc_id, lang, $bgSql AS bg FROM documents) b
       |  ON a.lang = b.lang AND a.doc_id < b.doc_id
       |WHERE len(list_intersect(a.bg, b.bg)) * 2 >=
       |      (len(a.bg) + len(b.bg) - len(list_intersect(a.bg, b.bg)))
       |  AND len(list_intersect(a.bg, b.bg)) > 0""".stripMargin

  def oracle: Map[String, String] = Map(
    "dedup_cc_components" ->
      s"""WITH RECURSIVE pairs AS ($pairsSql),
         |nodes AS (SELECT doc_a AS id FROM pairs UNION SELECT doc_b FROM pairs),
         |edges AS (SELECT doc_a AS s, doc_b AS t FROM pairs
         |          UNION SELECT doc_b, doc_a FROM pairs),
         |reach(id, r) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT reach.id, e.t FROM reach JOIN edges e ON reach.r = e.s),
         |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
         |SELECT c.id AS doc_id, c.component, CAST(s.n AS INT) AS comp_size
         |FROM comp c JOIN (SELECT component, count(*) AS n FROM comp
         |                  GROUP BY component) s USING (component)
         |ORDER BY doc_id""".stripMargin,

    "etl_chunk_tokens" ->
      """SELECT doc_id, CAST(k AS INT) AS chunk_idx,
        |  CAST(least(40, n - k*30) AS INT) AS n_tok,
        |  ws[CAST(k*30+1 AS INT)] AS first_tok,
        |  ws[CAST(k*30 + least(40, n - k*30) AS INT)] AS last_tok
        |FROM (SELECT doc_id, str_split(text,' ') AS ws,
        |             len(str_split(text,' ')) AS n FROM documents),
        |     LATERAL (SELECT unnest(range(0, (n-1)//30 + 1)) AS k)
        |WHERE n > 0
        |ORDER BY doc_id, chunk_idx""".stripMargin,

    "etl_pack_sequences" ->
      """SELECT source, CAST((cum - n) // 512 AS BIGINT) AS bin,
        |  count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM (SELECT doc_id, source, n,
        |        sum(n) OVER (PARTITION BY source ORDER BY doc_id
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM (SELECT doc_id, source,
        |              len(str_split(text,' ')) AS n FROM documents))
        |GROUP BY source, bin ORDER BY source, bin""".stripMargin,

    "text_editdist_topk" ->
      """SELECT doc_a, rn, doc_b, dist FROM (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    CAST(levenshtein(a.p, b.p) AS INT) AS dist,
        |    CAST(row_number() OVER (PARTITION BY a.doc_id
        |      ORDER BY levenshtein(a.p, b.p), b.doc_id) AS INT) AS rn
        |  FROM (SELECT doc_id, lang, substring(text,1,24) AS p FROM documents
        |        WHERE doc_id % 50 = 0) a
        |  JOIN (SELECT doc_id, lang, substring(text,1,24) AS p FROM documents) b
        |    ON a.lang = b.lang AND a.doc_id <> b.doc_id)
        |WHERE rn <= 5 ORDER BY doc_a, rn""".stripMargin
  )
}
