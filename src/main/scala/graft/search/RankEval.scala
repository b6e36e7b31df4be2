package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TREC-style retrieval evaluation — the measurement half of the
  * search stack (reference surface: the vector/text search steps whose
  * quality the serving tiers calibrate; this is the same recall@k
  * discipline generalized to graded rank metrics a retrieval or
  * embedding-training pipeline reports: MRR, hits@k, nDCG@k).
  *
  * All arithmetic is EXACT INTEGER on shared literal tables, the
  * [[graft.pipeline.Temporal.decayWeights]] discipline: the DCG
  * discount `1/log2(rank+1)` is precomputed once in Scala as 1e-9
  * fixed-point longs and inlined into BOTH the engine plan
  * (`typedLit`) and the generated oracle SQL (`CASE rank WHEN …`), so
  * per-query DCG/IDCG are order-free long sums, reciprocal ranks are
  * integer divisions, and every output replays bit-identically on any
  * engine and any partitioning — no libm log in the data path at all.
  *
  * Scale shape: one equi-join of the runs against the relevance pairs
  * on (query, doc) — both sides shuffle on the same key, no broadcast
  * assumption (qrels can be corpus-sized) — then ONE groupBy per
  * query. The weight tables are k-bounded literals riding the plan.
  */
object RankEval {

  /** 1e-9 fixed-point DCG discounts: w(r) = round(1e9 / log2(r+1)),
    * r = 1..k (w(1) = 1e9 exactly). Shared with oracle construction so
    * both engines read the SAME literals. */
  def dcgWeights(k: Int): Seq[Long] = {
    require(k >= 1, s"k must be >= 1, got $k")
    (1 to k).map(r => math.round(1e9 / (math.log(r + 1.0) / math.log(2.0))))
  }

  /** Prefix sums of [[dcgWeights]]: cum(i) = Σ w(1..i) — the ideal DCG
    * of i relevant documents, read by position for IDCG@k. */
  def cumDcgWeights(k: Int): Seq[Long] =
    dcgWeights(k).scanLeft(0L)(_ + _).tail

  /** Per-query rank metrics of a run against binary relevance pairs.
    *
    * `runs`: (query_id, doc_id, rank) — rank 1-based (e.g. the output
    * of [[VectorOps.knnJoin]] with neighbor_id as doc_id).
    * `rels`: (query_id, doc_id) — the relevant pairs (qrels);
    * duplicates are tolerated (distinct applied).
    *
    * Output, one row per query present in `runs`:
    *  - `hits_k`      relevant docs in the top k (recall numerator)
    *  - `n_rel`       total relevant docs for the query (recall
    *                  denominator; 0 when the query has no qrels)
    *  - `first_rel_rank` rank of the first relevant hit (0 = none)
    *  - `rr_q`        1e9 div first_rel_rank (0 = none) — fixed-point
    *                  reciprocal rank
    *  - `dcg_q`       Σ w(rank) over relevant hits (1e-9 fixed-point)
    *  - `ndcg_q`      dcg·1e6 div idcg, idcg = cum(min(n_rel, k))
    *                  (0 when the query has no relevant docs) — 1e-6
    *                  fixed-point nDCG@k
    *  - `ap_q`        average precision@k, 1e-9 fixed-point: the j-th
    *                  relevant hit at rank r contributes `1e9·j div r`
    *                  (precision at that rank), summed and divided by
    *                  min(n_rel, k) — exact truncating divisions, so
    *                  a perfect prefix ranking scores exactly 1e9
    */
  def rankEvalReport(runs: DataFrame, rels: DataFrame, k: Int): DataFrame = {
    val w = dcgWeights(k)
    val cw = cumDcgWeights(k)
    val r = runs.select(col("query_id").cast("long").as("query_id"),
        col("doc_id").cast("long").as("doc_id"),
        col("rank").cast("long").as("rank"))
      .where(col("rank") <= k)
    val rel = rels.select(col("query_id").cast("long").as("query_id"),
      col("doc_id").cast("long").as("doc_id")).distinct()
    val marked = r.join(rel.withColumn("_rel", lit(1L)),
        Seq("query_id", "doc_id"), "left")
      .withColumn("_rel", coalesce(col("_rel"), lit(0L)))
    val nRel = rel.groupBy(col("query_id")).agg(count(lit(1)).as("n_rel"))
    val relRank: Column = when(col("_rel") === 1L, col("rank"))
    // AP numerator: ordinal of each relevant hit over its own rank —
    // the window partitions on the SAME key the aggregation groups on,
    // so this costs no extra exchange
    val apW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("rank"))
    val apSum = marked.where(col("_rel") === 1L)
      .withColumn("_j", row_number().over(apW).cast("long"))
      .groupBy(col("query_id"))
      .agg(sum(expr("1000000000L * _j div rank")).as("_apsum"))
    marked.groupBy(col("query_id")).agg(
        sum(col("_rel")).as("hits_k"),
        min(relRank).as("_frr"),
        sum(when(col("_rel") === 1L,
          element_at(typedLit(w), col("rank").cast("int")))
          .otherwise(0L)).as("dcg_q"))
      .join(nRel, Seq("query_id"), "left")
      .join(apSum, Seq("query_id"), "left")
      .na.fill(0L, Seq("n_rel", "_apsum"))
      .withColumn("first_rel_rank", coalesce(col("_frr"), lit(0L)))
      .withColumn("rr_q", when(col("_frr").isNotNull,
        expr("1000000000L div _frr")).otherwise(0L))
      .withColumn("_idcg", when(col("n_rel") > 0L,
        element_at(typedLit(cw),
          least(col("n_rel"), lit(k.toLong)).cast("int"))).otherwise(0L))
      .withColumn("ndcg_q", when(col("_idcg") > 0L,
        expr("dcg_q * 1000000L div _idcg")).otherwise(0L))
      .withColumn("ap_q", when(col("n_rel") > 0L,
        expr(s"_apsum div least(n_rel, ${k}L)")).otherwise(0L))
      .select(col("query_id"), col("hits_k"), col("n_rel"),
        col("first_rel_rank"), col("rr_q"), col("dcg_q"), col("ndcg_q"),
        col("ap_q"))
  }

  /** Corpus-level summary of [[rankEvalReport]]: query count, MRR,
    * mean nDCG and MAP as exact integer means (truncating div —
    * replay-safe; the per-query table is the precision carrier). */
  def rankEvalSummary(report: DataFrame): DataFrame =
    report.agg(count(lit(1)).as("n_queries"),
        sum(col("rr_q")).as("_srr"), sum(col("ndcg_q")).as("_sn"),
        sum(col("ap_q")).as("_sap"))
      .select(col("n_queries"),
        expr("_srr div n_queries").as("mrr_q"),
        expr("_sn div n_queries").as("mean_ndcg_q"),
        expr("_sap div n_queries").as("map_q"))

  /** A/B comparison of two [[rankEvalReport]] tables over the SAME
    * qrels — the run-selection decision table ("did the new ranker
    * beat the old one, per query, not just on the mean"): per-query
    * nDCG wins/losses/ties (the sign-test counts — exact integers, so
    * the verdict replays on any engine; the caller applies whatever
    * significance rule they trust to wins vs losses) plus both runs'
    * integer MRR / mean-nDCG. Queries are compared INNER — a query one
    * run never answered is a coverage problem, not a quality delta;
    * compare n_queries against each run's own summary to see it.
    */
  def rankEvalAbSummary(reportA: DataFrame, reportB: DataFrame): DataFrame = {
    val a = reportA.select(col("query_id"), col("ndcg_q").as("_na"),
      col("rr_q").as("_ra"))
    val b = reportB.select(col("query_id"), col("ndcg_q").as("_nb"),
      col("rr_q").as("_rb"))
    a.join(b, Seq("query_id"))
      .agg(count(lit(1)).as("n_queries"),
        sum(when(col("_na") > col("_nb"), 1L).otherwise(0L)).as("wins_a"),
        sum(when(col("_na") < col("_nb"), 1L).otherwise(0L)).as("losses_a"),
        sum(when(col("_na") === col("_nb"), 1L).otherwise(0L)).as("ties"),
        sum(col("_ra")).as("_sra"), sum(col("_rb")).as("_srb"),
        sum(col("_na")).as("_sna"), sum(col("_nb")).as("_snb"))
      .select(col("n_queries"), col("wins_a"), col("losses_a"), col("ties"),
        expr("_sra div n_queries").as("mrr_a"),
        expr("_srb div n_queries").as("mrr_b"),
        expr("_sna div n_queries").as("mean_ndcg_a"),
        expr("_snb div n_queries").as("mean_ndcg_b"))
  }

  /** The `CASE rank WHEN 1 THEN w1 … END` / `CASE … END` SQL fragments
    * an oracle inlines — generated from the SAME literal tables the
    * engine plan carries. `rankExpr` / `nExpr` are the SQL expressions
    * for the 1-based rank and the (already k-capped) relevant count. */
  def dcgWeightCaseSql(k: Int, rankExpr: String): String =
    dcgWeights(k).zipWithIndex.map { case (wv, i) =>
      s"WHEN ${i + 1} THEN $wv"
    }.mkString(s"CASE $rankExpr ", " ", " ELSE 0 END")

  def idcgCaseSql(k: Int, nExpr: String): String =
    cumDcgWeights(k).zipWithIndex.map { case (cv, i) =>
      s"WHEN ${i + 1} THEN $cv"
    }.mkString(s"CASE least($nExpr, $k) ", " ", " ELSE 0 END")
}
