package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share word
  * n-grams with a held-out evaluation set, the standard guard against
  * eval contamination in LLM training corpora (13-gram overlap in
  * GPT-3/PaLM-style pipelines; the n is a parameter here).
  *
  * Scale shape: the eval side is benchmarks — megabytes, not
  * terabytes — so its distinct shingle-hash set is BROADCAST to the
  * corpus scan. The 100 TB corpus is never shuffled: each corpus
  * partition streams its shingles against the in-memory eval set and
  * emits per-doc hit counts through a partial aggregation. Shingles
  * ride as 60-bit md5 longs (Dedup.shingleHashSet), so the broadcast
  * is 8 bytes per eval shingle and the probe is a long-key hash join.
  */
object Decontam {

  /** Per-document contamination report: `(idCol, n_hit)` where
    * `n_hit` counts DISTINCT n-gram shingles the document shares with
    * `evalSet` — docs with zero overlap are absent (filter or
    * anti-join downstream as policy dictates). Both sides tokenize and
    * shingle identically (Dedup.shingles hash family), so a hit means
    * the same n consecutive words appear in both.
    *
    * The corpus side deliberately does NOT reuse Dedup.shingleHashSet:
    * its per-(doc, shingle) `distinct()` is a full-corpus shuffle. Here
    * the dedup happens WITHIN each row (`array_distinct` over the
    * doc's shingle-hash array) before the explode, so the corpus path
    * is scan → explode → broadcast-probe with zero exchanges; the only
    * shuffle left is the final per-doc count over rows that survived
    * the probe — the contaminated sliver, not the corpus.
    */
  def contamination(corpus: DataFrame, evalSet: DataFrame,
      textCol: String, idCol: String, n: Int): DataFrame = {
    val evalShingles = Dedup.shingleHashSet(evalSet, textCol, idCol, n)
      .select(col("_sh")).distinct()
    // tokens materialize in their OWN projection: element_at inside the
    // shingle lambda references the token array once per position, so
    // an inlined tokenizer would re-run the regex split per shingle
    // (Dedup.shinglesOfTokens doc) — that inlining measured 13 s vs
    // 0.5 s at sf0.1
    corpus
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("_t"))
      .select(col(idCol), explode(array_distinct(transform(
        Dedup.shinglesOfTokens(col("_t"), n),
        s => conv(substring(md5(s), 1, 15), 16, 10).cast("long")))).as("_sh"))
      .join(broadcast(evalShingles), "_sh")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hit"))
  }

  /** Eval-side ATTRIBUTION: for each evaluation document, how many
    * corpus documents overlap it (`n_train_docs`) and how many of its
    * distinct shingles leak (`n_shared`) — the report that tells a
    * benchmark owner WHICH eval items are compromised and how broadly,
    * where [[contamination]] tells the corpus owner what to drop.
    * Same plan shape: the broadcast now carries (eval_id, shingle)
    * instead of the bare shingle set — still benchmark-sized — and the
    * corpus streams through the probe with zero exchanges before the
    * sliver-sized final aggregation.
    */
  def attribution(corpus: DataFrame, evalSet: DataFrame,
      textCol: String, idCol: String, n: Int): DataFrame = {
    val evalShingles = Dedup.shingleHashSet(evalSet, textCol, idCol, n)
      .select(col("_did").as("_eid"), col("_sh"))
    corpus
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("_t"))
      .select(col(idCol), explode(array_distinct(transform(
        Dedup.shinglesOfTokens(col("_t"), n),
        s => conv(substring(md5(s), 1, 15), 16, 10).cast("long")))).as("_sh"))
      .join(broadcast(evalShingles), "_sh")
      .groupBy(col("_eid").as("eval_id"))
      .agg(countDistinct(col(idCol)).as("n_train_docs"),
        countDistinct(col("_sh")).as("n_shared"))
  }

  /** The keep-side terminal: corpus rows whose overlap with `evalSet`
    * stays under `maxHits` shared shingles (strictly-less; 1 drops any
    * overlap at all). Broadcast anti-join against the (small)
    * contaminated id set — the corpus again streams without a shuffle.
    */
  def decontaminate(corpus: DataFrame, evalSet: DataFrame,
      textCol: String, idCol: String, n: Int, maxHits: Long = 1L): DataFrame = {
    val bad = contamination(corpus, evalSet, textCol, idCol, n)
      .where(col("n_hit") >= maxHits).select(idCol)
    corpus.join(broadcast(bad), Seq(idCol), "left_anti")
  }

  // ---- artifact-serving forms (r17) ----
  // When corpus and eval set are slices of a corpus whose per-doc
  // shingle-hash set is already write-time material
  // (Dedup.shingleHashSetCached — the same (_did, _sh) rows, same
  // 60-bit md5 family), re-tokenizing + re-hashing the corpus per
  // decontam query is pure duplicate work: these forms consume the
  // prebuilt frame slices instead (§1.2). Row-identical to the
  // text-scanning forms by construction; those remain the right shape
  // for a corpus with no standing artifact (one zero-exchange scan).

  /** [[contamination]] over prebuilt per-doc-distinct shingle frames.
    * Output `(idOut, n_hit)`. */
  def contaminationFromShingles(corpusShingles: DataFrame,
      evalShingles: DataFrame, idOut: String): DataFrame =
    corpusShingles
      .join(broadcast(evalShingles.select(col("_sh")).distinct()), "_sh")
      .groupBy(col("_did").as(idOut))
      .agg(count(lit(1)).as("n_hit"))

  /** [[attribution]] over prebuilt per-doc-distinct shingle frames. */
  def attributionFromShingles(corpusShingles: DataFrame,
      evalShingles: DataFrame): DataFrame =
    corpusShingles
      .join(broadcast(evalShingles
        .select(col("_did").as("_eid"), col("_sh"))), "_sh")
      .groupBy(col("_eid").as("eval_id"))
      .agg(countDistinct(col("_did")).as("n_train_docs"),
        countDistinct(col("_sh")).as("n_shared"))

  /** [[decontaminate]] over prebuilt per-doc-distinct shingle frames. */
  def decontaminateFromShingles(corpus: DataFrame, corpusShingles: DataFrame,
      evalShingles: DataFrame, idCol: String, maxHits: Long = 1L): DataFrame = {
    val bad = contaminationFromShingles(corpusShingles, evalShingles, idCol)
      .where(col("n_hit") >= maxHits).select(idCol)
    corpus.join(broadcast(bad), Seq(idCol), "left_anti")
  }

  /** SEMANTIC contamination: corpus rows whose EMBEDDING is within
    * `minCos` cosine of any evaluation embedding — the paraphrase arm
    * of decontamination. The shingle arm above catches verbatim
    * n-gram leakage; a reworded eval item shares no 13-gram with its
    * source, but its embedding barely moves, which is exactly what a
    * cosine gate sees. Scale shape mirrors the shingle arm: the eval
    * side is benchmark-sized and broadcast (with its norms), the
    * corpus streams one scan with no shuffle and per-row first-hit
    * early exit ([[graft.search.VectorOps.cosineFlagsBroadcast]]).
    * Returns the flagged ids, one row each.
    */
  def semanticContamination(corpus: DataFrame, evalSet: DataFrame,
      vecCol: String, idCol: String, minCos: Double): DataFrame =
    graft.search.VectorOps.cosineFlagsBroadcast(
      corpus, evalSet, vecCol, idCol, minCos)
}
