package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sequence packing for LLM pretraining pipelines: bin documents into
  * fixed token-budget training sequences (context windows) with
  * deterministic shard-then-pack semantics.
  *
  * Packing is inherently sequential (an open bin's leftover space
  * depends on every earlier placement), so the scalable shape is the
  * one production pipelines use: SHARD first, pack WITHIN each shard.
  * Shard assignment is pure arithmetic (`bucket = doc_id mod B`), so
  * the layout is a deterministic function of the corpus alone — no
  * RNG, no partition sensitivity, and an external engine can replay
  * the exact same packing (the DuckDB oracle does, via a recursive
  * CTE). At 100 TB the B buckets pack in parallel, each as a single
  * bounded sequential scan; B scales with the corpus (target shard
  * size = what one task should stream), and bucket-mod-id keeps shards
  * uniform so there is no skew to salt.
  *
  * Physical plan: one hash exchange on `bucket`, an in-partition sort
  * `(bucket, doc_id)`, then a stateful `mapPartitions` scan (state =
  * one open bin per bucket; buckets are contiguous after the sort, so
  * state is two longs). No collect, no windows over the whole corpus,
  * no second shuffle.
  *
  * Greedy first-fit-in-id-order: a doc joins the open sequence if it
  * fits, else opens the next one. Docs longer than the window cap at
  * the window (real pipelines truncate or split long docs upstream;
  * the cap keeps every sequence's fill ≤ window without a special
  * case). This is the standard "greedy packing" baseline — within a
  * few percent of optimal fill for natural document-length
  * distributions, and O(n) versus NP-hard exact binning.
  */
object Packing {

  /** Per-document sequence assignment: `(doc_id, bucket, seq, n_tok)`
    * where `seq` is 1-based within the bucket and `n_tok` is the
    * window-capped whitespace token count the doc contributes.
    *
    * Id contract: `idCol` must hold NON-NEGATIVE NUMERIC ids. A null
    * or non-numeric id (cast-to-long → null) would NPE inside the
    * packing scan, and a negative id's `pmod` diverges from plain SQL
    * `%` (Spark `pmod(-5,16)=11` vs DuckDB `-5%16=-5`), silently
    * shifting shard assignment vs any external replay. Both fail
    * loudly at execution instead.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      window: Int, nBuckets: Int): DataFrame =
    packByCounts(
      df.select(col(idCol),
        TextAnalysis.tokenCount(col(textCol)).as("_pack_tc")),
      idCol, "_pack_tc", window, nBuckets)

  /** [[packSequences]] over a PRECOMPUTED per-doc token-count column —
    * the budget axis is pluggable (whitespace counts, real BPE counts
    * from [[Bpe.tokenCountReport]], char budgets), the shard-then-pack
    * mechanics identical.
    */
  def packByCounts(df: DataFrame, idCol: String, countCol: String,
      window: Int, nBuckets: Int): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val checkedId = checkedIdExpr(idCol)
    packCore(df, checkedId, countCol,
      pmod(checkedId, lit(nBuckets.toLong)), window)
  }

  private def checkedIdExpr(idCol: String): org.apache.spark.sql.Column = {
    val idL = col(idCol).cast("long")
    when(idL.isNull || idL < 0, raise_error(concat(
        lit(s"Packing: '$idCol' must be a non-negative numeric id " +
          "(shard and pack order must replay identically in external " +
          "engines), got: "),
        coalesce(col(idCol).cast("string"), lit("null")))).cast("long"))
      .otherwise(idL)
  }

  /** [[packByCounts]] sharded by an ARBITRARY key column instead of
    * `id mod B` — the SEMANTIC-packing entry point (in-context
    * pretraining, Shi et al. 2024: a context window filled with
    * RELATED documents beats random neighbors, so the shard key is a
    * topic — a k-means cluster id, a domain, a near-dup cluster
    * representative). Mechanics identical: each key packs as one
    * bounded sequential scan, greedy first-fit in id order; the
    * (key, seq) pair addresses the training sequence. Null keys are
    * refused loudly (a silent null shard would collapse every keyless
    * doc into one mega-bucket). Skew note: key = topic means shard
    * sizes follow the topic distribution — cap upstream (the
    * per-cluster budget operators) if one topic dominates.
    */
  def packByCountsKeyed(df: DataFrame, idCol: String, countCol: String,
      keyCol: String, window: Int): DataFrame = {
    val k = col(keyCol).cast("long")
    val checkedKey = when(k.isNull, raise_error(
        lit(s"Packing.packByCountsKeyed: null '$keyCol' shard key — " +
          "semantic packing needs every doc assigned"))
        .cast("long"))
      .otherwise(k)
    packCore(df, checkedIdExpr(idCol), countCol, checkedKey, window)
  }

  private def packCore(df: DataFrame, idExpr: org.apache.spark.sql.Column,
      countCol: String, bucketExpr: org.apache.spark.sql.Column,
      window: Int): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    val base = df.select(
      idExpr.as("doc_id"),
      bucketExpr.as("bucket"),
      least(col(countCol).cast("long"), lit(window.toLong))
        .cast("long").as("n_tok"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("bucket", LongType, nullable = false),
      StructField("seq", LongType, nullable = false),
      StructField("n_tok", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    val w = window.toLong
    base.repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col("doc_id"))
      .mapPartitions { rows =>
        // One open bin per bucket; buckets arrive contiguous, so the
        // state resets on each bucket change: the first doc of a
        // bucket always anchors sequence 1 (even at 0 tokens).
        var cur = Long.MinValue
        var seq = 0L
        var fill = 0L
        rows.map { r =>
          val id = r.getLong(0); val b = r.getLong(1); val t = r.getLong(2)
          if (b != cur) { cur = b; seq = 1L; fill = t }
          else if (fill + t <= w) fill += t
          else { seq += 1L; fill = t }
          Row(id, b, seq, t)
        }
      }(enc)
  }

  /** Per-sequence fill report over [[packSequences]]:
    * `(bucket, seq, docs, fill, fill_ratio)` — the packing-efficiency
    * view (padding waste = `1 - fill_ratio`) that decides whether the
    * window/shard parameters are right before a training run. Pure
    * hash aggregation over the assignment; adds one exchange.
    */
  def packStats(df: DataFrame, idCol: String, textCol: String,
      window: Int, nBuckets: Int): DataFrame =
    packSequences(df, idCol, textCol, window, nBuckets)
      .groupBy(col("bucket"), col("seq"))
      .agg(
        count(lit(1)).as("docs"),
        sum(col("n_tok")).as("fill"),
        round(sum(col("n_tok")).cast("double") / window, 4).as("fill_ratio"))
}
