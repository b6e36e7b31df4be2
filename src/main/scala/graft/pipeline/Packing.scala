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
  * fits, else opens the next one. This is the standard "greedy
  * packing" baseline — within a few percent of optimal fill for
  * natural document-length distributions, and O(n) versus NP-hard
  * exact binning.
  *
  * Two long-document policies, choose per pipeline:
  *  - the TRUNCATING variants ([[packSequences]]/[[packByCounts]]/
  *    [[packByCountsKeyed]]) cap a doc's contribution at `window` and
  *    DISCARD the overflow — the right call when upstream already
  *    splits, or when tail tokens of over-window docs are expendable;
  *    the silent loss is the documented price;
  *  - the SPLITTING variants ([[packSequencesSplit]]/
  *    [[packByCountsSplit]]) cut each doc into `ceil(n/window)`
  *    chunks first (chunk index in the output addresses the slice)
  *    and pack the chunks — token-conserving (Σ n_tok out == Σ counts
  *    in, spec-enforced), the production default for pretraining
  *    shards where every token was paid for.
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

  /** [[packSequences]] with long-document SPLITTING instead of
    * truncation: whitespace token counts, `id mod B` shards.
    */
  def packSequencesSplit(df: DataFrame, idCol: String, textCol: String,
      window: Int, nBuckets: Int): DataFrame =
    packByCountsSplit(
      df.select(col(idCol),
        TextAnalysis.tokenCount(col(textCol)).as("_pack_tc")),
      idCol, "_pack_tc", window, nBuckets)

  /** Token-conserving packing: each doc is first cut into
    * `ceil(n/window)` window-aligned chunks (a tokenless doc keeps one
    * zero-token chunk so it stays addressable, mirroring the
    * truncating variant), then the CHUNKS pack greedily in
    * `(doc_id, chunk)` order within the doc's shard. Interior chunks
    * are exactly `window` tokens, so each fills a whole sequence; the
    * tail chunk packs with its neighbors like any short doc. Output:
    * `(doc_id, bucket, chunk, seq, n_tok)` — `Σ n_tok` over a doc's
    * chunks equals its full count, NOTHING is discarded (the spec
    * enforces conservation). Same plan as the truncating form: the
    * chunk explosion is a per-row generator inside the same scan, one
    * hash exchange on the shard key, one stateful in-partition pass.
    * Null/negative counts are refused loudly (the id contract's
    * sibling — a null count would silently vanish tokens, the exact
    * failure this variant exists to close).
    */
  def packByCountsSplit(df: DataFrame, idCol: String, countCol: String,
      window: Int, nBuckets: Int): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val checkedId = checkedIdExpr(idCol)
    packCoreSplit(df, checkedId, countCol,
      pmod(checkedId, lit(nBuckets.toLong)), window)
  }

  private def packCoreSplit(df: DataFrame,
      idExpr: org.apache.spark.sql.Column, countCol: String,
      bucketExpr: org.apache.spark.sql.Column, window: Int): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    val w = window.toLong
    val nRaw = col(countCol).cast("long")
    val checkedN = when(nRaw.isNull || nRaw < 0, raise_error(concat(
        lit(s"Packing: '$countCol' must be a non-negative token count " +
          "(splitting conserves every token, so a null count would " +
          "silently vanish tokens), got: "),
        coalesce(col(countCol).cast("string"), lit("null")))).cast("long"))
      .otherwise(nRaw)
    val base = df.select(
        idExpr.as("doc_id"),
        bucketExpr.as("bucket"),
        checkedN.as("_n"))
      .withColumn("chunk", explode(sequence(lit(0L),
        greatest(lit(1L), expr(s"(_n + ${w - 1}) div $w")) - 1L)))
      .select(col("doc_id"), col("bucket"), col("chunk"),
        greatest(lit(0L), least(lit(w), col("_n") - col("chunk") * w))
          .as("n_tok"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("bucket", LongType, nullable = false),
      StructField("chunk", LongType, nullable = false),
      StructField("seq", LongType, nullable = false),
      StructField("n_tok", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    base.repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col("doc_id"), col("chunk"))
      .mapPartitions { rows =>
        var cur = Long.MinValue
        var seq = 0L
        var fill = 0L
        rows.map { r =>
          val id = r.getLong(0); val b = r.getLong(1)
          val ch = r.getLong(2); val t = r.getLong(3)
          if (b != cur) { cur = b; seq = 1L; fill = t }
          else if (fill + t <= w) fill += t
          else { seq += 1L; fill = t }
          Row(id, b, ch, seq, t)
        }
      }(enc)
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
