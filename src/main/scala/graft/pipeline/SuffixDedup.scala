package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT substring-level dedup — the suffix-array formulation of
  * "Deduplicating Training Data Makes Language Models Better" (Lee et
  * al. 2021), distributed: every reported token is inside some run of
  * >= `n` tokens that repeats VERBATIM elsewhere in the corpus (within
  * or across documents), and reported spans are maximal unions of such
  * runs. [[Dedup.dupSpanExtract]] is the fast window-merge relaxation
  * of this (every n-window of a span duplicated somewhere, possibly
  * with different partners); this module closes that gap at the cost
  * of log-rounds of global sorts — the write-time exact pass.
  *
  * Construction, all DataFrame ops over (doc, position) rows:
  *
  *  1. Suffixes are DOC-LOCAL (the distributed equivalent of Lee et
  *     al.'s unique-separator concatenation: no match crosses a doc
  *     boundary). Tokens rank by their 60-bit md5 value — any fixed
  *     total order on the alphabet yields a valid suffix ordering, and
  *     this one is reproducible in DuckDB for the oracle.
  *  2. Prefix doubling: rank_k(p) orders suffixes by their first 2^k
  *     tokens; each round dense-ranks (rank_{k-1}(p),
  *     rank_{k-1}(p+2^{k-1})) pairs. The dense rank is the standard
  *     distributed sort + zipWithIndex; ceil(log2(max doc tokens))
  *     rounds TOTAL because suffixes never cross documents — the
  *     round count scales with the longest DOCUMENT, not the corpus.
  *  3. Suffix-array adjacency: sort by (final rank, doc, p) and pair
  *     each suffix with its successor. The longest common prefix of a
  *     suffix with ANY other suffix is achieved at an adjacent entry,
  *     so per-position max-LCP needs only these N-1 pairs.
  *  4. LCP per adjacent pair by greedy descent over the level frames:
  *     at level k, if the two (possibly shifted) suffixes agree on
  *     rank_k, advance by min(2^k, remaining) — two equijoins per
  *     level against the kept rank frame, no random access into
  *     neighbor arrays.
  *  5. dupLen(p) = max LCP with either neighbor; positions with
  *     dupLen >= n contribute the interval [p, p + dupLen - 1];
  *     touching intervals merge per doc (gaps-and-islands on running
  *     max end) into maximal covered spans.
  *
  * Scale posture: every stage is linear in corpus tokens; the doubling
  * rounds are log(max doc length) sorts, each a full shuffle — the
  * same cost family as a global sort, run once per corpus at write
  * time. Level rank frames persist for the LCP descent and release at
  * the end.
  */
object SuffixDedup {

  /** Positions with their maximal duplicated-substring length:
    * `(_did, _len, _p, _dl)` — `_dl` = length of the longest token run
    * starting at `_p` that occurs >= 2 times in the corpus.
    */
  private def dupLengths(df: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    // Initial ranking granularity: suffixes order by the ARRAY of
    // their first min(InitGran, remaining) token hashes — array order
    // is truncated-lexicographic (element-wise, shorter-prefix first),
    // i.e. exactly suffix order over the hash-permuted alphabet at
    // this granularity, so the doubling recurrence composes. (A flat
    // HASH of the 8-token window would not be prefix-compatible:
    // suffixes sharing 5 tokens would sort arbitrarily far apart and
    // suffix-array adjacency would break — caught by the brute-force
    // spec.) Starting at 8 tokens removes the first three doubling
    // rounds outright.
    val InitGran = 8
    val persisted = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    // hashed token arrays, built ONCE and reused by the position
    // explode AND the LCP join below (tokenize + per-token md5 is the
    // dominant per-pass cost)
    val toksH = Dedup.ensureParallelism(df)
      .select(col(idCol).as("_did"),
        transform(TextAnalysis.tokens(col(textCol)),
          t => conv(substring(md5(t), 1, 15), 16, 10).cast("long")).as("_th"))
      .where(size(col("_th")) > 0)
      .localCheckpoint(true)
    persisted += toksH
    val pos = toksH
      .select(col("_did"), size(col("_th")).cast("long").as("_len"), col("_th"),
        explode(sequence(lit(0), size(col("_th")) - 1)).as("_p0"))
      .select(col("_did"), col("_len"), col("_p0").cast("long").as("_p"),
        slice(col("_th"), col("_p0") + 1, lit(InitGran)).as("_ka"))

    // distributed dense rank of (k1, k2) keys: distinct keys sort
    // globally, zipWithIndex assigns contiguous longs (the one RDD use
    // — there is no shuffle-free dense_rank over an unpartitioned
    // window in the DataFrame API)
    def denseRank(keyed: DataFrame): DataFrame = {
      val ranked = keyed.select(col("_k1"), col("_k2")).distinct()
        .orderBy(col("_k1"), col("_k2"))
        .rdd.zipWithIndex
        .map { case (r, i) => (r.getLong(0), r.getLong(1), i) }
        .toDF("_k1", "_k2", "_r")
      keyed.join(ranked, Seq("_k1", "_k2"))
    }

    // rounds double the covered prefix from InitGran up past the
    // longest document: ceil(log2(maxLen / InitGran))
    val maxLen = pos.agg(max(col("_len"))).head().getLong(0)
    var rounds = 0
    while ((InitGran.toLong << rounds) < maxLen) rounds += 1

    // each level materializes EAGERLY with its LINEAGE TRUNCATED
    // (localCheckpoint): every round references the previous level
    // twice (the rank frame and its shifted self-join), so an untrimmed
    // logical plan doubles per round — exponential analysis cost that
    // measured 60 s at sf0.1 and OOM'd the driver building plan
    // strings. A lazy persist alone also leaves each round's
    // zipWithIndex action re-evaluating every prior round (quadratic).
    def keep(frame: DataFrame): DataFrame = {
      val p = frame.localCheckpoint(true)
      persisted += p
      p
    }

    val total = pos.count()
    // level 0: rank by the truncated-prefix array key
    val ranked0 = pos.select(col("_ka")).distinct().orderBy(col("_ka"))
      .rdd.zipWithIndex
      .map { case (r, i) => (r.getSeq[Long](0), i) }
      .toDF("_ka", "_r")
    val rk0 = keep(pos.join(ranked0, Seq("_ka"))
      .select(col("_did"), col("_len"), col("_p"), col("_r")))
    var rk = rk0
    var k = 1
    var stable = false
    while (k <= rounds && !stable) {
      val step = InitGran.toLong << (k - 1)
      val shifted = rk.select(col("_did"), (col("_p") - step).as("_p"),
        col("_r").as("_r2"))
      val paired = rk.join(shifted, Seq("_did", "_p"), "left")
        .select(col("_did"), col("_len"), col("_p"),
          col("_r").as("_k1"), coalesce(col("_r2"), lit(-1L)).as("_k2"))
      rk = keep(denseRank(paired)
        .select(col("_did"), col("_len"), col("_p"), col("_r")))
      // all ranks unique -> the suffix order is final and no later
      // round can change anything; corpora with truly identical
      // suffixes keep iterating until the doubling horizon covers the
      // longest document (the classical termination bound). Ranks are
      // dense, so uniqueness is one cheap max() on the cached frame.
      stable = rk.agg(max(col("_r"))).head().getLong(0) + 1 == total
      k += 1
    }

    // suffix-array order and adjacent pairs. Row-based zipWithIndex
    // keeps the id column's ORIGINAL type (string/int ids work like
    // the sibling Dedup span APIs; a typed-tuple map would force long)
    val ordered = rk.orderBy(col("_r"), col("_did"), col("_p"))
      .select(col("_did"), col("_len"), col("_p"))
    val saRdd = ordered.rdd.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
    }
    val sa = spark.createDataFrame(saRdd,
      ordered.schema.add("_i", org.apache.spark.sql.types.LongType))
    val adj = sa.select(col("_did").as("_ad"), col("_len").as("_al"),
      col("_p").as("_ap"), col("_i"))
      .join(sa.select(col("_did").as("_bd"), col("_len").as("_bl"),
        col("_p").as("_bp"), (col("_i") - 1).as("_i")), "_i")

    // LCP of each adjacent pair, computed WITHIN-ROW against the two
    // docs' hashed token arrays: two joins total (one per side), then
    // a bounded fold over min(remaining-a, remaining-b) positions.
    // The alternative — greedy descent over the doubling levels — is
    // 2 joins PER LEVEL; with documents bounded at thousands of
    // tokens the per-row fold is cheaper than ~20 extra shuffles of
    // the full adjacency frame (measured 3× end-to-end).
    val toksA = toksH.select(col("_did").as("_ad"), col("_th").as("_ta"))
    val toksB = toksH.select(col("_did").as("_bd"), col("_th").as("_tb"))
    val maxCmp = least(col("_al") - col("_ap"), col("_bl") - col("_bp"))
    val lcp = aggregate(
      sequence(lit(0L), maxCmp - 1),
      lit(0L),
      (acc, i) => when(acc === i &&
        element_at(col("_ta"), (col("_ap") + i + 1).cast("int")) ===
          element_at(col("_tb"), (col("_bp") + i + 1).cast("int")),
        acc + 1).otherwise(acc))
    val pairs = adj.join(toksA, "_ad").join(toksB, "_bd")
      .withColumn("_l", when(maxCmp <= 0, lit(0L)).otherwise(lcp))
      .select(col("_ad"), col("_al"), col("_ap"), col("_bd"), col("_bl"),
        col("_bp"), col("_l"))

    val out = pairs.select(col("_ad").as("_did"), col("_al").as("_len"),
      col("_ap").as("_p"), col("_l"))
      .unionByName(pairs.select(col("_bd").as("_did"), col("_bl").as("_len"),
        col("_bp").as("_p"), col("_l")))
      .groupBy(col("_did"), col("_len"), col("_p"))
      .agg(max(col("_l")).as("_dl"))
      .localCheckpoint(true)
    persisted.foreach(_.unpersist(false))
    out
  }

  /** Maximal repeated substrings — the per-repeat INVENTORY only a
    * suffix structure can produce: one row per occurrence `[p, p+L)`
    * of a verbatim-repeated token run with `L >= n` that is maximal
    * (right-maximal because `L = dupLen(p)` is the longest repeat
    * starting at `p`; left-maximal unless the previous position's
    * repeat extends over it, i.e. unless `dupLen(p-1) = dupLen(p)+1`).
    * Output: `(idCol, rep_start, rep_len, rep_text)` with the repeated
    * run's text — the boilerplate/template report behind Lee et al.'s
    * analysis, which the window-merge path cannot express (it knows
    * positions are covered, not WHICH string repeats or how far).
    */
  def maximalRepeats(df: DataFrame, textCol: String, idCol: String,
      n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_did")).orderBy(col("_p"))
    val reps = dupLengths(df, textCol, idCol)
      .withColumn("_prev", lag(col("_dl"), 1).over(w))
      .where(col("_dl") >= n &&
        (col("_prev").isNull || col("_prev") <= col("_dl")))
      .select(col("_did"), col("_p"), col("_dl"))
    val toks = df.select(col(idCol).as("_did"),
      TextAnalysis.tokens(col(textCol)).as("_t"))
    reps.join(toks, "_did")
      .select(col("_did").as(idCol), col("_p").as("rep_start"),
        col("_dl").as("rep_len"),
        array_join(slice(col("_t"), col("_p").cast("int") + 1,
          col("_dl").cast("int")), " ").as("rep_text"))
  }

  /** Maximal EXACT duplicated spans: `(idCol, span_start, span_end,
    * span_tokens)`, inclusive 0-based token indexes — the union of all
    * verbatim-repeated runs of >= `n` tokens, merged per doc. For
    * documents of >= `n` tokens this coverage provably equals the
    * window-merge path's ([[Dedup.dupSpanExtract]]): a token inside a
    * duplicated n-window is inside a verbatim n-repeat and vice versa —
    * pinned by the cross-check spec, which validates both
    * implementations against each other. (Unlike the window path there
    * is no short-document fallback: a run shorter than `n` never
    * reports, exactly Lee et al.'s threshold semantics.)
    */
  def exactDupSpanExtract(df: DataFrame, textCol: String, idCol: String,
      n: Int): DataFrame =
    mergeIntervals(intervals(df, textCol, idCol, n), idCol)

  private def intervals(df: DataFrame, textCol: String, idCol: String,
      n: Int): DataFrame =
    dupLengths(df, textCol, idCol)
      .where(col("_dl") >= n)
      .select(col("_did"), col("_p").as("_s"), (col("_p") + col("_dl") - 1).as("_e"))

  private def mergeIntervals(iv: DataFrame, idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_did")).orderBy(col("_s"), col("_e"))
    val prevMax = max(col("_e")).over(w.rowsBetween(Long.MinValue, -1))
    iv.withColumn("_new",
        when(prevMax.isNull || col("_s") > prevMax + 1, 1).otherwise(0))
      .withColumn("_grp", sum(col("_new")).over(
        w.rowsBetween(Long.MinValue, 0)))
      .groupBy(col("_did"), col("_grp"))
      .agg(min(col("_s")).as("span_start"), max(col("_e")).as("span_end"))
      .select(col("_did").as(idCol), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"))
  }

  /** Rewrite terminal: every token inside an exact duplicated span is
    * cut; survivors re-join into `clean_text` (untouched docs pass
    * through verbatim).
    */
  def exactStripDupSpans(df: DataFrame, textCol: String, idCol: String,
      n: Int): DataFrame = {
    val spans = mergeIntervals(intervals(df, textCol, idCol, n), idCol)
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("span_start").as("s"),
        col("span_end").as("e"))).as("_spans"))
    df.join(spans, Seq(idCol), "left")
      .select(col(idCol), col("_spans"),
        TextAnalysis.tokens(col(textCol)).as("_t"), col(textCol))
      .select(col(idCol),
        when(col("_spans").isNull, col(textCol))
          .otherwise(array_join(
            filter(col("_t"), (t, i) =>
              !exists(col("_spans"), sp =>
                sp("s") <= i.cast("long") && i.cast("long") <= sp("e"))),
            " "))
          .as("clean_text"))
  }
}
