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

    val pos = Dedup.ensureParallelism(df)
      .select(col(idCol).as("_did"), TextAnalysis.tokens(col(textCol)).as("_t"))
      .select(col("_did"), size(col("_t")).cast("long").as("_len"),
        posexplode(col("_t")).as(Seq("_p", "_tok")))
      .select(col("_did"), col("_len"), col("_p").cast("long").as("_p"),
        conv(substring(md5(col("_tok")), 1, 15), 16, 10).cast("long").as("_h"))

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

    val maxLen = pos.agg(max(col("_len"))).head().getLong(0)
    val rounds = math.max(1,
      64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, maxLen - 1))).toInt

    val persisted = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def keep(frame: DataFrame): DataFrame = {
      val p = frame.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      persisted += p
      p
    }

    // level 0: rank by the token itself
    val rk0 = keep(denseRank(pos.select(col("_did"), col("_len"), col("_p"),
      col("_h").as("_k1"), lit(-1L).as("_k2")))
      .select(col("_did"), col("_len"), col("_p"), col("_r")))
    val levels = scala.collection.mutable.ArrayBuffer(rk0)
    var rk = rk0
    for (k <- 1 to rounds) {
      val step = 1L << (k - 1)
      val shifted = rk.select(col("_did"), (col("_p") - step).as("_p"),
        col("_r").as("_r2"))
      val paired = rk.join(shifted, Seq("_did", "_p"), "left")
        .select(col("_did"), col("_len"), col("_p"),
          col("_r").as("_k1"), coalesce(col("_r2"), lit(-1L)).as("_k2"))
      rk = keep(denseRank(paired)
        .select(col("_did"), col("_len"), col("_p"), col("_r")))
      levels += rk
    }

    // suffix-array order and adjacent pairs
    val sa = rk.orderBy(col("_r"), col("_did"), col("_p"))
      .rdd.zipWithIndex
      .map { case (r, i) => (r.getLong(0), r.getLong(1), r.getLong(2), i) }
      .toDF("_did", "_len", "_p", "_i")
    val adj = sa.select(col("_did").as("_ad"), col("_len").as("_al"),
      col("_p").as("_ap"), col("_i"))
      .join(sa.select(col("_did").as("_bd"), col("_len").as("_bl"),
        col("_p").as("_bp"), (col("_i") - 1).as("_i")), "_i")
      .select(col("_ad"), col("_al"), col("_ap"), col("_bd"), col("_bl"),
        col("_bp"), lit(0L).as("_l"))

    // greedy LCP descent, high level to low
    var pairs = adj
    for (k <- rounds to 0 by -1) {
      val lvl = levels(k)
      val step = 1L << k
      val ra = lvl.select(col("_did").as("_ad"), col("_p").as("_qa"),
        col("_r").as("_ra"))
      val rb = lvl.select(col("_did").as("_bd"), col("_p").as("_qb"),
        col("_r").as("_rb"))
      pairs = pairs
        .withColumn("_qa", col("_ap") + col("_l"))
        .withColumn("_qb", col("_bp") + col("_l"))
        .join(ra, Seq("_ad", "_qa"), "left")
        .join(rb, Seq("_bd", "_qb"), "left")
        .withColumn("_l",
          when(col("_ra").isNotNull && col("_rb").isNotNull &&
            col("_ra") === col("_rb"),
            col("_l") + least(lit(step),
              col("_al") - col("_qa"), col("_bl") - col("_qb")))
            .otherwise(col("_l")))
        .drop("_qa", "_qb", "_ra", "_rb")
    }

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
