package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-curation operators for training-data pipelines: PII
  * scrubbing, deterministic sampling, split assignment, corpus stats.
  * All pure column expressions / hash-aggregations — scan-speed,
  * shuffle-free except the stats aggregation, and every formula
  * mirrors 1:1 into DuckDB oracle SQL.
  */
object Curation {

  /** Redaction patterns chosen to mean the same thing in Java regex
    * (Spark codegen) and RE2 (DuckDB): no lookarounds, no backrefs.
    * URLs go first so an address inside a URL doesn't leave a stranded
    * scheme behind.
    */
  val UrlPattern = "https?://[^\\s]+"
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\b\\d{3}[-.]\\d{3,4}[-.]\\d{4}\\b"

  /** Blocklist hit report: `(idCol, n_hits)` for documents with at
    * least one occurrence of any blocklist pattern — ALL occurrences
    * counted, overlapping included (byte-exact matching; lower() both
    * sides for case folding). One codegen'd scan through the
    * Aho-Corasick reference object
    * ([[graft.functions.MultiPatternCount]]): per-row cost is one pass
    * over the text regardless of |patterns|, where the compositional
    * `exists(contains)` form scans the text once PER pattern — the
    * difference between a 10-entry demo list and the million-entry
    * domain/word blocklists real curation runs. Filter-side policy
    * (drop, cap, weight) composes downstream of the count.
    */
  def blocklistHits(df: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String]): DataFrame = {
    require(patterns.exists(_.nonEmpty), "empty blocklist")
    df.select(col(idCol),
        graft.functions.MultiPatternCount(col(textCol), patterns).as("n_hits"))
      .where(col("n_hits") > 0)
  }

  /** Replace URLs / emails / phone-shaped numbers with typed
    * placeholder tags. Order matters (see pattern doc).
    */
  def scrubPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, UrlPattern, "<URL>"),
        EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")

  /** 60-bit md5 hash of the id's decimal string — the same
    * hash-family trick as Dedup.shingleHashSet, so the oracle derives
    * identical values and sampling decisions agree bit-for-bit.
    */
  private[graft] def idHash(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long")

  /** Deterministic hash sample: keep a row iff
    * md5hash(id) % den < num. Consistent across runs, machines, and
    * engines (no RNG state, no partition sensitivity) — the property
    * that matters when a 100 TB corpus is re-sampled incrementally:
    * a doc's membership never changes as the corpus grows.
    */
  def hashSample(df: DataFrame, idCol: String, num: Int, den: Int): DataFrame =
    df.where(pmod(idHash(col(idCol)), lit(den.toLong)) < num)

  /** Deterministic seeded global shuffle: assign every row its
    * position in the `md5(id ++ ":" ++ seed)`-ordered permutation of
    * the corpus — the training-order shuffle. Changing the seed
    * produces an unrelated permutation; the same seed replays the
    * exact order on any engine (the hex digest sorts identically
    * everywhere; ties — 128-bit collisions — break by id).
    *
    * Scale shape: one range-partitioned sort on the hash (what any
    * global orderBy costs) plus the standard two-job rank assignment
    * (per-partition counts collected, offsets broadcast — bounded by
    * partition count). A pipeline that only needs the DATA in
    * shuffled order (not the positions) should just `orderBy` the
    * same key and write; the positions exist for manifests, resume
    * points, and cross-engine verification.
    */
  def shuffleOrder(df: DataFrame, idCol: String, seed: String,
      out: String = "shuffle_pos"): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val sorted = df.select(col(idCol),
        md5(concat(col(idCol).cast("string"), lit(":" + seed))).as("_sk"))
      .orderBy(col("_sk"), col(idCol))
    val rdd = sorted.rdd.zipWithIndex.map { case (r, i) => Row(r.get(0), i) }
    df.sparkSession.createDataFrame(rdd, StructType(Seq(
      df.schema(idCol), StructField(out, LongType, nullable = false))))
  }

  /** Curriculum ordering: a deterministic training order that sorts
    * quality buckets first and shuffles WITHIN each bucket (seeded
    * hash order) — easy/high-quality examples first, the standard
    * curriculum recipe, replayable on any engine. Output:
    * `(idCol, bucket, out)` with `out` the 0-based global position.
    * Same scale shape as [[shuffleOrder]]: one distributed range
    * sort + zipWithIndex — no single-partition window.
    */
  def curriculumOrder(df: DataFrame, idCol: String, bucketCol: Column,
      seed: String, out: String = "curriculum_pos"): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val sorted = df.select(col(idCol), bucketCol.cast("long").as("bucket"),
        md5(concat(col(idCol).cast("string"), lit(":" + seed))).as("_sk"))
      .orderBy(col("bucket").desc, col("_sk"), col(idCol))
    val rdd = sorted.rdd.zipWithIndex.map { case (r, i) =>
      Row(r.get(0), r.getLong(1), i)
    }
    df.sparkSession.createDataFrame(rdd, StructType(Seq(
      df.schema(idCol), StructField("bucket", LongType, nullable = false),
      StructField(out, LongType, nullable = false))))
  }

  /** Domain-mix sampling: per-source deterministic keep rates, the
    * operator behind "20% web, 2× wiki epochs, downsample crawl"
    * mixture recipes. A row survives iff `md5hash(id) % den <
    * rates(source)` (sources absent from `rates` use `defaultNum`), so
    * membership is a pure per-row function of (id, source): no RNG, no
    * shuffle, stable under corpus growth AND under rate changes for
    * other sources — re-weighting one domain never churns the others'
    * kept sets. Rates above `den` keep everything (upsampling/multiple
    * epochs is a repeat at read time, not a row multiplication here).
    */
  def sampleByRates(df: DataFrame, srcCol: String, idCol: String,
      rates: Map[String, Int], defaultNum: Int, den: Int): DataFrame = {
    val rate = rates.foldRight(lit(defaultNum): Column) {
      case ((src, num), rest) => when(col(srcCol) === src, lit(num)).otherwise(rest)
    }
    df.where(pmod(idHash(col(idCol)), lit(den.toLong)) < rate)
  }

  /** Quality-weighted sampling: keep each row with probability
    * proportional to a per-row score in [0, 1] (clamped), via the same
    * deterministic id-hash membership as [[sampleByRates]]:
    * `md5hash(id) % den < round(score * den)`. High-quality docs
    * survive preferentially — the DCLM-style quality-weighted mix —
    * with no RNG, no shuffle, and per-row stability under corpus
    * growth. `scoreCol` is any in [0,1] column (e.g. the composite
    * from `TextAnalysis.qualityReport`); scan-speed, filter pushes to
    * the read.
    */
  def sampleByScore(df: DataFrame, idCol: String, scoreCol: Column,
      den: Long = 1000000L): DataFrame = {
    val thr = round(greatest(lit(0.0), least(scoreCol, lit(1.0))) * den)
      .cast("long")
    df.where(pmod(idHash(col(idCol)), lit(den)) < thr)
  }

  /** Temperature-based domain mixing — the standard pretraining
    * recipe one step above fixed per-source rates: sample source `i`
    * with probability `p_i ∝ n_i^alpha` (alpha in (0, 1] flattens the
    * source-size distribution: alpha=1 is proportional = no change,
    * alpha→0 approaches uniform over sources), scaled so the expected
    * kept mass is `targetFrac` of the corpus. Per-source keep rate:
    * `r_i = min(1, targetFrac * N * (w_i / W) / n_i)` with
    * `w_i = n_i^alpha`, `W = Σ w_j`, `N = Σ n_j`; membership uses the
    * same deterministic id-hash discipline as [[sampleByRates]] with a
    * fractional threshold at `den` granularity.
    *
    * Cross-engine determinism: the weights are QUANTIZED to integers
    * (`w_i = round(n_i^alpha * 1e6)`) so the weight sum is exact
    * integer arithmetic, not an order-dependent float reduction; the
    * remaining double expression is a fixed tree both engines evaluate
    * under IEEE semantics (alpha = 0.5 routes through correctly-
    * rounded `sqrt`; other alphas rely on libm pow agreement at the
    * 1e-6 round granularity). Shape: one tiny per-source aggregation
    * broadcast back — the corpus itself is filtered in place, no
    * shuffle, so re-mixing 100 TB is a scan.
    */
  def temperatureMix(df: DataFrame, srcCol: String, idCol: String,
      alpha: Double, targetFrac: Double, den: Long = 1000000L): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha in (0,1], got $alpha")
    val nD = col("_n").cast("double")
    val wQ = round((if (alpha == 0.5) sqrt(nD) else pow(nD, alpha)) * 1000000L)
      .cast("long")
    val counts = df.groupBy(col(srcCol)).agg(count(lit(1)).as("_n"))
      .withColumn("_w", wQ)
    // totals via an unpartitioned window over the per-source frame
    // (#sources rows, one partition) — NOT a second aggregation over
    // `counts`, which would re-run the corpus scan since the tiny
    // frame is not cached. One corpus pass total for the rates.
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val rates = counts
      .withColumn("_nn", sum("_n").over(wAll))
      .withColumn("_ws", sum("_w").over(wAll))
      .select(col(srcCol),
        least(lit(den), round(lit(targetFrac) * col("_nn") * col("_w") /
          col("_ws") / col("_n") * lit(den)).cast("long")).as("_thr"))
    val cols = df.columns.map(col).toSeq
    df.join(broadcast(rates), Seq(srcCol))
      .where(pmod(idHash(col(idCol)), lit(den)) < col("_thr"))
      .select(cols: _*)
  }

  /** Epoch upsampling — the other half of the mixture recipe that
    * [[sampleByRates]] downsamples: emit `num/den` copies of each row
    * (per-source rates, e.g. "2.5× wiki epochs" = num 25, den 10),
    * with the fractional epoch decided by the same deterministic id
    * hash, so expected multiplicity is exactly `num/den` and the
    * chosen rows never churn as other sources' rates change. Output
    * gains an `epoch` column (0-based copy index) so downstream
    * shuffles can spread copies. Pure per-row `explode(sequence(...))`
    * — no shuffle, no RNG, linear output in the configured epoch mass.
    * Rates below `den` degrade to [[sampleByRates]] (0-or-1 copies).
    */
  def upsampleByRates(df: DataFrame, srcCol: String, idCol: String,
      rates: Map[String, Int], defaultNum: Int, den: Int): DataFrame = {
    require(den > 0, s"den must be positive, got $den")
    val rate = rates.foldRight(lit(defaultNum): Column) {
      case ((src, num), rest) => when(col(srcCol) === src, lit(num)).otherwise(rest)
    }
    val copies = (rate.cast("long") / lit(den.toLong)).cast("long") +
      when(pmod(idHash(col(idCol)), lit(den.toLong)) < pmod(rate.cast("long"), lit(den.toLong)),
        lit(1L)).otherwise(lit(0L))
    df.withColumn("_copies", copies)
      .where(col("_copies") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("_copies") - 1)))
      .drop("_copies")
  }

  /** Deterministic train/val/test assignment from the same id hash:
    * bucket = md5hash(id) % den, split by cumulative thresholds.
    * `cuts` are upper bounds per split, e.g.
    * Seq(("train", 90), ("val", 95), ("test", 100)) with den=100.
    */
  def splitAssign(df: DataFrame, idCol: String,
      cuts: Seq[(String, Int)], den: Int): DataFrame = {
    require(cuts.nonEmpty && cuts.last._2 == den, "cuts must cover [0, den)")
    val bucket = pmod(idHash(col(idCol)), lit(den.toLong))
    val split = cuts.init.foldRight(lit(cuts.last._1): Column) {
      case ((name, hi), rest) => when(bucket < hi, lit(name)).otherwise(rest)
    }
    df.withColumn("split", split)
  }

  /** EXACT-proportion stratified split — the complement of
    * [[splitAssign]]'s hash buckets: a hash split only approximates
    * its cuts (binomial drift ~1/√n), so a 30-row stratum (a rare
    * language, a small label) can land 40% in test; here every
    * stratum hits its cut proportions exactly (floor allocation).
    * Within each stratum rows order by `(md5(id), id)` — unbiased,
    * deterministic, engine-portable — and the 1-based rank r of the
    * stratum's n rows takes the first split whose cumulative share
    * covers it: `r·den ≤ cut·n`, all-integer arithmetic. NULL strata
    * form their own stratum (Spark and SQL window partitioning agree
    * on that). Unlike [[splitAssign]] this is NOT append-stable by
    * construction (ranks shift as a stratum grows — exactness and
    * append-stability are mutually exclusive); use the hash split
    * when incremental stability matters more than exact proportions.
    * Output: (idCol, strataCol, split).
    */
  def stratifiedSplit(df: DataFrame, idCol: String, strataCol: String,
      cuts: Seq[(String, Int)], den: Int): DataFrame = {
    require(cuts.nonEmpty && cuts.last._2 == den, "cuts must cover [0, den)")
    require(cuts.map(_._2) == cuts.map(_._2).sorted,
      s"cuts must be cumulative uppers, got ${cuts.map(_._2)}")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    val cw = Window.partitionBy(col(strataCol))
    val ranked = df.select(col(idCol), col(strataCol))
      .withColumn("_r", row_number().over(w).cast("long"))
      .withColumn("_n", count(lit(1)).over(cw))
    val split = cuts.init.foldRight(lit(cuts.last._1): Column) {
      case ((name, hi), rest) =>
        when(col("_r") * lit(den.toLong) <= lit(hi.toLong) * col("_n"),
          lit(name)).otherwise(rest)
    }
    ranked.withColumn("split", split).select(col(idCol), col(strataCol),
      col("split"))
  }

  /** Leakage-safe split: like [[splitAssign]], but the hash key is the
    * doc's near-dup CLUSTER representative (`clusters` =
    * `(doc_id, cluster_id)` exactly as `Dedup.dupClusters` emits —
    * the frame's id column is named `doc_id` regardless of this
    * df's `idCol`), so every member
    * of a near-dup cluster lands in the SAME split — the guard against
    * test-set contamination through paraphrase/boilerplate twins that
    * a per-doc hash split cannot give. Docs outside any cluster key on
    * their own id (identical to [[splitAssign]] for them). One
    * broadcast-or-shuffle join + the same engine-portable md5 bucket.
    */
  def splitAssignByCluster(df: DataFrame, idCol: String,
      clusters: DataFrame, cuts: Seq[(String, Int)], den: Int): DataFrame = {
    val keyed = df.join(
        clusters.select(col("doc_id").as(idCol), col("cluster_id")),
        Seq(idCol), "left")
      .withColumn("_skey", coalesce(col("cluster_id"), col(idCol)))
    splitAssign(keyed, "_skey", cuts, den).drop("_skey", "cluster_id")
  }

  /** Per-source corpus composition — the report behind source-mix
    * decisions (and the input to capPerSource policies). One hash
    * aggregation; scan-speed at any scale.
    */
  def sourceStats(df: DataFrame, srcCol: String, textCol: String): DataFrame =
    df.groupBy(col(srcCol))
      .agg(count(lit(1)).as("docs"),
        sum(length(col(textCol)).cast("long")).as("chars"))

  /** Deterministic per-source cap: keep at most `maxPer` docs per
    * source, chosen by id-hash order — unbiased and reproducible (the
    * same corpus always yields the same kept set, with no RNG or
    * partition sensitivity). NOT append-stable: a newly appended doc
    * that hashes earlier than a kept doc displaces it from the top
    * `maxPer`, so growth can swap members of the kept set — when
    * membership must survive corpus growth, use `hashSample`
    * (threshold membership is per-doc, so appends never evict). The
    * anti-domination guard that stops one crawl domain from swamping
    * the training mix. One window per source; a pathologically hot
    * source is bounded by the same skew discipline as the dedup
    * paths (the window sorts only that source's partition).
    */
  def capPerSource(df: DataFrame, srcCol: String, idCol: String, maxPer: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(srcCol)).orderBy(idHash(col(idCol)), col(idCol))
    df.withColumn("_rk", row_number().over(w))
      .where(col("_rk") <= maxPer).drop("_rk")
  }

  /** Corpus-level statistics: doc count, char count stats, and exact
    * token-count percentiles (exact `percentile`, not approximate —
    * interpolation matches SQL quantile_cont; the single-reduce exact
    * percentile is fine because the aggregation state is the value
    * multiset of ONE numeric column, not the corpus).
    */
  def corpusStats(df: DataFrame, textCol: String): DataFrame = {
    val nTok = TextAnalysis.tokenCount(col(textCol))
    df.select(length(col(textCol)).cast("long").as("_nc"), nTok.as("_nt"))
      .agg(
        count(lit(1)).as("docs"),
        sum(col("_nc")).as("total_chars"),
        round(avg(col("_nc")), 4).as("avg_chars"),
        percentile(col("_nt"), lit(0.5)).as("p50_tokens"),
        percentile(col("_nt"), lit(0.95)).as("p95_tokens"))
  }

  /** Exact per-group quantiles of an INTEGER-valued column, by the
    * count-histogram formulation: the p-quantile is the ceil(p·n)-th
    * smallest value (`percentile_disc` semantics — an actual corpus
    * value, no interpolation; quantile q emits once per requested p
    * even when several p's land on it). Output:
    * `(groupCol, p, q_value)`.
    *
    * Scale shape — the reason this exists next to the single-reduce
    * `percentile` in [[corpusStats]]: the heavy pass is a hash
    * aggregation on (group, value) with map-side combine, so 100 TB
    * reduces to |groups| × |distinct values| rows BEFORE any sort;
    * the cumulative window then runs over that tiny table. A
    * per-group `row_number` sort (the textbook formulation) would
    * funnel each group — 5 languages = 5 tasks — through one
    * executor; this never sorts more than the distinct-value set.
    */
  def exactQuantiles(df: DataFrame, groupCol: String, valCol: String,
      ps: Seq[Double]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(valCol))
    val counts = df.groupBy(col(groupCol), col(valCol))
      .agg(count(lit(1)).as("_c"))
      .withColumn("_cum", sum(col("_c")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      .withColumn("_n", sum(col("_c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))))
    counts
      // value v is the idx-th smallest iff cum-_c < idx <= cum, where
      // idx = ceil(p*n); p*n is exact in double for dyadic p
      .withColumn("p", explode(filter(array(ps.map(lit): _*), p => {
        val idx = ceil(p * col("_n"))
        col("_cum") >= idx && (col("_cum") - col("_c")) < idx
      })))
      .select(col(groupCol), col("p"), col(valCol).as("q_value"))
  }

  /** Quantile-gated selection — dynamic thresholding by KEEP RATE
    * instead of a hand-picked cutoff ("drop the shortest 20%", "keep
    * the top-quality 10%"): keep rows whose integer `valCol` is at or
    * above the corpus's exact `pNum/pDen` quantile (percentile_disc
    * semantics — the threshold is an actual data value, the
    * ceil(p·n)-th smallest, computed ALL-INTEGER as
    * `(pNum·n + pDen − 1) div pDen` so no double p·n ever rounds).
    * The fixed-threshold filters this complements assume the score
    * distribution is known; this one adapts to it — re-running on a
    * shifted corpus keeps the same FRACTION, not the same cutoff.
    *
    * Scale shape: the heavy pass is one groupBy on the VALUE (bounded
    * by the distinct value count, like [[exactQuantiles]]); the
    * threshold derivation windows over those collapsed rows only, and
    * the gate itself is a broadcast of ONE row. Output:
    * `(idCol, valCol)` for kept rows.
    */
  def quantileGate(df: DataFrame, idCol: String, valCol: String,
      pNum: Int, pDen: Int): DataFrame = {
    require(pDen >= 1 && pNum >= 0 && pNum <= pDen,
      s"need 0 <= pNum <= pDen with pDen >= 1: $pNum/$pDen")
    import org.apache.spark.sql.expressions.Window
    // nulls are excluded from the histogram AND from n (percentile_disc
    // semantics) — counting them into n would inflate the index while
    // the value gate can never keep them, silently shrinking the kept
    // fraction of measurable rows below pNum/pDen
    val counts = df.where(col(valCol).isNotNull)
      .groupBy(col(valCol)).agg(count(lit(1)).as("_c"))
      .withColumn("_cum", sum(col("_c")).over(
        Window.orderBy(col(valCol)).rowsBetween(
          Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_n", sum(col("_c")).over(
        Window.partitionBy(lit(1))))
    val thr = counts
      .where(col("_cum") >=
        expr(s"($pNum * _n + ${pDen - 1}) div $pDen"))
      .agg(min(col(valCol)).as("_thr"))
    df.select(col(idCol), col(valCol))
      .crossJoin(broadcast(thr))
      .where(col(valCol) >= col("_thr"))
      .drop("_thr")
  }

  /** [[quantileGate]] per group: every `grpCol` value keeps rows at or
    * above its OWN exact pNum/pDen quantile — per-source dynamic
    * thresholding ("drop every source's shortest 20%"), so a verbose
    * source's cutoff never gates a terse one (the per-source analog of
    * the per-source caps/budgets). Same all-integer index and
    * null-exclusion contract; the histogram groupBy now keys on
    * (group, value) and the thresholds (one row per group) broadcast
    * to the gate join. Output: `(idCol, grpCol, valCol)` kept rows.
    */
  def quantileGateBy(df: DataFrame, grpCol: String, idCol: String,
      valCol: String, pNum: Int, pDen: Int): DataFrame = {
    require(pDen >= 1 && pNum >= 0 && pNum <= pDen,
      s"need 0 <= pNum <= pDen with pDen >= 1: $pNum/$pDen")
    import org.apache.spark.sql.expressions.Window
    val counts = df.where(col(valCol).isNotNull)
      .groupBy(col(grpCol), col(valCol)).agg(count(lit(1)).as("_c"))
      .withColumn("_cum", sum(col("_c")).over(
        Window.partitionBy(col(grpCol)).orderBy(col(valCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_n", sum(col("_c")).over(
        Window.partitionBy(col(grpCol))))
    val thr = counts
      .where(col("_cum") >=
        expr(s"($pNum * _n + ${pDen - 1}) div $pDen"))
      .groupBy(col(grpCol)).agg(min(col(valCol)).as("_thr"))
    df.select(col(idCol), col(grpCol), col(valCol))
      .join(broadcast(thr), Seq(grpCol))
      .where(col(valCol) >= col("_thr"))
      .select(col(idCol), col(grpCol), col(valCol))
  }

  /** Corpus snapshot diff: per-id status between two corpus versions —
    * `added` (only in `newDf`), `removed` (only in `oldDf`), `changed`
    * (both, content hash differs), `unchanged`. The incremental-crawl
    * bookkeeping op: downstream passes (re-dedup, re-index, re-score)
    * run on `added` + `changed` only instead of the full corpus.
    *
    * Shape: md5 content hashes computed in the scan, ONE full outer
    * equi-join on id — the cost of a groupBy over the combined
    * corpora; no collection, no windows. Output:
    * `(idCol, status)`.
    */
  /** Canonicalize an absolute http(s) URL for crawl dedup — the
    * CCNet/RefinedWeb-style keying where `HTTPS://WWW.Site.COM:443/a/?
    * utm_source=x&b=2&a=1#frag` and `https://site.com/a?a=1&b=2` are
    * the same document. Rules (each a pure codegen'd string op, no
    * UDF; every regex is lookahead-free so the DuckDB oracle runs the
    * SAME patterns under RE2):
    *   1. trim; strip the `#fragment`;
    *   2. scheme and host lowercase; a leading `www.` strips;
    *   3. the SCHEME'S default port drops (`:80` for http, `:443` for
    *      https) — a genuinely non-default port like `http://h:443/x`
    *      is identity-bearing and stays;
    *   4. trailing `/` runs on the path strip (root `/` == no path);
    *   5. tracking params (`utm_*`, `fbclid`, `gclid`, `ref`) drop,
    *      survivors sort lexicographically (param order never encodes
    *      identity in practice), empty query drops its `?`. Known
    *      conflation risk, accepted: on sites where `ref=` is
    *      content-bearing (a code-hosting branch ref, not a referral
    *      tag) two distinct pages share a key — the CCNet-style
    *      trade; scope the drop list per-corpus if that bites.
    * Non-absolute inputs (no `scheme://`) pass through lowercased —
    * callers feed crawl URLs, which are absolute by construction.
    */
  def normalizeUrl(url: Column): Column = {
    val u = regexp_replace(trim(url), "#.*$", "")
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostRaw = lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val hostBase = regexp_replace(hostRaw, "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(hostBase, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostBase, ":443$", ""))
      .otherwise(hostBase)
    val path = regexp_replace(
      regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1),
      "/+$", "")
    val qs = regexp_extract(u, "\\?([^#]*)", 1)
    val kept = array_join(array_sort(filter(split(qs, "&"),
      p => !(p === "" || p.startsWith("utm_") || p.startsWith("fbclid=") ||
        p.startsWith("gclid=") || p.startsWith("ref=")))), "&")
    when(scheme === "", lower(trim(url)))
      .otherwise(concat(scheme, lit("://"), host, path,
        when(kept === "", lit("")).otherwise(concat(lit("?"), kept))))
  }

  /** Crawl dedup by canonical URL: one row per canonical form with the
    * min-id representative and the duplicate count — the groupBy is on
    * the canonical STRING, so at 100 TB it is a plain hash aggregation
    * with map-side combine, no pair materialization.
    */
  def urlDedup(df: DataFrame, urlCol: String, idCol: String): DataFrame =
    df.groupBy(normalizeUrl(col(urlCol)).as("url_canon"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dups"))

  /** Hashed n-gram feature buckets of one document — the DSIR feature
    * map (Xie et al. 2023, "Data Selection for Language Models via
    * Importance Resampling"): unigrams plus adjacent bigrams of the
    * canonical tokenizer, each hashed into `buckets` buckets by the
    * portable 60-bit md5 family (the same trick as
    * [[Dedup.shingleHashSet]], so the oracle derives identical
    * buckets). Input is a STAGED token-array column, not raw text —
    * referencing the tokenizer expression from the three feature
    * sub-expressions would inline three copies of the split into the
    * plan.
    */
  // NOTE (r17 audit): `toks` is referenced four times below, but every
  // caller passes an ALIASED attribute from a separate projection and
  // CollapseProject declines to inline non-cheap multi-referenced
  // aliases — so the tokenizer already runs once per row. A letEval
  // binding was built and measured SLOWER (ProbeAB dsir 2.46 → 2.65 s:
  // the wrapper costs more than the attribute reads it saves) — the
  // plain form is kept deliberately.
  private[graft] def dsirBuckets(toks: Column, buckets: Int): Column = {
    val bigrams = when(size(toks) >= 2,
      transform(sequence(lit(0), size(toks) - 2),
        i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2))))
      .otherwise(array().cast("array<string>"))
    transform(concat(toks, bigrams), f =>
      pmod(conv(substring(md5(f), 1, 15), 16, 10).cast("long"),
        lit(buckets.toLong)))
  }

  /** The smoothed hashed-feature histogram of a corpus as a log-prob
    * array: `ln((c_b + 1) / (N + B))` per bucket. ONE scan + a
    * B-bucket hash aggregation; the collect is bounded by `buckets`
    * (same bounded-collect discipline as the IVF centroid pulls).
    */
  private def dsirLogProbs(df: DataFrame, textCol: String,
      buckets: Int): Array[Double] = {
    val counts = df
      .select(TextAnalysis.tokens(col(textCol)).as("_toks"))
      .select(explode(dsirBuckets(col("_toks"), buckets)).as("_b"))
      .groupBy("_b").count().collect()
      .map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    val n = counts.valuesIterator.sum.toDouble
    Array.tabulate(buckets)(b =>
      math.log((counts.getOrElse(b, 0L) + 1.0) / (n + buckets)))
  }

  /** DSIR importance log-weights (Xie et al. 2023): score every raw
    * document by how much more likely its hashed n-gram features are
    * under the TARGET distribution than under the RAW distribution —
    * `logw(x) = sum_f [ln p_target(f) - ln p_raw(f)]` over the doc's
    * unigram+bigram features, add-one smoothed over `buckets` hashed
    * buckets. High-weight documents look like the target domain;
    * resampling raw data by these weights shifts a 100 TB crawl
    * toward a small high-quality target corpus without training a
    * classifier.
    *
    * Scale shape: the two distributions cost one scan each and
    * collect only `buckets` counts; the per-bucket log-ratio bakes
    * into ONE literal array, so scoring is a single codegen'd
    * scan — a per-row HOF fold over the feature array with an array
    * index per feature. No join, no shuffle, no UDF. Per-bucket
    * ratios are rounded to 4 decimals before the fold and the final
    * weight after it (the lm-score double discipline, so the oracle
    * sums the same values in any order). Output:
    * `(idCol, n_feats, dsir_logw)`; tokenless docs score 0.0.
    */
  def dsirWeights(raw: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String,
      buckets: Int = 1024): DataFrame = {
    val ratio = dsirLogRatio(raw, textCol, target, targetTextCol, buckets)
    dsirScoreScan(raw, idCol, textCol, ratio)
  }

  /** The scoring scan of [[dsirWeights]], shared with the split-fit
    * form. The select-chain staging (alias per stage) is deliberate:
    * CollapseProject keeps non-cheap multi-referenced aliases in their
    * own projections, so `_toks` and `_fb` each compute once per row
    * (an inline-Generate barrier variant measured slower — r17 audit).
    */
  private def dsirScoreScan(raw: DataFrame, idCol: String, textCol: String,
      ratio: Array[Double]): DataFrame =
    raw
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("_toks"))
      .select(col(idCol), dsirBuckets(col("_toks"), ratio.length).as("_fb"))
      .select(col(idCol), size(col("_fb")).cast("long").as("n_feats"),
        dsirScore(col("_fb"), ratio).as("dsir_logw"))

  /** The fitted per-bucket DSIR log-ratio table
    * `round(ln p_target(b) - ln p_raw(b), 4)` — the whole trained
    * "model" of [[dsirWeights]], exposed so a streaming quality filter
    * can bake it into a stateless per-row expression. HALF_UP to 4
    * decimals — what Spark SQL round() and DuckDB round() both do, so
    * an oracle's round(ln(..)-ln(..), 4) produces these exact doubles.
    */
  def dsirLogRatio(raw: DataFrame, textCol: String, target: DataFrame,
      targetTextCol: String, buckets: Int = 1024): Array[Double] = {
    require(buckets > 0 && buckets <= (1 << 20),
      s"buckets must be in [1, 2^20], got $buckets")
    val lp = dsirLogProbs(target, targetTextCol, buckets)
    val lq = dsirLogProbs(raw, textCol, buckets)
    Array.tabulate(buckets) { b =>
      BigDecimal(lp(b) - lq(b))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
  }

  /** [[dsirWeights]] when raw and target PARTITION one frame (the
    * in-corpus configuration: score the raw split against a held-out
    * target split of the same table): both per-bucket histograms come
    * from ONE tokenize + bucket + count pass over `all`, tagged by the
    * predicate, instead of two full filtered scans (§1.2 — the fit was
    * two of the query's three corpus passes). Counts per side are
    * identical to the two-scan form by construction (the predicate
    * partitions the rows), so the fitted ratio — and therefore every
    * output row — is bit-identical. Rows where `isTarget` evaluates
    * to null fall out of BOTH sides, exactly as two complementary
    * `where` filters drop them.
    */
  def dsirWeightsSplit(all: DataFrame, idCol: String, textCol: String,
      isTarget: Column => Column, buckets: Int = 1024): DataFrame = {
    val ratio = dsirLogRatioSplit(all, idCol, textCol, isTarget, buckets)
    dsirScoreScan(all.where(!isTarget(col(idCol))), idCol, textCol, ratio)
  }

  /** [[dsirLogRatio]] fitted from one pass — see [[dsirWeightsSplit]]. */
  def dsirLogRatioSplit(all: DataFrame, idCol: String, textCol: String,
      isTarget: Column => Column, buckets: Int = 1024): Array[Double] = {
    require(buckets > 0 && buckets <= (1 << 20),
      s"buckets must be in [1, 2^20], got $buckets")
    val rows = all
      .select(isTarget(col(idCol)).as("_t"),
        TextAnalysis.tokens(col(textCol)).as("_toks"))
      .where(col("_t").isNotNull)
      .select(col("_t"), explode(dsirBuckets(col("_toks"), buckets)).as("_b"))
      .groupBy(col("_t"), col("_b")).count().collect()
    def logProbs(t: Boolean): Array[Double] = {
      val m = rows.filter(_.getBoolean(0) == t)
        .map(r => r.getLong(1).toInt -> r.getLong(2)).toMap
      val n = m.valuesIterator.sum.toDouble
      Array.tabulate(buckets)(b =>
        math.log((m.getOrElse(b, 0L) + 1.0) / (n + buckets)))
    }
    val lp = logProbs(true)
    val lq = logProbs(false)
    Array.tabulate(buckets) { b =>
      BigDecimal(lp(b) - lq(b))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
  }

  /** Per-row importance log-weight of a STAGED feature-bucket array
    * column against a fitted log-ratio table: a codegen'd fold with an
    * array index per feature, rounded to 4dp. */
  private[graft] def dsirScore(fb: Column, ratio: Array[Double]): Column =
    round(aggregate(fb, lit(0.0),
      (acc, b) => acc + element_at(typedLit(ratio), (b + 1).cast("int"))),
      4)


  /** Gumbel-top-k DSIR selection — the paper's sampling-without-
    * replacement step made deterministic and engine-portable: each
    * doc's key is its (rounded) importance log-weight plus a Gumbel
    * draw `-ln(-ln(u))` whose uniform comes from the md5 id-hash
    * family (`u = (h mod 2^30 + 0.5) / 2^30`, never 0 or 1), so the
    * sample is exactly replayable anywhere and changing `seed` redraws
    * it. Selecting the top `k` keys IS Gumbel-max sampling by the
    * softmax of the weights. ONE TakeOrdered (global top-k, no full
    * sort materialization) over the scored scan. Output:
    * `(idCol, sel_rank)`, rank 1-based in key order.
    */
  def dsirSample(raw: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String, k: Int,
      seed: String = "dsir", buckets: Int = 1024): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val u = (pmod(idHash(concat(col(idCol).cast("string"), lit(":" + seed))),
      lit(1L << 30)).cast("double") + 0.5) / (1L << 30).toDouble
    val key = col("dsir_logw") + round(-log(-log(u)), 4)
    import org.apache.spark.sql.expressions.Window
    dsirWeights(raw, idCol, textCol, target, targetTextCol, buckets)
      .select(col(idCol), key.as("_key"))
      .orderBy(col("_key").desc, col(idCol)).limit(k)
      .select(col(idCol), row_number().over(
        Window.orderBy(col("_key").desc, col(idCol))).cast("long")
        .as("sel_rank"))
  }

  /** [[dsirSample]] over the one-pass split fit ([[dsirWeightsSplit]]) —
    * same keys, same selection, one fewer corpus scan. */
  def dsirSampleSplit(all: DataFrame, idCol: String, textCol: String,
      isTarget: Column => Column, k: Int, seed: String = "dsir",
      buckets: Int = 1024): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val u = (pmod(idHash(concat(col(idCol).cast("string"), lit(":" + seed))),
      lit(1L << 30)).cast("double") + 0.5) / (1L << 30).toDouble
    val key = col("dsir_logw") + round(-log(-log(u)), 4)
    import org.apache.spark.sql.expressions.Window
    dsirWeightsSplit(all, idCol, textCol, isTarget, buckets)
      .select(col(idCol), key.as("_key"))
      .orderBy(col("_key").desc, col(idCol)).limit(k)
      .select(col(idCol), row_number().over(
        Window.orderBy(col("_key").desc, col(idCol))).cast("long")
        .as("sel_rank"))
  }

  /** Deterministic token-budget dataset assembly: within each source,
    * rank documents best-first (`scoreCol` DESC, id tiebreak) and keep
    * the maximal prefix whose RUNNING token total stays within the
    * source's budget — "give me the best N billion tokens per domain",
    * the final selection step of a training-mix recipe. Cumulative
    * sums are monotone (token counts are nonnegative), so the
    * `cum <= budget` filter IS a rank prefix: the kept set is
    * deterministic, engine-portable, and stable under re-runs.
    *
    * Scale shape: ONE hash-partitioned window per source (the shuffle
    * any per-group ranking costs) — no self-join, no iteration. The
    * budget map is a bounded literal CASE; sources absent from it get
    * `defaultBudget`. Output:
    * `(idCol, srcCol, tokensCol, cum_tokens)` for kept rows.
    */
  def tokenBudgetSelect(df: DataFrame, srcCol: String, idCol: String,
      tokensCol: String, scoreCol: String, budgets: Map[String, Long],
      defaultBudget: Long = 0L): DataFrame = {
    require(defaultBudget >= 0 && budgets.values.forall(_ >= 0),
      "budgets must be nonnegative")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(srcCol))
      .orderBy(col(scoreCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val budget = budgets.toSeq.sortBy(_._1).foldLeft(lit(defaultBudget)) {
      case (acc, (k, v)) => when(col(srcCol) === k, lit(v)).otherwise(acc)
    }
    df.withColumn("cum_tokens", sum(col(tokensCol)).over(w).cast("long"))
      .where(col("cum_tokens") <= budget)
      .select(col(idCol), col(srcCol), col(tokensCol), col("cum_tokens"))
  }

  /** [[tokenBudgetSelect]] keyed by a COMPOSITE group — the per-tenant
    * form of the topic-balanced assembly: each (tenant, cluster) cell
    * gets the same uniform token cap, so no tenant's dense topic can
    * eat another tenant's share of that topic. Still ONE window (the
    * composite key is just more partition columns); a per-cell budget
    * MAP would be |tenants|·|clusters| literals — at that point the
    * budgets belong in a small broadcast-joined table, which callers
    * can do with the same cum_tokens column this emits.
    */
  def tokenBudgetSelectBy(df: DataFrame, grpCols: Seq[String],
      idCol: String, tokensCol: String, scoreCol: String,
      budget: Long): DataFrame = {
    require(grpCols.nonEmpty, "need at least one group column")
    require(budget >= 0, "budget must be nonnegative")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(grpCols.map(col): _*)
      .orderBy(col(scoreCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_tokens", sum(col(tokensCol)).over(w).cast("long"))
      .where(col("cum_tokens") <= budget)
      .select((col(idCol) +: grpCols.map(col)) ++
        Seq(col(tokensCol), col("cum_tokens")): _*)
  }

  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val o = oldDf.select(col(idCol), md5(col(textCol)).as("_ho"))
    val n = newDf.select(col(idCol), md5(col(textCol)).as("_hn"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("_ho").isNull, lit("added"))
          .when(col("_hn").isNull, lit("removed"))
          .when(col("_ho") =!= col("_hn"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }
}
