package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, TimestampNTZType, TimestampType}

/** Temporal alignment operators for training pipelines: joining each
  * example to the LATEST feature/label state known at its timestamp
  * (point-in-time-correct feature backfill — the join that prevents
  * label leakage in time-split training data).
  *
  * Both operators are per-key window computations, so their inherent
  * scale caveat is a pathologically HOT key serializing into one task.
  * Each takes a `saltBuckets` knob that splits every key's timeline
  * into equal time spans and windows per (key, span) instead — results
  * stay bit-identical (the as-of join carries each span's closing
  * right-value into the next span as a synthetic boundary row; the
  * rolling count duplicates rows near a span edge into the next span
  * as ghost peers that are counted but never emitted), while the hot
  * key's work spreads over saltBuckets tasks.
  */
object Temporal {

  /** Hard cap on how many buckets one interval may explode into in
    * [[rangeJoin]]: the effective bucket width is clamped so the
    * LONGEST right-side interval covers at most this many buckets.
    * 4096 keeps the per-row `sequence` array far below Spark's element
    * limit and executor memory while still spreading a hot key's
    * timeline over thousands of join blocks.
    */
  val MaxBucketsPerInterval = 4096L

  /** `TIMESTAMP_NTZ` view as an instant: Spark forbids a direct
    * numeric cast of NTZ, so route through `TimestampType` — the
    * standard NTZ→TZ cast interprets the wall clock in the SESSION
    * time zone. graft entry points (Bench, Verify, Gateway, specs)
    * all pin `spark.sql.session.timeZone=UTC`, under which this is
    * exactly the DuckDB/parquet-NTZ semantic (wall clock == UTC
    * instant). Under any fixed-offset session zone results stay
    * internally consistent (the mapping is monotonic).
    */
  private def asInstant(dt: DataType, c: Column): Column = dt match {
    case TimestampNTZType => c.cast(TimestampType)
    case _ => c
  }

  /** As-of join: for each left row, the latest `rightValCol` whose
    * `tsCol` is <= the left row's (per `keyCol`); null when no right
    * row precedes. Equal timestamps count as "known" (inclusive,
    * `a.ts >= b.ts`); right-side timestamp collisions resolve to the
    * MAX value so the result is deterministic at any parallelism.
    * Output: `(leftIdCol, keyCol, tsCol, out)`.
    *
    * `direction = "forward"` flips the match to the EARLIEST right row
    * at or after the left timestamp (label-lookahead alignment) — the
    * same machinery run on a negated time axis. `toleranceSec` follows
    * the pandas `merge_asof(tolerance=...)` contract: `None` (default)
    * = unbounded matching, `Some(t)` nulls out matches staler
    * (backward) / farther ahead (forward) than `t` seconds — so
    * `Some(0)` is a REAL zero-width tolerance (equal-timestamp matches
    * only), not a disable sentinel. A post-condition on the matched
    * row, zero extra plan cost.
    *
    * Shape — the scalable as-of formulation: tag both sides, union,
    * and take a running `last(value, ignoreNulls)` over a per-key
    * time-ordered window (right rows sort before left rows at equal
    * timestamps). ONE shuffle by key and a per-key sort; no range
    * self-join, no per-row right-side scan, so a 100 TB event stream
    * pays exactly what a groupBy over it would. `saltBuckets > 1`
    * adds one small aggregation (global time bounds) and one
    * right-side shuffle, in exchange for hot-key spread.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, leftIdCol: String, rightValCol: String,
      out: String = "asof_value", saltBuckets: Int = 1,
      direction: String = "backward",
      toleranceSec: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    toleranceSec.foreach(t => require(t >= 0L,
      s"toleranceSec must be >= 0 (None = unbounded), got $t"))
    val fwd = direction == "forward"
    // The matched value rides inside a struct so that a right row whose
    // value is genuinely NULL is still a non-null window entry: the
    // running last() tracks row PRESENCE, and the NULL value propagates
    // to the output instead of falling back to an older right row. The
    // right row's epoch-µs timestamp rides along for the tolerance
    // post-condition.
    val rg = right.groupBy(col(keyCol), col(tsCol))
      .agg(max(col(rightValCol)).as("_rv"))
    val r = rg.select(col(keyCol), col(tsCol), lit(0).as("_side"),
      struct(col("_rv").as("v"), usCol(rg, tsCol).as("t")).as("_rrow"),
      lit(null).cast(left.schema(leftIdCol).dataType).as("_lid"))
    val l = left.select(col(keyCol), col(tsCol), lit(1).as("_side"),
      lit(null).cast(r.schema("_rrow").dataType).as("_rrow"),
      col(leftIdCol).as("_lid"))
    val u = r.unionByName(l)

    def finish(df: DataFrame, w: org.apache.spark.sql.expressions.WindowSpec) = {
      val base = df.withColumn("_m", last(col("_rrow"), ignoreNulls = true).over(w))
        .where(col("_side") === 1)
      val v = toleranceSec match {
        case None => col("_m")("v")
        case Some(tol) =>
          val lUs = usCol(base, tsCol)
          val gap = if (fwd) col("_m")("t") - lUs else lUs - col("_m")("t")
          // null gap (no match) falls through to the null value anyway
          when(gap > tol * 1000000L, lit(null).cast(
            base.schema("_m").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
              .apply("v").dataType))
            .otherwise(col("_m")("v"))
      }
      base.select(col("_lid").as(leftIdCol), col(keyCol), col(tsCol),
        v.as(out))
    }

    def plainW = Window.partitionBy(col(keyCol))
      .orderBy(if (fwd) col(tsCol).desc else col(tsCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    if (saltBuckets <= 1) {
      finish(u, plainW)
    } else {
      // Timeline as a double: epoch micros stay exactly distinct in a
      // 53-bit mantissa, and plain longs cast losslessly — one numeric
      // axis for bucketing AND in-bucket ordering, any ts type (NTZ
      // routes through TimestampType first; see [[asInstant]]).
      // Forward direction negates the axis; everything downstream
      // (bucketing, span carry, boundary ranks) is direction-blind.
      val axis = asInstant(u.schema(tsCol).dataType, col(tsCol)).cast("double")
      val b0 = u.withColumn("_us", if (fwd) -axis else axis)
      val bounds = b0.agg(min(col("_us")), max(col("_us"))).head()
      if (bounds.isNullAt(0)) {
        return finish(u, plainW) // empty input: nothing to salt
      }
      val (tmin, tmax) = (bounds.getDouble(0), bounds.getDouble(1))
      val width = math.max((tmax - tmin) / saltBuckets, 1e-9)
      val b = b0.withColumn("_bkt",
        least(floor((col("_us") - tmin) / width), lit(saltBuckets - 1L)).cast("int"))
      // last right row per occupied (key, span) — the span's closing value
      val rb = b.where(col("_side") === 0)
        .groupBy(col(keyCol), col("_bkt"))
        .agg(max_by(col("_rrow"), col("_us")).as("_lastr"))
      // spans that contain left rows and therefore need a carry-in
      val lb = b.where(col("_side") === 1)
        .select(col(keyCol), col("_bkt")).distinct()
      // carry-in for span k = closing value of the latest span < k:
      // order right-span rows AFTER left-span markers at the same span,
      // so the running last() sees strictly-earlier spans only. This
      // frame has at most one row per (key, span, side) — tiny.
      val cw = Window.partitionBy(col(keyCol))
        .orderBy(col("_bkt").asc, col("_o").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val frame = rb.select(col(keyCol), col("_bkt"), lit(1).as("_o"), col("_lastr"))
        .unionByName(lb.select(col(keyCol), col("_bkt"), lit(0).as("_o"),
          lit(null).cast(rb.schema("_lastr").dataType).as("_lastr")))
      val boundary = frame
        .withColumn("_carry", last(col("_lastr"), ignoreNulls = true).over(cw))
        .where(col("_o") === 0 && col("_carry").isNotNull)
        .select(col(keyCol), col("_bkt"), lit(-1).as("_side"),
          col("_carry").as("_rrow"),
          lit(null).cast(l.schema("_lid").dataType).as("_lid"),
          lit(null).cast(left.schema(tsCol).dataType).as(tsCol),
          lit(null).cast("double").as("_us"))
      // boundary rows sort before every real row of their span (rank
      // 0 vs 1) — immune to any floating-point edge in span start
      val all = b.unionByName(boundary)
        .withColumn("_rank", when(col("_side") === -1, 0).otherwise(1))
      val w = Window.partitionBy(col(keyCol), col("_bkt"))
        .orderBy(col("_rank").asc, col("_us").asc, col("_side").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      finish(all, w)
    }
  }

  /** Range (interval) join: every (left point, right interval) pair
    * with the same key where `startCol <= tsCol <= endCol` — the
    * point-in-interval join behind session attribution, exposure
    * windows, and label-window alignment. Inner join; output = the
    * key, then the remaining left columns, then the right columns,
    * one row per matching pair. Rows whose interval is inverted
    * (`start > end`) match nothing, exactly as SQL `BETWEEN`.
    *
    * Shape — the bin-bucketed equi-join formulation (how warehouse
    * engines execute range joins when given a bin-size hint): a plain
    * `l.key = r.key AND l.ts BETWEEN r.s AND r.e` plan degenerates to
    * per-key nested-loop filtering inside a sort-merge join — a hot
    * key serializes. Instead both sides bucket the TIME axis: a point
    * lands in `floor(ts / W)`, an interval explodes over the buckets
    * it covers, and the join becomes an equi-join on `(key, bucket)`
    * with the exact `BETWEEN` as a post-filter. Each true pair meets
    * in EXACTLY one bucket (the point's), so no dedup pass is needed.
    * Cost: the interval side inflates by `len/W + 1` rows; hash
    * parallelism is `key × occupied-bucket`, so a hot key spreads
    * across its timeline — same discipline as [[rollingCount]]'s
    * spans, without ghosts because pairs, not window frames, are the
    * output.
    *
    * `bucketWidthSec = 0` derives the width from the data as the MAX
    * interval length (one aggregation): every interval then covers at
    * most 2 buckets (inflation bound 2×), the right tradeoff when
    * interval lengths are comparable. Corpora mixing rare huge
    * intervals into mostly-short ones should pass an explicit width
    * near the TYPICAL length instead — long intervals inflate but the
    * bucket grain stays fine.
    *
    * NOTE: this builder runs ONE small aggregation job eagerly (max
    * interval length over the right side) at construction time — in
    * the width=0 path to derive the width, and in the explicit-width
    * path to bound it: the effective width is clamped to at least
    * `maxIntervalLen / MaxBucketsPerInterval`, so one pathological
    * year-long interval combined with `bucketWidthSec = 1` explodes
    * into at most `MaxBucketsPerInterval + 1` rows instead of ~31M
    * (a per-row array that OOMs an executor). Any width is CORRECT
    * (the `BETWEEN` post-filter is exact and each true pair still
    * meets in exactly one bucket); the clamp only coarsens the grain
    * for outlier intervals.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, startCol: String, endCol: String,
      bucketWidthSec: Long = 0): DataFrame = {
    def usOf(df: DataFrame, c: String): Column = df.schema(c).dataType match {
      case TimestampType | TimestampNTZType =>
        unix_micros(asInstant(df.schema(c).dataType, col(c)))
      case _ => (col(c).cast("double") * 1000000L).cast("long")
    }
    val r0 = right.where(col(startCol) <= col(endCol))
      .withColumn("_sus", usOf(right, startCol))
      .withColumn("_eus", usOf(right, endCol))
    val maxLenUs = {
      val m = r0.agg(max(col("_eus") - col("_sus"))).head()
      if (m.isNullAt(0)) 0L else math.max(m.getLong(0), 0L)
    }
    val widthUs =
      if (bucketWidthSec > 0)
        // explode bound: the longest interval spans at most
        // MaxBucketsPerInterval buckets at the effective width
        math.max(bucketWidthSec * 1000000L,
          maxLenUs / MaxBucketsPerInterval + 1)
      else if (maxLenUs == 0L) 1000000L
      else math.max(maxLenUs, 1L)
    val l = left.withColumn("_lus", usOf(left, tsCol))
      .withColumn("_bkt", floor(col("_lus") / widthUs))
    val r = r0.withColumn("_bkt",
      explode(sequence(floor(col("_sus") / widthUs),
        floor(col("_eus") / widthUs))))
    l.join(r, Seq(keyCol, "_bkt"))
      .where(col("_lus").between(col("_sus"), col("_eus")))
      .drop("_bkt", "_lus", "_sus", "_eus")
  }

  /** Trailing-window activity count: for each row, how many OTHER rows
    * of the same key fall within `windowSec` seconds at or before its
    * timestamp — the standard point-in-time rate/velocity feature
    * ("events by this user in the last hour"). A value-RANGE window
    * frame, so equal-timestamp peers are counted identically at any
    * parallelism (both engines define RANGE frames by value, peers
    * included); the row itself is excluded. One shuffle by key, one
    * per-key sort — same cost envelope as [[asofJoin]].
    *
    * `saltBuckets > 1` splits each key's timeline into equal spans (at
    * least `windowSec` wide, so a trailing frame reaches back at most
    * one span): rows within `windowSec` of a span's end are duplicated
    * into the next span as GHOST peers — counted by the frame, never
    * emitted — keeping counts exact while a hot key's sort spreads
    * across spans.
    */
  def rollingCount(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, windowSec: Long, out: String = "n_prior",
      saltBuckets: Int = 1): DataFrame =
    rollingOver(df, keyCol, tsCol, idCol, windowSec, saltBuckets, Nil,
      w => count(lit(1)).over(w) - 1, out)

  /** Trailing-window SUM of `valCol` over the same frame contract as
    * [[rollingCount]] (equal-ts peers in, self out) — the velocity
    * feature's value sibling ("spend by this user in the last hour").
    * Null values contribute 0.
    *
    * Values are quantized to µ-units (round(v * 1e6) as long) and
    * summed in exact integer arithmetic, then scaled back — float
    * window sums accumulate in engine-specific association order
    * (Spark scans the frame linearly, DuckDB merges a segment tree),
    * so a double sum is NOT bit-portable; the fixed-point sum is, at
    * any parallelism (the PageRank / temperatureMix reproducibility
    * trick). Same one-shuffle shape and `saltBuckets` ghost machinery
    * as the count.
    */
  def rollingSum(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valCol: String, windowSec: Long,
      out: String = "sum_prior", saltBuckets: Int = 1): DataFrame = {
    val q = coalesce(round(col(valCol) * 1000000L).cast("long"), lit(0L))
    rollingOver(
      df.withColumn("_vq", q), keyCol, tsCol, idCol, windowSec,
      saltBuckets, Seq("_vq"),
      w => ((sum(col("_vq")).over(w) - col("_vq")).cast("double") /
        1000000L), out)
  }

  /** Shared trailing-RANGE-window core: unsalted = one window over
    * (key); salted = the ghost-duplication span scheme documented on
    * [[rollingCount]]. `mkOut` builds the output from the frame spec;
    * `valCols` ride along for value-based aggregates.
    */
  private def rollingOver(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, windowSec: Long, saltBuckets: Int,
      valCols: Seq[String], mkOut: org.apache.spark.sql.expressions.WindowSpec => Column,
      out: String): DataFrame = {
    // Frame evaluated over epoch MICROS, not whole seconds: a long cast
    // of the timestamp truncates to seconds and shifts the boundary by
    // up to ±1 s vs the µs-precision `ts >= t - windowSec` semantics.
    // Numeric ts columns keep their original contract (interpreted as
    // epoch SECONDS, like [[asofJoin]] accepts any orderable ts).
    val windowUs = windowSec * 1000000L
    val keep = Seq(col(idCol), col(keyCol), col(tsCol)) ++ valCols.map(col)
    val base = df.select(keep :+ usCol(df, tsCol).as("_us"): _*)
    def plain = {
      val w = Window.partitionBy(col(keyCol))
        .orderBy(col("_us")).rangeBetween(-windowUs, 0)
      base.select(col(idCol), col(keyCol), col(tsCol), mkOut(w).as(out))
    }
    if (saltBuckets <= 1) plain
    else {
      val bounds = base.agg(min(col("_us")), max(col("_us"))).head()
      if (bounds.isNullAt(0)) return plain
      val (tmin, tmax) = (bounds.getLong(0), bounds.getLong(1))
      // spans must be >= the trailing window, so ghosts reach exactly
      // one span forward; clamp the bucket count accordingly
      val span = math.max(tmax - tmin + 1, 1L)
      val nb = math.max(1L, math.min(saltBuckets.toLong,
        span / math.max(windowUs, 1L))).toInt
      val width = math.max(span / nb + 1, windowUs)
      val bkt = least(floor((col("_us") - tmin) / width), lit(nb - 1L)).cast("int")
      val real = base.withColumn("_bkt", bkt).withColumn("_ghost", lit(0))
      // a row within windowUs of its span end also peers rows of the
      // NEXT span's opening windowUs — duplicate it there as a ghost
      val ghosts = real
        .where(col("_bkt") < nb - 1 &&
          col("_us") >= lit(tmin) + (col("_bkt") + 1) * width - windowUs)
        .withColumn("_bkt", col("_bkt") + 1)
        .withColumn("_ghost", lit(1))
      val w = Window.partitionBy(col(keyCol), col("_bkt"))
        .orderBy(col("_us")).rangeBetween(-windowUs, 0)
      real.unionByName(ghosts)
        .withColumn(out, mkOut(w))
        .where(col("_ghost") === 0)
        .select(col(idCol), col(keyCol), col(tsCol), col(out))
    }
  }

  /** Epoch-µs view of any supported ts column type (timestamps at µs
    * precision; numerics interpreted as epoch seconds, like
    * [[rollingCount]]'s contract).
    */
  private def usCol(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case TimestampType | TimestampNTZType =>
        unix_micros(asInstant(df.schema(c).dataType, col(c)))
      case _ => col(c).cast("long") * 1000000L
    }

  /** Gap-based sessionization: consecutive events of a key belong to
    * the same session while the inter-event gap is <= `gapSec`; a
    * larger gap opens a new session. Emits each row with its 1-based
    * `session_seq` per key — aggregate downstream for per-session
    * stats (count, span, first/last event).
    *
    * Equal timestamps order by `idCol`, so the assignment is
    * deterministic at any parallelism (ties can never straddle a
    * session boundary anyway — their gap is 0 — but the running sum
    * must visit rows in one canonical order).
    *
    * Shape: ONE shuffle by key + a per-key sort (lag + running sum
    * over the same window frame, so Spark plans a single Window
    * exchange). This is the groupBy-cost envelope; a 100 TB event log
    * sessionizes in one pass. Hot-key caveat matches [[asofJoin]]'s —
    * a single key's timeline serializes into one task; sessions are
    * inherently sequential per key, so the mitigation at scale is
    * range-splitting keys whose sessions are known-short, which
    * callers can do by pre-mapping the key column.
    */
  /** Time-decayed counts per key: each event contributes
    * `weight(age)` where age = whole days between its date and the
    * corpus's max date, and `weight(a) = scale · (decayNum/decayDen)^a`
    * computed EXACTLY in BigInt and baked into a literal lookup array —
    * the freshness-weighted popularity behind recency-aware ranking
    * and data-mix weighting, with none of `pow(0.9, age)`'s cross-
    * engine float risk. Ages past `maxAgeDays` weigh 0 (the literal
    * stays bounded). One scan + one scalar-aggregate broadcast (the
    * anchor date) + one hash aggregation. Output:
    * `(keyCol, decayed_q, n)`.
    */
  def decayedCounts(df: DataFrame, keyCol: String, tsCol: String,
      decayNum: Int = 9, decayDen: Int = 10, scale: Long = 1000000000L,
      maxAgeDays: Int = 64): DataFrame = {
    require(decayNum >= 0 && decayDen > 0 && decayNum <= decayDen,
      s"decay must be a fraction in [0,1]: $decayNum/$decayDen")
    require(maxAgeDays >= 0 && maxAgeDays <= 4096,
      s"maxAgeDays in [0,4096]: $maxAgeDays")
    val weights = decayWeights(decayNum, decayDen, scale, maxAgeDays)
    val anchor = df.agg(max(to_date(col(tsCol))).as("_anchor"))
    df.crossJoin(anchor)
      .select(col(keyCol),
        datediff(col("_anchor"), to_date(col(tsCol))).as("_age"))
      .select(col(keyCol),
        when(col("_age").between(0, maxAgeDays),
          element_at(typedLit(weights), col("_age").cast("int") + 1))
          .otherwise(0L).as("_w"))
      .groupBy(col(keyCol))
      .agg(sum(col("_w")).as("decayed_q"), count(lit(1)).as("n"))
  }

  /** The exact integer decay table `scale · (num/den)^a`, a = 0..max —
    * shared with oracle construction so both engines read the SAME
    * literals.
    */
  def decayWeights(decayNum: Int, decayDen: Int, scale: Long,
      maxAgeDays: Int): Seq[Long] =
    (0 to maxAgeDays).map(a =>
      (BigInt(decayNum).pow(a) * scale / BigInt(decayDen).pow(a)).toLong)

  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, gapSec: Long,
      carryCols: Seq[String] = Nil): DataFrame = {
    // carryCols ride the window unchanged (the [[transitions]] shape):
    // a consumer that needs an extra event column joins nothing back —
    // without this, q_event_covisit re-scanned events and paid a
    // whole-table self-join just to re-attach event_type (§2.4)
    val gapUs = gapSec * 1000000L
    val base = df.select(col(idCol) +: col(keyCol) +: col(tsCol) +:
      usCol(df, tsCol).as("_us") +: carryCols.map(col): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("_us").asc, col(idCol).asc)
    base
      .withColumn("_new",
        when(col("_us") - lag(col("_us"), 1).over(w) <= gapUs, 0L)
          .otherwise(1L)) // first row per key: lag is null -> new session
      .withColumn("session_seq", sum(col("_new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col(idCol) +: col(keyCol) +: col(tsCol) +:
        col("session_seq") +: carryCols.map(col): _*)
  }

  /** Within-session transition census: counts of consecutive
    * `(from_type, to_type)` event pairs inside gap-sessions (the
    * [[sessionize]] rule) — the Markov-transition table behind
    * behavioral sequence analysis. Output:
    * `(from_type, to_type, n_transitions)`.
    *
    * Shape: the sessionize window chain with the type column riding
    * along, a `lead` over (key, session) — same key exchange, one
    * extra in-partition sort, no second shuffle (hash partitioning by
    * key already clusters (key, session)) — then a hash aggregation
    * with map-side combine on the type pair.
    */
  def transitions(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, typeCol: String, gapSec: Long): DataFrame = {
    val gapUs = gapSec * 1000000L
    val base = df.select(col(idCol), col(keyCol), col(typeCol),
      usCol(df, tsCol).as("_us"))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("_us").asc, col(idCol).asc)
    val sess = base
      .withColumn("_new",
        when(col("_us") - lag(col("_us"), 1).over(w) <= gapUs, 0L)
          .otherwise(1L))
      .withColumn("_sess", sum(col("_new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val w2 = Window.partitionBy(col(keyCol), col("_sess"))
      .orderBy(col("_us").asc, col(idCol).asc)
    sess
      .withColumn("_next", lead(col(typeCol), 1).over(w2))
      .where(col("_next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("_next").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
  }

  /** Ordered-step funnel: for each key that performed `steps.head`,
    * how far through the step sequence it progressed, where step i+1
    * must happen AT or after the FIRST completion time of step i and
    * every step within `horizonSec` of the first step-1 time. Output:
    * `(keyCol, steps_completed)` — one row per key with >= 1 step.
    *
    * Shape: one conditional-min aggregation per step — k-1 equi-joins
    * of the per-key step-time table back onto the filtered event scan
    * (AQE broadcasts it when it fits; it stays a shuffle join at
    * billion-key scale). Each pass is a groupBy over the event log — no
    * windows, no per-key sort, no self-join on time — so a 100 TB log
    * pays k filtered aggregation passes. The per-key state (one
    * timestamp per step) is what a streaming version would keep in
    * `flatMapGroupsWithState`.
    */
  def funnel(df: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, steps: Seq[String], horizonSec: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val horizonUs = horizonSec * 1000000L
    val ev = df.select(col(keyCol), col(typeCol),
      usCol(df, tsCol).as("_us"))
    // t1: first time of the entry step, per key
    var acc = ev.where(col(typeCol) === steps.head)
      .groupBy(col(keyCol)).agg(min(col("_us")).as("_t1"))
      .withColumn("_tprev", col("_t1"))
      .withColumn("steps_completed", lit(1L))
    for ((step, i) <- steps.tail.zipWithIndex) {
      // only keys that completed step i are eligible for step i+1 —
      // a missing middle step must stop the key's progression
      val frontier = acc.where(col("steps_completed") === (i + 1).toLong)
        .select(col(keyCol), col("_t1"), col("_tprev"))
      val nxt = ev.where(col(typeCol) === step)
        .join(frontier, Seq(keyCol))
        .where(col("_us") >= col("_tprev") &&
          col("_us") <= col("_t1") + horizonUs)
        .groupBy(col(keyCol)).agg(min(col("_us")).as("_tnext"))
      acc = acc.join(nxt, Seq(keyCol), "left")
        .withColumn("steps_completed",
          when(col("_tnext").isNotNull, lit((i + 2).toLong))
            .otherwise(col("steps_completed")))
        .withColumn("_tprev", coalesce(col("_tnext"), col("_tprev")))
        .drop("_tnext")
    }
    acc.select(col(keyCol), col("steps_completed"))
  }

  /** Cohort retention: keys are cohorted by the period of their FIRST
    * event (`floor(first_us / periodUs)`), and each (cohort, offset)
    * cell counts the distinct keys active `offset` periods after
    * their cohort period. Output:
    * `(cohort, period_offset, n_active)`.
    *
    * Shape: one groupBy per key for first-event times, one equi-join
    * back on key, one distinct-aggregate for the cells — all plain
    * key shuffles; nothing per-row driver-side. The per-key table is
    * |keys| rows (small next to the log, but NOT forced broadcast —
    * at a billion keys it must stay a shuffle join; AQE picks
    * broadcast when it fits).
    */
  def retention(df: DataFrame, keyCol: String, tsCol: String,
      periodSec: Long): DataFrame = {
    val periodUs = periodSec * 1000000L
    val ev = df.select(col(keyCol), usCol(df, tsCol).as("_us"))
    // integer `div`, not floor(double /): epoch-µs magnitudes divide
    // exactly in long arithmetic; a double quotient can straddle a
    // period boundary by one ulp
    val first = ev.groupBy(col(keyCol))
      .agg(expr(s"min(_us) div ${periodUs}L").as("cohort"))
    ev.withColumn("_p", expr(s"_us div ${periodUs}L"))
      .join(first, Seq(keyCol))
      .groupBy(col("cohort"), (col("_p") - col("cohort")).as("period_offset"))
      .agg(count_distinct(col(keyCol)).as("n_active"))
  }
}
