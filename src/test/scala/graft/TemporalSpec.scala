package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Temporal

/** Salted temporal operators: a hot key (one key owning half the
  * corpus) must produce BIT-IDENTICAL results through the salted
  * per-(key, time-span) path and the plain per-key window path.
  */
class TemporalSpec extends GraftSuite {

  // ~2400 events, key 1 owns 50%; deterministic µs-precision times
  private def skewed() = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    (0 until 2400).map { i =>
      val key = if (i % 2 == 0) 1L else 2L + (i % 7)
      val us = 1000000000L + math.abs(rnd.nextLong() % 40000000000L) // ~11h span
      val kind = if (rnd.nextInt(3) == 0) "purchase" else "click"
      val value: Option[Double] =
        if (kind == "purchase" && rnd.nextInt(10) == 0) None // NULL values too
        else Some(rnd.nextInt(1000) / 10.0)
      (i.toLong, key, us, kind, value)
    }.toDF("event_id", "user_id", "tus", "event_type", "value")
      .select(col("event_id"), col("user_id"),
        timestamp_micros(col("tus")).as("ts"), col("event_type"), col("value"))
  }

  test("salted asofJoin equals unsalted on a 50%-hot-key corpus") {
    val ev = skewed().cache()
    val left = ev.where(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val right = ev.where(col("event_type") === "purchase")
      .select("user_id", "ts", "value")
    def run(buckets: Int) =
      Temporal.asofJoin(left, right, "user_id", "ts", "event_id", "value",
        saltBuckets = buckets)
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    val plain = run(1)
    for (b <- Seq(2, 8, 64)) {
      assert(run(b) == plain, s"saltBuckets=$b diverged")
    }
    assert(plain.size == left.count())
    assert(plain.values.exists(_ != null) && plain.values.exists(_ == null))
    ev.unpersist()
  }

  test("salted rollingCount equals unsalted on a 50%-hot-key corpus") {
    val ev = skewed().cache()
    def run(buckets: Int) =
      Temporal.rollingCount(ev, "user_id", "ts", "event_id",
        windowSec = 3600, saltBuckets = buckets)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val plain = run(1)
    for (b <- Seq(2, 8, 64)) {
      assert(run(b) == plain, s"saltBuckets=$b diverged")
    }
    assert(plain.values.max > 0)
    ev.unpersist()
  }

  test("salted rollingCount clamps span width to the trailing window") {
    val s = spark
    import s.implicits._
    // 10s of data, 3600s window, 64 requested buckets: every row peers
    // every earlier row; the clamp must collapse to one span rather
    // than produce windows that cannot reach back far enough
    val ev = (0 until 50).map(i => (i.toLong, 1L, 1000000000L + i * 200000L))
      .toDF("event_id", "user_id", "tus")
      .select(col("event_id"), col("user_id"), timestamp_micros(col("tus")).as("ts"))
    val got = Temporal.rollingCount(ev, "user_id", "ts", "event_id",
      windowSec = 3600, saltBuckets = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert((0 until 50).forall(i => got(i.toLong) == i.toLong), s"got $got")
  }

  test("rollingCount accepts a numeric epoch-seconds ts column (legacy contract)") {
    val s = spark
    import s.implicits._
    val ev = Seq((1L, 1L, 1000L), (2L, 1L, 1500L), (3L, 1L, 5000L))
      .toDF("event_id", "user_id", "ts") // plain long seconds
    val got = Temporal.rollingCount(ev, "user_id", "ts", "event_id",
      windowSec = 3600)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // id 3's frame is [1400, 5000]: includes id 2 (1500), not id 1 (1000)
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 1L), s"got $got")
  }

  test("salted asofJoin on empty input returns empty, not a crash") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, Long, Long)].toDF("event_id", "user_id", "ts")
    val emptyR = Seq.empty[(Long, Long, Double)].toDF("user_id", "ts", "value")
    assert(Temporal.asofJoin(empty, emptyR, "user_id", "ts", "event_id",
      "value", saltBuckets = 8).count() == 0)
  }

  test("rangeJoin equals the naive BETWEEN join at any bucket width") {
    val ev = skewed()
    val left = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
    val right = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        (col("ts") - expr("INTERVAL 1 HOUR")).as("s"),
        (col("ts") + expr("INTERVAL 1 HOUR")).as("e"))
    val naive = left.join(right.withColumnRenamed("user_id", "u2"),
        col("user_id") === col("u2") && col("ts").between(col("s"), col("e")))
      .select("click_id", "purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty, "fixture must produce matches")
    // derived width (= max interval length) and widths far smaller /
    // larger than the intervals must all agree pair-for-pair
    for (w <- Seq(0L, 60L, 100000L)) {
      val got = Temporal.rangeJoin(left, right, "user_id", "ts", "s", "e",
          bucketWidthSec = w)
        .select("click_id", "purchase_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == naive, s"width $w: ${got.size} vs ${naive.size}")
    }
  }

  test("rangeJoin clamps explode width: year-long interval at width 1s") {
    val s = spark
    import s.implicits._
    // without the MaxBucketsPerInterval clamp this builds a ~31M-element
    // sequence array per interval row (Spark errors or the executor
    // OOMs); with it the effective width coarsens and the query runs
    val left = Seq((1L, 1L, 1000L), (2L, 1L, 20000000L), (3L, 1L, 40000000L))
      .toDF("lid", "k", "ts") // lid=3 falls outside the interval
    val right = Seq((10L, 1L, 0L, 31536000L)) // one year in seconds
      .toDF("rid", "k", "s", "e")
    val got = Temporal.rangeJoin(left, right, "k", "ts", "s", "e",
        bucketWidthSec = 1L)
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 10L)), s"got $got")
  }

  test("temporal ops accept TIMESTAMP_NTZ ts read from parquet (driver's events shape)") {
    // The driver's regenerated events.parquet stores ts as
    // TIMESTAMP(MICROS, isAdjustedToUTC=0), which Spark 4 reads as
    // TIMESTAMP_NTZ — r8's type dispatch only knew TimestampType and
    // all three operators died at analysis time (DATATYPE_MISMATCH:
    // cannot cast TIMESTAMP_NTZ). Round-trip the fixture through an
    // NTZ parquet file and require bit-identical results to the
    // TimestampType path (UTC session, so the instants coincide).
    val dir = java.nio.file.Files.createTempDirectory("graft-ntz").toString
    val tz = skewed().cache()
    tz.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampNTZType))
      .write.mode("overwrite").parquet(s"$dir/events_ntz")
    val ntz = spark.read.parquet(s"$dir/events_ntz")
    assert(ntz.schema("ts").dataType == org.apache.spark.sql.types.TimestampNTZType,
      "fixture must reproduce the driver's NTZ shape")

    def asof(ev: org.apache.spark.sql.DataFrame) = Temporal.asofJoin(
      ev.where(col("event_type") === "click").select("event_id", "user_id", "ts"),
      ev.where(col("event_type") === "purchase").select("user_id", "ts", "value"),
      "user_id", "ts", "event_id", "value", saltBuckets = 8)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(asof(ntz) == asof(tz))

    def rolling(ev: org.apache.spark.sql.DataFrame) =
      Temporal.rollingCount(ev, "user_id", "ts", "event_id",
        windowSec = 3600, saltBuckets = 8)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(rolling(ntz) == rolling(tz))

    def range(ev: org.apache.spark.sql.DataFrame) = Temporal.rangeJoin(
      ev.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts")),
      ev.where(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          (col("ts") - expr("INTERVAL 1 HOUR")).as("s"),
          (col("ts") + expr("INTERVAL 1 HOUR")).as("e")),
      "user_id", "ts", "s", "e")
      .select("click_id", "purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(range(ntz) == range(tz) && range(tz).nonEmpty)
    tz.unpersist()
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("decayedCounts: exact BigInt weight table, age anchoring, cap to zero") {
    val s = spark
    import s.implicits._
    // exact table: scale * (9/10)^a with integer floor at each step
    val w = Temporal.decayWeights(9, 10, 1000L, 5)
    assert(w == Seq(1000L, 900L, 810L, 729L, 656L, 590L), s"weights: $w")
    // anchor = max date; ages 0, 1, 3 for key a; key b one stale event
    val df = Seq(
      (1L, "a", "2024-03-10 12:00:00"),
      (2L, "a", "2024-03-09 23:59:59"),
      (3L, "a", "2024-03-07 00:00:01"),
      (4L, "b", "2024-01-01 00:00:00") // age 69 > maxAgeDays -> weight 0
    ).toDF("event_id", "k", "tss")
      .select(col("event_id"), col("k"), to_timestamp(col("tss")).as("ts"))
    val got = Temporal.decayedCounts(df, "k", "ts",
        decayNum = 9, decayDen = 10, scale = 1000L, maxAgeDays = 5)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("a") == ((1000L + 900L + 729L, 3L)), s"got ${got("a")}")
    assert(got("b") == ((0L, 1L)), s"stale event counts but weighs 0: $got")
    // decayNum = decayDen degenerates to plain counts * scale
    val flat = Temporal.decayedCounts(df, "k", "ts",
        decayNum = 1, decayDen = 1, scale = 7L, maxAgeDays = 100)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(flat == Map("a" -> 21L, "b" -> 7L), s"flat: $flat")
  }

  test("rangeJoin: inverted and point intervals, numeric ts contract") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 1L, 100L), (2L, 1L, 200L), (3L, 2L, 100L))
      .toDF("lid", "k", "ts") // epoch seconds as longs
    val right = Seq(
      (10L, 1L, 100L, 100L), // point interval: matches ts=100 exactly
      (11L, 1L, 150L, 90L),  // inverted: matches nothing
      (12L, 2L, 50L, 150L))  // spans lid=3
      .toDF("rid", "k", "s", "e")
    val got = Temporal.rangeJoin(left, right, "k", "ts", "s", "e")
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (3L, 12L)), s"got $got")
  }

  test("sessionize splits on gaps > gapSec, inclusive at the boundary") {
    val s = spark
    import s.implicits._
    // key 1: gaps of 10s, 60s (== gap, same session), 61s (new session)
    // key 2: single event
    val ev = Seq(
      (1L, 1L, 0L), (2L, 1L, 10L), (3L, 1L, 70L), (4L, 1L, 131L),
      (5L, 2L, 1000L))
      .map { case (id, k, sec) => (id, k, sec * 1000000L) }
      .toDF("event_id", "user_id", "tus")
      .select(col("event_id"), col("user_id"),
        timestamp_micros(col("tus")).as("ts"))
    val got = Temporal.sessionize(ev, "user_id", "ts", "event_id", gapSec = 60)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 1L),
      s"got $got")
  }

  test("sessionize matches a brute-force scan on the skewed corpus") {
    val ev = skewed()
    val got = Temporal.sessionize(ev, "user_id", "ts", "event_id",
        gapSec = 1800)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val brute = ev.select("event_id", "user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).getTime * 1000))
      .groupBy(_._2).toSeq.flatMap { case (_, rows) =>
        val sorted = rows.sortBy(r => (r._3, r._1))
        var seq = 0L; var prev = Long.MinValue
        sorted.map { case (id, _, us) =>
          if (prev == Long.MinValue || us - prev > 1800000000L) seq += 1
          prev = us
          id -> seq
        }.toSeq
      }.toMap
    assert(got == brute)
  }

  test("funnel: a missing middle step stops progression") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      // user 1: full funnel in order
      (1L, "view", 0L), (1L, "click", 10L), (1L, "purchase", 20L),
      // user 2: view then purchase, NO click -> stuck at 1
      (2L, "view", 0L), (2L, "purchase", 5L),
      // user 3: click before view -> click doesn't count, stuck at 1
      (3L, "click", 0L), (3L, "view", 10L),
      // user 4: no view at all -> absent from output
      (4L, "click", 0L), (4L, "purchase", 10L),
      // user 5: full funnel but purchase beyond horizon -> stuck at 2
      (5L, "view", 0L), (5L, "click", 10L), (5L, "purchase", 5000L))
      .toDF("user_id", "event_type", "sec")
      .select(col("user_id"), col("event_type"),
        timestamp_micros(col("sec") * 1000000L).as("ts"))
      .withColumn("event_id", monotonically_increasing_id())
    val got = Temporal.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), horizonSec = 100)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 1L, 3L -> 1L, 5L -> 2L), s"got $got")
  }

  test("funnel: equal timestamps satisfy the >= step ordering") {
    val s = spark
    import s.implicits._
    val ev = Seq((1L, "view", 0L), (1L, "click", 0L), (1L, "purchase", 0L))
      .toDF("user_id", "event_type", "sec")
      .select(col("user_id"), col("event_type"),
        timestamp_micros(col("sec")).as("ts"))
    val got = Temporal.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), horizonSec = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L), s"got $got")
  }

  test("forward asofJoin matches brute force; salted path agrees") {
    val ev = skewed()
    val left = ev.where(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val right = ev.where(col("event_type") === "purchase")
      .select("user_id", "ts", "value")
    def run(buckets: Int) =
      Temporal.asofJoin(left, right, "user_id", "ts", "event_id", "value",
          saltBuckets = buckets, direction = "forward")
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    val plain = run(1)
    // brute force: earliest purchase at-or-after, max value at ts ties
    val rr = right.collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.isNullAt(2), if (r.isNullAt(2)) 0.0 else r.getDouble(2)))
    val brute = left.collect().map { r =>
      val (id, k, t) = (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime)
      val cands = rr.filter(x => x._1 == k && x._2 >= t)
      if (cands.isEmpty) id -> null
      else {
        val tmin = cands.map(_._2).min
        val atT = cands.filter(_._2 == tmin)
        // pre-agg max(value); an all-null collision stays null
        val nonNull = atT.filterNot(_._3)
        id -> (if (nonNull.isEmpty) null else (nonNull.map(_._4).max: Any))
      }
    }.toMap
    assert(plain == brute)
    for (b <- Seq(4, 8)) assert(run(b) == plain, s"saltBuckets=$b diverged")
  }

  test("asofJoin tolerance nulls stale matches in both directions") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 1L, 1000L), (2L, 1L, 5000L))
      .toDF("event_id", "user_id", "sec")
      .select(col("event_id"), col("user_id"),
        timestamp_micros(col("sec") * 1000000L).as("ts"))
    val right = Seq((1L, 900L, 7.0), (1L, 4999L, 9.0))
      .toDF("user_id", "sec", "value")
      .select(col("user_id"),
        timestamp_micros(col("sec") * 1000000L).as("ts"), col("value"))
    // backward, tol 150s: event 1 matches ts=900 (gap 100); event 2's
    // nearest-before is 4999 (gap 1) -> both within
    def bwd(tol: Long) = Temporal.asofJoin(left, right, "user_id", "ts",
        "event_id", "value", toleranceSec = Some(tol))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(bwd(150) == Map(1L -> 7.0, 2L -> 9.0))
    // tol 50: event 1's gap 100 exceeds it -> null
    assert(bwd(50) == Map(1L -> null, 2L -> 9.0))
    // forward, tol 3000: event 1 -> next at 4999 (gap 3999) exceeds ->
    // null; event 2 has no at-or-after -> null
    val fwd = Temporal.asofJoin(left, right, "user_id", "ts",
        "event_id", "value", direction = "forward", toleranceSec = Some(3000L))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(fwd == Map(1L -> null, 2L -> null))
    // Some(0) is a REAL zero-width tolerance (pandas merge_asof
    // contract) — only equal-timestamp matches survive, never a
    // disable sentinel
    val rightEq = right.union(Seq((1L, 5000L, 3.0))
      .toDF("user_id", "sec", "value")
      .select(col("user_id"),
        timestamp_micros(col("sec") * 1000000L).as("ts"), col("value")))
    assert(Temporal.asofJoin(left, rightEq, "user_id", "ts",
        "event_id", "value", toleranceSec = Some(0L))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) null else r.getDouble(3))).toMap ==
      Map(1L -> null, 2L -> 3.0))
    // and None stays unbounded
    assert(Temporal.asofJoin(left, right, "user_id", "ts",
        "event_id", "value")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) null else r.getDouble(3))).toMap ==
      Map(1L -> 7.0, 2L -> 9.0))
    intercept[IllegalArgumentException] {
      Temporal.asofJoin(left, right, "user_id", "ts",
        "event_id", "value", toleranceSec = Some(-1L))
    }
  }

  test("rollingSum matches brute force and its salted path, self excluded") {
    val ev = skewed()
    def run(buckets: Int) =
      Temporal.rollingSum(ev, "user_id", "ts", "event_id", "value",
          windowSec = 3600, saltBuckets = buckets)
        .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val plain = run(1)
    val rows = ev.select("event_id", "user_id", "ts", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime * 1000,
        if (r.isNullAt(3)) 0L else math.round(r.getDouble(3) * 1e6)))
    val brute = rows.map { case (id, k, t, _) =>
      // self excluded; equal-ts peers included (matches RANGE frame)
      val s = rows.filter(x => x._2 == k && x._3 >= t - 3600000000L &&
        x._3 <= t && x._1 != id).map(_._4).sum
      id -> (s.toDouble / 1e6)
    }.toMap
    assert(plain.keySet == brute.keySet)
    plain.foreach { case (id, v) =>
      assert(math.abs(v - brute(id)) < 1e-9, s"id $id: $v vs ${brute(id)}")
    }
    for (b <- Seq(4, 8)) assert(run(b) == plain, s"saltBuckets=$b diverged")
  }

  test("retention cohorts by first-event period and counts distinct keys") {
    val s = spark
    import s.implicits._
    val day = 86400L
    val ev = Seq(
      (1L, 0L), (1L, day + 5), (1L, 2 * day),      // cohort 0: offsets 0,1,2
      (2L, day), (2L, day + 100), (2L, 3 * day),   // cohort 1: offsets 0,0,2
      (3L, 0L))                                    // cohort 0: offset 0
      .toDF("user_id", "sec")
      .select(col("user_id"), timestamp_micros(col("sec") * 1000000L).as("ts"))
    val got = Temporal.retention(ev, "user_id", "ts", periodSec = day)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 2L) -> 1L,
      (1L, 0L) -> 1L, (1L, 2L) -> 1L), s"got $got")
  }
}
