package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Curation, Packing}

/** Sequence packing + epoch upsampling: the Spark operators replayed
  * against single-threaded reference implementations on randomized
  * corpora (fixed seeds), plus the structural invariants a training
  * loader relies on.
  */
class PackingSpec extends GraftSuite {

  private def corpus(seed: Int, n: Int) = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val words = rnd.nextInt(40) // includes 0-token docs
      (i.toLong, Seq.fill(words)("w" + rnd.nextInt(9)).mkString(" "),
        "src" + rnd.nextInt(3))
    }.toDF("doc_id", "text", "source")
  }

  /** Reference greedy pack: shard by id mod B, fill in id order. */
  private def refPack(docs: Seq[(Long, Int)], window: Int, nBuckets: Int)
      : Map[Long, (Long, Long, Long)] =
    docs.groupBy { case (id, _) => id % nBuckets }.flatMap { case (b, ds) =>
      var seq = 0L; var fill = 0L
      ds.sortBy(_._1).zipWithIndex.map { case ((id, rawT), i) =>
        val t = math.min(rawT, window).toLong
        if (i == 0) { seq = 1L; fill = t }
        else if (fill + t <= window) fill += t
        else { seq += 1L; fill = t }
        id -> ((b, seq, t))
      }
    }

  private def tokens(text: String): Int =
    text.split("\\s+").count(_.nonEmpty)

  test("packSequences matches the sequential greedy reference on random corpora") {
    for (seed <- Seq(1, 7, 23)) {
      val df = corpus(seed, 120)
      val expected = refPack(
        df.collect().map(r => (r.getLong(0), tokens(r.getString(1)))).toSeq,
        window = 50, nBuckets = 8)
      val got = Packing.packSequences(df, "doc_id", "text", window = 50, nBuckets = 8)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      assert(got == expected, s"seed $seed")
    }
  }

  /** Reference SPLITTING pack: chunk each doc, then greedy-fill the
    * chunks in (id, chunk) order within id-mod-B shards.
    */
  private def refPackSplit(docs: Seq[(Long, Int)], window: Int,
      nBuckets: Int): Map[(Long, Long), (Long, Long, Long)] =
    docs.flatMap { case (id, n) =>
      val chunks = math.max(1, (n + window - 1) / window)
      (0 until chunks).map(c =>
        (id, c.toLong, math.max(0, math.min(window, n - c * window)).toLong))
    }.groupBy { case (id, _, _) => id % nBuckets }
      .flatMap { case (b, cs) =>
        var seq = 0L; var fill = 0L
        cs.sortBy { case (id, c, _) => (id, c) }.zipWithIndex.map {
          case ((id, c, t), i) =>
            if (i == 0) { seq = 1L; fill = t }
            else if (fill + t <= window) fill += t
            else { seq += 1L; fill = t }
            (id, c) -> ((b, seq, t))
        }
      }

  test("packSequencesSplit: greedy reference replay, token conservation, interior chunks full") {
    for (seed <- Seq(3, 11)) {
      val df = corpus(seed, 120)
      val counts = df.collect()
        .map(r => (r.getLong(0), tokens(r.getString(1)))).toSeq
      // window 16 << the 0..39-token docs: most docs split
      val expected = refPackSplit(counts, window = 16, nBuckets = 8)
      val got = Packing.packSequencesSplit(df, "doc_id", "text",
          window = 16, nBuckets = 8)
        .collect().map(r => (r.getLong(0), r.getLong(2)) ->
          ((r.getLong(1), r.getLong(3), r.getLong(4)))).toMap
      assert(got == expected, s"seed $seed")
      // TOKEN CONSERVATION — the property the truncating variant
      // cannot give: sum over a doc's chunks == the doc's full count
      val perDoc = got.toSeq.groupBy(_._1._1).view
        .mapValues(_.map(_._2._3).sum).toMap
      counts.foreach { case (id, n) =>
        assert(perDoc(id) == n.toLong,
          s"doc $id: ${perDoc(id)} packed of $n tokens (seed $seed)")
      }
      // interior chunks are exactly the window; only the tail is short
      got.foreach { case ((id, c), (_, _, t)) =>
        val n = counts.toMap.apply(id)
        val last = math.max(1, (n + 15) / 16) - 1
        if (c < last) assert(t == 16L, s"interior chunk ($id,$c) = $t")
      }
    }
    // null count refuses loudly (token conservation cannot hold)
    val s = spark
    import s.implicits._
    val bad = Seq((1L, Some(5L)), (2L, None)).toDF("doc_id", "tc")
    val ex = intercept[Exception] {
      Packing.packByCountsSplit(bad, "doc_id", "tc", 16, 4).collect()
    }
    assert(ex.getMessage != null && ex.getMessage.contains("non-negative"),
      s"null count must refuse: ${ex.getMessage}")
  }

  test("packByCountsKeyed: arbitrary shard key matches the per-key greedy reference; null key refuses") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(5)
    // topic-keyed docs: key distribution deliberately skewed
    val rows = (0 until 150).map { i =>
      (i.toLong, (i % 13 % 4).toLong, rnd.nextInt(45).toLong)
    }
    val df = rows.toDF("doc_id", "topic", "ntok")
    val expected = rows.groupBy(_._2).flatMap { case (key, ds) =>
      var seq = 0L; var fill = 0L
      ds.sortBy(_._1).zipWithIndex.map { case ((id, _, rawT), i) =>
        val t = math.min(rawT, 50L)
        if (i == 0) { seq = 1L; fill = t }
        else if (fill + t <= 50L) fill += t
        else { seq += 1L; fill = t }
        id -> ((key, seq, t))
      }
    }
    val got = Packing.packByCountsKeyed(df.repartition(7), "doc_id",
        "ntok", "topic", window = 50)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got == expected.toMap, "keyed pack must match the reference")
    // a null shard key must refuse loudly, never collapse silently
    val withNull = rows.toDF("doc_id", "topic", "ntok")
      .withColumn("topic", when(col("doc_id") === 3L,
        lit(null).cast("long")).otherwise(col("topic")))
    val e = intercept[Exception] {
      Packing.packByCountsKeyed(withNull, "doc_id", "ntok", "topic", 50)
        .collect()
    }
    assert(e.getMessage != null && e.toString.contains("shard key") ||
      e.getCause != null, s"expected the null-key refusal, got $e")
  }

  test("packSequences invariants: fill <= window, seqs contiguous from 1, docs capped") {
    val df = corpus(99, 200)
    val rows = Packing.packSequences(df, "doc_id", "text", window = 40, nBuckets = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.forall(_._3 <= 40))
    rows.groupBy(r => (r._1, r._2)).foreach { case ((b, s), g) =>
      assert(g.map(_._3).sum <= 40, s"bucket $b seq $s overflows")
    }
    rows.groupBy(_._1).foreach { case (b, g) =>
      val seqs = g.map(_._2).distinct.sorted.toSeq
      assert(seqs == (1L to seqs.max), s"bucket $b seqs not contiguous: $seqs")
    }
  }

  test("packSequences survives a bucket spanning multiple input partitions") {
    // all docs in ONE bucket, scattered across 4 input partitions: the
    // repartition+sort must reassemble a single sequential scan
    val s = spark
    import s.implicits._
    val df = (0 until 60).map(i => (i * 8L, "a b c d e f g"))
      .toDF("doc_id", "text").repartition(4)
    val got = Packing.packSequences(df, "doc_id", "text", window = 21, nBuckets = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1)
    // 7 tokens each, window 21 -> exactly 3 docs per sequence, in id order
    got.zipWithIndex.foreach { case ((_, seq), i) =>
      assert(seq == i / 3 + 1, s"doc index $i got seq $seq")
    }
  }

  test("packSequences fails loudly on null and negative ids") {
    val s = spark
    import s.implicits._
    val nullId = Seq((java.lang.Long.valueOf(1L), "a b"), (null.asInstanceOf[java.lang.Long], "c d"))
      .toDF("doc_id", "text")
    val e1 = intercept[Exception] {
      Packing.packSequences(nullId, "doc_id", "text", 10, 4).collect()
    }
    assert(e1.getMessage.contains("non-negative"), e1.getMessage)
    val negId = Seq((1L, "a b"), (-5L, "c d")).toDF("doc_id", "text")
    val e2 = intercept[Exception] {
      Packing.packSequences(negId, "doc_id", "text", 10, 4).collect()
    }
    assert(e2.getMessage.contains("non-negative"), e2.getMessage)
  }

  test("packByCounts packs a precomputed budget column, capped at the window") {
    val s = spark
    import s.implicits._
    // budgets: 300+300 > 512 splits; 600 caps to 512 and fills alone
    val df = Seq((0L, 300L), (16L, 300L), (32L, 600L), (48L, 10L))
      .toDF("doc_id", "nb") // all bucket 0 at nBuckets=16
    val got = Packing.packByCounts(df, "doc_id", "nb", window = 512, nBuckets = 16)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set((0L, 1L, 300L), (16L, 2L, 300L), (32L, 3L, 512L),
      (48L, 4L, 10L)), s"got $got")
  }

  test("packStats aggregates fill per sequence") {
    val s = spark
    import s.implicits._
    val df = Seq((0L, "a b c"), (8L, "d e"), (16L, "f g h i"))
      .toDF("doc_id", "text") // one bucket (mod 8 = 0): 3+2 fit in 5, then 4
    val stats = Packing.packStats(df, "doc_id", "text", window = 5, nBuckets = 8)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .sortBy(_._1)
    assert(stats.toSeq == Seq((1L, 2L, 5L, 1.0), (2L, 1L, 4L, 0.8)))
  }

  test("upsampleByRates emits num/den copies with deterministic fractional epochs") {
    val df = corpus(5, 100)
    val got = Curation.upsampleByRates(df, "source", "doc_id",
      rates = Map("src0" -> 25, "src1" -> 10), defaultNum = 4, den = 10)
      .groupBy("doc_id").agg(count(lit(1)).as("c"), max("epoch").as("maxe"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val src = df.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    src.foreach { case (id, source) =>
      val num = source match { case "src0" => 25; case "src1" => 10; case _ => 4 }
      got.get(id) match {
        case Some((c, maxe)) =>
          assert(c == num / 10 || c == num / 10 + 1, s"doc $id copies $c for rate $num/10")
          assert(maxe == c - 1, s"doc $id epochs not 0..${c - 1}")
        case None => assert(num < 10, s"doc $id dropped at rate $num/10")
      }
    }
    // aggregate multiplicity ~ num/den: exactly floor + hash-fraction
    val src0 = src.filter(_._2 == "src0").keys.toSet
    val copies0 = got.filter(k => src0(k._1)).values.map(_._1).sum
    assert(copies0 >= src0.size * 2 && copies0 <= src0.size * 3)
  }

  test("upsampleByRates at sub-unit rates equals sampleByRates membership") {
    val df = corpus(11, 150)
    val up = Curation.upsampleByRates(df, "source", "doc_id",
      rates = Map("src0" -> 5, "src1" -> 3), defaultNum = 1, den = 10)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val down = Curation.sampleByRates(df, "source", "doc_id",
      rates = Map("src0" -> 5, "src1" -> 3), defaultNum = 1, den = 10)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(up == down)
    assert(up.distinct == up) // never more than one copy below den
  }
}
