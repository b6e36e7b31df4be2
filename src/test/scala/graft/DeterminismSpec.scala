package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.{Curation, Dedup, GraphAlgos, Temporal, TextAnalysis}

/** Partitioning-independence audit: the engine's determinism claims
  * (integer quantization, canonical tie-breaks, order-insensitive
  * aggregation) say results are BIT-IDENTICAL at any parallelism.
  * This spec runs the claim-bearing operators under three different
  * `spark.sql.shuffle.partitions` settings AND input partitionings
  * and requires identical row multisets — the local stand-in for
  * "same answer on 4 cores and 4000".
  */
class DeterminismSpec extends GraftSuite {

  private def canon(df: DataFrame): Seq[Seq[String]] =
    df.collect().map(_.toSeq.map(String.valueOf)).map(_.toSeq)
      .toSeq.sortBy(_.mkString(""))

  private def underPartitions[A](n: Int)(f: => A): A = {
    val s = spark
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try f finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  private def docs(parts: Int) = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(31)
    val words = Seq("the", "a", "table", "scan", "join", "hash", "row",
      "batch", "value", "query", "merge", "sort")
    (1 to 120).map { i =>
      (i.toLong, Seq.fill(20 + rnd.nextInt(20))(words(rnd.nextInt(words.size)))
        .mkString(" "))
    }.toDF("doc_id", "text").repartition(parts)
  }

  private def events(parts: Int) = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(41)
    (1 to 600).map { i =>
      (i.toLong, (rnd.nextInt(5) + 1).toLong, rnd.nextInt(100000).toLong,
        rnd.nextDouble() * 100)
    }.toDF("event_id", "user_id", "tus", "value")
      .select(col("event_id"), col("user_id"),
        timestamp_micros(col("tus") * 1000000L).as("ts"), col("value"))
      .repartition(parts)
  }

  private def check(name: String)(mk: (Int, Int) => DataFrame): Unit = {
    val base = underPartitions(4)(canon(mk(4, 4)))
    assert(base.nonEmpty, s"$name fixture must produce rows")
    for ((sp, ip) <- Seq((3, 7), (17, 2))) {
      val got = underPartitions(sp)(canon(mk(sp, ip)))
      assert(got == base,
        s"$name differs at shuffle=$sp input=$ip: ${got.size} vs ${base.size} rows")
    }
  }

  test("pageRank ranks are partitioning-independent") {
    check("pageRank") { (_, ip) =>
      GraphAlgos.pageRank(GraphAlgos.coOccurrence(
        docs(ip).select((col("doc_id") % 11).as("g"), col("doc_id").as("it")),
        "g", "it"), iters = 4)
    }
  }

  test("salted rollingSum is partitioning-independent") {
    check("rollingSum") { (_, ip) =>
      Temporal.rollingSum(events(ip), "user_id", "ts", "event_id", "value",
        windowSec = 3600, saltBuckets = 8)
    }
  }

  test("heavyHitters certificates and estimates are partitioning-independent") {
    // MG counter VALUES can legally differ across merge orders; the
    // engine's fixed plan (one partial per partition, one final merge)
    // must still be stable given the same input partitioning — so pin
    // the INPUT and vary only shuffle partitions
    val base = underPartitions(4)(canon(
      TextAnalysis.heavyHitters(docs(6), "text", k = 6)))
    for (sp <- Seq(3, 17)) {
      val got = underPartitions(sp)(canon(
        TextAnalysis.heavyHitters(docs(6), "text", k = 6)))
      assert(got == base, s"heavyHitters differs at shuffle=$sp")
    }
  }

  test("keep-best dedup representatives are partitioning-independent") {
    check("dedupCorpusByScore") { (_, ip) =>
      val d = docs(ip)
      Dedup.dedupCorpusByScore(d, "doc_id",
        Dedup.minhashPairs(d, "text", "doc_id",
          n = 3, numHashes = 6, bands = 3, num = 6, den = 10),
        TextAnalysis.qualityReport(d, "doc_id", "text"), "quality")
        .select("doc_id")
    }
  }

  test("banded-Hamming near-dup pairs are partitioning-independent") {
    // the one blocking helper behind simhash/image/audio/video: both
    // boundedKeyPairs branches (grouped read AND hash-sub-bucket
    // split) must yield the same pair set at any parallelism
    val s = spark
    import s.implicits._
    def hashes(parts: Int) = (0 until 80).map { i =>
      val high =
        if (i < 10) (0x5555L << 16) | (1L << (33 + (i % 6)))
        else (i.toLong * 0x9E3779B97L) & 0x7FFFFFFFFFFF0000L
      (i.toLong, high | 0x4321L)
    }.toDF("id", "h").repartition(parts)
    for (cap <- Seq(4, 4096)) {
      check(s"bandedHammingPairs(cap=$cap)") { (_, ip) =>
        Dedup.bandedHammingPairs(hashes(ip), "id", "h",
          bands = 4, bandBits = 16, maxHam = 3, cap = cap)
      }
      check(s"bandedHammingCrossPairs(cap=$cap)") { (_, ip) =>
        Dedup.bandedHammingCrossPairs(hashes(ip),
          hashes(ip).select((col("id") + 500).as("id"), col("h")),
          "id", "h", bands = 4, bandBits = 16, maxHam = 3, cap = cap)
      }
    }
  }

  test("multi-frame video and audio-shingle pairs are partitioning-independent") {
    val s = spark
    import s.implicits._
    import graft.pipeline.Multimodal
    def media(parts: Int, modality: String) = Multimodal.mediaFromIds(
      (0 until 90).map(_.toLong).toDF("doc_id").repartition(parts),
      "doc_id", only = Some(modality))
    for (cap <- Seq(4, 4096))
      check(s"videoMultiFrameNearDupPairs(cap=$cap)") { (_, ip) =>
        Multimodal.videoMultiFrameNearDupPairs(media(ip, "video"),
          maxHam = 3, k = 8, minMatches = 2, cap = cap)
      }
    check("audioShingleNearDupPairs") { (_, ip) =>
      Multimodal.audioShingleNearDupPairs(media(ip, "audio"),
        n = 3, num = 6, den = 10)
    }
    for (cap <- Seq(4, 4096))
      check(s"videoWinnowedNearDupPairs(cap=$cap)") { (_, ip) =>
        Multimodal.videoWinnowedNearDupPairs(media(ip, "video"),
          maxHam = 3, window = 3, minMatches = 2, cap = cap)
      }
    check("imageDHashNearDupPairs") { (_, ip) =>
      Multimodal.imageDHashNearDupPairs(media(ip, "image"), maxHam = 3)
    }
    for (cap <- Seq(4, 4096))
      check(s"thumbnailPairs(cap=$cap)") { (_, ip) =>
        Multimodal.thumbnailPairs(media(ip, "image"), media(ip, "video"),
          maxHam = 3, k = 8, cap = cap)
      }
    def shifted(parts: Int) = Multimodal.mediaFromIds(
      (0 until 90).map(i => i.toLong + 9000)
        .toDF("doc_id").repartition(parts),
      "doc_id", only = Some("video"))
    for (cap <- Seq(4, 4096))
      check(s"videoMultiFrameCrossPairs(cap=$cap)") { (_, ip) =>
        Multimodal.videoMultiFrameCrossPairs(shifted(ip), media(ip, "video"),
          maxHam = 3, k = 8, minMatches = 2, cap = cap)
      }
  }

  test("global orderings (shuffle, curriculum) are partitioning-independent") {
    // sort + zipWithIndex positions must equal the global rank in the
    // total order regardless of how the range partitioner splits it
    check("shuffleOrder") { (_, ip) =>
      Curation.shuffleOrder(docs(ip), "doc_id", seed = "s9")
    }
    check("curriculumOrder") { (_, ip) =>
      Curation.curriculumOrder(
        docs(ip).withColumn("b", (col("doc_id") % 5)),
        "doc_id", col("b"), seed = "c9")
    }
  }

  test("exact quantiles and temperature mix are partitioning-independent") {
    check("exactQuantiles") { (_, ip) =>
      Curation.exactQuantiles(
        docs(ip).withColumn("grp", (col("doc_id") % 3).cast("string"))
          .withColumn("v", length(col("text")).cast("long")),
        "grp", "v", Seq(0.25, 0.5, 0.75))
    }
    check("temperatureMix") { (_, ip) =>
      Curation.temperatureMix(
        docs(ip).withColumn("src", concat(lit("s"), col("doc_id") % 4)),
        "src", "doc_id", alpha = 0.5, targetFrac = 0.5)
        .select("doc_id")
    }
  }

  test("BPE merge training (word and byte level) is partitioning-independent") {
    // the argmax tie-break (count DESC, pair lex ASC) must land the
    // same merge table at any input partitioning — the collected
    // vocabulary's order must never leak into the result
    import graft.pipeline.Bpe
    val s = spark
    val base = Bpe.trainMerges(docs(4), "text", k = 6)
    val baseB = Bpe.trainByteMerges(docs(4), "text", k = 6)
    assert(base.nonEmpty && baseB.nonEmpty)
    for (ip <- Seq(2, 13)) {
      assert(Bpe.trainMerges(docs(ip), "text", k = 6) == base)
      assert(Bpe.trainByteMerges(docs(ip), "text", k = 6) == baseB)
    }
  }

  test("containment pairs and link-prediction scores are partitioning-independent") {
    // the shingle-DF caps, bounded blocking, and integer gates claim
    // bit-identity for the directional containment family and the
    // wedge-count feature table at any parallelism; every 4th doc gets
    // a planted 8-word-prefix twin so the directional gate actually
    // fires
    def cdocs(parts: Int) = {
      val d = docs(parts)
      // planted ids are ODD so the cross (corpus-even vs batch-odd)
      // arm sees them too
      d.unionAll(d.where(col("doc_id") % 4 === 0)
          .select(col("doc_id") + 1001,
            expr("array_join(slice(split(text, ' '), 1, 8), ' ')")))
        .repartition(parts)
    }
    val base = canon(underPartitions(2) {
      Dedup.clearShingleCache()
      Dedup.containmentPairs(cdocs(2), "text", "doc_id", n = 3,
        num = 3, den = 5)
    })
    val alt = canon(underPartitions(7) {
      Dedup.clearShingleCache()
      Dedup.containmentPairs(cdocs(11), "text", "doc_id", n = 3,
        num = 3, den = 5)
    })
    assert(base == alt && base.nonEmpty,
      s"containment pairs diverged: ${base.size} vs ${alt.size}")
    val crossBase = canon(underPartitions(2) {
      Dedup.clearShingleCache()
      Dedup.containmentPairsCrossFused(cdocs(2), "text", "doc_id",
        id => id % 2 === 1, n = 3, num = 3, den = 5)
    })
    val crossAlt = canon(underPartitions(7) {
      Dedup.clearShingleCache()
      Dedup.containmentPairsCrossFused(cdocs(11), "text", "doc_id",
        id => id % 2 === 1, n = 3, num = 3, den = 5)
    })
    assert(crossBase == crossAlt && crossBase.nonEmpty,
      s"cross containment diverged: ${crossBase.size} vs ${crossAlt.size}")
    def edges(parts: Int) = {
      val s = spark
      import s.implicits._
      (0L until 200L).flatMap(i =>
        Seq((i, (i * 7 + 1) % 200), (i, (i * 13 + 5) % 200)))
        .filter { case (a, b) => a < b }
        .map { case (a, b) => (a, b) }
        .toDF("id_a", "id_b").repartition(parts)
    }
    val lpA = canon(underPartitions(2) {
      GraphAlgos.linkPredictionScores(edges(2), minCommon = 2) })
    val lpB = canon(underPartitions(7) {
      GraphAlgos.linkPredictionScores(edges(11), minCommon = 2) })
    assert(lpA == lpB && lpA.nonEmpty,
      s"link-prediction scores diverged: ${lpA.size} vs ${lpB.size}")
  }

  test("dupClustersStar clusters are partitioning-independent") {
    check("dupClustersStar") { (_, ip) =>
      val ids = docs(ip).select(col("doc_id"))
      Dedup.dupClustersStar(ids
        .select(col("doc_id").as("id_a"), (col("doc_id") + 1).as("id_b"))
        .where(col("id_a") % 15 =!= 14)
        .join(ids.select(col("doc_id").as("id_b")), Seq("id_b"), "left_semi"))
    }
  }
}
