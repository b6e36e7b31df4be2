package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.GraphStream
import graft.model.{GraphPersistence, GraphStore}

class StreamingSpec extends GraftSuite {

  test("windowed event counts with watermark (streaming plan, memory sink)") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val agg = GraphStream.windowedEventCounts(events, "1 minute", "1 minute")
    val q = agg.writeStream.format("memory").queryName("winagg")
      .outputMode(OutputMode.Append()).start()
    try {
      def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
      mem.addData((t(0), "click", 1.0), (t(0), "click", 2.0), (t(1), "view", 5.0))
      q.processAllAvailable()
      // push watermark far forward so earlier windows close and emit
      mem.addData((t(30), "click", 1.0))
      q.processAllAvailable()
      val out = s.table("winagg").select("event_type", "cnt", "total_value").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(out.contains(("click", 2L, 3.0)))
      assert(out.contains(("view", 1L, 5.0)))
    } finally q.stop()
  }

  test("streaming dedup drops repeated documents within the watermark") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val docs = mem.toDF().toDF("ts", "doc_id", "text")
    val q = GraphStream.streamingDedup(docs, "text", "ts", "10 minutes")
      .writeStream.format("memory").queryName("dedupdocs")
      .outputMode(OutputMode.Append()).start()
    try {
      val ts = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
      mem.addData((ts, 1L, "alpha"), (ts, 2L, "alpha"), (ts, 3L, "beta"))
      q.processAllAvailable()
      mem.addData((ts, 4L, "alpha")) // still inside the horizon: dropped
      q.processAllAvailable()
      val texts = s.table("dedupdocs").select("text").collect().map(_.getString(0)).toSeq
      assert(texts.sorted == Seq("alpha", "beta")) // one alpha survives
    } finally q.stop()
  }

  test("nearDupIngestFilter drops stream docs near-duplicate to the standing corpus") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely different content about spark structured streaming"))
      .toDF("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val q = GraphStream.nearDupIngestFilter(docs, corpus, "text", "doc_id")
      .writeStream.format("memory").queryName("ingestclean")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        (10L, "the quick brown fox jumps over the lazy dog tonight"), // exact dup
        (11L, "unrelated fresh words with novel vocabulary entirely"))
      q.processAllAvailable()
      val kept = s.table("ingestclean").select("doc_id").collect()
        .map(_.getLong(0)).toSet
      assert(!kept.contains(10L), "exact duplicate must be dropped")
      assert(kept.contains(11L), "fresh document must survive")
    } finally q.stop()
  }

  test("mediaNearDupIngestFilter drops a later-batch near-dup clip; batch parity on survivors") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    import graft.pipeline.Multimodal
    val corpus = Multimodal.mediaFromIds(
      (0 until 90).map(_.toLong).toDF("doc_id"), "doc_id", only = Some("audio"))
    val corpusRows = corpus.select("media_id", "content").collect()
    val corpusKeys = corpusRows.flatMap { r =>
      Multimodal.audioHashOf(r.getAs[Array[Byte]](1)).toSeq
        .flatMap(h => Multimodal.bandKeysOfHash(h, 4, 16))
    }.toSet
    // a near-dup: byte-identical re-upload of a standing corpus clip
    val dupBytes = corpusRows.head.getAs[Array[Byte]](1)
    // a fresh clip: first candidate from a disjoint id range that
    // shares NO 16-bit band with any corpus hash (deterministic given
    // the fixed corpus; asserted so a fixture drift fails loudly)
    val fresh = Multimodal.mediaFromIds(
      (1000L until 1600L by 3).toDF("doc_id"), "doc_id", only = Some("audio"))
      .select("media_id", "content").collect().find { r =>
        val ks = Multimodal.audioHashOf(r.getAs[Array[Byte]](1)).toSeq
          .flatMap(h => Multimodal.bandKeysOfHash(h, 4, 16))
        ks.nonEmpty && ks.forall(!corpusKeys.contains(_))
      }
    assert(fresh.isDefined, "fixture needs a clip sharing no band with the corpus")
    val freshBytes = fresh.get.getAs[Array[Byte]](1)
    val mem = MemoryStream[(Long, Array[Byte])]
    val stream = mem.toDF().toDF("media_id", "content")
    val q = GraphStream.mediaNearDupIngestFilter(stream, corpus, "audio")
      .writeStream.format("memory").queryName("mediaclean")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((500L, freshBytes))
      q.processAllAvailable()
      // the near-dup arrives in a LATER micro-batch: still filtered
      // (the corpus band Bloom is standing state, not per-batch)
      mem.addData((501L, dupBytes), (502L, freshBytes))
      q.processAllAvailable()
      val kept = s.table("mediaclean").select("media_id").collect()
        .map(_.getLong(0)).toSet
      assert(!kept.contains(501L), "re-uploaded corpus clip must be dropped")
      assert(kept == Set(500L, 502L), s"fresh clips must survive: $kept")
      // batch == stream parity: the same filter over a batch frame of
      // the streamed rows keeps exactly the same survivors
      val batchKept = GraphStream.mediaNearDupIngestFilter(
        Seq((500L, freshBytes), (501L, dupBytes), (502L, freshBytes))
          .toDF("media_id", "content"), corpus, "audio")
        .select("media_id").collect().map(_.getLong(0)).toSet
      assert(batchKept == kept, s"batch $batchKept vs stream $kept")
    } finally q.stop()
  }

  test("video ingest filter drops a leading-frame-trimmed re-upload; undecodable passes") {
    val s = spark
    import s.implicits._
    import graft.pipeline.Multimodal
    def frame(fill: Int => Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, fill(y * 8 + x))
      img
    }
    // standing clip: a stripes first frame + 3 gradient frames
    val f0 = frame(p => if (p % 2 == 0) 0xFFFFFF else 0)
    val rest = (1 to 3).map(f => frame(p => {
      val g = (p * 4 + f) & 0xFF; (g << 16) | (g << 8) | g
    }))
    val corpus = Seq((0L, Multimodal.encodeAvi(f0 +: rest, fps = 10)))
      .toDF("media_id", "content")
    // the trimmed re-upload shares NO first-frame hash band by the
    // PipelineSpec fixture argument, but 3 of its frames are exact
    // copies — the multi-frame probe must drop it
    val trimmed = Multimodal.encodeAvi(rest, fps = 10)
    // a genuinely fresh clip (distinct gradient family)
    val freshClip = Multimodal.encodeAvi(
      (0 until 3).map(f => frame(p => {
        val g = 255 - ((p * 7 + f * 11) & 0xFF); (g << 16) | (g << 8) | (g / 2)
      })), fps = 10)
    val kept = GraphStream.mediaNearDupIngestFilter(
        Seq((600L, trimmed), (601L, freshClip),
          (602L, Array.fill[Byte](48)(7))) // undecodable: passes through
          .toDF("media_id", "content"), corpus, "video")
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(!kept.contains(600L), s"trimmed re-upload must drop: $kept")
    assert(kept.contains(602L), s"undecodable payload must pass: $kept")
    // fixture sanity: the fresh clip shares no band with ANY corpus
    // frame (else its survival below is vacuous)
    val corpusKeys = Multimodal.videoHashesOf(
        corpus.head().getAs[Array[Byte]](1))
      .flatMap(h => Multimodal.bandKeysOfHash(h, 4, 16)).toSet
    val freshKeys = Multimodal.videoHashesOf(freshClip)
      .flatMap(h => Multimodal.bandKeysOfHash(h, 4, 16))
    if (freshKeys.forall(!corpusKeys.contains(_)))
      assert(kept.contains(601L), s"fresh clip must survive: $kept")
  }

  test("thumbnailIngestFilter drops an image re-post of a corpus video frame; fresh and undecodable pass") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    import graft.pipeline.Multimodal
    def bitFrame(v: Long): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (p <- 0 until 64)
        img.setRGB(p % 8, p / 8,
          if (p < 63 && ((v >> p) & 1L) == 1L) 0xFFFFFF else 0x000000)
      img
    }
    val vals = (0 until 5).map(f =>
      ((f + 1).toLong * 0x9E3779B97F4A7C15L) >>> 1)
    val videoCorpus = Seq((10L, Multimodal.encodeAvi(vals.map(bitFrame), fps = 10)))
      .toDF("media_id", "content")
    val repost = Multimodal.encodePng(bitFrame(vals(3)))
    val freshImg = Multimodal.encodePng(
      bitFrame((77L * 0x9E3779B97F4A7C15L) >>> 1))
    // fixture sanity: the fresh image shares no 16-bit band with any
    // corpus frame hash (else its survival is vacuous)
    val corpusKeys = Multimodal.videoHashesOf(
        videoCorpus.head().getAs[Array[Byte]](1))
      .flatMap(h => Multimodal.bandKeysOfHash(h, 4, 16)).toSet
    val freshKeys = Multimodal.imageHashOf(freshImg).toSeq
      .flatMap(h => Multimodal.bandKeysOfHash(h, 4, 16))
    assert(freshKeys.nonEmpty && freshKeys.forall(!corpusKeys.contains(_)),
      "fixture needs a fresh image sharing no band with the corpus frames")
    val mem = MemoryStream[(Long, Array[Byte])]
    val stream = mem.toDF().toDF("media_id", "content")
    val q = GraphStream.thumbnailIngestFilter(stream, videoCorpus, fpp = 1e-6)
      .writeStream.format("memory").queryName("thumbclean")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((700L, freshImg))
      q.processAllAvailable()
      // the frame re-post arrives in a LATER micro-batch: the corpus
      // frame Bloom is standing state, not per-batch
      mem.addData((701L, repost), (702L, Array.fill[Byte](32)(9)))
      q.processAllAvailable()
      val kept = s.table("thumbclean").select("media_id").collect()
        .map(_.getLong(0)).toSet
      assert(!kept.contains(701L), s"frame re-post must be dropped: $kept")
      assert(kept == Set(700L, 702L),
        s"fresh image and undecodable payload must survive: $kept")
      // batch == stream parity on the same rows
      val batchKept = GraphStream.thumbnailIngestFilter(
        Seq((700L, freshImg), (701L, repost),
          (702L, Array.fill[Byte](32)(9))).toDF("media_id", "content"),
        videoCorpus, fpp = 1e-6)
        .select("media_id").collect().map(_.getLong(0)).toSet
      assert(batchKept == kept, s"batch $batchKept vs stream $kept")
    } finally q.stop()
  }

  test("winnow-probe video filter drops a re-cut re-upload the ordinal probe misses; dhash arm catches a re-grade") {
    val s = spark
    import s.implicits._
    import graft.pipeline.Multimodal
    // 63-bit values as 8x8 black/white bit grids: frame hash == value
    // (the PipelineSpec re-cut fixture, reused as an ingest stream)
    def bitFrame(v: Long): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (p <- 0 until 64)
        img.setRGB(p % 8, p / 8,
          if (p < 63 && ((v >> p) & 1L) == 1L) 0xFFFFFF else 0x000000)
      img
    }
    val vals = (0 until 40).map(f =>
      ((f + 1).toLong * 0x9E3779B97F4A7C15L) >>> 1)
    val frames = vals.map(bitFrame)
    val corpus = Seq((0L, Multimodal.encodeAvi(frames, fps = 10)))
      .toDF("media_id", "content")
    // a 22-frame leading cut: survivors are verbatim, but ordinal
    // sample indices are length-keyed — only original frame 35 is
    // sampled by both cuts, one hit frame, under the >= 2 gate
    val recut = Multimodal.encodeAvi(frames.drop(22), fps = 10)
    val stream = Seq((700L, recut)).toDF("media_id", "content")
    val ordinalKept = GraphStream.mediaNearDupIngestFilter(
        stream, corpus, "video")
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(ordinalKept.contains(700L),
      s"fixture: the ordinal probe is expected to miss this re-cut: $ordinalKept")
    val winnowKept = GraphStream.mediaNearDupIngestFilter(
        stream, corpus, "video", videoWinnowWindow = Some(3))
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(!winnowKept.contains(700L),
      s"winnow probe must drop the re-cut re-upload: $winnowKept")

    // image arm: a +2x illumination ramp re-grade (the PipelineSpec
    // dHash fixture) — the aHash probe misses it, the dhash arm drops
    // it, and a genuinely fresh image survives the dhash arm
    def gradImage(ramp: Boolean): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8) {
        val g = (if (x % 2 == 0) 118 else 122) + (if (ramp) 2 * x else 0)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      img
    }
    val imgCorpus = Seq((0L, Multimodal.encodePng(gradImage(ramp = false))))
      .toDF("media_id", "content")
    val regraded = Multimodal.encodePng(gradImage(ramp = true))
    val freshImg = Multimodal.encodePng(bitFrame(vals(7)))
    val imgStream = Seq((800L, regraded), (801L, freshImg))
      .toDF("media_id", "content")
    def keptWith(kind: String) = GraphStream.mediaNearDupIngestFilter(
        imgStream, imgCorpus, "image", imageHashKind = kind)
      .select("media_id").collect().map(_.getLong(0)).toSet
    // aHash Hamming is 16 across the ramp, so no band can survive
    // untouched only by luck — still, guard the miss like the video
    // fixture: the probe KEEPING the re-grade is the expected miss
    assert(keptWith("ahash").contains(800L),
      "fixture: the ahash probe is expected to miss the re-grade")
    val dh = keptWith("dhash")
    assert(!dh.contains(800L), s"dhash arm must drop the re-grade: $dh")
    val corpusDKeys = Multimodal.imageDHashOf(
        imgCorpus.head().getAs[Array[Byte]](1))
      .toSeq.flatMap(h => Multimodal.bandKeysOfHash(h, 4, 16)).toSet
    val freshDKeys = Multimodal.imageDHashOf(freshImg)
      .toSeq.flatMap(h => Multimodal.bandKeysOfHash(h, 4, 16))
    if (freshDKeys.forall(!corpusDKeys.contains(_)))
      assert(dh.contains(801L), s"fresh image must survive the dhash arm: $dh")
  }

  test("containmentIngestFilter drops a short quote of a corpus doc; local kernel hash-matches the engine") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    import graft.pipeline.Dedup
    val longText = (1 to 30).map(i => s"word$i").mkString(" ") +
      " alpha beta gamma delta epsilon zeta"
    val corpus = Seq((1L, longText)).toDF("doc_id", "text")
    // local kernel == engine hashes (incl. the < n tokens whole-text
    // rule), so the predicate can stand in for the distributed build
    val engineHashes = Dedup.shingleHashSet(corpus, "text", "doc_id", 3)
      .select("_sh").collect().map(_.getLong(0)).toSet
    assert(Dedup.shingleHashesOfText(longText, 3).toSet == engineHashes)
    val short = "Alpha, beta!"
    assert(Dedup.shingleHashesOfText(short, 3).toSet ==
      Dedup.shingleHashSet(Seq((9L, short)).toDF("doc_id", "text"),
        "text", "doc_id", 3).select("_sh").collect().map(_.getLong(0)).toSet,
      "short-text whole-doc shingle rule must match")
    val mem = MemoryStream[(Long, String)]
    val q = GraphStream.containmentIngestFilter(
        mem.toDF().toDF("doc_id", "text"), corpus, "text", "doc_id")
      .writeStream.format("memory").queryName("containclean")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        // verbatim quote of the corpus tail: 100% contained, but its
        // symmetric Jaccard vs the long doc is ~4/38 — the band filter
        // family's blind spot, this filter's reason to exist
        (10L, "alpha beta gamma delta epsilon zeta"),
        (11L, "wholly novel vocabulary with no overlap whatsoever today"),
        (12L, "...!!!...")) // tokenless: passes through
      q.processAllAvailable()
      val kept = s.table("containclean").select("doc_id").collect()
        .map(_.getLong(0)).toSet
      assert(!kept.contains(10L), s"contained quote must drop: $kept")
      assert(kept == Set(11L, 12L), s"fresh + tokenless must survive: $kept")
    } finally q.stop()
  }

  test("audio shingle ingest filter drops a trimmed re-upload by containment; local kernel hash-matches the engine") {
    val s = spark
    import s.implicits._
    import graft.pipeline.{Dedup, Multimodal}
    val rnd = new scala.util.Random(43)
    val base = Array.fill(48)((rnd.nextInt(65536) - 32768).toShort)
    val original = Multimodal.encodeWav(base, 16000)
    val corpus = Seq((0L, original)).toDF("media_id", "content")
    // local kernel == engine shingle hashes over the same payload —
    // the parity that lets a row-preserving predicate stand in for
    // the distributed shingle build
    val engineHashes = Dedup.shingleHashSet(
        Multimodal.audioSymbols(corpus), "symbols", "media_id", 3)
      .select("_sh").collect().map(_.getLong(0)).toSet
    val localHashes = Multimodal.audioShingleHashesOf(original).toSet
    assert(localHashes == engineHashes,
      s"kernel diverged: ${localHashes.size} vs ${engineHashes.size}")
    // trimmed re-upload: most of its shingles are corpus shingles ->
    // containment >= 0.6 -> dropped; fresh and undecodable pass
    val trimmed = Multimodal.encodeWav(base.drop(4), 16000)
    val freshClip = Multimodal.encodeWav(
      Array.fill(48)((rnd.nextInt(65536) - 32768).toShort), 16000)
    val kept = GraphStream.audioShingleIngestFilter(
        Seq((700L, trimmed), (701L, freshClip),
          (702L, Array.fill[Byte](16)(3))).toDF("media_id", "content"),
        corpus)
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(!kept.contains(700L), s"trimmed re-upload must drop: $kept")
    assert(kept == Set(701L, 702L),
      s"fresh + undecodable must survive: $kept")
  }

  test("embeddingNearDupIngestFilter drops a re-embedded vector; batch parity on survivors") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    import graft.search.VectorOps
    import graft.pipeline.Multimodal
    val dim = 16
    val rnd = new scala.util.Random(11)
    def vec() = Seq.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)
    val corpusRows = (0 until 60).map(i => (i.toLong, vec()))
    val corpus = corpusRows.toDF("vec_id", "embedding")
    // corpus band keys, brute force via the engine's own signature
    val sigs = VectorOps.signSignature63(corpus, "embedding", "_srp", dim)
      .select("vec_id", "_srp").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val corpusKeys = sigs.values
      .flatMap(h => Multimodal.bandKeysOfHash(h, 4, 16)).toSet
    // the near-dup: an exact re-embedding of a corpus vector
    val dupVec = corpusRows.head._2
    // a fresh vector: first random candidate sharing NO band
    val candidates = (0 until 200).map(i => (1000L + i, vec()))
    val candSigs = VectorOps.signSignature63(
        candidates.toDF("vec_id", "embedding"), "embedding", "_srp", dim)
      .select("vec_id", "_srp").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fresh = candidates.find { case (id, _) =>
      Multimodal.bandKeysOfHash(candSigs(id), 4, 16)
        .forall(!corpusKeys.contains(_))
    }
    assert(fresh.isDefined, "fixture needs a vector sharing no band")
    val freshVec = fresh.get._2
    val mem = MemoryStream[(Long, Seq[Float])]
    val stream = mem.toDF().toDF("vec_id", "embedding")
    val q = GraphStream.embeddingNearDupIngestFilter(stream, corpus,
        "embedding", dim)
      .writeStream.format("memory").queryName("embclean")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((500L, freshVec))
      q.processAllAvailable()
      // the re-embedding arrives in a LATER micro-batch: still dropped
      mem.addData((501L, dupVec), (502L, freshVec))
      q.processAllAvailable()
      val kept = s.table("embclean").select("vec_id").collect()
        .map(_.getLong(0)).toSet
      assert(!kept.contains(501L), "re-embedded corpus vector must drop")
      assert(kept == Set(500L, 502L), s"fresh vectors must survive: $kept")
      // batch == stream parity
      val batchKept = GraphStream.embeddingNearDupIngestFilter(
        Seq((500L, freshVec), (501L, dupVec), (502L, freshVec))
          .toDF("vec_id", "embedding"), corpus, "embedding", dim)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(batchKept == kept, s"batch $batchKept vs stream $kept")
    } finally q.stop()
  }

  test("semanticIngestKeep: foreachBatch SemDeDup drops corpus-near rows across micro-batches; batch parity") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    // the planted-cluster fixture: group == k-means cluster
    val group = Map(0 -> 0, 1 -> 0, 2 -> 0, 6 -> 0,
      3 -> 1, 5 -> 1, 7 -> 1, 4 -> 2, 8 -> 2)
    val rows = (0 until 9).map { i =>
      val v = Array.fill(4)(0f); v(group(i)) = 1f; v(3) = 0.001f * i
      (i.toLong, v.toSeq)
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val keep = GraphStream.semanticIngestKeep(corpus, "vec_id", "embedding",
      k = 3, iters = 2, theta = 0.9)
    // near-copies of corpus rows 1 and 5 must drop; a row orthogonal
    // to every cluster axis must survive; a zero vector (degenerate,
    // null cosine) must pass through
    val dup1 = { val v = rows(1)._2.toArray.clone(); v(3) += 0.0005f; v.toSeq }
    val dup5 = { val v = rows(5)._2.toArray.clone(); v(3) += 0.0005f; v.toSeq }
    val novel = { val v = Array.fill(4)(0f); v(3) = 1f; v.toSeq }
    val zero = Seq.fill(4)(0f)
    val mem = MemoryStream[(Long, Seq[Float])]
    val kept = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = mem.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        keep(b).select("vec_id").collect().foreach(r => kept.add(r.getLong(0)))
        ()
      }
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((101L, dup1), (199L, novel))
      q.processAllAvailable()
      // a later micro-batch assigns to the SAME standing centroids
      mem.addData((105L, dup5), (198L, zero))
      q.processAllAvailable()
      val got = kept.toArray(Array.empty[java.lang.Long]).map(_.toLong).toSet
      assert(got == Set(199L, 198L),
        s"near-copies drop, novel + degenerate survive: $got")
      // batch == stream parity: the direct call on the union batch
      val batchKept = keep(Seq((101L, dup1), (199L, novel),
          (105L, dup5), (198L, zero)).toDF("vec_id", "embedding"))
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(batchKept == got, s"batch $batchKept vs stream $got")
    } finally q.stop()
  }

  test("curationIngestRecipe: composed gate->dedup chain equals the batch recipe; drift taps the raw batch") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    // reference corpus: 3 planted clusters, texts of varying length
    // (so the p25 token gate has a real threshold)
    val group = Map(0 -> 0, 1 -> 0, 2 -> 0, 6 -> 0,
      3 -> 1, 5 -> 1, 7 -> 1, 4 -> 2, 8 -> 2)
    val rows = (0 until 9).map { i =>
      val v = Array.fill(4)(0f); v(group(i)) = 1f; v(3) = 0.001f * i
      (i.toLong, ("tok " * (4 + i)).trim, v.toSeq)
    }
    val ref = rows.toDF("doc_id", "text", "embedding")
    val recipe = GraphStream.curationIngestRecipe(ref, "doc_id", "text",
      "embedding", pNum = 1, pDen = 4, k = 3, iters = 2, theta = 0.9,
      vocab = 4)
    // p25 of token counts 5..13 -> threshold 7 (percentile_disc):
    // verified against the batch gate below, not assumed here
    val dup1 = { val v = rows(1)._3.toArray.clone(); v(3) += 0.0005f; v.toSeq }
    val novel = { val v = Array.fill(4)(0f); v(3) = 1f; v.toSeq }
    val longText = ("tok " * 12).trim
    val shortText = "tok tok" // under any 5..13 p25 threshold
    val batches = Seq(
      Seq((101L, longText, dup1), (102L, longText, novel)),
      Seq((103L, shortText, novel), (104L, longText, novel)))
    val mem = MemoryStream[(Long, String, Seq[Float])]
    val kept = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val driftRows = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
    val q = mem.toDF().toDF("doc_id", "text", "embedding").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val (k2, dr) = recipe(b)
        k2.select("doc_id").collect().foreach(r => kept.add(r.getLong(0)))
        dr.select("term", "contrib_q").collect()
          .foreach(r => driftRows.add((r.getString(0), r.getLong(1))))
        ()
      }
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(batches(0): _*)
      q.processAllAvailable()
      mem.addData(batches(1): _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = kept.toArray(Array.empty[java.lang.Long]).map(_.toLong).toSet
    // 101 is a near-copy of corpus row 1 (dedup drops), 103 is under
    // the length gate (gate drops), 102/104 are long novel rows (pass)
    assert(got == Set(102L, 104L), s"composed chain kept: $got")
    // composition parity: the recipe applied to the UNION as one batch
    // equals the union of per-batch outputs
    val union = batches.flatten.toDF("doc_id", "text", "embedding")
    val (batchKept, batchDrift) = recipe(union)
    assert(batchKept.select("doc_id").collect().map(_.getLong(0)).toSet == got,
      "union-of-batches must equal the single batch")
    // the batch form equals composing the standalone arms directly
    val gated = GraphStream.quantileGateIngestFilter(
      union.withColumn("_ntok",
        size(graft.pipeline.TextAnalysis.tokens(col("text"))).cast("long")),
      ref.select(size(graft.pipeline.TextAnalysis.tokens(col("text")))
        .cast("long").as("_ntok")),
      "_ntok", 1, 4)
    val armKept = GraphStream.semanticIngestKeep(ref, "doc_id", "embedding",
        k = 3, iters = 2, theta = 0.9)(gated)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(armKept == got, s"standalone arms $armKept vs recipe $got")
    // drift taps the RAW batch: the gated-out short doc's tokens are
    // still counted — per-batch c_new sums equal raw batch token count
    val totalNew = driftRows.toArray(Array.empty[(String, Long)]).length
    assert(totalNew > 0, "drift tables must be emitted per batch")
    val unionDriftTerms = batchDrift.select("term").collect()
      .map(_.getString(0)).toSet
    assert(unionDriftTerms.contains("tok") || unionDriftTerms.contains("<unk>"),
      s"drift table must cover the arriving vocabulary: $unionDriftTerms")
  }

  test("qualityClfIngestFilter: stream keep-set equals the batch scorer's margin gate") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    import graft.pipeline.QualityClf
    val corpus = Seq(
      (1L, "good clean prose with real sentences", 1L),
      (2L, "good structure and good grammar here", 1L),
      (3L, "spam spam click here buy now", 0L),
      (4L, "asdf qwer zxcv garbled nonsense tokens", 0L),
      (5L, "a good and thoughtful essay follows", 1L),
      (6L, "buy buy buy click spam offer", 0L)).toDF("doc_id", "text", "y")
    val model = QualityClf.trainQualityClf(corpus, "doc_id", "text", "y",
      buckets = 64, epochs = 16, lrWNum = 64L)
    // stream rows: trained-on docs + unseen variants + a tokenless row
    val rows = Seq(
      (11L, "good thoughtful prose here"),
      (12L, "spam click buy buy spam"),
      (13L, "!!!"), // tokenless: scores bias
      (14L, "good grammar and clean structure"))
    val batchKept = QualityClf.scoreQualityClf(
        rows.toDF("doc_id", "text"), "doc_id", "text", model)
      .where(col("qclf_margin") >= 0L)
      .collect().map(_.getLong(0)).toSet
    val mem = MemoryStream[(Long, String)]
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = GraphStream.qualityClfIngestFilter(
        mem.toDF().toDF("doc_id", "text"), "text", model, minMarginQ = 0L)
      .writeStream.foreachBatch {
        (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.select("doc_id").collect().foreach(r => got.add(r.getLong(0)))
          ()
      }.outputMode(OutputMode.Append()).start()
    try {
      mem.addData(rows.take(2): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamKept = got.toArray(Array.empty[java.lang.Long]).map(_.toLong).toSet
    assert(streamKept == batchKept,
      s"stream gate must equal the batch margin gate: $streamKept vs $batchKept")
    // the gate actually separates on this corpus: a good-ish row in,
    // a spammy row out
    assert(streamKept.contains(11L) && !streamKept.contains(12L),
      s"trained gate must separate: $streamKept")
    // a confidence threshold above the bias excludes tokenless rows
    // whenever the prior doesn't clear it
    val strict = QualityClf.scoreQualityClf(
        rows.toDF("doc_id", "text"), "doc_id", "text", model)
      .where(col("qclf_margin") >= lit(model.bias + 1L))
      .collect().map(_.getLong(0)).toSet
    assert(!strict.contains(13L), "tokenless row scores exactly the bias")
  }

  test("curationShardRecipe: gate->dedup->pack chain, open bins span batches, equals batch recipe-then-pack") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    // the curationIngestRecipe fixture: planted clusters + length gate
    val group = Map(0 -> 0, 1 -> 0, 2 -> 0, 6 -> 0,
      3 -> 1, 5 -> 1, 7 -> 1, 4 -> 2, 8 -> 2)
    val rows = (0 until 9).map { i =>
      val v = Array.fill(4)(0f); v(group(i)) = 1f; v(3) = 0.001f * i
      (i.toLong, ("tok " * (4 + i)).trim, v.toSeq)
    }
    val ref = rows.toDF("doc_id", "text", "embedding")
    // window 30, one bucket: the two 12-token survivors (102, 104)
    // arrive in DIFFERENT batches and must share sequence 1 — the
    // open bin persisting across micro-batches
    val recipe = GraphStream.curationShardRecipe(ref, "doc_id", "text",
      "embedding", pNum = 1, pDen = 4, k = 3, iters = 2, theta = 0.9,
      vocab = 4, window = 30L, nBuckets = 1)
    val dup1 = { val v = rows(1)._3.toArray.clone(); v(3) += 0.0005f; v.toSeq }
    val novel = { val v = Array.fill(4)(0f); v(3) = 1f; v.toSeq }
    val longText = ("tok " * 12).trim
    val shortText = "tok tok"
    val batches = Seq(
      Seq((101L, longText, dup1), (102L, longText, novel)),
      Seq((103L, shortText, novel), (104L, longText, novel)))
    val mem = MemoryStream[(Long, String, Seq[Float])]
    val packed = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long, Long)]()
    val q = mem.toDF().toDF("doc_id", "text", "embedding").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val (p, _) = recipe(b)
        p.collect().foreach(r => packed.add(
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))))
        ()
      }
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(batches(0): _*)
      q.processAllAvailable()
      mem.addData(batches(1): _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = packed.toArray(Array.empty[(Long, Long, Long, Long)]).toSet
    // 101 dedup-dropped, 103 gate-dropped; 102 and 104 pack into the
    // SAME sequence (12 + 12 <= 30) even though they arrived in
    // different micro-batches
    assert(got == Set((102L, 0L, 1L, 12L), (104L, 0L, 1L, 12L)),
      s"composed shard chain packed: $got")
    // batch parity: a FRESH recipe applied to the union as one batch
    // (same curate semantics, fresh open bins) gives the same layout
    val recipe2 = GraphStream.curationShardRecipe(ref, "doc_id", "text",
      "embedding", pNum = 1, pDen = 4, k = 3, iters = 2, theta = 0.9,
      vocab = 4, window = 30L, nBuckets = 1)
    val union = batches.flatten.toDF("doc_id", "text", "embedding")
    val (pu, _) = recipe2(union)
    val unionGot = pu.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(unionGot == got, s"union-of-batches must pack identically: $unionGot")
    // ...and equals composing the standalone arms by hand: gate +
    // dedup via the recipe, then the batch packer on the survivors
    val (keptU, _) = GraphStream.curationIngestRecipe(ref, "doc_id",
      "text", "embedding", 1, 4, 3, 2, 0.9, 4)(union)
    val handPacked = graft.pipeline.Packing.packSequences(
        keptU, "doc_id", "text", window = 30, nBuckets = 1)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(handPacked == got, s"hand-composed arms: $handPacked")
    // a third batch opens sequence 2 once the open bin overflows
    val (p3, _) = recipe(Seq((105L, longText, novel))
      .toDF("doc_id", "text", "embedding"))
    val got3 = p3.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got3 == Set((105L, 0L, 2L, 12L)),
      s"open bin at 24/30 must overflow to seq 2: $got3")
  }

  test("curationShardRecipe statePath: a rebuilt recipe resumes open bins — kill/restart equals the uninterrupted run") {
    val s = spark
    import s.implicits._
    val ref = (0 until 9).map { i =>
      val v = Array.fill(4)(0f); v(i % 3) = 1f; v(3) = 0.001f * i
      (i.toLong, ("tok " * (4 + i)).trim, v.toSeq)
    }.toDF("doc_id", "text", "embedding")
    val novel = { val v = Array.fill(4)(0f); v(3) = 1f; v.toSeq }
    val longText = ("tok " * 12).trim
    val dir = java.nio.file.Files.createTempDirectory("binstate").toString
    val sp = s"$dir/bins.state"
    def mk() = GraphStream.curationShardRecipe(ref, "doc_id", "text",
      "embedding", pNum = 1, pDen = 4, k = 3, iters = 2, theta = 0.9,
      vocab = 4, window = 30L, nBuckets = 1, statePath = Some(sp))
    def pack(recipe: org.apache.spark.sql.DataFrame => (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame),
        docs: Seq[(Long, String, Seq[Float])]) =
      recipe(docs.toDF("doc_id", "text", "embedding"))._1.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // "stream": batch 1 through recipe A, then A dies; batch 2 through
    // a FRESH recipe constructed from the same statePath
    val a = mk()
    val g1 = pack(a, Seq((102L, longText, novel)))
    val b = mk() // restart: restores (seq=1, fill=12) from disk
    val g2 = pack(b, Seq((104L, longText, novel)))
    // 12 + 12 <= 30: the restarted recipe must CONTINUE bin (0, seq 1)
    assert(g1 == Set((102L, 0L, 1L, 12L)) && g2 == Set((104L, 0L, 1L, 12L)),
      s"restart must resume the open bin, not re-anchor: $g1 / $g2")
    // ...and the next doc overflows to seq 2 exactly like the
    // uninterrupted run would
    val g3 = pack(b, Seq((105L, longText, novel)))
    assert(g3 == Set((105L, 0L, 2L, 12L)), s"post-restart overflow: $g3")
    // without statePath a fresh recipe silently re-anchors (the gap
    // this checkpoint closes)
    val c = GraphStream.curationShardRecipe(ref, "doc_id", "text",
      "embedding", pNum = 1, pDen = 4, k = 3, iters = 2, theta = 0.9,
      vocab = 4, window = 30L, nBuckets = 1)
    val g4 = pack(c, Seq((106L, longText, novel)))
    assert(g4 == Set((106L, 0L, 1L, 12L)), s"stateless recipe re-anchors: $g4")
  }

  test("curationShardRecipeTx: batch-id-keyed commit makes a mid-batch crash replay idempotent") {
    val s = spark
    import s.implicits._
    val ref = (0 until 9).map { i =>
      val v = Array.fill(4)(0f); v(i % 3) = 1f; v(3) = 0.001f * i
      (i.toLong, ("tok " * (4 + i)).trim, v.toSeq)
    }.toDF("doc_id", "text", "embedding")
    val novel = { val v = Array.fill(4)(0f); v(3) = 1f; v.toSeq }
    val longText = ("tok " * 12).trim
    val dir = java.nio.file.Files.createTempDirectory("txbinstate").toString
    val sp = s"$dir/bins.tx"
    def mk() = GraphStream.curationShardRecipeTx(ref, "doc_id", "text",
      "embedding", pNum = 1, pDen = 4, k = 3, iters = 2, theta = 0.9,
      vocab = 4, window = 30L, nBuckets = 1, statePath = sp)
    def pack(recipe: (org.apache.spark.sql.DataFrame, Long) => (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame),
        id: Long, docs: Seq[(Long, String, Seq[Float])]) =
      recipe(docs.toDF("doc_id", "text", "embedding"), id)._1.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val a = mk()
    val b0 = pack(a, 0L, Seq((102L, longText, novel)))
    val b1 = pack(a, 1L, Seq((104L, longText, novel)))
    assert(b0 == Set((102L, 0L, 1L, 12L)) && b1 == Set((104L, 0L, 1L, 12L)),
      s"open bin must span batches: $b0 / $b1")
    // crash AFTER batch 1's state commit but BEFORE the sink commit:
    // Spark replays batch 1 with the same id into a REBUILT recipe.
    // The post-batch form would seed from batch 1's post-state and
    // double-advance; the tx form seeds from its pre-state and
    // reproduces the identical assignment
    val b = mk()
    val b1r = pack(b, 1L, Seq((104L, longText, novel)))
    assert(b1r == b1, s"replayed batch must be byte-identical: $b1r vs $b1")
    // and the stream then continues exactly like the uninterrupted run
    // (12+12+12 > 30: batch 2's doc overflows to seq 2)
    val b2 = pack(b, 2L, Seq((105L, longText, novel)))
    assert(b2 == Set((105L, 0L, 2L, 12L)), s"post-replay continuation: $b2")
    // an id BEHIND the committed frontier is a mispaired checkpoint —
    // refused loudly
    val err = intercept[IllegalArgumentException] {
      pack(mk(), 0L, Seq((106L, longText, novel)))
    }
    assert(err.getMessage.contains("older than the committed frontier"))
    // a post-batch-format state file is refused (no batch id — a
    // replay would be indistinguishable from an advance)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(sp), "0 1 12\n")
    val err2 = intercept[IllegalArgumentException] { mk() }
    assert(err2.getMessage.contains("not a transactional bin-state file"))
  }

  test("rankEvalIngestMonitor: per-batch integer summaries equal the batch form; degraded batch reads lower") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    // qrels: query 1 -> {10, 11}; query 2 -> {20}
    val qrels = Seq((1L, 10L), (1L, 11L), (2L, 20L))
      .toDF("query_id", "doc_id")
    val monitor = GraphStream.rankEvalIngestMonitor(qrels, k = 3)
    // batch A: perfect runs (relevant at rank 1); batch B: degraded
    // (query 1 finds a relevant doc only at rank 3, query 2 none)
    val batchA = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 99L, 3L),
      (2L, 20L, 1L), (2L, 98L, 2L))
    val batchB = Seq((1L, 97L, 1L), (1L, 96L, 2L), (1L, 11L, 3L),
      (2L, 95L, 1L), (2L, 94L, 2L))
    val mem = MemoryStream[(Long, Long, Long)]
    val sums = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val q = mem.toDF().toDF("query_id", "doc_id", "rank").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        monitor(b).collect().foreach(r =>
          sums.add((r.getLong(0), r.getLong(1)))) // (n_queries, mrr_q)
        ()
      }
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(batchA: _*); q.processAllAvailable()
      mem.addData(batchB: _*); q.processAllAvailable()
    } finally q.stop()
    val got = sums.toArray(Array.empty[(Long, Long)]).toSeq
    assert(got.size == 2, s"one summary row per batch: $got")
    // parity with the batch form on each batch's own rows
    def batchForm(rows: Seq[(Long, Long, Long)]) = {
      val r = graft.search.RankEval.rankEvalSummary(
        graft.search.RankEval.rankEvalReport(
          rows.toDF("query_id", "doc_id", "rank"), qrels, k = 3))
        .collect().head
      (r.getLong(0), r.getLong(1))
    }
    assert(got.toSet == Set(batchForm(batchA), batchForm(batchB)),
      s"per-batch summaries must equal the batch form: $got")
    // the alert signal: the perfect batch reads MRR = 1e9 exactly
    // (both queries' first relevant at rank 1); the degraded batch
    // reads (1e9//3 + 0)/2 = 166666666 — strictly lower
    assert(got.toSet == Set((2L, 1000000000L), (2L, 166666666L)),
      s"hand-computed per-batch MRR: $got")
  }

  test("protoIngestFilter: batch parity with the prune, hard rows pass, prototypical and unmeasurable drop") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    // the kmeans fixture: per-row jitter makes every distance unique,
    // so the threshold filter must match the rank-based prune exactly
    val group = Map(0 -> 0, 1 -> 0, 2 -> 0, 6 -> 0,
      3 -> 1, 5 -> 1, 7 -> 1, 4 -> 2, 8 -> 2)
    val rows = (0 until 9).map { i =>
      val v = Array.fill(4)(0f); v(group(i)) = 1f; v(3) = 0.001f * i
      (i.toLong, v.toSeq)
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val kept = GraphStream.protoIngestFilter(corpus, corpus, "vec_id",
        "embedding", k = 3, iters = 2, keepNum = 1, keepDen = 2)
      .collect().map(_.getLong(0)).toSet
    val pruneKept = graft.search.VectorOps.prototypicalityPrune(corpus,
        "vec_id", "embedding", k = 3, iters = 2, 1, 2)
      .collect().map(_.getLong(0)).toSet
    // the documented contract: prune's keep set plus any rows TIED at
    // a cluster's boundary distance (the rank prune id-breaks exact
    // ties; a per-row threshold admits them — this fixture has
    // symmetric jitter, so clusters 1 and 2 tie at their boundary)
    val scores = graft.search.VectorOps.prototypicalityScores(corpus,
        "vec_id", "embedding", k = 3, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val bound = scores.filter(s => pruneKept(s._1))
      .groupBy(_._2).view.mapValues(_.map(_._3).min).toMap
    val expected = scores.filter(s =>
      bound.get(s._2).exists(s._3 >= _)).map(_._1).toSet
    assert(kept == expected,
      s"threshold filter $kept vs boundary-expanded prune $expected")
    assert(pruneKept.subsetOf(kept), "prune keeps must all pass")
    // streaming: a copy of a kept hard row passes; a near-centroid
    // (prototypical) row drops; a wrong-length vector is unmeasurable
    // and drops
    val hard = rows(6)._2
    val proto = Seq(1f, 0f, 0f, 0.00225f)
    val short2 = Seq(1f, 0f)
    // NaN components would quantize to 0 (a fabricated far-away
    // vector that looks maximally hard) without the explicit gate
    val nan = Seq(Float.NaN, 0f, 0f, 0f)
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = GraphStream.protoIngestFilter(
        mem.toDF().toDF("vec_id", "embedding"), corpus, "vec_id",
        "embedding", k = 3, iters = 2, keepNum = 1, keepDen = 2)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select("vec_id").collect().foreach(r => got.add(r.getLong(0)))
        ()
      }
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((201L, hard), (202L, proto), (203L, short2), (204L, nan))
      q.processAllAvailable()
      val ids = got.toArray(Array.empty[java.lang.Long]).map(_.toLong).toSet
      assert(ids == Set(201L),
        s"hard copy passes; prototypical, wrong-length and NaN drop: $ids")
    } finally q.stop()
    // a keep-nothing reference prune keeps nothing at ingest either
    assert(GraphStream.protoIngestFilter(corpus, corpus, "vec_id",
      "embedding", k = 3, iters = 2, keepNum = 0, keepDen = 1).count() == 0L)
  }

  test("quantileGateIngestFilter: reference threshold gates the stream, nulls drop, empty reference refuses") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    // reference {10,10,20,30,40,50} at 1/2 -> threshold = 20
    val corpus = Seq((1L, 10L), (2L, 10L), (3L, 20L), (4L, 30L),
      (5L, 40L), (6L, 50L)).toDF("id", "v")
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val mem = MemoryStream[(Long, java.lang.Long)]
    val q = GraphStream.quantileGateIngestFilter(
        mem.toDF().toDF("id", "v"), corpus, "v", 1, 2)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select("id").collect().foreach(r => got.add(r.getLong(0)))
        ()
      }
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((101L, 15L), (102L, 20L), (103L, null), (104L, 100L))
      q.processAllAvailable()
      val ids = got.toArray(Array.empty[java.lang.Long]).map(_.toLong).toSet
      assert(ids == Set(102L, 104L),
        s"at/above the reference threshold pass, below + null drop: $ids")
    } finally q.stop()
    intercept[IllegalArgumentException] {
      GraphStream.quantileGateIngestFilter(
        mem.toDF().toDF("id", "v"), corpus.where(lit(false)), "v", 1, 2)
    }
  }

  test("driftIngestMonitor: per-batch KL tables match the batch drift exactly") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val ref = Seq((1L, "a a a b"), (2L, "a b c")).toDF("doc_id", "text")
    val monitor = GraphStream.driftIngestMonitor(ref, "text", vocab = 10)
    def table(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // batch parity: monitor(batch) == vocabularyDrift(ref, batch)
    val b1 = Seq((10L, "a b b b z")).toDF("doc_id", "text")
    assert(table(monitor(b1)) == table(
      graft.pipeline.TextAnalysis.vocabularyDrift(ref, b1, "text", 10)),
      "monitor must equal the batch drift on the same rows")
    // streaming: each micro-batch yields its OWN table against the
    // SAME standing reference
    val seen = new java.util.concurrent.ConcurrentHashMap[Long,
      Map[String, (Long, Long, Long)]]()
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        if (!b.isEmpty) { seen.put(id, table(monitor(b))); () } else ()
      }
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((10L, "a b b b z"))
      q.processAllAvailable()
      mem.addData((11L, "c c c c"))
      q.processAllAvailable()
      val tables = seen.values()
      assert(tables.size == 2, s"two per-batch tables: ${seen.keySet()}")
      val expect2 = table(graft.pipeline.TextAnalysis.vocabularyDrift(
        ref, Seq((11L, "c c c c")).toDF("doc_id", "text"), "text", 10))
      assert(tables.contains(table(monitor(b1))) &&
        tables.contains(expect2),
        s"per-batch tables must match their batch-form drift: $seen")
    } finally q.stop()
  }

  test("marginMineIngest: foreachBatch margin mining matches the batch miner across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    // targets = axis vectors; sources = near-copies of distinct axes
    // plus a HUB equally close to every axis (the false positive the
    // margin criterion exists to reject)
    val tgt = Seq(
      (0L, Seq(1f, 0f, 0f, 0.01f)),
      (1L, Seq(0f, 1f, 0f, 0.02f)),
      (2L, Seq(0f, 0f, 1f, 0.03f))).toDF("vec_id", "embedding")
    val s100 = Seq(0.99f, 0.05f, 0f, 0.01f)
    val s101 = Seq(0.05f, 0.99f, 0f, 0.02f)
    val hub = Seq(0.577f, 0.577f, 0.577f, 0f)
    val s103 = Seq(0f, 0.05f, 0.99f, 0.03f)
    val srcRef = Seq((100L, s100), (101L, s101), (102L, hub))
      .toDF("vec_id", "embedding")
    val mine = GraphStream.marginMineIngest(srcRef, tgt, "vec_id",
      "embedding", k = 2, minMarginQ = 0L)
    val mined = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = mem.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        mine(b).select("src_id", "tgt_id").collect()
          .foreach(r => mined.add((r.getLong(0), r.getLong(1))))
        ()
      }
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((100L, s100), (102L, hub))
      q.processAllAvailable()
      // a later micro-batch mines against the SAME standing back-sums;
      // 103 is NOT in srcRef (a genuinely new streamed source)
      mem.addData((101L, s101), (103L, s103))
      q.processAllAvailable()
      val got = mined.toArray(Array.empty[(Long, Long)]).toSet
      // true pairs mine (incl. the unseen source), the hub's margin is
      // negative and it never surfaces
      assert(got == Set((100L, 0L), (101L, 1L), (103L, 2L)),
        s"true pairs mine, hub rejected: $got")
      // batch == stream parity: one direct call on the union batch
      val union = Seq((100L, s100), (102L, hub), (101L, s101),
        (103L, s103)).toDF("vec_id", "embedding")
      val batchGot = mine(union).select("src_id", "tgt_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batchGot == got, s"batch $batchGot vs stream $got")
      // and for the reference rows, parity with the BATCH miner's
      // margins: srcRef streamed through == marginMiningQuantized
      // thresholded (the back-sums pin makes them the same arithmetic)
      val full = graft.search.VectorOps.marginMiningQuantized(
          srcRef, tgt, "vec_id", "embedding", 2)
        .where(col("margin_q") >= 0L)
        .select("src_id", "tgt_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.filter(_._1 <= 102L) == full,
        s"stream (ref rows) ${got.filter(_._1 <= 102L)} vs batch API $full")
    } finally q.stop()
  }

  test("embedding ingest filter passes degenerate vectors through even when the corpus has one") {
    val s = spark
    import s.implicits._
    val dim = 16
    val rnd = new scala.util.Random(12)
    def vec() = Seq.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)
    // a poisoned corpus: one wrong-length vector (signs to 0L by the
    // kernel contract) amid normal rows
    val corpus = ((0 until 40).map(i => (i.toLong, vec())) :+
      (99L, Seq.fill(dim - 3)(0.5f))).toDF("vec_id", "embedding")
    // the stream carries three degenerate shapes (wrong length, NaN,
    // null) and one clean near-dup of a corpus row; only the near-dup
    // may drop — malformed rows are NOT "duplicates of signature 0"
    val dup = corpus.where(col("vec_id") === 0L)
      .select("embedding").collect()(0).getSeq[Float](0)
    val streamDf = Seq(
      (600L, Seq.fill(dim + 2)(0.1f)),
      (601L, Seq.fill(dim)(Float.NaN)),
      (602L, null: Seq[Float]),
      (603L, dup)).toDF("vec_id", "embedding")
    val kept = GraphStream.embeddingNearDupIngestFilter(
        streamDf, corpus, "embedding", dim)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(600L, 601L, 602L),
      s"degenerate rows pass, near-dup drops: $kept")
  }

  test("DSIR ingest filter keeps target-domain rows and drops off-domain and tokenless rows at a positive threshold") {
    val s = spark
    import s.implicits._
    val chemWords = Seq("acid", "base", "molecule", "reaction", "catalyst",
      "ion", "bond", "electron", "oxide", "solvent")
    val astroWords = Seq("galaxy", "orbit", "nebula", "quasar", "pulsar",
      "comet", "asteroid", "cluster", "parallax", "supernova")
    def sentence(ws: Seq[String], salt: Int): String =
      (0 until 12).map(i => ws((i * 7 + salt) % ws.size)).mkString(" ")
    val target = (0L until 8L).map(i => (i, sentence(chemWords, i.toInt)))
      .toDF("doc_id", "text")
    val raw = ((0L until 6L).map(i => (i, sentence(chemWords, i.toInt + 3))) ++
      (10L until 16L).map(i => (i, sentence(astroWords, i.toInt))))
      .toDF("doc_id", "text")
    val streamDf = Seq(
      (100L, sentence(chemWords, 5)),
      (101L, sentence(chemWords, 8)),
      (102L, sentence(astroWords, 2)),
      (103L, sentence(astroWords, 9)),
      (104L, "!!! ???")).toDF("doc_id", "text")
    val kept = GraphStream.dsirIngestFilter(streamDf, "text",
        raw, "text", target, "text", minLogw = 0.5, buckets = 128)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(100L, 101L),
      s"only target-domain rows pass the positive bar: $kept")
    // schema is preserved (the staged columns are dropped)
    assert(GraphStream.dsirIngestFilter(streamDf, "text", raw, "text",
      target, "text", minLogw = 0.5, buckets = 128).columns.toSeq ==
      Seq("doc_id", "text"))
    // an arbitrarily low bar passes everything — including the
    // tokenless row, which scores exactly 0.0
    val all = GraphStream.dsirIngestFilter(streamDf, "text",
        raw, "text", target, "text", minLogw = -1e9, buckets = 128)
      .count()
    assert(all == 5L, s"no-op bar must keep the whole stream: $all")
  }

  test("packIngest: open bins persist across micro-batches; id-ordered stream equals the batch pack") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    // two topics, doc token counts chosen so bins SPAN the batch
    // boundary: topic 0 fills 30+15 = 45 of 50 in batch 1, doc 4
    // (10 tokens) must OPEN A NEW BIN in batch 2 while topic 1's
    // 20-token doc 5 still fits its open bin (20+25=45)
    val b1 = Seq(GraphStream.PackDoc(0L, 0L, 30L),
      GraphStream.PackDoc(2L, 0L, 15L), GraphStream.PackDoc(1L, 1L, 25L))
    val b2 = Seq(GraphStream.PackDoc(4L, 0L, 10L),
      GraphStream.PackDoc(5L, 1L, 20L), GraphStream.PackDoc(6L, 1L, 60L))
    val mem = MemoryStream[GraphStream.PackDoc]
    val q = GraphStream.packIngest(mem.toDS(), window = 50L)
      .writeStream.format("memory").queryName("packed")
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("packed").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // batch parity: the same docs in id order through the BATCH packer
    // (topic as the shard key)
    val batch = graft.pipeline.Packing.packByCountsKeyed(
        (b1 ++ b2).map(d => (d.doc_id, d.bucket, d.n_tok))
          .toDF("doc_id", "topic", "ntok"),
        "doc_id", "ntok", "topic", window = 50)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got == batch,
      s"id-ordered stream must equal the batch pack: $got vs $batch")
    // the cross-batch bin semantics the per-batch form cannot give:
    // doc 4 opens topic 0's bin 2 (45 + 10 > 50), doc 5 JOINS topic
    // 1's still-open bin 1, the 60-token doc 6 caps at the window
    assert(got(4L) == ((0L, 2L, 10L)))
    assert(got(5L) == ((1L, 1L, 20L)))
    assert(got(6L) == ((1L, 2L, 50L)))
  }

  test("sessionize counts events per user via flatMapGroupsWithState") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val mem = MemoryStream[GraphStream.SessionEvent]
    val q = GraphStream.sessionize(mem.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Update()).start()
    try {
      val ts = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
      mem.addData(GraphStream.SessionEvent(7L, ts, "click"),
        GraphStream.SessionEvent(7L, ts, "view"),
        GraphStream.SessionEvent(8L, ts, "click"))
      q.processAllAvailable()
      mem.addData(GraphStream.SessionEvent(7L, ts, "end"))
      q.processAllAvailable()
      val out = s.table("sessions").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      assert(out.contains((7L, 2L, false)))
      assert(out.contains((8L, 1L, false)))
      assert(out.contains((7L, 2L, true))) // closed by the end event
    } finally q.stop()
  }

  test("streaming node ingest writes the per-label parquet layout") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val mem = MemoryStream[(Long, String)]
    // data BEFORE start: AvailableNow snapshots available offsets at
    // query start — adding afterwards is a race the trigger may miss
    mem.addData((1L, "a"), (2L, "b"), (3L, "c"))
    val q = GraphStream.nodeIngest(mem.toDF().toDF("uid", "name"), "User", "uid", root,
      buckets = 4).trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val written = s.read.parquet(s"$root/nodes/User")
    assert(written.count() == 3)
    assert(written.columns.toSet == Set("uid", "name", "_id", "_label", "_bucket"))
    assert(written.select("_label").distinct().collect()(0).getString(0) == "User")
  }

  test("streaming edge ingest writes the src-bucketed edge layout") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-stream-e").toString
    val mem = MemoryStream[(Long, Long, Long, Double)]
    // data BEFORE start — see the node-ingest test's race note
    mem.addData((1L, 10L, 20L, 0.5), (2L, 11L, 21L, 0.9))
    val q = GraphStream.edgeIngest(mem.toDF().toDF("eid", "from", "to", "w"),
      "KNOWS", "eid", "from", "to", root, buckets = 4)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val written = s.read.parquet(s"$root/edges/KNOWS")
    assert(written.count() == 2)
    assert(Set("_id", "_label", "_src", "_dst", "_bucket").subsetOf(written.columns.toSet))
  }

  test("a streamed-in document becomes text-searchable after the sink commit, postings refresh incrementally") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ast._
    import graft.model.GraphWal
    val s = spark
    import s.implicits._
    implicit val sqlc = s.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("gstream-ix").toString
    GraphWal.checkpoint(TestBase.parityGraph()
      .withIndexes(Set(IndexSpec.NodeText("ParityUser", "bio", None))), dir)
    val mem = MemoryStream[(Long, String)]
    def runOnce(): Unit = {
      val q = graft.streaming.GraphStream.nodeIngest(
        mem.toDF().toDF("uid", "bio"), "ParityUser", "uid", s"$dir/stream",
        buckets = 4).trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }
    mem.addData((70L, "zanzibar expedition notes")); runOnce()
    GraphWal.attachStream(dir, "nodes", "ParityUser", s"$dir/stream/nodes/ParityUser")

    val router = new graft.server.Router(spark, dir, numReaders = 1)
    val search = Batch(Seq(BatchEntry.Query(NamedQuery(Some("hits"), Traversal(Vector(
      Step.TextSearchNodes("ParityUser", "bio", None,
        PropertyInput.Value(PropertyValue.VString("zanzibar")),
        StreamBound.Literal(5)),
      Step.Id))))), returns = Seq("hits"))
    router.registerQuery("zsearch", search)
    val noHdr: String => Option[String] = _ => None
    // first search: builds the postings artifact (sees the pre-attached doc)
    assert(router.route("zsearch", "{}", noHdr).body.contains("70"))
    val buildsAfterFirst = graft.search.IndexCache.textBuilds.get()

    // the sink commits another matching doc; no WAL write, no checkpoint
    mem.addData((71L, "more zanzibar material")); runOnce()
    val resp = router.route("zsearch", "{}", noHdr).body
    assert(resp.contains("70") && resp.contains("71"),
      s"streamed doc must be searchable after the sink commit: $resp")
    // and the artifact refreshed INCREMENTALLY — no full posting rebuild
    assert(graft.search.IndexCache.textBuilds.get() == buildsAfterFirst,
      "expected the append merge path, not a rebuild")
  }

  test("tenant-partitioned postings refresh incrementally on streamed appends") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ast._
    import graft.model.GraphWal
    val s = spark
    import s.implicits._
    implicit val sqlc = s.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("gstream-tix").toString
    GraphWal.checkpoint(TestBase.parityGraph()
      .withIndexes(Set(IndexSpec.NodeText("ParityUser", "bio", Some("tenantId")))), dir)
    val mem = MemoryStream[(Long, String, String)]
    def runOnce(): Unit = {
      val q = graft.streaming.GraphStream.nodeIngest(
        mem.toDF().toDF("uid", "bio", "tenantId"), "ParityUser", "uid",
        s"$dir/stream", buckets = 4)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }
    mem.addData((70L, "zanzibar expedition notes", "t1")); runOnce()
    GraphWal.attachStream(dir, "nodes", "ParityUser", s"$dir/stream/nodes/ParityUser")

    val router = new graft.server.Router(spark, dir, numReaders = 1)
    val search = Batch(Seq(BatchEntry.Query(NamedQuery(Some("hits"), Traversal(Vector(
      Step.TextSearchNodes("ParityUser", "bio",
        Some(PropertyInput.Value(PropertyValue.VString("t1"))),
        PropertyInput.Value(PropertyValue.VString("zanzibar")),
        StreamBound.Literal(5)),
      Step.Id))))), returns = Seq("hits"))
    router.registerQuery("ztsearch", search)
    val noHdr: String => Option[String] = _ => None
    assert(router.route("ztsearch", "{}", noHdr).body.contains("70"))
    val buildsAfterFirst = graft.search.IndexCache.textBuilds.get()

    // appended docs for BOTH tenants; the t1 search must see only the
    // t1 addition, and the per-tenant artifact must merge, not rebuild
    mem.addData((71L, "more zanzibar material", "t1"),
      (72L, "zanzibar from the other tenant", "t2")); runOnce()
    val resp = router.route("ztsearch", "{}", noHdr).body
    assert(resp.contains("70") && resp.contains("71"),
      s"tenant t1 must see both its docs after the sink commit: $resp")
    assert(!resp.contains("72"), s"tenant filter must hold: $resp")
    assert(graft.search.IndexCache.textBuilds.get() == buildsAfterFirst,
      "expected the tenant-partitioned append merge path, not a rebuild")
  }

  test("GraphBuilder projects raw tables into a traversable graph") {
    val s = spark
    import s.implicits._
    val users = Seq((1L, "ann"), (2L, "bo")).toDF("uid", "uname")
    val items = Seq((10L, "hammer")).toDF("iid", "iname")
    val orders = Seq((100L, 1L, 10L, 3)).toDF("oid", "uid", "iid", "qty")
    val store = graft.model.GraphBuilder(s)
      .nodes("User", users, col("uid"))
      .nodes("Item", items, col("iid") + 1000)
      .edges("BOUGHT", orders, col("oid") + 5000,
        "User" -> col("uid"), "Item" -> (col("iid") + 1000), props = Seq("qty"))
      .build()
    val c = new graft.exec.Compiler(store)
    import graft.dsl.Dsl._
    val bought = c.run(g().nWithLabelWhere("User", eq_("uname", "ann"))
      .out("BOUGHT").values("iname").t)
    assert(rows(bought) == Seq(Seq("hammer")))
    val qty = c.run(g().nWithLabel("User").outE("BOUGHT").values("qty").t)
    assert(rows(qty) == Seq(Seq(3)))
  }

  test("registerViews exposes the graph to Spark SQL") {
    TestBase.parityGraph().registerViews()
    val r = spark.sql(
      """SELECT u2.name FROM nodes_ParityUser u1
        |JOIN edges_FOLLOWS e ON u1._id = e._src
        |JOIN nodes_ParityUser u2 ON e._dst = u2._id
        |WHERE u1.name = 'Alice'""".stripMargin).collect()
    assert(r.map(_.getString(0)).toSeq == Seq("Bob"))
  }

  test("graph persistence round-trips tables, meta and indexes") {
    val root = java.nio.file.Files.createTempDirectory("graft-persist").toString
    val store0 = TestBase.parityGraph()
      .withIndexes(Set(graft.ast.IndexSpec.NodeVector("ParityUser", "embedding", Some("tenantId"))))
    GraphPersistence.save(store0, root, edgeShufflePartitions = 2)
    val loaded = GraphPersistence.load(spark, root)
    assert(loaded.nodeTables.keySet == Set("ParityUser"))
    assert(loaded.edgeTables.keySet == Set("FOLLOWS"))
    assert(loaded.edgeMeta("FOLLOWS").dstLabels == Set("ParityUser"))
    assert(loaded.indexes.size == 1)
    val c = new graft.exec.Compiler(loaded)
    import graft.dsl.Dsl._
    assert(ids(c.run(g().n(1L).out("FOLLOWS").id().t)) == Seq(2L))
  }

  test("streamRangeJoin attributes clicks to purchase windows across batches") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val clicks = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val purchases = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val joined = GraphStream.streamRangeJoin(
      clicks.toDF().toDF("user_id", "ts", "click_id"),
      purchases.toDF().toDF("user_id", "ts", "purchase_id"),
      "user_id", "ts", beforeSec = 600, afterSec = 60, watermark = "5 minutes")
      .select("l_click_id", "r_purchase_id")
    val q = joined.writeStream.format("memory").queryName("attr")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: clicks land first (state buffers them)
      clicks.addData((1L, t(0), 100L), (1L, t(8), 101L), (2L, t(1), 200L))
      q.processAllAvailable()
      // batch 2: purchase at 10:09 for user 1 -> window [09:59, 10:10]
      // captures both clicks; user 2's purchase at 10:30 captures none
      purchases.addData((1L, t(9), 900L), (2L, t(30), 901L))
      q.processAllAvailable()
      val got = s.table("attr").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((100L, 900L), (101L, 900L)), s"got $got")
    } finally q.stop()
  }

  test("streaming == batch parity: dedup survivors and heavy-hitter counts") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    // --- exact dedup: the same corpus streamed in 3 batches must keep
    // exactly the batch keep-set (first occurrence per digest)
    val corpus = Seq(
      (1L, "alpha beta"), (2L, "gamma delta"), (3L, "alpha beta"),
      (4L, "epsilon"), (5L, "gamma delta"), (6L, "zeta"))
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val q = GraphStream.streamingDedup(
      mem.toDF().toDF("ts", "doc_id", "text"), "text", "ts", "1 hour")
      .writeStream.format("memory").queryName("paritydedup")
      .outputMode(OutputMode.Append()).start()
    try {
      corpus.grouped(2).zipWithIndex.foreach { case (b, i) =>
        mem.addData(b.map { case (id, tx) => (t(i), id, tx) }: _*)
        q.processAllAvailable()
      }
      val streamed = s.table("paritydedup").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      val batch = graft.pipeline.Dedup.exact(
        corpus.toDF("doc_id", "text"), "text", "doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(streamed == batch, s"streamed $streamed vs batch $batch")
    } finally q.stop()

    // --- heavy hitters at k >= vocabulary: MG never compresses, so
    // the streamed shard estimates must EQUAL the batch exact counts
    val words = Seq("a", "a", "a", "b", "b", "c", "d", "d", "d", "d")
    val hh = MemoryStream[String]
    val q2 = GraphStream.streamingHeavyHitters(hh.toDS(), k = 16, buckets = 2)
      .writeStream.format("memory").queryName("parityhh")
      .outputMode(OutputMode.Update()).start()
    try {
      words.grouped(4).foreach { b => hh.addData(b: _*); q2.processAllAvailable() }
      // the consumer contract: latest summary (max seq) per shard,
      // then union the shards
      val rows = s.table("parityhh").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getLong(3)))
      val latestSeq = rows.groupBy(_._1).view.mapValues(_.map(_._2).max)
      val streamed = rows
        .filter { case (sh, seq, _, _) => seq == latestSeq(sh) }
        .map { case (_, _, item, est) => item -> est }.toMap
      val exact = words.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
      assert(streamed == exact, s"streamed $streamed vs exact $exact")
    } finally q2.stop()
  }

  test("streamingHeavyHitters folds MG state across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val mem = MemoryStream[String]
    val q = GraphStream.streamingHeavyHitters(mem.toDS(), k = 4, buckets = 2)
      .writeStream.format("memory").queryName("hh")
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData(Seq.fill(10)("hot") ++ Seq("a", "b"): _*)
      q.processAllAvailable()
      // second batch: state carries — hot's estimate must keep growing
      mem.addData(Seq.fill(5)("hot") ++ Seq("c", "d", "e", "f", "g"): _*)
      q.processAllAvailable()
      val rows = s.table("hh").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getString(2),
          r.getLong(3), r.getLong(4)))
      // contract: latest summary per shard = rows at that shard's max seq
      val latestSeq = rows.groupBy(_._1).view.mapValues(_.map(_._2).max)
      val latest = rows.filter { case (sh, seq, _, _, _) => seq == latestSeq(sh) }
      val latestHot = latest.filter(_._3 == "hot").map(_._4).max
      // 15 true occurrences; MG undercount bounded by the shard's dec
      val dec = latest.map(_._5).max
      assert(latestHot >= 15L - dec && latestHot <= 15L,
        s"hot est $latestHot dec $dec rows ${rows.toSeq}")
      // per-shard latest summary stays bounded at k counters
      latest.groupBy(_._1).foreach { case (sh, xs) =>
        assert(xs.length <= 4, s"shard $sh state overflow: ${xs.toSeq}")
      }
      // seq increments once per fold: two micro-batches touched each
      // shard at most twice
      assert(latestSeq.values.forall(_ <= 2), latestSeq.toMap.toString)
    } finally q.stop()
  }
}
