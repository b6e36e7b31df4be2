package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Bpe

/** Merge-table BPE: training argmax determinism, greedy left-to-right
  * application semantics of the delimited-replace encoding, and the
  * keep-every-doc contract of the count report.
  */
class BpeSpec extends GraftSuite {

  test("trainMerges learns the expected merges on a hand-checked corpus") {
    val s = spark
    import s.implicits._
    // word freqs: aaa:2, ab:3, abc:2
    val docs = Seq("aaa aaa ab ab ab", "abc abc").toDF("text")
    val merges = Bpe.trainMerges(docs, "text", k = 3)
    // round 1: (a,a)=4 (two pairs per "aaa"), (a,b)=3+2=5, (b,c)=2
    //   -> merge "ab"
    // round 2: aaa->[a,a,a]: (a,a)=4; ab->[ab]; abc->[ab,c]: (ab,c)=2
    //   -> merge "aa"
    // round 3: aaa->[aa,a]: (aa,a)=2; (ab,c)=2 -> tie on count;
    //   ("aa","a") < ("ab","c") lexicographically -> merge "aaa"
    assert(merges == Seq((1, "a", "b"), (2, "a", "a"), (3, "aa", "a")),
      s"got $merges")
  }

  test("applyMerges is greedy left-to-right (aaaa -> aa aa, not aa a a)") {
    val s = spark
    import s.implicits._
    val df = Seq("aaaa", "aaa", "a").toDF("w")
      .select(col("w"), Bpe.applyMerges(Bpe.initState(col("w")),
        Seq(("a", "a"))).as("st"))
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("aaaa") == "_aa__aa_")
    assert(got("aaa") == "_aa__a_")
    assert(got("a") == "_a_")
  }

  test("tokenCountReport keeps wordless docs at 0 and counts merged tokens") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "aa ab"), (2L, "!!!"), (3L, "")).toDF("doc_id", "text")
    // merge (a,a): "aa"->1 token, "ab"->2 tokens
    val got = Bpe.tokenCountReport(docs, "doc_id", "text", Seq(("a", "a")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 0L, 3L -> 0L), s"got $got")
  }

  test("encodeTokens segments words into subwords; concat reconstructs, size matches count") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "aaaa ab cab"), (2L, "!!!"), (3L, "")).toDF("doc_id", "text")
    val merges = Seq(("a", "a"), ("a", "b"))
    val enc = docs.select(col("doc_id"),
      Bpe.encodeTokens(col("text"), merges).as("t")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // aaaa -> [aa, aa]; ab -> [ab]; cab -> [c, ab] (greedy after aa)
    assert(enc(1L) == Seq("aa", "aa", "ab", "c", "ab"), s"got ${enc(1L)}")
    assert(enc(2L).isEmpty && enc(3L).isEmpty)
    // invariants vs the count report on a larger corpus: same length,
    // and the concatenated subwords reproduce the word stream
    val big = Seq((10L, "the cat and the hat sat"), (11L, "a ab abc abcd"))
      .toDF("doc_id", "text")
    val m2 = Bpe.trainMerges(big, "text", k = 4).map { case (_, l, r) => (l, r) }
    val counts = Bpe.tokenCountReport(big, "doc_id", "text", m2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    big.select(col("doc_id"), col("text"),
      Bpe.encodeTokens(col("text"), m2).as("t")).collect().foreach { r =>
      val toks = r.getSeq[String](2)
      assert(toks.size.toLong == counts(r.getLong(0)))
      assert(toks.mkString == r.getString(1).toLowerCase
        .replaceAll("[^a-z0-9]+", ""))
    }
  }

  test("merge table round-trips through the parquet artifact") {
    val s = spark
    import s.implicits._
    val docs = Seq("aaa aaa ab ab ab", "abc abc").toDF("text")
    val trained = Bpe.trainMerges(docs, "text", k = 3)
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    Bpe.saveMerges(s, s"$dir/merges", trained)
    assert(Bpe.loadMerges(s, s"$dir/merges") == trained)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("merge table shape + a later merge can consume an earlier one") {
    val s = spark
    import s.implicits._
    val docs = Seq("join join join joint").toDF("text")
    val merges = Bpe.trainMerges(docs, "text", k = 4)
    assert(merges.size == 4)
    val vocab = merges.map { case (_, l, r) => l + r }
    // with one dominant word the chain must build it up cumulatively
    assert(vocab.last.length > 2, s"expected multi-char merge, got $vocab")
  }

  test("memoized count paths agree with the pure-expression replace chains") {
    val s = spark
    import s.implicits._
    // repeats (the memo hit path), unicode, punctuation, VT, empty,
    // null, and merge-consuming chains
    val docs = Seq(
      (1L, "the cat and the hat sat on the mat the cat came back"),
      (2L, "naïve café naïve café naïve"),
      (3L, "a ab abc abcd abcde!  42\ttimes again"),
      (4L, ""), (5L, null.asInstanceOf[String]),
      (6L, "aaaa aaa aa a aaaa aaaa"))
      .toDF("doc_id", "text")
    val wm = Bpe.trainMerges(docs, "text", k = 6).map { case (_, l, r) => (l, r) }
    val bm = Bpe.trainByteMerges(docs, "text", k = 6).map { case (_, l, r) => (l, r) }
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(Bpe.tokenCountReport(docs, "doc_id", "text", wm)) ==
      m(Bpe.tokenCountReportExpr(docs, "doc_id", "text", wm)))
    assert(m(Bpe.byteTokenCountReport(docs, "doc_id", "text", bm)) ==
      m(Bpe.byteTokenCountReportExpr(docs, "doc_id", "text", bm)))
    // and with zero merges the byte count still bills every byte
    assert(m(Bpe.byteTokenCountReport(docs, "doc_id", "text", Nil)) ==
      m(Bpe.byteTokenCountReportExpr(docs, "doc_id", "text", Nil)))
  }

  test("byte-level pretokenizer is lossless and bills every byte") {
    val s = spark
    import s.implicits._
    // mixed case, punctuation, contraction, multi-space, unicode, and
    // a vertical tab (U+000B) — the one char where Java's \s and
    // RE2's \s disagree; the explicit whitespace class must bill it
    // as whitespace in both engines
    val texts = Seq("Hello World!  It's naïve... 42\ttimes\n", "", "   ",
      "A.B,C;D", "héllo wörld", "a\u000Bb c")
    val df = texts.toDF("text")
    // losslessness: concatenating the pretokens reconstructs the text
    val rejoined = df.select(
      concat_ws("", Bpe.bytePretokens(col("text"))).as("r"), col("text"))
      .collect()
    rejoined.foreach(r => assert(r.getString(0) == r.getString(1),
      s"pretokens lost bytes: '${r.getString(1)}' -> '${r.getString(0)}'"))
    // zero merges: the per-doc count equals the UTF-8 byte length
    // (every byte is a token) — case/whitespace/punctuation included
    val counts = Bpe.byteTokenCountReport(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"), "doc_id", "text", Nil)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val bytes = t.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
      assert(counts(i.toLong) == bytes,
        s"doc $i: counted ${counts(i.toLong)} vs $bytes bytes")
    }
  }

  test("trainByteMerges learns hex-symbol merges; counts shrink accordingly") {
    val s = spark
    import s.implicits._
    // ' the' (with its leading space) is the dominant pretoken: byte
    // merges must build it up; after k merges the billed count drops
    val docs = Seq("on the mat the cat the hat the bat").toDF("text")
    val merges = Bpe.trainByteMerges(docs, "text", k = 6)
    assert(merges.size == 6)
    // all symbols are hex strings (even length, [0-9A-F])
    merges.foreach { case (_, l, r) =>
      assert((l + r).matches("[0-9A-F]+") && (l + r).length % 2 == 0,
        s"non-hex merge symbol: $l + $r")
    }
    val ids = Seq((1L, "the cat the")).toDF("doc_id", "text")
    val c0 = Bpe.byteTokenCountReport(ids, "doc_id", "text", Nil)
      .head().getLong(1)
    val ck = Bpe.byteTokenCountReport(ids, "doc_id", "text",
      merges.map { case (_, l, r) => (l, r) }).head().getLong(1)
    assert(c0 == 11L, s"11 bytes expected, got $c0") // 'the cat the'
    assert(ck < c0, s"merges must reduce the billed count: $ck vs $c0")
    // ' the' = hex 20746865 must be buildable from the learned vocab:
    // the final merged symbol set contains a run covering it
    val built = merges.map { case (_, l, r) => l + r }
    assert(built.exists(sym => "20746865".contains(sym) && sym.length >= 4),
      s"expected a multi-byte ' the' fragment in $built")
  }

  test("word-type memo is an access-ordered LRU over merge chains") {
    // 20 distinct chains through a 16-slot LRU: the newest survives,
    // the oldest is evicted (a fresh map comes back for it)
    val fps = (0 until 20).map(i => s"_lru_test_chain_$i")
    val maps = fps.map(Bpe.memoFor)
    assert(Bpe.memoFor(fps(19)) eq maps(19), "newest chain must stay resident")
    assert(Bpe.memoFor(fps.head) ne maps.head, "oldest chain must evict")
    // ACCESS order, not insert order: touch an old-but-resident chain,
    // then add enough new chains to evict everything untouched — the
    // touched one must survive (this is what keeps the live serving
    // chain memoized while a retrain loop churns new fingerprints)
    val touched = s"_lru_touch_chain"
    val tm = Bpe.memoFor(touched)
    (0 until 15).foreach(i => Bpe.memoFor(s"_lru_fill_a_$i"))
    assert(Bpe.memoFor(touched) eq tm) // touch: moves to MRU
    (0 until 15).foreach(i => Bpe.memoFor(s"_lru_fill_b_$i"))
    assert(Bpe.memoFor(touched) eq tm,
      "recently-used chain must survive 15 newer inserts")
  }
}
