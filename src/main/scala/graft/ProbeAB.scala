package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.search.VectorOps
import graft.pipeline.{Dedup, GraphAlgos, Multimodal}

/** Intra-JVM A/B measurement harness: times an old formulation against
  * its replacement INTERLEAVED in one SparkSession (GC'd noop-sink
  * reps, medians), so ambient drift hits both sides equally. This is
  * the only comparison that works on this host (bursty CPU steal makes
  * cross-JVM before/after timings unusable — same-binary readings
  * swung 7.5→93.8 s; see OPTIMIZATION_r16.md "Measurement
  * environment"). The old formulations below are kept verbatim as the
  * measured baselines of the r16 rewrites; edit the pair list when
  * probing a new change.
  */
object ProbeAB {
  def time(f: => DataFrame): Double = {
    System.gc()
    val t0 = System.nanoTime()
    f.write.mode("overwrite").format("noop").save()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark

    def emb = s.read.parquet(s"$d/embeddings.parquet")

    def gateOld(exact: DataFrame, approx: DataFrame, keys: Seq[String]): DataFrame = {
      val nInter = exact.join(approx, keys, "left_semi")
        .agg(count(lit(1)).as("_ni"))
      exact.agg(count(lit(1)).as("n_exact")).crossJoin(nInter)
        .select(col("n_exact"),
          (col("_ni") * 100L >= col("n_exact") * 85L).cast("double")
            .as("recall_gate"))
    }
    def gateNew(exact: DataFrame, approx: DataFrame, keys: Seq[String]): DataFrame = {
      val marked = approx.select(keys.map(col) :+ lit(1).as("_hit"): _*)
      exact.join(marked, keys, "left")
        .agg(count(lit(1)).as("_total"), count(col("_hit")).as("_hits"))
        .select(col("_total").as("n_exact"),
          (col("_hits") * 100L >= col("_total") * 85L).cast("double")
            .as("recall_gate"))
    }

    def minePq(old: Boolean): DataFrame = {
      val e = emb
      val srcE = e.where(col("vec_id") % 2 === 0)
      val tgtE = e.where(col("vec_id") % 2 === 1)
      val exact = VectorOps.marginMiningQuantized(srcE, tgtE,
        "vec_id", "embedding", k = 4)
      val pq = VectorOps.marginMiningPq(srcE, tgtE,
        "vec_id", "embedding", k = 4, cand = 16)
      if (old) gateOld(exact, pq, Seq("src_id", "tgt_id"))
      else gateNew(exact, pq, Seq("src_id", "tgt_id"))
    }
    def mineIvf(old: Boolean): DataFrame = {
      val e = emb
      val srcE = e.where(col("vec_id") % 2 === 0)
      val tgtE = e.where(col("vec_id") % 2 === 1)
      val exact = VectorOps.marginMiningQuantized(srcE, tgtE,
        "vec_id", "embedding", k = 4)
      val ivf = VectorOps.marginMiningIvf(srcE, tgtE,
        "vec_id", "embedding", k = 4, nlist = 16, nprobe = 12)
      if (old) gateOld(exact, ivf, Seq("src_id", "tgt_id"))
      else gateNew(exact, ivf, Seq("src_id", "tgt_id"))
    }

    def docsDf = s.read.parquet(s"$d/documents.parquet")

    // --- r16 second-session probes ---
    // triangle corner count: 3-way unionAll of the closure join (old)
    // vs one explode pass (new); the co-occurrence projection is the
    // shared cached input, so the probe isolates the tail
    def triEdges = GraphAlgos.coOccurrenceCached(
      s.read.parquet(s"$d/lineitem.parquet")
        .where(col("l_partkey") % 20 === 0)
        .select(col("l_partkey").as("p"), col("l_orderkey").as("o")),
      "p", "o")
    def triOld: DataFrame = {
      val edges = triEdges
      val deg = edges.select(col("id_a").as("node_id"))
        .unionAll(edges.select(col("id_b").as("node_id")))
        .groupBy("node_id").agg(count(lit(1)).as("degree"))
      val withDeg = edges
        .join(deg.select(col("node_id").as("id_a"), col("degree").as("_da")), "id_a")
        .join(deg.select(col("node_id").as("id_b"), col("degree").as("_db")), "id_b")
      val lowFirst = col("_da") < col("_db") ||
        (col("_da") === col("_db") && col("id_a") < col("id_b"))
      val oriented = withDeg.select(
        when(lowFirst, col("id_a")).otherwise(col("id_b")).as("_lo"),
        when(lowFirst, struct(col("_db").as("d"), col("id_b").as("i")))
          .otherwise(struct(col("_da").as("d"), col("id_a").as("i"))).as("_hiK"))
        .select(col("_lo"), col("_hiK"), col("_hiK").getField("i").as("_hi"))
      val w1 = oriented.select(col("_lo"), col("_hiK").as("_vK"), col("_hi").as("_v"))
      val w2 = oriented.select(col("_lo"), col("_hiK").as("_wK"), col("_hi").as("_w"))
      val wedges = w1.join(w2, Seq("_lo")).where(col("_vK") < col("_wK"))
        .select(col("_lo"), col("_v"), col("_w"))
      val closing = oriented.select(col("_lo").as("_v"), col("_hi").as("_w"))
      val tris = wedges.join(closing, Seq("_v", "_w"))
      tris.select(col("_lo").as("node_id"))
        .unionAll(tris.select(col("_v").as("node_id")))
        .unionAll(tris.select(col("_w").as("node_id")))
        .groupBy("node_id").agg(count(lit(1)).as("triangles"))
    }
    def triNew: DataFrame = GraphAlgos.triangleCounts(triEdges)

    // banded Hamming cross (multi-frame video): legacy emit-all
    // generator + survivor `.distinct()` (old) vs first-agreeing-band
    // emission, no dedup shuffle (new); frame hashes ride the shared
    // media cache on both sides
    def mfSides: (DataFrame, DataFrame) = {
      val base = docsDf.select("doc_id")
      val batch = Multimodal.mediaFromIdsCached(
        base.select((col("doc_id") + 9000).as("doc_id")), "doc_id",
        only = Some("video"))
      val corpus = Multimodal.mediaFromIdsCached(base, "doc_id",
        only = Some("video"))
      def fh(df: DataFrame) = Multimodal.videoFrameHashes63(df, 8).select(
        (col("media_id") * 64 + col("frame_slot")).as("_fid"),
        col("fhash").as("_h"))
      (fh(batch), fh(corpus))
    }
    def oldCrossPairs(hashesA: DataFrame, hashesB: DataFrame): DataFrame = {
      val (bands, bandBits, maxHam, cap) = (4, 16, 3, Dedup.MaxClusterBlock)
      val mask = (1L << bandBits) - 1
      def banded(hs: DataFrame) = hs.select(
        struct(col("_fid").as("i"), col("_h").as("s")).as("_e"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("bi"),
            shiftright(col("_h"), b * bandBits).bitwiseAND(mask).as("bk"))
        }: _*)).as("_b"))
        .select(col("_e"), col("_b.bi").as("bi"), col("_b.bk").as("bk"))
      val bA = banded(hashesA); val bB = banded(hashesB)
      val meta = bA.groupBy(col("bi"), col("bk")).agg(count(lit(1)).as("_cna"))
        .join(bB.groupBy(col("bi"), col("bk")).agg(count(lit(1)).as("_cnb")),
          Seq("bi", "bk"))
        .select(col("bi"), col("bk"),
          ceil(col("_cna") / lit(cap.toDouble)).cast("int").as("_na"),
          ceil(col("_cnb") / lit(cap.toDouble)).cast("int").as("_nb"))
      val aBuckets = bA.join(meta, Seq("bi", "bk"))
        .withColumn("_p", pmod(hash(col("_e")), col("_na")))
        .groupBy(col("bi"), col("bk"), col("_p"))
        .agg(collect_list(col("_e")).as("_aa"))
      val bBuckets = bB.join(meta, Seq("bi", "bk"))
        .withColumn("_q", pmod(hash(col("_e")), col("_nb")))
        .groupBy(col("bi"), col("bk"), col("_q"))
        .agg(collect_list(col("_e")).as("_ab"))
      aBuckets.join(bBuckets, Seq("bi", "bk"))
        .select(graft.functions.HammingBlockPairs(col("_aa"), col("_ab"),
          lit(false), lit(true), lit(maxHam)))
        .select("id_a", "id_b", "hamming").distinct()
    }
    def crossMfOld: DataFrame = {
      val (hashesA, hashesB) = mfSides
      oldCrossPairs(hashesA, hashesB)
        .select(shiftright(col("id_a"), 6).as("id_a"),
          shiftright(col("id_b"), 6).as("id_b"))
        .groupBy("id_a", "id_b")
        .agg(count(lit(1)).as("n_matched"))
        .where(col("n_matched") >= 2)
    }
    def crossMfNew: DataFrame = {
      val base = docsDf.select("doc_id")
      Multimodal.videoMultiFrameCrossPairs(
        Multimodal.mediaFromIdsCached(
          base.select((col("doc_id") + 9000).as("doc_id")), "doc_id",
          only = Some("video")),
        Multimodal.mediaFromIdsCached(base, "doc_id", only = Some("video")),
        maxHam = 3, k = 8, minMatches = 2)
    }

    // image near-dup: legacy emit-all + distinct (old) vs first-band
    // emission (new) — the bench read 1.44 -> 3.41 on a loaded box;
    // this probe decides load vs regression
    def imgHashes = {
      val base = docsDf.select("doc_id")
      Multimodal.aHash63(Multimodal.mediaFromIdsCached(base, "doc_id",
        only = Some("image"))).where(col("ahash").isNotNull)
    }
    def bandedSelfOld(hs0: DataFrame, idC: String, hC: String): DataFrame = {
      val (bands, bandBits, maxHam, cap) = (4, 16, 3, Dedup.MaxClusterBlock)
      val mask = (1L << bandBits) - 1
      val banded = hs0.select(
        struct(col(idC).as("i"), col(hC).as("s")).as("_e"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("bi"),
            shiftright(col(hC), b * bandBits).bitwiseAND(mask).as("bk"))
        }: _*)).as("_b"))
        .select(col("_e"), col("_b.bi").as("bi"), col("_b.bk").as("bk"))
      val counts = banded.groupBy(col("bi"), col("bk"))
        .agg(count(lit(1)).as("_n")).where(col("_n") > 1)
      val withN = banded.join(counts, Seq("bi", "bk"))
      val gen = (a: Column, b: Column, self: Column) =>
        graft.functions.HammingBlockPairs(a, b, self, lit(false), lit(maxHam))
      val small = withN.where(col("_n") <= cap)
        .groupBy(col("bi"), col("bk"))
        .agg(sort_array(collect_list(col("_e"))).as("_arr"))
        .select(gen(col("_arr"), col("_arr"), lit(true)))
      val buckets = withN.where(col("_n") > cap)
        .withColumn("_nb", ceil(col("_n") / lit(cap.toDouble)).cast("int"))
        .withColumn("_bkt", pmod(hash(col("_e")), col("_nb")))
        .groupBy(col("bi"), col("bk"), col("_bkt"))
        .agg(sort_array(collect_list(col("_e"))).as("_arr"))
      val big = buckets.select(col("bi"), col("bk"),
          col("_bkt").as("_p"), col("_arr").as("_aa"))
        .join(buckets.select(col("bi"), col("bk"),
          col("_bkt").as("_q"), col("_arr").as("_ab")), Seq("bi", "bk"))
        .where(col("_p") <= col("_q"))
        .select(gen(col("_aa"), col("_ab"), col("_p") === col("_q")))
      small.unionByName(big)
        .where(col("id_a") =!= col("id_b"))
        .select("id_a", "id_b", "hamming").distinct()
    }
    def imgOld: DataFrame = bandedSelfOld(imgHashes, "media_id", "ahash")
    def imgNew: DataFrame = Multimodal.imageNearDupPairs(
      Multimodal.mediaFromIdsCached(docsDf.select("doc_id"), "doc_id",
        only = Some("image")), maxHam = 3)

    // star-contraction CC: the old groupBy+join round body (inline,
    // verbatim) vs the window-based round body now in dupClustersStar;
    // driven through the q_doc_dup_clusters_star pair generator
    def ccPairs: DataFrame = {
      val ids = docsDf.select(col("doc_id"))
      ids.select(col("doc_id").as("id_a"), (col("doc_id") + 1).as("id_b"))
        .where(col("id_a") % 40 =!= 39)
        .join(ids.select(col("doc_id").as("id_b")), Seq("id_b"), "left_semi")
    }
    def ccOld: DataFrame = {
      val pairs0 = ccPairs
      val store = new graft.pipeline.Scratch.FrameStore(s)
      val nodes = store.keep(pairs0.select(col("id_a").as("id"))
        .union(pairs0.select(col("id_b").as("id"))).distinct())
      var edges = store.keep(pairs0
        .select(greatest(col("id_a"), col("id_b")).as("u"),
          least(col("id_a"), col("id_b")).as("v"))
        .where(col("u") =!= col("v")).distinct())
      def sig(e: DataFrame): (Long, Long) = {
        val r = e.agg(count(lit(1)),
          coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L))).head()
        (r.getLong(0), r.getLong(1))
      }
      var prev = sig(edges)
      var round = 0
      var converged = false
      while (!converged && round < 30) {
        val bidir = edges.select(col("u"), col("v"))
          .union(edges.select(col("v").as("u"), col("u").as("v")))
        val lsMin = bidir.groupBy(col("u"))
          .agg(least(min(col("v")), first(col("u"))).as("m"))
        val ls = bidir.join(lsMin, "u").where(col("v") > col("u"))
          .select(col("v").as("u"), col("m").as("v"))
          .where(col("u") =!= col("v")).distinct()
        val ssMin = ls.groupBy(col("u")).agg(min(col("v")).as("m"))
        val ss = store.keep(ls.join(ssMin, "u")
          .select(explode(array(
            struct(col("v").as("a"), col("m").as("b")),
            struct(col("u").as("a"), col("m").as("b")))).as("e"))
          .select(greatest(col("e.a"), col("e.b")).as("u"),
            least(col("e.a"), col("e.b")).as("v"))
          .where(col("u") =!= col("v")).distinct())
        val cur = sig(ss)
        converged = cur == prev
        prev = cur
        edges = ss
        round += 1
      }
      val out = graft.pipeline.Scratch.stable(
        nodes.join(edges, nodes("id") === edges("u"), "left")
          .select(col("id").as("doc_id"),
            coalesce(col("v"), col("id")).as("cluster_id")))
      store.release()
      out
    }
    def ccNew: DataFrame = Dedup.dupClustersStar(ccPairs)

    // thumbnail cross pairs: the bench flagged a possible mover here
    def thumbSides: (DataFrame, DataFrame) = {
      val base = docsDf.select("doc_id")
      val ih = Multimodal.aHash63(Multimodal.mediaFromIdsCached(base,
          "doc_id", only = Some("image")))
        .where(col("ahash").isNotNull)
        .select(col("media_id").as("_fid"), col("ahash").as("_h"))
      val fh = Multimodal.videoFrameHashes63(
        Multimodal.mediaFromIdsCached(base, "doc_id", only = Some("video")), 8)
        .select((col("media_id") * 64 + col("frame_slot")).as("_fid"),
          col("fhash").as("_h"))
      (ih, fh)
    }
    def thumbOld: DataFrame = {
      val (ih, fh) = thumbSides
      oldCrossPairs(ih, fh)
        .select(col("id_a").as("image_id"),
          shiftright(col("id_b"), 6).as("video_id"), col("hamming"))
        .groupBy("image_id", "video_id")
        .agg(min(col("hamming")).cast("int").as("best_hamming"))
    }
    def thumbNew: DataFrame = {
      val base = docsDf.select("doc_id")
      Multimodal.thumbnailPairs(
        Multimodal.mediaFromIdsCached(base, "doc_id", only = Some("image")),
        Multimodal.mediaFromIdsCached(base, "doc_id", only = Some("video")),
        maxHam = 3, k = 8)
    }

    // keep-set dedup: per-query pairs+CC rebuild (old) vs the shared
    // memoized cluster table (new); first new rep pays the build, the
    // median reads the steady state every later consumer sees
    def keepOld: DataFrame =
      Dedup.dedupCorpus(docsDf, "doc_id",
        Dedup.minhashPairs(docsDf, "text", "doc_id",
          n = 3, numHashes = 6, bands = 3, num = 3, den = 10))
        .select("doc_id")
    def keepNew: DataFrame =
      Dedup.dedupCorpusByClusters(docsDf, "doc_id",
        Dedup.minhashClustersCached(docsDf, "text", "doc_id",
          n = 3, numHashes = 6, bands = 3, num = 3, den = 10))
        .select("doc_id")

    val pairs: Seq[(String, () => DataFrame, () => DataFrame)] = Seq(
      ("keep_clusters", () => keepOld, () => keepNew),
      ("thumb", () => thumbOld, () => thumbNew),
      ("cc_star", () => ccOld, () => ccNew),
      ("img_neardup", () => imgOld, () => imgNew),
      ("tri", () => triOld, () => triNew),
      ("cross_mf", () => crossMfOld, () => crossMfNew))

    pairs.foreach { case (_, a, b) => time(a()); time(b()) }
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    pairs.foreach { case (name, a, b) =>
      val ta = scala.collection.mutable.ArrayBuffer.empty[Double]
      val tb = scala.collection.mutable.ArrayBuffer.empty[Double]
      (1 to reps).foreach { _ => ta += time(a()); tb += time(b()) }
      def med(x: Seq[Double]) = x.sorted.apply(x.length / 2)
      println(f"[ab] $name old=${med(ta.toSeq)}%.2f new=${med(tb.toSeq)}%.2f " +
        s"oldreps=${ta.map(x => f"$x%.2f").mkString(",")} " +
        s"newreps=${tb.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
