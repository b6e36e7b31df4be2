package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.search.VectorOps

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

    val pairs: Seq[(String, () => DataFrame, () => DataFrame)] = Seq(
      ("mine_pq", () => minePq(true), () => minePq(false)),
      ("mine_ivf", () => mineIvf(true), () => mineIvf(false)))

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
