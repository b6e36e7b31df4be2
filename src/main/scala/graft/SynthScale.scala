package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize a `factor`x timing corpus from an existing testdata dir
  * by id-offset unions — the second decade of the empirical scaling
  * audit (sf0.01 -> sf0.1 -> 10x-sf0.1). Same generator discipline as
  * the SRP augmentations in SparkEntry (`vec_id + 100000` unions):
  * each copy k offsets every entity key by `k * 10_000_000`, so
  * foreign keys stay consistent within a copy and copies form
  * disjoint graph components — navigation, joins and group-bys all
  * see a true `factor`x workload with the same per-copy shape.
  *
  * This is a TIMING corpus, not a correctness corpus (no oracle runs
  * against it):
  *  - `region`/`nation` are dimension tables referenced by unchanged
  *    nation keys — copied once, as a real 10x corpus would.
  *  - document text gets a per-copy prefix token (near-identical
  *    per-row work, distinct exact-hashes across copies).
  *  - embeddings get deterministic per-(row, copy) noise that
  *    DECORRELATES directions across copies: a plain copy would pair
  *    every replica with its source and grow near-dup PAIRS
  *    quadratically in `factor`, turning a row-linear scaling probe
  *    into a measurement of join fan-out instead.
  *  - key offsets are multiples of 10M, so `key % m` class structure
  *    (the co-occurrence projections filter on `l_partkey % m = 0`)
  *    is preserved per copy.
  */
object SynthScale {

  private val CopyOffset = 10000000L

  /** Union `factor` key-offset copies of `df`. `keyCols` shift by
    * `k * CopyOffset`; `perturb` (optional) rewrites content columns
    * given the copy index.
    */
  private def replicate(df: DataFrame, factor: Int, keyCols: Seq[String],
      perturb: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
    (0 until factor).map { k =>
      val shifted = keyCols.foldLeft(df)((d, c) =>
        d.withColumn(c, col(c) + lit(k * CopyOffset)))
      perturb(shifted, k)
    }.reduce(_ unionAll _)

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "synthdata/sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(t: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[synth] $t: ${spark.read.parquet(s"$dst/$t.parquet").count()} rows")
    }

    // dimensions: single copy (shared by every replica, like a real
    // 10x corpus sharing one country list)
    write("region", read("region"))
    write("nation", read("nation"))

    write("customer", replicate(read("customer"), factor, Seq("c_custkey")))
    write("supplier", replicate(read("supplier"), factor, Seq("s_suppkey")))
    write("part", replicate(read("part"), factor, Seq("p_partkey")))
    write("orders",
      replicate(read("orders"), factor, Seq("o_orderkey", "o_custkey")))
    write("lineitem", replicate(read("lineitem"), factor,
      Seq("l_orderkey", "l_partkey", "l_suppkey")))
    write("events",
      replicate(read("events"), factor, Seq("event_id", "user_id")))

    write("documents", replicate(read("documents"), factor, Seq("doc_id"),
      perturb = (d, k) =>
        if (k == 0) d
        else d.withColumn("text", concat(lit(s"c$k "), col("text")))
          .withColumn("n_chars", col("n_chars") + lit(2 + s"$k".length))))

    // per-(row, copy, dim) deterministic noise, +-0.8 amplitude, via
    // xxhash64 — i.i.d. across rows/dims/copies, which is what
    // decorrelates copy directions (see scaladoc). A small-modulus
    // arithmetic pattern here is a trap: with only ~17 residue
    // classes, thousands of rows share IDENTICAL noise vectors and
    // the noise itself forms giant cosine clusters (measured: 22.4M
    // pairs at cosine 0.5 on 20k rows vs 14 in the source corpus).
    // Zero noise for copy 0 so the base distribution survives
    // verbatim.
    write("embeddings", replicate(read("embeddings"), factor, Seq("vec_id"),
      perturb = (d, k) =>
        if (k == 0) d
        else d.withColumn("embedding", transform(col("embedding"), (x, i) =>
          (x + (pmod(xxhash64(col("vec_id"), i, lit(k)), lit(1601L))
            .cast("float") / 1000.0f - 0.8f)).cast("float")))))

    spark.stop()
  }
}
