package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid-retrieval rank fusion: combine independently-produced
  * rankings (BM25 lexical, ANN semantic, ...) without score
  * calibration. Reciprocal Rank Fusion (Cormack, Clarke & Buettcher,
  * SIGIR 2009): each list contributes `1 / (rrfK + rank)` per doc, and
  * docs high in ANY list float up — the standard baseline that beats
  * most learned fusion at zero training cost.
  *
  * Contributions are integer-quantized (`scale div (rrfK + rank)`) so
  * fused scores are bit-identical across engines and partitionings —
  * the same discipline as the quantized PageRank family. At the
  * default `scale` = 1e12 and `rrfK` = 60, distinct small ranks map to
  * distinct quotients (ranks 1..~1000 are injective), so quantization
  * never reorders what float RRF would produce for realistic k.
  *
  * Scale shape: each ranking is already top-k-bounded by its producer,
  * so the union is tiny; one hash aggregation + one
  * TakeOrderedAndProject. No corpus-sized state anywhere.
  */
object Hybrid {

  /** Fuse rankings, each a frame carrying `idCol` and `rankCol`
    * (1-based). Returns the fused top-`k`: `(idCol, rrf_q)` ordered by
    * `rrf_q` desc with id as the tie-break.
    */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, rankCol: String,
      k: Int, rrfK: Int = 60, scale: Long = 1000000000000L): DataFrame = {
    require(rankings.nonEmpty, "at least one ranking required")
    require(k > 0 && rrfK >= 0, s"need k > 0, rrfK >= 0; got $k, $rrfK")
    val parts = rankings.map(_
      .select(col(idCol).cast("long").as(idCol),
        col(rankCol).cast("long").as("_r"))
      // `div` (exact integer division) — NOT `/` + cast, whose double
      // rounding can land one above the true quotient
      .select(col(idCol), expr(s"$scale div ($rrfK + _r)").as("_c")))
    parts.reduce(_.unionAll(_))
      .groupBy(col(idCol))
      .agg(sum(col("_c")).as("rrf_q"))
      .orderBy(col("rrf_q").desc, col(idCol).asc)
      .limit(k)
  }
}
