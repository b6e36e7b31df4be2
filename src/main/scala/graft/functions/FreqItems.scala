package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries frequent-items summary state: at most k counters plus
  * the total decrement applied so far. The decrement total is the
  * summary's own a-posteriori error certificate: for every item,
  * `est <= true <= est + dec` (an absent item has est 0), and
  * `dec <= N / (k+1)` where N is the number of items consumed — so
  * any item with true frequency above N/(k+1) is guaranteed present.
  */
final case class FreqBuf(counts: Map[String, Long], dec: Long)

/** One reported heavy hitter: estimated count plus the summary's
  * decrement bound at finish time (`est + dec` is a certified upper
  * bound on the true count; `est` is a lower bound).
  */
final case class FreqEst(item: String, est: Long, dec: Long)

/** A [[FreqEst]] keyed by its emitting stream shard and that shard's
  * fold sequence number — the streaming variant's output row (see
  * GraphStream.streamingHeavyHitters' consumer contract: keep only
  * max-`seq` rows per `shard` before merging shards).
  */
final case class FreqShardEst(shard: Int, seq: Long, item: String,
    est: Long, dec: Long)

/** Mergeable Misra-Gries heavy-hitters aggregate (Agarwal et al.,
  * "Mergeable Summaries", PODS 2012) over a string column, on the
  * PUBLIC `Aggregator` API — Spark plans it as a normal two-phase
  * aggregation: each partition folds its rows into a local k-counter
  * summary (map-side combine), and only k-row summaries cross the
  * wire. That is the 100 TB shape for "top tokens over the corpus":
  * shuffle traffic is O(partitions * k), independent of corpus size,
  * where the exact groupBy ships one row per distinct token per
  * partition.
  *
  * reduce: increment (or admit) the item; on overflow past k counters
  * subtract the minimum count from all (dropping zeros) and charge it
  * to `dec`. merge: add counts pointwise, then one compress step
  * subtracting the (k+1)-th largest value — at most k counters
  * survive and the error certificates ADD, preserving the
  * `dec <= N/(k+1)` bound across any merge tree (that is what makes
  * the summary safe under Spark's arbitrary partial-aggregation
  * order).
  */
final case class FreqItemsAgg(k: Int)
    extends Aggregator[String, FreqBuf, Seq[FreqEst]] {
  require(k >= 1, s"k must be >= 1, got $k")

  override def zero: FreqBuf = FreqBuf(Map.empty, 0L)

  override def reduce(b: FreqBuf, item: String): FreqBuf = {
    val c = b.counts.updated(item, b.counts.getOrElse(item, 0L) + 1L)
    if (c.size <= k) b.copy(counts = c)
    else {
      val m = c.valuesIterator.min
      FreqBuf(
        c.collect { case (i, v) if v > m => i -> (v - m) },
        b.dec + m)
    }
  }

  override def merge(b1: FreqBuf, b2: FreqBuf): FreqBuf = {
    if (b2.counts.isEmpty) return b1.copy(dec = b1.dec + b2.dec)
    if (b1.counts.isEmpty) return b2.copy(dec = b1.dec + b2.dec)
    val sum = b2.counts.foldLeft(b1.counts) { case (acc, (i, v)) =>
      acc.updated(i, acc.getOrElse(i, 0L) + v)
    }
    if (sum.size <= k) FreqBuf(sum, b1.dec + b2.dec)
    else {
      // (k+1)-th largest value: everything <= it zeroes out, so at
      // most k counters survive in one step
      val d = sum.valuesIterator.toArray.sortBy(-_).apply(k)
      FreqBuf(
        sum.collect { case (i, v) if v > d => i -> (v - d) },
        b1.dec + b2.dec + d)
    }
  }

  /** Estimates sorted count-DESC then item-ASC (deterministic at any
    * parallelism: counter VALUES are merge-order-independent).
    */
  override def finish(b: FreqBuf): Seq[FreqEst] =
    b.counts.toSeq.sortBy { case (i, v) => (-v, i) }
      .map { case (i, v) => FreqEst(i, v, b.dec) }

  override def bufferEncoder: Encoder[FreqBuf] = Encoders.product[FreqBuf]
  override def outputEncoder: Encoder[Seq[FreqEst]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[FreqEst]]()
}
