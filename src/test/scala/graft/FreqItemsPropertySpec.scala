package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{FreqBuf, FreqItemsAgg}

/** Property-based checks of the mergeable Misra-Gries summary: over
  * random streams folded through RANDOM merge trees (mimicking Spark's
  * arbitrary partial-aggregation order), the certificates must hold:
  *   - at most k counters survive;
  *   - for EVERY item: est <= true <= est + dec (absent => est 0);
  *   - dec * (k+1) <= N (so any item with freq > N/(k+1) is present);
  *   - the result is independent of the partition split (same final
  *     counter multiset bound — note counter VALUES may differ across
  *     merge orders, but the certificates must hold for all of them).
  */
class FreqItemsPropertySpec extends AnyFunSuite {

  private def forAllSampled[A](gen: Gen[A], n: Int = 200)(check: A => Unit): Unit = {
    val params = Gen.Parameters.default
    (0 until n).foreach { i =>
      gen.apply(params, org.scalacheck.rng.Seed(i.toLong)).foreach(check)
    }
  }

  private val genCase: Gen[(Int, List[String], Int)] = for {
    k <- Gen.choose(1, 12)
    vocab <- Gen.choose(1, 40)
    len <- Gen.choose(0, 400)
    // zipf-ish: low indices much more likely
    items <- Gen.listOfN(len,
      Gen.frequency(
        6 -> Gen.choose(0, math.max(vocab / 8, 1)),
        3 -> Gen.choose(0, math.max(vocab / 2, 1)),
        1 -> Gen.choose(0, vocab)).map(i => s"w$i"))
    splits <- Gen.choose(1, 8)
  } yield (k, items, splits)

  /** Fold a stream through `splits` partitions, then merge the partials
    * pairwise in a left fold — one arbitrary merge tree.
    */
  private def summarize(agg: FreqItemsAgg, items: List[String],
      splits: Int): FreqBuf = {
    val parts = items.grouped(math.max(items.size / splits, 1)).toList
    val partials = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
    if (partials.isEmpty) agg.zero
    else partials.reduceLeft(agg.merge)
  }

  test("certificates hold for random streams and merge trees") {
    forAllSampled(genCase) { case (k, items, splits) =>
      val agg = FreqItemsAgg(k)
      val buf = summarize(agg, items, splits)
      val truth = items.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
      val n = items.size.toLong
      assert(buf.counts.size <= k, s"k=$k size=${buf.counts.size}")
      assert(buf.dec * (k + 1) <= n, s"dec=${buf.dec} n=$n k=$k")
      (truth.keySet ++ buf.counts.keySet).foreach { w =>
        val t = truth.getOrElse(w, 0L)
        val est = buf.counts.getOrElse(w, 0L)
        assert(est <= t && t <= est + buf.dec,
          s"item $w: est=$est true=$t dec=${buf.dec} (k=$k splits=$splits)")
      }
      // presence guarantee: strictly-heavy items must survive
      truth.foreach { case (w, t) =>
        if (t > n / (k + 1))
          assert(buf.counts.contains(w),
            s"heavy item $w (freq $t of $n, k=$k) evicted")
      }
      // finish() is sorted est-desc then item-asc
      val fin = agg.finish(buf)
      assert(fin.map(e => (-e.est, e.item)) == fin.map(e => (-e.est, e.item)).sorted)
    }
  }
}
