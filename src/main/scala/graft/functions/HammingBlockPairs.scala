package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
import org.apache.spark.sql.types._

/** Generator: all Hamming-surviving pairs of one banded block, emitted
  * by a compiled double loop — candidates never materialize as rows.
  *
  * The banded-LSH pair paths used to produce every band-equal
  * candidate as a JOIN OUTPUT row and gate on `bit_count(xor)` after:
  * correct, but a low-entropy band (measured: 5600 of 6664 frame
  * hashes sharing one 16-bit band on the media corpus, ~31M
  * candidates) pays Spark's per-row production cost for millions of
  * rows that one XOR+popcount immediately discards. Here the grouped
  * block arrives as (id, hash) struct ARRAYS (bounded by the caller's
  * sub-bucket cap — the same boundedKeyPairs memory guarantee) and
  * the pair loop runs as plain JVM code: ~10⁸ popcounts/s/core, only
  * survivors become rows.
  *
  * Modes (both used by [[graft.pipeline.Dedup]]'s banded machinery):
  *   - `selfBlock = true`: `left` and `right` are the SAME block;
  *     emit i < j pairs (the array arrives sorted, so pair order is
  *     the struct order the join formulation produced).
  *   - `selfBlock = false`: distinct blocks. With `orient = true` the
  *     pair is emitted (left element, right element) — the
  *     cross-corpus contract where `id_a` must come from side A; with
  *     `orient = false` the pair is ordered by (id, hash) struct
  *     comparison — the single-corpus sub-bucket contract.
  *
  * Output rows: `(id_a, id_b, hamming)` with `hamming <= maxHam`.
  * Same-id pairs are emitted (the caller's id-level guard owns that
  * contract, as it always did).
  *
  * Cross-band dedup (`nBands > 1`): a pair within Hamming `maxHam`
  * agrees on up to `nBands` band keys and its block therefore shows
  * up once PER agreeing band — the join formulation paid a full
  * `.distinct()` shuffle of the survivor volume to collapse those.
  * With the band geometry (`bandIdx` = this block's band, `bandBits`,
  * `nBands`) the generator emits the pair only from its FIRST
  * agreeing band (lowest index with a zero XOR band — computable from
  * the two hashes it already holds), so the output is globally
  * duplicate-free BY CONSTRUCTION and no dedup shuffle exists at all.
  * Exactness: the pair sits in this block precisely because band
  * `bandIdx` agrees, so a first agreeing band always exists and is
  * unique — each surviving pair is emitted exactly once across all
  * bands. With `nBands <= 1` every survivor is emitted (the legacy
  * single-banding mode). Callers must key elements by UNIQUE ids
  * (all do: doc/media/vec ids, `clip*64+slot` composites) — with
  * duplicate (id, hash) elements the pair emits once per ELEMENT
  * pair, where the old distinct collapsed equal (id, id, hamming)
  * triples.
  */
case class HammingBlockPairs(left: Expression, right: Expression,
    selfBlock: Expression, orient: Expression, maxHam: Expression,
    bandIdx: Expression, bandBits: Expression, nBands: Expression)
    extends Expression with Generator with CodegenFallback {

  override def children: Seq[Expression] =
    Seq(left, right, selfBlock, orient, maxHam, bandIdx, bandBits, nBands)

  override def elementSchema: StructType = StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false),
    StructField("hamming", IntegerType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val elem = StructType(Seq(StructField("i", LongType),
      StructField("s", LongType)))
    def okArr(dt: DataType) = dt match {
      case ArrayType(StructType(fs), _) if fs.length == 2 &&
        fs.forall(_.dataType == LongType) => true
      case _ => false
    }
    if (okArr(left.dataType) && okArr(right.dataType) &&
        selfBlock.dataType == BooleanType && orient.dataType == BooleanType &&
        maxHam.dataType == IntegerType && bandIdx.dataType == IntegerType &&
        bandBits.dataType == IntegerType && nBands.dataType == IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hamming_block_pairs needs two array<struct<long,long>> blocks " +
          s"($elem), boolean selfBlock/orient and int maxHam/bandIdx/" +
          s"bandBits/nBands; got ${children.map(_.dataType)}")
  }

  private def unpack(a: ArrayData): (Array[Long], Array[Long]) = {
    val n = a.numElements()
    val ids = new Array[Long](n); val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val r = a.getStruct(i, 2)
      ids(i) = r.getLong(0); hs(i) = r.getLong(1)
      i += 1
    }
    (ids, hs)
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val aRaw = left.eval(input)
    val bRaw = right.eval(input)
    val selfRaw = selfBlock.eval(input)
    val orientRaw = orient.eval(input)
    val mhRaw = maxHam.eval(input)
    if (aRaw == null || bRaw == null || selfRaw == null || mhRaw == null)
      return Nil
    val mh = mhRaw.asInstanceOf[Int]
    val isSelf = selfRaw.asInstanceOf[Boolean]
    val oriented = orientRaw != null && orientRaw.asInstanceOf[Boolean]
    val biRaw = bandIdx.eval(input)
    val bitsRaw = bandBits.eval(input)
    val nbRaw = nBands.eval(input)
    if (biRaw == null || bitsRaw == null || nbRaw == null) return Nil
    val bIdx = biRaw.asInstanceOf[Int]
    val bits = bitsRaw.asInstanceOf[Int]
    val nb = nbRaw.asInstanceOf[Int]
    val bandMask = if (bits >= 64) -1L else (1L << bits) - 1
    val (idsA, hsA) = unpack(aRaw.asInstanceOf[ArrayData])
    val (idsB, hsB) =
      if (isSelf) (idsA, hsA) else unpack(bRaw.asInstanceOf[ArrayData])
    // LAZY emission: a dense block (the hot-band case this generator
    // exists for) can have millions of survivors — buffering them per
    // block would reintroduce the memory spike the cap bounds exist
    // to prevent. The iterator scans with O(1) state.
    new Iterator[InternalRow] {
      private var i = 0
      private var j = if (isSelf) 1 else 0
      private var nextRow: InternalRow = null
      private def advance(): Unit = {
        while (nextRow == null && i < idsA.length) {
          while (nextRow == null && j < idsB.length) {
            val x = hsA(i) ^ hsB(j)
            val d = java.lang.Long.bitCount(x)
            // first-agreeing-band rule: emit only from the lowest band
            // whose key matches (nb <= 1 keeps legacy emit-always)
            var firstBand = true
            if (d <= mh && nb > 1) {
              var b = 0
              while (b < bIdx && firstBand) {
                if (((x >>> (b * bits)) & bandMask) == 0L) firstBand = false
                b += 1
              }
            }
            if (d <= mh && firstBand) {
              // self blocks arrive sorted, so i < j IS struct order;
              // an unoriented cross block sorts the pair by
              // (id, hash) — both match the join formulation's
              // least/greatest contract
              val swap = !isSelf && !oriented &&
                (idsB(j) < idsA(i) ||
                  (idsB(j) == idsA(i) && hsB(j) < hsA(i)))
              val (ia, ib) =
                if (swap) (idsB(j), idsA(i)) else (idsA(i), idsB(j))
              nextRow = new GenericInternalRow(Array[Any](ia, ib, d))
            }
            j += 1
          }
          if (nextRow == null) { i += 1; j = if (isSelf) i + 1 else 0 }
        }
      }
      override def hasNext: Boolean = { advance(); nextRow != null }
      override def next(): InternalRow = {
        advance()
        val r = nextRow; nextRow = null
        if (r == null) throw new NoSuchElementException
        r
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HammingBlockPairs =
    copy(left = newChildren(0), right = newChildren(1),
      selfBlock = newChildren(2), orient = newChildren(3),
      maxHam = newChildren(4), bandIdx = newChildren(5),
      bandBits = newChildren(6), nBands = newChildren(7))
}

object HammingBlockPairs {
  /** Column-level entry point (use inside a `select`, like explode).
    * Single-band legacy mode: every survivor emitted. */
  def apply(a: Column, b: Column, selfBlock: Column, orient: Column,
      maxHam: Column): Column =
    apply(a, b, selfBlock, orient, maxHam,
      org.apache.spark.sql.functions.lit(0),
      org.apache.spark.sql.functions.lit(64),
      org.apache.spark.sql.functions.lit(1))

  /** Banded mode: with `nBands > 1`, each surviving pair is emitted
    * only from its first agreeing band — globally duplicate-free. */
  def apply(a: Column, b: Column, selfBlock: Column, orient: Column,
      maxHam: Column, bandIdx: Column, bandBits: Column,
      nBands: Column): Column =
    toColumn(HammingBlockPairs(toExpression(a), toExpression(b),
      toExpression(selfBlock), toExpression(orient), toExpression(maxHam),
      toExpression(bandIdx), toExpression(bandBits), toExpression(nBands)))
}
