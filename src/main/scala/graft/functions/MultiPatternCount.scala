package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aho-Corasick automaton over UTF-8 BYTES (Aho & Corasick 1975),
  * built once on the driver and shipped to every task as ONE reference
  * object — the multi-pattern scan a blocklist filter needs: one pass
  * over each document counts ALL occurrences of EVERY pattern
  * (overlapping included), instead of |patterns| `contains` scans or a
  * regex alternation's backtracking.
  *
  * Byte-level matching is exact for UTF-8: the encoding is
  * self-synchronizing, so a pattern's byte sequence cannot match at a
  * code-point-misaligned position. Matching is byte-exact — callers
  * wanting case folding lower() both sides first.
  *
  * Representation is the compact edge-list form, O(total pattern
  * bytes) memory — NOT the 256-wide goto table, which at a real
  * blocklist's size (millions of entries) would be gigabytes. Edges
  * per node are sorted for binary search; fail links are followed at
  * scan time (amortized O(1) per input byte, the classic bound).
  * Output counts carry the fail-closure sum, so `cnt(state)` is the
  * number of patterns ENDING at each input position and one add per
  * byte totals every match.
  */
final class AcAutomaton(patternsIn: Seq[String]) extends Serializable {
  private val patterns: Array[Array[Byte]] = patternsIn.distinct
    .filter(_.nonEmpty).map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    .toArray

  /** Number of distinct non-empty patterns compiled in. */
  def size: Int = patterns.length

  // trie build over a growable child map keyed by (node << 8 | byte)
  private val (edgeStart, edgeByte, edgeChild, fail, cnt) = {
    val kids = new java.util.TreeMap[java.lang.Long, Integer]()
    val endsBuf = scala.collection.mutable.ArrayBuffer(0)
    def key(n: Int, b: Int): java.lang.Long = (n.toLong << 8) | b
    patterns.foreach { p =>
      var cur = 0
      var i = 0
      while (i < p.length) {
        val b = p(i) & 0xff
        val hit = kids.get(key(cur, b))
        cur = if (hit != null) hit.intValue()
        else {
          endsBuf += 0
          val nn = endsBuf.length - 1
          kids.put(key(cur, b), nn)
          nn
        }
        i += 1
      }
      endsBuf(cur) += 1
    }
    val n = endsBuf.length
    val ends = endsBuf.toArray
    // flatten edges: TreeMap iteration is (node, byte)-sorted, exactly
    // the CSR layout binary search wants
    val es = new Array[Int](n + 1)
    val eb = new Array[Byte](kids.size)
    val ec = new Array[Int](kids.size)
    var idx = 0
    val it = kids.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val node = (e.getKey >> 8).toInt
      es(node + 1) += 1
      eb(idx) = (e.getKey & 0xff).toByte
      ec(idx) = e.getValue.intValue()
      idx += 1
    }
    var i = 0
    while (i < n) { es(i + 1) += es(i); i += 1 }
    // BFS fail links + fail-closure of the end counts
    val fl = new Array[Int](n)
    val queue = new java.util.ArrayDeque[Integer]()
    def edgeOf(node: Int, b: Int): Int = {
      var lo = es(node); var hi = es(node + 1) - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val c = (eb(mid) & 0xff) - b
        if (c == 0) return ec(mid)
        else if (c < 0) lo = mid + 1
        else hi = mid - 1
      }
      -1
    }
    var e0 = es(0)
    while (e0 < es(1)) { fl(ec(e0)) = 0; queue.add(ec(e0)); e0 += 1 }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      ends(u) += ends(fl(u))
      var e = es(u)
      while (e < es(u + 1)) {
        val b = eb(e) & 0xff
        val v = ec(e)
        // classic fail computation: walk u's fail chain to the first
        // state with a b-edge (root loops to itself)
        var f = fl(u)
        var nxt = edgeOf(f, b)
        while (nxt == -1 && f != 0) { f = fl(f); nxt = edgeOf(f, b) }
        fl(v) = if (nxt == -1 || nxt == v) 0 else nxt
        queue.add(v)
        e += 1
      }
    }
    (es, eb, ec, fl, ends)
  }

  private def step(state0: Int, b: Int): Int = {
    var st = state0
    while (true) {
      var lo = edgeStart(st); var hi = edgeStart(st + 1) - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val c = (edgeByte(mid) & 0xff) - b
        if (c == 0) return edgeChild(mid)
        else if (c < 0) lo = mid + 1
        else hi = mid - 1
      }
      if (st == 0) return 0
      st = fail(st)
    }
    0
  }

  /** Total pattern occurrences in `s`, overlapping included. */
  def countMatches(s: UTF8String): Long = {
    val bytes = s.getBytes
    var st = 0; var total = 0L; var i = 0
    while (i < bytes.length) {
      st = step(st, bytes(i) & 0xff)
      total += cnt(st)
      i += 1
    }
    total
  }
}

/** Native Catalyst expression: total blocklist-pattern occurrence
  * count of a string column through one [[AcAutomaton]] pass. The
  * automaton ships as one reference object; the generated code is a
  * single virtual call into its tight byte loop — |patterns| never
  * appears in the per-row cost, where the compositional
  * `exists(contains)` form pays a full text scan per pattern.
  */
case class MultiPatternCount(child: Expression, aut: AcAutomaton)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "multi_pattern_count"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"multi_pattern_count needs string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    aut.countMatches(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAutomaton", aut, classOf[AcAutomaton].getName)
    defineCodeGen(ctx, ev, c => s"$ref.countMatches($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiPatternCount =
    copy(child = newChild)
}

object MultiPatternCount {
  def apply(c: Column, patterns: Seq[String]): Column =
    toColumn(MultiPatternCount(toExpression(c), new AcAutomaton(patterns)))
}
