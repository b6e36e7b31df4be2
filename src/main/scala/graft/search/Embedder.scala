package graft.search

/** Engine-side embedding hook. The reference instance embeds text
  * server-side at insert time via its configured `embedding_model`
  * (default `text-embedding-ada-002`, helix-cli/src/config.rs:207-209);
  * graft mirrors that: a property written with a STRING value while
  * under a declared vector index is embedded before storage, and a
  * vector search whose query input is a STRING embeds the query the
  * same way — so clients insert text and vector-search with text,
  * never shipping a vector.
  *
  * The default is a deterministic, dependency-free local model:
  * signed feature-hashed character trigrams, L2-normalized (the
  * standard hashing-trick text vectorizer — Weinberger et al., 2009).
  * A production deployment swaps in a model-backed implementation
  * (batched calls to a real embedding service) via
  * `Embedder.default = ...`; the engine-side wiring — index detection,
  * write-path application, query embedding — is identical either way.
  */
trait Embedder extends Serializable {
  def dim: Int
  def embed(text: String): Array[Float]
}

/** Signed hashing-trick trigram embedder: each character trigram of
  * the lowercased, padded text hashes to a coordinate (MurmurHash3)
  * and a sign; the accumulated vector is L2-normalized. Deterministic
  * across JVMs and executors (MurmurHash3 is a fixed algorithm), so
  * write-time and query-time embeddings agree bit-for-bit.
  */
final class HashingTrigramEmbedder(val dim: Int = 64) extends Embedder {
  require(dim > 0, s"embedder dim must be positive: $dim")
  def embed(text: String): Array[Float] = {
    val out = new Array[Float](dim)
    if (text != null) {
      val t = "  " + text.toLowerCase + "  "
      var i = 0
      while (i + 3 <= t.length) {
        val h = scala.util.hashing.MurmurHash3.stringHash(t.substring(i, i + 3))
        out(math.floorMod(h, dim)) += (if ((h & 0x40000000) == 0) 1f else -1f)
        i += 1
      }
    }
    val n = math.sqrt(out.foldLeft(0.0)((a, v) => a + v.toDouble * v))
    if (n > 0) { var j = 0; while (j < dim) { out(j) = (out(j) / n).toFloat; j += 1 } }
    out
  }
}

object Embedder {
  /** Session-wide pluggable embedder (swap for a model-backed impl). */
  @volatile var default: Embedder = new HashingTrigramEmbedder(64)
}
