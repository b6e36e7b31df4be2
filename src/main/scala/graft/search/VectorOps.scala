package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector similarity primitives, expressed with Spark's codegen'd
  * higher-order functions (`zip_with`, `aggregate`) — no UDFs, so the
  * whole scoring pipeline stays inside WholeStageCodegen and vectorized
  * parquet reads.
  *
  * Replaces the reference's HNSW index (helix-cli/src/config.rs:191-201:
  * m=16, ef_construction=128, ef_search=768) with batch-oriented
  * strategies:
  *  - exact brute-force top-k (baseline; distributed scan + TakeOrdered);
  *  - IVF partition pruning (k-means centroids; scan only the closest
  *    `nprobe` clusters — the 100 TB path, see Ivf below).
  */
object VectorOps {

  /** Sum over an array column: aggregate(col, 0.0, (acc,x) -> acc+x). */
  private def arrSum(c: Column): Column =
    aggregate(c, lit(0.0), (acc, x) => acc + x)

  def dot(a: Column, b: Column): Column =
    arrSum(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  def norm(a: Column): Column =
    sqrt(arrSum(transform(a, x => x.cast("double") * x.cast("double"))))

  /** Vector-vs-query scoring uses the fused native expression (one
    * loop, codegen'd — graft.functions.CosineToQuery); results are
    * bit-equal with the HOF formulation below.
    */
  def cosineSim(vecCol: Column, query: Seq[Double]): Column =
    graft.functions.CosineToQuery(vecCol, query)

  /** Composable HOF formulation (kept for column-to-column use and as
    * the reference for the fused expression's semantics).
    */
  def cosineSimHof(vecCol: Column, query: Seq[Double]): Column = {
    val q = array(query.map(lit): _*)
    val qn = math.sqrt(query.map(x => x * x).sum)
    dot(vecCol, q) / (norm(vecCol) * lit(qn))
  }

  /** Pairwise cosine via the fused native expression (one compiled
    * loop — graft.functions.CosinePair); bit-equal with the HOF
    * reference below, parity-spec'd including the null branches. On a
    * degenerate input (zero-norm vector, NaN elements) the fused form
    * returns NULL — failing every `>= θ` filter and ranking
    * nulls-last — where the HOF under ANSI threw on the division and
    * a raw NaN would have PASSED every threshold (Spark and DuckDB
    * both compare NaN greater than everything). See the CosinePair
    * scaladoc.
    */
  def cosineSimCols(a: Column, b: Column): Column =
    graft.functions.CosinePair(a, b)

  /** Composable HOF reference formulation for [[cosineSimCols]] (the
    * semantics contract the fused expression and the DuckDB oracle's
    * `list_cosine_similarity` both match).
    */
  def cosineSimColsHof(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** The 1e-9 SELECTION grid for every exact-cosine top-k in this
    * module: `round(score · 1e9)` half-away-from-zero, as a long.
    *
    * The grid is load-bearing for cross-engine replay — at the
    * SELECTION boundary, not just after it. DuckDB's
    * `list_cosine_similarity` is bit-stable on a plain scan but drifts
    * in the last ULP once lists pass through a join (SIMD accumulation
    * order follows the list's offset in the child vector), so a top-k
    * window ordered on the RAW double flips rank-boundary near-ties
    * between runs: the r12 driver artifact caught exactly that on
    * `q_embed_margin_mine`/`_mutual` (a rank-4 tie flip changed the
    * candidate set, hence every Σ/margin/argmax downstream) after the
    * same mechanism had already hit `q_embed_mmr`'s pick windows.
    * Ordering selection on the quantized value collapses ULP noise
    * into an exact tie that the id tie-break settles identically on
    * both engines; a flip now needs two candidates within one ULP of
    * the SAME grid boundary, not merely within an ULP of each other.
    *
    * Implemented boundary-exact on |x| (floor + exact fractional
    * compare, no `x + 0.5` whose addition can round across the
    * boundary): for y ≥ 0 with y < 2^53, `y − floor(y)` is an exact
    * double (both are multiples of ulp(y) and the difference needs no
    * finer resolution), so the half-point comparison is exact; the
    * sign is applied after — half-away-from-zero is sign-symmetric.
    * The |x| detour is load-bearing, not style: for NEGATIVE x just
    * above a half boundary (e.g. x = nextUp(−0.5)), `x − floor(x)` =
    * x + 1 crosses into the next binade and rounds half-even to
    * EXACTLY 0.5, misfiring the tie branch — q9 returned −1 where
    * Spark/DuckDB round give 0 (caught by the executed-ground-truth
    * property spec). The result agrees with C++ `round` (DuckDB, half
    * away from zero) and Spark's `round` (shortest-decimal HALF_UP —
    * shortest repr never crosses an exactly-representable z + 0.5)
    * for every double. The heap kernels quantize with this function
    * and EMIT the quantized key; the declarative paths order on
    * [[q9Col]] — same value by the above, so kernel heaps and final
    * windows never disagree.
    */
  private[graft] def q9(s: Double): Long = {
    val x = s * 1e9
    val ax = math.abs(x)
    val f = math.floor(ax)
    val d = ax - f // exact: ax >= 0
    val m = if (d > 0.5) f + 1
      else if (d < 0.5) f
      else f + 1 // exact half: away from zero (2.5 -> 3, -2.5 -> -3)
    if (x < 0) -m.toLong else m.toLong
  }

  /** Column form of [[q9]] (Spark `round` is HALF_UP on the double's
    * shortest decimal form, which agrees with [[q9]] for every double
    * — shortest-repr never crosses an exactly-representable z + 0.5
    * boundary). Oracles mirror it as
    * `CAST(round(c * 1000000000) AS BIGINT)`.
    */
  private[graft] def q9Col(c: Column): Column =
    round(c * lit(1000000000L)).cast("long")

  /** Symmetric per-vector int8 quantization — the 4×-storage/IO shrink
    * a 100 TB embedding corpus takes before serving (float32 → 1 byte
    * per dimension + one scale per vector). Adds `q_vec`
    * (array<byte>, `round(v_i / q_scale)`) and `q_scale`
    * (`max|v_i| / 127`); dequantize as `q_i · q_scale`, with per-value
    * error bounded by `q_scale / 2`. All-zero vectors quantize to
    * zeros with scale 0. Pure column expressions (the scale stages as
    * an attribute before the per-element lambda references it) — a
    * codegen'd scan, no shuffle.
    */
  def quantizeInt8(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("q_scale",
      array_max(transform(col(vecCol), x => abs(x.cast("double")))) / 127.0)
      .withColumn("q_vec",
        when(col("q_scale") === 0.0,
          transform(col(vecCol), _ => lit(0).cast("byte")))
          .otherwise(transform(col(vecCol),
            x => round(x.cast("double") / col("q_scale")).cast("byte"))))

  /** L2 normalization with integer-quantized arithmetic: components
    * quantize to `round(x · scale)` longs, the squared norm is an EXACT
    * long sum (order-free — a double norm would hash-differ across
    * engines/partitionings from summation order alone), and the output
    * component is `(x_q · scale) div floor(sqrt(norm²))` — IEEE sqrt of
    * an exact integer is correctly rounded everywhere, so the whole
    * pipeline is bit-deterministic. Output ≈ unit vector at `scale`
    * fixed-point; zero vectors normalize to zeros. One codegen'd scan,
    * no shuffle.
    */
  def l2NormalizeQuantized(vec: Column, scale: Long = 1000000L): Column = {
    val q = transform(vec, x => round(x.cast("double") * scale).cast("long"))
    val n2 = aggregate(q, lit(0L), (acc, x) => acc + x * x)
    val norm = floor(sqrt(n2.cast("double"))).cast("long")
    // truncating integer division via double: |a| ≤ scale² = 1e12 is
    // double-exact, and a non-integer quotient sits ≥ 1/norm ≈ 1e-6
    // from any integer — far beyond the ~2e-10 division ulp — so the
    // cast truncates identically to DuckDB's `//` (also trunc-to-zero)
    when(norm === 0L, transform(vec, _ => lit(0L)))
      .otherwise(transform(q,
        x => ((x * scale).cast("double") / norm).cast("long")))
  }

  /** [[l2NormalizeQuantized]] staged through attributes — USE THIS on
    * corpus scans. The Column form above re-INLINES the O(dim)
    * quantize+aggregate under every element of the output transform
    * (expressions have no let-binding), an O(dim²)-node tree that
    * falls out of codegen — measured 3 s for 2000 rows × dim 64 vs
    * ~0.1 s staged; the same inlined-expression quadratic class as the
    * winnowing md5 fix. Arithmetic is identical, so results are
    * bit-equal.
    */
  def l2NormalizeQuantizedStaged(df: DataFrame, vecCol: String,
      out: String, scale: Long = 1000000L): DataFrame =
    df.withColumn("_lnq_q",
        transform(col(vecCol), x => round(x.cast("double") * scale).cast("long")))
      .withColumn("_lnq_norm",
        floor(sqrt(aggregate(col("_lnq_q"), lit(0L),
          (acc, x) => acc + x * x).cast("double"))).cast("long"))
      .withColumn(out,
        when(col("_lnq_norm") === 0L, transform(col(vecCol), _ => lit(0L)))
          .otherwise(transform(col("_lnq_q"),
            x => ((x * scale).cast("double") / col("_lnq_norm")).cast("long"))))
      .drop("_lnq_q", "_lnq_norm")

  /** True iff every component of a float/double array column is
    * finite. A NaN/±Inf component poisons integer-quantized pipelines
    * silently (round(NaN)→NULL/0 depending on mode, Inf quantizes to
    * Long.MaxValue and wraps the very first multiply), so every
    * quantized-arithmetic entry point filters on this BEFORE staging
    * — mirroring the knn kernels' degenerate-row exclusion.
    */
  private[graft] def finiteVec(c: Column): Column =
    !exists(c, x => isnan(x.cast("double")) ||
      abs(x.cast("double")) === lit(Double.PositiveInfinity))

  /** Exact integer dot product of two `array<long>` columns — a pure
    * long fold, order-free and bit-identical on any engine/partition
    * layout. Over [[l2NormalizeQuantized]] µ-unit vectors the value is
    * ≈ cosine·1e12 with |result| ≤ scale² = 1e12 (Cauchy–Schwarz), so
    * 64-dim sums sit 6 decimal orders below 2^63 and, cast to double,
    * below 2^53 — which is why the DuckDB oracle can mirror it as
    * `CAST(list_dot_product(CAST(v AS DOUBLE[]), …) AS BIGINT)`: every
    * intermediate is an integer exactly representable in double, so
    * ANY summation order (SIMD width, FMA, thread count) produces the
    * same bits. This is the margin-mining selection key: no float
    * exists anywhere in the contract, so a different DuckDB build
    * cannot flip a candidate the way last-ULP cosine drift did.
    */
  def intDotCol(a: Column, b: Column): Column =
    graft.functions.IntDotProduct(a, b)

  /** The composable HOF reference formulation of [[intDotCol]] — the
    * contract the fused expression is parity-pinned against (and the
    * form any plain-Spark reader can replay without this library).
    */
  private[graft] def intDotColHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Deterministic ±1 sign for the random projection: parity of the
    * first hex nibble of `md5("rp:<i>:<j>")`. Any engine with a
    * standard MD5 reproduces it — the DuckDB oracle recomputes the
    * matrix in SQL, so the sign derivation itself is cross-checked,
    * not shipped as trusted literals.
    */
  def rpSign(i: Int, j: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"rp:$i:$j".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    if (((d(0) >> 4) & 0xf) % 2 == 0) 1L else -1L
  }

  /** Random-projection dimensionality reduction (Johnson-Lindenstrauss
    * with Achlioptas ±1 signs), integer-quantized for bit determinism:
    * `out_j = Σ_i sign(i,j) · round(x_i · scale)` — exact long
    * arithmetic, order-free, identical at any parallelism and in any
    * engine. The quantized array is staged as an attribute so the m
    * output components reference it instead of re-inlining the O(d)
    * quantize transform (the inlined-expression quadratic class —
    * see [[l2NormalizeQuantizedStaged]]).
    *
    * The 100 TB shape: ONE exchange-free scan, O(d·m) multiplies per
    * row, and every downstream distance/cluster pass pays m ops
    * instead of d with JL-bounded distortion — the standard cheap
    * pre-ANN reduction. Projections of sums equal sums of projections
    * on already-quantized inputs (linearity is exact in the integer
    * domain).
    */
  def randomProject(df: DataFrame, vecCol: String, out: String,
      inDim: Int, outDim: Int, scale: Long = 1000000L): DataFrame = {
    val staged = df.withColumn("_rp_q",
      transform(col(vecCol), x => round(x.cast("double") * scale).cast("long")))
    val comps = (0 until outDim).map { j =>
      val signs = array((0 until inDim).map(i => lit(rpSign(i, j))): _*)
      aggregate(zip_with(col("_rp_q"), signs, (x, s) => x * s),
        lit(0L), (a, x) => a + x)
    }
    staged.withColumn(out, array(comps: _*)).drop("_rp_q")
  }

  /** Deterministic randomized-Hadamard rotation (`H·D` with `H` the
    * order-`inDim` Walsh matrix, entries `(-1)^popcount(i AND j)`, and
    * `D` a deterministic ±1 diagonal from the [[rpSign]] family):
    * `H·Hᵀ = inDim·I` exactly, so the rotation is orthogonal up to one
    * global scale and cosine geometry — hence the exact neighbor set —
    * is preserved, while per-dimension energy spreads evenly across
    * the subspace splits PQ makes. That is the OPQ effect without
    * learning a rotation (the standard ANN pre-rotation, e.g. FAISS's
    * RandomRotationMatrix / the fast-JL HD block). Computed in exact
    * long arithmetic over µ-unit quantized inputs (one exchange-free
    * scan, O(d²) multiplies per row), emitted as `array<float>` for
    * the serving kernels — float rounding at ~1e-7 relative is the
    * only approximation. `inDim` must be a power of two.
    *
    * The benefit is data-dependent — MEASURE it with
    * [[calibrateRefine]] before enabling. The sf0.1 embeddings (m=8,
    * ks=256, recall@10 ≥ 0.9) measured calibrated refine depth 7 → 4
    * behind the rotation, and a fixture whose signal levels overflow
    * one subspace's codebook capacity improves likewise; but a corpus
    * whose cluster identity fits ONE subspace's codebook exactly
    * measured the reverse (7 → 14) — spreading a perfectly-coded
    * signal across subspaces only adds quantization error
    * (SearchSpec pins both directions).
    */
  def rotateHadamard(df: DataFrame, vecCol: String, out: String,
      inDim: Int, scale: Long = 1000000L): DataFrame = {
    require(inDim > 0 && (inDim & (inDim - 1)) == 0,
      s"inDim must be a power of 2, got $inDim")
    val staged = df.withColumn("_rh_q",
        transform(col(vecCol), x => round(x.cast("double") * scale).cast("long")))
      // fail fast on a dim mismatch: zip_with null-pads a short/long
      // vector, which poisons the aggregate into silent NULL output
      // components that only surface as an obscure non-nullable-decode
      // or null-cosine failure far downstream (in knnJoin/trainPq).
      // A NULL vector is NOT a mismatch — it stays null and flows
      // through the module's degenerate contract (null cosines drop);
      // checking it first also keeps the raise_error message non-null
      // (concat null-propagates)
      .withColumn("_rh_q",
        when(col(vecCol).isNull, lit(null))
          .when(size(col("_rh_q")) === inDim, col("_rh_q"))
          .otherwise(raise_error(concat(
            lit("rotateHadamard: vector length "),
            size(col(vecCol)).cast("string"),
            lit(s" != inDim $inDim")))))
    val comps = (0 until inDim).map { j =>
      val signs = array((0 until inDim).map(i =>
        lit(hadamardSign(i, j) * rpSign(i, -1))): _*)
      aggregate(zip_with(col("_rh_q"), signs, (x, s) => x * s),
        lit(0L), (a, x) => a + x).cast("float")
    }
    staged.withColumn(out, array(comps: _*)).drop("_rh_q")
  }

  private[graft] def hadamardSign(i: Int, j: Int): Long =
    if (java.lang.Integer.bitCount(i & j) % 2 == 0) 1L else -1L

  /** Sign-random-projection signature (Charikar 2002 cosine LSH): bit
    * j of the 63-bit signature is 1 iff the vector's projection onto
    * deterministic hyperplane j is positive — two vectors' signature
    * Hamming distance estimates their ANGLE (P[bit differs] = θ/π),
    * so banded-Hamming blocking over signatures is the embedding
    * analogue of SimHash over token vectors. Same [[rpSign]] ±1
    * hyperplanes and integer quantization as [[randomProject]]
    * (bit-deterministic across engines and partitionings; an SQL
    * oracle recomputes every bit); 63 bits so the signature survives
    * engines whose `<<` rejects the sign bit, splitting into the
    * standard 4×16-bit bands. ONE exchange-free scan, O(d·63)
    * multiplies per row.
    */
  def signSignature63(df: DataFrame, vecCol: String, out: String,
      inDim: Int, scale: Long = 1000000L): DataFrame =
    df.withColumn(out, graft.functions.SrpSignature(col(vecCol),
      srpSignMatrix(inDim, 63), inDim, 63, scale))

  /** Row-major (bits × dim) flattened ±1 sign matrix from [[rpSign]] —
    * the one reference object the native kernel ships.
    */
  private[graft] def srpSignMatrix(inDim: Int, bits: Int): Array[Long] = {
    val m = new Array[Long](bits * inDim)
    var j = 0
    while (j < bits) {
      var i = 0
      while (i < inDim) { m(j * inDim + i) = rpSign(i, j); i += 1 }
      j += 1
    }
    m
  }

  /** Higher-order-function form of [[signSignature63]] — kept as the
    * parity reference for the native [[graft.functions.SrpSignature]]
    * kernel (SearchSpec asserts bit-equality); 63 interpreted
    * array-folds per row, ~10× the kernel's cost.
    */
  private[graft] def signSignature63Hof(df: DataFrame, vecCol: String,
      out: String, inDim: Int, scale: Long = 1000000L): DataFrame = {
    val staged = df.withColumn("_srp_q",
      transform(col(vecCol), x => round(x.cast("double") * scale).cast("long")))
    val bits = (0 until 63).map { j =>
      val signs = array((0 until inDim).map(i => lit(rpSign(i, j))): _*)
      val comp = aggregate(zip_with(col("_srp_q"), signs, (x, s) => x * s),
        lit(0L), (a, x) => a + x)
      when(comp > 0, lit(1L << j)).otherwise(lit(0L))
    }
    staged.withColumn(out, bits.reduce((a, b) => a.bitwiseOR(b)))
      .drop("_srp_q")
  }

  /** The [[signSignature63]] BIGINT expression in DuckDB SQL over a
    * quantized BIGINT list column `q` (1-based list indexing; the sign
    * matrix recomputed from md5 exactly like
    * [[oracleRandomProjectSql]]).
    */
  def oracleSignSignatureSqlExpr(inDim: Int): String =
    (0 until 63).map { j =>
      s"(CASE WHEN list_sum(list_transform(range(0, $inDim), i -> " +
        s"(CASE WHEN ('0x' || substr(md5('rp:' || i || ':' || $j), 1, 1))::BIGINT " +
        s"% 2 = 0 THEN 1 ELSE -1 END) * q[i + 1])) > 0 " +
        s"THEN (1::BIGINT << $j) ELSE 0 END)"
    }.mkString(" + ")

  /** Generated DuckDB oracle for [[randomProject]]: the sign matrix is
    * RECOMPUTED from md5 in SQL (independent of [[rpSign]]'s JVM MD5)
    * and the quantized matmul replayed per output component.
    */
  def oracleRandomProjectSql(table: String, idCol: String, vecCol: String,
      out: String, inDim: Int, outDim: Int, scale: Long = 1000000L): String = {
    val comps = (0 until outDim).map { j =>
      s"list_sum(list_transform(range(0, $inDim), i -> " +
        s"(CASE WHEN ('0x' || substr(md5('rp:' || i || ':' || $j), 1, 1))::BIGINT " +
        s"% 2 = 0 THEN 1 ELSE -1 END) * q[i + 1]))"
    }
    s"WITH qv AS (SELECT $idCol, list_transform($vecCol, x -> " +
      s"CAST(round(CAST(x AS DOUBLE) * $scale) AS BIGINT)) AS q FROM $table) " +
      s"SELECT $idCol, concat_ws(',', ${comps.mkString(", ")}) AS $out FROM qv"
  }

  /** Exact top-k by cosine similarity. orderBy+limit plans as
    * TakeOrderedAndProject: per-partition top-k then a k-row merge on
    * the driver — no full sort, no shuffle of the data. Selection
    * orders on the [[q9]] grid (ties to the ascending id) so the
    * result replays against a DuckDB oracle window ordered the same
    * way; see the [[q9]] scaladoc for why raw-double selection flakes.
    */
  def bruteForceTopK(df: DataFrame, vecCol: String, query: Seq[Double], k: Int,
      idCol: String = "_id"): DataFrame =
    df.withColumn("_score", cosineSim(col(vecCol), query))
      .orderBy(q9Col(col("_score")).desc, col(idCol).asc)
      .limit(k)

  /** The θ-gate threshold on the exact integer-dot scale: two µ-unit
    * vectors' long dot is ≈ cosine·1e12, so `cos ≥ θ` becomes the
    * integer comparison `_qdot ≥ round(θ·1e12)` — a contract no
    * engine, SIMD width, or libm can flip (the r14 lesson applied to
    * the θ-gates: selection keys must not be floats).
    *
    * RESOLUTION near 1: floor(sqrt(norm²)) underestimates the norm by
    * up to 1 µ-unit, so a quantized unit vector's own norm can read
    * slightly ABOVE 1 and near-parallel pairs dot to ≥ 1e12 even when
    * the true cosine is 1 − 5e-7. A θ within ~2e-6 of 1.0 is below
    * the grid's resolving power — use exact-duplicate detection for
    * that band; θ ≤ 1 − 1e-5 behaves as expected. (A θ > the
    * quantized-dot ceiling ~1.000002 excludes everything, exactly.)
    */
  def thetaQ(theta: Double): Long = math.round(theta * 1e12)

  /** All-pairs θ-gate via a broadcast block kernel: the right side is
    * collected (bounded — caller guarantees it fits; at 100 TB this
    * runs per-IVF-cluster, never globally) and each left partition
    * scans it with tight scalar loops. The gate is the EXACT integer
    * dot of µ-unit quantized vectors against [[thetaQ]] — no float
    * exists in the selection (the oracle replays through the shared
    * unit-vector CTE), so the emitted pair SET is bit-stable across
    * engines and fixtures; zero-norm rows are not rankable and emit
    * nothing (same exclusion the float kernel's NaN gate produced).
    */
  def cosinePairsBroadcast(df: DataFrame, vecCol: String, idCol: String,
      threshold: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val tq = thetaQ(threshold)
    val staged = stagedUnitCached(df.select(col(idCol), col(vecCol)), idCol, vecCol)
      .select(col(idCol).cast("long"), col("_uq")).as[(Long, Array[Long])]
    // bounded-collect discipline (the intDotTopK rule): this kernel
    // broadcasts the WHOLE staged set — a direct caller on a big frame
    // would OOM the driver, so refuse loudly past the brute limit and
    // name the auto-switching entry point. The count is the cached
    // row-count (catalog-statistics stand-in), not a fresh job per call.
    val nStaged = graft.pipeline.Dedup.warmRowCount(staged.toDF())
    require(nStaged <= graft.pipeline.Dedup.BruteForcePairLimit,
      s"cosinePairsBroadcast: $nStaged rows exceed the broadcast-kernel " +
        s"bound ${graft.pipeline.Dedup.BruteForcePairLimit}; use " +
        "Dedup.embeddingPairs, which auto-switches to the IVF-bucketed path")
    val right = staged.collect().sortBy(_._1)
    val bc = spark.sparkContext.broadcast(right)
    staged.mapPartitions { it =>
      val r = bc.value
      it.flatMap { case (ida, va) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        var j = 0
        while (j < r.length) {
          val (idb, vb) = r(j)
          if (idb > ida) {
            var d = 0L; var k = 0
            while (k < va.length) { d += va(k) * vb(k); k += 1 }
            if (d >= tq) out += ((ida, idb))
          }
          j += 1
        }
        out
      }
    }.toDF("id_a", "id_b")
  }

  /** IVF (inverted-file) ANN: assign every vector to its nearest of
    * `nlist` centroids once (a write-time artifact at scale), then serve
    * queries by scanning only the `nprobe` nearest clusters. With the
    * cluster id as a partition column, the scan prunes to
    * nprobe/nlist of the data — the strategy that survives 100 TB.
    *
    * Centroids here come from a deterministic sample + iterative Lloyd
    * refinement done with DataFrame aggs (no MLlib dependency needed).
    */
  final case class IvfModel(centroids: Array[Array[Double]])

  def trainIvf(df: DataFrame, vecCol: String, nlist: Int, iters: Int = 3): IvfModel = {
    // Deterministic init: nlist DISTINCT vectors ordered by a hash of
    // the vector (ties broken by the vector itself). A bare limit()
    // takes whatever rows the scan yields first — stable on one parquet
    // file, not across multi-file reads — so centroids (and therefore
    // IVF recall) would drift run-to-run. The hash order makes the
    // pick a deterministic UNIFORM sample of the corpus (a value sort
    // would clump all centroids in one corner of the space and k-means
    // cannot recover in few iterations). distinct is a partial agg
    // (map-side combine) and orderBy+limit plans as TakeOrdered:
    // per-partition top-nlist, tiny driver merge.
    var cents: Array[Array[Double]] = df
      .select(col(vecCol)).distinct()
      .orderBy(xxhash64(col(vecCol)), col(vecCol))
      .limit(nlist).collect()
      .map(_.getSeq[Any](0).map(_.toString.toDouble).toArray)
    var it = 0
    while (it < iters) {
      val assigned = assignCluster(df, vecCol, cents)
      val agg = assigned.groupBy(col("_cluster"))
        .agg(count(lit(1)).as("n"),
          array((0 until cents(0).length).map(i =>
            sum(element_at(col(vecCol), i + 1).cast("double"))): _*).as("sums"))
        .collect()
      val next = cents.clone()
      agg.foreach { r =>
        val cl = r.getInt(0); val n = r.getLong(1).toDouble
        if (n > 0) next(cl) = r.getSeq[Double](2).map(_ / n).toArray
      }
      cents = next
      it += 1
    }
    IvfModel(cents)
  }

  /** Bounded cache of ad-hoc IVF models keyed by source plan + params
    * (declared-index models live in [[IndexCache]]; this covers
    * pipeline-API callers). Centroids are small driver objects — no
    * persisted frames to own.
    */
  private val IvfCacheMax = 16
  private val ivfModelCache =
    new java.util.LinkedHashMap[(String, String, Int), IvfModel](16, 0.75f, false) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String, Int), IvfModel]): Boolean =
        size() > IvfCacheMax
    }

  /** [[trainIvf]] memoized per (source plan, vecCol, nlist) — training
    * is a write-time step; deterministic, so the cache never changes a
    * result.
    */
  def trainIvfCached(df: DataFrame, vecCol: String, nlist: Int,
      iters: Int = 3): IvfModel = {
    val key = (graft.pipeline.Dedup.planKey(df), vecCol, nlist)
    ivfModelCache.synchronized {
      val hit = ivfModelCache.get(key)
      if (hit != null) return hit
    }
    val m = trainIvf(df, vecCol, nlist, iters)
    ivfModelCache.synchronized { ivfModelCache.put(key, m) }
    graft.pipeline.Scratch.noteBuild("ivfModel")
    m
  }

  /** Calibrated probe counts per ad-hoc artifact + (k, target) —
    * declared-index calibrations live in [[IndexCache.probes]].
    */
  private val ivfNprobeCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String, Int, Int, Double), Int]()

  /** [[calibrateNprobe]] memoized per (artifact, k, target). */
  def calibrateNprobeCached(corpus: DataFrame, vecCol: String, idCol: String,
      model: IvfModel, k: Int, targetRecall: Double,
      calibQueries: DataFrame): Int = {
    val key = (graft.pipeline.Dedup.planKey(corpus), vecCol,
      model.centroids.length, k, targetRecall)
    val hit = ivfNprobeCache.get(key)
    if (hit != 0) hit
    else {
      graft.pipeline.Scratch.noteBuild("ivfNprobeCalibration")
      val np = calibrateNprobe(corpus, vecCol, idCol, model, k,
        targetRecall, calibQueries)
      ivfNprobeCache.putIfAbsent(key, np)
      np
    }
  }

  /** Nearest-centroid id as a column. The native expression carries the
    * centroid matrix as ONE reference object (graft.functions
    * .NearestCentroid), so codegen stays a fixed-size loop at any nlist —
    * the literal-array argmin it replaces built a ~260k-node expression
    * tree at nlist=4096 × dim=64 and fell out of codegen entirely.
    */
  def assignCluster(df: DataFrame, vecCol: String, cents: Array[Array[Double]]): DataFrame =
    df.withColumn("_cluster", graft.functions.NearestCentroid(col(vecCol), cents))

  /** Batch k-NN join: for every row of `queries`, the `k` most
    * cosine-similar rows of `corpus` (selection ordered on the [[q9]]
    * 1e-9 grid, ties broken by ascending neighbor id; the query row
    * itself excluded when `excludeSelf`).
    *
    * Plan shape for 100 TB: the query set is broadcast (bounded — it is
    * the batch being enriched, not the corpus), each corpus partition
    * keeps a k-bounded heap PER QUERY (map-side top-k combine), and
    * only numPartitions × k candidates per query reach the final
    * rank — one full corpus scan, no corpus shuffle, the same
    * TakeOrdered discipline as bruteForceTopK generalized to a query
    * batch. Arithmetic matches cosineSimCols (left-to-right double
    * accumulation); selection compares on the quantized grid so ranks
    * replay against a DuckDB window ordered
    * `CAST(round(c·1e9) AS BIGINT) DESC, id` — see [[q9]] for why
    * raw-double selection is not replay-safe.
    *
    * Output: (query_id, neighbor_id, rank), rank 1-based.
    */
  def knnJoin(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, k: Int, excludeSelf: Boolean = true): DataFrame =
    knnJoinPruned(corpus, queries, vecCol, idCol, k, excludeSelf, None, 0)

  /** [[knnJoin]] plus the similarity the kernel computed: `_score`
    * (the raw double, bit-equal with [[cosineSimCols]] — parity-spec'd
    * in SearchSpec) and `_qscore` (the [[q9]]-quantized long the
    * selection itself ordered on). Both kernels already hold these
    * (the heap entries / the `_sim` window key), so consumers that
    * need the value — isolation scoring, margin mining, rerankers —
    * read them here instead of joining the vector table back and
    * re-evaluating the cosine per candidate. Downstream sums/argmaxes
    * should consume `_qscore`: it is the SAME key the top-k selection
    * used, so the candidate set and the arithmetic over it replay
    * together. */
  def knnJoinScored(corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int,
      excludeSelf: Boolean = true, model: Option[IvfModel] = None,
      nprobe: Int = 0): DataFrame =
    knnJoinPruned(corpus, queries, vecCol, idCol, k, excludeSelf, model,
      nprobe, keepScore = true)

  /** [[knnJoin]] plus both sides' `labelCol` (string-cast) as
    * `query_label` / `neighbor_label` — the labels already ride the
    * kernel's scan when a consumer needs them (the hardNegatives
    * machinery), so label-keyed analyses (kNN purity, leakage audits)
    * read them here instead of joining the corpus back TWICE per
    * analysis. Same selection contract as [[knnJoin]]; same
    * auto-escalation to the distributed join.
    */
  def knnJoinLabeled(corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, labelCol: String, k: Int,
      excludeSelf: Boolean = true): DataFrame =
    knnJoinPruned(corpus, queries, vecCol, idCol, k, excludeSelf, None, 0,
      keepLabelCol = Some(labelCol))

  /** IVF-pruned batch k-NN join: like knnJoin, but corpus rows are only
    * scored against queries whose `nprobe` nearest centroids include
    * the row's cluster. With the cluster id as a partition column the
    * scan itself prunes to the union of probed clusters; here the
    * pruning cuts scoring work (the dominant cost at high dim).
    */
  def knnJoinIvf(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, k: Int, model: IvfModel, nprobe: Int,
      excludeSelf: Boolean = true): DataFrame =
    knnJoinPruned(corpus, queries, vecCol, idCol, k, excludeSelf,
      Some(model), nprobe)

  /** Hard-negative mining for contrastive training: each query's top-k
    * nearest corpus rows whose `labelCol` DIFFERS from the query's —
    * the highest-similarity wrong-class examples that make the most
    * informative negatives. One corpus scan with the label check
    * inside the same per-partition heap kernel as [[knnJoin]] (not one
    * filtered scan per label); an over-cap query side reroutes to the
    * distributed cluster-join with the identical null-safe exclusion.
    * Label equality is null-safe: equal labels (null == null included)
    * are never negatives; null vs non-null survives.
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, labelCol: String, k: Int): DataFrame =
    knnJoinPruned(corpus, queries, vecCol, idCol, k, excludeSelf = true,
      None, 0, Some(labelCol))

  /** k-th-neighbor isolation score — the classic distance-based
    * outlier signal (Ramaswamy et al., SIGMOD 2000) in cosine form: a
    * row whose k-th nearest neighbor is already far (low cosine) sits
    * in no local cluster — mislabeled rows, embedding-model failures,
    * and off-distribution junk surface at the low end, while the high
    * end flags redundancy. One [[knnJoinScored]] scan (auto-escalating)
    * — the rank-k row's `_qscore` IS the output (no vector join-back,
    * no cosine re-evaluation): the kernel's 1e-9-quantized selection
    * key, so downstream order/limit replays on any engine. Returns
    * (id, kth_qcos) for every row WITH a rank-k neighbor: a corpus of
    * n ≤ k rows has none (each row sees only n−1 non-self neighbors)
    * and such rows are absent from the output, so callers reading
    * "absent == fine" must ensure n > k. Degenerate (zero-norm/NaN)
    * rows are absent too — the knn kernels exclude them on both
    * sides, so they neither receive a rank-k score nor displace a
    * healthy row's true k-th neighbor.
    */
  def kthNeighborScore(df: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    knnJoinScored(df, df, vecCol, idCol, k).where(col("rank") === k)
      .select(col("query_id").as(idCol), col("_qscore").as("kth_qcos"))
  }

  /** The SCALE path of [[kthNeighborScore]]: every corpus row is a
    * query, so the exact form is inherently O(n²) (the one knn shape
    * whose query side is never "a bounded batch" — measured: d2 = 8.8×
    * on 10× rows in SCALING3_r13, the exact kernel's documented brute
    * band). Here the k-th-neighbor search probes only each row's
    * `nprobe` nearest IVF clusters — work drops to ~n²·nprobe/nlist
    * and, with the cluster id as a stored partition column, the scan
    * itself prunes. Approximate by the same trade as every IVF tier:
    * a missed true neighbor can only INFLATE a row's isolation score
    * (the k-th-best found is a lower bound on similarity), so the
    * outlier set it surfaces is a superset-biased estimate — calibrate
    * `nprobe` with [[calibrateNprobe]] exactly like the serving paths
    * (the q_embed_outlier_ivf gate pins bottom-k overlap ≥ 0.8 at the
    * calibrated probe count).
    */
  def kthNeighborScoreIvf(df: DataFrame, idCol: String, vecCol: String,
      k: Int, model: IvfModel, nprobe: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    knnJoinScored(df, df, vecCol, idCol, k, excludeSelf = true,
        model = Some(model), nprobe = nprobe)
      .where(col("rank") === k)
      .select(col("query_id").as(idCol), col("_qscore").as("kth_qcos"))
  }

  /** Batch top-k by EXACT integer dot product over pre-quantized
    * `array<long>` vectors (the [[l2NormalizeQuantized]] µ-unit form).
    * Same plan shape as [[knnJoin]] — the bounded query batch is
    * broadcast, each corpus partition keeps a k-bounded heap per query
    * (map-side top-k combine), only numPartitions·k candidates per
    * query reach the final window; an over-cap query side reroutes to
    * the distributed cluster join (exact: every cluster probed).
    *
    * The difference from the cosine kernels is the CONTRACT: the
    * selection key `_qdot` is a pure long function of the input longs
    * — no float is computed anywhere, so the key is bit-identical on
    * any engine, SIMD width, FMA setting, or summation order. This is
    * what closes the cross-binary oracle flake the q9 grid could only
    * narrow (r13 driver artifact: candidates measured 1.4e-13-in-
    * cosine from a q9 boundary — a different DuckDB build's
    * `list_cosine_similarity` diverges by more than that and flips a
    * cell; an integer dot cannot drift at all). Output:
    * (query_id, neighbor_id, rank, _qdot), rank 1-based on
    * (_qdot DESC, neighbor_id ASC).
    *
    * Exactness needs HEADROOM: the long fold is only exact while
    * max|c|·max|q|·dim < 2^63 (µ-unit vectors sit 6 orders below it;
    * unnormalized callers own the bound). The kernel VERIFIES it —
    * the hits()-style fail-loudly rule: a JVM long wraps silently
    * where the DuckDB oracle errors on HUGEINT→BIGINT overflow, so an
    * over-headroom fixture would hash-diverge engine-side with no
    * error. max|q| comes free from the already-collected batch; each
    * corpus row checks its own max|component| once (O(dim), amortized
    * into the scan that reads the vector anyway) and throws with the
    * measured magnitudes.
    */
  def intDotTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      qvecCol: String, k: Int, excludeSelf: Boolean = false,
      excludeLabelCol: Option[String] = None,
      keepLabelCol: Option[String] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = corpus.sparkSession
    import spark.implicits._
    val labelSource = excludeLabelCol.orElse(keepLabelCol)
    val labelExpr = labelSource.map(l => col(l).cast("string"))
      .getOrElse(lit(null).cast("string"))
    val maxBatch = knnQueryBatchMax(spark)
    val qsRaw = queries
      .select(col(idCol).cast("long"), col(qvecCol), labelExpr)
      .limit(maxBatch + 1).as[(Long, Array[Long], String)].collect()
    if (qsRaw.length > maxBatch) {
      knnEscalations.incrementAndGet()
      return intDotTopKDistributed(corpus, queries, idCol, qvecCol, k,
        excludeSelf, excludeLabelCol, keepLabelCol)
    }
    val qs = qsRaw.sortBy(_._1)
    val absL = (x: Long) =>
      if (x == Long.MinValue) Long.MaxValue else math.abs(x)
    val maxQ = qs.iterator.flatMap(_._2.iterator).map(absL)
      .foldLeft(0L)(_ max _)
    val dimB = qs.iterator.map(_._2.length).foldLeft(1)(_ max _)
    val compCap = Long.MaxValue / dimB / math.max(maxQ, 1L)
    val bcQ = spark.sparkContext.broadcast(qs.map { case (id, v, _) => (id, v) })
    val bcL = spark.sparkContext.broadcast(
      if (excludeLabelCol.isDefined) qs.map(_._3) else null)
    val bcQL = spark.sparkContext.broadcast(
      if (keepLabelCol.isDefined) qs.map(_._3) else null)
    // worst-first: pop = lowest dot, then highest id (the entry the
    // next candidate must beat under (dot DESC, id ASC) selection)
    val worstFirst = Ordering.by[(Long, Long, String), (Long, Long)] {
      case (d, id, _) => (-d, id)
    }
    val partial = corpus
      .select(col(idCol).cast("long"), col(qvecCol), labelExpr)
      .as[(Long, Array[Long], String)].mapPartitions { it =>
        val q = bcQ.value; val ql = bcL.value; val qkl = bcQL.value
        val heaps = Array.fill(q.length)(
          new scala.collection.mutable.PriorityQueue[(Long, Long, String)]()(worstFirst))
        it.foreach { case (cid, cv, clbl) =>
          var m = 0L; var cj = 0
          while (cj < cv.length) {
            val ax = if (cv(cj) == Long.MinValue) Long.MaxValue
              else math.abs(cv(cj))
            if (ax > m) m = ax
            cj += 1
          }
          if (m > compCap) throw new IllegalArgumentException(
            s"intDotTopK: corpus row $cid component magnitude $m exceeds " +
              s"exact-dot headroom (need max|c|*max|q|*dim < 2^63; " +
              s"max|q|=$maxQ, dim=$dimB) — the long fold would wrap " +
              "silently while the oracle errors; rescale the quantization")
          var qi = 0
          while (qi < q.length) {
            val (qid, qv) = q(qi)
            // null-safe label exclusion mirrors the float kernel: equal
            // labels (null == null included) are never negatives
            val labelOk = ql == null || ql(qi) != clbl
            if (labelOk && !(excludeSelf && cid == qid)) {
              var d = 0L; var j = 0
              while (j < qv.length) { d += cv(j) * qv(j); j += 1 }
              val h = heaps(qi)
              if (h.size < k) h.enqueue((d, cid, clbl))
              else {
                val w = h.head
                if (d > w._1 || (d == w._1 && cid < w._2)) {
                  h.dequeue(); h.enqueue((d, cid, clbl))
                }
              }
            }
            qi += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          h.iterator.map { case (d, cid, nl) =>
            (q(qi)._1, cid, d, if (qkl == null) null else qkl(qi), nl)
          }
        }
      }.toDF("query_id", "neighbor_id", "_qdot",
        "query_label", "neighbor_label")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("_qdot").desc, col("neighbor_id").asc)
    val ranked = partial.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
    val keep = Seq(col("query_id"), col("neighbor_id"), col("rank"),
      col("_qdot")) ++
      (if (keepLabelCol.isDefined)
        Seq(col("query_label"), col("neighbor_label")) else Nil)
    ranked.select(keep: _*)
  }

  /** The over-cap reroute of [[intDotTopK]]: co-partition both sides
    * on a cluster id from an IVF model over the float view of the
    * quantized vectors, probing ALL clusters — the model only decides
    * WHERE pairs meet (an equi-join instead of a driver broadcast),
    * never WHETHER they meet, so ranks are bit-equal to the broadcast
    * kernel (same exact long key, same id tie-break). Same discipline
    * as [[knnJoinDistributed]] at nprobe = nlist.
    */
  private def intDotTopKDistributed(corpus: DataFrame, queries: DataFrame,
      idCol: String, qvecCol: String, k: Int, excludeSelf: Boolean,
      excludeLabelCol: Option[String] = None,
      keepLabelCol: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val labelExpr = excludeLabelCol.orElse(keepLabelCol)
      .map(l => col(l).cast("string")).getOrElse(lit(null).cast("string"))
    // Same headroom rule as the broadcast kernel, one small agg per
    // side (negligible next to the all-cluster join this path runs).
    // mirrors the broadcast path's absL: non-ANSI abs(Long.MinValue)
    // returns Long.MinValue (negative — invisible to greatest/max),
    // so that one value maps to MaxValue explicitly; both paths now
    // enforce the identical headroom contract
    val absMaxE = (c: Column) =>
      aggregate(transform(c, x =>
          when(x === Long.MinValue, Long.MaxValue).otherwise(abs(x))),
        lit(0L), (a, x) => greatest(a, x))
    val qStat = queries.agg(max(absMaxE(col(qvecCol))).as("m"),
      max(size(col(qvecCol))).as("d")).head
    val cStat = corpus.agg(max(absMaxE(col(qvecCol))).as("m")).head
    if (!qStat.isNullAt(0) && !cStat.isNullAt(0)) {
      val mq = math.max(qStat.getLong(0), 1L)
      val d = math.max(qStat.getInt(1), 1)
      require(cStat.getLong(0) <= Long.MaxValue / d / mq,
        s"intDotTopK(distributed): max|c|=${cStat.getLong(0)} exceeds " +
          s"exact-dot headroom (max|q|=$mq, dim=$d; need the product " +
          "under 2^63) — rescale the quantization")
    }
    val fv = (c: Column) =>
      transform(c, x => (x.cast("double") / 1000000.0).cast("float"))
    val cf = corpus.select(col(idCol).cast("long").as("neighbor_id"),
        col(qvecCol).as("_nv"), labelExpr.as("_nl"))
      .withColumn("_fv", fv(col("_nv")))
    val model = trainIvfCached(cf, "_fv", corpus.sparkSession.conf
      .get("graft.search.knnEscalateNlist", "64").toInt)
    val nlist = model.centroids.length
    val c = assignCluster(cf, "_fv", model.centroids).drop("_fv")
    val q = queries.select(col(idCol).cast("long").as("query_id"),
        col(qvecCol).as("_qv"), labelExpr.as("_ql"))
      .withColumn("_cluster", explode(sequence(lit(0), lit(nlist - 1))))
    val scored = q.join(c, Seq("_cluster"))
      .where(if (excludeSelf) col("query_id") =!= col("neighbor_id")
        else lit(true))
      .where(if (excludeLabelCol.isDefined) !(col("_ql") <=> col("_nl"))
        else lit(true))
      .withColumn("_qdot", intDotCol(col("_qv"), col("_nv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("_qdot").desc, col("neighbor_id").asc)
    val ranked = scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
    val keep = Seq(col("query_id"), col("neighbor_id"), col("rank"),
      col("_qdot")) ++
      (if (keepLabelCol.isDefined) Seq(col("_ql").as("query_label"),
        col("_nl").as("neighbor_label")) else Nil)
    ranked.select(keep: _*)
  }

  /** Stage µ-unit integer vectors for the integer-dot knn family: rows
    * with non-finite or zero-norm vectors are dropped (not rankable —
    * mirrors the float kernels' degenerate exclusion; the oracle
    * mirrors with `WHERE nrm > 0`), every survivor carries `_uq` = the
    * exact [[l2NormalizeQuantized]] unit vector. `extra` columns ride
    * along (labels).
    */
  private[graft] def stagedUnit(df: DataFrame, idCol: String, vecCol: String,
      extra: Seq[String] = Nil): DataFrame =
    // both degenerate gates test the RAW column, BEFORE staging: a
    // zero-norm row is exactly one whose every component quantizes to
    // 0 (|round(x·1e6)| < 1), so the test needs none of the staged
    // arithmetic. Filtering on `_uq` instead looks equivalent but is a
    // measured 5× slowdown: predicate pushdown substitutes the alias,
    // inlining the whole O(dim) normalize chain under the filter's
    // per-element lambda — the l2NormalizeQuantizedStaged scaladoc's
    // inlined-expression quadratic class, resurrected by the optimizer
    l2NormalizeQuantizedStaged(
        df.where(finiteVec(col(vecCol)) && exists(col(vecCol),
          x => abs(round(x.cast("double") * 1000000L)) >= 1L)),
        vecCol, "_uq")
      .select((idCol +: "_uq" +: extra).map(col): _*)

  /** [[stagedUnit]] with the staged frame pinned (MEMORY_AND_DISK,
    * plan-keyed, FIFO-bounded like GraphAlgos.projCache): the µ-unit
    * corpus is WRITE-TIME material — at 100 TB it is a materialized
    * column next to the embeddings, not per-query work — and the
    * analytics family (knn/margins/outlier/purity/eval/mmr) re-reads
    * the same staged corpus a dozen times per session. Streaming
    * micro-batches churn keys through the FIFO harmlessly (an evicted
    * entry recomputes its one-scan lineage; no correctness loss).
    */
  private[graft] def stagedUnitCached(df: DataFrame, idCol: String,
      vecCol: String, extra: Seq[String] = Nil): DataFrame = {
    val key = (graft.pipeline.Dedup.planKey(df), idCol, vecCol,
      extra.mkString(","))
    var built: DataFrame = null
    val e = unitCache.synchronized {
      val hit = unitCache.get(key)
      if (hit != null) hit
      else {
        // persist PRE-PARTITIONED on the id: the family's consumers
        // join the staged corpus on idCol (asgn joins, pair joins), so
        // the one build-time exchange here buys exchange-free joins on
        // every read — the bucketed-by-id layout the materialized
        // column would have at 100 TB
        built = stagedUnit(df, idCol, vecCol, extra)
          .repartition(col(idCol))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        unitCache.put(key, built)
        graft.pipeline.Scratch.noteBuild("stagedUnit")
        built
      }
    }
    if (e eq built) e.count()
    e
  }

  // LRU (accessOrder = true), 24 entries. The r17 cache-build ledger
  // caught the old 8-entry INSERTION-order FIFO churning: the
  // embedding suite stages more than 8 distinct frames (corpus,
  // src/tgt halves, augmented unions...), so a hot entry was evicted
  // by 8 newer inserts even while being read every rep —
  // q_embed_margin_mine_ivf alone rebuilt its staging 10× across one
  // bench (3 reps), paying the build exchange each time. Access-order
  // keeps hot entries; 24 bounds the simultaneous staging footprint
  // (each entry is a bucketed id+unit-vector projection persisted
  // MEMORY_AND_DISK — spillable; eviction still unpersists).
  private val UnitCacheMax = 24
  private val unitCache =
    new java.util.LinkedHashMap[(String, String, String, String), DataFrame](
      32, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String, String, String), DataFrame]): Boolean = {
        val evict = size() > UnitCacheMax
        if (evict) e.getValue.unpersist(false)
        evict
      }
    }

  /** [[knnJoin]] on the INTEGER-DOT contract: ranks by the exact long
    * dot product of [[l2NormalizeQuantized]] µ-unit vectors (`_qdot`
    * ≈ cosine·1e12) instead of the q9-quantized float cosine. Use this
    * for every analytics query whose OUTPUT exposes the selected set
    * or a score-derived value (purity sums, isolation scores, eval
    * ranks, mined pairs): the boundary audit measured q9-grid
    * candidates ~1.5e-6 grid units from a rounding boundary on the
    * real corpus, so a cross-binary last-ULP cosine drift can flip a
    * cell — the integer key cannot drift at all. The float kernels
    * remain the serving-tier contract (raw cosine semantics,
    * recall-gated). Same plan shape: one corpus scan, per-partition
    * k-heaps, auto-escalation past the query-batch cap.
    */
  def intKnnJoin(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, excludeSelf: Boolean = true): DataFrame =
    intDotTopK(stagedUnitCached(corpus, idCol, vecCol),
      stagedUnitCached(queries, idCol, vecCol), idCol, "_uq", k, excludeSelf)

  /** [[knnJoinLabeled]] on the integer-dot contract — both sides'
    * labels ride the kernel scan for purity/leakage analyses. */
  def intKnnJoinLabeled(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, labelCol: String, k: Int,
      excludeSelf: Boolean = true): DataFrame =
    intDotTopK(stagedUnitCached(corpus, idCol, vecCol, Seq(labelCol)),
      stagedUnitCached(queries, idCol, vecCol, Seq(labelCol)), idCol, "_uq", k,
      excludeSelf, keepLabelCol = Some(labelCol))

  /** [[hardNegatives]] on the integer-dot contract — top-k nearest
    * DIFFERENT-label rows per query, null-safe label gate inside the
    * heap kernel. */
  def intHardNegatives(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, labelCol: String, k: Int): DataFrame =
    intDotTopK(stagedUnitCached(corpus, idCol, vecCol, Seq(labelCol)),
      stagedUnitCached(queries, idCol, vecCol, Seq(labelCol)), idCol, "_uq", k,
      excludeSelf = true, excludeLabelCol = Some(labelCol))

  /** [[kthNeighborScore]] on the integer-dot contract: (id, kth_qdot)
    * where `kth_qdot` is the exact integer dot of the rank-k neighbor
    * — the isolation score a cleaning pipeline exposes, now a pure
    * integer function of the parquet bytes. */
  def intKthNeighborScore(df: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    intKnnJoin(df, df, idCol, vecCol, k).where(col("rank") === k)
      .select(col("query_id").as(idCol), col("_qdot").as("kth_qdot"))
  }

  /** Margin-based parallel-pair mining (Artetxe & Schwenk, ACL 2019 —
    * the bitext-mining criterion behind CCMatrix/LASER corpora): a
    * raw cosine threshold can't separate true translation pairs from
    * hubs (rows cosine-close to EVERYTHING), so each candidate is
    * scored against the competition — here the DIFFERENCE margin
    * `score(x,y) − (avgK_fwd(x) + avgK_bwd(y))/2`, computed as
    * `margin_q = 2k·qc(x,y) − ΣtopK_fwd(x) − ΣtopK_bwd(y)` (2k clears
    * both /k and /2; ordering is unchanged).
    *
    * The score is the EXACT INTEGER dot product of
    * [[l2NormalizeQuantized]] µ-unit vectors (≈ cosine·1e12) — no
    * float exists anywhere in the contract, so candidate sets, sums,
    * margins and argmaxes are pure integer functions of the parquet
    * bytes, identical on any engine/build/SIMD width. (History: r12
    * selected on raw doubles and flaked at a rank-4 ULP tie; r13
    * quantized the cosine on the q9 grid, which closed same-binary
    * replay but left candidates measured 1.4e-13-in-cosine from a
    * grid boundary — a DIFFERENT DuckDB build diverges past that and
    * flips a cell. Removing the float closes the class.)
    *
    * Top-k selection on both directions is the [[intDotTopK]] kernel
    * (same 100 TB shape as the knn family: broadcast heaps
    * auto-escalating to the distributed cluster join), then bounded
    * candidate-set joins (≤ n·k rows) and one integer window per
    * source. Degenerate (zero-norm/non-finite) vectors never enter a
    * candidate set; headroom: |qc| ≤ 1e12, so k=4 sums and 2k·qc stay
    * 6 decimal orders below 2^63 (the oracle's HUGEINT sums cast back
    * to BIGINT losslessly). Emits each source's best target by
    * (margin_q DESC, tgt id): positive margin ⇒ the match stands out
    * above x's and y's respective neighborhoods.
    */
  def marginMiningQuantized(src: DataFrame, tgt: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame =
    marginFrames(src, tgt, idCol, vecCol, k) match {
      case (f, _) => bestPer(f, "src_id", "tgt_id")
    }

  /** The stricter MUTUAL-best criterion (the CCMatrix "max" mining
    * strategy): a pair survives only when the target is the source's
    * margin argmax AND the source is the target's — one-directional
    * bests (a source whose favorite target prefers some other source)
    * are exactly the mining false positives the intersection exists
    * to drop. Same margins, same sums; one extra window over the
    * backward candidates + an equi-join of the two argmax sets.
    */
  def marginMiningMutual(src: DataFrame, tgt: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val (f, b) = marginFrames(src, tgt, idCol, vecCol, k)
    bestPer(f, "src_id", "tgt_id")
      .join(bestPer(b, "tgt_id", "src_id")
        .select(col("src_id"), col("tgt_id")), Seq("src_id", "tgt_id"))
  }

  /** Margin mining over IVF-pruned candidates — the Artetxe & Schwenk
    * production recipe (they mine margins over ANN candidate lists,
    * not all pairs; CCMatrix runs exactly this at web scale). The
    * exact miner ([[marginMiningQuantized]]) scores |src|·|tgt| pairs
    * — SCALING4 measured its quadratic asymptote at 30× rows; this
    * form prunes candidate GENERATION to each query's `nprobe` of
    * `nlist` nearest clusters (~nprobe/nlist of the scoring work,
    * linear-ish at fixed cluster occupancy) while keeping EVERY
    * exposed decision on the exact integer-dot contract: clusters
    * decide only WHERE candidates come from (recall, gated by the
    * overlap query), the long dot decides ranks, sums, margins, and
    * the per-source argmax. Fully distributed — both sides stay
    * frames (cluster equi-join), no driver batch collect, so this is
    * also the shape for corpus×corpus mining where the broadcast
    * kernels' bounded-batch contract doesn't apply.
    *
    * Output: `(src_id, tgt_id, margin_q)` — each source's best target
    * by the integer margin over its pruned candidates, the same
    * `2k·qc − Σa − Σb` arithmetic as the exact miner (sums over the
    * pruned candidate sets, as the ANN-mining recipe defines them).
    */
  def marginMiningIvf(src: DataFrame, tgt: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int, nprobe: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(nprobe >= 1 && nprobe <= nlist,
      s"nprobe must be in [1, nlist=$nlist], got $nprobe")
    val fModel = trainIvfCached(tgt.withColumnRenamed(idCol, "_id")
      .withColumnRenamed(vecCol, "_v"), "_v", nlist)
    val f = ivfTopKCandidates(tgt, src, idCol, vecCol, k, fModel, nprobe,
        excludeSelf = false)
      .select(col("query_id").as("src_id"),
        col("neighbor_id").as("tgt_id"), col("_qdot").as("_qc"))
    val bModel = trainIvfCached(src.withColumnRenamed(idCol, "_id")
      .withColumnRenamed(vecCol, "_v"), "_v", nlist)
    val b = ivfTopKCandidates(src, tgt, idCol, vecCol, k, bModel, nprobe,
        excludeSelf = false)
      .select(col("query_id").as("tgt_id"),
        col("neighbor_id").as("src_id"), col("_qdot").as("_qc"))
    val sumA = f.groupBy(col("src_id")).agg(sum(col("_qc")).as("_sa"))
    val sumB = b.groupBy(col("tgt_id")).agg(sum(col("_qc")).as("_sb"))
    val m = f.join(sumA, "src_id").join(sumB, "tgt_id")
      .withColumn("margin_q",
        lit(2L * k) * col("_qc") - col("_sa") - col("_sb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src_id"))
      .orderBy(col("margin_q").desc, col("tgt_id").asc)
    m.withColumn("_rn", row_number().over(w)).where(col("_rn") === 1)
      .select(col("src_id"), col("tgt_id"), col("margin_q"))
  }

  /** Two-stage margin mining: PQ-ADC candidate generation → exact
    * integer re-rank — the full CCMatrix production recipe for the
    * case [[marginMiningIvf]] leaves open: probed clusters that are
    * THEMSELVES huge, where even the within-cluster exact dot per
    * candidate is the cost driver. Stage 1 scans CODES only (the
    * codegen'd [[graft.functions.PqAdcScore]] — m byte lookups per
    * row instead of a dim-long dot; at 100 TB the code column is
    * written at ingest) and keeps each query's top-`cand` candidates;
    * stage 2 re-ranks those `cand` rows per query on the EXACT long
    * dot of µ-unit vectors and takes top-k — so ADC's float error can
    * only shape the candidate POOL (recall, gated by the caller's
    * overlap query, the keep_ivf/mine_ivf pattern), while ranks,
    * sums, margins, and the per-source argmax are all flip-immune
    * integers. `cand > k` is the refinement headroom (the
    * [[calibrateRefine]] knob): ADC mis-ranks inside the pool are
    * harmless as long as the true top-k survive the cut.
    *
    * Candidate generation composes with IVF at scale: pass
    * `ivfNlist > 0` (with a calibrated `nprobe`) and stage 1 runs the
    * probed [[pqKnnJoinIvf]] mask — cluster pruning decides WHICH
    * codes are scored, ADC decides what scoring a code COSTS, and the
    * exact integer re-rank still owns every exposed number. With
    * `nprobe == ivfNlist` the masks cover the corpus and the output
    * is bit-equal to the unpruned form (spec-pinned).
    *
    * Output: `(src_id, tgt_id, margin_q)` — the [[marginMiningIvf]]
    * contract with sums over the PQ-refined candidate sets.
    */
  def marginMiningPq(src: DataFrame, tgt: DataFrame, idCol: String,
      vecCol: String, k: Int, cand: Int, m: Int = 8,
      ks: Int = 256, ivfNlist: Int = 0, nprobe: Int = 0): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(cand >= k, s"cand must be >= k, got cand=$cand k=$k")
    require(ivfNlist >= 0, s"ivfNlist must be >= 0, got $ivfNlist")
    require(ivfNlist == 0 || (nprobe >= 1 && nprobe <= ivfNlist),
      s"nprobe must be in [1, ivfNlist], got nprobe=$nprobe ivfNlist=$ivfNlist")
    import org.apache.spark.sql.expressions.Window
    // top-`cand` ADC candidates of each query over the other side's
    // codes, re-ranked to top-k on the exact integer dot
    def refined(corpus: DataFrame, queries: DataFrame, qOut: String,
        nOut: String): DataFrame = {
      val cRen = corpus.select(col(idCol).as("_pid"), col(vecCol).as("_pv"))
      val qRen = queries.select(col(idCol).as("_pid"), col(vecCol).as("_pv"))
      val (model, enc) = trainEncodePqCached(cRen, "_pv", m, ks)
      val pool =
        if (ivfNlist == 0)
          pqKnnJoin(enc, qRen, "_pv", "_pid", k = cand, model,
            refine = 1, excludeSelf = false)
        else
          pqKnnJoinIvf(enc, qRen, "_pv", "_pid", k = cand, model,
            trainIvfCached(cRen, "_pv", ivfNlist), nprobe,
            refine = 1, excludeSelf = false)
      val qU = stagedUnitCached(queries.select(col(idCol), col(vecCol)),
          idCol, vecCol)
        .select(col(idCol).cast("long").as("query_id"), col("_uq").as("_qu"))
      val nU = stagedUnitCached(corpus.select(col(idCol), col(vecCol)),
          idCol, vecCol)
        .select(col(idCol).cast("long").as("neighbor_id"),
          col("_uq").as("_nu"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("_qdot").desc, col("neighbor_id").asc)
      pool.select(col("query_id"), col("neighbor_id"))
        .join(qU, "query_id").join(nU, "neighbor_id")
        .withColumn("_qdot", intDotCol(col("_qu"), col("_nu")))
        .withColumn("_rk", row_number().over(w))
        .where(col("_rk") <= k)
        .select(col("query_id").as(qOut), col("neighbor_id").as(nOut),
          col("_qdot").as("_qc"))
    }
    val f = refined(tgt, src, "src_id", "tgt_id")
    val b = refined(src, tgt, "tgt_id", "src_id")
    val sumA = f.groupBy(col("src_id")).agg(sum(col("_qc")).as("_sa"))
    val sumB = b.groupBy(col("tgt_id")).agg(sum(col("_qc")).as("_sb"))
    val mg = f.join(sumA, "src_id").join(sumB, "tgt_id")
      .withColumn("margin_q",
        lit(2L * k) * col("_qc") - col("_sa") - col("_sb"))
    val w = Window.partitionBy(col("src_id"))
      .orderBy(col("margin_q").desc, col("tgt_id").asc)
    mg.withColumn("_rn", row_number().over(w)).where(col("_rn") === 1)
      .select(col("src_id"), col("tgt_id"), col("margin_q"))
  }

  /** The IVF-pruned integer-dot top-k candidate join behind
    * [[marginMiningIvf]]: corpus rows carry their cluster (float
    * assignment — write-time material at scale), queries explode to
    * their `nprobe` nearest centroids (distances computed in-plan
    * against the centroid literal — no collect on EITHER side), the
    * cluster equi-join meets candidates, and the exact long dot ranks
    * them (top-k per query, `_qdot DESC, neighbor_id ASC` — the
    * intDotTopK selection contract verbatim). Returns
    * (query_id, neighbor_id, rank, _qdot).
    */
  private def ivfTopKCandidates(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, model: IvfModel,
      nprobe: Int, excludeSelf: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val centsLit = typedLit(model.centroids.map(_.toSeq).toSeq)
    val vecD = (c: Column) => transform(c, x => x.cast("double"))
    val cU = stagedUnitCached(corpus.select(col(idCol), col(vecCol)), idCol, vecCol)
    val cAsgn = assignCluster(corpus.select(col(idCol).as("_cid2"),
        col(vecCol).as("_v")), "_v", model.centroids)
      .select(col("_cid2"), col("_cluster"))
    val cSide = cU.join(cAsgn, col(idCol) === col("_cid2"))
      .select(col(idCol).cast("long").as("neighbor_id"),
        col("_uq").as("_nu"), col("_cluster"))
    val qU = stagedUnitCached(queries.select(col(idCol), col(vecCol)), idCol,
      vecCol, extra = Seq(vecCol))
    // nprobe nearest centroids, in-plan: (dist, idx) structs sorted
    // ascending — struct comparison breaks float-distance ties by the
    // centroid index, deterministically
    val distIdx = zip_with(centsLit,
      sequence(lit(0), lit(model.centroids.length - 1)),
      (c, i) => struct(
        aggregate(zip_with(c, vecD(col(vecCol)), (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x).as("d"),
        i.as("i")))
    val qSide = qU
      .withColumn("_ds", transform(array_sort(distIdx), s => s.getField("i")))
      .withColumn("_cluster", explode(slice(col("_ds"), 1, nprobe)))
      .select(col(idCol).cast("long").as("query_id"),
        col("_uq").as("_qu"), col("_cluster"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("_qdot").desc, col("neighbor_id").asc)
    // self-exclusion is the CALLER's contract: the exact miner
    // (marginFrames → intDotTopK(excludeSelf=false)) KEEPS same-id
    // src/tgt candidates — distinct corpora may share numeric id
    // spaces — so marginMiningIvf passes false to preserve the
    // documented nprobe=nlist bit-equality with the exact form
    val met = qSide.join(cSide, Seq("_cluster"))
    val filtered =
      if (excludeSelf) met.where(col("query_id") =!= col("neighbor_id"))
      else met
    filtered
      .withColumn("_qdot", intDotCol(col("_qu"), col("_nu")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        col("_qdot"))
  }

  /** The standing half of streaming margin mining: each target's
    * backward sum Σ top-k score(y, srcRef) over a REFERENCE source
    * corpus — the `Σbwd(y)` term of the margin, which in a streaming
    * setting cannot be computed against "all sources ever" and is
    * instead pinned to the reference corpus the filter was built
    * from (the CCMatrix-style practice: target-side neighborhood
    * statistics come from a fixed index build, queries stream).
    * Scores are the exact integer dots of [[marginMiningQuantized]].
    * One backward kNN + one groupBy; |tgt| rows out (a standing
    * table at scale, partitioned by `tgt_id` so the per-batch join
    * in [[marginMineBatch]] co-partitions). Output: (tgt_id, _sb).
    */
  def marginBackwardSums(srcRef: DataFrame, tgt: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    intDotTopK(stagedUnitCached(srcRef, idCol, vecCol),
        stagedUnitCached(tgt, idCol, vecCol), idCol, "_uq", k)
      .select(col("query_id").as("tgt_id"), col("_qdot").as("_qc"))
      .groupBy(col("tgt_id")).agg(sum(col("_qc")).as("_sb"))
  }

  /** The per-batch half of streaming margin mining: mine a bounded
    * SOURCE batch against the standing target corpus, with the
    * backward sums precomputed by [[marginBackwardSums]]. The forward
    * side is exact and batch-local — one [[knnJoinScored]] scan (the
    * batch is the broadcast query side, the corpus is scanned once),
    * `Σfwd(x)` is a per-source aggregate over that batch's own
    * candidates (depends only on x and the target corpus, never on
    * other sources), so mining a union of batches row-for-row equals
    * mining each batch separately — batch == stream parity holds by
    * construction and is spec-pinned in StreamingSpec. Margins are
    * the same integer-exact `margin_q = 2k·qc − Σa − Σb` as
    * [[marginMiningQuantized]]; with `srcRef == batch` the output is
    * exactly that function's, filtered to `margin_q >= minMarginQ`
    * (the mining threshold — Artetxe & Schwenk mine by margin cutoff;
    * on this grid a raw margin m corresponds to ≈ 2k·1e9·m).
    */
  def marginMineBatch(batch: DataFrame, tgt: DataFrame,
      backSums: DataFrame, idCol: String, vecCol: String, k: Int,
      minMarginQ: Long): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val f = intDotTopK(stagedUnitCached(tgt, idCol, vecCol),
        stagedUnit(batch, idCol, vecCol), idCol, "_uq", k)
      .select(col("query_id").as("src_id"),
        col("neighbor_id").as("tgt_id"), col("_qdot").as("_qc"))
    val sumA = f.groupBy(col("src_id")).agg(sum(col("_qc")).as("_sa"))
    val m = f.join(sumA, "src_id").join(backSums, "tgt_id")
      .withColumn("margin_q",
        lit(2L * k) * col("_qc") - col("_sa") - col("_sb"))
    bestPer(m, "src_id", "tgt_id").where(col("margin_q") >= minMarginQ)
  }

  /** Both candidate sets with margins attached: forward (each source's
    * top-k targets) and backward (each target's top-k sources), every
    * row carrying `margin_q = 2k·qc − Σfwd(src) − Σbwd(tgt)`. */
  private def marginFrames(src: DataFrame, tgt: DataFrame,
      idCol: String, vecCol: String, k: Int): (DataFrame, DataFrame) = {
    require(k >= 1, s"k must be >= 1, got $k")
    // both directions select and score on the SAME exact integer dot
    // (`_qdot` — the kernel's selection key verbatim), so candidate
    // sets and the margin arithmetic over them replay together
    val srcU = stagedUnitCached(src, idCol, vecCol)
    val tgtU = stagedUnitCached(tgt, idCol, vecCol)
    val f = intDotTopK(tgtU, srcU, idCol, "_uq", k)
      .select(col("query_id").as("src_id"),
        col("neighbor_id").as("tgt_id"), col("_qdot").as("_qc"))
    val b = intDotTopK(srcU, tgtU, idCol, "_uq", k)
      .select(col("query_id").as("tgt_id"),
        col("neighbor_id").as("src_id"), col("_qdot").as("_qc"))
    val sumA = f.groupBy(col("src_id")).agg(sum(col("_qc")).as("_sa"))
    val sumB = b.groupBy(col("tgt_id")).agg(sum(col("_qc")).as("_sb"))
    def withMargin(cand: DataFrame) = cand
      .join(sumA, "src_id").join(sumB, "tgt_id")
      .withColumn("margin_q",
        lit(2L * k) * col("_qc") - col("_sa") - col("_sb"))
    (withMargin(f), withMargin(b))
  }

  /** Per-`keyCol` margin argmax (ties to the smaller `otherCol`). */
  private def bestPer(m: DataFrame, keyCol: String,
      otherCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(col("margin_q").desc, col(otherCol).asc)
    m.withColumn("_rn", row_number().over(w)).where(col("_rn") === 1)
      .select(col("src_id"), col("tgt_id"), col("margin_q"))
  }

  /** Maximal Marginal Relevance re-rank (Carbonell & Goldstein, SIGIR
    * 1998): greedily pick k items maximizing
    * `lambda · rel − (1 − lambda) · max_{s ∈ selected} cos(item, s)` —
    * relevance traded against redundancy with what's already picked.
    * The division of labor is the production retrieval shape:
    * candidate generation is DISTRIBUTED (ANN/BM25 top-N bounds the
    * pool), the greedy re-rank is an O(k·|pool|) driver loop over the
    * bounded pool — inherently sequential, so distributing it would
    * only add k scheduling barriers. `maxPool` enforces the bound: an
    * over-cap pool is a bug in the caller's candidate generator, not a
    * reason to OOM the driver.
    *
    * Each step's argmax compares scores on a 1e-6 QUANTIZED grid
    * (`round(score · 1e6)` as a long), ties to the smaller id; the
    * first pick is the pure-relevance argmax (empty selected set ⇒
    * redundancy term 0). The grid is load-bearing for replay: DuckDB's
    * `list_cosine_similarity` is bit-stable on a plain scan but drifts
    * in the LAST ULP once lists pass through a join (SIMD accumulation
    * order follows the list's offset in the child vector), so a raw
    * double argmax over near-tied candidates flips between runs — the
    * q_embed_mmr oracle flipped its step-2 pick ~40% of runs until
    * both engines compared on this grid, where ulp noise collapses
    * into an exact tie and the id breaks it. Output:
    * `(idCol, mmr_rank)`, 1-based, in pick order.
    */
  def mmrRerank(cands: DataFrame, idCol: String, vecCol: String,
      relCol: String, k: Int, lambda: Double = 0.5,
      maxPool: Int = 1024): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda in [0,1], got $lambda")
    val spark = cands.sparkSession
    import spark.implicits._
    val pool = cands
      .select(col(idCol).cast("long"), col(vecCol), col(relCol).cast("double"))
      // a NULL relevance (CosinePair's degenerate contract) would
      // crash the non-nullable decode below; such rows are never
      // pickable anyway, so drop them here
      .where(col(relCol).isNotNull)
      .limit(maxPool + 1)
      .as[(Long, Array[Float], Double)].collect()
    require(pool.length <= maxPool,
      s"MMR pool exceeds maxPool=$maxPool: bound the candidate generator " +
        "(ANN/BM25 top-N) before re-ranking")
    val p = pool.sortBy(_._1)
    val n = p.length
    // the same double arithmetic as the knn kernel (proven equal to the
    // oracle's list_cosine_similarity over DOUBLE[] casts)
    val norms = p.map { case (_, v, _) =>
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
      math.sqrt(s)
    }
    // degenerate candidates (zero-norm vector -> NaN cosines, or NaN
    // relevance) are never pickable: without the gate a zero vector's
    // redundancy term stays -Infinity forever (NaN never updates the
    // running max) and it would hijack the second pick with a +Inf
    // score — and an all-NaN pool would leave argmax at -1 and crash
    val valid = Array.tabulate(n)(i => norms(i) > 0.0 && !p(i)._3.isNaN)
    def cos(a: Int, b: Int): Double = {
      val va = p(a)._2; val vb = p(b)._2
      var s = 0.0; var i = 0
      while (i < va.length) { s += va(i).toDouble * vb(i).toDouble; i += 1 }
      s / (norms(a) * norms(b))
    }
    // true max-sim over the selected set (can be NEGATIVE — it must
    // not clamp at 0, or an all-negative-similarity pool would rank
    // differently); the empty-set redundancy term is 0 by convention
    val maxSim = Array.fill(n)(Double.NegativeInfinity)
    val taken = Array.fill(n)(false)
    val picks = Array.newBuilder[(Long, Long)]
    var step = 0
    var exhausted = false
    while (step < math.min(k, n) && !exhausted) {
      var best = -1; var bestScore = Long.MinValue
      var i = 0
      while (i < n) {
        if (!taken(i) && valid(i)) {
          val red = if (step == 0) 0.0 else maxSim(i)
          val sc = (lambda * p(i)._3 - (1.0 - lambda) * red) * 1e6
          // the replay grid; half-away-from-zero to match SQL round()
          val scq = (if (sc >= 0) math.floor(sc + 0.5)
                     else math.ceil(sc - 0.5)).toLong
          if (scq > bestScore) { best = i; bestScore = scq } // ascending-
        }                                                  // id scan:
        i += 1                                             // first wins
      }                                                    // ties
      if (best < 0) exhausted = true // only degenerates remain
      else {
        taken(best) = true
        step += 1
        picks += ((p(best)._1, step.toLong))
        var j = 0
        while (j < n) {
          if (!taken(j) && valid(j)) {
            val s = cos(j, best)
            if (s > maxSim(j)) maxSim(j) = s
          }
          j += 1
        }
      }
    }
    spark.createDataFrame(picks.result().toSeq).toDF(idCol, "mmr_rank")
  }

  /** [[mmrRerank]] on the INTEGER-DOT contract (λ = 0.5): candidates
    * carry µ-unit quantized vectors (`uqCol`) and an integer relevance
    * (`relQCol` — the exact dot against the query's unit vector), and
    * each greedy step picks argmax of `relq − maxSimq` over exact
    * longs (0.5·rel − 0.5·ms orders identically — the common factor
    * cancels), ties to the smaller id. No float exists anywhere in
    * the walk, so the pick sequence is a pure integer function of the
    * pool — the q_embed_mmr pick windows were the FIRST family this
    * flake class hit (step-2 flipped ~40% of runs pre-grid; the 1e-6
    * grid closed same-binary replay but sat one cross-binary ULP from
    * a boundary, like every quantized-float contract). Same division
    * of labor: distributed candidate generation, O(k·|pool|) driver
    * greedy over the bounded pool.
    *
    * Degenerate rows: a zero-norm vector quantizes to all-zero longs
    * (dot 0 with everything — it cannot hijack picks via NaN, but it
    * IS pickable at rank tail like any orthogonal row); rows with a
    * NULL relq are dropped like mmrRerank's null-relevance contract.
    */
  def mmrRerankInt(cands: DataFrame, idCol: String, uqCol: String,
      relQCol: String, k: Int, maxPool: Int = 1024): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    val spark = cands.sparkSession
    import spark.implicits._
    val pool = cands
      .select(col(idCol).cast("long"), col(uqCol), col(relQCol).cast("long"))
      .where(col(relQCol).isNotNull)
      .limit(maxPool + 1)
      .as[(Long, Array[Long], Long)].collect()
    require(pool.length <= maxPool,
      s"MMR pool exceeds maxPool=$maxPool: bound the candidate generator " +
        "(ANN/BM25 top-N) before re-ranking")
    val p = pool.sortBy(_._1)
    val n = p.length
    def dotQ(a: Int, b: Int): Long = {
      val va = p(a)._2; val vb = p(b)._2
      var s = 0L; var i = 0
      while (i < va.length) { s += va(i) * vb(i); i += 1 }
      s
    }
    // empty-set redundancy is 0 by convention; the running max can be
    // negative and must not clamp (mmrRerank's contract)
    val maxSim = Array.fill(n)(Long.MinValue)
    val taken = Array.fill(n)(false)
    val picks = Array.newBuilder[(Long, Long)]
    var step = 0
    while (step < math.min(k, n)) {
      var best = -1; var bestScore = Long.MinValue
      var i = 0
      while (i < n) {
        if (!taken(i)) {
          val red = if (step == 0) 0L else maxSim(i)
          val sc = p(i)._3 - red
          if (sc > bestScore) { best = i; bestScore = sc } // ascending-id
        }                                                  // scan: first
        i += 1                                             // wins ties
      }
      taken(best) = true
      step += 1
      picks += ((p(best)._1, step.toLong))
      var j = 0
      while (j < n) {
        if (!taken(j)) {
          val s = dotQ(j, best)
          if (s > maxSim(j)) maxSim(j) = s
        }
        j += 1
      }
    }
    spark.createDataFrame(picks.result().toSeq).toDF(idCol, "mmr_rank")
  }

  /** Fully-DISTRIBUTED approximate k-NN join: no driver-side query
    * collect, so the query side may itself be a corpus (the contract
    * [[knnJoin]]/[[knnJoinIvf]] cannot serve — they broadcast the
    * collected query batch). Corpus rows are assigned to their single
    * nearest IVF cluster; each query row fans out to its `nprobe`
    * nearest clusters ([[graft.functions.NearestCentroids]], one
    * codegen'd argmin-k per row); the candidate set forms as a plain
    * equi-join on the cluster id and a per-query window keeps the
    * top-k (score desc, neighbor id asc — [[knnJoin]]'s exact
    * tie-break, so at nprobe = nlist the two paths agree rank for
    * rank).
    *
    * Shape at 100 TB: one shuffle of each side on the cluster id
    * (query side inflated nprobe×) + one shuffle of the bounded
    * candidate set (≤ nprobe/nlist of the corpus per query) on the
    * query id for the window — all hash-partitioned, AQE-coalesced;
    * a pair can meet in at most ONE cluster (the corpus row's), so no
    * dedup pass. Recall follows the probed-cluster mass like every
    * IVF serving path; calibrate `nprobe` with the same discipline as
    * [[calibrateNprobe]].
    */
  def knnJoinDistributed(corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int, model: IvfModel, nprobe: Int,
      excludeSelf: Boolean = true,
      excludeLabelCol: Option[String] = None,
      keepScore: Boolean = false,
      keepLabelCol: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lq = excludeLabelCol.orElse(keepLabelCol)
      .map(l => col(l).cast("string"))
      .getOrElse(lit(null).cast("string"))
    val q = queries.select(col(idCol).cast("long").as("query_id"),
        col(vecCol).as("_qv"), lq.as("_ql"))
      .withColumn("_cluster", explode(
        graft.functions.NearestCentroids(col("_qv"), model.centroids, nprobe)))
    val c = assignCluster(corpus.select(col(idCol).cast("long")
        .as("neighbor_id"), col(vecCol).as("_nv"), lq.as("_nl")),
      "_nv", model.centroids)
    val scored = q.join(c, Seq("_cluster"))
      .where(if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      // null-safe label exclusion: rows with EQUAL labels (null == null
      // included) are not negatives; a null vs non-null pair survives
      .where(if (excludeLabelCol.isDefined) !(col("_ql") <=> col("_nl"))
        else lit(true))
      .withColumn("_sim", cosineSimCols(col("_qv"), col("_nv")))
      // CosinePair yields NULL for degenerate pairs; drop them so the
      // distributed rank agrees with the heap kernel's NaN skip
      .where(col("_sim").isNotNull)
    // selection on the q9 grid (q9Col == the heap kernel's q9 for
    // every double), so the reroute stays rank-equal to the broadcast
    // path AND both replay against quantized oracle windows
    val w = Window.partitionBy(col("query_id"))
      .orderBy(q9Col(col("_sim")).desc, col("neighbor_id").asc)
    val ranked = scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
    val cols = Seq(col("query_id"), col("neighbor_id"),
      col("rank").cast("long").as("rank")) ++ // same schema as knnJoin
      (if (keepScore) Seq(col("_sim").as("_score"),
        q9Col(col("_sim")).as("_qscore")) else Nil) ++
      (if (keepLabelCol.isDefined) Seq(col("_ql").as("query_label"),
        col("_nl").as("neighbor_label")) else Nil)
    ranked.select(cols: _*)
  }

  /** Times a broadcast-batch k-NN entry point rerouted to
    * [[knnJoinDistributed]] because the query side exceeded
    * `graft.search.knnQueryBatchMax` (test-visible escalation counter).
    */
  val knnEscalations = new java.util.concurrent.atomic.AtomicLong(0)

  /** Query-side row cap for the broadcast-batch k-NN paths; above it
    * the join reroutes to [[knnJoinDistributed]] instead of collecting
    * the query set to the driver.
    */
  private def knnQueryBatchMax(spark: org.apache.spark.sql.SparkSession): Int =
    spark.conf.get("graft.search.knnQueryBatchMax", "65536").toInt

  /** IVF model for an automatic escalation when the caller asked for
    * the EXACT path (no model): probing all `nlist` clusters makes
    * [[knnJoinDistributed]] score every (query, corpus) pair with the
    * exact arithmetic and tie-break, so the reroute stays rank-for-rank
    * equal to the broadcast path — it only changes WHERE the pairs meet
    * (an equi-join on the cluster id instead of a driver broadcast).
    */
  private def escalationModel(corpus: DataFrame, vecCol: String): IvfModel = {
    val nlist = corpus.sparkSession.conf
      .get("graft.search.knnEscalateNlist", "64").toInt
    trainIvfCached(corpus, vecCol, nlist)
  }

  private def knnJoinPruned(corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int, excludeSelf: Boolean,
      model: Option[IvfModel], nprobe: Int,
      excludeLabelCol: Option[String] = None,
      keepScore: Boolean = false,
      keepLabelCol: Option[String] = None): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // bounded-batch contract, enforced: probe at most maxBatch+1 query
    // rows; an over-cap query side is a corpus, not a batch — reroute
    // to the distributed join instead of OOMing the driver. With a
    // caller-supplied IVF model the candidate condition (corpus row's
    // cluster within the query's nprobe nearest) is IDENTICAL in both
    // formulations, so the reroute is bit-equal; without one, the
    // all-clusters probe keeps the exact contract (see escalationModel).
    val maxBatch = knnQueryBatchMax(spark)
    // labels ride the scan when they gate (hard negatives) OR when the
    // caller wants them emitted (purity) — same column, two uses
    val labelSource = excludeLabelCol.orElse(keepLabelCol)
    val labelExpr = labelSource.map(l => col(l).cast("string"))
      .getOrElse(lit(null).cast("string"))
    val qsRaw = queries.select(col(idCol).cast("long"), col(vecCol), labelExpr)
      .limit(maxBatch + 1)
      .as[(Long, Array[Float], String)].collect()
    if (qsRaw.length > maxBatch) {
      knnEscalations.incrementAndGet()
      val m = model.getOrElse(escalationModel(corpus, vecCol))
      val np = if (model.isDefined) nprobe else m.centroids.length
      return knnJoinDistributed(corpus, queries, vecCol, idCol, k, m, np,
        excludeSelf, excludeLabelCol, keepScore, keepLabelCol)
    }
    val qs = qsRaw.sortBy(_._1).map { case (id, v, _) => (id, v) }
    val qLabels = qsRaw.sortBy(_._1).map(_._3)
    // per-query L2 norms, precomputed once
    val qn = qs.map { case (_, v) =>
      var n = 0.0; var i = 0
      while (i < v.length) { n += v(i).toDouble * v(i).toDouble; i += 1 }
      math.sqrt(n)
    }
    // per-query probe set over clusters (null = no pruning)
    val probes: Array[Array[Boolean]] = model match {
      case None => null
      case Some(m) =>
        qs.map { case (_, v) =>
          val d = m.centroids.map { c =>
            var s = 0.0; var i = 0
            while (i < c.length) {
              val dx = c(i) - v(i).toDouble; s += dx * dx; i += 1
            }
            s
          }
          val keep = d.zipWithIndex.sortBy(_._1).take(nprobe).map(_._2)
          val mask = new Array[Boolean](m.centroids.length)
          keep.foreach(mask(_) = true)
          mask
        }
    }
    val bcQ = spark.sparkContext.broadcast(qs)
    val bcN = spark.sparkContext.broadcast(qn)
    val bcP = spark.sparkContext.broadcast(probes)
    val bcL = spark.sparkContext.broadcast(
      if (excludeLabelCol.isDefined) qLabels else null)
    val bcQL = spark.sparkContext.broadcast(
      if (keepLabelCol.isDefined) qLabels else null)
    val base = model match {
      case None => corpus.select(col(idCol).cast("long"), col(vecCol),
        lit(-1).as("_cluster"), labelExpr.as("_lbl"))
      case Some(m) => assignCluster(
        corpus.select(col(idCol).cast("long").as("_kid"), col(vecCol),
          labelExpr.as("_lbl")),
        vecCol, m.centroids)
        .select(col("_kid"), col(vecCol), col("_cluster"), col("_lbl"))
    }
    // worst-first ordering on the q9 SELECTION grid: pop = lowest
    // quantized score, then highest id (see the q9 scaladoc — raw-
    // double selection flakes against the oracle at rank-boundary
    // near-ties); the raw score and the neighbor label (null unless
    // keepLabelCol) ride along for the output
    val worstFirst =
      Ordering.by[(Long, Double, Long, String), (Long, Long)] {
        case (qs, _, id, _) => (-qs, id)
      }
    val partial = base.as[(Long, Array[Float], Int, String)].mapPartitions { it =>
      val q = bcQ.value; val nrm = bcN.value; val pr = bcP.value
      val ql = bcL.value; val qkl = bcQL.value
      val heaps = Array.fill(q.length)(
        new scala.collection.mutable.PriorityQueue[(Long, Double, Long, String)]()(worstFirst))
      it.foreach { case (cid, cv, cluster, clbl) =>
        var nc = 0.0; var i = 0
        while (i < cv.length) { nc += cv(i).toDouble * cv(i).toDouble; i += 1 }
        val snc = math.sqrt(nc)
        var qi = 0
        while (qi < q.length) {
          val (qid, qv) = q(qi)
          val probed = pr == null || pr(qi)(cluster)
          // mirrors the distributed path's null-safe `<=>` exclusion:
          // equal labels (null == null included) are skipped
          val labelOk = ql == null || ql(qi) != clbl
          if (probed && labelOk && !(excludeSelf && cid == qid)) {
            var d = 0.0; var j = 0
            while (j < qv.length) { d += cv(j).toDouble * qv(j).toDouble; j += 1 }
            val s = d / (snc * nrm(qi))
            // degenerate rows (zero-norm/NaN on either side) never
            // enter the heap: an enqueued NaN could never be displaced
            // (no real score compares > NaN) and would poison a rank,
            // and skipping matches the distributed path's null-sim
            // filter — both paths agree degenerates are not neighbors
            if (!s.isNaN) {
              val qsc = q9(s)
              val h = heaps(qi)
              if (h.size < k) h.enqueue((qsc, s, cid, clbl))
              else {
                val w = h.head // worst of the current k
                if (qsc > w._1 || (qsc == w._1 && cid < w._3)) {
                  h.dequeue(); h.enqueue((qsc, s, cid, clbl))
                }
              }
            }
          }
          qi += 1
        }
      }
      heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
        h.iterator.map { case (qsc, s, cid, nl) =>
          (q(qi)._1, cid, qsc, s,
            if (qkl == null) null else qkl(qi), nl)
        }
      }
    }.toDF("query_id", "neighbor_id", "_qscore", "_score",
      "query_label", "neighbor_label")
    // final exact rank over the (numPartitions * k)-bounded candidates,
    // ordered on the heap's own quantized key (kernel selection and
    // final window cannot disagree on a value's grid cell)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("_qscore").desc, col("neighbor_id").asc)
    val ranked = partial.withColumn("rank",
      row_number().over(w).cast("long")).where(col("rank") <= k)
    val keep = Seq(col("query_id"), col("neighbor_id"), col("rank")) ++
      (if (keepScore) Seq(col("_score"), col("_qscore")) else Nil) ++
      (if (keepLabelCol.isDefined)
        Seq(col("query_label"), col("neighbor_label")) else Nil)
    ranked.select(keep: _*)
  }

  /** Smallest `nprobe` whose mean recall@k over a calibration query
    * batch meets `targetRecall` — the write-time step that turns the
    * IVF index into a QUALITY-GUARANTEED artifact instead of a fixed
    * nlist/4 guess. On clustered corpora this lands a small nprobe
    * (strong pruning); on unstructured corpora it honestly pays more
    * probes, up to a full scan (nprobe = nlist) when no pruning can
    * meet the target.
    *
    * Cost: ONE exact knnJoin over the corpus (broadcast queries,
    * per-partition heaps — no corpus shuffle) + one assignment join of
    * the k·|Q| exact neighbors. Recall as a function of nprobe falls
    * out of a single pass: an exact neighbor is recalled iff the rank
    * of its cluster in the query's centroid-distance order is
    * <= nprobe, so one histogram over ranks yields every candidate
    * nprobe's recall at once — no per-nprobe re-scan.
    */
  def calibrateNprobe(corpus: DataFrame, vecCol: String, idCol: String,
      model: IvfModel, k: Int, targetRecall: Double,
      calibQueries: DataFrame): Int = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val nlist = model.centroids.length
    val qs = calibQueries.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])].collect()
    if (qs.isEmpty) return nlist
    // probe order per calibration query: rank(cluster) = 1-based
    // position of the cluster in ascending centroid distance
    val rankOf: Map[Long, Array[Int]] = qs.map { case (qid, v) =>
      val d = model.centroids.map { c =>
        var s = 0.0; var i = 0
        while (i < c.length) { val dx = c(i) - v(i).toDouble; s += dx * dx; i += 1 }
        s
      }
      val rank = new Array[Int](nlist)
      d.zipWithIndex.sortBy(_._1).zipWithIndex.foreach {
        case ((_, cl), r) => rank(cl) = r + 1
      }
      qid -> rank
    }.toMap
    val exact = knnJoin(corpus, calibQueries, vecCol, idCol, k, excludeSelf = false)
    val assigned = assignCluster(
      corpus.select(col(idCol).cast("long").as("neighbor_id"), col(vecCol)),
      vecCol, model.centroids).select(col("neighbor_id"), col("_cluster"))
    val pairs = exact.join(assigned, Seq("neighbor_id"))
      .select(col("query_id"), col("_cluster")).as[(Long, Int)].collect()
    if (pairs.isEmpty) return nlist
    val hist = new Array[Long](nlist + 1)
    pairs.foreach { case (qid, cl) => hist(rankOf(qid)(cl)) += 1 }
    val total = pairs.length.toDouble
    var cum = 0L
    var np = 0
    while (np < nlist && cum < targetRecall * total) {
      np += 1
      cum += hist(np)
    }
    math.max(1, np)
  }

  def ivfTopK(df: DataFrame, vecCol: String, model: IvfModel,
      query: Seq[Double], k: Int, nprobe: Int, idCol: String = "_id"): DataFrame = {
    val ranked = model.centroids.zipWithIndex.map { case (c, i) =>
      val d = c.zip(query).map { case (a, b) => (a - b) * (a - b) }.sum
      (i, d)
    }.sortBy(_._2).take(nprobe).map(_._1)
    val assigned = assignCluster(df, vecCol, model.centroids)
    bruteForceTopK(assigned.where(col("_cluster").isin(ranked.map(Integer.valueOf): _*))
      .drop("_cluster"), vecCol, query, k, idCol)
  }

  // -------------------------------------------------------------------
  // Product quantization (PQ) — the MEMORY/IO side of the 100 TB ANN
  // story. IVF prunes which vectors are read; PQ shrinks what a read
  // costs: each vector stores as m byte codes (dim·4 bytes → m bytes,
  // 32× at dim=64/m=8), and a query scores a code with m table lookups
  // instead of a dim-length dot product. Serving is the standard
  // two-stage plan: ADC scan over codes → top (k·refine) candidates →
  // exact cosine re-rank of that bounded set on the raw vectors.
  // Geometry is cosine via normalize-then-inner-product: codebooks
  // train on L2-normalized vectors, the ADC table holds
  // dot(query_sub, centroid), so the lookup sum approximates cosine
  // directly.
  // -------------------------------------------------------------------

  /** `codebooks(s)(c)` = centroid `c` of subspace `s` (length `subDim`).
    * All codebooks are padded to a uniform ks (see [[trainPq]]).
    */
  final case class PqModel(subDim: Int, codebooks: Array[Array[Array[Double]]]) {
    def m: Int = codebooks.length
    def ks: Int = codebooks(0).length
    /** float32 bytes per vector / code bytes per vector. */
    def compressionX: Double = (m * subDim * 4.0) / m
  }

  /** L2-normalized copy of an array column (zero vectors stay zero) —
    * pure codegen'd HOFs, no UDF.
    */
  private def normalizedCol(c: Column): Column = {
    val nrm = norm(c)
    when(nrm === 0.0, transform(c, _ => lit(0.0)))
      .otherwise(transform(c, x => x.cast("double") / nrm))
  }

  /** Train PQ codebooks: per-subspace Lloyd k-means over a bounded
    * DETERMINISTIC sample (hash-ordered distinct, the [[trainIvf]]
    * discipline — codebook quality needs a representative sample, not
    * the full corpus, so this is the standard bounded-driver step even
    * at 100 TB). Init per subspace = first `ks` distinct subvectors in
    * hash-shuffled order; empty clusters keep their previous centroid;
    * first-min tie-breaks throughout, so training is bit-reproducible.
    * Codebooks with fewer than `ks` distinct subvectors pad with copies
    * of centroid 0 — padding never wins an assignment (first-min
    * resolves to the lower index), it only keeps the ADC table layout
    * uniform.
    */
  def trainPq(df: DataFrame, vecCol: String, m: Int, ks: Int = 256,
      iters: Int = 10, maxTrainRows: Int = 16384): PqModel = {
    val sample = df.select(col(vecCol)).distinct()
      .orderBy(xxhash64(col(vecCol)), col(vecCol))
      .limit(maxTrainRows).collect()
      .map(_.getSeq[Any](0).map(_.toString.toDouble).toArray)
    require(sample.nonEmpty, "trainPq: empty corpus")
    val dim = sample(0).length
    require(m > 0 && dim % m == 0, s"trainPq: dim $dim not divisible by m=$m")
    val subDim = dim / m
    val normed = sample.map { v =>
      var n = 0.0; var i = 0
      while (i < v.length) { n += v(i) * v(i); i += 1 }
      val s = math.sqrt(n)
      if (s == 0.0) v else v.map(_ / s)
    }
    val codebooks = Array.tabulate(m) { s =>
      val subs = normed.map(v =>
        java.util.Arrays.copyOfRange(v, s * subDim, (s + 1) * subDim))
      val seen = scala.collection.mutable.LinkedHashSet.empty[Seq[Double]]
      var si = 0
      while (si < subs.length && seen.size < ks) { seen += subs(si).toSeq; si += 1 }
      var cents = seen.iterator.map(_.toArray).toArray
      var it = 0
      while (it < iters) {
        val sums = Array.fill(cents.length)(new Array[Double](subDim))
        val counts = new Array[Long](cents.length)
        subs.foreach { v =>
          var best = 0; var bestD = Double.PositiveInfinity
          var c = 0
          while (c < cents.length) {
            var d = 0.0; var j = 0
            while (j < subDim) { val x = v(j) - cents(c)(j); d += x * x; j += 1 }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          counts(best) += 1
          var j = 0
          while (j < subDim) { sums(best)(j) += v(j); j += 1 }
        }
        cents = Array.tabulate(cents.length) { c =>
          if (counts(c) == 0) cents(c) else sums(c).map(_ / counts(c))
        }
        it += 1
      }
      if (cents.length < ks)
        cents ++ Array.fill(ks - cents.length)(cents(0).clone())
      else cents
    }
    PqModel(subDim, codebooks)
  }

  /** Add the `codeCol` (array<tinyint>, length m) PQ encoding of
    * `vecCol` — the write-time artifact. Per subspace, one codegen'd
    * [[graft.functions.NearestCentroid]] over the normalized slice;
    * codes store offset by -128 so 0..255 fits a signed byte under
    * ANSI casts. A pure column plan: codegen'd scan, no shuffle.
    */
  def encodePq(df: DataFrame, vecCol: String, model: PqModel,
      codeCol: String = "pq_code"): DataFrame = {
    val nv = normalizedCol(col(vecCol))
    val codes = (0 until model.m).map { s =>
      (graft.functions.NearestCentroid(
        slice(nv, s * model.subDim + 1, model.subDim), model.codebooks(s))
        - 128).cast("byte")
    }
    df.withColumn(codeCol, array(codes: _*))
  }

  /** Bounded cache of trained codebooks + persisted encodings, keyed
    * by the source plan + params ([[graft.pipeline.Dedup.planKey]]
    * discipline — full canonicalized plan, LocalRelation content
    * hashed). At 100 TB the PQ code column is written at ingest (the
    * same write-time trade as the reference's vector indexes), so
    * serving doesn't re-train or re-encode per query; here, repeated
    * queries over the same corpus build the artifact once. Entries own
    * their persisted frames; FIFO eviction unpersists.
    */
  private val PqCacheMax = 8
  private val pqCache =
    new java.util.LinkedHashMap[(String, String, Int, Int), (PqModel, DataFrame)](
        16, 0.75f, false) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String, Int, Int), (PqModel, DataFrame)]): Boolean = {
        val evict = size() > PqCacheMax
        if (evict) e.getValue._2.unpersist(false)
        evict
      }
    }

  /** Calibrated candidate depths per PQ artifact + (k, target) — the
    * [[graft.search.IndexCache]] `probes` discipline: calibration is a
    * write-time measurement, not a per-query cost.
    */
  private val pqRefineCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String, Int, Int, Int, Double), Int]()

  /** Train-and-encode as a cached write-time artifact: returns the
    * codebooks and the PERSISTED encoded corpus (original columns +
    * `pq_code`). The eager materializing count runs outside the lock.
    */
  def trainEncodePqCached(df: DataFrame, vecCol: String, m: Int,
      ks: Int = 256, iters: Int = 10,
      maxTrainRows: Int = 16384): (PqModel, DataFrame) = {
    val key = (graft.pipeline.Dedup.planKey(df), vecCol, m, ks)
    var built: DataFrame = null
    val out = pqCache.synchronized {
      val hit = pqCache.get(key)
      if (hit != null) hit
      else {
        val model = trainPq(df, vecCol, m, ks, iters, maxTrainRows)
        built = encodePq(df, vecCol, model)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val entry = (model, built)
        pqCache.put(key, entry)
        graft.pipeline.Scratch.noteBuild("pqModel")
        entry
      }
    }
    if (out._2 eq built) built.count()
    out
  }

  /** [[calibrateRefine]] memoized per (artifact, k, target). */
  def calibrateRefineCached(corpus: DataFrame, encoded: DataFrame,
      vecCol: String, idCol: String, model: PqModel, k: Int,
      targetRecall: Double, calibQueries: DataFrame, maxRefine: Int = 64,
      codeCol: String = "pq_code"): Int = {
    val key = (graft.pipeline.Dedup.planKey(corpus), vecCol, model.m,
      model.ks, k, targetRecall)
    val hit = pqRefineCache.get(key)
    if (hit != 0) hit
    else {
      graft.pipeline.Scratch.noteBuild("pqRefineCalibration")
      val r = calibrateRefine(corpus, encoded, vecCol, idCol, model, k,
        targetRecall, calibQueries, maxRefine, codeCol)
      pqRefineCache.putIfAbsent(key, r)
      r
    }
  }

  /** Per-query ADC lookup table, flat `m·ks` row-major:
    * `t(s·ks + c) = dot(normalized(query)_sub_s, codebook_s(c))`.
    */
  def adcTable(query: Seq[Double], model: PqModel): Array[Double] = {
    val qn = math.sqrt(query.map(x => x * x).sum)
    val q = if (qn == 0.0) query.toArray else query.map(_ / qn).toArray
    val t = new Array[Double](model.m * model.ks)
    var s = 0
    while (s < model.m) {
      var c = 0
      while (c < model.ks) {
        var d = 0.0; var j = 0
        while (j < model.subDim) {
          d += q(s * model.subDim + j) * model.codebooks(s)(c)(j); j += 1
        }
        t(s * model.ks + c) = d
        c += 1
      }
      s += 1
    }
    t
  }

  /** Single-query PQ top-k: ADC scan over codes (codegen'd
    * [[graft.functions.PqAdcScore]], TakeOrdered — no shuffle) keeps
    * `k·refine` candidates, exact cosine re-ranks that bounded set.
    * `encoded` must carry both `vecCol` and `codeCol` (encodePq output).
    */
  def pqTopK(encoded: DataFrame, vecCol: String, model: PqModel,
      query: Seq[Double], k: Int, refine: Int = 4, idCol: String = "_id",
      codeCol: String = "pq_code"): DataFrame = {
    val t = adcTable(query, model)
    val cand = encoded
      .withColumn("_adc", graft.functions.PqAdcScore(col(codeCol), t, model.ks))
      .orderBy(col("_adc").desc, col(idCol).asc)
      .limit(math.max(k * refine, k))
    bruteForceTopK(cand.drop("_adc"), vecCol, query, k, idCol)
  }

  /** Smallest `refine` (candidate multiplier) whose mean recall@k over
    * a calibration query batch meets `targetRecall` — the PQ analogue
    * of [[calibrateNprobe]], turning the ADC stage's candidate depth
    * into a measured quality guarantee instead of a guessed constant.
    *
    * One-scan method, same discipline as the IVF calibration: an exact
    * neighbor survives the ADC cut iff its rank in the query's
    * `(adc desc, id asc)` order is <= k·refine, so its rank = 1 + the
    * number of corpus codes strictly ahead of it. One pass over the
    * code column counts that per (query, neighbor) — per-partition
    * counter arrays of |calib|·k longs, merged on the driver — and a
    * rank histogram then yields every candidate refine's recall at
    * once. Returns at most `maxRefine` (the honest ceiling: a corpus
    * whose geometry PQ can't rank within `maxRefine·k` candidates
    * pays a deeper re-rank, it doesn't get a silent quality cut).
    */
  def calibrateRefine(corpus: DataFrame, encoded: DataFrame, vecCol: String,
      idCol: String, model: PqModel, k: Int, targetRecall: Double,
      calibQueries: DataFrame, maxRefine: Int = 64,
      codeCol: String = "pq_code"): Int = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val qs = calibQueries.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    if (qs.isEmpty) return 1
    val tables = qs.map { case (_, v) => adcTable(v.map(_.toDouble).toSeq, model) }
    val qIndex = qs.map(_._1).zipWithIndex.toMap
    val ks = model.ks
    def adcOf(qi: Int, code: Seq[Byte]): Double = {
      val t = tables(qi); var s = 0.0; var i = 0
      while (i < code.length) { s += t(i * ks + (code(i) + 128)); i += 1 }
      s
    }
    // exact top-k neighbors with their codes -> per-query ADC thresholds
    val exact = knnJoin(corpus, calibQueries, vecCol, idCol, k,
      excludeSelf = false)
    val nbrs = exact.join(
        encoded.select(col(idCol).cast("long").as("neighbor_id"), col(codeCol)),
        Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col(codeCol))
      .as[(Long, Long, Seq[Byte])].collect()
    if (nbrs.isEmpty) return 1
    // thr(qi) = this query's exact neighbors as (adcScore, neighborId)
    val thr: Array[Array[(Double, Long)]] = {
      val buf = Array.fill(qs.length)(
        scala.collection.mutable.ArrayBuffer.empty[(Double, Long)])
      nbrs.foreach { case (qid, nid, code) =>
        val qi = qIndex(qid)
        buf(qi) += ((adcOf(qi, code), nid))
      }
      buf.map(_.toArray)
    }
    val bcT = spark.sparkContext.broadcast(tables)
    val bcThr = spark.sparkContext.broadcast(thr)
    val kCap = thr.map(_.length).max
    // one scan: count, per (query, neighbor), corpus codes strictly
    // ahead in (adc desc, id asc) order — flat |calib|·k counters per
    // partition, merged on the driver
    val counts: Array[Long] = encoded
      .select(col(idCol).cast("long"), col(codeCol))
      .as[(Long, Seq[Byte])].mapPartitions { it =>
        val ts = bcT.value; val th = bcThr.value
        val local = new Array[Long](ts.length * kCap)
        it.foreach { case (cid, code) =>
          var qi = 0
          while (qi < ts.length) {
            val t = ts(qi)
            var s = 0.0; var i = 0
            while (i < code.length) { s += t(i * ks + (code(i) + 128)); i += 1 }
            val row = th(qi)
            var j = 0
            while (j < row.length) {
              val (ns, nid) = row(j)
              if (s > ns || (s == ns && cid < nid)) local(qi * kCap + j) += 1
              j += 1
            }
            qi += 1
          }
        }
        Iterator.single(local)
      }.collect()
      .reduce { (a, b) =>
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      }
    // rank histogram -> smallest refine meeting the target
    val ranks: Seq[Long] = for {
      qi <- thr.indices
      j <- thr(qi).indices
    } yield counts(qi * kCap + j) + 1L
    val total = ranks.length.toDouble
    var refine = 1
    while (refine < maxRefine &&
        ranks.count(_ <= k.toLong * refine) < targetRecall * total)
      refine += 1
    refine
  }

  /** Single-query IVF-PQ top-k — the serving-path analogue of
    * [[ivfTopK]] for corpora where even the probed clusters' full
    * vectors are too expensive to score: prune to the `nprobe` nearest
    * clusters, ADC-score their CODES (m byte lookups per row, both
    * stages codegen'd TakeOrdered — no shuffle), then exact-cosine
    * re-rank the `k·refine` candidates on raw vectors. `encoded` must
    * carry both `vecCol` and `codeCol`; at 100 TB it is the stored
    * table itself (the code column is written at ingest, the cluster
    * id is a partition column).
    */
  def ivfPqTopK(encoded: DataFrame, vecCol: String, ivf: IvfModel,
      pq: PqModel, query: Seq[Double], k: Int, nprobe: Int, refine: Int,
      idCol: String = "_id", codeCol: String = "pq_code"): DataFrame = {
    val ranked = ivf.centroids.zipWithIndex.map { case (c, i) =>
      val d = c.zip(query).map { case (a, b) => (a - b) * (a - b) }.sum
      (i, d)
    }.sortBy(_._2).take(nprobe).map(_._1)
    val probed = assignCluster(encoded, vecCol, ivf.centroids)
      .where(col("_cluster").isin(ranked.map(Integer.valueOf): _*))
      .drop("_cluster")
    val t = adcTable(query, pq)
    val cand = probed
      .withColumn("_adc", graft.functions.PqAdcScore(col(codeCol), t, pq.ks))
      .orderBy(col("_adc").desc, col(idCol).asc)
      .limit(math.max(k * refine, k))
    bruteForceTopK(cand.drop("_adc"), vecCol, query, k, idCol)
  }

  /** Batch PQ k-NN join — the [[knnJoin]] plan shape with ADC lookups
    * in place of dot products on the scan: broadcast per-query tables,
    * per-partition `k·refine` heaps over the CODE column only (the
    * scan that at 100 TB reads m bytes/row instead of 4·dim), a
    * bounded global ADC rank, then ONE more corpus scan that
    * broadcast-joins the candidate set (no corpus shuffle) and
    * re-ranks exactly on raw vectors — arithmetic identical to
    * [[knnJoin]], so with `refine` covering the corpus the output is
    * bit-equal to the exact join.
    *
    * Output: (query_id, neighbor_id, rank), rank 1-based by exact
    * cosine, ties to the ascending neighbor id.
    */
  def pqKnnJoin(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, k: Int, model: PqModel, refine: Int = 4,
      excludeSelf: Boolean = true, codeCol: String = "pq_code"): DataFrame =
    pqKnnJoinPruned(corpus, queries, vecCol, idCol, k, model, refine,
      excludeSelf, codeCol, None, 0)

  /** IVF-PQ batch k-NN join — the full 100 TB composition: IVF probe
    * masks prune WHICH codes are scored (with the cluster id as a
    * partition column the scan prunes to nprobe/nlist of the data),
    * PQ codes shrink what scoring a row COSTS (m byte lookups), and
    * the exact re-rank restores precision on the bounded candidate
    * set. Calibrate `nprobe` with [[calibrateNprobe]] and `refine`
    * with [[calibrateRefine]] — both are measured knobs, not guesses.
    */
  def pqKnnJoinIvf(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, k: Int, model: PqModel, ivf: IvfModel, nprobe: Int,
      refine: Int = 4, excludeSelf: Boolean = true,
      codeCol: String = "pq_code"): DataFrame =
    pqKnnJoinPruned(corpus, queries, vecCol, idCol, k, model, refine,
      excludeSelf, codeCol, Some(ivf), nprobe)

  private def pqKnnJoinPruned(corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int, model: PqModel, refine: Int,
      excludeSelf: Boolean, codeCol: String, ivf: Option[IvfModel],
      nprobe: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // same bounded-batch enforcement as knnJoinPruned. The reroute
    // scores raw vectors (exact cosine) instead of ADC-then-refine:
    // for an over-cap query side OOM safety wins over the code-scan
    // economy, and the candidates it ranks are a superset in quality
    // (no ADC error, no refine bound).
    val maxBatch = knnQueryBatchMax(spark)
    val qsRaw = queries.select(col(idCol).cast("long"), col(vecCol))
      .limit(maxBatch + 1)
      .as[(Long, Array[Float])].collect()
    if (qsRaw.length > maxBatch) {
      knnEscalations.incrementAndGet()
      val m = ivf.getOrElse(escalationModel(corpus, vecCol))
      val np = if (ivf.isDefined) nprobe else m.centroids.length
      return knnJoinDistributed(corpus, queries, vecCol, idCol, k, m, np,
        excludeSelf)
    }
    val qs = qsRaw.sortBy(_._1)
    val tables = qs.map { case (_, v) => adcTable(v.map(_.toDouble).toSeq, model) }
    // per-query probe set over IVF clusters (null = no pruning) — the
    // knnJoinPruned mask discipline
    val probeMasks: Array[Array[Boolean]] = ivf match {
      case None => null
      case Some(m) =>
        qs.map { case (_, v) =>
          val d = m.centroids.map { c =>
            var s = 0.0; var i = 0
            while (i < c.length) {
              val dx = c(i) - v(i).toDouble; s += dx * dx; i += 1
            }
            s
          }
          val keep = d.zipWithIndex.sortBy(_._1).take(nprobe).map(_._2)
          val mask = new Array[Boolean](m.centroids.length)
          keep.foreach(mask(_) = true)
          mask
        }
    }
    val bcT = spark.sparkContext.broadcast(tables)
    val bcQid = spark.sparkContext.broadcast(qs.map(_._1))
    val bcP = spark.sparkContext.broadcast(probeMasks)
    val kk = math.max(k * refine, k)
    val ks = model.ks
    val worstFirst = Ordering.by[(Double, Long), (Double, Long)] {
      case (s, id) => (-s, id)
    }
    // at scale _cluster is a write-time partition column; here it is
    // assigned on the fly like knnJoinPruned does
    val base = ivf match {
      case None => corpus.select(col(idCol).cast("long"), col(codeCol),
        lit(-1).as("_cluster"))
      case Some(m) => assignCluster(
        corpus.select(col(idCol).cast("long").as("_kid"), col(codeCol),
          col(vecCol)), vecCol, m.centroids)
        .select(col("_kid"), col(codeCol), col("_cluster"))
    }
    // note: Seq[Byte], not Array[Byte] — the latter's encoder is
    // BinaryType, which doesn't deserialize from array<tinyint>
    val partial = base
      .as[(Long, Seq[Byte], Int)].mapPartitions { it =>
        val ts = bcT.value; val qids = bcQid.value; val pr = bcP.value
        val heaps = Array.fill(ts.length)(
          new scala.collection.mutable.PriorityQueue[(Double, Long)]()(worstFirst))
        it.foreach { case (cid, code, cluster) =>
          var qi = 0
          while (qi < ts.length) {
            val probed = pr == null || pr(qi)(cluster)
            if (probed && !(excludeSelf && cid == qids(qi))) {
              val t = ts(qi)
              var sSum = 0.0; var i = 0
              while (i < code.length) { sSum += t(i * ks + (code(i) + 128)); i += 1 }
              val h = heaps(qi)
              if (h.size < kk) h.enqueue((sSum, cid))
              else {
                val w = h.head
                if (sSum > w._1 || (sSum == w._1 && cid < w._2)) {
                  h.dequeue(); h.enqueue((sSum, cid))
                }
              }
            }
            qi += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          h.iterator.map { case (sv, cid) => (qids(qi), cid, sv) }
        }
      }.toDF("query_id", "neighbor_id", "_adc")
    val wAdc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("_adc").desc, col("neighbor_id").asc)
    val cand = partial.withColumn("_r", row_number().over(wAdc))
      .where(col("_r") <= kk).select("query_id", "neighbor_id")
    val qmap = spark.sparkContext.broadcast(qs.toMap)
    val rescored = corpus
      .select(col(idCol).cast("long").as("neighbor_id"), col(vecCol).as("_v"))
      .join(broadcast(cand), Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("_v"))
      .as[(Long, Long, Array[Float])].mapPartitions { it =>
        val qm = qmap.value
        it.map { case (qid, nid, v) =>
          val qv = qm(qid)
          var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
          while (i < v.length) {
            val a = v(i).toDouble; val b = qv(i).toDouble
            d += a * b; na += a * a; nb += b * b; i += 1
          }
          val score = if (na == 0.0 || nb == 0.0) 0.0
            else d / (math.sqrt(na) * math.sqrt(nb))
          (qid, nid, score)
        }
      }.toDF("query_id", "neighbor_id", "_score")
    // exact re-rank on the q9 grid — keeps the refine-covers-corpus
    // case bit-equal to knnJoin's quantized selection
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(q9Col(col("_score")).desc, col("neighbor_id").asc)
    rescored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** Nearest-centroid classification over a labeled embedding table:
    * per-label centroids, then each vector assigned to the closest
    * centroid (squared L2; ties to the lower label). Output:
    * `(idCol, pred_label, correct)` — the standard label-coherence /
    * mislabel-audit pass over a training corpus's embedding column.
    *
    * All arithmetic is exact integer: components quantize to µ-units
    * (round(v * 1e6) as long), centroids are integer-div means, and
    * distances are exact long sums — so predictions are bit-identical
    * at any partitioning and in any SQL engine (the PageRank /
    * rollingSum reproducibility discipline; float means vary with
    * reduction order).
    *
    * Shape: one posexplode + (label, dim) aggregation for centroids —
    * map-side combined, |labels| x dims rows out — collected as a
    * bounded write-time artifact (same contract as IVF centroids),
    * then ONE codegen'd scan classifies every vector: per-label
    * distances via zip_with against literal centroid arrays, argmin
    * folded label-ascending. No join, no shuffle on the corpus side.
    */
  /** Per-label µ-unit integer centroids (bounded labels×dim collect —
    * a write-time artifact, like the IVF tables). Shared by the
    * classify audit and the pairwise centroid-distance matrix.
    */
  private def quantizedCentroids(df: DataFrame, vecCol: String,
      labelCol: String): Seq[(Int, Seq[Long])] = {
    val centRows = df
      .select(col(labelCol).as("_cl"),
        posexplode(transform(col(vecCol), v =>
          round(v.cast("double") * 1000000L).cast("long")))
          .as(Seq("_d", "_q")))
      .groupBy(col("_cl"), col("_d"))
      .agg(expr("sum(_q) div count(1)").as("_cq"))
      .collect()
    centRows
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).toSeq
      .map { case (l, rows) => (l, rows.sortBy(_._2).map(_._3).toSeq) }
      .sortBy(_._1)
  }

  /** Pairwise squared L2 distances between the per-label µ-unit
    * integer centroids — `(label_a, label_b, dist_sq)`, a < b, exact
    * longs. The label-geometry report behind cluster-merge /
    * label-noise decisions: two labels whose centroids nearly coincide
    * are candidates for merging (or evidence of label noise the kNN
    * purity probe will also show). Labels×labels driver math over the
    * bounded centroid artifact; zero additional scans.
    */
  def centroidDistances(df: DataFrame, vecCol: String,
      labelCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val byLabel = quantizedCentroids(df, vecCol, labelCol)
    val rows = for {
      i <- byLabel.indices
      j <- (i + 1) until byLabel.size
    } yield {
      val (la, ca) = byLabel(i); val (lb, cb) = byLabel(j)
      var s = 0L; var d = 0
      while (d < ca.length) {
        val diff = ca(d) - cb(d); s += diff * diff; d += 1
      }
      (la.toLong, lb.toLong, s)
    }
    rows.toDF("label_a", "label_b", "dist_sq")
  }

  def nearestCentroidClassify(df: DataFrame, idCol: String,
      vecCol: String, labelCol: String): DataFrame = {
    val q = df.select(col(idCol), col(labelCol),
      transform(col(vecCol), v =>
        round(v.cast("double") * 1000000L).cast("long")).as("_vq"))
    val byLabel = quantizedCentroids(df, vecCol, labelCol)
    if (byLabel.isEmpty)
      return df.select(col(idCol), lit(null).cast("int").as("pred_label"),
        lit(null).cast("boolean").as("correct")).where(lit(false))
    // per-label distances staged as columns, then an ascending argmin
    // fold (strict < keeps the LOWER label on ties)
    val distCols = byLabel.map { case (l, cent) =>
      aggregate(
        zip_with(col("_vq"), typedLit(cent), (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, v) => acc + v).as(s"_dist_$l")
    }
    val staged = q.select(Seq(col(idCol), col(labelCol)) ++ distCols: _*)
    val init = (lit(byLabel.head._1), col(s"_dist_${byLabel.head._1}"))
    val (pred, _) = byLabel.tail.foldLeft(init) { case ((bl, bd), (l, _)) =>
      val d = col(s"_dist_$l")
      (when(d < bd, lit(l)).otherwise(bl), when(d < bd, d).otherwise(bd))
    }
    staged.select(col(idCol), pred.as("pred_label"),
      (pred === col(labelCol)).as("correct"))
  }

  /** Integer-exact distributed Lloyd's k-means over µ-unit quantized
    * vectors: deterministic md5-ordered seeding, `iters` synchronous
    * rounds of (argmin assignment, per-dim integer-mean update), ties
    * toward the LOWER cluster id, empty clusters keep their previous
    * centroid. Returns `(idCol, cluster)` with cluster in `0 until k`
    * numbered by seed order.
    *
    * Every distance and mean is exact long arithmetic (µ-unit diffs
    * squared; `sum div count` truncating division), so the final
    * assignment is bit-identical at any partitioning and replayable in
    * an external engine — the topic-clustering primitive a curation
    * pipeline balances domains with (cluster, then sample or cap per
    * cluster), distinct from [[trainIvf]] (double math, recall-gated
    * serving, not replay-exact). Per round: one codegen'd
    * staged-distance scan + one groupBy collapsing to k×dim rows; the
    * centroid table (k×dim longs) is the only driver state, exactly
    * the bounded-artifact shape the IVF trainer already uses.
    */
  def kmeansQuantized(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame =
    kmeansAssignQuantized(df, idCol, vecCol,
      kmeansCentroidsQuantized(df, idCol, vecCol, k, iters))

  /** [[kmeansCentroidsQuantized]] memoized per (source plan, cols, k,
    * iters) — Lloyd training is deterministic write-time material (the
    * trainIvfCached rule), and the SemDeDup family (pairs/keep/cross/
    * report) re-trains the SAME blocks query after query without this.
    * Centroids are k×dim longs — a small driver artifact, no frames
    * to own.
    */
  private val KmCacheMax = 16
  private val kmCentCache =
    new java.util.LinkedHashMap[(String, String, String, Int, Int), Array[Seq[Long]]](
      16, 0.75f, false) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String, String, Int, Int), Array[Seq[Long]]]): Boolean =
        size() > KmCacheMax
    }

  private[graft] def kmeansCentroidsCached(df: DataFrame, idCol: String,
      vecCol: String, k: Int, iters: Int): Array[Seq[Long]] = {
    val key = (graft.pipeline.Dedup.planKey(df), idCol, vecCol, k, iters)
    kmCentCache.synchronized {
      val hit = kmCentCache.get(key)
      if (hit != null) return hit
    }
    val c = kmeansCentroidsQuantized(df, idCol, vecCol, k, iters)
    kmCentCache.synchronized { kmCentCache.put(key, c) }
    graft.pipeline.Scratch.noteBuild("kmeansCentroids")
    c
  }

  /** [[kmeansQuantized]] with BOTH halves shared: cached centroids and
    * the assignment frame pinned (MEMORY_AND_DISK, plan-keyed FIFO —
    * the stagedUnitCached discipline). The assignment is one scan with
    * a k-literal argmin; pairs/keep/report over the same corpus read
    * the identical block structure, so recomputing it per query is the
    * SemDeDup-family recompute the r15 bench measured at ~2.8×.
    */
  private val kmAsgnCache =
    new java.util.LinkedHashMap[(String, String, String, Int, Int), DataFrame](
      16, 0.75f, false) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String, String, Int, Int), DataFrame]): Boolean = {
        val evict = size() > KmCacheMax
        if (evict) e.getValue.unpersist(false)
        evict
      }
    }

  private[graft] def kmeansQuantizedCached(df: DataFrame, idCol: String,
      vecCol: String, k: Int, iters: Int): DataFrame = {
    val key = (graft.pipeline.Dedup.planKey(df), idCol, vecCol, k, iters)
    var built: DataFrame = null
    val e = kmAsgnCache.synchronized {
      val hit = kmAsgnCache.get(key)
      if (hit != null) hit
      else {
        built = kmeansAssignQuantized(df, idCol, vecCol,
            kmeansCentroidsCached(df, idCol, vecCol, k, iters))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        kmAsgnCache.put(key, built)
        graft.pipeline.Scratch.noteBuild("kmeansQuantized")
        built
      }
    }
    if (e eq built) e.count()
    e
  }

  private def quantizedFrame(df: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("_kid"),
      transform(col(vecCol), v =>
        round(v.cast("double") * 1000000L).cast("long")).as("_vq"))

  private def assignFrame(q: DataFrame,
      c: Array[Seq[Long]]): DataFrame = {
    val distCols = c.indices.map { j =>
      aggregate(
        zip_with(col("_vq"), typedLit(c(j)), (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, v) => acc + v).as(s"_dist_$j")
    }
    val staged = q.select(Seq(col("_kid"), col("_vq")) ++ distCols: _*)
    // argmin as array_min over (dist, j) structs — struct ordering is
    // lexicographic, so ties go to the LOWER cluster for free, and the
    // expression tree is LINEAR in k. (The when/otherwise fold this
    // replaces re-nested the running best inside each step — ~3^k
    // nodes, an OutOfMemoryError while BUILDING the tree at k=64.)
    val entries = c.indices.map { j =>
      struct(col(s"_dist_$j").as("d"), lit(j).as("j"))
    }
    val best = array_min(array(entries: _*))
    staged.select(col("_kid"), col("_vq"),
      best.getField("j").cast("long").as("_cl"),
      best.getField("d").as("_dist"))
  }

  /** [[quantizedFrame]]'s vector leg as a standalone column (µ-unit
    * longs) — for call sites that must keep the row's other columns
    * (streaming filters). */
  private[graft] def quantizeVec(v: Column): Column =
    transform(v, x => round(x.cast("double") * 1000000L).cast("long"))

  /** The [[assignFrame]] argmin as ONE column over a quantized vector:
    * a (d, j) struct holding the winning integer distance and cluster
    * (same lexicographic tie rule — lower cluster wins). Pure per-row
    * expression: no window, no shuffle, streaming-safe. */
  private[graft] def assignStruct(vq: Column,
      c: Array[Seq[Long]]): Column = {
    val entries = c.indices.map { j =>
      struct(
        aggregate(
          zip_with(vq, typedLit(c(j)), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, v) => acc + v).as("d"),
        lit(j).as("j"))
    }
    array_min(array(entries: _*))
  }

  /** The trained-centroid half of [[kmeansQuantized]]: the k×dim long
    * table after `iters` Lloyd rounds — the bounded driver artifact a
    * caller reuses to assign OTHER frames (an incoming batch) to the
    * standing corpus's clusters without retraining. */
  private[graft] def kmeansCentroidsQuantized(df: DataFrame,
      idCol: String, vecCol: String, k: Int,
      iters: Int): Array[Seq[Long]] = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val q = quantizedFrame(df, idCol, vecCol)
    // seeding assumes unique ids (the id contract everywhere in this
    // module): a duplicated id — or two ids carrying the same vector —
    // seeds duplicate centroids and leaves a cluster permanently empty
    // (the empty cluster keeps its seed via the getOrElse below; the
    // assignment tie-rule sends every row to the lower duplicate).
    // Deterministic but wasteful; callers wanting k EFFECTIVE clusters
    // on a dup-heavy corpus should exact-dedup first.
    val seedRows = q
      .orderBy(md5(col("_kid").cast("string")), col("_kid"))
      .limit(k).select(col("_vq")).collect()
    require(seedRows.length == k,
      s"k=$k exceeds the ${seedRows.length} input rows")
    var cents: Array[Seq[Long]] = seedRows.map(_.getSeq[Long](0))
    for (_ <- 1 to iters) {
      val sums = assignFrame(q, cents)
        .select(col("_cl"), posexplode(col("_vq")).as(Seq("_d", "_q")))
        .groupBy(col("_cl"), col("_d"))
        .agg(expr("sum(_q) div count(1)").as("_cq"))
        .collect()
      val byCl = sums
        .map(r => (r.getLong(0).toInt, r.getInt(1), r.getLong(2)))
        .groupBy(_._1)
        .map { case (j, rows) => (j, rows.sortBy(_._2).map(_._3).toSeq) }
      cents = Array.tabulate(k)(j => byCl.getOrElse(j, cents(j)))
    }
    cents
  }

  /** Assign any frame to a trained centroid table (exact integer
    * argmin, ties to the lower cluster — the [[kmeansQuantized]]
    * rule). Returns `(idCol, cluster)`. */
  private[graft] def kmeansAssignQuantized(df: DataFrame, idCol: String,
      vecCol: String, cents: Array[Seq[Long]]): DataFrame =
    assignFrame(quantizedFrame(df, idCol, vecCol), cents)
      .select(col("_kid").as(idCol), col("_cl").as("cluster"))

  /** Per-row prototypicality over the [[kmeansQuantized]] blocks
    * (Sorscher et al., NeurIPS 2022 "Beyond neural scaling laws": the
    * SSL prototype metric — distance to the row's own cluster
    * centroid; LOW = prototypical/easy, HIGH = hard/informative).
    * `proto_dist` is the EXACT long squared L2 between the µ-unit
    * quantized vector and its winning centroid — the very argmin key
    * the assignment selected on (read from the kernel, never
    * re-evaluated — the knnJoinScored discipline), so cluster, score,
    * and any downstream rank replay together on any engine. For
    * unit-normalized embeddings L2 order IS cosine order (monotone),
    * so the ranking matches the paper's cosine form. One assignment
    * scan; no pairs, no quadratic work. Returns
    * `(idCol, cluster, proto_dist)`.
    */
  def prototypicalityScores(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame =
    prototypicalityScoresSeeded(df, idCol, vecCol,
      kmeansCentroidsQuantized(df, idCol, vecCol, k, iters))

  /** [[prototypicalityScores]] against an ALREADY-trained centroid
    * table — for callers that hold the bounded artifact and must not
    * pay a second Lloyd training (the streaming filter constructs
    * centroids once and scores the same corpus with them). */
  private[graft] def prototypicalityScoresSeeded(df: DataFrame,
      idCol: String, vecCol: String,
      cents: Array[Seq[Long]]): DataFrame =
    assignFrame(quantizedFrame(df, idCol, vecCol), cents)
      .select(col("_kid").as(idCol), col("_cl").as("cluster"),
        col("_dist").as("proto_dist"))

  /** Prototypicality-based data pruning (Sorscher et al. 2022): keep
    * the HARDEST `keepNum/keepDen` fraction of every cluster — the
    * paper's abundant-data regime, where pruning easy/prototypical
    * examples beats random pruning and per-cluster balance stops any
    * one dense topic from surviving wholesale (their class-balance
    * rule). Rank within each cluster by (proto_dist DESC, id ASC) and
    * keep rank r iff `r·keepDen <= n·keepNum` — the stratifiedSplit
    * integer-compare discipline, so every cluster hits its floor
    * allocation exactly and the keep set replays bit-for-bit. Scarce-
    * data callers wanting the OPPOSITE end (keep easy) rank
    * [[prototypicalityScores]] ascending themselves. Scale shape: one
    * k-means + one assignment scan + one window keyed by cluster —
    * at corpus scale pick k ~ √n (the SemDeDup/IVF sizing rule) so
    * cluster partitions stay bounded and the window never sees a
    * giant partition.
    */
  def prototypicalityPrune(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, keepNum: Int, keepDen: Int): DataFrame =
    pruneScores(prototypicalityScores(df, idCol, vecCol, k, iters),
      idCol, keepNum, keepDen)

  /** [[prototypicalityPrune]] against an already-trained centroid
    * table (see [[prototypicalityScoresSeeded]]). */
  private[graft] def prototypicalityPruneSeeded(df: DataFrame,
      idCol: String, vecCol: String, cents: Array[Seq[Long]],
      keepNum: Int, keepDen: Int): DataFrame =
    pruneScores(prototypicalityScoresSeeded(df, idCol, vecCol, cents),
      idCol, keepNum, keepDen)

  /** [[prototypicalityPruneBy]] against an already-trained centroid
    * table — so the grouped (per-tenant) form can score with the SAME
    * shared centroids as the global family instead of re-training
    * Lloyd on its joined frame (the centroid space is global by
    * design; only the keep windows are per-group). */
  private[graft] def prototypicalityPruneBySeeded(df: DataFrame,
      idCol: String, vecCol: String, grpCol: String,
      cents: Array[Seq[Long]], keepNum: Int, keepDen: Int): DataFrame =
    pruneScoresBy(
      prototypicalityScoresSeeded(df, idCol, vecCol, cents)
        .join(df.select(col(idCol), col(grpCol)), idCol :: Nil),
      idCol, Seq(grpCol, "cluster"), keepNum, keepDen)

  /** Embedding-space isotropy diagnostic (Mu & Viswanath 2018 /
    * Ethayarajh 2019: anisotropic spaces — all vectors sharing a
    * dominant direction — degrade cosine retrieval and clustering;
    * healthy mean pairwise cosine sits near 0, a collapsed embedding
    * model reads high): the mean integer dot over a DETERMINISTIC
    * md5-sampled row subset's pairs. Sampling gates each row on
    * `md5(seed:id) mod modP == 0` (expected n/modP rows — pick modP
    * so the sample is maxSample-ish), then all pairs within the
    * bounded sample score by exact µ-unit integer dots — the report
    * is a pure integer function of (parquet bytes, seed, modP),
    * replayable on any engine, no RNG. Refuses an over-cap sample
    * (quadratic pair work must stay diagnostic-sized — the MMR
    * maxPool discipline). One cached staged scan + one broadcast
    * self-join of the sample. Output:
    * (n_pairs, mean_qdot, aniso_q = |mean_qdot|), mean ≈ cosine·1e12.
    */
  def isotropyReport(df: DataFrame, idCol: String, vecCol: String,
      seed: String, modP: Int = 0, maxSample: Int = 512): DataFrame = {
    require(modP >= 0, s"modP must be >= 0 (0 = auto-size), got $modP")
    val su = stagedUnitCached(df, idCol, vecCol)
    // modP = 0 auto-sizes the gate to a ~256-row expected sample from
    // the measurable-corpus count — a FIXED modP stops being a
    // diagnostic at 10× the rows (measured: the sf1 scaling corpus
    // blew a modP=8 sample straight through the cap). ceil division;
    // the oracle mirrors with the same integer arithmetic over uq.
    val p = if (modP > 0) modP.toLong
            else (su.count() + 255L) / 256L
    val gate = pmod(conv(substring(md5(concat(lit(seed + ":"),
      col(idCol).cast("string"))), 1, 15), 16, 10).cast("long"),
      lit(p)) === 0L
    val sampled = su.where(gate)
    val n = sampled.count()
    require(n <= maxSample,
      s"isotropy sample $n exceeds maxSample=$maxSample: raise modP " +
        "(pair work is quadratic in the sample — keep it diagnostic-sized)")
    val a = sampled.select(col(idCol).as("_ia"), col("_uq").as("_ua"))
    val b = sampled.select(col(idCol).as("_ib"), col("_uq").as("_ub"))
    a.join(broadcast(b), col("_ia") < col("_ib"))
      .select(intDotCol(col("_ua"), col("_ub")).as("_qd"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("_qd")).as("_s"))
      .select(col("n_pairs"),
        expr("_s div n_pairs").as("mean_qdot"),
        abs(expr("_s div n_pairs")).as("aniso_q"))
  }

  /** Per-GROUP prototypicality pruning — the deployment shape a real
    * curation pipeline shards by (tenant, crawl source, license
    * bucket): the centroid space stays GLOBAL (topics are corpus-wide
    * — per-tenant k-means would make "cluster 3" mean different things
    * per tenant), but each (group, cluster) cell keeps its own hardest
    * `keepNum/keepDen` fraction, so one verbose tenant cannot eat
    * another's allocation within a topic. Same exact integer keep rule
    * (`r·keepDen ≤ n·keepDen` floor compare on the assignment's own
    * argmin key); the group column joins back onto the bounded score
    * frame by id — one broadcast-sized join, the windows gain a
    * partition key for free. Output adds `grpCol`.
    */
  def prototypicalityPruneBy(df: DataFrame, idCol: String, vecCol: String,
      grpCol: String, k: Int, iters: Int, keepNum: Int,
      keepDen: Int): DataFrame =
    pruneScoresBy(
      prototypicalityScores(df, idCol, vecCol, k, iters)
        .join(df.select(col(idCol), col(grpCol)), idCol :: Nil),
      idCol, Seq(grpCol, "cluster"), keepNum, keepDen)

  private def pruneScores(scores: DataFrame, idCol: String,
      keepNum: Int, keepDen: Int): DataFrame =
    pruneScoresBy(scores, idCol, Seq("cluster"), keepNum, keepDen)

  private def pruneScoresBy(scores: DataFrame, idCol: String,
      keys: Seq[String], keepNum: Int, keepDen: Int): DataFrame = {
    require(keepDen >= 1 && keepNum >= 0 && keepNum <= keepDen,
      s"need 0 <= keepNum <= keepDen with keepDen >= 1: $keepNum/$keepDen")
    val byCl = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
    scores
      .withColumn("_r", row_number().over(
        byCl.orderBy(col("proto_dist").desc, col(idCol).asc)))
      .withColumn("_n", count(lit(1)).over(byCl))
      .where(col("_r") * lit(keepDen.toLong) <=
        col("_n") * lit(keepNum.toLong))
      .drop("_r", "_n")
  }

  /** Cross-frame cosine contamination flags: the ids of `corpus` rows
    * within `threshold` cosine of ANY `evalSet` row. The eval side
    * collects bounded by `maxEval` (it is benchmark-sized by the same
    * contract as the shingle-decontam broadcast — refuse, don't spill,
    * past the cap) and broadcasts with precomputed norms; the corpus
    * streams through one mapPartitions scan with no shuffle and no
    * corpus-side collect, early-exiting each row on its first hit.
    * [[graft.pipeline.Decontam.semanticContamination]] is the caller.
    */
  def cosineFlagsBroadcast(corpus: DataFrame, evalSet: DataFrame,
      vecCol: String, idCol: String, threshold: Double,
      maxEval: Int = 1 << 16): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    def dbl(df: DataFrame, cols: Column*) =
      df.select(cols :+ transform(col(vecCol), x => x.cast("double")).as("_v"): _*)
    val ev = dbl(evalSet).select(col("_v"))
      .as[Array[Double]].limit(maxEval + 1).collect()
    require(ev.length <= maxEval,
      s"eval side exceeds $maxEval rows — not benchmark-sized; shard it")
    val bc = spark.sparkContext.broadcast(ev)
    val bn = spark.sparkContext.broadcast(ev.map { v =>
      var n = 0.0; var i = 0
      while (i < v.length) { n += v(i) * v(i); i += 1 }
      math.sqrt(n)
    })
    dbl(corpus, col(idCol).cast("long").as("_cid"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val r = bc.value; val rn = bn.value
        it.filter { case (_, va) =>
          var na = 0.0; var i = 0
          while (i < va.length) { na += va(i) * va(i); i += 1 }
          val sna = math.sqrt(na)
          var hit = false; var j = 0
          while (!hit && j < r.length) {
            val vb = r(j)
            var d = 0.0; var kk = 0
            while (kk < va.length) { d += va(kk) * vb(kk); kk += 1 }
            hit = d / (sna * rn(j)) >= threshold
            j += 1
          }
          hit
        }
      }
      .map(_._1).toDF(idCol)
  }
}
