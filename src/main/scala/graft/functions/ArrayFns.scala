package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Custom codegen'd Catalyst expressions for the hot loops of the dedup /
  * similarity operators.
  *
  * Spark's higher-order functions (`transform`/`aggregate`/`zip_with`/
  * `array_intersect`) are NOT whole-stage-codegen'd — each lambda step is
  * an interpreted `Expression.eval` with per-element boxing and a fresh
  * array allocation per lambda. For expressions evaluated millions of
  * times per partition (64 minhash permutations per doc, one jaccard per
  * candidate pair, three dot products per scored vector pair) that
  * interpreter overhead dominates the actual arithmetic by >10×. These
  * expressions run the same math as a tight single-pass loop over the
  * unboxed ArrayData and plug into codegen via `defineCodeGen` (one static
  * call per row, no virtual dispatch inside the loop).
  */
object ArrayFns {

  private def col(e: Expression): Column = org.apache.spark.sql.graftbridge.Bridge.column(e)
  private def expr(c: Column): Expression = org.apache.spark.sql.graftbridge.Bridge.expression(c)

  /** All `bands` LSH band-bucket hashes of the minhash signature of a
    * long-hash array, in one pass: sig_k = min over elements of mix(h, k);
    * band b = FNV fold of its `numHashes/bands` signature rows. */
  def minhashBands(hashes: Column, numHashes: Int, bands: Int): Column =
    col(MinHashBandsExpr(expr(hashes), numHashes, bands))

  /** Jaccard similarity |a∩b|/|a∪b| of two distinct-element long arrays. */
  def jaccardLong(a: Column, b: Column): Column =
    col(JaccardLongExpr(expr(a), expr(b)))

  /** Fused filter+project jaccard: the similarity when ≥ `threshold`, else
    * NULL. `select(jaccardThreshold(...)).filter(isNotNull)` evaluates the
    * kernel ONCE per candidate pair — the plain
    * `select(jaccard).filter(jaccard >= θ)` form gets its predicate pushed
    * below the projection (plus an inferred isnotnull conjunct), costing
    * 2-3 kernel evaluations per pair. */
  def jaccardThreshold(a: Column, b: Column, threshold: Double): Column =
    col(JaccardThresholdExpr(expr(a), expr(b), threshold))

  /** Fused PQ encode: all `m` subspace codes in one pass over the vector.
    * Bit-identical to the per-subspace slice/dotD/array_min expression
    * form (same left-fold dots, same `-2·dot + ‖c‖²` distance, strict-<
    * argmin keeping the earliest centroid on ties) — one kernel call per
    * row instead of m·kc interpreted slices. `flat` is the codebook
    * flattened [subspace][centroid][component]. */
  def pqEncode(vec: Column, m: Int, kc: Int, subDim: Int,
      flat: Seq[Double]): Column =
    col(PqEncodeExpr(expr(vec), m, kc, subDim, flat))

  /** Sequential-order dot product of two double arrays — bit-identical to
    * `aggregate(zip_with(a,b,*), 0d, +)` (left fold, 0.0 seed), so oracle
    * SQL using list_reduce reproduces it exactly. */
  def dotD(a: Column, b: Column): Column =
    col(DotDExpr(expr(a), expr(b)))

  /** 32-bit SimHash from non-negative token hashes: bit j of the result is
    * set when more hashes have bit j set than clear — one pass instead of
    * 32 interpreted aggregate lambdas. Bit math identical to
    * `(h >> j) % 2 == 1` on non-negative longs (the oracle's formula). */
  def simhash32(hashes: Column): Column =
    col(SimHash32Expr(expr(hashes)))

  /** 64-bit SimHash over full 64-bit token hashes. The corpus-scale
    * variant: at 500k docs a 32-bit fingerprint saturates (birthday
    * collisions put ~10^8 random pairs inside hamming ≤ 3); 64 bits push
    * that below one expected false pair until ~10^8 docs. */
  def simhash64(hashes: Column): Column =
    col(SimHash64Expr(expr(hashes)))

  // ---- static kernels (called from generated code) ------------------------

  /** splitmix64-style seeded mixer — only needs to be a good hash, no
    * cross-engine contract (LSH candidates are re-verified exactly). */
  @inline private def mix(h: Long, seed: Int): Long = {
    var x = h ^ (seed * 0x9E3779B97F4A7C15L)
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  /** mix(h, 0) for sibling kernels building compatible probe sets. */
  private[functions] def mix0(h: Long): Long = mix(h, 0)

  /** All `numHashes` affine-permutation minima of a long-hash array in one
    * pass — exactly `array((0 until numHashes).map(k => array_min(
    * transform(hs, h => (h*(1000003+2k) + 12289k+1) % 2^32))))`, the
    * cross-engine signature family of [[graft.ml.Dedup.minhashBandStats]],
    * without numHashes interpreted transform passes and allocations. */
  def affineMinhashSig(hashes: Column, numHashes: Int): Column =
    col(AffineMinhashSigExpr(expr(hashes), numHashes))

  def affineMinhashSigKernel(arr: ArrayData, numHashes: Int): ArrayData = {
    val n = arr.numElements()
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var k = 0
      while (k < numHashes) {
        val v = (h * (1000003L + 2L * k) + 12289L * k + 1L) % 4294967296L
        if (v < sig(k)) sig(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  def minhashBandsKernel(arr: ArrayData, numHashes: Int, bands: Int): ArrayData = {
    val n = arr.numElements()
    val r = numHashes / bands
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var k = 0
      while (k < numHashes) {
        val v = mix(h, k)
        if (v < sig(k)) sig(k) = v
        k += 1
      }
      i += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 0xcbf29ce484222325L
      var j = 0
      while (j < r) { acc = (acc ^ sig(b * r + j)) * 0x100000001b3L; j += 1 }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  def jaccardLongKernel(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    if (na == 0 && nb == 0) return 1.0
    // open-addressing set over the smaller array, power-of-two capacity
    val (small, big, ns, nl) = if (na <= nb) (a, b, na, nb) else (b, a, nb, na)
    var cap = 8
    while (cap < ns * 2) cap <<= 1
    val table = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val mask = cap - 1
    var i = 0
    while (i < ns) {
      val v = small.getLong(i)
      var idx = (mix(v, 0) & 0x7fffffffffffffffL).toInt & mask
      while (used(idx) && table(idx) != v) idx = (idx + 1) & mask
      if (!used(idx)) { used(idx) = true; table(idx) = v }
      i += 1
    }
    var inter = 0
    i = 0
    while (i < nl) {
      val v = big.getLong(i)
      var idx = (mix(v, 0) & 0x7fffffffffffffffL).toInt & mask
      while (used(idx) && table(idx) != v) idx = (idx + 1) & mask
      if (used(idx)) inter += 1
      i += 1
    }
    inter.toDouble / (na + nb - inter)
  }

  def simhash32Kernel(hs: ArrayData): Long = {
    val n = hs.numElements()
    val votes = new Array[Int](32)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < 32) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 32) { if (votes(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  def simhash64Kernel(hs: ArrayData): Long = {
    val n = hs.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  def dotDKernel(a: ArrayData, b: ArrayData): Double = {
    // callers (DotDExpr) null out length mismatches BEFORE this runs —
    // truncating to the shorter array would silently score a malformed
    // embedding with a partial dot product, diverging from the
    // documented composed form (zip_with pads with null → null result)
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }
}

case class MinHashBandsExpr(child: Expression, numHashes: Int, bands: Int)
    extends UnaryExpression {
  require(numHashes % bands == 0, "bands must divide numHashes")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    ArrayFns.minhashBandsKernel(input.asInstanceOf[ArrayData], numHashes, bands)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ArrayFns.minhashBandsKernel($c, $numHashes, $bands)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "minhash_bands"
}

case class JaccardLongExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayFns.jaccardLongKernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ArrayFns.jaccardLongKernel($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "jaccard_long"
}

case class JaccardThresholdExpr(left: Expression, right: Expression,
    threshold: Double) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any = {
    val j = ArrayFns.jaccardLongKernel(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (j >= threshold) j else null
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |double ${ev.value}_j = graft.functions.ArrayFns.jaccardLongKernel($a, $b);
         |if (${ev.value}_j >= ${threshold}D) { ${ev.value} = ${ev.value}_j; }
         |else { ${ev.isNull} = true; }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "jaccard_threshold"
}

case class SimHash32Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    ArrayFns.simhash32Kernel(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ArrayFns.simhash32Kernel($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "simhash32"
}

case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    ArrayFns.simhash64Kernel(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ArrayFns.simhash64Kernel($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

case class PqEncodeExpr(child: Expression, m: Int, kc: Int, subDim: Int,
    flat: Seq[Double]) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val cents: Array[Double] = flat.toArray
  @transient private lazy val csq: Array[Double] = {
    val out = new Array[Double](m * kc)
    var i = 0
    while (i < m * kc) {
      var acc = 0.0
      var d = 0
      while (d < subDim) { val x = cents(i * subDim + d); acc += x * x; d += 1 }
      out(i) = acc
      i += 1
    }
    out
  }

  def encode(v: ArrayData): ArrayData = {
    val codes = new Array[Int](m)
    val n = v.numElements()
    var s = 0
    while (s < m) {
      val vbase = s * subDim
      val dlim = math.max(0, math.min(subDim, n - vbase))
      var best = 0
      var bestDist = Double.PositiveInfinity
      var c = 0
      while (c < kc) {
        val cbase = (s * kc + c) * subDim
        var dot = 0.0
        var d = 0
        while (d < dlim) { dot += v.getDouble(vbase + d) * cents(cbase + d); d += 1 }
        val dist = -2.0 * dot + csq(s * kc + c)
        if (dist < bestDist) { bestDist = dist; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  override def nullSafeEval(input: Any): Any = encode(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncoder", this, classOf[PqEncodeExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "pq_encode"
}

case class DotDExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    // length mismatch → NULL, the composed zip_with/aggregate contract
    if (aa.numElements() != bb.numElements()) null
    else ArrayFns.dotDKernel(aa, bb)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if ($a.numElements() != $b.numElements()) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.ArrayFns.dotDKernel($a, $b);
      }""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "dot_d"
}

case class AffineMinhashSigExpr(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes >= 1, "numHashes must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    ArrayFns.affineMinhashSigKernel(input.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ArrayFns.affineMinhashSigKernel($c, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "affine_minhash_sig"
}
