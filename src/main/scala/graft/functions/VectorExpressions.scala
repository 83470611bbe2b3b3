package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector-similarity hot loops.
  *
  * The `zip_with`/`aggregate` higher-order-function forms in
  * [[graft.core.Similarity]] are correct and oracle-parity-exact, but
  * allocate an intermediate array and evaluate a lambda per element. These
  * expressions generate a tight primitive loop instead (whole-stage
  * codegen'd), with the SAME arithmetic — promote each float to double,
  * multiply/subtract, accumulate left-to-right — so results are
  * bit-identical to the HOF forms and to the DuckDB oracles.
  *
  * Both inputs must be ARRAY<FLOAT> (the engine's canonical embedding
  * type, SURVEY.md §1.4).
  */
/** Shared input guard: every expression here reads ARRAY elements via
  * unchecked primitive getters, and on Spark's array layouts a NULL
  * element surfaces as 0.0f/0.0 SILENTLY — a wrong sim feeding the
  * ranking paths, and a divergence from the HOF/oracle forms (which
  * return NULL). Parquet schemas default to containsNull = true even
  * for null-free data, so the nullability cannot be rejected at
  * analysis; instead each expression runs this one O(n) prepass per
  * array argument (L1-resident — the data is about to be read anyway)
  * and fails fast with a descriptive error in BOTH eval paths
  * (a standalone object compiles to a class with static forwarders,
  * so generated Java calls it directly). */
object VecGuards {
  def requireNoNulls(name: String, v: ArrayData): Unit = {
    val n = v.numElements()
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) throw new IllegalArgumentException(
        s"$name: null array element at index $i — vector columns must be null-free")
      i += 1
    }
  }

  /** True when the child's type PROVES its arrays null-free
    * (`containsNull = false`) — the per-row scan is then pure overhead
    * and every expression here elides it in both eval paths. Parquet
    * schemas default to containsNull = true, so corpus scans keep the
    * guard; the elision pays on engine-internal columns (our own
    * expressions and `transform`/`array` outputs declare
    * containsNull = false), which chain through the hottest scoring
    * kernels. */
  def nullFree(t: DataType): Boolean = t match {
    case ArrayType(_, containsNull) => !containsNull
    case _ => false
  }

  /** The conditional codegen guard line ("" when provably unneeded). */
  def genGuard(t: DataType, name: String, v: String): String =
    if (nullFree(t)) ""
    else s"""graft.functions.VecGuards.requireNoNulls("$name", $v);"""
}

abstract class VectorFold extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<FLOAT> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  /** Java source for the loop body given element accessors; accumulates
    * into a local `s`. Locals the body declares must come from
    * `ctx.freshName` — a bare name collides with enclosing scopes in a
    * fused whole-stage method and Janino then rejects the whole stage
    * (silent interpreted fallback on the hot kernel). */
  protected def loopBody(ctx: CodegenContext, a: String, b: String, i: String): String

  /** JVM fold for the interpreted path. */
  protected def fold(a: ArrayData, b: ArrayData): Double

  /** Java epilogue turning the accumulator into the result (default:
    * identity). */
  protected def epilogue(s: String): String = s

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (!VecGuards.nullFree(left.dataType)) VecGuards.requireNoNulls(prettyName, x)
    if (!VecGuards.nullFree(right.dataType)) VecGuards.requireNoNulls(prettyName, y)
    fold(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException("vector size mismatch: " +
         |    $n + " vs " + $b.numElements());
         |}
         |${VecGuards.genGuard(left.dataType, prettyName, a)}
         |${VecGuards.genGuard(right.dataType, prettyName, b)}
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${loopBody(ctx, a, b, i).replace("ACC", s)}
         |}
         |${ev.value} = ${epilogue(s)};
       """.stripMargin
    })
}

/** dot(a, b) = Σ (double)a_i * (double)b_i — bit-identical to
  * `aggregate(zip_with(cast(a), cast(b), (x,y) -> x*y), 0D, +)`. */
case class VectorDot(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "vector_dot"
  override protected def loopBody(ctx: CodegenContext, a: String, b: String, i: String): String =
    s"ACC += (double)$a.getFloat($i) * (double)$b.getFloat($i);"
  override protected def fold(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(n == b.numElements(), s"vector size mismatch: $n vs ${b.numElements()}")
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** l2(a, b) = sqrt(Σ ((double)a_i - (double)b_i)^2) — bit-identical to the
  * HOF form in Similarity.l2Col. */
case class VectorL2(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "vector_l2"
  override protected def loopBody(ctx: CodegenContext, a: String, b: String, i: String): String = {
    val d = ctx.freshName("d")
    s"""double $d = (double)$a.getFloat($i) - (double)$b.getFloat($i);
       |  ACC += $d * $d;""".stripMargin
  }
  override protected def epilogue(s: String): String = s"java.lang.Math.sqrt($s)"
  override protected def fold(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(n == b.numElements(), s"vector size mismatch: $n vs ${b.numElements()}")
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      s += d * d
      i += 1
    }
    math.sqrt(s)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Symmetric int8 scalar quantization: q_i = clamp(round(x_i/scale·127),
  * ±127) as a BINARY value — 4× smaller than ARRAY<FLOAT> in shuffle and
  * cache, the standard first stage of a quantized-search pipeline.
  * `scale` (the corpus max-|x|, trained from a sample) arrives as a
  * foldable double. */
case class VectorQuantize(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "vector_quantize"
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ARRAY<FLOAT>, DOUBLE), got ${l.catalogString} and ${r.catalogString}")
  }

  private def quantize(x: Double, scale: Double): Byte = {
    val q = math.rint(x / scale * 127.0)
    math.max(-127.0, math.min(127.0, q)).toByte
  }

  override def nullSafeEval(a: Any, s: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val scale = s.asInstanceOf[Double]
    // !(scale > 0) also catches NaN: x/0 or x/NaN quantizes every
    // vector to the all-zero code — a silently meaningless ranking.
    require(scale > 0.0, s"$prettyName: scale must be > 0, got $scale")
    if (!VecGuards.nullFree(left.dataType)) VecGuards.requireNoNulls(prettyName, arr)
    val out = new Array[Byte](arr.numElements())
    var i = 0
    while (i < out.length) { out(i) = quantize(arr.getFloat(i).toDouble, scale); i += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, s) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val q = ctx.freshName("q")
      s"""
         |if (!($s > 0.0)) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: scale must be > 0, got " + $s);
         |}
         |${VecGuards.genGuard(left.dataType, prettyName, a)}
         |final int $n = $a.numElements();
         |final byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  double $q = java.lang.Math.rint((double)$a.getFloat($i) / $s * 127.0);
         |  $out[$i] = (byte) java.lang.Math.max(-127.0, java.lang.Math.min(127.0, $q));
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Integer dot product of two int8-quantized vectors (BINARY): Σ a_i·b_i
  * as a LONG — the quantized-search scoring kernel. Pure integer
  * arithmetic in a tight codegen loop; at 64 dims the true dot is
  * recovered as score·(scale_a·scale_b)/127², but ranking only needs the
  * raw integer. */
case class QuantizedDot(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "quantized_dot"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two BINARY arguments, got ${l.catalogString} and ${r.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    require(x.length == y.length, s"vector size mismatch: ${x.length} vs ${y.length}")
    var s = 0L
    var i = 0
    while (i < x.length) { s += x(i).toLong * y(i).toLong; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |if ($a.length != $b.length) {
         |  throw new IllegalArgumentException("vector size mismatch: " +
         |    $a.length + " vs " + $b.length);
         |}
         |long $s = 0L;
         |for (int $i = 0; $i < $a.length; $i++) {
         |  $s += (long)$a[$i] * (long)$b[$i];
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** All `numTables` sign-LSH bucket ids of a vector in one pass:
  * bucket t packs the sign bits of `numPlanes` Rademacher projections,
  * where the ±1 weight of (flat plane k = t·numPlanes+p, element j) is
  * the parity of the xxhash64 chain over (k, j) — deterministic,
  * seed-free in data, retry-stable. An equivalent
  * `transform`/`zip_with`/`aggregate` HOF form evaluates interpreted
  * (higher-order functions are CodegenFallback) and re-hashes
  * planes×dim PER ROW (~12K hashes/row at the d05 defaults — it was
  * the bench's slowest query); here the sign matrix is data-independent,
  * computed once per executor and cached on the expression instance,
  * and the per-row work is a tight codegen'd multiply-add loop
  * (interpreted eval path folds identically: ±1·x is IEEE-exact ±x,
  * sums j-ascending — the two paths are bit-identical). */
case class LshBuckets(child: Expression, numPlanes: Int, numTables: Int,
    seed: Long = 42L)
    extends UnaryExpression {
  require(numPlanes >= 1 && numPlanes <= 62, s"numPlanes out of range: $numPlanes")
  require(numTables >= 1, s"numTables out of range: $numTables")

  override def prettyName: String = "lsh_buckets"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT>, got ${t.catalogString}")
  }

  /** [k][j] ∈ {+1, −1}; grown (never shrunk) to the largest dimension
    * seen. Volatile so the fully-built matrix is safely published to
    * other task threads (the write happens-after every element store;
    * a racing reader either sees null and recomputes identical content,
    * or the complete matrix — never a half-written one). */
  @transient @volatile private var cachedSigns: Array[Array[Byte]] = _

  def signMatrix(dim: Int): Array[Array[Byte]] = {
    var m = cachedSigns
    if (m == null || m(0).length < dim) {
      m = Array.tabulate(numPlanes * numTables) { k =>
        // Matches Spark's xxhash64(k, j) at the default seed 42, then
        // chains each input; a caller-supplied seed de-correlates
        // independent LSH uses.
        val seedK = XXH64.hashLong(k.toLong, seed)
        Array.tabulate(dim) { j =>
          if ((XXH64.hashLong(j.toLong, seedK) & 1L) == 0L) 1.toByte else -1.toByte
        }
      }
      cachedSigns = m
    }
    m
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (!VecGuards.nullFree(child.dataType)) VecGuards.requireNoNulls(prettyName, v)
    val dim = v.numElements()
    val m = signMatrix(dim)
    val out = new Array[Long](numTables)
    var t = 0
    while (t < numTables) {
      var bucket = 0L
      var p = 0
      while (p < numPlanes) {
        val row = m(t * numPlanes + p)
        var s = 0.0
        var j = 0
        while (j < dim) { s += row(j) * v.getFloat(j).toDouble; j += 1 }
        if (s >= 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("lshBuckets", this, classOf[LshBuckets].getName)
    nullSafeCodeGen(ctx, ev, v => {
      val dim = ctx.freshName("dim")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val bucket = ctx.freshName("bucket")
      val row = ctx.freshName("row")
      s"""
         |${VecGuards.genGuard(child.dataType, prettyName, v)}
         |final int $dim = $v.numElements();
         |final byte[][] $m = $self.signMatrix($dim);
         |final long[] $out = new long[$numTables];
         |for (int $t = 0; $t < $numTables; $t++) {
         |  long $bucket = 0L;
         |  for (int $p = 0; $p < $numPlanes; $p++) {
         |    final byte[] $row = $m[$t * $numPlanes + $p];
         |    double $s = 0.0;
         |    for (int $j = 0; $j < $dim; $j++) {
         |      $s += $row[$j] * (double)$v.getFloat($j);
         |    }
         |    if ($s >= 0) $bucket |= (1L << $p);
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Euclidean nearest-centroid argmin over a driver-trained k×d float
  * matrix: `argmin_i ‖v−cᵢ‖² = argmin_i (‖cᵢ‖²/2 − v·cᵢ)`, index
  * tie-break to the lowest i (strict `<` keeps the first minimum).
  *
  * The equivalent Column form — `array_sort(array(struct(bias₀−dot₀,0),
  * …, struct(bias_{k−1}−dot_{k−1},k−1)))` — inlines k dot-product loops
  * and k struct constructions into the generated method: O(k·d) Java
  * source, which trips Janino method-size limits somewhere past
  * k·d ≈ 16k (k=256, d=64 fails outright). Here the matrix rides the
  * expression instance as a codegen reference object and the generated
  * code is one fixed-size double loop — O(1) source for any k, same
  * left-to-right double arithmetic, bit-identical cluster ids (parity
  * pinned in VectorExpressionsSpec; the s07 pinned census depends on
  * it). */
case class NearestCentroid(child: Expression, centroids: Array[Array[Float]])
    extends UnaryExpression {
  require(centroids.nonEmpty && centroids.forall(_.length == centroids.head.length),
    "centroid matrix must be non-empty and rectangular")

  override def prettyName: String = "nearest_centroid"
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT>, got ${t.catalogString}")
  }

  /** ‖cᵢ‖²/2 with the exact summation order of the former Column form
    * (j-ascending `c_j.toDouble * c_j`, then one division). */
  lazy val biases: Array[Double] = centroids.map { c =>
    var s = 0.0
    var j = 0
    while (j < c.length) { s += c(j).toDouble * c(j); j += 1 }
    s / 2.0
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    require(v.numElements() == centroids(0).length,
      s"vector size mismatch: ${v.numElements()} vs ${centroids(0).length}")
    if (!VecGuards.nullFree(child.dataType)) VecGuards.requireNoNulls(prettyName, v)
    val b = biases
    var best = 0
    var bestScore = Double.PositiveInfinity
    var t = 0
    while (t < centroids.length) {
      val row = centroids(t)
      var s = 0.0
      var j = 0
      while (j < row.length) { s += v.getFloat(j).toDouble * row(j); j += 1 }
      val score = b(t) - s
      if (score < bestScore) { bestScore = score; best = t }
      t += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("nearestCentroid", this, classOf[NearestCentroid].getName)
    nullSafeCodeGen(ctx, ev, v => {
      val m = ctx.freshName("m")
      val bias = ctx.freshName("bias")
      val best = ctx.freshName("best")
      val bestScore = ctx.freshName("bestScore")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val row = ctx.freshName("row")
      val score = ctx.freshName("score")
      s"""
         |final float[][] $m = $self.centroids();
         |final double[] $bias = $self.biases();
         |if ($v.numElements() != $m[0].length) {
         |  throw new IllegalArgumentException("vector size mismatch: " +
         |    $v.numElements() + " vs " + $m[0].length);
         |}
         |${VecGuards.genGuard(child.dataType, prettyName, v)}
         |int $best = 0;
         |double $bestScore = Double.POSITIVE_INFINITY;
         |for (int $t = 0; $t < $m.length; $t++) {
         |  final float[] $row = $m[$t];
         |  double $s = 0.0;
         |  for (int $j = 0; $j < $row.length; $j++) {
         |    $s += (double)$v.getFloat($j) * (double)$row[$j];
         |  }
         |  final double $score = $bias[$t] - $s;
         |  if ($score < $bestScore) { $bestScore = $score; $best = $t; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** dot(v, centroids[i]) for a per-row cluster index `i` — the
  * companion scoring kernel to [[NearestCentroid]] (distance recovery
  * `‖v−cᵢ‖² = ‖v‖² − 2·v·cᵢ + ‖cᵢ‖²` without k inlined dot loops).
  * Same left-to-right double accumulation as [[VectorDot]]. */
case class CentroidDot(left: Expression, right: Expression,
    centroids: Array[Array[Float]]) extends BinaryExpression {
  require(centroids.nonEmpty, "empty centroid matrix")

  override def prettyName: String = "centroid_dot"
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ARRAY<FLOAT>, INT), got ${l.catalogString} and ${r.catalogString}")
  }

  override def nullSafeEval(a: Any, c: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val ci = c.asInstanceOf[Int]
    // The cluster id is DATA (a stored assignment column): stale or
    // foreign ids must fail with context, not a bare AIOOBE.
    require(ci >= 0 && ci < centroids.length,
      s"$prettyName: cluster id $ci outside [0, ${centroids.length})")
    val row = centroids(ci)
    require(v.numElements() == row.length,
      s"vector size mismatch: ${v.numElements()} vs ${row.length}")
    if (!VecGuards.nullFree(left.dataType)) VecGuards.requireNoNulls(prettyName, v)
    var s = 0.0
    var j = 0
    while (j < row.length) { s += v.getFloat(j).toDouble * row(j); j += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("centroidDot", this, classOf[CentroidDot].getName)
    nullSafeCodeGen(ctx, ev, (v, c) => {
      val row = ctx.freshName("row")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      s"""
         |if ($c < 0 || $c >= $self.centroids().length) {
         |  throw new IllegalArgumentException("$prettyName: cluster id " +
         |    $c + " outside [0, " + $self.centroids().length + ")");
         |}
         |final float[] $row = $self.centroids()[$c];
         |if ($v.numElements() != $row.length) {
         |  throw new IllegalArgumentException("vector size mismatch: " +
         |    $v.numElements() + " vs " + $row.length);
         |}
         |${VecGuards.genGuard(left.dataType, prettyName, v)}
         |double $s = 0.0;
         |for (int $j = 0; $j < $row.length; $j++) {
         |  $s += (double)$v.getFloat($j) * (double)$row[$j];
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Johnson–Lindenstrauss dimensionality reduction by a seeded
  * Rademacher projection (Achlioptas '01, "database-friendly random
  * projections"): out[r] = (Σ_j ±1·x[j]) / √outDim, with the ±1 of
  * (row r, element j) drawn from the same xxhash64 chain as
  * [[LshBuckets]] but through a distinct seed stream, so the default
  * seed de-correlates the projection from the default LSH hyperplanes.
  *
  * The scaling makes R an isometry in expectation — E‖Rx‖² = ‖x‖² —
  * so distances and (approximately) cosines survive the reduction;
  * distortion concentrates as ~1/√outDim. Like [[LshBuckets]] the
  * sign matrix is data-independent, built once per executor and cached
  * on the expression instance, and both eval paths accumulate
  * j-ascending in double with one float rounding at the end — codegen
  * and interpreted are bit-identical. Generated source is one fixed
  * nested loop: O(1) in outDim·dim (no Janino-size hazard). */
case class RandomProject(child: Expression, outDim: Int, seed: Long = 42L)
    extends UnaryExpression {
  require(outDim >= 1, s"outDim out of range: $outDim")

  override def prettyName: String = "random_project"
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT>, got ${t.catalogString}")
  }

  /** Same publication discipline as [[LshBuckets.signMatrix]]: volatile
    * cache, grown monotonically, racing recomputes are identical. The
    * 0x5250 ("RP") pre-chain keeps the stream disjoint from LshBuckets'
    * at any shared seed. */
  @transient @volatile private var cachedSigns: Array[Array[Byte]] = _

  def signMatrix(dim: Int): Array[Array[Byte]] = {
    var m = cachedSigns
    if (m == null || m(0).length < dim) {
      val base = XXH64.hashLong(0x5250L, seed)
      m = Array.tabulate(outDim) { r =>
        val seedR = XXH64.hashLong(r.toLong, base)
        Array.tabulate(dim) { j =>
          if ((XXH64.hashLong(j.toLong, seedR) & 1L) == 0L) 1.toByte else -1.toByte
        }
      }
      cachedSigns = m
    }
    m
  }

  def invSqrtOut: Double = 1.0 / java.lang.Math.sqrt(outDim.toDouble)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (!VecGuards.nullFree(child.dataType)) VecGuards.requireNoNulls(prettyName, v)
    val dim = v.numElements()
    val m = signMatrix(dim)
    val scale = invSqrtOut
    val out = new Array[Float](outDim)
    var r = 0
    while (r < outDim) {
      val row = m(r)
      var s = 0.0
      var j = 0
      while (j < dim) { s += row(j) * v.getFloat(j).toDouble; j += 1 }
      out(r) = (s * scale).toFloat
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("randomProject", this, classOf[RandomProject].getName)
    nullSafeCodeGen(ctx, ev, v => {
      val dim = ctx.freshName("dim")
      val m = ctx.freshName("m")
      val scale = ctx.freshName("scale")
      val out = ctx.freshName("out")
      val r = ctx.freshName("r")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val row = ctx.freshName("row")
      s"""
         |${VecGuards.genGuard(child.dataType, prettyName, v)}
         |final int $dim = $v.numElements();
         |final byte[][] $m = $self.signMatrix($dim);
         |final double $scale = $self.invSqrtOut();
         |final float[] $out = new float[$outDim];
         |for (int $r = 0; $r < $outDim; $r++) {
         |  final byte[] $row = $m[$r];
         |  double $s = 0.0;
         |  for (int $j = 0; $j < $dim; $j++) {
         |    $s += $row[$j] * (double)$v.getFloat($j);
         |  }
         |  $out[$r] = (float)($s * $scale);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Projection of a float vector through a FITTED matrix (outDim × d):
  * out[r] = Σ_j M[r][j]·x[j] — the data-DEPENDENT companion of
  * [[RandomProject]] (whose matrix is implicit in a seed). The matrix
  * (a PCA basis, an OPQ rotation, a distilled linear probe — anything
  * trained driver-side) rides the expression instance as a codegen
  * reference object: generated source is one fixed nested loop, O(1)
  * in outDim·d, and both eval paths accumulate j-ascending in double
  * with one float rounding at the end — bit-identical. */
case class MatrixProject(child: Expression, matrix: Array[Array[Float]])
    extends UnaryExpression {
  require(matrix.nonEmpty && matrix.forall(_.length == matrix.head.length),
    "matrix must be non-empty and rectangular")

  override def prettyName: String = "matrix_project"
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT>, got ${t.catalogString}")
  }

  def outDim: Int = matrix.length
  def inDim: Int = matrix.head.length

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    require(v.numElements() == inDim,
      s"vector size mismatch: ${v.numElements()} vs $inDim")
    if (!VecGuards.nullFree(child.dataType)) VecGuards.requireNoNulls(prettyName, v)
    val out = new Array[Float](outDim)
    var r = 0
    while (r < outDim) {
      val row = matrix(r)
      var s = 0.0
      var j = 0
      while (j < inDim) { s += row(j).toDouble * v.getFloat(j).toDouble; j += 1 }
      out(r) = s.toFloat
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("matrixProject", this, classOf[MatrixProject].getName)
    nullSafeCodeGen(ctx, ev, v => {
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val r = ctx.freshName("r")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val row = ctx.freshName("row")
      val inDimV = inDim
      val outDimV = outDim
      s"""
         |final float[][] $m = $self.matrix();
         |if ($v.numElements() != $inDimV) {
         |  throw new IllegalArgumentException("vector size mismatch: " +
         |    $v.numElements() + " vs " + $inDimV);
         |}
         |${VecGuards.genGuard(child.dataType, prettyName, v)}
         |final float[] $out = new float[$outDimV];
         |for (int $r = 0; $r < $outDimV; $r++) {
         |  final float[] $row = $m[$r];
         |  double $s = 0.0;
         |  for (int $j = 0; $j < $inDimV; $j++) {
         |    $s += (double)$row[$j] * (double)$v.getFloat($j);
         |  }
         |  $out[$r] = (float)$s;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Product-quantization encoder (Jégou et al. '11, "Product
  * quantization for nearest neighbor search"): the vector splits into
  * `m` contiguous subvectors of width d/m; subvector `s` is replaced by
  * the index of its Euclidean-nearest codeword in `codebooks(s)` —
  * the same biased-argmin rule as [[NearestCentroid]], once per
  * subspace — and the output is the m-byte BINARY code word. At
  * codebookSize 256 a 64-dim float vector (256 bytes) compresses to
  * 8 bytes: the corpus representation a billion-scale ANN scan
  * actually streams. Codebooks ride the expression instance as a
  * codegen reference object — generated source is one fixed triple
  * loop, O(1) in m·k·d (no Janino-size hazard), and the interpreted
  * path runs the identical j-ascending double arithmetic. */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression {
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty), "empty codebooks")
  require(codebooks.forall(_.length <= 256),
    s"codebook size ${codebooks.map(_.length).max} > 256 cannot encode in one byte")
  // EVERY row, not just each codebook's head: a ragged row inside a
  // codebook would crash (shorter) or silently truncate (longer).
  require(codebooks.forall(_.forall(_.length == codebooks.head.head.length)),
    "codebook rows must all have one subspace width")

  override def prettyName: String = "pq_encode"
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT>, got ${t.catalogString}")
  }

  def numSub: Int = codebooks.length
  def subDim: Int = codebooks.head.head.length

  /** ‖c‖²/2 per (subspace, code) — same j-ascending summation as
    * [[NearestCentroid.biases]]. */
  lazy val biases: Array[Array[Double]] = codebooks.map(_.map { c =>
    var s = 0.0
    var j = 0
    while (j < c.length) { s += c(j).toDouble * c(j); j += 1 }
    s / 2.0
  })

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    require(v.numElements() == numSub * subDim,
      s"vector size mismatch: ${v.numElements()} vs ${numSub}x$subDim")
    if (!VecGuards.nullFree(child.dataType)) VecGuards.requireNoNulls(prettyName, v)
    val out = new Array[Byte](numSub)
    var sub = 0
    while (sub < numSub) {
      val book = codebooks(sub)
      val bias = biases(sub)
      val off = sub * subDim
      var best = 0
      var bestScore = Double.PositiveInfinity
      var c = 0
      while (c < book.length) {
        val row = book(c)
        var s = 0.0
        var j = 0
        while (j < subDim) { s += v.getFloat(off + j).toDouble * row(j); j += 1 }
        val score = bias(c) - s
        if (score < bestScore) { bestScore = score; best = c }
        c += 1
      }
      out(sub) = best.toByte
      sub += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, v => {
      val books = ctx.freshName("books")
      val biasT = ctx.freshName("biasT")
      val out = ctx.freshName("out")
      val sub = ctx.freshName("sub")
      val off = ctx.freshName("off")
      val book = ctx.freshName("book")
      val bias = ctx.freshName("bias")
      val best = ctx.freshName("best")
      val bestScore = ctx.freshName("bestScore")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val row = ctx.freshName("row")
      val score = ctx.freshName("score")
      val subDimV = subDim
      val numSubV = numSub
      s"""
         |final float[][][] $books = $self.codebooks();
         |final double[][] $biasT = $self.biases();
         |if ($v.numElements() != $numSubV * $subDimV) {
         |  throw new IllegalArgumentException("vector size mismatch: " +
         |    $v.numElements() + " vs " + ($numSubV * $subDimV));
         |}
         |${VecGuards.genGuard(child.dataType, prettyName, v)}
         |final byte[] $out = new byte[$numSubV];
         |for (int $sub = 0; $sub < $numSubV; $sub++) {
         |  final float[][] $book = $books[$sub];
         |  final double[] $bias = $biasT[$sub];
         |  final int $off = $sub * $subDimV;
         |  int $best = 0;
         |  double $bestScore = Double.POSITIVE_INFINITY;
         |  for (int $c = 0; $c < $book.length; $c++) {
         |    final float[] $row = $book[$c];
         |    double $s = 0.0;
         |    for (int $j = 0; $j < $subDimV; $j++) {
         |      $s += (double)$v.getFloat($off + $j) * (double)$row[$j];
         |    }
         |    final double $score = $bias[$c] - $s;
         |    if ($score < $bestScore) { $bestScore = $score; $best = $c; }
         |  }
         |  $out[$sub] = (byte)$best;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The query-side half of asymmetric distance computation (ADC): the
  * flat m·k lookup table lut[s·k + c] = q_s · codebooks(s)(c) — every
  * dot product a PQ-coded scan could need for this query, computed
  * ONCE per query row (cost m·k·d/m = k·d multiply-adds, i.e. one
  * brute scan over k imaginary rows) so the per-candidate score in
  * [[PqAdc]] collapses to m array reads. Same reference-object
  * codegen shape as [[PqEncode]]; double entries keep the downstream
  * sum bit-identical between codegen and interpreted paths. */
case class PqLut(child: Expression, codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression {
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty), "empty codebooks")
  require(codebooks.forall(_.length == codebooks.head.length),
    "codebook sizes differ across subspaces")
  require(codebooks.forall(_.forall(_.length == codebooks.head.head.length)),
    "codebook rows must all have one subspace width")

  override def prettyName: String = "pq_lut"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT>, got ${t.catalogString}")
  }

  def numSub: Int = codebooks.length
  def subDim: Int = codebooks.head.head.length
  def bookSize: Int = codebooks.head.length

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    require(v.numElements() == numSub * subDim,
      s"vector size mismatch: ${v.numElements()} vs ${numSub}x$subDim")
    if (!VecGuards.nullFree(child.dataType)) VecGuards.requireNoNulls(prettyName, v)
    val k = bookSize
    val out = new Array[Double](numSub * k)
    var sub = 0
    while (sub < numSub) {
      val book = codebooks(sub)
      val off = sub * subDim
      var c = 0
      while (c < k) {
        val row = book(c)
        var s = 0.0
        var j = 0
        while (j < subDim) { s += v.getFloat(off + j).toDouble * row(j); j += 1 }
        out(sub * k + c) = s
        c += 1
      }
      sub += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqLut", this, classOf[PqLut].getName)
    nullSafeCodeGen(ctx, ev, v => {
      val books = ctx.freshName("books")
      val out = ctx.freshName("out")
      val sub = ctx.freshName("sub")
      val off = ctx.freshName("off")
      val book = ctx.freshName("book")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val row = ctx.freshName("row")
      val subDimV = subDim
      val numSubV = numSub
      val kV = bookSize
      s"""
         |final float[][][] $books = $self.codebooks();
         |if ($v.numElements() != $numSubV * $subDimV) {
         |  throw new IllegalArgumentException("vector size mismatch: " +
         |    $v.numElements() + " vs " + ($numSubV * $subDimV));
         |}
         |${VecGuards.genGuard(child.dataType, prettyName, v)}
         |final double[] $out = new double[$numSubV * $kV];
         |for (int $sub = 0; $sub < $numSubV; $sub++) {
         |  final float[][] $book = $books[$sub];
         |  final int $off = $sub * $subDimV;
         |  for (int $c = 0; $c < $kV; $c++) {
         |    final float[] $row = $book[$c];
         |    double $s = 0.0;
         |    for (int $j = 0; $j < $subDimV; $j++) {
         |      $s += (double)$v.getFloat($off + $j) * (double)$row[$j];
         |    }
         |    $out[$sub * $kV + $c] = $s;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ADC score of one PQ-coded candidate against one query LUT:
  * Σ_s lut[s·k + code_s] ≈ q·x, in m array reads — the entire
  * per-pair cost of a PQ scan (the float vectors never appear).
  * `k` is recovered as lut.length / codes.length, so the expression
  * needs no codebook reference at all. Left-to-right double adds in
  * both paths. */
case class PqAdc(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "pq_adc"
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), BinaryType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ARRAY<DOUBLE> lut, BINARY codes), got " +
        s"${l.catalogString} and ${r.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val lut = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[Array[Byte]]
    require(codes.length > 0 && lut.numElements() % codes.length == 0,
      s"LUT size ${lut.numElements()} not a multiple of code length ${codes.length}")
    if (!VecGuards.nullFree(left.dataType)) VecGuards.requireNoNulls(prettyName, lut)
    val k = lut.numElements() / codes.length
    var s = 0.0
    var sub = 0
    while (sub < codes.length) {
      val c = codes(sub) & 0xFF
      // k is only RECOVERED from the shapes — codes written with a
      // larger codebook than the LUT's would otherwise read another
      // subspace's slot (or past the array) silently.
      require(c < k, s"$prettyName: code $c at subspace $sub outside " +
        s"codebook size $k — codes and LUT come from different codebooks")
      s += lut.getDouble(sub * k + c)
      sub += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lut, codes) => {
      val k = ctx.freshName("k")
      val s = ctx.freshName("s")
      val sub = ctx.freshName("sub")
      val c = ctx.freshName("c")
      s"""
         |if ($codes.length == 0 || $lut.numElements() % $codes.length != 0) {
         |  throw new IllegalArgumentException("LUT size " + $lut.numElements() +
         |    " not a multiple of code length " + $codes.length);
         |}
         |${VecGuards.genGuard(left.dataType, prettyName, lut)}
         |final int $k = $lut.numElements() / $codes.length;
         |double $s = 0.0;
         |for (int $sub = 0; $sub < $codes.length; $sub++) {
         |  final int $c = $codes[$sub] & 0xFF;
         |  if ($c >= $k) {
         |    throw new IllegalArgumentException("$prettyName: code " + $c +
         |      " at subspace " + $sub + " outside codebook size " + $k +
         |      " — codes and LUT come from different codebooks");
         |  }
         |  $s += $lut.getDouble($sub * $k + $c);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column-level entry points for the native expressions. */
object VectorFunctions {
  def vector_dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(VectorDot(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def vector_l2(a: Column, b: Column): Column =
    GraftColumnBridge.column(VectorL2(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def vector_norm(a: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    sqrt(vector_dot(a, a))
  }

  def vector_cosine(a: Column, b: Column): Column =
    vector_dot(a, b) / (vector_norm(a) * vector_norm(b))

  /** The reference NND similarity kernel, 1/(1+L2). */
  def vector_l2_sim(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.lit
    lit(1.0) / (lit(1.0) + vector_l2(a, b))
  }

  /** Cosine over a precomputed dot product and norms, guarded for the
    * RANKING paths: a zero-norm side has no direction, and the naive
    * dot/(n_q·n_c) yields NaN there — which Spark orders ABOVE every
    * real value under `desc`, so one degenerate corpus vector would
    * rank #1 for every query (and primitive-double NaN comparisons
    * break the streaming top-k aggregator's merge ordering). The guard
    * scores it −2.0, strictly below any real cosine: it can only
    * surface when a query has fewer than k real candidates, where it
    * is a visibly-degenerate tail entry rather than a silent winner.
    * Threshold-filtered paths (near-dup `cosine >= t`) are naturally
    * NaN-safe and keep the raw form. For non-degenerate rows the
    * branch computes the IDENTICAL division, so oracle/pin parity is
    * untouched. */
  def cosine_ranked(dot: Column, nq: Column, nc: Column): Column = {
    import org.apache.spark.sql.functions.{lit, when}
    when(nq * nc > 0.0, dot / (nq * nc)).otherwise(lit(-2.0))
  }

  def vector_quantize(a: Column, scale: Column): Column =
    GraftColumnBridge.column(VectorQuantize(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(scale)))

  def quantized_dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(QuantizedDot(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def lsh_buckets(v: Column, numPlanes: Int, numTables: Int, seed: Long = 42L): Column =
    GraftColumnBridge.column(LshBuckets(
      GraftColumnBridge.expression(v), numPlanes, numTables, seed))

  def random_project(v: Column, outDim: Int, seed: Long = 42L): Column =
    GraftColumnBridge.column(RandomProject(
      GraftColumnBridge.expression(v), outDim, seed))

  def nearest_centroid(v: Column, centroids: Array[Array[Float]]): Column =
    GraftColumnBridge.column(NearestCentroid(
      GraftColumnBridge.expression(v), centroids))

  def centroid_dot(v: Column, cluster: Column, centroids: Array[Array[Float]]): Column =
    GraftColumnBridge.column(CentroidDot(
      GraftColumnBridge.expression(v), GraftColumnBridge.expression(cluster), centroids))

  def pq_encode(v: Column, codebooks: Array[Array[Array[Float]]]): Column =
    GraftColumnBridge.column(PqEncode(GraftColumnBridge.expression(v), codebooks))

  def pq_lut(v: Column, codebooks: Array[Array[Array[Float]]]): Column =
    GraftColumnBridge.column(PqLut(GraftColumnBridge.expression(v), codebooks))

  def pq_adc(lut: Column, codes: Column): Column =
    GraftColumnBridge.column(PqAdc(
      GraftColumnBridge.expression(lut), GraftColumnBridge.expression(codes)))

  def matrix_project(v: Column, matrix: Array[Array[Float]]): Column =
    GraftColumnBridge.column(MatrixProject(GraftColumnBridge.expression(v), matrix))
}
