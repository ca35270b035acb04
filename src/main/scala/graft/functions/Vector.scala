package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Compiled vector kernels for the embedding operators.
  *
  * Semantics are EXACTLY the declarative form shared with the DuckDB
  * oracles (see operators.Similarity): float elements widened to
  * double, dot/norms accumulated left-to-right in index order,
  * `cos = dot / sqrt(na * nb)`, emitted as `floor(cos * 1e6)` BIGINT —
  * bit-for-bit what `aggregate(zip_with(...))` computes, minus the
  * per-element interpreted lambda frames.
  */
object VectorOps {

  /** floor(|A∩B| * 10000 / |A∪B|) over string arrays treated as sets;
    * null when the union is empty. Codegen target for [[JaccardE4]] —
    * derived from the [[overlapStats]] triple (|A∪B| = |A|+|B|-|A∩B|)
    * so there is exactly ONE distinct-set loop to keep correct.
    */
  def jaccardE4(a: ArrayData, b: ArrayData): java.lang.Long = {
    val st = overlapStats(a, b)
    val inter = st.getLong(0)
    val union = st.getLong(1) + st.getLong(2) - inter
    if (union == 0L) null else java.lang.Long.valueOf(inter * 10000L / union)
  }

  /** [|A∩B|, |A|, |B|] over distinct elements in one pass — codegen
    * target for [[OverlapStats]].
    */
  def overlapStats(a: ArrayData, b: ArrayData): ArrayData = {
    val setA = new java.util.HashSet[Any]()
    var i = 0
    while (i < a.numElements()) { setA.add(a.getUTF8String(i)); i += 1 }
    val seenB = new java.util.HashSet[Any]()
    var inter = 0L
    i = 0
    while (i < b.numElements()) {
      val v = b.getUTF8String(i)
      if (seenB.add(v) && setA.contains(v)) inter += 1
      i += 1
    }
    new GenericArrayData(Array(inter, setA.size.toLong, seenB.size.toLong))
  }

  /** floor(1e6 * cosine) over two float arrays; null on length
    * mismatch or zero norm (same as the declarative NaN/零 guard-free
    * behavior: division by zero yields NaN → floor → overflow; we
    * return null instead, and inputs in this dataset never hit it).
    */
  def cosineE6(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val denom = math.sqrt(na * nb)
    if (denom == 0.0) return null
    math.floor(dot / denom * 1000000).toLong
  }

  /** [scale_e6, code_checksum, code_min, code_max, err_e6_sum] of the
    * symmetric int8 quantization of a float vector — one pass computing
    * what the declarative chain (5 higher-order functions with
    * interpreted lambda frames) computes; bit-for-bit the e6
    * fixed-point arithmetic in operators.Similarity.quantizeFrames'
    * oracle twin. Codegen target for [[QuantizeStats]].
    */
  def quantizeStats(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val ve6 = new Array[Long](n)
    var m6 = 0L
    var i = 0
    while (i < n) {
      val v = math.floor(a.getFloat(i).toDouble * 1000000).toLong
      ve6(i) = v
      val abs = if (v < 0) -v else v
      if (abs > m6) m6 = abs
      i += 1
    }
    var checksum = 0L
    var err = 0L
    var cMin = Long.MaxValue
    var cMax = Long.MinValue
    i = 0
    while (i < n) {
      val c = if (m6 == 0) 0L else ve6(i) * 127 / m6
      checksum += c * (i + 1)
      err += math.abs(ve6(i) - (if (m6 == 0) 0L else c * m6 / 127))
      if (c < cMin) cMin = c
      if (c > cMax) cMax = c
      i += 1
    }
    if (n == 0) { cMin = 0L; cMax = 0L }
    new GenericArrayData(Array(m6, checksum, cMin, cMax, err))
  }

  /** array<float> → [q_0 … q_{n-1}, Σ q², signBucket] with
    * q_i = floor(x_i · 1000) — the embedding-outlier per-row sufficient
    * stats in ONE compiled pass (e3 quantize + self-dot + strided sign
    * bucket), replacing three interpreted higher-order lambdas over the
    * corpus. Bucket bit k = sign of element stride·k with
    * stride = n/planes — bit-for-bit operators.Similarity.bucketSpark.
    * Codegen target for [[OutlierStats]].
    */
  def outlierStats(a: ArrayData, planes: Int): ArrayData = {
    val n = a.numElements()
    val out = new Array[Long](n + 2)
    var t = 0L
    var i = 0
    while (i < n) {
      val q = math.floor(a.getFloat(i).toDouble * 1000).toLong
      out(i) = q
      t += q * q
      i += 1
    }
    out(n) = t
    val stride = if (planes > 0) n / planes else 0
    var b = 0L
    if (stride > 0) {
      var k = 0
      while (k < planes) {
        if (a.getFloat(stride * k) >= 0f) b |= (1L << k)
        k += 1
      }
    }
    out(n + 1) = b
    new GenericArrayData(out)
  }

  /** Σ a_i·b_i over the common prefix of two long arrays — compiled
    * replacement for `aggregate(zip_with(a, b, …))`. The min-length
    * contract lets a stats-suffixed array (e.g. [[outlierStats]]'s
    * [q…, t, bucket]) dot a plain one without slicing a copy. Codegen
    * target for [[DotLong]].
    */
  def dotLong(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += a.getLong(i) * b.getLong(i); i += 1 }
    acc
  }

  /** Bit-for-bit twin of `aggregate(zip_with(a, b, (x, y) -> x * y),
    * 0L, (acc, v) -> acc + v)` — the codegen target the
    * [[graft.DotKernelCompile]] optimizer rule rewrites that pattern
    * to. Semantics faithfully reproduced, not simplified:
    * zip_with pads a length mismatch with nulls → a null product →
    * the fold goes null; a null ELEMENT does the same; and under ANSI
    * every pairwise product is still overflow-CHECKED even after the
    * accumulator has gone null (zip_with materializes all products
    * before the fold), while accumulation stops being checked once
    * null (Add(null, v) short-circuits) — hence the sawNull split
    * below.
    */
  def dotLongExact(a: ArrayData, b: ArrayData,
      failOnOverflow: Boolean): java.lang.Long = {
    val nA = a.numElements()
    val nB = b.numElements()
    val n = math.max(nA, nB)
    var acc = 0L
    var sawNull = false
    var i = 0
    while (i < n) {
      if (i >= nA || i >= nB || a.isNullAt(i) || b.isNullAt(i)) sawNull = true
      else {
        val p =
          if (failOnOverflow) Math.multiplyExact(a.getLong(i), b.getLong(i))
          else a.getLong(i) * b.getLong(i)
        if (!sawNull)
          acc = if (failOnOverflow) Math.addExact(acc, p) else acc + p
      }
      i += 1
    }
    if (sawNull) null else java.lang.Long.valueOf(acc)
  }
}

/** Exact Jaccard over two string arrays (distinct-element sets),
  * scaled 1e4: |A∩B| * 10000 div |A∪B| — one hash-set pass instead of
  * array_intersect + array_union (two O(n) allocations per pair, and
  * the hot inner loop of the LSH candidate→verify funnel). Null if
  * either side is null; null on two empty sets (0/0).
  */
case class JaccardE4(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "jaccard_e4"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"expected two array<string>, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = VectorOps.jaccardE4(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = VectorOps.getClass.getName.stripSuffix("$")
    // freshName: with non-nullable children nullSafeCodeGen inlines this
    // block unbraced, so a fixed local name would collide across
    // instances in one codegen scope (janino error → interpreted fallback)
    val r = ctx.freshName("jac")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""java.lang.Long $r = $helper.jaccardE4($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }"""
        .stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardE4 =
    copy(left = newLeft, right = newRight)
}

/** (array<float>, array<float>) → floor(cosine * 1e6) as long. */
case class CosineSimE6(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_e6"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"expected two array<float>, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = VectorOps.cosineE6(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = VectorOps.getClass.getName.stripSuffix("$")
    val r = ctx.freshName("cos")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""java.lang.Long $r = $helper.cosineE6($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }"""
        .stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimE6 =
    copy(left = newLeft, right = newRight)
}

/** array<float> → [scale_e6, code_checksum, code_min, code_max,
  * err_e6_sum] int8-quantization statistics in one compiled pass (see
  * [[VectorOps.quantizeStats]]).
  */
case class QuantizeStats(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "quantize_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"expected array<float>, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    VectorOps.quantizeStats(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = VectorOps.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$helper.quantizeStats($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): QuantizeStats =
    copy(child = newChild)
}

/** array<float> → [q…, Σq², bucket] one-pass embedding-outlier stats
  * (see [[VectorOps.outlierStats]]); `planes` is a plan-time constant.
  */
case class OutlierStats(child: Expression, planes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "outlier_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"expected array<float>, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    VectorOps.outlierStats(v.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = VectorOps.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$helper.outlierStats($c, $planes)")
  }

  override protected def withNewChildInternal(newChild: Expression): OutlierStats =
    copy(child = newChild)
}

/** (array<long>, array<long>) → Σ a_i·b_i over the common prefix (see
  * [[VectorOps.dotLong]]).
  */
case class DotLong(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_long"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"expected two array<long>, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dotLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = VectorOps.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (a, b) => s"$helper.dotLong($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotLong =
    copy(left = newLeft, right = newRight)
}

/** Compiled twin of the declarative long dot-product fold (see
  * [[VectorOps.dotLongExact]]); planted by [[graft.DotKernelCompile]],
  * never constructed by the operator modules directly (they use
  * [[DotLong]]'s min-length contract). `failOnOverflow` captures the
  * matched Multiply/Add eval mode at rule time.
  */
case class DotLongExact(left: Expression, right: Expression,
    failOnOverflow: Boolean) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_long_exact"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"expected two array<long>, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = VectorOps.dotLongExact(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], failOnOverflow)
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = VectorOps.getClass.getName.stripSuffix("$")
    val r = ctx.freshName("dot")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""java.lang.Long $r = $helper.dotLongExact($a, $b, $failOnOverflow);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }"""
        .stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotLongExact =
    copy(left = newLeft, right = newRight)
}

/** Evaluation barrier: identity on its child that optimizer rules must
  * not look through. Declaring itself non-deterministic stops
  * PushDownPredicates (and CollapseProject) from substituting the child
  * into a parent Filter — without it, a threshold filter over an
  * expensive projected kernel (e.g. `cos_e6 >= t`) is pushed below the
  * Project and the kernel evaluates TWICE per surviving row. Runtime
  * cost is zero: both eval and codegen are the child's own.
  *
  * This is the named replacement for the `monotonically_increasing_id`
  * side-column idiom — it says what it means and adds no fake column.
  *
  * Placement restriction (the price of deterministic=false): analysis
  * only admits non-deterministic expressions in Project, Filter,
  * Aggregate and Window operators — using this in a join condition,
  * sort key, or generator fails CheckAnalysis. Wrap a projected column
  * (as the operators here do), not an arbitrary expression position.
  */
case class Materialize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "materialize"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.genCode(ctx)
  override protected def withNewChildInternal(newChild: Expression): Materialize =
    copy(child = newChild)
}

/** (array<string>, array<string>) → [|A∩B|, |A|, |B|] over DISTINCT
  * elements, in one pass — the primitive behind both Jaccard and the
  * asymmetric containment scores (c(A→B) = |A∩B|/|A| catches a short
  * doc embedded in a long one, which symmetric Jaccard dilutes away).
  */
case class OverlapStats(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "overlap_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"expected two array<string>, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.overlapStats(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = VectorOps.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (a, b) => s"$helper.overlapStats($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): OverlapStats =
    copy(left = newLeft, right = newRight)
}
