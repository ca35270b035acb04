package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Lossless uint256 carrier: 32-byte big-endian binary.
  *
  * The reference converts every PG `numeric` column (which holds uint256
  * on-chain values, up to 78 decimal digits — beyond Spark's
  * DecimalType(38)) to `int(x).to_bytes(32, "big")`
  * (subgraph_extractor/cli.py:139-141). Fixed-width big-endian bytes are
  * sortable with Spark's native unsigned-lexicographic BinaryType
  * ordering, so range predicates, sorts, and joins on the carrier need no
  * custom comparators — only arithmetic needs these helpers.
  *
  * Static methods here are the codegen targets for the Catalyst
  * expressions below (whole-stage codegen emits direct static calls — no
  * interpreted fallback, no UDF serialization overhead on the hot path).
  */
object Uint256 {
  val Width = 32
  private val Max = BigInteger.ONE.shiftLeft(256).subtract(BigInteger.ONE)

  def encode(v: BigInteger): Array[Byte] = {
    if (v.signum() < 0)
      throw new IllegalArgumentException(s"uint256 cannot encode negative value $v")
    if (v.compareTo(Max) > 0)
      throw new IllegalArgumentException(s"value exceeds uint256 range: $v")
    val raw = v.toByteArray // may carry a leading 0x00 sign byte, may be short
    val out = new Array[Byte](Width)
    val src = if (raw.length > Width) raw.length - Width else 0
    val len = raw.length - src
    System.arraycopy(raw, src, out, Width - len, len)
    out
  }

  /** Long fast path: writes the 8 value bytes directly — no BigInteger,
    * no sign-byte trimming. Hot for cents/gwei-scale columns, where
    * every value fits a long.
    */
  def encodeLong(v: Long): Array[Byte] = {
    if (v < 0)
      throw new IllegalArgumentException(s"uint256 cannot encode negative value $v")
    val out = new Array[Byte](Width)
    var x = v
    var i = Width - 1
    while (x != 0) {
      out(i) = (x & 0xff).toByte
      x >>>= 8
      i -= 1
    }
    out
  }

  def encodeDecimal(d: Decimal): Array[Byte] =
    // scale-0 decimals up to 18 digits always fit a long (< 9.2e18)
    if (d.scale == 0 && d.precision <= 18) encodeLong(d.toUnscaledLong)
    else encode(d.toJavaBigDecimal.toBigIntegerExact)

  def encodeString(s: UTF8String): Array[Byte] =
    encode(new BigInteger(s.toString.trim))

  def decode(b: Array[Byte]): BigInteger = new BigInteger(1, b)

  /** >= 0 when the carrier value fits a non-negative long (top 25 bytes
    * clear of the sign bit), returning that long; -1 otherwise. The
    * common case for cents/gwei-scale columns — lets div/decode skip
    * BigInteger entirely.
    */
  private def asLongOrNeg(b: Array[Byte]): Long = {
    if (b.length != Width) return -1L // non-canonical input → slow path
    var i = 0
    while (i < Width - 8 && b(i) == 0) i += 1
    if (i < Width - 8 || (b(Width - 8) & 0x80) != 0) return -1L
    var v = 0L
    var j = Width - 8
    while (j < Width) { v = (v << 8) | (b(j) & 0xffL); j += 1 }
    v
  }

  /** Narrow to Decimal(38,0); throws if the value needs > 38 digits. */
  def decodeDecimal(b: Array[Byte]): Decimal = {
    val fast = asLongOrNeg(b)
    if (fast >= 0) return Decimal(java.math.BigDecimal.valueOf(fast), 38, 0)
    val bi = decode(b)
    if (bi.toString.length > 38)
      throw new ArithmeticException(s"uint256 value does not fit Decimal(38,0): $bi")
    Decimal(new java.math.BigDecimal(bi), 38, 0)
  }

  /** Integer floor division on the carrier (reference downscale semantics,
    * cli.py:115-119 — documented-lossy wei→gwei style rescaling).
    */
  def divideLong(b: Array[Byte], divisor: Long): Array[Byte] = {
    val fast = asLongOrNeg(b)
    if (fast >= 0) encodeLong(fast / divisor)
    else encode(decode(b).divide(BigInteger.valueOf(divisor)))
  }

  /** Validates like encode (non-negative, fits uint256) and rescales to
    * (38,0) like decodeDecimal, without materializing the carrier.
    */
  def checkedDecimal(d: Decimal): Decimal = {
    val bi = d.toJavaBigDecimal.toBigIntegerExact
    if (bi.signum() < 0)
      throw new IllegalArgumentException(s"uint256 cannot encode negative value $bi")
    Decimal(new java.math.BigDecimal(bi), 38, 0)
  }

  def divide(b: Array[Byte], divisor: Array[Byte]): Array[Byte] =
    encode(decode(b).divide(decode(divisor)))

  /** Carrier × carrier. On-chain math multiplies amounts (price × qty,
    * wei × rate) before dividing; a product past 2²⁵⁶-1 throws loudly
    * (encode's range check) rather than wrapping — same discipline as
    * [[Uint256Sum]]. Long fast path: an n-bit × m-bit product has at
    * most n+m bits, so nlz(a)+nlz(b) ≥ 65 ⇒ ≤ 63 bits ⇒ the primitive
    * multiply cannot overflow.
    */
  def multiply(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val fa = asLongOrNeg(a)
    val fb = asLongOrNeg(b)
    if (fa >= 0 && fb >= 0 &&
        java.lang.Long.numberOfLeadingZeros(fa) +
          java.lang.Long.numberOfLeadingZeros(fb) >= 65)
      encodeLong(fa * fb)
    else encode(decode(a).multiply(decode(b)))
  }

  /** Codegen target for [[Uint256Div]]: null (not ArithmeticException)
    * on zero divisor.
    */
  def divideOrNull(b: Array[Byte], divisor: Array[Byte]): Array[Byte] = {
    val d = decode(divisor)
    if (d.signum() == 0) null else encode(decode(b).divide(d))
  }
}

/** numeric (decimal / string / integral) → 32-byte big-endian binary. */
case class Uint256Encode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "uint256_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: DecimalType | StringType | LongType | IntegerType | ShortType | ByteType =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"uint256_encode needs decimal/string/integral input, got $other")
  }

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case _: DecimalType => Uint256.encodeDecimal(v.asInstanceOf[Decimal])
    case StringType     => Uint256.encodeString(v.asInstanceOf[UTF8String])
    case LongType       => Uint256.encodeLong(v.asInstanceOf[Long])
    case IntegerType    => Uint256.encodeLong(v.asInstanceOf[Int].toLong)
    case ShortType      => Uint256.encodeLong(v.asInstanceOf[Short].toLong)
    case ByteType       => Uint256.encodeLong(v.asInstanceOf[Byte].toLong)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = Uint256.getClass.getName.stripSuffix("$") // graft.functions.Uint256
    val call = child.dataType match {
      case _: DecimalType => (c: String) => s"$helper.encodeDecimal($c)"
      case StringType     => (c: String) => s"$helper.encodeString($c)"
      case _              => (c: String) => s"$helper.encodeLong((long)$c)"
    }
    defineCodeGen(ctx, ev, call)
  }

  override protected def withNewChildInternal(newChild: Expression): Uint256Encode =
    copy(child = newChild)
}

/** 32-byte binary → Decimal(38,0) (throws when the value needs >38 digits). */
case class Uint256ToDecimal(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DecimalType(38, 0)
  override def prettyName: String = "uint256_to_decimal"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other      => TypeCheckResult.TypeCheckFailure(s"expected binary, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    Uint256.decodeDecimal(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = Uint256.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$helper.decodeDecimal($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Uint256ToDecimal =
    copy(child = newChild)
}

/** Validated decimal identity: semantically equal to
  * `uint256_to_decimal(uint256_encode(x))` for decimal inputs — rejects
  * negatives exactly like the encode step — but skips materializing the
  * 32-byte carrier. Installed by the optimizer rule
  * [[graft.Uint256Simplification]]; never user-facing.
  */
case class Uint256RoundTrip(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DecimalType(38, 0)
  override def prettyName: String = "uint256_roundtrip"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: DecimalType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected decimal, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    Uint256.checkedDecimal(v.asInstanceOf[Decimal])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = Uint256.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$helper.checkedDecimal($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Uint256RoundTrip =
    copy(child = newChild)
}

/** Floor-divide one carrier by another (column divisor — e.g. token
  * amounts divided by per-row decimals). Null on division by zero.
  */
case class Uint256Div(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "uint256_div_col"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(s"expected (binary, binary), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val d = Uint256.decode(b.asInstanceOf[Array[Byte]])
    if (d.signum() == 0) null
    else Uint256.encode(
      Uint256.decode(a.asInstanceOf[Array[Byte]]).divide(d))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = Uint256.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""byte[] r = $helper.divideOrNull($a, $b);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r; }""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Uint256Div =
    copy(left = newLeft, right = newRight)
}

/** Multiply two carriers (throws past 2^256 — never wraps). */
case class Uint256Mul(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "uint256_mul"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(s"expected (binary, binary), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    Uint256.multiply(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = Uint256.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (a, b) => s"$helper.multiply($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Uint256Mul =
    copy(left = newLeft, right = newRight)
}

/** Floor-divide the carrier by a positive long divisor (downscale). */
case class Uint256DivLong(child: Expression, divisor: Long) extends UnaryExpression {
  require(divisor > 0, s"divisor must be positive: $divisor")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "uint256_div"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other      => TypeCheckResult.TypeCheckFailure(s"expected binary, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    Uint256.divideLong(v.asInstanceOf[Array[Byte]], divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = Uint256.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$helper.divideLong($c, ${divisor}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): Uint256DivLong =
    copy(child = newChild)
}

/** Sum aggregate over the uint256 carrier — the UDAF member of the
  * family (SURVEY.md §2.11 notes none is needed for parity; summing
  * on-chain token amounts is the first thing a real user does beyond
  * it). State is a single BigInteger, merged associatively, so partial
  * (map-side) aggregation applies as usual and only 32-byte-ish buffers
  * cross the shuffle. Null inputs are ignored; an all-null/empty group
  * yields null (SQL SUM semantics); a total exceeding 2^256 throws
  * loudly rather than wrapping — the output remains a valid carrier.
  */
case class Uint256Sum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate
    .TypedImperativeAggregate[BigInteger] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "uint256_sum"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other      => TypeCheckResult.TypeCheckFailure(s"expected binary carrier, got $other")
  }

  // null buffer = "no input seen yet" → SQL SUM's null on empty groups
  override def createAggregationBuffer(): BigInteger = null

  override def update(buffer: BigInteger, input: org.apache.spark.sql.catalyst.InternalRow): BigInteger = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val x = Uint256.decode(v.asInstanceOf[Array[Byte]])
      if (buffer == null) x else buffer.add(x)
    }
  }

  override def merge(buffer: BigInteger, other: BigInteger): BigInteger =
    if (buffer == null) other
    else if (other == null) buffer
    else buffer.add(other)

  override def eval(buffer: BigInteger): Any =
    if (buffer == null) null else Uint256.encode(buffer)

  override def serialize(buffer: BigInteger): Array[Byte] =
    if (buffer == null) Array.emptyByteArray else buffer.toByteArray

  override def deserialize(storageFormat: Array[Byte]): BigInteger =
    if (storageFormat.isEmpty) null else new BigInteger(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): Uint256Sum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): Uint256Sum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Uint256Sum =
    copy(child = newChildren.head)
}
