package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions._

/** Column-level API over the engine's custom expressions, plus SQL
  * registration so `spark.sql("... uint256_encode(c) ...")` works too.
  */
object GraftFunctions {

  private def toCol(e: Expression): Column = GraftColumnBridge.column(e)
  private def toExpr(c: Column): Expression = GraftColumnBridge.expression(c)

  /** numeric/string/integral → 32-byte big-endian uint256 carrier. */
  def uint256_encode(c: Column): Column = toCol(Uint256Encode(toExpr(c)))

  /** carrier → Decimal(38,0) (throws if >38 digits). */
  def uint256_to_decimal(c: Column): Column = toCol(Uint256ToDecimal(toExpr(c)))

  /** carrier floor-divided by a positive long (downscale). */
  def uint256_div(c: Column, divisor: Long): Column =
    toCol(Uint256DivLong(toExpr(c), divisor))

  /** carrier ÷ carrier (null on zero divisor). */
  def uint256_div(c: Column, divisor: Column): Column =
    toCol(Uint256Div(toExpr(c), toExpr(divisor)))

  /** carrier → 64-char uppercase hex (composes built-ins; stays codegen'd). */
  def uint256_hex(c: Column): Column = hex(c)

  /** text → MinHash signature (array<long>, null when no shingles). */
  def minhash_sig(c: Column, numHashes: Int = 16): Column =
    toCol(MinHashSig(toExpr(c), numHashes))

  /** text → [fp_min, fp_max, n_shingles] (null when no shingles). */
  def text_fingerprint(c: Column): Column = toCol(TextFingerprint(toExpr(c)))

  /** text → 16-bit SimHash (null when no tokens). */
  def simhash16(c: Column): Column = toCol(SimHash16(toExpr(c)))

  /** text → distinct 3-gram shingles (null when none). */
  def shingle_set(c: Column): Column = toCol(ShingleSet(toExpr(c)))

  /** text → canonical content-hash (token-normalized sha256 hex). */
  def content_hash(c: Column): Column = toCol(ContentHash(toExpr(c)))

  /** text → [n_tokens, sum_token_chars, stopword_hits, n_distinct]. */
  def text_stats(c: Column, stopwords: Seq[String]): Column =
    toCol(TextStats(toExpr(c), stopwords))

  /** (array<float>, array<float>) → floor(cosine * 1e6) as long. */
  def cosine_e6(a: Column, b: Column): Column =
    toCol(CosineSimE6(toExpr(a), toExpr(b)))

  def registerAll(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction(
      "uint256_encode", exprs => Uint256Encode(exprs.head), "built-in")
    registry.createOrReplaceTempFunction(
      "uint256_to_decimal", exprs => Uint256ToDecimal(exprs.head), "built-in")
    registry.createOrReplaceTempFunction(
      "minhash_sig", exprs => MinHashSig(exprs.head, 16), "built-in")
    registry.createOrReplaceTempFunction(
      "simhash16", exprs => SimHash16(exprs.head), "built-in")
    registry.createOrReplaceTempFunction(
      "shingle_set", exprs => ShingleSet(exprs.head), "built-in")
    registry.createOrReplaceTempFunction(
      "text_fingerprint", exprs => TextFingerprint(exprs.head), "built-in")
  }
}
