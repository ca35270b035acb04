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

  /** carrier × carrier (throws past 2^256 — never wraps). */
  def uint256_mul(a: Column, b: Column): Column =
    toCol(Uint256Mul(toExpr(a), toExpr(b)))

  /** carrier → 64-char uppercase hex (composes built-ins; stays codegen'd). */
  def uint256_hex(c: Column): Column = hex(c)

  /** text → MinHash signature (array<long>, null when no shingles). */
  def minhash_sig(c: Column, numHashes: Int = 16): Column =
    toCol(MinHashSig(toExpr(c), numHashes))

  /** text → [fp_min, fp_max, n_shingles] (null when no shingles). */
  def text_fingerprint(c: Column): Column = toCol(TextFingerprint(toExpr(c)))

  /** text → 16-bit SimHash (null when no tokens). */
  def simhash16(c: Column): Column = toCol(SimHash16(toExpr(c)))

  /** text → 64-bit SimHash as 4×16-bit band values (null when no tokens). */
  def simhash64_bands(c: Column): Column = toCol(SimHash64Bands(toExpr(c)))

  /** text → distinct 3-gram shingles (null when none). */
  def shingle_set(c: Column): Column = toCol(ShingleSet(toExpr(c)))

  /** text → canonical content-hash (token-normalized sha256 hex). */
  def content_hash(c: Column): Column = toCol(ContentHash(toExpr(c)))

  /** (tokens array<string>, covered positions array<int>) → scrubbed
    * text: tokens joined by ' ' excluding 1-based covered positions
    * (null cover = nothing covered).
    */
  def scrub_join(toks: Column, cov: Column): Column =
    toCol(ScrubJoin(toExpr(toks), toExpr(cov)))

  /** (tokens array<string>, flagged gram starts array<int>, width n) →
    * struct(n_cov bigint, scrub string): interval-union coverage count
    * and scrubbed text in one pass (null starts = nothing covered).
    */
  def scrub_cover(toks: Column, starts: Column, n: Int): Column =
    toCol(ScrubCover(toExpr(toks), toExpr(starts), n))

  /** lowercased text → array<long>(36) of [a-z0-9] occurrence counts. */
  def char_class_counts(lw: Column): Column =
    toCol(CharClassCounts(toExpr(lw)))

  /** tokens → within-document duplicate-n-gram coverage count. */
  def rep_coverage(toks: Column, n: Int): Column =
    toCol(RepCoverage(toExpr(toks), n))

  /** text → [n_tokens, sum_token_chars, stopword_hits, n_distinct]. */
  def text_stats(c: Column, stopwords: Seq[String]): Column =
    toCol(TextStats(toExpr(c), stopwords))

  /** (array<float>, array<float>) → floor(cosine * 1e6) as long. */
  def cosine_e6(a: Column, b: Column): Column =
    toCol(CosineSimE6(toExpr(a), toExpr(b)))

  /** array<float> → [q…, Σq², signBucket] embedding-outlier sufficient
    * stats in one compiled pass (e3 quantize + self-dot + sign bucket).
    */
  def outlier_stats(c: Column, planes: Int): Column =
    toCol(OutlierStats(toExpr(c), planes))

  /** (array<long>, array<long>) → Σ a_i·b_i over the common prefix. */
  def dot_long(a: Column, b: Column): Column =
    toCol(DotLong(toExpr(a), toExpr(b)))

  /** Evaluation barrier: identity the optimizer won't substitute through
    * (stops predicate pushdown from double-evaluating an expensive
    * projected kernel). Zero runtime cost. Only valid where analysis
    * admits non-deterministic expressions — Project / Filter /
    * Aggregate / Window — NOT join conditions, sort keys or generators
    * (see [[Materialize]]).
    */
  def materialize(c: Column): Column = toCol(Materialize(toExpr(c)))

  /** (array<string>, array<string>) → exact set-Jaccard scaled 1e4. */
  def jaccard_e4(a: Column, b: Column): Column =
    toCol(JaccardE4(toExpr(a), toExpr(b)))

  /** (array<string>, array<string>) → [|A∩B|, |A|, |B|] distinct-set
    * overlap statistics in one pass (Jaccard/containment primitive).
    */
  def overlap_stats(a: Column, b: Column): Column =
    toCol(OverlapStats(toExpr(a), toExpr(b)))

  /** text → array<long> marker-hit counts, one per word group. */
  def lang_scores(c: Column, markerGroups: Seq[Seq[String]]): Column =
    toCol(LangScores(toExpr(c), markerGroups))

  /** carrier → carrier sum (null on empty group; throws past 2^256). */
  def uint256_sum(c: Column): Column =
    toCol(Uint256Sum(toExpr(c)).toAggregateExpression())

  /** text → sorted winnowing fingerprints over a rolling 3-gram hash. */
  def winnow_fps(c: Column, window: Int = 4): Column =
    toCol(WinnowFps(toExpr(c), window))

  /** text → positional rolling 3-gram hashes (array index = 0-based
    * token offset; null when no shingles) — the span-dedup input.
    */
  def rolling_hashes(c: Column): Column = toCol(RollingHashes(toExpr(c)))

  /** (bigint, bigint) → Morton interleave of the low 16 bits (Z-order
    * layout key).
    */
  def zorder_key(x: Column, y: Column): Column =
    toCol(ZOrderKey(toExpr(x), toExpr(y)))

  /** array<float> → [scale_e6, code_checksum, code_min, code_max,
    * err_e6_sum] int8-quantization statistics in one pass.
    */
  def quantize_stats(c: Column): Column = toCol(QuantizeStats(toExpr(c)))

  /** Stopword list shared by the text-quality operators and the default
    * SQL `text_stats(text)` form.
    */
  val DefaultStopwords: Seq[String] =
    Seq("the", "a", "of", "and", "is", "to", "in")

  /** Language-ID marker sets (alphabetical language order — ties resolve
    * to the first), shared by the langid operator and the default SQL
    * `lang_scores(text)` form.
    */
  val DefaultLangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "en" -> Seq("the", "a", "of", "and", "is", "to"),
    "es" -> Seq("el", "los", "de", "y", "es", "que"),
    "fr" -> Seq("le", "les", "de", "et", "est", "que"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2", "you3"))

  /** SQL builder for every kernel — the single source of truth for the
    * engine's SQL surface. Used by [[registerAll]] (library sessions) and
    * [[graft.GraftExtensions]] (`--conf spark.sql.extensions` sessions),
    * so the two paths can't drift.
    */
  val sqlBuilders: Seq[(String, Seq[Expression] => Expression)] = {
    import org.apache.spark.sql.catalyst.expressions.{Hex, Literal}
    import org.apache.spark.sql.types.{IntegerType, LongType}
    def int(e: Expression, what: String): Int = e match {
      case Literal(v: Int, IntegerType) => v
      case Literal(v: Long, LongType)   => v.toInt
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }
    def str(e: Expression, what: String): String = e match {
      case Literal(s, _) if s != null => s.toString
      case other => throw new IllegalArgumentException(
        s"$what must be a string literal, got $other")
    }
    // wrong arity must be a clear error, never a silently-ignored
    // argument or a bare IndexOutOfBoundsException from exprs(i)
    def arity(name: String, min: Int, max: Int)(
        b: Seq[Expression] => Expression): Seq[Expression] => Expression =
      exprs => {
        if (exprs.size < min || exprs.size > max)
          throw new IllegalArgumentException(
            s"$name expects $min${if (max != min) s"..$max" else ""} " +
              s"argument(s), got ${exprs.size}")
        b(exprs)
      }
    Seq(
      "uint256_encode" -> arity("uint256_encode", 1, 1)(exprs => Uint256Encode(exprs.head)),
      "uint256_to_decimal" -> arity("uint256_to_decimal", 1, 1)(exprs => Uint256ToDecimal(exprs.head)),
      // uint256_div(carrier, N) for a literal integer divisor (the
      // compiled downscale path); uint256_div(carrier, carrier) otherwise
      "uint256_div" -> arity("uint256_div", 2, 2)(exprs => exprs(1) match {
        case Literal(v: Int, IntegerType) => Uint256DivLong(exprs.head, v.toLong)
        case Literal(v: Long, LongType)   => Uint256DivLong(exprs.head, v)
        case other                        => Uint256Div(exprs.head, other)
      }),
      "uint256_mul" -> arity("uint256_mul", 2, 2)(exprs =>
        Uint256Mul(exprs.head, exprs(1))),
      "uint256_hex" -> arity("uint256_hex", 1, 1)(exprs => Hex(exprs.head)),
      "uint256_sum" -> arity("uint256_sum", 1, 1)(exprs =>
        Uint256Sum(exprs.head).toAggregateExpression()),
      "minhash_sig" -> arity("minhash_sig", 1, 2)(exprs =>
        MinHashSig(exprs.head,
          if (exprs.size > 1) int(exprs(1), "minhash_sig num_hashes") else 16)),
      "simhash16" -> arity("simhash16", 1, 1)(exprs => SimHash16(exprs.head)),
      "simhash64_bands" -> arity("simhash64_bands", 1, 1)(exprs => SimHash64Bands(exprs.head)),
      "shingle_set" -> arity("shingle_set", 1, 1)(exprs => ShingleSet(exprs.head)),
      "text_fingerprint" -> arity("text_fingerprint", 1, 1)(exprs => TextFingerprint(exprs.head)),
      "content_hash" -> arity("content_hash", 1, 1)(exprs => ContentHash(exprs.head)),
      "char_class_counts" -> arity("char_class_counts", 1, 1)(exprs =>
        CharClassCounts(exprs.head)),
      // text_stats(text) with the default stopwords, or
      // text_stats(text, 'stop1', 'stop2', ...) with an explicit list
      "text_stats" -> arity("text_stats", 1, 64)(exprs =>
        TextStats(exprs.head,
          if (exprs.size > 1) exprs.tail.map(str(_, "text_stats stopword"))
          else DefaultStopwords)),
      "cosine_e6" -> arity("cosine_e6", 2, 2)(exprs => CosineSimE6(exprs.head, exprs(1))),
      "jaccard_e4" -> arity("jaccard_e4", 2, 2)(exprs => JaccardE4(exprs.head, exprs(1))),
      "overlap_stats" -> arity("overlap_stats", 2, 2)(exprs => OverlapStats(exprs.head, exprs(1))),
      // lang_scores(text): hit counts for the default marker sets, in
      // DefaultLangMarkers order
      "lang_scores" -> arity("lang_scores", 1, 1)(exprs =>
        LangScores(exprs.head, DefaultLangMarkers.map(_._2))),
      // winnow_fps(text[, window]): winnowing fingerprints, default w=4
      "winnow_fps" -> arity("winnow_fps", 1, 2)(exprs =>
        WinnowFps(exprs.head,
          if (exprs.size > 1) int(exprs(1), "winnow_fps window") else 4)),
      "rolling_hashes" -> arity("rolling_hashes", 1, 1)(exprs =>
        RollingHashes(exprs.head)),
      "zorder_key" -> arity("zorder_key", 2, 2)(exprs =>
        ZOrderKey(exprs.head, exprs(1))),
      "quantize_stats" -> arity("quantize_stats", 1, 1)(exprs =>
        QuantizeStats(exprs.head)),
      // dot_long(a, b): compiled Σ a_i·b_i over the common prefix
      "dot_long" -> arity("dot_long", 2, 2)(exprs =>
        DotLong(exprs.head, exprs(1))),
      // outlier_stats(embedding[, planes]): [q…, Σq², signBucket]
      "outlier_stats" -> arity("outlier_stats", 1, 2)(exprs =>
        OutlierStats(exprs.head,
          if (exprs.size > 1) int(exprs(1), "outlier_stats planes") else 8)))
  }

  def registerAll(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    sqlBuilders.foreach { case (name, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}
