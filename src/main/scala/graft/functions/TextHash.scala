package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled single-pass text-hash kernels behind the dedup operators.
  *
  * Semantically these equal the declarative pipelines
  * `tokens → 3-gram shingles → sha256 → min/…` shared with the DuckDB
  * oracles (TextAnalysis.tokensSpark / shinglesSpark), but Spark's
  * higher-order array functions evaluate interpreted — per-element
  * lambda frames cost microseconds, which dominates MinHash at corpus
  * scale. Each expression here runs the whole per-document computation
  * in one static JVM method (codegen emits a direct call), turning the
  * signature stage scan-bound.
  *
  * Token regex `[a-z0-9]+` on lowercased text and shingle join with a
  * single space are byte-for-byte the oracle semantics.
  */
object TextHash {

  private val TokenRe = Pattern.compile("[a-z0-9]+")

  def tokens(text: String): Array[String] = {
    // Locale.ROOT: default-locale lowercasing breaks parity under
    // Turkish-family locales ("I" -> dotless U+0131, dropped by the
    // token regex) — Spark's lower() and DuckDB's lower() are both
    // locale-independent
    val m = TokenRe.matcher(text.toLowerCase(java.util.Locale.ROOT))
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (m.find()) out += m.group()
    out.toArray
  }

  def shingles(toks: Array[String]): Array[String] = {
    if (toks.length < 3) return Array.empty
    val out = new Array[String](toks.length - 2)
    var i = 0
    while (i < out.length) {
      out(i) = toks(i) + " " + toks(i + 1) + " " + toks(i + 2)
      i += 1
    }
    out
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  /** `MessageDigest.getInstance` does a provider lookup + allocation —
    * per-SHINGLE that dominated the verify-funnel kernels (the r9
    * "interpreted set-op" rough edge was really this). One digest per
    * thread; `digest()` resets it after each use.
    */
  private val digestTL: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("SHA-256"))

  def sha256Bytes(s: String): Array[Byte] =
    digestTL.get().digest(s.getBytes(StandardCharsets.UTF_8))

  def sha256Hex(s: String): String = {
    val d = sha256Bytes(s)
    val out = new Array[Char](64)
    var i = 0
    while (i < 32) {
      out(2 * i) = HexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Big-endian unsigned value of `n` digest bytes at `off` — the
    * byte-aligned twin of parsing 2n hex chars at char offset 2·off
    * (hex nibbles are big-endian), skipping the hex round-trip.
    */
  private def be(d: Array[Byte], off: Int, n: Int): Long = {
    var v = 0L
    var i = 0
    while (i < n) { v = (v << 8) | (d(off + i) & 0xffL); i += 1 }
    v
  }

  /** MinHash signature: for shingle hash h = sha256-hex, halves
    * h1 = hex[0,14), h2 = hex[14,28); sig_j = min over shingles of
    * h1 + j*h2. Null (no shingles) → null signature.
    */
  def minHashSig(text: UTF8String, numHashes: Int): ArrayData = {
    val sh = shingles(tokens(text.toString))
    if (sh.isEmpty) return null
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      // h1 = hex[0,14) = bytes 0..6; h2 = hex[14,28) = bytes 7..13
      val d = sha256Bytes(sh(i))
      val h1 = be(d, 0, 7)
      val h2 = be(d, 7, 7)
      var j = 0
      while (j < numHashes) {
        val v = h1 + j.toLong * h2
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** [fp_min16, fp_max16, n_shingles-as-string] or null when no
    * shingles (string array keeps the expression single-typed; the
    * caller casts the count).
    */
  def fingerprint(text: UTF8String): ArrayData = {
    val sh = shingles(tokens(text.toString))
    if (sh.isEmpty) return null
    // lexicographic order of 16 lowercase-hex chars == unsigned order
    // of the first 8 digest bytes; compare as longs, format at the end
    var mn = 0L
    var mx = 0L
    var i = 0
    while (i < sh.length) {
      val h = be(sha256Bytes(sh(i)), 0, 8)
      if (i == 0 || java.lang.Long.compareUnsigned(h, mn) < 0) mn = h
      if (i == 0 || java.lang.Long.compareUnsigned(h, mx) > 0) mx = h
      i += 1
    }
    new GenericArrayData(Array[Any](
      UTF8String.fromString(f"$mn%016x"), UTF8String.fromString(f"$mx%016x"),
      UTF8String.fromString(sh.length.toString)))
  }

  /** Per-document token statistics in one pass:
    * [n_tokens, sum_token_chars, stopword_hits, n_distinct_tokens].
    */
  def textStats(text: UTF8String, stopwords: Array[String]): ArrayData = {
    val toks = tokens(text.toString)
    val stop = stopwords.toSet
    var sumLen = 0L
    var stopHits = 0L
    val distinct = new java.util.HashSet[String]()
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      sumLen += t.length
      if (stop.contains(t)) stopHits += 1
      distinct.add(t)
      i += 1
    }
    new GenericArrayData(Array(toks.length.toLong, sumLen, stopHits,
      distinct.size.toLong))
  }

  /** Winnowing fingerprints (MOSS-style) over a polynomial ROLLING hash
    * of token 3-grams: token value t = first 32 sha-hex bits mod M,
    * shingle hash h_i = ((t_i*B + t_{i+1}) mod M * B + t_{i+2}) mod M,
    * fingerprints = distinct minima of every w-window of consecutive
    * shingle hashes (all-of-them min when there are fewer than w),
    * sorted ascending. Integer-exact and reproducible in plain SQL, so
    * the DuckDB oracle matches bit-for-bit. Null when no shingles.
    */
  private val RollM = 1000000007L
  private val RollB = 131L

  /** Rolling 3-gram hash array over the token stream (null when fewer
    * than 3 tokens): rh(i) = ((t_i*B + t_{i+1}) mod M * B + t_{i+2})
    * mod M with t = first 32 sha-hex bits mod M — index i IS the
    * 0-based token offset of the shingle. Shared by the winnow sampler
    * and the positional span-dedup kernel.
    */
  def rollingHashArray(toks: Array[String]): Array[Long] = {
    if (toks.length < 3) return null
    val tv = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) {
      tv(i) = be(sha256Bytes(toks(i)), 0, 4) % RollM
      i += 1
    }
    val n = toks.length - 2
    val rh = new Array[Long](n)
    i = 0
    while (i < n) {
      rh(i) = ((tv(i) * RollB + tv(i + 1)) % RollM * RollB + tv(i + 2)) % RollM
      i += 1
    }
    rh
  }

  /** Positional form: the full rolling-hash array (no winnow
    * min-sampling) — the span-merge operator reads the array INDEX as
    * the token offset. Null when no shingles.
    */
  def rollingHashes(text: UTF8String): ArrayData = {
    val rh = rollingHashArray(tokens(text.toString))
    if (rh == null) return null
    new GenericArrayData(rh)
  }

  def winnowFps(text: UTF8String, w: Int): ArrayData = {
    require(w >= 1, s"winnow window must be >= 1, got $w")
    val rh = rollingHashArray(tokens(text.toString))
    if (rh == null) return null
    val n = rh.length
    val fps = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    if (n <= w) {
      var mn = rh(0)
      i = 1
      while (i < n) { if (rh(i) < mn) mn = rh(i); i += 1 }
      fps.add(mn)
    } else {
      i = 0
      while (i <= n - w) {
        var mn = rh(i)
        var j = i + 1
        while (j < i + w) { if (rh(j) < mn) mn = rh(j); j += 1 }
        fps.add(mn)
        i += 1
      }
    }
    val out = new Array[Any](fps.size)
    val it = fps.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  /** Marker-hit counts per word group in ONE tokenization pass:
    * out(g) = number of tokens (with multiplicity) contained in group g.
    * Semantics equal `size(filter(toks, t -> t IN (group_g)))` per
    * group, without re-tokenizing or an interpreted lambda per group.
    */
  def langScores(text: UTF8String, sets: Array[java.util.HashSet[String]]): ArrayData = {
    val toks = tokens(text.toString)
    val out = new Array[Long](sets.length)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      var g = 0
      while (g < sets.length) {
        if (sets(g).contains(t)) out(g) += 1
        g += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Canonical content hash: sha256 over the single-space token join —
    * whitespace/punctuation-insensitive exact-dedup key.
    */
  def contentHash(text: UTF8String): UTF8String =
    UTF8String.fromString(sha256Hex(tokens(text.toString).mkString(" ")))

  /** Distinct 3-gram shingles in first-occurrence order (order is
    * irrelevant to the set-size consumers). Null when no shingles.
    */
  /** Tokens joined by ' ' EXCLUDING the 1-based positions in `cov`
    * (null / out-of-range entries ignored; `cov` itself may be null =
    * nothing covered). One pass, one BitSet, zero intermediate arrays —
    * the boilerplate-scrub digest kernel. The declarative forms are
    * O(len·|cov|) (per-position array_contains) or allocate a segment
    * array per covered position (slice + flatten); both lose by >2× at
    * replica coverage density.
    */
  def scrubJoin(toks: ArrayData, cov: ArrayData): UTF8String = {
    val n = toks.numElements()
    val bs = new java.util.BitSet(n + 2)
    if (cov != null) {
      var i = 0
      val m = cov.numElements()
      while (i < m) {
        val p = cov.getInt(i)
        if (p >= 1 && p <= n) bs.set(p)
        i += 1
      }
    }
    val sb = new java.lang.StringBuilder
    var i = 0
    var first = true
    while (i < n) {
      // null elements are skipped, matching the declarative
      // filter(x -> x IS NOT NULL) this kernel replaced — the type is
      // array<string> with containsNull allowed, so a caller other than
      // the tokenizer (which never yields nulls) must not NPE here
      if (!bs.get(i + 1) && !toks.isNullAt(i)) {
        if (!first) sb.append(' ')
        sb.append(toks.getUTF8String(i).toString)
        first = false
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** One-pass [a-z0-9] character-class counts over an (already
    * lowercased) string: a 36-element long array, index 0-25 = 'a'-'z',
    * 26-35 = '0'-'9'. Byte-exact twin of the declarative
    * `transform(classes, ch -> length(lw) - length(replace(lw, ch)))`
    * ladder — the classes are pure ASCII and UTF-8 continuation bytes
    * never collide with ASCII, so a single byte scan counts code
    * points exactly. The ladder evaluated INTERPRETED (higher-order
    * functions have no codegen) and re-scanned the string 36 times; at
    * the 1000× replica that walked the corpus 36× per doc through
    * per-element lambda frames and never finished a single-task scan.
    */
  def charClassCounts(lw: UTF8String): ArrayData = {
    val counts = new Array[Long](36)
    val bytes = lw.getBytes
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b >= 'a' && b <= 'z') counts(b - 'a') += 1L
      else if (b >= '0' && b <= '9') counts(26 + b - '0') += 1L
      i += 1
    }
    new GenericArrayData(counts)
  }

  /** One-pass coverage + scrub from flagged gram START positions: marks
    * [p, p+n) for each 1-based start, then in the same BitSet emits the
    * covered-position count AND the scrubbed text (tokens at covered
    * slots removed, survivors joined by ' ', null elements skipped).
    * This replaces the exploded per-position pipeline — the explode
    * multiplied every flagged gram by n and then paid a corpus-wide
    * distinct to undo the overlap this kernel resolves per row in
    * O(len + |starts|). Null/absent starts = nothing covered.
    */
  def scrubCover(toks: ArrayData, starts: ArrayData, n: Int):
      org.apache.spark.sql.catalyst.InternalRow = {
    val len = toks.numElements()
    val bs = new java.util.BitSet(len + 2)
    if (starts != null) {
      var i = 0
      val m = starts.numElements()
      while (i < m) {
        val p = starts.getInt(i)
        var j = if (p >= 1) p else 1
        val e = math.min(p + n - 1, len)
        while (j <= e) { bs.set(j); j += 1 }
        i += 1
      }
    }
    val nCov = bs.cardinality()
    val sb = new java.lang.StringBuilder
    var i = 0
    var first = true
    while (i < len) {
      if (!bs.get(i + 1) && !toks.isNullAt(i)) {
        if (!first) sb.append(' ')
        sb.append(toks.getUTF8String(i).toString)
        first = false
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nCov.toLong, UTF8String.fromString(sb.toString)))
  }

  /** Within-document duplicate-n-gram coverage (the Gopher surface
    * metric): count of 1-based token positions covered by the interval
    * union of [i, i+n) over every gram occurring ≥ 2 times IN THIS
    * DOCUMENT. Exact string keys (space-joined — tokens are
    * whitespace-split, so the join is unambiguous and matches the
    * oracle's concat_ws gram exactly), one local hash map + one BitSet — O(len · n) per
    * document, no corpus state. This collapses the declarative shape's
    * two corpus-wide shuffles (window by (doc, gram) + the n-fold
    * covered-position distinct) into an embarrassingly parallel scan:
    * the metric is a pure per-document function, so nothing about it
    * belongs in a shuffle.
    */
  def repCoverage(toks: ArrayData, n: Int): Long = {
    val len = toks.numElements()
    if (len < n) return 0L
    val m = len - n + 1
    val keys = new Array[String](m)
    val counts = new java.util.HashMap[String, Integer](m * 2)
    var i = 0
    while (i < m) {
      val sb = new java.lang.StringBuilder
      var j = 0
      var firstTok = true
      while (j < n) {
        // null elements skip the separator too, mirroring concat_ws
        // (the tokenizer never produces nulls, but a containsNull
        // caller must see the same gram identity either way)
        if (!toks.isNullAt(i + j)) {
          if (!firstTok) sb.append(' ')
          sb.append(toks.getUTF8String(i + j).toString)
          firstTok = false
        }
        j += 1
      }
      val k = sb.toString
      keys(i) = k
      counts.merge(k, 1, (a, b) => a + b)
      i += 1
    }
    val bs = new java.util.BitSet(len + 2)
    i = 0
    while (i < m) {
      if (counts.get(keys(i)) >= 2) bs.set(i + 1, i + n + 1)
      i += 1
    }
    bs.cardinality().toLong
  }

  def shingleSet(text: UTF8String): ArrayData = {
    val sh = shingles(tokens(text.toString))
    if (sh.isEmpty) return null
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i < sh.length) { seen.add(sh(i)); i += 1 }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash as FOUR 16-bit band values (Manku et al., WWW'07 —
    * the production near-dup form): per-token value = first 64 bits of
    * sha256; bit b of the signature is the sign of the vote sum over
    * tokens; band j packs signature bits [16j, 16j+16). Emitting bands
    * instead of one packed long keeps every value positive-16-bit, so
    * the DuckDB oracle never touches the sign bit, and the banded
    * candidate join (equality on any band ⇒ Hamming ≤ 3 candidates by
    * pigeonhole) needs no bit surgery downstream. Null when no tokens.
    */
  def simHash64Bands(text: UTF8String): ArrayData = {
    val toks = tokens(text.toString)
    if (toks.isEmpty) return null
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val v = be(sha256Bytes(toks(i)), 0, 8)
      var b = 0
      while (b < 64) {
        votes(b) += (if (((v >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    val bands = new Array[Long](4)
    var j = 0
    while (j < 4) {
      var w = 0L
      var k = 0
      while (k < 16) {
        if (votes(16 * j + k) >= 0) w |= (1L << k)
        k += 1
      }
      bands(j) = w
      j += 1
    }
    new GenericArrayData(bands)
  }

  /** 16-bit SimHash over token multiset; per-token value = first 16
    * bits of sha256. Null when the document has no tokens.
    */
  def simHash16(text: UTF8String): java.lang.Long = {
    val toks = tokens(text.toString)
    if (toks.isEmpty) return null
    val votes = new Array[Int](16)
    var i = 0
    while (i < toks.length) {
      val v = be(sha256Bytes(toks(i)), 0, 2).toInt
      var b = 0
      while (b < 16) {
        votes(b) += (if (((v >> b) & 1) == 1) 1 else -1)
        b += 1
      }
      i += 1
    }
    var sh = 0L
    var b = 0
    while (b < 16) {
      if (votes(b) >= 0) sh |= (1L << b)
      b += 1
    }
    sh
  }
}

private[functions] trait TextStringInput extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected string, got $other")
  }
  protected final def helperName: String =
    TextHash.getClass.getName.stripSuffix("$")
}

/** text → array<long> MinHash signature (null when no shingles). */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression with TextStringInput {
  // upper bound is the overflow proof: h1, h2 < 2^56, so
  // h1 + j*h2 < (j+1)*2^56 stays below 2^63 only for j <= 126
  require(numHashes >= 1 && numHashes <= 127,
    s"minhash_sig num_hashes must be in [1, 127], got $numHashes")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"
  override def nullSafeEval(v: Any): Any =
    TextHash.minHashSig(v.asInstanceOf[UTF8String], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""${ev.value} = $helperName.minHashSig($c, $numHashes);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** text → [fp_min, fp_max, n_shingles] (null when no shingles). */
case class TextFingerprint(child: Expression)
    extends UnaryExpression with TextStringInput {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "text_fingerprint"
  override def nullSafeEval(v: Any): Any =
    TextHash.fingerprint(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""${ev.value} = $helperName.fingerprint($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): TextFingerprint =
    copy(child = newChild)
}

/** text → [n_tokens, sum_token_chars, stopword_hits, n_distinct]. */
case class TextStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression with TextStringInput {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "text_stats"

  @transient private lazy val stopArr = stopwords.toArray

  override def nullSafeEval(v: Any): Any =
    TextHash.textStats(v.asInstanceOf[UTF8String], stopArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopwords", stopArr, "java.lang.String[]")
    defineCodeGen(ctx, ev, c => s"$helperName.textStats($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

/** text → sorted array<long> of winnowing fingerprints over a rolling
  * 3-gram hash (null when no shingles).
  */
case class WinnowFps(child: Expression, window: Int)
    extends UnaryExpression with TextStringInput {
  require(window >= 1, s"winnow_fps window must be >= 1, got $window")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "winnow_fps"
  override def nullSafeEval(v: Any): Any =
    TextHash.winnowFps(v.asInstanceOf[UTF8String], window)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""${ev.value} = $helperName.winnowFps($c, $window);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

/** text → array<long> of POSITIONAL rolling 3-gram hashes (index =
  * 0-based token offset; null when no shingles) — the span-dedup input.
  */
case class RollingHashes(child: Expression)
    extends UnaryExpression with TextStringInput {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "rolling_hashes"
  override def nullSafeEval(v: Any): Any =
    TextHash.rollingHashes(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""${ev.value} = $helperName.rollingHashes($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): RollingHashes =
    copy(child = newChild)
}

/** text → array<long> of marker-hit counts, one per word group (the
  * language-ID scoring kernel; group order is the caller's).
  */
case class LangScores(child: Expression, markerGroups: Seq[Seq[String]])
    extends UnaryExpression with TextStringInput {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lang_scores"

  @transient private lazy val sets: Array[java.util.HashSet[String]] =
    markerGroups.map { ws =>
      val s = new java.util.HashSet[String]()
      ws.foreach(s.add)
      s
    }.toArray

  override def nullSafeEval(v: Any): Any =
    TextHash.langScores(v.asInstanceOf[UTF8String], sets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langSets", sets, "java.util.HashSet[]")
    defineCodeGen(ctx, ev, c => s"$helperName.langScores($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): LangScores =
    copy(child = newChild)
}

/** text → canonical content-hash hex (never null for non-null input). */
case class ContentHash(child: Expression)
    extends UnaryExpression with TextStringInput {
  override def dataType: DataType = StringType
  override def prettyName: String = "content_hash"
  override def nullSafeEval(v: Any): Any =
    TextHash.contentHash(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$helperName.contentHash($c)")
  override protected def withNewChildInternal(newChild: Expression): ContentHash =
    copy(child = newChild)
}

/** text → array<string> of distinct 3-gram shingles (null when none). */
case class ShingleSet(child: Expression)
    extends UnaryExpression with TextStringInput {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "shingle_set"
  override def nullSafeEval(v: Any): Any =
    TextHash.shingleSet(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""${ev.value} = $helperName.shingleSet($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
}

/** text → array<long>[4] of 16-bit SimHash64 band values (null when no
  * tokens). Band j holds signature bits [16j, 16j+16).
  */
case class SimHash64Bands(child: Expression)
    extends UnaryExpression with TextStringInput {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "simhash64_bands"
  override def nullSafeEval(v: Any): Any =
    TextHash.simHash64Bands(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""${ev.value} = $helperName.simHash64Bands($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): SimHash64Bands =
    copy(child = newChild)
}

/** text → 16-bit SimHash as long (null when no tokens). */
case class SimHash16(child: Expression)
    extends UnaryExpression with TextStringInput {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash16"
  override def nullSafeEval(v: Any): Any = {
    val r = TextHash.simHash16(v.asInstanceOf[UTF8String])
    if (r == null) null else r.longValue()
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.freshName("sh16")
    nullSafeCodeGen(ctx, ev, c => {
      s"""java.lang.Long $r = $helperName.simHash16($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }"""
        .stripMargin
    })
  }
  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
}

/** (tokens array<string>, covered positions array<int>) → the scrubbed
  * text: tokens joined by ' ' excluding 1-based covered positions. A
  * NULL cover means nothing covered (the whole text survives), so only
  * the token side propagates null — this is the digest input of
  * [[graft.operators.TextAnalysis.boilerplateScrub]].
  */
case class ScrubJoin(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = left.nullable
  override def prettyName: String = "scrub_join"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"expected (array<string>, array<int>), got $other")
    }

  // not nullSafeEval: a null cover is semantic (no coverage), not a
  // null result
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val t = left.eval(input)
    if (t == null) return null
    val c = right.eval(input)
    TextHash.scrubJoin(t.asInstanceOf[ArrayData],
      if (c == null) null else c.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val helper = TextHash.getClass.getName.stripSuffix("$")
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val newCode =
      code"""
         |${leftGen.code}
         |boolean ${ev.isNull} = ${leftGen.isNull};
         |UTF8String ${ev.value} = null;
         |if (!${ev.isNull}) {
         |  ${rightGen.code}
         |  ${ev.value} = $helper.scrubJoin(${leftGen.value},
         |    ${rightGen.isNull} ? null : ${rightGen.value});
         |}""".stripMargin
    ev.copy(code = newCode)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ScrubJoin =
    copy(left = newLeft, right = newRight)
}

/** tokens array<string> → within-document duplicate-n-gram coverage
  * count (bigint; 0 for docs with fewer than n tokens, null only for a
  * null token array) — the zero-shuffle form of the Gopher surface
  * metric; see [[TextHash.repCoverage]].
  */
case class RepCoverage(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 2, s"gram width must be at least 2, got $n")
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "rep_coverage"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"expected array<string>, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    TextHash.repCoverage(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = TextHash.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $helper.repCoverage($c, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): RepCoverage =
    copy(child = newChild)
}

/** (tokens array<string>, flagged gram starts array<int>, gram width n)
  * → struct(n_cov bigint, scrub string): covered-position count under
  * the interval union of [p, p+n) per start, and the scrubbed text.
  * A NULL starts array means nothing covered; only the token side
  * propagates null. The one-pass fusion of the boilerplate-scrub
  * coverage aggregate and digest ([[graft.operators.TextAnalysis
  * .boilerplateScrub]]).
  */
case class ScrubCover(left: Expression, right: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_cov", LongType, nullable = false),
    StructField("scrub", StringType, nullable = false)))
  override def nullable: Boolean = left.nullable
  override def prettyName: String = "scrub_cover"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, _)) if n >= 1 =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"expected (array<string>, array<int>) with n >= 1, got $other, n=$n")
    }

  // not nullSafeEval: a null starts side is semantic (no coverage)
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val t = left.eval(input)
    if (t == null) return null
    val s = right.eval(input)
    TextHash.scrubCover(t.asInstanceOf[ArrayData],
      if (s == null) null else s.asInstanceOf[ArrayData], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val helper = TextHash.getClass.getName.stripSuffix("$")
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val newCode =
      code"""
         |${leftGen.code}
         |boolean ${ev.isNull} = ${leftGen.isNull};
         |InternalRow ${ev.value} = null;
         |if (!${ev.isNull}) {
         |  ${rightGen.code}
         |  ${ev.value} = $helper.scrubCover(${leftGen.value},
         |    ${rightGen.isNull} ? null : ${rightGen.value}, $n);
         |}""".stripMargin
    ev.copy(code = newCode)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ScrubCover =
    copy(left = newLeft, right = newRight)
}

/** string (pre-lowered) → array<long>(36) of [a-z0-9] class counts —
  * the compiled kernel behind [[graft.operators.TextAnalysis
  * .charDiversity]]; see [[TextHash.charClassCounts]].
  */
case class CharClassCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_class_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"expected string, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    TextHash.charClassCounts(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = TextHash.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$helper.charClassCounts($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): CharClassCounts =
    copy(child = newChild)
}
