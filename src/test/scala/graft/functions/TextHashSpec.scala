package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.operators.TextAnalysis

/** Differential tests: the compiled single-pass kernels must equal the
  * declarative higher-order-function pipelines they replaced (which are
  * themselves the DuckDB-oracle semantics).
  */
class TextHashSpec extends AnyFunSuite with SparkTestBase {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "THE QUICK brown FOX, jumps; over 123 dogs!"),
      (3L, "short one"), // < 3 tokens → no shingles
      (4L, ""),
      (5L, "a b c a b c a b c"),
      (6L, "spark group query row data slow small filter customer line"))
      .toDF("doc_id", "text")
  }

  test("MinHashSig equals the declarative minhash pipeline") {
    val declarative = docs
      .withColumn("toks", expr(TextAnalysis.tokensSpark))
      .withColumn("shingles", expr(TextAnalysis.shinglesSpark))
      .where(size(col("shingles")) > 0)
      .withColumn("hs", expr("transform(shingles, s2 -> substring(sha2(s2, 256), 1, 28))"))
      .withColumn("h1s", expr("transform(hs, h -> cast(conv(substring(h, 1, 14), 16, 10) as long))"))
      .withColumn("h2s", expr("transform(hs, h -> cast(conv(substring(h, 15, 14), 16, 10) as long))"))
      .select(col("doc_id"),
        expr("transform(sequence(0, 15), j -> array_min(zip_with(h1s, h2s, (a, b) -> a + j * b)))")
          .as("sig"))
      .orderBy("doc_id").collect()
    val compiled = docs
      .select(col("doc_id"), GraftFunctions.minhash_sig(col("text"), 16).as("sig"))
      .where(col("sig").isNotNull)
      .orderBy("doc_id").collect()
    assert(compiled.map(_.toString) === declarative.map(_.toString))
    assert(compiled.length === 4) // docs 3 and 4 have no shingles
  }

  test("RollingHashes equals the declarative rolling-hash pipeline") {
    val declarative = docs
      .withColumn("toks", expr(TextAnalysis.tokensSpark))
      .where(size(col("toks")) >= 3)
      .withColumn("tvs", expr(
        "transform(toks, tk -> cast(conv(substring(sha2(tk, 256), 1, 8), 16, 10) as long) % 1000000007)"))
      .select(col("doc_id"), expr(
        """transform(sequence(0, size(tvs) - 3), i ->
          |  ((element_at(tvs, i+1) * 131 + element_at(tvs, i+2)) % 1000000007
          |   * 131 + element_at(tvs, i+3)) % 1000000007)""".stripMargin).as("rh"))
      .orderBy("doc_id").collect()
    val compiled = docs
      .select(col("doc_id"), GraftFunctions.rolling_hashes(col("text")).as("rh"))
      .where(col("rh").isNotNull)
      .orderBy("doc_id").collect()
    assert(compiled.map(_.toString) === declarative.map(_.toString))
    assert(compiled.length === 4) // docs 3 and 4 have no shingles
  }

  test("TextFingerprint equals the declarative min/max hash pipeline") {
    val declarative = docs
      .withColumn("toks", expr(TextAnalysis.tokensSpark))
      .withColumn("shingles", expr(TextAnalysis.shinglesSpark))
      .where(size(col("shingles")) > 0)
      .withColumn("hs", expr("transform(shingles, s -> substring(sha2(s, 256), 1, 16))"))
      .select(col("doc_id"), array_min(col("hs")).as("fp_min"),
        array_max(col("hs")).as("fp_max"),
        size(col("shingles")).cast("long").as("n_shingles"))
      .orderBy("doc_id").collect()
    val compiled = docs
      .withColumn("fp", GraftFunctions.text_fingerprint(col("text")))
      .where(col("fp").isNotNull)
      .select(col("doc_id"), col("fp").getItem(0).as("fp_min"),
        col("fp").getItem(1).as("fp_max"),
        col("fp").getItem(2).cast("long").as("n_shingles"))
      .orderBy("doc_id").collect()
    assert(compiled.map(_.toString) === declarative.map(_.toString))
  }

  test("ContentHash equals sha2 over the token join") {
    val declarative = docs
      .select(col("doc_id"),
        sha2(expr(s"concat_ws(' ', ${TextAnalysis.tokensSpark})"), 256).as("h"))
      .orderBy("doc_id").collect()
    val compiled = docs
      .select(col("doc_id"), GraftFunctions.content_hash(col("text")).as("h"))
      .orderBy("doc_id").collect()
    assert(compiled.map(_.toString) === declarative.map(_.toString))
  }

  test("TextStats equals the declarative token statistics") {
    val stop = Seq("the", "a", "of", "and", "is", "to", "in")
    val inList = stop.map(w => s"'$w'").mkString(", ")
    val declarative = docs
      .withColumn("toks", expr(TextAnalysis.tokensSpark))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n"),
        expr("aggregate(transform(toks, t -> length(t)), 0L, (a, x) -> a + x)").as("len"),
        expr(s"size(filter(toks, t -> t IN ($inList)))").cast("long").as("stop"),
        expr("size(array_distinct(toks))").cast("long").as("dist"))
      .orderBy("doc_id").collect()
    val compiled = docs
      .withColumn("st", GraftFunctions.text_stats(col("text"), stop))
      .select(col("doc_id"), col("st").getItem(0).as("n"),
        col("st").getItem(1).as("len"), col("st").getItem(2).as("stop"),
        col("st").getItem(3).as("dist"))
      .orderBy("doc_id").collect()
    assert(compiled.map(_.toString) === declarative.map(_.toString))
  }

  test("LangScores equals the declarative per-group filter counts") {
    val groups = GraftFunctions.DefaultLangMarkers.map(_._2)
    val declarative = docs
      .withColumn("toks", expr(TextAnalysis.tokensSpark))
      .select(col("doc_id") +: groups.zipWithIndex.map { case (ws, i) =>
        expr(s"size(filter(toks, t -> t IN (${ws.map(w => s"'$w'").mkString(", ")})))")
          .cast("long").as(s"g$i")
      }: _*)
      .orderBy("doc_id").collect()
    val compiled = docs
      .withColumn("ls", GraftFunctions.lang_scores(col("text"), groups))
      .select(col("doc_id") +: groups.indices.map(i =>
        col("ls").getItem(i).as(s"g$i")): _*)
      .orderBy("doc_id").collect()
    assert(compiled.map(_.toString) === declarative.map(_.toString))
  }

  test("SimHash64Bands equals the declarative hi/lo-half bit-vote pipeline") {
    // the declarative twin deliberately splits each token hash into two
    // 32-bit halves, exactly like the DuckDB oracle — so this checks the
    // kernel's single 64-bit parse against the halved bit indexing
    val declarative = docs
      .withColumn("toks", expr(TextAnalysis.tokensSpark))
      .where(size(col("toks")) > 0)
      .withColumn("his",
        expr("transform(toks, t -> cast(conv(substring(sha2(t, 256), 1, 8), 16, 10) as long))"))
      .withColumn("los",
        expr("transform(toks, t -> cast(conv(substring(sha2(t, 256), 9, 8), 16, 10) as long))"))
      .select(col("doc_id"),
        expr("""transform(sequence(0, 3), j ->
                 aggregate(sequence(0, 15), 0L, (acc, k) ->
                   acc + CASE WHEN aggregate(zip_with(his, los, (h, l) ->
                       CASE WHEN (CASE WHEN 16*j+k < 32 THEN shiftright(l, 16*j+k)
                                  ELSE shiftright(h, 16*j+k-32) END) % 2 = 1
                       THEN 1L ELSE -1L END), 0L, (a2, v) -> a2 + v) >= 0
                     THEN shiftleft(1L, k) ELSE 0L END))""").as("sbands"))
      .orderBy("doc_id").collect()
    val compiled = docs
      .select(col("doc_id"), GraftFunctions.simhash64_bands(col("text")).as("sbands"))
      .where(col("sbands").isNotNull)
      .orderBy("doc_id").collect()
    assert(compiled.map(_.toString) === declarative.map(_.toString))
    assert(compiled.length === 5) // doc 4 has no tokens
    compiled.foreach(_.getSeq[Long](1).foreach(b => assert(b >= 0L && b < 65536L)))
  }

  test("SimHash16 equals the declarative bit-vote pipeline") {
    val declarative = docs
      .withColumn("toks", expr(TextAnalysis.tokensSpark))
      .where(size(col("toks")) > 0)
      .withColumn("vs",
        expr("transform(toks, t -> cast(conv(substring(sha2(t, 256), 1, 4), 16, 10) as long))"))
      .select(col("doc_id"),
        expr("""aggregate(sequence(0, 15), 0L, (acc, b) ->
                 acc + CASE WHEN aggregate(vs, 0L, (a2, v) ->
                               a2 + CASE WHEN shiftright(v, b) % 2 = 1 THEN 1 ELSE -1 END) >= 0
                       THEN shiftleft(1L, b) ELSE 0L END)""").as("simhash"))
      .orderBy("doc_id").collect()
    val compiled = docs
      .select(col("doc_id"), GraftFunctions.simhash16(col("text")).as("simhash"))
      .where(col("simhash").isNotNull)
      .orderBy("doc_id").collect()
    assert(compiled.map(_.toString) === declarative.map(_.toString))
    assert(compiled.length === 5) // doc 4 has no tokens
  }

  test("ScrubJoin equals the declarative covered-position filter") {
    import spark.implicits._
    // covers: null cover (nothing scrubbed), empty cover, duplicate and
    // out-of-range positions (0, negative, > n — all ignored), full
    // coverage (empty result), empty token array, null tokens
    val rows = Seq(
      (1L, Seq("a", "b", "c", "d"), Some(Seq(2, 4))),
      (2L, Seq("a", "b", "c"), None),
      (3L, Seq("x", "y"), Some(Seq.empty[Int])),
      (4L, Seq("p", "q", "r"), Some(Seq(0, -1, 2, 2, 99))),
      (5L, Seq("only"), Some(Seq(1))),
      (6L, Seq.empty[String], Some(Seq(1, 2))),
      (7L, null.asInstanceOf[Seq[String]], Some(Seq(1))),
      // null ELEMENTS are skipped like the declarative filter skipped
      // them (they still occupy a 1-based position slot) — the kernel
      // must not NPE on a containsNull array from a non-tokenizer caller
      (8L, Seq("a", null, "c"), Some(Seq(3))),
      (9L, Seq(null, "z"), None))
      .toDF("doc_id", "toks", "cov")
    val declarative = rows.select(col("doc_id"), expr(
      """CASE WHEN toks IS NULL THEN NULL
        |     WHEN cov IS NULL THEN concat_ws(' ', toks)
        |     ELSE concat_ws(' ', filter(
        |       zip_with(toks, sequence(1, size(toks)), (t, i) ->
        |         IF(array_contains(cov, i), NULL, t)),
        |       x -> x IS NOT NULL)) END""".stripMargin).as("s"))
      .orderBy("doc_id").collect()
    val compiled = rows
      .select(col("doc_id"),
        GraftFunctions.scrub_join(col("toks"), col("cov")).as("s"))
      .orderBy("doc_id").collect()
    assert(compiled.map(_.toString) === declarative.map(_.toString))
    assert(compiled(0).getString(1) === "a c")
    assert(compiled(4).getString(1) === "")
    assert(compiled(6).isNullAt(1))
  }

  test("RepCoverage equals the exploded window + distinct pipeline") {
    val n = 3
    val parts = (0 until n).map(j => s"toks[i-1+$j]").mkString(", ")
    val t = docs.withColumn("toks", expr(TextAnalysis.tokensSpark))
      .where(size(col("toks")) >= n)
    // the round-12 declarative shape, verbatim, as the ground truth
    import org.apache.spark.sql.expressions.Window
    val g = t.select(col("doc_id"),
      explode(expr(
        s"""transform(sequence(1, size(toks) - ${n - 1}),
           |  i -> struct(i AS pos, concat_ws(' ', $parts) AS gram))"""
          .stripMargin)).as("g"))
      .select(col("doc_id"), col("g.pos").as("pos"), col("g.gram").as("gram"))
    val decl = g
      .withColumn("cnt",
        count(lit(1)).over(Window.partitionBy("doc_id", "gram")))
      .where(col("cnt") >= 2)
      .select(col("doc_id"),
        explode(expr(s"sequence(pos, pos + ${n - 1})")).as("cp"))
      .groupBy("doc_id").agg(countDistinct("cp").as("n_cov"))
    val declMap = t.select(col("doc_id"))
      .join(decl, Seq("doc_id"), "left")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) 0L else r.getLong(1)))
      .toMap
    val kernel = t.select(col("doc_id"),
      GraftFunctions.rep_coverage(col("toks"), n).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kernel === declMap)
    assert(kernel.nonEmpty)
  }

  test("ScrubCover equals the exploded interval-union pipeline") {
    import spark.implicits._
    val n = 3
    // starts: unordered, overlapping, duplicated, boundary (start at
    // len-n+1), out-of-range (clamped), null list, empty list, null
    // token element inside a covered/uncovered slot
    val rows = Seq(
      (1L, Seq("a", "b", "c", "d", "e", "f"), Some(Seq(4, 1, 2))),
      (2L, Seq("a", "b", "c", "d"), Some(Seq(2, 2))),
      (3L, Seq("x", "y", "z"), None),
      (4L, Seq("p", "q", "r", "s"), Some(Seq.empty[Int])),
      (5L, Seq("t", "u", "v"), Some(Seq(1))),
      (6L, Seq("a", null, "c", "d", "e"), Some(Seq(3))),
      (7L, null.asInstanceOf[Seq[String]], Some(Seq(1))),
      (8L, Seq("m", "n"), Some(Seq(-5, 99))))
      .toDF("doc_id", "toks", "starts")
    val decl = rows.select(col("doc_id"), expr(
      s"""CASE WHEN toks IS NULL THEN NULL ELSE named_struct(
         |  'n_cov', coalesce(cast(size(array_distinct(filter(
         |     flatten(transform(coalesce(starts, array()),
         |       p -> sequence(p, p + ${n - 1}))),
         |     cp -> cp >= 1 AND cp <= size(toks)))) as bigint), 0L),
         |  'scrub', concat_ws(' ', filter(
         |     zip_with(toks, sequence(1, size(toks)), (t, i) ->
         |       IF(exists(coalesce(starts, array()),
         |            p -> i >= p AND i <= p + ${n - 1}), NULL, t)),
         |     x -> x IS NOT NULL))) END""".stripMargin).as("s"))
      .orderBy("doc_id").collect()
    val compiled = rows.select(col("doc_id"),
      GraftFunctions.scrub_cover(col("toks"), col("starts"), n).as("s"))
      .orderBy("doc_id").collect()
    assert(compiled.map(_.toString) === decl.map(_.toString))
    // spot semantics: overlapping starts 1,2,4 over 6 toks cover 1..6
    assert(compiled(0).getStruct(1).getLong(0) === 6L)
    assert(compiled(0).getStruct(1).getString(1) === "")
    // start 3 with n=3 covers slots 3,4,5; null element at slot 2 skipped
    assert(compiled(5).getStruct(1).getLong(0) === 3L)
    assert(compiled(5).getStruct(1).getString(1) === "a")
    assert(compiled(6).isNullAt(1))
  }
}
