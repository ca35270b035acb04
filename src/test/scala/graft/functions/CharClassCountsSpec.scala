package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Pins the compiled [[CharClassCounts]] kernel byte-exact against the
  * declarative 36-replace ladder it replaced
  * (`transform(classes, ch -> length(lw) - length(replace(lw, ch)))`),
  * on real testdata text and on adversarial unicode: multi-byte code
  * points (whose UTF-8 continuation bytes must not be miscounted as
  * ASCII), pre-lowercase uppercase input, zero-alnum symbol spam, and
  * empty strings.
  */
class CharClassCountsSpec extends AnyFunSuite with SparkTestBase {

  private val ladder: String = {
    val classes = ("abcdefghijklmnopqrstuvwxyz" + "0123456789")
      .map(c => s"'$c'").mkString("array(", ", ", ")")
    s"transform($classes, ch -> CAST(length(lw) - length(replace(lw, ch, '')) AS BIGINT))"
  }

  private def diff(df: org.apache.spark.sql.DataFrame): Long =
    df.withColumn("lw", lower(col("text")))
      .select(
        GraftFunctions.char_class_counts(col("lw")).as("kernel"),
        expr(ladder).as("ladder"))
      .where(not(col("kernel") === col("ladder")))
      .count()

  test("kernel equals the replace ladder on sf0.001 documents") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    assert(diff(docs) == 0L)
    spark.catalog.clearCache()
  }

  test("kernel equals the ladder on adversarial unicode and edge strings") {
    val s = spark
    import s.implicits._
    val fixtures = Seq(
      "",                                   // empty
      "ABC xyz 019",                        // uppercase folds before the kernel
      "héllo wörld — naïve café",           // multi-byte latin
      "日本語テキスト 123 abc",               // CJK + ascii mix
      "!!!@@@###$$$ ^^^ ~~~",               // zero-alnum symbol spam
      "İstanbul ıi",                        // dotted/dotless I family
      "a" * 10000 + "9" * 10000,            // long runs
      "z0z0z0" * 500)
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    assert(diff(fixtures) == 0L)
    spark.catalog.clearCache()
  }
}
