package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Driver-side model checks for the inverted index and the CMS heavy
  * hitters on the real sf0.001 corpus.
  */
class TextIndexSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def tokens(text: String): Vector[String] =
    "[a-z0-9]+".r.findAllIn(text.toLowerCase(java.util.Locale.ROOT)).toVector

  private lazy val postingsModel: Map[String, Vector[Long]] =
    graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .flatMap(r => tokens(r.getString(1)).distinct.map(_ -> r.getLong(0)))
      .groupBy(_._1).map { case (t, ps) => t -> ps.map(_._2).sorted.toVector }

  test("inverted index matches the driver posting model") {
    val rows = TextAnalysis.invertedIndex(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val expected = postingsModel.filter(_._2.size >= 5)
    assert(rows.map(_._1).toVector === expected.keys.toVector.sorted)
    rows.foreach { case (token, df, postings, idSum) =>
      val model = expected(token)
      assert(df === model.size.toLong, s"term $token df")
      assert(idSum === model.sum, s"term $token checksum")
      assert(postings === model.take(100).mkString(","), s"term $token postings")
    }
  }

  test("posting sample is capped at maxPostings, checksum stays full") {
    val rows = TextAnalysis.invertedIndex(spark, sf, minDf = 1, maxPostings = 3)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    rows.foreach { case (token, df, postings, idSum) =>
      val model = postingsModel(token)
      assert(postings.split(",").length === math.min(3, df).toInt)
      assert(postings === model.take(3).mkString(","), s"term $token cap")
      assert(idSum === model.sum, s"term $token full checksum despite cap")
    }
  }

  test("cms estimates bound the exact counts on the real corpus") {
    val rows = TextAnalysis.cmsTopk(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3)))
    assert(rows.length === 20)
    val exact = postingsModel // df, not cf — recount collection freq
    val cf = graft.sources.Tables.documents(spark, sf)
      .select("text").collect().flatMap(r => tokens(r.getString(0)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    rows.foreach { case (token, n, geExact, withinEps) =>
      assert(n === cf(token), s"term $token exact count")
      assert(geExact, s"term $token: CMS estimate below the true count")
      assert(withinEps, s"term $token: CMS estimate outside eps bound")
    }
    assert(exact.nonEmpty) // corpus sanity
  }
}
