package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Properties of the integer-exact LR trainer that the hash-oracle
  * can't express: the two faces agree with each other, and the model
  * actually learns (beats the majority class) — a trainer whose
  * trajectory is reproducible but useless would still hash-match.
  */
class LrTrainSpec extends AnyFunSuite with SparkTestBase {

  private val d = "/root/testdata/sf0.01"

  test("score face reproduces the trajectory's final accuracy exactly") {
    val traj = Curation.lrTrain(spark, d).collect()
    val finalAcc = traj.last.getLong(6)
    val scores = Curation.lrScore(spark, d).collect()
    val n = scores.length.toLong
    val nCorrect = scores.count(_.getBoolean(5)).toLong
    assert(nCorrect * 10000L / n == finalAcc,
      s"lrScore agreement ${nCorrect * 10000L / n} != trajectory final $finalAcc")
    spark.catalog.clearCache()
  }

  test("the model beats the majority class on its training corpus") {
    val scores = Curation.lrScore(spark, d).collect()
    val n = scores.length.toLong
    val nKeep = scores.count(_.getLong(1) == 1L).toLong
    val majority = math.max(nKeep, n - nKeep) * 10000L / n
    val nCorrect = scores.count(_.getBoolean(5)).toLong
    val acc = nCorrect * 10000L / n
    assert(acc > majority,
      s"trained accuracy $acc does not beat the majority baseline $majority " +
        "— centering or the language-share feature regressed")
    spark.catalog.clearCache()
  }

  test("hard-sigmoid probability is monotone in the logit and consistent with the verdict") {
    val scores = Curation.lrScore(spark, d).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    for ((s, p, pred) <- scores) {
      assert(p >= 0L && p <= 10000L, s"p out of range: $p")
      assert((pred == 1L) == (s >= 0L), s"verdict inconsistent at s=$s")
      assert((p >= 5000L) == (s >= 0L) || s / 4 == 0L,
        s"p/verdict midpoint mismatch at s=$s p=$p")
    }
    val sorted = scores.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Array((s1, p1, _), (s2, p2, _)) =>
        assert(s1 > s2 || p1 <= p2, s"p not monotone: ($s1,$p1) vs ($s2,$p2)")
      case _ =>
    }
    spark.catalog.clearCache()
  }
}
