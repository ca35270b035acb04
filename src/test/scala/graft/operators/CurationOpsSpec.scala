package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Driver-side model checks for the deterministic shuffle/sharding and
  * the PII scrub — the properties the hash oracle can't articulate
  * (permutation coverage, contiguity, redaction completeness).
  */
class CurationOpsSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def sha256Hex(s: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString

  test("shuffle shards form a full permutation with contiguous positions") {
    val rows = Curation.shuffleShards(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val docIds = graft.sources.Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rows.map(_._3).toSet === docIds) // every doc exactly once
    assert(rows.length === docIds.size)
    rows.groupBy(_._1).foreach { case (shard, rs) =>
      assert(rs.map(_._2).sorted.toSeq === (1L to rs.length.toLong),
        s"shard $shard positions not contiguous")
    }
    // shard + order match the driver-side hash model
    rows.foreach { case (shard, _, docId) =>
      val h = sha256Hex(s"epoch0:$docId").take(16)
      assert(shard === java.lang.Long.parseLong(h.take(8), 16) % 8)
    }
  }

  test("a different salt yields a different permutation of the same docs") {
    val a = Curation.shuffleShards(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val b = Curation.shuffleShards(spark, sf, salt = "epoch1").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.map(_._3).toSet === b.map(_._3).toSet)
    assert(a.toSeq !== b.toSeq) // 2^-something chance of colliding on 500 docs
  }

  test("corpus shards cover exactly the emitted corpus with the same permutation rule") {
    val kept = Curation.corpusEmit(spark, sf).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val rows = Curation.corpusShards(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._3).toSet === kept)
    rows.groupBy(_._1).foreach { case (shard, rs) =>
      assert(rs.map(_._2).sorted.toSeq === (1L to rs.length.toLong),
        s"shard $shard positions not contiguous")
    }
    rows.foreach { case (shard, _, docId) =>
      val h = sha256Hex(s"epoch0:$docId").take(16)
      assert(shard === java.lang.Long.parseLong(h.take(8), 16) % 8)
    }
  }

  test("source caps keep exactly the cap hash-smallest docs per stratum") {
    val cap = Curation.DefaultSourceCap
    val byDoc = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val strata = byDoc.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val rows = Curation.sourceCaps(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getLong(5)))
    assert(rows.length === byDoc.length, "every doc gets a verdict")
    val kept = rows.filter(_._5).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    strata.foreach { case (s, ids) =>
      val expected = ids.sortBy(id => (sha256Hex(id.toString).take(16), id))
        .take(cap.toInt).toSet
      assert(kept.getOrElse(s, Set.empty) === expected, s"stratum $s keep set")
    }
    rows.foreach { case (s, id, rank, n, isKept, dropped) =>
      assert(n === strata(s).length.toLong, s"doc $id stratum size")
      assert(dropped === math.max(n - cap, 0L), s"doc $id overflow accounting")
      assert(isKept === (rank <= cap), s"doc $id verdict consistency")
    }
  }

  test("weighted sample is the hash-threshold function of the score") {
    val rows = Curation.sampleWeighted(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
    assert(rows.nonEmpty && rows.exists(_._3) && rows.exists(!_._3))
    rows.foreach { case (id, score, kept) =>
      val ppm = java.lang.Long.parseLong(
        sha256Hex(id.toString).take(8), 16) % 1000000L
      assert(kept === (ppm < 600000L * score / 2500L), s"doc $id verdict")
      assert(score >= 0L && score <= 2500L, s"doc $id score cap")
    }
    // monotone in the score: at base rate 1e6 the threshold can only rise
    val full = Curation.sampleWeighted(spark, sf, basePpm = 1000000L)
      .collect().map(r => (r.getLong(0), r.getBoolean(3))).toMap
    rows.filter(_._3).foreach { case (id, _, _) =>
      assert(full(id), s"doc $id fell OUT of the sample at a higher base rate")
    }
  }

  test("pii scrub counts the planted spans and redacts them all") {
    val byDoc = Curation.piiScrub(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))).toMap
    val texts = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byDoc.keySet === texts.keySet)
    val email = Curation.EmailPat.r
    val ipv4 = Curation.Ipv4Pat.r
    val phone = Curation.PhonePat.r
    texts.foreach { case (id, text) =>
      val aug = s"contact u${id % 50}@mail${id % 7}.com from 10.${id % 256}" +
        s".0.${id % 100} tel +1-555-${"%04d".format(id % 10000)} :: $text"
      val red = phone.replaceAllIn(
        ipv4.replaceAllIn(email.replaceAllIn(aug, "<EMAIL>"), "<IP>"),
        "<PHONE>")
      val (nEmail, nIpv4, nPhone, redLen, redHash) = byDoc(id)
      assert(nEmail === email.findAllIn(aug).size.toLong, s"doc $id emails")
      assert(nIpv4 === ipv4.findAllIn(aug).size.toLong, s"doc $id ips")
      assert(nPhone === phone.findAllIn(aug).size.toLong, s"doc $id phones")
      assert(nEmail >= 1 && nIpv4 >= 1 && nPhone >= 1, s"doc $id planted spans")
      assert(redLen === red.length.toLong, s"doc $id red_len")
      assert(redHash === sha256Hex(red).take(16), s"doc $id red_hash")
      // redaction is complete: no pattern survives its own replacement
      assert(email.findFirstIn(red).isEmpty && phone.findFirstIn(red).isEmpty,
        s"doc $id: unredacted span remains")
    }
  }

  test("dsir weights match an independent driver model and favor the target slice") {
    val B = Curation.DefaultDsirBuckets
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val tokRe = "[a-z0-9]+".r
    def bucketOf(tok: String): Long =
      java.lang.Long.parseLong(sha256Hex(tok).take(8), 16) % B
    val occ = docs.map { case (id, lang, text) =>
      (id, lang == Curation.DefaultDsirTargetLang,
        tokRe.findAllIn(text.toLowerCase).map(bucketOf).toSeq)
    }
    val cRaw = occ.flatMap(_._3).groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
    val cTgt = occ.filter(_._2).flatMap(_._3).groupBy(identity)
      .map { case (b, xs) => b -> xs.size.toLong }
    val nRaw = cRaw.values.sum
    val nTgt = cTgt.values.sum
    def ratioE6(b: Long): Long =
      ((BigInt(cTgt.getOrElse(b, 0L)) + 1) * (nRaw + B) * 1000000 /
        ((BigInt(cRaw(b)) + 1) * (nTgt + B))).toLong
    val expected = occ.filter(_._3.nonEmpty).map { case (id, _, bs) =>
      id -> ((bs.map(ratioE6).sum / bs.size).toLong, bs.size.toLong)
    }.toMap
    val got = Curation.dsirWeights(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(1))).toMap
    assert(got === expected)
    // semantics: the target-language slice must outscore the rest on average
    val byTgt = occ.filter(_._3.nonEmpty)
      .groupBy(_._2).map { case (t, xs) =>
        t -> xs.map(x => got(x._1)._1).sum / xs.length
      }
    assert(byTgt(true) > byTgt(false),
      s"target-slice mean ${byTgt(true)} not above off-target ${byTgt(false)}")
  }

  test("source overlap equals the driver set-arithmetic model over all pairs") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val tokRe = "[a-z0-9]+".r
    val sets: Map[String, Set[String]] = docs.groupBy(_._1).map { case (src, xs) =>
      src -> xs.flatMap { case (_, text) =>
        val toks = tokRe.findAllIn(text.toLowerCase).toSeq
        toks.sliding(3).filter(_.size == 3).map(_.mkString(" "))
      }.map(sh => sha256Hex(sh).take(16)).toSet
    }
    val srcs = sets.keys.toSeq.sorted
    val expected = (for {
      a <- srcs; b <- srcs if a < b
    } yield {
      val (na, nb) = (sets(a).size.toLong, sets(b).size.toLong)
      val common = (sets(a) intersect sets(b)).size.toLong
      (a, b) -> ((na, nb, common, common * 1000000L / (na + nb - common)))
    }).toMap
    val got = Curation.sourceOverlap(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got === expected)
    assert(got.size === srcs.size * (srcs.size - 1) / 2, "matrix not total")
  }

  test("quality calibration is the decile contingency of classifier x verdict") {
    val w = Curation.QcDecileWidthE6
    val clf = Curation.qualityClassifier(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val heur = Curation.curationVerdict(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(6)).toMap
    val expected = clf.toVector.map { case (doc, score) =>
      (math.min(score / w, 9L), score, heur(doc))
    }.groupBy(_._1).map { case (dec, rs) =>
      dec -> ((rs.size.toLong, rs.count(_._3).toLong,
        rs.map(_._2).min, rs.map(_._2).max,
        rs.count(_._3).toLong * 10000L / rs.size))
    }
    val got = Curation.qualityCalibration(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    assert(got === expected)
    assert(got.values.map(_._1).sum === clf.size.toLong,
      "every doc lands in exactly one decile")
    got.foreach { case (dec, (_, _, lo, hi, _)) =>
      assert(lo >= dec * w && (dec == 9L || hi < (dec + 1) * w),
        s"decile $dec score bounds")
    }
  }

  test("dist drift is an internally consistent share report with real drift") {
    val rows = Curation.distDrift(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    // shares sum to 1e6 up to the floor remainder (one per bucket)
    val sumOld = rows.map(_._4).sum
    val sumNew = rows.map(_._5).sum
    assert(sumOld <= 1000000L && sumOld > 1000000L - rows.length, s"old ppm sum $sumOld")
    assert(sumNew <= 1000000L && sumNew > 1000000L - rows.length, s"new ppm sum $sumNew")
    // delta and tv are derived exactly from the shares
    rows.foreach { case (b, _, _, o, nw, delta, _) =>
      assert(delta === nw - o, s"bucket $b delta")
    }
    val tv = rows.map(r => math.abs(r._6)).sum / 2
    assert(rows.map(_._7).distinct.toSeq === Seq(tv), "tv_ppm constant and exact")
    // the planted old/new windows guarantee nonzero drift
    assert(tv > 0L, "planted drift should be visible")
    assert(tv <= 1000000L, "TV distance is bounded by 1")
  }

  test("robust filter matches a driver median/MAD model per source") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // ceil-rank median over (value, doc_id) ordering — the house convention
    def medBy(xs: Seq[(Long, Long)]): Long = {
      val sorted = xs.sortBy(x => (x._2, x._1))
      sorted(((sorted.size * 50 + 99) / 100 - 1).toInt)._2
    }
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      val med = medBy(ds.map(d => (d._1, d._3)).toSeq)
      val mad = medBy(ds.map(d => (d._1, math.abs(d._3 - med))).toSeq)
      ds.toSeq.map { case (id, _, n) =>
        id -> ((src, n, med, mad, math.abs(n - med) > 3 * mad))
      }
    }.toMap
    val got = Curation.robustFilter(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))).toMap
    assert(got === expected)
    // the synthetic lengths are uniform-ish: nothing should be 3-MAD out,
    // which is itself worth pinning (a false-positive storm would be a bug)
    val flagged = got.values.count(_._5)
    assert(flagged <= got.size / 10, s"$flagged of ${got.size} docs flagged")
  }

  test("jsonl records round-trip a real JSON parser, including planted escapes") {
    import spark.implicits._
    // adversarial fixtures the synthetic corpus can't supply: quotes,
    // backslashes, and both adjacent in every order
    val planted = Seq(
      (1L, "en", "src\"quoted\"", 10L, """plain text"""),
      (2L, "e\\n", "src\\back", 11L, """say "hi" \ "bye\""""),
      (3L, "zh", "s", 12L, """\\" tricky "\ end\"""),
      (4L, "en", "ctl", 13L, "line one\nline two\ttabbed\rcr \\n mixed"))
      .toDF("doc_id", "lang", "source", "n_chars", "text")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val inputs = planted.collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getLong(3),
        r.getString(4)))).toMap
    Curation.jsonlRecordFrames(planted).collect().foreach { r =>
      val node = om.readTree(r.getString(1)) // throws on malformed JSON
      val (lang, source, nChars, text) = inputs(r.getLong(0))
      assert(node.get("id").asLong === r.getLong(0))
      assert(node.get("lang").asText === lang)
      assert(node.get("source").asText === source)
      assert(node.get("n_chars").asLong === nChars)
      assert(node.get("text").asText === text, s"doc ${r.getLong(0)} text mangled")
    }
    // the reported length/digest are OF the assembled record
    val recs = Curation.jsonlRecordFrames(planted).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    Curation.jsonlFrames(planted).collect().foreach { r =>
      val rec = recs(r.getLong(0))
      assert(r.getLong(1) === rec.length.toLong)
      assert(r.getString(2) === sha256Hex(rec).take(16))
    }
    // \n/\t/\r round-trip via short escapes; the record itself must stay
    // one physical line (JSONL framing)
    recs.values.foreach(rec => assert(!rec.exists(c => c == '\n' || c == '\r'),
      "record broke JSONL line framing"))
    // C0 controls without a short escape \u00XX-encode (round-8
    // losslessness fix): the record stays one physical line and a JSON
    // reader decodes the original bytes back
    val ctlText = "a" + "\u0001" + "b" + "\u001F" + "c"
    val ctl = Seq((9L, "en", "s", 5L, ctlText))
      .toDF("doc_id", "lang", "source", "n_chars", "text")
    val ctlRec = Curation.jsonlRecordFrames(ctl).collect().head.getString(1)
    assert(ctlRec.contains("\\u0001") && ctlRec.contains("\\u001f"),
      "unescapable C0 controls must \\u00XX-encode")
    assert(om.readTree(ctlRec).get("text").asText === ctlText,
      "C0 controls must round-trip losslessly")
  }

  test("admission keeps and passes docs from sources absent in the fit") {
    import spark.implicits._
    val bounds = Seq(("known", 100L, 10L))
      .toDF("source", "med_chars", "mad_chars")
    val docs = Seq(
      (1L, "known", 100L), // in bounds, inlier
      (2L, "known", 200L), // in bounds, outlier (dev 100 > 3*10)
      (3L, "fresh", 999L)) // source unseen by the fit
      .toDF("doc_id", "source", "n_chars")
    val got = Curation.admitFrames(docs, bounds).collect()
      .map(r => r.getLong(0) -> ((r.isNullAt(3), r.getBoolean(5)))).toMap
    assert(got(1L) === ((false, false)))
    assert(got(2L) === ((false, true)))
    // unseen source: row KEPT, bounds null, admitted by default
    assert(got(3L) === ((true, false)), "unseen-source doc dropped or flagged")
    assert(got.size === 3)
  }

  test("corpus diff matches a driver classification of every doc") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def bucket(id: Long): Long =
      java.lang.Long.parseLong(sha256Hex(id.toString).take(8), 16) % 100
    val statuses = docs.map { case (id, src) =>
      val b = bucket(id)
      val status =
        if (b >= 95) "added" // only in new
        else if (b < 3) "removed" // only in old
        else if (id % 13 == 0) "changed" // planted drift
        else "unchanged"
      (src, status)
    }
    val expected = statuses.groupBy(_._1).map { case (src, xs) =>
      src -> ((xs.count(_._2 == "added").toLong,
        xs.count(_._2 == "removed").toLong,
        xs.count(_._2 == "changed").toLong,
        xs.count(_._2 == "unchanged").toLong))
    }
    val got = Curation.corpusDiff(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got === expected)
    // every category must be exercised by the planted drift
    assert(got.values.map(_._1).sum > 0, "no added docs")
    assert(got.values.map(_._2).sum > 0, "no removed docs")
    assert(got.values.map(_._3).sum > 0, "no changed docs")
    assert(got.values.map(_._4).sum > 0, "no unchanged docs")
  }

  test("url dedup groups match a driver canonicalization model") {
    val ids = graft.sources.Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0))
    def rawUrl(id: Long): String = {
      val host = s"site${id % 5}.com"
      val cased = (id % 3) match {
        case 0 => host.toUpperCase
        case 1 => s"Site${id % 5}.Com"
        case _ => host
      }
      (if (id % 2 == 0) "https://www." else "http://") + cased +
        s"/p/${id % 10}" + (if (id % 7 == 0) "/" else "") +
        s"?utm_source=feed&ref=$id" + (if (id % 5 == 0) "#frag" else "")
    }
    def canon(u: String): String =
      u.replaceAll("[?#].*$", "").replaceAll("^https?://", "")
        .toLowerCase.replaceAll("^www\\.", "").replaceAll("/$", "")
    val expected = ids.map(id => (id, rawUrl(id)))
      .groupBy { case (_, u) => canon(u) }
      .collect { case (norm, xs) if xs.length >= 2 =>
        norm -> ((xs.length.toLong, xs.map(_._2).distinct.length.toLong,
          xs.map(_._1).min))
      }
    val got = Curation.urlDedup(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === expected)
    got.keys.foreach { norm =>
      assert(!norm.exists(_.isUpper) && !norm.contains("www.") &&
        !norm.contains("?") && !norm.contains("#") && !norm.endsWith("/"),
        s"un-canonical form survived: $norm")
    }
    // the planting must actually exercise variant collapsing
    assert(got.values.exists(_._2 > 1), "no group collapses multiple raw variants")
  }
}
