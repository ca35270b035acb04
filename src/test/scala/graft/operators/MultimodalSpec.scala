package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Pins the REAL image decode ([[Multimodal.decodeImage]] via
  * `javax.imageio`): a hand-authored BMP with known pixels must decode
  * byte-exactly, both planted container formats must round-trip their
  * arithmetic pixel content, and the production query's digests are
  * pinned as literals (any stride/row-order/channel regression in the
  * decode chain changes them).
  */
class MultimodalSpec extends AnyFunSuite with SparkTestBase {

  test("hand-authored 2x2 BMP decodes to the exact authored pixels") {
    // 2x2, 24bpp, bottom-up, rows padded to 4 bytes (2*3=6 → pad 2).
    // Authored top-down pixels: (255,0,0) (0,255,0) / (0,0,255) (9,8,7)
    val rows = Seq( // file order = bottom row first, BGR
      Seq(255, 0, 0, 7, 8, 9), // bottom: blue pixel, then (9,8,7)
      Seq(0, 0, 255, 0, 255, 0)) // top: red pixel, then green
    val data = rows.flatMap(_ ++ Seq(0, 0)).map(_.toByte).toArray
    val buf = java.nio.ByteBuffer.allocate(54 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + data.length)
      .putInt(0).putInt(54)
    buf.putInt(40).putInt(2).putInt(2).putShort(1).putShort(24)
      .putInt(0).putInt(data.length).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    buf.put(data)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(buf.array()))
    assert(img != null, "JDK BMP reader must parse the hand-built payload")
    assert((img.getWidth, img.getHeight) === (2, 2))
    def rgb(x: Int, y: Int) = {
      val p = img.getRGB(x, y)
      ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
    }
    assert(rgb(0, 0) === ((255, 0, 0)))
    assert(rgb(1, 0) === ((0, 255, 0)))
    assert(rgb(0, 1) === ((0, 0, 255)))
    assert(rgb(1, 1) === ((9, 8, 7)))
  }

  test("both planted containers decode back to the arithmetic pixels") {
    for (docId <- 0L to 9L) {
      val decoded = Multimodal.decodeImage(docId, Multimodal.plantedPayload(docId))
      val (w, h) = Multimodal.plantedDims(docId)
      assert((decoded.width, decoded.height) === ((w, h)), s"doc $docId dims")
      assert(decoded.format === (if (docId % 2 == 0) "bmp" else "png"))
      // independent canonical rendering from the ground-truth arithmetic
      val want = (0 until w * h).map { i =>
        val (r, g, b) = Multimodal.plantedRgb(docId, i)
        s"$r:$g:$b"
      }.mkString(",")
      val sha = java.security.MessageDigest.getInstance("SHA-256")
        .digest(want.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString.take(16)
      assert(decoded.pixel_sha16 === sha, s"doc $docId pixel digest")
    }
  }

  test("dHash is invariant to the planted brightness shift through a real decode") {
    import javax.imageio.ImageIO
    import java.io.ByteArrayInputStream
    // doc 7 and doc 7+50k share base 7 with different deltas and
    // different containers (odd/even ids alternate BMP/PNG)
    val sameBase = Seq(7L, 57L, 107L, 157L)
    val hashes = sameBase.map { id =>
      val img = ImageIO.read(new ByteArrayInputStream(Multimodal.nearPayload(id)))
      Multimodal.dhash(img)
    }
    assert(hashes.distinct.size === 1,
      s"brightness-shifted copies must share a dHash, got $hashes")
    // a different base must (for these pinned values) hash differently
    val other = ImageIO.read(new ByteArrayInputStream(Multimodal.nearPayload(8L)))
    assert(Multimodal.dhash(other) !== hashes.head,
      "distinct base images should not collide on these fixtures")
  }

  test("phash groups collapse byte-distinct near-duplicates") {
    val sf = "/root/testdata/sf0.001"
    val rows = Multimodal.multimodalPhash(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.map(_._3).sum === nDocs, "groups partition the corpus")
    assert(rows.forall(_._4 > 1L),
      "every planted group contains multiple brightness variants")
    assert(rows.forall(r => r._4 <= r._3), "variants cannot exceed images")
  }

  test("query digests are pinned (decode-chain regression detector)") {
    val rows = Multimodal.multimodalDecode(spark, "/root/testdata/sf0.001")
      .limit(4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3), r.getString(4)))
    assert(rows === Array(
      (0L, 4, 4, "bmp", "c8769a6296da5884"),
      (1L, 5, 5, "png", "99103f8315c5b2dc"),
      (2L, 6, 6, "bmp", "c47152fa98c0ca08"),
      (3L, 7, 4, "png", "6d659be06a3e01f7")))
  }
}
