package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Seeded fuzz for the JSONL escape chain: 300 adversarial strings
  * (random unicode mixed with quotes, backslashes, C0 controls, and
  * boundary cases) flow through [[Curation.jsonlRecordFrames]] in ONE
  * batched job, and every record must parse under a real JSON parser
  * back to EXACTLY the input — \n/\t/\r as short escapes, the other
  * C0 controls as \u00XX escapes (round-8 losslessness fix; they were
  * previously stripped). The oracle can't reach this surface — the
  * corpus has none of these characters — so the fuzz IS the coverage.
  */
class JsonlFuzzSpec extends AnyFunSuite with SparkTestBase {

  /** The documented contract: serialization is lossless. */
  private def expectedText(s: String): String = s

  test("fuzzed strings round-trip the record assembly under a JSON parser") {
    import spark.implicits._
    val rnd = new scala.util.Random(42) // seeded: failures reproduce
    val alphabet: IndexedSeq[Char] =
      ('a' to 'e') ++ Seq('"', '\\', '\n', '\t', '\r', ' ',
        0x00.toChar, 0x01.toChar, 0x0b.toChar, 0x1f.toChar,
        '{', '}', '[', ']', ':', ',', '/', 'x', 'y')
    def randomString(): String =
      Seq.fill(rnd.nextInt(40))(alphabet(rnd.nextInt(alphabet.size))).mkString
    val boundary = Seq("", "\\", "\"", "\\\"", "\"\\", "\n", "\\n",
      "\\\\n", 0x00.toChar.toString, "\r\n", "a" + 0x01.toChar + "b")
    val inputs = (boundary ++ Seq.fill(300)(randomString())).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }

    val planted = inputs.map { case (id, s) => (id, s, s, 0L, s) }
      .toDF("doc_id", "lang", "source", "n_chars", "text")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val recs = Curation.jsonlRecordFrames(planted).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(recs.size === inputs.size)
    inputs.foreach { case (id, s) =>
      val rec = recs(id)
      assert(!rec.exists(c => c == '\n' || c == '\r'),
        s"case $id broke JSONL line framing for input ${s.map(_.toInt)}")
      val node = om.readTree(rec) // throws on malformed JSON
      val want = expectedText(s)
      assert(node.get("text").asText === want,
        s"case $id text mangled for input ${s.map(_.toInt)}")
      assert(node.get("lang").asText === want, s"case $id lang mangled")
      assert(node.get("source").asText === want, s"case $id source mangled")
      assert(node.get("id").asLong === id)
    }
  }
}
