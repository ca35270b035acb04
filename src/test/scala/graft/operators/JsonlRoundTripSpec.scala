package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.sources.Tables

/** Round-trip contract for the JSONL emission: the records
  * [[Curation.jsonlRecordFrames]] assembles must be LOADABLE — written
  * as text shards, read back by `spark.read.json` with an explicit
  * schema, and equal to the source documents field-for-field. The
  * digest check in `q_jsonl_emit` pins the bytes; this pins that the
  * bytes mean what a JSON reader thinks they mean (escaping bugs
  * produce valid-looking digests but broken loads).
  */
class JsonlRoundTripSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("emitted jsonl shards read back equal to the source documents") {
    val dir = Files.createTempDirectory("graft-jsonl").toString
    val docs = Tables.documents(spark, sf)
    Curation.jsonlRecordFrames(docs)
      .select("rec").write.mode("overwrite").text(dir)

    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("lang", StringType),
      StructField("source", StringType),
      StructField("n_chars", LongType),
      StructField("text", StringType)))
    val loaded = spark.read.schema(schema).json(dir)

    // a malformed record would surface as an all-null row under the
    // default PERMISSIVE mode — count them out explicitly
    assert(loaded.where(col("id").isNull).count() === 0, "malformed records")

    val back = loaded.select(col("id").as("doc_id"), col("lang"),
      col("source"), col("n_chars"), col("text"))
      .orderBy("doc_id").collect()
    val orig = docs.select("doc_id", "lang", "source", "n_chars", "text")
      .orderBy("doc_id").collect()
    assert(back.length === orig.length)
    assert(back.map(_.toString) === orig.map(_.toString))
  }
}
