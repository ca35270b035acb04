package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media rides as opaque `binary` columns
  * with typed metadata; decode/feature-extract runs per-partition over
  * an iterator of rows (the Scala analog of a batched pandas UDF — one
  * decoder instantiation per partition, streamed rows, no per-row
  * setup).
  *
  * The actual image decode is STUBBED (no imaging libs in this
  * container): [[FakeDecoder.decode]] derives deterministic
  * width/height/format from a sha256 of the payload, standing in for a
  * real `ImageIO`/ffmpeg call. Everything around it — binary column
  * materialization, typed Dataset, mapPartitions batch shape, schema of
  * the decoded struct — is the real production plumbing and is what the
  * oracle checks.
  *
  * Scale: decode is embarrassingly parallel per parquet split; binary
  * payloads stay columnar until the decode projection, and the output is
  * a narrow typed table. No shuffle anywhere.
  */
object Multimodal {

  case class MediaBlob(doc_id: Long, blob: Array[Byte])
  case class MediaMeta(doc_id: Long, n_bytes: Long, width: Int, height: Int,
      format: String)

  /** Deterministic stand-in for a real image decoder: metadata is a pure
    * function of the payload bytes (sha256), so the DuckDB oracle can
    * reproduce it exactly.
    */
  object FakeDecoder {
    private val Formats = Array("jpeg", "png", "webp")

    def decode(b: MediaBlob): MediaMeta = {
      val md = MessageDigest.getInstance("SHA-256").digest(b.blob)
      MediaMeta(
        doc_id = b.doc_id,
        n_bytes = b.blob.length.toLong,
        width = 64 + (md(0) & 0xff) % 512,
        height = 64 + (md(1) & 0xff) % 512,
        format = Formats((md(2) & 0xff) % 3))
    }
  }

  /** documents.text → utf-8 payload bytes → per-partition "decode". */
  def multimodalDecode(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    graft.sources.Tables.documents(spark, d)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("blob"))
      .as[MediaBlob]
      .mapPartitions { it =>
        // one decoder per partition; rows stream through it
        it.map(FakeDecoder.decode)
      }
      .toDF()
      .orderBy("doc_id")
  }

  /** sha256(text) == sha256(utf-8 payload) since encode is utf-8. */
  val multimodalDecodeSql: String =
    """WITH h AS (SELECT doc_id, octet_length(encode(text)) AS n_bytes,
      |                  sha256(text) AS hx
      |           FROM documents)
      |SELECT doc_id, CAST(n_bytes AS BIGINT) AS n_bytes,
      |  CAST(64 + ('0x' || substr(hx, 1, 2))::INT % 512 AS INT) AS width,
      |  CAST(64 + ('0x' || substr(hx, 3, 2))::INT % 512 AS INT) AS height,
      |  CASE ('0x' || substr(hx, 5, 2))::INT % 3
      |    WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format
      |FROM h ORDER BY doc_id""".stripMargin

  /** Frame-sampling shape: N deterministic "frames" per media item with
    * per-frame features — the fan-out half of a video pipeline. Pure
    * column algebra (posexplode of a generated frame index), so it runs
    * at scan speed; a real pipeline would decode each sampled frame in
    * the downstream mapPartitions.
    */
  def multimodalFrames(spark: SparkSession, d: String): DataFrame =
    graft.sources.Tables.documents(spark, d)
      .where(col("n_chars") >= 200)
      .select(col("doc_id"), col("n_chars"),
        posexplode(expr("sequence(0, 3)")).as(Seq("frame_idx", "frame_no")))
      .select(
        col("doc_id"),
        col("frame_idx"),
        expr("(n_chars * (frame_idx + 1)) div 4").as("frame_offset"),
        substring(sha2(concat(col("doc_id").cast("string"), lit(":"),
          col("frame_idx").cast("string")), 256), 1, 12).as("frame_sig"))
      .orderBy("doc_id", "frame_idx")

  val multimodalFramesSql: String =
    """SELECT doc_id, CAST(f AS INT) AS frame_idx,
      |  CAST(n_chars * (f + 1) // 4 AS BIGINT) AS frame_offset,
      |  substr(sha256(CAST(doc_id AS VARCHAR) || ':' || CAST(f AS VARCHAR)), 1, 12) AS frame_sig
      |FROM documents, generate_series(0, 3) fs(f)
      |WHERE n_chars >= 200
      |ORDER BY doc_id, frame_idx""".stripMargin

  case class MediaFeat(doc_id: Long, feats: Array[Int])

  /** Feature extraction over the payload: the decoder emits a fixed-width
    * feature vector per media item (here: 8 deterministic byte features
    * from the payload digest, standing in for a real CNN/CLIP embedding
    * head), plus its L2 norm. Same per-partition batch shape as
    * [[multimodalDecode]] — one "model" per partition, streamed rows, the
    * vector lands as a typed array column ready for the similarity
    * operators. No shuffle.
    */
  def multimodalFeatures(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    graft.sources.Tables.documents(spark, d)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("blob"))
      .as[MediaBlob]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("SHA-256") // one instance per partition
        it.map { b =>
          md.reset()
          val h = md.digest(b.blob)
          MediaFeat(b.doc_id, Array.tabulate(8)(k => h(k) & 0xff))
        }
      }
      .toDF()
      .select(
        col("doc_id") +:
          (0 until 8).map(k => col("feats").getItem(k).as(s"f$k")) :+
          expr("cast(floor(sqrt(cast(aggregate(feats, 0L, (a, x) -> a + x * x) as double)) * 1000) as bigint)")
            .as("l2_e3"): _*)
      .orderBy("doc_id")
  }

  val multimodalFeaturesSql: String = {
    val fcols = (0 until 8)
      .map(k => s"CAST(('0x' || substr(hx, ${2 * k + 1}, 2))::INT AS INT) AS f$k")
      .mkString(", ")
    val sq = (0 until 8).map(k => s"f$k * f$k").mkString(" + ")
    s"""WITH h AS (SELECT doc_id, sha256(text) AS hx FROM documents),
       |f AS (SELECT doc_id, $fcols FROM h)
       |SELECT doc_id, ${(0 until 8).map(k => s"f$k").mkString(", ")},
       |  CAST(floor(sqrt(CAST($sq AS DOUBLE)) * 1000) AS BIGINT) AS l2_e3
       |FROM f ORDER BY doc_id""".stripMargin
  }

  /** Resize step over the decoded metadata: fit into a 224x224 box
    * preserving aspect ratio (integer math — floor, consistent with the
    * oracle). The decode runs in the same mapPartitions pass shape as
    * [[multimodalDecode]]; the resize itself is pure column algebra.
    */
  def multimodalResize(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    graft.sources.Tables.documents(spark, d)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("blob"))
      .as[MediaBlob]
      .mapPartitions(_.map(FakeDecoder.decode))
      .toDF()
      .withColumn("scale_e6",
        expr("least(224000000 div width, 224000000 div height)"))
      .select(
        col("doc_id"), col("width"), col("height"),
        expr("cast((width * scale_e6) div 1000000 as int)").as("out_w"),
        expr("cast((height * scale_e6) div 1000000 as int)").as("out_h"))
      .orderBy("doc_id")
  }

  val multimodalResizeSql: String =
    """WITH h AS (SELECT doc_id, sha256(text) AS hx FROM documents),
      |m AS (SELECT doc_id,
      |        CAST(64 + ('0x' || substr(hx, 1, 2))::INT % 512 AS INT) AS width,
      |        CAST(64 + ('0x' || substr(hx, 3, 2))::INT % 512 AS INT) AS height
      |      FROM h),
      |s AS (SELECT *, least(224000000 // width, 224000000 // height) AS scale_e6 FROM m)
      |SELECT doc_id, width, height,
      |  CAST((width * scale_e6) // 1000000 AS INT) AS out_w,
      |  CAST((height * scale_e6) // 1000000 AS INT) AS out_h
      |FROM s ORDER BY doc_id""".stripMargin

  /** BYTE-IDENTICAL asset dedup: group media payloads by their sha256 —
    * the first dedup pass of any multimodal pipeline (re-hosted copies
    * of the same image/video are byte-identical far more often than
    * text is), run on the digest BEFORE any decode so duplicate assets
    * never reach the expensive decoder. Distinct from q_dedup_exact:
    * that one token-normalizes text; this is raw-payload equality.
    *
    * Scale: digest map-side over the binary column, one shuffle on the
    * 64-hex key with map-side partials — the exact-dedup plan at asset
    * granularity; the keeper list then LEFT SEMI-gates the decode.
    */
  def multimodalDedup(spark: SparkSession, d: String): DataFrame =
    graft.sources.Tables.documents(spark, d)
      .select(col("doc_id"),
        sha2(encode(col("text"), "utf-8"), 256).as("payload_sha"),
        length(encode(col("text"), "utf-8")).cast("long").as("n_bytes"))
      .groupBy("payload_sha")
      .agg(min("doc_id").as("keeper_doc_id"), count(lit(1)).as("n_copies"),
        max("n_bytes").as("n_bytes"))
      .orderBy("keeper_doc_id")

  val multimodalDedupSql: String =
    """SELECT sha256(text) AS payload_sha,
      |  min(doc_id) AS keeper_doc_id, count(*) AS n_copies,
      |  CAST(max(octet_length(encode(text))) AS BIGINT) AS n_bytes
      |FROM documents GROUP BY payload_sha ORDER BY keeper_doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_dedup" -> (multimodalDedup _),
    "q_multimodal_decode" -> (multimodalDecode _),
    "q_multimodal_frames" -> (multimodalFrames _),
    "q_multimodal_features" -> (multimodalFeatures _),
    "q_multimodal_resize" -> (multimodalResize _))

  val oracles: Map[String, String] = Map(
    "q_multimodal_dedup" -> multimodalDedupSql,
    "q_multimodal_decode" -> multimodalDecodeSql,
    "q_multimodal_frames" -> multimodalFramesSql,
    "q_multimodal_features" -> multimodalFeaturesSql,
    "q_multimodal_resize" -> multimodalResizeSql)
}
