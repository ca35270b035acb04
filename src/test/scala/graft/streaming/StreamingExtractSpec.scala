package graft.streaming

import java.math.{BigDecimal => JBigDecimal}
import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.model.TableConfig

class StreamingExtractSpec extends AnyFunSuite with SparkTestBase {

  private val schema = StructType(Seq(
    StructField("vid", LongType),
    StructField("block_lower", IntegerType),
    StructField("block_upper", IntegerType, nullable = true),
    StructField("id", StringType),
    StructField("amount", DecimalType(38, 0))))

  private val types = Map("id" -> "text", "amount" -> "numeric")
  private val tableCfg = TableConfig(partitionSizes = Seq(64L))

  /** The file-stream source lists plain files (it does not descend into
    * Spark's output directories), so stage each drop as a single file.
    */
  private def writeDrop(dir: String, name: String, rows: Seq[(Long, Int, String, String)]): Unit = {
    val tmp = Files.createTempDirectory("se-drop")
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (v, b, id, amt) =>
          Row(v, b, null, id, new JBigDecimal(amt))
        }, 1), schema)
      .write.mode("overwrite").parquet(tmp.toString)
    val part = new java.io.File(tmp.toString).listFiles()
      .find(f => f.getName.endsWith(".parquet")).get
    Files.copy(part.toPath, java.nio.file.Paths.get(dir, name))
  }

  test("streamed drops land in the partition layout; replayed content dedupes") {
    val src = Files.createTempDirectory("se-src").toString
    val out = Files.createTempDirectory("se-out").toString + "/table"
    val ckpt = Files.createTempDirectory("se-ckpt").toString

    // two drops: disjoint ranges plus one straddling duplicate content
    writeDrop(src, "drop1.parquet", Seq(
      (1L, 100, "a", "10"), (2L, 130, "b", "20")))
    writeDrop(src, "drop2.parquet", Seq(
      (3L, 140, "c", "30"),
      (2L, 130, "b", "20"))) // same entity re-delivered (at-least-once)
    StreamingExtract.run(spark, src, schema, types, tableCfg, 64L, out, ckpt,
      dedupeKeys = Seq("id"))

    val df = spark.read.parquet(out)
    assert(df.count() === 3) // b deduped
    val dirs = new java.io.File(out).listFiles().map(_.getName).toSet
    assert(dirs.contains("partition_size=64"))
    val starts = spark.read.parquet(out)
      .selectExpr("cast(start_partition as long)") // partition col infers as int
      .distinct().collect().map(_.getLong(0)).toSet
    assert(starts === Set(64L, 128L)) // blocks 100 → [64,128); 130/140 → [128,192)
    val fields = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(fields("amount") === BinaryType) // uint256 carrier applied

    // catch-up run with a third drop appends without disturbing history
    writeDrop(src, "drop3.parquet", Seq((4L, 200, "d", "40")))
    StreamingExtract.run(spark, src, schema, types, tableCfg, 64L, out, ckpt,
      dedupeKeys = Seq("id"))
    assert(spark.read.parquet(out).count() === 4)
    assert(spark.read.parquet(out).select("start_partition").distinct().count() === 3)
  }
}
