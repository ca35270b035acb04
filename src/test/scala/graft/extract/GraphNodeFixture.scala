package graft.extract

import java.math.{BigDecimal => JBigDecimal}

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/** Parquet simulation of the reference's test database
  * (tests/resources/example_db.sql): one extractable entity table with 6
  * rows of uint256-bearing data, plus the graph-node catalog tables.
  * Block numbers span [18460372, 18888119] inside a deployment range
  * [18000000, latest]; `latest` is a parameter so tests can advance the
  * chain head between runs (test_get_column_info.py:164-178).
  */
object GraphNodeFixture {

  val Subgraph = "my_test_subgraph"
  val Deployment = "SUBGRAPHIPFS"
  val Schema = "sgd1"
  val Table = "prepaid_card_ask_sample"
  val EarliestBlock = 18000000L

  /** (vid, block_lower, block_upper, id, ask_price, issuing_token, sku) */
  val EntityBlocks: Seq[Long] =
    Seq(18460372L, 18500000L, 18888050L, 18888060L, 18888100L, 18888119L)

  /** `extraTables` clones the entity table under additional names (with
    * matching information_schema rows) for multi-table pipeline tests.
    */
  def write(spark: SparkSession, root: String, latestBlock: Long,
      extraTables: Seq[String] = Nil): Unit = {
    import spark.implicits._
    def p(rel: String) = s"$root/$rel"

    Seq((Deployment, Schema, "poa-sokol", true))
      .toDF("subgraph", "name", "network", "active")
      .write.mode("overwrite").parquet(p("catalog/deployment_schemas.parquet"))
    Seq((Deployment, "internalversion1"))
      .toDF("deployment", "id")
      .write.mode("overwrite").parquet(p("catalog/subgraph_version.parquet"))
    Seq((Subgraph, "internalversion1"))
      .toDF("name", "current_version")
      .write.mode("overwrite").parquet(p("catalog/subgraph.parquet"))
    Seq((Deployment, EarliestBlock, latestBlock))
      .toDF("deployment", "earliest_block_number", "latest_ethereum_block_number")
      .write.mode("overwrite").parquet(p("catalog/subgraph_deployment.parquet"))

    val infoRows = (Table +: extraTables).flatMap { t =>
      Seq(
        (Schema, t, "id", "text"),
        (Schema, t, "ask_price", "numeric"),
        (Schema, t, "issuing_token", "text"),
        (Schema, t, "sku", "text"),
        (Schema, t, "block_range", "int4range"),
        (Schema, t, "vid", "bigint"))
    } ++ Seq(
      // not extractable: no block_range (S4 must exclude it)
      (Schema, "sample_table", "amount", "numeric"),
      (Schema, "sample_table", "from_address", "text"))
    infoRows.toDF("table_schema", "table_name", "column_name", "data_type")
      .write.mode("overwrite").parquet(p("catalog/information_schema.parquet"))

    val schema = StructType(Seq(
      StructField("vid", LongType),
      StructField("block_lower", IntegerType),
      StructField("block_upper", IntegerType, nullable = true),
      StructField("id", StringType),
      StructField("ask_price", DecimalType(38, 0)),
      StructField("issuing_token", StringType),
      StructField("sku", StringType)))
    val rows = EntityBlocks.zipWithIndex.map { case (b, i) =>
      Row(i.toLong + 1, b.toInt, null,
        f"0x01974608$i%02x", new JBigDecimal(s"1000000000000000000$i"),
        "0x26F2319Fbb44772e0ED58fB7c99cf8da59e2b5BE",
        f"0x0197460800000000000000000000000000000000000000000000000000abc$i%03d")
    }
    val entityDf = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    (Table +: extraTables).foreach { t =>
      entityDf.write.mode("overwrite").parquet(p(s"$Schema/$t.parquet"))
    }
  }
}
