package graft.extract

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One subgraph's catalog entry (reference `get_subgraph_table_schemas`,
  * cli.py:72-107): where its entity tables live and the block range the
  * deployment has indexed.
  */
final case class CatalogEntry(
    subgraphName: String,
    deployment: String,
    schemaName: String,
    network: String,
    earliestBlock: Long,
    latestBlock: Long)

/** Swappable source of graph-node entity data (SURVEY.md §7.5: the
  * build environment has no Postgres, so the same relational surface is
  * implemented over parquet fixtures; a JDBC implementation would push
  * the identical predicates/projections into Postgres subqueries).
  */
trait EntitySource {

  /** S3 catalog discovery, keyed by subgraph name. */
  def catalog(spark: SparkSession): Map[String, CatalogEntry]

  /** S4: tables of a schema that carry a block_range (extractable). */
  def tableNames(spark: SparkSession, schema: String): Seq[String]

  /** S2: column name → source database type (reference
    * information_schema.columns read, cli.py:56-69).
    */
  def columnTypes(spark: SparkSession, schema: String, table: String): Map[String, String]

  /** S1: entity-range scan — rows valid from a block in `[start, end)`,
    * with `_block_number` materialized and surrogate/range columns
    * dropped. Implementations MUST push the range predicate into the
    * scan (parquet row-group stats / JDBC subquery), not filter
    * post-hoc.
    */
  def scanRange(spark: SparkSession, schema: String, table: String,
      start: Long, end: Long): DataFrame
}

/** Parquet-fixture implementation simulating a graph-node database
  * (FIXTURES.md layout):
  *
  * {{{
  * root/
  *   catalog/deployment_schemas.parquet      (subgraph, name, network, active)
  *   catalog/subgraph_version.parquet        (deployment, id)
  *   catalog/subgraph.parquet                (name, current_version)
  *   catalog/subgraph_deployment.parquet     (deployment, earliest_block_number,
  *                                            latest_ethereum_block_number)
  *   catalog/information_schema.parquet      (table_schema, table_name,
  *                                            column_name, data_type)
  *   <schema>/<table>.parquet                entity rows: vid, block_lower,
  *                                            block_upper (nullable), data cols
  * }}}
  *
  * `block_range int4range` is modeled as (block_lower, block_upper);
  * only the lower bound is consumed, exactly like the reference's
  * `lower(block_range)` (cli.py:39).
  */
final class ParquetEntitySource(root: String) extends EntitySource {

  private def read(spark: SparkSession, rel: String): DataFrame =
    spark.read.parquet(s"${root.stripSuffix("/")}/$rel")

  /** The reference's 3× LEFT JOIN with active/current-version filters
    * (cli.py:74-89). All four inputs are tiny catalog tables → every
    * join is a broadcast; the result is collected to a driver Map (it
    * is per-subgraph metadata, not data).
    */
  override def catalog(spark: SparkSession): Map[String, CatalogEntry] = {
    val ds = read(spark, "catalog/deployment_schemas.parquet")
      .select(col("subgraph").as("ds_subgraph"), col("name").as("schema_name"),
        col("network"), col("active"))
    val sv = read(spark, "catalog/subgraph_version.parquet")
      .select(col("deployment").as("sv_deployment"), col("id").as("sv_id"))
    val sg = read(spark, "catalog/subgraph.parquet")
      .select(col("name").as("subgraph_name"), col("current_version"))
    val sd = read(spark, "catalog/subgraph_deployment.parquet")
      .select(col("deployment").as("sd_deployment"),
        col("earliest_block_number"), col("latest_ethereum_block_number"))
    ds.join(broadcast(sv), col("ds_subgraph") === col("sv_deployment"), "left")
      .join(broadcast(sg), col("current_version") === col("sv_id"), "left")
      .join(broadcast(sd), col("sd_deployment") === col("ds_subgraph"), "left")
      .where(col("active") && col("current_version").isNotNull)
      // LEFT JOIN admits deployments with no subgraph_deployment row;
      // without a registered block range nothing is extractable (and
      // Row.getLong would NPE on the nulls) — skip them
      .where(col("earliest_block_number").isNotNull &&
        col("latest_ethereum_block_number").isNotNull)
      .select(col("subgraph_name"), col("ds_subgraph"), col("schema_name"),
        col("network"),
        col("earliest_block_number").cast("long").as("earliest"),
        col("latest_ethereum_block_number").cast("long").as("latest"))
      .collect()
      .map { r =>
        r.getString(0) -> CatalogEntry(r.getString(0), r.getString(1),
          r.getString(2), r.getString(3), r.getLong(4), r.getLong(5))
      }.toMap
  }

  override def tableNames(spark: SparkSession, schema: String): Seq[String] =
    read(spark, "catalog/information_schema.parquet")
      .where(col("table_schema") === schema && col("column_name") === "block_range")
      .select("table_name").distinct().orderBy("table_name")
      .collect().map(_.getString(0)).toSeq

  override def columnTypes(spark: SparkSession, schema: String,
      table: String): Map[String, String] =
    read(spark, "catalog/information_schema.parquet")
      .where(col("table_schema") === schema && col("table_name") === table)
      .select("column_name", "data_type")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  override def scanRange(spark: SparkSession, schema: String, table: String,
      start: Long, end: Long): DataFrame =
    read(spark, s"$schema/$table.parquet")
      .where(col("block_lower") >= start && col("block_lower") < end)
      .withColumn("_block_number", col("block_lower"))
      .drop("vid", "block_lower", "block_upper")
}
