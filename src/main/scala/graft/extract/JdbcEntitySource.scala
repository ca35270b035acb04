package graft.extract

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** JDBC implementation of [[EntitySource]] against a live graph-node
  * Postgres — the production twin of [[ParquetEntitySource]].
  *
  * Each method pushes the reference's exact SQL into Postgres as a
  * `dbtable` subquery (reference subgraph_extractor/cli.py:24-53,
  * 56-69, 72-92, 366-380): the range predicate, `lower(block_range)`
  * projection, and catalog joins all execute server-side, so only
  * result rows cross the wire — Catalyst cannot synthesize PG range
  * functions, hence the explicit subqueries (SURVEY.md §4).
  *
  * Test coverage (no pgjdbc jar in this environment, so the PG-wire +
  * Spark combination specifically can't run): the SQL strings are
  * pinned by JdbcEntitySourceSpec, executed against a REAL throwaway
  * Postgres (int4range, ::casts, information_schema semantics) by
  * PostgresSqlContractSpec, and the `spark.read.jdbc` plumbing itself
  * (url/driver/dbtable-subquery wiring, positional collects, striping)
  * runs end-to-end on embedded Derby in DerbyJdbcSmokeSpec; the
  * behavioral contract is integration-tested via ParquetEntitySource
  * against the same trait.
  */
/** @param scanPartitions parallel JDBC connections per range scan
  *   (default 1 = the reference's single-connection behavior). With
  *   N > 1 Spark stripes `[start, end)` on `_block_number` and each
  *   executor task pulls its own stripe — the knob that makes initial
  *   backfill of a large table scale out instead of serializing on one
  *   connection. Within-stripe order is preserved by the pushed
  *   `ORDER BY`; the pipeline re-sorts per output partition anyway
  *   (ExtractPipeline O1), so cross-stripe order is irrelevant.
  */
final class JdbcEntitySource(url: String, props: java.util.Properties,
    scanPartitions: Int = 1)
    extends EntitySource {

  private def jdbc(spark: SparkSession, subquery: String,
      extra: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", s"($subquery) AS t")
      .options(scala.jdk.CollectionConverters.PropertiesHasAsScala(props)
        .asScala.map { case (k, v) => k.toString -> v.toString }.toMap)
      .options(extra)
      .load()

  override def catalog(spark: SparkSession): Map[String, CatalogEntry] =
    jdbc(spark, JdbcEntitySource.catalogSql)
      .collect()
      .map { r =>
        r.getString(0) -> CatalogEntry(r.getString(0), r.getString(1),
          r.getString(2), r.getString(3), r.getLong(4), r.getLong(5))
      }.toMap

  override def tableNames(spark: SparkSession, schema: String): Seq[String] =
    jdbc(spark, JdbcEntitySource.tableNamesSql(schema))
      .collect().map(_.getString(0)).toSeq

  override def columnTypes(spark: SparkSession, schema: String,
      table: String): Map[String, String] =
    jdbc(spark, JdbcEntitySource.columnTypesSql(schema, table))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  override def scanRange(spark: SparkSession, schema: String, table: String,
      start: Long, end: Long): DataFrame =
    jdbc(spark, JdbcEntitySource.scanRangeSql(schema, table, start, end),
        JdbcEntitySource.scanPartitionOptions(start, end, scanPartitions))
      .drop("vid", "block_range")
}

object JdbcEntitySource {

  private def q(ident: String): String = {
    require(ident.matches("[A-Za-z0-9_]+"), s"unsafe SQL identifier: $ident")
    "\"" + ident + "\""
  }

  /** cli.py:74-89 — catalog discovery with ::int casts and filters. */
  val catalogSql: String =
    """SELECT s.name AS subgraph_name, ds.subgraph AS deployment,
      |  ds.name AS schema_name, ds.network,
      |  sd.earliest_block_number::bigint AS earliest,
      |  sd.latest_ethereum_block_number::bigint AS latest
      |FROM deployment_schemas ds
      |LEFT JOIN subgraphs.subgraph_version sv ON ds.subgraph = sv.deployment
      |LEFT JOIN subgraphs.subgraph s ON s.current_version = sv.id
      |LEFT JOIN subgraphs.subgraph_deployment sd ON sd.deployment = ds.subgraph
      |WHERE ds.active AND s.current_version IS NOT NULL
      |  AND sd.earliest_block_number IS NOT NULL
      |  AND sd.latest_ethereum_block_number IS NOT NULL""".stripMargin

  /** cli.py:366-380 — extractable-table listing. */
  def tableNamesSql(schema: String): String =
    s"""SELECT DISTINCT table_name FROM information_schema.columns
       |WHERE table_schema = '${schema.replace("'", "''")}'
       |  AND column_name = 'block_range'
       |ORDER BY table_name""".stripMargin

  /** cli.py:56-69 — column-type introspection. */
  def columnTypesSql(schema: String, table: String): String =
    s"""SELECT column_name, data_type FROM information_schema.columns
       |WHERE table_schema = '${schema.replace("'", "''")}'
       |  AND table_name = '${table.replace("'", "''")}'""".stripMargin

  /** Spark JDBC striping options for a `[start, end)` scan: the source
    * adds per-task `_block_number` bounds around the pushed subquery, so
    * N connections each pull `(end-start)/N` blocks. Empty (single
    * connection) when `n <= 1` or the range can't be striped.
    */
  def scanPartitionOptions(start: Long, end: Long, n: Int): Map[String, String] =
    if (n <= 1 || end - start < n) Map.empty
    else Map(
      "partitionColumn" -> "_block_number",
      "lowerBound" -> start.toString,
      "upperBound" -> end.toString,
      "numPartitions" -> n.toString)

  /** cli.py:24-53 — the S1 range scan with lower(block_range) pushed
    * into Postgres (half-open interval, deterministic order).
    */
  def scanRangeSql(schema: String, table: String, start: Long, end: Long): String =
    s"""SELECT *, lower(block_range) AS _block_number
       |FROM ${q(schema)}.${q(table)}
       |WHERE lower(block_range) >= $start AND lower(block_range) < $end
       |ORDER BY lower(block_range)""".stripMargin
}
