package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Sessions
import graft.extract.{EntitySource, ParquetEntitySource}
import graft.model.{ColumnMapping, ExtractConfig, TableConfig, TargetType}
import graft.sinks.Fs

/** Config generator (K6, reference `subgraph_config_generator`,
  * cli.py:383-487) as a non-interactive CLI: discovers a subgraph's
  * extractable tables and emits a ready-to-edit JSON config with the
  * reference's default partition tiers and the default uint64
  * clamp-with-validity mapping for every numeric column.
  *
  * Usage: runMain graft.tools.ConfigGen <sourceRoot> <subgraphName> <outPath>
  */
object ConfigGen {

  /** ≈ 1 month / 1 week / 1 day / 1.5 h of gnosis blocks
    * (cli.py:450-456).
    */
  val DefaultTiers: Seq[Long] = Seq(524288L, 131072L, 16384L, 1024L)

  val Uint64Max: BigInt = BigInt("18446744073709551615")

  def generate(spark: SparkSession, source: EntitySource,
      subgraphName: String): ExtractConfig = {
    val cat = source.catalog(spark).getOrElse(subgraphName,
      throw new IllegalArgumentException(s"unknown subgraph: $subgraphName"))
    val tables = source.tableNames(spark, cat.schemaName).map { t =>
      val numericCols = source.columnTypes(spark, cat.schemaName, t)
        .collect { case (c, "numeric") => c }.toSeq.sorted
      // default mapping mirrors the generator's uint64 clamp
      // (cli.py:477-484): value <= uint64max ? value : 0, plus validity
      val mappings = numericCols.map { c =>
        c -> Seq(ColumnMapping(s"${c}_uint64", TargetType.UInt64,
          maxValue = Some(Uint64Max), default = Some(BigInt(0)),
          validityColumn = Some(s"${c}_uint64_valid")))
      }.toMap
      t -> TableConfig(DefaultTiers, mappings)
    }.toMap
    ExtractConfig(
      name = subgraphName,
      version = "0.0.1",
      subgraph = subgraphName,
      tables = tables)
  }

  def main(args: Array[String]): Unit = {
    val Array(sourceRoot, subgraphName, outPath) = args
    val spark = Sessions.local("graft-configgen")
    try {
      val cfg = generate(spark, new ParquetEntitySource(sourceRoot), subgraphName)
      Fs.writeString(outPath, ExtractConfig.toJson(cfg),
        spark.sparkContext.hadoopConfiguration)
      println(s"wrote $outPath")
    } finally spark.stop()
  }
}
