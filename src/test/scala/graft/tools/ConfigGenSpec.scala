package graft.tools

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.extract.{GraphNodeFixture, ParquetEntitySource}
import graft.model.TargetType

class ConfigGenSpec extends AnyFunSuite with SparkTestBase {

  test("generated config covers extractable tables with default tiers and uint64 mappings") {
    val src = Files.createTempDirectory("graft-cfggen").toString
    GraphNodeFixture.write(spark, src, 19000000L)
    val cfg = ConfigGen.generate(spark, new ParquetEntitySource(src),
      GraphNodeFixture.Subgraph)
    assert(cfg.subgraph === GraphNodeFixture.Subgraph)
    assert(cfg.tables.keySet === Set(GraphNodeFixture.Table))
    val t = cfg.tables(GraphNodeFixture.Table)
    assert(t.partitionSizes === ConfigGen.DefaultTiers)
    val m = t.columnMappings("ask_price").head
    assert(m.name === "ask_price_uint64")
    assert(m.toType === TargetType.UInt64)
    assert(m.maxValue.contains(ConfigGen.Uint64Max))
    assert(m.default.contains(BigInt(0)))
    assert(m.validityColumn.contains("ask_price_uint64_valid"))
  }
}
