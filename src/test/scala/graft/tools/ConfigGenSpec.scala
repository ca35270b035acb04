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

  test("interactive flow: pick subgraph, select tables, preview, emit config") {
    val src = Files.createTempDirectory("graft-cfggen").toString
    GraphNodeFixture.write(spark, src, 19000000L,
      extraTables = Seq("zz_other_table"))
    // answers: subgraph 0; table index 0 only; preview yes
    val answers = new java.io.BufferedReader(
      new java.io.StringReader("0\n0\ny\n"))
    val bytes = new java.io.ByteArrayOutputStream()
    val out = new java.io.PrintStream(bytes, true, "UTF-8")
    val cfg = ConfigGen.interactive(spark, new ParquetEntitySource(src),
      answers, out)
    val printed = bytes.toString("UTF-8")
    assert(printed.contains(GraphNodeFixture.Subgraph)) // menu listed it
    assert(printed.contains("zz_other_table"))          // both tables offered
    assert(printed.contains("first 10 rows"))           // preview ran (S5)
    // only the selected table lands in the config
    assert(cfg.subgraph === GraphNodeFixture.Subgraph)
    assert(cfg.tables.keySet === Set(GraphNodeFixture.Table))
    assert(cfg.tables(GraphNodeFixture.Table).partitionSizes === ConfigGen.DefaultTiers)
  }

  test("interactive flow: 'all' keeps every table") {
    val src = Files.createTempDirectory("graft-cfggen").toString
    GraphNodeFixture.write(spark, src, 19000000L,
      extraTables = Seq("zz_other_table"))
    val answers = new java.io.BufferedReader(
      new java.io.StringReader("0\nall\nn\n"))
    val out = new java.io.PrintStream(new java.io.ByteArrayOutputStream())
    val cfg = ConfigGen.interactive(spark, new ParquetEntitySource(src),
      answers, out)
    assert(cfg.tables.keySet === Set(GraphNodeFixture.Table, "zz_other_table"))
  }
}
