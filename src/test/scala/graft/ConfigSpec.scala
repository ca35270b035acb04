package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model._
import graft.plans.Watermark

class ConfigSpec extends AnyFunSuite {

  private val cfg = ExtractConfig(
    name = "my_extract_name",
    version = "0.0.1",
    subgraph = "my_test_subgraph",
    tables = Map(
      "prepaid_card_ask_sample" -> TableConfig(
        partitionSizes = Seq(524288L, 32768L, 1024L),
        columnMappings = Map(
          "ask_price" -> Seq(
            ColumnMapping(
              name = "ask_price_uint64",
              toType = TargetType.UInt64,
              maxValue = Some(BigInt("18446744073709551615")),
              default = Some(BigInt(0)),
              validityColumn = Some("ask_price_uint64_valid")),
            ColumnMapping(
              name = "ask_price_gwei",
              toType = TargetType.UInt64,
              downscale = Some(BigInt(1000000000L)))
          )))))

  test("config JSON round-trips") {
    val json = ExtractConfig.toJson(cfg)
    assert(ExtractConfig.fromJson(json) == cfg)
  }

  test("non-dividing partition tiers are rejected at parse time") {
    // [10, 3]: 3 does not divide 10 — must fail on load, naming the
    // table, not mid-extract
    val bad = cfg.copy(tables = cfg.tables.map { case (t, tc) =>
      t -> tc.copy(partitionSizes = Seq(10L, 3L))
    })
    val e = intercept[IllegalArgumentException] {
      ExtractConfig.fromJson(ExtractConfig.toJson(bad))
    }
    assert(e.getMessage.contains("partition_sizes"))
    assert(e.getMessage.contains("divide"))
  }

  test("immutability check passes on identical config, fails on drift") {
    val json = ExtractConfig.toJson(cfg)
    ExtractConfig.requireUnchanged(json, cfg) // no throw
    val drift = cfg.copy(tables = cfg.tables.map { case (k, v) =>
      k -> v.copy(partitionSizes = Seq(1024L))
    })
    intercept[IllegalStateException] {
      ExtractConfig.requireUnchanged(json, drift)
    }
  }

  test("uint256-scale max_value survives serde losslessly") {
    val big = BigInt(2).pow(256) - 1
    val c = cfg.copy(tables = Map("t" -> TableConfig(Seq(1L), Map(
      "c" -> Seq(ColumnMapping("c2", TargetType.Bytes, maxValue = Some(big)))))))
    assert(ExtractConfig.fromJson(ExtractConfig.toJson(c)) == c)
  }

  test("target type parsing covers the documented set") {
    assert(TargetType.parse("uint32") == TargetType.UInt32)
    assert(TargetType.parse("Numeric38") == TargetType.Numeric38)
    assert(TargetType.parse("boolean") == TargetType.Bool)
    intercept[IllegalArgumentException](TargetType.parse("uint9000"))
  }

  test("watermark JSON round-trips") {
    val w = Watermark("sg", "QmDEPLOY", 1700000000000L, 18000000L, 19000000L)
    assert(Watermark.fromJson(Watermark.toJson(w)) == w)
  }
}
