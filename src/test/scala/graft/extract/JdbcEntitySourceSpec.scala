package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** The JDBC variant can't run offline; its pushdown SQL — the part that
  * carries the reference's semantics — is pinned here.
  */
class JdbcEntitySourceSpec extends AnyFunSuite {

  test("scan-range SQL pushes lower(block_range) and the half-open window") {
    val sql = JdbcEntitySource.scanRangeSql("sgd1", "prepaid_card_ask_sample",
      18000000L, 18888000L)
    assert(sql.contains("lower(block_range) AS _block_number"))
    assert(sql.contains("lower(block_range) >= 18000000"))
    assert(sql.contains("lower(block_range) < 18888000"))
    assert(sql.contains("ORDER BY lower(block_range)"))
    assert(sql.contains("\"sgd1\".\"prepaid_card_ask_sample\""))
  }

  test("identifiers are validated against injection") {
    assertThrows[IllegalArgumentException] {
      JdbcEntitySource.scanRangeSql("sgd1", "x\"; DROP TABLE y", 0, 1)
    }
  }

  test("catalog SQL carries the reference's joins and filters") {
    val sql = JdbcEntitySource.catalogSql
    assert(sql.contains("LEFT JOIN subgraphs.subgraph_version"))
    assert(sql.contains("LEFT JOIN subgraphs.subgraph "))
    assert(sql.contains("LEFT JOIN subgraphs.subgraph_deployment"))
    assert(sql.contains("ds.active AND s.current_version IS NOT NULL"))
    assert(sql.contains("::bigint"))
  }

  test("table listing filters on block_range presence") {
    val sql = JdbcEntitySource.tableNamesSql("sgd1")
    assert(sql.contains("column_name = 'block_range'"))
    assert(sql.contains("table_schema = 'sgd1'"))
    assert(sql.contains("ORDER BY table_name"))
  }

  test("scan striping options: N connections over [start, end)") {
    assert(JdbcEntitySource.scanPartitionOptions(0L, 1024L, 1) === Map.empty)
    assert(JdbcEntitySource.scanPartitionOptions(0L, 4L, 8) === Map.empty)
    assert(JdbcEntitySource.scanPartitionOptions(1000L, 9000L, 8) === Map(
      "partitionColumn" -> "_block_number",
      "lowerBound" -> "1000",
      "upperBound" -> "9000",
      "numPartitions" -> "8"))
  }
}
