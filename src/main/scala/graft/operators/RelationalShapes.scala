package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables
import graft.sources.Tables.dec2

/** The remaining classic decision-support join/aggregate shapes
  * (TPC-H Q2/Q6/Q7/Q8/Q9/Q11/Q12/Q15/Q19/Q20/Q21), adapted to the
  * testdata star schema. There is no partsupp table, so the part ⇄
  * supplier relation is derived from lineitem where a query needs one
  * (Q2/Q11/Q20) — the PLAN shapes (correlated-min join-back, HAVING
  * against a scalar subquery, nested semi chains, double-correlated
  * EXISTS/NOT-EXISTS self-joins) are the point, not the exact
  * benchmark constants.
  *
  * Money discipline matches the rest of the suite (see
  * [[ParityQueries.q1Agg]]): DECIMAL(18,2)-normalized cents /
  * integer-percent discounts, products accumulated in Decimal(38,0),
  * unbounded totals emitted as digit strings, ratios as exact
  * integer-division ppm. Every query orders deterministically.
  */
object RelationalShapes {

  private def liMoney(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d).select(
      col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
      col("l_shipdate"),
      (dec2(col("l_quantity")) * 100).cast(LongType).as("qty_c"),
      (dec2(col("l_extendedprice")) * 100).cast(LongType).as("price_c"),
      (dec2(col("l_discount")) * 100).cast(LongType).as("disc_pct"))

  /** e4-scale discounted revenue as an overflow-safe decimal addend. */
  private val revE4 = expr(
    "cast(price_c * (100 - disc_pct) as decimal(38,0))")

  // ---------------------------------------------------------------- Q6

  /** TPC-H Q6 shape (forecast revenue change): the pure scan-side
    * query — three conjunctive predicates, no join, one global sum; at
    * cluster scale a map-only job with a 1-row final merge. The exact
    * predicates live on DERIVED integer-cents columns (a cast chain no
    * parquet reader accepts), so each carries a redundant HULL
    * predicate on its raw double column — `raw ∈ [0.02, 0.06] ⊇
    * round2(raw) ∈ [0.03, 0.05]`, `raw < 24.005 ⊇ round2(raw) < 24` —
    * that DOES push into the scan (with the shipdate range) and prunes
    * row groups; the exact cents filters then only re-check the
    * boundary stragglers.
    */
  def q6ForecastRevenue(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .where(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01") &&
        col("l_discount") >= 0.02 && col("l_discount") <= 0.06 &&
        col("l_quantity") < 24.005)
      .select(
        (dec2(col("l_quantity")) * 100).cast(LongType).as("qty_c"),
        (dec2(col("l_extendedprice")) * 100).cast(LongType).as("price_c"),
        (dec2(col("l_discount")) * 100).cast(LongType).as("disc_pct"))
      .where(col("disc_pct").between(3L, 5L) && col("qty_c") < 2400L)
      .agg(
        sum(expr("cast(price_c * disc_pct as decimal(38,0))"))
          .cast(DecimalType(38, 0)).cast(StringType).as("revenue_e4"),
        count(lit(1)).as("n_lines"))

  val q6ForecastRevenueSql: String =
    """SELECT CAST(CAST(sum(CAST(
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |    * CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)
      |  AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS VARCHAR) AS revenue_e4,
      |  count(*) AS n_lines
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) BETWEEN 3 AND 5
      |  AND CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) < 2400""".stripMargin

  // ---------------------------------------------------------------- Q7

  /** TPC-H Q7 shape (volume shipping): the two-alias dimension join —
    * nation joins BOTH sides of the fact (supplier's and customer's),
    * with a disjunctive cross-nation predicate that only becomes
    * evaluable after both aliases attach. Both nation copies broadcast;
    * the only shuffle is lineitem ⋈ orders on the order key, then a
    * tiny (nation, nation, year) aggregate.
    */
  def q7VolumeShipping(spark: SparkSession, d: String): DataFrame = {
    val li = liMoney(spark, d)
      .where(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).cast(LongType).as("l_year"), revE4.as("rev_e4"))
    val suppNation = Tables.supplier(spark, d).select("s_suppkey", "s_nationkey")
      .join(broadcast(Tables.nation(spark, d)
        .select(col("n_nationkey"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "supp_nation")
    val custNation = Tables.customer(spark, d).select("c_custkey", "c_nationkey")
      .join(broadcast(Tables.nation(spark, d)
        .select(col("n_nationkey"), col("n_name").as("cust_nation"))),
        col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey", "cust_nation")
    li.join(Tables.orders(spark, d).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(custNation), col("o_custkey") === col("c_custkey"))
      .where((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy("supp_nation", "cust_nation", "l_year")
      .agg(sum(col("rev_e4")).cast(DecimalType(38, 0)).cast(StringType)
          .as("revenue_e4"),
        count(lit(1)).as("n_lines"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val q7VolumeShippingSql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
      |  CAST(CAST(sum(CAST(
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |    * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))
      |  AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS VARCHAR) AS revenue_e4,
      |  count(*) AS n_lines
      |FROM lineitem
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN customer ON c_custkey = o_custkey
      |JOIN nation n1 ON n1.n_nationkey = s_nationkey
      |JOIN nation n2 ON n2.n_nationkey = c_nationkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  // ---------------------------------------------------------------- Q8

  /** TPC-H Q8 shape (national market share): a conditional-aggregate
    * ratio per group — the share of one supplier nation's revenue
    * within a region's market for one part type, per year. The region
    * restriction applies to the CUSTOMER side; the measured nation is
    * on the SUPPLIER side. Share is exact integer ppm (Decimal(38,0)
    * cross-division), never a float.
    */
  def q8MarketShare(spark: SparkSession, d: String): DataFrame = {
    val asiaCust = Tables.customer(spark, d).select("c_custkey", "c_nationkey")
      .join(broadcast(Tables.nation(spark, d).select("n_nationkey", "n_regionkey")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, d).where(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select("c_custkey")
    val econParts = Tables.part(spark, d)
      .where(col("p_type") === "ECONOMY").select("p_partkey")
    val suppNation = Tables.supplier(spark, d).select("s_suppkey", "s_nationkey")
      .join(broadcast(Tables.nation(spark, d)
        .select(col("n_nationkey"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "supp_nation")
    liMoney(spark, d)
      .where(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .join(broadcast(econParts), col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(spark, d).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(asiaCust), col("o_custkey") === col("c_custkey"), "left_semi")
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("l_shipdate")).cast(LongType).as("l_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_5", revE4)
          .otherwise(lit(0).cast(DecimalType(38, 0)))).as("nat"),
        sum(revE4).as("tot"))
      .select(col("l_year"),
        expr("cast(nat * 1000000 div tot as bigint)").as("mkt_share_ppm"),
        col("nat").cast(DecimalType(38, 0)).cast(StringType).as("nation_rev_e4"),
        col("tot").cast(DecimalType(38, 0)).cast(StringType).as("total_rev_e4"))
      .orderBy("l_year")
  }

  val q8MarketShareSql: String =
    """WITH t AS (
      |  SELECT CAST(year(l_shipdate) AS BIGINT) AS l_year, n1.n_name AS supp_nation,
      |    CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS DECIMAL(38,0)) AS rev_e4
      |  FROM lineitem
      |  JOIN part ON p_partkey = l_partkey AND p_type = 'ECONOMY'
      |  JOIN orders ON o_orderkey = l_orderkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN nation n1 ON n1.n_nationkey = s_nationkey
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1998-01-01'
      |    AND o_custkey IN (
      |      SELECT c_custkey FROM customer
      |      JOIN nation n2 ON n2.n_nationkey = c_nationkey
      |      JOIN region ON r_regionkey = n2.n_regionkey
      |      WHERE r_name = 'ASIA')),
      |s AS (
      |  SELECT l_year,
      |    CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN rev_e4 ELSE 0 END)
      |      AS DECIMAL(38,0)) AS nat,
      |    CAST(sum(rev_e4) AS DECIMAL(38,0)) AS tot
      |  FROM t GROUP BY l_year)
      |SELECT l_year,
      |  CAST(CAST(nat AS HUGEINT) * 1000000 // CAST(tot AS HUGEINT) AS BIGINT) AS mkt_share_ppm,
      |  CAST(nat AS VARCHAR) AS nation_rev_e4,
      |  CAST(tot AS VARCHAR) AS total_rev_e4
      |FROM s ORDER BY l_year""".stripMargin

  // ---------------------------------------------------------------- Q9

  /** TPC-H Q9 shape (product-type profit): profit per supplier nation
    * per year over a substring-filtered part family. Without partsupp,
    * unit cost is the part's retail price — profit_e6 =
    * price·(1−disc)·1e6 − retail·qty·1e6, all integer. Nation sums can
    * go NEGATIVE (cost exceeds discounted revenue), which exercises
    * signed Decimal→string emission.
    */
  def q9ProfitByNation(spark: SparkSession, d: String): DataFrame = {
    val gearParts = Tables.part(spark, d)
      .where(col("p_name").contains("gear"))
      .select(col("p_partkey"),
        (dec2(col("p_retailprice")) * 100).cast(LongType).as("retail_c"))
    val suppNation = Tables.supplier(spark, d).select("s_suppkey", "s_nationkey")
      .join(broadcast(Tables.nation(spark, d)
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "n_name")
    liMoney(spark, d)
      .join(broadcast(gearParts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("n_name"), year(col("l_shipdate")).cast(LongType).as("l_year"))
      .agg(sum(expr(
        """cast(price_c * (100 - disc_pct) as decimal(38,0)) * 100
          | - cast(retail_c as decimal(38,0)) * qty_c * 100""".stripMargin
          .replace("\n", "")))
        .cast(DecimalType(38, 0)).cast(StringType).as("profit_e6"))
      .orderBy(col("n_name"), col("l_year").desc)
  }

  val q9ProfitByNationSql: String =
    """SELECT n_name, CAST(year(l_shipdate) AS BIGINT) AS l_year,
      |  CAST(CAST(sum(
      |    CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS DECIMAL(38,0)) * 100
      |    - CAST(CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS DECIMAL(38,0))
      |      * CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) * 100
      |  ) AS DECIMAL(38,0)) AS VARCHAR) AS profit_e6
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey AND p_name LIKE '%gear%'
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation ON n_nationkey = s_nationkey
      |GROUP BY n_name, l_year
      |ORDER BY n_name, l_year DESC""".stripMargin

  // --------------------------------------------------------------- Q11

  /** TPC-H Q11 shape (important stock): per-part value restricted to
    * one region's suppliers, HAVING value above a threshold derived
    * from the grand total — the scalar-subquery-in-HAVING
    * decorrelation. The original's `> fraction · sum(all)` is
    * scale-DEPENDENT (TPC-H shrinks the fraction with SF); here the
    * threshold is 2× the mean per-part value, which keeps selectivity
    * stable at any corpus size. The per-part aggregate computes once;
    * the (total, count) scalar re-aggregates its partials (a second
    * tiny shuffle over |parts| rows, not a second fact scan) and
    * broadcasts as a 1-row frame; the HAVING is the exact
    * cross-multiplication `value·n_parts > total·2`.
    */
  def q11ImportantValue(spark: SparkSession, d: String): DataFrame = {
    val europeSupps = Tables.supplier(spark, d).select("s_suppkey", "s_nationkey")
      .join(broadcast(Tables.nation(spark, d).select("n_nationkey", "n_regionkey")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, d).where(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey")
    // both the HAVING scalar and the result read this |parts|-sized
    // aggregate; without the persist the FACT scans twice (measured:
    // AQE exchange reuse does not dedupe the two aggregate subtrees),
    // and an unforced persist consumed by two branches of one action
    // still computes twice (round-9 gotcha) — hence the count()
    val perPart = liMoney(spark, d)
      .join(broadcast(europeSupps), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy("l_partkey")
      .agg(sum(revE4).cast(DecimalType(38, 0)).as("value_e4"))
      .persist()
    perPart.count()
    val total = perPart.agg(
      sum("value_e4").cast(DecimalType(38, 0)).as("total_e4"),
      count(lit(1)).as("n_parts"))
    perPart.crossJoin(broadcast(total))
      .where(col("value_e4") * col("n_parts") > col("total_e4") * 2)
      .orderBy(col("value_e4").desc, col("l_partkey"))
      .select(col("l_partkey"),
        col("value_e4").cast(StringType).as("value_e4"))
  }

  val q11ImportantValueSql: String =
    """WITH pp AS (
      |  SELECT l_partkey, CAST(sum(CAST(
      |      CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))
      |    AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS value_e4
      |  FROM lineitem
      |  WHERE l_suppkey IN (
      |    SELECT s_suppkey FROM supplier
      |    JOIN nation ON n_nationkey = s_nationkey
      |    JOIN region ON r_regionkey = n_regionkey
      |    WHERE r_name = 'EUROPE')
      |  GROUP BY l_partkey),
      |tot AS (SELECT CAST(sum(value_e4) AS DECIMAL(38,0)) AS total_e4,
      |    count(*) AS n_parts FROM pp)
      |SELECT l_partkey, CAST(value_e4 AS VARCHAR) AS value_e4
      |FROM pp, tot
      |WHERE CAST(value_e4 AS HUGEINT) * n_parts > CAST(total_e4 AS HUGEINT) * 2
      |ORDER BY pp.value_e4 DESC, l_partkey""".stripMargin

  // --------------------------------------------------------------- Q12

  /** TPC-H Q12 shape (shipping-priority audit): per-category counts of
    * high- vs low-priority orders among late shipments — the
    * conditional-count pivot over a date-interval predicate
    * (`l_shipdate > o_orderdate + 60 days`, evaluable only after the
    * fact ⋈ orders join attaches the order date).
    */
  def q12LateLines(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .select("l_orderkey", "l_returnflag", "l_shipdate")
      .where(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01"))
      .join(Tables.orders(spark, d)
        .select("o_orderkey", "o_orderdate", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .where(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy("l_returnflag")
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy("l_returnflag")

  val q12LateLinesSql: String =
    """SELECT l_returnflag,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |      THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // --------------------------------------------------------------- Q15

  /** TPC-H Q15 shape (top supplier): the argmax-by-join — quarterly
    * revenue per supplier, then the supplier(s) achieving the maximum,
    * found by joining the aggregate against its own 1-row max (ties
    * all surface, deterministically). The per-supplier frame is tiny
    * (|suppliers|), so the max and the equality join both broadcast.
    */
  def q15TopSupplier(spark: SparkSession, d: String): DataFrame = {
    // the max scalar and the equality join-back both read this
    // |suppliers|-sized aggregate — persist + force, or the fact
    // scans twice (same reuse gotcha as q11)
    val rev = liMoney(spark, d)
      .where(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1996-04-01"))
      .groupBy("l_suppkey")
      .agg(sum(revE4).cast(DecimalType(38, 0)).as("total_revenue_e4"))
      .persist()
    rev.count()
    val maxRev = rev.agg(max("total_revenue_e4").as("max_rev"))
    rev.crossJoin(broadcast(maxRev))
      .where(col("total_revenue_e4") === col("max_rev"))
      .join(broadcast(Tables.supplier(spark, d).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_revenue_e4").cast(StringType).as("total_revenue_e4"))
      .orderBy("s_suppkey")
  }

  val q15TopSupplierSql: String =
    """WITH rev AS (
      |  SELECT l_suppkey, CAST(sum(CAST(
      |      CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))
      |    AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS total_revenue_e4
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name,
      |  CAST(total_revenue_e4 AS VARCHAR) AS total_revenue_e4
      |FROM rev JOIN supplier ON s_suppkey = l_suppkey
      |WHERE total_revenue_e4 = (SELECT max(total_revenue_e4) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  // --------------------------------------------------------------- Q19

  /** TPC-H Q19 shape (discounted revenue): the disjunction of
    * conjunctive brand/size/quantity envelopes — a predicate that
    * spans BOTH join sides (part attributes AND lineitem quantity), so
    * it can only filter after the broadcast join, while the per-side
    * prefilters (the brand/size union on part, the quantity hull on
    * lineitem — widened to raw-double bounds so it reaches the parquet
    * reader, see [[q6ForecastRevenue]]) still push into each scan.
    */
  def q19DisjunctivePred(spark: SparkSession, d: String): DataFrame = {
    val parts = Tables.part(spark, d)
      .where(col("p_brand").isin("Brand#12", "Brand#23", "Brand#34") &&
        col("p_size").between(1, 15))
      .select("p_partkey", "p_brand", "p_size")
    Tables.lineitem(spark, d)
      .where(col("l_quantity") >= 0.995 && col("l_quantity") <= 30.005)
      .select(col("l_partkey"),
        (dec2(col("l_quantity")) * 100).cast(LongType).as("qty_c"),
        (dec2(col("l_extendedprice")) * 100).cast(LongType).as("price_c"),
        (dec2(col("l_discount")) * 100).cast(LongType).as("disc_pct"))
      .where(col("qty_c") >= 100L && col("qty_c") <= 3000L)
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .where(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("qty_c").between(100L, 1100L)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          col("qty_c").between(1000L, 2000L)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
          col("qty_c").between(2000L, 3000L)))
      .agg(
        sum(revE4).cast(DecimalType(38, 0)).cast(StringType).as("revenue_e4"),
        count(lit(1)).as("n_lines"))
  }

  val q19DisjunctivePredSql: String =
    """WITH li AS (SELECT l_partkey,
      |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qty_c,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_c,
      |    CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS disc_pct
      |  FROM lineitem)
      |SELECT CAST(CAST(sum(CAST(price_c * (100 - disc_pct) AS DECIMAL(38,0)))
      |    AS DECIMAL(38,0)) AS VARCHAR) AS revenue_e4,
      |  count(*) AS n_lines
      |FROM li JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
      |    AND qty_c BETWEEN 100 AND 1100)
      |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
      |    AND qty_c BETWEEN 1000 AND 2000)
      |  OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
      |    AND qty_c BETWEEN 2000 AND 3000)""".stripMargin

  // --------------------------------------------------------------- Q20

  /** TPC-H Q20 shape (part promotion): the nested-semi chain. Inner:
    * per-(part, supplier) shipped quantity of a name-filtered part
    * family in one year; a supplier is "concentrated" on a part when
    * it shipped more than HALF of that part's total (the
    * `availqty > ½·sum` analogue, exact via `qty·2 > total`). Outer:
    * suppliers LEFT-SEMI-reduced to the concentrated set. The part
    * total re-aggregates the (part, supplier) partials, so the fact
    * scans once.
    */
  def q20PartConcentration(spark: SparkSession, d: String): DataFrame = {
    val redParts = Tables.part(spark, d)
      .where(col("p_name").startsWith("red")).select("p_partkey")
    val pairs = liMoney(spark, d)
      .where(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01"))
      .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum("qty_c").as("pair_qty_c"))
      .persist()
    // force: the totals re-aggregate and the concentration join both
    // read pairs; unforced, the fact would scan twice (q11 gotcha)
    pairs.count()
    val totals = pairs.groupBy("l_partkey")
      .agg(sum("pair_qty_c").as("part_qty_c"))
    val concentrated = pairs
      .join(totals, Seq("l_partkey"))
      .where(col("pair_qty_c") * 2 > col("part_qty_c"))
      .select("l_suppkey")
    Tables.supplier(spark, d).select("s_suppkey", "s_name")
      .join(concentrated, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .orderBy("s_suppkey")
  }

  val q20PartConcentrationSql: String =
    """WITH li AS (
      |  SELECT l_partkey, l_suppkey,
      |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qty_c
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1997-01-01'),
      |pairs AS (
      |  SELECT l_partkey, l_suppkey, CAST(sum(qty_c) AS BIGINT) AS pair_qty_c
      |  FROM li JOIN part ON p_partkey = l_partkey AND p_name LIKE 'red%'
      |  GROUP BY l_partkey, l_suppkey),
      |tot AS (
      |  SELECT l_partkey, CAST(sum(pair_qty_c) AS BIGINT) AS part_qty_c
      |  FROM pairs GROUP BY l_partkey)
      |SELECT s_suppkey, s_name FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey FROM pairs JOIN tot USING (l_partkey)
      |  WHERE pair_qty_c * 2 > part_qty_c)
      |ORDER BY s_suppkey""".stripMargin

  // --------------------------------------------------------------- Q21

  /** TPC-H Q21 shape (suppliers who kept orders waiting): late lines of
    * finished orders where ANOTHER supplier shares the order (EXISTS)
    * but no OTHER supplier was late (NOT EXISTS). "Late" = shipped >540
    * days after the order date.
    *
    * The textbook plan — two correlated self-joins (left-semi +
    * left-anti with an `suppkey ≠` residual) — reads the fact THREE
    * times. Both correlations only ask questions about the line's own
    * ORDER, so they collapse into per-order-partition window counts
    * instead: one fact scan, one order-key shuffle (the orders join),
    * then `count(*)` / `sum(has_late)` over `partition by orderkey`
    * answer EXISTS ("another supplier in this order") and NOT EXISTS
    * ("no other late supplier") with zero further exchanges — the
    * (order, supplier) aggregate and the window both reuse the join's
    * order-key clustering. The oracle keeps the literal
    * EXISTS/NOT-EXISTS form, so equivalence is checked, not assumed.
    */
  def q21WaitingSupplier(spark: SparkSession, d: String): DataFrame = {
    val perPair = Tables.lineitem(spark, d)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(Tables.orders(spark, d)
        .where(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 540 DAYS"),
          1L).otherwise(0L).as("late"))
      .groupBy("l_orderkey", "l_suppkey")
      .agg(max("late").as("has_late"), sum("late").as("n_late_lines"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("l_orderkey")
    perPair
      .withColumn("n_supp", count(lit(1)).over(w))
      .withColumn("n_late_supp", sum("has_late").over(w))
      .where(col("has_late") === 1L && col("n_supp") > 1 &&
        col("n_late_supp") === 1L)
      .groupBy("l_suppkey").agg(sum("n_late_lines").as("numwait"))
      .join(broadcast(Tables.supplier(spark, d).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select("s_name", "numwait")
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  val q21WaitingSupplierSql: String =
    """WITH base AS (
      |  SELECT l_orderkey, l_suppkey,
      |    l_shipdate > o_orderdate + INTERVAL 540 DAY AS late
      |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      |  WHERE o_orderstatus = 'F')
      |SELECT s_name, count(*) AS numwait
      |FROM base l1 JOIN supplier ON s_suppkey = l1.l_suppkey
      |WHERE l1.late
      |  AND EXISTS (SELECT 1 FROM base l2
      |    WHERE l2.l_orderkey = l1.l_orderkey
      |      AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM base l3
      |    WHERE l3.l_orderkey = l1.l_orderkey
      |      AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
      |-- group by the KEY (like the Spark side), not the name: two
      |-- suppliers sharing a name must stay separate rows
      |GROUP BY l1.l_suppkey, s_name
      |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- Q2

  /** TPC-H Q2 shape (minimum-cost supplier): the correlated-min
    * subquery, decorrelated to aggregate + equality join-back. The
    * part ⇄ supplier "offer" relation derives from lineitem (min
    * observed sale price per pair); each part keeps the supplier(s)
    * hitting the per-part minimum — ties all surface, exactly as the
    * original's `ps_supplycost = (SELECT min …)` does. Offers for a
    * ~|parts·region-suppliers| frame are dimension-sized, so the min
    * join-back broadcasts.
    */
  def q2MincostSupplier(spark: SparkSession, d: String): DataFrame = {
    val targetParts = Tables.part(spark, d)
      .where(col("p_type") === "LARGE" && col("p_size") <= 5)
      .select("p_partkey", "p_brand")
    val europeSupps = Tables.supplier(spark, d)
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
        (dec2(col("s_acctbal")) * 100).cast(LongType).as("bal_c"))
      .join(broadcast(Tables.nation(spark, d)
        .select("n_nationkey", "n_name", "n_regionkey")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, d).where(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey", "s_name", "n_name", "bal_c")
    val offers = liMoney(spark, d)
      .join(broadcast(targetParts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(europeSupps.select("s_suppkey")),
        col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy("l_partkey", "p_brand", "l_suppkey")
      .agg(min("price_c").as("offer_c"))
      .persist()
    // force: the per-part min and the join-back both read offers;
    // unforced, the fact would scan twice (q11 gotcha)
    offers.count()
    val bestPerPart = offers.groupBy(col("l_partkey").as("bp_partkey"))
      .agg(min("offer_c").as("best_c"))
    offers
      .join(broadcast(bestPerPart),
        col("l_partkey") === col("bp_partkey") &&
          col("offer_c") === col("best_c"))
      .join(broadcast(europeSupps), col("l_suppkey") === col("s_suppkey"))
      .select(col("bal_c"), col("s_name"), col("n_name"),
        col("l_partkey"), col("p_brand"), col("offer_c"))
      .orderBy(col("bal_c").desc, col("s_name"), col("l_partkey"))
      .limit(100)
  }

  val q2MincostSupplierSql: String =
    """WITH eu AS (
      |  SELECT s_suppkey, s_name, n_name,
      |    CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_c
      |  FROM supplier
      |  JOIN nation ON n_nationkey = s_nationkey
      |  JOIN region ON r_regionkey = n_regionkey
      |  WHERE r_name = 'EUROPE'),
      |offers AS (
      |  SELECT l_partkey, p_brand, l_suppkey,
      |    CAST(min(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS offer_c
      |  FROM lineitem
      |  JOIN part ON p_partkey = l_partkey
      |    AND p_type = 'LARGE' AND p_size <= 5
      |  WHERE l_suppkey IN (SELECT s_suppkey FROM eu)
      |  GROUP BY l_partkey, p_brand, l_suppkey)
      |SELECT bal_c, s_name, n_name, l_partkey, p_brand, offer_c
      |FROM offers o JOIN eu ON s_suppkey = o.l_suppkey
      |WHERE offer_c = (SELECT min(offer_c) FROM offers i
      |                 WHERE i.l_partkey = o.l_partkey)
      |ORDER BY bal_c DESC, s_name, l_partkey LIMIT 100""".stripMargin

  // ------------------------------------------------------------- maps

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q2_mincost_supplier" -> (q2MincostSupplier _),
    "q6_forecast_revenue" -> (q6ForecastRevenue _),
    "q7_volume_shipping" -> (q7VolumeShipping _),
    "q8_market_share" -> (q8MarketShare _),
    "q9_profit_by_nation" -> (q9ProfitByNation _),
    "q11_important_value" -> (q11ImportantValue _),
    "q12_late_lines" -> (q12LateLines _),
    "q15_top_supplier" -> (q15TopSupplier _),
    "q19_disjunctive_pred" -> (q19DisjunctivePred _),
    "q20_part_concentration" -> (q20PartConcentration _),
    "q21_waiting_supplier" -> (q21WaitingSupplier _))

  val oracles: Map[String, String] = Map(
    "q2_mincost_supplier" -> q2MincostSupplierSql,
    "q6_forecast_revenue" -> q6ForecastRevenueSql,
    "q7_volume_shipping" -> q7VolumeShippingSql,
    "q8_market_share" -> q8MarketShareSql,
    "q9_profit_by_nation" -> q9ProfitByNationSql,
    "q11_important_value" -> q11ImportantValueSql,
    "q12_late_lines" -> q12LateLinesSql,
    "q15_top_supplier" -> q15TopSupplierSql,
    "q19_disjunctive_pred" -> q19DisjunctivePredSql,
    "q20_part_concentration" -> q20PartConcentrationSql,
    "q21_waiting_supplier" -> q21WaitingSupplierSql)
}
