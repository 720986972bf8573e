package graft.queries

import org.apache.spark.sql.functions._
import Dsl._

/** Scalar-function surface (SURVEY.md §2.7 F3-F7): date/time parts and
  * arithmetic, string functions, math, and conditional expressions — each
  * exercised through an aggregation so the oracle checks both the scalar
  * semantics and the grouping.
  *
  * Determinism notes: date parts and string/int functions are exact; double
  * work is either row-wise IEEE (identical in any engine) or aggregated via
  * order-independent forms (MIN/MAX, integer-exact sums, decimal casts of
  * raw 2-decimal columns). `weekday()+1` is used instead of `dayofweek` to
  * match ISO numbering across engines. No `round()` anywhere — engines
  * disagree on tie-breaking.
  */
object ScalarQueries {

  val queries: Seq[DeclaredQuery] = Seq(

    // ---- F6 date parts + date arithmetic over a join ---------------------
    DeclaredQuery("scalar_dates",
      (s, dir) => {
        tbl(s, dir, "orders")
          .join(tbl(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
          .groupBy(
            year(col("o_orderdate")).cast("long").as("y"),
            month(col("o_orderdate")).cast("long").as("m"))
          .agg(
            count(lit(1)).as("n"),
            sum(datediff(col("l_shipdate"), col("o_orderdate")).cast("long")).as("ship_delay_days"),
            countDistinct(col("o_custkey")).as("n_cust"),
            max((weekday(col("o_orderdate")) + 1).cast("long")).as("max_isodow"))
          .orderBy(col("y"), col("m"))
      },
      Some("""SELECT CAST(year(o_orderdate) AS BIGINT) AS y, CAST(month(o_orderdate) AS BIGINT) AS m,
        COUNT(*) AS n,
        CAST(SUM(date_diff('day', o_orderdate, l_shipdate)) AS BIGINT) AS ship_delay_days,
        COUNT(DISTINCT o_custkey) AS n_cust,
        CAST(MAX(isodow(o_orderdate)) AS BIGINT) AS max_isodow
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- F3/F4 string functions ------------------------------------------
    DeclaredQuery("scalar_strings",
      (s, dir) => {
        tbl(s, dir, "part")
          .groupBy(upper(substring(col("p_type"), 1, 4)).as("pre"))
          .agg(
            count(lit(1)).as("n"),
            sum(length(col("p_name")).cast("long")).as("chars"),
            sum(when(instr(col("p_name"), "1") > 0, 1L).otherwise(0L)).as("with_one"),
            min(concat(col("p_brand"), lit("#"), col("p_type"))).as("min_cat"))
          .orderBy(col("pre"))
      },
      Some("""SELECT upper(substring(p_type, 1, 4)) AS pre, COUNT(*) AS n,
        CAST(SUM(length(p_name)) AS BIGINT) AS chars,
        CAST(SUM(CASE WHEN instr(p_name, '1') > 0 THEN 1 ELSE 0 END) AS BIGINT) AS with_one,
        MIN(p_brand || '#' || p_type) AS min_cat
        FROM part GROUP BY 1 ORDER BY 1""")),

    // ---- F7 math ----------------------------------------------------------
    DeclaredQuery("scalar_math",
      (s, dir) => {
        tbl(s, dir, "lineitem")
          .groupBy(
            floor(col("l_extendedprice") / 10000.0).cast("long").as("bucket"),
            (col("l_linenumber") % 3).cast("long").as("lmod"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("l_quantity") * col("l_quantity")).as("qty_sq"),
            max(abs(col("l_discount") - 0.05)).as("max_disc_dev"),
            min(sqrt(col("l_quantity"))).as("min_sqrt_qty"))
          .orderBy(col("bucket"), col("lmod"))
      },
      Some("""SELECT CAST(floor(l_extendedprice / 10000.0) AS BIGINT) AS bucket,
        CAST(l_linenumber % 3 AS BIGINT) AS lmod, COUNT(*) AS n,
        SUM(l_quantity * l_quantity) AS qty_sq,
        MAX(abs(l_discount - 0.05)) AS max_disc_dev,
        MIN(sqrt(l_quantity)) AS min_sqrt_qty
        FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- distribution window functions (percent_rank / cume_dist) ---------
    // Both reduce to exact integer ratios divided in double — portable.
    DeclaredQuery("window_dist_customers",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("c_mktsegment"))
          .orderBy(col("c_acctbal"), col("c_custkey"))
        tbl(s, dir, "customer")
          .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
            percent_rank().over(w).as("pr"),
            cume_dist().over(w).as("cd"))
          .orderBy(col("c_mktsegment"), col("c_custkey"))
      },
      Some("""SELECT c_mktsegment, c_custkey, c_acctbal,
        PERCENT_RANK() OVER w AS pr, CUME_DIST() OVER w AS cd
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        ORDER BY c_mktsegment, c_custkey""")),

    // ---- regex extraction --------------------------------------------------
    DeclaredQuery("regexp_extract_parts",
      (s, dir) => {
        tbl(s, dir, "part")
          .select(regexp_extract(col("p_name"), "(\\d+)", 1).as("num"))
          .groupBy(length(col("num")).cast("long").as("num_len"))
          .agg(count(lit(1)).as("n"), min(col("num")).as("min_num"))
          .orderBy(col("num_len"))
      },
      Some("""SELECT length(num) AS num_len, COUNT(*) AS n, MIN(num) AS min_num
        FROM (SELECT COALESCE(regexp_extract(p_name, '(\d+)', 1), '') AS num FROM part) t
        GROUP BY 1 ORDER BY 1""")),

    // ---- boolean aggregates (count_if / bool_and / bool_or) ---------------
    DeclaredQuery("bool_aggs_orders",
      (s, dir) => {
        tbl(s, dir, "orders")
          .groupBy(col("o_orderpriority"))
          .agg(
            count_if(col("o_totalprice") > 200000.0).as("n_big"),
            bool_or(col("o_totalprice") > 450000.0).as("any_huge"),
            bool_and(col("o_totalprice") > 2000.0).as("all_nontrivial"),
            count(lit(1)).as("n"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority,
        COUNT(*) FILTER (WHERE o_totalprice > 200000.0) AS n_big,
        bool_or(o_totalprice > 450000.0) AS any_huge,
        bool_and(o_totalprice > 2000.0) AS all_nontrivial,
        COUNT(*) AS n
        FROM orders GROUP BY 1 ORDER BY 1""")),

    // ---- conditional expressions (CASE / COALESCE / NULLIF / GREATEST) ----
    DeclaredQuery("scalar_conditional",
      (s, dir) => {
        tbl(s, dir, "customer")
          .select(
            when(col("c_acctbal") < 0, "neg")
              .when(col("c_acctbal") < 5000, "low")
              .otherwise("high").as("tier"),
            coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")).as("seg2"),
            col("c_acctbal"))
          .groupBy(col("tier"), col("seg2"))
          .agg(
            count(lit(1)).as("n"),
            dsum(dec2(greatest(col("c_acctbal"), lit(0.0)))).as("pos_bal"))
          .orderBy(col("tier"), col("seg2"))
      },
      Some("""SELECT CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS tier,
        COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg2,
        COUNT(*) AS n,
        CAST(SUM(CAST(greatest(c_acctbal, 0.0) AS DECIMAL(12,2))) AS DOUBLE) AS pos_bal
        FROM customer GROUP BY 1, 2 ORDER BY 1, 2""")))
}
