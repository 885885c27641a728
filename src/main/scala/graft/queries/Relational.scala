package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.types.DecimalType

import graft.{Engine, Q}
import graft.Engine.{dsum, davg, sqlDsum, sqlDavg}

/** Relational operator inventory (SURVEY.md §2.2 Q1–Q21, Q29).
  *
  * Every query is fully ordered, uses exact-decimal float aggregation
  * (see [[graft.Engine]]), and aliases columns identically to its DuckDB
  * oracle. Plans are plain DataFrame ops so Catalyst does pushdown,
  * pruning, join selection and AQE — the idiomatic 100 TB path.
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  /** Geometric mean as a typed Aggregator (SURVEY Q29 — UDAF surface).
    * exp(mean(ln(x))); partial-aggregating (map-side combine) like any
    * built-in agg, so it scales.
    *
    * Per-row logs are quantized to 15 decimal places as a scaled LONG
    * (math.rint(log*1e15) — one multiply, no boxing) and summed with
    * exact integer arithmetic, so the result is independent of
    * partition/summation order (same rule as Engine.dsum: double sums
    * reordered across tasks flip low bits, which can flip the final
    * ROUND). |log(finite double)| <= 709.8, so a scaled row is
    * <= 7.1e17; the running long spills into a BigDecimal once |sum|
    * exceeds 2e18, keeping both reduce-adds and merge-adds provably
    * inside Long range for any row count. Quantization deviates from
    * the true log by <= ~1e-15 absolute — far inside the 6 dp output
    * rounding.
    *
    * Non-positive or non-finite input (ln undefined) sets an invalid
    * counter and finish returns NaN — the graceful behavior of a plain
    * double sum (NaN propagates), without crashing the job. */
  object GeoMean extends Aggregator[Double, (java.math.BigDecimal, Long, Long, Long), Double] {
    private val Scale = 15
    private val SpillAt = 2000000000000000000L // 2e18

    private def norm(spill: java.math.BigDecimal, lo: Long): (java.math.BigDecimal, Long) =
      if (lo > SpillAt || lo < -SpillAt)
        (spill.add(java.math.BigDecimal.valueOf(lo, Scale)), 0L)
      else (spill, lo)

    def zero: (java.math.BigDecimal, Long, Long, Long) =
      (java.math.BigDecimal.ZERO, 0L, 0L, 0L)
    def reduce(b: (java.math.BigDecimal, Long, Long, Long), x: Double): (java.math.BigDecimal, Long, Long, Long) =
      if (x > 0 && !x.isInfinite)
        { val (s, lo) = norm(b._1, b._2 + math.rint(math.log(x) * 1e15).toLong)
          (s, lo, b._3 + 1, b._4) }
      else (b._1, b._2, b._3, b._4 + 1)
    def merge(a: (java.math.BigDecimal, Long, Long, Long), b: (java.math.BigDecimal, Long, Long, Long)): (java.math.BigDecimal, Long, Long, Long) =
      { val (s, lo) = norm(a._1.add(b._1), a._2 + b._2)
        (s, lo, a._3 + b._3, a._4 + b._4) }
    def finish(b: (java.math.BigDecimal, Long, Long, Long)): Double =
      if (b._4 > 0 || b._3 == 0) Double.NaN
      else math.exp(
        b._1.add(java.math.BigDecimal.valueOf(b._2, Scale)).doubleValue / b._3)
    def bufferEncoder = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.DECIMAL,
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.scalaLong)
    def outputEncoder = org.apache.spark.sql.Encoders.scalaDouble
  }

  val defs: Seq[(String, Q)] = Seq(

    "q01_scan" -> Q(
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey") {
      (s, dir) =>
        t(s, dir, "region").select("r_regionkey", "r_name")
          .orderBy("r_regionkey")
    },

    "q02_filter" -> Q(
      "SELECT l_orderkey, l_linenumber FROM lineitem " +
      "WHERE l_quantity > 45 AND l_returnflag = 'R' " +
      "ORDER BY l_orderkey, l_linenumber") {
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_quantity") > 45 && col("l_returnflag") === "R")
          .select("l_orderkey", "l_linenumber")
          .orderBy("l_orderkey", "l_linenumber")
    },

    "q03_agg" -> Q(
      "SELECT l_returnflag, l_linestatus, " +
      s"${sqlDsum("l_quantity")} AS sum_qty, " +
      s"${sqlDsum("l_extendedprice")} AS sum_price, " +
      s"${sqlDavg("l_discount")} AS avg_disc, " +
      "COUNT(*) AS cnt FROM lineitem " +
      "GROUP BY l_returnflag, l_linestatus " +
      "ORDER BY l_returnflag, l_linestatus") {
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_price"),
            davg(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("cnt"))
          .orderBy("l_returnflag", "l_linestatus")
    },

    "q04_join_broadcast" -> Q(
      "SELECT n_name, COUNT(*) AS c FROM customer " +
      "JOIN nation ON c_nationkey = n_nationkey " +
      "GROUP BY n_name ORDER BY n_name") {
      (s, dir) =>
        t(s, dir, "customer")
          .join(broadcast(t(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name").agg(count(lit(1)).as("c"))
          .orderBy("n_name")
    },

    "q05_join_multi" -> Q(
      "SELECT o_orderpriority, COUNT(DISTINCT o_orderkey) AS c FROM orders " +
      "JOIN lineitem ON l_orderkey = o_orderkey " +
      "JOIN customer ON o_custkey = c_custkey " +
      "WHERE c_mktsegment = 'BUILDING' " +
      "GROUP BY o_orderpriority ORDER BY o_orderpriority") {
      (s, dir) =>
        t(s, dir, "orders")
          .join(t(s, dir, "lineitem"),
            col("l_orderkey") === col("o_orderkey"))
          .join(t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING"),
            col("o_custkey") === col("c_custkey"))
          .groupBy("o_orderpriority")
          .agg(countDistinct(col("o_orderkey")).as("c"))
          .orderBy("o_orderpriority")
    },

    "q06_left_join" -> Q(
      "SELECT c_custkey, COUNT(o_orderkey) AS c FROM customer " +
      "LEFT JOIN orders ON o_custkey = c_custkey " +
      "GROUP BY c_custkey ORDER BY c_custkey") {
      (s, dir) =>
        t(s, dir, "customer")
          .join(t(s, dir, "orders"),
            col("o_custkey") === col("c_custkey"), "left")
          .groupBy("c_custkey").agg(count(col("o_orderkey")).as("c"))
          .orderBy("c_custkey")
    },

    "q07_semi_join" -> Q(
      "SELECT COUNT(*) AS c FROM customer " +
      "WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)") {
      (s, dir) =>
        t(s, dir, "customer")
          .join(t(s, dir, "orders"),
            col("o_custkey") === col("c_custkey"), "left_semi")
          .agg(count(lit(1)).as("c"))
    },

    "q07_anti_join" -> Q(
      "SELECT COUNT(*) AS c FROM customer " +
      "WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)") {
      (s, dir) =>
        t(s, dir, "customer")
          .join(t(s, dir, "orders"),
            col("o_custkey") === col("c_custkey"), "left_anti")
          .agg(count(lit(1)).as("c"))
    },

    "q08_range_join" -> Q(
      "SELECT p_brand, COUNT(*) AS c FROM part p JOIN lineitem l " +
      "ON l.l_partkey = p.p_partkey " +
      "AND l.l_quantity BETWEEN p.p_size AND p.p_size + 10 " +
      "GROUP BY p_brand ORDER BY p_brand") {
      (s, dir) =>
        // equi-key + range residual: Catalyst plans the equi part as the
        // join key (broadcast/SMJ) and evaluates the range as a post-filter
        // — no O(n^2) nested loop at scale.
        t(s, dir, "part")
          .join(t(s, dir, "lineitem"),
            col("l_partkey") === col("p_partkey") &&
            col("l_quantity").between(col("p_size"), col("p_size") + 10))
          .groupBy("p_brand").agg(count(lit(1)).as("c"))
          .orderBy("p_brand")
    },

    "q09_window_rank" -> Q(
      "SELECT o_custkey, o_orderkey, rn FROM (" +
      "SELECT o_custkey, o_orderkey, ROW_NUMBER() OVER (" +
      "PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn " +
      "FROM orders) WHERE rn = 1 ORDER BY o_custkey") {
      (s, dir) =>
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        t(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            row_number().over(w).as("rn"))
          .filter(col("rn") === 1)
          .orderBy("o_custkey")
    },

    "q10_window_frame" -> Q(
      "SELECT l_orderkey, l_linenumber, ROUND(SUM(l_quantity) OVER (" +
      "PARTITION BY l_orderkey ORDER BY l_linenumber " +
      "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS s " +
      "FROM lineitem WHERE l_orderkey <= 100 " +
      "ORDER BY l_orderkey, l_linenumber") {
      (s, dir) =>
        val w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
          .rowsBetween(-2, Window.currentRow)
        t(s, dir, "lineitem")
          .filter(col("l_orderkey") <= 100)
          .select(col("l_orderkey"), col("l_linenumber"),
            round(sum(col("l_quantity")).over(w), 2).as("s"))
          .orderBy("l_orderkey", "l_linenumber")
    },

    "q11_topk" -> Q(
      "SELECT o_orderkey, o_totalprice FROM orders " +
      "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10") {
      (s, dir) =>
        // orderBy+limit → TakeOrderedAndProject: per-partition top-k then
        // driver merge of k rows — no global sort at scale.
        t(s, dir, "orders").select("o_orderkey", "o_totalprice")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(10)
    },

    "q12_intersect" -> Q(
      "SELECT c_nationkey AS k FROM customer " +
      "INTERSECT SELECT s_nationkey FROM supplier ORDER BY k") {
      (s, dir) =>
        t(s, dir, "customer").select(col("c_nationkey").as("k"))
          .intersect(t(s, dir, "supplier").select(col("s_nationkey").as("k")))
          .orderBy("k")
    },

    "q12_except" -> Q(
      "SELECT o_custkey AS k FROM orders EXCEPT " +
      "SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING' " +
      "ORDER BY k") {
      (s, dir) =>
        t(s, dir, "orders").select(col("o_custkey").as("k"))
          .except(t(s, dir, "customer")
            .filter(col("c_mktsegment") === "BUILDING")
            .select(col("c_custkey").as("k")))
          .orderBy("k")
    },

    "q12_union" -> Q(
      "SELECT k, COUNT(*) AS c FROM (" +
      "SELECT c_nationkey AS k FROM customer " +
      "UNION ALL SELECT s_nationkey FROM supplier) GROUP BY k ORDER BY k") {
      (s, dir) =>
        t(s, dir, "customer").select(col("c_nationkey").as("k"))
          .unionAll(t(s, dir, "supplier").select(col("s_nationkey").as("k")))
          .groupBy("k").agg(count(lit(1)).as("c"))
          .orderBy("k")
    },

    "q13_count_distinct" -> Q(
      "SELECT COUNT(DISTINCT l_partkey) AS c FROM lineitem") {
      (s, dir) =>
        t(s, dir, "lineitem").agg(countDistinct(col("l_partkey")).as("c"))
    },

    // HLL++ sketch — deterministic within Spark but not DuckDB-matchable;
    // driver records the weaker rows-only check.
    "q13_approx_distinct" -> Q.noOracle {
      (s, dir) =>
        t(s, dir, "lineitem")
          .agg(approx_count_distinct(col("l_partkey"), 0.01).as("c"))
    },

    "q14_rollup" -> Q(
      "SELECT l_returnflag, l_linestatus, COUNT(*) AS c FROM lineitem " +
      "GROUP BY ROLLUP(l_returnflag, l_linestatus) " +
      "ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST") {
      (s, dir) =>
        t(s, dir, "lineitem")
          .rollup("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("c"))
          .orderBy(col("l_returnflag").asc_nulls_first,
            col("l_linestatus").asc_nulls_first)
    },

    "q14_cube" -> Q(
      "SELECT l_returnflag, l_linestatus, COUNT(*) AS c FROM lineitem " +
      "GROUP BY CUBE(l_returnflag, l_linestatus) " +
      "ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST") {
      (s, dir) =>
        t(s, dir, "lineitem")
          .cube("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("c"))
          .orderBy(col("l_returnflag").asc_nulls_first,
            col("l_linestatus").asc_nulls_first)
    },

    "q15_string_fns" -> Q(
      "SELECT p_partkey, UPPER(SUBSTRING(p_name, 1, 5)) AS u FROM part " +
      "WHERE p_name LIKE '%bolt%' ORDER BY p_partkey") {
      (s, dir) =>
        t(s, dir, "part")
          .filter(col("p_name").like("%bolt%"))
          .select(col("p_partkey"),
            upper(substring(col("p_name"), 1, 5)).as("u"))
          .orderBy("p_partkey")
    },

    "q16_datetime" -> Q(
      "SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS y, " +
      "CAST(MONTH(o_orderdate) AS BIGINT) AS m, COUNT(*) AS c " +
      "FROM orders GROUP BY 1, 2 ORDER BY 1, 2") {
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy(
            year(col("o_orderdate")).cast("long").as("y"),
            month(col("o_orderdate")).cast("long").as("m"))
          .agg(count(lit(1)).as("c"))
          .orderBy("y", "m")
    },

    "q17_arithmetic" -> Q(
      "SELECT l_orderkey, " +
      s"${sqlDsum("l_extendedprice*(1-l_discount)*(1+l_tax)")} AS rev " +
      "FROM lineitem GROUP BY l_orderkey " +
      "ORDER BY rev DESC, l_orderkey LIMIT 20") {
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy("l_orderkey")
          .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax"))).as("rev"))
          .orderBy(col("rev").desc, col("l_orderkey").asc)
          .limit(20)
    },

    "q18_array_fns" -> Q(
      "SELECT vec_id, CAST(LEN(embedding) AS BIGINT) AS d, " +
      "ROUND(CAST(embedding[1] AS DOUBLE), 4) AS e0 " +
      "FROM embeddings ORDER BY vec_id LIMIT 50") {
      (s, dir) =>
        t(s, dir, "embeddings")
          .select(col("vec_id"),
            size(col("embedding")).cast("long").as("d"),
            round(col("embedding").getItem(0).cast("double"), 4).as("e0"))
          .orderBy("vec_id")
          .limit(50)
    },

    "q19_json" -> Q(
      "SELECT event_id, json_extract_string(props, '$.k') AS v " +
      "FROM events ORDER BY event_id LIMIT 100") {
      (s, dir) =>
        t(s, dir, "events")
          .select(col("event_id"),
            get_json_object(col("props"), "$.k").as("v"))
          .orderBy("event_id")
          .limit(100)
    },

    // GROUPING SETS: the general form rollup/cube specialize — Spark
    // plans one Expand + one hash aggregation, not one job per set
    "q14_grouping_sets" -> Q(
      "SELECT l_returnflag, l_linestatus, COUNT(*) AS c FROM lineitem " +
      "GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus)) " +
      "ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST") {
      (s, dir) => {
        Engine.registerAll(s, dir, Seq("lineitem"))
        s.sql(
          "SELECT l_returnflag, l_linestatus, COUNT(*) AS c FROM lineitem " +
          "GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus)) " +
          "ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST")
      }
    },

    // pivot: wide one-row-per-group reshaping; the oracle spells the
    // same thing as portable conditional aggregation (engine PIVOT
    // syntaxes differ, CASE-WHEN sums are ANSI)
    "q37_pivot" -> Q(
      "SELECT source, " +
      "CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS en, " +
      "CAST(SUM(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS de, " +
      "CAST(SUM(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS fr " +
      "FROM documents GROUP BY source ORDER BY source") {
      (s, dir) =>
        t(s, dir, "documents")
          .groupBy("source").pivot("lang", Seq("en", "de", "fr"))
          .agg(count(lit(1)))
          .na.fill(0L, Seq("en", "de", "fr")) // absent cells: null -> 0
          .orderBy("source")
    },

    // correlated EXISTS: Catalyst decorrelates it into a left-semi hash
    // join — no per-row subquery execution at any scale
    "q20_exists_subquery" -> Q(
      "SELECT c_custkey, c_name FROM customer c WHERE EXISTS (" +
      "SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey " +
      "AND o.o_totalprice > 300000) ORDER BY c_custkey") {
      (s, dir) => {
        Engine.registerAll(s, dir, Seq("customer", "orders"))
        s.sql(
          "SELECT c_custkey, c_name FROM customer c WHERE EXISTS (" +
          "SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey " +
          "AND o.o_totalprice > 300000) ORDER BY c_custkey")
      }
    },

    "q20_subquery" -> Q(
      "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > (" +
      "SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)" +
      "/COUNT(*)*1.5 FROM orders) ORDER BY o_orderkey") {
      (s, dir) =>
        val o = t(s, dir, "orders")
        // scalar subquery as broadcast 1-row join — no driver collect
        val th = o.agg((sum(col("o_totalprice").cast(DecimalType(38, 6)))
          .cast("double") / count(lit(1)) * 1.5).as("th"))
        o.join(broadcast(th))
          .filter(col("o_totalprice") > col("th"))
          .select("o_orderkey", "o_totalprice")
          .orderBy("o_orderkey")
    },

    "q21_time_window" -> Q(
      "SELECT date_trunc('hour', ts) AS w, event_type, COUNT(*) AS c, " +
      s"${sqlDsum("value")} AS sv FROM events " +
      "GROUP BY 1, 2 ORDER BY 1, 2") {
      (s, dir) =>
        t(s, dir, "events")
          .groupBy(date_trunc("hour", col("ts")).as("w"), col("event_type"))
          .agg(count(lit(1)).as("c"), dsum(col("value")).as("sv"))
          .orderBy("w", "event_type")
    },

    "q09_lag_lead" -> Q(
      "SELECT o_custkey, o_orderkey, " +
      "ROUND(o_totalprice - LAG(o_totalprice) OVER " +
      "(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS d " +
      "FROM orders ORDER BY o_custkey, o_orderkey LIMIT 500") {
      (s, dir) =>
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        t(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            round(col("o_totalprice") - lag(col("o_totalprice"), 1).over(w), 2)
              .as("d"))
          .orderBy("o_custkey", "o_orderkey")
          .limit(500)
    },

    "q13_percentile" -> Q(
      "SELECT l_returnflag, " +
      "ROUND(quantile_cont(l_quantity, 0.5), 2) AS p50, " +
      "ROUND(quantile_cont(l_quantity, 0.9), 2) AS p90 " +
      "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag") {
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            round(expr("percentile(l_quantity, 0.5)"), 2).as("p50"),
            round(expr("percentile(l_quantity, 0.9)"), 2).as("p90"))
          .orderBy("l_returnflag")
    },

    "q29_udaf_geomean" -> Q(
      "SELECT l_returnflag, ROUND(EXP(SUM(LN(l_quantity))/COUNT(*)), 6) " +
      "AS gmean FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag") {
      (s, dir) =>
        val gm = udaf(GeoMean)
        t(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(round(gm(col("l_quantity")), 6).as("gmean"))
          .orderBy("l_returnflag")
    },

    // the SQL front door: the same engine driven entirely through
    // spark.sql over registered views — a multi-join pricing summary in
    // the TPC-H idiom; the DataFrame and SQL paths share Catalyst, so
    // every plan property (pushdown, broadcast, AQE) carries over
    "q34_sql_api" -> Q(
      "SELECT n_name, COUNT(*) AS orders, " +
      s"${sqlDsum("l_quantity")} AS qty " +
      "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
      "JOIN customer ON o_custkey = c_custkey " +
      "JOIN nation ON c_nationkey = n_nationkey " +
      "WHERE o_orderstatus = 'F' GROUP BY n_name ORDER BY n_name") {
      (s, dir) =>
        Engine.registerAll(s, dir,
          Seq("lineitem", "orders", "customer", "nation"))
        s.sql(
          "SELECT n_name, COUNT(*) AS orders, " +
          "CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(38,6))), 2) AS DOUBLE) AS qty " +
          "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
          "JOIN customer ON o_custkey = c_custkey " +
          "JOIN nation ON c_nationkey = n_nationkey " +
          "WHERE o_orderstatus = 'F' GROUP BY n_name ORDER BY n_name")
    }
  )
}
