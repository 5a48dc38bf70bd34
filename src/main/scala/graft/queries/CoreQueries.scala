package graft.queries

import graft.api.Df
import org.apache.spark.sql.functions._
import QueryUtil._

/** Core operator suite — one driver-verified query per SURVEY.md §2 row
  * (scans, projections, filters, elementwise, reductions, groupby, joins,
  * concat, sorts). Each entry has an ANSI-SQL DuckDB twin in `oracles`.
  *
  * All queries are phrased through the graft.api wrapper (the library
  * under test), read the driver's parquet tables, and end in a total
  * order so the oracle hash-compare is deterministic.
  */
object CoreQueries {

  val defs: Map[String, Q] = Map(
    // ---- flagship: scan → filter → project → groupby/agg (TPC-H Q1 shape,
    // reference README flagship `/root/reference/README.md:30-40`) ----
    "q01_agg" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
      li.where(li("l_shipdate") <= lit("1998-09-02"))
        .groupby("l_returnflag", "l_linestatus")
        .agg(
          decSum(col("l_quantity")).as("sum_qty"),
          decSum(col("l_extendedprice")).as("sum_base_price"),
          decSum4(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          (decSum(col("l_quantity")) / count(col("l_quantity"))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .sortValues(Seq("l_returnflag", "l_linestatus")).sdf
    }),

    // ---- ReadParquet projection+filter pushdown (`io/parquet.py:162-188`) ----
    "q02_projection_filter" -> ((s, dir) => {
      val o = T(s, dir, "orders")
      o(o("o_orderstatus") === "O")
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .sortValues(Seq("o_orderkey")).sdf
    }),

    // ---- Isin + Between predicates (`_expr.py:1133,1153`) ----
    "q03_isin_between" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
      li(li("l_returnflag").isin("A", "R") && li("l_quantity").between(10, 20))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .sortValues(Seq("l_orderkey", "l_linenumber")).sdf
    }),

    // ---- Assign + Eval (`_expr.py:1309,1344`) ----
    "q04_assign_eval" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
      li.assign("revenue", li("l_extendedprice") * (-li("l_discount") + 1))
        .eval("charged", "l_extendedprice * (1 + l_tax)")
        .select("l_orderkey", "l_linenumber", "revenue", "charged")
        .sortValues(Seq("l_orderkey", "l_linenumber")).sdf
    }),

    // ---- groupby agg dict-spec (`_groupby.py:136-190`) ----
    "q05_groupby_spec" -> ((s, dir) => {
      T(s, dir, "orders").groupby("o_orderpriority")
        .agg(Map("o_totalprice" -> Seq("min", "max", "count")))
        .sortValues(Seq("o_orderpriority")).sdf
    }),

    // ---- Merge inner (`_merge.py:7-79`); dimension side broadcast ----
    "q06_merge_inner" -> ((s, dir) => {
      val o = T(s, dir, "orders")
      val c = T(s, dir, "customer").rename(Map("c_custkey" -> "o_custkey")).broadcastHint
      o.merge(c, on = Seq("o_custkey"), how = "inner")
        .select("o_orderkey", "c_name", "o_totalprice")
        .sortValues(Seq("o_orderkey")).sdf
    }),

    // ---- Concat outer (`_concat.py:9-64`) ----
    "q07_concat" -> ((s, dir) => {
      val r = T(s, dir, "region").select("r_regionkey", "r_name")
        .rename(Map("r_regionkey" -> "k", "r_name" -> "name"))
      val n = T(s, dir, "nation").select("n_nationkey", "n_name")
        .rename(Map("n_nationkey" -> "k", "n_name" -> "name"))
        .assign("extra", lit(1L))
      Df.concat(Seq(r, n), join = "outer")
        .sortValues(Seq("name", "k")).sdf
    }),

    // ---- ValueCounts (`_reductions.py:288`) ----
    "q08_value_counts" -> ((s, dir) => {
      events(s, dir).valueCounts("event_type")
        .sortValues(col("count").desc, col("event_type").asc).sdf
    }),

    // ---- NLargest top-k (`_reductions.py:268`) → TakeOrderedAndProject ----
    "q09_nlargest" -> ((s, dir) => {
      T(s, dir, "orders").nlargest(10, Seq("o_totalprice", "o_orderkey"))
        .select("o_orderkey", "o_totalprice").sdf
    }),

    // ---- DropDuplicates (`_reductions.py:52`) ----
    "q10_drop_duplicates" -> ((s, dir) => {
      T(s, dir, "lineitem").select("l_returnflag", "l_linestatus")
        .dropDuplicates()
        .sortValues(Seq("l_returnflag", "l_linestatus")).sdf
    }),

    // ---- sort_values + Head (`_expr.py:1471`; §2.9) ----
    "q11_sort_head" -> ((s, dir) => {
      T(s, dir, "orders")
        .sortValues(Seq("o_orderdate", "o_orderkey"))
        .head(20)
        .select("o_orderkey", "o_orderdate", "o_totalprice").sdf
    }),

    // ---- full-frame reductions (`_reductions.py:83-255`) ----
    "q12_reductions" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
      li.agg(
        decSum(col("l_quantity")).as("sum_qty"),
        (decSum(col("l_extendedprice")) / count(col("l_extendedprice"))).as("mean_price"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"),
        count(col("l_quantity")).as("cnt"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        round(stddev_samp(col("l_discount")), 4).as("std_disc")).sdf
    }),

    // ---- groupby single-agg sweep (`_groupby.py:193-238`) ----
    "q13_groupby_aggs" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
      li.groupby("l_returnflag").agg(
        decSum(col("l_quantity")).as("sum_qty"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        (decSum(col("l_extendedprice")) / count(col("l_extendedprice"))).as("mean_price"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        round(stddev_samp(col("l_quantity")), 4).as("std_qty"),
        count(lit(1)).as("size"))
        .sortValues(Seq("l_returnflag")).sdf
    }))

  val oracles: Map[String, String] = Map(
    "q01_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        |COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_projection_filter" ->
      """SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
        |WHERE o_orderstatus = 'O' ORDER BY o_orderkey""".stripMargin,
    "q03_isin_between" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem
        |WHERE l_returnflag IN ('A','R') AND l_quantity >= 10 AND l_quantity <= 20
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q04_assign_eval" ->
      """SELECT l_orderkey, l_linenumber,
        |l_extendedprice * (1 - l_discount) AS revenue,
        |l_extendedprice * (1 + l_tax) AS charged
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q05_groupby_spec" ->
      """SELECT o_orderpriority,
        |MIN(o_totalprice) AS o_totalprice_min,
        |MAX(o_totalprice) AS o_totalprice_max,
        |COUNT(o_totalprice) AS o_totalprice_count
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q06_merge_inner" ->
      """SELECT o_orderkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "q07_concat" ->
      """SELECT k, name, extra FROM (
        |SELECT r_regionkey AS k, r_name AS name, NULL::BIGINT AS extra FROM region
        |UNION ALL
        |SELECT n_nationkey AS k, n_name AS name, 1::BIGINT AS extra FROM nation)
        |ORDER BY name, k""".stripMargin,
    "q08_value_counts" ->
      """SELECT event_type, COUNT(*) AS count FROM events
        |GROUP BY event_type ORDER BY count DESC, event_type""".stripMargin,
    "q09_nlargest" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey DESC LIMIT 10""".stripMargin,
    "q10_drop_duplicates" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q11_sort_head" ->
      """SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
        |ORDER BY o_orderdate, o_orderkey LIMIT 20""".stripMargin,
    "q12_reductions" ->
      """SELECT
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS mean_price,
        |MIN(l_shipdate) AS min_ship,
        |MAX(l_shipdate) AS max_ship,
        |COUNT(l_quantity) AS cnt,
        |COUNT(DISTINCT l_orderkey) AS n_orders,
        |ROUND(VAR_SAMP(l_quantity), 4) AS var_qty,
        |ROUND(STDDEV_SAMP(l_discount), 4) AS std_disc
        |FROM lineitem""".stripMargin,
    "q13_groupby_aggs" ->
      """SELECT l_returnflag,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |MIN(l_quantity) AS min_qty,
        |MAX(l_quantity) AS max_qty,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS mean_price,
        |ROUND(VAR_SAMP(l_quantity), 4) AS var_qty,
        |ROUND(STDDEV_SAMP(l_quantity), 4) AS std_qty,
        |COUNT(*) AS size
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
}
