package graft.queries

import graft.api.Df
import org.apache.spark.sql.functions._
import QueryUtil._

/** Join + set-operation suite (SURVEY.md §2.7–§2.8, `_merge.py`,
  * `_concat.py`). q40–q47. Conventions as in [[CoreQueries]]. */
object JoinQueries {

  val defs: Map[String, Q] = Map(
    // ---- Merge left + fillna of unmatched (`_merge.py:7-79`) ----
    "q40_merge_left" -> ((s, dir) => {
      val p = T(s, dir, "part").select("p_partkey", "p_size")
      val liAgg = T(s, dir, "lineitem").groupby("l_partkey").size()
        .rename(Map("l_partkey" -> "p_partkey", "size" -> "n_li"))
      val m = p.merge(liAgg, on = Seq("p_partkey"), how = "left")
      m.assign("n_li", m("n_li").fillna(0L))
        .sortValues(Seq("p_partkey")).sdf
    }),

    // ---- Merge outer with coalesced keys + indicator (`_merge.py`:
    // `indicator` flag; pandas `_merge` column) ----
    "q41_merge_outer_indicator" -> ((s, dir) => {
      val a = T(s, dir, "region").rename(Map("r_regionkey" -> "k"))
        .select("k", "r_name")
      val b0 = T(s, dir, "nation")
      val b = b0.where(b0("n_nationkey") < 10)
        .rename(Map("n_nationkey" -> "k")).select("k", "n_name")
      a.merge(b, on = Seq("k"), how = "outer", indicator = true)
        .sortValues(Seq("k")).sdf
    }),

    // ---- Merge suffixes on overlapping non-key columns (`_merge.py:39`) ----
    "q42_merge_suffixes" -> ((s, dir) => {
      val o = T(s, dir, "orders")
      val a = o.select("o_orderkey", "o_totalprice")
      val bb = o.where(o("o_totalprice") > 200000.0)
      val b = bb.select("o_orderkey", "o_totalprice")
      a.merge(b, on = Seq("o_orderkey"), how = "inner", suffixes = ("_x", "_y"))
        .sortValues(Seq("o_orderkey")).sdf
    }),

    // ---- JoinRecursive-style multi-frame fold (`_merge.py:82-128`);
    // dimensions broadcast (SURVEY.md: broadcast small dims) ----
    "q44_join_multi" -> ((s, dir) => {
      val c = T(s, dir, "customer")
      val n = T(s, dir, "nation").rename(Map("n_nationkey" -> "c_nationkey")).broadcastHint
      val r = T(s, dir, "region").rename(Map("r_regionkey" -> "n_regionkey")).broadcastHint
      c.merge(n, on = Seq("c_nationkey"), how = "inner")
        .merge(r, on = Seq("n_regionkey"), how = "inner")
        .groupby("r_name")
        .agg(decSum(col("c_acctbal")).as("sum_bal"),
             count(lit(1)).as("n_cust"))
        .sortValues(Seq("r_name")).sdf
    }),

    // ---- semi / anti joins (Spark-native extension, SURVEY.md §2.7) ----
    "q45_semi_anti" -> ((s, dir) => {
      val c = T(s, dir, "customer")
      val o = T(s, dir, "orders").rename(Map("o_custkey" -> "c_custkey"))
      val withOrders = c.semiJoin(o, Seq("c_custkey")).len
        .rename(Map("len" -> "n_with_orders"))
      val withoutOrders = c.antiJoin(o, Seq("c_custkey")).len
        .rename(Map("len" -> "n_without_orders"))
      withOrders.crossJoin(withoutOrders).sdf
    }),

    // ---- cross join (small × small only; never unbucketed at scale) ----
    "q46_cross_small" -> ((s, dir) => {
      val r1 = T(s, dir, "region").select("r_regionkey").rename(Map("r_regionkey" -> "a"))
      val r2 = T(s, dir, "region").select("r_regionkey").rename(Map("r_regionkey" -> "b"))
      val x = r1.crossJoin(r2)
      x.where(x("a") < x("b")).sortValues(Seq("a", "b")).sdf
    }),

    // ---- skew-safe salted join: result must equal the plain join (the
    // salt only changes the partitioning, never the rows) ----
    "q91_salted_join" -> ((s, dir) => {
      val li = T(s, dir, "lineitem").select("l_orderkey", "l_quantity")
      val o = T(s, dir, "orders")
        .selectExpr("o_orderkey AS l_orderkey", "o_orderpriority")
      li.saltedJoin(o, on = Seq("l_orderkey"), how = "inner", salt = 8)
        .groupby("o_orderpriority")
        .agg(count(lit(1)).as("n"),
             decSum(col("l_quantity")).as("sum_qty"))
        .sortValues(Seq("o_orderpriority")).sdf
    }),

    // ---- bucketed co-located join (the 100 TB fact-table pattern):
    // both sides pre-shuffled ONCE into the same bucket layout, so the
    // join itself is exchange-free (BucketingSpec asserts the plan) ----
    "q92_bucketed_join" -> ((s, dir) => {
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_buck"
      val li = T(s, dir, "lineitem").select("l_orderkey", "l_extendedprice")
        .toBucketedTable("graft_li_b", Seq("l_orderkey"), 8, s"$tmp/li")
      val o = T(s, dir, "orders")
        .selectExpr("o_orderkey AS l_orderkey", "o_orderdate")
        .toBucketedTable("graft_o_b", Seq("l_orderkey"), 8, s"$tmp/o")
      li.merge(o, on = Seq("l_orderkey"), how = "inner")
        .groupby("l_orderkey")
        .agg(count(lit(1)).as("n"),
             decSum(col("l_extendedprice")).as("sum_price"))
        .sortValues(Seq("l_orderkey")).sdf
    }),

    // ---- bucketized range join (point-in-interval): overlapping price
    // bands × lineitem quantities. Equi-join on coarse buckets + exact
    // filter — never a nested-loop join (PlanSpec asserts) ----
    "q94_range_join" -> ((s, dir) => {
      val li = T(s, dir, "lineitem").select("l_orderkey", "l_quantity")
      val bands = T(s, dir, "region").selectExpr("r_regionkey AS band",
        "r_regionkey * 20.0 - 10.0 AS lo", "r_regionkey * 20.0 + 15.0 AS hi")
      li.rangeJoin(bands, "l_quantity", "lo", "hi", bucketWidth = 5.0)
        .groupby("band")
        .agg(count(lit(1)).as("n"), decSum(col("l_quantity")).as("sum_qty"))
        .sortValues(Seq("band")).sdf
    }),

    // ---- Concat inner: common-column union (`_concat.py:44-64`) ----
    "q47_concat_inner" -> ((s, dir) => {
      val a = T(s, dir, "customer").selectExpr("c_custkey AS k", "c_name AS name", "c_acctbal AS bal")
      val b = T(s, dir, "supplier").selectExpr("s_suppkey AS k", "s_name AS name")
      Df.concat(Seq(a, b), join = "inner")
        .sortValues(Seq("k", "name")).sdf
    }))

  val oracles: Map[String, String] = Map(
    "q40_merge_left" ->
      """SELECT p_partkey, p_size, COALESCE(cnt, 0) AS n_li
        |FROM part LEFT JOIN
        |(SELECT l_partkey, COUNT(*) AS cnt FROM lineitem GROUP BY l_partkey) li
        |ON p_partkey = l_partkey ORDER BY p_partkey""".stripMargin,
    "q41_merge_outer_indicator" ->
      """SELECT COALESCE(a.k, b.k) AS k, a.r_name, b.n_name,
        |CASE WHEN a.k IS NOT NULL AND b.k IS NOT NULL THEN 'both'
        |WHEN a.k IS NOT NULL THEN 'left_only' ELSE 'right_only' END AS _merge
        |FROM (SELECT r_regionkey AS k, r_name FROM region) a
        |FULL JOIN (SELECT n_nationkey AS k, n_name FROM nation WHERE n_nationkey < 10) b
        |ON a.k = b.k ORDER BY COALESCE(a.k, b.k)""".stripMargin,
    "q42_merge_suffixes" ->
      """SELECT a.o_orderkey, a.o_totalprice AS o_totalprice_x,
        |b.o_totalprice AS o_totalprice_y
        |FROM orders a JOIN orders b ON a.o_orderkey = b.o_orderkey
        |WHERE b.o_totalprice > 200000.0 ORDER BY a.o_orderkey""".stripMargin,
    "q44_join_multi" ->
      """SELECT r_name,
        |CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
        |COUNT(*) AS n_cust
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q45_semi_anti" ->
      """SELECT
        |(SELECT COUNT(*) FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)) AS n_with_orders,
        |(SELECT COUNT(*) FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)) AS n_without_orders""".stripMargin,
    "q46_cross_small" ->
      """SELECT r1.r_regionkey AS a, r2.r_regionkey AS b
        |FROM region r1 CROSS JOIN region r2
        |WHERE r1.r_regionkey < r2.r_regionkey ORDER BY a, b""".stripMargin,
    "q94_range_join" ->
      """SELECT r_regionkey AS band, COUNT(*) AS n,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN region
        |ON l_quantity BETWEEN r_regionkey*20.0 - 10.0 AND r_regionkey*20.0 + 15.0
        |GROUP BY 1 ORDER BY band""".stripMargin,
    "q91_salted_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q92_bucketed_join" ->
      """SELECT l_orderkey, COUNT(*) AS n,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "q47_concat_inner" ->
      """SELECT k, name FROM (
        |SELECT c_custkey AS k, c_name AS name FROM customer
        |UNION ALL SELECT s_suppkey AS k, s_name AS name FROM supplier)
        |ORDER BY k, name""".stripMargin)
}
