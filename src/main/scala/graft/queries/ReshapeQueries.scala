package graft.queries

import org.apache.spark.sql.functions._
import QueryUtil._

/** Reshape / fill battery: melt (wide→long), get_dummies, crosstab,
  * ffill, pct_change, qcut. q228–q233.
  *
  * Scale notes (the reason each plan is shaped the way it is):
  *  - melt is a `stack` generator — one scan, no shuffle, vs the naive
  *    UNION-per-column plan that re-reads the source k times;
  *  - get_dummies / crosstab take an EXPLICIT category list, so the
  *    schema is static and no driver-side distinct-collect ever runs;
  *  - ffill/pct_change window on (l_suppkey) partitions — one shuffle,
  *    never a single-partition global sort;
  *  - qcut is two-phase (one agg pass for breaks, then a codegen'd
  *    when-chain) instead of a global-sort ntile.
  */
object ReshapeQueries {

  val defs: Map[String, Q] = Map(
    // ---- pandas melt: wide → long via the stack generator ----
    "q228_melt" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .where(col("l_orderkey") % 100 === 0)
        .melt(
          idVars = Seq("l_orderkey", "l_linenumber"),
          valueVars = Seq("l_discount", "l_extendedprice", "l_quantity"))
        // (l_orderkey, l_linenumber) is not unique in this synthetic
        // data — value completes the total order
        .sortValues(Seq("l_orderkey", "l_linenumber", "variable", "value")).sdf
    }),

    // ---- pandas get_dummies: one-hot over an explicit category list ----
    "q229_get_dummies" -> ((s, dir) => {
      T(s, dir, "orders")
        .getDummies("o_orderstatus", Seq("F", "O", "P"), prefix = "st")
        .where(col("o_orderkey") % 20 === 0)
        .select("o_orderkey", "st_F", "st_O", "st_P")
        .sortValues(Seq("o_orderkey")).sdf
    }),

    // ---- pandas crosstab: priority × status contingency counts ----
    "q230_crosstab" -> ((s, dir) => {
      T(s, dir, "orders")
        .crosstabCount("o_orderpriority", "o_orderstatus", Seq("F", "O", "P"))
        .sortValues(Seq("o_orderpriority")).sdf
    }),

    // ---- pandas ffill: carry last non-null forward per supplier ----
    // (l_orderkey, l_linenumber) is NOT unique in this synthetic data;
    // l_extendedprice completes a total order — ties in a window's
    // ORDER BY would make the carry engine-dependent.
    "q231_ffill" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .assign("v", when(col("l_linenumber") % 3 === 0, lit(null))
          .otherwise(col("l_extendedprice")))
        .ffill(Seq("v"),
          orderKeys = Seq("l_orderkey", "l_linenumber", "l_extendedprice"),
          partitionBy = Seq("l_suppkey"))
        .where(col("l_orderkey") % 50 === 0)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice", "v")
        .sortValues(Seq("l_suppkey", "l_orderkey", "l_linenumber",
          "l_extendedprice")).sdf
    }),

    // ---- pandas pct_change per supplier over explicit order ----
    "q232_pct_change" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .pctChange("l_extendedprice",
          orderKeys = Seq("l_orderkey", "l_linenumber", "l_extendedprice"),
          out = "pct", partitionBy = Seq("l_suppkey"))
        .assign("pct", round(col("pct"), 6))
        .where(col("l_orderkey") % 50 === 0)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice", "pct")
        .sortValues(Seq("l_suppkey", "l_orderkey", "l_linenumber",
          "l_extendedprice")).sdf
    }),

    // ---- pandas json_normalize: ONE from_json parse flattens props;
    // get_json_object would re-parse per field ----
    "q258_json_normalize" -> ((s, dir) => {
      events(s, dir)
        .jsonNormalize("props", "k BIGINT", keep = Seq("event_id", "user_id"))
        .where(col("event_id") % 20 === 0)
        .sortValues(Seq("event_id")).sdf
    }),

    // ---- pandas qcut(labels=False): quartile binning, then profile ----
    "q233_qcut" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .qcut("l_extendedprice", q = 4, out = "bucket")
        .groupby("bucket")
        .agg(count(lit(1)).cast("long").as("n"),
          min(col("l_extendedprice")).as("mn"),
          max(col("l_extendedprice")).as("mx"))
        .sortValues(Seq("bucket")).sdf
    }))

  val oracles: Map[String, String] = Map(
    "q228_melt" ->
      """WITH src AS (
        |  SELECT l_orderkey, l_linenumber,
        |         l_discount::DOUBLE d, l_extendedprice::DOUBLE e,
        |         l_quantity::DOUBLE q
        |  FROM lineitem WHERE l_orderkey % 100 = 0)
        |SELECT l_orderkey, l_linenumber, 'l_discount' AS variable, d AS value FROM src
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_extendedprice', e FROM src
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_quantity', q FROM src
        |ORDER BY l_orderkey, l_linenumber, variable, value""".stripMargin,

    "q229_get_dummies" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS "st_F",
        |  CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END AS "st_O",
        |  CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END AS "st_P"
        |FROM orders WHERE o_orderkey % 20 = 0
        |ORDER BY o_orderkey""".stripMargin,

    "q230_crosstab" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (WHERE o_orderstatus = 'F')::BIGINT AS "F",
        |  count(*) FILTER (WHERE o_orderstatus = 'O')::BIGINT AS "O",
        |  count(*) FILTER (WHERE o_orderstatus = 'P')::BIGINT AS "P"
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    // ffill without IGNORE-NULLS windows (pure ANSI): count(v) over the
    // expanding frame increments at each non-null, so each carry-group
    // holds exactly one non-null value — max() recovers it.
    "q231_ffill" ->
      """WITH base AS (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |    CASE WHEN l_linenumber % 3 = 0 THEN NULL
        |         ELSE l_extendedprice END AS v
        |  FROM lineitem),
        |g AS (
        |  SELECT *, count(v) OVER (PARTITION BY l_suppkey
        |      ORDER BY l_orderkey, l_linenumber, l_extendedprice
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        |  FROM base),
        |filled AS (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |    max(v) OVER (PARTITION BY l_suppkey, grp) AS v
        |  FROM g)
        |SELECT * FROM filled WHERE l_orderkey % 50 = 0
        |ORDER BY l_suppkey, l_orderkey, l_linenumber, l_extendedprice""".stripMargin,

    "q232_pct_change" ->
      """WITH p AS (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |    ROUND(l_extendedprice / lag(l_extendedprice) OVER (
        |      PARTITION BY l_suppkey
        |      ORDER BY l_orderkey, l_linenumber, l_extendedprice) - 1.0,
        |      6) AS pct
        |  FROM lineitem)
        |SELECT * FROM p WHERE l_orderkey % 50 = 0
        |ORDER BY l_suppkey, l_orderkey, l_linenumber, l_extendedprice""".stripMargin,

    "q258_json_normalize" ->
      """SELECT event_id, user_id,
        |  json_extract_string(props, '$.k')::BIGINT AS k
        |FROM events WHERE event_id % 20 = 0
        |ORDER BY event_id""".stripMargin,

    "q233_qcut" ->
      """WITH b AS (
        |  SELECT
        |    ROUND(quantile_cont(l_extendedprice::DOUBLE, 0.25), 6) AS b1,
        |    ROUND(quantile_cont(l_extendedprice::DOUBLE, 0.50), 6) AS b2,
        |    ROUND(quantile_cont(l_extendedprice::DOUBLE, 0.75), 6) AS b3
        |  FROM lineitem)
        |SELECT
        |  (CASE WHEN l_extendedprice > b1 THEN 1 ELSE 0 END
        |   + CASE WHEN l_extendedprice > b2 THEN 1 ELSE 0 END
        |   + CASE WHEN l_extendedprice > b3 THEN 1 ELSE 0 END) AS bucket,
        |  count(*)::BIGINT AS n,
        |  min(l_extendedprice) AS mn,
        |  max(l_extendedprice) AS mx
        |FROM lineitem, b
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
