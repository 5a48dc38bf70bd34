package graft.queries

import graft.operators.{Features, Profiling, TextAnalytics}
import org.apache.spark.sql.functions._
import QueryUtil._

/** Feature-engineering / activity-analytics battery. q238–q240. */
object FeatureQueries {

  val defs: Map[String, Q] = Map(
    // ---- leave-one-out target encoding: (sum − y)/(n − 1) from ONE
    // grouped exact-decimal aggregate broadcast back ----
    "q238_target_encode" -> ((s, dir) => {
      Features.targetEncodeLoo(
        T(s, dir, "lineitem"), "l_returnflag", "l_quantity", "te")
        .assign("te", round(col("te"), 6))
        .where(col("l_orderkey") % 50 === 0)
        .select("l_orderkey", "l_linenumber", "l_extendedprice",
          "l_returnflag", "l_quantity", "te")
        .sortValues(Seq("l_orderkey", "l_linenumber", "l_extendedprice")).sdf
    }),

    // ---- cohort retention triangle over event days ----
    "q239_cohort_retention" -> ((s, dir) => {
      Profiling.cohortRetention(events(s, dir), "user_id", "ts",
        granularity = "day")
        .sortValues(Seq("cohort", "offset")).sdf
    }),

    // ---- χ² discriminative terms per language ----
    "q240_chi2_terms" -> ((s, dir) => {
      TextAnalytics.chi2Terms(T(s, dir, "documents"), "text", "lang",
        "doc_id", k = 5, minDf = 5L)
        .sortValues(Seq("lang", "rank")).sdf
    }),

    // ---- grouped transform battery: cummax / shift / dense rank per
    // return flag — via the TWO-PHASE SCALABLE SCAN
    // (graft.operators.GroupedScan), not the window verbs: the key has
    // THREE distinct values, so the window formulation caps at three
    // tasks whatever the data size, while the scan range-partitions on
    // (group ++ order) keys and parallelizes by data. cummax + shift
    // share one scan sort; dense rank (a different order key) is a
    // second. Outputs are bit-identical to the window path (ScanSpec
    // pins it differentially) — same DuckDB oracle as before ----
    "q247_group_transforms" -> ((s, dir) => {
      import graft.operators.GroupedScan
      val okeys = Seq("l_orderkey", "l_linenumber", "l_extendedprice")
      // project BEFORE the scan: its RDD materialization blocks
      // Catalyst column pruning, so every unselected lineitem column
      // would otherwise ride BOTH range exchanges (16 -> 6 columns)
      val li = T(s, dir, "lineitem").select("l_returnflag", "l_orderkey",
        "l_linenumber", "l_extendedprice", "l_quantity", "l_discount")
      val d = li.groupby("l_returnflag")
        .scanScalable(okeys, Seq(
          GroupedScan.CumMax("l_extendedprice", "cmax"),
          GroupedScan.Shift("l_quantity", 1, "prev_qty")))
        .groupby("l_returnflag")
        .rankScalable("l_discount", out = "rnk", method = "dense")
      d.where(col("l_orderkey") % 50 === 0)
        .select("l_returnflag", "l_orderkey", "l_linenumber",
          "l_extendedprice", "cmax", "prev_qty", "rnk")
        .sortValues(Seq("l_returnflag", "l_orderkey", "l_linenumber",
          "l_extendedprice")).sdf
    }),

    // ---- merge(validate='m:1'): the join-cardinality contract checked
    // before the join — customer must be unique on the key, and is ----
    "q248_merge_validated" -> ((s, dir) => {
      val o = T(s, dir, "orders")
      val c = T(s, dir, "customer")
        .rename(Map("c_custkey" -> "o_custkey"))
        .select("o_custkey", "c_mktsegment")
      o.mergeValidated(c, on = Seq("o_custkey"), validate = "m:1")
        .groupby("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          decSum(col("o_totalprice")).as("sum_price"))
        .sortValues(Seq("c_mktsegment")).sdf
    }),

    // ---- seasonal-naive anomaly scoring: hourly volume vs the same
    // hour yesterday, z-scored residuals over the gap-filled series ----
    "q249_seasonal_residuals" -> ((s, dir) => {
      val hourly = graft.operators.TimeSeries.resampleGapfill(
        events(s, dir), "ts", "value", unit = "hour")
        .select("bin", "n")
      graft.operators.TimeSeries
        .seasonalResiduals(hourly, "bin", "n", period = 24)
        .sortValues(Seq("bin")).sdf
    }),

    // ---- duplicated(keep=first|last|False) census over the known
    // duplicate keys: first/last mark group size − 1 each, none marks
    // every member of a >1 group ----
    "q250_duplicated_variants" -> ((s, dir) => {
      val sub = Seq("l_orderkey", "l_linenumber")
      val li = T(s, dir, "lineitem")
        .duplicatedKeep(Seq("l_orderkey", "l_linenumber"),
          "l_extendedprice", "first", "d1")
      val li2 = li.duplicatedKeep(sub, "l_extendedprice", "last", "d2")
        .duplicatedKeep(sub, "l_extendedprice", "none", "d3")
      li2.agg(
        count(lit(1)).as("n_rows"),
        sum(col("d1").cast("int")).cast("long").as("n_first"),
        sum(col("d2").cast("int")).cast("long").as("n_last"),
        sum(col("d3").cast("int")).cast("long").as("n_none")).sdf
    }),

    // ---- grouped idxmax/idxmin: one max_by/min_by struct comparison
    // per group — map-side combine, no window sort ----
    "q251_group_idxmax" -> ((s, dir) => {
      val o = T(s, dir, "orders")
      val mx = o.groupby("o_orderpriority")
        .idxmax("o_totalprice", "o_orderkey", "idxmax")
      val mn = o.groupby("o_orderpriority")
        .idxmin("o_totalprice", "o_orderkey", "idxmin")
      mx.merge(mn, on = Seq("o_orderpriority"))
        .sortValues(Seq("o_orderpriority")).sdf
    }),

    // ---- scalable rolling + cumulative scan (GroupedScan.Rolling /
    // CumSum sharing ONE range sort): trailing-5 mean and running sum
    // per return flag. The decimal cast keeps both engines' sums exact
    // (QueryUtil conventions); cum_qty is decimal(28,2) internally so
    // it emits as DOUBLE for the gate ----
    "q264_scan_rolling" -> ((s, dir) => {
      import graft.operators.GroupedScan
      // l_extendedprice completes the total order: (okey, linenumber)
      // alone repeats on the PLANTED duplicate rows (the q250 family),
      // and a cumulative scan needs value-deterministic tie order
      val okeys = Seq("l_orderkey", "l_linenumber", "l_extendedprice")
      // project before the scan (see q247 — the RDD boundary blocks
      // column pruning through it)
      T(s, dir, "lineitem").select("l_returnflag", "l_orderkey",
        "l_linenumber", "l_extendedprice", "l_quantity")
        .assign("qd", col("l_quantity").cast("decimal(18,2)"))
        .groupby("l_returnflag")
        .scanScalable(okeys, Seq(
          GroupedScan.Rolling("qd", 5, "mean", "roll_mean"),
          GroupedScan.CumSum("qd", "cum_qty")))
        .where(col("l_orderkey") % 50 === 0)
        .assign("cum_qty_d", col("cum_qty").cast("double"))
        .select("l_returnflag", "l_orderkey", "l_linenumber",
          "roll_mean", "cum_qty_d")
        .sortValues(Seq("l_returnflag", "l_orderkey", "l_linenumber")).sdf
    }),

    // ---- scalable diff + pct_change (GroupedScan.Diff / PctChange
    // sharing ONE range sort) per return flag: row-to-row quantity
    // delta and extended-price relative change. Decimal diff emits
    // decimal(19,2) in-kernel (the window `c - lag(c)` dtype), cast
    // DOUBLE for the gate; pct_change divides double-cast prices, the
    // same IEEE doubles DuckDB's CAST(.. AS DOUBLE) division yields
    // (prices are positive — no zero-denominator divergence here) ----
    "q265_scan_diff" -> ((s, dir) => {
      import graft.operators.GroupedScan
      val okeys = Seq("l_orderkey", "l_linenumber", "l_extendedprice")
      // project before the scan (see q247 — the RDD boundary blocks
      // column pruning through it)
      T(s, dir, "lineitem").select("l_returnflag", "l_orderkey",
        "l_linenumber", "l_extendedprice", "l_quantity")
        .assign("qd", col("l_quantity").cast("decimal(18,2)"))
        .assign("pe", col("l_extendedprice").cast("double"))
        .groupby("l_returnflag")
        .scanScalable(okeys, Seq(
          GroupedScan.Diff("qd", 1, "qty_diff_d"),
          GroupedScan.PctChange("pe", 1, "price_pct")))
        .where(col("l_orderkey") % 50 === 0)
        .assign("qty_diff", col("qty_diff_d").cast("double"))
        .select("l_returnflag", "l_orderkey", "l_linenumber",
          "qty_diff", "price_pct")
        .sortValues(Seq("l_returnflag", "l_orderkey", "l_linenumber")).sdf
    }),

    // ---- KEYLESS diff over a global total order: the plain pandas
    // verb with no partition keys, routed (r15) through the keyless
    // GroupedScan — one range exchange whose parallelism scales with
    // data, where the pandas-parity window form is a single-partition
    // sort at ANY size. The engine-side values are bit-identical to
    // SQL's keyless LAG window (ScanSpec differential) ----
    "q267_keyless_diff" -> ((s, dir) => {
      // project before the scan (the RDD boundary blocks pruning)
      T(s, dir, "lineitem").select("l_orderkey", "l_linenumber",
        "l_extendedprice", "l_quantity")
        .diff("l_quantity", Seq("l_orderkey", "l_linenumber",
          "l_extendedprice"), out = "qd", periods = 2)
        .where(col("l_orderkey") % 50 === 0)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "qd")
        .sortValues(Seq("l_orderkey", "l_linenumber", "l_extendedprice")).sdf
    }),

    // ---- scanKeyless batch (r16): FIVE keyless verbs — decimal diff,
    // ffill over a synthesized-null column, exact decimal cumsum,
    // double pct_change, lag-3 shift — in ONE scan protocol (one range
    // exchange, one summary pass; the verb-by-verb chain would pay
    // five). Decimal kernels are exact, so double casts land on the
    // oracle's bits; pct_change divides positive doubles (no
    // zero-denominator divergence) ----
    "q268_scan_batch" -> ((s, dir) => {
      T(s, dir, "lineitem").select("l_orderkey", "l_linenumber",
        "l_extendedprice", "l_quantity", "l_tax")
        .assign("qn", when(col("l_quantity") % 7 === 0,
          lit(null).cast("double"))
          .otherwise(col("l_quantity").cast("double")))
        .assign("qd18", col("l_quantity").cast("decimal(18,2)"))
        .assign("pe", col("l_extendedprice").cast("double"))
        .assign("tx", col("l_tax").cast("double"))
        .scanKeyless(Seq("l_orderkey", "l_linenumber", "l_extendedprice"))(_
          .diff("qd18", out = "qd")
          .ffill("qn", out = "fq")
          .cumsum("qd18", out = "cs")
          .pctChange("pe", out = "pp")
          .shift("tx", out = "sh", periods = 3))
        .where(col("l_orderkey") % 50 === 0)
        .assign("qd", col("qd").cast("double"))
        .assign("cs", col("cs").cast("double"))
        .select("l_orderkey", "l_linenumber", "l_extendedprice",
          "qd", "fq", "cs", "pp", "sh")
        .sortValues(Seq("l_orderkey", "l_linenumber", "l_extendedprice")).sdf
    }))

  val oracles: Map[String, String] = Map(
    "q268_scan_batch" ->
      """WITH b AS (
        |  SELECT l_orderkey, l_linenumber, l_extendedprice,
        |    CAST(l_quantity AS DECIMAL(18,2)) AS qd18,
        |    CASE WHEN l_quantity % 7 = 0 THEN NULL
        |         ELSE CAST(l_quantity AS DOUBLE) END AS qn,
        |    CAST(l_extendedprice AS DOUBLE) AS pe,
        |    CAST(l_tax AS DOUBLE) AS tx
        |  FROM lineitem),
        |w AS (
        |  SELECT l_orderkey, l_linenumber, l_extendedprice,
        |    CAST(qd18 - LAG(qd18) OVER win AS DOUBLE) AS qd,
        |    LAST_VALUE(qn IGNORE NULLS) OVER cum AS fq,
        |    CAST(SUM(qd18) OVER cum AS DOUBLE) AS cs,
        |    pe / LAG(pe) OVER win - 1.0 AS pp,
        |    LAG(tx, 3) OVER win AS sh
        |  FROM b
        |  WINDOW win AS (ORDER BY l_orderkey, l_linenumber, l_extendedprice),
        |    cum AS (ORDER BY l_orderkey, l_linenumber, l_extendedprice
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT l_orderkey, l_linenumber, l_extendedprice, qd, fq, cs, pp, sh
        |FROM w WHERE l_orderkey % 50 = 0
        |ORDER BY l_orderkey, l_linenumber, l_extendedprice""".stripMargin,
    "q267_keyless_diff" ->
      """WITH w AS (
        |  SELECT l_orderkey, l_linenumber, l_extendedprice,
        |    l_quantity - LAG(l_quantity, 2) OVER
        |      (ORDER BY l_orderkey, l_linenumber, l_extendedprice) AS qd
        |  FROM lineitem)
        |SELECT l_orderkey, l_linenumber, l_extendedprice, qd
        |FROM w WHERE l_orderkey % 50 = 0
        |ORDER BY l_orderkey, l_linenumber, l_extendedprice""".stripMargin,
    "q265_scan_diff" ->
      """WITH w AS (
        |  SELECT l_returnflag, l_orderkey, l_linenumber,
        |    CAST(CAST(l_quantity AS DECIMAL(18,2))
        |        - LAG(CAST(l_quantity AS DECIMAL(18,2))) OVER win
        |      AS DOUBLE) AS qty_diff,
        |    CAST(l_extendedprice AS DOUBLE)
        |        / LAG(CAST(l_extendedprice AS DOUBLE)) OVER win
        |      - 1.0 AS price_pct
        |  FROM lineitem
        |  WINDOW win AS (PARTITION BY l_returnflag
        |      ORDER BY l_orderkey, l_linenumber, l_extendedprice))
        |SELECT l_returnflag, l_orderkey, l_linenumber, qty_diff, price_pct
        |FROM w WHERE l_orderkey % 50 = 0
        |ORDER BY l_returnflag, l_orderkey, l_linenumber""".stripMargin,
    "q264_scan_rolling" ->
      """WITH w AS (
        |  SELECT l_returnflag, l_orderkey, l_linenumber,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER win5 AS DOUBLE)
        |      / COUNT(l_quantity) OVER win5 AS roll_mean,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER cum AS DOUBLE)
        |      AS cum_qty_d
        |  FROM lineitem
        |  WINDOW win5 AS (PARTITION BY l_returnflag
        |      ORDER BY l_orderkey, l_linenumber, l_extendedprice
        |      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
        |    cum AS (PARTITION BY l_returnflag
        |      ORDER BY l_orderkey, l_linenumber, l_extendedprice
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT l_returnflag, l_orderkey, l_linenumber, roll_mean, cum_qty_d
        |FROM w WHERE l_orderkey % 50 = 0
        |ORDER BY l_returnflag, l_orderkey, l_linenumber""".stripMargin,
    "q238_target_encode" ->
      """WITH g AS (
        |  SELECT l_returnflag,
        |    (sum(l_quantity::DECIMAL(18,2)))::DOUBLE AS s,
        |    count(l_quantity)::DOUBLE AS n
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_orderkey, l_linenumber, l_extendedprice,
        |  l.l_returnflag, l_quantity,
        |  CASE WHEN n > 1 THEN ROUND(
        |    (s - (l_quantity::DECIMAL(18,2))::DOUBLE) / (n - 1.0), 6)
        |  END AS te
        |FROM lineitem l JOIN g ON l.l_returnflag = g.l_returnflag
        |WHERE l_orderkey % 50 = 0
        |ORDER BY l_orderkey, l_linenumber, l_extendedprice""".stripMargin,

    "q239_cohort_retention" ->
      """WITH f AS (
        |  SELECT user_id, min(date_trunc('day', ts::TIMESTAMP)) AS cohort
        |  FROM events GROUP BY user_id),
        |act AS (
        |  SELECT DISTINCT e.user_id, f.cohort,
        |    date_diff('day', f.cohort, date_trunc('day', e.ts::TIMESTAMP))
        |      AS "offset"
        |  FROM events e JOIN f ON e.user_id = f.user_id)
        |SELECT cohort::TIMESTAMP AS cohort, "offset"::INT AS "offset",
        |  count(*)::BIGINT AS n_active
        |FROM act GROUP BY 1, 2 ORDER BY cohort, "offset"""".stripMargin,

    "q250_duplicated_variants" ->
      """WITH g AS (
        |  SELECT l_orderkey, l_linenumber, count(*) AS c
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT
        |  (SELECT count(*) FROM lineitem)::BIGINT AS n_rows,
        |  (SELECT sum(c - 1) FROM g)::BIGINT AS n_first,
        |  (SELECT sum(c - 1) FROM g)::BIGINT AS n_last,
        |  (SELECT sum(CASE WHEN c > 1 THEN c ELSE 0 END) FROM g)::BIGINT
        |    AS n_none""".stripMargin,

    "q251_group_idxmax" ->
      """WITH r AS (
        |  SELECT o_orderpriority, o_orderkey,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rx,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice ASC, o_orderkey) AS rn
        |  FROM orders)
        |SELECT o_orderpriority,
        |  max(CASE WHEN rx = 1 THEN o_orderkey END)::BIGINT AS idxmax,
        |  max(CASE WHEN rn = 1 THEN o_orderkey END)::BIGINT AS idxmin
        |FROM r GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q247_group_transforms" ->
      """WITH w AS (
        |  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        |    max(l_extendedprice) OVER (PARTITION BY l_returnflag
        |      ORDER BY l_orderkey, l_linenumber, l_extendedprice
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cmax,
        |    lag(l_quantity) OVER (PARTITION BY l_returnflag
        |      ORDER BY l_orderkey, l_linenumber, l_extendedprice)
        |      AS prev_qty,
        |    dense_rank() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_discount)::INT AS rnk
        |  FROM lineitem)
        |SELECT * FROM w WHERE l_orderkey % 50 = 0
        |ORDER BY l_returnflag, l_orderkey, l_linenumber, l_extendedprice"""
        .stripMargin,

    "q248_merge_validated" ->
      """SELECT c_mktsegment, count(*)::BIGINT AS n,
        |  CAST(SUM(o_totalprice::DECIMAL(18,2)) AS DOUBLE) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q249_seasonal_residuals" ->
      """WITH e AS (
        |  SELECT date_trunc('hour', ts::TIMESTAMP) AS d FROM events),
        |b AS (SELECT min(d) AS lo, max(d) AS hi FROM e),
        |sc AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
        |         AS bin FROM b),
        |a AS (SELECT d AS bin, count(*)::BIGINT AS n FROM e GROUP BY 1),
        |s2 AS (SELECT sc.bin, coalesce(a.n, 0)::BIGINT AS n
        |       FROM sc LEFT JOIN a USING (bin)),
        |r2 AS (
        |  SELECT bin, n,
        |    lag(n, 24) OVER (ORDER BY bin) AS expected,
        |    (n - lag(n, 24) OVER (ORDER BY bin))::DOUBLE AS residual
        |  FROM s2),
        |st AS (
        |  SELECT count(residual)::DOUBLE AS n2,
        |    (sum(residual::DECIMAL(28,6)))::DOUBLE AS s,
        |    (sum((residual * residual)::DECIMAL(38,6)))::DOUBLE AS ss
        |  FROM r2 WHERE residual IS NOT NULL),
        |z2 AS (
        |  SELECT bin, n, expected, residual,
        |    CASE WHEN residual IS NULL OR n2 < 2 THEN CAST(NULL AS DOUBLE)
        |    ELSE ROUND((residual - s / n2)
        |      / SQRT((ss - s * s / n2) / (n2 - 1.0)), 6) + 0.0
        |    END AS z
        |  FROM r2, st)
        |SELECT bin, n, expected, residual, z,
        |  CASE WHEN z IS NULL THEN CAST(NULL AS BOOLEAN)
        |       ELSE abs(z) > 3.0 END AS is_anomaly
        |FROM z2 ORDER BY bin""".stripMargin,

    // the same 2×2 document-frequency contingency χ², identical double
    // tree, DENSE ranking replaced by row_number with (chi2 desc, term)
    // total order on both sides
    "q240_chi2_terms" ->
      """WITH dt AS (
        |  SELECT DISTINCT lang AS cls, doc_id,
        |    UNNEST(list_filter(regexp_split_to_array(text, '\s+'),
        |      w -> w <> '')) AS term
        |  FROM documents),
        |a AS (SELECT cls, term, count(*)::BIGINT AS a
        |      FROM dt GROUP BY 1, 2),
        |tt AS (SELECT term, sum(a)::BIGINT AS ta FROM a GROUP BY 1),
        |ct AS (SELECT lang AS cls, count(DISTINCT doc_id)::BIGINT AS nc
        |       FROM documents GROUP BY 1),
        |nn AS (SELECT count(DISTINCT doc_id)::BIGINT AS nn FROM documents),
        |m AS (
        |  SELECT a.cls, a.term, a.a, tt.ta - a.a AS b, ct.nc - a.a AS c,
        |    nn.nn - ct.nc - (tt.ta - a.a) AS d, nn.nn
        |  FROM a JOIN tt USING (term) JOIN ct USING (cls) CROSS JOIN nn),
        |s AS (
        |  SELECT cls, term,
        |    CASE WHEN c + d = 0 OR b + d = 0 OR a + c = 0 THEN 0.0
        |    ELSE ROUND(CAST(nn AS DOUBLE)
        |      * (CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
        |         - CAST(b AS DOUBLE) * CAST(c AS DOUBLE))
        |      * (CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
        |         - CAST(b AS DOUBLE) * CAST(c AS DOUBLE))
        |      / (CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE)
        |         * CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE)),
        |      6) END AS chi2
        |  FROM m WHERE a + b >= 5),
        |r AS (SELECT cls, term, chi2,
        |    row_number() OVER (PARTITION BY cls ORDER BY chi2 DESC, term)
        |      AS rank
        |  FROM s)
        |SELECT cls AS lang, term, chi2, rank::INT AS rank
        |FROM r WHERE rank <= 5
        |ORDER BY lang, rank""".stripMargin)
}
