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
    }))

  val oracles: Map[String, String] = Map(
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
