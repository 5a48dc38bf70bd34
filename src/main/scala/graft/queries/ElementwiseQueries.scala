package graft.queries

import graft.api.Df
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import QueryUtil._

/** Sources + elementwise operator suite (SURVEY.md §2.1–§2.4).
  * q14–q29, plus the ingest-format family: JSONL (q132, gzip q139),
  * ORC (q133), loose binary blobs (q147), XML (q150). Conventions as
  * in [[CoreQueries]]. */
object ElementwiseQueries {

  private def tmp(name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_$name"

  val defs: Map[String, Q] = Map(
    // ---- ReadCSV (`io/csv.py:8-20`): sink to CSV, scan back with the
    // usecols operand projecting the parse to the named columns ----
    "q14_read_csv" -> ((s, dir) => {
      val p = tmp("csv_region")
      val r = T(s, dir, "region")
      r.toCsv(p)
      Df.readCsv(s, p, header = true, schema = r.sdf.schema,
          usecols = Seq("r_regionkey", "r_name"))
        .sortValues(Seq("r_regionkey")).sdf
    }),

    // ---- ToParquet (`io/parquet.py:49-76`) round-trip ----
    "q15_to_parquet" -> ((s, dir) => {
      val p = tmp("pq_lineitem")
      val li = T(s, dir, "lineitem")
      li.where(li("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_quantity").toParquet(p)
      Df.readParquet(s, p).sortValues(Seq("l_orderkey", "l_linenumber")).sdf
    }),

    // ---- small-file compaction: scatter documents across 64 tiny
    // files (the per-trigger ingest shape), compact to ~200-row files,
    // read back — data identical, layout rebuilt ----
    "q160_compact_files" -> ((s, dir) => {
      val scattered = tmp("scatter_docs")
      val compacted = tmp("compact_docs")
      T(s, dir, "documents").select("doc_id", "lang", "text")
        .sdf.repartition(64).write.mode("overwrite").parquet(scattered)
      graft.operators.Layout.compactParquet(s, scattered, compacted,
          targetRecordsPerFile = 200)
        .sortValues(Seq("doc_id")).sdf
    }),

    // ---- JSONL round-trip (ingest-format reader; beyond the
    // reference's surface): sink documents as JSON Lines, read back
    // with an explicit schema (the at-scale contract — no inference
    // pass), filter + project; oracle is the identity on the source ----
    "q132_read_json" -> ((s, dir) => {
      val p = tmp("json_documents")
      val d = T(s, dir, "documents")
      d.select("doc_id", "lang", "text").toJson(p)
      val back = Df.readJson(s, p, schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("lang", StringType),
        StructField("text", StringType))))
      back.where(col("lang") === "en").sortValues(Seq("doc_id")).sdf
    }),

    // ---- gzip'd JSONL round-trip (the shape corpus feeds actually
    // arrive in — .jsonl.gz): same schema-first read contract as
    // q132; Spark detects the codec from the file extension. The
    // at-scale caveat lives on Df.toJson: gzip is NOT splittable, so
    // one giant member file = one decode task — prefer bzip2/zstd-
    // framed or many sized files for 100 TB feeds ----
    "q139_read_json_gz" -> ((s, dir) => {
      val p = tmp("json_gz_documents")
      val d = T(s, dir, "documents")
      d.select("doc_id", "lang", "text").toJson(p, compression = "gzip")
      val back = Df.readJson(s, p, schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("lang", StringType),
        StructField("text", StringType))))
      back.where(col("doc_id") % 3 === 0).sortValues(Seq("doc_id")).sdf
    }),

    // ---- XML round-trip (Spark 4 native XML; ingest-format reader
    // with the q132 schema-first contract) ----
    "q150_read_xml" -> ((s, dir) => {
      val p = tmp("xml_documents")
      val d = T(s, dir, "documents")
      d.select("doc_id", "lang", "text").toXml(p, rowTag = "doc")
      val back = Df.readXml(s, p, rowTag = "doc", schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("lang", StringType),
        StructField("text", StringType))))
      back.where(col("doc_id") % 4 === 1).sortValues(Seq("doc_id")).sdf
    }),

    // ---- ORC round-trip (the other native columnar format; same
    // pushdown contract as parquet, asserted in PlanSpec) ----
    "q133_read_orc" -> ((s, dir) => {
      val p = tmp("orc_orders")
      val o = T(s, dir, "orders")
      o.select("o_orderkey", "o_custkey", "o_totalprice").toOrc(p)
      val back = Df.readOrc(s, p)
      back.where(col("o_totalprice") > 400000.0)
        .sortValues(Seq("o_orderkey")).sdf
    }),

    // ---- binaryFile ingest (the multimodal on-ramp): stage one loose
    // .txt blob per doc, read them back as (path, length, content),
    // recover the id from the filename and fingerprint the bytes; the
    // oracle computes the same (byte length, md5) from the source rows.
    // A .skip decoy proves pathGlobFilter prunes at listing time ----
    "q147_binary_ingest" -> ((s, dir) => {
      val p = tmp("binary_docs")
      import java.nio.file.{Files, Paths}
      import java.nio.charset.StandardCharsets.UTF_8
      val root = Paths.get(p)
      if (Files.exists(root))
        Files.walk(root).sorted(java.util.Comparator.reverseOrder())
          .forEach(f => Files.delete(f))
      Files.createDirectories(root)
      T(s, dir, "documents").where(col("doc_id") < 120)
        .select("doc_id", "text").sdf.collect().foreach { r =>
          Files.write(root.resolve(s"${r.getLong(0)}.txt"),
            r.getString(1).getBytes(UTF_8))
        }
      Files.write(root.resolve("decoy.skip"), "not a doc".getBytes(UTF_8))
      Df.readBinaryFiles(s, p, globFilter = "*.txt").sdf
        .select(
          regexp_extract(col("path"), "([0-9]+)\\.txt$", 1)
            .cast(LongType).as("doc_id"),
          col("length"), md5(col("content")).as("content_md5"))
        .orderBy("doc_id")
    }),

    // ---- PandasIO / Literal (`io/io.py:17`, `_expr.py:860`) ----
    "q16_from_rows" -> ((s, dir) => {
      import org.apache.spark.sql.Row
      val schema = StructType(Seq(
        StructField("k", LongType), StructField("v", StringType)))
      Df.fromRows(s, Seq(Row(1L, "a"), Row(2L, "b"), Row(3L, "c")), schema)
        .assign("doubled", col("k") * 2)
        .sortValues(Seq("k")).sdf
    }),

    // ---- Drop + RenameFrame (`_expr.py:1296,1034`) ----
    "q17_drop_rename" -> ((s, dir) => {
      T(s, dir, "part")
        .drop("p_type", "p_retailprice")
        .rename(Map("p_brand" -> "brand", "p_name" -> "name"))
        .sortValues(Seq("p_partkey")).sdf
    }),

    // ---- select_dtypes (`_collection.py:489`) ----
    "q18_select_dtypes" -> ((s, dir) => {
      T(s, dir, "customer")
        .selectDtypes(_.isInstanceOf[NumericType])
        .sortValues(Seq("c_custkey")).sdf
    }),

    // ---- SetIndex / index-join / ResetIndex (`_expr.py:1118,1462`;
    // `_merge.py:99-104`): pandas df.join(other) on shared index ----
    "q19_index_join" -> ((s, dir) => {
      val o = T(s, dir, "orders").setIndex("o_orderkey")
      val liAgg = T(s, dir, "lineitem").groupby("l_orderkey")
        .agg(decSum(col("l_quantity")).as("total_qty"))
        .rename(Map("l_orderkey" -> "lkey")).setIndex("lkey")
      o.joinIndex(liAgg, how = "left")
        .select("o_orderkey", "o_totalprice", "total_qty")
        .sortValues(Seq("o_orderkey")).sdf
    }),

    // ---- IsNa / Fillna / DropnaFrame (`_expr.py:1209,1111,986`);
    // tables have no nulls, so synthesize them first ----
    "q20_null_ops" -> ((s, dir) => {
      val e = events(s, dir)
      val withNull = e.assign("v", when(col("value") < 50, lit(null)).otherwise(col("value")))
      val nNull = withNull("v").isna.astype("int").as("is_null")
      withNull.assign("is_null", nNull)
        .assign("v_filled", withNull("v").fillna(-1.0))
        .agg(
          count(lit(1)).as("n_total"),
          sum(col("is_null")).cast("long").as("n_null"),
          count(col("v")).as("n_after_dropna"),
          sum(col("v_filled").cast("decimal(18,4)")).cast("double").as("sum_filled")).sdf
    }),

    // ---- Replace (`_expr.py:1125`) + dict-Map (`_expr.py:1264`) ----
    "q21_replace_map" -> ((s, dir) => {
      val rep = events(s, dir)
        .replace(Map("click" -> "tap", "view" -> "impression"), subset = Seq("event_type"))
      rep.assign("is_error", rep("event_type").map(Map("error" -> 1)).fillna(0).astype("int"))
        .valueCounts("event_type")
        .sortValues(Seq("event_type")).sdf
    }),

    // ---- Replace with regex=True (`_expr.py:1125-1130`) ----
    "q88_replace_regex" -> ((s, dir) => {
      T(s, dir, "customer")
        .replaceRegex("^Customer#0+", "C#", subset = Seq("c_name"))
        .select("c_custkey", "c_name", "c_mktsegment")
        .sortValues(Seq("c_custkey")).sdf
    }),

    // ---- Clip / Round / Abs / Neg (`_expr.py:1139,1215,1221,1624`) ----
    // Oracle parity note: DuckDB's ABS(-0.0) keeps the sign bit (-0.0)
    // while Spark/numpy normalize to +0.0; the driver hash is byte-level,
    // so the oracle adds `+ 0` (IEEE: -0.0 + 0 = +0.0, identity
    // elsewhere). Verified empirically at sf0.01: the 2941 hash diffs
    // were ALL -0.0 rows; ROUND(x/3.0, 2) itself matches bit-for-bit.
    "q22_clip_round_abs" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
      li.assign("qty_clipped", li("l_quantity").clip(5, 45))
        .assign("third_price", (li("l_extendedprice") / 3.0).round(2))
        .assign("neg_disc", (-li("l_discount")).abs)
        .select("l_orderkey", "l_linenumber", "qty_clipped", "third_price", "neg_disc")
        .sortValues(Seq("l_orderkey", "l_linenumber")).sdf
    }),

    // ---- AsType (`_expr.py:1171-1206`) ----
    "q23_astype" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .astype(Map("l_quantity" -> "int", "l_orderkey" -> "string"))
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .sortValues(Seq("l_orderkey", "l_linenumber")).sdf
    }),

    // ---- ExplodeSeries/Frame (`_expr.py:1275-1293`) ----
    "q24_explode" -> ((s, dir) => {
      T(s, dir, "documents")
        .assign("word", split(col("text"), " "))
        .explode("word")
        .groupby("word").agg(count(lit(1)).as("n"))
        .sortValues(Seq("word")).sdf
    }),

    // ---- Apply via Column-expression escape hatch (`_expr.py:1240`;
    // SURVEY.md §2.11 design rule: expression first, UDF fallback) ----
    "q25_apply_expr" -> ((s, dir) => {
      T(s, dir, "orders")
        .assign("bucket", floor(col("o_totalprice") / 50000).cast("long"))
        .groupby("bucket")
        .agg(count(lit(1)).as("n"),
             decSum(col("o_totalprice")).as("sum_price"))
        .sortValues(Seq("bucket")).sdf
    }),

    // ---- CombineFirst (`_expr.py:1005-1031`) ----
    "q26_combine_first" -> ((s, dir) => {
      val c = T(s, dir, "customer")
      val a = c.where(c("c_nationkey") < 12).select("c_custkey", "c_acctbal")
      val b = c.select("c_custkey", "c_acctbal", "c_mktsegment")
        .assign("c_acctbal", lit(-999.0))
      a.combineFirst(b, on = Seq("c_custkey"))
        .sortValues(Seq("c_custkey")).sdf
    }),

    // ---- Sample (`_expr.py:1055`): seeded; engines' RNGs differ, so
    // the oracle checks DERIVED INVARIANTS instead of replaying rows:
    // every sampled key exists in an INDEPENDENTLY-SCANNED copy of the
    // source (a same-lineage anti-join would be empty by construction
    // and verify nothing), and the sample size sits inside exact 6σ
    // Bernoulli bounds (mean n·p, var n·p(1−p)) computed from the
    // source count. The raw sampled rows stay spec-covered in ApiSpec. ----
    "q27_sample" -> ((s, dir) => {
      val o = T(s, dir, "orders").select("o_orderkey")
      val samp = o.sample(0.1, replace = false, seed = 42L)
      val freshScan = T(s, dir, "orders").select("o_orderkey")
      val outside = samp.sdf.join(freshScan.sdf, Seq("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("n_outside"))
      val nSamp = samp.sdf.agg(count(lit(1)).as("n_samp"))
      val nSrc = o.sdf.agg(count(lit(1)).as("n_src"))
      nSrc.crossJoin(outside).crossJoin(nSamp)
        .select(col("n_src"), col("n_outside"),
          (col("n_samp") >= col("n_src") * 0.1 - lit(6.0) * sqrt(col("n_src") * 0.09) &&
            col("n_samp") <= col("n_src") * 0.1 + lit(6.0) * sqrt(col("n_src") * 0.09))
            .as("size_in_bounds"))
    }),

    // ---- Tail (`_expr.py:1495`) ----
    "q28_tail" -> ((s, dir) => {
      T(s, dir, "orders")
        .tail(15, byKeys = Seq("o_orderdate", "o_orderkey"))
        .select("o_orderkey", "o_orderdate").sdf
    }),

    // ---- ToTimestamp / datetime ops (`_expr.py:1159`) ----
    "q29_time_ops" -> ((s, dir) => {
      events(s, dir)
        .assign("day", date_trunc("day", col("ts")))
        .groupby("day")
        .agg(count(lit(1)).as("n"),
             sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
        .sortValues(Seq("day")).sdf
    }))

  val oracles: Map[String, String] = Map(
    // q27's invariants: containment must hold exactly (0 rows outside
    // the source) and the 6σ size bound must be satisfied; n_src is the
    // one genuinely replayed value
    "q27_sample" ->
      """SELECT COUNT(*) AS n_src, 0::BIGINT AS n_outside,
        |TRUE AS size_in_bounds FROM orders""".stripMargin,
    "q14_read_csv" -> "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    "q15_to_parquet" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_quantity > 45 ORDER BY l_orderkey, l_linenumber""".stripMargin,
    // compaction changes layout, never data: identity on the source
    "q160_compact_files" ->
      """SELECT doc_id, lang, text FROM documents ORDER BY doc_id""",
    // round-trip identities: the JSONL/ORC write+read must reproduce
    // the source rows exactly
    "q132_read_json" ->
      """SELECT doc_id, lang, text FROM documents
        |WHERE lang = 'en' ORDER BY doc_id""".stripMargin,
    "q139_read_json_gz" ->
      """SELECT doc_id, lang, text FROM documents
        |WHERE doc_id % 3 = 0 ORDER BY doc_id""".stripMargin,
    "q133_read_orc" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_totalprice > 400000.0 ORDER BY o_orderkey""".stripMargin,
    "q150_read_xml" ->
      """SELECT doc_id, lang, text FROM documents
        |WHERE doc_id % 4 = 1 ORDER BY doc_id""".stripMargin,
    // byte length + md5 of the staged blob == strlen + md5 of the
    // source text (UTF-8 both sides); the .skip decoy must not appear
    "q147_binary_ingest" ->
      """SELECT doc_id, strlen(text)::BIGINT AS length,
        |md5(text) AS content_md5
        |FROM documents WHERE doc_id < 120 ORDER BY doc_id""".stripMargin,
    "q16_from_rows" ->
      """SELECT k, v, k*2 AS doubled FROM (VALUES
        |(1::BIGINT,'a'),(2::BIGINT,'b'),(3::BIGINT,'c')) t(k, v) ORDER BY k""".stripMargin,
    "q17_drop_rename" ->
      """SELECT p_partkey, p_name AS name, p_brand AS brand, p_size
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q18_select_dtypes" ->
      """SELECT c_custkey, c_nationkey, c_acctbal FROM customer
        |ORDER BY c_custkey""".stripMargin,
    "q19_index_join" ->
      """SELECT o_orderkey, o_totalprice,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |FROM orders LEFT JOIN lineitem ON l_orderkey = o_orderkey
        |GROUP BY o_orderkey, o_totalprice ORDER BY o_orderkey""".stripMargin,
    "q20_null_ops" ->
      """SELECT COUNT(*) AS n_total,
        |CAST(SUM(CASE WHEN value < 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |COUNT(CASE WHEN value < 50 THEN NULL ELSE value END) AS n_after_dropna,
        |CAST(SUM(CAST(CASE WHEN value < 50 THEN -1.0 ELSE value END AS DECIMAL(18,4))) AS DOUBLE) AS sum_filled
        |FROM events""".stripMargin,
    "q21_replace_map" ->
      """SELECT CASE event_type WHEN 'click' THEN 'tap'
        |WHEN 'view' THEN 'impression' ELSE event_type END AS event_type,
        |COUNT(*) AS count FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,
    "q88_replace_regex" ->
      """SELECT c_custkey,
        |REGEXP_REPLACE(c_name, '^Customer#0+', 'C#') AS c_name, c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q22_clip_round_abs" ->
      """SELECT l_orderkey, l_linenumber,
        |LEAST(GREATEST(l_quantity, 5), 45) AS qty_clipped,
        |ROUND(l_extendedprice / 3.0, 2) AS third_price,
        |ABS(-l_discount) + 0 AS neg_disc
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q23_astype" ->
      """SELECT CAST(l_orderkey AS VARCHAR) AS l_orderkey, l_linenumber,
        |CAST(l_quantity AS INTEGER) AS l_quantity
        |FROM lineitem ORDER BY CAST(l_orderkey AS VARCHAR), l_linenumber""".stripMargin,
    "q24_explode" ->
      """SELECT word, COUNT(*) AS n FROM (
        |SELECT UNNEST(STRING_SPLIT(text, ' ')) AS word FROM documents)
        |GROUP BY word ORDER BY word""".stripMargin,
    "q25_apply_expr" ->
      """SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bucket,
        |COUNT(*) AS n,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q26_combine_first" ->
      """SELECT c.c_custkey,
        |COALESCE(a.c_acctbal, -999.0) AS c_acctbal, c.c_mktsegment
        |FROM customer c LEFT JOIN
        |(SELECT c_custkey, c_acctbal FROM customer WHERE c_nationkey < 12) a
        |ON c.c_custkey = a.c_custkey
        |ORDER BY c.c_custkey""".stripMargin,
    "q28_tail" ->
      """SELECT o_orderkey, o_orderdate FROM (
        |SELECT o_orderkey, o_orderdate FROM orders
        |ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 15)
        |ORDER BY o_orderdate, o_orderkey""".stripMargin,
    "q29_time_ops" ->
      """SELECT DATE_TRUNC('day', ts::TIMESTAMP)::TIMESTAMP AS day, COUNT(*) AS n,
        |CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin)
}
