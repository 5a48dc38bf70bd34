package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measure the scan-CSE crossover (DIVERGENCES.md #15): the opt-in
  * `graft.plans.ScanCSE` merge buys N−1 scans at the price of ONE
  * shuffle materialization of the union columns. The claim to test with
  * numbers, not principle: for hot COLUMNAR data two pruned scans beat
  * the shared shuffle (keep the rule off — Spark's default is right),
  * while for PARSE-HEAVY formats (CSV stands in for remote/decode-heavy
  * sources) one parse pass + shuffle beats parsing the file twice.
  *
  * Workload: n ∈ {2,4,6} independently built reads of lineitem, each
  * pruned to ONE disjoint column, aggregated and cross-joined — the
  * heterogeneous-consumer shape Spark's built-in exchange reuse cannot
  * collapse (PlanSpec "ScanCSE (opt-in)"). The consumer count is the
  * crossover axis: default = n input passes, CSE = 1 pass + 1 shuffle.
  * AQE off so the static plan shows the ReusedExchange either way.
  *
  * Run: sbt "runMain graft.BenchScanCSE /tmp/sf1/lineitem.parquet /tmp/sf1_lineitem_csv"
  * Prints one JSON line {<fmt>_n<k>_{default,cse}: sec, ...}.
  */
object BenchScanCSE {
  def main(args: Array[String]): Unit = {
    val Array(parquetPath, csvPath) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.ScanCSE.install(spark)

    // stage the CSV twin once (same rows, parse-heavy encoding)
    if (!new java.io.File(csvPath).exists()) {
      spark.read.parquet(parquetPath)
        .write.option("header", "true").mode("overwrite").csv(csvPath)
      System.err.println(s"[scancse] staged CSV twin at $csvPath")
    }
    val csvSchema = spark.read.parquet(parquetPath).schema

    // n independently built reads, each pruned to ONE distinct column:
    // default plan = n scans (n full parses for CSV); CSE plan = one
    // union-column scan + one shuffle, reused by all n consumers — so
    // the crossover is "n−1 saved input passes vs one materialization"
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_orderkey", "l_partkey")
    def consumers(read: () => DataFrame, n: Int): DataFrame =
      cols.take(n).map(c => read().select(c).groupBy().agg(sum(c).as(s"s_$c")))
        .reduce(_ crossJoin _)
    def parquetRead() = spark.read.parquet(parquetPath)
    def csvRead() = spark.read.option("header", "true")
      .schema(csvSchema).csv(csvPath)

    val reps = math.max(1,
      sys.env.get("SPARK_GRAFT_REPS").flatMap(_.toIntOption).getOrElse(3))
    def time(label: String, cse: Boolean, read: () => DataFrame, n: Int): Double = {
      spark.conf.set(graft.plans.ScanCSE.ConfKey, cse.toString)
      val plan = consumers(read, n).queryExecution.executedPlan.toString
      val scans = "Scan (parquet|csv)".r.findAllIn(plan).length
      val t = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        consumers(read, n).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      spark.conf.set(graft.plans.ScanCSE.ConfKey, "false")
      System.err.println(f"[scancse] $label%-20s scans=$scans t=$t%.3fs")
      t
    }

    val ns = Seq(2, 4, 6)
    val cells = for (n <- ns; (fmt, rd) <- Seq("parquet" -> (parquetRead _),
                                               "csv" -> (csvRead _));
                     cse <- Seq(false, true))
      yield (s"${fmt}_n${n}_" + (if (cse) "cse" else "default")) ->
        time(s"$fmt n=$n ${if (cse) "CSE" else "default"}", cse, rd, n)
    println(cells.map { case (k, v) => f""""$k":$v%.3f""" }
      .mkString(s"""{"metric":"scancse_crossover","unit":"sec","reps":$reps,""",
        ",", "}"))
    spark.stop()
  }
}
