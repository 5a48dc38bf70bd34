package graft

import org.apache.spark.sql.SparkSession

/** Driver-coordination scaling probe: runs the protocol-heavy queries
  * (grouped order-statistic quantiles, chained GroupedScan, rolling
  * scan) at a given sf dir and partition count, and reports the
  * MEASURED driver-side protocol state next to the wall time — the
  * datapoints behind the O(partitions × groups) ceiling formulas in
  * the GroupedScan / Quantiles scaladocs (BENCHLOG round 16).
  *
  * Env: SPARK_GRAFT_SF_DIR (data), SPARK_GRAFT_CPUS (local[N], default
  * 32), SPARK_GRAFT_PARTS (spark.sql.shuffle.partitions — vary this to
  * scale the protocols' partition axis without scaling the data),
  * SPARK_GRAFT_REPS (min-of-reps, default 2).
  *
  * Prints one JSON line per query:
  * {"query":…,"sec":…,"parts":N,
  *  "scan":{"partitions":P,"summaries":S,"bytes":B},
  *  "quantiles":{"partitions":P,"entries":E,"bytes":B}}
  * where `bytes` is the java-serialized size of the collected driver
  * state (the same order as what collect() shipped). */
object BenchDriverCoord {
  def main(args: Array[String]): Unit = {
    System.setProperty("graft.protocolFootprint", "true")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = sys.env.get("SPARK_GRAFT_PARTS")
      .map(p => p.trim.toIntOption.getOrElse(
        throw new IllegalArgumentException(
          s"SPARK_GRAFT_PARTS must be an int: '$p'")))
      .getOrElse(cpus.trim.toIntOption.getOrElse(32))
    val reps = math.max(1,
      sys.env.get("SPARK_GRAFT_REPS").flatMap(_.toIntOption).getOrElse(2))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet").count() // warm readers

    val names = Seq("q54_quantiles", "q247_group_transforms",
      "q264_scan_rolling", "q268_scan_batch")
    import graft.operators.ProtocolFootprint
    names.foreach { name =>
      var scanFp: Option[(Int, Int, Long)] = None
      var qFp: Option[(Int, Int, Long)] = None
      val sec = (1 to reps).map { _ =>
        ProtocolFootprint.lastGroupedScan = None
        ProtocolFootprint.lastQuantiles = None
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        // footprints are identical across reps (same plan, same data) —
        // keep the last non-empty
        if (ProtocolFootprint.lastGroupedScan.isDefined)
          scanFp = ProtocolFootprint.lastGroupedScan
        if (ProtocolFootprint.lastQuantiles.isDefined)
          qFp = ProtocolFootprint.lastQuantiles
        graft.api.Df.releaseRetained()
        spark.catalog.clearCache()
        t
      }.min
      def j(fp: Option[(Int, Int, Long)], k2: String) = fp match {
        case Some((p, e, b)) =>
          s"""{"partitions":$p,"$k2":$e,"bytes":$b}"""
        case None => "null"
      }
      println(s"""{"query":"$name","sec":$sec,"parts":$parts,""" +
        s""""scan":${j(scanFp, "summaries")},""" +
        s""""quantiles":${j(qFp, "entries")}}""")
    }
    spark.stop()
  }
}
