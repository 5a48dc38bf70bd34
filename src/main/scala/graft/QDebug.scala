package graft
import org.apache.spark.sql.SparkSession

/** Scratch diagnostic (r21): print the FINAL adaptive plan of a query
  * after execution — shows ReusedExchange/ReusedQueryStage and whether
  * InMemoryTableScans actually hit. Not part of the query surface. */
object QDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect()
      println(s"\n======== $name FINAL executed plan ========")
      println(df.queryExecution.executedPlan.toString.take(20000))
      graft.api.Df.releaseRetained(); spark.catalog.clearCache()
    }
    spark.stop()
  }
}
