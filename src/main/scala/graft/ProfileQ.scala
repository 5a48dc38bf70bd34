package graft
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Per-stage wall/shuffle profile of named `SparkEntry.queries` entries —
  * the empirical half of the optimization loop (guide §1.1): where does a
  * query's wall time actually go (scan, which exchange, which join), in
  * task-seconds and shuffle bytes, without the UI (disabled in Bench).
  *
  *   sbt "runMain graft.ProfileQ q66_ngram_jaccard [more...]"
  *
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  * SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_REPS (default 2; stats are
  * reported for the LAST rep — steady-state, codegen cache warm).
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.ProfileQ <queryName> [more...]")
    val unknown = args.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.get("SPARK_GRAFT_REPS").flatMap(_.toIntOption).getOrElse(2)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    case class St(name: String, var submitted: Long = 0, var completed: Long = 0,
                  var tasks: Int = 0, var taskTimeMs: Long = 0,
                  var shufReadB: Long = 0, var shufWriteB: Long = 0,
                  var inputB: Long = 0)
    val stages = mutable.LinkedHashMap[Int, St]()
    val jobs = mutable.ArrayBuffer[(Int, Long, Long, String)]() // id, t0, t1, desc
    val jobStart = mutable.Map[Int, (Long, String)]()
    val listener = new SparkListener {
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        stages.synchronized {
          val s = stages.getOrElseUpdate(e.stageInfo.stageId,
            St(e.stageInfo.name.takeWhile(_ != '\n').take(120)))
          s.submitted = System.currentTimeMillis()
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stages.synchronized {
          val s = stages.getOrElseUpdate(e.stageInfo.stageId,
            St(e.stageInfo.name.takeWhile(_ != '\n').take(120)))
          s.completed = System.currentTimeMillis()
          s.tasks = e.stageInfo.numTasks
          val m = e.stageInfo.taskMetrics
          if (m != null) {
            s.taskTimeMs = m.executorRunTime
            s.shufReadB = m.shuffleReadMetrics.totalBytesRead
            s.shufWriteB = m.shuffleWriteMetrics.bytesWritten
            s.inputB = m.inputMetrics.bytesRead
          }
        }
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized {
          jobStart(e.jobId) = (System.currentTimeMillis(),
            Option(e.properties).flatMap(p =>
              Option(p.getProperty("spark.job.description"))).getOrElse(""))
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobStart.remove(e.jobId).foreach { case (t0, d) =>
            jobs += ((e.jobId, t0, System.currentTimeMillis(), d))
          }
        }
    }
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm reps: codegen/classloader/page-cache steady state
      (1 until reps).foreach { _ =>
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        graft.api.Df.releaseRetained(); spark.catalog.clearCache()
      }
      stages.clear(); jobs.clear(); jobStart.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      graft.api.Df.releaseRetained(); spark.catalog.clearCache()
      Thread.sleep(1000) // let the listener bus drain (ScaleProbe convention)
      spark.sparkContext.removeSparkListener(listener)
      println(f"\n==== $name wall=$wall%.3f s (last of $reps reps) ====")
      val base = jobs.map(_._2).minOption.getOrElse(0L)
      println(f"-- jobs: ${jobs.size} (gaps between jobs = driver/planning time)")
      var prevEnd = base
      jobs.sortBy(_._2).foreach { case (id, s, e, _) =>
        val gap = (s - prevEnd) / 1000.0
        println(f"  job $id%3d  +${(s - base) / 1000.0}%6.2f  dur=${(e - s) / 1000.0}%6.3f  gapBefore=$gap%6.3f")
        prevEnd = math.max(prevEnd, e)
      }
      println("-- stages (wall = completed-submitted; taskTime = sum executor run):")
      stages.toSeq.sortBy(_._1).foreach { case (id, s) =>
        if (s.completed > 0)
          println(f"  stage $id%3d  wall=${(s.completed - s.submitted) / 1000.0}%6.3f  " +
            f"tasks=${s.tasks}%3d  taskSec=${s.taskTimeMs / 1000.0}%7.2f  " +
            f"in=${s.inputB / 1e6}%8.2f MB  sr=${s.shufReadB / 1e6}%8.2f MB  " +
            f"sw=${s.shufWriteB / 1e6}%8.2f MB  ${s.name}")
      }
      val stageWall = stages.values.filter(_.completed > 0)
        .map(s => s.completed - s.submitted).sum / 1000.0
      println(f"-- sum stage wall=$stageWall%.3f s vs query wall=$wall%.3f s " +
        f"(difference = driver planning/scheduling/broadcast)")
    }
    spark.stop()
  }
}
