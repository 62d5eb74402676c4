package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: run selected contract queries against an sf dir, print
  * wall time + row count (+ optional formatted plan with -explain).
  *
  * Usage: graft.QRun <sfDir> [-explain] q15_dedup_tokenset q16_ngram_jaccard ...
  */
object QRun {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val explain = args.contains("-explain")
    val names = args.tail.filterNot(_.startsWith("-"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIR", "/dev/shm/spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val verbose = args.contains("-jobs")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val t0 = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        t0.put(j.jobId, System.nanoTime())
        if (verbose) {
          val d = Option(j.properties).map(_.getProperty("spark.job.description")).getOrElse("")
          println(f"[job-start] ${j.jobId}%3d stages=${j.stageIds.size} ${String.valueOf(d).take(110)}")
        }
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        if (verbose) {
          val ms = (System.nanoTime() - t0.getOrDefault(j.jobId, System.nanoTime())) / 1e6
          println(f"[job-end]   ${j.jobId}%3d ${ms}%8.0f ms")
        }
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        if (verbose) {
          val si = s.stageInfo
          val dur = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1000.0
          val run = si.taskMetrics.executorRunTime / 1000.0
          println(f"[stage] id=${si.stageId}%3d tasks=${si.numTasks}%-4d wall=$dur%6.2fs cpu=$run%7.2fs ${si.name.take(80)}")
        }
      }
    })
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // mirror Bench's draw semantics for the engine queries: drop the
      // memoized report so a repeated q28 actually re-runs the engine
      // (warm-JVM draws are otherwise memo reads and time nothing)
      if (name == "q28_clips_verdicts") SparkEntry.releaseReport(sfDir)
      val j0 = jobs.get(); val s0 = stages.get()
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      if (explain) df.explain("formatted")
      val n = df.count()
      val w = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.ListenerBusFlush.flush(spark.sparkContext)
      println(f"[qrun] $name rows=$n wall=$w%.2fs jobs=${jobs.get() - j0} stages=${stages.get() - s0}")
    }
    spark.stop()
  }
}
