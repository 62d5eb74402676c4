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
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIR", "/dev/shm/spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      if (explain) df.explain("formatted")
      val n = df.count()
      println(f"[qrun] $name rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
