package graft
import graft.engine._
import graft.rules._
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
/** Dev profiler: stage-level wall times for one engine run over a prepped
  * SnapshotStore corpus. Usage: graft.Prof <cpus> <workDir> [fast|full] */
object Prof {
  def main(args: Array[String]): Unit = {
    val c = args(0).toInt
    val work = args(1)
    val full = args.length > 2 && args(2) == "full"
    val spark = SparkSession.builder().master(s"local[$c]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_PARTS", math.max(c * 2, 8).toString))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.shuffle.file.buffer", "1m")
      .config("spark.shuffle.unsafe.file.output.buffer", "1m")
      .config("spark.io.compression.lz4.blockSize", "512k")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIR", "/dev/shm/spark-local"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val acc = new java.util.concurrent.ConcurrentHashMap[Int, (Int, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val dur = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1000.0
        val scopes = si.rddInfos.flatMap(_.scope).map(_.name).distinct.mkString(">")
        acc.put(si.stageId, (si.numTasks, dur, scopes.take(160)))
      }
    })
    val store = new SnapshotStore(s"$work/state")
    val clips = store.read(spark, "clips")
    val tr = store.read(spark, "transcripts")
    val ba = store.read(spark, "baseline_clips")
    val cfg = EngineConfig(fullDecodeVerify = full)
    val t0 = System.nanoTime()
    val rep = ValidationEngine.run(spark, clips, tr, ba, Rule.standardPack, cfg)
    val v = rep.violations.count()
    val tViol = (System.nanoTime() - t0) / 1e9
    val g = rep.verdicts.count()
    val tAll = (System.nanoTime() - t0) / 1e9
    println(f"[prof c=$c full=$full] violations=$v verdicts=$g tViol=$tViol%.1f tAll=$tAll%.1f")
    import scala.jdk.CollectionConverters._
    acc.asScala.toSeq.sortBy(-_._2._2).take(20).foreach { case (id, (nt, dur, name)) =>
      println(f"[prof-stage] $dur%7.1fs tasks=$nt%-4d id=$id $name")
    }
    spark.stop()
  }
}
