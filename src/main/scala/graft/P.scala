package graft
import graft.engine._
import graft.rules._
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
object P {
  def main(args: Array[String]): Unit = {
    val c = args(0).toInt
    val full = args.length > 1 && args(1) == "full"
    val spark = SparkSession.builder().master(s"local[$c]")
      .config("spark.sql.shuffle.partitions", math.max(c*2,8).toString)
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.local.dir","/dev/shm/spark-local")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val dur = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L))/1000.0
        if (dur > 2.0) println(f"[stage c=$c] id=${si.stageId} tasks=${si.numTasks} dur=$dur%.1fs name=${si.name.take(60)}")
      }
    })
    val store = new SnapshotStore("/tmp/graft-scaling8/state")
    val clips = store.read(spark, "clips"); val tr = store.read(spark, "transcripts"); val ba = store.read(spark, "baseline_clips")
    val cfg = EngineConfig(fullDecodeVerify = full)
    val t0=System.nanoTime()
    val rep = ValidationEngine.run(spark, clips, tr, ba, Rule.standardPack, cfg)
    val v = rep.violations.count()
    println(f"[P c=$c] violations=$v wall=${(System.nanoTime()-t0)/1e9}%.1fs")
    spark.stop()
  }
}
