package graft
import org.apache.spark.sql.SparkSession
/** Dev helper: materialize the synthetic corpus for the DuckDB oracle
  * (same write Verify performs) without running the full query suite.
  * Usage: graft.OracleDump <sfDir> */
object OracleDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.synth.ClipSynth.writeAll(spark,
      s"/root/repo/target/oracle/${new java.io.File(sfDir).getName}",
      SparkEntry.clipsN(sfDir))
    println("[oracle-dump] done")
    spark.stop()
  }
}
