package graft

import graft.audio.Audio
import org.apache.spark.sql.SparkSession

/** CPU-kernel scaling measurement: the audio decode + SNR compute kernel
  * (the per-row invariant's inner loop) over deterministically synthesized
  * in-task payloads — no shuffle, no scan, no disk. Isolates thread
  * scaling of the engine's compute path from the single-box DRAM-bandwidth
  * ceiling that dominates the scan/shuffle-heavy stages (see
  * BENCH/BASELINE.md methodology).
  *
  * Usage: graft.KernelBench <cpus> [nRows]
  */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val c = args(0).toInt
    val n = args.drop(1).headOption.map(_.toLong).getOrElse(400000L)
    val spark = SparkSession.builder().master(s"local[$c]")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIR", "/dev/shm/spark-local")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val t0 = System.nanoTime()
    // per row: synth PCM, encode ulaw, decode, SNR vs original — the full
    // payload-validation kernel, all inside the task
    val bad = spark.range(0, n, 1, c * 4).mapPartitions(_.map { i =>
      val key = Audio.clipKey(f"clip-$i%012d")
      val pcm = Audio.synthPcm(key, 768, 8000)
      val enc = Audio.encode("ulaw", pcm)
      val dec = Audio.decode("ulaw", enc)
      if (Audio.snrDb(pcm, dec) < 30.0) 1L else 0L
    }).reduce(_ + _)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"""{"kernel":"decode_snr","cpus":$c,"n":$n,"wall_s":$secs%.1f,"rows_per_sec":${n / secs}%.0f,"below_gate":$bad}""")
    spark.stop()
  }
}
