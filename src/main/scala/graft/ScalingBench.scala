package graft

import graft.engine.{CheckpointedRunner, EngineConfig, SnapshotStore}
import graft.rules.Rule
import graft.synth.ClipSynth
import org.apache.spark.sql.SparkSession

/** One scaling measurement per JVM invocation (separate JVMs keep JIT, GC
  * history and block-manager state from contaminating the comparison).
  * `tools/run_scaling.sh` orchestrates prep + the level matrix and
  * assembles BENCH/BASELINE.md.
  *
  * Usage: graft.ScalingBench prep [nRows] [workDir]
  *        graft.ScalingBench <cpus> [nRows] [workDir] [fast|full]
  * Emits one JSON line per measurement.
  *
  * Methodology notes (measured on this sandbox, see BENCH/BASELINE.md):
  *  - the default hash-first diff path is memory-bandwidth-bound; on a
  *    single box extra threads saturate DRAM, so thread-scaling is
  *    evidenced on the CPU-weighted full-decode profile (every matched row
  *    decodes + SNR-compares), which is also the north rule's per-row
  *    invariant evaluated literally;
  *  - measurements must run detached from the interactive sandbox shell
  *    (foreground supervision skewed wall times up to 3×);
  *  - report the MIN of repeated runs (the VM host shows sporadic
  *    co-tenancy stalls).
  */
object ScalingBench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-scaling-$cpus")
      .config("spark.sql.shuffle.partitions", math.max(cpus * 2, 8).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIR", "/dev/shm/spark-local"))
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("prep")
    val n = args.drop(1).headOption.map(_.toLong).getOrElse(800000L)
    val workDir = args.drop(2).headOption.getOrElse("/tmp/graft-scaling8")
    val profile = args.drop(3).headOption.getOrElse("full")
    val store = new SnapshotStore(s"$workDir/state")

    if (mode == "prep") {
      val spark = session(32)
      if (!store.exists("clips")) {
        store.append("baseline_clips", ClipSynth.baseline(spark, n).toDF())
        store.append("transcripts", ClipSynth.transcripts(spark, n).toDF())
        store.append("clips", ClipSynth.clips(spark, n).toDF())
      }
      println(s"""{"prep":"ok","n":$n}""")
      spark.stop()
      return
    }

    val cpus = mode.toInt
    val spark = session(cpus)
    val snapshotId = store.currentSnapshotId("clips").get
    val out = new SnapshotStore(s"$workDir/out-$cpus-${System.nanoTime()}")
    val runner = new CheckpointedRunner(store, out)
    val cfg = EngineConfig(fullDecodeVerify = profile == "full")
    val t0 = System.nanoTime()
    runner.runResumable(spark, snapshotId, Rule.standardPack, cfg).count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"""{"cpus":$cpus,"n":$n,"profile":"$profile","validate_s":$secs%.1f,"clips_per_sec":${n / secs}%.0f}""")
    spark.stop()
  }
}
