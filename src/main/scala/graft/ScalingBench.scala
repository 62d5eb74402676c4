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
  * Emits one JSON line per measurement with BOTH a cold (first run in the
  * JVM: JIT + page-cache warmup included) and a steady-state wall time
  * (second run, fresh output store — the engine re-executes fully, only
  * JVM/JIT/page-cache state carries over). The steady state is what
  * extrapolates to a long-running cluster job.
  *
  * Methodology notes (measured on this sandbox, see BENCH/BASELINE.md):
  *  - the corpus must live on /dev/shm: this VM's virtio disk serves cold
  *    reads so slowly (~5× wall-time inflation) that a disk-resident
  *    corpus measures the disk, not the engine — and biases whichever
  *    cell runs first (cold cache) against the rest;
  *  - measurements must run detached from the interactive sandbox shell
  *    (foreground supervision skewed wall times up to 3×);
  *  - report the MIN of repeated, interleaved runs (the VM host shows
  *    sporadic co-tenancy stalls).
  */
object ScalingBench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-scaling-$cpus")
      // FIXED shuffle partitioning across cells: N and 4N executors on a
      // real cluster see the same shuffle partitioning; letting the
      // partition count track the core count would compare two different
      // physical plans (different sort sizes, different AQE coalescing),
      // not two parallelism levels of one job
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_PARTS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.shuffle.file.buffer", "1m")
      .config("spark.shuffle.unsafe.file.output.buffer", "1m")
      .config("spark.io.compression.lz4.blockSize", "512k")
      .config("spark.sql.adaptive.enabled", "true")
      // generated whole-stage methods past 8000 bytecode bytes either run
      // interpreted (default HotSpot) or stall C2 for pathological spans;
      // falling back to non-WSCG keeps every loop compiled, cheaply
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
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
    val cfg = EngineConfig(fullDecodeVerify = profile == "full")
    def onePass(): Double = {
      // fresh output store per pass: the engine re-runs in full (a reused
      // store would checkpoint-resume into a no-op)
      val out = new SnapshotStore(s"$workDir/out-$cpus-${System.nanoTime()}")
      val runner = new CheckpointedRunner(store, out)
      val t0 = System.nanoTime()
      runner.runResumable(spark, snapshotId, Rule.standardPack, cfg).count()
      (System.nanoTime() - t0) / 1e9
    }
    val cold = onePass()   // includes one-time JIT/classloading warmup
    val steady = onePass() // the regime a long-running cluster job sits in
    println(f"""{"cpus":$cpus,"n":$n,"profile":"$profile","cold_s":$cold%.1f,"validate_s":$steady%.1f,"clips_per_sec":${n / steady}%.0f}""")
    spark.stop()
  }
}
