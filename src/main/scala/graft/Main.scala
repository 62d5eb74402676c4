package graft

import graft.engine.{CheckpointedRunner, EngineConfig, SnapshotStore}
import graft.rules.Rule
import graft.synth.ClipSynth
import org.apache.spark.sql.SparkSession

/** spark-submit entry point: synthesize (or reuse) the snapshot-versioned
  * clips corpus, run the standard rule pack resumably, print the verdict
  * summary. Running it twice demonstrates checkpoint resume (second run is
  * a no-op — every partition's lineage row already exists).
  *
  * Usage: graft.Main [workDir] [nRows] [--fresh]
  */
object Main {
  def main(args: Array[String]): Unit = {
    val workDir = args.headOption.getOrElse("/tmp/graft-demo")
    val n = args.drop(1).headOption.map(_.toLong).getOrElse(100000L)
    val fresh = args.contains("--fresh")

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]"))
      .appName("graft-validation-engine")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // clustered snapshots are one-file-per-bucket sorted by clip_id;
      // trusting that lets the co-located diff join plan sort-free
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIR", "/dev/shm/spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (fresh) {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(workDir)).deleteRecursively()
    }

    val store = new SnapshotStore(s"$workDir/state")
    val outStore = new SnapshotStore(s"$workDir/out")

    // snapshot 0 = baseline-ish tables; clips appended as snapshot-pinned input
    // SPARK_GRAFT_BUCKETS > 0 (default 64): hash-cluster the corpus by
    // clip_id (Iceberg bucket-partition emulation) so the payload diff join
    // runs exchange-free; 0 = legacy unclustered layout.
    val buckets = sys.env.getOrElse("SPARK_GRAFT_BUCKETS", "64").toInt
    if (!store.exists("clips")) {
      println(s"[main] synthesizing corpus n=$n under $workDir (buckets=$buckets) ...")
      def put(t: String, df: org.apache.spark.sql.DataFrame): Unit =
        if (buckets > 0) store.appendClustered(t, df, "clip_id", buckets)
        else store.append(t, df)
      put("baseline_clips", ClipSynth.baseline(spark, n).toDF())
      put("transcripts", ClipSynth.transcripts(spark, n).toDF())
      put("clips", ClipSynth.clips(spark, n).toDF())
    } else println(s"[main] reusing corpus under $workDir")

    val snapshotId = store.currentSnapshotId("clips").get
    val runner = new CheckpointedRunner(store, outStore)
    val done = runner.donePartitions(spark, snapshotId)
    println(s"[main] snapshot=$snapshotId alreadyDone=${done.mkString(",")}")

    val t0 = System.nanoTime()
    val lineage = runner.runResumable(spark, snapshotId, Rule.standardPack, EngineConfig())
    val rows = lineage.collect()
    val secs = (System.nanoTime() - t0) / 1e9
    if (rows.length == done.size) println(s"[main] resume no-op: all partitions checkpointed for snapshot $snapshotId")
    else {
      println(f"[main] validated snapshot $snapshotId in $secs%.1fs (${n / secs}%.0f clips/s)")
      println("[main] lineage:")
      rows.foreach(r => println(s"  $r"))
      println("[main] verdicts:")
      outStore.read(spark, runner.VerdictsTable)
        .filter(org.apache.spark.sql.functions.col("snapshot_id") === snapshotId)
        .orderBy("partition_values", "rule_id")
        .collect().foreach(r => println(s"  $r"))
      val vio = outStore.read(spark, runner.ViolationsTable)
      println(s"[main] total violations: ${vio.count()}")
      vio.groupBy("rule_id").count().orderBy("rule_id").collect()
        .foreach(r => println(s"  $r"))
    }
    spark.stop()
  }
}
