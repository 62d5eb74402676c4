package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured Streaming surface. The reference is a continuously running
  * micro-batch consumer with externalized state (SURVEY.md §2 "Streaming");
  * the engine's batch logic is reused verbatim inside streaming via
  * `foreachBatch`/`Trigger.AvailableNow` — same plan, incremental input. */
object StreamOps {

  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Tumbling-window aggregation over the events table driven through a
    * real streaming query: hourly count + exact-decimal sum per event type.
    *
    * Sink design (scale path): watermark + `update` output mode, each
    * micro-batch's changed aggregates appended DISTRIBUTED (executor-side
    * parquet writes via foreachBatch, batch-id-stamped) — the driver never
    * holds the result table, unlike a memory/complete sink which re-emits
    * and accumulates the whole table on the driver every batch. The final
    * state of each window is the row from the highest batch that updated
    * it (last-writer-wins upsert, resolved by one latest-per-key pass on
    * read — the same merge an Iceberg MERGE INTO sink would do). */
  def hourlyEventCounts(spark: SparkSession, eventsPath: String,
      statePartitions: Option[Int] = None, sinkDir: Option[String] = None): DataFrame = {
    // readStream needs a directory: point at the parent with a glob filter
    // when given a single file path
    val (dir, filter) = {
      val f = new java.io.File(eventsPath)
      if (f.isFile) (f.getParent, f.getName) else (eventsPath, "*")
    }
    // Scratch root for the temp sink AND the stream's checkpoint: prefer
    // the session's spark.local.dir (the bench points it at tmpfs) over
    // java.io.tmpdir — the micro-batch machinery commits many small files
    // (state store deltas, offset/commit logs, sink parquet), and on a box
    // whose /tmp is disk-backed those fsync-heavy writes were pure I/O
    // latency on the timed path.
    val scratchRoot = {
      val local = spark.sparkContext.getConf
        .get("spark.local.dir", System.getProperty("java.io.tmpdir"))
        .split(",").head
      val p = java.nio.file.Paths.get(local)
      if (java.nio.file.Files.isDirectory(p)) p
      else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    }
    // Sink location: on any multi-node deployment pass `sinkDir` on a
    // SHARED filesystem (DFS/object store) — executor tasks write there and
    // the driver-side read sees all of it. The temp-dir default only works
    // where driver and executors share a filesystem (local mode); it is
    // deleted after the result is materialized below.
    val outDir = sinkDir.getOrElse(
      java.nio.file.Files.createTempDirectory(scratchRoot, "graft-stream-sink").toString)
    // Query-scoped confs via an ISOLATED child session (same SparkContext,
    // own SQLConf): the stream's settings never touch the caller's session,
    // so concurrent streaming queries on one session can each size their
    // own state stores (the earlier mutate-then-restore pattern raced).
    val ss = spark.newSession()
    // streaming has no AQE: the state-store partition count is pinned at
    // query start, and EVERY micro-batch pays a fixed open/commit cost per
    // state partition — size it to the state key cardinality, not to the
    // session's scan parallelism
    statePartitions.foreach(p => ss.conf.set("spark.sql.shuffle.partitions", p.toString))
    // update-mode emission is complete after the last data batch; the
    // trailing no-data micro-batch only advances the watermark to evict
    // state, so skip it for a run-to-completion (AvailableNow) pass
    ss.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    // checkpoint on the scratch root too (the implicit temp checkpoint
    // would land under java.io.tmpdir); a run-to-completion pass does not
    // resume, so it is deleted with the sink below. Each query gets its
    // own UUID subdir, so concurrent streams don't collide.
    val ckptDir = java.nio.file.Files.createTempDirectory(scratchRoot, "graft-stream-ckpt")
    ss.conf.set("spark.sql.streaming.checkpointLocation", ckptDir.toString)
    val stream = ss.readStream.schema(eventsSchema)
      .option("pathGlobFilter", filter).parquet(dir)
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(27,10)")).as("_sv"))
      .select(col("w.start").as("hour_start"), col("event_type"), col("n"),
        col("_sv").cast("double").as("sum_value"))
    val q = agg.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.withColumn("_batch", lit(batchId))
          .write.mode("append").parquet(outDir)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // upsert resolution: latest batch wins per (window, event_type)
    val w = Window.partitionBy(col("hour_start"), col("event_type"))
      .orderBy(col("_batch").desc)
    val resolved = spark.read.parquet(outDir)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_batch")
    if (sinkDir.isDefined) {
      deleteRecursively(ckptDir) // run-to-completion: nothing to resume
      resolved // caller owns a shared sink dir
    } else {
      // temp-dir sink: materialize (result = aggregated windows, small) so
      // the scratch dirs can be deleted instead of leaking per call
      val out = resolved.localCheckpoint(true)
      deleteRecursively(java.nio.file.Paths.get(outDir))
      deleteRecursively(ckptDir)
      out
    }
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(p)) {
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
