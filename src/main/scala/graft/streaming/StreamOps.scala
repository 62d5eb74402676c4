package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    * real streaming query (AvailableNow trigger, memory sink): hourly
    * count + exact-decimal sum per event type. Returns the completed
    * result table. */
  def hourlyEventCounts(spark: SparkSession, eventsPath: String): DataFrame = {
    val name = "graft_stream_" + math.abs(eventsPath.hashCode)
    // readStream needs a directory: point at the parent with a glob filter
    // when given a single file path
    val (dir, filter) = {
      val f = new java.io.File(eventsPath)
      if (f.isFile) (f.getParent, f.getName) else (eventsPath, "*")
    }
    val stream = spark.readStream.schema(eventsSchema)
      .option("pathGlobFilter", filter).parquet(dir)
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(27,10)")).as("_sv"))
      .select(col("w.start").as("hour_start"), col("event_type"), col("n"),
        col("_sv").cast("double").as("sum_value"))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
