package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata, and decode/feature-extraction runs
  * per-partition in batches (the Scala analog of `mapInPandas` batch UDFs).
  *
  * The actual media decode is STUBBED — this container has no image/audio
  * decoding libraries — with a deterministic fake that derives features
  * from the raw bytes. The Spark-side plumbing (schema, partition-parallel
  * batched iteration, binary column handling) is real and tested; swapping
  * `decodeStub` for a JNI/ffmpeg call changes nothing structurally. */
object Multimodal {

  final case class MediaFeatures(doc_id: Long, byte_len: Long, n_frames: Long, checksum: Long)

  /** STUB decode: real systems would decode the container format here.
    * Deterministic stand-in: frame size 256 bytes, checksum = sum of bytes. */
  def decodeStub(id: Long, bytes: Array[Byte]): MediaFeatures = {
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xFF; i += 1 }
    MediaFeatures(id, bytes.length.toLong, (bytes.length + 255L) / 256L, sum)
  }

  /** Batched per-partition feature extraction over (id, binary) rows.
    * Iterator-to-iterator (no partition materialization), so it streams at
    * any partition size — the batch shape a Pandas-UDF pipeline would use. */
  def extractFeatures(spark: SparkSession, media: DataFrame,
      idCol: String, binCol: String): DataFrame = {
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeStub(id, bytes) })
      .toDF()
  }
}
