package graft.synth

import graft.audio.Audio
import graft.model.{ClipRecord, TranscriptRow}
import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic synthetic corpus: the `clips` table (current snapshot), the
  * `baseline_clips` table (stored state — the analog of the reference's
  * Postgres `digital_specimen` table, src/test/resources/db/migration/
  * V1__init_db.sql:1-27), and the `transcripts` referential companion.
  *
  * Every field is a pure function of the row index `i` (seed 42, values keyed
  * by clip_id via SplitMix64) so any executor can re-derive any row and the
  * whole corpus is bit-stable across runs, partitionings, and parallelism
  * levels. Planted violations live at fixed residues of `i` (see FIXTURES.md
  * §3), so exact expected outputs are computable by hand:
  *
  *   i %  400 ==  13  → null sr_hz                  (null-rate rule)
  *   i %  400 == 213  → null transcript             (null-rate + changed)
  *   i %  500 ==  77  → dur_ms out of [200, 30000]  (min/max rule)
  *   i % 1000 == 999  → clip_id duplicates i-1's id, different payload
  *                      (uniqueness rule; reference: toMap duplicate-key
  *                       throw, SourceSystemDataCheckerService.java:42-45)
  *   i % 2000 == 1499 → exact full-row duplicate of i-1 (input dedup S4,
  *                      RabbitMqConsumerService.java:27 — removed BEFORE rules)
  *   i %  333 == 111  → clip with no transcript row  (referential)
  *   i %  250 ==  99  → absent from baseline ⇒ outcome "new"
  *   i %  500 == 177  → corrupted bytes vs baseline ⇒ SNR<30 ⇒ "changed"
  *   i %  500 == 277  → transcript differs vs baseline ⇒ "changed"
  *   codec == "alaw"  → current dur_ms = 1.2 × baseline dur_ms (drift rule)
  *
  * `dur_ms` is metadata (validated by range/drift rules) deliberately
  * decoupled from the actual sample count in `bytes` (validated by
  * PCM-allclose) so payload size stays bounded at any scale.
  *
  * codec distribution is skewed ≈80% pcm_s16le / 10% ulaw / 10% alaw to
  * exercise AQE skew handling + salting on the hot partition.
  */
object ClipSynth {
  val Seed = 42L
  val SynthRateHz = 8000 // synthesis rate for bytes; decoupled from sr_hz metadata
  val SrChoices: Array[Int] = Array(8000, 16000, 22050, 44100, 48000)

  private val Words: Array[String] = {
    // fixed 256-word list, generated from a seeded alphabet walk (no external data)
    (0 until 256).map { k =>
      val key = Audio.splitmix64(Seed ^ (k * 0x9E3779B97F4A7C15L))
      val len = 3 + (Audio.draw(key, 0) & 5).toInt
      val sb = new StringBuilder
      var j = 0
      while (j < len) { sb.append(('a' + (Audio.draw(key, j + 1) % 26 + 26) % 26).toChar); j += 1 }
      sb.toString
    }.toArray
  }

  def clipId(i: Long): String = f"clip-$i%012d"

  def codecOf(i: Long): String = (i % 10) match {
    case 8 => "ulaw"
    case 9 => "alaw"
    case _ => "pcm_s16le"
  }

  def transcriptOf(key: Long): String = {
    val n = 3 + (Audio.draw(key, 30) & 7).toInt
    val sb = new StringBuilder
    var j = 0
    while (j < n) {
      if (j > 0) sb.append(' ')
      sb.append(Words(((Audio.draw(key, 31 + j) % 256 + 256) % 256).toInt))
      j += 1
    }
    sb.toString
  }

  private def durBase(key: Long): Int = 200 + (Audio.unit(key, 8) * 1800.0).toInt

  private def cleanBytes(key: Long, codec: String): Array[Byte] = {
    val nSamples = 512 + (Audio.draw(key, 9) & 511).toInt
    Audio.encode(codec, Audio.synthPcm(key, nSamples, SynthRateHz))
  }

  private def corrupt(bytes: Array[Byte]): Array[Byte] = {
    val b = bytes.clone()
    val start = b.length / 4
    var j = start
    val end = math.min(b.length, start + 128)
    while (j < end) { b(j) = (b(j) ^ 0x5A).toByte; j += 1 }
    b
  }

  /** The row the baseline (stored state) holds for index i — always clean. */
  def baselineRow(i: Long): ClipRecord = {
    val id = clipId(i)
    val key = Audio.clipKey(id)
    val codec = codecOf(i)
    ClipRecord(
      clip_id = id,
      bytes = cleanBytes(key, codec),
      sr_hz = SrChoices(((Audio.draw(key, 7) % 5 + 5) % 5).toInt),
      dur_ms = durBase(key),
      codec = codec,
      transcript = transcriptOf(key)
    )
  }

  /** The row the current snapshot holds for index i — with planted faults. */
  def currentRow(i: Long): ClipRecord = {
    if (i % 2000 == 1499) return currentRow(i - 1) // exact duplicate event
    val base = baselineRow(i)
    val key = Audio.clipKey(base.clip_id)
    val dupId = i % 1000 == 999 // same id as i-1, different payload
    val id = if (dupId) clipId(i - 1) else base.clip_id
    val sr: Integer = if (i % 400 == 13) null else base.sr_hz
    val dur: Int =
      if (i % 500 == 77) { if (i % 1000 == 77) 50 else 45000 }
      else if (base.codec == "alaw") (base.dur_ms * 1.2).toInt // drifted partition
      else base.dur_ms
    val bytes = if (i % 500 == 177) corrupt(base.bytes) else base.bytes
    val transcript: String =
      if (i % 400 == 213) null
      else if (i % 500 == 277) base.transcript + " changed"
      else base.transcript
    ClipRecord(id, bytes, sr, dur, base.codec, transcript)
  }

  def inBaseline(i: Long): Boolean =
    i % 250 != 99 && i % 1000 != 999 && i % 2000 != 1499

  def hasTranscriptRow(i: Long): Boolean = i % 333 != 111

  // ------------------------------------------------------- Spark datasets

  /** Current snapshot, n rows (indices 0..n-1, including planted dups). */
  def clips(spark: SparkSession, n: Long): Dataset[ClipRecord] = {
    import spark.implicits._
    spark.range(0, n, 1, spark.sparkContext.defaultParallelism)
      .mapPartitions(_.map(i => currentRow(i)))
  }

  /** Stored baseline snapshot (the "current version" table the reference
    * queries per batch, repository/SpecimenRepository.java:26-33). */
  def baseline(spark: SparkSession, n: Long): Dataset[ClipRecord] = {
    import spark.implicits._
    spark.range(0, n, 1, spark.sparkContext.defaultParallelism)
      .filter(i => inBaseline(i))
      .mapPartitions(_.map(i => baselineRow(i)))
  }

  /** Referential companion: one transcript row per current clip except the
    * planted missing ones, plus orphan rows with no matching clip. */
  def transcripts(spark: SparkSession, n: Long): Dataset[TranscriptRow] = {
    import spark.implicits._
    val present = spark.range(0, n, 1, spark.sparkContext.defaultParallelism)
      .filter(i => hasTranscriptRow(i))
      .mapPartitions(_.map { i =>
        val id = clipId(i)
        TranscriptRow(id, transcriptOf(Audio.clipKey(id)))
      })
    val orphans = spark.range(0, math.max(1L, n / 1000), 1, 1)
      .mapPartitions(_.map { j =>
        val id = f"orphan-$j%09d"
        TranscriptRow(id, transcriptOf(Audio.clipKey(id)))
      })
    present.union(orphans)
  }

  /** Idempotent materialization: writes clips/baseline/transcripts parquet
    * (clips partitioned by the skewed `codec` column — the stand-in for an
    * Iceberg partition spec) once per (dir, n); marker file keyed by n. */
  def writeAll(spark: SparkSession, dir: String, n: Long): Unit = {
    val marker = new java.io.File(s"$dir/_SYNTH_OK_$n")
    if (marker.exists()) return
    clips(spark, n).write.mode("overwrite").partitionBy("codec").parquet(s"$dir/clips")
    baseline(spark, n).write.mode("overwrite").partitionBy("codec").parquet(s"$dir/baseline_clips")
    transcripts(spark, n).write.mode("overwrite").parquet(s"$dir/transcripts")
    new java.io.File(dir).mkdirs()
    marker.createNewFile()
    ()
  }
}
