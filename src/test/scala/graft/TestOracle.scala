package graft

import graft.audio.Audio
import graft.model.ClipRecord
import graft.synth.ClipSynth

/** Plain-Scala re-derivation of the expected engine outputs at small n —
  * the hand-computable oracle for EngineSpec (reference analog: the
  * mock-based behavioral assertions in
  * SourceSystemDataCheckerServiceTest.java, SURVEY.md §5). */
object TestOracle {

  final case class Expected(
      events: Seq[ClipRecord],                  // after exact-dup removal
      nullSrRows: Seq[String],
      nullTranscriptRows: Seq[String],
      oobRows: Seq[(String, Int)],
      dupKeys: Map[String, Long],               // multiplicity > 1
      missingTranscriptRows: Seq[String],       // one per event row
      orphanTranscriptKeys: Set[String],        // distinct parent keys
      outcomes: Map[String, Long]               // new/changed/unchanged row counts
  )

  private def rowKey(r: ClipRecord): String =
    s"${r.clip_id}|${r.sr_hz}|${r.dur_ms}|${r.codec}|${r.transcript}|${java.util.Arrays.hashCode(r.bytes)}"

  def expected(n: Int): Expected = {
    val raw = (0 until n).map(i => ClipSynth.currentRow(i.toLong))
    // exact dedup on full row equality
    val events = raw.groupBy(rowKey).map(_._2.head).toSeq

    val transcriptIds: Set[String] =
      (0 until n).filter(i => ClipSynth.hasTranscriptRow(i.toLong))
        .map(i => ClipSynth.clipId(i.toLong)).toSet ++
        (0L until math.max(1L, n / 1000L)).map(j => f"orphan-$j%09d").toSet

    val baselineById: Map[String, ClipRecord] =
      (0 until n).filter(i => ClipSynth.inBaseline(i.toLong))
        .map(i => ClipSynth.baselineRow(i.toLong))
        .map(r => r.clip_id -> r).toMap

    val outcomes = events.map { r =>
      baselineById.get(r.clip_id) match {
        case None => "new"
        case Some(b) =>
          val pcmOk = Audio.pcmAllclose(r.codec, b.bytes, r.bytes)
          val trOk = r.transcript == b.transcript
          if (pcmOk && trOk) "unchanged" else "changed"
      }
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

    Expected(
      events = events,
      nullSrRows = events.filter(_.sr_hz == null).map(_.clip_id),
      nullTranscriptRows = events.filter(_.transcript == null).map(_.clip_id),
      oobRows = events.filter(r => r.dur_ms < 200 || r.dur_ms > 30000).map(r => (r.clip_id, r.dur_ms.toInt)),
      dupKeys = events.groupBy(_.clip_id).collect { case (k, v) if v.size > 1 => k -> v.size.toLong },
      missingTranscriptRows = events.filter(r => !transcriptIds.contains(r.clip_id)).map(_.clip_id),
      orphanTranscriptKeys = transcriptIds -- events.map(_.clip_id).toSet,
      outcomes = outcomes
    )
  }
}
