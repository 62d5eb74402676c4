package graft

import graft.audio.Audio
import org.scalatest.funsuite.AnyFunSuite

class AudioSpec extends AnyFunSuite {

  test("synthPcm is deterministic and independent of call order") {
    val a = Audio.synthPcm(Audio.clipKey("clip-000000000007"), 1024, 8000)
    val b = Audio.synthPcm(Audio.clipKey("clip-000000000007"), 1024, 8000)
    assert(a.toSeq == b.toSeq)
  }

  test("pcm_s16le roundtrip is exact") {
    val pcm = Audio.synthPcm(123L, 800, 8000)
    val dec = Audio.decode("pcm_s16le", Audio.encode("pcm_s16le", pcm))
    assert(dec.toSeq == pcm.toSeq)
  }

  test("ulaw/alaw roundtrip SNR is above the 30 dB gate") {
    for (codec <- Seq("ulaw", "alaw"); key <- 1L to 20L) {
      val pcm = Audio.synthPcm(key, 1000, 8000)
      val dec = Audio.decode(codec, Audio.encode(codec, pcm))
      val snr = Audio.snrDb(pcm, dec)
      assert(snr > 30.0, s"$codec roundtrip snr=$snr")
    }
  }

  test("g711 codecs roundtrip every 16-bit sample to within quantization error") {
    var v = Short.MinValue.toInt
    while (v <= Short.MaxValue.toInt) { // exhaustive: all 65536 samples
      val s = v.toShort
      val u = Audio.ulawToLinear(Audio.linearToUlaw(s))
      val a = Audio.alawToLinear(Audio.linearToAlaw(s))
      // error bounded by segment step size (≤ 2^(exp+3) ≈ |s|/16 + bias)
      assert(math.abs(u - s) <= math.max(64, math.abs(s.toInt) / 8), s"ulaw $s -> $u")
      assert(math.abs(a - s) <= math.max(64, math.abs(s.toInt) / 8), s"alaw $s -> $a")
      v += 1
    }
  }

  test("snr of identical signals is +inf, of corrupted is finite and low") {
    val pcm = Audio.synthPcm(9L, 1000, 8000)
    assert(Audio.snrDb(pcm, pcm).isPosInfinity)
    val bad = pcm.clone()
    for (i <- 200 until 400) bad(i) = (-bad(i)).toShort
    assert(Audio.snrDb(pcm, bad) < 30.0)
  }

  test("pcmAllclose: equal bytes fast-path true; corrupted frame false") {
    val pcm = Audio.synthPcm(11L, 900, 8000)
    val enc = Audio.encode("ulaw", pcm)
    assert(Audio.pcmAllclose("ulaw", enc, enc.clone()))
    val bad = enc.clone()
    for (i <- 100 until 300) bad(i) = (bad(i) ^ 0x5A).toByte
    assert(!Audio.pcmAllclose("ulaw", enc, bad))
  }

  test("length mismatch counts the tail as error") {
    val pcm = Audio.synthPcm(13L, 1000, 8000)
    val enc = Audio.encode("pcm_s16le", pcm)
    assert(!Audio.pcmAllclose("pcm_s16le", enc, enc.take(1000)))
  }

  test("fused snrDbCoded is bit-identical to snrDb over materialized decodes") {
    for {
      codec <- Audio.Codecs
      seed <- Seq(1L, 42L, 987654321L)
      (nA, nB) <- Seq((512, 512), (512, 300), (300, 512), (0, 64), (64, 0), (7, 7))
    } {
      val a = Audio.encode(codec, Audio.synthPcm(seed, nA, 8000))
      val bRaw = Audio.encode(codec, Audio.synthPcm(seed + 1, nB, 8000))
      // also exercise odd byte lengths for pcm_s16le (truncated payload)
      val b = if (codec == "pcm_s16le" && nB > 0) bRaw.dropRight(1) else bRaw
      val fused = Audio.snrDbCoded(codec, a, b)
      val materialized = Audio.snrDb(Audio.decode(codec, a), Audio.decode(codec, b))
      assert(fused == materialized || (fused.isNaN && materialized.isNaN),
        s"codec=$codec seed=$seed nA=$nA nB=$nB: $fused != $materialized")
      assert(Audio.snrDbCoded(codec, a, a).isPosInfinity)
    }
  }
}
