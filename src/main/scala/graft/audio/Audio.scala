package graft.audio

/** Deterministic audio synthesis + public-domain G.711 codecs + SNR math.
  *
  * This is the engine's analog of the reference's payload layer: the
  * reference gzips/parses JSON payloads and compares them for deep equality
  * (component/MessageCompressionComponent.java:62-78,
  *  service/SourceSystemDataCheckerService.java:141-146); we encode/decode
  * PCM audio and compare decoded waveforms at SNR ≥ 30 dB
  * (BASELINE.json `input_hint`).
  *
  * Everything here is pure, allocation-light JVM code so it can run inside
  * Spark tasks (mapPartitions / UDF) without driver round trips. All
  * randomness is SplitMix64 keyed by clip id — never by row order or wall
  * clock — so any row can be re-derived independently on any executor.
  */
object Audio {

  // ---------------------------------------------------------------- PRNG

  /** SplitMix64 step (public-domain constant mix, Steele et al.). */
  @inline def splitmix64(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D4A68B2212C5A1L // distinct odd mixer
    z ^ (z >>> 31)
  }

  /** Stateless stream: k-th draw for a given key. */
  @inline def draw(key: Long, k: Int): Long = splitmix64(key + k * 0x632BE59BD9B4E019L)

  /** [0,1) double from a draw. */
  @inline def unit(key: Long, k: Int): Double = (draw(key, k) >>> 11) * 1.1102230246251565e-16

  /** Deterministic 64-bit key for a clip id string (FNV-1a). */
  def clipKey(clipId: String): Long = {
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < clipId.length) { h ^= clipId.charAt(i); h *= 0x100000001B3L; i += 1 }
    h
  }

  // ------------------------------------------------------------ synthesis

  /** Deterministic PCM: 3 seeded sines + seeded Gaussian-ish noise at
    * ~40 dB SNR. `nSamples` bounded by caller; output is 16-bit range. */
  def synthPcm(key: Long, nSamples: Int, srHz: Int): Array[Short] = {
    val f1 = 80.0 + unit(key, 1) * 1000.0
    val f2 = 200.0 + unit(key, 2) * 2000.0
    val f3 = 500.0 + unit(key, 3) * 3000.0
    val p1 = unit(key, 4) * 2 * math.Pi
    val p2 = unit(key, 5) * 2 * math.Pi
    val p3 = unit(key, 6) * 2 * math.Pi
    val out = new Array[Short](nSamples)
    val w1 = 2 * math.Pi * f1 / srHz
    val w2 = 2 * math.Pi * f2 / srHz
    val w3 = 2 * math.Pi * f3 / srHz
    var i = 0
    while (i < nSamples) {
      val sig = 0.5 * math.sin(w1 * i + p1) + 0.3 * math.sin(w2 * i + p2) +
        0.2 * math.sin(w3 * i + p3)
      // noise ~40 dB below unit signal: uniform sum approximation, cheap
      val n = (unit(key, 16 + 3 * i) + unit(key, 17 + 3 * i) - 1.0) * 0.01
      val v = (sig * 0.6 + n) * 32767.0
      out(i) = math.max(-32768.0, math.min(32767.0, v)).toShort
      i += 1
    }
    out
  }

  // ---------------------------------------------------------- codecs

  val Codecs: Seq[String] = Seq("pcm_s16le", "ulaw", "alaw")

  def encode(codec: String, pcm: Array[Short]): Array[Byte] = codec match {
    case "pcm_s16le" =>
      val b = new Array[Byte](pcm.length * 2)
      var i = 0
      while (i < pcm.length) {
        b(2 * i) = (pcm(i) & 0xFF).toByte
        b(2 * i + 1) = ((pcm(i) >> 8) & 0xFF).toByte
        i += 1
      }
      b
    case "ulaw" =>
      val b = new Array[Byte](pcm.length)
      var i = 0
      while (i < pcm.length) { b(i) = linearToUlaw(pcm(i)); i += 1 }
      b
    case "alaw" =>
      val b = new Array[Byte](pcm.length)
      var i = 0
      while (i < pcm.length) { b(i) = linearToAlaw(pcm(i)); i += 1 }
      b
    case other => throw new IllegalArgumentException(s"unknown codec: $other")
  }

  def decode(codec: String, bytes: Array[Byte]): Array[Short] = codec match {
    case "pcm_s16le" =>
      val n = bytes.length / 2
      val s = new Array[Short](n)
      var i = 0
      while (i < n) {
        s(i) = (((bytes(2 * i + 1) & 0xFF) << 8) | (bytes(2 * i) & 0xFF)).toShort
        i += 1
      }
      s
    case "ulaw" =>
      val s = new Array[Short](bytes.length)
      var i = 0
      while (i < bytes.length) { s(i) = ulawToLinear(bytes(i)); i += 1 }
      s
    case "alaw" =>
      val s = new Array[Short](bytes.length)
      var i = 0
      while (i < bytes.length) { s(i) = alawToLinear(bytes(i)); i += 1 }
      s
    case other => throw new IllegalArgumentException(s"unknown codec: $other")
  }

  /** G.711 μ-law compress (public CCITT algorithm). */
  def linearToUlaw(sample: Short): Byte = {
    val Bias = 0x84; val Clip = 32635
    var s = sample.toInt
    val sign = if (s < 0) { s = -s; 0x80 } else 0
    if (s > Clip) s = Clip
    s += Bias
    var exponent = 7
    var mask = 0x4000
    while (exponent > 0 && (s & mask) == 0) { exponent -= 1; mask >>= 1 }
    val mantissa = (s >> (exponent + 3)) & 0x0F
    (~(sign | (exponent << 4) | mantissa)).toByte
  }

  def ulawToLinear(u: Byte): Short = {
    val x = ~u & 0xFF
    val sign = x & 0x80
    val exponent = (x >> 4) & 0x07
    val mantissa = x & 0x0F
    var s = (((mantissa << 3) + 0x84) << exponent) - 0x84
    if (sign != 0) s = -s
    s.toShort
  }

  /** G.711 A-law compress (public CCITT algorithm; exponent via bit scan
    * instead of the classic lookup table). */
  def linearToAlaw(sample: Short): Byte = {
    var s = sample.toInt
    val sign = if (s < 0) { s = -s; 0x80 } else 0
    if (s > 32635) s = 32635
    val alaw =
      if (s >= 256) {
        val exponent = 31 - Integer.numberOfLeadingZeros(s) - 7 // 1..7
        val mantissa = (s >> (exponent + 3)) & 0x0F
        (exponent << 4) | mantissa
      } else s >> 4
    ((alaw ^ sign ^ 0x55) & 0xFF).toByte
  }

  def alawToLinear(a: Byte): Short = {
    var x = (a ^ 0x55) & 0xFF
    val sign = x & 0x80
    x &= 0x7F
    val exponent = (x >> 4) & 0x07
    val mantissa = x & 0x0F
    var s =
      if (exponent == 0) (mantissa << 4) + 8
      else ((mantissa << 4) + 0x108) << (exponent - 1)
    if (sign != 0) s = -s
    s.toShort
  }

  // ------------------------------------------------------------- metrics

  /** SNR in dB of `test` against `ref`. Infinity when identical; -Infinity
    * when ref is silent but test differs. Length mismatch counts the tail
    * as pure error (a truncated/corrupt payload must fail the 30 dB gate). */
  def snrDb(ref: Array[Short], test: Array[Short]): Double = {
    val n = math.max(ref.length, test.length)
    var sig = 0.0; var err = 0.0; var i = 0
    while (i < n) {
      val r = if (i < ref.length) ref(i).toDouble else 0.0
      val t = if (i < test.length) test(i).toDouble else 0.0
      sig += r * r
      val d = r - t
      err += d * d
      i += 1
    }
    if (err == 0.0) Double.PositiveInfinity
    else if (sig == 0.0) Double.NegativeInfinity
    else 10.0 * math.log10(sig / err)
  }

  /** The per-row invariant from BASELINE.json: decoded-PCM allclose at
    * SNR ≥ 30 dB. */
  def pcmAllclose(codec: String, a: Array[Byte], b: Array[Byte], minSnrDb: Double = 30.0): Boolean = {
    if (java.util.Arrays.equals(a, b)) true // fast path, no decode
    else snrDbCoded(codec, a, b) >= minSnrDb
  }

  // ------------------------------------------- fused decode+SNR (zero-alloc)

  // 256-entry decode tables, built once from the same G.711 bit math —
  // the fused loops below are sample-for-sample identical to
  // snrDb(decode(codec, a), decode(codec, b)).
  private val UlawTable: Array[Short] = Array.tabulate(256)(i => ulawToLinear(i.toByte))
  private val AlawTable: Array[Short] = Array.tabulate(256)(i => alawToLinear(i.toByte))

  /** SNR computed directly from the CODED payloads: per-sample decode is
    * fused into the accumulation loop, so the hot engine path (millions of
    * multi-KB comparisons per task) allocates NOTHING per row. The
    * array-materializing decode+snrDb pair cost two transient PCM buffers
    * per comparison — at 16+ concurrent tasks per box that allocation/GC
    * traffic was the largest single memory-bandwidth consumer in the
    * full-decode profile (measured r5: the diff-join stage's GC+stall time
    * exceeded its compute). Identical math, same length-mismatch
    * semantics (missing tail counts as pure error). */
  def snrDbCoded(codec: String, ref: Array[Byte], test: Array[Byte]): Double = codec match {
    case "pcm_s16le" => snrPcm16(ref, test)
    case "ulaw" => snrTable(UlawTable, ref, test)
    case "alaw" => snrTable(AlawTable, ref, test)
    case other => throw new IllegalArgumentException(s"unknown codec: $other")
  }

  private def snrTable(t: Array[Short], ref: Array[Byte], test: Array[Byte]): Double = {
    val n = math.max(ref.length, test.length)
    var sig = 0.0; var err = 0.0; var i = 0
    while (i < n) {
      val r = if (i < ref.length) t(ref(i) & 0xFF).toDouble else 0.0
      val v = if (i < test.length) t(test(i) & 0xFF).toDouble else 0.0
      sig += r * r
      val d = r - v
      err += d * d
      i += 1
    }
    finishSnr(sig, err)
  }

  private def snrPcm16(ref: Array[Byte], test: Array[Byte]): Double = {
    val nr = ref.length / 2; val nt = test.length / 2
    val n = math.max(nr, nt)
    var sig = 0.0; var err = 0.0; var i = 0
    while (i < n) {
      val r =
        if (i < nr) (((ref(2 * i + 1) & 0xFF) << 8) | (ref(2 * i) & 0xFF)).toShort.toDouble
        else 0.0
      val v =
        if (i < nt) (((test(2 * i + 1) & 0xFF) << 8) | (test(2 * i) & 0xFF)).toShort.toDouble
        else 0.0
      sig += r * r
      val d = r - v
      err += d * d
      i += 1
    }
    finishSnr(sig, err)
  }

  @inline private def finishSnr(sig: Double, err: Double): Double =
    if (err == 0.0) Double.PositiveInfinity
    else if (sig == 0.0) Double.NegativeInfinity
    else 10.0 * math.log10(sig / err)
}
