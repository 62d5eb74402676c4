package graft
import graft.audio.Audio
/** Dev probe: pure-JVM (no Spark) thread scaling of the audio kernel.
  * Usage: graft.KernelProbe <threads> <rows> [synth|encdec|snr|all] */
object KernelProbe {
  def work(n: Long, tid: Int, mode: String): Long = {
    var bad = 0L; var i = 0L
    while (i < n) {
      val key = Audio.clipKey(f"clip-${tid * 10000000L + i}%012d")
      val pcm = Audio.synthPcm(key, 768, 8000)
      if (mode != "synth") {
        val enc = Audio.encode("ulaw", pcm)
        val dec = Audio.decode("ulaw", enc)
        if (mode != "encdec") {
          if (Audio.snrDb(pcm, dec) < 30.0) bad += 1
        }
      }
      i += 1
    }
    bad
  }
  def main(args: Array[String]): Unit = {
    val t = args(0).toInt; val n = args(1).toLong
    val mode = args.drop(2).headOption.getOrElse("all")
    work(20000, 99, mode) // warmup/JIT
    val t0 = System.nanoTime()
    val threads = (0 until t).map { tid => new Thread(() => { work(n / t, tid, mode); () }) }
    threads.foreach(_.start()); threads.foreach(_.join())
    val s = (System.nanoTime() - t0) / 1e9
    println(f"pure-jvm mode=$mode threads=$t n=$n wall=$s%.1f rows_per_s=${n / s}%.0f")
  }
}
