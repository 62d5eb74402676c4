package graft

import graft.audio.Audio

/** Dev probe: the HOST's parallel-capacity curve, independent of Spark.
  *
  * Each thread runs a FIXED amount of work; per-thread wall time vs thread
  * count is the box's own scaling ceiling. On one physical machine, 4×
  * the busy cores never means 4× the delivered work: turbo/DVFS drops the
  * clock as more cores light up, and LLC/DRAM bandwidth is shared — a
  * ceiling that applies to ANY CPU-bound process on the box, Spark or not.
  * A real N→4N EXECUTOR scale-out (the north rule's axis) adds sockets and
  * DRAM channels with every node and does not pay this; on a single box
  * the cluster cells inherit it, so the engine's own scaling efficiency is
  * (measured cell efficiency) / (this probe's capacity curve).
  *
  * Modes:
  *   - `audio`: the engine's real per-row kernel (synth → ulaw encode →
  *     decode → SNR) on ~6 KB cache-resident clips — core-bound, tiny
  *     working set; isolates frequency from bandwidth.
  *   - `mem`: per-thread 64 MB array streaming (read+write) — DRAM-bound;
  *     isolates shared-bandwidth saturation.
  *
  * Usage: graft.CapacityProbe [perThreadRows] [threadCounts,csv] [audio|mem|both]
  * Emits one JSON line per (mode, threads) cell:
  * {"mode":…,"threads":T,"per_thread_s":…,"thread_s":[…],"rel_per_thread":…}
  */
object CapacityProbe {

  private def audioWork(rows: Long, tid: Int): Long = {
    var bad = 0L; var i = 0L
    while (i < rows) {
      val key = Audio.clipKey(f"cap-${tid * 10000000L + i}%012d")
      val pcm = Audio.synthPcm(key, 768, 8000)
      val dec = Audio.decode("ulaw", Audio.encode("ulaw", pcm))
      if (Audio.snrDb(pcm, dec) < 30.0) bad += 1
      i += 1
    }
    bad
  }

  /** Per-thread DRAM streaming: `rows` sweeps over a 64 MB long array
    * (read-modify-write, stride 1) — far past LLC, so concurrent threads
    * contend for memory channels. */
  private def memWork(rows: Long, tid: Int): Long = {
    val n = 8 * 1024 * 1024 // 64 MB of longs per thread
    val a = new Array[Long](n)
    var acc = tid.toLong
    var sweep = 0L
    while (sweep < rows) {
      var j = 0
      while (j < n) { a(j) = a(j) + acc; acc ^= a(j); j += 1 }
      sweep += 1
    }
    acc
  }

  private def run(mode: String, threads: Int, perThread: Long): Seq[Double] = {
    val times = new Array[Double](threads)
    val ts = (0 until threads).map { tid =>
      new Thread(() => {
        val t0 = System.nanoTime()
        if (mode == "audio") audioWork(perThread, tid) else memWork(perThread, tid)
        times(tid) = (System.nanoTime() - t0) / 1e9
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    times.toSeq
  }

  /** Adjacent-pair protocol: the host's delivered per-core speed drifts
    * >2× on MINUTE timescales with near-zero steal (measured r5 — e.g. a
    * 16-thread cell outran a 1-thread cell per-thread when they were 3
    * minutes apart), so sequential one-shot cells at different thread
    * counts measure the background, not the curve. Within one round the
    * tA and tB cells run back-to-back (seconds apart); their per-thread
    * RATIO is robust to the drift, and many rounds give its distribution. */
  private def pairMode(mode: String, perThread: Long, tA: Int, tB: Int, rounds: Int): Unit = {
    (1 to rounds).foreach { r =>
      val a = run(mode, tA, perThread)
      val b = run(mode, tB, perThread)
      val ma = a.sum / a.size; val mb = b.sum / b.size
      println(f"""{"mode":"$mode","round":$r,"tA":$tA,"tB":$tB,"per_thread_A_s":$ma%.2f,"per_thread_B_s":$mb%.2f,"B_over_A":${mb / ma}%.3f}""")
    }
  }

  def main(args: Array[String]): Unit = {
    val perThreadAudio = args.headOption.map(_.toLong).getOrElse(300000L)
    if (args.drop(1).headOption.exists(_.startsWith("pair"))) {
      val mode = if (args(1) == "pairmem") "mem" else "audio"
      val tA = args(2).toInt; val tB = args(3).toInt
      val rounds = args.drop(4).headOption.map(_.toInt).getOrElse(6)
      run(mode, 2, math.max(1L, perThreadAudio / 10)) // JIT warmup
      pairMode(mode, perThreadAudio, tA, tB, rounds)
      return
    }
    val counts = args.drop(1).headOption.getOrElse("1,4,16,32").split(",").map(_.trim.toInt).toSeq
    val modes = args.drop(2).headOption.getOrElse("both") match {
      case "both" => Seq("audio", "mem"); case m => Seq(m)
    }
    modes.foreach { mode =>
      val perThread = if (mode == "audio") perThreadAudio else math.max(1L, perThreadAudio / 6000)
      run(mode, 2, math.max(1L, perThread / 10)) // JIT warmup
      var base = -1.0
      counts.foreach { t =>
        val times = run(mode, t, perThread)
        val mean = times.sum / times.size
        if (base < 0) base = mean
        val rel = base / mean // per-thread efficiency vs the 1st (smallest) cell
        println(f"""{"mode":"$mode","threads":$t,"per_thread_s":$mean%.2f,"thread_s":[${times.map(x => f"$x%.2f").mkString(",")}],"rel_per_thread":$rel%.3f}""")
      }
    }
  }
}
