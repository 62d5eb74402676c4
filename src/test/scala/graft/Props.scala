package graft

import graft.audio.Audio
import org.scalacheck.{Prop, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck property tests for the pure (non-Spark) kernels. */
object AudioProps extends Properties("graft.audio") {

  property("ulaw roundtrip error bounded by segment step") = forAll { (s: Short) =>
    val r = Audio.ulawToLinear(Audio.linearToUlaw(s))
    math.abs(r - s) <= math.max(64, math.abs(s.toInt) / 8)
  }

  property("alaw roundtrip error bounded by segment step") = forAll { (s: Short) =>
    val r = Audio.alawToLinear(Audio.linearToAlaw(s))
    math.abs(r - s) <= math.max(64, math.abs(s.toInt) / 8)
  }

  property("pcm16 encode/decode is identity") = forAll { (xs: Array[Short]) =>
    Audio.decode("pcm_s16le", Audio.encode("pcm_s16le", xs)).toSeq == xs.toSeq
  }

  property("snr is symmetric in zero-error case and +inf only when equal") =
    forAll { (xs: Array[Short]) =>
      xs.isEmpty || Audio.snrDb(xs, xs).isPosInfinity
    }

  property("splitmix draws are stateless and reproducible") = forAll { (k: Long, i: Int) =>
    Audio.draw(k, i & 0xFFFF) == Audio.draw(k, i & 0xFFFF)
  }

  property("clipKey distinct for sequential ids") = Prop {
    val keys = (0L until 10000L).map(i => Audio.clipKey(f"clip-$i%012d"))
    keys.distinct.size == keys.size
  }

  property("pcmAllclose reflexive for any codec") = forAll { (seed: Long) =>
    Audio.Codecs.forall { c =>
      val pcm = Audio.synthPcm(seed, 64, 8000)
      val enc = Audio.encode(c, pcm)
      Audio.pcmAllclose(c, enc, enc.clone())
    }
  }
}
