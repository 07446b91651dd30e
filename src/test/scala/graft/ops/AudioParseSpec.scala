package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Multimodal.parseWavPcm16Mono]] — the lock-free clean-room
  * RIFF walker that replaced per-row `AudioSystem.getAudioInputStream`
  * in the bulk fingerprint path (the JVM-global provider registry
  * serialized 32 decode threads to ~1.5x one thread's throughput;
  * measured r15) — against the REAL javax.sound decode it must match:
  * same samples where AudioSystem accepts the exact 16-bit mono PCM
  * shape, same rejection everywhere else. */
class AudioParseSpec extends AnyFunSuite {

  /** AudioSystem reference decode with the exact acceptance rule the
    * old fingerprint path used. */
  private def referenceDecode(bytes: Array[Byte]): Option[Array[Int]] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val f = ais.getFormat
        val ok = f.getSampleSizeInBits == 16 && f.getChannels == 1 &&
          !f.isBigEndian && f.getEncoding ==
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        if (!ok) None
        else {
          val b = ais.readAllBytes()
          Some(Array.tabulate(b.length / 2)(j =>
            (b(2 * j + 1) << 8) | (b(2 * j) & 0xff)))
        }
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  private def pcm(samples: Array[Int]): Array[Byte] = {
    val out = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      out(2 * i) = (samples(i) & 0xff).toByte
      out(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  private def wavVia(writer: String, samples: Array[Int]): Array[Byte] =
    writer match {
      case "manual" => Multimodal.wavBytes(pcm(samples))
      case "audiosystem" =>
        val f = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true,
          false)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(
          new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm(samples)), f,
            samples.length),
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        bos.toByteArray
    }

  private val rnd = new scala.util.Random(20260816L)

  private def randSamples(n: Int): Array[Int] =
    Array.fill(n)(rnd.nextInt(65536) - 32768)

  test("decodes both the manual RIFF writer's and AudioSystem's own " +
      "containers sample-exactly") {
    for (writer <- Seq("manual", "audiosystem"); n <- Seq(0, 1, 7, 8000)) {
      val s = randSamples(n)
      val bytes = wavVia(writer, s)
      val got = Multimodal.parseWavPcm16Mono(bytes)
      assert(got.isDefined, s"$writer n=$n rejected")
      assert(got.get.toSeq == s.toSeq, s"$writer n=$n samples diverged")
      val ref = referenceDecode(bytes)
      assert(ref.isDefined && ref.get.toSeq == got.get.toSeq,
        s"$writer n=$n clean-room != AudioSystem")
    }
  }

  test("walks unknown chunks (LIST before data) like a real parser") {
    val s = randSamples(100)
    val base = Multimodal.wavBytes(pcm(s))
    // splice a LIST chunk (odd-sized, so the pad-byte path runs)
    // between fmt and data
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ "INFOx".getBytes("US-ASCII") ++
      Array[Byte](0) // pad to even
    val spliced = base.take(36) ++ list ++ base.drop(36)
    // patch the RIFF size
    val riffSize = spliced.length - 8
    spliced(4) = (riffSize & 0xff).toByte
    spliced(5) = ((riffSize >> 8) & 0xff).toByte
    spliced(6) = ((riffSize >> 16) & 0xff).toByte
    spliced(7) = ((riffSize >> 24) & 0xff).toByte
    val got = Multimodal.parseWavPcm16Mono(spliced)
    assert(got.isDefined && got.get.toSeq == s.toSeq)
    val ref = referenceDecode(spliced)
    assert(ref.isDefined && ref.get.toSeq == s.toSeq,
      "AudioSystem itself rejected the spliced container")
  }

  test("rejects what the AudioSystem path rejected: non-RIFF bytes, " +
      "stereo, 8-bit, non-PCM format codes") {
    assert(Multimodal.parseWavPcm16Mono(
      "not audio at all".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.parseWavPcm16Mono(Array.empty[Byte]).isEmpty)
    val s = randSamples(50)
    val base = Multimodal.wavBytes(pcm(s))
    def patched(off: Int, v: Int): Array[Byte] = {
      val c = base.clone(); c(off) = (v & 0xff).toByte
      c(off + 1) = ((v >> 8) & 0xff).toByte; c
    }
    // fmt chunk payload starts at 20: format code, channels at 22,
    // bits per sample at 34
    for ((bytes, what) <- Seq(
        (patched(20, 3), "float format code"),
        (patched(22, 2), "stereo"),
        (patched(34, 8), "8-bit"))) {
      assert(Multimodal.parseWavPcm16Mono(bytes).isEmpty,
        s"accepted $what")
      assert(referenceDecode(bytes).isEmpty ||
        Multimodal.parseWavPcm16Mono(bytes).isEmpty,
        s"divergence on $what")
    }
  }

  test("truncated data chunk yields only the samples present (the " +
      "fingerprint caller's count check then rejects it)") {
    val s = randSamples(100)
    val base = Multimodal.wavBytes(pcm(s))
    val cut = base.take(base.length - 30) // 15 samples missing
    val got = Multimodal.parseWavPcm16Mono(cut)
    assert(got.isDefined && got.get.length == 85)
    assert(got.get.toSeq == s.take(85).toSeq)
  }

  test("fuzz: random byte mutations never throw and never diverge " +
      "from the AudioSystem verdict on ACCEPTED containers") {
    val s = randSamples(64)
    val base = Multimodal.wavBytes(pcm(s))
    for (_ <- 1 to 300) {
      val m = base.clone()
      val hits = 1 + rnd.nextInt(3)
      for (_ <- 1 to hits)
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      val got = Multimodal.parseWavPcm16Mono(m) // must not throw
      val ref = referenceDecode(m)
      // when BOTH accept, samples must agree; one-sided rejections on
      // mutated garbage are acceptable (providers differ on how much
      // damage they tolerate), silent divergence is not
      (got, ref) match {
        case (Some(a), Some(b)) =>
          assert(a.toSeq == b.toSeq, "both accepted, samples diverged")
        case _ => ()
      }
    }
  }

  test("oversized declared data length clamps to the stream (no " +
      "negative allocation, no throw)") {
    val s = randSamples(20)
    val base = Multimodal.wavBytes(pcm(s))
    // data chunk size field is at offset 40 for the 44-byte header
    val c = base.clone()
    c(40) = 0xff.toByte; c(41) = 0xff.toByte
    c(42) = 0xff.toByte; c(43) = 0x7f.toByte
    val got = Multimodal.parseWavPcm16Mono(c)
    assert(got.isDefined && got.get.length == 20)
  }
}
