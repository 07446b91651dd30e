package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PhashSpec extends SparkSpec {
  import spark.implicits._

  private def corpusOf(rows: Seq[(Long, String)]) =
    Multimodal.binaryCorpus(rows.toDF("doc_id", "text"))

  test("pHashStub: identical payloads hash identically; short payloads " +
      "dropped; hash fits in 60 positive bits") {
    val text = ("the quick brown fox jumps over the lazy dog " * 3).trim
    val hs = Multimodal.pHashStub(corpusOf(Seq(
        (1L, text), (2L, text), (3L, "short"))))
      .collect().map(h => h.doc_id -> h.phash).toMap
    assert(hs.keySet == Set(1L, 2L))
    assert(hs(1L) == hs(2L))
    assert(hs(1L) >= 0L && hs(1L) < (1L << 60))
  }

  test("phashNearDup: finds pairs within hamming 3 through every band " +
      "position, rejects hamming 4, no duplicate pairs") {
    val h0 = 0x0F0F0F0F0F0F0FL
    val hashes = Seq(
      (1L, h0),
      (2L, h0),                 // hamming 0
      (3L, h0 ^ 0x7L),          // 3 bits, all in band 0
      (4L, h0 ^ (1L << 59)),    // 1 bit in the top band
      (5L, h0 ^ 0x8001000100L), // 3 bits spread over 3 bands
      (6L, h0 ^ 0xF000000000L)  // 4 bits -> excluded
    ).toDF("doc_id", "phash")
    val out = Multimodal.phashNearDup(hashes, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val pairs = out.map(t => (t._1, t._2)).toSet
    assert(out.length == pairs.size, "duplicate pairs emitted")
    // doc 6 is 4 bits from h0-family and >=4 from the others
    assert(!pairs.exists(p => p._1 == 6L || p._2 == 6L))
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)) &&
      pairs.contains((1L, 4L)) && pairs.contains((1L, 5L)))
    assert(out.find(t => t._1 == 1L && t._2 == 2L).get._3 == 0L)
    assert(out.find(t => t._1 == 1L && t._2 == 3L).get._3 == 3L)
  }

  test("phashNearDupAgainst: batch probes the stored banded index " +
      "cross-side — catches <=3-bit twins, rejects 4 bits, no " +
      "duplicate pairs, corpus side never self-pairs") {
    val h0 = 0x0F0F0F0F0F0F0FL
    val corpus = Seq((1L, h0), (2L, h0 ^ 0xFFFFL))
      .toDF("doc_id", "phash")
    val banded = Multimodal.bandedPhash(corpus)
    val batch = Seq(
      (10L, h0),                 // hamming 0 vs 1
      (11L, h0 ^ 0x7L),          // 3 bits vs 1, all in band 0
      (12L, h0 ^ 0xF000000000L)  // 4 bits vs 1 -> excluded
    ).toDF("doc_id", "phash")
    val out = Multimodal.phashNearDupAgainst(batch, banded, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val pairs = out.map(t => (t._1, t._2)).toSet
    assert(out.length == pairs.size, "duplicate pairs emitted")
    assert(pairs == Set((10L, 1L), (11L, 1L)))
    assert(out.find(_._1 == 10L).get._3 == 0L)
    assert(out.find(_._1 == 11L).get._3 == 3L)
  }

  test("banded candidate join emits no all-pairs explosion for " +
      "far-apart hashes") {
    // hashes differing in every band collide in no bucket at all
    val hashes = Seq((1L, 0L), (2L, -1L & ((1L << 60) - 1)))
      .toDF("doc_id", "phash")
    assert(Multimodal.phashNearDup(hashes).count() == 0)
  }

  test("pHashDecoded over renderPngCorpus equals the text-byte hash: " +
      "the PNG encode/decode roundtrip is pixel-exact") {
    // ASCII texts across the length regimes: shorter than the 300-pixel
    // grid (bytes repeat), exactly on it, and longer (bytes skipped)
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog " * 2),
      (2L, ("abcdefgh" * 38).take(300)),
      (3L, "A scale-out engine renders what it cannot decode. " * 20))
    val df = texts.toDF("doc_id", "text")
    val decoded = Multimodal.pHashDecoded(Multimodal.renderPngCorpus(df))
      .collect().map(h => h.doc_id -> h.phash).toMap
    val stub = Multimodal.pHashStub(Multimodal.binaryCorpus(df))
      .collect().map(h => h.doc_id -> h.phash).toMap
    // sample k of the decoded path = pixel 5k = text byte (k*len)/60 =
    // sample k of the byte path, for every length
    assert(decoded == stub)
  }

  test("renderPngCorpus emits genuine PNGs with the declared geometry") {
    val df = Seq((7L, "payloads are real portable network graphics " * 3))
      .toDF("doc_id", "text")
    val row = Multimodal.renderPngCorpus(df).collect().head
    val bytes = row.getAs[Array[Byte]]("payload")
    // PNG magic
    assert(bytes.take(8).map(_ & 0xff).toSeq ==
      Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a))
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(img.getWidth == Multimodal.RenderW &&
      img.getHeight == Multimodal.RenderH)
    val meta = row.getStruct(row.fieldIndex("media_meta"))
    assert(meta.getAs[String]("media_type") == "image/png")
  }

  test("resizeDecoded over renderPngCorpus: block means equal the " +
      "text-side arithmetic, the re-encoded PNG round-trips to exactly " +
      "those pixels, fingerprint matches") {
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog " * 2),
      (2L, ("abcdefgh" * 38).take(300)),
      (3L, "tiny"))
    val df = texts.toDF("doc_id", "text")
    val out = Multimodal.resizeDecoded(
        Multimodal.renderPngCorpus(df), outW = 5, outH = 5)
      .collect().map(r => r.doc_id -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    texts.foreach { case (id, text) =>
      val b = text.getBytes("UTF-8")
      def pixel(p: Int): Int = b(((p.toLong * b.length) / 300).toInt) & 0xff
      val want = Array.tabulate(25) { q =>
        val x = q % 5; val y = q / 5
        val sum = (for (j <- y * 3 until (y + 1) * 3;
                        i <- x * 4 until (x + 1) * 4)
          yield pixel(j * 20 + i).toLong).sum
        (sum / 12).toInt
      }
      val r = out(id)
      assert((r.w_in, r.h_in, r.w_out, r.h_out) == (20, 15, 5, 5))
      val md = java.security.MessageDigest.getInstance("MD5")
      val wantFp = md.digest(want.mkString(",").getBytes("US-ASCII"))
        .map("%02x".format(_)).mkString
      assert(r.fp_resized == wantFp, s"doc $id fingerprint")
      // the emitted payload is a real PNG decoding back to the means
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.payload))
      assert(img.getWidth == 5 && img.getHeight == 5)
      val got = Array.tabulate(25)(p =>
        img.getRaster.getSample(p % 5, p / 5, 0))
      assert(got.toSeq == want.toSeq, s"doc $id roundtrip pixels")
    }
  }

  test("extractFeaturesDecoded reports real geometry and pixel stats; " +
      "byte fallback for undecodable payloads; empty dropped") {
    val text = "decoded features over genuine rasters " * 3
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val out = Multimodal.extractFeaturesDecoded(
      Multimodal.renderPngCorpus(df)).collect().head
    val b = text.getBytes("UTF-8")
    val wantSum = (0 until 300).map(p =>
      (b(((p.toLong * b.length) / 300).toInt) & 0xff).toLong).sum
    assert(out == Multimodal.DecodedFeatures(1L, 20, 15, 300, wantSum,
      (wantSum / 300).toInt))
    val garbage = Array.tabulate[Byte](50)(i => (i * 3 + 2).toByte)
    val fb = Multimodal.extractFeaturesDecoded(
        Seq((2L, garbage), (3L, Array.empty[Byte]))
          .toDF("doc_id", "payload"))
      .collect().map(r => r.doc_id -> r).toMap
    assert(fb.keySet == Set(2L))
    val gSum = garbage.map(x => (x & 0xff).toLong).sum
    assert(fb(2L) == Multimodal.DecodedFeatures(2L, 50, 1, 50, gSum,
      (gSum / 50).toInt))
  }

  test("fuzz: resizeDecoded area mapping matches a reference " +
      "implementation on 20 random non-divisible geometries") {
    val rnd = new scala.util.Random(424242L)
    val cases = (0 until 20).map { i =>
      val w = 5 + rnd.nextInt(40); val h = 5 + rnd.nextInt(30)
      val px = Array.fill(w * h)(rnd.nextInt(256))
      (i.toLong, w, h, px)
    }
    val payloads = cases.map { case (id, w, h, px) =>
      (id, MediaTestCodecs.grayPng(w, h, px))
    }
    val out = Multimodal.resizeDecoded(
        payloads.toDF("doc_id", "payload"), outW = 4, outH = 3)
      .collect().map(r => r.doc_id -> r).toMap
    cases.foreach { case (id, w, h, px) =>
      val want = Array.tabulate(12) { q =>
        val x = q % 4; val y = q / 4
        val (x0, x1) = (x * w / 4, (x + 1) * w / 4)
        val (y0, y1) = (y * h / 3, (y + 1) * h / 3)
        val cells = for (j <- y0 until y1; i <- x0 until x1)
          yield px(j * w + i).toLong
        (cells.sum / cells.length).toInt
      }
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(
          out(id).payload))
      val got = Array.tabulate(12)(p =>
        img.getRaster.getSample(p % 4, p / 4, 0))
      assert(got.toSeq == want.toSeq, s"case $id geometry ${w}x$h")
      assert((out(id).w_in, out(id).h_in) == (w, h))
    }
  }

  test("resizeDecoded falls back to 1-D byte-block averaging for " +
      "undecodable payloads and drops payloads smaller than the " +
      "output grid") {
    val garbage = Array.tabulate[Byte](100)(i => (i * 31 + 7).toByte)
    val tiny = Array.tabulate[Byte](10)(i => i.toByte)
    val binary = Seq((1L, garbage), (2L, tiny)).toDF("doc_id", "payload")
    val out = Multimodal.resizeDecoded(binary, outW = 5, outH = 5)
      .collect().map(r => r.doc_id -> r).toMap
    assert(out.keySet == Set(1L))
    val r = out(1L)
    assert((r.w_in, r.h_in) == (100, 1))
    val want = Array.tabulate(25) { q =>
      val b0 = q * 100 / 25; val b1 = (q + 1) * 100 / 25
      ((b0 until b1).map(i => (garbage(i) & 0xff).toLong).sum
        / (b1 - b0)).toInt
    }
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(r.payload))
    val got = Array.tabulate(25)(p =>
      img.getRaster.getSample(p % 5, p / 5, 0))
    assert(got.toSeq == want.toSeq)
  }

  test("renderGifCorpus emits genuine multi-frame GIFs; frameHashes " +
      "over decoded frames equals the text-window arithmetic") {
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog " * 3),
      (2L, ("abcdefgh" * 150).take(1200)),
      (3L, "short"))
    val df = texts.toDF("doc_id", "text")
    val rendered = Multimodal.renderGifCorpus(df).collect()
    val bytes = rendered.find(_.getLong(0) == 1L).get
      .getAs[Array[Byte]]("payload")
    assert(new String(bytes.take(6), "US-ASCII") == "GIF89a")
    val got = Multimodal.frameHashes(Multimodal.renderGifCorpus(df))
      .collect().map(h => (h.doc_id, h.frame_idx) -> h.fhash).toMap
    // every doc yields all 4 frames (everyK = 1)
    assert(got.keySet == texts.flatMap(t =>
      (0 until 4).map(f => (t._1, f))).toSet)
    texts.foreach { case (id, text) =>
      val b = text.getBytes("UTF-8")
      (0 until 4).foreach { f =>
        val vals = Array.tabulate(60)(k =>
          (b((((f * 300 + 5 * k).toLong * b.length) / 1200).toInt)
            & 0xff).toLong)
        val sum = vals.sum
        val want = (0 until 60).foldLeft(0L)((h, k) =>
          if (vals(k) * 60 > sum) h | (1L << k) else h)
        assert(got((id, f)) == want, s"doc $id frame $f")
      }
    }
    // everyK = 2 keeps frames 0 and 2 only
    val sampled = Multimodal.frameHashes(
        Multimodal.renderGifCorpus(df), everyK = 2)
      .collect().map(_.frame_idx).toSet
    assert(sampled == Set(0, 2))
  }

  test("frameHashes falls back to byte chunks for undecodable " +
      "payloads and drops chunks without a stable grid") {
    val garbage = Array.tabulate[Byte](300)(i => (i * 17 + 3).toByte)
    val small = Array.tabulate[Byte](100)(i => i.toByte) // 25-byte chunks
    val binary = Seq((1L, garbage), (2L, small)).toDF("doc_id", "payload")
    val out = Multimodal.frameHashes(binary)
      .collect().map(h => (h.doc_id, h.frame_idx)).toSet
    assert(out == (0 until 4).map(f => (1L, f)).toSet)
  }

  test("audioFingerprint over renderWavCorpus equals the text-side " +
      "energy arithmetic: the WAV encode/decode roundtrip is " +
      "sample-exact") {
    val texts = Seq(
      (1L, "a short one"),
      (2L, "the quick brown fox jumps over the lazy dog " * 5),
      (3L, ("abcdefgh" * 75).take(600)))
    val df = texts.toDF("doc_id", "text")
    val got = Multimodal.audioFingerprint(Multimodal.renderWavCorpus(df))
      .collect().map(h => h.doc_id -> h.afp).toMap
    // expected: replay the render arithmetic straight from the text
    val want = texts.map { case (id, text) =>
      val b = text.getBytes("UTF-8")
      val energies = Array.tabulate(60) { k =>
        (10 * k until 10 * k + 10).map { j =>
          math.abs((((b(((j.toLong * b.length) / 600).toInt) & 0xff)
            - 128) * 256).toLong)
        }.sum
      }
      val total = energies.sum
      id -> (0 until 60).foldLeft(0L)((h, k) =>
        if (energies(k) * 60 > total) h | (1L << k) else h)
    }.toMap
    assert(got == want)
  }

  test("renderWavCorpus emits genuine RIFF/WAVE containers") {
    val df = Seq((9L, "pulse code modulation round trip"))
      .toDF("doc_id", "text")
    val row = Multimodal.renderWavCorpus(df).collect().head
    val bytes = row.getAs[Array[Byte]]("payload")
    assert(new String(bytes.take(4), "US-ASCII") == "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") == "WAVE")
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    assert(ais.getFormat.getSampleSizeInBits == 16)
    assert(ais.getFrameLength == Multimodal.AudioSamples.toLong)
    val meta = row.getStruct(row.fieldIndex("media_meta"))
    assert(meta.getAs[String]("media_type") == "audio/wav")
  }

  test("wavBytes is byte-identical to AudioSystem.write for the " +
      "render format (random PCM bodies)") {
    val rnd = new scala.util.Random(20260816L)
    for (_ <- 1 to 20) {
      val pcm = Array.fill(Multimodal.AudioSamples * 2)(
        rnd.nextInt(256).toByte)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm),
        new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false),
        Multimodal.AudioSamples.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      assert(java.util.Arrays.equals(Multimodal.wavBytes(pcm),
        bos.toByteArray),
        "manual RIFF header diverged from AudioSystem.write")
    }
  }

  test("audioFingerprint falls back to byte sampling for non-audio " +
      "payloads and drops short ones") {
    val garbageLong = Array.tabulate[Byte](120)(i => (i * 13 + 5).toByte)
    val garbageShort = Array.tabulate[Byte](10)(i => i.toByte)
    val binary = Seq((1L, garbageLong), (2L, garbageShort))
      .toDF("doc_id", "payload")
    val out = Multimodal.audioFingerprint(binary)
      .collect().map(h => h.doc_id -> h.afp).toMap
    assert(out.keySet == Set(1L))
    val viaStub = Multimodal.pHashStub(binary)
      .collect().map(h => h.doc_id -> h.phash).toMap
    assert(out(1L) == viaStub(1L)) // same 60-bit byte-hash space
  }

  test("pHashDecoded falls back to byte sampling for undecodable " +
      "payloads and drops short ones") {
    val garbageLong = Array.tabulate[Byte](120)(i => (i * 7 + 1).toByte)
    val garbageShort = Array.tabulate[Byte](10)(i => i.toByte)
    val binary = Seq((1L, garbageLong), (2L, garbageShort))
      .toDF("doc_id", "payload")
    val out = Multimodal.pHashDecoded(binary)
      .collect().map(h => h.doc_id -> h.phash).toMap
    assert(out.keySet == Set(1L)) // short undecodable payload dropped
    val viaStub = Multimodal.pHashStub(binary)
      .collect().map(h => h.doc_id -> h.phash).toMap
    assert(out(1L) == viaStub(1L))
  }
}
