package graft.ops

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized codec round-trip for the REAL media decode path:
  * driver-generated random rasters, PNG-encoded INDEPENDENTLY of the
  * engine's own renderers, must come back from
  * [[Multimodal.extractFeaturesDecoded]] / [[Multimodal.resizeDecoded]]
  * with exactly the geometry, band-0 statistics, and area-mean pixels
  * computed straight from the source rasters (the documented integer
  * formulas). The planted-fixture gates pin these ops against SQL
  * oracles on engine-rendered payloads; this fuzz removes the shared-
  * renderer blind spot — a decode bug symmetric with the renderer
  * would pass those gates but fail here. Fixed seed — reproducible. */
class MediaRoundTripFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def wavBytes(samples: Array[Int]): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (v, j) =>
      pcm(2 * j) = (v & 0xff).toByte
      pcm(2 * j + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def bitsAboveMeanRef(vals: Array[Long]): Long = {
    val sum = vals.sum
    (0 until 60).foldLeft(0L) { (h, k) =>
      if (vals(k) * 60 > sum) h | (1L << k) else h
    }
  }

  test("random PCM WAVs: decoded frame-energy fingerprints equal the " +
      "documented formula; wrong-geometry audio falls back to the " +
      "byte hash; short payloads drop (20 clips)") {
    val rnd = new Random(17)
    val n = Multimodal.AudioSamples
    val clips = (0 until 20).map { i =>
      val samples = Array.fill(n)(rnd.nextInt(65536) - 32768)
      (i.toLong, samples, wavBytes(samples))
    }
    // + one WAV with the WRONG sample count (decodes, wrong geometry:
    // must hash by container bytes) and one sub-60-byte payload (drop)
    val offGeom = (900L, wavBytes(Array.fill(n / 2)(rnd.nextInt(65536)
      - 32768)))
    val tiny = (901L, Array.fill(30)(rnd.nextInt(256).toByte))
    val binary = (clips.map { case (id, _, wav) => (id, wav) } :+
      offGeom :+ ((tiny._1, tiny._2))).toDF("doc_id", "payload")
    val got = Multimodal.audioFingerprint(binary)
      .collect().map(f => f.doc_id -> f.afp).toMap
    clips.foreach { case (id, samples, _) =>
      val frameLen = n / Multimodal.AudioFrames
      val energies = Array.tabulate(Multimodal.AudioFrames) { k =>
        samples.slice(k * frameLen, (k + 1) * frameLen)
          .map(v => math.abs(v).toLong).sum
      }
      assert(got(id) === bitsAboveMeanRef(energies),
        s"clip $id: decoded energy fingerprint diverged")
    }
    val wav = offGeom._2
    val bytes60 = Array.tabulate(60)(k =>
      (wav(((k.toLong * wav.length) / 60).toInt) & 0xff).toLong)
    assert(got(900L) === bitsAboveMeanRef(bytes60),
      "wrong-geometry WAV must fall back to the raw-byte hash")
    assert(!got.contains(901L), "sub-60-byte payload must be dropped")
  }

  private def pngBytes(img: java.awt.image.BufferedImage): Array[Byte] =
    MediaTestCodecs.pngBytes(img)

  test("random gray + RGB rasters: decoded geometry/stats and " +
      "area-mean resize equal the source-pixel formulas (24 images)") {
    val rnd = new Random(42)
    val outW = 5; val outH = 4
    // (doc_id, png payload, source band-0 pixels row-major, w, h)
    val images = (0 until 24).map { i =>
      val w = outW + rnd.nextInt(36)
      val h = outH + rnd.nextInt(26)
      val gray = i % 2 == 0
      val img = new java.awt.image.BufferedImage(w, h,
        if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
        else java.awt.image.BufferedImage.TYPE_INT_RGB)
      val band0 = Array.ofDim[Int](w * h)
      for (y <- 0 until h; x <- 0 until w) {
        val v = rnd.nextInt(256)
        if (gray) img.getRaster.setSample(x, y, 0, v)
        else img.setRGB(x, y, (v << 16) | (rnd.nextInt(256) << 8) |
          rnd.nextInt(256))
        band0(y * w + x) = v
      }
      (i.toLong, pngBytes(img), band0, w, h)
    }
    val binary = images.map { case (id, png, _, _, _) => (id, png) }
      .toDF("doc_id", "payload")

    val feats = Multimodal.extractFeaturesDecoded(binary)
      .collect().map(f => f.doc_id -> f).toMap
    images.foreach { case (id, _, band0, w, h) =>
      val f = feats(id)
      val sum = band0.map(_.toLong).sum
      assert((f.width, f.height, f.n_pixels, f.pixel_sum, f.mean_pixel) ===
        ((w, h, w * h, sum, (sum / (w * h)).toInt)),
        s"image $id ($w x $h): decoded stats diverged")
    }

    val resized = Multimodal.resizeDecoded(binary, outW, outH)
      .collect().map(r => r.doc_id -> r).toMap
    images.foreach { case (id, _, band0, w, h) =>
      // the documented block: [x*W/outW,(x+1)*W/outW) x [y*H/outH,...)
      val expected = for (y <- 0 until outH; x <- 0 until outW) yield {
        val x0 = x * w / outW; val x1 = (x + 1) * w / outW
        val y0 = y * h / outH; val y1 = (y + 1) * h / outH
        var sum = 0L; var n = 0
        for (yy <- y0 until y1; xx <- x0 until x1) {
          sum += band0(yy * w + xx); n += 1
        }
        (sum / n).toInt
      }
      val r = resized(id)
      assert((r.w_in, r.h_in, r.w_out, r.h_out) === ((w, h, outW, outH)))
      val md = java.security.MessageDigest.getInstance("MD5")
      val fp = md.digest(expected.mkString(",").getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      assert(r.fp_resized === fp,
        s"image $id ($w x $h): resized pixels diverged from the " +
          s"area-mean formula")
    }
  }
}
