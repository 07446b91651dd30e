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
@org.scalatest.tags.Slow
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

  test("random animated GIFs: every decoded frame's hash equals the " +
      "source-raster formula; everyK sampling skips exactly; " +
      "videoNearDup equals the brute-force frame-pair reference " +
      "(18 videos)") {
    val rnd = new Random(1123)
    // (doc_id, w, h, frames as row-major gray pixels)
    val videos = (0 until 18).map { i =>
      val w = 8 + rnd.nextInt(12)
      val h = 8 + rnd.nextInt(10) // w*h >= 64 > 60: stable hash grid
      val nf = 2 + rnd.nextInt(5)
      val frames = (0 until nf).map(_ =>
        IndexedSeq.fill(w * h)(rnd.nextInt(256)))
      (i.toLong, w, h, frames)
    }
    def refHash(px: IndexedSeq[Int]): Long = {
      val np = px.length
      bitsAboveMeanRef(Array.tabulate(60)(k =>
        px(((k.toLong * np) / 60).toInt).toLong))
    }
    val binary = videos.map { case (id, w, h, frames) =>
      (id, MediaTestCodecs.grayGifAnimated(w, h, frames))
    }.toDF("doc_id", "payload")
    val got = Multimodal.frameHashes(binary).collect()
      .map(f => (f.doc_id, f.frame_idx) -> f.fhash).toMap
    videos.foreach { case (id, w, h, frames) =>
      assert(frames.indices.forall(f => got.contains((id, f))) &&
        !got.contains((id, frames.size)),
        s"video $id: decoded frame count diverged")
      frames.zipWithIndex.foreach { case (px, f) =>
        assert(got((id, f)) === refHash(px),
          s"video $id frame $f (${w}x$h): decoded hash diverged " +
            "from the source raster")
      }
    }
    // everyK=2 keeps exactly the even frame indices, same hashes
    val sampled = Multimodal.frameHashes(binary, everyK = 2).collect()
      .map(f => (f.doc_id, f.frame_idx) -> f.fhash).toMap
    assert(sampled.keySet === got.keySet.filter(_._2 % 2 == 0))
    assert(sampled.forall { case (k, v) => got(k) === v })
    // near-dup against a batch of bit-flipped twins: brute-force
    // frame-pair reference over the REFERENCE hashes (aligned frame,
    // hamming <= 3, >= 2 matched frames) must equal the banded op
    val twins = videos.map { case (id, w, h, frames) =>
      // flip one pixel per frame far from the mean: hamming stays
      // small but nonzero often enough to exercise both verdicts
      val mut = frames.map(px => px.updated(rnd.nextInt(px.length),
        rnd.nextInt(256)))
      (id + 1000L, w, h, mut)
    }
    val batchDf = twins.map { case (id, w, h, frames) =>
      (id, MediaTestCodecs.grayGifAnimated(w, h, frames))
    }.toDF("doc_id", "payload")
    val want = (for {
      (bid, _, _, bframes) <- twins
      (cid, _, _, cframes) <- videos
    } yield {
      val matched = bframes.indices.count { f =>
        f < cframes.size &&
          java.lang.Long.bitCount(refHash(bframes(f)) ^
            refHash(cframes(f))) <= 3
      }
      ((bid, cid), matched.toLong)
    }).filter(_._2 >= 2).toMap
    val gotNd = Multimodal.videoNearDup(
        Multimodal.frameHashes(batchDf).toDF(),
        Multimodal.frameHashes(binary).toDF(),
        maxHamming = 3, minFrames = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        r.getLong(2))).toMap
    assert(gotNd === want,
      "banded videoNearDup diverged from the brute-force reference")
    assert(want.nonEmpty, "fuzz degenerate: no near-dup pairs at all")
  }
}
