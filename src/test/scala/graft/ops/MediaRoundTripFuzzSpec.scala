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

  private def pngBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

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
