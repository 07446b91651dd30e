package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Gif89a]] against the real `javax.imageio` GIF READER —
  * encoder fidelity is defined as decoded-pixel equality, not byte
  * equality with any other writer. */
class Gif89aSpec extends AnyFunSuite {

  private def decodeFrames(bytes: Array[Byte]): Seq[Array[Int]] = {
    val rd = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    rd.setInput(javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes)))
    val n = rd.getNumImages(true)
    val out = (0 until n).map { i =>
      val img = rd.read(i)
      val w = img.getWidth; val h = img.getHeight
      // resolve through the palette: gray value = red channel of the
      // global-table entry the index points at
      Array.tabulate(w * h)(p =>
        (img.getRGB(p % w, p / w) >> 16) & 0xff)
    }
    rd.dispose()
    out
  }

  test("multi-frame roundtrip: decoded gray pixels equal the raster " +
      "bytes for random small frames") {
    val rnd = new scala.util.Random(42)
    val frames = Array.fill(4)(Array.fill(20 * 15)(rnd.nextInt(256).toByte))
    val got = decodeFrames(Gif89a.encodeGray(frames, 20, 15))
    assert(got.size == 4)
    for ((dec, src) <- got.zip(frames))
      assert(dec.toSeq == src.map(_ & 0xff).toSeq)
  }

  test("LZW 12-bit dictionary reset: a frame large and random enough " +
      "to overflow 4096 codes still roundtrips pixel-exact") {
    val rnd = new scala.util.Random(7)
    // 256x160 random bytes: incompressible, the dictionary fills the
    // 12-bit space several times over, exercising the clear-code path
    val big = Array.fill(256 * 160)(rnd.nextInt(256).toByte)
    val got = decodeFrames(Gif89a.encodeGray(Array(big), 256, 160))
    assert(got.size == 1)
    assert(got.head.toSeq == big.map(_ & 0xff).toSeq)
  }

  test("highly repetitive frame (long runs, deep LZW chains) " +
      "roundtrips pixel-exact") {
    val runs = Array.tabulate(64 * 64)(i => ((i / 97) % 7 * 40).toByte)
    val got = decodeFrames(Gif89a.encodeGray(Array(runs, runs), 64, 64))
    assert(got.size == 2)
    for (dec <- got) assert(dec.toSeq == runs.map(_ & 0xff).toSeq)
  }
}
