package graft.ops

/** Shared test-side media encoding — one definition of "PNG-encode a
  * BufferedImage" so every spec pins the SAME payload shape (r10
  * review: the pattern had been copied into multiple suites, and a
  * future color-model pin would have had to land in each). */
object MediaTestCodecs {

  def pngBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** A TYPE_BYTE_GRAY image from row-major pixel values. */
  def grayPng(w: Int, h: Int, px: IndexedSeq[Int]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    px.indices.foreach(p => img.getRaster.setSample(p % w, p / w, 0, px(p)))
    pngBytes(img)
  }
}
