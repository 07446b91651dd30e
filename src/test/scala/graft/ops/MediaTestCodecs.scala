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

  /** A multi-frame animated GIF from per-frame row-major gray pixels —
    * the spec-side container encoder, independent of
    * [[Multimodal.renderGifCorpus]]'s window-sampling arithmetic (same
    * division of labor as [[grayPng]] vs renderPngCorpus: a decode bug
    * symmetric with the engine's own renderer passes the planted-
    * fixture gates but fails against frames encoded here). */
  def grayGifAnimated(w: Int, h: Int,
                      frames: Seq[IndexedSeq[Int]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val wr = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    wr.setOutput(ios)
    wr.prepareWriteSequence(null)
    frames.foreach { px =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      px.indices.foreach(p =>
        img.getRaster.setSample(p % w, p / w, 0, px(p)))
      wr.writeToSequence(new javax.imageio.IIOImage(img, null,
        wr.getDefaultImageMetadata(
          new javax.imageio.ImageTypeSpecifier(img),
          wr.getDefaultWriteParam)), wr.getDefaultWriteParam)
    }
    wr.endWriteSequence()
    ios.close()
    wr.dispose()
    bos.toByteArray
  }
}
