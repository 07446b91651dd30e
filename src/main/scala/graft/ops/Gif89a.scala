package graft.ops

/** Minimal GIF89a encoder for the media-store render path — grayscale
  * frames only, written from the public GIF89a specification
  * (CompuServe, 1990-07-31; the format is also annexed to W3C's PNG
  * notes). Exists because `javax.imageio`'s GIF plugin spends its
  * time in per-frame `convertMetadata`/`mergeTree` IIOMetadata tree
  * conversions (jstack-confirmed hot path, round 14): for 20×15
  * frames the metadata machinery costs ~100× the actual LZW work.
  * This encoder writes the container directly: header, logical
  * screen descriptor, one 256-entry gray global color table, one
  * image descriptor + LZW raster per frame, trailer.
  *
  * Fidelity contract: pixel-EXACT through any conforming decoder —
  * each raster byte is a palette index and the global table maps
  * index i to rgb(i,i,i), so a decoded frame's gray value equals the
  * raster byte, exactly as with the previous `TYPE_BYTE_GRAY` +
  * ImageIO-writer path. Pinned by PhashSpec / MediaRoundTripFuzzSpec,
  * which decode through the real `javax.imageio` GIF READER and
  * compare pixels against the independent text-side formula.
  *
  * LZW: standard GIF variable-width codes, LSB-first bit packing,
  * 8-bit min code size (clear=256, EOI=257, first free=258), width
  * grows after the emitted-code check `freeEnt > maxcode` (the
  * classic ppmtogif/giflib rule — no "early change"), dictionary
  * reset via a clear code when the 12-bit space fills. */
object Gif89a {

  /** Encode w×h grayscale frames (raster bytes = palette indices,
    * row-major) as one animated GIF89a stream. */
  def encodeGray(frames: Array[Array[Byte]], w: Int, h: Int)
      : Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(512 + frames.length * 512)
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v); u8(v >> 8) }
    out.write(Array[Byte]('G', 'I', 'F', '8', '9', 'a'))
    u16(w); u16(h)
    u8(0xF7) // GCT present | 8-bit color resolution | 256-entry table
    u8(0)    // background color index
    u8(0)    // pixel aspect ratio: unspecified
    var i = 0
    while (i < 256) { u8(i); u8(i); u8(i); i += 1 }
    var f = 0
    while (f < frames.length) {
      u8(0x2C) // image descriptor
      u16(0); u16(0); u16(w); u16(h)
      u8(0)    // no local color table, not interlaced
      writeLzw(out, frames(f))
      f += 1
    }
    u8(0x3B) // trailer
    out.toByteArray
  }

  /** One LZW-compressed raster: min-code-size byte, then the coded
    * stream in ≤255-byte sub-blocks, then a 0 block terminator. */
  private def writeLzw(out: java.io.ByteArrayOutputStream,
                       data: Array[Byte]): Unit = {
    out.write(8) // LZW minimum code size (256-color raster)
    val Clear = 256
    val Eoi = 257
    val block = new Array[Byte](255)
    var blen = 0
    var acc = 0L
    var accBits = 0
    var nBits = 9
    var maxcode = (1 << nBits) - 1
    var freeEnt = Eoi + 1
    var clearFlg = false
    def flushBlock(): Unit =
      if (blen > 0) { out.write(blen); out.write(block, 0, blen); blen = 0 }
    def putByte(b: Int): Unit = {
      block(blen) = b.toByte; blen += 1
      if (blen == 255) flushBlock()
    }
    def output(code: Int): Unit = {
      acc |= code.toLong << accBits
      accBits += nBits
      while (accBits >= 8) {
        putByte((acc & 0xff).toInt); acc >>= 8; accBits -= 8
      }
      // post-emit width growth (no early change), giflib convention
      if (freeEnt > maxcode || clearFlg) {
        if (clearFlg) { nBits = 9; maxcode = (1 << nBits) - 1; clearFlg = false }
        else {
          nBits += 1
          maxcode = if (nBits == 12) 1 << 12 else (1 << nBits) - 1
        }
      }
    }
    // dictionary key = (prefix code << 8) | next byte; values are codes
    val dict = new java.util.HashMap[Integer, Integer](1024)
    output(Clear)
    var ent = data(0) & 0xff
    var i = 1
    while (i < data.length) {
      val c = data(i) & 0xff
      val key = Integer.valueOf((ent << 8) | c)
      val hit = dict.get(key)
      if (hit != null) ent = hit.intValue()
      else {
        output(ent)
        if (freeEnt < (1 << 12)) { dict.put(key, freeEnt); freeEnt += 1 }
        else { // 12-bit space full: reset the table mid-stream
          dict.clear(); freeEnt = Eoi + 1; clearFlg = true
          output(Clear)
        }
        ent = c
      }
      i += 1
    }
    output(ent)
    output(Eoi)
    if (accBits > 0) putByte((acc & 0xff).toInt) // pad the tail bits
    flushBlock()
    out.write(0) // block terminator
  }
}
