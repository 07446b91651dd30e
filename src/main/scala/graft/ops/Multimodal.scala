package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, decoded/feature-extracted via typed `mapPartitions` (the
  * Scala analogue of `mapInPandas` batch UDFs).
  *
  * Two payload families live here. [[renderPngCorpus]] +
  * [[pHashDecoded]] carry REAL images end to end: a deterministic
  * grayscale render of each document, encoded to PNG and decoded back
  * with `javax.imageio` (public JDK — the one codec every container
  * has), with the perceptual hash computed over genuinely decoded
  * pixels. Because the render is a pure function of the text and PNG
  * is lossless, a SQL oracle can pin the whole
  * render→encode→decode→hash chain bit-for-bit — a hash mismatch
  * would surface any decode deviation. [[renderWavCorpus]] + [[audioFingerprint]] are
  * the audio twin — 16-bit PCM in a RIFF/WAVE container, decoded
  * back through `javax.sound.sampled.AudioSystem`, fingerprinted by
  * decoded frame energies. [[resizeDecoded]] closes the loop on the
  * image side: decode → integer pixel-area downscale → PNG re-encode,
  * oracle-pinned end to end. VIDEO is real-codec tier too:
  * [[renderGifCorpus]] writes genuine multi-frame animated GIFs,
  * [[frameHashes]] container-decodes them frame by frame (ImageReader
  * sequence), and [[videoNearDup]] runs the banded scene-level
  * near-dup over those decoded frame hashes — all oracle-pinned and
  * fuzzed against independently-encoded rasters
  * (MediaRoundTripFuzzSpec). The byte-level paths (`decodeStub`,
  * `resizeStub`) remain ONLY as documented fallbacks for containers
  * with no JDK codec (e.g. MP4): there the signature and
  * per-partition batching are the contract and the byte arithmetic is
  * a stand-in; the decoded paths also fall back to the byte-sampling
  * hash for payloads their codec cannot parse, so a mixed corpus
  * degrades per row, not per job. */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class MediaFeatures(doc_id: Long, n_bytes: Int,
                                 first_byte: Int, last_byte: Int,
                                 checksum: Long, width: Int, height: Int)

  /** Attach a binary payload column (UTF-8 bytes of the text — the
    * stand-in for image/audio blobs) plus typed metadata. */
  def binaryCorpus(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(length(col("text")).as("n_chars"),
        lit("fake/utf8").as("media_type")).as("media_meta"))

  /** Container-format sniffing by MAGIC BYTES — the first pass every
    * media lake runs over arriving blobs, because upstream
    * content-type headers lie and extensions lie harder: the format is
    * whatever the leading bytes say it is. Pure per-row scan work —
    * `substring` on BinaryType keeps only the ≤ 12-byte prefix, `hex`
    * of that prefix (never of the payload) feeds a codegen'd when
    * chain; no UDF, no shuffle, works identically on a 100 TB blob
    * column. Signatures (all public file-format specs): PNG's 8-byte
    * seal, JPEG FFD8FF, GIF87a/GIF89a, RIFF containers split by their
    * type tag at offset 9 (WAVE→wav, AVI →avi), gzip 1F8B, %PDF, MP3
    * by ID3 tag, everything else → 'unknown' (never a guess). */
  def sniffFormat(payload: Column): Column = {
    def hexAt(off: Int, len: Int): Column =
      hex(substring(payload, off, len))
    val p3 = hexAt(1, 3)
    val p4 = hexAt(1, 4)
    val p6 = hexAt(1, 6)
    val p8 = hexAt(1, 8)
    val riffTag = hexAt(9, 4)
    when(p8 === "89504E470D0A1A0A", "png")
      .when(p3 === "FFD8FF", "jpeg")
      .when(p6 === "474946383761" || p6 === "474946383961", "gif")
      .when(p4 === "52494646" && riffTag === "57415645", "wav")
      .when(p4 === "52494646" && riffTag === "41564920", "avi")
      .when(hexAt(1, 2) === "1F8B", "gzip")
      .when(p4 === "25504446", "pdf")
      .when(p3 === "494433", "mp3")
      .otherwise("unknown")
  }

  /** STUB decoder: deterministic features from raw bytes. A real
    * implementation would decode an image here; the signature — bytes
    * in, fixed-width feature struct out — is the contract. */
  def decodeStub(doc_id: Long, bytes: Array[Byte]): MediaFeatures = {
    var checksum = 0L
    var i = 0
    while (i < bytes.length) { checksum += bytes(i) & 0xff; i += 1 }
    val first = if (bytes.nonEmpty) bytes(0) & 0xff else 0
    val last = if (bytes.nonEmpty) bytes(bytes.length - 1) & 0xff else 0
    MediaFeatures(doc_id, bytes.length, first, last, checksum,
      width = (checksum % 640).toInt, height = (checksum % 480).toInt)
  }

  /** Batched per-partition decode: one decoder instantiation per
    * partition, streamed over the iterator (no per-row setup cost —
    * the property that matters when the decoder is an expensive
    * codec/model handle). */
  def extractFeatures(binary: DataFrame): Dataset[MediaFeatures] = {
    val spark = binary.sparkSession
    import spark.implicits._
    binary.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        // per-partition decoder setup would go here (codec handle, model)
        rows.map(r => decodeStub(r.doc_id, r.payload))
      }
  }

  final case class ResizedMedia(doc_id: Long, n_bytes: Int,
                                n_bytes_resized: Int, fp_resized: String)

  /** STUB resize: deterministic downsample keeping every k-th byte —
    * the signature (bytes → smaller bytes + fingerprint) is the
    * contract; a real implementation would rescale pixels. Runs as the
    * same batched per-partition pattern as [[extractFeatures]]. */
  def resizeStub(binary: DataFrame, everyK: Int): Dataset[ResizedMedia] = {
    val spark = binary.sparkSession
    import spark.implicits._
    binary.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val out = r.payload.indices.collect {
            case i if i % everyK == 0 => r.payload(i)
          }.toArray
          val md = java.security.MessageDigest.getInstance("MD5")
          val fp = md.digest(out).map("%02x".format(_)).mkString
          ResizedMedia(r.doc_id, r.payload.length, out.length, fp)
        }
      }
  }

  final case class DecodedFeatures(doc_id: Long, width: Int, height: Int,
                                   n_pixels: Int, pixel_sum: Long,
                                   mean_pixel: Int)

  /** Feature extraction over GENUINELY DECODED images: `ImageIO.read`
    * the payload and report real geometry plus first-band pixel
    * statistics (sum and floor-mean) — integer arithmetic only, so
    * for [[renderPngCorpus]] payloads a SQL oracle replays the
    * decode from the source text exactly. Same batched per-partition
    * pattern as [[extractFeatures]]. Undecodable payloads fall back
    * to raw-byte statistics as a 1×n "image" (per row); empty
    * payloads are dropped. */
  def extractFeaturesDecoded(binary: DataFrame): Dataset[DecodedFeatures] = {
    val spark = binary.sparkSession
    import spark.implicits._
    binary.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        def stats(docId: Long, w: Int, h: Int,
                  srcAt: Int => Int): DecodedFeatures = {
          val n = w * h
          var sum = 0L
          var i = 0
          while (i < n) { sum += srcAt(i); i += 1 }
          DecodedFeatures(docId, w, h, n, sum, (sum / n).toInt)
        }
        rows.flatMap { r =>
          // corrupt-but-recognized payloads make image plugins throw
          // unchecked exceptions too — any decode failure degrades to
          // the byte path per row, never fails the task
          val img =
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(r.payload))
            catch { case scala.util.control.NonFatal(_) => null }
          if (img != null && img.getWidth > 0 && img.getHeight > 0) {
            val w = img.getWidth; val h = img.getHeight
            val raster = img.getRaster
            Some(stats(r.doc_id, w, h,
              p => raster.getSample(p % w, p / w, 0)))
          } else if (r.payload.isEmpty) None
          else Some(stats(r.doc_id, r.payload.length, 1,
            p => r.payload(p) & 0xff))
        }
      }
  }

  final case class ResizedDecoded(doc_id: Long, w_in: Int, h_in: Int,
                                  w_out: Int, h_out: Int,
                                  payload: Array[Byte], fp_resized: String)

  /** REAL pixel resize: decode the payload with `javax.imageio`,
    * downscale to `outW`×`outH` by integer pixel-area averaging —
    * output pixel (x, y) is the floor-mean of the source block
    * `[x·W/outW, (x+1)·W/outW) × [y·H/outH, (y+1)·H/outH)` — and
    * re-encode the result as an 8-bit grayscale PNG. All arithmetic is
    * integer (sum, floor division), so for [[renderPngCorpus]] images
    * a SQL oracle can replay the decode→resize chain from the source
    * text exactly; `fp_resized` = md5 over the comma-joined output
    * pixels is the cross-engine fingerprint. Same batched
    * per-partition pattern as [[extractFeatures]] (one codec setup per
    * partition). Payloads ImageIO cannot decode fall back to byte-block
    * averaging over the raw payload (a 1×n "image", per row — one bad
    * payload degrades, not fails); payloads with fewer source pixels
    * (or fallback bytes) than output pixels are dropped — no
    * well-defined area mapping. */
  def resizeDecoded(binary: DataFrame, outW: Int, outH: Int): Dataset[ResizedDecoded] = {
    require(outW > 0 && outH > 0, "output geometry must be positive")
    val spark = binary.sparkSession
    import spark.implicits._
    binary.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        // 2-D pixel-area block means of a wIn×hIn image (requires
        // wIn >= outW and hIn >= outH so every block is non-empty)
        def areaMeans(wIn: Int, hIn: Int, srcAt: Int => Int): Array[Int] = {
          val means = new Array[Int](outW * outH)
          var q = 0
          while (q < means.length) {
            val x = q % outW; val y = q / outW
            val x0 = x * wIn / outW; val x1 = (x + 1) * wIn / outW
            val y0 = y * hIn / outH; val y1 = (y + 1) * hIn / outH
            var sum = 0L
            var j = y0
            while (j < y1) {
              var i = x0
              while (i < x1) { sum += srcAt(j * wIn + i); i += 1 }
              j += 1
            }
            means(q) = (sum / ((x1 - x0).toLong * (y1 - y0))).toInt
            q += 1
          }
          means
        }
        // 1-D block means over n raw bytes (fallback; requires
        // n >= outW·outH): block q covers [q·n/N, (q+1)·n/N)
        def blockMeans1d(n: Int, srcAt: Int => Int): Array[Int] = {
          val nOut = outW * outH
          Array.tabulate(nOut) { q =>
            val b0 = (q.toLong * n / nOut).toInt
            val b1 = ((q + 1).toLong * n / nOut).toInt
            var sum = 0L
            var i = b0
            while (i < b1) { sum += srcAt(i); i += 1 }
            (sum / (b1 - b0)).toInt
          }
        }
        def emit(docId: Long, wIn: Int, hIn: Int,
                 means: Array[Int]): ResizedDecoded = {
          val img = new java.awt.image.BufferedImage(
            outW, outH, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var p = 0
          while (p < means.length) {
            raster.setSample(p % outW, p / outW, 0, means(p))
            p += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          val md = java.security.MessageDigest.getInstance("MD5")
          val fp = md.digest(means.mkString(",").getBytes("US-ASCII"))
            .map("%02x".format(_)).mkString
          ResizedDecoded(docId, wIn, hIn, outW, outH, bos.toByteArray, fp)
        }
        rows.flatMap { r =>
          val img =
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(r.payload))
            catch { case scala.util.control.NonFatal(_) => null }
          if (img != null) {
            val w = img.getWidth; val h = img.getHeight
            if (w < outW || h < outH) None
            else {
              val raster = img.getRaster
              Some(emit(r.doc_id, w, h,
                areaMeans(w, h, p => raster.getSample(p % w, p / w, 0))))
            }
          } else if (r.payload.length < outW * outH) None
          else Some(emit(r.doc_id, r.payload.length, 1,
            blockMeans1d(r.payload.length, p => r.payload(p) & 0xff)))
        }
      }
  }

  /** Render geometry for [[renderPngCorpus]]: 20×15 = 300 pixels, a
    * multiple of the 60 hash samples so sample k lands exactly on
    * pixel 5k and the double floor collapses —
    * `(5k·len)/300 = (k·len)/60` — letting the text-side oracle
    * replay the pixel-side hash with one division. */
  val RenderW = 20
  val RenderH = 15
  private val RenderN = RenderW * RenderH

  /** (doc_id, payload, media_meta): each document rendered as a REAL
    * 8-bit grayscale PNG — pixel p (row-major) is the text byte at
    * `(p·len)/300` — via `javax.imageio`. Deterministic by
    * construction: the render is a pure function of the text and PNG
    * round-trips 8-bit gray losslessly, so downstream decoded-pixel
    * features are SQL-oracle-checkable. Runs as the same batched
    * per-partition pattern as [[extractFeatures]] (one encoder setup
    * per partition). Documents shorter than 1 byte are dropped. */
  def renderPngCorpus(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id").cast(LongType),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false) // no temp-file cache
        rows.flatMap { r =>
          val b = r.payload
          if (b.isEmpty) None
          else {
            val img = new java.awt.image.BufferedImage(
              RenderW, RenderH, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            val raster = img.getRaster
            var p = 0
            while (p < RenderN) {
              val v = b(((p.toLong * b.length) / RenderN).toInt) & 0xff
              raster.setSample(p % RenderW, p / RenderW, 0, v)
              p += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", bos)
            Some(MediaRow(r.doc_id, bos.toByteArray))
          }
        }
      }
      .toDF()
      .select(col("doc_id"), col("payload"),
        struct(lit("image/png").as("media_type"),
          lit(RenderW).as("width"), lit(RenderH).as("height"))
          .as("media_meta"))
  }

  final case class MediaHash(doc_id: Long, phash: Long)

  /** Bit k set when value k exceeds the mean of all 60 (integer
    * cross-multiplied — no division, no float). The shared bit rule
    * under every 60-bit fingerprint here (pixel samples, byte
    * samples, audio frame energies), so the hash spaces stay
    * directly comparable and one banding path serves all. */
  private def bitsAboveMean(vals: Array[Long]): Long = {
    val sum = vals.sum
    var h = 0L
    var k = 0
    while (k < 60) {
      if (vals(k) * 60 > sum) h |= 1L << k
      k += 1
    }
    h
  }

  /** The 60-bit average-hash over a linear sample grid: sample k is
    * the value at index (k·n)/60. Shared by the decoded-pixel and
    * raw-byte paths. */
  private def aHash60(sampleAt: Int => Int, n: Int): Long =
    bitsAboveMean(
      Array.tabulate(60)(k => sampleAt(((k.toLong * n) / 60).toInt).toLong))

  /** Perceptual hash over GENUINELY DECODED pixels: `ImageIO.read` the
    * payload, flatten the first raster band row-major, and average-hash
    * 60 evenly-spaced pixels ([[aHash60]]). Payloads ImageIO cannot
    * decode (no codec, corrupt) fall back to the raw-byte sampling of
    * [[pHashStub]] — per row, so one bad payload cannot fail the job —
    * and images with fewer than 60 pixels (or undecodable payloads
    * shorter than 60 bytes) are dropped, mirroring the stub's
    * no-stable-grid rule. For [[renderPngCorpus]] images the result
    * equals the text-side arithmetic exactly (see [[RenderW]]), which
    * is what lets a SQL oracle certify the decode. */
  def pHashDecoded(binary: DataFrame): Dataset[MediaHash] = {
    val spark = binary.sparkSession
    import spark.implicits._
    binary.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.flatMap { r =>
          val img =
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(r.payload))
            catch { case scala.util.control.NonFatal(_) => null }
          if (img != null) {
            val w = img.getWidth; val h = img.getHeight
            val n = w * h
            if (n < 60) None
            else {
              val raster = img.getRaster
              Some(MediaHash(r.doc_id,
                aHash60(q => raster.getSample(q % w, q / w, 0), n)))
            }
          } else if (r.payload.length < 60) None
          else Some(MediaHash(r.doc_id,
            aHash60(q => r.payload(q) & 0xff, r.payload.length)))
        }
      }
  }

  /** Average-hash perceptual fingerprint over the binary payload — the
    * aHash family (public literature: 60 evenly-sampled "pixels",
    * bit k = sample k above the sample mean), computed in the decode
    * stage ([[decodeStub]]'s per-partition batched pattern). A real
    * image pipeline swaps the byte sampling for an 8×8 grayscale
    * downscale; the hash algebra, banding, and verify are unchanged.
    * 60 bits (not 64) so the hash stays a positive BIGINT in every
    * engine — integer arithmetic only, so the DuckDB oracle matches
    * bit-for-bit. Payloads shorter than 60 bytes are dropped (no
    * stable sample grid). */
  def pHashStub(binary: DataFrame): Dataset[MediaHash] = {
    val spark = binary.sparkSession
    import spark.implicits._
    binary.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val n = r.payload.length
          if (n < 60) None
          else Some(MediaHash(r.doc_id,
            aHash60(q => r.payload(q) & 0xff, n)))
        }
      }
  }

  /** The 4×15-bit banding of a (doc_id, phash) frame —
    * (doc_id, phash, band, key) with band ∈ [0,4) and key = bits
    * [15·band, 15·band+15). With ≤ 3 differing bits at least one band
    * is untouched (pigeonhole), so a (band, key) equi-join over two
    * banded sides is a COMPLETE candidate set for hamming ≤ 3. Shared
    * by the self-join ([[phashNearDup]]), the cross-side probe
    * ([[phashNearDupAgainst]]), and the persisted index layout (store
    * this output; at corpus scale, partitioned/bucketed by
    * (band, key)). */
  def bandedPhash(hashes: DataFrame): DataFrame =
    hashes.select(col("doc_id"), col("phash"),
        explode(expr(
          "transform(sequence(0, 3), b -> " +
            "struct(b AS band, shiftright(phash, 15 * b) & 32767 AS key))"))
          .as("bk"))
      .select(col("doc_id"), col("phash"),
        col("bk.band").as("band"), col("bk.key").as("key"))

  /** Incremental media near-dup: probe a NEW batch of fingerprints
    * against a STORED banded corpus index ([[bandedPhash]] rows) —
    * the daily path, where the increment pays hashing + banding over
    * the batch only and the corpus side is read, never recomputed.
    * Same completeness argument and verify as [[phashNearDup]];
    * cross-side, so no ordering constraint — output
    * (id_new, id_corpus, hamming). */
  def phashNearDupAgainst(batchHashes: DataFrame, corpusBanded: DataFrame,
                          maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3,
      "4x15 banding is only complete for hamming <= 3")
    bandedPhash(batchHashes).as("n")
      .join(corpusBanded.as("c"),
        col("n.band") === col("c.band") && col("n.key") === col("c.key"))
      .select(col("n.doc_id").as("id_new"), col("c.doc_id").as("id_corpus"),
        col("n.phash").as("h_n"), col("c.phash").as("h_c"))
      // verify BEFORE distinct, as in phashNearDup: only true near-dup
      // rows reach the distinct's exchange
      .withColumn("hamming", bit_count(expr("h_n ^ h_c")).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("id_new", "id_corpus", "hamming")
      .distinct()
  }

  /** Record `removeDocIds` (a 1-column doc_id frame) as taken down
    * from a persisted banded phash index — the media-family entry of
    * the shared [[Tombstones]] lifecycle (the store a DMCA request
    * hits first): a doc's 4 banded rows are spread over buckets, so
    * the takedown appends to the side table (O(|removal|), zero
    * rewrite) and probes anti-join it until [[compactPhashIndex]]
    * folds it into the files. */
  def phashTakedown(removeDocIds: DataFrame, table: String): Unit =
    Tombstones.record(removeDocIds.toDF("id"), table)

  /** The stored banded phash index minus tombstoned doc_ids — feed
    * this to [[phashNearDupAgainst]] for a takedown-aware probe. The
    * anti-join broadcasts (takedown-sized side table), so the probe's
    * plan shape is unchanged. */
  def phashIndexRetracted(s: SparkSession, table: String): DataFrame =
    Tombstones.minus(s, table,
        s.table(table).withColumnRenamed("doc_id", "id"))
      .withColumnRenamed("id", "doc_id")

  /** Fold the phash index's tombstones into its data files (crash-safe
    * two-phase swap, see [[Tombstones.compact]]): after this the files
    * genuinely no longer carry the removed docs and probes pay zero.
    * `parts` must name the index table's partition columns. */
  def compactPhashIndex(s: SparkSession, table: String,
                        parts: Seq[String] = Seq("band")): Unit =
    Tombstones.compact(s, table, Seq((table, parts)), idCol = "doc_id")

  /** Perceptual-hash near-dup pairs with Hamming distance ≤
    * `maxHamming` (≤ 3): band the 60-bit hash into 4×15-bit keys —
    * with ≤ 3 differing bits at least one band is untouched
    * (pigeonhole), so the band-bucket equi-join is a COMPLETE
    * candidate set — then verify candidates with an exact
    * `bit_count(xor)`. The simhash banding argument applied to media
    * fingerprints: no all-pairs scan, one equi-join on (band, key),
    * partial-aggregable distinct. Output (id_a, id_b, hamming). */
  def phashNearDup(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3,
      "4x15 banding is only complete for hamming <= 3")
    val banded = bandedPhash(hashes)
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.phash").as("h_a"), col("b.phash").as("h_b"))
      // verify BEFORE distinct: bit_count per candidate row is far
      // cheaper than shuffling it — random single-band collisions and
      // the up-to-4x duplicates of true pairs die here, so the
      // distinct's exchange carries only near-dup rows
      .withColumn("hamming",
        bit_count(expr("h_a ^ h_b")).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
      .distinct()
  }

  /** Audio render geometry: 600 16-bit PCM samples per document — 60
    * fingerprint frames of 10 samples — so frame k covers samples
    * [10k, 10k+10) exactly and the text-side oracle replays the
    * energies with one integer sum per frame. */
  val AudioSamples = 600
  val AudioFrames = 60
  private val AudioFrameLen = AudioSamples / AudioFrames
  private val AudioFormat8k = new javax.sound.sampled.AudioFormat(
    8000f, 16, 1, true, false) // 8 kHz, 16-bit, mono, signed, little-endian

  /** Canonical RIFF/WAVE container around a 16-bit mono 8 kHz PCM
    * body — byte-identical to what `AudioSystem.write(...,
    * Type.WAVE, ...)` emits for [[AudioFormat8k]] (pinned by
    * `PhashSpec`'s header test), without the per-call
    * audio-file-writer provider scan that dominated the sf10 store
    * build (136.4 s for 500k docs, r13 sweep log): 44-byte header =
    * RIFF(len) WAVE fmt(16: PCM, 1ch, 8000 Hz, byteRate 16000,
    * block 2, bits 16) data(len). */
  private[graft] def wavBytes(pcm: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](44 + pcm.length)
    val bb = java.nio.ByteBuffer.wrap(out)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + pcm.length)
      .put("WAVEfmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort)          // PCM
      .putShort(1.toShort)          // mono
      .putInt(8000)                 // sample rate
      .putInt(16000)                // byte rate = rate · block align
      .putShort(2.toShort)          // block align = ch · bits/8
      .putShort(16.toShort)         // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(pcm.length)
      .put(pcm)
    out
  }

  /** PCM sample j of a document: the text byte at (j·len)/600,
    * centered and scaled to 16-bit range — (b − 128)·256. One
    * definition serves the render, the decoded-side expectation in
    * specs, and the SQL oracle's arithmetic. */
  private def pcmSample(b: Array[Byte], j: Int): Int =
    (((b(((j.toLong * b.length) / AudioSamples).toInt) & 0xff) - 128) * 256)

  /** (doc_id, payload, media_meta): each document rendered as a REAL
    * 16-bit PCM WAV (RIFF container written by
    * `javax.sound.sampled.AudioSystem` — the audio twin of
    * [[renderPngCorpus]]). PCM is lossless, so decoded samples equal
    * [[pcmSample]] exactly and downstream fingerprints are
    * SQL-oracle-checkable. Empty documents are dropped. */
  def renderWavCorpus(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id").cast(LongType),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          if (r.payload.isEmpty) None
          else {
            val pcm = new Array[Byte](AudioSamples * 2)
            var j = 0
            while (j < AudioSamples) {
              val v = pcmSample(r.payload, j)
              pcm(2 * j) = (v & 0xff).toByte        // little-endian
              pcm(2 * j + 1) = ((v >> 8) & 0xff).toByte
              j += 1
            }
            Some(MediaRow(r.doc_id, wavBytes(pcm)))
          }
        }
      }
      .toDF()
      .select(col("doc_id"), col("payload"),
        struct(lit("audio/wav").as("media_type"),
          lit(8000).as("sample_rate"),
          lit(AudioSamples).as("n_samples")).as("media_meta"))
  }

  final case class AudioFp(doc_id: Long, afp: Long)

  /** Clean-room RIFF/WAVE parser for the bulk fingerprint path:
    * returns the decoded 16-bit little-endian mono PCM samples, or
    * None for anything that is not that exact shape (non-RIFF bytes,
    * PCM format codes other than 1, multi-channel, other bit depths,
    * a missing fmt/data chunk). A REAL chunk walker — chunk order is
    * free, unknown chunks are skipped, odd sizes consume their RIFF
    * pad byte, and a data chunk claiming more bytes than the stream
    * holds yields only the samples actually present (the caller's
    * sample-count check rejects truncations, same as the
    * AudioSystem path it replaces did).
    *
    * WHY not AudioSystem here (r15, measured): every
    * `AudioSystem.getAudioInputStream` call goes through a
    * synchronized JVM-global provider registry — 8 decode threads
    * reach only 1.55x ONE thread's throughput (microbench in
    * BASELINE), and the sf10 sweep's audio gates ran at system load
    * ~1 on 32 cores (q_multimodal_audio_fp 729 s, 62.8x the sf1
    * reading for 10x rows). On a 1000-executor cluster every
    * 16-thread executor would convoy on the same lock. Equivalence
    * with the AudioSystem decode is pinned by AudioParseSpec over
    * rendered, mutated, and truncated containers; the fingerprint
    * gates' DuckDB oracles pin the end-to-end chain as before. */
  private[graft] def parseWavPcm16Mono(b: Array[Byte])
      : Option[Array[Int]] = {
    def u16(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def u32(o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    def tag(o: Int) = new String(b, o, 4, "US-ASCII")
    if (b.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12
    var fmtOk = false
    var dataOff = -1
    var dataLen = 0L
    // walk every chunk: [4-byte id][4-byte size][payload][pad to even]
    while (off + 8 <= b.length) {
      val id = tag(off)
      val size = u32(off + 4)
      val payload = off + 8
      if (id == "fmt " && size >= 16 && payload + 16 <= b.length) {
        fmtOk = u16(payload) == 1 &&      // PCM format code
          u16(payload + 2) == 1 &&        // mono
          u16(payload + 14) == 16         // bits per sample
      } else if (id == "data" && dataOff < 0) {
        dataOff = payload
        dataLen = size
      }
      val advance = size + (size & 1L) // RIFF pads chunks to even
      // a size field pointing past the stream (oversized/corrupt
      // declaration) ends the walk — chunks already found stay valid,
      // and the data clamp below bounds what a lying length can claim
      off =
        if (advance > b.length.toLong - payload) b.length
        else payload + advance.toInt
    }
    if (!fmtOk || dataOff < 0) return None
    val avail = math.max(0L, math.min(dataLen, (b.length - dataOff).toLong))
    val n = (avail / 2).toInt
    Some(Array.tabulate(n)(j =>
      (b(dataOff + 2 * j + 1) << 8) | (b(dataOff + 2 * j) & 0xff)))
  }

  /** 60-bit audio fingerprint over GENUINELY DECODED samples:
    * `AudioSystem.getAudioInputStream` parses the container, the PCM
    * frames are read back, and bit k is frame k's energy
    * (Σ |sample| over its [[AudioFrameLen]] samples) against the mean
    * frame energy ([[bitsAboveMean]]) — the spectral-free skeleton of
    * an acoustic fingerprint, integer-exact so the SQL oracle pins
    * the whole render→encode→decode→energy chain. Non-audio payloads
    * fall back to the raw-byte average-hash (same 60-bit space, per
    * row); payloads under 60 bytes are dropped. Only whole frames
    * with the render geometry fingerprint via energies — a decoded
    * stream with a different sample count hashes by bytes too, so a
    * truncated container cannot silently alias a healthy one. */
  def audioFingerprint(binary: DataFrame): Dataset[AudioFp] = {
    val spark = binary.sparkSession
    import spark.implicits._
    binary.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          // lock-free clean-room container parse (see
          // parseWavPcm16Mono's scaladoc for the measured AudioSystem
          // global-lock convoy this replaces; AudioParseSpec pins the
          // decode equivalence)
          val decoded: Option[Array[Int]] =
            try parseWavPcm16Mono(r.payload)
              .filter(_.length == AudioSamples)
            catch {
              // degrade per row, never the task
              case scala.util.control.NonFatal(_) => None
            }
          decoded match {
            case Some(samples) =>
              val energies = Array.tabulate(AudioFrames) { k =>
                var s = 0L; var j = k * AudioFrameLen
                val end = j + AudioFrameLen
                while (j < end) { s += math.abs(samples(j)); j += 1 }
                s
              }
              Some(AudioFp(r.doc_id, bitsAboveMean(energies)))
            case None if r.payload.length < 60 => None
            case None => Some(AudioFp(r.doc_id,
              aHash60(q => r.payload(q) & 0xff, r.payload.length)))
          }
        }
      }
  }

  /** Frames per rendered GIF "video" — frame f samples the text's f-th
    * quarter-window: pixel p of frame f is the byte at
    * `((f·300 + p)·len) / 1200`, so the per-frame hash grid stays on
    * the one-division arithmetic a SQL oracle can replay (sample k of
    * frame f = byte at ((f·300 + 5k)·len) // 1200). */
  val VideoFrames = 4

  /** (doc_id, payload, media_meta): each document rendered as a REAL
    * multi-frame animated GIF (`ImageIO` sequence writer) — the
    * video-container twin of [[renderPngCorpus]]: [[VideoFrames]]
    * grayscale 20×15 frames, each a window render of the text. GIF's
    * 256-entry palette holds every 8-bit gray level, so the roundtrip
    * is pixel-exact (pinned in PhashSpec) and frame features stay
    * SQL-oracle-checkable. Empty documents are dropped. */
  def renderGifCorpus(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val nf = VideoFrames
    documents.select(col("doc_id").cast(LongType),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // the container is written by [[Gif89a]], not the imageio GIF
        // plugin: the plugin's per-frame IIOMetadata tree conversion
        // (GIFImageWriter.convertMetadata/mergeTree — jstack-confirmed
        // hot path) cost ~100× the pixel + LZW work at these frame
        // sizes and dominated the sf10 store build (391.6 s for 500k
        // docs, r13 sweep log). Decoded-pixel exactness through the
        // real imageio READER is pinned by PhashSpec and the
        // round-trip fuzz specs — the raster byte IS the palette
        // index and the gray global table maps i → (i,i,i).
        val frames = Array.fill(nf)(new Array[Byte](RenderN))
        rows.flatMap { r =>
          val b = r.payload
          if (b.isEmpty) None
          else {
            var f = 0
            while (f < nf) {
              val fr = frames(f)
              var p = 0
              while (p < RenderN) {
                fr(p) = b((((f * RenderN + p).toLong * b.length)
                  / (nf * RenderN)).toInt)
                p += 1
              }
              f += 1
            }
            Some(MediaRow(r.doc_id,
              Gif89a.encodeGray(frames, RenderW, RenderH)))
          }
        }
      }
      .toDF()
      .select(col("doc_id"), col("payload"),
        struct(lit("image/gif").as("media_type"),
          lit(nf).as("n_frames"), lit(RenderW).as("width"),
          lit(RenderH).as("height")).as("media_meta"))
  }

  final case class FrameHash(doc_id: Long, frame_idx: Int, fhash: Long)

  /** Frame sampling + fingerprinting over GENUINELY DECODED video
    * frames: parse the container with an `ImageReader` sequence, keep
    * every `everyK`-th frame, and average-hash each kept frame's
    * pixels ([[aHash60]] over the decoded raster, palette resolved
    * through getRGB so indexed formats land on true gray values) —
    * the scene-fingerprint access pattern. Undecodable payloads fall
    * back to hashing [[VideoFrames]] equal byte chunks (per row;
    * chunks under 60 bytes, or frames under 60 pixels, are dropped —
    * no stable grid). */
  def frameHashes(binary: DataFrame, everyK: Int = 1): Dataset[FrameHash] = {
    val spark = binary.sparkSession
    import spark.implicits._
    val nf = VideoFrames
    binary.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.flatMap { r =>
          val decoded: Seq[(Int, Option[Long])] =
            try {
              val rd = javax.imageio.ImageIO
                .getImageReadersByFormatName("gif").next()
              val iis = javax.imageio.ImageIO.createImageInputStream(
                new java.io.ByteArrayInputStream(r.payload))
              try {
                rd.setInput(iis)
                val n = rd.getNumImages(true)
                (0 until n).map { f =>
                  // sampling happens BEFORE the read: skipped frames
                  // are never decoded (the point of frame sampling)
                  f -> (if (f % everyK != 0) None
                  else {
                    val img = rd.read(f)
                    val w = img.getWidth; val h = img.getHeight
                    val np = w * h
                    if (np < 60) None
                    else Some(aHash60(
                      q => img.getRGB(q % w, q / w) & 0xff, np))
                  })
                }
              } finally { rd.dispose(); iis.close() }
            } catch { case _: Exception => Seq.empty }
          val frames: Seq[(Int, Option[Long])] =
            if (decoded.nonEmpty) decoded
            else {
              // byte fallback: nf equal chunks of the raw payload
              // (a zero-frame parse is as undecodable as a throw)
              val n = r.payload.length
              (0 until nf).map { f =>
                val c0 = (f.toLong * n / nf).toInt
                val c1 = ((f + 1).toLong * n / nf).toInt
                f -> (if (f % everyK != 0 || c1 - c0 < 60) None
                else Some(aHash60(
                  q => r.payload(c0 + q) & 0xff, c1 - c0)))
              }
            }
          frames.collect {
            case (f, Some(h)) if f % everyK == 0 => FrameHash(r.doc_id, f, h)
          }
        }
      }
  }

  /** Video near-dup over per-frame fingerprints — the scene-level
    * member of the near-dup family: both sides are
    * (doc_id, frame_idx, fhash) rows from [[frameHashes]]' REAL
    * container decode, each frame hash is banded with the same 4×15
    * split as [[bandedPhash]] (complete for per-frame hamming ≤ 3),
    * candidates join on (frame_idx, band, key) — a batch frame only
    * meets corpus frames at the SAME timeline position, the
    * temporal-alignment assumption of splice-twin detection — and a
    * video pair is emitted when at least `minFrames` of its aligned
    * frames verify within `maxHamming`. Verify runs BEFORE the
    * per-frame distinct (multi-band hits collapse after the cheap
    * xor, as in [[phashNearDup]]). Scale shape: banding fans each
    * frame into 4 key rows; the join is bucket-sized per
    * (frame_idx, band, key), never all-pairs; the per-pair frame
    * count is one partial-aggregable groupBy. Output
    * (id_new, id_corpus, n_frames_matched), near-dups only. */
  def videoNearDup(batchFrames: DataFrame, corpusFrames: DataFrame,
                   maxHamming: Int = 3, minFrames: Int = 3): DataFrame = {
    require(maxHamming <= 3,
      "4x15 banding is only complete for hamming <= 3")
    def banded(df: DataFrame, idAs: String, hAs: String): DataFrame =
      df.select(col("doc_id").as(idAs), col("frame_idx"),
          col("fhash").as(hAs),
          explode(expr(
            "transform(sequence(0, 3), b -> " +
              "struct(b AS band, shiftright(fhash, 15 * b) & 32767 AS key))"))
            .as("bk"))
        .select(col(idAs), col("frame_idx"), col(hAs),
          col("bk.band").as("band"), col("bk.key").as("key"))
    banded(batchFrames, "id_new", "h_n")
      .join(banded(corpusFrames, "id_corpus", "h_c"),
        Seq("frame_idx", "band", "key"))
      .filter(expr(s"bit_count(h_n ^ h_c) <= $maxHamming"))
      .select("id_new", "id_corpus", "frame_idx").distinct()
      .groupBy("id_new", "id_corpus")
      .agg(count(lit(1)).as("n_frames_matched"))
      .filter(col("n_frames_matched") >= minFrames)
  }

  /** Frame sampling: split the payload into fixed-size "frames" and
    * keep every k-th — the video-frame-sample access pattern, done with
    * built-ins so it stays codegen'd and explode-parallel. */
  def sampleFrames(binary: DataFrame, frameBytes: Int,
                   everyK: Int): DataFrame = {
    val nFrames = ceil(length(col("payload")) / lit(frameBytes.toDouble))
      .cast(IntegerType)
    binary.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), nFrames - 1), i =>
          substring(col("payload"), (i * frameBytes) + lit(1),
            lit(frameBytes)))))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame")
      .filter(col("frame_idx") % everyK === 0)
      .withColumn("frame_bytes", length(col("frame")))
  }
}
