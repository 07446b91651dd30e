package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, decoded/feature-extracted via typed `mapPartitions` (the
  * Scala analogue of `mapInPandas` batch UDFs).
  *
  * The DECODE STEP IS A DETERMINISTIC STUB — this container has no
  * image/audio codecs, so `decodeStub` derives "features" from raw
  * bytes. The Spark-side plumbing is real and is what's under test:
  * binary column schema, per-partition batched decode (one
  * iterator pass per partition — exactly how a JNI/codec call would be
  * amortized), typed output schema, and frame-sampling explode.
  * Swapping `decodeStub` for a real codec changes no plan shape. */
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

  final case class MediaHash(doc_id: Long, phash: Long)

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
          else {
            val samples = Array.tabulate(60) { k =>
              r.payload(((k.toLong * n) / 60).toInt) & 0xff
            }
            val sum = samples.sum
            var h = 0L
            var k = 0
            while (k < 60) {
              if (samples(k) * 60 > sum) h |= 1L << k
              k += 1
            }
            Some(MediaHash(r.doc_id, h))
          }
        }
      }
  }

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
    val banded = hashes.select(col("doc_id"), col("phash"),
        explode(expr(
          "transform(sequence(0, 3), b -> " +
            "struct(b AS band, shiftright(phash, 15 * b) & 32767 AS key))"))
          .as("bk"))
      .select(col("doc_id"), col("phash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
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
