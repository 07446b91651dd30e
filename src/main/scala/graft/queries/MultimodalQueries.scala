package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables._
import graft.ops.Multimodal

/** Multimodal binary-column queries. The decode is a deterministic
  * byte-level stub (no codecs in this container — see
  * graft.ops.Multimodal); because the payload is the UTF-8 bytes of
  * ASCII text, the DuckDB oracle can recompute the same features from
  * the text column, verifying the whole binary pipeline end to end. */
object MultimodalQueries {

  def all: Seq[Q] = Seq(

    Q("q_multimodal_features",
      (s, d) => Multimodal.extractFeatures(
          Multimodal.binaryCorpus(documents(s, d)))
        .toDF().orderBy("doc_id"),
      Some("""
        |WITH f AS (SELECT doc_id, length(text) AS n_bytes,
        |    ord(substr(text, 1, 1)) AS first_byte,
        |    ord(substr(text, length(text), 1)) AS last_byte,
        |    CAST(list_sum(list_transform(range(1, length(text) + 1),
        |      i -> ord(substr(text, i, 1)))) AS BIGINT) AS checksum
        |  FROM documents)
        |SELECT doc_id, n_bytes, first_byte, last_byte, checksum,
        |  CAST(checksum % 640 AS INTEGER) AS width,
        |  CAST(checksum % 480 AS INTEGER) AS height
        |FROM f ORDER BY doc_id
        |""".stripMargin.trim)),

    // resize stub: every-4th-byte downsample; oracle recomputes the
    // same downsample from the text characters (payload = ASCII bytes)
    Q("q_multimodal_resize",
      (s, d) => Multimodal.resizeStub(
          Multimodal.binaryCorpus(documents(s, d)), everyK = 4)
        .toDF().orderBy("doc_id"),
      Some("""
        |SELECT doc_id, length(text) AS n_bytes,
        |  len(range(1, length(text) + 1, 4)) AS n_bytes_resized,
        |  md5(array_to_string(list_transform(
        |    range(1, length(text) + 1, 4),
        |    i -> substr(text, i, 1)), '')) AS fp_resized
        |FROM documents ORDER BY doc_id
        |""".stripMargin.trim)),

    Q("q_multimodal_frames",
      (s, d) => Multimodal.sampleFrames(
          Multimodal.binaryCorpus(documents(s, d)),
          frameBytes = 32, everyK = 2)
        .select("doc_id", "frame_idx", "frame_bytes")
        .orderBy("doc_id", "frame_idx"),
      Some("""
        |WITH n AS (SELECT doc_id, length(text) AS len,
        |    CAST(ceil(length(text) / 32.0) AS INTEGER) AS n_frames
        |  FROM documents)
        |SELECT doc_id, i AS frame_idx,
        |  least(32, len - i * 32) AS frame_bytes
        |FROM n, LATERAL (SELECT unnest(range(0, n_frames)) AS i)
        |WHERE i % 2 = 0 ORDER BY doc_id, frame_idx
        |""".stripMargin.trim)),

    // ---- perceptual-hash near-dup over binary payloads --------------
    // Planted twins (one byte spliced at a fixed offset, length
    // preserved) against a 60-bit average-hash: banded candidate join
    // (complete for hamming <= 3) + exact bit_count verify. The oracle
    // recomputes the hash from the text (payload = ASCII bytes) and
    // does the all-pairs compare the banded form avoids — pinning
    // completeness, not just precision.
    Q("q_multimodal_phash_neardup",
      (s, d) => {
        val base = documents(s, d).filter(length(col("text")) >= 60)
          .select("doc_id", "text")
        val corpus = base.unionByName(base.select(
          (col("doc_id") + 3000000L).as("doc_id"),
          concat(substring(col("text"), 1, 9), lit("Z"),
            expr("substring(text, 11)")).as("text")))
        val hashes = Multimodal.pHashStub(
          Multimodal.binaryCorpus(corpus)).toDF()
        Multimodal.phashNearDup(hashes, maxHamming = 3)
          .orderBy("id_a", "id_b")
      },
      Some("""
        |WITH base AS (SELECT doc_id, text FROM documents
        |  WHERE length(text) >= 60),
        |corpus AS (SELECT doc_id, text FROM base
        |  UNION ALL SELECT doc_id + 3000000,
        |    concat(substr(text, 1, 9), 'Z', substr(text, 11))
        |  FROM base),
        |ph AS (SELECT doc_id,
        |    list_transform(range(0, 60),
        |      k -> ord(substr(text, 1 + (k * length(text)) // 60, 1)))
        |      AS bs
        |  FROM corpus),
        |h AS (SELECT doc_id, CAST(list_sum(list_transform(range(0, 60),
        |    k -> CASE WHEN bs[k + 1] * 60 > list_sum(bs)
        |      THEN CAST(1 AS BIGINT) << k ELSE CAST(0 AS BIGINT) END))
        |    AS BIGINT) AS phash FROM ph)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
        |FROM h a JOIN h b ON a.doc_id < b.doc_id
        |  AND bit_count(xor(a.phash, b.phash)) <= 3
        |ORDER BY id_a, id_b
        |""".stripMargin.trim))
  )
}
