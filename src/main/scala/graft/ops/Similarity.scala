package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Near-duplicate detection and vector similarity for training-data
  * pipelines: MinHash+LSH, SimHash, n-gram Jaccard, cosine.
  *
  * Scale design (100 TB):
  *  - Shingling/minhashing are per-row projections (codegen, no shuffle).
  *  - LSH banding turns the O(n²) all-pairs problem into an equi-join on
  *    (band, bucket): one hash-partition shuffle on bucket keys; only
  *    rows sharing a bucket ever meet. Skewed buckets (giant clusters)
  *    are handled by AQE skew-join splitting.
  *  - Verification (exact Jaccard) runs only on candidate pairs.
  *  - Cosine: query side broadcast; scan side streams — no shuffle. */
object Similarity {

  /** k MinHash values of a (distinct) shingle array: for each seed j,
    * min over shingles of xxhash64(shingle, j). */
  def minHashSignature(shingles: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), j =>
      array_min(transform(shingles, s => xxhash64(s, j))))

  /** LSH bucket ids: the signature split into `bands` bands of
    * `rowsPerBand` values, each band hashed to one bucket key. */
  def lshBuckets(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      xxhash64(b, slice(sig, b * rowsPerBand + lit(1), lit(rowsPerBand))))

  /** Candidate pairs (idA < idB) of rows sharing ≥1 LSH bucket.
    * `df` must carry `id` (long) and `shingles` (array<string>). One
    * shuffle on (band, bucket). */
  def lshCandidatePairs(df: DataFrame, k: Int, bands: Int): DataFrame = {
    val r = k / bands
    val withBuckets = df.withColumn("__sig",
        minHashSignature(col("shingles"), k))
      .withColumn("__bucket",
        explode(lshBuckets(col("__sig"), bands, r)))
      .select(col("id"), col("__bucket"))
    val a = withBuckets.as("a")
    val b = withBuckets.as("b")
    a.join(b, col("a.__bucket") === col("b.__bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Exact Jaccard similarity of two distinct-element arrays, in
    * floor-rounded milli-units (engine-exact integer). */
  def jaccardMilli(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    val union = size(a) + size(b) - inter
    floor(lit(1000.0) * inter / union + 0.5).cast(LongType)
  }

  /** MinHash-LSH near-duplicate pairs with exact-Jaccard verification:
    * candidates from [[lshCandidatePairs]], kept iff the true shingle
    * Jaccard ≥ threshold (milli). False positives are eliminated by the
    * verify join; false-negative probability is (1-J^r)^bands — pick
    * bands/r so it is negligible at the target J. */
  def nearDupPairs(docs: DataFrame, k: Int = 32, bands: Int = 16,
                   thresholdMilli: Int = 800): DataFrame = {
    val cands = lshCandidatePairs(docs, k, bands)
    val sa = docs.select(col("id").as("id_a"), col("shingles").as("sh_a"))
    val sb = docs.select(col("id").as("id_b"), col("shingles").as("sh_b"))
    cands.join(sa, "id_a").join(sb, "id_b")
      .withColumn("jaccard_milli", jaccardMilli(col("sh_a"), col("sh_b")))
      .filter(col("jaccard_milli") >= thresholdMilli)
      .select("id_a", "id_b", "jaccard_milli")
  }

  /** 64-bit SimHash over whitespace tokens: per-bit majority vote of
    * token xxhash64 bits, packed MSB-first into one long. */
  def simhash64(text: Column): Column = {
    val hashes = transform(TextOps.tokens(text), t => xxhash64(t))
    val n = size(hashes)
    val bits = transform(sequence(lit(0), lit(63)), i =>
      when(aggregate(hashes, lit(0L),
        (acc, h) => acc + call_function("shiftright", h, i)
          .bitwiseAND(lit(1L))) * 2 > n,
        lit(1L)).otherwise(lit(0L)))
    // shiftleft|or, not acc*2+b: the MSB step would overflow-throw
    // under ANSI; bitwise ops wrap
    aggregate(bits, lit(0L), (acc, b) => shiftleft(acc, 1).bitwiseOR(b))
  }

  /** Hamming distance between two packed 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Deterministic double cosine similarity between two float vectors,
    * in floor-rounded milli-units. Elements are cast to double BEFORE
    * multiply/accumulate and summed sequentially (aggregate), so any
    * engine computing the same formula gets bit-identical IEEE results. */
  def cosineMilli(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) = aggregate(
      zip_with(x, y, (p, q) => p.cast(DoubleType) * q.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)
    val cos = dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
    floor(lit(1000.0) * cos + 0.5).cast(LongType)
  }
}
