package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min Sketch as a typed, partial-aggregable `Aggregator`: a
  * depth×width counter matrix where each hashed item increments one
  * cell per row and a point estimate is the MIN across rows — the
  * classic bounded-memory frequency sketch for heavy-hitter queries
  * over unbounded key domains.
  *
  * Scale properties:
  *  - merge is elementwise SUM — commutative and associative, so the
  *    result is INDEPENDENT of partitioning/merge order (unlike
  *    Misra-Gries-style summaries) and map-side combine applies;
  *  - fixed depth×width memory regardless of key cardinality;
  *  - estimate(x) ≥ true(x) always; overshoot ≤ 2N/width with
  *    probability 1 - 2^-depth (standard CMS bound — the full-avalanche
  *    per-row hashes below behave as an independent family for this
  *    bound in practice; they are not a PROVEN pairwise-independent
  *    family, so treat the probability as the usual heuristic reading).
  *
  * Hashing: each row applies the splitmix64 finalizer to the item
  * xor'd with a distinct per-row seed — every output bit depends on
  * every input bit, so the cell index is well-distributed even for
  * power-of-two widths (a plain multiply-mod would collide identically
  * across all rows on keys agreeing in the low bits). Deterministic on
  * any JVM, no serialized hash-function state in the buffer (the
  * buffer is a plain Array[Long], natively encodable). */
class CountMinSketchAgg(depth: Int, width: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {

  // distinct per-row seeds (odd constants, splitmix64/xxhash-derived)
  private val A = Array(0x9E3779B97F4A7C15L, 0xBF58476D1CE4E5B9L,
    0x94D049BB133111EBL, 0xD6E8FEB86659FD93L,
    0xA5A5A5A5A5A5A5A5L, 0xC2B2AE3D27D4EB4FL)
  require(depth >= 1 && depth <= A.length, s"depth must be in [1, ${A.length}]")
  require(width >= 1, "width must be >= 1")

  // splitmix64 finalizer: full avalanche, bijective on Long
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private[functions] def cell(d: Int, x: Long): Int = {
    val h = mix(x ^ A(d))
    // non-negative mod
    (((h % width) + width) % width).toInt
  }

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], x: Long): Array[Long] = {
    var d = 0
    while (d < depth) { buf(d * width + cell(d, x)) += 1; d += 1 }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  /** Point estimate from a finished sketch. */
  def estimate(sketch: Array[Long], x: Long): Long = {
    var m = Long.MaxValue
    var d = 0
    while (d < depth) {
      val v = sketch(d * width + cell(d, x))
      if (v < m) m = v
      d += 1
    }
    m
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
