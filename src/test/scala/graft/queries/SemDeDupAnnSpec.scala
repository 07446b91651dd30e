package graft.queries

import graft.SparkSpec

/** The agreement BOUND behind q_semdedup_ann: the gate's oracle pins
  * the exact agreement numbers (hash-compared), but a pinned number
  * could in principle be pinned LOW — this spec is the floor that says
  * the ANN-assigned variant is a faithful stand-in for the exact
  * SemDeDup path, the claim the deployment swap rests on. Measured:
  * 980‰ at sf0.001, 973‰ at sf0.01 (clusterings differ at boundaries;
  * near-identical pairs co-locate under both). */
class SemDeDupAnnSpec extends SparkSpec {

  test("ANN-assigned SemDeDup agrees with the exact path: " +
      "agree_milli >= 950, dup sets overlap substantially") {
    val r = graft.SparkEntry.queries("q_semdedup_ann")(
      spark, "/root/testdata/sf0.001").collect().head
    val (n, exact, ann, both, agree) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))
    assert(n === 1000L)
    assert(agree >= 950L,
      s"ANN/exact flag agreement dropped to $agree milli")
    // the dup sets must be near-coincident, not just same-sized:
    // the overlap holds >= 95% of the smaller set
    assert(both * 100L >= math.min(exact, ann) * 95L,
      s"dup-set overlap degraded: exact=$exact ann=$ann both=$both")
  }
}
