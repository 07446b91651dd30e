package graft.queries

import graft.SparkSpec

/** Pins the bench setup-pass contract ([[Registry.prepares]]): every
  * registered one-time store build runs cleanly, is idempotent on
  * re-entry (second pass must not rebuild — it reads the marker /
  * catalog entry and returns fast), and names are unique. A prepare
  * that throws silently degrades the bench back to in-gate builds, so
  * this is the regression net for the setup pass itself. */
class PreparesSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("every prepare runs, is idempotent, and names are unique") {
    val names = Registry.prepares.map(_._1)
    assert(names.distinct == names, s"duplicate prepare names: $names")
    assert(names.nonEmpty)
    Registry.prepares.foreach { case (name, fn) =>
      fn(spark, sf) // first build — must not throw
      val t0 = System.nanoTime()
      fn(spark, sf) // re-entry — must hit the guard, not rebuild
      val sec = (System.nanoTime() - t0) / 1e9
      assert(sec < 5.0,
        s"prepare '$name' re-ran its build on re-entry ($sec s)")
    }
  }
}
