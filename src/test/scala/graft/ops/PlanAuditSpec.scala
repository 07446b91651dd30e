package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** [[PlanAudit]]: each hazard class detected on a frame built to plan
  * it, a clean equi-join shape reports nothing, and assertClean's
  * allowlist admits exactly the named kind. */
class PlanAuditSpec extends SparkSpec {
  import spark.implicits._

  private val left = (1 to 50).map(i => (i.toLong, s"l$i")).toDF("id", "a")
  private val right = (1 to 40).map(i => (i.toLong, s"r$i")).toDF("id", "b")

  test("cartesian product is flagged") {
    // tiny sides auto-broadcast into a BNLJ; a true CartesianProduct
    // only plans when neither side broadcasts — force that
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val cross = left.crossJoin(right)
      val kinds = PlanAudit.audit(cross).map(_.kind).distinct
      assert(kinds.contains("cartesian"), s"got $kinds")
      assertThrows[IllegalStateException](PlanAudit.assertClean(cross))
    } finally spark.conf.set(key, prev)
  }

  test("broadcast nested-loop join is flagged, and allowlisting the " +
      "kind admits it") {
    val theta = left.join(broadcast(right),
      left("id") < right("id"), "inner")
    val kinds = PlanAudit.audit(theta).map(_.kind).distinct
    assert(kinds.contains("bnlj"), s"got $kinds")
    assertThrows[IllegalStateException](PlanAudit.assertClean(theta))
    PlanAudit.assertClean(theta, allow = Set("bnlj")) // no throw
  }

  test("unpartitioned window is flagged; a host-partitioned window " +
      "is not") {
    val global = left.withColumn("rn",
      row_number().over(Window.orderBy("id")))
    assert(PlanAudit.audit(global).map(_.kind).contains("global_window"))
    val partitioned = left.withColumn("rn",
      row_number().over(Window.partitionBy("a").orderBy("id")))
    assert(!PlanAudit.audit(partitioned).map(_.kind)
      .contains("global_window"))
  }

  test("a global window hiding inside a scalar subquery is flagged " +
      "(collectWithSubqueries, r10 review)") {
    left.createOrReplaceTempView("pa_audit_l")
    val df = spark.sql(
      """SELECT * FROM pa_audit_l WHERE id < (
        |  SELECT max(rn) FROM (
        |    SELECT row_number() OVER (ORDER BY id) AS rn
        |    FROM pa_audit_l))""".stripMargin)
    assert(PlanAudit.audit(df).map(_.kind).contains("global_window"),
      "the subquery's single-partition window must not audit clean")
  }

  test("a broadcast equi-join + partial aggregate audits clean") {
    val clean = left.join(broadcast(right), Seq("id"))
      .groupBy("a").agg(count(lit(1)).as("n"))
    assert(PlanAudit.audit(clean).isEmpty)
    PlanAudit.assertClean(clean) // no throw
  }
}
