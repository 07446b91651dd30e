package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClassifySpec extends SparkSpec {
  import spark.implicits._

  test("centroidTrain: exact floor-division means per label, " +
      "negative sums included") {
    val train = Seq(
      (0L, Seq(1L, -1L)), (0L, Seq(2L, -2L)),  // means: 1, floor(-3/2)=-2
      (1L, Seq(10L, 10L))
    ).toDF("label", "qv")
    val cents = Classify.centroidTrain(train, "label", "qv")
      .orderBy("lab").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq
    assert(cents == Seq(0L -> Seq(1L, -2L), 1L -> Seq(10L, 10L)))
  }

  test("centroidClassify: nearest centroid wins, ties to the smaller " +
      "label, hit flags exact") {
    val train = Seq(
      (0L, Seq(0L, 0L)), (1L, Seq(10L, 0L)), (2L, Seq(0L, 10L))
    ).toDF("label", "qv")
    val cents = Classify.centroidTrain(train, "label", "qv")
    val test = Seq(
      (100L, 0L, Seq(1L, 1L)),   // nearest (0,0) -> pred 0, hit
      (101L, 2L, Seq(1L, 9L)),   // nearest (0,10) -> pred 2, hit
      (102L, 1L, Seq(0L, 10L)),  // exactly on centroid 2 -> pred 2, miss
      (103L, 0L, Seq(5L, 0L))    // tie d=25 between labels 0 and 1 -> 0
    ).toDF("vec_id", "label", "qv")
    val out = Classify.centroidClassify(test, cents,
      "vec_id", "label", "qv").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(out == Seq(
      (100L, 0L, 2L, 1L),
      (101L, 2L, 2L, 1L),
      (102L, 2L, 0L, 0L),
      (103L, 0L, 25L, 1L)))
  }

  test("uncertaintyMargin: d2 - d1 against the literal model, zero on " +
      "exact ties, pred follows the smaller label") {
    val train = Seq(
      (0L, Seq(0L, 0L)), (1L, Seq(10L, 0L)), (2L, Seq(0L, 10L))
    ).toDF("label", "qv")
    val model = Classify.centroidModel(train, "label", "qv")
    assert(model == Seq(0L -> Seq(0L, 0L), 1L -> Seq(10L, 0L),
      2L -> Seq(0L, 10L)))
    val test = Seq(
      (1L, Seq(1L, 0L)),  // d=(1, 81, 101): margin 80, pred 0
      (2L, Seq(5L, 0L)),  // d=(25, 25, 125): tie -> margin 0, pred 0
      (3L, Seq(0L, 9L))   // d=(81, 181, 1): margin 80, pred 2
    ).toDF("vec_id", "qv").withColumn("label", lit(0L))
    val out = Classify.uncertaintyMargin(test, model, "vec_id", "qv")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 0L, 80L), (2L, 0L, 0L), (3L, 2L, 80L)))
  }

  test("broadcast scoring (centroidClassify) == literal-model fold " +
      "(centroidAssignCol) on seeded random data — the batch path and " +
      "the streaming projection must agree row-for-row") {
    val rnd = new scala.util.Random(55L)
    def vec() = Seq.fill(8)(rnd.nextLong().abs % 2000L - 1000L)
    val train = (0 until 120).map(i => (i.toLong % 6, vec()))
      .toDF("label", "qv")
    val test = (0 until 80).map(i => (1000L + i, rnd.nextLong().abs % 6,
      vec())).toDF("vec_id", "label", "qv")
    val cents = Classify.centroidTrain(train, "label", "qv")
    val model = Classify.centroidModel(train, "label", "qv")
    val broadcastPath = Classify
      .centroidClassify(test, cents, "vec_id", "label", "qv")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq
    val best = Classify.centroidAssignCol(model, col("qv"))
    val literalPath = test.select(col("vec_id").as("id"),
        best.getField("lab").as("pred"), best.getField("d").as("d"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(broadcastPath == literalPath)
  }
}
