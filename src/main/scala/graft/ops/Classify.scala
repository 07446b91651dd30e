package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Nearest-class-centroid (Rocchio) classification over quantized
  * embedding vectors — the trained-model filtering stage of a curation
  * pipeline (fastText-style quality/domain classifiers reduce to
  * exactly this shape once embeddings exist): fit one centroid per
  * label on a training split, then label unseen vectors by nearest
  * centroid. Reference scope: none (the reference has no ML surface);
  * LLM-pipeline brief.
  *
  * Same integer-milli discipline as [[Clustering]]: per-dimension
  * centroid means are exact floor divisions, distances exact integer
  * squared-L2 — bit-identical on any engine at any parallelism, so a
  * SQL oracle pins both training and scoring.
  *
  * Scale shape (100 TB corpus): training is ONE partial-aggregable
  * shuffle of (label, dim) cells — |labels|·dim rows regardless of
  * corpus size; the model is |labels|·dim longs (KB-sized), so scoring
  * is a broadcast nested-loop against the label-count-bounded centroid
  * table folded by a partial-aggregable min-struct — per-row work, no
  * corpus shuffle, nothing driver-collected. */
object Classify {

  /** (lab: long, cv: array<long>) — one integer-mean centroid per
    * label of `train(labelCol, qvCol: array<long>)`. `(s - pmod(s, n))
    * div n` is exact floor division for negative sums too (the same
    * identity as the Lloyd update, DuckDB twin
    * `(s - ((s % n + n) % n)) // n`). */
  def centroidTrain(train: DataFrame, labelCol: String,
                    qvCol: String): DataFrame =
    train
      .select(col(labelCol).cast(LongType).as("lab"),
        posexplode(col(qvCol)))
      .groupBy("lab", "pos")
      .agg(sum("col").as("s"), count(lit(1)).as("n"))
      .select(col("lab"), col("pos"),
        expr("(s - pmod(s, n)) div n").as("m"))
      .groupBy("lab")
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("m")))),
        x => x.getField("m")).as("cv"))

  /** The trained model as driver-side state: |labels| rows of
    * (label, centroid) — KB-sized by the label-domain bound, the same
    * contract as Clustering's codebook collects. This is the form a
    * STREAMING scorer needs: the model folds into a literal expression
    * so scoring is a stateless projection (no stream-side join or
    * aggregation). */
  def centroidModel(train: DataFrame, labelCol: String,
                    qvCol: String): Seq[(Long, Seq[Long])] =
    centroidTrain(train, labelCol, qvCol).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toSeq.sortBy(_._1)

  /** (d, lab) struct of the nearest centroid in the LITERAL `model` —
    * min over |labels| codegen'd candidates, ties to the smaller
    * label (struct order). Same argmin the broadcast path computes;
    * usable in batch and unchanged inside a streaming projection. */
  def centroidAssignCol(model: Seq[(Long, Seq[Long])],
                        qv: Column): Column = {
    require(model.nonEmpty, "centroidAssignCol needs a non-empty model")
    array_min(array(model.map { case (lab, cv) =>
      struct(Clustering.l2sqLong(array(cv.map(lit): _*), qv).as("d"),
        lit(lab).as("lab"))
    }: _*))
  }

  /** Margin-based ACTIVE-LEARNING selection: the holdout rows whose
    * best-vs-second-best centroid distance gap is smallest are the
    * ones a labeling budget buys the most from (classic
    * smallest-margin uncertainty sampling). Returns (id, pred,
    * margin) for every row of `test` — margin = d₂ − d₁ ≥ 0, exact
    * integers; the caller ranks ascending and takes its batch. Same
    * literal-model fold as [[centroidAssignCol]], extended to the
    * top-2 by sorting the |labels|-sized candidate array in the
    * projection — still per-row work, no shuffle. */
  def uncertaintyMargin(test: DataFrame, model: Seq[(Long, Seq[Long])],
                        idCol: String, qvCol: String): DataFrame = {
    require(model.size >= 2, "uncertaintyMargin needs >= 2 labels")
    val cands = array_sort(array(model.map { case (lab, cv) =>
      struct(Clustering.l2sqLong(array(cv.map(lit): _*), col(qvCol))
        .as("d"), lit(lab).as("lab"))
    }: _*))
    test.select(col(idCol).cast(LongType).as("id"),
      element_at(cands, 1).getField("lab").as("pred"),
      (element_at(cands, 2).getField("d") -
        element_at(cands, 1).getField("d")).as("margin"))
  }

  /** Score `test(idCol, labelCol, qvCol)` against `centroids(lab, cv)`
    * ([[centroidTrain]] output): (id, label_true, pred, dist_sq, hit)
    * — nearest centroid, ties to the smaller label. The centroid side
    * is broadcast by construction (bounded by the label domain). */
  def centroidClassify(test: DataFrame, centroids: DataFrame,
                       idCol: String, labelCol: String,
                       qvCol: String): DataFrame =
    test.select(col(idCol).cast(LongType).as("id"),
        col(labelCol).cast(LongType).as("label_true"), col(qvCol).as("qv"))
      .crossJoin(broadcast(centroids))
      .select(col("id"), col("label_true"),
        struct(Clustering.l2sqLong(col("qv"), col("cv")).as("d"),
          col("lab")).as("cand"))
      .groupBy("id", "label_true")
      .agg(min(col("cand")).as("best"))
      .select(col("id"), col("label_true"),
        col("best").getField("lab").as("pred"),
        col("best").getField("d").as("dist_sq"),
        when(col("best").getField("lab") === col("label_true"), 1L)
          .otherwise(0L).as("hit"))
}
