package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-retrieval primitives over a document corpus: inverted index
  * and BM25 ranking — the search/decontamination stage of a data
  * pipeline (find training docs matching an eval query, rank corpus
  * hits for inspection).
  *
  * BM25 here is the LN-FREE RATIONAL form the engine uses everywhere
  * a float transcendental would break engine portability (see
  * q_tfidf_topterms): idf's log is dropped and its rational argument
  * `(N - df + 0.5) / (df + 0.5)` used directly — monotone in the same
  * direction, so rankings for same-length term sets are log-BM25
  * consistent, and every double op (one division per factor, one
  * product) is IEEE correctly-rounded in a FIXED order, so the one
  * milli rounding point reproduces bit-exactly on any engine. Per-term
  * milli scores are then INTEGER-summed per doc — associative, safe
  * under any aggregation order.
  *
  * Scale shape: tokenize+explode is per-row local work; tf is one
  * partial-aggregable (doc, term) shuffle; df and the corpus scalars
  * (N, avgdl) are KB-sized aggregates broadcast back; the score join
  * touches only docs containing >= 1 query term. */
object Retrieval {

  // split class pinned like TextOps.tokens (Java \s includes VT,
  // RE2 \s does not)
  private[ops] def toks(textCol: Column): Column =
    filter(split(trim(lower(textCol)), "[ \\t\\n\\r\\f]+"), t => t =!= "")

  /** (term, df, postings): every distinct term with its document
    * frequency and the sorted ids of containing docs, comma-joined —
    * a STRING so the cross-engine gate compares a canonical value
    * (array reprs differ between engines' parquet/pandas bridges). At
    * 100 TB keep the (term, id) ROW form; a hot term's posting list is
    * then just a big key group, not a giant value in one row. */
  def invertedIndex(docs: DataFrame, idCol: String,
                    textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
        explode(toks(col(textCol))).as("term"))
      .groupBy("term")
      // df DERIVED from the collected set: a countDistinct beside a
      // collect_set would plan an Expand (one input row per aggregate)
      // and double the shuffled rows for no information gain
      .agg(sort_array(collect_set(col("id"))).as("ids"))
      .select(col("term"), size(col("ids")).cast("long").as("df"),
        array_join(col("ids"), ",").as("postings"))

  /** The per-(doc, term) milli score expression over integer columns
    * `tf, df, dl, n_docs, total_tokens` — ONE milli rounding point,
    * fixed double-op order; the SINGLE definition behind both the
    * payload path ([[bm25TopK]]) and the stored-stats path
    * ([[InvertedIndexStore.bm25FromStore]]), and mirrored textually by
    * [[scoreSql]], so the three can never drift. */
  private[ops] def termScoreMilli: Column = {
    val avgdl = col("total_tokens").cast("double") /
      col("n_docs").cast("double")
    val idf = ((col("n_docs") - col("df")).cast("double") + lit(0.5d)) /
      (col("df").cast("double") + lit(0.5d))
    val tnorm = (col("tf").cast("double") * lit(2.2d)) /
      (col("tf").cast("double") +
        lit(1.2d) * (lit(0.25d) + lit(0.75d) *
          (col("dl").cast("double") / avgdl)))
    floor(lit(1000.0d) * (idf * tnorm) + lit(0.5d)).cast("long")
  }

  /** Final ranking shared by both BM25 paths: integer-sum the term
    * scores per doc, take k without the unpartitioned-window scale
    * cliff — orderBy + limit plans as TakeOrderedAndProject
    * (per-partition heap of k, driver merge of k·partitions rows);
    * the rank window then runs over the ALREADY-REDUCED k rows, so
    * its single-partition exchange moves k rows, not the corpus-sized
    * scored-doc set a common query term would produce. */
  private[ops] def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score_milli").desc, col("id").asc)
    scored
      .groupBy("id")
      .agg(sum(col("term_score")).as("score_milli"))
      .orderBy(col("score_milli").desc, col("id").asc)
      .limit(k)
      .withColumn("rank", row_number().over(w))
      .select("rank", "id", "score_milli")
  }

  /** Top-k docs for `queryTerms` by rational-BM25 (k1 = 1.2,
    * b = 0.75), ties to the smaller id. Returns
    * (rank, id, score_milli). */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int): DataFrame = {
    val tok = docs.select(col(idCol).as("id"),
      explode(toks(col(textCol))).as("term"))
    val dl = tok.groupBy("id").agg(count(lit(1)).as("dl"))
    // corpus scalars: N over ALL docs (tokenless docs count), total
    // token mass; one row, broadcast into the scoring join
    val scalars = docs.agg(count(lit(1)).as("n_docs")).crossJoin(
      tok.agg(count(lit(1)).as("total_tokens")))
    val qt = tok.filter(col("term").isin(queryTerms: _*))
    val tf = qt.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    // df from tf, not a second distinct pass over the token stream:
    // tf already holds exactly one row per present (doc, term)
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    rankTopK(
      tf.join(broadcast(df), "term")
        .join(dl, "id")
        .crossJoin(broadcast(scalars))
        .withColumn("term_score", termScoreMilli),
      k)
  }

  /** Top-k docs by summed tf-rarity ([[Corpus.tfRarityMilli]]) over
    * the query terms — the lexical scorer RRF pairs with BM25: a
    * deliberately different ranking signal (pure rarity ratio, no
    * length normalization) from the same token stream. Returns
    * (rank, id, score_milli); same [[rankTopK]] bounded-heap shape. */
  def tfRarityTopK(docs: DataFrame, idCol: String, textCol: String,
                   queryTerms: Seq[String], k: Int): DataFrame = {
    val qt = docs.select(col(idCol).as("id"),
        explode(toks(col(textCol))).as("term"))
      .filter(col("term").isin(queryTerms: _*))
    val tf = qt.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    rankTopK(
      tf.join(broadcast(df), "term")
        .withColumn("term_score",
          Corpus.tfRarityMilli(col("tf"), col("df"))),
      k)
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Büttcher, SIGIR 2009):
    * fuse the rankings of heterogeneous retrievers —
    * score(d) = Σ_lists 1/(c + rank_list(d)), c = 60 — the standard
    * hybrid-retrieval combiner (lexical + semantic) because it needs
    * only RANKS, never the incomparable scores. Integer-exact here:
    * each contribution is 1000000 div (c + rank) — pure integer
    * division, engine-identical — so the fused ordering carries no
    * float at all. Inputs are (rank, id, ...) frames already
    * truncated to their own top-k (rank-k truncation is part of RRF's
    * definition); output (rank, id, rrf_milli, n_lists), ties to the
    * smaller id.
    *
    * Scale shape: inputs are k-bounded, so the union + groupBy is
    * trivially small per query; with many queries the same plan runs
    * partitioned by query id. The final rank window runs over the
    * limit(k) output — bounded, like [[rankTopK]]. */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, c: Int = 60): DataFrame = {
    val parts = rankings.map(_.select(col("id"),
      expr(s"1000000 div ($c + rank)").as("__part")))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("rrf_milli").desc, col("id").asc)
    parts.reduce(_.unionByName(_))
      .groupBy("id")
      .agg(sum("__part").as("rrf_milli"), count(lit(1)).as("n_lists"))
      .orderBy(col("rrf_milli").desc, col("id").asc).limit(k)
      .withColumn("rank", row_number().over(w))
      .select("rank", "id", "rrf_milli", "n_lists")
  }

  /** The DuckDB twin of [[bm25TopK]]'s per-term score expression —
    * generated beside the Spark formula so the two can never drift.
    * Operand names: integer columns/values `tf, df, dl, n_docs,
    * total_tokens`. */
  def scoreSql(tf: String, df: String, dl: String, nDocs: String,
               totalTokens: String): String = {
    val avgdl = s"(CAST($totalTokens AS DOUBLE) / CAST($nDocs AS DOUBLE))"
    val idf = s"((CAST($nDocs - $df AS DOUBLE) + 0.5) / " +
      s"(CAST($df AS DOUBLE) + 0.5))"
    val tnorm = s"((CAST($tf AS DOUBLE) * 2.2) / " +
      s"(CAST($tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * " +
      s"(CAST($dl AS DOUBLE) / $avgdl))))"
    s"CAST(floor(1000.0 * ($idf * $tnorm) + 0.5) AS BIGINT)"
  }
}
