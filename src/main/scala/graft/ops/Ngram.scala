package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-fit n-gram language-model scoring — the KenLM-style fluency
  * filter of training-data pipelines, kept EXACT: instead of summed
  * log-probabilities (transcendental, engine-divergent), each bigram
  * contributes its conditional probability in integer micro-units
  * (`1e6 * c(w1 w2) div c(w1 ·)`, floor division) and a document
  * scores the integer mean of its bigram contributions. Rank-wise this
  * orders documents by mean in-corpus bigram probability — gibberish
  * and boilerplate-free text score low, repeated high-frequency
  * constructions score high — and every value is reproducible bit-for-
  * bit in ANSI SQL.
  *
  * Scale shape: tokenization and bigram expansion are per-row
  * (codegen'd higher-order functions, no UDF); the model is two
  * partial-aggregable counts (bigram, first-word) re-joined onto the
  * bigram occurrences — three hash shuffles total, all on token keys,
  * broadcast-free and skew-tolerant (hot words partial-aggregate
  * map-side). At 100 TB the two count tables are the stored "model";
  * scoring a new batch reuses them as bucketed tables. */
object Ngram {

  /** Per-document mean bigram probability in micro-units over
    * lowercased whitespace tokens. Documents with fewer than two
    * tokens have no bigram and are excluded. Output:
    * (idCol, n_bigrams, score_micro).
    *
    * Tokenizer contract: the split class is pinned to the EXPLICIT
    * five whitespace chars `[ \t\n\r\f]` — Java's `\s` includes
    * vertical tab (\x0B) while RE2's `\s` excludes it, so a `\s+`
    * split is a latent cross-engine divergence on VT-bearing text —
    * and empty tokens (leading separators) are filtered, matching
    * [[Retrieval]]'s tokenizer. */
  def bigramCoherence(docs: DataFrame, idCol: String,
                      textCol: String): DataFrame = {
    val base = docs
      .select(col(idCol),
        filter(split(trim(lower(col(textCol))), "[ \\t\\n\\r\\f]+"),
          t => t =!= "").as("t"))
      .where(size(col("t")) >= 2)
    val bigrams = base.select(col(idCol), explode(expr(
        "transform(slice(t, 1, size(t) - 1), (w, i) -> " +
          "struct(w AS w1, element_at(t, i + 2) AS w2))")).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val c2 = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = bigrams.groupBy("w1").agg(count(lit(1)).as("c1"))
    bigrams
      .join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
      .withColumn("q", expr("CAST(1000000 AS BIGINT) * c2 div c1"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        expr("sum(q) div count(*)").cast("long").as("score_micro"))
  }

  /** Reference-fit smoothed bigram surprisal — the CCNet-style
    * perplexity filter (Wenzek et al., "CCNet: Extracting High
    * Quality Monolingual Datasets from Web Crawl Data"): fit an LM on
    * a CLEAN reference slice (`refPred`, e.g. the target language),
    * score EVERY document against it, and let out-of-model text
    * surface with high surprisal. Where CCNet sums KenLM
    * log-probabilities, this engine stays transcendental-free: each
    * bigram contributes its Laplace-smoothed INVERSE conditional
    * probability in integer milli-units,
    *
    *   ip = (1000 * (c1(w1) + V)) div (c2(w1,w2) + 1)
    *
    * (pure integer floor division — no float anywhere), and a
    * document scores the integer mean of its bigram contributions.
    * The arithmetic mean of 1/p upper-bounds the geometric mean
    * (= perplexity) and moves the same direction: an unseen bigram
    * contributes ~1000*(c1+V) — the same hard penalty that makes
    * perplexity a fluency filter — while the existing
    * [[bigramCoherence]] (mean of p) barely notices one rare bigram.
    * V = distinct reference unigrams (the Laplace event space), so
    * unseen-prev bigrams fall back to the uniform 1/V.
    *
    * Output: (idCol, n_bigrams, n_unseen, surprisal_milli); documents
    * with fewer than two tokens have no bigram and are excluded.
    *
    * Scale shape: the model is two partial-aggregable count tables
    * over the REFERENCE slice only, re-joined onto the target bigram
    * occurrences — shuffle joins on token keys (hot words partial-
    * aggregate map-side; a deployment that prunes the model to top-K
    * bigrams, as CCNet does, can broadcast it instead). V rides along
    * as a broadcast 1-row cross join, never a driver collect. */
  def refLmSurprisal(docs: DataFrame, refPred: Column, idCol: String,
                     textCol: String): DataFrame = {
    val base = docs
      .select(col(idCol),
        filter(split(trim(lower(col(textCol))), "[ \\t\\n\\r\\f]+"),
          t => t =!= "").as("t"),
        refPred.as("__ref"))
      .where(size(col("t")) >= 2)
    def bigramsOf(df: DataFrame, cols: Column*): DataFrame =
      df.select(cols :+ explode(expr(
          "transform(slice(t, 1, size(t) - 1), (w, i) -> " +
            "struct(w AS w1, element_at(t, i + 2) AS w2))")).as("bg"): _*)
        .select(cols :+ col("bg.w1").as("w1") :+ col("bg.w2").as("w2"): _*)
    val ref = base.where(col("__ref"))
    val rbg = bigramsOf(ref)
    val c2 = rbg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = rbg.groupBy("w1").agg(count(lit(1)).as("c1"))
    val vDf = ref.select(explode(col("t")).as("x"))
      .agg(count_distinct(col("x")).as("v"))
    bigramsOf(base, col(idCol))
      .join(c2, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(vDf))
      .withColumn("ip", expr(
        "(1000 * (coalesce(c1, CAST(0 AS BIGINT)) + v)) div " +
          "(coalesce(c2, CAST(0 AS BIGINT)) + 1)"))
      .withColumn("unseen",
        when(col("c2").isNull, lit(1L)).otherwise(lit(0L)))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("unseen")).as("n_unseen"),
        expr("sum(ip) div count(*)").cast("long").as("surprisal_milli"))
  }

  /** CCNet's head/middle/tail split on [[refLmSurprisal]] scores:
    * tercile buckets along the GLOBAL (surprisal_milli, id) order —
    * bucket 1 = most in-model ("head"), 3 = least ("tail"). The
    * global rank comes from [[GlobalOrder.withGlobalIndex]] (range-
    * repartitioned two-pass scan), NOT a single-partition window —
    * the percentile cut survives a 100 TB corpus. Output appends
    * (idx, bucket); bucket = 1 + (3 * idx) div n over the n scored
    * documents. */
  def surprisalBuckets(scored: DataFrame, idCol: String): DataFrame = {
    // n comes from the index pass's per-partition scalars — a separate
    // scored.count() would RECOMPUTE the whole scoring lineage (model
    // fit included) for one number; measured 12.3 s vs 6.8 s for the
    // scoring pass alone at sf1 before this was folded in
    val (indexed, n) = GlobalOrder.withGlobalIndexAndCount(scored,
      Seq(col("surprisal_milli"), col(idCol)), out = "idx")
    indexed.withColumn("bucket",
      expr(s"CAST(1 + (3 * idx) div ${n}L AS INT)"))
  }

  /** DuckDB oracle twin of [[refLmSurprisal]] over relation
    * `rel(idCol, textCol, ...)`: `refPredSql` is the reference-slice
    * predicate over `rel`'s columns. Same tokenization, same pure
    * integer floor divisions. */
  def refLmSurprisalSql(rel: String, idCol: String, textCol: String,
                        refPredSql: String): String =
    s"""WITH tokt AS (SELECT $idCol,
       |    list_filter(string_split_regex(trim(lower($textCol)),
       |      '[ \\t\\n\\r\\f]+'), x -> x <> '') AS t
       |  FROM $rel),
       |ref AS (SELECT t FROM tokt JOIN $rel USING ($idCol)
       |  WHERE ($refPredSql) AND len(t) >= 2),
       |rbg AS (SELECT u['w1'] AS w1, u['w2'] AS w2 FROM (
       |  SELECT unnest(list_transform(range(1, len(t)),
       |    i -> {'w1': t[i], 'w2': t[i + 1]})) AS u FROM ref)),
       |c2 AS (SELECT w1, w2, count(*) AS c2 FROM rbg GROUP BY w1, w2),
       |c1 AS (SELECT w1, count(*) AS c1 FROM rbg GROUP BY w1),
       |v AS (SELECT count(DISTINCT x) AS v FROM (
       |  SELECT unnest(t) AS x FROM ref)),
       |tbg AS (SELECT $idCol, u['w1'] AS w1, u['w2'] AS w2 FROM (
       |  SELECT $idCol, unnest(list_transform(range(1, len(t)),
       |    i -> {'w1': t[i], 'w2': t[i + 1]})) AS u FROM tokt
       |  WHERE len(t) >= 2)),
       |q AS (SELECT tbg.$idCol,
       |    (1000 * (coalesce(c1.c1, 0) + v.v)) //
       |      (coalesce(c2.c2, 0) + 1) AS ip,
       |    CASE WHEN c2.c2 IS NULL THEN 1 ELSE 0 END AS unseen
       |  FROM tbg LEFT JOIN c2 ON c2.w1 = tbg.w1 AND c2.w2 = tbg.w2
       |    LEFT JOIN c1 ON c1.w1 = tbg.w1 CROSS JOIN v)
       |SELECT $idCol, count(*) AS n_bigrams,
       |  CAST(sum(unseen) AS BIGINT) AS n_unseen,
       |  CAST(sum(ip) // count(*) AS BIGINT) AS surprisal_milli
       |FROM q GROUP BY $idCol""".stripMargin

  /** DuckDB oracle twin over relation `rel(idCol, textCol)` — same
    * tokenization, same integer floor divisions. */
  def bigramCoherenceSql(rel: String, idCol: String,
                         textCol: String): String =
    s"""WITH base AS (SELECT $idCol,
       |    list_filter(string_split_regex(trim(lower($textCol)),
       |      '[ \\t\\n\\r\\f]+'), x -> x <> '') AS t
       |  FROM $rel),
       |bg AS (SELECT $idCol, u['w1'] AS w1, u['w2'] AS w2 FROM (
       |  SELECT $idCol, unnest(list_transform(range(1, len(t)),
       |    i -> {'w1': t[i], 'w2': t[i + 1]})) AS u FROM base)),
       |c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2),
       |c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
       |q AS (SELECT bg.$idCol,
       |    (1000000 * c2.c2) // c1.c1 AS q
       |  FROM bg JOIN c2 ON c2.w1 = bg.w1 AND c2.w2 = bg.w2
       |    JOIN c1 ON c1.w1 = bg.w1)
       |SELECT $idCol, count(*) AS n_bigrams,
       |  CAST(sum(q) // count(*) AS BIGINT) AS score_micro
       |FROM q GROUP BY $idCol""".stripMargin
}
