package graft.ops

import org.apache.spark.sql.DataFrame
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
