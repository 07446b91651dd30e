package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Corpus-curation operators for training-data pipelines: term
  * weighting, deterministic sampling, and context-window packing.
  * All outputs are exact integers or hash strings so the DuckDB
  * oracles can replicate them bit-for-bit (no transcendental math —
  * see [[tfRarityMilli]]). */
object Corpus {

  /** Exact-integer TF-IDF-style weight: floor(1000·tf/df + 0.5).
    * Uses the plain rarity ratio rather than ln(N/df): IEEE division
    * is exactly reproducible across engines, while libm `ln` differs
    * in final ulps between implementations and flips floor boundaries.
    * Ranking behavior matches log-idf for fixed tf (both monotone
    * decreasing in df). */
  def tfRarityMilli(tf: Column, df: Column): Column =
    floor(lit(1000.0) * tf / df + 0.5).cast(LongType)

  /** Top-k terms per document by tf-rarity (ties: term asc).
    * Input: (idCol, textCol). Output: (id, rank, term, tf, df,
    * score_milli).
    *
    * Scale shape (100 TB): tokenize+explode is a per-row projection;
    * tf and df are partial-aggregable groupBys; the df join is a
    * shuffle equi-join on term (vocab can be huge — deliberately NOT
    * broadcast; AQE may still choose broadcast when the vocab fits);
    * the final top-k window benefits from WindowGroupLimit pushdown
    * (rank filter applied before full sort). */
  def topTermsPerDoc(df0: DataFrame, idCol: String, textCol: String,
                     k: Int): DataFrame = {
    val terms = df0
      .select(col(idCol).as("id"),
        explode(TextOps.tokens(lower(col(textCol)))).as("term"))
      .filter(col("term") =!= "")
    val tf = terms.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = terms.groupBy("term")
      .agg(countDistinct(col("id")).as("df"))
    val w = Window.partitionBy("id")
      .orderBy(col("score_milli").desc, col("term").asc)
    tf.join(dfreq, "term")
      .withColumn("score_milli", tfRarityMilli(col("tf"), col("df")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("id", "rank", "term", "tf", "df", "score_milli")
  }

  /** Deterministic stratified sample: within each `strata` group keep
    * the `k` rows ranked first by md5 of the row id — a seedless,
    * engine-portable stand-in for uniform sampling (md5 is uniform in
    * the id, reproducible everywhere, and independent of row order).
    *
    * Scale shape: one hash-partition shuffle on the strata key; the
    * per-group top-k is a rank window with WindowGroupLimit pushdown,
    * so each partition keeps k candidates before any full sort.
    * Churn under corpus growth is BOUNDED, not zero: an id's md5 key
    * never changes, so it stays sampled until k newer docs hash below
    * it — each insertion evicts at most one sampled id (consistent
    * sampling), unlike seeded random sampling where any reshuffle
    * replaces the whole sample. */
  def stratifiedHashSample(df0: DataFrame, strata: Seq[String],
                           idCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
    df0.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
  }

  /** The AGGREGATE form of [[stratifiedHashSample]] — a deterministic
    * bounded reservoir ([[graft.functions.ReservoirAgg]]): within each
    * stratum keep the k ids with the smallest md5(id ‖ ':' ‖ seed)
    * priorities. Identical sample to the window form with the same
    * priority expression (the gate pins them equal cross-engine), but
    * computed as partial-aggregable bounded state: each map task ships
    * at most k pairs per stratum — no per-group sort, no window — so
    * it survives unknown-n streams and hot strata where the window
    * form pays a corpus-sized sort. Varying `seed` varies the draw
    * (inclusion-frequency guarantee checked in ReservoirSpec). Output:
    * strata columns + (sample_rank, idCol), rank in priority order. */
  def reservoirSample(df0: DataFrame, strata: Seq[String], idCol: String,
                      k: Int, seed: String): DataFrame = {
    val prio = md5(concat(col(idCol).cast("string"), lit(":" + seed)))
    df0.groupBy(strata.map(col): _*)
      .agg(graft.functions.ReservoirAgg.reservoir(k)(
        prio, col(idCol).cast("long")).as("__smp"))
      .select(strata.map(col) :+ posexplode(col("__smp")): _*)
      .select(strata.map(col) ++ Seq(
        (col("pos") + 1).cast("int").as("sample_rank"),
        col("col._2").as(idCol)): _*)
  }

  /** Deterministic TRAINING-MIXTURE sample: per-source quotas (the
    * domain-reweighting knob of a training-data pipeline — N docs of
    * web, M of code, K of reference) filled by the same md5 rank as
    * [[stratifiedHashSample]], so the mixture is reproducible,
    * growth-stable (an id's rank never changes), and engine-portable.
    * Sources absent from `quotas` are excluded — the mixture IS the
    * allowlist. Scale shape: one strata shuffle + rank-window with
    * group-limit pushdown; quotas ride in as a broadcast literal map. */
  def mixtureSample(df0: DataFrame, sourceCol: String, idCol: String,
                    quotas: Map[String, Int]): DataFrame = {
    val quotaCol = quotas.foldLeft(lit(-1)) { case (acc, (src, q)) =>
      when(col(sourceCol) === src, lit(q)).otherwise(acc)
    }
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
    df0.withColumn("__quota", quotaCol)
      .filter(col("__quota") > 0)
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= col("__quota"))
      .drop("__quota")
  }

  /** Greedy token-budget packing: within each shard, walk rows in
    * `orderCol` order and assign bin = (tokens-before-this-row) div
    * budget — consecutive documents fill a context window until the
    * budget spills into the next bin. Exact integer math end to end.
    *
    * Scale shape: packing is inherently sequential, so parallelism
    * comes from the shard column (pick shards = O(cluster cores);
    * documents are packed independently per shard — the standard
    * pre-shuffle sharding of a packing job). One window per shard
    * partition, no global sort. */
  def packByTokenBudget(df0: DataFrame, shardCol: String,
                        orderCol: String, tokenCol: String,
                        budget: Long): DataFrame = {
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df0.withColumn("cum_tokens", sum(col(tokenCol)).over(w))
      // integer `div`, not `/`: Column./ on longs is DOUBLE division,
      // which loses exactness once cumulative counts pass 2^53
      .withColumn("bin",
        expr(s"(cum_tokens - $tokenCol) div ${budget}L"))
  }

  /** GPT-style concat-and-split: documents are conceptually
    * concatenated in `orderCol` order within each shard and the token
    * stream cut into fixed `window`-token training examples, doc
    * boundaries crossed ([[packByTokenBudget]] is the other standard
    * shape — whole docs per bin, no splitting). Emits one row per
    * (document, window) OVERLAP: `win` is the window index within the
    * shard, `a_tok`/`b_tok` the doc-relative half-open token span that
    * lands in that window — exactly the metadata an attention-reset
    * mask needs, and a long document spans as many rows as windows it
    * crosses. `off` (tokens before the doc in its shard) rides along.
    * Pure integer arithmetic; rows with `tokenCol` <= 0 are dropped
    * (an empty doc occupies no window; including it would also flip
    * `sequence()` into descending mode on its empty range).
    *
    * Invariants (pinned in spec): each doc's spans partition
    * [0, tokens); each (shard, win) holds exactly `window` tokens
    * except the shard's last window.
    *
    * Scale shape: one shuffle on the shard key + a streaming
    * rows-frame window for the running offset, then a per-row explode
    * bounded by ceil(tokens/window) — no global sort, no driver
    * state; shards parallelize (pick shards = O(cluster cores)). */
  def concatSplitWindows(df0: DataFrame, shardCol: String,
                         orderCol: String, tokenCol: String,
                         window: Long): DataFrame = {
    require(window > 0, "window must be positive")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df0.where(col(tokenCol) > 0)
      .withColumn("cum_tokens",
        sum(col(tokenCol).cast("long")).over(w))
      .withColumn("off", col("cum_tokens") - col(tokenCol))
      .withColumn("win", explode(sequence(
        expr(s"off div ${window}L"),
        expr(s"(cum_tokens - 1) div ${window}L"))))
      .withColumn("a_tok",
        greatest(lit(0L), expr(s"win * ${window}L - off")))
      .withColumn("b_tok",
        least(col(tokenCol).cast("long"),
          expr(s"(win + 1) * ${window}L - off")))
      .drop("cum_tokens")
  }

  /** Length-bucketed packing plan — the other standard SFT batching
    * strategy next to [[concatSplitWindows]]: docs are grouped into
    * power-of-two length buckets (each doc padded to its bucket), and
    * `k = capacity div bucket` docs share one context-window bin, so
    * no document is ever split and attention never crosses documents.
    * Docs longer than `capacity` form the overflow class (bucket 0,
    * one doc per bin, truncated to capacity).
    *
    * Returns one row per doc: `bucket` (0 = overflow), `k`, `bin` and
    * `slot` within the bucket (docs packed in `idCol` order — a
    * deterministic plan, reproducible across engines), `pad_tokens`
    * (bucket − n for bucketed docs) and `trunc_tokens`
    * (n − capacity for overflow docs).
    *
    * Scale shape: bucket assignment is a per-row when-chain; the
    * within-bucket sequence comes from [[GlobalOrder.withGlobalIndex]]
    * over (bucket, id) — one range exchange — minus each bucket's
    * first index, obtained from a ≤ #buckets-row aggregate joined back
    * broadcast. NOT a window partitioned by bucket: with a handful of
    * distinct buckets that window is the unpartitioned-cliff shape the
    * plan lint bans (one task per bucket at 100 TB). */
  def lengthBucketPacking(df: DataFrame, idCol: String, nTokCol: String,
                          capacity: Int = 512,
                          minBucket: Int = 16): DataFrame = {
    require(capacity > 0 && minBucket > 0 && minBucket <= capacity,
      "need 0 < minBucket <= capacity")
    val buckets = Iterator.iterate(minBucket.toLong)(_ * 2)
      .takeWhile(_ <= capacity).toSeq
    val n = col(nTokCol).cast(LongType)
    val bucketExpr = buckets.reverse.foldLeft(lit(0L)) { (acc, b) =>
      when(n <= b, lit(b)).otherwise(acc) // smallest bucket >= n wins
    }
    val assigned = df.where(n > 0)
      .select(col(idCol), n.as("n_tokens"), bucketExpr.as("bucket"))
      .withColumn("k",
        when(col("bucket") === 0L, lit(1L))
          .otherwise(expr(s"${capacity}L DIV bucket")))
    val indexed = GlobalOrder.withGlobalIndex(assigned,
      Seq(col("bucket"), col(idCol)), out = "__gidx")
    val starts = indexed.groupBy("bucket")
      .agg(min(col("__gidx")).as("__start"))
    indexed.join(broadcast(starts), Seq("bucket"))
      .withColumn("__seq", col("__gidx") - col("__start"))
      .select(col(idCol), col("n_tokens"), col("bucket"), col("k"),
        expr("__seq DIV k").as("bin"),
        pmod(col("__seq"), col("k")).as("slot"),
        when(col("bucket") === 0L, lit(0L))
          .otherwise(col("bucket") - col("n_tokens")).as("pad_tokens"),
        when(col("bucket") === 0L, col("n_tokens") - capacity.toLong)
          .otherwise(lit(0L)).as("trunc_tokens"))
  }

  /** Per-bucket datasheet of a [[lengthBucketPacking]] plan: bin
    * count, total padding (per-doc padding + per-bin slot remainder +
    * empty slots in the last bin — everything the accelerator pads),
    * padding per mille of the bins' total capacity, and truncated
    * tokens for the overflow class. Pure aggregation of the plan —
    * one partial-aggregable pass, ≤ #buckets output rows. */
  def lengthBucketStats(plan: DataFrame, capacity: Int): DataFrame =
    plan.groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        max(col("bin") + 1).as("n_bins"),
        sum(col("trunc_tokens")).as("trunc_tokens"))
      .withColumn("padding_tokens",
        col("n_bins") * capacity.toLong -
          (col("sum_tokens") - col("trunc_tokens")))
      .withColumn("padding_frac_milli",
        expr(s"(1000 * padding_tokens) DIV (n_bins * ${capacity}L)"))

  /** 4-hex-digit md5-prefix upper bounds for the first n-1 splits
    * (the last split is the CASE/otherwise fallthrough). Shared by
    * the Column and SQL forms so both engines draw identical
    * boundaries. */
  private def splitBoundsHex(splits: Seq[(String, Double)])
      : Seq[(String, String)] = {
    require(splits.size >= 2, "deterministicSplit needs >= 2 splits")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-6,
      "split fractions must sum to 1")
    require(splits.forall(_._2 > 0), "split fractions must be positive")
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    // clamp to 65535: a bound that rounds to 65536 would render as the
    // 5-char "10000" and break the 4-char lexicographic comparison
    // (costing that split ~15/16 of its rows); the clamp costs at most
    // the documented 1/65536 precision instead
    splits.init.map(_._1).zip(
      cum.init.map(f =>
        f"${math.min(65535L, math.round(f * 65536)).toInt}%04x"))
  }

  /** Deterministic train/val/test assignment: each row lands in a
    * split according to where the first 4 hex digits of
    * `md5(concat_ws('|', keys))` fall among cumulative-fraction
    * boundaries in the 16^4 space. Seedless and engine-portable
    * (md5 hex compares identically everywhere), stable under corpus
    * growth and reordering (a document's split never changes when
    * other documents arrive — the property `randomSplit` lacks), and
    * a pure per-row projection: shuffle-free, codegen'd, scan-speed
    * at 100 TB. Proportions are exact to 1/65536 (±0.002%).
    *
    * Split by a STABLE identity key (doc id, url); splitting by
    * content hash would also be valid but then near-duplicate leakage
    * across splits must already have been removed (see
    * [[graft.ops.Similarity]]). */
  def deterministicSplit(df0: DataFrame, keyCols: Seq[String],
                         splits: Seq[(String, Double)],
                         outCol: String = "split"): DataFrame = {
    val bounds = splitBoundsHex(splits)
    // concat (null-propagating), NOT concat_ws (null-skipping): a NULL
    // key must fall through to the LAST split — exactly what the SQL
    // twin's md5(NULL) CASE does — not be silently hashed as if the
    // key were absent. Non-null inputs produce the identical string.
    val keyed = keyCols.map(c => col(c).cast("string"))
      .reduceLeft((a, b) => concat(a, lit("|"), b))
    val h = substring(md5(keyed), 1, 4)
    val first = when(h < lit(bounds.head._2), lit(bounds.head._1))
    val chain = bounds.tail.foldLeft(first) { case (acc, (name, hex)) =>
      acc.when(h < lit(hex), lit(name))
    }
    df0.withColumn(outCol, chain.otherwise(lit(splits.last._1)))
  }

  /** Priority sampling (Duffield–Lund–Thorup, JACM 54(6) 2007):
    * weight-proportional sampling WITHOUT replacement — each row gets
    * priority q = w/u with u uniform in (0,1), and the k largest
    * priorities form the sample (inclusion probability ≈ proportional
    * to weight; the scheme's variance optimality is the paper's
    * result). The training-data use is token-budget-proportional doc
    * selection: weight by length/quality so big or high-value docs are
    * favored, without the with-replacement duplicates of naive PPS.
    *
    * Engine-exact by construction (module invariant: no libm): u is
    * the dyadic rational (v+½)/2¹⁶ with v the first 4 hex digits of
    * md5(id) — so q = w·2¹⁷/(2v+1), ONE IEEE multiply and divide,
    * bit-identical on any engine — where the textbook exponential-key
    * form ln(u)/w would hash-diverge in libm's final ulps. Ranking is
    * by the QUANTIZED `prio_milli` (floor(q·1000+½)) with id
    * tie-break, so even a last-ulp difference could only flip a rank
    * at an exact 1/1000 grid boundary. Deterministic and
    * growth-consistent like [[stratifiedHashSample]]: a doc's
    * priority never changes as the corpus grows.
    *
    * Scale shape: the priority is a per-row codegen'd projection
    * (scan-speed); global top-k plans as TakeOrderedAndProject — each
    * partition keeps k rows, the driver merges k·partitions — no
    * global sort, no single-partition cliff (pinned in
    * PlanQualitySpec). */
  def prioritySample(df0: DataFrame, idCol: String, weightCol: String,
                     k: Int): DataFrame = {
    val v = conv(substring(md5(col(idCol).cast("string")), 1, 4),
      16, 10).cast(LongType)
    val prio = col(weightCol).cast("double") * lit(131072.0) /
      (lit(2.0) * v.cast("double") + lit(1.0))
    df0.withColumn("prio_milli",
        floor(prio * lit(1000.0) + lit(0.5)).cast(LongType))
      .orderBy(col("prio_milli").desc, col(idCol).asc)
      .limit(k)
  }

  /** The DuckDB-SQL twin of [[prioritySample]]'s hash→uniform step:
    * renders v (the 4-hex-digit md5 prefix as an integer) for an id
    * expression, digit-positional so no engine-specific hex-parse
    * function is needed. */
  def priorityHashSql(idExpr: String): String = {
    val d = (1 to 4).map { i =>
      s"(strpos('0123456789abcdef', substr(md5($idExpr), $i, 1)) - 1)"
    }
    s"(${d(0)} * 4096 + ${d(1)} * 256 + ${d(2)} * 16 + ${d(3)})"
  }

  /** The DuckDB-SQL twin of [[deterministicSplit]] for oracle
    * authoring: `keyExpr` must render the same string the Column form
    * hashes (for one key: `CAST(doc_id AS VARCHAR)`; for several,
    * join with `|| '|' ||` — SQL `||` null-propagates exactly like the
    * Column form's concat, sending NULL keys to the last split). */
  def deterministicSplitSql(keyExpr: String,
                            splits: Seq[(String, Double)]): String = {
    val bounds = splitBoundsHex(splits)
    val whens = bounds.map { case (name, hex) =>
      s"WHEN substr(md5($keyExpr), 1, 4) < '$hex' THEN '$name'"
    }.mkString(" ")
    s"CASE $whens ELSE '${splits.last._1}' END"
  }

  /** Per-stratum COST-budget cap: walk each stratum's rows in md5-rank
    * order (the repo's deterministic, growth-stable curation order) and
    * admit a row only if the budget was not already exhausted BEFORE it
    * — so every stratum contributes at most `budget` cost units (chars,
    * tokens, bytes) plus one straddling row, the knob that caps a
    * domain's TOKEN share of a training mix rather than its doc count
    * ([[stratifiedHashSample]] caps count; this caps volume). Appends
    * `cum_cost`, the running within-stratum total INCLUDING the row.
    *
    * Scale shape: one shuffle on the stratum key + a streaming
    * rows-frame window — same shape as [[packByTokenBudget]]; no
    * global sort, no driver state. */
  def costBudgetCap(df0: DataFrame, strataCol: String, idCol: String,
                    costCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df0.withColumn("cum_cost",
        sum(col(costCol).cast("long")).over(w))
      .filter(col("cum_cost") - col(costCol) < budget)
  }

  /** DSIR-flavored targeted-domain relevance scoring (Xie et al.
    * 2023's hashed-n-gram importance idea, additive/integer form):
    * hash every token into one of `buckets` buckets, learn each
    * bucket's milli relevance ratio
    * `(target share) / (corpus share)` from the rows marked
    * `isTarget`, then score every document by its mean per-token
    * bucket relevance. Docs whose token distribution matches the
    * target domain score ~1000+; off-domain docs score low — the
    * "select corpus docs most like my target domain" curation step.
    * Additive mean instead of DSIR's log-likelihood product keeps
    * the whole computation in exact integer milli arithmetic (no
    * libm, engine-portable); both are monotone in per-bucket
    * relevance.
    *
    * Scale shape: two streamed passes over the corpus — one
    * partial-aggregable count pass to learn the bucket table
    * (bounded: `buckets` rows; its totals fold on via an
    * unpartitioned window over that AGGREGATE, the driftFromCounts
    * discipline), one scoring pass joining the broadcast relevance
    * table and reducing per doc. Nothing doc×bucket is ever
    * materialized; the estimation/scoring split is exactly DSIR's. */
  def domainRelevance(docs: DataFrame, idCol: String, textCol: String,
                      isTarget: Column, buckets: Int): DataFrame = {
    val toks = docs
      .select(col(idCol).as("id"), isTarget.as("is_t"),
        explode(TextOps.tokens(lower(col(textCol)))).as("tok"))
      .filter(col("tok") =!= "")
      .withColumn("b",
        conv(substring(md5(col("tok")), 1, 4), 16, 10)
          .cast(LongType) % buckets)
    val bt = toks.groupBy("b").agg(
      count(lit(1)).as("c_r"),
      sum(when(col("is_t"), 1L).otherwise(0L)).as("c_t"))
    val rel = bt
      .withColumn("t_r", sum(col("c_r")).over(Window.partitionBy()))
      .withColumn("t_t", sum(col("c_t")).over(Window.partitionBy()))
      .withColumn("rel_milli",
        expr("(c_t * t_r * 1000) div (c_r * t_t)"))
      .select("b", "rel_milli")
    toks.join(broadcast(rel), Seq("b"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_toks"),
        sum(col("rel_milli")).as("rel_sum"))
      .select(col("id").as(idCol), col("n_toks"),
        expr("rel_sum div n_toks").as("score_milli"))
  }

  /** DuckDB twin of [[domainRelevance]]: CTEs `dr_tok`/`dr_rel`
    * over relation `rel`; `targetPred` is a boolean SQL expression
    * over the relation's columns. Consume by joining `dr_tok` with
    * `dr_rel` on `b` and grouping by doc. */
  def domainRelevanceSql(rel: String, idCol: String, textCol: String,
                         targetPred: String, buckets: Int): String =
    s"""dr_tok AS (SELECT id, is_t,
    |    ${priorityHashSql("tok")} % $buckets AS b
    |  FROM (SELECT $idCol AS id, ($targetPred) AS is_t,
    |      unnest(string_split_regex(trim(lower($textCol)),
    |        '[ \\t\\n\\r\\f]+')) AS tok
    |    FROM $rel) WHERE tok <> ''),
    |dr_bt AS (SELECT b, CAST(count(*) AS BIGINT) AS c_r,
    |    CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS c_t
    |  FROM dr_tok GROUP BY b),
    |dr_rel AS (SELECT b,
    |    CAST((c_t * (SELECT sum(c_r) FROM dr_bt) * 1000)
    |      // (c_r * (SELECT sum(c_t) FROM dr_bt)) AS BIGINT)
    |      AS rel_milli
    |  FROM dr_bt)""".stripMargin

  /** Epoch-repeat expansion toward a per-stratum doc target with a
    * repeat CAP — the pretraining-mixture step where undersized
    * sources are repeated across epochs (up to maxEpochs) to fill
    * their share of the token budget, and sources at the cap are
    * left underfilled rather than over-repeated (the LLaMA-style
    * repeat-cap discipline; complements [[temperatureRebalance]],
    * which SELECTS slots, by EXPANDING what was selected). Every doc
    * gets `full = min(maxEpochs, target div n)` epochs; the
    * remainder `target − full·n` (< n) is filled by one extra epoch
    * for the stratum's md5-rank prefix — deterministic and
    * growth-stable like every md5-rank gate. Output: one row per
    * (doc, epoch).
    *
    * Scale shape: stratum sizes are a partial-aggregable count that
    * broadcasts back; the expansion is a per-row
    * explode(sequence(1, epochs)) — output-sized, never materializing
    * more than the emitted rows; the md5 rank is the
    * [[stratifiedHashSample]] group-limit window. */
  def epochRepeat(df0: DataFrame, strataCol: String, idCol: String,
                  targetPerStratum: Long, maxEpochs: Int): DataFrame = {
    val n = df0.groupBy(col(strataCol)).agg(count(lit(1)).as("n"))
      .withColumn("full_e",
        least(lit(maxEpochs.toLong),
          expr(s"${targetPerStratum}L div n")))
      .withColumn("rem",
        when(col("full_e") < maxEpochs.toLong,
          lit(targetPerStratum) - col("full_e") * col("n"))
          .otherwise(lit(0L)))
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
    df0.withColumn("samp_rank", row_number().over(w))
      .join(broadcast(n), Seq(strataCol))
      .withColumn("n_epochs",
        (col("full_e") +
          when(col("samp_rank") <= col("rem"), 1L).otherwise(0L))
          .cast("int"))
      .filter(col("n_epochs") >= 1)
      .withColumn("epoch", explode(sequence(lit(1), col("n_epochs"))))
      .drop("samp_rank", "n", "full_e", "rem", "n_epochs")
  }

  /** Per-stratum EXACT quantile threshold filter without a
    * per-stratum sort of the data: keep each stratum's rows whose
    * integer score is ≥ the stratum's pctMilli/1000-quantile. The
    * quantile is computed from the (stratum, score) HISTOGRAM — a
    * partial-aggregable count groupBy — and the cumulative/threshold
    * windows run over histogram BINS (bounded by the quantized score
    * domain, never by row count). The thresholds table is
    * strata-sized, so it broadcasts back onto the stream.
    *
    * This is the adaptive per-source quality-cutoff shape from C4 /
    * Gopher-style curation: a fixed global threshold over-prunes
    * clean-but-informal sources and under-prunes boilerplate farms;
    * a per-source quantile adapts. Exactness: scores are integer
    * milli-units, so the histogram quantile IS the true quantile —
    * no approx sketch needed (at 100 TB the same shape holds:
    * #bins ≤ 1001 per stratum).
    *
    * Threshold definition: the smallest score whose ascending
    * cumulative count reaches ⌈pctMilli·n/1000⌉ — i.e. at most
    * pctMilli/1000 of rows fall strictly below it. Output: input
    * rows with `thr_milli` attached, bottom tail removed. */
  def quantileCutoff(df0: DataFrame, strataCol: String,
                     scoreCol: String, pctMilli: Long): DataFrame = {
    val hist = df0.groupBy(col(strataCol), col(scoreCol))
      .agg(count(lit(1)).as("bin_n"))
    val wCum = Window.partitionBy(col(strataCol))
      .orderBy(col(scoreCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(strataCol))
    val thr = hist
      .withColumn("cum_n", sum(col("bin_n")).over(wCum))
      .withColumn("n", sum(col("bin_n")).over(wAll))
      .filter(col("cum_n") * 1000L >= lit(pctMilli) * col("n"))
      .groupBy(col(strataCol))
      .agg(min(col(scoreCol)).as("thr_milli"))
    df0.join(broadcast(thr), Seq(strataCol))
      .filter(col(scoreCol) >= col("thr_milli"))
  }

  /** DuckDB twin of [[quantileCutoff]]: CTEs `qc_hist`/`qc_thr` over
    * relation `rel`; join `qc_thr` on the stratum and filter
    * `score >= thr_milli` in the consuming query. */
  def quantileCutoffSql(rel: String, strataCol: String,
                        scoreCol: String, pctMilli: Long): String =
    s"""qc_hist AS (SELECT $strataCol, $scoreCol, count(*) AS bin_n
    |  FROM $rel GROUP BY 1, 2),
    |qc_thr AS (SELECT $strataCol, min($scoreCol) AS thr_milli
    |  FROM (SELECT $strataCol, $scoreCol,
    |      sum(bin_n) OVER (PARTITION BY $strataCol
    |        ORDER BY $scoreCol ASC
    |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    |        AS cum_n,
    |      sum(bin_n) OVER (PARTITION BY $strataCol) AS n
    |    FROM qc_hist)
    |  WHERE cum_n * 1000 >= $pctMilli * n GROUP BY 1)""".stripMargin

  /** Exact integer square root, engine-portable: IEEE-754 specifies
    * `sqrt` as CORRECTLY ROUNDED (unlike ln/pow/exp, which libm only
    * approximates), and the ±1 correction steps make the result the
    * true floor-sqrt even if an engine's sqrt were off by an ulp —
    * exact for any n ≤ 2⁵². SQL twin: [[isqrtSql]]. */
  def isqrt(n: Column): Column = {
    val s0 = floor(sqrt(n.cast("double"))).cast(LongType)
    val s1 = when(s0 * s0 > n, s0 - 1L).otherwise(s0)
    when((s1 + 1L) * (s1 + 1L) <= n, s1 + 1L).otherwise(s1)
  }

  /** DuckDB twin of [[isqrt]] (same correction chain). */
  def isqrtSql(n: String): String = {
    val s0 = s"CAST(floor(sqrt(CAST(($n) AS DOUBLE))) AS BIGINT)"
    val s1 = s"(CASE WHEN $s0 * $s0 > ($n) THEN $s0 - 1 ELSE $s0 END)"
    s"(CASE WHEN ($s1 + 1) * ($s1 + 1) <= ($n) " +
      s"THEN $s1 + 1 ELSE $s1 END)"
  }

  /** Cross-stratum OVERLAP matrix from k-minimum-values sketches: for
    * every stratum pair, the KMV Jaccard estimate over distinct
    * `itemCol` values (shingles, URLs, fingerprints) — the
    * mixture-design question "how much of domain A is also in domain
    * B", answered from k hashes per stratum instead of a full
    * cross-stratum distinct join. Estimator: rank the md5 hashes per
    * stratum, keep the k smallest (the KMV sketch); for a pair, take
    * the k smallest of the sketch UNION and count members present in
    * both sketches — m/k is the standard KMV Jaccard estimate
    * (Beyer et al. 2007), reported as floor-milli. Hex-string order
    * is plain ASCII on both engines, so the whole estimate is
    * hash-pinnable.
    *
    * Scale shape: the per-stratum sketch is a rank-window over
    * distinct (stratum, hash) — group-limit pushdown, same shape as
    * [[stratifiedHashSample]]; at extreme stratum cardinality swap in
    * a bounded k-smallest aggregate (the [[reservoirSample]]
    * ReservoirAgg shape — KMV is order-statistics mergeable). Pair
    * work is #strata²·k rows — sketch-sized, never corpus-sized. */
  def kmvOverlap(df0: DataFrame, strataCol: String, itemCol: String,
                 k: Int): DataFrame = {
    val wSk = Window.partitionBy(col(strataCol)).orderBy(col("h").asc)
    val sk = df0.select(col(strataCol), md5(col(itemCol)).as("h"))
      .distinct()
      .withColumn("r", row_number().over(wSk))
      .filter(col("r") <= k).drop("r")
    val srcs = sk.select(col(strataCol)).distinct()
    val pairs = srcs.select(col(strataCol).as("sa"))
      .crossJoin(srcs.select(col(strataCol).as("sb")))
      .filter(col("sa") < col("sb"))
    val ua = pairs.join(sk.withColumnRenamed(strataCol, "sa"), "sa")
      .withColumn("ina", lit(1)).withColumn("inb", lit(0))
    val ub = pairs.join(sk.withColumnRenamed(strataCol, "sb"), "sb")
      .withColumn("ina", lit(0)).withColumn("inb", lit(1))
    val wU = Window.partitionBy("sa", "sb").orderBy(col("h").asc)
    ua.unionByName(ub.select(ua.columns.map(col): _*))
      .groupBy("sa", "sb", "h")
      .agg(max(col("ina")).as("ina"), max(col("inb")).as("inb"))
      .withColumn("r", row_number().over(wU))
      .filter(col("r") <= k)
      .groupBy("sa", "sb")
      .agg(sum(when(col("ina") === 1 && col("inb") === 1, 1L)
        .otherwise(0L)).as("m"))
      .withColumn("jaccard_milli", expr(s"m * 1000 div $k"))
  }

  /** TEMPERATURE-rebalanced mixture: allocate a total of `totalK` doc
    * slots across strata proportionally to √n (temperature-2
    * upsampling of the tail — the standard multilingual rebalance,
    * cf. mBERT/XLM-R exponent-smoothed sampling), then fill each
    * stratum's quota by md5 rank. Quotas are integer-exact largest-
    * remainder apportionment (floor(√nᵢ·K/Σ√n) + 1 for the largest
    * remainders, ties to the lexicographically smaller stratum), so
    * they sum to exactly `totalK` and both engines derive the same
    * integers — no float shares anywhere ([[isqrt]] keeps even the
    * square root exact). A stratum with fewer rows than its quota
    * contributes what it has.
    *
    * Scale shape: stratum counts are one partial-aggregable pass; the
    * apportionment windows run over the #strata-row AGGREGATE (bounded
    * domain — the sanctioned unpartitioned-window case); quotas ride
    * back as a broadcast join onto the md5-rank window. No collect,
    * no driver math — the whole allocation stays on the cluster. */
  def temperatureRebalance(df0: DataFrame, strataCol: String,
                           idCol: String, totalK: Int): DataFrame = {
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val wRem = Window.orderBy(col("rem").desc, col(strataCol).asc)
    val quotas = df0.groupBy(strataCol)
      .agg(count(lit(1)).as("n"))
      .withColumn("wt", isqrt(col("n")))
      .withColumn("s", sum(col("wt")).over(wAll))
      .withColumn("base", expr(s"wt * $totalK div s"))
      .withColumn("rem", expr(s"(wt * $totalK) % s"))
      .withColumn("deficit", lit(totalK) - sum(col("base")).over(wAll))
      .withColumn("rr", row_number().over(wRem))
      .withColumn("quota",
        col("base") + when(col("rr") <= col("deficit"), 1L).otherwise(0L))
      .select(col(strataCol), col("quota"))
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
    df0.join(broadcast(quotas), strataCol)
      .withColumn("samp_rank", row_number().over(w))
      .filter(col("samp_rank") <= col("quota"))
  }

  /** Release-to-release corpus diff — the audit a pipeline publishes
    * with every refreshed training-set release: each document keyed by
    * id, content compared by hash, classified into exactly one of
    * {added, removed, changed, unchanged}. ONE shuffle (the full-outer
    * sort-merge join on id); content hashes are computed scan-side so
    * document text never moves through the shuffle — at 100 TB the
    * exchange carries (id, 32-byte hash), not bodies. Output:
    * (id, fate).
    *
    * Conventions (both deliberate, both shared with the gate oracle):
    * NULL text hashes as the empty string, so a null→'' edit (and
    * vice versa) classifies as `unchanged` — the diff audits CONTENT
    * BYTES as a sink would serialize them, and both render to zero
    * bytes. Ids must be UNIQUE within each release (the usual corpus
    * invariant; [[releaseDiff]]'s caller gates run downstream of
    * exact dedup): a duplicated id fans out through the full-outer
    * join — one output row per cross-release id pairing — rather
    * than raising. */
  def releaseDiff(v1: DataFrame, v2: DataFrame, idCol: String,
                  textCol: String): DataFrame = {
    def keyed(df: DataFrame, h: String) = df.select(
      col(idCol).cast(LongType).as("id"),
      md5(coalesce(col(textCol), lit(""))).as(h))
    keyed(v1, "h1").join(keyed(v2, "h2"), Seq("id"), "full_outer")
      .select(col("id"),
        when(col("h2").isNull, lit("removed"))
          .when(col("h1").isNull, lit("added"))
          .when(col("h1") =!= col("h2"), lit("changed"))
          .otherwise(lit("unchanged")).as("fate"))
  }
}
