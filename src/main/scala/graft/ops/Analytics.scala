package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Warehouse-analytics operators over event/fact streams — the
  * product-analytics layer the reference delegates to BigQuery/Looker
  * (reference README.md:62-65): funnels, cohort retention, time-series
  * gap filling, statistical anomaly flags. All declarative
  * DataFrame/window formulations so Catalyst keeps them in whole-stage
  * codegen, and all arithmetic integer-exact so results hash-match
  * across engines at any parallelism. */
object Analytics {

  /** Ordered conversion funnel: for each entity, whether it performed
    * stage 1, then stage 2 AT OR AFTER its first qualifying stage-1
    * moment, then stage 3 at or after that, … for an arbitrary stage
    * list. A stage-k event qualifies only if some stage-(k-1) event
    * already qualified at an earlier-or-equal `(time, tiebreak)` — the
    * standard "ordered funnel" semantics (a purchase before any click
    * does not count).
    *
    * Implementation: running per-stage flags over ONE window spec
    * (partition by entity, order by time+tiebreak, rows unbounded
    * preceding..current): `reached_1 = max(is_stage1)`,
    * `reached_k = max(is_stagek AND reached_{k-1})`. The chained
    * flags need one Window node per stage but share the spec, so
    * Catalyst plans ONE exchange + ONE sort for all of them, and the
    * final per-entity aggregate reuses the same hash partitioning —
    * a single shuffle end-to-end regardless of stage count. At 100 TB
    * this is the minimum possible: any funnel needs events co-located
    * and time-ordered per entity once.
    *
    * Returns one row per entity: (entityCol, reached_<stage>...) with
    * 0/1 longs. Tiebreak must make (time, tiebreak) total per entity
    * or same-instant stage pairs are engine-ambiguous. */
  def funnel(events: DataFrame, entityCol: String, timeCol: Column,
             tiebreakCol: Column, stageCol: Column,
             stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col("__t"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val flagged = stages.zipWithIndex.foldLeft(
        events.select(col(entityCol), timeCol.as("__t"),
          tiebreakCol.as("__tb"), stageCol.as("__stage"))) {
      case (df, (stage, i)) =>
        val hit =
          if (i == 0) when(col("__stage") === stage, 1L).otherwise(0L)
          else when(col("__stage") === stage &&
            col(s"__r${i - 1}") === 1L, 1L).otherwise(0L)
        df.withColumn(s"__r$i", max(hit).over(w))
    }
    flagged.groupBy(entityCol)
      .agg(max(col("__r0")).as(s"reached_${stages.head}"),
        stages.zipWithIndex.tail.map { case (s, i) =>
          max(col(s"__r$i")).as(s"reached_$s")
        }: _*)
  }

  /** Cohort retention: assign every entity to the cohort of its FIRST
    * activity period (daily here), then count distinct entities active
    * at each (cohort, period-offset). The classic retention triangle.
    *
    * Shape: one per-entity min aggregate (partial-aggregable), one
    * distinct over (entity, period) (partial-aggregable), one equi-join
    * on entity (both sides hash-partitioned by entity), one final
    * count-distinct collapsed by (cohort, offset). No windows, no
    * sorts; every stage map-side combines, so at 100 TB the shuffled
    * bytes are bounded by distinct (entity, period) pairs, not raw
    * events. */
  def cohortRetention(events: DataFrame, entityCol: String,
                      dayCol: Column): DataFrame = {
    val activity = events.select(col(entityCol), dayCol.as("d")).distinct()
    val cohorts = activity.groupBy(entityCol)
      .agg(min(col("d")).as("cohort_d"))
    activity.join(cohorts, entityCol)
      .groupBy(col("cohort_d"),
        datediff(col("d"), col("cohort_d")).cast(LongType)
          .as("offset_days"))
      .agg(countDistinct(col(entityCol)).as("users"))
  }

  /** Daily time-series gap fill + forward fill: per key, build the
    * dense day spine from the key's own [min, max] observed day
    * (`sequence` + `explode` — generated distributed, never on the
    * driver), left-join the observed daily values, and forward-fill
    * missing days with the last observed value (`last(ignoreNulls)`
    * over an unbounded-preceding row window). Days before a key's
    * first observation stay null by construction. `is_gap` marks
    * SYNTHESIZED days (day absent from `daily`); an observed row whose
    * value is NULL is `is_gap = false` yet still forward-filled — the
    * standard last-observation-carried-forward convention.
    *
    * Shape: one daily pre-aggregate, one per-key bounds aggregate
    * (both partial-aggregable), one equi-join on (key, day), one
    * window sorted per key. The spine join is skew-safe: spine rows
    * per key are bounded by the date span, not the data volume. */
  def gapFillDaily(daily: DataFrame, keyCol: String, dayCol: String,
                   valueCol: String): DataFrame = {
    val bounds = daily.groupBy(keyCol)
      .agg(min(col(dayCol)).as("__lo"), max(col(dayCol)).as("__hi"))
    val spine = bounds.select(col(keyCol),
      explode(sequence(col("__lo"), col("__hi"),
        expr("interval 1 day"))).as(dayCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // presence marker, NOT valueCol.isNull: an observed row with a
    // NULL value is a real observation, not a synthesized gap day
    spine.join(daily.withColumn("__obs", lit(true)),
        Seq(keyCol, dayCol), "left")
      .withColumn("is_gap", col("__obs").isNull)
      .withColumn(valueCol,
        last(col(valueCol), ignoreNulls = true).over(w))
      .drop("__obs")
  }

  /** Per-group z-score anomaly flag, integer-exact: flags rows with
    * |x − μ| > (zMilli/1000)·σ (sample stddev) without ever computing
    * a float. With n, S=Σx, Q=Σx² per group,
    * |z| > z₀ ⟺ (n·x − S)²·(n−1)·10⁶ > z₀milli²·n·(n·Q − S²),
    * which is pure integer arithmetic in DECIMAL(38,0) — exact,
    * associative, and identical on any engine at any parallelism
    * (float stddev would hash-diverge on aggregation order alone).
    * Groups of one row are never anomalous (sample variance
    * undefined ⇒ flag false, both sides of the inequality zero —
    * kept explicit so the behavior is pinned).
    *
    * Capacity: z is translation-invariant, so values are CENTERED at
    * the group minimum before the moments — every term is then bounded
    * by the group's value RANGE R, not its absolute magnitude. The
    * dominant products grow as n³·R²·max(10⁶, zMilli²); DECIMAL(38,0)
    * holds them exactly while n³·R²·max(10⁶, zMilli²) < 10³⁸ — e.g.
    * R = 10⁶ (a 1000-unit spread in milli units), zMilli = 2500 →
    * n ≲ 2.5 M rows per group; R = 10⁴ → n ≲ 54 M. Past that envelope
    * Spark's ANSI mode FAILS LOUDLY (decimal overflow throws, never a
    * silently wrong flag) — for larger groups use a float z-score and
    * give up bit-exactness.
    *
    * Shape: the moments come from ONE window over the group (single
    * exchange, no sort — unbounded frame), the flag is a codegen'd
    * per-row projection. At 100 TB: groupBy-moments + join back would
    * also work; the window form shuffles the rows once either way and
    * keeps the row payload out of the aggregate. */
  def anomalyZScore(rows: DataFrame, groupCol: String, xCol: String,
                    zMilli: Int): DataFrame = {
    val dec = DecimalType(38, 0)
    val w = Window.partitionBy(col(groupCol))
    // center at the group min: moments of x' = x - min(x) give the
    // same flag (translation invariance) with operands bounded by the
    // group range instead of the raw magnitude. Two projections (a
    // window function can't nest inside another), SAME window spec —
    // one exchange serves both.
    val x = col("__xc")
    val n = count(lit(1)).over(w).cast(dec)
    val s = sum(x).over(w)
    val q = sum(x * x).over(w)
    val dev = n * x - s           // n·(x − μ), scaled by n
    val varN = n * q - s * s      // n²·σ²_pop·…  = n·(n−1)·σ²_samp
    rows
      .withColumn("__xc",
        (col(xCol) - min(col(xCol)).over(w)).cast(dec))
      .withColumn("is_anomaly",
        dev * dev * (n - lit(1).cast(dec)) * lit(1000000L).cast(dec) >
          lit(zMilli.toLong * zMilli).cast(dec) * n * varN)
      .drop("__xc")
  }

  /** Per-group distribution drift vs the whole-corpus baseline, as total
    * variation distance in integer milli-units: for each group g over
    * binned observations, TV(g) = ½·Σ_b |c(g,b)/n(g) − C(b)/N| where
    * C/N are the baseline (all-groups) bin counts. The data-quality
    * monitor of a continuously-ingested pipeline: a day whose value
    * distribution shifts from the corpus norm flags high (1000 = total
    * disagreement, 0 = identical).
    *
    * TV, not KL: KL needs ln (libm, engine-divergent, and undefined on
    * empty bins); TV over integer counts reduces to the EXACT bigint
    * numerator S(g) = Σ_b |c·N − C·n| — associative, aggregation-order
    * independent, hash-identical on any engine. Bins absent from a
    * group still contribute C(b)·n(g); rather than densifying with a
    * group×bin cross join, that tail is closed-form:
    * S(g) = Σ_{b∈g} |c·N − C·n| + (N − Σ_{b∈g} C(b))·n(g), since
    * Σ_b C(b) = N. The final milli value is pure integer division:
    * floor(1000·S/(2nN) + ½) = (1000·S + nN) div (2nN).
    *
    * Capacity: products are bounded by n(g)·N < 2⁶³ — holds to ~10⁹
    * rows/group × 10⁹ total; past that Spark's ANSI mode fails loudly
    * (never a silently wrong distance) and the numerator should move
    * to DECIMAL(38,0). Scale shape: two partial-aggregable groupBys of
    * the (group,bin) pair table (bounded by groups×bins, NOT data
    * size); the grand total N is folded onto the bin-totals side with
    * an unpartitioned window over the BIN AGGREGATE — bounded by the
    * bin count (10s-1000s of rows), never by data, so the
    * single-partition exchange is a non-event — and both small sides
    * ride broadcast hash joins (a literal-key scalar join would
    * constant-fold into a nested-loop cross join); one final groupBy
    * on g. No driver collect. */
  def distributionDriftTV(rows: DataFrame, groupCol: String,
                          binCol: String): DataFrame =
    driftFromCounts(
      rows.groupBy(groupCol, binCol).agg(count(lit(1)).as("__c")),
      groupCol, binCol, "__c")

  /** [[distributionDriftTV]]'s finalize stage over an already-
    * maintained (group, bin, count) histogram — the form a streaming
    * deployment uses: the stream keeps the histogram as its ONLY
    * state (bounded by groups×bins, not by data), and this batch
    * finalize prices each read of the monitor at the cost of the tiny
    * aggregate (see StreamingOps.driftHistogram). */
  def driftFromCounts(counts: DataFrame, groupCol: String,
                      binCol: String, countCol: String): DataFrame = {
    val c = counts.withColumnRenamed(countCol, "__c")
    val g = c.groupBy(groupCol).agg(sum("__c").as("n"))
    val b = c.groupBy(binCol).agg(sum("__c").as("__cb"))
      .withColumn("__nt", sum("__cb").over(Window.partitionBy()))
    val s = c
      .join(broadcast(b), binCol)
      .join(broadcast(g), groupCol)
      .groupBy(col(groupCol), col("n"), col("__nt"))
      .agg(
        sum(abs(col("__c") * col("__nt") - col("__cb") * col("n")))
          .as("__sp"),
        sum(col("__cb")).as("__cbp"))
    s.withColumn("__S",
        col("__sp") + (col("__nt") - col("__cbp")) * col("n"))
      .select(col(groupCol), col("n"),
        expr("(1000 * __S + n * __nt) div (2 * n * __nt)")
          .as("tv_milli"))
  }

  /** Per-group two-sided winsorization (clip to the group's
    * [loMilli, hiMilli] EXACT quantiles) over an integer-quantized
    * score — the outlier-clipping step a feature/reward pipeline runs
    * before normalization, where a global clip miscalibrates
    * heavy-tailed groups. Same scale shape as
    * [[Corpus.quantileCutoff]]: the quantiles come from the
    * (group, score) histogram (partial-aggregable counts; windows
    * over BINS, bounded by the quantized domain, never row count) and
    * both thresholds fall out of ONE aggregate over the cumulated
    * histogram; the group-sized threshold table broadcasts back.
    * Each threshold is the smallest score whose ascending cumulative
    * count reaches pct·n/1000 (inverse-CDF quantile). Output: input
    * rows + lo/hi thresholds + the clipped score. */
  def winsorize(rows: DataFrame, groupCol: String, scoreCol: String,
                loMilli: Long, hiMilli: Long): DataFrame = {
    val hist = rows.groupBy(col(groupCol), col(scoreCol))
      .agg(count(lit(1)).as("bin_n"))
    val wCum = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(groupCol))
    val cum = hist
      .withColumn("cum_n", sum(col("bin_n")).over(wCum))
      .withColumn("n", sum(col("bin_n")).over(wAll))
    val thr = cum.groupBy(col(groupCol))
      .agg(
        min(when(col("cum_n") * 1000L >= lit(loMilli) * col("n"),
          col(scoreCol))).as("lo_thr"),
        min(when(col("cum_n") * 1000L >= lit(hiMilli) * col("n"),
          col(scoreCol))).as("hi_thr"))
    rows.join(broadcast(thr), Seq(groupCol))
      .withColumn(s"${scoreCol}_wins",
        greatest(least(col(scoreCol), col("hi_thr")), col("lo_thr")))
  }

  /** DuckDB twin of [[winsorize]]: CTEs `wz_hist`/`wz_thr` over
    * relation `rel`; join `wz_thr` on the group and clip with
    * greatest/least in the consuming query. */
  def winsorizeSql(rel: String, groupCol: String, scoreCol: String,
                   loMilli: Long, hiMilli: Long): String =
    s"""wz_hist AS (SELECT $groupCol, $scoreCol, count(*) AS bin_n
    |  FROM $rel GROUP BY 1, 2),
    |wz_cum AS (SELECT $groupCol, $scoreCol,
    |    sum(bin_n) OVER (PARTITION BY $groupCol
    |      ORDER BY $scoreCol ASC
    |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
    |    sum(bin_n) OVER (PARTITION BY $groupCol) AS n
    |  FROM wz_hist),
    |wz_thr AS (SELECT $groupCol,
    |    min(CASE WHEN cum_n * 1000 >= $loMilli * n
    |      THEN $scoreCol END) AS lo_thr,
    |    min(CASE WHEN cum_n * 1000 >= $hiMilli * n
    |      THEN $scoreCol END) AS hi_thr
    |  FROM wz_cum GROUP BY 1)""".stripMargin
}
