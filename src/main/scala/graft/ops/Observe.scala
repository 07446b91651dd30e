package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Observation, Row}

/** Zero-extra-pass data-quality counters — `Dataset.observe`
  * (Catalyst CollectMetrics) ridden by a production job: the metrics
  * aggregate over exactly the rows that flow through the plan node,
  * DURING the job's own action, so a 100 TB write gets its row
  * counts / null counts / bounds audit for free instead of a second
  * corpus scan. This is the engine's wrapper over the one Spark
  * surface the registry didn't yet exercise; the q_observe_metrics
  * gate pins the harvested values against a DuckDB replay of the same
  * aggregates, i.e. observe() == a dedicated aggregation pass.
  *
  * Constraints inherited from CollectMetrics: expressions must
  * aggregate (or be constant), must not be DISTINCT aggregates, and
  * fire once per action. `Observation.get` blocks until the action's
  * listener delivery, so the returned Row is complete. */
object Observe {

  /** Run `action` once over `df` with `metricExprs` riding the same
    * pass; returns the single metrics Row in declaration order. The
    * default action is a full no-materialization pass (`foreach` of
    * unit) — callers with a real sink pass their own
    * (e.g. `_.write.parquet(...)`) and pay nothing extra. */
  def metrics(df: DataFrame, metricExprs: Seq[Column],
              action: DataFrame => Unit = _.foreach(_ => ())): Row = {
    require(metricExprs.nonEmpty, "metrics needs >= 1 metric expression")
    // NOTE: obs.get blocks until an action over the OBSERVED frame
    // completes — `action` must run one (the default does); an action
    // that never triggers a Spark job would wait forever by
    // Observation's own contract
    val obs = Observation()
    val observed = df.observe(obs, metricExprs.head,
      metricExprs.tail: _*)
    action(observed)
    val m = obs.get // blocks until the action's listener delivery
    Row.fromSeq(metricNames(observed).map(m(_)))
  }

  /** The metric column names in declaration order — `Observation.get`
    * returns an unordered Map; a deterministic row needs the plan's
    * own ordering. */
  private def metricNames(observed: DataFrame): Seq[String] =
    observed.queryExecution.analyzed.collectFirst {
      case c: org.apache.spark.sql.catalyst.plans.logical.CollectMetrics =>
        c.metrics.map(_.name)
    }.getOrElse(Seq.empty)
}
