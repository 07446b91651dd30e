package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: the Spark implementation plus (where
  * ANSI-SQL-expressible) the DuckDB oracle twin the driver hash-compares
  * against. Queries without an oracle get the driver's weaker
  * rows-only check. */
final case class Q(name: String,
                   run: (SparkSession, String) => DataFrame,
                   oracle: Option[String])

object Registry {
  def all: Seq[Q] =
    RefQueries.all ++ AggQueries.all ++ TextQueries.all ++
      SimQueries.all ++ JobQueries.all ++ StreamQueries.all ++
      MultimodalQueries.all ++ CorpusQueries.all ++ MergeQueries.all ++
      AnalyticsQueries.all ++ ScaleQueries.all ++ ClusterQueries.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.collect { case Q(n, _, Some(sql)) => n -> sql }.toMap
}
