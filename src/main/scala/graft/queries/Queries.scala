package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Aggregated registry of all gate queries (SURVEY.md §2). Each section
  * contributes a `queries` map and an `oracleSql` map with matching keys;
  * keys without an oracle get the driver's weaker rows-only check.
  */
object Queries {
  def all: Map[String, (SparkSession, String) => DataFrame] =
    RefQueries.queries ++ ChainQueries.queries ++ CdcQueries.queries ++ OpsQueries.queries

  def oracles: Map[String, String] =
    RefQueries.oracleSql ++ ChainQueries.oracleSql ++ CdcQueries.oracleSql ++ OpsQueries.oracleSql
}
