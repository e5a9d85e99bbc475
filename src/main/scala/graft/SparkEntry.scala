package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in `queries` is one operator from SURVEY.md §2, expressed
  * Spark-first (DataFrame API / spark.sql), with an equivalent DuckDB SQL
  * oracle in `oracleSql`. Column names are aliased identically on both
  * sides; see graft.queries for the oracle-parity conventions.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_agg_groupby")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    AggQueries.queries ++ JoinQueries.queries ++ WindowQueries.queries ++
      SortSetQueries.queries ++ FunctionQueries.queries ++ SqlQueries.queries ++
      TextQueries.queries ++ DedupQueries.queries ++ VectorQueries.queries ++
      VectorQueries.rowsOnlyQueries ++ VectorQueries.exactTwinQueries ++
      MiscQueries.queries ++ ExtraQueries.queries ++ ReshapeQueries.queries ++
      SampleQueries.queries ++ TimeseriesQueries.queries ++
      RetrievalQueries.queries

  def oracleSql: Map[String, String] =
    AggQueries.oracles ++ JoinQueries.oracles ++ WindowQueries.oracles ++
      SortSetQueries.oracles ++ FunctionQueries.oracles ++ SqlQueries.oracles ++
      TextQueries.oracles ++ DedupQueries.oracles ++ VectorQueries.oracles ++
      MiscQueries.oracles ++ ExtraQueries.oracles ++ ReshapeQueries.oracles ++
      SampleQueries.oracles ++ TimeseriesQueries.oracles ++
      RetrievalQueries.oracles
}
