package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory of SURVEY.md §2 re-expressed
  * Spark-first; each key has a DuckDB oracle in `oracleSql` (the t2
  * correctness gate) unless the operator is not SQL-expressible.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Multi-join revenue rollup = the densest reference DAG shape
    * (6 vertices, mixed broadcast + scatter-gather edges).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q19_multijoin_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (Relational)
    * plus the training-data pipeline extensions (Pipeline).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.defs ++ graft.queries.Pipeline.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++ graft.queries.Pipeline.oracles
}
