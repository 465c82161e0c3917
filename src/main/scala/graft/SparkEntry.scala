package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every module's declared operator set; each key has a
  * DuckDB-oracle SQL twin in `oracleSql` when the operator is SQL-expressible
  * (the driver hash-compares results), and is rows-only checked otherwise.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.Events.queries ++
      graft.queries.Scalars.queries ++
      graft.queries.TextOps.queries ++
      graft.queries.Dedup.queries ++
      graft.queries.Similarity.queries ++
      graft.queries.Multimodal.queries ++
      graft.queries.MappingQueries.queries

  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++
      graft.queries.Events.oracle ++
      graft.queries.Scalars.oracle ++
      graft.queries.TextOps.oracle ++
      graft.queries.Dedup.oracle ++
      graft.queries.Similarity.oracle ++
      graft.queries.Multimodal.oracle ++
      graft.queries.MappingQueries.oracle
}
