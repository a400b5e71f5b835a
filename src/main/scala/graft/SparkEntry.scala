package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{CdcQueries, Clustering, Dedup, LakeQueries, Multimodal, PipelineOps, Relational, Similarity, TextOps}

/** Driver contract — see SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every operator module's named queries; each name has a
  * DuckDB-runnable `oracleSql` mirror where the semantics are ANSI-SQL
  * expressible (the driver records rows-only checks for the rest).
  */
object SparkEntry {

  /** Flagship: the reference experiment (chunk + dedup metrics per algorithm,
    * `main.rs:16-24`) over the sf0.001 documents corpus.
    */
  def entry(spark: SparkSession): DataFrame =
    CdcQueries.queries("cdc_dedup_metrics")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CdcQueries.queries ++ Relational.queries ++ TextOps.queries ++
      Dedup.queries ++ Similarity.queries ++ Multimodal.queries ++
      PipelineOps.queries ++ Clustering.queries ++ LakeQueries.queries ++
      graft.streaming.Streaming.queries

  def oracleSql: Map[String, String] =
    CdcQueries.oracleSql ++ Relational.oracleSql ++ TextOps.oracleSql ++
      Dedup.oracleSql ++ Similarity.oracleSql ++ Multimodal.oracleSql ++
      PipelineOps.oracleSql ++ Clustering.oracleSql ++ LakeQueries.oracleSql ++
      graft.streaming.Streaming.oracleSql
}
