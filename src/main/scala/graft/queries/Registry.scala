package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark build function plus (when the semantics
  * are SQL-expressible) the equivalent ANSI SQL the driver runs in DuckDB
  * over the same parquet tables. Column aliases MUST match between the two
  * — the driver's comparator sorts columns by name before hashing.
  */
final case class Q(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String)

object Registry {
  /** Insertion-ordered full inventory. */
  lazy val all: Seq[(String, Q)] =
    Relational.queries ++ EwmaQueries.queries ++ ExtensionQueries.queries ++
      AdvancedQueries.queries ++ DataPrepQueries.queries ++ CurationQueries.queries ++
      AnalyticsQueries.queries ++ InsightQueries.queries ++ FeatureQueries.queries ++
      EvalQueries.queries

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (n, q) => n -> q.build }.toMap

  lazy val oracleSql: Map[String, String] =
    all.collect { case (n, Q(_, Some(sql), _)) => n -> sql }.toMap
}
