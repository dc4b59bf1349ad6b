package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * NOTE: sessions used with these queries should come from
  * `graft.Sessions` (UTC + `nanosAsLong=true`): events.ts is exposed
  * to every query as LongType epoch-ns — the engine's native time
  * representation, reference `main.py:100-102` — by
  * [[graft.queries.Tables.load]], which adapts whichever physical
  * type the testdata ships (TIMESTAMP(NANOS) needs the nanosAsLong
  * flag; timestamp[us] NTZ needs the UTC session zone).
  */
object SparkEntry {

  /** Flagship query (multi-way join + aggregate, revenue per nation)
    * on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q09_join_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Queries.all ++ graft.queries.IngestQueries.all ++
      graft.queries.ExtQueries.all ++ graft.queries.DtdlQueries.all ++
      graft.queries.ExtQueries2.all ++ graft.queries.ExtQueries3.all ++
      graft.queries.ExtQueries4.all ++ graft.queries.ExtQueries5.all ++
      graft.queries.ExtQueries6.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB
    * on the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    graft.queries.Queries.oracles ++ graft.queries.IngestQueries.oracles ++
      graft.queries.ExtQueries.oracles ++ graft.queries.DtdlQueries.oracles ++
      graft.queries.ExtQueries2.oracles ++ graft.queries.ExtQueries3.oracles ++
      graft.queries.ExtQueries4.oracles ++ graft.queries.ExtQueries5.oracles ++
      graft.queries.ExtQueries6.oracles
}
