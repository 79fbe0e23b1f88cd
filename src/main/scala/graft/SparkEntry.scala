package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Catalog

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query inventory lives in [[graft.queries.Catalog]]; this object is the
  * stable façade the driver invokes.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Exercises scan → multi-join (broadcast dims) → decimal-exact aggregate. */
  def entry(spark: SparkSession): DataFrame = {
    graft.core.GraftSession.prepare(spark)
    Catalog.all.find(_.name == "q03_revenue_by_nation").get
      .fn(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Catalog.all.map { q =>
      q.name -> ((s: SparkSession, dir: String) => {
        graft.core.GraftSession.prepare(s)
        q.fn(s, dir)
      })
    }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Catalog.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
