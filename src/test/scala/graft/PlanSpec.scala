package graft

import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.queries.Catalog

/** Plan-property regression guards: the optimizations we rely on at scale
  * must be visible in the physical plan, not assumed. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    Catalog.all.find(_.name == name).get.fn(spark, dir)
      .queryExecution.explainString(FormattedMode)

  test("q02: filters reach the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters") && p.contains("GreaterThan(l_quantity,45.0)"),
      s"missing parquet pushdown:\n$p")
  }

  test("q03: dimension joins broadcast") {
    val p = plan("q03_revenue_by_nation")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("zset scan: score range pushed into the source") {
    val p = plan("src_redis_zset_pushdown")
    assert(p.contains("range=[0.0,5000.0]"), s"range not pushed:\n$p")
  }

  test("mongo scan: predicates pushed AND filter-only column pruned") {
    val p = plan("src_mongo_find_pushdown")
    assert(p.contains("p$gte") && p.contains("st$eq"), s"preds not pushed:\n$p")
    assert(p.contains("cols=k,c,p"), s"column pruning failed:\n$p")
  }

  test("q01: aggregation is partial/final (map-side combine before the exchange)") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("partial_sum"), s"no partial aggregation:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"expected partial+final pair:\n$p")
  }
}
