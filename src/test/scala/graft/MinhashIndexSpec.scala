package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftSession, Tables}
import graft.operators.Dedup

/** The persisted minhash index ([[Dedup.minhashIndexWrite]] /
  * [[Dedup.minhashLshAgainstIndex]]): the daily-crawl-at-100 TB shape —
  * corpus tokenized/banded ONCE into bucketed tables, every delta join
  * shuffles only the delta. Gates: pair-for-pair equality with the
  * direct [[Dedup.minhashLshAgainst]], the no-exchange-above-the-index
  * plan property, and loud rejection of a non-index table. */
class MinhashIndexSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  private val dir = "/root/testdata/sf0.001"
  private val table = s"mhidx_${java.lang.ProcessHandle.current().pid()}"

  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: flatten(a.executedPlan)
    case q: QueryStageExec => q +: flatten(q.plan)
    case _ => p +: p.children.flatMap(flatten)
  }

  private def dropManaged(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft-warehouse/$name")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(loc)
  }

  test("index-backed delta join: equal to the direct two-sided join, index never shuffles") {
    val docs = Tables.load(spark, dir, "documents")
    val index = docs.filter(col("doc_id") % 2 === 0)
    val delta = docs.filter(col("doc_id") % 2 === 1)

    Dedup.dropMinhashIndex(spark, table)
    Dedup.minhashIndexWrite(index, "doc_id", "text", table)
    val (_, bucketsTable) = Dedup.minhashLiveTables(spark, table)
    val viaIndex = Dedup.minhashLshAgainstIndex(delta, "doc_id", "text", table)
    val got = viaIndex.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val want = Dedup.minhashLshAgainst(index, delta, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(want.nonEmpty, "sf0.001 planted near-dups must cross the even/odd split")
    assert(got == want,
      s"index-backed join diverged: ${(got -- want).size} extra, " +
        s"${(want -- got).size} missing of ${want.size}")

    // the 100 TB property: NO shuffle exchange anywhere above the stored
    // band-bucket scan — only the delta's buckets move into the layout.
    // The operator pins (materializes) the candidate pairs internally, so
    // the plan to audit is the candidate join itself, rebuilt here from
    // the same shared projections the operator uses.
    val candJoin = spark.table(bucketsTable).as("i")
      .join(Dedup.bandBuckets(
        Dedup.shingleProjection(delta, "doc_id", "text", 3), 128, 32).as("d"),
        Seq("band", "sig"))
      .select(col("i.doc_id").as("doc_a"), col("d.doc_id").as("doc_b"))
    assert(candJoin.count() > 0)
    val nodes = flatten(candJoin.queryExecution.executedPlan)
    val offending = nodes.collect { case ex: ShuffleExchangeLike => ex }
      .filter { ex =>
        flatten(ex.asInstanceOf[SparkPlan]).exists {
          case f: FileSourceScanExec =>
            f.tableIdentifier.exists(_.table == bucketsTable)
          case _ => false
        }
      }
    assert(offending.isEmpty,
      s"the index scan sits under ${offending.size} shuffle exchange(s) — " +
        "the persisted bucketing is not being used")
    val bucketScans = nodes.collect {
      case f: FileSourceScanExec if f.tableIdentifier.exists(_.table == bucketsTable) => f
    }
    assert(bucketScans.nonEmpty, "the stored band-bucket table must be scanned")
  }

  test("a table without banding properties is rejected loudly") {
    dropManaged("notanindex_buckets")
    spark.range(3).selectExpr("id AS doc_id", "CAST(id AS INT) AS band", "id AS sig")
      .write.mode("overwrite").saveAsTable("notanindex_buckets")
    val e = intercept[IllegalArgumentException] {
      Dedup.minhashLshAgainstIndex(
        Tables.load(spark, dir, "documents").limit(3), "doc_id", "text", "notanindex")
    }
    assert(e.getMessage.contains("not a graft minhash index"))
  }
}
