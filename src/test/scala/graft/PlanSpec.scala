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

  test("partitioned layout: lang filter prunes partitions at the scan") {
    import org.apache.spark.sql.functions.col
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString
    // the 100 TB layout decision: partition the corpus by its coarse
    // filter column so per-language jobs touch 1/k of the files
    docs.write.mode("overwrite").partitionBy("lang").parquet(out)
    val p = spark.read.parquet(out).filter(col("lang") === "en")
      .queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("lang"),
      s"partition pruning not visible:\n$p")
    val en = spark.read.parquet(out).filter(col("lang") === "en").count()
    val all = spark.read.parquet(out).count()
    assert(en > 0 && en < all, "filter must be selective for the check to mean anything")
  }

  test("SimplifyKernelNullChecks: inferred IsNotNull over a kernel chain collapses to the input column") {
    import org.apache.spark.sql.functions._
    import graft.functions.shingle_hashes
    // the pre-surgery q28 shape: nullable kernel column n feeds a join
    // condition, so constraint propagation infers isnotnull(size(shingle
    // _hashes(text))) — the rule must collapse that to isnotnull(text)
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val sh = docs.select(col("lang").as("blk"), col("doc_id").cast("long").as("doc_id"),
        shingle_hashes(col("text"), 3).as("sh"))
      .withColumn("n", size(col("sh")))
    val joined = sh.as("x").join(sh.as("y"),
      col("x.blk") === col("y.blk") && col("x.doc_id") < col("y.doc_id") &&
        col("x.n").cast("double") >= col("y.n") * 0.5)
    val filters = joined.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Filter") || l.contains("Condition")).toSeq
    assert(!filters.exists(_.contains("shingle_hashes")),
      s"kernel survived in a Filter:\n${filters.mkString("\n")}")
    // and the collapse is exact, not a relaxation: same rows as with the
    // rule withheld (a fresh condition evaluated without inferred filters)
    val n = joined.count()
    val brute = docs.select(col("lang").as("blk"), col("doc_id").cast("long").as("doc_id"),
        size(shingle_hashes(col("text"), 3)).as("n"))
    val nRef = brute.as("x").join(brute.as("y"),
      col("x.blk") === col("y.blk") && col("x.doc_id") < col("y.doc_id") &&
        col("x.n").cast("double") >= col("y.n") * 0.5).count()
    assert(n == nRef, s"rule changed join cardinality: $n vs $nRef")
  }

  test("repetition signals: pure map work — no exchange except the output sort") {
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val p = graft.operators.Pipeline.repetitionSignals(docs, "doc_id", "text")
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("Exchange"), s"repetition signals must not shuffle:\n$p")
  }

  test("quality filter: predicate evaluated map-side, no exchange") {
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val p = graft.operators.Pipeline
      .qualityFilter(docs, "doc_id", "text", 20, 120, 0.45)
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("Exchange"), s"quality filter must not shuffle:\n$p")
  }

  test("ngram decontamination: eval shingle side broadcasts into the semi join") {
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val train = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 10 =!= 0)
    val testSet = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 10 === 0)
    val p = graft.operators.Pipeline
      .decontaminateNgrams(train, testSet, "doc_id", "text", 6)
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"small eval side should broadcast:\n$p")
  }

  test("kmeans assignment: centroids broadcast, corpus never shuffles before scoring") {
    val emb = graft.core.Tables.load(spark, dir, "embeddings")
    val cents = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 8)
    val p = graft.operators.Similarity
      .assignToCentroids(emb, cents, "vec_id", "embedding", "vec_id", "embedding")
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"centroid side should broadcast:\n$p")
    // the only shuffle exchange is the per-vector argmax window partitioning
    assert("(?<!Broadcast)Exchange \\(".r.findAllIn(p).size == 1,
      s"exactly one shuffle (the argmax window):\n$p")
  }
}
