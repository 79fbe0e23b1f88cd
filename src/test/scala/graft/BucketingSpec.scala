package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftSession, Tables}
import graft.operators.Bucketing

class BucketingSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  private val dir = "/root/testdata/sf0.001"

  test("salted join and salted aggregation match their unsalted equivalents") {
    import graft.operators.Skew
    val li = Tables.load(spark, dir, "lineitem")
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val plain = li.join(o, "l_orderkey").count()
    val salted = Skew.saltedJoin(li, o, "l_orderkey", salt = 8).count()
    assert(salted == plain, s"salting changed join cardinality: $salted vs $plain")

    val cPlain = li.groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val cSalted = Skew.saltedCount(li, "l_returnflag", salt = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cSalted == cPlain)
  }

  test("bucketed co-located join plans without any shuffle exchange") {
    // disable auto-broadcast so the join would otherwise need an exchange
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(
        Tables.load(spark, dir, "lineitem")
          .select(col("l_orderkey").as("k"), col("l_quantity")),
        "b_lineitem", buckets = 8, keys = Seq("k"))
      Bucketing.writeBucketed(
        Tables.load(spark, dir, "orders")
          .select(col("o_orderkey").as("k"), col("o_totalprice")),
        "b_orders", buckets = 8, keys = Seq("k"))

      val joined = Bucketing.coLocatedJoin(spark, "b_lineitem", "b_orders", Seq("k"))
      assert(Bucketing.isExchangeFree(joined),
        s"expected exchange-free plan:\n${joined.queryExecution.executedPlan}")

      // and the unbucketed equivalent DOES shuffle — the comparison point
      val plain = Tables.load(spark, dir, "lineitem").select(col("l_orderkey").as("k"))
        .join(Tables.load(spark, dir, "orders").select(col("o_orderkey").as("k")), "k")
      assert(!Bucketing.isExchangeFree(plain), "control join should shuffle")

      // correctness: same row count either way
      assert(joined.count() == plain.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }

  test("q80: bucketed rollup matches the plain join; join subtree shuffle-free") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q80 = graft.queries.Catalog.all.find(_.name == "q80_bucketed_join").get
      val df = q80.fn(spark, dir)
      val got = df.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      val plain = Tables.load(spark, dir, "orders")
        .join(Tables.load(spark, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == plain, s"bucketed rollup diverged: ${got -- plain} vs ${plain -- got}")

      // the join itself must read both bucketed tables without an exchange —
      // only the (tiny) rollup/sort above it is allowed to shuffle
      // AQE nests the join inside query stages `collect` treats as leaves
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => a +: flatten(a.executedPlan)
        case q: QueryStageExec => q +: flatten(q.plan)
        case _ => p +: p.children.flatMap(flatten)
      }
      val smj = flatten(df.queryExecution.executedPlan)
        .collectFirst { case j: SortMergeJoinExec => j }
      assert(smj.nonEmpty, s"expected a sort-merge join:\n${df.queryExecution.executedPlan}")
      val shuffled = flatten(smj.get).filter(_.isInstanceOf[ShuffleExchangeLike])
      assert(shuffled.isEmpty,
        s"bucketed join subtree contains a shuffle:\n${df.queryExecution.executedPlan}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("compaction: many small files collapse to the byte-target count, content identical") {
    val base = s"${System.getProperty("java.io.tmpdir")}/graft-compact-" +
      java.lang.ProcessHandle.current().pid()
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("value"))
    ev.repartition(64).write.mode("overwrite").parquet(base)
    def parts = new java.io.File(base).listFiles()
      .count(_.getName.startsWith("part-"))
    assert(parts == 64, s"fixture should start fragmented: $parts files")
    val before = ev.collect().map(_.getLong(0)).sorted.toSeq
    val totalBytes = new java.io.File(base).listFiles()
      .filter(_.getName.startsWith("part-")).map(_.length).sum
    val target = totalBytes / 4 + 1
    val n = Bucketing.compact(spark, base, target)
    val live = Bucketing.current(spark, base)
    assert(live != base, "compaction must publish a generation dir")
    def liveParts = new java.io.File(live).listFiles()
      .count(_.getName.startsWith("part-"))
    assert(n <= 4 && liveParts == n, s"expected <=4 compacted files, got $n / $liveParts")
    assert(parts == 0, "the flat files must be migrated into generation 0")
    val after = spark.read.parquet(live).collect().map(_.getLong(0)).sorted.toSeq
    assert(after == before, "compaction must not change content")
    assert(new java.io.File(live, graft.core.GenDir.CommitMarker).exists(),
      "the live generation must carry its commit sentinel")
    // a second compaction publishes a new generation and keeps ONE back
    val n2 = Bucketing.compact(spark, base, target)
    val live2 = Bucketing.current(spark, base)
    assert(live2 != live && n2 >= 1, "second compaction must advance the generation")
    assert(new java.io.File(live).exists(),
      "grace must keep the previous generation for in-flight readers")
    assert(spark.read.parquet(live2).collect().map(_.getLong(0)).sorted.toSeq == before)
  }

  test("morton interleave: known bit patterns, positive range, locality") {
    import graft.functions.Zorder
    assert(Zorder.interleave2(0x3L, 0x0L) == 0x5L)  // a bits land at even slots
    assert(Zorder.interleave2(0x0L, 0x3L) == 0xAL)  // b bits at odd slots
    assert(Zorder.interleave2(0x7FFFFFFFL, 0x7FFFFFFFL) > 0L,
      "62 interleaved bits must stay a positive long")
    // locality: small moves in either dim make small z deltas near origin
    assert(Zorder.interleave2(1, 0) < Zorder.interleave2(2, 0))
    assert(Zorder.interleave2(0, 1) < Zorder.interleave2(0, 2))
  }

  test("writeZOrdered on an empty frame: clean empty write, no NPE on null min/max") {
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("value"))
      .filter(col("user_id") < 0) // empty by construction
    val base = s"${System.getProperty("java.io.tmpdir")}/graft-zempty-" +
      java.lang.ProcessHandle.current().pid()
    Bucketing.writeZOrdered(ev, s"$base/z", "user_id", "value", nFiles = 4)
    assert(spark.read.parquet(s"$base/z").count() == 0L,
      "empty input must produce a readable empty dataset")
  }

  test("z-ordered layout skips row groups a scrambled layout must read") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("value"))
    val base = s"${System.getProperty("java.io.tmpdir")}/graft-zorder-" +
      java.lang.ProcessHandle.current().pid()
    Bucketing.writeZOrdered(ev, s"$base/z", "user_id", "value", nFiles = 8)
    // adversarial baseline: same rows, same file count, random layout
    ev.withColumn("__r", xxhash64(col("event_id")))
      .repartitionByRange(8, col("__r")).sortWithinPartitions(col("__r"))
      .drop("__r").write.mode("overwrite").parquet(s"$base/r")

    def readWithFilter(path: String): (Long, Seq[(Long, Long)]) = {
      val rows = new java.util.concurrent.atomic.AtomicLong()
      val l = new SparkListener {
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
          rows.addAndGet(Option(t.taskMetrics)
            .map(_.inputMetrics.recordsRead).getOrElse(0L)): Unit
      }
      spark.sparkContext.addSparkListener(l)
      try {
        val got = spark.read.parquet(path)
          .filter(col("user_id") < 3 && col("value") > 250.0)
          .select(col("event_id"), col("user_id"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
        // listener bus is async: poll the counter until stable
        var last = -1L; var stable = 0; var waited = 0
        while (stable < 2 && waited < 5000) {
          val now = rows.get()
          if (now == last) stable += 1 else stable = 0
          last = now; Thread.sleep(100); waited += 100
        }
        (rows.get(), got)
      } finally spark.sparkContext.removeSparkListener(l)
    }
    val (zRead, zRows) = readWithFilter(s"$base/z")
    val (rRead, rRows) = readWithFilter(s"$base/r")
    assert(zRows == rRows, "layout must never change query results")
    assert(zRows.nonEmpty, "filter should select something")
    // scrambled layout: every row group spans the full user range → reads
    // ~everything; z-ordered: only row groups intersecting the predicate
    // rectangle decode
    assert(zRead * 2 < rRead,
      s"z-ordered read $zRead records vs scrambled $rRead — no skipping observed")
  }
}
