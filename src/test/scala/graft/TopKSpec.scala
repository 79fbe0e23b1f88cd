package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftSession, Tables}
import graft.functions.top_k

/** Bounded top-k aggregate: window-rank equivalence, merge/partitioning
  * invariance, and the map-side-combine plan property that motivates it. */
class TopKSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("top_k == window row_number <= k, bit-identical, any partitioning") {
    val ev = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("value"), col("event_id"))
    // window reference: value desc, event_id asc (total order)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id").asc)
    val want = ev.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
      .select("user_id", "rnk", "event_id", "value")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSet
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("user_id"))
      .agg(top_k(struct(col("value"), (-col("event_id")).as("nid")), 3).as("top"))
      .select(col("user_id"), posexplode(col("top")).as(Seq("i", "s")))
      .select(col("user_id"), (col("i") + 1).cast("int").as("rnk"),
        (-col("s.nid")).as("event_id"), col("s.value"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSet
    assert(agg(ev) === want)
    // partial/final merge across an adversarial partitioning: same result
    assert(agg(ev.repartition(17, col("event_id"))) === want)
  }

  test("top_k: SQL surface, null inputs skipped, k >= group size = whole group") {
    graft.functions.registerAll(spark)
    spark.range(0, 10).selectExpr("id", "CAST(id % 3 AS LONG) AS g")
      .createOrReplaceTempView("tk_in")
    val rows = spark.sql(
      "SELECT g, top_k(id, 100) AS t FROM tk_in GROUP BY g ORDER BY g")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1))
    rows.foreach { case (g, vs) =>
      val expect = (0L until 10L).filter(_ % 3 == g).sortBy(-_)
      assert(vs === expect, s"group $g")
    }
    val withNulls = Seq((1L, Some(5.0)), (1L, None), (1L, Some(7.0)))
      .toDF("g", "v")
    val got = withNulls.groupBy("g").agg(top_k(col("v"), 5).as("t"))
      .head().getSeq[Double](1)
    assert(got === Seq(7.0, 5.0), "nulls must not occupy heap slots")
  }

  test("top_k plan: partial aggregation before the exchange (map-side combine)") {
    val ev = Tables.load(spark, dir, "events")
    val plan = ev.groupBy(col("user_id"))
      .agg(top_k(struct(col("value"), col("event_id")), 3).as("top"))
      .queryExecution.executedPlan.toString
    // ObjectHashAggregate pairs: partial before the exchange, final after
    val aggs = "ObjectHashAggregate".r.findAllIn(plan).size
    assert(aggs >= 2, s"expected partial+final aggregate pair:\n$plan")
    assert(plan.indexOf("partial_top_k") > 0 || plan.contains("partial"),
      s"map-side partial aggregation missing:\n$plan")
  }

  test("bottom_k: k smallest ascending, string order without negation tricks") {
    graft.functions.registerAll(spark)
    val got = Seq("pear", "apple", "fig", "date", "kiwi").toDF("s")
      .agg(graft.functions.bottom_k(col("s"), 3).as("b"))
      .head().getSeq[String](0)
    assert(got === Seq("apple", "date", "fig"))
    val sql = spark.sql("SELECT bottom_k(x, 2) FROM VALUES (3),(1),(2) AS t(x)")
      .head().getSeq[Int](0)
    assert(sql === Seq(1, 2))
  }

  test("property: top_k/bottom_k == sorted take(k) over random data and partitionings") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    val gen = for {
      n <- Gen.choose(0, 200)
      vals <- Gen.listOfN(n, Gen.choose(-1000L, 1000L))
      groups <- Gen.listOfN(n, Gen.choose(0, 5))
      k <- Gen.choose(1, 12)
      parts <- Gen.choose(1, 9)
    } yield (vals.zip(groups), k, parts)
    val prop = Prop.forAll(gen) { case (rows, k, parts) =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(
          rows.map { case (v, g) => org.apache.spark.sql.Row(v, g) }, parts),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("v",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("g",
            org.apache.spark.sql.types.IntegerType))))
      val top = df.groupBy("g").agg(top_k(col("v"), k).as("t"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
      val bottom = df.groupBy("g").agg(graft.functions.bottom_k(col("v"), k).as("b"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
      val ref = rows.groupBy(_._2).view.mapValues(_.map(_._1).sorted).toMap
      ref.forall { case (g, sorted) =>
        top(g) == sorted.reverse.take(k) && bottom(g) == sorted.take(k)
      }
    }
    val res = check(Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, s"property falsified: ${res.status}")
  }

  test("top_k: hostile inputs") {
    assertThrows[IllegalArgumentException] {
      graft.functions.TopKAgg(
        org.apache.spark.sql.catalyst.expressions.Literal(1L), 0)
    }
    val empty = Seq.empty[(Long, Double)].toDF("g", "v")
    assert(empty.groupBy("g").agg(top_k(col("v"), 3)).count() === 0)
    // global aggregate over an empty frame yields an empty array
    val g = Seq.empty[(Long, Double)].toDF("g", "v")
      .agg(top_k(col("v"), 3).as("t")).head().getSeq[Double](0)
    assert(g.isEmpty)
  }
}
