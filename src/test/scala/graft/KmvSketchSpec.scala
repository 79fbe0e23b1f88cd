package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.functions.{kmv_distinct, kmv_jaccard, kmv_merge, kmv_sketch}

/** KMV sketch: exactness below k, estimate accuracy, bit-identical merges
  * (the persist-then-roll-up contract), and the q73 similarity matrix. */
class KmvSketchSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  import org.apache.spark.sql.DataFrame

  private val K = 256

  private def sketchOf(df: DataFrame): Array[Byte] =
    df.agg(kmv_sketch(xxhash64(col("v")), K).as("sk"))
      .head().getAs[Array[Byte]]("sk")

  test("below k the sketch IS the set: distinct estimate is exact") {
    import spark.implicits._
    val df = (1 to 100).map(i => s"item$i").toDF("v")
    val est = df.agg(kmv_distinct(kmv_sketch(xxhash64(col("v")), K), K).as("d"))
      .head().getLong(0)
    assert(est === 100L)
  }

  test("distinct estimate within the standard error band at 50k >> k") {
    import spark.implicits._
    val n = 50000
    val df = (1 to n).map(i => s"val$i").toDF("v")
    val est = df.agg(kmv_distinct(kmv_sketch(xxhash64(col("v")), K), K).as("d"))
      .head().getLong(0)
    // se ≈ n/sqrt(k-2) ≈ 3140 at k=256; allow 4 se
    assert(math.abs(est - n) < 4.0 * n / math.sqrt(K - 2.0),
      s"kmv_distinct=$est for true $n")
  }

  test("jaccard estimate tracks exact overlap") {
    import spark.implicits._
    // |A|=|B|=6000, |A∩B|=3000 → J = 3000/9000 = 1/3
    val a = (1 to 6000).map(i => s"t$i").toDF("v")
    val b = (3001 to 9000).map(i => s"t$i").toDF("v")
    val est = spark.range(1).select(
      kmv_jaccard(lit(sketchOf(a)), lit(sketchOf(b)), K).as("j"))
      .head().getDouble(0)
    val true_j = 1.0 / 3.0
    // binomial se ≈ sqrt(J(1-J)/k) ≈ 0.029; allow 4 se
    assert(math.abs(est - true_j) < 4.0 * math.sqrt(true_j * (1 - true_j) / K),
      s"kmv_jaccard=$est for true $true_j")
  }

  test("merge is bit-identical: sketch(whole) == kmv_merge(per-part sketches)") {
    import spark.implicits._
    val df = (1 to 20000).map(i => (i % 7, s"item$i")).toDF("part", "v")
    val whole = sketchOf(df.select(col("v")))
    val rolled = df.groupBy(col("part"))
      .agg(kmv_sketch(xxhash64(col("v")), K).as("sk"))
      .agg(kmv_merge(col("sk"), K).as("m"))
      .head().getAs[Array[Byte]]("m")
    assert(java.util.Arrays.equals(whole, rolled),
      "per-part sketches must roll up to the exact whole-corpus sketch")
  }

  test("q73: every estimated jaccard within an absolute band of the exact value") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val toks = docs.select(col("source"),
      explode(graft.functions.tokens_fast(lower(col("text")))).as("tok")).distinct()
    val exact = toks.as("x").join(toks.as("y"),
        col("x.tok") === col("y.tok") && col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("lo"), col("y.source").as("hi"))
      .agg(count(lit(1)).as("inter"))
    val sizes = toks.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val exactJ = exact
      .join(sizes.select(col("source").as("lo"), col("n").as("na")), "lo")
      .join(sizes.select(col("source").as("hi"), col("n").as("nb")), "hi")
      .select(col("lo"), col("hi"),
        (col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double")).as("j"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val rows = SparkEntry.queries("q73_source_similarity_kmv")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pair = (r.getString(0), r.getString(1))
      val ex = exactJ.getOrElse(pair, 0.0)
      assert(r.getAs[Double]("jaccard") == ex,
        s"pair $pair: query's exact jaccard ${r.getAs[Double]("jaccard")} != $ex")
      assert(r.getAs[Boolean]("jaccard_in_band"), s"pair $pair: KMV jaccard out of band")
      assert(r.getAs[Boolean]("vocab_in_band"), s"pair $pair: KMV vocab out of band")
    }
  }
}
