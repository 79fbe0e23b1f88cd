package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GenDir, GraftSession, Tables}
import graft.operators.{Media, PhashIndex}

/** The persisted perceptual-hash index ([[graft.operators.PhashIndex]])
  * — the multimodal lifecycle twin of MinhashIndexSpec: serve+merge over
  * deltas equals the inline one-shot pair set, append is exactly-once
  * and crash-safe (`_DONE`-gated), staleness counts committed batches
  * only, rebuild defragments without changing a pair and tombstones
  * absorbed batches, and generations publish reader-atomically. */
class PhashIndexSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4, "graft-phidx")
  private val pid = java.lang.ProcessHandle.current().pid()
  private lazy val dir = "/root/testdata/sf0.001"
  import spark.implicits._

  private def hfs(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Planted-duplicate media corpus (the q127/q166 fixture). */
  private def corpus(): DataFrame = {
    val d = Tables.load(spark, dir, "documents").select(col("doc_id"), col("text"))
    d.union(d.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .withColumn("media", Media.asMedia("payload", "image/stub"))
  }

  private def norm(df: DataFrame): Set[(Long, Long)] =
    df.select(least(col("doc_a"), col("doc_b")),
        greatest(col("doc_a"), col("doc_b")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("serve+merge over two deltas equals the inline run; exactly-once append; " +
      "crashed append redone; staleness counts committed only") {
    val dd = corpus()
    val base = dd.filter(col("doc_id") % 3 === 0)
    val d1 = dd.filter(col("doc_id") % 3 === 1)
    val d2 = dd.filter(col("doc_id") % 3 === 2)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-phidx-spec-$pid"
    PhashIndex.build(base, "doc_id", "media", path)
    val truth = norm(Media.perceptualDupPairs(dd, "doc_id", "media"))
    assert(truth.nonEmpty, "fixture must contain planted duplicate pairs")
    val day1 = norm(PhashIndex.pairsAgainstIndex(d1, "doc_id", "media", path)) ++
      norm(Media.perceptualDupPairs(d1, "doc_id", "media"))
    PhashIndex.append(d1, "doc_id", "media", path, "b1")
    val st1 = PhashIndex.staleness(spark, path).head()
    assert(st1.getLong(1) == d1.count(), s"append must count its docs: $st1")
    // exactly-once: a committed retry is a no-op
    PhashIndex.append(d1, "doc_id", "media", path, "b1")
    assert(PhashIndex.staleness(spark, path).head().getLong(1) == st1.getLong(1))
    // crash-safe: a sentinel-less dir (crashed append) is ignored by
    // staleness and redone by the retry
    val g = GenDir.resolveRequired(spark, path)
    val crashed = new Path(s"$g/appends/batch=b2")
    hfs(path).mkdirs(crashed)
    assert(PhashIndex.staleness(spark, path).head().getLong(1) == st1.getLong(1),
      "a sentinel-less append dir must not count")
    PhashIndex.append(d2, "doc_id", "media", path, "b2")
    assert(hfs(path).exists(new Path(crashed, "_DONE")))
    val day2 = norm(PhashIndex.pairsAgainstIndex(d2, "doc_id", "media", path)
        // b2 is already merged: same-id pairs are dropped by the serve,
        // batch-member pairs belong to the within pass (replay shape)
        .join(d2.select(col("doc_id").as("doc_a")), Seq("doc_a"), "left_anti")) ++
      norm(Media.perceptualDupPairs(d2, "doc_id", "media"))
    val workflow = norm(Media.perceptualDupPairs(base, "doc_id", "media")) ++
      day1 ++ day2
    assert(workflow == truth,
      s"serve+merge must equal inline: missing ${(truth -- workflow).take(5)}, " +
        s"extra ${(workflow -- truth).take(5)}")
  }

  test("rebuild defragments to one generation, changes no pair, tombstones " +
      "absorbed batches; publish is reader-atomic") {
    val dd = corpus()
    val base = dd.filter(col("doc_id") % 3 === 0)
    val d1 = dd.filter(col("doc_id") % 3 === 1)
    val probe = dd.filter(col("doc_id") % 3 === 2)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-phidx-reb-$pid"
    PhashIndex.build(base, "doc_id", "media", path)
    PhashIndex.append(d1, "doc_id", "media", path, "b1")
    val servedBefore = norm(PhashIndex.pairsAgainstIndex(probe, "doc_id", "media", path))
    assert(servedBefore.nonEmpty, "probe must hit the index")
    val genBefore = GenDir.resolveRequired(spark, path)
    PhashIndex.rebuild(spark, path)
    val genAfter = GenDir.resolveRequired(spark, path)
    assert(genAfter != genBefore, "rebuild must publish a new generation")
    val st = PhashIndex.staleness(spark, path).head()
    assert(st.getLong(0) == base.count() + d1.count() && st.getLong(1) == 0L,
      s"rebuild must absorb appends into built mass and reset the counter: $st")
    assert(norm(PhashIndex.pairsAgainstIndex(probe, "doc_id", "media", path))
      == servedBefore, "untrained banding: rebuild must change no pair")
    // absorbed-batch retry protection via the tombstone
    PhashIndex.append(d1, "doc_id", "media", path, "b1")
    assert(PhashIndex.staleness(spark, path).head().getLong(1) == 0L,
      "a late retry of an absorbed batch must be a no-op")
    // reader-atomicity: a serve resolved before a second rebuild keeps
    // its generation (grace keeps one back)
    PhashIndex.rebuild(spark, path)
    assert(hfs(path).exists(new Path(genAfter)),
      "grace must keep the previous generation for in-flight readers")
    assert(!hfs(path).exists(new Path(genBefore)),
      "the generation behind the grace window must be swept")
  }

  test("schedule invariance: two different delta slicings produce the same accepted set") {
    val dd = corpus()
    def run(mod: Int, path: String): Set[Long] = {
      val base = dd.filter(col("doc_id") % 3 === 0)
      PhashIndex.build(base, "doc_id", "media", path)
      val delta = dd.filter(col("doc_id") % 3 =!= 0)
        .orderBy(col("doc_id")).collect()
      val rejected = scala.collection.mutable.Set.empty[Long]
      delta.grouped(math.max(1, delta.length / mod)).zipWithIndex.foreach {
        case (rows, i) =>
          val ids = rows.map(_.getLong(0)).toSeq
          val batch = dd.join(ids.toDF("doc_id"), Seq("doc_id"))
          val rejIdx = PhashIndex.pairsAgainstIndex(batch, "doc_id", "media", path)
            .join(batch.select(col("doc_id").as("doc_a")), Seq("doc_a"), "left_anti")
            .select(col("doc_b").as("doc_id"))
          val rejSelf = Media.perceptualDupPairs(batch, "doc_id", "media")
            .select(col("doc_b").as("doc_id"))
          rejected ++= rejIdx.unionByName(rejSelf).distinct()
            .collect().map(_.getLong(0))
          PhashIndex.append(batch, "doc_id", "media", path, s"e$i")
      }
      val all = delta.map(_.getLong(0)).toSet
      all -- rejected
    }
    val tmp = System.getProperty("java.io.tmpdir")
    val a = run(3, s"$tmp/graft-phidx-sched3-$pid")
    val b = run(7, s"$tmp/graft-phidx-sched7-$pid")
    assert(a == b, s"accepted set must be schedule-invariant: " +
      s"onlyA=${(a -- b).take(5)}, onlyB=${(b -- a).take(5)}")
  }
}
