package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GenDir
import graft.operators.DeconIndex

/** The versioned benchmark-shingle index behind q172 (streaming
  * decontamination against an evolving benchmark suite): release folds
  * publish atomically, the min-gen rule keeps re-shipped shingles at
  * their EARLIEST release (so retro audits probe only what a release
  * newly contaminates), and the whole lifecycle is replay-idempotent. */
class DeconIndexSpec extends AnyFunSuite {
  lazy val spark = graft.core.GraftSession.local(4)
  import spark.implicits._

  // one 6-gram per benchmark text keeps the contamination sets exact:
  // gram A ships in release 1 AND again in release 2; gram B is new in 2
  private val bench1 = Seq("a1 a2 a3 a4 a5 a6").toDF("text")
  private val bench2 = Seq("a1 a2 a3 a4 a5 a6", "b1 b2 b3 b4 b5 b6").toDF("text")
  private def docs = Seq(
    (10L, "z a1 a2 a3 a4 a5 a6"), // carries gram A → release-1 contaminated
    (20L, "z b1 b2 b3 b4 b5 b6"), // carries gram B → release-2 only
    (30L, "c1 c2 c3 c4 c5 c6 c7") // clean against both
  ).toDF("doc_id", "text")

  private def serveMap(path: String): Map[Long, Int] =
    DeconIndex.serve(spark, path, docs, "doc_id", "text", 6)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("release fold: min-gen rule, delta-only retro, idempotent publish, atomic swap") {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-deconidx-spec-" +
      s"${java.lang.ProcessHandle.current().pid()}"
    DeconIndex.seed(spark, path, bench1, "text", 6)
    assert(DeconIndex.maxBenchGen(spark, path) == 1)
    assert(serveMap(path) == Map(10L -> 1), "before the release, only gram A gates")

    DeconIndex.publish(spark, path, bench2, "text", 6, benchGen = 2)
    assert(DeconIndex.maxBenchGen(spark, path) == 2)
    // min-gen: gram A re-shipped in release 2 still contaminates as 1
    assert(serveMap(path) == Map(10L -> 1, 20L -> 2))
    // retro probes ONLY the release delta: doc 10's gram is release-1
    // property (it was gated at intake), so the recall set is exactly 20
    val recalled = DeconIndex.retro(spark, path, docs, "doc_id", "text", 6,
      benchGen = 2).collect().map(_.getLong(0)).toSet
    assert(recalled == Set(20L))
    // the fold published a NEW committed generation (reader-atomic swap)
    val live = GenDir.resolveRequired(spark, path)
    assert(live.endsWith(s"${GenDir.Prefix}1"), live)

    // replay: folding the same release again is a no-op (same live gen)
    DeconIndex.publish(spark, path, bench2, "text", 6, benchGen = 2)
    assert(GenDir.resolveRequired(spark, path) == live)
    assert(serveMap(path) == Map(10L -> 1, 20L -> 2))
    DeconIndex.drop(spark, path)
  }
}
