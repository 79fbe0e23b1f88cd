package graft

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GenDir, GraftSession}

/** Unit gates for the committed-generation discipline itself — the four
  * index families exercise it end-to-end (SwapAtomicitySpec,
  * LegacyLayoutSpec); this suite pins the primitive's edge cases
  * directly: sentinel-gated resolution, debris handling, the recency
  * (not numeric) grace selection, idempotent commits, and the hidden
  * naming contract. */
class GenDirSpec extends AnyFunSuite {
  // NOTE the time leg of the grace window is pinned off for the whole
  // test JVM (build.sbt -Dspark.graft.maxScanAgeMs=0) — fixtures commit
  // seconds apart, so the count-rule sweeps stay assertable; the time
  // leg's own cases pass explicit ages to the pure toDrop or set the
  // session conf locally.
  lazy val spark = GraftSession.local(2, "graft-gendir")
  private val pid = java.lang.ProcessHandle.current().pid()
  private var n = 0

  private def freshRoot(): String = {
    n += 1
    val root = s"${System.getProperty("java.io.tmpdir")}/graft-gendir-$pid-$n"
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(root))) fs.delete(new Path(root), true)
    root
  }

  private def fs(root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def mkGen(root: String, g: Int, committed: Boolean): Unit = {
    val f = fs(root)
    f.mkdirs(new Path(GenDir.genPath(root, g)))
    f.create(new Path(GenDir.genPath(root, g), "data.bin"), true).close()
    if (committed)
      f.create(new Path(GenDir.genPath(root, g), GenDir.CommitMarker), true).close()
  }

  test("resolve: empty root, no committed gen, sentinel-gated adoption") {
    val root = freshRoot()
    assert(GenDir.resolve(spark, root).isEmpty, "missing root resolves to None")
    intercept[IllegalStateException](GenDir.resolveRequired(spark, root))
    mkGen(root, 0, committed = false)
    assert(GenDir.resolve(spark, root).isEmpty,
      "an uncommitted generation must never resolve (dir existence is not commit evidence)")
    mkGen(root, 0, committed = true)
    assert(GenDir.resolve(spark, root).contains(GenDir.genPath(root, 0)))
    // a HIGHER uncommitted gen (mid-rebuild or crashed) never wins
    mkGen(root, 1, committed = false)
    assert(GenDir.resolve(spark, root).contains(GenDir.genPath(root, 0)))
    mkGen(root, 1, committed = true)
    assert(GenDir.resolve(spark, root).contains(GenDir.genPath(root, 1)))
  }

  test("next: one past everything present, debris included") {
    val root = freshRoot()
    assert(GenDir.next(spark, root) == 0)
    mkGen(root, 0, committed = true)
    mkGen(root, 3, committed = false) // crashed staging with a gap
    assert(GenDir.next(spark, root) == 4,
      "next must clear debris numbers too — a stage can never collide")
  }

  test("toDrop: recency grace, non-dense numbering, debris sweep") {
    // all commits "old" (age 0 conf): pure count-rule behavior
    def drop(all: Seq[(Int, Boolean)], newGen: Int): Seq[Int] =
      GenDir.toDrop(all.map { case (g, c) => (g, c, 0L) }, newGen,
        now = 1000L, maxScanAgeMs = 0L)
    // committed 0, debris 1, committed 2; publishing 3 keeps 2 (newest
    // committed below 3 BY RECENCY), drops 0 and the debris 1
    assert(drop(Seq(0 -> true, 1 -> false, 2 -> true), 3).sorted == Seq(0, 1))
    // non-dense: committed 0, debris 9; publishing 10 keeps 0 as grace —
    // the numeric gen-1 rule would have wrongly dropped it
    assert(drop(Seq(0 -> true, 9 -> false), 10) == Seq(9))
    // nothing below: no drops
    assert(drop(Seq(5 -> true), 5).isEmpty)
    // gens above the published one (a concurrent later stage) are never touched
    assert(drop(Seq(0 -> true, 2 -> false), 1).sorted == Seq.empty[Int],
      "gen 0 is grace; debris 2 is above the publish and must be left alone")
  }

  test("toDrop: the TIME leg keeps recently-committed generations past the count rule") {
    // committed 0 at t=100, committed 1 at t=900, publishing 2 at t=1000
    // with maxScanAge 500: count rule keeps 1; gen 0 is 900ms old → drops
    assert(GenDir.toDrop(Seq((0, true, 100L), (1, true, 900L)), 2,
      now = 1000L, maxScanAgeMs = 500L) == Seq(0))
    // same but gen 0 committed at t=700 (300ms old < 500): KEPT — a scan
    // that started against gen 0 survives the two back-to-back publishes
    assert(GenDir.toDrop(Seq((0, true, 700L), (1, true, 900L)), 2,
      now = 1000L, maxScanAgeMs = 500L).isEmpty)
    // debris is never time-protected (it was never readable)
    assert(GenDir.toDrop(Seq((0, true, 999L), (1, false, 999L)), 2,
      now = 1000L, maxScanAgeMs = 500L) == Seq(1))
    // boundary: exactly maxScanAge old → drops (>= comparison)
    assert(GenDir.toDrop(Seq((0, true, 500L), (1, true, 900L)), 2,
      now = 1000L, maxScanAgeMs = 500L) == Seq(0))
  }

  test("toDrop: the time leg is CAPPED — a fast-compacting stream cannot pile " +
      "up unbounded generations inside the window") {
    // six committed gens all seconds old (a stream compacting every few
    // minutes); publishing 6 with cap 2: count rule keeps gen 5, the time
    // leg keeps only the NEWEST 2 of the rest (gens 4 and 3) — gens 0-2
    // drop even though they are inside the scan-age window
    val all = (0 to 5).map(g => (g, true, 900L + g))
    assert(GenDir.toDrop(all, 6, now = 1000L, maxScanAgeMs = 500L,
      maxTimeKept = 2).sorted == Seq(0, 1, 2))
    // newest-by-COMMIT-TIME, not by number: gen 0 committed last is the
    // one the cap protects
    assert(GenDir.toDrop(Seq((0, true, 990L), (1, true, 910L), (2, true, 920L),
        (3, true, 999L)), 4,
      now = 1000L, maxScanAgeMs = 500L, maxTimeKept = 1).sorted == Seq(1, 2))
    // cap 0 degenerates to the pure count rule
    assert(GenDir.toDrop(Seq((0, true, 999L), (1, true, 999L)), 2,
      now = 1000L, maxScanAgeMs = 500L, maxTimeKept = 0) == Seq(0))
    // the default cap (4) keeps the r13 behavior on small histories —
    // the pre-cap spec cases above all ran with <= 2 candidates
    assert(GenDir.toDrop(Seq((0, true, 700L), (1, true, 900L)), 2,
      now = 1000L, maxScanAgeMs = 500L).isEmpty)
  }

  test("commit: idempotent, sweeps debris, keeps exactly the grace window") {
    val root = freshRoot()
    mkGen(root, 0, committed = true)
    mkGen(root, 1, committed = false) // crashed rebuild
    mkGen(root, 2, committed = false) // the staged gen being published
    GenDir.commit(spark, root, 2)
    val f = fs(root)
    assert(GenDir.resolve(spark, root).contains(GenDir.genPath(root, 2)))
    assert(f.exists(new Path(GenDir.genPath(root, 0))), "grace keeps one back")
    assert(!f.exists(new Path(GenDir.genPath(root, 1))), "debris below is swept")
    // re-commit of the same gen (a retried maintenance step) is a no-op
    GenDir.commit(spark, root, 2)
    assert(GenDir.resolve(spark, root).contains(GenDir.genPath(root, 2)))
    assert(f.exists(new Path(GenDir.genPath(root, 0))))
    // next publish rotates the grace window
    mkGen(root, 3, committed = false)
    GenDir.commit(spark, root, 3)
    assert(!f.exists(new Path(GenDir.genPath(root, 0))))
    assert(f.exists(new Path(GenDir.genPath(root, 2))))
  }

  test("commit honors the time grace: a young superseded generation survives two publishes") {
    val root = freshRoot()
    mkGen(root, 0, committed = true)
    GenDir.commit(spark, root, 0)
    // restore the TEST-JVM pin (an unset would fall back to the 6h
    // production default and break later suites' sweep assertions on the
    // shared session)
    val saved = spark.conf.getOption(GenDir.MaxScanAgeKey)
    spark.conf.set(GenDir.MaxScanAgeKey, GenDir.DefaultMaxScanAgeMs.toString)
    try {
      // two back-to-back publishes: the count rule alone would drop gen 0
      // on the second — the time leg keeps it (committed seconds ago)
      mkGen(root, 1, committed = false)
      GenDir.commit(spark, root, 1)
      mkGen(root, 2, committed = false)
      GenDir.commit(spark, root, 2)
      val f = fs(root)
      assert(f.exists(new Path(GenDir.genPath(root, 0))),
        "a scan that resolved gen 0 must keep its files across two " +
          "back-to-back publishes inside the scan-age window")
      assert(f.exists(new Path(GenDir.genPath(root, 1))))
      assert(GenDir.resolve(spark, root).contains(GenDir.genPath(root, 2)))
    } finally saved.fold(spark.conf.unset(GenDir.MaxScanAgeKey))(
      spark.conf.set(GenDir.MaxScanAgeKey, _))
  }

  test("generation dirs are hidden from accidental root reads") {
    import spark.implicits._
    val root = freshRoot()
    val gen = GenDir.genPath(root, 0)
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(gen)
    GenDir.commit(spark, root, 0)
    assert(GenDir.Prefix.startsWith("_"),
      "the prefix must keep generations out of Spark's file discovery")
    // a direct read of the ROOT (the bug the hidden prefix prevents:
    // silently unioning generations) sees no data files at all
    val e = intercept[Exception](spark.read.parquet(root).count())
    assert(e.getMessage.toLowerCase.contains("unable to infer schema") ||
      e.getMessage.toLowerCase.contains("path does not exist"),
      s"root read must see an empty dataset, not a union: ${e.getMessage}")
    assert(spark.read.parquet(gen).count() == 2)
  }
}
