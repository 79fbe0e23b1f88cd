package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GenDir, GraftSession, Tables}
import graft.operators.{Dedup, Similarity, UrlIndex}

/** Pre-generation (round ≤ 11) index layouts stay readable, appendable
  * and migratable (round-12 review finding: the committed-generation
  * migration initially left every previously persisted index unreadable).
  * Each family: build a legacy replica (the old flat/unsuffixed layout),
  * prove serve + maintenance work on it unchanged, run the migrating
  * maintenance op, prove the index now resolves to a generation with
  * identical semantics, and prove the legacy remnants are swept on the
  * following publish (the normal grace window). */
class LegacyLayoutSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  private val dir = "/root/testdata/sf0.001"
  private val pid = java.lang.ProcessHandle.current().pid()

  private def hfs(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Demote a generation-layout dir index to the legacy flat layout:
    * move the contents of `_g0` up to the root and drop the gen dir. */
  private def flattenGen0(path: String): Unit = {
    val fs = hfs(path)
    val g0 = new Path(GenDir.genPath(path, 0))
    fs.listStatus(g0).foreach { s =>
      if (s.getPath.getName != GenDir.CommitMarker)
        assert(fs.rename(s.getPath, new Path(path, s.getPath.getName)))
    }
    fs.delete(g0, true): Unit
  }

  test("legacy flat IVF index: serves, appends, rebuild migrates, next publish sweeps") {
    val emb = Tables.load(spark, dir, "embeddings")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-legacy-ivf-$pid"
    val fs = hfs(path)
    if (fs.exists(new Path(path))) fs.delete(new Path(path), true)
    Similarity.buildIvfIndex(emb.filter(col("vec_id") % 2 === 0), path,
      "vec_id", "embedding")
    flattenGen0(path)
    assert(Similarity.ivfCurrent(spark, path) == path,
      "a flat legacy index must resolve to its root")
    val q = emb.filter(col("vec_id") < 30)
    def serve() = Similarity.ivfTopKFromIndex(path, q, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val legacyServe = serve()
    assert(legacyServe.nonEmpty, "legacy layout must serve")
    // maintenance on the legacy layout: append + staleness, old semantics
    Similarity.appendToIvfIndex(
      emb.filter(col("vec_id") % 2 === 1), path, "vec_id", "embedding", "d1")
    val st = Similarity.ivfIndexStaleness(spark, path).head()
    assert(st.getLong(1) > 0L, s"legacy append must count: $st")
    // the migrating op: rebuild publishes _g0; the flat subdirs stay as
    // the grace generation
    Similarity.rebuildIvfIndex(spark, path)
    val cur = Similarity.ivfCurrent(spark, path)
    assert(cur != path && cur.contains(GenDir.Prefix),
      s"rebuild must migrate a legacy index to a generation: $cur")
    assert(fs.exists(new Path(s"$path/lists")),
      "grace: the flat legacy data survives one publish for in-flight readers")
    assert(serve().nonEmpty, "migrated index must serve")
    // the publish AFTER the migration sweeps the legacy remnants
    Similarity.rebuildIvfIndex(spark, path)
    assert(!fs.exists(new Path(s"$path/lists")) &&
      !fs.exists(new Path(s"$path/meta")),
      "the second publish must sweep the flat legacy subdirs")
    assert(serve().nonEmpty)
    fs.delete(new Path(path), true): Unit
  }

  test("legacy SENTINEL-LESS append markers: staleness counts them, rebuild " +
      "carries their tombstones, a late retry of an absorbed batch is a no-op") {
    // a round-≤11 append committed its counter marker via tmp+rename with
    // no _DONE sentinel — hand-build that layout by stripping the sentinel
    val emb = Tables.load(spark, dir, "embeddings")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-legacy-ivf-sl-$pid"
    val fs = hfs(path)
    if (fs.exists(new Path(path))) fs.delete(new Path(path), true)
    Similarity.buildIvfIndex(emb.filter(col("vec_id") % 2 === 0), path,
      "vec_id", "embedding")
    flattenGen0(path)
    val d1 = emb.filter(col("vec_id") % 2 === 1)
    Similarity.appendToIvfIndex(d1, path, "vec_id", "embedding", "d1")
    val sentinel = new Path(s"$path/appends/batch=d1/_DONE")
    assert(fs.delete(sentinel, false), "fixture: strip the sentinel")
    // and one GENUINE partial marker (empty dir, unreadable parquet) —
    // it must never be stamped or counted
    fs.mkdirs(new Path(s"$path/appends/batch=crashed"))
    // and one TORN marker (readable parquet — the direct-write-committer
    // crash shape — but its recorded count disagrees with the lists
    // delta, because the append died between moving list files and the
    // final count): resolution must leave it unstamped for its retry
    spark.createDataFrame(Seq(Tuple1(999999L))).toDF("rows")
      .write.mode("overwrite").parquet(s"$path/appends/batch=torn")
    // (a) staleness must read the legacy committed batch's mass, not 0
    val st = Similarity.ivfIndexStaleness(spark, path).head()
    val d1Rows = d1.count()
    assert(st.getLong(1) == d1Rows,
      s"sentinel-less committed legacy marker must count its rows: $st")
    assert(fs.exists(sentinel),
      "legacy resolution must stamp the sentinel on the readable marker")
    assert(!fs.exists(new Path(s"$path/appends/batch=crashed/_DONE")),
      "an unreadable partial marker must stay unstamped")
    assert(!fs.exists(new Path(s"$path/appends/batch=torn/_DONE")),
      "a readable marker whose count disagrees with the lists delta is a " +
        "torn direct-write and must stay unstamped")
    // (b) rebuild (the migration) carries the batch tombstone forward
    fs.delete(sentinel, false) // strip again: prove REBUILD also stamps
    Similarity.rebuildIvfIndex(spark, path)
    val cur = Similarity.ivfCurrent(spark, path)
    assert(fs.exists(new Path(s"$cur/appends/batch=d1/_DONE")),
      "rebuild must carry the legacy batch's tombstone into the new generation")
    assert(!fs.exists(new Path(s"$cur/appends/batch=crashed")),
      "a partial marker's batch never landed — no tombstone")
    val st2 = Similarity.ivfIndexStaleness(spark, path).head()
    assert(st2.getLong(1) == 0L, s"rebuild absorbs the mass: $st2")
    // (c) a late upstream retry of the absorbed batch is skipped
    val listRows = spark.read.parquet(s"$cur/lists").count()
    Similarity.appendToIvfIndex(d1, path, "vec_id", "embedding", "d1")
    assert(spark.read.parquet(s"$cur/lists").count() == listRows,
      "a late retry of an absorbed legacy batch must not re-append vectors")
    assert(Similarity.ivfIndexStaleness(spark, path).head().getLong(1) == 0L)
    fs.delete(new Path(path), true): Unit
  }

  test("legacy unsuffixed minhash tables: serve, append, rebuild migrates, next publish drops them") {
    val docs = Tables.load(spark, dir, "documents")
    val table = s"legacymh_$pid"
    Dedup.dropMinhashIndex(spark, table)
    Dedup.minhashIndexWrite(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", table)
    // demote generation 0 to the legacy names (ALTER RENAME moves the
    // managed locations — exactly what the old layout looked like)
    spark.sql(s"ALTER TABLE ${table}_sh__g0 RENAME TO ${table}_sh")
    spark.sql(s"ALTER TABLE ${table}_buckets__g0 RENAME TO ${table}_buckets")
    spark.catalog.refreshTable(s"${table}_sh")
    spark.catalog.refreshTable(s"${table}_buckets")
    val delta = docs.filter(col("doc_id") % 2 === 1)
    def serve() = Dedup.minhashLshAgainstIndex(delta, "doc_id", "text", table)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val legacyServe = serve()
    assert(legacyServe.nonEmpty, "legacy tables must serve")
    Dedup.minhashIndexAppend(delta.limit(50), "doc_id", "text", table, "b1")
    assert(Dedup.minhashIndexStaleness(spark, table).head().getLong(1) > 0L)
    Dedup.minhashIndexRebuild(spark, table)
    val (shT, _) = Dedup.minhashLiveTables(spark, table)
    assert(shT == s"${table}_sh__g0",
      s"rebuild must migrate legacy tables to generation 0: $shT")
    assert(spark.sessionState.catalog.tableExists(
      org.apache.spark.sql.catalyst.TableIdentifier(s"${table}_sh")),
      "grace: legacy tables survive one publish")
    assert(serve() == serve(), "migrated index must serve deterministically")
    Dedup.minhashIndexRebuild(spark, table)
    assert(!spark.sessionState.catalog.tableExists(
      org.apache.spark.sql.catalyst.TableIdentifier(s"${table}_sh")),
      "the second publish must drop the legacy tables")
    assert(serve().nonEmpty)
    Dedup.dropMinhashIndex(spark, table)
  }

  test("legacy flat url index: members, claims, compaction migrates and sweeps") {
    import spark.implicits._
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-legacy-url-$pid"
    val fs = hfs(path)
    if (fs.exists(new Path(path))) fs.delete(new Path(path), true)
    def urls(ids: Range) = ids.map(i => s"http://d$i.example.com/p").toDF("canonical_url")
    // the old layout: batch dirs directly under the root, no generation
    urls(0 until 40).write.mode("overwrite").parquet(s"$path/batch=seed")
    urls(40 until 50).write.mode("overwrite").parquet(s"$path/batch=b0")
    def memberSet() = UrlIndex.members(spark, path)
      .collect().map(_.getString(0)).toSet
    assert(memberSet().size == 50, "legacy flat layout must be readable")
    UrlIndex.claim(urls(50 until 60), path, "1")
    assert(memberSet().size == 60, "claims must land in the legacy layout")
    assert(UrlIndex.compactIfFragmented(spark, path, threshold = 1))
    assert(GenDir.resolve(spark, path).nonEmpty,
      "compaction must migrate the legacy layout to a generation")
    assert(!fs.listStatus(new Path(path)).exists(s =>
      s.isDirectory && s.getPath.getName.startsWith("batch=")),
      "the migration compaction must sweep the flat batch dirs")
    assert(memberSet().size == 60, "membership invariant across the migration")
    fs.delete(new Path(path), true): Unit
  }
}
