package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftSession, Tables}
import graft.operators.Dedup

/** Verify-path broadcast gate (VERDICT r8 "what's wrong" #3).
  *
  * The dedup verify path semi-joins the raw table down to the candidate-id
  * set. Candidate volume scales with the corpus's near-dup DENSITY, not a
  * contract-bounded batch, so the former unconditional `broadcast(ids)`
  * was a hard-failure cliff at 100 TB dup-heavy corpora. The gate
  * (`Dedup.maxBroadcastIdBytes`) broadcasts only while the measured size
  * estimate fits, else drops the hint and lets Catalyst shuffle the semi
  * join. This suite proves the two dispatch paths are VALUE-IDENTICAL on
  * every gated operator family, and that the oversized path completes
  * (the graceful fallback the cliff lacked).
  */
class BroadcastGateSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = GraftSession.local(4, "graft-bgate")
  private lazy val docs = Tables.load(spark, dir, "documents")

  /** Run `body` once per dispatch path (broadcast, then forced-shuffle via
    * a 0-byte ceiling — the "candidate set larger than any budget" stress)
    * and require identical sorted results. */
  private def bothPaths(name: String)(body: => DataFrame): Unit = {
    val broadcastRows = body.collect().map(_.toString).sorted
    val saved = Dedup.maxBroadcastIdBytes
    val shuffleRows =
      try { Dedup.maxBroadcastIdBytes = 0L; body.collect().map(_.toString).sorted }
      finally Dedup.maxBroadcastIdBytes = saved
    assert(broadcastRows.nonEmpty, s"$name: fixture produced no pairs — gate untested")
    assert(broadcastRows.sameElements(shuffleRows),
      s"$name: broadcast vs shuffle semi-join paths disagree " +
        s"(${broadcastRows.length} vs ${shuffleRows.length} rows)")
  }

  test("minhashLsh pairs identical on broadcast and shuffle verify paths") {
    bothPaths("minhashLsh") {
      Dedup.minhashLsh(docs, "doc_id", "text", 3, 64, 16, 0.8)
    }
  }

  test("ngramJaccardBlocked pairs identical on both paths") {
    bothPaths("ngramJaccardBlocked") {
      Dedup.ngramJaccardBlocked(docs, "doc_id", "text", "lang", 3, 0.5)
    }
  }

  test("charNgramPairs identical on both paths") {
    bothPaths("charNgramPairs") {
      Dedup.charNgramPairs(docs, "doc_id", "text", "lang", 5, 0.6)
    }
  }

  test("minhashLshAgainst (incremental) identical on both paths") {
    val index = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 0)
    val delta = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 1)
    bothPaths("minhashLshAgainst") {
      Dedup.minhashLshAgainst(index, delta, "doc_id", "text", 3, 64, 16, 0.7)
    }
  }

  test("minhashLshAgainstIndex (persisted index) identical on both paths") {
    // unique per run: saveAsTable refuses a leftover warehouse LOCATION
    // from a previous JVM even when the catalog entry is gone
    val tbl = s"bgate_idx_${System.nanoTime()}"
    Dedup.minhashIndexWrite(
      docs.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 0),
      "doc_id", "text", tbl, 3, 64, 16)
    val delta = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 1)
    bothPaths("minhashLshAgainstIndex") {
      Dedup.minhashLshAgainstIndex(delta, "doc_id", "text", tbl, 0.7)
    }
  }
}
