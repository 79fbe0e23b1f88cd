package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftSession, Tables}

/** Bench rep hygiene as a CONTRACT (VERDICT r11 item 6).
  *
  * Round 11's interference channels caught the q123 leak class red-handed:
  * +90.5 MB of blocks per rep, zero removals, zero GC, late-rep CPU scaling
  * with wall. The round-12 block census named them — BROADCAST blocks (AQE
  * broadcast-join relations are freed by the ContextCleaner only after a
  * driver GC, and a mostly-empty 12 GiB bench heap never GCs), and
  * `Bench.repBlock` now drops each rep's created-broadcast delta at the rep
  * boundary. This suite turns that lifecycle from a flag-and-chase into an
  * immediate failure: `assertDrain = true` makes the rep block throw if any
  * broadcast it created survives the cleanup or if the rdd block count grew
  * (an escaped pin). ScaleStressSpec keeps the live-pressure variants; this
  * gate runs the exact Bench code path.
  */
class BenchDrainSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = GraftSession.local(4, "graft-bench-drain")
  private val removed = new java.util.concurrent.atomic.AtomicLong(0)

  test("round-11 flag queries drain to zero under the rep-block contract") {
    // the three queries the round-11 verdict flagged (q123's +90 MB/rep
    // broadcast ramp; q81's and q157's late-rep CPU spikes) — each runs a
    // full rep block with the drain assertion armed
    Seq("q123_containment_pairs", "q81_char_ngram_pairs", "q157_ivf_rebuild")
      .foreach { n =>
        val reps = Bench.repBlock(spark, SparkEntry.queries(n), dir,
          reps = 3, removed, assertDrain = true, name = n)
        assert(reps.size >= 3)
        // the census channel that exposed the leak now pins its absence:
        // resident broadcast bytes NEVER GROW across reps. (Not asserted
        // zero — in a shared test JVM, prior suites' dead-but-un-GC'd
        // broadcasts are legitimately resident at block start; the
        // contract is that THIS block adds none. In Bench's own JVM the
        // channel reads flat zero — bench_detail.json `bcast_mb`.)
        val left = reps.map(_.bcastBytesLeft)
        assert(left.last <= left.head,
          s"$n grew resident broadcast bytes across reps: " +
            left.mkString("[", ",", "]"))
      }
  }

  test("an escaped pin trips the drain contract") {
    // a frame pinned inside the operator but NOT reachable from the
    // returned result: the per-rep release walks the result's plan and
    // misses it — exactly the leak shape the contract exists to catch
    var escaped: DataFrame = null
    val leakyFn = (s: SparkSession, d: String) => {
      val df = Tables.load(s, d, "documents").select("doc_id")
      escaped = GraftSession.pin(df)
      escaped.count(): Unit
      df.limit(1)
    }
    val e = intercept[IllegalStateException] {
      Bench.repBlock(spark, leakyFn, dir, reps = 2, removed,
        assertDrain = true, name = "leaky")
    }
    assert(e.getMessage.contains("rdd block count grew"),
      s"unexpected failure mode: ${e.getMessage}")
    GraftSession.release(escaped, blocking = true)
  }
}
