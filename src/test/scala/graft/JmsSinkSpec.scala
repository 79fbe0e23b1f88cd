package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.sinks.JmsSink
import graft.sources.hub.MemHub

/** Exactly-once JMS-style queue sink (the JmsXaTest analog — reference
  * `xa-test/.../JmsXaTest.java:52-96`): staged (prepared) messages survive
  * disconnect invisible to consumers, commit is broker-atomic and exactly
  * once per transaction, abort drops unseen. */
class JmsSinkSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)

  private def queueTexts(uri: String, queue: String): Seq[String] =
    MemHub.poll(uri, queue, -1L).map(m => new String(m.payload, "UTF-8"))

  private def df(xs: String*) = {
    import spark.implicits._
    xs.toDF("payload")
  }

  test("prepared messages survive disconnect, invisible until commit (XA prepare/commit)") {
    val uri = s"hub:/tmp/jms-spec-${System.nanoTime}"
    JmsSink.stageEpoch(df("a", "b", "c"), uri, "q", 7L)
    // staging connections are closed — the "disconnect". The prepared
    // messages are durably there (a later connection could commit them)…
    assert(MemHub.hashKeys(s"$uri/q.stage.7.").nonEmpty, "prepared txn lost on disconnect")
    // …but a queue consumer sees NOTHING before commit
    assert(queueTexts(uri, "q").isEmpty)
    assert(JmsSink.commitEpoch(uri, "q", "jq", 7L))
    assert(queueTexts(uri, "q").sorted == Seq("a", "b", "c"))
    assert(MemHub.hashKeys(s"$uri/q.stage.").isEmpty, "staged slots must drop on commit")
  }

  test("replayed commit and crash-before-commit restage land exactly once") {
    val uri = s"hub:/tmp/jms-spec-${System.nanoTime}"
    // crash-before-commit: staged (possibly repeatedly — restage replaces)
    JmsSink.stageEpoch(df("x", "y"), uri, "q", 0L)
    JmsSink.stageEpoch(df("x", "y"), uri, "q", 0L)
    assert(JmsSink.writeEpochExactlyOnce(df("x", "y"), uri, "q", "jq", 0L))
    assert(!JmsSink.writeEpochExactlyOnce(df("x", "y"), uri, "q", "jq", 0L),
      "replay of a committed epoch must be a no-op")
    assert(queueTexts(uri, "q").sorted == Seq("x", "y"), "exactly once, no dups")
    assert(JmsSink.writeEpochExactlyOnce(df("z"), uri, "q", "jq", 1L))
    assert(queueTexts(uri, "q").sorted == Seq("x", "y", "z"))
  }

  test("aborted epoch is dropped unseen (XA rollback)") {
    val uri = s"hub:/tmp/jms-spec-${System.nanoTime}"
    JmsSink.writeEpochExactlyOnce(df("keep"), uri, "q", "jq", 0L)
    JmsSink.stageEpoch(df("doomed1", "doomed2"), uri, "q", 1L)
    JmsSink.abortEpoch(uri, "q", 1L)
    assert(MemHub.hashKeys(s"$uri/q.stage.").isEmpty)
    assert(queueTexts(uri, "q") == Seq("keep"))
    // the aborted epoch can be retried with corrected content
    assert(JmsSink.writeEpochExactlyOnce(df("fixed"), uri, "q", "jq", 1L))
    assert(queueTexts(uri, "q") == Seq("keep", "fixed"))
  }

  test("queue order is deterministic: partition-major, row-order-minor") {
    val uri = s"hub:/tmp/jms-spec-${System.nanoTime}"
    import spark.implicits._
    val ordered = (0 until 40).map(i => (i, f"m$i%02d"))
      .toDF("i", "payload")
      .repartitionByRange(4, col("i"))
      .sortWithinPartitions("i")
      .select("payload")
    JmsSink.writeEpochExactlyOnce(ordered, uri, "q", "jq", 0L)
    val got = queueTexts(uri, "q")
    assert(got.length == 40 && got.distinct.length == 40)
    assert(got == got.sorted, s"range-partitioned input must arrive in order: $got")
  }
}
