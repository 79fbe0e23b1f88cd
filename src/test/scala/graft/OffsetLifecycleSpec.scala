package graft

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.connector.read.streaming.ReadLimit
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftSession, Tables}
import graft.sources.Dsv2

/** Regression pins for two round-9 review findings: committed offsets
  * must survive a transport's transient name-listing hiccups, and a
  * pinScope whose body THROWS must still free every pin it created. */
class OffsetLifecycleSpec extends AnyFunSuite {

  test("latestOffset preserves committed offsets for names absent from the current target") {
    val names = new AtomicReference(Seq("a", "b"))
    val maxes = scala.collection.concurrent.TrieMap("a" -> 5L, "b" -> 7L)
    val stream = new Dsv2.SeqLogMicroBatchStream(Seq("a", "b"), None) {
      override def currentNames: Seq[String] = names.get
      override def currentMax(name: String): Long = maxes.getOrElse(name, -1L)
      override def factory: org.apache.spark.sql.connector.read.PartitionReaderFactory = null
    }
    val start = Dsv2.MapOffset(Map("a" -> 5L, "b" -> 7L))
    // 'b' vanishes from the broker listing (restart / hiccup): its
    // committed sequence must NOT be dropped — a later reappearance would
    // otherwise restart at -1 and redeliver everything
    names.set(Seq("a"))
    val end = stream.latestOffset(start, ReadLimit.allAvailable())
      .asInstanceOf[Dsv2.MapOffset]
    assert(end.m("b") == 7L, s"vanished name lost its offset: ${end.m}")
    // a transiently-EMPTY topic reporting max=-1 must not rewind either
    names.set(Seq("a", "b")); maxes("b") = -1L
    val end2 = stream.latestOffset(start, ReadLimit.allAvailable())
      .asInstanceOf[Dsv2.MapOffset]
    assert(end2.m("b") == 7L, s"empty-report rewound the offset: ${end2.m}")
    // the row-budgeted branch preserves the same way
    names.set(Seq("a")); maxes("a") = 9L
    val end3 = stream.latestOffset(start, ReadLimit.maxRows(100))
      .asInstanceOf[Dsv2.MapOffset]
    assert(end3.m == Map("a" -> 9L, "b" -> 7L), s"maxRows branch: ${end3.m}")
  }

  test("a pinScope whose body throws releases every pin it created, no GC needed") {
    val spark = GraftSession.local(4, "graft-pinscope-err")
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val sc = spark.sparkContext
    // settle leftovers from other suites sharing the session
    var waited = 0
    while (sc.getRDDStorageInfo.nonEmpty && waited < 50) {
      System.gc(); Thread.sleep(100); waited += 1
    }
    val before = sc.getRDDStorageInfo.length
    intercept[RuntimeException] {
      GraftSession.pinScope {
        val pinned = GraftSession.pin(docs.select("doc_id")) // materialized
        assert(pinned.count() > 0)
        throw new RuntimeException("simulated mid-composite failure")
      }
    }
    assert(sc.getRDDStorageInfo.length == before,
      "the failed body's pins must be freed by the scope itself (no frame escaped)")
  }
}
