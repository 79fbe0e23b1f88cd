package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Pins the [[Catalog.concurrently]] contract (optimization guide §2.6):
  * leg results come back in argument order, the head leg runs on the
  * caller's thread (pin/pinScope thread-locals and call-site labels stay
  * with the dominant leg), tail legs run off-thread, and a failing leg
  * rethrows its ORIGINAL exception, not the pool's CompletionException
  * wrapper (the bench and Verify both match on the original type). */
class ConcurrentLegsSpec extends AnyFunSuite {
  private lazy val spark = graft.core.GraftSession.local(2)

  test("legs return in argument order with correct values") {
    val Seq(a, b, c) = Catalog.concurrently(
      () => spark.range(1).select(lit(1).as("v")),
      () => spark.range(1).select(lit(2).as("v")),
      () => spark.range(1).select(lit(3).as("v")))
    assert(a.head().getInt(0) === 1)
    assert(b.head().getInt(0) === 2)
    assert(c.head().getInt(0) === 3)
  }

  test("head leg runs on the caller thread, tail legs off-thread") {
    val caller = Thread.currentThread()
    @volatile var headThread: Thread = null
    @volatile var tailThread: Thread = null
    Catalog.concurrently(
      () => { headThread = Thread.currentThread(); spark.range(1).toDF() },
      () => { tailThread = Thread.currentThread(); spark.range(1).toDF() })
    assert(headThread eq caller)
    assert(tailThread ne caller)
  }

  test("a failing tail leg rethrows the original exception") {
    val boom = new IllegalStateException("leg failure")
    val got = intercept[IllegalStateException] {
      Catalog.concurrently(
        () => spark.range(1).toDF(),
        () => throw boom)
    }
    assert(got eq boom)
  }
}
