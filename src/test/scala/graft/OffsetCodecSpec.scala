package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Dsv2.MapOffset

/** The serialized offset map IS the checkpoint contract — a codec change
  * would strand every running checkpoint. Round-trip it over the hostile
  * partition names a real deployment can produce. */
class OffsetCodecSpec extends AnyFunSuite {

  private def roundTrip(m: Map[String, Long]): Unit = {
    val parsed = MapOffset.parse(MapOffset(m).json())
    assert(parsed.m == m, s"round-trip mangled offsets for $m")
  }

  test("plain names") {
    roundTrip(Map("s1" -> 0L, "s2" -> -1L, "s3" -> Long.MaxValue))
  }

  test("names with quotes, backslashes, control chars, unicode") {
    roundTrip(Map(
      """stream"with"quotes""" -> 5L,
      """back\slash""" -> 7L,
      "tab\there" -> 9L,
      "newline\nname" -> 11L,
      "emoji-topic-é中" -> 13L))
  }

  test("empty map and empty name") {
    roundTrip(Map.empty[String, Long])
    roundTrip(Map("" -> 42L))
  }

  test("json is deterministic (sorted) — stable across restarts") {
    val a = MapOffset(Map("b" -> 2L, "a" -> 1L)).json()
    val b = MapOffset(Map("a" -> 1L, "b" -> 2L)).json()
    assert(a == b && a == """{"a":1,"b":2}""")
  }
}
