package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.functions.{html_to_text, HtmlKit}

/** The HTML-extraction contract ([[HtmlKit]]): pinned semantics cases and
  * a generative fuzz proving the kernel == the declarative Spark
  * regexp_replace chain on hostile fragments (the DuckDB side is gated by
  * the q151 oracle at all three SFs). */
class HtmlKitSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)

  private def k(s: String): String = HtmlKit.toText(UTF8String.fromString(s)).toString

  test("pinned semantics: blocks, tags, entities, whitespace normal form") {
    assert(k("<p>a</p><br>b") == "a b", "tags become spaces — words never fuse")
    assert(k("a<script>var x;</script>b") == "a b", "blocks never fuse words")
    assert(k("<ScRiPt a=b>drop</sCrIpT>keep") == "keep", "any-case script block")
    assert(k("<scriptify>k</scriptify>") == "k", "\\b guard: scriptify is a plain tag")
    assert(k("<script>no close <p>leak") == "no close leak",
      "unclosed block survives; its tags still strip — defined behavior")
    assert(k("<style>p{}</style>x<!-- c -->y") == "x y")
    assert(k("&amp;lt;") == "&lt;", "entities decode exactly once (amp LAST)")
    assert(k("a &amp; b &lt;c&gt; &quot;d&quot; &#39;e&#39; &apos;f&apos;") ==
      "a & b <c> \"d\" 'e' 'f'")
    assert(k("a&nbsp;&nbsp;b") == "a b", "nbsp joins the collapse class")
    assert(k("  a \t\n b  ") == "a b")
    assert(k("a\u000bb") == "a\u000bb",
      "vertical tab is NOT whitespace (RE2 \\s class)")
    assert(k("\u000ba ") == "\u000ba",
      "space-only trim: a leading VT survives (SQL trim semantics, not Java's)")
    assert(k("<ſcript>x</ſcript>") == "x",
      "long-s 'tag' is an ordinary tag (no Unicode case folding surprise)")
  }

  test("fuzz: kernel == declarative Spark regexp chain on hostile fragments") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814)
    val frags = Seq("<p>", "</p>", "<script>", "</script>", "<SCRIPT a='b'>",
      "</SCRIPT>", "<style>", "</style>", "<!--", "-->", "<br/>", "text",
      "&amp;", "&lt;", "&amp;lt;", "&nbsp;", "&#39;", "<", ">", "a<b", "x",
      " ", "\t", "\n", "café", "世界", "<div class=\"x\">", "</div>", "&quot;")
    val docs = ((0 until 400).map { _ =>
      (0 until rnd.nextInt(10)).map(_ => frags(rnd.nextInt(frags.length))).mkString
    } :+ "" :+ "<script>" :+ "-->" :+ "<!---->")
      .zipWithIndex.map { case (h, i) => (i.toLong, h) }.toDF("id", "html")
    // the same five steps, in Spark's regexp engine (Java) — the kernel
    // must match on EVERY input; cross-engine parity is the q151 oracle
    val want = trim(regexp_replace(
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          regexp_replace(col("html"),
            "(?s)<[sS][cC][rR][iI][pP][tT]\\b[^>]*>.*?</[sS][cC][rR][iI][pP][tT]>", " "),
          "(?s)<[sS][tT][yY][lL][eE]\\b[^>]*>.*?</[sS][tT][yY][lL][eE]>", " "),
        "(?s)<!--.*?-->", " "),
        "<[^>]*>", " "),
        "&nbsp;", " "), "&lt;", "<"), "&gt;", ">"), "&quot;", "\""),
        "&#39;", "'"), "&apos;", "'"), "&amp;", "&"),
      "[ \\t\\n\\f\\r]+", " "), " ")
    val bad = docs.select(col("id"), html_to_text(col("html")).as("g"), want.as("w"))
      .filter(col("g") =!= col("w"))
      .collect()
    assert(bad.isEmpty,
      s"kernel diverges on ${bad.length} inputs, first: ${bad.headOption.map(_.toSeq)}")
  }
}
