package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.functions.{url_parts, url_valid, UrlKit}

/** The URL kernel's contract ([[UrlKit]]): pinned corner cases, the
  * url_valid ⟺ url_parts-non-null equivalence (the cheap boundary-pass
  * that keeps the parse kernel out of Filter conditions), and the
  * registrable-domain rules. */
class UrlKitSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)

  private def parse(u: String): Option[Map[String, String]] =
    Option(UrlKit.parse(UTF8String.fromString(u))).map { r =>
      Seq("scheme", "host", "registrable_domain", "path", "qs", "canonical_url")
        .zipWithIndex.map { case (n, i) => n -> r.getUTF8String(i).toString }.toMap
    }

  test("pinned shapes: case, ports, userinfo, trailing dot, fragment, empty path") {
    val p0 = parse("https://WWW.Example.CO.UK:443/Articles/1?id=1#top").get
    assert(p0("scheme") == "https" && p0("host") == "www.example.co.uk")
    assert(p0("registrable_domain") == "example.co.uk")
    assert(p0("canonical_url") == "https://www.example.co.uk/Articles/1?id=1",
      "default https port + fragment stripped, path case preserved")

    val p1 = parse("http://blog.site.com:8080/post/2").get
    assert(p1("canonical_url") == "http://blog.site.com:8080/post/2",
      "non-default port survives")

    val p2 = parse("https://cdn.site.io").get
    assert(p2("path") == "/" && p2("canonical_url") == "https://cdn.site.io/")

    val p3 = parse("ftp://user:pw@files.site.org:21/data.bin").get
    assert(p3("host") == "files.site.org" &&
      p3("canonical_url") == "ftp://files.site.org/data.bin",
      "userinfo dropped, default ftp port stripped")

    val p4 = parse("https://x.github.io./p%20a?b=2&a=1#f").get
    assert(p4("host") == "x.github.io" && p4("qs") == "b=2&a=1" &&
      p4("path") == "/p%20a", "trailing dot stripped, query verbatim")

    assert(parse("not a url").isEmpty)
    assert(parse("://missing-scheme.com").isEmpty)
    assert(parse("1http://bad-scheme-start.com") == None)
    assert(parse("https://").isEmpty, "empty host")
    assert(parse("https://./x").isEmpty, "host that is ONLY a trailing dot")
  }

  test("registrable domain: multi-part suffixes, IPv4, single label") {
    assert(UrlKit.registrable("a.b.example.co.uk") == "example.co.uk")
    assert(UrlKit.registrable("deep.sub.example.com") == "example.com")
    assert(UrlKit.registrable("example.com") == "example.com")
    assert(UrlKit.registrable("localhost") == "localhost")
    assert(UrlKit.registrable("10.2.3.4") == "10.2.3.4")
    assert(UrlKit.registrable("co.uk") == "co.uk",
      "a bare suffix has no registrable label; it maps to itself")
  }

  test("PSL rule forms: private suffixes, 3-label rules, wildcard, exception") {
    // private-section head: platform tenants are SEPARATE registrable
    // domains (q148's "block github.io" now needs host-suffix matching)
    assert(UrlKit.registrable("alice.github.io") == "alice.github.io")
    assert(UrlKit.registrable("www.alice.github.io") == "alice.github.io")
    assert(UrlKit.registrable("github.io") == "github.io",
      "the bare suffix maps to itself")
    assert(UrlKit.registrable("team.blogspot.com") == "team.blogspot.com")
    // a THREE-label exact rule
    assert(UrlKit.registrable("bucket.s3.amazonaws.com") == "bucket.s3.amazonaws.com")
    assert(UrlKit.registrable("x.bucket.s3.amazonaws.com") == "bucket.s3.amazonaws.com")
    // amazonaws.com itself is NOT in the head rules: default rule applies
    assert(UrlKit.registrable("ec2.amazonaws.com") == "amazonaws.com")
    // wildcard rule *.kawasaki.jp: every direct child is a public suffix
    assert(UrlKit.registrable("foo.kawasaki.jp") == "foo.kawasaki.jp",
      "a wildcard-matched zone is a public suffix; maps to itself")
    assert(UrlKit.registrable("site.foo.kawasaki.jp") == "site.foo.kawasaki.jp")
    assert(UrlKit.registrable("www.site.foo.kawasaki.jp") == "site.foo.kawasaki.jp")
    // exception rule !city.kawasaki.jp: the city site is an ordinary domain
    assert(UrlKit.registrable("city.kawasaki.jp") == "city.kawasaki.jp")
    assert(UrlKit.registrable("www.city.kawasaki.jp") == "city.kawasaki.jp")
  }

  test("parsePsl: data-file format round-trips into the matching engine") {
    val psl =
      """// comment line
        |com
        |co.uk
        |*.kawasaki.jp
        |!city.kawasaki.jp
        |github.io
        |
        |// private section
        |s3.amazonaws.com
        |""".stripMargin
    val rules = UrlKit.parsePsl(scala.io.Source.fromString(psl))
    assert(rules.exact == Set("com", "co.uk", "github.io", "s3.amazonaws.com"))
    assert(rules.wildcard == Set("kawasaki.jp"))
    assert(rules.exception == Set("city.kawasaki.jp"))
    val saved = UrlKit.activeRules
    try {
      UrlKit.setRules(rules)
      assert(UrlKit.registrable("www.example.co.uk") == "example.co.uk")
      assert(UrlKit.registrable("www.city.kawasaki.jp") == "city.kawasaki.jp")
      assert(UrlKit.registrable("a.b.kawasaki.jp") == "a.b.kawasaki.jp")
    } finally UrlKit.setRules(saved)
  }

  test("graft.psl.path property loads a PSL file on (re)initialization") {
    val f = java.io.File.createTempFile("graft-psl", ".dat")
    try {
      java.nio.file.Files.write(f.toPath,
        "web.example\n*.zz.example\n!ok.zz.example\n".getBytes("UTF-8"))
      val saved = UrlKit.activeRules
      try {
        System.setProperty("graft.psl.path", f.getAbsolutePath)
        UrlKit.reloadRules()
        assert(UrlKit.registrable("a.site.web.example") == "site.web.example")
        assert(UrlKit.registrable("x.y.zz.example") == "x.y.zz.example")
        assert(UrlKit.registrable("www.ok.zz.example") == "ok.zz.example")
      } finally {
        System.clearProperty("graft.psl.path")
        UrlKit.setRules(saved)
      }
    } finally { f.delete(): Unit }
  }

  test("PSL matcher fuzz: kernel equals an independent spec-literal implementation") {
    // slow reference implementation written DIRECTLY from the
    // publicsuffix.org algorithm text (enumerate candidate rules, pick
    // exception else longest), sharing no code with UrlKit.registrable
    def spec(host: String, r: UrlKit.SuffixRules): String = {
      if (host.forall(c => (c >= '0' && c <= '9') || c == '.')) return host
      val parts = host.split('.').toList
      if (parts.length <= 1) return host
      val suffixes = parts.indices.map(i => parts.drop(i))
      val excMatches = suffixes.filter(sfx => r.exception.contains(sfx.mkString(".")))
      val normalMatches =
        suffixes.filter(sfx => r.exact.contains(sfx.mkString("."))).map(_.length) ++
        suffixes.filter(sfx => sfx.length >= 2 &&
          r.wildcard.contains(sfx.tail.mkString("."))).map(_.length) :+ 1
      val ps =
        if (excMatches.nonEmpty) excMatches.map(_.length - 1).max
        else normalMatches.max
      if (ps >= parts.length) host else parts.takeRight(ps + 1).mkString(".")
    }
    val rules = UrlKit.activeRules
    val labels = Seq("a", "bb", "www", "city", "foo", "github", "io", "co", "uk",
      "kawasaki", "jp", "s3", "amazonaws", "com", "blogspot", "example", "x1")
    val rnd = new scala.util.Random(20260814)
    (0 until 5000).foreach { _ =>
      val n = 1 + rnd.nextInt(6)
      val host = (0 until n).map(_ => labels(rnd.nextInt(labels.length))).mkString(".")
      assert(UrlKit.registrable(host) == spec(host, rules),
        s"PSL divergence on host '$host': kernel=${UrlKit.registrable(host)} " +
          s"spec=${spec(host, rules)}")
    }
  }

  test("url_valid fuzz equivalence: valid ⟺ url_parts parses, on hostile inputs") {
    val rnd = new scala.util.Random(20260814)
    val frags = Seq("https://", "http://", "x://", "://", "1a://", "a.b", "host",
      ":", "@", ".", "/p", "?q=1", "#f", ":80", ":8x", "user:pw@", " ", "..",
      "例", "%20", "", "a")
    val urls = (0 until 2000).map { _ =>
      (0 until rnd.nextInt(6)).map(_ => frags(rnd.nextInt(frags.length))).mkString
    } ++ Seq("https://a.com", "https://a.com.", "https://.", "https://:80",
      "https://@", "https://u@h.io:99/p?q#f", "ftp://h:21", "wss://h:443/x",
      "  https://pad.ded.com/x  ", "https://h:0x1")
    urls.foreach { u =>
      val v = UrlKit.isValid(UTF8String.fromString(u))
      val p = UrlKit.parse(UTF8String.fromString(u))
      assert(v == (p != null),
        s"url_valid ($v) diverges from url_parts (${p != null}) on: '$u'")
    }
  }

  test("plan shape: the parse kernel never sits in a Filter condition") {
    val df = spark.range(0, 100)
      .select(concat(lit("https://h"), col("id").cast("string"), lit(".com/p")).as("url"))
    val out = graft.operators.Pipeline.capPerDomain(
      df.withColumn("doc_id", monotonically_increasing_id()),
      "doc_id", "url", lit(1), k = 2)
    val filters = out.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("Filter")).mkString("\n")
    assert(!filters.contains("url_parts"),
      s"url_parts leaked into a Filter:\n$filters")
    out.count() // executes clean
  }
}
