package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession

/** Generative fuzz over the row-local text kernels: 300 seeded random
  * strings (ASCII runs, unicode, pathological whitespace, long repeats)
  * must agree byte-for-byte with the declarative Spark formulations the
  * kernels fuse. A kernel divergence on ANY input is an oracle-mismatch
  * risk at corpus scale — the fuzz catches the inputs the curated
  * hostile list misses. */
class TextKernelFuzzSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)

  private def fuzzStrings: Seq[String] = {
    val rnd = new scala.util.Random(20260814)
    val alphabets = Seq(
      "ab ",                       // tiny alphabet, many boundary cases
      "abc.,!?0123 \t",            // punct + digits + mixed ws
      "word together \n\r\f", // RE2 \s members + a raw VT (NOT \s in RE2/DuckDB)
      "café straße ÉL 世界 ",  // multibyte UTF-8
      "x" )                        // degenerate: one repeated char
    (0 until 300).map { i =>
      val alpha = alphabets(i % alphabets.length)
      val len = rnd.nextInt(120)
      (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    } :+ "" :+ " " :+ "\t\t" :+ "a\u000bb c" :+ "\u000b" :+ ("y " * 500).trim
  }

  private lazy val df = {
    import spark.implicits._
    fuzzStrings.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  test("normalize_text fuzz == declarative lower/regex pipeline") {
    import graft.functions.normalize_text
    val want = df.select(col("doc_id"),
      trim(regexp_replace(regexp_replace(regexp_replace(
        lower(col("text")), "[0-9]", "0"),
        """[.,;:!?'"()-]""", ""),
        "[ \t\n\f\r]+", " ")).as("n"))
    val got = df.select(col("doc_id"), normalize_text(col("text")).as("n"))
    val bad = got.as("g").join(want.as("w"), Seq("doc_id"))
      .filter(col("g.n") =!= col("w.n"))
      .select(col("doc_id")).collect().map(_.getLong(0))
    assert(bad.isEmpty, s"normalize_text diverges on ids ${bad.take(5).toSeq}")
  }

  test("token_count / distinct_token_count fuzz == declarative splits") {
    import graft.functions.{distinct_token_count, token_count, tokens}
    val bad = df.select(col("doc_id"),
        token_count(col("text")).as("tc"),
        distinct_token_count(col("text")).as("dc"),
        size(tokens(col("text"))).as("wtc"),
        size(array_distinct(tokens(col("text")))).as("wdc"))
      .filter(col("tc") =!= col("wtc") || col("dc") =!= col("wdc"))
      .collect()
    assert(bad.isEmpty, s"token counts diverge: ${bad.take(3).toSeq}")
  }

  test("shingle_hashes fuzz == sorted distinct xxhash64 of declarative shingles") {
    import graft.functions.{shingle_hashes, shingles}
    for (n <- Seq(2, 3)) {
      val want = df.select(col("doc_id"),
        sort_array(array_distinct(transform(shingles(col("text"), n), xxhash64(_))))
          .as("h"))
      val got = df.select(col("doc_id"), shingle_hashes(col("text"), n).as("h"))
      val bad = got.as("g").join(want.as("w"), Seq("doc_id"))
        .filter(col("g.h") =!= col("w.h"))
        .select(col("doc_id")).collect().map(_.getLong(0))
      assert(bad.isEmpty, s"n=$n shingle_hashes diverges on ids ${bad.take(5).toSeq}")
    }
  }

  test("hashed_ngram_buckets fuzz == declarative md5-prefix over unigrams+bigrams") {
    import graft.functions.hashed_ngram_buckets
    // the declarative chain hashedNgramFeatures fused (multiset equality:
    // explode both sides, count per (doc, bucket))
    val toks = split(trim(col("text")), "[ \\t\\n\\f\\r]+")
    val base = df.select(col("doc_id"), toks.as("__toks"))
    val uni = base.select(col("doc_id"), explode(col("__toks")).as("f"))
    val bi = base.filter(size(col("__toks")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("__toks")) - 1),
          i => concat(element_at(col("__toks"), i), lit(" "),
            element_at(col("__toks"), i + 1)))).as("f"))
    val want = uni.unionAll(bi)
      .withColumn("bk", conv(substring(md5(col("f")), 1, 3), 16, 10).cast("int"))
      .groupBy(col("doc_id"), col("bk")).agg(count(lit(1)).as("c"))
    val got = df.select(col("doc_id"),
        explode(hashed_ngram_buckets(col("text"))).as("bk"))
      .groupBy(col("doc_id"), col("bk")).agg(count(lit(1)).as("c"))
    val bad = got.as("g").join(want.as("w"), Seq("doc_id", "bk"), "full")
      .filter(col("g.c").isNull || col("w.c").isNull || col("g.c") =!= col("w.c"))
      .select(col("doc_id")).collect().map(_.getLong(0))
    assert(bad.isEmpty, s"hashed_ngram_buckets diverges on ids ${bad.take(5).toSeq}")
  }

  test("token_entropy fuzz: invariants hold on every input") {
    import graft.functions.token_entropy
    val rows = df.select(col("doc_id"), token_entropy(col("text")).as("e"))
      .select(col("doc_id"), col("e.n_tokens"), col("e.n_distinct"), col("e.ent_q"))
      .collect()
    rows.foreach { r =>
      val (n, d, e) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(d >= (if (n > 0) 1L else 0L) && d <= n, s"distinct bound: $r")
      assert(e >= 0L, s"entropy must be non-negative: $r")
      if (d == 1L) assert(e == 0L, s"uniform text must have zero entropy: $r")
      // ent/n ≤ qlog16ish(log2 d) upper bound: entropy can't exceed log2(n)·16·n
      if (n > 0) assert(e <= 16L * 63L * n, s"entropy bound blown: $r")
    }
  }
}
