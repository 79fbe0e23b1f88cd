package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftSession, Tables}

/** The byte-level kernels ([[graft.functions.TextScan]]) are fast paths for
  * declarative pipelines the DuckDB oracle mirrors — these specs pin
  * value-identity so swapping them in can never move an oracle hash. */
class TextScanSpec extends AnyFunSuite {

  test("BPE trainer: hand-computed merge sequence, deterministic ties") {
    import graft.functions.BpeTrainer
    // vocab {aa:3, ab:2}: pair freqs (a,a)=3,(a,</w>)=3,(a,b)=2,(b,</w>)=2
    // → tie at 3 breaks lexicographically to (a,</w>), then (a,a</w>),
    // then the (a,b)/(b,</w>) tie breaks to (a,b)
    val merges = BpeTrainer.mergesFromVocab(Seq("aa" -> 3L, "ab" -> 2L), 3)
    assert(merges == Seq(("a", "</w>"), ("a", "a</w>"), ("a", "b")))
    // a merge budget past exhaustion stops early instead of looping
    val all = BpeTrainer.mergesFromVocab(Seq("ab" -> 1L), 10)
    assert(all.size <= 3)
  }

  test("property: BPE encoding is lossless at any merge depth (tokens reassemble the word)") {
    import graft.functions.{BpeEncode, BpeTrainer}
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    val word = Gen.choose(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val gen = for {
      ws <- Gen.nonEmptyListOf(word)
      n <- Gen.choose(0, 40)
    } yield (ws, n)
    val prop = Prop.forAll(gen) { case (ws, n) =>
      val freqs = ws.groupBy(identity).view.mapValues(_.size.toLong).toSeq.sorted
      val merges = BpeTrainer.mergesFromVocab(freqs, n).toArray
      ws.forall { w =>
        BpeEncode.encodeWord(w, merges).mkString == w + BpeEncode.Marker
      }
    }
    val res = check(Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, s"property falsified: ${res.status}")
  }

  test("BPE hostile inputs: empty/whitespace/unicode text, empty merge table") {
    import graft.functions.{bpe_encode, BpeEncode}
    import spark.implicits._
    val merges = Seq(("a", "b"), ("ab", "</w>"))
    val df = Seq((1L, ""), (2L, "   "), (3L, "ab"), (4L, "日本 語"), (5L, "a b"))
      .toDF("id", "t")
      .select(col("id"), bpe_encode(col("t"), merges).as("toks"))
    val got = df.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) == Seq.empty, "empty text -> no tokens")
    assert(got(2L) == Seq.empty, "whitespace-only -> no tokens")
    assert(got(3L) == Seq("ab</w>"), "both merges fire in rank order")
    assert(got(4L) == Seq("日", "本", BpeEncode.Marker, "語", BpeEncode.Marker),
      "unicode chars are symbols; no merges apply")
    assert(got(5L) == Seq("a", BpeEncode.Marker, "b", BpeEncode.Marker),
      "merge (a,b) never crosses a word boundary")
    // zero merges = char-level tokenization, still lossless
    val chars = Seq((1L, "xy")).toDF("id", "t")
      .select(bpe_encode(col("t"), Seq.empty).as("toks"))
      .head().getSeq[String](0)
    assert(chars == Seq("x", "y", BpeEncode.Marker))
  }

  test("bpe_encode expression == driver encodeWord over real documents") {
    import graft.functions.{bpe_encode, BpeEncode}
    val docs = Tables.load(spark, dir, "documents").limit(50)
    val merges = graft.operators.Pipeline.trainBpeMerges(docs, "text", nMerges = 30)
    val got = docs.select(col("doc_id"), bpe_encode(lower(col("text")), merges).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val local = docs.select(col("doc_id"), lower(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val m = merges.toArray
    local.foreach { case (id, text) =>
      val expect = text.split("\\s+").filter(_.nonEmpty)
        .flatMap(w => BpeEncode.encodeWord(w, m)).toSeq
      assert(got(id) == expect, s"doc $id tokenization diverges")
    }
  }
  lazy val spark = GraftSession.local(4)
  private val dir = "/root/testdata/sf0.001"

  import graft.functions.{hash_array, lang_guess, lang_guess_fast, shingle_hashes, shingles}

  private def hostile = {
    import spark.implicits._
    Seq(
      "", " ", "   ", "\t", "\tleading tab", "a", "a b", "a  b", "a\tb",
      "one two three four five", "trailing space ", " leading space",
      "\n\nnewlines\nsplit\ntokens\n", "mixed \t whitespace runs \f here \r ok",
      "der Und das", "el la los", "the and of", "unicode café straße ÉL",
      "dup dup dup dup", "x y x y x y"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("shingle_hashes == sorted distinct xxhash64 of declarative shingles") {
    for (df <- Seq(hostile, Tables.load(spark, dir, "documents")); n <- Seq(2, 3)) {
      val bad = df
        .select(
          shingle_hashes(col("text"), n).as("fast"),
          sort_array(array_distinct(hash_array(shingles(col("text"), n)))).as("slow"))
        .filter(not(col("fast") === col("slow")))
        .count()
      assert(bad == 0, s"n=$n: $bad rows diverge from the declarative pipeline")
    }
  }

  test("char_ngram_hashes == sorted xxhash64 of declarative char_shingles") {
    import graft.functions.{char_ngram_hashes, char_shingles, norm_text}
    import spark.implicits._
    val multibyte = Seq((0L, "caféé naïve 日本語テキスト db"), (1L, "ééééé"),
      (2L, "öö"), (3L, "日"), (4L, "")).toDF("doc_id", "text")
    for (df <- Seq(hostile, multibyte, Tables.load(spark, dir, "documents"));
         n <- Seq(2, 5)) {
      val bad = df
        .select(
          char_ngram_hashes(norm_text(coalesce(col("text"), lit(""))), n).as("fast"),
          sort_array(transform(char_shingles(coalesce(col("text"), lit("")), n),
            g => xxhash64(g))).as("slow"))
        .filter(not(col("fast") === col("slow")))
        .count()
      assert(bad == 0, s"n=$n: $bad rows diverge from the declarative pipeline")
    }
  }

  test("shingle_strings == declarative shingles (as sets; both distinct)") {
    import graft.functions.shingle_strings
    for (df <- Seq(hostile, Tables.load(spark, dir, "documents")); n <- Seq(2, 3)) {
      val bad = df
        .select(
          sort_array(shingle_strings(col("text"), n)).as("fast"),
          sort_array(shingles(col("text"), n)).as("slow"))
        .filter(not(col("fast") === col("slow")))
        .count()
      assert(bad == 0, s"n=$n: $bad rows diverge from the declarative pipeline")
    }
  }

  test("sorted_intersect_count == size(array_intersect) on shingle hashes") {
    import graft.functions.sorted_intersect_count
    val docs = Tables.load(spark, dir, "documents")
    val sh = docs.select(col("doc_id"), shingle_hashes(col("text"), 2).as("sh"))
    val bad = sh.as("a").crossJoin(sh.as("b"))
      .filter(col("a.doc_id") < 40 && col("b.doc_id") < 40)
      .select(
        sorted_intersect_count(col("a.sh"), col("b.sh")).as("fast"),
        size(array_intersect(col("a.sh"), col("b.sh"))).as("slow"))
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(bad == 0, s"$bad pairs diverge from array_intersect")
  }

  test("tokens_fast == declarative regex tokens") {
    import graft.functions.{tokens, tokens_fast}
    for (df <- Seq(hostile, Tables.load(spark, dir, "documents"))) {
      val bad = df
        .select(tokens_fast(col("text")).as("fast"), tokens(col("text")).as("slow"))
        .filter(not(col("fast") === col("slow")))
        .count()
      assert(bad == 0, s"$bad rows diverge from regex split")
    }
  }

  test("token_count_scan / distinct_token_count_scan == declarative sizes") {
    import graft.functions.{distinct_token_count, token_count, tokens}
    for (df <- Seq(hostile, Tables.load(spark, dir, "documents"))) {
      val bad = df
        .select(
          token_count(col("text")).as("nf"),
          size(tokens(col("text"))).as("ns"),
          distinct_token_count(col("text")).as("df"),
          size(array_distinct(tokens(col("text")))).as("ds"))
        .filter(col("nf") =!= col("ns") || col("df") =!= col("ds"))
        .count()
      assert(bad == 0, s"$bad rows diverge from declarative token counts")
    }
  }

  test("normalize_text == declarative lower/regex pipeline (hostile + real docs)") {
    import graft.functions.normalize_text
    for (df <- Seq(hostile, Tables.load(spark, dir, "documents"))) {
      // independent spec: the same pipeline as the DuckDB oracle, built
      // from Spark's own lower + regexp_replace chain
      val want = df.select(col("doc_id"),
        trim(regexp_replace(regexp_replace(regexp_replace(
          lower(col("text")), "[0-9]", "0"),
          """[.,;:!?'"()-]""", ""),
          "[ \t\n\f\r]+", " ")).as("n"))
      val got = df.select(col("doc_id"), normalize_text(col("text")).as("n"))
      val bad = got.as("g").join(want.as("w"), Seq("doc_id"))
        .filter(col("g.n") =!= col("w.n")).count()
      assert(bad == 0, s"$bad docs diverge from the declarative pipeline")
    }
    import spark.implicits._
    val pinned = Seq(
      ("Hello,  World!" , "hello world"),
      ("  A-B c1d2  " , "ab c0d0"),
      ("\"quoted\" (parens) -- dash" , "quoted parens dash"),
      ("" , ""))
      .toDF("text", "want")
      .select(graft.functions.normalize_text(col("text")).as("got"), col("want"))
      .collect()
    pinned.foreach(r => assert(r.getString(0) == r.getString(1),
      s"'${r.getString(0)}' != '${r.getString(1)}'"))
  }

  test("token_entropy == independent declarative formulation (hostile + real docs)") {
    import graft.functions.{token_entropy, tokens}
    def qlog16(x: Long): Long = {
      val b = 63 - java.lang.Long.numberOfLeadingZeros(x)
      b * 16L + ((x * 16L) >>> b) - 16L
    }
    for (df <- Seq(hostile, Tables.load(spark, dir, "documents"))) {
      // independent spec: counts from the declarative token split as
      // STRINGS (no hashing), entropy folded on the driver
      val want = df.select(col("doc_id"), tokens(col("text")).as("l"))
        .select(col("doc_id"), explode(col("l")).as("w"))
        .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id")).agg(collect_list(col("c")).as("cs"))
        .collect().map { r =>
          val cs = r.getSeq[Long](1)
          val n = cs.sum
          val qn = qlog16(n)
          (r.getLong(0), (n, cs.size.toLong, cs.map(c => c * (qn - qlog16(c))).sum))
        }.toMap
      val got = df.select(col("doc_id"), token_entropy(col("text")).as("e"))
        .select(col("doc_id"), col("e.n_tokens"), col("e.n_distinct"), col("e.ent_q"))
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      assert(got == want, s"diverging docs: ${
        (got.keySet ++ want.keySet).filter(k => got.get(k) != want.get(k)).take(5)}")
    }
    // planted signals: uniform repetition has zero entropy; a 2-symbol
    // uniform mix is EXACTLY one bit per token (16 sixteenths)
    val planted = hostile.select(col("doc_id"), token_entropy(col("text")).as("e"))
      .collect().map(r => r.getLong(0) -> r.getStruct(1)).toMap
    assert(planted(18L).getLong(2) == 0L, "dup dup dup dup must have ent 0")
    assert(planted(19L).getLong(2) == 96L,
      "x y x y x y must measure exactly 1 bit/token (6 tokens x 16)")
  }

  test("ngram_repetition == independent declarative formulation (hostile + real docs)") {
    import graft.functions.{ngram_repetition, tokens}
    for ((df, isHostile) <- Seq((hostile, true),
        (Tables.load(spark, dir, "documents"), false)); n <- Seq(2, 3)) {
      // independent spec: n-grams from the declarative token split, counted
      // as STRINGS via explode + groupBy (no hashing anywhere)
      val toks = df.select(col("doc_id"), tokens(col("text")).as("l"))
      val grams = toks.select(col("doc_id"),
        explode(when(size(col("l")) >= n,
            transform(sequence(lit(0), size(col("l")) - n),
              i => concat_ws(" ", slice(col("l"), i + 1, lit(n)))))
          .otherwise(array(concat_ws(" ", col("l"))))).as("ng"))
      val want = grams.groupBy(col("doc_id"), col("ng"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_ngrams"), max(col("c")).as("max_count"),
          coalesce(sum(when(col("c") > 1, col("c"))), lit(0L)).as("dup_count"))
      val got = df.select(col("doc_id"),
        ngram_repetition(col("text"), n).as("r"))
        .select(col("doc_id"), col("r.n_ngrams").as("n_ngrams"),
          col("r.max_count").as("max_count"), col("r.dup_count").as("dup_count"))
      val bad = got.as("g").join(want.as("w"), Seq("doc_id"))
        .filter(col("g.n_ngrams") =!= col("w.n_ngrams") ||
          col("g.max_count") =!= col("w.max_count") ||
          col("g.dup_count") =!= col("w.dup_count"))
        .count()
      assert(bad == 0, s"n=$n: $bad docs diverge from the declarative spec")
      // the signal itself: the planted repetition rows measure as repeated
      if (n == 2 && isHostile) {
        val dup = got.filter(col("doc_id") === 18).head() // "dup dup dup dup"
        assert(dup.getAs[Long]("n_ngrams") == 3 && dup.getAs[Long]("max_count") == 3
          && dup.getAs[Long]("dup_count") == 3, s"planted run: $dup")
      }
    }
  }

  test("scrubPii: portable regexes redact emails/phones, counts audit the originals") {
    import spark.implicits._
    val df = Seq(
      (0L, "reach me at a.b+c@mail-host.org today"),
      (1L, "call +1-555-0001 or +44-207-9460 now"),
      (2L, "both x@y.io and +1-555-0002 here"),
      (3L, "phone-looking local part +1-555-0003@ex.org only"),
      (4L, "nothing to scrub"),
      (5L, "")).toDF("doc_id", "text")
    val got = graft.operators.Pipeline.scrubPii(df, "doc_id", "text")
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got(0) == ((0L, 1L, 0L, "reach me at <EMAIL> today")))
    assert(got(1) == ((1L, 0L, 2L, "call <PHONE> or <PHONE> now")))
    assert(got(2) == ((2L, 1L, 1L, "both <EMAIL> and <PHONE> here")))
    // email wins where a phone-shaped span is an email local part: the
    // count audits the original (1 email, 1 phone-shaped span) but the
    // redaction consumes the whole address first
    assert(got(3) == ((3L, 1L, 1L, "phone-looking local part <EMAIL> only")))
    assert(got(4) == ((4L, 0L, 0L, "nothing to scrub")))
    assert(got(5) == ((5L, 0L, 0L, "")))
  }

  test("lm_surprisal == independent driver fold (hostile + real docs, OOV exercised)") {
    import graft.functions.{lm_surprisal, token_count, tokens_fast}
    for (df <- Seq(hostile, Tables.load(spark, dir, "documents"))) {
      // deliberately tiny vocab so the OOV path fires on real rows
      val vocab = df.select(explode(tokens_fast(col("text"))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w")).limit(8)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val total = df.select(sum(token_count(col("text")).cast("long")))
        .head().getLong(0)
      val nv = total + vocab.size
      val got = df
        .select(col("doc_id"), lm_surprisal(col("text"), vocab, nv).as("s"))
        .collect()
        .map(r => r.getLong(0) -> {
          val s = r.getStruct(1); (s.getLong(0), s.getLong(1), s.getLong(2))
        }).toMap
      // independent reference: regex tokens + shift-count floor-log2
      val vmap = vocab.toMap
      def flog2(x: Long): Long = {
        var k = x; var s = -1L
        while (k > 0) { k >>= 1; s += 1 }
        s
      }
      val ref = df.select(col("doc_id"), col("text")).collect().map { r =>
        // SQL semantics, not Java's: trim() strips SPACES only, and SQL
        // split keeps leading/trailing empty tokens (limit -1)
        val toks = r.getString(1)
          .replaceAll("^ +", "").replaceAll(" +$", "").split("[ \\t\\n\\f\\r]+", -1)
        val oov = toks.count(w => !vmap.contains(w)).toLong
        val sum = toks.map(w => flog2(nv / (vmap.getOrElse(w, 0L) + 1))).sum
        r.getLong(0) -> ((toks.length.toLong, oov, sum))
      }.toMap
      assert(got == ref, s"${got.toSet -- ref.toSet} diverge")
      assert(ref.values.exists(_._2 > 0), "fixture produced no OOV tokens")
    }
  }

  test("lang_guess_fast == declarative lang_guess CASE chain") {
    for (df <- Seq(hostile, Tables.load(spark, dir, "documents"))) {
      val bad = df
        .select(lang_guess_fast(col("text")).as("fast"), lang_guess(col("text")).as("slow"))
        .filter(col("fast") =!= col("slow"))
        .count()
      assert(bad == 0, s"$bad rows diverge from the declarative CASE")
    }
  }

  test("bpeMerges: shared-sentinel chains, greedy non-overlap, deterministic ties") {
    import spark.implicits._
    // 'b b b' is the shared-sentinel edge: '|b|b|b|' rewriting '|b|b|' →
    // '|bb|' must merge ONCE (greedy left-to-right, standard BPE), giving
    // '|bb|b|' — and the next round's top pair over the remaining corpus
    // must see symbols 'bb' and 'b' as distinct
    val docs = Seq(
      (0L, "bbb bbb bbb bbb"), // four 'bbb' words: pair b|b counted 2x per word (overlap), merged once per word
      (1L, "aa aa aa")         // three 'aa': pair a|a counted 1x per word
    ).toDF("doc_id", "text")
    val m = graft.operators.Pipeline.bpeMerges(docs, "text", k = 3)
      .orderBy(col("merge_rank"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    // counts: b|b = 4 words x 2 adjacent positions = 8; a|a = 3
    assert(m(0) == ((1, "b", "b", "bb", 8L)), s"merge 1: ${m(0)}")
    // after '|b|b|' -> '|bb|': every 'bbb' is '|bb|b|' — pair bb|b = 4;
    // a|a = 3 still; bb|b wins
    assert(m(1) == ((2, "bb", "b", "bbb", 4L)), s"merge 2: ${m(1)}")
    // then a|a = 3 is all that's left
    assert(m(2) == ((3, "a", "a", "aa", 3L)), s"merge 3: ${m(2)}")
    // deterministic tie-break: two pairs at equal count resolve on the
    // pair string ascending
    val tie = Seq((0L, "xy xy qr qr")).toDF("doc_id", "text")
    val t = graft.operators.Pipeline.bpeMerges(tie, "text", k = 1).head()
    assert(t.getString(1) == "q" && t.getString(2) == "r",
      s"tie must break to the ascending pair: $t")
  }

  test("bpe exact semantics: runs and alternations merge every non-overlapping instance per pass") {
    import spark.implicits._
    // round 12 (VERDICT r11 item 4): the divergence cases that PINNED the
    // old string-replace variant now pin Sennrich's exact symbol-level
    // greedy — 'bbbb' after merge (b,b) is [bb, bb] (2 tokens, the
    // variant gave 3); 'abab' after (a,b) is [ab, ab]
    val runs = Seq((0L, "en", "bbbb")).toDF("doc_id", "lang", "text")
    val f1 = graft.operators.Pipeline.bpeFertility(runs, "lang", "text", k = 1).head()
    assert(f1.getLong(1) == 1L && f1.getLong(2) == 2L,
      s"'bbbb' after merge (b,b) must encode as [bb, bb]: $f1")
    val alt = Seq((0L, "en", "abab")).toDF("doc_id", "lang", "text")
    val f2 = graft.operators.Pipeline.bpeFertility(alt, "lang", "text", k = 1).head()
    assert(f2.getLong(1) == 1L && f2.getLong(2) == 2L,
      s"'abab' after merge (a,b) must encode as [ab, ab]: $f2")
    // a second merge folds the two bb tokens into one word
    val f3 = graft.operators.Pipeline.bpeFertility(runs, "lang", "text", k = 2).head()
    assert(f3.getLong(2) == 1L, s"merge 2 must fold [bb, bb] to [bbbb]: $f3")
  }

  test("bpe distributed fallback: variant semantics pinned, agrees with exact on divergence-free corpora") {
    import spark.implicits._
    import graft.operators.Pipeline
    // force the fallback (ceiling 0): the string-replace VARIANT merges
    // every OTHER instance of a shared-sentinel run — the round-11
    // semantics, still pinned so the above-ceiling path can never drift
    val runs = Seq((0L, "en", "bbbb")).toDF("doc_id", "lang", "text")
    Pipeline.maxBpeVocabCollectBytes = 0L
    try {
      val f1 = Pipeline.bpeFertility(runs, "lang", "text", k = 1).head()
      assert(f1.getLong(2) == 3L,
        s"fallback 'bbbb' after (b,b) must encode as [bb, b, b]: $f1")
      // the residue is not lost: a later iteration absorbs it
      val f3 = Pipeline.bpeFertility(runs, "lang", "text", k = 2).head()
      assert(f3.getLong(2) < 3L, s"fallback residue must be absorbed later: $f3")
      // no k cap on the fallback: an above-ceiling corpus at tokenizer
      // scale k trains (k sequential jobs), it does not crash — the tiny
      // corpus exhausts early, exercising the stop path too
      val deep = Pipeline.bpeMerges(runs, "text", k = 70).collect()
      assert(deep.nonEmpty && deep.length < 70,
        s"fallback must run past 64 and stop at exhaustion: ${deep.length}")
    } finally Pipeline.maxBpeVocabCollectBytes = Pipeline.DefaultMaxBpeVocabCollectBytes
    // on a corpus with NO shared-sentinel runs/alternations the two paths
    // are the same algorithm: identical merge tables AND fertility
    val clean = Seq((0L, "en", "the cat sat on the mat"),
      (1L, "de", "der hund lief zum haus")).toDF("doc_id", "lang", "text")
    def table(df: org.apache.spark.sql.DataFrame) =
      Pipeline.bpeMerges(df, "text", k = 6).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4))).toSeq
    def fert(df: org.apache.spark.sql.DataFrame) =
      Pipeline.bpeFertility(df, "lang", "text", k = 6).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val (exactM, exactF) = (table(clean), fert(clean))
    Pipeline.maxBpeVocabCollectBytes = 0L
    try {
      assert(table(clean) == exactM, "paths must agree on merge tables")
      assert(fert(clean) == exactF, "paths must agree on fertility")
    } finally Pipeline.maxBpeVocabCollectBytes = Pipeline.DefaultMaxBpeVocabCollectBytes
  }

  test("bpe held-out apply: chain path equals the training fold on in-vocab words, " +
      "handles unseen words, and respects trained semantics") {
    import spark.implicits._
    import graft.operators.Pipeline
    // (1) exact-path agreement: fertility via the vocab-LOOKUP apply
    // (train == eval frame) must equal fertility via the merge-CHAIN
    // apply (bpeFertilityHeldOut with eval = train) word for word — the
    // chain replays the trainer's own rewrite sequence on in-vocab words
    val corpus = Seq((0L, "en", "the cat sat on the mat bbbb abab"),
      (1L, "de", "der hund lief zum haus abab"),
      (2L, "en", "cats sat and sat again")).toDF("doc_id", "lang", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(org.apache.spark.sql.functions.col("grp")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val lookup = rows(Pipeline.bpeFertility(corpus, "lang", "text", k = 8,
      forceExact = Some(true)))
    val chain = rows(Pipeline.bpeFertilityHeldOut(corpus, corpus, "lang", "text",
      k = 8, forceExact = Some(true)))
    assert(chain == lookup,
      s"chain apply must equal the training fold on in-vocab words: $chain vs $lookup")
    // (2) unseen words: train has no 'bbbb'; after merge (b,b) the EXACT
    // chain encodes the unseen 'bbbb' as [bb, bb] — 2 tokens
    val train = Seq((0L, "en", "bb bb bb cc")).toDF("doc_id", "lang", "text")
    val eval = Seq((1L, "en", "bbbb")).toDF("doc_id", "lang", "text")
    val ho = Pipeline.bpeFertilityHeldOut(train, eval, "lang", "text", k = 1,
      forceExact = Some(true)).head()
    assert(ho.getLong(1) == 1L && ho.getLong(2) == 2L,
      s"unseen 'bbbb' must take the exact merge-chain path to [bb, bb]: $ho")
    // (3) fallback-trained tables apply under fallback (variant)
    // semantics: the same unseen word encodes [bb, b, b] — 3 tokens
    val hoV = Pipeline.bpeFertilityHeldOut(train, eval, "lang", "text", k = 1,
      forceExact = Some(false)).head()
    assert(hoV.getLong(2) == 3L,
      s"variant-trained held-out apply must keep variant semantics: $hoV")
    // (4) the dispatch is surfaced: bpeMerges carries exact_path
    val ep = Pipeline.bpeMerges(train, "text", k = 1).select("exact_path").head().getBoolean(0)
    assert(ep, "under-ceiling training must surface exact_path = true")
    Pipeline.maxBpeVocabCollectBytes = 0L
    try {
      val epF = Pipeline.bpeMerges(train, "text", k = 1)
        .select("exact_path").head().getBoolean(0)
      assert(!epF, "above-ceiling training must surface exact_path = false")
    } finally Pipeline.maxBpeVocabCollectBytes = Pipeline.DefaultMaxBpeVocabCollectBytes
    // (5) bpeEncode exposes the per-doc token stream (lossless word-wise)
    val merges = Pipeline.bpeMerges(train, "text", k = 1, forceExact = Some(true))
    val enc = Pipeline.bpeEncode(eval, "text", merges)
      .select("bpe_tokens").head().getSeq[String](0)
    assert(enc == Seq("bb", "bb"), s"bpeEncode must chain-apply per doc: $enc")
    // (6) group-set parity: a group whose docs carry no tokenizable words
    // emits NO row on either path (the explode shape never sees it; the
    // per-doc kernel shape must filter its (0,0) aggregate)
    val wordless = Seq((1L, "en", "bbbb"), (2L, "zz", "!!! ???"))
      .toDF("doc_id", "lang", "text")
    val gExact = Pipeline.bpeFertilityHeldOut(train, wordless, "lang", "text",
      k = 1, forceExact = Some(true)).select("grp").collect().map(_.getString(0)).toSet
    val gVar = Pipeline.bpeFertilityHeldOut(train, wordless, "lang", "text",
      k = 1, forceExact = Some(false)).select("grp").collect().map(_.getString(0)).toSet
    assert(gExact == Set("en") && gVar == Set("en"),
      s"wordless groups must emit no row on either path: $gExact / $gVar")
  }

  test("bpe exact path holds k = 256 inside the bench budget") {
    // the round-12 contract: real tokenizer depth on the sf0.001 corpus,
    // exact semantics, wall-clock bounded (the incremental driver fold
    // costs the initial count pass plus affected-word rewrites, not
    // k vocabulary passes)
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val t0 = System.nanoTime()
    val m = graft.operators.Pipeline.bpeMerges(docs, "text", k = 256).collect()
    val sec = (System.nanoTime() - t0) / 1e9
    // stop-at-exhaustion semantics: the tiny sf0.001 vocabulary merges to
    // completion before 256 — ranks must be dense up to the stop point
    assert(m.length >= 32 && m.length <= 256, s"merge count: ${m.length}")
    assert(m.map(_.getInt(0)).toSeq == (1 to m.length), "ranks must be dense")
    assert(m.forall(_.getLong(4) >= 1L))
    if (m.length < 256) {
      // exhausted ⟺ every word is ONE token: fertility floor reached
      val f = graft.operators.Pipeline.bpeFertility(docs, "lang", "text", k = 256)
        .agg(org.apache.spark.sql.functions.sum("n_words"),
          org.apache.spark.sql.functions.sum("n_tokens")).head()
      assert(f.getLong(0) == f.getLong(1),
        s"exhausted training must leave every word a single token: $f")
    }
    assert(sec < 60.0, f"k=256 exact training took $sec%.1f s — over the bench budget")
  }
}
