package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass byte-level text kernels.
  *
  * The declarative shingle pipeline (`split` regex → n `slice`s → n-1
  * `zip_with`+`concat` → `array_distinct` → `transform(xxhash64)`) evaluates
  * higher-order functions interpreted, allocating a UTF8String per token AND
  * per shingle per row. These kernels produce identical values — the same
  * token boundaries as `split(trim(text), "[ \\t\\n\\f\\r]+")` (space-only
  * trim; the explicit class is the RE2 \\s — vertical tab excluded — so
  * DuckDB regexp replays match byte-for-byte; split keeps the leading
  * empty token after a non-space whitespace prefix) and the same 64-bit
  * hashes as `xxhash64(shingle)`
  * (XXH64, seed 42, over the joined-with-' ' shingle bytes) — in one pass
  * over the document's bytes with two primitive-array buffers. At 100 TB the
  * shingle stage is the map side of every dedup operator; this keeps it
  * inside whole-stage codegen at memory bandwidth, not regex speed.
  */
object TextScan {

  private final val Seed = 42L

  // the RE2 \\s class [ \\t\\n\\f\\r] (DuckDB/RE2 exclude vertical tab
  // 0x0B, unlike Java regex) — every kernel shares it so oracle replays
  // via regexp functions are byte-identical on ANY input
  private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0c || b == 0x0d

  /** Token boundaries equivalent to `split(trim(s), "[ \\t\\n\\f\\r]+")`
    * (the RE2 whitespace class — see [[isWs]]) — note Spark's
    * `split` passes limit -1, so BOTH a leading and a trailing whitespace
    * run yield an empty token (unlike bare `String.split`); space-only
    * trim; empty input yields [""]. Returns flat (start, end) pairs into
    * `bytes`. */
  private def tokenize(bytes: Array[Byte], from: Int, until: Int): Array[Int] = {
    var lo = from
    var hi = until
    while (lo < hi && bytes(lo) == 0x20) lo += 1
    while (hi > lo && bytes(hi - 1) == 0x20) hi -= 1
    if (lo >= hi) return Array(lo, lo) // "" → one empty token
    var cap = 16
    var out = new Array[Int](cap)
    var m = 0
    def push(s: Int, e: Int): Unit = {
      if (2 * m == out.length) out = java.util.Arrays.copyOf(out, out.length * 2)
      out(2 * m) = s; out(2 * m + 1) = e; m += 1
    }
    if (isWs(bytes(lo))) push(lo, lo) // limit -1 split: leading run → ""
    var i = lo
    while (i < hi) {
      while (i < hi && isWs(bytes(i))) i += 1
      if (i < hi) {
        val s = i
        while (i < hi && !isWs(bytes(i))) i += 1
        push(s, i)
      }
    }
    if (isWs(bytes(hi - 1))) push(hi, hi) // limit -1 split: trailing run → ""
    java.util.Arrays.copyOf(out, 2 * m)
  }

  /** Sorted distinct XXH64(seed 42) hashes of the word n-gram shingles of
    * `s` — value-identical to
    * `sort_array(array_distinct(transform(shingles(s, n), xxhash64)))`
    * with `shingles` as defined in [[graft.functions]] (whole trimmed text
    * as the single shingle when there are fewer than n tokens). */
  def wordShingleHashes(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val tk = tokenize(bytes, 0, bytes.length)
    val m = tk.length / 2
    val win = if (m >= n) n else m
    val count = if (m >= n) m - n + 1 else 1
    // assemble each shingle's bytes (tokens joined by a single 0x20) into a
    // reusable buffer, hash in place
    var buf = new Array[Byte](64)
    val hs = new Array[Long](count)
    var i = 0
    while (i < count) {
      var len = 0
      var j = 0
      while (j < win) {
        val ts = tk(2 * (i + j)); val te = tk(2 * (i + j) + 1)
        val tl = te - ts
        val need = len + tl + 1
        if (need > buf.length)
          buf = java.util.Arrays.copyOf(buf, math.max(need, buf.length * 2))
        if (j > 0) { buf(len) = 0x20; len += 1 }
        System.arraycopy(bytes, ts, buf, len, tl)
        len += tl
        j += 1
      }
      hs(i) = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, Seed)
      i += 1
    }
    java.util.Arrays.sort(hs)
    // unique in place
    var w = 0
    i = 0
    while (i < count) {
      if (w == 0 || hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    new GenericArrayData(if (w == count) hs else java.util.Arrays.copyOf(hs, w))
  }

  /** Sorted distinct XXH64(seed 42) hashes of the CHARACTER n-grams of an
    * (already normalized — see [[graft.functions.norm_text]]) string —
    * value-identical to
    * `sort_array(transform(array_distinct(<substring grams>), xxhash64))`
    * modulo in-document hash collisions (~L²/2⁻⁶⁴ — the repo-wide hashing
    * stance, same as [[wordShingleHashes]]); the whole string's hash when
    * shorter than n characters (the `char_shingles` `otherwise` leg).
    * Character = codepoint (`substring` semantics), so grams step UTF-8
    * boundaries. One pass over the bytes, no HOF evaluation: the
    * declarative `transform(sequence(...), i => substring(s, i, n))` runs
    * INTERPRETED (ArrayTransform is codegen-fallback) and — with no
    * subexpression elimination in interpreted eval — re-evaluates every
    * expression under the lambda per gram; this kernel replaces that with
    * a single sliding hash pass (the q81 map side at 100 TB). */
  def charNgramHashes(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val nb = bytes.length
    val nc = s.numChars()
    if (nc < n)
      return new GenericArrayData(Array(
        XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, nb, Seed)))
    val offs = new Array[Int](nc + 1)
    var i = 0
    var ci = 0
    while (i < nb) {
      offs(ci) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      ci += 1
    }
    offs(nc) = nb
    val count = nc - n + 1
    val hs = new Array[Long](count)
    i = 0
    while (i < count) {
      val s0 = offs(i)
      hs(i) = XXH64.hashUnsafeBytes(bytes,
        Platform.BYTE_ARRAY_OFFSET + s0, offs(i + n) - s0, Seed)
      i += 1
    }
    java.util.Arrays.sort(hs)
    var w = 0
    i = 0
    while (i < count) {
      if (w == 0 || hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    new GenericArrayData(if (w == count) hs else java.util.Arrays.copyOf(hs, w))
  }

  /** Distinct word n-gram shingle STRINGS (first-occurrence order) —
    * value-identical to `shingles(text, n)` in [[graft.functions]], one
    * byte-level pass, no regex, no HOF evaluation. */
  def wordShingleStrings(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val tk = tokenize(bytes, 0, bytes.length)
    val m = tk.length / 2
    val win = if (m >= n) n else m
    val count = if (m >= n) m - n + 1 else 1
    val seen = new java.util.HashSet[Long](count * 2)
    val out = new java.util.ArrayList[UTF8String](count)
    var buf = new Array[Byte](64)
    var i = 0
    while (i < count) {
      var len = 0
      var j = 0
      while (j < win) {
        val ts = tk(2 * (i + j)); val te = tk(2 * (i + j) + 1)
        val tl = te - ts
        val need = len + tl + 1
        if (need > buf.length)
          buf = java.util.Arrays.copyOf(buf, math.max(need, buf.length * 2))
        if (j > 0) { buf(len) = 0x20; len += 1 }
        System.arraycopy(bytes, ts, buf, len, tl)
        len += tl
        j += 1
      }
      val h = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, Seed)
      if (seen.add(h)) out.add(UTF8String.fromBytes(java.util.Arrays.copyOf(buf, len)))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Per-document word n-gram repetition stats (the Gopher/MassiveText
    * repetition quality signals — Rae et al. 2021 §A1.1: "fraction of
    * characters in the most common n-gram", "fraction of characters in
    * duplicated n-grams", here in occurrence form): ONE byte-level pass,
    * n-grams hashed with multiplicity (same assembly as
    * [[wordShingleHashes]] minus the dedup), sorted, run-lengths scanned.
    * Returns (n_ngrams, max_count, dup_count) where dup_count sums the
    * occurrences of every n-gram appearing more than once. Fewer than n
    * tokens → the whole token sequence as the single n-gram (the shingle
    * kernels' convention). Collision odds within one doc ~L²/2^64 —
    * negligible (the repo-wide hashing stance). */
  def ngramRepetitionStats(s: UTF8String, n: Int): InternalRow = {
    val bytes = s.getBytes
    val tk = tokenize(bytes, 0, bytes.length)
    val m = tk.length / 2
    val win = if (m >= n) n else m
    val count = if (m >= n) m - n + 1 else 1
    var buf = new Array[Byte](64)
    val hs = new Array[Long](count)
    var i = 0
    while (i < count) {
      var len = 0
      var j = 0
      while (j < win) {
        val ts = tk(2 * (i + j)); val te = tk(2 * (i + j) + 1)
        val tl = te - ts
        val need = len + tl + 1
        if (need > buf.length)
          buf = java.util.Arrays.copyOf(buf, math.max(need, buf.length * 2))
        if (j > 0) { buf(len) = 0x20; len += 1 }
        System.arraycopy(bytes, ts, buf, len, tl)
        len += tl
        j += 1
      }
      hs(i) = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, Seed)
      i += 1
    }
    java.util.Arrays.sort(hs)
    var maxRun = 0L
    var dup = 0L
    i = 0
    while (i < count) {
      var k = i + 1
      while (k < count && hs(k) == hs(i)) k += 1
      val run = (k - i).toLong
      if (run > maxRun) maxRun = run
      if (run > 1) dup += run
      i = k
    }
    new GenericInternalRow(Array[Any](count.toLong, maxRun, dup))
  }

  /** Floor-log2 ×16 + 4-bit linearized mantissa of a positive integer —
    * the repo's 1/16-bit quantized log (same arithmetic as the q103/q115
    * scoring: DuckDB replays it as
    * `(length(bin(x))-1)*16 + ((x*16) >> (length(bin(x))-1)) - 16`). */
  private def qlog16(x: Long): Long = {
    val b = 63 - java.lang.Long.numberOfLeadingZeros(x)
    b * 16L + ((x * 16L) >>> b) - 16L
  }

  /** Per-doc token (Shannon-analog) entropy under the quantized log:
    * struct(n_tokens, n_distinct, ent_q) with
    * ent_q = Σ_w c_w · (qlog16(n) − qlog16(c_w)) — integer-exact lexical
    * diversity, one byte-level pass, row-local (scan-pushable, NO
    * shuffle: the 100 TB shape of a per-document quality signal).
    * Token identity via XXH64 of the byte slice (the
    * [[distinctTokenCount]] device; collision odds ~m²/2^64 per doc). */
  def tokenEntropyStats(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    val tk = tokenize(bytes, 0, bytes.length)
    val m = tk.length / 2
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      val ts = tk(2 * i); val te = tk(2 * i + 1)
      hs(i) = XXH64.hashUnsafeBytes(
        bytes, Platform.BYTE_ARRAY_OFFSET + ts, te - ts, Seed)
      i += 1
    }
    java.util.Arrays.sort(hs)
    val n = m.toLong
    val qn = qlog16(n)
    var distinct = 0L
    var ent = 0L
    i = 0
    while (i < m) {
      var k = i + 1
      while (k < m && hs(k) == hs(i)) k += 1
      val c = (k - i).toLong
      distinct += 1
      ent += c * (qn - qlog16(c))
      i = k
    }
    new GenericInternalRow(Array[Any](n, distinct, ent))
  }

  /** CCNet-style dedup normalization: lowercase → digits→'0' → strip the
    * fixed punctuation class `[.,;:!?'"()-]` → collapse whitespace runs
    * to one space → trim. Lowercasing is the UTF8String unicode path;
    * the remaining passes are ASCII-only byte transforms (safe on UTF-8:
    * continuation bytes have the high bit set). DuckDB replays the same
    * pipeline with lower() + three regexp_replace calls in this order —
    * byte-identical output, so normalized-text md5s hash-match. */
  def normalizeText(s: UTF8String): UTF8String = {
    val lower = s.toLowerCase.getBytes
    val out = new Array[Byte](lower.length)
    var n = 0
    var pendingSpace = false
    var i = 0
    while (i < lower.length) {
      val b = lower(i)
      val c = b.toInt & 0xFF
      // the RE2 \\s class (no vertical tab) — matches the DuckDB
      // regexp_replace replay byte-for-byte, see object-level isWs
      val isWs = c == ' ' || c == '\t' || c == '\n' || c == '\r' ||
        c == '\f'
      val isPunct = c == '.' || c == ',' || c == ';' || c == ':' ||
        c == '!' || c == '?' || c == '\'' || c == '"' || c == '(' ||
        c == ')' || c == '-'
      if (isWs) { if (n > 0) pendingSpace = true }
      else if (isPunct) { /* stripped */ }
      else {
        if (pendingSpace) { out(n) = ' '; n += 1; pendingSpace = false }
        out(n) = if (c >= '0' && c <= '9') '0'.toByte else b
        n += 1
      }
      i += 1
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, n))
  }

  /** Token strings — value-identical to `split(trim(s),
    * "[ \\t\\n\\f\\r]+")` (same
    * tokenize as the shingle kernels), no regex engine. */
  def tokenStrings(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val tk = tokenize(bytes, 0, bytes.length)
    val m = tk.length / 2
    val out = new Array[AnyRef](m)
    var i = 0
    while (i < m) {
      out(i) = UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(bytes, tk(2 * i), tk(2 * i + 1)))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Token count — value-identical to `size(tokenStrings(s))`, but no
    * array/string materialization: just the boundary pass. Cheap enough to
    * sit in a pushed-down Filter predicate. */
  def tokenCount(s: UTF8String): Int = {
    val bytes = s.getBytes
    tokenize(bytes, 0, bytes.length).length / 2
  }

  /** Distinct token count — value-identical to
    * `size(array_distinct(tokenStrings(s)))`: distinctness via XXH64 of the
    * token byte slice (the same dedup device [[wordShingleStrings]] uses;
    * collision odds ~m²/2^64 per document — negligible), no token strings
    * ever built. */
  def distinctTokenCount(s: UTF8String): Int = {
    val bytes = s.getBytes
    val tk = tokenize(bytes, 0, bytes.length)
    val m = tk.length / 2
    val seen = new java.util.HashSet[Long](m * 2)
    var c = 0
    var i = 0
    while (i < m) {
      val ts = tk(2 * i); val te = tk(2 * i + 1)
      if (seen.add(XXH64.hashUnsafeBytes(
          bytes, Platform.BYTE_ARRAY_OFFSET + ts, te - ts, Seed))) c += 1
      i += 1
    }
    c
  }

  /** |a ∩ b| for two SORTED long arrays — a single merge pass, no hash set,
    * no output array (vs `size(array_intersect(a, b))`). Inputs must be
    * sorted ascending and duplicate-free ([[wordShingleHashes]] output is). */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  // marker byte-triples/pairs for the language heuristic, priority order
  private val Markers: Array[Array[Array[Byte]]] = Array(
    Array("der", "und", "das"),
    Array("el", "la", "los"),
    Array("le", "et", "les"),
    Array("the", "and", "of")
  ).map(_.map(_.getBytes("UTF-8")))
  private val Langs = Array("de", "es", "fr", "en").map(UTF8String.fromString)
  private val Und = UTF8String.fromString("und")

  private def tokenIs(bytes: Array[Byte], s: Int, e: Int, w: Array[Byte]): Boolean = {
    if (e - s != w.length) return false
    var i = 0
    while (i < w.length) {
      if (bytes(s + i) != w(i)) return false
      i += 1
    }
    true
  }

  /** Language guess over an ALREADY-LOWERCASED text — the same CASE chain as
    * [[graft.functions.lang_guess_tokens]] (first marker set with any token
    * present, priority de > es > fr > en, else "und") without materializing
    * the token array. */
  def langGuessLower(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val tk = tokenize(bytes, 0, bytes.length)
    val m = tk.length / 2
    // best = highest-priority marker set seen so far; later tokens only need
    // to beat it, so the doc-wide CASE semantics ("any de marker anywhere
    // wins over any es marker anywhere") fall out of a single token pass
    var best = 4
    var t = 0
    while (t < m && best > 0) {
      val ts = tk(2 * t); val te = tk(2 * t + 1)
      var matched = -1
      var li = 0
      while (li < best && matched < 0) {
        val ws = Markers(li)
        var wi = 0
        while (wi < ws.length && matched < 0) {
          if (tokenIs(bytes, ts, te, ws(wi))) matched = li
          wi += 1
        }
        li += 1
      }
      if (matched >= 0) best = matched
      t += 1
    }
    if (best < 4) Langs(best) else Und
  }

  // one MD5 instance per thread: getInstance is a provider lookup per call,
  // far more expensive than the 16-byte digest itself
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val SpaceByte = Array[Byte](0x20)

  /** 12-bit md5-prefix feature buckets of the word unigrams + bigrams of
    * `s` — value-identical (same multiset) to
    * `conv(substring(md5(f), 1, 3), 16, 10)` evaluated over
    * f ∈ tokens ++ adjacent-pairs-joined-with-' ', with tokens =
    * `split(trim(s), "[ \\t\\n\\f\\r]+")` (the [[tokenize]] boundaries the
    * token kernels share). The first 3 hex chars of an md5 are exactly the
    * first 12 bits of its digest, so the bucket is read straight off the
    * digest bytes — no hex-string materialization, no conv parse, and the
    * whole unigram+bigram stream is produced in ONE pass over the
    * document's bytes instead of a regex split + explode + an INTERPRETED
    * `transform(sequence(...))` bigram builder per row. */
  def hashedNgramBuckets(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val tk = tokenize(bytes, 0, bytes.length)
    val m = tk.length / 2
    val md = md5Local.get()
    val out = new Array[Int](if (m >= 2) 2 * m - 1 else m)
    def bucketOf(d: Array[Byte]): Int =
      ((d(0) & 0xff) << 4) | ((d(1) & 0xff) >>> 4)
    var i = 0
    while (i < m) {
      md.reset()
      md.update(bytes, tk(2 * i), tk(2 * i + 1) - tk(2 * i))
      out(i) = bucketOf(md.digest())
      i += 1
    }
    i = 0
    while (i < m - 1) {
      md.reset()
      md.update(bytes, tk(2 * i), tk(2 * i + 1) - tk(2 * i))
      md.update(SpaceByte, 0, 1)
      md.update(bytes, tk(2 * i + 2), tk(2 * i + 3) - tk(2 * i + 2))
      out(m + i) = bucketOf(md.digest())
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `shingle_hashes(text, n)`: sorted distinct xxhash64 values of the word
  * n-gram shingles — the fused fast path for
  * `hash_array(shingles(text, n))` (identical values, one byte-level pass).
  * Sorted output doubles as the canonical global order for prefix-filtered
  * set-similarity joins ([[graft.operators.Dedup.ngramJaccardBlocked]]). */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes needs a string input, got ${child.dataType}")
  }
  override def nullSafeEval(input: Any): Any =
    TextScan.wordShingleHashes(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextScan.wordShingleHashes($c, $n)")
  override def prettyName: String = "shingle_hashes"
  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** `char_ngram_hashes(normText, n)`: fused fast path for
  * `sort_array(transform(char_shingles-sans-norm(normText, n), xxhash64))`
  * — identical sorted distinct gram hashes, one byte-level pass (see
  * [[TextScan.charNgramHashes]]). Takes the ALREADY-normalized string so
  * `norm_text`'s regex runs once per row inside whole-stage codegen. */
case class CharNgramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "char n-gram size must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"char_ngram_hashes needs a string input, got ${child.dataType}")
  }
  override def nullSafeEval(input: Any): Any =
    TextScan.charNgramHashes(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextScan.charNgramHashes($c, $n)")
  override def prettyName: String = "char_ngram_hashes"
  override protected def withNewChildInternal(newChild: Expression): CharNgramHashes =
    copy(child = newChild)
}

/** `shingle_strings(text, n)`: fused fast path for `shingles(text, n)` —
  * identical distinct shingle strings, one byte-level pass. */
case class ShingleStrings(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextScan.wordShingleStrings(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextScan.wordShingleStrings($c, $n)")
  override def prettyName: String = "shingle_strings"
  override protected def withNewChildInternal(newChild: Expression): ShingleStrings =
    copy(child = newChild)
}

/** `tokens_scan(text)`: byte-level fast path for
  * `split(trim(text), "[ \\t\\n\\f\\r]+")`
  * (identical token arrays, no regex). */
case class TokensScan(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextScan.tokenStrings(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextScan.tokenStrings($c)")
  override def prettyName: String = "tokens_scan"
  override protected def withNewChildInternal(newChild: Expression): TokensScan =
    copy(child = newChild)
}

/** `ngram_repetition_scan(text, n)`: per-doc word n-gram repetition stats
  * (Gopher/MassiveText repetition filters) — struct(n_ngrams, max_count,
  * dup_count), one byte-level pass, row-local (scan-pushable, NO shuffle:
  * the 100 TB formulation of a per-document quality signal). */
case class NgramRepetitionScan(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n-gram size must be >= 1")
  override def dataType: DataType = StructType(Seq(
    StructField("n_ngrams", LongType, nullable = false),
    StructField("max_count", LongType, nullable = false),
    StructField("dup_count", LongType, nullable = false)))
  override def nullSafeEval(input: Any): Any =
    TextScan.ngramRepetitionStats(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextScan.ngramRepetitionStats($c, $n)")
  override def prettyName: String = "ngram_repetition_scan"
  override protected def withNewChildInternal(newChild: Expression): NgramRepetitionScan =
    copy(child = newChild)
}

/** `normalize_text_scan(text)`: CCNet-style dedup normalization
  * (lowercase, digits→0, fixed punctuation stripped, whitespace
  * collapsed, trimmed) — one pass, row-local, DuckDB-replayable. */
case class NormalizeTextScan(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    TextScan.normalizeText(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextScan.normalizeText($c)")
  override def prettyName: String = "normalize_text_scan"
  override protected def withNewChildInternal(newChild: Expression): NormalizeTextScan =
    copy(child = newChild)
}

/** `token_entropy_scan(text)`: per-doc quantized-log token entropy —
  * struct(n_tokens, n_distinct, ent_q), one byte-level pass, row-local.
  * Integer-exact: DuckDB replays qlog16 with bin()/shift arithmetic. */
case class TokenEntropyScan(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("ent_q", LongType, nullable = false)))
  override def nullSafeEval(input: Any): Any =
    TextScan.tokenEntropyStats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextScan.tokenEntropyStats($c)")
  override def prettyName: String = "token_entropy_scan"
  override protected def withNewChildInternal(newChild: Expression): TokenEntropyScan =
    copy(child = newChild)
}

/** `token_count_scan(text)`: fused `size(split(trim(text), "[ \\t\\n\\f\\r]+"))` —
  * boundary pass only, no token array. Safe (cheap) inside pushed-down
  * Filter predicates, unlike the array kernels. */
case class TokenCountScan(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullSafeEval(input: Any): Any =
    TextScan.tokenCount(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextScan.tokenCount($c)")
  override def prettyName: String = "token_count_scan"
  override protected def withNewChildInternal(newChild: Expression): TokenCountScan =
    copy(child = newChild)
}

/** `distinct_token_count_scan(text)`: fused
  * `size(array_distinct(split(trim(text), "\\s+")))` — one boundary pass +
  * slice hashing, no token strings. */
case class DistinctTokenCountScan(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullSafeEval(input: Any): Any =
    TextScan.distinctTokenCount(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextScan.distinctTokenCount($c)")
  override def prettyName: String = "distinct_token_count_scan"
  override protected def withNewChildInternal(newChild: Expression): DistinctTokenCountScan =
    copy(child = newChild)
}

/** `sorted_intersect_count(a, b)`: merge-pass |a ∩ b| over sorted distinct
  * long arrays — the verification kernel for prefix-filtered set-similarity
  * joins. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextScan.sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.TextScan.sortedIntersectCount($a, $b)")
  override def prettyName: String = "sorted_intersect_count"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** `bloom_might_contain(bloomBytes, hash)`: membership probe against a
  * serialized [[org.apache.spark.util.sketch.BloomFilter]] built once on
  * the driver (`df.stat.bloomFilter`) and shipped as a binary literal. The
  * deserialized filter is installed into generated code as a reference
  * object, so the probe stays inside whole-stage codegen — one xxhash64 +
  * k bit tests per row, no join, no shuffle. No false negatives: a
  * `false` result is definitive, which is what makes bloom-prefiltered
  * anti-joins exact after verification. */
case class BloomMightContain(bloomBytes: Expression, child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def left: Expression = bloomBytes
  override def right: Expression = child
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  require(bloomBytes.foldable, "bloom filter bytes must be a literal")

  @transient private lazy val bloom: org.apache.spark.util.sketch.BloomFilter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bloomBytes.eval(null).asInstanceOf[Array[Byte]]))

  override protected def nullSafeEval(b: Any, v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", bloom,
      classOf[org.apache.spark.util.sketch.BloomFilter].getName)
    defineCodeGen(ctx, ev, (_, v) => s"$ref.mightContainLong($v)")
  }
  override def prettyName: String = "bloom_might_contain"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(bloomBytes = newLeft, child = newRight)
}

/** `hashed_ngram_buckets(text)`: 12-bit md5-prefix buckets of the word
  * unigram+bigram feature stream — the fused fast path for
  * `conv(substring(md5(f), 1, 3), 16, 10)` over exploded
  * unigrams ++ adjacent-bigrams (identical bucket multiset, one byte-level
  * pass, digest bytes read directly — no hex string, no conv). */
case class HashedNgramBuckets(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hashed_ngram_buckets needs a string input, got ${child.dataType}")
  }
  override def nullSafeEval(input: Any): Any =
    TextScan.hashedNgramBuckets(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextScan.hashedNgramBuckets($c)")
  override def prettyName: String = "hashed_ngram_buckets"
  override protected def withNewChildInternal(newChild: Expression): HashedNgramBuckets =
    copy(child = newChild)
}

/** `lang_guess_scan(loweredText)`: byte-scan language heuristic, identical
  * to the declarative marker-overlap CASE over `tokens(loweredText)`. */
case class LangGuessScan(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    TextScan.langGuessLower(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextScan.langGuessLower($c)")
  override def prettyName: String = "lang_guess_scan"
  override protected def withNewChildInternal(newChild: Expression): LangGuessScan =
    copy(child = newChild)
}
