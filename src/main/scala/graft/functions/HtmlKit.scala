package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML → text extraction for crawl curation (the boilerplate-removal
  * step between "fetched page" and every text operator in this library).
  *
  * The contract is a FIXED, documented pipeline — each step is a regex or
  * literal replacement chosen from the subset where Java regex and
  * RE2/DuckDB agree exactly (no `(?i)` — RE2 folds case Unicode-wide,
  * Java ASCII-only, so tag names use explicit `[sS]`-style classes; no
  * lookaround, no backrefs), which makes the DuckDB oracle a literal
  * replay:
  *
  *  1. replace `<script ...>...</script>` and `<style ...>...</style>`
  *     blocks with ONE SPACE (any case, non-greedy, `\b` after the name
  *     so `<scriptify>` is NOT a script block); an unclosed block stays —
  *     both engines agree, and the tag-strip pass still removes its tag;
  *  2. replace HTML comments `<!-- ... -->` with one space;
  *  3. replace every remaining tag `<[^>]*>` with one space (so
  *     `a<br>b` does not fuse into `ab` — the same non-fusing rule as
  *     steps 1-2);
  *  4. decode the fixed entity set `&nbsp; &lt; &gt; &quot; &#39;
  *     &apos;` then — LAST, so `&amp;lt;` decodes to the literal text
  *     `&lt;` exactly once — `&amp;`;
  *  5. collapse `[ \t\n\f\r]+` runs (the RE2 \s class every graft kernel
  *     uses) to one space and strip leading/trailing SPACES (the
  *     SQL-`trim` class — never Java's `<= U+0020` trim).
  *
  * Deliberately NOT a DOM parser: at 100 TB the extraction must be
  * row-local, deterministic, and cross-engine replayable; pages that need
  * real DOM heuristics (readability scoring, link-density pruning) get
  * them DOWNSTREAM of this normal form via the quality-filter operators. */
object HtmlKit {

  private val Script =
    Pattern.compile("(?s)<[sS][cC][rR][iI][pP][tT]\\b[^>]*>.*?</[sS][cC][rR][iI][pP][tT]>")
  private val Style =
    Pattern.compile("(?s)<[sS][tT][yY][lL][eE]\\b[^>]*>.*?</[sS][tT][yY][lL][eE]>")
  private val Comment = Pattern.compile("(?s)<!--.*?-->")
  private val Tag = Pattern.compile("<[^>]*>")
  private val Ws = Pattern.compile("[ \\t\\n\\f\\r]+")

  def toText(html: UTF8String): UTF8String = {
    var t = html.toString
    t = Script.matcher(t).replaceAll(" ")
    t = Style.matcher(t).replaceAll(" ")
    t = Comment.matcher(t).replaceAll(" ")
    t = Tag.matcher(t).replaceAll(" ")
    t = t.replace("&nbsp;", " ").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'").replace("&apos;", "'")
      .replace("&amp;", "&")
    t = Ws.matcher(t).replaceAll(" ")
    var lo = 0
    var hi = t.length
    while (lo < hi && t.charAt(lo) == ' ') lo += 1
    while (hi > lo && t.charAt(hi - 1) == ' ') hi -= 1
    UTF8String.fromString(t.substring(lo, hi))
  }

  /** The same pipeline as DuckDB SQL over column expression `c` — the
    * oracle side, generated next to the kernel so they cannot drift. */
  def duckDbSql(c: String): String = {
    val noScript = s"regexp_replace($c, '(?s)<[sS][cC][rR][iI][pP][tT]\\b[^>]*>.*?</[sS][cC][rR][iI][pP][tT]>', ' ', 'g')"
    val noStyle = s"regexp_replace($noScript, '(?s)<[sS][tT][yY][lL][eE]\\b[^>]*>.*?</[sS][tT][yY][lL][eE]>', ' ', 'g')"
    val noComment = s"regexp_replace($noStyle, '(?s)<!--.*?-->', ' ', 'g')"
    val noTag = s"regexp_replace($noComment, '<[^>]*>', ' ', 'g')"
    val ent = s"replace(replace(replace(replace(replace(replace(replace($noTag," +
      s" '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '\"')," +
      s" '&#39;', ''''), '&apos;', ''''), '&amp;', '&')"
    s"trim(regexp_replace($ent, '[ \\t\\n\\f\\r]+', ' ', 'g'), ' ')"
  }
}

/** `html_to_text(html)`: the [[HtmlKit]] extraction pipeline — row-local,
  * null-safe, scan-stage work (no shuffle at any corpus size). */
case class HtmlToTextScan(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    HtmlKit.toText(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlKit.toText($c)")
  override def prettyName: String = "html_to_text"
  override protected def withNewChildInternal(newChild: Expression): HtmlToTextScan =
    copy(child = newChild)
}
