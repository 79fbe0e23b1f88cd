package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.graftprobe.ExtensionsProbe
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession

/** The `spark.sql.extensions=graft.GraftExtensions` installation path:
  * everything `registerAll` provides must also arrive via injection, so
  * a cluster deployment that only sets the conf gets the whole engine.
  * (Extensions apply at session construction, so the spec probes the
  * injected state directly instead of rebuilding the shared session.) */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)

  test("GraftExtensions injects every graft SQL function, and they evaluate") {
    val ext = new SparkSessionExtensions
    new GraftExtensions()(ext)
    val registry = ExtensionsProbe.registerInto(
      ext, FunctionRegistry.builtin.clone())
    graft.functions.sqlFunctions.foreach { case (name, _) =>
      assert(registry.functionExists(FunctionIdentifier(name)),
        s"function $name missing from the injected registry")
    }
    // injected builders produce working expressions: a scalar kernel
    // evaluates without a session
    val tc = registry.lookupFunction(
      FunctionIdentifier("token_count_scan"), Seq(Literal("a b  c")))
    assert(tc.eval(null) === 3)
    val lang = registry.lookupFunction(
      FunctionIdentifier("lang_guess_scan"), Seq(Literal("the of and to in")))
    assert(lang.eval(null).toString === "en")
  }

  test("GraftExtensions injects the kernel null-check optimizer rule") {
    val ext = new SparkSessionExtensions
    new GraftExtensions()(ext)
    val rules = ExtensionsProbe.optimizerRules(ext, spark)
    assert(rules.contains(graft.plans.SimplifyKernelNullChecks),
      s"expected SimplifyKernelNullChecks among injected rules: $rules")
  }

  test("registerAll and GraftExtensions share one function table") {
    // the point of the shared sqlFunctions table: neither path can drift.
    // registerAll is exercised all over the suite; here just pin that the
    // table is the single source and non-trivial.
    assert(graft.functions.sqlFunctions.map(_._1).distinct.size ===
      graft.functions.sqlFunctions.size, "duplicate function names")
    assert(graft.functions.sqlFunctions.size >= 20)
  }
}
