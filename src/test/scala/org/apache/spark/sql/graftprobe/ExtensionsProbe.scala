package org.apache.spark.sql.graftprobe

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Test-only bridge into `private[sql]` members of
  * [[SparkSessionExtensions]], so the spec can verify what
  * `graft.GraftExtensions` injects without tearing down the suite-shared
  * SparkSession (extensions only apply at session construction). */
object ExtensionsProbe {
  def optimizerRules(
      ext: SparkSessionExtensions, spark: SparkSession): Seq[Rule[LogicalPlan]] =
    ext.buildOptimizerRules(spark)

  def registerInto(
      ext: SparkSessionExtensions, registry: FunctionRegistry): FunctionRegistry =
    ext.registerFunctions(registry)
}
