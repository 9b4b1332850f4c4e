package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** Idempotent temp-function registration — the shared path behind every
  * `X.register(spark)` in this package (and BloomJoin's wrapping of
  * Spark's sketch expressions). Skips when already present:
  * re-registering per query is harmless but logs a "replaced a
  * previously registered function" warning each time. The
  * SparkSessionExtensions injection route ([[graft.GraftExtensions]])
  * stays the cluster-deployment path; this is for sessions that
  * already exist (the driver harness). */
object Registration {
  def ensure(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression,
      source: String = "scala_udf"): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(name)))
      reg.createOrReplaceTempFunction(name, builder, source)
  }
}
