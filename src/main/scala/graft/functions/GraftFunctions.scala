package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** Registration of graft's native Catalyst expressions.
  *
  * Two paths, per the standard Spark extension model:
  *  - [[GraftExtensions]] for `spark.sql.extensions=graft.functions.GraftExtensions`
  *    (cluster-wide, survives new sessions);
  *  - [[GraftFunctions.register]] for imperative registration on an
  *    existing session (used by the ops library so any driver-provided
  *    session works).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((FunctionIdentifier(VecDotProduct.Name),
      VecDotProduct.info, VecDotProduct.builder))
}

object GraftFunctions {
  /** Idempotently register graft functions on a live session. A true
    * existence check (not blind create-or-replace) keeps repeated calls
    * from spamming "replaced a previously registered function" WARNs —
    * operators call this once per query construction. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(VecDotProduct.Name)))
      reg.createOrReplaceTempFunction(
        VecDotProduct.Name, VecDotProduct.builder, "built-in")
  }
}
