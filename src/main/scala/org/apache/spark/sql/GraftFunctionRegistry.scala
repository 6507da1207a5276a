package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to register custom Catalyst expressions as SQL functions
  * (sessionState is private[sql]). Lives in org.apache.spark.sql for
  * access only.
  */
object GraftFunctionRegistry {
  def registerTemp(spark: SparkSession, name: String, builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
