package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkStrategy

/** Shared session-registration for the custom physical strategies —
  * one definition of the idempotent read-modify-write on
  * `spark.experimental.extraStrategies`, synchronized per session so
  * two concurrent first-time joins can't lose each other's strategy
  * in the read-modify-write race.
  */
private[plans] object Strategies {
  def register(spark: SparkSession, strategy: SparkStrategy): Unit =
    spark.synchronized {
      if (!spark.experimental.extraStrategies.contains(strategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ strategy
    }
}
