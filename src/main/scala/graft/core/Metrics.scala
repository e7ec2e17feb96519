package graft.core

import scala.collection.mutable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Bridges `ValidationResult.observed()` counters to a callback — the
  * LogHandler/metrics side of the invalid-value handler policies
  * (reference `filters/handlers.py`) without any extra job: Spark's
  * `observe` computes the counters during the action that already runs,
  * and the listener fires per completed query. */
object Metrics {

  /** Register a listener invoking `f(metricName, row-as-map)` for every
    * completed action that carried observed metrics. Returns the listener
    * (keep it to unregister). */
  def onObserved(spark: SparkSession)(f: (String, Map[String, Any]) => Unit): QueryExecutionListener = {
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        qe.observedMetrics.foreach { case (name, row) =>
          val m = row.schema.fieldNames.zipWithIndex.map { case (n, i) => n -> row.get(i) }.toMap
          f(name, m)
        }
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    listener
  }

  /** Convenience: collect validation metrics into a buffer (tests, small
    * jobs). Remember to `spark.listenerManager.unregister` afterwards. */
  def collector(spark: SparkSession): (mutable.Buffer[(String, Map[String, Any])], QueryExecutionListener) = {
    val buf = mutable.Buffer.empty[(String, Map[String, Any])]
    val l = onObserved(spark) { case (n, m) => buf.synchronized { buf += (n -> m) } }
    (buf, l)
  }
}
