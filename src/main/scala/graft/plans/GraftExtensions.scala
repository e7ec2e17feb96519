package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

/** Session extensions: inject graft's optimizer rules.
  * Usage: `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => SimplifyValidationFilters)
  }
}
