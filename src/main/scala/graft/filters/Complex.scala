package graft.filters

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.core.{Errs, Validator}

/** Per-field validation of a struct value with dotted error keys — the
  * reference's ETL workhorse (`filters/complex.py::FilterMapper`).
  *
  * Each field's chain short-circuits individually; errors from different
  * fields all accumulate, keyed `"parent.child"`. Missing/extra keys are a
  * compile-time fact under a static StructType (SURVEY.md §2.4 mapping);
  * fields not listed pass through untouched. A null struct passes through
  * (None-passthrough).
  *
  * Expression-size note: each field's chain composes into ONE expression
  * here (~3^steps growth per field) — keep per-field chains short (≤3
  * steps). For heavy chains over top-level DataFrame columns, use
  * `Validate.columns`, which applies steps behind linear projections.
  */
case class FilterMapper(fieldMap: Seq[(String, Validator)]) extends Validator {
  require(fieldMap.nonEmpty, "FilterMapper needs at least one field")
  val name = "FilterMapper"

  def step(value: Column, errors: Column, key: Column): (Column, Column) = {
    val noPrior = size(errors) === 0
    val results = fieldMap.map { case (field, fv) =>
      val subKey = concat(key, lit("." + field))
      val (cv, ce) = fv.step(value.getField(field), Errs.none, subKey)
      (field, cv, ce)
    }
    val rebuilt = results.foldLeft(value) { case (acc, (f, cv, _)) => acc.withField(f, cv) }
    val fieldErrs =
      if (results.size == 1) results.head._3
      else concat(results.map(_._3): _*)
    val newValue = when(noPrior && value.isNotNull, rebuilt)
    val newErrors = when(!noPrior, errors)
      .when(value.isNotNull, fieldErrs)
      .otherwise(Errs.none)
    (newValue, newErrors)
  }
}
object FilterMapper {
  def of(fields: (String, Validator)*): FilterMapper = FilterMapper(fields)
}

/** Apply one chain to every element of an array value; per-element errors
  * keyed `"col.0"`, `"col.1"`, … — reference
  * `filters/complex.py::FilterRepeater`. Uses the `transform` higher-order
  * function, so the whole thing stays one Catalyst expression (no explode /
  * shuffle; scales as a map-only op). */
case class FilterRepeater(element: Validator) extends Validator {
  val name = "FilterRepeater"

  def step(value: Column, errors: Column, key: Column): (Column, Column) = {
    val noPrior = size(errors) === 0
    val results = transform(value, (x, i) => {
      val subKey = concat(key, lit("."), i.cast("string"))
      val (cv, ce) = element.step(x, Errs.none, subKey)
      struct(cv.as("value"), ce.as("errors"))
    })
    val newValue =
      when(noPrior && value.isNotNull, transform(results, r => r.getField("value")))
    val elemErrs = flatten(transform(results, r => r.getField("errors")))
    val newErrors = when(!noPrior, errors)
      .when(value.isNotNull, elemErrs)
      .otherwise(Errs.none)
    (newValue, newErrors)
  }
}

/** Apply one chain to every value of a map column (reference
  * `FilterRepeater` over mappings), errors keyed by map key. Like
  * FilterRepeater, one transform computes `struct(value, errors)` per
  * entry so the element chain evaluates once, not once per output. */
case class FilterRepeaterMap(element: Validator) extends Validator {
  val name = "FilterRepeaterMap"

  def step(value: Column, errors: Column, key: Column): (Column, Column) = {
    val noPrior = size(errors) === 0
    val stepped = transform_values(value, (k, x) => {
      val (cv, ce) = element.step(x, Errs.none, concat(key, lit("."), k))
      struct(cv.as("value"), ce.as("errors"))
    })
    val newValue = when(noPrior && value.isNotNull,
      transform_values(stepped, (_, s) => s.getField("value")))
    val elemErrs = flatten(transform(map_values(stepped), s => s.getField("errors")))
    val newErrors = when(!noPrior, errors)
      .when(value.isNotNull, elemErrs)
      .otherwise(Errs.none)
    (newValue, newErrors)
  }
}

/** Route the value to a chain chosen by `getter(value)` — a CASE cascade.
  * No matching case and no default → `no_valid_case` error.
  * Reference: `filters/complex.py::FilterSwitch`. */
case class FilterSwitch(getter: Column => Column, cases: Seq[(Any, Validator)],
                        default: Option[Validator] = None) extends Validator {
  val name = "FilterSwitch"
  require(cases.nonEmpty, "FilterSwitch needs at least one case")

  def step(value: Column, errors: Column, key: Column): (Column, Column) = {
    val g = getter(value)
    val branches = cases.map { case (k, v) => (g === lit(k), v.step(value, errors, key)) }
    val valueWhen = branches.tail.foldLeft(when(branches.head._1, branches.head._2._1)) {
      case (acc, (cond, (v, _))) => acc.when(cond, v)
    }
    val errorsWhen = branches.tail.foldLeft(when(branches.head._1, branches.head._2._2)) {
      case (acc, (cond, (_, e))) => acc.when(cond, e)
    }
    default match {
      case Some(d) =>
        val (dv, de) = d.step(value, errors, key)
        (valueWhen.otherwise(dv), errorsWhen.otherwise(de))
      case None =>
        val noPrior = size(errors) === 0
        val noCaseErrs = when(!noPrior, errors)
          .when(value.isNotNull,
            array(Errs.one(key, "no_valid_case", lit("No case matched this value."))))
          .otherwise(Errs.none)
        (valueWhen, errorsWhen.otherwise(noCaseErrs))
    }
  }
}
