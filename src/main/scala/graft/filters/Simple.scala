package graft.filters

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType
import graft.core.{Errs, ScalarFilter, Validator}
import graft.expressions.native

/** Emptiness strategies. The reference's `len() == 0` test (SURVEY.md §2.1)
  * depends on the runtime value; under a static schema the caller picks the
  * right strategy (string length vs collection size). */
object Emptiness {
  val string: Column => Column = c => length(c) === 0
  val array: Column => Column = c => size(c) === 0
  val never: Column => Column = _ => lit(false)
}

/** Reject null AND empty. Reference: `filters/simple.py::Required`
  * (= `NotEmpty(allow_none=False)`). */
case class Required(isEmpty: Column => Column = Emptiness.string) extends ScalarFilter {
  val name = "Required"
  val code = "empty"
  override protected def defaultMessage = "This value is required."
  override protected def handlesNull = true
  override protected def invalid(v: Column) = v.isNull || isEmpty(v)
  // "no error" ⟹ input non-null — the one parquet-pushable fact a leading
  // Required contributes past the chain's optimizer barrier
  override def pushedPredicate(in: Column): Option[Column] = Some(in.isNotNull)
}

/** Reject empty; null passes (reference `filters/simple.py::NotEmpty`,
  * `allow_none=True` default). */
case class NotEmpty(isEmpty: Column => Column = Emptiness.string) extends ScalarFilter {
  val name = "NotEmpty"
  val code = "empty"
  override protected def defaultMessage = "This value must not be empty."
  override protected def invalid(v: Column) = isEmpty(v)
}

/** Value must be empty (len == 0); null passes.
  * Reference: `filters/simple.py::Empty`. */
case class Empty(isEmpty: Column => Column = Emptiness.string) extends ScalarFilter {
  val name = "Empty"
  val code = "not_empty"
  override protected def defaultMessage = "This value must be empty."
  override protected def invalid(v: Column) = !isEmpty(v)
}

/** Replace null/empty with a default (reference `filters/simple.py::Optional`). */
case class Optional(default: Column, isEmpty: Column => Column = Emptiness.string)
    extends ScalarFilter {
  val name = "Optional"
  val code = "unused"
  override protected def handlesNull = true
  override protected def clean(v: Column) =
    when(v.isNull || isEmpty(v), default).otherwise(v)
}
object Optional {
  def apply(default: Any): Optional = new Optional(lit(default))
}

/** Identity (reference `filters/simple.py::NoOp`). */
case class NoOp() extends ScalarFilter {
  val name = "NoOp"
  val code = "unused"
}

/** Membership check (reference `filters/simple.py::Choice`). The
  * case-insensitive path uses ICU full case folding — the same notion of
  * case-equality as [[CaseFold]] and `Macros.choiceFolded` ("ß" matches
  * choice "SS"), so the library has ONE case-insensitivity semantics. */
case class Choice(choices: Seq[Any], caseSensitive: Boolean = true) extends ScalarFilter {
  val name = "Choice"
  val code = "not_valid_choice"
  override protected def defaultMessage = "Valid options: " + choices.mkString(", ")
  override protected def invalid(v: Column) =
    if (caseSensitive) !v.isin(choices: _*)
    else !native.caseFold(v).isin(choices.map(c =>
      com.ibm.icu.lang.UCharacter.foldCase(String.valueOf(c),
        com.ibm.icu.lang.UCharacter.FOLD_CASE_DEFAULT)): _*)
}
object Choice {
  def of(choices: Any*): Choice = Choice(choices)
}

/** length >= n (reference `filters/simple.py::MinLength`). */
case class MinLength(n: scala.Int, len: Column => Column = c => length(c)) extends ScalarFilter {
  val name = "MinLength"
  val code = "too_short"
  override protected def defaultMessage = s"This value is too short (min $n)."
  override protected def invalid(v: Column) = len(v) < n
}

/** length <= n — no truncation (reference `filters/simple.py::MaxLength`). */
case class MaxLength(n: scala.Int, len: Column => Column = c => length(c)) extends ScalarFilter {
  val name = "MaxLength"
  val code = "too_long"
  override protected def defaultMessage = s"This value is too long (max $n)."
  override protected def invalid(v: Column) = len(v) > n
}

/** Exact length (reference `filters/simple.py::Length`) — composed
  * Min|Max so the error code distinguishes short vs long, like the reference. */
object Length {
  def apply(n: scala.Int): Validator = MinLength(n) | MaxLength(n)
}

/** Drop named fields from a struct value
  * (reference `filters/simple.py::Omit` over mappings). */
case class Omit(keys: Seq[String]) extends ScalarFilter {
  val name = "Omit"
  val code = "unused"
  override protected def clean(v: Column) = v.dropFields(keys: _*)
}
object Omit {
  def of(keys: String*): Omit = Omit(keys)
}

/** Omit for MAP-typed values (the reference's `Omit` accepts any mapping;
  * dynamic string-keyed dicts map to `MapType` — SURVEY.md §1). */
case class OmitMap(keys: Seq[String]) extends ScalarFilter {
  val name = "OmitMap"
  val code = "unused"
  override protected def clean(v: Column) =
    map_filter(v, (k, _) => !k.isin(keys.map(x => x: Any): _*))
}

/** Runtime type check without coercion (reference `filters/simple.py::Type`).
  * Under a static schema this is usually a compile-time fact; the dynamic
  * (string-typed) case checks castability. */
case class Type(dt: DataType) extends ScalarFilter {
  val name = "Type"
  val code = "wrong_type"
  override protected def defaultMessage = s"Expected ${dt.simpleString}."
  override protected def invalid(v: Column) = native.tryCast(v, dt).isNull
}

/** Array-ness check (reference `filters/simple.py::Array`): under Spark's
  * static schemas "value is a sequence" is a compile-time fact — applying
  * this filter to a non-array column fails at ANALYSIS time (via `size`),
  * which is the static-typing analog of the reference's runtime check.
  * At runtime it passes everything through. */
case class ArrayCheck() extends ScalarFilter {
  val name = "Array"
  val code = "wrong_type"
  // referencing size(v) forces the analyzer to require an array/map type;
  // the predicate itself never fires for a well-typed column
  override protected def invalid(v: Column) = size(v) < -1
}

/** Escape hatch: arbitrary Column function as a filter (reference
  * `filters/simple.py::Call`). The reference discourages it; here it stays a
  * Column transform (NOT a Scala closure/UDF) so the plan remains native.
  * For genuinely arbitrary JVM logic use [[Call.jvm]] — a real Scala UDF,
  * with the reference's caveat turned up to eleven: it blocks codegen,
  * pushdown and vectorization, so keep it off hot paths. */
case class Call(fn: Column => Column, label: String = "Call") extends ScalarFilter {
  val name = label
  val code = "exception"
  override protected def clean(v: Column) = fn(v)
}
object Call {
  import org.apache.spark.sql.functions.udf
  import scala.reflect.runtime.universe.TypeTag

  /** Wrap an arbitrary Scala function as a filter (the true `Call`
    * semantics). Nulls pass through (None-passthrough) before the UDF. */
  def jvm[A: TypeTag, B: TypeTag](f: A => B, label: String = "Call"): Call =
    Call(c => udf(f).apply(c), label)
}
