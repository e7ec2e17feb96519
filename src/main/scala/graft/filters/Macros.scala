package graft.filters

import graft.core.Validator

/** Named reusable chains — the reference's `filter_macro`
  * (`filters/macros.py::filter_macro`, SURVEY.md §2.5). In Scala a macro is
  * just a `def`/`val` returning a `Validator`; these are the canonical ones
  * from the reference docs plus pipeline-flavored combinations. */
object Macros {

  /** The canonical text-cleaning chain (`Required | Unicode | Strip`) —
    * the reference docs' ordering. NOTE: Required runs on the RAW value,
    * so whitespace-only input passes and cleans to "" (the reference
    * behaves identically); use [[cleanTextStrict]] to also reject values
    * that are empty AFTER normalization. */
  def cleanText: Validator = Required() | Unicode() | Strip()

  /** cleanText + post-normalization emptiness check: "   " (or
    * control-char soup) rejects with `empty` instead of cleaning to "". */
  def cleanTextStrict: Validator = Required() | Unicode() | Strip() | NotEmpty()

  /** Optional text: default empty, then normalize. Like the reference,
    * the emptiness test is on the raw value — whitespace-only input is
    * NOT replaced by the default (it normalizes to ""). */
  def optionalText(default: String = ""): Validator =
    Optional(default) | Unicode() | Strip()

  /** Whole-number in range. */
  def intInRange(min: Long, max: Long): Validator =
    Required(Emptiness.never) | Int() | Min(min) | Max(max)

  /** Normalized categorical code: fold case then check membership. The
    * choices are folded with the same ICU fold as the value — otherwise an
    * uppercase choice could never match its folded input. */
  def choiceFolded(choices: String*): Validator =
    Required() | CaseFold() | Choice(choices.map(c =>
      com.ibm.icu.lang.UCharacter.foldCase(c, com.ibm.icu.lang.UCharacter.FOLD_CASE_DEFAULT)))

  /** Bounded UTF-8 payload: normalize then cap bytes (reject mode). */
  def boundedText(maxBytes: scala.Int): Validator =
    Required() | Unicode() | Strip() | MaxBytes(maxBytes, truncate = false)
}
