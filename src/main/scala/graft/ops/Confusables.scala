package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Unicode confusable (homoglyph) skeleton — the UTS #39 "skeleton"
  * transform restricted to its high-abuse core: visually-identical
  * characters from OTHER scripts mapped back to the Latin/ASCII characters
  * they imitate. The curation uses are spoof-hardened dedup (two docs
  * differing only in Cyrillic-а-for-a must fingerprint identically),
  * domain/URL spoof detection ("раypal.com"), and benchmark-contamination
  * hardening (a contaminated doc with homoglyph-laundered prompt text must
  * still n-gram-match the benchmark).
  *
  * The mapping is 1:1 codepoint → codepoint, so the whole transform is ONE
  * `translate` — Spark's native codegen'd StringTranslate, zero custom
  * code, map-only, and bit-identically replayable by any engine with a
  * unicode-aware `translate` (DuckDB's is — the oracle shares THIS object's
  * from/to strings programmatically).
  *
  * Coverage (documented subset of Unicode's confusables.txt, the classes
  * every spoof detector ships first):
  *  - Cyrillic ↔ Latin lookalikes, both cases (а е о р с у х і ѕ ј һ ԁ ԛ ԝ …);
  *  - Greek ↔ Latin lookalikes (ο ν and the identical-glyph capitals);
  *  - fullwidth ASCII (Ｕ+FF01…Ｕ+FF5E → U+0021…U+007E) + ideographic space.
  * NOT covered (by design): intra-Latin diacritic folding (that is
  * [[graft.expressions.Kernels.dedupNormalize]]'s NFD job), multi-char
  * expansions (ĳ → ij), and invisible-character stripping
  * (`unicode_clean`). Compose with those for the full cleanup. */
object Confusables {

  /** (impostor, skeleton) pairs — the single source of truth; the SQL
    * oracle and any second engine derive their mapping from here. */
  val pairs: Seq[(Char, Char)] = Seq(
    // Cyrillic lowercase → Latin
    'а' -> 'a', 'е' -> 'e', 'о' -> 'o', 'р' -> 'p', 'с' -> 'c',
    'у' -> 'y', 'х' -> 'x', 'і' -> 'i', 'ѕ' -> 's', 'ј' -> 'j',
    'һ' -> 'h', 'ԁ' -> 'd', 'ԛ' -> 'q', 'ԝ' -> 'w', 'ё' -> 'e',
    // Cyrillic uppercase → Latin
    'А' -> 'A', 'В' -> 'B', 'Е' -> 'E', 'К' -> 'K', 'М' -> 'M',
    'Н' -> 'H', 'О' -> 'O', 'Р' -> 'P', 'С' -> 'C', 'Т' -> 'T',
    'У' -> 'Y', 'Х' -> 'X', 'Ѕ' -> 'S', 'І' -> 'I', 'Ј' -> 'J',
    // Greek → Latin (identical-glyph set)
    'ο' -> 'o', 'ν' -> 'v',
    'Α' -> 'A', 'Β' -> 'B', 'Ε' -> 'E', 'Ζ' -> 'Z', 'Η' -> 'H',
    'Ι' -> 'I', 'Κ' -> 'K', 'Μ' -> 'M', 'Ν' -> 'N', 'Ο' -> 'O',
    'Ρ' -> 'P', 'Τ' -> 'T', 'Υ' -> 'Y', 'Χ' -> 'X') ++
    // fullwidth ASCII block + ideographic space
    (0x21 to 0x7e).map(a => ((a + 0xFEE0).toChar, a.toChar)) :+
    ('　' -> ' ')

  require(pairs.map(_._1).distinct.size == pairs.size,
    "confusable source characters must be unique")

  /** The impostor characters, in mapping order. */
  val fromChars: String = pairs.map(_._1).mkString
  /** The skeleton characters, positionally aligned with [[fromChars]]. */
  val toChars: String = pairs.map(_._2).mkString

  /** Skeleton of `c`: every covered impostor replaced by its Latin/ASCII
    * target. Null passes through. */
  def skeleton(c: Column): Column = translate(c, fromChars, toChars)

  /** True when `c` contains at least one covered impostor character —
    * the "this text is homoglyph-laundered" flag. Null → null. */
  def isSpoofed(c: Column): Column = skeleton(c) =!= c
}
