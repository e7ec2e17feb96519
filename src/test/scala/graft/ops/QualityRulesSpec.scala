package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Gopher §A1.1 / C4 §2.2 quality-rule vectors: every rule branch asserted
  * on hand-built documents (the oracle checks corpus-scale parity;
  * these pin the per-rule semantics). */
class QualityRulesSpec extends SparkSuite {
  import spark.implicits._

  private def sig(text: String, c: org.apache.spark.sql.Column): Any =
    Seq(text).toDF("t").select(c.as("v")).head().get(0)

  test("wordCount / meanWordLength ignore runs of whitespace") {
    assert(sig("one  two\t three\n", QualityRules.wordCount(col("t"))) == 3L)
    // (3+3+5)/3 = 3.666667 after r6 rounding
    assert(sig("one two three", QualityRules.meanWordLength(col("t"))) == 3.666667)
    assert(sig("", QualityRules.meanWordLength(col("t"))) == 0.0)
  }

  test("symbolWordRatio counts # and ellipsis per word") {
    assert(sig("a # b ... c", QualityRules.symbolWordRatio(col("t"))) == 0.4)
    assert(sig("clean words here", QualityRules.symbolWordRatio(col("t"))) == 0.0)
  }

  test("bullet and ellipsis line fractions skip blank lines") {
    val t = "- first\n\n* second\nplain\nends...\n"
    assert(sig(t, QualityRules.bulletLineFraction(col("t"))) == 0.5)
    assert(sig(t, QualityRules.ellipsisLineFraction(col("t"))) == 0.25)
    assert(sig("", QualityRules.bulletLineFraction(col("t"))) == 0.0)
  }

  test("alphaWordFraction and required-stopword matches") {
    assert(sig("abc 123 x9 $$", QualityRules.alphaWordFraction(col("t"))) == 0.5)
    // distinct members only: 'the' twice still counts once
    assert(sig("The the and of banana", QualityRules.gopherStopwordMatches(col("t"))) == 3L)
  }

  test("gopherKeep applies every published threshold") {
    val pass = (("the and words flow onward " * 12) + "of that be with it").trim
    assert(sig(pass, QualityRules.gopherKeep(col("t"))) == true)
    // too short (< 50 words) fails even with stopwords present
    assert(sig("the and of that be with", QualityRules.gopherKeep(col("t"))) == false)
    // symbol-heavy doc fails the #-ratio rule
    val hashy = pass + " " + ("# " * 30).trim
    assert(sig(hashy, QualityRules.gopherKeep(col("t"))) == false)
  }

  test("c4CleanLines keeps terminal-punctuated >=5-word non-js lines") {
    val t = Seq(
      "This line has five words.",          // kept
      "Too short.",                          // < 5 words
      "no terminal punctuation in this one", // no [.!?"]
      "Enable javascript to view this page." // js boilerplate
    ).mkString("\n")
    assert(sig(t, QualityRules.c4CleanLines(col("t"))) == "This line has five words.")
  }

  test("c4Keep needs 3 sentences, no lorem ipsum, no brace") {
    val good = "One full sentence here now. Two full sentences here now! Three full sentences here now?"
    def keep(t: String) =
      sig(t, QualityRules.c4Keep(col("t"), QualityRules.c4CleanLines(col("t"))))
    assert(keep(good) == true)
    assert(keep(good + "\nlorem IPSUM filler") == false)
    assert(keep(good + " brace {") == false)
    assert(keep("Only one sentence survives the line filter today.") == false)
  }

  test("topNgramCharFraction: most frequent bigram, occurrence-weighted") {
    // "a b" occurs 3x in "a b a b a b c" (13 chars): 3*3/13 = 0.692308
    assert(sig("a b a b a b c", QualityRules.topNgramCharFraction(col("t"), 2)) == 0.692308)
    assert(sig("one", QualityRules.topNgramCharFraction(col("t"), 2)) == 0.0)
  }

  test("containsAnyPhrase: case-insensitive substring, any-of semantics") {
    val phrases = Seq("Lorem Ipsum", "click here")
    assert(sig("best LOREM ipsum generator", QualityRules.containsAnyPhrase(col("t"), phrases)) == true)
    assert(sig("please Click  here", QualityRules.containsAnyPhrase(col("t"), phrases)) == false)
    assert(sig("clean prose only", QualityRules.containsAnyPhrase(col("t"), phrases)) == false)
  }

  test("charEntropy: uniform, constant, and empty inputs") {
    // 4 equiprobable chars -> exactly 2 bits
    assert(sig("abcd", TextAnalysis.charEntropy(col("t"))) == 2.0)
    // constant run -> 0 bits
    assert(sig("aaaaaa", TextAnalysis.charEntropy(col("t"))) == 0.0)
    assert(sig("", TextAnalysis.charEntropy(col("t"))) == 0.0)
    // "aab": -(2/3)ln(2/3)-(1/3)ln(1/3) / ln2 = 0.918296
    assert(sig("aab", TextAnalysis.charEntropy(col("t"))) == 0.918296)
  }

  test("dupNgramCharFraction: only n-grams occurring more than once") {
    // trigrams of "x y z x y z w": "x y z" 2x (5 chars) -> 10/13; others unique
    assert(sig("x y z x y z w", QualityRules.dupNgramCharFraction(col("t"), 3)) == 0.769231)
    assert(sig("all grams unique here now", QualityRules.dupNgramCharFraction(col("t"), 3)) == 0.0)
  }
}
