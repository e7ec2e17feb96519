package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** BPE (Sennrich et al. 2016): learned merge order on a controlled corpus,
  * exact application semantics, and the roundtrip invariant. */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  test("learn: most frequent weighted pair first, deterministic ties") {
    // "aaab" x3, "ab" x2: pairs a|a count 6, a|b count 5, a|ab after merge...
    val df = Seq.fill(3)("aaab").++(Seq.fill(2)("ab")).toDF("text")
    val merges = Bpe.learn(df, "text", numMerges = 2)
    assert(merges.head == ("a a" -> "aa"))
    // after (a,a): "aa a b" x3, "a b" x2 -> pairs: aa|a 3, a|b 5 -> (a,b)
    assert(merges(1) == ("a b" -> "ab"))
  }

  test("apply: greedy leftmost overlap resolution, rank order respected") {
    val merges = Seq("a a" -> "aa", "aa b" -> "aab")
    val got = Seq("aaab")
      .toDF("t").select(Bpe.tokenize(col("t"), merges)).head().getSeq[String](0)
    // "a a a b" -> (a,a) leftmost: "aa a b" -> (aa,b) no adjacency until...
    // "aa a b" has pairs aa|a and a|b; merge "aa b" not adjacent -> final
    assert(got == Seq("aa", "a", "b"))
  }

  test("tokenize: multi-word docs flatten in order; counts match") {
    val merges = Seq("t h" -> "th", "th e" -> "the")
    val df = Seq("the other theme").toDF("t")
    val toks = df.select(Bpe.tokenize(col("t"), merges)).head().getSeq[String](0)
    assert(toks.take(1) == Seq("the"))
    assert(toks.contains("o")) // 'other' starts o|t|h|e|r -> th merges inside
    val n = df.select(Bpe.tokenCount(col("t"), merges)).head().getLong(0)
    assert(n == toks.size.toLong)
  }

  test("roundtrip: concatenating a word's tokens restores the word") {
    val corpus = Seq("lower lowest low", "newer newest new").toDF("text")
    val merges = Bpe.learn(corpus, "text", numMerges = 6)
    val words = Seq("lowest", "newest", "low", "unrelated").toDF("w")
    val ok = words.select(col("w"),
      array_join(split(Bpe.applyMerges(Bpe.charSeq(col("w")), merges), " "), "")
        .as("rt")).collect()
    ok.foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
  }
}
