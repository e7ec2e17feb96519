package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Sliding-window document chunking ([[Chunking.chunkByTokens]]):
  * coverage, overlap, short-doc and boundary behavior, and a reference
  * reimplementation pin on random corpora. */
class ChunkingSpec extends SparkSuite {
  import spark.implicits._

  test("short doc yields one chunk; exact-width doc yields one chunk") {
    val d = Seq((1L, "a b c"), (2L, (1 to 8).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Chunking.chunkByTokens(d, "doc_id", "text", chunkTokens = 8, overlap = 2)
      .as[(Long, Long, String, Long)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq(
      (1L, 0L, "a b c", 3L),
      (2L, 0L, (1 to 8).map(i => s"t$i").mkString(" "), 8L)))
  }

  test("overlapping chunks cover every token and repeat the overlap") {
    // 10 tokens, chunk 6, overlap 2 → stride 4 → chunks at 0,4: [1..6],[5..10]
    val d = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val out = Chunking.chunkByTokens(d, "doc_id", "text", chunkTokens = 6, overlap = 2)
      .as[(Long, Long, String, Long)].collect().sortBy(_._2)
    assert(out.length == 2)
    assert(out(0)._3 == "w1 w2 w3 w4 w5 w6" && out(0)._4 == 6L)
    assert(out(1)._3 == "w5 w6 w7 w8 w9 w10" && out(1)._4 == 6L)
  }

  test("random corpora match a reference reimplementation (incl. ragged tails)") {
    val rnd = new scala.util.Random(13)
    val rows = (0 until 300).map { i =>
      (i.toLong, (0 until (1 + rnd.nextInt(40))).map(j => s"x${i}_$j").mkString(" "))
    }
    for ((chunk, overlap) <- Seq((8, 0), (8, 3), (5, 4), (16, 8))) {
      val got = Chunking.chunkByTokens(rows.toDF("doc_id", "text"), "doc_id", "text",
        chunk, overlap)
        .as[(Long, Long, String, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
      val stride = chunk - overlap
      val want = rows.flatMap { case (id, text) =>
        val toks = text.split("\\s+")
        val nChunks = (math.max(toks.length - chunk, 0) + stride - 1) / stride + 1
        (0 until nChunks).map { ci =>
          val piece = toks.slice(ci * stride, ci * stride + chunk)
          (id, ci.toLong, piece.mkString(" "), piece.length.toLong)
        }
      }
      assert(got == want, s"chunk=$chunk overlap=$overlap diverged")
    }
  }

  test("plan is map-only: no exchange anywhere") {
    val d = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val plan = Chunking.chunkByTokens(d, "doc_id", "text", 4, 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free plan:\n$plan")
  }
}
