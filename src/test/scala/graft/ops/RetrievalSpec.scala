package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** BM25 retrieval ([[Retrieval.bm25TopK]]): closed-form score check, k
  * cutoff, absent-term semantics, broadcast + group-limit plan shape,
  * repartition determinism. */
class RetrievalSpec extends SparkSuite {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "apple banana apple"),           // dl=3, tf(apple)=2
    (2L, "apple cherry"),                 // dl=2, tf(apple)=1
    (3L, "banana banana banana cherry"))  // dl=4
    .toDF("doc_id", "text")

  test("closed-form BM25: hand-computed scores and ranks (k1=1.2, b=0.75)") {
    val qs = Seq((7L, "apple")).toDF("qid", "qtext")
    val out = Retrieval.bm25TopK(corpus, "doc_id", "text", qs, "qid", "qtext", k = 10)
      .orderBy("rk").collect()
    // N=3, avgdl=3, df(apple)=2 → idf = ln(1 + 1.5/2.5)
    val idf = math.log(1.0 + (3.0 - 2 + 0.5) / (2 + 0.5))
    def bm25(tf: Long, dl: Long) =
      idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / 3.0))
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSeq ==
      Seq((7L, 1L, 1), (7L, 2L, 2)), "doc 3 has no query term and must be absent")
    assert(out(0).getDouble(2) == r6(bm25(2, 3)))
    assert(out(1).getDouble(2) == r6(bm25(1, 2)))
  }

  test("k cutoff and per-query independence; ties break by doc id") {
    val docs = (1L to 20L).map(i => (i, "same words here")).toDF("doc_id", "text")
    val qs = Seq((1L, "same"), (2L, "words here")).toDF("qid", "qtext")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text", qs, "qid", "qtext", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    // identical docs → identical scores → rank by doc_id, capped at 5
    assert(out.toSet ==
      (for (q <- 1L to 2L; d <- 1L to 5L) yield (q, d, d.toInt)).toSet)
  }

  test("query terms absent from the corpus contribute nothing; all-absent query vanishes") {
    val qs = Seq((1L, "apple zebrafish"), (2L, "quux xyzzy")).toDF("qid", "qtext")
    val out = Retrieval.bm25TopK(corpus, "doc_id", "text", qs, "qid", "qtext", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.forall(_._1 == 1L), "a query with no corpus term yields no rows")
    assert(out.map(_._2).toSet == Set(1L, 2L))
  }

  test("null text drops; tokenization is [a-z0-9]+ over lowercase") {
    val docs = Seq((1L, "APPLE-banana!! 42x"), (2L, null)).toDF("doc_id", "text")
    val qs = Seq((1L, "Apple"), (2L, "42X")).toDF("qid", "qtext")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text", qs, "qid", "qtext", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 1L), (2L, 1L)),
      "case folds, punctuation splits, digit-letter runs survive as one term")
  }

  test("plan: query side broadcasts and ranking is group-limited (no full-corpus window spill)") {
    val docs = (0L until 200L).map(i => (i, s"w${i % 7} w${i % 11} filler")).toDF("doc_id", "text")
    val qs = Seq((1L, "w1 w2"), (2L, "w3")).toDF("qid", "qtext")
    val plan = Retrieval.bm25TopK(docs, "doc_id", "text", qs, "qid", "qtext", k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"query joins must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"))
    assert(plan.contains("WindowGroupLimit"),
      s"top-k must pre-prune map-side via WindowGroupLimit:\n$plan")
  }

  test("deterministic under repartitioning") {
    val docs = (0L until 300L).map(i =>
      (i, s"alpha${i % 5} beta${i % 3} gamma${i % 17} delta")).toDF("doc_id", "text")
    val qs = Seq((1L, "alpha1 delta"), (2L, "beta2 gamma4")).toDF("qid", "qtext")
    def run(d: org.apache.spark.sql.DataFrame) =
      Retrieval.bm25TopK(d, "doc_id", "text", qs, "qid", "qtext", k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(run(docs) == run(docs.repartition(13)))
  }

  test("tfidfTopK: closed-form smooth-idf scores, k cutoff, term-asc ties") {
    val out = Retrieval.tfidfTopK(corpus, "doc_id", "text", k = 2)
      .collect().map(r => ((r.getLong(0), r.getInt(4)), (r.getString(1), r.getLong(2), r.getDouble(3)))).toMap
    // N=3; df: apple=2, banana=2, cherry=2 → idf = ln(4/3)+1 for every term
    val idf = math.log(4.0 / 3.0) + 1.0
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    // doc 1: apple tf=2 (rank 1), banana tf=1 (rank 2)
    assert(out((1L, 1)) == (("apple", 2L, r6(2 * idf))))
    assert(out((1L, 2)) == (("banana", 1L, r6(idf))))
    // doc 2: equal tf=1 → term-asc tie → apple before cherry
    assert(out((2L, 1))._1 == "apple" && out((2L, 2))._1 == "cherry")
    // doc 3: banana tf=3 dominates
    assert(out((3L, 1)) == (("banana", 3L, r6(3 * idf))))
    assert(out.size == 6, "k=2 caps every doc")
  }

  test("tfidfTopK: rare terms outrank frequent ones at equal tf") {
    val docs = Seq((1L, "common rare"), (2L, "common x"), (3L, "common y"))
      .toDF("doc_id", "text")
    val top = Retrieval.tfidfTopK(docs, "doc_id", "text", k = 1)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(top == Map(1L -> "rare", 2L -> "x", 3L -> "y"),
      "df=3 'common' must lose to each doc's df=1 term")
  }

  test("tfidfTopK plan: lazy corpus-count broadcast, WindowGroupLimit ranking") {
    val docs = (0L until 100L).map(i => (i, s"a${i % 5} b${i % 7} c")).toDF("doc_id", "text")
    val plan = Retrieval.tfidfTopK(docs, "doc_id", "text", k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"per-doc top-k must pre-prune map-side:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"the single-row N aggregate must broadcast:\n$plan")
  }

  test("indexed path scores identically to the live path; df roll-up is exchange-free") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val qs = Seq((1L, "fast hash join"), (2L, "slow table scan"))
      .toDF("qid", "qtext")
    val live = Retrieval.bm25TopK(docs, "doc_id", "text", qs, "qid", "qtext", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    Retrieval.writeIndex(docs, "doc_id", "text", "graft_test_idx", buckets = 4)
    val idx = spark.table("graft_test_idx")
    val indexed = Retrieval.bm25OverIndex(idx, "doc_id", qs, "qid", "qtext", 5)
    assert(indexed.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet == live)
    // the bucketed-by-term read satisfies the df aggregate's distribution:
    // no exchange may sit between the scan and the term roll-up
    val dfPlan = idx.join(broadcast(Seq("fast", "scan").toDF("term")), Seq("term"))
      .groupBy("term").count().queryExecution.executedPlan.toString
    assert(!dfPlan.contains("Exchange hashpartitioning(term"),
      s"term-bucketed scan must feed the roll-up shuffle-free:\n$dfPlan")
    spark.sql("DROP TABLE IF EXISTS graft_test_idx")
  }

  test("termStats: one row per (doc, term) with tf and shared dl") {
    val st = Retrieval.termStats(corpus, "doc_id", "text")
      .collect().map(r => ((r.getLong(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(st((1L, "apple")) == ((2L, 3L)))
    assert(st((1L, "banana")) == ((1L, 3L)))
    assert(st((3L, "banana")) == ((3L, 4L)))
    assert(st((3L, "cherry")) == ((1L, 4L)))
    assert(st.size == 6)
  }

  // ---- phraseSearch ------------------------------------------------------

  private def phrase(docs: org.apache.spark.sql.DataFrame,
                     ps: Seq[(Long, String)]): Map[(Long, Long), Int] =
    Retrieval.phraseSearch(docs, "doc_id", "text",
        ps.toDF("pid", "phrase"), "pid", "phrase")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap

  test("phraseSearch: adjacency required, occurrences counted with overlap") {
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "quick the brown quick brown end"),
      (3L, "a a a b")).toDF("doc_id", "text")
    val hits = phrase(docs, Seq((1L, "quick brown"), (2L, "a a")))
    // doc 1: one hit; doc 2: "quick brown" at position 4 only (terms
    // adjacent there, NOT at 1-3 though both terms appear earlier)
    assert(hits((1L, 1L)) == 1 && hits((1L, 2L)) == 1)
    // overlapping starts both count: "a a a" has "a a" at 1 and 2
    assert(hits((2L, 3L)) == 2)
    assert(hits.size == 3)
  }

  test("phraseSearch: all-terms-present but non-adjacent docs are dropped") {
    val docs = Seq((1L, "alpha filler beta"), (2L, "alpha beta")).toDF("doc_id", "text")
    val hits = phrase(docs, Seq((1L, "alpha beta")))
    assert(hits == Map((1L, 2L) -> 1))
  }

  test("phraseSearch: tokenizer folding, token-free phrases drop, null text never matches") {
    val docs = Seq((1L, "Fast JOIN ahead"), (2L, null)).toDF("doc_id", "text")
    val hits = phrase(docs, Seq((1L, "fast, Join!!"), (2L, "!!!"), (3L, "fast")))
    assert(hits == Map((1L, 1L) -> 1, (3L, 1L) -> 1))
  }

  test("phraseSearch: phrase longer than the document cannot match (sequence guard)") {
    val docs = Seq((1L, "one two")).toDF("doc_id", "text")
    assert(phrase(docs, Seq((1L, "one two three four"))).isEmpty)
  }

  test("phraseSearch: repeated-token phrase needs the full run, not just the vocabulary") {
    val docs = Seq((1L, "go go stop"), (2L, "go stop go")).toDF("doc_id", "text")
    assert(phrase(docs, Seq((1L, "go go"))) == Map((1L, 1L) -> 1))
  }
test("clusterLabels: distinctive terms rank above shared terms") {
    import spark.implicits._
    // "shared" appears in every cluster; each cluster has its own marker
    val df = Seq(
      (1L, "shared alpha alpha"), (1L, "shared alpha"),
      (2L, "shared beta beta"), (2L, "shared beta"),
      (3L, "shared gamma")).toDF("c", "text")
    val out = Retrieval.clusterLabels(df, "c", "text", k = 1)
      .select("c", "term").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "alpha", 2L -> "beta", 3L -> "gamma"))
    // null cluster/text drop; rk caps at k
    val withNull = df.unionByName(
      Seq((Option.empty[Long], Option("x")), (Some(4L), Option.empty[String]))
        .toDF("c", "text"))
    val full = Retrieval.clusterLabels(withNull, "c", "text", k = 2)
    assert(!full.select("c").as[Long].collect().contains(4L))
    assert(full.groupBy("c").count().select("count").as[Long].collect().forall(_ <= 2))
  }

  test("coordinationTopK: distinct-term overlap counts, doc-id tiebreak, zero-match absent") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha alpha beta"),   // duplicate terms count once
      (3L, "alpha"),
      (4L, "delta epsilon")).toDF("doc_id", "text")
    val qs = Seq((10L, "alpha beta zeta")).toDF("qid", "qtext")
    val out = Retrieval.coordinationTopK(docs, "doc_id", "text", qs, "qid", "qtext", k = 10)
      .as[(Long, Long, Long, Int)].collect().sortBy(_._4).toSeq
    // doc 1 and 2 both match {alpha, beta} → tie broken by doc_id; doc 4 absent
    assert(out == Seq((10L, 1L, 2L, 1), (10L, 2L, 2L, 2), (10L, 3L, 1L, 3)))
  }

  test("rrfFusion: hand-computed scores, missing-system docs, tiebreak") {
    val sysA = Seq((1L, 100L, 1), (1L, 200L, 2), (1L, 300L, 3)).toDF("qid", "doc_id", "rk")
    val sysB = Seq((1L, 200L, 1), (1L, 400L, 2)).toDF("qid", "doc_id", "rk")
    val out = Retrieval.rrfFusion(Seq(sysA, sysB), "qid", "doc_id", kRrf = 60, topN = 10)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4).toSeq
    def s(rs: Double*) = math.floor(rs.map(r => 1.0 / (60.0 + r)).sum / 1e-12 + 0.5) * 1e-12
    // 200 in both systems wins; 100 (rank 1 in A) beats 400 (rank 2 in B)
    assert(out.map(t => (t._2, t._4)) == Seq((200L, 1), (100L, 2), (400L, 3), (300L, 4)))
    assert(out.map(_._3) == Seq(s(2, 1), s(1), s(2), s(3)))
  }

  test("rrfFusion: exact-tie breaks by doc id; topN truncates") {
    val sysA = Seq((1L, 9L, 1), (1L, 5L, 2)).toDF("qid", "doc_id", "rk")
    val sysB = Seq((1L, 5L, 1), (1L, 9L, 2)).toDF("qid", "doc_id", "rk")
    val out = Retrieval.rrfFusion(Seq(sysA, sysB), "qid", "doc_id", topN = 1)
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(out.map(_._2) == Seq(5L)) // same fused score → lower doc id first
  }
}
