package graft.ops

import graft.SparkSuite

/** Edit-distance join ([[FuzzyJoin.editDistanceJoin]]): exhaustive
  * all-pairs reference over adversarial random corpora — heavy on the
  * short-string pool and planted near-duplicates — across (q, k)
  * settings. Losslessness is the whole claim; the reference is exact. */
class FuzzyJoinSpec extends SparkSuite {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def allPairs(rows: Seq[(Long, String)], k: Int): Set[(Long, Long, Int)] =
    (for {
      (i1, s1) <- rows; (i2, s2) <- rows
      if i1 < i2
      d = lev(s1, s2) if d <= k
    } yield (i1, i2, d)).toSet

  private def planted(seed: Int, n: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val alpha = "abcd" // small alphabet → dense collisions
    def word(len: Int) = (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    (0 until n).map { i =>
      if (i % 3 == 0 || i == 0) (i.toLong, word(rnd.nextInt(14))) // incl. len 0..13
      else {
        // mutate an earlier string with 0–3 random edits
        val base = new StringBuilder(word(4 + rnd.nextInt(10)))
        (0 until rnd.nextInt(4)).foreach { _ =>
          if (base.isEmpty) base.append(alpha(rnd.nextInt(4)))
          else rnd.nextInt(3) match {
            case 0 => base.setCharAt(rnd.nextInt(base.length), alpha(rnd.nextInt(4)))
            case 1 => base.deleteCharAt(rnd.nextInt(base.length))
            case 2 => base.insert(rnd.nextInt(base.length + 1), alpha(rnd.nextInt(4)))
          }
        }
        (i.toLong, base.toString)
      }
    }
  }

  test("matches exhaustive all-pairs reference (lossless blocking)") {
    for ((q, k, seed) <- Seq((3, 2, 11), (2, 1, 12), (3, 1, 13), (4, 2, 14))) {
      val rows = planted(seed, 120)
      val got = FuzzyJoin.editDistanceJoin(rows.toDF("id", "s"), "id", "s", k, q)
        .as[(Long, Long, Int)].collect().toSet
      assert(got == allPairs(rows, k), s"q=$q k=$k diverged")
    }
  }

  test("identical and empty strings pair at distance 0") {
    val rows = Seq((1L, "spark"), (2L, "spark"), (3L, ""), (4L, ""), (5L, "x"))
    val got = FuzzyJoin.editDistanceJoin(rows.toDF("id", "s"), "id", "s", 1)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 2L, 0), (3L, 4L, 0), (3L, 5L, 1), (4L, 5L, 1)))
  }

  test("null strings drop; maxDist 0 reduces to exact duplicates") {
    val rows = Seq((Some(1L), Some("ab")), (Some(2L), None), (Some(3L), Some("ab")),
      (Some(4L), Some("ac"))).toDF("id", "s")
    val got = FuzzyJoin.editDistanceJoin(rows, "id", "s", 0)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 3L, 0)))
  }

  test("the adversarial all-grams-destroyed case is caught (len ≤ qk+q−1)") {
    // q=3, k=2: edits at positions 2 and 5 destroy all six grams of an
    // 8-char string — only the short-string pool can block this pair
    val rows = Seq((1L, "abcdefgh"), (2L, "abXdeYgh"))
    val got = FuzzyJoin.editDistanceJoin(rows.toDF("id", "s"), "id", "s", 2, 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 2L, 2)))
  }

  // ------------------------------------------------------- jaccardJoin

  private def jac(a: Set[String], b: Set[String]): Double =
    (a & b).size.toDouble / (a | b).size

  private def tokenRows(seed: Int, n: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = (0 until 30).map(i => s"w$i") // small vocab → dense overlap
    (0 until n).map { i =>
      val sz = 1 + rnd.nextInt(8)
      (i.toLong, (0 until sz).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
  }

  test("jaccardJoin is lossless vs exhaustive exact Jaccard across thresholds") {
    for (seed <- Seq(7, 21); t <- Seq(0.4, 0.7, 1.0)) {
      val rows = tokenRows(seed, 60)
      val sets = rows.map { case (i, s) =>
        (i, s.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet)
      }.filter(_._2.nonEmpty)
      val want = (for {
        (i1, s1) <- sets; (i2, s2) <- sets
        if i1 < i2
        j = jac(s1, s2) if j >= t
      } yield (i1, i2)).toSet
      val got = FuzzyJoin.jaccardJoin(rows.toDF("id", "text"), "id", "text", t)
        .as[(Long, Long, Double)].collect()
      assert(got.map(p => (p._1, p._2)).toSet == want, s"seed=$seed t=$t")
      got.foreach { case (i1, i2, j) =>
        val exact = jac(sets.find(_._1 == i1).get._2, sets.find(_._1 == i2).get._2)
        assert(math.abs(j - exact) < 1e-12)
      }
    }
  }

  test("jaccardJoin drops empty/null docs and is set-semantic on repeats") {
    val rows = Seq((Some(1L), Some("a b c")), (Some(2L), Some("a a b b c c")),
      (Some(3L), None), (Some(4L), Some("   ")), (Some(5L), Some("x y")))
      .toDF("id", "text")
    val got = FuzzyJoin.jaccardJoin(rows, "id", "text", 0.9)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 2L, 1.0))) // duplicate tokens collapse; 3/4 drop
  }

  test("plan: jaccardJoin is equi-joins only — no cartesian, no nested loop") {
    val rows = tokenRows(3, 40)
    val plan = FuzzyJoin.jaccardJoin(rows.toDF("id", "text"), "id", "text", 0.6)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"prefix-filter blocking must stay on hash joins:\n${plan.take(2000)}")
  }

  test("jaccardJoin threshold 1.0 finds only identical token sets") {
    val rows = Seq((1L, "the quick fox"), (2L, "fox quick the"),
      (3L, "the quick fix"))
      .toDF("id", "text")
    val got = FuzzyJoin.jaccardJoin(rows, "id", "text", 1.0)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 2L, 1.0)))
  }
}
