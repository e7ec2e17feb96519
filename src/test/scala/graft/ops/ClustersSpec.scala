package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Connected-components cluster resolution (Clusters.scala): transitive
  * correctness, deterministic representatives, singleton behavior, and the
  * curate-style drop. */
class ClustersSpec extends SparkSuite {
  import spark.implicits._

  // default = local union-find path (small edge sets); max=0 forces the
  // distributed star loop — both paths are pinned below
  private def cc(pairs: Seq[(Long, Long)], localSolveMax: Long = 500000L): Map[Long, Long] =
    Clusters.connectedComponents(pairs.toDF("id_a", "id_b"), localSolveMax = localSolveMax)
      .as[(Long, Long)].collect().toMap

  private def ccDist(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    cc(pairs, localSolveMax = 0L)

  test("transitive chain A~B~C resolves to ONE cluster with min-id rep") {
    // the exact case greedy pair-dropping gets wrong: A~B, B~C, A≁C
    val reps = cc(Seq((1L, 2L), (2L, 3L)))
    assert(reps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("multiple components keep independent min-id representatives") {
    val reps = cc(Seq((5L, 9L), (9L, 7L), (20L, 21L), (30L, 25L)))
    assert(reps == Map(5L -> 5L, 7L -> 5L, 9L -> 5L,
      20L -> 20L, 21L -> 20L, 25L -> 25L, 30L -> 25L))
  }

  test("long path graph converges (O(log² n) rounds, not diameter)") {
    // 0-1-2-…-63: a 64-node path — worst case for naive propagation
    val path = (0L until 63L).map(i => (i, i + 1))
    val reps = cc(path)
    assert(reps.size == 64 && reps.values.forall(_ == 0L))
  }

  test("duplicate and reversed pairs, self-loops are tolerated") {
    val reps = cc(Seq((2L, 1L), (1L, 2L), (2L, 2L), (1L, 2L)))
    assert(reps == Map(1L -> 1L, 2L -> 1L))
  }

  test("empty pair set yields empty mapping") {
    val empty = spark.emptyDataFrame
      .select(lit(0L).as("id_a"), lit(0L).as("id_b")).limit(0)
    assert(Clusters.connectedComponents(empty).count() == 0)
  }

  test("local and distributed paths agree on the star cases") {
    for (edges <- Seq(Seq((1L, 2L), (2L, 3L)), Seq((5L, 9L), (9L, 7L), (20L, 21L)),
                      (0L until 20L).map(i => (i, i + 1)))) {
      assert(cc(edges) == ccDist(edges), s"paths diverge on $edges")
    }
  }

  test("random graphs match a reference union-find (20 seeded trials)") {
    // pin the distributed star algorithm against the textbook sequential
    // answer across sparse and dense random graphs
    def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // path-compress everything, rep = min id (union by min above)
      parent.keys.toSeq.map(k => k -> find(k)).toMap
    }
    for (seed <- 1 to 20) {
      val rnd = new scala.util.Random(seed)
      val n = 10 + rnd.nextInt(40)
      val m = 1 + rnd.nextInt(3 * n)
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        val expected = unionFind(n, edges)
        val got = cc(edges)
        assert(got == expected, s"seed=$seed n=$n m=$m:\n got=$got\n exp=$expected")
        // the distributed star loop must produce the identical mapping;
        // exercised on a seed subset to keep suite runtime bounded
        if (seed <= 5) {
          val gotDist = ccDist(edges)
          assert(gotDist == expected, s"distributed seed=$seed:\n got=$gotDist\n exp=$expected")
        }
      }
    }
  }

  test("superseded rounds' reliable checkpoints are reclaimed (only the final survives)") {
    // with a checkpoint dir set (the cluster deployment path) each star
    // round writes an edge-set-sized file set that Spark does NOT delete
    // by default — the loop must reclaim round N once round N+1 is
    // materialized, else a long-lived service leaks unboundedly
    val sc = spark.sparkContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-ckpt-").toString
    sc.setCheckpointDir(tmp)
    try {
      val dir = new org.apache.hadoop.fs.Path(sc.getCheckpointDir.get)
      val fs = dir.getFileSystem(sc.hadoopConfiguration)
      // 64-node path: converges in several rounds, so unreclaimed
      // intermediates would be visible; localSolveMax=0 forces the
      // distributed loop (the local path writes no round checkpoints)
      val path = (0L until 63L).map(i => (i, i + 1))
      val reps = ccDist(path)
      assert(reps.size == 64 && reps.values.forall(_ == 0L), "still correct under reliable checkpoints")
      val leftover = fs.listStatus(dir).count(_.getPath.getName.startsWith("rdd-"))
      assert(leftover == 1, s"expected only the final round's checkpoint, found $leftover under $dir")
    } finally {
      sc.setCheckpointDir(null) // restore localCheckpoint behavior for other suites
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("dropNearDupClusters keeps exactly the min-id member per cluster") {
    val df = (1L to 6L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val kept = Clusters.dropNearDupClusters(df, pairs, "doc_id")
      .as[Long].collect().toSet
    // clusters {1,2,3} → keep 1; {5,6} → keep 5; singleton 4 untouched
    assert(kept == Set(1L, 4L, 5L))
  }

  test("keepBestInClusters keeps the max-score member, ties to min id, null scores last") {
    def jd(v: Double): java.lang.Double = java.lang.Double.valueOf(v)
    val df = Seq[(Long, java.lang.Double)](
      (1L, jd(5.0)), (2L, jd(9.0)), (3L, jd(9.0)), // {1,2,3}: max 9.0, tie 2<3 → keep 2
      (4L, jd(1.0)),                               // singleton, survives
      (5L, null), (6L, jd(2.0))                    // {5,6}: null last → keep 6
    ).toDF("doc_id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val kept = Clusters.keepBestInClusters(df, pairs, "doc_id", "score")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 4L, 6L))
    // an all-null-score cluster still keeps exactly one member (min id)
    val dfn = Seq[(Long, java.lang.Double)]((7L, null), (8L, null))
      .toDF("doc_id", "score")
    val keptN = Clusters.keepBestInClusters(dfn,
        Seq((7L, 8L)).toDF("id_a", "id_b"), "doc_id", "score")
      .select("doc_id").as[Long].collect().toSet
    assert(keptN == Set(7L))
  }

  test("mergeIncremental: assignment + new pairs == full recompute (bridges, stability)") {
    // existing clusters {1,2,3} and {10,11}; new pairs bridge 3–10 and
    // introduce a brand-new cluster {20,21}
    val assignment = Clusters.connectedComponents(
      Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b"))
    val newPairs = Seq((3L, 10L), (20L, 21L)).toDF("id_a", "id_b")
    val merged = Clusters.mergeIncremental(assignment, newPairs)
      .as[(Long, Long)].collect().toMap
    assert(merged == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 1L, 11L -> 1L,
      20L -> 20L, 21L -> 20L))
    // untouched clusters keep their rep bit-for-bit
    val untouched = Clusters.mergeIncremental(assignment,
      Seq((20L, 21L)).toDF("id_a", "id_b")).as[(Long, Long)].collect().toMap
    assert(untouched.filter(_._1 <= 11L) ==
      assignment.as[(Long, Long)].collect().toMap)
  }

  test("mergeIncremental equals full recompute on random edge splits (10 seeded trials)") {
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(seed)
      val n = 60
      val edges = (0 until 120).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val (first, second) = edges.splitAt(edges.length / 2)
      val full = Clusters.connectedComponents(edges.toDF("id_a", "id_b"))
        .as[(Long, Long)].collect().toMap
      val base = Clusters.connectedComponents(first.toDF("id_a", "id_b"))
      val inc = Clusters.mergeIncremental(base, second.toDF("id_a", "id_b"))
        .as[(Long, Long)].collect().toMap
      assert(inc == full, s"seed=$seed incremental diverged from full recompute")
    }
  }
}
