package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Funnel matching ([[Sequences.funnel]]): greedy earliest-first semantics,
  * the strictly-after tie rule, horizon bounding, and a brute-force
  * reference reimplementation pin over random event streams. */
class SequencesSpec extends SparkSuite {
  import spark.implicits._

  private def ts(m: Long) = new Timestamp(m * 60000L)

  private val steps = Seq("view", "click", "buy")

  test("basic funnel: earliest completion, strictly-after ordering") {
    val ev = Seq(
      (1L, ts(10), "view"), (1L, ts(20), "click"), (1L, ts(30), "buy"),
      (2L, ts(10), "view"), (2L, ts(10), "click"),            // tie: click NOT after view
      (3L, ts(10), "click"), (3L, ts(20), "view"),            // wrong order
      (4L, ts(5), "view"), (4L, ts(6), "view"), (4L, ts(7), "click")
    ).toDF("user_id", "t", "et")
    val out = Sequences.funnel(ev, "user_id", "t", "et", steps)
      .orderBy("user_id")
      .select("user_id", "step_reached", "t_1", "t_2", "t_3")
      .as[(Long, Int, Option[Timestamp], Option[Timestamp], Option[Timestamp])]
      .collect().toSeq
    assert(out == Seq(
      (1L, 3, Some(ts(10)), Some(ts(20)), Some(ts(30))),
      (2L, 1, Some(ts(10)), None, None),
      (3L, 1, Some(ts(20)), None, None),                      // view@20 starts; its only click is earlier
      (4L, 2, Some(ts(5)), Some(ts(7)), None)))               // greedy takes view@5
  }

  test("horizon bounds the whole funnel from t_1") {
    val ev = Seq(
      (1L, ts(0), "view"), (1L, ts(30), "click"), (1L, ts(100), "buy"),
      (2L, ts(0), "view"), (2L, ts(61), "click")
    ).toDF("user_id", "t", "et")
    val out = Sequences.funnel(ev, "user_id", "t", "et", steps,
        horizon = Some(expr("INTERVAL 60 MINUTES")))
      .orderBy("user_id").select("user_id", "step_reached")
      .as[(Long, Int)].collect().toSeq
    // user 1: buy@100 falls outside t_1+60 → stops at 2
    // user 2: click@61 outside horizon → stops at 1
    assert(out == Seq((1L, 2), (2L, 1)))
  }

  test("keys with no step-1 event are absent; null keys/times never match") {
    val ev = Seq(
      (Some(1L), Some(ts(1)), "click"),
      (None, Some(ts(1)), "view"),
      (Some(2L), None, "view")
    ).toDF("user_id", "t", "et")
    assert(Sequences.funnel(ev, "user_id", "t", "et", steps).count() == 0)
  }

  test("random streams match a brute-force greedy reference") {
    val rnd = new scala.util.Random(41)
    val types = Array("view", "click", "buy", "other")
    val rows = (0 until 3000).map { _ =>
      (rnd.nextInt(40).toLong, ts(rnd.nextInt(500).toLong), types(rnd.nextInt(4)))
    }
    val got = Sequences.funnel(rows.toDF("user_id", "t", "et"), "user_id", "t", "et", steps)
      .select("user_id", "step_reached")
      .as[(Long, Int)].collect().toMap
    val want = rows.groupBy(_._1).flatMap { case (u, evs) =>
      val sorted = evs.sortBy(_._2.getTime)
      // greedy: earliest step-1 event, then earliest strictly-later event
      // of each next step; stop at the first step with no candidate
      var lastT = Option.empty[Long]
      var halted = false
      var reached = 0
      steps.foreach { s =>
        if (!halted) {
          sorted.find(e => e._3 == s && lastT.forall(e._2.getTime > _)) match {
            case Some(e) => reached += 1; lastT = Some(e._2.getTime)
            case None => halted = true
          }
        }
      }
      if (reached > 0) Some(u -> reached) else None
    }
    assert(got == want)
  }

  test("funnelCounts stacks cumulative reach") {
    val ev = Seq(
      (1L, ts(1), "view"), (1L, ts(2), "click"), (1L, ts(3), "buy"),
      (2L, ts(1), "view"), (2L, ts(2), "click"),
      (3L, ts(1), "view")
    ).toDF("user_id", "t", "et")
    val f = Sequences.funnel(ev, "user_id", "t", "et", steps)
    val out = Sequences.funnelCounts(f, steps).orderBy("step")
      .as[(Int, String, Long)].collect().toSeq
    assert(out == Seq((1, "view", 3L), (2, "click", 2L), (3, "buy", 1L)))
  }

  test("plan shape: no Window, no sort-within-key scan of raw events") {
    val ev = Seq((1L, ts(1), "view")).toDF("user_id", "t", "et")
    val plan = Sequences.funnel(ev, "user_id", "t", "et", steps)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Window"), s"funnel must not window raw events:\n$plan")
  }

  test("transitionCounts: consecutive pairs per key, ties broken, firsts skipped") {
    val ev = Seq(
      (1L, ts(1), 10L, "a"), (1L, ts(2), 11L, "b"), (1L, ts(3), 12L, "a"),
      (2L, ts(1), 20L, "a"), (2L, ts(1), 21L, "c"), // same ts -> id order
      (3L, ts(5), 30L, "z"),                        // lone event, no pair
      (4L, null.asInstanceOf[java.sql.Timestamp], 40L, "a")
    ).toDF("user_id", "t", "event_id", "et")
    val got = Sequences.transitionCounts(ev, "user_id", "t", "et", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("a", "b") -> 1L, ("b", "a") -> 1L, ("a", "c") -> 1L))
  }

  test("lastTouchAttribution: credit, organic conversions, convTouches toggle") {
    def ts(s: Long) = new Timestamp(s * 1000)
    val ev = Seq(
      (1L, ts(10), 1L, "ad"), (1L, ts(20), 2L, "email"), (1L, ts(30), 3L, "buy"),
      (1L, ts(40), 4L, "buy"),            // second buy: credit depends on toggle
      (2L, ts(5), 5L, "buy"),             // organic — nothing precedes
      (3L, ts(1), 6L, "ad"), (3L, ts(2), 7L, "ad")) // no conversion → no row
      .toDF("u", "t", "eid", "typ")
    val base = Sequences.lastTouchAttribution(ev, "u", "t", "eid", "typ", "buy")
      .as[(Long, Timestamp, Option[String], Option[Timestamp], Option[Long])]
      .collect().map(r => (r._1, r._2.getTime / 1000) -> ((r._3, r._5))).toMap
    assert(base((1L, 30L)) == ((Some("email"), Some(10L)))) // 30 − 20
    assert(base((1L, 40L)) == ((Some("email"), Some(20L)))) // buy@30 is NOT a touch
    assert(base((2L, 5L)) == ((None, None)))                // organic
    assert(base.size == 3)
    val rep = Sequences.lastTouchAttribution(ev, "u", "t", "eid", "typ", "buy",
        convTouches = true)
      .as[(Long, Timestamp, Option[String], Option[Timestamp], Option[Long])]
      .collect().map(r => (r._1, r._2.getTime / 1000) -> r._3).toMap
    assert(rep((1L, 40L)).contains("buy")) // repeat purchase credits the prior buy
  }
}
