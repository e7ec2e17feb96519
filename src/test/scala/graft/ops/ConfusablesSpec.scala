package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

class ConfusablesSpec extends SparkSuite {
  import spark.implicits._

  private def run(ss: Seq[String]): Seq[(String, Any)] =
    ss.toDF("s").select(Confusables.skeleton(col("s")).as("k"),
        Confusables.isSpoofed(col("s")).as("f"))
      .collect().map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getBoolean(1))).toSeq

  test("classic spoofs collapse to their ASCII skeletons") {
    // Cyrillic а/р, Greek ο, fullwidth — the UTS #39 poster children
    assert(run(Seq("раγpal")).head._1 != "paypal") // γ (gamma) NOT covered — stays
    assert(run(Seq("раураl")) == Seq(("paypal", true)))
    assert(run(Seq("gοοgle")) == Seq(("google", true)))
    assert(run(Seq("ｈｅｌｌｏ　ｗｏｒｌｄ！")) == Seq(("hello world!", true)))
  }

  test("clean text is untouched and unflagged; null passes through") {
    assert(run(Seq("plain ascii text!")) == Seq(("plain ascii text!", false)))
    // genuinely accented Latin is NOT a confusable (that's dedupNormalize's job)
    assert(run(Seq("café")) == Seq(("café", false)))
    val out = Seq(Option.empty[String]).toDF("s")
      .select(Confusables.skeleton(col("s")), Confusables.isSpoofed(col("s")))
      .collect()(0)
    assert(out.isNullAt(0) && out.isNullAt(1))
  }

  test("uppercase Cyrillic and Greek capitals map too") {
    assert(run(Seq("МОСКВА".replace("В", "B"))).head._1 == "MOCKBA")
    assert(run(Seq("ΝΙΚΕ")) == Seq(("NIKE", true)))
  }

  test("mapping strings are aligned and duplicate-free") {
    assert(Confusables.fromChars.length == Confusables.toChars.length)
    assert(Confusables.fromChars.toSet.size == Confusables.fromChars.length)
    // every fullwidth ASCII char lands on its exact ASCII counterpart
    assert(Confusables.pairs.collect {
      case (f, t) if f >= 0xFF01 && f <= 0xFF5E => (f - 0xFEE0).toChar == t
    }.forall(identity))
  }

  test("spoof-hardened fingerprint: skeleton before dedupNormalize unifies variants") {
    val a = "The Quick Brown Fox"
    val b = "Thе Quіck Brοwn Fοx" // Cyrillic е/і, Greek ο
    val out = Seq(a, b).toDF("s")
      .select(graft.expressions.native.dedupNormalize(
        Confusables.skeleton(col("s"))).as("n"))
      .collect().map(_.getString(0)).toSet
    assert(out.size == 1)
  }
}
