package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** PII detection/redaction vectors — each detector's hits and misses,
  * the load-bearing application order, and the null/clean contracts. */
class PiiSpec extends SparkSuite {
  import spark.implicits._

  private def scrubOne(t: String): (String, Long, Long, Long, Long) = {
    val r = Pii.scrub(Seq(Tuple1(t)).toDF("text"), "text")
      .select(col("text"), col("pii_counts.n_email"), col("pii_counts.n_ipv4"),
        col("pii_counts.n_phone"), col("pii_counts.n_id")).head()
    (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
  }

  test("email: hits and self-anchoring") {
    assert(scrubOne("mail a.b+c%d@sub.example.co.uk now") ==
      (("mail <EMAIL> now", 1L, 0L, 0L, 0L)))
    // no TLD → no match
    assert(scrubOne("user@localhost stays") ==
      (("user@localhost stays", 0L, 0L, 0L, 0L)))
  }

  test("ipv4: exact octet ranges, word-bounded") {
    assert(scrubOne("from 192.168.0.255 here") ==
      (("from <IP> here", 0L, 1L, 0L, 0L)))
    // 256 is not an octet, and the trailing "1.1.1" is only 3 octets —
    // no quad match anywhere, text unchanged
    assert(scrubOne("v 256.1.1.1 x") == (("v 256.1.1.1 x", 0L, 0L, 0L, 0L)))
  }

  test("phone: 3-3-4 with separators; bare 10 digits is not a phone") {
    assert(scrubOne("call 555-867-5309 now") ==
      (("call <PHONE> now", 0L, 0L, 1L, 0L)))
    assert(scrubOne("call +1 555.867.5309 now") ==
      (("call <PHONE> now", 0L, 0L, 1L, 0L)))
    val (t, _, _, nPhone, nId) = scrubOne("ref 5558675309 x")
    assert(nPhone == 0L && nId == 1L && t == "ref <ID> x")
  }

  test("long digit runs: 9+ digits, word-bounded") {
    assert(scrubOne("acct 123456789 ok") == (("acct <ID> ok", 0L, 0L, 0L, 1L)))
    assert(scrubOne("order 12345678 ok")._5 == 0L) // 8 digits — too short
  }

  test("order is load-bearing: an email local part with 9+ digits redacts as email only") {
    val (t, nEmail, _, _, nId) = scrubOne("x 123456789@example.com y")
    assert(t == "x <EMAIL> y" && nEmail == 1L)
    // the count runs on the ORIGINAL text, so the digit run IS counted
    assert(nId == 1L)
  }

  test("null text stays null; filterClean keeps clean + null rows only") {
    val df = Seq(
      (1L, "all clean here"),
      (2L, "mail me at a@b.co"),
      (3L, null.asInstanceOf[String])).toDF("id", "text")
    val scrubbed = Pii.scrub(df, "text")
    assert(scrubbed.filter(col("id") === 3L).head().isNullAt(1))
    assert(Pii.filterClean(df, "text").select("id").as[Long].collect().sorted
      .toSeq == Seq(1L, 3L))
  }
}
