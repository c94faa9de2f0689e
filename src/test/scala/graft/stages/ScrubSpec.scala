package graft.stages

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.synth.SynthPages

/** N4 scrub fixtures (FIXTURES.md `scrub` family): emails, RO phones,
  * valid/invalid CNPs, slurs, lookalikes that must NOT match, byte identity
  * on non-matching spans, idempotence.
  */
class ScrubSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def scrubOne(text: String): (String, Int, Int, Int, Int) = {
    import spark.implicits._
    val r = Scrub.withScrub(Seq(text).toDF("text"))
      .select("scrubbed_text", "n_emails", "n_phones", "n_cnps", "n_slurs")
      .head()
    (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
  }

  test("email is scrubbed and counted") {
    val (out, ne, _, _, _) = scrubOne("scrie la a.b-c_d@sub.exemplu.ro azi")
    assert(out == "scrie la <EMAIL> azi")
    assert(ne == 1)
  }

  test("'name at domain' prose must NOT match as email") {
    val s = "persoana la exemplu punct ro"
    val (out, ne, _, _, _) = scrubOne(s)
    assert(out == s && ne == 0)
  }

  test("RO phone formats are scrubbed") {
    val (out1, _, np1, _, _) = scrubOne("tel: +40 722 123 456.")
    assert(out1 == "tel: <PHONE>." && np1 == 1)
    val (out2, _, np2, _, _) = scrubOne("tel: 0722123456!")
    assert(out2 == "tel: <PHONE>!" && np2 == 1)
  }

  test("longer digit runs are not phone matches") {
    val s = "cod 07221234567890 nu e telefon"
    val (out, _, np, _, _) = scrubOne(s)
    assert(out == s && np == 0)
  }

  test("valid-checksum CNP scrubbed; invalid checksum passes byte-identical") {
    val valid = SynthPages.makeCnp(42L, 7L, valid = true)
    val invalid = SynthPages.makeCnp(42L, 7L, valid = false)
    val (out1, _, _, nc1, _) = scrubOne(s"cnp: $valid fin")
    assert(out1 == "cnp: <CNP> fin" && nc1 == 1)
    val s2 = s"nr comandă: $invalid fin"
    val (out2, _, _, nc2, _) = scrubOne(s2)
    assert(out2 == s2 && nc2 == 0)
  }

  test("13-digit runs inside longer runs or URLs don't match") {
    val valid = SynthPages.makeCnp(42L, 9L, valid = true)
    val s = s"https://x.ro/order/9$valid" // 14-digit run
    val (out, _, _, nc, _) = scrubOne(s)
    assert(out == s && nc == 0)
  }

  test("slur lexicon hits are scrubbed, case-insensitively") {
    val (out, _, _, _, ns) = scrubOne("mă, Prostule, taci")
    assert(out == "mă, <SLUR>, taci")
    assert(ns == 1)
  }

  test("diacritics and non-matching text are byte-identical after scrub") {
    val s = " școală învățământ țară așa όμως ўмова 中文 — emoji 🙂"
    val (out, ne, np, nc, ns) = scrubOne(s)
    assert(out == s)
    assert(
      out.getBytes("UTF-8").sameElements(s.getBytes("UTF-8")))
    assert(ne + np + nc + ns == 0)
  }

  test("scrub is idempotent on synthetic pages (property)") {
    (0L until 2000L).foreach { id =>
      val text = SynthPages.gen(id).text
      val once = CnpScrubber.scrub(text)
      assert(CnpScrubber.scrub(once) == once)
    }
    // full-chain idempotence through Spark on a sample
    import spark.implicits._
    val texts = (0L until 200L).map(SynthPages.gen(_).text)
    val once = Scrub.withScrub(texts.toDF("text"))
      .select("scrubbed_text").as[String].collect()
    val twice = Scrub.withScrub(once.toSeq.toDF("text"))
      .select("scrubbed_text").as[String].collect()
    assert(once.sameElements(twice))
  }

  test("CNP checksum helper agrees with the published algorithm") {
    // known-structure check: checksum digit recomputed independently
    val d12 = "1800101221144".take(12)
    val w = "279146358279".map(_ - '0')
    val expected = {
      val s = d12.zip(w).map { case (c, k) => (c - '0') * k }.sum % 11
      if (s == 10) 1 else s
    }
    assert(CnpScrubber.isValidCnp(d12 + expected.toString, 0))
    assert(!CnpScrubber.isValidCnp(d12 + ((expected + 1) % 10).toString, 0))
  }
}
