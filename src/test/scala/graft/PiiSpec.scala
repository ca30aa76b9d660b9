package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.expressions.PiiScrub

/** The anchor-gated PII scanner must be byte-identical to the
  * compiled-alternation reference walk on ANY input (not just the
  * corpus — TextCleanSpec covers that side): a seeded fuzz over a
  * PII-prone alphabet plus the known nasty shapes.
  */
class PiiSpec extends AnyFunSuite {

  private def both(s: String): Unit = {
    val a = PiiScrub.compute(UTF8String.fromString(s))
    val b = PiiScrub.computeReference(UTF8String.fromString(s))
    assert(a.getUTF8String(0).toString == b.getUTF8String(0).toString,
      s"scrubbed diverges on '${s.take(80)}': " +
        s"'${a.getUTF8String(0)}' vs '${b.getUTF8String(0)}'")
    (1 to 4).foreach(i =>
      assert(a.getLong(i) == b.getLong(i),
        s"count $i diverges on '${s.take(80)}': ${a.getLong(i)} vs ${b.getLong(i)}"))
  }

  test("scanner == compiled alternation on directed shapes") {
    Seq(
      "", " ", "@", "...", "+", "h", "http://", "https://x",
      "user1@example.com", "a@b.cd", "a@b.c", "a@b@c.dd", "-a@b.cc",
      "a@b.cd-ef", "a@b.c.def", "1.2.3.4@x.io", "+1555@5550.com",
      "https://x@y.com more", "abhttps://x y", "x http://a.b/c?e=f@g.hi",
      "+1 555-867-5309", "+12345678", "+1234567", "+1 2 3 4 5 6 7 8",
      "1.2.3.4", "1.2.3.4.5", "1234.5.6.7", "a1.2.3.4", "_1.2.3.4",
      "-1.2.3.4", "%1.2.3.4", "10.0.0.7 tail", "9.9.9.9",
      "+1 2345678xx@y.zz", "tel+1 5558675309@x.org",
      "word soup only here", "ip 10.0.12.7 done",
      " Contact user42@example.com or https://example.org/doc/42 " +
        "tel +1 555-867-5309 ip 10.0.42.7")
      .foreach(both)
  }

  test("scanner == compiled alternation under seeded fuzz") {
    val alphabet = "ab@.+-:/h1259 _%ttps".toCharArray
    val rnd = new scala.util.Random(20260816L)
    (1 to 4000).foreach { _ =>
      val n = 1 + rnd.nextInt(120)
      val sb = new StringBuilder(n)
      (1 to n).foreach(_ => sb += alphabet(rnd.nextInt(alphabet.length)))
      both(sb.toString)
    }
  }
}
