package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PiiScrubSpec extends SparkSpec {
  import spark.implicits._

  private def scrubOne(s: String): (String, Long, Long, Long, Long) = {
    val out = PiiScrub.scrub(Seq(s).toDF("t"), "t")
      .select("t_redacted", "n_email", "n_card", "n_ip", "n_phone")
      .as[(String, Long, Long, Long, Long)].collect()
    out.head
  }

  test("redacts all four PII kinds globally, leaves clean text alone") {
    val (red, ne, nc, ni, np) = scrubOne(
      "write to john.doe+x@mail.example.vn or anna@ex.co, " +
        "call +84 123 4567, server 192.168.1.254, " +
        "card 4111-1111-1111-1234 backup 5500-0000-0000-0004")
    assert(red == "write to [EMAIL] or [EMAIL], call [PHONE], " +
      "server [IP], card [CARD] backup [CARD]")
    assert((ne, nc, ni, np) == (2L, 2L, 1L, 1L))
    val (clean, e2, c2, i2, p2) = scrubOne("no secrets here at all")
    assert(clean == "no secrets here at all" &&
      (e2, c2, i2, p2) == (0L, 0L, 0L, 0L))
  }

  test("redaction order is the contract: counts come from the " +
      "original text, not the partially-redacted one") {
    // a card-shaped string adjacent to an ip-shaped one; after the
    // card replace, the ip must still be found on its own
    val (red, _, nc, ni, _) = scrubOne("4111-2222-3333-4444 10.0.0.1")
    assert(red == "[CARD] [IP]")
    assert(nc == 1L && ni == 1L)
  }

  test("redaction is idempotent: tokens never re-match any pattern " +
      "(property over generated PII mixes)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val frag = Gen.oneOf(
      Gen.const("plain words here"),
      Gen.choose(1, 999).map(n => s"u$n@ex$n.com"),
      Gen.choose(100, 999).map(n => s"+84 $n 4567"),
      Gen.choose(0, 255).map(n => s"10.$n.0.7"),
      Gen.choose(1000, 9999).map(n => s"4111-2222-3333-$n"),
      Gen.const("almost@ nope 1.2.3 +x 1234-12"))
    val gen = Gen.listOfN(6, frag).map(_.mkString(" "))
    (1 to 40).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(11L + i)).foreach { s0 =>
        val once = scrubOne(s0)._1
        val twice = PiiScrub.scrub(Seq(once).toDF("t"), "t")
          .select("t_redacted").as[String].head()
        assert(once == twice, s"not idempotent on '$s0'")
      }
    }
  }

  test("patterns avoid engine-divergent constructs") {
    // the cross-engine contract (t12 oracle): no word boundaries,
    // lookaround, or backreferences — RE2 rejects/diverges on those
    PiiScrub.patterns.foreach { case (name, p, _) =>
      assert(!p.contains("\\b") && !p.contains("(?") && !p.contains("\\1"),
        s"pattern '$name' uses a construct outside the Java∩RE2 subset")
    }
  }
}
