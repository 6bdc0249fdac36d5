package graft

import graft.streaming.SprtDesign
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** The 20th state machine's design-knob audit: the ppm LLR increments
  * and stopping thresholds must BE the Wald quantities for the declared
  * (p0, p1, α, β) in the house floor(x·10⁶) quantization — and the
  * registered q_sprt_stream oracle must embed those exact integers, so
  * the machine's constants cannot silently drift from the statistics
  * they encode. No Spark session needed. */
class SprtDesignSpec extends AnyFunSuite {

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(200)
  private def check(p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, r.status.toString)
  }

  private val designGen: Gen[(Double, Double, Double, Double)] = for {
    p0 <- Gen.choose(0.01, 0.97)
    p1 <- Gen.choose(p0 + 0.01, 0.99)
    alpha <- Gen.choose(0.001, 0.4)
    beta <- Gen.choose(0.001, 0.4)
  } yield (p0, p1, alpha, beta)

  test("property: ppm emits exactly the quantized Wald quantities and " +
      "signs sprtDecisions' guards demand, over random valid designs") {
    check(Prop.forAll(designGen) { case (p0, p1, alpha, beta) =>
      val (incS, incF, a, b) = SprtDesign.ppm(p0, p1, alpha, beta)
      def q(x: Double): Long = math.floor(math.log(x) * 1e6).toLong
      incS == q(p1 / p0) &&
        incF == q((1 - p1) / (1 - p0)) &&
        a == q((1 - beta) / alpha) &&
        b == q(beta / (1 - alpha)) &&
        // the walk can decide BOTH ways and the thresholds straddle 0 —
        // sprtDecisions' own require() preconditions, valid for every
        // well-formed design by construction
        incS > 0L && incF < 0L && a > 0L && b < 0L
    })
  }

  test("malformed designs fail loud: p1 <= p0, rates outside (0,1), " +
      "alpha + beta >= 1") {
    assertThrows[IllegalArgumentException](SprtDesign.ppm(0.4, 0.2, 0.05, 0.05))
    assertThrows[IllegalArgumentException](SprtDesign.ppm(0.2, 0.2, 0.05, 0.05))
    assertThrows[IllegalArgumentException](SprtDesign.ppm(0.0, 0.4, 0.05, 0.05))
    assertThrows[IllegalArgumentException](SprtDesign.ppm(0.2, 1.0, 0.05, 0.05))
    assertThrows[IllegalArgumentException](SprtDesign.ppm(0.2, 0.4, 0.0, 0.05))
    assertThrows[IllegalArgumentException](SprtDesign.ppm(0.2, 0.4, 0.6, 0.5))
  }

  test("the registered q_sprt_stream design is pinned: constants derive " +
      "from (p0=0.2, p1=0.4, alpha=beta=0.05) and the oracle SQL embeds " +
      "those exact integers") {
    val (incS, incF, a, b) = SprtDesign.ppm(0.2, 0.4, 0.05, 0.05)
    assert((incS, incF, a, b) === ((693147L, -287683L, 2944438L, -2944439L)))
    val oracle = SparkEntry.oracleSql("q_sprt_stream")
    for (c <- Seq(incS, incF, a, b))
      assert(oracle.contains(c.toString),
        s"q_sprt_stream oracle no longer embeds the design constant $c — " +
          "the machine and its oracle have drifted apart")
  }
}
