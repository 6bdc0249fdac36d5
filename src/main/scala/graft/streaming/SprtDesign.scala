package graft.streaming

/** Wald-SPRT design constants (Wald 1945): the four ppm integers the
  * sprtDecisions machine walks, DERIVED from the statistics they encode
  * — hypothesized Bernoulli rates (p0, p1) and error budgets (α, β) —
  * instead of hand-computed at the call site. Per-event increments are
  * the log-likelihood ratios ln(p1/p0) (success) and ln((1−p1)/(1−p0))
  * (failure); the stopping thresholds are Wald's A = ln((1−β)/α) and
  * B = ln(β/(1−α)). All four are quantized floor(x·10⁶) BIGINTs — the
  * house ppm convention, so the machine's walk is exact integer addition
  * replayable on any engine. Deriving them here means the 20th state
  * machine's constants CANNOT silently drift from the declared design:
  * SprtDesignSpec property-checks the quantization identity and pins the
  * registered q_sprt_stream oracle text to these exact integers. */
object SprtDesign {

  /** (incSuccessPpm, incFailPpm, acceptH1Ppm, acceptH0Ppm) for a
    * one-sided Bernoulli SPRT of H0: p = p0 vs H1: p = p1 (p1 > p0) at
    * error rates α (type I) and β (type II). Requires α + β < 1 — the
    * regime where the thresholds straddle zero, which is also exactly
    * what sprtDecisions' own sign guards demand. */
  def ppm(p0: Double, p1: Double, alpha: Double, beta: Double)
      : (Long, Long, Long, Long) = {
    require(0d < p0 && p0 < p1 && p1 < 1d,
      s"need 0 < p0 < p1 < 1, got p0=$p0 p1=$p1")
    require(0d < alpha && alpha < 1d && 0d < beta && beta < 1d,
      s"need error rates in (0, 1), got alpha=$alpha beta=$beta")
    require(alpha + beta < 1d,
      s"need alpha + beta < 1 so the thresholds straddle zero, got " +
        s"$alpha + $beta")
    def q(x: Double): Long = math.floor(math.log(x) * 1e6).toLong
    val out = (q(p1 / p0), q((1d - p1) / (1d - p0)),
      q((1d - beta) / alpha), q(beta / (1d - alpha)))
    // α + β < 1 makes the REAL thresholds straddle zero, but quantization
    // can still floor a threshold to 0 near the boundary (α ≈ β ≈ 0.5);
    // fail at the design level with a design-level message instead of
    // deferring to sprtDecisions' less specific sign guards
    require(out._3 >= 1L && out._4 <= -1L,
      s"SPRT design degenerate after ppm quantization: acceptH1Ppm=" +
        s"${out._3}, acceptH0Ppm=${out._4} must strictly straddle zero — " +
        s"tighten alpha/beta (got alpha=$alpha beta=$beta)")
    out
  }
}
