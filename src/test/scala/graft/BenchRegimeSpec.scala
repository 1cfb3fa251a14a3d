package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's self-adjudication rule (r18 verdict #2): the official r18
  * artifact stamped itself quiet while its qscale tail ran 62× degraded,
  * because load was sampled only around the sweep and steal only
  * whole-run. These pins replay that scenario against the extracted
  * per-phase rule: a noisy TAIL must flip the stamp even when every
  * sweep-era sample reads quiet. */
class BenchRegimeSpec extends AnyFunSuite {
  import BenchRegime._

  private val maxLoad  = 4.0
  private val maxSteal = 1.0
  private def quiet(name: String) = PhaseBracket(name, 1.2, 2.8, 0.02, gates = true)

  test("an all-quiet run stamps quiet") {
    val phases = Seq(quiet("sweep"), quiet("ingest10x"), quiet("qscale"), quiet("maint_scale"))
    assert(stamp(phases, 0.02, maxLoad, maxSteal) === "quiet")
  }

  test("the r18 scenario: a degraded tail flips the stamp despite a quiet sweep") {
    // sweep-era samples all pass the old gate; the degradation RAMPS
    // through qscale (load_end 5.47 in the r18 artifact)
    val phases = Seq(quiet("sweep"), PhaseBracket("ingest10x", 2.9, 3.4, 0.01, gates = true),
                     PhaseBracket("qscale", 3.6, 5.5, 0.02, gates = true))
    assert(stamp(phases, 0.02, maxLoad, maxSteal) === "noisy-host")
    assert(!phaseQuiet(phases.last, maxLoad, maxSteal), "the breached phase stamps itself")
    assert(phaseQuiet(phases.head, maxLoad, maxSteal), "the quiet sweep keeps its own stamp")
  }

  test("a steal burst confined to one phase flips the stamp even under the whole-run average") {
    // 3% steal for one short phase dilutes below 1% over the full run —
    // the whole-run term alone would miss it
    val phases = Seq(quiet("sweep"), PhaseBracket("qscale", 2.0, 2.5, 3.0, gates = true))
    assert(stamp(phases, 0.4, maxLoad, maxSteal) === "noisy-host")
  }

  test("the gateway phase records its bracket but never gates (self-load)") {
    val phases = Seq(quiet("sweep"), PhaseBracket("gateway", 5.8, 6.4, 0.02, gates = false))
    assert(stamp(phases, 0.02, maxLoad, maxSteal) === "quiet")
  }

  test("the whole-run steal term still applies on its own") {
    assert(stamp(Seq(quiet("sweep")), 4.0, maxLoad, maxSteal) === "noisy-host")
  }

  test("unavailable /proc samples (negative) are excluded, not breaches") {
    val p = PhaseBracket("sweep", -1.0, -1.0, 0.0, gates = true)
    assert(stamp(Seq(p), 0.0, maxLoad, maxSteal) === "quiet")
  }

  test("phasesJson carries one self-stamped entry per phase") {
    val phases = Seq(quiet("sweep"), PhaseBracket("qscale", 3.6, 5.5, 0.02, gates = true))
    val j = phasesJson(phases, maxLoad, maxSteal)
    assert(j.contains(""""name":"sweep"""") && j.contains(""""quiet":true"""))
    assert(j.contains(""""name":"qscale"""") && j.contains(""""quiet":false"""))
  }
}
