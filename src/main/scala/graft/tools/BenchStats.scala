package graft.tools

/** Pure rep-list statistics shared by [[graft.Bench]] and its spec —
  * extracted so the quiet record's `"trend"` field (part of the
  * committed per-round artifact contract since round 18) is pinned by
  * a unit test instead of living untestable inside Bench.main. */
object BenchStats {

  /** Absolute swing floor shared with the `spread` flag: steady-rep
    * movement below this is scheduling jitter on sub-second queries,
    * never a signal. */
  val SwingFloorSec = 0.3

  /** Monotone rep-trend flag: Some("rising")/Some("falling") when the
    * STEADY reps (rep 1 dropped — it always pays per-query codegen/
    * classload warmth, the same rule the spread flag uses) drift
    * predominantly one direction, None otherwise.
    *
    * "Predominantly" is Kendall pairwise sign (|tau| ≥ 0.5), not
    * strict monotonicity: r17 sql_frontend's steady reps
    * [1.41, 1.84, 1.58, 2.33] drift 1.7× with one jittery dip —
    * tau 0.67 catches it, strict monotonicity misses it. A rising
    * flag is the warm-cache inversion (median understates the tail);
    * falling is settle-in (median overstates steady state). Either
    * way the median misstates steady state — read qmin. */
  def trendOf(reps: Seq[Double]): Option[String] = {
    val steady = reps.drop(1)
    if (steady.length < 3 || steady.max - steady.min <= SwingFloorSec) None
    else {
      val signs = for {
        i <- steady.indices; j <- (i + 1) until steady.length
      } yield math.signum(steady(j) - steady(i))
      val tau = signs.sum / signs.length
      if (tau >= 0.5) Some("rising")
      else if (tau <= -0.5) Some("falling")
      else None
    }
  }
}
