package graft

/** Fixed-work host-speed calibration shared by [[Bench]] and
  * [[ScaleProbe]] (round-13 Next #1/#2).
  *
  * The round-13 battery inflated 1.42x UNIFORMLY across untouched
  * queries (golden plans + shuffle bytes unchanged) — a host-state
  * signature the bench artifact itself could not adjudicate. This
  * calibration pins the host's speed INSIDE each artifact:
  * `ns_per_op` is a deterministic single-thread xorshift spin (pure
  * register work — no memory traffic, no allocation, so it measures
  * CPU clock, not cache state), and `allcore_ratio` is the wall-clock
  * of `threads` concurrent identical spins over the single-thread
  * wall (~1.0 when every core runs at full speed; >1.3 means the host
  * is in a throttled / oversubscribed all-core regime and the
  * artifact's wall-clock numbers are inflated by roughly that
  * factor).
  */
object HostCanary {
  @volatile private var sink: Long = 0L

  private def spin(ops: Long): Long = {
    var x = 0x9E3779B97F4A7C15L
    var i = 0L
    while (i < ops) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
    x
  }

  val Ops = 400000000L // ~0.4-0.8 s single-thread on a healthy core

  /** (ns_per_op single-thread, allcore wall / single wall). */
  def measure(threads: Int): (Double, Double) = {
    sink ^= spin(Ops / 8) // JIT warm
    val t0 = System.nanoTime()
    sink ^= spin(Ops)
    val single = (System.nanoTime() - t0).toDouble
    val ts = (1 to threads).map(_ => new Thread(() => { sink ^= spin(Ops) }))
    val t1 = System.nanoTime()
    ts.foreach(_.start()); ts.foreach(_.join())
    val all = (System.nanoTime() - t1).toDouble
    (single / Ops, all / single)
  }

  /** The one-line JSON form both artifact writers print. */
  def line(tag: String, threads: Int): String = {
    val (ns, ratio) = measure(threads)
    f"""$tag {"ns_per_op":$ns%.3f,"allcore_ratio":$ratio%.2f,"threads":$threads}"""
  }
}
