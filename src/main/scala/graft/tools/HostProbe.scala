package graft.tools

/** Standalone host-health probe: the bench's deterministic CPU
  * throughput score (single-thread + all-cores MB/s-equivalent of the
  * same 64-bit mixing loop `graft.Bench` records per pass as
  * cpu_st_mbps / cpu_mt_mbps) without starting Spark or sbt-locking
  * the repo for more than a few seconds. The loop is register-only ALU
  * work, so the number measures delivered CPU/SMT throughput — host
  * CPU contention — not memory bandwidth; it is named mbps for
  * cross-round continuity with the bench artifact field.
  *
  * Methodology (r14 fix): the timed all-cores region covers ONLY
  * start()+join() of pre-constructed threads, after one full untimed
  * warm burst of the same shape. The r14-session version timed
  * `(0 until n).map(_ => new Thread(...))` construction inside the
  * region, which in a cold JVM pays ~100 ms of scala-collection
  * classloading + invokedynamic lambda linkage before the first
  * thread starts — capping a standalone (fresh-JVM) reading at
  * ~10 GB/s no matter how idle the host is, and depressing the first
  * in-bench reading of every forked child pass by a JVM-warmth-
  * dependent amount. Every r14 "the host never delivered a clean
  * window" pre-flight reading was this artifact: a side-by-side
  * pure-Java control measured 31-52 GB/s in the same minute the old
  * probe reported 4-8. Readings from the fixed probe are NOT
  * comparable to pre-r14 artifacts; the clean/degraded calibration
  * and `Bench.MinMtMbps` were re-derived (see Bench.scala).
  *
  * Usage: runMain graft.tools.HostProbe
  */
object HostProbe {
  @volatile private var blackhole = 0L

  private def mix(rounds: Int): Long = {
    val words = 1 << 20
    var acc = 0x243F6A8885A308D3L
    var r = 0
    while (r < rounds) {
      var i = 0
      while (i < words) {
        acc = java.lang.Long.rotateLeft(acc * 0x9E3779B97F4A7C15L + i, 31)
        i += 1
      }
      r += 1
    }
    acc
  }

  private def burstThreads(n: Int): Array[Thread] = {
    val ts = new Array[Thread](n)
    var i = 0
    while (i < n) {
      ts(i) = new Thread(() => { blackhole ^= mix(4); () })
      i += 1
    }
    ts
  }

  /** (cpu_st_mbps, cpu_mt_mbps). Steady-state: single-thread score
    * after a JIT warm round; all-cores score over start+join of
    * pre-constructed threads, after one untimed warm burst that
    * absorbs classloading, lambda linkage, thread-stack setup, and
    * clock ramp. */
  def score(): (Double, Double) = {
    blackhole ^= mix(2) // JIT warm
    val mbPerRound = 8.0
    val n = Runtime.getRuntime.availableProcessors
    val warm = burstThreads(n)
    warm.foreach(_.start()); warm.foreach(_.join()) // untimed warm burst
    val t0 = System.nanoTime()
    blackhole ^= mix(8)
    val st = 8 * mbPerRound / ((System.nanoTime() - t0) / 1e9)
    val timed = burstThreads(n) // constructed OUTSIDE the timed region
    val t1 = System.nanoTime()
    timed.foreach(_.start()); timed.foreach(_.join())
    val mt = n * 4 * mbPerRound / ((System.nanoTime() - t1) / 1e9)
    (st, mt)
  }

  def main(args: Array[String]): Unit = {
    val (st, mt) = score()
    val n = Runtime.getRuntime.availableProcessors
    val load = scala.io.Source.fromFile("/proc/loadavg").mkString.trim
    println(f"""{"cpu_st_mbps":$st%.1f,"cpu_mt_mbps":$mt%.1f,"ncpu":$n,"loadavg":"$load"}""")
  }
}
