package graft.tools

/** Standalone host-health probe: the bench's deterministic CPU
  * throughput score (single-thread + all-cores MB/s-equivalent of the
  * same 64-bit mixing loop `graft.Bench` records per pass as
  * cpu_st_mbps / cpu_mt_mbps) without starting Spark or sbt-locking
  * the repo for more than a few seconds. The loop is register-only ALU
  * work, so the number measures delivered CPU/SMT throughput — host
  * CPU contention — not memory bandwidth; it is named mbps for
  * cross-round continuity with the bench artifact field. Run BEFORE
  * launching a protocol bench: r11-r13 established empirically that
  * `mt` below ~30,000 on this 32-vCPU box correlates 1:1 with the
  * bench-degrading host condition (invisible to loadavg/steal) and
  * the warm totals will not be cross-round comparable.
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

  def main(args: Array[String]): Unit = {
    blackhole ^= mix(2) // JIT warm
    val mbPerRound = 8.0
    val t0 = System.nanoTime()
    blackhole ^= mix(8)
    val st = 8 * mbPerRound / ((System.nanoTime() - t0) / 1e9)
    val n = Runtime.getRuntime.availableProcessors
    val t1 = System.nanoTime()
    val threads = (0 until n).map(_ => new Thread(() => { blackhole ^= mix(4); () }))
    threads.foreach(_.start()); threads.foreach(_.join())
    val mt = n * 4 * mbPerRound / ((System.nanoTime() - t1) / 1e9)
    val load = scala.io.Source.fromFile("/proc/loadavg").mkString.trim
    println(f"""{"cpu_st_mbps":$st%.1f,"cpu_mt_mbps":$mt%.1f,"ncpu":$n,"loadavg":"$load"}""")
  }
}
