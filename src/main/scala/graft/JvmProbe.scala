package graft

/** Spark-free JVM parallel-inflation probe (BASELINE.md §3).
  *
  * The scaling protocol's ingest phases run at a uniform 0.59-0.65
  * efficiency with stage walls ≈ Σ(task run time)/cores — cores are NOT
  * idle; the per-task work itself inflates as more threads run (round-5
  * ingestprof: Σ run time 135 s-core at 2 threads → 206 s-core at 8 for
  * identical stages). That is a property of one box's memory system under
  * a JVM allocation-heavy mix, not of the engine's plans. This probe
  * measures exactly that ceiling with zero Spark: T threads, each doing
  * IDENTICAL fixed work of the ingest's flavor — short-string
  * construction, xxhash64 over the bytes, small-array copy churn — so
  * wall time would be flat in T on linear hardware. The efficiency
  * t_lo/t_hi is the box's ceiling for ANY same-mix parallel job; the
  * ingest gate number should be read against it.
  *
  * Usage: runMain graft.JvmProbe [lo hi]   (defaults 2 8)
  * Prints one JSON line; append to BENCH/probes as the run log.
  */
object JvmProbe {

  /** One unit of ingest-flavored work: build a url-ish string, hash it,
    * copy a small long slab. Returns a value so nothing is dead-code
    * eliminated. */
  private def unit(i: Long, sink: Array[Long]): Long = {
    val s = new java.lang.StringBuilder(48)
      .append("https://site").append(i % 9973)
      .append(".example/p/").append(i).toString
    val h = graft.util.Hashing.hashString(s, 42L)
    val j = (h & 0x3ff).toInt
    sink(j) = sink(j) ^ h
    // slab churn: allocate + copy, like slab packing / shuffle ser
    val a = new Array[Long](16)
    a(0) = h
    val b = java.util.Arrays.copyOf(a, 16)
    b(15)
  }

  private def wallFor(threads: Int, perThread: Long): Double = {
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { t =>
      val th = new Thread(() => {
        val sink = new Array[Long](1024)
        var i = 0L
        var acc = 0L
        while (i < perThread) { acc ^= unit(t * perThread + i, sink); i += 1 }
        if (acc == 42L && sink(0) == 43L) println("") // keep live
      })
      th.start(); th
    }
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  /** The REAL links-phase per-row work, Spark-free: synthesize page i's
    * html (the generator is a pure function) and run the engine's own
    * link extraction over it. If THIS inflates at 8 threads the box is
    * the limit; if it scales, the inflation lives in Spark's row/codec
    * path. */
  private def wallForHtml(threads: Int, perThread: Long): Double = {
    val n = 1000000L
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { t =>
      val th = new Thread(() => {
        var i = 0L
        var acc = 0L
        while (i < perThread) {
          val id = java.lang.Math.floorMod(t * perThread + i, n)
          val html = graft.sources.SyntheticPages.htmlOf(id, n, 42L)
          acc ^= graft.html.Html
            .extractLinks(graft.sources.SyntheticPages.urlOf(id, n, 42L), html)
            .length
          i += 1
        }
        if (acc == -1L) println("")
      })
      th.start(); th
    }
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val lo = if (args.length > 0) args(0).toInt else 2
    val hi = if (args.length > 1) args(1).toInt else 8
    if (args.contains("html")) {
      val per = 120000L
      wallForHtml(hi, per / 4); wallForHtml(lo, per / 4)
      val (los, his) = (0 until 3).map { _ =>
        (wallForHtml(lo, per), wallForHtml(hi, per))
      }.unzip
      println(s"""JVMPROBE {"mode":"html","threads_lo":$lo,"threads_hi":$hi,""" +
        s""""t_lo":${"%.3f".format(los.min)},"t_hi":${"%.3f".format(his.min)},""" +
        s""""alloc_mix_eff":${"%.3f".format(los.min / his.min)}}""")
      return
    }
    val perThread = 30_000_000L
    wallFor(hi, perThread / 4); wallFor(lo, perThread / 4) // JIT warmup
    // alternate levels, min per level — JIT keeps deepening across the
    // first measured runs, so a fixed order biases whichever ran last
    val (los, his) = (0 until 3).map { _ =>
      (wallFor(lo, perThread), wallFor(hi, perThread))
    }.unzip
    val (tLo, tHi) = (los.min, his.min)
    // identical per-thread work: flat wall == linear memory system
    val eff = tLo / tHi
    println(s"""JVMPROBE {"threads_lo":$lo,"threads_hi":$hi,""" +
      s""""t_lo":${"%.3f".format(tLo)},"t_hi":${"%.3f".format(tHi)},""" +
      s""""alloc_mix_eff":${"%.3f".format(eff)}}""")
  }
}
