package graft.util

/** Allocation-free primitive helpers for the push/walk inner loops.
  * (The boxed first cut — tuple-keyed LinkedHashMap + sortBy — cost ~6s
  * per 6.4M-row superstep in GC pressure alone; these bring the cascade
  * to primitive-array speed.) */
object Prim {

  /** Quicksort three parallel arrays by the key array, in place. */
  def sort3(k: Array[Long], a: Array[Double], b: Array[Double],
            lo0: Int, hi0: Int): Unit = {
    def swap(i: Int, j: Int): Unit = {
      val tk = k(i); k(i) = k(j); k(j) = tk
      val ta = a(i); a(i) = a(j); a(j) = ta
      val tb = b(i); b(i) = b(j); b(j) = tb
    }
    def sort(lo: Int, hi: Int): Unit = {
      if (hi - lo < 12) { // insertion sort for small ranges
        var i = lo + 1
        while (i <= hi) {
          val kk = k(i); val aa = a(i); val bb = b(i)
          var j = i - 1
          while (j >= lo && k(j) > kk) {
            k(j + 1) = k(j); a(j + 1) = a(j); b(j + 1) = b(j); j -= 1
          }
          k(j + 1) = kk; a(j + 1) = aa; b(j + 1) = bb
          i += 1
        }
      } else {
        val mid = lo + (hi - lo) / 2
        if (k(mid) < k(lo)) swap(mid, lo)
        if (k(hi) < k(lo)) swap(hi, lo)
        if (k(hi) < k(mid)) swap(hi, mid)
        val pivot = k(mid)
        var i = lo; var j = hi
        while (i <= j) {
          while (k(i) < pivot) i += 1
          while (k(j) > pivot) j -= 1
          if (i <= j) { swap(i, j); i += 1; j -= 1 }
        }
        if (lo < j) sort(lo, j)
        if (i < hi) sort(i, hi)
      }
    }
    if (hi0 > lo0) sort(lo0, hi0)
  }

  /** Quicksort three parallel arrays by (k1, k2) lexicographically, in
    * place. Same structure as sort3; used where the secondary key must be
    * part of the total order (e.g. CSR entry sort by (target, source)). */
  def sort2k(k1: Array[Long], k2: Array[Long], w: Array[Double],
             lo0: Int, hi0: Int): Unit = {
    def less(i: Int, pj1: Long, pj2: Long): Boolean =
      k1(i) < pj1 || (k1(i) == pj1 && k2(i) < pj2)
    def greater(i: Int, pj1: Long, pj2: Long): Boolean =
      k1(i) > pj1 || (k1(i) == pj1 && k2(i) > pj2)
    def swap(i: Int, j: Int): Unit = {
      val t1 = k1(i); k1(i) = k1(j); k1(j) = t1
      val t2 = k2(i); k2(i) = k2(j); k2(j) = t2
      val tw = w(i); w(i) = w(j); w(j) = tw
    }
    def sort(lo: Int, hi: Int): Unit = {
      if (hi - lo < 12) {
        var i = lo + 1
        while (i <= hi) {
          val a1 = k1(i); val a2 = k2(i); val aw = w(i)
          var j = i - 1
          while (j >= lo && (k1(j) > a1 || (k1(j) == a1 && k2(j) > a2))) {
            k1(j + 1) = k1(j); k2(j + 1) = k2(j); w(j + 1) = w(j); j -= 1
          }
          k1(j + 1) = a1; k2(j + 1) = a2; w(j + 1) = aw
          i += 1
        }
      } else {
        val mid = lo + (hi - lo) / 2
        if (less(mid, k1(lo), k2(lo))) swap(mid, lo)
        if (less(hi, k1(lo), k2(lo))) swap(hi, lo)
        if (less(hi, k1(mid), k2(mid))) swap(hi, mid)
        val p1 = k1(mid); val p2 = k2(mid)
        var i = lo; var j = hi
        while (i <= j) {
          while (less(i, p1, p2)) i += 1
          while (greater(j, p1, p2)) j -= 1
          if (i <= j) { swap(i, j); i += 1; j -= 1 }
        }
        if (lo < j) sort(lo, j)
        if (i < hi) sort(i, hi)
      }
    }
    if (hi0 > lo0) sort(lo0, hi0)
  }

  /** Open-addressing long→slot map with linear probing. Slots index the
    * caller's parallel growable arrays. */
  final class LongSlotMap(initCap: Int) {
    private var cap = {
      var c = 16
      while (c < initCap * 2) c <<= 1
      c
    }
    private var mask = cap - 1
    private var keys = new Array[Long](cap)
    private var slots = new Array[Int](cap)
    java.util.Arrays.fill(slots, -1)
    private var n = 0

    def size: Int = n

    private def rehash(): Unit = {
      val ok = keys; val os = slots
      cap <<= 1; mask = cap - 1
      keys = new Array[Long](cap)
      slots = new Array[Int](cap)
      java.util.Arrays.fill(slots, -1)
      var i = 0
      while (i < ok.length) {
        if (os(i) >= 0) insertRaw(ok(i), os(i))
        i += 1
      }
    }

    private def insertRaw(k: Long, slot: Int): Unit = {
      var i = (scala.util.hashing.byteswap64(k) & mask).toInt
      while (slots(i) >= 0) i = (i + 1) & mask
      keys(i) = k; slots(i) = slot
    }

    /** Slot of k, or -1. */
    def get(k: Long): Int = {
      var i = (scala.util.hashing.byteswap64(k) & mask).toInt
      while (slots(i) >= 0) {
        if (keys(i) == k) return slots(i)
        i = (i + 1) & mask
      }
      -1
    }

    /** Existing slot of k, or assign `newSlot` to it. Returns the slot. */
    def getOrInsert(k: Long, newSlot: Int): Int = {
      var i = (scala.util.hashing.byteswap64(k) & mask).toInt
      while (slots(i) >= 0) {
        if (keys(i) == k) return slots(i)
        i = (i + 1) & mask
      }
      keys(i) = k; slots(i) = newSlot; n += 1
      if (n * 4 > cap * 3) rehash()
      newSlot
    }
  }

  /** Growable primitive ring queue of ints. */
  final class IntQueue(initCap: Int) {
    private var arr = new Array[Int](math.max(16, initCap))
    private var head = 0
    private var tail = 0 // exclusive
    private var n = 0
    def isEmpty: Boolean = n == 0
    def nonEmpty: Boolean = n > 0
    def add(x: Int): Unit = {
      if (n == arr.length) {
        val na = new Array[Int](arr.length << 1)
        var i = 0
        while (i < n) { na(i) = arr((head + i) % arr.length); i += 1 }
        arr = na; head = 0; tail = n
      }
      arr(tail) = x
      tail += 1
      if (tail == arr.length) tail = 0
      n += 1
    }
    def poll(): Int = {
      val x = arr(head)
      head += 1
      if (head == arr.length) head = 0
      n -= 1
      x
    }
  }

  /** Quicksort four parallel arrays by (q, v, a, b) lexicographically, in
    * place — the (qid, vid, reserve, residue) row order of the join-path
    * cascades. Doubles compare by java.lang.Double.compare, matching the
    * Ordering[Double] the boxed `Ordering.by(tuple)` sort used. */
  def sort4p(q: Array[Int], v: Array[Long], a: Array[Double],
             b: Array[Double], lo0: Int, hi0: Int): Unit = {
    def cmp(i: Int, pq: Int, pv: Long, pa: Double, pb: Double): Int = {
      if (q(i) != pq) { if (q(i) < pq) -1 else 1 }
      else if (v(i) != pv) { if (v(i) < pv) -1 else 1 }
      else {
        val ca = java.lang.Double.compare(a(i), pa)
        if (ca != 0) ca else java.lang.Double.compare(b(i), pb)
      }
    }
    def swap(i: Int, j: Int): Unit = {
      val tq = q(i); q(i) = q(j); q(j) = tq
      val tv = v(i); v(i) = v(j); v(j) = tv
      val ta = a(i); a(i) = a(j); a(j) = ta
      val tb = b(i); b(i) = b(j); b(j) = tb
    }
    def sort(lo: Int, hi: Int): Unit = {
      if (hi - lo < 12) {
        var i = lo + 1
        while (i <= hi) {
          val aq = q(i); val av = v(i); val aa = a(i); val ab = b(i)
          var j = i - 1
          while (j >= lo && cmp(j, aq, av, aa, ab) > 0) {
            q(j + 1) = q(j); v(j + 1) = v(j); a(j + 1) = a(j)
            b(j + 1) = b(j); j -= 1
          }
          q(j + 1) = aq; v(j + 1) = av; a(j + 1) = aa; b(j + 1) = ab
          i += 1
        }
      } else {
        val mid = lo + (hi - lo) / 2
        if (cmp(mid, q(lo), v(lo), a(lo), b(lo)) < 0) swap(mid, lo)
        if (cmp(hi, q(lo), v(lo), a(lo), b(lo)) < 0) swap(hi, lo)
        if (cmp(hi, q(mid), v(mid), a(mid), b(mid)) < 0) swap(hi, mid)
        val pq = q(mid); val pv = v(mid); val pa = a(mid); val pb = b(mid)
        var i = lo; var j = hi
        while (i <= j) {
          while (cmp(i, pq, pv, pa, pb) < 0) i += 1
          while (cmp(j, pq, pv, pa, pb) > 0) j -= 1
          if (i <= j) { swap(i, j); i += 1; j -= 1 }
        }
        if (lo < j) sort(lo, j)
        if (i < hi) sort(i, hi)
      }
    }
    if (hi0 > lo0) sort(lo0, hi0)
  }

  /** Open-addressing (int, long)→slot map with linear probing — the
    * pair-keyed LongSlotMap for (qid, vid) state keys whose vids may use
    * all 64 bits (hash-vid graphs), so they cannot be packed. */
  final class PairSlotMap(initCap: Int) {
    private var cap = {
      var c = 16
      while (c < initCap * 2) c <<= 1
      c
    }
    private var mask = cap - 1
    private var kq = new Array[Int](cap)
    private var kv = new Array[Long](cap)
    private var slots = new Array[Int](cap)
    java.util.Arrays.fill(slots, -1)
    private var n = 0

    def size: Int = n

    private def hash(q: Int, v: Long): Int =
      (scala.util.hashing.byteswap64(
        v * -7046029254386353131L + q) & mask).toInt

    private def rehash(): Unit = {
      val oq = kq; val ov = kv; val os = slots
      cap <<= 1; mask = cap - 1
      kq = new Array[Int](cap)
      kv = new Array[Long](cap)
      slots = new Array[Int](cap)
      java.util.Arrays.fill(slots, -1)
      var i = 0
      while (i < os.length) {
        if (os(i) >= 0) {
          var j = hash(oq(i), ov(i))
          while (slots(j) >= 0) j = (j + 1) & mask
          kq(j) = oq(i); kv(j) = ov(i); slots(j) = os(i)
        }
        i += 1
      }
    }

    /** Existing slot of (q, v), or assign `newSlot`. Returns the slot. */
    def getOrInsert(q: Int, v: Long, newSlot: Int): Int = {
      var i = hash(q, v)
      while (slots(i) >= 0) {
        if (kv(i) == v && kq(i) == q) return slots(i)
        i = (i + 1) & mask
      }
      kq(i) = q; kv(i) = v; slots(i) = newSlot; n += 1
      if (n * 4 > cap * 3) rehash()
      newSlot
    }
  }

  /** Growable parallel (int, long, double, double) column store — one
    * (qid, vid, reserve, residue) state row per index. */
  final class PairRows(initCap: Int) {
    var qids = new Array[Int](math.max(16, initCap))
    var vids = new Array[Long](qids.length)
    var a = new Array[Double](qids.length)
    var b = new Array[Double](qids.length)
    var n = 0
    def ensure(extra: Int): Unit = {
      if (n + extra > qids.length) {
        var c = qids.length
        while (c < n + extra) c <<= 1
        qids = java.util.Arrays.copyOf(qids, c)
        vids = java.util.Arrays.copyOf(vids, c)
        a = java.util.Arrays.copyOf(a, c)
        b = java.util.Arrays.copyOf(b, c)
      }
    }
    def append(q: Int, v: Long, x: Double, y: Double): Int = {
      ensure(1)
      qids(n) = q; vids(n) = v; a(n) = x; b(n) = y; n += 1
      n - 1
    }
  }

  /** Growable parallel (long, double, double) column store. */
  final class Rows3(initCap: Int) {
    var keys = new Array[Long](math.max(16, initCap))
    var a = new Array[Double](keys.length)
    var b = new Array[Double](keys.length)
    var n = 0
    def ensure(extra: Int): Unit = {
      if (n + extra > keys.length) {
        var c = keys.length
        while (c < n + extra) c <<= 1
        keys = java.util.Arrays.copyOf(keys, c)
        a = java.util.Arrays.copyOf(a, c)
        b = java.util.Arrays.copyOf(b, c)
      }
    }
    def append(k: Long, x: Double, y: Double): Int = {
      ensure(1)
      keys(n) = k; a(n) = x; b(n) = y; n += 1
      n - 1
    }
  }
}
