package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for all suites (one JVM, Test/fork=true). */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.local(4)
}

trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = TestSpark.spark
}

/** Dense in-driver oracles (SURVEY.md §5.2 item 2) — plain-array power
  * iteration to 1e-14; semantics pinned to the engine's conventions. */
object DenseOracle {

  /** PPR with the engine's pinned conventions: teleport α to source;
    * dangling vertices absorb (self-loop semantics).
    * Fixed point of p = α·e_s + (1−α)·P'ᵀp, P' = P + self-loops at
    * dangling rows. */
  def pprFix(n: Int, edges: Seq[(Int, Int)], source: Int, alpha: Double,
             iters: Int = 3000): Array[Double] = {
    val adj = Array.fill(n)(Vector.empty[Int])
    edges.foreach { case (u, v) => adj(u) = adj(u) :+ v }
    var p = Array.tabulate(n)(i => if (i == source) 1.0 else 0.0)
    var k = 0
    while (k < iters) {
      val next = new Array[Double](n)
      var u = 0
      while (u < n) {
        if (adj(u).isEmpty) next(u) += p(u) // dangling self-loop
        else { val w = p(u) / adj(u).size; adj(u).foreach(v => next(v) += w) }
        u += 1
      }
      var t = 0
      while (t < n) { next(t) *= (1 - alpha); t += 1 }
      next(source) += alpha
      p = next
      k += 1
    }
    p
  }

  /** Global PageRank: uniform teleport, dangling mass uniform. */
  def pageRank(n: Int, edges: Seq[(Int, Int)], damping: Double,
               iters: Int = 3000): Array[Double] = {
    val adj = Array.fill(n)(Vector.empty[Int])
    edges.foreach { case (u, v) => adj(u) = adj(u) :+ v }
    var p = Array.fill(n)(1.0 / n)
    var k = 0
    while (k < iters) {
      val next = new Array[Double](n)
      var dangling = 0.0
      var u = 0
      while (u < n) {
        if (adj(u).isEmpty) dangling += p(u)
        else { val w = p(u) / adj(u).size; adj(u).foreach(v => next(v) += w) }
        u += 1
      }
      var t = 0
      while (t < n) {
        next(t) = (1 - damping) / n + damping * (next(t) + dangling / n)
        t += 1
      }
      p = next
      k += 1
    }
    p
  }
}

/** Hand graphs with known answers (FIXTURES.md §2). */
object HandGraphs {
  val triangle3: Seq[(Int, Int)] = Seq((0, 1), (1, 2), (2, 0))
  val triangle3Sym: Seq[(Int, Int)] =
    Seq((0, 1), (1, 0), (1, 2), (2, 1), (2, 0), (0, 2))
  /** hub 0 ↔ leaves 1..4 */
  val star5: Seq[(Int, Int)] =
    (1 to 4).flatMap(i => Seq((0, i), (i, 0)))
  /** 0→1→2→3, 3 dangling */
  val chain4: Seq[(Int, Int)] = Seq((0, 1), (1, 2), (2, 3))
  /** {0,1,2} cycle ∪ {3,4} pair */
  val twocomp: Seq[(Int, Int)] = Seq((0, 1), (1, 2), (2, 0), (3, 4), (4, 3))
  /** K6 directed both ways */
  val complete6: Seq[(Int, Int)] =
    (0 until 6).flatMap(i => (0 until 6).collect { case j if j != i => (i, j) })
}
