package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class GraphOpsSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def cc(edges: Seq[(Long, Long)], maxIter: Int = 25): Map[Long, Long] = {
    import spark.implicits._
    GraphOps.connectedComponents(edges.toDF("a", "b"), maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("a 6-node chain needs multiple propagation rounds and still labels everyone with the min") {
    // diameter 5: strictly more rounds than a star, exercises the loop
    val labels = cc(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)))
    labels shouldBe (1L to 6L).map(_ -> 1L).toMap
  }

  test("disjoint components keep distinct minimum labels; cycles terminate") {
    val labels = cc(Seq(
      (10L, 11L), (11L, 12L), (12L, 10L), // triangle (cycle)
      (7L, 20L),                          // pair bridging id ranges
      (30L, 31L)))
    labels shouldBe Map(
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      7L -> 7L, 20L -> 7L,
      30L -> 30L, 31L -> 30L)
  }

  test("duplicate and reversed edges do not change the fixpoint") {
    val labels = cc(Seq((2L, 1L), (1L, 2L), (2L, 3L), (3L, 2L), (2L, 3L)))
    labels shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L)
  }

  test("empty edge list yields an empty labeling") {
    cc(Seq.empty) shouldBe Map.empty
  }

  test("a diameter far past maxIter routes to star contraction and stays exact (path fast path)") {
    // 300-node chain: propagation alone would blow the default 25-round
    // budget (pre-escalation this threw); the path-shape probe (forest-
    // sparse, max degree 2) hands it to star contraction before the loop
    val chain = (1L until 300L).map(i => (i, i + 1))
    cc(chain) shouldBe (1L to 300L).map(_ -> 1L).toMap
    GraphOps.lastRoute.get() shouldBe "star-direct"
  }

  test("a long CYCLE converges on jumped propagation in O(log diameter) rounds") {
    // 300-node cycle: sym edges = 2*nodes defeats the forest-sparsity
    // probe, so propagation runs — diameter 150 used to stall it at the
    // escalation threshold; pointer jumping doubles every label's reach
    // per round, so it must now converge WITHIN the threshold, in
    // ~log2(150) rounds (one extra no-change round detects the fixpoint)
    val cycle = (0L until 300L).map(i => (i, (i + 1) % 300L))
    cc(cycle) shouldBe (0L until 300L).map(_ -> 0L).toMap
    GraphOps.lastRoute.get() shouldBe "propagation"
    GraphOps.lastRounds.get() should be <= 10
  }

  test("an exhausted loop budget still escalates MID-LOOP to star contraction and stays exact") {
    // jumping makes natural escalation unreachable (log2(diameter) always
    // beats 2*log2(edges)), but the mid-loop strategy switch remains the
    // safety net for an explicit too-small maxIter — force it and pin
    // both the route and exactness
    val cycle = (0L until 300L).map(i => (i, (i + 1) % 300L))
    cc(cycle, maxIter = 3) shouldBe (0L until 300L).map(_ -> 0L).toMap
    GraphOps.lastRoute.get() shouldBe "star-escalated"
  }

  test("negative node ids stay on propagation (no star route) and label exactly") {
    // the star potential requires non-negative ids; jumped propagation
    // has no such precondition — a negative-id path graph must neither
    // throw nor route to a star stage (ADVICE r11)
    val path = Seq((-5L, -4L), (-4L, -3L), (-3L, 7L), (7L, 8L))
    cc(path) shouldBe Map(-5L -> -5L, -4L -> -5L, -3L -> -5L, 7L -> -5L, 8L -> -5L)
    GraphOps.lastRoute.get() shouldBe "propagation"
  }

  test("star/pair forests stay on the propagation path (the d25/d51 shape is NOT path-routed)") {
    // a star forest is forest-sparse but has a degree-5 hub — the
    // path-shape probe must keep it on propagation, which converges on
    // the fused first round (this pin is the measured 2.1->5.4s d25
    // regression guard: routing shallow forests to star contraction
    // costs log-n rounds where propagation needs one)
    val stars = (1L to 5L).map(i => (0L, i)) ++ (10L to 12L).map(i => (9L, i))
    cc(stars) shouldBe
      ((0L to 5L).map(_ -> 0L) ++ (9L to 12L).map(_ -> 9L)).toMap
    GraphOps.lastRoute.get() shouldBe "propagation"
  }

  private def ccStar(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    GraphOps.connectedComponentsStar(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("large-star/small-star agrees with propagation on a long chain (its worst case)") {
    // diameter 19: propagation needs ~19 rounds, star contraction O(log n)
    val chain = (1L until 20L).map(i => (i, i + 1))
    ccStar(chain) shouldBe cc(chain)
    ccStar(chain) shouldBe (1L to 20L).map(_ -> 1L).toMap
  }

  test("large-star/small-star agrees with propagation on cycles, bridges and duplicates") {
    val edges = Seq(
      (10L, 11L), (11L, 12L), (12L, 10L), // triangle
      (7L, 20L), (20L, 7L), (7L, 20L),    // duplicated + reversed pair
      (30L, 31L), (31L, 32L), (32L, 33L), // path
      (0L, 40L))                          // min-id zero endpoint
    ccStar(edges) shouldBe cc(edges)
  }

  test("self-loop-only nodes keep a row in both implementations") {
    val edges = Seq((5L, 5L), (1L, 2L))
    val expected = Map(5L -> 5L, 1L -> 1L, 2L -> 1L)
    cc(edges) shouldBe expected
    ccStar(edges) shouldBe expected
  }

  test("large-star/small-star agrees with propagation on a pseudo-random graph") {
    // deterministic LCG edge set: multiple mid-size components with
    // nontrivial structure (no fixture dependence, no RNG nondeterminism)
    var x = 12345L
    def next(): Long = { x = (x * 6364136223846793005L + 1442695040888963407L) >>> 1; x }
    val edges = (1 to 120).map { _ =>
      val a = next() % 60; val b = next() % 60
      (a, b)
    }.filter { case (a, b) => a != b }
    ccStar(edges) shouldBe cc(edges)
  }

  test("star contraction on the empty graph is empty") {
    ccStar(Seq.empty) shouldBe Map.empty
  }

  test("star contraction rejects negative node ids (convergence-check precondition)") {
    import spark.implicits._
    val ex = intercept[IllegalArgumentException] {
      GraphOps.connectedComponentsStar(Seq((-1L, 2L), (2L, 3L)).toDF("x", "y"))
    }
    assert(ex.getMessage.contains("non-negative"))
  }

  test("star contraction accepts non-Long numeric id columns (Int ids)") {
    // the fused stats pass reads min(a) through a decimal cast — a raw
    // getLong here was a ClassCastException on Int-typed edge lists,
    // which the pre-fusion probe accepted
    import spark.implicits._
    val out = GraphOps.connectedComponentsStar(
        Seq((1, 2), (2, 3), (5, 6)).toDF("x", "y"))
      .collect().map(r => (r.get(0).toString.toLong, r.get(1).toString.toLong)).toMap
    out shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L)
  }
}
