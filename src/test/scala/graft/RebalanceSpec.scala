package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.clustering.TreeOps
import graft.operators.clustering.TreeOps.TNode

/** Pins the equivalence the q_graph_build / q_e1_pipeline oracles rely
  * on (r14): on MONOTONE trees (parent merge distance ≥ children's —
  * the Ward guarantee), the reference's sweep-loop rebalance
  * ([[TreeOps.rebalance]]) equals the per-edge characterization the
  * DuckDB replay implements (GraphQueries.rebalanceReplaySql):
  * a node is dissolved iff it has children, original depth < maxDepth,
  * and dist/(originalParent.dist + 1e-9) > ratio; survivors keep
  * original-preorder order. If either side's semantics drift, this
  * fails before the oracle hash does.
  */
class RebalanceSpec extends AnyFunSuite {

  /** The per-edge rule, as a direct Scala rendering of the SQL replay. */
  private def replay(root: TNode, maxDepth: Int = 5, ratio: Double = 0.65): TNode = {
    def rebuild(n: TNode, depth: Int): TNode =
      if (n.children.isEmpty || depth >= maxDepth) n.copy(tpe = "leaf", children = Nil)
      else n.copy(children = finalKids(n, depth))
    def finalKids(p: TNode, pd: Int): Seq[TNode] = p.children.flatMap { c =>
      val dissolved = c.children.nonEmpty && (pd + 1) < maxDepth &&
        c.distance / (p.distance + 1e-9) > ratio
      if (dissolved) finalKids(c, pd + 1) else Seq(rebuild(c, pd + 1))
    }
    rebuild(root, 0)
  }

  /** Random monotone binary tree: children built first, the parent's
    * distance is ≥ both children's (×1.0–2.0 of the max), counts roll
    * up — the shape fromDendro produces from any monotone linkage.
    */
  private def genTree(rng: scala.util.Random, maxLeaves: Int): TNode = {
    var nextId = -1
    def leaf(): TNode = {
      nextId += 1
      TNode("leaf", Seq(nextId), 1L + rng.nextInt(5), 0.0, Nil)
    }
    def build(budget: Int): TNode =
      if (budget <= 1 || rng.nextDouble() < 0.15) leaf()
      else {
        val lb = 1 + rng.nextInt(budget - 1)
        val l = build(lb)
        val r = build(budget - lb)
        val base = math.max(l.distance, r.distance)
        // strictly-greater parent height; occasionally land right in the
        // ratio-boundary region so both branches of the > 0.65 test fire
        val d = math.max(base, 1e-3) * (1.0 + rng.nextDouble())
        TNode("node", l.clusters ++ r.clusters, l.count + r.count, d, Seq(l, r))
      }
    build(2 + rng.nextInt(maxLeaves - 1))
  }

  test("sweep-loop rebalance == per-edge replay rule on random monotone trees") {
    val rng = new scala.util.Random(414)
    for (i <- 1 to 300) {
      val t = genTree(rng, 64)
      val loop = TreeOps.rebalance(t)
      val rule = replay(t)
      assert(loop === rule, s"divergence on random tree #$i")
    }
  }

  test("deep trees: nodes past maxDepth vanish, depth-boundary nodes leafify") {
    // a left-spine of depth 8 — every node's ratio ~1/(1+eps) > 0.65 so
    // everything dissolves where allowed; the interesting part is the
    // depth cutoff, which both sides must apply at ORIGINAL depth
    def spine(d: Int): TNode =
      if (d == 0) TNode("leaf", Seq(d), 1L, 0.0, Nil)
      else TNode("node", (0 to d).map(identity), d + 1L, d * 1.0,
        Seq(spine(d - 1), TNode("leaf", Seq(100 + d), 1L, 0.0, Nil)))
    val t = spine(8)
    assert(TreeOps.rebalance(t) === replay(t))
    // and with dissolution suppressed (ratio just under the bar):
    def flatSpine(d: Int): TNode =
      if (d == 0) TNode("leaf", Seq(d), 1L, 0.0, Nil)
      else TNode("node", (0 to d).map(identity), d + 1L, math.pow(2.0, d),
        Seq(flatSpine(d - 1), TNode("leaf", Seq(100 + d), 1L, 0.0, Nil)))
    val t2 = flatSpine(8)
    assert(TreeOps.rebalance(t2) === replay(t2))
  }

  test("preorder export carries the fields the replay needs") {
    val rng = new scala.util.Random(7)
    val t = genTree(rng, 32)
    val rows = TreeOps.preorder(t)
    assert(rows.head.pre_id === 1L && rows.head.parent_id === 0L)
    assert(rows.map(_.pre_id) === (1L to rows.size.toLong))
    // parent always precedes child in preorder; depths are parent+1
    val byId = rows.map(r => r.pre_id -> r).toMap
    rows.filter(_.parent_id != 0L).foreach { r =>
      assert(r.parent_id < r.pre_id)
      assert(byId(r.parent_id).depth === r.depth - 1)
      assert(!byId(r.parent_id).is_leaf)
    }
    // member counts roll up: root count = Σ leaf counts
    assert(rows.head.cnt === rows.filter(_.is_leaf).map(_.cnt).sum)
  }
}
