package graft.operators.clustering

/** Cluster-tree conversion, rebalance (O-53), and relational flattening —
  * the driver-local tree rewrites of clustering/graph_creator.py:162-281
  * and the deterministic replacement for the reference's DB-serial id
  * scheme (db/repositories/graph_repo.py:75-84).
  */
object TreeOps {

  /** The dict-tree of graph_creator.py:215-234: type ∈ {node, leaf},
    * member micro-cluster ids, movie count, merge distance, children.
    */
  final case class TNode(
      tpe: String,
      clusters: Seq[Int],
      count: Long,
      distance: Double,
      children: Seq[TNode])

  /** `_convert_tree` (graph_creator.py:211-234): dendrogram → dict tree;
    * leaves carry their micro-cluster members; node counts roll up.
    */
  def fromDendro(d: Ward.Dendro, clusterSizes: Map[Int, Long]): TNode = d match {
    case Ward.Leaf(id) =>
      TNode("leaf", Seq(id), clusterSizes.getOrElse(id, 0L), 0.0, Nil)
    case Ward.Merge(l, r, dist, _) =>
      val lc = fromDendro(l, clusterSizes)
      val rc = fromDendro(r, clusterSizes)
      TNode("node", lc.clusters ++ rc.clusters, lc.count + rc.count, dist, Seq(lc, rc))
  }

  /** `_rebalance_tree` (graph_creator.py:237-281), semantics preserved:
    *  - at depth ≥ maxDepth (or no children) the node becomes a leaf;
    *  - children are rebalanced first (bottom-up);
    *  - while fanout < maxFanout, a child NODE whose
    *    distance/parent.distance ratio exceeds `ratio` is dissolved into
    *    its children (one sweep per iteration, repeat until no change).
    */
  def rebalance(node: TNode, depth: Int = 0, maxDepth: Int = 5,
      maxFanout: Int = 8, ratio: Double = 0.65): TNode = {
    if (node.children.isEmpty || depth >= maxDepth)
      return node.copy(tpe = "leaf", children = Nil)

    var children = node.children.map(rebalance(_, depth + 1, maxDepth, maxFanout, ratio))
    var changed = true
    while (changed && children.size < maxFanout) {
      changed = false
      children = children.flatMap { child =>
        if (child.tpe == "node" &&
            child.distance / (node.distance + 1e-9) > ratio) {
          changed = true
          child.children
        } else Seq(child)
      }
    }
    node.copy(children = children)
  }

  /** One PRE-rebalance tree row for the q_graph_build oracle export
    * (r14): preorder index (root = 1), parent's preorder index (0 for
    * the root), ORIGINAL depth, merge distance, rolled-up member count,
    * and whether the node is an original dendrogram leaf. Given these
    * rows, the rebalance + flatten output is replayable relational
    * logic (see [[preorder]]).
    */
  final case class PreRow(pre_id: Long, parent_id: Long, depth: Long,
      dist: Double, cnt: Long, is_leaf: Boolean)

  /** DFS-preorder dump of the pre-rebalance tree — the oracle-side
    * input for replaying [[rebalance]]+[[flatten]] in SQL.
    *
    * Why the replay is possible without simulating the sweep loop: Ward
    * linkage heights are monotone (parent merge distance ≥ child's), so
    * a child pulled up by a dissolution can never re-qualify against
    * the higher ancestor (its ratio only shrinks). The fixpoint
    * therefore collapses to per-edge predicates on THIS tree:
    *   - a node VANISHES iff original depth ≥ maxDepth+1 (an ancestor
    *     was leaf-ified before any dissolution could reach it);
    *   - a node is DISSOLVED iff it has children, its original depth <
    *     maxDepth, and dist/(parent.dist+1e-9) > ratio — checked against
    *     the ORIGINAL parent only, because that is whose child list it
    *     sits in when swept (later re-sweeps against higher ancestors
    *     can't fire, per the monotonicity argument);
    *   - survivors keep original-preorder order (in-place splicing), so
    *     flatten ids = preorder rank among survivors, and the final
    *     parent is the nearest non-dissolved proper ancestor.
    * The binary dendrogram always enters the sweep (2 < maxFanout) and
    * one sweep suffices, so the fanout cap never binds on monotone
    * input. `RebalanceSpec` pins loop ≡ per-edge-rule on random
    * monotone trees; the oracle hash re-checks it on every real build.
    */
  def preorder(root: TNode): Seq[PreRow] = {
    val out = Seq.newBuilder[PreRow]
    var next = 0L
    def walk(n: TNode, parent: Long, depth: Int): Unit = {
      next += 1
      val id = next
      out += PreRow(id, parent, depth.toLong, n.distance, n.count, n.children.isEmpty)
      n.children.foreach(walk(_, id, depth + 1))
    }
    walk(root, 0L, 0)
    out.result()
  }

  /** One flattened graph row (D6 `graph` table, SURVEY.md §1). */
  final case class GraphRow(
      id: Long, path: String, name: String, tpe: String,
      children_count: Int, depth: Int, count: Long, distance: Double)

  /** DFS-preorder flattening with deterministic ids: root = 1, children
    * numbered in traversal order — replaces the reference's two-phase
    * "flush for a serial id, then fix the path" trick (graph_repo.py:75-84)
    * with reproducible arithmetic. Node names come from the pluggable
    * [[Naming.Namer]] via the validate→retry(≤5)→fallback loop
    * (clustering/utils.py:76-130); the default [[Naming.DeterministicNamer]]
    * yields the reference's fallback scheme `{parent}_Subgroup_{i}`
    * (clustering/utils.py:130), so default builds are reproducible. The
    * root is 'All movies' (graph_repo.py:40-44).
    *
    * Returns (graph rows, micro-cluster → owning-leaf-node id).
    */
  def flatten(root: TNode,
      namer: Naming.Namer = Naming.DeterministicNamer): (Seq[GraphRow], Map[Int, Long]) = {
    val rows = Seq.newBuilder[GraphRow]
    val assign = Map.newBuilder[Int, Long]
    var nextId = 0L

    def walk(n: TNode, parentPath: String, name: String, depth: Int): Unit = {
      nextId += 1
      val id = nextId
      val path = if (parentPath.isEmpty) "root" else s"$parentPath.$id"
      rows += GraphRow(id, path, name, if (n.children.isEmpty) "leaf" else n.tpe,
        n.children.size, depth, n.count, n.distance)
      if (n.children.isEmpty) n.clusters.foreach(c => assign += c -> id)
      if (n.children.nonEmpty) {
        val groups = n.children.map(c =>
          Naming.NamingGroup(c.clusters.map(i => s"cluster_$i"), f"${c.distance}%.4f"))
        val names = Naming.nameChildren(name, groups, namer)
        n.children.lazyZip(names).foreach((c, nm) => walk(c, path, nm, depth + 1))
      }
    }
    walk(root, "", "All movies", 0)
    (rows.result(), assign.result())
  }
}
