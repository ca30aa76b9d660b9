package graft.operators.clustering

/** Driver-side Ward agglomerative linkage (O-52) over KMeans micro-cluster
  * centroids — the twin of `scipy.cluster.hierarchy.linkage(method='ward')`
  * + `to_tree` at clustering/graph_creator.py:192-194.
  *
  * Deliberately driver-local: the reference bounds the input to ≤800
  * micro-clusters (settings.py max_nodes, graph_creator.py:179-184), so
  * 800×~100 doubles is trivia for one machine while the O(n²·steps)
  * nearest-pair scan would be silly to distribute. This mirrors the
  * reference's own two-level scalability design: distributed KMeans
  * coarsening first, tiny exact hierarchical pass second (SURVEY.md §4).
  *
  * Ward distance via the closed centroid form (equivalent to the
  * Lance–Williams recurrence scipy uses):
  *   d(A,B) = sqrt( 2·|A|·|B| / (|A|+|B|) ) · ‖c_A − c_B‖₂
  * which for singletons reduces to the Euclidean distance, matching
  * scipy's initialization. Merge heights are non-decreasing; ties break
  * on the smaller cluster id for determinism.
  */
object Ward {

  /** Dendrogram node. Leaves carry the micro-cluster id in [0, n). */
  sealed trait Dendro {
    def size: Int
    def dist: Double
    def leaves: Seq[Int]
  }
  final case class Leaf(id: Int) extends Dendro {
    val size = 1
    val dist = 0.0
    def leaves: Seq[Int] = Seq(id)
  }
  final case class Merge(left: Dendro, right: Dendro, dist: Double, size: Int) extends Dendro {
    def leaves: Seq[Int] = left.leaves ++ right.leaves
  }

  /** One merge of the linkage sequence: at `step` (1-based), clusters in
    * slots `slotA` < `slotB` merged at height `dist` into `size` members
    * (slots are original centroid indices; the merged cluster keeps
    * slotA). The trace IS the dendrogram in flat form — and it is what
    * the q_ward_dendrogram oracle replays step by step (r13).
    */
  final case class MergeStep(step: Int, slotA: Int, slotB: Int,
      dist: Double, size: Int)

  def linkage(points: Array[Array[Double]]): Dendro = linkageTrace(points)._1

  /** Linkage + the merge trace (see [[MergeStep]]). */
  def linkageTrace(points: Array[Array[Double]]): (Dendro, Seq[MergeStep]) = {
    require(points.nonEmpty, "ward: empty input")
    val n = points.length
    if (n == 1) return (Leaf(0), Seq.empty)
    val dim = points(0).length
    val steps = Seq.newBuilder[MergeStep]
    var stepNo = 0

    // active clusters: centroid, member-count, tree
    val cent = Array.tabulate(n)(i => points(i).clone())
    val csize = Array.fill(n)(1)
    val tree = Array.tabulate[Dendro](n)(Leaf(_))
    val alive = Array.fill(n)(true)
    var remaining = n

    def d2(i: Int, j: Int): Double = {
      var s = 0.0
      var k = 0
      while (k < dim) { val t = cent(i)(k) - cent(j)(k); s += t * t; k += 1 }
      2.0 * csize(i) * csize(j) / (csize(i) + csize(j)) * s
    }

    while (remaining > 1) {
      // exact nearest pair scan — O(n²) per merge, n ≤ 800 by contract
      var bi = -1; var bj = -1; var best = Double.MaxValue
      var i = 0
      while (i < n) {
        if (alive(i)) {
          var j = i + 1
          while (j < n) {
            if (alive(j)) {
              val d = d2(i, j)
              if (d < best) { best = d; bi = i; bj = j }
            }
            j += 1
          }
        }
        i += 1
      }
      val merged = Merge(tree(bi), tree(bj), math.sqrt(best), csize(bi) + csize(bj))
      stepNo += 1
      steps += MergeStep(stepNo, bi, bj, math.sqrt(best), csize(bi) + csize(bj))
      // weighted centroid of the merge replaces slot bi; bj dies
      val wl = csize(bi).toDouble; val wr = csize(bj).toDouble
      var k = 0
      while (k < dim) {
        cent(bi)(k) = (cent(bi)(k) * wl + cent(bj)(k) * wr) / (wl + wr)
        k += 1
      }
      csize(bi) += csize(bj)
      tree(bi) = merged
      alive(bj) = false
      remaining -= 1
    }
    (tree(alive.indexOf(true)), steps.result())
  }
}
