package graft.similarity

/** Eigenvalue-allocation helpers for OPQ (Ge et al., CVPR 2013) — the
  * parametric variant's core mechanism as a variance-balancing
  * PERMUTATION (an orthogonal transform restricted to axis
  * relabeling): sort dimensions by variance, deal serpentine across
  * subspaces so every subspace receives one dim from each variance
  * octile. Deterministic (ties break to the lower dim index) and
  * integer-exact, so a SQL oracle replays it with one rank window.
  *
  * On ISOTROPIC data (equal per-dim variances) the allocation is a
  * no-op by design — the win appears exactly when variance
  * concentrates, which is what OpqSpec constructs and measures.
  */
object Opq {

  /** Permutation from fixed-point per-dim variances: position
    * `m * subDims + slot` of the rotated vector reads original dim
    * `perm(m * subDims + slot)`. Input: (dim index, variance in any
    * consistent fixed point).
    */
  def allocation(variances: Seq[(Int, Long)], subspaces: Int,
      subDims: Int): Array[Int] = {
    val d = subspaces * subDims
    require(variances.length == d,
      s"allocation needs $d per-dim variances, got ${variances.length}")
    val ranked = variances.sortBy { case (i, c) => (-c, i) }
    val perm = Array.ofDim[Int](d)
    ranked.zipWithIndex.foreach { case ((dim, _), r) =>
      val block = r / subspaces
      val idx = r % subspaces
      val m = if (block % 2 == 0) idx else subspaces - 1 - idx
      perm(m * subDims + block) = dim
    }
    perm
  }
}
