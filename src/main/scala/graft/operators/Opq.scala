package graft.operators

/** Structured orthogonal rotation for product quantization — the
  * random-rotation member of the OPQ family (Ge et al. 2013,
  * "Optimized Product Quantization", whose OPQ-RR baseline rotates
  * with a random orthogonal R and re-fits the codebooks on rotated
  * data; FAISS exposes it as `OPQ` pre-transforms). PQ quantizes each
  * subspace independently, so correlated or unevenly-scaled dims
  * waste codewords; rotating first spreads energy evenly across
  * subspaces.
  *
  * R = H·D: H the normalized Walsh–Hadamard matrix
  * (H[i][j] = (−1)^popcount(i AND j) / √dim) and D a diagonal of
  * seeded ±1 signs — the Ailon–Chazelle FJLT structure. Chosen over a
  * Gram-Schmidt-of-hashes construction deliberately: H·D is exactly
  * orthogonal BY CONSTRUCTION (no FP drift to pin down) and
  * CLOSED-FORM, so the DuckDB oracle replays the entire rotation with
  * `bit_count(i & j)` + one ordered `list_dot_product` per output dim
  * — where Gram-Schmidt would need a dim-step sequential
  * orthogonalization chain no flat SQL replays. Signs come from the
  * engine-portable md5 convention (first 8 hex chars as an integer,
  * parity), the same hash bridge every other cross-engine kernel here
  * uses. At production scale H·D also applies in O(d·log d) via the
  * fast Walsh–Hadamard transform; the kernel here is the O(d²)
  * matvec ([[graft.functions.exprs.mat_vec_f]]), ample at dim 64.
  *
  * With dim an EVEN power of two (64 here), 1/√dim = 2^-k, so every
  * entry of R is exactly representable in binary floating point and
  * each row·rowᵀ dot is a sum of ±1/dim terms whose partial sums
  * (multiples of 2^-2k up to 1) are also exact — R·Rᵀ = I holds
  * BIT-EXACTLY (OpqSpec pins equality, not tolerance).
  */
object Opq {

  /** Seeded ±1 sign for dim `j`: parity of the first 8 md5 hex chars
    * of "seed:j" — replayed in SQL as
    * `CAST(('0x' || substr(md5(seed || ':' || j), 1, 8)) AS BIGINT) % 2`.
    */
  def sign(seed: String, j: Int): Float = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$seed:$j".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1.0f else -1.0f
  }

  /** The dim×dim rotation rows, R[i][j] = (−1)^popcount(i&j)·s_j/√dim.
    * `dim` must be a power of two (Hadamard orders).
    */
  def rotation(dim: Int, seed: String): Array[Array[Float]] = {
    require(dim > 0 && (dim & (dim - 1)) == 0, s"dim $dim is not a power of two")
    val scale = (1.0 / math.sqrt(dim.toDouble)).toFloat // exact 2^-k when dim = 4^k
    val sg = Array.tabulate(dim)(sign(seed, _))
    Array.tabulate(dim)(i => Array.tabulate(dim) { j =>
      val h = if (java.lang.Integer.bitCount(i & j) % 2 == 0) 1.0f else -1.0f
      h * sg(j) * scale
    })
  }

  /** Driver-side mirror of the [[graft.functions.exprs.mat_vec_f]]
    * kernel: y_i = float(Σ_j R[i][j]·x_j), double accumulation in j
    * order — the same values the corpus-side rotation produces, used
    * to rotate driver-resident model vectors (centroids, codebook
    * seeds, probe queries) without a Spark job.
    */
  def rotateVec(v: Array[Float], rows: Array[Array[Float]]): Array[Float] = {
    require(v.length == rows(0).length,
      s"vector has ${v.length} dims, rotation expects ${rows(0).length}")
    Array.tabulate(rows.length) { i =>
      val r = rows(i)
      var s = 0.0
      var j = 0
      while (j < r.length) { s += r(j).toDouble * v(j).toDouble; j += 1 }
      s.toFloat
    }
  }
}
