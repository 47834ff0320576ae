package graft.index

/** M8 — index memory estimator, exact parity with the reference's
  * `estimate_memory_usage` (cache/cache.py:105-138): drives LRU cache
  * eviction decisions and the info endpoint.
  */
object MemoryModel {

  /** Bytes for an empty (never-added) database. */
  val EmptyDbBytes = 48L

  /** Flat index: `n·d·4 + 240090` (cache.py:118). */
  def flatIndexBytes(nTotal: Long, vectorDimension: Int): Long =
    nTotal * vectorDimension * 4L + 240090L

  /** Trained index: `n·(pqBytes+8) + const(d)` (cache.py:122-137). */
  def trainedIndexBytes(nTotal: Long, vectorDimension: Int,
                        compressedVectorBytes: Int): Long = {
    val constant = vectorDimension match {
      case 256 => 1479168L
      case 512 => 2529792L
      case 768 => 4104704L
      case 1024 => 6203904L
      case d => d * 4092L
    }
    nTotal * (compressedVectorBytes + 8L) + constant
  }

  def estimate(hasVectors: Boolean, isTrained: Boolean, nTotal: Long,
               vectorDimension: Int, compressedVectorBytes: Int): Long =
    if (!hasVectors) EmptyDbBytes
    else if (!isTrained) flatIndexBytes(nTotal, vectorDimension)
    else trainedIndexBytes(nTotal, vectorDimension, compressedVectorBytes)
}
