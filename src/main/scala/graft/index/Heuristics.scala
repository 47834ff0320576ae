package graft.index

/** Index-sizing and lifecycle heuristics.
  *
  * Behavioral parity with the reference's pure functions (minDB
  * utils/training_utils.py:5-32 nlist/nprobe, :58-88 memory models &
  * strategy chooser, :90-129 per-dimension defaults, :131-145 coverage
  * ratio; train/training_params.py:1-8 global defaults). Golden values from
  * the reference's unit tests (tests/unit/test_utils.py) are asserted in
  * HeuristicsSpec.
  */
object Heuristics {

  /** IVF cluster count: `0.2 · n^0.75` (training_utils.py:5-9). */
  def numClusters(numVectors: Long): Int =
    (math.pow(numVectors.toDouble, 0.75) * 0.2).toInt

  /** nprobe: piecewise-linear factor in log(nlist) through the anchor
    * points (200, 0.5), (1000, 0.25), (6350, 0.07), (200000, 0.03)
    * (training_utils.py:11-32).
    */
  def nProbe(numClusters: Int): Int = {
    val xs = Array(math.log(200), math.log(1000), math.log(6350), math.log(200000))
    val ys = Array(0.5, 0.25, 0.07, 0.03)
    val x = math.log(numClusters.toDouble)
    val factor =
      if (x <= xs(0)) ys(0)
      else if (x >= xs(3)) ys(3)
      else {
        val i = xs.lastIndexWhere(_ < x) // x in (xs(i), xs(i+1)]
        ys(i) + (ys(i + 1) - ys(i)) * (x - xs(i)) / (xs(i + 1) - xs(i))
      }
    (factor * numClusters).toInt
  }

  /** Training memory model: `n·d·4·3` bytes (training_utils.py:58-61). */
  def trainingMemoryUsage(vectorDimension: Int, numVectors: Long): Long =
    numVectors * vectorDimension * 4L * 3L

  /** RAM-capped batch count: `ceil(n·d·4 / (maxMem/4))`
    * (training_utils.py:63-67). Kept for parity tests only — Spark
    * partitioning replaces hand batching.
    */
  def numBatches(numVectors: Long, vectorDimension: Int, maxMemoryUsage: Long): Int =
    math.ceil(numVectors * vectorDimension * 4.0 / (maxMemoryUsage / 4.0)).toInt

  /** Vectors per RAM-capped batch (training_utils.py:69-73). */
  def numVectorsPerBatch(maxMemoryUsage: Long, vectorDimension: Int): Int =
    ((maxMemoryUsage / (vectorDimension * 4L * 3L)) / 4L).toInt

  /** Strategy chooser: two-level clustering iff subsampling would leave
    * < 39 vectors per cluster (Faiss minimum) — training_utils.py:75-88.
    */
  def isTwoLevelClusteringOptimal(maxMemoryUsage: Long, vectorDimension: Int,
                                  numVectors: Long): Boolean = {
    val mem = trainingMemoryUsage(vectorDimension, numVectors)
    val maxNumVectors = ((maxMemoryUsage.toDouble / mem) * numVectors).toLong
    val k = numClusters(numVectors)
    (maxNumVectors / k) < 39
  }

  /** Per-dimension PCA / OPQ / PQ-bytes defaults (training_utils.py:90-129).
    * Parity note: for d < 64 the reference's own `max(64, d)` default
    * yields pca > d, which its validator then rejects — we reproduce that
    * behavior exactly; callers with tiny dims pass explicit IndexParams.
    */
  def defaultIndexParams(vectorDimension: Int): IndexParams =
    if (vectorDimension < 150)
      IndexParams(math.max(64, vectorDimension), math.max(64, vectorDimension), 16)
    else if (vectorDimension < 300) IndexParams(128, 64, 16)
    else if (vectorDimension < 600) IndexParams(256, 128, 32)
    else if (vectorDimension < 1000) IndexParams(256, 128, 32)
    else if (vectorDimension < 2000) IndexParams(512, 256, 32)
    else IndexParams(1024, 512, 128)

  /** Coverage ratio `(trained - removedTrained) / (trained + new)`; 0 when
    * never trained (training_utils.py:131-145).
    */
  def coverageRatio(numVectorsTrainedOn: Long, numNewVectors: Long,
                    numTrainedVectorsRemoved: Long): Double =
    if (numVectorsTrainedOn == 0) 0.0
    else (numVectorsTrainedOn - numTrainedVectorsRemoved).toDouble /
      (numVectorsTrainedOn + numNewVectors)

  /** Train only at/above this many vectors (training_params.py:2). */
  val NumVectorTrainingCutoff = 25000

  /** Retrain when coverage drops below this (training_params.py:3). */
  val CoverageRatioCutoff = 0.5

  /** Below this, never train — flat exact search (mindb.py:276). */
  val FlatIndexFloor = 5000

  /** Warn threshold for an untrained flat index (mindb.py:180-184). */
  val FlatIndexWarnSize = 50000

  /** Global training defaults (training_params.py:5-8). */
  val DefaultTrainingParams: IndexParams = IndexParams(256, 128, 64, omitOpq = true)

  /** Initial-training trigger: n ≥ cutoff ∧ index flat ∧ not training
    * (training_utils.py:148-167).
    */
  def needsInitialTraining(numVectors: Long, isFlatIndex: Boolean,
                           trainingInProgress: Boolean): Boolean =
    numVectors >= NumVectorTrainingCutoff && isFlatIndex && !trainingInProgress

  /** Retrain trigger: n ≥ cutoff ∧ coverage ≤ cutoff ∧ not training
    * (training_utils.py:171-188).
    */
  def needsRetraining(numVectors: Long, coverageRatio: Double,
                      trainingInProgress: Boolean): Boolean =
    numVectors >= NumVectorTrainingCutoff &&
      coverageRatio <= CoverageRatioCutoff && !trainingInProgress
}

/** PCA / OPQ / PQ sizing for an index build (the "index factory" spec —
  * training_utils.py:34-56 re-expressed as data, not a Faiss string).
  */
final case class IndexParams(
    pcaDimension: Int,
    opqDimension: Int,
    compressedVectorBytes: Int,
    omitOpq: Boolean = true)
