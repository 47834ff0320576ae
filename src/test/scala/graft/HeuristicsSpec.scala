package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.index.Heuristics

/** Golden values lifted from the reference's unit suite
  * (tests/unit/test_utils.py) — exact parity for every pure heuristic.
  */
class HeuristicsSpec extends AnyFunSuite {

  test("num clusters: 0.2·n^0.75 golden values") {
    assert(Heuristics.numClusters(10000) == 200)
    assert(Heuristics.numClusters(1000000) == 6324)
    assert(Heuristics.numClusters(100000000) == 200000)
  }

  test("nprobe piecewise golden values") {
    assert(Heuristics.nProbe(200) == 100)
    assert(Heuristics.nProbe(1000) == 250)
    assert(Heuristics.nProbe(6350) == 444)
    assert(Heuristics.nProbe(200000) == 6000)
  }

  test("training memory model") {
    assert(Heuristics.trainingMemoryUsage(768, 100000) == 921600000L)
  }

  test("num batches") {
    assert(Heuristics.numBatches(1000000, 768, 4L * 1024 * 1024 * 1024) == 3)
  }

  test("strategy chooser: 5M→two-level, 1M→subsample @768d/4GB") {
    val mem = 4L * 1024 * 1024 * 1024
    assert(Heuristics.isTwoLevelClusteringOptimal(mem, 768, 5000000))
    assert(!Heuristics.isTwoLevelClusteringOptimal(mem, 768, 1000000))
  }

  test("coverage ratio cases") {
    assert(Heuristics.coverageRatio(100000, 0, 0) == 1.0)
    assert(Heuristics.coverageRatio(100000, 100000, 0) == 0.5)
    assert(Heuristics.coverageRatio(0, 100000, 0) == 0.0)
    assert(Heuristics.coverageRatio(100000, 0, 50000) == 0.5)
    assert(Heuristics.coverageRatio(100000, 60000, 20000) == 0.5)
  }

  test("per-dimension defaults") {
    assert(Heuristics.defaultIndexParams(64).pcaDimension == 64)
    assert(Heuristics.defaultIndexParams(64).compressedVectorBytes == 16)
    assert(Heuristics.defaultIndexParams(384).pcaDimension == 256)
    assert(Heuristics.defaultIndexParams(768).compressedVectorBytes == 32)
    assert(Heuristics.defaultIndexParams(1536).pcaDimension == 512)
    assert(Heuristics.defaultIndexParams(3072).pcaDimension == 1024)
  }

  test("training triggers") {
    assert(!Heuristics.needsInitialTraining(10000, isFlatIndex = true, trainingInProgress = false))
    assert(Heuristics.needsInitialTraining(25000, isFlatIndex = true, trainingInProgress = false))
    assert(!Heuristics.needsInitialTraining(25000, isFlatIndex = false, trainingInProgress = false))
    assert(!Heuristics.needsInitialTraining(25000, isFlatIndex = true, trainingInProgress = true))
    assert(Heuristics.needsRetraining(30000, 0.4, trainingInProgress = false))
    assert(!Heuristics.needsRetraining(30000, 0.6, trainingInProgress = false))
  }
}
