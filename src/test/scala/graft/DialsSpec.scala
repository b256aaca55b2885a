package graft

import graft.functions.LshImpl
import org.scalatest.funsuite.AnyFunSuite

/** The corpus-derived scale-dial defaults (graft.Dials): the values the
  * mains derive once per JVM and the oracles interpolate. The `*For(n)`
  * functions ARE the production derivations (the getters delegate to
  * them), so these assertions exercise the real code path — a drifted
  * formula fails here, not just in a re-implementation of it. */
class DialsSpec extends AnyFunSuite {

  test("LSH bits: gate scales stay at the floor; 100x derives the measured-good 12; MaxBits caps") {
    assert(Dials.lshBitsFor(500L) == LshImpl.Bits)     // sf0.001 / sf0.01
    assert(Dials.lshBitsFor(2000L) == LshImpl.Bits)    // sf0.1
    assert(Dials.lshBitsFor(200000L) == 12)            // 100x stress corpus (SURVEY §5c)
    assert(Dials.lshBitsFor(20000000L) == 19.min(LshImpl.MaxBits)) // cap engages far out
    // occupancy never exceeds the target once the derivation engages
    for (n <- Seq(20000L, 200000L, 2000000L)) {
      val b = Dials.lshBitsFor(n)
      assert(b == LshImpl.MaxBits || (n.toDouble / (1L << b)) <= Dials.TargetOccupancy,
        s"occupancy ${n.toDouble / (1L << b)} exceeds target at n=$n, bits=$b")
    }
  }

  test("IVF stride: floor(sqrt(n)) keeps K within a factor of sqrt(n)") {
    assert(Dials.ivfStrideFor(500L) == 22L)
    assert(Dials.ivfStrideFor(2000L) == 44L)
    assert(Dials.ivfStrideFor(200000L) == 447L)
    // K = n/stride stays ~sqrt(n): assignment n*K is n^1.5, never n^2
    for (n <- Seq(500L, 2000L, 200000L, 20000000L)) {
      val k = n / Dials.ivfStrideFor(n)
      assert(k <= 2 * math.sqrt(n.toDouble).toLong + 1, s"K=$k too large at n=$n")
    }
  }

  test("join buckets: gate scales stay at the floor of 8; 600M rows derives 128; cap holds") {
    assert(Dials.joinBucketsFor(6000L) == 8)         // sf0.001
    assert(Dials.joinBucketsFor(600000L) == 8)       // sf0.1 — gate layouts byte-identical
    assert(Dials.joinBucketsFor(600000000L) == 128)  // the §5d 1000x tier
    assert(Dials.joinBucketsFor(600000000000L) == 1024) // cap far out
    // per-bucket rows stay within 2x of target once derivation engages
    for (n <- Seq(100000000L, 600000000L, 5000000000L)) {
      val b = Dials.joinBucketsFor(n)
      assert(b == 1024 || n.toDouble / b <= 2.0 * Dials.FactRowsPerBucket,
        s"per-bucket rows ${n / b} exceed 2x target at n=$n, buckets=$b")
    }
  }

  test("graph-ANN degree: every gate corpus derives the measured (48,6,16) floor; 100x grows ~log n") {
    // all gate corpora land on the floor -> ONE oracle unroll depth
    assert(Dials.graphDegreeFor(500L) == Dials.GraphDegreeFloor)   // sf0.001/sf0.01
    assert(Dials.graphDegreeFor(2000L) == Dials.GraphDegreeFloor)  // sf0.1: the measured 0.955 point
    assert(Dials.graphDegreeFor(200000L) == 25)                    // the 100x stress corpus
    // growth is logarithmic: 10x the corpus adds a constant ~c*log2(10)=4.7
    val d1 = Dials.graphDegreeFor(2000000L)
    val d2 = Dials.graphDegreeFor(20000000L)
    assert(d2 - d1 >= 4 && d2 - d1 <= 6, s"degree step $d1 -> $d2 not ~c*log2(10)")
    // beam keeps the measured 3x ratio off the derived degree
    if (!sys.env.contains("SPARK_GRAFT_GRAPH_DEGREE") &&
        !sys.env.contains("SPARK_GRAFT_GRAPH_BEAM") && Dials.vectorCount.isEmpty) {
      assert(Dials.graphBeam == Dials.GraphBeamFactor * Dials.GraphDegreeFloor)
      assert(Dials.graphRounds == Dials.GraphRoundsDefault)
    }
  }

  test("shuffle partitions derive from corpus size, floored at the session count (r16)") {
    // gate corpora and the x100 tier stay at the hand-measured 32
    assert(Dials.shufflePartitionsFor(500L, 32) == 32)
    assert(Dials.shufflePartitionsFor(2000L, 32) == 32)
    assert(Dials.shufflePartitionsFor(200000L, 32) == 32)
    // the x1000 tier derives exactly the hand-set 128 the r15 run needed
    assert(Dials.shufflePartitionsFor(2000000L, 32) == 128)
    // power of two, capped
    assert(Dials.shufflePartitionsFor(20000000L, 32) == 2048 / 2)
    assert(Dials.shufflePartitionsFor(2000000000L, 32) == 1024)
  }

  test("traversal query bands: 1 at every measured gate/x100 shape; the adversarial x1000 splits (r16)") {
    // gate corpora: 40 queries at the floor beam — single pass
    assert(Dials.traversalBandsFor(40L, 48, 16) == 1)
    // x100 adversarial at the calibrated 600 beam — single pass (the
    // §5c-r14 measured-good plan unchanged)
    assert(Dials.traversalBandsFor(4000L, 600, 25) == 1)
    // x1000 navigable at the 90 floor — ~220M rows/round -> 2 bands
    assert(Dials.traversalBandsFor(40000L, 90, 30) == 2)
    // x1000 adversarial at the calibrated ~sqrt(n) beam: ~4.6G
    // pre-distinct rows/round -> ~31 sequential slices, each within
    // the per-band exchange budget
    val b = Dials.traversalBandsFor(40000L, 1896, 30)
    assert(b >= 16 && b <= 64, s"unexpected band count $b")
    assert(40000L * 1896 * 61 / b <= Dials.TraversalBandCandRows)
  }

  test("uninitialized dials fall back to the gated constants (spec fixtures stable)") {
    // specs never run a main, so unless a main initialized this JVM the
    // getters must return the constants synthetic fixtures were built on
    if (Dials.vectorCount.isEmpty) {
      assert(Dials.lshBits == LshImpl.Bits || sys.env.contains("SPARK_GRAFT_LSH_BITS"))
      assert(Dials.ivfStride == 37L || sys.env.contains("SPARK_GRAFT_IVF_STRIDE"))
      assert(Dials.graphDegree == Dials.GraphDegreeFloor ||
        sys.env.contains("SPARK_GRAFT_GRAPH_DEGREE"))
    }
  }
}
