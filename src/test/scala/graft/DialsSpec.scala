package graft

import graft.functions.LshImpl
import org.scalatest.funsuite.AnyFunSuite

/** The corpus-derived scale-dial defaults (graft.Dials): the values the
  * mains derive once per JVM and the oracles interpolate. The formulas
  * are pure given a vector count, so this spec drives them through the
  * public getters via reflection-free re-derivation at known counts. */
class DialsSpec extends AnyFunSuite {

  // re-derive with the same integer-exact formulas
  private def bits(n: Long): Int = {
    val buckets = (n + Dials.TargetOccupancy - 1) / Dials.TargetOccupancy
    val cl2 = if (buckets <= 1) 0
      else 64 - java.lang.Long.numberOfLeadingZeros(buckets - 1)
    math.min(LshImpl.MaxBits, math.max(LshImpl.Bits, cl2))
  }
  private def stride(n: Long): Long = math.max(1L, math.sqrt(n.toDouble).toLong)

  test("LSH bits: gate scales stay at the floor; 100x derives the measured-good 12; MaxBits caps") {
    assert(bits(500L) == LshImpl.Bits)     // sf0.001 / sf0.01
    assert(bits(2000L) == LshImpl.Bits)    // sf0.1
    assert(bits(200000L) == 12)            // 100x stress corpus (SURVEY §5c)
    assert(bits(20000000L) == 19.min(LshImpl.MaxBits)) // cap engages far out
    // occupancy never exceeds the target once the derivation engages
    for (n <- Seq(20000L, 200000L, 2000000L)) {
      val b = bits(n)
      assert(b == LshImpl.MaxBits || (n.toDouble / (1L << b)) <= Dials.TargetOccupancy,
        s"occupancy ${n.toDouble / (1L << b)} exceeds target at n=$n, bits=$b")
    }
  }

  test("IVF stride: floor(sqrt(n)) keeps K within a factor of sqrt(n)") {
    assert(stride(500L) == 22L)
    assert(stride(2000L) == 44L)
    assert(stride(200000L) == 447L)
    // K = n/stride stays ~sqrt(n): assignment n*K is n^1.5, never n^2
    for (n <- Seq(500L, 2000L, 200000L, 20000000L)) {
      val k = n / stride(n)
      assert(k <= 2 * math.sqrt(n.toDouble).toLong + 1, s"K=$k too large at n=$n")
    }
  }

  test("join buckets: gate scales stay at the floor of 8; 600M rows derives 128; cap holds") {
    def buckets(n: Long): Int = {
      val want = (n + Dials.FactRowsPerBucket - 1) / Dials.FactRowsPerBucket
      val cl2 = if (want <= 1) 0
        else 64 - java.lang.Long.numberOfLeadingZeros(want - 1)
      math.min(1024, math.max(8, 1 << cl2))
    }
    assert(buckets(6000L) == 8)         // sf0.001
    assert(buckets(600000L) == 8)       // sf0.1 — gate layouts byte-identical
    assert(buckets(600000000L) == 128)  // the §5d 1000x tier
    assert(buckets(600000000000L) == 1024) // cap far out
    // per-bucket rows stay within 2x of target once derivation engages
    for (n <- Seq(100000000L, 600000000L, 5000000000L)) {
      val b = buckets(n)
      assert(b == 1024 || n.toDouble / b <= 2.0 * Dials.FactRowsPerBucket,
        s"per-bucket rows ${n / b} exceed 2x target at n=$n, buckets=$b")
    }
  }

  test("uninitialized dials fall back to the r5 gated constants (spec fixtures stable)") {
    // specs never run a main, so unless a main initialized this JVM the
    // getters must return the constants synthetic fixtures were built on
    if (Dials.vectorCount.isEmpty) {
      assert(Dials.lshBits == LshImpl.Bits || sys.env.contains("SPARK_GRAFT_LSH_BITS"))
      assert(Dials.ivfStride == 37L || sys.env.contains("SPARK_GRAFT_IVF_STRIDE"))
    }
  }
}
