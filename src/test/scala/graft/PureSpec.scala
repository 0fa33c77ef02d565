package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.agg.{Drift, TDigest}
import graft.audio.Wav

/** No-Spark unit tests: WAV codec round-trip, SNR invariant separation,
  * t-digest quantile accuracy + merge associativity, drift math. */
class PureSpec extends AnyFunSuite {

  test("wav synth/decode round-trip preserves sr and sample count") {
    val b = Wav.synth(seed = 42, noiseSeed = 42, srHz = 16000, durMs = 100)
    val Some((sr, samples)) = Wav.decode(b)
    assert(sr == 16000)
    assert(samples.length == 1600)
  }

  test("clean clip SNR is ~40 dB, corrupted ~10 dB; threshold 30 separates") {
    val clean = Wav.synth(7, 7, 22050, 120, snrDb = Wav.CleanSnrDb)
    val bad = Wav.synth(7, 7, 22050, 120, snrDb = Wav.CorruptSnrDb)
    val sClean = Wav.snrVsClean(clean, 7)
    val sBad = Wav.snrVsClean(bad, 7)
    assert(sClean > 35.0 && sClean < 45.0, s"clean snr=$sClean")
    assert(sBad > 5.0 && sBad < 15.0, s"bad snr=$sBad")
  }

  test("fast Chebyshev kernel is invariant-equivalent to the StrictMath kernel") {
    val buf = new Array[Byte](64 * 1024)
    for (seed <- Seq(7L, 123L, 599L); sr <- Seq(8000, 44100); dur <- Seq(20, 260)) {
      val len = Wav.synthInto(buf, seed, seed, sr, dur, Wav.CleanSnrDb, 0, fast = true)
      val (fastSnr, n1) = Wav.validateVsClean(buf, len, seed, fast = true)
      val (slowSnr, n2) = Wav.validateVsClean(buf, len, seed, fast = false)
      assert(n1 == n2)
      // recurrence error (~1e-9 over the longest clip) is far below the
      // PCM16 quantization floor, so both kernels agree on the invariant
      // and nearly agree on the number
      assert(fastSnr >= 30 && slowSnr >= 30, s"clean snr fast=$fastSnr slow=$slowSnr")
      assert(math.abs(fastSnr - slowSnr) < 0.1, s"fast=$fastSnr slow=$slowSnr")
      // planted corrupt rows trip the invariant under the fast kernel too
      val lenB = Wav.synthInto(buf, seed, seed, sr, dur, Wav.CorruptSnrDb, 0, fast = true)
      assert(Wav.validateVsClean(buf, lenB, seed, fast = true)._1 < 30)
    }
    // cross-kernel: fast-synth bytes validated by the slow kernel (and the
    // reverse) still clear SNR>=30 — the kernels are interchangeable at
    // the invariant-contract level, so a mixed fleet cannot misclassify
    val len = Wav.synthInto(buf, 42L, 42L, 44100, 260, Wav.CleanSnrDb, 0, fast = false)
    assert(Wav.validateVsClean(buf, len, 42L, fast = true)._1 >= 30)
    val len2 = Wav.synthInto(buf, 42L, 42L, 44100, 260, Wav.CleanSnrDb, 0, fast = true)
    assert(Wav.validateVsClean(buf, len2, 42L, fast = false)._1 >= 30)
  }

  test("synthesis is byte-deterministic") {
    val a = Wav.synth(99, 99, 44100, 50)
    val b = Wav.synth(99, 99, 44100, 50)
    assert(java.util.Arrays.equals(a, b))
  }

  test("decode rejects garbage") {
    assert(Wav.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(Wav.decode("not a wav header at all padding padding!!".getBytes).isEmpty)
    assert(Wav.decode(null).isEmpty)
  }

  test("frameRms counts frames by truncating division") {
    val b = Wav.synth(5, 5, 16000, 105) // 1680 samples, 320/frame -> 5 frames
    assert(Wav.frameRms(b, 20).length == 5)
  }

  test("validateVsClean == decode + snrVsClean + length (fused path parity)") {
    for {
      sr <- Seq(8000, 22050, 48000)
      dur <- Seq(20, 105, 499)
      snr <- Seq(Wav.CleanSnrDb, Wav.CorruptSnrDb)
      extra <- Seq(0, 7)
    } {
      val b = Wav.synth(11, 13, sr, dur, snr, extra)
      assert(b.length == Wav.synthLen(sr, dur, extra))
      val (fusedSnr, fusedN) = Wav.validateVsClean(b, b.length, 11)
      val Some((_, samples)) = Wav.decode(b)
      val refSnr = Wav.snrVsClean(b, 11)
      assert(fusedN == samples.length.toLong)
      assert(fusedSnr == refSnr, s"sr=$sr dur=$dur snr=$snr")
    }
    assert(Wav.validateVsClean(Array[Byte](1, 2, 3), 3, 1) == ((Double.NaN, -1L))
      || Wav.validateVsClean(Array[Byte](1, 2, 3), 3, 1)._2 == -1L)
  }

  test("synthValidateInto == synthInto + validateVsClean (fused synth+validate parity)") {
    // the round-7 fused kernel must be BIT-identical to the two-call
    // sequence on every output: written bytes, snr, sample count — for
    // both sine kernels, every sr/dur corner, both injection classes
    for {
      fast <- Seq(false, true)
      sr <- Seq(8000, 22050, 48000)
      dur <- Seq(20, 105, 499)
      snr <- Seq(Wav.CleanSnrDb, Wav.CorruptSnrDb)
      extra <- Seq(0, 7)
    } {
      val seed = 11L
      val ref = new Array[Byte](Wav.synthLen(sr, dur, extra))
      val refLen = Wav.synthInto(ref, seed, 13L, sr, dur, snr, extra, fast = fast)
      val (refSnr, refN) = Wav.validateVsClean(ref, refLen, seed, fast = fast)
      val fused = new Array[Byte](Wav.synthLen(sr, dur, extra))
      val (len, gotSnr, gotN) =
        Wav.synthValidateInto(fused, seed, 13L, sr, dur, snr, extra, fast = fast)
      assert(len == refLen)
      assert(java.util.Arrays.equals(ref, fused), s"bytes diverge sr=$sr dur=$dur")
      assert(gotN == refN)
      assert(gotSnr == refSnr, s"fast=$fast sr=$sr dur=$dur snr=$snr extra=$extra")
    }
  }

  test("synthMeasureInto == synthInto + validateVsClean + frameStats (fully fused parity)") {
    for {
      fast <- Seq(false, true)
      sr <- Seq(8000, 22050, 48000)
      dur <- Seq(20, 105, 499)
      snr <- Seq(Wav.CleanSnrDb, Wav.CorruptSnrDb)
      extra <- Seq(0, 7)
    } {
      val seed = 11L
      val ref = new Array[Byte](Wav.synthLen(sr, dur, extra))
      val refLen = Wav.synthInto(ref, seed, 13L, sr, dur, snr, extra, fast = fast)
      val (refSnr, refN) = Wav.validateVsClean(ref, refLen, seed, fast = fast)
      val (refF, refMean, refMax, refSq) = Wav.frameStats(ref, refLen, 20)
      val fused = new Array[Byte](Wav.synthLen(sr, dur, extra))
      val (len, gotSnr, gotN, gotF, gotMean, gotMax, gotSq) =
        Wav.synthMeasureInto(fused, seed, 13L, sr, dur, snr, extra, 20, fast = fast)
      assert(len == refLen && java.util.Arrays.equals(ref, fused))
      assert(gotSnr == refSnr && gotN == refN)
      assert(gotF == refF, s"fast=$fast sr=$sr dur=$dur")
      assert(gotMean == refMean && gotMax == refMax && gotSq == refSq,
        s"fast=$fast sr=$sr dur=$dur snr=$snr extra=$extra")
    }
  }

  test("frameStats == frameRms-derived features (fused path parity)") {
    for (sr <- Seq(8000, 44100); dur <- Seq(20, 347)) {
      val b = Wav.synth(3, 9, sr, dur)
      val rms = Wav.frameRms(b, 20)
      val (n, mean, mx, _) = Wav.frameStats(b, b.length, 20)
      assert(n == rms.length.toLong)
      assert(mean == rms.sum / rms.length)
      assert(mx == rms.max)
    }
  }

  test("measured mean-square power matches closed form within tolerance") {
    // worst case for partial-cycle wobble: lowest frequency, shortest clip
    for {
      seed <- Seq(0L, 123L, 599L) // freq 200..799
      sr <- Seq(8000, 48000)
      dur <- Seq(20, 499)
      snr <- Seq(Wav.CleanSnrDb, Wav.CorruptSnrDb)
    } {
      val b = Wav.synth(seed, seed + 1, sr, dur, snr)
      val (_, _, _, meanSq) = Wav.frameStats(b, b.length, 20)
      val expected = Wav.expectedMeanSq(snr)
      assert(math.abs(meanSq - expected) < graft.audio.AudioQueries.PowerTolerance,
        s"seed=$seed sr=$sr dur=$dur snr=$snr meanSq=$meanSq expected=$expected")
    }
  }

  test("t-digest quantiles within 1% of exact on uniform data") {
    val xs = (1 to 10000).map(_.toLong)
    var buf = TDigest.empty()
    xs.foreach(x => buf = TDigest.add(buf, x.toDouble))
    Seq(0.25, 0.5, 0.75, 0.95, 0.99).foreach { p =>
      val est = TDigest.quantile(buf, p)
      val exact = 1 + p * 9999
      assert(math.abs(est - exact) / exact < 0.01, s"p=$p est=$est exact=$exact")
    }
  }

  test("t-digest merge of shards ~ single digest (partial+final agg path)") {
    val xs = (1 to 20000).map(i => ((i * 2654435761L) % 10007).toDouble)
    val shards = xs.grouped(1000).map { g =>
      var b = TDigest.empty(); g.foreach(x => b = TDigest.add(b, x)); b
    }
    val merged = shards.reduce(TDigest.merge)
    val sorted = xs.sorted
    Seq(0.5, 0.95).foreach { p =>
      val est = TDigest.quantile(merged, p)
      val exact = sorted(((sorted.length - 1) * p).toInt)
      assert(math.abs(est - exact) / 10007.0 < 0.01, s"p=$p est=$est exact=$exact")
    }
  }

  test("chi-square: identical distributions -> 0; disjoint -> large") {
    val a = Map("x" -> 100L, "y" -> 200L)
    assert(Drift.chiSquare(a, a)._1 == 0.0)
    val (stat, dof) = Drift.chiSquare(Map("x" -> 100L), Map("y" -> 100L))
    assert(stat > 100.0 && dof == 1)
  }

  test("binned KS: equal hists -> 0, shifted -> 1") {
    assert(Drift.ksBinned(Array(10L, 10L), Array(10L, 10L)) == 0.0)
    assert(Drift.ksBinned(Array(10L, 0L), Array(0L, 10L)) == 1.0)
  }
}
