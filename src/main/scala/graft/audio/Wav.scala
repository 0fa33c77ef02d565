package graft.audio

/** Minimal WAV PCM16 mono codec + deterministic clip synthesis.
  *
  * Synthesis is byte-deterministic across JVMs: StrictMath for the sine, a
  * 64-bit LCG for noise, PCM16 little-endian, standard 44-byte RIFF header.
  * The per-row invariant (BASELINE.json `input_hint`) is "decoded-PCM
  * allclose at SNR≥30 dB vs the reference output" — here the reference
  * output is the clean resynthesised sine recoverable from (clip_id, sr_hz,
  * byte length) alone, so the validator needs no side channel.
  */
object Wav {

  val HeaderBytes = 44
  private val Amplitude = 0.6
  /** Clean clips carry noise at 40 dB SNR; corrupted ones at 10 dB. */
  val CleanSnrDb = 40.0
  val CorruptSnrDb = 10.0

  /** Sine frequency recoverable from the numeric clip seed. */
  def freqOf(seed: Long): Double = 200.0 + (seed % 600)

  private def noiseAmp(snrDb: Double): Double = {
    // uniform noise in [-a,a): power a^2/3; sine power A^2/2
    val signalPower = Amplitude * Amplitude / 2.0
    StrictMath.sqrt(3.0 * signalPower / StrictMath.pow(10.0, snrDb / 10.0))
  }

  /** Closed-form expected mean squared amplitude of a synthesized clip:
    * sine power A^2/2 plus uniform-noise power noiseAmp^2/3 (clipping never
    * engages: max |sample| = A + noiseAmp(10dB) < 1). */
  def expectedMeanSq(snrDb: Double): Double = {
    val sig = Amplitude * Amplitude / 2.0
    val a = noiseAmp(snrDb)
    sig + a * a / 3.0
  }

  /** Env-gated fast sine kernel (round-5, closing the round-3 loop):
    * `GRAFT_FAST_SYNTH=1` replaces the per-sample `StrictMath.sin` in the
    * synth + validation inner loops with a Chebyshev two-term recurrence
    * (sin((i+1)w) = 2cos(w)·sin(iw) − sin((i−1)w)) — measured ~3× cheaper
    * per row in round 3 (40k → 117k clips/s at local[24]). OFF by default
    * IN THIS SANDBOX ONLY: the virtualized host scales dense high-IPC FP
    * 6→24 threads at only ~0.6 (graft.tools.SynthScale probe — active-core
    * turbo penalizes throughput-bound FP far more than the latency-bound
    * native sin call), so the faster kernel cannot hold the raw ≥ 0.8
    * N→4N criterion HERE even though it is a straight win on real
    * multi-node executors, where FP throughput scales with machines.
    * The recurrence is IEEE-deterministic across JVMs (pure mul/sub), its
    * accumulated error over the longest clip is ~1e-9 — far below the
    * PCM16 quantization floor — and synthesis and validation share one
    * kernel under either flag, so the SNR≥30dB invariant and the planted
    * corrupt rows behave identically (asserted cross-kernel in PureSpec). */
  val FastSynth: Boolean = sys.env.get("GRAFT_FAST_SYNTH").contains("1")

  /** Next LCG state (Knuth MMIX constants). */
  @inline private def lcg(x: Long): Long =
    x * 6364136223846793005L + 1442695040888963407L

  /** uniform in [-1, 1) from the high 53 bits. */
  @inline private def unit(x: Long): Double =
    ((x >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0

  /** Synthesize one clip. `seed` drives the sine frequency (must equal the
    * id-recoverable seed); `noiseSeed` the noise stream; `extraMs` shifts
    * the real byte length vs the declared dur_ms (consistency fixture). */
  def synth(seed: Long, noiseSeed: Long, srHz: Int, durMs: Int,
      snrDb: Double = CleanSnrDb, extraMs: Int = 0): Array[Byte] = {
    val n = (srHz.toLong * (durMs + extraMs) / 1000L).toInt
    val out = new Array[Byte](HeaderBytes + 2 * n)
    synthInto(out, seed, noiseSeed, srHz, durMs, snrDb, extraMs)
    out
  }

  /** Byte length of the clip [[synth]] produces for these parameters. */
  def synthLen(srHz: Int, durMs: Int, extraMs: Int = 0): Int =
    HeaderBytes + 2 * (srHz.toLong * (durMs + extraMs) / 1000L).toInt

  /** [[synth]] into a caller-owned buffer (`out.length >= synthLen(...)`);
    * returns the written byte count. Lets the hot validation path reuse one
    * buffer per task instead of allocating ~30 KB per row — the GC-pressure
    * fix the N->4N scaling criterion needs (allocation stalls hit the
    * 32-thread level hardest). Byte-identical to [[synth]]. */
  def synthInto(out: Array[Byte], seed: Long, noiseSeed: Long, srHz: Int, durMs: Int,
      snrDb: Double = CleanSnrDb, extraMs: Int = 0, fast: Boolean = FastSynth): Int = {
    val n = (srHz.toLong * (durMs + extraMs) / 1000L).toInt
    val f = freqOf(seed)
    val a = noiseAmp(snrDb)
    writeHeader(out, srHz, n)
    var state = lcg(noiseSeed ^ 0x5DEECE66DL)
    var i = 0
    if (fast) {
      val w = 2.0 * StrictMath.PI * f / srHz
      val c = 2.0 * StrictMath.cos(w)
      var sPrev = -StrictMath.sin(w) // sin(-w)
      var sCur = 0.0 // sin(0)
      while (i < n) {
        val clean = Amplitude * sCur
        state = lcg(state)
        val sample = clean + a * unit(state)
        val s = math.max(-1.0, math.min(1.0, sample))
        val pcm = StrictMath.round(s * 32767.0).toInt.toShort
        out(HeaderBytes + 2 * i) = (pcm & 0xFF).toByte
        out(HeaderBytes + 2 * i + 1) = ((pcm >> 8) & 0xFF).toByte
        val sNext = c * sCur - sPrev
        sPrev = sCur; sCur = sNext
        i += 1
      }
    } else while (i < n) {
      val clean = Amplitude * StrictMath.sin(2.0 * StrictMath.PI * f * i / srHz)
      state = lcg(state)
      val sample = clean + a * unit(state)
      val s = math.max(-1.0, math.min(1.0, sample))
      val pcm = StrictMath.round(s * 32767.0).toInt.toShort
      out(HeaderBytes + 2 * i) = (pcm & 0xFF).toByte
      out(HeaderBytes + 2 * i + 1) = ((pcm >> 8) & 0xFF).toByte
      i += 1
    }
    HeaderBytes + 2 * n
  }

  /** Fused [[synthInto]] + [[validateVsClean]] in ONE pass over the sample
    * stream: synthesize each PCM sample into the caller-owned buffer and
    * immediately validate the STORED bytes against the clean sine — whose
    * value the synth step just computed, so the validation no longer
    * re-derives it with a second `StrictMath.sin` per sample. Returns
    * (writtenLen, snrDb, nSamples).
    *
    * Bit-identical to the two-call sequence (asserted in PureSpec): the
    * clean value is the same FP expression both calls evaluate at the same
    * `i`, the validated sample is read back from the bytes just written
    * (the encode side of the byte roundtrip stays on the hot path), and
    * the sigPow/noisePow accumulation order matches validateVsClean's.
    * Motivation (round-7, guide §1.2 "per-task work"): the synth+validate
    * map is the dominant stage of the headline pipeline and of the au_*
    * shared pass, and the per-sample sine is its dominant term — the
    * two-call shape evaluated it TWICE per sample (once to synthesize,
    * once to resynthesize the reference inside validate). One fused pass
    * halves that without touching what either step computes. */
  def synthValidateInto(out: Array[Byte], seed: Long, noiseSeed: Long,
      srHz: Int, durMs: Int, snrDb: Double = CleanSnrDb, extraMs: Int = 0,
      fast: Boolean = FastSynth): (Int, Double, Long) = {
    val n = (srHz.toLong * (durMs + extraMs) / 1000L).toInt
    val f = freqOf(seed)
    val a = noiseAmp(snrDb)
    writeHeader(out, srHz, n)
    var state = lcg(noiseSeed ^ 0x5DEECE66DL)
    var sigPow = 0.0
    var noisePow = 0.0
    var i = 0
    if (fast) {
      val w = 2.0 * StrictMath.PI * f / srHz
      val c = 2.0 * StrictMath.cos(w)
      var sPrev = -StrictMath.sin(w)
      var sCur = 0.0
      while (i < n) {
        val clean = Amplitude * sCur
        state = lcg(state)
        val sample = clean + a * unit(state)
        val s = math.max(-1.0, math.min(1.0, sample))
        val pcm = StrictMath.round(s * 32767.0).toInt.toShort
        out(HeaderBytes + 2 * i) = (pcm & 0xFF).toByte
        out(HeaderBytes + 2 * i + 1) = ((pcm >> 8) & 0xFF).toByte
        // validate the STORED bytes (same read expression as validateVsClean)
        val got = (((out(HeaderBytes + 2 * i) & 0xFF)) |
          (out(HeaderBytes + 2 * i + 1) << 8)).toShort
        val resid = got / 32767.0 - clean
        sigPow += clean * clean
        noisePow += resid * resid
        val sNext = c * sCur - sPrev
        sPrev = sCur; sCur = sNext
        i += 1
      }
    } else while (i < n) {
      val clean = Amplitude * StrictMath.sin(2.0 * StrictMath.PI * f * i / srHz)
      state = lcg(state)
      val sample = clean + a * unit(state)
      val s = math.max(-1.0, math.min(1.0, sample))
      val pcm = StrictMath.round(s * 32767.0).toInt.toShort
      out(HeaderBytes + 2 * i) = (pcm & 0xFF).toByte
      out(HeaderBytes + 2 * i + 1) = ((pcm >> 8) & 0xFF).toByte
      val got = (((out(HeaderBytes + 2 * i) & 0xFF)) |
        (out(HeaderBytes + 2 * i + 1) << 8)).toShort
      val resid = got / 32767.0 - clean
      sigPow += clean * clean
      noisePow += resid * resid
      i += 1
    }
    val snr =
      if (n == 0) Double.NaN // validateVsClean: zero decodable samples
      else if (noisePow == 0.0) Double.PositiveInfinity
      else 10.0 * StrictMath.log10(sigPow / noisePow)
    (HeaderBytes + 2 * n, snr, n.toLong)
  }

  /** [[synthValidateInto]] + [[frameStats]] fused into the same single
    * pass: the 20 ms-frame RMS/power accumulation reads the just-written
    * sample instead of a third sweep over the byte buffer. Returns
    * (writtenLen, snrDb, nSamples, nFrames, rmsMean, rmsMax, meanSq) —
    * each component bit-identical to the corresponding unfused call
    * (PureSpec parity): the frame accumulator sees the same
    * `sample/32767.0` doubles in the same order, frames truncate the tail
    * exactly like frameStats (only the first nFrames*frameLen samples
    * accumulate), and the snr/byte outputs are [[synthValidateInto]]'s.
    * Only the au_* shared pass needs the frame features, so this stays a
    * separate entry point and the headline pipeline keeps the two-output
    * kernel. */
  def synthMeasureInto(out: Array[Byte], seed: Long, noiseSeed: Long,
      srHz: Int, durMs: Int, snrDb: Double = CleanSnrDb, extraMs: Int = 0,
      frameMs: Int = 20, fast: Boolean = FastSynth)
      : (Int, Double, Long, Long, Double, Double, Double) = {
    val n = (srHz.toLong * (durMs + extraMs) / 1000L).toInt
    val f = freqOf(seed)
    val a = noiseAmp(snrDb)
    writeHeader(out, srHz, n)
    var state = lcg(noiseSeed ^ 0x5DEECE66DL)
    var sigPow = 0.0
    var noisePow = 0.0
    // frame accumulators (frameStats layout): frames truncate — samples at
    // or past nFrames*frameLen contribute to snr but not to the features
    val frameLen = math.max(1, srHz * frameMs / 1000)
    val nFrames = n / frameLen
    val covered = nFrames * frameLen
    var rmsSum = 0.0
    var rmsMax = 0.0
    var sqSum = 0.0
    var frameAcc = 0.0
    var inFrame = 0
    var i = 0
    val w = 2.0 * StrictMath.PI * f / srHz
    val c = if (fast) 2.0 * StrictMath.cos(w) else 0.0
    var sPrev = if (fast) -StrictMath.sin(w) else 0.0
    var sCur = 0.0
    while (i < n) {
      val clean =
        if (fast) Amplitude * sCur
        else Amplitude * StrictMath.sin(2.0 * StrictMath.PI * f * i / srHz)
      state = lcg(state)
      val sample = clean + a * unit(state)
      val s = math.max(-1.0, math.min(1.0, sample))
      val pcm = StrictMath.round(s * 32767.0).toInt.toShort
      out(HeaderBytes + 2 * i) = (pcm & 0xFF).toByte
      out(HeaderBytes + 2 * i + 1) = ((pcm >> 8) & 0xFF).toByte
      val got = (((out(HeaderBytes + 2 * i) & 0xFF)) |
        (out(HeaderBytes + 2 * i + 1) << 8)).toShort
      val resid = got / 32767.0 - clean
      sigPow += clean * clean
      noisePow += resid * resid
      if (i < covered) {
        val v = got / 32767.0
        frameAcc += v * v
        inFrame += 1
        if (inFrame == frameLen) {
          val rms = StrictMath.sqrt(frameAcc / frameLen)
          rmsSum += rms
          if (rms > rmsMax) rmsMax = rms
          sqSum += frameAcc
          frameAcc = 0.0
          inFrame = 0
        }
      }
      if (fast) {
        val sNext = c * sCur - sPrev
        sPrev = sCur; sCur = sNext
      }
      i += 1
    }
    val snr =
      if (n == 0) Double.NaN
      else if (noisePow == 0.0) Double.PositiveInfinity
      else 10.0 * StrictMath.log10(sigPow / noisePow)
    val (rmsMean, meanSq) =
      if (nFrames == 0) (0.0, 0.0)
      else (rmsSum / nFrames, sqSum / (nFrames.toLong * frameLen))
    (HeaderBytes + 2 * n, snr, n.toLong, nFrames.toLong, rmsMean, rmsMax, meanSq)
  }

  private def writeHeader(b: Array[Byte], srHz: Int, nSamples: Int): Unit = {
    val dataLen = 2 * nSamples
    def le32(off: Int, v: Int): Unit = {
      b(off) = (v & 0xFF).toByte; b(off + 1) = ((v >> 8) & 0xFF).toByte
      b(off + 2) = ((v >> 16) & 0xFF).toByte; b(off + 3) = ((v >> 24) & 0xFF).toByte
    }
    def le16(off: Int, v: Int): Unit = {
      b(off) = (v & 0xFF).toByte; b(off + 1) = ((v >> 8) & 0xFF).toByte
    }
    def ascii(off: Int, s: String): Unit =
      s.getBytes("US-ASCII").zipWithIndex.foreach { case (c, i) => b(off + i) = c }
    ascii(0, "RIFF"); le32(4, 36 + dataLen); ascii(8, "WAVE")
    ascii(12, "fmt "); le32(16, 16); le16(20, 1 /*PCM*/); le16(22, 1 /*mono*/)
    le32(24, srHz); le32(28, srHz * 2); le16(32, 2); le16(34, 16)
    ascii(36, "data"); le32(40, dataLen)
  }

  /** Decode: returns (sampleRate, samples) or None on malformed header. */
  def decode(bytes: Array[Byte]): Option[(Int, Array[Short])] = {
    if (bytes == null || bytes.length < HeaderBytes) return None
    def le32(off: Int): Int =
      (bytes(off) & 0xFF) | ((bytes(off + 1) & 0xFF) << 8) |
        ((bytes(off + 2) & 0xFF) << 16) | ((bytes(off + 3) & 0xFF) << 24)
    if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F')) return None
    val sr = le32(24)
    val dataLen = math.min(le32(40), bytes.length - HeaderBytes)
    if (sr <= 0 || dataLen < 0) return None
    val n = dataLen / 2
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) {
      samples(i) =
        (((bytes(HeaderBytes + 2 * i) & 0xFF)) |
          (bytes(HeaderBytes + 2 * i + 1) << 8)).toShort
      i += 1
    }
    Some((sr, samples))
  }

  /** SNR (dB) of decoded PCM vs the clean resynthesised sine — the per-row
    * allclose invariant. NaN if undecodable or empty. */
  def snrVsClean(bytes: Array[Byte], seed: Long,
      fast: Boolean = FastSynth): Double = decode(bytes) match {
    case None => Double.NaN
    case Some((sr, samples)) if samples.length == 0 => Double.NaN
    case Some((sr, samples)) =>
      val f = freqOf(seed)
      var sigPow = 0.0
      var noisePow = 0.0
      var i = 0
      if (fast) {
        val w = 2.0 * StrictMath.PI * f / sr
        val c = 2.0 * StrictMath.cos(w)
        var sPrev = -StrictMath.sin(w)
        var sCur = 0.0
        while (i < samples.length) {
          val clean = Amplitude * sCur
          val resid = samples(i) / 32767.0 - clean
          sigPow += clean * clean
          noisePow += resid * resid
          val sNext = c * sCur - sPrev
          sPrev = sCur; sCur = sNext
          i += 1
        }
      } else while (i < samples.length) {
        val clean = Amplitude * StrictMath.sin(2.0 * StrictMath.PI * f * i / sr)
        val got = samples(i) / 32767.0
        val resid = got - clean
        sigPow += clean * clean
        noisePow += resid * resid
        i += 1
      }
      if (noisePow == 0.0) Double.PositiveInfinity
      else 10.0 * StrictMath.log10(sigPow / noisePow)
  }

  /** One-pass per-row validation over a caller-owned buffer holding `len`
    * valid bytes: decodes the header and streams PCM samples directly from
    * the bytes (no Array[Short] materialization), returning
    * (snrDb vs the clean resynth, decoded sample count). Semantically
    * identical to `decode` + `snrVsClean` + length (asserted in AudioSpec);
    * exists so the headline validation pipeline allocates nothing per row.
    * Returns (NaN, -1) on a malformed header. */
  def validateVsClean(bytes: Array[Byte], len: Int, seed: Long,
      fast: Boolean = FastSynth): (Double, Long) = {
    if (bytes == null || len < HeaderBytes) return (Double.NaN, -1L)
    def le32(off: Int): Int =
      (bytes(off) & 0xFF) | ((bytes(off + 1) & 0xFF) << 8) |
        ((bytes(off + 2) & 0xFF) << 16) | ((bytes(off + 3) & 0xFF) << 24)
    if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F'))
      return (Double.NaN, -1L)
    val sr = le32(24)
    val dataLen = math.min(le32(40), len - HeaderBytes)
    if (sr <= 0 || dataLen < 0) return (Double.NaN, -1L)
    val n = dataLen / 2
    if (n == 0) return (Double.NaN, 0L)
    val f = freqOf(seed)
    var sigPow = 0.0
    var noisePow = 0.0
    var i = 0
    if (fast) {
      val w = 2.0 * StrictMath.PI * f / sr
      val c = 2.0 * StrictMath.cos(w)
      var sPrev = -StrictMath.sin(w)
      var sCur = 0.0
      while (i < n) {
        val s = (((bytes(HeaderBytes + 2 * i) & 0xFF)) |
          (bytes(HeaderBytes + 2 * i + 1) << 8)).toShort
        val clean = Amplitude * sCur
        val resid = s / 32767.0 - clean
        sigPow += clean * clean
        noisePow += resid * resid
        val sNext = c * sCur - sPrev
        sPrev = sCur; sCur = sNext
        i += 1
      }
    } else while (i < n) {
      val s = (((bytes(HeaderBytes + 2 * i) & 0xFF)) |
        (bytes(HeaderBytes + 2 * i + 1) << 8)).toShort
      // same FP expression order as snrVsClean -> bit-identical SNR
      val clean = Amplitude * StrictMath.sin(2.0 * StrictMath.PI * f * i / sr)
      val resid = s / 32767.0 - clean
      sigPow += clean * clean
      noisePow += resid * resid
      i += 1
    }
    val snr =
      if (noisePow == 0.0) Double.PositiveInfinity
      else 10.0 * StrictMath.log10(sigPow / noisePow)
    (snr, n.toLong)
  }

  /** One-pass frame feature summary over a caller-owned buffer:
    * (nFrames, rmsMean, rmsMax, meanSq) where rms* reproduce
    * `frameRms(bytes, frameMs)` exactly (same accumulation order) and
    * meanSq is the mean squared sample amplitude over the covered frames —
    * the quantity with a closed-form expectation A^2/2 + noiseAmp^2/3 that
    * the au_features oracle checks. Allocation-free. */
  def frameStats(bytes: Array[Byte], len: Int, frameMs: Int): (Long, Double, Double, Double) = {
    if (bytes == null || len < HeaderBytes) return (0L, 0.0, 0.0, 0.0)
    def le32(off: Int): Int =
      (bytes(off) & 0xFF) | ((bytes(off + 1) & 0xFF) << 8) |
        ((bytes(off + 2) & 0xFF) << 16) | ((bytes(off + 3) & 0xFF) << 24)
    if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F'))
      return (0L, 0.0, 0.0, 0.0)
    val sr = le32(24)
    val dataLen = math.min(le32(40), len - HeaderBytes)
    if (sr <= 0 || dataLen < 0) return (0L, 0.0, 0.0, 0.0)
    val n = dataLen / 2
    val frameLen = math.max(1, sr * frameMs / 1000)
    val nFrames = n / frameLen
    if (nFrames == 0) return (0L, 0.0, 0.0, 0.0)
    var rmsSum = 0.0
    var rmsMax = 0.0
    var sqSum = 0.0
    var fI = 0
    while (fI < nFrames) {
      var acc = 0.0
      var i = fI * frameLen
      val end = i + frameLen
      while (i < end) {
        val v = (((bytes(HeaderBytes + 2 * i) & 0xFF)) |
          (bytes(HeaderBytes + 2 * i + 1) << 8)).toShort / 32767.0
        acc += v * v
        i += 1
      }
      val rms = StrictMath.sqrt(acc / frameLen)
      rmsSum += rms
      if (rms > rmsMax) rmsMax = rms
      sqSum += acc
      fI += 1
    }
    (nFrames.toLong, rmsSum / nFrames, rmsMax, sqSum / (nFrames.toLong * frameLen))
  }

  /** Frame-level RMS (frame = `frameMs` ms, non-overlapping, truncating) —
    * the feature-extraction / frame-sample primitive for binary audio
    * columns. */
  def frameRms(bytes: Array[Byte], frameMs: Int): Array[Double] = decode(bytes) match {
    case None => Array.empty
    case Some((sr, samples)) =>
      val frameLen = math.max(1, sr * frameMs / 1000)
      val nFrames = samples.length / frameLen
      val out = new Array[Double](nFrames)
      var fI = 0
      while (fI < nFrames) {
        var acc = 0.0
        var i = fI * frameLen
        val end = i + frameLen
        while (i < end) {
          val v = samples(i) / 32767.0
          acc += v * v
          i += 1
        }
        out(fI) = StrictMath.sqrt(acc / frameLen)
        fI += 1
      }
      out
  }
}
