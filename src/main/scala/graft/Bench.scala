package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.run.ValidationPipeline

/** Benchmark main (driver contract): times every SparkEntry query at
  * SPARK_GRAFT_CPUS, then runs the full validation pipeline at local[N] and
  * local[4N] (default 6 vs 24 — see the level-choice rationale below) on
  * the same input to evidence the north rule's N -> 4N scaling-efficiency
  * criterion (no multi-node cluster in this sandbox; two parallelism levels
  * on identical input stand in for two cluster sizes). Prints ONE JSON line
  * and writes the scaling table to BENCH.md.
  */
object Bench {

  /** One full scaling-section measurement: best-of-`pairs` interleaved
    * pipeline runs at the two levels, bracketed by the pure-CPU host
    * control (before + after — the conservative `control` is their min,
    * so a host that degrades MID-measurement is still caught). */
  private final case class ScalingResult(
      nClips: Long, nBad: Long, secLo: Double, cpsLo: Double,
      secHi: Double, cpsHi: Double, efficiency: Double,
      controlBefore: Double, controlAfter: Double,
      gcMsLo: Long = 0L, gcMsHi: Long = 0L, medianEfficiency: Double = 0.0,
      // absolute host stamps (sin Mops/s at full width, memory GB/s at 24
      // threads) taken before, BETWEEN, and after the engine samples — the
      // dense time series that catches host windows oscillating on minute
      // scales, which a before/after bracket alone slips through
      stamps: Seq[(Double, Double)] = Seq.empty) {
    def control: Double = math.min(controlBefore, controlAfter)
    def minMops: Double = if (stamps.isEmpty) 0.0 else stamps.map(_._1).min
    def minGbs: Double = if (stamps.isEmpty) 0.0 else stamps.map(_._2).min
    private def med(xs: Seq[Double]): Double =
      if (xs.isEmpty) 0.0
      else {
        val s = xs.sorted
        if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
      }
    def medMops: Double = med(stamps.map(_._1))
    def medGbs: Double = med(stamps.map(_._2))
  }

  private def newSession(cpus: Int): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Projection-forcing benchmark action. `count()` is NOT it: Catalyst's
    * column pruning removes the entire unused Project under a global count,
    * so a projection-only query (the jr_* / ta_* families) would time a
    * bare parquet scan — verified round-3: the optimized count plans of
    * jr_repair and ta_fingerprint contained no repair/fingerprint
    * expression at all. The noop DSv2 sink consumes EVERY output column
    * (plan retention is asserted in EngineSpec's bench-action test) while
    * writing nothing. */
  private[graft] def force(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    // Per-query timings at the requested parallelism — invoked AFTER the
    //    scaling section below: the 2x41-query sweep leaves the JVM with
    //    grown metaspace/code-cache and old-gen debris that measurably
    //    depresses the 24-core scaling level when it runs second (observed
    //    round-4: 0.778 efficiency with the sweep first vs 0.905 in a
    //    clean-JVM scaling-only run, hardware control ~0.91 in both), so
    //    the headline criterion is measured in the cleanest JVM state and
    //    the sweep pays the pollution instead of the other way round.
    //    A full untimed warmup pass at the smallest sf first: otherwise the
    //    alphabetically first query absorbs all JIT/codegen/session startup
    //    and its number is not comparable to the rest (round-1 ann_ivf
    //    artifact). SPARK_GRAFT_SCALING_ONLY=1 skips the sweep entirely
    //    (stability reruns).
    val scalingOnly = sys.env.get("SPARK_GRAFT_SCALING_ONLY").contains("1")
    var spark: SparkSession = null
    def perQuerySweep(): Seq[(String, Double)] = {
      spark = newSession(cpus)
      // Warmup FIRST (round-5, per the round-4 advice): the au_* warmups
      // below materialize warmSf's shared pass, so the timed sfDir
      // materialization that follows measures the engine, not JVM/codegen/
      // session startup (round-4 timed it cold and its single sample
      // absorbed exactly the startup cost the warmup exists to remove).
      val warmSf = "/root/testdata/sf0.001"
      SparkEntry.queries.foreach { case (name, fn) =>
        try force(fn(spark, warmSf))
        catch { case e: Throwable => System.err.println(s"[bench] warmup $name failed: ${e.getMessage}") }
      }
      // Shared staged materializations — passes several queries consume
      // (the 100 TB "materialize once" shape): the au_* family reads one
      // synth+measure pass (AudioQueries.measuredShared) and the MinHash
      // family (dd_minhash/dd_cluster/dd_contaminate/dd_keep) reads one
      // verified pair table (Dedup.verifiedPairsShared). Each is built
      // BEFORE the sweep, timed, and booked as its own entry: built inside
      // the sweep the cost would land on whichever consumer ran first in
      // pass 1 and min-of-2 would silently drop it. If a build fails, its
      // consumers are EXCLUDED from the sweep (loudly): each would retry
      // the materialization inside its own timed window and silently
      // re-absorb the cost the dedicated entry exists to account for.
      // Smoke-run guard: when sfDir == warmSf the warmup above has already
      // materialized this dir, so the timed call is a cache hit and the
      // entry would be a vacuous near-zero — the entry is dropped (the
      // real bench scale never equals the warmup dir).
      val stagedBuilds: Seq[(String, () => Unit, String => Boolean)] = Seq(
        ("au_materialize",
          () => { graft.audio.AudioQueries.measuredShared(spark, sfDir).count(); () },
          (n: String) => n.startsWith("au_")),
        ("dd_pairs_materialize",
          () => { graft.dedup.Dedup.verifiedPairsShared(spark, sfDir).count(); () },
          Set("dd_minhash", "dd_cluster", "dd_contaminate", "dd_keep")),
        ("vc_incr_materialize",
          () => { graft.queries.ClipQueries.stagedIncrTable(spark, sfDir); () },
          Set("vc_incr", "vc_verdict_drift")),
        ("vc_skip_materialize",
          () => { graft.queries.ClipQueries.stagedRangedTable(spark, sfDir); () },
          Set("vc_skip")),
        ("vc_overwrite_materialize",
          () => { graft.queries.ClipQueries.stagedOverwriteTable(spark, sfDir); () },
          Set("vc_overwrite")),
        ("vc_evolve_materialize",
          () => { graft.queries.ClipQueries.stagedEvolveTable(spark, sfDir); () },
          Set("vc_evolve")))
      var excluded: String => Boolean = _ => false
      val stagedEntries = stagedBuilds.flatMap { case (entry, build, consumers) =>
        val t0 = System.nanoTime()
        val ok =
          try { build(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $entry failed: ${e.getMessage}" +
              " — its consumer queries are EXCLUDED from this sweep (their" +
              " timings would silently re-absorb the materialization retry)")
            val prev = excluded
            excluded = n => prev(n) || consumers(n)
            false
          }
        if (ok && sfDir != warmSf) Seq(entry -> (System.nanoTime() - t0) / 1e9)
        else Seq.empty
      }
      val sweepQueries = SparkEntry.queries.filterNot { case (n, _) => excluded(n) }
      // two full passes, per-query minimum: this host shows transient
      // multi-second throughput dips (tens of seconds long, arbitrary
      // placement — measured by re-running the identical loop and watching
      // the slow window move between queries), so a single-pass number can
      // be 5-7x off for whichever queries the dip lands on. Same hedge the
      // scaling section uses (interleaved min-of-3).
      val passes = (1 to 2).map { _ =>
        sweepQueries.toSeq.sortBy(_._1).map { case (name, fn) =>
          val t0 = System.nanoTime()
          // a failed pass records NaN, NOT its short time-to-fail — the min
          // below must never pick a fast failure over a real success
          val sec =
            try { force(fn(spark, sfDir)); (System.nanoTime() - t0) / 1e9 }
            catch { case e: Throwable =>
              System.err.println(s"[bench] $name failed: ${e.getMessage}")
              Double.NaN
            }
          // session-owner cache lifecycle (outside the timed window): drop
          // the small persisted finals each query materializes so the
          // 2x40-query sweep never accumulates executor storage
          spark.catalog.clearCache()
          name -> sec
        }
      }
      spark.stop()
      (passes.flatten ++ stagedEntries).groupBy(_._1).toSeq.sortBy(_._1)
        .flatMap { case (name, ts) =>
          val ok = ts.map(_._2).filterNot(_.isNaN)
          if (ok.isEmpty) {
            // loud flag, excluded from the JSON (NaN is not valid JSON) —
            // a query with zero successful passes has no benchmark number
            System.err.println(s"[bench] $name: ZERO successful passes — excluded")
            None
          } else Some(name -> ok.min)
        }
    }

    // 1. scaling (runs FIRST — see the JVM-state note on perQuerySweep):
    //    the full validation pipeline at local[N] vs local[4N] on
    //    identical input. The workload is replicated (deterministic shifted
    //    copies) so the measured job is long enough that fixed stage/planning
    //    overhead is noise — the regime the 10^12-row target runs in.
    //
    // Levels are 6 vs 24 cores, NOT 8 vs 32: a pure-CPU control (the sin
    // loop below — no Spark, no allocation, no shared state) shows this
    // host itself scales 8->32 threads at only ~0.70-0.79 efficiency
    // (active-core frequency behavior of the virtualized Xeon), which no
    // engine can beat; at 6->24 the same control scales at ~0.83-0.95,
    // so the criterion measures the ENGINE (shuffles, skew, stragglers,
    // GC) rather than the host's clock governor. The control efficiency
    // is measured in the same run and reported alongside.
    //
    // Interleaved best-of-two per level (N,4N,N,4N): sandbox throughput
    // drifts run to run, so alternating levels hedges monotonic drift and
    // the per-level minimum damps one-off noise; the first pair also warms
    // JIT and the page cache.
    val nLo = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "6").toInt
    val nHi = 4 * nLo
    val repl = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPL", "6").toInt
    val pairs = sys.env.getOrElse("SPARK_GRAFT_SCALE_PAIRS", "3").toInt

    // Degraded-host policy (round-5, the round-4 top item): the pure-CPU
    // control is measured BEFORE and AFTER the scaling samples; if the
    // worse of the two reads below HealthyControl, the host was throttled
    // during the measurement window (round-4's driver regeneration read
    // control 0.831 vs the usual 0.95-0.97 and efficiency 0.732 — a host
    // artifact, not an engine one) and the WHOLE section reruns, up to
    // maxAttempts. The retry trigger is host health ONLY — never the
    // efficiency number — so a healthy-host reading can never be displaced
    // by cherry-picking. If every attempt is degraded, the least-degraded
    // one becomes the evidence of record, stamped `host_degraded: true` in
    // both the JSON line and BENCH.md.
    val HealthyControl = 0.85
    // Absolute-stamp gate (round 6): the ratio control alone passed a
    // window this round that slowed the engine's 4N level 15% while the
    // control IMPROVED (attempt 1: eff 0.835 @ control 0.810/0.870,
    // attempt 2 same JVM minutes later: 0.760 @ 0.892/0.858) — the window
    // was mutator-side, invisible to a latency-bound scaling RATIO because
    // it slows both thread counts proportionally. The absolute stamps DO
    // see it (the same morning's full-width sin stamp oscillated
    // 650-923 Mops on minute scales), so each attempt now takes a stamp
    // pair (sin Mops at 32 threads + streaming-read GB/s at 24, see
    // HostProbe) before, between, and after the engine samples. The gate
    // aggregates the series as MEDIAN >= threshold plus a lower MIN floor
    // (round-6b refinement): the first dense-gate run showed that
    // min-over-~20-stamps is degenerate — its strictness grows with the
    // stamp count, and single transient dips (693/736/652 Mops in three
    // otherwise-healthy 13-minute attempts whose controls read 0.897-0.969
    // and whose efficiencies agreed within 0.04) tripped it every time,
    // while the failure mode the gate exists for is a SUSTAINED
    // multi-minute window (the 2026-08-17-morning smoking gun, 390-580
    // Mops over minutes) — which the median sees and a transient dip does
    // not. Transient dips are already filtered by the per-level-MINIMUM
    // wall estimator (a dip can only slow a sample, and a slowed sample
    // never becomes the per-level min unless every sample dipped — which
    // is a sustained window, which the median catches). The min floors
    // (650 Mops / 45 GB/s) still fail an attempt that is bimodal within
    // its own window: sustained-degraded plateaus read 390-580 Mops /
    // 32-64 GB/s, transient dips inside healthy windows read 650-810 /
    // 48-66. All four thresholds env-overridable for a different host
    // class; both the median and the min of every attempt stay on the
    // record (BENCH.md table + JSON). Like the ratio gate, the stamp gate
    // is host-health ONLY — the efficiency number never triggers a retry.
    val HealthyMops = sys.env.getOrElse("SPARK_GRAFT_HEALTHY_MOPS", "880").toDouble
    val HealthyGbs = sys.env.getOrElse("SPARK_GRAFT_HEALTHY_GBS", "68").toDouble
    val FloorMops = sys.env.getOrElse("SPARK_GRAFT_FLOOR_MOPS", "650").toDouble
    val FloorGbs = sys.env.getOrElse("SPARK_GRAFT_FLOOR_GBS", "45").toDouble
    val maxAttempts = sys.env.getOrElse("SPARK_GRAFT_SCALE_ATTEMPTS", "3").toInt
    // JVM GC wall per sample, recorded for transparency (NOT a gate): the
    // sin-loop control is latency-bound and blind to memory-side
    // degradation, so when a 4N sample runs slow under a healthy control
    // the gc_ms split says whether the wall went to collection pauses
    // (heap/launch-config issue) or to the mutator (host memory bandwidth
    // / steal) — measured round-5 while chasing a spark-submit run whose
    // 4N level was 21% slower than sbt's under a 0.92 control.
    def gcMs(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    // Extra sampling (round-6, per the round-5 advice): the HI level swings
    // 30-40k cps on multi-minute host windows that the sin control does not
    // track (round-5 record; it even anti-correlated once: a 0.93-control
    // attempt read a slower 4N level than a 0.75-control one), so attempts
    // take extra draws beyond the interleaved pairs — at BOTH levels, the
    // same count each (round-5 drew the extras only at 4N, which under a
    // per-level-minimum estimator can only lower secHi and so biased the
    // efficiency upward). Every draw is printed to stderr so it is on the
    // record, and the per-level MEDIAN efficiency is reported alongside the
    // min-based headline as the estimator-bias cross-check.
    val extra = sys.env.getOrElse("SPARK_GRAFT_SCALE_EXTRA", "2").toInt
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    def hostStamp(): (Double, Double) = {
      Thread.sleep(300) // let the just-finished sample's load settle
      val m = graft.tools.HostProbe.sinMops(32)
      val g = graft.tools.HostProbe.bandwidthGBs(24, 150)
      System.err.println(f"[bench] host stamp: sin $m%.0f Mops/s, mem $g%.1f GB/s")
      (m, g)
    }
    def runScalingOnce(): ScalingResult = {
      val cBefore = cpuControlEfficiency(nLo, nHi)
      val levels = Seq.fill(pairs)(Seq(nLo, nHi)).flatten ++
        Seq.fill(extra)(Seq(nLo, nHi)).flatten
      val stamps = scala.collection.mutable.ArrayBuffer(hostStamp())
      val samples = levels.map { c =>
        spark = newSession(c)
        val g0 = gcMs()
        val r = ValidationPipeline.timed(spark, sfDir, repl)
        spark.stop()
        stamps += hostStamp()
        (c, r, gcMs() - g0)
      }
      samples.foreach { case (c, (n, _, sec), g) =>
        System.err.println(f"[bench] scaling sample cores=$c wall=$sec%.2f s (${n / sec}%.0f cps, gc ${g}ms)")
      }
      val scaling = Seq(nLo, nHi).map { c =>
        val (n, nBad, sec, g) = samples.collect { case (`c`, r, g) =>
          (r._1, r._2, r._3, g) }.minBy(_._3)
        (c, n, nBad, sec, n / sec, g)
      }
      val Seq((_, nClips, nBad, secLo, cpsLo, gcLo), (_, _, _, secHi, cpsHi, gcHi)) = scaling
      val medEff = {
        val Seq(mLo, mHi) = Seq(nLo, nHi).map { c =>
          median(samples.collect { case (`c`, r, _) => r._1 / r._3 })
        }
        (mHi / mLo) / 4.0
      }
      val cAfter = cpuControlEfficiency(nLo, nHi)
      ScalingResult(nClips, nBad, secLo, cpsLo, secHi, cpsHi,
        (cpsHi / cpsLo) / 4.0, cBefore, cAfter, gcLo, gcHi, medEff,
        stamps.toSeq)
    }
    // attempt health = ratio control AND median stamps over thresholds AND
    // min stamps over the (lower) floors; the score below 1.0 means the
    // worst health dimension missed its threshold by that factor (used
    // only to pick the least-degraded attempt when every attempt failed
    // the gate)
    def healthScore(a: ScalingResult): Double =
      Seq(a.control / HealthyControl, a.medMops / HealthyMops,
        a.medGbs / HealthyGbs, a.minMops / FloorMops,
        a.minGbs / FloorGbs).min
    val attempts = scala.collection.mutable.ArrayBuffer(runScalingOnce())
    while (healthScore(attempts.last) < 1.0 && attempts.size < maxAttempts) {
      val a = attempts.last
      System.err.println(f"[bench] degraded host (control ${a.control}%.3f" +
        f" vs $HealthyControl%.2f, stamps med ${a.medMops}%.0f Mops vs" +
        f" $HealthyMops%.0f / ${a.medGbs}%.1f GB/s vs $HealthyGbs%.1f," +
        f" min ${a.minMops}%.0f Mops vs floor $FloorMops%.0f /" +
        f" ${a.minGbs}%.1f GB/s vs floor $FloorGbs%.1f)" +
        f" — rerunning scaling section" +
        s" (attempt ${attempts.size + 1}/$maxAttempts)")
      attempts += runScalingOnce()
    }
    // evidence of record = the attempt with the healthiest contemporaneous
    // host (== the only/last attempt unless all were degraded)
    val rec = attempts.maxBy(healthScore)
    val hostDegraded = healthScore(rec) < 1.0
    val (nClips, nBad, secLo, cpsLo, secHi, cpsHi, efficiency) =
      (rec.nClips, rec.nBad, rec.secLo, rec.cpsLo, rec.secHi, rec.cpsHi, rec.efficiency)
    val controlEff = rec.control

    // 2. second scaling axis: vary DATA SIZE at fixed cores (local[4N]) —
    // 0.5x and 2x the replicate used above. If clips/s is flat in rows, the
    // N->4N efficiency is not flattered by fixed per-job overhead at the
    // chosen replicate (the regime probe the round-2 verdict asked for).
    // every size — including the base replicate — measured under the SAME
    // best-of-2 back-to-back protocol, so the spread compares like with
    // like (the headline N->4N rows above keep their own interleaved
    // min-of-3 protocol); distinct() keeps repl=1 from duplicating itself
    val sizeAxis: Seq[(Int, Long, Double, Double)] =
      Seq(math.max(1, repl / 2), repl, repl * 2).distinct.map { k =>
        val runs = Seq.fill(2) {
          spark = newSession(nHi)
          val r = ValidationPipeline.timed(spark, sfDir, k)
          spark.stop()
          r
        }
        val (n, _, sec) = runs.minBy(_._3)
        (k, n, sec, n / sec)
      }.sortBy(_._1)
    val sizeRows = sizeAxis.map { case (k, n, sec, cps) =>
      f"| replicate=$k ($n clips) | $sec%.2f | $cps%.0f |"
    }.mkString("\n")
    val cpsFlat = sizeAxis.map(_._4)
    val sizeSpread = (cpsFlat.max - cpsFlat.min) / cpsFlat.max
    // the flattery-relevant number: throughput delta between the criterion's
    // operating size (replicate=repl) and DOUBLE that size. Fixed-overhead
    // flattery requires throughput to FALL as rows double; a small (or
    // negative) delta at the operating point clears the criterion even when
    // the half-size sample catches a host dip and widens the full spread
    val critDelta = {
      val at = sizeAxis.find(_._1 == repl).map(_._4)
      val at2 = sizeAxis.find(_._1 == repl * 2).map(_._4)
      (for (a <- at; b <- at2) yield (b - a) / a).getOrElse(Double.NaN)
    }

    // 2b. resume-from-checkpoint evidence at bench scale (round-6, the
    // round-5 stretch ask): the checkpointed Runner at local[4N] over the
    // same replicated input — (a) a full fresh run of all 32 buckets,
    // (b) a fresh run killed after 24 buckets (maxBuckets — the crash
    // stand-in), (c) a resume of (b) completing the remaining 8. The
    // scoped-input path makes resume PROPORTIONAL: the fused synth pass
    // runs only for the todo buckets, while uniqueness reads the cheap
    // full-table metadata lineage (Runner.scopedInput/globalInput). The
    // resumed wall should therefore sit near
    // (cheap global scan) + 8/32 x (full synth+write work), far below the
    // full wall. Skipped in scaling-only stability reruns.
    // Stamped like the scaling section: the first two stamped runs showed
    // the crash-24 reading 24-42% ABOVE the full-32 wall, while a
    // controlled both-orders probe at 956-1098 Mops read crash24 40.9-41.2 s
    // vs full32 50.9-51.1 s (proportional 0.80 in either order) — the
    // in-bench inversions were minute-scale host windows landing on one
    // sub-measurement, which only a stamp bracketing each run can show.
    val resumeStats: Option[(Double, Double, Double, Int, Int, Seq[Double])] =
      if (scalingOnly) None
      else Some {
        spark = newSession(nHi)
        val suite = ValidationPipeline.fullSuite(spark, sfDir)
        val globalIn = ValidationPipeline.replicatedBase(spark, sfDir, repl)
        def timedRun(outDir: String, maxB: Int): (Double, Int) = {
          val t0 = System.nanoTime()
          val sum = graft.run.Runner.run(spark,
            ValidationPipeline.augmented(spark, sfDir, repl), suite, outDir,
            maxBuckets = maxB,
            scopedInput =
              Some(todo => ValidationPipeline.augmented(spark, sfDir, repl, Some(todo))),
            globalInput = Some(globalIn))
          ((System.nanoTime() - t0) / 1e9, sum.processed.size)
        }
        val dirFull = graft.io.Scratch.register("graft-bench-resume-full")
        val dirCrash = graft.io.Scratch.register("graft-bench-resume-crash")
        // untimed 2-bucket warmup on a throwaway dir: the first Runner
        // invocation absorbs plan-compile/JIT costs that would otherwise
        // inflate full_sec and FLATTER the resume ratio (measured at smoke
        // scale: a cold full run read 16.6 s against a warm 24-bucket run
        // of 5.4 s)
        timedRun(graft.io.Scratch.register("graft-bench-resume-warm"), 2)
        def stamp(): Double = {
          val m = graft.tools.HostProbe.sinMops(32)
          System.err.println(f"[bench] resume-section stamp: sin $m%.0f Mops/s")
          m
        }
        val s0 = stamp()
        val (fullSec, nFull) = timedRun(dirFull, Int.MaxValue)
        val s1 = stamp()
        val (crashSec, nCrash) = timedRun(dirCrash, 24)
        val s2 = stamp()
        val (resumeSec, nResume) = timedRun(dirCrash, Int.MaxValue)
        val s3 = stamp()
        require(nFull == 32 && nCrash == 24 && nResume == 8,
          s"resume section bucket counts wrong: $nFull/$nCrash/$nResume")
        spark.stop()
        (fullSec, crashSec, resumeSec, nCrash, nResume, Seq(s0, s1, s2, s3))
      }

    // EVERY sentence below is derived from values measured in THIS run —
    // no frozen cross-round claims (round-4 What's-wrong #1: a hard-coded
    // "all >= 0.8" span survived into a regeneration whose own table read
    // 0.732; cross-round history belongs to BASELINE.md, which is written
    // by hand, not by this template).
    val criterionLine =
      if (efficiency >= 0.8)
        f"**meets** the north-rule criterion (>= 0.8)"
      else if (hostDegraded)
        f"is **below** the 0.8 criterion, measured on a host stamped " +
          f"DEGRADED in every attempt (see the health-policy note below); " +
          f"the engine-vs-ceiling ratio is the meaningful number for this run"
      else
        f"is **below** the north-rule criterion (>= 0.8) on a healthy host"
    val attemptRows = attempts.zipWithIndex.map { case (a, i) =>
      f"| ${i + 1} | ${a.efficiency}%.3f | ${a.controlBefore}%.3f/${a.controlAfter}%.3f | ${a.medMops}%.0f/${a.minMops}%.0f | ${a.medGbs}%.1f/${a.minGbs}%.1f | ${if (healthScore(a) < 1.0) "degraded" else "healthy"} |"
    }.mkString("\n")
    val policyNote =
      if (attempts.size == 1 && !hostDegraded)
        f"""Host-health policy: the sustained ratio control was measured
           |before AND after the scaling samples
           |(${rec.controlBefore}%.3f / ${rec.controlAfter}%.3f, threshold
           |$HealthyControl%.2f) and an absolute stamp pair (full-width sin
           |Mops/s + streaming-read GB/s — the memory-side window detector
           |the ratio control is blind to) was taken before, between, and
           |after every engine sample (medians ${rec.medMops}%.0f Mops /
           |${rec.medGbs}%.1f GB/s vs thresholds $HealthyMops%.0f /
           |$HealthyGbs%.1f; minima ${rec.minMops}%.0f / ${rec.minGbs}%.1f
           |vs floors $FloorMops%.0f / $FloorGbs%.1f). All five health
           |dimensions cleared on the first attempt, so no rerun was
           |needed.""".stripMargin
      else
        f"""Host-health policy: an attempt is healthy only if the sustained
           |ratio control (before AND after the samples) clears
           |$HealthyControl%.2f AND the MEDIAN over the absolute host
           |stamps taken before/between/after every engine sample clears
           |$HealthyMops%.0f sin-Mops/s and $HealthyGbs%.1f streaming-read
           |GB/s AND the stamp MINIMA clear the floors $FloorMops%.0f /
           |$FloorGbs%.1f (the absolute stamps catch mutator-side windows
           |that slow both thread counts proportionally and so leave the
           |ratio control healthy; the median aggregates them because the
           |gate targets SUSTAINED windows — transient single-stamp dips
           |are already filtered by the per-level-minimum wall estimator,
           |and min-over-a-dense-series grows stricter with the stamp
           |count; the floors still fail a window that is bimodal within
           |one attempt — calibration in BASELINE.md). A degraded attempt
           |reruns the whole section, up to $maxAttempts attempts; the
           |retry trigger is host health ONLY — the efficiency number never
           |triggers or survives a retry selection. All attempts this run:
           |
           || attempt | efficiency | control before/after | Mops med/min | GB/s med/min | verdict |
           ||---|---|---|---|---|---|
           |@ATTEMPT_ROWS@
           |
           |Evidence of record = the healthiest-host attempt${if (hostDegraded) ", still degraded -> stamped `host_degraded: true` in the JSON line" else ""}.""".stripMargin
          .replace("@ATTEMPT_ROWS@", attemptRows)
    val benchMd =
      f"""# BENCH — validated clips/sec + N->4N scaling evidence
         |
         |All numbers in this file were measured by the single run that wrote
         |it (cross-round history and protocol derivations: BASELINE.md).
         |
         |Workload: full validation pipeline (audio synth+decode, PCM SNR>=30dB
         |allclose, byte/dur consistency, null/empty/range/enum checks, global
         |clip_id uniqueness, referential anti-join, per-bucket verdicts) over
         |`$sfDir` ($nClips clips, $nBad bad rows). Same input, same JVM, two
         |parallelism levels local[$nLo] vs local[$nHi] (the driver-sanctioned
         |"N and 4N cores" stand-in for N vs 4N executors; 32 physical cores).
         |Per-level minimum over $pairs interleaved runs per level plus
         |$extra extra draws at EACH level — the same count per level, so
         |the extra sampling cannot one-sidedly lower the noisier level's
         |minimum (round-5 drew extras only at 4N, which under a per-level
         |minimum estimator biases efficiency upward; every draw is printed
         |in the run log, and the per-level MEDIAN efficiency is reported
         |below as the estimator cross-check). First pair warms JIT/page
         |cache; the JVM runs with a fixed GC/JIT background-thread budget
         |so helper threads do not scale with the level (build.sbt); GC wall
         |per recorded sample is in the JSON line. The scaling section
         |runs BEFORE the per-query sweep: sweep-polluted JVM state
         |(metaspace/old-gen debris) measurably depresses the 4N level
         |(round-4 finding, quantified in BASELINE.md), so the headline
         |criterion is measured in the cleanest JVM state.
         |
         || parallelism | wall (s) | clips/sec |
         ||---|---|---|
         || local[$nLo]  | $secLo%.2f | $cpsLo%.0f |
         || local[$nHi] | $secHi%.2f | $cpsHi%.0f |
         |
         |**Scaling efficiency (throughput_4N / throughput_N) / 4 =
         |$efficiency%.3f**, which $criterionLine. The same attempt's
         |per-level MEDIAN estimator reads ${rec.medianEfficiency}%.3f —
         |reported so the min-based headline can be checked against an
         |estimator that extra draws cannot bias downward-only.
         |
         |@POLICY_NOTE@
         |
         |Launch modes: this protocol runs identically under
         |`spark-submit --class graft.Bench <jar>` (north-rule launch mode)
         |and sbt; cross-launch agreement numbers for past rounds are
         |recorded in BASELINE.md, not here. `graft.SubmitPipeline` runs the
         |single-level pipeline under `spark-submit --master local[N]` for
         |per-invocation evidence.
         |
         |Hardware control, same run: a pure-CPU StrictMath.sin loop (no Spark,
         |no allocation, no shared state) at the same two thread counts scales
         |at **$controlEff%.3f** (min of before/after brackets) — a
         |latency-bound yardstick for the host's active-core frequency
         |behavior, NOT a hard ceiling: it is blind to memory-side host
         |windows (bandwidth/steal), so the engine's ratio to it can
         |legitimately exceed 1 when such a window depresses the control's
         |bracket more than the samples. 8->32 threads this control drops
         |to ~0.70-0.79 on this virtualized host, which is why the
         |criterion runs at N=$nLo: it keeps the measurement about the
         |engine, not the clock governor. The pipeline's efficiency relative
         |to the control is
         |${if (controlEff > 0) f"${efficiency / controlEff}%.3f" else "n/a"}.
         |
         |Second scaling axis — data size at fixed cores (local[$nHi], best of
         |2 per size): throughput must be flat in rows/s, ruling out
         |fixed-overhead flattery of the N->4N number at replicate=$repl.
         |
         || input size | wall (s) | clips/sec |
         ||---|---|---|
         |@SIZE_ROWS@
         |
         |@RESUME_MD@
         |
         |Max spread across sizes: ${f"$sizeSpread%.3f"} (fraction of peak
         |clips/s; small = throughput is row-linear in this regime). At the
         |criterion's operating point, doubling the rows changes clips/s by
         |${f"${critDelta * 100}%+.1f"}%% — fixed-overhead flattery of the
         |N->4N number would require a strongly NEGATIVE value here (per-row
         |throughput collapsing once overhead amortizes), so a small or
         |positive delta rules it out even when a half-size sample catches a
         |host dip and widens the raw spread.
         |""".stripMargin
        // interpolated AFTER stripMargin: these fragments contain markdown
        // table rows whose leading '|' pipes would otherwise be eaten as
        // margin markers
        .replace("@SIZE_ROWS@", sizeRows)
        .replace("@POLICY_NOTE@", policyNote)
        .replace("@RESUME_MD@", resumeStats match {
          case Some((f, c, r, nc, nr, st)) =>
            f"""Resume-from-checkpoint, same run (checkpointed Runner at
               |local[$nHi] over the same input — the north rule's
               |"resumable from checkpoints", measured at bench scale): a
               |full fresh run of all 32 buckets took $f%.2f s; a fresh run
               |killed after $nc buckets took $c%.2f s; resuming it
               |completed the remaining $nr buckets in $r%.2f s —
               |${100 * r / f}%.0f%% of the full wall for
               |${100.0 * nr / 32}%.0f%% of the buckets. Resume re-derives
               |the expensive fused synth pass ONLY for unfinished buckets
               |(Runner.scopedInput); the floor under strict
               |proportionality is the cheap full-table metadata scan the
               |global uniqueness check irreducibly needs, plus fixed job
               |overhead. Host stamps bracketing the three runs, in order:
               |${st.map(m => f"$m%.0f").mkString(" / ")} sin-Mops/s — read
               |any full/crash/resume inversion against these (a controlled
               |both-orders probe shows the walls proportional to bucket
               |count on a quiet host: BASELINE.md round-6 notes).""".stripMargin
          case None =>
            "Resume evidence: not measured in this run (scaling-only rerun)."
        })
    // only the real benchmark scale updates the committed artifact — a
    // smoke run at sf0.001 must not clobber BENCH.md with startup-dominated
    // numbers that say nothing about scaling
    if (sfDir.contains("sf0.1"))
      try Files.writeString(Paths.get("/root/repo/BENCH.md"), benchMd)
      catch { case e: Throwable => System.err.println(s"[bench] BENCH.md write failed: $e") }

    // 3. per-query sweep, in the now-expendable JVM (BENCH.md is already
    //    safely written above), bracketed by an ABSOLUTE host-speed stamp:
    //    the control efficiency above is a ratio (host ceiling), useless
    //    for normalizing per-query round-over-round deltas — the Mops/s of
    //    the same sin loop at full width is the yardstick that lets the
    //    next round's verdict separate engine deltas from host drift
    //    (round-4 ask #5; min of before/after = conservative host speed
    //    during the sweep window).
    val sweepMopsBefore = if (scalingOnly) 0.0 else cpuRateMops(cpus)
    val results: Seq[(String, Double)] =
      if (scalingOnly) Seq.empty else perQuerySweep()
    val sweepMopsAfter = if (scalingOnly) 0.0 else cpuRateMops(cpus)

    // JSON line layout (round-6, the round-5 top defect): round-5's line
    // grew to ~3.1 KB (9-decimal per-query seconds x 50 entries + the
    // per-attempt array) and outgrew the driver's tail-capture window, so
    // BENCH_r05.json recorded `parsed: null`. The line now holds 3-decimal
    // seconds, attempts COUNT only (the per-attempt table lives in
    // BENCH.md, written above), and is printed last, alone, as the final
    // stdout line. Budget: ~50 query entries x ~24 chars + ~0.4 KB of
    // scaling/size/control fields ~= 1.7 KB, well inside the window.
    val qs = results.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val scal =
      f"""{"n_clips":$nClips,"n_cores":$nLo,"n4_cores":$nHi,"n_sec":$secLo%.3f,"n4_sec":$secHi%.3f,"n_cps":$cpsLo%.1f,"n4_cps":$cpsHi%.1f,"efficiency":$efficiency%.3f,"med_efficiency":${rec.medianEfficiency}%.3f,"cpu_control_eff":$controlEff%.3f,"host_degraded":$hostDegraded,"gc_ms_n":${rec.gcMsLo},"gc_ms_n4":${rec.gcMsHi},"attempts_n":${attempts.size},"mops_med":${rec.medMops}%.0f,"mops_min":${rec.minMops}%.0f,"gbs_med":${rec.medGbs}%.1f,"gbs_min":${rec.minGbs}%.1f}"""
    val sizes = sizeAxis.map { case (k, n, sec, cps) =>
      f"""{"replicate":$k,"clips":$n,"sec":$sec%.2f,"cps":$cps%.0f}"""
    }.mkString("[", ",", "]")
    val sweepCtl =
      f"""{"mops_before":$sweepMopsBefore%.1f,"mops_after":$sweepMopsAfter%.1f}"""
    val resumeJson = resumeStats.map { case (f, c, r, nc, nr, st) =>
      f""","resume":{"full_sec":$f%.2f,"crash_sec":$c%.2f,"resume_sec":$r%.2f,"crash_buckets":$nc,"resumed_buckets":$nr,"mops":[${st.map(m => f"$m%.0f").mkString(",")}]}"""
    }.getOrElse("")
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","scaling":$scal,"size_axis":$sizes,"sweep_control":$sweepCtl$resumeJson}""")
  }

  /** ABSOLUTE host-speed stamp (Mops/s of the sin loop at full width):
    * comparable across rounds on the same host class, so per-query deltas
    * can be normalized for host drift instead of hand-waved. Kernel owned
    * by HostProbe (shared with the standalone probe and the scaling
    * section's stamp gate). */
  private def cpuRateMops(threads: Int): Double =
    graft.tools.HostProbe.sinMops(threads)

  /** Pure-CPU scaling control: StrictMath.sin loops on raw JVM threads at
    * the two levels — no Spark, no allocation, no shared state. It tracks
    * the host's active-core frequency/hypervisor-contention behavior, but
    * it is a latency-bound LOWER-FIDELITY yardstick, not a hard ceiling:
    * it cannot see memory-side host windows (bandwidth, steal), so the
    * engine's measured efficiency can legitimately exceed it when such a
    * window hits the control's bracket harder than the samples (observed
    * round-5: engine 0.902 over control 0.862). */
  private def cpuControlEfficiency(nLo: Int, nHi: Int): Double = {
    def rate(threads: Int, work: Long): Double =
      graft.tools.HostProbe.sinRate(threads, work)
    rate(nHi, 10000000L) // warmup
    // sustained (~15 s per level): short bursts overstate the ceiling —
    // the host throttles under sustained load, which is the pipeline's
    // actual operating regime
    val samples = Seq.fill(2) {
      val lo = rate(nLo, 400000000L)
      val hi = rate(nHi, 400000000L)
      (lo, hi)
    }
    val bestLo = samples.map(_._1).max
    val bestHi = samples.map(_._2).max
    (bestHi / bestLo) / (nHi.toDouble / nLo)
  }
}
