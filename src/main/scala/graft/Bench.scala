package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark. Driver contract: a JSON line on stdout; the
  * driver tail-parses a ~2-3 KB stdout tail and takes the LAST line
  * starting with `{`. Two line kinds per completed part, in order:
  *  - a CUMULATIVE full-schema line (each a superset of the previous,
  *    final one marked "partial":false) — mirrored to the
  *    BENCH_partial.json sidecar (best-effort);
  *  - then a COMPACT headline line (< ~1 KB: the north-rule numbers,
  *    suspect flags, guards, and a "full" pointer to the sidecar).
  * The compact twin is printed LAST so the tail-parse always finds a
  * complete parseable line: round 4 completed (rc=0) yet shipped
  * parsed:null because the full-schema line had grown to 2,801 bytes
  * and its head fell outside the tail window; round 3 shipped rc=124 /
  * parsed:null because the old protocol both overran the driver window
  * AND printed nothing until the very end. A timeout mid-protocol still
  * leaves parts 1..k on stdout, each ending in a short `{`-line.
  *
  * Parts, in the order of their evidentiary value:
  *  1. headline: the end-to-end clip-dedup pipeline (sketch -> merged
  *     LSH/simhash/anagram candidates -> kernel verify -> connected
  *     components) over the deterministic synthetic clip table at
  *     local[N] and local[4N] (N=1 on the 32-core sandbox — the
  *     "N and 4N executors" evidence of the north rule; BASELINE.md
  *     explains why the low-contention pair is the faithful cluster
  *     stand-in) plus local[cpus] for peak throughput. Input size is the
  *     COMPUTE-DOMINATED one (default 3M clips = 1.2M clusters): the
  *     serial floor amortizes with input size — and what counts as
  *     compute-dominated moves with the kernels, so the size has
  *     tracked them. 750k clips was that regime in round 4 (1-core reps
  *     ~400 s); the first round-5 kernel wave (OPH+SWAR sketch) cut the
  *     1-core rep to ~92 s and 750k measured 0.70 efficiency in QUIET
  *     windows vs 0.947 at 1.5M the same hour (lo 204.2 s / hi 53.9 s)
  *     — so the headline moved to 1.5M. The second wave (pair_accept
  *     verify decision + DL affix-strip/row-min abort, runs E/F) cut
  *     the 1.5M 1-core rep to ~100-106 s and the 4-core rep to ~30 s,
  *     where the fixed floors (driver job latency, localCheckpoint
  *     actions, the CC round — ~4-8 s, NOT per-row work) cost 12-25%
  *     of the 1->4 ratio again: run F read 0.876 and run G 0.764 on
  *     byte-identical guards, pure window length. 3M clips restores
  *     the ~205 s / ~55 s regime the 0.947 reading came from. The
  *     larger input is the regime a 1000-executor 100 TB run lives in;
  *     the per-rep cost (~205 s at 1 core) remains BELOW the round-4
  *     budget's ~400 s reps — the summed worst-case below is unchanged.
  *     Size fixed here, in code, never chosen per run.
  *  2. (default OFF, SPARK_GRAFT_BENCH_SMALL=1) the same pipeline at the
  *     legacy round-1/2 size; round-over-round comparison lives in
  *     BASELINE.md instead — the round-3 postmortem's arithmetic showed
  *     this block alone cannot fit the driver window together with the
  *     750k headline.
  *  3. variant-matcher throughput at N and 4N (broadcast-once steady
  *     state — directly comparable to the reference's published items/s).
  *  4. the SparkEntry operator queries at the given sf dir, each forced
  *     end-to-end with a noop sink; deadline-aware (see budget below).
  *
  * Sampling protocol (BASELINE.md) — rep BOUNDS fixed BEFORE any
  * measurement; within them, sampling is adaptive on the REP SERIES
  * SHAPE only (convergence), identically at every level, never on the
  * efficiency being reported:
  *  - each child runs DedupStageBench.timedReps: at least minReps timed
  *    reps, continuing (to a rep cap AND a per-child wall deadline)
  *    only while the last rep improved the best by >10% (a JIT tail
  *    still descending) or read >1.3x the best (a noise burst — the
  *    floor is unconfirmed exactly then). Both triggers tighten the
  *    level's min toward its true time; both apply at lo and hi alike.
  *  - the lo (1-core) level gets ONE fresh child JVM (bounded 80k
  *    warmup, minReps 2 / maxReps 3 / deadline 650 s): 1-core spreads
  *    are 2-15% and its shallow rep-1 JIT tail (~1.25-1.4x) is cheaper
  *    to discard via min-of-reps than to pre-warm (~270 s). The hi
  *    (4-core) level gets TWO child JVMs (minReps 2 / maxReps 4 /
  *    deadline 360 s each) with the matcher part between them (~8-10
  *    min of wall): noise is EPISODIC on ~10-30 min scales, longer
  *    than one child, so the second child samples a different window.
  *    Hi children warm up with one UNTIMED FULL-SIZE pass (fresh seed):
  *    the full-size JIT tail costs 1-2 reps (measured rep sequences
  *    [112.8, 85.7, 52.7, 69.5, 54.2, 49.7] at 4 cores, quiet calibs,
  *    after an 80k warmup; -Xms+AlwaysPreTouch ruled out page faults)
  *    and at the hi level that tail rep costs the same ~110 s as the
  *    warmup — spending it untimed makes every timed rep a valid floor
  *    sample, where run I's 2-rep children never escaped the JIT phase
  *    (hi_reps 87-425 s vs a converged ~50 s floor).
  *    Noise is one-sided (it only ever ADDS time to a deterministic
  *    job), so min over reps is a floor estimator that extra samples
  *    only tighten. Every rep is echoed in the JSON (hi_reps carries
  *    all children, oldest first) and every rep is BRACKETED by
  *    calibration probes (calib_sec: pre + after each rep) so window
  *    quality is visible per rep, not per child.
  *    Heap per child 8 GiB/core, cap 48 (memory-per-core parity across
  *    levels, as a real cluster holds); peak runs 1-2 reps (throughput
  *    evidence only, not part of any efficiency ratio) and is
  *    budget-conditional.
  *  - lo runs before hi within each part, parts interleave the levels
  *    across the wall clock so multi-hour host-window drift (same
  *    commit+input measured 60 s vs 145-200 s at 4 cores hours apart)
  *    cannot systematically favor one level;
  *  - efficiency = (T_N/T_4N)/4 from per-level min AND per-level median;
  *    the artifact carries both. The headline line is emitted after the
  *    FIRST hi child (efficiency from 2 hi reps) and re-emitted with
  *    the refined 4-rep value after the second — a driver kill between
  *    them still ships a complete headline.
  *  - escalation (part 3c) is SYMMETRIC: an extra 1-rep lo child when
  *    efficiency reads > 1.0 (>1 is physically impossible for this
  *    job — it means the lo floor is episode-inflated, the direction
  *    that FABRICATES efficiency; the round-4 official run printed
  *    1.128 exactly this way) or when the lo level's calibration
  *    probes never saw a quiet window — repeated up to TWICE while the
  *    reading stays > 1.0 (run L: one escalation rep read 192.9 s in a
  *    still-degraded window against a best-ever hi floor and the run
  *    shipped 1.060; a second lo sample is bias-safe to repeat because
  *    with a min-floor estimator extra LO samples can only LOWER the
  *    reported efficiency, the honest direction); else ONE extra hi
  *    child when efficiency reads < 0.85 or the hi calibs were all
  *    degraded (the hi side stays bounded at one — repeating IT would
  *    re-introduce the flattering-direction bias). With a min-floor
  *    estimator, one-sided hi-only resampling could only ever RAISE
  *    the reported number; the symmetric trigger removes that bias —
  *    extra samples of whichever level is suspect tighten its floor
  *    toward the true time, in the direction honesty requires. The calib gate (min calib of a level
  *    > 2x the quiet reference measured in BASELINE.md) is independent
  *    of the metric value; per-level `lo_suspect`/`hi_suspect` flags in
  *    the artifact self-document any reading whose windows were all
  *    degraded. The flags are ONE-SIDED evidence (BASELINE.md round-5
  *    caveat): the bandwidth probe catches sustained bus-contention
  *    episodes but is blind to bursty stalls that straggle a multi-core
  *    phase while a ~0.4 s probe sample reads quiet — suspect=true
  *    proves degradation, suspect=false does not certify quiet; the min
  *    over time-diversified children stays the primary defense.
  *
  * WORST-CASE WALL BUDGET (the round-3 failure was an un-summed
  * protocol; this one is summed, with per-child DEADLINES capping the
  * adaptive sampling. Quiet per-rep inputs at 3M clips on the run-F/H
  * kernels: lo ~180-270 s, hi ~50-115 s, matcher lo ~95-110 s /
  * hi ~21-28 s; each child's timed section is bounded by its deadline
  * plus at most one rep that started just under it):
  *   part 1 lo   child: JVM+gen+warmup ~160 s + timed <=650+270 s = ~1080 s
  *   part 1 hi-A child: JVM+gen ~65 s + full warmup ~110-170 s +
  *     timed <=360+135 s                                          = ~730 s
  *     -> headline (efficiency) on stdout by ~1810 s = ~30 min worst
  *       (typical quiet: lo [270,190,185] + hi warm+[55,54] = ~19 min)
  *   part 3 lo   child: build+warmup ~60 s + timed <=260+160 s    = ~480 s
  *   part 3 hi   child: ~40 s + timed <=90+45 s                   = ~175 s
  *   part 3b hi-B child (second wall-clock window)                = ~730 s
  *   part 3b' matcher hi-B child                                  = ~175 s
  *     -> refined headline on stdout by ~3370 s ABSOLUTE worst — that
  *     case needs every child pinned at its deadline, i.e. a fully
  *     degraded 45+ min episode, in which case each completed part has
  *     already shipped a complete compact line and the numbers carry
  *     suspect flags; TYPICAL quiet wall for parts 1+3+3b is ~28 min
  *   part 3c (symmetric dedup escalation, ONE side only):
  *     lo-B(+lo-C) children, 1 rep each — up to TWO while the reading
  *       stays > 1.0 or on lo calib-suspect, each gated on > 700 s of
  *       budget remaining                                    = ~560 s x2
  *     else hi-C child (full warm, minReps 2 / maxReps 3 / deadline
  *       240, efficiency < 0.85 or hi calib-suspect, > 400 s) = ~610 s
  *   part 3d (symmetric matcher escalation, same triggers and the same
  *     lo-side x2 bound on the matcher levels): lo 1 rep ~165 s (x2) /
  *     hi ~175 s (> 400/150 s of budget; if a dedup lo escalation
  *     already ran, the budget check skips this)
  *   part 4 peak child: ~80 s + 1-2 x ~120 s + metrics ~90 s      = ~410 s
  *     (2 reps when > 500 s of soft budget remain — clock-decided,
  *     never metric-conditioned; skipped entirely below 300 s)
  *   part 5 sweep: ~190 s quiet (incl. the ~10 s emb-guards and ~30 s
  *     audio-guards passes), deadline-capped (1-rep mode sheds the
  *     audio pass, then skip)
  *   The budget-conditional tail (escalation, then peak, then sweep)
  *   degrades in reverse priority order against the soft budget: its
  *   gates compare against elapsed wall, so a noisy front half sheds
  *   the tail automatically. A single transient child retry (runChild)
  *   can add one level's cost; the deadline then sacrifices the tail,
  *   never parts 1/3/3b.
  */
object Bench {

  /** JVM flags inherited from this process that a child Spark JVM needs
    * (the JDK17 --add-opens set and -D conf), plus a level-sized heap.
    */
  private def childJvmArgs(xmxGb: Int): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val in = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toList
    val keep = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < in.length) {
      val a = in(i)
      if (a == "--add-opens" && i + 1 < in.length) {
        keep += a; keep += in(i + 1); i += 2
      } else if (a.startsWith("--add-opens=") || a.startsWith("-D")) {
        keep += a; i += 1
      } else i += 1
    }
    keep.toSeq :+ s"-Xmx${xmxGb}g"
  }

  /** 8 GiB per core — the SAME per-core heap at every level, because the
    * lo level's floor is 8 GiB for ONE core and a fair two-cluster-size
    * comparison gives each "executor" identical memory/core (a real
    * cluster's N and 4N configurations hold memory-per-core constant).
    * The previous 4 GiB/core sizing handed the 4-core child HALF the
    * per-core heap of the 1-core child and cost a measured ~10% at the
    * hi level (65.7 s @16 GiB vs 59.2 s @48 GiB, same window, 3M clips)
    * — a protocol artifact deflating the efficiency ratio, not a plan
    * property. Cap 48 (leave the 128 GiB box page-cache headroom).
    */
  private def heapGbFor(cpus: Int): Int =
    math.min(48, math.max(8, cpus * 8))

  /** Run a bench child JVM, return its RESULT line fields. Child stdout
    * is consumed here (the parent's stdout must carry only the JSON
    * lines); child stderr is drained to a buffer and replayed on failure.
    */
  private def runChild(mainClass: String, xmxGb: Int,
      args: Seq[String], maxReps: Int, minReps: Int = -1,
      deadlineSec: Double = 1e9, withMetrics: Boolean = false,
      attempt: Int = 1): Map[String, String] = {
    val javaBin = new java.io.File(
      new java.io.File(sys.props("java.home"), "bin"), "java").getAbsolutePath
    val cmd = Seq(javaBin) ++ childJvmArgs(xmxGb) ++
      Seq("-cp", sys.props("java.class.path"), mainClass) ++ args
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_GRAFT_BENCH_REPS", maxReps.toString)
    // minReps defaults to maxReps (exact rep count); levels with a
    // convergence window pass minReps < maxReps — bounded by BOTH the
    // rep cap and the per-child deadline (see timedReps: metric-blind)
    pb.environment().put("SPARK_GRAFT_BENCH_MIN_REPS",
      (if (minReps > 0) minReps else maxReps).toString)
    pb.environment().put("SPARK_GRAFT_BENCH_DEADLINE_SEC",
      deadlineSec.toString)
    if (withMetrics) pb.environment().put("SPARK_GRAFT_STAGE_METRICS", "1")
    val p = pb.start()
    val errBuf = new java.lang.StringBuilder
    val errThread = new Thread(() => {
      val r = new java.io.BufferedReader(
        new java.io.InputStreamReader(p.getErrorStream))
      var line = r.readLine()
      while (line != null) {
        errBuf.append(line).append('\n')
        line = r.readLine()
      }
    })
    errThread.setDaemon(true)
    errThread.start()
    val out = scala.io.Source.fromInputStream(p.getInputStream).mkString
    val rc = p.waitFor()
    errThread.join(5000)
    val result = out.linesIterator.find(_.startsWith("RESULT "))
    if (rc != 0 || result.isEmpty) {
      System.err.println(s"[bench-child] $mainClass ${args.mkString(" ")} " +
        s"rc=$rc attempt=$attempt; stderr tail:\n" +
        errBuf.toString.takeRight(2000))
      // one retry: a transient child failure must not zero the round's
      // whole benchmark artifact
      if (attempt < 2)
        return runChild(mainClass, xmxGb, args, maxReps, minReps,
          deadlineSec, withMetrics, 2)
      sys.error(s"bench child failed: $mainClass")
    }
    result.get.split(' ').drop(1).flatMap { tok =>
      tok.split("=", 2) match {
        case Array(k, v) => Some(k -> v)
        case _           => None
      }
    }.toMap
  }

  /** All rep times of one or more child runs at a level, oldest first. */
  private def repsOf(children: Seq[Map[String, String]]): Seq[Double] =
    children.flatMap(_.getOrElse("reps", "").split(',')
      .filter(_.nonEmpty).map(_.toDouble))

  /** Window-calibration times (pre/post per child, oldest first) — the
    * fixed bandwidth probe DedupStageBench runs around its timed reps.
    */
  private def calibOf(children: Seq[Map[String, String]]): Seq[Double] =
    children.flatMap(_.getOrElse("calib", "").split(',')
      .filter(_.nonEmpty).map(_.toDouble))

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.isEmpty) Double.NaN
    else if (s.length % 2 == 1) s(s.length / 2)
    else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
  }

  private def repsJson(xs: Seq[Double]): String =
    xs.map(t => f"$t%.3f").mkString("[", ",", "]")

  def main(args: Array[String]): Unit = {
    val wallStart = System.nanoTime()
    def elapsedSec: Double = (System.nanoTime() - wallStart) / 1e9
    // soft wall budget for the OPTIONAL tail (peak, then sweep, degrade
    // first; the 3c escalation outranks both); parts 1/3/3b always run
    // to completion — they are the artifact. Generous on purpose: in a
    // degraded host window (when the escalation matters most) elapsed
    // time is inflated too, and a tight budget would cancel the
    // escalation exactly when it is needed; every part boundary emits a
    // complete cumulative line, so a driver kill in the tail loses only
    // the tail, never the shipped headline.
    val budgetSec =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "2700").toDouble

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // N-vs-4N protocol (BASELINE.md): N = 1, 4N = 4 on the 32-core box.
    // Past ~8 local threads the single VM's shared memory bandwidth — not
    // the plan — caps speedup (measured: 1->4 cores 0.85-0.99 efficiency,
    // 2->8 0.71-0.75, 8->32 ~0.6 on identical plans); a real cluster's N
    // executors don't share one memory bus, so the low-contention pair is
    // the faithful stand-in. Peak throughput still reported at local[cpus].
    val loCpus = math.max(1, cpus / 32) // N
    val hiCpus = loCpus * 4 // 4N
    val ratio = hiCpus.toDouble / loCpus
    val dedupClusters =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_CLUSTERS", "1200000").toInt
    // warmup bounded independently of n: it exists to JIT the kernel and
    // compile codegen, not to re-run the workload. The bound tracks the
    // kernel speed: at the round-4 kernels 20k clusters was ~2 min of
    // 1-core wall; at the round-5 kernels it is ~4 s — under the C2
    // compile thresholds, so the first timed rep carried the compiler
    // (lo rep1/rep2 measured 2.2x with a 20k warmup vs 1.3x after a 75k
    // warmup in DedupStageBench). 80k clusters costs ~15-20 s at 1 core
    // and moves the JIT out of the timed reps.
    val warmClusters = math.max(300, math.min(dedupClusters / 8, 80000))

    // ---- cumulative emission ----------------------------------------
    // Two lines per completed part: the CUMULATIVE full-schema line
    // (superset of everything measured so far — timeout anywhere still
    // ships parts 1..k), then a COMPACT < ~1 KB headline twin printed
    // LAST so the driver's bounded tail-parse always lands on a complete
    // `{`-line (the round-4 full line grew to 2,801 B and overflowed the
    // tail window). The sidecar carries the full line.
    var dedupJson = ""
    var smallJson = ""
    var matcherJson = ""
    var queriesJson = "{}"
    var queriesRepsJson = "{}"
    var queriesTotal = 0.0
    var hiSec = 0.0 // best 4-core headline time (parts 1/3b/3c)
    var peakSec = -1.0 // local[cpus] peak time; -1 until part 4 runs
    var dedupCompact = ""
    var matcherCompact = ""
    // guard counters accumulate across parts (peak metrics pass, sweep)
    val guards = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def guardsJson: String =
      guards.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
    val partsDone = scala.collection.mutable.ArrayBuffer.empty[String]
    def emit(finalLine: Boolean): Unit = {
      // "value" sums only parts that actually ran; value_def names the
      // definition so the number is comparable across rounds (peak is
      // budget-conditional — without it the hi-level headline stands in)
      val valueDef =
        (if (peakSec >= 0) "peak_sec" else "hi_sec") + "+queries_total"
      val value = (if (peakSec >= 0) peakSec else hiSec) + queriesTotal
      val head =
        f"""{"metric":"total","value":$value%.3f,"unit":"sec",""" +
          s""""value_def":"$valueDef","partial":${!finalLine},"""
      val full = head +
        f""""hi_sec":$hiSec%.3f,"peak_sec":$peakSec%.3f,""" +
        f""""queries_total":$queriesTotal%.3f,""" +
        partsDone.map(p => "\"" + p + "\"").mkString("\"parts_done\":[", ",", "],") +
        s""""queries":$queriesJson,"queries_reps":$queriesRepsJson,""" +
        (if (dedupJson.nonEmpty) s""""dedup":$dedupJson,""" else "") +
        (if (smallJson.nonEmpty) s""""dedup_small":$smallJson,""" else "") +
        (if (matcherJson.nonEmpty) s""""matcher":$matcherJson,""" else "") +
        (if (guards.nonEmpty) s""""guards":$guardsJson,""" else "") +
        f""""elapsed_sec":$elapsedSec%.1f,"sf":"$sfDir"}"""
      val compact = head +
        (if (dedupCompact.nonEmpty) s""""dedup":$dedupCompact,""" else "") +
        (if (matcherCompact.nonEmpty) s""""matcher":$matcherCompact,""" else "") +
        (if (guards.nonEmpty) s""""guards":$guardsJson,""" else "") +
        f""""queries_total":$queriesTotal%.3f,"elapsed_sec":$elapsedSec%.1f,""" +
        s""""sf":"$sfDir","full":"BENCH_partial.json"}"""
      println(full)
      println(compact)
      System.out.flush()
      try {
        val w = new java.io.PrintWriter("BENCH_partial.json")
        try w.println(full) finally w.close()
      } catch { case _: Throwable => () }
    }

    // fullWarm: warm up with an untimed FULL-SIZE pipeline pass (fresh
    // seed, same row count) instead of the bounded 80k-cluster table.
    // The first 1-2 full-size passes of a child run 1.8-2.2x steady
    // state even after the shape warmup (C2 keeps compiling through
    // them — measured at 3M clips: rep sequences [112.8, 85.7, 52.7,
    // 69.5, 54.2, 49.7] at 4 cores with quiet calibs; -Xms+AlwaysPreTouch
    // ruled page-faulting out). At the hi level that JIT-tail rep costs
    // the same ~110 s as the full warmup, so spending it UNTIMED buys a
    // child whose every timed rep is a valid floor sample — run I's
    // three 2-rep hi children never got past the JIT phase and read
    // 87-425 s where the converged floor was ~50 s. At the lo level the
    // tail is shallow (~1.25-1.4x, spreads 2-15%) and a ~270 s full
    // warmup would cost more than the ~60 s it wastes, so lo keeps the
    // bounded warmup and lets min-of-reps discard rep 1.
    def dedupChild(withCpus: Int, clusters: Int, maxReps: Int,
        minReps: Int = -1, deadlineSec: Double = 1e9,
        fullWarm: Boolean = false,
        withMetrics: Boolean = false): Map[String, String] =
      runChild("graft.tools.DedupStageBench", heapGbFor(withCpus),
        Seq(withCpus.toString, clusters.toString,
          (if (fullWarm) clusters else warmClusters).toString),
        maxReps = maxReps, minReps = minReps, deadlineSec = deadlineSec,
        withMetrics = withMetrics)

    // --- part 1: dedup headline; lo first, then the first hi child (the
    //     noisy level — see the sampling-protocol scaladoc). The
    //     efficiency number is on stdout the moment this part ends;
    //     peak (throughput-only evidence) moves to part 4 behind a
    //     budget check so it can never delay the headline ---
    val dLo = dedupChild(loCpus, dedupClusters, maxReps = 3, minReps = 2,
      deadlineSec = 650)
    val loChildren = scala.collection.mutable.ArrayBuffer(dLo)
    val hiChildren = scala.collection.mutable.ArrayBuffer(
      dedupChild(hiCpus, dedupClusters, maxReps = 4, minReps = 2,
        deadlineSec = 360, fullWarm = true))
    val nClips = dLo("clips").toLong
    def loReps = repsOf(loChildren.toSeq)
    def hiReps = repsOf(hiChildren.toSeq)
    def tLo = loReps.min
    def tHi = hiReps.min
    hiSec = tHi
    def efficiency = (tLo / tHi) / ratio
    def efficiencyMed = (median(loReps) / median(hiReps)) / ratio
    // quiet floor of bandwidthCalib(8) on this box (BASELINE.md,
    // re-measured 2026-08-18 after the probe resize). A level is SUSPECT
    // when its best calib reading exceeds 2x this — every window that
    // level ran in was degraded; the flag rides in the artifact so an
    // implausible efficiency self-documents, and it feeds the symmetric
    // escalation below (a trigger independent of the metric value).
    val calibQuietRef =
      sys.env.getOrElse("SPARK_GRAFT_CALIB_QUIET_REF", "0.22").toDouble
    def levelSuspect(children: Seq[Map[String, String]]): Boolean = {
      val c = calibOf(children)
      c.nonEmpty && c.min > 2 * calibQuietRef
    }
    def loSuspect = levelSuspect(loChildren.toSeq)
    def hiSuspect = levelSuspect(hiChildren.toSeq)
    def renderDedup(peak: Option[Map[String, String]]): Unit = {
      val peakPart = peak.map { dPeak =>
        val tPeak = repsOf(Seq(dPeak)).min
        f""""peak_cores":$cpus,"peak_sec":$tPeak%.3f,""" +
          f""""peak_clips_per_sec":${nClips / tPeak}%.1f,""" +
          s""""peak_reps":${repsJson(repsOf(Seq(dPeak)))},"""
      }.getOrElse("")
      dedupJson =
        f"""{"clips":$nClips,"lo_cores":$loCpus,"lo_sec":$tLo%.3f,""" +
          f""""lo_clips_per_sec":${nClips / tLo}%.1f,"hi_cores":$hiCpus,""" +
          f""""hi_sec":$tHi%.3f,"hi_clips_per_sec":${nClips / tHi}%.1f,""" +
          peakPart +
          f""""scaling_efficiency":$efficiency%.3f,""" +
          f""""scaling_efficiency_median":$efficiencyMed%.3f,""" +
          s""""lo_suspect":$loSuspect,"hi_suspect":$hiSuspect,""" +
          s""""calib_quiet_ref":$calibQuietRef,""" +
          s""""lo_reps":${repsJson(loReps)},"hi_reps":${repsJson(hiReps)},""" +
          // host-window calibration beside the reps it contextualizes:
          // the same fixed memory-bandwidth probe per child, pre/post the
          // timed reps — inflated calib <=> a host episode, not a plan
          // change
          s""""calib_sec":{"lo":${repsJson(calibOf(loChildren.toSeq))},""" +
          s""""hi":${repsJson(calibOf(hiChildren.toSeq))}""" +
          peak.map(p => s""","peak":${repsJson(calibOf(Seq(p)))}""")
            .getOrElse("") + "}," +
          s""""heap_gb":{"lo":${heapGbFor(loCpus)},"hi":${heapGbFor(hiCpus)},""" +
          s""""peak":${heapGbFor(cpus)}}}"""
      dedupCompact =
        f"""{"clips":$nClips,"lo_clips_per_sec":${nClips / tLo}%.1f,""" +
          f""""hi_clips_per_sec":${nClips / tHi}%.1f,""" +
          peak.map { p =>
            f""""peak_clips_per_sec":${nClips / repsOf(Seq(p)).min}%.1f,"""
          }.getOrElse("") +
          f""""scaling_efficiency":$efficiency%.3f,""" +
          f""""scaling_efficiency_median":$efficiencyMed%.3f,""" +
          s""""lo_suspect":$loSuspect,"hi_suspect":$hiSuspect}"""
    }
    renderDedup(None)
    partsDone += "dedup"
    emit(finalLine = false)

    // --- part 2 (default OFF): dedup at the legacy smaller size ---
    if (sys.env.getOrElse("SPARK_GRAFT_BENCH_SMALL", "0") == "1") {
      val smallClusters =
        sys.env.getOrElse("SPARK_GRAFT_BENCH_CLUSTERS_SMALL",
          (dedupClusters / 2).toString).toInt
      val sLo = dedupChild(loCpus, smallClusters, maxReps = 2)
      val sHi = dedupChild(hiCpus, smallClusters, maxReps = 2)
      val sLoReps = repsOf(Seq(sLo))
      val sHiReps = repsOf(Seq(sHi))
      val sClips = sLo("clips").toLong
      val sEff = (sLoReps.min / sHiReps.min) / ratio
      val sEffMed = (median(sLoReps) / median(sHiReps)) / ratio
      smallJson = f"""{"clips":$sClips,"lo_cores":$loCpus,""" +
        f""""lo_sec":${sLoReps.min}%.3f,""" +
        f""""lo_clips_per_sec":${sClips / sLoReps.min}%.1f,""" +
        f""""hi_cores":$hiCpus,"hi_sec":${sHiReps.min}%.3f,""" +
        f""""hi_clips_per_sec":${sClips / sHiReps.min}%.1f,""" +
        f""""scaling_efficiency":$sEff%.3f,""" +
        f""""scaling_efficiency_median":$sEffMed%.3f,""" +
        s""""lo_reps":${repsJson(sLoReps)},"hi_reps":${repsJson(sHiReps)}}"""
      partsDone += "dedup_small"
      emit(finalLine = false)
    }

    // --- part 3: matcher at N and 4N, exactly 2 reps per level, lo first ---
    val nQueries = sys.env.getOrElse("SPARK_GRAFT_BENCH_QUERIES", "150000").toInt
    def matcherChild(withCpus: Int, maxReps: Int = 3): Map[String, String] =
      runChild("graft.tools.MatcherSparkBench", heapGbFor(withCpus),
        Seq(withCpus.toString, "120000", nQueries.toString),
        maxReps = maxReps, minReps = math.min(2, maxReps),
        // matcher reps are short (lo ~95-110 s, hi ~21-28 s) and carry
        // no JIT tail (the 5k-query warmup suffices); the convergence
        // window only buys a 3rd rep on a burst or late improvement
        deadlineSec = if (withCpus == loCpus) 260 else 90)
    val mLoChildren = scala.collection.mutable.ArrayBuffer(matcherChild(loCpus))
    val mHiChildren = scala.collection.mutable.ArrayBuffer(matcherChild(hiCpus))
    def mLoReps = repsOf(mLoChildren.toSeq)
    def mHiReps = repsOf(mHiChildren.toSeq)
    def tmLo = mLoReps.min
    def tmHi = mHiReps.min
    def mEfficiency = (tmLo / tmHi) / ratio
    def mEfficiencyMed = (median(mLoReps) / median(mHiReps)) / ratio
    def mLoSuspect = levelSuspect(mLoChildren.toSeq)
    def mHiSuspect = levelSuspect(mHiChildren.toSeq)
    def renderMatcher(): Unit = {
      matcherJson =
        f"""{"lexicon":120000,"queries":$nQueries,"lo_cores":$loCpus,""" +
          f""""lo_items_per_sec":${nQueries / tmLo}%.1f,"hi_cores":$hiCpus,""" +
          f""""hi_items_per_sec":${nQueries / tmHi}%.1f,""" +
          f""""scaling_efficiency":$mEfficiency%.3f,""" +
          f""""scaling_efficiency_median":$mEfficiencyMed%.3f,""" +
          s""""lo_suspect":$mLoSuspect,"hi_suspect":$mHiSuspect,""" +
          s""""lo_reps":${repsJson(mLoReps)},"hi_reps":${repsJson(mHiReps)},""" +
          s""""calib_sec":{"lo":${repsJson(calibOf(mLoChildren.toSeq))},""" +
          s""""hi":${repsJson(calibOf(mHiChildren.toSeq))}}}"""
      matcherCompact =
        f"""{"lo_items_per_sec":${nQueries / tmLo}%.1f,""" +
          f""""hi_items_per_sec":${nQueries / tmHi}%.1f,""" +
          f""""scaling_efficiency":$mEfficiency%.3f,""" +
          f""""scaling_efficiency_median":$mEfficiencyMed%.3f,""" +
          s""""lo_suspect":$mLoSuspect,"hi_suspect":$mHiSuspect}"""
    }
    renderMatcher()
    partsDone += "matcher"
    emit(finalLine = false)

    // --- part 3b: second hi sample set, TIME-DIVERSIFIED — the matcher
    //     part above put ~8-10 min of wall clock between the two hi
    //     children, so a noise episode covering one of them (measured to
    //     outlast a whole child, see the sampling-protocol scaladoc)
    //     leaves the other's floor intact. Same fixed rep budget (4 hi
    //     total), decided before any measurement ---
    hiChildren += dedupChild(hiCpus, dedupClusters, maxReps = 4,
      minReps = 2, deadlineSec = 360, fullWarm = true)
    hiSec = tHi
    renderDedup(None)
    partsDone += "dedup_resample"
    emit(finalLine = false)

    // --- part 3b': second matcher hi window — the same time-split
    //     rationale as the dedup level (episodes outlast one child, so
    //     a single-window min can read 20-35% inflated; run-B evidence:
    //     matcher hi had one window while lo got an escalation rep and
    //     the ratio whipsawed 1.00 -> 0.74). Fixed rep budget (4 hi
    //     total), decided before any measurement ---
    mHiChildren += matcherChild(hiCpus)
    renderMatcher()
    partsDone += "matcher_resample"
    emit(finalLine = false)

    // --- part 3c (SYMMETRIC escalation, bounded at ONE extra child):
    //     an implausibly HIGH reading (efficiency > 1.0 — physically
    //     impossible, the signature of an episode-inflated lo floor,
    //     round 4's official 1.128) or an all-degraded lo calib set
    //     buys one extra 1-rep lo child at a later wall-clock point;
    //     otherwise a LOW reading (< 0.85) or all-degraded hi calibs buy
    //     one extra 2-rep hi child. Floor-estimator-sound in BOTH
    //     directions: extra samples of the suspect level only tighten
    //     its min toward the true time — toward LOWER reported
    //     efficiency on the lo side, higher on the hi side — so the
    //     escalation can no longer only pump the headline the flattering
    //     way (the round-4 asymmetry ADVICE flagged). The calib triggers
    //     are independent of the metric value; every rep is echoed in
    //     lo_reps/hi_reps. Lo outranks hi: an inflated lo FABRICATES
    //     efficiency, which is the direction that must never ship
    //     uncorrected. ---
    var dedupLoEsc = 0
    while (dedupLoEsc < 2 &&
        (efficiency > 1.0 || (dedupLoEsc == 0 && loSuspect)) &&
        budgetSec - elapsedSec > 700) {
      loChildren += dedupChild(loCpus, dedupClusters, maxReps = 1)
      dedupLoEsc += 1
      hiSec = tHi
      renderDedup(None)
      partsDone += "dedup_escalate_lo"
      emit(finalLine = false)
    }
    if (dedupLoEsc == 0 && (efficiency < 0.85 || hiSuspect) &&
        budgetSec - elapsedSec > 400) {
      hiChildren += dedupChild(hiCpus, dedupClusters, maxReps = 3,
        minReps = 2, deadlineSec = 240, fullWarm = true)
      hiSec = tHi
      renderDedup(None)
      partsDone += "dedup_escalate_hi"
      emit(finalLine = false)
    }

    // --- part 3d (matcher escalation — the same symmetric, bounded
    //     guard as 3c, running at a later wall-clock point than part 3's
    //     children; the round-5 validation run read matcher 1.064 from
    //     an inflated lo level and nothing corrected it) ---
    var matcherLoEsc = 0
    while (matcherLoEsc < 2 &&
        (mEfficiency > 1.0 || (matcherLoEsc == 0 && mLoSuspect)) &&
        budgetSec - elapsedSec > 400) {
      mLoChildren += matcherChild(loCpus, maxReps = 1)
      matcherLoEsc += 1
      renderMatcher()
      partsDone += "matcher_escalate_lo"
      emit(finalLine = false)
    }
    if (matcherLoEsc == 0 && (mEfficiency < 0.85 || mHiSuspect) &&
        budgetSec - elapsedSec > 150) {
      mHiChildren += matcherChild(hiCpus)
      renderMatcher()
      partsDone += "matcher_escalate_hi"
      emit(finalLine = false)
    }

    // --- part 4 (budget-conditional): peak throughput at local[cpus],
    //     1 rep + the untimed guard-metrics pass. Throughput-only
    //     evidence — never part of the efficiency ratio, so it yields
    //     the window to parts 1/3 rather than competing with them ---
    if (cpus > hiCpus && budgetSec - elapsedSec > 300) {
      // second rep when the budget comfortably allows it (decided by the
      // clock, never by any metric value): a single-sample peak reading
      // is the one number in the artifact with no straggler defense
      val peakReps = if (budgetSec - elapsedSec > 500) 2 else 1
      val dPeak = dedupChild(cpus, dedupClusters, maxReps = peakReps,
        withMetrics = true)
      peakSec = repsOf(Seq(dPeak)).min
      renderDedup(Some(dPeak))
      // guard counters from the peak child's untimed metrics pass: the
      // recall accounting the hot-band cap promises, visible per round
      val candPairs = dPeak.getOrElse("cand", "-1")
      guards ++= Seq(
        "dropped_buckets" -> dPeak.getOrElse("dropped", "-1"),
        "candidate_pairs" -> candPairs,
        "verified_edges" -> dPeak.getOrElse("verified", "-1"),
        "pairs_per_clip" -> (try f"${candPairs.toDouble / nClips}%.3f"
        catch { case _: Throwable => "-1" }))
      partsDone += "peak"
      emit(finalLine = false)
    } else if (cpus > hiCpus) {
      partsDone += "peak_skipped_deadline"
    }

    // --- part 5: operator queries, noop sink, in-process at local[cpus].
    //     Deadline-aware: with < 240 s of budget left run 1 rep per query
    //     (no outlier escalation); with < 90 s left skip the sweep — the
    //     sweep is the least load-bearing part and the only one allowed
    //     to degrade (parts 1/3 carry the north-rule numbers) ---
    val remaining = budgetSec - elapsedSec
    if (remaining > 90) {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .appName("graft-bench-queries")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.extensions", graft.spark.GraftExtensions.name)
        .config("spark.local.dir", "/dev/shm/spark-local")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      // sweep warmup: whichever query runs first in a cold JVM eats the
      // codegen-compile + JIT cost of every shared path (measured: the
      // same query 13.4s as the sweep opener vs 2.8s after two cheap
      // openers). Warm the narrow-map, shuffle-agg, interpreted-HOF and
      // self-join paths once, untimed, so the timed mins measure plans,
      // not first-touch compilation. dedup_jaccard + variant_matcher are
      // in the list because their paths (array_intersect HOF, the
      // matcher's broadcast kernel) share nothing with the cheap openers
      // — round 4's 1-rep sweep shipped 17.9s/9.2s first-touch numbers
      // for 3.1s/1.8s queries.
      for (w <- Seq("p01_normalize", "q1_agg", "text_fingerprint",
          "p05_levenshtein_pairs", "dedup_jaccard", "variant_matcher");
          fn <- SparkEntry.queries.get(w))
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      def timeQuery(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
          : Double = {
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
        (System.nanoTime() - t0) / 1e9
      }
      // min of two runs per query; queries still above the outlier bar
      // get two more samples — host-window noise measured inflating a
      // trivial group-by from 0.9s to 13s (round-2 postmortem). First-run
      // times are echoed per query (queries_reps) so JIT inflation is
      // visible in the artifact rather than explained in prose.
      val onePass = remaining < 240
      val outlierSec = 3.0
      val results = SparkEntry.queries.map { case (name, fn) =>
        var times = (1 to (if (onePass) 1 else 2)).map(_ => timeQuery(fn))
        if (!onePass && times.min > outlierSec)
          times = times ++ (1 to 2).map(_ => timeQuery(fn))
        name -> times
      }
      // guard metric for the per-source self-join queries (p05/p06/
      // dedup_jaccard/r4/r6): their pinned oracle semantics block on
      // `source`, so their cost is quadratic in the LARGEST source group —
      // fine while this bound stays O(100s); if the driver ever scales
      // `documents` such that it grows, those queries must pre-block on
      // band keys instead (the production dedup path already does).
      val maxSourceGroup =
        try graft.spark.Tables.documents(spark, sfDir)
          .groupBy("source").count()
          .agg(org.apache.spark.sql.functions.max("count")).head().getLong(0)
        catch { case _: Throwable => -1L }
      guards += "documents_max_source_group" -> maxSourceGroup.toString
      // embedding-path guard counters: EmbDedup over the twin corpus at
      // this sf, untimed — the same candidate-discipline accounting the
      // text pipeline ships (dropped buckets = documented lost recall),
      // visible per run instead of only in EmbDedupSpec
      try {
        val (_, em) = graft.operators.EmbDedup.run(spark,
          Queries.embTwinCorpus(spark, sfDir), "vec_id", "emb",
          Queries.embCfg, collectMetrics = true)
        guards ++= Seq(
          "emb_candidate_pairs" -> em.nCandidatePairs.toString,
          "emb_dropped_buckets" -> em.nDroppedBuckets.toString,
          "emb_verified_edges" -> em.nVerifiedEdges.toString,
          "emb_clusters" -> em.nClusters.toString)
      } catch { case _: Throwable => () }
      // acoustic-path guard counters: AudioDedup over a small real-bytes
      // clip table (the bench headline table skips PCM synthesis), same
      // candidate-discipline accounting as the text/embedding pipelines.
      // ~30 s (decode+FFT+CC floor) — runs only at the comfortable-budget
      // tier, the first thing the deadline sheds after rep counts
      if (!onePass) try {
        val aClips = graft.sources.ClipGen
          .table(spark, 4242L, 150)
          .withColumn("id", org.apache.spark.sql.functions
            .xxhash64(org.apache.spark.sql.functions.col("clip_id")))
        val (_, am) = graft.operators.AudioDedup.run(spark, aClips, "id",
          "bytes", collectMetrics = true)
        guards ++= Seq(
          "audio_candidate_pairs" -> am.nCandidatePairs.toString,
          "audio_dropped_buckets" -> am.nDroppedBuckets.toString,
          "audio_verified_edges" -> am.nVerifiedEdges.toString,
          "audio_clusters" -> am.nClusters.toString)
      } catch { case _: Throwable => () }
      spark.stop()
      queriesJson = results.map { case (k, v) => "\"" + k + "\":" + v.min }
        .mkString("{", ",", "}")
      queriesRepsJson = results
        .map { case (k, v) => "\"" + k + "\":" + repsJson(v.toSeq) }
        .mkString("{", ",", "}")
      queriesTotal = results.values.map(_.min).sum
      partsDone += "queries"
    } else {
      partsDone += "queries_skipped_deadline"
    }
    emit(finalLine = true)
  }
}
