package graft

/** Pure logic for the BENCH_TIMES.json regression mirror — split out of
  * Bench so the alarm/merge rules are unit-testable without a bench run
  * (round-10 verdict ask 2).
  *
  * The round-9 incident this encodes: the movers alarm fired on
  * t_dtw_monthly (0.585 → 3.655 s) and pipeline_curation
  * (0.536 → 3.047 s), and the mirror was then overwritten with the
  * ALARMED values. That self-poisons both directions of the next
  * comparison — a silent recovery to 0.6 s reads as ratio 0.16 (never
  * alarms, so the anomaly is never revisited) and a REAL regression is
  * ratioed against the inflated prev (3.6 s baseline hides anything up
  * to 7 s). The VERIFY mirror's subset-run guard is the precedent: a
  * baseline only moves on evidence of a real steady state.
  *
  * Rule: an entry whose new median fired the alarm KEEPS its pre-alarm
  * baseline (time + spread) in the mirror and is listed in the mirror's
  * `unattributed` array until either (a) a later full run measures it
  * back inside the alarm threshold vs that held baseline — recovery,
  * the jitter hypothesis confirmed by the data itself — or (b) the
  * operator attributes it as a real cost and accepts the new baseline
  * via SPARK_GRAFT_ACCEPT_MOVERS (comma list of tier-qualified keys, or
  * `*`), after running the DevQueryAB interleaved protocol.
  *
  * Formatting is pinned to Locale.ROOT (ADVICE round 9): on a JVM with
  * a comma-decimal default locale, `"%.3f".format` writes `3,655` and
  * the mirror stops parsing — silently, because the writer used to
  * swallow failures. Spread bounds are formatted the same way so a
  * sub-milli bound can never serialize as scientific notation the
  * parser regex does not match.
  */
object BenchMirror {

  /** Locale-pinned fixed-point seconds — NEVER `"%.3f".format` (locale
    * comma) or raw interpolation (scientific notation).
    */
  def num(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  private val timesRex =
    "\"((?:[^\"\\\\]|\\\\.)*)\"\\s*:\\s*([0-9.]+)".r
  private val spreadRex =
    "\"((?:[^\"\\\\]|\\\\.)*)\"\\s*:\\s*\\[([0-9.]+)\\s*,\\s*([0-9.]+)\\]".r

  def parseTimes(body: String): Map[String, Double] =
    timesRex.findAllMatchIn(body)
      .map(m => m.group(1) -> m.group(2).toDouble)
      // the shape-agnostic regex also matches the top-level
      // "wall_sec":N member render appends — a reserved key, not a
      // query; without this filter every prev map carries a phantom
      // 1143-second "query" any future mirror consumer would inherit
      .filter(_._1 != "wall_sec")
      .toMap

  def parseSpreads(body: String): Map[String, (Double, Double)] =
    spreadRex.findAllMatchIn(body)
      .map(m => m.group(1) -> (m.group(2).toDouble, m.group(3).toDouble))
      .toMap

  /** Names inside the mirror's `"unattributed":[...]` array. */
  def parseUnattributed(body: String): Set[String] =
    parseNameArray(body, "unattributed")

  /** Names inside the mirror's `"run_level_load":[...]` array —
    * alarms the in-run control sentinel attributed to machine-level
    * load at alarm time (round-11 verdict ask 2). Same baseline-hold
    * and auto-clear semantics as `unattributed`; the separate array
    * exists so the attribution is recorded WITH the alarm instead of
    * costing a next-round DevMoverAttrib cycle.
    */
  def parseRunLevelLoad(body: String): Set[String] =
    parseNameArray(body, "run_level_load")

  private def parseNameArray(body: String, field: String): Set[String] = {
    val arr = ("\"" + field + "\"\\s*:\\s*\\[([^\\]]*)\\]").r
    arr.findFirstMatchIn(body) match {
      case None => Set.empty
      case Some(m) =>
        "\"((?:[^\"\\\\]|\\\\.)*)\"".r.findAllMatchIn(m.group(1))
          .map(_.group(1)).toSet
    }
  }

  /** The previous full run's total wall seconds (`"wall_sec":N`). */
  def parseWall(body: String): Option[Double] =
    "\"wall_sec\"\\s*:\\s*([0-9.]+)".r.findFirstMatchIn(body)
      .map(_.group(1).toDouble)

  /** Classify this run's fired alarms with the interleaved control
    * sentinel (round-11 verdict ask 2 — the class that burned a
    * DevMoverAttrib cycle in r8/r9/r10): a pinned control query is
    * sampled INSIDE each tier as it runs; an alarm whose tier's
    * control median drifted ≥ `driftThreshold`× its cross-run
    * baseline is machine-level load by construction (the control's
    * plan never changes), so it self-attributes as `run_level_load`
    * at alarm time. A tier with no control samples falls back to the
    * run-global control median; with no baseline or no samples at
    * all, nothing can be attributed and every alarm stays
    * `unattributed` (the conservative reading).
    *
    * @return (runLevelLoad, unattributed) partition of `alarms`
    */
  def classifyAlarms(
      alarms: Seq[String],
      controlByTier: Map[String, Seq[Double]],
      controlBaseline: Option[Double],
      driftThreshold: Double = 1.8): (Set[String], Set[String]) = {
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)
    val global = controlByTier.values.flatten.toSeq
    val loaded = controlBaseline match {
      case Some(b) if b > 0.0 && global.nonEmpty =>
        alarms.filter { k =>
          val tier = k.takeWhile(_ != '/')
          val samples = controlByTier.getOrElse(tier, Seq.empty)
          val m = if (samples.nonEmpty) med(samples) else med(global)
          m / b >= driftThreshold
        }.toSet
      case _ => Set.empty[String]
    }
    (loaded, alarms.toSet -- loaded)
  }

  /** The alarm predicate, shared by the report and the merge: ratio ≥ 2
    * vs the (possibly held) baseline, new median ≥ 1 s, and — where the
    * baseline recorded a spread — the new median clears its max (the
    * stress tier's roaming-outlier band guard).
    */
  def isAlarm(newV: Double, prevV: Double,
      prevSpread: Option[(Double, Double)]): Boolean =
    prevV > 0.0 && newV / prevV >= 2.0 && newV >= 1.0 &&
      prevSpread.forall { case (_, prevMax) => newV > prevMax }

  /** Merge one full run's tier medians into the mirror.
    *
    * @param prevTimes    baseline medians from the existing mirror
    * @param prevSpreads  baseline [min,max] bands from the mirror
    * @param prevUnattr   names still flagged unattributed in the mirror
    * @param newTimes     this run's tier-qualified medians, in order
    * @param newSpreads   this run's bands
    * @param accepted     SPARK_GRAFT_ACCEPT_MOVERS names ("*" = all)
    * @param prevRunLoad  names still flagged run_level_load in the mirror
    * @param loadAttributed this run's alarms the control sentinel
    *                     attributed to machine-level load
    *                     ([[classifyAlarms]] first component)
    * @return (mirror times in order, mirror spreads, unattributed names
    *         sorted, run_level_load names sorted) — alarmed-and-
    *         unaccepted entries keep the baseline values regardless of
    *         class (a load-attributed median is still not a steady
    *         state); entries measured clean this run drop any stale
    *         flag of either class (recovery auto-clears); flagged
    *         entries NOT measured this run carry flag and baseline
    *         forward in their own class.
    */
  def merge(
      prevTimes: Map[String, Double],
      prevSpreads: Map[String, (Double, Double)],
      prevUnattr: Set[String],
      newTimes: Seq[(String, Double)],
      newSpreads: Map[String, (Double, Double)],
      accepted: Set[String],
      prevRunLoad: Set[String] = Set.empty,
      loadAttributed: Set[String] = Set.empty)
      : (Seq[(String, Double)], Map[String, (Double, Double)],
         Seq[String], Seq[String]) = {
    val acceptAll = accepted.contains("*")
    def isAccepted(k: String): Boolean = acceptAll || accepted.contains(k)
    val hold = newTimes.collect {
      case (k, v)
          if !isAccepted(k) && prevTimes.get(k).exists(p =>
            isAlarm(v, p, prevSpreads.get(k))) => k
    }.toSet
    val times = newTimes.map { case (k, v) =>
      k -> (if (hold(k)) prevTimes(k) else v)
    }
    val spreads = newTimes.flatMap { case (k, _) =>
      (if (hold(k)) prevSpreads.get(k) else newSpreads.get(k)).map(k -> _)
    }.toMap
    val newKeys = newTimes.map(_._1).toSet
    def carriedOf(prevFlags: Set[String]): Set[String] =
      (prevFlags -- accepted)
        .filter(k => !acceptAll && !newKeys(k) && prevTimes.contains(k))
    val carriedU = carriedOf(prevUnattr)
    val carriedL = carriedOf(prevRunLoad)
    val carried = carriedU ++ carriedL
    val carriedTimes = carried.toSeq.sorted.map(k => k -> prevTimes(k))
    val carriedSpreads = carried.toSeq.flatMap(k => prevSpreads.get(k).map(k -> _))
    ((times ++ carriedTimes),
      spreads ++ carriedSpreads,
      ((hold -- loadAttributed) ++ carriedU).toSeq.sorted,
      ((hold & loadAttributed) ++ carriedL).toSeq.sorted)
  }

  /** Serialize the mirror body (fixed shape the parsers above read). */
  def render(times: Seq[(String, Double)],
      spreads: Map[String, (Double, Double)],
      unattributed: Seq[String],
      esc: String => String,
      runLevelLoad: Seq[String] = Seq.empty,
      wall: Option[Double] = None): String = {
    val t = times.map { case (k, v) => s""""${esc(k)}":${num(v)}""" }
      .mkString("{", ",", "}")
    val s = spreads.toSeq.sortBy(_._1)
      .map { case (k, (lo, hi)) => s""""${esc(k)}":[${num(lo)},${num(hi)}]""" }
      .mkString("{", ",", "}")
    def arr(xs: Seq[String]) = xs.map(k => s""""${esc(k)}"""").mkString("[", ",", "]")
    val w = wall.map(v => s""","wall_sec":${num(v)}""").getOrElse("")
    s"""{"times":$t,"spreads":$s,"unattributed":${arr(unattributed)}""" +
      s""","run_level_load":${arr(runLevelLoad)}$w}"""
  }
}
