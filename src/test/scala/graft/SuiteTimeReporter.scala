package graft

import java.nio.file.{Files, Paths}

import org.scalatest.Reporter
import org.scalatest.events._

/** ScalaTest `-C` reporter feeding [[SuiteTimes]] (round-13 verdict
  * ask 4): collects per-suite wall seconds during the run and folds
  * them into SUITE_TIMES.json at the end. The artifact write also
  * hangs on a shutdown hook so an aborted run still records what it
  * measured (the fold is idempotent per suite).
  */
class SuiteTimeReporter extends Reporter {

  private val ran = new java.util.concurrent.ConcurrentHashMap[String, Double]()
  private val tests = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  private val written = new java.util.concurrent.atomic.AtomicBoolean(false)

  Runtime.getRuntime.addShutdownHook(new Thread(() => write()))

  // A tag-excluded run (`testOnly * -- -l graft.Golden`) still fires
  // SuiteCompleted for EVERY discovered suite — the excluded ones at
  // ~1 ms with zero test events. Counting those as "ran" made the
  // fast loop look like a full run (115 suites >= 90% of 114) and
  // let it rewrite the held total down to a subset number, exactly
  // the fake improvement the full/subset split exists to prevent.
  // A suite only counts as ran when >= 1 of its tests actually ran.
  override def apply(event: Event): Unit = event match {
    case e: TestSucceeded => bump(e.suiteClassName.getOrElse(e.suiteName))
    case e: TestFailed    => bump(e.suiteClassName.getOrElse(e.suiteName))
    case e: TestCanceled  => bump(e.suiteClassName.getOrElse(e.suiteName))
    case e: SuiteCompleted =>
      val name = e.suiteClassName.getOrElse(e.suiteName)
      if (tests.getOrDefault(name, 0) > 0)
        e.duration.foreach(ms => ran.put(name, ms / 1000.0))
    case _: RunCompleted | _: RunStopped | _: RunAborted => write()
    case _ => ()
  }

  private def bump(name: String): Unit =
    tests.merge(name, 1, (a, b) => a + b)

  /** Test seam: the suites this run counts as ran (SuiteTimesSpec). */
  private[graft] def ranSnapshot: Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    ran.asScala.toMap
  }

  private def write(): Unit = if (written.compareAndSet(false, true)) {
    try {
      import scala.jdk.CollectionConverters._
      val measured = ran.asScala.toMap
      if (measured.nonEmpty) {
        val path = Paths.get("SUITE_TIMES.json")
        // the two-speed loop invites a fast subset run finishing while
        // a full run is still up — serialize the read-merge-write fold
        // across processes with an OS lock on a sidecar (round-14
        // advice: the bench side got bench.lock for this exact class;
        // interleaved folds here would lose a run's entries or total)
        val lockCh = java.nio.channels.FileChannel.open(
          Paths.get("SUITE_TIMES.json.lock"),
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE)
        val flock = lockCh.lock()
        try {
          val prev =
            if (Files.exists(path)) SuiteTimes.parse(Files.readString(path))
            else SuiteTimes.Empty
          val (next, full, held) = SuiteTimes.merge(prev, measured)
          Files.writeString(path, SuiteTimes.render(next))
          report(measured, prev, next, full, held)
        } finally {
          flock.release()
          lockCh.close()
        }
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[suite-times] WARNING artifact write failed: ${e.getMessage}")
    }
  }

  private def report(measured: Map[String, Double], prev: SuiteTimes.State,
      next: SuiteTimes.State, full: Boolean, held: Boolean): Unit = {
        val total = measured.values.sum
        if (held)
          System.err.println(f"[suite-times] RATCHET HOLD: run total $total%.1f s " +
            f"is >=1.5x the held ${prev.heldTotal.getOrElse(0.0)}%.1f s — " +
            "held total unchanged (a clean re-run rewrites it)")
        else if (full)
          System.err.println(f"[suite-times] full run: ${measured.size} suites, " +
            f"$total%.1f s (held total ${next.heldTotal.getOrElse(total)}%.1f s)")
        else
          System.err.println(f"[suite-times] subset run: ${measured.size} suites, " +
            f"$total%.1f s — per-suite entries updated, total pair untouched")
  }
}
