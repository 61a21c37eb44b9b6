package graft

import java.nio.file.{Files, Path, StandardOpenOption}

/** Exclusive bench-entry lock (round-13 verdict ask 2) — the
  * double-bench collision made mechanical.
  *
  * The r13 incident (SCALING.md:2286): a second `graft.Bench` was
  * launched while the close-out chain's bench was still alive; the
  * two runs cross-contaminated ~20 minutes of measurements and crept
  * a dozen sub-threshold baselines. The documented lesson was "poll
  * the artifact mtimes" — advice, not a guard. The repo's own
  * pattern is to promote every incident into a structural lock
  * (RegistrySpec for duplicate names, Grids.boundedHead for driver
  * materialization, the mirror ratchet for baseline creep); this is
  * that move for bench serialization.
  *
  * Mechanism: `bench.lock` in the working directory, created
  * atomically (CREATE_NEW) with the holder's PID and start time. A
  * second invocation refuses with the holder's identity. A lock
  * whose PID is no longer alive is STALE (the holder crashed without
  * the finally) and is reclaimed automatically — a crash must not
  * wedge the round. Liveness is injected so the spec can prove both
  * refusal and stale recovery without real processes.
  */
object BenchLock {

  /** Who holds the lock, per the lock file's contents. */
  final case class Holder(pid: Long, startedAtMillis: Long) {
    override def toString: String =
      s"pid=$pid startedAt=${java.time.Instant.ofEpochMilli(startedAtMillis)}"
  }

  val DefaultName = "bench.lock"

  private def parse(body: String): Option[Holder] = {
    val pid = "\"pid\"\\s*:\\s*([0-9]+)".r.findFirstMatchIn(body)
    val t0 = "\"started_at_ms\"\\s*:\\s*([0-9]+)".r.findFirstMatchIn(body)
    for (p <- pid; t <- t0)
      yield Holder(p.group(1).toLong, t.group(1).toLong)
  }

  private def renderBody(h: Holder): String =
    s"""{"pid":${h.pid},"started_at_ms":${h.startedAtMillis}}"""

  /** Try to take the lock. Right(holder-we-wrote) on success;
    * Left(live holder) on refusal. A malformed lock file counts as
    * stale (it cannot name a live holder).
    *
    * @param isAlive liveness oracle for a PID — production passes
    *                ProcessHandle; specs inject their own.
    */
  def acquire(path: Path, pid: Long, nowMillis: Long,
      isAlive: Long => Boolean): Either[Holder, Holder] = {
    val mine = Holder(pid, nowMillis)
    def tryCreate(): Boolean =
      try {
        Files.write(path, renderBody(mine).getBytes("UTF-8"),
          StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    if (tryCreate()) Right(mine)
    else {
      val existing =
        try parse(Files.readString(path)) catch { case _: Exception => None }
      existing.filter(h => h.pid != pid && isAlive(h.pid)) match {
        case Some(live) => Left(live)
        case None =>
          // stale (dead holder, our own pid, or unreadable): reclaim.
          // Round-14 advice closed the delete-then-create TOCTOU
          // (between judging the holder stale and deleteIfExists, a
          // third process could reclaim and our delete would remove
          // the LIVE successor's lock): claim disposal rights with an
          // atomic rename-aside — only one process can win the move —
          // then re-check the moved file's content. If we accidentally
          // moved a live successor's fresh lock aside, restore it
          // (rename atomically replaces on POSIX) and refuse.
          val aside = path.resolveSibling(s"${path.getFileName}.reclaim.$pid")
          val claimed =
            try {
              Files.move(path, aside,
                java.nio.file.StandardCopyOption.ATOMIC_MOVE)
              true
            } catch { case _: Exception => false } // already reclaimed/gone
          val stolenLive = claimed && {
            val h = try parse(Files.readString(aside))
                    catch { case _: Exception => None }
            h.filter(x => x.pid != pid && isAlive(x.pid)) match {
              case Some(_) =>
                try Files.move(aside, path,
                  java.nio.file.StandardCopyOption.ATOMIC_MOVE,
                  java.nio.file.StandardCopyOption.REPLACE_EXISTING)
                catch { case _: Exception =>
                  try Files.deleteIfExists(aside) catch { case _: Exception => () }
                }
                true
              case None =>
                try Files.deleteIfExists(aside) catch { case _: Exception => () }
                false
            }
          }
          if (!stolenLive && tryCreate()) Right(mine)
          else Left(
            (try parse(Files.readString(path)) catch { case _: Exception => None })
              .getOrElse(Holder(-1L, 0L)))
      }
    }
  }

  /** Release: delete only if we still hold it (a stale-reclaimed
    * successor's lock must not be deleted by the crashed holder's
    * leftover finally running late).
    */
  def release(path: Path, pid: Long): Unit = {
    val held =
      try parse(Files.readString(path)).exists(_.pid == pid)
      catch { case _: Exception => false }
    if (held) {
      try Files.deleteIfExists(path) catch { case _: Exception => () }
    }
  }

  /** Production entry: real PID + ProcessHandle liveness. Exits the
    * JVM with a non-zero status on refusal — the caller (driver or
    * close-out chain) must see the failure, not a silently skipped
    * bench.
    */
  def acquireOrDie(path: Path): Holder = {
    val pid = ProcessHandle.current().pid()
    acquire(path, pid, System.currentTimeMillis(),
      p => ProcessHandle.of(p).map[Boolean](_.isAlive).orElse(false)) match {
      case Right(h) => h
      case Left(holder) =>
        System.err.println(
          s"[bench-lock] REFUSED: another bench is running ($holder). " +
            "Wait for it to finish (or remove a stale bench.lock by hand " +
            "if the holder is provably gone).")
        sys.exit(3)
    }
  }
}
