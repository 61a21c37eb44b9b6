package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** The bench-entry lock (round-13 verdict ask 2): the double-bench
  * collision class must be structurally impossible — a second bench
  * is REFUSED with the live holder's identity, a crashed holder's
  * lock is reclaimed, and release is holder-checked so a late finally
  * from a crashed run cannot delete its successor's lock.
  */
class BenchLockSpec extends AnyFunSuite {

  private def tmpLock() = {
    val dir = Files.createTempDirectory("benchlock")
    dir.resolve("bench.lock")
  }

  test("first acquire succeeds and records pid + start time") {
    val p = tmpLock()
    val r = BenchLock.acquire(p, pid = 42L, nowMillis = 1000L, isAlive = _ => true)
    assert(r == Right(BenchLock.Holder(42L, 1000L)))
    val body = Files.readString(p)
    assert(body.contains("\"pid\":42") && body.contains("\"started_at_ms\":1000"))
  }

  test("second acquire against a LIVE holder is refused with its identity") {
    val p = tmpLock()
    assert(BenchLock.acquire(p, 42L, 1000L, _ => true).isRight)
    val r = BenchLock.acquire(p, 43L, 2000L, pid => pid == 42L)
    assert(r == Left(BenchLock.Holder(42L, 1000L)))
    // the refused caller must not have clobbered the holder's file
    assert(Files.readString(p).contains("\"pid\":42"))
  }

  test("a DEAD holder's lock is stale and reclaimed") {
    val p = tmpLock()
    assert(BenchLock.acquire(p, 42L, 1000L, _ => true).isRight)
    val r = BenchLock.acquire(p, 43L, 2000L, _ => false) // 42 is gone
    assert(r == Right(BenchLock.Holder(43L, 2000L)))
    assert(Files.readString(p).contains("\"pid\":43"))
  }

  test("a malformed lock file cannot name a live holder — reclaimed") {
    val p = tmpLock()
    Files.writeString(p, "not json at all")
    val r = BenchLock.acquire(p, 43L, 2000L, _ => true)
    assert(r == Right(BenchLock.Holder(43L, 2000L)))
  }

  test("release deletes only the caller's own lock") {
    val p = tmpLock()
    assert(BenchLock.acquire(p, 42L, 1000L, _ => true).isRight)
    BenchLock.release(p, 99L) // not the holder: must be a no-op
    assert(Files.exists(p))
    BenchLock.release(p, 42L)
    assert(!Files.exists(p))
    BenchLock.release(p, 42L) // idempotent on a missing file
  }

  test("crashed holder's late release cannot delete the successor's lock") {
    val p = tmpLock()
    assert(BenchLock.acquire(p, 42L, 1000L, _ => true).isRight)
    // 42 dies; 43 reclaims
    assert(BenchLock.acquire(p, 43L, 2000L, _ => false).isRight)
    // 42's shutdown hook fires late: holder-checked release is a no-op
    BenchLock.release(p, 42L)
    assert(Files.exists(p) && Files.readString(p).contains("\"pid\":43"))
  }

  test("reacquire after release works (the round's serial benches)") {
    val p = tmpLock()
    assert(BenchLock.acquire(p, 42L, 1000L, _ => true).isRight)
    BenchLock.release(p, 42L)
    assert(BenchLock.acquire(p, 43L, 2000L, _ => true).isRight)
  }
}
