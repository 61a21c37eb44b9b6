package graft

import java.io.File

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.stream.{CensusApp, Simulator}

/** The two lifecycle loops the round-2 verdict flagged as untested:
  * G3 (simulator tick/stop loop, clock+sleep injected) and T6
  * (graceful shutdown hook body).
  */
class SimulatorLifecycleSpec extends SparkSpec {
  import spark.implicits._

  test("G3: the tick loop stops at totalRows and writes non-colliding batch files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sim_loop").toString
    val cfg = Simulator.Config(totalRows = 100, tickMillis = 0L)
    var ticks = 0
    val written = Simulator.runLoop(dir, cfg,
      sleep = _ => ticks += 1,
      clock = () => 1700000000L) // frozen clock: filename uniqueness must
                                 // come from the tick counter, not time
    // stops at the first tick crossing the threshold — within one batch
    assert(written >= 100 && written < 100 + cfg.batchMax)
    val files = new File(dir).listFiles().filter(_.getName.endsWith(".csv"))
    assert(files.length == ticks) // every tick produced a distinct file
    val rowsOnDisk = files.map(f =>
      scala.io.Source.fromFile(f).getLines().size).sum
    assert(rowsOnDisk == written)
  }

  test("T6: shutdown stops active queries then the session, idempotently") {
    val input = MemoryStream[Long](spark)
    val query = input.toDS().writeStream
      .format("memory").queryName("t6_shutdown_test").start()
    assert(query.isActive)
    var sessionStops = 0
    CensusApp.shutdown(Seq(query), () => sessionStops += 1)
    assert(!query.isActive && sessionStops == 1)
    // second invocation (hook firing after an explicit stop) is a no-op
    // on the queries and must not throw
    CensusApp.shutdown(Seq(query), () => sessionStops += 1)
    assert(sessionStops == 2)
  }
}
