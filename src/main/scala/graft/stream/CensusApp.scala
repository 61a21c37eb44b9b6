package graft.stream

import org.apache.spark.sql.SparkSession

import graft.sink.ParquetSnapshotSink

/** Demo entry point — the reference's full deployment shape
  * (simulator → file-stream engine → snapshot tables), minus the
  * Dash UI (out of scope, SURVEY §7.5). Run the simulator main in a
  * second process to feed `inputDir`.
  *
  * T6/T7: graceful SIGINT shutdown + blocking await
  * (spark_streaming.py:213-224).
  */
object CensusApp {

  /** T6 — the graceful-shutdown body (extracted from the SIGINT hook so
    * it is testable): stop every still-active query, then the session.
    * Idempotent — a second invocation (hook + explicit call) is a
    * no-op on already-stopped queries.
    */
  def shutdown(queries: Seq[org.apache.spark.sql.streaming.StreamingQuery],
      stopSession: () => Unit): Unit = {
    queries.foreach(q => if (q.isActive) q.stop())
    stopSession()
  }

  def main(args: Array[String]): Unit = {
    val inputDir = args.lift(0).getOrElse("/tmp/graft_stream_input")
    val sinkDir = args.lift(1).getOrElse("/tmp/graft_sink")
    val ckptDir = args.lift(2).getOrElse("/tmp/graft_ckpt")
    val fused = args.lift(3).contains("fused")

    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "*"), "graft-census-pipeline")

    val pipeline = new Pipeline(new ParquetSnapshotSink(sinkDir),
      PipelineConfig(fused = fused))
    val queries = pipeline.start(spark, inputDir, ckptDir)

    sys.addShutdownHook(shutdown(queries, () => spark.stop()))
    queries.foreach(_.awaitTermination())
  }
}
