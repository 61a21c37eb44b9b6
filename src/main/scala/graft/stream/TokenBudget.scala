package graft.stream

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Incoming document metadata for budget admission. */
final case class BudgetDoc(source: String, doc_id: Long, n_tokens: Long)

/** Admission decision: running total AFTER this doc (if admitted) and
  * whether it made the cut.
  */
final case class BudgetDecision(
    source: String, doc_id: Long, cum_tokens: Long, admitted: Boolean)

/** Per-source token-budget admission — a cross-batch stateful operator
  * on the `transformWithState` API (Spark 4's arbitrary-stateful-v2,
  * the successor to `flatMapGroupsWithState` used by
  * [[StatefulOps]]): admit documents per source until the source's
  * token budget is exhausted, carrying the running total in a
  * [[ValueState]].
  *
  * This is the ingest-quota shape of a training-data pipeline ("at
  * most N tokens per domain/source per epoch" — the per-source cap
  * that keeps one crawl domain from dominating a mixture). State is
  * one long per key; at 100 TB the state store (RocksDB provider —
  * required by transformWithState) holds |sources| entries, trivially
  * bounded, and a TTL can age quotas out for rolling windows.
  */
object TokenBudget {

  class Processor(budget: Long)
      extends StatefulProcessor[String, BudgetDoc, BudgetDecision] {
    @transient private var cum: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cum = getHandle.getValueState[Long]("cum", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[BudgetDoc],
        timerValues: TimerValues): Iterator[BudgetDecision] = {
      var c = if (cum.exists()) cum.get() else 0L
      // materialize before updating state — the iterator is consumed
      // lazily by the caller, after handleInputRows returns
      val out = rows.map { d =>
        val admitted = c < budget
        if (admitted) c += d.n_tokens
        BudgetDecision(key, d.doc_id, c, admitted)
      }.toVector
      cum.update(c)
      out.iterator
    }
  }

  /** Admission stream: one decision row per input doc. Requires the
    * RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass`), the only
    * provider transformWithState supports.
    */
  def admit(docs: Dataset[BudgetDoc], budgetPerSource: Long): Dataset[BudgetDecision] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .transformWithState(new Processor(budgetPerSource),
        TimeMode.None(), OutputMode.Append())
  }
}
