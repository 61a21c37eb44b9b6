package graft

import org.apache.spark.sql.functions._

/** The j13 basket-fan-out guard (round-8 verdict minor): pair
  * generation over (order, item) baskets must bound the per-order
  * self-join — one pathological 10⁶-item basket would otherwise emit
  * 10¹² pairs. [[graft.queries.ParityQueries.basketPairs]] truncates
  * each basket to its maxBasket globally-most-frequent items BEFORE
  * the join; this spec drives a basket LARGER than the cap and
  * asserts (a) the fan-out is capped at maxBasket·(maxBasket−1), and
  * (b) the survivors are exactly the most-frequent items (the
  * deterministic truncation rule), with an uncapped run as the
  * negative control proving the guard — not small data — is what
  * bounds the output.
  */
class BasketCapSpec extends SparkSpec {

  test("basketPairs caps a pathological basket's pair fan-out") {
    val s = spark
    import s.implicits._
    // one 40-item basket plus per-item frequency rows: item i appears
    // in (40 - i) extra singleton baskets, so global frequency is
    // strictly decreasing in i and the cap keeps exactly items 0..7
    val big = (0 until 40).map(i => (1000L, i.toLong))
    val freq = for { i <- 0 until 40; r <- 0 until (40 - i) }
      yield ((2000 + i * 100 + r).toLong, i.toLong)
    val op = (big ++ freq).toDF("ok", "pk")
    val m = op.groupBy("pk").agg(count(lit(1)).as("c"))

    val capped = graft.queries.ParityQueries.basketPairs(op, m, maxBasket = 8)
    // singleton baskets emit nothing; the big basket is cut to 8 items
    assert(capped.count() == 8L * 7L,
      "capped fan-out must be maxBasket*(maxBasket-1)")
    val kept = capped.select("pa").distinct().as[Long].collect().sorted
    assert(kept.toSeq == (0L until 8L),
      "cap must keep the globally most-frequent items deterministically")

    // negative control: without the cap the same basket emits 40*39
    val uncapped = graft.queries.ParityQueries.basketPairs(op, m, maxBasket = 64)
    assert(uncapped.count() == 40L * 39L,
      "the guard, not the fixture size, is what bounds the capped run")
  }
}
