package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{NearDup, TextAnalysis}

/** Near-duplicate detection query surface over `documents` (round-1
  * verdict item 4; brief items MinHash+LSH, SimHash, n-gram Jaccard).
  *
  * The fixture plants 25 near-dup pairs (shingle-Jaccard ≥ 0.5, cleanly
  * separated from a ≈0.001 background). All hashing is the shared
  * polynomial codepoint hash, so MinHash/SimHash signatures are
  * bit-identical in DuckDB and every query here is hash-verified, not
  * rows-only.
  */
object DedupQueries {

  private def docs(s: SparkSession, d: String): DataFrame =
    graft.sources.Tables.table(s, d, "documents")

  private val ShingleK = 3
  private val MinhashK = 16
  private val BandR = 2
  private val NumBands = MinhashK / BandR
  private val SimhashBits = 60 // 2×30-bit rehash signatures (simhash_wide)
  private val MaxHamming = 3

  /** Sparse-cosine knobs: candidate-generating shingles must appear in
    * ≤ DfMax docs (the inverted-index prune — O(DfMax²) pairs per
    * shingle), and pairs report at shingle-count cosine ≥ the
    * threshold (planted clones score ≥ 0.8, background < 0.2 — see the
    * query's scaladoc). ONE definition interpolated into both engines.
    */
  private val SparseDfMax = 10
  private val SparseCosThreshold = 0.5

  /** Minimum shared rare shingles for a candidate pair — the overlap
    * prune on top of the df prune (AllPairs/PPJoin-family filtering).
    * Without it the candidate set is every pair sharing ANY rare
    * shingle — measured 436 k pairs over 5 k docs at sf0.1, quadratic
    * in corpus density; at ≥ 3 the same corpus yields ~250. Pairs
    * whose cosine rides on 1-2 rare shingles (+ boilerplate) are
    * deliberately out of contract; the oracle mirrors the rule.
    */
  private val SparseMinShared = 3
  private lazy val mhParams = NearDup.minhashParams(MinhashK)

  /** doc_id + distinct shingle-hash set `hs` — the whole signature
    * build as one native codegen'd pass
    * ([[graft.functions.ShingleHashSet]]; shingle strings are never
    * materialized, which profiled as ~56% of dedup_minhash wall time).
    * All downstream similarity (MinHash, SimHash bands, exact Jaccard
    * re-check) operates on the hash set — standard MinHash practice,
    * and exact cross-engine because the oracle computes the identical
    * distinct-hash set (collisions included, P ≈ 1e9+7 makes them
    * ~1e-9 per pair).
    *
    * Cached: every dedup query's plan references the signatures from
    * several branches (signature build + both join-back sides).
    * Materializing once is the standard dedup-pipeline design at any
    * scale; `cache()` keys on the analyzed plan, so the three dedup
    * queries and repeated runs share a single entry. Handles are
    * tracked so [[releaseSignatureCache]] can drop them — without it a
    * long-lived session would accumulate entries until someone called
    * a global `clearCache()` (round-2 verdict item 9).
    */
  private def hashed(df: DataFrame): DataFrame =
    // sorted ascending so the exact re-rank can use the native
    // merge-walk jaccard_sorted (one sort per document, amortized over
    // every candidate pair it appears in; signatures are order-invariant)
    tracked(df.select(col("doc_id"),
      array_sort(NearDup.shingleHashSet(TextAnalysis.tokens(col("text")), ShingleK)).as("hs")))

  /** Shared [[TrackedCache]] machinery: plan-deduped handles, bounded
    * in long-lived sessions.
    */
  private val tracked = new TrackedCache

  /** Unpersist every signature-cache entry created by this registry
    * (idempotent; distinct query invocations over the same table share
    * one underlying entry, so dropping each handle is cheap).
    */
  def releaseSignatureCache(): Unit = tracked.release()

  /** Shared oracle CTE prefix: toks → shingle set s → DISTINCT hash
    * set hs (the exact mirror of the native shingle_hash_set — dedup
    * on hashes, so even a P-collision merges identically cross-engine).
    */
  private val SqlBase =
    s"""WITH t AS MATERIALIZED (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |sets AS MATERIALIZED (SELECT doc_id, ${NearDup.Sql.shingleSet(ShingleK)} AS s FROM t),
       |h AS MATERIALIZED (SELECT doc_id, list_distinct(${NearDup.Sql.hashSet}) AS hs FROM sets)""".stripMargin

  /** Banded-MinHash candidate pairs with both sides' hash sets bound —
    * ONE definition of the banding scheme (signature layout, the
    * empty-set-bands-to-null guard, the a<b + distinct dedup) shared
    * by every scorer over the candidate set, so a banding change
    * cannot leave one query on a stale scheme. Returns
    * (a_id, b_id, hs_a, hs_b); callers apply their score expression.
    */
  private def minhashCandidates(s: SparkSession, d: String): DataFrame = {
    val base = hashed(docs(s, d))
    // native one-pass signature array (k running minimums) instead
    // of k array_min(transform(...)) scans; `get` is 0-indexed and
    // null out-of-bounds (empty sets band to null = no candidates,
    // matching array_min-of-empty in the composed form)
    val sig = base.select(col("doc_id"),
      NearDup.minhashSigs(col("hs"), MinhashK).as("ms"))
    val bandArr = array((0 until NumBands).map { j =>
      struct(lit(j).as("band"),
        get(col("ms"), lit(j * BandR)).as("h1"),
        get(col("ms"), lit(j * BandR + 1)).as("h2"))
    }: _*)
    val idx = sig.select(col("doc_id"), explode(bandArr).as("tb"))
      .select(col("doc_id"), col("tb.band").as("band"),
        col("tb.h1").as("h1"), col("tb.h2").as("h2"))
    val cand = idx.select(col("doc_id").as("a_id"), col("band"), col("h1"), col("h2"))
      .join(idx.select(col("doc_id").as("b_id"), col("band"), col("h1"), col("h2")),
        Seq("band", "h1", "h2"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    val sets = base.select(col("doc_id"), col("hs"))
    cand
      .join(sets.select(col("doc_id").as("a_id"), col("hs").as("hs_a")), Seq("a_id"))
      .join(sets.select(col("doc_id").as("b_id"), col("hs").as("hs_b")), Seq("b_id"))
  }

  /** Candidates + exact Jaccard — the shared body of
    * `dedup_minhash_pairs` (which emits it directly) and the
    * component/canonical queries (which threshold it into an edge
    * list). Unordered output; callers sort.
    */
  private def minhashPairs(s: SparkSession, d: String): DataFrame =
    minhashCandidates(s, d)
      .select(col("a_id"), col("b_id"),
        round(NearDup.jaccardSorted(col("hs_a"), col("hs_b")), 6).as("jac"))

  /** True near-dup edges: candidates at/above the fixture's planted
    * separation threshold (jac ≥ 0.5 vs ≈0.001 background).
    */
  private val JacThreshold = 0.5

  /** Oracle CTE mirroring [[minhashPairs]] + threshold, as `pairs`. */
  private lazy val PairsSql =
    s"""sig AS MATERIALIZED (SELECT doc_id, hs, ${NearDup.Sql.minhashCols(mhParams)} FROM h),
       |pairs AS MATERIALIZED (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM sig a JOIN sig b
       |    ON a.doc_id < b.doc_id AND (${NearDup.Sql.bandEq(MinhashK, BandR)})
       |  WHERE round(${NearDup.Sql.jaccardSql("a.hs", "b.hs")}, 6) >= $JacThreshold),
       |edges AS MATERIALIZED (SELECT a_id AS u, b_id AS v FROM pairs
       |          UNION SELECT b_id, a_id FROM pairs),
       |reach(u, v) AS (
       |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
       |  UNION
       |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
       |comp AS MATERIALIZED (SELECT u AS doc_id, min(v) AS component FROM reach GROUP BY 1)""".stripMargin

  /** Exact-COMPLETE Jaccard ≥ 0.8 pairs via AllPairs prefix filtering
    * — the shared body of `dedup_prefix_filter` (which emits it) and
    * `dedup_banding_recall` (which uses it as ground truth). Returns
    * (a_id, b_id, inter, uni), unordered; completeness argument in
    * the dedup_prefix_filter scaladoc (pigeonhole on the df-ordered
    * prefix of length |s| − ⌈0.8|s|⌉ + 1).
    */
  private def prefixFilterPairs(s: SparkSession, d: String): DataFrame = {
    val base = hashed(docs(s, d)).filter(size(col("hs")) > 0)
    val e = base.select(col("doc_id"), explode(col("hs")).as("h"))
    val dfc = e.groupBy("h").agg(count(lit(1)).as("df"))
    val keyed = e.join(dfc, "h")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("df") * 1073741824L + col("h")))
        .as("ks"))
    val pfx = keyed
      .select(col("doc_id"),
        explode(slice(col("ks"), lit(1),
          expr("size(ks) - (4 * size(ks) + 4) div 5 + 1").cast("int")))
          .as("k"))
      .select(col("doc_id"), pmod(col("k"), lit(1073741824L)).as("h"))
    val cand = pfx.as("a").join(pfx.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
    cand
      .join(base.select(col("doc_id").as("a_id"), col("hs").as("hs_a")), "a_id")
      .join(base.select(col("doc_id").as("b_id"), col("hs").as("hs_b")), "b_id")
      .withColumn("inter",
        size(array_intersect(col("hs_a"), col("hs_b"))).cast("long"))
      .withColumn("uni",
        size(col("hs_a")).cast("long") + size(col("hs_b")) - col("inter"))
      .filter(col("inter") * 5L >= col("uni") * 4L)
  }

  /** Oracle CTE suite mirroring [[prefixFilterPairs]], ending in `pf`
    * with (a_id, b_id, inter, uni).
    */
  private lazy val PrefixFilterSql =
    """e AS (SELECT doc_id, unnest(hs) AS hh FROM h WHERE len(hs) > 0),
      |dfc AS (SELECT hh, count(*) AS df FROM e GROUP BY 1),
      |keyed AS (SELECT doc_id,
      |    list_sort(list(df * 1073741824 + hh)) AS ks
      |  FROM e JOIN dfc USING (hh) GROUP BY doc_id),
      |pfx AS (SELECT doc_id,
      |    unnest(ks[1 : len(ks) - (4 * len(ks) + 4) // 5 + 1]) % 1073741824
      |      AS hh
      |  FROM keyed),
      |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      |  FROM pfx a JOIN pfx b
      |    ON a.hh = b.hh AND a.doc_id < b.doc_id),
      |pf AS (SELECT * FROM (SELECT a_id, b_id,
      |    CAST(len(list_intersect(ha.hs, hb.hs)) AS BIGINT) AS inter,
      |    CAST(len(ha.hs) + len(hb.hs)
      |      - len(list_intersect(ha.hs, hb.hs)) AS BIGINT) AS uni
      |  FROM cand JOIN h ha ON ha.doc_id = a_id
      |            JOIN h hb ON hb.doc_id = b_id)
      |  WHERE inter * 5 >= uni * 4)""".stripMargin

  val all: Seq[QueryDef] = Seq(

    // ----- banded MinHash: explode to (band, signature) keys, shuffle
    // once on the key, candidates = same-bucket pairs, then exact
    // Jaccard re-rank on candidates ONLY (never all-pairs). The oracle
    // mirrors the same candidate set via an OR-of-bands join.
    QueryDef(
      "dedup_minhash_pairs",
      (s, d) => minhashPairs(s, d).orderBy("a_id", "b_id"),
      Some(s"""$SqlBase,
              |sig AS (SELECT doc_id, hs, ${NearDup.Sql.minhashCols(mhParams)} FROM h)
              |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
              |  round(${NearDup.Sql.jaccardSql("a.hs", "b.hs")}, 6) AS jac
              |FROM sig a JOIN sig b
              |  ON a.doc_id < b.doc_id AND (${NearDup.Sql.bandEq(MinhashK, BandR)})
              |ORDER BY a_id, b_id""".stripMargin),
      bench = true),

    // ----- containment-scored near-dup pairs: C_max(A,B) =
    // |A∩B| / min(|A|,|B|) over the SAME banded-MinHash candidate set
    // as dedup_minhash_pairs. Containment is the asymmetric metric
    // Jaccard under-reports when sizes differ — a short doc fully
    // embedded in a long one scores J = |A|/|B| (small) but C_max = 1
    // — the quote/boilerplate-inclusion case (the S-curve containment
    // variant of Broder's resemblance). Intersection counts are exact
    // integers (array_intersect over the distinct hash sets), so the
    // score is division-exact cross-engine — no float-order risk.
    QueryDef(
      "dedup_containment_pairs",
      (s, d) => minhashCandidates(s, d)
        .select(col("a_id"), col("b_id"),
          size(array_intersect(col("hs_a"), col("hs_b"))).cast("long").as("n_common"),
          round(size(array_intersect(col("hs_a"), col("hs_b"))).cast("double")
            / least(size(col("hs_a")), size(col("hs_b"))), 6).as("containment"))
        .orderBy("a_id", "b_id"),
      Some(s"""$SqlBase,
              |sig AS (SELECT doc_id, hs, ${NearDup.Sql.minhashCols(mhParams)} FROM h)
              |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
              |  CAST(len(list_intersect(a.hs, b.hs)) AS BIGINT) AS n_common,
              |  round(CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE)
              |    / least(len(a.hs), len(b.hs)), 6) AS containment
              |FROM sig a JOIN sig b
              |  ON a.doc_id < b.doc_id AND (${NearDup.Sql.bandEq(MinhashK, BandR)})
              |ORDER BY a_id, b_id""".stripMargin),
      bench = true),

    // ----- SimHash: 60-bit majority signature (2×30-bit rehashes —
    // simhash_wide), pairs within hamming 3. Sub-quadratic AND exact:
    // candidates come from a join on MaxHamming+1 bit-bands — by
    // pigeonhole every qualifying pair shares an intact band, so
    // banding loses nothing and the oracle (which joins all-pairs in
    // SQL) must produce identical rows. Width is the scale lever:
    // 4 bands × 15 bits = 32k bucket values per band (a 30-bit
    // signature collapsed past ~10⁴ docs — measured 58 s at 40 k);
    // the fixed absolute hamming-3 contract at growing width is the
    // Manku-style near-exact dedup design. Tunable-threshold near-dup
    // belongs to MinHash banding above.
    QueryDef(
      "dedup_simhash_pairs",
      (s, d) => {
        val base = hashed(docs(s, d))
          .withColumn("sh", NearDup.simhashWide(col("hs")))
        val idx = base.select(col("doc_id"),
            explode(NearDup.simhashBands(col("sh"), SimhashBits, MaxHamming + 1)).as("bb"))
          .select(col("doc_id"), col("bb.band").as("band"), col("bb.bv").as("bv"))
        val cand = idx.select(col("doc_id").as("a_id"), col("band"), col("bv"))
          .join(idx.select(col("doc_id").as("b_id"), col("band"), col("bv")),
            Seq("band", "bv"))
          .filter(col("a_id") < col("b_id"))
          .select("a_id", "b_id").distinct()
        val side = base.select(col("doc_id"), col("hs"), col("sh"))
        cand
          .join(side.select(col("doc_id").as("a_id"), col("hs").as("hs_a"), col("sh").as("sh_a")), Seq("a_id"))
          .join(side.select(col("doc_id").as("b_id"), col("hs").as("hs_b"), col("sh").as("sh_b")), Seq("b_id"))
          .withColumn("hd", NearDup.hamming(col("sh_a"), col("sh_b")))
          .filter(col("hd") <= MaxHamming)
          .select(col("a_id"), col("b_id"), col("hd"),
            round(NearDup.jaccardSorted(col("hs_a"), col("hs_b")), 6).as("jac"))
          .orderBy("a_id", "b_id")
      },
      Some(s"""$SqlBase,
              |sim AS (SELECT doc_id, hs, ${NearDup.Sql.simhashWideSql} AS sh FROM h)
              |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
              |  CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hd,
              |  round(${NearDup.Sql.jaccardSql("a.hs", "b.hs")}, 6) AS jac
              |FROM sim a JOIN sim b
              |  ON a.doc_id < b.doc_id AND bit_count(xor(a.sh, b.sh)) <= $MaxHamming
              |ORDER BY a_id, b_id""".stripMargin),
      bench = true),

    // ----- direct n-gram Jaccard for a bounded probe set vs the corpus
    // (probe side broadcast; correctness baseline for the LSH paths)
    QueryDef(
      "dedup_ngram_jaccard",
      (s, d) => {
        val base = hashed(docs(s, d))
        val probes = base.filter(col("doc_id") < 100)
          .select(col("doc_id").as("a_id"), col("hs").as("hs_a"))
        base.select(col("doc_id").as("b_id"), col("hs").as("hs_b"))
          .join(broadcast(probes), col("a_id") =!= col("b_id"))
          .withColumn("jac", round(NearDup.jaccardSorted(col("hs_a"), col("hs_b")), 6))
          .filter(col("jac") >= 0.3)
          .select("a_id", "b_id", "jac")
          .orderBy("a_id", "b_id")
      },
      Some(s"""$SqlBase
              |SELECT p.doc_id AS a_id, q.doc_id AS b_id,
              |  round(${NearDup.Sql.jaccardSql("p.hs", "q.hs")}, 6) AS jac
              |FROM h p JOIN h q ON p.doc_id < 100 AND q.doc_id <> p.doc_id
              |WHERE round(${NearDup.Sql.jaccardSql("p.hs", "q.hs")}, 6) >= 0.3
              |ORDER BY a_id, b_id""".stripMargin)),

    // ----- eval-set decontamination: per-train-doc count of shingle
    // hashes shared with a (bounded, broadcast) eval set — the
    // n-gram-overlap check every serious training corpus runs against
    // its benchmarks before training. The eval side is distinct-hash
    // exploded and BROADCAST (eval sets are bounded by construction);
    // the train side streams map-side through the broadcast hash join,
    // so the only shuffle is the final per-doc count — the shape that
    // holds when "train" is 100 TB and "eval" is a few MB.
    QueryDef(
      "decon_eval_overlap",
      (s, d) => {
        val base = hashed(docs(s, d))
        val evalHashes = base.filter(col("doc_id") < 25)
          .select(explode(col("hs")).as("h")).distinct()
        base.filter(col("doc_id") >= 25)
          .select(col("doc_id"), explode(col("hs")).as("h"))
          .join(broadcast(evalHashes), "h")
          .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
          .orderBy("doc_id")
      },
      Some(s"""$SqlBase,
              |ev AS (SELECT DISTINCT unnest(hs) AS h FROM h WHERE doc_id < 25),
              |tr AS (SELECT doc_id, unnest(hs) AS h FROM h WHERE doc_id >= 25)
              |SELECT tr.doc_id, count(*) AS n_hit FROM tr JOIN ev USING (h)
              |GROUP BY 1 ORDER BY doc_id""".stripMargin)),

    // ----- connected components over the near-dup pair graph: pairs →
    // transitive dedup CLUSTERS (a~b, b~c ⇒ {a,b,c} one cluster, one
    // canonical survivor). Spark side: iterative min-label propagation
    // (Dedup.connectedComponents, one node-key shuffle per round,
    // rounds = cluster diameter). Oracle: DuckDB RECURSIVE CTE
    // transitive closure over the SAME hash-verified edge set — the
    // iterative distributed algorithm is checked against a closed-form
    // fixpoint from a different engine.
    QueryDef(
      "dedup_components",
      (s, d) => {
        val edges = minhashPairs(s, d).filter(col("jac") >= JacThreshold)
        graft.ext.Dedup.connectedComponents(edges, "a_id", "b_id")
          .select(col("node").as("doc_id"), col("comp").as("component"))
          .orderBy("doc_id")
      },
      Some(s"""${SqlBase.replaceFirst("WITH ", "WITH RECURSIVE ")},
              |$PairsSql
              |SELECT doc_id, component FROM comp ORDER BY doc_id""".stripMargin)),

    // ----- canonical-keep summary: the end-of-pipeline number a dedup
    // run reports — corpus size, dup clusters, docs removed (all but
    // the min-id doc per cluster), docs kept.
    QueryDef(
      "dedup_keep_canonical",
      (s, d) => {
        val edges = minhashPairs(s, d).filter(col("jac") >= JacThreshold)
        val comps = graft.ext.Dedup.connectedComponents(edges, "a_id", "b_id")
        graft.ext.Dedup.keepCanonicalSummary(docs(s, d), comps)
      },
      Some(s"""${SqlBase.replaceFirst("WITH ", "WITH RECURSIVE ")},
              |$PairsSql,
              |agg AS (SELECT count(DISTINCT component) AS n_clusters,
              |               count(*) FILTER (doc_id <> component) AS n_removed
              |        FROM comp)
              |SELECT (SELECT count(*) FROM documents) AS n_docs,
              |  n_clusters, n_removed,
              |  (SELECT count(*) FROM documents) - n_removed AS n_kept
              |FROM agg""".stripMargin)),

    // ----- cluster-size histogram over the near-dup components: the
    // distribution a dedup run publishes (how much boilerplate, how
    // big the worst cluster). Two cheap re-aggs over the CC output —
    // per-component counts, then counts-of-counts; the second agg's
    // key space is O(max cluster size).
    QueryDef(
      "dedup_cluster_sizes",
      (s, d) => {
        val edges = minhashPairs(s, d).filter(col("jac") >= JacThreshold)
        graft.ext.Dedup.connectedComponents(edges, "a_id", "b_id")
          .groupBy("comp").agg(count(lit(1)).as("sz"))
          .groupBy("sz").agg(count(lit(1)).as("n_clusters"))
          .orderBy("sz")
      },
      Some(s"""${SqlBase.replaceFirst("WITH ", "WITH RECURSIVE ")},
              |$PairsSql
              |SELECT sz, count(*) AS n_clusters FROM
              |(SELECT component, count(*) AS sz FROM comp GROUP BY 1)
              |GROUP BY 1 ORDER BY sz""".stripMargin)),

    // ----- sparse-cosine near-dup via an inverted index: weighted
    // (multiset) shingle-count cosine, candidates from a df-pruned
    // postings self-join — the OTHER standard near-dup candidate
    // strategy next to minhash banding (sparse-retrieval style:
    // Elasticsearch more-like-this, plagiarism detectors). Feature
    // space is hashed 3-shingles, not unigrams: the corpus vocabulary
    // is ~31 words (every unigram is a stop word — background unigram
    // cosine sits at 0.6-0.7), while shingle df ≤ 10 across the board
    // and shingle cosine is cleanly bimodal (planted clones ≥ 0.8,
    // background < 0.2; measured at sf0.01). The df prune is the
    // inverted-index scale lever: a shingle in m docs contributes
    // O(m²) candidate pairs, so boilerplate shingles (df > DfMax) are
    // exactly the postings that must never self-join. Re-scoring is
    // per-pair map arithmetic over the two full count maps
    // (map_zip_with product + integer sum), so pruned shingles still
    // count in the SCORE; counts are integers, so dot and the squared
    // norms are order-invariant longs and cos = dot/sqrt(n2a·n2b) is
    // one IEEE sqrt + divide + round — bit-identical cross-engine (no
    // float-accumulation-order risk). Recall contract (mirrored by
    // the oracle, same discipline as dedup_semantic_cells): a
    // candidate pair must share ≥ SparseMinShared rare (df ≤ DfMax)
    // shingles — pairs riding on boilerplate-only or 1-2-shingle
    // overlap are deliberately out of contract. Scale shape: postings
    // self-join shuffles on the 8-byte shingle hash with per-key
    // fan-out bounded by DfMax²; the pair-count agg is map-side
    // combinable and collapses candidates BEFORE the count-map
    // join-backs (uniform doc_id keys); nothing all-pairs.
    // Not in the headline bench tier: each timed sample starts
    // data-cold (clearCache per sample), and this query's cost IS the
    // signature/count-map build — measured 10.8 s cold / 1.4-2.9 s
    // cache-warm at sf0.1 — so benching it measures cache rebuild,
    // not the candidate physics; PPJoin-style prefix filtering is the
    // known next lever if the warm Σdf² pair agg ever needs cutting.
    QueryDef(
      "dedup_sparse_cosine",
      (s, d) => {
        val shingleHashes =
          NearDup.shingleHashList(TextAnalysis.tokens(col("text")), ShingleK)
        // tracked-cached: the plan reads tf from three branches (rare
        // dfs, postings, count-map build) and vecs from two (pair
        // sides) — same signature-cache discipline as `hashed`
        val tf = tracked(docs(s, d)
          .select(col("doc_id"), explode(shingleHashes).as("h"))
          .groupBy("doc_id", "h").agg(count(lit(1)).as("tf")))
        val rare = tf.groupBy("h").agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= SparseDfMax).select("h")
        val posting = tf.join(rare, Seq("h")).select("h", "doc_id")
        // overlap prune: the pair count is a map-side-combinable agg,
        // so the ≥MinShared filter collapses the candidate set before
        // anything joins back to the full count maps
        val cand = posting.select(col("h"), col("doc_id").as("a_id"))
          .join(posting.select(col("h"), col("doc_id").as("b_id")), Seq("h"))
          .filter(col("a_id") < col("b_id"))
          .groupBy("a_id", "b_id").agg(count(lit(1)).as("__shared"))
          .filter(col("__shared") >= SparseMinShared)
          .select("a_id", "b_id")
        val vecs = tracked(tf.groupBy("doc_id")
          .agg(map_from_entries(collect_list(struct(col("h"), col("tf")))).as("vec"),
               sum(col("tf") * col("tf")).as("n2")))
        val dot = aggregate(
          map_values(map_zip_with(col("__va"), col("__vb"),
            (_, x, y) => coalesce(x, lit(0L)) * coalesce(y, lit(0L)))),
          lit(0L), (acc, v) => acc + v)
        cand
          .join(vecs.select(col("doc_id").as("a_id"), col("vec").as("__va"), col("n2").as("__n2a")), Seq("a_id"))
          .join(vecs.select(col("doc_id").as("b_id"), col("vec").as("__vb"), col("n2").as("__n2b")), Seq("b_id"))
          .withColumn("dot", dot)
          .withColumn("cos", round(col("dot").cast("double")
            / sqrt((col("__n2a") * col("__n2b")).cast("double")), 6))
          .filter(col("cos") >= SparseCosThreshold)
          .select("a_id", "b_id", "dot", "cos")
          .orderBy("a_id", "b_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
              |sh AS (SELECT doc_id,
              |  unnest(${NearDup.Sql.shingleHashList(ShingleK)}) AS h FROM t),
              |tf AS (SELECT doc_id, h, count(*)::BIGINT AS tf FROM sh GROUP BY 1, 2),
              |norms AS (SELECT doc_id, sum(tf*tf) AS n2 FROM tf GROUP BY 1),
              |rare AS (SELECT h FROM
              |  (SELECT h, count(*) AS df FROM tf GROUP BY 1) WHERE df <= $SparseDfMax),
              |cand AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
              |  FROM tf a JOIN tf b ON a.h = b.h AND a.doc_id < b.doc_id
              |  JOIN rare r ON a.h = r.h
              |  GROUP BY 1, 2 HAVING count(*) >= $SparseMinShared),
              |dots AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
              |  CAST(sum(a.tf*b.tf) AS BIGINT) AS dot
              |  FROM tf a JOIN tf b ON a.h = b.h AND a.doc_id < b.doc_id
              |  GROUP BY 1, 2)
              |SELECT c.a_id AS a_id, c.b_id AS b_id, dot,
              |  round(CAST(dot AS DOUBLE) / sqrt(CAST(na.n2 * nb.n2 AS DOUBLE)), 6) AS cos
              |FROM cand c JOIN dots d ON c.a_id = d.a_id AND c.b_id = d.b_id
              |JOIN norms na ON na.doc_id = c.a_id JOIN norms nb ON nb.doc_id = c.b_id
              |WHERE round(CAST(dot AS DOUBLE) / sqrt(CAST(na.n2 * nb.n2 AS DOUBLE)), 6) >= $SparseCosThreshold
              |ORDER BY c.a_id, c.b_id""".stripMargin)),

    // ----- incremental ingest dedup: a NEW batch (including simulated
    // re-crawls — every 3rd already-ingested doc re-arrives under a
    // fresh doc_id) anti-joined on content fingerprint against the
    // ALREADY-INGESTED corpus — the daily-ingest shape of a long-lived
    // 100 TB pipeline, where dedup-against-history dominates
    // dedup-within-batch. Scale shape: the anti-join needs only the
    // corpus's 16-byte md5 keys, never its text — a hash shuffle on
    // fingerprint both sides (or a broadcast anti-join while the
    // corpus FP set fits executor memory: ~16 GB per 10^9 docs).
    QueryDef(
      "dedup_incremental",
      (s, d) => {
        val base = docs(s, d)
        val corpus = base.filter(col("doc_id") % 7 === 0)
        val ingest = base.filter(col("doc_id") % 7 =!= 0)
          .select(col("doc_id"), col("source"), col("text"))
          .unionAll(corpus.filter(col("doc_id") % 21 === 0)
            .select((col("doc_id") + 500000L).as("doc_id"), col("source"), col("text")))
        // distinct BEFORE the join: the corpus may itself contain
        // repeated texts, and the anti-join build side should carry
        // the distinct fingerprint set (the size SCALING.md budgets),
        // not one key per corpus row
        ingest.join(
            corpus.select(TextAnalysis.fingerprint(col("text")).as("__fp")).distinct(),
            TextAnalysis.fingerprint(col("text")) === col("__fp"), "left_anti")
          .groupBy("source").agg(count(lit(1)).as("n_new"))
          .orderBy("source")
      },
      Some("""WITH corpus AS (SELECT * FROM documents WHERE doc_id % 7 = 0),
             |ingest AS (
             |  SELECT doc_id, source, text FROM documents WHERE doc_id % 7 <> 0
             |  UNION ALL
             |  SELECT doc_id + 500000, source, text FROM corpus WHERE doc_id % 21 = 0)
             |SELECT source, count(*) AS n_new FROM ingest
             |ANTI JOIN corpus ON md5(ingest.text) = md5(corpus.text)
             |GROUP BY 1 ORDER BY source""".stripMargin),
      bench = true),

    // ----- incremental NEAR-dup: new arrivals vs an existing corpus
    // (dedup_incremental's history discipline applied to the banded
    // near-dup class; the batch analog of stream/StreamingNearDup).
    // The asymmetric split is the scale win over the all-pairs query:
    // candidates are (arrival × history) band collisions only —
    // arrival-side band keys join against the history index, so daily
    // work is O(Δ·bands) shuffle regardless of corpus size, and the
    // history side is exactly the pre-computed signature index a
    // production pipeline keeps materialized between runs. Per
    // arrival the output is the dedup DECISION (match count, first
    // matched history doc, best Jaccard) — what an admission gate
    // consumes — not the raw pair list.
    QueryDef(
      "dedup_incremental_near",
      (s, d) => {
        val base = hashed(docs(s, d))
        val sig = base.select(col("doc_id"),
          NearDup.minhashSigs(col("hs"), MinhashK).as("ms"))
        val bandArr = array((0 until NumBands).map { j =>
          struct(lit(j).as("band"),
            get(col("ms"), lit(j * BandR)).as("h1"),
            get(col("ms"), lit(j * BandR + 1)).as("h2"))
        }: _*)
        val idx = sig.select(col("doc_id"), explode(bandArr).as("tb"))
          .select(col("doc_id"), col("tb.band").as("band"),
            col("tb.h1").as("h1"), col("tb.h2").as("h2"))
        val cand = idx.filter(col("doc_id") % 3 =!= 0)
          .select(col("doc_id").as("new_id"), col("band"), col("h1"), col("h2"))
          .join(idx.filter(col("doc_id") % 3 === 0)
            .select(col("doc_id").as("hist_id"), col("band"), col("h1"), col("h2")),
            Seq("band", "h1", "h2"))
          .select("new_id", "hist_id").distinct()
        val sets = base.select(col("doc_id"), col("hs"))
        cand
          .join(sets.select(col("doc_id").as("new_id"), col("hs").as("hs_n")), Seq("new_id"))
          .join(sets.select(col("doc_id").as("hist_id"), col("hs").as("hs_h")), Seq("hist_id"))
          .select(col("new_id"), col("hist_id"),
            round(NearDup.jaccardSorted(col("hs_n"), col("hs_h")), 6).as("jac"))
          .filter(col("jac") >= JacThreshold)
          .groupBy("new_id")
          .agg(count(lit(1)).as("n_matches"),
            min("hist_id").as("first_match"),
            max("jac").as("best_jac"))
          .orderBy("new_id")
      },
      Some(s"""$SqlBase,
              |sig AS (SELECT doc_id, hs, ${NearDup.Sql.minhashCols(mhParams)} FROM h),
              |m AS (
              |  SELECT a.doc_id AS new_id, b.doc_id AS hist_id,
              |    round(${NearDup.Sql.jaccardSql("a.hs", "b.hs")}, 6) AS jac
              |  FROM sig a JOIN sig b
              |    ON a.doc_id % 3 <> 0 AND b.doc_id % 3 = 0
              |   AND (${NearDup.Sql.bandEq(MinhashK, BandR)})
              |  WHERE round(${NearDup.Sql.jaccardSql("a.hs", "b.hs")}, 6) >= $JacThreshold)
              |SELECT new_id, CAST(count(*) AS BIGINT) AS n_matches,
              |  CAST(min(hist_id) AS BIGINT) AS first_match,
              |  max(jac) AS best_jac
              |FROM m GROUP BY 1 ORDER BY new_id""".stripMargin)),

    // ----- golden-record survivorship (the MDM step AFTER clustering:
    // dedup_components says WHICH records are the same entity, this
    // says what the ONE surviving record looks like — per-field merge
    // rules instead of blanket keep-min-id): per near-dup cluster,
    // id = min member (stable canonical), source/lang = majority vote
    // with a pinned tie-break (count desc, value asc — deterministic
    // where a bare mode() is engine-defined), n_chars = max (the
    // keep-the-longest content rule). SCALE: members ≤ corpus, per-
    // field votes are per-cluster aggs on uniform keys (cluster sizes
    // are the CC output the size-histogram query already bounds), the
    // vote rank runs on \|cluster × distinct-values\| rows — no new
    // shuffle class beyond the CC build itself. Oracle replays the
    // vote over the same RECURSIVE-CTE components.
    QueryDef(
      "dedup_golden_record",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val edges = minhashPairs(s, d).filter(col("jac") >= JacThreshold)
        val comps = graft.ext.Dedup.connectedComponents(edges, "a_id", "b_id")
          .select(col("node").as("doc_id"), col("comp").as("component"))
        val mem = docs(s, d).join(comps, "doc_id")
        val agg = mem.groupBy("component").agg(
          min("doc_id").as("golden_id"),
          count(lit(1)).as("n_members"),
          max("n_chars").as("max_chars"))
        def majority(field: String): DataFrame = {
          val w = Window.partitionBy("component")
            .orderBy(col("__c").desc, col(field))
          mem.groupBy("component", field).agg(count(lit(1)).as("__c"))
            .withColumn("__rk", row_number().over(w))
            .filter(col("__rk") === 1)
            .select(col("component"), col(field))
        }
        agg.join(majority("source"), "component")
          .join(majority("lang"), "component")
          .select("component", "golden_id", "n_members", "source",
            "lang", "max_chars")
          .orderBy("component")
      },
      Some(s"""${SqlBase.replaceFirst("WITH ", "WITH RECURSIVE ")},
              |$PairsSql,
              |mem AS (SELECT c.component, d.doc_id, d.source, d.lang, d.n_chars
              |        FROM comp c JOIN documents d USING (doc_id)),
              |agg AS (SELECT component, min(doc_id) AS golden_id,
              |        CAST(count(*) AS BIGINT) AS n_members,
              |        max(n_chars) AS max_chars
              |        FROM mem GROUP BY 1),
              |src AS (SELECT component, source FROM (
              |    SELECT component, source,
              |      row_number() OVER (PARTITION BY component
              |        ORDER BY count(*) DESC, source) AS rk
              |    FROM mem GROUP BY component, source) WHERE rk = 1),
              |lng AS (SELECT component, lang FROM (
              |    SELECT component, lang,
              |      row_number() OVER (PARTITION BY component
              |        ORDER BY count(*) DESC, lang) AS rk
              |    FROM mem GROUP BY component, lang) WHERE rk = 1)
              |SELECT a.component, a.golden_id, a.n_members, s.source,
              |  l.lang, a.max_chars
              |FROM agg a JOIN src s USING (component) JOIN lng l USING (component)
              |ORDER BY component""".stripMargin)),

    // ----- prefix-filtering set-similarity join (Chaudhuri/Ganti/
    // Kaushik AllPairs; the THIRD standard candidate strategy next to
    // minhash banding and the sparse-cosine inverted index): order
    // each doc's shingle hashes by global df ascending (rarest first,
    // tie by hash — a single sortable integer key df·2³⁰+h, no struct
    // sort semantics cross-engine), keep the PREFIX of length
    // |s| − ⌈0.8·|s|⌉ + 1; two sets with Jaccard ≥ 0.8 MUST share a
    // prefix token (pigeonhole on the ⌈τ|s|⌉ overlap bound), so the
    // candidate join runs only on prefix tokens — which are the
    // globally RAREST by construction: boilerplate shingles fall
    // outside every prefix, the AllPairs argument that bounds fan-out
    // without sparse-cosine's hard df cap. Verification is exact
    // integer arithmetic: 5·|∩| ≥ 4·|∪| — no float threshold.
    // Ceil on longs: ⌈4s/5⌉ = (4s+4) div 5, exact both engines.
    QueryDef(
      "dedup_prefix_filter",
      (s, d) => prefixFilterPairs(s, d)
        .select(col("a_id"), col("b_id"), col("inter"), col("uni"))
        .orderBy("a_id", "b_id"),
      Some(s"""$SqlBase,
              |$PrefixFilterSql
              |SELECT a_id, b_id, inter, uni FROM pf
              |ORDER BY a_id, b_id""".stripMargin)),

    // ----- banding-recall measurement (the quality gauge the hash
    // oracle cannot express alone: dedup_minhash_pairs pins WHICH
    // candidates banding yields, this measures HOW MANY of the true
    // pairs it finds). Ground truth = prefixFilterPairs — exact AND
    // complete at J ≥ 0.8 by the pigeonhole lemma, so recall is
    // measurable WITHOUT an all-pairs sweep at any scale (both sides
    // are candidate-bounded plans). 16-sig/8-band×2-row banding
    // catches a J=0.8 pair with p = 1-(1-0.8²)^8 ≈ 0.9997 per the
    // S-curve, so recall must sit near 1.0 — a drop is a broken
    // signature/banding change, which is exactly what a regression
    // gate wants to see. One summary row at any scale.
    QueryDef(
      "dedup_banding_recall",
      (s, d) => {
        val truth = prefixFilterPairs(s, d).select("a_id", "b_id")
        val banded = minhashCandidates(s, d).select("a_id", "b_id")
        val hits = banded.join(truth, Seq("a_id", "b_id"))
        truth.agg(count(lit(1)).as("n_truth"))
          .crossJoin(banded.agg(count(lit(1)).as("n_banded")))
          .crossJoin(hits.agg(count(lit(1)).as("n_hits")))
          .select(col("n_truth"), col("n_banded"), col("n_hits"),
            round(col("n_hits").cast("double") / col("n_truth"), 6).as("recall"))
      },
      Some(s"""$SqlBase,
              |$PrefixFilterSql,
              |sig AS (SELECT doc_id, hs, ${NearDup.Sql.minhashCols(mhParams)} FROM h),
              |banded AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
              |  FROM sig a JOIN sig b
              |    ON a.doc_id < b.doc_id AND (${NearDup.Sql.bandEq(MinhashK, BandR)})),
              |tr AS (SELECT count(*) AS n_truth FROM pf),
              |bd AS (SELECT count(*) AS n_banded FROM banded),
              |ht AS (SELECT count(*) AS n_hits
              |  FROM banded JOIN pf USING (a_id, b_id))
              |SELECT n_truth, n_banded, n_hits,
              |  round(CAST(n_hits AS DOUBLE) / n_truth, 6) AS recall
              |FROM tr, bd, ht""".stripMargin)),
    // ----- Leakage-safe train/val/test split (the composition the
    // split and dedup families exist FOR: hashing DOC ids sends
    // near-duplicate docs to DIFFERENT splits, so the test set
    // contains paraphrases of training docs and evals inflate — the
    // remedy is splitting by the DUP-CLUSTER canonical, so whole
    // clusters move together): groups = CC components over the
    // banded-minhash graph (singletons are their own group), split =
    // group-hash % 10 (8/1/1). SELF-CERTIFYING output: the group-
    // split straddle count is structurally 0 (same group ⇒ same
    // hash), while the naive doc-hash straddle count alongside
    // MEASURES the leakage the op prevents — multi-doc clusters
    // whose members would land in different naive splits. One
    // CC build + two doc-key aggs; output is one audit row.
    QueryDef(
      "tx44_leakage_safe_split",
      (s, d) => {
        val edges = minhashPairs(s, d).filter(col("jac") >= JacThreshold)
        val comps = graft.ext.Dedup.connectedComponents(edges, "a_id", "b_id")
          .select(col("node").as("doc_id"), col("comp").as("component"))
        val g = docs(s, d).select(col("doc_id"))
          .join(comps, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("component"), col("doc_id")).as("grp"))
          .select(col("grp"),
            (NearDup.charHash(col("grp").cast("string")) % 10L).as("split"),
            (NearDup.charHash(col("doc_id").cast("string")) % 10L)
              .as("naive"))
        val per = g.agg(
          sum(when(col("split") < 8L, 1L).otherwise(0L)).as("n_train"),
          sum(when(col("split") === 8L, 1L).otherwise(0L)).as("n_val"),
          sum(when(col("split") === 9L, 1L).otherwise(0L)).as("n_test"))
        val straddle = g.groupBy("grp").agg(
            countDistinct(col("split")).as("ks"),
            countDistinct(col("naive")).as("kn"),
            count(lit(1)).as("m"))
          .agg(
            sum(when(col("ks") > 1L, 1L).otherwise(0L))
              .as("groups_straddling"),
            sum(when(col("kn") > 1L && col("m") > 1L, 1L).otherwise(0L))
              .as("groups_leaking_naive"))
        per.crossJoin(broadcast(straddle))
      },
      Some(s"""${SqlBase.replaceFirst("WITH ", "WITH RECURSIVE ")},
              |$PairsSql,
              |g AS (SELECT d.doc_id,
              |    coalesce(c.component, d.doc_id) AS grp
              |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id),
              |gs AS (SELECT grp,
              |    (${graft.ext.NearDup.Sql.charHashSql("CAST(grp AS VARCHAR)")}) % 10 AS split,
              |    (${graft.ext.NearDup.Sql.charHashSql("CAST(doc_id AS VARCHAR)")}) % 10 AS naive
              |  FROM g),
              |per AS (SELECT
              |    CAST(sum(CASE WHEN split < 8 THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
              |    CAST(sum(CASE WHEN split = 8 THEN 1 ELSE 0 END) AS BIGINT) AS n_val,
              |    CAST(sum(CASE WHEN split = 9 THEN 1 ELSE 0 END) AS BIGINT) AS n_test
              |  FROM gs),
              |st AS (SELECT
              |    CAST(sum(CASE WHEN ks > 1 THEN 1 ELSE 0 END) AS BIGINT) AS groups_straddling,
              |    CAST(sum(CASE WHEN kn > 1 AND m > 1 THEN 1 ELSE 0 END) AS BIGINT) AS groups_leaking_naive
              |  FROM (SELECT grp, count(DISTINCT split) AS ks,
              |      count(DISTINCT naive) AS kn, count(*) AS m
              |    FROM gs GROUP BY 1))
              |SELECT n_train, n_val, n_test, groups_straddling,
              |  groups_leaking_naive
              |FROM per, st""".stripMargin)),

    // ----- Cross-source duplication mix (the PROVENANCE read the
    // dedup family computes but never interprets: a near-dup cluster
    // confined to one source is re-crawl noise; one spanning sources
    // is SYNDICATION — the same content entering through independent
    // pipelines, which changes both dedup keep-policy and any
    // per-source quality statistic computed before dedup): clusters
    // are tx44's minhash-CC components (jac ≥ 0.5 — the measured
    // mid-gap threshold), joined to each member's source; per-cluster
    // majority source via a lexicographic struct max (deterministic
    // tie-break, no window), output ≤ 2 rows — single_source vs
    // cross_source cluster counts, doc volumes, majority-share
    // purity (one pinned division). Same scale shape as tx44: banded
    // candidates, frontier CC, one (cluster, source) shuffle after.
    QueryDef(
      "tx55_dup_source_mix",
      (s, d) => {
        val edges = minhashPairs(s, d).filter(col("jac") >= JacThreshold)
        val comps = graft.ext.Dedup.connectedComponents(edges, "a_id", "b_id")
          .select(col("node").as("doc_id"), col("comp").as("cluster"))
        val perSrc = comps
          .join(docs(s, d).select("doc_id", "source"), Seq("doc_id"))
          .groupBy("cluster", "source").agg(count(lit(1)).as("cnt"))
        perSrc.groupBy("cluster")
          .agg(sum("cnt").as("n_docs"), count(lit(1)).as("n_sources"),
            max(struct(col("cnt"), col("source"))).as("mj"))
          .select(when(col("n_sources") === 1, "single_source")
            .otherwise("cross_source").as("mix"),
            col("n_docs"), col("mj.cnt").as("maj_docs"))
          .groupBy("mix")
          .agg(count(lit(1)).as("n_clusters"),
            sum("n_docs").as("n_docs"),
            sum("maj_docs").as("n_majority_docs"))
          .select(col("mix"), col("n_clusters"), col("n_docs"),
            col("n_majority_docs"),
            round(col("n_majority_docs").cast("double")
              / col("n_docs").cast("double"), 6).as("purity"))
          .orderBy("mix")
      },
      Some(s"""${SqlBase.replaceFirst("WITH ", "WITH RECURSIVE ")},
              |$PairsSql,
              |ws AS (SELECT c.component AS cluster, d.source
              |  FROM comp c JOIN documents d ON c.doc_id = d.doc_id),
              |ps AS (SELECT cluster, source,
              |    CAST(count(*) AS BIGINT) AS cnt
              |  FROM ws GROUP BY 1, 2),
              |pt AS (SELECT cluster, CAST(sum(cnt) AS BIGINT) AS n_docs,
              |    CAST(count(*) AS BIGINT) AS n_sources,
              |    CAST(max({'cnt': cnt, 'source': source}).cnt AS BIGINT)
              |      AS maj_docs
              |  FROM ps GROUP BY 1)
              |SELECT CASE WHEN n_sources = 1 THEN 'single_source'
              |    ELSE 'cross_source' END AS mix,
              |  CAST(count(*) AS BIGINT) AS n_clusters,
              |  CAST(sum(n_docs) AS BIGINT) AS n_docs,
              |  CAST(sum(maj_docs) AS BIGINT) AS n_majority_docs,
              |  round(CAST(sum(maj_docs) AS DOUBLE)
              |    / CAST(sum(n_docs) AS DOUBLE), 6) AS purity
              |FROM pt GROUP BY 1 ORDER BY mix""".stripMargin)),

    // ----- LSH banding-parameter sweep, DATA-DRIVEN (the (b, r)
    // planner as a query — the capacity-law knob math evaluated
    // against the corpus's OWN similarity spectrum instead of a
    // textbook threshold: for every banding of the K=16 signature,
    // expected recall over the measured true-pair sims and expected
    // background collisions over a sampled random-pair sim
    // distribution): true-pair sims from the banded candidates at
    // jac ≥ 0.3 (the corpus is mid-gap separated — planted pairs
    // ≥ 0.5, background ≈ 0.001 — so the candidate set IS the
    // near-dup spectrum), background sims from a deterministic 3%
    // key-hash sample's exact all-pairs — note the SAMPLE-SIZE knob:
    // a fixed FRACTION squares with the corpus (3%² of n² pairs), so
    // at scale the threshold is set to target a CONSTANT ~10³-doc
    // sample (hash < k·P/n), which this fixture's 3% approximates;
    // the estimator only needs enough pairs to pin the background
    // sim histogram, not a corpus-proportional share. BOTH
    // distributions collapse
    // to a ≤1001-value rounded-sim GRID first (grid-collapse-first),
    // detection probability p(s) = 1 − (1 − s^r)^b with the integer
    // powers spelled as explicit products, and the grid-weighted
    // sums fold over sim-ORDERED packed lists (the a62 pinned-fold
    // discipline — a double sum through a hash shuffle would be
    // partition-order-dependent). Output: one row per banding with
    // expected recall and expected collisions per 10⁹ pairs — the
    // S-curve trade read directly against this corpus (measured at
    // sf0.1: (16,1) buys recall 1.0 at 1.2×10⁷ collisions/10⁹ — 1.2%
    // of ALL pairs; (8,2) keeps recall 0.999999 at 1.6×10⁵, a 76×
    // cut, which is why production runs (8,2); deeper rows stop
    // paying because the sampled background itself contains a few
    // true near-dups whose collisions no banding can refuse).
    QueryDef(
      "tx53_lsh_param_sweep",
      (s, d) => {
        def powc(c: org.apache.spark.sql.Column, n: Int) = Seq.fill(n)(c).reduce(_ * _)
        val tpGrid = tracked(minhashPairs(s, d).filter(col("jac") >= 0.3)
          .select(round(col("jac"), 3).as("s3"))
          .groupBy("s3").agg(count(lit(1)).as("ct")))
        val base = hashed(docs(s, d)).filter(size(col("hs")) > 0)
          .filter((col("doc_id") * 2654435761L) % 1000000007L % 100L < 3L)
          .select(col("doc_id"), col("hs"))
        val bgGrid = tracked(base.as("a")
          .join(base.as("b"), col("a.doc_id") < col("b.doc_id"))
          .select(round(graft.ext.NearDup.jaccardSorted(
            col("a.hs"), col("b.hs")), 3).as("s3"))
          .groupBy("s3").agg(count(lit(1)).as("ct")))
        def sweep(grid: DataFrame, b: Int, r: Int): DataFrame = {
          val lst = sort_array(collect_list(struct(col("s3"), col("ct"))))
          grid.agg(sum("ct").as("n"),
            aggregate(lst, lit(0.0d), (acc, e) =>
              acc + e.getField("ct").cast("double")
                * (lit(1.0d) - powc(lit(1.0d)
                  - powc(e.getField("s3"), r), b))).as("w"))
            .select(lit(b.toLong).as("b"), lit(r.toLong).as("r"),
              col("n"), col("w"))
        }
        val combos = Seq((16, 1), (8, 2), (4, 4), (2, 8))
        val rows = combos.map { case (b, r) =>
          sweep(tpGrid, b, r)
            .select(col("b"), col("r"), col("n").as("n_true"),
              col("w").as("wt"))
            .crossJoin(broadcast(sweep(bgGrid, b, r)
              .select(col("n").as("n_bg"), col("w").as("wb"))))
        }.reduce(_ unionAll _)
        rows.select(col("b"), col("r"), col("n_true"), col("n_bg"),
          round(col("wt") / col("n_true").cast("double"), 6)
            .as("exp_recall"),
          round(col("wb") / col("n_bg").cast("double") * 1.0e9d, 3)
            .as("exp_fp_per_1e9"))
          .orderBy("r")
      },
      Some {
        def powS(e: String, n: Int) = Seq.fill(n)(s"($e)").mkString(" * ")
        def pSql(b: Int, r: Int) =
          s"(1.0 - ${powS(s"1.0 - ${powS("s3", r)}", b)})"
        val arms = Seq((16, 1), (8, 2), (4, 4), (2, 8)).map { case (b, r) =>
          s"""SELECT CAST($b AS BIGINT) AS b, CAST($r AS BIGINT) AS r,
             |  (SELECT n FROM tn) AS n_true, (SELECT n FROM bn) AS n_bg,
             |  round((SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
             |      list(CAST(ct AS DOUBLE) * ${pSql(b, r)} ORDER BY s3)),
             |      (x, y) -> x + y) FROM tg)
             |    / CAST((SELECT n FROM tn) AS DOUBLE), 6) AS exp_recall,
             |  round((SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
             |      list(CAST(ct AS DOUBLE) * ${pSql(b, r)} ORDER BY s3)),
             |      (x, y) -> x + y) FROM bg)
             |    / CAST((SELECT n FROM bn) AS DOUBLE) * 1e9, 3)
             |    AS exp_fp_per_1e9""".stripMargin
        }.mkString("\n  UNION ALL\n")
        s"""$SqlBase,
           |sig AS (SELECT doc_id, hs,
           |    ${graft.ext.NearDup.Sql.minhashCols(mhParams)} FROM h),
           |tp AS (SELECT round(${graft.ext.NearDup.Sql.jaccardSql("a.hs", "b.hs")}, 6) AS jac
           |  FROM sig a JOIN sig b
           |    ON a.doc_id < b.doc_id
           |    AND (${graft.ext.NearDup.Sql.bandEq(MinhashK, BandR)})),
           |tg AS (SELECT round(jac, 3) AS s3, CAST(count(*) AS BIGINT)
           |    AS ct FROM tp WHERE jac >= 0.3 GROUP BY 1),
           |tn AS (SELECT CAST(sum(ct) AS BIGINT) AS n FROM tg),
           |sb AS (SELECT doc_id, hs FROM h
           |  WHERE len(hs) > 0
           |    AND (doc_id * 2654435761) % 1000000007 % 100 < 3),
           |bp AS (SELECT round(${graft.ext.NearDup.Sql.jaccardSql("a.hs", "b.hs")}, 3) AS s3
           |  FROM sb a JOIN sb b ON a.doc_id < b.doc_id),
           |bg AS (SELECT s3, CAST(count(*) AS BIGINT) AS ct FROM bp
           |  GROUP BY 1),
           |bn AS (SELECT CAST(sum(ct) AS BIGINT) AS n FROM bg)
           |SELECT * FROM ($arms) ORDER BY r""".stripMargin
      }),
  )
}

