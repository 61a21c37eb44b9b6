package graft.ext

import scala.util.Random

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Near-duplicate detection: n-gram shingling, MinHash (banded),
  * SimHash, and set-Jaccard — all pure higher-order-function `Column`
  * arithmetic with exact DuckDB mirrors (no UDFs, codegen'd).
  *
  * The cross-engine hash contract: every hash is a polynomial rolling
  * hash over character codepoints in BIGINT arithmetic
  * (`acc*31 + code (mod 1e9+7)`), so Spark and the DuckDB oracle
  * compute bit-identical signatures — MinHash/SimHash correctness is
  * hash-verified end-to-end, not just rows-only.
  *
  * Scale design (100 TB): near-dup is NEVER all-pairs. MinHash
  * candidates come from exploding each doc into (band, band-signature)
  * keys and shuffling once on that key — compare-within-bucket, the
  * same shape as Similarity's hyperplane LSH. Signature width trades
  * recall for candidate volume: r=2 rows/band × b=8 bands catches
  * j=0.5 pairs w.p. ~0.94 and j≈0 pairs w.p. ~0.
  */
object NearDup {

  /** Modulus for all polynomial hashing (< 2^30, so 16 simhash-style
    * bit tests and a*h+b (< 2^60) stay inside BIGINT).
    */
  val P: Long = 1000000007L

  /** Default fold seed for [[charHash]]. */
  val Seed: Long = 7L

  /** Polynomial codepoint hash of a string column — the cross-engine
    * primitive. Dispatches to the native codegen'd
    * [[graft.functions.PolyHash]] for the standard seed (one compiled
    * loop per string vs one interpreted lambda per character);
    * non-default seeds use the built-ins path.
    */
  def charHash(s: Column, seed: Long = Seed): Column =
    if (seed == Seed) call_function("poly_hash", s) else charHashHof(s, seed)

  /** Built-ins-only formulation — the semantic reference NearDupSpec
    * checks the native expression against. Empty chars are filtered:
    * Spark's `split(s, "")` keeps a trailing "" (Java split semantics)
    * where DuckDB's does not.
    */
  def charHashHof(s: Column, seed: Long = Seed): Column =
    aggregate(
      filter(split(s, ""), ch => length(ch) >= 1),
      lit(seed),
      (acc, ch) => (acc * 31 + ascii(ch)) % P)

  /** Distinct k-token shingles of a token array; empty below k tokens
    * (guarded — Spark `sequence` would count DOWN for n < k).
    */
  def shingles(tokens: Column, k: Int = 3): Column =
    when(size(tokens) >= k,
      array_distinct(transform(
        sequence(lit(1), size(tokens) - (k - 1)),
        i => concat_ws(" ", slice(tokens, i, lit(k))))))
      .otherwise(array().cast("array<string>"))

  /** Distinct shingle-hash set straight from a token array — the
    * native one-pass [[graft.functions.ShingleHashSet]] (no shingle
    * strings materialized, no interpreted per-element lambdas). The
    * signature-build stage of every near-dup query dispatches here;
    * [[shingleHashSetHof]] is the semantic reference.
    */
  def shingleHashSet(tokens: Column, k: Int = 3): Column =
    call_function("shingle_hash_set", tokens, lit(k))

  /** Positional (non-distinct) shingle-hash LIST: one hash per
    * shingle position, duplicates kept — the multiset/coverage
    * counterpart of [[shingleHashSet]] (sparse-cosine tf weights,
    * duplicated-n-gram coverage). Same hash, same k-guard.
    */
  def shingleHashList(tokens: Column, k: Int = 3): Column =
    when(size(tokens) >= k,
      transform(sequence(lit(1), size(tokens) - (k - 1)),
        i => charHash(concat_ws(" ", slice(tokens, i, lit(k))))))
      .otherwise(array().cast("array<bigint>"))

  /** Built-ins-only formulation — the reference NearDupSpec checks the
    * native expression against (distinct shingle strings → hash →
    * distinct hashes; identical to the native set up to P-collisions,
    * which the DuckDB mirror reproduces exactly).
    */
  def shingleHashSetHof(tokens: Column, k: Int = 3): Column =
    array_distinct(transform(shingles(tokens, k), sh => charHash(sh)))

  /** Set Jaccard of two (distinct-element) array columns:
    * |A∩B| / (|A| + |B| − |A∩B|), in double.
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  /** Native merge-walk Jaccard over SORTED distinct long arrays
    * ([[graft.functions.JaccardSorted]]) — `array_intersect` builds a
    * hash set per PAIR; sorting once per document at signature build
    * amortizes to a linear merge per pair. Values identical to
    * [[jaccard]] (order-invariant; spec-asserted).
    */
  def jaccardSorted(a: Column, b: Column): Column =
    call_function("jaccard_sorted", a, b)

  // ------------------------------------------------------------ MinHash

  /** Seeded universal-hash parameters (a, b) for the MinHash family
    * h_i(x) = (a_i·x + b_i) mod P — plan constants, mirrored verbatim
    * into the oracle SQL by [[Sql.minhashCols]].
    */
  def minhashParams(k: Int, seed: Long = 42L): Seq[(Long, Long)] = {
    val rnd = new Random(seed)
    Seq.fill(k)((1 + math.abs(rnd.nextLong()) % (P - 1), math.abs(rnd.nextLong()) % P))
  }

  /** MinHash signature columns m0..m(k-1) over a hash-set column — the
    * composed reference formulation (k interpreted array scans;
    * NearDupSpec checks [[minhashSigs]] against it).
    */
  def minhashSignature(hashes: Column, params: Seq[(Long, Long)]): Seq[Column] =
    params.zipWithIndex.map { case ((a, b), i) =>
      array_min(transform(hashes, h => (lit(a) * h + lit(b)) % P)).as(s"m$i")
    }

  /** Native one-pass k-permutation MinHash signature array
    * ([[graft.functions.MinhashSigs]]; params derived from
    * [[minhashParams]]`(k)` with the default seed, exactly what the
    * DuckDB mirror embeds).
    */
  def minhashSigs(hashes: Column, k: Int): Column =
    call_function("minhash_sigs", hashes, lit(k))

  // ------------------------------------------------------------ SimHash

  /** SimHash over a hash-set column: bit b of the output is the
    * majority vote of bit b across the element hashes
    * (2·|set-bit hashes| > |hashes|). `bits` ≤ 30 (hash space is
    * < 2^30). Dispatches to the native single-pass
    * [[graft.functions.SimhashBits]] (the HOF version re-scans the
    * array `bits` times, interpreted).
    */
  def simhash(hashes: Column, bits: Int = 30): Column =
    call_function("simhash_bits", hashes, lit(bits))

  /** Built-ins-only formulation — the semantic reference NearDupSpec
    * checks the native expression against.
    */
  def simhashHof(hashes: Column, bits: Int = 30): Column =
    (0 until bits).map { b =>
      when(lit(2) * size(filter(hashes, h => shiftright(h, b) % 2 === 1)) > size(hashes),
        lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Rehash parameter pairs for the wide (60-bit) simhash — fixed
    * seeded constants, mirrored verbatim into the oracle SQL.
    */
  val simhashRehashParams: Seq[(Long, Long)] = minhashParams(2, seed = 43L)

  /** 60-bit SimHash: two independent 30-bit majority signatures over
    * rehashes of the shingle hashes, concatenated
    * ([[graft.functions.SimhashWide]]). The scale-correct signature for
    * banded near-dup: band capacity is `2^(bits/(maxHamming+1))`, so
    * 30 bits with hamming ≤ 3 collapses to 128 bucket values (~10⁴-doc
    * ceiling, measured); 60 bits gives 4 bands × 15 bits.
    */
  def simhashWide(hashes: Column): Column =
    call_function("simhash_wide", hashes)

  /** Built-ins-only wide-simhash reference for the spec: simhash of
    * each rehash stream, second shifted up 30 bits.
    */
  def simhashWideHof(hashes: Column): Column =
    simhashRehashParams.zipWithIndex.map { case ((a, b), k) =>
      simhashHof(transform(hashes, h => (lit(a) * h + lit(b)) % P), 30) * lit(1L << (30 * k))
    }.reduce(_ + _)

  /** Hamming distance between two simhash values. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("long")

  /** Bit-band decomposition of a simhash value: `nBands` contiguous
    * bit slices as (band, band_value) structs. Pigeonhole guarantee:
    * two signatures within hamming distance `nBands - 1` share at
    * least one INTACT band — so a join on band equality is an EXACT
    * (no recall loss) sub-quadratic candidate generator for
    * `hamming <= nBands - 1`, the same explode-shuffle-join shape as
    * MinHash banding.
    */
  def simhashBands(sh: Column, bits: Int, nBands: Int): Column =
    array((0 until nBands).map { b =>
      val lo = b * bits / nBands
      val width = (b + 1) * bits / nBands - lo
      struct(lit(b).as("band"),
        (shiftright(sh, lo) % lit(1L << width)).as("bv"))
    }: _*)

  // ------------------------------------------------- DuckDB SQL mirrors

  /** DuckDB mirrors, generated from the SAME constants as the Spark
    * plans so the two engines stay in lock-step by construction.
    * All take the shingle-hash-set SQL fragment as input.
    */
  object Sql {
    /** Distinct k-shingle set over a `toks` list column (mirror of
      * [[NearDup.shingles]]; empty below k tokens because `range`'s
      * upper bound collapses).
      */
    def shingleSet(k: Int = 3): String =
      "list_distinct([array_to_string(toks[i:i+" + (k - 1) +
        "],' ') for i in range(1, len(toks)-" + (k - 2) + ")])"

    /** Hash set over a shingle-set column `s`. */
    def hashSet: String = s"list_transform(s, sh -> ${charHashSql("sh")})"

    /** Positional (non-distinct) shingle-hash list over a `toks` list
      * column — mirror of [[NearDup.shingleHashList]].
      */
    def shingleHashList(k: Int = 3): String =
      s"list_transform([array_to_string(toks[i:i+${k - 1}],' ') " +
        s"for i in range(1, len(toks)-${k - 2})], sh -> ${charHashSql("sh")})"

    def charHashSql(v: String, seed: Long = 7L): String =
      s"list_reduce(list_prepend($seed::BIGINT, " +
        s"list_transform(string_split($v,''), c -> ascii(c)::BIGINT)), " +
        s"(acc,x) -> (acc*31+x) % $P)"

    /** `m0 .. m(k-1)` minhash columns over a hash-list column `hs`. */
    def minhashCols(params: Seq[(Long, Long)]): String =
      params.zipWithIndex.map { case ((a, b), i) =>
        s"list_aggregate(list_transform(hs, h -> (($a*h+$b) % $P)), 'min') AS m$i"
      }.mkString(", ")

    /** Banded equality predicate between aliases `a` and `b` (r rows
      * per band): OR over bands of AND over the band's signature cols.
      */
    def bandEq(k: Int, r: Int): String =
      (0 until k / r).map { j =>
        (0 until r).map(o => s"a.m${j * r + o} = b.m${j * r + o}")
          .mkString("(", " AND ", ")")
      }.mkString(" OR ")

    /** Wide (60-bit) SimHash over `hs` — mirror of
      * [[NearDup.simhashWide]] with the same rehash literals.
      */
    def simhashWideSql: String =
      NearDup.simhashRehashParams.zipWithIndex.map { case ((a, b), k) =>
        (0 until 30).map { bit =>
          s"(CASE WHEN 2*len(list_filter(hs, h -> ((($a*h+$b) % ${NearDup.P}) // ${1L << bit}) % 2 = 1)) > len(hs) " +
            s"THEN ${1L << (30 * k + bit)}::BIGINT ELSE 0::BIGINT END)"
        }.mkString("(", " + ", ")")
      }.mkString("(", " + ", ")")

    def jaccardSql(a: String, b: String): String =
      s"len(list_intersect($a, $b))::DOUBLE / " +
        s"(len($a) + len($b) - len(list_intersect($a, $b)))"
  }
}
