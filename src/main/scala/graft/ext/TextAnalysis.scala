package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-training-data pipelines: token
  * stats, quality scoring, heuristic language ID, fingerprinting.
  *
  * Every function is pure `Column` arithmetic (whole-stage codegen, no
  * UDFs) and has an exact ANSI-SQL mirror used by the DuckDB oracle —
  * so each op is both scale-friendly and hash-verifiable.
  */
object TextAnalysis {

  /** Whitespace tokenization (single-space corpus contract). */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  def distinctTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** Count of tokens equal to `word` — `size(filter(...))`, mirrored by
    * DuckDB `len(list_filter(...))`.
    */
  def wordCount(text: Column, word: String): Column =
    wordCountIn(tokens(text), word)

  def wordCountIn(toks: Column, word: String): Column =
    size(filter(toks, t => t === word))

  /** Per-word occurrence counts for a fixed word list — the native
    * one-pass [[graft.functions.TokenFreqs]] (the composed form costs
    * one interpreted filter scan per word; the enrichment path counted
    * 20 words per document). Values identical to [[wordCountIn]] per
    * word (spec-asserted), so oracle mirrors are untouched.
    */
  def wordFreqs(toks: Column, words: Seq[String]): Column =
    call_function("token_freqs", toks, array(words.map(lit(_)): _*))

  /** Average token length in characters, derived without re-scanning:
    * (chars − separators) / tokens.
    */
  def avgTokenLen(text: Column): Column = {
    val n = tokenCount(text)
    (length(text) - (n - lit(1))) / n
  }

  /** Composite quality score in [0,1]: length saturation + lexical
    * diversity + stopword-presence signal. Mirrors FIXTURES' quality
    * heuristics; the exact op order is pinned for oracle parity.
    */
  val qualityStopwords: Seq[String] = Seq("the", "a", "and", "of")

  def qualityScore(text: Column): Column = qualityScoreTokens(tokens(text))

  /** Quality score from pre-materialized parts — see [[langIdParts]]
    * for why parts matter. Identical arithmetic (and op order) to
    * [[qualityScoreTokens]]: `stopHits` must be the summed counts of
    * [[qualityStopwords]].
    */
  def qualityScoreParts(ntok: Column, ndis: Column, stopHits: Column): Column = {
    val n = ntok.cast("double")
    val diversity = ndis / n
    val stopRatio = stopHits.cast("double") / n
    round(
      least(n / 50.0, lit(1.0)) * 0.5 + diversity * 0.3
        + least(stopRatio * 5.0, lit(1.0)) * 0.2, 6)
  }

  /** Token-array variant: callers enriching several signals from one
    * document should tokenize ONCE and feed every scorer the array —
    * the text variants re-split per component call, and Catalyst's
    * CollapseProject deliberately refuses to inline a non-cheap alias
    * used more than once, so a materialized token column really is
    * computed once per row.
    */
  def qualityScoreTokens(toks: Column): Column = {
    val n = size(toks).cast("double")
    val diversity = size(array_distinct(toks)) / n
    val freqs = wordFreqs(toks, qualityStopwords)
    val stopHits = qualityStopwords.indices
      .map(i => get(freqs, lit(i))).reduce(_ + _).cast("double")
    val stopRatio = stopHits / n
    round(
      least(n / 50.0, lit(1.0)) * 0.5 + diversity * 0.3
        + least(stopRatio * 5.0, lit(1.0)) * 0.2, 6)
  }

  /** Heuristic n-gram/stopword language ID: count stopword hits per
    * language, predict the argmax with a fixed preference order on
    * ties. Returns the predicted language code.
    */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "es" -> Seq("el", "la", "de", "y"),
    "de" -> Seq("der", "die", "das", "und"),
    "fr" -> Seq("le", "les", "des", "et"),
  )

  def langId(text: Column): Column = langIdTokens(tokens(text))

  /** The 16 language-marker words in [[langStopwords]] order — the
    * single `token_freqs` word list shared by lang-ID and (via the
    * `en` block, the same four words as [[qualityStopwords]]) the
    * quality score.
    */
  val allMarkerWords: Seq[String] = langStopwords.flatMap(_._2)

  /** Token-array variant of [[langId]]: one native pass counts all 16
    * marker words, then [[langIdParts]] does the argmax arithmetic.
    */
  def langIdTokens(toks: Column): Column =
    langIdParts(wordFreqs(toks, allMarkerWords))

  /** Lang-ID argmax over a PRE-MATERIALIZED counts column (one
    * `token_freqs` over [[allMarkerWords]]). Materializing matters:
    * Catalyst has no let-binding, so every `get(freqs, i)` reference in
    * the CASE/greatest tree inlines the whole freqs expression — the
    * argmax references it ~40 times, which is ~40 full token-array
    * passes per row unless `freqs` is a bound column from its own
    * projection (CollapseProject keeps non-cheap aliases used more
    * than once, but only ACROSS projections — within one select the
    * inlining is unconditional, and a pushed-down filter predicate
    * re-inlines everything down to the scan).
    */
  def langIdParts(freqs: Column): Column = {
    val offsets = langStopwords.map(_._2.length).scanLeft(0)(_ + _)
    val scores = langStopwords.zipWithIndex.map { case ((lang, words), li) =>
      lang -> words.indices
        .map(i => get(freqs, lit(offsets(li) + i))).reduce(_ + _)
    }
    // argmax with first-listed language winning ties (deterministic)
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((lang, score), acc) =>
      when(score === best && best > 0, lang).otherwise(acc)
    }
  }

  /** Summed counts of the `en` block of an [[allMarkerWords]] freqs
    * column — the same four words as [[qualityStopwords]], so this is
    * the `stopHits` input of [[qualityScoreParts]] (integer addition:
    * order-independent, oracle-identical).
    */
  def stopHitsFromFreqs(freqs: Column): Column =
    langStopwords.head._2.indices.map(i => get(freqs, lit(i))).reduce(_ + _)

  /** Document fingerprint: md5 of the text — identical hex in DuckDB. */
  def fingerprint(text: Column): Column = md5(text)

  /** Deterministic content-hash bucket in [0, buckets) — the
    * cross-engine split/sampling primitive (polynomial code-point hash
    * of the text, mod buckets). Content-keyed, so the assignment
    * survives re-sharding, re-ingestion, and id reassignment — the
    * reproducibility property a train/holdout split or a sampled eval
    * slice must have in a long-lived 100 TB pipeline (`rand()` is not
    * reproducible and `row_number` is partition-order-dependent).
    * charHash is non-negative, so plain `%` suffices.
    */
  def hashBucket(text: Column, buckets: Int): Column =
    NearDup.charHash(text) % buckets

  /** BPE-ish regex tokenization (brief: "token counting — whitespace +
    * a BPE-ish regex"): alpha runs, digit runs, and single
    * non-alphanumeric marks as separate tokens. The pattern uses only
    * character classes so Java (Spark) and RE2 (DuckDB) agree.
    */
  val regexTokenPattern: String = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

  def regexTokens(text: Column): Column =
    regexp_extract_all(text, lit(regexTokenPattern), lit(0))

  def regexTokenCount(text: Column): Column = size(regexTokens(text))

  /** Count of punctuation/symbol tokens (the punct-ratio quality
    * signal): regex tokens that contain no alphanumeric character.
    */
  def punctTokenCount(text: Column): Column =
    size(filter(regexTokens(text), t => t.rlike("^[^a-zA-Z0-9]")))

  /** Adjacent token pairs ("w1 w2" strings) via shifted-slice zip; the
    * guard keeps the slice length non-negative for 0/1-token docs
    * (sequence/slice with a negative length is the inverted-interval
    * trap RangeJoin hit). The BPE pair-count and bigram-LM inner loop.
    */
  def adjacentPairs(toks: Column): Column = {
    val n = size(toks)
    zip_with(
      slice(toks, lit(1), greatest(n - 1, lit(0))),
      slice(toks, lit(2), greatest(n - 1, lit(0))),
      (a, b) => concat_ws(" ", a, b))
  }

  /** Repeated-token ratio: 1 − distinct/total — the crudest
    * boilerplate/degenerate-text signal (a page of "buy buy buy …"
    * scores near 1).
    */
  def dupTokenRatio(toks: Column): Column =
    lit(1.0) - size(array_distinct(toks)).cast("double") / size(toks)

  /** Repeated-2-gram ratio: 1 − distinct 2-grams / total 2-grams —
    * the Gopher/C4-style repetition filter signal (catches looped
    * phrases that token-level dedup misses; higher-n variants follow
    * the same shape). Docs with <2 tokens score 0. Built on the same
    * [[adjacentPairs]] construction as the BPE/bigram-LM queries, so
    * the pair format cannot silently diverge. Per-row array
    * arithmetic: only the ratio doubles leave the scan.
    */
  def dup2gramRatio(toks: Column): Column = {
    val n = size(toks)
    when(n < 2, lit(0.0))
      .otherwise(lit(1.0)
        - size(array_distinct(adjacentPairs(toks))).cast("double") / (n - 1))
  }

  /** Overlapping fixed-size token windows (`chunkSize` tokens at
    * `stride`): the context-window prep primitive shared by the
    * chunking and passage-dedup queries — one definition so the
    * window arithmetic cannot diverge between them. Every input emits
    * ≥1 chunk (`split` on empty text yields [""], one token; an EMPTY
    * token array — unreachable via [[tokens]] but legal for a public
    * primitive — yields one empty chunk); the last chunk truncates at
    * the end of the doc.
    */
  def overlappingChunks(toks: Column, chunkSize: Int, stride: Int): Column = {
    val n = size(toks)
    // Column./ is double division — floor+cast for the chunk count.
    // greatest(…, 0) guards n = 0: sequence(0, -1) DESCENDS, which
    // would emit two garbage chunks (the inverted-sequence trap
    // adjacentPairs guards the same way).
    transform(sequence(lit(0), greatest(floor((n - 1) / stride), lit(0)).cast("int")),
      i => slice(toks, i * stride + 1, lit(chunkSize)))
  }

  /** SQL mirrors (DuckDB dialect) for the oracle. */
  object Sql {
    val tokenCount = "len(string_split(text, ' '))"
    val regexTokenCount =
      s"len(regexp_extract_all(text, '${TextAnalysis.regexTokenPattern}'))"
    val punctTokenCount =
      s"len(list_filter(regexp_extract_all(text, '${TextAnalysis.regexTokenPattern}'), " +
        "t -> regexp_matches(t, '^[^a-zA-Z0-9]')))"
    val distinctTokenCount = "len(list_distinct(string_split(text, ' ')))"
    val dupTokenRatio =
      s"(1.0 - $distinctTokenCount::DOUBLE / $tokenCount)"
    /** Mirror of [[TextAnalysis.dup2gramRatio]]: DuckDB lists are
      * 1-indexed where Spark `get` is 0-indexed — j ranges differ,
      * the 2-gram strings are identical.
      */
    val dup2gramRatio =
      "(CASE WHEN len(string_split(text, ' ')) < 2 THEN 0.0 ELSE " +
        "1.0 - len(list_distinct(list_transform(" +
        "generate_series(1, len(string_split(text, ' ')) - 1), " +
        "j -> string_split(text, ' ')[j] || ' ' || string_split(text, ' ')[j+1])))::DOUBLE" +
        " / (len(string_split(text, ' ')) - 1) END)"
    def wordCount(word: String): String =
      s"len(list_filter(string_split(text, ' '), t -> t = '$word'))"

    def qualityScore: String = {
      val n = s"CAST($tokenCount AS DOUBLE)"
      val stopHits = TextAnalysis.qualityStopwords.map(wordCount).mkString(" + ")
      s"round(least($n / 50.0, 1.0) * 0.5 + ($distinctTokenCount / $n) * 0.3" +
        s" + least((CAST($stopHits AS DOUBLE) / $n) * 5.0, 1.0) * 0.2, 6)"
    }

    def langId: String = {
      val scores = TextAnalysis.langStopwords.map { case (lang, words) =>
        lang -> words.map(wordCount).mkString(" + ")
      }
      val best = scores.map(_._2).map(s => s"($s)")
        .reduce((a, b) => s"greatest($a, $b)")
      scores.foldRight("'und'") { case ((lang, score), acc) =>
        s"CASE WHEN ($score) = $best AND $best > 0 THEN '$lang' ELSE $acc END"
      }
    }

    /** Mirror of [[TextAnalysis.hashBucket]] over the `text` column. */
    def hashBucket(buckets: Int): String =
      s"(${graft.ext.NearDup.Sql.charHashSql("text")}) % $buckets"
  }
}
