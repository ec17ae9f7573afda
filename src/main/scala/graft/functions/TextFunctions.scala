package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for large-scale document pipelines
  * (SURVEY.md §7.2 M5). All pure Catalyst expressions — codegen'd, no UDFs —
  * so they stay inside whole-stage codegen over 100 TB document scans.
  */
object TextFunctions {

  /** Tiny English stopword list for quality / language heuristics. */
  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "it")

  /** Whitespace tokenization; empty/blank text → empty array (not [""]).
    * Native single-pass kernel ([[org.apache.spark.sql.graft.WhitespaceTokens]],
    * byte-identical to `split(trim(text), "\\s+")` for Java's `\s` class)
    * — the regex engine dominated every text-path profile. */
  def tokens(text: Column): Column = {
    import org.apache.spark.sql.graft.{Bridge, WhitespaceTokens}
    Bridge.column(WhitespaceTokens(Bridge.expression(text)))
  }

  def tokenCount(text: Column): Column = size(tokens(text))

  /** GPT-style pre-tokenizer pattern (ASCII subset): contractions, space-
    * prefixed letter runs, digit runs, punctuation runs. Same semantics in
    * Java regex and RE2 (no engine-specific constructs), so it is DuckDB-
    * oracle-safe. */
  val BpePattern: String = "'[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+"

  /** BPE-ish subword token count: number of pre-tokenizer matches — the
    * standard cheap LLM-token estimate over a 100 TB corpus. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0)))

  /** Count of tokens found in [[Stopwords]] (total occurrences) — native
    * kernel ([[org.apache.spark.sql.graft.CountInSet]]); the
    * `size(filter(...))` lambda form evaluates interpreted per element. */
  def stopwordHits(toks: Column): Column = {
    import org.apache.spark.sql.graft.{Bridge, CountInSet}
    Bridge.column(CountInSet(Bridge.expression(toks), Stopwords))
  }

  /** English character-trigram profile for the n-gram language-ID
    * heuristic — the highest-frequency English trigrams. */
  val EnTrigrams: Seq[String] =
    Seq("the", "and", "ing", "ion", "ent", "her", "for", "tha")

  /** Non-overlapping occurrence count of a literal substring — the
    * replace-and-measure identity, identical left-to-right semantics in
    * Spark and DuckDB (literal `replace`, codegen'd — not a regex count). */
  def substringCount(text: Column, literal: String): Column =
    (length(text) - length(replace(text, lit(literal), lit("")))) / literal.length

  /** Character-n-gram language-ID score: English-trigram hits per trigram
    * position in the lowercased text; NULL when the text is shorter than a
    * trigram. A single codegen'd projection — no tokenization, no shuffle. */
  def enTrigramScore(text: Column): Column = {
    val lowered = lower(text)
    val hits = EnTrigrams.map(substringCount(lowered, _)).reduce(_ + _)
    when(length(text) >= 3, hits.cast("double") / (length(text) - 2))
  }

  /** Flesch reading-ease score from three regex counts — the classic
    * readability quality signal (cheap prose-vs-noise separator next to
    * the Gopher rules). Proxies: words = letter runs, sentences =
    * terminal-punctuation runs, syllables = vowel-group runs — the
    * standard corpus-scale approximations. Patterns are RE2/Java-common
    * so the DuckDB oracle recomputes them byte-for-byte; the formula
    * `206.835 − 1.015·(w/s) − 84.6·(syl/w)` is evaluated on exact integer
    * counts with `greatest(1, ·)` guards (punctuation-free or empty text
    * degrades gracefully instead of dividing by zero), identical IEEE
    * expression tree both engines. A single codegen'd projection. */
  def fleschScore(text: Column): Column = {
    val words = size(regexp_extract_all(text, lit("[A-Za-z]+"), lit(0)))
    val sentences = size(regexp_extract_all(text, lit("[.!?]+"), lit(0)))
    val syllables = size(regexp_extract_all(text, lit("[aeiouyAEIOUY]+"), lit(0)))
    val w = greatest(words, lit(1)).cast("double")
    val s = greatest(sentences, lit(1)).cast("double")
    lit(206.835) - lit(1.015) * (w / s) - lit(84.6) * (syllables.cast("double") / w)
  }

  /** PII patterns for corpus scrubbing — kept to constructs with identical
    * semantics in Java regex and RE2 (no lookaround, no backrefs) so the
    * DuckDB oracle matches byte-for-byte. */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlPattern: String = "https?://[^\\s]+"

  /** Text with emails/URLs replaced by placeholder tags — the redaction pass
    * a training corpus gets before packing. Codegen'd regexp chain. */
  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailPattern, "<EMAIL>"), UrlPattern, "<URL>")

  /** Whitespace-collapsed, lowercased, trimmed canonical form. */
  def normalize(text: Column): Column =
    trim(lower(regexp_replace(text, "\\s+", " ")))

  /** Unicode-canonical normal form (native single-pass kernel): NFC
    * composition, root-locale lowercase, whitespace/control runs collapsed
    * to one space, edge-trimmed — the canonical form under which composed
    * ("é") and decomposed ("e"+U+0301) spellings of the same text dedup
    * together, which [[normalize]]'s byte-level contract cannot give.
    * NFC runs BEFORE lowercasing (fixed, oracle-replayable order); see
    * [[org.apache.spark.sql.graft.NormalizeText]]. */
  def normalizeUnicode(text: Column): Column = {
    import org.apache.spark.sql.graft.{Bridge, NormalizeText}
    Bridge.column(NormalizeText(Bridge.expression(text)))
  }

  /** Deterministic document fingerprint = md5 of the normalized text
    * (the rolling-hash fingerprint of the survey, done with a hash both
    * engines implement identically). */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** Deflate-compressed byte length (native kernel, codegen'd) — the
    * numerator of the compression-ratio repetitiveness signal; see
    * [[org.apache.spark.sql.graft.DeflateLength]] for the determinism
    * contract (byte-stable per JVM, engine-specific across oracles). */
  def deflateLen(text: Column): Column = {
    import org.apache.spark.sql.graft.{Bridge, DeflateLength}
    Bridge.column(DeflateLength(Bridge.expression(text)))
  }

  /** Distinct word n-gram shingles from a token array; fewer than `n`
    * tokens → empty array. (Guarded because `sequence(1, size-n+1)` would
    * generate a *descending* range when size < n.) */
  def shingles(toks: Column, n: Int = 3): Column =
    when(
      size(toks) >= n,
      array_distinct(
        transform(
          sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*))))
      .otherwise(array().cast("array<string>"))

  /** Distinct sorted 64-bit n-gram hashes of a token array — the shingle
    * *set* without materializing shingle strings (native kernel,
    * [[org.apache.spark.sql.graft.NGramHashes]]; the string-building
    * `transform`+`concat_ws`+`array_distinct` composition is interpreted per
    * element and was the profiled bottleneck of the dedup family). */
  def shingleHashes(toks: Column, n: Int = 3): Column = {
    import org.apache.spark.sql.graft.{Bridge, NGramHashes}
    Bridge.column(NGramHashes(Bridge.expression(toks), n))
  }

  /** Intersection size of two sorted distinct `array<bigint>` columns
    * (linear merge; native kernel). */
  def sortedIntersectCount(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.{Bridge, SortedIntersectCount}
    Bridge.column(SortedIntersectCount(Bridge.expression(a), Bridge.expression(b)))
  }

  /** Common elements of two sorted distinct `array<bigint>` columns, sorted
    * (linear merge; native kernel — `array_intersect` hashes per call). */
  def sortedIntersect(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.{Bridge, SortedIntersect}
    Bridge.column(SortedIntersect(Bridge.expression(a), Bridge.expression(b)))
  }

  /** MinHash signature (`array<bigint>`, length `numPerm`) over a hashed
    * shingle set ([[shingleHashes]] output): native kernel
    * ([[org.apache.spark.sql.graft.MinHashSignature]]) — O(1) mixing per
    * shingle, vs. one interpreted lambda pass per permutation for the
    * `array_min(transform(...))` composition it replaces. */
  def minhashSignature(sh: Column, numPerm: Int = 16): Column = {
    import org.apache.spark.sql.graft.{Bridge, MinHashSignature}
    Bridge.column(MinHashSignature(Bridge.expression(sh), numPerm))
  }

  /** LSH band key for a MinHash signature: murmur3 over the band's rows plus
    * the band index (so equal row-slices in different bands never collide). */
  def bandKey(sig: Column, band: Int, rowsPerBand: Int): Column = {
    val rows = (0 until rowsPerBand).map(r => element_at(sig, band * rowsPerBand + r + 1))
    hash((lit(band) +: rows): _*)
  }

  /** Jaccard similarity of two (distinct-element) arrays, as a double;
    * empty union → NULL. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val un = size(array_union(a, b))
    when(un > 0, inter / un)
  }

  /** SimHash over a token array: 64-bit signature where bit i is set iff the
    * sum over tokens of ±1 (sign of bit i of the token's 64-bit hash) is
    * positive. Native single-pass kernel
    * ([[org.apache.spark.sql.graft.SimHash64]]) — the equivalent
    * `aggregate`/`zip_with` fold is interpreted per element and profiled
    * ~40× slower. */
  def simhash(toks: Column): Column = {
    import org.apache.spark.sql.graft.{Bridge, SimHash64}
    Bridge.column(SimHash64(Bridge.expression(toks)))
  }

  /** Hamming distance between two 64-bit SimHash signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Largest multiplicity of any token (the mode's count; 0 on empty) —
    * native kernel ([[org.apache.spark.sql.graft.MaxMultiplicity]]): a
    * row-local statistic that must NOT be computed by explode+groupBy
    * (that shape shuffles the whole exploded corpus at 100 TB). */
  def maxTokenMultiplicity(toks: Column): Column = {
    import org.apache.spark.sql.graft.{Bridge, MaxMultiplicity}
    Bridge.column(MaxMultiplicity(Bridge.expression(toks)))
  }

  /** Gopher-style repetition signal: fraction of word n-gram occurrences
    * that are repeats of an earlier n-gram in the same document
    * (`1 - distinct/total`); NULL when the doc has fewer than `n` tokens.
    * Distinctness via the hashed-shingle kernel — no n-gram strings are
    * materialized. */
  def duplicateNgramFraction(toks: Column, n: Int): Column = {
    val total = size(toks) - (n - 1)
    when(
      total > 0,
      lit(1.0) - size(shingleHashes(toks, n)).cast("double") / total.cast("double"))
  }
}
