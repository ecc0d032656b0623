package graft.llmdata

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines (EXT surface,
  * SURVEY.md §7.1 module 7): language ID, quality scoring, token counting,
  * document fingerprinting. All pure `functions._` expressions — fully
  * codegen'd, embarrassingly parallel, zero shuffles; at 100 TB each is a
  * single map stage over the documents table.
  */
object TextAnalysis {

  /** Substring-occurrence count via length arithmetic:
    * (len(s) - len(replace(s, w, ''))) / len(w). Integer-exact and
    * engine-portable (the same formula runs in the DuckDB oracle with plain
    * `replace`). `word` must be regex-metachar-free (alphanumerics/spaces —
    * all marker/stopword sets qualify). */
  def occurrences(text: Column, word: String): Column =
    ((length(text) - length(regexp_replace(text, word, "")))
      / word.length).cast("int")

  /** Heuristic language scores: count occurrences of per-language marker
    * words (the classic stopword-profile n-gram heuristic, cf. Cavnar &
    * Trenkle 1994). Marker sets are tiny and inlined as literals —
    * broadcast-free. This is the quick expression form; the production
    * path is [[languageIdByProfile]] over a real frequency-profile frame. */
  val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " and ", " of "),
    "de" -> Seq(" der ", " und ", " die "),
    "es" -> Seq(" el ", " los ", " que "),
    "fr" -> Seq(" le ", " les ", " des "),
    "zh" -> Seq(" de ", " shi ", " le "))

  def languageScore(text: Column, lang: String): Column =
    markers(lang).map(w => occurrences(text, w)).reduce(_ + _)

  /** Predicted language = argmax over marker scores, ties broken by
    * alphabetical language order; all-zero scores → 'und' (undetermined). */
  def languageId(text: Column): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    val scored = markers.keys.toSeq.sorted.map(l => (l, languageScore(padded, l)))
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    // first-wins chained CASE: alphabetically first language at max score
    scored.foldLeft(when(best <= 0, "und")) { case (acc, (l, s)) =>
      acc.when(s === best, lit(l))
    }.otherwise("und")
  }

  /** Per-language function-word profiles: terms in DESCENDING corpus
    * frequency rank (the orderings every published frequency list agrees
    * on for these closed-class words — public linguistic knowledge, not
    * derived from any particular corpus), weighted by the Zipf harmonic
    * rule weight(rank) = round(1000 / rank), so a rank-1 hit counts 25×
    * a rank-25 hit — the shape that makes one 'the'/'der'/'que' beat a
    * handful of deep-list collisions. Chinese is romanized (pinyin
    * syllables) because tokenization here is whitespace-based. The DATA
    * is swappable — a production deployment loads a profile TABLE built
    * from a reference corpus; every consumer takes the frame, not this
    * constant. */
  private def zipfRanked(terms: String*): Seq[(String, Int)] =
    terms.zipWithIndex.map { case (t, i) =>
      t -> math.round(1000.0 / (i + 1)).toInt }
  val languageProfiles: Map[String, Seq[(String, Int)]] = Map(
    "en" -> zipfRanked("the", "of", "and", "to", "a", "in", "is", "was",
      "that", "it", "for", "on", "with", "as", "be", "at", "by", "have",
      "are", "this", "not", "but", "from", "or", "his"),
    "de" -> zipfRanked("der", "die", "und", "in", "den", "von", "zu",
      "das", "mit", "sich", "des", "auf", "für", "ist", "im", "dem",
      "nicht", "ein", "eine", "als", "auch", "es", "an", "werden", "aus"),
    "es" -> zipfRanked("de", "la", "que", "el", "en", "y", "a", "los",
      "del", "se", "las", "por", "un", "para", "con", "no", "una", "su",
      "al", "lo", "como", "más", "pero", "sus", "le"),
    "fr" -> zipfRanked("de", "la", "le", "et", "les", "des", "en", "un",
      "du", "une", "que", "est", "pour", "qui", "dans", "a", "par",
      "plus", "pas", "au", "sur", "ne", "se", "ce", "il"),
    "it" -> zipfRanked("di", "e", "il", "la", "che", "in", "a", "per",
      "un", "del", "una", "non", "sono", "le", "della", "i", "con", "si",
      "da", "più", "al", "come", "dei", "nel", "anche"),
    "pt" -> zipfRanked("de", "a", "o", "que", "e", "do", "da", "em",
      "um", "para", "com", "não", "uma", "os", "no", "se", "na", "por",
      "mais", "as", "dos", "como", "mas", "ao", "ele"),
    "nl" -> zipfRanked("de", "van", "het", "een", "en", "in", "is",
      "dat", "op", "te", "zijn", "met", "die", "voor", "niet", "aan",
      "er", "om", "ook", "als", "dan", "maar", "bij", "of", "uit"),
    "zh" -> zipfRanked("de", "shi", "le", "wo", "ni", "ta", "men", "zai",
      "you", "bu", "he", "zhe", "ge", "shang", "ye", "dou", "hen", "dao",
      "shuo", "jiu"))

  /** The built-in profiles as a (lang, term, weight) frame. */
  def profileFrame(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    languageProfiles.toSeq.sortBy(_._1)
      .flatMap { case (l, ts) => ts.map { case (t, w) => (l, t, w) } }
      .toDF("lang", "term", "weight")
  }

  /** Data-driven language ID: tokenize, broadcast-join the (lang, term,
    * weight) profile frame, sum weights per (doc, language), argmax —
    * ties to the alphabetically first language, no profile hit → 'und'.
    *
    * Shape at 100 TB: the profile table is broadcast (thousands of rows
    * even for hundreds of languages); the only shuffle is the per-doc
    * score aggregation with map-side combine. Weights are integers, so
    * scores are exact and the argmax is engine-portable.
    * `profiles` columns: lang, term, weight. Output: one row per input
    * doc — (doc_id, predicted_lang). */
  def languageIdByProfile(df: DataFrame, idCol: String, textCol: String,
                          profiles: DataFrame, keep: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol).as("doc_id"),
      explode(split(trim(lower(col(textCol))), "\\s+")).as("term"))
    val scored = toks.join(broadcast(profiles), Seq("term"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("weight")).cast("long").as("score"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("lang").asc)
    val best = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang").as("__best"))
    // `keep` passes caller columns through the final join so consumers
    // don't re-scan the corpus to reattach them (the q32 pattern)
    df.select(col(idCol).as("doc_id") +: keep.map(col): _*)
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id") +: keep.map(col) :+
        coalesce(col("__best"), lit("und")).as("predicted_lang"): _*)
  }

  /** Code-mixing report over the same broadcast profile frame as
    * [[languageIdByProfile]]: per document, the dominant language plus
    * how much profile evidence points ELSEWHERE — `mixing_ratio` =
    * 1 − best_score/total_score (0 for profile-silent docs). A
    * multilingual or code-switched document scores high; a clean
    * monolingual one near 0. All scores are integer sums; the ratio is
    * one division of two BIGINTs.
    *
    * Shape: identical to languageIdByProfile (broadcast profile join,
    * one doc-keyed agg + one rank window on the doc×lang frame —
    * |langs| rows per doc at most). */
  def codeMixing(df: DataFrame, idCol: String, textCol: String,
                 profiles: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol).as("doc_id"),
      explode(split(trim(lower(col(textCol))), "\\s+")).as("term"))
    val scored = toks.join(broadcast(profiles), Seq("term"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("weight")).cast("long").as("score"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("lang").asc)
    val best = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang").as("__lang"), col("score").as("__best"))
    val totals = scored.groupBy(col("doc_id"))
      .agg(sum(col("score")).cast("long").as("__total"),
        count(lit(1)).cast("long").as("__nl"))
    df.select(col(idCol).as("doc_id"))
      .join(best, Seq("doc_id"), "left")
      .join(totals, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("__lang"), lit("und")).as("dominant_lang"),
        coalesce(col("__nl"), lit(0L)).as("n_langs"),
        coalesce(col("__total"), lit(0L)).as("total_score"),
        coalesce(col("__best"), lit(0L)).as("best_score"),
        when(coalesce(col("__total"), lit(0L)) > 0,
          (col("__total") - col("__best")).cast("double")
            / col("__total").cast("double"))
          .otherwise(lit(0.0)).as("mixing_ratio"))
  }

  /** Whitespace token count (the baseline tokenizer). */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0)
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword count estimate: word-boundary regex split of words
    * plus digits/punctuation as single tokens — a deterministic stand-in
    * for a real BPE vocab (no tokenizer libs in this container). */
  def subwordCountEstimate(text: Column): Column =
    size(split(trim(text), "\\s+")) +
      (length(text) - length(regexp_replace(text, "[0-9.,;:!?]", ""))).cast("int")

  /** Quality-score features (length / punctuation / stopword ratios),
    * rounded to 6 decimals for engine-portable comparison. */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val nChars = length(t)
    val nTokens = tokenCount(t)
    val padded = concat(lit(" "), lower(t), lit(" "))
    val stop = Seq(" the ", " and ", " a ", " of ", " to ", " in ")
      .map(w => occurrences(padded, w)).reduce(_ + _)
    df.withColumn("n_chars_txt", nChars.cast("long"))
      .withColumn("n_tokens", nTokens.cast("long"))
      .withColumn("mean_word_len",
        round(nChars.cast("double") / greatest(nTokens, lit(1)), 6))
      .withColumn("punct_ratio",
        round((nChars - length(regexp_replace(t, "[.,;:!?]", ""))).cast("double")
          / greatest(nChars, lit(1)), 6))
      .withColumn("stopword_ratio",
        round(stop.cast("double") / greatest(nTokens, lit(1)), 6))
  }

  /** Composite quality score in [0,1]: penalizes too-short/too-long docs,
    * rewards stopword presence (the C4-style heuristic family). */
  def qualityScore(df: DataFrame, textCol: String): DataFrame =
    qualityFeatures(df, textCol).withColumn("quality_score",
      round(
        when(col("n_tokens") < 5, 0.0).otherwise(
          least(col("n_tokens").cast("double") / 50.0, lit(1.0)) * 0.5 +
            least(col("stopword_ratio") * 10.0, lit(1.0)) * 0.3 +
            when(col("punct_ratio") > 0, 0.2).otherwise(0.0)), 6))

  /** Flesch reading-ease features — the readability member of the
    * quality-heuristic family (a curation lens orthogonal to length/
    * stopword ratios: academic scraped text scores low, chat logs
    * high): exact integer counts of words (whitespace runs), sentences
    * (`[.!?]+` runs, floored at 1 — headline-like docs count as one
    * sentence), and syllables (the vowel-GROUP heuristic: maximal
    * `[aeiouy]+` runs in the lowercased text — groups never span
    * whitespace, so the doc-level count equals the per-word sum), then
    * `flesch = 206.835 − 1.015·(w/s) − 84.6·(syl/w)` as a fixed
    * literal-constant chain over two exact divisions (clamped nowhere
    * — out-of-[0,100] values are the standard behavior for extreme
    * text and carry signal). Empty/whitespace docs emit NULL score.
    *
    * Output: idCol + (n_words, n_sentences, n_syllables, flesch). */
  def readability(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lowered = lower(trim(col(textCol)))
    val nWords = when(length(lowered) === 0, 0L)
      .otherwise(size(split(lowered, "\\s+")).cast("long"))
    val nSent = greatest(
      size(expr(s"regexp_extract_all($textCol, '[.!?]+', 0)")).cast("long"),
      lit(1L))
    val nSyl = size(expr(
      s"regexp_extract_all(lower($textCol), '[aeiouy]+', 0)")).cast("long")
    df.select(col(idCol), nWords.as("n_words"), nSent.as("n_sentences"),
      nSyl.as("n_syllables"))
      .withColumn("flesch",
        when(col("n_words") > 0,
          lit(206.835) -
            lit(1.015) * (col("n_words").cast("double") /
              col("n_sentences").cast("double")) -
            lit(84.6) * (col("n_syllables").cast("double") /
              col("n_words").cast("double"))))
  }

  /** Source-level curation decision table — the rollup a curation
    * operator reads to decide which SOURCES to keep, sample, or drop
    * (doc-level gates like q107's pipeline act after this): per source,
    * exact doc/duplicate/low-quality counts, decimal-exact mean
    * quality, and a threshold decision. `n_redundant` counts non-keeper
    * copies under the corpus-wide exact fingerprint (min-id keeper), so
    * a source that mirrors another source's content is charged for it
    * even when the copies are unique WITHIN the source.
    *
    * decision: 'drop' when dup_frac > dropDupFrac OR avg_quality <
    * dropAvgQuality; else 'review' when dup_frac > reviewDupFrac OR
    * low_quality_frac > reviewLowFrac; else 'keep'. All compared values
    * are exact BIGINT ratios / decimal-path means, so the CASE is
    * engine-deterministic.
    *
    * Shape at 100 TB: one fingerprint groupBy (the q30 shuffle), one
    * quality map stage, one source-keyed rollup — sources are few, so
    * the report is metadata-scale. */
  def sourceCurationReport(df: DataFrame, idCol: String, sourceCol: String,
                           textCol: String,
                           lowQualityBelow: Double = 0.35,
                           dropDupFrac: Double = 0.5,
                           dropAvgQuality: Double = 0.3,
                           reviewDupFrac: Double = 0.2,
                           reviewLowFrac: Double = 0.5): DataFrame = {
    val fp = df.select(col(idCol).as("__id"), col(sourceCol).as("source"),
      fingerprint(col(textCol)).as("__fp"))
    val keepers = fp.groupBy(col("__fp")).agg(min(col("__id")).as("__keeper"))
    val flagged = fp.join(keepers, Seq("__fp"))
      .select(col("__id"), col("source"),
        (col("__id") =!= col("__keeper")).cast("int").as("__redundant"))
    val quality = qualityScore(df.select(col(idCol), col(textCol)), textCol)
      .select(col(idCol).as("__id"), col("quality_score"))
    val agg = flagged.join(quality, Seq("__id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__redundant")).cast("long").as("n_redundant"),
        graft.functions.ScalarFns.exactAvg(col("quality_score")).as("avg_quality"),
        sum(when(col("quality_score") < lowQualityBelow, 1).otherwise(0))
          .cast("long").as("n_low_quality"))
    agg
      .withColumn("dup_frac",
        col("n_redundant").cast("double") / col("n_docs").cast("double"))
      .withColumn("low_quality_frac",
        col("n_low_quality").cast("double") / col("n_docs").cast("double"))
      .withColumn("decision",
        when(col("dup_frac") > dropDupFrac
          || col("avg_quality") < dropAvgQuality, "drop")
          .when(col("dup_frac") > reviewDupFrac
            || col("low_quality_frac") > reviewLowFrac, "review")
          .otherwise("keep"))
  }

  /** Document fingerprint: md5 of the normalized text (lowercase, strip
    * non-alphanumerics, collapse whitespace) — the canonical-form exact
    * fingerprint used by exact dedup. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " ")))

  /** PII-shaped span redaction with typed tags: emails → [EMAIL], long
    * digit runs (phone/account numbers) → [NUMBER]. Pure regexp_replace
    * chain — one map stage; patterns are RE2-safe so the DuckDB oracle
    * runs them verbatim (with its 'g' flag). A production scrubber swaps
    * in larger pattern sets (same shape, same cost model). */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text,
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
      "\\b\\d{7,}\\b", "[NUMBER]")

  /** Sliding token-window chunking (context-length packing prep): split
    * each document into chunks of `chunkTokens` whitespace tokens with
    * stride `stride` (overlap = chunkTokens − stride); the final chunk
    * may be short, and a doc at most `chunkTokens` long yields exactly
    * one chunk. One tokenize + generator explode per doc — map-only,
    * no shuffle. Integer arithmetic only, so chunk boundaries are
    * bit-identical in any engine. */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
                    chunkTokens: Int, stride: Int): DataFrame = {
    require(stride > 0 && chunkTokens > 0)
    // overlap semantics per the docstring: a gap stride (stride >
    // chunkTokens) would let ceil((n - chunkTokens)/stride) place the
    // last chunk start past the token array, emitting a phantom empty
    // chunk (e.g. n=20, chunk=5, stride=10 → chunk_index 2 at token 21)
    require(stride <= chunkTokens,
      s"stride ($stride) must not exceed chunkTokens ($chunkTokens): " +
        "chunks are overlapping windows, not gapped samples")
    val toks = split(trim(col(textCol)), "\\s+")
    val n = size(col("__toks"))
    // K = ceil((n - chunkTokens) / stride) extra chunks past the first,
    // via the floor identity ceil(a/b) = floor((a+b-1)/b) (holds for any
    // sign of a, positive b — so both engines agree on empty-tail docs)
    val extra = greatest(lit(0),
      floor((n - chunkTokens + stride - 1) / lit(stride.toDouble)).cast("int"))
    df
      // trim-length guard, NOT size(toks) > 0: split("") returns [""], so
      // an empty doc would otherwise emit one phantom 1-token chunk
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("doc_id"), toks.as("__toks"))
      .select(col("doc_id"), col("__toks"),
        explode(sequence(lit(0), extra.cast("int"))).as("chunk_index"))
      .select(col("doc_id"), col("chunk_index"),
        size(slice(col("__toks"), col("chunk_index") * stride + 1, lit(chunkTokens)))
          .cast("long").as("n_chunk_tokens"),
        concat_ws(" ", slice(col("__toks"), col("chunk_index") * stride + 1, lit(chunkTokens)))
          .as("chunk_text"))
  }

  /** Greedy contiguous sequence packing: walk documents in id order
    * within a shard, accumulate token counts, and assign each document
    * the bin its PREFIX sum lands in — bin_id = (cumsum − n_tokens) ÷
    * budget. Documents longer than the budget get their own bin(s).
    * The shard key bounds the window state (one running sum per shard) —
    * at 100 TB packing is per-shard-parallel, and the cumulative sum is
    * integer-exact at any partitioning. */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    budgetTokens: Int, nShards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nTok = tokenCount(col(textCol)).cast("long")
    val shard = pmod(col(idCol), lit(nShards)).cast("int")
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol).as("doc_id"), shard.as("shard"), nTok.as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("bin_id",
        floor((col("cum_tokens") - col("n_tokens")) / lit(budgetTokens.toDouble)).cast("long"))
      .select("doc_id", "shard", "n_tokens", "cum_tokens", "bin_id")
  }

  /** Materialize packed training sequences: [[packSequences]] assigns
    * each document a (shard, bin); this emits one row PER BIN with the
    * documents concatenated in id order — the actual fixed-budget
    * training row a data loader streams. Returns (shard, bin_id, n_docs,
    * bin_tokens, packed_text); `bin_tokens` can exceed the budget only
    * when a single document does (packSequences' own contract).
    *
    * Shape at 100 TB: one equi-join of the bin assignment back to the
    * text (keyed on the id), then one hash aggregate keyed (shard, bin);
    * in-bin ordering is restored with sort_array over (id, text) structs
    * — per-bin arrays are budget-bounded (~thousands of tokens), so the
    * aggregate state stays small no matter the corpus size. */
  def materializePacked(df: DataFrame, idCol: String, textCol: String,
                        budgetTokens: Int, nShards: Int): DataFrame = {
    val packed = packSequences(df, idCol, textCol, budgetTokens, nShards)
    packed.join(df.select(col(idCol).as("doc_id"), col(textCol).as("__text")),
        Seq("doc_id"))
      .groupBy(col("shard"), col("bin_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("bin_tokens"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("doc_id"), col("__text")))),
          x => x.getField("__text"))).as("packed_text"))
  }

  /** Training-mix report: per-stratum document count, token count, and
    * token share of the corpus — the proportions table a data-mixing
    * step consumes. Two aggregations (per-stratum, then a broadcast
    * one-row total joined back); shares are bigint-exact counts divided
    * in double space, so the report is bit-identical on any engine. */
  def mixReport(df: DataFrame, stratumCol: String, textCol: String): DataFrame = {
    val perStratum = df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenCount(col(textCol)).cast("long")).as("n_tokens"))
    val total = perStratum.agg(sum(col("n_tokens")).as("total_tokens"))
    perStratum.crossJoin(broadcast(total))
      .withColumn("token_share",
        col("n_tokens").cast("double") / col("total_tokens").cast("double"))
      .select(col(stratumCol), col("n_docs"), col("n_tokens"), col("token_share"))
  }

  /** Gopher-style repetition features (Rae et al. 2021 §A1.1 family):
    * per-document duplicate-token fraction (1 − distinct/total) and
    * top-bigram fraction (occurrences of the most frequent word 2-gram
    * over all 2-grams) — the standard signals for dropping boilerplate
    * and degenerate repetition from a training corpus.
    *
    * Shape at 100 TB: one token explode + per-doc aggregate, one bigram
    * stream (the [[DedupOps.shingleStream]] window) + two aggregates —
    * all keyed on doc_id with map-side combine. Fractions are integer
    * counts divided in double space: bit-identical on any engine.
    * Docs with no tokens (or no bigrams) report 0.0 fractions. */
  def repetitionFeatures(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      explode(split(trim(lower(col(textCol))), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
    val tokStats = toks.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_tokens"),
      countDistinct(col("term")).as("n_distinct"))
    val biCounts = DedupOps.shingleStream(df, idCol, textCol, 2)
      .groupBy(col("doc_id"), col("s")).agg(count(lit(1)).as("c"))
    val biStats = biCounts.groupBy(col("doc_id")).agg(
      max(col("c")).as("top_c"), sum(col("c")).cast("long").as("n_bigrams"))
    df.select(col(idCol).as("doc_id"))
      .join(tokStats, Seq("doc_id"), "left")
      .join(biStats, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        when(coalesce(col("n_tokens"), lit(0L)) === 0, 0.0)
          .otherwise((col("n_tokens") - col("n_distinct")).cast("double")
            / col("n_tokens")).as("dup_token_fraction"),
        when(coalesce(col("n_bigrams"), lit(0L)) === 0, 0.0)
          .otherwise(col("top_c").cast("double") / col("n_bigrams"))
          .as("top_bigram_fraction"))
  }

  /** Drop repetitive documents: keep rows whose repetition features stay
    * under both thresholds (defaults in the Gopher-rule neighborhood;
    * callers tune per corpus). Broadcast-anti-join shape: the dropped
    * set is the small slice, the corpus scan passes through. */
  def repetitionFilter(df: DataFrame, idCol: String, textCol: String,
                       maxDupTokenFraction: Double = 0.6,
                       maxTopBigramFraction: Double = 0.18): DataFrame = {
    val dropped = repetitionFeatures(df, idCol, textCol)
      .filter(col("dup_token_fraction") > maxDupTokenFraction ||
        col("top_bigram_fraction") > maxTopBigramFraction)
      .select(col("doc_id").as(idCol))
    df.join(graft.operators.Broadcasts.maybeBroadcast(dropped), Seq(idCol), "left_anti")
  }

  /** Boilerplate n-gram scrubbing: remove every token span covered by a
    * word n-gram that occurs in at least `minDf` DISTINCT documents — the
    * cross-document repeated-span filter (headers, footers, license
    * blocks, navigation chrome) of the C4/RefinedWeb curation family.
    * Complements [[repetitionFeatures]] (within-doc repetition) and
    * near-dup dedup (whole-doc similarity): boilerplate contaminates
    * otherwise-unique documents, so the unit of removal is the SPAN.
    *
    * Semantics: token at position p is removed iff ANY frequent n-gram
    * starts in [p−n+1, p] (i.e. the token lies inside at least one
    * frequent-span occurrence). Text is normalized (trim/lower/whitespace
    * tokenize) the same way as every dedup operator.
    *
    * Shape at 100 TB: two passes over the token stream (the same
    * inherent two-pass shape as TF-IDF — the document-frequency table is
    * a global aggregate that must join back): pass 1 builds n-gram
    * starts (posexplode + lead window, the [[DedupOps.shingleStream]]
    * stage) and their doc-frequencies; the frequent set and its covered
    * (doc, pos) starts are the SMALL boilerplate slice, equi-joined back
    * onto the token stream; coverage is a per-doc running window sum
    * (n−1 preceding rows), and reassembly one groupBy(doc) with an
    * order-restoring sort_array — all key-shuffles on doc_id or the
    * n-gram, never all-pairs, no driver state.
    *
    * Returns one row per input doc: (doc_id, clean_text, n_tokens,
    * n_removed) — clean_text in normalized token form. */
  def scrubBoilerplate(df: DataFrame, idCol: String, textCol: String,
                       n: Int = 3, minDf: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n >= 1, s"n-gram size must be positive, got $n")
    require(minDf >= 1, s"minDf must be positive, got $minDf")
    val base = df.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("doc_id"), posexplode(DedupOps.tokens(col(textCol))))
      .withColumnRenamed("col", "tok")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val starts = base
      .select(col("doc_id"), col("pos"),
        concat_ws(" ", col("tok") +:
          (1 until n).map(j => lead(col("tok"), j).over(w)): _*).as("s"),
        lead(col("tok"), n - 1).over(w).isNotNull.as("complete"))
      .filter(col("complete")).drop("complete")
    val frequent = starts.groupBy(col("s"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= minDf).select("s")
    // covered starts = the boilerplate slice (small by construction)
    val cov = starts.join(frequent, Seq("s")).select(col("doc_id"), col("pos"))
      .withColumn("__hit", lit(1))
    val wCov = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(-(n - 1), Window.currentRow)
    val marked = base.join(cov, Seq("doc_id", "pos"), "left")
      .withColumn("covered",
        sum(coalesce(col("__hit"), lit(0))).over(wCov) > 0)
    val agg = marked.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_tokens"),
      sum(col("covered").cast("long")).as("n_removed"),
      // collect_list skips nulls: only kept tokens enter; sort_array on
      // (pos, tok) structs restores document order deterministically
      concat_ws(" ", transform(
        array_sort(collect_list(when(!col("covered"),
          struct(col("pos"), col("tok"))))),
        x => x.getField("tok"))).as("clean_text"))
    df.select(col(idCol).as("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"))
  }

  /** Corpus-level vocabulary heavy hitters: the `k` most frequent terms
    * with their occurrence and document counts — the exact form of the
    * vocab-stats pass a tokenizer-training pipeline runs. One explode +
    * one hash aggregate; the top-k is a TakeOrdered (per-partition top-k
    * then a k-row driver merge), so no global sort materializes. */
  /** Pairwise vocabulary Jaccard between corpus SLICES (languages,
    * sources, snapshots): how much word-level vocabulary two slices
    * share — the corpus-composition diagnostic behind "are these two
    * sources redundant?" and "did the new crawl change the language
    * mix?". Exact set arithmetic, no sketches:
    * `jaccard = |V_a ∩ V_b| / |V_a ∪ V_b|` with the union derived as
    * `n_a + n_b − n_inter` (all BIGINTs; one final division).
    *
    * Shape at 100 TB: the (slice, term) DISTINCT pairs come from one
    * hash aggregate over the token stream (vocabulary-scale, not
    * token-scale, after the distinct); the pair intersection is a
    * self-equi-join ON THE TERM (vocab-scale shuffle) — never a
    * document cross join — and the output is slice-pair-scale. Same
    * whitespace/lowercase tokenization as [[vocabTopK]]. Output per
    * unordered pair (g_a < g_b): (g_a, g_b, n_a, n_b, n_inter,
    * n_union, jaccard). */
  def vocabJaccard(df: DataFrame, groupCol: String,
                   textCol: String): DataFrame = {
    val pairs = df.filter(col(groupCol).isNotNull)
      .select(col(groupCol).as("g"),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
      .distinct()
    val sizes = pairs.groupBy(col("g")).agg(count(lit(1)).cast("long")
      .as("n"))
    val inter = pairs.select(col("g").as("g_a"), col("term"))
      .join(pairs.select(col("g").as("g_b"), col("term")), Seq("term"))
      .filter(col("g_a") < col("g_b"))
      .groupBy(col("g_a"), col("g_b"))
      .agg(count(lit(1)).cast("long").as("n_inter"))
    inter
      .join(graft.operators.Broadcasts.maybeBroadcast(
        sizes.select(col("g").as("g_a"), col("n").as("n_a"))), Seq("g_a"))
      .join(graft.operators.Broadcasts.maybeBroadcast(
        sizes.select(col("g").as("g_b"), col("n").as("n_b"))), Seq("g_b"))
      .withColumn("n_union", col("n_a") + col("n_b") - col("n_inter"))
      .withColumn("jaccard",
        col("n_inter").cast("double") / col("n_union").cast("double"))
      .select(col("g_a"), col("g_b"), col("n_a"), col("n_b"),
        col("n_inter"), col("n_union"), col("jaccard"))
  }

  def vocabTopK(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    df.select(col(idCol).as("doc_id"),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("term"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("term").asc)
      .limit(k)

  /** Vocabulary growth curve (the Heaps-law readout): distinct-term
    * count and cumulative token count after each document-id
    * checkpoint — the "is more data still buying new vocabulary?"
    * diagonal a tokenizer-training / corpus-acquisition pipeline
    * plots before paying for the next crawl tranche. Exact and
    * order-free: each term's FIRST document (min doc id) is computed
    * once, then every checkpoint counts terms whose first doc is ≤ it
    * — no sequential scan, one term aggregate + one checkpoints-scale
    * lattice join (checkpoints are a handful of literals). Same
    * whitespace/lowercase tokenization as [[vocabTopK]].
    *
    * Output per checkpoint: (checkpoint, n_docs, n_tokens,
    * vocab_size), ascending. */
  def vocabGrowth(df: DataFrame, idCol: String, textCol: String,
                  checkpoints: Seq[Long]): DataFrame = {
    require(checkpoints.nonEmpty, "checkpoints required")
    val spark = df.sparkSession
    import scala.jdk.CollectionConverters._
    val lattice = spark.createDataFrame(
      checkpoints.sorted.map(c => org.apache.spark.sql.Row(c)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("checkpoint",
          org.apache.spark.sql.types.LongType, nullable = false))))
    val toks = df.select(col(idCol).cast("long").as("__id"),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
      .localCheckpoint(true) // consumed by first-doc AND per-doc counts
    val firstDoc = toks.groupBy(col("term"))
      .agg(min(col("__id")).as("__first"))
    val vocabAt = firstDoc.crossJoin(broadcast(lattice))
      .groupBy(col("checkpoint"))
      .agg(sum(when(col("__first") <= col("checkpoint"), 1L).otherwise(0L))
        .cast("long").as("vocab_size"))
    val perDoc = toks.groupBy(col("__id"))
      .agg(count(lit(1)).as("__nt"))
    val sizeAt = perDoc.crossJoin(broadcast(lattice))
      .groupBy(col("checkpoint"))
      .agg(sum(when(col("__id") <= col("checkpoint"), 1L).otherwise(0L))
        .cast("long").as("n_docs"),
        sum(when(col("__id") <= col("checkpoint"), col("__nt"))
          .otherwise(0L)).cast("long").as("n_tokens"))
    sizeAt.join(vocabAt, Seq("checkpoint")).orderBy(col("checkpoint"))
  }

  /** Vocabulary drift between two corpus slices (last month's crawl vs
    * this month's): per term, occurrence counts and frequency-per-
    * million on each side, the fpm ratio, and a status — `new` / `gone`
    * / `rising` (ratio >= risingAt) / `falling` (<= 1/risingAt) /
    * `stable`. The monitoring signal a training-data pipeline reads to
    * catch a source going off-topic, a scraper breaking, or template
    * spam flooding in — BEFORE the tokens reach a training mix.
    *
    * Determinism: counts and totals are exact BIGINTs; each fpm is one
    * IEEE multiply+divide and the ratio one more divide — identical
    * expression trees on both engines, so values and the threshold
    * comparisons are bit-stable. `minCount` bounds the output to terms
    * with at least that many combined occurrences (drop the long tail
    * of hapaxes). Shape: one explode + term-keyed aggregate per side,
    * a full-outer term join, scalar totals broadcast (one-row frames).
    */
  def vocabDrift(oldDf: DataFrame, newDf: DataFrame, idCol: String,
                 textCol: String, minCount: Int = 5,
                 risingAt: Double = 2.0): DataFrame = {
    require(risingAt > 1.0, s"risingAt must exceed 1, got $risingAt")
    def counts(df: DataFrame, side: String) =
      df.select(explode(split(trim(lower(col(textCol))), "\\s+")).as("term"))
        .filter(length(col("term")) > 0)
        .groupBy(col("term")).agg(count(lit(1)).as(s"n_$side"))
    def total(df: DataFrame, side: String) =
      df.select(explode(split(trim(lower(col(textCol))), "\\s+")).as("t"))
        .filter(length(col("t")) > 0)
        .agg(count(lit(1)).as(s"total_$side"))
    val joined = counts(oldDf, "old").join(counts(newDf, "new"), Seq("term"), "full_outer")
      .crossJoin(broadcast(total(oldDf, "old")))
      .crossJoin(broadcast(total(newDf, "new")))
      .filter(coalesce(col("n_old"), lit(0L)) + coalesce(col("n_new"), lit(0L))
        >= minCount)
    val fpmOld = col("n_old").cast("double") * 1000000.0 / col("total_old").cast("double")
    val fpmNew = col("n_new").cast("double") * 1000000.0 / col("total_new").cast("double")
    joined
      .withColumn("fpm_old", fpmOld)  // NULL count -> NULL fpm
      .withColumn("fpm_new", fpmNew)
      .withColumn("status",
        when(col("n_old").isNull, "new")
          .when(col("n_new").isNull, "gone")
          .when(col("fpm_new") >= col("fpm_old") * risingAt, "rising")
          .when(col("fpm_new") * risingAt <= col("fpm_old"), "falling")
          .otherwise("stable"))
      .select(col("term"),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        col("fpm_old"), col("fpm_new"), col("status"))
  }

  /** Corpus bigram continuation table: for every head word (appearing as
    * a bigram head at least `minHeadCount` times), the `k` most frequent
    * continuations with their EXACT conditional probabilities
    * p(w₂|w₁) = c(w₁w₂)/Σ_w c(w₁w) — the count table an n-gram language
    * model (or contamination heuristic, or generation-loop detector)
    * trains from. Probabilities are integer counts divided in double
    * space: bit-identical on any engine (no log anywhere, per the
    * determinism contract).
    *
    * Shape at 100 TB: the bigram stream is the [[DedupOps.shingleStream]]
    * window (multiset — every occurrence counts), then two hash
    * aggregates with map-side combine (bigram counts, head totals) and a
    * per-head top-k window over the COUNT table (vocabulary-scale, not
    * corpus-scale — the expensive stream never reaches the window). */
  def bigramTopContinuations(df: DataFrame, idCol: String, textCol: String,
                             k: Int, minHeadCount: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = DedupOps.shingleStream(df, idCol, textCol, 2)
      .groupBy(col("s")).agg(count(lit(1)).as("n_bigram"))
      .withColumn("head", split(col("s"), " ").getItem(0))
      .withColumn("cont", split(col("s"), " ").getItem(1))
    val heads = counts.groupBy(col("head"))
      .agg(sum(col("n_bigram")).as("n_head"))
      .filter(col("n_head") >= minHeadCount)
    val w = Window.partitionBy(col("head"))
      .orderBy(col("n_bigram").desc, col("cont").asc)
    counts.join(heads, Seq("head"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("head"), col("cont"), col("n_bigram"), col("n_head"),
        (col("n_bigram").cast("double") / col("n_head")).as("p"), col("rank"))
  }

  /** Top-p (nucleus) pruning of the bigram continuation table: per head
    * word, keep the SMALLEST count-ranked prefix of continuations whose
    * cumulative probability reaches `p` — the standard way a sampling
    * vocabulary or an n-gram backoff table is truncated without a fixed
    * k. A row survives iff the cumulative count BEFORE it is still under
    * p·total (so the row that crosses the threshold is kept, and
    * nothing after it).
    *
    * Determinism: ranks and cumulative sums are integer counts; the one
    * double comparison (cum_prev < p·n_head) multiplies an exact BIGINT
    * by the same p literal in both engines — IEEE multiply is exactly
    * specified, so the cut is bit-identical even when p itself (e.g.
    * 0.8) has no finite binary expansion.
    *
    * Same scale shape as [[bigramTopContinuations]]: corpus-scale work
    * ends at the count aggregate; windows run over the vocabulary-scale
    * count table. */
  def bigramTopP(df: DataFrame, idCol: String, textCol: String,
                 p: Double, minHeadCount: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(p > 0 && p <= 1, s"p must be in (0,1], got $p")
    val counts = DedupOps.shingleStream(df, idCol, textCol, 2)
      .groupBy(col("s")).agg(count(lit(1)).as("n_bigram"))
      .withColumn("head", split(col("s"), " ").getItem(0))
      .withColumn("cont", split(col("s"), " ").getItem(1))
    val heads = counts.groupBy(col("head"))
      .agg(sum(col("n_bigram")).cast("long").as("n_head"))
      .filter(col("n_head") >= minHeadCount)
    val w = Window.partitionBy(col("head"))
      .orderBy(col("n_bigram").desc, col("cont").asc)
    counts.join(heads, Seq("head"))
      .withColumn("rank", row_number().over(w))
      .withColumn("cum_prev",
        coalesce(sum(col("n_bigram")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).cast("long"))
      .filter(col("cum_prev").cast("double") < lit(p) * col("n_head").cast("double"))
      .select(col("head"), col("cont"), col("n_bigram"), col("n_head"),
        (col("n_bigram").cast("double") / col("n_head")).as("p_cont"),
        ((col("cum_prev") + col("n_bigram")).cast("double") / col("n_head"))
          .as("cum_p"),
        col("rank"))
  }

  /** Corpus collocation mining by association lift: every bigram with at
    * least `minPairCount` occurrences, scored by
    * lift = (N · c(ab)) / (c(a) · c(b)) — the PMI family's ratio with the
    * log dropped (log is monotone, so lift ranks identically to PMI while
    * staying libm-free per the determinism contract; cf. Church & Hanks
    * 1990, "Word Association Norms, Mutual Information, and Lexicography").
    * lift > 1 means the pair co-occurs more than independence predicts —
    * the phrase-detection / tokenizer-merge-candidate signal.
    *
    * Determinism: N, c(a), c(b), c(ab) are exact BIGINTs; lift is one
    * double multiply per side and one divide — each IEEE-exact on
    * exactly-representable ints, so bits (and hence the rank order) match
    * any engine. Doubles (not BIGINT products) so a 100 TB corpus's
    * N · c(ab) cannot overflow.
    *
    * Shape at 100 TB: corpus-scale work ends at two hash aggregates (the
    * bigram count table and the unigram count table, both map-side
    * combinable); the thresholded pair table is vocabulary-scale, joins
    * the unigram counts via broadcast-able equi-joins, and the global
    * rank window runs over that metadata-scale frame only (same
    * deliberate single-partition trade as rrfFuse's top-k lists). */
  def collocations(df: DataFrame, idCol: String, textCol: String,
                   minPairCount: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(minPairCount >= 1, s"minPairCount must be >= 1, got $minPairCount")
    val toks = df.select(explode(DedupOps.tokens(col(textCol))).as("tok"))
    val uni = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val tot = toks.agg(count(lit(1)).as("n_tok"))
    // the bigram stream carries (term_a, term_b) as SEPARATE columns
    // rather than re-splitting shingleStream's joined string: a split-[1]
    // join key invites Catalyst to push `isnotnull(split(s)[1])` below
    // the aggregate, where ANSI mode throws on the incomplete last-token
    // rows the window filter would have dropped (observed, sf0.01)
    val w0 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val pairs = df
      .select(col(idCol).as("doc_id"), posexplode(DedupOps.tokens(col(textCol))))
      .withColumnRenamed("col", "tok")
      .select(col("tok").as("term_a"), lead(col("tok"), 1).over(w0).as("term_b"))
      .filter(col("term_b").isNotNull)
      .groupBy(col("term_a"), col("term_b"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minPairCount)
    val w = Window.orderBy(col("lift").desc, col("term_a").asc,
      col("term_b").asc)
    pairs
      .join(graft.operators.Broadcasts.maybeBroadcast(
        uni.select(col("tok").as("term_a"), col("c").as("c_a"))), Seq("term_a"))
      .join(graft.operators.Broadcasts.maybeBroadcast(
        uni.select(col("tok").as("term_b"), col("c").as("c_b"))), Seq("term_b"))
      .crossJoin(broadcast(tot))
      .withColumn("lift",
        (col("n_tok").cast("double") * col("n_pair").cast("double"))
          / (col("c_a").cast("double") * col("c_b").cast("double")))
      .select(col("term_a"), col("term_b"), col("n_pair"), col("c_a"),
        col("c_b"), col("lift"))
      .withColumn("rank", row_number().over(w).cast("int"))
  }

  /** Gopher-style quality rule gate (Rae et al. 2021, "Scaling Language
    * Models: Methods, Analysis & Insights from Training Gopher", §A1.1):
    * per-document boolean flags for the classic web-curation rules —
    * word count bounds, mean word length in [3,10], symbol-to-word ratio,
    * bullet/ellipsis line fractions, alphabetic-word fraction, and
    * minimum distinct stopwords — plus the conjunction `pass`.
    *
    * Every threshold is an integer CROSS-MULTIPLICATION
    * (e.g. mean-word-length ∈ [3,10] is `3·n ≤ chars ∧ chars ≤ 10·n`,
    * symbol ratio ≤ 0.1 is `10·symbols ≤ n`) — no division anywhere, so
    * the gate is exact on any engine and immune to float-rounding drift
    * at the decision boundary.
    *
    * Shape at 100 TB: map-only — per-row string/array expressions with
    * no explode, no aggregate, no shuffle; composes with a parquet scan
    * into one WholeStage pass (the higher-order `filter` calls are
    * native expressions over the per-row line/token arrays). */
  def gopherRules(df: DataFrame, idCol: String, textCol: String,
                  minTokens: Long = 50, maxTokens: Long = 100000,
                  stopwords: Seq[String] =
                    Seq("the", "be", "to", "of", "and", "that", "have", "with"),
                  minStopwords: Int = 2): DataFrame = {
    require(stopwords.nonEmpty, "stopwords must be non-empty")
    val t = col(textCol)
    val nTokens = tokenCount(t).cast("long")
    val lines = split(t, "\n")
    val nLines = size(lines).cast("long")
    val nWordChars = length(regexp_replace(t, "\\s", "")).cast("long")
    val nSymbols = ((length(t) - length(translate(t, "#", ""))) +
      (length(t) - length(replace(t, lit("..."), lit("")))) / 3).cast("long")
    val nBullet = size(filter(lines, l =>
      startswith(l, lit("- ")) || startswith(l, lit("* ")) ||
        startswith(l, lit("• ")))).cast("long")
    val nEllipsisLines = size(filter(lines, l =>
      endswith(rtrim(l), lit("...")))).cast("long")
    val toks = DedupOps.tokens(t)
    val nAlphaWords = size(filter(toks, w => w.rlike("[a-z]"))).cast("long")
    val padded = concat(lit(" "),
      regexp_replace(lower(t), "\\s+", " "), lit(" "))
    val nStopwords = stopwords
      .map(w => when(instr(padded, s" $w ") > 0, 1).otherwise(0))
      .reduce(_ + _).cast("long")
    df.select(col(idCol).as("doc_id"),
      nTokens.as("n_tokens"),
      nLines.as("n_lines"),
      (nTokens >= minTokens && nTokens <= maxTokens).as("word_count_ok"),
      (lit(3L) * nTokens <= nWordChars &&
        nWordChars <= lit(10L) * nTokens).as("mean_word_len_ok"),
      (lit(10L) * nSymbols <= nTokens).as("symbol_ok"),
      (lit(10L) * nBullet <= lit(9L) * nLines).as("bullet_ok"),
      (lit(10L) * nEllipsisLines <= lit(3L) * nLines).as("ellipsis_ok"),
      (lit(10L) * nAlphaWords >= lit(8L) * nTokens).as("alpha_ok"),
      (nStopwords >= minStopwords.toLong).as("stopword_ok"))
      .withColumn("pass",
        col("word_count_ok") && col("mean_word_len_ok") && col("symbol_ok") &&
          col("bullet_ok") && col("ellipsis_ok") && col("alpha_ok") &&
          col("stopword_ok"))
  }

  /** Per-document lexical concentration: Simpson's index λ = Σ pᵢ² over
    * the document's term distribution, and its reciprocal 1/λ — the
    * "effective vocabulary size" (how many equally-likely terms would
    * produce this concentration). Gibberish and template spam concentrate
    * mass on few terms (λ → 1, eff_vocab → 1); natural prose spreads it
    * (eff_vocab tracks true vocabulary). Complements
    * [[repetitionFeatures]]: dup_token_fraction only sees distinct-vs-total,
    * λ weighs the whole count distribution, so a doc repeating one word
    * 50× among 50 singletons scores far worse than one repeating 50 words
    * 2× — same dup fraction, very different concentration.
    *
    * Determinism: the three moments are exact BIGINTs (hash-stable);
    * λ = sum_sq / (n·n) and eff_vocab = (n·n) / sum_sq are each one IEEE
    * divide over exactly-representable ints (docs stay far below 2²⁶
    * tokens, so n·n is an exact double product) with the identical
    * expression tree mirrored in the oracle — bit-stable cross-engine.
    *
    * Shape at 100 TB: two hash aggregates keyed on doc_id (map-side
    * combinable; the (doc, term) aggregate is the same shuffle any tf
    * computation pays) and a final left join back to the id column —
    * no corpus-wide state, no windows. */
  def lexicalConcentration(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val perTerm = df
      .select(col(idCol).as("doc_id"),
        explode(DedupOps.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("c"))
    val stats = perTerm.groupBy(col("doc_id")).agg(
      sum(col("c")).cast("long").as("n_tokens"),
      count(lit(1)).as("n_distinct"),
      sum(col("c") * col("c")).cast("long").as("sum_sq"))
    val n = col("n_tokens").cast("double")
    df.select(col(idCol).as("doc_id"))
      .join(stats, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        coalesce(col("sum_sq"), lit(0L)).as("sum_sq"),
        when(col("n_tokens").isNull, 0.0)
          .otherwise(col("sum_sq").cast("double") / (n * n)).as("simpson"),
        when(col("n_tokens").isNull, 0.0)
          .otherwise((n * n) / col("sum_sq").cast("double")).as("eff_vocab"))
  }

  /** Per-document corpus-familiarity score from the bigram count table —
    * the exact-arithmetic stand-in for n-gram-LM perplexity filtering
    * (CCNet/KenLM family): documents whose bigrams are rare in the corpus
    * are novel (or gibberish); documents dominated by high-count bigrams
    * are familiar (or boilerplate). A bigram is "known" when its corpus
    * count reaches `minCount` — i.e. it appears anywhere else at least
    * once more. Scores avoid the two cross-engine traps: no `log`
    * (geometric-mean perplexity is libm-dependent) and no double
    * accumulation (order-dependent); instead
    * `known_fraction` = known bigrams / doc bigrams and
    * `support_ratio` = Σ c(bigram) / Σ c(head) over the doc's bigram
    * stream — all BIGINT sums divided once in double space, bit-identical
    * on any engine.
    *
    * Shape at 100 TB: one bigram-stream pass aggregated into the corpus
    * count table (vocabulary-scale), head totals derived from it, then
    * the doc stream re-joins both keyed on the bigram/head — hash
    * equi-joins with map-side-combinable per-doc aggregation, never
    * all-pairs, no broadcast of corpus-scale state. Docs with fewer than
    * two tokens report zero bigrams and NULL-free 0.0 scores. */
  def lmFamiliarity(df: DataFrame, idCol: String, textCol: String,
                    minCount: Long = 2): DataFrame = {
    val stream = DedupOps.shingleStream(df, idCol, textCol, 2)
    val counts = stream.groupBy(col("s")).agg(count(lit(1)).as("c_bigram"))
      .withColumn("head", split(col("s"), " ").getItem(0))
    val heads = counts.groupBy(col("head"))
      .agg(sum(col("c_bigram")).cast("long").as("c_head"))
    val perDoc = stream
      .join(counts, Seq("s"))
      .join(heads, Seq("head"))
      .groupBy(col("doc_id")).agg(
        count(lit(1)).as("n_bigrams"),
        sum(when(col("c_bigram") >= minCount, 1L).otherwise(0L)).cast("long")
          .as("n_known"),
        sum(col("c_bigram")).cast("long").as("sum_bigram"),
        sum(col("c_head")).cast("long").as("sum_head"))
    df.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_known"), lit(0L)).as("n_known"),
        when(coalesce(col("n_bigrams"), lit(0L)) === 0, 0.0)
          .otherwise(col("n_known").cast("double") / col("n_bigrams"))
          .as("known_fraction"),
        when(coalesce(col("sum_head"), lit(0L)) === 0, 0.0)
          .otherwise(col("sum_bigram").cast("double") / col("sum_head"))
          .as("support_ratio"))
  }

  /** Windowed term co-occurrence with exact lift: every ordered token
    * pair (a, b) where b follows a within `window` tokens in the same
    * document, counted over all occurrences, with
    * lift = (c(a,b) · n_positions) / (c(a) · c(b)) — the PMI ratio
    * WITHOUT the log (libm-free: counts are < 2^53 so their double
    * products are exact and the one division is IEEE-exact). The
    * collocation/embedding-co-occurrence table of a word-vector or
    * phrase-mining pipeline.
    *
    * Shape at 100 TB: the pair stream is `window` lead() columns over
    * the per-doc token order — ONE window pass (no self-join), exploded
    * and hash-aggregated with map-side combine; unigram counts and the
    * scalar total ride as one vocabulary-scale join plus a broadcast.
    * `minPairCount` prunes the long tail before the join. */
  def cooccurrence(df: DataFrame, idCol: String, textCol: String,
                   window: Int = 3, minPairCount: Long = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(window >= 1, s"window must be positive, got $window")
    val base = df.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("doc_id"), posexplode(DedupOps.tokens(col(textCol))))
      .withColumnRenamed("col", "tok")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val uni = base.groupBy(col("tok").as("t")).agg(count(lit(1)).as("c_uni"))
    val total = base.agg(count(lit(1)).as("n_positions"))
    val pairs = base
      .select(col("tok").as("a"),
        array((1 to window).map(j => lead(col("tok"), j).over(w)): _*).as("bs"))
      .select(col("a"), explode(col("bs")).as("b"))
      .filter(col("b").isNotNull)
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_pair"))
      .filter(col("c_pair") >= minPairCount)
    pairs
      .join(uni.withColumnRenamed("t", "a").withColumnRenamed("c_uni", "c_a"), Seq("a"))
      .join(uni.withColumnRenamed("t", "b").withColumnRenamed("c_uni", "c_b"), Seq("b"))
      .crossJoin(broadcast(total))
      .select(col("a"), col("b"), col("c_pair"), col("c_a"), col("c_b"),
        (col("c_pair").cast("double") * col("n_positions").cast("double")
          / (col("c_a").cast("double") * col("c_b").cast("double"))).as("lift"))
  }

  /** Corpus-wide adjacent character-pair counts — the statistic one BPE
    * merge step consumes (the most frequent pair becomes the next merge;
    * cf. Sennrich et al. 2016). Pairs are counted WITHIN whitespace words
    * (the classic pre-tokenization boundary), every occurrence counts.
    *
    * Shape at 100 TB: word explode → position explode → substr, all
    * codegen'd generators (no array lambdas — the interpreted-HOF cliff),
    * then ONE hash aggregate with map-side combine; the top-k is a
    * TakeOrdered like [[vocabTopK]] — no global sort. A full BPE trainer
    * iterates merge→re-pair; each iteration is this same single-shuffle
    * shape over the current symbol stream. */
  def bpePairCounts(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    df.filter(length(trim(col(textCol))) > 0)
      .select(explode(split(trim(lower(col(textCol))), "\\s+")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(col("w"), explode(sequence(lit(1), length(col("w")) - 1)).as("i"))
      .select(col("w").substr(col("i"), lit(2)).as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("pair").asc)
      .limit(k)

  /** Greedy left-to-right application of one BPE merge (a, b) → ab over
    * a symbol array: the standard non-overlapping leftmost-first rule,
    * as an `aggregate` fold (if the accumulator ends with `a` and the
    * next symbol is `b`, fuse them; a fused symbol never re-matches, so
    * "a a a" under (a,a) yields ["aa", "a"]). Interpreted HOF —
    * acceptable: it runs over the vocabulary-scale word table during
    * training and once per document at encode time. */
  private def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === a && x === b,
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))

  /** TRAIN a byte-pair-encoding vocabulary (Sennrich et al. 2016): run
    * `nMerges` iterations of [count all adjacent symbol pairs over the
    * corpus → fuse the most frequent pair everywhere]. This is the real
    * iterative trainer ([[bpePairCounts]] is one iteration's statistic):
    * each round is ONE distributed aggregate over the word-frequency
    * table plus a 1-row driver collect (the argmax merge — the same
    * metadata-scale collect as [[Similarity.fitCentroids]]) and a
    * map-stage re-segmentation. Training runs on the DISTINCT-word
    * table weighted by occurrence counts — vocabulary-scale, not
    * corpus-scale, the classic trick that makes BPE training cheap at
    * 100 TB (one corpus pass builds the word table; every iteration
    * after that touches only the vocabulary).
    *
    * Ties break by pair string ascending (deterministic). Returns the
    * ordered merge list; stops early if no pair occurs twice. */
  def bpeTrain(df: DataFrame, idCol: String, textCol: String,
               nMerges: Int): Seq[(String, String)] = {
    require(nMerges >= 1, s"nMerges must be positive, got $nMerges")
    val pairsOf = (syms: Column) =>
      when(size(syms) < 2, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), size(syms) - 1),
          i => concat_ws(" ", element_at(syms, i), element_at(syms, i + 1))))
    var words = df
      .select(explode(DedupOps.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
      .withColumn("syms", split(col("w"), ""))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    for (_ <- 0 until nMerges if !done) {
      val top = words
        .select(col("wc"), explode(pairsOf(col("syms"))).as("pair"))
        .groupBy(col("pair")).agg(sum(col("wc")).cast("long").as("n"))
        .filter(col("n") >= 2)
        .orderBy(col("n").desc, col("pair").asc)
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val Array(a, b) = top(0).getString(0).split(" ", 2)
        merges += ((a, b))
        // localCheckpoint: constant-depth lineage across iterations (the
        // nearDupClusters/fitCentroids loop contract)
        words = words.withColumn("syms", applyMerge(col("syms"), a, b))
          .localCheckpoint(true)
      }
    }
    merges.toSeq
  }

  /** ENCODE documents with a trained merge list ([[bpeTrain]]): apply
    * the merges in training order to every word (same greedy
    * leftmost-first rule as [[applyMerge]]). Implemented as a
    * `mapPartitions` stage with the driver-resident merge list in the
    * task closure — NOT as folded expressions: a real BPE vocabulary is
    * 1k–32k merges, and |merges| nested `aggregate` lambdas blow up
    * Catalyst analysis long before that (the expression form is fine
    * for the per-iteration single merge inside [[bpeTrain]], where the
    * depth is always 1). Pure map stage — partition-parallel, no
    * shuffle, no state. Normalization matches [[DedupOps.tokens]]
    * (trim, lower, whitespace split). Returns (doc_id,
    * tokens: array<string>, n_bpe_tokens). */
  def bpeEncode(df: DataFrame, idCol: String, textCol: String,
                merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val mergeList = merges.toArray
    df.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("__text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        def applyOne(syms: Array[String], a: String, b: String): Array[String] = {
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (out.nonEmpty && out.last == a && syms(i) == b)
              out(out.length - 1) = a + b
            else out += syms(i)
            i += 1
          }
          out.toArray
        }
        rows.map { case (id, text) =>
          val words = Option(text).getOrElse("").trim.toLowerCase
            .split("\\s+").filter(_.nonEmpty)
          val toks = words.flatMap { w =>
            mergeList.foldLeft(w.split("")) { case (syms, (a, b)) =>
              applyOne(syms, a, b)
            }
          }
          (id, toks, toks.length.toLong)
        }
      }
      .toDF("doc_id", "tokens", "n_bpe_tokens")
  }

  /** Per-group BPE fertility — the compression readout a tokenizer
    * owner tracks per language/domain slice: words, BPE tokens (under
    * a vocabulary trained by [[bpeTrain]] on THIS corpus), and
    * characters, all exact BIGINTs (chars per token and tokens per
    * word are one caller-side division away). Scale shape: the merges
    * apply to the DISTINCT-word table only (vocabulary-scale — the
    * same trick that makes [[bpeTrain]] cheap), broadcast back onto
    * the word stream, one hash aggregate per group. The per-merge
    * expression fold is depth-`nMerges` interpreted HOF over the
    * vocab — fine at statistic-grade merge counts; a full production
    * vocab goes through [[bpeEncode]]'s mapPartitions closure
    * instead. */
  def bpeFertility(df: DataFrame, textCol: String, groupCol: String,
                   nMerges: Int): DataFrame = {
    val merges = bpeTrain(df, groupCol, textCol, nMerges)
    val words = df
      .select(col(groupCol), explode(DedupOps.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
    val symCol = merges.foldLeft(split(col("w"), "")) {
      case (c, (a, b)) => applyMerge(c, a, b)
    }
    val encoded = words.select(col("w")).distinct()
      .select(col("w"), size(symCol).cast("long").as("__toks"),
        length(col("w")).cast("long").as("__chars"))
    words
      .join(graft.operators.Broadcasts.maybeBroadcast(encoded), Seq("w"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("__toks")).cast("long").as("n_tokens"),
        sum(col("__chars")).cast("long").as("n_chars"))
  }

  /** BM25 retrieval scores for a literal query-term set: the `k` best
    * documents per term. Uses the LINEAR idf (N/df, no logarithm) for the
    * same engine-portability reason as [[tfidfTopTerms]]; k1/b defaults
    * (1.25, 0.75) are exactly representable doubles, so the whole score —
    * integer counts combined with IEEE multiply/divide in a fixed tree —
    * is bit-identical on any engine.
    *
    * Shape at 100 TB: the token stream is aggregated twice on doc_id
    * (lengths, then per-term tf AFTER the term filter prunes the stream
    * to the query slice); document frequency and the corpus-stats scalar
    * ride as broadcast frames; the final top-k is a per-term window over
    * the scored slice — never the corpus. */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], k: Int,
               k1: Double = 1.25, b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol).as("doc_id"),
      explode(split(trim(lower(col(textCol))), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(sum(col("dl")).cast("long").as("total_tokens"),
      count(lit(1)).as("n_docs"))
    val tf = toks.filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.join(dl, "doc_id")
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl",
        col("total_tokens").cast("double") / col("n_docs").cast("double"))
      .withColumn("score",
        (col("n_docs").cast("double") / col("df").cast("double"))
          * (col("tf").cast("double") * lit(k1 + 1.0))
          / (col("tf").cast("double")
            + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") / col("avgdl"))))
    val w = Window.partitionBy(col("term"))
      .orderBy(col("score").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("term"), col("doc_id"), col("tf"), col("df"),
        col("dl"), col("score"), col("rank"))
  }

  /** Materialize a BM25 inverted index so query-time search touches the
    * POSTINGS SLICE for its terms, never the corpus: `postings` rows are
    * fully denormalized — (term, doc_id, tf, dl, df) — the classic
    * search-index trade (per-posting bytes for zero query-time joins),
    * plus a one-row `stats` table (n_docs, total_tokens).
    *
    * Layout: postings repartition on term, then sort WITHIN partitions
    * by (term, doc_id) — every parquet row-group covers a narrow term
    * range, so a `term IN (...)` probe prunes by row-group min/max
    * statistics on top of the pushed filter. At 100 TB the index is
    * term-sharded; a query reads only its terms' shards.
    *
    * Staleness contract: like the IVF index, the build is write-once —
    * df/dl/stats bake corpus-wide constants into the rows, so appending
    * documents requires a rebuild (or accepting scores drifting from
    * [[bm25TopK]]'s live values; the spec pins search ≡ live exactly). */
  def bm25IndexBuild(spark: org.apache.spark.sql.SparkSession, path: String,
                     df: DataFrame, idCol: String, textCol: String): Unit = {
    val toks = df.select(col(idCol).as("doc_id"),
      explode(split(trim(lower(col(textCol))), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val postings = tf.join(dl, "doc_id").join(dfreq, "term")
      .select(col("term"), col("doc_id"), col("tf"), col("dl"), col("df"))
      .repartition(col("term"))
      .sortWithinPartitions(col("term"), col("doc_id"))
    postings.write.mode("overwrite").parquet(s"$path/postings")
    dl.agg(sum(col("dl")).cast("long").as("total_tokens"),
        count(lit(1)).as("n_docs"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
  }

  /** Query the materialized index: identical scoring tree to
    * [[bm25TopK]] (linear idf, k1/b defaults), so results are
    * bit-identical to the live operator on the indexed corpus. The term
    * filter reaches the postings scan as a pushed `In`; the only other
    * input is the broadcast one-row stats table. */
  def bm25IndexSearch(spark: org.apache.spark.sql.SparkSession, path: String,
                      terms: Seq[String], k: Int,
                      k1: Double = 1.25, b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val postings = spark.read.parquet(s"$path/postings")
      .filter(col("term").isin(terms: _*))
    val stats = spark.read.parquet(s"$path/stats")
    val scored = postings.crossJoin(broadcast(stats))
      .withColumn("avgdl",
        col("total_tokens").cast("double") / col("n_docs").cast("double"))
      .withColumn("score",
        (col("n_docs").cast("double") / col("df").cast("double"))
          * (col("tf").cast("double") * lit(k1 + 1.0))
          / (col("tf").cast("double")
            + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") / col("avgdl"))))
    val w = Window.partitionBy(col("term"))
      .orderBy(col("score").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("term"), col("doc_id"), col("tf"), col("df"),
        col("dl"), col("score"), col("rank"))
  }

  /** KWIC (keyword-in-context) snippets: for each document containing a
    * query term, the ±`window` token context around the FIRST
    * occurrence — the search-result snippet stage downstream of
    * [[bm25IndexSearch]]. `position` is the 1-based token index of the
    * hit (ties: first occurrence by construction).
    *
    * Shape: the token array binds ONCE per document (the documented
    * inline-split O(tokens²) trap), positions come from a codegen
    * posexplode, the first-hit aggregate is term-filtered BEFORE the
    * shuffle (query-slice-sized), and the snippet slice rejoins the
    * array by doc key. */
  def kwicSnippets(df: DataFrame, idCol: String, textCol: String,
                   terms: Seq[String], window: Int): DataFrame = {
    require(terms.nonEmpty && window >= 0, s"need terms and window >= 0")
    val toks = df.select(col(idCol).as("doc_id"),
      split(trim(lower(col(textCol))), "\\s+").as("__toks"))
    val hits = toks
      .select(col("doc_id"), posexplode(col("__toks")))
      .filter(col("col").isin(terms: _*))
      .groupBy(col("doc_id"), col("col").as("term"))
      .agg((min(col("pos")) + 1).cast("long").as("position"))
    hits.join(toks, Seq("doc_id"))
      .withColumn("__start", greatest(col("position") - window, lit(1L)))
      .select(col("doc_id"), col("term"), col("position"),
        concat_ws(" ", slice(col("__toks"), col("__start").cast("int"),
          (col("position") + window - col("__start") + 1).cast("int")))
          .as("snippet"))
  }

  /** Top-k characteristic terms per document by TF×IDF with a LINEAR
    * inverse document frequency (score = tf × N/df, no logarithm): libm
    * `log` differs across engines in the last ulp, while IEEE
    * multiply/divide are exactly specified — the linear variant ranks
    * identically for single-term comparisons and keeps scores bit-exact
    * everywhere (the engine-portability contract of SparkEntry).
    *
    * Shape at 100 TB: one explode + two hash aggregations (term frequency
    * per doc, document frequency per term), a broadcast of the corpus-size
    * scalar AS A FRAME (no driver collect), and a per-doc top-k window.
    * Ties break by term ascending for determinism. */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol).as("doc_id"),
      explode(split(trim(lower(col(textCol))), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = df.agg(countDistinct(col(idCol)).as("n_docs"))
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        col("tf").cast("double") * (col("n_docs").cast("double") / col("df").cast("double")))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("doc_id", "term", "tf", "df", "tfidf", "rank")
  }

  /** Out-of-vocabulary rate per document against a supplied vocabulary
    * frame (one `term` column — typically [[vocabTopK]] output or a
    * tokenizer's exported vocab): the fraction of a doc's whitespace
    * tokens not found in the vocabulary. The coverage check run before
    * committing to a tokenizer — a rising OOV rate on new data means the
    * vocab no longer fits the corpus.
    *
    * Plan: token explode → LEFT join the (small, broadcast-gated) vocab →
    * one per-doc count agg → left join back to all docs so token-less
    * docs report 0/0/0.0. The rate is two BIGINT counts divided once in
    * double space — bit-exact on any engine. At 100 TB the vocab frame is
    * the broadcast side (vocabularies are 10^4-10^6 rows); the heavy
    * token stream never shuffles before its per-doc aggregate.
    */
  def oovRate(df: DataFrame, idCol: String, textCol: String,
              vocab: DataFrame): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
    val marked = toks.join(
      graft.operators.Broadcasts.maybeBroadcast(
        vocab.select(col("term")).distinct().withColumn("__in_vocab", lit(1))),
      Seq("term"), "left")
    val perDoc = marked.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_tokens"),
      sum(when(col("__in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
    df.select(col(idCol).as("doc_id")).distinct()
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        when(coalesce(col("n_tokens"), lit(0L)) === 0, 0.0)
          .otherwise(col("n_oov").cast("double") / col("n_tokens"))
          .as("oov_rate"))
  }

  /** Consistent PII pseudonymization: every email / long-digit-run match
    * is replaced by a STABLE typed token `<KIND_xxxxxxxx>` (first 8 hex
    * chars of md5 of the matched value) instead of [[redactPii]]'s
    * lossy fixed tag — the same value maps to the same token in every
    * document, so cross-document joins on the pseudonym still work
    * (referential integrity preserved) while the raw value never leaves
    * the row. The per-doc mapping is emitted alongside (`pii_map`,
    * rendered under a total order) so a governed re-identification
    * table can be split off and access-controlled.
    *
    * Replacement is a FOLD over the doc's distinct matches sorted by
    * (length DESC, value ASC): longer values replace first, so a value
    * that is a substring of another (`a@b.com` inside `xa@b.com`, a
    * digit run inside an email) cannot corrupt the longer match's
    * replacement. The sort key is a (−length, value) struct — struct
    * ordering is lexicographic-by-field in Spark and DuckDB alike, so
    * the fold order (and therefore the output) is engine-portable.
    * Number extraction runs against the ORIGINAL text: a digit run
    * that only occurs inside an email is listed in the mapping but its
    * replace is a no-op on the already-scrubbed string (deterministic
    * on any engine; documented wart, not a hazard).
    *
    * Shape at 100 TB: pure map stage — two regex extractions and a
    * per-row fold over a handful of matches (the HOF-lambda cost is
    * bounded by PII density, not text length; the regex scans
    * dominate). No shuffle, no state. */
  def pseudonymizePii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val numRe = "\\b\\d{7,}\\b"
    def items(re: String, kind: String): Column =
      transform(
        array_sort(transform(
          array_distinct(regexp_extract_all(t, lit(re), lit(0))),
          v => struct((-length(v)).as("k"), v.as("v")))),
        s => struct(s.getField("v").as("v"),
          concat(lit("<" + kind + "_"),
            substring(md5(s.getField("v")), 1, 8), lit(">")).as("tok")))
    df.withColumn("__repl", concat(items(emailRe, "EMAIL"), items(numRe, "NUMBER")))
      .withColumn("scrubbed", aggregate(col("__repl"), t,
        (acc, x) => replace(acc, x.getField("v"), x.getField("tok"))))
      .withColumn("n_pii", size(col("__repl")).cast("long"))
      .withColumn("pii_map", array_join(transform(col("__repl"),
        x => concat(x.getField("v"), lit("=>"), x.getField("tok"))), "|"))
      .drop("__repl")
  }

  /** Character-class census per document: exact counts of ASCII
    * letters / digits / whitespace / punctuation, the non-ASCII tail,
    * and whatever printable-ASCII residue is left — the script/encoding
    * health check run before language ID (mojibake shows up as a fat
    * `n_other_ascii`/`n_non_ascii`, binary-in-text as both). The ratio
    * is ONE division of two exact BIGINTs.
    *
    * Counts come from length-difference against `regexp_replace` with
    * explicit ASCII character classes — deliberately NOT `\p{...}`
    * Unicode properties, whose syntax and semantics differ between
    * regex engines (Java `\p{IsHan}` vs RE2 `\p{Han}`); explicit
    * ranges behave identically everywhere. Non-ASCII = everything
    * outside printable ASCII + [tab, LF, CR].
    *
    * Shape at 100 TB: pure map stage (six codegen'd regex counts per
    * row, no shuffle); aggregate downstream by whatever slice the
    * caller groups on. */
  def charClassProfile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    def cnt(cls: String) = (length(t) - length(regexp_replace(t, cls, ""))).cast("long")
    val letters = cnt("[A-Za-z]")
    val digits = cnt("[0-9]")
    val space = cnt("[ \t\n\r]")
    val punct = cnt("[!-/:-@\\[-`{-~]")
    val nonAscii = length(regexp_replace(t, "[ -~\t\n\r]", "")).cast("long")
    df.select(col(idCol), length(t).cast("long").as("n_chars"),
        letters.as("n_letters"), digits.as("n_digits"), space.as("n_space"),
        punct.as("n_punct"), nonAscii.as("n_non_ascii"))
      .withColumn("n_other_ascii",
        col("n_chars") - col("n_letters") - col("n_digits") - col("n_space")
          - col("n_punct") - col("n_non_ascii"))
      .withColumn("letter_ratio",
        col("n_letters").cast("double")
          / greatest(col("n_chars"), lit(1L)).cast("double"))
  }

  /** Tokenizer fertility / corpus-volume report per slice: document,
    * token, character, and byte totals with the derived per-unit rates
    * (chars per token ≈ tokenizer fertility, bytes per token = the
    * storage-to-training-token exchange rate, tokens per doc = example
    * granularity). These are the numbers a mix designer reads before
    * assigning sampling weights to a source — and the denominators every
    * "how many training tokens do we own" estimate is built on.
    *
    * Exactness: all four totals are BIGINT sums of integer per-row
    * features; each rate is ONE division of two exact BIGINTs, so the
    * IEEE result is bit-identical on any engine (cheat-sheet rule:
    * divide exact integers once, never accumulate doubles).
    *
    * Shape at 100 TB: map-side partial aggregation collapses each
    * partition to |slices| rows before the single hash-agg shuffle on
    * the (few-hundred-value) group key — the same one-pass profile
    * shape as [[vocabDrift]]'s totals. No window, no join. */
  def tokenFertility(df: DataFrame, groupCols: Seq[String],
                     textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val g = (c: Column) => greatest(c, lit(1L)).cast("double")
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(tokenCount(t).cast("long")).cast("long").as("total_tokens"),
        sum(length(t).cast("long")).cast("long").as("total_chars"),
        sum(octet_length(t).cast("long")).cast("long").as("total_bytes"))
      .withColumn("chars_per_token",
        col("total_chars").cast("double") / g(col("total_tokens")))
      .withColumn("bytes_per_token",
        col("total_bytes").cast("double") / g(col("total_tokens")))
      .withColumn("tokens_per_doc",
        col("total_tokens").cast("double") / g(col("n_docs")))
  }

  /** Checksum-validated payment-card scan — the precision upgrade over
    * pattern-only PII detection (the redactPii / pseudonymize family
    * matches SHAPES; this one also validates): a 13-19 digit run is
    * only a REAL card candidate if its Luhn check digit holds, which
    * cuts the false-positive rate on ids/timestamps/phone numbers by
    * ~10x (only 1 in 10 random digit runs passes Luhn).
    *
    * Per document: candidate digit runs (regexp_extract_all), the Luhn
    * total per candidate (reversed-position doubling, the exact
    * integer fold — mirrored verbatim by the oracle's list_sum), and
    * (n_candidates, n_valid). Candidates are rare relative to corpus
    * tokens, so the per-candidate HOF fold runs on a tiny exploded
    * frame — the interpreted-lambda cost is bounded by PII density,
    * not corpus size. */
  def luhnCardScan(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val cands = df.select(col(idCol),
      explode_outer(expr(
        s"regexp_extract_all($textCol, '[0-9]{13,19}', 0)")).as("cand"))
    val luhnTot = expr(
      """aggregate(transform(sequence(1, length(cand)), i ->
        |  CASE WHEN (i - 1) % 2 = 0
        |    THEN cast(substr(reverse(cand), i, 1) as int)
        |    ELSE CASE WHEN 2 * cast(substr(reverse(cand), i, 1) as int) > 9
        |      THEN 2 * cast(substr(reverse(cand), i, 1) as int) - 9
        |      ELSE 2 * cast(substr(reverse(cand), i, 1) as int) END
        |  END), 0, (acc, x) -> acc + x)""".stripMargin)
    cands
      .withColumn("__tot", when(col("cand").isNotNull, luhnTot))
      .groupBy(col(idCol))
      .agg(count(col("cand")).as("n_candidates"),
        coalesce(sum(when(col("__tot") % 10 === 0, 1L).otherwise(0L)), lit(0L))
          .as("n_valid"))
  }

  /** Compression-ratio quality signal: `deflate(text).length / length`
    * per document — the classic cheap redundancy detector (the
    * Gopher/CCNet pipeline family uses exactly this): highly repetitive
    * machine-generated text compresses far below prose, random noise
    * barely compresses at all, so both tails of the ratio distribution
    * are removal candidates that token-level heuristics
    * ([[repetitionStats]]) can miss.
    *
    * Computed in a `mapPartitions` pass with ONE java.util.zip.Deflater
    * reused per partition (native zlib allocation is the dominant cost;
    * per-row allocation is 5-10x slower) — the same JVM-codec escape
    * hatch contract as Multimodal's image/audio decode. Map-only: no
    * shuffle, cost is one scan at any corpus size.
    *
    * Deterministic for a fixed (JVM zlib version, level) pair, which
    * holds within a cluster — but NOT oracle-portable (DuckDB has no
    * deflate), so this operator is spec-verified against direct JDK
    * compression, deliberately outside the hash gate (the HLL-sketch
    * precedent). */
  def compressionRatio(df: DataFrame, idCol: String, textCol: String,
                       level: Int = 6): DataFrame = {
    require(level >= 1 && level <= 9, s"deflate level in [1,9], got $level")
    val spark = df.sparkSession
    import spark.implicits._
    val out = df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val deflater = new java.util.zip.Deflater(level)
        val buf = new Array[Byte](64 * 1024)
        rows.map { case (id, text) =>
          val raw =
            if (text == null) Array.emptyByteArray
            else text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          deflater.reset()
          deflater.setInput(raw)
          deflater.finish()
          var compressed = 0L
          while (!deflater.finished())
            compressed += deflater.deflate(buf)
          (id, raw.length.toLong, compressed)
          // release the native zlib stream when the partition drains
          // (early-terminated tasks fall back to the finalizer)
        } ++ { deflater.end(); Iterator.empty }
      }
      .toDF(idCol, "raw_bytes", "deflated_bytes")
    out.withColumn("compression_ratio",
      when(col("raw_bytes") > 0,
        col("deflated_bytes").cast("double") / col("raw_bytes").cast("double")))
  }

  /** Exact token-phrase search over the corpus: documents containing
    * the tokens of `phrase` CONSECUTIVELY, with every 1-based start
    * position — the grep-for-token-sequences primitive behind
    * contamination spot checks ("which documents contain this exact
    * benchmark sentence") and boilerplate hunting, where substring LIKE
    * matches the wrong thing ("rowing" contains "row") and bag-of-words
    * retrieval ignores order.
    *
    * Positional-postings join: tokenize once per document (the
    * inline-split O(tokens²) trap documented at [[kwicSnippets]]),
    * posexplode, keep ONLY postings whose term appears in the phrase
    * (the pushed filter makes the joined frames query-selective, the
    * [[kwicSnippets]] discipline), then m−1 self-equi-joins on
    * (doc, pos + offset) pin the consecutive alignment. Every join is a
    * key equi-join on (doc_id, pos) — never a cross product; fan-out is
    * bounded by per-doc phrase-term frequency.
    *
    * Output: (doc_id, match_pos) per occurrence, match_pos 1-based.
    * Single-token phrases degrade to a plain postings filter. */
  def phraseSearch(df: DataFrame, idCol: String, textCol: String,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one token")
    val terms = phrase.map(_.trim.toLowerCase)
    require(terms.forall(t => t.nonEmpty && !t.exists(_.isWhitespace)),
      s"phrase tokens must be non-empty single words, got $phrase")
    val postings = df
      .select(col(idCol).as("doc_id"),
        posexplode(graft.llmdata.DedupOps.tokens(col(textCol))))
      .filter(col("col").isin(terms.distinct: _*))
      .select(col("doc_id"), col("pos"), col("col").as("term"))
    val first = postings.filter(col("term") === terms.head)
      .select(col("doc_id"), col("pos").as("__p0"))
    val matched = terms.zipWithIndex.tail.foldLeft(first) {
      case (acc, (t, i)) =>
        acc.join(
          postings.filter(col("term") === t)
            .select(col("doc_id"), (col("pos") - i).as("__p0")),
          Seq("doc_id", "__p0"))
    }
    matched.select(col("doc_id"), (col("__p0") + 1).cast("long").as("match_pos"))
  }

  /** RAKE keyword extraction (Rose et al. 2010), corpus-wide: candidate
    * phrases are the maximal stopword-free token runs; each word earns
    * degree = Σ length of the phrases it appears in and frequency =
    * its occurrence count; a phrase scores the sum of its words'
    * degree/frequency ratios. The unsupervised keyword step of a
    * curation pipeline — what is this corpus about, which phrases
    * should seed a topic filter.
    *
    * Exactness deviation from the paper, deliberately: word ratios are
    * INTEGER MICRO-UNITS (`deg·1e6 div freq`) so the phrase score is a
    * sum of exact BIGINTs — order-free and engine-identical — instead
    * of a sum of doubles whose value depends on addition order. The
    * floor loses < 1e-6 per word: irrelevant to ranking, essential to
    * reproducibility.
    *
    * Shape at 100 TB: tokenize once (posexplode), phrase ids from ONE
    * per-doc running stopword count (doc-keyed window); phrase length
    * from a (doc, phrase) window on the same shuffle; word stats are a
    * vocabulary-scale aggregate that joins back
    * [[graft.operators.Broadcasts.maybeBroadcast]]; identical phrases
    * collapse in one hash aggregate and top-k is a distributed
    * TakeOrdered — no global sort, no all-pairs anything. */
  def rakeKeywords(df: DataFrame, idCol: String, textCol: String,
                   stopwords: Seq[String], topK: Int): DataFrame = {
    require(stopwords.nonEmpty, "stopword list required (phrases split on them)")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    import org.apache.spark.sql.expressions.Window
    val toks = df
      .select(col(idCol).as("doc_id"),
        posexplode(graft.llmdata.DedupOps.tokens(col(textCol))))
      .filter(length(col("col")) > 0)
      .select(col("doc_id"), col("pos"), col("col").as("term"))
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val members = toks
      .withColumn("__stop", col("term").isin(stopwords: _*))
      .withColumn("__pid", sum(col("__stop").cast("int")).over(wDoc))
      .filter(!col("__stop"))
    val withLen = members.withColumn("plen",
      count(lit(1)).over(Window.partitionBy(col("doc_id"), col("__pid"))))
    val wordScores = withLen.groupBy(col("term"))
      .agg(sum(col("plen")).cast("long").as("__deg"),
        count(lit(1)).as("__freq"))
      .withColumn("__wscore", expr("(__deg * 1000000) div __freq"))
      .select(col("term"), col("__wscore"))
    val phraseInstances = withLen
      .join(graft.operators.Broadcasts.maybeBroadcast(wordScores), Seq("term"))
      .groupBy(col("doc_id"), col("__pid"))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("term")))),
          x => x.getField("term"))).as("phrase"),
        count(lit(1)).as("__nw"),
        sum(col("__wscore")).cast("long").as("__score"))
    phraseInstances.groupBy(col("phrase"))
      .agg(max(col("__nw")).as("n_words"),
        count(lit(1)).as("n_occurrences"),
        max(col("__score")).as("score_micro"))
      .orderBy(col("score_micro").desc, col("phrase").asc)
      .limit(topK)
  }

  /** The hashing trick: each document's bag of tokens folded into a
    * fixed `nBuckets`-dimensional SIGNED sparse vector — the
    * vocabulary-free featurization (Weinberger et al. 2009 /
    * HashingTF's signed variant) that needs no fitted dictionary, so a
    * 100 TB corpus featurizes in ONE map-side pass with no
    * vocabulary-build stage at all. Bucket = first 8 md5 hex chars mod
    * `nBuckets`; sign = the 9th hex char (< '8' → +1, else −1 — the
    * unbiased-inner-product trick: collisions cancel in expectation
    * instead of accumulating). Zero-weight entries (fully cancelled
    * buckets) are dropped: the output is the sparse representation.
    *
    * Deterministic (md5, no fitted state) and engine-portable (integer
    * weights). One explode + one (doc, bucket) hash aggregate with
    * map-side combine; nothing global anywhere.
    *
    * Output: (doc_id, bucket, weight). */
  def featureHash(df: DataFrame, idCol: String, textCol: String,
                  nBuckets: Int): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= (1 << 24),
      s"nBuckets must be in [2, 2^24], got $nBuckets")
    df.select(col(idCol).as("doc_id"),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
      .withColumn("__h", md5(col("term")))
      .withColumn("bucket",
        (conv(substring(col("__h"), 1, 8), 16, 10).cast("long")
          % nBuckets).cast("int"))
      .withColumn("__sign",
        when(substring(col("__h"), 9, 1) < "8", 1L).otherwise(-1L))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(sum(col("__sign")).as("weight"))
      .filter(col("weight") =!= 0L)
  }

  /** Boilerplate profile: per document, how much of it is made of
    * shingles the REST of the corpus repeats — the template/navigation/
    * legal-footer signal that near-dup removal (whole-document scope)
    * and novelty (batch-vs-corpus scope) both miss. A page can be
    * globally unique yet 80% chrome; this catches it.
    *
    * Per doc: its DISTINCT word `shingleSize`-grams; corpus df per
    * shingle; `n_common` = shingles with df ≥ `dfAtLeast` (appearing in
    * that many documents, self included), `boilerplate_fraction` =
    * n_common / n_shingles (one exact-integer division). Docs too short
    * to shingle report 0 shingles and NULL fraction.
    *
    * Shape at 100 TB: shingle explode → (shingle) df aggregate →
    * semi-broadcastable join back on the shingle stream → per-doc
    * aggregate. The df table is vocabulary-scale; everything else is
    * scan-proportional. No windows. */
  def boilerplateProfile(df: DataFrame, idCol: String, textCol: String,
                         shingleSize: Int = 5, dfAtLeast: Long = 3): DataFrame = {
    require(shingleSize >= 1 && dfAtLeast >= 1, "bad shingle/df params")
    val toks = df.select(col(idCol).as("doc_id"),
        split(trim(lower(col(textCol))), "\\s+").as("__toks"))
    val sh = toks.select(col("doc_id"),
        explode(DedupOps.shinglesFromTokens(col("__toks"), shingleSize))
          .as("shingle"))
    val dfCounts = sh.groupBy(col("shingle"))
      .agg(count(lit(1)).as("__df")) // shingles are per-doc DISTINCT
    sh.join(dfCounts, Seq("shingle"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("__df") >= dfAtLeast, 1L).otherwise(0L)).as("n_common"))
      .join(toks.select(col("doc_id")), Seq("doc_id"), "right")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_common"), lit(0L)).as("n_common"))
      .withColumn("boilerplate_fraction",
        when(col("n_shingles") > 0,
          col("n_common").cast("double") / col("n_shingles").cast("double")))
  }

  /** Vocabulary growth curve: how fast the corpus stops yielding NEW
    * terms — the diversity-saturation readout behind "will another
    * crawl month add vocabulary or just mass". The corpus is cut into
    * `nBins` equal-width id-range bins (ids ordered by ingestion make
    * this the acquisition timeline); each bin reports its docs, token
    * occurrences, terms whose FIRST occurrence falls in it, and the
    * cumulative vocabulary — a Heaps-law curve in exact integers,
    * no log fit (logs aren't engine-portable; the raw curve is).
    *
    * Shape at 100 TB: one token explode feeding (a) a per-term
    * `min(doc_id)` hash aggregate (vocabulary-scale) and (b) a per-bin
    * doc/token rollup; binning is integer arithmetic off a broadcast
    * (min, max) id pair — NO ranks, no doc-scale windows; the one
    * running-sum window orders the nBins-row aggregate (metadata). */
  def vocabularyGrowth(df: DataFrame, idCol: String, textCol: String,
                       nBins: Int = 10): DataFrame = {
    require(nBins >= 1, s"nBins must be >= 1, got $nBins")
    import org.apache.spark.sql.expressions.Window
    val docs = df.select(col(idCol).cast("long").as("__id"),
      split(trim(lower(col(textCol))), "\\s+").as("__toks"),
      when(length(trim(col(textCol))) === 0, 0L)
        .otherwise(size(split(trim(col(textCol)), "\\s+"))).as("__nt"))
    val bounds = docs.agg(min(col("__id")).as("__lo"),
      (max(col("__id")) - min(col("__id")) + 1).as("__span"))
    def binned(frame: DataFrame, on: String) = frame
      .crossJoin(broadcast(bounds))
      .withColumn("bin",
        expr(s"(($on - __lo) * $nBins) div __span").cast("int"))
      .drop("__lo", "__span")
    val terms = docs.select(col("__id"),
        explode(col("__toks")).as("term"))
      .filter(length(col("term")) > 0)
    val perBin = binned(docs.select(col("__id"), col("__nt")), "__id")
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__nt")).cast("long").as("n_tokens"))
    val newTerms = binned(terms.groupBy(col("term"))
      .agg(min(col("__id")).as("__first")), "__first")
      .groupBy(col("bin")).agg(count(lit(1)).as("n_new_terms"))
    val w = Window.orderBy(col("bin").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBin.join(newTerms, Seq("bin"), "left")
      .withColumn("n_new_terms", coalesce(col("n_new_terms"), lit(0L)))
      .withColumn("cum_vocabulary",
        sum(col("n_new_terms")).over(w).cast("long"))
  }
}
