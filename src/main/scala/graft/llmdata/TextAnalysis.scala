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
    * broadcast-free. */
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

  /** Document fingerprint: md5 of the normalized text (lowercase, strip
    * non-alphanumerics, collapse whitespace) — the canonical-form exact
    * fingerprint used by exact dedup. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " ")))

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
}
