package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  * All pure column expressions (codegen'd, no UDFs) so they run at
  * scan speed and mirror 1:1 into the DuckDB oracle SQL.
  */
object TextAnalysis {

  /** Lowercased alphanumeric tokens. Same tokenizer as BM25/Dedup. */
  def tokens(c: Column): Column =
    filter(split(lower(c), "[^a-z0-9]+"), t => t =!= "")

  /** Whitespace token count (matches `\S+` runs). */
  def tokenCount(c: Column): Column = regexp_count(c, lit("\\S+")).cast("long")

  /** BPE-ish token count: letter runs, digit runs, and single
    * punctuation marks each count as one token — the usual
    * pre-tokenization granularity BPE vocabularies start from.
    */
  val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
  def tokenCountBpe(c: Column): Column =
    regexp_count(lower(c), lit(BpePattern)).cast("long")

  // Marker stopword sets per language for the n-gram/stopword
  // language-ID heuristic. Score = #distinct marker words present.
  val Markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "for", "on", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "fr" -> Seq("le", "les", "et", "des", "une", "est", "pour", "dans", "que", "qui"),
    "es" -> Seq("el", "los", "las", "y", "un", "una", "es", "para", "por", "como"),
  )

  def langScore(c: Column, markers: Seq[String]): Column =
    size(array_intersect(array_distinct(tokens(c)), array(markers.map(lit): _*)))

  /** Heuristic language ID: argmax of marker-set overlap; ties resolve
    * in Markers order; no markers at all -> "und".
    */
  def langId(c: Column): Column = {
    val scored = Markers.map { case (l, ms) => (l, langScore(c, ms)) }
    val best = scored.tail.foldLeft((lit(scored.head._1), scored.head._2)) {
      case ((bl, bs), (l, s)) => (when(s > bs, lit(l)).otherwise(bl), when(s > bs, s).otherwise(bs))
    }
    when(best._2 > 0, best._1).otherwise(lit("und"))
  }

  /** Quality metrics: char count, token count, mean token length,
    * stopword share, and a composite score in [0,1] (rounded so the
    * double arithmetic is oracle-stable).
    */
  def qualityColumns(c: Column): Seq[Column] = {
    val toks = tokens(c)
    val nTok = size(toks).cast("long")
    val nChars = length(c).cast("long")
    val stopHits = size(filter(toks,
      t => t.isin(Markers.head._2.map(x => x: Any): _*))).cast("long")
    val meanTokLen = round(nChars.cast("double") / greatest(nTok, lit(1L)), 4)
    // score: saturating length term + stopword presence term
    val score = round(
      least(nTok.cast("double") / lit(40.0), lit(1.0)) * 0.5 +
        least(stopHits.cast("double") * lit(10.0) / greatest(nTok, lit(1L)), lit(1.0)) * 0.5, 4)
    Seq(nChars.as("n_chars"), nTok.as("n_tokens"), stopHits.as("stop_hits"),
      meanTokLen.as("mean_tok_len"), score.as("quality"))
  }

  /** Order-insensitive content fingerprint: md5 of the sorted distinct
    * token set. (A rolling/shingle fingerprint for locality lives in
    * Dedup.minhashSignature.)
    */
  def fingerprint(c: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(c)))))

  /** Corpus-level top-k n-gram frequencies — the report behind
    * contamination audits, boilerplate discovery, and tokenizer
    * corpus prep. Counts every occurrence (not per-doc distinct).
    * Scale shape: explode → hash aggregation with map-side partial
    * combine (the shuffle carries one row per DISTINCT n-gram per
    * partition, not per occurrence) → `TakeOrderedAndProject` for the
    * k heads (per-partition top-k heaps, no global sort). Ties at the
    * k boundary break on the n-gram string, so the returned SET is
    * deterministic at any parallelism.
    */
  def topNgrams(df: DataFrame, textCol: String, n: Int, k: Int): DataFrame =
    df.select(tokens(col(textCol)).as("_t"))
      .select(explode(graft.pipeline.Dedup.shinglesOfTokens(col("_t"), n)).as("ngram"))
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("ngram"))
      .limit(k)

  /** In-document repetition metrics (MassiveText/Gopher-style
    * duplicate-n-gram filters): the share of n-grams that are repeats
    * of an earlier n-gram in the SAME document, for n = 1..3. High
    * values flag boilerplate, keyword stuffing, and generation loops —
    * the standard pre-training quality cut alongside [[qualityColumns]].
    *
    * `dup_frac(n) = 1 - |distinct n-grams| / |n-grams|`, rounded for
    * oracle-stable doubles; 0 for empty docs. Pure column expressions
    * over one tokenization — scan speed, no shuffle, no UDF. Documents
    * shorter than n tokens shingle to one whole-text n-gram
    * (Dedup.shinglesOfTokens), so their dup fraction is 0 by
    * construction.
    */
  def repetitionColumns(c: Column): Seq[Column] = {
    val t = tokens(c)
    def dupFrac(a: Column): Column =
      when(size(a) > 0,
        round(lit(1.0) - size(array_distinct(a)).cast("double") / size(a), 4))
        .otherwise(lit(0.0))
    Seq(
      size(t).cast("long").as("n_words"),
      dupFrac(t).as("dup_word_frac"),
      dupFrac(Dedup.shinglesOfTokens(t, 2)).as("dup_bigram_frac"),
      dupFrac(Dedup.shinglesOfTokens(t, 3)).as("dup_trigram_frac"))
  }
}
