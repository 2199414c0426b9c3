package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: quality
  * scoring, language-ID heuristic, token counting, and rolling-hash
  * document fingerprinting. Everything is expressed with codegen'd SQL
  * functions over the token arrays (no UDFs), with exact integer /
  * correctly-rounded double outputs so DuckDB oracles match bit-for-bit.
  */
object TextOps {

  /** Tokens column (lower + split on non-alphanumeric, empties dropped) —
    * the same contract as graft.ingest.Tokenize. */
  def tokensCol(text: org.apache.spark.sql.Column) =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  private val Stopwords = Seq("the", "a", "and", "of", "to", "in")

  /** Per-document quality features + a deterministic quality score. */
  def quality(docs: DataFrame): DataFrame = {
    val toks = tokensCol(col("text"))
    docs.select(col("doc_id"), toks.as("toks"), length(col("text")).as("n_chars"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("toks"))).cast("long"))
      .withColumn("n_stop",
        size(filter(col("toks"), t => t.isin(Stopwords: _*))).cast("long"))
      .withColumn("sum_token_len",
        aggregate(col("toks"), lit(0L), (acc, t) => acc + length(t)).cast("long"))
      .withColumn("avg_token_len",
        col("sum_token_len").cast("double") / col("n_tokens").cast("double"))
      .withColumn("stop_ratio",
        col("n_stop").cast("double") / col("n_tokens").cast("double"))
      .withColumn("distinct_ratio",
        col("n_distinct").cast("double") / col("n_tokens").cast("double"))
      .withColumn("quality_score",
        col("distinct_ratio") * (lit(1.0) - col("stop_ratio")))
      .select("doc_id", "n_chars", "n_tokens", "n_distinct", "n_stop",
              "avg_token_len", "stop_ratio", "distinct_ratio", "quality_score")
      .orderBy("doc_id")
  }

  /** Marker-wordlist language-ID heuristic (the n-gram-profile shape on
    * real corpora; wordlists are the deterministic, SQL-checkable core).
    * Predicts the language with the most marker hits, 'und' when none. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "la", "los", "y", "es"))

  def langId(docs: DataFrame): DataFrame = {
    val toks = tokensCol(col("text"))
    val base = docs.select(col("doc_id"), col("lang").as("labeled_lang"),
                           toks.as("toks"))
    val withScores = LangMarkers.foldLeft(base) { case (df, (lang, markers)) =>
      df.withColumn(s"score_$lang",
        size(filter(col("toks"), t => t.isin(markers: _*))).cast("long"))
    }
    // argmax with deterministic order (first language wins ties)
    val pred = LangMarkers.map(_._1).foldLeft((lit("und"), lit(0L))) {
      case ((bestLang, bestScore), lang) =>
        val s = col(s"score_$lang")
        (when(s > bestScore, lit(lang)).otherwise(bestLang),
         when(s > bestScore, s).otherwise(bestScore))
    }._1
    withScores.withColumn("predicted_lang", pred)
      .withColumn("is_correct",
        (col("predicted_lang") === col("labeled_lang")).cast("long"))
      .select(Seq(col("doc_id"), col("labeled_lang"), col("predicted_lang"),
                  col("is_correct")) ++
              LangMarkers.map { case (l, _) => col(s"score_$l") }: _*)
      .orderBy("doc_id")
  }

  /** Whitespace token count + a BPE-ish subword estimate
    * (ceil(len/4) pieces per token, the usual chars-per-token heuristic). */
  def tokenCounts(docs: DataFrame): DataFrame = {
    val toks = tokensCol(col("text"))
    docs.select(col("doc_id"), toks.as("toks"))
      .withColumn("ws_tokens", size(col("toks")).cast("long"))
      .withColumn("bpe_ish_tokens",
        aggregate(col("toks"), lit(0L),
                  (acc, t) => acc + ceil(length(t) / lit(4.0)).cast("long")))
      .select("doc_id", "ws_tokens", "bpe_ish_tokens")
      .orderBy("doc_id")
  }

  /** Rolling (Karp-Rabin-style) fingerprint over the token stream:
    * fp_i = (fp_{i-1} * B + code(t_i)) mod P with a token code built
    * from SQL-expressible parts, so DuckDB reproduces it exactly. */
  final val FpB = 1000003L
  final val FpP = 2147483647L

  def fingerprints(docs: DataFrame): DataFrame = {
    val toks = tokensCol(col("text"))
    val code = (t: org.apache.spark.sql.Column) =>
      lit(1L) + length(t).cast("long") * 97L + ascii(t).cast("long") * 31L +
        ascii(substring(t, -1, 1)).cast("long")
    docs.select(col("doc_id"), toks.as("toks"))
      .withColumn("fingerprint",
        aggregate(col("toks"), lit(0L),
                  (acc, t) => (acc * FpB + code(t)) % FpP))
      .select("doc_id", "fingerprint")
      .orderBy("doc_id")
  }
}
