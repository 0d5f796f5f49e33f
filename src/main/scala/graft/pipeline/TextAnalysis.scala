package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data curation (SURVEY §2.7 rows 50-52):
  * language ID, quality scoring, token counting. Everything is pure
  * `functions._` column arithmetic — codegen'd, no UDFs, and exactly
  * replicable as SQL for the DuckDB oracle.
  */
object TextAnalysis {

  /** Non-overlapping whole-word occurrence count. */
  def wordCount(textCol: Column, word: String): Column =
    regexp_count(textCol, lit(s"\\b$word\\b"))

  /** Marker stopwords per language — tiny fixed lists so the score is a
    * handful of regexp counts per row.
    */
  val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and"),
    "es" -> Seq("el", "la", "de", "que"),
    "de" -> Seq("der", "die", "und", "das"),
    "fr" -> Seq("le", "les", "et", "des"))

  def langScore(textCol: Column, lang: String): Column =
    markers(lang).map(wordCount(textCol, _)).reduce(_ + _)

  /** N-gram/stopword language ID: argmax of the marker-hit counts with a
    * fixed priority tiebreak (en > es > de > fr), 'und' (undetermined)
    * when nothing hits.
    */
  def langId(textCol: Column): Column = {
    val scores = Seq("en", "es", "de", "fr").map(l => l -> langScore(textCol, l))
    val best = scores.map(_._2).reduce(greatest(_, _))
    scores.foldRight(lit("und")) { case ((l, s), acc) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  def wsTokens(textCol: Column): Column = size(split(trim(textCol), "\\s+"))

  /** BPE-ish token estimate: alpha runs, digit runs, and single
    * punctuation marks each count as one token.
    */
  def bpeTokens(textCol: Column): Column =
    regexp_count(textCol, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  def punctRatio(textCol: Column): Column =
    regexp_count(textCol, lit("[^A-Za-z0-9\\s]")).cast("double") /
      greatest(length(textCol), lit(1)).cast("double")

  def stopwordRatio(textCol: Column): Column =
    langScore(textCol, "en").cast("double") /
      greatest(wsTokens(textCol), lit(1)).cast("double")

  /** Composite quality score in [0,1]: length saturation (40%), low
    * punctuation (30%), stopword presence (30%) — the standard cheap
    * heuristics bundle.
    */
  def qualityScore(textCol: Column): Column = {
    val lengthTerm = least(wsTokens(textCol).cast("double") / 100.0, lit(1.0))
    val punctTerm = lit(1.0) - least(punctRatio(textCol) * 10.0, lit(1.0))
    val stopTerm = least(stopwordRatio(textCol) * 4.0, lit(1.0))
    lengthTerm * 0.4 + punctTerm * 0.3 + stopTerm * 0.3
  }

  /** Full per-document text profile. */
  def profile(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      langId(col(textCol)).as("lang_guess"),
      wsTokens(col(textCol)).cast("long").as("ws_tokens"),
      bpeTokens(col(textCol)).cast("long").as("bpe_tokens"),
      round(qualityScore(col(textCol)), 4).as("quality"))
}
