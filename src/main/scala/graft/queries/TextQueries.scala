package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextClean._

/** Text-wrangling pack — O-15..O-27, O-29, O-30 (SURVEY.md §2.3) declared
  * as oracle-checked queries over `documents`.
  *
  * The testdata documents are plain word soup, which would leave most
  * cleaners as untested no-ops. So each query first DECORATES the text
  * into a subtitle-shaped input (WEBVTT header, SRT cue + timestamp,
  * bracketed stage directions, HTML tags, speaker labels, dialog
  * punctuation, filler words) with the IDENTICAL concat expression in
  * both engines, then applies the cleaner — the regex semantics are
  * genuinely exercised and any Spark↔DuckDB dialect drift flips the hash.
  *
  * Scale: every query is a stateless per-row projection over a parquet
  * scan — no shuffle at all, embarrassingly parallel at any data size,
  * and fully inside whole-stage codegen (no UDFs).
  */
object TextQueries {
  type Q = (SparkSession, String) => DataFrame

  // Subtitle-shaped decoration, identical in both engines.
  private def deco(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      concat(
        lit("WEBVTT\n12\n"),
        lit("00:01:23,456 --> 00:01:25,789\n"),
        lit("[applause] (laughs) {music}\n"),
        lit("JOHN: <i>Hello there...</i> -- \"quoted\" don’t\n"),
        lit("<v Narrator>once upon a time\n"),
        lit("- um Uh GONNA line one, okay!?\n"),
        col("text"),
        lit("\nJohn Smith: ep "),
        col("doc_id").cast("string"),
        lit(" trailing;:")).as("raw"))

  private val decoSql: String =
    "'WEBVTT' || chr(10) || '12' || chr(10) || " +
      "'00:01:23,456 --> 00:01:25,789' || chr(10) || " +
      "'[applause] (laughs) {music}' || chr(10) || " +
      "'JOHN: <i>Hello there...</i> -- \"quoted\" don’t' || chr(10) || " +
      "'<v Narrator>once upon a time' || chr(10) || " +
      "'- um Uh GONNA line one, okay!?' || chr(10) || " +
      "text || chr(10) || 'John Smith: ep ' || CAST(doc_id AS VARCHAR) || ' trailing;:'"

  private def cleanerQ(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Q =
    (s, d) => deco(s, d).select(col("doc_id"), f(col("raw")).as("cleaned"))
  private def cleanerSql(f: String => String): String =
    s"SELECT doc_id, ${f(s"($decoSql)")} AS cleaned FROM documents"

  // O-26/O-27/O-29/O-30 operate on a synthetic title: some rows get a
  // " (19xx)" year suffix, some don't (exercises the 1800 fallback).
  private def titled(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      concat(
        col("source"), lit(" "), substring(col("text"), 1, 16),
        when(pmod(col("doc_id"), lit(3)) === 0,
          concat(lit(" ("), (lit(1900) + pmod(col("doc_id"), lit(100))).cast("string"), lit(")")))
          .otherwise(lit(""))).as("t"))

  private val titledSql: String =
    "source || ' ' || substr(text, 1, 16) || " +
      "CASE WHEN doc_id % 3 = 0 THEN ' (' || CAST(1900 + doc_id % 100 AS VARCHAR) || ')' ELSE '' END"

  private val o26: Q = (s, d) =>
    titled(s, d).select(col("doc_id"), titleOf(col("t")).as("title"), yearOf(col("t")).as("year"))

  private val o27: Q = (s, d) =>
    titled(s, d).select(
      col("doc_id"),
      slug(col("t")).as("slugged"),
      unslug(slug(col("t"))).as("roundtrip"))

  private val o25: Q = (s, d) =>
    Tables.documents(s, d).select(
      col("doc_id"),
      asciiOnly(concat(lit("Café №"), col("source"), lit(" — "), substring(col("text"), 1, 20)))
        .as("ascii_name"))

  private val o29: Q = (s, d) =>
    Tables.documents(s, d).select(
      col("doc_id"), genName("graft", col("doc_id")).as("gen_name"))

  private val o30: Q = (s, d) =>
    titled(s, d).select(
      col("doc_id"),
      wordCount(col("t")).as("n_words"),
      validName(col("t")).cast("int").as("valid"))

  val queries: Map[String, Q] = Map(
    "o15_remove_timestamps" -> cleanerQ(removeTimestamps),
    "o16_remove_brackets" -> cleanerQ(removeBracketsContent),
    "o17_remove_html" -> cleanerQ(removeHtmlTags),
    "o18_remove_speakers" -> cleanerQ(removeSpeakerLabels),
    "o19_remove_dialog_punct" -> cleanerQ(removeDialogPunctuation),
    "o20_remove_newlines" -> cleanerQ(removeNewlines),
    "o21_remove_non_alpha" -> cleanerQ(removeNonAlphabetic),
    "o22_remove_fillers" -> cleanerQ(removeFillerWords),
    "o23_lowercase" -> cleanerQ(lowercaseText),
    "o24_normalize_ws" -> cleanerQ(normalizeWhitespace),
    "q_clean_subtitles" -> cleanerQ(cleanSubtitles),
    "o25_ascii_clean" -> o25,
    "o26_title_year" -> o26,
    "o27_slug_swap" -> o27,
    "o29_name_gen" -> o29,
    "o30_name_validate" -> o30)

  val oracle: Map[String, String] = Map(
    "o15_remove_timestamps" -> cleanerSql(removeTimestampsSql),
    "o16_remove_brackets" -> cleanerSql(removeBracketsContentSql),
    "o17_remove_html" -> cleanerSql(removeHtmlTagsSql),
    "o18_remove_speakers" -> cleanerSql(removeSpeakerLabelsSql),
    "o19_remove_dialog_punct" -> cleanerSql(removeDialogPunctuationSql),
    "o20_remove_newlines" -> cleanerSql(removeNewlinesSql),
    "o21_remove_non_alpha" -> cleanerSql(removeNonAlphabeticSql),
    "o22_remove_fillers" -> cleanerSql(removeFillerWordsSql),
    "o23_lowercase" -> cleanerSql(lowercaseTextSql),
    "o24_normalize_ws" -> cleanerSql(normalizeWhitespaceSql),
    "q_clean_subtitles" -> cleanerSql(cleanSubtitlesSql),
    "o25_ascii_clean" ->
      ("SELECT doc_id, " +
        asciiOnlySql("('Café №' || source || ' — ' || substr(text, 1, 20))") +
        " AS ascii_name FROM documents"),
    "o26_title_year" ->
      (s"SELECT doc_id, ${titleOfSql(s"($titledSql)")} AS title, " +
        s"${yearOfSql(s"($titledSql)")} AS year FROM documents"),
    "o27_slug_swap" ->
      (s"SELECT doc_id, ${slugSql(s"($titledSql)")} AS slugged, " +
        s"${unslugSql(slugSql(s"($titledSql)"))} AS roundtrip FROM documents"),
    "o29_name_gen" ->
      (s"SELECT doc_id, ${genNameSql("graft", "doc_id")} AS gen_name FROM documents"),
    "o30_name_validate" ->
      (s"SELECT doc_id, ${wordCountSql(s"($titledSql)")} AS n_words, " +
        s"CAST(${validNameSql(s"($titledSql)")} AS INT) AS valid FROM documents"))
}
