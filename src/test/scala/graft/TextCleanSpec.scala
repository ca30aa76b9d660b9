package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.lit

import graft.functions.TextClean._

class TextCleanSpec extends SparkSpec {

  private val sample =
    "WEBVTT\n12\n00:01:23,456 --> 00:01:25,789\n" +
      "[applause] (laughs) {music}\nJOHN: <i>Hello there...</i> -- \"quoted\" don’t\n" +
      "<v Narrator>once upon a time\n- um Uh GONNA fine, okay!?\nplain words here 42"

  private val cleaners: Seq[(String, Column => Column)] = Seq(
    "timestamps" -> removeTimestamps,
    "brackets" -> removeBracketsContent,
    "html" -> removeHtmlTags,
    "speakers" -> removeSpeakerLabels,
    "dialogPunct" -> removeDialogPunctuation,
    "newlines" -> removeNewlines,
    "nonAlpha" -> removeNonAlphabetic,
    "fillers" -> removeFillerWords,
    "lowercase" -> lowercaseText,
    "normalizeWs" -> normalizeWhitespace)

  test("every cleaner is idempotent at its pipeline position (SURVEY §5.3)") {
    // Idempotence is asserted on each step's ACTUAL pipeline input (the
    // output of the preceding steps): e.g. the speaker-label remover is
    // not idempotent on raw timestamp lines ("00:01:..." loses one "NN:"
    // prefix per pass — the reference tool behaves identically), but the
    // pipeline always strips timestamps first.
    cleaners.foldLeft(sample) { case (input, (name, f)) =>
      val once = evalStr(f(lit(input)))
      val twice = evalStr(f(lit(once)))
      assert(twice == once, s"cleaner $name not idempotent on pipeline input")
      once
    }
  }

  test("composed pipeline produces pure lowercase word text") {
    val out = evalStr(cleanSubtitles(lit(sample)))
    assert(out.matches("[a-z ]+"), s"unexpected chars in: $out")
    assert(!out.contains("applause") && !out.contains("music"),
      "bracketed content survived")
    Seq("um", "uh", "gonna", "okay").foreach(w =>
      assert(!out.split(" ").contains(w), s"filler '$w' survived"))
    assert(out.contains("hello there"), "real dialog was lost")
  }

  test("title/year split with 1800 fallback (scraper.py:85-88)") {
    assert(evalStr(titleOf(lit("The Matrix (1999)"))) == "The Matrix")
    assert(evalStr(yearOf(lit("The Matrix (1999)"))) == "1999")
    assert(evalStr(titleOf(lit("Unknown Movie"))) == "Unknown Movie")
    assert(evalStr(yearOf(lit("Unknown Movie"))) == "1800")
    // year must be exactly 4 digits and terminal
    assert(evalStr(yearOf(lit("Blade Runner (10191)"))) == "1800")
  }

  test("slug swap round-trips") {
    assert(evalStr(slug(lit("a b c"))) == "a_b_c")
    assert(evalStr(unslug(slug(lit("a b c")))) == "a b c")
  }

  test("word count and name validation (clustering/utils.py:36-57)") {
    assert(evalStr(wordCount(lit("  one  two  three ")).cast("string")) == "3")
    assert(evalStr(validName(lit("a b c d")).cast("string")) == "true")
    assert(evalStr(validName(lit("a b c d e")).cast("string")) == "false")
    assert(evalStr(validName(lit("   ")).cast("string")) == "false")
  }
}
