package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-text curation transforms beyond dedup/similarity: PII scrubbing and
  * repetition-based quality signals (the Gopher/FineWeb-style filter
  * family). Everything here is BUILT-IN Spark functions — regexp/array
  * HOFs, fully codegen'd, no UDFs and no custom expressions — so the whole
  * stage stays inside WholeStageCodegen and needs zero shuffles (per-row
  * narrow maps over the scan).
  */
object Curation {

  /** Conservative PII patterns chosen to mean the same thing in Java regex
    * (Spark) and RE2 (DuckDB oracle): email, dotted-quad IP, 16-digit card
    * number. Replacement order is part of the contract (email first, so an
    * address containing digits can't be half-rewritten by later passes).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val Card16Re = "\\b\\d{16}\\b"

  /** Redacted text column. */
  def scrubText(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      Card16Re, "<CARD>")

  /** Input + `text_scrubbed` + per-kind redaction counts. Counts are taken
    * BEFORE redaction (regexp_count over the original text), so
    * `n_email + n_ip + n_card == 0` identifies clean rows without a string
    * compare against the scrubbed text.
    */
  def scrubPii(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_email", regexp_count(t, lit(EmailRe)))
      .withColumn("n_ip", regexp_count(t, lit(Ipv4Re)))
      .withColumn("n_card", regexp_count(t, lit(Card16Re)))
      .withColumn("text_scrubbed", scrubText(t))
  }

  /** Repetition/shape signals over one document (Gopher-rule family):
    *
    *  - n_words, n_distinct_words, dup_word_frac = 1 - distinct/words
    *  - mean_word_len (exact: integer char sum / word count, both cast)
    *  - n_lines, dup_line_frac (lines split on \n)
    *
    * Words are non-empty runs split on whitespace (`\s+`, the Gopher-rule
    * convention; a tokenizer-grade splitter is
    * [[graft.functions.token_count]]). Fractions are exact int/int double
    * divisions — oracle-stable.
    */
  def repetitionStats(df: DataFrame, textCol: String): DataFrame = {
    val words = filter(split(col(textCol), "\\s+"), w => w =!= "")
    val lines = filter(split(col(textCol), "\n"), l => l =!= "")
    val nw = size(words).cast("long")
    val nl = size(lines).cast("long")
    df.withColumn("n_words", nw)
      .withColumn("n_distinct_words", size(array_distinct(words)).cast("long"))
      .withColumn("dup_word_frac",
        when(nw > 0, lit(1.0) - col("n_distinct_words").cast("double") / nw.cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("mean_word_len",
        when(nw > 0,
          aggregate(words, lit(0L), (acc, w) => acc + length(w)).cast("double") / nw.cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("n_lines", nl)
      .withColumn("dup_line_frac",
        when(nl > 0, lit(1.0) - size(array_distinct(lines)).cast("double") / nl.cast("double"))
          .otherwise(lit(0.0)))
  }
}
