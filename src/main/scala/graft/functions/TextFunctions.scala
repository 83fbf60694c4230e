package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives shared by the wordcount/grep/text-analysis/dedup
  * operators. All are built from codegen'd `functions._` builtins —
  * no UDFs — so they stay inside WholeStageCodegen and their results
  * are bit-identical to the DuckDB oracle formulas in
  * [[graft.SparkEntry.oracleSql]] (same md5, same regex classes,
  * same IEEE evaluation order).
  *
  * Reference semantics: Hadoop 2.10.0
  * `examples/WordCount.java` (StringTokenizer split),
  * `examples/Grep.java` (RegexMapper + LongSumReducer),
  * `lib/aggregate/ValueHistogram.java`.
  */
object TextFunctions {

  /** Lowercase alnum tokens, empty strings removed.
    * Mirrors WordCount's StringTokenizer, normalized to a portable
    * `[^a-z0-9]+` split so the oracle can reproduce it exactly. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  /** Character k-shingles (all k-length substrings, step 1).
    * For a 100 TB corpus this explodes ~len(text) rows per doc — the
    * dedup pipeline keeps them inside `transform` (array-local, no
    * shuffle) and only shuffles the fixed-size minhash signature. */
  def shingles(text: Column, k: Int): Column =
    transform(
      sequence(lit(1), greatest(lit(1), length(text) - (k - 1))),
      i => substring(text, i, lit(k)))

  /** One MinHash value: min over shingles of md5(salt || shingle).
    * md5 is identical in Spark and DuckDB, so the whole signature is
    * oracle-checkable. Lexicographic min over hex == min over the
    * 128-bit hash value. */
  def minhash(text: Column, k: Int, salt: Int): Column =
    array_min(transform(
      sequence(lit(1), greatest(lit(1), length(text) - (k - 1))),
      i => md5(concat(lit(salt.toString + "|"), substring(text, i, lit(k))))))

  /** Number of (non-overlapping) occurrences of literal `marker`. */
  def occurrences(text: Column, marker: String): Column =
    ((length(text) - length(replace(text, lit(marker), lit("")))) /
      marker.length).cast("int")

  /** Distinct character trigrams of the lowercased text. */
  def trigramSet(text: Column): Column =
    array_distinct(shingles(lower(text), 3))

  /** BPE-ish token count: letter runs, digit runs, single punct. */
  val bpeTokenPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(bpeTokenPattern), lit(0)))

  /** Marker words per language for the deterministic language-ID
    * heuristic (n-gram/stopword scoring). Scores are occurrence
    * counts of ` marker ` in the padded lowercased text; argmax with
    * a fixed tie-break order (en,de,fr,es,zh). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of"),
    "de" -> Seq("der", "und", "die", "ist"),
    "fr" -> Seq("le", "la", "et", "est"),
    "es" -> Seq("el", "los", "que", "de"),
    "zh" -> Seq("de", "le", "shi", "zai"))

  def langScore(text: Column, markers: Seq[String]): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    markers.map(m => occurrences(padded, s" $m ")).reduce(_ + _)
  }
}
