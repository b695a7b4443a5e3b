package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis for large-scale training-data pipelines: tokenization,
  * language-ID heuristics, quality scoring, and document fingerprinting.
  *
  * Every operator is a pure column expression — partition-local, codegen'd,
  * zero shuffle — so the 100 TB path is a single scan. Hashes are derived
  * from md5 (identical in Spark and DuckDB) rather than engine-specific
  * hash functions, so every operator is oracle-checkable.
  */
object TextOps {

  /** Whitespace tokenizer (training-data pipelines normalize further
    * upstream; the corpus here is single-space word salad). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Portable 60-bit hash: first 15 hex digits of md5, as a long.
    * DuckDB equivalent: ('0x' || substr(md5(x),1,15))::UBIGINT. */
  def hash64(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** BPE-ish token count: runs of letters, single digits, or single
    * non-space symbols (the shape of byte-pair pretokenizers). Semantics
    * = `regexp_count(text, '[a-z]+|[A-Z]+|[0-9]|[^A-Za-z0-9\s]')`, but
    * evaluated by the codegen'd [[graft.expressions.TokenCount]] state
    * machine (~2× regexp_count on the hot text path; equivalence pinned
    * by a property test in TokenCountSpec). */
  def regexTokenCount(text: Column): Column =
    graft.expressions.TokenCount.token_count(text)

  /** Max multiplicity of any element of a SORTED string array, as a
    * single partition-local fold with a (prev, run, best) struct
    * accumulator — equal elements are adjacent after the sort, so the
    * longest equal-run IS the highest count. No explode, no (row, elem)
    * shuffle: the Gopher top-n-gram repetition rule stays inside the
    * scan projection. Empty array → 0. */
  def maxMultiplicity(sorted: Column): Column = {
    val init = struct(lit("").as("prev"), lit(0L).as("run"),
      lit(0L).as("best"))
    aggregate(sorted, init,
      (st, x) => {
        val run = when(x === st.getField("prev"),
          st.getField("run") + lit(1L)).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(st.getField("best"), run).as("best"))
      },
      st => st.getField("best"))
  }

  /** Language-ID stopword table. The harness corpus shares one English
    * vocabulary across all `lang` labels, so accuracy against the label is
    * meaningless — the operator contract is the deterministic scoring
    * itself (argmax with first-wins tie-break). */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "es" -> Seq("el", "la", "de", "y"),
    "de" -> Seq("der", "die", "und"),
    "fr" -> Seq("le", "les", "et"),
    "zh" -> Seq("的", "是", "了"))

  /** Per-language stopword-occurrence scores over a token array. */
  def langScores(toks: Column): Seq[Column] =
    langStopwords.map { case (_, ws) =>
      size(filter(toks, t => ws.map(w => t === w).reduce(_ || _)))
    }

  /** Predicted language: argmax score, ties broken by table order. */
  def langId(toks: Column): Column = {
    val scores = array(langScores(toks): _*)
    val names = array(langStopwords.map(p => lit(p._1)): _*)
    get(names, (array_position(scores, array_max(scores)) - 1).cast("int"))
  }

  /** Quality-score components + a weighted composite in [0,1]-ish range.
    * All arithmetic is IEEE double ops that both engines execute
    * identically (no libm). */
  def qualityComponents(text: Column): Map[String, Column] = {
    val toks = tokens(text)
    val n = size(toks).cast("double")
    val sumLen = aggregate(transform(toks, (t: Column) => length(t)),
      lit(0), (a: Column, x: Column) => a + x).cast("double")
    val stops = size(filter(toks,
      t => Seq("the", "a", "of", "and").map(t === _).reduce(_ || _))).cast("double")
    Map(
      "n_tokens" -> size(toks).cast("long"),
      "avg_token_len" -> sumLen / n,
      "stopword_ratio" -> stops / n,
      "punct_ratio" -> regexp_count(text, lit("[.,;:!?]")).cast("double") / length(text),
      "upper_ratio" -> regexp_count(text, lit("[A-Z]")).cast("double") / length(text))
  }

  def qualityScore(text: Column): Column = {
    val c = qualityComponents(text)
    least(lit(1.0), c("n_tokens").cast("double") / 100.0) * 0.4 +
      c("stopword_ratio") * 0.3 +
      (lit(1.0) - c("punct_ratio")) * 0.2 +
      (lit(1.0) - c("upper_ratio")) * 0.1
  }

  /** Rolling polynomial fingerprint over characters:
    * acc = (acc * 31 + code) mod M, sequential left fold — exact integer
    * arithmetic, identical in any engine. M < 1e15 keeps acc*31+255 far
    * from Long overflow. */
  val RollMod = 999999999999989L
  def rollingHash(text: Column): Column = {
    val chars = filter(split(text, ""), c => c =!= "")
    val codes = transform(chars, c => ascii(c).cast("long"))
    aggregate(codes, lit(0L), (a: Column, x: Column) => (a * 31 + x) % RollMod)
  }

  /** Bag-of-words fingerprint: md5 of the sorted distinct token set —
    * invariant to token order and multiplicity (the near-dup family's
    * exact-key baseline). */
  def bowFingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(text))), " "))

  /** Winnowing fingerprint set (Schleimer, Wilkerson, Aiken — SIGMOD'03,
    * the MOSS algorithm): the distinct minima of a sliding window of `w`
    * consecutive hashes from a positional hash sequence. Guarantee: two
    * documents sharing a run of >= w+k-1 tokens (k = shingle size of the
    * hash sequence) share at least one fingerprint; expected density is
    * ~2/(w+1) of the input hashes. Pure column expression, no shuffle. */
  def winnow(hs: Column, w: Int): Column =
    array_distinct(
      when(size(hs) >= w,
        transform(sequence(lit(0), size(hs) - w),
          i => array_min(slice(hs, i + 1, lit(w)))))
        .otherwise(array().cast("array<bigint>")))
}
