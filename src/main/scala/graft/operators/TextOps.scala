package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines:
 * tokenization, quality scoring, language heuristics, fingerprinting.
 * All pure built-in expressions — whole-stage codegen'd, no UDFs, so the
 * hot path scales linearly over a 100 TB document corpus.
 */
object TextOps {

  /** Non-empty whitespace-delimited words. */
  def words(text: Column): Column =
    filter(split(text, "\\s+"), w => w =!= "")

  /** Whitespace token count — served by the [[TextStats]] kernel
    * (word boundaries are whitespace, which lowercasing preserves, so
    * the kernel's lowered-text word count is the raw-text word count;
    * where a projection also computes quality/lang the kernel runs
    * ONCE for all of them via subexpression elimination). */
  def tokenCount(text: Column): Column = element_at(TextStats(text), 2)

  /** Pre-kernel formulation (equivalence-test reference). */
  private[graft] def tokenCountReference(text: Column): Column =
    size(words(text)).cast("long")

  /**
   * BPE-ish subword token estimate: runs of letters, runs of digits, and
   * single punctuation marks each count as one token — the standard cheap
   * proxy for byte-pair-encoded token counts. Served by the
   * [[TextStats]] kernel's state walk (value-identical to the regex
   * count, equivalence-tested).
   */
  def subwordCount(text: Column): Column = element_at(TextStats(text), 8)

  /** Pre-kernel formulation (equivalence-test reference). */
  private[graft] def subwordCountReference(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")).cast("long")

  private val Stopwords = Seq("the", "a", "an", "of", "to", "and", "in", "is", "on", "for")

  /** Fraction of words that are (lowercased) stopwords. */
  def stopwordRatio(text: Column): Column = {
    val w = words(lower(text))
    val stops = filter(w, x => x.isin(Stopwords: _*))
    when(size(w) === 0, 0.0).otherwise(size(stops).cast("double") / size(w).cast("double"))
  }

  /** Mean word length in characters. */
  def meanWordLen(text: Column): Column = {
    val w = words(text)
    when(size(w) === 0, 0.0).otherwise(
      aggregate(w, lit(0L), (acc, x) => acc + length(x)).cast("double") / size(w).cast("double"))
  }

  /** Fraction of non-alphanumeric, non-space characters. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      (length(text) - length(regexp_replace(text, "[^A-Za-z0-9\\s]", ""))).cast("double")
        / length(text).cast("double"))

  /**
   * Composite quality score in integer milli-points [0,1000]: long-enough
   * docs with natural stopword density and low punctuation noise score
   * high. Computed entirely in integer arithmetic (floor division) so the
   * score is bit-exact across engines and runs — important when the score
   * gates corpus membership and reruns must be reproducible.
   * 400·min(len,500)/500 + 300·min(5·stops,words)/words + 300·max(len−5·punct,0)/len.
   */
  def qualityScore(text: Column): Column = {
    // counts from the one-pass TextStats kernel (the interpreted-HOF
    // formulation below is value-identical and kept as the reference
    // for the equivalence test)
    val st = TextStats(text)
    scoreFromCounts(element_at(st, 1).cast("long"), element_at(st, 2).cast("long"),
      element_at(st, 3).cast("long"), element_at(st, 4).cast("long"))
  }

  /** The score arithmetic on explicit counts — shared by the kernel
    * path and the reference formulation. */
  private def scoreFromCounts(len: Column, nWords: Column, nStops: Column,
                              nPunct: Column): Column = {
    def idiv(a: Column, b: Column): Column = (a.cast("double") / b.cast("double")).cast("long")
    val lenScore = idiv(lit(400L) * least(len, lit(500L)), lit(500L))
    val stopScore = when(nWords === 0, 0L).otherwise(idiv(lit(300L) * least(nStops * 5L, nWords), nWords))
    val punctScore = when(len === 0, 0L).otherwise(idiv(lit(300L) * greatest(len - nPunct * 5L, lit(0L)), len))
    lenScore + stopScore + punctScore
  }

  /** The pre-kernel expression formulation of [[qualityScore]] — the
    * oracle-shaped reference the equivalence test pins the kernel to. */
  private[graft] def qualityScoreReference(text: Column): Column = {
    val len = length(text).cast("long")
    val w = words(lower(text))
    val nWords = size(w).cast("long")
    val nStops = size(filter(w, x => x.isin(Stopwords: _*))).cast("long")
    val nPunct = (length(text) - length(regexp_replace(text, "[^A-Za-z0-9\\s]", ""))).cast("long")
    scoreFromCounts(len, nWords, nStops, nPunct)
  }

  /**
   * Marker-word language heuristic: scores per-language stopword hits.
   * A real deployment would swap in trained n-gram profiles; the operator
   * shape (single projection, no shuffle) is what matters at scale.
   */
  def langGuess(text: Column): Column = {
    // marker hits from the TextStats kernel — one text walk serves
    // qualityScore AND langGuess in the same projection (CSE)
    val st = TextStats(text)
    langFromHits(element_at(st, 5), element_at(st, 6), element_at(st, 7))
  }

  private def langFromHits(en: Column, de: Column, es: Column): Column =
    when(de > en && de > es, "de").when(es > en && es >= de, "es")
      .when(en > 0, "en").otherwise("unknown")

  /** Pre-kernel expression formulation of [[langGuess]] (equivalence
    * test reference). */
  private[graft] def langGuessReference(text: Column): Column = {
    def hits(markers: Seq[String]): Column = {
      val w = words(lower(text))
      size(filter(w, x => x.isin(markers: _*)))
    }
    langFromHits(hits(Seq("the", "and", "of", "to", "is")),
      hits(Seq("der", "die", "das", "und", "ist")),
      hits(Seq("el", "la", "los", "de", "es")))
  }

  /**
   * Document fingerprint: md5 over whitespace-normalized lowercase text.
   * Stable under reflow/case changes — the cheap first-stage key for
   * exact-dup clustering before any pairwise work.
   */
  def fingerprint(text: Column): Column =
    FastHash.fastMd5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /**
   * Document chunking: split each doc into fixed-token windows with
   * overlap — context-window preparation for training. One projection +
   * one explode, no shuffle; chunk starts stride by chunkTokens-overlap
   * and the last window may run short. A wordless doc yields one empty
   * chunk (the doc stays representable downstream).
   * Output: input id + (chunk_no, start_token, n_tokens, chunk_text).
   */
  def chunkDocuments(docs: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
                     chunkTokens: Int, overlap: Int): org.apache.spark.sql.DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens, "need 0 <= overlap < chunkTokens")
    val stride = chunkTokens - overlap
    docs
      .select(col(idCol).as("id"), words(col(textCol)).as("w"))
      .select(col("id"), col("w"),
        explode(sequence(lit(1), greatest(size(col("w")) - overlap, lit(1)), lit(stride)))
          .as("start"))
      .select(
        col("id"),
        (((col("start") - 1) / stride) + 1).cast("long").as("chunk_no"),
        col("start").cast("long").as("start_token"),
        least(lit(chunkTokens), size(col("w")) - col("start") + 1)
          .cast("long").as("n_tokens"),
        array_join(slice(col("w"), col("start"), lit(chunkTokens)), " ").as("chunk_text"))
  }

  /**
   * PII redaction: emails, IPv4 addresses, and phone-shaped digit runs
   * replaced by type tags — the standard scrub step before corpus text
   * reaches a training run. A pure codegen'd regexp_replace chain (no
   * UDF, no shuffle). ORDER MATTERS: emails first (they contain digits
   * and dots), then IPs (a bare IP also matches the looser phone
   * shape), then phones over what remains. The patterns avoid
   * backtracking AND `\b` (RE2's default mode rejects word boundaries),
   * so RE2-based engines reproduce them byte-identically.
   */
  def redact(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val ip = regexp_replace(email,
      "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}", "<IP>")
    regexp_replace(ip, "\\+?\\d[\\d\\s().-]{7,}\\d", "<PHONE>")
  }

  /**
   * PII audit — the COUNTING sibling of [[redact]]: how much PII does
   * each document carry, per category, BEFORE deciding to scrub or
   * drop. Policy pipelines need the audit separately from the scrub
   * (drop docs past a threshold, scrub the rest, report totals).
   *
   * Counts use the SAME patterns and the same sequential semantics as
   * [[redact]] (emails counted on the raw text; IPs counted after
   * emails are masked, so a dotted quad inside an email is an email,
   * not an IP; phones counted after both) — the audit numbers are
   * exactly the replacement counts a redact pass would perform, and a
   * DuckDB oracle replays them with the same nested
   * regexp_replace/extract_all chain. Pure codegen projection (one
   * pass, no shuffle, no UDF).
   * Output: (id, n_emails, n_ips, n_phones, n_pii).
   */
  def piiAudit(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val text = col(textCol)
    val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ipPat = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"
    val phonePat = "\\+?\\d[\\d\\s().-]{7,}\\d"
    val afterEmail = regexp_replace(text, emailPat, "<EMAIL>")
    val afterIp = regexp_replace(afterEmail, ipPat, "<IP>")
    docs.select(col(idCol).as("id"),
        size(regexp_extract_all(text, lit(emailPat), lit(0))).cast("long").as("n_emails"),
        size(regexp_extract_all(afterEmail, lit(ipPat), lit(0))).cast("long").as("n_ips"),
        size(regexp_extract_all(afterIp, lit(phonePat), lit(0))).cast("long").as("n_phones"))
      .withColumn("n_pii", col("n_emails") + col("n_ips") + col("n_phones"))
  }

  /**
   * Tokenizer fertility audit per group (typically language): how many
   * characters and BPE-ish subwords each whitespace word costs — the
   * number that decides whether a tokenizer (or its vocab budget) is
   * fair across languages: high subwords-per-word means the group pays
   * more sequence length (and compute) per unit of text. Integer ppm
   * ratios via integral division, one groupBy with map-side partial
   * sums — the whole audit is one scan.
   * Output: (group, n_docs, chars, words, subwords, chars_per_word_ppm,
   * subwords_per_word_ppm); a group with zero words reports 0 ratios.
   */
  def fertilityAudit(docs: DataFrame, groupCol: String, textCol: String): DataFrame =
    docs
      .groupBy(col(groupCol).cast("string").as("group"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col(textCol)).cast("long")).as("chars"),
        sum(tokenCount(col(textCol))).as("words"),
        sum(subwordCount(col(textCol))).as("subwords"))
      .select(col("group"), col("n_docs"), col("chars"), col("words"), col("subwords"),
        when(col("words") > 0,
          IntDiv(col("chars") * 1000000L, col("words")).cast("long")).otherwise(0L)
          .as("chars_per_word_ppm"),
        when(col("words") > 0,
          IntDiv(col("subwords") * 1000000L, col("words")).cast("long")).otherwise(0L)
          .as("subwords_per_word_ppm"))

  /**
   * Zipf-shape audit in EXACT integers: the decade ratios of the
   * corpus unigram distribution — count(rank 1)/count(rank 10) and
   * count(rank 10)/count(rank 100) in ppm. A healthy natural-language
   * corpus follows Zipf's law (count ∝ 1/rank, so each decade ratio ≈
   * 10·10⁶ ppm); machine-generated or template-heavy corpora flatten
   * (ratios → 10⁶) and boilerplate-dominated ones steepen. The usual
   * log-log regression slope needs floating logs whose last-ulp
   * behavior differs across engines; the decade ratios carry the same
   * diagnostic and are integral-division exact, so the oracle replays
   * them bit-for-bit. Ranks tie-break by word ascending (count desc,
   * word asc — deterministic on any engine).
   *
   * Scale: one word-count aggregate, one global top-100 (tiny
   * TakeOrdered), ratios on the driver-sized result. Output: one row
   * (n_words, n_distinct, c1, c10, c100, r1_10_ppm, r10_100_ppm);
   * corpora with <100 distinct words report 0 for the missing ranks
   * and their ratios.
   */
  def zipfDecades(docs: DataFrame, textCol: String): DataFrame = {
    val counts = docs
      .select(explode(words(col(textCol))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("c"))
    val totals = counts.agg(sum(col("c")).as("n_words"),
      count(lit(1)).as("n_distinct"))
    // global top-100 (TakeOrderedAndProject); the rank window then
    // runs over 100 rows — the single-partition window is model-sized
    val top = counts.orderBy(col("c").desc, col("word").asc).limit(100)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("c").desc, col("word").asc)))
    def at(r: Int): Column =
      coalesce(max(when(col("rank") === r, col("c"))), lit(0L))
    val ranks = top.agg(at(1).as("c1"), at(10).as("c10"), at(100).as("c100"))
    totals.crossJoin(broadcast(ranks))
      .select(col("n_words"), col("n_distinct"), col("c1"), col("c10"), col("c100"),
        when(col("c10") > 0, IntDiv(col("c1") * 1000000L, col("c10")).cast("long"))
          .otherwise(0L).as("r1_10_ppm"),
        when(col("c100") > 0, IntDiv(col("c10") * 1000000L, col("c100")).cast("long"))
          .otherwise(0L).as("r10_100_ppm"))
  }

  /**
   * Line-level deduplication across the corpus (the CCNet scrub step):
   * a line whose normalized key (lowercased, trimmed) appears in more
   * than `maxDocFreq` distinct documents is removed from EVERY document
   * — boilerplate headers, navigation chrome, license footers. Blank
   * lines are structural and always kept (and never counted).
   *
   * Scale shape: one explode, one groupBy on the 8-byte line-key hash
   * (map-side partial distinct — never the line strings; collision odds
   * are ~|lines|²/2⁶⁵, immaterial for boilerplate removal), one
   * anti-join of the line stream against the hot set (AQE broadcasts
   * it when it is small, which boilerplate sets are), one groupBy(id)
   * to reassemble. No step materializes more than the line relation.
   *
   * Output: (id, n_lines, kept_lines, clean_text) for every input doc
   * — a doc whose every line was boilerplate survives with
   * kept_lines=0 and empty clean_text.
   */
  def dedupLines(docs: DataFrame, idCol: String, textCol: String,
                 maxDocFreq: Long = 1L): DataFrame = {
    val hot = lineKeys(docs, idCol, textCol)
      .groupBy("kh").agg(countDistinct(col("id")).as("df"))
      .filter(col("df") > maxDocFreq)
      .select("kh")
    scrubLines(docs, idCol, textCol, hot)
  }

  /** Distinct (id, kh) of every non-blank normalized line key — the
    * relation both the batch [[dedupLines]] and a streaming incremental
    * line-frequency table aggregate over. */
  def lineKeys(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
        explode(split(col(textCol), "\n")).as("line"))
      .withColumn("key", lower(trim(col("line"))))
      .filter(col("key") =!= "")
      .select(col("id"), xxhash64(col("key")).as("kh"))
      .distinct()

  /**
   * Remove every line whose normalized key hash is in `hotKh` (one
   * column `kh`) from every document — the scrub half of
   * [[dedupLines]], reusable against an EXTERNALLY accumulated hot set
   * (e.g. a streaming line-frequency table). Blank lines are never in
   * a hot set (hot sets derive from non-blank keys) and so survive.
   * Output: (id, n_lines, kept_lines, clean_text) for every input doc.
   */
  def scrubLines(docs: DataFrame, idCol: String, textCol: String,
                 hotKh: DataFrame): DataFrame = {
    val lines = docs.select(col(idCol).as("id"),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .withColumn("key", lower(trim(col("line"))))
    val kept = lines.join(hotKh.select("kh"),
      xxhash64(col("key")) === col("kh"), "left_anti")
    val perDoc = kept.groupBy("id").agg(
      count(lit(1)).as("kept_lines"),
      array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          s => s.getField("line")), "\n").as("clean_text"))
    docs.select(col(idCol).as("id"),
        size(split(col(textCol), "\n")).cast("long").as("n_lines"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id"), col("n_lines"),
        coalesce(col("kept_lines"), lit(0L)).as("kept_lines"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Longest run in the sorted array = the mode's occurrence count. */
  private def modeCount(arr: Column): Column =
    aggregate(array_sort(arr),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1L).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"), greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  // <= 0: the bigram denominator is n_words-1, which is NEGATIVE for a
  // wordless doc — 0/-1 would produce -0.0, which engines stringify apart
  private def frac(num: Column, den: Column): Column =
    when(den <= 0L, 0.0).otherwise(round(num.cast("double") / den.cast("double"), 4))

  /** Fraction of (lowercased) words that repeat an earlier word. */
  def dupWordFrac(text: Column): Column = {
    val w = words(lower(text))
    frac(size(w).cast("long") - size(array_distinct(w)).cast("long"), size(w).cast("long"))
  }

  /** The most frequent (lowercased) word's share of all words. */
  def topWordFrac(text: Column): Column = {
    val w = words(lower(text))
    frac(modeCount(w), size(w).cast("long"))
  }

  /** The most frequent word 2-gram's share of all 2-grams. */
  def topBigramFrac(text: Column): Column = {
    val w = words(lower(text))
    val bigrams = when(size(w) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(w) - 1),
        i => concat(element_at(w, i), lit(" "), element_at(w, i + 1))))
    frac(modeCount(bigrams), size(w).cast("long") - 1L)
  }

  /** Fraction of `\n` lines that repeat an earlier line (byte-exact). */
  def dupLineFrac(text: Column): Column = {
    val lines = split(text, "\n")
    frac(size(lines).cast("long") - size(array_distinct(lines)).cast("long"),
      size(lines).cast("long"))
  }

  /**
   * Repetition signals (the Gopher quality-filter family): how much of
   * a document is the same content said again. One [[RepetitionStats]]
   * kernel pass per row supplies the exact integers (the per-column
   * formulations above are value-identical — equivalence-tested — but
   * interpreted and re-tokenizing per signal); all ratios are
   * exact-integer divisions rounded to 4 places so every engine
   * reproduces them bit-for-bit. A projection — no shuffle.
   *
   * Output columns: n_words, dup_word_frac ((n-distinct)/n),
   * top_word_frac (mode count / n), top_bigram_frac (bigram mode
   * count / (n-1)), dup_line_frac over `\n` lines ((lines-distinct)/lines).
   */
  def repetitionSignals(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val st = RepetitionStats(col(textCol))
    def f(i: Int) = element_at(st, i)
    docs.select(
      col(idCol).as("id"),
      f(1).as("n_words"),
      frac(f(1) - f(2), f(1)).as("dup_word_frac"),
      frac(f(3), f(1)).as("top_word_frac"),
      frac(f(4), f(1) - 1L).as("top_bigram_frac"),
      frac(f(5) - f(6), f(5)).as("dup_line_frac"))
  }

  /**
   * Corpus vocabulary: the `topK` most frequent (lowercased,
   * whitespace-delimited) tokens with their global counts and rank.
   * One explode + one groupBy with map-side combine — the wordcount
   * shape, which is exactly how BPE tokenizer training starts. The
   * rank window runs AFTER the limit, over topK rows, so no global
   * single-task sort ever sees the full vocabulary.
   */
  def vocabulary(docs: DataFrame, textCol: String, topK: Int): DataFrame = {
    val win = org.apache.spark.sql.expressions.Window
      .orderBy(col("freq").desc, col("token").asc)
    docs.select(explode(words(lower(col(textCol)))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token").asc)
      .limit(topK)
      .withColumn("rank", row_number().over(win).cast("long"))
      .select(col("rank"), col("token"), col("freq"))
  }

  /**
   * word2vec-style negative-sampling table: the top-K vocabulary with
   * sampling weights ∝ freq^(3/4) (Mikolov 2013's smoothing — raw
   * unigram over-samples stopwords, uniform over-samples typos) and
   * each token's share of the table in ppm. The ¾ power runs as a
   * fixed floor(sqrt(floor(sqrt(freq·1e12))·freq)) chain: sqrt is
   * IEEE-correctly-rounded on both engines and the floors pin every
   * intermediate, so identical inputs give identical milli weights —
   * no libm pow in the contract (the α=1/2 temperatureShares
   * precedent, one power higher).
   *
   * Scale: one wordcount aggregate (map-side combined), a top-K
   * TakeOrdered, then weights/shares over the K-row frame. The table
   * is model-sized by construction — it exists to be broadcast into
   * a sampler.
   */
  def negativeSamplingTable(docs: DataFrame, textCol: String, topK: Int): DataFrame = {
    require(topK >= 1)
    val win = org.apache.spark.sql.expressions.Window
      .orderBy(col("freq").desc, col("token").asc)
    val total = org.apache.spark.sql.expressions.Window.partitionBy()
    docs.select(explode(words(lower(col(textCol)))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token").asc)
      .limit(topK)
      .withColumn("rank", row_number().over(win).cast("long"))
      .withColumn("w_milli",
        floor(sqrt(floor(sqrt(col("freq").cast("double") * lit(1.0e12)))
          * col("freq").cast("double"))).cast("long"))
      .withColumn("sample_ppm",
        IntDiv(col("w_milli") * 1000000L, sum(col("w_milli")).over(total)))
      .select(col("rank"), col("token"), col("freq"), col("w_milli"), col("sample_ppm"))
  }

  /**
   * Winnowing document fingerprints (Schleimer–Wilkerson–Aiken 2003,
   * the MOSS algorithm): char k-gram hashes over the
   * whitespace-normalized lowered text, then the minimum hash of every
   * `window`-gram sliding window, distinct — a GUARANTEED-density
   * local fingerprint (any shared substring of length ≥ k+window−1
   * yields a shared fingerprint) where minhash gives only probabilistic
   * coverage. Returns the exploded (id, fp) frame for downstream
   * joins; ties inside a window resolve by VALUE (the set-of-distinct
   * form makes the paper's rightmost-position rule immaterial).
   *
   * Scale: one pass over the text bytes inside one projection — the
   * fused [[Shingles.winnowFps]] kernel (char-walked k-gram
   * md5Head60s, sliding minima, distinct; zero per-gram allocations —
   * the column formulation it replaced allocated two strings per text
   * POSITION and cost 38.5 s at sf0.1 before any shuffle started,
   * OperatorSpec pins the value equivalence) — no shuffle until a
   * consumer aggregates fingerprints; expected density is
   * 2/(window+1) grams, so the exploded frame is a fraction of token
   * volume.
   */
  def winnowFingerprints(docs: DataFrame, idCol: String, textCol: String,
                         k: Int, window: Int): DataFrame = {
    require(k >= 2 && window >= 1)
    val norm = trim(regexp_replace(lower(col(textCol)), "\\s+", " "))
    docs.filter(length(norm) >= k)
      .select(col(idCol).as("id"), explode(WinnowFps(norm, k, window)).as("fp"))
  }

  /**
   * Winnowing-based near-dup candidate pairs: documents sharing at
   * least `minShared` winnow fingerprints, with the shared count —
   * the MOSS similarity detector as a corpus operator. Same
   * grouped-pairs plan as the minhash/jaccard family: one shuffle
   * groups doc ids per fingerprint (df-capped — a boilerplate
   * fingerprint shared by the whole corpus is non-discriminative and
   * would fan out quadratically), pair generation is codegen'd array
   * ops bounded by cap² per group.
   */
  def winnowPairs(docs: DataFrame, idCol: String, textCol: String,
                  k: Int, window: Int, minShared: Long,
                  maxFpDf: Long = 10000L): DataFrame = {
    val fps = winnowFingerprints(docs, idCol, textCol, k, window)
    fps.groupBy("fp").agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")) >= 2 && size(col("ids")) <= maxFpDf)
      .select(explode(DedupOps.orderedPairs("ids")).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
  }

  /**
   * Corpus-frequency rarity signals — the cheap stand-in for language-
   * model perplexity filtering: documents dominated by corpus-rare
   * tokens are OOV-heavy (misspellings, boilerplate IDs, binary junk)
   * and score high on `rare_frac`. All statistics are exact integers
   * (no log-probabilities — libm `ln` is not bit-portable across
   * engines): per word INSTANCE, its global occurrence count, then per
   * doc the rare-instance fraction and the mean frequency in floor'd
   * milli units.
   *
   * Scale shape: one wordcount aggregation builds the frequency table,
   * one shuffle join scores the instances against it (AQE broadcasts
   * the table when the vocabulary is small), one groupBy(id) folds per
   * doc. Wordless docs survive with zero counts.
   * Output: (id, n_words, rare_words, rare_frac, mean_freq_milli).
   */
  def rarityStats(docs: DataFrame, idCol: String, textCol: String,
                  rareBelow: Long): DataFrame = {
    val inst = docs.select(col(idCol).as("id"),
      explode(words(lower(col(textCol)))).as("token"))
    val freq = inst.groupBy("token").agg(count(lit(1)).as("freq"))
    val perDoc = inst.join(freq, "token")
      .groupBy("id")
      .agg(count(lit(1)).as("n_words"),
        sum(when(col("freq") < rareBelow, 1L).otherwise(0L)).as("rare_words"),
        sum(col("freq")).as("freq_sum"))
    docs.select(col(idCol).as("id"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("rare_words"), lit(0L)).as("rare_words"),
        when(coalesce(col("n_words"), lit(0L)) === 0L, 0.0)
          .otherwise(round(col("rare_words").cast("double") / col("n_words").cast("double"), 4))
          .as("rare_frac"),
        coalesce(floor(col("freq_sum") * 1000L / col("n_words")), lit(0L))
          .as("mean_freq_milli"))
  }

  /**
   * Unigram-LM negative log-likelihood per document — the CCNet-style
   * perplexity quality signal, with the LM trained on the corpus
   * itself in the same plan (no external model): p(w) = freq(w)/N over
   * all token instances, score = ln N - mean(ln freq) (the mean token
   * NLL in nats; monotone with perplexity = e^score). High scores mark
   * documents dominated by corpus-rare tokens; [[rarityStats]] is the
   * integer-exact stand-in, this is the real log-domain signal.
   *
   * Plan family of [[rarityStats]]: one token-frequency aggregation,
   * one instances⋈freq join keyed on token, one per-doc regroup — the
   * corpus-sized sides only ever shuffle token ids and counts, never
   * text. N rides along as a broadcast 1-row cross join, keeping the
   * whole computation one lazy plan (no driver-side count).
   *
   * Cross-engine float note: ln is evaluated on INTEGER frequencies on
   * both engines and the mean is rounded to 4 decimals, so the libm
   * ulp-level differences between JVM log and DuckDB ln sit ~10 orders
   * of magnitude below the comparison precision.
   */
  def unigramNll(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val inst = docs.select(col(idCol).as("doc_id"),
      explode(words(lower(col(textCol)))).as("token"))
    val freq = inst.groupBy("token").agg(count(lit(1)).as("freq"))
    val tot = inst.agg(count(lit(1)).cast("double").as("n_total"))
    val perDoc = inst.join(freq, "token")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        avg(log(col("freq").cast("double"))).as("mlf"))
    docs.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(round(log(col("n_total")) - col("mlf"), 4), lit(0.0)).as("avg_nll"))
  }

  /**
   * Per-document token-distribution entropy — the standard
   * low-diversity gate (a templated page repeating 20 tokens has
   * H ≈ 4 bits where natural prose of the same length sits near
   * log2(n_tokens); MassiveText/Gopher-style pipelines threshold
   * exactly this signal next to the repetition ratios). Uses the
   * factored form H = log2(n) - (Σ c·log2 c)/n over within-doc token
   * counts c, so the per-token work is one log on an integer count —
   * both engines replay the identical double chain, no p_i division
   * per term. `norm_entropy` = H / log2(distinct) ∈ [0,1] (1 = all
   * tokens equally frequent; single-token and empty docs pin 0)
   * makes the signal length-comparable for thresholding.
   *
   * Plan: one (doc, token) count aggregate (map-side combinable) +
   * one doc-sized aggregate; empty docs survive via the left join.
   */
  def tokenEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = docs.select(col(idCol).as("doc_id"),
        explode(words(lower(col(textCol)))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("c"))
    val log2 = math.log(2.0)
    val perDoc = counts.groupBy("doc_id")
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(col("c").cast("double") * log(col("c").cast("double"))).as("clc"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        (log(col("n_tokens").cast("double")) / lit(log2) -
          col("clc") / col("n_tokens").cast("double") / lit(log2)).as("h"))
    docs.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        coalesce(round(col("h"), 4), lit(0.0)).as("entropy"),
        coalesce(when(col("n_distinct") > 1,
            round(col("h") / (log(col("n_distinct").cast("double")) / lit(log2)), 4))
          .otherwise(lit(0.0)), lit(0.0)).as("norm_entropy"))
  }

  /**
   * Exact heavy hitters: the `n` most frequent tokens per group, ties
   * to the lexicographically smaller token. One token-count
   * aggregation + a per-group top-n window — Spark turns the `rank <=
   * n` filter into a `WindowGroupLimit`, so each partition keeps only
   * n candidates per group before the window shuffle; the full
   * (group, token) count table never sorts globally. That makes exact
   * top-n viable at corpus scale whenever the GROUP fits a partition's
   * candidate budget — the approximate alternative (count-min +
   * heap) only becomes necessary when one group's distinct-token set
   * is itself the bottleneck.
   */
  def topTerms(docs: DataFrame, groupCol: String, textCol: String,
               n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol)
      .orderBy(col("cnt").desc, col("token").asc)
    docs.select(col(groupCol), explode(words(lower(col(textCol)))).as("token"))
      .groupBy(groupCol, "token")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= n)
      .select(col(groupCol), col("rank").cast("long").as("rank"),
        col("token"), col("cnt"))
  }

  /**
   * Per-document top-`n` terms by tf·idf, idf = ln(N_docs / df) with
   * df = documents containing the token. The keyword-extraction
   * primitive (and the classic retrieval weight) over a corpus whose
   * LM-style signal [[unigramNll]] already serves.
   *
   * Ranking keys are `floor(1e6 · tf · ln(N/df))` LONGS — tf, df, N
   * are exact integers on both engines, so the only float op is one
   * `ln` and one multiply, and the 1e-6 quantization swallows last-ulp
   * libm differences (score gaps below 1e-6 only occur for equal
   * (tf, df) pairs, which quantize identically; ties resolve by
   * token). Shape: token-keyed df aggregation joined to per-doc term
   * counts — shuffles carry (id, token, count) rows only — then one
   * per-doc top-n window (WindowGroupLimit).
   */
  def tfidfTop(docs: DataFrame, idCol: String, textCol: String,
               n: Int): DataFrame = {
    val inst = docs.select(col(idCol).as("doc_id"),
      explode(words(lower(col(textCol)))).as("token"))
    val tf = inst.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df_ = inst.groupBy("token")
      .agg(countDistinct("doc_id").as("df"))
    val nDocs = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id")
      .orderBy(col("score_micro").desc, col("token").asc)
    tf.join(df_, "token")
      .crossJoin(broadcast(nDocs))
      .withColumn("score_micro",
        floor(col("tf").cast("double") * log(col("n_docs") / col("df").cast("double"))
          * lit(1.0e6)).cast("long"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= n)
      .select(col("doc_id"), col("rank").cast("long").as("rank"),
        col("token"), col("tf"), col("df"), col("score_micro"))
  }

  /**
   * Corpus bigram collocations by pointwise mutual information:
   * pmi(w1,w2) = ln(p(w1,w2) / (p(w1)·p(w2))) over adjacent-token
   * bigrams, keeping pairs seen >= `minCount` times, top `n` by PMI.
   * The classic collocation/multi-word-expression detector (Church &
   * Hanks 1990) — the signal behind phrase-aware tokenizer vocab.
   *
   * Bigrams come from `arrays_zip` over two shifted `slice`s of the
   * token array (no token self-join: corpus text never shuffles — only
   * (w1, w2) pairs and counts do). NOT a `transform(sequence(...))`
   * lambda: higher-order functions run interpreted (no codegen), and
   * the measured cost was 16.8 s vs 0.45 s for the zip-slice plan on
   * the same sf0.1 corpus — a 37x penalty for the same rows.
   * PMI is evaluated as the left-associated chain
   * `ln(c12) + ln(N1) + ln(N1) - ln(N2) - ln(c1) - ln(c2)` on exact
   * integer counts and quantized to 1e-6 LONGS (same policy as
   * [[tfidfTop]]: identical count tuples quantize identically,
   * sub-1e-6 cross-engine drift cannot reorder).
   */
  /**
   * The published Gopher / MassiveText document-quality rule set
   * (Rae et al. 2021, appendix A.1.1) as per-rule pass flags plus the
   * conjunction — the de-facto standard heuristic filter for web-scale
   * LLM pretraining corpora, kept separate from [[qualityScore]]'s
   * composite score because users filter on the RULES (and tune
   * individual thresholds), not on a blended number. Rules: word count
   * in [50, 100000]; mean word length in [3, 10]; hash and ellipsis
   * symbol-to-word ratios each <= 0.1; <= 90% of lines starting with a
   * bullet; <= 30% of lines ending with an ellipsis; >= 80% of words
   * containing an alphabetic character; >= 2 of the 8 stop words
   * (the, be, to, of, and, that, have, with) present.
   *
   * Every signal comes from the fused [[GopherStats]] kernel — ONE
   * walk over the raw bytes + one over the lowered bytes replaces the
   * ~8 regex scans of the original expression formulation (retained
   * as [[gopherFlagsReference]], equivalence spec-pinned;
   * subexpression elimination collapses the 9 field reads to a single
   * kernel eval per row). Counting semantics are engine-portable
   * (number of \S+ runs, lines as \n-splits, non-overlapping literal
   * occurrences), so the DuckDB oracle replays them with list
   * operations; ratio comparisons perform the identical single
   * int->double division on both engines. The kernel fixes a latent
   * regex inconsistency: Java's (?m) anchors also at \r/U+2028-class
   * terminators, which contradicted n_lines' own \n-split and the
   * oracle — all line counts now agree on \n-splits (spec-pinned with
   * a crafted \r case). Flags are 0/1 LONGs.
   */
  def gopherRules(docs: DataFrame, idCol: String, textCol: String,
                  keep: Seq[Column] = Nil): DataFrame = {
    val flags = gopherFlags(col(textCol))
    docs.select(Seq(
        col(idCol),
        element_at(GopherStats(col(textCol)), 1).as("n_words")) ++
        gopherFlagNames.zip(flags).map { case (n, c) => c.as(n) } ++ keep: _*)
      .withColumn("pass", gopherFlagNames.map(col).reduce(_ * _).cast("long"))
  }

  private[graft] val gopherFlagNames = Seq("r_words", "r_wordlen", "r_symbol",
    "r_bullet", "r_ellipsis", "r_alpha", "r_stop")

  /** The 7 Gopher rule flags (0/1 longs, [[gopherFlagNames]] order)
    * from the fused [[GopherStats]] kernel — [[gopherRules]] names
    * them into its projection; [[gopherPass]] folds them for
    * single-column gates. */
  private[graft] def gopherFlags(t: Column): Seq[Column] = {
    val g = GopherStats(t)
    gopherFlagsFrom(
      element_at(g, 1), element_at(g, 2), element_at(g, 3),
      element_at(g, 4), element_at(g, 5), element_at(g, 6),
      element_at(g, 7), element_at(g, 8).cast("double"), element_at(g, 9))
  }

  /** Pre-kernel regex formulation (equivalence-test reference; Java
    * (?m) semantics — diverges from the kernel only on \r/U+2028-class
    * line terminators, where the kernel matches the oracle). */
  private[graft] def gopherFlagsReference(t: Column): Seq[Column] = {
    val toks = split(lower(t), "\\s+")
    gopherFlagsFrom(
      regexp_count(t, lit("\\S+")).cast("long"),
      length(regexp_replace(t, "\\s", "")).cast("long"),
      regexp_count(t, lit("\\S*[A-Za-z]\\S*")).cast("long"),
      size(split(t, "\n")).cast("long"),
      regexp_count(t, lit("(?m)^[ \\t]*[-*\u2022]")).cast("long"),
      regexp_count(t, lit("(?m)(\\.\\.\\.|\u2026)$")).cast("long"),
      (length(t) - length(replace(t, lit("#"), lit("")))).cast("long"),
      (length(t) - length(replace(t, lit("..."), lit("")))) / lit(3) +
        (length(t) - length(replace(t, lit("\u2026"), lit("")))).cast("long"),
      Seq("the", "be", "to", "of", "and", "that", "have", "with")
        .map(w => array_contains(toks, w).cast("long")).reduce(_ + _))
  }

  private def gopherFlagsFrom(nWords: Column, nChars: Column, alphaWords: Column,
                              nLines: Column, bullets: Column, ellLines: Column,
                              hashes: Column, ells: Column, stopCnt: Column): Seq[Column] = {
    def flag(c: Column): Column = c.cast("long")
    Seq(
      flag(nWords.between(50L, 100000L)),
      flag(nWords > 0 &&
        (nChars.cast("double") / nWords) >= 3.0 &&
        (nChars.cast("double") / nWords) <= 10.0),
      flag(nWords > 0 &&
        (hashes.cast("double") / nWords) <= 0.1 &&
        (ells / nWords) <= 0.1),
      flag((bullets.cast("double") / nLines) <= 0.9),
      flag((ellLines.cast("double") / nLines) <= 0.3),
      flag(nWords > 0 &&
        (alphaWords.cast("double") / nWords) >= 0.8),
      flag(stopCnt >= 2L))
  }

  /** [[gopherRules]]'s `pass` as ONE boolean column — the per-row gate
    * form a streaming admission filter composes (same expressions, so
    * batch and stream admit identically; equality is spec-pinned). */
  def gopherPass(text: Column): Column =
    gopherFlags(text).reduce(_ * _) === 1L

  /**
   * [[c4Rules]]'s page decision as ONE boolean column. The batch
   * operator explodes lines because a corpus-wide audit wants the
   * per-rule counts; a per-row GATE only needs the verdict, so this
   * form runs the line walk inside `filter`/`aggregate` higher-order
   * lambdas. HOFs evaluate interpreted (the [[pmiBigrams]] 37x note)
   * — acceptable here because the gate's domain is a streaming
   * micro-batch or an already-thinned candidate set, not the corpus
   * scan path; batch audits should keep using [[c4Rules]]. Rule-for-
   * rule equality with c4Rules.pass is spec-pinned.
   */
  def c4Pass(text: Column): Column = {
    val kept = filter(split(text, "\n"), l => {
      val le = rtrim(l)
      length(le) > 0 && substring(le, -1, 1).isin(".", "!", "?", "\"") &&
        regexp_count(l, lit("\\S+")) >= 3 && !lower(l).contains("javascript")
    })
    val sentences = aggregate(kept, lit(0L),
      (acc, l) => acc + regexp_count(l, lit("[.!?]")).cast("long"))
    size(kept) > 0 && sentences >= 5L &&
      !lower(text).contains("lorem ipsum") && !text.contains("{")
  }

  /**
   * Per-document n-gram novelty: the fraction of a document's distinct
   * word n-grams (default trigrams) that occur in NO other document —
   * the standard cheap memorization/boilerplate signal (novel docs add
   * information to a training mix; low-novelty docs are template echo
   * even when no single pair crosses a dedup threshold). Emits
   * `(id, n_shingles, n_unique, novelty)` with novelty rounded for
   * display; ranking-grade consumers should use the two exact counts.
   *
   * Same inverted document-frequency shape as [[rarityStats]]/[[
   * tfidfTop]], over the fused [[ShingleHashes]] kernel (per-doc
   * distinct, so df counts documents): one map-side-combined df
   * aggregate, one join of the shingle table against it, one aggregate
   * back to doc rows — everything linear in corpus size, no pairwise
   * work anywhere.
   */
  def noveltyStats(docs: DataFrame, idCol: String, textCol: String,
                   w: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
      explode(ShingleHashes(col(textCol), w)).as("sh"))
    val df = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    sh.join(df, "sh")
      .groupBy("id")
      .agg(count(lit(1)).as("n_shingles"),
        sum((col("df") === 1).cast("long")).as("n_unique"))
      .select(col("id"), col("n_shingles"), col("n_unique"),
        round(col("n_unique").cast("double") / col("n_shingles").cast("double"), 4)
          .as("novelty"))
  }

  def pmiBigrams(docs: DataFrame, textCol: String, minCount: Long,
                 n: Int): DataFrame = {
    val toks = docs.select(words(lower(col(textCol))).as("t"))
    // slice length clamps at 0 so zero/one-token docs explode to nothing
    val bg = toks
      .select(explode(arrays_zip(
        slice(col("t"), lit(1), greatest(size(col("t")) - 1, lit(0))),
        slice(col("t"), lit(2), greatest(size(col("t")) - 1, lit(0))))).as("bg"))
      .select(col("bg.0").as("w1"), col("bg.1").as("w2"))
    val uni = docs.select(explode(words(lower(col(textCol)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val n1 = uni.agg(sum("c").as("n_uni"))
    val pairs = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
    val n2 = bg.agg(count(lit(1)).as("n_bi"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("pmi_micro").desc, col("w1").asc, col("w2").asc)
    // no broadcast hint on the vocab side: it is the unbounded table;
    // the minCount-filtered pairs are the small side and AQE broadcasts
    // them when they fit
    pairs
      .join(uni.withColumnRenamed("w", "w1").withColumnRenamed("c", "c1"), "w1")
      .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("c", "c2"), "w2")
      .crossJoin(broadcast(n1)).crossJoin(broadcast(n2))
      .withColumn("pmi_micro",
        floor((log(col("c12").cast("double")) + log(col("n_uni").cast("double"))
          + log(col("n_uni").cast("double")) - log(col("n_bi").cast("double"))
          - log(col("c1").cast("double")) - log(col("c2").cast("double")))
          * lit(1.0e6)).cast("long"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= n)
      .select(col("rank").cast("long").as("rank"), col("w1"), col("w2"),
        col("c12"), col("c1"), col("c2"), col("pmi_micro"))
  }

  /**
   * Per-group top-fraction selection by quality score: keep the best
   * `permille`/1000 of each group's documents, ranked by
   * (quality DESC, id ASC) — the deterministic integer form of "keep
   * the top 10% per language". The retention test is pure integer
   * arithmetic (`rank · 1000 ≤ n_group · permille`), so the kept set
   * is engine-exact with no percentile float anywhere.
   *
   * Scale: the rank is a per-group window — one shuffle keyed by the
   * group column, full sort of each group in its partition. Fine
   * while every group fits a partition (languages at corpus scale do
   * not). The 100 TB form keeps this exact contract only for bounded
   * groups; for corpus-sized groups, swap the window for a quality
   * THRESHOLD from the fixed-grid quantile sketch (SketchOps) and
   * accept grid-width tie imprecision at the boundary — the same
   * trade the per-domain frequency cap documents.
   */
  def qualityTopFraction(docs: DataFrame, idCol: String, textCol: String,
                         groupCol: String, permille: Int): DataFrame = {
    require(permille >= 1 && permille <= 1000, s"permille in [1,1000], got $permille")
    docs.select(col(groupCol).as("grp"), col(idCol).as("id"),
        qualityScore(col(textCol)).as("quality"))
      .withColumn("rank", row_number().over(Window.partitionBy("grp")
        .orderBy(col("quality").desc, col("id").asc)))
      .withColumn("n_group", count(lit(1)).over(Window.partitionBy("grp")))
      .filter(col("rank") * 1000L <= col("n_group") * permille)
      .select(col("grp"), col("id"), col("quality"),
        col("rank").cast("long").as("rank"), col("n_group"))
  }

  /**
   * Corpus-trained BIGRAM-LM mean NLL per document — the unigram
   * model's context-aware sibling: P(w|prev) = c(prev,w) / c(prev,·),
   * where c(prev,·) counts `prev` as the FIRST element of any corpus
   * bigram (so the distribution sums to 1 by construction and no
   * smoothing is needed on the training corpus itself). A doc of
   * common words in a novel ORDER scores high here and low on the
   * unigram NLL — the gap between the two is a word-salad signal.
   *
   * mean NLL = avg(ln c(prev,·) − ln c(prev,w)) in nats, rounded to
   * 4 decimals (the shared libm-ulp headroom of the NLL family).
   * Docs with < 2 tokens have no bigrams: n_bigrams 0, nll 0.
   *
   * Plan: bigrams via the zip-slice projection (no token self-join,
   * the pmiBigrams lesson); two count aggregates (bigram, prefix) —
   * both map-side combinable — and two equi joins back to instances.
   */
  def bigramNll(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"), words(lower(col(textCol))).as("t"))
    val inst = toks
      .select(col("doc_id"), explode(arrays_zip(
        slice(col("t"), lit(1), greatest(size(col("t")) - 1, lit(0))),
        slice(col("t"), lit(2), greatest(size(col("t")) - 1, lit(0))))).as("bg"))
      .select(col("doc_id"), col("bg.0").as("w1"), col("bg.1").as("w2"))
    val big = inst.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val pre = inst.groupBy("w1").agg(count(lit(1)).as("c1"))
    val perDoc = inst
      .join(big, Seq("w1", "w2"))
      .join(pre, Seq("w1"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        avg(log(col("c1").cast("double")) - log(col("c12").cast("double"))).as("nll"))
    docs.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(round(col("nll"), 4), lit(0.0)).as("avg_nll"))
  }

  /**
   * Interpolated Kneser-Ney bigram NLL (fixed discount D = 0.75 —
   * Chen & Goodman's benchmark setting): the proper-smoothing upgrade
   * of [[bigramNll]], whose raw MLE assigns zero mass to unseen pairs
   * and over-trusts one-off contexts. Per bigram instance,
   *
   *   P_KN(w₂|w₁) = max(c₁₂ − D, 0)/c₁
   *               + (D · N₁₊(w₁·)/c₁) · N₁₊(·w₂)/N₁₊(··)
   *
   * — the discounted MLE plus the backed-off CONTINUATION
   * probability ("how many contexts does w₂ complete", the statistic
   * [[knContinuation]] surfaces raw). Per doc: bigram count and mean
   * −ln P, 4-dp — low = fluent under corpus statistics, high = word
   * salad that raw counts can't separate from rare-but-real text.
   *
   * Plan: one bigram aggregate feeds all three statistics (c₁ and
   * N₁₊(w₁·) from a w₁ re-aggregate, N₁₊(·w₂) from a w₂
   * re-aggregate, N₁₊(··) one scalar broadcast) — map-side
   * combinable, instance join fans them back; empty docs keep (0, 0).
   */
  def knBigramNll(docs: DataFrame, idCol: String, textCol: String,
                  discount: Double = 0.75): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"), words(lower(col(textCol))).as("t"))
    val inst = toks
      .select(col("doc_id"), explode(arrays_zip(
        slice(col("t"), lit(1), greatest(size(col("t")) - 1, lit(0))),
        slice(col("t"), lit(2), greatest(size(col("t")) - 1, lit(0))))).as("bg"))
      .select(col("doc_id"), col("bg.0").as("w1"), col("bg.1").as("w2"))
    // the bigram-count frame feeds FOUR consumers (the instance join
    // and all three KN statistics) — checkpoint it once or each branch
    // re-scans the corpus text to rebuild it (5 scans observed in the
    // un-pinned plan; 2 after). Bigram-TYPE-sized, released by the
    // caller per the Blocks convention.
    val big = inst.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .localCheckpoint()
    val left = big.groupBy("w1").agg(sum(col("c12")).as("c1"),
      count(lit(1)).as("n1f"))
    val cont = big.groupBy("w2").agg(count(lit(1)).as("n1p"))
    val types = big.agg(count(lit(1)).as("tt"))
    val p = greatest(col("c12").cast("double") - lit(discount), lit(0.0)) /
        col("c1").cast("double") +
      lit(discount) * col("n1f").cast("double") / col("c1").cast("double") *
        (col("n1p").cast("double") / col("tt").cast("double"))
    val perDoc = inst
      .join(big, Seq("w1", "w2"))
      .join(left, Seq("w1"))
      .join(cont, Seq("w2"))
      .crossJoin(broadcast(types))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), avg(-log(p)).as("nll"))
    docs.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(round(col("nll"), 4), lit(0.0)).as("avg_nll"))
  }

  /**
   * Inverted-index posting surface: for each token with document
   * frequency ≥ `minDf`, the first `perToken` posting entries
   * (doc ids ascending) plus the full df — the IR primitive behind
   * boolean/phrase search and the df tables the dedup family prices
   * against. Exploded relational form rather than array postings so
   * any engine can sort/hash the result. The `rank <= perToken`
   * filter compiles to a WindowGroupLimit: each partition keeps at
   * most `perToken` candidates per token before the shuffle, so hot
   * tokens never materialize their full posting list into one task —
   * only the df aggregate (one long per token) sees it whole.
   */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
                    minDf: Long, perToken: Int): DataFrame = {
    val post = docs.select(col(idCol).as("doc_id"),
        explode(words(lower(col(textCol)))).as("token"))
      .distinct()
    val df = post.groupBy("token").agg(count(lit(1)).as("df"))
    val win = Window.partitionBy("token").orderBy(col("doc_id").asc)
    post.withColumn("rank", row_number().over(win))
      .filter(col("rank") <= perToken)
      .join(df.filter(col("df") >= minDf), "token")
      .select(col("token"), col("df"), col("rank").cast("long").as("rank"),
        col("doc_id"))
  }

  /**
   * DSIR-style importance weights (Xie et al., "Data Selection for
   * Language Models via Importance Resampling", NeurIPS 2023 —
   * unigram form): per raw-corpus document, the log importance weight
   * of a target-domain unigram LM against the raw-corpus LM,
   *
   *   w(doc) = Σ_{tokens} [ ln(c_t(w)+1) − ln(c_r(w)+1) ]
   *          + n_tokens · [ ln(N_r+V) − ln(N_t+V) ]
   *
   * (add-1 smoothing over the raw vocab V, factored so the per-token
   * work is two integer-count logs and the normalizer is one scalar
   * per doc). Docs that read like the TARGET (a benchmark, a curated
   * set) score high; resampling raw data ∝ exp(w) shifts the mixture
   * toward the target domain — the standard pretraining data-selection
   * move. Tokens absent from the target contribute −ln(c_r+1), so
   * off-domain jargon pushes weight down, as it should.
   *
   * Plan: two token-count aggregates (map-side combinable), three
   * tiny scalar frames broadcast, one instance-to-counts join per
   * side. Empty docs keep weight 0 via the left join.
   */
  def dsirWeights(raw: DataFrame, rawIdCol: String, rawTextCol: String,
                  target: DataFrame, targetTextCol: String): DataFrame = {
    val rawInst = raw.select(col(rawIdCol).as("doc_id"),
      explode(words(lower(col(rawTextCol)))).as("w"))
    val rawCnt = rawInst.groupBy("w").agg(count(lit(1)).as("cr"))
    val tgtCnt = target.select(explode(words(lower(col(targetTextCol)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("ct"))
    val rawTotals = rawCnt.agg(sum(col("cr")).as("nr"), count(lit(1)).as("v"))
    val tgtTotal = tgtCnt.agg(coalesce(sum(col("ct")), lit(0L)).as("nt"))
    val perDoc = rawInst
      .join(rawCnt, "w")
      .join(tgtCnt, Seq("w"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(log(coalesce(col("ct"), lit(0L)).cast("double") + 1.0) -
          log(col("cr").cast("double") + 1.0)).as("s"))
      .crossJoin(broadcast(rawTotals))
      .crossJoin(broadcast(tgtTotal))
      .select(col("doc_id"), col("n_tokens"),
        round(col("s") + col("n_tokens").cast("double") *
          (log(col("nr").cast("double") + col("v").cast("double")) -
           log(col("nt").cast("double") + col("v").cast("double"))), 4).as("log_weight"))
    raw.select(col(rawIdCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("log_weight"), lit(0.0)).as("log_weight"))
  }

  /**
   * Distributed BPE trainer: the first `steps` byte-pair merges over
   * the corpus word-frequency table, each step emitting the merged
   * pair and its global count. Classic Sennrich BPE — per step, count
   * every adjacent token pair weighted by word frequency, pick the
   * most frequent (ties to the lexicographically smaller pair), and
   * merge its occurrences LEFT-TO-RIGHT NON-OVERLAPPING in every word.
   *
   * The merge is expressed as a plain `replace`, no per-word loop:
   * token sequences live as `||`-delimited strings (`||n||e||w||`),
   * and the pattern `|t1||t2|` → `|t1t2|` consumes one delimiter from
   * each side, leaving one — so two adjacent occurrences still match
   * back-to-back, while an occurrence OVERLAPPING a just-merged token
   * cannot (its delimiter was consumed). That makes the engine's
   * leftmost-continue-after-replacement `replace` semantics exactly
   * BPE's scan — on Spark and on any SQL engine with standard
   * `replace`, which is what lets the oracle replay training
   * verbatim. (Tokens must not contain `|`; the tokenizer's word
   * charset here is `\S`, so a literal `|` in text would break the
   * encoding — production use would map delimiters out first.)
   *
   * Scale: the corpus is touched ONCE (word-count aggregate,
   * map-side combinable); every merge step runs on the vocabulary
   * table, which is bounded (Heaps' law) and `localCheckpoint`ed so
   * the k-step lineage never re-reads the corpus. Each step is one
   * vocab-sized pair aggregate + a 1-row argmax broadcast into a
   * projection — the sequential step barrier is inherent to BPE
   * (merge k depends on merge k-1), not an implementation artifact.
   */
  def bpeMerges(docs: DataFrame, textCol: String, steps: Int): DataFrame =
    bpeTrain(docs, textCol, steps)._1

  /** (merge table, per-word sequences AFTER all `steps` merges). */
  private def bpeTrain(docs: DataFrame, textCol: String,
                       steps: Int): (DataFrame, DataFrame) = {
    require(steps >= 1 && steps <= 64, s"steps in [1,64], got $steps")
    val vocab = docs.select(explode(words(lower(col(textCol)))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .select(col("word"), concat(lit("||"),
        array_join(filter(split(col("word"), ""), t => length(t) > 0), "||"),
        lit("||")).as("seq"), col("cnt"))
      .localCheckpoint()

    def bestPair(cur: DataFrame): DataFrame = {
      val t = filter(split(col("seq"), "\\|\\|"), x => length(x) > 0)
      cur.select(col("cnt"), t.as("t"))
        .select(col("cnt"), explode(arrays_zip(
          slice(col("t"), lit(1), greatest(size(col("t")) - 1, lit(0))),
          slice(col("t"), lit(2), greatest(size(col("t")) - 1, lit(0))))).as("bg"))
        .select(col("cnt"), col("bg.0").as("t1"), col("bg.1").as("t2"))
        .groupBy("t1", "t2").agg(sum(col("cnt")).as("freq"))
        .orderBy(col("freq").desc, col("t1").asc, col("t2").asc)
        .limit(1)
        .localCheckpoint() // 1 row; pins the argmax so merge + output share it
    }

    var cur = vocab
    var out: DataFrame = null
    for (step <- 1 to steps) {
      val best = bestPair(cur)
      val labeled = best.select(lit(step.toLong).as("step"),
        col("t1"), col("t2"), col("freq"))
      out = if (out == null) labeled else out.union(labeled)
      cur = cur.crossJoin(broadcast(best.drop("freq")))
        .withColumn("seq", replace(col("seq"),
          concat(lit("|"), col("t1"), lit("||"), col("t2"), lit("|")),
          concat(lit("|"), col("t1"), col("t2"), lit("|"))))
        .select("word", "seq", "cnt")
    }
    (out, cur)
  }

  /**
   * Apply the first `steps` BPE merges ([[bpeMerges]]) back to the
   * corpus: per document, whitespace word count and the token count
   * AFTER merging — the number a sequence-length budget or packing
   * plan actually needs (chars before training, merged tokens after).
   *
   * The per-word token count is `|tokens(seq_k)|` on the trained
   * vocabulary table, so encoding the corpus is ONE join from word
   * instances to a vocab-sized (broadcastable) map — no per-doc merge
   * replay. Empty docs survive with (0, 0) via the left join.
   */
  def bpeEncodeCounts(docs: DataFrame, idCol: String, textCol: String,
                      steps: Int): DataFrame = {
    val (_, seqs) = bpeTrain(docs, textCol, steps)
    val tokCounts = seqs.select(col("word"),
      size(filter(split(col("seq"), "\\|\\|"), x => length(x) > 0))
        .cast("long").as("n_tok"))
    val perDoc = docs
      .select(col(idCol).as("doc_id"), explode(words(lower(col(textCol)))).as("word"))
      .join(tokCounts, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("n_tok")).as("n_bpe_tokens"))
    docs.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"))
  }

  /**
   * Seed-vocabulary builder for a unigram/WordPiece-style subword
   * tokenizer: every substring of length 2..`maxLen` of every corpus
   * word, weighted by word frequency, scored `freq × len` (the
   * "frequent AND long pieces first" seeding SentencePiece uses for
   * its initial candidate set before EM pruning), top `vocabSize` by
   * (score DESC, piece ASC). Single characters are deliberately not
   * candidates — the encoder falls back to them implicitly, so vocab
   * slots go to pieces that actually compress.
   *
   * Scale shape: one corpus scan → word-frequency table (vocab-sized)
   * → substring explode is per-DISTINCT-word work (≤ maxLen·|word|
   * pieces each) → one hash aggregate + a global top-V (V bounded,
   * the single-reducer sort is V-sized under the window's
   * WindowGroupLimit pushdown).
   */
  def subwordVocab(docs: DataFrame, textCol: String, vocabSize: Int = 64,
                   maxLen: Int = 4): DataFrame = {
    require(vocabSize >= 1 && maxLen >= 2, s"vocabSize=$vocabSize maxLen=$maxLen")
    val wordCnt = docs.select(explode(words(lower(col(textCol)))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    val pieces = wordCnt.select(col("cnt"), explode(expr(
        s"""flatten(transform(sequence(1, length(word)), s ->
           |  filter(transform(sequence(2, $maxLen), l ->
           |    case when s + l - 1 <= length(word) then substring(word, s, l) end),
           |  x -> x is not null)))""".stripMargin)).as("piece"))
      .groupBy("piece").agg(sum(col("cnt")).as("freq"))
      .withColumn("score", col("freq") * length(col("piece")))
    val win = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("piece").asc)
    pieces.withColumn("rank", row_number().over(win))
      .filter(col("rank") <= vocabSize)
      .select(col("rank").cast("long").as("rank"), col("piece"),
        col("freq"), col("score"))
  }

  /**
   * Greedy longest-match (MaxMatch — WordPiece inference) encoding
   * against the [[subwordVocab]] pieces: per document, whitespace
   * word count and the subword count after segmenting every word
   * left-to-right, always taking the LONGEST vocab piece (maxLen
   * down to 2) at the cursor and falling back to a single character
   * when nothing matches. Bounded piece length makes the per-word
   * walk O(len·maxLen) and keeps the whole vocab broadcastable.
   *
   * Scale shape: the vocab collect is MODEL-sized (`vocabSize` rows
   * — the codebook convention); segmentation runs once per DISTINCT
   * word, then one join fans counts back to word instances, exactly
   * [[bpeEncodeCounts]]' shape. Empty docs survive with (0, 0).
   */
  def maxMatchCounts(docs: DataFrame, idCol: String, textCol: String,
                     vocabSize: Int = 64, maxLen: Int = 4): DataFrame = {
    val vocab: Set[String] = subwordVocab(docs, textCol, vocabSize, maxLen)
      .select("piece").collect().map(_.getString(0)).toSet
    val mLen = maxLen
    val segUdf = udf { (word: String) =>
      // code-point walk, not UTF-16 units — matches SQL length/substring
      val cps = word.codePoints.toArray
      var pos = 0; var n = 0L
      while (pos < cps.length) {
        var l = math.min(mLen, cps.length - pos)
        while (l >= 2 && !vocab.contains(new String(cps, pos, l))) l -= 1
        pos += math.max(l, 1); n += 1
      }
      n
    }
    val tokCounts = docs.select(explode(words(lower(col(textCol)))).as("word"))
      .distinct()
      .select(col("word"), segUdf(col("word")).as("n_tok"))
    val perDoc = docs
      .select(col(idCol).as("doc_id"), explode(words(lower(col(textCol)))).as("word"))
      .join(tokCounts, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("n_tok")).as("n_subwords"))
    docs.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_subwords"), lit(0L)).as("n_subwords"))
  }

  /**
   * Unigram-LM subword trainer (Kudo, "Subword Regularization", ACL
   * 2018 — the SentencePiece unigram algorithm) atop the
   * [[subwordVocab]] seed: `emRounds` rounds of
   *
   *   E-step: Viterbi-segment every distinct corpus word against the
   *   current piece costs (suffix DP, min total cost, then fewest
   *   tokens, then longest piece — fully deterministic);
   *   M-step: re-count each piece's frequency as Σ word_freq over the
   *   Viterbi paths it appears on, PRUNE pieces whose count drops to
   *   zero, and refresh costs from the new counts.
   *
   * Costs live in exact micro-nats via the t_pmi micro-log rule:
   * cost(piece) = lg(total) − lg(freq) with lg(n) = floor(10⁶·ln n)
   * (both `ln`s of exact integers), and the single-character fallback
   * prices at lg(total) (probability 1/total) — so every DP compare
   * is integer and the whole EM fold replays bit-for-bit in the
   * DuckDB oracle as `emRounds` unrolled DP/walk/recount blocks.
   * The DP key packs (cost, tokens) as cost·1024 + tokens (words are
   * capped at `maxWordLen` < 1024 code points; longer words are
   * excluded from training, SentencePiece's overlong-sentence skip).
   *
   * Scale shape: the vocab and its costs are MODEL-sized (≤ vocabSize
   * rows — the codebook convention: collected per round, shipped back
   * by closure); each EM round is one pass over DISTINCT words (the
   * bpeEncodeCounts shape — segmentation cost is per word TYPE,
   * O(len·maxLen) each) ending in one vocab-sized hash aggregate.
   * Nothing corpus-sized ever reaches the driver, and rounds compose
   * as R independent scans — no iterative lineage growth.
   *
   * Output: (rank, piece, freq, cost_micro) for the surviving vocab
   * after the final round, ranked by (freq DESC, piece ASC).
   */
  def unigramLmVocab(docs: DataFrame, textCol: String, vocabSize: Int = 64,
                     maxLen: Int = 4, emRounds: Int = 2,
                     maxWordLen: Int = 24): DataFrame = {
    require(emRounds >= 1 && emRounds <= 8, s"unigramLmVocab emRounds=$emRounds")
    require(maxWordLen >= maxLen && maxWordLen < 1024,
      s"unigramLmVocab maxWordLen=$maxWordLen")
    val spark = docs.sparkSession
    // distinct-word frequency table, reused every round (words longer
    // than maxWordLen CODE POINTS are excluded from training)
    val wordCnt = docs
      .select(explode(words(lower(col(textCol)))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .filter(length(col("word")) <= maxWordLen)
      .localCheckpoint()
    // StrictMath.log (fdlibm) — JVM-stable across platforms/JITs, unlike
    // the math.log intrinsic whose last-ulp drift vs libm can flip the
    // floor() and break the bit-for-bit oracle replay (the
    // SketchOps.linearCountMilli lesson)
    def lg(n: Long): Long =
      math.floor(StrictMath.log(n.toDouble) * 1e6).toLong
    // seed: the subwordVocab pieces with their substring-weighted freqs
    var freqs: Map[String, Long] = subwordVocab(docs, textCol, vocabSize, maxLen)
      .select("piece", "freq").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    var costs: Map[String, Long] = Map.empty
    var charCost = 0L
    def refreshCosts(): Unit = {
      val total = freqs.valuesIterator.sum
      if (total > 0L) {
        val lgT = lg(total)
        costs = freqs.map { case (p, f) => p -> (lgT - lg(f)) }
        charCost = lgT
      } else { costs = Map.empty; charCost = 0L }
    }
    refreshCosts()
    val mLen = maxLen
    for (_ <- 1 to emRounds) {
      val cb = costs
      val ccb = charCost
      // Viterbi path pieces (len >= 2 only) per word — the E-step
      val pathUdf = udf { (word: String) =>
        val cps = word.codePoints.toArray
        val n = cps.length
        if (n == 0 || cb.isEmpty) Seq.empty[String]
        else {
          val dp = new Array[Long](n + 1) // packed (cost, tokens) key
          val choice = new Array[Int](n)
          dp(n) = 0L
          var i = n - 1
          while (i >= 0) {
            var bestK = dp(i + 1) + ccb * 1024L + 1L // l = 1 char fallback
            var bestL = 1
            var l = 2
            while (l <= mLen && i + l <= n) {
              cb.get(new String(cps, i, l)) match {
                case Some(c) =>
                  val k = dp(i + l) + c * 1024L + 1L
                  // min key; equal key -> LONGEST piece (the walk's
                  // deterministic tie-break, mirrored in the oracle)
                  if (k < bestK || (k == bestK && l > bestL)) {
                    bestK = k; bestL = l
                  }
                case None =>
              }
              l += 1
            }
            dp(i) = bestK
            choice(i) = bestL
            i -= 1
          }
          val buf = Seq.newBuilder[String]
          var p = 0
          while (p < n) {
            val l = choice(p)
            if (l >= 2) buf += new String(cps, p, l)
            p += l
          }
          buf.result()
        }
      }
      // M-step: vocab-sized recount (collect is model-sized)
      freqs = wordCnt
        .select(col("cnt"), explode(pathUdf(col("word"))).as("piece"))
        .groupBy("piece").agg(sum(col("cnt")).as("freq"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      refreshCosts()
    }
    val lgT = if (freqs.nonEmpty) lg(freqs.valuesIterator.sum) else 0L
    val rows = freqs.toSeq
      .map { case (p, f) => (p, f, lgT - lg(f)) }
      .sortBy { case (p, f, _) => (-f, p) }
      .zipWithIndex
      .map { case ((p, f, c), ix) => (ix + 1L, p, f, c) }
    import spark.implicits._
    rows.toDF("rank", "piece", "freq", "cost_micro")
  }

  /** The script classes of [[scriptMix]]: (name, character class) in
    * DOMINANCE ORDER — `dominant` resolves count ties to the first
    * listed. BMP ranges only, so codepoint counts agree between
    * UTF8String and any engine counting characters. */
  private[graft] val ScriptClasses: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-z\\u00C0-\\u024F]",
    "cyrillic" -> "[\\u0400-\\u04FF]",
    "greek" -> "[\\u0370-\\u03FF]",
    "arabic" -> "[\\u0600-\\u06FF]",
    "hebrew" -> "[\\u0590-\\u05FF]",
    "cjk" -> "[\\u4E00-\\u9FFF\\u3040-\\u30FF\\uAC00-\\uD7AF]",
    "digit" -> "[0-9]")

  /**
   * Unicode SCRIPT-MIX audit — the mixed-script / wrong-language-tag
   * detector a multilingual crawl pipeline runs before language-keyed
   * processing: per document, the character count in each major script
   * block (Latin incl. Latin-1/Extended, Cyrillic, Greek, Arabic,
   * Hebrew, CJK incl. kana+hangul, ASCII digits) and the dominant
   * script (count argmax, ties to the [[ScriptClasses]] order; "none"
   * when every class is empty). A `lang='en'` doc dominated by
   * Cyrillic is mislabeled; a heavy latin+cyrillic mix flags
   * homoglyph spoofing — both invisible to the n-gram [[languageId]],
   * which assumes the doc is in SOME coherent script.
   *
   * Counting is the fused [[ScriptMixStats]] kernel — ONE UTF-8
   * decode walk classifies every code point (subexpression
   * elimination collapses the 7 field reads to a single eval),
   * replacing the prior seven regexp_replace passes that each
   * re-scanned and copied the text. The regex formulation survives as
   * [[scriptMixReference]] and the equivalence is spec-pinned; the
   * DuckDB oracle still replays the regex form (integer counts agree
   * exactly — the classes are BMP-only, so UTF-16 vs codepoint length
   * never diverges). Scale: a per-row projection; nothing shuffles,
   * nothing pins.
   */
  def scriptMix(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val st = ScriptMixStats(col(textCol))
    val counts = ScriptClasses.zipWithIndex.map { case ((name, _), ix) =>
      element_at(st, ix + 1).as(name)
    }
    withDominant(docs.select((col(idCol).as("doc_id") +: counts): _*))
  }

  /** Pre-kernel regex formulation (equivalence-test reference). */
  private[graft] def scriptMixReference(docs: DataFrame, idCol: String,
                                        textCol: String): DataFrame = {
    val t = col(textCol)
    val counts = ScriptClasses.map { case (name, cls) =>
      (length(t) - length(regexp_replace(t, cls, ""))).cast("long").as(name)
    }
    withDominant(docs.select((col(idCol).as("doc_id") +: counts): _*))
  }

  private def withDominant(withCounts: DataFrame): DataFrame = {
    val maxCount = greatest(ScriptClasses.map(c => col(c._1)): _*)
    // foldRight keeps the FIRST listed class as the outermost when():
    // ties resolve to dominance order, zero-everything docs say "none"
    val dominant = ScriptClasses.foldRight(lit("none")) { case ((name, _), acc) =>
      when(col(name) > 0 && col(name) === maxCount, lit(name)).otherwise(acc)
    }
    withCounts.withColumn("dominant", dominant)
  }

  /**
   * Corpus distinct-n DIVERSITY (the distinct-1/2/3 metric of
   * generation-diversity reporting, applied corpus-wide): for word
   * n-grams of n = 1..`maxN`, the total and distinct gram counts and
   * their ratio in ppm. A replica-heavy or template-heavy corpus shows
   * a LOW distinct ratio at n=2,3 long before exact dedup finds whole
   * duplicate documents — the cheap first look at "how much of this
   * corpus is the same text over and over".
   *
   * Shape: one scan, one explode — each n's gram hashes come from the
   * fused [[Shingles.ngramHashes]] kernel (one pass over the lowered
   * text bytes per n, zero per-gram string allocations, XXH64 keys —
   * the same fusion that cut d_dedup_jaccard's signature stage 3.9 s
   * → sub-second), then groupBy(n, hash) with map-side partials: the
   * exchange carries one 16-byte row per DISTINCT (n, hash), and a
   * 3-row final aggregate. Distinctness is hash-distinct over 64-bit
   * XXH64 (the oracle groups by the gram STRINGS — identical while
   * collision-free, which the birthday bound prices at ~n²/2⁶⁵ pairs:
   * zero at test scale, ~0.03 ppm of distinct at 10¹² grams — noise
   * against a ppm-scale diversity ratio). Output: (n, total_grams,
   * distinct_grams, distinct_ppm), integral-division exact.
   */
  def distinctNgrams(docs: DataFrame, textCol: String, maxN: Int = 3): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"distinctNgrams maxN in [1,8], got $maxN")
    val lowered = lower(col(textCol))
    val gramArr = concat((1 to maxN).map { n =>
      transform(NgramHashes(lowered, n), h => struct(lit(n.toLong).as("n"), h.as("h")))
    }: _*)
    docs.select(explode(gramArr).as("g"))
      .select(col("g.n").as("n"), col("g.h").as("h"))
      .groupBy("n", "h").agg(count(lit(1)).as("f"))
      .groupBy("n")
      .agg(sum(col("f")).as("total_grams"), count(lit(1)).as("distinct_grams"))
      .select(col("n"), col("total_grams"), col("distinct_grams"),
        IntDiv(col("distinct_grams") * 1000000L, col("total_grams"))
          .cast("long").as("distinct_ppm"))
  }

  /**
   * KMV-sketched sibling of [[distinctNgrams]] — the BOUNDED-EXCHANGE
   * scale path. The exact operator's shuffle carries one 16-byte row
   * per DISTINCT (n, gram hash): corpus-priced and fine at any
   * realistic scale, but still an exchange that grows with gram
   * diversity. This variant's exchange is k·8 bytes per n FOREVER —
   * [[SketchOps.kmvSketch]] partials combine map-side and only
   * k-entry buffers cross the wire — at the cost of an estimate
   * (exact below k; ±O(1/√k) above, Bar-Yossef 2002). Gram hashing
   * here is md5Head60 of the gram bytes via the fused
   * [[Shingles.ngramMd5Heads]] kernel (NOT the XXH64 kernel) because
   * the min-set and estimate must replay in the DuckDB oracle, which
   * has md5 but no xxhash64 — the md5 costs more per gram than XXH64,
   * which is the price of engine-portable determinism (the first cut
   * built gram STRINGS through interpreted transform/slice HOFs and
   * measured 66.3 s at sf1; the kernel removed the string building);
   * use [[distinctNgrams]] when the distinct exchange is affordable.
   * Output per n: (n, total_grams, n_seen, kth_hash, est_distinct) —
   * the [[SketchOps.distinctSketch]] column contract.
   */
  def distinctNgramsSketch(docs: DataFrame, textCol: String, maxN: Int = 3,
                           k: Int = 128): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"distinctNgramsSketch maxN in [1,8], got $maxN")
    val lowered = lower(col(textCol))
    val gramArr = concat((1 to maxN).map { n =>
      transform(NgramMd5Heads(lowered, n), h => struct(lit(n.toLong).as("n"), h.as("h")))
    }: _*)
    docs.select(explode(gramArr).as("g"))
      .select(col("g.n").as("n"), col("g.h").as("_h"))
      .groupBy("n")
      .agg(count(lit(1)).as("total_grams"),
        SketchOps.kmvSketch(col("_h"), k).as("_mins"))
      .select(col("n"), col("total_grams"),
        size(col("_mins")).cast("long").as("n_seen"),
        element_at(col("_mins"), -1).as("kth_hash"),
        round(
          when(size(col("_mins")) < k, size(col("_mins")).cast("double"))
            .otherwise(lit((k - 1).toDouble) /
              (element_at(col("_mins"), -1).cast("double") / lit(1152921504606846976.0))),
          4).as("est_distinct"))
  }

  /**
   * The published C4 cleaning rule set (Raffel et al. 2020, §2.2) as a
   * per-document audit — the OTHER de-facto standard web-corpus filter
   * next to [[gopherRules]], kept separate because C4 filters at LINE
   * granularity (Gopher judges whole documents): a line is RETAINED iff
   * it ends in a terminal punctuation mark (`.` `!` `?` `"` after
   * right-trim), carries >= 3 whitespace words, and does not contain
   * "javascript" (case-insensitive); the PAGE is dropped when fewer
   * than 5 sentences survive (sentences ~ `[.!?]` occurrences in
   * retained lines), or when the raw text contains "lorem ipsum"
   * (case-insensitive) or a `{` (the code/boilerplate tell).
   *
   * Shape: ONE scan — the doc-level flags project before a line
   * explode, per-line flags are codegen'd regex/char tests (no
   * higher-order lambda on the corpus path — the [[pmiBigrams]] note
   * measured 37x for interpreted HOFs), and the groupBy(doc) partial-
   * aggregates map-side so the exchange carries only (id, 5 longs),
   * never text. Output: (id, n_lines, kept_lines, n_sentences,
   * has_lorem, has_brace, pass) — all flags 0/1 LONGs, `pass` the C4
   * page decision (>=1 kept line, >=5 sentences, no lorem/brace).
   */
  def c4Rules(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val le = rtrim(col("l"))
    val terminal = length(le) > 0 &&
      substring(le, -1, 1).isin(".", "!", "?", "\"")
    val kept = (terminal &&
      regexp_count(col("l"), lit("\\S+")) >= 3 &&
      !lower(col("l")).contains("javascript")).cast("long")
    docs.select(
        col(idCol).as("id"),
        lower(t).contains("lorem ipsum").cast("long").as("lorem"),
        t.contains("{").cast("long").as("brace"),
        explode(split(t, "\n")).as("l"))
      .select(col("id"), col("lorem"), col("brace"), kept.as("k"),
        (kept * regexp_count(col("l"), lit("[.!?]"))).cast("long").as("sent"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_lines"), sum(col("k")).as("kept_lines"),
        sum(col("sent")).as("n_sentences"),
        max(col("lorem")).as("has_lorem"), max(col("brace")).as("has_brace"))
      .select(col("id"), col("n_lines"), col("kept_lines"), col("n_sentences"),
        col("has_lorem"), col("has_brace"),
        (col("kept_lines") > 0L && col("n_sentences") >= 5L &&
          col("has_lorem") === 0L && col("has_brace") === 0L)
          .cast("long").as("pass"))
  }

  /**
   * CCNet-style perplexity bucketing (Wenzek et al. 2020, §3.3): score
   * every document with the corpus-trained unigram-LM mean NLL
   * ([[unigramNll]] — same signal, same rounding) and split EACH
   * LANGUAGE into head / middle / tail terciles by ascending NLL —
   * the standard "train on head, maybe middle, drop tail" quality
   * partition for multilingual web corpora. Ties order by (avg_nll,
   * id): NLL is pre-rounded to 4 decimals, so the sort key is the
   * cross-engine-stable value, and id makes the total order unique.
   *
   * Shape: the [[unigramNll]] plan (token-frequency aggregate +
   * instances⋈freq join — text never shuffles) plus ONE per-language
   * window for `ntile(3)` — exact while a language's docs fit a
   * partition (the family bound shared with SampleOps' per-group
   * windows; at a scale where one language IS the corpus, the scale
   * path is CCNet's own: sample tercile thresholds, then a threshold
   * join — the window stays the exact reference). ntile's uneven-split
   * rule (first n mod 3 buckets take the extra row) is standard SQL,
   * identical on both engines. Output: (doc_id, lang, n_tokens,
   * avg_nll, bucket).
   */
  def ccnetBuckets(docs: DataFrame, idCol: String, textCol: String,
                   langCol: String): DataFrame = {
    val nll = unigramNll(docs, idCol, textCol)
    val w = Window.partitionBy("lang").orderBy(col("avg_nll"), col("doc_id"))
    docs.select(col(idCol).as("doc_id"), col(langCol).as("lang"))
      .join(nll, "doc_id")
      .withColumn("tercile", ntile(3).over(w))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("avg_nll"),
        when(col("tercile") === 1, "head")
          .when(col("tercile") === 2, "middle")
          .otherwise("tail").as("bucket"))
  }

  /**
   * Closed-vocabulary coverage: per document, how many token instances
   * fall OUTSIDE the corpus's own top-`topV` vocabulary — the
   * out-of-vocabulary (OOV) audit run before committing to a fixed
   * tokenizer/embedding table ([[rarityStats]] thresholds on a
   * frequency FLOOR; this thresholds on a vocabulary SIZE, which is
   * what a real embedding table fixes). The vocabulary cutoff is the
   * [[vocabulary]] order (freq desc, token asc — deterministic under
   * ties on both engines). oov_ppm is exact integral ppm.
   *
   * Shape: one token-frequency aggregate ranks the vocab (top-V is
   * model-sized: V rows survive the WindowGroupLimit-style
   * sort+limit), then the instance table joins it BROADCAST (V rows)
   * — the corpus-sized side never shuffles for the membership test —
   * and one map-side-combined groupBy(doc) folds to (id, 2 longs).
   * Wordless docs survive with zeros via the left join.
   */
  def oovStats(docs: DataFrame, idCol: String, textCol: String,
               topV: Int): DataFrame = {
    val inst = docs.select(col(idCol).as("doc_id"),
      explode(words(lower(col(textCol)))).as("token"))
    val vocab = vocabulary(docs, textCol, topV)
      .select(col("token"), lit(1L).as("in_vocab"))
    val perDoc = inst.join(broadcast(vocab), Seq("token"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("oov_tokens"))
    docs.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("oov_tokens"), lit(0L)).as("oov_tokens"),
        when(coalesce(col("n_tokens"), lit(0L)) === 0L, 0L)
          .otherwise(IntDiv(col("oov_tokens") * 1000000L, col("n_tokens"))
            .cast("long")).as("oov_ppm"))
  }

  /**
   * The end-to-end selection funnel a pretraining pipeline actually
   * runs, composed from this library's own gates and grouped by
   * (lang, source): document counts passing [[gopherRules]], passing
   * [[c4Rules]], surviving exact dedup as their fingerprint group's
   * canonical copy (min id per [[fingerprint]] — the d_dedup_exact
   * convention), and passing ALL THREE, plus the whitespace-token
   * volume the selection keeps. This is the "how much data do I
   * actually get, and from where" audit that individually-green
   * filters can't answer — the gates interact (a spam source can pass
   * Gopher yet lose everything to dedup).
   *
   * Shape: THREE column-pruned corpus scans, not four — the gopher
   * flags and the gate-independent doc signals (fingerprint, token
   * count, group keys) fuse into ONE projection via [[gopherRules]]'s
   * `keep` columns; [[c4Rules]]'s line explode is the second; the
   * fingerprint-canonical aggregate re-derives fp on its own 2-column
   * scan (Catalyst does not share subplans across a self-aggregate,
   * and one extra hash-only scan beats pinning the 7-signal
   * projection in memory at corpus scale — PLANS.md §p_funnel shows
   * all three scans pruned). The canonical aggregate and the two
   * doc-keyed joins exchange (id, flag/hash) rows only — text never
   * shuffles — and the final groupBy is output-sized (one row per
   * (lang, source)).
   */
  def selectionFunnel(docs: DataFrame, idCol: String, textCol: String,
                      langCol: String, sourceCol: String): DataFrame = {
    val base = gopherRules(docs, idCol, textCol, keep = Seq(
        col(langCol).as("lang"), col(sourceCol).as("source"),
        fingerprint(col(textCol)).as("fp"),
        tokenCount(col(textCol)).as("nw")))
      .select(col(idCol).as("doc_id"), col("pass").as("gpass"),
        col("lang"), col("source"), col("fp"), col("nw"))
    val c4 = c4Rules(docs, idCol, textCol)
      .select(col("id").as("doc_id"), col("pass").as("cpass"))
    val canon = base.groupBy("fp").agg(min(col("doc_id")).as("canon_id"))
    base.join(c4, "doc_id")
      .join(canon, "fp")
      .withColumn("is_canon", (col("doc_id") === col("canon_id")).cast("long"))
      .withColumn("sel", col("gpass") * col("cpass") * col("is_canon"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("gpass")).as("n_gopher"),
        sum(col("cpass")).as("n_c4"),
        sum(col("is_canon")).as("n_canonical"),
        sum(col("sel")).as("n_selected"),
        sum(col("sel") * col("nw")).as("words_selected"))
  }

  /**
   * Flesch reading-ease readability audit: per document, sentence /
   * word / syllable-proxy counts and the Flesch score in exact milli
   * units — the curriculum signal ("train on easy text first") and the
   * OCR-garbage detector (mangled text scores deeply negative). The
   * syllable proxy is the corpus-standard vowel-group count, floored
   * at one syllable per word (`greatest(words, vowel_groups)` — the
   * per-word max folded to the document level, which the two counts'
   * monotonicity makes equivalent for the floor's purpose).
   *
   * Exactness: all three counts are integers from single-pass regexp
   * scans; the score's double chain (two divisions, two multiplies,
   * two subtractions, in this order) runs on those integers
   * identically on both engines, then quantizes to millis with
   * floor(+0.5). Wordless documents score null / grade 'empty'; the
   * grade CASE compares the MILLI integer so no float boundary can
   * flip a bucket.
   *
   * Scale: one codegen'd projection per document — no shuffle, no
   * UDF; the score travels as one long per doc.
   */
  def readability(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val nSent = regexp_count(t, lit("[.!?]+"))
    val nWords = regexp_count(t, lit("[A-Za-z]+"))
    val nVowelGroups = regexp_count(t, lit("[aeiouyAEIOUY]+"))
    docs.select(col(idCol).as("doc_id"),
        nSent.cast("long").as("n_sentences"), nWords.cast("long").as("n_words"),
        greatest(nWords, nVowelGroups).cast("long").as("n_syllables"))
      .withColumn("flesch_milli",
        when(col("n_words") > 0L,
          floor((lit(206.835)
            - lit(1.015) * (col("n_words").cast("double")
              / greatest(col("n_sentences"), lit(1L)).cast("double"))
            - lit(84.6) * (col("n_syllables").cast("double")
              / col("n_words").cast("double"))) * lit(1000.0) + lit(0.5))
            .cast("long")))
      .withColumn("grade",
        when(col("flesch_milli").isNull, lit("empty"))
          .when(col("flesch_milli") >= 90000L, lit("very_easy"))
          .when(col("flesch_milli") >= 70000L, lit("easy"))
          .when(col("flesch_milli") >= 50000L, lit("medium"))
          .when(col("flesch_milli") >= 30000L, lit("hard"))
          .otherwise(lit("very_hard")))
  }

  /**
   * Code-likeness audit: per document, the structural signals that
   * separate source code from prose — brace/bracket/semicolon
   * density, multi-char operator hits, language-keyword hits,
   * indented-line count, and the non-alphanumeric symbol fraction in
   * ppm — plus the composite `is_code` admission flag. The filter a
   * natural-language pipeline runs to ROUTE code out of the prose
   * corpus (or into a code corpus) before quality scoring, whose
   * stopword/punctuation heuristics misfire badly on code.
   *
   * All counts are single-pass regexp scans over ASCII-anchored
   * classes (`\b` and `(?m)^` behave identically on RE2 and the JVM
   * for ASCII input); the symbol fraction divides exact integers.
   * One codegen'd projection, no shuffle.
   */
  def codeSignals(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val braces = regexp_count(t, lit("[{}\\[\\]();]"))
    val ops = regexp_count(t, lit("(==|!=|->|=>|&&|\\|\\||\\+=|::)"))
    val kws = regexp_count(t,
      lit("\\b(def|class|return|import|function|const|var|void|if|else|for|while|lambda|public|static)\\b"))
    val indents = regexp_count(t, lit("(?m)^(    |\\t)"))
    val symbols = length(t) - length(regexp_replace(t, "[A-Za-z0-9\\s]", ""))
    docs.select(col(idCol).as("doc_id"),
        braces.cast("long").as("n_braces"), ops.cast("long").as("n_operators"),
        kws.cast("long").as("n_keywords"),
        indents.cast("long").as("n_indent_lines"),
        when(length(t) > 0,
          IntDiv(symbols.cast("long") * 1000000L, length(t).cast("long")))
          .otherwise(lit(0L)).as("symbol_ppm"))
      .withColumn("is_code",
        (((col("n_braces") + col("n_operators")) >= 5L && col("n_keywords") >= 2L)
          || col("n_indent_lines") >= 3L).cast("long"))
  }

  /**
   * URL/domain audit: per document, how many URLs it carries, how
   * many distinct registrable hosts, the smallest host (a stable
   * representative for grouping), and the fraction of characters
   * spent on URLs in ppm — the link-farm / navigation-boilerplate
   * detector, and the input to domain-level filtering (a doc that is
   * 40% URLs by characters is a link list, not prose).
   *
   * URL chars are measured by the length delta of stripping the URL
   * pattern (one regexp pass, no per-match loop); hosts come from a
   * `transform` over the extracted matches — array functions over a
   * per-doc list, still inside the projection, no shuffle.
   */
  def urlAudit(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val urlPat = "https?://[^\\s]+"
    val urls = regexp_extract_all(t, lit(urlPat), lit(0))
    val hosts = array_distinct(transform(urls,
      u => regexp_extract(u, "^https?://([^/\\s:?#]+)", 1)))
    val urlChars = length(t) - length(regexp_replace(t, urlPat, ""))
    docs.select(col(idCol).as("doc_id"),
      size(urls).cast("long").as("n_urls"),
      size(hosts).cast("long").as("n_hosts"),
      array_min(hosts).as("first_host"),
      when(length(t) > 0,
        IntDiv(urlChars.cast("long") * 1000000L, length(t).cast("long")))
        .otherwise(lit(0L)).as("url_ppm"))
  }

  /** The Unicode TR39 confusable pairs the normalizer folds: the
    * Cyrillic and Greek lowercase letters whose glyphs are visually
    * identical to Latin in common fonts (the subset spammers actually
    * use — per-character, so `translate` applies it in one pass; both
    * strings are shared verbatim with the DuckDB oracle). */
  private[graft] val ConfusablesFrom = "аеорсухіѕјһԁԛԝον"
  private[graft] val ConfusablesTo   = "aeopcyxisjhdqwov"

  /**
   * Homoglyph-normalized duplicate groups — the dedup exact
   * fingerprinting is BLIND to: a spammer swaps Latin letters for
   * their Cyrillic/Greek lookalikes (Unicode TR39 confusables) and
   * every copy gets a fresh md5 while rendering identically. This
   * operator fingerprints the text twice — raw (the [[fingerprint]]
   * kernel) and after folding the confusable pairs back with one
   * `translate` pass — and reports each normalized group that
   * contains MORE THAN ONE raw variant: exactly the spoof sets, with
   * ordinary exact-dup groups (1 raw variant) excluded by
   * construction. The [[scriptMix]] audit FLAGS suspicious docs;
   * this one pairs them with what they're impersonating.
   *
   * Scale shape: two per-doc hash projections and one
   * (norm_fp)-keyed aggregate — exact-dedup cost, nothing pairwise.
   * Output: (norm_fp, n_docs, n_raw_variants, min_id), n_raw ≥ 2.
   */
  def homoglyphGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val norm = trim(regexp_replace(lower(col(textCol)), "\\s+", " "))
    docs.select(col(idCol).as("id"),
        fingerprint(col(textCol)).as("raw_fp"),
        FastHash.fastMd5(translate(norm, ConfusablesFrom, ConfusablesTo)).as("norm_fp"))
      .groupBy("norm_fp")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("raw_fp")).as("n_raw_variants"),
        min(col("id")).as("min_id"))
      .filter(col("n_raw_variants") >= 2)
  }

  /**
   * Per-document host edges — the link-graph extraction stage:
   * one row per (document, distinct registrable host) from the same
   * one-pass URL regexp [[urlAudit]] audits with. This is the input
   * to domain-authority scoring (feed the bipartite doc↔host frame to
   * [[GraphOps.pageRank]]), domain-level frequency caps, and
   * host-weighted sampling. No shuffle — the explode happens inside
   * the projection; downstream consumers aggregate.
   */
  def hostEdges(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val urls = regexp_extract_all(col(textCol), lit("https?://[^\\s]+"), lit(0))
    val hosts = array_distinct(transform(urls,
      u => regexp_extract(u, "^https?://([^/\\s:?#]+)", 1)))
    docs.select(col(idCol).as("doc_id"), explode(hosts).as("host"))
      .filter(col("host") =!= "")
  }

  /**
   * Anchor-text term table — the classic off-page retrieval signal
   * (what OTHER documents call a page outranks what the page calls
   * itself; every early web ranker fed on this): from each doc's
   * `<a href="...">text</a>` links, the (target host, anchor term)
   * occurrence counts. Hosts come through the same scheme-and-host
   * regex as [[hostEdges]]; anchor bodies are lowered and
   * whitespace-tokenized like every counting kernel here. The two
   * `regexp_extract_all` passes over the SAME pattern (group 1 =
   * href, group 2 = body) stay index-aligned by construction, so
   * `arrays_zip` pairs them without a join.
   *
   * Scale: per-doc regex + explode inside the projection, one
   * (host, term)-keyed map-side-combined count — the exchange is
   * vocabulary-sized per host, never corpus-sized.
   * Output: (host, term, cnt).
   */
  def anchorTerms(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val pat = "<a href=\"(https?://[^\"/]+)[^\"]*\"[^>]*>([^<]*)</a>"
    val hrefs = regexp_extract_all(col(textCol), lit(pat), lit(1))
    val bodies = regexp_extract_all(col(textCol), lit(pat), lit(2))
    docs
      .select(explode(arrays_zip(hrefs.as("href"), bodies.as("body"))).as("a"))
      .select(regexp_extract(col("a.href"), "^https?://([^/\\s:?#]+)", 1).as("host"),
        explode(words(lower(col("a.body")))).as("term"))
      .filter(col("host") =!= "")
      .groupBy("host", "term").agg(count(lit(1)).as("cnt"))
  }

  /**
   * The hashing-trick featurizer (Weinberger et al., "Feature Hashing
   * for Large Scale Multitask Learning", ICML 2009): every word
   * instance lands in dimension `md5head(w) mod dims` with sign
   * `±1` from the next hash bit, summed per (doc, dim) — a
   * dimensionality-fixed, vocabulary-free document vector whose
   * collisions are unbiased BECAUSE of the sign bit (E[collision
   * contribution] = 0, the paper's core lemma). The cheap dense
   * featurizer for linear probes and fast near-dup prefilters when
   * no trained embedding exists.
   *
   * Exact-integer contract: the hash is [[FastMd5.md5Head60]]
   * (replayed in SQL as `conv(substring(md5(w),1,15),16,10)`), dim =
   * h mod dims, sign = +1 iff (h div dims) is even — every output is
   * a LONG count sum, no float anywhere. Output is the exploded
   * relational surface (doc_id, dim, val) for every dim a doc's
   * words touched (val can be 0 by cancellation — retained: "touched
   * and cancelled" is information the dense form keeps too).
   * Shape: one projection + one (doc_id, dim)-keyed aggregate;
   * map-side combine bounds the exchange by docs × min(words, dims).
   */
  def hashedFeatures(docs: DataFrame, idCol: String, textCol: String,
                     dims: Int): DataFrame = {
    require(dims >= 2, s"dims >= 2, got $dims")
    val h = FastHash.md5Head60(col("token"))
    docs.select(col(idCol).as("doc_id"),
        explode(words(lower(col(textCol)))).as("token"))
      // IntDiv, not `/`: the hash is 60 bits and double division would
      // lose the low bits past 2^53 — the sign bit must be exact
      .select(col("doc_id"), (h % dims).as("dim"),
        when(IntDiv(h, lit(dims.toLong)) % 2 === 0, lit(1L)).otherwise(lit(-1L)).as("sgn"))
      .groupBy("doc_id", "dim").agg(sum(col("sgn")).as("val"))
  }

  /**
   * BM25 top-`n` retrieval for a fixed term set (Robertson–Spärck
   * Jones probabilistic weighting, the BM25 form of Robertson et al.
   * TREC-3): per matched (doc, term),
   * `idf·tf(k1+1)/(tf + k1(1−b + b·dl/avgdl))` with
   * `idf = ln((N−df+0.5)/(df+0.5))`, summed over the doc's matched
   * terms, global top-n. The ranking function behind every classic
   * search stack — here the benchmark-retrieval primitive next to
   * [[tfidfTop]]'s keyword extraction.
   *
   * Quantization policy ([[tfidfTop]]'s, extended): each per-term
   * score is `floor(1e6·idf·tfpart)` where every input (tf, df, dl,
   * N, ΣdL) is an exact integer and the float chain is written in
   * ONE fixed association mirrored by the oracle —
   * `(N−df+0.5)/(df+0.5)` through `ln`, `tf·(k1+1)` over
   * `tf + k1·(1−b + b·(dl·N)/ΣdL)` — so identical integer tuples
   * quantize identically on both engines; the per-doc score is then
   * a LONG sum (exact, order-free). k1/b arrive in milli units to
   * keep the contract's constants integer-specified.
   *
   * Shape: one corpus scan builds (doc, dl); the term filter prunes
   * the instance explode to query terms ONLY before any shuffle
   * (a `terms`-sized isin — the scan's pushed predicate); df and the
   * corpus length aggregate are broadcast-sized; the final top-n is
   * a TakeOrdered, no global sort materializes.
   */
  def bm25Top(docs: DataFrame, idCol: String, textCol: String,
              terms: Seq[String], n: Int,
              k1Milli: Long = 1200L, bMilli: Long = 750L): DataFrame = {
    require(terms.nonEmpty && terms.distinct == terms, "terms must be distinct")
    // every float constant is milli-integer / 1000.0 — the correctly
    // rounded quotient equals the decimal literal the oracle parses
    // (computing k1 + 1.0 in Scala instead would hit a round-to-even
    // tie and could differ from the SQL literal 2.2 by one ulp)
    val k1 = k1Milli / 1000.0
    val b = bMilli / 1000.0
    val k1p1 = (k1Milli + 1000L) / 1000.0
    val oneMinusB = (1000L - bMilli) / 1000.0
    val base = docs.select(col(idCol).as("doc_id"),
      words(lower(col(textCol))).as("ws"))
    val lens = base.select(col("doc_id"), size(col("ws")).cast("long").as("dl"))
    val corpus = lens.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val tf = base.select(col("doc_id"), size(col("ws")).cast("long").as("dl"),
        explode(col("ws")).as("token"))
      .filter(col("token").isin(terms: _*))
      .groupBy("doc_id", "token")
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
    val df_ = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val scored = tf.join(df_, "token").crossJoin(broadcast(corpus))
      .withColumn("score_micro",
        floor(
          log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
            ((col("tf") * lit(k1p1)) /
              (col("tf") + lit(k1) * (lit(oneMinusB) +
                lit(b) * (col("dl") * col("n_docs")) / col("sum_dl")))) *
            lit(1.0e6)).cast("long"))
    val byDoc = scored.groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum(col("score_micro")).as("score_micro"))
      .orderBy(col("score_micro").desc, col("doc_id").asc)
      .limit(n)
    byDoc.withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("score_micro").desc, col("doc_id").asc)).cast("long"))
      .select(col("rank"), col("doc_id"), col("n_terms"), col("score_micro"))
  }

  /**
   * Markup-strip audit: per document, HTML tag count, the character
   * count after stripping tags, the markup overhead in ppm, and a
   * boilerplate-structure flag (nav/footer/aside elements) — the
   * WET-style extraction check that separates "prose with stray
   * angle brackets" from "an unstripped page that will poison
   * quality scores and n-gram stats". Stripping is the standard
   * `<[^>]+>` pass (tags, not a parser — entities and script BODIES
   * are out of scope and documented so); all counts are single-pass
   * regexp scans, one codegen'd projection, no shuffle.
   */
  def htmlStrip(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val tagPat = "<[^>]+>"
    val stripped = length(regexp_replace(t, tagPat, ""))
    docs.select(col(idCol).as("doc_id"),
        regexp_count(t, lit(tagPat)).cast("long").as("n_tags"),
        stripped.cast("long").as("stripped_chars"),
        when(length(t) > 0,
          IntDiv((length(t) - stripped).cast("long") * 1000000L, length(t).cast("long")))
          .otherwise(lit(0L)).as("markup_ppm"),
        (regexp_count(t, lit("(?i)<(nav|footer|aside)\\b")) > 0).cast("long")
          .as("has_boilerplate"))
  }

  /**
   * Skip-gram co-occurrence: corpus-wide counts of unordered word
   * pairs within a `window`-word span, top `topN` by frequency — the
   * collocation table word-embedding training (word2vec-style) and
   * phrase mining both start from, and a finer template detector than
   * [[pmiBigrams]]' adjacent pairs (replicated boilerplate shows up
   * as impossibly frequent long-range pairs).
   *
   * Plan: one scan; pair generation is a per-doc nested `transform`
   * over index sequences (window is a constant, so each position
   * emits ≤ window pairs — the explode is O(window · tokens), never
   * quadratic); the only shuffle carries (pair, partial count) rows
   * with map-side combine — distinct-pair-sized, text never moves.
   * The final top-N is a single-partition sort of an already
   * aggregate-sized frame.
   */
  def skipgramPairs(docs: DataFrame, textCol: String, window: Int,
                    topN: Int): DataFrame = {
    require(window >= 1 && topN >= 1)
    val ws = words(lower(col(textCol)))
    val pairs = docs.select(ws.as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(explode(flatten(transform(
        sequence(lit(0), size(col("ws")) - 2),
        i => transform(
          sequence(i + 1, least(i + lit(window), size(col("ws")) - 1)),
          j => struct(
            least(element_at(col("ws"), i + 1), element_at(col("ws"), j + 1)).as("w1"),
            greatest(element_at(col("ws"), i + 1), element_at(col("ws"), j + 1)).as("w2"))))))
        .as("p"))
    pairs.groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w1").asc, col("w2").asc)
      .limit(topN)
  }

  /**
   * Crawl-grade URL canonicalization: scheme/host case-folded and
   * stripped (scheme discarded — http/https variants of one resource
   * are one resource to a dedup pass), leading `www.` dropped,
   * fragment dropped, `utm_*` tracking query dropped, trailing slash
   * trimmed; path CASE IS PRESERVED (paths are case-sensitive by
   * RFC 3986, hosts are not). Scheme matching uses explicit char
   * classes, not an inline `(?i)` flag, so the same pattern string
   * runs identically on the JVM and RE2-family engines.
   */
  def canonicalUrl(url: Column): Column = {
    val host = regexp_replace(
      lower(regexp_extract(url, "^[hH][tT][tT][pP][sS]?://([^/?#]+)", 1)),
      "^www\\.", "")
    val path = regexp_replace(
      regexp_extract(url, "^[hH][tT][tT][pP][sS]?://[^/?#]+([^?#]*)", 1),
      "/$", "")
    val query = regexp_extract(url, "\\?([^#]*)", 1)
    // keep a non-tracking query string; drop utm_* params entirely
    val cleanQ = regexp_replace(query, "(^|&)utm_[^&]*", "")
    val q2 = regexp_replace(cleanQ, "^&", "")
    concat(host, path, when(q2 === "", lit("")).otherwise(concat(lit("?"), q2)))
  }

  /**
   * Per-document lexical diversity: token count, type count, hapax
   * count, and the type–token / hapax–token ratios in ppm — the
   * cheapest word-salad and template-spam detector (TTR collapses on
   * repetitive generations, hapax share collapses on boilerplate).
   * Pure integer output (ppm by [[IntDiv]] on exact counts).
   *
   * Plan: one explode, a (doc, token) aggregate, a doc aggregate —
   * both shuffles keyed by doc id, map-side combined; text itself
   * never shuffles. Zero-token docs have no rows to aggregate and
   * drop out, matching the SQL oracle's semantics.
   */
  def typeTokenRatio(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    docs.select(col(idCol).as("id"), explode(words(lower(col(textCol)))).as("w"))
      .groupBy("id", "w").agg(count(lit(1)).as("c"))
      .groupBy("id")
      .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_types"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("id"), col("n_tokens"), col("n_types"), col("n_hapax"),
        IntDiv(col("n_types") * 1000000L, col("n_tokens")).cast("long").as("ttr_ppm"),
        IntDiv(col("n_hapax") * 1000000L, col("n_tokens")).cast("long").as("hapax_ppm"))
  }

  /**
   * Term BURSTINESS (Church–Gale): for the corpus's top-`topN` terms
   * by total frequency, the Fano factor of the per-document count
   * distribution — variance/mean over ALL docs (zeros included).
   * Function words arrive ~Poisson (Fano ≈ 1); content/topical terms
   * BURST (a doc that mentions one tends to repeat it, Fano ≫ 1) —
   * the signal that separates keyword candidates from glue even at
   * equal frequency, and a stopword-list generator that needs no
   * hand-curated list. Exact rational form: with N docs, tf = Σc and
   * S2 = Σc², Fano = (N·S2 − tf²)/(N·tf) — emitted as milli via
   * integer division, no float moments anywhere.
   *
   * Plan: one (doc, term) count aggregate → one term aggregate; the
   * doc count is a one-row broadcast. Top-N is a bounded window.
   */
  def burstiness(docs: DataFrame, idCol: String, textCol: String,
                 topN: Int = 50): DataFrame = {
    require(topN >= 1, s"topN >= 1: $topN")
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val tc = docs
      .select(col(idCol).as("doc_id"), explode(words(lower(col(textCol)))).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
    val terms = tc.groupBy("w")
      .agg(sum("c").as("tf"), count(lit(1)).as("df"),
        sum(col("c") * col("c")).as("s2"))
    val win = org.apache.spark.sql.expressions.Window
      .orderBy(col("tf").desc, col("w").asc)
    terms.crossJoin(broadcast(nDocs))
      .withColumn("rank", row_number().over(win))
      .filter(col("rank") <= topN)
      .select(col("rank").cast("long").as("rank"), col("w").as("term"),
        col("tf"), col("df"),
        IntDiv((col("n_docs") * col("s2") - col("tf") * col("tf")) * 1000L,
          col("n_docs") * col("tf")).cast("long").as("fano_milli"))
  }

  /**
   * Yule's K lexical-repetitiveness characteristic (Yule, "The
   * Statistical Study of Literary Vocabulary", 1944):
   * K = 10⁴ · (Σ_m m²·V(m) − N) / N² over the word-frequency spectrum
   * (V(m) = types occurring m times, N = tokens; Σ m²·V(m) is just
   * Σ c² over per-type counts). Unlike [[typeTokenRatio]], K is
   * approximately LENGTH-INVARIANT — TTR decays with doc length, so a
   * TTR gate mis-ranks long documents; K compares repetitiveness
   * across lengths, which is what a template/degenerate-generation
   * filter actually needs. Exact integers end to end:
   * k_milli = (10⁷·(S2 − N)) div N² (S2 ≤ N², so the numerator is
   * bounded by 10⁷·N² — inside LONG for N up to ~10⁵·3).
   *
   * Plan: same two doc-keyed aggregates as [[typeTokenRatio]]; docs
   * with fewer than 2 tokens report 0 (K is undefined at N ≤ 1).
   */
  def yuleK(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val perDoc = docs
      .select(col(idCol).as("doc_id"), explode(words(lower(col(textCol)))).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_types"),
        sum(col("c") * col("c")).as("s2"))
    docs.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_types"), lit(0L)).as("n_types"),
        coalesce(when(col("n_tokens") >= 2L,
            IntDiv(lit(10000000L) * (col("s2") - col("n_tokens")),
              col("n_tokens") * col("n_tokens")).cast("long")),
          lit(0L)).as("yule_k_milli"))
  }

  /**
   * RAKE keyword extraction (Rose et al. 2010, "Automatic Keyword
   * Extraction from Individual Documents"): candidate phrases are the
   * maximal runs of non-stopword tokens; each word scores
   * `deg(w)/freq(w)` where freq counts its phrase occurrences and deg
   * sums the lengths of the phrases it appears in; a phrase scores
   * the sum of its words' scores. Integerized: word scores are
   * `deg·1000 // freq` milli-units and phrase scores sum those LONGs,
   * so the ranking is engine-exact. Emits the corpus top-`topN`
   * distinct phrases by (score, phrase).
   *
   * Plan: one posexplode; the phrase islands come from the classic
   * gaps-and-islands window (`pos − row_number` per doc over
   * non-stop tokens) — a doc-keyed shuffle; word stats and phrase
   * scores are token-keyed aggregates with map-side combine. The
   * final top-N sorts an already phrase-distinct aggregate. Nothing
   * quadratic; the stopword list is a literal `isin`.
   */
  def rakeKeywords(docs: DataFrame, idCol: String, textCol: String,
                   stopwords: Seq[String], topN: Int): DataFrame = {
    require(topN >= 1 && stopwords.nonEmpty)
    val tok = docs
      .select(col(idCol).as("id"), posexplode(words(lower(col(textCol)))).as(Seq("pos", "w")))
    val byDoc = Window.partitionBy("id").orderBy(col("pos").asc)
    val ns = tok.filter(!col("w").isin(stopwords: _*))
      .withColumn("isl", col("pos") - row_number().over(byDoc))
    val phrases = ns.groupBy("id", "isl")
      .agg(
        concat_ws(" ", transform(array_sort(collect_list(struct(col("pos"), col("w")))),
          p => p.getField("w"))).as("phrase"),
        count(lit(1)).as("plen"))
    val withLen = ns.join(phrases, Seq("id", "isl"))
    val wordScore = withLen.groupBy("w")
      .agg(count(lit(1)).as("freq"), sum("plen").as("deg"))
      .select(col("w"), IntDiv(col("deg") * 1000L, col("freq")).cast("long").as("score_milli"))
    withLen.join(wordScore, "w")
      .groupBy("id", "isl", "phrase", "plen")
      .agg(sum("score_milli").as("score_milli"))
      .groupBy("phrase")
      .agg(count(lit(1)).as("n_occurrences"), max(col("plen")).as("n_words"),
        max(col("score_milli")).as("score_milli"))
      .orderBy(col("score_milli").desc, col("phrase").asc)
      .limit(topN)
      .select(col("phrase"), col("n_words"), col("n_occurrences"), col("score_milli"))
  }

  /**
   * Kneser–Ney continuation counts: for each token, how many DISTINCT
   * left contexts it follows — the "versatility" signal KN smoothing
   * substitutes for raw frequency (a word that appears 1000 times
   * after only one context, like "Francisco", should NOT look
   * probable in new contexts). Emits the top-`topN` tokens by
   * continuation count with `cont·1e6 // |distinct bigrams|` ppm —
   * the unigram continuation probability numerator/denominator of
   * the KN recursion, integer-exact.
   *
   * Plan: the bigram explode is the pmiBigrams zip (per-doc linear),
   * one DISTINCT on (w1, w2) — the only full-width shuffle — then a
   * token-keyed count and a single-row denominator broadcast. The
   * distinct-bigram frame is vocabulary²-bounded in theory but
   * corpus-linear in practice (Heaps' law); at 100 TB the exact
   * distinct swaps for the KMV sketch like t_distinct_n_kmv.
   */
  def knContinuation(docs: DataFrame, textCol: String, topN: Int): DataFrame = {
    require(topN >= 1)
    val toks = docs.select(words(lower(col(textCol))).as("t"))
    val bg = toks
      .select(explode(arrays_zip(
        slice(col("t"), lit(1), greatest(size(col("t")) - 1, lit(0))),
        slice(col("t"), lit(2), greatest(size(col("t")) - 1, lit(0))))).as("bg"))
      .select(col("bg.0").as("w1"), col("bg.1").as("w2"))
      .distinct()
    val total = bg.agg(count(lit(1)).as("n_bi_distinct"))
    bg.groupBy(col("w2").as("token"))
      .agg(count(lit(1)).as("cont_count"))
      .crossJoin(broadcast(total))
      .orderBy(col("cont_count").desc, col("token").asc)
      .limit(topN)
      .select(col("token"), col("cont_count"), col("n_bi_distinct"),
        IntDiv(col("cont_count") * 1000000L, col("n_bi_distinct")).cast("long")
          .as("cont_ppm"))
  }

  /**
   * Multinomial naive-Bayes language identifier, trained and scored
   * INSIDE the engine — the fastText-style classifier stage every
   * curation pipeline runs, as a pure DataFrame plan. Train split =
   * `id % 5 != 0`; per-(lang, token) add-one log-likelihoods and
   * per-lang log-priors are micro-quantized LONGs
   * (`floor(ln(c+1)·1e6) − floor(ln(N_lang+V)·1e6)` — ln of exact
   * integer counts only, the t_pmi precedent), test docs score by
   * integer SUM of token weights (unseen tokens take the lang's
   * add-one floor), argmax by (score, lang). Output: one row per
   * test doc with the true label, prediction and correctness flag.
   *
   * Plan: the weight table is (langs × vocab)-sized — aggregate-
   * shuffled once, then the test-token probe joins on token (the
   * big side never re-shuffles; langs fan out by an explode of the
   * 5-row lang list). At 100 TB the weight table is the thing you'd
   * persist/bucket by token; the probe stays a co-partitioned join.
   * No floats cross an aggregation boundary anywhere.
   */
  def nbLangid(docs: DataFrame, idCol: String, textCol: String,
               langCol: String): DataFrame = {
    val base = docs.select(col(idCol).as("id"), col(langCol).as("lang"),
      words(lower(col(textCol))).as("t"))
    val train = base.filter(col("id") % 5 =!= 0)
    val test = base.filter(col("id") % 5 === 0)
    val trainTok = train.select(col("lang"), explode(col("t")).as("w"))
    val counts = trainTok.groupBy("lang", "w").agg(count(lit(1)).as("c"))
    val langTotals = trainTok.groupBy("lang").agg(count(lit(1)).as("n_tok"))
    val vocabSize = trainTok.select("w").distinct().agg(count(lit(1)).as("v"))
    val priors = train.groupBy("lang").agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(train.agg(count(lit(1)).as("n_train"))))
      .select(col("lang"),
        (floor(log(col("n_docs").cast("double")) * lit(1.0e6)) -
          floor(log(col("n_train").cast("double")) * lit(1.0e6))).cast("long")
          .as("prior_micro"))
    // per-lang add-one denominator and OOV floor
    val langDen = langTotals.crossJoin(broadcast(vocabSize))
      .select(col("lang"),
        floor(log((col("n_tok") + col("v")).cast("double")) * lit(1.0e6)).cast("long")
          .as("den_micro"))
    val weights = counts.join(langDen, "lang")
      .select(col("lang"), col("w"),
        (floor(log((col("c") + 1L).cast("double")) * lit(1.0e6)).cast("long")
          - col("den_micro")).as("w_micro"))
    val testTok = test.select(col("id"), col("lang").as("true_lang"),
      explode(col("t")).as("w"))
    // fan each test token out to every candidate lang, then take the
    // trained weight where the (lang, token) pair was seen and the
    // add-one floor where it was not
    val cand = testTok
      .join(broadcast(langDen.withColumnRenamed("lang", "cand_lang")), lit(true))
      .join(weights.withColumnRenamed("lang", "cand_lang"), Seq("cand_lang", "w"), "left")
      .withColumn("tok_micro", coalesce(col("w_micro"), -col("den_micro")))
    val scored = cand.groupBy(col("id"), col("true_lang"), col("cand_lang"))
      .agg(sum("tok_micro").as("tok_sum"))
      .join(broadcast(priors.withColumnRenamed("lang", "cand_lang")), "cand_lang")
      .withColumn("score_micro", col("tok_sum") + col("prior_micro"))
    val best = Window.partitionBy("id")
      .orderBy(col("score_micro").desc, col("cand_lang").asc)
    scored.withColumn("rn", row_number().over(best))
      .filter(col("rn") === 1)
      .select(col("id"), col("true_lang"), col("cand_lang").as("pred_lang"),
        col("score_micro"),
        when(col("cand_lang") === col("true_lang"), 1L).otherwise(0L).as("correct"))
  }
}
