package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-corpus analysis operators for training-data pipelines:
  * token counting, quality scoring, language ID, fingerprinting.
  * Everything is built from codegen'd `functions._` (split/filter/
  * transform/aggregate) — no UDFs — so the same plan runs on a cluster
  * without python/JVM serialization walls.
  */
object TextAnalysis {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = filter(split(text, "\\s+"), t => t =!= "")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count estimate: word-piece regex matching —
    * letter runs, digit runs, and individual punctuation — the classic
    * pre-tokenizer shape (GPT-2-style) without a learned vocab.
    * (Alternation kept lookaround-free so it runs on RE2 engines too.)
    */
  def subwordCount(text: Column): Column =
    regexp_count(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"))

  /** Quality features: token count, mean token length, stopword ratio,
    * punctuation ratio, and a composite score in [0,1] (simple
    * interpretable heuristic: long-enough docs with natural stopword
    * density and low punctuation noise score high).
    */
  def qualityFeatures(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val nTok = size(toks)
    val stop = size(filter(toks, t => t.isin(Stopwords.en: _*)))
    val punct = length(regexp_replace(col(textCol), "[a-zA-Z0-9\\s]", ""))
    df.select(
      col(idCol),
      nTok.as("n_tokens"),
      (length(col(textCol)).cast("double") / greatest(nTok, lit(1)).cast("double")).as("chars_per_token"),
      (stop.cast("double") / greatest(nTok, lit(1)).cast("double")).as("stopword_ratio"),
      (punct.cast("double") / greatest(length(col(textCol)), lit(1)).cast("double")).as("punct_ratio"))
  }

  def qualityScore(df: DataFrame, idCol: String, textCol: String): DataFrame =
    qualityFeatures(df, idCol, textCol).withColumn("quality",
      least(col("n_tokens").cast("double") / 64.0, lit(1.0)) * 0.4 +
        least(col("stopword_ratio") * 4.0, lit(1.0)) * 0.4 +
        (lit(1.0) - least(col("punct_ratio") * 5.0, lit(1.0))) * 0.2)

  /** Language ID via stopword-hit voting: score(text, lang) = number of
    * tokens in lang's stopword list; argmax wins, 'und' when no list
    * scores > 0. An n-gram-frequency heuristic in the same spirit as
    * public langid tools, expressible as pure column ops.
    */
  def languageId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val scored = Stopwords.all.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(size(filter(toks, t => t.isin(words: _*))).as("score"), lit(lang).as("lang"))
    }
    // array_max on struct(score, lang): max score, ties broken by lang desc —
    // deterministic; require score > 0 else 'und'
    val best = array_max(array(scored: _*))
    df.select(col(idCol),
      when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und")).as("lang_pred"),
      best.getField("score").as("lang_score"))
  }

  /** Order-sensitive document fingerprint: polynomial rolling hash over
    * whitespace tokens, h' = (h*31 + xxhash64(token) mod p) mod p with
    * p = 1e9+7, computed with `aggregate` (sequential fold, fully
    * deterministic). Magnitudes stay < 2^35 so the arithmetic is safe
    * under Spark 4's default ANSI overflow checking.
    */
  def fingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => pmod(acc * lit(31L) + pmod(xxhash64(t), lit(1000000007L)), lit(1000000007L)))

  /** Winnowing fingerprint set (Schleimer–Wilkerson–Aiken): md5 each
    * sliding k-word gram, take the minimum hash of every window of `w`
    * consecutive gram hashes, output the distinct selected hashes — one
    * row per (doc, fingerprint). Local edits only perturb nearby
    * windows, so near-dup docs share most fingerprints. Min/ordering is
    * on fixed-width hex strings — engine-portable, so an md5-capable
    * SQL oracle reproduces the set exactly. Docs shorter than k words
    * fall back to a single whole-text gram.
    */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int = 4, w: Int = 3): DataFrame = {
    val src = Dedup.spread(df)
    // Each intermediate array is BOUND as a projected column before the
    // next higher-order function consumes it. A HOF lambda inlines its
    // operand subtree — with `grams` inline, `slice(grams, j+1, w)`
    // re-evaluated EVERY gram's md5 (and the tokenizer under it) once
    // per window: O(windows · grams) md5 calls per document instead of
    // O(grams). Measured 57 ms/doc → sub-ms on ~50-word docs (q55 task
    // time 314 s → ~6 s at sf0.1). CollapseProject keeps the project
    // boundaries: a non-cheap expression referenced more than once is
    // not re-inlined. Values are unchanged — same expressions, same
    // fingerprints, same oracle hash.
    val words = tokens(col(textCol))
    val w0 = col("__winnow_words")
    val grams = when(size(w0) < k, array(md5(concat_ws(" ", w0))))
      .otherwise(transform(sequence(lit(0), size(w0) - k),
        i => md5(concat_ws(" ", slice(w0, i + 1, lit(k))))))
    val g0 = col("__winnow_grams")
    val wins = when(size(g0) < w, array(array_min(g0)))
      .otherwise(transform(sequence(lit(0), size(g0) - w),
        j => array_min(slice(g0, j + 1, lit(w)))))
    src.select(col(idCol), words.as("__winnow_words"))
      .select(col(idCol), grams.as("__winnow_grams"))
      .select(col(idCol), explode(array_sort(array_distinct(wins))).as("fp"))
  }

  /** Gopher-style repetition signal: the fraction of word n-grams that
    * are duplicates of an earlier n-gram in the same doc (0 = no
    * repetition, →1 = the doc loops). Boilerplate, keyword stuffing and
    * degenerate generations score high and get filtered before
    * training. Pure per-row expression — scan-parallel, no shuffle.
    */
  def repetitionRatio(text: Column, n: Int): Column = {
    val words = tokens(text)
    val grams =
      if (n == 1) words
      else when(size(words) < n, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), size(words) - n),
          i => concat_ws(" ", slice(words, i + 1, lit(n)))))
    when(size(grams) > 0,
      lit(1.0) - size(array_distinct(grams)).cast("double") / size(grams).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Canonical text normalization for dedup/matching: lowercase, strip
    * everything but alphanumerics and whitespace, collapse whitespace
    * runs, trim. The usual pre-pass before exact/fuzzy dedup so case
    * and punctuation differences do not defeat content hashing.
    *
    * Whitespace is the EXPLICIT class `[ \t\n\r]`, not `\s`: Java's
    * `\s` includes vertical tab (\x0B) while RE2's does not, so a `\s`
    * formulation silently diverges between engines on such input —
    * the explicit class behaves identically everywhere (\x0B and \f
    * count as punctuation and are stripped on both).
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 \\t\\n\\r]", ""), "[ \\t\\n\\r]+", " "))

  /** BM25 relevance of every document against a FIXED small term set —
    * the retrieval-scoring step of a data pipeline (mining docs relevant
    * to a topic, building retrieval eval sets, source-quality probes).
    *
    * Okapi BM25 with the Lucene-style non-negative idf:
    * {{{ score = Σ_t ln((N - df_t + 0.5)/(df_t + 0.5) + 1)
    *             · tf_t·(k1+1) / (tf_t + k1·(1 - b + b·dl/avgdl)) }}}
    *
    * Built for exact cross-engine replay: per-term tf is an array-filter
    * count on the doc's own tokens (no explode/regroup), corpus stats
    * (N, avgdl, df_t) are ONE aggregate row broadcast back, and the
    * per-doc score sums the terms in fixed declaration order — every
    * float op has a deterministic operand order, so an external SQL
    * engine reproduces it bit-for-bit (modulo 1-ulp `ln`, absorbed by
    * the caller's round-to-6). All counts stay integer-exact in doubles.
    *
    * Scale shape: one corpus scan for the stats row, one for scoring —
    * no shuffle wider than the single-row aggregate, no join by key.
    * Docs matching no term are dropped (the integer tf sum, not the
    * float score, decides — no boundary risk).
    */
  def bm25(df: DataFrame, idCol: String, textCol: String, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    require(terms.size <= 16, "bm25 is for small fixed term sets; use vocabulary() for corpus-wide stats")
    val toks = tokens(col(textCol))
    val tfCols = terms.indices.map(i =>
      size(filter(toks, t => t === terms(i))).as(s"__tf$i"))
    val withTf = Dedup.spread(df).select(
      (col(idCol) +: size(toks).cast("double").as("__dl") +: tfCols): _*)
    // one-row corpus statistics; every value is an integer or a ratio of
    // integers, so the aggregate is order-insensitive and exact
    val statAggs = avg(col("__dl")).as("__avgdl") +:
      terms.indices.map(i => sum((col(s"__tf$i") > 0).cast("long")).cast("double").as(s"__df$i"))
    val stats = withTf.agg(count(lit(1)).cast("double").as("__n"), statAggs: _*)
    val matched = terms.indices.map(i => col(s"__tf$i")).reduce(_ + _) > 0
    // (1-b) and (k1+1) fold to doubles scala-side; the oracle writes the
    // same literals so both engines evaluate the identical constant
    val norm = lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl"))
    val score = terms.indices.map { i =>
      val tf = col(s"__tf$i").cast("double")
      val idf = log((col("__n") - col(s"__df$i") + lit(0.5)) / (col(s"__df$i") + lit(0.5)) + lit(1.0))
      idf * tf * lit(k1 + 1.0) / (tf + norm)
    }.reduce(_ + _)
    withTf.filter(matched)
      .crossJoin(broadcast(stats))
      .select(col(idCol), score.as("bm25"))
  }

  /** PII patterns, chosen to parse identically under Java regex and
    * RE2-family engines: no lookaround, no backrefs, explicit classes.
    * `\b` is the ASCII word boundary in both.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhonePattern = "\\b[0-9]{3}-[0-9]{4}\\b"

  /** PII detection + redaction — the scrubbing pass a training-data
    * pipeline runs before anything ships to a model: count and mask
    * email addresses, IPv4 addresses, and phone-shaped numbers.
    *
    * Counts are independent pattern counts on the RAW text; redaction
    * applies sequentially (email → IPv4 → phone, most-specific first,
    * so an address inside an email is consumed by the email mask and
    * never double-counted in the output). Pure per-row projection — a
    * full scan and nothing else at any corpus size; no shuffle, no UDF,
    * stays inside whole-stage codegen.
    */
  def piiScrub(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val text = col(textCol)
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(text, EmailPattern, "<EMAIL>"),
          Ipv4Pattern, "<IP>"),
        PhonePattern, "<PHONE>")
    df.select(
      col(idCol),
      regexp_count(text, lit(EmailPattern)).cast("long").as("n_emails"),
      regexp_count(text, lit(Ipv4Pattern)).cast("long").as("n_ips"),
      regexp_count(text, lit(PhonePattern)).cast("long").as("n_phones"),
      redacted.as("redacted"))
  }

  /** Corpus vocabulary: per-token document frequency (docs containing
    * it) and collection frequency (total occurrences), top `k` by df —
    * the table BPE/vocab training, stopword discovery, and the
    * n-gram-Jaccard document-frequency cutoff all read. Explode + one
    * groupBy; `countDistinct` plans the standard two-phase distinct
    * aggregate, so the shuffle carries (tok, doc) pairs once, not
    * full texts.
    */
  def vocabulary(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    Dedup.spread(df)
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("tok"))
      .groupBy("tok")
      .agg(countDistinct("id").as("df"), count(lit(1)).as("cf"))
      .orderBy(col("df").desc, col("tok"))
      .limit(k)

  /** Hashed-token LINEAR quality classifier — the fasttext-style model
    * filter of CCNet/RefinedWeb-class pipelines (a linear model over
    * hashing-trick token features deciding keep/drop). Model weights
    * here are a DETERMINISTIC closed-form function of the bucket id
    * (the stand-in for trained weights, same stub contract as the
    * multimodal decode: the pipeline plumbing — tokenize → hashing
    * trick → margin → decision — is real and exactly checkable;
    * swapping in trained weights means replacing the milli-weight
    * expression with a broadcast lookup).
    *
    * EXACTNESS ACROSS ENGINES: the per-token weight is an INTEGER
    * milli-weight m(b) = (b·2654435761) mod 1997 − 998 ∈ [−998, 998]
    * over md5-derived buckets, so the document margin Σ m(b(tok)) is a
    * bigint sum — associative, order-free, bit-identical anywhere —
    * and the keep decision (margin ≥ 0) can never straddle a float
    * boundary. Only the REPORTED score divides (by 998·n_tokens) — a
    * raw quotient of exact integers, bit-identical in any engine and
    * deliberately NOT rounded (rounding a bit-identical value can
    * only add representable-tie divergence).
    *
    * 100 TB shape: a pure per-row projection (tokenize + hash +
    * integer fold) — no shuffle, no state, full scan parallelism; the
    * "model" is a closed-form expression, so nothing broadcasts.
    */
  def hashedLinearQuality(df: DataFrame, idCol: String, textCol: String,
      buckets: Int = 1024, salt: String = "qc"): DataFrame = {
    require(buckets >= 1, "buckets >= 1")
    val toks = filter(split(lower(col(textCol)), "[^a-z0-9]+"), t => length(t) > 0)
    def bucketOf(t: Column): Column =
      conv(substring(md5(concat(lit(s"$salt:"), t)), 1, 8), 16, 10)
        .cast("long") % buckets
    def milli(t: Column): Column = (bucketOf(t) * lit(2654435761L)) % 1997L - 998L
    df.select(col(idCol),
        size(toks).cast("long").as("n_tokens"),
        aggregate(transform(toks, milli _), lit(0L), (acc, x) => acc + x).as("margin"))
      .select(col(idCol), col("n_tokens"), col("margin"),
        when(col("n_tokens") > 0,
          // RAW quotient, deliberately un-rounded: margin and n are
          // exact integers, so the division is bit-identical in any
          // engine — rounding can only ADD divergence at representable
          // ties (the q158 sf0.1 lesson)
          col("margin").cast("double") / (lit(998.0) * col("n_tokens")))
          .otherwise(lit(0.0)).as("score"),
        (col("n_tokens") > 0 && col("margin") >= 0).as("keep"))
  }

  /** The classifier family's tokenization: lowercase alphanumeric
    * runs (shared by [[hashedLinearQuality]], [[trainBucketWeights]]
    * and [[hashedLinearQualityWeighted]] so train and apply always
    * agree on the token stream).
    */
  def qcTokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0)

  /** The md5 hash bucket of one classifier token — the feature index
    * of the hashed-linear family.
    */
  def qcBucket(tok: Column, buckets: Int, salt: String): Column =
    conv(substring(md5(concat(lit(s"$salt:"), tok)), 1, 8), 16, 10)
      .cast("long") % buckets

  /** TRAIN the hashed-linear classifier's bucket weights from a
    * labeled corpus — the "externally trained weights" path the
    * closed-form [[hashedLinearQuality]] documents: a centroid-
    * difference (naive-Bayes-flavored) milli-weight per bucket,
    *
    *   w(b) = ⌊1000 · (pos_b − neg_b) / (pos_b + neg_b)⌋ ∈ [−1000, 1000]
    *
    * where pos_b/neg_b count the bucket's token OCCURRENCES in
    * positively/negatively labeled docs. Kept integer-exact across
    * engines: the floor runs on a shifted non-negative numerator
    * (`(x + 1000·n) div n − 1000`), so truncating and flooring
    * division agree — no rounding-mode divergence.
    *
    * 100 TB shape: one explode + one groupBy whose result is bounded
    * by `buckets` (≤ thousands), with map-side partial aggregation —
    * the classic "train on the cluster, serve as a broadcast" split.
    * Output: (bucket, milli_weight).
    */
  def trainBucketWeights(df: DataFrame, textCol: String, label: Column,
      buckets: Int = 1024, salt: String = "qc"): DataFrame =
    df.select(explode(qcTokens(col(textCol))).as("tok"), label.as("good"))
      .select(qcBucket(col("tok"), buckets, salt).as("bucket"),
        when(col("good"), 1L).otherwise(0L).as("g"))
      .groupBy("bucket")
      .agg(sum("g").as("pos"), (count(lit(1)) - sum("g")).as("neg"))
      .select(col("bucket"),
        (expr("(1000 * (pos - neg) + 1000 * (pos + neg)) div (pos + neg)") - 1000L)
          .as("milli_weight"))

  /** APPLY an external (bucket → milli-weight) table — trained by
    * [[trainBucketWeights]] or anywhere else — as the classifier's
    * model: the weights fold into ONE map row and ride a broadcast
    * (the documented "trained weights slot in as a broadcast lookup"
    * seam); buckets absent from the table weigh 0. Same integer-
    * margin exactness contract as the closed-form variant: the margin
    * is a bigint sum, and the reported score is the RAW quotient
    * margin / (1000·n_tokens) — one double division of two exact
    * integers, bit-identical in any engine. Deliberately NOT rounded:
    * both engines compute the identical quotient, so rounding can
    * only ADD divergence (Spark's HALF_UP and DuckDB's rounding split
    * a representable tie differently — observed at sf0.1). Output
    * schema matches [[hashedLinearQuality]]:
    * (id, n_tokens, margin, score, keep).
    */
  def hashedLinearQualityWeighted(df: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, buckets: Int = 1024, salt: String = "qc"): DataFrame = {
    require(buckets >= 1, "buckets >= 1")
    val model = weights.agg(
      map_from_entries(collect_list(struct(col("bucket"), col("milli_weight")))).as("m"))
    val toks = qcTokens(col(textCol))
    df.crossJoin(broadcast(model))
      .select(col(idCol),
        size(toks).cast("long").as("n_tokens"),
        aggregate(transform(toks, t =>
            coalesce(element_at(col("m"), qcBucket(t, buckets, salt)), lit(0L))),
          lit(0L), (acc, x) => acc + x).as("margin"))
      .select(col(idCol), col("n_tokens"), col("margin"),
        when(col("n_tokens") > 0,
          col("margin").cast("double") / (lit(1000.0) * col("n_tokens")))
          .otherwise(lit(0.0)).as("score"),
        (col("n_tokens") > 0 && col("margin") >= 0).as("keep"))
  }

  /** Character trigrams of a string as an array, in order; docs shorter
    * than 3 chars contribute the whole text as their single "gram" so
    * every doc scores.
    */
  def charTrigrams(text: Column): Column =
    when(length(text) >= 3,
      transform(sequence(lit(1), length(text) - 2), i => text.substr(i, lit(3))))
      .otherwise(array(text))

  /** Character-trigram language-model quality score — the statistical
    * perplexity-proxy filter of CCNet-class pipelines (a char n-gram LM
    * scores every doc; improbable-gram docs are gibberish/boilerplate
    * and get dropped), kept integer-exact for cross-engine replay:
    * the "model" is the corpus trigram occurrence count, and a doc's
    * score is the MEAN corpus count over its own trigram occurrences —
    * a bigint sum divided once at the end, so the score is bit-identical
    * in any engine (no log-sum float ordering to diverge on). Rare-gram
    * (low-score) docs are exactly the high-perplexity tail.
    *
    * 100 TB shape: the model table is bounded by the CHARSET cubed, not
    * the corpus (ASCII ⇒ ≲2M distinct trigrams), so it folds into one
    * broadcastable map row: pass 1 aggregates counts with map-side
    * combine (the only corpus-wide shuffle carries distinct trigrams
    * per partition, not occurrences); pass 2 is a pure scan that scores
    * each doc against the broadcast map with a sequential integer fold.
    * No per-occurrence join, no regroup by doc.
    */
  def charTrigramLmScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val src = Dedup.spread(df)
    val tris = charTrigrams(col(textCol))
    // pass 1: the trigram "model" — charset-bounded, folded to ONE map row
    val model = src.select(explode(tris).as("tri"))
      .groupBy("tri").agg(count(lit(1)).as("c"))
      .agg(map_from_entries(collect_list(struct(col("tri"), col("c")))).as("m"))
    // pass 2: scan-side scoring against the broadcast map; the fold is
    // sequential over the doc's grams — pure long arithmetic, exact
    src.crossJoin(broadcast(model))
      .select(col(idCol),
        size(tris).cast("long").as("n_tri"),
        aggregate(tris, lit(0L), (acc, t) => acc + element_at(col("m"), t)).as("tri_mass"))
      .select(col(idCol), col("n_tri"), col("tri_mass"),
        (col("tri_mass").cast("double") / col("n_tri")).as("lm_score"))
  }

  /** Adjacent-symbol pair frequencies — the counting step of BPE vocab
    * training (the most frequent pair is the next merge): within every
    * whitespace token, count all adjacent character pairs corpus-wide,
    * return the top `k` by count (ties broken by pair, so the cut is a
    * total order and deterministic in any engine).
    *
    * 100 TB shape: flatten + explode + one groupBy whose map-side
    * partial aggregation condenses each partition to its distinct pairs
    * (charset-squared-bounded) before the shuffle; the top-k plans as
    * TakeOrderedAndProject — per-partition heaps, never a global sort.
    */
  def bpePairCounts(df: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1, "k >= 1")
    val pairs = flatten(transform(tokens(col(textCol)), w =>
      when(length(w) >= 2,
        transform(sequence(lit(1), length(w) - 1), i => w.substr(i, lit(2))))
        .otherwise(array().cast("array<string>"))))
    Dedup.spread(df).select(explode(pairs).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(k)
  }

  /** Materialize the inverted index itself — (term, df, cf, sorted
    * posting list) — the artifact a search/retrieval serving layer
    * loads, and what the n-gram-Jaccard/decontamination joins consume
    * implicitly. One explode + one groupBy; `collect_set` bounds each
    * row by the term's document frequency, which is exactly the
    * quantity the posting-list guards exist to cap — pass the df cutoff
    * DOWNSTREAM of this table (filter on `df`) or shard fat terms
    * before serving; materializing a corpus-wide stopword's full
    * posting list in one row is the anti-pattern this table makes
    * visible (its `df` column IS the guard's input).
    */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String): DataFrame =
    Dedup.spread(df)
      .select(col(idCol).cast("long").as("id"), explode(tokens(col(textCol))).as("term"))
      .groupBy("term")
      .agg(countDistinct("id").as("df"), count(lit(1)).as("cf"),
        sort_array(collect_set(col("id"))).as("postings"))

  /** N-gram novelty score: the fraction of each document's DISTINCT
    * word n-grams that appear in no other document — the inverse
    * boilerplate signal (template-heavy docs score near 0, original
    * prose near 1). Inverted-index shape: distinct (doc, gram) rows,
    * gram document-frequencies with map-side combine, one join back;
    * the ratio divides exact integers once per doc. Docs with fewer
    * than `n` words have no grams and score null (no fabricated
    * denominator). Output: (id, n_grams, n_unique, novelty).
    */
  def ngramNovelty(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val grams = Dedup.spread(df)
      .select(col(idCol).cast("long").as("id"),
        explode(Dedup.wordShingles(col(textCol), n)).as("gram"))
    val gdf = grams.groupBy("gram").agg(count(lit(1)).as("gdf"))
    val perDoc = grams.join(gdf, "gram")
      .groupBy("id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("gdf") === 1L, 1L).otherwise(0L)).as("n_unique"))
    df.select(col(idCol).cast("long").as("id"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_unique"), lit(0L)).as("n_unique"),
        when(col("n_grams").isNotNull,
          // raw quotient of two exact integers — bit-identical in any
          // engine, so rounding would only add tie risk
          col("n_unique").cast("double") / col("n_grams").cast("double"))
          .as("novelty"))
  }

  /** Top-`k` terms per group by occurrence count — per-domain
    * vocabulary profiles (drift monitoring, domain fingerprints). One
    * explode + one (group, term) count with map-side combine, then the
    * bounded TopK aggregate per group: ≤ k rows per (group, partition)
    * on the final shuffle — never a per-group window over the full
    * vocabulary. Rank semantics: count DESC, then term id... counts
    * are longs; ties break by the term's md5-surrogate, exposed so the
    * caller (and the oracle) can replay the exact cut.
    * Output: (group, term, cnt, rank).
    */
  def topTermsByGroup(df: DataFrame, groupCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k >= 1")
    val counts = Dedup.spread(df)
      .select(col(groupCol).as("group"), explode(tokens(col(textCol))).as("term"))
      .groupBy("group", "term").agg(count(lit(1)).as("cnt"))
    // ties must break on a NUMERIC surrogate (TopK carries long ids):
    // the md5-derived term id — deterministic and oracle-replayable
    val withId = counts.withColumn("tid",
      conv(substring(md5(col("term")), 1, 15), 16, 10).cast("long"))
    // TopK ranks by (score DESC, id ASC): score = cnt, id = tid
    val top = withId.groupBy("group")
      .agg(graft.functions.TopK.topK(k)(col("cnt").cast("double"), col("tid")).as("top"))
      .select(col("group"), posexplode(col("top")))
      .select(col("group"), col("col.id").as("tid"),
        col("col.score").cast("long").as("cnt"), (col("pos") + 1).as("rank"))
    top.join(withId.select(col("group"), col("term"), col("tid")), Seq("group", "tid"))
      .select(col("group"), col("term"), col("cnt"), col("rank").cast("int").as("rank"))
  }

  /** Pairwise vocabulary Jaccard between groups — "how lexically
    * similar are two sources": |V_a ∩ V_b| / |V_a ∪ V_b| over the
    * groups' distinct-term sets. The intersection comes from the term
    * self-join on the (group, term) distinct table (terms are the join
    * key — postings-shaped, never group×group×vocab), union sizes from
    * the inclusion–exclusion identity. Integer set sizes; ONE division
    * per pair row. Output: (ga, gb, n_common, n_union, jaccard) for
    * ga < gb.
    */
  def vocabJaccardPairs(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val vocab = Dedup.spread(df)
      .select(col(groupCol).as("g"), explode(tokens(col(textCol))).as("term"))
      .distinct()
    val sizes = vocab.groupBy("g").agg(count(lit(1)).as("nv"))
    val common = vocab.join(vocab.select(col("g").as("g2"), col("term")), "term")
      .filter(col("g") < col("g2"))
      .groupBy(col("g").as("ga"), col("g2").as("gb"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(broadcast(sizes.select(col("g").as("ga"), col("nv").as("na"))), "ga")
      .join(broadcast(sizes.select(col("g").as("gb"), col("nv").as("nb"))), "gb")
      .select(col("ga"), col("gb"), col("n_common"),
        (col("na") + col("nb") - col("n_common")).as("n_union"),
        round(col("n_common").cast("double") /
          (col("na") + col("nb") - col("n_common")).cast("double"), 6).as("jaccard"))
  }

  /** TF-IDF sparse retrieval: top-`k` most similar corpus docs per
    * query doc, scored by the inner product of tf·idf term vectors —
    * the SPARSE complement of the dense ANN tiers (BM25 above scores a
    * fixed tiny term set; this joins full document vectors through an
    * inverted index).
    *
    * EXACTNESS: idf is quantized ONCE per distinct term to integer
    * milli-units (round(ln(N/df)·10³)), so each candidate's score
    * Σ_t tf_q(t)·tf_d(t)·idf_milli(t)² is a sum of integers —
    * aggregated as DECIMAL(38,0), associative and order-free. Ranking
    * casts that score to double for the bounded top-k aggregate, which
    * is EXACT while |score| < 2⁵³ (≈9·10¹⁵ — holds through ~30k-token
    * docs at milli idf; far past this corpus). Ties break by id, as
    * everywhere in the ANN family.
    *
    * 100 TB shape: postings (id, term, tf) form via explode + one
    * groupBy; the candidate generator is the postings EQUI-JOIN on term
    * (query side is the small one — broadcast), partial per-(qid,id)
    * sums condense map-side, and the top-k cut is the same bounded
    * aggregate as the ANN tiers: ≤ k rows per (query, partition) on
    * the shuffle, never a full-corpus window. The df table doubles as
    * the frequency guard: terms with df > `maxDocFreq` drop out of
    * BOTH sides (stopword postings are where sparse joins go
    * quadratic), mirroring the n-gram-Jaccard guard contract.
    */
  def tfidfTopK(corpus: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String,
      k: Int, maxDocFreq: Option[Int] = None): DataFrame = {
    require(k >= 1, "k >= 1")
    val d380 = org.apache.spark.sql.types.DecimalType(38, 0)
    def postings(df: DataFrame, id: Column, text: Column, idName: String) =
      Dedup.spread(df).select(id.cast("long").as(idName), explode(tokens(text)).as("term"))
        .groupBy(idName, "term").agg(count(lit(1)).as(s"tf_$idName"))
    val cp = postings(corpus, col(idCol), col(textCol), "id")
    // corpus size as a one-row broadcast (same shape as bm25's stats row)
    val n = corpus.agg(count(lit(1)).cast("double").as("n_docs"))
    val dfT = cp.groupBy("term").agg(count(lit(1)).as("df"))
    val guarded = maxDocFreq.map(m => dfT.filter(col("df") <= m)).getOrElse(dfT)
    val idf = guarded.crossJoin(broadcast(n))
      .select(col("term"),
        round(log(col("n_docs") / col("df").cast("double")) * 1e3, 0)
          .cast("long").as("idf_milli"))
    val qp = postings(queries, col(qidCol), col(qtextCol), "qid")
    // weight the SMALL side once; the corpus side picks idf up through
    // the same term join it already pays for candidates
    val qw = broadcast(qp.join(idf, "term")
      .select(col("term"), col("qid"), (col("tf_qid") * col("idf_milli") * col("idf_milli")).as("qpart")))
    val scored = cp.join(qw, "term")
      .filter(col("id") =!= col("qid"))
      .groupBy("qid", "id")
      .agg(sum((col("qpart") * col("tf_id")).cast(d380)).as("score"))
    scored.groupBy("qid")
      .agg(graft.functions.TopK.topK(k)(col("score").cast("double"), col("id")).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), col("col.id").as("id"),
        col("col.score").cast(d380).as("score"),
        (col("pos") + 1).cast("int").as("rank"))
  }
}

/** Minimal public stopword lists (top function words) per language —
  * enough signal for corpus-level language voting.
  */
object Stopwords {
  val en: Seq[String] = Seq("the", "of", "and", "to", "a", "in", "is", "it", "that", "for", "on", "with", "as", "at", "by", "this")
  val de: Seq[String] = Seq("der", "die", "das", "und", "zu", "den", "nicht", "von", "sie", "ist", "mit", "sich", "auf", "für", "ein", "im")
  val fr: Seq[String] = Seq("le", "la", "les", "de", "des", "et", "un", "une", "du", "en", "est", "que", "qui", "dans", "pour", "pas")
  val es: Seq[String] = Seq("el", "la", "los", "las", "de", "y", "que", "en", "un", "una", "es", "por", "con", "para", "su", "no")
  val zh: Seq[String] = Seq("的", "了", "是", "我", "不", "在", "他", "有", "这", "个", "上", "们", "来", "到", "时", "大")
  val all: Map[String, Seq[String]] = Map("en" -> en, "de" -> de, "fr" -> fr, "es" -> es, "zh" -> zh)
}
