package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (SURVEY.md
  * §2.10): pairwise similarity on bounded candidate sets, n-gram
  * language ID, quality scoring, token counting, and document
  * fingerprinting. All pure Catalyst expressions; candidate pairing is
  * always bucket-local (prefix-hash buckets), never all-pairs.
  */
object TextAnalysis extends QueryModule {

  /** Candidate pairs: docs sharing an 80-char-prefix hash bucket. */
  private def prefixPairs(s: org.apache.spark.sql.SparkSession, d: String) = {
    val pre = Tables.documents(s, d)
      .select(col("doc_id"), col("text"),
        md5(substring(col("text"), 1, 80)).as("ph"))
    pre.as("a").join(pre.as("b"),
        col("a.ph") === col("b.ph") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"),
        col("a.text").as("text1"), col("b.text").as("text2"))
  }

  private val duckPrefixPairs = """
      pairs AS (
        SELECT a.doc_id AS doc1, b.doc_id AS doc2,
               a.text AS text1, b.text AS text2
        FROM documents a JOIN documents b
          ON md5(substr(a.text, 1, 80)) = md5(substr(b.text, 1, 80))
         AND a.doc_id < b.doc_id)"""

  /** Token-set Jaccard similarity over prefix-bucket candidates. */
  val textJaccard = QueryDef(
    "q_text_jaccard",
    (s, d) =>
      prefixPairs(s, d)
        // bind token arrays to attributes first: jaccard() references
        // each side twice, and an inline tokens(text) would re-run the
        // split+filter per reference (HOF lambdas are interpreted — no
        // common-subexpression elimination across evaluations)
        .select(col("doc1"), col("doc2"),
          array_distinct(TF.tokens(col("text1"))).as("t1"),
          array_distinct(TF.tokens(col("text2"))).as("t2"))
        .select(col("doc1"), col("doc2"),
          round(TF.jaccard(col("t1"), col("t2")), 4).as("token_jaccard"))
        .orderBy(col("doc1"), col("doc2")),
    Some(s"""
      WITH $duckPrefixPairs
      SELECT doc1, doc2,
             round(CAST(len(list_intersect(t1, t2)) AS DOUBLE)
                   / len(list_distinct(list_concat(t1, t2))), 4) AS token_jaccard
      FROM (
        SELECT doc1, doc2,
               list_distinct(list_filter(string_split(text1, ' '), t -> t <> '')) AS t1,
               list_distinct(list_filter(string_split(text2, ' '), t -> t <> '')) AS t2
        FROM pairs)
      ORDER BY doc1, doc2
    """))

  /** Word-3-gram (shingle) Jaccard over the same candidate buckets —
    * order-sensitive where token-set Jaccard is bag-of-words.
    */
  val ngramJaccard = QueryDef(
    "q_text_ngram_jaccard",
    (s, d) => {
      graft.functions.expressions.WordNgrams.register(s)
      prefixPairs(s, d)
        // staged projections (toks → shingles → jaccard): each stage's
        // array is bound to an attribute so the next stage's HOF
        // lambdas read a materialized array instead of re-evaluating
        // the producer expression per element (see q_text_jaccard)
        .select(col("doc1"), col("doc2"),
          TF.tokens(col("text1")).as("toks1"),
          TF.tokens(col("text2")).as("toks2"))
        .select(col("doc1"), col("doc2"),
          TF.shinglesFast(col("toks1"), 3).as("s1"),
          TF.shinglesFast(col("toks2"), 3).as("s2"))
        .select(col("doc1"), col("doc2"),
          round(TF.jaccard(col("s1"), col("s2")), 4).as("shingle_jaccard"))
        .orderBy(col("doc1"), col("doc2"))
    },
    Some(s"""
      WITH $duckPrefixPairs,
      sh AS (
        SELECT doc1, doc2,
               list_distinct(list_transform(generate_series(1, len(t1) - 2),
                 i -> t1[i] || ' ' || t1[i + 1] || ' ' || t1[i + 2])) AS s1,
               list_distinct(list_transform(generate_series(1, len(t2) - 2),
                 i -> t2[i] || ' ' || t2[i + 1] || ' ' || t2[i + 2])) AS s2
        FROM (
          SELECT doc1, doc2,
                 list_filter(string_split(text1, ' '), t -> t <> '') AS t1,
                 list_filter(string_split(text2, ' '), t -> t <> '') AS t2
          FROM pairs))
      SELECT doc1, doc2,
             round(CAST(len(list_intersect(s1, s2)) AS DOUBLE)
                   / len(list_distinct(list_concat(s1, s2))), 4) AS shingle_jaccard
      FROM sh
      ORDER BY doc1, doc2
    """))

  /** ASYMMETRIC containment — |A∩B| / |A| per direction — the
    * quote/partial-duplicate detector Jaccard misses: a paragraph
    * fully embedded in a much longer document scores near-zero
    * Jaccard (the union is huge) but containment 1.0 in the
    * short→long direction. Same prefix-bucket candidates and staged
    * shingle projections as q_text_ngram_jaccard; zero-shingle docs
    * (< 3 tokens) yield NULL, never a division error. Both directions
    * emitted — dedup pipelines keep the superset and drop the
    * contained side.
    */
  val textContainment = QueryDef(
    "q_text_containment",
    (s, d) => {
      graft.functions.expressions.WordNgrams.register(s)
      prefixPairs(s, d)
        .select(col("doc1"), col("doc2"),
          TF.tokens(col("text1")).as("toks1"),
          TF.tokens(col("text2")).as("toks2"))
        .select(col("doc1"), col("doc2"),
          TF.shinglesFast(col("toks1"), 3).as("s1"),
          TF.shinglesFast(col("toks2"), 3).as("s2"))
        .select(col("doc1"), col("doc2"),
          size(array_intersect(col("s1"), col("s2"))).cast("long").as("n_shared"),
          when(size(col("s1")) > 0,
            round(size(array_intersect(col("s1"), col("s2"))).cast("double")
              / size(col("s1")).cast("double"), 4)).as("containment_1in2"),
          when(size(col("s2")) > 0,
            round(size(array_intersect(col("s1"), col("s2"))).cast("double")
              / size(col("s2")).cast("double"), 4)).as("containment_2in1"))
        .orderBy(col("doc1"), col("doc2"))
    },
    Some(s"""
      WITH $duckPrefixPairs,
      sh AS (
        SELECT doc1, doc2,
               list_distinct(list_transform(generate_series(1, len(t1) - 2),
                 i -> t1[i] || ' ' || t1[i + 1] || ' ' || t1[i + 2])) AS s1,
               list_distinct(list_transform(generate_series(1, len(t2) - 2),
                 i -> t2[i] || ' ' || t2[i + 1] || ' ' || t2[i + 2])) AS s2
        FROM (
          SELECT doc1, doc2,
                 list_filter(string_split(text1, ' '), t -> t <> '') AS t1,
                 list_filter(string_split(text2, ' '), t -> t <> '') AS t2
          FROM pairs))
      SELECT doc1, doc2,
             CAST(len(list_intersect(s1, s2)) AS BIGINT) AS n_shared,
             CASE WHEN len(s1) > 0
                  THEN round(CAST(len(list_intersect(s1, s2)) AS DOUBLE) / len(s1), 4)
             END AS containment_1in2,
             CASE WHEN len(s2) > 0
                  THEN round(CAST(len(list_intersect(s1, s2)) AS DOUBLE) / len(s2), 4)
             END AS containment_2in1
      FROM sh
      ORDER BY doc1, doc2
    """))

  /** Corpus-wide n-gram NOVELTY — per document, the fraction of its
    * distinct 3-shingles appearing in NO other document. The
    * df-at-shingle-level curation signal: boilerplate-heavy docs
    * score near 0 (everything they say, something else already says),
    * original content near 1 — the per-doc keep/drop twin of the
    * pairwise containment/Jaccard detectors. Scale: explode distinct
    * shingles once, one groupBy on the shingle key (bucket-local,
    * same shuffle contract as q_tf_idf's document frequency), join
    * the df back on the same key, per-doc aggregate. Linear in total
    * shingle count, never pairwise.
    */
  val ngramNovelty = QueryDef(
    "q_ngram_novelty",
    (s, d) => {
      graft.functions.expressions.WordNgrams.register(s)
      val sh = Tables.documents(s, d)
        .select(col("doc_id"), TF.tokens(col("text")).as("toks"))
        .select(col("doc_id"), explode(TF.shinglesFast(col("toks"), 3)).as("sh"))
      val df = sh.groupBy(col("sh")).agg(countDistinct(col("doc_id")).as("df"))
      sh.join(df, Seq("sh"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
        .select(col("doc_id"), col("n_shingles"), col("n_unique"),
          round(col("n_unique").cast("double") / col("n_shingles").cast("double"),
            4).as("novelty"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH sh AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
                 generate_series(1, len(t) - 2),
                 i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]))) AS sh
        FROM (
          SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
          FROM documents)),
      df AS (SELECT sh, count(DISTINCT doc_id) AS df FROM sh GROUP BY sh)
      SELECT doc_id,
             count(*) AS n_shingles,
             CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
             round(CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                   / count(*), 4) AS novelty
      FROM sh JOIN df USING (sh)
      GROUP BY doc_id
      ORDER BY doc_id
    """))

  /** Character-bigram language ID: build a top-20-bigram profile per
    * language from a deterministic 5% corpus sample, score each doc's
    * distinct bigrams against every profile, predict the argmax
    * (lang-asc tiebreak). Self-contained, deterministic, and
    * join-based — the profile side is tiny (|langs|×20) and
    * broadcastable at any corpus size.
    *
    * The profile pass reads only `doc_id % 20 = 0` (a deterministic
    * sample, NOT rand(): reproducible and oracle-mirrorable): a
    * character-frequency profile converges with a tiny sample, so
    * burning a full-corpus bigram explode on it is waste — at 100 TB
    * the scoring pass is the only full read, and the profile sample
    * rate shrinks with corpus size.
    */
  val langId = QueryDef(
    "q_lang_id",
    (s, d) => {
      // Profile pass: sampled explode → partial-agg collapses map-side.
      // Scoring pass: NO explode at all — the per-language profiles
      // collapse to 20-element arrays (|langs| rows, broadcast), each
      // doc crossJoins those |langs| rows, and hits =
      // size(array_intersect(distinct doc bigrams, profile array)).
      // That replaces the |corpus|×|bigrams-per-doc| exploded join
      // (~2000 rows/doc) with |langs| rows/doc — the scoring pass
      // stays one map-side codegen stage at any corpus size.
      // native kernel: raw (with-duplicates) bigram list — the
      // interpreted transform∘sequence twin was the query's dominant
      // cost (LangIdProbe: 1.6s of string building at sf0.1)
      graft.functions.expressions.CharNgrams.register(s)
      def bigrams(c: org.apache.spark.sql.Column) = call_function(
        graft.functions.expressions.CharNgrams.name, c, lit(2))
      val docs = Tables.documents(s, d)
      val profile = docs
        .filter(pmod(col("doc_id"), lit(20)) === 0)
        .select(col("lang"), explode(bigrams(col("text"))).as("bigram"))
        .groupBy(col("lang"), col("bigram"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("lang")).orderBy(col("cnt").desc, col("bigram"))))
        .filter(col("rnk") <= 20)
        .groupBy(col("lang"))
        .agg(collect_list(col("bigram")).as("profile_bigrams"))
        .select(col("lang").as("profile_lang"), col("profile_bigrams"))
      // (r8 perf note: the real cost here was never the intersect —
      // it was the O(len²) char-indexing inside the old CharNgrams
      // kernel, fixed in NgramKernels.charNgrams. An explode + join +
      // countDistinct rewrite of this scoring pass was measured and
      // REJECTED: streaming the 38M raw bigrams through a join +
      // distinct shuffle costs ~2.5× this map-side form once the
      // kernel is linear.)
      val score = docs
        .select(col("doc_id"), array_distinct(bigrams(col("text"))).as("db"))
        .crossJoin(broadcast(profile))
        .select(col("doc_id"), col("profile_lang"),
          size(array_intersect(col("db"), col("profile_bigrams"))).cast("long").as("hits"))
        .filter(col("hits") > 0) // join semantics: no shared bigram → no score row
      val pred = score
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("hits").desc, col("profile_lang"))))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("profile_lang").as("predicted"))
      Tables.documents(s, d).select(col("doc_id"), col("lang"))
        .join(pred, Seq("doc_id"))
        .select(col("doc_id"), col("lang"), col("predicted"),
          (col("lang") === col("predicted")).as("correct"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH bg AS (
        SELECT doc_id, lang,
               unnest(list_transform(generate_series(1, CAST(length(text) AS INT) - 1),
                 i -> substr(text, i, 2))) AS bigram
        FROM documents),
      profile AS (
        SELECT lang AS profile_lang, bigram
        FROM (
          SELECT lang, bigram,
                 row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, bigram) AS rnk
          FROM bg WHERE doc_id % 20 = 0 GROUP BY lang, bigram)
        WHERE rnk <= 20),
      docbg AS (SELECT DISTINCT doc_id, bigram FROM bg),
      score AS (
        SELECT d.doc_id, p.profile_lang, count(*) AS hits
        FROM docbg d JOIN profile p USING (bigram)
        GROUP BY d.doc_id, p.profile_lang),
      pred AS (
        SELECT doc_id, profile_lang AS predicted
        FROM (
          SELECT doc_id, profile_lang, row_number() OVER (PARTITION BY doc_id
                   ORDER BY hits DESC, profile_lang) AS rn
          FROM score)
        WHERE rn = 1)
      SELECT d.doc_id, d.lang, p.predicted, d.lang = p.predicted AS correct
      FROM documents d JOIN pred p USING (doc_id)
      ORDER BY d.doc_id
    """))

  /** Corpus breakdown by language: the summary a pipeline dashboard
    * reports after language ID.
    */
  val langStats = QueryDef(
    "q_lang_stats",
    (s, d) =>
      Tables.documents(s, d)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("doc_count"),
          round(avg(col("n_chars")), 4).as("avg_chars"),
          countDistinct(col("source")).as("sources"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"))
        .orderBy(col("lang")),
    Some("""
      SELECT lang, count(*) AS doc_count,
             round(avg(n_chars), 4) AS avg_chars,
             count(DISTINCT source) AS sources,
             min(n_chars) AS min_chars,
             max(n_chars) AS max_chars
      FROM documents
      GROUP BY lang
      ORDER BY lang
    """))

  /** Quality scoring: length/token/short-token/whitespace ratios
    * combined into a single score — the filter signal of a data
    * pipeline. Ratios rounded at 6 (beyond exact decimal width).
    */
  val textQuality = QueryDef(
    "q_text_quality",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"),
          TF.tokens(col("text")).as("toks"),
          length(col("text")).cast("long").as("len_chars"),
          (length(col("text")) - length(regexp_replace(col("text"), " ", "")))
            .cast("long").as("n_spaces"))
        .select(col("doc_id"), col("len_chars"), col("n_spaces"),
          size(col("toks")).cast("long").as("n_tokens"),
          size(filter(col("toks"), t => length(t) <= 3)).cast("long").as("n_short"))
        .select(col("doc_id"), col("n_tokens"),
          (col("n_short").cast("double") / col("n_tokens")).as("short_raw"),
          (col("n_spaces").cast("double") / col("len_chars")).as("space_raw"),
          ((col("len_chars") - col("n_spaces")).cast("double")
            / col("n_tokens")).as("avg_raw"))
        // score is computed from the RAW ratios (as the oracle does);
        // rounding first would feed different doubles into the formula
        .select(col("doc_id"), col("n_tokens"),
          round(col("short_raw"), 6).as("short_ratio"),
          round(col("space_raw"), 6).as("space_ratio"),
          round(col("avg_raw"), 6).as("avg_token_len"),
          round(lit(1.0) - col("short_raw") * 0.5 - col("space_raw") * 0.25, 6)
            .as("quality_score"))
        .orderBy(col("doc_id")),
    Some("""
      SELECT doc_id, n_tokens,
             round(CAST(n_short AS DOUBLE) / n_tokens, 6) AS short_ratio,
             round(CAST(n_spaces AS DOUBLE) / len_chars, 6) AS space_ratio,
             round(CAST(len_chars - n_spaces AS DOUBLE) / n_tokens, 6) AS avg_token_len,
             round(1.0 - (CAST(n_short AS DOUBLE) / n_tokens) * 0.5
                       - (CAST(n_spaces AS DOUBLE) / len_chars) * 0.25, 6) AS quality_score
      FROM (
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS len_chars,
               CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_spaces,
               CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS n_tokens,
               CAST(len(list_filter(string_split(text, ' '),
                 t -> t <> '' AND length(t) <= 3)) AS BIGINT) AS n_short
        FROM documents)
      ORDER BY doc_id
    """))

  /** Token counting two ways: whitespace split and a BPE-ish regex
    * (letter runs / digit runs / single other-chars).
    */
  val tokenStats = QueryDef(
    "q_token_stats",
    (s, d) =>
      Tables.documents(s, d)
        // ws_tokens bound once: tokens(text) is referenced twice below
        .select(col("doc_id"), col("text"),
          size(TF.tokens(col("text"))).cast("long").as("ws_tokens"))
        .select(col("doc_id"),
          col("ws_tokens"),
          expr("cast(size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)) AS bigint)")
            .as("bpe_tokens"),
          round(length(col("text")).cast("double")
            / col("ws_tokens"), 6).as("chars_per_token"))
        .orderBy(col("doc_id")),
    Some("""
      SELECT doc_id,
             CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS ws_tokens,
             CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS bpe_tokens,
             round(CAST(length(text) AS DOUBLE)
                   / len(list_filter(string_split(text, ' '), t -> t <> '')), 6) AS chars_per_token
      FROM documents
      ORDER BY doc_id
    """))

  /** Document fingerprint (winnowing-lite): minimum md5 over all
    * 8-char rolling windows — a locality-sensitive signature that
    * near-identical docs share with high probability.
    *
    * Plan shape (r7 verdict item 4): every output is a PER-DOCUMENT
    * function of that document's text alone, so the whole query is a
    * map-only projection — the codegen'd CharNgrams kernel feeds
    * array higher-order functions (`array_min∘transform(md5)` for the
    * signature, `array_distinct` for the exact shingle count) and no
    * row is ever exploded or shuffled. The previous form exploded
    * every shingle occurrence (~n_chars rows per doc) and shuffled
    * them into a two-phase countDistinct aggregate: correct, but at
    * 100 TB that shuffle is ~the corpus size × 9. Docs shorter than
    * the window produce no shingles and are filtered, matching the
    * oracle's GROUP-BY-over-unnest semantics (no rows → no group).
    */
  val docFingerprint = QueryDef(
    "q_doc_fingerprint",
    (s, d) =>
      {
      graft.functions.expressions.CharNgrams.register(s)
      Tables.documents(s, d)
        .select(col("doc_id"),
          call_function(graft.functions.expressions.CharNgrams.name,
            col("text"), lit(8)).as("sh"))
        .filter(size(col("sh")) > 0)
        .select(col("doc_id"),
          array_min(transform(col("sh"), x => md5(x))).as("fingerprint"),
          size(array_distinct(col("sh"))).cast("long").as("distinct_shingles"))
        .orderBy(col("doc_id"))
      },
    Some("""
      SELECT doc_id, min(md5(shingle)) AS fingerprint,
             count(DISTINCT shingle) AS distinct_shingles
      FROM (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, CAST(length(text) AS INT) - 7),
                 i -> substr(text, i, 8))) AS shingle
        FROM documents)
      GROUP BY doc_id
      ORDER BY doc_id
    """))

  /** Capstone: the full training-data cleaning pipeline in one plan —
    * quality filter → exact dedup (keep lowest doc_id per text hash) →
    * near-dup drop (keep lowest doc_id per 80-char-prefix hash) →
    * embedding-availability join → per-language summary. Each stage
    * is a window/join on a hash bucket; the whole pipeline is three
    * shuffles regardless of corpus size.
    */
  val cleanCorpus = QueryDef(
    "q_clean_corpus",
    (s, d) => {
      val quality = Tables.documents(s, d)
        .withColumn("toks", TF.tokens(col("text")))
        .filter(size(col("toks")) >= 20
          && size(filter(col("toks"), t => length(t) <= 3))
            < size(col("toks")) * 0.8)
      val wText = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
      val wPrefix = Window.partitionBy(md5(substring(col("text"), 1, 80)))
        .orderBy(col("doc_id"))
      val kept = quality
        .withColumn("first_exact", first(col("doc_id")).over(wText))
        .withColumn("first_prefix", first(col("doc_id")).over(wPrefix))
        .filter(col("doc_id") === col("first_exact")
          && col("doc_id") === col("first_prefix"))
      kept
        .join(Tables.embeddings(s, d).select(col("vec_id")),
          col("doc_id") === col("vec_id"), "left")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("kept_docs"),
          count(col("vec_id")).as("with_embedding"),
          round(avg(col("n_chars")), 4).as("avg_chars"))
        .orderBy(col("lang"))
    },
    Some("""
      WITH quality AS (
        SELECT doc_id, text, lang, n_chars
        FROM (
          SELECT doc_id, text, lang, n_chars,
                 len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tokens,
                 len(list_filter(string_split(text, ' '),
                     t -> t <> '' AND length(t) <= 3)) AS n_short
          FROM documents)
        WHERE n_tokens >= 20 AND n_short < n_tokens * 0.8),
      kept AS (
        SELECT doc_id, lang, n_chars
        FROM (
          SELECT doc_id, lang, n_chars,
                 first_value(doc_id) OVER (PARTITION BY md5(text) ORDER BY doc_id) AS first_exact,
                 first_value(doc_id) OVER (PARTITION BY md5(substr(text, 1, 80)) ORDER BY doc_id) AS first_prefix
          FROM quality)
        WHERE doc_id = first_exact AND doc_id = first_prefix)
      SELECT lang, count(*) AS kept_docs,
             count(vec_id) AS with_embedding,
             round(avg(n_chars), 4) AS avg_chars
      FROM kept LEFT JOIN embeddings ON doc_id = vec_id
      GROUP BY lang
      ORDER BY lang
    """))

  /** TF-IDF: term frequency from per-doc token counts, inverse
    * document frequency from corpus document frequency, top-3 terms
    * per doc for a bounded probe set.
    *
    * Scale notes: the corpus document count is a LAZY one-row
    * `agg(count)` cross-joined into the plan (no driver-side action at
    * plan build — one Spark job total per run, and the subtree is a
    * 1-row broadcast-nested-loop, free). The df table is |vocabulary|
    * rows — billions of tokens at web scale, so it is NOT broadcast:
    * the filtered probe side (doc_id < 10, ≤ a few thousand rows) is
    * the broadcastable one, and AQE picks that up on its own from
    * runtime stats.
    */
  val tfIdf = QueryDef(
    "q_tf_idf",
    (s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), explode(TF.tokens(col("text"))).as("token"))
      val nDocs = Tables.documents(s, d)
        .agg(count(lit(1)).cast("double").as("n_docs"))
      val tf = toks.groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("tf"))
      val df = toks.select(col("doc_id"), col("token")).distinct()
        .groupBy(col("token")).agg(count(lit(1)).as("df"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("token"))
      tf.filter(col("doc_id") < 10)
        .join(df, Seq("token"))
        .crossJoin(nDocs)
        .select(col("doc_id"), col("token"),
          round(col("tf") * log(col("n_docs") / col("df")), 6).as("tfidf"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("doc_id"), col("rn").as("rank"), col("token"), col("tfidf"))
        .orderBy(col("doc_id"), col("rank"))
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
        FROM documents),
      tf AS (
        SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token),
      df AS (
        SELECT token, count(*) AS df
        FROM (SELECT DISTINCT doc_id, token FROM toks) GROUP BY token),
      n AS (SELECT count(*) AS n_docs FROM documents),
      scored AS (
        SELECT doc_id, token,
               round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
        FROM tf JOIN df USING (token) CROSS JOIN n
        WHERE doc_id < 10)
      SELECT doc_id, rank, token, tfidf
      FROM (
        SELECT doc_id, token, tfidf,
               row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rank
        FROM scored)
      WHERE rank <= 3
      ORDER BY doc_id, rank
    """))

  /** Class-balanced capping: keep at most 30 docs per language
    * (deterministic doc_id order) — the downsample-the-majority-class
    * op a training-mixture builder runs. One window pass on the
    * stratum key; at 100 TB the per-class cap bounds output size
    * regardless of input skew.
    */
  val sampleBalanced = QueryDef(
    "q_sample_balanced",
    (s, d) => {
      val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          row_number().over(w).cast("long").as("rn"))
        .filter(col("rn") <= 30)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("kept"),
          min(col("doc_id")).as("first_kept"),
          max(col("doc_id")).as("last_kept"))
        .orderBy(col("lang"))
    },
    Some("""
      SELECT lang, count(*) AS kept,
             min(doc_id) AS first_kept, max(doc_id) AS last_kept
      FROM (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
        FROM documents)
      WHERE rn <= 30
      GROUP BY lang
      ORDER BY lang
    """))

  /** Mixture rebalancing — the training-data "data mixing" op: sample
    * each language down to a UNIFORM share of a half-corpus token
    * budget (target per lang = total_tokens / (2·n_langs)), so
    * over-represented sources shrink and under-represented ones keep
    * everything. The per-lang keep-rate becomes an EXACT integer
    * byte threshold t = (256·total) div (2·n·lang_tokens) (bigint
    * div — no float rate anywhere), and each doc keeps iff its md5
    * hex prefix sorts below t (the q_sample_weighted idiom, with the
    * same 'g' sentinel for rate ≥ 1). Deterministic, map-side, stable
    * across retries — and the expected kept-token mass per language
    * is t/256 · lang_tokens ≈ the uniform target. At 100 TB: one
    * token-count aggregate, a ≤|langs|-row threshold table joined
    * back (AQE broadcasts it), zero RNG, zero shuffle beyond the
    * final rollup.
    */
  val mixtureSample = QueryDef(
    "q_mixture_sample",
    (s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          size(TF.tokens(col("text"))).cast("long").as("tok"))
      val perLang = toks.groupBy(col("lang"))
        .agg(sum(col("tok")).as("lang_tokens"))
      val stats = toks.agg(sum(col("tok")).as("corpus_tokens"),
        countDistinct(col("lang")).as("nl"))
      val th = perLang.crossJoin(stats)
        .withColumn("t",
          expr("(256 * corpus_tokens) div (2 * nl * lang_tokens)"))
        .withColumn("thresh", when(col("t") >= 256, lit("g"))
          .otherwise(lower(lpad(hex(col("t")), 2, "0"))))
        .select(col("lang"), col("lang_tokens"), col("t"), col("thresh"))
      toks.join(th, Seq("lang"))
        .withColumn("kept",
          substring(md5(col("doc_id").cast("string")), 1, 2) < col("thresh"))
        .groupBy(col("lang"))
        .agg(max(col("lang_tokens")).as("lang_tokens"),
          max(col("t")).as("threshold_byte"),
          count(when(col("kept"), 1)).as("kept_docs"),
          coalesce(sum(when(col("kept"), col("tok"))), lit(0L)).as("kept_tokens"))
        .orderBy(col("lang"))
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, lang,
               CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
                 AS tok
        FROM documents),
      per_lang AS (
        SELECT lang, CAST(sum(tok) AS BIGINT) AS lang_tokens
        FROM toks GROUP BY lang),
      stats AS (
        SELECT CAST(sum(tok) AS BIGINT) AS corpus_tokens,
               CAST(count(DISTINCT lang) AS BIGINT) AS nl
        FROM toks),
      th AS (
        SELECT lang, lang_tokens,
               (256 * corpus_tokens) // (2 * nl * lang_tokens) AS t,
               CASE WHEN (256 * corpus_tokens) // (2 * nl * lang_tokens) >= 256
                    THEN 'g'
                    ELSE lower(lpad(hex((256 * corpus_tokens)
                           // (2 * nl * lang_tokens)), 2, '0')) END AS thresh
        FROM per_lang CROSS JOIN stats)
      SELECT t.lang,
             CAST(max(th.lang_tokens) AS BIGINT) AS lang_tokens,
             CAST(max(th.t) AS BIGINT) AS threshold_byte,
             count(*) FILTER (substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 2) < th.thresh)
               AS kept_docs,
             CAST(coalesce(sum(t.tok) FILTER (substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 2)
               < th.thresh), 0) AS BIGINT) AS kept_tokens
      FROM toks t JOIN th ON t.lang = th.lang
      GROUP BY t.lang
      ORDER BY t.lang
    """))

  /** The corpus-pipeline CAPSTONE: quality gate → exact dedup →
    * leak-proof split → per-(split, lang) doc/token accounting, as
    * ONE composed plan — the end-to-end flow a training-data job
    * runs nightly, demonstrating that the §2.10 stages compose
    * without materialization barriers. Stage contracts reused
    * verbatim: the ≥5-token gate (q_quality_rules' floor), md5(text)
    * exact dedup keeping the smallest doc_id (q_dedup_exact /
    * q_dedup_keep_best convention — a partitioned window, parallel
    * per hash group), and the q_train_split hash split (12/2/2
    * sixteenths by md5 first hex). One shuffle per stage boundary
    * that needs one (dedup's hash group, the final rollup); the gate
    * and split are map-side.
    */
  val corpusPipeline = QueryDef(
    "q_corpus_pipeline",
    (s, d) => {
      val w = Window.partitionBy(col("h")).orderBy(col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("text"),
          size(TF.tokens(col("text"))).cast("long").as("tok"))
        .filter(col("tok") >= 5)
        .withColumn("h", md5(col("text")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .withColumn("split",
          when(substring(md5(col("doc_id").cast("string")), 1, 1) <= "b", "train")
            .when(substring(md5(col("doc_id").cast("string")), 1, 1) <= "d", "val")
            .otherwise("test"))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"))
        .orderBy(col("split"), col("lang"))
    },
    Some("""
      WITH gated AS (
        SELECT * FROM (
          SELECT doc_id, lang, text,
                 CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
                   AS tok
          FROM documents)
        WHERE tok >= 5),
      deduped AS (
        SELECT doc_id, lang, tok,
               row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM gated
        QUALIFY rn = 1)
      SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'b' THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'd' THEN 'val'
                  ELSE 'test' END AS split,
             lang, count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS n_tokens
      FROM deduped
      GROUP BY split, lang
      ORDER BY split, lang
    """))

  /** Vocabulary coverage: the top-25 corpus tokens by frequency with
    * each token's cumulative share of all token occurrences — the
    * curve a tokenizer/vocab builder reads to pick a vocab size.
    * Token counts partial-aggregate map-side; the top-25 slice is
    * sort+limit (TakeOrderedAndProject — per-partition heaps, no
    * global sort), and only THAT 25-row slice enters the
    * single-partition cumulative window. A global running window over
    * the full |vocabulary| table would be a one-partition sort at
    * web-scale vocab sizes — deliberately avoided.
    */
  val vocabCoverage = QueryDef(
    "q_vocab_coverage",
    (s, d) => {
      val counts = Tables.documents(s, d)
        .select(explode(TF.tokens(col("text"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      val total = counts.agg(sum(col("cnt")).as("total"))
      val top25 = counts.orderBy(col("cnt").desc, col("token")).limit(25)
      val w = Window.orderBy(col("cnt").desc, col("token"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      top25.crossJoin(total)
        .withColumn("rank", row_number()
          .over(Window.orderBy(col("cnt").desc, col("token"))).cast("long"))
        .withColumn("cum_share",
          (sum(col("cnt")).over(w).cast("double") / col("total")).cast("float"))
        .select(col("rank"), col("token"), col("cnt"), col("cum_share"))
        .orderBy(col("rank"))
    },
    Some("""
      WITH counts AS (
        SELECT token, count(*) AS cnt
        FROM (SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
              FROM documents)
        GROUP BY token),
      t AS (SELECT sum(cnt) AS total FROM counts)
      SELECT rank, token, cnt, cum_share
      FROM (
        SELECT token, cnt,
               row_number() OVER (ORDER BY cnt DESC, token) AS rank,
               CAST(CAST(sum(cnt) OVER (ORDER BY cnt DESC, token
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                 / total AS FLOAT) AS cum_share
        FROM counts, t)
      WHERE rank <= 25
      ORDER BY rank
    """))

  /** Deterministic train/val/test split: each doc lands in a split by
    * its md5 hex prefix (0-b → train 12/16, c-d → val 2/16, e-f →
    * test 2/16), reported per language × split. Hash-based splitting
    * is THE correct at-scale pattern: reproducible across reruns and
    * engines, stable under repartitioning, and leak-proof (a doc can
    * never drift between splits the way rand()-splits do on retry).
    * Pure map-side + one bounded aggregation.
    */
  val trainSplit = QueryDef(
    "q_train_split",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("lang"),
          when(substring(md5(col("doc_id").cast("string")), 1, 1) <= "b", "train")
            .when(substring(md5(col("doc_id").cast("string")), 1, 1) <= "d", "val")
            .otherwise("test").as("split"))
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("docs"))
        .orderBy(col("lang"), col("split")),
    Some("""
      SELECT lang, split, count(*) AS docs
      FROM (
        SELECT lang,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'b' THEN 'train'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'd' THEN 'val'
                    ELSE 'test' END AS split
        FROM documents)
      GROUP BY lang, split
      ORDER BY lang, split
    """))

  /** GROUP-aware split — q_train_split's leakage-safe sibling: the
    * split key is the GROUP (user_id), not the row, so every event of
    * a user lands in the same split by construction (the "split by
    * author/session/source, never by example" ML-hygiene rule —
    * row-level splits leak near-duplicate rows of one entity across
    * train/test). Same md5 hash-prefix assignment contract as
    * q_train_split: reproducible across engines/retries, pure
    * map-side, stable under repartitioning. One aggregation shuffle;
    * countDistinct(user) adds the usual partial-distinct expansion,
    * still one exchange.
    */
  val groupSplit = QueryDef(
    "q_group_split",
    (s, d) =>
      Tables.events(s, d)
        .select(col("user_id"), col("value"),
          when(substring(md5(col("user_id").cast("string")), 1, 1) <= "b", "train")
            .when(substring(md5(col("user_id").cast("string")), 1, 1) <= "d", "val")
            .otherwise("test").as("split"))
        .groupBy(col("split"))
        .agg(countDistinct(col("user_id")).as("users"),
          count(lit(1)).as("events"),
          centsSum(col("value")).as("value_sum"))
        .withColumn("events_per_user",
          (col("events").cast("double") / col("users")).cast("float"))
        .orderBy(col("split")),
    Some(s"""
      SELECT split, count(DISTINCT user_id) AS users, count(*) AS events,
             ${centsSumSql("value")} AS value_sum,
             CAST(CAST(count(*) AS DOUBLE) / count(DISTINCT user_id) AS FLOAT)
               AS events_per_user
      FROM (
        SELECT user_id, value,
               CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) <= 'b' THEN 'train'
                    WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) <= 'd' THEN 'val'
                    ELSE 'test' END AS split
        FROM events)
      GROUP BY split
      ORDER BY split
    """))

  /** Decontamination check: which TEST documents share a 5-gram with
    * any TRAIN document (the benchmark-contamination scan every
    * training-data pipeline runs before eval). Splits come from the
    * same hash rule as q_train_split; overlap detection joins distinct
    * 5-gram md5s of test docs against the train side's — a hash
    * equi-join on the shingle digest, never a text scan of pairs. At
    * 100 TB the train shingle table is huge but the join is
    * shuffle-partitioned on the digest; the test side is tiny by
    * construction.
    */
  val contamination = QueryDef(
    "q_contamination",
    (s, d) => {
      val split = Tables.documents(s, d)
        .select(col("doc_id"), col("text"),
          when(substring(md5(col("doc_id").cast("string")), 1, 1) <= "b", "train")
            .when(substring(md5(col("doc_id").cast("string")), 1, 1) <= "d", "val")
            .otherwise("test").as("split"))
      // 16-hex-char (64-bit) digest slice: halves the distinct/join
      // shuffle payload vs full md5; collision odds at even 10^9 grams
      // are ~1e-20 per pair — and a collision only over-reports
      // contamination (conservative direction for this scan)
      // tokens bound to an attribute before shingling: inline
      // shingles5(tokens(text)) re-runs the split+filter for every
      // element_at inside the (interpreted) transform lambda — ~15×
      // slower on this corpus (ContamProbe: 5.8s → 0.4s for the
      // train-side explode at sf0.1)
      graft.functions.expressions.WordNgrams.register(s)
      def grams(df: org.apache.spark.sql.DataFrame) = df
        .select(col("doc_id"), TF.tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          explode(TF.shinglesFast(col("toks"), 5)).as("g"))
        .select(col("doc_id"), substring(md5(col("g")), 1, 16).as("gh"))
      val trainGrams = grams(split.filter(col("split") === "train"))
        .select(col("gh")).distinct()
      grams(split.filter(col("split") === "test"))
        .join(trainGrams, Seq("gh"), "left_semi")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("shared_grams"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH split AS (
        SELECT doc_id, text,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'b' THEN 'train'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'd' THEN 'val'
                    ELSE 'test' END AS split
        FROM documents),
      toks AS (
        SELECT doc_id, split, list_filter(string_split(text, ' '), t -> t <> '') AS toks
        FROM split),
      grams AS (
        SELECT doc_id, split,
               substr(md5(g), 1, 16) AS gh
        FROM (
          SELECT doc_id, split,
                 unnest(list_distinct(list_transform(
                   generate_series(1, len(toks) - 4),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4]))) AS g
          FROM toks)),
      train_grams AS (SELECT DISTINCT gh FROM grams WHERE split = 'train')
      SELECT doc_id, count(*) AS shared_grams
      FROM grams
      WHERE split = 'test' AND gh IN (SELECT gh FROM train_grams)
      GROUP BY doc_id
      ORDER BY doc_id
    """))

  /** Corpus profiling (the text-table SUMMARIZE): doc count, language
    * cardinality, exact duplicate-text count, and length/token
    * distribution in one map-side-combining pass — the health check a
    * pipeline runs on every ingest batch.
    */
  val profileDocuments = QueryDef(
    "q_profile_documents",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("text"),
          length(col("text")).cast("long").as("len"),
          size(TF.tokens(col("text"))).cast("long").as("ntok"))
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("lang")).as("n_langs"),
          (count(lit(1)) - countDistinct(md5(col("text")))).as("exact_dup_docs"),
          min(col("len")).as("len_min"),
          max(col("len")).as("len_max"),
          round(avg(col("len")), 2).as("len_avg"),
          min(col("ntok")).as("tok_min"),
          max(col("ntok")).as("tok_max")),
    Some("""
      SELECT count(*) AS n_docs,
             count(DISTINCT lang) AS n_langs,
             count(*) - count(DISTINCT md5(text)) AS exact_dup_docs,
             min(len) AS len_min, max(len) AS len_max,
             round(avg(len), 2) AS len_avg,
             min(ntok) AS tok_min, max(ntok) AS tok_max
      FROM (
        SELECT lang, text,
               CAST(length(text) AS BIGINT) AS len,
               CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS ntok
        FROM documents)
    """))

  /** Within-document repetition signals (the Gopher-style repetition
    * gates): duplicate-token fraction, duplicate-bigram fraction, and
    * top-token share per document. Heavily repetitious machine text
    * scores high on all three. Pure map-side array math over bound
    * token arrays (native bigrams), plus one explode→two-level-agg for
    * the per-doc modal token count — linear at any corpus size.
    * Ratios are int/int with denominators ≤ 100, whose exact decimals
    * terminate within 6 places — round(6) is engine-safe here.
    */
  val repetition = QueryDef(
    "q_repetition",
    (s, d) => {
      graft.functions.expressions.WordNgrams.register(s)
      val base = Tables.documents(s, d)
        .select(col("doc_id"), TF.tokens(col("text")).as("toks"))
        .select(col("doc_id"), col("toks"),
          call_function(graft.functions.expressions.WordNgrams.name,
            col("toks"), lit(2)).as("g2"))
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("n_tokens"),
          size(array_distinct(col("toks"))).cast("long").as("n_distinct"),
          size(col("g2")).cast("long").as("n_bigrams"),
          size(array_distinct(col("g2"))).cast("long").as("nd_bigrams"))
      val top = Tables.documents(s, d)
        .select(col("doc_id"), explode(TF.tokens(col("text"))).as("tok"))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id")).agg(max(col("c")).as("top_token_cnt"))
      base.join(top, Seq("doc_id"))
        .select(col("doc_id"), col("n_tokens"),
          round(lit(1.0) - col("n_distinct").cast("double") / col("n_tokens"), 6)
            .as("dup_token_frac"),
          round(lit(1.0) - col("nd_bigrams").cast("double") / col("n_bigrams"), 6)
            .as("dup_bigram_frac"),
          round(col("top_token_cnt").cast("double") / col("n_tokens"), 6)
            .as("top_token_share"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH t AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents),
      base AS (
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
               CAST(len(toks) - 1 AS BIGINT) AS n_bigrams,
               CAST(len(list_distinct(list_transform(
                 generate_series(1, len(toks) - 1),
                 i -> toks[i] || ' ' || toks[i + 1]))) AS BIGINT) AS nd_bigrams
        FROM t),
      top AS (
        SELECT doc_id, max(c) AS top_token_cnt
        FROM (SELECT doc_id, u, count(*) AS c
              FROM t, unnest(toks) AS un(u) GROUP BY doc_id, u)
        GROUP BY doc_id)
      SELECT b.doc_id, b.n_tokens,
             round(1.0 - CAST(n_distinct AS DOUBLE) / n_tokens, 6) AS dup_token_frac,
             round(1.0 - CAST(nd_bigrams AS DOUBLE) / n_bigrams, 6) AS dup_bigram_frac,
             round(CAST(top_token_cnt AS DOUBLE) / n_tokens, 6) AS top_token_share
      FROM base b JOIN top USING (doc_id)
      ORDER BY doc_id
    """))

  /** C4/Gopher-style boolean quality gates, reported as per-language
    * pass counts: token-count range, mean-token-length range, and a
    * stopword-presence check (the corpus's own high-frequency terms
    * play the stopword role). One map-side pass + one bounded
    * aggregation — the shape of every corpus-gate report at 100 TB.
    */
  val qualityRules = QueryDef(
    "q_quality_rules",
    (s, d) => {
      val stop = array(lit("join"), lit("hash"), lit("row"), lit("scan"), lit("filter"))
      Tables.documents(s, d)
        .select(col("lang"), col("text"), TF.tokens(col("text")).as("toks"),
          length(col("text")).cast("long").as("len_chars"),
          (length(col("text")) - length(regexp_replace(col("text"), " ", "")))
            .cast("long").as("n_spaces"))
        .select(col("lang"),
          size(col("toks")).cast("long").as("n_tokens"),
          ((col("len_chars") - col("n_spaces")).cast("double")
            / size(col("toks"))).as("avg_tok"),
          arrays_overlap(col("toks"), stop).as("has_stop"))
        .select(col("lang"),
          col("n_tokens").between(20, 80).as("ok_len"),
          col("avg_tok").between(3.0, 9.0).as("ok_avg"),
          col("has_stop"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("ok_len"), 1)).as("pass_len"),
          count(when(col("ok_avg"), 1)).as("pass_avg"),
          count(when(col("has_stop"), 1)).as("has_stopword"),
          count(when(col("ok_len") && col("ok_avg") && col("has_stop"), 1))
            .as("pass_all"))
        .orderBy(col("lang"))
    },
    Some("""
      WITH per_doc AS (
        SELECT lang,
               CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens,
               CAST(length(text) - (length(text) - length(replace(text, ' ', ''))) AS DOUBLE)
                 / len(list_filter(string_split(text, ' '), x -> x <> '')) AS avg_tok,
               list_has_any(list_filter(string_split(text, ' '), x -> x <> ''),
                 ['join', 'hash', 'row', 'scan', 'filter']) AS has_stop
        FROM documents)
      SELECT lang, count(*) AS n_docs,
             count(CASE WHEN n_tokens BETWEEN 20 AND 80 THEN 1 END) AS pass_len,
             count(CASE WHEN avg_tok BETWEEN 3.0 AND 9.0 THEN 1 END) AS pass_avg,
             count(CASE WHEN has_stop THEN 1 END) AS has_stopword,
             count(CASE WHEN n_tokens BETWEEN 20 AND 80 AND avg_tok BETWEEN 3.0 AND 9.0
                        AND has_stop THEN 1 END) AS pass_all
      FROM per_doc
      GROUP BY lang
      ORDER BY lang
    """))

  /** Deny-list term redaction (the PII-scrub shape, with the corpus's
    * own terms standing in for PII patterns since the synthetic text
    * carries no emails/digits): token-level replacement keeps the
    * operation codegen-friendly and regex-dialect-free; output carries
    * the hit count and an md5 of the redacted text (not the text —
    * the verify artifact stays small). Pure map-side.
    */
  val redactTerms = QueryDef(
    "q_redact_terms",
    (s, d) => {
      val deny = Seq("customer", "supplier", "aggregate")
      Tables.documents(s, d)
        .select(col("doc_id"), TF.tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          size(filter(col("toks"), t => t.isin(deny: _*))).cast("long").as("n_hits"),
          md5(array_join(transform(col("toks"),
            t => when(t.isin(deny: _*), lit("<redacted>")).otherwise(t)), " "))
            .as("redacted_md5"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH t AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents)
      SELECT doc_id,
             CAST(len(list_filter(toks,
               x -> x IN ('customer', 'supplier', 'aggregate'))) AS BIGINT) AS n_hits,
             md5(array_to_string(list_transform(toks,
               x -> CASE WHEN x IN ('customer', 'supplier', 'aggregate')
                         THEN '<redacted>' ELSE x END), ' ')) AS redacted_md5
      FROM t
      ORDER BY doc_id
    """))

  /** Unigram language-model scoring: train token frequencies on the
    * deterministic 5% sample (the q_lang_id sampling contract), score
    * every document by the average negative log-probability of its
    * in-vocabulary tokens. High avg_nll = surprising/low-quality text;
    * `matched` exposes OOV coverage. The vocab is corpus-bounded and
    * the scoring join is broadcast-friendly; the corpus-total scalar
    * rides a lazy 1-row cross join (the q_tf_idf pattern — no job at
    * plan build). FLOAT cast absorbs the engines' last-ulp ln()/merge
    * differences (memory: stats-agg rule).
    */
  val unigramLogprob = QueryDef(
    "q_unigram_logprob",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val vocab = docs.filter(pmod(col("doc_id"), lit(20)) === 0)
        .select(explode(TF.tokens(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      val total = vocab.agg(sum(col("cnt")).as("total"))
      docs.select(col("doc_id"), explode(TF.tokens(col("text"))).as("tok"))
        .join(vocab, Seq("tok"))
        .crossJoin(total)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("matched"),
          avg(-log(col("cnt").cast("double") / col("total")))
            .cast("float").as("avg_nll"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH samp AS (
        SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
        FROM documents WHERE doc_id % 20 = 0),
      vocab AS (SELECT tok, count(*) AS cnt FROM samp GROUP BY tok),
      tot AS (SELECT sum(cnt) AS total FROM vocab),
      dt AS (
        SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
        FROM documents)
      SELECT doc_id, count(*) AS matched,
             CAST(avg(-ln(CAST(cnt AS DOUBLE) / total)) AS FLOAT) AS avg_nll
      FROM dt JOIN vocab USING (tok) CROSS JOIN tot
      GROUP BY doc_id
      ORDER BY doc_id
    """))

  /** Zipf-law fit of the corpus vocabulary: regress log(frequency) on
    * log(rank) over the top 200 unigrams — the slope is the Zipf
    * exponent (≈ −1 for natural text; a corpus-health metric that
    * flags synthetic or boilerplate-heavy data). One explode+count
    * shuffle builds the vocabulary, TakeOrdered keeps the head (the
    * rank window runs on 200 rows, never the full vocabulary — the
    * q_vocab_coverage trick), and the regression aggregate reduces to
    * a single row. Ties in frequency are rank-broken by token so both
    * engines agree exactly; regression outputs float-cast (q_stats
    * rule).
    */
  val zipfFit = QueryDef(
    "q_zipf_fit",
    (s, d) => {
      val top = Tables.documents(s, d)
        .select(explode(TF.tokens(col("text"))).as("tok"))
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("tok"))
        .limit(200)
      top
        .withColumn("rank",
          row_number().over(Window.orderBy(col("freq").desc, col("tok"))))
        .agg(
          count(lit(1)).as("n_terms"),
          expr("regr_slope(ln(cast(freq AS double)), ln(cast(rank AS double)))")
            .cast("float").as("zipf_slope"),
          expr("regr_r2(ln(cast(freq AS double)), ln(cast(rank AS double)))")
            .cast("float").as("fit_r2"))
    },
    Some("""
      WITH vocab AS (
        SELECT tok, count(*) AS freq
        FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
              FROM documents)
        GROUP BY tok
        ORDER BY freq DESC, tok
        LIMIT 200),
      ranked AS (
        SELECT freq, row_number() OVER (ORDER BY freq DESC, tok) AS rank
        FROM vocab)
      SELECT count(*) AS n_terms,
             CAST(regr_slope(ln(CAST(freq AS DOUBLE)), ln(CAST(rank AS DOUBLE))) AS FLOAT) AS zipf_slope,
             CAST(regr_r2(ln(CAST(freq AS DOUBLE)), ln(CAST(rank AS DOUBLE))) AS FLOAT) AS fit_r2
      FROM ranked
    """))

  /** Training-shard planning: pack documents into ~2k-token output
    * shards (budget sized to the synthetic corpus so several shards
    * per language exist; at real scale this is the 50-100M-token
    * shard knob). Greedy bin-packing is inherently sequential, so the
    * distributable contract is cumulative-budget sharding: docs take
    * a deterministic order (hash of id — decorrelates shard fill from
    * doc_id order), a running token cumsum assigns shard =
    * floor((cum − tokens)/budget), and the summary emits per-shard
    * doc/token counts. At 100 TB the window runs per language
    * partition (the natural training-mix unit), so no global sort —
    * one shuffle on lang, linear within.
    */
  val shardPlan = QueryDef(
    "q_shard_plan",
    (s, d) => {
      val budget = 2000L
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("ord"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          size(TF.tokens(col("text"))).cast("long").as("tokens"),
          md5(col("doc_id").cast("string")).as("ord"))
        .withColumn("cum", sum(col("tokens")).over(w))
        .withColumn("shard", ((col("cum") - col("tokens")) / budget).cast("long"))
        .groupBy(col("lang"), col("shard"))
        .agg(count(lit(1)).as("docs"), sum(col("tokens")).as("shard_tokens"))
        .orderBy(col("lang"), col("shard"))
    },
    Some("""
      SELECT lang, shard, count(*) AS docs,
             CAST(sum(tokens) AS BIGINT) AS shard_tokens
      FROM (
        SELECT lang, doc_id, tokens,
               CAST(floor((sum(tokens) OVER (PARTITION BY lang ORDER BY ord, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tokens)
                 / 2000) AS BIGINT) AS shard
        FROM (
          SELECT doc_id, lang,
                 CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS tokens,
                 md5(CAST(doc_id AS VARCHAR)) AS ord
          FROM documents))
      GROUP BY lang, shard
      ORDER BY lang, shard
    """))

  /** Sliding-window document chunking: split each document into
    * fixed-size token chunks (32 tokens, stride 24 → 8-token overlap)
    * — the context-window preprocessing step every training pipeline
    * runs before packing. Purely map-side: tokens bound once per row,
    * chunk starts generated with sequence() (no self-join, no
    * shuffle), the slice/join evaluated per emitted chunk. At 100 TB
    * this is embarrassingly parallel; output size is input size ×
    * (1 + overlap fraction). Bounded here to doc_id < 100 so the
    * graded row stays small.
    */
  val chunkDocs = QueryDef(
    "q_chunk_docs",
    (s, d) => {
      val size32 = 32
      val stride = 24
      Tables.documents(s, d)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), TF.tokens(col("text")).as("toks"))
        // last start ≤ len−(size−stride)−1: a chunk whose tokens are
        // all inside the previous chunk's window would be pure
        // duplicate text — exactly what chunking must not emit
        .select(col("doc_id"), col("toks"),
          explode(sequence(lit(0),
            greatest(org.apache.spark.sql.functions.size(col("toks"))
              - (size32 - stride) - 1, lit(0)),
            lit(stride))).as("start"))
        .select(col("doc_id"),
          (col("start") / stride).cast("long").as("chunk_id"),
          array_join(slice(col("toks"), col("start") + 1, lit(size32)), " ")
            .as("chunk_text"),
          org.apache.spark.sql.functions
            .size(slice(col("toks"), col("start") + 1, lit(size32)))
            .cast("long").as("chunk_tokens"))
        .orderBy(col("doc_id"), col("chunk_id"))
    },
    Some("""
      WITH toks AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), t -> t <> '') AS toks
        FROM documents WHERE doc_id < 100),
      starts AS (
        SELECT doc_id, toks,
               unnest(range(0, greatest(len(toks) - 8, 1), 24)) AS start
        FROM toks)
      SELECT doc_id,
             CAST(start / 24 AS BIGINT) AS chunk_id,
             array_to_string(list_slice(toks, start + 1, start + 32), ' ')
               AS chunk_text,
             CAST(len(list_slice(toks, start + 1, start + 32)) AS BIGINT)
               AS chunk_tokens
      FROM starts
      ORDER BY doc_id, chunk_id
    """))

  /** Split-drift detection via Population Stability Index: compare
    * the document-length distribution of the train split (same md5
    * hash rule as q_train_split) against the rest of the corpus over
    * 10 fixed-width buckets; PSI term per bucket =
    * (p−q)·ln(p/q) with +0.5/+5 Laplace smoothing so empty buckets
    * stay finite. A leak-proof hash split SHOULD show ≈0 drift — this
    * is the pipeline health check that catches a biased split or an
    * upstream distribution shift between snapshots. One map-side
    * bucketing pass + a 10-row aggregate + the 1-row totals
    * crossJoin (q_tf_idf pattern); counts are exact integers, so only
    * the final float-cast term carries float risk.
    */
  val driftPsi = QueryDef(
    "q_drift_psi",
    (s, d) => {
      val isTrain =
        substring(md5(col("doc_id").cast("string")), 1, 1) <= "b"
      val hist = Tables.documents(s, d)
        .select(least(floor(col("n_chars") / 60).cast("long"), lit(9L))
          .as("bucket"), isTrain.as("is_train"))
        .groupBy(col("bucket"))
        .agg(count(when(col("is_train"), 1)).as("train_docs"),
          count(when(!col("is_train"), 1)).as("other_docs"))
      val tot = hist.agg(sum(col("train_docs")).as("train_total"),
        sum(col("other_docs")).as("other_total"))
      val p = (col("train_docs") + 0.5) / (col("train_total") + 5.0)
      val q = (col("other_docs") + 0.5) / (col("other_total") + 5.0)
      hist.crossJoin(broadcast(tot))
        .select(col("bucket"), col("train_docs"), col("other_docs"),
          ((p - q) * log(p / q)).cast("float").as("psi_term"))
        .orderBy(col("bucket"))
    },
    Some("""
      WITH hist AS (
        SELECT least(CAST(floor(n_chars / 60) AS BIGINT), 9) AS bucket,
               count(*) FILTER (WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'b')
                 AS train_docs,
               count(*) FILTER (WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) > 'b')
                 AS other_docs
        FROM documents GROUP BY 1),
      tot AS (
        SELECT sum(train_docs) AS train_total, sum(other_docs) AS other_total
        FROM hist)
      SELECT bucket, train_docs, other_docs,
             CAST(((train_docs + 0.5) / (train_total + 5.0)
                   - (other_docs + 0.5) / (other_total + 5.0))
                  * ln(((train_docs + 0.5) / (train_total + 5.0))
                       / ((other_docs + 0.5) / (other_total + 5.0))) AS FLOAT)
               AS psi_term
      FROM hist CROSS JOIN tot
      ORDER BY bucket
    """))

  /** Token co-occurrence PMI over the top-30 vocabulary — the
    * phrase-mining / tokenizer-analysis pass: which frequent tokens
    * appear in the same documents far more (or less) often than
    * independence predicts. PMI(a,b) = ln(docs(a,b)·N / (docs(a)·
    * docs(b))) on document-level occurrence. Candidate pairing is
    * vocabulary-BOUNDED, never corpus-wide: the top-30 vocab
    * (TakeOrdered) broadcasts back onto the doc-token table, and the
    * within-doc self-join is bucket-local on doc_id with ≤ C(30,2)
    * pairs per doc. Counts are exact integers; only the final
    * float-cast PMI carries float math.
    */
  val cooccurrence = QueryDef(
    "q_cooccurrence",
    (s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(array_distinct(TF.tokens(col("text")))).as("tok"))
      val vocab = toks.groupBy(col("tok"))
        .agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("tok")).limit(30)
      val dt = toks.join(broadcast(vocab), Seq("tok"))
      val nDocs = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
      dt.as("a")
        .join(dt.as("b"),
          col("a.doc_id") === col("b.doc_id") && col("a.tok") < col("b.tok"))
        .groupBy(col("a.tok").as("tok1"), col("b.tok").as("tok2"),
          col("a.c").as("c1"), col("b.c").as("c2"))
        .agg(count(lit(1)).as("pair_docs"))
        .crossJoin(broadcast(nDocs))
        // double-cast BEFORE the multiplies: long·long products
        // (c1·c2 ≈ n_docs²) overflow int64 at web scale — ANSI mode
        // would throw; double rounding is IEEE-identical in both
        // engines so the oracle stays aligned
        .select(col("tok1"), col("tok2"), col("pair_docs"),
          log(col("pair_docs").cast("double") * col("n_docs")
            / (col("c1").cast("double") * col("c2")))
            .cast("float").as("pmi"))
        .orderBy(col("pair_docs").desc, col("tok1"), col("tok2"))
        .limit(30)
    },
    Some("""
      WITH toks AS (
        SELECT doc_id,
               unnest(list_distinct(list_filter(string_split(text, ' '),
                 t -> t <> ''))) AS tok
        FROM documents),
      vocab AS (
        SELECT tok, count(*) AS c FROM toks
        GROUP BY tok ORDER BY c DESC, tok LIMIT 30),
      dt AS (SELECT doc_id, t.tok, c FROM toks t JOIN vocab USING (tok)),
      pairs AS (
        SELECT a.tok AS tok1, b.tok AS tok2, a.c AS c1, b.c AS c2,
               count(*) AS pair_docs
        FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.tok < b.tok
        GROUP BY 1, 2, 3, 4),
      n AS (SELECT count(*) AS n_docs FROM documents)
      SELECT tok1, tok2, pair_docs,
             CAST(ln(CAST(pair_docs AS DOUBLE) * n_docs
                     / (CAST(c1 AS DOUBLE) * c2)) AS FLOAT) AS pmi
      FROM pairs CROSS JOIN n
      ORDER BY pair_docs DESC, tok1, tok2
      LIMIT 30
    """))

  /** Cross-document boilerplate detection: the 5-grams appearing in
    * the MOST distinct documents (shared headers/footers/templates —
    * the things a cleaning pass strips corpus-wide), complementing
    * q_repetition's WITHIN-document loops. Native codegen shingles,
    * one shuffle on the gram, TakeOrdered(20) — no global sort. At
    * 100 TB, count by 64-bit gram digest instead and join one example
    * string back for display (halves the shuffle payload); grouping
    * the string directly here keeps the oracle simple.
    */
  val boilerplate = QueryDef(
    "q_boilerplate",
    (s, d) => {
      graft.functions.expressions.WordNgrams.register(s)
      Tables.documents(s, d)
        .select(col("doc_id"), TF.tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          explode(array_distinct(TF.shinglesFast(col("toks"), 5))).as("gram"))
        .groupBy(col("gram"))
        .agg(countDistinct(col("doc_id")).as("n_docs"))
        .orderBy(col("n_docs").desc, col("gram"))
        .limit(20)
    },
    Some("""
      SELECT gram, count(DISTINCT doc_id) AS n_docs
      FROM (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                 generate_series(1, len(toks) - 4),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                      || ' ' || toks[i+3] || ' ' || toks[i+4]))) AS gram
        FROM (
          SELECT doc_id,
                 list_filter(string_split(text, ' '), t -> t <> '') AS toks
          FROM documents))
      GROUP BY gram
      ORDER BY n_docs DESC, gram
      LIMIT 20
    """))

  /** BM25 retrieval scoring — the ranking function every search/RAG
    * retrieval layer runs (tf-idf's saturating successor: tf gains
    * diminish via k1, long docs are normalized via b·dl/avgdl).
    * Shape: term frequencies for the QUERY TERMS only (the isin
    * filter prunes the exploded token stream before the group-by),
    * document length from a map-side size(), corpus stats as a lazy
    * 1-row cross join (q_tf_idf pattern — no driver action), per-term
    * idf broadcast (|query| rows). Per-doc score sums ≤|query| terms;
    * top-20 rides TakeOrderedAndProject. At 100 TB the only
    * corpus-sized shuffle is the (doc, term) tf group-by, already
    * pruned to query terms — the inverted-index-free scoring pass a
    * batch reranker uses.
    */
  /** BM25 score per matching doc for the fixed query-term set —
    * shared by q_bm25 (top-20 report) and q_hybrid_rrf (lexical leg
    * of the fusion). Returns (doc_id, bm25 float).
    */
  private def bm25Scored(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val terms = Seq("hash", "join", "stream")
    val k1 = 1.2d
    val b = 0.75d
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), explode(TF.tokens(col("text"))).as("token"))
    val tf = toks.filter(col("token").isin(terms: _*))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val dl = Tables.documents(s, d)
      .select(col("doc_id"), size(TF.tokens(col("text"))).cast("double").as("dl"))
    val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val idf = tf.groupBy(col("token"))
      .agg(countDistinct(col("doc_id")).cast("double").as("df"))
    tf.join(dl, Seq("doc_id"))
      .join(broadcast(idf), Seq("token"))
      .crossJoin(stats)
      .select(col("doc_id"),
        (log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1)) *
          (col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl")))).as("term_score"))
      .groupBy(col("doc_id"))
      .agg(sum(col("term_score")).cast("float").as("bm25"))
  }

  /** DuckDB CTE list mirroring [[bm25Scored]], ending in
    * `bm25s(doc_id, bm25)`. Callers prefix `WITH `.
    */
  /** The BM25 oracle CTE chain over a named source relation — `src`
    * is `documents` for the corpus-wide queries and a filtered `live`
    * CTE for the post-deletion index query (the oracle must recompute
    * the answer from the raw SURVIVING text).
    */
  private def bm25CteOver(src: String) = s"""
      toks AS (
        SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
        FROM $src),
      dlen AS (
        SELECT doc_id, CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS DOUBLE) AS dl
        FROM $src),
      stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dlen),
      tf AS (
        SELECT doc_id, token, count(*) AS tf FROM toks
        WHERE token IN ('hash', 'join', 'stream')
        GROUP BY doc_id, token),
      idf AS (
        SELECT token, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df FROM tf GROUP BY token),
      bm25s AS (
        SELECT doc_id,
               CAST(sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1)
                        * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))) AS FLOAT) AS bm25
        FROM tf JOIN dlen USING (doc_id) JOIN idf USING (token) CROSS JOIN stats
        GROUP BY doc_id)"""

  private val bm25ScoredCte = bm25CteOver("documents")

  val bm25 = QueryDef(
    "q_bm25",
    (s, d) =>
      bm25Scored(s, d)
        .orderBy(col("bm25").desc, col("doc_id"))
        .limit(20),
    Some(s"""
      WITH $bm25ScoredCte
      SELECT doc_id, bm25 FROM bm25s
      ORDER BY bm25 DESC, doc_id
      LIMIT 20
    """))

  /** Hybrid retrieval via reciprocal-rank fusion — the RAG-stack
    * fusion step: a lexical candidate list (BM25 top-20) and a vector
    * candidate list (cosine top-20 against a probe embedding, joined
    * doc_id = vec_id) merge by RRF(d) = Σ_lists 1/(60 + rank_d). Ranks
    * are integers and each doc sums ≤2 exact reciprocals, so the
    * fused score is bit-identical across engines. Both candidate legs
    * are top-k pushdowns (WindowGroupLimit / TakeOrdered); the full
    * outer join touches ≤40 rows — fusion cost is independent of both
    * corpus sizes, which is the point of fusing RANKS instead of
    * incomparable raw scores.
    */
  val hybridRrf = QueryDef(
    "q_hybrid_rrf",
    (s, d) => {
      graft.functions.expressions.CosineSimilarity.register(s)
      val wLex = Window.orderBy(col("bm25").desc, col("doc_id"))
      val lex = bm25Scored(s, d)
        .withColumn("rank_lex", row_number().over(wLex).cast("long"))
        .filter(col("rank_lex") <= 20)
        .select(col("doc_id"), col("rank_lex"))
      val probe = Tables.embeddings(s, d).filter(col("vec_id") === 0)
        .select(col("embedding").as("probe_emb"))
      val wVec = Window.orderBy(col("cos").desc, col("doc_id"))
      val vec = Tables.embeddings(s, d).filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(probe))
        .select(col("vec_id").as("doc_id"),
          graft.functions.VectorFunctions.cosineFast(col("embedding"), col("probe_emb")).as("cos"))
        .withColumn("rank_vec", row_number().over(wVec).cast("long"))
        .filter(col("rank_vec") <= 20)
        .select(col("doc_id"), col("rank_vec"))
      lex.join(vec, Seq("doc_id"), "full_outer")
        .select(col("doc_id"), col("rank_lex"), col("rank_vec"),
          (coalesce(lit(1.0) / (lit(60) + col("rank_lex")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + col("rank_vec")), lit(0.0)))
            .cast("float").as("rrf"))
        .orderBy(col("rrf").desc, col("doc_id"))
        .limit(10)
    },
    Some(s"""
      WITH $bm25ScoredCte,
      lex AS (
        SELECT doc_id, rank_lex FROM (
          SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank_lex
          FROM bm25s)
        WHERE rank_lex <= 20),
      probe AS (SELECT embedding AS probe_emb FROM embeddings WHERE vec_id = 0),
      vec AS (
        SELECT doc_id, rank_vec FROM (
          SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id) AS rank_vec
          FROM (
            SELECT vec_id AS doc_id,
                   list_dot_product(CAST(embedding AS DOUBLE[]), CAST(probe_emb AS DOUBLE[]))
                     / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
                        * sqrt(list_dot_product(CAST(probe_emb AS DOUBLE[]), CAST(probe_emb AS DOUBLE[])))) AS cos
            FROM embeddings CROSS JOIN probe
            WHERE vec_id <> 0))
        WHERE rank_vec <= 20)
      SELECT coalesce(lex.doc_id, vec.doc_id) AS doc_id, rank_lex, rank_vec,
             CAST(coalesce(1.0 / (60 + rank_lex), 0) + coalesce(1.0 / (60 + rank_vec), 0) AS FLOAT) AS rrf
      FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id
      ORDER BY rrf DESC, doc_id
      LIMIT 10
    """))

  /** Sorted-neighborhood candidate pairs over part names, the shared
    * blocking for q_jaro_winkler / q_damerau: rank each
    * (brand × first-word) block by (name, key) and pair each row with
    * its next `w` neighbors in that order.
    *
    * r9 refinement (VERDICT r8 nit): the band `rnb ∈ (rna, rna+w]`
    * used to be only a join RESIDUAL on the block-equi keys, so the
    * hash probe still ENUMERATED all |block|² same-block pairs before
    * filtering — fine at 26×, quadratic at a 100× catalog. The key
    * now includes a `floor((rn−1)/w)` bucket, with the probe side
    * exploded to its own + next bucket: every banded pair satisfies
    * bktb ∈ {bkta, bkta+1}, so enumeration is bounded at |block|×2w
    * while the band residual (unchanged) still decides membership —
    * the final pair set is IDENTICAL, which is why the oracle SQL
    * keeps the plain banded form.
    */
  private def sortedNeighborhoodPairs(s: org.apache.spark.sql.SparkSession,
      d: String, w: Int) = {
    val wspec = org.apache.spark.sql.expressions.Window
      .partitionBy(col("p_brand"), col("w0"))
      .orderBy(col("p_name"), col("p_partkey"))
    val p = Tables.part(s, d).select(col("p_partkey"), col("p_name"),
        col("p_brand"), split(col("p_name"), " ").getItem(0).as("w0"))
      .withColumn("rn", row_number().over(wspec))
      .withColumn("bkt", floor((col("rn") - 1) / w).cast("long"))
    val a = p.select(col("p_partkey").as("ka"), col("p_name").as("na"),
      col("p_brand"), col("w0"), col("rn").as("rna"),
      explode(array(col("bkt"), col("bkt") + 1)).as("pb"))
    val b = p.select(col("p_partkey").as("kb"), col("p_name").as("nb"),
      col("p_brand").as("brand2"), col("w0").as("w0b"), col("rn").as("rnb"),
      col("bkt").as("bktb"))
    a.join(b, col("w0") === col("w0b") && col("p_brand") === col("brand2")
      && col("pb") === col("bktb")
      && col("rnb") > col("rna") && col("rnb") <= col("rna") + lit(w))
  }

  /** Top-50 most-similar part-name pairs by Jaro-Winkler — the fuzzy
    * name-match primitive, via graft's native codegen expression
    * (expressions.JaroWinkler; Spark has levenshtein but no Jaro
    * family). The oracle calls DuckDB's real jaro_winkler_similarity:
    * the expression's semantics were fuzz-pinned to it (6000 pairs,
    * 0 mismatches), so this row cross-verifies the custom kernel
    * against an independent implementation on real data.
    *
    * Scale (r8 redesign): (brand × first-word) BLOCKS have bounded
    * diversity — brands are an enum and first words come from a
    * language — so block OCCUPANCY grows linearly with the catalog
    * and an all-pairs-within-block join grows quadratically (measured:
    * 78× cost for 10× parts at sf1). The candidates are therefore
    * SORTED-NEIGHBORHOOD windowed, the standard record-linkage scale
    * technique: compare each row only to its next `W`=16 neighbors in
    * block order — typo-close names share prefixes and sort
    * adjacently, and the cost becomes |block|×W (linear; re-measured
    * 76.6× → ~linear at sf1; r9: enumeration bucket-bounded too, see
    * sortedNeighborhoodPairs). The top-k is a TakeOrdered, not a
    * global sort. round(,6)+float on the ordering key; ties broken by
    * exact integer keys.
    */
  val jaroWinkler = QueryDef(
    "q_jaro_winkler",
    (s, d) => {
      graft.functions.expressions.JaroWinkler.register(s)
      sortedNeighborhoodPairs(s, d, 16)
        .select(least(col("ka"), col("kb")).as("p1"),
          greatest(col("ka"), col("kb")).as("p2"),
          when(col("ka") < col("kb"), col("na")).otherwise(col("nb")).as("name1"),
          when(col("ka") < col("kb"), col("nb")).otherwise(col("na")).as("name2"),
          round(call_function("jaro_winkler", col("na"), col("nb")), 6)
            .cast("float").as("jw_sim"))
        .orderBy(col("jw_sim").desc, col("p1"), col("p2"))
        .limit(50)
    },
    Some("""
      WITH p AS (
        SELECT p_partkey, p_name, p_brand,
               string_split(p_name, ' ')[1] AS w0,
               row_number() OVER (PARTITION BY p_brand, string_split(p_name, ' ')[1]
                                  ORDER BY p_name, p_partkey) AS rn
        FROM part)
      SELECT least(a.p_partkey, b.p_partkey) AS p1,
             greatest(a.p_partkey, b.p_partkey) AS p2,
             CASE WHEN a.p_partkey < b.p_partkey THEN a.p_name ELSE b.p_name END AS name1,
             CASE WHEN a.p_partkey < b.p_partkey THEN b.p_name ELSE a.p_name END AS name2,
             CAST(round(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS FLOAT)
               AS jw_sim
      FROM p a
      JOIN p b ON a.w0 = b.w0 AND a.p_brand = b.p_brand
              AND b.rn > a.rn AND b.rn <= a.rn + 16
      ORDER BY jw_sim DESC, p1, p2
      LIMIT 50
    """))

  /** Closest part-name pairs by FULL Damerau-Levenshtein distance —
    * the typo-model edit distance (adjacent transposition = 1 edit)
    * via graft's native codegen expression, graded against DuckDB's
    * own damerau_levenshtein (the kernel was fuzz-pinned to the
    * unrestricted variant it implements; 2005 pairs, 0 mismatches).
    * Integer distances: zero float surface. Same sorted-neighborhood
    * (brand × first-word, W=16) candidate windowing and TakeOrdered
    * top-k as q_jaro_winkler (sortedNeighborhoodPairs) — the
    * all-pairs-within-block form it replaces cost 78× for 10× parts
    * at sf1 (the per-pair kernel is also O(len²), which only sharpens
    * the blow-up).
    */
  val damerau = QueryDef(
    "q_damerau",
    (s, d) => {
      graft.functions.expressions.DamerauLevenshtein.register(s)
      sortedNeighborhoodPairs(s, d, 16)
        .select(least(col("ka"), col("kb")).as("p1"),
          greatest(col("ka"), col("kb")).as("p2"),
          when(col("ka") < col("kb"), col("na")).otherwise(col("nb")).as("name1"),
          when(col("ka") < col("kb"), col("nb")).otherwise(col("na")).as("name2"),
          call_function("damerau_levenshtein", col("na"), col("nb"))
            .cast("long").as("dl_dist"))
        .orderBy(col("dl_dist"), col("p1"), col("p2"))
        .limit(30)
    },
    Some("""
      WITH p AS (
        SELECT p_partkey, p_name, p_brand,
               string_split(p_name, ' ')[1] AS w0,
               row_number() OVER (PARTITION BY p_brand, string_split(p_name, ' ')[1]
                                  ORDER BY p_name, p_partkey) AS rn
        FROM part)
      SELECT least(a.p_partkey, b.p_partkey) AS p1,
             greatest(a.p_partkey, b.p_partkey) AS p2,
             CASE WHEN a.p_partkey < b.p_partkey THEN a.p_name ELSE b.p_name END AS name1,
             CASE WHEN a.p_partkey < b.p_partkey THEN b.p_name ELSE a.p_name END AS name2,
             CAST(damerau_levenshtein(a.p_name, b.p_name) AS BIGINT) AS dl_dist
      FROM p a
      JOIN p b ON a.w0 = b.w0 AND a.p_brand = b.p_brand
              AND b.rn > a.rn AND b.rn <= a.rn + 16
      ORDER BY dl_dist, p1, p2
      LIMIT 30
    """))

  /** Cluster keywords by c-TF-IDF (the BERTopic labeling formula):
    * treat each embedding cluster as one "class document", score term
    * t in cluster c as (tf(t,c) / |c|) · ln(1 + A / f(t)) where |c| is
    * the cluster's token count, A the mean cluster token count and
    * f(t) the corpus term frequency, then keep the top 5 terms per
    * cluster — the standard topic-labeling pass after embedding
    * clustering. One explode feeds three linear aggregations
    * ((label,tok), label, tok); the label and scalar sides are
    * cluster-cardinality-bounded (broadcast at any corpus size) and
    * the tok-frequency join shuffles on the token key — never
    * pairwise. The top-k window runs on the (label, tok) aggregate
    * (vocab-bounded), not the corpus. Scores round(6) BEFORE ranking
    * (the q_tf_idf float-ordering rule); A = exact sum/count, both
    * engines divide the same integers.
    */
  val clusterKeywords = QueryDef(
    "q_cluster_keywords",
    (s, d) => {
      val lab = Tables.embeddings(s, d)
        .select(col("vec_id").as("doc_id"), col("label"))
      val toks = Tables.documents(s, d).join(lab, Seq("doc_id"))
        .select(col("label"), explode(TF.tokens(col("text"))).as("tok"))
      val ctf = toks.groupBy(col("label"), col("tok")).agg(count(lit(1)).as("ctf"))
      val wc = toks.groupBy(col("label")).agg(count(lit(1)).as("w_c"))
      val ft = toks.groupBy(col("tok")).agg(count(lit(1)).as("f_t"))
      val a = wc.agg((sum(col("w_c")).cast("double") / count(lit(1))).as("a_tokens"))
      val w = Window.partitionBy(col("label"))
        .orderBy(col("score").desc, col("tok"))
      ctf.join(wc, Seq("label")).join(ft, Seq("tok")).crossJoin(a)
        .select(col("label"), col("tok"),
          round(col("ctf") / col("w_c")
            * log(lit(1.0) + col("a_tokens") / col("f_t")), 6).as("score"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
        .select(col("label"), col("rank"), col("tok"), col("score"))
        .orderBy(col("label"), col("rank"))
    },
    Some("""
      WITH lab AS (SELECT vec_id AS doc_id, label FROM embeddings),
      toks AS (
        SELECT label, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
        FROM documents JOIN lab USING (doc_id)),
      ctf AS (SELECT label, tok, count(*) AS ctf FROM toks GROUP BY label, tok),
      wc AS (SELECT label, count(*) AS w_c FROM toks GROUP BY label),
      ft AS (SELECT tok, count(*) AS f_t FROM toks GROUP BY tok),
      a AS (SELECT CAST(sum(w_c) AS DOUBLE) / count(*) AS a_tokens FROM wc),
      scored AS (
        SELECT label, tok,
               round(CAST(ctf AS DOUBLE) / w_c
                     * ln(1.0 + a_tokens / f_t), 6) AS score
        FROM ctf JOIN wc USING (label) JOIN ft USING (tok) CROSS JOIN a),
      ranked AS (
        SELECT label, tok, score,
               CAST(row_number() OVER (PARTITION BY label
                 ORDER BY score DESC, tok) AS BIGINT) AS rank
        FROM scored)
      SELECT label, rank, tok, score
      FROM ranked
      WHERE rank <= 5
      ORDER BY label, rank
    """))

  /** Per-language length-window trimming — the standard curation pass
    * that drops length outliers before training: per language, the
    * discrete 5th/95th percentile of n_chars bound the keep window,
    * and the summary reports kept/total with the bounds. The bounds
    * pass pre-aggregates to (lang, n_chars, count) FIRST — distinct
    * lengths are value-bounded (max doc length), not corpus-bounded —
    * so no exact-percentile value buffer ever holds data-proportional
    * rows (the q_percentile_window rewrite pattern; a first cut used
    * percentile_disc and failed the ObjectHashAggregate audit). The
    * disc percentile itself is the pure-integer cume_dist threshold
    * cum·100 ≥ p·100·total — exactly percentile_disc semantics
    * (smallest value with cume_dist ≥ p), drift-free in both engines,
    * validated against DuckDB's own quantile_disc. The bounds table is
    * language-cardinality-bounded (broadcast at any corpus size), so
    * the trim itself never shuffles the corpus.
    */
  val lengthTrim = QueryDef(
    "q_length_trim",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val h = docs.groupBy(col("lang"), col("n_chars"))
        .agg(count(lit(1)).as("cnt"))
      val wcum = Window.partitionBy(col("lang")).orderBy(col("n_chars"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wtot = Window.partitionBy(col("lang"))
      val bounds = h
        .withColumn("cum", sum(col("cnt")).over(wcum))
        .withColumn("tot", sum(col("cnt")).over(wtot))
        .groupBy(col("lang"))
        .agg(
          min(when(col("cum") * 100 >= col("tot") * 5, col("n_chars"))).as("lo"),
          min(when(col("cum") * 100 >= col("tot") * 95, col("n_chars"))).as("hi"))
      docs.join(broadcast(bounds), Seq("lang"))
        .groupBy(col("lang"))
        .agg(min(col("lo")).as("lo"), min(col("hi")).as("hi"),
          count(lit(1)).as("n_total"),
          sum(when(col("n_chars").between(col("lo"), col("hi")), 1L)
            .otherwise(0L)).as("n_kept"))
        .select(col("lang"), col("lo"), col("hi"), col("n_total"), col("n_kept"),
          round(col("n_kept").cast("double") / col("n_total"), 4).as("pct_kept"))
        .orderBy(col("lang"))
    },
    Some("""
      WITH h AS (
        SELECT lang, n_chars, count(*) AS cnt
        FROM documents GROUP BY lang, n_chars),
      c AS (
        SELECT lang, n_chars,
               sum(cnt) OVER (PARTITION BY lang ORDER BY n_chars
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               sum(cnt) OVER (PARTITION BY lang) AS tot
        FROM h),
      b AS (
        SELECT lang,
               min(CASE WHEN cum * 100 >= tot * 5 THEN n_chars END) AS lo,
               min(CASE WHEN cum * 100 >= tot * 95 THEN n_chars END) AS hi
        FROM c GROUP BY lang)
      SELECT lang, min(lo) AS lo, min(hi) AS hi,
             count(*) AS n_total,
             CAST(sum(CASE WHEN n_chars BETWEEN lo AND hi THEN 1 ELSE 0 END)
               AS BIGINT) AS n_kept,
             round(CAST(sum(CASE WHEN n_chars BETWEEN lo AND hi THEN 1 ELSE 0 END)
               AS DOUBLE) / count(*), 4) AS pct_kept
      FROM documents JOIN b USING (lang)
      GROUP BY lang
      ORDER BY lang
    """))

  /** Bigram language-model scoring (the perplexity-filter analog one
    * order up from q_unigram_logprob): train add-one-smoothed bigram
    * conditionals P(w2|w1) = (c(w1,w2)+1)/(c(w1·)+V) on the
    * deterministic 5% sample, score every document by the average
    * negative log-probability over its bigrams (with multiplicity).
    * OOV contexts degrade smoothly to the 1/V floor via the left
    * joins — no special cases. The model tables are vocabulary-
    * bounded; the scoring stream shuffles once per join key (bigram,
    * then context), both linear in corpus bigrams — never pairwise;
    * at 100 TB the sample rate shrinks (the q_lang_id sampling
    * contract). Division operands are exact-integer-valued on both
    * sides; the FLOAT cast absorbs last-ulp ln()/avg-merge drift
    * (q_unigram_logprob rule).
    */
  val bigramLogprob = QueryDef(
    "q_bigram_logprob",
    (s, d) => {
      val docs = Tables.documents(s, d)
      def bigrams(df: org.apache.spark.sql.DataFrame) = df
        .select(col("doc_id"), TF.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 2)
        // toks[i] is 0-based in Spark SQL: i in [2, size] → pairs
        // (toks[i-2], toks[i-1]) enumerate adjacent bigrams in order
        .select(col("doc_id"), explode(expr(
          "transform(sequence(2, size(toks)), i -> named_struct('w1', toks[i-2], 'w2', toks[i-1]))")).as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      val all = bigrams(docs)
      val samp = all.filter(pmod(col("doc_id"), lit(20)) === 0)
      val c12 = samp.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      val c1 = samp.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
      val v = docs.filter(pmod(col("doc_id"), lit(20)) === 0)
        .select(explode(TF.tokens(col("text"))).as("tok"))
        .agg(countDistinct(col("tok")).as("v"))
      all.join(c12, Seq("w1", "w2"), "left").join(c1, Seq("w1"), "left")
        .crossJoin(v)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          avg(-log((coalesce(col("c12"), lit(0L)) + lit(1)).cast("double")
            / (coalesce(col("c1"), lit(0L)) + col("v")).cast("double")))
            .cast("float").as("avg_nll"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH t AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents),
      bg AS (
        SELECT doc_id, unnest(list_transform(generate_series(2, len(toks)),
                 i -> struct_pack(w1 := toks[i-1], w2 := toks[i]))) AS b
        FROM t WHERE len(toks) >= 2),
      bgf AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bg),
      samp AS (SELECT * FROM bgf WHERE doc_id % 20 = 0),
      c12 AS (SELECT w1, w2, count(*) AS c12 FROM samp GROUP BY w1, w2),
      c1 AS (SELECT w1, count(*) AS c1 FROM samp GROUP BY w1),
      v AS (SELECT count(DISTINCT tok) AS v
            FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
                  FROM documents WHERE doc_id % 20 = 0))
      SELECT doc_id, count(*) AS n_bigrams,
             CAST(avg(-ln(CAST(coalesce(c12, 0) + 1 AS DOUBLE)
               / (coalesce(c1, 0) + v))) AS FLOAT) AS avg_nll
      FROM bgf LEFT JOIN c12 USING (w1, w2) LEFT JOIN c1 USING (w1) CROSS JOIN v
      GROUP BY doc_id
      ORDER BY doc_id
    """))

  /** Model-based quality filtering — the "score every document with a
    * trained classifier, keep above threshold" pass (the fastText-
    * quality-model analog): a logistic model over four cheap token
    * features (token count, distinct ratio, stopword ratio, mean
    * token length) with FIXED stub weights standing in for trained
    * ones — the distributed plumbing (one explode+aggregate shuffle,
    * per-row scoring, threshold keep) is exactly what a real weight
    * vector would run. Determinism: every feature is a ratio of exact
    * integers and the logit is the same left-associated double chain
    * in both engines — bit-identical per row — so the keep decision
    * (logit ≥ 0 ⟺ score ≥ 0.5) is exact; only the displayed sigmoid
    * goes through exp() and is FLOAT-cast (last-ulp rule).
    */
  val qualityLogreg = QueryDef(
    "q_quality_logreg",
    (s, d) => {
      val f = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), explode(TF.tokens(col("text"))).as("tok"))
        .groupBy(col("doc_id"), col("lang"))
        .agg(count(lit(1)).as("nt"),
          countDistinct(col("tok")).as("nd"),
          sum(when(col("tok").isin("a", "the"), 1L).otherwise(0L)).as("ns"),
          sum(length(col("tok"))).as("sl"))
      f.select(col("doc_id"), col("lang"), col("nt").as("n_tokens"),
          (lit(-1.2) + lit(0.01) * col("nt")
            + lit(0.8) * (col("nd").cast("double") / col("nt"))
            - lit(2.0) * (col("ns").cast("double") / col("nt"))
            + lit(0.05) * (col("sl").cast("double") / col("nt"))).as("z"))
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          (lit(1.0) / (lit(1.0) + exp(-col("z")))).cast("float").as("score"),
          (col("z") >= 0.0).as("keep"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH t AS (
        SELECT doc_id, lang,
               unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
        FROM documents),
      f AS (
        SELECT doc_id, lang, count(*) AS nt, count(DISTINCT tok) AS nd,
               sum(CASE WHEN tok IN ('a', 'the') THEN 1 ELSE 0 END) AS ns,
               sum(length(tok)) AS sl
        FROM t GROUP BY doc_id, lang),
      z AS (
        -- CAST(nt AS DOUBLE) in the first product: DuckDB parses 0.01
        -- as DECIMAL and would multiply a BIGINT exactly, diverging
        -- from Spark's double chain; a DOUBLE operand forces the same
        -- IEEE ops in the same order on both sides
        SELECT doc_id, lang, nt,
               -1.2 + 0.01 * CAST(nt AS DOUBLE)
                 + 0.8 * (CAST(nd AS DOUBLE) / nt)
                 - 2.0 * (CAST(ns AS DOUBLE) / nt)
                 + 0.05 * (CAST(sl AS DOUBLE) / nt) AS z
        FROM f)
      SELECT doc_id, lang, nt AS n_tokens,
             CAST(1.0 / (1.0 + exp(-z)) AS FLOAT) AS score,
             z >= 0.0 AS keep
      FROM z
      ORDER BY doc_id
    """))

  // ---- inverted-index search ----------------------------------------

  /** One persisted index per (session, dataset) — built on first use
    * (graft.Memo: the build is a Spark job and must not run under a
    * map bin lock), reused by Bench reruns. Temp-dir roots, the same
    * lifecycle as the incremental-dedup band history.
    */
  private val indexCache =
    new graft.Memo[(org.apache.spark.sql.SparkSession, String), String]

  private def indexRootOf(
      s: org.apache.spark.sql.SparkSession, d: String): String =
    indexCache.get((s, d)) {
      val root = java.nio.file.Files
        .createTempDirectory("graft-textindex").toString
      graft.sources.TextIndex.build(s, Tables.documents(s, d), root)
      root
    }

  /** A second index per (session, dataset) for the corpus-surgery
    * query: built over the full corpus, then docs with
    * `doc_id % 7 = 0` are DELETED (deletion-vector subtraction on
    * postings + doc stats — TextIndex.delete). Kept separate from
    * [[indexRootOf]] because delete mutates the root.
    */
  private val postDeleteCache =
    new graft.Memo[(org.apache.spark.sql.SparkSession, String), String]

  private[queries] val PostDeletePredicate = "doc_id % 7 = 0"

  private def postDeleteRootOf(
      s: org.apache.spark.sql.SparkSession, d: String): String =
    postDeleteCache.get((s, d)) {
      val root = java.nio.file.Files
        .createTempDirectory("graft-textindex-del").toString
      graft.sources.TextIndex.build(s, Tables.documents(s, d), root)
      graft.sources.TextIndex.delete(s, root, PostDeletePredicate)
      root
    }

  /** A third index per (session, dataset), built PURELY through the
    * streaming path (init → 3 ingestBatch transactions → optimize) —
    * the graded proof that a stream-maintained index converges to the
    * batch-built one (VERDICT r15 item 3). Batch assignment hashes
    * doc_id; any disjoint split converges to the same folded index.
    */
  private val streamIndexCache =
    new graft.Memo[(org.apache.spark.sql.SparkSession, String), String]

  private def streamIndexRootOf(
      s: org.apache.spark.sql.SparkSession, d: String): String =
    streamIndexCache.get((s, d)) {
      val root = java.nio.file.Files
        .createTempDirectory("graft-textindex-stream").toString
      val txn = java.nio.file.Files
        .createTempDirectory("graft-textindex-stream-txn").toString
      graft.sources.TextIndex.init(root)
      val docs = Tables.documents(s, d)
      (0 until 3).foreach { i =>
        val batch = docs.filter(
          pmod(xxhash64(col("doc_id")), lit(3)) === lit(i))
        graft.sources.TextIndex.ingestBatch(s, batch, root, txn, i.toLong)
      }
      graft.sources.TextIndex.optimize(s, root)
      root
    }

  /** Drop the memoized index roots AND their temp-dir tables (the
    * same lifecycle contract as Dedup's band-history cache: "OS
    * reclaims /tmp" only holds at reboot, so repeated clear+rerun
    * cycles must not accumulate full postings tables).
    */
  private[graft] def clearIndexCache(): Unit =
    Seq(indexCache, postDeleteCache, streamIndexCache).foreach { cache =>
      cache.keys.foreach { k =>
        cache.peek(k).foreach { root =>
          graft.sources.SnapshotTable.deleteTree(java.nio.file.Paths.get(root))
        }
        cache.remove(k)
      }
    }

  /** Conjunctive term retrieval THROUGH the inverted index (sources/
    * TextIndex): documents containing every query term, ranked by
    * summed term frequency, doc_id tiebreak. The oracle recomputes the
    * same answer from the raw text — pinning that the index-backed
    * read path (bucket-sliced snapshot table, value-set + token-bloom
    * file pruning) is exactly equivalent to a full corpus scan. At
    * 100 TB the full scan is the thing you can no longer afford;
    * the index read touches ~|terms| buckets of postings instead.
    */
  val indexSearch = QueryDef(
    "q_index_search",
    (s, d) => graft.sources.TextIndex
      .search(s, indexRootOf(s, d), Seq("spark", "vector", "stream"), 20)
      .orderBy(col("score").desc, col("doc_id")),
    Some("""
      WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents),
      tf AS (
        SELECT doc_id, token, count(*) AS tf
        FROM tok
        WHERE token IN ('spark', 'vector', 'stream')
        GROUP BY doc_id, token)
      SELECT doc_id, CAST(sum(tf) AS BIGINT) AS score
      FROM tf
      GROUP BY doc_id
      HAVING count(DISTINCT token) = 3
      ORDER BY score DESC, doc_id
      LIMIT 20
    """))

  /** Exact PHRASE retrieval through the positional index: documents
    * where "spark table" occurs as consecutive tokens, with the
    * occurrence count. The oracle recomputes adjacency from the raw
    * token lists (positions, not string-replace — overlapping
    * occurrences count), pinning the positional posting lists and the
    * shifted-intersection evaluation end-to-end. The capability a raw
    * tf index cannot express: conjunctive search finds documents
    * containing both words anywhere; this finds the collocation.
    */
  val indexPhrase = QueryDef(
    "q_index_phrase",
    (s, d) => graft.sources.TextIndex
      .searchPhrase(s, indexRootOf(s, d), Seq("spark", "table"), 30)
      .orderBy(col("matches").desc, col("doc_id")),
    Some("""
      WITH tok AS (
        SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      occ AS (
        SELECT doc_id,
               len(list_filter(range(1, len(l)),
                 i -> l[i] = 'spark' AND l[i+1] = 'table')) AS matches
        FROM tok)
      SELECT doc_id, CAST(matches AS BIGINT) AS matches
      FROM occ
      WHERE matches > 0
      ORDER BY matches DESC, doc_id
      LIMIT 30
    """))

  /** Proximity retrieval (NEAR/5) through the positional index: the
    * IR capability between conjunctive search (terms anywhere) and
    * exact phrase (adjacent) — documents where "spark" occurs within
    * 5 raw token slots of "table", counting the spark-occurrences
    * that have such a neighbor. Two pruned posting-slice reads + a
    * per-doc position-window comparison; the oracle recomputes the
    * same counts from raw split positions (1-based in DuckDB,
    * 0-based in the index — only distances surface, so the bases
    * cancel). Supersets q_index_phrase's adjacency hits by
    * construction.
    */
  val indexNear = QueryDef(
    "q_index_near",
    (s, d) => graft.sources.TextIndex
      .searchNear(s, indexRootOf(s, d), "spark", "table", 5, 30)
      .orderBy(col("near_count").desc, col("doc_id")),
    Some("""
      WITH tok AS (
        SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      occ AS (
        SELECT doc_id,
               len(list_filter(range(1, len(l) + 1), i -> l[i] = 'spark'
                 AND len(list_filter(range(greatest(1, i - 5), least(len(l), i + 5) + 1),
                   j -> l[j] = 'table')) > 0)) AS near_count
        FROM tok)
      SELECT doc_id, CAST(near_count AS BIGINT) AS near_count
      FROM occ
      WHERE near_count > 0
      ORDER BY near_count DESC, doc_id
      LIMIT 30
    """))

  /** Targeted contamination forensics through the index: given a
    * fixed set of benchmark phrases, how many corpus documents
    * contain each one, and how many times in total — the question a
    * decontamination pass asks per eval suite, answered by |phrases|
    * positional probes (each ~2 pruned posting slices) instead of a
    * corpus scan per phrase. searchPhrase k is corpus-sized here
    * (Int.MaxValue) because the AGGREGATE needs every match; the
    * per-phrase result stays |matching docs|, and the final output is
    * one row per phrase. The oracle recomputes each phrase's
    * adjacency counts from raw text.
    */
  val indexForensics = QueryDef(
    "q_index_forensics",
    (s, d) => {
      val root = indexRootOf(s, d)
      val phrases = Seq(Seq("spark", "table"), Seq("hash", "join"),
        Seq("data", "stream"))
      phrases.map { p =>
        graft.sources.TextIndex.searchPhrase(s, root, p, Int.MaxValue)
          .agg(count(lit(1)).as("n_docs"),
            coalesce(sum(col("matches")), lit(0L)).as("total_matches"))
          .select(lit(p.mkString(" ")).as("phrase"),
            col("n_docs"), col("total_matches"))
      }.reduce(_ unionAll _)
        .orderBy(col("phrase"))
    },
    Some("""
      WITH tok AS (
        SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      probes(phrase, w1, w2) AS (
        VALUES ('spark table', 'spark', 'table'),
               ('hash join', 'hash', 'join'),
               ('data stream', 'data', 'stream')),
      occ AS (
        SELECT p.phrase, t.doc_id,
               len(list_filter(range(1, len(t.l)),
                 i -> t.l[i] = p.w1 AND t.l[i+1] = p.w2)) AS matches
        FROM probes p CROSS JOIN tok t)
      SELECT phrase, count(*) FILTER (matches > 0) AS n_docs,
             CAST(coalesce(sum(matches), 0) AS BIGINT) AS total_matches
      FROM occ
      GROUP BY phrase
      ORDER BY phrase
    """))

  /** BM25-ranked retrieval THROUGH the index — q_bm25's exact answer
    * (same terms, same k1/b, same positive-idf formula, same oracle
    * CTE) computed from index state alone: tf from the pruned posting
    * slices, document lengths and (N, avgdl) from the doc-stats side
    * table. Grades that the index carries sufficient statistics for
    * ranked retrieval, not just boolean/phrase matching — the oracle
    * recomputes BM25 from raw text and must hash-match.
    */
  val indexBm25 = QueryDef(
    "q_index_bm25",
    (s, d) => graft.sources.TextIndex
      .searchRanked(s, indexRootOf(s, d), Seq("hash", "join", "stream"), 20)
      .orderBy(col("bm25").desc, col("doc_id")),
    Some(s"""
      WITH $bm25ScoredCte
      SELECT doc_id, bm25 FROM bm25s
      ORDER BY bm25 DESC, doc_id
      LIMIT 20
    """))

  /** BM25 retrieval AFTER corpus surgery (r16): documents matching
    * `doc_id % 7 = 0` were DELETED from the index via deletion-vector
    * subtraction on the postings AND doc-stats tables — no rewrite,
    * cost ∝ deleted rows. The oracle recomputes BM25 from the raw
    * SURVIVING text, so a hash match pins the whole deletion path:
    * deleted docs can't score (their tf rows are DV-subtracted),
    * can't be scored AGAINST (N, avgdl, df shrink to the live
    * corpus), and live scores shift exactly as a fresh build over the
    * filtered corpus would shift them. This is the index's
    * dedup/decontamination contract: flag → delete → retrieval
    * answers as if the docs never existed.
    */
  val indexPostDelete = QueryDef(
    "q_index_postdelete",
    (s, d) => graft.sources.TextIndex
      .searchRanked(s, postDeleteRootOf(s, d), Seq("hash", "join", "stream"), 20)
      .orderBy(col("bm25").desc, col("doc_id")),
    Some(s"""
      WITH live AS (SELECT * FROM documents WHERE doc_id % 7 <> 0),
      ${bm25CteOver("live")}
      SELECT doc_id, bm25 FROM bm25s
      ORDER BY bm25 DESC, doc_id
      LIMIT 20
    """))

  /** q_hybrid_rrf's exact answer with the LEXICAL leg served from the
    * inverted index instead of a corpus scan — the full RAG retrieval
    * stack from index state: BM25 top-20 out of ~|terms| pruned
    * posting slices (searchRanked), vector cosine top-20 (the brute
    * baseline leg), reciprocal-rank fusion over ≤40 rows. Shares
    * q_hybrid_rrf's oracle verbatim, so the hash compare pins
    * index-served fusion ≡ scan-served fusion ≡ the DuckDB recompute.
    * At 100 TB this is the difference between a retrieval stack that
    * scans the corpus per query and one that reads a few posting
    * slices; the rank window runs over the 20-row candidate list,
    * never the corpus.
    */
  val indexRrf = QueryDef(
    "q_index_rrf",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      graft.functions.expressions.CosineSimilarity.register(s)
      val wLex = Window.orderBy(col("bm25").desc, col("doc_id"))
      val lex = graft.sources.TextIndex
        .searchRanked(s, indexRootOf(s, d), Seq("hash", "join", "stream"), 20)
        .withColumn("rank_lex", row_number().over(wLex).cast("long"))
        .select(col("doc_id"), col("rank_lex"))
      val probe = Tables.embeddings(s, d).filter(col("vec_id") === 0)
        .select(col("embedding").as("probe_emb"))
      val wVec = Window.orderBy(col("cos").desc, col("doc_id"))
      val vec = Tables.embeddings(s, d).filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(probe))
        .select(col("vec_id").as("doc_id"),
          graft.functions.VectorFunctions
            .cosineFast(col("embedding"), col("probe_emb")).as("cos"))
        .withColumn("rank_vec", row_number().over(wVec).cast("long"))
        .filter(col("rank_vec") <= 20)
        .select(col("doc_id"), col("rank_vec"))
      lex.join(vec, Seq("doc_id"), "full_outer")
        .select(col("doc_id"), col("rank_lex"), col("rank_vec"),
          (coalesce(lit(1.0) / (lit(60) + col("rank_lex")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + col("rank_vec")), lit(0.0)))
            .cast("float").as("rrf"))
        .orderBy(col("rrf").desc, col("doc_id"))
        .limit(10)
    },
    hybridRrf.oracle)

  /** q_index_bm25's exact answer from an index built PURELY through
    * the streaming path — init, three ingestBatch transactions (each
    * postings + doc lengths + batch marker in one SnapshotTransaction,
    * positions segment-shifted per batch), then optimize() folding the
    * per-batch rows and restoring the pruning sidecars. Same terms,
    * same oracle SQL as q_index_bm25, so the driver's hash compare
    * pins stream-built ≡ batch-built ≡ raw-corpus-scan (VERDICT r15
    * item 3: the streaming maintenance path was spec-only before).
    */
  val indexBm25Stream = QueryDef(
    "q_index_bm25_stream",
    (s, d) => graft.sources.TextIndex
      .searchRanked(s, streamIndexRootOf(s, d), Seq("hash", "join", "stream"), 20)
      .orderBy(col("bm25").desc, col("doc_id")),
    Some(s"""
      WITH $bm25ScoredCte
      SELECT doc_id, bm25 FROM bm25s
      ORDER BY bm25 DESC, doc_id
      LIMIT 20
    """))

  def defs: Seq[QueryDef] = Seq(
    textJaccard, ngramJaccard, textContainment, ngramNovelty, langId,
    langStats, textQuality,
    tokenStats, docFingerprint, cleanCorpus, tfIdf, sampleBalanced,
    vocabCoverage, trainSplit, contamination, profileDocuments,
    repetition, qualityRules, redactTerms, unigramLogprob, zipfFit,
    shardPlan, chunkDocs, driftPsi, cooccurrence, boilerplate, bm25,
    hybridRrf, jaroWinkler, damerau, mixtureSample, corpusPipeline,
    clusterKeywords, lengthTrim, bigramLogprob, qualityLogreg, groupSplit,
    indexSearch, indexPhrase, indexNear, indexForensics, indexBm25,
    indexPostDelete, indexBm25Stream, indexRrf)
}
