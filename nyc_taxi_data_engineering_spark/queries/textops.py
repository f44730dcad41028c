"""Text-analysis queries over the ``documents`` table (M7 training-data
pipeline extensions): token counting, quality scoring, language ID,
fingerprinting. All native Column expressions — zero Python UDFs.

Oracles are generated from the same constants/regexes as the Spark
expressions (functions/text.py) so both sides share one definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_taxi_data_engineering_spark.catalog import load_table_parallel as load_table
from nyc_taxi_data_engineering_spark.functions import text as T
from nyc_taxi_data_engineering_spark.queries.registry import query


@query(
    "text_token_stats",
    oracle=f"""
SELECT doc_id,
       length(text) AS n_chars,
       len({T.sql_tokens('text')}) AS ws_tokens,
       {T.sql_token_count_bpe('text')} AS bpe_tokens,
       round(length(text) * 1.0 / len({T.sql_tokens('text')}), 6) AS chars_per_token
FROM documents
""",
    bench=True,
)
def q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = F.col("text")
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.length(c).alias("n_chars"),
        T.token_count_ws(c).alias("ws_tokens"),
        T.token_count_bpe(c).alias("bpe_tokens"),
        F.round(F.length(c) / T.token_count_ws(c), 6).alias("chars_per_token"),
    )


@query(
    "text_quality_scores",
    oracle=f"""
SELECT doc_id,
       len({T.sql_tokens('text')}) AS n_tokens,
       round(len(list_distinct({T.sql_tokens('text')})) * 1.0 / len({T.sql_tokens('text')}), 6)
           AS type_token_ratio,
       CASE WHEN length(text) > 0
            THEN round({T.sql_punct_count('text')} * 1.0 / length(text), 6)
       END AS punct_ratio,
       round({T.sql_stopword_count('text')} * 1.0 / len({T.sql_tokens('text')}), 6)
           AS stopword_ratio,
       {T.sql_quality_score('text')} AS quality_score,
       CASE WHEN {T.sql_quality_score('text')} >= 0.7 THEN 'HIGH'
            WHEN {T.sql_quality_score('text')} >= 0.5 THEN 'MEDIUM'
            ELSE 'LOW' END AS quality_bucket
FROM documents
""",
)
def q_text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = F.col("text")
    feats = T.quality_features(c)
    score = T.quality_score(c)
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        feats["n_tokens"].alias("n_tokens"),
        feats["type_token_ratio"].alias("type_token_ratio"),
        feats["punct_ratio"].alias("punct_ratio"),
        feats["stopword_ratio"].alias("stopword_ratio"),
        score.alias("quality_score"),
        T.quality_bucket(score).alias("quality_bucket"),
    )


@query(
    "text_langid_confusion",
    oracle=f"""
SELECT lang AS labeled_lang, {T.sql_lang_id('text')} AS predicted_lang,
       COUNT(*) AS n_docs
FROM documents
GROUP BY lang, predicted_lang
""",
)
def q_text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the marker-word language-ID heuristic vs the
    labeled ``lang`` column (heuristic + ground truth in one query)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.col("lang").alias("labeled_lang"),
            T.lang_id(F.col("text")).alias("predicted_lang"),
        )
        .groupBy("labeled_lang", "predicted_lang")
        .agg(F.count("*").alias("n_docs"))
    )


TOP_TOKENS_K = 50


@query(
    "corpus_top_tokens",
    oracle=f"""
SELECT token,
       COUNT(*) AS n_occurrences,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM (
  SELECT doc_id, unnest({T.sql_tokens('text')}) AS token FROM documents
)
WHERE len(token) > 0
GROUP BY token
ORDER BY n_occurrences DESC, token
LIMIT {TOP_TOKENS_K}
""",
)
def q_corpus_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy hitters: top-K tokens by occurrence count with
    document frequency. explode → hash-agg (map-side combine shrinks
    the shuffle to the vocabulary) → orderBy+limit, which Spark plans
    as TakeOrderedAndProject: each task keeps only its local top-K, so
    the driver merges |tasks|×K rows — no global sort, no single-task
    window. Tie-break on token keeps the K-boundary deterministic."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("token"))
        .filter(F.length("token") > 0)
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), "token")
        .limit(TOP_TOKENS_K)
    )


@query(
    "token_length_histogram",
    oracle=f"""
SELECT len(token) AS token_len,
       COUNT(*) AS n_tokens,
       CAST(COUNT(DISTINCT token) AS BIGINT) AS n_distinct_tokens
FROM (
  SELECT unnest({T.sql_tokens('text')}) AS token FROM documents
)
WHERE len(token) > 0
GROUP BY token_len
""",
)
def q_token_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length distribution over the corpus — the standard
    pre-training length-diagnostics histogram. One explode + one
    hash-agg keyed by length (tiny key domain → near-total map-side
    combine; the shuffle carries |lengths| rows per task)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(T.tokens(F.col("text"))).alias("token"))
        .filter(F.length("token") > 0)
        .groupBy(F.length("token").alias("token_len"))
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("token").alias("n_distinct_tokens"),
        )
    )


@query(
    "text_fingerprints",
    oracle=f"""
SELECT doc_id,
       {T.sql_fingerprint('text')} AS fingerprint,
       len({T.sql_word_shingles('text')}) AS n_shingles
FROM documents
""",
    bench=True,
)
def q_text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash doc fingerprint (min-md5 over char 8-shingles) plus
    the word-shingle cardinality used by the dedup family."""
    return (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text", T.tokens(F.col("text")).alias("_toks"))
        .select(
            "doc_id",
            T.fingerprint("text").alias("fingerprint"),
            F.size(T.word_shingles_of(F.col("_toks"))).alias("n_shingles"),
        )
    )


# Gopher corpus-filter thresholds (Rae et al. 2021, Appendix A1.1 —
# the rule battery most pretraining pipelines start from). The
# duplicate-line rules live in doc_repetition_metrics; the symbol
# rule here uses Gopher's '#'/ellipsis markers.
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 50, 100_000
GOPHER_MWL_LO, GOPHER_MWL_HI = 3.0, 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_RATIO = 0.8
GOPHER_MIN_STOPWORDS = 2


@query(
    "gopher_quality_gates",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {T.sql_tokens('text')} AS toks,
         len(regexp_extract_all(text, '#')) + len(regexp_extract_all(text, '\\.\\.\\.'))
           AS n_sym,
         {T.sql_stopword_count('text')} AS stop_hits
  FROM documents
),
m AS (
  SELECT doc_id,
         len(toks) AS n_words,
         round(list_sum(list_transform(toks, w -> length(w))) * 1.0 / len(toks), 6)
           AS mean_word_len,
         round(n_sym * 1.0 / len(toks), 6) AS symbol_ratio,
         round(len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]'))) * 1.0
               / len(toks), 6) AS alpha_word_ratio,
         stop_hits AS stopword_hits
  FROM t WHERE len(toks) >= 1
)
SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_word_ratio, stopword_hits,
       (n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})
       AND (mean_word_len BETWEEN {GOPHER_MWL_LO} AND {GOPHER_MWL_HI})
       AND symbol_ratio <= {GOPHER_MAX_SYMBOL_RATIO}
       AND alpha_word_ratio >= {GOPHER_MIN_ALPHA_RATIO}
       AND stopword_hits >= {GOPHER_MIN_STOPWORDS} AS keep
FROM m
""",
)
def q_gopher_quality_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule battery as one codegen'd projection: word-count
    bounds, mean-word-length band, symbol-to-word ratio, alphabetic-
    word ratio, minimum stopword hits, and the conjunctive keep/drop
    verdict. Tokenizes once into an array column and derives every
    rule from it — one scan, no shuffle, no UDF; the corpus-gate
    shape that costs a single pass at 100 TB."""
    c = F.col("text")
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        T.tokens(c).alias("_toks"),
        (F.regexp_count(c, F.lit("#")) + F.regexp_count(c, F.lit(r"\.\.\."))).alias(
            "_n_sym"
        ),
        T.stopword_count(c).alias("stopword_hits"),
    ).filter(F.size("_toks") >= 1)
    n_words = F.size("_toks")
    m = t.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(
            F.expr("aggregate(_toks, 0, (acc, w) -> acc + length(w))") / n_words, 6
        ).alias("mean_word_len"),
        F.round(F.col("_n_sym") / n_words, 6).alias("symbol_ratio"),
        F.round(
            F.expr("size(filter(_toks, w -> w rlike '[A-Za-z]'))") / n_words, 6
        ).alias("alpha_word_ratio"),
        "stopword_hits",
    )
    return m.withColumn(
        "keep",
        F.col("n_words").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
        & F.col("mean_word_len").between(GOPHER_MWL_LO, GOPHER_MWL_HI)
        & (F.col("symbol_ratio") <= GOPHER_MAX_SYMBOL_RATIO)
        & (F.col("alpha_word_ratio") >= GOPHER_MIN_ALPHA_RATIO)
        & (F.col("stopword_hits") >= GOPHER_MIN_STOPWORDS),
    )


# Seed keyword sets over the corpus vocabulary — the weak-supervision
# taxonomy every domain-mixing pipeline starts from. One definition
# feeds both engines.
DOMAIN_KEYWORDS = {
    "query_engine": ["query", "sql", "join", "filter", "scan", "agg"],
    "streaming": ["stream", "window", "batch", "watermark"],
    "storage": ["table", "row", "column", "partition", "merge"],
}
DOMAIN_MIN_HITS = 2


@query(
    "domain_tags_docs",
    oracle=f"""
WITH kw(keyword, domain) AS (VALUES {", ".join(f"('{k}', '{d}')" for d, ks in sorted(DOMAIN_KEYWORDS.items()) for k in ks)}),
toks AS (
    SELECT DISTINCT doc_id, unnest({T.sql_tokens('text')}) AS tok FROM documents
),
hits AS (
    SELECT t.doc_id, k.domain, COUNT(*) AS n_hits
    FROM toks t JOIN kw k ON t.tok = k.keyword
    GROUP BY t.doc_id, k.domain
),
best AS (
    SELECT doc_id, domain, n_hits FROM (
        SELECT doc_id, domain, n_hits,
               row_number() OVER (PARTITION BY doc_id ORDER BY n_hits DESC, domain) AS rn
        FROM hits WHERE n_hits >= {DOMAIN_MIN_HITS}
    ) WHERE rn = 1
)
SELECT domain, COUNT(*) AS n_docs,
       CAST(SUM(n_hits) AS DOUBLE) / COUNT(*) AS avg_hits
FROM best GROUP BY domain
""",
)
def q_domain_tags_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seed-keyword domain tagging — the weak-supervision taxonomy
    labeler behind domain mixing and targeted sampling: distinct
    tokens equi-join a BROADCAST keyword dim (the taxonomy is always
    tiny), per-(doc, domain) hit counts aggregate with map-side
    combine, and each doc's winning domain is an argmax folded into a
    ``min(struct(-hits, domain))`` hash agg — no window over data,
    ties to the lexicographically first domain in both engines. Docs
    under the hit floor stay untagged (excluded)."""
    kw_rows = [
        (k, d) for d, ks in sorted(DOMAIN_KEYWORDS.items()) for k in ks
    ]
    kw = spark.createDataFrame(kw_rows, "keyword string, domain string")
    toks = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(T.tokens(F.col("text"))).alias("tok"))
        .distinct()
    )
    hits = (
        toks.join(F.broadcast(kw), toks["tok"] == kw["keyword"])
        .groupBy("doc_id", "domain")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .filter(F.col("n_hits") >= DOMAIN_MIN_HITS)
    )
    best = (
        hits.groupBy("doc_id")
        .agg(F.min(F.struct((-F.col("n_hits")).alias("neg"), F.col("domain").alias("d"), F.col("n_hits").alias("h"))).alias("b"))
        .select("doc_id", F.col("b.d").alias("domain"), F.col("b.h").alias("n_hits"))
    )
    return best.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("n_hits").cast("double") / F.count(F.lit(1))).alias("avg_hits"),
    )


BOILER_N = 4  # span width of the boilerplate detector
BOILER_DF = 3  # spans seen in >= this many distinct docs get stripped


@query(
    "boilerplate_span_scrub",
    oracle=f"""
WITH base AS (
    SELECT doc_id,
           [w for w in string_split_regex(trim(text), '\\s+') if len(w) > 0] AS toks
    FROM documents
),
grams AS (
    SELECT doc_id, i AS gpos,
           array_to_string(toks[i:i+{BOILER_N - 1}], ' ') AS gram
    FROM base, unnest(generate_series(1, len(toks) - {BOILER_N - 1})) AS t(i)
),
hot AS (
    SELECT gram FROM grams GROUP BY gram
    HAVING COUNT(DISTINCT doc_id) >= {BOILER_DF}
),
cov AS (
    SELECT DISTINCT g.doc_id, j AS cpos
    FROM grams g JOIN hot USING (gram),
         unnest(generate_series(g.gpos, g.gpos + {BOILER_N - 1})) AS u(j)
),
tokpos AS (
    SELECT doc_id, i AS pos, toks[i] AS tok
    FROM base, unnest(generate_series(1, len(toks))) AS t(i)
),
kept AS (
    SELECT t.doc_id, t.pos, t.tok
    FROM tokpos t
    WHERE NOT EXISTS (
        SELECT 1 FROM cov c WHERE c.doc_id = t.doc_id AND c.cpos = t.pos
    )
),
rebuilt AS (
    SELECT doc_id,
           COUNT(*) AS n_kept,
           array_to_string(list(tok ORDER BY pos), ' ') AS clean_text
    FROM kept GROUP BY doc_id
)
SELECT b.doc_id,
       CAST(len(b.toks) AS INT) AS n_tokens,
       CAST(len(b.toks) - COALESCE(r.n_kept, 0) AS INT) AS n_removed,
       COALESCE(r.clean_text, '') AS clean_text
FROM base b LEFT JOIN rebuilt r USING (doc_id)
""",
)
def q_boilerplate_span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-statistics-driven boilerplate removal (the RefinedWeb /
    Gopher repetition-cleanup move, span-level because this corpus has
    no line structure): any {BOILER_N}-gram span appearing in >=
    {BOILER_DF} distinct documents is boilerplate — nav chrome, legal
    footers, template text — and every token position it covers is
    stripped from every document, preserving the order of what
    survives. This is the one transformation family where the EDIT to
    a document is decided by CORPUS-level statistics, so both the
    detector and the surgery sit under the hash gate.

    Scale shape: gram explode -> df hash agg (map-side combine) ->
    semi-join occurrences against the hot-gram dim -> covered-position
    explode + distinct -> one keyed anti-join against the token stream
    -> ordered regroup. Every join is keyed on (doc, pos) or the gram
    string; nothing all-pairs, no windows."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.filter(T.tokens(F.col("text")), lambda w: F.length(w) > 0).alias("toks"),
    )
    grams = base.select(
        "doc_id", F.posexplode(T.word_ngrams(F.col("toks"), BOILER_N)).alias("gpos", "gram")
    )
    hot = (
        grams.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") >= BOILER_DF)
        .select("gram")
    )
    cov = (
        grams.join(hot, "gram")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("gpos"), F.col("gpos") + F.lit(BOILER_N - 1))
            ).alias("pos"),
        )
        .distinct()
        .withColumn("_cov", F.lit(1))
    )
    tokpos = base.select("doc_id", F.posexplode("toks").alias("pos", "tok"))
    kept = tokpos.join(cov, ["doc_id", "pos"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))), lambda s: s.tok
            ),
            " ",
        ).alias("clean_text"),
    )
    return base.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        (F.size("toks") - F.coalesce(F.col("n_kept"), F.lit(0)))
        .cast("int")
        .alias("n_removed"),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
    )


# ---------------------------------------------------------------------------
# PMI collocation mining
# ---------------------------------------------------------------------------

PMI_MIN_PAIR = 5  # bigram support floor — kills the noise tail
PMI_TOPK = 100


@query(
    "pmi_collocations",
    oracle=f"""
WITH base AS (
  SELECT doc_id,
         [w for w in string_split_regex(trim(text), '\\s+') if len(w) > 0] AS toks
  FROM documents
),
tok2 AS (SELECT unnest(toks) AS tok FROM base),
uni AS (SELECT tok, count(*) AS cnt FROM tok2 GROUP BY tok),
pr AS (
  SELECT string_split(g, ' ')[1] AS w1, string_split(g, ' ')[2] AS w2
  FROM (SELECT unnest({T.sql_word_ngrams('toks', 2)}) AS g FROM base)
),
pairs AS (
  SELECT w1, w2, count(*) AS pair_cnt FROM pr GROUP BY w1, w2
  HAVING count(*) >= {PMI_MIN_PAIR}
),
tot AS (
  SELECT (SELECT count(*) FROM tok2) AS tot_u,
         (SELECT count(*) FROM pr) AS tot_b
)
SELECT w1, w2, pair_cnt,
       u1.cnt AS c1, u2.cnt AS c2,
       round((CAST(pair_cnt AS DOUBLE) * tot_u * tot_u)
             / (CAST(u1.cnt AS DOUBLE) * u2.cnt * tot_b), 6) AS lift
FROM pairs
JOIN uni u1 ON u1.tok = pairs.w1
JOIN uni u2 ON u2.tok = pairs.w2
CROSS JOIN tot
ORDER BY lift DESC, w1, w2
LIMIT {PMI_TOPK}
""",
)
def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top-{PMI_TOPK} adjacent-token pairs by PMI
    lift — p(w1,w2) / (p(w1)p(w2)) — with pair support >= {PMI_MIN_PAIR}.
    The standard phrase-detection pass (word2vec's phrase join, Gensim
    Phrases) a tokenizer-training pipeline runs before building a merge
    vocabulary. The score is the RAW likelihood ratio, not its log:
    monotone in PMI, so the ranking is identical, and it avoids
    cross-engine libm (one rounded IEEE divide instead of ln). Both
    engines evaluate the same left-associated expression on exact
    BIGINT-promoted doubles, so the 6-dp rounding is bit-identical.

    Scale shape: explode to tokens / bigrams -> two hash aggs with
    map-side combine (outputs are vocabulary-sized, Zipf-bounded) ->
    support filter FIRST (pairs below {PMI_MIN_PAIR} never join) ->
    two keyed joins against the unigram table -> 1-row totals
    broadcast -> TakeOrderedAndProject top-K. No windows, no
    self-joins on the corpus, no collect."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.filter(T.tokens(F.col("text")), lambda w: F.length(w) > 0).alias("toks"),
    )
    tok2 = base.select(F.explode("toks").alias("tok"))
    uni = tok2.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    pr = base.select(F.explode(T.word_ngrams(F.col("toks"), 2)).alias("g")).select(
        F.substring_index("g", " ", 1).alias("w1"),
        F.substring_index("g", " ", -1).alias("w2"),
    )
    pairs = (
        pr.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
        .filter(F.col("pair_cnt") >= PMI_MIN_PAIR)
    )
    tot = tok2.agg(F.count(F.lit(1)).alias("tot_u")).crossJoin(
        pr.agg(F.count(F.lit(1)).alias("tot_b"))
    )
    u1 = uni.select(F.col("tok").alias("w1"), F.col("cnt").alias("c1"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("cnt").alias("c2"))
    return (
        pairs.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "pair_cnt",
            "c1",
            "c2",
            F.round(
                (F.col("pair_cnt").cast("double") * F.col("tot_u") * F.col("tot_u"))
                / (F.col("c1").cast("double") * F.col("c2") * F.col("tot_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "w1", "w2")
        .limit(PMI_TOPK)
    )


ENTROPY_BOTTOM_K = 20


@query(
    "token_entropy_docs",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, unnest({T.sql_tokens('text')}) AS tok FROM documents
),
tc AS (
    SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
    FROM toks GROUP BY doc_id, tok
),
d AS (
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(CAST(SUM(CAST(round(CAST(c AS DOUBLE) * round(ln(CAST(c AS DOUBLE)), 6), 6)
                         AS DECIMAL(38,6))) AS STRING) AS DOUBLE) AS s
    FROM tc GROUP BY doc_id
),
h AS (
    SELECT doc_id, n_tokens, n_distinct,
           round(ln(CAST(n_tokens AS DOUBLE)), 6)
             - s / CAST(n_tokens AS DOUBLE) AS entropy_nats
    FROM d
)
SELECT doc_id, n_tokens, n_distinct, entropy_nats
FROM h
ORDER BY entropy_nats, doc_id
LIMIT {ENTROPY_BOTTOM_K}
""",
)
def q_token_entropy_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-entropy quality screen — the Shannon-entropy repetition
    signal the Gopher gates' ratio heuristics miss (a doc looping one
    phrase has healthy lengths but collapsed entropy): per doc,
    H = ln(n) - (1/n) * sum_t c_t ln(c_t) over token counts, reported
    for the {ENTROPY_BOTTOM_K} most-degenerate docs (ascending H,
    doc_id tiebreak). Shared whitespace tokenizer; counts are exact
    integers; each c*ln(c) term rounds to 6 dp (the Kaplan-Meier ln
    transport — engines' ln differ ulps, the rounded grid absorbs it)
    and sums as DECIMAL, leaving one division and one subtraction of
    pinned doubles.

    Scale: one explode + two hash aggs with map-side combine; the
    bottom-k is a TakeOrdered, never a global sort."""
    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok")
    )
    tc = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    d = tc.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.sum(
            F.round(
                F.col("c").cast("double") * F.round(F.log(F.col("c").cast("double")), 6),
                6,
            ).cast("decimal(38,6)")
        )
        .cast("double")
        .alias("s"),
    )
    return (
        d.select(
            "doc_id",
            "n_tokens",
            "n_distinct",
            (
                F.round(F.log(F.col("n_tokens").cast("double")), 6)
                - F.col("s") / F.col("n_tokens").cast("double")
            ).alias("entropy_nats"),
        )
        .orderBy("entropy_nats", "doc_id")
        .limit(ENTROPY_BOTTOM_K)
    )


@query(
    "annotator_kappa_langid",
    oracle=f"""
WITH cm AS (
    SELECT lang AS truth, {T.sql_lang_id('text')} AS pred,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM documents GROUP BY lang, pred
),
tot AS (
    SELECT CAST(SUM(n) AS BIGINT) AS nn,
           CAST(SUM(CASE WHEN truth = pred THEN n ELSE 0 END) AS BIGINT) AS agree
    FROM cm
),
marg AS (
    SELECT CAST(SUM(r.rn * c.cn) AS BIGINT) AS chance_prod
    FROM (SELECT truth AS k, SUM(n) AS rn FROM cm GROUP BY truth) r
    JOIN (SELECT pred AS k, SUM(n) AS cn FROM cm GROUP BY pred) c ON c.k = r.k
)
SELECT nn AS n_docs, agree AS n_agree,
       CAST(agree AS DOUBLE) / CAST(nn AS DOUBLE) AS po,
       CAST(chance_prod AS DOUBLE) / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)) AS pe,
       (CAST(agree AS DOUBLE) / CAST(nn AS DOUBLE)
         - CAST(chance_prod AS DOUBLE) / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)))
       / (1.0 - CAST(chance_prod AS DOUBLE) / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)))
         AS kappa
FROM tot, marg
""",
)
def q_annotator_kappa_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the marker-word language-ID heuristic and
    the labeled lang column — the chance-corrected agreement score
    every weak-supervision / annotation-QA pipeline reports where raw
    accuracy misleads (a 5-class labeler gets ~20% agreement free).
    po and pe come from the same confusion counts as
    text_langid_confusion; marginal products sum as exact BIGINTs
    (classes are few), so kappa is a pinned double chain with three
    divisions. One scan, one small hash agg."""
    docs = load_table(spark, sf_dir, "documents")
    cm = (
        docs.select(
            F.col("lang").alias("truth"), T.lang_id(F.col("text")).alias("pred")
        )
        .groupBy("truth", "pred")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = cm.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.sum(F.when(F.col("truth") == F.col("pred"), F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("agree"),
    )
    r = cm.groupBy(F.col("truth").alias("k")).agg(F.sum("n").alias("rn"))
    c = cm.groupBy(F.col("pred").alias("k")).agg(F.sum("n").alias("cn"))
    marg = (
        r.join(c, "k")
        .agg(F.sum(F.col("rn") * F.col("cn")).cast("bigint").alias("chance_prod"))
    )
    nnd = F.col("nn").cast("double")
    po = F.col("agree").cast("double") / nnd
    pe = F.col("chance_prod").cast("double") / (nnd * nnd)
    return tot.crossJoin(F.broadcast(marg)).select(
        F.col("nn").alias("n_docs"),
        F.col("agree").alias("n_agree"),
        po.alias("po"),
        pe.alias("pe"),
        ((po - pe) / (F.lit(1.0) - pe)).alias("kappa"),
    )
