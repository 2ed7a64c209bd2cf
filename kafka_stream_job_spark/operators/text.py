"""Text-analysis operators over ``documents`` — language ID, quality
scoring, token counting, fingerprinting (north star; SURVEY.md §7.3 step 5).

Everything here is pure `pyspark.sql.functions` expressions — JVM-side,
inside whole-stage codegen, zero Python in the hot path. That is the scale
story: these run as a single pass over the text column with no shuffle at
all until the (optional) final rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_stream_job_spark.operators._portable import idiv, jvm_values_df, pround
from kafka_stream_job_spark.registry import register
from kafka_stream_job_spark.tables import load_table

# Tiny per-language stopword markers for the n-gram-free heuristic
# language-ID: count occurrences of high-frequency function words per
# language, argmax wins. Deterministic + engine-portable (regexp_count /
# len(regexp_extract_all) produce identical counts on identical regexes).
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|of|to|is)\b",
    "de": r"\b(der|die|das|und|ist)\b",
    "fr": r"\b(le|la|les|et|est)\b",
    "es": r"\b(el|la|los|y|es)\b",
}


# ---------------------------------------------------------------------------
# Token counting + per-document stats: whitespace tokens, distinct tokens,
# char counts, word-length stats.
# ---------------------------------------------------------------------------
@register(
    "text_token_stats",
    oracle=r"""
        SELECT
            doc_id,
            len(string_split_regex(TRIM(text), '\s+'))                    AS n_tokens,
            len(list_distinct(string_split_regex(LOWER(TRIM(text)), '\s+'))) AS n_uniq_tokens,
            LENGTH(text)                                                  AS n_chars_text,
            ROUND((LENGTH(REPLACE(TRIM(text), ' ', '')) * 1.0
                  / len(string_split_regex(TRIM(text), '\s+'))) * 100.0) / 100.0        AS avg_word_len
        FROM documents
    """,
    tags=("text", "documents"),
    bench=True,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    uniq = F.array_distinct(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(uniq).alias("n_uniq_tokens"),
        F.length("text").alias("n_chars_text"),
        pround(
            F.length(F.replace(F.trim(F.col("text")), F.lit(" "), F.lit("")))
            * F.lit(1.0)
            / F.size(toks),
            2,
        ).alias("avg_word_len"),
    )


# ---------------------------------------------------------------------------
# Quality scoring: the classic cheap filters a pretraining pipeline applies
# — doc length, mean word length, type-token ratio, stopword presence.
# Output is per-doc so the oracle check is exact.
# ---------------------------------------------------------------------------
@register(
    "text_quality_score",
    oracle=r"""
        WITH t AS (
            SELECT
                doc_id,
                lang,
                len(string_split_regex(TRIM(text), '\s+'))   AS n_tokens,
                len(list_distinct(string_split_regex(LOWER(TRIM(text)), '\s+')))
                                                             AS n_uniq,
                len(regexp_extract_all(LOWER(text), '\b(the|and|of|to|is)\b'))
                                                             AS n_stop_en
            FROM documents
        )
        SELECT
            doc_id,
            lang,
            n_tokens,
            ROUND((n_uniq * 1.0 / n_tokens) * 10000.0) / 10000.0                AS type_token_ratio,
            ROUND((n_stop_en * 1.0 / n_tokens) * 10000.0) / 10000.0             AS stopword_ratio,
            CASE WHEN n_tokens BETWEEN 20 AND 1000
                  AND n_uniq * 1.0 / n_tokens > 0.3
                 THEN 1 ELSE 0 END                           AS passes_quality
        FROM t
    """,
    tags=("text", "quality", "documents"),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    n_uniq = F.size(F.array_distinct(F.split(F.lower(F.trim(F.col("text"))), r"\s+")))
    n_stop = F.regexp_count(F.lower(F.col("text")), F.lit(r"\b(the|and|of|to|is)\b"))
    ttr = pround(n_uniq * F.lit(1.0) / n_tokens, 4)
    return docs.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        ttr.alias("type_token_ratio"),
        pround(n_stop * F.lit(1.0) / n_tokens, 4).alias("stopword_ratio"),
        F.when(
            n_tokens.between(20, 1000) & (n_uniq * F.lit(1.0) / n_tokens > 0.3),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("passes_quality"),
    )


# ---------------------------------------------------------------------------
# Heuristic language ID: stopword-marker counts per language, argmax with
# deterministic tiebreak (marker count DESC, language code ASC). Reported
# next to the gold ``lang`` label with an accuracy rollup.
# ---------------------------------------------------------------------------
def _langid_case_sql() -> str:
    cols = {code: f"n_{code}" for code in LANG_MARKERS}
    # greatest over counts, then first language (alphabetical) achieving it.
    greatest = f"greatest({', '.join(cols.values())})"
    arms = " ".join(
        f"WHEN {cols[code]} = best AND best > 0 THEN '{code}'"
        for code in sorted(LANG_MARKERS)
    )
    counts = ", ".join(
        f"len(regexp_extract_all(LOWER(text), '{pat}')) AS {cols[code]}".replace("\\", "\\")
        for code, pat in LANG_MARKERS.items()
    )
    return f"""
        WITH counted AS (
            SELECT doc_id, lang, {counts},
                   {greatest} AS best
            FROM documents
        )
        SELECT
            lang                                              AS gold_lang,
            CASE {arms} ELSE 'und' END                        AS pred_lang,
            COUNT(*)                                          AS n_docs
        FROM counted
        GROUP BY 1, 2
    """


@register(
    "text_language_id",
    oracle=_langid_case_sql(),
    tags=("text", "langid", "documents"),
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    counts = {
        code: F.regexp_count(F.lower(F.col("text")), F.lit(pat))
        for code, pat in LANG_MARKERS.items()
    }
    best = F.greatest(*counts.values())
    pred = F.lit("und")
    # build CASE arms in reverse-alphabetical order so the final expression
    # checks alphabetically-first languages first (same tiebreak as oracle).
    for code in sorted(LANG_MARKERS, reverse=True):
        pred = F.when((counts[code] == best) & (best > 0), F.lit(code)).otherwise(pred)
    return (
        docs.select(F.col("lang").alias("gold_lang"), pred.alias("pred_lang"))
        .groupBy("gold_lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# Document fingerprinting: rolling-hash-style content fingerprint = md5 of
# the normalized token stream, plus a coarse 8-hex-char locality bucket.
# (The full MinHash/SimHash machinery lives in operators/dedup.py.)
# ---------------------------------------------------------------------------
@register(
    "text_fingerprint",
    oracle=r"""
        SELECT
            doc_id,
            md5(array_to_string(string_split_regex(LOWER(TRIM(text)), '\s+'), ' '))
                                                             AS fp,
            substring(md5(array_to_string(
                string_split_regex(LOWER(TRIM(text)), '\s+'), ' ')), 1, 8)
                                                             AS fp_bucket
        FROM documents
    """,
    tags=("text", "fingerprint", "documents"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.array_join(F.split(F.lower(F.trim(F.col("text"))), r"\s+"), " "))
    return docs.select(
        "doc_id",
        fp.alias("fp"),
        F.substring(fp, 1, 8).alias("fp_bucket"),
    )


# ---------------------------------------------------------------------------
# TF-IDF: per-document top terms. Two shuffles, both on high-cardinality
# keys: (1) the (doc, term) tf aggregation, (2) the per-term document
# frequency — then idf joins back on term and a per-doc window keeps the
# top 3. At 100 TB the term dictionary is heavy-tailed; AQE skew handling
# covers the stopword-like hot terms, and no driver-side vocabulary is
# ever built (the "dictionary" lives distributed in the df aggregate).
# Terms shorter than 3 chars are dropped (stopword-ish noise floor).
# ---------------------------------------------------------------------------
@register(
    "text_tfidf_top_terms",
    oracle=r"""
        WITH toks AS (
            SELECT doc_id, UNNEST(string_split_regex(LOWER(TRIM(text)), '\s+')) AS term
            FROM documents
        ),
        terms AS (SELECT doc_id, term FROM toks WHERE LENGTH(term) >= 3),
        tf AS (
            SELECT doc_id, term, COUNT(*) AS tf
            FROM terms GROUP BY doc_id, term
        ),
        df AS (
            SELECT term, COUNT(DISTINCT doc_id) AS df
            FROM terms GROUP BY term
        ),
        n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM terms),
        scored AS (
            SELECT
                tf.doc_id,
                tf.term,
                ROUND((tf.tf * ln(n.n_docs * 1.0 / df.df)) * 10000.0) / 10000.0 AS tfidf
            FROM tf JOIN df USING (term) CROSS JOIN n
        ),
        ranked AS (
            SELECT doc_id, term, tfidf,
                   ROW_NUMBER() OVER (
                       PARTITION BY doc_id ORDER BY tfidf DESC, term ASC
                   ) AS rnk
            FROM scored
        )
        SELECT doc_id, term, tfidf, rnk FROM ranked WHERE rnk <= 3
    """,
    tags=("text", "tfidf", "documents"),
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents", rebalance=True)
    terms = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("term"),
    ).filter(F.length("term") >= 3)
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = terms.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = terms.select(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            pround(
                F.col("tf") * F.log(F.col("n_docs") * F.lit(1.0) / F.col("df")), 4
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "tfidf", "rnk")
    )


# ---------------------------------------------------------------------------
# BPE-ish token counting: a GPT-2-style pre-tokenizer approximated with a
# portable regex alphabet — word runs, single digits, punctuation marks —
# the cheap token-budget estimator a training pipeline runs before the
# real tokenizer. regexp_count with identical patterns on both engines;
# single scan, no shuffle.
# ---------------------------------------------------------------------------
@register(
    "text_bpe_token_count",
    oracle=r"""
        SELECT
            doc_id,
            regexp_extract_all(text, '[A-Za-z]+')        .len() AS n_word_tokens,
            regexp_extract_all(text, '[0-9]')            .len() AS n_digit_tokens,
            regexp_extract_all(text, '[^A-Za-z0-9 ]')    .len() AS n_punct_tokens,
            regexp_extract_all(text, '[A-Za-z]+').len()
              + regexp_extract_all(text, '[0-9]').len()
              + regexp_extract_all(text, '[^A-Za-z0-9 ]').len() AS n_bpe_ish
        FROM documents
    """,
    tags=("text", "tokens", "documents"),
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = F.regexp_count("text", F.lit(r"[A-Za-z]+"))
    digits = F.regexp_count("text", F.lit(r"[0-9]"))
    punct = F.regexp_count("text", F.lit(r"[^A-Za-z0-9 ]"))
    return docs.select(
        "doc_id",
        words.alias("n_word_tokens"),
        digits.alias("n_digit_tokens"),
        punct.alias("n_punct_tokens"),
        (words + digits + punct).alias("n_bpe_ish"),
    )


# ---------------------------------------------------------------------------
# Rolling-hash document fingerprint (winnowing-lite): polynomial hash of
# every W-token window over per-token integer hashes, fingerprint = the
# MINIMUM window hash — stable under local edits anywhere outside the
# minimal window (the core idea of Schleimer et al.'s winnowing, reduced
# to one fingerprint per doc). All JVM-side integer arithmetic; same
# explode→min-aggregate shape (map-side partials) as the MinHash pass.
# ---------------------------------------------------------------------------
ROLL_W = 4  # window width in tokens
ROLL_B = 1_000_003  # polynomial base
ROLL_P = 2_147_483_647  # 2^31 - 1; Horner steps stay < 2^52 (no int64 overflow)


@register(
    "text_rolling_fingerprint",
    oracle=rf"""
        WITH toks AS (
            SELECT doc_id,
                   string_split({{norm}}, ' ') AS t
            FROM documents
        ),
        hashed AS (
            SELECT doc_id,
                   list_transform(t, x -> ('0x' || substr(md5(x), 1, 7))::BIGINT) AS h
            FROM toks
        ),
        windows AS (
            SELECT doc_id,
                   UNNEST(list_transform(
                       range(0, greatest(len(h) - {ROLL_W}, 0) + 1),
                       i -> ((((h[i+1] % {ROLL_P}) * {ROLL_B} + h[i+2])
                             % {ROLL_P} * {ROLL_B} + h[i+3])
                             % {ROLL_P} * {ROLL_B} + h[i+4]) % {ROLL_P}
                   )) AS wh
            FROM hashed
            WHERE len(h) >= {ROLL_W}
        )
        SELECT doc_id,
               MIN(wh) AS winnow_fp,
               COUNT(*) AS n_windows
        FROM windows
        GROUP BY doc_id
    """.replace("{norm}", "LOWER(TRIM(regexp_replace(text, '\\s+', ' ', 'g')))"),
    tags=("text", "fingerprint", "rolling-hash", "documents"),
)
def text_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", rebalance=True)
    toks = F.split(
        F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))), " "
    )
    h = F.transform(
        toks,
        lambda x: F.conv(F.substring(F.md5(x), 1, 7), 16, 10).cast("long"),
    )
    n = F.size(h)
    idx = F.sequence(F.lit(0), F.greatest(n - ROLL_W, F.lit(0)))
    wh = F.transform(
        idx,
        lambda i: (
            (
                (
                    (F.element_at(h, i + 1) % ROLL_P) * ROLL_B
                    + F.element_at(h, i + 2)
                )
                % ROLL_P
                * ROLL_B
                + F.element_at(h, i + 3)
            )
            % ROLL_P
            * ROLL_B
            + F.element_at(h, i + 4)
        )
        % ROLL_P,
    )
    staged = (
        docs.where(F.col("text").isNotNull())
        .where(n >= ROLL_W)
        .select("doc_id", F.explode(wh).alias("wh"))
    )
    return staged.groupBy("doc_id").agg(
        F.min("wh").alias("winnow_fp"),
        F.count(F.lit(1)).alias("n_windows"),
    )


# ---------------------------------------------------------------------------
# Deterministic train/eval split — reproducible hash-based sampling, the
# way real training pipelines split corpora (NOT rand(): a hash of the
# stable doc key gives the same split on every run, on any cluster, after
# any repartition, and lets late-arriving docs join the right side).
# Eval rate 5%; the hash is the same 28-bit md5-int used everywhere else.
# ---------------------------------------------------------------------------
EVAL_PCT = 5  # percent of docs routed to eval


@register(
    "split_train_eval",
    oracle=f"""
        SELECT
            split,
            COUNT(*) AS n_docs,
            CAST(SUM(n_chars) AS BIGINT) AS total_chars,
            MIN(doc_id) AS min_doc_id
        FROM (
            SELECT doc_id, n_chars,
                   CASE WHEN ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT
                             % 100 < {EVAL_PCT}
                        THEN 'eval' ELSE 'train' END AS split
            FROM documents
        )
        GROUP BY split
    """,
    tags=("sampling", "split", "documents"),
)
def split_train_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 7),
            16,
            10,
        ).cast("long")
        % 100
    )
    split = F.when(bucket < EVAL_PCT, "eval").otherwise("train")
    return (
        docs.select("doc_id", "n_chars", split.alias("split"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )


# ---------------------------------------------------------------------------
# Corpus-wide bigram frequencies, top 25 — the n-gram statistics pass a
# corpus-analysis pipeline runs (vocabulary/bigram tables for tokenizer
# training). Bigrams are built JVM-side with zip_with over the token
# array and its tail — no Python, one explode, one count shuffle, top-k
# via TakeOrderedAndProject.
# ---------------------------------------------------------------------------
@register(
    "text_top_bigrams",
    oracle=r"""
        WITH toks AS (
            SELECT doc_id, string_split_regex(LOWER(TRIM(text)), '\s+') AS t
            FROM documents
        ),
        bigrams AS (
            SELECT UNNEST(list_transform(
                       range(1, len(t)),
                       i -> t[i] || ' ' || t[i+1]
                   )) AS bigram
            FROM toks
            WHERE len(t) >= 2
        )
        SELECT bigram, COUNT(*) AS n
        FROM bigrams
        GROUP BY bigram
        ORDER BY n DESC, bigram ASC
        LIMIT 25
    """,
    tags=("text", "ngram", "documents"),
)
def text_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", rebalance=True)
    t = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    bigrams = F.zip_with(
        F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))),
        F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return (
        docs.where(F.size(t) >= 2)
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("bigram").asc())
        .limit(25)
    )


# ---------------------------------------------------------------------------
# PII redaction — the mandatory scrub pass before text enters a training
# corpus: emails, phone numbers, and IPv4 addresses replaced by typed
# placeholder tokens, with per-doc match accounting. The synthetic corpus
# carries no PII, so a deterministic injection step plants one of each
# (derived from doc_id) — the redactor then has real positives to find, and
# the oracle verifies both the counts and the complete redacted text (via
# md5 fingerprint). Patterns live in the RE2 ∩ java.util.regex common
# subset (no lookaround, no backrefs) so Spark and DuckDB agree
# byte-for-byte.
# Scale: stateless narrow projection — regexps run JVM-side inside
# whole-stage codegen, no shuffle, no UDF; at 100 TB this is a single
# streaming pass over the text column.
# ---------------------------------------------------------------------------
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\b\d{3}-\d{4}-\d{4}\b"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


@register(
    "text_pii_redaction",
    oracle=rf"""
        WITH injected AS (
            SELECT doc_id,
                   text || ' Contact user' || CAST(doc_id AS VARCHAR)
                        || '@mail.example.com or 555-'
                        || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                        || '-1234 from 10.0.'
                        || CAST(doc_id % 256 AS VARCHAR) || '.77' AS t
            FROM documents
        )
        SELECT doc_id,
               len(regexp_extract_all(t, '{PII_EMAIL}')) AS n_emails,
               len(regexp_extract_all(t, '{PII_PHONE}')) AS n_phones,
               len(regexp_extract_all(
                   regexp_replace(t, '{PII_EMAIL}', '<EMAIL>', 'g'),
                   '{PII_IPV4}')) AS n_ips,
               md5(regexp_replace(regexp_replace(regexp_replace(
                       t, '{PII_EMAIL}', '<EMAIL>', 'g'),
                       '{PII_PHONE}', '<PHONE>', 'g'),
                       '{PII_IPV4}', '<IP>', 'g')) AS redacted_fp
        FROM injected
    """,
    tags=("text", "pii", "redaction", "documents"),
)
def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    injected = F.concat(
        F.col("text"),
        F.lit(" Contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit("-1234 from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".77"),
    )
    # explode(array(...)) barriers: CollapseProject would otherwise inline
    # the injected concat 4× and the email-redaction 2× into the final
    # projection (the round-1 MinHash lesson) — the Generate node pins each
    # to a single evaluation, still narrow and codegen'd.
    staged = docs.select("doc_id", F.explode(F.array(injected)).alias("t"))
    # IPs are counted AFTER email redaction (both engines): the email
    # host part contains dotted tokens an IPv4 regex could graze.
    staged = staged.select(
        "doc_id",
        "t",
        F.explode(
            F.array(F.regexp_replace("t", PII_EMAIL, "<EMAIL>"))
        ).alias("t_no_email"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace("t_no_email", PII_PHONE, "<PHONE>"), PII_IPV4, "<IP>"
    )
    return staged.select(
        "doc_id",
        F.regexp_count("t", F.lit(PII_EMAIL)).alias("n_emails"),
        F.regexp_count("t", F.lit(PII_PHONE)).alias("n_phones"),
        F.regexp_count("t_no_email", F.lit(PII_IPV4)).alias("n_ips"),
        F.md5(redacted).alias("redacted_fp"),
    )


# ---------------------------------------------------------------------------
# Sequence-length histogram — the batch-shape diagnostic every training
# pipeline runs before choosing context length / packing strategy: bucket
# docs by token count (width-32 bins) and report per-bin doc counts and
# token mass. Pairs with pack_sequences_manifest (operators/pipeline.py),
# which consumes exactly this distribution.
# Scale: one narrow pass computes the token count, then a partial-agg
# groupBy on ~dozens of bin keys — the shuffle moves only (bin, partial)
# rows, never documents.
# ---------------------------------------------------------------------------
SEQLEN_BIN = 32


@register(
    "text_seqlen_histogram",
    oracle=rf"""
        WITH t AS (
            SELECT len(string_split_regex(TRIM(text), '\s+')) AS n_tok
            FROM documents
        )
        SELECT
            CAST(FLOOR(n_tok / {SEQLEN_BIN}) AS BIGINT) * {SEQLEN_BIN} AS bin_lo,
            COUNT(*) AS n_docs,
            CAST(SUM(n_tok) AS BIGINT) AS bin_tokens,
            MIN(n_tok) AS min_tok,
            MAX(n_tok) AS max_tok
        FROM t
        GROUP BY bin_lo
    """,
    tags=("text", "histogram", "documents"),
)
def text_seqlen_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return (
        docs.select(n_tok.alias("n_tok"))
        .groupBy(
            (F.floor(F.col("n_tok") / SEQLEN_BIN).cast("long") * SEQLEN_BIN).alias(
                "bin_lo"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n_tok").cast("long")).alias("bin_tokens"),
            F.min("n_tok").alias("min_tok"),
            F.max("n_tok").alias("max_tok"),
        )
    )


# ---------------------------------------------------------------------------
# Repetition quality filter (Gopher-style §A1.1 adapted to single-line
# docs): flag documents whose token stream is dominated by repeats —
# duplicate-token fraction and top-token concentration. Docs failing either
# threshold are the "keep = false" rows a pretraining pipeline drops.
# Scale: explode → (doc_id, tok) partial-count → per-doc rollup; the
# shuffle carries (doc_id, tok, partial) — map-side combine collapses the
# heavy duplicates (that is the very signal being measured), so skewed
# repetitive docs shrink at the mapper, not the reducer.
# ---------------------------------------------------------------------------
REP_MAX_TOP_FRAC = 0.10  # top token may claim ≤10% of all tokens
REP_MAX_DUP_FRAC = 0.60  # ≤60% of tokens may be repeats of earlier ones


@register(
    "text_repetition_filter",
    oracle=rf"""
        WITH tok AS (
            SELECT doc_id,
                   unnest(string_split_regex(LOWER(TRIM(text)), '\s+')) AS tok
            FROM documents
        ),
        cnt AS (
            SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY doc_id, tok
        )
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT)                  AS n_tokens,
               COUNT(*)                                AS n_uniq,
               CAST(MAX(c) AS BIGINT)                  AS top_cnt,
               1.0 - COUNT(*) * 1.0 / SUM(c)           AS dup_frac,
               MAX(c) * 1.0 / SUM(c)                   AS top_frac,
               (MAX(c) * 1.0 / SUM(c) <= {REP_MAX_TOP_FRAC}
                AND 1.0 - COUNT(*) * 1.0 / SUM(c) <= {REP_MAX_DUP_FRAC})
                                                       AS keep
        FROM cnt
        GROUP BY doc_id
    """,
    tags=("text", "quality", "repetition", "documents"),
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", rebalance=True)
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    n_tokens = F.sum("c")
    n_uniq = F.count(F.lit(1))
    top_cnt = F.max("c")
    dup_frac = F.lit(1.0) - n_uniq * F.lit(1.0) / n_tokens
    top_frac = top_cnt * F.lit(1.0) / n_tokens
    return (
        docs.select("doc_id", F.explode(toks).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            n_tokens.alias("n_tokens"),
            n_uniq.alias("n_uniq"),
            top_cnt.alias("top_cnt"),
            dup_frac.alias("dup_frac"),
            top_frac.alias("top_frac"),
            (
                (top_frac <= REP_MAX_TOP_FRAC) & (dup_frac <= REP_MAX_DUP_FRAC)
            ).alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# Token-distribution entropy per document — the diversity signal quality
# filters pair with repetition ratios (low-entropy docs are boilerplate /
# keyword stuffing). H = -Σ p·ln(p) is float-order-sensitive, so the fold
# runs over the token histogram in LEXICOGRAPHIC token order in both
# engines (array_sort + sequential fold here; list(... ORDER BY tok) +
# list_reduce there) — same op sequence, bit-identical pre-rounding.
# Scale: same explode→(doc_id,tok) partial-count shape as the repetition
# filter; the per-doc histogram fold touches only (doc, uniq-token) rows.
# ---------------------------------------------------------------------------
@register(
    "text_token_entropy",
    oracle=r"""
        WITH cnt AS (
            SELECT doc_id, tok, COUNT(*) AS c FROM (
                SELECT doc_id,
                       unnest(string_split_regex(LOWER(TRIM(text)), '\s+')) AS tok
                FROM documents
            ) GROUP BY doc_id, tok
        ),
        hist AS (
            SELECT doc_id,
                   CAST(SUM(c) AS BIGINT) AS n,
                   list(c ORDER BY tok) AS cs
            FROM cnt GROUP BY doc_id
        )
        SELECT doc_id,
               n AS n_tokens,
               ROUND((-list_reduce(
                   list_prepend(0.0, list_transform(cs,
                       c -> (c * 1.0 / n) * ln(c * 1.0 / n))),
                   (acc, x) -> acc + x)) * 10000.0) / 10000.0 AS entropy_r
        FROM hist
    """,
    tags=("text", "quality", "entropy", "documents"),
)
def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", rebalance=True)
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    hist = (
        docs.select("doc_id", F.explode(toks).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("tok", "c"))),
                lambda s: s["c"],
            ).alias("cs"),
        )
    )
    p = lambda c: c * F.lit(1.0) / F.col("n")  # noqa: E731
    entropy = -F.aggregate(
        F.col("cs"),
        F.lit(0.0),
        lambda acc, c: acc + p(c) * F.log(p(c)),
    )
    return hist.select(
        "doc_id",
        F.col("n").alias("n_tokens"),
        pround(entropy, 4).alias("entropy_r"),
    )


# ---------------------------------------------------------------------------
# BM25 ranked retrieval — score every document against a fixed query
# ("stream join vector") with Okapi BM25 (k1=1.2, b=0.75), the classic IR
# complement to text_tfidf_top_terms. All inputs are exact integers
# (regexp_count term frequencies, token-count doc length, doc-frequency
# counts), the corpus stats (N, avgdl, df_t) reduce to ONE broadcast row,
# and the score is a fixed three-term IEEE expression — identical dags in
# both engines, pround(6) on top. ln() portability is already proven by
# the TF-IDF and entropy oracles.
# Scale: corpus stats are a tiny all-reduce; scoring is then a stateless
# narrow map over documents (no shuffle, no join with anything unbounded);
# final top-k is a TakeOrderedAndProject.
# ---------------------------------------------------------------------------
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TERMS = ("stream", "join", "vector")
BM25_TOP = 25


def bm25_scored_ctes() -> str:
    """CTE chain ending in ``bm_scored(doc_id, bm25_r)`` — every document's
    rounded BM25 score. Shared by the top-k query and the hybrid-RRF
    fusion (operators/similarity.py), so both engines' score dags stay
    one definition."""
    tf_cols = ", ".join(
        f"len(regexp_extract_all(LOWER(text), '\\b{t}\\b')) AS tf_{t}"
        for t in BM25_TERMS
    )
    df_cols = ", ".join(
        f"CAST(SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{t}"
        for t in BM25_TERMS
    )
    score = " + ".join(
        f"""ln((s.n_docs - s.df_{t} + 0.5) / (s.df_{t} + 0.5) + 1.0)
            * (d.tf_{t} * ({BM25_K1} + 1.0))
            / (d.tf_{t} + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * d.dl / s.avgdl))"""
        for t in BM25_TERMS
    )
    return f"""t AS (
            SELECT doc_id,
                   len(string_split_regex(TRIM(text), '\\s+')) AS dl,
                   {tf_cols}
            FROM documents
        ),
        s AS (
            SELECT COUNT(*) AS n_docs,
                   CAST(SUM(dl) AS BIGINT) * 1.0 / COUNT(*) AS avgdl,
                   {df_cols}
            FROM t
        ),
        bm_scored AS (
            SELECT d.doc_id,
                   ROUND(({score}) * 1000000.0) / 1000000.0 AS bm25_r
            FROM t d CROSS JOIN s
        )"""


def _bm25_oracle() -> str:
    return f"""
        WITH {bm25_scored_ctes()}
        SELECT doc_id, bm25_r
        FROM bm_scored
        ORDER BY bm25_r DESC, doc_id ASC
        LIMIT {BM25_TOP}
    """


@register(
    "text_bm25_search",
    oracle=_bm25_oracle(),
    tags=("text", "search", "bm25", "documents"),
)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        bm25_scores(spark, sf_dir)
        .orderBy(F.col("bm25_r").desc(), F.col("doc_id").asc())
        .limit(BM25_TOP)
    )


def bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, bm25_r) for every document — the Spark twin of
    :func:`bm25_scored_ctes`."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("dl"),
        *[
            F.regexp_count(F.lower(F.col("text")), F.lit(rf"\b{term}\b")).alias(
                f"tf_{term}"
            )
            for term in BM25_TERMS
        ],
    )
    s = t.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl") * F.lit(1.0) / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf_{term}") > 0, 1).otherwise(0)).alias(
                f"df_{term}"
            )
            for term in BM25_TERMS
        ],
    )
    score = None
    for term in BM25_TERMS:
        idf = F.log(
            (F.col("n_docs") - F.col(f"df_{term}") + 0.5)
            / (F.col(f"df_{term}") + 0.5)
            + 1.0
        )
        part = (
            idf
            * (F.col(f"tf_{term}") * F.lit(BM25_K1 + 1.0))
            / (
                F.col(f"tf_{term}")
                + F.lit(BM25_K1)
                * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl") / F.col("avgdl"))
            )
        )
        score = part if score is None else score + part
    return t.crossJoin(F.broadcast(s)).select(
        "doc_id", pround(score, 6).alias("bm25_r")
    )


# ---------------------------------------------------------------------------
# BPE merge learning as a declarative query — the first BPE_MERGES merge
# rules a byte-pair-encoding tokenizer would learn from this corpus, with
# the merged-pair frequency at each step. Each iteration is: (1) weighted
# bigram counts over the current symbol sequences (explode + partial-agg —
# the corpus-wide statistics pass), (2) argmax pair (total DESC, pair ASC
# — deterministic), (3) greedy left-to-right non-overlapping merge applied
# via a string-accumulator fold (list_reduce / F.aggregate with identical
# CASE arithmetic — handles doubled symbols and adjacent matches exactly
# like a sequential BPE implementation, which plain string replace cannot:
# adjacent matches share the boundary separator).
#
# Scale shape (100 TB): the expensive pass is (1), a partial-agg groupBy
# whose input is one row per DISTINCT word (the word-frequency table,
# itself a partial-agg rollup of the corpus) — exactly how production BPE
# trainers (SentencePiece, HF tokenizers) operate on word-count tables,
# not raw text. Steps (2)/(3) touch |vocab| rows. Iterations chain
# through localCheckpoint so plan depth stays constant per step.
# ---------------------------------------------------------------------------
BPE_MERGES = 3


def _bpe_oracle() -> str:
    def fold(pair_ref: str) -> str:
        pa = f"string_split({pair_ref}, ' ')[1]"
        pb = f"string_split({pair_ref}, ' ')[2]"
        return f"""string_split(trim(list_reduce(
            list_prepend('', toks),
            (acc, x) -> CASE
                WHEN ends_with(acc, ' ' || {pa}) AND x = {pb}
                THEN left(acc, length(acc) - length({pa}) - 1)
                     || ' ' || replace({pair_ref}, ' ', '')
                ELSE acc || ' ' || x END)), ' ')"""

    sql = r"""
        WITH words AS (
            SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM (SELECT unnest(string_split_regex(LOWER(TRIM(text)), '\s+')) AS word
                  FROM documents)
            GROUP BY word
        ),
        v0 AS (
            SELECT cnt,
                   list_transform(generate_series(1, length(word)), i -> word[i])
                       AS toks
            FROM words
        )"""
    for s in range(1, BPE_MERGES + 1):
        sql += f""",
        p{s} AS (
            SELECT pair, CAST(SUM(cnt) AS BIGINT) AS total
            FROM (SELECT cnt,
                         unnest(list_transform(
                             generate_series(1, len(toks) - 1),
                             i -> toks[i] || ' ' || toks[i + 1])) AS pair
                  FROM v{s - 1})
            GROUP BY pair
            ORDER BY total DESC, pair ASC
            LIMIT 1
        )"""
        if s < BPE_MERGES:
            sql += f""",
        v{s} AS (
            SELECT cnt, {fold(f"p.pair")} AS toks
            FROM v{s - 1}, p{s} p
        )"""
    sql += "\n        " + "\n        UNION ALL ".join(
        f"SELECT CAST({s} AS BIGINT) AS merge_step, pair, total FROM p{s}"
        for s in range(1, BPE_MERGES + 1)
    )
    return sql


@register(
    "bpe_learn_merges",
    oracle=_bpe_oracle(),
    tags=("text", "tokenizer", "iterative", "documents"),
)
def bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.substring(F.col("word"), i, 1),
    )
    v = words.select("cnt", chars.alias("toks")).localCheckpoint(eager=False)
    outs = []
    for step in range(1, BPE_MERGES + 1):
        t = F.col("toks")
        bigrams = F.zip_with(
            F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))),
            F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
        best = (
            v.select("cnt", F.explode(bigrams).alias("pair"))
            .groupBy("pair")
            .agg(F.sum("cnt").alias("total"))
            .orderBy(F.col("total").desc(), F.col("pair").asc())
            .limit(1)
            .localCheckpoint(eager=True)
        )
        outs.append(
            best.select(
                F.lit(step).cast("long").alias("merge_step"), "pair", "total"
            )
        )
        if step < BPE_MERGES:
            pa = F.split(F.col("pair"), " ").getItem(0)
            pb = F.split(F.col("pair"), " ").getItem(1)
            folded = F.aggregate(
                F.col("toks"),
                F.lit(""),
                lambda acc, x: F.when(
                    F.endswith(acc, F.concat(F.lit(" "), pa)) & (x == pb),
                    F.concat(
                        F.substr(
                            acc, F.lit(1), F.length(acc) - F.length(pa) - 1
                        ),
                        F.lit(" "),
                        F.replace(F.col("pair"), F.lit(" "), F.lit("")),
                    ),
                ).otherwise(F.concat(acc, F.lit(" "), x)),
            )
            v = (
                v.crossJoin(F.broadcast(best.select("pair")))
                .select("cnt", F.split(F.trim(folded), " ").alias("toks"))
                .localCheckpoint(eager=False)
            )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


# ---------------------------------------------------------------------------
# Bigram language-model quality scoring — the CCNet/Gopher-style "LM
# perplexity filter" trained on the corpus itself: count bigrams over all
# documents, then score each document by its mean add-1-smoothed bigram
# log-probability ln((C(ab)+1)/(C(a)+V)). Low scores = improbable token
# sequences = noise/garble candidates for filtering.
#
# Oracle determinism: the per-bigram log-prob is quantized to INTEGER
# micro-nats (round-to-integer is the portable rounding, _portable.py)
# BEFORE the per-document sum, so the aggregation is exact integer
# arithmetic — no float-summation-order divergence between engines; the
# final mean is one division of two exact integers, then pround.
#
# Scale shape (100 TB): the LM table is bounded by distinct-bigram count
# (vocabulary-squared worst case, corpus-sublinear in practice) and is
# built with partial-agg groupBys; here it broadcasts, at web scale the
# doc-bigram → LM join becomes a shuffle equi-join on the bigram key —
# high-cardinality, skew-absorbed by partial agg on the count side and
# AQE skew-split on the join. Per-doc scoring is one further partial-agg
# groupBy on doc_id. Top-k is a TakeOrdered, not a global sort.
# ---------------------------------------------------------------------------
LM_UNATS = 1_000_000  # micro-nat quantization of per-bigram log-prob
LM_TOP_K = 50  # worst (least probable) docs reported


def bigram_lm_doc_scores(docs: DataFrame) -> DataFrame:
    """Per-document bigram-LM totals (doc_id, n_bigrams, score_unats) —
    the exact-integer core shared by bigram_lm_score (worst-k report)
    and corpus_difficulty_curriculum (decile schedule)."""
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    n = F.size(toks)
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    bg = docs.select("doc_id", F.explode(pairs).alias("bg"))
    vocab = docs.select(F.explode(toks).alias("tok")).agg(
        F.countDistinct("tok").alias("v")
    )
    cab = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("cab"))
    left = F.split(F.col("bg"), " ").getItem(0)
    ca = cab.groupBy(left.alias("lt")).agg(F.sum("cab").alias("ca"))
    lp = (
        cab.withColumn("lt", left)
        .join(ca, "lt")
        .crossJoin(F.broadcast(vocab))  # 1-row scalar broadcast
        .select(
            "bg",
            F.round(
                F.log((F.col("cab") + 1) * F.lit(1.0) / (F.col("ca") + F.col("v")))
                * LM_UNATS,
                0,
            )
            .cast("long")
            .alias("lp_unats"),
        )
    )
    return (
        bg.join(lp, "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("lp_unats").alias("score_unats"),
        )
    )




@register(
    "bigram_lm_score",
    oracle=rf"""
        WITH tok AS (
            SELECT doc_id,
                   string_split_regex(LOWER(TRIM(text)), '\s+') AS toks
            FROM documents
        ),
        bg AS (
            SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS bg
            FROM (SELECT doc_id, toks, UNNEST(range(1, len(toks))) AS i
                  FROM tok)
        ),
        cab AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS cab FROM bg GROUP BY bg),
        ca AS (
            SELECT string_split(bg, ' ')[1] AS lt,
                   CAST(SUM(cab) AS BIGINT) AS ca
            FROM cab GROUP BY 1
        ),
        v AS (
            SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v
            FROM (SELECT unnest(string_split_regex(LOWER(TRIM(text)), '\s+'))
                      AS tok
                  FROM documents)
        ),
        lp AS (
            SELECT bg,
                   CAST(ROUND(ln((cab + 1) * 1.0 / (ca + v)) * {LM_UNATS}.0)
                        AS BIGINT) AS lp_unats
            FROM cab
            JOIN ca ON string_split(cab.bg, ' ')[1] = ca.lt
            CROSS JOIN v
        )
        SELECT doc_id, n_bigrams, avg_nats
        FROM (
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                   ROUND(((CAST(SUM(lp_unats) AS BIGINT) / {LM_UNATS}.0)
                          / COUNT(*)) * 10000.0) / 10000.0 AS avg_nats
            FROM bg JOIN lp USING (bg)
            GROUP BY doc_id
        )
        ORDER BY avg_nats ASC, doc_id ASC
        LIMIT {LM_TOP_K}
    """,
    tags=("text", "quality", "lm", "perplexity", "documents"),
)

def bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Worst LM_TOP_K documents by corpus-trained bigram-LM mean log-prob.

    Reference parity: none (SURVEY.md §2.7); north-star quality-filter
    extension.
    """
    docs = load_table(spark, sf_dir, "documents", rebalance=True)
    return (
        bigram_lm_doc_scores(docs)
        .select(
            "doc_id",
            "n_bigrams",
            pround(
                (F.col("score_unats") / F.lit(float(LM_UNATS)))
                / F.col("n_bigrams"),
                4,
            ).alias("avg_nats"),
        )
        .orderBy(F.col("avg_nats").asc(), F.col("doc_id").asc())
        .limit(LM_TOP_K)
    )


# ---------------------------------------------------------------------------
# BPE APPLY — the other half of the tokenizer loop: learn the same
# BPE_MERGES merges as bpe_learn_merges, apply every one of them to the
# word-count vocabulary, and report the compression (token counts
# before/after, weighted by word frequency — exact integers). A user can
# thus train a tokenizer AND measure what it buys on the corpus in one
# engine. Scale shape identical to the learner: the vocabulary table
# (|distinct words| rows) folds per merge with the argmax pair broadcast;
# raw documents are scanned once for the word counts.
# ---------------------------------------------------------------------------
def _bpe_apply_oracle() -> str:
    def fold(pair_ref: str) -> str:
        pa = f"string_split({pair_ref}, ' ')[1]"
        pb = f"string_split({pair_ref}, ' ')[2]"
        return f"""string_split(trim(list_reduce(
            list_prepend('', toks),
            (acc, x) -> CASE
                WHEN ends_with(acc, ' ' || {pa}) AND x = {pb}
                THEN left(acc, length(acc) - length({pa}) - 1)
                     || ' ' || replace({pair_ref}, ' ', '')
                ELSE acc || ' ' || x END)), ' ')"""

    sql = r"""
        WITH words AS (
            SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM (SELECT unnest(string_split_regex(LOWER(TRIM(text)), '\s+')) AS word
                  FROM documents)
            GROUP BY word
        ),
        v0 AS (
            SELECT cnt, length(word) AS n0,
                   list_transform(generate_series(1, length(word)), i -> word[i])
                       AS toks
            FROM words
        )"""
    for s in range(1, BPE_MERGES + 1):
        sql += f""",
        p{s} AS (
            SELECT pair
            FROM (SELECT cnt,
                         unnest(list_transform(
                             generate_series(1, len(toks) - 1),
                             i -> toks[i] || ' ' || toks[i + 1])) AS pair
                  FROM v{s - 1})
            GROUP BY pair
            ORDER BY CAST(SUM(cnt) AS BIGINT) DESC, pair ASC
            LIMIT 1
        ),
        v{s} AS (
            SELECT cnt, n0,
                   CASE WHEN p.pair IS NULL OR len(toks) = 0 THEN toks
                        ELSE {fold('p.pair')} END AS toks
            FROM v{s - 1} LEFT JOIN p{s} p ON TRUE
        )"""
    sql += f"""
        SELECT COUNT(*)                              AS n_words,
               CAST(SUM(cnt * n0) AS BIGINT)         AS tokens_before,
               CAST(SUM(cnt * len(toks)) AS BIGINT)  AS tokens_after
        FROM v{BPE_MERGES}"""
    return sql


@register(
    "bpe_apply_merges",
    oracle=_bpe_apply_oracle(),
    tags=("text", "tokenizer", "iterative", "documents"),
)
def bpe_apply_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.substring(F.col("word"), i, 1),
    )
    v = (
        words.select("cnt", chars.alias("toks"))
        .withColumn("n0", F.size("toks").cast("long"))
        .localCheckpoint(eager=False)
    )
    for _step in range(1, BPE_MERGES + 1):
        t = F.col("toks")
        bigrams = F.zip_with(
            F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))),
            F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
        best = (
            v.select("cnt", F.explode(bigrams).alias("pair"))
            .groupBy("pair")
            .agg(F.sum("cnt").alias("total"))
            .orderBy(F.col("total").desc(), F.col("pair").asc())
            .limit(1)
            .localCheckpoint(eager=True)
        )
        pa = F.split(F.col("pair"), " ").getItem(0)
        pb = F.split(F.col("pair"), " ").getItem(1)
        folded = F.aggregate(
            F.col("toks"),
            F.lit(""),
            lambda acc, x: F.when(
                F.endswith(acc, F.concat(F.lit(" "), pa)) & (x == pb),
                F.concat(
                    F.substr(acc, F.lit(1), F.length(acc) - F.length(pa) - 1),
                    F.lit(" "),
                    F.replace(F.col("pair"), F.lit(" "), F.lit("")),
                ),
            ).otherwise(F.concat(acc, F.lit(" "), x)),
        )
        v = (
            # LEFT join on TRUE, not crossJoin: a corpus with no bigrams
            # yields an EMPTY argmax — the merge must be a no-op, not
            # annihilate the vocabulary.
            v.join(F.broadcast(best.select("pair")), F.lit(True), "left")
            .select(
                "cnt",
                "n0",
                F.when(
                    # empty toks would re-split to [''] after the string
                    # fold — keep them (and no-op merges) untouched
                    F.col("pair").isNull() | (F.size("toks") == 0),
                    F.col("toks"),
                ).otherwise(F.split(F.trim(folded), " ")).alias("toks"),
            )
            .localCheckpoint(eager=False)
        )
    return v.agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.col("cnt") * F.col("n0")).cast("long").alias("tokens_before"),
        F.sum(F.col("cnt") * F.size("toks")).cast("long").alias("tokens_after"),
    )


# ---------------------------------------------------------------------------
# Zipf rank-frequency slope — the corpus-law audit (natural text follows
# freq ∝ rank^-s with s ≈ 1; synthetic or boilerplate-heavy corpora bend
# the line). Token counts aggregate map-side; the top-K=100 tokens come
# back via distributed top-k (orderBy+limit → TakeOrderedAndProject, no
# global sort), then OLS runs over ≤100 (ln rank, ln freq) pairs
# quantized to integer micro-nats — the bigram-LM trick — so both
# engines sum identical BIGINTs and the slope/intercept are one fixed
# float dag. NULL slope when fewer than two distinct points.
# ---------------------------------------------------------------------------
ZIPF_TOP_K = 100


@register(
    "text_zipf_slope",
    oracle=rf"""
        WITH tok AS (
            SELECT unnest(string_split_regex(LOWER(TRIM(text)), '\s+')) AS t
            FROM documents
        ),
        cnt AS (
            SELECT t, CAST(COUNT(*) AS BIGINT) AS c
            FROM tok WHERE t <> '' GROUP BY t
        ),
        topk AS (
            SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, t) AS rnk
            FROM cnt ORDER BY c DESC, t LIMIT {ZIPF_TOP_K}
        ),
        pts AS (
            SELECT CAST(ROUND(ln(rnk) * 1000000.0) AS BIGINT) AS lx,
                   CAST(ROUND(ln(c)   * 1000000.0) AS BIGINT) AS ly
            FROM topk
        ),
        m AS (
            SELECT CAST(COUNT(*) AS BIGINT)       AS n,
                   CAST(SUM(lx) AS BIGINT)        AS sx,
                   CAST(SUM(ly) AS BIGINT)        AS sy,
                   CAST(SUM(lx * lx) AS BIGINT)   AS sxx,
                   CAST(SUM(lx * ly) AS BIGINT)   AS sxy
            FROM pts
        )
        SELECT n,
               CASE WHEN n * 1.0 * sxx - sx * 1.0 * sx <= 0 THEN NULL ELSE
                 ROUND(((n * 1.0 * sxy - sx * 1.0 * sy)
                     / (n * 1.0 * sxx - sx * 1.0 * sx)) * 1000000.0)
                 / 1000000.0 END AS zipf_slope,
               CASE WHEN n * 1.0 * sxx - sx * 1.0 * sx <= 0 THEN NULL ELSE
                 ROUND(((sy * 1.0 * sxx - sx * 1.0 * sxy)
                     / (n * 1.0 * sxx - sx * 1.0 * sx) / 1000000.0)
                     * 1000000.0) / 1000000.0 END AS zipf_intercept_nats
        FROM m
    """,
    tags=("text", "zipf", "stats", "documents"),
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cnt = (
        docs.select(
            F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("t")
        )
        .filter(F.col("t") != "")
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    from pyspark.sql import Window

    topk = cnt.orderBy(F.col("c").desc(), F.col("t")).limit(ZIPF_TOP_K)
    ranked = topk.withColumn(
        "rnk",
        F.row_number().over(Window.orderBy(F.col("c").desc(), F.col("t"))),
    )  # <=100 rows: constant-size window by construction
    pts = ranked.select(
        F.round(F.log("rnk") * 1e6, 0).cast("long").alias("lx"),
        F.round(F.log("c") * 1e6, 0).cast("long").alias("ly"),
    )
    m = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
    )
    den = F.col("n") * F.lit(1.0) * F.col("sxx") - F.col("sx") * F.lit(1.0) * F.col("sx")
    slope = (
        F.col("n") * F.lit(1.0) * F.col("sxy") - F.col("sx") * F.lit(1.0) * F.col("sy")
    ) / den
    intercept = (
        (F.col("sy") * F.lit(1.0) * F.col("sxx") - F.col("sx") * F.lit(1.0) * F.col("sxy"))
        / den
        / F.lit(1e6)
    )
    null_d = F.lit(None).cast("double")
    return m.select(
        "n",
        F.when(den <= 0, null_d).otherwise(pround(slope, 6)).alias("zipf_slope"),
        F.when(den <= 0, null_d)
        .otherwise(pround(intercept, 6))
        .alias("zipf_intercept_nats"),
    )


# ---------------------------------------------------------------------------
# VOCABULARY COVERAGE / OOV RATE — the tokenizer-sizing question every
# training corpus answers before committing to a vocab: what fraction of
# token OCCURRENCES does a top-K per-language vocabulary cover, and what
# hits OOV? Whitespace-lowercase tokens (the module's canonical split),
# per-language frequency ranking with a (count DESC, token ASC) total
# order so the top-K cut is deterministic in both engines, coverage in
# integer basis points (exact // arithmetic, no float drift).
#
# Scale shape: one shuffle to count (lang, token); the ranking window
# partitions by lang over the already-aggregated type counts (vocab-sized,
# not corpus-sized rows); totals broadcast back. At 100 TB the heavy
# explode+count is map-side partial-agg'd like every other text op here.
# ---------------------------------------------------------------------------
VOCAB_TOP_K = 200


@register(
    "text_vocab_coverage",
    oracle=f"""
        WITH toks AS (
            SELECT lang, UNNEST(string_split_regex(LOWER(TRIM(text)), '\\s+'))
                       AS token
            FROM documents
        ),
        counts AS (
            SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS c
            FROM toks GROUP BY 1, 2
        ),
        ranked AS (
            SELECT lang, token, c,
                   ROW_NUMBER() OVER (PARTITION BY lang
                                      ORDER BY c DESC, token ASC) AS rnk
            FROM counts
        )
        SELECT lang,
               CAST(SUM(c) AS BIGINT)                          AS n_tokens,
               CAST(COUNT(*) AS BIGINT)                        AS n_types,
               CAST(SUM(CASE WHEN rnk <= {VOCAB_TOP_K} THEN c ELSE 0 END)
                    * 10000 // SUM(c) AS BIGINT)               AS coverage_bp,
               CAST(10000 - SUM(CASE WHEN rnk <= {VOCAB_TOP_K} THEN c ELSE 0 END)
                    * 10000 // SUM(c) AS BIGINT)               AS oov_bp
        FROM ranked
        GROUP BY lang
    """,
    tags=("llm-pipeline", "text", "tokenizer", "vocab", "documents"),
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(
            "lang",
            F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
                "token"
            ),
        )
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    ranked = counts.withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("lang").orderBy(F.col("c").desc(), F.col("token").asc())
        ),
    )
    covered = F.sum(F.when(F.col("rnk") <= VOCAB_TOP_K, F.col("c")).otherwise(0))
    return ranked.groupBy("lang").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        idiv(covered * 10000, F.sum("c")).cast("long").alias("coverage_bp"),
        (10000 - idiv(covered * 10000, F.sum("c"))).cast("long").alias("oov_bp"),
    )


# ---------------------------------------------------------------------------
# RAKE keyword extraction (Rapid Automatic Keyword Extraction) — candidate
# phrases are maximal stopword-free runs; a word's score is degree/freq
# (degree = total length of phrases containing it), a phrase's score the
# sum of its words' scores. Scores are exact integer micro-units
# (idiv — engine-portable, no float division), so the top-25 is
# hash-checkable.
#
# Scale shape (100 TB): phrase extraction is a narrow stateless map;
# word stats are a map-side-partial groupBy over the vocabulary; the
# phrase table re-derives its word list by splitting the normalized
# phrase string (functional — avoids carrying arrays through the
# shuffle); final top-25 is TakeOrderedAndProject.
# ---------------------------------------------------------------------------
RAKE_SPLIT = r"(\b(?:a|the|and|of|to|is)\b|[^a-z ])+"
RAKE_MAX_WORDS = 4
RAKE_TOP = 25


@register(
    "text_rake_keywords",
    oracle=f"""
        WITH phr0 AS (
            SELECT unnest(string_split_regex(LOWER(text),
                '(\\b(?:a|the|and|of|to|is)\\b|[^a-z ])+')) AS p
            FROM documents
        ),
        pw AS (
            SELECT array_to_string(string_split_regex(trim(p), '\\s+'), ' ')
                       AS phrase,
                   string_split_regex(trim(p), '\\s+') AS ws
            FROM phr0
            WHERE trim(p) <> ''
              AND len(string_split_regex(trim(p), '\\s+'))
                  BETWEEN 1 AND {RAKE_MAX_WORDS}
        ),
        wstats AS (
            SELECT w, CAST(COUNT(*) AS BIGINT) AS freq,
                   CAST(SUM(n) AS BIGINT) AS degree
            FROM (SELECT unnest(ws) AS w, len(ws) AS n FROM pw)
            GROUP BY w
        ),
        wscore AS (
            SELECT w, (degree * 1000000) // freq AS score_micro FROM wstats
        ),
        pgrp AS (
            SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occurrences
            FROM pw GROUP BY phrase
        ),
        pscore AS (
            SELECT phrase, n_occurrences,
                   CAST(SUM(score_micro) AS BIGINT) AS rake_score_micro
            FROM (SELECT phrase, n_occurrences,
                         unnest(string_split(phrase, ' ')) AS w
                  FROM pgrp)
            JOIN wscore USING (w)
            GROUP BY phrase, n_occurrences
        )
        SELECT phrase, n_occurrences, rake_score_micro
        FROM pscore
        ORDER BY rake_score_micro DESC, phrase ASC
        LIMIT {RAKE_TOP}
    """,
    tags=("text", "keywords", "rake", "documents"),
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pieces = docs.select(
        F.explode(F.split(F.lower("text"), RAKE_SPLIT, -1)).alias("p")
    ).filter(F.trim("p") != "")
    pw = pieces.select(
        F.split(F.trim("p"), r"\s+").alias("ws")
    ).filter(F.size("ws").between(1, RAKE_MAX_WORDS)).select(
        F.concat_ws(" ", "ws").alias("phrase"), "ws"
    )
    wstats = (
        pw.select(F.explode("ws").alias("w"), F.size("ws").alias("n"))
        .groupBy("w")
        .agg(
            F.count(F.lit(1)).cast("long").alias("freq"),
            F.sum("n").cast("long").alias("degree"),
        )
    )
    wscore = wstats.select(
        "w", idiv(F.col("degree") * 1000000, F.col("freq")).alias("score_micro")
    )
    pgrp = pw.groupBy("phrase").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences")
    )
    pscore = (
        pgrp.select(
            "phrase",
            "n_occurrences",
            F.explode(F.split("phrase", " ")).alias("w"),
        )
        .join(wscore, "w")
        .groupBy("phrase", "n_occurrences")
        .agg(F.sum("score_micro").cast("long").alias("rake_score_micro"))
    )
    return pscore.orderBy(
        F.col("rake_score_micro").desc(), F.col("phrase").asc()
    ).limit(RAKE_TOP)


# ---------------------------------------------------------------------------
# Window-2 PMI collocations — pointwise mutual information over token
# pairs within a ±2 window (one step beyond text_top_bigrams' adjacency).
# Pairs are generated IN-ARRAY (equal-length slice zips — no positional
# self-join of the token table), normalized to unordered (least,
# greatest) form; PMI is quantized to integer micro-nats via the same
# ln-portability established by the bigram LM and Zipf queries. All
# ratio arithmetic stays in doubles (never cab·T², which would lose
# integer exactness past 2^53 at corpus scale).
# Scale shape: token and pair counts are map-side-partial groupBys over
# the vocabulary; the count joins key on words (vocabulary-sized); the
# final top-30 is TakeOrderedAndProject.
# ---------------------------------------------------------------------------
PMI_MIN_PAIR = 5
PMI_TOP = 30


@register(
    "text_word_pmi",
    oracle=f"""
        WITH toks AS (
            SELECT string_split_regex(trim(text), '\\s+') AS ws
            FROM documents
            WHERE len(string_split_regex(trim(text), '\\s+')) >= 3
        ),
        tok AS (SELECT unnest(ws) AS w FROM toks),
        wc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY w),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM tok),
        rawp AS (
            SELECT unnest(list_concat(
                       list_zip(ws[1:len(ws) - 1], ws[2:len(ws)]),
                       list_zip(ws[1:len(ws) - 2], ws[3:len(ws)]))) AS p
            FROM toks
        ),
        pairs AS (
            SELECT CASE WHEN p[1] <= p[2] THEN p[1] ELSE p[2] END AS w1,
                   CASE WHEN p[1] <= p[2] THEN p[2] ELSE p[1] END AS w2
            FROM rawp
        ),
        pc AS (
            SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cab
            FROM pairs GROUP BY 1, 2
            HAVING COUNT(*) >= {PMI_MIN_PAIR}
        ),
        ptot AS (SELECT CAST(COUNT(*) AS BIGINT) AS p FROM pairs)
        SELECT pc.w1, pc.w2, pc.cab,
               CAST(ROUND(ln((pc.cab * 1.0 / ptot.p)
                             / ((ca.c * 1.0 / tot.t) * (cb.c * 1.0 / tot.t)))
                          * 1000000.0) AS BIGINT) AS pmi_unats
        FROM pc
        JOIN wc ca ON ca.w = pc.w1
        JOIN wc cb ON cb.w = pc.w2, ptot, tot
        ORDER BY pmi_unats DESC, w1 ASC, w2 ASC
        LIMIT {PMI_TOP}
    """,
    tags=("text", "pmi", "collocation", "documents"),
)
def text_word_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.split(F.trim("text"), r"\s+").alias("ws")
    ).filter(F.size("ws") >= 3)
    tok = toks.select(F.explode("ws").alias("w"))
    wc = tok.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = tok.agg(F.count(F.lit(1)).cast("long").alias("t"))

    def zip_d(d: int):
        return F.zip_with(
            F.expr(f"slice(ws, 1, size(ws) - {d})"),
            F.expr(f"slice(ws, {d + 1}, size(ws) - {d})"),
            lambda x, y: F.struct(
                F.least(x, y).alias("w1"), F.greatest(x, y).alias("w2")
            ),
        )

    pairs = toks.select(
        F.explode(F.concat(zip_d(1), zip_d(2))).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    pc = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("cab"))
        .filter(F.col("cab") >= PMI_MIN_PAIR)
    )
    ptot = pairs.agg(F.count(F.lit(1)).cast("long").alias("p"))
    pmi = F.round(
        F.log(
            (F.col("cab") * F.lit(1.0) / F.col("p"))
            / (
                (F.col("ca") * F.lit(1.0) / F.col("t"))
                * (F.col("cb") * F.lit(1.0) / F.col("t"))
            )
        )
        * 1000000.0,
        0,
    ).cast("long")
    return (
        pc.join(wc.select(F.col("w").alias("w1"), F.col("c").alias("ca")), "w1")
        .join(wc.select(F.col("w").alias("w2"), F.col("c").alias("cb")), "w2")
        .crossJoin(F.broadcast(ptot))
        .crossJoin(F.broadcast(tot))
        .select("w1", "w2", "cab", pmi.alias("pmi_unats"))
        .orderBy(F.col("pmi_unats").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(PMI_TOP)
    )


# ---------------------------------------------------------------------------
# MLM MASKING MANIFEST — plan the BERT-style corruption pass before any
# trainer runs: per document, choose ~15% of token positions by a
# deterministic hash (md5(doc_id:pos) — no RNG, so the plan is
# reproducible across engines, reruns and restarts, and the mask can be
# re-derived downstream instead of materialized). Emits per-doc audit
# stats the pipeline asserts before spending GPU time.
# Scale shape: posexplode → hash filter → per-doc partial agg; one fact
# scan, one doc-keyed shuffle.
# ---------------------------------------------------------------------------
MLM_MASK_PCT = 15


@register(
    "mlm_masking_manifest",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
            FROM documents
        ),
        pos AS (
            -- index lambda, 1-based (DuckDB 1.0 has no WITH ORDINALITY
            -- and generate_series cannot be lateral over len(ws))
            SELECT doc_id, p.w AS w, p.i AS i
            FROM (SELECT doc_id,
                         unnest(list_transform(ws, (w, i) -> {{'w': w, 'i': i}}))
                             AS p
                  FROM toks)
        ),
        masked AS (
            SELECT doc_id, i, length(w) AS wl
            FROM pos
            WHERE ('0x' || substr(md5('mlm:' || CAST(doc_id AS VARCHAR) || ':'
                                      || CAST(i AS VARCHAR)), 1, 7))::BIGINT
                  % 100 < {MLM_MASK_PCT}
        )
        SELECT t.doc_id,
               CAST(len(t.ws) AS BIGINT) AS n_tokens,
               CAST(COALESCE(m.n_masked, 0) AS BIGINT) AS n_masked,
               (CAST(COALESCE(m.n_masked, 0) AS BIGINT) * 10000)
                   // CAST(len(t.ws) AS BIGINT) AS mask_bp,
               CAST(COALESCE(m.first_pos, 0) AS BIGINT) AS first_masked_pos,
               CAST(COALESCE(m.char_sum, 0) AS BIGINT) AS masked_char_sum
        FROM toks t
        LEFT JOIN (
            SELECT doc_id, COUNT(*) AS n_masked, MIN(i) AS first_pos,
                   SUM(wl) AS char_sum
            FROM masked GROUP BY doc_id
        ) m ON m.doc_id = t.doc_id
    """,
    tags=("llm-pipeline", "mlm", "masking", "documents"),
)
def mlm_masking_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_stream_job_spark.operators._portable import idiv

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("ws")
    )
    pos = toks.select(
        "doc_id", F.posexplode("ws").alias("pos0", "w")
    ).select("doc_id", (F.col("pos0") + 1).alias("i"), "w")
    hv = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("mlm:"),
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    F.col("i").cast("string"),
                )
            ),
            1,
            7,
        ),
        16,
        10,
    ).cast("long")
    masked = (
        pos.filter(hv % 100 < MLM_MASK_PCT)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_masked"),
            F.min("i").cast("long").alias("first_pos"),
            F.sum(F.length("w")).cast("long").alias("char_sum"),
        )
    )
    return (
        toks.select("doc_id", F.size("ws").cast("long").alias("n_tokens"))
        .join(masked, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_masked", F.lit(0).cast("long")).alias("n_masked"),
            idiv(
                F.coalesce("n_masked", F.lit(0).cast("long")) * 10000,
                F.col("n_tokens"),
            ).alias("mask_bp"),
            F.coalesce("first_pos", F.lit(0).cast("long")).alias("first_masked_pos"),
            F.coalesce("char_sum", F.lit(0).cast("long")).alias("masked_char_sum"),
        )
    )


# ---------------------------------------------------------------------------
# CURRICULUM SCHEDULE by LM difficulty — rank every document by its
# bigram-LM mean log-prob (the exact-integer per-doc totals shared with
# bigram_lm_score) and cut the corpus into 10 equal-depth difficulty
# bins: decile 1 = hardest (least probable text), decile 10 = easiest.
# This is the curriculum-learning data layout step — train loaders
# consume bins in order (or anneal a mixture over them).
#
# Scale: the global order comes from the DISTRIBUTED rank primitive
# (range exchange + local rank + broadcast offsets, _distributed.py) —
# never a single-partition ntile window; the ranking key is one double
# division of two exact integers, identical dag on both engines.
# ---------------------------------------------------------------------------
_LM_SCORE_SQL = rf"""
        tok AS (
            SELECT doc_id,
                   string_split_regex(LOWER(TRIM(text)), '\s+') AS toks
            FROM documents
        ),
        bg AS (
            SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS bg
            FROM (SELECT doc_id, toks, UNNEST(range(1, len(toks))) AS i
                  FROM tok)
        ),
        cab AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS cab FROM bg GROUP BY bg),
        ca AS (
            SELECT string_split(bg, ' ')[1] AS lt,
                   CAST(SUM(cab) AS BIGINT) AS ca
            FROM cab GROUP BY 1
        ),
        v AS (
            SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v
            FROM (SELECT unnest(string_split_regex(LOWER(TRIM(text)), '\s+'))
                      AS tok
                  FROM documents)
        ),
        lp AS (
            SELECT bg,
                   CAST(ROUND(ln((cab + 1) * 1.0 / (ca + v)) * {LM_UNATS}.0)
                        AS BIGINT) AS lp_unats
            FROM cab
            JOIN ca ON string_split(cab.bg, ' ')[1] = ca.lt
            CROSS JOIN v
        ),
        scores AS (
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                   CAST(SUM(lp_unats) AS BIGINT) AS score_unats
            FROM bg JOIN lp USING (bg)
            GROUP BY doc_id
        )
"""


@register(
    "corpus_difficulty_curriculum",
    oracle=f"""
        WITH {_LM_SCORE_SQL},
        keyed AS (
            SELECT doc_id, n_bigrams,
                   score_unats * 1.0 / n_bigrams AS avg_key
            FROM scores
        ),
        deciled AS (
            SELECT n_bigrams, avg_key,
                   ntile(10) OVER (ORDER BY avg_key ASC, doc_id ASC)
                       AS difficulty_decile
            FROM keyed
        )
        SELECT difficulty_decile,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               ROUND((MIN(avg_key)) * 1000000.0) / 1000000.0 + 0.0
                   AS hardest_avg_unats,
               ROUND((MAX(avg_key)) * 1000000.0) / 1000000.0 + 0.0
                   AS easiest_avg_unats,
               CAST(SUM(n_bigrams) AS BIGINT) AS sum_bigrams
        FROM deciled
        GROUP BY 1
    """,
    tags=("llm-pipeline", "curriculum", "lm", "documents"),
)
def corpus_difficulty_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_stream_job_spark.operators._distributed import (
        distributed_rank,
        ntile_from_rank,
    )

    docs = load_table(spark, sf_dir, "documents", rebalance=True)
    scores = bigram_lm_doc_scores(docs).select(
        "doc_id",
        "n_bigrams",
        (F.col("score_unats") * F.lit(1.0) / F.col("n_bigrams")).alias("avg_key"),
    )
    ranked = distributed_rank(scores, [F.col("avg_key"), F.col("doc_id")])
    total = scores.agg(F.count(F.lit(1)).cast("long").alias("_total"))
    return (
        ranked.crossJoin(F.broadcast(total))
        .select(
            "n_bigrams",
            "avg_key",
            ntile_from_rank(F.col("rnk"), F.col("_total"), 10).alias(
                "difficulty_decile"
            ),
        )
        .groupBy("difficulty_decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            pround(F.min("avg_key"), 6).alias("hardest_avg_unats"),
            pround(F.max("avg_key"), 6).alias("easiest_avg_unats"),
            F.sum("n_bigrams").cast("long").alias("sum_bigrams"),
        )
    )


# ---------------------------------------------------------------------------
# LOGISTIC-REGRESSION TRAINING, declaratively — 3 full-batch gradient
# steps learning P(lang='en') from two text features (stopword ratio,
# chars-per-token), the quality-classifier shape every corpus pipeline
# eventually trains. DISTRIBUTED (r8): features quantize per row to
# exact micro-units (round-to-integer is the portable round), each GD
# step is a constant-width aggregate of per-row micro-unit-quantized
# gradient terms — σ(z)−y and its two feature products, each rounded to
# 1e-6 per ROW, then summed as int64: bit-identical under ANY
# partial-aggregation merge order, so the corpus never folds into a
# single row (the old collect_list fold was this registry's last
# 100 TB scale-killer — a data-sized array in one executor). Weight
# updates divide the exact integer sums back to doubles; σ uses exp()
# (driver-proven portable here; the micro-unit quantization additionally
# absorbs sub-5e-7 libm drift, with the documented 1-ulp .5-boundary
# caveat of the NB/DSIR/KN integerizations). Gradient-sum headroom:
# |term| ≤ ~5e7 micro-units/row → int64-exact to ~1.8e11 docs; ANSI
# raises loudly past that, never silent.
# ---------------------------------------------------------------------------
LOGREG_ITERS = 3
LOGREG_LR = 2.0


def _logreg_feature_sql() -> str:
    # per-row micro-unit feature quantization: round-to-integer is the
    # portable round (see operators/_portable.py); f_u/1e6 reconstructs
    # the identical double on both engines.
    return r"""
        feats AS (
            SELECT source,
                   CASE WHEN lang = 'en' THEN CAST(1 AS BIGINT)
                        ELSE CAST(0 AS BIGINT) END AS y,
                   CAST(ROUND(1000000.0 *
                       (len(regexp_extract_all(text, '\b(a|the|and|of|to|is)\b'))
                        * 1.0
                        / len(string_split_regex(trim(text), '\s+'))))
                       AS BIGINT) AS f1_u,
                   CAST(ROUND(1000000.0 *
                       (length(text) * 1.0
                        / len(string_split_regex(trim(text), '\s+'))))
                       AS BIGINT) AS f2_u
            FROM documents
        )"""


def _logreg_sigma_sql(w: str) -> str:
    """σ(z) per row against the 1-row weight relation ``w`` — keep
    term-for-term identical to the Spark expression."""
    return (
        f"1.0 / (1.0 + exp(-({w}.w0 + {w}.w1 * (f1_u / 1000000.0)"
        f" + {w}.w2 * (f2_u / 1000000.0))))"
    )


def _logreg_w_chain_sql() -> str:
    """The w0→(g,w)*ITERS CTE chain (everything after ``feats``) in
    ENGINE-SHARED SQL: the DuckDB oracle embeds it below, and the Spark
    side executes the VERY SAME text via one parameterized ``spark.sql``
    (``_logreg_fit``) — one py4j round trip instead of per-iteration
    Column assembly (~1.5k round trips, ~0.5 s of driver chatter at any
    scale; guide §1/§7.3: plan-build time is driver-side single-process
    work). Every expression is in the portable subset both engines parse
    identically: CAST/ROUND-to-integer/exp/comma-join of a 1-row
    relation."""
    sql = """
        w0 AS (SELECT CAST(0 AS DOUBLE) AS w0, CAST(0 AS DOUBLE) AS w1,
                      CAST(0 AS DOUBLE) AS w2)"""
    for k in range(1, LOGREG_ITERS + 1):
        sig = _logreg_sigma_sql("w")
        sql += f""",
        g{k} AS (
            -- constant-width aggregate of per-row micro-unit gradient
            -- terms: order-free exact int64 sums, never a data-sized row
            SELECT CAST(SUM(CAST(ROUND(1000000.0 * (({sig}) - y)) AS BIGINT))
                       AS BIGINT) AS s0,
                   CAST(SUM(CAST(ROUND(1000000.0 * (({sig}) - y)
                                       * (f1_u / 1000000.0)) AS BIGINT))
                       AS BIGINT) AS s1,
                   CAST(SUM(CAST(ROUND(1000000.0 * (({sig}) - y)
                                       * (f2_u / 1000000.0)) AS BIGINT))
                       AS BIGINT) AS s2,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM feats, w{k - 1} w
        ),
        w{k} AS (
            SELECT w.w0 - {LOGREG_LR} * (g.s0 / 1000000.0) / g.n AS w0,
                   w.w1 - {LOGREG_LR} * (g.s1 / 1000000.0) / g.n AS w1,
                   w.w2 - {LOGREG_LR} * (g.s2 / 1000000.0) / g.n AS w2
            FROM g{k} g, w{k - 1} w
        )"""
    return sql


def _logreg_chain_sql() -> str:
    """The feats→w0→(g,w)*ITERS CTE chain through the trained weight
    relation ``w{LOGREG_ITERS}`` — shared by the training report and the
    inference op so train and apply provably use one weight definition."""
    return _logreg_feature_sql() + "," + _logreg_w_chain_sql()


def _logreg_oracle() -> str:
    sql = "WITH " + _logreg_chain_sql()
    sig = _logreg_sigma_sql("w")
    sql += f"""
        SELECT ROUND(MIN(w.w0) * 1000000.0) / 1000000.0 + 0.0 AS bias,
               ROUND(MIN(w.w1) * 1000000.0) / 1000000.0 + 0.0
                   AS w_stopword_ratio,
               ROUND(MIN(w.w2) * 1000000.0) / 1000000.0 + 0.0
                   AS w_chars_per_tok,
               CAST(SUM(CASE WHEN (({sig}) > 0.5) = (y = 1)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM feats, w{LOGREG_ITERS} w
    """
    return sql


@register(
    "quality_logreg_training",
    oracle=_logreg_oracle(),
    tags=("llm-pipeline", "ml-training", "logreg", "iterative", "documents"),
    bench_ext=True,
)
def quality_logreg_training(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = _logreg_feats(spark, sf_dir)
    w = _logreg_fit(spark, feats)
    correct = F.when(
        (_logreg_sigma() > 0.5) == (F.col("y") == 1), 1
    ).otherwise(0)
    return feats.crossJoin(F.broadcast(w)).agg(
        pround(F.min("w0"), 6).alias("bias"),
        pround(F.min("w1"), 6).alias("w_stopword_ratio"),
        pround(F.min("w2"), 6).alias("w_chars_per_tok"),
        F.sum(correct).cast("long").alias("n_correct"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )


def _logreg_feats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, y, f1_u, f2_u) — per-row micro-unit feature quantization
    (round-to-integer = the portable round); the corpus stays distributed —
    localCheckpoint pins the ONE data-sized stage so the GD passes +
    report passes re-read it instead of re-tokenizing."""
    docs = load_table(spark, sf_dir, "documents", rebalance=True)
    toks = F.split(F.trim("text"), r"\s+")
    return docs.select(
        "source",
        F.when(F.col("lang") == "en", 1).otherwise(0).cast("long").alias("y"),
        F.round(
            F.lit(1e6)
            * (
                F.regexp_count("text", F.lit(r"\b(a|the|and|of|to|is)\b"))
                * F.lit(1.0)
                / F.size(toks)
            ),
            0,
        )
        .cast("long")
        .alias("f1_u"),
        F.round(
            F.lit(1e6) * (F.length("text") * F.lit(1.0) / F.size(toks)), 0
        )
        .cast("long")
        .alias("f2_u"),
    ).localCheckpoint(eager=False)


def _logreg_sigma() -> "F.Column":
    """σ(z) per row against the cross-joined weight columns — keep
    term-for-term identical to ``_logreg_sigma_sql``."""
    z = (
        F.col("w0")
        + F.col("w1") * (F.col("f1_u") / F.lit(1e6))
        + F.col("w2") * (F.col("f2_u") / F.lit(1e6))
    )
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def _logreg_fit(spark: SparkSession, feats: DataFrame) -> DataFrame:
    """LOGREG_ITERS full-batch GD steps; returns the 1-row weight
    DataFrame. Each step is a constant-width aggregate of per-row
    micro-unit gradient terms: exact int64 sums, order-free under any
    partial merge — never a data-sized single-row fold.

    Executed as ONE parameterized ``spark.sql`` over the SAME CTE text
    the DuckDB oracle embeds (``_logreg_w_chain_sql``): the former
    per-iteration crossJoin/agg Column assembly paid ~1.5k py4j round
    trips of driver time per call (r13 profile: the whole build was
    socket chatter, not executor work). Arithmetic is unchanged — the
    SQL is the Column math's portable twin, term for term, and Spark
    compiles the identical plan (1-row broadcast per GD step).
    """
    return spark.sql(
        "WITH feats AS (SELECT * FROM {feats}),"
        + _logreg_w_chain_sql()
        + f" SELECT * FROM w{LOGREG_ITERS}",
        feats=feats,
    )


# ---------------------------------------------------------------------------
# QUALITY-CLASSIFIER INFERENCE — closes the train→apply loop: the SAME
# weight definition quality_logreg_training learns (shared CTE chain /
# shared _logreg_fit) scores every document at scan time, reported as a
# per-source decile histogram of P(en) with the gold-label count per
# cell — the table a curation pipeline thresholds to pick its keep-rate.
# Scale shape: one broadcast of the 1-row weight relation against the
# distributed feature scan; the histogram is a (source × 10)-key hash
# aggregate with map-side partials.
# ---------------------------------------------------------------------------
#: Shared by the batch inference op and its streaming monitor twin
#: (streaming_quality_monitor): same weight chain, same decile histogram.
_LOGREG_INFER_ORACLE_SQL = "WITH " + _logreg_chain_sql() + f"""
        SELECT f.source,
               least(CAST(floor(({_logreg_sigma_sql("w")}) * 10.0) AS BIGINT),
                     9) AS p_decile,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(f.y) AS BIGINT) AS n_en_gold
        FROM feats f, w{LOGREG_ITERS} w
        GROUP BY 1, 2
    """


@register(
    "quality_logreg_inference",
    oracle=_LOGREG_INFER_ORACLE_SQL,
    tags=("llm-pipeline", "ml-inference", "logreg", "documents"),
)
def quality_logreg_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = _logreg_feats(spark, sf_dir)
    w = _logreg_fit(spark, feats)
    decile = F.least(
        F.floor(_logreg_sigma() * 10.0).cast("long"), F.lit(9).cast("long")
    )
    return (
        feats.crossJoin(F.broadcast(w))
        .groupBy("source", decile.alias("p_decile"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("y").cast("long").alias("n_en_gold"),
        )
    )


# ---------------------------------------------------------------------------
# RAG CONTEXT PACKING — the retrieval-side assembly step: rank documents
# by BM25 (the shared scored-CTE definition, so the score dag stays ONE
# definition with text_bm25_search / hybrid RRF), then greedily pack the
# context window until the token budget is spent. Greedy-by-rank is the
# deterministic standard; the budget check is cumulative tokens BEFORE
# adding each doc, so the first over-budget doc is excluded.
# Scale: candidates pre-prune to the top RAG_CANDIDATES by
# TakeOrderedAndProject; the running token sum is a window over that
# bounded candidate list only — never a global-order pass over the
# corpus.
# ---------------------------------------------------------------------------
RAG_TOKEN_BUDGET = 1000
RAG_CANDIDATES = 50


@register(
    "rag_context_pack",
    oracle=f"""
        WITH SCORED_PLACEHOLDER,
        cand AS (
            SELECT b.doc_id, b.bm25_r, t.dl
            FROM bm_scored b JOIN t USING (doc_id)
            WHERE b.bm25_r > 0
            ORDER BY b.bm25_r DESC, b.doc_id ASC
            LIMIT {RAG_CANDIDATES}
        ),
        packed AS (
            SELECT doc_id, bm25_r, dl,
                   CAST(ROW_NUMBER() OVER w AS BIGINT) AS rank,
                   CAST(SUM(dl) OVER (w ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       AS cum_tokens
            FROM cand
            WINDOW w AS (ORDER BY bm25_r DESC, doc_id ASC)
        )
        SELECT rank, doc_id, CAST(dl AS BIGINT) AS n_tokens, bm25_r, cum_tokens
        FROM packed
        WHERE cum_tokens - dl < {RAG_TOKEN_BUDGET}
    """.replace("SCORED_PLACEHOLDER", bm25_scored_ctes()),
    tags=("llm-pipeline", "rag", "retrieval", "bm25", "documents"),
)
def rag_context_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    dl = docs.select(
        "doc_id", F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("dl")
    )
    cand = (
        bm25_scores(spark, sf_dir)
        .join(dl, "doc_id")
        .filter(F.col("bm25_r") > 0)
        .orderBy(F.col("bm25_r").desc(), F.col("doc_id").asc())
        .limit(RAG_CANDIDATES)
    )
    w = Window.orderBy(F.col("bm25_r").desc(), F.col("doc_id").asc())
    packed = cand.select(
        "doc_id",
        "bm25_r",
        "dl",
        F.row_number().over(w).cast("long").alias("rank"),
        F.sum("dl")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("cum_tokens"),
    )
    return packed.filter(
        F.col("cum_tokens") - F.col("dl") < RAG_TOKEN_BUDGET
    ).select(
        "rank",
        "doc_id",
        F.col("dl").alias("n_tokens"),
        "bm25_r",
        "cum_tokens",
    )


# ---------------------------------------------------------------------------
# SKIP-GRAM TRAINING PAIRS WITH NEGATIVE SAMPLING — the word2vec data
# build: (center, context) pairs from a ±2 window, a deterministic 5%
# pair-type sample, and for each kept pair K_NEG negatives drawn from
# the classic unigram^{3/4} table. Everything that is usually "random"
# is hash-derived: the sample gate and each negative's draw position are
# md5 integers, and the ¾-power weight is written as exp(0.75·ln(c)) —
# the explicit dag both engines' libm agree on (ln/exp portability
# proven by the LM and logreg queries). The negative table is the top
# NEG_VOCAB words (count desc, word asc — deterministic truncation, the
# standard practice), with integer cumulative ranges; a draw is a range
# probe against that broadcast table.
# Scale: pair extraction is in-array; pair-type counts are map-side
# partial; the negative join is a BNLJ against a 64-row broadcast.
# ---------------------------------------------------------------------------
SG_SAMPLE_MOD = 20  # keep pair types where hash % 20 == 0 (5%)
SG_K_NEG = 2
SG_NEG_VOCAB = 64


@register(
    "skipgram_negative_samples",
    oracle=f"""
        WITH toks AS (
            SELECT string_split_regex(trim(text), '\\s+') AS ws
            FROM documents
            WHERE len(string_split_regex(trim(text), '\\s+')) >= 3
        ),
        rawp AS (
            SELECT unnest(list_concat(
                       list_zip(ws[1:len(ws) - 1], ws[2:len(ws)]),
                       list_zip(ws[1:len(ws) - 2], ws[3:len(ws)]))) AS p
            FROM toks
        ),
        pairs AS (
            SELECT p[1] AS center, p[2] AS context FROM rawp
            UNION ALL
            SELECT p[2] AS center, p[1] AS context FROM rawp
        ),
        pc AS (
            SELECT center, context, CAST(COUNT(*) AS BIGINT) AS n_occ
            FROM pairs GROUP BY 1, 2
        ),
        sampled AS (
            SELECT * FROM pc
            WHERE ('0x' || substr(md5('sg:' || center || ':' || context), 1, 7))::BIGINT
                  % {SG_SAMPLE_MOD} = 0
        ),
        vocab AS (
            SELECT w, c FROM (
                SELECT w, CAST(COUNT(*) AS BIGINT) AS c
                FROM (SELECT unnest(ws) AS w FROM toks)
                GROUP BY w
            ) ORDER BY c DESC, w ASC LIMIT {SG_NEG_VOCAB}
        ),
        wt AS (
            SELECT w, CAST(ROUND(exp(0.75 * ln(c * 1.0)) * 1000.0) AS BIGINT)
                       AS wgt
            FROM vocab
        ),
        ranges AS (
            SELECT w, wgt,
                   CAST(SUM(wgt) OVER (ORDER BY w ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) - wgt AS lo,
                   CAST(SUM(wgt) OVER (ORDER BY w ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) AS hi
            FROM wt
        ),
        tot AS (SELECT CAST(SUM(wgt) AS BIGINT) AS t FROM wt),
        draws AS (
            SELECT s.center, s.context, s.n_occ, k.k,
                   ('0x' || substr(md5('neg:' || s.center || ':' || s.context
                                       || ':' || CAST(k.k AS VARCHAR)), 1, 12))::BIGINT
                       % tot.t AS pos
            FROM sampled s, (SELECT unnest(range(1, {SG_K_NEG} + 1)) AS k) k,
                 tot
        )
        SELECT d.center, d.context, d.n_occ, CAST(d.k AS BIGINT) AS k,
               r.w AS negative
        FROM draws d JOIN ranges r ON d.pos >= r.lo AND d.pos < r.hi
    """,
    tags=("llm-pipeline", "word2vec", "negative-sampling", "documents"),
)
def skipgram_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.split(F.trim("text"), r"\s+").alias("ws")
    ).filter(F.size("ws") >= 3)

    def zip_d(d: int):
        return F.zip_with(
            F.expr(f"slice(ws, 1, size(ws) - {d})"),
            F.expr(f"slice(ws, {d + 1}, size(ws) - {d})"),
            lambda x, y: F.struct(x.alias("a"), y.alias("b")),
        )

    rawp = toks.select(
        F.explode(F.concat(zip_d(1), zip_d(2))).alias("p")
    ).localCheckpoint(eager=False)  # both directions read the same pairs
    pairs = rawp.select(
        F.col("p.a").alias("center"), F.col("p.b").alias("context")
    ).unionByName(
        rawp.select(F.col("p.b").alias("center"), F.col("p.a").alias("context"))
    )
    pc = pairs.groupBy("center", "context").agg(
        F.count(F.lit(1)).cast("long").alias("n_occ")
    )
    gate = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("sg:"), F.col("center"), F.lit(":"), F.col("context")
                    )
                ),
                1,
                7,
            ),
            16,
            10,
        ).cast("long")
        % SG_SAMPLE_MOD
    )
    sampled = pc.filter(gate == 0)
    vocab = (
        toks.select(F.explode("ws").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .orderBy(F.col("c").desc(), F.col("w").asc())
        .limit(SG_NEG_VOCAB)
    )
    wt = vocab.select(
        "w",
        F.round(F.exp(F.lit(0.75) * F.log(F.col("c") * F.lit(1.0))) * 1000.0, 0)
        .cast("long")
        .alias("wgt"),
    )
    wr = Window.orderBy("w").rowsBetween(Window.unboundedPreceding, 0)
    ranges = wt.select(
        "w",
        "wgt",
        (F.sum("wgt").over(wr).cast("long") - F.col("wgt")).alias("lo"),
        F.sum("wgt").over(wr).cast("long").alias("hi"),
    )
    tot = wt.agg(F.sum("wgt").cast("long").alias("t"))
    ks = spark.range(1, SG_K_NEG + 1).select(F.col("id").cast("int").alias("k"))
    pos = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("neg:"),
                        F.col("center"),
                        F.lit(":"),
                        F.col("context"),
                        F.lit(":"),
                        F.col("k").cast("string"),
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("long")
        % F.col("t")
    )
    draws = (
        sampled.crossJoin(F.broadcast(ks))
        .crossJoin(F.broadcast(tot))
        .select("center", "context", "n_occ", "k", pos.alias("pos"))
    )
    return draws.join(
        F.broadcast(ranges),
        (F.col("pos") >= F.col("lo")) & (F.col("pos") < F.col("hi")),
    ).select(
        "center",
        "context",
        "n_occ",
        F.col("k").cast("long").alias("k"),
        F.col("w").alias("negative"),
    )


# ---------------------------------------------------------------------------
# LEXICON SENTIMENT — the Spark-scale lexicon scoring pipeline of
# "Large Scale Sentiment Analysis on Twitter with Spark" (EDBT 2016,
# PAPERS.md): token-match a signed lexicon, sum per document, report the
# per-language polarity profile and the most polarized docs. Scores are
# exact integers (lexicon weights × counts); the lexicon is a
# compile-time literal map, so scoring is a narrow codegen map with a
# map-side-partial rollup — the shape that scaled to the paper's corpus.
# ---------------------------------------------------------------------------
SENTIMENT_LEXICON = {"fast": 2, "big": 1, "small": -1, "slow": -2}


def _sentiment_score_sql() -> str:
    bs = chr(92)  # backslash (f-string expressions cannot contain one)
    return " + ".join(
        f"len(regexp_extract_all(text, '{bs}b{w}{bs}b')) * ({v})"
        for w, v in sorted(SENTIMENT_LEXICON.items())
    )


@register(
    "text_sentiment_lexicon",
    oracle=f"""
        WITH scored AS (
            SELECT doc_id, lang,
                   {_sentiment_score_sql()} AS score
            FROM documents
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(score) AS BIGINT) AS total_score,
               CAST(SUM(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_positive,
               CAST(SUM(CASE WHEN score < 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_negative,
               CAST(MAX(score) AS BIGINT) AS max_score,
               CAST(MIN(score) AS BIGINT) AS min_score
        FROM scored
        GROUP BY lang
    """,
    tags=("text", "sentiment", "paper", "documents"),
)
def text_sentiment_lexicon(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    score = None
    for w, v in sorted(SENTIMENT_LEXICON.items()):
        term = F.regexp_count("text", F.lit(rf"\b{w}\b")) * F.lit(v)
        score = term if score is None else score + term
    scored = docs.select("doc_id", "lang", score.cast("long").alias("score"))
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("score").cast("long").alias("total_score"),
        F.sum(F.when(F.col("score") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_positive"),
        F.sum(F.when(F.col("score") < 0, 1).otherwise(0))
        .cast("long")
        .alias("n_negative"),
        F.max("score").cast("long").alias("max_score"),
        F.min("score").cast("long").alias("min_score"),
    )


# ---------------------------------------------------------------------------
# Tokenizer FERTILITY by language — tokens-per-word, the metric that
# decides per-language token budgets in a multilingual mixture (a
# language whose fertility is 2× pays 2× the context length for the
# same text; mixture weights and seq-len planning must know it).
# Tokenization is the same BPE-ish regex family as
# text_bpe_token_count; words are whitespace runs. Ratios are emitted
# as exact integer basis points (idiv) — no float division, so the
# row hashes are stable. One vocabulary-keyed aggregation: per-doc
# regexp counts are JVM-side codegen, the shuffle carries one row per
# language.
# ---------------------------------------------------------------------------
#: Shared by the batch op and its streaming twin
#: (streaming_fertility_drift): the streaming state is the same exact
#: integer sufficient statistics, so both gates run one oracle.
_FERTILITY_ORACLE_SQL = r"""
        WITH per_doc AS (
            SELECT lang,
                   CAST(regexp_extract_all(text, '[A-Za-z]+').len()
                        + regexp_extract_all(text, '[0-9]').len()
                        + regexp_extract_all(text, '[^A-Za-z0-9 ]').len()
                        AS BIGINT) AS n_tokens,
                   CAST(regexp_extract_all(trim(text), '[^ ]+').len()
                        AS BIGINT) AS n_words,
                   CAST(length(text) AS BIGINT) AS n_chars
            FROM documents
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT)      AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST(SUM(n_words) AS BIGINT)  AS total_words,
               CAST(SUM(n_tokens) * 10000 // SUM(n_words) AS BIGINT)
                   AS fertility_bp,
               CAST(SUM(n_chars) * 10000 // SUM(n_tokens) AS BIGINT)
                   AS chars_per_token_bp
        FROM per_doc
        GROUP BY lang
"""


@register(
    "bpe_fertility_by_lang",
    oracle=_FERTILITY_ORACLE_SQL,
    tags=("text", "tokenizer", "llm-pipeline", "documents"),
)
def bpe_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = (
        F.regexp_count("text", F.lit(r"[A-Za-z]+"))
        + F.regexp_count("text", F.lit(r"[0-9]"))
        + F.regexp_count("text", F.lit(r"[^A-Za-z0-9 ]"))
    ).cast("long")
    n_words = F.regexp_count(F.trim(F.col("text")), F.lit(r"[^ ]+")).cast("long")
    per_doc = docs.select(
        "lang",
        n_tokens.alias("n_tokens"),
        n_words.alias("n_words"),
        F.length("text").cast("long").alias("n_chars"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum("n_words").cast("long").alias("total_words"),
        idiv(F.sum("n_tokens") * 10000, F.sum("n_words")).alias("fertility_bp"),
        idiv(F.sum("n_chars") * 10000, F.sum("n_tokens")).alias(
            "chars_per_token_bp"
        ),
    )


# ---------------------------------------------------------------------------
# PHRASE-BLOCKLIST FILTER — the safety/compliance gate every corpus
# pipeline runs before training: match documents against a curated
# phrase list and report, per phrase, how many documents it flags and
# how often it occurs (the numbers that decide whether a phrase is a
# surgical filter or a corpus-killer). Matching is token-boundary-exact
# (padded-space needle over the shared normalizer), not substring —
# 'art' must not flag 'part'. Occurrences per doc are counted with the
# portable length-difference identity, all integer.
# Scale shape: the blocklist is a broadcast literal (curated lists are
# thousands of rows, never data-sized) nested-loop-joined against the
# corpus — one corpus scan for the whole list — then a phrase-keyed
# bounded aggregate. For 100k+ phrase lists the same query swaps the
# LIKE for an Aho-Corasick mapInPandas seam; the report contract stays.
# Reference parity: none (SURVEY.md §2.7) — north-star text extension.
# ---------------------------------------------------------------------------
from kafka_stream_job_spark.operators.dedup import _NORM_SQL as _BL_NORM_SQL
from kafka_stream_job_spark.operators.dedup import _SHINGLES_SQL as _VGC_SHINGLES_SQL

_BLOCKLIST_PHRASES: tuple[str, ...] = (
    "hash join",
    "big table",
    "sort merge",
    "slow scan",
    "data loss",  # deliberately absent from the corpus: zero-hit row
)


@register(
    "blocklist_phrase_filter",
    oracle=f"""
        WITH norm AS (
            SELECT doc_id, ' ' || {_BL_NORM_SQL} || ' ' AS padded
            FROM documents
        ),
        phrases(phrase) AS (
            VALUES {', '.join(f"('{p}')" for p in _BLOCKLIST_PHRASES)}
        ),
        hits AS (
            SELECT p.phrase, n.doc_id,
                   -- matched iff at least one padded occurrence
                   LENGTH(n.padded)
                    - LENGTH(REPLACE(n.padded, ' ' || p.phrase || ' ',
                                     ' ' || p.phrase)) AS n_occ
            FROM phrases p CROSS JOIN norm n
        )
        SELECT phrase,
               CAST(SUM(CASE WHEN n_occ > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_docs_matched,
               CAST(SUM(n_occ) AS BIGINT) AS n_occurrences,
               (CAST(SUM(CASE WHEN n_occ > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   * 10000)
                   // (SELECT COUNT(*) FROM documents) AS doc_share_bp
        FROM hits
        GROUP BY phrase
    """,
    tags=("text", "safety", "blocklist", "documents"),
)
def blocklist_phrase_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_stream_job_spark.operators._portable import idiv
    from kafka_stream_job_spark.operators.dedup import _norm_text

    docs = load_table(spark, sf_dir, "documents")
    padded = F.concat(F.lit(" "), _norm_text(), F.lit(" "))
    norm = docs.select("doc_id", padded.alias("padded"))
    phrases = F.broadcast(
        jvm_values_df(
            spark, [(p,) for p in _BLOCKLIST_PHRASES], "phrase string"
        )
    )
    needle = F.concat(F.lit(" "), F.col("phrase"), F.lit(" "))
    # trailing-space-stripped replacement shortens the text by ONE space
    # per non-overlapping occurrence: exact integer occurrence count.
    shorter = F.replace(
        F.col("padded"), needle, F.concat(F.lit(" "), F.col("phrase"))
    )
    hits = norm.crossJoin(phrases).select(
        "phrase",
        (F.length("padded") - F.length(shorter)).cast("long").alias("n_occ"),
    )
    total = docs.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    return (
        hits.groupBy("phrase")
        .agg(
            F.sum((F.col("n_occ") > 0).cast("long"))
            .cast("long")
            .alias("n_docs_matched"),
            F.sum("n_occ").cast("long").alias("n_occurrences"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "phrase",
            "n_docs_matched",
            "n_occurrences",
            idiv(F.col("n_docs_matched") * 10000, F.col("n_total")).alias(
                "doc_share_bp"
            ),
        )
    )


# ---------------------------------------------------------------------------
# NAIVE BAYES LANGUAGE CLASSIFIER — the supervised counterpart to
# text_language_id's stopword heuristic: train a multinomial NB
# (add-one smoothing) on the labeled corpus and report the
# resubstitution confusion matrix. The float hazard in distributed NB is
# the per-document log-likelihood sum (summation order); here every
# log-weight is computed ONCE on the vocabulary-bounded (token, lang)
# grid, in micro-log-units, and per-document scores are EXACT integer
# dot products (occurrence count x micro-weight) — bit-identical under
# any partitioning. Argmax ties break to the alphabetically first
# language via min(struct(-score, lang)) on both engines.
#
# NO libm anywhere (r6 judge item — closes the r5 "1-ulp ln() at a .5
# boundary" window for good, the dp_noisy_nation_counts pattern): the
# micro-log ILN(m) ~= round(1e6*ln(m)) is PURE int64 arithmetic,
# identical term-for-term in both engines —
#   ILN(m) = eln(e) + round(1e6 * pade_ln(q / 2^15))
# where e = floor(log2 m) and the per-exponent constants
# (eln(e) = round(1e6*e*ln 2), range bounds, mantissa shifts) come from
# a 63-row broadcast table generated once in pure Python from the
# integer constant round(ln(2)*1e18); q = the 15-bit fixed-point
# mantissa (floor-shifted, exact); pade_ln(r) = 3(r^2-1)/(r^2+4r+1),
# the [2/2] Pade approximant of ln at r=1 (max error 8.6e-4 on [1,2)),
# evaluated as one tie-free integer division (2*num+den) // (2*den).
# Weights are ILN(c+1) - ILN(n+v); priors ILN(d_l) - ILN(n_docs).
# _iln_py below is the reference model; the Hypothesis property test
# pins both engines to it bit-for-bit.
# Scale shape: one data-sized pass for (doc, token) occurrence counts,
# one token-keyed join against the bounded densified weight grid
# (|vocab| x |langs|), a doc-keyed aggregate, and a |langs|^2 confusion
# rollup. Priors and grid are broadcast-sized; the ILN range-join is a
# 63-row broadcast nested loop.
# ---------------------------------------------------------------------------
_ILN_K = 15  # mantissa fixed-point bits
_ILN_S = 1 << _ILN_K
_ILN_S2 = _ILN_S * _ILN_S
_ILN_LN2_E18 = 693_147_180_559_945_309  # round(ln(2) * 1e18), fixed constant


def _iln_rows() -> list[tuple[int, int, int, int, int, int]]:
    """(e, lo, hi, sdiv, smul, eln) per exponent — generated in pure
    Python (arbitrary precision), consumed by both engines as literals."""
    rows = []
    for e in range(63):
        lo = 1 << e
        hi = (1 << (e + 1)) - 1 if e < 62 else (1 << 63) - 1
        sdiv = 1 << (e - _ILN_K) if e >= _ILN_K else 1
        smul = 1 << (_ILN_K - e) if e < _ILN_K else 1
        eln = (2 * e * _ILN_LN2_E18 + 10**12) // (2 * 10**12)
        rows.append((e, lo, hi, sdiv, smul, eln))
    return rows


def _iln_py(m: int) -> int:
    """Pure-Python reference model of ILN(m) ~= round(1e6 * ln(m)) —
    the Hypothesis test asserts both engines equal this exactly."""
    e = m.bit_length() - 1
    q = (m >> (e - _ILN_K)) if e >= _ILN_K else (m << (_ILN_K - e))
    num = 3_000_000 * (q * q - _ILN_S2)
    den = q * q + 4 * _ILN_S * q + _ILN_S2
    eln = (2 * e * _ILN_LN2_E18 + 10**12) // (2 * 10**12)
    return eln + (2 * num + den) // (2 * den)


def _iln_frac_sql(q: str) -> str:
    """DuckDB fragment for the mantissa part, term-for-term the same
    integer arithmetic as _iln_py / _attach_iln."""
    num = f"(3000000 * ({q} * {q} - {_ILN_S2}))"
    den = f"({q} * {q} + {4 * _ILN_S} * {q} + {_ILN_S2})"
    return f"((2 * {num} + {den}) // (2 * {den}))"


_ILN_VALUES_SQL = ", ".join(
    f"({e}, {lo}, {hi}, {sdiv}, {smul}, {eln})"
    for e, lo, hi, sdiv, smul, eln in _iln_rows()
)


def _attach_iln(spark: SparkSession, df: DataFrame, m_col: str, out_col: str) -> DataFrame:
    """Join the 63-row exponent table (broadcast) and emit ILN(m_col).

    The table is a JVM VALUES relation (jvm_values_df): as a pickled
    createDataFrame RDD, every query materializing it paid a 32-task
    Python-worker stage (~0.37 s measured) for 63 constant rows."""
    tab = F.broadcast(
        jvm_values_df(
            spark, _iln_rows(), "e long, lo long, hi long, sdiv long, smul long, eln long"
        )
    )
    q = idiv(F.col(m_col), F.col("sdiv")) * F.col("smul")
    s2 = F.lit(_ILN_S2).cast("long")
    num = F.lit(3_000_000).cast("long") * (q * q - s2)
    den = q * q + F.lit(4 * _ILN_S).cast("long") * q + s2
    frac = idiv(num * 2 + den, den * 2)
    return (
        df.join(tab, (F.col(m_col) >= tab.lo) & (F.col(m_col) <= tab.hi))
        .withColumn(out_col, F.col("eln") + frac)
        .drop("e", "lo", "hi", "sdiv", "smul", "eln")
    )
@register(
    "naive_bayes_langid",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, lang,
                   unnest(string_split({_BL_NORM_SQL}, ' ')) AS token
            FROM documents
        ),
        per_dt AS (
            SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS k
            FROM toks GROUP BY 1, 2
        ),
        counts AS (
            SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS c
            FROM toks GROUP BY 1, 2
        ),
        ntl AS (
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY 1
        ),
        vocab AS (
            SELECT CAST(COUNT(DISTINCT token) AS BIGINT) AS v FROM toks
        ),
        ilntab(e, lo, hi, sdiv, smul, eln) AS (VALUES {_ILN_VALUES_SQL}),
        nvl AS (
            SELECT x.lang,
                   t.eln + {_iln_frac_sql('((x.m // t.sdiv) * t.smul)')}
                       AS iln_nv
            FROM (SELECT lang, n + (SELECT v FROM vocab) AS m FROM ntl) x
            JOIN ilntab t ON x.m >= t.lo AND x.m <= t.hi
        ),
        gridm AS (
            SELECT t2.token, n2.lang,
                   CAST(COALESCE(c.c, 0) + 1 AS BIGINT) AS m
            FROM (SELECT DISTINCT token FROM toks) t2
            CROSS JOIN ntl n2
            LEFT JOIN counts c ON c.token = t2.token AND c.lang = n2.lang
        ),
        grid AS (
            SELECT g.token, g.lang,
                   CAST((t.eln
                         + {_iln_frac_sql('((g.m // t.sdiv) * t.smul)')})
                        - nv.iln_nv AS BIGINT) AS w
            FROM gridm g
            JOIN ilntab t ON g.m >= t.lo AND g.m <= t.hi
            JOIN nvl nv ON nv.lang = g.lang
        ),
        ndl AS (
            SELECT t.eln + {_iln_frac_sql('((x.m // t.sdiv) * t.smul)')}
                       AS iln_nd
            FROM (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM documents) x
            JOIN ilntab t ON x.m >= t.lo AND x.m <= t.hi
        ),
        priors AS (
            SELECT x.lang,
                   CAST((t.eln
                         + {_iln_frac_sql('((x.m // t.sdiv) * t.smul)')})
                        - (SELECT iln_nd FROM ndl) AS BIGINT) AS pw
            FROM (SELECT lang, CAST(COUNT(*) AS BIGINT) AS m
                  FROM documents GROUP BY 1) x
            JOIN ilntab t ON x.m >= t.lo AND x.m <= t.hi
        ),
        scored AS (
            SELECT p.doc_id, g.lang, CAST(SUM(p.k * g.w) AS BIGINT) AS s
            FROM per_dt p JOIN grid g ON g.token = p.token
            GROUP BY 1, 2
        ),
        pred AS (
            SELECT s.doc_id,
                   (MIN(struct_pack(ns := -(s.s + pr.pw), lg := s.lang))).lg
                       AS pred_lang
            FROM scored s JOIN priors pr ON pr.lang = s.lang
            GROUP BY 1
        )
        SELECT d.lang, p.pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM pred p JOIN documents d ON d.doc_id = p.doc_id
        GROUP BY 1, 2
    """,
    tags=("text", "ml", "classifier", "documents"),
)
def naive_bayes_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_stream_job_spark.operators.dedup import _norm_text

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(F.split(_norm_text(), " ")).alias("token"),
    ).localCheckpoint(eager=False)  # counts, grid, and vocab all read it
    per_dt = toks.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    counts = toks.groupBy("lang", "token").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    ntl = toks.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("n"))
    vocab = toks.agg(F.countDistinct("token").cast("long").alias("v"))
    nvl = _attach_iln(
        spark,
        ntl.crossJoin(F.broadcast(vocab)).select(
            "lang", (F.col("n") + F.col("v")).alias("m")
        ),
        "m",
        "iln_nv",
    ).select("lang", "iln_nv")
    gridm = (
        toks.select("token")
        .distinct()
        .crossJoin(F.broadcast(ntl.select("lang")))
        .join(counts, ["token", "lang"], "left")
        .select(
            "token",
            "lang",
            (F.coalesce(F.col("c"), F.lit(0)) + 1).cast("long").alias("m"),
        )
    )
    grid = (
        _attach_iln(spark, gridm, "m", "iln_c")
        .join(F.broadcast(nvl), "lang")
        .select(
            "token", "lang", (F.col("iln_c") - F.col("iln_nv")).alias("w")
        )
    )
    total = docs.agg(F.count(F.lit(1)).cast("long").alias("m"))
    ndl = _attach_iln(spark, total, "m", "iln_nd").select("iln_nd")
    priors = (
        _attach_iln(
            spark,
            docs.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("m")),
            "m",
            "iln_dl",
        )
        .crossJoin(F.broadcast(ndl))
        .select(
            "lang", (F.col("iln_dl") - F.col("iln_nd")).alias("pw")
        )
    )
    scored = (
        per_dt.join(grid, "token")
        .groupBy("doc_id", "lang")
        .agg(F.sum(F.col("k") * F.col("w")).cast("long").alias("s"))
    )
    pred = (
        scored.join(F.broadcast(priors), "lang")
        .groupBy("doc_id")
        .agg(
            F.min(
                F.struct(
                    (-(F.col("s") + F.col("pw"))).alias("ns"),
                    F.col("lang").alias("lg"),
                )
            ).alias("m")
        )
        .select("doc_id", F.col("m.lg").alias("pred_lang"))
    )
    return (
        pred.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# VOCABULARY GROWTH CURVE — Heaps'-law diagnostic for tokenizer and
# n-gram-model sizing: as the corpus accretes (doc_id order, bucketed
# into deciles), how many NEW 3-shingle types appear per decile and
# cumulatively? A flattening curve says the type inventory is
# saturating (a fixed vocab/model will hold); a linear one says
# open-vocabulary effects dominate. Types attribute to the decile of
# their FIRST occurrence (min doc_id) — the same first-occurrence
# semantics (and shared shingle CTE) as corpus_shingle_novelty.
# Cumulative counts come from a triangular join over the 10 decile
# rows — bounded, no global window.
# Scale shape: one shingle-keyed aggregate (min doc_id per type), one
# bounded decile rollup, one 10x10 broadcast triangular join.
# ---------------------------------------------------------------------------
@register(
    "vocab_growth_curve",
    oracle=f"""
        WITH shingles AS ({_VGC_SHINGLES_SQL}),
        mx AS (SELECT MAX(doc_id) AS mxd FROM documents),
        first_seen AS (
            SELECT shingle, MIN(doc_id) AS first_doc FROM shingles GROUP BY 1
        ),
        per_decile AS (
            SELECT (first_doc * 10) // ((SELECT mxd FROM mx) + 1) AS decile,
                   CAST(COUNT(*) AS BIGINT) AS new_types
            FROM first_seen GROUP BY 1
        )
        SELECT CAST(a.decile AS BIGINT) AS decile,
               a.new_types,
               CAST(SUM(b.new_types) AS BIGINT) AS cum_types
        FROM per_decile a JOIN per_decile b ON b.decile <= a.decile
        GROUP BY a.decile, a.new_types
    """,
    tags=("text", "vocabulary", "tokenizer", "documents"),
)
def vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_stream_job_spark.operators.dedup import _shingles

    docs = load_table(spark, sf_dir, "documents")
    mx = docs.agg(F.max("doc_id").alias("mxd"))
    first_seen = (
        _shingles(docs)
        .groupBy("shingle")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    per_decile = (
        first_seen.crossJoin(F.broadcast(mx))
        .groupBy(
            idiv(F.col("first_doc") * 10, F.col("mxd") + 1).alias("decile")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("new_types"))
        .localCheckpoint(eager=False)  # both sides of the triangular join
    )
    b = per_decile.select(
        F.col("decile").alias("b_decile"), F.col("new_types").alias("b_new")
    )
    return (
        per_decile.join(
            F.broadcast(b), F.col("b_decile") <= F.col("decile")
        )
        .groupBy("decile", "new_types")
        .agg(F.sum("b_new").cast("long").alias("cum_types"))
        .select(F.col("decile").cast("long").alias("decile"), "new_types", "cum_types")
    )


# ---------------------------------------------------------------------------
# GOPHER QUALITY RULES (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", Appendix A —
# the repetition/quality heuristics every web-corpus pipeline since has
# copied). Composite per-document rule filter, reported as a per-language
# funnel: how many documents fail each rule, and how many pass all of
# them. Every rule is an EXACT INTEGER comparison (ratios are cleared of
# division: mean word length in [LO, HI] becomes LO·n ≤ Σlen ≤ HI·n; a
# ≤20 % top-token share becomes 5·max_count ≤ n; a ≥50 % type-token
# ratio becomes 2·n_types ≥ n), so both engines agree bit-for-bit.
# Scale shape: explode → (doc, token) count → per-doc constant-width
# aggregate → |langs|-row rollup. Two data-sized hash shuffles with
# map-side partial aggregation, no windows, no joins.
# Reference parity: none (SURVEY.md §2.7) — north-star LLM-pipeline op.
# ---------------------------------------------------------------------------
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MEANLEN_LO = 3  # mean word length lower bound (chars)
GOPHER_MEANLEN_HI = 10  # mean word length upper bound (chars)
GOPHER_TOPTOK_DEN = 5  # top token must be ≤ 1/5 of all tokens
GOPHER_TTR_NUM = 2  # type-token ratio must be ≥ 1/2


@register(
    "gopher_quality_rules",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, lang,
                   unnest(string_split({_BL_NORM_SQL}, ' ')) AS token
            FROM documents
        ),
        per_tok AS (
            SELECT doc_id, lang, token, CAST(COUNT(*) AS BIGINT) AS c
            FROM toks GROUP BY 1, 2, 3
        ),
        per_doc AS (
            SELECT doc_id, lang,
                   CAST(SUM(c) AS BIGINT) AS n_words,
                   CAST(COUNT(*) AS BIGINT) AS n_types,
                   CAST(MAX(c) AS BIGINT) AS max_tok,
                   CAST(SUM(len(token) * c) AS BIGINT) AS sum_len
            FROM per_tok GROUP BY 1, 2
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN n_words < {GOPHER_MIN_WORDS}
                               OR n_words > {GOPHER_MAX_WORDS}
                             THEN 1 ELSE 0 END) AS BIGINT) AS fail_words,
               CAST(SUM(CASE WHEN sum_len < {GOPHER_MEANLEN_LO} * n_words
                               OR sum_len > {GOPHER_MEANLEN_HI} * n_words
                             THEN 1 ELSE 0 END) AS BIGINT) AS fail_meanlen,
               CAST(SUM(CASE WHEN max_tok * {GOPHER_TOPTOK_DEN} > n_words
                             THEN 1 ELSE 0 END) AS BIGINT) AS fail_toptok,
               CAST(SUM(CASE WHEN n_types * {GOPHER_TTR_NUM} < n_words
                             THEN 1 ELSE 0 END) AS BIGINT) AS fail_ttr,
               CAST(SUM(CASE WHEN n_words >= {GOPHER_MIN_WORDS}
                              AND n_words <= {GOPHER_MAX_WORDS}
                              AND sum_len >= {GOPHER_MEANLEN_LO} * n_words
                              AND sum_len <= {GOPHER_MEANLEN_HI} * n_words
                              AND max_tok * {GOPHER_TOPTOK_DEN} <= n_words
                              AND n_types * {GOPHER_TTR_NUM} >= n_words
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
        FROM per_doc
        GROUP BY 1
    """,
    tags=("text", "quality", "filter", "llm-pipeline", "documents"),
)
def gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_stream_job_spark.operators.dedup import _norm_text

    docs = load_table(spark, sf_dir, "documents", rebalance=True)
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(F.split(_norm_text(), " ")).alias("token"),
    )
    per_tok = toks.groupBy("doc_id", "lang", "token").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    per_doc = per_tok.groupBy("doc_id", "lang").agg(
        F.sum("c").cast("long").alias("n_words"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.max("c").cast("long").alias("max_tok"),
        F.sum(F.length("token") * F.col("c")).cast("long").alias("sum_len"),
    )
    fail_words = (F.col("n_words") < GOPHER_MIN_WORDS) | (
        F.col("n_words") > GOPHER_MAX_WORDS
    )
    fail_meanlen = (
        F.col("sum_len") < GOPHER_MEANLEN_LO * F.col("n_words")
    ) | (F.col("sum_len") > GOPHER_MEANLEN_HI * F.col("n_words"))
    fail_toptok = F.col("max_tok") * GOPHER_TOPTOK_DEN > F.col("n_words")
    fail_ttr = F.col("n_types") * GOPHER_TTR_NUM < F.col("n_words")
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(fail_words.cast("long")).cast("long").alias("fail_words"),
        F.sum(fail_meanlen.cast("long")).cast("long").alias("fail_meanlen"),
        F.sum(fail_toptok.cast("long")).cast("long").alias("fail_toptok"),
        F.sum(fail_ttr.cast("long")).cast("long").alias("fail_ttr"),
        F.sum(
            (~fail_words & ~fail_meanlen & ~fail_toptok & ~fail_ttr).cast("long")
        )
        .cast("long")
        .alias("n_pass"),
    )


# ---------------------------------------------------------------------------
# DSIR IMPORTANCE WEIGHTS (Xie et al. 2023, "Data Selection for Language
# Models via Importance Resampling"): score every document by how much
# its unigram distribution looks like a TARGET domain relative to the
# raw corpus — the importance weight log(p_target(x)/p_source(x)) that
# DSIR resamples by. Target here = the 'en' slice (a deterministic
# stand-in for "trusted high-quality corpus"); both unigram LMs use
# add-one smoothing over the SHARED vocabulary. Like naive_bayes_langid,
# every ln() is computed ONCE on the vocabulary-bounded token grid and
# integerized to micro-log-units (same 1-ulp .5-boundary caveat, same
# acceptance rationale), so per-document scores are EXACT integer dot
# products — bit-identical under any partitioning — and the per-language
# rollup (sum/min/max of scores) is order-independent.
# Scale shape: one data-sized (doc, token) count, one token-keyed join
# against the bounded weight grid, constant-width rollup. Target/source
# totals are a broadcast 1-row aggregate. No windows, no cartesian.
# Reference parity: none (SURVEY.md §2.7) — north-star LLM-pipeline op.
# ---------------------------------------------------------------------------
DSIR_TARGET_LANG = "en"


@register(
    "dsir_importance_weights",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, lang,
                   unnest(string_split({_BL_NORM_SQL}, ' ')) AS token
            FROM documents
        ),
        per_dt AS (
            SELECT doc_id, lang, token, CAST(COUNT(*) AS BIGINT) AS k
            FROM toks GROUP BY 1, 2, 3
        ),
        cs AS (
            SELECT token, CAST(COUNT(*) AS BIGINT) AS c_src
            FROM toks GROUP BY 1
        ),
        ct AS (
            SELECT token, CAST(COUNT(*) AS BIGINT) AS c_tgt
            FROM toks WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY 1
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_src,
                   CAST(COUNT(DISTINCT token) AS BIGINT) AS v,
                   CAST(SUM(CASE WHEN lang = '{DSIR_TARGET_LANG}'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_tgt
            FROM toks
        ),
        grid AS (
            SELECT s.token,
                   CAST(ROUND(1000000.0 * ln(
                       ((COALESCE(c.c_tgt, 0) + 1.0) / (t.n_tgt + t.v))
                       / ((s.c_src + 1.0) / (t.n_src + t.v))
                   )) AS BIGINT) AS w
            FROM cs s LEFT JOIN ct c ON c.token = s.token, tot t
        ),
        scores AS (
            SELECT p.doc_id, p.lang, CAST(SUM(p.k * g.w) AS BIGINT) AS score
            FROM per_dt p JOIN grid g ON g.token = p.token
            GROUP BY 1, 2
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(score) AS BIGINT) AS sum_score,
               CAST(MIN(score) AS BIGINT) AS min_score,
               CAST(MAX(score) AS BIGINT) AS max_score
        FROM scores GROUP BY 1
    """,
    tags=("text", "llm-pipeline", "importance-sampling", "documents"),
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_stream_job_spark.operators.dedup import _norm_text

    docs = load_table(spark, sf_dir, "documents", rebalance=True)
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(F.split(_norm_text(), " ")).alias("token"),
    ).localCheckpoint(eager=False)  # per_dt, cs, ct, tot all read it
    per_dt = toks.groupBy("doc_id", "lang", "token").agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    cs = toks.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("c_src"))
    ct = (
        toks.filter(F.col("lang") == DSIR_TARGET_LANG)
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("c_tgt"))
    )
    tot = toks.agg(
        F.count(F.lit(1)).cast("long").alias("n_src"),
        F.countDistinct("token").cast("long").alias("v"),
        F.sum((F.col("lang") == DSIR_TARGET_LANG).cast("long"))
        .cast("long")
        .alias("n_tgt"),
    )
    grid = (
        cs.join(ct, "token", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "token",
            F.round(
                1000000.0
                * F.log(
                    (
                        (F.coalesce(F.col("c_tgt"), F.lit(0)) + 1.0)
                        / (F.col("n_tgt") + F.col("v"))
                    )
                    / ((F.col("c_src") + 1.0) / (F.col("n_src") + F.col("v")))
                ),
                0,
            )
            .cast("long")
            .alias("w"),
        )
    )
    scores = (
        per_dt.join(grid, "token")
        .groupBy("doc_id", "lang")
        .agg(F.sum(F.col("k") * F.col("w")).cast("long").alias("score"))
    )
    return scores.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("score").cast("long").alias("sum_score"),
        F.min("score").cast("long").alias("min_score"),
        F.max("score").cast("long").alias("max_score"),
    )


# ---------------------------------------------------------------------------
# TERM PROXIMITY SEARCH — the ranking primitive phrase-aware search
# engines add on top of BM25: for a two-term query, rank documents by
# the MINIMUM token distance between any occurrence of term A and any
# occurrence of term B (1 = adjacent — the phrase case). Positions come
# from one posexplode pass; the pair comparison joins the A-positions
# to the B-positions ON doc_id, so its fan-in is bounded by one
# document's occurrence counts (≤ doc length), never corpus-sized — the
# same bounded-pair shape as the SemDeDup cap. Exact integers end to
# end; ties in the top-20 break by doc_id.
# ---------------------------------------------------------------------------
PROX_TERM_A = "hash"
PROX_TERM_B = "join"
PROX_TOP_N = 20


@register(
    "text_term_proximity_search",
    oracle=f"""
        WITH pos AS (
            SELECT doc_id, t.tok, CAST(t.p AS BIGINT) AS p
            FROM (
                SELECT doc_id,
                       unnest(string_split({_BL_NORM_SQL}, ' ')) AS tok,
                       unnest(range(1, len(string_split({_BL_NORM_SQL}, ' ')) + 1))
                           AS p
                FROM documents
            ) t
            WHERE t.tok IN ('{PROX_TERM_A}', '{PROX_TERM_B}')
        )
        SELECT a.doc_id AS doc_id,
               CAST(COUNT(DISTINCT a.p) AS BIGINT) AS n_a,
               CAST(COUNT(DISTINCT b.p) AS BIGINT) AS n_b,
               CAST(MIN(ABS(a.p - b.p)) AS BIGINT) AS min_dist
        FROM (SELECT doc_id, p FROM pos WHERE tok = '{PROX_TERM_A}') a
        JOIN (SELECT doc_id, p FROM pos WHERE tok = '{PROX_TERM_B}') b
          ON a.doc_id = b.doc_id
        GROUP BY 1
        ORDER BY min_dist ASC, a.doc_id ASC
        LIMIT {PROX_TOP_N}
    """,
    tags=("text", "search", "proximity", "documents"),
)
def text_term_proximity_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_stream_job_spark.operators.dedup import _norm_text

    docs = load_table(spark, sf_dir, "documents", rebalance=True)
    pos = (
        docs.select(
            "doc_id",
            F.posexplode(F.split(_norm_text(), " ")).alias("p0", "tok"),
        )
        .filter(F.col("tok").isin(PROX_TERM_A, PROX_TERM_B))
        .select("doc_id", "tok", (F.col("p0") + 1).cast("long").alias("p"))
        .localCheckpoint(eager=False)  # both query-term sides read it
    )
    a = pos.filter(F.col("tok") == PROX_TERM_A).select(
        "doc_id", F.col("p").alias("pa")
    )
    b = pos.filter(F.col("tok") == PROX_TERM_B).select(
        "doc_id", F.col("p").alias("pb")
    )
    return (
        a.join(b, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("pa").cast("long").alias("n_a"),
            F.countDistinct("pb").cast("long").alias("n_b"),
            F.min(F.abs(F.col("pa") - F.col("pb"))).cast("long").alias("min_dist"),
        )
        .orderBy(F.col("min_dist").asc(), F.col("doc_id").asc())
        .limit(PROX_TOP_N)
    )


# ---------------------------------------------------------------------------
# KNESER-NEY BIGRAM SCORING — the smoothing CCNet-class quality filters
# actually ship (KenLM trains interpolated Kneser-Ney; bigram_lm_score
# above is the add-one baseline). Interpolated KN with absolute
# discount D = 0.75:
#     P(b|a) = max(c(ab) − D, 0)/c(a·) + (D·N1+(a·)/c(a·)) · Pcont(b)
#     Pcont(b) = N1+(·b) / |bigram types|
# Every probability is one fixed IEEE dag over exact integer counts —
# D = 0.75 is a binary-exact constant, c−D and D·N1+ are exact scalings
# — computed ONCE per observed bigram type, ln()-integerized to
# micro-nats (same 1-ulp .5-boundary caveat and acceptance rationale as
# naive_bayes_langid), so per-document scores are exact integer dot
# products and the per-language rollup is order-independent. Training is
# resubstitution (the corpus scores itself), so every document bigram is
# in the grid and P > 0 always (c(ab) ≥ 1 ⇒ numerator ≥ 0.25·Pcont-term).
# Scale shape: one (doc, bigram) count, three bounded grid aggregates
# (per-left, per-right, type total), one bigram-keyed join, constant-
# width rollup. Same join skeleton as bigram_lm_score — partial-agg
# absorbed, AQE skew-split at web scale.
# ---------------------------------------------------------------------------
KN_DISCOUNT = 0.75  # binary-exact absolute discount (3/4)


@register(
    "text_kneser_ney_bigram_score",
    oracle=rf"""
        WITH bg AS (
            SELECT doc_id, lang,
                   unnest(list_transform(
                       generate_series(1, len(string_split_regex(
                           LOWER(TRIM(text)), '\s+')) - 1),
                       i -> string_split_regex(LOWER(TRIM(text)), '\s+')[i]
                            || ' ' ||
                            string_split_regex(LOWER(TRIM(text)), '\s+')[i + 1]
                   )) AS bg
            FROM documents
        ),
        per_db AS (
            SELECT doc_id, lang, bg, CAST(COUNT(*) AS BIGINT) AS k
            FROM bg GROUP BY 1, 2, 3
        ),
        cab AS (
            SELECT bg, CAST(COUNT(*) AS BIGINT) AS cab FROM bg GROUP BY 1
        ),
        ca AS (
            SELECT string_split(bg, ' ')[1] AS lt,
                   CAST(SUM(cab) AS BIGINT) AS ca,
                   CAST(COUNT(*) AS BIGINT) AS n1a
            FROM cab GROUP BY 1
        ),
        nb AS (
            SELECT string_split(bg, ' ')[2] AS rt,
                   CAST(COUNT(*) AS BIGINT) AS n1b
            FROM cab GROUP BY 1
        ),
        t AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM cab),
        grid AS (
            SELECT cab.bg,
                   CAST(ROUND(1000000.0 * ln(
                       (GREATEST(cab.cab - {KN_DISCOUNT}, 0.0)
                        + {KN_DISCOUNT} * ca.n1a * nb.n1b / t.t) / ca.ca
                   )) AS BIGINT) AS w
            FROM cab
            JOIN ca ON ca.lt = string_split(cab.bg, ' ')[1]
            JOIN nb ON nb.rt = string_split(cab.bg, ' ')[2]
            CROSS JOIN t
        ),
        scores AS (
            SELECT p.doc_id, p.lang, CAST(SUM(p.k * g.w) AS BIGINT) AS score
            FROM per_db p JOIN grid g ON g.bg = p.bg
            GROUP BY 1, 2
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(score) AS BIGINT) AS sum_score,
               CAST(MIN(score) AS BIGINT) AS min_score,
               CAST(MAX(score) AS BIGINT) AS max_score
        FROM scores GROUP BY 1
    """,
    tags=("text", "quality", "lm", "kneser-ney", "documents"),
)
def text_kneser_ney_bigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", rebalance=True)
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    n = F.size(toks)
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    bg = docs.select(
        "doc_id", "lang", F.explode(pairs).alias("bg")
    ).localCheckpoint(eager=False)  # per-doc counts AND the grid read it
    per_db = bg.groupBy("doc_id", "lang", "bg").agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    cab = (
        bg.groupBy("bg")
        .agg(F.count(F.lit(1)).cast("long").alias("cab"))
        .localCheckpoint(eager=False)  # ca, nb, t, and the grid read it
    )
    lt = F.split(F.col("bg"), " ").getItem(0)
    rt = F.split(F.col("bg"), " ").getItem(1)
    ca = cab.groupBy(lt.alias("lt")).agg(
        F.sum("cab").cast("long").alias("ca"),
        F.count(F.lit(1)).cast("long").alias("n1a"),
    )
    nb = cab.groupBy(rt.alias("rt")).agg(
        F.count(F.lit(1)).cast("long").alias("n1b")
    )
    t = cab.agg(F.count(F.lit(1)).cast("long").alias("t"))
    grid = (
        cab.withColumn("lt", lt)
        .withColumn("rt", rt)
        .join(ca, "lt")
        .join(nb, "rt")
        .crossJoin(F.broadcast(t))
        .select(
            "bg",
            F.round(
                1000000.0
                * F.log(
                    (
                        F.greatest(F.col("cab") - KN_DISCOUNT, F.lit(0.0))
                        + KN_DISCOUNT
                        * F.col("n1a")
                        * F.col("n1b")
                        / F.col("t")
                    )
                    / F.col("ca")
                ),
                0,
            )
            .cast("long")
            .alias("w"),
        )
    )
    scores = (
        per_db.join(grid, "bg")
        .groupBy("doc_id", "lang")
        .agg(F.sum(F.col("k") * F.col("w")).cast("long").alias("score"))
    )
    return scores.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("score").cast("long").alias("sum_score"),
        F.min("score").cast("long").alias("min_score"),
        F.max("score").cast("long").alias("max_score"),
    )


# ---------------------------------------------------------------------------
# SOURCE DATASHEET — the one-stop per-source overview a data steward
# reads before admitting a source into a training mix (the "datasheets
# for datasets" rollup): volume (docs, chars, tokens), language spread,
# exact-duplicate pressure (docs minus distinct normalized
# fingerprints), and how many docs clear the Gopher quality rules. The
# pass condition reuses the GOPHER_* module constants verbatim, so the
# datasheet and gopher_quality_rules can never disagree on thresholds.
# Scale shape: one (doc, token) count + constant-width per-doc profile,
# one doc-keyed join, |sources|-row rollup. Exact integers throughout.
# ---------------------------------------------------------------------------
@register(
    "corpus_source_datasheet",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(string_split({_BL_NORM_SQL}, ' ')) AS token
            FROM documents
        ),
        per_tok AS (
            SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS c
            FROM toks GROUP BY 1, 2
        ),
        doc_stats AS (
            SELECT doc_id,
                   CAST(SUM(c) AS BIGINT) AS n_words,
                   CAST(COUNT(*) AS BIGINT) AS n_types,
                   CAST(MAX(c) AS BIGINT) AS max_tok,
                   CAST(SUM(len(token) * c) AS BIGINT) AS sum_len
            FROM per_tok GROUP BY 1
        ),
        docs AS (
            SELECT d.source, d.lang, d.doc_id, d.n_chars,
                   md5({_BL_NORM_SQL}) AS fp,
                   s.n_words, s.n_types, s.max_tok, s.sum_len
            FROM documents d JOIN doc_stats s USING (doc_id)
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(SUM(n_words) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) - COUNT(DISTINCT fp) AS BIGINT) AS n_dup_docs,
               CAST(SUM(CASE WHEN n_words >= {GOPHER_MIN_WORDS}
                              AND n_words <= {GOPHER_MAX_WORDS}
                              AND sum_len >= {GOPHER_MEANLEN_LO} * n_words
                              AND sum_len <= {GOPHER_MEANLEN_HI} * n_words
                              AND max_tok * {GOPHER_TOPTOK_DEN} <= n_words
                              AND n_types * {GOPHER_TTR_NUM} >= n_words
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_gopher_pass
        FROM docs
        GROUP BY 1
    """,
    tags=("text", "corpus", "datasheet", "llm-pipeline", "documents"),
)
def corpus_source_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_stream_job_spark.operators.dedup import _norm_text

    docs = load_table(spark, sf_dir, "documents", rebalance=True)
    toks = docs.select(
        "doc_id", F.explode(F.split(_norm_text(), " ")).alias("token")
    )
    per_tok = toks.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    doc_stats = per_tok.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_words"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.max("c").cast("long").alias("max_tok"),
        F.sum(F.length("token") * F.col("c")).cast("long").alias("sum_len"),
    )
    profiled = docs.select(
        "doc_id", "source", "lang", "n_chars", F.md5(_norm_text()).alias("fp")
    ).join(doc_stats, "doc_id")
    gopher_pass = (
        (F.col("n_words") >= GOPHER_MIN_WORDS)
        & (F.col("n_words") <= GOPHER_MAX_WORDS)
        & (F.col("sum_len") >= GOPHER_MEANLEN_LO * F.col("n_words"))
        & (F.col("sum_len") <= GOPHER_MEANLEN_HI * F.col("n_words"))
        & (F.col("max_tok") * GOPHER_TOPTOK_DEN <= F.col("n_words"))
        & (F.col("n_types") * GOPHER_TTR_NUM >= F.col("n_words"))
    )
    return profiled.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum("n_words").cast("long").alias("n_tokens"),
        (F.count(F.lit(1)) - F.countDistinct("fp")).cast("long").alias("n_dup_docs"),
        F.sum(gopher_pass.cast("long")).cast("long").alias("n_gopher_pass"),
    )


# ---------------------------------------------------------------------------
# READABILITY FEATURES — the three corpus-portable inputs of the classic
# readability indexes (LIX/Flesch use words-per-sentence too, which this
# punctuation-free fixture corpus cannot express): average word length
# in exact centi-chars, long-word (>=7 chars) rate, and monosyllable
# rate via vowel-group counting. All per-row integer arithmetic summed
# exactly; one (lang, source)-key hash aggregate.
# ---------------------------------------------------------------------------
READABILITY_LONG_CHARS = 7


@register(
    "text_readability_features",
    oracle=rf"""
        WITH per_doc AS (
            SELECT lang, source,
                   CAST(len(string_split_regex(TRIM(text), '\s+')) AS BIGINT)
                       AS n_tok,
                   CAST(length(regexp_replace(text, '\s', '', 'g')) AS BIGINT)
                       AS n_chars,
                   CAST(len(list_filter(string_split_regex(TRIM(text), '\s+'),
                            t -> length(t) >= {READABILITY_LONG_CHARS}))
                       AS BIGINT) AS n_long,
                   CAST(len(list_filter(string_split_regex(TRIM(text), '\s+'),
                            t -> len(regexp_extract_all(t, '[aeiou]+')) = 1))
                       AS BIGINT) AS n_mono
            FROM documents
        )
        SELECT lang, source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) * 100
                   // CAST(SUM(n_tok) AS BIGINT) AS avg_word_len_centi,
               CAST(SUM(n_long) AS BIGINT) * 10000
                   // CAST(SUM(n_tok) AS BIGINT) AS long_word_bp,
               CAST(SUM(n_mono) AS BIGINT) * 10000
                   // CAST(SUM(n_tok) AS BIGINT) AS monosyllable_bp
        FROM per_doc
        GROUP BY lang, source
    """,
    tags=("text", "readability", "quality", "documents"),
)
def text_readability_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), r"\s+")
    n_tok = F.size(toks).cast("long")
    n_chars = F.length(F.regexp_replace("text", r"\s", "")).cast("long")
    n_long = F.size(
        F.filter(toks, lambda t: F.length(t) >= READABILITY_LONG_CHARS)
    ).cast("long")
    n_mono = F.size(
        F.filter(toks, lambda t: F.regexp_count(t, F.lit("[aeiou]+")) == 1)
    ).cast("long")
    return (
        docs.select(
            "lang",
            "source",
            n_tok.alias("n_tok"),
            n_chars.alias("n_chars"),
            n_long.alias("n_long"),
            n_mono.alias("n_mono"),
        )
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            idiv(F.sum("n_chars").cast("long") * 100, F.sum("n_tok").cast("long"))
            .alias("avg_word_len_centi"),
            idiv(F.sum("n_long").cast("long") * 10000, F.sum("n_tok").cast("long"))
            .alias("long_word_bp"),
            idiv(F.sum("n_mono").cast("long") * 10000, F.sum("n_tok").cast("long"))
            .alias("monosyllable_bp"),
        )
    )


# ---------------------------------------------------------------------------
# UNICODE SCRIPT PROFILE — per-language codepoint-class census (ASCII
# letters / digits / whitespace / other): the first gate a multilingual
# pipeline runs to catch script-label mismatches (a 'en' bucket full of
# non-Latin bytes) before any tokenizer sees the text. Exact integer
# counts; other = total − the three counted classes, so the four columns
# always reconcile.
# ---------------------------------------------------------------------------
@register(
    "text_unicode_script_profile",
    oracle=r"""
        WITH per_doc AS (
            SELECT lang,
                   CAST(length(text) AS BIGINT) AS n_total,
                   CAST(len(regexp_extract_all(text, '[a-zA-Z]')) AS BIGINT)
                       AS n_alpha,
                   CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT)
                       AS n_digit,
                   CAST(len(regexp_extract_all(text, '\s')) AS BIGINT)
                       AS n_space
            FROM documents
        )
        SELECT lang,
               CAST(SUM(n_total) AS BIGINT) AS n_chars,
               CAST(SUM(n_alpha) AS BIGINT) * 10000
                   // CAST(SUM(n_total) AS BIGINT) AS alpha_bp,
               CAST(SUM(n_digit) AS BIGINT) * 10000
                   // CAST(SUM(n_total) AS BIGINT) AS digit_bp,
               CAST(SUM(n_space) AS BIGINT) * 10000
                   // CAST(SUM(n_total) AS BIGINT) AS space_bp,
               CAST(SUM(n_total - n_alpha - n_digit - n_space) AS BIGINT)
                   * 10000 // CAST(SUM(n_total) AS BIGINT) AS other_bp
        FROM per_doc
        GROUP BY lang
    """,
    tags=("text", "unicode", "profile", "documents"),
)
def text_unicode_script_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_total = F.length("text").cast("long")
    n_alpha = F.regexp_count("text", F.lit("[a-zA-Z]")).cast("long")
    n_digit = F.regexp_count("text", F.lit("[0-9]")).cast("long")
    n_space = F.regexp_count("text", F.lit(r"\s")).cast("long")
    return (
        docs.select(
            "lang",
            n_total.alias("n_total"),
            n_alpha.alias("n_alpha"),
            n_digit.alias("n_digit"),
            n_space.alias("n_space"),
        )
        .groupBy("lang")
        .agg(
            F.sum("n_total").cast("long").alias("n_chars"),
            idiv(F.sum("n_alpha").cast("long") * 10000, F.sum("n_total").cast("long"))
            .alias("alpha_bp"),
            idiv(F.sum("n_digit").cast("long") * 10000, F.sum("n_total").cast("long"))
            .alias("digit_bp"),
            idiv(F.sum("n_space").cast("long") * 10000, F.sum("n_total").cast("long"))
            .alias("space_bp"),
            idiv(
                F.sum(
                    F.col("n_total")
                    - F.col("n_alpha")
                    - F.col("n_digit")
                    - F.col("n_space")
                ).cast("long")
                * 10000,
                F.sum("n_total").cast("long"),
            ).alias("other_bp"),
        )
    )


# ---------------------------------------------------------------------------
# MOJIBAKE DETECTION — double-encoded UTF-8 markers ('Ã©'-class Latin-1
# rereads, 'â€™'-class punctuation artifacts) per source. The fixture
# corpus is clean ASCII, so a deterministic corrupted variant is
# synthesized for doc_id % 7 == 0 (same fixture-shaping contract as the
# WAV/URL encoders: the synthesis is plumbing, the DETECTOR — marker
# regex over any text column — is the operator).
# ---------------------------------------------------------------------------
_MOJIBAKE_SUFFIX = " cafÃ© donâ€™t naÃ¯ve"
_MOJIBAKE_PATTERN = "Ã|â€"


@register(
    "text_mojibake_detect",
    oracle=f"""
        WITH corrupted AS (
            SELECT source,
                   CASE WHEN doc_id % 7 = 0
                        THEN text || '{_MOJIBAKE_SUFFIX}' ELSE text END AS t
            FROM documents
        ),
        per_doc AS (
            SELECT source,
                   CAST(len(regexp_extract_all(t, '{_MOJIBAKE_PATTERN}'))
                       AS BIGINT) AS n_markers
            FROM corrupted
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN n_markers > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_mojibake_docs,
               CAST(SUM(n_markers) AS BIGINT) AS total_markers,
               CAST(SUM(CASE WHEN n_markers > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   * 10000 // CAST(COUNT(*) AS BIGINT) AS mojibake_bp
        FROM per_doc
        GROUP BY source
    """,
    tags=("text", "mojibake", "quality", "documents"),
)
def text_mojibake_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(F.col("text"), F.lit(_MOJIBAKE_SUFFIX)),
    ).otherwise(F.col("text"))
    n_markers = F.regexp_count(t, F.lit(_MOJIBAKE_PATTERN)).cast("long")
    return (
        docs.select("source", n_markers.alias("n_markers"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("n_markers") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_mojibake_docs"),
            F.sum("n_markers").cast("long").alias("total_markers"),
            idiv(
                F.sum(F.when(F.col("n_markers") > 0, 1).otherwise(0)).cast(
                    "long"
                )
                * 10000,
                F.count(F.lit(1)).cast("long"),
            ).alias("mojibake_bp"),
        )
    )


# ---------------------------------------------------------------------------
# LEXICAL DIVERSITY PER SOURCE — corpus-level type/token ratio and hapax
# rate computed over the SOURCE-wide vocabulary (per-doc TTR lives in
# text_quality_score; corpus TTR is the boilerplate detector — a source
# whose million pages share one tiny vocabulary is templated). Shape:
# one (source, token) hash aggregate — partial map-side counts collapse
# repeats before the shuffle — then a source-key rollup.
# ---------------------------------------------------------------------------
@register(
    "text_lexical_diversity",
    oracle=r"""
        WITH tok AS (
            SELECT source, UNNEST(string_split_regex(TRIM(LOWER(text)), '\s+'))
                       AS token
            FROM documents
        ),
        per_type AS (
            SELECT source, token, COUNT(*) AS n
            FROM tok GROUP BY source, token
        )
        SELECT source,
               CAST(SUM(n) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_hapax,
               CAST(COUNT(*) AS BIGINT) * 10000
                   // CAST(SUM(n) AS BIGINT) AS ttr_bp,
               CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) * 10000
                   // CAST(COUNT(*) AS BIGINT) AS hapax_bp
        FROM per_type
        GROUP BY source
    """,
    tags=("text", "diversity", "boilerplate", "documents"),
)
def text_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", rebalance=True)
    per_type = (
        docs.select(
            "source",
            F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("token"),
        )
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return per_type.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.when(F.col("n") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_hapax"),
        idiv(
            F.count(F.lit(1)).cast("long") * 10000, F.sum("n").cast("long")
        ).alias("ttr_bp"),
        idiv(
            F.sum(F.when(F.col("n") == 1, 1).otherwise(0)).cast("long")
            * 10000,
            F.count(F.lit(1)).cast("long"),
        ).alias("hapax_bp"),
    )


# ---------------------------------------------------------------------------
# LANGUAGE-ID PRECISION/RECALL — the eval rollup over text_language_id's
# confusion cells: per language, tp/fp/fn and precision/recall in basis
# points. The prediction expression is the SAME one text_language_id
# registers (shared marker table + tiebreak), so this is the scorecard
# for that operator, not a second classifier.
# ---------------------------------------------------------------------------
@register(
    "langid_precision_recall",
    oracle=f"""
        WITH conf AS ({_langid_case_sql()}),
        langs AS (SELECT DISTINCT gold_lang AS lang FROM conf),
        scored AS (
            SELECT l.lang,
                   CAST(COALESCE(SUM(CASE WHEN c.gold_lang = l.lang
                                           AND c.pred_lang = l.lang
                                          THEN c.n_docs END), 0) AS BIGINT)
                       AS tp,
                   CAST(COALESCE(SUM(CASE WHEN c.gold_lang <> l.lang
                                           AND c.pred_lang = l.lang
                                          THEN c.n_docs END), 0) AS BIGINT)
                       AS fp,
                   CAST(COALESCE(SUM(CASE WHEN c.gold_lang = l.lang
                                           AND c.pred_lang <> l.lang
                                          THEN c.n_docs END), 0) AS BIGINT)
                       AS fn
            FROM langs l, conf c
            GROUP BY l.lang
        )
        SELECT lang, tp, fp, fn,
               CASE WHEN tp + fp = 0 THEN CAST(0 AS BIGINT)
                    ELSE tp * 10000 // (tp + fp) END AS precision_bp,
               CASE WHEN tp + fn = 0 THEN CAST(0 AS BIGINT)
                    ELSE tp * 10000 // (tp + fn) END AS recall_bp
        FROM scored
    """,
    tags=("text", "langid", "eval", "documents"),
)
def langid_precision_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    conf = text_language_id(spark, sf_dir).localCheckpoint(eager=False)
    langs = conf.select(F.col("gold_lang").alias("lang")).distinct()
    scored = (
        langs.crossJoin(
            conf.select("gold_lang", "pred_lang", "n_docs")
        )
        .groupBy("lang")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("gold_lang") == F.col("lang"))
                        & (F.col("pred_lang") == F.col("lang")),
                        F.col("n_docs"),
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tp"),
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("gold_lang") != F.col("lang"))
                        & (F.col("pred_lang") == F.col("lang")),
                        F.col("n_docs"),
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("fp"),
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("gold_lang") == F.col("lang"))
                        & (F.col("pred_lang") != F.col("lang")),
                        F.col("n_docs"),
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("fn"),
        )
    )
    return scored.select(
        "lang",
        "tp",
        "fp",
        "fn",
        F.when((F.col("tp") + F.col("fp")) == 0, F.lit(0).cast("long"))
        .otherwise(idiv(F.col("tp") * 10000, F.col("tp") + F.col("fp")))
        .alias("precision_bp"),
        F.when((F.col("tp") + F.col("fn")) == 0, F.lit(0).cast("long"))
        .otherwise(idiv(F.col("tp") * 10000, F.col("tp") + F.col("fn")))
        .alias("recall_bp"),
    )


# ---------------------------------------------------------------------------
# VOCABULARY PRESSURE — the tokenizer-sizing curve: what fraction of the
# token stream does a top-K vocabulary cover, for the K grid a tokenizer
# designer actually compares? Tokens rank by (count DESC, token ASC)
# through the distributed rank helper (range exchange, no global sort);
# each K of the literal grid then reads its coverage off one bounded
# join + rollup. Exact integer bp.
# ---------------------------------------------------------------------------
VOCAB_PRESSURE_KS = (100, 500, 1000, 2000)


@register(
    "tokenizer_vocab_pressure",
    oracle=rf"""
        WITH tok AS (
            SELECT UNNEST(string_split_regex(TRIM(LOWER(text)), '\s+'))
                       AS token
            FROM documents
        ),
        counts AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY token),
        ranked AS (
            SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, token) AS rnk
            FROM counts
        ),
        tot AS (
            SELECT CAST(SUM(c) AS BIGINT) AS total,
                   CAST(COUNT(*) AS BIGINT) AS n_types
            FROM counts
        )
        SELECT k.vocab_k,
               t.n_types,
               CAST(COALESCE(SUM(r.c), 0) AS BIGINT) AS covered_tokens,
               t.total AS total_tokens,
               CAST(COALESCE(SUM(r.c), 0) AS BIGINT) * 10000 // t.total
                   AS coverage_bp
        FROM (VALUES {", ".join(f"({k})" for k in VOCAB_PRESSURE_KS)})
            AS k(vocab_k)
        LEFT JOIN ranked r ON r.rnk <= k.vocab_k
        CROSS JOIN tot t
        GROUP BY k.vocab_k, t.total, t.n_types
    """,
    tags=("text", "tokenizer", "vocab", "documents"),
)
def tokenizer_vocab_pressure(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_stream_job_spark.operators._distributed import distributed_rank

    docs = load_table(spark, sf_dir, "documents", rebalance=True)
    counts = (
        docs.select(
            F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    # only ranks <= max(K) can ever join — the filter keeps the non-equi
    # join's data side bounded at max(K) rows instead of shipping the
    # corpus-scaled vocabulary through a nested-loop join (r8 review)
    ranked = distributed_rank(counts, [(-F.col("c")), F.col("token")]).filter(
        F.col("rnk") <= max(VOCAB_PRESSURE_KS)
    )
    tot = counts.agg(
        F.sum("c").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
    )
    grid = jvm_values_df(
        docs.sparkSession, [(k,) for k in VOCAB_PRESSURE_KS], "vocab_k int"
    )
    return (
        F.broadcast(grid)
        .join(ranked, F.col("rnk") <= F.col("vocab_k"), "left")
        .crossJoin(F.broadcast(tot))
        .groupBy("vocab_k", "total", "n_types")
        .agg(
            F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias(
                "covered_tokens"
            )
        )
        .select(
            F.col("vocab_k").cast("int").alias("vocab_k"),
            "n_types",
            "covered_tokens",
            F.col("total").alias("total_tokens"),
            idiv(F.col("covered_tokens") * 10000, F.col("total")).alias(
                "coverage_bp"
            ),
        )
    )


# ---------------------------------------------------------------------------
# ADJACENT-REPETITION DETECTOR — degenerate-text screening: the rate of
# immediately-repeated tokens ("the the", looped generations). Distinct
# from text_repetition_filter's multiset dup fractions — this one is
# ORDER-SENSITIVE (position-adjacent), which is exactly what catches
# model-generated loops that shuffle-invariant stats miss. Per-row
# counting stays inside one expression; one source-key rollup.
# ---------------------------------------------------------------------------
@register(
    "text_adjacent_repetition",
    oracle=r"""
        WITH per_doc AS (
            SELECT source,
                   CAST(len(toks) - 1 AS BIGINT) AS n_pairs,
                   CAST(list_sum(list_prepend(0,
                       list_transform(range(1, len(toks)),
                           j -> CASE WHEN toks[j] = toks[j + 1]
                                     THEN 1 ELSE 0 END))) AS BIGINT)
                       AS n_adjacent
            FROM (
                SELECT source,
                       string_split_regex(TRIM(LOWER(text)), '\s+') AS toks
                FROM documents
            )
            WHERE len(toks) >= 2
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_pairs) AS BIGINT) AS n_pairs,
               CAST(SUM(n_adjacent) AS BIGINT) AS n_adjacent,
               CAST(SUM(n_adjacent) AS BIGINT) * 10000
                   // CAST(SUM(n_pairs) AS BIGINT) AS adjacent_bp,
               CAST(SUM(CASE WHEN n_adjacent > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_docs_with_runs
        FROM per_doc
        GROUP BY source
    """,
    tags=("text", "repetition", "quality", "documents"),
)
def text_adjacent_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower("text")), r"\s+")
    staged = docs.select("source", toks.alias("toks")).filter(
        F.size("toks") >= 2
    )
    n_adjacent = F.expr(
        "aggregate(transform(sequence(1, size(toks) - 1),"
        " j -> IF(element_at(toks, j) = element_at(toks, j + 1), 1L, 0L)),"
        " 0L, (acc, x) -> acc + x)"
    )
    per_doc = staged.select(
        "source",
        (F.size("toks") - 1).cast("long").alias("n_pairs"),
        n_adjacent.alias("n_adjacent"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_pairs").cast("long").alias("n_pairs"),
        F.sum("n_adjacent").cast("long").alias("n_adjacent"),
        idiv(
            F.sum("n_adjacent").cast("long") * 10000,
            F.sum("n_pairs").cast("long"),
        ).alias("adjacent_bp"),
        F.sum(F.when(F.col("n_adjacent") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_docs_with_runs"),
    )


# ---------------------------------------------------------------------------
# PERPLEXITY TERTILE BUCKETS — the CCNet-style head/middle/tail split:
# a unigram LM is fit on the corpus itself (token count c over total N),
# each document is scored by its mean per-token surprise ILN(N) - ILN(c)
# in integer micro-nats (the same pure-int64 Pade log as
# naive_bayes_langid — zero libm on either engine), and documents are
# dealt into 3 equal NTILE buckets by that score. Head = lowest
# perplexity (most in-distribution), tail = highest (noise candidates).
# Scale shape: the vocabulary aggregate and the per-(doc,token) join are
# the only shuffles; the global split is distributed_rank (range
# exchange + broadcast offsets — no single-partition window), the
# 63-row ILN table is a broadcast.
# ---------------------------------------------------------------------------
PPL_TERTILES = 3


@register(
    "perplexity_tertile_buckets",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(string_split({_BL_NORM_SQL}, ' ')) AS token
            FROM documents
        ),
        counts AS (
            SELECT token, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY 1
        ),
        ilntab(e, lo, hi, sdiv, smul, eln) AS (VALUES {_ILN_VALUES_SQL}),
        ntot AS (
            SELECT t.eln + {_iln_frac_sql('((x.m // t.sdiv) * t.smul)')}
                       AS iln_n
            FROM (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM toks) x
            JOIN ilntab t ON x.m >= t.lo AND x.m <= t.hi
        ),
        w AS (
            SELECT c.token,
                   CAST((SELECT iln_n FROM ntot)
                        - (t.eln
                           + {_iln_frac_sql('((c.c // t.sdiv) * t.smul)')})
                        AS BIGINT) AS w
            FROM counts c
            JOIN ilntab t ON c.c >= t.lo AND c.c <= t.hi
        ),
        per_dt AS (
            SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS k
            FROM toks GROUP BY 1, 2
        ),
        per_doc AS (
            SELECT p.doc_id,
                   CAST(SUM(p.k) AS BIGINT) AS n_tokens,
                   CAST(SUM(p.k * w.w) AS BIGINT) AS s
            FROM per_dt p JOIN w ON w.token = p.token
            GROUP BY 1
        ),
        scored AS (
            SELECT doc_id,
                   (2 * s + n_tokens) // (2 * n_tokens) AS per_tok_unats
            FROM per_doc
        ),
        b AS (
            SELECT per_tok_unats,
                   CAST(NTILE({PPL_TERTILES})
                        OVER (ORDER BY per_tok_unats, doc_id) AS BIGINT)
                       AS bucket
            FROM scored
        )
        SELECT bucket,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(MIN(per_tok_unats) AS BIGINT) AS min_unats,
               CAST(MAX(per_tok_unats) AS BIGINT) AS max_unats,
               CAST((2 * CAST(SUM(per_tok_unats) AS BIGINT) + COUNT(*))
                    // (2 * COUNT(*)) AS BIGINT) AS avg_unats
        FROM b GROUP BY 1
    """,
    tags=("text", "llm-pipeline", "perplexity", "quality", "documents"),
)
def perplexity_tertile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_stream_job_spark.operators._distributed import (
        distributed_rank,
        ntile_from_rank,
    )
    from kafka_stream_job_spark.operators.dedup import _norm_text

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(_norm_text(), " ")).alias("token")
    ).localCheckpoint(eager=False)  # counts, total, and per_dt all read it
    counts = toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    ntot = toks.agg(F.count(F.lit(1)).cast("long").alias("m"))
    iln_n = _attach_iln(spark, ntot, "m", "iln_n").select("iln_n")
    w = (
        _attach_iln(spark, counts, "c", "iln_c")
        .crossJoin(F.broadcast(iln_n))
        .select("token", (F.col("iln_n") - F.col("iln_c")).alias("w"))
    )
    per_dt = toks.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    per_doc = (
        per_dt.join(w, "token")
        .groupBy("doc_id")
        .agg(
            F.sum("k").cast("long").alias("n_tokens"),
            F.sum(F.col("k") * F.col("w")).cast("long").alias("s"),
        )
        .select(
            "doc_id",
            idiv(
                F.col("s") * 2 + F.col("n_tokens"), F.col("n_tokens") * 2
            ).alias("per_tok_unats"),
        )
    )
    total = per_doc.agg(F.count(F.lit(1)).cast("long").alias("total"))
    bucketed = (
        distributed_rank(per_doc, [F.col("per_tok_unats"), F.col("doc_id")])
        .crossJoin(F.broadcast(total))
        .select(
            "per_tok_unats",
            ntile_from_rank(F.col("rnk"), F.col("total"), PPL_TERTILES)
            .cast("long")
            .alias("bucket"),
        )
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("per_tok_unats").cast("long").alias("min_unats"),
            F.max("per_tok_unats").cast("long").alias("max_unats"),
            F.sum("per_tok_unats").cast("long").alias("_sum"),
        )
        .select(
            "bucket",
            "n_docs",
            "min_unats",
            "max_unats",
            idiv(
                F.col("_sum") * 2 + F.col("n_docs"), F.col("n_docs") * 2
            ).alias("avg_unats"),
        )
    )


# ---------------------------------------------------------------------------
# FEATURE HASHING TRICK — the hashed bag-of-words a quality/langid
# classifier consumes at 100 TB when the vocabulary cannot be
# materialized: every token maps to bucket md5(token)[:7] % 64 (no
# dictionary, no shuffle-sized vocab state), and per (lang, bucket) the
# engine reports token mass and document reach; top-3 buckets per lang
# by mass. The per-lang window partitions are bounded at 64 rows by
# construction, so the rank is never a data-sized sort.
# ---------------------------------------------------------------------------
FH_BUCKETS = 64
FH_TOP = 3


@register(
    "text_feature_hashing",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, lang,
                   unnest(string_split({_BL_NORM_SQL}, ' ')) AS token
            FROM documents
        ),
        b AS (
            SELECT lang, doc_id,
                   ('0x' || substr(md5(token), 1, 7))::BIGINT % {FH_BUCKETS}
                       AS bucket
            FROM toks
        ),
        agg AS (
            SELECT lang, bucket,
                   CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
            FROM b GROUP BY 1, 2
        ),
        r AS (
            SELECT lang, bucket, n_tokens, n_docs,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY lang
                       ORDER BY n_tokens DESC, bucket) AS BIGINT) AS rnk
            FROM agg
        )
        SELECT lang, bucket, n_tokens, n_docs, rnk
        FROM r WHERE rnk <= {FH_TOP}
    """,
    tags=("text", "llm-pipeline", "features", "hashing", "documents"),
)
def text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from kafka_stream_job_spark.operators.dedup import _norm_text

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        "doc_id",
        F.explode(F.split(_norm_text(), " ")).alias("token"),
    )
    bucketed = toks.select(
        "lang",
        "doc_id",
        (
            F.conv(F.substring(F.md5("token"), 1, 7), 16, 10).cast("long")
            % FH_BUCKETS
        ).alias("bucket"),
    )
    agg = bucketed.groupBy("lang", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
    )
    # bounded window: each lang partition holds at most FH_BUCKETS rows
    win = Window.partitionBy("lang").orderBy(
        F.desc("n_tokens"), F.asc("bucket")
    )
    return (
        agg.withColumn("rnk", F.row_number().over(win).cast("long"))
        .filter(F.col("rnk") <= FH_TOP)
        .select("lang", "bucket", "n_tokens", "n_docs", "rnk")
    )


# ---------------------------------------------------------------------------
# HAPAX RATIO BY SOURCE — lexical richness at the SOURCE level (the
# corpus-curation complement of per-document text_lexical_diversity):
# share of each source's vocabulary that occurs exactly once. A source
# whose hapax share collapses is template/boilerplate-heavy; one whose
# share is extreme is noise. Two bounded aggregates over the token
# stream — (source, token) counts, then per-source rollup — with
# map-side partial aggregation carrying the shuffle.
# ---------------------------------------------------------------------------
@register(
    "text_hapax_ratio",
    oracle=f"""
        WITH toks AS (
            SELECT source,
                   unnest(string_split({_BL_NORM_SQL}, ' ')) AS token
            FROM documents
        ),
        counts AS (
            SELECT source, token, CAST(COUNT(*) AS BIGINT) AS c
            FROM toks GROUP BY 1, 2
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS vocab_size,
               CAST(SUM(c) AS BIGINT) AS n_tokens,
               CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_hapax,
               CAST((2 * CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                              AS BIGINT) * 10000 + COUNT(*))
                    // (2 * COUNT(*)) AS BIGINT) AS hapax_ratio_bp
        FROM counts GROUP BY 1
    """,
    tags=("text", "llm-pipeline", "lexical", "documents"),
)
def text_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_stream_job_spark.operators.dedup import _norm_text

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(F.split(_norm_text(), " ")).alias("token")
    )
    counts = toks.groupBy("source", "token").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    return (
        counts.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("vocab_size"),
            F.sum("c").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_hapax"),
        )
        .select(
            "source",
            "vocab_size",
            "n_tokens",
            "n_hapax",
            idiv(
                F.col("n_hapax") * 2 * 10000 + F.col("vocab_size"),
                F.col("vocab_size") * 2,
            ).alias("hapax_ratio_bp"),
        )
    )


# ---------------------------------------------------------------------------
# BIGRAM ENTROPY RATE — per-source conditional entropy H(next | prev) in
# integer micro-nats (pure-ILN, zero libm): the corpus-level
# compressibility statistic that complements the per-document LM scores
# (a source whose entropy rate collapses is template spam; one that
# climbs is churn). H·N = Σ c(w1,w2)·(ILN(c(w1)) − ILN(c(w1,w2))),
# divided out half-up. Bigrams come from one in-array slice-zip per
# document (no self-join); both ILN attachments ride the 63-row
# broadcast.
# ---------------------------------------------------------------------------
@register(
    "text_entropy_rate_bigram",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, source,
                   string_split({_BL_NORM_SQL}, ' ') AS ts
            FROM documents
        ),
        bg AS (
            SELECT source,
                   ts[i] AS w1, ts[i + 1] AS w2
            FROM (SELECT source, ts,
                         UNNEST(range(1, greatest(len(ts), 1))) AS i
                  FROM toks)
        ),
        c12 AS (
            SELECT source, w1, w2, CAST(COUNT(*) AS BIGINT) AS c
            FROM bg GROUP BY 1, 2, 3
        ),
        c1 AS (
            SELECT source, w1, CAST(SUM(c) AS BIGINT) AS c1
            FROM c12 GROUP BY 1, 2
        ),
        ilntab(e, lo, hi, sdiv, smul, eln) AS (VALUES {_ILN_VALUES_SQL}),
        w12 AS (
            SELECT x.source, x.w1, x.c,
                   t.eln + {_iln_frac_sql('((x.c // t.sdiv) * t.smul)')}
                       AS iln_c12
            FROM c12 x JOIN ilntab t ON x.c >= t.lo AND x.c <= t.hi
        ),
        w1t AS (
            SELECT x.source, x.w1,
                   t.eln + {_iln_frac_sql('((x.c1 // t.sdiv) * t.smul)')}
                       AS iln_c1
            FROM c1 x JOIN ilntab t ON x.c1 >= t.lo AND x.c1 <= t.hi
        ),
        agg AS (
            SELECT a.source,
                   CAST(SUM(a.c) AS BIGINT) AS n_bigrams,
                   CAST(COUNT(*) AS BIGINT) AS vocab_bigrams,
                   CAST(SUM(a.c * (b.iln_c1 - a.iln_c12)) AS BIGINT) AS hs
            FROM w12 a
            JOIN w1t b ON b.source = a.source AND b.w1 = a.w1
            GROUP BY 1
        )
        SELECT source, n_bigrams, vocab_bigrams,
               CAST((2 * hs + n_bigrams) // (2 * n_bigrams) AS BIGINT)
                   AS entropy_rate_unats
        FROM agg
    """,
    tags=("text", "llm-pipeline", "entropy", "bigram", "documents"),
)
def text_entropy_rate_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_stream_job_spark.operators.dedup import _norm_text

    docs = load_table(spark, sf_dir, "documents")
    staged = docs.select("source", F.split(_norm_text(), " ").alias("ts"))
    # guard: Spark's sequence(1, 0) DESCENDS instead of being empty, so
    # single-token documents must short-circuit to an empty array
    bg = staged.select(
        "source",
        F.explode(
            F.expr(
                "CASE WHEN size(ts) >= 2 THEN"
                " transform(sequence(1, size(ts) - 1),"
                " i -> struct(element_at(ts, i) AS w1,"
                " element_at(ts, i + 1) AS w2))"
                " ELSE CAST(array() AS array<struct<w1:string,w2:string>>)"
                " END"
            )
        ).alias("b"),
    ).select("source", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    c12 = bg.groupBy("source", "w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    c1 = c12.groupBy("source", "w1").agg(F.sum("c").cast("long").alias("c1"))
    w12 = _attach_iln(spark, c12, "c", "iln_c12")
    w1t = _attach_iln(spark, c1, "c1", "iln_c1").select(
        "source", "w1", "iln_c1"
    )
    agg = (
        w12.join(w1t, ["source", "w1"])
        .groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            F.count(F.lit(1)).cast("long").alias("vocab_bigrams"),
            F.sum(F.col("c") * (F.col("iln_c1") - F.col("iln_c12")))
            .cast("long")
            .alias("hs"),
        )
    )
    return agg.select(
        "source",
        "n_bigrams",
        "vocab_bigrams",
        idiv(
            F.col("hs") * 2 + F.col("n_bigrams"), F.col("n_bigrams") * 2
        ).alias("entropy_rate_unats"),
    )


# ---------------------------------------------------------------------------
# KENDALL RANK CORRELATION — do two document orderings agree? τ_a over a
# CONSTANT-SIZE probe set (first KENDALL_N doc_ids — the N_QUERIES
# convention, so the pair expansion is 4,950 rows at ANY corpus scale,
# never data-sized) between the length ranking and the distinct-token
# ranking, with exact integer concordant/discordant/tie counts. The
# generic ranking-eval primitive behind tokenizer/quality A-B
# comparisons.
# ---------------------------------------------------------------------------
KENDALL_N = 100


@register(
    "rank_correlation_kendall",
    oracle=f"""
        WITH m AS (
            SELECT doc_id,
                   CAST(LENGTH(text) AS BIGINT) AS x,
                   CAST(len(list_distinct(string_split({_BL_NORM_SQL}, ' ')))
                        AS BIGINT) AS y
            FROM documents WHERE doc_id < {KENDALL_N}
        ),
        pairs AS (
            SELECT (a.x - b.x) AS dx, (a.y - b.y) AS dy
            FROM m a JOIN m b ON a.doc_id < b.doc_id
        ),
        cnt AS (
            SELECT
                CAST(SUM(CASE WHEN dx * dy > 0 THEN 1 ELSE 0 END) AS BIGINT)
                    AS concordant,
                CAST(SUM(CASE WHEN dx * dy < 0 THEN 1 ELSE 0 END) AS BIGINT)
                    AS discordant,
                CAST(SUM(CASE WHEN dx * dy = 0 THEN 1 ELSE 0 END) AS BIGINT)
                    AS ties,
                CAST(COUNT(*) AS BIGINT) AS n_pairs
            FROM pairs
        )
        SELECT concordant, discordant, ties, n_pairs,
               CAST(ROUND((CAST(concordant AS DOUBLE)
                           - CAST(discordant AS DOUBLE))
                          / CAST(n_pairs AS DOUBLE) * 1000000.0) AS BIGINT)
                   AS tau_micro
        FROM cnt
    """,
    tags=("text", "stats", "rank-correlation", "documents"),
)
def rank_correlation_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_stream_job_spark.operators.dedup import _norm_text

    docs = load_table(spark, sf_dir, "documents")
    m = docs.filter(F.col("doc_id") < KENDALL_N).select(
        "doc_id",
        F.length("text").cast("long").alias("x"),
        F.size(F.array_distinct(F.split(_norm_text(), " ")))
        .cast("long")
        .alias("y"),
    )
    a = m.select(
        F.col("doc_id").alias("a_id"), F.col("x").alias("ax"), F.col("y").alias("ay")
    )
    b = m.select(
        F.col("doc_id").alias("b_id"), F.col("x").alias("bx"), F.col("y").alias("by")
    )
    pairs = a.join(F.broadcast(b), F.col("a_id") < F.col("b_id")).select(
        (F.col("ax") - F.col("bx")).alias("dx"),
        (F.col("ay") - F.col("by")).alias("dy"),
    )
    cnt = pairs.agg(
        F.sum(F.when(F.col("dx") * F.col("dy") > 0, 1).otherwise(0))
        .cast("long")
        .alias("concordant"),
        F.sum(F.when(F.col("dx") * F.col("dy") < 0, 1).otherwise(0))
        .cast("long")
        .alias("discordant"),
        F.sum(F.when(F.col("dx") * F.col("dy") == 0, 1).otherwise(0))
        .cast("long")
        .alias("ties"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
    )
    return cnt.select(
        "concordant",
        "discordant",
        "ties",
        "n_pairs",
        F.round(
            (F.col("concordant").cast("double") - F.col("discordant").cast("double"))
            / F.col("n_pairs").cast("double")
            * 1000000.0,
            0,
        )
        .cast("long")
        .alias("tau_micro"),
    )


# ---------------------------------------------------------------------------
# FANO BURSTINESS — variance-to-mean ratio of per-document token counts
# per source: the dispersion statistic separating uniform template
# output (Fano « 1) from bursty mixed scrapes (Fano » 1). The ratio is
# var/mean = (n·Σk² − (Σk)²) / (n·Σk) — a single rational of exact
# int64 moments, rounded once; one constant-width aggregate per source.
# ---------------------------------------------------------------------------
@register(
    "text_fano_burstiness",
    oracle=r"""
        WITH k AS (
            SELECT source,
                   CAST(len(string_split_regex(TRIM(text), '\s+')) AS BIGINT)
                       AS k
            FROM documents
        ),
        mo AS (
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(k) AS BIGINT) AS s,
                   CAST(SUM(k * k) AS BIGINT) AS ss
            FROM k GROUP BY 1
        )
        SELECT source, n, s AS total_tokens,
               CAST(ROUND(
                   (CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
                    - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                   / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))
                   * 1000000.0) AS BIGINT) AS fano_micro
        FROM mo
    """,
    tags=("text", "stats", "burstiness", "documents"),
)
def text_fano_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    k = docs.select(
        "source",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("k"),
    )
    mo = k.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("k").cast("long").alias("s"),
        F.sum(F.col("k") * F.col("k")).cast("long").alias("ss"),
    )
    nd, sd = F.col("n").cast("double"), F.col("s").cast("double")
    return mo.select(
        "source",
        "n",
        F.col("s").alias("total_tokens"),
        F.round(
            (nd * F.col("ss").cast("double") - sd * sd) / (nd * sd) * 1000000.0,
            0,
        )
        .cast("long")
        .alias("fano_micro"),
    )


# ---------------------------------------------------------------------------
# CHARACTER-LEVEL ENTROPY — per-language Shannon entropy of the
# character distribution in ILN micro-nats (zero libm): the
# encoding-health cousin of the token-level statistics (mojibake and
# wrong-charset ingestion move character entropy before they move any
# token metric). One explode → bounded (lang × alphabet) aggregate.
# ---------------------------------------------------------------------------
@register(
    "text_char_entropy",
    oracle=f"""
        WITH ch AS (
            SELECT lang, unnest(string_split(text, '')) AS c
            FROM documents WHERE length(text) > 0
        ),
        cc AS (
            SELECT lang, c, CAST(COUNT(*) AS BIGINT) AS k
            FROM ch GROUP BY 1, 2
        ),
        tot AS (
            SELECT lang, CAST(SUM(k) AS BIGINT) AS n,
                   CAST(COUNT(*) AS BIGINT) AS alphabet_size
            FROM cc GROUP BY 1
        ),
        ilntab(e, lo, hi, sdiv, smul, eln) AS (VALUES {_ILN_VALUES_SQL}),
        cw AS (
            SELECT x.lang,
                   CAST(SUM(x.k * (t.eln
                       + {_iln_frac_sql('((x.k // t.sdiv) * t.smul)')}))
                       AS BIGINT) AS sum_k_iln
            FROM cc x JOIN ilntab t ON x.k >= t.lo AND x.k <= t.hi
            GROUP BY 1
        ),
        nw AS (
            SELECT x.lang, x.n, x.alphabet_size,
                   x.n * (t.eln
                       + {_iln_frac_sql('((x.n // t.sdiv) * t.smul)')})
                       AS n_iln_n
            FROM tot x JOIN ilntab t ON x.n >= t.lo AND x.n <= t.hi
        )
        SELECT w.lang, w.n AS n_chars, w.alphabet_size,
               CAST((2 * (w.n_iln_n - c.sum_k_iln) + w.n) // (2 * w.n)
                    AS BIGINT) AS entropy_unats
        FROM nw w JOIN cw c ON c.lang = w.lang
    """,
    tags=("text", "entropy", "encoding", "documents"),
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    ch = docs.select(
        "lang", F.explode(F.split(F.col("text"), "")).alias("c")
    ).filter(F.col("c") != "")  # Spark's split('') yields no trailing empty
    cc = ch.groupBy("lang", "c").agg(F.count(F.lit(1)).cast("long").alias("k"))
    tot = cc.groupBy("lang").agg(
        F.sum("k").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("alphabet_size"),
    )
    cw = (
        _attach_iln(spark, cc, "k", "iln_k")
        .groupBy("lang")
        .agg(F.sum(F.col("k") * F.col("iln_k")).cast("long").alias("sum_k_iln"))
    )
    nw = _attach_iln(spark, tot, "n", "iln_n").select(
        "lang",
        "n",
        "alphabet_size",
        (F.col("n") * F.col("iln_n")).alias("n_iln_n"),
    )
    return nw.join(cw, "lang").select(
        "lang",
        F.col("n").alias("n_chars"),
        "alphabet_size",
        idiv(
            (F.col("n_iln_n") - F.col("sum_k_iln")) * 2 + F.col("n"),
            F.col("n") * 2,
        ).alias("entropy_unats"),
    )


# ---------------------------------------------------------------------------
# TOKEN DF DRIFT BETWEEN HALVES — which vocabulary moved? Document
# frequency shares per token in the even-doc_id half vs the odd half
# (exact integer counts, micro-unit shares over each half's doc count),
# top-20 movers by absolute share delta with an exact integer ranking
# key (|n_a·D_b − n_b·D_a| — cross-multiplied, division-free). The
# corpus-drift companion of corpus_js_divergence at token granularity.
# ---------------------------------------------------------------------------
DF_DRIFT_TOP = 20
DF_DRIFT_MIN_DF = 5


@register(
    "token_df_drift_halves",
    oracle=f"""
        WITH dt AS (
            SELECT DISTINCT doc_id, doc_id % 2 AS half,
                   unnest(string_split({_BL_NORM_SQL}, ' ')) AS token
            FROM documents
        ),
        halves AS (
            SELECT CAST(COUNT(DISTINCT CASE WHEN doc_id % 2 = 0
                                            THEN doc_id END) AS BIGINT) AS d_a,
                   CAST(COUNT(DISTINCT CASE WHEN doc_id % 2 = 1
                                            THEN doc_id END) AS BIGINT) AS d_b
            FROM documents
        ),
        df AS (
            SELECT token,
                   CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_a,
                   CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_b
            FROM dt GROUP BY 1
            HAVING COUNT(*) >= {DF_DRIFT_MIN_DF}
        )
        SELECT token, n_a, n_b,
               CAST(ROUND((CAST(n_a AS DOUBLE) / h.d_a
                           - CAST(n_b AS DOUBLE) / h.d_b)
                          * 1000000.0) AS BIGINT) AS share_delta_micro
        FROM df, halves h
        ORDER BY abs(n_a * h.d_b - n_b * h.d_a) DESC, token
        LIMIT {DF_DRIFT_TOP}
    """,
    tags=("text", "drift", "vocabulary", "documents"),
)
def token_df_drift_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_stream_job_spark.operators.dedup import _norm_text

    docs = load_table(spark, sf_dir, "documents")
    dt = docs.select(
        "doc_id",
        (F.col("doc_id") % 2).alias("half"),
        F.explode(F.array_distinct(F.split(_norm_text(), " "))).alias("token"),
    )
    halves = docs.agg(
        F.countDistinct(F.when(F.col("doc_id") % 2 == 0, F.col("doc_id")))
        .cast("long")
        .alias("d_a"),
        F.countDistinct(F.when(F.col("doc_id") % 2 == 1, F.col("doc_id")))
        .cast("long")
        .alias("d_b"),
    )
    df = (
        dt.groupBy("token")
        .agg(
            F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
            .cast("long")
            .alias("n_a"),
            F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_b"),
            F.count(F.lit(1)).alias("_df"),
        )
        .filter(F.col("_df") >= DF_DRIFT_MIN_DF)
    )
    key = F.abs(
        F.col("n_a") * F.col("d_b") - F.col("n_b") * F.col("d_a")
    )
    return (
        df.crossJoin(F.broadcast(halves))
        .select(
            "token",
            "n_a",
            "n_b",
            F.round(
                (
                    F.col("n_a").cast("double") / F.col("d_a")
                    - F.col("n_b").cast("double") / F.col("d_b")
                )
                * 1000000.0,
                0,
            )
            .cast("long")
            .alias("share_delta_micro"),
            key.alias("_key"),
        )
        .orderBy(F.desc("_key"), "token")
        .limit(DF_DRIFT_TOP)
        .drop("_key")
    )


# ---------------------------------------------------------------------------
# SPEARMAN RANK CORRELATION — the monotonic-association companion of
# rank_correlation_kendall (τ, probe-set) at FULL corpus scale: ρ is
# Pearson over DOUBLED MIDRANKS (the Mann-Whitney tie discipline — every
# rank is an exact integer even under ties), with both variables' rank
# tables built from value-grouped counts + the distributed prefix-sum
# primitive, never a per-row global sort. Variables: document length vs
# integer-micro type-token ratio.
# ---------------------------------------------------------------------------
_SPEARMAN_ORACLE = r"""
    WITH m AS (
        SELECT doc_id,
               CAST(LENGTH(text) AS BIGINT) AS x,
               CAST(len(list_distinct(string_split_regex(LOWER(TRIM(text)),
                        '\s+'))) * 1000000
                    // len(string_split_regex(TRIM(text), '\s+')) AS BIGINT)
                   AS y
        FROM documents
    ),
    gx AS (
        SELECT x, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(COUNT(*)) OVER (ORDER BY x) AS BIGINT) AS run
        FROM m GROUP BY x
    ),
    rx AS (
        SELECT m.doc_id, 2 * (g.run - g.n) + g.n + 1 AS r2x
        FROM m JOIN gx g ON g.x = m.x
    ),
    gy AS (
        SELECT y, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(COUNT(*)) OVER (ORDER BY y) AS BIGINT) AS run
        FROM m GROUP BY y
    ),
    ry AS (
        SELECT m.doc_id, 2 * (g.run - g.n) + g.n + 1 AS r2y
        FROM m JOIN gy g ON g.y = m.y
    ),
    mo AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(rx.r2x) AS BIGINT) AS sx,
               CAST(SUM(ry.r2y) AS BIGINT) AS sy,
               CAST(SUM(rx.r2x * rx.r2x) AS BIGINT) AS sxx,
               CAST(SUM(ry.r2y * ry.r2y) AS BIGINT) AS syy,
               CAST(SUM(rx.r2x * ry.r2y) AS BIGINT) AS sxy
        FROM rx JOIN ry ON ry.doc_id = rx.doc_id
    )
    SELECT n,
           CAST(ROUND(
               (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
               * 1000000.0) AS BIGINT) AS rho_micro
    FROM mo
"""


@register(
    "spearman_len_vs_ttr",
    oracle=_SPEARMAN_ORACLE,
    tags=("text", "stats", "rank-correlation", "distributed-rank", "documents"),
    bench_ext=True,
)
def spearman_len_vs_ttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    uniq = F.array_distinct(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
    m = docs.select(
        "doc_id",
        F.length("text").cast("long").alias("x"),
        idiv(F.size(uniq).cast("long") * 1000000, F.size(toks).cast("long")).alias(
            "y"
        ),
    ).localCheckpoint(eager=False)  # both rank branches read it

    def ranked(col: str, out: str) -> DataFrame:
        # The rank tables are VALUE-GROUPED (one row per distinct value)
        # with bounded domains: x is a document length and y is an
        # integer micro-ratio in [0, 1e6] — so the running count is a
        # plain cumulative window over metadata-sized grouped rows, the
        # events_quantile_uplift discipline (r12). The former
        # distributed_prefix_sum call paid a range exchange + a
        # localCheckpoint (~0.35 s of driver-side eager planning per
        # call) to avoid a global sort that this domain size never
        # needs (guide §1.2: don't pay the general primitive where the
        # bounded-domain identity is exact).
        g = m.groupBy(col).agg(F.count(F.lit(1)).cast("long").alias("n"))
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, 0)
        g = g.withColumn("run", F.sum("n").over(w))
        return m.select("doc_id", col).join(g, col).select(
            "doc_id",
            (2 * (F.col("run") - F.col("n")) + F.col("n") + 1).alias(out),
        )

    rx = ranked("x", "r2x")
    ry = ranked("y", "r2y")
    mo = rx.join(ry, "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("r2x").cast("long").alias("sx"),
        F.sum("r2y").cast("long").alias("sy"),
        F.sum(F.col("r2x") * F.col("r2x")).cast("long").alias("sxx"),
        F.sum(F.col("r2y") * F.col("r2y")).cast("long").alias("syy"),
        F.sum(F.col("r2x") * F.col("r2y")).cast("long").alias("sxy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col(
        "sy"
    ).cast("double")
    den = F.sqrt(
        nd * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    ) * F.sqrt(
        nd * F.col("syy").cast("double")
        - F.col("sy").cast("double") * F.col("sy").cast("double")
    )
    return mo.select(
        "n", F.round(num / den * 1000000.0, 0).cast("long").alias("rho_micro")
    )


# ---------------------------------------------------------------------------
# UNIGRAM-LM TOKENIZER FIT — sentencepiece-style unigram tokenizer
# training re-expressed as bounded-domain relational algebra, the piece
# inventory BPE cannot produce (BPE greedily merges; unigram fits a
# piece LM and SEGMENTS, so "interesting" can become inter+est+ing in
# one step). Hard-EM (Viterbi) with everything deterministic and
# integer:
#   - words are normalized whitespace tokens, chunked into consecutive
#     UNI_BLOCK-char blocks (first UNI_MAX_TOK chars; a 100 TB corpus
#     has unbounded token lengths — the chunking bounds the
#     segmentation domain without dropping data);
#   - candidate pieces = every 1..UNI_PIECE_MAX-char substring of any
#     block, initial counts = occurrence counts (the standard unigram
#     seed vocabulary);
#   - the E-step ENUMERATES all segmentations: a length-L block has
#     compositions-of-L-into-parts<=UNI_PIECE_MAX segmentations
#     (<=108 for L=8), precomputed ONCE in Python as _UNI_SPINE and
#     embedded verbatim in BOTH engines (the _JL_PLANES lesson: one
#     definition, two engines) — no recursive DP, just a bounded-domain
#     join, and it runs over DISTINCT blocks weighted by count, so the
#     Zipf head costs one row no matter how often the word repeats;
#   - piece log-probs are integer micro-nats (ROUND(ln(p)*1e6) — the
#     bigram_lm_score idiom), the Viterbi argmax is an integer-sum
#     ORDER BY score DESC, mask ASC — bit-stable on any engine;
#   - two EM rounds: seed counts -> Viterbi -> re-estimated (add-1
#     smoothed over the seed vocabulary) -> Viterbi -> final counts.
# tokenizer_unigram_fit reports the UNI_TOPN head of the fitted
# vocabulary; tokenizer_unigram_fertility applies the SAME fitted
# segmentation back to the corpus and reports per-lang fertility
# (pieces per token) — the under-served-language signal a tokenizer
# rollout is judged on. Both engines share the CTE chain verbatim via
# _uni_cte_chain().
# ---------------------------------------------------------------------------
UNI_BLOCK = 8       # segmentation block width (chars)
UNI_PIECE_MAX = 4   # longest candidate piece
UNI_MAX_TOK = 64    # chars of a token that contribute blocks
UNI_TOPN = 20


def _uni_spine() -> list[tuple[int, int, int, int]]:
    """(block_len, mask, start, seg_len) rows enumerating every
    segmentation of a 1..UNI_BLOCK-char block into pieces of length
    <= UNI_PIECE_MAX. mask bit k set = cut after char k+1; the mask is
    the deterministic tie-break identity of a segmentation."""
    rows = []
    for blen in range(1, UNI_BLOCK + 1):
        for mask in range(1 << (blen - 1)):
            segs = []
            prev = 0
            ok = True
            for pos in range(1, blen + 1):
                if pos == blen or (mask >> (pos - 1)) & 1:
                    slen = pos - prev
                    if slen > UNI_PIECE_MAX:
                        ok = False
                        break
                    segs.append((prev + 1, slen))
                    prev = pos
            if ok:
                rows.extend((blen, mask, s, l) for s, l in segs)
    return rows


_UNI_SPINE = _uni_spine()


def _uni_cte_chain(key: str = "lang") -> str:
    """The shared CTE chain: normalized tokens -> per-(key, block)
    counts -> seed vocabulary -> two Viterbi-EM rounds -> best2 (the
    converged per-block segmentation choice). The unigram oracles
    append their own report on top of this verbatim prefix; ``key`` is
    the grouping column the report slices by (lang for fit/fertility,
    source for the compression report) — the fit itself is key-blind,
    since bcnt aggregates the key away."""
    spine_vals = ", ".join(
        f"({b}, {m}, {s}, {l})" for b, m, s, l in _UNI_SPINE
    )
    kmax = UNI_MAX_TOK // UNI_BLOCK - 1
    k_vals = ", ".join(f"({k})" for k in range(kmax + 1))
    i_vals = ", ".join(f"({i})" for i in range(1, UNI_BLOCK + 1))
    l_vals = ", ".join(f"({l})" for l in range(1, UNI_PIECE_MAX + 1))
    return f"""
        toks AS (
            SELECT {key},
                   unnest(string_split({_BL_NORM_SQL}, ' ')) AS tok
            FROM documents
        ),
        kspine(k) AS (VALUES {k_vals}),
        blc AS MATERIALIZED (
            SELECT {key}, block, CAST(COUNT(*) AS BIGINT) AS c FROM (
                SELECT {key},
                       substr(tok, k * {UNI_BLOCK} + 1, {UNI_BLOCK}) AS block
                FROM toks JOIN kspine
                  ON k * {UNI_BLOCK} < least(length(tok), {UNI_MAX_TOK})
                WHERE tok <> ''
            ) GROUP BY 1, 2
        ),
        bcnt AS MATERIALIZED (
            SELECT block, CAST(SUM(c) AS BIGINT) AS c FROM blc GROUP BY 1
        ),
        ispine(i) AS (VALUES {i_vals}),
        lspine(l) AS (VALUES {l_vals}),
        cands AS MATERIALIZED (
            SELECT substr(block, i, l) AS piece,
                   CAST(SUM(c) AS BIGINT) AS cnt0
            FROM bcnt
            JOIN ispine ON i <= length(block)
            JOIN lspine ON l <= least({UNI_PIECE_MAX}, length(block) - i + 1)
            GROUP BY 1
        ),
        tot0 AS (SELECT CAST(SUM(cnt0) AS BIGINT) AS t FROM cands),
        v0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM cands),
        cost0 AS MATERIALIZED (
            SELECT piece,
                   CAST(ROUND(ln(cnt0 * 1.0 / t) * 1000000.0) AS BIGINT)
                       AS lp
            FROM cands, tot0
        ),
        spine(blen, mask, start, slen) AS (VALUES {spine_vals}),
        seg1 AS (
            SELECT b.block, s.mask,
                   CAST(SUM(c0.lp) AS BIGINT) AS score
            FROM bcnt b
            JOIN spine s ON s.blen = length(b.block)
            JOIN cost0 c0 ON c0.piece = substr(b.block, s.start, s.slen)
            GROUP BY 1, 2
        ),
        best1 AS MATERIALIZED (
            SELECT block, mask FROM (
                SELECT block, mask,
                       ROW_NUMBER() OVER (
                           PARTITION BY block
                           ORDER BY score DESC, mask) AS rn
                FROM seg1
            ) WHERE rn = 1
        ),
        cnt1 AS MATERIALIZED (
            SELECT substr(b.block, s.start, s.slen) AS piece,
                   CAST(SUM(b.c) AS BIGINT) AS cnt
            FROM bcnt b
            JOIN best1 w ON w.block = b.block
            JOIN spine s ON s.blen = length(b.block) AND s.mask = w.mask
            GROUP BY 1
        ),
        tot1 AS (SELECT CAST(SUM(cnt) AS BIGINT) AS t FROM cnt1),
        cost1 AS MATERIALIZED (
            SELECT ca.piece,
                   CAST(ROUND(ln((COALESCE(c1.cnt, 0) + 1) * 1.0 / (t + v))
                              * 1000000.0) AS BIGINT) AS lp
            FROM cands ca LEFT JOIN cnt1 c1 ON c1.piece = ca.piece,
                 tot1, v0
        ),
        seg2 AS (
            SELECT b.block, s.mask,
                   CAST(SUM(c1.lp) AS BIGINT) AS score
            FROM bcnt b
            JOIN spine s ON s.blen = length(b.block)
            JOIN cost1 c1 ON c1.piece = substr(b.block, s.start, s.slen)
            GROUP BY 1, 2
        ),
        best2 AS MATERIALIZED (
            SELECT block, mask FROM (
                SELECT block, mask,
                       ROW_NUMBER() OVER (
                           PARTITION BY block
                           ORDER BY score DESC, mask) AS rn
                FROM seg2
            ) WHERE rn = 1
        )"""


def _unigram_fit_oracle() -> str:
    return f"""
        WITH {_uni_cte_chain()},
        cnt2 AS MATERIALIZED (
            SELECT substr(b.block, s.start, s.slen) AS piece,
                   CAST(SUM(b.c) AS BIGINT) AS n_uses
            FROM bcnt b
            JOIN best2 w ON w.block = b.block
            JOIN spine s ON s.blen = length(b.block) AND s.mask = w.mask
            GROUP BY 1
        ),
        tot2 AS (SELECT CAST(SUM(n_uses) AS BIGINT) AS t FROM cnt2)
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_uses DESC, piece)
                    AS BIGINT) AS rank,
               piece,
               CAST(length(piece) AS BIGINT) AS piece_len,
               n_uses,
               CAST(ROUND(ln((n_uses + 1) * 1.0 / (t + v)) * 1000000.0)
                    AS BIGINT) AS lp_micro
        FROM cnt2, tot2, v0
        ORDER BY n_uses DESC, piece
        LIMIT {UNI_TOPN}
    """


def _unigram_fertility_oracle() -> str:
    return f"""
        WITH {_uni_cte_chain()},
        ppb AS (
            SELECT w.block, CAST(COUNT(*) AS BIGINT) AS np
            FROM best2 w
            JOIN spine s ON s.blen = length(w.block) AND s.mask = w.mask
            GROUP BY 1
        ),
        langtok AS (
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_tokens
            FROM toks WHERE tok <> '' GROUP BY 1
        ),
        langpieces AS (
            SELECT b.lang,
                   CAST(SUM(b.c) AS BIGINT) AS n_blocks,
                   CAST(SUM(b.c * p.np) AS BIGINT) AS n_pieces
            FROM blc b JOIN ppb p ON p.block = b.block
            GROUP BY 1
        )
        SELECT t.lang, t.n_tokens, g.n_blocks, g.n_pieces,
               (g.n_pieces * 2 * 10000 + t.n_tokens)
                   // (2 * t.n_tokens) AS fertility_bp
        FROM langtok t JOIN langpieces g ON g.lang = t.lang
    """


def _uni_spine_df(spark: SparkSession) -> DataFrame:
    return jvm_values_df(
        spark, _UNI_SPINE, "blen int, mask long, start int, slen int"
    )


def _uni_blc(
    spark: SparkSession, sf_dir: str, key: str = "lang"
) -> DataFrame:
    """(key, block, c, c_tok): per-key distinct-block counts — the
    Zipf-head compression every downstream stage rides on. c_tok counts
    only k=0 blocks, which are 1:1 with tokens, so the per-key token
    total folds into the SAME aggregation instead of a second documents
    scan (the streaming twin's trick, now shared by the batch path)."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
    toks = docs.select(
        key, F.explode(F.split(norm, " ")).alias("tok")
    ).filter(F.col("tok") != "")
    n_blocks = (F.least(F.length("tok"), F.lit(UNI_MAX_TOK)) - 1) / UNI_BLOCK
    return (
        toks.select(
            key,
            F.explode(F.sequence(F.lit(0), n_blocks.cast("int"))).alias("k"),
            "tok",
        )
        .select(
            key,
            "k",
            F.col("tok")
            .substr(F.col("k") * UNI_BLOCK + 1, F.lit(UNI_BLOCK))
            .alias("block"),
        )
        .groupBy(key, "block")
        .agg(
            F.count(F.lit(1)).cast("long").alias("c"),
            F.sum(F.when(F.col("k") == 0, 1).otherwise(0))
            .cast("long")
            .alias("c_tok"),
        )
    )


def _uni_best2(
    spark: SparkSession, bcnt: DataFrame, spine: DataFrame
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Two Viterbi-EM rounds over the distinct blocks; returns
    (cands, v0, best2)."""
    from pyspark.sql import Window

    cands = (
        bcnt.select(
            "block",
            "c",
            F.explode(F.sequence(F.lit(1), F.length("block"))).alias("i"),
        )
        .select(
            "block",
            "c",
            "i",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.least(
                        F.lit(UNI_PIECE_MAX),
                        F.length("block") - F.col("i") + 1,
                    ),
                )
            ).alias("l"),
        )
        .select(
            F.col("block").substr(F.col("i"), F.col("l")).alias("piece"), "c"
        )
        .groupBy("piece")
        .agg(F.sum("c").cast("long").alias("cnt0"))
    )
    tot0 = cands.agg(F.sum("cnt0").cast("long").alias("t"))
    v0 = cands.agg(F.count(F.lit(1)).cast("long").alias("v"))
    cost0 = cands.crossJoin(F.broadcast(tot0)).select(
        "piece",
        F.round(F.log(F.col("cnt0") * 1.0 / F.col("t")) * 1000000.0, 0)
        .cast("long")
        .alias("lp"),
    )

    def viterbi_best(cost: DataFrame) -> DataFrame:
        parts = bcnt.join(
            F.broadcast(spine), F.length("block") == F.col("blen")
        ).select(
            "block",
            "c",
            "mask",
            F.col("block").substr(F.col("start"), F.col("slen")).alias(
                "piece"
            ),
        )
        seg = (
            parts.join(cost, "piece")
            .groupBy("block", "mask")
            .agg(
                F.sum("lp").cast("long").alias("score"),
                F.first("c").alias("c"),
            )
        )
        w = Window.partitionBy("block").orderBy(
            F.col("score").desc(), F.col("mask").asc()
        )
        return (
            seg.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("block", "mask", "c")
        )

    def recount(best: DataFrame) -> DataFrame:
        sp = spine.withColumnRenamed("mask", "s_mask")
        return (
            best.join(
                F.broadcast(sp),
                (F.length("block") == F.col("blen"))
                & (F.col("mask") == F.col("s_mask")),
            )
            .select(
                F.col("block").substr(F.col("start"), F.col("slen")).alias(
                    "piece"
                ),
                "c",
            )
            .groupBy("piece")
            .agg(F.sum("c").cast("long").alias("cnt"))
        )

    cnt1 = recount(viterbi_best(cost0))
    tot1 = cnt1.agg(F.sum("cnt").cast("long").alias("t"))
    cost1 = (
        cands.join(cnt1, "piece", "left")
        .crossJoin(F.broadcast(tot1))
        .crossJoin(F.broadcast(v0))
        .select(
            "piece",
            F.round(
                F.log(
                    (F.coalesce(F.col("cnt"), F.lit(0)) + 1)
                    * 1.0
                    / (F.col("t") + F.col("v"))
                )
                * 1000000.0,
                0,
            )
            .cast("long")
            .alias("lp"),
        )
    )
    best2 = viterbi_best(cost1)
    return cands, v0, best2


@register(
    "tokenizer_unigram_fit",
    oracle=_unigram_fit_oracle(),
    tags=("text", "tokenizer", "unigram", "em", "documents"),
)
def tokenizer_unigram_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    blc = _uni_blc(spark, sf_dir)
    bcnt = blc.groupBy("block").agg(F.sum("c").cast("long").alias("c"))
    spine = _uni_spine_df(spark)
    cands, v0, best2 = _uni_best2(spark, bcnt, spine)
    sp = spine.withColumnRenamed("mask", "s_mask")
    cnt2 = (
        best2.join(
            F.broadcast(sp),
            (F.length("block") == F.col("blen"))
            & (F.col("mask") == F.col("s_mask")),
        )
        .select(
            F.col("block").substr(F.col("start"), F.col("slen")).alias(
                "piece"
            ),
            "c",
        )
        .groupBy("piece")
        .agg(F.sum("c").cast("long").alias("n_uses"))
    )
    tot2 = cnt2.agg(F.sum("n_uses").cast("long").alias("t"))
    top = (
        cnt2.orderBy(F.col("n_uses").desc(), F.col("piece").asc())
        .limit(UNI_TOPN)
        .crossJoin(F.broadcast(tot2))
        .crossJoin(F.broadcast(v0))
    )
    w_rank = Window.orderBy(F.col("n_uses").desc(), F.col("piece").asc())
    return top.select(
        F.row_number().over(w_rank).cast("long").alias("rank"),
        "piece",
        F.length("piece").cast("long").alias("piece_len"),
        "n_uses",
        F.round(
            F.log((F.col("n_uses") + 1) * 1.0 / (F.col("t") + F.col("v")))
            * 1000000.0,
            0,
        )
        .cast("long")
        .alias("lp_micro"),
    )


@register(
    "tokenizer_unigram_fertility",
    oracle=_unigram_fertility_oracle(),
    tags=("text", "tokenizer", "unigram", "fertility", "documents"),
)
def tokenizer_unigram_fertility(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    blc = _uni_blc(spark, sf_dir)
    bcnt = blc.groupBy("block").agg(F.sum("c").cast("long").alias("c"))
    spine = _uni_spine_df(spark)
    _cands, _v0, best2 = _uni_best2(spark, bcnt, spine)
    sp = spine.withColumnRenamed("mask", "s_mask")
    ppb = (
        best2.join(
            F.broadcast(sp),
            (F.length("block") == F.col("blen"))
            & (F.col("mask") == F.col("s_mask")),
        )
        .groupBy("block")
        .agg(F.count(F.lit(1)).cast("long").alias("np"))
    )
    # n_tokens per lang rides the SAME (lang, block) aggregation: k=0
    # blocks are 1:1 with tokens (c_tok), so no second documents scan.
    langtok = blc.groupBy("lang").agg(
        F.sum("c_tok").cast("long").alias("n_tokens")
    )
    langpieces = (
        blc.join(ppb, "block")
        .groupBy("lang")
        .agg(
            F.sum("c").cast("long").alias("n_blocks"),
            F.sum(F.col("c") * F.col("np")).cast("long").alias("n_pieces"),
        )
    )
    return langtok.join(langpieces, "lang").select(
        "lang",
        "n_tokens",
        "n_blocks",
        "n_pieces",
        idiv(
            F.col("n_pieces") * 2 * 10000 + F.col("n_tokens"),
            2 * F.col("n_tokens"),
        ).alias("fertility_bp"),
    )


def _unigram_compression_oracle() -> str:
    return f"""
        WITH {_uni_cte_chain("source")},
        ppb AS (
            SELECT w.block, CAST(COUNT(*) AS BIGINT) AS np
            FROM best2 w
            JOIN spine s ON s.blen = length(w.block) AND s.mask = w.mask
            GROUP BY 1
        ),
        srctok AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens
            FROM toks WHERE tok <> '' GROUP BY 1
        ),
        srcpieces AS (
            SELECT b.source,
                   CAST(SUM(b.c * length(b.block)) AS BIGINT) AS n_chars,
                   CAST(SUM(b.c * p.np) AS BIGINT) AS n_pieces
            FROM blc b JOIN ppb p ON p.block = b.block
            GROUP BY 1
        )
        SELECT t.source, t.n_tokens, g.n_chars, g.n_pieces,
               (g.n_chars * 2 * 1000 + g.n_pieces)
                   // (2 * g.n_pieces) AS chars_per_piece_milli
        FROM srctok t JOIN srcpieces g ON g.source = t.source
    """


@register(
    "tokenizer_unigram_compression",
    oracle=_unigram_compression_oracle(),
    tags=("text", "tokenizer", "unigram", "compression", "documents"),
)
def tokenizer_unigram_compression(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Chars-per-piece of the fitted unigram tokenizer, per SOURCE — the
    compression-rate curation signal: text the tokenizer segments into
    long pieces is 'familiar' relative to the corpus the vocabulary was
    fit on, and a source whose compression rate sags is drifting away
    from the training distribution (the perplexity intuition without an
    LM). Same fitted segmentation as tokenizer_unigram_fit; one extra
    per-source rollup over the already-aggregated (source, block)
    counts."""
    blc = _uni_blc(spark, sf_dir, key="source")
    bcnt = blc.groupBy("block").agg(F.sum("c").cast("long").alias("c"))
    spine = _uni_spine_df(spark)
    _cands, _v0, best2 = _uni_best2(spark, bcnt, spine)
    sp = spine.withColumnRenamed("mask", "s_mask")
    ppb = (
        best2.join(
            F.broadcast(sp),
            (F.length("block") == F.col("blen"))
            & (F.col("mask") == F.col("s_mask")),
        )
        .groupBy("block")
        .agg(F.count(F.lit(1)).cast("long").alias("np"))
    )
    srctok = blc.groupBy("source").agg(
        F.sum("c_tok").cast("long").alias("n_tokens")
    )
    srcpieces = (
        blc.join(ppb, "block")
        .groupBy("source")
        .agg(
            F.sum(F.col("c") * F.length("block"))
            .cast("long")
            .alias("n_chars"),
            F.sum(F.col("c") * F.col("np")).cast("long").alias("n_pieces"),
        )
    )
    return srctok.join(srcpieces, "source").select(
        "source",
        "n_tokens",
        "n_chars",
        "n_pieces",
        idiv(
            F.col("n_chars") * 2 * 1000 + F.col("n_pieces"),
            2 * F.col("n_pieces"),
        ).alias("chars_per_piece_milli"),
    )
