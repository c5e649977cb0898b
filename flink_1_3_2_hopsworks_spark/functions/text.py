"""Text-analysis functions for large-scale training-data pipelines.

Not in the reference (north-star extension, SURVEY.md §2.14): language-ID,
quality scoring, token counting, document fingerprinting over the
``documents`` table. Everything is built from JVM-side expressions
(whole-stage codegen) — no Python in the hot path — so these run at
100 TB scan speed.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# Tiny per-language stopword lists for the n-gram/stopword-ratio heuristic.
# Deliberately small: the point is a deterministic, cheap, JVM-side signal.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "a", "that", "for", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "del", "las"],
    "de": ["der", "die", "und", "das", "von", "zu", "den", "mit", "ist", "im"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "du", "est"],
}


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization → array<string> (empty array for blank text)."""
    col = F.col(text) if isinstance(text, str) else text
    trimmed = F.trim(col)
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(text: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """BPE-ish token estimate: count word pieces + digits + punctuation runs
    via a tokenizer-style regex. A deterministic stand-in for a real BPE
    vocab (which would be a broadcast lookup at scale)."""
    col = F.col(text) if isinstance(text, str) else text
    pieces = F.regexp_extract_all(col, F.lit(r"[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\s]"), 0)
    return F.size(pieces)


def char_count(text: Column | str) -> Column:
    return F.length(text)


# Explicit ASCII punctuation class — identical semantics under Java regex
# (Spark) and RE2 (DuckDB oracle), unlike \p{Punct} which differs.
PUNCT_CLASS = "[^.,;:!?()'\"-]"


def punct_ratio(text: Column | str) -> Column:
    """Fraction of characters that are punctuation."""
    col = F.col(text) if isinstance(text, str) else text
    stripped = F.regexp_replace(col, PUNCT_CLASS, "")
    return F.when(F.length(col) == 0, F.lit(0.0)).otherwise(
        F.length(stripped) / F.length(col)
    )


def stopword_ratio(text: Column | str, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of ``lang``."""
    toks = tokens(F.lower(text if isinstance(text, Column) else F.col(text)))
    hits = F.size(
        F.filter(toks, lambda t: t.isin(*STOPWORDS[lang]))
    )
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(hits / F.size(toks))


def avg_token_length(text: Column | str) -> Column:
    toks = tokens(text)
    total = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        total / F.size(toks)
    )


def quality_score(text: Column | str) -> Column:
    """Composite quality heuristic in [0, 1]: rewards reasonable length and
    word sizes, penalizes punctuation soup. Weights are arbitrary but fixed —
    the operator contract is determinism, not linguistics."""
    n_tok = token_count(text)
    length_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    awl = avg_token_length(text)
    word_score = F.when((awl >= 3.0) & (awl <= 8.0), 1.0).otherwise(0.5)
    punct_penalty = F.greatest(
        F.lit(0.0), F.lit(1.0) - punct_ratio(text) * 5.0
    )
    return F.round(
        0.4 * length_score + 0.3 * word_score + 0.3 * punct_penalty, 4
    )


def lang_id(text: Column | str) -> Column:
    """Heuristic language ID: CJK character ratio → zh, else the language
    with the highest stopword-hit count among en/es/de/fr (ties → 'und').

    Deterministic, expression-only. A production path would broadcast real
    n-gram profiles; the Spark-side shape (scan → expressions → label) is
    identical.
    """
    col = F.col(text) if isinstance(text, str) else text
    cjk = F.length(F.regexp_replace(col, r"[^一-鿿]", ""))
    toks = tokens(F.lower(col))

    def _hit_pred(words):
        # Closure factory: pyspark HOF lambdas are arity-inspected, so a
        # bound default arg would be mistaken for a second lambda parameter.
        return lambda t: t.isin(*words)

    hit_counts = [
        F.size(F.filter(toks, _hit_pred(STOPWORDS[lang]))).alias(lang)
        for lang in STOPWORDS
    ]
    hits = F.struct(*hit_counts)
    best = F.greatest(*[hits[lang] for lang in STOPWORDS])
    langs = list(STOPWORDS)
    pick = F.lit("und")
    # Reverse order so earlier languages win ties (first match kept last).
    for lang in reversed(langs):
        pick = F.when(hits[lang] == best, F.lit(lang)).otherwise(pick)
    return (
        F.when(F.length(col) == 0, F.lit("und"))
        .when(cjk / F.length(col) > 0.2, F.lit("zh"))
        .when(best == 0, F.lit("und"))
        .otherwise(pick)
    )


def fingerprint(text: Column | str) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.

    md5 (not Spark's xxhash) so any engine — including the DuckDB oracle —
    reproduces it byte-for-byte.
    """
    col = F.col(text) if isinstance(text, str) else text
    normalized = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.md5(normalized)


def tfidf_top_terms(df, id_col: str, text_col: str, k: int = 3):
    """Top-k TF-IDF terms per document — the standard keyword/feature
    extractor a training-data pipeline runs over a corpus.

    Fully relational: explode lowercase whitespace tokens → per-(doc, term)
    counts (tf) → per-term document frequency → smoothed idf
    ln((N+1)/(df+1)) + 1 → tf·idf → top-k per doc (ties broken by term).
    The corpus size N rides as a broadcast one-row cross join — no
    collect(), so the plan stays fully distributed. All arithmetic is
    integer-derived double ops, so any engine replays it bit-for-bit.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("term"),
    ).filter(F.col("term") != "")
    tf = toks.groupBy("_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("_n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf")
            * (
                F.log((F.col("_n") + F.lit(1.0)) / (F.col("_df") + F.lit(1.0)))
                + F.lit(1.0)
            ),
        )
    )
    w = Window.partitionBy("_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_id").alias(id_col),
            "term",
            "tf",
            F.round("tfidf", 4).alias("tfidf"),
            "rank",
        )
    )


def repetition_stats(df, id_col: str, text_col: str):
    """Gopher-style repetition metrics per document — the standard
    quality-filter signals for detecting boilerplate / degenerate text in a
    training corpus (Rae et al. 2021 §A1.1): duplicate-token fraction and
    the fraction of the document covered by its most frequent bigram.

    Output: ``(id_col, n_tokens, dup_token_ratio, top_bigram_ratio)``.
    All ratios are single divisions of exact integer counts, so any engine
    replays them bit-for-bit. One explode + two hash-aggregates; the window
    is per-document, never global.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    base = df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("_n_distinct"),
    )
    numeric_id = dict(df.dtypes).get(id_col) in (
        "bigint", "int", "smallint", "tinyint",
    )
    if numeric_id:
        # Arrow-batched NON-distinct bigram builder — the Catalyst HOF
        # formulation is interpreted per element and ~20x slower at corpus
        # scale (see dedup/ngram.py).
        import re

        import pandas as pd

        # Mirror engine semantics EXACTLY (see dedup/ngram.py:_gram_sets):
        # Catalyst TRIM strips ASCII space only; Java-regex \s is the ASCII
        # class [ \t\n\x0B\f\r]. Python's default .strip()/\s are
        # Unicode-aware and would tokenize edge-whitespace docs differently.
        ws = re.compile(r"[ \t\n\x0b\f\r]+")

        def build(batches):
            for pdf in batches:
                out = []
                for text in pdf[text_col]:
                    t = "" if text is None else text.strip(" ").lower()
                    tk = ws.split(t) if t else []
                    out.append(
                        [f"{tk[i]} {tk[i + 1]}" for i in range(len(tk) - 1)]
                        if len(tk) >= 2
                        else []
                    )
                yield pd.DataFrame({id_col: pdf[id_col], "_g": out})

        bigrams = (
            df.select(id_col, text_col)
            .mapInPandas(build, schema=f"{id_col} long, _g array<string>")
            .select(id_col, F.explode("_g").alias("gram"))
        )
    else:
        from flink_1_3_2_hopsworks_spark.dedup.contamination import word_ngrams

        bigrams = df.select(
            F.col(id_col), F.explode(word_ngrams(text_col, 2)).alias("gram")
        )
    top = (
        bigrams.groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(id_col)
        .agg(F.max("_c").alias("_top"), F.sum("_c").alias("_n_bigrams"))
    )
    return (
        base.join(top, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.round(
                (F.col("n_tokens") - F.col("_n_distinct")).cast("double")
                / F.col("n_tokens"),
                6,
            ).alias("dup_token_ratio"),
            F.coalesce(
                F.round(
                    F.col("_top").cast("double") / F.col("_n_bigrams"), 6
                ),
                F.lit(0.0),
            ).alias("top_bigram_ratio"),
        )
    )


def unigram_rarity(df, id_col: str, text_col: str):
    """Per-document mean corpus-unigram probability (parts-per-million) —
    the model-free perplexity proxy a pipeline uses to rank documents by
    lexical typicality (low ppm = rare vocabulary, high = common/boilerplate).

    The unigram LM is built from the corpus itself: p(w) = count(w)/total.
    Per doc: token_ppm = 1e6 · Σ count(tok) / (total · n_tokens). The sums
    are exact BIGINTs; the one double division + multiply is IEEE-determined,
    so any engine replays it bit-for-bit. The corpus total rides as a
    broadcast one-row cross join (the tfidf_top_terms pattern) — no collect.

    Scale note: the frequency join runs on PRE-AGGREGATED ``(_id, term,
    _c)`` doc-term counts, not the raw exploded token stream — the join
    input shrinks from total-tokens to distinct doc-terms, and the
    token-level skew on Zipfian hot terms (stopwords) collapses into one
    row per (doc, term) before any shuffle on ``term``. Σ count(tok) over
    tokens = Σ _c·count(term) over distinct doc-terms, exactly.
    """
    doc_terms = (
        df.select(
            F.col(id_col).alias("_id"),
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("_id", "term")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    freq = doc_terms.groupBy("term").agg(F.sum("_c").alias("_cnt"))
    total = doc_terms.agg(F.sum("_c").alias("_total"))
    per_doc = (
        doc_terms.join(freq, "term")
        .groupBy("_id")
        .agg(
            F.sum(F.col("_c") * F.col("_cnt")).alias("_s"),
            F.sum("_c").alias("n_tokens"),
        )
    )
    return per_doc.crossJoin(F.broadcast(total)).select(
        F.col("_id").alias(id_col),
        "n_tokens",
        F.round(
            F.col("_s").cast("double")
            / (F.col("_total").cast("double") * F.col("n_tokens"))
            * F.lit(1000000.0),
            4,
        ).alias("token_ppm"),
    )


def quality_quantile_filter(
    df,
    id_col: str,
    text_col: str,
    keep_quantile: float = 0.5,
    sample_fraction: float = 0.2,
    salt: str = "qq42",
):
    """Keep documents whose ``quality_score`` clears the corpus's
    ``keep_quantile`` threshold — the standard "drop the worst X%" curation
    step, SKETCH-DRIVEN: the threshold is an exact interpolated percentile
    over a deterministic salted-hash sample (``sample_fraction`` of docs,
    the operators/sketches.py draw — auditable: any engine replays the
    identical sample and threshold) and rides the plan as a broadcast
    one-row aggregate. No driver collect, no global sort, no second pass
    over the corpus: one scan scores, the sample filter is a codegen'd
    expression on that scan, and the verdict filter is a broadcast
    cross-join. Output: ``(id_col, quality, threshold)`` for kept docs.

    Empty-sample semantics (tiny corpus × small ``sample_fraction``): the
    percentile of zero rows is NULL, which is coalesced to -infinity —
    i.e. NO evidence means KEEP EVERYTHING (threshold column reads -inf),
    never the silent drop-all a NULL comparison would produce. Callers
    wanting an error instead should assert on the threshold column.
    """
    from flink_1_3_2_hopsworks_spark.operators.sketches import FULL_32, _h32

    scored = df.select(
        F.col(id_col), quality_score(text_col).alias("quality")
    )
    cut = int(sample_fraction * FULL_32)
    thr = (
        scored.filter(_h32([id_col], salt) < cut)
        .agg(
            F.coalesce(
                F.round(
                    F.expr(f"percentile(quality, {keep_quantile!r})"), 4
                ),
                F.lit(float("-inf")),
            ).alias("threshold")
        )
    )
    return (
        scored.crossJoin(F.broadcast(thr))
        .filter(F.col("quality") >= F.col("threshold"))
        .select(id_col, "quality", "threshold")
    )


# PII patterns kept to syntax valid AND equivalent in both Java regex
# (Spark) and RE2 (DuckDB oracle): no backreferences, no lookaround, fixed
# quantifiers — Java's leftmost-first and RE2's leftmost-longest semantics
# agree on these.
PII_PATTERNS = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
]


def redact_pii(text: Column | str) -> Column:
    """Mask emails, IPv4 addresses, and xxx-xxx-xxxx phone numbers — the
    baseline PII-scrub a training-data pipeline applies before anything
    else. Pure regexp_replace chain: codegen'd, scales with the scan."""
    out = F.col(text) if isinstance(text, str) else text
    for pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pack_sequences(
    df,
    id_col: str,
    text_col: str,
    budget_tokens: int,
    shard_cols: list[str] | None = None,
):
    """Greedy sequence packing (concat-then-chunk): documents in ``id_col``
    order are laid head-to-tail and cut into ``budget_tokens``-sized bins —
    bin_id = floor(tokens-before-this-doc / budget). The pre-tokenizer
    batching step of an LLM training pipeline.

    Pure integer window math, so any engine replays it exactly. Scale:
    a single global running sum would serialize into one task — pass
    ``shard_cols`` to pack per shard (each shard's window is independent;
    on a cluster each shard packs in parallel and bin ids are per-shard).
    Without ``shard_cols`` a RuntimeWarning is emitted (the other sharp
    edges in this repo are gated the same way); globally-ordered bins are
    occasionally what you want, so it warns rather than raises.
    """
    import warnings

    from pyspark.sql import Window

    if not shard_cols:
        warnings.warn(
            "pack_sequences without shard_cols uses a GLOBAL unpartitioned "
            "window: the running sum serializes into one task at scale. "
            "Pass shard_cols (e.g. ['lang'] or a hash bucket) to pack each "
            "shard in parallel.",
            RuntimeWarning,
            stacklevel=2,
        )
    n_tok = token_count(text_col).cast("long")
    shard = list(shard_cols or [])
    w = (
        Window.partitionBy(*shard).orderBy(id_col)
        if shard
        else Window.partitionBy().orderBy(id_col)
    )
    running_after = F.sum(n_tok).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.select(
        *shard,
        F.col(id_col),
        n_tok.alias("n_tokens"),
        F.floor((running_after - n_tok) / budget_tokens).alias("bin_id"),
    )


def normalize_unicode(col: Column | str, form: str = "NFC") -> Column:
    """Unicode-normalize a string column (default NFC — the canonical
    composition every serious text pipeline applies before hashing or
    deduplication, since 'café' spelled e+◌́ and é are different byte
    strings for the same text).

    Catalyst has no normalization expression, so this is the documented
    Arrow-batched slow path: a vectorized pandas_udf over
    ``unicodedata.normalize`` — one Python crossing per batch, scan-shaped
    (no shuffle), NULL-safe. DuckDB's ``nfc_normalize`` implements the
    same UAX#15 NFC, verified equivalent in tests, so gates over this
    column still hash-match a pure-SQL oracle.
    """
    import unicodedata

    from pyspark.sql.types import StringType

    @F.pandas_udf(StringType())
    def _norm(s):  # pandas Series[str] -> Series[str]
        return s.map(
            lambda x: None if x is None else unicodedata.normalize(form, x)
        )

    return _norm(F.col(col) if isinstance(col, str) else col)


def select_token_budget(
    df,
    id_col: str,
    text_col: str,
    budget_tokens: int,
    sample_fraction: float = 0.2,
    salt: str = "tb42",
):
    """"Best N tokens" curation: keep the highest-quality documents whose
    total token count fits a budget — the other axis of corpus curation
    from :func:`quality_quantile_filter` (that one keeps a doc FRACTION;
    training runs are sized in TOKENS).

    Scale shape — no global per-doc sort anywhere: quality scores are
    ROUNDED (4 decimals), so the deterministic salted-hash sample
    aggregates into at most ~10⁴ quality buckets (one hash-aggregate);
    the running token total over buckets is a window over that BOUNDED
    bucket table, and the resulting threshold (the lowest quality whose
    bucket still fits the sample-scaled budget — whole buckets, so the
    budget is met at quality granularity) rides as a broadcast one-row
    aggregate into a single filter pass over the corpus. Any engine
    replays sample, buckets, and threshold exactly. If even the best
    bucket overflows the scaled budget the threshold is NULL and nothing
    is kept (a budget smaller than the best bucket is a caller error).
    Output: ``(id_col, quality, n_tokens, threshold)`` for kept docs.
    """
    from pyspark.sql import Window

    from flink_1_3_2_hopsworks_spark.operators.sketches import FULL_32, _h32

    scored = df.select(
        F.col(id_col),
        quality_score(text_col).alias("quality"),
        token_count(text_col).cast("long").alias("n_tokens"),
    )
    cut = int(sample_fraction * FULL_32)
    buckets = (
        scored.filter(_h32([id_col], salt) < cut)
        .groupBy("quality")
        .agg(F.sum("n_tokens").alias("_btok"))
    )
    w = Window.orderBy(F.desc("quality")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    thr = (
        buckets.withColumn("_cum", F.sum("_btok").over(w))
        .filter(F.col("_cum") <= F.lit(float(budget_tokens) * sample_fraction))
        .agg(F.min("quality").alias("threshold"))
    )
    return (
        scored.crossJoin(F.broadcast(thr))
        .filter(F.col("quality") >= F.col("threshold"))
        .select(id_col, "quality", "n_tokens", "threshold")
    )


def chunk_documents(
    df,
    id_col: str,
    text_col: str,
    max_tokens: int,
    overlap: int = 0,
):
    """Split long documents into overlapping token chunks — the standard
    pre-tokenization chunker (``pack_sequences`` handles the dual problem
    of packing SHORT docs into budget bins). Chunk starts step by
    ``max_tokens - overlap``; the final chunk is whatever remains (never
    empty, possibly shorter). Output one row per chunk:
    ``(id_col, chunk_id, chunk_text, n_tokens)``.

    Pure Catalyst: tokenize once, explode the chunk-start sequence, slice
    the token array per chunk — a narrow map over the scan (the explode
    multiplies rows by ~len/stride, never shuffles). NULL/empty docs yield
    one empty chunk row so no document is silently dropped.
    """
    if overlap >= max_tokens:
        raise ValueError("overlap must be smaller than max_tokens")
    stride = max_tokens - overlap
    toks = F.filter(
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda t: t != F.lit(""),
    )
    base = df.select(F.col(id_col), toks.alias("_toks")).withColumn(
        "_n", F.size("_toks")
    )
    # starts: 0, stride, 2*stride, ... while start < n - overlap (so a
    # trailing chunk fully contained in its predecessor never appears);
    # at least one chunk even for empty docs.
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.col("_n") - overlap - 1, F.lit(0)),
        F.lit(stride),
    )
    chunk = F.slice(F.col("_toks"), F.col("_start") + 1, max_tokens)
    return (
        base.select(
            F.col(id_col), "_toks", "_n", F.posexplode(starts).alias("chunk_id", "_start")
        )
        .select(
            F.col(id_col),
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.array_join(chunk, " ").alias("chunk_text"),
            F.size(chunk).cast("long").alias("n_tokens"),
        )
    )


# The Gopher rule stopword set (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", Table A1 quality
# filtering): a document must contain at least two of these.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_rules(
    df,
    id_col: str,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.8,
    min_stop_hits: int = 2,
    stop_words: list[str] | None = None,
) -> "DataFrame":
    """The Gopher quality-rule filter (Rae et al. 2021): per document the
    published heuristics — word-count bounds, mean-word-length bounds,
    symbol-to-word ratio ('#'/'…') cap, minimum fraction of words with an
    alphabetic character, and a minimum count of DISTINCT required
    stopwords present — each emitted as its own boolean column plus the
    conjunction ``kept``. One row per input doc (audit-friendly: the
    verdicts explain themselves; compose ``.filter("kept")`` to curate).

    Pure column expressions over one whitespace tokenization — scan-shaped,
    no shuffle, no Python; every signal replays in SQL. NULL text behaves as
    the empty document (n_words=0, kept=False), matching the null-safe
    handling of the sibling curation operators.
    """
    words = stop_words if stop_words is not None else GOPHER_STOPWORDS

    txt = F.coalesce(F.col(text_col), F.lit(""))
    toks = tokens(F.lower(txt))
    n = F.size(toks)
    total_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    mean_wl = F.when(n == 0, F.lit(0.0)).otherwise(total_len / n)
    # Gopher counts '#' or ellipsis as symbols; ellipsis is the Unicode
    # character OR an ASCII three-dot run ('...', dominant in web text) —
    # each non-overlapping 3-dot run counts once ('......' = 2).
    n_symbols = F.length(
        F.regexp_replace(txt, r"[^#…]", "")
    ) + F.size(F.regexp_extract_all(txt, F.lit(r"\.{3}"), 0))
    symbol_ratio = F.when(n == 0, F.lit(0.0)).otherwise(n_symbols / n)
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    alpha_frac = F.when(n == 0, F.lit(0.0)).otherwise(n_alpha / n)
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(toks), F.array(*[F.lit(w) for w in words])
        )
    )

    out = df.select(
        F.col(id_col),
        n.cast("long").alias("n_words"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        F.round(symbol_ratio, 4).alias("symbol_ratio"),
        F.round(alpha_frac, 4).alias("alpha_word_frac"),
        stop_hits.cast("long").alias("n_stop_hits"),
        ((n >= min_words) & (n <= max_words)).alias("ok_words"),
        (
            (mean_wl >= min_mean_word_len) & (mean_wl <= max_mean_word_len)
        ).alias("ok_word_len"),
        (symbol_ratio <= max_symbol_ratio).alias("ok_symbols"),
        (alpha_frac >= min_alpha_word_frac).alias("ok_alpha"),
        (stop_hits >= min_stop_hits).alias("ok_stopwords"),
    )
    return out.withColumn(
        "kept",
        F.col("ok_words")
        & F.col("ok_word_len")
        & F.col("ok_symbols")
        & F.col("ok_alpha")
        & F.col("ok_stopwords"),
    )


def ngram_novelty(df, id_col: str, text_col: str, n: int = 8) -> "DataFrame":
    """Per-document n-gram novelty: the fraction of the doc's DISTINCT
    n-token grams whose corpus-wide FIRST owner (minimum id) is this doc —
    the contribution/novelty score used to rank crawl increments (a doc
    that only restates earlier content scores ~0; wholly new content
    scores 1). Docs with fewer than ``n`` tokens have no grams and score
    1.0 by definition (nothing restated).

    Scale shape: per-doc DISTINCT gram strings come from an Arrow-batched
    builder (the Catalyst HOF transform is interpreted per element and was
    the dominant cost at decade scale — same lesson as repetition_stats /
    dedup/ngram.py); the strings are xxhash64'd in the post-builder
    projection, so the 64-bit hash is still the only corpus-sized shuffle
    key (same contract as dedup/spans.py). One hash-aggregate finds each
    gram's min owner, one per-doc aggregate counts owned vs total. Work
    beyond the scan ∝ distinct grams. Output: ``(id, n_grams, n_novel,
    novelty)``.
    """
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.filter(
            F.split(
                F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"
            ),
            lambda t: t != F.lit(""),
        ).alias("_toks"),
    ).withColumn("_n", F.size("_toks"))
    numeric_id = dict(df.dtypes).get(id_col) in (
        "bigint", "int", "smallint", "tinyint",
    )
    if numeric_id:
        # Mirror engine tokenization EXACTLY (see repetition_stats): TRIM
        # strips ASCII space only, Java-regex \s is the ASCII class.
        import re

        import pandas as pd

        ws = re.compile(r"[ \t\n\x0b\f\r]+")

        def build(batches):
            for pdf in batches:
                out = []
                for text in pdf[text_col]:
                    t = "" if text is None else text.strip(" ").lower()
                    tk = [w for w in ws.split(t) if w] if t else []
                    out.append(
                        list(
                            {
                                " ".join(tk[i : i + n])
                                for i in range(len(tk) - n + 1)
                            }
                        )
                        if len(tk) >= n
                        else []
                    )
                yield pd.DataFrame({id_col: pdf[id_col], "_gs": out})

        grams = (
            df.select(id_col, text_col)
            .mapInPandas(build, schema=f"{id_col} long, _gs array<string>")
            .select(F.col(id_col).alias("_id"), F.explode("_gs").alias("_gstr"))
            .select("_id", F.xxhash64("_gstr").alias("_g"))
        )
    else:
        grams = (
            toks.filter(F.col("_n") >= n)
            .select(
                "_id",
                F.explode(
                    F.array_distinct(
                        F.expr(
                            f"transform(sequence(0, _n - {n}), "
                            f"i -> xxhash64(array_join(slice(_toks, i + 1, {n}), ' ')))"
                        )
                    )
                ).alias("_g"),
            )
        )
    owners = grams.groupBy("_g").agg(F.min("_id").alias("_owner"))
    per_doc = (
        grams.join(owners, "_g")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(F.col("_owner") == F.col("_id"), 1).otherwise(0)
            ).alias("n_novel"),
        )
    )
    return (
        toks.select("_id")
        .join(per_doc, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("n_grams", F.lit(0).cast("long")).alias("n_grams"),
            F.coalesce("n_novel", F.lit(0).cast("long")).alias("n_novel"),
            F.round(
                F.when(
                    F.coalesce("n_grams", F.lit(0).cast("long")) == 0, F.lit(1.0)
                ).otherwise(F.col("n_novel") / F.col("n_grams")),
                4,
            ).alias("novelty"),
        )
    )


def clean_lines_c4(
    df,
    id_col: str,
    text_col: str,
    min_words: int = 5,
) -> "DataFrame":
    """C4-style line-level cleaning (Raffel et al. 2020, §2.2): keep only
    lines that end in terminal punctuation (. ! ? "), have at least
    ``min_words`` words, and do not mention 'javascript'; drop the WHOLE
    document when it contains 'lorem ipsum' or a curly brace (code). One
    row per input doc: ``(id, doc_kept, n_lines, n_lines_kept,
    clean_text)`` — ``clean_text`` is NULL for dropped docs, else the kept
    lines rejoined with newlines (possibly empty).

    Pure column expressions (split + higher-order filter + rejoin) —
    scan-shaped, no shuffle, no Python; replays in SQL.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(text, "\n")

    def _line_ok(ln):
        t = F.trim(ln)
        n_words = F.size(F.filter(F.split(t, r"\s+"), lambda w: w != F.lit("")))
        return (
            t.rlike('[.!?"]$')
            & (n_words >= min_words)
            & ~F.lower(ln).contains("javascript")
        )

    kept_lines = F.filter(lines, _line_ok)
    doc_kept = ~(
        F.lower(text).contains("lorem ipsum") | text.contains("{")
    )
    return df.select(
        F.col(id_col),
        doc_kept.alias("doc_kept"),
        F.size(lines).cast("long").alias("n_lines"),
        F.when(doc_kept, F.size(kept_lines))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_lines_kept"),
        F.when(doc_kept, F.array_join(kept_lines, "\n"))
        .otherwise(F.lit(None).cast("string"))
        .alias("clean_text"),
    )


def remove_duplicate_lines(
    df,
    id_col: str,
    text_col: str,
    min_docs: int = 2,
    min_chars: int = 1,
) -> "DataFrame":
    """Cross-document line deduplication (the CCNet/RefinedWeb shared-line
    policy at LINE granularity): a normalized line (lower + trim) occurring
    in at least ``min_docs`` DISTINCT documents is boilerplate and is
    dropped from EVERY document. One row per input doc:
    ``(id, n_lines, n_removed, clean_text)``.

    Trivial lines are EXEMPT: a line whose normalized form is shorter than
    ``min_chars`` (default 1 — empty/whitespace-only lines) never joins the
    shared-line population and is never dropped. All such lines normalize
    to the same hash and occur in ≥ min_docs docs in any real corpus, so
    without the exemption every blank line — i.e. all paragraph structure —
    would be stripped from every document, which the CCNet-style policy
    deliberately avoids (mirrors the min-words guard in clean_lines_c4).

    Scale shape (same contract as dedup/spans.py): line hashes are
    computed in the scan projection — the 64-bit hash is the only
    corpus-sized shuffle key, the line string never leaves the scan; the
    shared-line population bounds the drop-list join; docs rebuild from
    per-doc drop-INDEX lists with one higher-order filter (the corpus line
    stream is never re-exploded for the rebuild).
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    base = df.select(F.col(id_col).alias("_id"), F.split(text, "\n").alias("_lines"))
    exploded = (
        base.select(
            "_id",
            F.posexplode("_lines").alias("_idx", "_ln"),
        )
        .select("_id", "_idx", F.lower(F.trim("_ln")).alias("_norm"))
        .filter(F.length("_norm") >= min_chars)
        .select("_id", "_idx", F.xxhash64("_norm").alias("_lh"))
    )
    shared = (
        exploded.groupBy("_lh")
        .agg(F.countDistinct("_id").alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("_lh")
    )
    drops = (
        exploded.join(shared, "_lh", "left_semi")
        .groupBy("_id")
        .agg(F.sort_array(F.collect_list("_idx")).alias("_drop"))
    )
    joined = base.join(drops, "_id", "left").withColumn(
        "_drop", F.coalesce(F.col("_drop"), F.array().cast("array<int>"))
    )
    # filter's index argument is 0-based, matching posexplode's positions.
    kept = F.filter(
        F.col("_lines"),
        lambda ln, i: ~F.array_contains(F.col("_drop"), i.cast("int")),
    )
    return joined.select(
        F.col("_id").alias(id_col),
        F.size("_lines").cast("long").alias("n_lines"),
        F.size("_drop").cast("long").alias("n_removed"),
        F.array_join(kept, "\n").alias("clean_text"),
    )


def oov_rate(df, id_col: str, text_col: str, vocab_size: int = 200) -> "DataFrame":
    """Per-document out-of-vocabulary rate against the corpus's own
    top-``vocab_size`` term vocabulary (by total frequency, ties
    alphabetical) — the tokenizer-fit signal: docs full of OOV tokens
    tokenize badly and train worse. Two-phase declarative plan: one
    explode + hash-aggregate builds the vocabulary (TakeOrdered top-k),
    which broadcasts back for the per-token membership test — the corpus
    streams once more through a broadcast semi probe, then one per-doc
    aggregate. No collect, no Python. Output: ``(id, n_tokens, n_oov,
    oov_rate)`` — empty docs rate 0.0.
    """
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.filter(
                F.split(
                    F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))),
                    r"\s+",
                ),
                lambda t: t != F.lit(""),
            )
        ).alias("_t"),
    )
    vocab = (
        toks.groupBy("_t")
        .agg(F.count(F.lit(1)).alias("_tf"))
        .orderBy(F.desc("_tf"), F.asc("_t"))
        .limit(vocab_size)
        .select(F.col("_t").alias("_v"))
    )
    marked = toks.join(
        F.broadcast(vocab), toks["_t"] == vocab["_v"], "left"
    ).select("_id", F.col("_v").isNull().alias("_oov"))
    per_doc = marked.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("_oov"), 1).otherwise(0)).alias("n_oov"),
    )
    return (
        df.select(F.col(id_col).alias("_id"))
        .join(per_doc, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
            F.coalesce("n_oov", F.lit(0).cast("long")).alias("n_oov"),
            F.round(
                F.when(
                    F.coalesce("n_tokens", F.lit(0).cast("long")) == 0,
                    F.lit(0.0),
                ).otherwise(F.col("n_oov") / F.col("n_tokens")),
                4,
            ).alias("oov_rate"),
        )
    )


def corpus_diff(old, new, id_col: str, text_col: str) -> "DataFrame":
    """Snapshot diff between two corpus versions — the audit step before
    an incremental retrain: per doc id, ``status`` ∈ {'added', 'removed',
    'changed', 'unchanged'} by normalized-text fingerprint. Full outer
    join on the id (both sides carry only (id, fp) — scan-shaped
    projections), one row per id present in either snapshot."""
    o = old.select(F.col(id_col).alias("_id"), fingerprint(text_col).alias("_fo"))
    n = new.select(F.col(id_col).alias("_id"), fingerprint(text_col).alias("_fn"))
    return (
        o.join(n, "_id", "full_outer")
        .select(
            F.col("_id").alias(id_col),
            F.when(F.col("_fo").isNull(), F.lit("added"))
            .when(F.col("_fn").isNull(), F.lit("removed"))
            .when(F.col("_fo") == F.col("_fn"), F.lit("unchanged"))
            .otherwise(F.lit("changed"))
            .alias("status"),
        )
    )


def snapshot_upsert(
    store,
    delta,
    id_col: str,
    text_col: str,
    delete_col: str | None = None,
) -> "DataFrame":
    """Apply a crawl delta to a corpus snapshot — the MERGE-INTO (SCD-1)
    corpus-maintenance op: delta rows upsert by id, rows flagged in
    ``delete_col`` tombstone, everything else carries over. Output is the
    NEW snapshot, one row per surviving id: ``(id_col, text_col, action)``
    with action ∈ {'kept', 'unchanged', 'updated', 'inserted'}
    ('unchanged' = re-crawled with an identical normalized-text
    fingerprint — the re-crawl audit signal 'updated' would overstate).
    Delta ids must be unique (one verdict per id; enforce upstream with
    e.g. a max-ts window if a feed can repeat ids).

    Scale shape (store = the 100 TB side, delta = a crawl increment): NO
    full-outer shuffle of the store. Carried-over rows are a LEFT ANTI
    against the BROADCAST delta id set (map-side probe on the scan);
    matched store rows — bounded by |delta| — come back from a LEFT SEMI
    scan as slim (id, fingerprint) and broadcast onto the delta to split
    inserted/updated/unchanged. The store is scanned twice and never
    shuffled; total shuffle volume is O(|delta|) — the same contract as
    dedup/incremental.py. With a date-partitioned store, swap the final
    union for a partition-overwrite write of only the partitions the
    delta touches. The delta plan is referenced three times (two broadcast
    id probes + the upsert payload); persist a delta that is itself
    expensive to recompute.
    """
    if delete_col is not None:
        live = delta.filter(~F.coalesce(F.col(delete_col), F.lit(False)))
    else:
        live = delta
    live = live.select(id_col, text_col)
    d_ids = delta.select(id_col).distinct()
    kept = store.select(id_col, text_col).join(
        F.broadcast(d_ids), id_col, "left_anti"
    ).withColumn("action", F.lit("kept"))
    matched = store.join(F.broadcast(d_ids), id_col, "left_semi").select(
        id_col, fingerprint(text_col).alias("_fo")
    )
    upserts = live.join(F.broadcast(matched), id_col, "left").select(
        id_col,
        text_col,
        F.when(F.col("_fo").isNull(), F.lit("inserted"))
        .when(F.col("_fo") == fingerprint(text_col), F.lit("unchanged"))
        .otherwise(F.lit("updated"))
        .alias("action"),
    )
    return kept.unionByName(upserts)
