"""Text analysis operators over the `documents` table.

Generalizes the reference's string-normalization + counting pipeline
(``/root/reference/curation/check_fackel_references.py:42-58``: extract,
lower, normalize, count) into the text-quality primitives a training-data
pipeline needs: token counting, quality scoring, language ID, fingerprinting,
corpus word frequency. Everything is a JVM column expression — no Python in
the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import words

EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]
ES_STOPWORDS = ["el", "la", "de", "y", "que", "en", "un", "una", "los", "las"]


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace + BPE-ish subword token counts per doc."""
    w = words(F.col("text"))
    # BPE-ish proxy: whitespace tokens + extra splits at letter/digit borders
    subword = F.split(
        F.regexp_replace(
            F.regexp_replace(F.trim(F.col("text")), r"([a-z])([0-9])", r"$1 $2"),
            r"([0-9])([a-z])",
            r"$1 $2",
        ),
        r"\s+",
    )
    return docs.select(
        "doc_id",
        F.size(w).alias("n_words"),
        F.size(F.array_distinct(w)).alias("n_distinct_words"),
        F.size(subword).alias("n_subword_tokens"),
        F.length("text").alias("n_chars_measured"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Length / punctuation / stopword-ratio quality heuristics.

    Score: mean word length in [3,8] is good, stopword ratio in [0.1,0.6] is
    good, very short docs are penalized — exact integer/double arithmetic so
    the oracle reproduces it.
    """
    w = words(F.col("text"))
    n_words = F.size(w)
    stop_hits = F.size(
        F.filter(w, lambda t: t.isin(EN_STOPWORDS))
    )
    mean_wlen = (F.length(F.regexp_replace(F.col("text"), r"\s+", "")) / n_words)
    punct = (
        F.length(F.regexp_replace(F.col("text"), r"[a-zA-Z0-9\s]", ""))
        / F.length("text")
    )
    return docs.select(
        "doc_id",
        "source",
        n_words.alias("n_words"),
        mean_wlen.alias("mean_word_len"),
        (stop_hits / n_words).alias("stopword_ratio"),
        punct.alias("punct_ratio"),
        F.when(n_words < 5, 0.0)
        .otherwise(
            F.when((mean_wlen >= 3) & (mean_wlen <= 8), 0.5).otherwise(0.2)
            + F.when(stop_hits / n_words <= 0.6, 0.5).otherwise(0.25)
        )
        .alias("quality"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-profile language guess (n-gram heuristic tier 0): count
    matches against per-language function-word lists, argmax with 'und'
    fallback — the reference's lang-tagged literal semantics
    (make_listwork.py:212: lang='en'/'de'/'und')."""
    w = words(F.lower(F.col("text")))
    en = F.size(F.filter(w, lambda t: t.isin(EN_STOPWORDS)))
    es = F.size(F.filter(w, lambda t: t.isin(ES_STOPWORDS)))
    guess = (
        F.when((en > es) & (en > 0), "en")
        .when((es > en) & (es > 0), "es")
        .otherwise("und")
    )
    return docs.select(
        "doc_id", "lang", en.alias("en_hits"), es.alias("es_hits"),
        guess.alias("lang_guess"),
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Deterministic document fingerprint: md5 of the whitespace-normalized,
    lowercased text (rolling-hash tier handled by dedup.simhash64)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return docs.select(
        "doc_id",
        F.md5(norm).alias("fingerprint"),
        F.substring(F.md5(norm), 1, 8).alias("fp_short"),
    )


def word_freq_topk(docs: DataFrame, k: int = 20) -> DataFrame:
    """Corpus-level word frequency top-k (explode -> two-phase hash agg)."""
    return (
        docs.select(F.explode(words(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(k)
    )


def repetition_scores(docs: DataFrame) -> DataFrame:
    """Gopher-style within-document repetition signals: the fraction of
    duplicate words and duplicate word-bigrams (a high ratio marks
    boilerplate / degenerate generations a training pipeline filters out).
    Pure JVM array expressions, exact integer ratios — one narrow projection,
    no shuffle at all."""
    ws = words(F.col("text"))
    bigrams = F.transform(
        F.slice(ws, 1, F.size(ws) - 1),
        lambda x, i: F.concat_ws(" ", x, F.element_at(ws, i + 2)),
    )
    n_words = F.size(ws)
    n_uniq_words = F.size(F.array_distinct(ws))
    n_bi = F.size(bigrams)
    n_uniq_bi = F.size(F.array_distinct(bigrams))
    return docs.filter(F.size(ws) >= 2).select(
        "doc_id",
        n_words.cast("bigint").alias("n_words"),
        ((n_words - n_uniq_words).cast("double") / n_words).alias(
            "word_rep_ratio"
        ),
        ((n_bi - n_uniq_bi).cast("double") / n_bi).alias("bigram_rep_ratio"),
    )


EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}"


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """PII scrub: replace email addresses and phone-shaped numbers with
    typed placeholders, and count what was removed — the redaction pass a
    training-data pipeline runs before anything else sees the text.

    The reference's analog is its normalize-before-use discipline
    (``/root/reference/curation/check_fackel_references.py:47-49``:
    lower+normalize every string before comparing); here the normalization
    is destructive by design. Pure JVM regexp expressions (both patterns
    are RE2-safe so a DuckDB oracle evaluates them identically): one
    projection, no shuffle, trivially scale-free — at 100 TB this is a
    map-only pass that pipelines into whatever runs next.

    Output: (doc_id, n_emails, n_phones, clean_text).
    """
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0))).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all(t, F.lit(PHONE_RE), F.lit(0))).alias(
            "n_phones"
        ),
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ).alias("clean_text"),
    )


def lm_bigram_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Bigram-LM fluency scoring (CCNet-style quality filter, log-free).

    CCNet/Gopher-class pipelines bucket documents by language-model
    perplexity; this is that filter with the LM trained on the corpus
    itself in the same job: two hash aggregations build the bigram and
    context count tables, and each document is scored by the mean
    conditional probability of its word transitions. Gibberish, OCR noise
    and boilerplate-free spam sit in the low tail (their transitions are
    corpus-rare); templated boilerplate sits in the extreme high tail.

    Determinism contract (the repo-wide oracle rule): no ``ln()`` — libm
    differs across engines — and no float accumulation. Each transition's
    conditional probability is fixed-point ``(c_bigram * 1e6) div
    c_context`` (exact integer), per-doc aggregation sums integers, and the
    final score is the same two IEEE double divisions on both engines.

    Scale shape (100 TB): bigram extraction is a map-only array transform
    (no shuffle, no window); the count tables are bounded by the observed
    bigram vocabulary, not the corpus; scoring re-joins occurrences to
    counts on the bigram key — hot heads ("of the") are exactly the AQE
    skew-join case, and a ``min_count`` prune keeps the table dense.
    Reference analog: the match-scoring enrichment that ranks candidate
    matches by string-agreement counts
    (``/root/reference/scripts/enrich_fackel_bibls.py:77-96``).

    Output: (doc_id, n_bigrams, n_novel, novel_rate, lm_score) — one row
    per document with at least one bigram. ``n_novel`` counts transitions
    seen nowhere else in the corpus; ``novel_rate`` near 1.0 is the
    gibberish signal, ``lm_score`` is mean P(w2|w1) in [0, 1].
    """
    ws = F.split(F.trim(F.col(text_col)), " ")
    bg = (
        docs.select("doc_id", ws.alias("ws"))
        .filter(F.size("ws") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ws)-1),"
                    " i -> struct(ws[i-1] AS w1, ws[i] AS w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", "b.w1", "b.w2")
    )
    cb = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_bg"))
    cc = cb.groupBy("w1").agg(F.sum("c_bg").alias("c_ctx"))
    scored = (
        bg.join(cb, ["w1", "w2"])
        .join(cc, "w1")
        .select(
            "doc_id",
            "c_bg",
            F.expr("(c_bg * 1000000L) div c_ctx").alias("p_fp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum(F.when(F.col("c_bg") == 1, 1).otherwise(0)).alias("n_novel"),
        (
            F.sum(F.when(F.col("c_bg") == 1, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("novel_rate"),
        (
            F.sum("p_fp").cast("double")
            / F.count(F.lit(1))
            / F.lit(1000000.0)
        ).alias("lm_score"),
    )
