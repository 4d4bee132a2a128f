"""[EXT] Text analysis operators: tokenization, language-ID, quality scoring,
fingerprinting. All pure Column expressions (JVM-side, codegen) — at 100 TB these run
as narrow maps over the scan with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: Minimal per-language stopword profiles for the n-gram/stopword heuristic. Tiny by
#: design: the operator shape (per-language token-hit scoring + argmax) is what matters;
#: swap in fuller profiles for production accuracy.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "you", "that", "with", "for"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ich", "ein", "zu", "mit", "den", "von"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "se", "no", "los", "por"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "est", "que", "pour", "dans", "ce"),
}

_CJK_RE = r"[一-鿿]"


def tokens(col: Column) -> Column:
    """Whitespace tokenization; empty/whitespace-only string -> empty array.

    Regex trim, not F.trim: Spark's trim strips only ' ' (0x20), so a bare "\\n"
    would survive and split into phantom empty tokens (caught by hypothesis —
    tests/test_property.py)."""
    trimmed = F.regexp_replace(col, r"^\s+|\s+$", "")
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(col: Column) -> Column:
    """Whitespace token count (the cheap pre-BPE estimator)."""
    return F.size(tokens(col)).cast("long")


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-ish subword estimate: word-piece regex split (letters / digits / punctuation
    runs), ~what a byte-pair tokenizer's pre-tokenizer produces. Still JVM-side."""
    pieces = F.regexp_extract_all(col, F.lit(r"(\p{L}+|\p{N}+|[^\p{L}\p{N}\s])"), 1)
    return F.size(pieces).cast("long")


def language_scores(col: Column) -> dict[str, Column]:
    """Per-language evidence scores: stopword-hit count for alphabetic languages,
    CJK-codepoint count for zh. Array-native (no explode)."""
    toks = tokens(F.lower(col))
    scores: dict[str, Column] = {}
    for lang, words in STOPWORDS.items():
        scores[lang] = F.size(F.filter(toks, lambda t: t.isin(*words)))
    scores["zh"] = F.length(F.regexp_replace(col, r"[^一-鿿]", ""))
    return scores


def language_id(col: Column, min_hits: int = 1) -> Column:
    """Argmax over language_scores with deterministic tie-break (lexicographic lang);
    below min_hits -> 'und' (undetermined)."""
    scores = language_scores(col)
    pairs = F.array(
        *[
            F.struct(scores[lang].alias("score"), F.lit(lang).alias("lang"))
            for lang in sorted(scores)
        ]
    )
    # array_max on struct(score, lang): max score, then max lang — to get lexicographic
    # *smallest* lang on ties we invert via reverse-sorted insertion order instead:
    best = F.aggregate(
        pairs,
        F.struct(F.lit(-1).alias("score"), F.lit("und").alias("lang")),
        lambda acc, x: F.when(x["score"] > acc["score"], x).otherwise(acc),
    )
    return F.when(best["score"] >= min_hits, best["lang"]).otherwise(F.lit("und"))


def quality_features(col: Column) -> dict[str, Column]:
    """Deterministic quality components (all exact integer/ratio arithmetic):
    n_chars, n_tokens, mean token length, punctuation ratio, stopword ratio (en),
    uppercase ratio, max token repetition ratio."""
    toks = tokens(col)
    n_chars = F.length(col).cast("long")
    n_tokens = F.size(toks).cast("long")
    n_punct = F.length(F.regexp_replace(col, r"[\w\s]", "")).cast("long")
    n_upper = F.length(F.regexp_replace(col, r"[^A-Z]", "")).cast("long")
    n_stop = F.size(
        F.filter(tokens(F.lower(col)), lambda t: t.isin(*STOPWORDS["en"]))
    ).cast("long")
    alpha_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": F.when(
            n_tokens > 0, F.round(alpha_len.cast("double") / n_tokens, 6)
        ).otherwise(F.lit(0.0)),
        "punct_ratio": F.when(
            n_chars > 0, F.round(n_punct.cast("double") / n_chars, 6)
        ).otherwise(F.lit(0.0)),
        "upper_ratio": F.when(
            n_chars > 0, F.round(n_upper.cast("double") / n_chars, 6)
        ).otherwise(F.lit(0.0)),
        "stopword_ratio": F.when(
            n_tokens > 0, F.round(n_stop.cast("double") / n_tokens, 6)
        ).otherwise(F.lit(0.0)),
    }


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality score: rewards mid-length docs with sane token shape,
    penalizes punctuation/uppercase noise. Fixed weights, fully deterministic."""
    q = quality_features(col)
    length_term = F.least(q["n_tokens"].cast("double") / 100.0, F.lit(1.0))
    shape_term = F.when(
        (q["mean_token_len"] >= 2.0) & (q["mean_token_len"] <= 12.0), 1.0
    ).otherwise(0.3)
    noise_term = F.greatest(
        F.lit(0.0), F.lit(1.0) - (q["punct_ratio"] + q["upper_ratio"]) * 2.0
    )
    return F.round(
        (length_term * 0.4 + shape_term * 0.3 + noise_term * 0.3), 6
    )


def doc_fingerprint(col: Column) -> Column:
    """Order-sensitive rolling document fingerprint: chained xxhash64 over the token
    stream (hash-of-hash chaining, overflow-free under ANSI mode). Two documents with
    the same token sequence collide; any reorder/edit diverges."""
    return F.aggregate(
        tokens(col),
        F.lit(0).cast("long"),
        lambda acc, t: F.xxhash64(acc, t),
    )


def tf_idf_terms(df, text_col: str = "text", id_col: str = "doc_id", top_k: int = 5):
    """[EXT] TF-IDF: explode tokens -> per-(doc,term) tf -> per-term document
    frequency -> tfidf = tf * ln(N/df) -> top-k terms per doc.

    Scale shape: two shuffles (doc-term grouping, term df) + a broadcast of the term
    df table back onto doc-terms (term vocabulary << corpus), then a per-doc window.
    The corpus size enters the plan as a broadcast 1-row aggregate rather than a
    driver-side distinct().count() action (round-4 sweep: no eager jobs inside
    operators). ln() on doubles is deterministic; scores are rounded for parity.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    toks = df.select(
        F.col(id_col).alias("_id"), F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    )
    tf = toks.groupBy("_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = df.select(
        F.count_distinct(F.col(id_col)).cast("double").alias("_n_docs")
    )
    doc_freq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(doc_freq), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("_n_docs") / F.col("df")), 6),
        )
    )
    w = Window.partitionBy("_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("term_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("term_rank") <= top_k)
        .select(
            F.col("_id").alias(id_col),
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("doc_freq"),
            "tfidf",
            "term_rank",
        )
    )


# --- repetition / structure filters (Gopher & C4 style) -----------------------------


def repetition_features(col: Column) -> dict[str, Column]:
    """Document-structure signals used by large-corpus quality filters (the
    Gopher/MassiveText and C4 rule families): duplicate-line fraction, bullet-line
    fraction, ellipsis-line fraction, symbol-to-word ratio, alphabetic-word
    fraction. Pure Column expressions — a narrow map over the scan; the only
    lambdas are single-level array filters over a document's line/token arrays
    (never nested, never re-evaluating expensive children)."""
    lines = F.split(col, "\n")
    nonempty = F.filter(lines, lambda l: F.length(l) > 0)
    n_lines = F.size(nonempty).cast("long")
    n_dup_lines = (n_lines - F.size(F.array_distinct(nonempty))).cast("long")
    n_bullet = F.size(
        F.filter(nonempty, lambda l: F.substring(l, 1, 1).isin("-", "*"))
    ).cast("long")
    n_ellipsis_lines = F.size(
        F.filter(nonempty, lambda l: F.substring(l, -3, 3) == "...")
    ).cast("long")
    toks = tokens(col)
    n_words = F.size(toks).cast("long")
    n_alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))).cast("long")
    n_hash = F.length(F.regexp_replace(col, r"[^#]", "")).cast("long")
    n_ellipsis = F.size(F.regexp_extract_all(col, F.lit(r"\.\.\."), 0)).cast("long")

    def _ratio(num: Column, den: Column) -> Column:
        return F.when(den > 0, F.round(num.cast("double") / den, 6)).otherwise(F.lit(0.0))

    return {
        "n_lines": n_lines,
        "n_words": n_words,
        "dup_line_frac": _ratio(n_dup_lines, n_lines),
        "bullet_line_frac": _ratio(n_bullet, n_lines),
        "ellipsis_line_frac": _ratio(n_ellipsis_lines, n_lines),
        "symbol_word_ratio": _ratio(n_hash + n_ellipsis, n_words),
        "alpha_word_frac": _ratio(n_alpha_words, n_words),
    }


#: (flag name, rule) — the published Gopher thresholds, applied to the features above.
GOPHER_RULES: tuple[tuple[str, str], ...] = (
    ("ok_word_count", "n_words BETWEEN 50 AND 100000"),
    ("ok_symbol_ratio", "symbol_word_ratio < 0.1"),
    ("ok_bullet", "bullet_line_frac < 0.9"),
    ("ok_ellipsis", "ellipsis_line_frac < 0.3"),
    ("ok_alpha", "alpha_word_frac > 0.8"),
    ("ok_dup_lines", "dup_line_frac < 0.3"),
)


def gopher_flags(col: Column) -> dict[str, Column]:
    """Boolean pass/fail per Gopher-style rule plus the conjunction. Thresholds are
    the published MassiveText ones where the feature maps 1:1."""
    q = repetition_features(col)
    flags = {
        "ok_word_count": (q["n_words"] >= 50) & (q["n_words"] <= 100000),
        "ok_symbol_ratio": q["symbol_word_ratio"] < 0.1,
        "ok_bullet": q["bullet_line_frac"] < 0.9,
        "ok_ellipsis": q["ellipsis_line_frac"] < 0.3,
        "ok_alpha": q["alpha_word_frac"] > 0.8,
        "ok_dup_lines": q["dup_line_frac"] < 0.3,
    }
    conj = None
    for f in flags.values():
        conj = f if conj is None else (conj & f)
    flags["pass_all"] = conj
    return flags


# --- PII detection & scrubbing ------------------------------------------------------

#: Engine-portable PII patterns (no lookarounds, no backrefs — valid in both Java
#: regex and RE2, so every operator below is oracle-checkable in DuckDB).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}

#: Replacement tokens, applied in PII_PATTERNS iteration order. Order matters:
#: emails are scrubbed before IPs so 'user@10.0.0.1'-style text collapses to one
#: [EMAIL] token instead of an [EMAIL]/[IPV4] mix that depends on scan order.
PII_TOKENS: dict[str, str] = {"email": "[EMAIL]", "phone": "[PHONE]", "ipv4": "[IPV4]"}


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-kind PII match counts — one JVM-side regexp_count per pattern."""
    return {
        kind: F.regexp_count(col, F.lit(pat)).cast("long")
        for kind, pat in PII_PATTERNS.items()
    }


def scrub_pii(col: Column) -> Column:
    """Replace every PII match with its token, chained in PII_PATTERNS order.
    A narrow map — scrubbing 100 TB is exactly one scan, no shuffle."""
    out = col
    for kind, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, PII_TOKENS[kind])
    return out


def chunk_documents(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 512,
    overlap: int = 64,
):
    """Context-window chunking: split each document into overlapping token windows
    (chunk i covers tokens [i*stride, i*stride + max_tokens), stride = max_tokens -
    overlap; a doc at or under max_tokens is a single chunk). The RAG/training prep
    step that turns documents into model-sized sequences.

    Pure narrow map + explode — tokenize once, slice per chunk, zero shuffle; chunk
    counts follow closed-form arithmetic on the token count, which is what the DuckDB
    oracle checks independently of the slicing implementation.

    Returns one row per chunk: (id_col, chunk_idx, chunk_tokens, chunk_text).
    """
    if not 0 <= overlap < max_tokens:
        raise ValueError(f"need 0 <= overlap < max_tokens, got {overlap}/{max_tokens}")
    stride = max_tokens - overlap
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    n_chunks = F.when(n <= max_tokens, F.lit(1)).otherwise(
        F.ceil((n - max_tokens) / F.lit(float(stride))).cast("long") + 1
    )
    base = df.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("_seq_pos", "chunk_idx"),
    )
    chunk_toks = F.slice(F.col("_toks"), F.col("chunk_idx") * stride + 1, max_tokens)
    return base.select(
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size(chunk_toks).cast("long").alias("chunk_tokens"),
        F.concat_ws(" ", chunk_toks).alias("chunk_text"),
    )
