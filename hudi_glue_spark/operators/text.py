"""Text-analysis operators (§2b): tokenization, quality scoring,
language ID, document fingerprinting.

Everything is built from JVM-side expressions (split / higher-order
array functions / regexp) — no Python UDFs in these paths. Shared
constants (stopword and language-marker lists) are defined once here and
used to *generate* both the Spark expressions and the DuckDB oracle SQL,
so the two sides cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Stopwords for the quality score's stopword-ratio component.
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]

#: Language-marker words for the n-gram-free heuristic language ID.
#: Scored by the number of marker words PRESENT (presence, not frequency);
#: argmax with deterministic preference order en > de > fr > es > zh.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "with"],
    "de": ["der", "die", "und", "nicht", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "la", "y", "los", "es"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],
}
LANG_ORDER = ["en", "de", "fr", "es", "zh"]


# -- tokenization -----------------------------------------------------------


def words(text: Column | str) -> Column:
    """Whitespace tokenization, empty tokens dropped (so the empty
    string yields 0 tokens, not [''])."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, r"\s+"), lambda x: x != "")


def words_sql(col: str = "text") -> str:
    """DuckDB equivalent of :func:`words` (oracle generation)."""
    return f"list_filter(regexp_split_to_array({col}, '\\s+'), x -> x <> '')"


def token_count(text: Column | str) -> Column:
    """Whitespace token count — the baseline tokenizer. A BPE-style
    subword count is :func:`bpe_piece_count`."""
    return F.size(words(text))


def bpe_piece_count(text: Column | str) -> Column:
    """BPE-ish piece count without a trained merges table: splits on
    whitespace AND on letter/digit/punctuation boundaries, counting
    sub-word pieces (a cheap, deterministic proxy for tokenizer cost
    estimation over 100 TB — one regexp, fully JVM-side)."""
    c = F.col(text) if isinstance(text, str) else text
    pieces = F.split(
        F.regexp_replace(c, r"([0-9]+|[^A-Za-z0-9\s])", r" $1 "), r"\s+"
    )
    return F.size(F.filter(pieces, lambda x: x != ""))


# -- quality scoring --------------------------------------------------------


def punct_ratio(text: Column | str) -> Column:
    """Non-alphanumeric-non-space chars / total chars (0 for empty)."""
    c = F.col(text) if isinstance(text, str) else text
    stripped = F.regexp_replace(c, "[A-Za-z0-9 ]", "")
    return F.when(F.length(c) == 0, F.lit(0.0)).otherwise(
        F.length(stripped).cast("double") / F.length(c)
    )


def stopword_ratio(text: Column | str) -> Column:
    ws = words(text)
    hits = F.size(F.filter(ws, lambda x: F.lower(x).isin(*STOPWORDS)))
    n = F.size(ws)
    return F.when(n == 0, F.lit(0.0)).otherwise(hits.cast("double") / n)


def distinct_word_ratio(text: Column | str) -> Column:
    ws = words(text)
    n = F.size(ws)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        F.size(F.array_distinct(ws)).cast("double") / n
    )


def quality_score(text: Column | str) -> Column:
    """Composite quality in [0,1]: length saturation (40 tokens ≈ full
    marks), lexical diversity, low punctuation noise. The exact formula
    is mirrored in :func:`quality_score_sql` for the oracle."""
    n = token_count(text).cast("double")
    length_part = F.least(n / F.lit(40.0), F.lit(1.0))
    return (
        F.lit(0.4) * length_part
        + F.lit(0.4) * distinct_word_ratio(text)
        + F.lit(0.2) * (F.lit(1.0) - punct_ratio(text))
    )


def quality_score_sql(col: str = "text") -> str:
    w = words_sql(col)
    n = f"CAST(len({w}) AS DOUBLE)"
    nd = f"CAST(len(list_distinct({w})) AS DOUBLE)"
    stripped = f"regexp_replace({col}, '[A-Za-z0-9 ]', '', 'g')"
    punct = (
        f"(CASE WHEN length({col}) = 0 THEN 0.0 "
        f"ELSE CAST(length({stripped}) AS DOUBLE) / length({col}) END)"
    )
    diversity = f"(CASE WHEN {n} = 0 THEN 0.0 ELSE {nd} / {n} END)"
    return (
        f"0.4 * least({n} / 40.0, 1.0) + 0.4 * {diversity} + 0.2 * (1.0 - {punct})"
    )


def mean_word_len(text: Column | str) -> Column:
    """Mean characters per word (0 for empty text): total non-whitespace
    chars / word count — one regexp + one size, fully JVM-side."""
    c = F.col(text) if isinstance(text, str) else text
    n = token_count(c)
    chars = F.length(F.regexp_replace(c, r"\s+", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(chars.cast("double") / n)


def mean_word_len_sql(col: str = "text") -> str:
    w = words_sql(col)
    return (
        f"(CASE WHEN len({w}) = 0 THEN 0.0 ELSE "
        f"CAST(length(regexp_replace({col}, '\\s+', '', 'g')) AS DOUBLE)"
        f" / len({w}) END)"
    )


def digit_ratio(text: Column | str) -> Column:
    """Digit chars / total chars (0 for empty text)."""
    c = F.col(text) if isinstance(text, str) else text
    digits = F.length(F.regexp_replace(c, r"[^0-9]", ""))
    return F.when(F.length(c) == 0, F.lit(0.0)).otherwise(
        digits.cast("double") / F.length(c)
    )


def digit_ratio_sql(col: str = "text") -> str:
    return (
        f"(CASE WHEN length({col}) = 0 THEN 0.0 ELSE "
        f"CAST(length(regexp_replace({col}, '[^0-9]', '', 'g')) AS DOUBLE)"
        f" / length({col}) END)"
    )


def stopword_ratio_sql(col: str = "text") -> str:
    w = words_sql(col)
    lst = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"
    return (
        f"(CASE WHEN len({w}) = 0 THEN 0.0 ELSE "
        f"CAST(len(list_filter({w}, x -> list_contains({lst}, lower(x)))) "
        f"AS DOUBLE) / len({w}) END)"
    )


# -- repetition signals (Gopher-style quality filters) ----------------------


def max_word_freq_ratio(text: Column | str) -> Column:
    """Frequency of the single most repeated word / total words — the
    word-level repetition signal from Gopher-style quality filtering
    (a page of "buy buy buy …" scores near 1.0; clean prose near 1/n).

    O(words · distinct words) per document via nested higher-order array
    functions — still fully JVM-side, no shuffle, no Python. The word
    array is let-bound (r15): the inner ``F.filter(ws, ...)`` runs once
    per DISTINCT word, so an unbound ``ws`` would re-split the document
    that many times — O(len · distinct) splits on top of the inherent
    comparison work."""
    from hudi_glue_spark.functions.scalar import let_

    def over_ws(ws: Column) -> Column:
        n = F.size(ws)
        top = F.array_max(
            F.transform(
                F.array_distinct(ws),
                lambda d: F.size(F.filter(ws, lambda w: w == d)),
            )
        )
        return F.when(n == 0, F.lit(0.0)).otherwise(top.cast("double") / n)

    return let_(words(text), over_ws)


def max_word_freq_ratio_sql(col: str = "text") -> str:
    w = words_sql(col)
    top = f"list_max(list_transform(list_distinct({w}), d -> len(list_filter({w}, x -> x = d))))"
    return (
        f"(CASE WHEN len({w}) = 0 THEN 0.0 "
        f"ELSE CAST({top} AS DOUBLE) / len({w}) END)"
    )


# -- PII redaction -----------------------------------------------------------

#: Common-subset regexes (valid in both Java regex and RE2): email, then
#: phone-ish digit runs. '-' sits last in every class so it's literal —
#: it must be INSIDE the email classes (user@my-domain.com is common).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9()\s-]{6,}[0-9]"


def pii_count(text: Column | str) -> Column:
    """Number of email + phone matches in the text (pre-redaction audit
    metric). JVM-side ``regexp_count``."""
    c = F.col(text) if isinstance(text, str) else text
    return (F.regexp_count(c, F.lit(EMAIL_RE)) + F.regexp_count(c, F.lit(PHONE_RE))).cast("int")


def redact_pii(text: Column | str) -> Column:
    """Replace emails then phone-like digit runs with typed placeholder
    tokens. Spark's ``regexp_replace`` is global by default; the oracle
    SQL passes the 'g' flag to match."""
    c = F.col(text) if isinstance(text, str) else text
    out = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(out, PHONE_RE, "<PHONE>")


def pii_count_sql(col: str = "text") -> str:
    return (
        f"CAST(len(regexp_extract_all({col}, '{EMAIL_RE}')) "
        f"+ len(regexp_extract_all({col}, '{PHONE_RE}')) AS INTEGER)"
    )


def redact_pii_sql(col: str = "text") -> str:
    inner = f"regexp_replace({col}, '{EMAIL_RE}', '<EMAIL>', 'g')"
    return f"regexp_replace({inner}, '{PHONE_RE}', '<PHONE>', 'g')"


# -- language ID ------------------------------------------------------------


def _padded(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.concat(F.lit(" "), F.lower(c), F.lit(" "))


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Per-language marker-presence counts (0..len(markers))."""
    p = _padded(text)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        score = None
        for m in markers:
            hit = F.when(p.contains(f" {m} "), 1).otherwise(0)
            score = hit if score is None else score + hit
        out[lang] = score
    return out


def lang_id(text: Column | str) -> Column:
    """Heuristic language ID: argmax of marker presence; 'und'
    (undetermined) when nothing matches; ties resolved by LANG_ORDER."""
    scores = lang_scores(text)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    # iterate in REVERSE preference order so earlier langs win ties (>=)
    for lang in reversed(LANG_ORDER):
        s = scores[lang]
        cond = (s > 0) & (s >= best_score)
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_score = F.greatest(s, best_score)
    return best_lang


def lang_id_sql(col: str = "text") -> str:
    """DuckDB oracle generated from the same LANG_MARKERS constant."""
    padded = f"(' ' || lower({col}) || ' ')"
    score_exprs = {
        lang: " + ".join(
            f"(CASE WHEN contains({padded}, ' {m} ') THEN 1 ELSE 0 END)"
            for m in markers
        )
        for lang, markers in LANG_MARKERS.items()
    }
    best_lang, best_score = "'und'", "0"
    for lang in reversed(LANG_ORDER):
        s = f"({score_exprs[lang]})"
        best_lang = f"(CASE WHEN {s} > 0 AND {s} >= {best_score} THEN '{lang}' ELSE {best_lang} END)"
        best_score = f"greatest({s}, {best_score})"
    return best_lang


# -- fingerprinting ---------------------------------------------------------


def doc_fingerprint(text: Column | str) -> Column:
    """Deterministic content fingerprint: md5 of the
    lowercased / trimmed / whitespace-collapsed text. The normalization
    makes it robust to formatting-only edits — the exact-dedup key."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "))


def doc_fingerprint_sql(col: str = "text") -> str:
    return f"md5(regexp_replace(lower(trim({col})), '\\s+', ' ', 'g'))"


def add_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Convenience: attach the full stat surface to a documents frame."""
    return (
        df.withColumn("n_tokens", token_count(text_col))
        .withColumn("n_pieces", bpe_piece_count(text_col))
        .withColumn("punct_ratio", punct_ratio(text_col))
        .withColumn("stopword_ratio", stopword_ratio(text_col))
        .withColumn("quality", quality_score(text_col))
        .withColumn("lang_pred", lang_id(text_col))
        .withColumn("fingerprint", doc_fingerprint(text_col))
    )


# -- model-based quality scoring (feature hashing) ---------------------------

#: weight granularity: integer "millis" in [-1000, 1000] so the per-doc
#: fold is an exact integer sum — order-independent and bit-identical on
#: any engine (a float weight sum would be fold-order-dependent).
_W_RANGE = 2001


def hashed_feature_logit_milli(text: Column | str, salt: str = "qm1") -> Column:
    """Feature-hashed linear model logit, in integer millis.

    Vowpal-Wabbit-style feature hashing: each token's weight is read
    from a hash of the token itself (md5 → [-1000, 1000] millis), so the
    "model" ships as pure expression — no weight table to broadcast, no
    Python. Swapping the hash for trained weights means broadcasting a
    (token → milli) map and keeping exactly this fold; the plumbing is
    the product. The per-document score is a single JVM ``aggregate``
    over the token array: map-only, zero shuffle at any corpus size.

    Integer millis (not floats) make the fold an exact integer sum, so
    the DuckDB oracle reproduces every document's logit bit-for-bit.
    """
    ws = words(text)

    def wt(w: Column) -> Column:
        h = F.conv(
            F.substring(F.md5(F.concat(F.lit(salt + ":"), w)), 1, 15), 16, 10
        ).cast("long")
        return F.pmod(h, F.lit(_W_RANGE)) - F.lit(1000)

    return F.aggregate(ws, F.lit(0).cast("long"), lambda acc, w: acc + wt(w))


def hashed_feature_logit_milli_sql(col: str = "text", salt: str = "qm1") -> str:
    """DuckDB twin of :func:`hashed_feature_logit_milli`."""
    w = words_sql(col)
    wt = (
        f"CAST(('0x' || substr(md5('{salt}:' || x), 1, 15)) AS BIGINT) "
        f"% {_W_RANGE} - 1000"
    )
    return f"CAST(coalesce(list_sum(list_transform({w}, x -> {wt})), 0) AS BIGINT)"
