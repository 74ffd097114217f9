"""Text-analysis column expressions for training-data pipelines.

All pure JVM built-ins (split/regexp/md5/transform) — whole-stage codegen,
no Python in the hot path.  Each has an exact ANSI-SQL twin used by the
driver's DuckDB oracle (md5/substr/regexp semantics agree across engines).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def ws_token_count(text: str | Column) -> Column:
    """Whitespace token count (0 for empty/blank strings)."""
    t = F.trim(_c(text))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def bpe_ish_token_count(text: str | Column) -> Column:
    """BPE-ish token estimate: word-char runs + each non-word, non-space
    char as its own token — a cheap, deterministic proxy for subword
    tokenizers.  Formulated with plain character classes (no lookarounds)
    so the DuckDB/RE2 oracle computes the identical count."""
    t = _c(text)
    word_runs = F.size(
        F.filter(
            F.regexp_extract_all(t, F.lit(r"\w+"), 0),
            lambda s: F.length(s) > 0,
        )
    )
    punct_chars = F.length(F.regexp_replace(t, r"[\w\s]", ""))
    return word_runs + punct_chars


def punct_ratio(text: str | Column) -> Column:
    t = _c(text)
    stripped = F.regexp_replace(t, r"[^\p{L}\p{N}\s]", "")
    return (F.length(t) - F.length(stripped)) / F.greatest(
        F.length(t), F.lit(1)
    )


def upper_ratio(text: str | Column) -> Column:
    t = _c(text)
    no_upper = F.regexp_replace(t, r"[A-Z]", "")
    return (F.length(t) - F.length(no_upper)) / F.greatest(
        F.length(t), F.lit(1)
    )


def mean_word_len(text: str | Column) -> Column:
    t = F.trim(_c(text))
    words = F.filter(F.split(t, r"\s+"), lambda s: F.length(s) > 0)
    return F.when(F.size(words) == 0, F.lit(0.0)).otherwise(
        F.aggregate(
            words, F.lit(0.0), lambda acc, w: acc + F.length(w)
        )
        / F.size(words)
    )


STOPWORDS = (
    "the a an and or of to in is it that for on with as was were be this".split()
)


def stopword_ratio(text: str | Column) -> Column:
    """Fraction of whitespace tokens that are english stopwords —
    the classic Gopher/C4-style quality signal.

    Membership via ``isin`` (Catalyst rewrites the 19-literal In to an
    InSet hash probe) instead of ``array_contains`` over a literal
    array, which scanned all 19 entries per token inside the
    interpreted lambda — ~20% off every quality_score consumer,
    value-identical (same string equality)."""
    t = F.trim(F.lower(_c(text)))
    words = F.filter(F.split(t, r"\s+"), lambda s: F.length(s) > 0)
    hits = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    return F.when(F.size(words) == 0, F.lit(0.0)).otherwise(
        hits / F.size(words)
    )


def quality_score(text: str | Column) -> Column:
    """Composite [0,1] quality heuristic: long enough, not punct-heavy,
    some stopwords, sane word length.

    Rounded to 4 decimals via epsilon-stable floor(q·1e4 + 0.5 + 1e-9):
    the components are ratios of small integers, so q regularly lands
    EXACTLY on a .xxxx5 rounding tie, and ±1-ulp evaluation-order noise
    then flips engines in different directions (observed: 0.83125 →
    Spark 0.8312 vs DuckDB 0.8313 at sf0.1).  The 1e-9 margin swamps
    float noise (~1e-12 at this scale) without moving any non-tie value;
    the SQL twin uses the identical formula."""
    t = _c(text)
    length_ok = F.least(F.length(t) / F.lit(200.0), F.lit(1.0))
    q = (
        0.4 * length_ok
        + 0.3 * (1 - F.least(punct_ratio(t) * 4, F.lit(1.0)))
        + 0.3 * F.least(stopword_ratio(t) * 3, F.lit(1.0))
    )
    return F.floor(q * 10000.0 + 0.5 + 1e-9) / 10000.0


def lang_id(text: str | Column) -> Column:
    """Tiny n-gram-heuristic language ID over {en,de,fr,es,other}.

    Counts signature-word hits per language; ties broken by fixed
    language order.  Deterministic and SQL-twin-able; a real pipeline
    would swap in fastText via mapInPandas (see multimodal stubs)."""
    t = F.concat(F.lit(" "), F.lower(_c(text)), F.lit(" "))
    sigs = {
        "en": [" the ", " and ", " is ", " of "],
        "de": [" der ", " die ", " und ", " ist "],
        "fr": [" le ", " la ", " et ", " est "],
        "es": [" el ", " los ", " y ", " es "],
    }

    def hits(ws):
        out = F.lit(0)
        for w in ws:
            out = out + F.when(F.contains(t, F.lit(w)), 1).otherwise(0)
        return out

    scored = F.array(
        *[
            F.struct(hits(ws).alias("h"), F.lit(lang).alias("l"))
            for lang, ws in sigs.items()
        ]
    )
    best = F.array_max(scored)
    return F.when(best["h"] > 0, best["l"]).otherwise(F.lit("other"))


def fingerprint64(text: str | Column) -> Column:
    """64-bit document fingerprint (xxhash64 of normalized text) —
    the cheap exact-dup key."""
    t = F.regexp_replace(F.lower(F.trim(_c(text))), r"\s+", " ")
    return F.xxhash64(t)


def minhash_signature(text: str | Column, k: int = 8, shingle: int = 8) -> Column:
    """MinHash signature: k independent hashes, each = min over character
    shingles of md5(seed || shingle).  Pure JVM (transform + array_min);
    md5-based so the DuckDB oracle reproduces it exactly."""
    t = _c(text)
    n = F.greatest(F.length(t) - (shingle - 1), F.lit(1))
    idx = F.sequence(F.lit(1), n)
    sigs = [
        F.array_min(
            F.transform(
                idx,
                lambda i: F.md5(
                    F.concat(F.lit(str(seed)), t.substr(i, F.lit(shingle)))
                ),
            )
        ).alias(f"sig{seed}")
        for seed in range(k)
    ]
    return F.array(*sigs)


def rolling_hashes(
    text: str | Column, window: int = 8, base: int = 257,
    mod: int = 1_000_000_007,
) -> Column:
    """Rabin-style rolling window hashes: for every window start i,
    fold h = (h·base + charcode) mod M over the window's characters.

    Pure JVM (nested transform/aggregate, whole-stage codegen); exact
    BIGINT arithmetic so the DuckDB twin (list_reduce) reproduces every
    hash.  The anchor subset (h % k == 0) gives content-defined
    fingerprints robust to insertions — the classic CDC/winnowing shape."""
    t = _c(text)
    n = F.greatest(F.length(t) - (window - 1), F.lit(1))
    win = F.sequence(F.lit(0), F.lit(window - 1))
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.aggregate(
            F.transform(win, lambda j: F.ascii(t.substr(i + j, F.lit(1)))),
            F.lit(0).cast("long"),
            lambda acc, c: (acc * base + c.cast("long")) % mod,
        ),
    )


def simhash_md5_chunks(text: str | Column) -> Column:
    """SimHash as 4 x 16-bit chunks from md5 token hashes — the
    oracle-parity family (same vote semantics as :func:`simhash64`, but
    the per-token hash is the first 64 bits of md5(token) read as 4
    big-endian hex quads, so ANSI SQL reproduces the fingerprint exactly:
    DuckDB CAST('0x'||substr(md5(w),1+4c,4) AS INT) == Spark
    conv(substring(md5(w),1+4c,4),16,10)).

    Returns array<int> of the 4 chunk fingerprints; the banded near-dup
    join operates on chunks directly (no 64-bit assembly, no sign games).
    xxhash64-based :func:`simhash64` stays the cheap scale family."""
    t = F.trim(F.lower(_c(text)))
    words = F.filter(F.split(t, r"\s+"), lambda s: F.length(s) > 0)
    bit_vals = F.array(*[F.lit(1 << b) for b in range(16)])
    zeros = F.array(*[F.lit(0) for _ in range(16)])

    # NB: binding the loop var with a lambda default arg (lambda w, c=c:)
    # would make pyspark treat `c` as a SECOND lambda variable (the array
    # index) — bind through a closure instead
    def quad_hashes(ws, c: int):
        return F.transform(
            ws,
            lambda w: F.conv(
                F.substring(F.md5(w), 1 + 4 * c, 4), 16, 10
            ).cast("int"),
        )

    chunks = []
    for c in range(4):
        hashes = quad_hashes(words, c)
        votes = F.aggregate(
            hashes,
            zeros,
            lambda acc, h: F.zip_with(
                acc,
                bit_vals,
                lambda a, p: a + F.when(h.bitwiseAND(p) != 0, 1).otherwise(-1),
            ),
        )
        chunks.append(
            F.aggregate(
                F.zip_with(
                    votes,
                    bit_vals,
                    lambda v, p: F.when(v > 0, p).otherwise(F.lit(0)),
                ),
                F.lit(0),
                lambda acc, x: acc + x,
            )
        )
    return F.array(*chunks)


def simhash64(text: str | Column) -> Column:
    """64-bit SimHash over whitespace tokens.

    Each token votes its xxhash64 bit pattern; the fingerprint keeps the
    sign of the per-bit vote sum.  Single pass over the token-hash array:
    ONE JVM aggregate folds each hash into a 64-wide vote-count array
    (zip_with), then the counts collapse to a fingerprint by summing the
    disjoint bit values — O(n_tokens · 64) work in one expression instead
    of the naive 64 independent aggregate passes."""
    t = F.trim(F.lower(_c(text)))
    words = F.filter(F.split(t, r"\s+"), lambda s: F.length(s) > 0)
    hashes = F.transform(words, lambda w: F.xxhash64(w))
    # bit b's mask is 2^b (bit 63: two's-complement -(2^63)); testing
    # h & mask != 0 avoids per-bit shifts, which need literal shift amounts
    bit_vals = F.array(
        *[F.lit(1 << b).cast("long") for b in range(63)]
        + [F.lit(-(1 << 63)).cast("long")]
    )
    zeros = F.array(*[F.lit(0) for _ in range(64)])
    votes = F.aggregate(
        hashes,
        zeros,
        lambda acc, h: F.zip_with(
            acc,
            bit_vals,
            lambda a, p: a
            + F.when(h.bitwiseAND(p) != 0, 1).otherwise(-1),
        ),
    )
    return F.aggregate(
        F.zip_with(
            votes,
            bit_vals,
            lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def repetition_ratio(text: str | Column, n: int = 10) -> Column:
    """Gopher-style repetition signal: fraction of character n-gram
    positions whose n-gram occurs more than once in the document —
    1 - distinct/total over the position-strided gram list.  0 for
    docs shorter than n (nothing can repeat)."""
    t = _c(text)
    idx = F.sequence(
        F.lit(1), F.greatest(F.length(t) - (n - 1), F.lit(1))
    )
    grams = F.transform(idx, lambda i: t.substr(i, F.lit(n)))
    total = F.size(grams)
    distinct = F.size(F.array_distinct(grams))
    return F.when(F.length(t) < n, F.lit(0.0)).otherwise(
        1.0 - distinct / total
    )


PII_PATTERNS = {
    # deliberately simple character-class patterns (no lookarounds) so the
    # Java-regex and RE2/DuckDB engines match the identical spans
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+",
    "phone": r"\+?[0-9][0-9 ()-]{7,}[0-9]",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}


def scrub_pii(text: str | Column) -> Column:
    """Redact emails / phone-ish numbers / IPv4s with typed placeholder
    tokens, applied in a fixed order (email first: its local part could
    otherwise be half-eaten by the phone pattern)."""
    out = _c(text)
    for name in ("email", "ipv4", "phone"):
        out = F.regexp_replace(out, PII_PATTERNS[name], f"<{name.upper()}>")
    return out


def pii_counts(text: str | Column) -> Column:
    """struct(email, ipv4, phone) match counts — the redaction lineage a
    scrubbing run logs.  Counted in the same fixed order on the
    progressively scrubbed text, matching scrub_pii exactly."""
    out = _c(text)
    fields = []
    for name in ("email", "ipv4", "phone"):
        pat = PII_PATTERNS[name]
        fields.append(
            F.size(
                F.filter(
                    F.regexp_extract_all(out, F.lit(pat), 0),
                    lambda s: F.length(s) > 0,
                )
            ).alias(f"n_{name}")
        )
        out = F.regexp_replace(out, pat, f"<{name.upper()}>")
    return F.struct(*fields)


def lexical_diversity(text: str | Column) -> Column:
    """struct(n_tok, n_types, n_hapax) — exact lexical-diversity counts
    per document, computed entirely IN-ROW (zero shuffles: the whole
    thing is one whole-stage-codegen projection over the scan, where the
    two-aggregate alternative would exchange an exploded (doc, word)
    stream twice — at 100 TB that is the difference between a map-only
    pass and reshuffling the tokenized corpus).

    Mechanics: sort the whitespace-token array once, then types and
    hapaxes are run-length facts — position i starts a run when
    ``s[i] != s[i-1]``, and is a hapax when it both starts and ends one.
    Type-token ratio / hapax share stay caller-side divisions of the two
    exact int64s (single correctly-rounded IEEE op each, so the DuckDB
    twin is bit-identical).
    """
    t = F.trim(F.lower(_c(text)))
    s = F.array_sort(
        F.filter(F.split(t, r"\s+"), lambda w: F.length(w) > 0)
    )
    n = F.size(s)
    starts = F.transform(
        s,
        lambda x, i: (i == F.lit(0)) | (x != F.get(s, i - 1)),
    )
    ends = F.transform(
        s,
        lambda x, i: (i == n - 1) | (x != F.get(s, i + 1)),
    )
    as_int = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long")
    )
    return F.struct(
        n.cast("long").alias("n_tok"),
        as_int(starts).alias("n_types"),
        as_int(
            F.zip_with(starts, ends, lambda a, b: a & b)
        ).alias("n_hapax"),
    )
