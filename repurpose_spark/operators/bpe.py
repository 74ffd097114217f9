"""Learned byte-pair-encoding: distributed training stats + encoding.

The engine's token counting (`functions/text.py::bpe_ish_token_count`)
estimates; this module LEARNS a real merge table from the corpus and
tokenizes with it — the classic Sennrich BPE semantics (word-internal
merges, end-of-word marker), the algorithm GPT-2-family tokenizers run.

Scale decomposition (what each phase costs at 100 TB):

1. **Word-frequency aggregation** — the ONLY pass over the corpus.
   Pure JVM: lower → split → explode → groupBy(word).count.  One
   shuffle on the word key with map-side combine; output is the
   distinct-word-form table, which is corpus-size-independent (Heaps'
   law: ~millions of forms for terabytes of text).
2. **Merge learning** — classic one-merge-at-a-time BPE over the TOP-V
   word forms by frequency (``max_word_forms``, default 50k — an
   ordered ``limit``, the same bounded-collect pattern as the IVF
   training sample, similarity.py:212).  Truncating the frequency TAIL
   is how production BPE trainers work: a form seen 3 times cannot
   outvote one seen 3 million times on any merge decision.  The loop
   itself is driver-side numpy/python over ≤V forms — the part that is
   inherently sequential (merge k+1 depends on merge k), so shipping it
   to executors would serialize anyway.
3. **Encoding** — embarrassingly parallel: merge ranks broadcast
   (~n_merges entries), Arrow-batched ``mapInPandas`` applies the GPT-2
   rank-priority merge loop per word with a per-executor word→ids cache
   (Zipf makes the cache hit rate extreme).  A Python UDF is justified
   here: iterated rank-priority pair merging is not expressible in JVM
   builtins (SURVEY §7 UDF policy).

Reference analog: the reference's preprocess hooks transform each
series with user Python (process.py:174-199); here the transform is a
learned, corpus-global function — which is exactly why training must be
distributed while application stays per-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EOW = "▁"  # end-of-word marker (SentencePiece's visible space)


# ----------------------------------------------------------- reference core
def _word_to_symbols(word: str) -> tuple:
    return tuple(word) + (EOW,)


def learn_merges_local(
    word_counts: list[tuple[str, int]], n_merges: int,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Classic BPE over a (word, count) table: repeatedly merge the
    most frequent adjacent symbol pair.  Deterministic tie-break:
    lexicographic pair order (frequency desc, then pair asc) so the
    learned table is reproducible regardless of dict order."""
    seqs: list[list] = []
    counts: list[int] = []
    for w, c in word_counts:
        if w:
            seqs.append(list(_word_to_symbols(w)))
            counts.append(int(c))

    # incremental pair bookkeeping: recounting every pair over every
    # form each round is O(n_merges × total_symbols); instead keep the
    # global pair counts plus an occurrence index and resync ONLY the
    # forms containing the merged pair (classic trainer optimization —
    # identical merge sequence, test-enforced vs the brute-force
    # reference)
    pair_counts: dict[tuple, int] = {}
    occ: dict[tuple, set] = {}
    for si, (seq, c) in enumerate(zip(seqs, counts)):
        for p in zip(seq, seq[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + c
            occ.setdefault(p, set()).add(si)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (a, b), _cnt = best
        merged = a + b
        merges.append((a, b))
        for si in occ.get((a, b), set()):
            seq, c = seqs[si], counts[si]
            # resync: retract this form's pairs, apply the merge,
            # re-add (stale occ members retract/re-add identically —
            # a harmless no-op, so occ never needs eager cleanup)
            for p in zip(seq, seq[1:]):
                left = pair_counts[p] - c
                if left > 0:
                    pair_counts[p] = left
                else:
                    del pair_counts[p]
            i = 0
            while i < len(seq) - 1:
                if seq[i] == a and seq[i + 1] == b:
                    seq[i : i + 2] = [merged]
                else:
                    i += 1
            for p in zip(seq, seq[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + c
                occ.setdefault(p, set()).add(si)
        occ.pop((a, b), None)
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """GPT-2 style application: repeatedly merge the lowest-ranked
    present pair.  Equivalent to replaying the learned merge sequence
    (rank order IS learning order)."""
    seq = list(_word_to_symbols(word))
    while len(seq) > 1:
        best_rank = None
        best_i = -1
        for i, pair in enumerate(zip(seq, seq[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        seq[best_i : best_i + 2] = [seq[best_i] + seq[best_i + 1]]
    return seq


# ------------------------------------------------------------- distributed
WORD_RE = r"[^\s]+"


def word_items(
    df: DataFrame, text_col: str = "text", extra_cols: list = ()
) -> DataFrame:
    """THE word tokenization of the engine (lower → JVM ``\\s+`` split →
    drop empties), shared by BPE training and the heavy-hitters
    ``top_words`` so the two can never drift: (extra_cols…, word)."""
    return df.select(
        *extra_cols,
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word"),
    ).where(F.col("word") != "")


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The corpus pass: (word, n) via pure JVM explode + groupBy —
    map-side combined, one shuffle on the word key."""
    return (
        word_items(df, text_col)
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 200,
    max_word_forms: int = 50_000,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Distributed word stats → classic merge learning (see module
    docstring for the scale decomposition).  The collect is a bounded
    ordered limit over word FORMS, not corpus rows."""
    top = (
        word_frequencies(df, text_col)
        .orderBy(F.desc("n"), "word")
        .limit(max_word_forms)
        .collect()
    )
    return learn_merges_local(
        [(r["word"], r["n"]) for r in top], n_merges, min_pair_count
    )


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize with a learned merge table: broadcast ranks, Arrow-
    batched mapInPandas, per-executor word→tokens cache (Zipf repeats
    make it ~always hot).  Output schema: input columns + ``out_col``
    array<string> + ``n_{out_col}`` int."""
    import pandas as pd

    spark = df.sparkSession
    ranks_b = spark.sparkContext.broadcast(
        {tuple(p): i for i, p in enumerate(merges)}
    )
    schema_str = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} array<string>, n_{out_col} int"

    def fn(batches):
        import re

        ranks = ranks_b.value
        cache: dict[str, list[str]] = {}
        # Java \s (the training/oracle split) is ASCII whitespace —
        # python str.split() would additionally split on NBSP etc.,
        # silently diverging from the learned word forms
        ws = re.compile(r"[ \t\n\x0b\f\r]+")

        def enc(text) -> list[str]:
            if text is None:
                return []
            text = str(text)
            if EOW in text:
                # the marker is the one reserved codepoint (same
                # contract as SentencePiece): corrupting it silently
                # would break detokenize losslessness — fail typed
                raise ValueError(
                    "text contains the reserved EOW marker U+2581; "
                    "escape it before bpe_encode"
                )
            out: list[str] = []
            for w in ws.split(text.lower()):
                if not w:
                    continue
                toks = cache.get(w)
                if toks is None:
                    toks = cache[w] = encode_word(w, ranks)
                out.extend(toks)
            return out

        for pdf in batches:
            toks = [enc(t) for t in pdf[text_col]]
            out = pdf.copy()
            out[out_col] = toks
            out[f"n_{out_col}"] = [len(t) for t in toks]
            yield out

    return df.mapInPandas(fn, schema_str)


def detokenize(tokens: list[str]) -> str:
    """Inverse of encode over one document's token list: tokens
    concatenate back to the lowercased, whitespace-normalized text —
    the lossless-roundtrip invariant the tests enforce."""
    return "".join(tokens).replace(EOW, " ").strip()
