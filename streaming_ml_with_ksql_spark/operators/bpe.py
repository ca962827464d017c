"""Distributed byte-pair-encoding (BPE) tokenizer: vocabulary training as
a Spark aggregation loop, and a pure-Catalyst apply path.

Tokenizer training is a genuine 100 TB pipeline workload (the reference
corpus tooling stops at regex token counts; a training-data pipeline
needs the vocab itself). The classic BPE algorithm (Sennrich et al.,
"Neural Machine Translation of Rare Words with Subword Units", ACL 2016
— public algorithm, independently implemented here) iteratively merges
the most frequent adjacent symbol pair.

Scale design:
- The corpus is scanned EXACTLY ONCE, into the distinct-word frame
  (word, count) — vocab-sized (millions of rows at 100 TB), not
  corpus-sized. Every training round iterates over that frame only.
- Each merge round is ONE pair-count aggregation (map-side combined
  groupBy over exploded adjacent pairs), ONE 1-row argmax collect (the
  chosen pair — a driver action over one row, not a corpus collect), and
  ONE column rewrite; the frame is localCheckpointed per round to keep
  the iterative lineage flat (same rationale as operators/graph.py).
- Applying a learned merge table is pure Catalyst: every symbol is
  individually DELIMITED as SEP+s+SEP (word 'ab' → '␁a␁␁b␁') and each
  merge (a,b) is one replace(SEP+a+SEP + SEP+b+SEP → SEP+ab+SEP) —
  whole-stage codegen, zero Python in the hot path. The full wrapping
  matters: a bare a+SEP+b pattern would also fire when a prior
  multi-char symbol merely ENDS with 'a' (merges (t,h),(th,e),(e,r)
  must NOT turn 'there' → [the,r,e] into one token via the spurious
  'e␁r' inside '…the␁r…'); with whole-symbol delimiters the pattern
  can only match two complete adjacent symbols. JVM replace() scans
  left-to-right non-overlapping, which with this encoding is exactly
  the BPE merge-apply semantics, and DuckDB's replace() agrees — that
  equivalence is what makes the fixed-merge tokenizer exactly
  ORACLE-able cross-engine.
- For production-size vocabs (32k merges) a chain of 32k string
  expressions is not a plan Catalyst should analyze; the Arrow kernel
  twin (bpe_tokenize_kernel) applies the merge list per distinct word
  with memoization and is pinned equal to the expression path in tests.

Symbols are characters of the lowercased word; \\x01 separates symbols
in the string form (scrubbed from input text first, so a pathological
document cannot forge token boundaries).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "train_bpe",
    "train_bpe_sampled",
    "bpe_tokenize",
    "bpe_tokenize_kernel",
    "FIXED_MERGES",
]

SEP = "\x01"

# A small fixed merge table (common English pairs, applied in order) used
# by the oracled serving query — the apply path's semantics don't depend
# on where the table came from.
FIXED_MERGES: tuple[tuple[str, str], ...] = (
    ("t", "h"),
    ("th", "e"),
    ("i", "n"),
    ("a", "n"),
    ("an", "d"),
    ("e", "r"),
    ("o", "n"),
    ("r", "e"),
)


def _words(docs: DataFrame, text_col: str) -> DataFrame:
    """Corpus → one row per word occurrence (lowercased, whitespace
    split, SEP scrubbed). Fanned out first (text._fan_out rationale):
    tokenize/merge cost follows rows × chars, not input bytes."""
    from .text import _fan_out

    cleaned = F.replace(F.lower(F.col(text_col)), F.lit(SEP), F.lit(""))
    return _fan_out(docs.select("doc_id", text_col), source=docs).select(
        F.col("doc_id"),
        F.explode(F.split(cleaned, r"\s+")).alias("w"),
    ).filter(F.length("w") > 0)


def _char_sep(col) -> F.Column:
    """Word → per-symbol delimited sequence: each character wrapped as
    SEP+c+SEP ('the' → '␁t␁␁h␁␁e␁'). Whole-symbol delimiters keep merge
    patterns from matching across a multi-char symbol's boundary."""
    return F.regexp_replace(col, "(.)", SEP + "$1" + SEP)


def _merge_chain(col, merges) -> F.Column:
    """Apply an ordered merge table to a symbol-delimited string — one
    JVM replace() per merge, left-to-right non-overlapping. The pattern
    SEP+a+SEP+SEP+b+SEP only matches two complete adjacent symbols
    (never a suffix of a previously merged symbol), and the replacement
    SEP+ab+SEP re-wraps the merged symbol so later merges see it whole."""
    s = col
    for a, b in merges:
        s = F.replace(s, F.lit(SEP + a + SEP + SEP + b + SEP), F.lit(SEP + a + b + SEP))
    return s


def _n_symbols(col) -> F.Column:
    """Symbol count of a delimited string: every symbol carries exactly
    two SEPs, so count = SEP occurrences / 2 — cheap length arithmetic,
    expressible identically in DuckDB."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(SEP), F.lit("")))) / 2
    ).cast("int")


def train_bpe(
    docs: DataFrame,
    *,
    text_col: str = "text",
    n_merges: int = 32,
    min_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn an ordered BPE merge table from the corpus. Ties break
    deterministically on (count DESC, a ASC, b ASC). Stops early when no
    pair reaches ``min_count``. Returns [(a, b), ...] in merge order.

    PRODUCTION NOTE (VERDICT r4 #7): each merge round is one Spark job
    (the 1-row argmax collect is inherent to BPE — the chosen pair feeds
    the next round), so a 32k-merge vocab is 32k sequential jobs over
    the vocab-sized frame. That is NOT the intended path over a full
    corpus: train the merge table ONCE on a deterministic sample
    (``train_bpe_sampled`` below — pair frequencies are corpus
    statistics, a hash-sample preserves their ranking), then apply the
    learned table to the full corpus with ``bpe_tokenize_kernel``
    (memoized Arrow kernel, one pass, no training jobs)."""
    wc = (
        _words(docs, text_col)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(_char_sep(F.col("w")).alias("s"), "cnt")
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        # split on SEP yields '' between/around the delimiters
        # ('␁a␁␁b␁' → ['','a','','b','']); drop them to recover symbols
        syms = F.filter(F.split("s", SEP), lambda x: x != F.lit(""))
        pairs = F.filter(
            F.transform(
                syms,
                lambda x, i: F.struct(
                    x.alias("a"), F.get(syms, i + 1).alias("b")
                ),
            ),
            lambda p: p["b"].isNotNull(),
        )
        best = (
            wc.select(F.explode(pairs).alias("p"), "cnt")
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["n"] < min_count:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        wc = wc.select(
            F.replace(
                "s", F.lit(SEP + a + SEP + SEP + b + SEP), F.lit(SEP + a + b + SEP)
            ).alias("s"),
            "cnt",
        ).localCheckpoint(eager=True)
    return merges


def train_bpe_sampled(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 32,
    min_count: int = 2,
    sample_mod: int = 4,
) -> list[tuple[str, str]]:
    """The production vocab-training path: learn the merge table on a
    deterministic 1/``sample_mod`` hash-sample of the corpus (md5 of the
    document id — reproducible across runs, partitionings, and engines),
    then apply it to the FULL corpus via ``bpe_tokenize_kernel``. Pair
    frequencies are corpus-level statistics, so a uniform sample
    preserves their ranking; tests/test_bpe.py pins sample-trained
    merges against full-corpus merges on the testdata. Cuts training
    cost by ``sample_mod``x and keeps the 1-row-per-round argmax loop
    off the full corpus entirely."""
    bucket = F.conv(
        F.substring(F.md5(F.concat(F.lit("bpe:"), F.col(id_col).cast("string"))), 1, 7),
        16,
        10,
    ).cast("long")
    sample = docs.filter(bucket % sample_mod == 0)
    return train_bpe(
        sample, text_col=text_col, n_merges=n_merges, min_count=min_count
    )


def bpe_tokenize(
    docs: DataFrame,
    merges=FIXED_MERGES,
    *,
    text_col: str = "text",
) -> DataFrame:
    """Per-document BPE token accounting through the pure-Catalyst apply
    path: (doc_id, n_words, n_chars, n_bpe_tokens). Every merge is one
    whole-stage-codegen replace(); token count = symbol count of the
    merged form. One narrow scan + one doc_id aggregation."""
    toks = _words(docs, text_col).select(
        "doc_id",
        F.length("w").alias("n_chars"),
        _n_symbols(_merge_chain(_char_sep(F.col("w")), merges)).alias("n_toks"),
    )
    return toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_words"),
        F.sum("n_chars").cast("int").alias("n_chars"),
        F.sum("n_toks").cast("int").alias("n_bpe_tokens"),
    )


def _kernel_batches(merges, text_col: str):
    merge_list = list(merges)

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, int] = {}

        def n_tokens(word: str) -> int:
            got = memo.get(word)
            if got is not None:
                return got
            syms = list(word)
            for a, b in merge_list:
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            memo[word] = len(syms)
            return len(syms)

        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf[text_col]):
                words = [
                    w
                    for w in (text or "").lower().replace(SEP, "").split()
                    if w
                ]
                if not words:
                    # match the expression path, whose word-level
                    # aggregation never sees zero-word documents
                    continue
                rows.append(
                    {
                        "doc_id": int(did),
                        "n_words": len(words),
                        "n_chars": sum(len(w) for w in words),
                        "n_bpe_tokens": sum(n_tokens(w) for w in words),
                    }
                )
            yield pd.DataFrame(rows).astype(
                {"n_words": "int32", "n_chars": "int32", "n_bpe_tokens": "int32"}
            )

    return _batches


def bpe_tokenize_kernel(
    docs: DataFrame,
    merges=FIXED_MERGES,
    *,
    text_col: str = "text",
) -> DataFrame:
    """Arrow-kernel twin of bpe_tokenize for production-size merge tables
    (a 32k-replace expression chain is not a reasonable Catalyst plan):
    per-batch memoized merge application over distinct words. Pinned
    result-equal to the expression path in tests."""
    return docs.select("doc_id", text_col).mapInPandas(
        _kernel_batches(merges, text_col),
        schema="doc_id long, n_words int, n_chars int, n_bpe_tokens int",
    )
