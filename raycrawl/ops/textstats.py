"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting. All vectorized-per-batch ``map_batches`` stages
over the ``documents`` table; stopword/profile tables are tiny constants
compiled once per actor.

Every metric here is defined so the DuckDB oracle can compute the identical
value (integer counts and exact integer-ratio doubles — single IEEE
division on both sides), except the fingerprint/language heuristics which
are rows-only checks.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

_WS_SPLIT_RE = re.compile(r"\s+")
_SENT_RE = re.compile(r"[.!?]")

STOPWORDS_EN = ("the", "a", "an", "and", "of", "to", "in", "is", "it", "that")
# tiny language profiles (function words) for the n-gram/stopword heuristic
LANG_PROFILES = {
    "en": {"the", "a", "and", "of", "to", "in", "is", "it", "that", "for", "on", "with"},
    "fr": {"le", "la", "les", "de", "des", "et", "un", "une", "est", "que", "pour", "dans"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von", "mit", "für"},
    "es": {"el", "la", "los", "las", "de", "y", "un", "una", "es", "que", "por", "con"},
}


def token_count(ds, id_col: str = "doc_id", text_col: str = "text"):
    """(doc_id, n_tokens): whitespace tokenization, matching DuckDB
    ``length(regexp_split_to_array(trim(text), '\\s+'))``."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].fillna("").str.strip().apply(
            lambda t: len(_WS_SPLIT_RE.split(t)) if t else 1)
        return pd.DataFrame({id_col: batch[id_col], "n_tokens": toks.astype("int64")})

    return ds.map_batches(f, batch_format="pandas")


def quality_score(ds, id_col: str = "doc_id", text_col: str = "text"):
    """(doc_id, n_chars, n_words, n_sentences, n_stopwords, stop_ratio,
    mean_word_len) — boilerplate/quality heuristics with exact SQL
    equivalents (counts + one integer division each)."""
    stop = set(STOPWORDS_EN)

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[text_col].fillna("")
        n_chars = texts.str.len().astype("int64")
        words = texts.apply(lambda t: _WS_SPLIT_RE.split(t.strip()) if t.strip() else [])
        n_words = words.apply(len).astype("int64")
        n_sent = texts.apply(lambda t: len(_SENT_RE.findall(t))).astype("int64")
        n_stop = words.apply(lambda ws: sum(1 for w in ws if w in stop)).astype("int64")
        total_word_chars = words.apply(lambda ws: sum(len(w) for w in ws)).astype("int64")
        stop_ratio = np.where(n_words > 0, n_stop / n_words.clip(lower=1), 0.0)
        mean_word_len = np.where(n_words > 0,
                                 total_word_chars / n_words.clip(lower=1), 0.0)
        return pd.DataFrame({
            id_col: batch[id_col],
            "n_chars": n_chars,
            "n_words": n_words,
            "n_sentences": n_sent,
            "n_stopwords": n_stop,
            "stop_ratio": stop_ratio,
            "mean_word_len": mean_word_len,
        })

    return ds.map_batches(f, batch_format="pandas")


def gopher_quality(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Gopher-style document quality rules (Rae et al. 2021, Appendix A —
    public heuristics), restricted to the word-level subset whose values a
    SQL engine reproduces exactly (the sf documents are single-line, so
    the line-shape rules are vacuous on this corpus): word count in
    [50, 100k], mean word length in [3, 10], symbol-to-word ratio
    ('#' plus non-overlapping '...') < 0.1, ≥ 80% of words containing an
    alphabetic character, ≥ 2 distinct English stop words. Every
    threshold is applied as an integer cross-multiplication — no float
    compares — so the keep flag is bit-exact against the oracle."""
    stop = set(STOPWORDS_EN)
    alpha_re = re.compile(r"[A-Za-z]")

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[text_col].fillna("")
        words = texts.apply(
            lambda t: _WS_SPLIT_RE.split(t.strip()) if t.strip() else [])
        n_words = words.apply(len).astype("int64")
        twc = words.apply(lambda ws: sum(len(w) for w in ws)).astype("int64")
        alpha = words.apply(
            lambda ws: sum(1 for w in ws if alpha_re.search(w))).astype("int64")
        # str.count is non-overlapping left-to-right — identical to the
        # oracle's (length - length(replace(...))) arithmetic
        sym = texts.apply(lambda t: t.count("#") + t.count("...")) \
            .astype("int64")
        stops = words.apply(
            lambda ws: len(stop.intersection(ws))).astype("int64")
        keep = ((n_words >= 50) & (n_words <= 100_000)
                & (3 * n_words <= twc) & (twc <= 10 * n_words)
                & (10 * sym < n_words)
                & (5 * alpha >= 4 * n_words)
                & (stops >= 2))
        return pd.DataFrame({
            id_col: batch[id_col], "n_words": n_words,
            "total_word_chars": twc, "n_alpha_words": alpha,
            "n_symbols": sym, "n_stop_distinct": stops,
            "keep": keep.astype(bool)})

    return ds.map_batches(f, batch_format="pandas")


def repetition_stats(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Repetition signals in the Gopher family (Rae et al. 2021 §A1.1):
    distinct-word count (duplicate-word fraction = 1 − distinct/total) and
    the occurrence count of the most frequent adjacent word bigram. All
    integers — exact against the SQL oracle."""
    from collections import Counter

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[text_col].fillna("")
        words = texts.apply(
            lambda t: _WS_SPLIT_RE.split(t.strip()) if t.strip() else [])
        n_words = words.apply(len).astype("int64")
        n_distinct = words.apply(lambda ws: len(set(ws))).astype("int64")
        top_bg = words.apply(
            lambda ws: max(Counter(zip(ws, ws[1:])).values())
            if len(ws) >= 2 else 0).astype("int64")
        return pd.DataFrame({
            id_col: batch[id_col], "n_words": n_words,
            "n_distinct_words": n_distinct,
            "top_bigram_count": top_bg})

    return ds.map_batches(f, batch_format="pandas")


def _bounded_topk_vocab(ds, count_batch, key_col: str, top_k: int,
                        n_parts: int = 32) -> dict:
    """Pass-1 gram vocabulary with BOUNDED driver memory (the round-3
    verdict's last unbounded driver materialization): per-batch Counter
    partials → coarse hash-partition shuffle (after the per-partition
    combine, each gram's TOTAL corpus count lives in exactly one
    partition) → per-partition exact sum + deterministic top-K truncation
    (cnt desc, gram asc — 'mergesort' for stable ties) → driver merge of
    at most ``n_parts × top_k`` candidate rows → global top-K.

    Because every gram's total is confined to one partition, the global
    top-K is a subset of the union of per-partition top-Ks, so the
    retained counts are EXACT — this is exact distributed top-K, not a
    sketch. When the corpus has ≤ top_k distinct grams nothing is
    truncated and the result equals the full vocabulary (the case at
    every sf benchmark scale, keeping the SQL oracles exact). At web
    scale driver RSS is O(n_parts × top_k) and the broadcast dict is
    O(top_k), independent of corpus size; evicted tail grams score with
    default count 0 — the production KenLM-style capped-vocab semantics
    (tools/commonness_scale_check.py probes ≥10M distinct grams)."""
    from .agg import partitioned_map_partitions

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        t = g.groupby(key_col, as_index=False)["cnt"].sum()
        if len(t) > top_k:
            t = t.sort_values(["cnt", key_col], ascending=[False, True],
                              kind="mergesort").head(top_k)
        return t

    partials = ds.map_batches(count_batch, batch_format="pandas",
                              batch_size=65536)
    merged = partitioned_map_partitions(partials, [key_col], combine,
                                        n_parts=n_parts)
    frames = list(merged.iter_batches(batch_size=None,
                                      batch_format="pandas"))
    if not frames:
        return {}
    allp = pd.concat(frames, ignore_index=True)
    if len(allp) > top_k:
        allp = allp.sort_values(["cnt", key_col],
                                ascending=[False, True],
                                kind="mergesort").head(top_k)
    return dict(zip(allp[key_col], allp["cnt"]))


def unigram_commonness(ds, id_col: str = "doc_id", text_col: str = "text",
                       vocab_top_k: int = 1_000_000):
    """Corpus-statistics document scoring — the LM-quality-filter pipeline
    SHAPE with an exact integer surrogate: pass 1 computes corpus-wide
    unigram counts via a coarse-partition shuffle capped to an exact
    top-K table (``_bounded_topk_vocab`` — bounded driver memory), which
    is broadcast via ``ray.put``; pass 2 scores each document by the sum
    and min of its tokens' corpus frequencies (a rare-token document has
    a low min_freq — the analogue of high LM surprisal). Integer counts
    on both sides; exact against the SQL oracle whenever distinct
    unigrams ≤ ``vocab_top_k`` (true at every sf scale — the synthetic
    corpus has 31 distinct words); beyond the cap, tail tokens score 0,
    the capped-vocab LM convention."""
    import ray

    from collections import Counter

    def count_batch(batch: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for t in batch[text_col].fillna(""):
            t = t.strip()
            if t:
                c.update(_WS_SPLIT_RE.split(t))
        return pd.DataFrame({"w": list(c.keys()),
                             "cnt": pd.Series(list(c.values()),
                                              dtype="int64")})

    vocab = _bounded_topk_vocab(ds, count_batch, "w", vocab_top_k)
    vref = ray.put(vocab)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        v = ray.get(vref)
        sums, mins = [], []
        for t in batch[text_col].fillna(""):
            t = t.strip()
            toks = _WS_SPLIT_RE.split(t) if t else []
            if toks:
                freqs = [v.get(w, 0) for w in toks]
                sums.append(sum(freqs))
                mins.append(min(freqs))
            else:
                sums.append(0)
                mins.append(0)
        return pd.DataFrame({id_col: batch[id_col],
                             "sum_freq": pd.Series(sums, dtype="int64"),
                             "min_freq": pd.Series(mins, dtype="int64")})

    return ds.map_batches(score, batch_format="pandas")


def bigram_commonness(ds, id_col: str = "doc_id", text_col: str = "text",
                      vocab_top_k: int = 1_000_000):
    """Conditional (bigram) corpus-statistics scoring — the KenLM-style
    LM-filter shape one order up from ``unigram_commonness``: pass 1
    aggregates corpus-wide ADJACENT-BIGRAM counts through the same
    bounded exact-top-K shuffle (``_bounded_topk_vocab`` — driver memory
    O(parts × top_k) regardless of corpus size, the web-scale fix for
    the bigram table that grows ~O(corpus tokens)); pass 2 scores each
    document by its bigram count, the sum of its bigrams' corpus
    frequencies, and how many of its bigrams are corpus-novel (count 1 —
    the exact-integer analogue of high conditional surprisal, and a
    boilerplate/template detector when near 0). Exact against the SQL
    oracle whenever distinct bigrams ≤ ``vocab_top_k``; beyond the cap,
    evicted tail bigrams score 0 (and are NOT counted novel — novelty
    means corpus count exactly 1)."""
    from collections import Counter

    import ray

    def count_batch(batch: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for t in batch[text_col].fillna(""):
            t = t.strip()
            if t:
                ws = _WS_SPLIT_RE.split(t)
                c.update("\x01".join(p) for p in zip(ws, ws[1:]))
        return pd.DataFrame({"b": list(c.keys()),
                             "cnt": pd.Series(list(c.values()),
                                              dtype="int64")})

    counts = _bounded_topk_vocab(ds, count_batch, "b", vocab_top_k)
    cref = ray.put(counts)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        v = ray.get(cref)
        n_bg, sums, novel = [], [], []
        for t in batch[text_col].fillna(""):
            t = t.strip()
            ws = _WS_SPLIT_RE.split(t) if t else []
            # .get like unigram_commonness: a top-K-capped broadcast
            # table must score unseen bigrams as frequency 0, not raise
            freqs = [v.get("\x01".join(p), 0) for p in zip(ws, ws[1:])]
            n_bg.append(len(freqs))
            sums.append(sum(freqs))
            novel.append(sum(1 for f in freqs if f == 1))
        return pd.DataFrame({id_col: batch[id_col],
                             "n_bigrams": pd.Series(n_bg, dtype="int64"),
                             "sum_bg_freq": pd.Series(sums, dtype="int64"),
                             "n_novel": pd.Series(novel, dtype="int64")})

    return ds.map_batches(score, batch_format="pandas")


class LangIdStage:
    """Stopword-profile language ID (n-gram heuristic). Profiles compiled
    once per actor; deterministic tie-break by profile order then 'und'."""

    def __init__(self) -> None:
        self.profiles = {k: frozenset(v) for k, v in LANG_PROFILES.items()}
        self.order = list(LANG_PROFILES.keys())

    def classify(self, text: str) -> str:
        toks = [t.lower() for t in _WS_SPLIT_RE.split(text.strip()) if t]
        if not toks:
            return "und"
        best_lang, best_score = "und", 0
        for lang in self.order:
            score = sum(1 for t in toks if t in self.profiles[lang])
            if score > best_score:
                best_lang, best_score = lang, score
        return best_lang

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        preds = batch["text"].fillna("").apply(self.classify)
        out = batch[["doc_id"]].copy()
        out["lang_pred"] = preds
        return out


def lang_id(ds, concurrency: int = 4):
    return ds.map_batches(LangIdStage, batch_format="pandas",
                          concurrency=concurrency)


def rolling_fingerprint(text: str, window: int = 5) -> int:
    """Winnowing-style document fingerprint (Schleimer et al. 2003, public
    alg): hash per word token, sliding-window min selection, XOR-fold of
    the distinct window minima to one 63-bit value. Deterministic,
    whitespace-tokenized; token hash = md5 first-8-bytes big-endian so a
    SQL engine reproduces the fingerprint exactly (window min via a ROWS
    window frame + bit_xor of DISTINCT minima)."""
    toks = _WS_SPLIT_RE.split(text.strip()) if text.strip() else []
    if not toks:
        return 0
    hs = [int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
          for t in toks]
    if len(hs) < window:
        acc = 0
        for h in hs:
            acc ^= h
        return acc & ((1 << 63) - 1)
    mins = []
    for i in range(len(hs) - window + 1):
        mins.append(min(hs[i : i + window]))
    acc = 0
    for m in set(mins):
        acc ^= m
    return acc & ((1 << 63) - 1)


def fingerprints(ds, id_col: str = "doc_id", text_col: str = "text"):
    def f(batch: pd.DataFrame) -> pd.DataFrame:
        fps = batch[text_col].fillna("").apply(rolling_fingerprint)
        return pd.DataFrame({id_col: batch[id_col],
                             "fingerprint": fps.astype("int64")})

    return ds.map_batches(f, batch_format="pandas")


# GPT-2-style pre-tokenizer pattern (Radford et al. 2019, public), adapted
# to stdlib `re` AND RE2 (no \p classes, no lookahead — GPT-2's
# `\s+(?!\S)` branch is dropped so DuckDB's regexp_extract_all counts the
# identical tokens): contractions, letter runs, digit runs, punctuation
# runs, whitespace runs.
_BPE_SPLIT_RE = re.compile(
    r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-zÀ-ÿĀ-￿]+| ?[0-9]+"
    r"| ?[^\sA-Za-zÀ-ÿĀ-￿0-9]+|\s+")


def bpe_ish_tokens(text: str) -> list[str]:
    """BPE-ish pre-tokenization (the split step of GPT-2's tokenizer —
    merges are model-specific and out of scope); deterministic, used for
    model-facing token accounting."""
    return _BPE_SPLIT_RE.findall(text)


def decontaminate(ds, benchmark_texts, n: int = 8, id_col: str = "doc_id",
                  text_col: str = "text"):
    """Benchmark decontamination (standard pretraining-data step, e.g.
    GPT-3 appendix C / Dodge et al. 2021): flag documents sharing any
    word n-gram with a benchmark/eval set. The benchmark's n-gram set is
    built ONCE and broadcast via ``ray.put`` (small side — eval sets are
    tiny next to the corpus); every batch checks membership vectorized
    against the frozen set. Returns (id, n_overlap, contaminated)."""
    import ray

    bench: set[str] = set()
    for t in benchmark_texts:
        toks = _WS_SPLIT_RE.split(t.strip()) if t and t.strip() else []
        for i in range(max(0, len(toks) - n + 1)):
            bench.add(" ".join(toks[i : i + n]))
    bref = ray.put(frozenset(bench))

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        bset = ray.get(bref)

        def overlap(t: str) -> int:
            toks = _WS_SPLIT_RE.split(t.strip()) if t and t.strip() else []
            grams = {" ".join(toks[i : i + n])
                     for i in range(max(0, len(toks) - n + 1))}
            return len(grams & bset)

        counts = batch[text_col].fillna("").apply(overlap).astype("int64")
        return pd.DataFrame({id_col: batch[id_col],
                             "n_overlap": counts,
                             "contaminated": (counts > 0)})

    return ds.map_batches(f, batch_format="pandas")


def token_count_bpe(ds, id_col: str = "doc_id", text_col: str = "text"):
    """(doc_id, n_bpe_tokens): BPE-ish pre-token counts per document."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        counts = batch[text_col].fillna("").apply(lambda t: len(bpe_ish_tokens(t)))
        return pd.DataFrame({id_col: batch[id_col],
                             "n_bpe_tokens": counts.astype("int64")})

    return ds.map_batches(f, batch_format="pandas")


# PII patterns — RE2-compatible (no lookaround) so pyarrow's RE2 and
# DuckDB's RE2 apply them identically; replacement order is part of the
# contract (emails, then phones, then IPv4, each counted on the text as it
# stands when that pass runs).
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"(\+1[- ])?\d{3}-\d{3}-\d{4}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def pii_scrub(ds, id_col: str = "doc_id", text_col: str = "text"):
    """PII redaction (standard pretraining-data hygiene pass — e.g. the
    email/phone/IP scrubbing described for public corpora like The Pile /
    ROOTS): replaces emails, North-American phone numbers and IPv4
    addresses with typed sentinels and reports per-document match counts.

    Fully vectorized: three ``pc.count_substring_regex`` +
    ``pc.replace_substring_regex`` passes per batch (RE2, zero-copy Arrow
    in/out); the compiled regex programs live inside Arrow's kernel cache,
    so there is no per-row Python. Streams — output is (id, n_emails,
    n_phones, n_ips, text_scrubbed)."""
    import pyarrow.compute as pc

    def f(batch: pa.Table) -> pa.Table:
        t = pc.cast(batch.column(text_col), pa.string())
        t = pc.coalesce(t, "")
        n_email = pc.count_substring_regex(t, PII_EMAIL_RE)
        t = pc.replace_substring_regex(t, PII_EMAIL_RE, "<EMAIL>")
        n_phone = pc.count_substring_regex(t, PII_PHONE_RE)
        t = pc.replace_substring_regex(t, PII_PHONE_RE, "<PHONE>")
        n_ip = pc.count_substring_regex(t, PII_IPV4_RE)
        t = pc.replace_substring_regex(t, PII_IPV4_RE, "<IP>")
        return pa.table({
            id_col: batch.column(id_col),
            "n_emails": pc.cast(n_email, pa.int64()),
            "n_phones": pc.cast(n_phone, pa.int64()),
            "n_ips": pc.cast(n_ip, pa.int64()),
            "text_scrubbed": t,
        })

    return ds.map_batches(f, batch_format="pyarrow")


# exact whitespace class shared with the SQL oracle: RE2's \s is
# [\t\n\f\r ] (ASCII, no \v) while Python's \s is Unicode-wide — so both
# sides spell the class out
_WS_COLLAPSE_RE = re.compile(r"[\t\n\f\r ]+")


def normalize_unicode(text: str) -> str:
    """One document through the normalization chain: NFC → strip all
    Unicode marks (category M*, via NFD decomposition) → NFC recompose →
    casefold to lower → collapse ASCII whitespace runs → trim spaces.

    Matches DuckDB's ``trim(regexp_replace(lower(strip_accents(
    nfc_normalize(t))), '[\\t\\n\\f\\r ]+', ' ', 'g'), ' ')`` exactly
    (probed across Latin accents, arbitrary combining marks, Indic matras,
    Hangul, CJK): utf8proc's strip_accents removes category-M codepoints,
    not just nonzero-combining-class ones, and recomposes Hangul — hence
    unicodedata here rather than pyarrow's utf8_normalize, whose NFC does
    not recompose Hangul Jamo (utf8proc quirk)."""
    import unicodedata

    t = unicodedata.normalize("NFC", text)
    t = "".join(c for c in unicodedata.normalize("NFD", t)
                if not unicodedata.category(c).startswith("M"))
    t = unicodedata.normalize("NFC", t).lower()
    return _WS_COLLAPSE_RE.sub(" ", t).strip(" ")


def normalize_text(ds, id_col: str = "doc_id", text_col: str = "text"):
    """(id, text_norm): Unicode normalization pass (the standard corpus
    cleanup before tokenization/dedup). Per-row ``unicodedata`` — the
    vectorized Arrow chain is blocked by the Hangul-recomposition quirk
    documented on ``normalize_unicode``; the kernel is still C-speed per
    string and the stage streams like every other textstats op."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[text_col].fillna("").apply(normalize_unicode)
        return pd.DataFrame({id_col: batch[id_col], "text_norm": out})

    return ds.map_batches(f, batch_format="pandas")


def quality_gate(ds, q: "tuple[int, int]" = (9, 10),
                 id_col: str = "doc_id", text_col: str = "text"):
    """Corpus-percentile quality gate — the canonical LLM-data filter
    shape, composed from existing scale-safe pieces:

    1. per-doc integer score (whitespace token count, ``token_count``),
       materialized ONCE as a slim (id, n_tokens) projection so the
       later passes never re-tokenize;
    2. the exact q-th order statistic of the score across the corpus via
       the two-pass distributed-selection op
       (``sketch.exact_quantile_selection`` — driver memory O(n_bins),
       second pass reads only the target bins);
    3. the scalar threshold broadcast into a streaming filter.

    Returns (id_col, n_tokens) of docs with score >= threshold. Exact
    SQL oracle: order statistic at idx = (q_num·(n−1))//q_den."""
    from .sketch import exact_quantile_selection

    scored = token_count(ds, id_col=id_col, text_col=text_col).materialize()
    thr = int(exact_quantile_selection(
        scored, "n_tokens", qs=[q])["quantile_value"].iloc[0])

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        return b[b["n_tokens"] >= thr]

    return scored.map_batches(keep, batch_format="pandas")


def vocab_stats(ds, id_col: str = "doc_id", text_col: str = "text",
                n_parts: int = 64) -> pd.DataFrame:
    """Corpus vocabulary statistics: total whitespace tokens + EXACT
    distinct-token count, scale-safe — per-batch ``pd.unique`` shrinks
    each batch to its unique tokens before any shuffle, then coarse hash
    partitions (``agg.partitioned_map_partitions``) count distinct per
    partition; the driver folds ≤ n_parts rows. No per-token Ray group,
    no driver-side token set (SURVEY.md §7.5 shuffle rules)."""
    from .agg import partitioned_map_partitions

    def totals(b: pd.DataFrame) -> pd.DataFrame:
        texts = b[text_col].fillna("").str.strip()
        n = sum(len(_WS_SPLIT_RE.split(t)) if t else 1 for t in texts)
        return pd.DataFrame({"n": pd.Series([n], dtype="int64")})

    n_tokens = int(ds.map_batches(
        totals, batch_format="pandas").to_pandas()["n"].sum())

    def uniq_batch(b: pd.DataFrame) -> pd.DataFrame:
        texts = b[text_col].fillna("").str.strip()
        toks = [_WS_SPLIT_RE.split(t) if t else [""] for t in texts]
        if toks:
            u = pd.unique(np.concatenate(
                [np.asarray(x, dtype=object) for x in toks]))
        else:
            u = np.array([], dtype=object)
        return pd.DataFrame({"token": pd.Series(u, dtype=object)})

    parts = partitioned_map_partitions(
        ds.map_batches(uniq_batch, batch_format="pandas"), "token",
        lambda g: pd.DataFrame(
            {"n": pd.Series([g["token"].nunique()], dtype="int64")}),
        n_parts=n_parts).to_pandas()
    return pd.DataFrame({
        "n_tokens": pd.Series([n_tokens], dtype="int64"),
        "n_distinct_tokens": pd.Series([int(parts["n"].sum())],
                                       dtype="int64")})


def collocations(ds, k: int = 50, text_col: str = "text",
                 n_parts: int = 64) -> pd.DataFrame:
    """Corpus-wide top-k adjacent-bigram collocations, integer-exact:
    per-batch bigram value_counts (the combiner — each batch shrinks to
    its distinct bigrams before any shuffle) → coarse hash partitions
    sum per bigram and keep their local top-k (safe: a bigram lives
    wholly in one hash partition) → driver merges ≤ n_parts·k rows.
    Ties broken by (w1, w2) so the result is deterministic and matches
    the SQL oracle ORDER BY."""
    from .agg import partitioned_map_partitions

    def big_batch(b: pd.DataFrame) -> pd.DataFrame:
        texts = b[text_col].fillna("").str.strip()
        bgs = []
        for t in texts:
            ws = _WS_SPLIT_RE.split(t) if t else []
            if len(ws) > 1:
                bgs.append(np.asarray(
                    [a + "\x01" + c for a, c in zip(ws, ws[1:])],
                    dtype=object))
        if not bgs:
            return pd.DataFrame({"bg": pd.Series(dtype=object),
                                 "cnt": pd.Series(dtype="int64")})
        vc = pd.Series(np.concatenate(bgs)).value_counts()
        return pd.DataFrame({"bg": vc.index.to_numpy(object),
                             "cnt": vc.to_numpy("int64")})

    def part_topk(g: pd.DataFrame) -> pd.DataFrame:
        agg = (g.groupby("bg", sort=False)["cnt"].sum().reset_index())
        parts = agg["bg"].str.split("\x01", n=1, expand=True)
        if len(parts.columns) < 2:  # empty partition
            return pd.DataFrame({"w1": pd.Series(dtype=object),
                                 "w2": pd.Series(dtype=object),
                                 "cnt": pd.Series(dtype="int64")})
        out = pd.DataFrame({"w1": parts[0], "w2": parts[1],
                            "cnt": agg["cnt"].astype("int64")})
        return out.sort_values(["cnt", "w1", "w2"],
                               ascending=[False, True, True]).head(k)

    cand = partitioned_map_partitions(
        ds.map_batches(big_batch, batch_format="pandas"), "bg",
        part_topk, n_parts=n_parts).to_pandas()
    return (cand.sort_values(["cnt", "w1", "w2"],
                             ascending=[False, True, True])
            .head(k).reset_index(drop=True))


def pack_sequences(ds, id_col: str = "doc_id", text_col: str = "text",
                   max_tokens: int = 256, shard_size: int = 512,
                   n_parts: int = 32):
    """Training-sequence packing — the step between a cleaned corpus and
    a token-budgeted training shard (every LLM data pipeline ends here):
    greedy first-fit of documents into sequences of ≤ ``max_tokens``
    whitespace tokens, packed WITHIN doc-id shards of ``shard_size``
    docs (the standard practice: packing is order-sequential, so it runs
    shard-local — deterministic, embarrassingly parallel, and a resumed
    run repacks identically).

    Output: (doc_id, shard, seq_local, offset, n_tokens) — seq_local is
    the sequence ordinal within the shard, offset the token position of
    the doc inside its sequence. A doc longer than the budget opens its
    own (overlong) sequence rather than being silently truncated —
    callers decide whether to split or drop. Empty docs count 1 token
    (the token_count convention, shared with the SQL oracle).

    Scale shape: shards hash-route through coarse partitions
    (``partitioned_map_partitions``); the per-shard greedy fold is a
    trivial O(shard_size) loop over integers — no shuffle beyond the one
    partition exchange, no driver state."""
    from .agg import partitioned_map_partitions

    def tok(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[text_col].fillna("").str.strip()
        n = t.apply(lambda s: len(_WS_SPLIT_RE.split(s)) if s else 1)
        return pd.DataFrame({
            id_col: batch[id_col].astype("int64"),
            "shard": (batch[id_col].astype("int64") // shard_size),
            "n_tokens": n.astype("int64")})

    def pack(part: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for shard, g in part.groupby("shard", sort=False):
            g = g.sort_values(id_col)
            ids = g[id_col].to_numpy()
            ns = g["n_tokens"].to_numpy()
            seq = np.empty(len(g), dtype=np.int64)
            off = np.empty(len(g), dtype=np.int64)
            cur_seq, fill = 0, 0
            first = True
            for i, n in enumerate(ns):
                if first:
                    cur_seq, fill = 0, int(n)
                    seq[i], off[i] = 0, 0
                    first = False
                elif fill + n <= max_tokens:
                    seq[i], off[i] = cur_seq, fill
                    fill += int(n)
                else:
                    cur_seq += 1
                    seq[i], off[i] = cur_seq, 0
                    fill = int(n)
            outs.append(pd.DataFrame({
                id_col: ids, "shard": np.full(len(g), shard, dtype=np.int64),
                "seq_local": seq, "offset": off, "n_tokens": ns}))
        return pd.concat(outs, ignore_index=True)

    tokens = ds.map_batches(tok, batch_format="pandas")
    return partitioned_map_partitions(tokens, ["shard"], pack,
                                      n_parts=n_parts)


def commonness_buckets(ds, id_col: str = "doc_id", text_col: str = "text",
                       vocab_top_k: int = 1_000_000):
    """CCNet-style corpus partitioning (Wenzek et al. 2020 §4.3 — public
    paper): score every document by LM-commonness (here the exact
    integer unigram surrogate, ``unigram_commonness``), take exact
    corpus terciles of the score, and label each doc head / middle /
    tail (head = most corpus-common — CCNet's lowest-perplexity bucket).
    The tercile thresholds are exact order statistics at
    idx = q·(n−1) // 3 via the two-pass distributed selection
    (``sketch.exact_quantile_selection`` — O(n_bins) driver memory);
    ties classify by VALUE against the thresholds (≤ t33 → tail,
    ≤ t66 → middle), so bucketing is deterministic and SQL-replayable.

    The score table (3 int64 columns per doc) is materialized once so
    the threshold pass and the labeling pass don't recompute scoring —
    at web scale it is O(docs) fixed-width rows in the object store,
    spillable."""
    from .sketch import exact_quantile_selection

    scored = unigram_commonness(ds, id_col=id_col, text_col=text_col,
                                vocab_top_k=vocab_top_k).materialize()
    qs = exact_quantile_selection(scored, "sum_freq", [(1, 3), (2, 3)])
    t = {(int(r.q_num), int(r.q_den)): int(r.quantile_value)
         for r in qs.itertuples()}
    t33, t66 = t[(1, 3)], t[(2, 3)]

    def label(b: pd.DataFrame) -> pd.DataFrame:
        v = b["sum_freq"].to_numpy()
        bucket = np.where(v <= t33, "tail",
                          np.where(v <= t66, "middle", "head"))
        return pd.DataFrame({id_col: b[id_col],
                             "sum_freq": b["sum_freq"],
                             "bucket": bucket})

    return scored.map_batches(label, batch_format="pandas")


def split_overlong(ds, id_col: str = "doc_id", text_col: str = "text",
                   max_tokens: int = 256):
    """Window overlong documents BEFORE packing: docs of more than
    ``max_tokens`` whitespace tokens split into consecutive
    ``max_tokens``-sized pieces (last piece short) — the companion to
    ``pack_sequences``'s own-sequence-for-overlong policy when the
    recipe prefers splitting to oversized sequences. Output one row per
    piece: (doc_id, piece_idx, n_tokens, piece) with token-boundary
    splits, exactly replayable in SQL via list_slice windows."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        ids, pidx, ntok, piece = [], [], [], []
        for i, t in zip(batch[id_col], batch[text_col].fillna("")):
            t = t.strip()
            ws = _WS_SPLIT_RE.split(t) if t else []
            if not ws:
                ids.append(i); pidx.append(0); ntok.append(0)
                piece.append("")
                continue
            for k in range(0, len(ws), max_tokens):
                chunk = ws[k:k + max_tokens]
                ids.append(i)
                pidx.append(k // max_tokens)
                ntok.append(len(chunk))
                piece.append(" ".join(chunk))
        return pd.DataFrame({
            id_col: pd.Series(ids, dtype="int64"),
            "piece_idx": pd.Series(pidx, dtype="int64"),
            "n_tokens": pd.Series(ntok, dtype="int64"),
            "piece": piece})

    return ds.map_batches(f, batch_format="pandas")


def dup_ngram_stats(ds, ngram: int = 5, n_parts: int = 256,
                    id_col: str = "doc_id", text_col: str = "text"):
    """Cross-document duplicated-n-gram fraction per doc — the RefinedWeb
    / MassiveText corpus-quality metric (Penedo et al. 2023 §"duplicated
    n-grams"; Rae et al. 2021 appendix A): for each document, the
    fraction of its n-gram OCCURRENCES whose n-gram appears in ≥ 2
    distinct documents corpus-wide. Unlike repetition_stats (intra-doc),
    this measures corpus-level boilerplate — high values flag template
    farms that survive exact/near dedup.

    Distributed shape (all coarse hash partitions, never per-key Ray
    groups; grams ride as STRINGS so the answer is hash-free exact):
      1. one map pass → (gram, doc_id, mult) rows, mult = occurrences of
         that gram in that doc (one row per distinct (gram, doc)), plus a
         tiny (doc_id, n_ngrams) denominator table;
      2. partition by gram → document frequency per gram IS the group
         size; per-doc partial numerators = Σ mult over df≥2 grams;
      3. partition by doc_id → fold partials + the denominator row.

    Returns (doc_id, n_dup_ngrams, n_ngrams, dup_ngram_frac) for EVERY
    input doc (docs shorter than n grams report 0/0/0.0)."""
    import ray.data as rd  # noqa: F401  (documents the dependency)

    from .agg import partitioned_map_partitions

    def occurrences(batch: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        grams: list[str] = []
        ids: list[int] = []
        mults: list[int] = []
        for did, text in zip(batch[id_col], batch[text_col]):
            toks = (text or "").split()
            if len(toks) < ngram:
                continue
            c = Counter(" ".join(toks[i:i + ngram])
                        for i in range(len(toks) - ngram + 1))
            for g, m in c.items():
                grams.append(g)
                ids.append(int(did))
                mults.append(m)
        return pd.DataFrame({
            "gram": pd.Series(grams, dtype="string"),
            id_col: pd.Series(ids, dtype="int64"),
            "mult": pd.Series(mults, dtype="int64")})

    def denominators(batch: pd.DataFrame) -> pd.DataFrame:
        n = [max(len((t or "").split()) - ngram + 1, 0)
             for t in batch[text_col]]
        return pd.DataFrame({
            id_col: batch[id_col].astype("int64"),
            "n_dup_partial": pd.Series([0] * len(batch), dtype="int64"),
            "n_ngrams": pd.Series(n, dtype="int64")})

    def per_gram(part: pd.DataFrame) -> pd.DataFrame:
        # rows are unique per (gram, doc) → df(gram) is the group size
        df = part.groupby("gram")[id_col].transform("size")
        dup = part[df >= 2]
        if len(dup) == 0:
            return pd.DataFrame({
                id_col: pd.Series([], dtype="int64"),
                "n_dup_partial": pd.Series([], dtype="int64"),
                "n_ngrams": pd.Series([], dtype="int64")})
        out = dup.groupby(id_col, as_index=False)["mult"].sum() \
            .rename(columns={"mult": "n_dup_partial"})
        out["n_ngrams"] = pd.Series([0] * len(out), dtype="int64")
        return out[[id_col, "n_dup_partial", "n_ngrams"]]

    def fold(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby(id_col, as_index=False).agg(
            n_dup_ngrams=("n_dup_partial", "sum"),
            n_ngrams=("n_ngrams", "sum"))
        denom = g["n_ngrams"].to_numpy()
        num = g["n_dup_ngrams"].to_numpy()
        frac = np.where(denom > 0, num / np.maximum(denom, 1), 0.0)
        g["dup_ngram_frac"] = frac
        return g

    occ = ds.map_batches(occurrences, batch_format="pandas")
    partials = partitioned_map_partitions(occ, ["gram"], per_gram,
                                          n_parts=n_parts)
    dens = ds.map_batches(denominators, batch_format="pandas")
    return partitioned_map_partitions(partials.union(dens), [id_col],
                                      fold, n_parts=n_parts)


def top_tokens_per_lang(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """Per-language top-k tokens by corpus frequency (ties break to the
    lexicographically smaller token) — the grouped heavy-vocabulary
    report (per-language stopword audit, tokenizer sanity check).

    Exact WITHOUT materializing any language's vocabulary in one place:
    per-batch (lang, tok) count partials shuffle on the (lang, tok) key
    — so each token's total lands complete inside ONE coarse partition
    — where a per-partition per-lang top-k keeps ≤ |langs|·k candidate
    rows; the driver's final top-k over (partitions × k) candidates is
    then provably the global answer (a token outside every partition
    top-k cannot be in the global top-k). Same bounded-driver shape as
    the commonness vocab machinery."""
    import os as _os

    import ray.data as rd

    from .agg import partitioned_map_partitions

    docs = rd.read_parquet(_os.path.join(sf_dir, "documents.parquet"),
                           columns=["lang", "text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        langs, toks = [], []
        for lang, text in zip(b["lang"], b["text"]):
            t = (text or "").strip()
            parts = re.split(r"\s+", t) if t else [""]
            langs.extend([lang] * len(parts))
            toks.extend(parts)
        return (pd.DataFrame({"lang": langs, "tok": toks})
                .groupby(["lang", "tok"], as_index=False).size()
                .rename(columns={"size": "n"}))

    counts = docs.map_batches(partial, batch_format="pandas")

    def local_topk(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby(["lang", "tok"], as_index=False)["n"].sum()
        tot = tot.sort_values(["lang", "n", "tok"],
                              ascending=[True, False, True],
                              kind="mergesort")
        return tot.groupby("lang", sort=False).head(k)

    cand = partitioned_map_partitions(counts, ["lang", "tok"],
                                      local_topk).to_pandas()
    cand = cand.sort_values(["lang", "n", "tok"],
                            ascending=[True, False, True],
                            kind="mergesort")
    top = cand.groupby("lang", sort=False).head(k).copy()
    top["rnk"] = top.groupby("lang", sort=False).cumcount() + 1
    top["n"] = top["n"].astype("int64")
    top["rnk"] = top["rnk"].astype("int64")
    return (top[["lang", "tok", "n", "rnk"]]
            .sort_values(["lang", "rnk"]).reset_index(drop=True))
