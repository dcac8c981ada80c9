"""Text analysis ops for large-scale training-data pipelines.

All stages are vectorized ``map_batches`` transforms over the ``documents``
table ``(doc_id, text, lang, source, n_chars)``:

- ``token_count``     — whitespace-token counts (pyarrow regex kernel).
- ``fingerprint``     — md5 of whitespace-normalized text (exact-dup key;
                        SQL-oracle-able via DuckDB ``md5``).
- ``quality_score``   — length / punctuation / stopword / repetition
                        heuristics → one float score.
- ``lang_id``         — stopword-profile n-gram heuristic over
                        {en, es, fr, de}.

Stateful pieces (compiled regexes, stopword tables) live in actor
``__init__``; per-batch work is numpy/pyarrow kernels.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def deterministic_sample(batch: pa.Table, id_col: str, percent: int,
                         salt: str = "") -> pa.Table:
    """Keep rows where ``md5(salt || id) % 100 < percent`` — a
    content-addressed Bernoulli sample that is identical across runs, block
    layouts and cluster sizes (no RNG state), and reproducible in SQL:
    DuckDB ``md5_number_lower`` = little-endian uint64 of md5 bytes 8..16.
    Stateless ``map_batches`` filter."""
    ids = batch.column(id_col).to_pylist()
    mask = [
        int.from_bytes(
            hashlib.md5(f"{salt}{v}".encode()).digest()[8:], "little"
        ) % 100 < percent
        for v in ids
    ]
    return batch.filter(pa.array(mask, type=pa.bool_()))


def add_token_count(batch: pa.Table, text_col: str = "text") -> pa.Table:
    counts = pc.count_substring_regex(batch.column(text_col), r"\S+")
    return batch.append_column(
        pa.field("n_tokens", pa.int64()), pc.cast(counts, pa.int64())
    )


def add_fingerprint(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """md5(whitespace-normalized text) — deterministic document fingerprint."""
    normalized = pc.replace_substring_regex(
        batch.column(text_col), pattern=r"\s+", replacement=" "
    )
    fps = [
        None if v is None else hashlib.md5(v.encode()).hexdigest()
        for v in normalized.to_pylist()
    ]
    return batch.append_column(
        pa.field("fingerprint", pa.string()), pa.array(fps, type=pa.string())
    )


# Small public stopword profiles (common function words).
STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "los", "es"},
    "fr": {"le", "la", "de", "et", "les", "des", "un", "une", "est", "que"},
    "de": {"der", "die", "das", "und", "ist", "von", "ein", "eine", "den", "zu"},
}


def _explode_rows(text: pa.ChunkedArray, split_pattern: str):
    """(parent row indices, words) for maximal runs of the word class —
    split on the complement pattern, drop boundary empties. Fully
    vectorized (RE2 kernels + Arrow list ops)."""
    lists = pc.split_pattern_regex(
        pc.coalesce(text, pa.scalar("")), split_pattern
    )
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    parents = pc.list_parent_indices(lists)
    words = pc.list_flatten(lists)
    keep = pc.not_equal(words, pa.scalar(""))
    return (
        pc.filter(parents, keep).to_numpy(zero_copy_only=False),
        pc.filter(words, keep),
    )


class LangId:
    """Actor stage: stopword-profile language id with deterministic
    tie-break (score desc, then language code asc).

    Vectorized: one RE2 split per batch, one ``is_in`` membership kernel
    per language, per-row sums via bincount — no Python loop over rows or
    words (the per-row/per-word version cost ~100× more CPU per batch)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        # complement of the reference word class [a-zA-Zà-ÿÀ-ß]+ (findall
        # of a class == split on its complement, minus boundary empties)
        self.split_pattern = r"[^a-zA-Zà-ÿÀ-ß]+"
        self.langs = sorted(STOPWORDS)  # asc order ⇒ argmax tie-break asc
        self.value_sets = {
            lang: pa.array(sorted(STOPWORDS[lang])) for lang in self.langs
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = batch.column(self.text_col)
        n = batch.num_rows
        lower = pc.utf8_lower(pc.coalesce(t, pa.scalar("")))
        parents, words = _explode_rows(lower, self.split_pattern)
        scores = np.zeros((n, len(self.langs)), dtype=np.int64)
        for j, lang in enumerate(self.langs):
            hit = pc.is_in(words, value_set=self.value_sets[lang]) \
                .to_numpy(zero_copy_only=False)
            scores[:, j] = np.bincount(parents[hit], minlength=n)
        # np.argmax returns the FIRST maximal column; langs are ascending,
        # so ties resolve to the alphabetically-first language — the same
        # winner the reference per-row max(sorted(langs)) picked.
        best = np.array(self.langs, dtype=object)[np.argmax(scores, axis=1)]
        empty = pc.or_kleene(
            pc.is_null(t), pc.equal(t, pa.scalar(""))
        ).to_numpy(zero_copy_only=False)
        return batch.append_column(
            pa.field("lang_pred", pa.string()),
            pa.array(best.tolist(), type=pa.string(),
                     mask=np.asarray(empty, dtype=bool)),
        )


class QualityScore:
    """Actor stage: heuristic quality scoring (length, punctuation ratio,
    stopword ratio, repetition) → ``quality`` in [0, 1] plus components."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.split_pattern = r"[^\w]+"  # findall(\w+) == split complement
        self.stop_set = pa.array(
            sorted(frozenset().union(*STOPWORDS.values()))
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        # Vectorized: RE2 count/split kernels + bincount/group_by per-row
        # reduces. Ratio arithmetic keeps the original operand order
        # (single integer divisions), so results — and the bit-exact DuckDB
        # oracle — are unchanged from the per-row version this replaces.
        t = batch.column(self.text_col)
        n = batch.num_rows
        filled = pc.coalesce(t, pa.scalar(""))
        n_chars = pc.utf8_length(filled).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        n_punct = pc.count_substring_regex(filled, r"[^\w\s]") \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        parents, words = _explode_rows(
            pc.utf8_lower(filled), self.split_pattern
        )
        nw = np.bincount(parents, minlength=n).astype(np.float64)
        hit = pc.is_in(words, value_set=self.stop_set) \
            .to_numpy(zero_copy_only=False)
        n_stop = np.bincount(parents[hit], minlength=n).astype(np.float64)
        pairs = pa.table({
            "r": pa.array(parents), "w": words
        }).group_by(["r", "w"], use_threads=False).aggregate([])
        n_dist = np.bincount(
            pairs.column("r").to_numpy(zero_copy_only=False), minlength=n
        ).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            punct_ratio = np.where(n_chars > 0, n_punct / n_chars, 0.0)
            stop_ratio = np.where(nw > 0, n_stop / nw, 0.0)
            rep_ratio = np.where(nw > 0, 1.0 - n_dist / nw, 0.0)
        length_score = np.clip(n_chars / 500.0, 0, 1)
        punct_score = 1.0 - np.clip(punct_ratio * 5, 0, 1)
        stop_score = np.clip(stop_ratio * 4, 0, 1)
        rep_score = 1.0 - np.clip((rep_ratio - 0.5) * 2, 0, 1)
        quality = (length_score + punct_score + stop_score + rep_score) / 4.0
        out = batch
        for name, arr in (
            ("stop_ratio", stop_ratio),
            ("punct_ratio", punct_ratio),
            ("rep_ratio", rep_ratio),
            ("quality", quality),
        ):
            out = out.append_column(
                pa.field(name, pa.float64()), pa.array(arr, type=pa.float64())
            )
        return out


def repetition_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Gopher-style repetition signals per document: the fraction of word
    2-grams that are repeats (``dup_2gram_frac``) and the fraction taken by
    the single most frequent 2-gram (``top_2gram_frac``). High values mark
    boilerplate / spam for training-corpus filtering (Rae et al. 2021,
    "Scaling Language Models", §A1.1 repetition filters — public paper).

    Vectorized: one regex explode per batch, numpy string-add window join
    to form 2-grams, two Arrow group_bys (per (row, gram), then per row).
    Fractions are single IEEE divisions of integer counts, so the DuckDB
    oracle reproduces them bit-exactly. Docs with <2 tokens report 0 grams
    and NULL fractions."""
    from connect_smts_ray.ops.corpus import _explode_words

    n_rows = batch.num_rows
    tmp = pa.table({
        "__row": pa.array(np.arange(n_rows, dtype=np.int64)),
        text_col: batch.column(text_col),
    })
    ids, words = _explode_words(tmp, "__row", text_col)
    idv = ids.to_numpy(zero_copy_only=False)
    m = len(idv)
    n_grams = np.zeros(n_rows, dtype=np.int64)
    dup_grams = np.zeros(n_rows, dtype=np.int64)
    top_gram = np.zeros(n_rows, dtype=np.int64)
    if m >= 2:
        wv = np.asarray(words.to_pylist(), dtype=object)
        grams = wv[:-1] + " " + wv[1:]
        keep = idv[:-1] == idv[1:]
        if keep.any():
            t = pa.table({
                "__row": pa.array(idv[:-1][keep]),
                "gram": pa.array(grams[keep].tolist(), pa.string()),
            })
            per_gram = t.group_by(["__row", "gram"], use_threads=False) \
                .aggregate([([], "count_all")])
            rows = per_gram.column("__row").to_numpy(zero_copy_only=False)
            c = per_gram.column("count_all").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            np.add.at(n_grams, rows, c)
            np.add.at(dup_grams, rows, np.where(c > 1, c, 0))
            np.maximum.at(top_gram, rows, c)
    with np.errstate(divide="ignore", invalid="ignore"):
        dup_frac = dup_grams / n_grams
        top_frac = top_gram / n_grams
    valid = n_grams > 0
    out = batch
    for name, arr, typ in (
        ("n_2grams", n_grams, pa.int64()),
        ("dup_2gram_tokens", dup_grams, pa.int64()),
        ("top_2gram_count", top_gram, pa.int64()),
    ):
        out = out.append_column(pa.field(name, typ), pa.array(arr, type=typ))
    for name, arr in (("dup_2gram_frac", dup_frac),
                      ("top_2gram_frac", top_frac)):
        out = out.append_column(
            pa.field(name, pa.float64()),
            pa.array(arr, type=pa.float64(), mask=~valid),
        )
    return out


# GPT-2-style pretokenizer shape, restricted to constructs RE2 (pyarrow's
# regex engine) and DuckDB share: letter runs, single digits, single
# non-alnum-non-space marks. Counting these approximates BPE pretoken
# counts without a vocab file.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def add_token_count_bpe(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """BPE-ish token counting: one vectorized RE2 count kernel per batch,
    mirrored exactly by DuckDB ``len(regexp_extract_all(text, pattern))``."""
    counts = pc.count_substring_regex(
        batch.column(text_col), BPE_ISH_PATTERN
    )
    return batch.append_column(
        pa.field("n_bpe_tokens", pa.int64()), pc.cast(counts, pa.int64())
    )


# --- Cleaning / redaction (RE2 patterns shared verbatim with the DuckDB
# oracles; pc.replace_substring_regex and regexp_replace(..., 'g') both
# replace every match) ---

HTML_TAG_PATTERN = r"<[^>]+>"
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\+?[0-9][0-9()\- ]{7,}[0-9]"
IPV4_PATTERN = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def normalize_text(batch: pa.Table, text_col: str = "text",
                   out_col: str = "text_clean") -> pa.Table:
    """Boilerplate cleaning: strip HTML-ish tags, collapse all whitespace
    runs to single spaces, trim. Three vectorized RE2 kernels per batch —
    no Python per row."""
    t = batch.column(text_col)
    t = pc.replace_substring_regex(t, pattern=HTML_TAG_PATTERN, replacement=" ")
    t = pc.replace_substring_regex(t, pattern=r"\s+", replacement=" ")
    t = pc.utf8_trim_whitespace(t)
    return batch.append_column(pa.field(out_col, pa.string()), t)


def redact_pii(batch: pa.Table, text_col: str = "text",
               out_col: str = "text_redacted") -> pa.Table:
    """PII masking for training corpora: emails → [EMAIL], phone-shaped
    digit runs → [PHONE], IPv4 literals → [IP]. Order matters (emails
    before phones so an address's digits aren't half-eaten); patterns are
    module constants so tests and SQL oracles share them."""
    t = batch.column(text_col)
    t = pc.replace_substring_regex(t, pattern=EMAIL_PATTERN,
                                   replacement="[EMAIL]")
    t = pc.replace_substring_regex(t, pattern=IPV4_PATTERN,
                                   replacement="[IP]")
    t = pc.replace_substring_regex(t, pattern=PHONE_PATTERN,
                                   replacement="[PHONE]")
    return batch.append_column(pa.field(out_col, pa.string()), t)
