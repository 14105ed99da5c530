"""Independent Python model implementations used to build literal-table
oracles for the algorithm-specific queries (MinHash LSH, SimHash, rolling
fingerprint, sign-LSH ANN candidates).

These queries are deterministic but not expressible as one DuckDB SQL
statement over the raw tables (they depend on xxhash64 / seeded hyperplane
constants DuckDB lacks). The oracle for each is therefore built lazily at
``oracle_sql()`` time: a from-scratch Python reimplementation (public XXH64
spec + numpy float ops — sharing NO code with the Spark operators) computes
either the expected output or the algorithm's deterministic intermediate
(fingerprints, candidate pairs), which is folded into the SQL as a literal
``VALUES`` table; DuckDB still performs the relational part (joins, exact
cosine re-rank, Hamming pairing, anti-filter) against the parquet tables.

The model targets the verification scale (sf0.01) — override with
``SPARK_GRAFT_ORACLE_SF_DIR`` when sweeping another SF.

XXH64 model: the public xxHash spec (https://github.com/Cyan4973/xxHash),
matching Spark's ``xxhash64`` semantics: seed 42, multi-arg chains the
previous hash as the next seed, IntegerType hashes 4 LE bytes, LongType 8
LE bytes, StringType the UTF-8 bytes. Verified bit-exact against Spark at
EVERY level the oracles depend on (tests/test_oracle_parity.py): the
xxh64 primitives for all input kinds and chaining, FULL MinHash
signatures (component minima taken in signed int64 order — Spark's
array_min/F.min compare signed, so an unsigned-order min is a different
estimator), and the FULL IVF candidate set (sequential-fold cosine
matching Spark's ``aggregate`` rounding).
"""

from __future__ import annotations

import os
import re
from functools import lru_cache

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

# Java regex \s is ASCII-only; Python's is unicode-aware by default.
_WS = re.compile(r"\s+", re.ASCII)


def oracle_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64_long(v: int, seed: int) -> int:
    """XXH64 of one 8-byte little-endian long (Spark LongType path)."""
    v &= _M
    h = (seed + _P5 + 8) & _M
    h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
    h = ((_rotl(h, 27) * _P1) + _P4) & _M
    return _fmix(h)


def xxh64_int(v: int, seed: int) -> int:
    """XXH64 of one 4-byte little-endian int (Spark IntegerType path)."""
    v &= 0xFFFFFFFF
    h = (seed + _P5 + 4) & _M
    h ^= (v * _P1) & _M
    h = ((_rotl(h, 23) * _P2) + _P3) & _M
    return _fmix(h)


def _xxh_round(acc: int, inp: int) -> int:
    return (_rotl((acc + inp * _P2) & _M, 31) * _P1) & _M


def xxh64_bytes(b: bytes, seed: int = 42) -> int:
    n = len(b)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            v1 = _xxh_round(v1, int.from_bytes(b[i : i + 8], "little"))
            v2 = _xxh_round(v2, int.from_bytes(b[i + 8 : i + 16], "little"))
            v3 = _xxh_round(v3, int.from_bytes(b[i + 16 : i + 24], "little"))
            v4 = _xxh_round(v4, int.from_bytes(b[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = (((h ^ _xxh_round(0, v)) * _P1) + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= (_rotl((int.from_bytes(b[i : i + 8], "little") * _P2) & _M, 31) * _P1) & _M
        h = ((_rotl(h, 27) * _P1) + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(b[i : i + 4], "little") * _P1) & _M
        h = ((_rotl(h, 23) * _P2) + _P3) & _M
        i += 4
    while i < n:
        h ^= (b[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _fmix(h)


def to_signed(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def xxh64_str(s: str, seed: int = 42) -> int:
    """Signed int64, as Spark's xxhash64 returns for a string column."""
    return to_signed(xxh64_bytes(s.encode("utf-8"), seed))


# ------------------------------------------------------------- data loading
@lru_cache(maxsize=4)
def _documents(sf_dir: str) -> list[tuple[int, str]]:
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"select doc_id, text from read_parquet('{sf_dir}/documents.parquet') "
        "order by doc_id"
    ).fetchall()
    con.close()
    return [(int(i), t) for i, t in rows]


@lru_cache(maxsize=4)
def _embeddings(sf_dir: str):
    import duckdb
    import numpy as np

    con = duckdb.connect()
    rows = con.execute(
        f"select vec_id, embedding from read_parquet('{sf_dir}/embeddings.parquet') "
        "order by vec_id"
    ).fetchall()
    con.close()
    ids = [int(i) for i, _ in rows]
    mat = np.array([e for _, e in rows], dtype=np.float32)
    return ids, mat


# --------------------------------------------------------------- tokenizers
def _tokens(text: str) -> list[str]:
    """Spark ``split(lower(text), '\\s+')`` (no trim — keeps edge empties)."""
    return _WS.split(text.lower())


def _shingles(text: str, n: int = 3) -> set[str]:
    """Spark ``shingle_col``: distinct space-joined word n-grams; a doc
    shorter than n yields its single short gram."""
    toks = _tokens(text)
    return {" ".join(toks[i : i + n]) for i in range(max(len(toks) - n, 0) + 1)}


# --------------------------------------------------- MinHash dedup (d02b)
def minhash_signature_model(text: str, num_hashes: int = 64) -> list[int] | None:
    """Model of ``operators.dedup.minhash_signatures`` for one document:
    component i = min over shingle hashes h of xxhash64(i, h), where the min
    is taken in SIGNED int64 order (Spark's array_min/F.min compare signed —
    min over unsigned values then converting picks a different element
    whenever the bucket mixes values above/below 2^63). Returns None for a
    doc with no shingles. Bit-exactness vs Spark: tests/test_oracle_parity.py
    ``test_pyoracle_minhash_signatures_match_spark``."""
    hs = [xxh64_bytes(g.encode("utf-8")) for g in _shingles(text)]
    if not hs:
        return None
    seeds = [xxh64_int(i, 42) for i in range(num_hashes)]
    return [min(to_signed(xxh64_long(h, s)) for h in hs) for s in seeds]


@lru_cache(maxsize=4)
def minhash_pair_estimates(
    sf_dir: str, num_hashes: int = 64, bands: int = 16, threshold: float = 0.7
) -> tuple[tuple[int, int, int], ...]:
    """Banded-LSH candidate pairs with their signature-agreement counts:
    (lo_id, hi_id, eq) for pairs with eq/num_hashes >= threshold — the
    shared model behind the keeper rules (ids only) and the d56
    calibration report (eq is the estimate's exact integer numerator)."""
    rows_per_band = num_hashes // bands
    sigs: dict[int, list[int]] = {}
    buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, text in _documents(sf_dir):
        sig = minhash_signature_model(text, num_hashes)
        if sig is None:
            continue
        sigs[doc_id] = sig
        for b in range(bands):
            band_key = ",".join(
                str(sig[b * rows_per_band + r]) for r in range(rows_per_band)
            )
            bh = xxh64_bytes(band_key.encode("utf-8"))
            buckets.setdefault((b, bh), []).append(doc_id)
    pairs: set[tuple[int, int, int]] = set()
    seen: set[tuple[int, int]] = set()
    for ids in buckets.values():
        for i, a in enumerate(ids):
            for b_ in ids[i + 1 :]:
                lo, hi = (a, b_) if a < b_ else (b_, a)
                if (lo, hi) in seen:
                    continue
                seen.add((lo, hi))
                eq = sum(x == y for x, y in zip(sigs[lo], sigs[hi]))
                if eq / num_hashes >= threshold:
                    pairs.add((lo, hi, eq))
    return tuple(sorted(pairs))


def minhash_candidate_pairs(
    sf_dir: str, num_hashes: int = 64, bands: int = 16, threshold: float = 0.7
) -> tuple[tuple[int, int], ...]:
    """Banded-LSH candidate pairs (lo_id, hi_id) with estimated Jaccard
    >= threshold — the pair relation BOTH keeper rules (min-id and
    quality-aware keep_by) consume."""
    return tuple(
        (lo, hi)
        for lo, hi, _ in minhash_pair_estimates(
            sf_dir, num_hashes, bands, threshold
        )
    )


def minhash_loser_ids(
    sf_dir: str, num_hashes: int = 64, bands: int = 16, threshold: float = 0.7
) -> tuple[int, ...]:
    """Doc ids dropped by the min-id-neighbor rule on banded-LSH candidate
    pairs with estimated Jaccard >= threshold."""
    return tuple(
        sorted(
            {
                hi
                for _, hi in minhash_candidate_pairs(
                    sf_dir, num_hashes, bands, threshold
                )
            }
        )
    )


def minhash_dedup_sql() -> str:
    losers = minhash_loser_ids(oracle_sf_dir())
    anti = (
        f"where doc_id not in ({', '.join(map(str, losers))})" if losers else ""
    )
    return f"select doc_id, lang, source from documents {anti}"


def _band_keys_model(sig: list[int], num_hashes: int, bands: int):
    rows_per_band = num_hashes // bands
    return [
        (
            b,
            xxh64_bytes(
                ",".join(
                    str(sig[b * rows_per_band + r]) for r in range(rows_per_band)
                ).encode("utf-8")
            ),
        )
        for b in range(bands)
    ]


def incremental_minhash_survivor_ids(
    sf_dir: str,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    planted_below: int = 40,
) -> tuple[int, ...]:
    """Model of ``operators.dedup.minhash_dedup_against`` for d02h:
    corpus = even doc_ids; new batch = odd doc_ids plus exact copies
    (id+1_000_000) of corpus docs with id < planted_below. Phase 1 drops
    any new doc with a corpus band-mate at est-Jaccard >= threshold;
    phase 2 applies the keep-one smaller-id-neighbor rule WITHIN the
    remaining new batch. Returns surviving new-batch ids."""
    docs = _documents(sf_dir)
    corpus = [(i, t) for i, t in docs if i % 2 == 0]
    new = [(i, t) for i, t in docs if i % 2 == 1]
    new += [(i + 1_000_000, t) for i, t in corpus if i < planted_below]

    def sigs_of(items):
        out = {}
        for i, t in items:
            s = minhash_signature_model(t, num_hashes)
            if s is not None:
                out[i] = s
        return out

    csig, nsig = sigs_of(corpus), sigs_of(new)
    cbuckets: dict[tuple[int, int], list[int]] = {}
    for i, s in csig.items():
        for k in _band_keys_model(s, num_hashes, bands):
            cbuckets.setdefault(k, []).append(i)
    dropped: set[int] = set()
    for i, s in nsig.items():
        checked: set[int] = set()
        for k in _band_keys_model(s, num_hashes, bands):
            for cid in cbuckets.get(k, ()):
                if cid in checked:
                    continue
                checked.add(cid)
                eq = sum(x == y for x, y in zip(s, csig[cid]))
                if eq / num_hashes >= threshold:
                    dropped.add(i)
                    break
            if i in dropped:
                break
    buckets: dict[tuple[int, int], list[int]] = {}
    for i in sorted(nsig):
        if i in dropped:
            continue
        for k in _band_keys_model(nsig[i], num_hashes, bands):
            buckets.setdefault(k, []).append(i)
    losers: set[int] = set()
    seen: set[tuple[int, int]] = set()
    for ids in buckets.values():
        for ai, a in enumerate(ids):
            for b_ in ids[ai + 1 :]:
                lo, hi = (a, b_) if a < b_ else (b_, a)
                if (lo, hi) in seen:
                    continue
                seen.add((lo, hi))
                eq = sum(x == y for x, y in zip(nsig[lo], nsig[hi]))
                if eq / num_hashes >= threshold:
                    losers.add(hi)
    return tuple(
        sorted(i for i, _ in new if i not in dropped and i not in losers)
    )


def incremental_minhash_sql() -> str:
    ids = incremental_minhash_survivor_ids(oracle_sf_dir())
    vals = ", ".join(f"({i})" for i in ids)
    return f"select doc_id from (values {vals}) as t(doc_id)"


def stream_neardup_sql() -> str:
    """Oracle for c12: the batch equivalent of the streaming signature
    collapse — full-signature hash key → (min doc_id, member count).
    Corpus = documents plus exact copies (id+1_000_000) of doc_id < 10;
    each planted copy must land in its original's group."""
    docs = _documents(oracle_sf_dir())
    alld = docs + [(i + 1_000_000, t) for i, t in docs if i < 10]
    groups: dict[int, list[int]] = {}
    for i, t in alld:
        s = minhash_signature_model(t)
        if s is None:
            continue
        key = to_signed(
            xxh64_bytes(",".join(str(c) for c in s).encode("utf-8"))
        )
        g = groups.setdefault(key, [0, i])
        g[0] += 1
        g[1] = min(g[1], i)
    vals = ", ".join(
        f"({k}, {rep}, {n})" for k, (n, rep) in sorted(groups.items())
    )
    return (
        f"select sig_key::BIGINT as sig_key, rep_id::BIGINT as rep_id, "
        f"n_members::BIGINT as n_members "
        f"from (values {vals}) as t(sig_key, rep_id, n_members)"
    )


# -------------------------------------------------------- SimHash (d02c)
@lru_cache(maxsize=2)
def simhash_fps(sf_dir: str, bits: int = 64) -> dict[int, int]:
    """Charikar fingerprints over distinct word tokens (signed int64)."""
    fps: dict[int, int] = {}
    for doc_id, text in _documents(sf_dir):
        toks = set(_tokens(text))
        if not toks:
            continue
        hs = [xxh64_str(t) for t in toks]
        fp = 0
        for b in range(bits):
            # Java >> is arithmetic; Python int >> on signed values matches.
            s = sum(1 if (h >> b) & 1 else -1 for h in hs)
            if s > 0:
                fp |= 1 << b
        fps[doc_id] = to_signed(fp)
    return fps


def simhash_pairs_sql(max_hamming: int = 3) -> str:
    """Literal fingerprint table + DuckDB bit-ops Hamming join. With
    max_hamming < blocks the pigeonhole candidate generation is lossless,
    so the all-pairs form is the exact same relation."""
    fps = simhash_fps(oracle_sf_dir())
    vals = ", ".join(f"({i}, {fp})" for i, fp in sorted(fps.items()))
    return f"""
    with fp(doc_id, sh) as (values {vals})
    select a.doc_id::BIGINT as id_a, b.doc_id::BIGINT as id_b,
           bit_count(xor(a.sh, b.sh))::INTEGER as hamming
    from fp a join fp b on a.doc_id < b.doc_id
    where bit_count(xor(a.sh, b.sh)) <= {max_hamming}
    """


# -------------------------------------------- rolling fingerprint (d04d)
@lru_cache(maxsize=2)
def doc_fingerprints(sf_dir: str) -> dict[int, int]:
    """Order-sensitive fold: acc := xxhash64(acc, token_hash), acc0 = 0."""
    fps = {}
    for doc_id, text in _documents(sf_dir):
        acc = 0
        for w in _WS.split(text.lower().strip()):
            th = xxh64_bytes(w.encode("utf-8"))
            acc = xxh64_long(th, xxh64_long(acc, 42))
        fps[doc_id] = to_signed(acc)
    return fps


def fingerprint_sql() -> str:
    fps = doc_fingerprints(oracle_sf_dir())
    vals = ", ".join(f"({i}, {fp})" for i, fp in sorted(fps.items()))
    return (
        f"select doc_id::BIGINT as doc_id, fingerprint::BIGINT as fingerprint "
        f"from (values {vals}) t(doc_id, fingerprint)"
    )


# ------------------------------------------------- sign-LSH ANN (d03b/d02d)
def _lsh_planes(num_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(num_planes)]


def _band_buckets(vec, planes, bands: int) -> list[tuple[int, str]]:
    """(band, bithash) buckets for one vector. The sign dot product uses the
    same strictly-sequential left fold as Spark's ``aggregate`` so the
    rounding (and hence the sign at near-zero dots) is bit-identical."""
    num_planes = len(planes)
    rows_per_band = num_planes // bands
    bits = []
    for plane in planes:
        acc = 0.0
        for x, w in zip(vec, plane):
            acc += float(x) * w
        bits.append("1" if acc > 0 else "0")
    return [
        (b, "".join(bits[b * rows_per_band : (b + 1) * rows_per_band]))
        for b in range(bands)
    ]


@lru_cache(maxsize=2)
def lsh_topk_candidates(
    sf_dir: str, query_max_id: int = 5, num_planes: int = 16, bands: int = 8
) -> tuple[tuple[int, int], ...]:
    """Deduped (query_id, match_id) sign-LSH bucket-collision candidates
    for queries vec_id < query_max_id over the full corpus."""
    ids, mat = _embeddings(sf_dir)
    dim = mat.shape[1]
    planes = _lsh_planes(num_planes, dim)
    corpus_buckets: dict[tuple[int, str], list[int]] = {}
    for vid, vec in zip(ids, mat):
        for key in _band_buckets([float(x) for x in vec], planes, bands):
            corpus_buckets.setdefault(key, []).append(vid)
    cands: set[tuple[int, int]] = set()
    for vid, vec in zip(ids, mat):
        if vid >= query_max_id:
            continue
        for key in _band_buckets([float(x) for x in vec], planes, bands):
            for mid in corpus_buckets.get(key, ()):
                if mid != vid:
                    cands.add((vid, mid))
    return tuple(sorted(cands))


def lsh_topk_sql(k: int = 5) -> str:
    cands = lsh_topk_candidates(oracle_sf_dir())
    vals = ", ".join(f"({q}, {m})" for q, m in cands)
    return f"""
    with cand(query_id, match_id) as (values {vals}),
    scored as (
      select c.query_id::BIGINT as query_id, c.match_id::BIGINT as match_id,
             list_cosine_similarity(
               list_transform(q.embedding, x -> cast(x as double)),
               list_transform(m.embedding, x -> cast(x as double))) as score
      from cand c
      join embeddings q on q.vec_id = c.query_id
      join embeddings m on m.vec_id = c.match_id
    ), ranked as (
      select query_id, match_id, score,
             row_number() over (partition by query_id
                                order by score desc, match_id) as rank
      from scored)
    select query_id, match_id, round(score, 4) as score, rank
    from ranked where rank <= {k}
    """


# ------------------------------------------------------- IVF ANN (d03c)
def _seq_cosine(a, b) -> float:
    """Cosine with the same strictly-sequential left folds as Spark's
    ``aggregate`` (dot, then each norm), so rounding — and hence argmax
    cell assignment at near-ties — is bit-identical."""
    import math

    dot = 0.0
    for x, y in zip(a, b):
        dot += float(x) * float(y)
    na = 0.0
    for x in a:
        na += float(x) * float(x)
    nb = 0.0
    for y in b:
        nb += float(y) * float(y)
    return dot / (math.sqrt(na) * math.sqrt(nb))


def _ivf_probe_candidates(
    ids, id2vec, cents, query_max_id: int, nprobe: int
) -> tuple[tuple[int, int], ...]:
    """Shared IVF candidate model: every corpus vector is assigned to its
    max-cosine cell (ties → smallest cell); each query (vec_id <
    ``query_max_id``) probes its ``nprobe`` top cells; candidates are the
    corpus members of probed cells minus the query itself. ``cents`` is
    ``[(cell, center)]`` — seed vectors (d03c) or the deterministic
    KMeans fit (d03d)."""

    def ranked_cells(vec) -> list[int]:
        # sort by (-cos, cell): cosine desc, cell asc on ties
        return [
            c for _, c in sorted((-_seq_cosine(vec, cv), j) for j, cv in cents)
        ]

    cells: dict[int, list[int]] = {}
    for vid in ids:
        cells.setdefault(ranked_cells(id2vec[vid])[0], []).append(vid)
    cands: set[tuple[int, int]] = set()
    for vid in ids:
        if vid >= query_max_id:
            continue
        for c in ranked_cells(id2vec[vid])[:nprobe]:
            for mid in cells.get(c, ()):
                if mid != vid:
                    cands.add((vid, mid))
    return tuple(sorted(cands))


@lru_cache(maxsize=2)
def ivf_candidates(
    sf_dir: str, query_max_id: int = 5, nlist: int = 8, nprobe: int = 4
) -> tuple[tuple[int, int], ...]:
    """Candidates of the seed-vector-quantizer IVF (d03c): centroids =
    corpus vectors with vec_id < nlist (as double)."""
    ids, mat = _embeddings(sf_dir)
    id2vec = {vid: [float(x) for x in mat[i]] for i, vid in enumerate(ids)}
    cents = [(j, id2vec[j]) for j in range(nlist)]
    return _ivf_probe_candidates(ids, id2vec, cents, query_max_id, nprobe)


@lru_cache(maxsize=2)
def ivf_kmeans_candidates(
    sf_dir: str, query_max_id: int = 5, nlist: int = 8, nprobe: int = 4
) -> tuple[tuple[int, int], ...]:
    """Candidates of the KMeans-quantizer IVF (d03d): centroids from the
    deterministic spherical Lloyd's fit over the vec_id-ordered corpus
    (operators.similarity.deterministic_kmeans — driver-side float64
    numpy, bit-reproducible). The FIT is a shared parameter computation,
    deliberately the same code on both sides; what the oracle check
    verifies is everything downstream of the centroids — Spark's
    distributed cell assignment (literal-centroid cosine folds), probe
    fan-out, cell equi-join candidate generation, exact cosine re-rank,
    and two-phase top-k — against this independent Python model plus
    DuckDB's exact re-rank."""
    from basis_devkit_spark.operators.similarity import deterministic_kmeans

    ids, mat = _embeddings(sf_dir)
    id2vec = {vid: [float(x) for x in mat[i]] for i, vid in enumerate(ids)}
    # same sample rule as the declared query: first max_train_rows by
    # vec_id (ids are already sorted); 100k cap never binds at test SFs
    fit_rows = [id2vec[vid] for vid in ids[:100_000]]
    cents = list(enumerate(deterministic_kmeans(fit_rows, k=nlist, iters=10, seed=42)))
    return _ivf_probe_candidates(ids, id2vec, cents, query_max_id, nprobe)


def ivf_topk_sql(k: int = 5) -> str:
    cands = ivf_candidates(oracle_sf_dir())
    vals = ", ".join(f"({q}, {m})" for q, m in cands)
    return f"""
    with cand(query_id, match_id) as (values {vals}),
    scored as (
      select c.query_id::BIGINT as query_id, c.match_id::BIGINT as match_id,
             list_cosine_similarity(
               list_transform(q.embedding, x -> cast(x as double)),
               list_transform(m.embedding, x -> cast(x as double))) as score
      from cand c
      join embeddings q on q.vec_id = c.query_id
      join embeddings m on m.vec_id = c.match_id
    ), ranked as (
      select query_id, match_id, score,
             row_number() over (partition by query_id
                                order by score desc, match_id) as rank
      from scored)
    select query_id, match_id, round(score, 4) as score, rank
    from ranked where rank <= {k}
    """


def ivf_kmeans_topk_sql(k: int = 5) -> str:
    cands = ivf_kmeans_candidates(oracle_sf_dir())
    vals = ", ".join(f"({q}, {m})" for q, m in cands)
    # round-before-rank: mirrors the declared query's score_round=4 (see
    # ann_join_sql) so sub-ulp float-pipeline differences cannot flip
    # top-k membership at near-ties.
    return f"""
    with cand(query_id, match_id) as (values {vals}),
    scored as (
      select c.query_id::BIGINT as query_id, c.match_id::BIGINT as match_id,
             round(list_cosine_similarity(
               list_transform(q.embedding, x -> cast(x as double)),
               list_transform(m.embedding, x -> cast(x as double))), 4) as score
      from cand c
      join embeddings q on q.vec_id = c.query_id
      join embeddings m on m.vec_id = c.match_id
    ), ranked as (
      select query_id, match_id, score,
             row_number() over (partition by query_id
                                order by score desc, match_id) as rank
      from scored)
    select query_id, match_id, score, rank
    from ranked where rank <= {k}
    """


@lru_cache(maxsize=2)
def embedding_neardup_candidates(
    sf_dir: str,
    planted_max_id: int = 20,
    planted_offset: int = 1_000_000,
    num_planes: int = 16,
    bands: int = 8,
) -> tuple[tuple[int, int], ...]:
    """Deduped (id_a < id_b) bucket-collision candidates over the corpus
    plus the planted perturbed copies (vec*1.02+0.003 in double, cast back
    to float32 — the same literal arithmetic as the declared query)."""
    import numpy as np

    ids, mat = _embeddings(sf_dir)
    all_vecs = [(vid, mat[i]) for i, vid in enumerate(ids)]
    for i, vid in enumerate(ids):
        if vid < planted_max_id:
            planted = (mat[i].astype(np.float64) * 1.02 + 0.003).astype(np.float32)
            all_vecs.append((vid + planted_offset, planted))
    dim = mat.shape[1]
    planes = _lsh_planes(num_planes, dim)
    buckets: dict[tuple[int, str], list[int]] = {}
    for vid, vec in all_vecs:
        for key in _band_buckets([float(x) for x in vec], planes, bands):
            buckets.setdefault(key, []).append(vid)
    pairs: set[tuple[int, int]] = set()
    for members in buckets.values():
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                if a != b:
                    pairs.add((a, b) if a < b else (b, a))
    return tuple(sorted(pairs))


def embedding_neardup_sql(threshold: float = 0.9) -> str:
    cands = embedding_neardup_candidates(oracle_sf_dir())
    vals = ", ".join(f"({a}, {b})" for a, b in cands)
    return f"""
    with allv as (
      select vec_id, embedding from embeddings
      union all
      select vec_id + 1000000 as vec_id,
             list_transform(embedding,
               x -> cast(cast(x as double) * 1.02 + 0.003 as REAL)) as embedding
      from embeddings where vec_id < 20
    ), cand(id_a, id_b) as (values {vals}),
    scored as (
      select c.id_a::BIGINT as id_a, c.id_b::BIGINT as id_b,
             list_cosine_similarity(
               list_transform(a.embedding, x -> cast(x as double)),
               list_transform(b.embedding, x -> cast(x as double))) as cosine
      from cand c
      join allv a on a.vec_id = c.id_a
      join allv b on b.vec_id = c.id_b
    )
    select id_a, id_b, round(cosine, 4) as cosine
    from scored where cosine >= {threshold}
    """


@lru_cache(maxsize=2)
def ann_join_candidates(
    sf_dir: str, nlist: int = 8, nprobe: int = 4
) -> tuple[tuple[int, int], ...]:
    """(query_id, match_id) candidates of the deterministic-quantizer ANN
    corpus-to-corpus JOIN: left corpus = even vec_ids, right corpus = odd
    vec_ids, centroids = vectors with vec_id < nlist (as double); every
    RIGHT vector is assigned to its max-cosine cell (ties → smallest
    cell); each LEFT vector probes its ``nprobe`` top cells; candidates
    are the right-corpus members of the probed cells."""
    ids, mat = _embeddings(sf_dir)
    id2vec = {vid: [float(x) for x in mat[i]] for i, vid in enumerate(ids)}
    cents = [(j, id2vec[j]) for j in range(nlist)]

    def ranked_cells(vec) -> list[int]:
        return [
            c for _, c in sorted((-_seq_cosine(vec, cv), j) for j, cv in cents)
        ]

    cells: dict[int, list[int]] = {}
    for vid in ids:
        if vid % 2 == 1:
            cells.setdefault(ranked_cells(id2vec[vid])[0], []).append(vid)
    cands: set[tuple[int, int]] = set()
    for vid in ids:
        if vid % 2 == 0:
            for c in ranked_cells(id2vec[vid])[:nprobe]:
                for mid in cells.get(c, ()):
                    cands.add((vid, mid))
    return tuple(sorted(cands))


def ann_join_sql(k: int = 3) -> str:
    cands = ann_join_candidates(oracle_sf_dir())
    vals = ", ".join(f"({q}, {m})" for q, m in cands)
    # Rank on the 4dp-ROUNDED score (match_id tie-break), mirroring the
    # declared query's score_round=4 — raw-double ranking would let
    # sub-ulp differences between DuckDB's list_cosine_similarity and
    # Spark's sequential fold flip membership at near-ties.
    return f"""
    with cand(query_id, match_id) as (values {vals}),
    scored as (
      select c.query_id::BIGINT as query_id, c.match_id::BIGINT as match_id,
             round(list_cosine_similarity(
               list_transform(q.embedding, x -> cast(x as double)),
               list_transform(m.embedding, x -> cast(x as double))), 4) as score
      from cand c
      join embeddings q on q.vec_id = c.query_id
      join embeddings m on m.vec_id = c.match_id
    ), ranked as (
      select query_id, match_id, score,
             row_number() over (partition by query_id
                                order by score desc, match_id) as rank
      from scored)
    select query_id, match_id, score, rank
    from ranked where rank <= {k}
    """


@lru_cache(maxsize=2)
def quantized_ann_candidates(
    sf_dir: str,
    k: int = 5,
    refine: int = 4,
    query_max_id: int = 30,
    bits: int = 8,
) -> tuple[tuple[int, int], ...]:
    """(query_id, match_id) coarse candidates of the int8 scalar-quantized
    ANN (queries = vec_id < query_max_id, corpus = everything): per-dim
    [min, max] fit over the corpus floats, codes = clamp(floor((x - mn) /
    span * levels)) in double (IEEE-elementwise — bit-identical to Spark's
    zip_with projection), coarse score = exact-int64 dot of the centered
    codes, top k*refine per query by (-dot, match_id), self excluded. The
    integer coarse pass makes the CANDIDATE SET itself exactly modelable —
    no float fold-order caveats."""
    import numpy as np

    ids, mat = _embeddings(sf_dir)
    levels = float((1 << bits) - 1)
    center = 1 << (bits - 1)
    mn = mat.min(axis=0).astype(np.float64)
    span = mat.max(axis=0).astype(np.float64) - mn
    d = mat.astype(np.float64) - mn
    with np.errstate(divide="ignore", invalid="ignore"):
        raw = np.floor(d / span * levels)
    codes = np.where(span == 0.0, 0.0, np.clip(raw, 0.0, levels)).astype(np.int64)
    cent = codes - center
    idarr = np.array(ids, dtype=np.int64)
    qidx = [i for i, vid in enumerate(idarr) if vid < query_max_id]
    dots = cent[qidx] @ cent.T  # int64 matmul — exact
    cands: list[tuple[int, int]] = []
    for row, i in enumerate(qidx):
        qid = int(idarr[i])
        order = sorted(
            (-int(dots[row, ci]), int(mid))
            for ci, mid in enumerate(idarr)
            if int(mid) != qid
        )[: k * refine]
        cands.extend((qid, mid) for _, mid in order)
    return tuple(sorted(cands))


def quantized_ann_sql(k: int = 5) -> str:
    cands = quantized_ann_candidates(oracle_sf_dir())
    vals = ", ".join(f"({q}, {m})" for q, m in cands)
    # Candidates from the exact-integer coarse pass (modeled above);
    # DuckDB performs only the float rescore — rounded to 4dp BEFORE
    # ranking, mirroring the declared query's score_round=4.
    return f"""
    with cand(query_id, match_id) as (values {vals}),
    scored as (
      select c.query_id::BIGINT as query_id, c.match_id::BIGINT as match_id,
             round(list_cosine_similarity(
               list_transform(q.embedding, x -> cast(x as double)),
               list_transform(m.embedding, x -> cast(x as double))), 4) as score
      from cand c
      join embeddings q on q.vec_id = c.query_id
      join embeddings m on m.vec_id = c.match_id
    ), ranked as (
      select query_id, match_id, score,
             row_number() over (partition by query_id
                                order by score desc, match_id) as rank
      from scored)
    select query_id, match_id, score, rank
    from ranked where rank <= {k}
    """


@lru_cache(maxsize=2)
def ivf_quantized_candidates(
    sf_dir: str,
    k: int = 5,
    refine: int = 4,
    query_max_id: int = 30,
    nlist: int = 8,
    nprobe: int = 4,
    bits: int = 8,
) -> tuple[tuple[int, int], ...]:
    """(query_id, match_id) coarse candidates of the composed IVF ×
    scalar-quantized ANN (d20): seed-vector centroids (vec_id < nlist as
    double), every corpus vector assigned to its max-cosine cell (ties →
    smallest cell), each query (vec_id < query_max_id) probes its
    ``nprobe`` top cells, and WITHIN the probed cells the coarse ranking
    is the exact-int64 centered-code dot (codes from the corpus-wide
    per-dim [min,max] fit — the quantized_ann_candidates model), top
    ``k × refine`` per query by (-dot, match_id), self excluded. The cell
    step reuses the float model the d03c/d03h oracles proved; the code
    step is exact integer — so the whole candidate set is reproducible."""
    import numpy as np

    ids, mat = _embeddings(sf_dir)
    id2vec = {vid: [float(x) for x in mat[i]] for i, vid in enumerate(ids)}
    cents = [(j, id2vec[j]) for j in range(nlist)]

    def ranked_cells(vec) -> list[int]:
        return [
            c for _, c in sorted((-_seq_cosine(vec, cv), j) for j, cv in cents)
        ]

    levels = float((1 << bits) - 1)
    center = 1 << (bits - 1)
    mn = mat.min(axis=0).astype(np.float64)
    span = mat.max(axis=0).astype(np.float64) - mn
    d = mat.astype(np.float64) - mn
    with np.errstate(divide="ignore", invalid="ignore"):
        raw = np.floor(d / span * levels)
    codes = np.where(span == 0.0, 0.0, np.clip(raw, 0.0, levels)).astype(np.int64)
    cent = codes - center
    idarr = np.array(ids, dtype=np.int64)
    idx_of = {int(v): i for i, v in enumerate(idarr)}
    cells: dict[int, list[int]] = {}
    for vid in ids:
        cells.setdefault(ranked_cells(id2vec[vid])[0], []).append(vid)
    cands: list[tuple[int, int]] = []
    for vid in ids:
        if vid >= query_max_id:
            continue
        qrow = cent[idx_of[int(vid)]]
        pool: list[int] = []
        for c in ranked_cells(id2vec[vid])[:nprobe]:
            pool.extend(int(m) for m in cells.get(c, ()) if int(m) != int(vid))
        order = sorted(
            (-int(qrow @ cent[idx_of[m]]), m) for m in pool
        )[: k * refine]
        cands.extend((int(vid), m) for _, m in order)
    return tuple(sorted(cands))


def ivf_quantized_sql(k: int = 5) -> str:
    cands = ivf_quantized_candidates(oracle_sf_dir())
    vals = ", ".join(f"({q}, {m})" for q, m in cands)
    # Candidates from the composed cell+integer coarse model above;
    # DuckDB performs only the float rescore, 4dp round-before-rank.
    return f"""
    with cand(query_id, match_id) as (values {vals}),
    scored as (
      select c.query_id::BIGINT as query_id, c.match_id::BIGINT as match_id,
             round(list_cosine_similarity(
               list_transform(q.embedding, x -> cast(x as double)),
               list_transform(m.embedding, x -> cast(x as double))), 4) as score
      from cand c
      join embeddings q on q.vec_id = c.query_id
      join embeddings m on m.vec_id = c.match_id
    ), ranked as (
      select query_id, match_id, score,
             row_number() over (partition by query_id
                                order by score desc, match_id) as rank
      from scored)
    select query_id, match_id, score, rank
    from ranked where rank <= {k}
    """


@lru_cache(maxsize=2)
def hashed_logreg_scores(
    sf_dir: str,
    num_features: int = 1024,
    sample_rows: int = 200,
    min_tokens: int = 60,
) -> tuple[tuple[int, float], ...]:
    """(doc_id, quality_prob) model of d24's deterministic trained quality
    filter. The FIT is a shared parameter computation (the d03d rule —
    operators.quality_model.fit_hashed_logreg, driver-side float64 GD
    over the first ``sample_rows`` docs by doc_id, weak label = token
    count >= min_tokens); what the oracle verifies is everything
    DOWNSTREAM of the fitted (wq, bias): Spark's distributed hashed
    feature extraction (xxhash64 buckets), the exact-integer weight sum,
    and the final sigmoid+round — recomputed here independently with the
    proven XXH64 model."""
    import math
    import re

    from basis_devkit_spark.operators.quality_model import fit_hashed_logreg

    ws = re.compile(r"\s+")

    def toks(t: str) -> list[str]:
        return ws.split((t or "").strip().lower())

    docs = _documents(sf_dir)
    labeled = [
        (t, 1 if len(toks(t)) >= min_tokens else 0)
        for _, t in docs[:sample_rows]
    ]
    wq, bias = fit_hashed_logreg(labeled, num_features)
    out = []
    for did, t in docs:
        s = sum(wq[xxh64_str(x) % num_features] for x in toks(t))
        z = s / 1e9 + bias
        out.append((did, round(1.0 / (1.0 + math.exp(-z)), 6)))
    return tuple(out)


def hashed_logreg_sql() -> str:
    rows = hashed_logreg_scores(oracle_sf_dir())
    vals = ", ".join(f"({d}, {p!r})" for d, p in rows)
    return f"""
    select cast(doc_id as bigint) as doc_id,
           cast(quality_prob as double) as quality_prob
    from (values {vals}) t(doc_id, quality_prob)
    """


def _hll_est(values, p: int = 10, est_round: int = 4) -> float:
    """Model of operators.sketches.hll_distinct for one group: identical
    integer register pipeline (xxh64 already computed by the caller),
    identical integerized harmonic sum, identical double formula."""
    import math

    from basis_devkit_spark.operators.sketches import _SCALE, _alpha

    m = 1 << p
    regs: dict[int, int] = {}
    for h in values:
        hu = h & ((1 << 64) - 1)
        bucket = h & (m - 1)
        w = hu >> p
        rank = (64 - p + 1) if w == 0 else ((w & -w).bit_length() - 1) + 1
        if regs.get(bucket, 0) < rank:
            regs[bucket] = rank
    present = len(regs)
    s_total = sum(1 << (_SCALE - r) for r in regs.values()) + (
        (m - present) << _SCALE
    )
    raw = (_alpha(m) * m * m * float(1 << _SCALE)) / float(s_total)
    zeros = float(m - present)
    if raw <= 2.5 * m and zeros > 0:
        est = float(m) * math.log(float(m) / zeros)
    else:
        est = raw
    return round(est, est_round)


@lru_cache(maxsize=2)
def hll_sketch_rows(sf_dir: str, p: int = 10) -> tuple[tuple[str, float], ...]:
    """(metric, est_distinct) rows of d25: per-event-type user_id
    estimates (exercises the linear-counting branch at test SFs) plus the
    global event_id estimate (the raw HLL branch)."""
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"select event_type, user_id, event_id from "
        f"read_parquet('{sf_dir}/events.parquet')"
    ).fetchall()
    con.close()
    by_type: dict[str, list[int]] = {}
    eids = []
    for et, uid, eid in rows:
        by_type.setdefault(et, []).append(xxh64_long(int(uid), 42))
        eids.append(xxh64_long(int(eid), 42))
    out = [
        (f"users:{et}", _hll_est(hs, p)) for et, hs in sorted(by_type.items())
    ]
    out.append(("event_ids", _hll_est(eids, p)))
    return tuple(out)


def hll_sketch_sql() -> str:
    rows = hll_sketch_rows(oracle_sf_dir())
    vals = ", ".join(f"('{mname}', {est!r})" for mname, est in rows)
    return f"""
    with est(metric, est_distinct) as (values {vals}),
    ex as (
      select 'users:' || event_type as metric,
             cast(count(distinct user_id) as bigint) as exact_distinct
      from events group by 1
      union all
      select 'event_ids' as metric,
             cast(count(distinct event_id) as bigint) as exact_distinct
      from events
    )
    select e.metric, cast(est.est_distinct as double) as est_distinct,
           e.exact_distinct
    from est join ex e using (metric)
    """


@lru_cache(maxsize=2)
def cms_probe_rows(
    sf_dir: str, width: int = 1 << 12, depth: int = 4
) -> tuple[tuple[str, int], ...]:
    """(token, est_count) model of d27: count-min sketch over every token
    OCCURRENCE in the corpus (positions = pmod(xxhash64(token, i), width)
    — the proven chain semantics), probed with doc 0's distinct tokens.
    Entirely integer — no rounding contract at all."""
    cells: dict[tuple[int, int], int] = {}
    probes: set[str] = set()
    for did, text in _documents(sf_dir):
        toks = _WS.split((text or "").strip().lower())
        if did == 0:
            probes.update(toks)
        for t in toks:
            base = xxh64_bytes(t.encode("utf-8"), 42)
            for i in range(depth):
                col = to_signed(xxh64_int(i, base)) % width
                cells[(i, col)] = cells.get((i, col), 0) + 1
    out = []
    for t in sorted(probes):
        base = xxh64_bytes(t.encode("utf-8"), 42)
        est = min(
            cells.get((i, to_signed(xxh64_int(i, base)) % width), 0)
            for i in range(depth)
        )
        out.append((t, est))
    return tuple(out)


def cms_probe_sql() -> str:
    rows = cms_probe_rows(oracle_sf_dir())
    vals = ", ".join(
        "('{}', {})".format(t.replace("'", "''"), est) for t, est in rows
    )
    return f"""
    with est(token, est_count) as (values {vals}),
    toks as (
      select unnest(string_split(lower(trim(text)), ' ')) as token
      from documents
    ),
    ex as (select token, cast(count(*) as bigint) as exact_count
           from toks group by 1)
    select e.token, cast(e.est_count as bigint) as est_count,
           x.exact_count
    from est e join ex x using (token)
    """


@lru_cache(maxsize=2)
def pagerank_rows(
    sf_dir: str, iters: int = 10, scale: int = 10**12
) -> tuple[tuple[str, float], ...]:
    """(node, rank) model of d28: exact-integer PageRank (damping 17/20,
    teleport ((scale*3)//20)//N, dangling mass redistributed div N) over
    the distinct customer→supplier edges of orders ⋈ lineitem — the same
    integer recurrence operators/graphrank.py runs distributed; integer
    sums are order-independent, so the two implementations must agree
    bit-for-bit before the single final float division."""
    import duckdb

    con = duckdb.connect()
    edges = con.execute(
        f"""
        select distinct 'c' || o.o_custkey as src, 's' || l.l_suppkey as dst
        from read_parquet('{sf_dir}/orders.parquet') o
        join read_parquet('{sf_dir}/lineitem.parquet') l
          on l.l_orderkey = o.o_orderkey
        """
    ).fetchall()
    con.close()
    r = _int_pagerank(edges, iters, scale)
    return tuple(sorted(r.items()))


def _int_pagerank(
    edges, iters: int, scale: int
) -> dict[str, int]:
    """The shared exact-integer PageRank recurrence (damping 17/20,
    teleport ((scale*3)//20)//N, dangling mass div N) over a DISTINCT
    edge list — the loop both d28 and d86 model."""
    out_adj: dict[str, list[str]] = {}
    nodes: set[str] = set()
    for s, d in set(edges):
        out_adj.setdefault(s, []).append(d)
        nodes.add(s)
        nodes.add(d)
    n = len(nodes)
    if n == 0:
        return {}
    base = ((scale * 3) // 20) // n
    r = {v: scale // n for v in nodes}
    for _ in range(iters):
        incoming: dict[str, int] = {}
        dangling = 0
        for v in nodes:
            outs = out_adj.get(v)
            if not outs:
                dangling += r[v]
                continue
            c = r[v] // len(outs)
            for d in outs:
                incoming[d] = incoming.get(d, 0) + c
        r = {
            v: base + ((incoming.get(v, 0) + dangling // n) * 17) // 20
            for v in nodes
        }
    return r


def pagerank_sql() -> str:
    # exact scaled-integer ranks — no float op anywhere, so no rounding
    # convention (Python banker's vs engine half-up) can ever bite
    rows = pagerank_rows(oracle_sf_dir())
    vals = ", ".join(f"('{v}', {rank})" for v, rank in rows)
    return f"""
    select node, cast(rank_scaled as bigint) as rank_scaled
    from (values {vals}) t(node, rank_scaled)
    """


# ------------------------------------------------- PQ-ADC ANN top-k (d29)
@lru_cache(maxsize=2)
def pq_ann_candidates(
    sf_dir: str,
    k: int = 5,
    refine: int = 4,
    query_max_id: int = 30,
    m: int = 8,
    ksub: int = 16,
) -> tuple[tuple[int, int], ...]:
    """(query_id, match_id) coarse candidates of the PQ-ADC ANN (queries =
    vec_id < query_max_id, corpus = everything). Model of
    ``operators.similarity.pq_topk``'s integer coarse pass:

    - codebook: the first ``ksub`` corpus vectors by id, cast to double,
      sliced into ``m`` subspaces (seed-vector fit — no RNG, no floats
      folded across rows);
    - corpus codes: per subspace, argmin L2² codeword (left-to-right
      double fold, exactly Spark's ``aggregate`` order; lowest code wins
      ties via first-occurrence ``index(min)``);
    - query LUTs: ``floor(l2²(query_sub, codeword) * 1e6)`` as int64 —
      the SAME doubles Spark computes, so the integerization agrees
      bit-for-bit;
    - coarse distance = exact-integer sum of the ``m`` LUT hits; top
      ``k*refine`` per query by (distance asc, match_id asc), self
      excluded.

    The integer coarse pass makes the CANDIDATE SET exactly modelable,
    like d16's centered-code dot — only the float rescore is delegated
    to DuckDB (round-before-rank)."""
    import math

    ids, mat = _embeddings(sf_dir)
    dim = mat.shape[1]
    subdim = dim // m
    vecs = [[float(x) for x in row] for row in mat]

    def l2sq(a, b):
        d = 0.0
        for x, y in zip(a, b):
            t = (x - y) * (x - y)
            d = d + t
        return d

    seeds = vecs[:ksub]  # ids are sorted ascending in _embeddings

    def sub(v, s):
        return v[s * subdim : (s + 1) * subdim]

    codes = []
    for v in vecs:
        row = []
        for s in range(m):
            dists = [l2sq(sub(v, s), sub(seeds[c], s)) for c in range(ksub)]
            row.append(dists.index(min(dists)))
        codes.append(row)

    cands: list[tuple[int, int]] = []
    for qi, qid in enumerate(ids):
        if qid >= query_max_id:
            continue
        q = vecs[qi]
        lut = [
            [
                int(math.floor(l2sq(sub(q, s), sub(seeds[c], s)) * 1_000_000.0))
                for c in range(ksub)
            ]
            for s in range(m)
        ]
        scored = sorted(
            (sum(lut[s][codes[ci][s]] for s in range(m)), int(mid))
            for ci, mid in enumerate(ids)
            if int(mid) != qid
        )[: k * refine]
        cands.extend((qid, mid) for _, mid in scored)
    return tuple(sorted(cands))


def pq_ann_sql(k: int = 5) -> str:
    cands = pq_ann_candidates(oracle_sf_dir())
    vals = ", ".join(f"({q}, {m_})" for q, m_ in cands)
    # Candidates from the exact-integer ADC coarse pass (modeled above);
    # DuckDB performs only the float rescore — rounded to 4dp BEFORE
    # ranking, mirroring the declared query's score_round=4.
    return f"""
    with cand(query_id, match_id) as (values {vals}),
    scored as (
      select c.query_id::BIGINT as query_id, c.match_id::BIGINT as match_id,
             round(list_cosine_similarity(
               list_transform(q.embedding, x -> cast(x as double)),
               list_transform(m.embedding, x -> cast(x as double))), 4) as score
      from cand c
      join embeddings q on q.vec_id = c.query_id
      join embeddings m on m.vec_id = c.match_id
    ), ranked as (
      select query_id, match_id, score,
             row_number() over (partition by query_id
                                order by score desc, match_id) as rank
      from scored)
    select query_id, match_id, score, rank
    from ranked where rank <= {k}
    """


# --------------------------------------------- BPE merge learning (d30)
@lru_cache(maxsize=2)
def bpe_merges_model(
    sf_dir: str, num_merges: int = 8, batch_merges: int = 1
) -> tuple[tuple[int, str, str, str, int], ...]:
    """Model of ``operators.bpe.bpe_learn_merges`` over the documents
    table: whitespace-lowered word frequencies, then rounds of (integer
    pair-count sum → top ``batch_merges`` pairs by (count desc, pair
    asc) → greedy disjoint admission → greedy left-to-right merge
    rewrites in rank order). Entirely integer arithmetic — no
    float/fold-order caveats — so the learned merge table is exactly
    reproducible cross-engine. ``batch_merges=1`` is classic BPE."""
    import collections

    docs = _documents(sf_dir)
    wc: collections.Counter = collections.Counter()
    for _, text in docs:
        for w in _WS.split((text or "").lower()):
            if w:
                wc[w] += 1
    vocab = {tuple(list(w) + ["</w>"]): c for w, c in wc.items()}
    merges: list[tuple[int, str, str, str, int]] = []
    while len(merges) < num_merges:
        pc: collections.Counter = collections.Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        top = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[
            :batch_merges
        ]
        used: set = set()
        batch: list = []
        for (left, right), cnt in top:
            if len(merges) + len(batch) >= num_merges:
                break
            if {left, right, left + right} & used:
                continue
            used |= {left, right, left + right}
            batch.append((left, right, int(cnt)))
        for left, right, cnt in batch:
            merges.append((len(merges), left, right, left + right, cnt))
            nxt: dict = {}
            for syms, c in vocab.items():
                out: list = []
                for x in syms:
                    if out and out[-1] == left and x == right:
                        out[-1] = left + right
                    else:
                        out.append(x)
                key = tuple(out)
                nxt[key] = nxt.get(key, 0) + c
            vocab = nxt
    return tuple(merges)


def bpe_merges_sql(num_merges: int = 8, batch_merges: int = 1) -> str:
    rows = bpe_merges_model(oracle_sf_dir(), num_merges, batch_merges)

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    vals = ", ".join(
        f"({r}, {q(l)}, {q(rr)}, {q(m)}, {c})" for r, l, rr, m, c in rows
    )
    # The whole computation is integer/string — the Python model IS the
    # oracle (same contract as d28's fixed-point pagerank literal table).
    return f"""
    select cast(merge_rank as int) as merge_rank, left_sym, right_sym,
           merged, cast(pair_count as bigint) as pair_count
    from (values {vals}) t(merge_rank, left_sym, right_sym, merged, pair_count)
    """


@lru_cache(maxsize=2)
def bpe_token_counts_model(
    sf_dir: str, num_merges: int = 8
) -> tuple[tuple[int, int], ...]:
    """Per-doc BPE token counts under the learned merge table — model of
    ``bpe_apply`` (greedy left-to-right fold per merge, in rank order)
    composed over ``bpe_merges_model``. Integer/string only."""
    ranked = [(l, r) for _, l, r, _, _ in bpe_merges_model(sf_dir, num_merges)]
    out: list[tuple[int, int]] = []
    for doc_id, text in _documents(sf_dir):
        cnt = 0
        for w in _WS.split((text or "").lower()):
            if not w:
                continue
            syms = list(w) + ["</w>"]
            for left, right in ranked:
                ns: list[str] = []
                for x in syms:
                    if ns and ns[-1] == left and x == right:
                        ns[-1] = left + right
                    else:
                        ns.append(x)
                syms = ns
            cnt += len(syms)
        out.append((int(doc_id), cnt))
    return tuple(out)


def bpe_packing_sql(num_merges: int = 8, budget: int = 2048) -> str:
    rows = bpe_token_counts_model(oracle_sf_dir(), num_merges)
    vals = ", ".join(f"({d}, {c})" for d, c in rows)
    # Counts from the independent Python BPE model (merges + greedy
    # apply are all-integer — exactly reproducible); DuckDB lays the
    # packing prefix over them, the same shape as the d11/d11b oracles.
    return f"""
    with t(doc_id, n_tokens) as (values {vals}),
    c as (
      select cast(doc_id as bigint) as doc_id,
             cast(n_tokens as bigint) as n_tokens,
             cast(coalesce(sum(n_tokens) over (order by doc_id
                     rows between unbounded preceding and 1 preceding),
                   0) as bigint) as cb
      from t
    )
    select doc_id, n_tokens,
           cast(floor(cb / {budget}.0) as bigint) as seq_id,
           cast(cb % {budget} as bigint) as seq_offset
    from c
    """


@lru_cache(maxsize=2)
def bpe_tokens_model(
    sf_dir: str, num_merges: int = 8
) -> tuple[tuple[int, int, str], ...]:
    """Per-doc ``(doc_id, n_tokens, md5(space-joined token string))``
    under the learned merge table — the full token SEQUENCE fingerprint
    (vs :func:`bpe_token_counts_model`'s counts only), verifying
    ``bpe_apply_indexed``'s join-and-regroup path reproduces the exact
    greedy-fold tokenization order-preservingly. Integer/string only;
    md5 keeps the literal oracle table compact."""
    import hashlib

    ranked = [(l, r) for _, l, r, _, _ in bpe_merges_model(sf_dir, num_merges)]
    out: list[tuple[int, int, str]] = []
    for doc_id, text in _documents(sf_dir):
        toks: list[str] = []
        for w in _WS.split((text or "").lower()):
            if not w:
                continue
            syms = list(w) + ["</w>"]
            for left, right in ranked:
                ns: list[str] = []
                for x in syms:
                    if ns and ns[-1] == left and x == right:
                        ns[-1] = left + right
                    else:
                        ns.append(x)
                syms = ns
            toks.extend(syms)
        out.append(
            (
                int(doc_id),
                len(toks),
                hashlib.md5(" ".join(toks).encode()).hexdigest(),
            )
        )
    return tuple(out)


def bpe_indexed_tokens_sql(num_merges: int = 8) -> str:
    rows = bpe_tokens_model(oracle_sf_dir(), num_merges)
    vals = ", ".join(f"({d}, {n}, '{h}')" for d, n, h in rows)
    # All-integer/string pipeline — the Python model IS the oracle (the
    # d28/d30 literal-table contract); md5 compacts the token sequence.
    return f"""
    select cast(doc_id as bigint) as doc_id,
           cast(n_bpe_tokens as bigint) as n_bpe_tokens, tok_md5
    from (values {vals}) t(doc_id, n_bpe_tokens, tok_md5)
    """


def dsir_scores_model(
    sf_dir: str,
    num_buckets: int = 4096,
    ngram_n: int = 2,
    target_source: str = "src0",
    scale: int = 10**6,
) -> list[tuple[int, int, int]]:
    """Independent model of ``operators.dsir.dsir_pipeline`` over the
    documents table (target = one source): hashed gram-occurrence counts
    (public-spec XXH64, signed pmod), Laplace-smoothed integerized
    log-ratio weights, integer score sums. The only floats are the
    driver-side ``math.log`` calls — the SAME runtime the Spark operator
    fits its weights in, so there is no cross-engine float op at all."""
    import duckdb
    import math

    con = duckdb.connect()
    rows = con.execute(
        f"select doc_id, text, source from read_parquet('{sf_dir}/documents.parquet') "
        "order by doc_id"
    ).fetchall()
    con.close()

    def buckets(text: str) -> list[int]:
        toks = [w for w in _WS.split((text or "").lower()) if w]
        out = []
        for n in range(1, ngram_n + 1):
            for i in range(len(toks) - n + 1):
                g = " ".join(toks[i : i + n])
                out.append(xxh64_str(g, 42) % num_buckets)
        return out

    docs = [(int(d), buckets(t)) for d, t, _ in rows]
    tgt = [buckets(t) for d, t, s in rows if s == target_source]
    cr: dict[int, int] = {}
    for _, bs in docs:
        for b in bs:
            cr[b] = cr.get(b, 0) + 1
    ct: dict[int, int] = {}
    for bs in tgt:
        for b in bs:
            ct[b] = ct.get(b, 0) + 1
    tr, tt = sum(cr.values()), sum(ct.values())
    w = {
        bk: math.floor(
            scale
            * (
                math.log((ct.get(bk, 0) + 1) / (tt + num_buckets))
                - math.log((cr.get(bk, 0) + 1) / (tr + num_buckets))
            )
        )
        for bk in set(cr) | set(ct)
    }
    default_w = math.floor(
        scale
        * (math.log(1 / (tt + num_buckets)) - math.log(1 / (tr + num_buckets)))
    )
    return [
        (d, sum(w.get(b, default_w) for b in bs), len(bs)) for d, bs in docs
    ]


def dsir_scores_sql(
    num_buckets: int = 4096,
    ngram_n: int = 2,
    target_source: str = "src0",
) -> str:
    rows = dsir_scores_model(
        oracle_sf_dir(), num_buckets, ngram_n, target_source
    )
    vals = ", ".join(f"({d}, {s}, {g})" for d, s, g in rows)
    # All-integer pipeline (floats only in the shared driver-side log
    # fit) — the Python model IS the oracle, the d28/d30 literal-table
    # contract.
    return f"""
    select cast(doc_id as bigint) as doc_id,
           cast(dsir_score as bigint) as dsir_score,
           cast(n_grams as bigint) as n_grams
    from (values {vals}) t(doc_id, dsir_score, n_grams)
    """


def jl_signs_model(
    out_dim: int = 16, in_dim: int = 64, seed: int = 42
) -> list[tuple[int, int, int]]:
    """The deterministic JL sign matrix (j, i, s): s = +1 when
    xxhash64(seed*2^40 + j*2^20 + i) is even (pmod 2 == 0), else -1 —
    public-spec XXH64 of the 8-byte LE long, Spark LongType path."""
    rows = []
    for j in range(out_dim):
        for i in range(in_dim):
            key = (seed << 40) + (j << 20) + i
            h = to_signed(xxh64_long(key, 42))
            rows.append((j, i, 1 if h % 2 == 0 else -1))
    return rows


def jl_project_sql(out_dim: int = 16, in_dim: int = 64, seed: int = 42) -> str:
    vals = ", ".join(f"({j}, {i}, {s})" for j, i, s in jl_signs_model(out_dim, in_dim, seed))
    # Only the hash-derived sign matrix is literal (DuckDB lacks
    # xxhash64); the projection itself — float32 -> double ->
    # decimal(18,9) -> scaled long, then the signed integer sums — is
    # real relational work DuckDB performs over the parquet, exactly
    # mirroring the Spark fold (integer sums are order-free).
    return f"""
    with s(j, i, sgn) as (values {vals}),
    x as (
      select vec_id, i.i as i,
             cast(cast(cast(embedding[i.i + 1] as double) as decimal(18,9))
                  * 1000000000 as bigint) as vl
      from embeddings, (select unnest(range({in_dim})) as i) i
    )
    select x.vec_id, cast(s.j as int) as j,
           cast(sum(s.sgn * x.vl) as bigint) as comp
    from x join s on s.i = x.i
    group by x.vec_id, s.j
    """


@lru_cache(maxsize=2)
def jl_ann_candidates(
    sf_dir: str,
    k: int = 5,
    refine: int = 4,
    query_max_id: int = 30,
    out_dim: int = 16,
    seed: int = 42,
) -> tuple[tuple[int, int], ...]:
    """(query_id, match_id) coarse candidates of the JL-coarse ANN
    (queries = vec_id < query_max_id, corpus = everything): JL longs =
    HALF_UP(value·10⁹) exactly as Spark's double→decimal(18,9)→·10⁹→long
    path (java BigDecimal(double).setScale(9, HALF_UP) == Python
    Decimal(float)·10⁹ to_integral HALF_UP — both round the exact binary
    value), signed-summed with the hashed sign matrix, downscaled by the
    arithmetic shift >> 7 (Python floor-shift == Spark shiftright), then
    exact int dots, top k·refine per query by (-dot, match_id), self
    excluded."""
    from decimal import ROUND_HALF_UP, Decimal

    ids, mat = _embeddings(sf_dir)
    signs = {}
    for j, i, s in jl_signs_model(out_dim, mat.shape[1], seed):
        signs[(j, i)] = s

    def vlong(x: float) -> int:
        return int(
            (Decimal(float(x)) * (10**9)).to_integral_value(
                rounding=ROUND_HALF_UP
            )
        )

    codes = []
    for row in mat:
        vl = [vlong(x) for x in row]
        codes.append(
            [
                sum(signs[(j, i)] * vl[i] for i in range(len(vl))) >> 7
                for j in range(out_dim)
            ]
        )
    cands: list[tuple[int, int]] = []
    for qi, qid in enumerate(ids):
        if qid >= query_max_id:
            continue
        scored = sorted(
            (
                -sum(a * b for a, b in zip(codes[qi], codes[ci])),
                int(mid),
            )
            for ci, mid in enumerate(ids)
            if int(mid) != int(qid)
        )[: k * refine]
        cands.extend((int(qid), mid) for _, mid in scored)
    return tuple(sorted(cands))


def jl_ann_sql(k: int = 5) -> str:
    cands = jl_ann_candidates(oracle_sf_dir())
    vals = ", ".join(f"({q}, {m})" for q, m in cands)
    # Candidates from the exact-integer JL coarse pass (modeled above);
    # DuckDB performs only the float rescore — rounded to 4dp BEFORE
    # ranking, mirroring the declared query's score_round=4.
    return f"""
    with cand(query_id, match_id) as (values {vals}),
    scored as (
      select c.query_id::BIGINT as query_id, c.match_id::BIGINT as match_id,
             round(list_cosine_similarity(
               list_transform(q.embedding, x -> cast(x as double)),
               list_transform(m.embedding, x -> cast(x as double))), 4) as score
      from cand c
      join embeddings q on q.vec_id = c.query_id
      join embeddings m on m.vec_id = c.match_id
    ), ranked as (
      select query_id, match_id, score,
             row_number() over (partition by query_id
                                order by score desc, match_id) as rank
      from scored)
    select query_id, match_id, score, rank
    from ranked where rank <= {k}
    """


@lru_cache(maxsize=2)
def _jl_reduced(sf_dir: str, out_dim: int = 16, seed: int = 42):
    """id -> 16-d reduced double vector (exactly ``long / 1e9`` of the
    exact-integer JL components — one IEEE division, engine-invariant),
    shared by the jl_ivf model below."""
    from decimal import ROUND_HALF_UP, Decimal

    ids, mat = _embeddings(sf_dir)
    signs = {}
    for j, i, s in jl_signs_model(out_dim, mat.shape[1], seed):
        signs[(j, i)] = s

    def vlong(x: float) -> int:
        return int(
            (Decimal(float(x)) * (10**9)).to_integral_value(
                rounding=ROUND_HALF_UP
            )
        )

    out = {}
    for row_i, vid in enumerate(ids):
        vl = [vlong(x) for x in mat[row_i]]
        out[int(vid)] = [
            sum(signs[(j, i)] * vl[i] for i in range(len(vl))) / 1e9
            for j in range(out_dim)
        ]
    return ids, out


def jl_ivf_candidates(
    sf_dir: str,
    k: int = 5,
    refine: int = 4,
    query_max_id: int = 30,
    out_dim: int = 16,
    jl_seed: int = 42,
    nlist: int = 8,
    nprobe: int = 4,
    bits: int = 8,
) -> tuple[tuple[int, int], ...]:
    """(query_id, match_id) coarse candidates of the JL × IVF × int8
    composed ANN (d38): every vector reduced to its exact JL double view
    (``_jl_reduced``), seed-vector centroids = the reduced vectors of
    the ``nlist`` smallest ids (cell = rank order), max-cosine cell
    assignment (the proven d03c sequential-fold model, ties → smallest
    cell), per-dim [min,max] int8 codes fitted on the REDUCED corpus
    (the proven d16 numpy model), queries probe their ``nprobe`` top
    cells, coarse ranking = exact-int64 centered-code dot within the
    probed cells, top ``k × refine`` per query by (-dot, match_id),
    self excluded."""
    import numpy as np

    ids, red = _jl_reduced(sf_dir, out_dim, jl_seed)
    cents = [(c, red[vid]) for c, vid in enumerate(sorted(red)[:nlist])]

    def ranked_cells(vec) -> list[int]:
        return [
            c for _, c in sorted((-_seq_cosine(vec, cv), j) for j, cv in cents)
        ]

    levels = float((1 << bits) - 1)
    center = 1 << (bits - 1)
    idarr = sorted(red)
    mat = np.array([red[v] for v in idarr], dtype=np.float64)
    mn = mat.min(axis=0)
    span = mat.max(axis=0) - mn
    d = mat - mn
    with np.errstate(divide="ignore", invalid="ignore"):
        raw = np.floor(d / span * levels)
    codes = np.where(span == 0.0, 0.0, np.clip(raw, 0.0, levels)).astype(np.int64)
    cent = codes - center
    idx_of = {int(v): i for i, v in enumerate(idarr)}
    cells: dict[int, list[int]] = {}
    for vid in idarr:
        cells.setdefault(ranked_cells(red[vid])[0], []).append(vid)
    cands: list[tuple[int, int]] = []
    for vid in idarr:
        if vid >= query_max_id:
            continue
        qrow = cent[idx_of[vid]]
        pool: list[int] = []
        for c in ranked_cells(red[vid])[:nprobe]:
            pool.extend(int(m) for m in cells.get(c, ()) if int(m) != vid)
        order = sorted(
            (-int(qrow @ cent[idx_of[m]]), m) for m in pool
        )[: k * refine]
        cands.extend((vid, m) for _, m in order)
    return tuple(sorted(cands))


def jl_ivf_quantized_sql(k: int = 5) -> str:
    cands = jl_ivf_candidates(oracle_sf_dir())
    vals = ", ".join(f"({q}, {m})" for q, m in cands)
    # Candidates from the composed JL+cell+integer coarse model above;
    # DuckDB performs only the full-dimension float rescore, 4dp
    # round-before-rank (the d20/d36 contract).
    return f"""
    with cand(query_id, match_id) as (values {vals}),
    scored as (
      select c.query_id::BIGINT as query_id, c.match_id::BIGINT as match_id,
             round(list_cosine_similarity(
               list_transform(q.embedding, x -> cast(x as double)),
               list_transform(m.embedding, x -> cast(x as double))), 4) as score
      from cand c
      join embeddings q on q.vec_id = c.query_id
      join embeddings m on m.vec_id = c.match_id
    ), ranked as (
      select query_id, match_id, score,
             row_number() over (partition by query_id
                                order by score desc, match_id) as rank
      from scored)
    select query_id, match_id, score, rank
    from ranked where rank <= {k}
    """


# -------------------------------------------- multiclass language ID (d39)

#: Planted multilingual corpus for the trained language-ID query — the
#: synthetic documents table's ``lang`` label is uncorrelated with its
#: text (all tables share one fake-word generator), so the classifier is
#: trained and verified on these fixtures instead. Single source for the
#: Spark query AND this oracle. Even doc_ids train; odd ids are held out.
LANGID_CLASSES = ("de", "en", "es", "fr", "zh")
LANGID_FIXTURES: tuple[tuple[int, str, str], ...] = tuple(
    (i, lang, text)
    for i, (lang, text) in enumerate(
        pair
        for group in zip(
            [
                ("de", "das wetter ist heute klar und die kinder gehen zusammen zur schule"),
                ("de", "der zug kommt am abend an und wir warten auf dem bahnsteig"),
                ("de", "ich möchte ein brot und etwas käse vom markt kaufen"),
                ("de", "die katze schläft den ganzen tag auf dem warmen sofa"),
                ("de", "morgen fahren wir mit dem fahrrad durch den schönen wald"),
                ("de", "das buch liegt seit einer woche auf dem kleinen tisch"),
                ("de", "meine schwester wohnt in einer alten stadt am fluss"),
                ("de", "wir trinken kaffee und sprechen über die lange reise"),
            ],
            [
                ("en", "the weather today is bright and the children walk to school together"),
                ("en", "the train arrives in the evening and we wait on the platform"),
                ("en", "i would like to buy some bread and cheese from the market"),
                ("en", "the cat sleeps on the warm sofa for the whole day"),
                ("en", "tomorrow we will ride our bicycles through the beautiful forest"),
                ("en", "the book has been lying on the small table for a week"),
                ("en", "my sister lives in an old town beside the river"),
                ("en", "we drink coffee and talk about the long journey ahead"),
            ],
            [
                ("es", "el tiempo de hoy es claro y los niños caminan juntos a la escuela"),
                ("es", "el tren llega por la tarde y esperamos en el andén"),
                ("es", "quiero comprar pan y un poco de queso en el mercado"),
                ("es", "el gato duerme todo el día en el sofá caliente"),
                ("es", "mañana vamos en bicicleta por el bosque hermoso"),
                ("es", "el libro está sobre la mesa pequeña desde hace una semana"),
                ("es", "mi hermana vive en una ciudad antigua junto al río"),
                ("es", "bebemos café y hablamos del largo viaje que viene"),
            ],
            [
                ("fr", "le temps est clair aujourd'hui et les enfants marchent ensemble vers l'école"),
                ("fr", "le train arrive le soir et nous attendons sur le quai"),
                ("fr", "je voudrais acheter du pain et un peu de fromage au marché"),
                ("fr", "le chat dort toute la journée sur le canapé chaud"),
                ("fr", "demain nous ferons du vélo à travers la belle forêt"),
                ("fr", "le livre est posé sur la petite table depuis une semaine"),
                ("fr", "ma sœur habite dans une vieille ville au bord de la rivière"),
                ("fr", "nous buvons du café et parlons du long voyage à venir"),
            ],
            [
                ("zh", "今天天气晴朗孩子们一起走路去学校"),
                ("zh", "火车晚上到达我们在站台上等候"),
                ("zh", "我想在市场买一些面包和奶酪"),
                ("zh", "猫整天睡在温暖的沙发上"),
                ("zh", "明天我们骑自行车穿过美丽的森林"),
                ("zh", "这本书在小桌子上放了一个星期"),
                ("zh", "我的姐姐住在河边的一座老城里"),
                ("zh", "我们喝咖啡谈论即将到来的长途旅行"),
            ],
        )
        for pair in group
    )
)


@lru_cache(maxsize=1)
def langid_softmax_labels() -> tuple[tuple[int, str], ...]:
    """Independent model of d39: hashed char-bigram softmax fit on the
    EVEN-id fixtures (full-batch float64 GD, the d24 deterministic-fit
    contract reimplemented here end-to-end), then every fixture scored
    by the exact-integer argmax over floor(1e9)-quantized weights +
    biases (ties -> smallest class index). Mirrors
    operators.quality_model.fit_hashed_softmax/score_hashed_softmax
    formula-for-formula without importing them."""
    import math

    import numpy as np

    num_features, num_classes = 1024, len(LANGID_CLASSES)
    cls_idx = {c: i for i, c in enumerate(LANGID_CLASSES)}

    def grams(text: str) -> list[str]:
        s = (text or "").strip(" ").lower()
        return [s[j : j + 2] for j in range(len(s) - 1)]

    train = [(t, cls_idx[l]) for i, l, t in LANGID_FIXTURES if i % 2 == 0]
    n = len(train)
    X = np.zeros((n, num_features), dtype=np.float64)
    Y = np.zeros((n, num_classes), dtype=np.float64)
    for i, (text, cls) in enumerate(train):
        Y[i, cls] = 1.0
        for g in grams(text):
            X[i, xxh64_str(g) % num_features] += 1.0
    W = np.zeros((num_features, num_classes), dtype=np.float64)
    b = np.zeros(num_classes, dtype=np.float64)
    lr, l2 = 1.0, 1e-3
    for _ in range(60):
        z = X @ W + b
        z = z - z.max(axis=1, keepdims=True)
        e = np.exp(z)
        p = e / e.sum(axis=1, keepdims=True)
        G = X.T @ (p - Y) / n + l2 * W
        W -= lr * G
        b -= lr * (p - Y).mean(axis=0)
    wq = np.floor(W * 1e9).astype(np.int64)
    bq = [int(math.floor(float(x) * 1e9)) for x in b]
    out: list[tuple[int, str]] = []
    for i, _, text in LANGID_FIXTURES:
        scores = [int(bq[c]) for c in range(num_classes)]
        for g in grams(text):
            bkt = xxh64_str(g) % num_features
            for c in range(num_classes):
                scores[c] += int(wq[bkt, c])
        best = min((-s, c) for c, s in enumerate(scores))[1]
        out.append((i, LANGID_CLASSES[best]))
    return tuple(out)


def langid_softmax_sql() -> str:
    vals = ", ".join(f"({i}, '{l}')" for i, l in langid_softmax_labels())
    # Entirely integer argmax over a deterministic float64 fit — the
    # Python model IS the oracle (the d24/d28 literal-table contract).
    return f"""
    select cast(doc_id as bigint) as doc_id, lang
    from (values {vals}) t(doc_id, lang)
    """


def bpe_counts_indexed_sql(num_merges: int = 8) -> str:
    rows = bpe_tokens_model(oracle_sf_dir(), num_merges)
    vals = ", ".join(f"({d}, {n})" for d, n, _ in rows)
    # Same independent token-sequence model as d37, counts projection —
    # the counts-only indexed path must agree with the full tokenization.
    return f"""
    select cast(doc_id as bigint) as doc_id,
           cast(n_bpe_tokens as bigint) as n_bpe_tokens
    from (values {vals}) t(doc_id, n_bpe_tokens)
    """


def tokenized_shuffled_packing_sql(
    budget: int = 512, salt: int = 42, num_merges: int = 8
) -> str:
    """d42: the d40 counts model composed with the d41 hash-order chain
    — per-doc n_tokens comes from the independent BPE tokenization
    model (not the whitespace stand-in), layout order from the same
    signed-xxhash64(doc_id, salt) rank table. The chained oracle is
    literally the composition of the two proven models."""
    counts = {d: n for d, n, _ in bpe_tokens_model(oracle_sf_dir(), num_merges)}
    keyed = sorted(
        (to_signed(xxh64_long(salt, xxh64_long(i, 42))), i) for i in counts
    )
    vals = ", ".join(
        f"({i}, {rk}, {counts[i]})" for rk, (_, i) in enumerate(keyed)
    )
    return f"""
    with ord(doc_id, rk, n_tokens) as (values {vals}),
    c as (
      select cast(doc_id as bigint) as doc_id,
             cast(n_tokens as bigint) as n_bpe_tokens,
             cast(coalesce(sum(n_tokens) over (order by rk
                     rows between unbounded preceding and 1 preceding),
                   0) as bigint) as cb
      from ord
    )
    select doc_id, n_bpe_tokens,
           cast(floor(cb / {budget}.0) as bigint) as seq_id,
           cast(cb % {budget} as bigint) as seq_offset
    from c
    """


def bpe_packing_sql_512() -> str:
    """c24: the d31 oracle shape at the streaming budget — id-order
    packing of the independent BPE counts model at budget 512."""
    return bpe_packing_sql(num_merges=8, budget=512)


def shuffled_packing_sql(budget: int = 512, salt: int = 42) -> str:
    # Deterministic shuffle order: rank by signed xxhash64(doc_id, salt)
    # with doc_id tie-break — the exact two-column hash chain Spark's
    # F.xxhash64(col, lit) computes (seed 42 folded left-to-right).
    ids = [i for i, _ in _documents(oracle_sf_dir())]
    keyed = sorted(
        (to_signed(xxh64_long(salt, xxh64_long(i, 42))), i) for i in ids
    )
    vals = ", ".join(f"({i}, {rk})" for rk, (_, i) in enumerate(keyed))
    return f"""
    with ord(doc_id, rk) as (values {vals}),
    t as (
      select d.doc_id,
             cast(len(regexp_split_to_array(lower(trim(d.text)), '\\s+'))
               as bigint) as n_tokens,
             o.rk
      from documents d join ord o using (doc_id)
    ), c as (
      select doc_id, n_tokens,
             cast(coalesce(sum(n_tokens) over (order by rk
                     rows between unbounded preceding and 1 preceding),
                   0) as bigint) as cb
      from t
    )
    select doc_id, n_tokens,
           cast(floor(cb / {budget}.0) as bigint) as seq_id,
           cast(cb % {budget} as bigint) as seq_offset
    from c
    """


def group_split_assignments(
    sf_dir: str,
    weights: tuple[tuple[str, float], ...] = (
        ("train", 0.8), ("val", 0.1), ("test", 0.1),
    ),
    buckets: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Independent model of operators.text.group_split over the
    documents table's distinct sources: Spark's
    ``pmod(xxhash64(source), buckets)`` replayed with the public-spec
    XXH64 (string path, seed 42; python ``%`` of a signed value IS
    pmod), then cumulative-threshold assignment. Returns
    ``[(source, split)]`` for the d81 literal oracle table."""
    import duckdb

    con = duckdb.connect()
    rows = con.sql(
        f"select distinct source from read_parquet('{sf_dir}/documents.parquet')"
        " order by source"
    ).fetchall()
    out = []
    for (src,) in rows:
        b = xxh64_str(src) % buckets
        cum = 0.0
        split = weights[-1][0]
        for name, w in weights[:-1]:
            cum += w
            if b < int(cum * buckets + 0.5):
                split = name
                break
        out.append((src, split))
    return out


# ------------------------------------------- source overlap matrix (d82)
@lru_cache(maxsize=4)
def source_overlap_counts(
    sf_dir: str, num_hashes: int = 64
) -> tuple[tuple[str, str, int], ...]:
    """Model of ``operators.dedup.source_overlap_matrix``: per source,
    the MinHash signature of the UNION of its documents' shingle sets
    (same xxhash64(i, xxhash64(shingle)) chain, signed min), then per
    unordered source pair the count of agreeing positions. Independent
    of Spark: set union + the public-spec XXH64 model."""
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"select source, text from read_parquet('{sf_dir}/documents.parquet') "
        "where source is not null order by doc_id"
    ).fetchall()
    con.close()
    union_shingles: dict[str, set[str]] = {}
    for source, text in rows:
        if text is None:
            continue
        union_shingles.setdefault(source, set()).update(_shingles(text))
    seeds = [xxh64_int(i, 42) for i in range(num_hashes)]
    sigs = {
        s: [
            min(
                to_signed(xxh64_long(xxh64_bytes(g.encode("utf-8")), sd))
                for g in grams
            )
            for sd in seeds
        ]
        for s, grams in union_shingles.items()
        if grams
    }
    out = []
    names = sorted(sigs)
    for i, sa in enumerate(names):
        for sb in names[i + 1 :]:
            eq = sum(x == y for x, y in zip(sigs[sa], sigs[sb]))
            out.append((sa, sb, eq))
    return tuple(out)


def source_overlap_sql(num_hashes: int = 64) -> str:
    rows = source_overlap_counts(oracle_sf_dir(), num_hashes)
    vals = ", ".join(f"('{a}', '{b}', {e})" for a, b, e in rows)
    return f"""
    select source_a, source_b, cast(n_eq as bigint) as n_eq,
           floor(n_eq * 1.0 / {num_hashes} * 1000000.0 + 0.5) / 1000000.0
             as est_jaccard
    from (values {vals}) as t(source_a, source_b, n_eq)
    """


# ------------------------------------------ TextRank keywords (d86)
_WORD_RUN = re.compile(r"[a-z]+")


@lru_cache(maxsize=4)
def textrank_rows(
    sf_dir: str,
    iters: int = 10,
    scale: int = 10**12,
    k: int = 25,
    min_len: int = 3,
) -> tuple[tuple[int, str, int], ...]:
    """(rank_pos, token, rank_scaled) model of d86: undirected
    adjacent-word co-occurrence graph over lowercase letter runs of
    length >= min_len (TextRank, Mihalcea & Tarau 2004 — window 2,
    both edge directions), ranked by the SAME exact-integer PageRank
    recurrence as d28; top k by (rank_scaled desc, token asc)."""
    edges = []
    for _doc_id, text in _documents(sf_dir):
        if text is None:
            continue
        toks = [
            t for t in _WORD_RUN.findall(text.lower()) if len(t) >= min_len
        ]
        for a, b in zip(toks, toks[1:]):
            if a != b:
                edges.append((a, b))
                edges.append((b, a))
    r = _int_pagerank(edges, iters, scale)
    top = sorted(r.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return tuple(
        (i + 1, tok, rank) for i, (tok, rank) in enumerate(top)
    )


def textrank_sql(k: int = 25) -> str:
    rows = textrank_rows(oracle_sf_dir(), k=k)
    vals = ", ".join(
        f"({pos}, '{tok}', {rank})" for pos, tok, rank in rows
    )
    return f"""
    select cast(rank_pos as bigint) as rank_pos, token,
           cast(rank_scaled as bigint) as rank_scaled
    from (values {vals}) t(rank_pos, token, rank_scaled)
    """


# ------------------------------------------------------- unigram LM (d89)
_UNK_LP = -27631021116  # shared literal with operators/unigram.py


def _unigram_word_weights(sf_dir: str) -> dict[str, int]:
    weights: dict[str, int] = {}
    for _doc_id, text in _documents(sf_dir):
        for w in _WS.split((text or "").lower()):
            if w != "":
                weights[w] = weights.get(w, 0) + 1
    return weights


def _unigram_viterbi(
    word: str, lp: dict[str, int], max_piece_len: int
) -> list[str]:
    """Best segmentation under scaled-integer log-probs; every
    position carries an UNK single-char candidate at _UNK_LP.
    Tie-break mirrors the operator: higher score, then LONGER piece."""
    n = len(word)
    # dp[i] = (score, backpointer_start, backpointer_len), 1-based
    dp: list[tuple[int, int, int]] = [(0, 0, 0)] * (n + 1)
    for i in range(1, n + 1):
        best = (-(1 << 62), 0, 0)
        for l in range(1, min(max_piece_len, i) + 1):
            s = i - l + 1
            piece = word[s - 1 : i]
            plp = lp.get(piece)
            if plp is None:
                if l == 1:
                    plp = _UNK_LP
                else:
                    continue
            elif l == 1 and plp < _UNK_LP:
                # the operator's UNK candidate also exists at l=1 and
                # would win over a kept-but-lower-lp char
                plp = max(plp, _UNK_LP)
            sc = dp[s - 1][0] + plp
            if sc > best[0] or (sc == best[0] and l > best[2]):
                best = (sc, s, l)
        dp[i] = best
    parts: list[str] = []
    pos = n
    while pos > 0:
        _, s, l = dp[pos]
        parts.append(word[s - 1 : pos])
        pos = s - 1
    return list(reversed(parts))


def unigram_fit_rows(
    sf_dir: str,
    vocab_size: int = 300,
    seed_size: int = 800,
    max_piece_len: int = 4,
    em_iters: int = 2,
    max_word_len: int = 64,
):
    """Independent Python model of operators/unigram.unigram_lm_fit:
    seed = top substrings by (weight desc, piece asc) + all chars;
    hard-EM rounds of Viterbi segmentation + exact integer recounts;
    prune to vocab_size keeping all single chars; scaled log-probs
    floor(ln(cnt/total)·1e9)."""
    import math

    weights = _unigram_word_weights(sf_dir)
    # seed candidates
    cand: dict[str, int] = {}
    for w, wt in weights.items():
        n = len(w)
        for i in range(n):
            for l in range(1, min(max_piece_len, n - i) + 1):
                p = w[i : i + l]
                cand[p] = cand.get(p, 0) + wt
    ranked = sorted(cand.items(), key=lambda kv: (-kv[1], kv[0]))
    kept = {p: c for p, c in ranked[:seed_size]}
    for p, c in cand.items():
        if len(p) == 1:
            kept[p] = c
    total = sum(kept.values())
    lp = {
        p: (
            math.floor(math.log(c / total) * 1e9) if c > 0 else _UNK_LP
        )
        for p, c in kept.items()
    }
    cnts = dict(kept)
    for _ in range(em_iters):
        used: dict[str, int] = {}
        for w, wt in weights.items():
            if len(w) > max_word_len:
                parts = list(w)
            else:
                parts = _unigram_viterbi(w, lp, max_piece_len)
            for p in parts:
                used[p] = used.get(p, 0) + wt
        recount = {p: used.get(p, 0) for p in cnts}
        ranked = sorted(recount.items(), key=lambda kv: (-kv[1], kv[0]))
        new = {p: c for p, c in ranked[:vocab_size]}
        for p, c in recount.items():
            if len(p) == 1:
                new[p] = c
        tot = sum(new.values())
        cnts = new
        lp = {
            p: (
                math.floor(math.log(c / tot) * 1e9) if c > 0 else _UNK_LP
            )
            for p, c in cnts.items()
        }
    return tuple(
        (p, cnts[p], lp[p]) for p in sorted(cnts)
    )


def unigram_fit_sql() -> str:
    rows = unigram_fit_rows(oracle_sf_dir())
    vals = ", ".join(
        "('{}', {}, {})".format(p.replace("'", "''"), c, l)
        for p, c, l in rows
    )
    return f"""
    select piece, cast(cnt as bigint) as cnt, cast(lp as bigint) as lp
    from (values {vals}) t(piece, cnt, lp)
    """


def unigram_fertility_rows(
    sf_dir: str,
    vocab_size: int = 300,
    seed_size: int = 800,
    max_piece_len: int = 4,
    em_iters: int = 2,
    max_word_len: int = 64,
):
    """Per-source fertility of the d89 unigram tokenizer: fit with the
    same model as unigram_fit_rows, tokenize every doc (long words
    char-split, as the operator), aggregate tokens/words per source."""
    import duckdb
    import math

    pieces = unigram_fit_rows(
        sf_dir, vocab_size, seed_size, max_piece_len, em_iters,
        max_word_len,
    )
    lp = {p: l for p, _c, l in pieces}
    con = duckdb.connect()
    docs = con.execute(
        f"select doc_id, source, text from "
        f"read_parquet('{sf_dir}/documents.parquet') order by doc_id"
    ).fetchall()
    con.close()
    seg_cache: dict[str, int] = {}
    agg: dict[str, list[int]] = {}
    for _doc_id, source, text in docs:
        n_words = n_toks = 0
        for w in _WS.split((text or "").lower()):
            if w == "":
                continue
            n_words += 1
            if w not in seg_cache:
                if len(w) > max_word_len:
                    seg_cache[w] = len(w)
                else:
                    seg_cache[w] = len(
                        _unigram_viterbi(w, lp, max_piece_len)
                    )
            n_toks += seg_cache[w]
        a = agg.setdefault(source, [0, 0, 0])
        a[0] += 1
        a[1] += n_words
        a[2] += n_toks
    out = []
    for source in sorted(agg):
        n_docs, n_words, n_toks = agg[source]
        fert = (
            math.floor(n_toks / n_words * 1e6 + 0.5) / 1e6
            if n_words > 0
            else 0.0
        )
        out.append((source, n_docs, n_words, n_toks, fert))
    return tuple(out)


def unigram_fertility_sql() -> str:
    rows = unigram_fertility_rows(oracle_sf_dir())
    vals = ", ".join(
        "('{}', {}, {}, {}, {})".format(
            s.replace("'", "''"), d, w, t, f
        )
        for s, d, w, t, f in rows
    )
    return f"""
    select source, cast(n_docs as bigint) as n_docs,
           cast(n_words as bigint) as n_words,
           cast(n_um_tokens as bigint) as n_um_tokens,
           cast(fertility as double) as fertility
    from (values {vals}) t(source, n_docs, n_words, n_um_tokens, fertility)
    """


# ------------------------------------------------------------ k-core (d92)
def kcore_rows(sf_dir: str):
    """Independent Python model of operators/graphrank.kcore_decompose
    over the d49 part co-purchase graph: exact Batagelj-Zaveršnik
    peeling (repeatedly remove the minimum-degree node; its core = the
    current peel level) — the sequential algorithm the distributed
    h-index fixpoint provably converges to."""
    import duckdb

    con = duckdb.connect()
    pairs = con.execute(
        f"""
        with l as (
          select l_orderkey as o, l_partkey as p
          from read_parquet('{sf_dir}/lineitem.parquet')
        )
        select distinct least(a.p, b.p), greatest(a.p, b.p)
        from l a join l b on a.o = b.o and a.p < b.p
        """
    ).fetchall()
    con.close()
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        a, b = int(a), int(b)
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    core: dict[int, int] = {}
    alive = set(adj)
    import heapq

    heap = [(d, v) for v, d in deg.items()]
    heapq.heapify(heap)
    k = 0
    while heap:
        d, v = heapq.heappop(heap)
        if v not in alive or d != deg[v]:
            continue
        k = max(k, d)
        core[v] = k
        alive.discard(v)
        for u in adj[v]:
            if u in alive:
                deg[u] -= 1
                heapq.heappush(heap, (deg[u], u))
    return tuple(sorted(core.items()))


def kcore_sql() -> str:
    rows = kcore_rows(oracle_sf_dir())
    vals = ", ".join(f"({n}, {c})" for n, c in rows)
    return f"""
    select cast(node as bigint) as node, cast(core as bigint) as core
    from (values {vals}) t(node, core)
    """
