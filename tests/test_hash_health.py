"""Parametrized health pins for EVERY hand-rolled hash family.

Round-8 lesson generalized (VERDICT r8, next-round item 2): the
hyperplane weight formula silently degenerated to 7 effective planes
because nothing asserted the family's health mechanically. This suite
recomputes each deterministic family EXACTLY as the engines do
(pure python/numpy — no Spark, runs in seconds) and checks, per
family:

1. parameter distinctness — no duplicated hash functions;
2. output spread — bucket occupancy and max-bucket fraction on a
   realistic corpus, compared against an md5-random REFERENCE family
   run on the same inputs (candidate-volume parity), so "healthy"
   is defined relative to a truly-random baseline, not a magic
   number;
3. self-test — an INJECTED arithmetic-progression degeneracy (the
   round-8 bug class) must FAIL each checker, proving the checker
   can actually see the failure mode it guards.

Families covered here: the MinHash affine family (MH_FAMILIES,
queries_text.py), stable_hash60 / the SimHash bit-vote built on it
(functions/text.py), and the portable LCG (operators/sampling.py).
The hyperplane + JL integer family has its own pins in
test_lsh_family.py (this suite adds the checker self-test for its
historical degenerate formula).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from tpg_weather_etl_spark.operators.sampling import LCG_A, LCG_C, LCG_M
from tpg_weather_etl_spark.queries_text import (
    MH_BAND_ROWS,
    MH_FAMILIES,
    MH_NUM_HASHES,
    MH_P,
    SIMHASH_BANDS,
)

RNG = np.random.default_rng(9)


# ---------------------------------------------------------------------------
# generic checkers (shared by real-family pins and injection self-tests)
# ---------------------------------------------------------------------------

def affine_params(families=MH_FAMILIES, n=MH_NUM_HASHES):
    """The (multiplier, offset) mod-P pairs exactly as
    minhash_signatures builds them: hash (p, i) = ((2i+a)h + (bi+c))
    mod P."""
    return [((2 * i + a) % MH_P, (b * i + c) % MH_P)
            for (a, b, c) in families for i in range(n)]


def check_affine_distinct(params) -> list[str]:
    errs = []
    if len(set(params)) != len(params):
        errs.append("duplicated (mult, offset) hash functions")
    if any(m == 0 for m, _ in params):
        errs.append("zero multiplier (constant hash)")
    if len({m for m, _ in params}) < len(params) // 2:
        # distinct offsets with one shared multiplier give perfectly
        # rank-correlated hashes: every min-hash picks the SAME
        # argmin shingle, so all signature rows agree or disagree
        # together — the correlated-miss failure mode.
        errs.append("multiplier set too small (rank-correlated hashes)")
    return errs


def minhash_signature_matrix(sets, params):
    """(n_docs, n_hashes) min-hash matrix over python-int shingle
    sets, same arithmetic as minhash_signatures."""
    out = np.empty((len(sets), len(params)), dtype=np.int64)
    for d, s in enumerate(sets):
        h = np.fromiter(s, dtype=np.int64) % MH_P
        for k, (m, off) in enumerate(params):
            out[d, k] = ((m * h + off) % MH_P).min()
    return out


def check_minhash_estimator(sig_a, sig_b, true_j, tol) -> list[str]:
    """Pairwise estimates must straddle the true Jaccard AND vary
    across hash indices — a degenerate family yields all-0/all-1
    estimates (per-pair indicator variance exactly 0) even when the
    mean looks plausible."""
    errs = []
    eq = sig_a == sig_b
    est = eq.mean(axis=1)
    if abs(float(est.mean()) - true_j) > tol:
        errs.append(f"estimator bias: mean {est.mean():.3f} vs {true_j}")
    frac_degenerate = float(((est == 0.0) | (est == 1.0)).mean())
    if frac_degenerate > 0.05:
        errs.append(f"{frac_degenerate:.0%} of pairs estimate exactly "
                    "0 or 1 (hashes rank-correlated)")
    return errs


def band_pair_count(sig, rows=MH_BAND_ROWS):
    """Number of distinct candidate pairs the LSH band join would
    emit for a signature matrix (bands of `rows` consecutive
    hashes)."""
    n_docs, n_hashes = sig.shape
    pairs = set()
    for b in range(n_hashes // rows):
        keys = {}
        for d in range(n_docs):
            k = tuple(sig[d, b * rows:(b + 1) * rows])
            keys.setdefault(k, []).append(d)
        for ds in keys.values():
            for x in range(len(ds)):
                for y in range(x + 1, len(ds)):
                    pairs.add((ds[x], ds[y]))
    return len(pairs)


def check_bucket_spread(codes, ref_codes) -> list[str]:
    """Occupancy + max-bucket parity of engine codes vs md5-random
    reference codes over the SAME inputs."""
    errs = []
    _, c = np.unique(codes, return_counts=True)
    _, cr = np.unique(ref_codes, return_counts=True)
    if len(c) < 0.5 * len(cr):
        errs.append(f"occupied buckets {len(c)} << reference {len(cr)}")
    if c.max() > max(4 * cr.max(), 8):
        errs.append(f"max bucket {c.max()} >> reference {cr.max()}")
    return errs


def md5_int(s: str, hexchars: int = 15) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:hexchars], 16)


# ---------------------------------------------------------------------------
# corpus fixtures (module-scoped, tiny)
# ---------------------------------------------------------------------------

def make_sets(n_docs=120, n_sh=80, overlap=0.5):
    """Doc pairs (2*n_docs sets) with planted Jaccard ~= overlap/(2-overlap)
    adjusted: each pair shares `overlap` of its shingles."""
    universe = RNG.integers(0, 1 << 60, size=n_docs * n_sh * 3)
    pairs_a, pairs_b, js = [], [], []
    pos = 0
    for _ in range(n_docs):
        shared = int(n_sh * overlap)
        common = universe[pos:pos + shared]; pos += shared
        only_a = universe[pos:pos + n_sh - shared]; pos += n_sh - shared
        only_b = universe[pos:pos + n_sh - shared]; pos += n_sh - shared
        a = set(map(int, common)) | set(map(int, only_a))
        b = set(map(int, common)) | set(map(int, only_b))
        pairs_a.append(a); pairs_b.append(b)
        js.append(len(a & b) / len(a | b))
    return pairs_a, pairs_b, float(np.mean(js))


# ---------------------------------------------------------------------------
# MinHash affine family
# ---------------------------------------------------------------------------

def test_minhash_params_distinct():
    assert check_affine_distinct(affine_params()) == []


def test_minhash_estimator_health():
    a, b, true_j = make_sets()
    params = affine_params()
    sig_a = minhash_signature_matrix(a, params)
    sig_b = minhash_signature_matrix(b, params)
    assert check_minhash_estimator(sig_a, sig_b, true_j, tol=0.05) == []


def test_minhash_candidate_volume_parity_vs_md5():
    # clustered corpus: 30 clusters x 4 near-dup docs + 80 singletons
    docs = []
    for c in range(30):
        base = set(map(int, RNG.integers(0, 1 << 60, size=60)))
        for v in range(4):
            drop = set(list(base)[:3 * v])
            add = set(map(int, RNG.integers(0, 1 << 60, size=3 * v)))
            docs.append((base - drop) | add)
    for _ in range(80):
        docs.append(set(map(int, RNG.integers(0, 1 << 60, size=60))))
    engine = band_pair_count(minhash_signature_matrix(docs, affine_params()))
    # md5 reference family on the same sets
    ref_sig = np.empty((len(docs), 32), dtype=np.int64)
    for d, s in enumerate(docs):
        for i in range(32):
            ref_sig[d, i] = min(md5_int(f"{i}_{h}") for h in s)
    ref = band_pair_count(ref_sig)
    assert ref > 0
    # engine must surface a comparable candidate set — the degenerate
    # families miss whole clusters (engine << ref) or flood
    # everything into one bucket (engine >> ref)
    assert 0.5 * ref <= engine <= 2.0 * ref, (engine, ref)


def test_minhash_checker_catches_injected_degeneracy():
    # shared multiplier, arithmetic-progression offsets: the exact
    # class of bug the round-8 hyperplane formula had — every hash is
    # a monotone transform of the same ranking
    bad = [(5, (7919 * i) % MH_P) for i in range(32)]
    assert check_affine_distinct(bad) != []
    a, b, true_j = make_sets()
    sig_a = minhash_signature_matrix(a, bad)
    sig_b = minhash_signature_matrix(b, bad)
    assert check_minhash_estimator(sig_a, sig_b, true_j, tol=0.05) != []


# ---------------------------------------------------------------------------
# stable_hash60 / SimHash bit votes
# ---------------------------------------------------------------------------

def stable_hash60_py(s: str) -> int:
    """Exactly functions/text.py:stable_hash60 (and the DuckDB
    oracle's ('0x'||substr(md5(s),1,15))::BIGINT)."""
    return md5_int(s, 15)


@pytest.fixture(scope="module")
def hash60_sample():
    strs = [f"tok_{i}_{RNG.integers(0, 1 << 30)}" for i in range(4000)]
    return np.array([stable_hash60_py(s) for s in strs], dtype=np.int64)


def test_stable_hash60_bit_balance(hash60_sample):
    # every one of the 60 bits ~half set — SimHash's per-bit votes
    # are unbiased only if this holds
    bits = (hash60_sample[:, None] >> np.arange(60)[None, :]) & 1
    freq = bits.mean(axis=0)
    assert freq.min() > 0.45 and freq.max() < 0.55, (freq.min(), freq.max())


def test_simhash_band_spread(hash60_sample):
    # the 5 x 12-bit band values must each spread over the 4096-code
    # space like the md5-random reference (they ARE md5 bits, so
    # parity is near-exact; the pin exists for whoever swaps the hash)
    ref = np.array([md5_int(f"ref_{i}") for i in range(len(hash60_sample))],
                   dtype=np.int64)
    for band in range(SIMHASH_BANDS):
        codes = (hash60_sample >> (band * 12)) & 4095
        refc = (ref >> (band * 12)) & 4095
        assert check_bucket_spread(codes, refc) == [], f"band {band}"


def test_bucket_spread_checker_catches_degeneracy(hash60_sample):
    # arithmetic-progression codes concentrate mod small divisors
    bad = (np.arange(len(hash60_sample)) * 512) % 4096  # 8 codes total
    ref = hash60_sample & 4095
    assert check_bucket_spread(bad, ref) != []


# ---------------------------------------------------------------------------
# portable LCG (operators/sampling.py)
# ---------------------------------------------------------------------------

def lcg_bucket_py(keys: np.ndarray, buckets: int = 100) -> np.ndarray:
    """Exactly operators/sampling.py:lcg_bucket — high-bit quotient.
    (The original low-bit `state % buckets` failed the stride-2 case
    of the spread pin below: state parity == key parity, and an even
    modulo preserves it, so even-key tables reached only the 50 odd
    buckets and percent=1 selected nothing. Found by this test.)"""
    state = (keys.astype(np.int64) * LCG_A + LCG_C) % LCG_M
    return (state * buckets) // LCG_M


def test_lcg_spread_sequential_and_strided():
    # sequential ids AND strided ids (the shapes real key columns
    # have: auto-increment, sharded-by-2/4/8) must all fill the
    # bucket space near-uniformly — low-bit weakness of power-of-two
    # modulus LCGs shows exactly here
    for stride in (1, 2, 4, 8, 10):
        keys = np.arange(0, 50_000) * stride
        b = lcg_bucket_py(keys)
        _, counts = np.unique(b, return_counts=True)
        assert len(counts) == 100, (stride, len(counts))
        frac = counts / len(keys)
        assert frac.max() < 0.02, (stride, frac.max())
        # 10% sample predicate (the deterministic_sample gate shape)
        sel = (b < 10).mean()
        assert 0.08 < sel < 0.12, (stride, sel)


def test_lcg_checker_catches_degeneracy():
    # two injected degeneracies, both of the arithmetic-progression
    # class, must fail the spread pin above:
    keys = np.arange(0, 50_000)
    # (a) tiny multiplier: state = 100*key stays far below 2^31, so
    #     the high-bit quotient is ~0 for the whole corpus
    bad_state = (keys * 100) % LCG_M
    bad = (bad_state * 100) // LCG_M
    _, counts = np.unique(bad, return_counts=True)
    assert not (len(counts) == 100 and counts.max() / len(keys) < 0.02)
    # (b) the historical low-bit bucketing on even keys: only the 50
    #     odd buckets are reachable
    low = ((keys * 2 * LCG_A + LCG_C) % LCG_M) % 100
    _, counts2 = np.unique(low, return_counts=True)
    assert len(counts2) == 50


# ---------------------------------------------------------------------------
# hyperplane/JL integer family — checker self-test for the historical
# round-8 degenerate formula (the live pins are in test_lsh_family.py)
# ---------------------------------------------------------------------------

def test_hyperplane_checker_catches_round8_formula():
    EMB_DIM = 64
    H = np.arange(0, 39)[:, None]
    J = np.arange(EMB_DIM)[None, :]
    old = ((H * 73 + J * 37) % 7) - 3          # the round-8 bug: h mod 7
    seen = {tuple(r) for r in old.tolist()}
    assert len(seen) < len(old)                 # 7 distinct planes only
    cur = ((H * 73 + J * 37 + H * J * 29) % 97) - 48
    assert len({tuple(r) for r in cur.tolist()}) == len(cur)
