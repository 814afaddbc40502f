"""Round-7 curation operators: DSIR importance weights separate a
planted target distribution, the quality funnel composes the Gopher
rules stage-by-stage, temperature mixing flattens a skewed source
mix, and PQ top-k recovers exact neighbours on clustered vectors."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def skew_sf_dir(spark, tmp_path_factory):
    """Synthetic corpus with a DISTINCTIVE target slice: src0/src1
    docs speak 'science', src2/src3 mixed, src4+ speak 'spam'; src9
    dominates token volume 10x for the temperature test."""
    root = tmp_path_factory.mktemp("curation_sf")
    sci = "quantum photon lattice entropy boson field tensor orbit"
    spam = "click buy now cheap deal offer win prize free bonus"
    rows = []
    did = 0
    for i in range(20):
        rows.append((did, f"{sci} study {i} result {i % 3}",
                     "en", f"src{i % 2}", 60)); did += 1
    for i in range(20):
        rows.append((did, f"{sci if i % 2 else spam} item {i}",
                     "en", f"src{2 + i % 2}", 60)); did += 1
    for i in range(20):
        rows.append((did, f"{spam} offer {i} code {i % 5}",
                     "en", f"src{4 + i % 3}", 60)); did += 1
    # one token-heavy source for temperature flattening
    long_text = " ".join(f"w{j}" for j in range(300))
    for i in range(10):
        rows.append((did, long_text, "en", "src9", 1500)); did += 1
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    df.write.mode("overwrite").parquet(str(root / "documents.parquet"))
    return str(root)


def test_dsir_separates_target_from_spam(spark, skew_sf_dir):
    from tpg_weather_etl_spark.queries_ml import q_dsir_importance

    out = {r.doc_id: r for r in
           q_dsir_importance(spark, skew_sf_dir).collect()}
    by_src: dict = {}
    for r in out.values():
        by_src.setdefault(r.source, []).append(r.log_weight)
    mean = {s: sum(v) / len(v) for s, v in by_src.items()}
    # target slice (src0/src1 is IN the target set and purely sci)
    # must score strictly above the pure-spam sources
    assert mean["src0"] > mean["src4"]
    assert mean["src1"] > mean["src5"]
    # weights are finite and the table covers every document; each
    # feature occurrence contributes one bounded log-ratio term
    assert len(out) == 70
    assert all(abs(r.log_weight) < 20.0 * r.n_feats
               for r in out.values())


def test_quality_funnel_composition(spark, skew_sf_dir):
    from tpg_weather_etl_spark.queries_ml import q_quality_filter_funnel
    from tpg_weather_etl_spark.queries_text import q_gopher_quality

    stages = q_quality_filter_funnel(spark, skew_sf_dir).collect()
    assert [s.stage_idx for s in stages] == [1, 2, 3, 4]
    # sequential composition: each stage consumes the previous output
    for prev, cur in zip(stages, stages[1:]):
        assert cur.n_in == prev.n_out
    for s in stages:
        assert 0 <= s.n_out <= s.n_in
        assert s.retention == pytest.approx(
            s.n_out / s.n_in if s.n_in else 0.0, abs=1e-6)
    # the funnel's final survivors == the gopher keep flag
    keeps = (q_gopher_quality(spark, skew_sf_dir)
             .filter("keep").count())
    assert stages[-1].n_out == keeps


def test_temperature_mix_flattens_skew(spark, skew_sf_dir):
    from tpg_weather_etl_spark.queries_ml import q_temperature_mix_weights

    rows = {r.source: r for r in
            q_temperature_mix_weights(spark, skew_sf_dir).collect()}
    big, small = rows["src9"], rows["src0"]
    assert big.token_share > small.token_share
    # temperature pulls shares toward the middle: the dominant source
    # is downsampled (<1), the small one upsampled (>1)
    assert big.mix_weight < 1.0 < small.mix_weight
    # temp shares still sum to ~1
    assert sum(r.temp_share for r in rows.values()) == pytest.approx(
        1.0, abs=1e-4)


@pytest.fixture(scope="module")
def clustered_vec_dir(spark, tmp_path_factory):
    """Vectors in 4 tight clusters of 16 so exact neighbours are
    unambiguous — PQ at 8x16 codes must keep them."""
    import numpy as np

    root = tmp_path_factory.mktemp("pq_sf")
    rng = np.random.RandomState(5)
    centers = rng.randn(4, 64) * 5.0
    rows = []
    for v in range(64):
        c = centers[v % 4]
        rows.append((v, [float(x) for x in c + rng.randn(64) * 0.05],
                     f"lab{v % 4}"))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string"
    ).write.mode("overwrite").parquet(str(root / "embeddings.parquet"))
    return str(root)


def test_pq_topk_recall_on_clustered_vectors(spark, clustered_vec_dir):
    from tpg_weather_etl_spark.queries_embeddings import (
        PQ_N_QUERY,
        q_pq_topk,
    )

    out = q_pq_topk(spark, clustered_vec_dir).collect()
    by_q: dict = {}
    for r in out:
        by_q.setdefault(r.qid, []).append(r)
    assert set(by_q) == set(range(PQ_N_QUERY))
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        # ADC distances are non-decreasing with rank
        ds = [r.adc_dist for r in rs]
        assert ds == sorted(ds)
        # all 15 same-cluster vectors must dominate the top-10:
        # cross-cluster distance is ~100x the intra-cluster spread
        same = {v for v in range(64)
                if v % 4 == qid % 4 and v != qid}
        got = {r.vec_id for r in rs}
        assert got <= same, f"q{qid}: cross-cluster leak {got - same}"


def test_boilerplate_prefix_detects_template(spark, skew_sf_dir):
    from tpg_weather_etl_spark.queries_ml import _dsir_features  # noqa: F401
    from tpg_weather_etl_spark.queries_text import (
        q_boilerplate_prefixes,
    )

    rows = {r.source: r for r in
            q_boilerplate_prefixes(spark, skew_sf_dir).collect()}
    # every src9 doc is the identical long_text -> share 1.0
    assert rows["src9"].share == pytest.approx(1.0)
    assert rows["src9"].prefix == "w0 w1 w2 w3 w4"
    # shares are well-formed everywhere
    assert all(0 < r.share <= 1.0 for r in rows.values())


def test_char_entropy_orders_diversity(spark, skew_sf_dir):
    from tpg_weather_etl_spark.queries_text import q_char_entropy

    ent = {r.doc_id: r.char_entropy_bits for r in
           q_char_entropy(spark, skew_sf_dir).collect()}
    assert len(ent) == 70
    # entropy of a distribution over <=k symbols is in [0, log2(n)]
    assert all(0 <= v < 7 for v in ent.values())


def test_source_overlap_symmetric_bounds(spark, skew_sf_dir):
    from tpg_weather_etl_spark.queries_text import (
        q_source_overlap_jaccard,
    )

    rows = q_source_overlap_jaccard(spark, skew_sf_dir).collect()
    got = {(r.source_a, r.source_b): r for r in rows}
    # src0 and src1 share the identical sci vocabulary (modulo the
    # numeric suffixes); they must overlap far more than src0 vs the
    # spam-only src4
    assert got[("src0", "src1")].jaccard > got[("src0", "src4")].jaccard
    for r in rows:
        assert r.source_a < r.source_b
        assert 0 <= r.jaccard <= 1
        assert r.n_inter <= min(r.na, r.nb)


def test_contrastive_triplets_contract(spark, clustered_vec_dir):
    from tpg_weather_etl_spark.queries_embeddings import (
        PQ_N_QUERY,  # noqa: F401
        q_contrastive_triplets,
    )

    rows = q_contrastive_triplets(spark, clustered_vec_dir).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.neg_id not in (r.qid, r.pos_id)
        # positive is the exact top-1, so it dominates any negative
        assert r.pos_cos >= r.neg_cos


def test_pack_efficiency_invariants(spark, skew_sf_dir):
    from tpg_weather_etl_spark.queries_text import (
        PACK_CAP,
        q_pack_efficiency,
        q_sequence_pack,
    )

    row = q_pack_efficiency(spark, skew_sf_dir).collect()[0]
    packed = q_sequence_pack(spark, skew_sf_dir).collect()
    assert row.n_seqs == len(packed)
    assert row.total_tokens == sum(r.n_tokens for r in packed)
    # every sequence except possibly the tail is exactly full
    assert row.n_full >= row.n_seqs - 1
    assert 0 < row.fill_rate <= 1.0
    # spans ≥ starts, so the cut rate is a well-formed non-negative
    assert row.boundary_cuts >= 0
    assert row.cut_rate >= 0
    # token conservation: packed tokens == corpus tokens
    corpus_tokens = sum(
        len(r.text.split()) for r in
        spark.read.parquet(f"{skew_sf_dir}/documents.parquet").collect())
    assert row.total_tokens == corpus_tokens
    assert row.n_seqs == -(-corpus_tokens // PACK_CAP)


def test_perplexity_filter_drops_worst_decile(spark, skew_sf_dir):
    from tpg_weather_etl_spark.queries_ml import (
        PPLX_KEEP_P,
        q_bigram_logprob,
        q_perplexity_filter_apply,
    )

    scored = {r.doc_id: r.xent for r in
              q_bigram_logprob(spark, skew_sf_dir).collect()}
    kept = q_perplexity_filter_apply(spark, skew_sf_dir).collect()
    import math
    assert len(kept) >= math.ceil(PPLX_KEEP_P * len(scored)) - 1
    thr = kept[0].xent_p90
    # exactly the docs at or below the threshold survive
    assert {r.doc_id for r in kept} == {
        d for d, x in scored.items() if x <= thr}
    # and every dropped doc scores strictly above every kept doc's bar
    dropped = set(scored) - {r.doc_id for r in kept}
    assert all(scored[d] > thr for d in dropped)


def test_coverage_curve_monotone(spark, skew_sf_dir):
    from tpg_weather_etl_spark.queries_ml import (
        COVERAGE_KS,
        q_ngram_coverage_curve,
    )

    rows = q_ngram_coverage_curve(spark, skew_sf_dir).collect()
    assert [r.k for r in rows] == list(COVERAGE_KS)
    covs = [r.coverage for r in rows]
    # coverage is monotone non-decreasing in k and capped at 1
    assert covs == sorted(covs)
    assert all(0 < c <= 1.0 for c in covs)
    # this corpus has far fewer than 5000 distinct words, so the
    # largest k must cover everything exactly
    assert rows[-1].coverage == pytest.approx(1.0)
    assert rows[-1].n_vocab < 5000


@pytest.fixture(scope="module")
def bitext_dir(spark, tmp_path_factory):
    """Vectors in tight clusters with MIXED languages inside each
    cluster (a planted translation pair per cluster), plus isolated
    noise vectors — the margin criterion must mine the cross-lingual
    cluster pairs and leave the noise alone."""
    import numpy as np

    root = tmp_path_factory.mktemp("bitext_sf")
    rng = np.random.RandomState(11)
    centers = rng.randn(6, 64) * 5.0
    vec_rows, doc_rows = [], []
    vid = 0
    langs = ["en", "fr"]
    for c in range(6):
        # the planted translation pair: en + fr, nearly identical
        pair_point = centers[c] + rng.randn(64) * 0.02
        for j in range(2):
            vec_rows.append((vid, [float(x) for x in
                                   pair_point + rng.randn(64) * 0.02],
                             f"lab{c}"))
            doc_rows.append((vid, f"doc {vid}", langs[j], "src0", 8))
            vid += 1
        # same-topic-but-not-parallel neighbors: give each vector a
        # real NEIGHBORHOOD so the margin denominator is below the
        # pair cosine (an isolated twin is its own whole top-K and
        # margins out at exactly 1.0 — the hubness-normalizing point
        # of the criterion)
        for j in range(4):
            vec_rows.append((vid, [float(x) for x in
                                   centers[c] + rng.randn(64) * 3.5],
                             f"lab{c}"))
            doc_rows.append((vid, f"doc {vid}", langs[j % 2], "src0", 8))
            vid += 1
    for _ in range(24):  # monolingual noise, far from the clusters
        vec_rows.append((vid, [float(x) for x in rng.randn(64)],
                         "noise"))
        doc_rows.append((vid, f"doc {vid}", "en", "src1", 8))
        vid += 1
    spark.createDataFrame(
        vec_rows, "vec_id long, embedding array<float>, label string"
    ).write.mode("overwrite").parquet(str(root / "embeddings.parquet"))
    spark.createDataFrame(
        doc_rows, "doc_id long, text string, lang string, source string,"
                  " n_chars long"
    ).write.mode("overwrite").parquet(str(root / "documents.parquet"))
    return str(root)


def test_bitext_mining_finds_planted_translations(spark, bitext_dir):
    from tpg_weather_etl_spark.queries_embeddings import (
        q_bitext_mining_pairs,
    )

    rows = q_bitext_mining_pairs(spark, bitext_dir).collect()
    got = {(r.src_id, r.tgt_id) for r in rows}
    # every planted (en, fr) cluster pair is mined...
    planted = {(6 * c, 6 * c + 1) for c in range(6)}
    found = planted & got
    assert len(found) >= 5, (planted, got)
    # ...and every mined pair is genuinely cross-lingual with the
    # margin above threshold
    for r in rows:
        assert r.src_lang != r.tgt_lang
        assert r.margin >= 1.05
        assert 0 < r.cos <= 1.0


def test_minhash_estimate_exact_on_identical_docs(spark,
                                                  tmp_path_factory):
    """Identical documents share every shingle, so BOTH the exact
    Jaccard and all 32 signature minima agree: the estimator-parity
    gate must report est_jaccard == jaccard == 1.0 for them."""
    from tpg_weather_etl_spark.queries_text import (
        q_minhash_est_accuracy,
    )

    root = tmp_path_factory.mktemp("est_sf")
    base = ("alpha beta gamma delta epsilon zeta eta theta iota "
            "kappa lambda mu nu xi omicron pi rho sigma tau upsilon")
    rows = [(0, base, "en", "s", len(base)),
            (1, base, "en", "s", len(base))]
    # unrelated filler so the LSH band join has non-trivial input
    for i in range(2, 30):
        rows.append((i, " ".join(f"tok{i}_{j}" for j in range(25)),
                     "en", "s", 100))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars long"
    ).write.mode("overwrite").parquet(str(root / "documents.parquet"))

    got = {(r.doc_a, r.doc_b): r
           for r in q_minhash_est_accuracy(spark, str(root)).collect()}
    assert (0, 1) in got
    r = got[(0, 1)]
    assert r.jaccard == 1.0 and r.n_match == 32
    assert r.est_jaccard == 1.0 and r.abs_err == 0.0


def test_bucket_cap_inert_when_clusters_are_small(spark, bitext_dir):
    """On a well-shaped corpus (every bucket under the cap) the
    capped near-dup query must return EXACTLY the uncapped result —
    the guard costs recall only where it binds."""
    from tpg_weather_etl_spark.queries_embeddings import (
        q_embedding_neardup_capped,
        q_embedding_neardup_multi,
    )

    capped = {(r.vec_a, r.vec_b, r.cos) for r in
              q_embedding_neardup_capped(spark, bitext_dir).collect()}
    full = {(r.vec_a, r.vec_b, r.cos) for r in
            q_embedding_neardup_multi(spark, bitext_dir).collect()}
    assert capped == full and len(full) > 0


def test_bucket_cap_bounds_dense_region(spark, tmp_path_factory):
    """A planted dense region (200 near-identical vectors, bucket size
    >> EMB_BUCKET_CAP) must be DROPPED from candidate generation by
    the capped variant — the quadratic the cap exists to prevent —
    while pairs among the well-clustered rest survive."""
    import numpy as np

    from tpg_weather_etl_spark.queries_embeddings import (
        EMB_BUCKET_CAP,
        q_embedding_neardup_capped,
        q_embedding_neardup_multi,
    )

    root = tmp_path_factory.mktemp("dense_sf")
    rng = np.random.RandomState(3)
    rows = []
    dense = rng.randn(64) * 4.0
    for v in range(200):  # the hostile dense bucket
        rows.append((v, [float(x) for x in dense + rng.randn(64) * 0.01],
                     "dense"))
    pair_center = rng.randn(64) * 4.0
    for v in range(200, 204):  # a small healthy cluster
        rows.append((v, [float(x) for x in
                         pair_center + rng.randn(64) * 0.02], "ok"))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string"
    ).write.mode("overwrite").parquet(str(root / "embeddings.parquet"))

    assert 200 > EMB_BUCKET_CAP  # the planted bucket must overflow
    capped = q_embedding_neardup_capped(spark, str(root)).collect()
    full = q_embedding_neardup_multi(spark, str(root)).collect()
    dense_capped = [r for r in capped if r.vec_a < 200]
    dense_full = [r for r in full if r.vec_a < 200]
    # uncapped pays the quadratic (~C(200,2) verified pairs);
    # capped drops the over-full bucket entirely
    assert len(dense_full) > 10_000
    assert dense_capped == []
    # the healthy cluster's pairs survive in both
    ok_capped = {(r.vec_a, r.vec_b) for r in capped if r.vec_a >= 200}
    ok_full = {(r.vec_a, r.vec_b) for r in full if r.vec_a >= 200}
    assert ok_capped == ok_full and len(ok_capped) == 6


def test_jl_topk_recovers_clusters(spark, clustered_vec_dir):
    """On clustered vectors (the regime JL targets) the compressed
    scan + exact rerank must agree with the exact brute force: the
    16-d projection preserves cluster geometry, so every top-5
    neighbour is same-cluster and matches q_embedding_topk exactly."""
    from tpg_weather_etl_spark.queries_embeddings import (
        q_embedding_topk,
        q_jl_topk,
    )

    jl = {(r.qid, r.vec_id, r.rank) for r in
          q_jl_topk(spark, clustered_vec_dir).collect()}
    exact = {(r.qid, r.vec_id, r.rank) for r in
             q_embedding_topk(spark, clustered_vec_dir).collect()}
    assert jl == exact and len(jl) == 50
    for qid, vec_id, _ in jl:
        assert vec_id % 4 == qid % 4  # same cluster


@pytest.fixture(scope="module")
def boiler_sf_dir(spark, tmp_path_factory):
    """Boilerplate-heavy corpus for the composed-pipeline near-dup
    profile switch: 300 'tmpl' docs share a 61-word body and differ
    by ONE trailing token (unique fingerprint, pairwise Jaccard
    ~0.97, and all land in band buckets of ~280 >> MH_BUCKET_CAP),
    plus 20 fully distinct 'web' docs. doc_ids skip multiples of 100
    so the pseudo-benchmark contamination set is empty."""
    root = tmp_path_factory.mktemp("boiler_sf")
    stop = ["the", "a", "of", "and", "to", "in", "is", "for",
            "the", "and", "of"]
    body = []
    for i in range(50):
        body.append(f"word{i:02d}")
        if i % 5 == 0 and stop:
            body.append(stop.pop())
    body = " ".join(body)
    ids = (i for i in range(1, 10_000) if i % 100 != 0)
    rows = [(next(ids), f"{body} zq{k}end", "en", "tmpl", 400)
            for k in range(300)]
    for k in range(20):
        toks = []
        for i in range(40):
            toks.append(f"item{k:02d}n{i:02d}")
            if i % 5 == 0:
                toks.append(["the", "of", "and", "is", "to", "in",
                             "for", "a"][i // 5 % 8])
        rows.append((next(ids), " ".join(toks), "en", "web", 300))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long"
    ).write.mode("overwrite").parquet(str(root / "documents.parquet"))
    return str(root)


def test_curation_e2e_near_dup_profile_switch(spark, boiler_sf_dir):
    """VERDICT r9 item 3: the composed pipeline must bound candidate
    volume on a boilerplate corpus when told to (capped), keep the
    oracle-pinned exact behavior by default (uncapped), and pick
    capped by itself in 'auto' when boilerplate_prefixes flags a
    templated source."""
    from tpg_weather_etl_spark.queries_ml import (
        BOILER_HOT_SHARE,
        q_curation_e2e,
    )
    from tpg_weather_etl_spark.queries_text import (
        MH_BUCKET_CAP,
        q_boilerplate_prefixes,
    )

    # precondition: the planted bucket must overflow the cap and the
    # profile must trip the auto threshold
    assert 300 > MH_BUCKET_CAP
    shares = {r.source: r.share for r in
              q_boilerplate_prefixes(spark, boiler_sf_dir).collect()}
    assert shares["tmpl"] >= BOILER_HOT_SHARE > shares["web"]

    un = q_curation_e2e(spark, boiler_sf_dir).collect()[0]
    cp = q_curation_e2e(spark, boiler_sf_dir,
                        near_dup="capped").collect()[0]
    au = q_curation_e2e(spark, boiler_sf_dir,
                        near_dup="auto").collect()[0]

    # every doc is unique text -> exact dedup keeps all 320, in all
    # three variants (stages before near-dup are unaffected)
    assert un.n_exact_kept == cp.n_exact_kept == 320
    # uncapped: the 300-doc template cluster collapses to one keeper
    assert un.n_neardup_kept <= 25
    # capped: every template band bucket is over the cap and dropped,
    # the escaped singleton buckets pair with nobody -> candidate
    # volume is BOUNDED inside the composed pipeline and no template
    # doc is lost to the near-dup stage
    assert cp.n_neardup_kept == cp.n_exact_kept
    # auto consults the boilerplate profile and lands on capped
    assert (au.n_neardup_kept, au.n_clean) == (cp.n_neardup_kept,
                                               cp.n_clean)
    with pytest.raises(ValueError):
        q_curation_e2e(spark, boiler_sf_dir, near_dup="bogus")
