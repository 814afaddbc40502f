"""Containment near-dup detection: the asymmetric dedup operator
(|A∩B|/|A|) must catch a small document swallowed whole by a large
one even when symmetric Jaccard stays far below its threshold."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def contain_sf_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("contain_sf")
    small = "the quick brown fox jumps over the lazy dog near the river"
    filler = " ".join(f"word{i} token{i} item{i}" for i in range(40))
    big = filler + " " + small + " " + " ".join(
        f"extra{i} more{i}" for i in range(40))
    other = "completely different text with no overlap whatsoever here " \
            "and even more unrelated words to pad the document body"
    rows = [(1, small, "en", "web", len(small)),
            (2, big, "en", "web", len(big)),
            (3, other, "en", "web", len(other))]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    df.write.mode("overwrite").parquet(str(root / "documents.parquet"))
    return str(root)


def test_containment_catches_low_jaccard_subset(spark, contain_sf_dir):
    from tpg_weather_etl_spark.queries_text import (
        q_containment_pairs,
        q_ngram_jaccard_pairs,
    )

    # must not share the bench shingle cache across sf_dirs — the
    # shared persist keys on the plan, and the plan embeds the path,
    # so this is safe; just make both reads fresh for clarity
    pairs = q_containment_pairs(spark, contain_sf_dir).collect()
    got = {(r.doc_a, r.doc_b): r for r in pairs}
    assert (1, 2) in got
    r = got[(1, 2)]
    assert r.containment == 1.0          # every small-doc shingle in big
    assert r.contained_doc == 1
    assert not any(3 in k for k in got)  # unrelated doc never pairs

    # and symmetric Jaccard misses the same pair at its 0.5 threshold
    jac = {(r.doc_a, r.doc_b)
           for r in q_ngram_jaccard_pairs(spark, contain_sf_dir).collect()}
    assert (1, 2) not in jac


def test_hot_shingle_cap_recall_cost(spark, tmp_path_factory):
    """Measure (not just assert) what the NGRAM_DF_CAP guard costs.

    Corpus: every document opens with the same long boilerplate
    header, so the header's shingles exceed the df cap. 12 true
    near-dup pairs carry their similarity in pair-unique bodies; 3
    pairs are boilerplate-carried (header + 5-word tails, 4 of the 5
    shared within the pair) — above the containment threshold only
    because of hot shingles. The capped index must keep every
    body-carried pair (the cap drops corpus-wide shingles only) and
    is expected to miss exactly the boilerplate-carried ones — the
    measured recall floor documents that trade-off, mirroring the
    kmeans recall@3 test.
    """
    from pyspark.sql import functions as F

    from tpg_weather_etl_spark.queries_text import (
        NGRAM_DF_CAP,
        _shingle_df,
        containment_pairs_from_shingles,
        filter_hot_shingles,
    )

    bp = " ".join(f"boiler{i} plate{i}" for i in range(20))  # 40 words
    rows = []
    # 12 near-dup pairs: identical 30-word unique body after the header
    for p in range(12):
        body = " ".join(f"pair{p}w{j}" for j in range(30))
        rows.append((2 * p, f"{bp} {body}"))
        rows.append((2 * p + 1, f"{bp} {body}"))
    # 3 boilerplate-carried pairs: 5-word tails sharing 4 words
    # within the pair. Uncapped containment ≈ 42/43 (hot header does
    # the work); capped ≈ 4/5 < 0.9 (only tail shingles remain). The
    # 5th tail word keeps CROSS-pair containment at 38/43 < 0.9 so
    # these pairs stay well-defined in the uncapped truth set.
    for j in range(3):
        tail = " ".join(f"tail{j}w{k}" for k in range(4))
        rows.append((900 + 2 * j, f"{bp} {tail} only{j}a"))
        rows.append((901 + 2 * j, f"{bp} {tail} only{j}b"))
    # 28 noise docs: globally-unique bodies, no true pair
    for i in range(28):
        body = " ".join(f"noise{i}w{j}" for j in range(30))
        rows.append((500 + i, f"{bp} {body}"))
    assert len(rows) > NGRAM_DF_CAP  # header df must exceed the cap

    root = tmp_path_factory.mktemp("cap_recall_sf")
    spark.createDataFrame(
        [(i, txt, "en", "web", len(txt)) for i, txt in rows],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    ).write.mode("overwrite").parquet(str(root / "documents.parquet"))

    sh = _shingle_df(spark, str(root)).cache()
    truth = {(r.doc_a, r.doc_b) for r in containment_pairs_from_shingles(
        sh).collect()}
    capped = {(r.doc_a, r.doc_b) for r in containment_pairs_from_shingles(
        filter_hot_shingles(sh)).collect()}
    sh.unpersist()

    body_pairs = {(2 * p, 2 * p + 1) for p in range(12)}
    bp_pairs = {(900 + 2 * j, 901 + 2 * j) for j in range(3)}
    assert truth >= body_pairs | bp_pairs
    # the cap never costs a body-carried pair...
    assert capped >= body_pairs
    # ...and the missed pairs are exactly the boilerplate-only ones
    assert capped & bp_pairs == set()
    recall = len(capped & truth) / len(truth)
    # measured: 12 body pairs kept / (12 + 3 boilerplate-only) = 0.8
    assert recall >= 0.75, f"capped containment recall {recall:.2f}"
