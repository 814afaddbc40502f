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
