"""Connected-components + cluster summary operator tests
(operators/graph.py) — including the bounded-members guarantee for
boilerplate mega-clusters."""

from __future__ import annotations

from pyspark.sql import functions as F

from tpg_weather_etl_spark.operators.graph import (
    MEMBER_SAMPLE_N,
    cluster_summary,
    connected_components_min_label,
)


def test_cc_two_components(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (12, 10)],
        "doc_a long, doc_b long",
    )
    labels = connected_components_min_label(edges)
    got = {(r.doc, r.cluster) for r in labels.collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (12, 10)}


def test_cluster_summary_bounds_members_on_mega_cluster(spark):
    """A 10^5-member star cluster must yield ONE summary row whose
    members field holds only MEMBER_SAMPLE_N ids — not a straggler row
    carrying the full membership (r2/r3 verdict task)."""
    n = 100_000
    edges = spark.range(1, n).select(
        F.lit(0).alias("doc_a"), F.col("id").alias("doc_b"))
    labels = connected_components_min_label(edges)
    rows = cluster_summary(labels).collect()
    assert len(rows) == 1
    row = rows[0]
    assert row.cluster_id == 0
    assert row.cluster_size == n
    # members is the stringified bounded list: 0..MEMBER_SAMPLE_N-1
    ids = [int(x) for x in
           row.members.strip("[]").replace(",", " ").split()]
    assert ids == list(range(MEMBER_SAMPLE_N))
    # and the row itself stays driver-sized
    assert len(row.members) < 10_000


def test_cc_raises_on_under_convergence(spark):
    """A 50-node chain cannot converge in 5 neighbor-min rounds — the
    operator must raise, not return silently-wrong labels."""
    import pytest as _pytest

    edges = spark.range(49).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b"))
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components_min_label(edges, max_iter=5)


def test_cc_oracle_guard_raises_on_long_chain():
    """The DuckDB oracle's convergence probe must error() on a graph
    whose diameter exceeds the fixed _CC_ROUNDS unroll."""
    import duckdb
    import pytest as _pytest

    from tpg_weather_etl_spark.queries_ml import _cc_sql

    def chain_edges(n):
        vals = ",".join(f"({i},{i + 1})" for i in range(n))
        return f"SELECT * FROM (VALUES {vals}) t(doc_a, doc_b)"

    con = duckdb.connect()
    # diameter 20 << 2^6: converges, every label is the component min
    rows = con.execute(_cc_sql(chain_edges(20))).fetchall()
    assert len(rows) == 1 and rows[0][0] == 0 and rows[0][1] == 21
    # diameter 400 >> 2^6: the probe must fail loudly
    with _pytest.raises(duckdb.Error, match="under-converged"):
        con.execute(_cc_sql(chain_edges(400))).fetchall()


def test_cluster_summary_small_cluster_members_complete(spark):
    """Below the bound, members lists every id (sorted)."""
    edges = spark.createDataFrame(
        [(5, 9), (9, 7)], "doc_a long, doc_b long")
    labels = connected_components_min_label(edges)
    row = cluster_summary(labels).collect()[0]
    assert row.cluster_size == 3
    ids = [int(x) for x in
           row.members.strip("[]").replace(",", " ").split()]
    assert ids == [5, 7, 9]


def test_cc_high_diameter_chain_converges_logarithmically(spark):
    """Pointer jumping: a 10^5-node chain (diameter ~10^5) converges
    within the default 20-round budget — O(log d), not O(d). Plain
    neighbor-min propagation would need 10^5 rounds."""
    from tpg_weather_etl_spark.operators import graph

    n = 100_000
    edges = spark.range(n - 1).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b"))
    labels = connected_components_min_label(edges)
    assert graph.LAST_ROUNDS <= 20
    got = labels.agg(
        F.countDistinct("cluster").alias("k"),
        F.count(F.lit(1)).alias("n"),
        F.max("cluster").alias("mx")).collect()[0]
    assert (got.k, got.n, got.mx) == (1, n, 0)


def test_cc_star_clique_mix_converges_fast(spark):
    """Dup-graph shapes (stars and cliques) converge in <=3 rounds
    including the final zero-change round."""
    from tpg_weather_etl_spark.operators import graph

    star = [(0, i) for i in range(1, 50)]
    clique = [(a, b) for a in range(100, 110) for b in range(a + 1, 110)]
    edges = spark.createDataFrame(star + clique, "doc_a long, doc_b long")
    labels = connected_components_min_label(edges)
    assert graph.LAST_ROUNDS <= 3
    got = {(r.doc, r.cluster) for r in labels.collect()}
    assert {c for _, c in got} == {0, 100}


def test_cc_partitioned_matches_global_on_cell_bounded_graph(spark):
    """Union-find-per-partition must produce the exact labels the
    global O(log d) loop produces, on a graph whose edges never cross
    the partition key (the SemDeDup invariant). Mixes chains, a
    clique, and singleton-free cells across 4 partitions."""
    import random

    from tpg_weather_etl_spark.operators.graph import (
        connected_components_partitioned,
    )

    rng = random.Random(7)
    rows = []
    for cell in range(4):
        base = cell * 1000
        # a 30-node chain
        rows += [(cell, base + i, base + i + 1) for i in range(30)]
        # a 10-node clique
        cl = [base + 100 + i for i in range(10)]
        rows += [(cell, a, b) for a in cl for b in cl if a < b]
        # random extra pairs inside the cell
        for _ in range(20):
            a, b = rng.randrange(200), rng.randrange(200)
            if a != b:
                rows.append((cell, base + min(a, b), base + max(a, b)))
    edges = spark.createDataFrame(
        rows, "cell int, doc_a long, doc_b long")
    got = {
        (r.doc, r.cluster)
        for r in connected_components_partitioned(
            edges, part_col="cell").collect()
    }
    want = {
        (r.doc, r.cluster)
        for r in connected_components_min_label(
            edges, max_iter=40).collect()
    }
    assert got == want


def test_pagerank_matches_python_power_iteration(spark, tmp_path):
    # build a tiny synthetic lineitem with a known co-purchase graph,
    # run the gate query, and check against a plain Python PageRank
    # with the same fixed iteration count / damping
    import itertools

    from tpg_weather_etl_spark.queries_ml import (
        PAGERANK_DAMPING,
        PAGERANK_ITERS,
        q_pagerank_parts,
    )

    baskets = [
        [1, 2, 3],       # triangle 1-2-3
        [3, 4],          # bridge
        [4, 5], [5, 6],  # chain
        [1, 6],          # cycle closure
    ]
    rows = []
    for okey, parts in enumerate(baskets):
        for i, p in enumerate(parts):
            rows.append((okey, p, i, 1.0, 1.0, 0.0, 0.0,
                         "N", "O", None))
    df = spark.createDataFrame(rows, (
        "l_orderkey long, l_partkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp"))
    sf = tmp_path / "sf"
    sf.mkdir()
    df.coalesce(1).write.parquet(str(sf / "lineitem.parquet"))

    got = {r.partkey: r.r
           for r in q_pagerank_parts(spark, str(sf)).collect()}

    und = set()
    for parts in baskets:
        for a, b in itertools.combinations(sorted(parts), 2):
            und.add((a, b))
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    n = len(adj)
    r = {v: 1.0 / n for v in adj}
    for _ in range(PAGERANK_ITERS):
        nxt = {}
        for v in adj:
            s = sum(r[u] / len(adj[u]) for u in adj[v])
            nxt[v] = (1.0 - PAGERANK_DAMPING) / n + PAGERANK_DAMPING * s
        r = nxt
    for k, v in got.items():
        assert abs(v - r[k]) < 1e-12, (k, v, r[k])
    assert set(got) == set(adj)  # topk=25 covers all 6 nodes


def _write_pair_lineitem(spark, tmp_path, und_edges):
    """One 2-item order per undirected edge — direct control of the
    co-purchase graph a test wants to build."""
    rows = []
    for okey, (a, b) in enumerate(sorted(und_edges)):
        rows.append((okey, a, 0, 1.0, 1.0, 0.0, 0.0, "N", "O", None))
        rows.append((okey, b, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", None))
    df = spark.createDataFrame(rows, (
        "l_orderkey long, l_partkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp"))
    sf = tmp_path / "sf"
    sf.mkdir(exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(
        str(sf / "lineitem.parquet"))
    return str(sf)


def test_wedge_apex_split_exact_when_salting_engages(
        spark, tmp_path, monkeypatch):
    """The heavy-hitter apex split (WEDGE_APEX_BUDGET salting in
    `_oriented_triangles`) must be EXACT where it engages: with the
    budget forced to 4, a 10-clique gives node 0 an oriented
    out-degree of 9 (equal degrees, ties by id -> node 0 points at
    all nine higher ids), so its wedge enumeration spans
    ceil(9/4) = 3 salt keys. Triangle count and every per-node lcc
    must still match brute force — each (lo, hi) pair met exactly
    once, at lo's salt."""
    import itertools

    import tpg_weather_etl_spark.queries_ml as QM

    monkeypatch.setattr(QM, "WEDGE_APEX_BUDGET", 4)

    clique = list(range(10))
    und = {(a, b) for a, b in itertools.combinations(clique, 2)}
    # pendant chain + an off-clique triangle so the graph is not
    # degree-uniform and the salted/unsalted apexes mix
    und |= {(9, 20), (20, 21), (21, 22), (20, 22), (0, 30)}
    sf = _write_pair_lineitem(spark, tmp_path, und)

    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri_brute = {
        frozenset(t) for t in itertools.combinations(sorted(adj), 3)
        if (min(t[0], t[1]), max(t[0], t[1])) in und
        and (min(t[1], t[2]), max(t[1], t[2])) in und
        and (min(t[0], t[2]), max(t[0], t[2])) in und
    }

    row = QM.q_part_triangles(spark, sf).collect()[0]
    assert row.n_edges == len(und)
    assert row.n_triangles == len(tri_brute)  # C(10,3) + 1 = 121

    per_node = {v: 0 for v in adj}
    for t in tri_brute:
        for v in t:
            per_node[v] += 1
    got = {r.part: (r.degree, r.n_tri, r.lcc)
           for r in QM.q_clustering_coeff(spark, sf).collect()}
    assert set(got) == set(adj)  # topk=50 covers all 14 nodes
    for v, (d, n_tri, lcc) in got.items():
        assert d == len(adj[v])
        assert n_tri == per_node[v], (v, n_tri, per_node[v])
        want = (round(2.0 * per_node[v] / (d * (d - 1)), 6)
                if d >= 2 else 0.0)
        assert lcc == want


def test_edge_jaccard_matches_brute_force_under_forced_split(
        spark, tmp_path, monkeypatch):
    """`q_edge_jaccard` on the same mixed clique/chain graph, with the
    apex budget forced low so the salted enumeration engages: every
    edge's common-neighbor count and endpoint-excluded Jaccard must
    match brute force (clique-internal edges: cn=8, J=8/(9+9-2-8)=1.0
    before the pendant edges perturb node 0 and 9)."""
    import itertools

    import tpg_weather_etl_spark.queries_ml as QM

    monkeypatch.setattr(QM, "WEDGE_APEX_BUDGET", 4)
    monkeypatch.setattr(QM, "EDGE_JACCARD_TOPK", 1000)

    clique = list(range(10))
    und = {(a, b) for a, b in itertools.combinations(clique, 2)}
    und |= {(9, 20), (20, 21), (21, 22), (20, 22), (0, 30)}
    sf = _write_pair_lineitem(spark, tmp_path, und)

    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    got = {(r.u, r.v): (r.du, r.dv, r.n_common, r.jaccard)
           for r in QM.q_edge_jaccard(spark, sf).collect()}
    assert set(got) == und  # every edge present, topk lifted
    for (u, v), (du, dv, cn, jac) in got.items():
        assert du == len(adj[u]) and dv == len(adj[v])
        want_cn = len(adj[u] & adj[v])
        assert cn == want_cn, ((u, v), cn, want_cn)
        denom = du + dv - 2 - want_cn
        want_j = round(want_cn / denom, 6) if denom > 0 else 0.0
        assert jac == want_j, ((u, v), jac, want_j)
