"""Round-3b additions: incremental CC warm start, DOULION, new generic
patterns, edit-distance dedup verify, politeness crawl scheduler."""

import duckdb
from pyspark.sql import functions as F

from linkgraph import datagen, suite

SF = "/root/testdata/sf0.001"
V = 30
EDGES = datagen.expected_edges(V)


def _labels(df):
    return {r["id"]: r["component"] for r in df.collect()}


def test_incremental_cc_equals_cold(spark, edges30):
    """Warm-starting min-label propagation from the base graph's converged
    labels reaches the same fixpoint as a cold run on the full graph."""
    from linkgraph.algos import connected_components

    base = edges30.filter((F.col("src") * 5 + F.col("dst")) % 10 != 7)
    base_labels, _ = connected_components(base, partitions=4)
    cold, _ = connected_components(edges30, partitions=4)
    warm, warm_metrics = connected_components(
        edges30, partitions=4, initial_labels=base_labels
    )
    assert _labels(warm) == _labels(cold)
    # the warm run must do real supersteps but converge (last round: 0 changes)
    assert warm_metrics[-1]["labels_changed"] == 0


def test_incremental_cc_new_vertices_cold_start(spark):
    """Vertices absent from the warm labels fall back to their own id."""
    from linkgraph.algos import connected_components

    e = spark.createDataFrame([(1, 2), (3, 4)], "src long, dst long")
    init = spark.createDataFrame([(1, 1), (2, 1)], "id long, component long")
    labels, _ = connected_components(e, initial_labels=init, partitions=2)
    got = _labels(labels)
    assert got == {1: 1, 2: 1, 3: 3, 4: 3}


def test_doulion_matches_python(spark, edges30):
    """DOULION = 8 x exact triangles of the hash-sparsified graph; the
    same arithmetic in pure Python gives bit-identical results."""
    import hashlib

    from linkgraph.algos import triangle_count
    from linkgraph.dedup import h60

    key = F.concat(F.col("a").cast("string"), F.lit(","),
                   F.col("b").cast("string"))
    o = (
        edges30.select(F.least("src", "dst").alias("a"),
                       F.greatest("src", "dst").alias("b"))
        .distinct()
        .filter(h60(key) % 2 == 0)
    )
    est = 8 * triangle_count(
        o.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )

    def keep(a, b):
        return int(hashlib.md5(f"{a},{b}".encode()).hexdigest()[:15],
                   16) % 2 == 0

    und = {(min(s, d), max(s, d)) for s, d in EDGES if s != d}
    kept = {(a, b) for a, b in und if keep(a, b)}
    adj = {}
    for a, b in kept:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = sum(
        1
        for a, b in kept
        for c in adj[a] & adj[b]
        if a < b < c
    )
    assert est == 8 * tri


def test_doulion_concentration_sf001():
    """With a mixing hash the p=1/2 sparsified estimate concentrates:
    rel-err < 15% at sf0.01 (34k triangles).  Runs the gate's own oracle
    SQL in DuckDB — a linear-parity hash fails this at ~2x (structural
    bias: only parity-monochromatic triangles survive)."""
    _, sql = suite.REGISTRY["doulion_triangle_estimate"]
    con = duckdb.connect()
    for t in ("customer", "lineitem", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'/root/testdata/sf0.01/{t}.parquet'"
        )
    est, exact = con.execute(sql).fetchone()
    assert exact > 10000
    assert abs(est - exact) <= 0.15 * exact, (est, exact)


def test_new_patterns_in_dense_gate():
    """diamond / bowtie / five_cycle run through the generic compiler on
    the dense fixture; the und_b gate keeps its original two patterns
    (their mechanical SQL twins are minutes-slow in DuckDB on und_b)."""
    assert suite.GENERIC_PATTERNS == ("four_cycle", "tailed_triangle")
    assert suite.DENSE_PATTERNS == ("diamond", "bowtie", "five_cycle")
    assert "dense_pattern_counts" in suite.REGISTRY


def test_levenshtein_matches_duckdb(spark):
    """Spark's F.levenshtein and DuckDB's levenshtein() agree — the
    edit_distance_verify gate depends on identical semantics."""
    pairs = [
        ("kitten", "sitting"),
        ("", "abc"),
        ("same", "same"),
        ("a b  c", "a b c"),
        ("flaw", "lawn"),
    ]
    df = spark.createDataFrame(pairs, "a string, b string")
    got = {
        (r["a"], r["b"]): r["d"]
        for r in df.select("a", "b",
                           F.levenshtein("a", "b").alias("d")).collect()
    }
    con = duckdb.connect()
    for a, b in pairs:
        want = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert got[(a, b)] == want, (a, b)


def test_edit_distance_verify_gate(spark):
    """Gate output: every LSH-verified near-dup pair gets a finite edit
    distance; identical texts score 0."""
    rows = suite.q_edit_distance_verify(spark, SF).collect()
    assert all(r["edit_distance"] >= 0 for r in rows)
    assert all(r["id_a"] < r["id_b"] for r in rows)


def test_crawl_schedule_invariants(spark):
    rows = suite.q_crawl_schedule(spark, SF).collect()
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r)
    for host, rs in by_host.items():
        rs.sort(key=lambda r: r["fetch_order"])
        # dense ranks from 1, offsets in 500 ms politeness steps
        assert [r["fetch_order"] for r in rs] == list(range(1, len(rs) + 1))
        assert all(r["fetch_offset_ms"] == (r["fetch_order"] - 1) * 500
                   for r in rs)
        # priority-descending within host (ties broken by doc_id asc)
        pr = [((r["doc_id"] * 37) % 100, r["doc_id"]) for r in rs]
        assert all(
            (pr[i][0] > pr[i + 1][0])
            or (pr[i][0] == pr[i + 1][0] and pr[i][1] < pr[i + 1][1])
            for i in range(len(pr) - 1)
        )
