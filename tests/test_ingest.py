"""Ingest-stage invariants (mirrors the reference's preprocessing checks,
/root/reference/datasets/wiki-vote/scripts/process.cpp: dedup, self-loop
drop, dense ids) plus the north-rule byte-identical text invariant."""

import pandas as pd
from pyspark.sql import functions as F

from linkgraph import datagen, ingest


def test_extract_text_byte_identical(spark, pages30):
    got = pages30.select("url", ingest.extract_text(F.col("html")).alias("extracted"),
                         "text").toPandas()
    for _, r in got.iterrows():
        assert r["extracted"] == r["text"], r["url"]
    # byte-level: utf-8 encodings equal too
    assert all(
        r["extracted"].encode("utf-8") == r["text"].encode("utf-8")
        for _, r in got.iterrows()
    )


def test_outlinks_match_generator(spark, pages30):
    adj = datagen.outlinks_of(30)
    got = (
        pages30.select("url", ingest.extract_outlinks(F.col("html")).alias("links"))
        .toPandas()
        .set_index("url")["links"]
    )
    for i in range(30):
        expected = [datagen.url_of(t) for t in adj[i]]
        assert sorted(got[datagen.url_of(i)]) == sorted(expected)


def test_edge_table_matches_ground_truth(spark, pages30):
    vmap, edges = ingest.ingest_pages(pages30, partitions=8)
    vm = vmap.toPandas().set_index("url")["id"].to_dict()
    # dense ids 0..V-1
    assert sorted(vm.values()) == list(range(30))
    got = {(r["src"], r["dst"]) for r in edges.collect()}
    expected = {
        (vm[datagen.url_of(s)], vm[datagen.url_of(d)])
        for s, d in datagen.expected_edges(30)
    }
    assert got == expected


def test_no_self_loops_or_dups(spark, pages30):
    _, edges = ingest.ingest_pages(pages30, partitions=8)
    pdf = edges.toPandas()
    assert (pdf["src"] != pdf["dst"]).all()
    assert not pdf.duplicated(["src", "dst"]).any()


def test_normalize_url():
    assert ingest.normalize_url("HTTPS://Example.COM/Page#frag") == "https://example.com/Page"
    assert ingest.normalize_url("  https://a.example/x  ") == "https://a.example/x"


def test_dense_ids_are_dense_and_sorted(spark):
    df = spark.createDataFrame([(w,) for w in ["d", "b", "a", "c", "b"]], ["k"])
    out = ingest.dense_ids(df, "k", partitions=3).toPandas().sort_values("id")
    assert list(out["k"]) == ["a", "b", "c", "d"]
    assert list(out["id"]) == [0, 1, 2, 3]


def test_vertex_induced_sample(graph30):
    sub = graph30.vertex_induced_sample(10, seed=7)
    ids = {r["id"] for r in sub.vertices().collect()}
    assert len(ids) == 10
    got = {(r["src"], r["dst"]) for r in sub.edges.collect()}
    full = {(r["src"], r["dst"]) for r in graph30.edges.collect()}
    # exactly the induced edge set, deterministically
    assert got == {(s, d) for s, d in full if s in ids and d in ids}
    again = graph30.vertex_induced_sample(10, seed=7)
    assert {r["id"] for r in again.vertices().collect()} == ids


def test_union_with_zipgraph(spark, graph30):
    from linkgraph.graph import LinkGraph

    a = graph30.vertex_induced_sample(12, seed=1)
    b = graph30.vertex_induced_sample(12, seed=2)
    u = a.union_with(b)
    ea = {(r["src"], r["dst"]) for r in a.edges.collect()}
    eb = {(r["src"], r["dst"]) for r in b.edges.collect()}
    assert {(r["src"], r["dst"]) for r in u.edges.collect()} == ea | eb


def test_host_graph_and_locality(spark):
    from pyspark.sql import functions as F

    from linkgraph.ingest import host_graph, host_locality

    rows = [
        ("https://a.com/x", "https://b.com/y"),
        ("https://a.com/z", "https://b.com/y"),
        ("https://a.com/x", "https://a.com/z"),
        ("http://b.com:8080/p", "https://a.com/x"),   # port stays in host
        ("ftp://c.org/f", "https://a.com/"),
    ]
    e = spark.createDataFrame(rows, "src_url string, dst_url string")
    hg = {(r["src_host"], r["dst_host"]): r["weight"]
          for r in host_graph(e).collect()}
    assert hg == {("a.com", "b.com"): 2, ("a.com", "a.com"): 1,
                  ("b.com:8080", "a.com"): 1, ("c.org", "a.com"): 1}
    loc = {r["host"]: (r["out_weight"], r["intra_weight"], r["locality_e6"])
           for r in host_locality(host_graph(e)).collect()}
    assert loc["a.com"] == (3, 1, 333333)
    assert loc["b.com:8080"] == (1, 0, 0)
    # weight conservation: host-graph total weight == page edge count
    assert sum(w for w in hg.values()) == len(rows)


def test_host_pagerank_composition(spark):
    """host_graph → pagerank_weighted composition: mass conserved and the
    sink-heavy host dominates on a hand-built asymmetric page graph."""
    from pyspark.sql import functions as F

    from linkgraph.algos.pagerank import pagerank_weighted
    from linkgraph.ingest import host_graph

    rows = [(f"https://h{s}.x/p{i}", f"https://h{d}.x/q{i}")
            for i, (s, d) in enumerate(
                [(0, 2), (1, 2), (0, 2), (1, 0), (2, 2), (0, 1)])]
    e = spark.createDataFrame(rows, "src_url string, dst_url string")
    hg = host_graph(e).filter(F.col("src_host") != F.col("dst_host"))
    ranks = pagerank_weighted(
        hg.select(F.col("src_host").alias("src"),
                  F.col("dst_host").alias("dst"),
                  F.col("weight").cast("double").alias("weight")),
        num_iters=10,
    ).collect()
    r = {row["id"]: row["rank"] for row in ranks}
    assert abs(sum(r.values()) - 1.0) < 1e-9
    assert r["h2.x"] == max(r.values())  # 3 of 5 cross-host links point at h2


def test_edge_delta_statuses(spark):
    from linkgraph.graph import edge_delta

    old = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (3, 4)], "src long, dst long")  # dup row
    new = spark.createDataFrame(
        [(2, 3), (4, 5)], "src long, dst long")
    got = {(r["src"], r["dst"]): r["status"]
           for r in edge_delta(old, new).collect()}
    assert got == {(1, 2): "removed", (2, 3): "kept",
                   (3, 4): "removed", (4, 5): "added"}


def test_ego_network_radius(spark):
    from linkgraph.graph import ego_network

    # path 0-1-2-3-4 plus a triangle off 1
    rows = [(0, 1), (1, 2), (2, 3), (3, 4), (1, 5), (5, 6), (6, 1)]
    e = spark.createDataFrame(rows, "src long, dst long")
    got = {(r["src"], r["dst"]) for r in ego_network(e, seed=0, radius=2).collect()}
    # ball(0, 2) = {0,1,2,5,6}; induced undirected edges (both orientations)
    want_und = {(0, 1), (1, 2), (1, 5), (5, 6), (6, 1)}
    want = want_und | {(b, a) for a, b in want_und}
    assert got == want


def test_rendezvous_assignment_stability(spark):
    """HRW property: removing a node only remaps the keys that were on
    that node; all other assignments are unchanged."""
    from pyspark.sql import functions as F

    from linkgraph.ingest import rendezvous_assign

    hosts = spark.createDataFrame(
        [(f"host{i}.example",) for i in range(60)], "host string")
    a8 = {r["host"]: r["node"]
          for r in rendezvous_assign(hosts, "host", 8).collect()}
    # drop node 7: recompute with 7 nodes — identical for keys not on 7
    a7 = {r["host"]: r["node"]
          for r in rendezvous_assign(hosts, "host", 7).collect()}
    assert len(set(a8.values())) > 1  # spreads across nodes
    for h, n in a8.items():
        if n != 7:
            assert a7[h] == n
        else:
            assert a7[h] != 7


def test_per_host_cap(spark):
    from linkgraph.ingest import per_host_cap

    urls = spark.createDataFrame(
        [(f"https://h{i % 3}.x/p{i}", f"h{i % 3}.x") for i in range(30)],
        "url string, host string")
    got = per_host_cap(urls, 4).collect()
    by_host = {}
    for r in got:
        by_host.setdefault(r["host"], set()).add(r["url"])
    assert all(len(v) == 4 for v in by_host.values())
    # determinism: same subset on a second run
    again = {(r["url"], r["host"]) for r in per_host_cap(urls, 4).collect()}
    assert again == {(r["url"], r["host"]) for r in got}


def test_normalize_urls_udf_edge_cases(spark):
    from pyspark.sql import functions as F

    from linkgraph.ingest import normalize_url, normalize_urls

    cases = [
        "  HTTPS://WWW.Example.COM/Path/File#frag  ",
        "ftp://Host.Org",
        "no-scheme/relative#x",
        "HTTP://UPPER.com/QueryCase?Q=Mixed#a#b",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "url string")
    got = {r["url"]: r["norm"]
           for r in df.select("url", normalize_urls(F.col("url"))
                              .alias("norm")).collect()}
    for c in cases:
        assert got[c] == normalize_url(c)
    assert got[cases[0]] == "https://www.example.com/Path/File"
    assert got[cases[3]] == "http://upper.com/QueryCase?Q=Mixed"


def test_conditional_sample_vertex(spark):
    from linkgraph.graph import conditional_sample_vertex

    v = spark.range(10).select("id")
    pick, p = conditional_sample_vertex(v, 6)
    assert pick in (7, 8, 9) and abs(p - 1 / 3) < 1e-12
    # deterministic for a seed; different seed may differ but stays valid
    assert conditional_sample_vertex(v, 6) == (pick, p)
    assert conditional_sample_vertex(v, 9) == (None, 0.0)
    # ordering trick: chaining picks yields strictly ascending ids
    a, _ = conditional_sample_vertex(v, -1, seed=7)
    b, _ = conditional_sample_vertex(v, a, seed=7)
    assert b is None or b > a


def test_anchor_pairs_extraction(spark):
    from linkgraph.ingest import anchor_pairs

    html = (
        '<html><A HREF="http://up.example/1">Upper  Case</A>'
        '<a class="x" href="http://b.example/2"><b>bold <i>deep</i></b></a>'
        '<a href="http://c.example/3"></a>'          # empty anchor
        '<a name="noharef">skip me</a>'              # no href -> skipped
        '<p>text</p></html>'
    )
    pages = spark.createDataFrame(
        [("http://src.example", html)], "url string, html string"
    )
    got = {(r["href"], r["anchor"]) for r in anchor_pairs(pages).collect()}
    assert got == {
        ("http://up.example/1", "Upper Case"),       # ws collapsed, (?i)
        ("http://b.example/2", "bold deep"),         # nested markup stripped
        ("http://c.example/3", ""),
    }
    # binary html column decodes transparently
    pages_b = spark.createDataFrame(
        [("u", html.encode())], "url string, html binary"
    )
    assert anchor_pairs(pages_b).count() == 3


def test_resolve_redirects_chains(spark):
    from linkgraph.ingest import resolve_redirects

    # two chains (5->4->3->0 via 3->0, 9->8) and one direct hop
    r = spark.createDataFrame(
        [(5, 4), (4, 3), (3, 0), (9, 8), (7, 2)], "src long, dst long"
    )
    got = {x["src"]: (x["final"], x["hops"])
           for x in resolve_redirects(r).collect()}
    assert got == {5: (0, 3), 4: (0, 2), 3: (0, 1), 9: (8, 1), 7: (2, 1)}


def test_resolve_redirects_partition_invariant_and_depth(spark):
    from linkgraph.ingest import resolve_redirects

    # one long chain: 63 -> 62 -> ... -> 0 (depth 63 => 6 doubling rounds)
    r = spark.createDataFrame(
        [(i, i - 1) for i in range(1, 64)], "src long, dst long"
    )
    a = resolve_redirects(r.repartition(1))
    b = resolve_redirects(r.repartition(7))
    ra = sorted(map(tuple, a.collect()))
    assert ra == sorted(map(tuple, b.collect()))
    assert ra == [(i, 0, i) for i in range(1, 64)]


def test_resolve_redirects_cycle_errors(spark):
    import pytest as _pt

    from linkgraph.ingest import resolve_redirects

    r = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    with _pt.raises(ValueError, match="cycle"):
        resolve_redirects(r, max_rounds=6)


def test_url_features_verdicts(spark):
    from linkgraph.ingest import url_features

    urls = spark.createDataFrame(
        [
            (0, "https://a.example.com/x/y/page.html?p=1"),
            (1, "http://b.example.org/img.png"),            # asset ext
            (2, "ftp://c.example.net/file"),                 # bad scheme
            (3, "https://d.example.io/a/b/c/d/e/f/g"),       # depth 7
            (4, "https://e.example.com/?a=1&b=2&c=3&d=4&e=5"),  # 5 params
            (5, "https://f.example.com"),                    # bare host
        ],
        "id long, url string",
    )
    r = {x["id"]: x for x in url_features(urls).collect()}
    assert [r[i]["keep"] for i in range(6)] == [1, 0, 0, 0, 0, 1]
    assert r[0]["path_depth"] == 3 and r[0]["ext"] == "html"
    assert r[0]["n_params"] == 1 and r[0]["tld"] == "com"
    assert r[5]["path_depth"] == 0 and r[5]["ext"] == "" and r[5]["n_params"] == 0
    assert r[2]["scheme"] == "ftp" and r[3]["path_depth"] == 7
