"""Link-graph operators (ops/linkgraph.py): anchor extraction, host-graph
reduction, integer PageRank exactness + partition invariance."""

from chug_spark.ops.linkgraph import (
    RANK_UNIT,
    extract_links,
    host_graph,
    pagerank_hosts,
)


def test_extract_links_order_and_anchor_cleanup(spark):
    html = (
        '<a href="https://a.com/x">first <b>link</b></a>'
        "<p>noise</p>"
        "<a href='/rel'>rel</a>"
        '<a href="https://b.com/y">second   link</a>'
    )
    rows = extract_links(
        spark.createDataFrame([(1, html)], "doc_id long, html string")
    ).collect()
    assert [(r["link_no"], r["href"], r["anchor"]) for r in rows] == [
        (0, "https://a.com/x", "first link"),
        (1, "/rel", "rel"),
        (2, "https://b.com/y", "second link"),
    ]


def test_host_graph_drops_relative_and_self(spark):
    links = spark.createDataFrame(
        [
            ("a.com", "https://b.com/1"),
            ("a.com", "https://b.com/2"),   # multiplicity -> n_links 2
            ("a.com", "https://A.COM/self"),  # self after lowercasing
            ("a.com", "/relative"),
            ("b.com", "https://a.com:8080/p"),  # port stripped
        ],
        "src_host string, href string",
    )
    edges = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in host_graph(links).collect()
    }
    assert edges == {("a.com", "b.com"): 2, ("b.com", "a.com"): 1}


def test_pagerank_integer_exact_tiny_graph(spark):
    # a -> b (1 link), b -> a (1), a -> c (1); hand-unroll one iteration:
    # outw: a=2, b=1; shares: a gives 500000 per link, b gives 1000000
    # r1(a) = 150000 + 850000*1.0 // 1 ... inflow(a)=1000000 -> 150000+850000
    # r1(b) = 150000 + (500000*85)//100 = 150000+425000
    # r1(c) = same as b
    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "a", 1), ("a", "c", 1)],
        "src_host string, dst_host string, n_links long",
    )
    r1 = {r["host"]: r["rank_micro"] for r in pagerank_hosts(edges, iters=1).collect()}
    assert r1 == {"a": 1000000, "b": 575000, "c": 575000}
    # dangling host c keeps only the base term from iteration 2 onward
    r2 = {r["host"]: r["rank_micro"] for r in pagerank_hosts(edges, iters=2).collect()}
    assert r2["c"] == 150000 + (1000000 // 2) * 85 // 100


def test_pagerank_partition_invariance(spark):
    rows = [
        (f"h{i}", f"h{(i * 7 + 3) % 40}", 1 + i % 3) for i in range(200)
    ]
    edges = spark.createDataFrame(rows, "src_host string, dst_host string, n_links long")
    a = sorted(map(tuple, pagerank_hosts(edges, iters=3).collect()))
    b = sorted(map(tuple, pagerank_hosts(edges.repartition(13), iters=3).collect()))
    assert a == b
    assert all(r >= (15 * RANK_UNIT) // 100 for _, r in a)  # base floor
