"""node2vec-biased walks (operators/walks.py::node2vec_walks) —
differential vs a pure-Python mirror of the deterministic weighted
min-hash choice, plus a bias sanity check."""

import hashlib
import random
from collections import defaultdict

from ocaml_rdf_spark.operators.walks import node2vec_walks

SEP = "\x1f"


def mirror(edges, walks_per_node=1, walk_len=3, ret_w=4, mid_w=2, far_w=1):
    adj = defaultdict(set)
    nodes = set()
    for s, d in edges:
        adj[s].add(d)
        nodes |= {s, d}
    out = {}
    for node in sorted(nodes):
        for w in range(walks_per_node):
            prev, cur, seq = None, node, node
            for step in range(walk_len):
                best = None
                for dst in adj.get(cur, ()):
                    if prev is None:
                        wt = 1
                    elif dst == prev:
                        wt = ret_w
                    elif dst in adj.get(prev, ()):
                        wt = mid_w
                    else:
                        wt = far_w
                    draw = min(
                        hashlib.md5(
                            SEP.join([cur, dst, str(w), str(step), str(c)]).encode()
                        ).hexdigest()
                        for c in range(1, wt + 1)
                    )
                    k = draw + SEP + dst
                    if best is None or k < best:
                        best = k
                if best is None:
                    break
                nxt = best.split(SEP)[1]
                prev, cur, seq = cur, nxt, seq + "," + nxt
            out[(node, w)] = seq
    return out


def test_differential_random_graphs(spark):
    rng = random.Random(7)
    for n, m in ((10, 25), (25, 60)):
        nodes = [f"v{i}" for i in range(n)]
        ed = list({(rng.choice(nodes), rng.choice(nodes)) for _ in range(m)})
        ed = [(a, b) for a, b in ed if a != b]
        # symmetrize (standard node2vec setting)
        ed = list({*ed, *[(b, a) for a, b in ed]})
        df = spark.createDataFrame(ed, "src string, dst string")
        got = {(r.start, r.walk): r.seq
               for r in node2vec_walks(df, walks_per_node=2, walk_len=3).collect()}
        assert got == mirror(ed, walks_per_node=2, walk_len=3)


def test_return_bias_differs_from_uniform(spark):
    # On a symmetric path graph the p/q bias must change at least one walk
    # vs the far-only parameterization (ret_w=mid_w=far_w=1 ≡ uniform)
    ed = [(f"p{i}", f"p{i+1}") for i in range(10)]
    ed = ed + [(b, a) for a, b in ed]
    df = spark.createDataFrame(ed, "src string, dst string")
    biased = {(r.start, r.walk): r.seq
              for r in node2vec_walks(df, walk_len=3).collect()}
    uniform = {(r.start, r.walk): r.seq
               for r in node2vec_walks(df, walk_len=3,
                                       ret_w=1, mid_w=1, far_w=1).collect()}
    assert biased == mirror(ed, walk_len=3)
    assert uniform == mirror(ed, walk_len=3, ret_w=1, mid_w=1, far_w=1)
    assert biased != uniform


def test_dead_end_stops_walk(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    got = {(r.start, r.walk): r.seq for r in node2vec_walks(df, walk_len=4).collect()}
    assert got == {("a", 0): "a,b", ("b", 0): "b"}
