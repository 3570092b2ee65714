"""dawid_skene EM label aggregation: exact Python-mirror equality,
posterior sanity, and the reliable-rater-outvotes-noise property."""

SCALE = 10**6


def _mirror(rows, iters, scale=SCALE, pseudo=SCALE // 20):
    lab = {}
    for item, rater, label in rows:
        key = (item, rater)
        lab[key] = min(lab.get(key, label), label)
    labl = [(i, r, l) for (i, r), l in lab.items()]
    classes = sorted({l for _, _, l in labl})
    k = len(classes)
    items = sorted({i for i, _, _ in labl})
    n = {}
    cnt = {}
    for i, _r, l in labl:
        n[i] = n.get(i, 0) + 1
        cnt[(i, l)] = cnt.get((i, l), 0) + 1
    post = {(i, c): cnt.get((i, c), 0) * scale // n[i] for i in items for c in classes}
    bylab = {}
    for i, r, l in labl:
        bylab.setdefault(i, []).append((r, l))
    for _ in range(iters):
        tot = sum(post.values())
        prior = {
            c: scale * sum(post[(i, c)] for i in items) // max(tot, 1) for c in classes
        }
        num = {}
        for i, r, l in labl:
            for c in classes:
                num[(r, c, l)] = num.get((r, c, l), 0) + post[(i, c)]
        den = {}
        for (r, c, _l), v in num.items():
            den[(r, c)] = den.get((r, c), 0) + v
        conf = {
            (r, c, l): scale * (v + pseudo) // (den[(r, c)] + k * pseudo)
            for (r, c, l), v in num.items()
        }
        newpost = {}
        for i in items:
            accs = {}
            for c in classes:
                a = prior[c]
                for r, l in sorted(bylab[i]):
                    a = a * conf[(r, c, l)] // scale
                accs[c] = a
            ti = sum(accs.values())
            for c in classes:
                newpost[(i, c)] = (
                    scale * accs[c] // ti if ti > 0 else prior[c]
                )
        post = newpost
    return post


def _fixture(n=60):
    # true label A iff item % 3 == 0; raters: acc always right, nb flips on
    # item % 4 == 1, nc flips on item % 5 == 2; items = 17 mod 20 get TWO
    # wrong votes vs acc's one right vote (majority wrong), plus one dup
    rows = []
    for i in range(n):
        t = "A" if i % 3 == 0 else "B"
        flip = "B" if t == "A" else "A"
        rows.append((f"i{i:03d}", "acc", t))
        rows.append((f"i{i:03d}", "nb", flip if i % 4 == 1 else t))
        rows.append((f"i{i:03d}", "nc", flip if i % 5 == 2 else t))
    rows.append(("i000", "acc", "B"))  # dup label: min-collapse -> 'A' survives
    return rows


def test_dawid_skene_matches_python_mirror(spark):
    from ocaml_rdf_spark.operators.stats import dawid_skene

    rows = _fixture()
    df = spark.createDataFrame(rows, "item string, rater string, label string")
    for iters in (1, 2):
        got = {
            (r["item"], r["cls"]): r["post_ppm"]
            for r in dawid_skene(df, iters=iters).collect()
        }
        assert got == _mirror(rows, iters)


def test_dawid_skene_beats_majority_vote(spark):
    from ocaml_rdf_spark.operators.stats import dawid_skene, ds_hard_labels

    rows = _fixture()
    df = spark.createDataFrame(rows, "item string, rater string, label string")
    post = dawid_skene(df, iters=6)
    hard = {r["item"]: r["label_hat"] for r in ds_hard_labels(post).collect()}
    contested = [i for i in range(60) if i % 4 == 1 and i % 5 == 2]
    assert contested == [17, 37, 57]  # majority vote is WRONG on these
    for i in range(60):
        want = "A" if i % 3 == 0 else "B"
        assert hard[f"i{i:03d}"] == want, (i, hard)
    # posteriors normalize to ~scale per item (floor-div slack < n_classes)
    sums = (
        post.groupBy("item").sum("post_ppm").collect()
    )
    for r in sums:
        assert SCALE - 2 <= r["sum(post_ppm)"] <= SCALE
