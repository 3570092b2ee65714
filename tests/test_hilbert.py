"""Hilbert layout key (operators/sketches.py::hilbert_key) — bijection +
unit-step locality on the full grid, differential vs the classic xy2d
reference walk."""

import pytest

from pyspark.sql import functions as F

from ocaml_rdf_spark.operators.sketches import hilbert_key


def xy2d(order_bits, x, y):
    rx = ry = 0
    d = 0
    s = 1 << (order_bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_matches_reference_and_is_bijective(spark):
    bits = 4
    n = 1 << bits
    grid = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(grid, "x long, y long")
    got = {(r.x, r.y): r.d for r in
           df.select("x", "y", hilbert_key(F.col("x"), F.col("y"), bits=bits).alias("d")).collect()}
    assert got == {(x, y): xy2d(bits, x, y) for x, y in grid}
    assert sorted(got.values()) == list(range(n * n))


def test_unit_step_locality(spark):
    # the property Z-order lacks: consecutive keys are ALWAYS grid
    # neighbors (Manhattan distance exactly 1)
    bits = 4
    n = 1 << bits
    by_d = {}
    for x in range(n):
        for y in range(n):
            by_d[xy2d(bits, x, y)] = (x, y)
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = by_d[d], by_d[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_bits_guard(spark):
    with pytest.raises(ValueError):
        hilbert_key(F.lit(1), F.lit(1), bits=17)
