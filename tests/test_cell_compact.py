"""cell_compact (S2 CellUnion::Normalize equivalent) vs a pure-Python
reference, plus the coverage round-trip invariant."""

import random

from whitebox_tools_spark.operators.tiling import cell_compact


def _ref_compact(leaves, levels):
    out = []
    cur = set(leaves)
    for lvl in range(levels, 0, -1):
        from collections import Counter

        kids = Counter(c // 4 for c in cur)
        complete = {p for p, n in kids.items() if n == 4}
        out += [(c, lvl) for c in cur if c // 4 not in complete]
        cur = complete
    out += [(c, 0) for c in cur]
    return sorted(out)


def _expand(cover, levels):
    leaves = set()
    for cell, lvl in cover:
        shift = 2 * (levels - lvl)
        leaves.update(range(cell << shift, (cell + 1) << shift))
    return leaves


def _run(spark, leaves, levels):
    df = spark.createDataFrame([(c,) for c in leaves], "cell_id long")
    return sorted((r["cell_id"], r["level"])
                  for r in cell_compact(df, levels=levels).collect())


def test_full_quad_collapses_to_root(spark):
    levels = 3
    leaves = list(range(25 * 64, 26 * 64))  # the full subtree under root cell 25
    assert _run(spark, leaves, levels) == [(25, 0)]


def test_random_sets_match_reference(spark):
    rng = random.Random(7)
    levels = 4
    for trial in range(3):
        base = rng.randrange(1 << 20) * 256
        leaves = {base + rng.randrange(512) for _ in range(rng.randrange(40, 200))}
        got = _run(spark, sorted(leaves), levels)
        assert got == _ref_compact(leaves, levels)
        # exact coverage round-trip and minimality (no complete quad left)
        assert _expand(got, levels) == leaves
        from collections import Counter

        for lvl in range(levels + 1):
            sibs = Counter(c // 4 for c, l in got if l == lvl)
            assert not any(n == 4 for n in sibs.values())


def test_duplicates_and_empty(spark):
    assert _run(spark, [5, 5, 5], 2) == [(5, 2)]
    df = spark.createDataFrame([], "cell_id long")
    assert cell_compact(df, levels=3).count() == 0


def test_uncompact_round_trip_spark(spark):
    from whitebox_tools_spark.operators.tiling import cell_uncompact

    rng = random.Random(11)
    levels = 4
    leaves = sorted({rng.randrange(1 << 16) * 16 + rng.randrange(256)
                     for _ in range(300)})
    df = spark.createDataFrame([(c,) for c in leaves], "cell_id long")
    back = sorted(r["cell_id"] for r in
                  cell_uncompact(cell_compact(df, levels=levels),
                                 levels=levels).collect())
    assert back == leaves
