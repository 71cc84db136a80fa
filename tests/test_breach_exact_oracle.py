"""Audit of the breach_depressions_exact oracle twin.

The twin (__spark_entry__._q_breach_exact) gates
breach_depressions_least_cost on a 12x12 single-pit fixture against a
two-stage DuckDB unroll of the per-pit Dijkstra. The unroll is sound
only while the search structure holds, so this test re-runs the
kernel's exact loop (heap ordered by (accum, counter), neighbor scan
in D8 order, backlink carve) in pure Python and pins:

1. the raise phase finds EXACTLY ONE pit, at (6, 1), original z 40;
2. the Dijkstra terminates on its SECOND pop — pop 1 is the pit, pop 2
   is the min-cost ring neighbor, whose first non-encountered scan
   direction hits the off-grid rim (the breach target);
3. the ring argmin is strict (the winner's cost is < every other ring
   cost — the (cost, n) tie order never fires, though both engines
   would break ties identically on bitwise-equal floats anyway);
4. the carve set is exactly {winner: z_pit - 0.01, pit: z_pit} and the
   final DEM equals the closed-form replay bit for bit;
5. the carved DEM is pit-free, so the operator's round loop returns
   after round 2's empty pivot (the replay models one round).

Every float both engines compute is the same expression text over the
same inputs (flat_increment pins small_num = 0.01), so no rounding or
margin analysis is needed — the gate is exact equality.
"""

import heapq

DX8 = [1, 1, 1, 0, -1, -1, -1, 0]
DY8 = [-1, 0, 1, 1, 1, 0, -1, -1]
BACKLINK = [4, 5, 6, 7, 0, 1, 2, 3]
SN = 0.01


def _fixture():
    z = {}
    for r in range(12):
        for c in range(12):
            z[(r, c)] = 40.0 if (r, c) == (6, 1) else float(50 + 2 * c + r)
    return z


def _pits(z):
    out = []
    for (r, c), v in z.items():
        nbrs = [(r + DY8[n], c + DX8[n]) for n in range(8)]
        if all(p in z for p in nbrs) and all(z[p] >= v for p in nbrs):
            out.append(((r, c), v, min(z[p] for p in nbrs)))
    return out


def test_breach_exact_fixture():
    z = _fixture()
    pits = _pits(z)
    assert pits == [((6, 1), 40.0, 55.0)]                       # 1.
    (prow, pcol), z_pit, min_nbr = pits[0]

    raised = dict(z)
    raised[(prow, pcol)] = min_nbr - SN

    # the kernel loop, transcribed from hydro.breach_depressions_least_cost
    encountered = {(prow, pcol)}
    path_length = {(prow, pcol): 0}
    backlink = {}
    heap = [(0.0, 0, prow, pcol)]
    counter = 1
    carves = []
    pops = 0
    ring_costs = []
    while heap:
        accum, _cnt, r, c = heapq.heappop(heap)
        pops += 1
        length = path_length[(r, c)]
        done = False
        for n in range(8):
            rn, cn = r + DY8[n], c + DX8[n]
            if (rn, cn) in encountered:
                continue
            length_n = length + 1
            path_length[(rn, cn)] = length_n
            backlink[(rn, cn)] = BACKLINK[n]
            zn = raised.get((rn, cn))
            zout = z_pit - length_n * SN
            if zn is not None and zn > zout:
                cost2 = zn - zout
                encountered.add((rn, cn))
                if pops == 1:
                    ring_costs.append(cost2)
                if length_n <= 20:
                    heapq.heappush(heap, (accum + cost2, counter, rn, cn))
                    counter += 1
            else:
                while (rn, cn) in backlink:
                    b = backlink[(rn, cn)]
                    rn, cn = rn + DY8[b], cn + DX8[b]
                    zp = raised.get((rn, cn))
                    lp = path_length[(rn, cn)]
                    zo = z_pit - lp * SN
                    if zp is not None and zp > zo:
                        carves.append(((rn, cn), zo))
                done = True
                break
        if done:
            break
    assert pops == 2, "the SQL unroll models exactly two pops"   # 2.
    s = sorted(ring_costs)
    assert len(s) == 8 and s[1] - s[0] > 0.5                     # 3.

    winner = min(((raised[(prow + DY8[n], pcol + DX8[n])]
                   - (z_pit - 1 * SN), n) for n in range(8)))
    wr, wc = prow + DY8[winner[1]], pcol + DX8[winner[1]]
    assert dict(carves) == {(wr, wc): z_pit - 1 * SN,
                            (prow, pcol): z_pit - 0 * SN}        # 4.

    final = dict(raised)
    for k, v in carves:
        final[k] = min(final[k], v)
    # closed-form replay (the oracle's semantics)
    replay = dict(z)
    replay[(prow, pcol)] = min(min_nbr - SN, z_pit - 0 * SN)
    replay[(wr, wc)] = min(z[(wr, wc)], z_pit - 1 * SN)
    assert final == replay                                       # 4.

    assert _pits(final) == [], "carved DEM must drain"           # 5.
