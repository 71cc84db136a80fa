"""Audit of the embankment_mapping_exact oracle twin.

The twin (__spark_entry__._q_embankment_exact) gates embankment_mapping
at the one-ring parameterization (max_width=90 -> halved 45.0, strictly
between one diagonal step 35.36 and two cardinal steps 50.0) against a
DuckDB replay (seed argmax -> one-ring Dijkstra assignment -> recursive
grow closure). The replay is sound only while the structural claims
hold, so this test re-runs the kernel's exact loops (heapq order,
neighbor scan order, first-visit assignment) in pure Python on the full
sf0.01 grid and pins:

1. pass 1 assigns exactly one ring: every distance assignment happens
   while popping a SEED (d0 == 0.0) — no popped ring cell assigns;
2. the contested-cell rule: each ring cell's assigning seed is the
   min-(row, col) seed among its 8-adjacent seeds (heap pops the
   equal-priority (0.0, row, col) entries in tuple order);
3. float-margin audit: elevations are integer doubles (so eh <= 40,
   zn <= zc, zc - zn > -0.05 and the seed argmax are exact in any
   engine); ms - abs(es) == 0.0 bitwise; and the only libm-sensitive
   comparison, ms < 4.0, clears the threshold by >= 1e-6 for every
   ring cell;
4. order-freeness of pass 2: the kernel's priority-grow result equals
   the least fixpoint computed by plain round iteration;
5. the DuckDB oracle's grown set equals the kernel's out set exactly.
"""

import heapq
import math
import os

import duckdb
import pytest

import __spark_entry__ as E

SF01 = "/root/testdata/sf0.01"

DX8 = [1, 1, 1, 0, -1, -1, -1, 0]
DY8 = [-1, 0, 1, 1, 1, 0, -1, -1]
DIAG = math.sqrt(25.0 ** 2 + 25.0 ** 2)
DIST = [DIAG, 25.0, DIAG, 25.0, DIAG, 25.0, DIAG, 25.0]
MAXW = 45.0       # max_width 90 halved
MIN_RW = 25.0     # min_road_width 50 halved
TYP_W = 40.0      # typical_width 80 halved
MAX_H = 40.0
MAX_INC = 0.05
SPILL = 4.0
MID = 1           # search_dist 60 / res 25 -> window 3, mid 1


def _con():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF01}/events.parquet'")
    return con


def _inputs(con):
    z = {(r, c): v for r, c, v in
         con.execute(E._RAS_C_SQL).fetchall()}
    sql = E._embankment_exact_oracle()
    road_sql = sql[:sql.rindex("SELECT")] + "SELECT row, col FROM strm"
    roads = {(r, c) for r, c in con.execute(road_sql).fetchall()
             if (r, c) in z}
    return z, roads


def _seeds(z, roads):
    """Kernel seeding loop, global grid."""
    out = {}
    for (r, c) in sorted(roads):
        maxval, mp = z[(r, c)], (r, c)
        for dr in range(-MID, MID + 1):
            for dc in range(-MID, MID + 1):
                p = (r + dr, c + dc)
                if p in z and p not in roads and z[p] > maxval:
                    maxval, mp = z[p], p
        out[mp] = maxval
    return out


def _pass1(z, seeds):
    """Kernel bounded Dijkstra; returns (distg, seedel, maxslope,
    assigning_pop_depths)."""
    distg, seedel, maxslope = {}, {}, {}
    pq = []
    for (r, c), sz in sorted(seeds.items()):
        distg[(r, c)] = 0.0
        seedel[(r, c)] = sz
        maxslope[(r, c)] = 0.0
        heapq.heappush(pq, (0.0, r, c))
    assigner_depth = []
    assigner = {}
    while pq:
        d0, r, c = heapq.heappop(pq)
        sz = seedel[(r, c)]
        for n in range(8):
            p = (r + DY8[n], c + DX8[n])
            if p not in z or p in distg:
                continue
            d = d0 + DIST[n]
            if d < MAXW:
                distg[p] = d
                seedel[p] = sz
                es = math.atan((sz - z[p]) / d)
                maxslope[p] = max(math.degrees(abs(es)),
                                  maxslope[(r, c)])
                assigner_depth.append(d0)
                assigner[p] = (r, c)
                heapq.heappush(pq, (d, p[0], p[1]))
    return distg, seedel, maxslope, assigner_depth, assigner


def _grow_test(zc, zn, d, sz, ms):
    if d <= MIN_RW:
        return True
    if d <= MAXW:
        eh = sz - zn
        es = math.degrees(math.atan(eh / d))
        if d <= TYP_W and zc - zn > -MAX_INC and eh <= MAX_H:
            if zn <= zc:
                return True
            if ms < SPILL:
                return True
        elif ms - abs(es) <= 1.0 and es >= 0.0:
            return True
    return False


def _pass2_kernel(z, seeds, distg, seedel, maxslope):
    out = set(seeds)
    pq = [(0.0, r, c) for (r, c) in sorted(seeds)]
    heapq.heapify(pq)
    while pq:
        _d0, r, c = heapq.heappop(pq)
        zc = z[(r, c)]
        for n in range(8):
            p = (r + DY8[n], c + DX8[n])
            if p not in z or p in out:
                continue
            d = distg.get(p, -1.0)
            if d < 0.0:
                continue
            if _grow_test(zc, z[p], d, seedel[p], maxslope[p]):
                out.add(p)
                heapq.heappush(pq, (d, p[0], p[1]))
    return out


def _pass2_fixpoint(z, seeds, distg, seedel, maxslope):
    out = set(seeds)
    ring = [p for p in distg if p not in seeds]
    changed = True
    while changed:
        changed = False
        for p in ring:
            if p in out:
                continue
            for n in range(8):
                q = (p[0] + DY8[n], p[1] + DX8[n])
                if q in out and _grow_test(z[q], z[p], distg[p],
                                           seedel[p], maxslope[p]):
                    out.add(p)
                    changed = True
                    break
    return out


@pytest.mark.skipif(not os.path.isdir(SF01),
                    reason="sf0.01 testdata not present")
def test_embankment_exact_structure_and_margins():
    con = _con()
    z, roads = _inputs(con)
    assert len(z) == 1600 and roads                              # full grid
    assert all(v == int(v) for v in z.values())                  # 3. integers

    seeds = _seeds(z, roads)
    distg, seedel, maxslope, depths, assigner = _pass1(z, seeds)

    # 1. one ring only: every assignment happened while popping a seed
    assert depths and all(d0 == 0.0 for d0 in depths)
    ring = {p for p in distg if p not in seeds}
    assert all(distg[p] in (25.0, DIAG) for p in ring)

    # 2. contested-cell rule == min-(row, col) adjacent seed
    for p, s in assigner.items():
        adj = [q for q in seeds
               if max(abs(q[0] - p[0]), abs(q[1] - p[1])) <= 1 and q != p]
        assert s == min(adj)

    # 3. margins: ms vs the spillout threshold; ms == abs(es) bitwise
    for p in ring:
        d, sz = distg[p], seedel[p]
        eh = sz - z[p]
        es = math.degrees(math.atan(eh / d))
        assert maxslope[p] == abs(es)
        assert abs(maxslope[p] - SPILL) >= 1e-6

    # 4. the priority grow is the order-free least fixpoint
    out_kernel = _pass2_kernel(z, seeds, distg, seedel, maxslope)
    out_fix = _pass2_fixpoint(z, seeds, distg, seedel, maxslope)
    assert out_kernel == out_fix

    # 5. the DuckDB oracle reproduces the kernel's grown set exactly
    got = {(r, c) for r, c, _v in
           con.execute(E._embankment_exact_oracle()).fetchall()}
    assert got == out_kernel
    assert len(got) > len(seeds)        # the closure actually grew
