"""Round-3 prototype: achievable load factor of bucketed two-choice placement
schemes (pure numpy, no device). Drives the table-diet decision (VERDICT r2
Missing #4 / Next #4): the round-2 device builder used first-fit-b1 greedy at
load 0.25 because it starts failing per-mille around 0.5.

Schemes (all order-free, XLA-expressible as sorts + segment ranks):
  A first-fit : every key tries b1; spill tries b2 (round-2 scheme)
  B balanced  : key goes to argmin(total DEMAND of b1, b2) (ties -> b1),
                then two spill passes (loser keys try their other bucket)
Reports failure fraction vs load factor.
"""

import sys

import numpy as np

BUCKET = 8


def seg_rank_and_place(order_key, cap_of, S):
    """Greedy pass: keys grouped by order_key claim up to cap_of[bucket] slots.
    Returns placed mask (in input order)."""
    srt = np.argsort(order_key, kind="stable")
    ks = order_key[srt]
    # rank within equal-key run
    boundary = np.r_[True, ks[1:] != ks[:-1]]
    idx = np.arange(ks.size)
    seg_start = np.maximum.accumulate(np.where(boundary, idx, -1))
    rank = idx - seg_start
    ok = (ks < S) & (rank < cap_of[np.minimum(ks, S - 1)])
    placed = np.zeros(ks.size, bool)
    placed[srt] = ok
    return placed


def run(n, load, scheme, seed):
    rng = np.random.default_rng(seed)
    S = 1 << int(np.ceil(np.log2(n / (BUCKET * load))))
    h1 = rng.integers(0, 2**32, n, dtype=np.uint64)
    h2 = rng.integers(0, 2**32, n, dtype=np.uint64)
    b1 = (h1 & (S - 1)).astype(np.int64)
    b2 = ((h2 ^ (h1 >> 16)) & (S - 1)).astype(np.int64)
    cap = np.full(S, BUCKET, np.int64)

    if scheme == "A":
        first, second = b1, b2
    else:
        d1 = np.bincount(b1, minlength=S)
        d2 = np.bincount(b2, minlength=S)
        use2 = d2[b2] < d1[b1]
        first = np.where(use2, b2, b1)
        second = np.where(use2, b1, b2)

    placed = seg_rank_and_place(first, cap, S)
    occ = np.bincount(first[placed], minlength=S)
    cap2 = cap - occ
    k2 = np.where(placed, S, second)
    placed2 = seg_rank_and_place(k2, cap2, S)
    total = placed | placed2
    if scheme == "B":
        # third pass: remaining keys retry their first bucket (capacity may
        # remain where demand-estimate sent too few)
        occ2 = occ + np.bincount(second[placed2 & ~placed], minlength=S)
        cap3 = cap - occ2
        k3 = np.where(total, S, first)
        placed3 = seg_rank_and_place(k3, cap3, S)
        total = total | placed3
    fail = n - int(total.sum())
    real_load = n / (S * BUCKET)
    return fail, real_load


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    for scheme in ("A", "B"):
        for load in (0.25, 0.4, 0.5, 0.6, 0.7, 0.8):
            fails = [run(n, load, scheme, s)[0] for s in range(3)]
            rl = run(n, load, scheme, 0)[1]
            print(f"scheme {scheme} target_load {load:4} realized {rl:.3f} "
                  f"fails/:{n}: {fails}")
