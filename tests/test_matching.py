"""Adversarial unit tests for the log-depth match segmentation (ops/matching.py):
random synthetic probe streams vs a direct sequential emulation of the reference's
Match::new/extend/check walk (src/match.rs:20-58, src/mers.rs:57-73)."""

import numpy as np
import pytest

from mapquik_tpu.index.lookup import ProbeResult
from mapquik_tpu.ops.matching import find_matches
from mapquik_tpu.ops.seeding import SeedBatch
from mapquik_tpu.params import Params


def _sequential_matches(hit, rid, eoff, est, een, erc, qst, qen, qrev, fix_bug):
    """Reference walk: each hit starts a Match that greedily extends while the next
    position hits and `check` passes (forward: offset delta +1 [quirk: nothing else];
    rc: same ref, strand-consistent, offset delta -1)."""
    out = []
    M = len(hit)
    j = 0
    while j < M:
        if not hit[j]:
            j += 1
            continue
        rc = qrev[j] != erc[j]
        q_s, q_e = qst[j], qen[j]
        r_s, r_e = est[j], een[j]
        count = 1
        bucket = rid[j]
        prev = j
        j += 1
        while j < M and hit[j]:
            link_rc = qrev[j] != erc[j]
            if rc:
                ok = (rid[j] == rid[prev]) and link_rc and (eoff[prev] - eoff[j] == 1)
            elif fix_bug:
                ok = (rid[j] == rid[prev]) and not link_rc and (eoff[j] - eoff[prev] == 1)
            else:
                ok = eoff[j] - eoff[prev] == 1  # precedence quirk
            if not ok:
                break
            count += 1
            q_e = qen[j]
            if rc:
                r_s = est[j]
            else:
                r_e = een[j]
            prev = j
            j += 1
        out.append((count, q_s, q_e, r_s, r_e, rc, bucket))
    return out


@pytest.mark.parametrize("fix_bug", [False, True])
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_find_matches_equals_sequential_walk(seed, fix_bug):
    rng = np.random.default_rng(seed)
    B, M = 6, 96
    p = Params(fix_check_bug=fix_bug)
    n = rng.integers(M // 2, M, size=B).astype(np.int32)
    slot = np.arange(M)[None, :]
    hit = (rng.random((B, M)) < 0.6) & (slot < n[:, None])
    # adversarial: tiny offset space so +1/-1 deltas and cross-ref collisions abound
    rid = rng.integers(0, 2, size=(B, M)).astype(np.int32)
    eoff = rng.integers(0, 8, size=(B, M)).astype(np.int32)
    # make long consecutive stretches too
    for b in range(B):
        for s in range(0, M, 16):
            if rng.random() < 0.5:
                run = rng.integers(3, 8)
                dirn = 1 if rng.random() < 0.5 else -1
                base = int(rng.integers(10, 1000))
                for t in range(run):
                    if s + t < M:
                        eoff[b, s + t] = base + dirn * t
                        rid[b, s + t] = rid[b, s]
    est = (eoff * 100).astype(np.int32)
    een = est + 80
    erc = rng.random((B, M)) < 0.5
    qst = (slot * 50).astype(np.int32) * np.ones((B, 1), np.int32)
    qen = qst + 40
    qrev = rng.random((B, M)) < 0.5

    sb = SeedBatch(
        h1=np.zeros((B, M), np.uint32), h2=np.zeros((B, M), np.uint32),
        start=qst.astype(np.int32), end=qen.astype(np.int32), rev=qrev, n=n,
        overflow=np.zeros(B, bool),
    )
    pr = ProbeResult(hit=hit, rid=rid, start=est, end=een, offset=eoff, rc=erc)
    mb = find_matches(sb, pr, p)

    for b in range(B):
        want = _sequential_matches(
            hit[b], rid[b], eoff[b], est[b], een[b], erc[b],
            qst[b], qen[b], qrev[b], fix_bug,
        )
        got_n = int(np.asarray(mb.n)[b])
        assert got_n == len(want), (b, got_n, len(want))
        for i, (count, q_s, q_e, r_s, r_e, rc, bucket) in enumerate(want):
            assert int(np.asarray(mb.count)[b, i]) == count, (b, i)
            assert int(np.asarray(mb.q_start)[b, i]) == q_s
            assert int(np.asarray(mb.q_end)[b, i]) == q_e
            assert int(np.asarray(mb.r_start)[b, i]) == r_s
            assert int(np.asarray(mb.r_end)[b, i]) == r_e
            assert bool(np.asarray(mb.rc)[b, i]) == rc
            assert int(np.asarray(mb.bucket)[b, i]) == bucket
