"""Fast loop-DETECTION unit tests: synthetic BoW rows + a hand-built map,
no tracking, no Sim3 — the covisibility min-score gate and the
>=3-consecutive-keyframe temporal consistency of the reference
(src/LoopClosing.cc:103-229) exercised directly on LoopCloser.

Added after round 2 shipped with the only loop e2e test red: the e2e
path costs minutes, so this is the smoke-subset guard that detection
logic cannot silently regress again."""

import numpy as np
import jax.numpy as jnp
import pytest

from splslam_tpu.slam import loop_closing as LC
from splslam_tpu.slam.map import MapState


K_CAP, N_FEAT, P_CAP, W = 16, 128, 1024, 64
N_KF = 12


def _build_map():
    """12 keyframes in a chain: KF k observes landmarks 40k..40k+119, so
    KFs share 80 landmarks at distance 1, 40 at distance 2, none at >= 3
    — a +-2 covisibility band, like a real sequential map."""
    st = MapState.empty(P_CAP, 4, K_CAP, N_FEAT, 4)
    lm_idx = np.full((K_CAP, N_FEAT), -1, np.int32)
    fvalid = np.zeros((K_CAP, N_FEAT), bool)
    pvalid = np.zeros((P_CAP,), bool)
    for k in range(N_KF):
        ids = np.arange(40 * k, 40 * k + 120)
        lm_idx[k, :120] = ids
        fvalid[k, :120] = True
        pvalid[ids] = True
    kfs = st.kfs._replace(
        lm_idx=jnp.asarray(lm_idx),
        fvalid=jnp.asarray(fvalid),
        valid=jnp.asarray(np.arange(K_CAP) < N_KF),
    )
    pts = st.pts._replace(valid=jnp.asarray(pvalid))
    return st._replace(kfs=kfs, pts=pts, n_kfs=jnp.int32(N_KF))


def _bow_rows():
    """Deterministic L1-normalized rows built so that the revisit
    {9,10,11} of place A scores 0.5 against the original pass {0,1,2}
    while each revisit query's covisible min-score is 0 (its group spans
    the A/B1/B2 place boundary), and a mid-map query's covisible
    min-score (0.25) exceeds every far keyframe's score — so loop
    candidates survive only across the genuine revisit, exactly the
    DetectLoop geometry (reference src/LoopClosing.cc:121-150)."""
    rows = np.zeros((K_CAP, W), np.float32)
    A = np.arange(0, 16)
    B1 = np.arange(16, 24)
    B2 = np.arange(24, 32)
    for k in range(N_KF):
        if k >= 9:
            # place-A revisit with viewpoint drift: 9 sees the first half
            # of A's words, 10 all of them, 11 the second half — so each
            # revisit query has a weak covisible link (min-score 0) while
            # still scoring >= 0.25 against the original pass {0,1,2}.
            sub = A[:8] if k == 9 else (A if k == 10 else A[8:])
            rows[k, sub] = 1.0 / len(sub)
            continue
        place = A if k <= 2 else (B1 if k <= 5 else B2)
        rows[k, place] = 0.5 / len(place)
        e_prev, e_cur = 32 + k - 1, 32 + k
        if k == 0:
            rows[k, e_cur] += 0.5
        else:
            rows[k, e_prev] += 0.25
            rows[k, e_cur] += 0.25
    return jnp.asarray(rows)


def _table_from_dense(rows: np.ndarray):
    """Dense [K,W] rows -> sparse BowTable (test convenience)."""
    from splslam_tpu.bow.vocabulary import BowTable

    rows = np.asarray(rows)
    K, W = rows.shape
    S = max(int((rows > 0).sum(1).max()), 1)
    ids = np.full((K, S), W, np.int32)
    vals = np.zeros((K, S), np.float32)
    for k in range(K):
        nz = np.nonzero(rows[k])[0]
        ids[k, : len(nz)] = nz
        vals[k, : len(nz)] = rows[k, nz]
    return BowTable(jnp.asarray(ids), jnp.asarray(vals))


class _StubSystem:
    def __init__(self):
        self.map = _build_map()
        self.kf_bow = _table_from_dense(np.asarray(_bow_rows()))
        self.bow_n_words = W
        self.n_kfs = N_KF
        self.vocab = object()  # only checked for non-None


def test_covisible_mask_matches_construction():
    st = _build_map()
    cov9 = np.asarray(LC._covisible_mask(st, jnp.int32(9)))
    # +-2 covisibility band: shares 80 with 8/10, 40 with 7/11
    assert cov9[7] and cov9[8] and cov9[10] and cov9[11]
    assert not cov9[:7].any()
    assert not cov9[N_KF:].any()


def test_temporal_consistency_fires_on_third_consecutive_hit():
    sysm = _StubSystem()
    lc = LC.LoopCloser(sysm)
    calls = []
    lc._verify_and_close = lambda kf, cand: calls.append((kf, cand)) or True

    lc.on_keyframe(9)
    assert not calls and lc.consistent  # candidate group recorded
    lc.on_keyframe(10)
    assert not calls  # second consecutive hit: count 1, still < 3
    lc.on_keyframe(11)
    # third consecutive hit reaches mnCovisibilityConsistencyTh=3
    assert calls, "loop candidate must reach verification on the 3rd hit"
    kf, cand = calls[0]
    assert kf == 11 and cand in (0, 1, 2)


def test_consistency_resets_when_candidates_vanish():
    sysm = _StubSystem()
    lc = LC.LoopCloser(sysm)
    lc._verify_and_close = lambda kf, cand: True
    lc.on_keyframe(9)
    assert lc.consistent
    # a query from the middle of the map (place B) has no far candidates
    # scoring above its covisible min-score -> groups reset (reference
    # clears mvConsistentGroups when no candidates survive, :147-150)
    lc.on_keyframe(5)
    assert lc.consistent == []


def test_neighbors_are_not_loop_candidates():
    """A keyframe covisible with the query (or the query itself) must be
    excluded by the covisibility gate even with a perfect BoW score."""
    sysm = _StubSystem()
    lc = LC.LoopCloser(sysm)
    seen = []
    lc._verify_and_close = lambda kf, cand: seen.append((kf, cand)) or True
    for kf in (9, 10, 11):
        lc.on_keyframe(kf)
    for kf, cand in seen:
        cov = np.asarray(LC._covisible_mask(sysm.map, jnp.int32(kf)))
        assert not cov[cand] and cand != kf
