"""BoW vocabulary + relocalization tests (reference Tracking::
Relocalization / KeyFrameDatabase behavior)."""

import pytest

pytestmark = pytest.mark.slow

import numpy as np
import jax
import jax.numpy as jnp

from splslam_tpu.bow import vocabulary as V
from splslam_tpu.io.synthetic import make_stereo_sequence
from splslam_tpu.slam.system import Sensor, Settings, System, TrackingState


def test_vocab_transform_deterministic_and_discriminative():
    rng = np.random.default_rng(0)
    desc = rng.integers(0, 2**32, (2000, 8), dtype=np.uint32)
    voc = V.train(desc[:1500], k=5, depth=3, seed=0)
    w1 = V.transform_words(voc, jnp.asarray(desc[:500]), jnp.ones(500, bool))
    w2 = V.transform_words(voc, jnp.asarray(desc[:500]), jnp.ones(500, bool))
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
    assert int(jnp.max(w1)) < voc.n_words
    # same descriptor set scores higher with itself than with a random set
    v_a = V.bow_vector(voc, w1)
    w3 = V.transform_words(voc, jnp.asarray(desc[500:1000]), jnp.ones(500, bool))
    v_b = V.bow_vector(voc, w3)
    assert float(V.score_l1(v_a, v_a)) > float(V.score_l1(v_a, v_b))


def test_sparse_bow_table_scores_match_dense():
    """The sparse BowTable (per-KF word ids + tf-idf values) must
    reproduce the dense [K,W] L1 scores EXACTLY — including duplicate
    words across features (aggregated per word, scored once)."""
    rng = np.random.default_rng(2)
    desc = rng.integers(0, 2**32, (900, 8), dtype=np.uint32)
    voc = V.train(desc[:600], k=4, depth=2, seed=0)  # 16 words: many dups
    K, N = 3, 64
    ids = jnp.full((K, N), voc.n_words, jnp.int32)
    vals = jnp.zeros((K, N), jnp.float32)
    dense_rows = []
    for k in range(K):
        d = jnp.asarray(desc[600 + k * N: 600 + (k + 1) * N])
        valid = jnp.asarray(np.arange(N) < N - 5 * k)  # vary validity
        ids, vals = V.update_bow_row(
            ids, vals, voc.level_desc, voc.weights, voc.k, voc.depth,
            d, valid, jnp.int32(k),
        )
        dense_rows.append(np.asarray(V.query_bow(
            voc.level_desc, voc.weights, voc.k, voc.depth, d, valid)))
    dense_rows = np.stack(dense_rows)
    # each sparse row must round-trip to its dense vector
    for k in range(K):
        np.testing.assert_allclose(
            np.asarray(V.densify_bow_row(ids, vals, k, voc.n_words)),
            dense_rows[k], rtol=1e-6, atol=1e-7,
        )
    # and score_rows == dense sum-of-minima for a fresh query
    q = np.asarray(V.query_bow(
        voc.level_desc, voc.weights, voc.k, voc.depth,
        jnp.asarray(desc[:N]), jnp.ones(N, bool)))
    want = np.minimum(dense_rows, q[None, :]).sum(-1)
    got = np.asarray(V.score_rows(ids, vals, jnp.asarray(q)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_vocab_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    desc = rng.integers(0, 2**32, (800, 8), dtype=np.uint32)
    voc = V.train(desc, k=4, depth=2, seed=0)
    p = str(tmp_path / "voc.npz")
    V.save(voc, p)
    voc2 = V.load(p)
    w1 = V.transform_words(voc, jnp.asarray(desc[:100]), jnp.ones(100, bool))
    w2 = V.transform_words(voc2, jnp.asarray(desc[:100]), jnp.ones(100, bool))
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))


def test_relocalization_after_kidnap():
    """Track, kidnap with featureless frames, replay a seen view ->
    relocalize near the original pose (reference reloc experiment,
    report pp.6-7 fr2_360_kidnap)."""
    K, bf, frames, gt = make_stereo_sequence(
        n_frames=15, motion="forward", width=320, height=240
    )
    st = Settings(
        fx=float(K[0, 0]), fy=float(K[1, 1]), cx=float(K[0, 2]),
        cy=float(K[1, 2]), bf=float(bf), width=320, height=240,
        n_features=600, n_levels=4, th_depth=40.0, fps=10,
        max_points=8192, max_keyframes=64, local_window=1024,
        enable_local_mapping=True,
    )
    sysm = System(st, Sensor.STEREO)
    for i, (l, r) in enumerate(frames):
        sysm.track_stereo(l, r, i * 0.1)
    sysm.drain()
    assert sysm.state == TrackingState.OK

    blank = np.full((240, 320), 128.0, np.float32)
    for j in range(3):
        sysm.track_stereo(blank, blank, 1.5 + j * 0.1)
    sysm.drain()
    assert sysm.state == TrackingState.LOST

    for j in range(2):
        sysm.track_stereo(frames[6][0], frames[6][1], 2.0 + j * 0.1)
    sysm.drain()
    assert sysm.state == TrackingState.OK
    p = sysm.poses()[-1][:3, 3]
    assert np.linalg.norm(p - gt[6][:3, 3]) < 0.05, p


def test_map_save_load_relocalize(tmp_path):
    """Checkpoint the map, load into a fresh System, relocalize into it
    (the capability the reference leaves as TODO, System.h:120-122)."""
    K, bf, frames, gt = make_stereo_sequence(
        n_frames=12, motion="forward", width=320, height=240
    )
    st = Settings(
        fx=float(K[0, 0]), fy=float(K[1, 1]), cx=float(K[0, 2]),
        cy=float(K[1, 2]), bf=float(bf), width=320, height=240,
        n_features=600, n_levels=4, th_depth=40.0, fps=10,
        max_points=8192, max_keyframes=64, local_window=1024,
        enable_local_mapping=True,
    )
    s1 = System(st, Sensor.STEREO)
    for i, (l, r) in enumerate(frames):
        s1.track_stereo(l, r, i * 0.1)
    s1.drain()
    p = str(tmp_path / "map.npz")
    s1.save_map(p)

    s2 = System(st, Sensor.STEREO)
    s2.load_map(p)
    assert s2.state == TrackingState.LOST
    assert s2.n_kfs == s1.n_kfs
    # feed a previously-seen view: must relocalize against the loaded map
    for j in range(2):
        s2.track_stereo(frames[5][0], frames[5][1], 5.0 + j * 0.1)
    s2.drain()
    assert s2.state == TrackingState.OK
    pos = s2.poses()[-1][:3, 3]
    assert np.linalg.norm(pos - gt[5][:3, 3]) < 0.05


def test_load_map_dense_bow_backcompat(tmp_path):
    """Checkpoints written before the sparse BowTable stored a dense
    [K, W] `meta.kf_bow`; load_map must compact it into the same sparse
    rows a fresh save would produce."""
    st = Settings(
        fx=320.0, fy=320.0, cx=160.0, cy=120.0, bf=32.0,
        width=320, height=240, n_features=256,
        max_points=1024, max_keyframes=8, local_window=256,
    )
    s1 = System(st, Sensor.STEREO)
    W = s1.bow_n_words
    # hand-author two sparse rows, save, then rewrite as the old format
    ids = np.array(s1.kf_bow.ids)
    vals = np.array(s1.kf_bow.vals)
    ids[0, :3] = [5, 17, W - 1]
    vals[0, :3] = [0.5, 0.25, 0.25]
    ids[1, :2] = [17, 42]
    vals[1, :2] = [0.75, 0.25]
    s1.kf_bow = V.BowTable(jnp.asarray(ids), jnp.asarray(vals))
    p = str(tmp_path / "map.npz")
    s1.save_map(p)
    z = dict(np.load(p))
    dense = np.zeros((st.max_keyframes, W), np.float32)
    for k in range(2):
        dense[k, ids[k][vals[k] > 0]] = vals[k][vals[k] > 0]
    del z["meta.kf_bow_ids"], z["meta.kf_bow_vals"]
    z["meta.kf_bow"] = dense
    np.savez_compressed(p, **z)

    s2 = System(st, Sensor.STEREO)
    s2.load_map(p)
    for k in range(2):
        got = np.asarray(V.densify_bow_row(
            s2.kf_bow.ids, s2.kf_bow.vals, k, W))
        np.testing.assert_allclose(got, dense[k], atol=1e-7)


def test_epnl_ransac_recovers_pose_points_free():
    """EPnL: the line-only minimal RANSAC (reference PnPsolver::
    iterateLines, src/PnPsolver.cc:367-447) recovers the camera pose from
    line correspondences ALONE, with 30% outliers — the case where
    point-only EPnP has nothing to work with."""
    from splslam_tpu.geometry.camera import Camera
    from splslam_tpu.optim.pose_gn import line_coefficients
    from splslam_tpu.slam.reloc import epnl_ransac

    cam = Camera.create(fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=50.0,
                        width=640, height=480)
    rng = np.random.default_rng(4)
    L = 40
    S = rng.uniform([-2, -1.5, 4], [2, 1.5, 8], (L, 3)).astype(np.float32)
    d = rng.normal(0, 1, (L, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    E = S + 0.8 * d
    Mm = 0.5 * (S + E)
    xyz3 = np.stack([S, Mm, E], 1)

    # ground-truth pose: a small rigid motion
    from splslam_tpu.geometry import se3
    xi = np.array([0.1, -0.05, 0.08, 0.04, -0.03, 0.05], np.float32)
    T_gt = np.asarray(se3.se3_exp(jnp.asarray(xi)))

    def proj(X):
        pc = X @ T_gt[:3, :3].T + T_gt[:3, 3]
        return np.stack([500.0 * pc[:, 0] / pc[:, 2] + 320.0,
                         500.0 * pc[:, 1] / pc[:, 2] + 240.0], -1)

    seg = np.concatenate([proj(S), proj(E)], -1).astype(np.float32)
    # corrupt 30%: wrong 3D lines for those observations
    bad = rng.choice(L, L * 3 // 10, replace=False)
    xyz3_in = xyz3.copy()
    xyz3_in[bad] += rng.uniform(1.0, 2.0, (len(bad), 1, 3)).astype(np.float32)
    coef = line_coefficients(jnp.asarray(seg))
    T, n_in, inl = epnl_ransac(
        jax.random.PRNGKey(0), cam, coef, jnp.asarray(xyz3_in),
        jnp.ones((L,), bool),
    )
    assert int(n_in) >= L - len(bad) - 4
    err_t = np.linalg.norm(np.asarray(T)[:3, 3] - T_gt[:3, 3])
    err_R = np.linalg.norm(np.asarray(T)[:3, :3] - T_gt[:3, :3])
    assert err_t < 0.05, (err_t, np.asarray(T))
    assert err_R < 0.02, err_R
    # the corrupted correspondences are classified out
    assert not np.asarray(inl)[bad].any()


def test_load_orbslam_txt_roundtrip(tmp_path):
    """load_orbslam_txt parses the real DBoW2 text format (header
    `k L scoring weighting`, one node per line `parent is_leaf
    d0..d31 weight`, node id = line index + 1 — reference
    TemplatedVocabulary::loadFromTextFile, TemplatedVocabulary.h:1338)
    and the rebuilt tree sends descriptors to the right leaves."""
    rng = np.random.default_rng(11)
    k, L = 2, 2
    # 4 leaf "word" descriptors, well separated; internal nodes = copies
    leaf_bytes = np.zeros((4, 32), np.uint8)
    leaf_bytes[0, :8] = 255   # word 0: ones in bytes 0-7
    leaf_bytes[1, 8:16] = 255
    leaf_bytes[2, 16:24] = 255
    leaf_bytes[3, 24:32] = 255
    lvl1 = np.zeros((2, 32), np.uint8)
    lvl1[0, :16] = 128        # closer to words 0/1
    lvl1[1, 16:] = 128        # closer to words 2/3
    lines = [f"{k} {L} 0 0"]

    def node_line(parent, is_leaf, d, w):
        return f"{parent} {int(is_leaf)} " + " ".join(
            str(int(x)) for x in d) + f" {w}"
    # nodes 1,2 = level-1 children of root(0); nodes 3..6 = leaves
    lines.append(node_line(0, 0, lvl1[0], 0.0))
    lines.append(node_line(0, 0, lvl1[1], 0.0))
    lines.append(node_line(1, 1, leaf_bytes[0], 0.5))
    lines.append(node_line(1, 1, leaf_bytes[1], 0.6))
    lines.append(node_line(2, 1, leaf_bytes[2], 0.7))
    lines.append(node_line(2, 1, leaf_bytes[3], 0.8))
    p = tmp_path / "voc.txt"
    p.write_text("\n".join(lines) + "\n")

    voc = V.load_orbslam_txt(str(p))
    assert voc.k == 2 and voc.depth == 2 and voc.n_words == 4
    np.testing.assert_allclose(
        np.asarray(voc.weights), [0.5, 0.6, 0.7, 0.8])
    # query with the exact leaf descriptors -> each lands in its own word
    packed = np.zeros((4, 8), np.uint32)
    for i in range(4):
        bits = np.unpackbits(leaf_bytes[i], bitorder="little")
        packed[i] = np.packbits(
            bits.reshape(8, 32), axis=1, bitorder="little"
        ).view(np.uint32).reshape(8)
    words = V.transform_words(
        voc, jnp.asarray(packed), jnp.ones(4, bool))
    assert sorted(np.asarray(words).tolist()) == [0, 1, 2, 3]


@pytest.mark.slow
def test_midbatch_kidnap_recovers_on_batch_final_frame():
    """Batched tracking's LOST handling (slam/system.py track_*_batch):
    a kidnap inside a batch triggers a sequential replay of the staged
    images with per-frame relocalization attempts. A batch whose final
    frame revisits known scenery must come back OK at the revisited
    pose; pure-garbage batches must stay LOST without corrupting the
    map. (Kidnaps are kept short enough to stay under the sequential
    path's tiny-map reset — >5 consecutive lost frames with <=5
    keyframes resets the system, reference Tracking.cc:649-657, which
    the replay now faithfully applies to batched tracking too.)"""
    K, bf, frames, gt = make_stereo_sequence(
        n_frames=15, motion="forward", width=320, height=240
    )
    st = Settings(
        fx=float(K[0, 0]), fy=float(K[1, 1]), cx=float(K[0, 2]),
        cy=float(K[1, 2]), bf=float(bf), width=320, height=240,
        n_features=600, n_levels=4, th_depth=40.0, fps=10,
        max_points=8192, max_keyframes=64, local_window=1024,
        enable_local_mapping=True,
    )
    sysm = System(st, Sensor.STEREO)
    for i, (l, r) in enumerate(frames):
        sysm.track_stereo(l, r, i * 0.1)
    sysm.drain()
    assert sysm.state == TrackingState.OK
    n_kf0 = sysm.n_kfs

    blank = np.full((240, 320), 128.0, np.float32)
    # Batch 1: kidnap at the first frame, garbage throughout -> every
    # replayed frame's reloc attempt has nothing to match; stays LOST.
    b1 = [(blank, blank)] * 2
    sysm.track_stereo_batch(b1, [1.5 + 0.1 * j for j in range(2)])
    sysm.drain()
    assert sysm.state == TrackingState.LOST
    # Batch 2: still garbage except the FINAL frame revisits frame 6's
    # view -> the replay's relocalization must recover there.
    b2 = [(blank, blank)] * 3 + [frames[6]]
    sysm.track_stereo_batch(b2, [2.0 + 0.1 * j for j in range(4)])
    sysm.drain()
    assert sysm.state == TrackingState.OK
    p = sysm.poses()[-1][:3, 3]
    assert np.linalg.norm(p - gt[6][:3, 3]) < 0.08, p
    # the kidnap must not have minted keyframes from garbage
    assert sysm.n_kfs <= n_kf0 + 1


@pytest.mark.slow
def test_midbatch_kidnap_recovers_mid_batch():
    """A kidnap INSIDE a batch must not burn the rest of the batch: the
    staged images are replayed sequentially from the first lost frame,
    so tracking recovers at the first frame that re-observes the map
    (per-frame relocalization, reference Tracking.cc:2895) instead of
    waiting for the batch boundary. With deferred batch stats the NEXT
    batch has already been dispatched from the diverged pose when the
    loss surfaces — its device results must be discarded and its frames
    folded into the replay."""
    K, bf, frames, gt = make_stereo_sequence(
        n_frames=15, motion="forward", width=320, height=240
    )
    st = Settings(
        fx=float(K[0, 0]), fy=float(K[1, 1]), cx=float(K[0, 2]),
        cy=float(K[1, 2]), bf=float(bf), width=320, height=240,
        n_features=600, n_levels=4, th_depth=40.0, fps=10,
        max_points=8192, max_keyframes=64, local_window=1024,
        enable_local_mapping=True, batch_defer_stats=True,
    )
    sysm = System(st, Sensor.STEREO)
    for i, (l, r) in enumerate(frames[:6]):
        sysm.track_stereo(l, r, i * 0.1)
    sysm.drain()
    assert sysm.state == TrackingState.OK

    blank = np.full((240, 320), 128.0, np.float32)
    # Batch A: kidnap at its FIRST frame only; frames 1-3 re-observe
    # known scenery. Batch B: all good frames, dispatched while A's
    # loss is still invisible to the host (deferred stats).
    ba = [(blank, blank)] + [frames[6], frames[7], frames[8]]
    bb = [frames[9], frames[10], frames[11], frames[12]]
    sysm.track_stereo_batch(ba, [1.5 + 0.1 * j for j in range(4)])
    sysm.track_stereo_batch(bb, [1.9 + 0.1 * j for j in range(4)])
    sysm.drain()
    assert sysm.state == TrackingState.OK
    # Exactly one frame (the blank) may be lost; every re-observed
    # frame after it must be tracked, not written off until batch end.
    entries = sysm.trajectory[-8:]
    assert sum(e.lost for e in entries) <= 1
    assert not entries[-1].lost
    # and the recovered tail must be metrically right, not just "OK"
    p = sysm.poses()[-1][:3, 3]
    assert np.linalg.norm(p - gt[12][:3, 3]) < 0.08, p
