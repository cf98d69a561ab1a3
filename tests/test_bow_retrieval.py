"""BoW retrieval discrimination at map scale (VERDICT round-2 item 6):
200+ keyframe places, revisit queries, top-1 precision and score
separation. The round-2 vocabulary's behavior at realistic map sizes was
an article of faith; this measures it.

Protocol: 360 distinct places (round-3 VERDICT #6: prove retrieval at
the 300-500-keyframe scale the tables are dimensioned for; round 3 ran
224) along a long lateral track over a textured plane (adjacent places
overlap like consecutive keyframes); each place revisited from a
0.1-unit offset + 1.5deg yaw. At the same 0.55-unit spacing as round 3
the 197-unit track stays inside the 8192px texture's wrap period
(8192/40 = 204.8 units) so no two places alias. (416 places at
0.45-unit spacing was measured too: the tighter spacing moves the
true-neighborhood boundary — 2 "far" misses at |off|=4 are ~1.8 units
away, inside what +-3 covers at 0.55 — so the round-3 spacing is kept
and only the COUNT scales.) What loop detection
needs from BoW is that a revisit NEVER scores a far place above the
true neighborhood (a false loop is catastrophic; retrieving the
neighbor of the true place is harmless — Sim3 verification aligns
against whichever covisible keyframe is retrieved, reference
LoopClosing.cc:245-389). At 0.55-unit spacing over a z=3..7 plane a
320px/200fx view spans ~4.8 units, so +-1 places share ~88%% of the
view and +-2 share ~77%% — both are the true neighborhood; the gates
are (a) ZERO far retrievals, (b) near-precision, (c) own/far score
separation."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from splslam_tpu.bow import vocabulary as V
from splslam_tpu.io.synthetic import PlaneScene, make_texture
from splslam_tpu.ops.orb import extract_orb
from splslam_tpu.ops.pyramid import PyramidSpec

W, H, FX = 320, 240, 200.0
N_PLACES = 360


def _views():
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1]], np.float32)
    scene = PlaneScene(make_texture(seed=42, size=8192), z0=3.0, z1=7.0,
                       px_per_unit=40.0)
    spec = PyramidSpec.create(H, W, n_features=500, n_levels=4)
    originals, revisits = [], []
    th = np.deg2rad(1.5)
    Ry = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                   [-np.sin(th), 0, np.cos(th)]], np.float32)
    for i in range(N_PLACES):
        Twc = np.eye(4)
        Twc[0, 3] = 0.55 * i
        originals.append(scene.render(K, Twc, H, W))
        Twc2 = Twc.copy()
        Twc2[:3, :3] = Ry
        Twc2[0, 3] += 0.1
        Twc2[1, 3] += 0.05
        revisits.append(scene.render(K, Twc2, H, W))
    return spec, originals, revisits


def _bow_rows(voc, spec, images):
    rows = []
    for img in images:
        f = extract_orb(jnp.asarray(img, jnp.float32), spec)
        rows.append(np.asarray(V.query_bow(
            voc.level_desc, voc.weights, voc.k, voc.depth,
            f.desc, f.valid,
        )))
    return np.stack(rows)


def _load_best_vocab():
    assets = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "splslam_tpu", "assets",
    )
    for name in ("vocab_100k.npz", "vocab_10k.npz"):
        p = os.path.join(assets, name)
        if os.path.exists(p):
            return V.load(p), name
    pytest.skip("no bundled vocabulary")


def test_top1_retrieval_precision_at_map_scale():
    voc, name = _load_best_vocab()
    spec, originals, revisits = _views()
    db = _bow_rows(voc, spec, originals)       # [P, W]
    q = _bow_rows(voc, spec, revisits)         # [P, W]
    # L1 score s(v,w) = sum min(v,w) for L1-normalized rows
    scores = np.minimum(db[None, :, :], q[:, None, :]).sum(-1)  # [P,P]
    top1 = scores.argmax(1)
    off = top1 - np.arange(N_PLACES)
    p1 = (np.abs(off) <= 1).mean()
    p2 = (np.abs(off) <= 2).mean()
    far_misses = int((np.abs(off) > 3).sum())
    # separation: own-place score vs best FAR place (|i-j| > 3)
    own = scores[np.arange(N_PLACES), np.arange(N_PLACES)]
    far = scores.copy()
    for d in range(-3, 4):
        idx = np.arange(N_PLACES)
        j = idx + d
        ok = (j >= 0) & (j < N_PLACES)
        far[idx[ok], j[ok]] = -1
    sep = own / np.maximum(far.max(1), 1e-9)
    print(f"\n[{name}] top-1 precision +-1: {p1:.3f}, +-2: {p2:.3f}; "
          f"far misses: {far_misses}/{N_PLACES}; "
          f"median own/far separation: {np.median(sep):.2f}")
    assert far_misses == 0, (far_misses, off[np.abs(off) > 3])
    assert p2 >= 0.95, p2
    assert p1 >= 0.70, p1
    assert np.median(sep) > 1.1, np.median(sep)


def test_retrieval_on_tracked_300kf_map():
    """Round-4 VERDICT missing #2 / next #6: the 360-place protocol
    above scores synthetic place renders; THIS gate queries the BoW
    table of an actually TRACKED hundreds-of-keyframes map — KF rows
    built by the live `_register_kf_bow` path from tracked keyframes at
    the cadence the keyframe policy produced, queried through the same
    `reloc_scores` kernel relocalization and loop detection use.

    Geometry: ~36-unit lateral track, force_kf_every=2 (one keyframe
    per 3 frames) -> ~0.12 units between keyframes; a 320px/200fx view
    at z0=3 spans ~4.8 units, so
    neighbors share almost everything. The gates mirror what loop
    detection needs: the top-1 for a revisit query lands inside the
    strongly-overlapping neighborhood (|off| <= 16 KFs ~ 1.9 units,
    >=60%% shared view), and NOTHING beyond the view span (40 KFs) is
    ever retrieved — a far retrieval is the false-loop event."""
    from splslam_tpu.slam.system import (
        Sensor, Settings, System, TrackingState)

    voc, name = _load_best_vocab()
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1]], np.float32)
    BASE = 0.12
    scene = PlaneScene(make_texture(seed=42, size=8192), z0=3.0, z1=7.0,
                       px_per_unit=40.0)
    n_frames = 950
    st = Settings(
        fx=FX, fy=FX, cx=W / 2, cy=H / 2, bf=FX * BASE, width=W, height=H,
        n_features=500, n_levels=4, th_depth=60.0, fps=10,
        max_points=65536, max_keyframes=512, local_window=1024,
        enable_local_mapping=False, force_kf_every=2, min_kf_gap=1,
        enable_loop_closing=False,
    )
    sysm = System(st, Sensor.STEREO)
    kf_x = {}  # keyframe id -> true x position
    for i in range(n_frames):
        Twc = np.eye(4)
        Twc[0, 3] = 0.04 * i
        Twc[1, 3] = 0.01 * np.sin(i * 0.3)
        l = scene.render(K, Twc, H, W)
        Twc_r = Twc.copy()
        Twc_r[0, 3] += BASE
        r = scene.render(K, Twc_r, H, W)
        n_before = sysm.n_kfs
        sysm.track_stereo(l, r, i * 0.1)
        if sysm.n_kfs > n_before:
            kf_x[sysm.n_kfs - 1] = float(Twc[0, 3])
    sysm.drain()
    assert sysm.get_tracking_state() == TrackingState.OK
    n_kfs = sysm.n_kfs
    print(f"\n[{name}] tracked map: {n_kfs} KFs over "
          f"{0.04 * n_frames:.1f} units")
    assert n_kfs >= 300, n_kfs

    # Revisit queries every 10th keyframe: re-render from a 0.1-unit
    # offset + 1.5deg yaw (same perturbation as the place protocol).
    th = np.deg2rad(1.5)
    Ry = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                   [-np.sin(th), 0, np.cos(th)]], np.float32)
    spec = sysm.spec
    xs = np.array([kf_x.get(k, np.nan) for k in range(n_kfs)])
    from splslam_tpu.slam.reloc import reloc_scores

    n_far = 0
    offs = []
    for k in range(5, n_kfs - 5, 10):
        Twc = np.eye(4)
        Twc[:3, :3] = Ry
        Twc[0, 3] = xs[k] + 0.1
        Twc[1, 3] = 0.05
        img = scene.render(K, Twc, H, W)
        f = extract_orb(jnp.asarray(img, jnp.float32), spec)
        q = V.query_bow(voc.level_desc, voc.weights, voc.k, voc.depth,
                        f.desc, f.valid)
        scores = np.asarray(reloc_scores(
            sysm.kf_bow.ids, sysm.kf_bow.vals, sysm.map.kfs.valid, q,
            jnp.zeros((st.max_keyframes,), bool),
        ))[:n_kfs]
        top = int(scores.argmax())
        d_units = abs(xs[top] - xs[k])
        offs.append(d_units)
        if d_units > 40 * 0.12:   # beyond the view span: false place
            n_far += 1
    offs = np.array(offs)
    near = (offs <= 16 * 0.12).mean()
    print(f"queries {len(offs)}: top-1 within 1.9u: {near:.3f}, "
          f"median off {np.median(offs):.2f}u, far misses {n_far}")
    assert n_far == 0, (n_far, offs.max())
    assert near >= 0.9, near
