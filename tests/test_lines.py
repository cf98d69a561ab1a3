"""Line detector + LBD descriptor tests (ops/lines.py) — recall on known
synthetic segments, multi-octave recovery of coarse structure
(reference Lineextractor per-octave detection, src/Lineextractor.cc:
119-181, 413-441), and descriptor matchability across views."""

import numpy as np
import jax.numpy as jnp

from splslam_tpu.ops.lines import extract_lines


def _render_segments(segs, H=240, W=320, thickness=2, contrast=120.0,
                     noise=3.0, seed=0, blur=0, texture_seed=None,
                     texture_contrast=25.0, shift=(0, 0)):
    """White background, dark anti-aliased segments [(x1,y1,x2,y2), ...].

    With texture_seed set, a fixed smooth random texture is blended into
    the background, translated by `shift` px (a real surface translates
    with the scene): re-rendering with a different `seed` then models a
    real camera pair — surface texture shared, SENSOR noise fresh."""
    rng = np.random.default_rng(seed)
    img = np.full((H, W), 200.0, np.float32)
    if texture_seed is not None:
        trng = np.random.default_rng(texture_seed)
        coarse = trng.normal(0, 1.0, (H // 8 + 6, W // 8 + 6))
        yy8 = (np.mgrid[0:H, 0:W][0] - shift[1] + 16.0) / 8.0
        xx8 = (np.mgrid[0:H, 0:W][1] - shift[0] + 16.0) / 8.0
        y0 = yy8.astype(int); x0 = xx8.astype(int)
        fy = yy8 - y0; fx = xx8 - x0
        tex = (coarse[y0, x0] * (1 - fx) * (1 - fy)
               + coarse[y0, x0 + 1] * fx * (1 - fy)
               + coarse[y0 + 1, x0] * (1 - fx) * fy
               + coarse[y0 + 1, x0 + 1] * fx * fy)
        img += texture_contrast * tex.astype(np.float32)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    for (x1, y1, x2, y2) in segs:
        dx, dy = x2 - x1, y2 - y1
        ln = max(np.hypot(dx, dy), 1e-6)
        t = ((xx - x1) * dx + (yy - y1) * dy) / (ln * ln)
        t = np.clip(t, 0, 1)
        px, py = x1 + t * dx, y1 + t * dy
        d = np.hypot(xx - px, yy - py)
        img -= contrast * np.clip(thickness / 2 + 0.5 - d, 0, 1)
    img += rng.normal(0, noise, img.shape)
    if blur:
        from scipy.ndimage import gaussian_filter
        img = gaussian_filter(img, blur)
    return np.clip(img, 0, 255).astype(np.float32)


def _recall(segs_gt, feat, tol_perp=4.0, min_cover=0.5):
    """Fraction of GT segments matched by a detection that is collinear
    (within tol_perp of both GT endpoints) and covers >= min_cover."""
    seg = np.asarray(feat.seg)
    valid = np.asarray(feat.valid)
    hits = 0
    for (x1, y1, x2, y2) in segs_gt:
        g1 = np.array([x1, y1]); g2 = np.array([x2, y2])
        glen = np.linalg.norm(g2 - g1)
        found = False
        for s, ok in zip(seg, valid):
            if not ok:
                continue
            a, b = s[:2], s[2:]
            d = b - a
            ln = np.linalg.norm(d)
            if ln < 0.3 * glen:
                continue
            n = np.array([-d[1], d[0]]) / max(ln, 1e-6)
            if abs(np.dot(g1 - a, n)) < tol_perp and \
               abs(np.dot(g2 - a, n)) < tol_perp and ln >= min_cover * glen:
                found = True
                break
        if found:
            hits += 1
    return hits / len(segs_gt)


SEGS = [
    (40.0, 30.0, 280.0, 45.0),
    (60.0, 200.0, 250.0, 120.0),
    (30.0, 60.0, 50.0, 220.0),
    (150.0, 20.0, 160.0, 230.0),
    (200.0, 180.0, 310.0, 200.0),
]


def test_detector_recall_sharp_lines():
    img = _render_segments(SEGS)
    feat = extract_lines(jnp.asarray(img), capacity=64)
    assert _recall(SEGS, feat) >= 0.8


def test_multi_octave_recovers_blurred_lines():
    """A heavily blurred low-contrast image: full-resolution gradients are
    weak/noisy, the half-resolution octave still sees the structure —
    multi-octave detection must beat single-octave recall."""
    img = _render_segments(SEGS, thickness=6, contrast=35.0, noise=6.0,
                           blur=3)
    f1 = extract_lines(jnp.asarray(img), capacity=64, n_octaves=1)
    f2 = extract_lines(jnp.asarray(img), capacity=64, n_octaves=2)
    r1 = _recall(SEGS, f1, tol_perp=6.0)
    r2 = _recall(SEGS, f2, tol_perp=6.0)
    assert r2 >= r1, (r1, r2)
    assert r2 >= 0.6, (r1, r2)


def test_lbd_descriptor_matches_across_shift():
    """The same physical lines viewed with a small translation and FRESH
    sensor noise must match by Hamming distance. The background carries a
    shared smooth texture (translated with the segments, as any real
    surface would be): descriptor discrimination has to come from real
    content that survives noise decorrelation, not from hashing the noise
    field itself — the earlier white-background variant of this fixture
    rewarded exactly that hashing, which made descriptors brittle to
    sub-pixel detection jitter on real shared-content frames (see
    test_lbd_matches_on_true_camera_shift for the shared-noise case)."""
    from splslam_tpu.ops.match import hamming_matrix

    img1 = _render_segments(SEGS, seed=1, texture_seed=11)
    segs2 = [(x1 + 4, y1 + 3, x2 + 4, y2 + 3) for (x1, y1, x2, y2) in SEGS]
    img2 = _render_segments(segs2, seed=2, texture_seed=11, shift=(4, 3))
    f1 = extract_lines(jnp.asarray(img1), capacity=64)
    f2 = extract_lines(jnp.asarray(img2), capacity=64)
    v1 = np.asarray(f1.valid); v2 = np.asarray(f2.valid)
    d = np.asarray(hamming_matrix(f1.desc, f2.desc)).astype(float)
    d[~v1] = 1e9
    d[:, ~v2] = 1e9
    # for each valid detection in img1, its best match in img2 should be
    # the (nearly identical) shifted copy: verify geometric agreement of
    # mutual best pairs
    # A correct match is COLLINEAR with the shifted copy (midpoints can
    # slide along the line when the recovered extents differ, so gate on
    # perpendicular distance to the matched segment's line).
    # Score descriptor RANKING conditioned on detection: for each frame-1
    # line whose geometric counterpart exists among frame-2 detections
    # (collinear within 5 px after the known shift), its Hamming nearest
    # neighbour must be that counterpart. Rows with no detected
    # counterpart are excluded — their NN is necessarily a false pair and
    # measures detection repeatability (covered by
    # test_line_repeatability.py), not the descriptor.
    s1 = np.asarray(f1.seg); s2 = np.asarray(f2.seg)

    def _collinear(i, j):
        a, b = s2[j, :2], s2[j, 2:]
        dv = b - a
        n = np.array([-dv[1], dv[0]]) / max(np.linalg.norm(dv), 1e-6)
        p1 = s1[i, :2] + np.array([4, 3])
        p2 = s1[i, 2:] + np.array([4, 3])
        return abs(np.dot(p1 - a, n)) < 5.0 and abs(np.dot(p2 - a, n)) < 5.0

    good = 0; tot = 0
    for i in range(len(v1)):
        if not v1[i]:
            continue
        if not any(_collinear(i, j) for j in np.nonzero(v2)[0]):
            continue                      # counterpart not detected
        tot += 1
        j = int(np.argmin(d[i]))
        if d[i, j] <= 80 and _collinear(i, j):
            good += 1
    assert tot >= 3
    assert good / tot >= 0.7, (good, tot)


def test_lbd_matches_on_true_camera_shift():
    """The physically faithful shift: ONE rendered canvas (segments +
    noise), two crops offset by (4,3) — identical content translated, as
    a camera translation produces (unlike the re-rendered-noise test
    above, where the background decorrelates and matching leans on the
    stroke profile alone). LBD must re-match nearly every detection."""
    from splslam_tpu.ops.match import hamming_matrix

    H, W, ox, oy = 240, 320, 4, 3
    segs = [(x1 + ox, y1 + oy, x2 + ox, y2 + oy) for (x1, y1, x2, y2) in SEGS]
    canvas = _render_segments(segs, H=H + 2 * oy, W=W + 2 * ox, seed=7)
    img1 = canvas[:H, :W]                      # segments at SEGS + (4,3)
    img2 = canvas[oy:oy + H, ox:ox + W]        # segments at SEGS
    f1 = extract_lines(jnp.asarray(img1), capacity=64)
    f2 = extract_lines(jnp.asarray(img2), capacity=64)
    v1 = np.asarray(f1.valid); v2 = np.asarray(f2.valid)
    d = np.asarray(hamming_matrix(f1.desc, f2.desc)).astype(float)
    d[~v1] = 1e9
    d[:, ~v2] = 1e9
    s1 = np.asarray(f1.seg); s2 = np.asarray(f2.seg)
    good = 0; tot = 0
    for i in range(len(v1)):
        if not v1[i]:
            continue
        j = int(np.argmin(d[i]))
        if d[i, j] > 80:
            continue
        tot += 1
        a, b = s2[j, :2], s2[j, 2:]
        dv = b - a
        n = np.array([-dv[1], dv[0]]) / max(np.linalg.norm(dv), 1e-6)
        p1 = s1[i, :2] - np.array([ox, oy])
        p2 = s1[i, 2:] - np.array([ox, oy])
        if abs(np.dot(p1 - a, n)) < 5.0 and abs(np.dot(p2 - a, n)) < 5.0:
            good += 1
    assert tot >= 4, (tot, int(v1.sum()), int(v2.sum()))
    assert good / tot >= 0.8, (good, tot)


def test_fld_backend_recall_and_thin_seeding():
    """The FLD-style backend (Canny-NMS edge seeding, reference
    include/Lineextractor.h:54-57 busingLSD=false) must recover the
    same sharp synthetic segments as the grow backend."""
    segs = [(40, 40, 280, 60), (60, 200, 240, 120), (160, 20, 170, 220)]
    img = _render_segments(segs)
    feat = extract_lines(jnp.asarray(img), capacity=64, backend="fld")
    assert _recall(segs, feat) >= 2 / 3
