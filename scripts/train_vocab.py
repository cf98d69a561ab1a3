"""Train the bundled 10^4-word BoW vocabulary (k=10, depth=4) from ORB
descriptors of a diverse synthetic image set, with TRUE per-image idf
weights (DBoW2 setNodeWeights semantics). Writes assets/vocab_10k.npz.

The reference ships a ~10^6-word ORBvoc (k=10, L=6) trained on real
images; that asset is a missing large blob in this mirror
(.MISSING_LARGE_BLOBS:2) and the environment has no egress, so this is
the largest vocabulary trainable here. load_orbslam_txt accepts the
real file when available.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("XLA_FLAGS", "")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from splslam_tpu.io.synthetic import make_stereo_sequence, make_texture, PlaneScene
from splslam_tpu.ops.orb import extract_orb
from splslam_tpu.ops.pyramid import PyramidSpec


def main():
    W, H = 320, 240
    spec = PyramidSpec.create(H, W, n_features=800, n_levels=4,
                              scale_factor=1.2)
    descs, img_ids = [], []
    img_id = 0
    for seed in range(12):
        K, bf, frames, gt = make_stereo_sequence(
            n_frames=10, width=W, height=H, motion=("forward", "lateral",
            "arc")[seed % 3], seed=seed)
        for (l, r) in frames:
            f = extract_orb(jnp.asarray(l, jnp.float32), spec)
            v = np.asarray(f.valid)
            d = np.asarray(f.desc)[v]
            descs.append(d)
            img_ids.append(np.full(len(d), img_id))
            img_id += 1
        print(f"seed {seed}: {img_id} images, "
              f"{sum(len(d) for d in descs)} descriptors", flush=True)
    D = np.concatenate(descs)
    I = np.concatenate(img_ids)
    print(f"training on {len(D)} descriptors from {img_id} images",
          flush=True)
    from splslam_tpu.bow import vocabulary as V

    voc = V.train(D, k=10, depth=4, seed=0, image_ids=I)
    out = os.path.join(os.path.dirname(__file__), "..", "splslam_tpu",
                       "assets", "vocab_10k.npz")
    V.save(voc, out)
    nz = int((np.asarray(voc.weights) > 0).sum())
    print(f"saved {out}: {voc.n_words} words, {nz} with nonzero idf",
          flush=True)


if __name__ == "__main__":
    main()
