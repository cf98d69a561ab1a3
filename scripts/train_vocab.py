"""Train the bundled BoW vocabularies from ORB descriptors of a diverse
synthetic image set, with TRUE per-image idf weights (DBoW2
setNodeWeights semantics).

  python scripts/train_vocab.py           # 10^5 words (k=10, depth=5)
  python scripts/train_vocab.py --small   # 10^4 words (k=10, depth=4)

The reference ships a ~10^6-word ORBvoc (k=10, L=6) trained on real
images; that asset is a missing large blob in this mirror
(.MISSING_LARGE_BLOBS:2) and the environment has no egress, so these are
the largest vocabularies trainable here. load_orbslam_txt accepts the
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

from splslam_tpu.io.synthetic import make_stereo_sequence
from splslam_tpu.ops.orb import extract_orb
from splslam_tpu.ops.pyramid import PyramidSpec


def collect(n_seeds: int, frames_per_seq: int, W: int, H: int,
            n_features: int):
    """Descriptors + image ids from varied textures/motions/scales."""
    spec = PyramidSpec.create(H, W, n_features=n_features, n_levels=4,
                              scale_factor=1.2)
    descs, img_ids = [], []
    img_id = 0
    for seed in range(n_seeds):
        K, bf, frames, gt = make_stereo_sequence(
            n_frames=frames_per_seq, width=W, height=H,
            motion=("forward", "lateral", "arc")[seed % 3],
            seed=seed,
            texture="grid" if seed % 4 == 3 else "blobs",
            scene="corridor" if seed % 5 == 4 else "planes",
        )
        for (l, r) in frames:
            for img in (l, r) if seed % 2 == 0 else (l,):
                f = extract_orb(jnp.asarray(img, jnp.float32), spec)
                v = np.asarray(f.valid)
                d = np.asarray(f.desc)[v]
                descs.append(d)
                img_ids.append(np.full(len(d), img_id))
                img_id += 1
        total = sum(len(d) for d in descs)
        print(f"seed {seed}: {img_id} images, {total} descriptors",
              flush=True)
    return np.concatenate(descs), np.concatenate(img_ids), img_id


def main():
    from splslam_tpu.bow import vocabulary as V

    small = "--small" in sys.argv
    if small:
        D, I, n_img = collect(12, 10, 320, 240, 800)
        depth, name = 4, "vocab_10k.npz"
    else:
        # ~500k descriptors from ~480 images across 24 scene seeds,
        # grid-line textures mixed in, both stereo eyes on even seeds.
        D, I, n_img = collect(24, 12, 512, 384, 1400)
        depth, name = 5, "vocab_100k.npz"
    print(f"training k=10 depth={depth} on {len(D)} descriptors "
          f"from {n_img} images", flush=True)
    voc = V.train(D, k=10, depth=depth, seed=0, image_ids=I, verbose=True)
    out = os.path.join(os.path.dirname(__file__), "..", "splslam_tpu",
                       "assets", name)
    V.save(voc, out)
    nz = int((np.asarray(voc.weights) > 0).sum())
    print(f"saved {out}: {voc.n_words} words, {nz} with nonzero idf",
          flush=True)


if __name__ == "__main__":
    main()
