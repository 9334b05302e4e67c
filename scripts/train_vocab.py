"""Train the baked place-recognition vocabulary (codebook + idf).

Offline equivalent of DBoW2's vocabulary training (the reference ships a
pre-trained 140 MB ORBvoc.txt, README.md:90; TemplatedVocabulary TF_IDF
weighting Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h:56). Here:

  1. render several synthetic sequences (the environment's stand-in for
     the Aqualoc domain — zero egress, SURVEY §7 "hard parts"),
  2. extract ORB descriptors per frame with the production frontend,
  3. binary k-means -> flat codebook (vocab.train_codebook),
  4. idf from per-frame document frequencies:
     idf_w = ln(N_docs / (1 + df_w)),
  5. save to uvipslam_tpu/loop/vocab_data.npz (loaded by loop.reloc at
     import; ~300 KB, committed to the repo).

Run on CPU:  python scripts/train_vocab.py [--words 1024]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def collect_descriptors(n_seqs: int = 6, frames_per_seq: int = 12):
    from uvipslam_tpu.frontend.frame import Tracks, refill_tracks, refresh_descriptors
    from uvipslam_tpu.io.synthetic import make_sequence

    all_desc = []
    docs = []   # per-frame descriptor blocks (documents for idf)
    for s in range(n_seqs):
        seq = make_sequence(
            n_frames=frames_per_seq * 3, H=240, W=320, n_points=3000,
            seed=100 + s, motion=["arc", "excited", "loop"][s % 3],
            speed=1.0 + 0.3 * s,
        )
        for f in range(0, frames_per_seq * 3, 3):
            t = refill_tracks(Tracks.empty(400),
                              jnp.asarray(seq.images[f], jnp.float32),
                              jnp.asarray(f, jnp.int32), n_features=400)
            t = refresh_descriptors(t, jnp.asarray(seq.images[f], jnp.float32))
            d = np.asarray(t.desc)[np.asarray(t.valid)]
            if len(d):
                all_desc.append(d)
                docs.append(d)
        print(f"seq {s}: {sum(len(d) for d in all_desc)} descriptors total",
              flush=True)
    return np.concatenate(all_desc, 0), docs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--words", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--max-desc", type=int, default=60000)
    args = ap.parse_args()

    from uvipslam_tpu.loop.vocab import train_codebook

    descs, docs = collect_descriptors()
    rs = np.random.RandomState(0)
    if len(descs) > args.max_desc:
        descs = descs[rs.choice(len(descs), args.max_desc, replace=False)]
    print(f"training {args.words}-word codebook on {len(descs)} descriptors")
    cb = train_codebook(descs, n_words=args.words, n_iters=args.iters)

    # idf over per-frame documents
    cbf = (2.0 * cb.astype(np.float32) - 1.0)
    df = np.zeros(args.words, np.int64)
    for d in docs:
        D = (256 - (2.0 * d.astype(np.float32) - 1.0) @ cbf.T) / 2
        words = np.unique(D.argmin(1))
        df[words] += 1
    idf = np.log(len(docs) / (1.0 + df)).astype(np.float32)
    # never negative (a word in every doc carries no information, not
    # negative information after L1 normalization)
    idf = np.maximum(idf, 1e-3)

    out = os.path.join(os.path.dirname(__file__), "..",
                       "uvipslam_tpu", "loop", "vocab_data.npz")
    np.savez_compressed(out, codebook=cb.astype(np.int8), idf=idf)
    print(f"saved {out}: codebook {cb.shape}, idf range "
          f"[{idf.min():.3f}, {idf.max():.3f}], "
          f"words-used {int((df > 0).sum())}/{args.words}")


if __name__ == "__main__":
    main()
