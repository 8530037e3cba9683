"""Synthetic mini-dataset in the reference's exact on-disk layout.

Generates a BigFile + video2frames.txt + caption files + the three HDF5
feature files, with planted cross-modal structure (videos and their captions
share a latent) so end-to-end training measurably improves retrieval. Used
by tests and by bench.py — the real TVR/ActivityNet/Charades features are
not redistributable.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from dldkd_tpu.data.bigfile import BigFileWriter


def generate_dataset(
    root: str,
    collection: str = "synthetic",
    visual_feature: str = "i3d",
    n_videos: dict | None = None,
    caps_per_video: tuple = (2, 5),
    caps_sequence: dict | None = None,
    frames_range: tuple = (20, 200),
    teacher_frames_range: tuple = (8, 64),
    tokens_range: tuple = (5, 30),
    d_student: int = 64,
    d_query: int = 48,
    d_teacher: int = 32,
    d_latent: int = 16,
    noise: float = 0.6,
    seed: int = 0,
) -> str:
    """Write the dataset under root/collection; returns the collection dir.

    caps_sequence: optional {split: [count, ...]} giving video v exactly
    caps_sequence[split][v] captions. Distinct counts make the
    #captions-desc collate sort (reference data_provider.py:117) a total
    order, so trajectory-parity tests are immune to shuffle order.
    """
    import h5py

    n_videos = n_videos or {"train": 40, "val": 16, "test": 16}
    rng = np.random.RandomState(seed)
    base = os.path.join(root, collection)
    feat_dir = os.path.join(base, "FeatureData", visual_feature)
    text_dir = os.path.join(base, "TextData")
    os.makedirs(feat_dir, exist_ok=True)
    os.makedirs(text_dir, exist_ok=True)

    w_student = rng.randn(d_latent, d_student) / np.sqrt(d_latent)
    w_query = rng.randn(d_latent, d_query) / np.sqrt(d_latent)
    w_teacher = rng.randn(d_latent, d_teacher) / np.sqrt(d_latent)

    video2frames = {}
    tv_path = os.path.join(
        base, "FeatureData", f"new_clip_vit_32_{collection}_vid_features.hdf5")
    tq_path = os.path.join(
        text_dir, f"clip_ViT_B_32_{collection}_query_feat.hdf5")
    q_path = os.path.join(text_dir, f"roberta_{collection}_query_feat.hdf5")

    with BigFileWriter(feat_dir, d_student) as bf, \
            h5py.File(tv_path, "w") as tv, \
            h5py.File(tq_path, "w") as tq, \
            h5py.File(q_path, "w") as qf:
        for split, n_vid in n_videos.items():
            lines = []
            for v in range(n_vid):
                vid = f"{collection}_{split}_v{v:04d}"
                z = rng.randn(d_latent)
                n_frames = rng.randint(*frames_range)
                frame_ids = []
                for t in range(n_frames):
                    fid = f"{vid}_{t}"
                    frame_ids.append(fid)
                    vec = z @ w_student + noise * rng.randn(d_student)
                    bf.write(fid, vec.astype(np.float32))
                video2frames[vid] = frame_ids

                n_tf = rng.randint(*teacher_frames_range)
                t_frames = (np.tile(z, (n_tf, 1)) @ w_teacher
                            + noise * rng.randn(n_tf, d_teacher))
                tv.create_dataset(vid, data=t_frames.astype(np.float32))

                if caps_sequence and split in caps_sequence:
                    n_caps = caps_sequence[split][v]
                else:
                    n_caps = rng.randint(caps_per_video[0],
                                         caps_per_video[1] + 1)
                for j in range(n_caps):
                    cap_id = f"{vid}#enc#{j}"
                    lines.append(f"{cap_id} synthetic caption {v} {j}")
                    n_tok = rng.randint(*tokens_range)
                    toks = (np.tile(z, (n_tok, 1)) @ w_query
                            + noise * rng.randn(n_tok, d_query))
                    qf.create_dataset(cap_id, data=toks.astype(np.float32))
                    sent = z @ w_teacher + noise * rng.randn(d_teacher)
                    # teacher text keyed WITHOUT '#enc#' for some caps, to
                    # exercise the reference's key-fallback path
                    key = cap_id if (v + j) % 3 else "#".join(cap_id.split("#enc#"))
                    tq.create_dataset(key, data=sent[None].astype(np.float32))
            with open(os.path.join(text_dir,
                                   f"{collection}{split}.caption.txt"), "w") as f:
                f.write("\n".join(lines) + "\n")

    with open(os.path.join(feat_dir, "video2frames.txt"), "w") as f:
        f.write(repr(video2frames))
    return base
