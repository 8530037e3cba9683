"""Offline teacher (CLIP) feature extraction — reference L8.

The reference's method/test.py (test.py:11-88) runs OpenAI CLIP ViT-B/32
over every caption (`get_query_feat`) and over sampled video frames
(`get_vid_feat`), writing the two HDF5 files the data layer reads:

  TextData/clip_ViT_B_32_{collection}_query_feat.hdf5   cap_id -> (Dt,)
  FeatureData/new_clip_vit_32_{collection}_vid_features.hdf5
                                                        video_id -> (T, Dt)

This TPU-native equivalent drives a Flax CLIP (transformers FlaxCLIPModel,
jitted, batched) instead of torch CLIP on CPU. Raw video decoding is out of
scope on a TPU host (and cv2 is not in this image, reference test.py:3):
video input is either a per-video directory of frame images
(frames_root/<video_id>/*.jpg, PIL-decoded) or a preextracted
<video_id>.npy uint8 stack (T, H, W, 3).

The compute core is injected as two callables (tokenize_fn, encode_fn) so
it is testable without pretrained weights; `build_clip_fns` wires real
transformers objects from a LOCAL model directory (no network).
"""

from __future__ import annotations

import argparse
import os
import re
from typing import Callable, Dict, Iterable, List, Sequence, Tuple

import numpy as np

from dldkd_tpu.data.ingest import load_captions


def _batched(seq: Sequence, bsz: int):
    for i in range(0, len(seq), bsz):
        yield seq[i:i + bsz]


def extract_query_features(
    cap_file: str,
    out_h5: str,
    tokenize_fn: Callable[[List[str]], dict],
    encode_text_fn: Callable[[dict], np.ndarray],
    bsz: int = 256,
) -> int:
    """Write cap_id -> CLIP sentence embedding (reference test.py:11-34).

    tokenize_fn: captions -> model inputs (dict of arrays, padded).
    encode_text_fn: model inputs -> (B, Dt) float32.
    Returns the number of captions written.
    """
    import h5py

    cap_ids, captions, _, _ = load_captions(cap_file)
    os.makedirs(os.path.dirname(out_h5) or ".", exist_ok=True)
    n = 0
    with h5py.File(out_h5, "w") as f:
        for chunk in _batched(cap_ids, bsz):
            feats = np.asarray(
                encode_text_fn(tokenize_fn([captions[c] for c in chunk])),
                np.float32)
            for cap_id, vec in zip(chunk, feats):
                f.create_dataset(cap_id, data=vec)
                n += 1
    return n


def iter_video_frames(
    video_ids: Iterable[str],
    frames_root: str,
    max_frames: int = 0,
) -> Iterable[Tuple[str, np.ndarray]]:
    """Yield (video_id, (T, H, W, 3) uint8) from frame-image dirs or .npy
    stacks (replaces the reference's cv2 capture loop, test.py:47-66)."""
    for vid in video_ids:
        npy = os.path.join(frames_root, f"{vid}.npy")
        d = os.path.join(frames_root, vid)
        if os.path.exists(npy):
            frames = np.load(npy)
        elif os.path.isdir(d):
            from PIL import Image

            exts = (".jpg", ".jpeg", ".png", ".bmp", ".webp")
            names = [n for n in os.listdir(d) if n.lower().endswith(exts)]
            # natural-numeric order: frame_2 before frame_10 (lexicographic
            # sort would temporally scramble non-zero-padded names)
            names.sort(key=lambda n: [int(t) if t.isdigit() else t
                                      for t in re.split(r"(\d+)", n)])
            imgs = [np.asarray(Image.open(os.path.join(d, n)).convert("RGB"))
                    for n in names]
            if not imgs:
                continue
            frames = np.stack(imgs)
        else:
            raise FileNotFoundError(f"no frames for {vid} under {frames_root}")
        if max_frames and frames.shape[0] > max_frames:
            idx = np.linspace(0, frames.shape[0] - 1, max_frames).astype(int)
            frames = frames[idx]
        yield vid, frames.astype(np.uint8)


def extract_video_features(
    video_ids: Sequence[str],
    frames_root: str,
    out_h5: str,
    preprocess_fn: Callable[[np.ndarray], dict],
    encode_image_fn: Callable[[dict], np.ndarray],
    bsz: int = 64,
    max_frames: int = 0,
) -> int:
    """Write video_id -> (T, Dt) per-frame CLIP embeddings
    (reference test.py:36-88). Returns the number of videos written."""
    import h5py

    os.makedirs(os.path.dirname(out_h5) or ".", exist_ok=True)
    n = 0
    with h5py.File(out_h5, "w") as f:
        for vid, frames in iter_video_frames(video_ids, frames_root,
                                             max_frames):
            rows = []
            for chunk in _batched(frames, bsz):
                rows.append(np.asarray(
                    encode_image_fn(preprocess_fn(np.asarray(chunk))),
                    np.float32))
            f.create_dataset(vid, data=np.concatenate(rows))
            n += 1
    return n


def build_tokenize_fn() -> Callable[[List[str]], dict]:
    """Default tokenizer: the in-repo CLIP BPE implementation
    (tools/clip_tokenizer.py + assets/bpe_simple_vocab_16e6.txt.gz) —
    no external tokenizer assets needed."""
    from dldkd_tpu.tools.clip_tokenizer import ClipTokenizer

    tok = ClipTokenizer()
    return lambda texts: tok.tokenize(texts)


def build_clip_fns(model_dir: str,
                   use_hf_tokenizer: bool = False) -> Dict[str, Callable]:
    """Wire transformers Flax CLIP from a LOCAL directory (weights are never
    downloaded — this host has no egress). Returns tokenize / encode_text /
    preprocess / encode_image callables, with the encodes jitted.
    Tokenization defaults to the in-repo BPE (build_tokenize_fn); pass
    use_hf_tokenizer=True to use the HF tokenizer from model_dir instead."""
    import jax
    from transformers import AutoImageProcessor, FlaxCLIPModel

    model = FlaxCLIPModel.from_pretrained(model_dir, local_files_only=True)
    processor = AutoImageProcessor.from_pretrained(model_dir,
                                                   local_files_only=True)

    @jax.jit
    def _text(input_ids, attention_mask):
        return model.get_text_features(input_ids=input_ids,
                                       attention_mask=attention_mask)

    @jax.jit
    def _image(pixel_values):
        return model.get_image_features(pixel_values=pixel_values)

    if use_hf_tokenizer:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(model_dir,
                                                  local_files_only=True)

        def tokenize_fn(texts):
            enc = tokenizer(texts, padding="max_length", truncation=True,
                            max_length=77, return_tensors="np")
            return {"input_ids": enc["input_ids"],
                    "attention_mask": enc["attention_mask"]}
    else:
        tokenize_fn = build_tokenize_fn()

    def encode_text_fn(inputs):
        return _text(inputs["input_ids"], inputs["attention_mask"])

    def preprocess_fn(frames):
        return {"pixel_values": processor(
            images=list(frames), return_tensors="np")["pixel_values"]}

    def encode_image_fn(inputs):
        return _image(inputs["pixel_values"])

    return {"tokenize": tokenize_fn, "encode_text": encode_text_fn,
            "preprocess": preprocess_fn, "encode_image": encode_image_fn}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", choices=["text", "video"], required=True)
    p.add_argument("--collection", required=True)
    p.add_argument("--root_path", required=True)
    p.add_argument("--split", default="train",
                   choices=["train", "val", "test"])
    p.add_argument("--clip_model", required=True,
                   help="local HF CLIP dir (e.g. a clip-vit-base-patch32 "
                        "checkout)")
    p.add_argument("--frames_root", default=None,
                   help="dir of <video_id>/ frame images or <video_id>.npy")
    p.add_argument("--bsz", type=int, default=256)
    p.add_argument("--max_frames", type=int, default=0)
    p.add_argument("--hf_tokenizer", action="store_true",
                   help="tokenize with the HF tokenizer from --clip_model "
                        "instead of the in-repo CLIP BPE")
    args = p.parse_args(argv)

    base = os.path.join(args.root_path, args.collection)
    cap_file = os.path.join(
        base, "TextData", f"{args.collection}{args.split}.caption.txt")
    fns = build_clip_fns(args.clip_model, use_hf_tokenizer=args.hf_tokenizer)

    if args.mode == "text":
        out = os.path.join(
            base, "TextData",
            f"clip_ViT_B_32_{args.collection}_query_feat.hdf5")
        n = extract_query_features(cap_file, out, fns["tokenize"],
                                   fns["encode_text"], args.bsz)
        print(f"wrote {n} caption features -> {out}")
    else:
        if not args.frames_root:
            p.error("--frames_root is required for --mode video")
        from dldkd_tpu.data.ingest import read_video_ids

        out = os.path.join(
            base, "FeatureData",
            f"new_clip_vit_32_{args.collection}_vid_features.hdf5")
        n = extract_video_features(read_video_ids(cap_file),
                                   args.frames_root, out, fns["preprocess"],
                                   fns["encode_image"], args.bsz,
                                   args.max_frames)
        print(f"wrote {n} video features -> {out}")


if __name__ == "__main__":
    main()
