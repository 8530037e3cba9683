"""Teacher feature extraction (reference L8, method/test.py) — hermetic:
the CLIP encoders are injected fakes; a tiny random FlaxCLIPModel exercises
the real transformers wiring without pretrained weights or network."""

import os

import h5py
import numpy as np
import pytest

from dldkd_tpu.tools.extract_teacher import (
    extract_query_features,
    extract_video_features,
    iter_video_frames,
)


@pytest.fixture()
def cap_file(tmp_path):
    p = tmp_path / "synthtrain.caption.txt"
    lines = [f"v{i}#enc#{j} a caption about video {i} part {j}"
             for i in range(4) for j in range(2)]
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def _fake_tokenize(texts):
    return {"lengths": np.asarray([len(t) for t in texts], np.float32)}


def _fake_encode_text(inputs):
    # deterministic per-caption embedding derived from its length
    le = inputs["lengths"][:, None]
    return np.concatenate([le, le * 2, le * 3], axis=1)


def test_extract_query_features_layout(cap_file, tmp_path):
    out = str(tmp_path / "q.hdf5")
    n = extract_query_features(cap_file, out, _fake_tokenize,
                               _fake_encode_text, bsz=3)
    assert n == 8
    with h5py.File(out) as f:
        assert set(f.keys()) == {f"v{i}#enc#{j}"
                                 for i in range(4) for j in range(2)}
        v = np.asarray(f["v0#enc#0"])
        assert v.shape == (3,) and v.dtype == np.float32


def test_extract_video_features_from_npy(tmp_path):
    rng = np.random.RandomState(0)
    froot = tmp_path / "frames"
    os.makedirs(froot)
    lens = {"vidA": 5, "vidB": 9}
    for vid, t in lens.items():
        np.save(froot / f"{vid}.npy",
                rng.randint(0, 255, (t, 8, 8, 3), dtype=np.uint8))

    def preprocess(frames):
        return {"x": frames.astype(np.float32)}

    def encode(inputs):
        return inputs["x"].mean(axis=(1, 2))  # (B, 3)

    out = str(tmp_path / "v.hdf5")
    n = extract_video_features(list(lens), str(froot), out, preprocess,
                               encode, bsz=4)
    assert n == 2
    with h5py.File(out) as f:
        for vid, t in lens.items():
            assert f[vid].shape == (t, 3)


def test_iter_video_frames_subsampling(tmp_path):
    np.save(tmp_path / "v.npy", np.zeros((100, 4, 4, 3), np.uint8))
    (_, frames), = iter_video_frames(["v"], str(tmp_path), max_frames=16)
    assert frames.shape == (16, 4, 4, 3)


def test_real_flax_clip_wiring(cap_file, tmp_path):
    """Tiny random CLIP through the real transformers Flax path (text side;
    tokenizer is bypassed — vocab files need a real checkout)."""
    transformers = pytest.importorskip("transformers")
    from transformers import CLIPConfig, FlaxCLIPModel

    cfg = CLIPConfig(
        text_config={"hidden_size": 8, "intermediate_size": 16,
                     "num_hidden_layers": 1, "num_attention_heads": 2,
                     "max_position_embeddings": 16, "vocab_size": 99},
        vision_config={"hidden_size": 8, "intermediate_size": 16,
                       "num_hidden_layers": 1, "num_attention_heads": 2,
                       "image_size": 16, "patch_size": 8},
        projection_dim=6)
    model = FlaxCLIPModel(cfg, seed=0)

    def tokenize(texts):
        ids = np.zeros((len(texts), 16), np.int32)
        for i, t in enumerate(texts):
            toks = [hash(w) % 98 + 1 for w in t.split()][:16]
            ids[i, :len(toks)] = toks
        return {"input_ids": ids,
                "attention_mask": (ids != 0).astype(np.int32)}

    def encode(inputs):
        return model.get_text_features(
            input_ids=inputs["input_ids"],
            attention_mask=inputs["attention_mask"])

    out = str(tmp_path / "real.hdf5")
    n = extract_query_features(cap_file, out, tokenize, encode, bsz=5)
    assert n == 8
    with h5py.File(out) as f:
        assert np.asarray(f["v3#enc#1"]).shape == (6,)
