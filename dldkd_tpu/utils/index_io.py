"""On-disk serving-index persistence: build once offline, load in serving.

The reference has no serving story at all (its eval.py recomputes the
corpus embedding in every process); the TPU-native serving flow builds a
device-resident index once (serving.Retriever.index) and searches it many
times. This module makes that build a durable artifact: save_index()
writes the device arrays + a manifest, load_index() restores them into a
fresh process — so a serving replica skips BOTH the raw-corpus upload
(1.1 GB f32 at TVR scale vs 0.5 GB bf16 frames / 0.2 GB int8 index) and
the corpus encode entirely.

Format: one directory per index — `meta.json` (format version, store
mode, logical dtypes, video ids, model-config repr, params fingerprint)
plus one `.npy` per array. bfloat16 has no numpy dtype on disk, so bf16
arrays are stored as uint16 bit patterns and re-viewed on load. The
params fingerprint binds the index to the exact weights that encoded it:
loading an index under different params would silently serve wrong
results, so a mismatch raises unless the caller explicitly overrides.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any, Dict

import numpy as np

INDEX_FORMAT_VERSION = 2  # v2: q8 artifacts store canonical (Nv, L_p, D)
                          # rows + mask (device-count-independent) instead
                          # of the built index layout
META_NAME = "meta.json"


def params_fingerprint(params) -> str:
    """Content hash of every param leaf (shape, dtype, bytes) in the
    tree's deterministic traversal order."""
    import jax

    h = hashlib.sha256()
    for leaf in jax.tree.leaves(params):
        arr = np.asarray(leaf)
        h.update(str(arr.shape).encode())
        h.update(str(arr.dtype).encode())
        h.update(arr.tobytes())
    return h.hexdigest()[:24]


def save_array(dirpath: str, name: str, arr, manifest: Dict[str, str]
               ) -> None:
    """np.save one (possibly device/global) array; bf16 stored as uint16
    bit patterns with the logical dtype recorded in the manifest."""
    x = np.asarray(arr)
    logical = str(x.dtype)
    if logical == "bfloat16":
        x = x.view(np.uint16)
    np.save(os.path.join(dirpath, name + ".npy"), x)
    manifest[name] = logical


def load_array(dirpath: str, name: str, logical: str) -> np.ndarray:
    x = np.load(os.path.join(dirpath, name + ".npy"))
    if logical == "bfloat16":
        import ml_dtypes

        x = x.view(ml_dtypes.bfloat16)
    return x


def write_meta(dirpath: str, meta: Dict[str, Any]) -> None:
    meta = dict(meta, format=INDEX_FORMAT_VERSION)
    tmp = os.path.join(dirpath, META_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(dirpath, META_NAME))  # atomic publish


def publish_dir(staging: str, dst: str) -> None:
    """Swap a fully-written staging directory into place as the artifact.
    Writing arrays straight into an EXISTING artifact would overwrite the
    .npy files in place under the old meta.json — a crash mid-save then
    leaves new-weight arrays bound to the old params fingerprint, exactly
    the wrong-results case the fingerprint exists to refuse. Renames make
    every observable state a complete artifact (old or new), never a mix;
    the brief window where dst is absent surfaces as a clean load error."""
    import shutil

    old = dst + ".old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.isdir(dst):
        os.rename(dst, old)
    os.rename(staging, dst)
    shutil.rmtree(old, ignore_errors=True)


def read_meta(dirpath: str) -> Dict[str, Any]:
    with open(os.path.join(dirpath, META_NAME)) as f:
        meta = json.load(f)
    if meta.get("format") != INDEX_FORMAT_VERSION:
        raise ValueError(
            f"index format {meta.get('format')} != "
            f"{INDEX_FORMAT_VERSION} (rebuild the index)")
    return meta
