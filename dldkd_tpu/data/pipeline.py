"""Static-shape batching + device prefetch.

Replaces the reference's DataLoader worker pool + per-batch-max padding
(data_provider.py:111-136, train.py:199-200) with pure numpy gathers from
the packed arrays and a one-element lookahead that overlaps host batch
assembly + H2D copy with device compute.

Shape discipline: every full batch has identical shapes — (bsz videos,
max_ctx_l frames) and a query axis padded up to a multiple of
query_pad_multiple — so XLA compiles a handful of programs total (one per
query bucket, plus one remainder batch size per epoch tail).

Batch layout parity: videos within a batch are sorted by #captions
descending and captions are laid out video-major, so valid queries form a
prefix and the soft-NCE alpha-partition sees the same ordering as the
reference (data_provider.py:117; SURVEY.md S7 'soft-label partition
subtlety').
"""

from __future__ import annotations

import threading
import queue as queue_mod
from typing import Dict, Iterator, Optional

import numpy as np

from dldkd_tpu.data.ingest import TrainData


def _round_up(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


class TrainLoader:
    """Deterministic, seeded epoch iterator over host batches.

    epoch_order: optional per-epoch video-ID sequences replayed verbatim
    instead of the seeded shuffle — lets trajectory tests feed this loader
    the exact item order another stack's sampler produced (the reference
    shuffles via DataLoader(shuffle=True), train.py:199-200), so
    multi-batch epoch compositions match across implementations."""

    def __init__(self, data: TrainData, bsz: int, seed: int = 9527,
                 query_pad_multiple: int = 64, drop_last: bool = False,
                 epoch_order=None):
        self.data = data
        self.bsz = bsz
        self.seed = seed
        self.qpm = query_pad_multiple
        self.drop_last = drop_last
        self.n_videos = len(data.videos)
        self.epoch_order = epoch_order
        if epoch_order is not None:
            self._id_to_idx = {v: i for i, v in enumerate(data.videos.ids)}

    def steps_per_epoch(self) -> int:
        if self.drop_last:
            return self.n_videos // self.bsz
        return (self.n_videos + self.bsz - 1) // self.bsz

    def epoch(self, epoch_idx: int) -> Iterator[Dict[str, np.ndarray]]:
        if self.epoch_order is not None:
            order = self.epoch_order[epoch_idx]
            assert len(order) == self.n_videos
            perm = np.asarray([self._id_to_idx[v] for v in order])
        else:
            rng = np.random.RandomState(self.seed + epoch_idx)
            perm = rng.permutation(self.n_videos)
        for start in range(0, self.n_videos, self.bsz):
            vid_idx = perm[start:start + self.bsz]
            if len(vid_idx) < self.bsz and self.drop_last:
                break
            yield self._build_batch(vid_idx)

    def _build_batch(self, vid_idx: np.ndarray) -> Dict[str, np.ndarray]:
        d = self.data
        # sort by #captions descending (stable, like python list.sort)
        n_caps = np.asarray([len(d.vid_cap_index[i]) for i in vid_idx])
        order = np.argsort(-n_caps, kind="stable")
        vid_idx = vid_idx[order]

        cap_rows = np.concatenate([d.vid_cap_index[i] for i in vid_idx])
        labels = np.concatenate([
            np.full(len(d.vid_cap_index[i]), pos, np.int32)
            for pos, i in enumerate(vid_idx)])
        n_q = len(cap_rows)
        q_pad = _round_up(max(n_q, 1), self.qpm)

        text = np.zeros((q_pad,) + d.queries.feats.shape[1:], np.float32)
        text[:n_q] = d.queries.feats[cap_rows]
        tmask = np.zeros((q_pad, d.queries.mask.shape[1]), np.float32)
        tmask[:n_q] = d.queries.mask[cap_rows]
        t_text = np.zeros((q_pad, d.queries.teacher_feats.shape[1]), np.float32)
        t_text[:n_q] = d.queries.teacher_feats[cap_rows]
        pad_labels = np.full(q_pad, -1, np.int32)
        pad_labels[:n_q] = labels

        return {
            "student_videos": d.videos.feats[vid_idx],
            "student_videos_mask": d.videos.mask[vid_idx],
            "teacher_videos": d.videos.teacher_feats[vid_idx],
            "student_text": text,
            "student_text_mask": tmask,
            "teacher_text": t_text,
            "text_labels": pad_labels,
        }


def device_prefetch(iterator: Iterator[dict], size: int = 2,
                    put_fn=None) -> Iterator[dict]:
    """Run host batch assembly in a background thread and move batches to
    device ahead of consumption (the reference's pin_memory + worker-pool
    role, config.py:32-36). put_fn defaults to jax.device_put."""
    import jax

    put = put_fn or jax.device_put
    q: queue_mod.Queue = queue_mod.Queue(maxsize=size)
    _END = object()
    err: list = []

    def producer():
        try:
            for item in iterator:
                q.put(put(item))
        except BaseException as e:  # surfaced on the consumer side
            err.append(e)
        finally:
            q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            if err:
                raise err[0]
            return
        yield item
