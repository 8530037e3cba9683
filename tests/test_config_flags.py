"""Round-2 flag/semantics pins: --vid_feat_size wiring, --debug side
effects (reference method/config.py:125-129), warmup=0 NaN guard, and
padding-aware ablation losses."""

import jax.numpy as jnp
import numpy as np

from dldkd_tpu.config import parse_args
from dldkd_tpu.ops.losses import clip_mse, frame_nce
from dldkd_tpu.optim import schedules

_MIN = ["--collection", "synthetic", "--visual_feature", "i3d",
        "--root_path", "/tmp", "--q_feat_size", "16",
        "--dset_name", "synthetic"]


def test_vid_feat_size_sets_visual_input_size():
    cfg = parse_args(_MIN + ["--vid_feat_size", "512"], finalize=False)
    assert cfg.model.visual_input_size == 512


def test_debug_forces_eval_bsz_and_workers():
    cfg = parse_args(_MIN + ["--debug"], finalize=False)
    assert cfg.debug
    assert cfg.eval.eval_query_bsz == 100
    assert cfg.data.num_workers == 0


def test_zero_warmup_schedules_are_finite():
    for name in ("warmup_linear", "warmup_constant", "warmup_cosine",
                 "warmup_cosine_hard_restarts",
                 "warmup_cosine_warmup_restarts"):
        fn = schedules.make_lr_schedule(name, 0.0, 100.0)
        for step in (0.0, 1.0, 50.0, 100.0):
            v = np.asarray(fn(jnp.float32(step)))
            assert np.isfinite(v), f"{name}({step}) = {v}"


def test_clip_mse_valid_mask_matches_unpadded():
    rng = np.random.RandomState(0)
    x = rng.randn(6, 5, 3).astype(np.float32)
    t = rng.randn(6, 5, 3).astype(np.float32)
    valid = np.array([1, 1, 1, 1, 0, 0], bool)
    full = clip_mse(jnp.asarray(x[:4]), jnp.asarray(t[:4]))
    masked = clip_mse(jnp.asarray(x), jnp.asarray(t), jnp.asarray(valid))
    np.testing.assert_allclose(np.asarray(masked), np.asarray(full),
                               rtol=1e-6)
    # 2-D shape path
    full2 = clip_mse(jnp.asarray(x[:4, 0]), jnp.asarray(t[:4, 0]))
    masked2 = clip_mse(jnp.asarray(x[:, 0]), jnp.asarray(t[:, 0]),
                       jnp.asarray(valid))
    np.testing.assert_allclose(np.asarray(masked2), np.asarray(full2),
                               rtol=1e-6)


def test_frame_nce_valid_mask_matches_unpadded():
    rng = np.random.RandomState(1)
    s = rng.randn(6, 6, 4).astype(np.float32)
    valid = np.array([1, 1, 1, 1, 0, 0], bool)
    full = frame_nce(jnp.asarray(s[:4, :4]))
    masked = frame_nce(jnp.asarray(s), valid=jnp.asarray(valid))
    np.testing.assert_allclose(np.asarray(masked), np.asarray(full),
                               rtol=1e-5)
