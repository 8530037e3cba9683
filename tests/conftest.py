import os

# Tests run on CPU with 8 virtual devices so sharding paths are exercised
# without a real TPU slice. This machine's axon TPU plugin ignores the
# JAX_PLATFORMS env var, so the platform must be forced through jax.config
# (before any backend initialization).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import atexit  # noqa: E402
import shutil  # noqa: E402
import tempfile  # noqa: E402

# isolate the packed-dataset cache (data/cache.py) from the user cache:
# fixtures live in per-run tmp dirs, their cache entries should too
# (guarded so an already-set env var never triggers a stray mkdtemp);
# the atexit hook removes the per-session dir so repeated runs don't
# accumulate packed fixture arrays under /tmp
if "DLDKD_PACK_CACHE_DIR" not in os.environ:
    _pack_cache_dir = tempfile.mkdtemp(prefix="dldkd_pack_cache_")
    os.environ["DLDKD_PACK_CACHE_DIR"] = _pack_cache_dir
    atexit.register(shutil.rmtree, _pack_cache_dir, ignore_errors=True)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# This JAX build's default f32 matmul precision is bf16-grade even on CPU;
# golden comparisons need true f32.
jax.config.update("jax_default_matmul_precision", "highest")
