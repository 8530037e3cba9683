"""Compiled-executable cache: persist XLA executables across processes.

The platform's HLO-level persistent compilation cache does not reliably
persist the big int8 serving/eval programs (BENCHMARKS.md), so a fresh
serving process used to pay their 60-130 s compile before the first
result. jax.experimental.serialize_executable CAN serialize the final
loaded executable on this platform (verified on the TPU: a fresh process
deserialized and ran the int8 Pallas scoring program with zero compile) —
this module wraps it as a small keyed file cache.

Keys must capture everything that affects the program: jax version,
backend platform, static config, and every operand's shape+dtype — the
caller passes those parts and gets a stable filename. Loads are
best-effort: ANY failure (version skew, machine mismatch, corrupt file)
returns None and the caller falls back to the normal jit compile.

Trust note: entries are pickles (the serializer's own format); only point
this at a directory the process owner controls — the default is under
the user's cache dir, same trust domain as the jit cache.

Serialization gotcha (measured, round 5): if the SAME program signature
was already executed through the regular jit dispatch path in this
process, a later ``jitted.lower(args).compile()`` gets the dispatch-path
executable back from XLA's in-memory compile cache — and on some
backends THAT executable does not serialize ("UNIMPLEMENTED: `LessThan`
is not serializable" on XLA:CPU for programs containing top-k sorts),
while a genuinely fresh compile of the identical program serializes
fine. save() degrades gracefully (the process keeps the compiled
executable; only persistence is lost). Serving avoids the trigger by
routing cache-enabled signatures through _compile_q8 BEFORE any plain
jit call; it can still arise when a cache-less retriever ran the same
signature earlier in the process.
"""

from __future__ import annotations

import functools
import hashlib
import logging
import os
import pickle
import tempfile
from typing import Any, Callable, Iterable, Optional

logger = logging.getLogger(__name__)

_FORMAT_VERSION = 1

# Source files whose edits change the compiled programs this cache holds.
# Their content hash is part of every key: without it, fixing numerics in
# a kernel would silently keep serving the OLD executable across
# processes (the same reason CLAUDE.md notes pallas edits invalidate the
# HLO cache).
_SOURCE_DEPS = ("ops/pallas/sim_max.py", "ops/pallas/query_tower.py",
                "ops/fast_eval.py", "ops/similarity.py", "ops/masking.py",
                "serving.py", "models/components.py", "models/dldkd.py",
                "metrics.py")


@functools.lru_cache(maxsize=1)
def _source_fingerprint() -> str:
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    h = hashlib.sha256()
    for rel in _SOURCE_DEPS:
        path = os.path.join(pkg, rel)
        try:
            with open(path, "rb") as f:
                h.update(f.read())
        except OSError:
            h.update(rel.encode())  # missing file still perturbs the key
    return h.hexdigest()[:16]


def default_dir() -> str:
    return os.environ.get(
        "DLDKD_AOT_CACHE_DIR",
        os.path.expanduser("~/.cache/dldkd_aot"))


def cache_key(name: str, parts: Iterable[Any]) -> str:
    """Stable content key: program name + jax version + backend platform +
    a fingerprint of the compute-path sources + the caller's static/shape
    parts."""
    import jax

    h = hashlib.sha256()
    h.update(f"v{_FORMAT_VERSION}|{jax.__version__}|"
             f"{jax.default_backend()}|{_source_fingerprint()}|"
             f"{name}|".encode())
    for p in parts:
        h.update(repr(p).encode())
        h.update(b"|")
    return f"{name}-{h.hexdigest()[:24]}"


def _path(cache_dir: str, key: str) -> str:
    return os.path.join(cache_dir, key + ".jaxexec")


def save(cache_dir: str, key: str, compiled) -> bool:
    """Serialize a jax.stages.Compiled under the key. Returns False when
    the backend does not support executable serialization."""
    from jax.experimental import serialize_executable

    try:
        payload, in_tree, out_tree = serialize_executable.serialize(compiled)
        # the executable is bound to a device count; record it so load()
        # pins execution_devices (the loader otherwise defaults to ALL
        # visible devices — wrong under a multi-device runtime for a
        # single-device program)
        n_devices = len(compiled._executable.xla_executable.local_devices())
    except Exception as e:  # backend without serialization support
        logger.info("executable not serializable (%s); cache skipped", e)
        return False
    os.makedirs(cache_dir, exist_ok=True)
    path = _path(cache_dir, key)
    fd, tmp = tempfile.mkstemp(dir=cache_dir, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            pickle.dump((payload, in_tree, out_tree, n_devices), f)
        os.replace(tmp, path)  # atomic publish
    except OSError:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False
    logger.info("cached executable %s (%.1f MB)", path,
                os.path.getsize(path) / 1e6)
    return True


def load(cache_dir: str, key: str) -> Optional[Callable]:
    """Deserialize + load the executable for the key, or None on any
    failure (missing file, version skew, backend mismatch, ...). The
    returned callable takes the program's non-static operands exactly as
    the original jitted call did."""
    from jax.experimental import serialize_executable

    path = _path(cache_dir, key)
    if not os.path.exists(path):
        return None
    try:
        import jax

        with open(path, "rb") as f:
            payload, in_tree, out_tree, n_devices = pickle.load(f)
        return serialize_executable.deserialize_and_load(
            payload, in_tree, out_tree,
            execution_devices=jax.devices()[:n_devices])
    except Exception as e:
        logger.warning("stale/unloadable executable cache %s (%s); "
                       "recompiling", path, e)
        return None


def file_fingerprint(path: str) -> str:
    """Content hash of one extra source file for cache_key parts — for
    programs DEFINED outside the package (bench.py builds its own fused
    eval program, so _SOURCE_DEPS alone would serve a stale executable
    after a bench.py edit)."""
    try:
        with open(path, "rb") as f:
            return hashlib.sha256(f.read()).hexdigest()[:16]
    except OSError:
        return os.path.basename(path)


def operand_shapes(args, static_idx: Iterable[int] = ()) -> tuple:
    """(shape, dtype) of every traced-operand leaf in `args`, skipping the
    static argument POSITIONS. This is the shape part of every executable
    cache key — serving's _q8_cache_key and cached_compile must build it
    identically or their caches diverge, so both call here."""
    import jax

    static_idx = frozenset(static_idx)
    operands = [a for i, a in enumerate(args) if i not in static_idx]
    return tuple((leaf.shape, str(leaf.dtype))
                 for leaf in jax.tree.leaves(operands))


def cached_compile(jitted, args, *, name: str, parts: Iterable[Any],
                   static_idx: Iterable[int] = (),
                   cache_dir: Optional[str] = None) -> Callable:
    """Load the persisted executable for this program signature, or
    lower+compile+persist it. `jitted` is a jax.jit-wrapped function
    whose static argument POSITIONS are `static_idx`; `args` is one full
    example argument tuple. The returned callable takes the FULL argument
    list (statics included, for call-site symmetry) and forwards only the
    traced operands to the executable. Any serialization failure degrades
    to the compiled-but-unpersisted executable; a compile failure
    propagates (same as calling `jitted` would)."""
    cache_dir = cache_dir or default_dir()
    static_idx = frozenset(static_idx)
    shapes = operand_shapes(args, static_idx)
    key = cache_key(name, list(parts) + [sorted(static_idx), shapes])
    fn = load(cache_dir, key)
    if fn is None:
        fn = jitted.lower(*args).compile()
        save(cache_dir, key, fn)

    def call(*full_args):
        return fn(*[a for i, a in enumerate(full_args)
                    if i not in static_idx])

    return call
