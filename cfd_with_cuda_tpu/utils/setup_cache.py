"""On-disk setup cache: skip the host preprocessing ladder on warm starts.

The reference re-runs its full setup (deck parse, 27-node promotion, CSR
pattern construction, step0 assembly) on every launch — ~3 minutes of
single-core work at NE27000 (``blascoCodinaHuerta.cpp:383-508``).  Here a
solver snapshots its finished device-array dict + scalar attributes,
keyed by a fingerprint of the deck *contents* and the config fields that
shape the arrays, so a warm start is one pickle load (~2 s) instead.

Also hosts :func:`enable_compilation_cache`, which turns on jax's
persistent XLA compilation cache so the ~2-minute whole-step compile is
paid once per (program, libtpu) pair, not once per process.
"""

from __future__ import annotations

import dataclasses
import hashlib
import os
import pickle
import tempfile
from pathlib import Path

import numpy as np

__all__ = [
    "deck_fingerprint",
    "snapshot_load",
    "snapshot_store",
    "evict_lru",
    "cache_max_bytes",
    "enable_compilation_cache",
    "default_cache_dir",
]

# bump when solver snapshot layouts change — stale entries just miss
# (17: 16 briefly shipped mid-development without the f64 DIA keys)
SCHEMA = 19


def default_cache_dir() -> str | None:
    """Cache dir from $CFD_TPU_CACHE_DIR, or `<repo>/.cache/setup` when the
    package lives in a writable tree; None disables caching."""
    env = os.environ.get("CFD_TPU_CACHE_DIR")
    if env == "":
        return None
    if env:
        return env
    root = Path(__file__).resolve().parents[2]
    return str(root / ".cache" / "setup")


def _hash_update(h, obj) -> None:
    if isinstance(obj, np.ndarray):
        h.update(str(obj.dtype).encode())
        h.update(str(obj.shape).encode())
        h.update(np.ascontiguousarray(obj).tobytes())
    elif isinstance(obj, (list, tuple)):
        h.update(f"seq{len(obj)}(".encode())
        for item in obj:
            _hash_update(h, item)
        h.update(b")")
    else:
        # length-framed so adjacent scalars cannot collide
        # (repr(12)+repr(3) == repr(1)+repr(23))
        r = repr(obj).encode()
        h.update(f"v{len(r)}:".encode())
        h.update(r)


# Config fields that SHAPE the setup arrays (an include-list: runtime
# knobs like tolerances, maxiters, chunk sizes, warm starts and backend
# names churned the fingerprint in round 2 — every tweak re-ran the
# ~minutes host setup and left another ~1 GB snapshot behind).  Backend
# selection enters through the `extra` args (class name + pallas-layout
# flag), which the solvers already pass.
_CFG_INCLUDE = (
    "dtype_policy",      # array dtypes
    "pressure_pin_large",  # baked into Z values
    "pressure_precond",  # MG hierarchy built (or not) at setup
    "structured",        # DIA-vs-ELL operator layout
    "shard_pad",         # device-array padding
    "spmd_devices",      # sharded fast path changes the pad multiple
    "structured_layout",  # parity-split vs interleaved device tables
    "pressure_cg_sym",   # half vs full fused-CG weight layout
)
# deck fields that are provenance, not content
_DECK_EXCLUDE = frozenset({"source_path"})


def deck_fingerprint(deck, config, *extra) -> str:
    """Content hash of everything that shapes a solver's setup products."""
    h = hashlib.sha256()
    h.update(f"schema={SCHEMA}".encode())
    for field in dataclasses.fields(deck):
        if field.name in _DECK_EXCLUDE:
            continue
        h.update(field.name.encode())
        _hash_update(h, getattr(deck, field.name))
    for name in _CFG_INCLUDE:
        h.update(name.encode())
        _hash_update(h, getattr(config, name))
    for item in extra:
        _hash_update(h, item)
    return h.hexdigest()[:32]


def snapshot_load(cache_dir: str | None, key: str) -> dict | None:
    if not cache_dir:
        return None
    path = Path(cache_dir) / f"{key}.pkl"
    if not path.exists():
        return None
    try:
        with open(path, "rb") as f:
            snap = pickle.load(f)
    except Exception:  # corrupt/partial file -> treat as miss
        return None
    try:
        os.utime(path)          # LRU recency for evict_lru
    except OSError:             # read-only dir: keep the hit anyway
        pass
    return snap


def cache_max_bytes() -> int:
    """Setup-cache size cap: $CFD_TPU_CACHE_MAX_GB (default 8 GB; 0
    disables eviction).  Snapshots are ~1 GB each at NE27000 scale and
    fingerprint churn (any config-field change) otherwise accumulates
    stale entries without bound — round 2 left 29 GB behind."""
    return int(float(os.environ.get("CFD_TPU_CACHE_MAX_GB", "8")) * 1e9)


def evict_lru(cache_dir: str | Path, max_bytes: int | None = None) -> None:
    """Delete least-recently-used snapshots until the dir fits the cap."""
    max_bytes = cache_max_bytes() if max_bytes is None else max_bytes
    if max_bytes <= 0:
        return
    entries = []
    for p in Path(cache_dir).glob("*.pkl"):
        try:
            st = p.stat()
            entries.append((st.st_mtime, st.st_size, p))
        except OSError:
            continue
    # orphaned mkstemp leftovers (writer killed mid-dump): age them out
    # aggressively — a live writer's tmp is seconds old
    import time as _time

    for p in Path(cache_dir).glob("*.tmp"):
        try:
            if _time.time() - p.stat().st_mtime > 3600:
                p.unlink()
        except OSError:
            continue
    total = sum(sz for _, sz, _ in entries)
    for _, sz, p in sorted(entries):            # oldest first
        if total <= max_bytes:
            break
        try:
            p.unlink()
            total -= sz
        except OSError:
            pass


def snapshot_store(cache_dir: str | None, key: str, snap: dict) -> None:
    if not cache_dir:
        return
    d = Path(cache_dir)
    # a read-only install must degrade to "no cache", not crash the run
    # after the expensive host setup (snapshot_load already tolerates it)
    try:
        d.mkdir(parents=True, exist_ok=True)
        # atomic publish: writers never expose a partial pickle
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    except OSError:
        return
    try:
        with os.fdopen(fd, "wb") as f:
            pickle.dump(snap, f, protocol=5)
        os.replace(tmp, d / f"{key}.pkl")
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
    evict_lru(d)


def solver_snapshot(solver, attrs: tuple[str, ...]) -> dict:
    """Collect a solver's array dict + named attributes + mesh arrays.

    Must be called while ``solver.d`` still holds HOST numpy arrays (the
    solvers convert to device arrays only after snapshotting) — pulling a
    device dict back would round-trip the full operator set through the
    TPU tunnel.
    """
    snap = {
        "d": {k: np.asarray(v) for k, v in solver.d.items()},
        "attrs": {a: getattr(solver, a) for a in attrs if hasattr(solver, a)},
        "mesh": {
            "ltog_node": solver.mesh.ltog_node,
            "coords": solver.mesh.coords,
            "ncn": solver.mesh.ncn,
            "nn": solver.mesh.nn,
        },
    }
    return snap


def solver_restore(solver, snap: dict) -> None:
    """Restore a solver from :func:`solver_snapshot` output.

    ``solver.ops``/``solver.tables`` stay None on a cache hit — they are
    setup intermediates; everything ``run()``/IO needs is in ``d``, the
    attrs, and the mesh arrays.
    """
    import jax.numpy as jnp

    from cfd_with_cuda_tpu.mesh.topology import PromotedMesh

    solver.d = {k: jnp.asarray(v) for k, v in snap["d"].items()}
    for a, v in snap["attrs"].items():
        setattr(solver, a, v)
    m = snap["mesh"]
    solver.mesh = PromotedMesh(
        ltog_node=m["ltog_node"], coords=m["coords"], ncn=m["ncn"], nn=m["nn"]
    )
    solver.ops = None
    solver.tables = None


def enable_compilation_cache(path: str | None = None) -> None:
    """Persistent XLA compile cache (idempotent; safe pre- or post-import)."""
    import jax

    if path is None:
        root = Path(__file__).resolve().parents[2]
        path = str(root / ".cache" / "xla")
    try:
        Path(path).mkdir(parents=True, exist_ok=True)
    except OSError:
        return              # read-only install: run without the cache
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
