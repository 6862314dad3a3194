"""Checkpoint / resume with Orbax.

Rebuild of the reference's checkpoint subsystem (SURVEY.md §3.5,
``/root/reference/src/torchmodel.py:179-208``, ``train.py:128-133``):

  - periodic full save every ``save_every`` epochs: params + optimizer
    states + precision scalars + PRNG key (Orbax) alongside the pickled
    stats dict and a source-code snapshot of the model/loss modules and the
    driver script (torchmodel.py:186-189);
  - immutable weight-only archives every ``archive_every`` epochs (the
    reference copies the checkpoint dir minus optimizers.pkl,
    train.py:130-133);
  - resume restores everything *including optimizer state* — fixing the
    port's double-read bug that silently dropped it (torchmodel.py:195-201,
    SURVEY.md §2.9.5).
"""

from __future__ import annotations

import pickle
import shutil
import threading
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

_SNAPSHOT_SOURCES = [
    "models/networks.py",
    "train/losses.py",
    "train/loop.py",
]


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def _write_payload(
    folder_chp: Path, payload: Dict, stats: Dict, script_file: str
) -> None:
    """Disk half of a checkpoint save (host arrays already materialized).

    Crash-safe: the new state is fully written to ``state.tmp`` before the
    old ``state`` is touched, then swapped in via renames — a kill at any
    point leaves a complete state dir on disk (``state`` or ``state.old``,
    see ``_resolve_state_dir``)."""
    folder_chp.mkdir(parents=True, exist_ok=True)
    ckpt_dir = folder_chp / "state"
    tmp_dir = folder_chp / "state.tmp"
    old_dir = folder_chp / "state.old"
    for d in (tmp_dir, old_dir):
        if d.exists():
            shutil.rmtree(d)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(tmp_dir, payload)
    if ckpt_dir.exists():
        ckpt_dir.rename(old_dir)
    tmp_dir.rename(ckpt_dir)
    if old_dir.exists():
        shutil.rmtree(old_dir)

    stats_tmp = folder_chp / "stats.pkl.tmp"
    with open(stats_tmp, "wb") as f:
        pickle.dump(stats, f)
    stats_tmp.replace(folder_chp / "stats.pkl")

    # Source snapshot (torchmodel.py:186-189).
    pkg_root = Path(__file__).resolve().parent.parent
    for rel in _SNAPSHOT_SOURCES:
        src = pkg_root / rel
        if src.exists():
            shutil.copyfile(src, folder_chp / src.name)
    if script_file and Path(script_file).exists():
        shutil.copyfile(script_file, folder_chp / Path(script_file).name)


def save_all(
    folder_chp: Path,
    state: Any,
    stats: Dict,
    rng_key: jax.Array,
    script_file: str = "",
) -> None:
    """Full checkpoint: Orbax state + stats.pkl + source snapshot."""
    folder_chp = Path(folder_chp).resolve()
    payload = {
        "state": _to_host(state),
        "rng_key": np.asarray(jax.random.key_data(rng_key)),
    }
    _write_payload(folder_chp, payload, stats, script_file)


class AsyncSaver:
    """Checkpoint saver with an asynchronous disk write.

    The device->host transfer happens synchronously in ``save`` (the
    TrainState buffers are donated into the next epoch's scan, so they must
    be materialized before the next dispatch); the Orbax/pickle disk write —
    the expensive half, ~6 s per save at batch 512 — runs on a background
    thread. At most one write is in flight; ``wait()`` before reading the
    checkpoint dir (archive/resume) or exiting."""

    def __init__(self) -> None:
        self._thread: Optional[threading.Thread] = None
        self._exc: Optional[BaseException] = None

    def _run(self, *args) -> None:
        try:
            _write_payload(*args)
        except BaseException as e:  # surfaced by the next wait()/save()
            self._exc = e

    def save(
        self,
        folder_chp: Path,
        state: Any,
        stats: Dict,
        rng_key: jax.Array,
        script_file: str = "",
    ) -> None:
        self.wait()
        folder_chp = Path(folder_chp).resolve()
        payload = {
            "state": _to_host(state),
            "rng_key": np.asarray(jax.random.key_data(rng_key)),
        }
        # Snapshot the (host-side, append-only) stats lists: the main thread
        # keeps appending while the writer pickles.
        stats_copy = {k: list(v) for k, v in stats.items()}
        self._thread = threading.Thread(
            target=self._run,
            args=(folder_chp, payload, stats_copy, script_file),
            daemon=True,
        )
        self._thread.start()

    def wait(self) -> None:
        """Join the in-flight write; re-raise any writer-thread failure (a
        silently failing saver would let hours of training go unsaved)."""
        if self._thread is not None and self._thread.is_alive():
            self._thread.join()
        self._thread = None
        if self._exc is not None:
            exc, self._exc = self._exc, None
            raise exc


def _resolve_state_dir(folder_chp: Path) -> Path:
    """The live state dir, falling back to ``state.old`` if a crash landed
    between the two swap renames in ``_write_payload`` (both are complete
    checkpoints; ``state.old`` is simply one save older)."""
    state = Path(folder_chp) / "state"
    if state.exists():
        return state
    old = Path(folder_chp) / "state.old"
    if old.exists():
        return old
    return state


def load_all(
    folder_chp: Path, state_template: Any
) -> Tuple[Any, Dict, jax.Array]:
    """Restore (state, stats, rng_key). ``state_template`` provides the
    pytree structure/shapes (a freshly created TrainState)."""
    folder_chp = Path(folder_chp).resolve()
    with ocp.StandardCheckpointer() as ckptr:
        template = {
            "state": _to_host(state_template),
            "rng_key": np.zeros((2,), np.uint32),
        }
        state_dir = _resolve_state_dir(folder_chp)
        try:
            payload = ckptr.restore(state_dir, template)
        except Exception:
            # Weight-only archive (``archive`` drops opt_states, mirroring
            # the reference's optimizers.pkl removal, train.py:130-133):
            # restore untyped and graft what exists onto the template, so
            # sweeps/probes/demos can evaluate archived epochs directly.
            raw = ckptr.restore(state_dir)
            jtu = jax.tree_util

            def _lookup(d, path):
                for p in path:
                    k = getattr(p, "name", None)
                    if k is None:
                        k = getattr(p, "key", None)
                    if k is None:
                        k = str(getattr(p, "idx", ""))
                    if isinstance(d, dict) and k in d:
                        d = d[k]
                    elif isinstance(d, dict) and str(k) in d:
                        d = d[str(k)]
                    else:
                        return None
                return d

            lp, treedef = jtu.tree_flatten_with_path(template)
            leaves = []
            missing = []
            for path, leaf in lp:
                found = _lookup(raw, path)
                if found is None:
                    # Only optimizer/rng leaves may legitimately be absent
                    # (weight-only archives). A params leaf falling back to
                    # its template value would silently evaluate a
                    # random-init model — refuse instead.
                    if any(
                        getattr(p, "name", getattr(p, "key", None))
                        == "params"
                        for p in path
                    ):
                        missing.append(jtu.keystr(path))
                    leaves.append(leaf)
                else:
                    leaves.append(found)
            if missing:
                raise ValueError(
                    f"checkpoint at {state_dir} is not a weight-only "
                    f"archive: params leaves missing from the raw "
                    f"restore: {missing[:5]} (+{max(0, len(missing)-5)} "
                    f"more)"
                )
            payload = jtu.tree_unflatten(treedef, leaves)
    with open(folder_chp / "stats.pkl", "rb") as f:
        stats = pickle.load(f)
    state = jax.tree.map(
        lambda t, x: jax.numpy.asarray(x), state_template, payload["state"]
    )
    rng_key = jax.random.wrap_key_data(
        jax.numpy.asarray(payload["rng_key"])
    )
    return state, stats, rng_key


def archive(folder_chp: Path, epoch: int) -> None:
    """Immutable weight-only archive: copy the checkpoint dir, drop the
    optimizer state (train.py:130-133)."""
    folder_chp = Path(folder_chp).resolve()
    dst = folder_chp.parent / f"{folder_chp.name}_epoch_{epoch}"
    if dst.exists():
        shutil.rmtree(dst)
    # Copy the *resolved* live state dir explicitly: if a crash landed the
    # checkpoint in its recovery window (only state.old present), a naive
    # copytree would produce an archive with stats but no state
    # (ADVICE r2 #2).
    shutil.copytree(
        folder_chp, dst,
        ignore=shutil.ignore_patterns("state", "state.tmp", "state.old"),
    )
    src_state = _resolve_state_dir(folder_chp)
    if src_state.exists():
        shutil.copytree(src_state, dst / "state")
    # Orbax stores the state as one tree; rewrite the archive without
    # optimizer states to mirror the reference's optimizers.pkl removal.
    state_dir = dst / "state"
    if state_dir.exists():
        with ocp.StandardCheckpointer() as ckptr:
            payload = ckptr.restore(state_dir)
            payload["state"].pop("opt_states", None)
            shutil.rmtree(state_dir)
            ckptr.save(state_dir, payload)


def latest_exists(folder_chp: Path) -> bool:
    return _resolve_state_dir(folder_chp).exists() and (
        Path(folder_chp) / "stats.pkl"
    ).exists()
