"""Checkpoint save / resume / best tracking.

Unifies the reference's five checkpoint idioms (SURVEY.md §5.4):
openpoints save/resume with best+last, pcdet max-keep rotation, Video
EMA branches, mmcv URL shims, plain torch.save — into one npz-based
store (flattened pytrees; orbax optional for sharded setups), with
auto-resume from the latest checkpoint in a directory
(``AutonomousDriving/tools/train.py:134-138`` behavior).
"""

from __future__ import annotations

import glob
import os
import re
import threading
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Any:
    root: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(value)

    def listify(node):
        if isinstance(node, dict):
            keys = list(node)
            if keys and all(re.fullmatch(r"\d+", k) for k in keys):
                return [listify(node[str(i)]) for i in range(len(keys))]
            return {k: listify(v) for k, v in node.items()}
        return node

    return listify(root)


def save(path: str, state: Dict[str, Any]) -> None:
    """state: arbitrary pytree dict (params / opt_state / epoch / ema).

    Atomic: writes to a temp file in the same directory then
    ``os.replace``s into place, so a kill mid-write (preemption, the
    AsyncCheckpointer daemon thread dying with the process) can never
    leave a truncated npz at the final path."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **_flatten(state))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def load(path: str) -> Dict[str, Any]:
    with np.load(path, allow_pickle=False) as data:
        flat = {k: data[k] for k in data.files}
    return _unflatten(flat)


def save_rotating(
    ckpt_dir: str,
    state: Dict[str, Any],
    epoch: int,
    is_best: bool = False,
    max_keep: int = 5,
) -> str:
    """Epoch checkpoint with max-keep rotation + best/latest copies
    (pcdet train_utils.py:134-164 + openpoints ckpt_util semantics)."""
    path = os.path.join(ckpt_dir, f"ckpt_epoch_{epoch:04d}.npz")
    state = dict(state, epoch=np.int64(epoch))
    save(path, state)
    save(os.path.join(ckpt_dir, "ckpt_latest.npz"), state)
    if is_best:
        save(os.path.join(ckpt_dir, "ckpt_best.npz"), state)
    kept = sorted(glob.glob(os.path.join(ckpt_dir, "ckpt_epoch_*.npz")))
    for old in kept[:-max_keep]:
        os.remove(old)
    return path


class AsyncCheckpointer:
    """Non-blocking checkpoint writes.

    The device->host snapshot happens synchronously (``jax.device_get``):
    with ``donate_argnums`` train steps, the previous params buffer is
    invalidated the moment the next step runs, so the copy cannot be
    deferred. Serialization + disk IO — the bulk of the save cost for
    npz — run in a background thread, overlapping the next train epoch
    (the deepspeed/orbax async-save pattern; the reference blocks on
    ``torch.save`` at every epoch boundary). One save in flight at a
    time; errors surface on the next call or ``wait()``.
    """

    def __init__(self):
        self._thread: Optional[threading.Thread] = None
        self._exc: Optional[BaseException] = None

    def save_rotating(self, ckpt_dir: str, state, epoch: int,
                      is_best: bool = False, max_keep: int = 5) -> None:
        self.wait()
        host_state = jax.device_get(state)  # consistent snapshot, sync

        def work():
            try:
                save_rotating(ckpt_dir, host_state, epoch,
                              is_best=is_best, max_keep=max_keep)
            except BaseException as exc:  # re-raised on wait()
                self._exc = exc

        self._thread = threading.Thread(target=work, daemon=True)
        self._thread.start()

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._exc is not None:
            exc, self._exc = self._exc, None
            raise exc


class GracefulPreemption:
    """SIGTERM/SIGINT -> a flag the trainer polls at step boundaries.

    TPU pods are preemptible; the reference has no preemption story
    (SURVEY §5.3 calls it an optional extra). Pattern: install as a
    context manager around the train loop, poll ``triggered`` each step,
    save a resumable checkpoint and exit cleanly; ``auto_resume`` picks
    it up on restart. Handlers are restored on exit; a second signal
    falls through to the previous handler (double-Ctrl-C still kills).
    """

    def __init__(self, signals=None):
        import signal as _signal

        self._signal = _signal
        self.signals = tuple(signals) if signals else (
            _signal.SIGTERM, _signal.SIGINT,
        )
        self.triggered = False
        self._prev: Dict[int, Any] = {}

    def _handler(self, signum, frame):
        if self.triggered:  # second signal: defer to the original handler
            prev = self._prev.get(signum)
            if callable(prev):
                prev(signum, frame)
            else:
                raise KeyboardInterrupt
        self.triggered = True

    def __enter__(self) -> "GracefulPreemption":
        for s in self.signals:
            self._prev[s] = self._signal.signal(s, self._handler)
        return self

    def __exit__(self, *exc) -> None:
        for s, prev in self._prev.items():
            self._signal.signal(s, prev)
        self._prev.clear()


def average_checkpoints(paths) -> Dict[str, Any]:
    """Uniform parameter average over saved checkpoints — the AST weight-
    averaging eval (``Audio/src/run.py:68-70`` --wa flags, traintest
    ``validate_wa``) and fairseq's average_checkpoints (Graph recipes).
    Float leaves are averaged; integer leaves (epoch counters, step ids)
    are taken from the LAST checkpoint."""
    paths = list(paths)
    if not paths:
        raise ValueError("average_checkpoints needs at least one path")
    states = [load(p) for p in paths]
    last = states[-1]

    def avg(*leaves):
        if not np.issubdtype(np.asarray(leaves[0]).dtype, np.floating):
            return leaves[-1]
        return np.mean(np.stack([np.asarray(l) for l in leaves]), axis=0)

    return jax.tree_util.tree_map(avg, *states)


def average_epoch_range(
    ckpt_dir: str, start: int, end: int
) -> Dict[str, Any]:
    """Average ckpt_epoch_{start..end} (inclusive) from a rotation dir
    (the ``validate_wa(model, loader, args, wa_start, wa_end)`` range)."""
    paths = [
        os.path.join(ckpt_dir, f"ckpt_epoch_{e:04d}.npz")
        for e in range(start, end + 1)
    ]
    paths = [p for p in paths if os.path.exists(p)]
    if not paths:
        raise FileNotFoundError(
            f"no ckpt_epoch_*.npz in [{start}, {end}] under {ckpt_dir}"
        )
    return average_checkpoints(paths)


def save_preempt(ckpt_dir: str, state: Dict[str, Any], resume_epoch: int) -> str:
    """Mid-epoch preemption checkpoint under a dedicated name.

    Never overwrites the clean end-of-epoch rotation files. ``epoch`` is
    stored as ``resume_epoch - 1`` so ``auto_resume`` (which restarts at
    ``epoch + 1``) redoes the interrupted epoch; ``resume_epoch`` is also
    stored explicitly."""
    path = os.path.join(ckpt_dir, "ckpt_preempt.npz")
    state = dict(
        state,
        epoch=np.int64(resume_epoch - 1),
        resume_epoch=np.int64(resume_epoch),
    )
    save(path, state)
    return path


def auto_resume(ckpt_dir: str) -> Optional[Tuple[Dict[str, Any], int]]:
    """Load the newest loadable checkpoint: (state, epoch) or None.

    Preference order: the newest (by mtime) of ckpt_preempt.npz /
    ckpt_latest.npz, then epoch checkpoints newest-first. A corrupt or
    truncated file falls through to the next candidate instead of
    crashing the restart."""
    named = [
        os.path.join(ckpt_dir, "ckpt_preempt.npz"),
        os.path.join(ckpt_dir, "ckpt_latest.npz"),
    ]
    candidates = sorted(
        (p for p in named if os.path.exists(p)),
        key=os.path.getmtime,
        reverse=True,
    )
    candidates += sorted(
        glob.glob(os.path.join(ckpt_dir, "ckpt_epoch_*.npz")), reverse=True
    )
    for path in candidates:
        try:
            state = load(path)
        except Exception:  # truncated/corrupt: fall back to older ckpt
            continue
        return state, int(state.get("epoch", 0))
    return None


def save_orbax(path: str, state: Dict[str, Any]) -> None:
    """Orbax save for sharded/multi-host checkpoints (production path;
    the npz store above covers single-host)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), state, force=True)


def load_orbax(path: str, like: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            return ckptr.restore(os.path.abspath(path), like)
        return ckptr.restore(os.path.abspath(path))


class EarlyStopping:
    """Time-Series ``utils/tools.py:27`` semantics: stop after `patience`
    validations without improvement; tracks best state."""

    def __init__(self, patience: int = 7, delta: float = 0.0, mode: str = "min"):
        self.patience = patience
        self.delta = delta
        self.mode = mode
        self.best: Optional[float] = None
        self.counter = 0
        self.should_stop = False

    def __call__(self, value: float) -> bool:
        """Returns True if this value is a new best."""
        improved = (
            self.best is None
            or (self.mode == "min" and value < self.best - self.delta)
            or (self.mode == "max" and value > self.best + self.delta)
        )
        if improved:
            self.best = value
            self.counter = 0
        else:
            self.counter += 1
            if self.counter >= self.patience:
                self.should_stop = True
        return improved
