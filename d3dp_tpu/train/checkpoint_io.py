"""Checkpointing: same logical payload as the reference's torch.save dict
(main.py:543-552) — {epoch, lr, random_state, optimizer, model} — stored as
a single pickle of numpy-ified pytrees, framework-free on load.

Also loads reference .bin checkpoints (model weights only) via the
torch->flax converter.
"""

import os
import pickle

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path, *, epoch, lr, params, opt_state=None,
                    generator_random_state=None, min_loss=None, extra=None):
    payload = {
        "epoch": epoch,
        "lr": lr,
        "params": _to_numpy(params),
        "opt_state": None if opt_state is None else _to_numpy(opt_state),
        "random_state": generator_random_state,
        "min_loss": min_loss,
        "extra": extra,
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def load_checkpoint(path):
    with open(path, "rb") as f:
        return pickle.load(f)


def latest_checkpoint(directory):
    """Newest epoch_N.ckpt in a directory, or best_epoch.ckpt, or None —
    enables `--resume auto` elastic restart after interruption."""
    import glob
    import re

    candidates = glob.glob(os.path.join(directory, "epoch_*.ckpt"))
    if candidates:
        return max(candidates,
                   key=lambda p: int(re.findall(r"epoch_(\d+)", p)[0]))
    best = os.path.join(directory, "best_epoch.ckpt")
    return best if os.path.exists(best) else None


_async_checkpointer = None


def save_checkpoint_orbax(directory, *, epoch, lr, params, opt_state=None,
                          min_loss=None, wait=True):
    """Orbax backend: same logical payload in a sharding-aware, async-capable
    format (preferred for multi-host runs; the pickle format stays the
    single-host default for its self-containedness).

    wait=False makes the save asynchronous: the device-to-host copy happens
    now but serialization overlaps with subsequent training steps. Call
    wait_for_checkpoints() (or the next save) before reading the directory.
    """
    global _async_checkpointer
    import orbax.checkpoint as ocp

    payload = {
        "params": _to_numpy(params),
        "opt_state": None if opt_state is None else _to_numpy(opt_state),
        "meta": {"epoch": epoch, "lr": lr, "min_loss": min_loss},
    }
    if _async_checkpointer is None:
        _async_checkpointer = ocp.StandardCheckpointer()
        # a pending async save left at interpreter exit would leave the
        # directory incomplete — drain it before teardown
        import atexit

        atexit.register(wait_for_checkpoints)
    ckptr = _async_checkpointer
    ckptr.save(os.path.abspath(directory), payload, force=True)
    if wait:
        ckptr.wait_until_finished()


def wait_for_checkpoints():
    """Block until every pending async orbax save has committed."""
    if _async_checkpointer is not None:
        _async_checkpointer.wait_until_finished()


def load_checkpoint_orbax(directory):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(os.path.abspath(directory))
    meta = payload.get("meta", {})
    return {
        "params": payload["params"],
        "opt_state": payload.get("opt_state"),
        "epoch": meta.get("epoch"),
        "lr": meta.get("lr"),
        "min_loss": meta.get("min_loss"),
        "random_state": None,
    }


def load_any(path, depth=8):
    """Load either our .ckpt pickle or a reference torch .bin.

    Returns dict with at least {'params': flax-params-pytree, 'epoch', 'lr'}.
    """
    try:
        payload = load_checkpoint(path)
        if isinstance(payload, dict) and "params" in payload:
            return payload
    except (pickle.UnpicklingError, UnicodeDecodeError, EOFError, KeyError):
        pass
    from d3dp_tpu.train.convert_torch import load_reference_checkpoint

    params, meta = load_reference_checkpoint(path, depth=depth)
    return {
        "params": {"params": params},
        "epoch": meta.get("epoch", 0),
        "lr": meta.get("lr"),
        "opt_state": None,
        "random_state": None,
        "min_loss": None,
    }
