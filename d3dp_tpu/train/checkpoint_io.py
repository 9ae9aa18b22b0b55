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
    """Host-materialize a pytree. Under jax.distributed, tp-sharded leaves
    span non-addressable devices and np.asarray would raise — gather them
    first (collective: every process must reach this call)."""

    def conv(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils

            x = multihost_utils.process_allgather(x, tiled=True)
        return np.asarray(x)

    return jax.tree_util.tree_map(conv, tree)


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
    # multihost: the gathers above are collective (all processes), but only
    # process 0 writes — concurrent writers to one path on a shared
    # filesystem would corrupt the file
    if jax.process_index() != 0:
        return
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def load_checkpoint(path):
    with open(path, "rb") as f:
        return pickle.load(f)


def latest_checkpoint(directory):
    """Newest epoch_N.{ckpt,orbax} in a directory, or best_epoch.*, or None
    — enables `--resume auto` elastic restart after interruption."""
    import glob
    import re

    candidates = (glob.glob(os.path.join(directory, "epoch_*.ckpt"))
                  + glob.glob(os.path.join(directory, "epoch_*.orbax")))
    if candidates:
        return max(candidates,
                   key=lambda p: int(re.findall(r"epoch_(\d+)", p)[0]))
    for name in ("best_epoch.ckpt", "best_epoch.orbax"):
        best = os.path.join(directory, name)
        if os.path.exists(best):
            return best
    return None


_async_checkpointer = None


def _pack_random_state(rs):
    """numpy RandomState tuple -> uint8 array leaf (orbax stores array
    pytrees; the state round-trips through our own pickle bytes)."""
    if rs is None:
        return None
    return np.frombuffer(
        pickle.dumps(rs, protocol=pickle.HIGHEST_PROTOCOL), np.uint8).copy()


def _unpack_random_state(arr):
    if arr is None:
        return None
    return pickle.loads(np.asarray(arr, np.uint8).tobytes())


def save_checkpoint_orbax(directory, *, epoch, lr, params, opt_state=None,
                          generator_random_state=None, min_loss=None,
                          wait=True):
    """Orbax backend: same logical payload as the pickle format — the
    reference contract {epoch, lr, random_state, optimizer, model_pos}
    (main.py:539-572) — in a sharding-aware, async-capable format
    (preferred for multi-host runs; the pickle format stays the
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
        "random_state": _pack_random_state(generator_random_state),
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

    wait_for_checkpoints()  # a pending async save of this dir must commit
    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(os.path.abspath(directory))
    meta = payload.get("meta", {})

    def scalar(x):
        return None if x is None else np.asarray(x).item()

    return {
        "params": payload["params"],
        "opt_state": payload.get("opt_state"),
        "epoch": scalar(meta.get("epoch")),
        "lr": scalar(meta.get("lr")),
        "min_loss": scalar(meta.get("min_loss")),
        "random_state": _unpack_random_state(payload.get("random_state")),
    }


def restore_opt_state(ref_opt_state, loaded):
    """Rebuild a live optimizer state from a checkpoint payload.

    `loaded` may be the optax namedtuple tree (pickle format) or the
    dict/list tree orbax restores it as — either way the LEAVES are in
    tree_flatten order of the same logical structure, so they are matched
    positionally onto the live state's treedef and device_put with each
    reference leaf's sharding (mesh-aware resume). Shapes are checked
    leaf-by-leaf to catch container-flavor mismatches."""
    ref_leaves, treedef = jax.tree_util.tree_flatten(ref_opt_state)
    loaded_leaves = jax.tree_util.tree_leaves(loaded)
    if len(ref_leaves) != len(loaded_leaves):
        raise ValueError(
            f"optimizer state leaf count mismatch: checkpoint has "
            f"{len(loaded_leaves)}, live optimizer expects {len(ref_leaves)}"
        )
    out = []
    for ref, x in zip(ref_leaves, loaded_leaves):
        x = np.asarray(x)
        if tuple(x.shape) != tuple(ref.shape):
            raise ValueError(
                f"optimizer state leaf shape mismatch: checkpoint "
                f"{x.shape} vs live {ref.shape}")
        out.append(jax.device_put(x.astype(ref.dtype), ref.sharding))
    return jax.tree_util.tree_unflatten(treedef, out)


def save_checkpoint_any(path, fmt="pickle", **kw):
    """Dispatch on --ckpt-format: 'pickle' (atomic single file) or 'orbax'
    (directory; pass wait=False for async periodic saves)."""
    if fmt == "orbax":
        save_checkpoint_orbax(path, **kw)
    else:
        kw.pop("wait", None)
        save_checkpoint(path, **kw)


def load_any(path, depth=8):
    """Load our .ckpt pickle, an orbax checkpoint directory, or a reference
    torch .bin.

    Returns dict with at least {'params': flax-params-pytree, 'epoch', 'lr'}.
    """
    if os.path.isdir(path):
        return load_checkpoint_orbax(path)
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
