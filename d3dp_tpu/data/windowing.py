"""Fixed-length eval windowing: split ragged sequences into static-shape
(W, receptive_field, J, C) windows and stitch predictions back.

Semantics match the reference exactly (main.py:267-299, main_3dhp.py:283-332):
non-overlapping windows, RIGHT-ALIGNED final window (double-covers the tail
overlap; the stitcher lets the last window win), replicate-pad sequences
shorter than the receptive field. Static shapes are what XLA wants — the
ragged sequence never reaches the device.
"""

import numpy as np


def window_sequence(seq, receptive_field):
    """(T, ...) -> (W, receptive_field, ...) numpy windows."""
    T = seq.shape[0]
    rf = receptive_field
    out_num = T // rf + (1 if T % rf else 0)
    out_num = max(out_num, 1)

    out = np.empty((out_num, rf) + seq.shape[1:], dtype=seq.dtype)
    for i in range(out_num - 1):
        out[i] = seq[i * rf : (i + 1) * rf]
    if T < rf:
        pad = [(0, rf - T)] + [(0, 0)] * (seq.ndim - 1)
        seq = np.pad(seq, pad, mode="edge")
    out[-1] = seq[-rf:]
    return out


def stitch_windows(windows, total_frames):
    """Invert window_sequence along the frame axis.

    windows: (W, rf, ...). The final (right-aligned) window overwrites the
    tail, matching pose_post_process (main_3dhp.py:327-332).
    Returns (total_frames, ...).
    """
    W, rf = windows.shape[:2]
    out = np.empty((total_frames,) + windows.shape[2:], dtype=windows.dtype)
    for i in range(W - 1):
        out[i * rf : (i + 1) * rf] = windows[i]
    if total_frames >= rf:
        out[-rf:] = windows[-1]
    else:
        out[:] = windows[-1][:total_frames]
    return out


def sample_windows(d3dp, params, w2d, w2d_flip, bs, key, mesh=None):
    """DDIM-sample every window micro-batch -> (W, K, H, rf, J, 3) numpy.

    The shared window sampler behind main_draw's hypothesis collector and
    the in-the-wild 2D-only pipeline: pads the final micro-batch to the
    fixed shape (dropping the pad rows after the fetch), and under `mesh`
    rounds bs up to the dp quantum and shards the batch axis — the
    TPU-native replacement for the reference's DataParallel wrap
    (main.py:246-248, videopose_diffusion.py:101).
    """
    import jax
    import jax.numpy as jnp

    put = jnp.asarray
    if mesh is not None:
        from d3dp_tpu.parallel import batch_sharding, round_up_batch, put_global

        bs = round_up_batch(bs, mesh)
        sh = batch_sharding(mesh)
        put = lambda x: put_global(np.asarray(x), sh)

    W = w2d.shape[0]
    sample = jax.jit(lambda p, k, a, b: d3dp.sample(p, k, a, b))
    parts = []
    for lo in range(0, W, bs):
        hi = min(lo + bs, W)
        pad = bs - (hi - lo)
        a, b = w2d[lo:hi], w2d_flip[lo:hi]
        if pad:
            a = np.concatenate([a, np.repeat(a[:1], pad, 0)], 0)
            b = np.concatenate([b, np.repeat(b[:1], pad, 0)], 0)
        key, sub = jax.random.split(key)
        out = np.asarray(sample(params, sub, put(a), put(b)))
        parts.append(out[: hi - lo])
    return np.concatenate(parts, axis=0)


def window_batch(poses_2d, poses_3d, receptive_field, valid_frame=None):
    """Window a (T,J,2)/(T,J,3) pair (+optional (T,) valid mask) together."""
    w2d = window_sequence(poses_2d, receptive_field)
    w3d = window_sequence(poses_3d, receptive_field)
    if valid_frame is None:
        return w2d, w3d
    wv = window_sequence(np.asarray(valid_frame).astype(np.float32), receptive_field)
    return w2d, w3d, wv
