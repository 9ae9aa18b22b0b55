"""Quaternion rotation primitives, pure jax.numpy.

Capability parity with the reference's torch implementation
(reference: common/quaternion.py:3-28), but written as broadcasting jnp
functions so they trace cleanly under jit/vmap and never materialise the
tiled quaternion arrays the reference builds host-side.
"""

import jax.numpy as jnp


def qrot(q, v):
    """Rotate vector(s) ``v`` by unit quaternion(s) ``q``.

    q: (..., 4) in (w, x, y, z) convention; v: (..., 3). Shapes broadcast
    against each other (the reference requires identical leading shapes and
    tiles host-side; broadcasting subsumes that).
    Returns (..., 3).
    """
    assert q.shape[-1] == 4
    assert v.shape[-1] == 3

    qvec = q[..., 1:]
    uv = jnp.cross(qvec, v)
    uuv = jnp.cross(qvec, uv)
    return v + 2.0 * (q[..., :1] * uv + uuv)


def qinverse(q):
    """Inverse of unit quaternion(s): conjugate. q: (..., 4) -> (..., 4)."""
    assert q.shape[-1] == 4
    return jnp.concatenate([q[..., :1], -q[..., 1:]], axis=-1)
