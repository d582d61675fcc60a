"""Host↔device transfer shims.

The axon TPU runtime in this environment does not implement host transfers
of complex-typed or >4-D buffers (plain f32 1-D/2-D transfers always work).
These helpers move any pytree across the boundary by packing every leaf into
a flat real buffer on-device (inside jit, where complex arithmetic is fully
supported) and reassembling on the other side. No-ops in effect on normal
backends — the packing is two cheap fused ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _pack_complex(a):
    return jnp.stack([jnp.real(a), jnp.imag(a)], axis=-1).reshape(-1)


@jax.jit
def _flatten(a):
    return a.reshape(-1)


def device_to_host(x) -> np.ndarray:
    """np.asarray for a single device array, routing around unsupported
    complex / high-rank transfers."""
    if isinstance(x, np.ndarray) or np.isscalar(x):
        return np.asarray(x)
    shape = x.shape
    if jnp.iscomplexobj(x):
        flat = np.asarray(_pack_complex(x))
        c = flat[0::2] + 1j * flat[1::2]
        return c.reshape(shape)
    if x.ndim > 2:
        return np.asarray(_flatten(x)).reshape(shape)
    return np.asarray(x)


def host_to_device(a: np.ndarray, dtype=None):
    """jnp.asarray routing around unsupported complex / high-rank uploads."""
    a = np.asarray(a)
    if dtype is not None:
        a = a.astype(dtype)
    if np.iscomplexobj(a):
        flat = np.empty(a.size * 2, dtype=np.float64 if a.dtype == np.complex128
                        else np.float32)
        flat[0::2] = a.real.reshape(-1)
        flat[1::2] = a.imag.reshape(-1)
        dev = jnp.asarray(flat)
        return _unpack_complex(dev, a.shape)
    if a.ndim > 2:
        dev = jnp.asarray(a.reshape(-1))
        return _reshape_dev(dev, a.shape)
    return jnp.asarray(a)


@jax.jit
def _unpack_complex_flat(flat):
    return flat[0::2] + 1j * flat[1::2]


def _unpack_complex(flat_dev, shape):
    c = _unpack_complex_flat(flat_dev)
    return jax.jit(lambda v: v.reshape(shape))(c)


def _reshape_dev(flat_dev, shape):
    return jax.jit(lambda v: v.reshape(shape))(flat_dev)


def tree_to_host(tree):
    return jax.tree.map(device_to_host, tree)


def tree_to_device(tree):
    return jax.tree.map(host_to_device, tree)
