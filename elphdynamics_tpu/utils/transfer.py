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


@jax.jit
def _pack_tree_flat(leaves):
    """Concatenate every leaf (complex → interleaved re/im) into ONE flat
    real buffer — a single host fetch replaces one round trip per leaf
    (the per-leaf axon transfer latency dominated write_time at many-bin
    cadence). The packing dtype is the widest real dtype present."""
    wide = any(jnp.asarray(a).dtype in (jnp.float64, jnp.complex128)
               for a in leaves)
    dt = jnp.float64 if wide else jnp.float32
    parts = []
    for a in leaves:
        a = jnp.asarray(a)
        if jnp.iscomplexobj(a):
            parts.append(jnp.stack([jnp.real(a), jnp.imag(a)],
                                   axis=-1).reshape(-1).astype(dt))
        else:
            parts.append(a.reshape(-1).astype(dt))
    return jnp.concatenate(parts)


def tree_to_host(tree):
    leaves, treedef = jax.tree.flatten(tree)
    if not leaves or all(isinstance(a, np.ndarray) or np.isscalar(a)
                         for a in leaves):
        return tree
    if not all(jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)
               or jnp.issubdtype(jnp.asarray(a).dtype, jnp.complexfloating)
               for a in leaves):
        # non-float leaves (ints/bools): per-leaf fallback
        return jax.tree.map(device_to_host, tree)
    # leaves committed to different device sets (e.g. a site-sharded field
    # next to a default-device scalar after a special update gathered one of
    # them) cannot feed one jitted pack — normalize placement first
    device_sets = {tuple(sorted(d.id for d in a.sharding.device_set))
                   for a in leaves if hasattr(a, "sharding")}
    if len(device_sets) > 1:
        dev0 = jax.devices()[0]
        leaves = [jax.device_put(a, dev0) if hasattr(a, "sharding") else a
                  for a in leaves]
    flat = np.asarray(_pack_tree_flat(leaves))
    out = []
    pos = 0
    for a in leaves:
        shape = np.shape(a)
        n = int(np.prod(shape)) if shape else 1
        if np.iscomplexobj(a):
            seg = flat[pos:pos + 2 * n]
            out.append((seg[0::2] + 1j * seg[1::2]).reshape(shape))
            pos += 2 * n
        else:
            dt = np.dtype(jnp.asarray(a).dtype)
            out.append(flat[pos:pos + n].reshape(shape).astype(dt))
            pos += n
    return jax.tree.unflatten(treedef, out)


def tree_to_device(tree):
    return jax.tree.map(host_to_device, tree)
