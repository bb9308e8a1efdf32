"""Device->host transfer helper for tunneled TPUs.

Measured on the axon relay: device->host pulls of buffers smaller than
64 bytes stall for ~10-16 s (a pathological small-message path), while
>= 64-byte pulls take ~10 ms and uploads are sub-millisecond at any size.
`device_get` pads tiny buffers on device (one cheap dispatch) before
pulling, so no call site can hit the cliff.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_MIN_BYTES = 256  # comfortable margin above the measured 64-byte cliff


@jax.jit
def _pad64(flat):
    return jnp.concatenate([flat, jnp.zeros(64, flat.dtype)])


def device_get(x) -> np.ndarray:
    """np.asarray(x) that never performs a sub-64-byte transfer."""
    if isinstance(x, np.ndarray) or np.isscalar(x):
        return np.asarray(x)
    size = int(np.prod(x.shape)) if x.shape else 1
    nbytes = size * x.dtype.itemsize
    if nbytes >= _MIN_BYTES:
        return np.asarray(x)
    flat = _pad64(x.reshape(-1))
    return np.asarray(flat)[:size].reshape(x.shape)


def device_get_scalar(x):
    return device_get(x).reshape(()).item()
