"""Platform detection keyed on where data actually LIVES, not the process
default backend.

Round-1 failure mode (MULTICHIP_r01): every Pallas interpret/impl decision
keyed on ``jax.default_backend()``, which is "tpu" in a TPU-attached container
even when the computation runs on a virtual CPU mesh — the kernels then
launched compiled (non-interpret) Mosaic code on CPU devices and died.  Every
call site now asks "what platform is THIS array / mesh / sharding on?" and
falls back to the default backend only when nothing better is known.
"""

from __future__ import annotations

import jax


def platform_of(obj=None) -> str:
    """Best-effort platform ("tpu"/"cpu"/"gpu") of an array, Mesh, Sharding,
    or Device; ``jax.default_backend()`` for None / tracers / numpy."""
    if obj is None:
        return jax.default_backend()
    # jax.Array: .devices() is a method returning a set of Devices
    devs = getattr(obj, "devices", None)
    if callable(devs):
        try:
            return next(iter(obj.devices())).platform
        except Exception:
            return jax.default_backend()
    # jax.sharding.Mesh: .devices is an ndarray of Devices
    if devs is not None:
        try:
            return devs.flat[0].platform
        except Exception:
            return jax.default_backend()
    # jax.sharding.Sharding: .device_set
    ds = getattr(obj, "device_set", None)
    if ds:
        return next(iter(ds)).platform
    # jax.Device
    p = getattr(obj, "platform", None)
    if isinstance(p, str):
        return p
    return jax.default_backend()
