"""Device mesh construction + sharded train/eval step builders.

The reference has no parallelism at all (SURVEY.md §2: a ``for`` loop over
sessions is its unit of scale); this package *introduces* it TPU-natively:

  * ``dp``  — data parallel over batch / sessions / reps,
  * ``sp``  — spatial tiling of the image grid (halo exchange, see tiled.py),
  * ``tp``  — tensor parallel over conv feature channels.

All built on ``jax.sharding.Mesh`` + ``NamedSharding``; XLA GSPMD inserts
the collectives (gradient psum over dp, channel all-gathers for tp) and
lays them on ICI.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: Optional[Dict[str, int]] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a mesh; default is all devices on a 1-D ``dp`` axis."""
    devices = list(devices if devices is not None else jax.devices())
    if axes is None:
        axes = {"dp": len(devices)}
    names = tuple(axes)
    sizes = tuple(axes.values())
    if int(np.prod(sizes)) != len(devices):
        raise ValueError(f"mesh {axes} needs {np.prod(sizes)} devices, "
                         f"have {len(devices)}")
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, names)


def parse_mesh_spec(spec: str) -> Dict[str, int]:
    """Parse a CLI mesh spec like ``"dp=2,tp=2"`` or ``"dp=2,pp=4"``.

    Axis names must come from {dp, sp, tp, pp, ep}; sizes are positive
    ints.  The product must match the device count at :func:`make_mesh`
    time (checked there).
    """
    axes: Dict[str, int] = {}
    for part in spec.replace("x", ",").split(","):
        part = part.strip()
        if not part:
            continue
        if "=" not in part:
            raise ValueError(f"mesh spec entry {part!r} is not name=size")
        name, _, size = part.partition("=")
        name = name.strip()
        if name not in ("dp", "sp", "tp", "pp", "ep"):
            raise ValueError(
                f"unknown mesh axis {name!r} (use dp/sp/tp/pp/ep)")
        if name in axes:
            raise ValueError(f"duplicate mesh axis {name!r}")
        axes[name] = int(size)
        if axes[name] < 1:
            raise ValueError(f"mesh axis {name}={axes[name]} must be >= 1")
    if not axes:
        raise ValueError(f"empty mesh spec {spec!r}")
    return axes


def parse_sp_spec(spec) -> tuple:
    """Parse a spatial-sharding spec into ``(sp_h, sp_w)``.

    ``4`` / ``"4"`` -> (4, 1) rows-only strips; ``"4x2"`` -> (4, 2) H x W
    tiles (``sr.run --sp 4x2``).  ``(h, w)`` tuples pass through.
    """
    if isinstance(spec, int):
        h, w = spec, 1
    elif isinstance(spec, (tuple, list)):
        if len(spec) != 2:
            raise ValueError(f"sp spec tuple must be (h, w), got {spec!r}")
        h, w = int(spec[0]), int(spec[1])
    else:
        parts = str(spec).lower().split("x")
        if len(parts) > 2 or not all(p.strip().isdigit() for p in parts):
            raise ValueError(
                f"sp spec must be N or NxM (e.g. 8 or 4x2), got {spec!r}")
        h = int(parts[0])
        w = int(parts[1]) if len(parts) == 2 else 1
    if h < 1 or w < 1:
        raise ValueError(f"sp factors must be >= 1, got {h}x{w}")
    return h, w


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard the leading (batch) dim over ``axis``, replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params_tp(params, mesh: Mesh, axis: str = "tp"):
    """Tensor-parallel param layout: shard every conv kernel's output-feature
    dim (last axis) over ``axis`` when divisible; replicate everything else.

    With NHWC convs, sharding kernels on O and activations on C makes GSPMD
    keep activations channel-sharded through the trunk (all-gathering only
    where a layer mixes channels in unsupported ways).
    """
    tp = mesh.shape[axis]

    def spec_for(x):
        if x.ndim >= 1 and x.shape[-1] % tp == 0 and x.shape[-1] >= tp * 8:
            return NamedSharding(mesh, P(*([None] * (x.ndim - 1) + [axis])))
        return NamedSharding(mesh, P())

    return jax.tree.map(
        lambda x: jax.device_put(x, spec_for(x)), params)


def shard_params_leading(stacked_params, mesh: Mesh, axis: str):
    """Place a stacked param pytree with every leaf's LEADING dim sharded
    over ``axis``, the rest replicated — the common layout for pipeline
    stages ([pp, ...]) and MoE experts ([E, ...])."""

    def put(a):
        return jax.device_put(
            a, NamedSharding(mesh, P(*([axis] + [None] * (a.ndim - 1)))))

    return jax.tree.map(put, stacked_params)


def shard_train_step(step_fn, mesh: Mesh, dp_axis: str = "dp",
                     sp_axis: Optional[str] = None):
    """Jit a ``step(state, lr, hr)`` with batch sharded over ``dp`` (and,
    when ``sp_axis`` is given, the patch H dim sharded over ``sp`` — GSPMD
    inserts the conv halo exchanges) and the state's sharding left to GSPMD
    (replicated params by default; TP-sharded if the caller laid the state
    out with :func:`shard_params_tp`), donating the state buffers."""
    dims = [dp_axis if dp_axis in mesh.shape else None]
    if sp_axis and sp_axis in mesh.shape:
        dims.append(sp_axis)
    data_s = NamedSharding(mesh, P(*dims))
    return jax.jit(
        step_fn,
        in_shardings=(None, data_s, data_s),
        donate_argnums=(0,),
    )
