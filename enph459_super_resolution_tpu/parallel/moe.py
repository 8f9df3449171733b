"""Expert parallelism: gated mixture-of-experts sharded over an ``ep`` axis.

Completes the parallelism families (dp/sp/tp in mesh.py + tiled.py, pp in
pipeline.py).  The reference has none of these (SURVEY.md §2); in an SR
conv stack the natural MoE is *spatial*: every output pixel is a softly
gated blend of E expert branches (e.g. a smooth-region expert vs an
edge/texture expert), with the gate a cheap per-pixel softmax.

TPU-native design
-----------------
* Experts are stacked on a leading ``[E, ...]`` param axis and sharded over
  the ``ep`` mesh axis — each device holds and computes only ``E/ep``
  experts (a ``vmap`` over the local slice keeps them batched on the MXU),
  so expert compute scales down per device.
* Dense soft gating: every expert sees the full input, the gate weights the
  outputs.  The combine is ONE ``psum`` of the output activations over
  ``ep`` — no all_to_all, no capacity factors, no token dropping; for the
  small expert counts useful in SR this is both simpler and faster than
  dispatch-style MoE (the a2a would move the same bytes plus routing
  metadata).
* Differentiable end-to-end (``psum``'s transpose is broadcast); composes
  with a ``dp`` axis exactly like pipeline.py: gate + expert grads land on
  the owning devices, batch grads psum over dp.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def moe_apply(expert_fn: Callable, stacked_params, gates, x, *, mesh: Mesh,
              axis: str = "ep", dp_axis: str | None = None):
    """Soft-gated mixture of experts, expert-sharded over ``axis``.

    Args:
      expert_fn: ``(params_e, x) -> y`` for one expert; all experts share
        this trace (same architecture, different weights).
      stacked_params: pytree with leading expert dim ``E`` on every leaf
        (see :func:`stack_experts`); sharded over ``axis``.
      gates: ``[B, ..., E]`` per-position mixing weights (softmax upstream;
        last dim is the expert dim, sharded over ``axis``).  Broadcasting
        against ``y``'s trailing channel dim follows numpy rules, so pass
        ``[B, H, W, E]`` gates for ``[B, H, W, C]`` outputs by expanding:
        this function inserts the channel axis itself.
      x: ``[B, ...]`` input, replicated over ``axis`` (sharded over
        ``dp_axis`` when given).

    Returns ``sum_e gates[..., e, None] * expert_fn(params_e, x)`` — equal
    (to float tolerance) to the dense single-device evaluation.
    """
    e_total = gates.shape[-1]
    ep = mesh.shape[axis]
    if e_total % ep != 0:
        raise ValueError(f"E={e_total} not divisible by ep={ep}")

    def spmd(params_local, gates_local, x):
        # [E/ep, ...] params and [..., E/ep] gates on each device
        ys = jax.vmap(expert_fn, in_axes=(0, None))(params_local, x)
        w = jnp.moveaxis(gates_local, -1, 0)[..., None]  # [E/ep, ..., 1]
        y_local = jnp.sum(w * ys, axis=0)
        return jax.lax.psum(y_local, axis)

    extra = (dp_axis,) if dp_axis else ()
    mesh_axes = (*extra, *([None] * (gates.ndim - 1 - len(extra))))
    out = jax.shard_map(
        spmd, mesh=mesh,
        in_specs=(P(axis), P(*mesh_axes, axis), P(*extra)),
        out_specs=P(*extra), check_vma=False)(stacked_params, gates, x)
    return out


def stack_experts(expert_params):
    """Stack per-expert param pytrees (identical treedefs) along a new
    leading ``E`` axis, ready for ``PartitionSpec('ep', ...)``."""
    if not expert_params:
        raise ValueError("need at least one expert")
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *expert_params)


def shard_params_ep(stacked_params, mesh: Mesh, axis: str = "ep"):
    """Place stacked expert params with the leading dim sharded over
    ``axis`` (E/ep experts per rank), everything else replicated."""
    from .mesh import shard_params_leading

    return shard_params_leading(stacked_params, mesh, axis)


def shard_params_ep_named(params, mesh: Mesh, axis: str = "ep",
                          key: str = "experts"):
    """Expert-parallel placement for a FULL model param tree: leaves whose
    path contains ``key`` (the ``nn.vmap``-stacked expert subtrees, e.g.
    ``models.zoo.MoEResBlock``'s ``experts``) get their leading ``[E,...]``
    dim sharded over ``axis``; everything else (head/tail/gates) is
    replicated.  GSPMD then computes E/ep expert branches per device and
    inserts one psum for the gated combine — the jit-native counterpart of
    :func:`moe_apply`'s explicit shard_map schedule."""
    from jax.sharding import NamedSharding

    ep = mesh.shape[axis]

    def put(path, a):
        # exact component match: a future param named e.g. 'experts_gate'
        # must NOT be silently expert-sharded (substring matching would)
        on_experts = any(str(getattr(k, "key", k)) == key for k in path)
        if on_experts and a.ndim >= 1 and a.shape[0] % ep == 0:
            spec = P(*([axis] + [None] * (a.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(a, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, params)
