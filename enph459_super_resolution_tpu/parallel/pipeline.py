"""Pipeline parallelism: stage-sharded trunks via shard_map + ppermute.

The reference has no parallelism at all (SURVEY.md §2 negative findings);
dp/sp/tp live in mesh.py / tiled.py.  This module adds the fourth family —
**pipeline parallel** — for deep layer-sequential trunks (EDSR / RRDB
stacks): the trunk is split into ``pp`` equal stages, one stage's params
per device along a ``pp`` mesh axis, and microbatches flow device-to-device
over ICI via ``lax.ppermute`` in the classic GPipe fill/drain schedule.

TPU-native design notes
-----------------------
* One SPMD program: every device runs the same ``lax.scan`` over the
  ``n_micro + pp - 1`` schedule steps; stage identity comes from
  ``lax.axis_index`` — no per-device Python, so GSPMD/XLA see a single
  static graph with one ``collective_permute`` per step riding ICI.
* Differentiable end-to-end: ``ppermute``'s transpose is the reverse
  permute, so ``jax.grad`` through :func:`pipeline_apply` implements the
  backward pipeline automatically (fill/drain mirrored), and stage params
  receive grads on the device that owns them.
* Composes with dp: the microbatch dim can additionally be sharded over a
  data-parallel axis (``dp_axis``); the two communication patterns are
  orthogonal (ppermute on pp, grad-psum on dp) and XLA lays both on ICI.
* Bubble fraction is (pp-1)/(n_micro+pp-1) — choose ``n_micro >= pp``.
  Stages must be shape-preserving (resblock stacks are), which is what
  makes the one-program scan possible.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_stages(stage_params: Sequence):
    """Stack per-stage param pytrees (identical treedefs) along a new
    leading 'pp' axis, giving leaves of shape ``[pp, ...]`` ready to be
    sharded with ``PartitionSpec('pp', ...)``."""
    if not stage_params:
        raise ValueError("need at least one stage")
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *stage_params)


def pipeline_apply(stage_fn: Callable, stacked_params, x, *, mesh: Mesh,
                   axis: str = "pp", n_micro: int | None = None,
                   dp_axis: str | None = None):
    """Apply ``pp`` shape-preserving stages as a GPipe pipeline.

    Args:
      stage_fn: ``(params_i, u) -> u`` with identical input/output shapes
        (e.g. a stack of residual blocks); traced once, same for every
        stage.
      stacked_params: pytree with leading stage dim ``pp`` on every leaf
        (see :func:`stack_stages`); sharded over ``axis``.
      x: ``[B, ...]`` activations; ``B`` divisible by ``n_micro`` (and the
        microbatch by the dp axis size when ``dp_axis`` is given).
      mesh: mesh containing ``axis`` (and optionally ``dp_axis``).
      n_micro: number of microbatches (default: pipeline depth ``pp``).

    Returns ``[B, ...]`` outputs equal (to float tolerance) to applying the
    stages sequentially on one device.
    """
    pp = mesh.shape[axis]
    if n_micro is None:
        n_micro = pp
    b = x.shape[0]
    if b % n_micro != 0:
        raise ValueError(f"batch {b} not divisible by n_micro={n_micro}")
    mb = b // n_micro
    if dp_axis and mb % mesh.shape[dp_axis] != 0:
        raise ValueError(f"microbatch {mb} (= batch {b} / n_micro "
                         f"{n_micro}) not divisible by "
                         f"{dp_axis}={mesh.shape[dp_axis]}")
    xm = x.reshape(n_micro, mb, *x.shape[1:])
    perm = [(d, d + 1) for d in range(pp - 1)]

    def spmd(params_local, xm):
        # leading stage dim is 1 on each device after sharding
        params = jax.tree.map(lambda a: a[0], params_local)
        i = jax.lax.axis_index(axis)

        def step(carry, t):
            # stage 0 consumes microbatch t (clamped during drain); every
            # other stage consumes what its predecessor sent last step
            inp = jnp.where(i == 0, xm[jnp.clip(t, 0, n_micro - 1)], carry)
            out = stage_fn(params, inp)
            nxt = jax.lax.ppermute(out, axis, perm)
            # the last stage emits microbatch t-(pp-1) once the fill ends
            emit = jnp.where(i == pp - 1, out, jnp.zeros_like(out))
            return nxt, emit

        _, emitted = jax.lax.scan(step, jnp.zeros_like(xm[0]),
                                  jnp.arange(n_micro + pp - 1))
        ym = emitted[pp - 1:]  # drop the fill steps
        # Only the last stage holds real outputs (zeros elsewhere): psum
        # broadcasts them to every pp rank so downstream (replicated-over-pp)
        # layers see the full activation.
        return jax.lax.psum(ym, axis)

    extra = (dp_axis,) if dp_axis else ()
    data_spec = P(None, *extra)  # [n_micro, mb, ...]: mb over dp if present
    out = jax.shard_map(spmd, mesh=mesh,
                        in_specs=(P(axis), data_spec),
                        out_specs=data_spec, check_vma=False)(
        stacked_params, xm)
    return out.reshape(b, *x.shape[1:])


def make_pipelined_edsr_apply(model, mesh: Mesh, *, axis: str = "pp",
                              dp_axis: str | None = None,
                              n_micro: int | None = None):
    """Pipelined forward for an ``EDSR(scan_trunk=True)`` model.

    Returns ``apply(variables, x)`` computing the same function as
    ``model.apply`` (parity-tested) but with the scanned trunk's stacked
    ``[n_resblocks, ...]`` params regrouped into ``pp`` stages of
    ``n_resblocks/pp`` blocks and run as a GPipe pipeline over ``axis``
    (:func:`pipeline_apply`).  Head/tail/upsampler stay replicated — they
    are a few percent of the FLOPs; the deep trunk is what a pipeline
    buys memory/scale headroom for.  Intended for training: the returned
    fn is what ``train.loop --mesh "dp=..,pp=.."`` feeds to the train
    step; single-device eval keeps using ``model.apply`` on the SAME
    params (the scan layout makes both views of one pytree).
    """
    import flax.linen as nn

    from ..models.common import DIV2K_RGB_MEAN, ResBlock, Upsampler

    if not getattr(model, "scan_trunk", False):
        raise ValueError("pipelined apply needs EDSR(scan_trunk=True)")
    pp = mesh.shape[axis]
    if model.n_resblocks % pp != 0:
        raise ValueError(
            f"n_resblocks={model.n_resblocks} not divisible by pp={pp}")
    gsize = model.n_resblocks // pp
    block = ResBlock(model.n_feats, model.res_scale, dtype=model.dtype)
    head = nn.Conv(model.n_feats, (3, 3), dtype=model.dtype)
    tail = nn.Conv(model.n_feats, (3, 3), dtype=model.dtype)
    ups = Upsampler(model.scale, model.n_feats, dtype=model.dtype)
    out = nn.Conv(model.channels, (3, 3), dtype=model.dtype)
    mean = jnp.asarray(DIV2K_RGB_MEAN, jnp.float32) * model.rgb_range
    if model.channels != len(DIV2K_RGB_MEAN):
        mean = jnp.mean(mean, keepdims=True)

    def stage_fn(stage_params, u):
        def body(c, p):
            return block.apply({"params": p}, c), None

        u, _ = jax.lax.scan(body, u, stage_params)
        return u

    def apply(variables, x):
        p = variables["params"]
        x = (x - mean).astype(model.dtype)
        x = h = head.apply({"params": p["head"]}, x)
        stacked = jax.tree.map(
            lambda a: a.reshape(pp, gsize, *a.shape[1:]),
            p["trunk"]["ResBlock_0"])
        x = pipeline_apply(stage_fn, stacked, x, mesh=mesh, axis=axis,
                           n_micro=n_micro, dp_axis=dp_axis)
        x = tail.apply({"params": p["tail_conv"]}, x)
        x = x + h
        x = ups.apply({"params": p["upsampler"]}, x)
        x = out.apply({"params": p["out_conv"]}, x)
        return x.astype(jnp.float32) + mean

    return apply


def shard_edsr_pp_params(variables, mesh: Mesh, axis: str = "pp"):
    """Place an ``EDSR(scan_trunk=True)`` param tree for pipeline
    parallelism: the scanned trunk's stacked leaves get their leading
    ``[n_resblocks]`` dim sharded over ``axis`` (contiguous block groups —
    matching :func:`make_pipelined_edsr_apply`'s ``[pp, n/pp]`` regroup),
    everything else replicated."""

    def put(path, a):
        on_trunk = any(getattr(k, "key", None) == "trunk" for k in path)
        spec = (P(axis, *([None] * (a.ndim - 1))) if on_trunk and a.ndim >= 1
                else P())
        return jax.device_put(a, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, variables)


def shard_params_pp(stacked_params, mesh: Mesh, axis: str = "pp"):
    """Place stacked stage params with the leading dim sharded over
    ``axis`` (one stage per pp rank), everything else replicated."""
    from .mesh import shard_params_leading

    return shard_params_leading(stacked_params, mesh, axis)
