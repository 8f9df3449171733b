"""Mesh parallelism: DP/TP shardings, tiled halo-exchange spatial compute,
GPipe-style pipeline parallelism, expert-sharded MoE."""

from .mesh import (
    batch_sharding,
    make_mesh,
    parse_mesh_spec,
    replicated,
    shard_params_tp,
    shard_train_step,
)
from .moe import moe_apply, shard_params_ep, stack_experts
from .pipeline import pipeline_apply, shard_params_pp, stack_stages
from .tiled import halo_exchange, sharded_ibp, solve_sharded, tiled_apply

__all__ = [
    "batch_sharding", "make_mesh", "parse_mesh_spec", "replicated",
    "shard_params_tp",
    "shard_train_step", "halo_exchange", "sharded_ibp", "solve_sharded",
    "tiled_apply",
    "pipeline_apply", "shard_params_pp", "stack_stages",
    "moe_apply", "shard_params_ep", "stack_experts",
]
