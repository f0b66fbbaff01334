"""Distributed runtime: device mesh, sharding rules, parallel train step.

The reference is strictly single-process, single-device (SURVEY.md §2.10: no
torch.distributed anywhere; explicit .to(device)/.cpu() per batch). This
package is therefore designed from scratch for the TPU execution model:
jax.sharding.Mesh + NamedSharding + jit auto-partitioning; gradient reduction,
TP collectives and doc-axis gathers are inserted by XLA and ride ICI.
"""

from ptranking_tpu.parallel.mesh import (
    expert_param_sharding,
    MeshConfig,
    make_mesh,
    batch_sharding,
    replicated,
    scorer_param_sharding,
)
from ptranking_tpu.parallel.mesh import make_hybrid_mesh, mesh_from_dict
from ptranking_tpu.parallel.ot import cp_wass_rank
from ptranking_tpu.parallel.ring import (
    reference_attention,
    ring_attention,
    ring_lambda_loss,
    ring_soft_rank,
    ulysses_attention,
)
from ptranking_tpu.parallel.pipeline import (
    gpipe,
    pipeline_encoder_apply,
    stack_encoder_layers,
)
from ptranking_tpu.parallel.train import DistributedTrainer

__all__ = [
    "make_hybrid_mesh",
    "mesh_from_dict",
    "cp_wass_rank",
    "reference_attention",
    "ring_attention",
    "ring_lambda_loss",
    "ring_soft_rank",
    "ulysses_attention",
    "gpipe",
    "pipeline_encoder_apply",
    "stack_encoder_layers",
    "expert_param_sharding",
    "MeshConfig",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "scorer_param_sharding",
    "DistributedTrainer",
]
