"""Parallelism layer (ref §2.6: DDP/NCCL → mesh + GSPMD + multihost):

- mesh.py           — (dp, pp, fsdp, tp) device mesh construction
- sharding.py       — path-pattern GSPMD sharding rules; param/batch placement
- pipeline.py       — GPipe pipeline parallelism over the stacked decoder
- sequence_parallel.py — TRUE sp: activations sharded along T through the stack
- ring_attention.py — ring attention collective (ppermute KV rotation)
- multihost.py      — jax.distributed init, rank gating, cross-host gathers
"""

from .mesh import (
    AXES,
    DP_AXIS,
    FSDP_AXIS,
    PP_AXIS,
    TP_AXIS,
    auto_mesh,
    make_mesh,
    single_device_mesh,
)
from .multihost import (
    broadcast_from_main,
    gather_predictions,
    initialize_distributed,
    is_main_process,
    process_count,
    sync_hosts,
)
from .pipeline import pipeline_decoder_forward
from .ring_attention import ring_attention
from .sequence_parallel import sp_decoder_forward
from .sharding import batch_shardings, param_shardings, shard_batch, shard_params, spec_for_path

__all__ = [
    "AXES", "DP_AXIS", "FSDP_AXIS", "PP_AXIS", "TP_AXIS",
    "auto_mesh", "make_mesh", "single_device_mesh",
    "broadcast_from_main", "gather_predictions", "initialize_distributed",
    "is_main_process", "process_count", "sync_hosts",
    "pipeline_decoder_forward",
    "ring_attention", "sp_decoder_forward",
    "batch_shardings", "param_shardings", "shard_batch", "shard_params",
    "spec_for_path",
]
