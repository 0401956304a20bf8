"""Device mesh construction.

Replaces the reference's DDP/NCCL process groups (ref: train/train.py:136-141,
232-238) with a single ``jax.sharding.Mesh``: data parallelism is the "dp"
axis, tensor parallelism "tp", optional fully-sharded "fsdp". Collectives are
inserted by GSPMD and ride ICI within a slice / DCN across slices.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec

DP_AXIS = "dp"
PP_AXIS = "pp"
FSDP_AXIS = "fsdp"
TP_AXIS = "tp"
AXES = (DP_AXIS, PP_AXIS, FSDP_AXIS, TP_AXIS)


def make_mesh(
    dp: int = 1,
    fsdp: int = 1,
    tp: int = 1,
    pp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (dp, pp, fsdp, tp) mesh over the available devices.

    Axis sizes must multiply to the device count. TP should map to the
    innermost (fastest ICI) axis, which ``create_device_mesh`` arranges; pp
    (stage-to-stage activations, one hop per microbatch tick) sits outside
    fsdp/tp but inside dp.
    """
    devices = list(devices if devices is not None else jax.devices())
    want = dp * fsdp * tp * pp
    if want != len(devices):
        raise ValueError(
            f"mesh dp{dp}xpp{pp}xfsdp{fsdp}xtp{tp} = {want} != {len(devices)} devices"
        )
    mesh_devices = mesh_utils.create_device_mesh((dp, pp, fsdp, tp), devices=devices)
    return Mesh(mesh_devices, AXES)


def single_device_mesh() -> Mesh:
    return make_mesh(1, 1, 1, devices=jax.devices()[:1])


def auto_mesh(n_devices: Optional[int] = None, prefer_tp: int = 1) -> Mesh:
    """Sensible default: all devices on dp unless a tp degree is requested."""
    n = n_devices or len(jax.devices())
    tp = prefer_tp if n % prefer_tp == 0 else 1
    return make_mesh(dp=n // tp, fsdp=1, tp=tp, devices=jax.devices()[:n])


def named(mesh: Mesh, *axes) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec(*axes))
