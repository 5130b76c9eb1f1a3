"""Device mesh construction for data/tensor-parallel execution.

The reference is a single-process, single-device app with no distribution
story at all (SURVEY.md §2 parallelism inventory). Here the comm backend is
XLA GSPMD over ICI: a 2-D (data, model) `jax.sharding.Mesh`, `NamedSharding`
annotations, and compiler-inserted collectives — no hand-written NCCL-alike.

Pipeline parallelism is intentionally absent: every Whisper size (<=1.6 B
params) fits one v5e chip in bf16, so PP would only add bubble overhead.
Sequence/context parallelism is likewise unnecessary (encoder seq is fixed at
1500; long audio is chunk-parallel == data-parallel). Expert parallelism:
N/A, Whisper is dense. See SURVEY.md §5 "Long-context / sequence parallelism".
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_DATA = "data"
AXIS_MODEL = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    *,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, model) mesh.

    n_data defaults to len(devices) // n_model. On a real pod slice the
    device order from jax.devices() already follows the ICI torus, so the
    model axis (all-reduce heavy) lands on nearest neighbours.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % n_model != 0:
        raise ValueError(f"{n} devices not divisible by n_model={n_model}")
    if n_data is None:
        n_data = n // n_model
    if n_data * n_model != n:
        raise ValueError(
            f"mesh {n_data}x{n_model} != {n} available devices")
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, (AXIS_DATA, AXIS_MODEL))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-axis sharding for activations/inputs."""
    return NamedSharding(mesh, P(AXIS_DATA))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
