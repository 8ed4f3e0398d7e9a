"""Data parallelism over a jax.sharding.Mesh.

The reference's only multi-device mechanism is single-process
nn.DataParallel (interfaces/base.py:160-162; SURVEY §2 P1/P2) — replicate
modules, scatter the batch, gather outputs.  The TPU-native equivalent is
sharding, not replication-by-copy: the train state lives replicated across
a 1-D 'data' mesh, batches are sharded on their leading axis, and XLA
inserts the gradient all-reduce over ICI automatically from the sharding
annotations.  No NCCL/MPI translation exists because the reference has no
collectives to translate.

The mesh is built 2-D ('data', 'model') with model=1 today; the 'model'
axis is the seam for tensor-parallel PGRM attention if the refiner is ever
scaled past one chip's HBM.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int = 0, model_parallel: int = 1) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(
            f"make_mesh: need {n} devices, have {len(devs)} on platform "
            f"'{jax.default_backend()}'. For a virtual mesh, set "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n} and pin "
            "jax.config.update('jax_platforms', 'cpu') BEFORE jax initializes "
            "its backend (see tests/conftest.py)."
        )
    if n % model_parallel:
        raise ValueError(
            f"make_mesh: n_devices={n} is not divisible by model_parallel={model_parallel}"
        )
    devs = np.asarray(devs[:n]).reshape(n // model_parallel, model_parallel)
    return Mesh(devs, ("data", "model"))


def init_multihost(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> None:
    """Join a multi-host (DCN) job before any backend touch.

    The reference is strictly single-node (SURVEY §2 P1/P2: nn.DataParallel,
    no collectives), so nothing here is a port — this is the TPU-native
    scale-out seam: after initialize(), jax.devices() spans every host's
    chips, make_mesh() lays the 'data' axis across them, and the same
    sharding annotations emit ICI collectives within a slice and DCN
    collectives across hosts.  On Cloud TPU pods all three arguments are
    auto-detected from the metadata server; pass them explicitly elsewhere
    (DPMN_TPU_COORDINATOR style env wiring is the caller's choice)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def shard_batch(mesh: Mesh, *arrays):
    sharding = NamedSharding(mesh, P("data"))
    out = tuple(jax.device_put(a, sharding) for a in arrays)
    return out if len(out) > 1 else out[0]


def shard_host_batch(mesh: Mesh, *arrays):
    """Multi-host-safe batch sharding: each process passes ITS local batch
    rows and gets back a global array sharded on the mesh 'data' axis
    (jax.device_put of a full global batch only works single-process).
    Equivalent to shard_batch on one host."""
    sharding = NamedSharding(mesh, P("data"))
    out = tuple(
        jax.make_array_from_process_local_data(sharding, np.asarray(a))
        for a in arrays
    )
    return out if len(out) > 1 else out[0]


def replicate_state(mesh: Mesh, state):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(state, sharding)


def make_parallel_trainer(system, mesh: Mesh):
    """Wrap a DPMNSystem's step functions with mesh shardings.

    Returns (train_step, sr_forward) operating on a replicated state and
    batch-sharded images; gradient reduction is XLA-inserted.
    """
    rep = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))

    train_step = jax.jit(
        system._train_step_impl,
        in_shardings=(rep, data, data, rep),
        out_shardings=(rep, rep),
    )
    sr_forward = jax.jit(
        system._sr_forward_impl,
        static_argnums=(2,),  # glyph_from_psn — the test() quirk toggle
        in_shardings=(rep, data),
        out_shardings=data,
    )
    return train_step, sr_forward
