"""Particle-axis data parallelism over a JAX device mesh.

The reference's only parallelism is threads across particles
(SURVEY.md §2.4); the TPU-native equivalent is a 1-D mesh over the
particle axis. Per-particle work (covariance assembly, Cholesky, LML,
MH/HMC rejuvenation) is embarrassingly parallel; the only cross-particle
communication is in resampling — a logsumexp all-reduce of the weights and
an all-gather/permute of the resampled particle states — which XLA lowers
to ICI collectives automatically from the sharding annotations.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from autogp_tpu.inference import smc

PARTICLE_AXIS = "particles"


def particle_mesh(n_devices: Optional[int] = None,
                  devices=None) -> Mesh:
    """1-D mesh over the particle axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (PARTICLE_AXIS,))


def particle_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(PARTICLE_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_particles(particles: smc.Particles, mesh: Mesh) -> smc.Particles:
    """Place the particle batch with axis 0 sharded across the mesh.

    Scalars (log_ml_est) are replicated. Requires P % n_devices == 0.
    """
    ps = particle_sharding(mesh)
    rep = replicated_sharding(mesh)

    def put(x):
        if getattr(x, "ndim", 0) >= 1:
            return jax.device_put(x, ps)
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map(put, particles)


def replicate_dataset(data: smc.Dataset, mesh: Mesh) -> smc.Dataset:
    rep = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), data)
