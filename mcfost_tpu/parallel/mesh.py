"""Multi-device parallelism for the MC transport.

TPU-native replacement for the reference's OpenMP threading
(dust_transfer.f90:533-605): photon packets are data-parallel across a
`jax.sharding.Mesh`; each device runs the fused MC kernel on its own lane
block with an independent RNG key and *private tally arrays*, which are then
`psum`-reduced over ICI — the exact analogue of the reference's per-thread
trailing-dimension tallies summed at the end
(radiation_field.f90:20-23, thermal_emission.f90:668).

Axes:
* ``dp`` — packet data parallelism (always);
* model arrays are replicated (they are small: grids, CDF tables).

Spatial (cell) domain decomposition with collective packet routing is the
next scaling axis (see SURVEY §2.7) and will plug in here.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..mc.model import Model
from ..mc import thermal_mc


def make_mesh(devices: Sequence[jax.Device] | None = None,
              axis: str = "dp") -> Mesh:
    devs = np.array(devices if devices is not None else jax.devices())
    return Mesh(devs, (axis,))


def run_thermal_mc_sharded(model: Model, key, n_packets: int,
                           mesh: Mesh, batch_per_device: int = 16384,
                           n_capt: int = 10, max_iters: int = 300000,
                           pola: bool = True, mono: bool = False):
    """Run the thermal MC across all devices of ``mesh``; returns globally
    reduced tallies (same structure as run_thermal_mc's MCResult)."""
    n_dev = mesh.devices.size
    n_per_dev = int(np.ceil(n_packets / n_dev))
    keys = jax.random.split(key, n_dev)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P("dp")),
        out_specs=P(),
        check_vma=False)
    def _run(m, k):
        res = thermal_mc.run_thermal_mc(
            m, k[0], n_per_dev, batch=batch_per_device, n_capt=n_capt,
            max_iters=max_iters, pola=pola, mono=mono)
        # psum the per-device private tallies over ICI
        return thermal_mc.MCResult(
            xkj=jax.lax.psum(res.xkj, "dp"),
            nabs=jax.lax.psum(res.nabs, "dp"),
            sed=jax.lax.psum(res.sed, "dp"),
            emitted=jax.lax.psum(res.emitted, "dp"),
            n_iters=jax.lax.pmax(res.n_iters, "dp"),
            n_lost=jax.lax.psum(res.n_lost, "dp"),
        )

    return _run(model, keys)
