"""Checkpoint save/load of the progressive photon-mapping state.

The reference serializes the whole processor network, properties included,
into an ``.inv`` workspace (workspaces/CorrelatedPhotonMappingSingleVolume
.inv); the runtime photon state is rebuilt on load. Here BOTH are saved:
the configs (the property analog) and the full :class:`PhotonMapState`
pytree (photons, light samples, light volumes, RNG key, drain
bookkeeping), so a resumed run continues bit-identically — stronger than
the reference, which retraces from scratch on load.

Format: a single ``.npz`` with flattened pytree leaves keyed by tree path
plus a JSON header of the configs. Loads reconstruct the dataclass configs
and the state pytree. (Scene content — volume, TFs, lights, camera — is
not part of the checkpoint; persist volumes with ``cpm_tpu.io.u3d``.)
"""

from __future__ import annotations

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np

from cpm_tpu.core import config as config_mod
from cpm_tpu.core.types import LightSamples, PhotonData
from cpm_tpu.pipeline.state import PhotonMapState

_HEADER_KEY = "__cpm_header__"
_FORMAT_VERSION = 1


def _flatten_state(state: PhotonMapState):
    leaves, treedef = jax.tree_util.tree_flatten(state)
    return leaves, treedef


def _config_to_dict(cfg) -> dict:
    d = dataclasses.asdict(cfg)
    return d


def _config_from_dict(cls, d: dict):
    names = {f.name for f in dataclasses.fields(cls)}
    return cls(**{k: tuple(v) if isinstance(v, list) else v
                  for k, v in d.items() if k in names})


def _normalize(path: str) -> str:
    """np.savez appends '.npz' to extension-less paths; normalize so
    save/load agree on the on-disk name (ADVICE round 4)."""
    return path if path.endswith(".npz") else path + ".npz"


def save_checkpoint(path: str, state: PhotonMapState,
                    config: config_mod.PipelineConfig) -> None:
    """Write state + config to ``path`` (.npz appended if missing)."""
    path = _normalize(path)
    leaves, _ = _flatten_state(state)
    arrays = {f"leaf_{i:03d}": np.asarray(x) for i, x in enumerate(leaves)}
    header = {
        "version": _FORMAT_VERSION,
        "n_leaves": len(leaves),
        "has_prev_minmax": state.prev_minmax is not None,
        "config": {
            "photons_x": config.photons_x,
            "photons_y": config.photons_y,
            "tracer": _config_to_dict(config.tracer),
            "splat": _config_to_dict(config.splat),
            "recompute": _config_to_dict(config.recompute),
            "render": _config_to_dict(config.render),
        },
    }
    arrays[_HEADER_KEY] = np.frombuffer(
        json.dumps(header).encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def load_checkpoint(path: str):
    """Read (state, config) back; the state leaves land on the default
    device with their saved dtypes."""
    with np.load(_normalize(path)) as z:
        header = json.loads(bytes(z[_HEADER_KEY].tobytes()).decode())
        if header["version"] != _FORMAT_VERSION:
            raise ValueError(f"unknown checkpoint version {header['version']}")
        leaves = [jnp.asarray(z[f"leaf_{i:03d}"])
                  for i in range(header["n_leaves"])]

    hc = header["config"]
    config = config_mod.PipelineConfig(
        photons_x=hc["photons_x"], photons_y=hc["photons_y"],
        tracer=_config_from_dict(config_mod.TracerConfig, hc["tracer"]),
        splat=_config_from_dict(config_mod.SplatConfig, hc["splat"]),
        recompute=_config_from_dict(config_mod.RecomputeConfig,
                                    hc["recompute"]),
        render=_config_from_dict(config_mod.RenderConfig, hc["render"]))

    # Rebuild the treedef from a template state with matching array count.
    n = config.photons_x * config.photons_y
    max_i = config.tracer.max_interactions
    template = PhotonMapState(
        photons=PhotonData.create(n, max_i),
        light_samples=LightSamples(
            origins=jnp.zeros((n, 3)), directions=jnp.zeros((n, 3)),
            powers=jnp.zeros((n, 3)), tspan=jnp.zeros((n, 2)),
            iteration=jnp.int32(0)),
        light_volume=jnp.zeros(()), light_volume_accum=jnp.zeros(()),
        key=jax.random.PRNGKey(0), retraced=jnp.zeros(n, bool),
        n_remaining=jnp.int32(0), recompute_phase=jnp.int32(0),
        prev_minmax=(jnp.zeros(()) if header.get("has_prev_minmax")
                     else None))
    treedef = jax.tree_util.tree_structure(template)
    if treedef.num_leaves != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, expected "
            f"{treedef.num_leaves} for this config")
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    return state, config
