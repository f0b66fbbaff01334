"""Device mesh construction and sharding rules.

Axes:
  data  — data parallel over query groups (batch dim of every array)
  model — tensor parallel over scorer weight matrices (hidden dims)
  seq   — context parallel over the document axis for ultra-long lists

DP gradient psum, TP all-reduces and seq-axis gathers are all inserted by XLA
from these shardings (jit auto-partitioning) — there is no hand-written
collective in the training path.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = 1
    model: int = 1
    seq: int = 1

    @property
    def num_devices(self) -> int:
        return self.data * self.model * self.seq


def make_mesh(cfg: Optional[MeshConfig] = None, devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model, seq) mesh. With no config, all devices go to the
    data axis (pure DP — the right default for LTR's small dense towers)."""
    explicit = devices is not None
    devices = list(devices if devices is not None else jax.devices())
    if cfg is None:
        cfg = MeshConfig(data=len(devices))
    assert cfg.num_devices <= len(devices), (cfg, len(devices))
    if not explicit and cfg.num_devices == len(devices):
        # topology-aware layout: neighbors on `seq`/`model` sit on adjacent
        # ICI links (ring ppermute and TP all-reduces stay on-chip-adjacent)
        try:
            from jax.experimental import mesh_utils

            arr = mesh_utils.create_device_mesh((cfg.data, cfg.model, cfg.seq))
            return Mesh(arr, ("data", "model", "seq"))
        except Exception:
            pass  # emulated/irregular platforms: fall through to enumeration
    arr = np.asarray(devices[: cfg.num_devices]).reshape(cfg.data, cfg.model, cfg.seq)
    return Mesh(arr, ("data", "model", "seq"))


def make_hybrid_mesh(ici_cfg: Optional[MeshConfig] = None,
                     dcn: Optional[int] = None) -> Mesh:
    """Multi-host mesh: a leading `dcn` axis spans hosts (data parallelism
    over the slower data-center network) while the (data, model, seq) axes
    stay within each host's ICI domain. Collectives on `dcn` ride DCN; all
    TP/CP traffic stays on ICI (SURVEY §5.8). Single-process runs get a
    dcn axis of size 1 so downstream PartitionSpecs are uniform — pass
    `dcn=k` to EMULATE k hosts by splitting the local devices over the
    leading axis instead (how the test suite exercises the cross-host
    sharding semantics on the virtual CPU mesh)."""
    procs = jax.process_count()
    local = jax.local_device_count()
    if procs > 1:
        assert dcn is None or dcn == procs, (dcn, procs)
        if ici_cfg is None:
            ici_cfg = MeshConfig(data=local)
        assert ici_cfg.num_devices == local, (ici_cfg, local)
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1, ici_cfg.data, ici_cfg.model, ici_cfg.seq),
            dcn_mesh_shape=(procs, 1, 1, 1),
        )
    else:
        dcn = dcn or 1
        if ici_cfg is None:
            ici_cfg = MeshConfig(data=local // dcn)
        n = dcn * ici_cfg.num_devices
        assert n <= local, (dcn, ici_cfg, local)
        arr = np.asarray(jax.devices()[:n]).reshape(
            dcn, ici_cfg.data, ici_cfg.model, ici_cfg.seq)
    return Mesh(arr, ("dcn", "data", "model", "seq"))


# Config-level mesh construction (EvalSetting "mesh" JSON key / -mesh CLI
# flag). Cached: jax meshes hash by device layout, and every evaluator /
# branch trainer asking for the same axis sizes should share one mesh.
_MESH_CACHE: dict = {}


def mesh_from_dict(mesh_dict: dict) -> Mesh:
    """{"data": 4, "model": 2, "seq": 1, "dcn": k} -> Mesh; a `dcn` axis
    selects the hybrid multi-host mesh (make_hybrid_mesh)."""
    key = tuple(sorted(mesh_dict.items()))
    if key not in _MESH_CACHE:
        unknown = set(mesh_dict) - {"data", "model", "seq", "dcn"}
        assert not unknown, f"unknown mesh axes {unknown}"
        cfg = MeshConfig(data=int(mesh_dict.get("data", 1)),
                         model=int(mesh_dict.get("model", 1)),
                         seq=int(mesh_dict.get("seq", 1)))
        _MESH_CACHE[key] = (make_hybrid_mesh(cfg, dcn=int(mesh_dict["dcn"]))
                            if mesh_dict.get("dcn") else make_mesh(cfg))
    return _MESH_CACHE[key]


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, shard_docs: bool = False) -> NamedSharding:
    """Batch arrays: queries over `data` (and `dcn` when the mesh has the
    cross-host axis — DP spans hosts), optionally docs over `seq` (CP)."""
    batch_axes = ("dcn", "data") if "dcn" in mesh.axis_names else "data"
    if shard_docs:
        return NamedSharding(mesh, P(batch_axes, "seq"))
    return NamedSharding(mesh, P(batch_axes))


# --------------------------------------------------------------------- TP


def _ffn_layer_spec(i: int, n_layers: int) -> P:
    """Alternate hidden-dim sharding across stacked FFN layers: even layers
    split the output features, odd layers split the input features, so
    consecutive matmuls form the canonical column-then-row parallel pair and
    XLA only all-reduces once per pair."""
    if i % 2 == 0:
        return P(None, "model")  # column parallel: [d_in, d_out/model]
    return P("model", None)  # row parallel: [d_in/model, d_out]


def scorer_param_sharding(mesh: Mesh, params) -> object:
    """PartitionSpec pytree for scorer params (TP over the `model` axis).

    Rules:
      * ffn stacks ({'layers': [{'linear': {'w','b'}, 'bn': ...}, ...]}):
        alternating column/row parallel; biases follow the output sharding;
        the LAST layer (out_dim 1) is replicated — a [*, 1] output can't tile.
      * MHSA: fused qkv [F, 3F] is column parallel (heads split across model),
        out-proj fc [F, F] is row parallel; layer norms replicated.
      * anything 0/1-dim or unrecognized: replicated.
    """

    def spec_ffn(ffn) -> object:
        layers = ffn["layers"]
        n = len(layers)
        out = []
        sharded_i = 0  # alternate over SHARDED layers only: a replicated
        # middle layer must not leave two consecutive sharded matmuls with the
        # same orientation (that would break the column-then-row pairing and
        # cost an extra collective)
        for i, layer in enumerate(layers):
            w = layer["linear"]["w"]
            is_last = i == n - 1
            if is_last or min(w.shape) < mesh.shape["model"] or w.shape[1] == 1:
                spec_w, spec_b = P(), P()
            else:
                spec_w = _ffn_layer_spec(sharded_i, n)
                spec_b = P("model") if spec_w == P(None, "model") else P()
                sharded_i += 1
            layer_spec = {"linear": {"w": spec_w, "b": spec_b}}
            if "bn" in layer:
                layer_spec["bn"] = jax.tree_util.tree_map(lambda _: P(), layer["bn"])
            out.append(layer_spec)
        return {"layers": out}

    def spec_encoder(enc) -> object:
        out_layers = []
        for layer in enc["layers"]:
            spec = {
                "mhsa": {
                    "qkv": {"w": P(None, "model"), "b": P("model")},
                    "fc": {"w": P("model", None), "b": P()},
                }
            }
            for k in ("ln", "ln1", "ln2"):
                if k in layer:
                    spec[k] = jax.tree_util.tree_map(lambda _: P(), layer[k])
            if "fc" in layer:  # AllRank positionwise FFN
                spec["fc"] = {
                    "w1": {"w": P(None, "model"), "b": P("model")},
                    "w2": {"w": P("model", None), "b": P()},
                }
            out_layers.append(spec)
        enc_spec = {"layers": out_layers}
        if "final_ln" in enc:
            enc_spec["final_ln"] = jax.tree_util.tree_map(lambda _: P(), enc["final_ln"])
        return enc_spec

    spec = {}
    for name, sub in params.items():
        if name == "encoder":
            spec[name] = spec_encoder(sub)
        elif "layers" in sub:  # ffn stack (point_sf / head_ffnns / tail_ffnns)
            spec[name] = spec_ffn(sub)
        else:
            spec[name] = jax.tree_util.tree_map(lambda _: P(), sub)
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s) if isinstance(s, P) else s,
        spec,
        is_leaf=lambda x: isinstance(x, P),
    )


def expert_param_sharding(mesh: Mesh, cluster_params) -> object:
    """EP: shard the cluster-of-K MDN scorers (leading K axis on every leaf,
    diversification/scorers.py init_div_scorer cluster branch) over the
    `model` mesh axis — each device group holds K/model_parallelism experts.
    Generalises reference DivMDNRanker's cluster of K scorers
    (div_mdn_ranker.py:47-58,256-268), which the single-device reference
    evaluates serially."""
    def spec(leaf):
        return NamedSharding(mesh, P("model", *([None] * (leaf.ndim - 1))))

    return jax.tree_util.tree_map(spec, cluster_params)
