"""Loading reference (Haiku) checkpoints into this framework.

The published GraphCast/GenCast checkpoints store Haiku parameter dicts with
flat module-path keys like

  grid2mesh_gnn/~_networks_builder/encoder_edges_grid2mesh_mlp/~/linear_0
  mesh_gnn/~_networks_builder/processor_edges_3_mesh_layer_norm

(naming verified empirically against dm-haiku's nesting rules; see the
reference's deep_typed_graph_net.py:198-321 for the module structure).
This module converts between that flat Haiku naming and this framework's
nested param trees:

  {"grid2mesh_gnn": {"encoder_edges_grid2mesh":
      {"mlp": {"linear_0": {"w", "b"}}, "layer_norm": {"scale", "offset"},
       "norm_conditioning": {"w", "b"}}}, ...}
"""

from __future__ import annotations

import re
from typing import Any, BinaryIO, Union

import numpy as np

from graphcast_tpu import checkpoint as checkpoint_lib
from graphcast_tpu.models import configs

_GNN_RE = re.compile(
    r"^(?P<gnn>[a-z0-9_]+)/~_networks_builder/(?P<rest>.+)$")
_MLP_RE = re.compile(r"^(?P<base>.+)_mlp/~/(?P<linear>linear_\d+)$")
_LN_RE = re.compile(r"^(?P<base>.+)_layer_norm$")
_NC_RE = re.compile(r"^(?P<base>.+)_norm_conditioning(/linear)?$")
# Reference processor prefixes are "processor_{edges|nodes}_{step}_{type}";
# ours are "processor_{step}_{edges|nodes}_{type}".
_PROC_RE = re.compile(r"^processor_(?P<kind>edges|nodes)_(?P<step>\d+)_"
                      r"(?P<type>.+)$")


def _map_base_name(base: str) -> str:
  m = _PROC_RE.match(base)
  if m:
    return f"processor_{m.group('step')}_{m.group('kind')}_{m.group('type')}"
  return base


def _unmap_base_name(base: str) -> str:
  m = re.match(r"^processor_(?P<step>\d+)_(?P<kind>edges|nodes)_(?P<type>.+)$",
               base)
  if m:
    return f"processor_{m.group('kind')}_{m.group('step')}_{m.group('type')}"
  return base


def haiku_params_to_native(haiku_params: dict[str, dict[str, np.ndarray]]
                           ) -> dict[str, Any]:
  """Flat Haiku param dict → this framework's nested GNN param tree."""
  out: dict[str, Any] = {}
  for key, value in haiku_params.items():
    gnn_match = _GNN_RE.match(key)
    if not gnn_match:
      raise ValueError(f"unrecognized haiku param key: {key!r}")
    gnn = gnn_match.group("gnn")
    rest = gnn_match.group("rest")
    dest = out.setdefault(gnn, {})

    mlp_match = _MLP_RE.match(rest)
    ln_match = _LN_RE.match(rest)
    nc_match = _NC_RE.match(rest)
    if mlp_match:
      base = _map_base_name(mlp_match.group("base"))
      dest.setdefault(base, {}).setdefault("mlp", {})[
          mlp_match.group("linear")] = {
              "w": np.asarray(value["w"]), "b": np.asarray(value["b"])}
    elif ln_match:
      base = _map_base_name(ln_match.group("base"))
      dest.setdefault(base, {})["layer_norm"] = {
          k: np.asarray(v) for k, v in value.items()}
    elif nc_match:
      base = _map_base_name(nc_match.group("base"))
      dest.setdefault(base, {})["norm_conditioning"] = {
          "w": np.asarray(value["w"]), "b": np.asarray(value["b"])}
    else:
      raise ValueError(f"unrecognized haiku module name: {rest!r}")
  return out


def native_params_to_haiku(native: dict[str, Any]
                           ) -> dict[str, dict[str, np.ndarray]]:
  """Inverse of haiku_params_to_native (for writing reference-format
  checkpoints)."""
  out: dict[str, dict[str, np.ndarray]] = {}
  for gnn, modules in native.items():
    if gnn == "graph_statics":
      # Derived graph data, not parameters — never serialized to the
      # reference format (the reference rebuilds graphs from configs).
      continue
    for base, parts in modules.items():
      ref_base = _unmap_base_name(base)
      for part_name, part in parts.items():
        if part_name == "mlp":
          for linear_name, lp in part.items():
            key = f"{gnn}/~_networks_builder/{ref_base}_mlp/~/{linear_name}"
            out[key] = {"w": np.asarray(lp["w"]), "b": np.asarray(lp["b"])}
        elif part_name == "layer_norm":
          key = f"{gnn}/~_networks_builder/{ref_base}_layer_norm"
          out[key] = {k: np.asarray(v) for k, v in part.items()}
        elif part_name == "norm_conditioning":
          key = (f"{gnn}/~_networks_builder/{ref_base}_norm_conditioning"
                 "/linear")
          out[key] = {"w": np.asarray(part["w"]), "b": np.asarray(part["b"])}
        else:
          raise ValueError(f"unknown param part {part_name!r}")
  return out


def load_graphcast_checkpoint(source: Union[str, BinaryIO]):
  """Loads a reference GraphCast checkpoint bundle.

  Returns (native_params, model_config, task_config, description, license).
  The reference CheckPoint schema is graphcast.py:204-210; our config
  dataclasses share its field names so checkpoint.load reconstructs them
  directly.
  """
  ckpt = checkpoint_lib.load(source, configs.CheckPoint)
  params = haiku_params_to_native(ckpt.params)
  return (params, ckpt.model_config, ckpt.task_config, ckpt.description,
          ckpt.license)


def save_graphcast_checkpoint(dest: Union[str, BinaryIO], native_params,
                              model_config: configs.ModelConfig,
                              task_config: configs.TaskConfig,
                              description: str = "",
                              license: str = ""):
  """Writes a reference-format GraphCast checkpoint bundle."""
  ckpt = configs.CheckPoint(
      params=native_params_to_haiku(native_params),
      model_config=model_config,
      task_config=task_config,
      description=description,
      license=license)
  checkpoint_lib.dump(dest, ckpt)
