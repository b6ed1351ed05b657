"""Per-preset param-tree keyset + shape goldens for the model zoo.

A zoo preset exists to be checkpoint-compatible with a released model
(reference: the ``CheckPoint.model_config``/``task_config`` fields,
graphcast.py:204-210, and README.md:48-133). The checkpoints themselves are
unreachable here (zero egress), so this pins the next-best invariants:

- the FULL param keyset and every leaf shape against a checked-in golden
  (tests/goldens/zoo_param_shapes.json) — any drift in layer naming, MLP
  widths, or channel stacking that would break a released-weight load
  fails loudly;
- analytic anchors computed from the configs' variable vocabularies (not
  from the model's own packing helpers): encoder input widths = channel
  counts + structural features, decoder output widths =
  ``num_output_channels``.

Param trees are grid/mesh-size INVARIANT (the geometry only enters the
statics), so presets initialize on a tiny grid — and GenCast presets on a
small mesh — making this cheap; a separate assertion double-checks the
invariance claim for one preset.

Regenerate the golden after an intentional architecture change with:
  REGEN_ZOO_GOLDEN=1 python -m pytest tests/test_zoo_shapes.py -q
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphcast_tpu.data import synthetic
from graphcast_tpu.models import configs, zoo

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens",
                           "zoo_param_shapes.json")

# Structural node features: cos(lat), sin(lon), cos(lon) (+day/year
# progress is part of the data channels, not these); reference
# model_utils.py adds 3 spatial features per node.
_NODE_STRUCT = 3
# Edge structural features: length + 3 relative-position components.
_EDGE_STRUCT = 4


def _shapes(tree, prefix=""):
  out = {}
  for k, v in tree.items():
    path = f"{prefix}/{k}" if prefix else str(k)
    if isinstance(v, dict):
      out.update(_shapes(v, path))
    else:
      out[path] = list(np.shape(v))
  return out


def _graphcast_params(preset):
  from graphcast_tpu.models.graphcast import GraphCast
  # Tiny grid: param shapes depend only on the task's channel counts and
  # the model's latent sizes, never on the geometry.
  model_config = type(preset.model_config)(**{
      **{f.name: getattr(preset.model_config, f.name)
         for f in preset.model_config.__dataclass_fields__.values()},
      "resolution": 30.0, "mesh_size": 2})
  model = GraphCast(model_config, preset.task_config, cache_dir="",
                    fused_aggregation=False)
  inputs, targets, forcings = synthetic.make_example_batch(
      preset.task_config, resolution=30.0, batch=1)
  params = model.init(jax.random.PRNGKey(0), inputs, targets, forcings)
  params.pop("graph_statics", None)
  return params


def _gencast_params(preset):
  import dataclasses
  arch = dataclasses.replace(
      preset.denoiser_architecture_config,
      mesh_size=2,
      sparse_transformer_config=dataclasses.replace(
          preset.denoiser_architecture_config.sparse_transformer_config,
          attention_k_hop=4, attention_type="mha"))
  preset_small = dataclasses.replace(
      preset, denoiser_architecture_config=arch)
  predictor = preset_small.build(cache_dir="", fused_aggregation=False,
                                 interpret_attention=True)
  inputs, targets, forcings = synthetic.make_example_batch(
      preset.task_config, resolution=30.0, batch=1, time_step_hours=12)
  params = predictor.init(jax.random.PRNGKey(0), inputs, targets, forcings)
  params["architecture"].pop("graph_statics", None)
  params.pop("noise_statics", None)
  return params


def _param_count(shapes):
  return sum(int(np.prod(s)) if s else 1 for s in shapes.values())


def _all_preset_shapes():
  out = {}
  for name, fn in zoo.GRAPHCAST_PRESETS.items():
    out[name] = _shapes(_graphcast_params(fn()))
  for name, fn in zoo.GENCAST_PRESETS.items():
    out[name] = _shapes(_gencast_params(fn()))
  return out


@pytest.fixture(scope="module")
def preset_shapes():
  return _all_preset_shapes()


def test_param_shapes_match_golden(preset_shapes):
  if os.environ.get("REGEN_ZOO_GOLDEN") == "1":
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    with open(GOLDEN_PATH, "w") as f:
      json.dump(preset_shapes, f, indent=1, sort_keys=True)
    pytest.skip(f"regenerated {GOLDEN_PATH}")
  assert os.path.exists(GOLDEN_PATH), (
      "golden missing — run REGEN_ZOO_GOLDEN=1 pytest tests/test_zoo_shapes.py")
  with open(GOLDEN_PATH) as f:
    golden = json.load(f)
  assert set(preset_shapes) == set(golden)
  for preset, shapes in preset_shapes.items():
    g = golden[preset]
    assert set(shapes) == set(g), (
        f"{preset}: keyset drift "
        f"(+{sorted(set(shapes) - set(g))[:5]} "
        f"-{sorted(set(g) - set(shapes))[:5]})")
    for k, s in shapes.items():
      assert s == g[k], f"{preset}:{k} shape {s} != golden {g[k]}"


def test_graphcast_flagship_analytic_anchors(preset_shapes):
  """Channel-count anchors computed from the config constants directly."""
  task = configs.TASK
  shapes = preset_shapes["GraphCast"]
  n_levels = len(task.pressure_levels)
  assert n_levels == 37
  static_vars = {"geopotential_at_surface", "land_sea_mask"}
  surface_in = len(set(task.input_variables) - set(
      configs.ALL_ATMOSPHERIC_VARS) - static_vars)
  atmos_in = len(set(task.input_variables) & set(
      configs.ALL_ATMOSPHERIC_VARS))
  forcing = len(task.forcing_variables)
  # Two input frames of every time-dependent input var, one copy of each
  # static var, one target-frame of forcings (reference data_utils
  # stacking), + 3 structural node features. = 474 for the flagship,
  # matching the reference's documented input width.
  in_ch = (2 * (surface_in + n_levels * atmos_in) + len(static_vars)
           + forcing + _NODE_STRUCT)
  assert in_ch == 474
  grid_embed = shapes["grid2mesh_gnn/encoder_nodes_grid_nodes/"
                      "mlp/linear_0/w"]
  assert grid_embed[0] == in_ch, (grid_embed, in_ch)
  out_ch = configs.num_output_channels(task)
  assert out_ch == 5 + 37 * 6 == 227
  dec_out = shapes["mesh2grid_gnn/decoder_nodes_grid_nodes/mlp/linear_1/w"]
  assert dec_out[1] == out_ch
  # Edge embeds see the 4 structural edge features.
  assert shapes["grid2mesh_gnn/encoder_edges_grid2mesh/mlp/linear_0/w"][0] \
      == _EDGE_STRUCT
  # Published scale: GraphCast is a ~36.7M-parameter model (paper §1).
  count = _param_count(shapes)
  assert 35e6 < count < 39e6, count


def test_gencast_presets_share_architecture_shapes(preset_shapes):
  """All three GenCast presets are the same architecture (paper §A — only
  mesh size / training data differ), so their param trees must be
  identical in both keys and shapes."""
  a = preset_shapes["GenCast 0p25deg"]
  for other in ("GenCast 1p0deg", "GenCast 1p0deg Mini"):
    assert preset_shapes[other] == a


def test_param_tree_is_geometry_invariant():
  """The tiny-grid trick is sound: the same preset at two grid/mesh sizes
  yields identical param shapes."""
  from graphcast_tpu.models.graphcast import GraphCast
  preset = zoo.graphcast_small()
  shapes = {}
  for res, mesh in ((30.0, 2), (20.0, 3)):
    import dataclasses
    mc = dataclasses.replace(preset.model_config, resolution=res,
                             mesh_size=mesh)
    model = GraphCast(mc, preset.task_config, cache_dir="",
                      fused_aggregation=False)
    inputs, targets, forcings = synthetic.make_example_batch(
        preset.task_config, resolution=res, batch=1)
    params = model.init(jax.random.PRNGKey(0), inputs, targets, forcings)
    params.pop("graph_statics", None)
    shapes[(res, mesh)] = _shapes(params)
  a, b = shapes.values()
  assert a == b
